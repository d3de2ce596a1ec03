"""dateparser.search stand-in for the single call shape the reference
makes (other_conversions/psychauthors/convert_psychauthors_rdf.py:297,
346): ``search_dates(text, languages=["de","en"], settings={...,
"REQUIRE_PARTS": ["year"]})[0][1].strftime("%Y")`` — only the YEAR of
the FIRST date mention is ever consumed.

Deterministic rule both engines share (the Spark mirror is
emit/psychauthors.py's ``_first_year``): the first standalone 4-digit
year 1000-2999 in the text (not adjacent to another digit, so ORCID-like
digit runs don't match; a "dd.mm.yyyy" date still yields its year), as
datetime(year, 1, 1). No year → None, which
the caller's ``[0]`` turns into a TypeError its except swallows —
exactly real dateparser's no-match contract.
"""

from __future__ import annotations

import datetime as dt
import re

_YEAR = re.compile(r"(?<!\d)([12]\d{3})(?!\d)")


def search_dates(text, languages=None, settings=None):
    if not text:
        return None
    m = _YEAR.search(text)
    if not m:
        return None
    return [(m.group(1), dt.datetime(int(m.group(1)), 1, 1))]

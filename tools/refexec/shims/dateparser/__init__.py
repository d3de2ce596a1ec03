"""dateparser stand-in covering the formats the reference feeds it
(convert_starxml_to_bf.py:336 — PHIST |o "08.06.2021" / "14 October
2021"; research_info.py:1794 — PD "08.06.2021" / "1999" / "11.12.99").

Deterministic deviation: bare years resolve to YYYY-01-01 (real
dateparser without settings would use the current day/month; the
reference's thesis call passes PREFER_DAY_OF_MONTH/MONTH_OF_YEAR=first,
which is exactly Jan 1). Unknown formats return None, which the
reference catches and falls back from."""

from __future__ import annotations

import datetime as dt
import re

_MONTHS = {
    m.lower(): i + 1
    for i, m in enumerate(
        [
            "January", "February", "March", "April", "May", "June",
            "July", "August", "September", "October", "November", "December",
        ]
    )
}
_MONTHS.update(
    {
        m.lower(): i + 1
        for i, m in enumerate(
            [
                "Januar", "Februar", "März", "April", "Mai", "Juni",
                "Juli", "August", "September", "Oktober", "November", "Dezember",
            ]
        )
    }
)
_MONTHS.update({m[:3].lower(): v for m, v in list(_MONTHS.items())})


def _year2(y: int) -> int:
    # dateparser's two-digit-year rule (same as dateutil): 00-49 → 20xx,
    # 50-99 → 19xx
    return 2000 + y if y < 50 else 1900 + y


def parse(s, settings=None, languages=None):
    if s is None:
        return None
    s = str(s).strip()
    m = re.fullmatch(r"(\d{1,2})\.(\d{1,2})\.(\d{4})", s)
    if m:
        d, mo, y = int(m.group(1)), int(m.group(2)), int(m.group(3))
        try:
            return dt.datetime(y, mo, d)
        except ValueError:
            return None
    m = re.fullmatch(r"(\d{1,2})\.(\d{1,2})\.(\d{2})", s)
    if m:
        d, mo, y = int(m.group(1)), int(m.group(2)), _year2(int(m.group(3)))
        try:
            return dt.datetime(y, mo, d)
        except ValueError:
            return None
    m = re.fullmatch(r"(\d{4})-(\d{1,2})-(\d{1,2})", s)
    if m:
        try:
            return dt.datetime(int(m.group(1)), int(m.group(2)), int(m.group(3)))
        except ValueError:
            return None
    m = re.fullmatch(r"(\d{1,2})\.?\s+([A-Za-zäöüÄÖÜ]+),?\s+(\d{4})", s)
    if m and m.group(2).lower() in _MONTHS:
        try:
            return dt.datetime(int(m.group(3)), _MONTHS[m.group(2).lower()], int(m.group(1)))
        except ValueError:
            return None
    m = re.fullmatch(r"([A-Za-zäöüÄÖÜ]+)\.?\s+(\d{1,2}),?\s+(\d{4})", s)
    if m and m.group(1).lower() in _MONTHS:
        try:
            return dt.datetime(int(m.group(3)), _MONTHS[m.group(1).lower()], int(m.group(2)))
        except ValueError:
            return None
    m = re.fullmatch(r"(\d{4})", s)
    if m:
        return dt.datetime(int(m.group(1)), 1, 1)
    m = re.fullmatch(r"([A-Za-zäöüÄÖÜ]+)\s+(\d{4})", s)
    if m and m.group(1).lower() in _MONTHS:
        return dt.datetime(int(m.group(2)), _MONTHS[m.group(1).lower()], 1)
    return None

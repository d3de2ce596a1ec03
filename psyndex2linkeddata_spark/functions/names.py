"""F6–F9 — person/country name handling as native column expressions.

Reference semantics:
- F6 sanitize_country_names (/root/reference/modules/helpers.py:384-395):
  fix truncated country names.
- F7 country_geonames_lookup (helpers.py:378-382): casefold first-match over
  the 190-row geonames table → broadcast join helper in linking/exact.py; here
  we expose the normalized-key expression.
- F8 split_family_and_given_name (helpers.py:397-411): split at the first
  comma — family, given (given NULL if no single comma split).
- F9 normalize_names (/root/reference/modules/contributions.py:764-784):
  umlaut→ascii on family name + given name abbreviated to initial.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_COUNTRY_FIXES = {
    "COSTA": "Costa Rica",
    "CZECH": "Czech Republic",
    "NEW": "New Zealand",
    "SAUDI": "Saudi Arabia",
    "PEOPLES": "People's Republic of China",
}


def sanitize_country_name(col: Column) -> Column:
    """F6: repair names truncated at the first space by STAR."""
    expr = None
    for bad, good in _COUNTRY_FIXES.items():
        cond = col == F.lit(bad)
        expr = F.when(cond, F.lit(good)) if expr is None else expr.when(cond, F.lit(good))
    return expr.otherwise(col)


def family_name(col: Column) -> Column:
    """F8 family part: before the first comma, whole string if none
    (reference contributions.py:287-293 takes split(',')[0]/[1] whatever
    the comma count — 'Perdue, Meaghan, V' → family 'Perdue')."""
    name = F.trim(col)
    parts = F.split(name, ",")
    return F.when(F.size(parts) >= 2, F.trim(F.try_element_at(parts, F.lit(1)))).otherwise(name)


def given_name(col: Column) -> Column:
    """F8 given part: second comma segment, extra segments dropped
    (Spark split keeps trailing empties, matching Python str.split —
    'X (nifbe),' → given ''); empty string when there is no comma: the
    reference's except branch (contributions.py:291-303) sets
    givenname='' and still emits the triple."""
    name = F.trim(col)
    parts = F.split(name, ",")
    return (
        F.when(name.isNull(), F.lit(None).cast("string"))
        .when(F.size(parts) >= 2, F.trim(F.try_element_at(parts, F.lit(2))))
        .otherwise(F.lit(""))
    )


def ascii_umlauts(col: Column) -> Column:
    out = col
    for raw, rep in [("ä", "ae"), ("ö", "oe"), ("ü", "ue"), ("Ä", "Ae"), ("Ö", "Oe"), ("Ü", "Ue"), ("ß", "ss")]:
        out = F.replace(out, F.lit(raw), F.lit(rep))
    return out


def normalize_name(family: Column, given: Column) -> Column:
    """F9: 'Müller, Thomas' → 'Mueller, T.' (abbrev given, ascii umlauts)."""
    fam = ascii_umlauts(family)
    return F.when(
        given.isNotNull() & (F.length(given) > 0),
        F.concat(fam, F.lit(", "), F.substring(given, 1, 1), F.lit(".")),
    ).otherwise(fam)


def casefold_key(col: Column) -> Column:
    """Join key used for the geonames case-insensitive first-match lookup."""
    return F.lower(F.trim(col))


# Python str.casefold() expansions JVM lower() lacks, restricted to the
# Latin-script set that can appear in this pipeline's German/English
# data (ß plus the 15 BMP chars whose casefold maps into a-z: the
# ligatures ff/fi/fl/ffi/ffl/st, long s, and the precomposed-with-mark
# set — derived from casefold itself so the expansions are exact).
# Non-Latin casefold differences (Greek final sigma, Armenian
# ligatures, …) are outside the reference's input domain.
_CASEFOLD_COMPAT = tuple(
    (c, c.casefold()) for c in "ßŉſǰẖẗẘẙẚﬀﬁﬂﬃﬄﬅﬆ"
)


def casefold_compat(col: Column) -> Column:
    """JVM equivalent of Python ``str.casefold()`` over Latin-script
    text — the reference compares with casefold (helpers.py:380,
    publication_types.py:379-391), and ``F.lower`` alone keeps ß and
    ligatures that casefold expands (``'Rußland'.casefold()`` is
    ``'russland'``)."""
    c = F.lower(col)
    for a, b in _CASEFOLD_COMPAT:
        c = F.replace(c, F.lit(a), F.lit(b))
    return c

"""F15/F16 — fuzzy publication/thesis date parsing.

Reference: `dateparser.parse(...).strftime("%Y-%m-%d")` with year fallback
(/root/reference/convert_starxml_to_bf.py:318-361 for PHIST|o + PY;
/root/reference/modules/research_info.py:1784-1825 for PD/PROMY/PY).

Spark-first: a `coalesce(to_date(...format cascade...))` over the formats
that actually occur (ISO, German d.M.yyyy, yyyy/MM/dd, 'Month yyyy', bare
year), entirely native. dateparser-grade free-text fuzz is out of native
reach — `fuzzy_date_udf` is the Arrow fallback using pandas' parser.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.functions import pandas_udf

_FORMATS = [
    "yyyy-MM-dd",
    "d.M.yyyy",
    "dd.MM.yyyy",
    "yyyy/MM/dd",
    "MMMM yyyy",
    "d MMMM yyyy",
    "MMMM d, yyyy",
]


def parse_fuzzy_date(col: Column) -> Column:
    """Date from the format cascade; NULL if nothing matches.

    Two-digit years ('14.12.99') expand with dateparser's
    PREFER_DATES_FROM='past' century choice (research_info.py:1800):
    the century that keeps the year in the past — yy beyond the current
    year's last two digits → 19yy, else 20yy."""
    s = F.trim(col)
    yy = F.regexp_extract(s, r"^(\d{1,2})\.(\d{1,2})\.(\d{2})$", 3)
    century = F.when(
        yy.cast("int") > F.year(F.current_date()) % 100, F.lit("19")
    ).otherwise(F.lit("20"))
    s = F.when(
        F.length(yy) > 0,
        F.concat(
            F.regexp_extract(s, r"^(\d{1,2})\.(\d{1,2})\.(\d{2})$", 1),
            F.lit("."),
            F.regexp_extract(s, r"^(\d{1,2})\.(\d{1,2})\.(\d{2})$", 2),
            F.lit("."),
            century,
            yy,
        ),
    ).otherwise(s)
    attempts = [F.try_to_timestamp(s, F.lit(fmt)).cast("date") for fmt in _FORMATS]
    return F.coalesce(*attempts, _month_name_date(s))


_MONTH_NUM = {
    m.lower(): i % 12 + 1
    for i, m in enumerate(
        [
            "January", "February", "March", "April", "May", "June",
            "July", "August", "September", "October", "November", "December",
            "Januar", "Februar", "März", "April", "Mai", "Juni",
            "Juli", "August", "September", "Oktober", "November", "Dezember",
        ]
    )
}
_MONTH_NUM.update({m[:3]: v for m, v in list(_MONTH_NUM.items())})


def _month_name_date(s: Column) -> Column:
    """dateparser-grade month-name forms the strict cascade misses
    ('27 Mar 2022', 'MAR  2022', 'Oktober 2021'): any-case English/
    German names + 3-letter abbreviations, flexible whitespace, missing
    day → 1. Entirely native: regexp extract + map lookup + try_to_date
    (invalid day combos like '31 Feb' fall out as NULL)."""
    w = F.regexp_replace(s, r"\s+", " ")
    pairs = []
    for k, v in _MONTH_NUM.items():
        pairs.extend([F.lit(k), F.lit(v)])
    month_map = F.create_map(*pairs)

    def attempt(pattern: str, gy: int, gm: int, gd) -> Column:
        day = F.regexp_extract(w, pattern, gd) if gd else F.lit("1")
        tok = F.lower(F.regexp_extract(w, pattern, gm))
        year = F.regexp_extract(w, pattern, gy)
        mo = F.try_element_at(month_map, tok)
        return F.when(
            (F.length(year) > 0) & mo.isNotNull(),
            F.try_to_timestamp(
                F.format_string("%s-%s-%s", year, mo.cast("string"), day),
                F.lit("yyyy-M-d"),
            ).cast("date"),
        )

    return F.coalesce(
        attempt(r"^(\d{1,2})\.? ([A-Za-zäöüÄÖÜ]+),? (\d{4})$", 3, 2, 1),
        attempt(r"^([A-Za-zäöüÄÖÜ]+)\.? (\d{1,2}),? (\d{4})$", 3, 1, 2),
        attempt(r"^([A-Za-zäöüÄÖÜ]+) (\d{4})$", 2, 1, None),
    )


def date_or_year(date_col: Column, *year_fallbacks: Column) -> Column:
    """F15/F16 shape: struct(value, dtype) — a full xsd:date when parseable,
    else the first 4-digit year fallback as xsd:gYear (reference emits
    XSD.date vs XSD.gYear accordingly, convert_starxml_to_bf.py:476-493)."""
    parsed = parse_fuzzy_date(date_col) if date_col is not None else F.lit(None).cast("date")
    year = None
    for yf in year_fallbacks:
        y = F.regexp_extract(F.trim(yf), r"(\d{4})", 1)
        y = F.when(F.length(y) > 0, y)
        year = y if year is None else F.coalesce(year, y)
    # a bare-year date field also counts as gYear (reference: PD '2020')
    date_year = F.regexp_extract(F.coalesce(F.trim(date_col), F.lit("")), r"^(\d{4})$", 1) if date_col is not None else F.lit("")
    date_year = F.when(F.length(date_year) > 0, date_year)
    value = F.coalesce(
        parsed.cast("string"), date_year, year if year is not None else F.lit(None).cast("string")
    )
    dtype = F.when(parsed.isNotNull(), F.lit("date")).when(
        value.isNotNull(), F.lit("gYear")
    )
    return F.struct(value.alias("value"), dtype.alias("dtype"))


def _fuzzy_fn(s: pd.Series) -> pd.Series:
    def _one(v):
        if v is None or not str(v).strip():
            return None
        try:
            ts = pd.to_datetime(str(v).strip(), dayfirst=True, errors="coerce")
            return None if pd.isna(ts) else ts.strftime("%Y-%m-%d")
        except Exception:
            return None

    return s.map(_one)


def fuzzy_date_udf(col: Column) -> Column:
    """Arrow fallback for free-text dates beyond the native cascade."""
    return pandas_udf(_fuzzy_fn, "string")(col)

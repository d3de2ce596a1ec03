"""F21/F28/P10 — funding-field functions.

- F21 grant-number splitter (/root/reference/convert_starxml_to_bf.py:792-811):
  'and'/'und'/'&'/';' normalized to commas, split on ', '.
- F28 funder-name canonicalization (convert_starxml_to_bf.py:814-837 over
  modules/mappings.py:418-495): full-name replacement first, then substring
  rules — both native (map + when-chain built from the data table).
- P10 grant noise filter (convert_starxml_to_bf.py:948-951).
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, functions as F

from psyndex2linkeddata_spark.data import tables


def split_grant_numbers(col: Column) -> Column:
    """F21: array of individual grant numbers from a |n subfield value."""
    s = col
    for token in (" and ", " und ", " & ", "; "):
        s = F.replace(s, F.lit(token), F.lit(", "))
    return F.filter(
        F.transform(F.split(s, ", "), lambda x: F.trim(x)),
        lambda x: F.length(x) > 0,
    )


def canonicalize_funder_name(col: Column) -> Column:
    """F28: exact full-name recode (map), then first-match substring recode
    (when-chain in table order)."""
    full_map = F.create_map(
        *chain.from_iterable(
            (F.lit(a), F.lit(b)) for a, b in tables.funder_names_full_replacelist
        )
    )
    out = F.coalesce(full_map[col], col)
    expr = None
    for substr, repl in tables.funder_names_substr_replacelist:
        cond = out.contains(substr)
        expr = F.when(cond, F.lit(repl)) if expr is None else expr.when(cond, F.lit(repl))
    return expr.otherwise(out) if expr is not None else out


def is_grant_noise(col: Column) -> Column:
    """P10: GRANT values that are just OA-deal boilerplate, to be dropped."""
    low = F.lower(col)
    return low.contains("projekt deal") | low.contains("open access")

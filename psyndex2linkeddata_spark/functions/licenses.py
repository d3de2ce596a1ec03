"""F22/F23 — license-code → vocabulary URI and abstract-origin recode.

- F23: the reference's ~25-branch if/elif over COPR |c
  (/root/reference/convert_starxml_to_bf.py:155-243) as a when-chain:
  exact code matches first, then prefix/contains fallbacks, in source order.
- F22: abstract-origin initials/name variants → canonical origin label
  (/root/reference/modules/abstract.py:41-58 over the lists in
  modules/mappings.py:176-325) as a literal map lookup.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, functions as F

from psyndex2linkeddata_spark.data import tables
from psyndex2linkeddata_spark.namespaces import LICENSES

_EXACT_LICENSE_CODES = {
    "CC": "C00_1_0",
    "PDM": "PDM_1_0",
    "CC BY 4.0": "CC_BY_4_0",
    "CC BY-SA 4.0": "CC_BY-SA_4_0",
    "CC BY-NC-ND 3.0": "CC_BY-NC-ND_3_0",
    "CC BY-NC-ND 4.0": "CC_BY-NC-ND_4_0",
    "CC BY-NC 1.0": "CC_BY-NC_1_0",
    "CC BY-NC 4.0": "CC_BY-NC_4_0",
    "CC BY-NC-ND 2.5": "CC_BY-NC-ND_2_5",
    "CC BY-NC-SA 4.0": "CC_BY-NC-SA_4_0",
    "CC BY-ND 4.0": "CC_BY-ND_4_0",
    "CC BY-ND 2.5": "CC_BY-ND_2_5",
    "CC BY": "CC_BY",
    "CC BY-NC": "CC_BY-NC",
    "CC BY-NC-SA": "CC_BY-NC-SA",
    "CC BY-SA": "CC_BY-SA",
    "CC BY-NC-ND": "CC_BY-NC-ND",
    "CC0 1.0": "C00_1_0",
}


def license_uri(code: Column, german_label: Column) -> Column:
    """F23: COPR |c code (+ |d german label for the PUBL fallback) → license
    vocabulary URI; NULL when unmapped (reference logs & skips)."""
    expr = F.when(F.lit(False), F.lit(None).cast("string"))
    for c, suffix in _EXACT_LICENSE_CODES.items():
        expr = expr.when(code == F.lit(c), F.lit(LICENSES + suffix))
    expr = (
        expr.when(code.startswith("AUTH"), F.lit(LICENSES + "AUTH"))
        .when(
            code.startswith("PUBL")
            | F.coalesce(german_label, F.lit("")).startswith(
                "Volles Urheberrecht des Verlags"
            ),
            F.lit(LICENSES + "PUBL"),
        )
        .when(code.startswith("Hogrefe OpenMind"), F.lit(LICENSES + "HogrefeOpenMind"))
        .when(code.contains("Springer"), F.lit(LICENSES + "ExclusiveSpringer"))
        .when(code.startswith("OTHER"), F.lit(LICENSES + "UnspecifiedOpenLicense"))
    )
    return expr


_ORIGIN_MAP: dict[str, str] = {}
for values, canon in [
    (tables.abstract_origin_original, "Original"),
    (tables.abstract_origin_zpid, "ZPID"),
    (tables.abstract_origin_deepl, "DeepL"),
    (tables.abstract_origin_gesis, "GESIS"),
    (tables.abstract_origin_fis_bildung, "FIS Bildung"),
    ((tables.abstract_origin_krimz,) if isinstance(tables.abstract_origin_krimz, str) else tables.abstract_origin_krimz, "KrimZ"),
]:
    for v in values:
        _ORIGIN_MAP.setdefault(v, canon)


def abstract_origin(col: Column) -> Column:
    """F22: initials/name variants → canonical origin, pass-through if
    unlisted (abstract.py:41-58)."""
    m = F.create_map(
        *chain.from_iterable((F.lit(k), F.lit(v)) for k, v in _ORIGIN_MAP.items())
    )
    return F.coalesce(m[col], col)

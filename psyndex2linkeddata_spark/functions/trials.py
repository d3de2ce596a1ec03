"""F20 — trial-number recognition over PRREG text.

The reference matches 17 (regex → registry) rules per PRREG field
(/root/reference/modules/research_info.py:653-674). Here: one pass of
regexp_extract_all per rule, unioned as an array of struct(number, registry),
exploded downstream — vectorized, per-row, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# (java regex, registry slug) — order preserved from the reference list.
TRIAL_NUMBER_REGEXES: list[tuple[str, str]] = [
    (r"DRKS\d+", "drks"),
    (r"CRD\d+", "prospero"),
    (r"ISRCTN\d+", "srctn"),
    (r"NCT\d+", "clinical-trials-gov"),
    (r"actrn\d+", "anzctr"),
    (r"(?i)chictr[-a-z]*\d+", "chictr"),
    (r"kct\d+", "cris"),
    (r"ctri[\d/]+", "clinical-trial-registry-india"),
    (r"irct[0-9a-z]+", "irct"),
    (r"isrctn\d+", "isrctn"),
    (r"(?i)(nl|ntr)[-0-9]+", "dutch-trial-register"),
    (r"rbr\d+", "rebec"),
    (r"rpcec\d+", "rpec"),
    (r"slctr[\d/]+", "slctr"),
    (r"tctr\d+", "tctr"),
    (r"umin\d+", "umin-japan"),
]


def extract_trial_numbers(col: Column) -> Column:
    """array<struct<number,registry>> of every trial number found in the
    string, rule order then text order — matches the reference's loop."""
    parts = []
    for regex, registry in TRIAL_NUMBER_REGEXES:
        hits = F.regexp_extract_all(F.coalesce(col, F.lit("")), F.lit(regex), F.lit(0))
        parts.append(
            F.transform(
                hits,
                lambda n: F.struct(n.alias("number"), F.lit(registry).alias("registry")),
            )
        )
    return F.concat(*parts)

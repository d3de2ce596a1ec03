"""Corpus accounting ("data card") rollup: per-(source, lang) token and
document statistics with subtotal and grand-total rows in ONE pass —
the report a training-data pipeline publishes next to every corpus
release (docs/tokens per source, per language, overall, plus an exact
duplicate-text rate).

Spark-first: `DataFrame.rollup(source, lang)` compiles to a single
Expand + hash aggregate — one shuffle on the (tiny-cardinality)
grouping keys produces all three aggregation levels; no self-unions,
no second scan. Per-row signals (token count, text hash) are computed
in the scan projection. Distinct-text counting uses
count(distinct md5) under the same rollup — Spark plans it as the
standard two-phase distinct-aggregate expand; with billions of rows
per group the md5 keys stay uniform so neither phase skews.

The grouping level is exposed as `lvl` = grouping(source)*2 +
grouping(lang) (0 = leaf, 1 = per-source subtotal, 3 = grand total) —
spelled out arithmetically so the DuckDB oracle reproduces it with its
own GROUPING() primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

__all__ = ["corpus_stats"]


def corpus_stats(
    docs: DataFrame,
    source_col: str = "source",
    lang_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(source, lang, lvl, n_docs, n_tokens, avg_doc_tokens,
    n_distinct_texts, exact_dup_frac) at leaf / per-source / grand-total
    levels.

    Determinism: the two ratios are emitted at an exact 1e-4 grain —
    integer `(x * 10000) div n_docs` (both operands exact longs, same
    truncating integer division in any engine) followed by ONE IEEE
    division of that bigint by 10000.0, which is a single correctly-
    rounded operation and therefore bit-identical across engines. The
    earlier round(double-division, 4) form was not (the driver's DuckDB
    hash gate caught last-ulp divergence); this is the same exact-replay
    pattern the BM25/LM/NB/RRF operators use with DECIMAL/bigint
    arithmetic."""
    ntok = F.size(
        F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    )
    staged = docs.select(
        F.col(source_col).alias("source"),
        F.col(lang_col).alias("lang"),
        ntok.alias("_ntok"),
        F.md5(F.col(text_col)).alias("_th"),
    )
    return (
        staged.rollup("source", "lang")
        .agg(
            (F.grouping("source") * 2 + F.grouping("lang")).alias("lvl"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_ntok").alias("n_tokens"),
            F.count_distinct(F.col("_th")).alias("n_distinct_texts"),
        )
        .withColumn(
            "avg_doc_tokens",
            F.expr("cast((n_tokens * 10000) div n_docs as bigint) / cast(10000 as double)"),
        )
        .withColumn(
            "exact_dup_frac",
            F.expr(
                "cast(((n_docs - n_distinct_texts) * 10000) div n_docs"
                " as bigint) / cast(10000 as double)"
            ),
        )
        .select(
            "source",
            "lang",
            "lvl",
            "n_docs",
            "n_tokens",
            "avg_doc_tokens",
            "n_distinct_texts",
            "exact_dup_frac",
        )
    )

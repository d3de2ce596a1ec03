"""Benchmark decontamination: flag training documents that share any
word n-gram with an evaluation/benchmark corpus.

The standard pretraining hygiene pass (e.g. GPT-3 appendix C, PaLM §6):
a doc containing any benchmark n-gram (typically 8-13 words) leaks eval
answers into training and must be dropped or flagged before the mix.

Scale shape: benchmark corpora are tiny next to the training corpus
(10^5-10^7 grams vs 10^12 docs), so the gram set broadcasts and the
check is a broadcast LEFT SEMI join on the exploded doc grams — the
corpus side never shuffles; the explode is narrow and the semi-join
short-circuits per match. `broadcast_bench=False` degrades to a plain
shuffle semi-join for oversized benchmark sets. Token/shingle arrays are
staged as attributes (see dedup.shingles_of on why inlining goes O(n²)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from psyndex2linkeddata_spark.operators.dedup import norm_text, shingle_array


def _grams(
    df: DataFrame, text_col: str, n: int, extra_cols: list[str]
) -> DataFrame:
    # explode_OUTER: avoids Catalyst's inferred size>0 pre-filter,
    # which re-evaluates the staged shingle construction per row (see
    # dedup.minhash_signatures); shingle_array is never empty/null, so
    # the rows are identical.
    return df.select(
        *extra_cols, norm_text(F.col(text_col)).alias("_norm")
    ).select(
        *extra_cols,
        F.explode_outer(shingle_array(F.col("_norm"), n)).alias("_gram"),
    )


def contaminated_ids(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    broadcast_bench: bool = True,
) -> DataFrame:
    """Distinct ids of docs sharing ≥1 word n-gram with `benchmark`."""
    bench_grams = _grams(benchmark, bench_text_col, n, []).distinct()
    if broadcast_bench:
        bench_grams = F.broadcast(bench_grams)
    return (
        _grams(docs, text_col, n, [id_col])
        .join(bench_grams, "_gram", "left_semi")
        .select(id_col)
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    broadcast_bench: bool = True,
) -> DataFrame:
    """docs + a `contaminated` boolean (keep-filter: `where NOT
    contaminated`; flagging instead of dropping keeps the audit trail)."""
    hits = contaminated_ids(
        docs, benchmark, n, id_col, text_col, bench_text_col, broadcast_bench
    ).withColumn("contaminated", F.lit(True))
    return docs.join(hits, id_col, "left").withColumn(
        "contaminated", F.coalesce(F.col("contaminated"), F.lit(False))
    )

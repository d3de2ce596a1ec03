"""Sliding-window text chunking for training-data pipelines.

A pretraining corpus is consumed as fixed-size token windows with a
stride (overlap keeps context across boundaries). This is the standard
"pack documents into W-token chunks, stride S" pass, expressed fully
natively: tokenize with `split`, explode a `sequence` of chunk indices,
`slice` the token array per index, `array_join` back to text. No UDF,
no HOF lambda in the hot path — one narrow projection plus one explode,
so it fuses into the scan stage and the output is exactly as partitioned
as the input (no shuffle at any scale).

Chunk k of a document covers tokens [k*S, k*S + W); the number of
chunks is ceil(max(n - (W - S), 1) / S) — i.e. windows advance by S and
the last window may be short; an empty/whitespace document still yields
one empty chunk so every doc_id survives (auditable 1:N lineage).

The identical arithmetic runs in the DuckDB oracle (1-based inclusive
list slicing mirrors Spark's slice(start, length)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def tokens(col: Column) -> Column:
    """Whitespace tokens of the trimmed text. After trim the only way
    split produces an empty token is the empty string ([''] — Java split
    semantics), so a single `when` keeps blank/null docs at zero tokens
    without an interpreted higher-order filter."""
    t = F.coalesce(F.trim(col), F.lit(""))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def chunk_tokens(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 40,
    stride: int = 30,
) -> DataFrame:
    """(id, chunk_id, chunk_text, n_tokens): sliding W-token windows
    advancing by `stride` tokens (stride ≤ window ⇒ window-stride tokens
    of overlap between consecutive chunks)."""
    if not 0 < stride <= window:
        raise ValueError("require 0 < stride <= window")
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # windows advance by S; everything past the first W-S tokens needs
    # ceil(·/S) more windows. greatest(…,1): blank docs keep one chunk.
    n_chunks = F.greatest(
        F.ceil((n - (window - stride)) / F.lit(float(stride))).cast("int"), F.lit(1)
    )
    return (
        df.select(F.col(id_col), toks.alias("_t"), n_chunks.alias("_nc"))
        .select(
            id_col,
            "_t",
            F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias("chunk_id"),
        )
        .select(
            id_col,
            "chunk_id",
            F.slice(F.col("_t"), F.col("chunk_id") * stride + 1, window).alias("_c"),
        )
        .select(
            id_col,
            "chunk_id",
            F.array_join(F.col("_c"), " ").alias("chunk_text"),
            F.size(F.col("_c")).cast("long").alias("n_tokens"),
        )
    )

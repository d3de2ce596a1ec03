"""FRBR work extraction / deduplication over an instance-record table.

The reference leaves this stage as a design document —
other_conversions/work_extraction_deduplication/work_extraction.ipynb —
that works through real PSYNDEX cases and lands on a concrete decision
procedure; this plan operationalizes that procedure distributed (the
north-star names "work splitting" alongside contribution/instance):

- **Blocking** on a normalized (title_key, authors_key): "different
  punctuation, but resulting in same title_key" is the notebook's own
  equivalence for candidate pairs.
- **Over-populated blocks never merge** ("if there are more than 5
  records with the same title and author ... just don't merge them at
  all" — the 14 'Werbewirkungsforschung' yearly articles). At scale
  this heuristic doubles as the skew guard: a hot title block is
  excluded BEFORE the within-block self-join, so no block ever
  self-joins more than max_block² pairs.
- **Merge signal**: identical non-empty abstract (the notebook's md5
  hash comparison; its empty-abstract hashes collide and are
  explicitly not evidence) AND publication years within a small window
  ("they usually appear in a short timespan, like max 2 years apart").
- **Preprint pairs link, not merge**: same abstract but exactly one
  side is a report ("we should not merge as one work, but two
  different works linked via 'has preprint'").
- **Serial siblings**: same block + same journal but different
  abstracts are the yearly-series case — separate works, labeled so a
  curator can review.

Output: one row per record — (rec_id, work_id, block_size, relation)
with work_id = min rec_id of its same-work cluster (connected
components over merge edges; cluster size is bounded by max_block, so
hash-to-min converges in ≤ max_block-1 rounds) and relation the
record's strongest pair class (merged > preprint > serial >
blocked_series > singleton).

Scale shape: one shuffle to count block sizes (window over the block
key), one bounded self-join inside small blocks only, and the
components rounds on the (tiny) merge-edge set. Everything is native
Column expressions — md5/lower/regexp_replace are JVM built-ins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from psyndex2linkeddata_spark.operators.components import connected_components

__all__ = ["extract_works", "title_key"]


def title_key(col: Column) -> Column:
    """Punctuation/case-insensitive blocking key: lowercase, strip
    everything but letters and digits (unicode-aware lower; the
    notebook's two 'Verteilung des Glaubens...' titles differ only in
    ':' vs '.' and must collide)."""
    return F.regexp_replace(F.lower(col), r"[^\p{L}\p{N}]+", "")


def extract_works(
    records: DataFrame,
    max_block: int = 5,
    year_window: int = 2,
) -> DataFrame:
    """records(rec_id, title, authors, journal, year, doctype, abstract)
    → (rec_id, work_id, block_size, relation). doctype value 'report'
    marks the preprint-ish side of a has-preprint pair."""
    r = records.select(
        "rec_id",
        title_key(F.col("title")).alias("tk"),
        title_key(F.col("authors")).alias("ak"),
        title_key(F.col("journal")).alias("jk"),
        F.col("year").cast("int").alias("yr"),
        F.col("doctype"),
        F.when(
            F.length(F.trim(F.col("abstract"))) > 0,
            F.md5(F.col("abstract")),
        ).alias("ah"),
    )
    w = Window.partitionBy("tk", "ak")
    r = r.withColumn("block_size", F.count(F.lit(1)).over(w))

    small = r.where(F.col("block_size").between(2, max_block))
    a = small.select(
        "tk",
        "ak",
        F.col("rec_id").alias("rec_a"),
        F.col("jk").alias("jk_a"),
        F.col("yr").alias("yr_a"),
        F.col("doctype").alias("dt_a"),
        F.col("ah").alias("ah_a"),
    )
    b = small.select(
        "tk",
        "ak",
        F.col("rec_id").alias("rec_b"),
        F.col("jk").alias("jk_b"),
        F.col("yr").alias("yr_b"),
        F.col("doctype").alias("dt_b"),
        F.col("ah").alias("ah_b"),
    )
    pairs = a.join(b, ["tk", "ak"]).where(F.col("rec_a") < F.col("rec_b"))
    hash_eq = (
        F.col("ah_a").isNotNull()
        & F.col("ah_b").isNotNull()
        & (F.col("ah_a") == F.col("ah_b"))
        & (F.abs(F.col("yr_a") - F.col("yr_b")) <= year_window)
    )
    preprint_pair = (F.col("dt_a") == "report") != (F.col("dt_b") == "report")
    classed = pairs.select(
        "rec_a",
        "rec_b",
        F.when(hash_eq & preprint_pair, F.lit("preprint"))
        .when(hash_eq, F.lit("merged"))
        .when(
            F.col("jk_a").isNotNull() & (F.col("jk_a") == F.col("jk_b")),
            F.lit("serial"),
        )
        .alias("relation"),
    ).where(F.col("relation").isNotNull())
    # classed is consumed three times (merge edges, both touched
    # branches); without a cut each consumer would replay the blocking
    # window shuffle AND the self-join. The pair set is tiny (≤
    # max_block² per small block), so materialize it once.
    classed = classed.localCheckpoint(eager=False)

    merge_edges = classed.where(F.col("relation") == "merged").select(
        F.col("rec_a").alias("src"), F.col("rec_b").alias("dst")
    )
    cc = connected_components(merge_edges, max_iter=max(max_block, 2))

    rank = F.when(F.col("relation") == "merged", 3).when(
        F.col("relation") == "preprint", 2
    ).otherwise(1)
    touched = (
        classed.select(F.col("rec_a").alias("rec_id"), "relation")
        .union(classed.select(F.col("rec_b").alias("rec_id"), "relation"))
        .withColumn("rk", rank)
        .groupBy("rec_id")
        .agg(F.max(F.struct("rk", "relation")).alias("m"))
        .select("rec_id", F.col("m.relation").alias("pair_relation"))
    )

    return (
        r.join(touched, "rec_id", "left")
        .join(
            cc.select(F.col("node").alias("rec_id"), "component"),
            "rec_id",
            "left",
        )
        .select(
            "rec_id",
            F.coalesce(F.col("component"), F.col("rec_id")).alias("work_id"),
            "block_size",
            F.coalesce(
                F.col("pair_relation"),
                F.when(
                    F.col("block_size") > max_block, F.lit("blocked_series")
                ).otherwise(F.lit("singleton")),
            ).alias("relation"),
        )
    )

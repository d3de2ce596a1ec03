"""Deduplication operators for web-scale corpora (SURVEY §2 extension:
training-data pipeline ops over the `documents` table).

Scale design:
- exact: one groupBy on a 128-bit content hash — the only shuffle; AQE
  coalesces. Hot hash values (boilerplate pages) are bounded by the
  group-by being a pure count/collect of ids per hash.
- MinHash-LSH: signatures are row-local (narrow); the candidate join
  shuffles on (band_index, band_hash) — bucket keys are uniform by
  construction, so no skew; candidate verification is again row-local.
- SimHash: row-local signature, self-join on full signature (or banded
  prefixes for hamming<k at scale).
- n-gram Jaccard: exact verification for candidate pairs, or exhaustive
  at small scale (explode→join on shingle→agg), shuffling on shingle —
  stopword-like shingles are the skew risk; cap shingle frequency.
- embedding near-dup: see similarity.py (same kernel).

Hashes are md5 hex strings — lexicographic min == numeric min (fixed
32-char encoding), identical in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def tokens(col: Column) -> Column:
    """Lowercased whitespace tokens (empty strings dropped)."""
    return F.filter(
        F.split(F.lower(F.trim(col)), r"\s+"), lambda t: F.length(t) > 0
    )


def shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingles, space-joined, distinct."""
    toks = tokens(col)
    k = F.size(toks) - (n - 1)
    return F.array_distinct(
        F.when(
            k > 0,
            F.transform(
                F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            ),
        ).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def content_hash(col: Column) -> Column:
    """Exact-dup key: md5 of the raw text."""
    return F.md5(col)


def exact_duplicate_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Groups of byte-identical documents: (hash, n_docs, doc_ids sorted).

    One shuffle (groupBy hash). At 10^12 docs: hash is uniform → no skew;
    ids per group collected only for groups >1 (duplicates are rare)."""
    return (
        df.select(content_hash(F.col(text_col)).alias("hash"), F.col(id_col))
        .groupBy("hash")
        .agg(
            F.count("*").alias("n_docs"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .where(F.col("n_docs") > 1)
    )


def minhash_signature(col: Column, num_hashes: int = 16, n: int = 3) -> Column:
    """array<string> MinHash signature: per hash seed i, the minimum
    md5(i || ':' || shingle) over the document's shingles."""
    sh = shingles(col, n)
    return F.array(
        *[
            F.array_min(
                F.transform(sh, lambda s: F.md5(F.concat(F.lit(f"{i}:"), s)))
            )
            for i in range(num_hashes)
        ]
    )


def lsh_bands(sig: Column, bands: int, rows_per_band: int) -> Column:
    """array<struct<band,key>>: md5 over each band's concatenated minhashes."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|", *[sig[b * rows_per_band + r] for r in range(rows_per_band)]
                    )
                ).alias("key"),
            )
            for b in range(bands)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) sharing ≥1 LSH band.

    shingle→minhash→band→bucket-join: the join shuffles on (band, key);
    verification (true Jaccard) composes with ngram_jaccard_verify."""
    rows_per_band = num_hashes // bands
    # materialize the signature in its own projection: lsh_bands indexes it
    # per band, and an inlined signature expression would recompute all
    # num_hashes min-aggregations once per reference
    sigd = df.select(
        F.col(id_col),
        minhash_signature(F.col(text_col), num_hashes, n).alias("_sig"),
    )
    banded = sigd.select(
        F.col(id_col),
        F.explode(lsh_bands(F.col("_sig"), bands, rows_per_band)).alias("b"),
    ).select(id_col, F.col("b.band").alias("band"), F.col("b.key").alias("key"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: int | None = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle.

    explode→self-join on shingle→count intersections→|A∪B| from per-doc
    sizes. `max_shingle_freq` drops boilerplate shingles (the skew guard:
    a shingle shared by k docs creates k² join rows); None disables the
    guard (and its extra pass) for skew-free corpora.

    The shingle array is materialized in its own projection so the
    expensive per-row computation runs once (size+explode reference the
    column, not the expression)."""
    sh = df.select(F.col(id_col), shingles(F.col(text_col), n).alias("_sh"))
    ex = sh.select(
        F.col(id_col),
        F.size("_sh").alias("n_sh"),
        F.explode("_sh").alias("shingle"),
    )
    if max_shingle_freq is not None:
        rare = ex.groupBy("shingle").count().where(
            F.col("count") <= max_shingle_freq
        )
        ex = ex.join(rare.select("shingle"), "shingle")
    a, b = ex.alias("a"), ex.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count("*").alias("n_inter"))
    )
    return inter.select(
        "id_a",
        "id_b",
        (
            F.col("n_inter")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        ).alias("jaccard"),
    ).where(F.col("jaccard") >= threshold)


def simhash(col: Column, bits: int = 32) -> Column:
    """SimHash over word tokens: bit b is 1 when the weighted sum of token
    hash bits is positive. Token hash = first 8 md5 hex chars as a 32-bit
    int (cross-engine reproducible)."""
    toks = tokens(col)
    h = F.transform(toks, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"))
    out = F.lit(0).cast("long")
    for b in range(bits):
        def merge(acc, x, _b=b):
            return acc + F.when(
                x.bitwiseAND(F.lit(1 << _b)) != 0, F.lit(1)
            ).otherwise(F.lit(-1))

        vote = F.aggregate(h, F.lit(0).cast("long"), lambda acc, x: merge(acc, x))
        out = out + F.when(vote > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return out


def simhash_hex(col: Column) -> Column:
    """32-bit SimHash as a '0'/'1' string, one bit per md5 hex position:
    bit p is 1 when most tokens' md5 has a high hex digit (≥'8') at
    position p. Byte-wise string compare makes this identical across
    engines (the DuckDB oracle computes the same string)."""
    mds = F.transform(tokens(col), F.md5)
    bits = []
    for p in range(1, 33):
        def merge(acc, x, _p=p):
            return acc + F.when(
                F.substring(x, _p, 1) >= "8", F.lit(1)
            ).otherwise(F.lit(-1))

        vote = F.aggregate(mds, F.lit(0), lambda acc, x: merge(acc, x))
        bits.append(F.when(vote > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def simhash_duplicate_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32
) -> DataFrame:
    """Documents sharing an identical SimHash (hamming distance 0 tier;
    the <k tier at scale joins on bit-band prefixes instead)."""
    return (
        df.select(F.col(id_col), simhash(F.col(text_col), bits).alias("simhash"))
        .groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.sort_array(F.collect_list(id_col)).alias("doc_ids"))
        .where(F.col("n_docs") > 1)
    )

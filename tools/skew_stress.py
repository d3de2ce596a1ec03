"""Adversarial-skew stress bench: the guarded operator forms vs their
naive equivalents on a synthetic hot-key corpus (round-5 verdict item:
the levers existed and were unit-tested, but there was no recorded
evidence they WIN under skew at bench scale).

Corpus (deterministic, seed-free): N docs where
  - ONE megahost owns 50% of the pages (the 10^9-doc-host shape of a
    web crawl, scaled down); the rest spread over N/100 small hosts;
  - ONE near-duplicate boilerplate family covers 10% of the docs
    (identical text modulo a numeric tail token), so its shingles and
    LSH band keys form a single hot bucket of N/10 members;
  - the other 90% of docs carry id-salted text (no cross-doc overlap).

Measured pairs (each: untimed warm-up, then `reps` timed noop runs,
min reported — bench.py methodology):

  host_cap    guarded = cap_per_host (salted two-phase top-k)
              naive   = one row_number window over host
  minhash     guarded = minhash_lsh_pairs(max_bucket_size=100)
              naive   = minhash_lsh_pairs(max_bucket_size=None)
              (the hot family contributes (N/10)^2 candidate pairs to
               the naive form — quadratic in the skew, not in N)

Usage: python tools/skew_stress.py [n_docs] [reps]
Prints one JSON line with the four wall times.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from pyspark.sql import Window, functions as F

    from psyndex2linkeddata_spark.operators.dedup import minhash_lsh_pairs
    from psyndex2linkeddata_spark.operators.hosts import cap_per_host, host_of
    from psyndex2linkeddata_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="skew_stress", master=f"local[{cpus}]")

    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    host = F.when(
        F.col("doc_id") % 2 == 0, F.lit("megahost.example")
    ).otherwise(
        F.concat(F.lit("host"), (F.col("doc_id") % (n_docs // 100)).cast("string"),
                 F.lit(".example"))
    )
    body = F.when(
        F.col("doc_id") % 10 == 0,
        # hot near-dup family: identical 40-token boilerplate + unique tail
        F.concat(
            F.lit(" ".join(f"boiler{i}" for i in range(40)) + " tail"),
            F.col("doc_id").cast("string"),
        ),
    ).otherwise(
        # cold docs: 40 id-salted tokens, no cross-doc shingle overlap
        F.concat_ws(
            " ",
            *[
                F.concat(F.lit(f"w{i}x"), (F.col("doc_id") * 41 + i).cast("string"))
                for i in range(40)
            ],
        )
    )
    docs = base.select(
        "doc_id",
        F.concat(F.lit("https://"), host, F.lit("/p/"), F.col("doc_id").cast("string")).alias("url"),
        body.alias("text"),
    ).localCheckpoint()

    def t(df) -> float:
        df.write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return round(best, 2)

    out = {}
    spark.sparkContext.setJobDescription("host_cap guarded (salted two-phase)")
    out["host_cap_guarded"] = t(cap_per_host(docs, k=100, n_salts=16))
    spark.sparkContext.setJobDescription("host_cap naive (single host window)")
    w = Window.partitionBy("host").orderBy(F.md5(F.col("doc_id").cast("string")))
    naive_cap = (
        docs.withColumn("host", host_of(F.col("url")))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= 100)
        .drop("__rn")
    )
    out["host_cap_naive"] = t(naive_cap)

    spark.sparkContext.setJobDescription("minhash guarded (max_bucket_size=100)")
    out["minhash_guarded"] = t(
        minhash_lsh_pairs(docs, num_hashes=8, bands=4, n=3, max_bucket_size=100)
    )
    spark.sparkContext.setJobDescription("minhash naive (no bucket cap)")
    out["minhash_naive"] = t(
        minhash_lsh_pairs(docs, num_hashes=8, bands=4, n=3, max_bucket_size=None)
    )
    out["n_docs"] = n_docs
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Corpus-scale run of the training-data operators (the sf0.1 bench uses
5k short docs; this drives the same plans at 20-40× the rows with
600-token documents — the long-doc regime where the interpreted-recompute
traps and shuffle sizing actually bite).

Synthesizes N_DOCS deterministic documents Spark-side (no driver data):
4-member near-dup families (shared family base text + 6 member-specific
token positions) so the clustering stage has real transitive structure.

Stages, each timed over a noop write of the materialized input:
  scrub+stats  pii_scrub + pii_counts + repetition_stats  (narrow + one agg)
  cdc_chunks   content-defined chunking                    (narrow)
  clusters     minhash-LSH → connected components → canonical
Prints one JSON line; paste results into BENCH.md.

Usage: PYTHONPATH=/root/repo python tools/training_ops_scale_run.py [n_docs] [cores]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from psyndex2linkeddata_spark.session import get_spark

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
CORES = int(sys.argv[2]) if len(sys.argv) > 2 else 32
N_TOKENS = 600


def main() -> None:
    spark = get_spark(app_name="training-ops-scale", master=f"local[{CORES}]")

    fam = (F.col("id") / 4).cast("long")
    member = F.pmod(F.col("id"), F.lit(4))
    # token i: family-determined word, except 6 member-specific positions
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(N_TOKENS - 1)),
            lambda i: F.when(
                F.pmod(i, F.lit(101)) == member * 25,
                F.concat(F.lit("v"), F.col("id").cast("string"), F.lit("x"), i.cast("string")),
            ).otherwise(
                F.concat(
                    F.lit("w"),
                    F.pmod(i * (fam + 7) + i * i, F.lit(4999)).cast("string"),
                )
            ),
        ),
        " ",
    )
    docs = (
        spark.range(N_DOCS)
        .repartition(CORES * 3)
        .select(F.col("id").alias("doc_id"), text.alias("text"))
        .localCheckpoint()  # materialize: generation cost outside the timings
    )
    n_chars = docs.select(F.sum(F.length("text"))).first()[0]

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    out = {"n_docs": N_DOCS, "n_tokens_per_doc": N_TOKENS, "gb": round(n_chars / 1e9, 2), "cores": CORES}

    from psyndex2linkeddata_spark.functions.textstats import repetition_stats
    from psyndex2linkeddata_spark.operators.pii import pii_counts, scrub_pii

    t0 = time.time()
    counts = pii_counts(F.col("text"))
    scrubbed = docs.select(
        "doc_id", scrub_pii(F.col("text")).alias("text"),
        counts["n_emails"].alias("n_emails"),
    )
    noop(scrubbed)
    out["scrub_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    noop(repetition_stats(docs))
    out["repetition_s"] = round(time.time() - t0, 1)

    from psyndex2linkeddata_spark.operators.chunking import cdc_chunks

    t0 = time.time()
    chunks = cdc_chunks(docs, k=3, divisor=64)
    noop(chunks)
    out["cdc_chunks_s"] = round(time.time() - t0, 1)
    out["n_chunks"] = chunks.count()

    from psyndex2linkeddata_spark.operators.dedup import neardup_clusters

    t0 = time.time()
    clusters = neardup_clusters(docs, num_hashes=8, bands=4, n=3)
    canonical = clusters.where("is_canonical").count()
    out["clusters_s"] = round(time.time() - t0, 1)
    out["n_canonical"] = canonical
    # 4-member families sharing ~594/600 tokens should mostly collapse
    out["dedup_ratio"] = round(1 - canonical / N_DOCS, 3)

    # composed end-to-end prep (plans/corpus.py): the stage the
    # checkpoint-barrier fix targets — mix → scrub → gates →
    # decontamination → dedup → CDC chunking as ONE plan
    from psyndex2linkeddata_spark.plans.corpus import prepare_training_corpus

    bench = docs.where(F.col("doc_id") % 97 == 0).select("text")
    t0 = time.time()
    prep = prepare_training_corpus(
        docs,
        benchmark=bench,
        decontaminate_n=8,
        min_tokens=20,
        max_dup_word_frac=0.9,
        max_top_bigram_frac=0.5,
        chunking="cdc",
        cdc_divisor=64,
    )
    noop(prep)
    out["corpus_prep_s"] = round(time.time() - t0, 1)
    out["n_prep_chunks"] = prep.count()

    mtok = N_DOCS * N_TOKENS / 1e6
    out["scrub_mtok_per_s"] = round(mtok / out["scrub_s"], 1)
    out["chunk_mtok_per_s"] = round(mtok / out["cdc_chunks_s"], 1)
    out["prep_mtok_per_s"] = round(mtok / out["corpus_prep_s"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

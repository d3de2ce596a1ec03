"""Corpus-scale run of the text-model operators added at round-4 close
(bm25_topk, lm_mean_nll): the sf0.1 bench scores 5k short docs; this
drives the same plans at 20× the rows with 600-token documents — the
regime where the postings explode and the model-table joins actually
cost something.

Synthesizes N_DOCS deterministic documents Spark-side (same generator
shape as training_ops_scale_run.py: ~5k-word shared vocabulary plus
per-doc rare tokens, so BM25 has discriminative terms and the LM has a
real head/tail split). BM25 runs N_DOCS/500 queries; the LM trains on
the doc_id%23==0 slice with a 50k vocab cap and scores every document.

Prints one JSON line; paste results into BENCH.md.

Usage: PYTHONPATH=/root/repo python tools/retrieval_scale_run.py [n_docs] [cores]
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
    spark = get_spark(app_name="retrieval-scale", master=f"local[{CORES}]")

    fam = (F.col("id") / 4).cast("long")
    member = F.pmod(F.col("id"), F.lit(4))
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(N_TOKENS - 1)),
            lambda i: F.when(
                F.pmod(i, F.lit(101)) == member * 25,
                F.concat(
                    F.lit("v"), F.col("id").cast("string"), F.lit("x"), i.cast("string")
                ),
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
        .localCheckpoint()
    )
    n = docs.count()
    results: dict[str, float] = {"n_docs": n, "n_tokens_per_doc": N_TOKENS}

    from psyndex2linkeddata_spark.operators.lm import lm_mean_nll
    from psyndex2linkeddata_spark.operators.retrieval import bm25_topk

    queries = docs.where(F.col("doc_id") % 500 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.substring("text", 1, 200).alias("query_text"),
    )
    t0 = time.time()
    hits = bm25_topk(docs, queries, k=10)
    n_hits = hits.count()
    results["bm25_topk_s"] = round(time.time() - t0, 1)
    results["bm25_queries"] = n // 500
    results["bm25_hits"] = n_hits

    model = docs.where(F.col("doc_id") % 23 == 0)
    t0 = time.time()
    nll = lm_mean_nll(docs, model, vocab_size=50_000, alpha=0.5)
    stats = nll.agg(
        F.count(F.lit(1)).alias("rows"),
        F.round(F.avg("mean_nll"), 3).alias("avg_nll"),
    ).collect()[0]
    results["lm_mean_nll_s"] = round(time.time() - t0, 1)
    results["lm_rows"] = stats["rows"]
    results["lm_avg_nll"] = float(stats["avg_nll"])

    print(json.dumps(results))


if __name__ == "__main__":
    main()

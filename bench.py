"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32).

Prints ONE JSON line:
  {"metric": "kg_triples_per_sec", "value": N, "unit": "triples/sec",
   "queries": {name: seconds, ...}, "sf": 0.1, ...}

Timings force FULL materialization via the noop sink (df.count() would let
Catalyst prune the computed columns). The headline metric is KG-pipeline
throughput (pages → deduplicated triples) on a synthetic corpus sized by
$SPARK_GRAFT_PAGES (default 20000) — the `triples/sec` target from
BASELINE.json. tools/scaling_bench.py reruns this at two parallelism
levels for the N-vs-4N efficiency evidence (BENCH.md).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("SPARK_GRAFT_PAGES", "20000"))

BENCH_QUERIES = [
    "kg_triples",
    "pricing_summary",
    "top_customers",
    "sessionize",
    "minhash_lsh",
    "neardup_clusters",
    "incremental_neardup",
    "semantic_dedup",
    "dsir_select",
    "chunk_text",
    "cdc_chunks",
    "pack_sequences",
    "host_cap",
    "line_dedup",
    "extract_text",
    "snapshot_dedup",
    "pii_scrub",
    "repetition",
    "mix_sample",
    "decontaminate",
    "corpus_prep",
    "ngram_jaccard",
    "simhash",
    "embedding_topk",
    "lsh_topk",
    "bm25_topk",
    "lm_perplexity",
    "nb_classify",
    "corpus_stats",
    "lang_id",
    "lang_id_ngram",
    "quality",
    "token_counts",
    "fingerprints",
    "connected_components",
    "pagerank",
    "hits",
    "kg_stats",
    "bpe_tokens",
    "bgp_query",
    "path_query",
    "last_wins",
    "skos_hygiene",
    "work_extraction",
    "dublettencheck",
]


def _noop_write(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    import __spark_entry__ as entrymod
    from psyndex2linkeddata_spark.datagen.pages import write_pages_parquet
    from psyndex2linkeddata_spark.plans.pipeline import build_triples
    from psyndex2linkeddata_spark.session import get_spark

    # The driver's sf tables are single small parquet files → a default
    # 128MB maxPartitionBytes yields ONE input split and serializes every
    # narrow stage on one core. Locally we split aggressively; on a real
    # cluster inputs arrive as many Iceberg splits and the default stands.
    spark = get_spark(
        app_name="bench",
        master=f"local[{CPUS}]",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(512 * 1024),
            "spark.sql.files.openCostInBytes": str(64 * 1024),
        },
    )
    sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", "") or 0.1)

    # SPARK_GRAFT_BENCH_QUERIES: comma list to restrict, or "none" to skip
    # (the scaling bench only needs the pipeline number)
    sel = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    bench_queries = (
        [] if sel == "none" else (sel.split(",") if sel else BENCH_QUERIES)
    )
    results: dict[str, float] = {}
    queries = entrymod.queries()
    for name in bench_queries:
        # untimed warm-up run first: whole-stage-codegen compilation and
        # JVM JIT dominate a query's FIRST execution on a cold JVM
        # (measured 8.1s → 1.5s for the identical minhash-signature job
        # back to back), and without this the recorded number mostly
        # reflects how much earlier queries happened to warm the same
        # code paths. The timed run then measures data throughput — the
        # quantity that scales to the design point.
        _noop_write(queries[name](spark, SF_DIR))
        # construction is inside the timer: iterative operators (connected
        # components) do their driver-loop work during construction
        t0 = time.time()
        df = queries[name](spark, SF_DIR)
        _noop_write(df)
        results[name] = round(time.time() - t0, 3)
        # iterative operators (connected components, pagerank, hits,
        # path closure) localCheckpoint per round; those RDD blocks are
        # NOT released by clearCache and accumulate across a 40+-query
        # session, squeezing execution memory for later queries (the
        # pipeline measured ~2x slower at the end of a full sweep than
        # in isolation). Drop them between queries.
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()

    # headline: full KG pipeline throughput on a synthetic pages corpus
    # (SPARK_GRAFT_PAGES_PATH lets tools/scaling_bench.py generate once and
    # share the identical input between parallelism levels)
    pages_path = os.environ.get("SPARK_GRAFT_PAGES_PATH")
    if not pages_path:
        d = tempfile.mkdtemp(prefix="bench_pages_")
        pages_path = os.path.join(d, "pages.parquet")
        write_pages_parquet(pages_path, N_PAGES)
    # one generated file → spread across cores before the emit stage.
    # Task size is bounded by pages, not just cores: each emit task also
    # runs the map-side partial dedup, and a >1M-triple partial hash map
    # is GC-bound (measured 2.7× worse than linear at 500k pages with
    # cores*3 tasks). The footprint that matters is PER HEAP, not per
    # task: in local mode all CPUS concurrent partial maps share one JVM,
    # so the per-task page budget shrinks with concurrency — measured at
    # 100k pages: local[8] runs 16% faster at 1000 pages/task than 2000
    # (34.8s→29.2s) while local[2] is flat-to-worse below 2000 (108.0s at
    # 2000, 113.8s at 1000); under 1000 the task-scheduling overhead
    # dominates (43.2s at 250/task on 8 cores). clamp(8000/CPUS) hits
    # both measured optima. On a real cluster the same budget arrives as
    # maxPartitionBytes-bounded scan splits sized against executor heap
    # per core, and the default stands.
    pages_per_task = int(
        os.environ.get("SPARK_GRAFT_TASK_PAGES", "0")
    ) or min(2000, max(1000, 8000 // max(CPUS, 1)))
    n_parts = max(CPUS * 3, N_PAGES // pages_per_task)
    pages = spark.read.parquet(pages_path).repartition(n_parts)
    # Warm-up on a tiny slice: pays the one-time driver-side costs (py4j
    # Column-tree construction, codegen, JIT) outside the measurement —
    # at the 10^12-page design point those are noise; the metric is data
    # throughput. The lazy barrier means nothing computes at construction,
    # so the timed noop write covers the whole distributed job.
    _noop_write(build_triples(pages.limit(32)))
    # SPARK_GRAFT_REPS: repeat the timed run in-process and take the
    # minimum — the sandbox host's CPU quota varies up to 3× between
    # minutes (documented in BENCH.md), and the headline needs the
    # machine's true capability, not the noise floor. Default 2: one
    # repeat halves the odds of reporting a throttled window and costs
    # ~6s.
    reps = int(os.environ.get("SPARK_GRAFT_REPS", "2"))
    pipeline_s = float("inf")
    triples = None
    for _ in range(max(reps, 1)):
        triples = build_triples(pages)
        t0 = time.time()
        _noop_write(triples)
        pipeline_s = min(pipeline_s, time.time() - t0)
        spark.catalog.clearCache()  # release any barrier cache between reps
    n_triples = triples.count()  # once, outside the timed region
    results["kg_pipeline"] = round(pipeline_s, 3)

    out = {
        "metric": "kg_triples_per_sec",
        "value": round(n_triples / pipeline_s, 1),
        "unit": "triples/sec",
        "queries": results,
        "sf": sf,
        "cpus": CPUS,
        "pages": N_PAGES,
        "n_triples": n_triples,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

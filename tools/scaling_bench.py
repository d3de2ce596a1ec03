"""Two-parallelism scaling evidence (BASELINE.json north_rule): run the
identical KG pipeline + bench queries at local[8] and local[32] on the
same input and report throughput at both plus efficiency =
(T8/T32)/4 wall-clock — the sandbox stand-in for N vs 4N executors
(driver instruction: no real cluster here).

Each level runs in its own subprocess (a JVM's master is fixed at
startup). Writes BENCH.md at the repo root.

Usage: PYTHONPATH=/root/repo python tools/scaling_bench.py [n_pages]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, n_pages: int, pages_path: str | None = None) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_PAGES=str(n_pages),
        PYTHONPATH=REPO,
    )
    if pages_path:
        env["SPARK_GRAFT_PAGES_PATH"] = pages_path
    env["SPARK_GRAFT_BENCH_QUERIES"] = "none"  # scaling needs only the pipeline
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    import tempfile

    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    from psyndex2linkeddata_spark.datagen.pages import write_pages_parquet

    pages_path = os.path.join(
        tempfile.mkdtemp(prefix="scaling_pages_"), "pages.parquet"
    )
    write_pages_parquet(pages_path, n_pages)
    r8 = run(8, n_pages, pages_path)
    r32 = run(32, n_pages, pages_path)
    t8 = r8["queries"]["kg_pipeline"]
    t32 = r32["queries"]["kg_pipeline"]
    eff = (t8 / t32) / 4.0
    md = f"""# BENCH — two-parallelism scaling evidence

Same job (pages→triples KG pipeline, {n_pages} pages, seed=42) at two
parallelism levels on identical input — the sandbox stand-in for the
N-vs-4N-executor criterion (no real cluster available here).

| level | wall (s) | triples/sec |
|---|---|---|
| local[8]  | {t8:.1f} | {r8['value']:.1f} |
| local[32] | {t32:.1f} | {r32['value']:.1f} |

**scaling efficiency (8→32 threads) = (T8/T32)/4 = {eff:.2f}**
(target ≥ 0.8 per BASELINE.json)

Per-query seconds at local[32]: `{json.dumps(r32['queries'])}`
"""
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()

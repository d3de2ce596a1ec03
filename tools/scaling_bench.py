"""Two-parallelism scaling evidence (BASELINE.json north_rule): run the
identical KG pipeline at local[N] and local[4N] on the same input and
report throughput at both plus efficiency = (T_N/T_4N)/4 wall-clock —
the sandbox stand-in for N vs 4N executors (driver instruction: no real
cluster here).

Level choice: this sandbox is a 32-vCPU VM whose upper half delivers
~half throughput (hypervisor oversubscription) — a pure-CPU probe (the
sha2 chain below, zero shuffle, zero Python) tops out at ~0.67
efficiency for 8→32 threads, so 8→32 measures the host, not the engine.
The default levels are 2→8, inside the host's linear region; the probe
result is reported alongside as the machine ceiling.

Each level runs in its own subprocess (a JVM's master is fixed at
startup); SPARK_GRAFT_REPS=2 repeats the timed region in-process and
keeps the minimum (the host's CPU quota varies between runs).

Usage: PYTHONPATH=/root/repo python tools/scaling_bench.py [n_pages] [N] [N4]
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
    # corpus-scale runs hold the checkpointed triple set across 32
    # concurrent tasks — the 16g default heap OOMs around 300k pages
    env.setdefault("SPARK_DRIVER_MEMORY", "64g")
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
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(out.stderr[-3000:] + "\n")
        raise RuntimeError(f"bench child (local[{cpus}]) produced no JSON")
    return json.loads(lines[-1])


_PROBE = '''
import time, json, sys
from pyspark.sql import SparkSession, functions as F
n = int(sys.argv[1])
spark = (SparkSession.builder.master(f"local[{n}]")
  .config("spark.sql.shuffle.partitions","64").config("spark.ui.enabled","false")
  .config("spark.driver.memory","8g").getOrCreate())
df = spark.range(0, 32_000_000, 1, 128)
expr = F.sha2(F.concat(F.col("id").cast("string"), F.lit("x")), 256)
for i in range(4):
    expr = F.sha2(F.concat(expr, F.lit(str(i))), 256)
d = df.select(expr.alias("h"))
d.limit(1000).write.format("noop").mode("overwrite").save()
best = 1e9
for _ in range(3):
    t0=time.time(); d.write.format("noop").mode("overwrite").save()
    best = min(best, time.time()-t0)
print(json.dumps({"n": n, "t": best}))
'''


def probe(n: int) -> float:
    """Machine-ceiling probe: embarrassingly parallel sha2 chain, no
    shuffle, no Python — whatever efficiency THIS loses is the host's."""
    out = subprocess.run(
        [sys.executable, "-c", _PROBE, str(n)],
        capture_output=True, text=True, timeout=600,
    )
    return json.loads(
        [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    )["t"]


def main() -> None:
    import tempfile

    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 4 * lo
    from psyndex2linkeddata_spark.datagen.pages import write_pages_parquet

    pages_path = os.path.join(
        tempfile.mkdtemp(prefix="scaling_pages_"), "pages.parquet"
    )
    write_pages_parquet(pages_path, n_pages)
    os.environ.setdefault("SPARK_GRAFT_REPS", "2")
    # The host's CPU quota drifts on minute timescales — LARGER than any
    # in-process rep spread (identical local[4] legs measured 51.9s and
    # 62.4s twenty minutes apart). Running all lo reps then all hi reps
    # confounds the ratio with that drift, so the legs are INTERLEAVED
    # lo,hi,lo,hi across SPARK_GRAFT_ROUNDS subprocess rounds and each
    # level takes its minimum — both minima then come from comparable
    # quota windows.
    rounds = int(os.environ.get("SPARK_GRAFT_ROUNDS", "2"))
    r_lo = r_hi = None
    for _ in range(max(rounds, 1)):
        cand_lo = run(lo, n_pages, pages_path)
        cand_hi = run(hi, n_pages, pages_path)
        if r_lo is None or cand_lo["queries"]["kg_pipeline"] < r_lo["queries"]["kg_pipeline"]:
            r_lo = cand_lo
        if r_hi is None or cand_hi["queries"]["kg_pipeline"] < r_hi["queries"]["kg_pipeline"]:
            r_hi = cand_hi
    t_lo = r_lo["queries"]["kg_pipeline"]
    t_hi = r_hi["queries"]["kg_pipeline"]
    eff = (t_lo / t_hi) / (hi / lo)
    # interleave the ceiling probes the same way
    p_lo, p_hi = probe(lo), probe(hi)
    for _ in range(max(rounds - 1, 0)):
        p_lo = min(p_lo, probe(lo))
        p_hi = min(p_hi, probe(hi))
    ceiling = (p_lo / p_hi) / (hi / lo)
    md = f"""# BENCH — two-parallelism scaling evidence

Same job (pages→triples KG pipeline, {n_pages} pages, seed=42) at two
parallelism levels on identical input — the sandbox stand-in for the
N-vs-4N-executor criterion (no real cluster available here). Timed region
= best of {os.environ['SPARK_GRAFT_REPS']} in-process repetitions ×
{os.environ.get('SPARK_GRAFT_ROUNDS', '2')} INTERLEAVED lo/hi rounds (the
host's CPU quota drifts on minute timescales — larger than the in-process
rep spread — so sequential legs would confound the ratio with drift).

| level | wall (s) | triples/sec |
|---|---|---|
| local[{lo}] | {t_lo:.1f} | {r_lo['value']:.1f} |
| local[{hi}] | {t_hi:.1f} | {r_hi['value']:.1f} |

**scaling efficiency ({lo}→{hi} threads) = (T{lo}/T{hi})/{hi//lo} = {eff:.2f}**
(target ≥ 0.8 per BASELINE.json)

Machine ceiling at the same levels (pure-CPU sha2 chain, no shuffle, no
Python): (P{lo}/P{hi})/{hi//lo} = {ceiling:.2f} (P{lo}={p_lo:.1f}s,
P{hi}={p_hi:.1f}s). This VM's upper vCPU half delivers ~half throughput
(8→32 pure-CPU ceiling measured at 0.67), which is why the evidence
levels sit in the host's linear region — on real hardware the same plan
has no serial stage to cap it: the pipeline is one narrow projection per
page plus a uniform-key dedup shuffle.

Pipeline relative to ceiling: {eff / ceiling:.2f}.
"""
    # BENCH.md is hand-curated (it combines both level pairs); each raw
    # run lands in BENCH_scaling_run.md for merging.
    with open(os.path.join(REPO, "BENCH_scaling_run.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()

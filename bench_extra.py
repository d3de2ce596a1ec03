"""Optimization-round measurement harness (guide §1: measure first).

bench.py is FROZEN for driver measurement; this file holds the extra
instrumentation the optimization work needs:

  python bench_extra.py [--sf DIR] [--reps N] [--explain OUTDIR] q1 q2 ...

Per query: one untimed warm-up noop write (codegen/JIT), then `reps`
timed noop writes (median + min reported) — identical methodology to
bench.py's timed region so numbers are comparable. With --explain the
`.explain("formatted")` text is written to OUTDIR/<query>_<tag>.txt
(tag from --tag, default 'plan').

Prints one JSON line: {"sf": ..., "queries": {name: {"min": s, "med": s,
"samples": [...]}}}.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain", default=None, help="dir for explain('formatted') dumps")
    ap.add_argument("--tag", default="plan")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from psyndex2linkeddata_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="bench_extra",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(512 * 1024),
            "spark.sql.files.openCostInBytes": str(64 * 1024),
        },
    )
    queries = entrymod.queries()
    out: dict[str, dict] = {}
    for name in args.queries:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}:warmup")
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn(spark, args.sf).explain("formatted")
            with open(
                os.path.join(args.explain, f"{name}_{args.tag}.txt"), "w"
            ) as f:
                f.write(buf.getvalue())
        samples = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}:rep{i}")
            t0 = time.time()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
            for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                rdd.unpersist()
            spark.catalog.clearCache()
        out[name] = {
            "min": min(samples),
            "med": round(statistics.median(samples), 3),
            "samples": samples,
        }
        print(f"# {name}: min={min(samples)} samples={samples}", file=sys.stderr)
    print(json.dumps({"sf": args.sf, "queries": out}))


if __name__ == "__main__":
    main()

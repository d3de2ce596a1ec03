"""Dump .explain('formatted') for declared queries to plans/<dir>/.

  python tools/dump_plans.py plans/r06 before q1 q2 ...

Construction-only (no execution) — used to record before/after plan
shapes for the optimization round.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, tag, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from psyndex2linkeddata_spark.session import get_spark

    spark = get_spark(app_name="dump_plans", master="local[4]")
    os.makedirs(outdir, exist_ok=True)
    queries = entrymod.queries()
    for name in names:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            queries[name](spark, sf).explain("formatted")
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print("wrote", path)


if __name__ == "__main__":
    main()

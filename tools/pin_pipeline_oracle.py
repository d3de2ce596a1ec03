"""Recompute the pinned constants for the kg_pipeline_synthetic driver
oracle (__spark_entry__.oracle_sql()['kg_pipeline_synthetic']).

The 150-page corpus is fully seeded (datagen/pages.py, seed=42), so the
pipeline's triple count and order-independent crc32 content aggregate are
deterministic. Whenever datagen or emit semantics change intentionally,
re-run this and paste the printed SQL into oracle_sql().

Usage: python tools/pin_pipeline_oracle.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    from psyndex2linkeddata_spark.session import get_spark

    spark = get_spark(master="local[8]")
    row = entry.queries()["kg_pipeline_synthetic"](spark, "").collect()[0]
    print(
        "select cast(%d as bigint) as n_triples, cast(%d as bigint) as content_crc"
        % (row.n_triples, row.content_crc)
    )


if __name__ == "__main__":
    main()

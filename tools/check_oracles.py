"""Local stand-in for the driver's correctness gate: run each
__spark_entry__.queries() entry and its oracle_sql() on the same sf dir,
compare row count + order-insensitive value multiset.

Usage: PYTHONPATH=/root/repo python tools/check_oracles.py [sf_dir] [name ...]

Set CHECK_ORACLES_EXACT=1 to compare doubles bit-for-bit (float.hex)
instead of at 1e-6 — the driver's gate hashes values, so a query that
passes only at 1e-6 here can still hash-mismatch there (that is exactly
how corpus_stats/hybrid_rrf slipped through in round 4)."""

from __future__ import annotations

import os
import sys
from collections import Counter

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from psyndex2linkeddata_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


EXACT = os.environ.get("CHECK_ORACLES_EXACT", "") == "1"


def norm_cell(v):
    import datetime
    import math

    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if EXACT:
            return v.hex()
        return f"{v:.6f}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return repr(v)


def multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(
        tuple(norm_cell(r[i]) for i in order) for r in rows
    )


def main():
    # default to sf0.01 — the driver's gate scale; the bpe_tokens oracle
    # pins constants computed AT sf0.01 (sf0.001 has the same 500-doc
    # shape but different text, so it mismatches there by construction)
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]", app_name="check_oracles")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"create view {t} as select * from '{sf}/{t}.parquet'"
        )
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf)
            sdata = df.collect()
            scols = df.columns
        except Exception as e:
            print(f"{name:24s} SPARK ERROR: {type(e).__name__}: {str(e)[:200]}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(sdata)} rows, cols={scols}")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [c.lower() for c in rel.columns]
            odata = rel.fetchall()
        except Exception as e:
            print(f"{name:24s} DUCKDB ERROR: {type(e).__name__}: {str(e)[:200]}")
            failed.append(name)
            continue
        s_ms = multiset([tuple(r) for r in sdata], [c.lower() for c in scols])
        o_ms = multiset(odata, ocols)
        if sorted(c.lower() for c in scols) != sorted(ocols):
            print(f"{name:24s} SCHEMA MISMATCH spark={scols} duck={rel.columns}")
            failed.append(name)
        elif s_ms == o_ms:
            print(f"{name:24s} OK ({len(sdata)} rows)")
        else:
            only_s = list((s_ms - o_ms).items())[:3]
            only_o = list((o_ms - s_ms).items())[:3]
            print(
                f"{name:24s} VALUE MISMATCH rows spark={len(sdata)} duck={len(odata)}"
            )
            for t, c in only_s:
                print(f"    S {c}x {t}")
            for t, c in only_o:
                print(f"    D {c}x {t}")
            failed.append(name)
    print("\nFAILED:", failed if failed else "none")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()

"""Compare the Spark pipeline's triples against the reference's golden
TTL on the reference's own corpus (xml-data/records-440.xml →
ttl-data/bibframe_records.ttl).

The golden TTL covers a 200-record subset of the 342-record XML export;
the comparison restricts both sides to the DFKs present in the TTL.

Usage: PYTHONPATH=/root/repo python tools/compare_reference.py [--per-pred N]
Prints P/R overall, then the top mismatching predicates with examples.
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

XML = "/root/reference/xml-data/records-440.xml"
TTL = "/root/reference/ttl-data/bibframe_records.ttl"

ADMIN_SUBJ = "https://w3id.org/zpid/bibframe/records/"


def golden_triples():
    from psyndex2linkeddata_spark.sources.turtle import parse_turtle

    with open(TTL, encoding="utf-8") as f:
        tr = parse_turtle(f.read())
    out = set()
    for t in tr:
        s = t[0]
        if s.startswith("_:") or s == ADMIN_SUBJ:
            continue
        if t[3] and str(t[2]).startswith("_:"):
            continue
        out.add(tuple(t))
    return out


def golden_dfks(golden):
    dfks = set()
    for s, *_ in golden:
        m = re.match(r"https://w3id\.org/zpid/resources/instancebundles/(\d{7})$", s)
        if m:
            dfks.add(m.group(1))
    return dfks


def main():
    golden = golden_triples()
    dfks = golden_dfks(golden)
    print(f"golden: {len(golden)} triples, {len(dfks)} DFKs", file=sys.stderr)

    from psyndex2linkeddata_spark.session import get_spark
    from psyndex2linkeddata_spark.sources.starxml import star_xml_pages
    from psyndex2linkeddata_spark.plans.pipeline import build_triples
    from pyspark.sql import functions as F

    spark = get_spark(master="local[8]")
    pages = star_xml_pages(spark, XML)
    pages = pages.where(
        F.col("url").isin([f"starxml://{d}" for d in sorted(dfks)])
    )
    ours_df = build_triples(pages)
    ours = set(
        (r.subj, r.pred, r.obj, r.obj_is_iri, r.lang, r.dtype)
        for r in ours_df.collect()
    )
    print(f"ours: {len(ours)} triples", file=sys.stderr)

    inter = ours & golden
    p = len(inter) / max(len(ours), 1)
    r = len(inter) / max(len(golden), 1)
    print(f"\nP={p:.4f} R={r:.4f} inter={len(inter)} ours={len(ours)} golden={len(golden)}")

    per_pred_n = int(sys.argv[sys.argv.index("--per-pred") + 1]) if "--per-pred" in sys.argv else 2
    miss = golden - ours          # recall gaps
    extra = ours - golden         # precision gaps
    print("\n== MISSING (in golden, not ours) by predicate ==")
    for pred, c in Counter(t[1] for t in miss).most_common(40):
        print(f"{c:6d} {pred}")
        for ex in [t for t in sorted(miss) if t[1] == pred][:per_pred_n]:
            print(f"        {ex}")
    print("\n== EXTRA (ours, not in golden) by predicate ==")
    for pred, c in Counter(t[1] for t in extra).most_common(40):
        print(f"{c:6d} {pred}")
        for ex in [t for t in sorted(extra) if t[1] == pred][:per_pred_n]:
            print(f"        {ex}")


if __name__ == "__main__":
    main()

"""Golden triple-set comparison: Spark pipeline vs pure-Python oracle.

The P/R ≥ 0.95 gate from BASELINE.json (`golden_triples`, FIXTURES.md §4):
the distributed columnar emit must reproduce the row-at-a-time reference
semantics. Any asymmetric difference is printed for debugging.
"""

from __future__ import annotations

import pytest

from psyndex2linkeddata_spark.datagen.pages import make_records
from psyndex2linkeddata_spark.plans.pipeline import build_triples
from tests.golden_oracle import golden_triples

N_RECORDS = 120


@pytest.fixture(scope="module")
def spark_triples(spark, pages):
    rows = build_triples(pages).collect()
    return {
        (r.subj, r.pred, r.obj, r.obj_is_iri, r.lang, r.dtype) for r in rows
    }


def test_triple_precision_recall(spark_triples, pages):
    n = pages.count()
    golden = golden_triples(make_records(n))
    inter = spark_triples & golden
    precision = len(inter) / len(spark_triples)
    recall = len(inter) / len(golden)
    if precision < 1.0 or recall < 1.0:
        only_spark = sorted(spark_triples - golden)[:25]
        only_golden = sorted(golden - spark_triples)[:25]
        print(f"\nprecision={precision:.4f} recall={recall:.4f}")
        print(f"spark-only ({len(spark_triples - golden)}):")
        for t in only_spark:
            print("  S", t)
        print(f"golden-only ({len(golden - spark_triples)}):")
        for t in only_golden:
            print("  G", t)
    assert precision >= 0.95, f"precision {precision:.4f} < 0.95"
    assert recall >= 0.95, f"recall {recall:.4f} < 0.95"

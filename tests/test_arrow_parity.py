"""Arrow-emitter parity gate: the mapInPandas hot path (emit/arrow.py)
must produce EXACTLY the triple set of the declarative Column path for
the same input — including the kill-list and the J13-J15 offline-linking
resolution maps. This is what lets the engine run the Python emitter at
scale while the Column layer remains the citable spec."""

from __future__ import annotations

import os

from psyndex2linkeddata_spark.plans.pipeline import build_triples


def _tset(df):
    return {(r.subj, r.pred, r.obj, r.obj_is_iri, r.lang, r.dtype) for r in df.collect()}


def test_arrow_matches_columns_plain(spark, pages):
    a = _tset(build_triples(pages, emit_mode="arrow"))
    c = _tset(build_triples(pages, emit_mode="columns"))
    assert a == c, (
        f"arrow-only={len(a - c)} column-only={len(c - a)}; "
        f"examples: {sorted(a ^ c)[:5]}"
    )


def test_arrow_matches_columns_records_input(spark, pages):
    """records-shaped input (post-extract) through the same Arrow stage.

    The column side runs through clean_genres because the Arrow emitter
    applies the A2 thesis-vs-Scholarly rule in-record."""
    from psyndex2linkeddata_spark.emit.arrow import emit_triples_arrow
    from psyndex2linkeddata_spark.emit.normalize import normalize
    from psyndex2linkeddata_spark.extract.parser import extract_records
    from psyndex2linkeddata_spark.operators.upsert import clean_genres
    from psyndex2linkeddata_spark.plans.pipeline import emit_triples

    records = extract_records(pages)
    a = _tset(emit_triples_arrow(records).dropDuplicates())
    c = _tset(clean_genres(emit_triples(normalize(records)).dropDuplicates()))
    assert a == c, f"arrow-only={len(a - c)} column-only={len(c - a)}"


def test_arrow_matches_columns_with_authorities(spark, pages, fixture_dir):
    """Kill-list + Crossref/TESTG resolution maps applied in-stage."""
    names = ("auth_orgs", "auth_concepts", "bad_ids", "auth_crossref", "auth_tests")
    loaded = {}
    for n in names:
        p = os.path.join(fixture_dir, f"{n}.parquet")
        if os.path.exists(p):
            loaded[n] = spark.read.parquet(p)
    authorities = {
        k: v
        for k, v in (
            ("auth_orgs", loaded.get("auth_orgs")),
            ("auth_concepts", loaded.get("auth_concepts")),
            ("bad_ids", loaded.get("bad_ids")),
            ("crossref", loaded.get("auth_crossref")),
            ("tests", loaded.get("auth_tests")),
        )
        if v is not None
    }
    a = _tset(build_triples(pages, authorities, emit_mode="arrow"))
    c = _tset(build_triples(pages, authorities, emit_mode="columns"))
    assert a == c, (
        f"arrow-only={len(a - c)} column-only={len(c - a)}; "
        f"examples: {sorted(a ^ c)[:5]}"
    )

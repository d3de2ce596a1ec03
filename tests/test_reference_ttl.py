"""Golden gates against the REFERENCE's own checked-in outputs.

The reference ships per-operator golden TTLs generated from checked-in
input corpora (testing/RPLIC/test_rplic.py → test_rplic.ttl, ...). These
tests run the Spark pipeline over the same inputs and require the triple
sets to match EXACTLY (P=R=1.0) after mapping our DFK-based work URIs to
the reference's testgraph ones. Unlike tests/test_golden.py (which
compares against a self-written oracle on synthetic records), this gate
validates against output produced by the reference itself.

The reference's live Crossref lookups are reproduced with the offline
authority slice from tests/reference_fixtures.py (golden-kept DOIs with
their bibliographic metadata; rejected DOIs deliberately absent).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from psyndex2linkeddata_spark.plans.pipeline import build_triples
from psyndex2linkeddata_spark.schema import pages_schema
from psyndex2linkeddata_spark.sources.turtle import parse_turtle
from tests.reference_fixtures import (
    REF_WORKS,
    RPLIC_TTL,
    load_rplic_strings,
    rplic_crossref_authority,
)

OUR_WORKS = "https://w3id.org/zpid/resources/works/"


def _golden(path: str, node_marker: str) -> set:
    out = set()
    with open(path, encoding="utf-8") as f:
        for t in parse_turtle(f.read()):
            if node_marker in t[0] or (t[3] and node_marker in str(t[2])):
                out.add(tuple(t))
    return out


def test_rplic_matches_reference_ttl(spark):
    strings = load_rplic_strings()
    golden = _golden(RPLIC_TTL, "#ReplicationRelationship")

    rows = []
    for i, s in enumerate(strings):
        dfk = f"9{i:06d}"
        rows.append((f"starxml://{dfk}", None, None, f"DFK {dfk}\nRPLIC {s}", None))
    pages = spark.createDataFrame(rows, schema=pages_schema())
    auth = spark.createDataFrame(
        rplic_crossref_authority(), "doi string, title string, authors string"
    )
    triples = build_triples(
        pages, authorities={"crossref": auth, "crossref_search_threshold": 45.0}
    )

    ours = set()
    for r in triples.where(
        F.col("subj").contains("#ReplicationRelationship")
        | F.col("obj").contains("#ReplicationRelationship")
    ).collect():
        s, o = r.subj, r.obj
        for i in range(len(strings)):
            dfk = f"9{i:06d}"
            s = s.replace(f"{OUR_WORKS}{dfk}_work", f"{REF_WORKS}{i}")
            if r.obj_is_iri:
                o = str(o).replace(f"{OUR_WORKS}{dfk}_work", f"{REF_WORKS}{i}")
        ours.add((s, r.pred, o, r.obj_is_iri, r.lang, r.dtype))

    missing = golden - ours
    extra = ours - golden
    assert not missing and not extra, (
        f"RPLIC vs reference TTL: {len(missing)} missing, {len(extra)} extra\n"
        + "\n".join(f"MISS {t}" for t in sorted(missing)[:10])
        + "\n".join(f"XTRA {t}" for t in sorted(extra)[:10])
    )

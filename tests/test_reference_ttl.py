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
    TESTG_TTL,
    load_rplic_strings,
    load_testg_strings,
    rplic_crossref_authority,
    build_testg_auth_rows,
)

OUR_WORKS = "https://w3id.org/zpid/resources/works/"

# Golden drift: testg.ttl was generated before the reference's current
# title_except gained hyphen-aware ALLCAPS matching. Its CURRENT code
# (helpers.py:95-154, exec-verified) produces 'Dsm-III-R,' for the SIDAM
# long name — our port matches the current code, the old golden doesn't.
_TESTG_GOLDEN_DRIFT = {
    (
        f"{REF_WORKS}20#TestRelationship_test_longName",
        "http://id.loc.gov/ontologies/bibframe/mainTitle",
    )
}


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


def test_testg_matches_reference_ttl(spark):
    strings = load_testg_strings()
    golden = _golden(TESTG_TTL, "#TestRelationship")

    rows = []
    for i, s in enumerate(strings):
        dfk = f"8{i:06d}"
        rows.append((f"starxml://{dfk}", None, None, f"DFK {dfk}\nTESTG {s}", None))
    pages = spark.createDataFrame(rows, schema=pages_schema())
    auth = spark.createDataFrame(
        build_testg_auth_rows(), "test_id string, long_name string"
    )
    triples = build_triples(pages, authorities={"tests": auth})

    ours = set()
    for r in triples.where(
        F.col("subj").contains("#TestRelationship")
        | F.col("obj").contains("#TestRelationship")
    ).collect():
        s, o = r.subj, str(r.obj)
        for i in range(len(strings)):
            dfk = f"8{i:06d}"
            s = s.replace(f"{OUR_WORKS}{dfk}_work", f"{REF_WORKS}{i}")
            if r.obj_is_iri:
                o = o.replace(f"{OUR_WORKS}{dfk}_work", f"{REF_WORKS}{i}")
        # the golden was built by the single-entry testg.py harness
        # (unnumbered relationship URI); the pipeline numbers 1-based
        s = s.replace("#TestRelationship1", "#TestRelationship")
        if r.obj_is_iri:
            o = o.replace("#TestRelationship1", "#TestRelationship")
        ours.add((s, r.pred, o, r.obj_is_iri, r.lang, r.dtype))

    missing = {t for t in golden - ours if (t[0], t[1]) not in _TESTG_GOLDEN_DRIFT}
    extra = {t for t in ours - golden if (t[0], t[1]) not in _TESTG_GOLDEN_DRIFT}
    assert not missing and not extra, (
        f"TESTG vs reference TTL: {len(missing)} missing, {len(extra)} extra\n"
        + "\n".join(f"MISS {t}" for t in sorted(missing)[:10])
        + "\n".join(f"XTRA {t}" for t in sorted(extra)[:10])
    )


def test_thesis_values_match_reference_ttl(spark):
    """Value-level checks against testing/Thesis-Fields/test_thesis.ttl.

    No full triple-set gate here: that TTL was produced by an
    experimental harness that diverges from the production converter the
    pipeline mirrors (it emits the raw unsplit AUP as familyName and the
    literal 'None' as givenName for record 1 — a harness bug, not
    pipeline semantics). The production-meaningful values — thesis date
    parsing (PD '19.12.2006'/'14.12.99' → ISO, 'N. N.' → PROMY fallback),
    degree literals, advisor/reviewer name splits and roles — are gated
    against the golden values."""
    rows = [
        (
            "starxml://7000000", None, None,
            "DFK 7000000\nBE SM\nDT 61\nDT2 01\nAUP Naumer, Marcus Johannes |f AU\n"
            "GRAD Dr. phil.\nPD 19.12.2006\nPROMY 2006\nHRF Goebel, R. W.",
            None,
        ),
        (
            "starxml://7000001", None, None,
            "DFK 7000001\nBE SH\nDT 61\nGRAD Dr. habil.\nPD 14.12.99\nPROMY 2009",
            None,
        ),
        (
            "starxml://7000002", None, None,
            "DFK 7000002\nBE SH\nDT 61\nAUP Olteteanu, Ana-Maria\nGRAD Dr. rer. nat.\n"
            "PD N. N.\nPROMY 2016\nHRF Freksa, C.\nKRF Plaza, Enric\nKRF Sloman, Aaron",
            None,
        ),
    ]
    pages = spark.createDataFrame(rows, schema=pages_schema())
    got = {
        (r.subj, r.pred, r.obj)
        for r in build_triples(pages)
        .where(
            F.col("subj").contains("#dissertation")
            | F.col("subj").contains("#thesis_")
        )
        .collect()
    }
    W = OUR_WORKS
    BF = "http://id.loc.gov/ontologies/bibframe/"
    SCHEMA = "https://schema.org/"
    expected = {
        # golden: works/0#dissertation bf:date "2006-12-19" / degree "Dr. phil."
        (f"{W}7000000_work#dissertation", BF + "date", "2006-12-19"),
        (f"{W}7000000_work#dissertation", BF + "degree", "Dr. phil."),
        # golden: works/1 PD '14.12.99' → "1999-12-14"
        (f"{W}7000001_work#dissertation", BF + "date", "1999-12-14"),
        (f"{W}7000001_work#dissertation", BF + "degree", "Dr. habil."),
        # golden: works/2 PD 'N. N.' → PROMY "2016"
        (f"{W}7000002_work#dissertation", BF + "date", "2016"),
        # golden: advisor/reviewer splits + roles
        (f"{W}7000000_work#thesis_advisor_person", SCHEMA + "familyName", "Goebel"),
        (f"{W}7000000_work#thesis_advisor_person", SCHEMA + "givenName", "R. W."),
        # the harness golden has http for ths; the PRODUCTION converter
        # (research_info.py:1883) uses https — we follow production
        (
            f"{W}7000000_work#thesis_advisor",
            BF + "role",
            "https://id.loc.gov/vocabulary/relators/ths",
        ),
        (f"{W}7000002_work#thesis_reviewer_1_person", SCHEMA + "familyName", "Plaza"),
        (f"{W}7000002_work#thesis_reviewer_1_person", SCHEMA + "givenName", "Enric"),
        (f"{W}7000002_work#thesis_reviewer_2_person", SCHEMA + "familyName", "Sloman"),
        (
            f"{W}7000002_work#thesis_reviewer_2",
            BF + "role",
            "https://id.loc.gov/vocabulary/relators/dgc",
        ),
    }
    missing = expected - got
    assert not missing, f"thesis golden values missing: {sorted(missing)}"


def test_documentation_example_ttls_parse():
    """The reference's hand-written documentation examples exercise
    Turtle syntax shapes rdflib's serializer never emits; the parser
    (sources/turtle.py, S5) must read all of them. Counts pinned."""
    import glob
    import os

    expected = {
        "article_example.ttl": 525,
        "chapter_example.ttl": 198,
        "dissertation_example.ttl": 221,
        "thesis_example.ttl": 137,
        "work_with_tests.ttl": 749,
    }
    found = {}
    for p in glob.glob("/root/reference/documentation/*.ttl"):
        with open(p, encoding="utf-8") as f:
            found[os.path.basename(p)] = len(parse_turtle(f.read()))
    if not found:  # reference not present in this environment
        import pytest

        pytest.skip("reference documentation TTLs not present")
    assert found == expected

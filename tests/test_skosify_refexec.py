"""skosify_hygiene vs the reference's own checked-in skosify run.

The reference's terms-conversion workflow post-processes its converted
PSYNDEX terms vocabulary with the external `skosify` tool
(other_conversions/terms_conversion/terms-conversion.ipynb). Both sides
of that run are checked in — apa_thes_2023_02.ttl (input, 87,858
triples) and skosified_apa_thes_2023_02.ttl (output, 87,206) — plus the
tool's log (skosified-thes.log: 426 related-vs-broaderTransitive pairs
removed, 100 loose concepts marked as top concepts). That pair is an
exact refexec-style golden: the Spark pass must reproduce the output
triple set EXACTLY from the input.
"""

import os

import pytest

from psyndex2linkeddata_spark.plans.skos import SKOS, skosify_hygiene
from psyndex2linkeddata_spark.schema import triples_schema
from psyndex2linkeddata_spark.sources.turtle import parse_turtle

TC = "/root/reference/other_conversions/terms_conversion"
PRE = f"{TC}/apa_thes_2023_02.ttl"
POST = f"{TC}/skosified_apa_thes_2023_02.ttl"

pytestmark = pytest.mark.skipif(
    not os.path.exists(PRE), reason="reference terms_conversion TTLs not present"
)


def _rows(path):
    with open(path, encoding="utf-8") as f:
        return parse_turtle(f.read())


def test_skosify_hygiene_matches_reference_output_exactly(spark):
    pre = _rows(PRE)
    golden = set(_rows(POST))
    df = spark.createDataFrame([tuple(r) for r in pre], triples_schema())
    got = {tuple(r) for r in skosify_hygiene(df).collect()}
    assert got == golden
    # the two repairs the log records, in the log's own numbers
    assert len(set(pre) - got) == 852  # 426 related pairs, both directions
    added = got - set(pre)
    assert len(added) == 200  # 100 loose concepts, two triples each
    assert {t[1] for t in added} == {
        SKOS + "hasTopConcept",
        SKOS + "topConceptOf",
    }


def test_skosify_hygiene_idempotent_and_guards(spark):
    """Second application is a no-op (already-marked guard + no new
    conflicts), and a narrower-only parent still blocks top-marking."""
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    rows = [
        # scheme + three concepts: root, child (via narrower only), and
        # a related pair that conflicts through a 2-hop chain
        ("s:S", rdf_type, SKOS + "ConceptScheme", True, None, None),
        ("c:root", rdf_type, SKOS + "Concept", True, None, None),
        ("c:mid", rdf_type, SKOS + "Concept", True, None, None),
        ("c:leaf", rdf_type, SKOS + "Concept", True, None, None),
        ("c:root", SKOS + "inScheme", "s:S", True, None, None),
        ("c:mid", SKOS + "inScheme", "s:S", True, None, None),
        ("c:leaf", SKOS + "inScheme", "s:S", True, None, None),
        # mid's parent is declared ONLY via narrower on root
        ("c:root", SKOS + "narrower", "c:mid", True, None, None),
        ("c:leaf", SKOS + "broader", "c:mid", True, None, None),
        # leaf↔root related conflicts with the 2-hop broaderTransitive
        ("c:leaf", SKOS + "related", "c:root", True, None, None),
        ("c:root", SKOS + "related", "c:leaf", True, None, None),
        # a related pair with no hierarchy between them survives
        ("c:mid", SKOS + "related", "c:other", True, None, None),
    ]
    df = spark.createDataFrame(rows, triples_schema())
    once = skosify_hygiene(df)
    got = {tuple(r) for r in once.collect()}
    assert ("c:leaf", SKOS + "related", "c:root", True, None, None) not in got
    assert ("c:root", SKOS + "related", "c:leaf", True, None, None) not in got
    assert ("c:mid", SKOS + "related", "c:other", True, None, None) in got
    # only root is loose (mid has a narrower-declared parent, leaf a broader)
    assert ("c:root", SKOS + "topConceptOf", "s:S", True, None, None) in got
    assert ("s:S", SKOS + "hasTopConcept", "c:root", True, None, None) in got
    assert (
        sum(1 for t in got if t[1] == SKOS + "topConceptOf") == 1
    )
    twice = {tuple(r) for r in skosify_hygiene(once).collect()}
    assert twice == got

"""Fixture builders for the reference-golden-TTL gates.

The reference's testing/ TTLs were produced with LIVE API lookups
(Crossref). The offline stand-in authority tables here are derived from
the reference's own checked-in inputs + goldens: for every DOI the golden
TTL keeps, one (doi, title, authors) row whose title/authors are the
citation's bibliographic parts — what the Crossref works dump would hold.
DOIs the golden REJECTED (validation failures / unmatched searches) are
deliberately absent, reproducing the API's 404 / low-similarity paths.
"""

from __future__ import annotations

import json
import os
import re

from tests import oracles

DATA = os.path.join(os.path.dirname(__file__), "data")
RPLIC_TTL = "/root/reference/testing/RPLIC/test_rplic.ttl"
REF_WORKS = "https://w3id.org/zpid/testgraph/works/"

# heuristic title extraction fails where the citation has no "(YYYY)."
# author prefix — curated bibliographic fields for those:
_TITLE_OVERRIDES = {
    18: (
        "Tinnitus severity, depression, and the big five personality traits",
        "Langguth Hajak Kleinjung Cacace",
    ),
    22: (
        "Adolescents with current major depressive disorder show dissimilar "
        "patterns of age-related differences in ACC and thalamus",
        "Hagan Graham Tait",
    ),
    46: (
        "Döner vs. Schweinebraten – Stereotype von (angehenden) Lehrkräften "
        "über Personen deutscher und türkischer Herkunft im Vergleich",
        "Bonefeld Karst",
    ),
}


def _title_authors(citation: str) -> tuple[str, str]:
    """Crude 'Crossref metadata' split: authors before '(YYYY).', title =
    first sentence after it."""
    m = re.search(r"^(.*?)\(\s*(\d{4})\s*\)[.:]?\s*(.*)$", citation)
    if m:
        authors = re.sub(r"[&.,]", " ", m.group(1))
        authors = " ".join(w for w in authors.split() if len(w) > 2)
        rest = m.group(3)
    else:
        authors = " ".join(citation.split()[:3])
        rest = citation
    title = re.split(r"(?<=[a-z\)])\.\s", rest)[0][:120]
    return title, authors


def load_rplic_strings() -> list[str]:
    with open(os.path.join(DATA, "fx_rplic.json")) as f:
        return json.load(f)


def rplic_golden_dois() -> dict[int, str]:
    """index → DOI the golden TTL keeps for that work's replication."""
    from psyndex2linkeddata_spark.sources.turtle import parse_turtle

    out = {}
    with open(RPLIC_TTL, encoding="utf-8") as f:
        for t in parse_turtle(f.read()):
            m = re.match(
                rf"{REF_WORKS}(\d+)#ReplicationRelationship1_work_instance$", t[0]
            )
            if m and t[1].endswith("identifiedBy"):
                dm = re.match(r"https://doi\.org/(.+)$", str(t[2]))
                if dm:
                    out[int(m.group(1))] = dm.group(1)
    return out


TESTG_PY = "/root/reference/testing/TESTG/testg.py"
TESTG_TTL = "/root/reference/testing/TESTG/testg.ttl"


def load_testg_strings() -> list[str]:
    """The reference's checked-in TESTG corpus, extracted by AST parse so
    Python's implicit string concatenation ('|n 0000' '|x 8866' with only
    a comment between) yields the exact list the golden TTL was built
    from."""
    import ast

    with open(TESTG_PY, encoding="utf-8") as f:
        tree = ast.parse(f.read())
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Assign)
            and getattr(node.targets[0], "id", None) == "testgs"
        ):
            return list(ast.literal_eval(node.value))
    raise AssertionError("testgs list not found")


def build_testg_auth_rows() -> list[tuple[str, str]]:
    """(test_id, long_name) rows reproducing the reference's
    all_tests.json lookups: for every golden work whose PsytkomTestId
    could only have come from the fuzzy longName lookup (the input TESTG
    had no usable |c), one row with the golden test node's longName."""
    from psyndex2linkeddata_spark.sources.turtle import parse_turtle

    strings = load_testg_strings()
    with open(TESTG_TTL, encoding="utf-8") as f:
        ttl = parse_turtle(f.read())
    tid, lname = {}, {}
    for t in ttl:
        m = re.match(rf"{REF_WORKS}(\d+)#TestRelationship_test_testId$", t[0])
        if m and t[1].endswith("#value"):
            tid[int(m.group(1))] = str(t[2])
        m = re.match(rf"{REF_WORKS}(\d+)#TestRelationship_test_longName$", t[0])
        if m and t[1].endswith("mainTitle"):
            lname[int(m.group(1))] = str(t[2])
    rows = []
    for i, t in sorted(tid.items()):
        c = oracles.get_subfield(oracles.clean(strings[i]), "c")
        if (c is None or c.strip() == "") and i in lname:
            rows.append((t, lname[i]))
    return rows


def rplic_crossref_authority() -> list[tuple[str, str, str]]:
    """(doi, title, authors) rows for every golden-kept DOI with a
    comparable citation — the offline Crossref works slice."""
    strings = load_rplic_strings()
    rows = []
    for i, doi in sorted(rplic_golden_dois().items()):
        main = oracles.get_mainfield(oracles.clean(strings[i])) or ""
        if main and not main.startswith(("http", "10.")):
            title, authors = _TITLE_OVERRIDES.get(i) or _title_authors(main)
            rows.append((doi, title, authors))
    return rows

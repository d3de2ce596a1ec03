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

"""Deterministic authority ("dimension") tables — offline stand-ins for the
live APIs the reference calls per row (ROR, Crossref funders/works, Skosmos,
PsychAuthors kerndaten, all_tests.json — see
/root/reference/modules/local_api_lookups.py and FIXTURES.md §3).

The engine NEVER does HTTP: these tables are inputs, broadcast-joined.
Generators include alias/near-duplicate variants so the fuzzy tiers
(partial_ratio > 80, token_sort_ratio thresholds) are actually exercised.
"""

from __future__ import annotations

import hashlib
import os
import random
import unicodedata

from psyndex2linkeddata_spark.data import tables
from psyndex2linkeddata_spark.datagen import pools


def _slug(s: str) -> str:
    return hashlib.sha1(s.encode("utf-8")).hexdigest()[:9]


def _ascii(s: str) -> str:
    return (
        unicodedata.normalize("NFKD", s.replace("ß", "ss"))
        .encode("ascii", "ignore")
        .decode("ascii")
    )


def auth_orgs_rows(seed: int = 42) -> list[dict]:
    rng = random.Random(f"{seed}:orgs")
    rows = []
    fundref_by_canon = {canon: fr for _n, canon, fr in pools.FUNDERS}
    org_names = {name: country for name, country in pools.AFFILIATIONS}
    for _name, canon, _fr in pools.FUNDERS:
        org_names.setdefault(canon, "GERMANY")
    # J4: register ONLY the pre-comma prefix of the comma-tailed funder, so
    # its FundRef link is reachable solely via the truncation-retry tier
    _comma_name, _comma_fr = pools.FUNDER_COMMA
    _comma_prefix = _comma_name.split(",", 1)[0].strip()
    org_names.setdefault(_comma_prefix, "GERMANY")
    fundref_by_canon[_comma_prefix] = _comma_fr
    for name, country in sorted(org_names.items()):
        aliases = []
        a = _ascii(name)
        if a != name:
            aliases.append(a)
        # comma-truncated variant ("Department of X, University Y" → "University Y")
        if "," in name:
            aliases.append(name.split(",", 1)[1].strip())
        # abbreviation-ish variant
        words = [w for w in name.replace(",", "").split() if w[0].isupper()]
        if len(words) >= 3:
            aliases.append("".join(w[0] for w in words))
        rows.append(
            {
                "org_id": f"https://ror.org/0{_slug(name)}",
                "name": name,
                "aliases": aliases,
                "country_name": country.title(),
                "fundref_doi": (
                    "10.13039/" + fundref_by_canon[name]
                    if name in fundref_by_canon
                    else None
                ),
            }
        )
    rng.shuffle(rows)
    return rows


def auth_persons_rows(seed: int = 42) -> list[dict]:
    rng = random.Random(f"{seed}:persons")
    rows = []
    people = set(pools.HOT_AUTHORS)
    # a deterministic sample of name-pool combinations (matches datagen density)
    for fam in pools.FAMILY_NAMES:
        for giv in rng.sample(pools.GIVEN_NAMES, 6):
            people.add((fam, giv))
    for fam, giv in sorted(people):
        name = f"{fam}, {giv}"
        alt = [f"{fam}, {giv[0]}.", _ascii(name)]
        alt = sorted({a for a in alt if a != name})
        rows.append(
            {
                "person_id": f"https://psychauthors.example.org/{_slug(name)}",
                "name": name,
                "alternate_names": alt,
                "orcid": None,
            }
        )
    return rows


def auth_kerndaten_rows(seed: int = 42) -> list[dict]:
    """PsychAuthors kerndaten stand-in (the reference parses
    ttl-data/kerndaten.ttl at import, modules/contributions.py:405-407,
    and falls back to its schema:alternateName variants when a PAUP
    name matches no contribution, :456-498). One row per person id:
    (paup_id, alternate_names). The alternates include the canonical
    'Family, Given' spelling plus the deterministic 'former name'
    variant pages.py can emit in PAUP — so those entries resolve ONLY
    through this tier."""
    from psyndex2linkeddata_spark.datagen.pages import (
        _former_family,
        _stable_hash,
    )

    people = set(pools.HOT_AUTHORS)
    for fam in pools.FAMILY_NAMES:
        for giv in pools.GIVEN_NAMES:
            people.add((fam, giv))
    by_pid: dict[str, set] = {}
    for fam, giv in sorted(people):
        pid = f"p{(_stable_hash(fam + '|' + giv) % 90000) + 10000:05d}"
        # hash collisions merge alternate lists (one pid row each — the
        # per-record resolution map requires unique map keys)
        by_pid.setdefault(pid, set()).update(
            {
                f"{fam}, {giv}",
                f"{fam}, {giv[0]}.",
                f"{_former_family(fam, giv)}, {giv}",
            }
        )
    return [
        {"paup_id": pid, "alternate_names": sorted(alts)}
        for pid, alts in sorted(by_pid.items())
    ]


def auth_works_rows(seed: int = 42) -> list[dict]:
    """Crossref-works stand-in: (doi, title, author_families, year)."""
    rng = random.Random(f"{seed}:works")
    rows = []
    for i in range(400):
        fam = rng.choice(pools.FAMILY_NAMES)
        title = f"{rng.choice(pools.TITLE_HEADS)} {rng.choice(pools.TITLE_TAILS)}"
        rows.append(
            {
                "doi": f"10.{rng.randrange(1000, 9999)}/w{i:05d}",
                "title": title,
                "author_families": [fam] + ([rng.choice(pools.FAMILY_NAMES)] if rng.random() < 0.5 else []),
                "year": rng.randrange(1985, 2024),
            }
        )
    return rows


def auth_concepts_rows(seed: int = 42) -> list[dict]:
    rows = []
    for i, (en, de) in enumerate(sorted(pools.CT_TERMS)):
        code = f"{10000 + i}"
        rows.append(
            {
                "vocab": "terms",
                "label_en": en,
                "label_de": de,
                "uri": f"https://w3id.org/zpid/vocabs/terms/{code}",
                "code": code,
                "ancestors": [],
            }
        )
        rows.append(
            {
                "vocab": "addterms",
                "label_en": en,
                "label_de": de,
                "uri": f"https://w3id.org/zpid/vocabs/addterms/{code}",
                "code": code,
                "ancestors": [],
            }
        )
    for code in pools.SH_CODES:
        rows.append(
            {
                "vocab": "class",
                "label_en": f"Class {code}",
                "label_de": f"Klasse {code}",
                "uri": f"https://w3id.org/zpid/vocabs/class/{code}",
                "code": code,
                "ancestors": [],
            }
        )
    # genre hierarchy (for A2 ancestor dedup): leaf genres under ScholarlyWork etc.
    genre_tree = {
        "ScholarlyWork": [],
        "ScholarlyPaper": ["ScholarlyWork"],
        "ResearchPaper": ["ScholarlyPaper", "ScholarlyWork"],
        "TheoreticalPaper": ["ScholarlyPaper", "ScholarlyWork"],
        "Thesis": ["ScholarlyWork"],
        "DoctoralThesis": ["Thesis", "ScholarlyWork"],
        "EditedBook": [],
        "Textbook": [],
        "GrayLiterature": [],
    }
    for g, anc in genre_tree.items():
        rows.append(
            {
                "vocab": "genres",
                "label_en": g,
                "label_de": g,
                "uri": f"https://w3id.org/zpid/vocabs/genres/{g}",
                "code": g,
                "ancestors": [f"https://w3id.org/zpid/vocabs/genres/{a}" for a in anc],
            }
        )
    for ag in pools.AGE_GROUPS:
        camel = ag.split(" ")[0].lower() + "".join(w.title() for w in ag.split(" ")[1:])
        rows.append(
            {
                "vocab": "age",
                "label_en": ag,
                "label_de": ag,
                "uri": f"https://w3id.org/zpid/vocabs/age/{camel}",
                "code": camel,
                "ancestors": [],
            }
        )
    # licenses vocab (J6 license half): one concept per mapped code in
    # functions/licenses (the reference labels these via Skosmos)
    from psyndex2linkeddata_spark.functions.licenses import _EXACT_LICENSE_CODES

    license_suffixes = sorted(
        set(_EXACT_LICENSE_CODES.values())
        | {"AUTH", "PUBL", "HogrefeOpenMind", "ExclusiveSpringer",
           "UnspecifiedOpenLicense"}
    )
    for suffix in license_suffixes:
        rows.append(
            {
                "vocab": "licenses",
                "label_en": suffix.replace("_", " "),
                "label_de": "Lizenz " + suffix.replace("_", " "),
                "uri": f"https://w3id.org/zpid/vocabs/licenses/{suffix}",
                "code": suffix,
                "ancestors": [],
            }
        )
    return rows


def auth_tests_rows(seed: int = 42) -> list[dict]:
    return [
        {"test_id": tid, "long_name": long_name, "short_name": short}
        for long_name, short, tid in sorted(pools.TEST_NAMES)
    ]


def geonames_rows() -> list[dict]:
    return [
        {"country_name": name, "geonames_id": gid, "iso2": iso}
        for name, gid, iso in tables.geonames_countries
    ]


def cm_mapping_rows() -> list[dict]:
    return [dict(r) for r in tables.cm_mapping_lookup]


def name_replacements_rows() -> list[dict]:
    rows = []
    for pat, rep in tables.funder_names_full_replacelist:
        rows.append({"kind": "funder_full", "pattern": pat, "replacement": rep})
    for pat, rep in tables.funder_names_substr_replacelist:
        rows.append({"kind": "funder_substr", "pattern": pat, "replacement": rep})
    for pat, rep in tables.affilation_org_substr_replacelist:
        rows.append({"kind": "affil_substr", "pattern": pat, "replacement": rep})
    return rows


def bad_ids_rows(n_pages: int, seed: int = 42) -> list[dict]:
    """Kill-list: ~1% of dfks (deterministic)."""
    rng = random.Random(f"{seed}:bad")
    picks = sorted(rng.sample(range(n_pages), max(1, n_pages // 100)))
    return [{"dfk": f"{300000 + i:07d}", "reason": "bad record"} for i in picks]


AUTHORITY_BUILDERS = {
    "auth_orgs": auth_orgs_rows,
    "auth_persons": auth_persons_rows,
    "auth_kerndaten": auth_kerndaten_rows,
    "auth_works": auth_works_rows,
    "auth_concepts": auth_concepts_rows,
    "auth_tests": auth_tests_rows,
}


def write_authority_parquets(out_dir: str, n_pages: int = 500, seed: int = 42) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    datasets: dict[str, list[dict]] = {
        name: fn(seed) for name, fn in AUTHORITY_BUILDERS.items()
    }
    datasets["geonames"] = geonames_rows()
    datasets["cm_mapping"] = cm_mapping_rows()
    datasets["name_replacements"] = name_replacements_rows()
    datasets["bad_ids"] = bad_ids_rows(n_pages, seed)
    for name, rows in datasets.items():
        pq.write_table(pa.Table.from_pylist(rows), os.path.join(out_dir, f"{name}.parquet"))

"""Deterministic synthetic `pages` corpus generator (seed=42, FIXTURES.md §1).

Each page is a Common-Crawl-style web page whose extracted `text` carries one
STAR-style bibliographic record as `TAG value` lines (tag = ^[A-Z][A-Z0-9]*,
one space, value to end of line; repeated tags = repeated lines in source
order). `html` is a deterministic wrapping of `text`
(<html><body><pre>escaped text</pre></body></html>), so the byte-identical
text-per-url invariant is checkable by re-extracting text from html.

Field repertoire follows the reference export
(/root/reference/xml-data/records-440.xml) and FIXTURES.md §1: BE variants,
AUP with |c/|i, ORCID |u, TIUE "(DeepL) |s", journal fields, thesis fields,
repeated CT/IT/SH/AGE, PRREG trial numbers, DATAC/URLAI, RPLIC, REL, TESTG,
CF, EMAIL/EMID, PAUP, missing fields, dirty ^DD/HTML-entity encodings, and
injected hot-entity skew (~20% of rows on a few authors/affiliations/journals).

Determinism: each record's RNG is seeded as f"{seed}:{index}", so record i is
identical at every scale factor (prefix-stable corpora).
"""

from __future__ import annotations

import datetime as dt
import hashlib
import html as htmllib
import random


def _stable_hash(s: str) -> int:
    """Process-independent hash (builtin hash() is salted per process)."""
    return int.from_bytes(hashlib.sha1(s.encode("utf-8")).digest()[:8], "big")

from psyndex2linkeddata_spark.datagen import pools
from psyndex2linkeddata_spark.schema import SCALAR_FIELDS, REPEATED_FIELDS

BASE_URL = "https://psyndex.example.org/record/"
EPOCH = dt.datetime(2022, 1, 1, tzinfo=dt.timezone.utc)

BE_POOL = ["UZ"] * 12 + ["SS", "SM", "US", "UR", "SH", "SR", "AV"]


def _dfk(i: int) -> str:
    return f"{300000 + i:07d}"


def _former_family(fam: str, giv: str) -> str:
    """Deterministic 'former name' family spelling for the kerndaten
    scenario — a different pool name keyed on the person, so
    authorities.auth_kerndaten_rows can regenerate the same variant.
    (If a picked pair happens to fuzzy-match anyway, the direct tier
    simply wins in engine and oracle alike.)"""
    idx = _stable_hash("former:" + fam + "|" + giv) % len(pools.FAMILY_NAMES)
    cand = pools.FAMILY_NAMES[idx]
    if cand == fam:
        cand = pools.FAMILY_NAMES[(idx + 1) % len(pools.FAMILY_NAMES)]
    return cand


def _person(rng: random.Random) -> tuple[str, str]:
    if rng.random() < 0.20:
        return rng.choice(pools.HOT_AUTHORS)
    return rng.choice(pools.FAMILY_NAMES), rng.choice(pools.GIVEN_NAMES)


def _affiliation(rng: random.Random) -> tuple[str, str]:
    if rng.random() < 0.20:
        return rng.choice(pools.HOT_AFFILIATIONS)
    return rng.choice(pools.AFFILIATIONS)


def _dirty(rng: random.Random, s: str) -> str:
    """Inject a raw dirty token (the cleaner must remove/normalize it)."""
    raw, _clean = rng.choice(pools.DIRTY_DECORATIONS)
    words = s.split(" ")
    pos = rng.randrange(len(words) + 1)
    return " ".join(words[:pos] + [raw] + words[pos:])


def _orcid(rng: random.Random) -> str:
    return "-".join(f"{rng.randrange(10000):04d}" for _ in range(3)) + f"-{rng.randrange(1000):03d}{rng.choice('0123456789X')}"


def _doi(rng: random.Random) -> str:
    # ~10% SICI-style DOIs with parens/angle brackets — the chars
    # urllib.parse.quote percent-encodes into the bf:Doi node URI
    if rng.random() < 0.1:
        return (
            f"10.{rng.randrange(1000, 9999)}/(SICI)1099-{rng.randrange(1000, 9999)}"
            f"(199{rng.randrange(10)})5:1<{rng.randrange(10, 99)}::AID-"
            f"{rng.randrange(100, 999)}>3.0.CO;2-{rng.choice('ABCDEF')}"
        )
    return f"10.{rng.randrange(1000, 9999)}/s{rng.randrange(10000, 99999)}-{rng.randrange(100, 999)}-{rng.randrange(10000, 99999)}-{rng.randrange(10)}"


def make_record(i: int, seed: int = 42) -> dict:
    """One synthetic record: dict of scalar field → str, repeated field → list[str]."""
    rng = random.Random(f"{seed}:{i}")
    rec: dict = {}
    dfk = _dfk(i)
    rec["DFK"] = dfk
    be = rng.choice(BE_POOL)
    rec["BE"] = be

    # --- titles ---
    head = rng.choice(pools.TITLE_HEADS)
    tail = rng.choice(pools.TITLE_TAILS)
    is_german_title = any(w in head for w in ("und", "des", "von", "Einfluss", "Prävention", "Diagnostik", "Validierung", "Messinvarianz"))
    title = f"{head} {tail}" if rng.random() < 0.7 else head
    if rng.random() < 0.08:
        title = _dirty(rng, title)
    rec["TI"] = title
    rec["TIL"] = "German" if is_german_title else "English"
    if rng.random() < 0.25:
        rec["TIU"] = "Subtitle " + rng.choice(pools.TITLE_TAILS)
        if rng.random() < 0.6:
            rec["TIUL"] = rec["TIL"]
    if rng.random() < 0.4:
        # translated title with (DeepL) marker and |s language subfield
        tlang = "English" if is_german_title else "German"
        rec["TIUE"] = f"{rng.choice(pools.TITLE_HEADS)}. (DeepL) |s {tlang}"

    rec["PY"] = str(rng.randrange(1980, 2025))
    rec["LA"] = "German" if is_german_title else "English"

    # --- contributors ---
    n_aup = rng.choice([1, 1, 2, 2, 3, 3, 4, 5, 6])
    aups, seen = [], set()
    while len(aups) < n_aup:
        fam, giv = _person(rng)
        if (fam, giv) in seen:
            continue
        seen.add((fam, giv))
        aups.append((fam, giv))
    # |f role subfields (reference extract_contribution_role,
    # modules/contributions.py:786-806): most AUPs carry none (→AU);
    # some carry explicit codes incl. VE (→AU) and RE (→IVR when a CM
    # contains "interview", else →ED). Real-corpus distribution is
    # ED-heavy (records-440.xml: 64×ED, 5×UE, 2×IN, 2×RE, 1×AU).
    has_interview_cm = rng.random() < 0.04
    aup_fields = []
    for fam, giv in aups:
        s = f"{fam}, {giv}"
        r = rng.random()
        if r < 0.02:
            # corporate body in the person field with a trailing comma
            # (records-440.xml 0396760: 'Niedersächsisches Institut ...
            # (nifbe),' → family without comma, givenName '')
            s = f"Institut für {fam}forschung ({giv.lower()[:4]}),"
        elif r < 0.04:
            # single-token name, no comma → reference except branch:
            # family = whole, givenName = '' (still emitted)
            s = fam
        if rng.random() < 0.15:
            s += f" |f {rng.choice(['ED', 'ED', 'ED', 'UE', 'IN', 'RE', 'VE', 'AU', 'TR'])}"
        if rng.random() < 0.8:
            org, country = _affiliation(rng)
            if rng.random() < 0.05:
                org = _dirty(rng, org)
            s += f" |c {country} |i {org}"
        aup_fields.append(s)
    rec["AUP"] = aup_fields
    if be in ("SS", "SM") and rng.random() < 0.3:
        auk = "Deutsche Gesellschaft für Psychologie"
        if rng.random() < 0.2:
            auk += f" |f {rng.choice(['ED', 'RE'])}"
        rec["AUK"] = [f"{auk} |c GERMANY"]
    # ORCIDs for a subset of authors (name repeated, |u subfield); some dirty urls.
    # Entry names vary from the AUP spelling (abbreviated given, ascii umlauts,
    # appended double-family) — exercises the J9/J10 partial_ratio tier.
    def _entry_name(fam: str, giv: str) -> str:
        r = rng.random()
        if r < 0.25:
            giv = giv[0] + "."
        elif r < 0.35:
            for u, rep in (("ä", "ae"), ("ö", "oe"), ("ü", "ue"), ("ß", "ss")):
                fam = fam.replace(u, rep)
        elif r < 0.40:
            fam = fam + "-Berg"
        return f"{fam}, {giv}"

    orcids = []
    for fam, giv in aups:
        if rng.random() < 0.4:
            oid = _orcid(rng)
            if rng.random() < 0.3:
                oid = "https://orcid.org/" + oid
            orcids.append(f"{_entry_name(fam, giv)} |u {oid}")
            if rng.random() < 0.08:
                # second entry matching the same person — both rdf:values
                # accumulate on the one _orcid node (graph.add semantics)
                orcids.append(f"{_entry_name(fam, giv)} |u {_orcid(rng)}")
    if orcids:
        rec["ORCID"] = orcids
    # PsychAuthors ids for some authors
    paups = []
    for fam, giv in aups:
        if rng.random() < 0.25:
            pid = f"p{(_stable_hash(fam + '|' + giv) % 90000) + 10000:05d}"
            if rng.random() < 0.15:
                # changed/married name: the PAUP entry carries a FORMER
                # family-name spelling that no longer fuzzy-matches the
                # AUP — resolvable only via the kerndaten alternate-name
                # tier (authorities.auth_kerndaten_rows lists the AUP
                # spelling as a schema:alternateName for this pid)
                paups.append(f"{_former_family(fam, giv)}, {giv} |n {pid}")
            else:
                paups.append(f"{_entry_name(fam, giv)} |n {pid}")
    if paups:
        rec["PAUP"] = paups
    if rng.random() < 0.5:
        fam, giv = aups[0]
        rec["EMAIL"] = f"{giv.lower()}.{fam.lower().replace(' ', '')}@example.edu".replace("ö", "oe").replace("ü", "ue").replace("ä", "ae").replace("í", "i").replace("é", "e").replace("á", "a").replace("ı", "i")
        if rng.random() < 0.7:
            rec["EMID"] = f"{fam}, {giv}"
    if rng.random() < 0.3:
        org, country = _affiliation(rng)
        rec["CS"] = org
        rec["COU"] = country.title()

    # --- abstracts ---
    if rng.random() < 0.9:
        sents = pools.ABSTRACT_SENTENCES_DE if is_german_title else pools.ABSTRACT_SENTENCES_EN
        k = rng.randrange(3, 7)
        abstract = " ".join(rng.choice(sents) for _ in range(k))
        if rng.random() < 0.1:
            abstract += " - Contents: 1. Introduction 2. Methods 3. Results 4. Discussion"
        if rng.random() < 0.15:
            abstract += " (translated by DeepL)"
        if rng.random() < 0.06:
            abstract = _dirty(rng, abstract)
        rec["ABH"] = abstract
        rec["ABLH"] = "German" if is_german_title else "English"
        rec["ASH1"] = rng.choice(["Original", "ZPID", "DeepL", "Autorenfassung"])
        if rng.random() < 0.25:
            # primary abstract's editing agent (→ bf:descriptionModifier)
            rec["ASH2"] = rng.choice(["ZPID", "Original", "kj", "DeepL"])
        if rng.random() < 0.3:
            sents2 = pools.ABSTRACT_SENTENCES_EN if is_german_title else pools.ABSTRACT_SENTENCES_DE
            rec["ABN"] = " ".join(rng.choice(sents2) for _ in range(rng.randrange(2, 5)))
            rec["ABLN"] = "English" if is_german_title else "German"
            rec["ASN1"] = rng.choice(["Original", "ZPID", "DeepL"])
            if rng.random() < 0.25:
                rec["ASN2"] = rng.choice(["ZPID", "Original"])
    elif rng.random() < 0.5:
        rec["ABH"] = "No abstract available."
        rec["ABLH"] = "English"

    # --- terms / classification (reference subfield layout: CT/IT carry
    # "|e english |d german [|g x]" — terms.py:66-87; SH carries
    # "|c code |e english |g german" — terms.py:170-178) ---
    n_ct = rng.randrange(2, 9)
    cts = rng.sample(pools.CT_TERMS, min(n_ct, len(pools.CT_TERMS)))
    rec["CT"] = [
        f"|e {en} |d {de}" + (" |g x" if rng.random() < 0.25 else "")
        if rng.random() < 0.85
        else f"|d {de}"
        for en, de in cts
    ]
    if rng.random() < 0.5:
        its = rng.sample(pools.CT_TERMS, rng.randrange(1, 4))
        rec["IT"] = [f"|e {en} |d {de}" for en, de in its]
    rec["SH"] = [
        f"|c {code} |e Heading {code} |g Überschrift {code}"
        for code in rng.sample(pools.SH_CODES, rng.randrange(1, 4))
    ]
    if rng.random() < 0.7:
        rec["AGE"] = rng.sample(pools.AGE_GROUPS, rng.randrange(1, 3))
    if rng.random() < 0.2:
        rec["PLOC"] = ["Germany" if rng.random() < 0.6 else rng.choice(["Austria", "Switzerland", "United States"])]
    if rng.random() < 0.75 or has_interview_cm:
        # reference layout: CM carries the code in |c (publication_types.py:126)
        rec["CM"] = [
            f"|c {code} |e method {code}"
            for code in rng.sample(pools.CM_CODES_VALID, rng.randrange(1, 3))
        ]
        if has_interview_cm:
            # first CM text contains "interview" → RE roles become IVR
            # (extract_contribution_role checks record.find("CM").text)
            rec["CM"][0] = "|c 10500 |e narrative interviews"

    # --- journal / instance info ---
    if be == "UZ":
        jt, issn, eissn = rng.choice(pools.JOURNALS)
        if rng.random() < 0.35:
            jt = rng.choice(pools.HOT_JOURNALS)
            issn, eissn = dict((j[0], (j[1], j[2])) for j in pools.JOURNALS)[jt]
        rec["JT"] = jt
        rec["JBD"] = str(rng.randrange(1, 90))
        if rng.random() < 0.8:
            rec["JHFT"] = str(rng.randrange(1, 12))
        page_variants = [
            f"{rng.randrange(1, 300)}-{rng.randrange(300, 600)}",
            f"e{rng.randrange(10000, 20000)}",
            f"No. {rng.randrange(100, 400)}",
            f"Insgesamt {rng.randrange(100, 200)} S.",
            f"E{rng.randrange(10, 30)}-E{rng.randrange(30, 60)}",
            f"i-iii",
            f"I/{rng.randrange(100, 130)}-I/{rng.randrange(130, 160)}",
        ]
        rec["PAGE"] = page_variants[0] if rng.random() < 0.75 else rng.choice(page_variants)
        if rng.random() < 0.7:
            rec["ISSN"] = issn
        rec["EISSN"] = eissn
        rec["MT"] = "Online Medium" if rng.random() < 0.6 else "Print"
        if rng.random() < 0.35:
            rec["MT2"] = "Print" if rec["MT"] == "Online Medium" else "Online Medium"
        if rng.random() < 0.85:
            rec["DOI"] = _doi(rng)
    elif be in ("SS", "SM"):
        pu, place = rng.choice(pools.PUBLISHERS)
        # reference PU layout: |v publisher |o place |i print-isbn |e e-isbn
        # (consumed via get_subfield in convert_starxml_to_bf.py:388-396,500-515)
        rec["PU"] = f"|v {pu} |o {place}"
        rec["ISBN"] = f"978-3-{rng.randrange(100, 999)}-{rng.randrange(10000, 99999)}-{rng.randrange(10)}"
        if rng.random() < 0.5:
            rec["PU"] += f" |i {rec['ISBN']}"
        if rng.random() < 0.4:
            rec["EISBN"] = f"978-3-{rng.randrange(100, 999)}-{rng.randrange(10000, 99999)}-{rng.randrange(10)}"
            if rng.random() < 0.5:
                rec["PU"] += f" |e {rec['EISBN']}"
        rec["MT"] = "Print"
        if rng.random() < 0.4:
            rec["MT2"] = "Online Medium"
        if rng.random() < 0.4:
            rec["SE"] = rng.choice([
                f"UTB, Band {rng.randrange(1000, 9999)}",
                "essentials",
                f"Psychologie Kompakt, Vol. {rng.randrange(1, 40)}",
            ])
        if rng.random() < 0.3:
            rec["DOI"] = _doi(rng)
    elif be in ("US", "UR"):
        # chapter: usually points to a superordinate book dfk (an earlier
        # record); some only carry the book's title in BIP (→ the
        # bflc:Uncontrolled + title-only branch)
        if rng.random() < 0.8:
            rec["SSDFK"] = _dfk(max(0, i - rng.randrange(1, 50)))
        if rng.random() < 0.7:
            rec["BIP"] = f"Handbuch {rng.choice(['Psychologie', 'Diagnostik', 'Therapie', 'Entwicklung'])} Band {rng.randrange(1, 9)}"
        rec["PAGE"] = f"{rng.randrange(1, 300)}-{rng.randrange(300, 500)}"
        rec["MT"] = "Print"
        if rng.random() < 0.5:
            rec["DOI"] = _doi(rng)
    else:  # SH, SR, AV — gray literature / theses / audiovisual
        rec["MT"] = "Online Medium"
        if rng.random() < 0.5:
            rec["DOI"] = _doi(rng)
        if rng.random() < 0.3:
            rec["URN"] = f"urn:nbn:de:0168-ssoar-{rng.randrange(10000, 99999)}"

    # URLI full-text / landing-page link (→ bf:electronicLocator on the
    # locator instance); a few are junk that F3 rejects as not-a-url
    if rng.random() < 0.3:
        rec["URLI"] = (
            f"https://psycharchives.example.org/fulltext/{rng.randrange(10 ** 6)}"
            if rng.random() < 0.9
            else "fulltext not available"
        )

    if rng.random() < 0.15:
        y = int(rec["PY"]) - 1
        phist_style = rng.random()
        if phist_style < 0.5:
            dv = f"{rng.randrange(1, 28)}.{rng.randrange(1, 12)}.{y}"
        elif phist_style < 0.75:
            # '27 Mar 2022' / '20 Dec 2021' style (records-440.xml)
            mon = rng.choice(["Jan", "Feb", "Mar", "Apr", "May", "Jun",
                              "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"])
            dv = f"{rng.randrange(1, 28):02d} {mon} {y}"
        elif phist_style < 0.9:
            # 'MAR  2022' style: uppercase month, double space, no day
            mon = rng.choice(["JAN", "MAR", "JUN", "OCT"])
            dv = f"{mon}  {y}"
        else:
            # unsalvageable mess → the reference falls back to PY
            dv = "n/a"
        rec["PHIST"] = f"First published online |o {dv}"

    # --- thesis fields ---
    if be in ("SH", "SR") and rng.random() < 0.5:
        rec["GRAD"] = rng.choice(pools.DEGREES)
        y = int(rec["PY"])
        pd_variants = [f"{y}-0{rng.randrange(1, 9)}-1{rng.randrange(0, 9)}", f"{rng.randrange(1, 28)}.{rng.randrange(1, 12)}.{y}", str(y)]
        rec["PD"] = rng.choice(pd_variants)
        if rng.random() < 0.3:
            rec["PROMY"] = str(y)
        org, _c = _affiliation(rng)
        rec["INST"] = org
        rec["ORT"] = rng.choice(["Berlin", "Göttingen", "Trier", "Wien", "Zürich", "Marburg"])
        fam, giv = _person(rng)
        rec["HRF"] = [f"{fam}, {giv}"]
        if rng.random() < 0.6:
            fam2, giv2 = _person(rng)
            rec["KRF"] = [f"{fam2}, {giv2}"]

    # --- funding ---
    if rng.random() < 0.45:
        grants = []
        for _ in range(rng.randrange(1, 3)):
            fname, _canon, _fr = rng.choice(pools.FUNDERS)
            g = fname
            if rng.random() < 0.6:
                nums = [str(rng.randrange(10000, 999999)) for _ in range(rng.randrange(1, 3))]
                g += " |n " + (" und ".join(nums) if rng.random() < 0.3 else ", ".join(nums))
            if rng.random() < 0.4:
                g += " |i Through the Research Unit on synthetic data"
            grants.append(g)
        if rng.random() < 0.08:
            grants.append("Open Access funding via Projekt DEAL")
        rec["GRANT"] = grants

    # J4 truncation-retry exercise — index-keyed (no rng draw) so every
    # other field in the corpus is byte-identical with or without it; the
    # funder resolves only via the split-at-first-comma retry tier
    if i % 37 == 11:
        rec.setdefault("GRANT", []).append(pools.FUNDER_COMMA[0] + " |n 77001")

    # --- conferences ---
    if be in ("SS", "SM") and rng.random() < 0.4:
        cname, cplace = rng.choice(pools.CONFERENCES)
        rec["CF"] = [f"{cname} |o {cplace} |d {rec['PY']}" + (" |b Keynote" if rng.random() < 0.2 else "")]

    # --- research data / preregistration / replication / related ---
    if rng.random() < 0.3:
        datac = []
        for _ in range(rng.randrange(1, 3)):
            if rng.random() < 0.5:
                datac.append(f"|d 10.17605/OSF.IO/{''.join(rng.choice('ABCDEFGHJKMNPQRSTUVWXYZ') for _ in range(5))}")
            else:
                datac.append(f"|u https://osf.io/{''.join(rng.choice('abcdefghjkmnpqrstuvwxyz') for _ in range(5))}")
        rec["DATAC"] = datac
    if rng.random() < 0.12:
        rec["URLAI"] = [f"|u https://datadryad.example.org/ds/{rng.randrange(1000, 9999)}"]
    if rng.random() < 0.22:
        prregs = []
        for _ in range(rng.randrange(1, 3)):
            r = rng.random()
            if r < 0.4:
                tmpl, _reg = rng.choice(pools.TRIAL_REGISTRIES)
                trial = tmpl.format(rng.randrange(10**7))[:14]
                prregs.append(f"|i Study preregistered under {trial}")
            elif r < 0.8:
                code = "".join(rng.choice("ABCDEFGHJKMNPQRSTUVWXYZ") for _ in range(5))
                prregs.append(f"|d 10.17605/OSF.IO/{code} |u https://osf.io/{code.lower()}")
            else:
                prregs.append(f"|u https://aspredicted.org/{rng.randrange(10000, 99999)}")
        rec["PRREG"] = prregs
    if rng.random() < 0.1:
        rplic_variants = [
            f"{_doi(rng)}",
            f"https://doi.org/{_doi(rng)}",
            f"DOI {_doi(rng)}",
            f"Replication of: {rng.choice(pools.FAMILY_NAMES)}, {rng.choice('ABCDE')}. ({rng.randrange(1990, 2020)}). {rng.choice(pools.TITLE_HEADS)}.",
            f"{_dfk(rng.randrange(0, max(1, i)))}",
            f"https://example.org/paper ?id={rng.randrange(100, 999)}",
        ]
        rec["RPLIC"] = [rng.choice(rplic_variants)]
    if rng.random() < 0.18:
        rels = []
        for _ in range(rng.randrange(1, 3)):
            if rng.random() < 0.35:
                rels.append(_dfk(rng.randrange(0, max(1, i))))
            else:
                fam = rng.choice(pools.FAMILY_NAMES)
                rels.append(
                    f"|a {fam}, {rng.choice('ABCDE')}. |t {rng.choice(pools.TITLE_HEADS)} "
                    f"|j {rng.choice(pools.JOURNALS)[0]} |y {rng.randrange(1990, 2024)}"
                    + (f" |d {_doi(rng)}" if rng.random() < 0.6 else "")
                )
        rec["REL"] = rels
    if rng.random() < 0.25:
        testgs = []
        for _ in range(rng.randrange(1, 4)):
            long_name, short, tid = rng.choice(pools.TEST_NAMES)
            t = f"|l {long_name} |c {short}"
            if rng.random() < 0.6:
                t += f" |n {tid}"
            if rng.random() < 0.3:
                t += " |v x"
            if rng.random() < 0.15:
                t += " |k additional remark"
            testgs.append(t)
        rec["TESTG"] = testgs

    # --- license / doc type ---
    if rng.random() < 0.7:
        rec["COPR"] = rng.choice(pools.LICENSE_POOL)
    rec["DT"] = rng.choice(["01", "10", "61", "40", "02"])
    if rng.random() < 0.15:
        rec["DT2"] = rng.choice(["01", "10", "40"])

    return rec


def record_to_text(rec: dict) -> str:
    """Serialize a record dict to the page's extracted text (TAG value lines).

    Field order is canonical schema order; repeated values keep list order —
    this is what makes downstream counters (A1/A4/A7) deterministic.
    """
    lines = []
    for f in SCALAR_FIELDS:
        v = rec.get(f)
        if v is not None:
            lines.append(f"{f} {v}")
    for f in REPEATED_FIELDS:
        for v in rec.get(f) or []:
            lines.append(f"{f} {v}")
    return "\n".join(lines)


def text_to_html(text: str) -> bytes:
    return (
        "<html><head><meta charset=\"utf-8\"></head><body><pre>"
        + htmllib.escape(text)
        + "</pre></body></html>"
    ).encode("utf-8")


LANG_2 = {"German": "de", "English": "en"}


def make_records(n: int, seed: int = 42) -> list[dict]:
    return [make_record(i, seed) for i in range(n)]


def pages_rows_from_records(records: list[dict]) -> list[dict]:
    rows = []
    for i, rec in enumerate(records):
        text = record_to_text(rec)
        rows.append(
            {
                "url": BASE_URL + rec["DFK"],
                "warc_ts": EPOCH + dt.timedelta(minutes=i % (365 * 24 * 60)),
                "html": text_to_html(text),
                "text": text,
                "lang": LANG_2.get(rec.get("LA", ""), "und"),
            }
        )
    return rows


def write_pages_parquet(path: str, n: int, seed: int = 42) -> None:
    """Write the pages table as parquet via pyarrow (no Spark needed)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = pages_rows_from_records(make_records(n, seed))
    table = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                pa.field("url", pa.string(), nullable=False),
                pa.field("warc_ts", pa.timestamp("us", tz="UTC")),
                pa.field("html", pa.binary()),
                pa.field("text", pa.string()),
                pa.field("lang", pa.string()),
            ]
        ),
    )
    # small row groups keep the single file SPLITTABLE — parquet splits only
    # at row-group boundaries, and a 1-row-group file serializes the scan on
    # one core no matter what maxPartitionBytes says
    pq.write_table(table, path, row_group_size=1000)

"""Scalar-function library (F1–F29 subset) vs pure-Python reference oracles,
driven by the reference's own fixture corpora (tests/data/fx_*.json)."""

from __future__ import annotations

import html
import json
import os

import pytest
from pyspark.sql import Row, functions as F

from psyndex2linkeddata_spark.data.tables import dd_codes
from psyndex2linkeddata_spark.functions import cleaning, grants, instance_fields, lang, licenses, names, text, trials, urls
from tests import oracles

DATA = os.path.join(os.path.dirname(__file__), "data")


def load_corpus(name: str) -> list[str]:
    with open(os.path.join(DATA, name)) as f:
        return json.load(f)


def corpus_df(spark, strings):
    return spark.createDataFrame([Row(s=x) for x in strings])


@pytest.fixture(scope="module")
def all_corpora():
    return (
        load_corpus("fx_rplic.json")
        + load_corpus("fx_rel.json")
        + load_corpus("fx_testg.json")
    )


def test_replace_encodings_byte_exact(spark):
    rows = [Row(s=f"before {raw} after") for raw, _ in dd_codes]
    df = corpus_df(spark, [r.s for r in rows])
    got = [r[0] for r in df.select(cleaning.replace_encodings(F.col("s"))).collect()]
    want = [oracles.replace_encodings(r.s) for r in rows]
    assert got == want


def test_clean_text_matches_python_unescape(spark, all_corpora):
    df = corpus_df(spark, all_corpora)
    got = [r[0] for r in df.select(cleaning.clean_text(F.col("s"))).collect()]
    want = [oracles.clean(s) for s in all_corpora]
    assert got == want


def test_subfield_and_mainfield_semantics(spark, all_corpora):
    extra = [
        "Wild, Benedict |c GERMANY |i Cognitive Neuroscience Lab",
        "name only",
        "|u https://osf.io/x2qh3/",
        "a |f  |u https://doi.org/x |d ",
        " double  spaces |i  inside  value ",
        "|i first |i second |i third",
    ]
    strings = all_corpora + extra
    df = corpus_df(spark, strings)
    for sub in ["u", "d", "i", "c", "l", "n", "f"]:
        got = [r[0] for r in df.select(cleaning.get_subfield(F.col("s"), sub)).collect()]
        want = [oracles.get_subfield(s, sub) for s in strings]
        assert got == want, f"subfield |{sub}"
    got = [r[0] for r in df.select(cleaning.get_mainfield(F.col("s"))).collect()]
    want = [oracles.get_mainfield(s) for s in strings]
    assert got == want


def test_check_for_url_or_doi_on_rplic_corpus(spark):
    strings = [oracles.clean(s) for s in load_corpus("fx_rplic.json")]
    # mainfield part is what the reference feeds it (research_info.py:838+)
    strings = [oracles.get_mainfield(s) or s for s in strings]
    df = corpus_df(spark, strings)
    got = df.select(urls.check_for_url_or_doi(F.col("s")).alias("r")).collect()
    want = [oracles.check_for_url_or_doi(s) for s in strings]
    for g, w, s in zip(got, want, strings):
        assert (g.r.value, g.r.type) == w, s


def test_split_pages_variants(spark):
    variants = [
        "i-iii", "E14-E23", "B97-B109", "S389-S405", "F1-F9", "I/117-I/129",
        "e12655", "e66", "Art. 1", "5-19", "122", "Insgesamt 162",
        "No. e94617", "tgaa050", "No. 000010151520210111", "No. 310", "No. 2",
        "No e99675", "1-10",
    ]
    df = corpus_df(spark, variants)
    got = df.select(instance_fields.split_pages(F.col("s")).alias("p")).collect()
    for row, s in zip(got, variants):
        assert (
            row.p.page_start, row.p.page_end, row.p.extent, row.p.article_number
        ) == oracles.split_pages(s), s


def test_split_series_variants(spark):
    variants = [
        "UTB, Band 5591", "essentials", "Psychologie Kompakt, Vol. 12",
        "Tests und Trends, 19", "Reihe ohne Band, irgendwas",
        "Schriftenreihe, Band 3 mit Zusatz",
    ]
    df = corpus_df(spark, variants)
    got = df.select(instance_fields.split_series(F.col("s")).alias("p")).collect()
    for row, s in zip(got, variants):
        assert (row.p.series_title, row.p.series_volume) == oracles.split_series(s), s


def test_issn_email_orcid(spark):
    df = corpus_df(spark, ["2052-4463", "0033^DDS3042", " 1616-3443 ", "123-456", "2190-622x"])
    got = [tuple(r) for r in df.select(
        instance_fields.normalize_issn(F.col("s")),
        instance_fields.issn_is_valid(F.col("s")),
    ).collect()]
    assert got[0] == ("2052-4463", True)
    # reference quirk: replace_encodings maps ^DDS→'–' (en dash) BEFORE the
    # ^DDS→'-' sub (helpers.py:313-315), so the hyphen repair never fires
    assert got[1] == ("0033–3042", False)
    assert got[2] == ("1616-3443", True)
    assert got[3] == ("123-456", False)
    assert got[4] == ("2190-622X", True)

    df = corpus_df(spark, ["a.b @ uni.de", "not an email", "x y@z.org"])
    got = [r[0] for r in df.select(instance_fields.clean_email(F.col("s"))).collect()]
    assert got == ["a.b@uni.de", None, "x_y@z.org"]

    df = corpus_df(spark, [
        "https://orcid.org/0000-0002-5803-9923", "0000-0002-0004-784X", "junk",
    ])
    got = [r[0] for r in df.select(instance_fields.clean_orcid(F.col("s"))).collect()]
    assert got == ["0000-0002-5803-9923", "0000-0002-0004-784X", None]


def test_langtags(spark):
    cases = {
        "German": ("de", "ger"), "english": ("en", "eng"), "FREN": ("fr", "fra"),
        "Silent": ("zxx", "zxx"), "Klingon": ("und", "und"), "Deutsch": ("de", "ger"),
    }
    df = corpus_df(spark, list(cases))
    got = df.select(F.col("s"), lang.langtag2(F.col("s")), lang.langtag3(F.col("s"))).collect()
    for s, t2, t3 in got:
        assert (t2, t3) == cases[s]


def test_guess_language_heuristic(spark):
    df = corpus_df(spark, [
        "Die Ergebnisse zeigen einen signifikanten Effekt der Intervention.",
        "The results indicate a significant effect of the intervention.",
        "12345",
    ])
    got = [r[0] for r in df.select(lang.guess_language(F.col("s"))).collect()]
    assert got == ["de", "en", "und"]


def test_lang_id_ngram_profiles(spark):
    from psyndex2linkeddata_spark.functions.textstats import lang_id_ngram

    df = corpus_df(spark, [
        "The results of the study indicate a significant interaction effect.",
        "Die Untersuchung zeigt einen signifikanten Einfluss der Bedingungen.",
        "Les résultats montrent que les effets sont significatifs pour une partie.",
        "Los resultados muestran que los efectos son significativos en una parte.",
        "I risultati della ricerca mostrano che gli effetti sono significativi.",
        "Het onderzoek laat zien dat de effecten een belangrijke rol spelen, zijn ze er.",
        "9 8 7 6 5 4 3",
        None,
    ])
    got = [r[0] for r in df.select(lang_id_ngram(F.col("s"))).collect()]
    assert got == ["en", "de", "fr", "es", "it", "nl", "und", "und"]


def test_camel_case(spark):
    df = corpus_df(spark, ["Preschool Age", "school-age", "Very Old", "adulthood"])
    got = [r[0] for r in df.select(text.camel_case(F.col("s"))).collect()]
    assert got == ["preschoolAge", "schoolAge", "veryOld", "adulthood"]


def test_title_casing_and_names(spark):
    df = corpus_df(spark, ["der einfluss von achtsamkeit", "WHO report for DSM-IV"])
    got = [r[0] for r in df.select(text.title_except(F.col("s"))).collect()]
    assert got == ["Der Einfluss von Achtsamkeit", "WHO Report for DSM-IV"]

    df = corpus_df(spark, ["Müller, Thomas", "Einname", "von Humboldt, Alexander"])
    got = df.select(
        names.family_name(F.col("s")),
        names.given_name(F.col("s")),
        names.normalize_name(names.family_name(F.col("s")), names.given_name(F.col("s"))),
    ).collect()
    assert tuple(got[0]) == ("Müller", "Thomas", "Mueller, T.")
    # no comma → given '' (reference contributions.py:291-303 emits the
    # empty-string givenName literal from its except branch)
    assert tuple(got[1]) == ("Einname", "", "Einname")
    assert tuple(got[2]) == ("von Humboldt", "Alexander", "von Humboldt, A.")


def test_country_fixes(spark):
    df = corpus_df(spark, ["COSTA", "CZECH", "PEOPLES", "Germany"])
    got = [r[0] for r in df.select(names.sanitize_country_name(F.col("s"))).collect()]
    assert got == ["Costa Rica", "Czech Republic", "People's Republic of China", "Germany"]


def test_trial_numbers(spark):
    df = corpus_df(spark, [
        "Study preregistered under NCT01234567 and DRKS00001234",
        "see ISRCTN12345678",
        "nothing here",
    ])
    got = [r[0] for r in df.select(trials.extract_trial_numbers(F.col("s"))).collect()]
    assert [(t.number, t.registry) for t in got[0]] == [
        ("DRKS00001234", "drks"), ("NCT01234567", "clinical-trials-gov"),
    ]
    assert [(t.number, t.registry) for t in got[1]] == [("ISRCTN12345678", "srctn"), ("isrctn", "dutch-trial-register")] or \
        [(t.number, t.registry) for t in got[1]][0] == ("ISRCTN12345678", "srctn")
    assert got[2] == []


def test_license_uri(spark):
    df = spark.createDataFrame(
        [
            Row(c="CC BY 4.0", d=None),
            Row(c="PUBL", d=None),
            Row(c="XYZ", d="Volles Urheberrecht des Verlags bla"),
            Row(c="Hogrefe OpenMind Lizenz", d=None),
            Row(c="Exclusive Springer something", d=None),
            Row(c="nonsense", d=None),
        ]
    )
    got = [r[0] for r in df.select(licenses.license_uri(F.col("c"), F.col("d"))).collect()]
    L = "https://w3id.org/zpid/vocabs/licenses/"
    assert got == [L + "CC_BY_4_0", L + "PUBL", L + "PUBL", L + "HogrefeOpenMind", L + "ExclusiveSpringer", None]


def test_grant_split_and_funder_canonicalization(spark):
    df = corpus_df(spark, ["12345, 67890 and 13579", "1 und 2", "77 & 88; 99"])
    got = [r[0] for r in df.select(grants.split_grant_numbers(F.col("s"))).collect()]
    assert got == [["12345", "67890", "13579"], ["1", "2"], ["77", "88", "99"]]

    df = corpus_df(spark, ["DFG", "German Research Council", "Unknown Funder e.V."])
    out = [r[0] for r in df.select(grants.canonicalize_funder_name(F.col("s"))).collect()]
    assert out[0] == "Deutsche Forschungsgemeinschaft (DFG)"
    assert out[1] == "Deutsche Forschungsgemeinschaft (DFG)"
    assert out[2] == "Unknown Funder e.V."

    df = corpus_df(spark, ["Open Access funding via Projekt DEAL", "DFG grant"])
    got = [r[0] for r in df.select(grants.is_grant_noise(F.col("s"))).collect()]
    assert got == [True, False]


def test_abstract_splits(spark):
    df = corpus_df(spark, [
        "Body text here. - Contents: 1. Intro 2. Methods",
        "Plain abstract without toc.",
        "Ein Abstract. – Inhalt: https://example.org/toc.pdf",
    ])
    got = df.select(text.split_toc(F.col("s")).alias("t")).collect()
    assert got[0].t.abstract == "Body text here." and got[0].t.toc.startswith("1. Intro")
    assert got[1].t.toc is None
    assert got[2].t.toc_is_url is True

    df = corpus_df(spark, [
        "Abstract body. (translated by DeepL)",
        "Abstract body. (c) 2022 Hogrefe",
        "List (b) item then (c) something",
        "No note at all",
    ])
    got = df.select(text.split_licensing_note(F.col("s")).alias("t")).collect()
    assert got[0].t.note == "translated by DeepL" and got[0].t.abstract == "Abstract body."
    assert got[1].t.note == "(c) 2022 Hogrefe" and got[1].t.abstract == "Abstract body."
    assert got[2].t.note is None
    assert got[3].t.note is None and got[3].t.abstract == "No note at all"


def test_translated_title(spark):
    df = corpus_df(spark, [
        "Elektrophysiologischer Datensatz. (DeepL) |s German",
        "A plain translated title |s English",
        "No subfield at all",
    ])
    got = df.select(text.parse_translated_title(F.col("s")).alias("t")).collect()
    assert got[0].t.title == "Elektrophysiologischer Datensatz." and got[0].t.lang_name == "German" and got[0].t.origin == "DeepL"
    assert got[1].t.title == "A plain translated title" and got[1].t.lang_name == "English" and got[1].t.origin is None
    assert got[2].t.title == "No subfield at all" and got[2].t.lang_name is None


def test_annif_stub_fixed_codes(spark):
    """J8 deterministic Annif stand-in (reference local_api_lookups.py:
    61-95 + publication_types.py:133-198: title+abstract → one method
    code): content-dependent, pinned expected codes for fixed inputs,
    identical across the Column expression, the Arrow twin, and the
    oracle's mirror."""
    from psyndex2linkeddata_spark.emit import arrow as A
    from psyndex2linkeddata_spark.emit.genres import annif_stub_code, annif_text

    cases = [
        ("Mindfulness and stress", "A randomized controlled trial of mindfulness.", "10300"),
        ("Der Einfluss von Achtsamkeit", None, "12100"),
    ]
    df = spark.createDataFrame(
        [(t, a) for t, a, _ in cases], "title string, abstract string"
    )
    got = [
        r[0]
        for r in df.select(
            annif_stub_code(annif_text(F.col("title"), F.col("abstract")))
        ).collect()
    ]
    assert got == [c for _, _, c in cases]
    for t, a, c in cases:
        assert A.annif_stub_code(A.annif_text(t, a)) == c


def test_repetition_stats(spark):
    from psyndex2linkeddata_spark.functions.textstats import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "buy now buy now buy now"),     # heavy repetition
            (2, "all words here are unique"),   # none
            (3, "solo"),                        # no bigrams
            (4, ""),                            # empty
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.dup_word_frac, r.top_bigram_frac)
        for r in repetition_stats(df).collect()
    }
    # 6 tokens, 2 distinct -> 4/6; bigrams: "buy now"x3, "now buy"x2 -> 3/5
    assert got[1] == (round(4 / 6, 4), 0.6)
    assert got[2] == (0.0, 0.25)  # 4 distinct bigrams -> top 1/4
    assert got[3] == (0.0, 0.0)
    assert got[4] == (0.0, 0.0)


def test_with_top_bigram_frac_matches_stats(spark):
    from psyndex2linkeddata_spark.functions.textstats import (
        repetition_stats,
        with_top_bigram_frac,
    )

    df = spark.createDataFrame(
        [(1, "buy now buy now buy now"), (2, "all words here are unique"), (3, "")],
        "doc_id long, text string",
    )
    a = {r.doc_id: r.top_bigram_frac for r in repetition_stats(df).collect()}
    out = with_top_bigram_frac(df)
    assert set(out.columns) == {"doc_id", "text", "top_bigram_frac"}
    b = {r.doc_id: r.top_bigram_frac for r in out.collect()}
    assert a == b


def test_partial_ratio_fast_paths_match_block_algorithm():
    """The substring fast path and the partial_ratio_gt upper-bound
    reject must be EXACTLY the block algorithm's decision — the J9/J10
    matcher output feeds the byte-exact reference gate."""
    import random

    from psyndex2linkeddata_spark.functions.fuzzy_names import (
        _partial_ratio_blocks,
        partial_ratio,
        partial_ratio_gt,
    )

    rng = random.Random(7)
    alpha = "abcdefghij ,.ABCxyz"
    names = [
        "Mueller, T.", "Schmidt, A.", "Mueller-Schmidt, T.", "", "a",
        "Garcia Lopez, M.", "Nguyen, H.",
    ]
    for trial in range(4000):
        if trial % 3 == 0:
            a, b = rng.choice(names), rng.choice(names)
        else:
            a = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 14)))
            b = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 18)))
        sh, lo = (a, b) if len(a) <= len(b) else (b, a)
        ref = _partial_ratio_blocks(sh, lo)
        assert partial_ratio(a, b) == ref
        for t in (0, 50, 80, 99, 100):
            assert partial_ratio_gt(a, b, t) == (ref > t)


def test_clean_text_gate_invariants():
    """clean_text skips the 106-entry dd chain when neither '^' nor
    '\\x9a' occurs, and the entity chain when '&' is absent — exact only
    while every pattern carries its marker. Pin that table property."""
    from psyndex2linkeddata_spark.data.tables import dd_codes
    from psyndex2linkeddata_spark.emit.arrow import _BASIC_ENTITIES, clean_text

    for raw, _ in dd_codes:
        assert "^" in raw or raw == "\x9a"
    for raw, _ in _BASIC_ENTITIES:
        assert raw.startswith("&")
    # spot behavior: gated and ungated inputs
    assert clean_text('a^D"&rger &amp; Co  x') == "ärger & Co  x"
    assert clean_text("plain text, no markers") == "plain text, no markers"
    assert clean_text("\x9a") == "š"


def test_parse_page_text_partition_equals_regex():
    """parse_page_text's partition(' ')+schema-set line split must equal
    the original _LINE_RE regex form: the regex's [A-Z][A-Z0-9]* tag
    constraint is subsumed by known-field membership (every SCALAR/
    REPEATED tag is uppercase-alnum), and its mandatory literal space is
    the partition separator check. Pinned over the synthetic corpus plus
    adversarial lines (no-space, leading-space, tab, double-space,
    lowercase tag, unknown uppercase tag, empty value, and bare-\\r
    line breaks — both sides universal-newline-normalize, so
    'AUP x\\rcarriage' is TWO lines: a repeated value 'x' plus a
    dropped non-tag fragment)."""
    from psyndex2linkeddata_spark.datagen.pages import (
        make_records,
        pages_rows_from_records,
    )
    from psyndex2linkeddata_spark.emit.arrow import (
        _LINE_RE,
        _REPEATED,
        _SCALARS,
        clean_text,
        parse_page_text,
    )

    # every tag the partition form can accept is uppercase-alnum, so the
    # regex tag constraint adds nothing for known fields
    for tag in _SCALARS | _REPEATED:
        assert _LINE_RE.match(f"{tag} x"), tag

    def parse_regex(text):
        rec = {}
        if text is None:
            return rec
        # same universal-newline normalization as parse_page_text (and
        # extract._entries): \r\n and lone \r are line breaks
        if "\r" in text:
            text = text.replace("\r\n", "\n").replace("\r", "\n")
        for line in clean_text(text).split("\n"):
            m = _LINE_RE.match(line)
            if not m:
                continue
            tag, value = m.group(1), m.group(2)
            if tag in _SCALARS:
                rec.setdefault(tag, value)
            elif tag in _REPEATED:
                rec.setdefault(tag, []).append(value)
        return rec

    adversarial = (
        "DFK\nDFK 0001\n DFK 0002\nDFK\t0003\nTI  double space\nti lower\n"
        "ZZZZ unknown uppercase\nAUP \nAUP x\rcarriage\nAUP a, b |i Org\n"
        "\nTI\nTI2 9 ok"
    )
    texts = [r["text"] for r in pages_rows_from_records(make_records(200))]
    for t in texts + [adversarial, None, ""]:
        assert parse_page_text(t) == parse_regex(t), t


def test_casefold_compat_matches_python_casefold(spark):
    """names.casefold_compat == str.casefold over the Latin input space
    the pipeline sees: ß, the 15 ligature/long-s/precomposed chars, and
    ordinary German text. The reference compares with casefold
    (helpers.py:380, publication_types.py:379-391); JVM lower() alone
    keeps ß and ligatures."""
    samples = [
        "Rußland", "Dißertation", "Habilſchrift", "Eﬀekt", "ﬁnal",
        "GROSSES ẞ", "Weißrußland", "Gießen", "plain ascii", "ǰẖẗẚ",
        "Ärger ÖL Übung",  # umlauts casefold to themselves (no ae here)
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = [
        r["k"]
        for r in df.select(names.casefold_compat(F.col("s")).alias("k"))
        .collect()
    ]
    assert got == [s.casefold() for s in samples]


def test_geonames_and_thesis_gate_use_casefold(spark):
    """'Rußland' resolves through the geonames map (keys are Python-
    casefolded) and an archaic 'Dißertation' BN gates ThesisDoctoral —
    both mirror the reference's casefold comparisons."""
    from psyndex2linkeddata_spark.data.tables import geonames_countries
    from psyndex2linkeddata_spark.emit.contributions import geonames_name
    from psyndex2linkeddata_spark.emit.genres import work_genres

    has_russland = any(
        n.casefold() == "russland" for n, _, _ in geonames_countries
    )
    if has_russland:
        df = spark.createDataFrame([("Rußland",)], "c string")
        got = df.select(geonames_name(F.col("c")).alias("n")).collect()
        assert got[0]["n"] is not None
    df = spark.createDataFrame(
        [
            Row(
                work="w:1",
                BE="",
                DT="01",
                DT2="",
                BN="Als Dißertation angenommen",
            )
        ]
    )
    genres = df.select(work_genres().alias("g")).collect()[0]["g"]
    assert "ThesisDoctoral" in str(genres)


def test_twin_primitives_fuzz_parity(spark):
    """Seeded adversarial fuzz: the Arrow emit kernel's string primitives
    (emit/arrow.py trim/collapse/clean_text/mainfield/subfield) must
    equal the Column expressions (functions/cleaning.py) cell-for-cell
    over composed nasty strings — DD markers (whole and truncated),
    entities (known, unknown, nested '&amp;ouml;'), pipe runs, subfield
    markers, multi-space runs, unicode spaces (\xa0,  ), umlauts
    and astral chars. The fuzz alphabet excludes C0 controls: boundary
    control chars are the one documented divergence between Spark's trim
    (0x20 only) and the kernel's <=0x20 strip, normalized out of real
    input at the page parser (see the _TRIM note in emit/arrow.py and
    test_crlf_pages_match_lf_pages_both_paths)."""
    import random

    from psyndex2linkeddata_spark.emit import arrow as ak

    rng = random.Random(42)
    dd_raws = [dd_codes[i][0] for i in range(0, len(dd_codes), 11)]
    pieces = (
        ["|a", "|b", "|u", "|x", "|", "||", " |a", "|a ", "x|y"]
        + dd_raws
        + ["^", "^D", "\x9a", "&amp;", "&ouml;", "&#x27;", "&nosuch;", "&", "&&amp;"]
        + ["  ", "   ", " ", "\xa0", " ", "…", "ä", "ß", "é", "😀"]
        + ["Zürich", "10.1016/j.x", "word", "UND", "x"]
    )
    strings = []
    for _ in range(600):
        n = rng.randint(0, 10)
        strings.append("".join(rng.choice(pieces) for _ in range(n)))
    strings += ["", " ", "   ", "|a", "&amp;ouml;", "^DD", None]

    df = spark.createDataFrame([(i, s) for i, s in enumerate(strings)], "i long, s string")
    sel = df.select(
        "i",
        F.trim("s").alias("t"),
        cleaning.collapse_spaces(F.col("s")).alias("c"),
        cleaning.clean_text(F.col("s")).alias("cl"),
        cleaning.get_mainfield(F.col("s"), clean=False).alias("m"),
        *[
            cleaning.get_subfield(F.col("s"), nm, clean=False).alias(f"s_{nm}")
            for nm in ("a", "b", "u", "x")
        ],
    )
    got = {r["i"]: r for r in sel.collect()}
    for i, s in enumerate(strings):
        r = got[i]
        if s is None:
            want_t = None
        else:
            want_t = s.strip(" ")  # domain is C0-free: trims agree on ' '
        assert r["t"] == want_t, f"trim {s!r}"
        assert r["c"] == ak.collapse(s), f"collapse {s!r}"
        assert r["cl"] == ak.clean_text(s), f"clean_text {s!r}"
        assert r["m"] == ak.mainfield(s), f"mainfield {s!r}"
        for nm in ("a", "b", "u", "x"):
            assert r[f"s_{nm}"] == ak.subfield(s, nm), f"subfield |{nm} {s!r}"

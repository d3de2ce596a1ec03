"""extract_works (plans/works.py) vs the reference's own worked cases.

The reference's work_extraction.ipynb is a design document that works
through real PSYNDEX records; these tests pin its three named scenarios:

1. the 14 'Aktuelle Ergebnisse der Werbewirkungsforschung' yearly
   articles — same title/author/journal, different abstracts, MUST NOT
   merge (block > 5 → the notebook's no-merge guard);
2. the 'Interkulturelle Kompetenz' chapter in a Springer living
   reference and the finished reference — same title/authors/abstract,
   one year apart → ONE work;
3. the 'Verteilung des Glaubens...' report (preprint) vs journal
   article — titles differing only in ':' vs '.', same abstract →
   separate works LINKED as preprint, not merged.
"""

from pyspark.sql import types as T

from psyndex2linkeddata_spark.plans.works import extract_works

SCHEMA = T.StructType(
    [
        T.StructField("rec_id", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("authors", T.StringType()),
        T.StructField("journal", T.StringType()),
        T.StructField("year", T.IntegerType()),
        T.StructField("doctype", T.StringType()),
        T.StructField("abstract", T.StringType()),
    ]
)


def _run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        r["rec_id"]: (r["work_id"], r["block_size"], r["relation"])
        for r in extract_works(df).collect()
    }


def test_yearly_series_block_never_merges(spark):
    rows = [
        (
            f"r{i:02d}",
            "Aktuelle Ergebnisse der Werbewirkungsforschung",
            "Gleich, Uli",
            "Media Perspektiven",
            1995 + i,
            "article",
            f"different abstract {i}",
        )
        for i in range(14)
    ]
    got = _run(spark, rows)
    assert all(v[2] == "blocked_series" for v in got.values())
    assert all(v[0] == k for k, v in got.items())  # every record its own work
    assert all(v[1] == 14 for v in got.values())


def test_living_reference_chapters_merge_to_one_work(spark):
    abstract = "Die zunehmende Forderung nach der Entwicklung ..."
    rows = [
        (
            "r0368936",
            "Interkulturelle Kompetenz: Kritische Betrachtung eines Konstrukts",
            "Genkova, Petia",
            None,
            2019,
            "chapter",
            abstract,
        ),
        (
            "r0360687",
            "Interkulturelle Kompetenz. Kritische Betrachtung eines Konstrukts",
            "Genkova, Petia",
            None,
            2020,
            "chapter",
            abstract,
        ),
    ]
    got = _run(spark, rows)
    assert got["r0368936"] == ("r0360687", 2, "merged")
    assert got["r0360687"] == ("r0360687", 2, "merged")


def test_preprint_report_links_but_does_not_merge(spark):
    abstract = "same abstract on both sides"
    title_a = (
        "Verteilung des Glaubens an eine gerechte Welt in der"
        " Allgemeinbevölkerung: Normwerte"
    )
    title_b = (
        "Verteilung des Glaubens an eine gerechte Welt in der"
        " Allgemeinbevölkerung. Normwerte"
    )
    authors = "Schmitt, Manfred; Dalbert, Claudia"
    rows = [
        ("rA", title_a, authors, "Social Justice Research", 2008, "article", abstract),
        ("rB", title_b, authors, None, 2007, "report", abstract),
    ]
    got = _run(spark, rows)
    # linked, not merged: each keeps its own work id
    assert got["rA"] == ("rA", 2, "preprint")
    assert got["rB"] == ("rB", 2, "preprint")


def test_empty_abstracts_are_not_merge_evidence(spark):
    rows = [
        ("r1", "Same Title", "Same Author", "J", 2001, "article", ""),
        ("r2", "Same Title", "Same Author", "J", 2001, "article", "  "),
    ]
    got = _run(spark, rows)
    # identical (empty) abstracts collide as hashes but are no evidence;
    # same journal + different abstracts → the serial-sibling review label
    assert got["r1"] == ("r1", 2, "serial")
    assert got["r2"] == ("r2", 2, "serial")


def test_empty_journals_are_not_serial_evidence(spark):
    """Journals that normalize to '' (empty, whitespace, punctuation-only)
    are no-journal, symmetric with the abstract guard: two journal-less
    same-block records with different abstracts stay singletons."""
    for j in ("", "  ", "—"):
        rows = [
            ("r1", "Same Title", "Same Author", j, 2001, "article", "abs one"),
            ("r2", "Same Title", "Same Author", j, 2001, "article", "abs two"),
        ]
        got = _run(spark, rows)
        assert got["r1"][2] == "singleton", repr(j)
        assert got["r2"][2] == "singleton", repr(j)

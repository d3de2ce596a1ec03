"""J4 — FundRef retry-on-truncation (reference convert_starxml_to_bf.py:871-877:
when the funders?query= lookup has zero hits for the full name, it recurses
with `funder_name.split(",")[0]`, i.e. everything after the first comma
dropped; one truncation removes all commas, so there are exactly two tiers).

Engine shape: plans/enrich.fundref_links does a broadcast left join on the
full F28-canonicalized key, then a second broadcast left join on the
pre-comma key, coalesced so a full-name hit always wins. The seeded corpus
exercises the tier end to end (datagen/pages.py i%37==11 injects
pools.FUNDER_COMMA, whose authority row registers only the pre-comma
prefix) through the golden-with-authorities P=R gate; this file pins the
tier semantics at unit level.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from psyndex2linkeddata_spark import namespaces as NS
from psyndex2linkeddata_spark.plans.enrich import fundref_links

AUTH_SCHEMA = (
    "org_id string, name string, aliases array<string>, "
    "country_name string, fundref_doi string"
)


def _funder_triples(spark, labels):
    rows = [
        (f"https://w3id.org/zpid/resources/works/w{i}_funding{i}_funder",
         NS.RDFS_LABEL, lbl, True)
        for i, lbl in enumerate(labels)
    ]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_is_iri boolean"
    ).withColumns({"lang": F.lit(None).cast("string"),
                   "dtype": F.lit(None).cast("string")})


def _dois(df):
    return {
        r.obj
        for r in df.where(F.col("pred") == NS.RDF + "value").collect()
    }


def test_truncation_tier_resolves_comma_tail(spark):
    auth = spark.createDataFrame(
        [("https://ror.org/0aaa", "Stiftung Warentest", [], "Germany",
          "10.13039/100")],
        AUTH_SCHEMA,
    )
    t = _funder_triples(spark, ["Stiftung Warentest, Berlin"])
    # full key "stiftung warentest berlin" misses; pre-comma key hits
    assert _dois(fundref_links(t, auth)) == {"10.13039/100"}


def test_full_name_hit_wins_over_truncation(spark):
    auth = spark.createDataFrame(
        [
            ("https://ror.org/0aaa", "Stiftung Warentest", [], "Germany",
             "10.13039/100"),
            # norm_key folds the comma, so the full two-part name is an
            # authority row of its own with a DIFFERENT doi
            ("https://ror.org/0bbb", "Stiftung Warentest Berlin", [],
             "Germany", "10.13039/200"),
        ],
        AUTH_SCHEMA,
    )
    t = _funder_triples(spark, ["Stiftung Warentest, Berlin"])
    assert _dois(fundref_links(t, auth)) == {"10.13039/200"}


def test_no_comma_never_truncates(spark):
    auth = spark.createDataFrame(
        [("https://ror.org/0aaa", "Stiftung", [], "Germany", "10.13039/100")],
        AUTH_SCHEMA,
    )
    t = _funder_triples(spark, ["Stiftung Warentest"])
    assert fundref_links(t, auth).count() == 0


def test_fundref_less_full_hit_falls_through_to_truncation(spark):
    # the best full-key row has no fundref_doi → reference sees "no hits"
    # from the funders endpoint and retries truncated
    auth = spark.createDataFrame(
        [
            ("https://ror.org/0ccc", "Stiftung Warentest Berlin", [],
             "Germany", None),
            ("https://ror.org/0aaa", "Stiftung Warentest", [], "Germany",
             "10.13039/100"),
        ],
        AUTH_SCHEMA,
    )
    t = _funder_triples(spark, ["Stiftung Warentest, Berlin"])
    assert _dois(fundref_links(t, auth)) == {"10.13039/100"}


def test_node_shape(spark):
    auth = spark.createDataFrame(
        [("https://ror.org/0aaa", "Stiftung Warentest", [], "Germany",
          "10.13039/100")],
        AUTH_SCHEMA,
    )
    t = _funder_triples(spark, ["Stiftung Warentest, Berlin"])
    rows = {(r.subj, r.pred, r.obj) for r in fundref_links(t, auth).collect()}
    subj = "https://w3id.org/zpid/resources/works/w0_funding0_funder"
    fnode = subj + "_funderid"
    assert rows == {
        (fnode, NS.RDF_TYPE, NS.PXC + "FundRefDoi"),
        (fnode, NS.RDF + "value", "10.13039/100"),
        (subj, NS.BF + "identifiedBy", fnode),
    }

"""record_keys / dublettencheck vs the reference's own golden.

pythontests.ipynb's "generate a title key for deduplication
(Dublettencheck und Werksextraktion)" cell defines the reference's
duplicate-check keys and writes its worked example to
records_with_keys.json — checked in under other_conversions/. The Spark
keys must reproduce every checked-in key byte-for-byte, and the
two-tier classification (find_duplicate_dfks) must land the notebook's
own expectations: {0368936, 0368935} and {000002, 000003} definite,
the Interkulturelle and Homogenität blocks possible.
"""

import json
import os

import pytest
from pyspark.sql import types as T

from psyndex2linkeddata_spark.plans.works import dublettencheck, record_keys

GOLDEN = "/root/reference/other_conversions/records_with_keys.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN), reason="reference records_with_keys.json absent"
)

SCHEMA = T.StructType(
    [
        T.StructField("DFK", T.StringType()),
        T.StructField("mainTitle", T.StringType()),
        T.StructField("subtitle", T.StringType()),
        T.StructField(
            "authors",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("familyname", T.StringType()),
                        T.StructField("givenname", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


@pytest.fixture(scope="module")
def golden():
    with open(GOLDEN, encoding="utf-8") as f:
        return json.load(f)


@pytest.fixture(scope="module")
def records(spark, golden):
    rows = [
        (
            g["DFK"],
            g["mainTitle"],
            g["subtitle"],
            [(a["familyname"], a["givenname"]) for a in g["authors"]],
        )
        for g in golden
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_keys_match_reference_golden_exactly(records, golden):
    got = {r["DFK"]: r for r in record_keys(records).collect()}
    for g in golden:
        r = got[g["DFK"]]
        assert r["title_key"] == g["title_key"], g["DFK"]
        assert r["first_author_key"] == g["first_author_key"], g["DFK"]
        assert r["all_authors_key"] == g["all_authors_key"], g["DFK"]


def test_classification_matches_notebook_expectations(records):
    rows = {r["DFK"]: r for r in dublettencheck(records).collect()}
    definite = {d for d, r in rows.items() if r["n_definite"] > 1}
    possible = {d for d, r in rows.items() if r["n_possible"] > 1}
    # "these two are exact duplicates" (notebook comments)
    assert definite == {"0368936", "0368935", "000002", "000003"}
    # the Interkulturelle record with the divergent second author and
    # the Homogenität variant join only the possible tier
    assert possible == definite | {"0360687", "000001"}


def test_digit_quirk_kept_verbatim(spark):
    """The reference's character class is [^a-z&0-0] — a 0-0 range, so
    keys keep the digit 0 and strip 1-9. Faithfully replicated."""
    rows = [("d1", "Study 2020 part 1", "", [("Ab", "C")])]
    df = spark.createDataFrame(rows, SCHEMA)
    assert record_keys(df).collect()[0]["title_key"] == "study00part"

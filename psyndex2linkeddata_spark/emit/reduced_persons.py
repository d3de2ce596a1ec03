"""Reduced-persons sub-converter: personen_uuid rows → person triples.

Spark-first re-expression of the reference's reduced-persons converter
(/root/reference/other_conversions/persons/other_persons/
convert_reduced_persons.py — cited per emitter below), gated EXACTLY
against its executed output (tools/refexec/run_reduced_persons.py;
tests/test_reduced_persons_refexec.py). Fourth converter on the
engine's T/pack primitives.

Two stages are Arrow-batched Python by necessity, the rest is native
Columns:
  - base58 person ids (convert_reduced_persons.py:110-138): encoding a
    128-bit UUID is bignum division, not expressible in built-in
    expressions; functions/base58.py is pinned to the public test
    vectors independently of the refexec shim.
  - name-variant ordering (:366-418): the reference numbers
    ``#varname_{i+1}`` from ``list(set(...))``, whose iteration order is
    a function of PYTHONHASHSEED. The UDF replays the exact Python
    semantics (";"-splits of GND_Var then Varianten, first-occurrence
    removal of the preferred "Nachname, Vorname" string, then
    ``list(set(...))``); PySpark workers run with the driver's
    PYTHONHASHSEED (default "0", pyspark/core/context.py:298) and the
    refexec runner pins its subprocess to the same seed, so both
    engines' orders coincide. A real deployment would sort the variant
    list instead; faithful replay requires the seed-pinned set walk.

Both are dimension-scale (a one-off ~40k-row authority dump in the
reference), so the Arrow stages are not on any fact-table hot path.

Native quirk mirrors: variants split on ", " keep only the first two
parts (a two-comma variant drops its tail, :182-190) via F.get;
a variant without ", " takes the IndexError arm (empty given name);
ORCIDs/PsychAuthorsIDs are regex-validated (:262/:287) and silently
dropped when invalid; isPsych maps Y/N to an xsd:boolean literal and
anything else to no triple (:225-248); the prefname node is emitted
unconditionally, empty-string literals included (:140-165).
"""

from __future__ import annotations

import uuid as uuidlib

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

from psyndex2linkeddata_spark import namespaces as NS
from psyndex2linkeddata_spark.emit.base import T, explode_triples, pack, typ
from psyndex2linkeddata_spark.functions.base58 import b58encode

PERSONS = "https://w3id.org/zpid/authorities/agents/persons/"
GNDO = "https://d-nb.info/standards/elementset/gnd#"
RDF_VALUE = NS.RDF + "value"
XSD_BOOL = "http://www.w3.org/2001/XMLSchema#boolean"

_ORCID_RE = r"^(\d{4}-){3}\d{3}(\d|X)$"
_PAID_RE = r"^p0\d{4}[A-Z]{2}$"


def _b58_uuid_udf():
    # built lazily: pandas_udf resolves its return type against the
    # active session, which need not exist at import time
    @pandas_udf("string")
    def _b58_uuid(u: pd.Series) -> pd.Series:
        return u.map(lambda s: b58encode(uuidlib.UUID(s).bytes))

    return _b58_uuid


def _variant_list_udf():
    @pandas_udf("array<string>")
    def _variant_list(
        gnd_var: pd.Series, varianten: pd.Series, pref: pd.Series
    ) -> pd.Series:
        def one(gv: str, lv: str, p: str) -> list[str]:
            nv: list[str] = []
            if gv:
                nv.extend(gv.split(";"))
            if lv:
                nv.extend(lv.split(";"))
            if p in nv:
                nv.remove(p)
            return list(set(nv))

        return pd.Series(
            [one(g, l, p) for g, l, p in zip(gnd_var, varianten, pref)]
        )

    return _variant_list


def reduced_person_triples(df: DataFrame) -> DataFrame:
    """personen_uuid rows (datagen.reduced_persons.reduced_persons_df
    shape: all dump columns as strings) → triples DataFrame."""
    pref = F.concat(F.col("Nachname"), F.lit(", "), F.col("Vorname"))
    j = df.withColumn(
        "_person", F.concat(F.lit(PERSONS + "p_"), _b58_uuid_udf()(F.col("uuid")))
    ).withColumn(
        "_variants",
        _variant_list_udf()(F.col("GND_Var"), F.col("Varianten"), pref),
    )
    person = F.col("_person")
    prefname = F.concat(person, F.lit("#prefname"))
    orcid_ok = F.regexp_like(F.col("ORCID"), F.lit(_ORCID_RE))
    orcid_node = F.when(
        (F.col("ORCID") != "") & orcid_ok, F.concat(person, F.lit("#orcid"))
    )
    paid_ok = F.regexp_like(F.col("PsychAuthorsID"), F.lit(_PAID_RE))
    paid_node = F.when(
        (F.col("PsychAuthorsID") != "") & paid_ok,
        F.concat(person, F.lit("#psychauthorsid")),
    )
    gnd_node = F.when(F.col("GND") != "", F.concat(person, F.lit("#gndid")))
    uuid_node = F.when(F.col("uuid") != "", F.concat(person, F.lit("#uuid")))
    psych = (
        F.when(F.col("isPsych") == "Y", F.lit("true"))
        .when(F.col("isPsych") == "N", F.lit("false"))
    )

    # variant names, numbered in the seed-pinned set order (:366-418) —
    # built INSIDE the same projection via transform+flatten so the two
    # Arrow stages run once (a union branch would re-evaluate both UDFs
    # per branch) and the whole emit is one narrow pass
    def one_variant(v, i):
        parts = F.split(v, ", ")
        family = F.trim(F.get(parts, 0))
        given = F.trim(F.coalesce(F.get(parts, 1), F.lit("")))
        vnode = F.concat(person, F.lit("#varname_"), (i + 1).cast("string"))
        return pack(
            typ(vnode, GNDO + "NameOfThePerson"),
            T(vnode, NS.SCHEMA + "givenName", given),
            T(vnode, NS.SCHEMA + "familyName", family),
            T(person, GNDO + "variantNameEntityForThePerson", vnode, iri=True),
        )

    variant_arr = F.flatten(F.transform(F.col("_variants"), one_variant))

    out = j.select(
        F.concat(
            pack(
                typ(person, NS.SCHEMA + "Person"),
                typ(person, NS.BF + "Person"),
                # preferred name, unconditional (:140-165, :371)
                typ(prefname, GNDO + "NameOfThePerson"),
                T(prefname, NS.SCHEMA + "givenName", F.col("Vorname")),
                T(prefname, NS.SCHEMA + "familyName", F.col("Nachname")),
                T(person, GNDO + "preferredNameEntityForThePerson", prefname, iri=True),
                # ORCID, validated (:251-279)
                typ(orcid_node, NS.LOCID + "orcid"),
                T(orcid_node, RDF_VALUE, F.col("ORCID")),
                T(person, NS.BF + "identifiedBy", orcid_node, iri=True),
                # PsychAuthors ID, validated (:281-305)
                typ(paid_node, NS.PXC + "PsychAuthorsID"),
                T(paid_node, RDF_VALUE, F.col("PsychAuthorsID")),
                T(person, NS.BF + "identifiedBy", paid_node, iri=True),
                # GND id, never validated (:308-328)
                typ(gnd_node, NS.LOCID + "gnd"),
                T(gnd_node, RDF_VALUE, F.col("GND")),
                T(person, NS.BF + "identifiedBy", gnd_node, iri=True),
                # uuid as bf:Local (:330-350)
                typ(uuid_node, NS.BF + "Local"),
                T(uuid_node, RDF_VALUE, F.col("uuid")),
                T(person, NS.BF + "identifiedBy", uuid_node, iri=True),
                # psychologist flag (:225-248)
                T(person, NS.PXP + "isPsychologist", psych, dtype=XSD_BOOL),
            ),
            variant_arr,
        ).alias("_arr")
    )

    return explode_triples(out, F.col("_arr")).distinct()

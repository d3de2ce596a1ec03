"""Psychauthors sub-converter: kerndaten person rows → schema:Person triples.

Spark-first re-expression of the reference's person-authority converter
(/root/reference/other_conversions/psychauthors/convert_psychauthors_rdf.py
— cited per emitter below), gated EXACTLY against the reference's own
executed output (tools/refexec/run_psychauthors.py runs it offline over
the identical synthetic kerndaten CSV; tests/test_psychauthors_refexec.py
asserts triple-set equality). Third converter on the same T/pack
primitives (after the main pipeline and emit/journals.py).

Faithfully replicated reference quirks (each cited):
  - CROSS-RECORD MUTABLE STATE, again: the `gender` loop variable is
    only (re)assigned for "Herr"/"Frau"/"" inputs
    (convert_psychauthors_rdf.py:195-206); any other non-empty value
    inherits the PREVIOUS record's gender (record 0 → NameError → no
    triple). Compiles to a running last(ignorenulls) window over dump
    order — single-partition by design: persons are an authority
    DIMENSION (a one-off DB dump), not web-scale fact data.
  - LAST-match-wins synonym scans: the degree_lookup and college_lookup
    loops have no break (convert_psychauthors_rdf.py:363-368/375-381),
    so the LAST table entry with a matching substring wins. Compiles to
    a when-chain over the REVERSED table (data/psychauthors.py).
  - `titel` indexes academic_titles BY LIST POSITION, not by the dicts'
    own "number" key (convert_psychauthors_rdf.py:430); non-numeric or
    out-of-range values are swallowed (no triple).
  - Placeholders skipped: birthdate "1000-01-01"
    (convert_psychauthors_rdf.py:213), email "zpid@zpid.de" (:227).
  - Award/qualification lists are "\\r"-separated INSIDE one CSV field;
    the per-person node counter counts only non-empty entries
    (convert_psychauthors_rdf.py:288-291); awards strip whitespace then
    ONE leading "-" then whitespace again (:294-296).
  - Date extraction is the declared shared first-year rule
    (tools/refexec/shims/dateparser/search.py) — the reference consumes
    only `.strftime("%Y")` of dateparser's first hit.
  - The ROR affiliation API tier for unmatched colleges degrades offline
    to "no college" (the runner's 503 shim → the converter's unpack
    TypeError → None), so no org name/sameAs is emitted — matching this
    engine's no-network contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from psyndex2linkeddata_spark import namespaces as NS
from psyndex2linkeddata_spark.data.psychauthors import (
    ACADEMIC_TITLES,
    COLLEGE_LOOKUP,
    DEGREE_LOOKUP,
)
from psyndex2linkeddata_spark.emit.base import T, explode_triples, pack, typ

PERSONS = "https://w3id.org/zpid/resources/authorities/persons/"
GNDO = "https://d-nb.info/standards/elementset/gnd#"
GENDER = "https://w3id.org/zpid/vocabs/gender/"
QUAL = "https://w3id.org/zpid/vocabs/qualifications/"
RDF_VALUE = NS.RDF + "value"
XSD_DATE = "http://www.w3.org/2001/XMLSchema#date"
XSD_GYEAR = "http://www.w3.org/2001/XMLSchema#gYear"
SKOS_CONCEPT = NS.SKOS + "Concept"
SKOS_PREFLABEL = NS.SKOS + "prefLabel"

# the shared first-year rule (shims/dateparser/search.py): first
# standalone 4-digit year 1000-2999, digits on neither side
_YEAR_RE = r"(?<!\d)([12]\d{3})(?!\d)"


def _first_year(col: Column) -> Column:
    y = F.regexp_extract(col, _YEAR_RE, 1)
    return F.when(y != "", y)


def _nonempty(col: Column) -> Column:
    return F.when(col != "", col)


def _degree(q: Column) -> Column:
    """LAST matching degree_lookup entry (reversed when-chain), default
    'other' (convert_psychauthors_rdf.py:361-371)."""
    out = F.lit("other")
    chain = None
    for name, synonyms in reversed(DEGREE_LOOKUP):
        cond = None
        for s in synonyms:
            c = q.contains(F.lit(s))
            cond = c if cond is None else (cond | c)
        chain = F.when(cond, F.lit(name)) if chain is None else chain.when(cond, F.lit(name))
    return chain.otherwise(out) if chain is not None else out


def _college(q: Column) -> Column:
    """LAST matching college_lookup entry as struct(name, ror); null
    when no synonym matches (the offline ROR-API arm then emits no org
    name/sameAs)."""
    chain = None
    for name, ror, synonyms in reversed(COLLEGE_LOOKUP):
        cond = None
        for s in synonyms:
            c = q.contains(F.lit(s))
            cond = c if cond is None else (cond | c)
        val = F.struct(
            F.lit(name).alias("name"), F.lit(ror).cast("string").alias("ror")
        )
        chain = F.when(cond, val) if chain is None else chain.when(cond, val)
    return chain


def psychauthor_triples(df: DataFrame) -> DataFrame:
    """kerndaten rows (datagen.psychauthors.psychauthors_df shape:
    seq + all dump columns as strings) → triples DataFrame."""
    person = F.concat(F.lit(PERSONS), F.col("code"))

    # givenName gets the initial appended (convert_psychauthors_rdf.py:133)
    given = F.when(
        F.col("initial") != "", F.concat(F.col("vorname"), F.lit(" "), F.col("initial"))
    ).otherwise(F.col("vorname"))
    name = F.concat(F.col("nachname"), F.lit(", "), given)
    prefname = F.concat(person, F.lit("#prefname"))
    altname = F.concat(person, F.lit("#altname"))
    full_geb = F.concat(F.col("geb_name"), F.lit(", "), given)

    # gender carry-over window (module docstring; single-partition
    # dimension scan, same shape as emit/journals.py's note windows)
    w = Window.orderBy("seq").rowsBetween(Window.unboundedPreceding, 0)
    gender_val = (
        F.when(F.col("geschlecht") == "Herr", F.lit("male"))
        .when(F.col("geschlecht") == "Frau", F.lit("female"))
        .when(F.col("geschlecht") == "", F.lit("unknown"))
    )
    j = df.withColumn("_gender", F.last(gender_val, ignorenulls=True).over(w))

    orcid_uri = F.concat(F.lit("https://orcid.org/"), F.col("orcid"))
    paid = F.concat(person, F.lit("#psychauthorsID"))
    titel_idx = F.expr("try_cast(titel as int)")
    titel_name = F.when(
        (titel_idx >= 0) & (titel_idx < len(ACADEMIC_TITLES)),
        F.element_at(
            F.array(*[F.lit(t) for t in ACADEMIC_TITLES]), titel_idx + 1
        ),
    )

    base = j.select(
        pack(
            typ(person, NS.SCHEMA + "Person"),
            # name + preferred-name node (convert_psychauthors_rdf.py:141-157)
            T(person, NS.SCHEMA + "name", name),
            typ(prefname, GNDO + "NameOfThePerson"),
            T(prefname, NS.SCHEMA + "givenName", given),
            T(prefname, NS.SCHEMA + "familyName", F.col("nachname")),
            T(person, GNDO + "preferredNameEntityForThePerson", prefname, iri=True),
            # birth-name variant (:160-186)
            T(person, NS.SCHEMA + "alternateName", F.when(F.col("geb_name") != "", full_geb)),
            typ(F.when(F.col("geb_name") != "", altname), GNDO + "NameOfThePerson"),
            T(F.when(F.col("geb_name") != "", altname), NS.SCHEMA + "givenName", given),
            T(altname, NS.SCHEMA + "familyName", _nonempty(F.col("geb_name"))),
            T(person, GNDO + "variantNameEntityForThePerson",
              F.when(F.col("geb_name") != "", altname), iri=True),
            # gender via the carry-over window (:195-208)
            T(person, NS.SCHEMA + "gender",
              F.when(F.col("_gender").isNotNull(), F.concat(F.lit(GENDER), F.col("_gender"))),
              iri=True),
            # birthdate, placeholder skipped (:211-218)
            T(person, NS.SCHEMA + "birthDate",
              F.when((F.col("geb_tag") != "") & (F.col("geb_tag") != "1000-01-01"),
                     F.col("geb_tag")),
              dtype=XSD_DATE),
            # email, placeholder skipped (:222-229)
            T(person, NS.SCHEMA + "email",
              F.when((F.col("email") != "") & (F.col("email") != "zpid@zpid.de"),
                     F.concat(F.lit("mailto:"), F.col("email"))),
              iri=True),
            # websites (:232-248)
            T(person, NS.SCHEMA + "url", _nonempty(F.col("url1")), iri=True),
            T(person, NS.SCHEMA + "url", _nonempty(F.col("url2")), iri=True),
            # ORCID (:251-266)
            typ(F.when(F.col("orcid") != "", orcid_uri), NS.LOCID + "orcid"),
            T(F.when(F.col("orcid") != "", orcid_uri), RDF_VALUE, F.col("orcid")),
            T(person, NS.BF + "identifiedBy",
              F.when(F.col("orcid") != "", orcid_uri), iri=True),
            # psychauthors ID (:269-276)
            typ(paid, NS.PXC + "PsychAuthorsID"),
            T(paid, RDF_VALUE, F.col("code")),
            T(person, NS.BF + "identifiedBy", paid, iri=True),
            # academic title by LIST POSITION (:428-441)
            T(person, GNDO + "academicDegree", titel_name),
        ).alias("_arr")
    )

    # awards: auszeichnung ++ int_auszeichnung, "\r"-split, non-empty
    # entries numbered per person (:279-327)
    combined = F.concat(
        F.split(F.col("auszeichnung"), "\r"),
        F.split(F.col("int_auszeichnung"), "\r"),
    )
    aw = j.select(
        person.alias("_p"),
        F.posexplode(F.filter(combined, lambda x: x != "")).alias("_pos", "_raw"),
    )
    cleaned = F.trim(F.regexp_replace(F.trim(F.col("_raw")), "^-", ""))
    anode = F.concat(F.col("_p"), F.lit("#award"), (F.col("_pos") + 1).cast("string"))
    ayear = _first_year(cleaned)
    awards = aw.select(
        pack(
            typ(anode, NS.SCHEMA + "Role"),
            T(anode, NS.SCHEMA + "award", cleaned),
            T(anode, NS.SCHEMA + "startDate", ayear, dtype=XSD_GYEAR),
            T(F.col("_p"), NS.SCHEMA + "award", anode, iri=True),
        ).alias("_arr")
    )

    # qualifications (:330-425)
    qu = j.select(
        person.alias("_p"),
        F.posexplode(
            F.filter(F.split(F.col("qualifikation"), "\r"), lambda x: x != "")
        ).alias("_pos", "_raw"),
    )
    q = F.trim(F.col("_raw"))
    qnode = F.concat(
        F.col("_p"), F.lit("#qualification"), (F.col("_pos") + 1).cast("string")
    )
    org = F.concat(qnode, F.lit("#org"))
    college = _college(q)
    quals = qu.select(
        pack(
            typ(qnode, NS.SCHEMA + "OrganizationRole"),
            T(qnode, NS.SCHEMA + "alumniOf", org, iri=True),
            typ(org, NS.SCHEMA + "CollegeOrUniversity"),
            T(qnode, NS.SCHEMA + "description", q),
            T(qnode, NS.SCHEMA + "startDate", _first_year(q), dtype=XSD_GYEAR),
            T(qnode, NS.SCHEMA + "hasCredential",
              F.concat(F.lit(QUAL), _degree(q)), iri=True),
            T(org, NS.SCHEMA + "name", college["name"]),
            T(org, NS.SCHEMA + "sameAs", college["ror"], iri=True),
            T(F.col("_p"), NS.SCHEMA + "alumniOf", qnode, iri=True),
        ).alias("_arr")
    )

    # static gender-concept labels (:445-478)
    spark = df.sparkSession
    concepts = spark.range(1).select(
        pack(
            typ(GENDER + "female", SKOS_CONCEPT),
            T(GENDER + "female", SKOS_PREFLABEL, "Female", lang="en"),
            T(GENDER + "female", SKOS_PREFLABEL, "Weiblich", lang="de"),
            typ(GENDER + "male", SKOS_CONCEPT),
            T(GENDER + "male", SKOS_PREFLABEL, "Male", lang="en"),
            T(GENDER + "male", SKOS_PREFLABEL, "Männlich", lang="de"),
            typ(GENDER + "unknown", SKOS_CONCEPT),
            T(GENDER + "unknown", SKOS_PREFLABEL, "Unknown Gender", lang="en"),
            T(GENDER + "unknown", SKOS_PREFLABEL, "Geschlecht unbekannt", lang="de"),
        ).alias("_arr")
    )

    out = base
    for part in (awards, quals, concepts):
        out = out.unionByName(part)
    return explode_triples(out, F.col("_arr")).distinct()

"""Org-authority graph job: institute CSV → schema.org triples (+TTL).

The engine's replacement for the reference's norminstitute notebook
(normkoerperschaften/norminstitute.ipynb): read the
``institute_lux.csv``-shaped table (uuid, prefname, known_names,
country), build one ``schema:Organization`` node per row —

- node IRI ``https://w3id.org/zpid/resources/orgs/<uuid>``,
- ``schema:name`` Literal(prefname),
- ``schema:alternateName`` one Literal per ``" ## "``-separated
  known_names entry (the notebook's split, spaces included),
- ``schema:location`` Literal(country) verbatim,
- ``schema:sameAs`` <ror-id> when the prefname resolves (the notebook
  looks up ONLY prefname against the live ROR affiliation API; offline
  this is the engine's tiered linker against a broadcast authority
  table, the same stand-in class as jobs/ror_enrich.py)

— and serialize to a triples table and/or Turtle. The notebook applies
no character cleaning and no alternative-name fallback for the lookup;
neither does this job.

Usage:
    python -m psyndex2linkeddata_spark.jobs.org_authority \
        --in institute_lux.csv --out orgs_triples \
        [--authority ror.parquet] [--ttl orgs.ttl] [--threshold 0.5]
"""

from __future__ import annotations

import argparse
import os

from pyspark.sql import DataFrame, functions as F

from psyndex2linkeddata_spark import namespaces as NS

ORGS_NS = "https://w3id.org/zpid/resources/orgs/"


def org_authority_triples(
    orgs: DataFrame, authority: DataFrame | None = None, threshold: float = 0.5
) -> DataFrame:
    """(uuid, prefname, known_names, country) → engine triples schema."""
    node = F.concat(F.lit(ORGS_NS), F.col("uuid"))

    def t(subj, pred, obj, iri):
        return F.struct(
            subj.alias("subj"),
            F.lit(pred).alias("pred"),
            obj.alias("obj"),
            F.lit(iri).alias("obj_is_iri"),
            F.lit(None).cast("string").alias("lang"),
            F.lit(None).cast("string").alias("dtype"),
        )

    alts = F.filter(
        F.split(F.coalesce(F.col("known_names"), F.lit("")), " ## "),
        lambda s: s != "",
    )
    arr = F.concat(
        F.array(
            t(node, NS.RDF_TYPE, F.lit(NS.SCHEMA + "Organization"), True),
            t(node, NS.SCHEMA + "name", F.col("prefname"), False),
            t(node, NS.SCHEMA + "location", F.col("country"), False),
        ),
        F.transform(alts, lambda nm: t(node, NS.SCHEMA + "alternateName", nm, False)),
    )
    # rdflib's Graph has set semantics (g.add of a repeated alternate
    # name is a no-op); mirror that here — and below for the sameAs union
    base = orgs.select(F.explode(arr).alias("_t")).select("_t.*").dropDuplicates()

    if authority is None:
        return base
    from psyndex2linkeddata_spark.operators.linking import link_affiliation

    # the notebook queries the ROR affiliation API with the prefname
    # alone (no country suffix); same stand-in as jobs/ror_enrich.py
    linked = link_affiliation(
        orgs.select("uuid", "prefname"),
        authority,
        mention_key="prefname",
        auth_key="name",
        auth_cols=["ror_id"],
    ).where(F.col("ror_id").isNotNull())
    same_as = linked.select(
        F.concat(F.lit(ORGS_NS), F.col("uuid")).alias("subj"),
        F.lit(NS.SCHEMA + "sameAs").alias("pred"),
        F.col("ror_id").alias("obj"),
        F.lit(True).alias("obj_is_iri"),
        F.lit(None).cast("string").alias("lang"),
        F.lit(None).cast("string").alias("dtype"),
    )
    return base.unionByName(same_as).dropDuplicates()


def main(argv=None) -> None:
    from psyndex2linkeddata_spark.session import get_spark
    from psyndex2linkeddata_spark.sources.export import (
        move_single_part,
        read_table_auto,
        write_turtle,
    )

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--in", dest="inp", required=True,
                    help="CSV with (uuid, prefname, known_names, country)")
    ap.add_argument("--out", required=True, help="triples parquet path")
    ap.add_argument("--authority",
                    help="parquet/CSV (name, ror_id[, ...]) for schema:sameAs")
    ap.add_argument("--ttl", help="also serialize Turtle here (single file)")
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    spark = get_spark(app_name="org_authority", master=args.master)
    orgs = spark.read.csv(args.inp, header=True, quote='"', escape='"')
    authority = (
        read_table_auto(spark, args.authority) if args.authority else None
    )
    triples = org_authority_triples(orgs, authority, threshold=args.threshold)
    triples.write.mode("overwrite").parquet(args.out)
    if args.ttl:
        # the Turtle sink writes a Spark directory; the notebook contract
        # (g.serialize(destination=...)) is one plain .ttl file
        import tempfile

        staged = tempfile.mkdtemp(prefix="org_ttl_")
        write_turtle(
            spark.read.parquet(args.out),
            os.path.join(staged, "ttl"),
            single_file=True,
        )
        move_single_part(staged, args.ttl, pattern=os.path.join("ttl", "part-*"))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

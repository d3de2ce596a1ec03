"""The authority-conversion job: the reference's three sub-converter
inputs → one (or three) triples tables.

Runs any subset of the sub-converter emitters over their native input
shapes and writes the triples as parquet (same schema as the main
pipeline's triple table, so jobs/query.py's SPARQL surface works over
the output unchanged — e.g. the journals KG's own validation .rq files):

    python -m psyndex2linkeddata_spark.jobs.authorities \
        --journals-xml journals.xml --journals-lookups LOOKUP_DIR \
        --kerndaten kerndaten.csv \
        --personen personen_uuid.csv \
        --out /path/out [--merge] [--master local[8]]

Inputs mirror what the reference's converters read
(journal_convert.py: STAR journal XML + jtc_uuid/review CSV lookups;
convert_psychauthors_rdf.py: the kerndaten CSV dump;
convert_reduced_persons.py: the TAB-separated personen_uuid.csv).
Omitted inputs skip that converter. --merge unions everything into one
table at <out>/authorities; otherwise each converter writes its own
subdirectory (journals/, psychauthors/, reduced_persons/).

These are authority DIMENSIONS (10³-10⁵ rows), so the job runs them as
single small Spark jobs — the distributed-scale machinery (bucketed
sinks, checkpointed resume) lives in jobs/convert.py where the fact
table is.
"""

from __future__ import annotations

import argparse
import os

from pyspark.sql import SparkSession


def _journals(spark: SparkSession, xml_path: str, lookup_dir: str):
    from psyndex2linkeddata_spark.emit.journals import journal_triples

    # journal fields are scalar-or-repeated plain tags under <Record>
    # (no |subfield encoding) — a flat ElementTree walk mirrors
    # journal_convert.py's own reader; the export is a dimension file
    from psyndex2linkeddata_spark.datagen.journals import (
        JOURNAL_FIELDS_REPEATED,
        JOURNAL_FIELDS_SCALAR,
    )
    import xml.etree.ElementTree as ET

    recs = []
    for rec_el in ET.parse(xml_path).getroot().iter("Record"):
        rec = {k: None for k in JOURNAL_FIELDS_SCALAR}
        rec.update({k: [] for k in JOURNAL_FIELDS_REPEATED})
        for child in rec_el:
            if child.tag in JOURNAL_FIELDS_REPEATED:
                rec[child.tag].append(child.text or "")
            else:
                rec[child.tag] = child.text
        recs.append(rec)
    from psyndex2linkeddata_spark.datagen.journals import journals_df

    j = journals_df(spark, recs)
    uuid_lk = (
        spark.read.option("header", True)
        .csv(os.path.join(lookup_dir, "jtc_uuid_lookup.csv"))
        .toDF("JTC", "uuid")
    )
    review_lk = (
        spark.read.option("header", True)
        .csv(os.path.join(lookup_dir, "review_lookup.csv"))
        .toDF("JTC", "rv")
    )
    return journal_triples(j, uuid_lk, review_lk)


def _psychauthors(spark: SparkSession, kerndaten_csv: str):
    import csv

    from psyndex2linkeddata_spark.datagen.psychauthors import (
        KERNDATEN_FIELDS,
        psychauthors_df,
    )
    from psyndex2linkeddata_spark.emit.psychauthors import psychauthor_triples

    # read exactly as the reference does (csv.DictReader: "\r"-separated
    # lists live INSIDE quoted fields, which Spark's csv reader would
    # need multiLine to preserve — a dimension dump, driver-side is fine)
    with open(kerndaten_csv, newline="", encoding="utf-8") as f:
        recs = [
            {k: (row.get(k) or "") for k in KERNDATEN_FIELDS}
            for row in csv.DictReader(f)
        ]
    return psychauthor_triples(psychauthors_df(spark, recs))


def _reduced_persons(spark: SparkSession, personen_csv: str):
    import csv

    from psyndex2linkeddata_spark.datagen.reduced_persons import (
        PERSONEN_FIELDS,
        reduced_persons_df,
    )
    from psyndex2linkeddata_spark.emit.reduced_persons import (
        reduced_person_triples,
    )

    with open(personen_csv, newline="", encoding="utf-8") as f:
        recs = [
            {k: (row.get(k) or "") for k in PERSONEN_FIELDS}
            for row in csv.DictReader(f, delimiter="\t")
        ]
    return reduced_person_triples(reduced_persons_df(spark, recs))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--journals-xml")
    ap.add_argument("--journals-lookups")
    ap.add_argument("--kerndaten")
    ap.add_argument("--personen")
    ap.add_argument("--out", required=True)
    ap.add_argument("--merge", action="store_true",
                    help="union all converters into one <out>/authorities table")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from psyndex2linkeddata_spark.session import get_spark

    spark = get_spark(app_name="authorities", master=args.master)

    parts = {}
    if args.journals_xml:
        if not args.journals_lookups:
            ap.error("--journals-xml requires --journals-lookups")
        parts["journals"] = _journals(spark, args.journals_xml, args.journals_lookups)
    if args.kerndaten:
        parts["psychauthors"] = _psychauthors(spark, args.kerndaten)
    if args.personen:
        parts["reduced_persons"] = _reduced_persons(spark, args.personen)
    if not parts:
        ap.error("no inputs given (need at least one of --journals-xml/"
                 "--kerndaten/--personen)")

    if args.merge:
        merged = None
        for df in parts.values():
            merged = df if merged is None else merged.unionByName(df)
        dest = os.path.join(args.out, "authorities")
        merged.coalesce(1).write.mode("overwrite").parquet(dest)
        n = spark.read.parquet(dest).count()
        print(f"authorities: {n} triples -> {dest}")
    else:
        for name, df in parts.items():
            dest = os.path.join(args.out, name)
            df.coalesce(1).write.mode("overwrite").parquet(dest)
            n = spark.read.parquet(dest).count()
            print(f"{name}: {n} triples -> {dest}")


if __name__ == "__main__":
    main()

"""ROR enrichment job: institute-cluster CSV → same CSV + ror_id/ror_name.

The engine's replacement for the reference's one-off enrichment script
normkoerperschaften/norminstitute_ror_to_csv.py (CSV in, per-row
requests_cache'd ROR-API affiliation lookups, CSV out with added
``ror_id``/``ror_name`` columns, output named ``<stem>_with_ror.csv``).
Its per-row semantics, kept:

- F1 ``replace_encodings`` cleaning on ``Cluster`` and
  ``Vorkommende Namen`` (norminstitute_ror_to_csv.py:77-81),
- try the ``Cluster`` name first, then each ``##``-separated
  alternative from ``Vorkommende Namen`` in order until one resolves
  (norminstitute_ror_to_csv.py:83-104),
- ``Land`` capitalized Python-style in the output (str.capitalize:
  first char upper, rest lower; norminstitute_ro_to_csv.py:108).

What changes offline/distributed: the live ROR "affiliation" API (an
external network service — the same class as the Annif stand-in,
COVERAGE.md J8) becomes the engine's containment affiliation matcher
(operators/linking.link_affiliation: contiguous-phrase-first token
containment against a broadcast authority table, in-country preference
standing in for the API query string's country suffix), and every
candidate name across the whole file is scored in one job instead of
one HTTP call per name. Run on the reference's ACTUAL input with the
canonical orgs its API chose, the job reproduces the checked-in
Luxembourg_institute_cluster_with_ror.csv row-for-row — all 39
resolutions and all 12 non-resolutions
(tests/test_skew_and_job.py test_ror_enrich_reference_artifact).
Surrounding double quotes on the ``##`` alternatives
(an artifact of the source CSV's nested quoting, which the reference
ships verbatim into the API query string) are stripped before matching.

Usage:
    python -m psyndex2linkeddata_spark.jobs.ror_enrich \
        --in clusters.csv --authority ror.parquet [--out out.csv] \
        [--threshold 0.5] [--master local[8]]

``--authority`` is parquet or CSV with columns (name, ror_id, ror_name
[, country]). Output defaults to ``<input-stem>_with_ror.csv`` next to
the input — one plain CSV file, like the script it replaces (the
cluster list is a dimension table; the compute, not the sink, is the
distributed part).
"""

from __future__ import annotations

import argparse
import os
import tempfile

from pyspark.sql import functions as F


def enrich_clusters(clusters, authority, threshold: float = 0.5):  # noqa: ARG001 — kept for CLI compat; containment matching has no threshold
    """clusters(UUID, Cluster, 'Vorkommende Namen', Land) + authority
    (name, ror_id, ror_name[, country]) → clusters + (ror_id, ror_name),
    first-resolving candidate name wins (Cluster before alternatives)."""
    from psyndex2linkeddata_spark.functions.cleaning import replace_encodings
    from psyndex2linkeddata_spark.operators.linking import link_affiliation

    cleaned = clusters.withColumn(
        "Cluster", replace_encodings(F.col("Cluster"))
    ).withColumn("Vorkommende Namen", replace_encodings(F.col("Vorkommende Namen")))

    alt = F.transform(
        F.split(F.coalesce(F.col("Vorkommende Namen"), F.lit("")), "##"),
        lambda s: F.regexp_replace(F.trim(s), r'^"|"$', ""),
    )
    cands = (
        cleaned.select(
            "UUID",
            "Land",
            F.posexplode(
                F.filter(
                    F.concat(F.array(F.col("Cluster")), alt),
                    lambda s: s.isNotNull() & (F.trim(s) != ""),
                )
            ).alias("pos", "cand"),
        )
        # one score per distinct (row, name); duplicates among the
        # alternatives keep only their first position
        .groupBy("UUID", "Land", "cand")
        .agg(F.min("pos").alias("pos"))
    )

    # the API stand-in: the containment affiliation matcher
    # (operators/linking.link_affiliation — reproduces the reference's
    # checked-in API run 51/51, see test_ror_enrich_reference_artifact);
    # the API query string's country suffix becomes the matcher's
    # in-country preference when the authority carries a country column
    country_kw = (
        dict(mention_country_col="Land", auth_country_col="country")
        if "country" in authority.columns
        else {}
    )
    linked = link_affiliation(
        cands, authority, mention_key="cand", auth_key="name",
        auth_cols=["ror_id", "ror_name"], **country_kw,
    )
    # first candidate name that resolved wins (Cluster before the
    # ##-alternatives, like the reference's loop)
    best = (
        linked.where(F.col("ror_id").isNotNull())
        .groupBy("UUID")
        .agg(
            F.min_by(
                F.struct("ror_id", "ror_name"), F.struct("pos", "cand")
            ).alias("_hit")
        )
        .select("UUID", F.col("_hit.ror_id"), F.col("_hit.ror_name"))
    )
    land_cap = F.concat(
        F.upper(F.substring(F.col("Land"), 1, 1)),
        F.lower(F.substring(F.col("Land"), 2, 2_000_000)),
    )
    # all input columns survive (the script this replaces copies the row
    # and appends two columns); Cluster / Vorkommende Namen are the
    # cleaned versions, Land is capitalized, ror_id/ror_name appended
    passthrough = [
        land_cap.alias("Land") if c == "Land" else F.col(c)
        for c in clusters.columns
    ]
    return cleaned.join(best, "UUID", "left").select(
        *passthrough, "ror_id", "ror_name"
    )


def main(argv=None) -> None:
    from psyndex2linkeddata_spark.session import get_spark
    from psyndex2linkeddata_spark.sources.export import (
        move_single_part,
        read_table_auto,
    )

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--in", dest="inp", required=True, help="cluster CSV")
    ap.add_argument("--authority", required=True,
                    help="parquet or CSV with (name, ror_id, ror_name[, country])")
    ap.add_argument("--out", default=None,
                    help="output CSV path (default <input-stem>_with_ror.csv)")
    ap.add_argument("--threshold", type=float, default=0.5,
                    help="(retained for CLI compat; the containment "
                         "matcher is threshold-free)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    spark = get_spark(app_name="ror_enrich", master=args.master)
    clusters = spark.read.csv(args.inp, header=True, quote='"', escape='"')
    authority = read_table_auto(spark, args.authority)

    out = args.out or (args.inp.rsplit(".", 1)[0] + "_with_ror.csv")
    result = enrich_clusters(clusters, authority, threshold=args.threshold)
    # single plain CSV file, like the tool this replaces (dimension-table
    # sized); the Spark csv sink writes a directory, so stage + move
    tmp = tempfile.mkdtemp(prefix="ror_enrich_")
    staged = os.path.join(tmp, "out")
    result.coalesce(1).write.csv(
        staged, header=True, quote='"', escape='"', mode="overwrite"
    )
    move_single_part(tmp, out, pattern=os.path.join("out", "part-*.csv"))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

"""The query job: run a (restricted) SPARQL SELECT against a
materialized triples table and write the solution set.

Usage (local test):
    python -m psyndex2linkeddata_spark.jobs.query \
        --triples /path/triples.parquet \
        --query 'SELECT ?s ?o WHERE { ?s <http://p> ?o }' \
        [--query-file q.rq] [--out /path/solutions.parquet] [--show 20]

`--triples` accepts a parquet path or (with --table) a catalog table
name — the conversion job's `--out` or `--table` output respectively.
Without `--out` the solution set is printed (first --show rows).

On a cluster, the same file goes through spark-submit with the package
zip on --py-files; the session master/conf come from spark-submit, and
the query runs as ordinary Catalyst-planned self-joins over the
partitioned triple table (constant-pred patterns prune to their
partitions)."""

from __future__ import annotations

import argparse

from psyndex2linkeddata_spark.plans.query import sparql_select


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--triples", required=True,
                    help="parquet path (or table name with --table)")
    ap.add_argument("--table", action="store_true",
                    help="read --triples as a catalog table name")
    q = ap.add_mutually_exclusive_group(required=True)
    q.add_argument("--query", help="SPARQL SELECT text")
    q.add_argument("--query-file", help="file containing the query")
    ap.add_argument("--out", help="write solutions as parquet here")
    ap.add_argument("--show", type=int, default=20)
    ap.add_argument("--master", default=None,
                    help="override master for local runs (spark-submit "
                         "sets this on a cluster)")
    args = ap.parse_args(argv)

    from psyndex2linkeddata_spark.session import get_spark

    spark = get_spark(app_name="kg-query", master=args.master)
    triples = (
        spark.read.table(args.triples) if args.table
        else spark.read.parquet(args.triples)
    )
    query = args.query or open(args.query_file).read()
    solutions = sparql_select(triples, query)
    if args.out:
        solutions.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
    else:
        solutions.show(args.show, truncate=False)


if __name__ == "__main__":
    main()

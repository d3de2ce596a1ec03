"""Time each emitter's explode separately over the same normalized input.

Usage: PYTHONPATH=/root/repo python tools/profile_emitters.py [n_pages] [cpus]
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    from pyspark.sql import functions as F

    from psyndex2linkeddata_spark.datagen.pages import write_pages_parquet
    from psyndex2linkeddata_spark.emit import contributions as c_emit, core
    from psyndex2linkeddata_spark.emit import (
        abstracts,
        funding,
        genres,
        relations,
        terms,
        thesis,
    )
    from psyndex2linkeddata_spark.emit.base import explode_triples
    from psyndex2linkeddata_spark.emit.normalize import normalize
    from psyndex2linkeddata_spark.extract.parser import extract_records
    from psyndex2linkeddata_spark.session import get_spark

    spark = get_spark(
        app_name="profile_emitters",
        master=f"local[{CPUS}]",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(512 * 1024),
            "spark.sql.files.openCostInBytes": str(64 * 1024),
        },
    )
    d = tempfile.mkdtemp(prefix="prof_pages_")
    path = os.path.join(d, "pages.parquet")
    write_pages_parquet(path, N)
    pages = spark.read.parquet(path).repartition(CPUS * 3)
    norm = normalize(extract_records(pages)).persist()
    norm.count()

    emitters = [
        ("work_core", core.work_core),
        ("titles", core.titles),
        ("instances", core.instances),
        ("identifiers", core.identifiers),
        ("publication", core.publication),
        ("contributions", c_emit.contributions),
        ("abstracts", abstracts.abstracts),
        ("topics", terms.topics),
        ("subject_headings", terms.subject_headings),
        ("age_groups", terms.age_groups),
        ("issuance_and_genres", genres.issuance_and_genres),
        ("license_node", genres.license_node),
        ("funding", funding.funding),
        ("conferences", funding.conferences),
        ("research_data", relations.research_data),
        ("preregistrations", relations.preregistrations),
        ("replications", relations.replications),
        ("related_works", relations.related_works),
        ("tests_measures", relations.tests_measures),
        ("journal_relation", relations.journal_relation),
        ("book_relation", relations.book_relation),
        ("thesis", thesis.thesis),
    ]
    total = 0.0
    for name, build in emitters:
        t0 = time.time()
        df = explode_triples(norm, build())
        noop(df)
        dt = time.time() - t0
        total += dt
        print(f"{name:22s} {dt:7.2f}s", flush=True)
    print(f"{'SUM':22s} {total:7.2f}s", flush=True)


if __name__ == "__main__":
    main()

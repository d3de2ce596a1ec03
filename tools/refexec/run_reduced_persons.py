"""Execute the reference's reduced-persons converter
(/root/reference/other_conversions/persons/other_persons/
convert_reduced_persons.py) offline over a synthetic personen_uuid.csv
and dump its triple set.

Same technique as the other runners (run_reference.py / run_journals.py /
run_psychauthors.py): the reference's OWN code runs UNMODIFIED with its
library dependencies stubbed (tools/refexec/shims — rdflib/tqdm/
requests_cache/dateparser standing shims plus base58, an independent
implementation of the public encoding pinned to published test vectors).

HASH-SEED PINNING: the converter's name-variant ordering is genuinely
nondeterministic — it renumbers ``#varname_{i+1}`` nodes from
``list(set(...))`` (convert_reduced_persons.py:404), whose iteration
order depends on PYTHONHASHSEED. PySpark launches Python workers with
the driver's PYTHONHASHSEED (default "0", pyspark/core/context.py:298),
and the engine replays the same ``list(set(...))`` in an Arrow-batched
UDF, so this runner re-executes itself with the matching seed to make
the reference's own output reproducible run-to-run and across engines.

Usage:
    python tools/refexec/run_reduced_persons.py OUT.tsv PERSONEN.csv

Output TSV columns: subj, pred, obj, kind(iri|lit|bnode), lang, dtype.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

REFERENCE = os.environ.get("SPARK_GRAFT_REFERENCE", "/root/reference")
CONVERTER_DIR = os.path.join(
    REFERENCE, "other_conversions", "persons", "other_persons"
)
SHIMS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "shims")

# the seed PySpark gives its workers when the driver has none set
HASHSEED = os.environ.get("PYTHONHASHSEED", "0")


def run(personen_csv: str):
    """Import-execute convert_reduced_persons.py in an isolated workdir;
    return its authority_persons graph."""
    workdir = tempfile.mkdtemp(prefix="refexec_reduced_persons_")
    shutil.copy(
        os.path.join(CONVERTER_DIR, "convert_reduced_persons.py"),
        os.path.join(workdir, "convert_reduced_persons.py"),
    )
    # the converter reads ./personen_uuid.csv and writes ./persons_new.ttl
    shutil.copy(personen_csv, os.path.join(workdir, "personen_uuid.csv"))

    sys.path.insert(0, SHIMS)
    sys.path.insert(0, workdir)
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        import convert_reduced_persons  # noqa: F401 — module-level run

        return convert_reduced_persons.authority_persons
    finally:
        os.chdir(cwd)
        for p in (workdir, SHIMS):
            if p in sys.path:
                sys.path.remove(p)


def main():
    if os.environ.get("PYTHONHASHSEED") != HASHSEED:
        env = dict(os.environ, PYTHONHASHSEED=HASHSEED)
        os.execve(sys.executable, [sys.executable] + sys.argv, env)
    out, personen_csv = sys.argv[1], os.path.abspath(sys.argv[2])
    graph = run(personen_csv)
    with open(out, "w", encoding="utf-8") as f:
        f.write(graph.serialize(None))
    print(f"{len(graph)} triples -> {out}", file=sys.stderr)


if __name__ == "__main__":
    main()

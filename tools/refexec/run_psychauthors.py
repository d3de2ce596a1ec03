"""Execute the reference's psychauthors person-authority converter
(/root/reference/other_conversions/psychauthors/convert_psychauthors_rdf.py)
offline over a synthetic kerndaten CSV and dump its triple set.

Same technique as run_reference.py / run_journals.py: the reference's
OWN code runs with its network/library dependencies stubbed
(tools/refexec/shims — requests_cache returns 503 so the ROR affiliation
API degrades to the no-match path; dateparser.search is the declared
first-year extractor both engines share; rdflib/tqdm are the standing
shims), importing the reference's real modules/dicts.py lookup tables.

The converter hardcodes its input CSV as an absolute path on the
original author's machine (convert_psychauthors_rdf.py:94). The code
runs UNMODIFIED; the runner redirects exactly that path to the caller's
CSV via a builtins.open wrapper installed for the import (an environment
fix, not a semantic change — equivalent to placing the dump at the
expected location).

Usage:
    python tools/refexec/run_psychauthors.py OUT.tsv KERNDATEN.csv

Output TSV columns: subj, pred, obj, kind(iri|lit|bnode), lang, dtype.
"""

from __future__ import annotations

import builtins
import os
import shutil
import sys
import tempfile

REFERENCE = os.environ.get("SPARK_GRAFT_REFERENCE", "/root/reference")
PSYCHAUTHORS_DIR = os.path.join(REFERENCE, "other_conversions", "psychauthors")
SHIMS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "shims")

HARDCODED_CSV = (
    "/home/tina/Developement/py-star2bf/other_conversions/psychauthors/"
    "source_tables/psychauthors-dump-2022-02/psychauthors.kerndaten.csv"
)


def run(kerndaten_csv: str):
    """Import-execute convert_psychauthors_rdf.py in an isolated workdir;
    return its psychauthors graph."""
    workdir = tempfile.mkdtemp(prefix="refexec_psychauthors_")
    shutil.copy(
        os.path.join(PSYCHAUTHORS_DIR, "convert_psychauthors_rdf.py"),
        os.path.join(workdir, "convert_psychauthors_rdf.py"),
    )
    # the converter's own lookup tables (modules.dicts)
    shutil.copytree(
        os.path.join(PSYCHAUTHORS_DIR, "modules"),
        os.path.join(workdir, "modules"),
        dirs_exist_ok=True,
    )
    os.makedirs(os.path.join(workdir, ".cache"), exist_ok=True)

    kerndaten_csv = os.path.abspath(kerndaten_csv)
    real_open = builtins.open

    def redirecting_open(file, *args, **kwargs):
        if file == HARDCODED_CSV:
            file = kerndaten_csv
        return real_open(file, *args, **kwargs)

    sys.path.insert(0, SHIMS)
    sys.path.insert(0, workdir)
    cwd = os.getcwd()
    os.chdir(workdir)
    builtins.open = redirecting_open
    try:
        import convert_psychauthors_rdf  # noqa: F401 — module-level run

        return convert_psychauthors_rdf.psychauthors
    finally:
        builtins.open = real_open
        os.chdir(cwd)
        for p in (workdir, SHIMS):
            if p in sys.path:
                sys.path.remove(p)


def main():
    out, kerndaten_csv = sys.argv[1], sys.argv[2]
    graph = run(kerndaten_csv)
    with open(out, "w", encoding="utf-8") as f:
        f.write(graph.serialize(None))
    print(f"{len(graph)} triples -> {out}", file=sys.stderr)


if __name__ == "__main__":
    main()

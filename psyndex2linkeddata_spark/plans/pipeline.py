"""The KG-construction pipeline: pages → records → triples.

Stage model (SURVEY §7): extract (pages→records, stage 1), normalize
(records→mentions, stage 2), emit (mentions→triples, stage 5), finalize
(set-semantics dedup, stage 6). Entity linking (stage 3) and URI
canonicalization (stage 4) are composable add-ons from operators/.

Scale notes:
- extract+normalize+emit is ONE narrow projection — no shuffle until the
  final dropDuplicates. At 10^12 pages the only shuffle in the core path
  is the dedup exchange, partitioned by all triple columns; AQE coalesces.
- every emitter is a pure column expression → whole-stage codegen end to
  end; Python appears nowhere in the per-row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from psyndex2linkeddata_spark.emit import contributions as c_emit, core
from psyndex2linkeddata_spark.emit.base import explode_triples
from psyndex2linkeddata_spark.emit.normalize import normalize
from psyndex2linkeddata_spark.extract.parser import extract_records


def emitter_columns() -> list[Column]:
    """All registered emitters (grows as SURVEY §2.6 coverage widens)."""
    from psyndex2linkeddata_spark.emit import (  # late import: module registry
        abstracts,
        funding,
        genres,
        relations,
        terms,
        thesis,
    )

    return [
        core.work_core(),
        core.titles(),
        core.instances(),
        core.identifiers(),
        core.publication(),
        c_emit.contributions(),
        abstracts.abstracts(),
        terms.topics(),
        terms.subject_headings(),
        terms.age_groups(),
        genres.issuance_and_genres(),
        genres.license_node(),
        funding.funding(),
        funding.conferences(),
        relations.research_data(),
        relations.preregistrations(),
        relations.replications(),
        relations.related_works(),
        relations.tests_measures(),
        relations.journal_relation(),
        relations.book_relation(),
        thesis.thesis(),
    ]


def emit_triples(norm_records: DataFrame) -> DataFrame:
    """normalized records → raw triples (single scan, single explode)."""
    return explode_triples(norm_records, F.concat(*emitter_columns()))


def finalize(triples: DataFrame) -> DataFrame:
    """A10 (rdflib.Graph set semantics — implicit in every graph.add):
    exact-duplicate triples collapse. The one global shuffle of the
    pipeline; AQE-coalesced."""
    return triples.dropDuplicates(
        ["subj", "pred", "obj", "obj_is_iri", "lang", "dtype"]
    )


def build_triples(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → deduplicated triples DF."""
    return finalize(emit_triples(normalize(extract_records(pages))))

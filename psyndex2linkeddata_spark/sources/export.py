"""S7/S8 — text serialization sinks.

The reference serializes one rdflib Graph to Turtle + JSON-LD
(/root/reference/convert_starxml_to_bf.py:1555-1562). Distributed
equivalent: N-Triples lines built with pure column expressions
(`concat_ws`) written as text — NT is line-oriented, so any partitioning
is valid; a JSON-LD-ish grouped export aggregates per subject.

Escaping follows the N-Triples grammar for the characters our corpus can
produce (backslash, quote, newline, tab, CR)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _escape(col: Column) -> Column:
    out = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    out = F.replace(out, F.lit('"'), F.lit('\\"'))
    out = F.replace(out, F.lit("\n"), F.lit("\\n"))
    out = F.replace(out, F.lit("\r"), F.lit("\\r"))
    return F.replace(out, F.lit("\t"), F.lit("\\t"))


def nt_lines(triples: DataFrame) -> DataFrame:
    """(subj,pred,obj,obj_is_iri,lang,dtype) → one `value` column of
    N-Triples lines."""
    obj = (
        F.when(F.col("obj_is_iri"), F.concat(F.lit("<"), F.col("obj"), F.lit(">")))
        .when(
            F.col("lang").isNotNull(),
            F.concat(F.lit('"'), _escape(F.col("obj")), F.lit('"@'), F.col("lang")),
        )
        .when(
            F.col("dtype").isNotNull(),
            F.concat(
                F.lit('"'), _escape(F.col("obj")), F.lit('"^^<'), F.col("dtype"), F.lit(">")
            ),
        )
        .otherwise(F.concat(F.lit('"'), _escape(F.col("obj")), F.lit('"')))
    )
    return triples.select(
        F.concat_ws(
            " ",
            F.concat(F.lit("<"), F.col("subj"), F.lit(">")),
            F.concat(F.lit("<"), F.col("pred"), F.lit(">")),
            obj,
            F.lit("."),
        ).alias("value")
    )


def write_nt(triples: DataFrame, path: str, single_file: bool = False) -> None:
    lines = nt_lines(triples)
    if single_file:
        lines = lines.coalesce(1)
    lines.write.mode("overwrite").text(path)


def jsonld_ish(triples: DataFrame) -> DataFrame:
    """S8: per-subject JSON objects (sorted keys like the reference's
    sort_keys=True export): (subj, json string)."""
    po = triples.groupBy("subj", "pred").agg(
        F.sort_array(F.collect_list("obj")).alias("objs")
    )
    grouped = po.groupBy("subj").agg(
        F.map_from_entries(
            F.sort_array(
                F.collect_list(F.struct(F.col("pred"), F.col("objs")))
            )
        ).alias("props")
    )
    return grouped.select(
        "subj", F.to_json(F.struct(F.col("subj").alias("@id"), F.col("props"))).alias("json")
    )

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


# S7: prefix table for Turtle compression (the reference's graph.bind
# set, convert_starxml_to_bf.py:1437-1460 / testing harnesses)
TURTLE_PREFIXES: dict[str, str] = {
    "bf": "http://id.loc.gov/ontologies/bibframe/",
    "bflc": "http://id.loc.gov/ontologies/bflc/",
    "mads": "http://www.loc.gov/mads/rdf/v1#",
    "schema": "https://schema.org/",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "skos": "http://www.w3.org/2004/02/skos/core#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "works": "https://w3id.org/zpid/resources/works/",
    "instances": "https://w3id.org/zpid/resources/instances/",
    "instancebundles": "https://w3id.org/zpid/resources/instancebundles/",
    "pxc": "https://w3id.org/zpid/ontology/classes/",
    "pxp": "https://w3id.org/zpid/ontology/properties/",
    "roles": "https://w3id.org/zpid/vocabs/roles/",
    "relations": "https://w3id.org/zpid/vocabs/relations/",
    "genres": "https://w3id.org/zpid/vocabs/genres/",
    "issuances": "https://w3id.org/zpid/vocabs/issuances/",
    "licenses": "https://w3id.org/zpid/vocabs/licenses/",
    "pmt": "https://w3id.org/zpid/vocabs/mediacarriers/",
    "lang": "http://id.loc.gov/vocabulary/iso639-2/",
    "locid": "http://id.loc.gov/vocabulary/identifiers/",
}

# conservative PN_LOCAL: no leading digit/dot, interior dots allowed,
# no trailing dot, nothing that needs %-escaping
_PN_LOCAL_RE = r"^[A-Za-z_][A-Za-z0-9_.\-]*[A-Za-z0-9_\-]$|^[A-Za-z_]$"


def _qname(col: Column) -> Column:
    """IRI → prefixed name when a prefix matches and the local part is
    Turtle-safe; else <IRI>. Longest prefix wins."""
    expr = None
    for pfx, ns in sorted(TURTLE_PREFIXES.items(), key=lambda kv: -len(kv[1])):
        local = F.substring(col, len(ns) + 1, 1 << 20)
        cond = col.startswith(ns) & local.rlike(_PN_LOCAL_RE)
        q = F.concat(F.lit(pfx + ":"), local)
        expr = F.when(cond, q) if expr is None else expr.when(cond, q)
    return expr.otherwise(F.concat(F.lit("<"), col, F.lit(">")))


def _turtle_object(obj, is_iri, lang, dtype) -> Column:
    return (
        F.when(is_iri, _qname(obj))
        .when(
            lang.isNotNull(),
            F.concat(F.lit('"'), _escape(obj), F.lit('"@'), lang),
        )
        .when(
            dtype.isNotNull(),
            F.concat(F.lit('"'), _escape(obj), F.lit('"^^'), _qname(dtype)),
        )
        .otherwise(F.concat(F.lit('"'), _escape(obj), F.lit('"')))
    )


_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def turtle_blocks(triples: DataFrame) -> DataFrame:
    """(triples) → one `value` row per subject: a prefix-compressed Turtle
    block ('subj\\n    pred o1, o2 ;\\n    pred2 o3 .'). All grouping and
    rendering is native (two groupBy shuffles on subj — uniform keys);
    objects and predicates are sorted for deterministic output."""
    t = triples.select(
        F.col("subj"),
        F.when(F.col("pred") == _RDF_TYPE, F.lit("a"))
        .otherwise(_qname(F.col("pred")))
        .alias("p"),
        _turtle_object(
            F.col("obj"), F.col("obj_is_iri"), F.col("lang"), F.col("dtype")
        ).alias("o"),
    )
    po = t.groupBy("subj", "p").agg(
        F.array_join(F.sort_array(F.collect_list("o")), ",\n        ").alias("objs")
    )
    blocks = po.groupBy("subj").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("p", "objs"))),
                lambda s: F.concat(F.lit("    "), s["p"], F.lit(" "), s["objs"]),
            ),
            " ;\n",
        ).alias("body")
    )
    return blocks.select(
        F.concat(_qname(F.col("subj")), F.lit("\n"), F.col("body"), F.lit(" .\n")).alias(
            "value"
        )
    )


def write_turtle(triples: DataFrame, path: str, single_file: bool = False) -> None:
    """S7: Turtle sink. Every part file is a self-contained Turtle
    document (the @prefix header is prepended once per partition via
    mapInPandas — the iterator IS one partition)."""
    import pandas as pd

    header = (
        "".join(
            f"@prefix {p}: <{ns}> .\n" for p, ns in sorted(TURTLE_PREFIXES.items())
        )
        + "\n"
    )
    blocks = turtle_blocks(triples)
    if single_file:
        blocks = blocks.coalesce(1)

    def add_header(batches):
        first = True
        for pdf in batches:
            if first and len(pdf):
                pdf = pdf.copy()
                pdf.iloc[0, 0] = header + pdf.iloc[0, 0]
                first = False
            yield pdf

    blocks.mapInPandas(add_header, "value string").write.mode("overwrite").text(path)


def jsonld_ish(triples: DataFrame) -> DataFrame:
    """S8 (legacy grouped-JSON shape kept for compatibility): per-subject
    JSON objects (sorted keys like the reference's sort_keys=True
    export): (subj, json string). The real JSON-LD sink is
    jsonld_nodes/write_jsonld below."""
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


# C0 controls without a short JSON escape (everything < 0x20 except the
# \n \r \t already handled by _escape) → \u00XX
_JSON_C0 = [c for c in range(0x20) if chr(c) not in "\n\r\t"]


def _jescape(col: Column) -> Column:
    """JSON string escaping: backslash, quote, \\n/\\r/\\t (shared with
    the NT serializer), plus every other C0 control as \\u00XX — this is
    a public sink callable on arbitrary triples, so a stray \\x0b in a
    literal must not produce an invalid JSON part file."""
    out = _escape(col)
    for c in _JSON_C0:
        out = F.replace(out, F.lit(chr(c)), F.lit("\\u%04x" % c))
    return out


def jsonld_nodes(triples: DataFrame) -> DataFrame:
    """S8: expanded-form JSON-LD node objects, one per subject
    (the reference serializes the graph to JSON-LD,
    convert_starxml_to_bf.py:1555-1562; distributed form = one node
    object per subject, deterministic sorted keys/values).

    Expanded form needs no @context: rdf:type → "@type": ["<iri>", …];
    IRI objects → {"@id": …}; literals → {"@value": …[, "@language" |
    "@type"]}. Two uniform-key groupBy shuffles, all native."""
    is_type = F.col("pred") == _RDF_TYPE
    obj_json = (
        F.when(is_type, F.concat(F.lit('"'), _jescape(F.col("obj")), F.lit('"')))
        .when(
            F.col("obj_is_iri"),
            F.concat(F.lit('{"@id":"'), _jescape(F.col("obj")), F.lit('"}')),
        )
        .when(
            F.col("lang").isNotNull(),
            F.concat(
                F.lit('{"@value":"'), _jescape(F.col("obj")),
                F.lit('","@language":"'), F.col("lang"), F.lit('"}'),
            ),
        )
        .when(
            F.col("dtype").isNotNull(),
            F.concat(
                F.lit('{"@value":"'), _jescape(F.col("obj")),
                F.lit('","@type":"'), _jescape(F.col("dtype")), F.lit('"}'),
            ),
        )
        .otherwise(
            F.concat(F.lit('{"@value":"'), _jescape(F.col("obj")), F.lit('"}'))
        )
    )
    key = F.when(is_type, F.lit("@type")).otherwise(F.col("pred"))
    po = triples.select(F.col("subj"), key.alias("k"), obj_json.alias("oj")).groupBy(
        "subj", "k"
    ).agg(F.array_join(F.sort_array(F.collect_list("oj")), ",").alias("objs"))
    nodes = po.groupBy("subj").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("k", "objs"))),
                lambda s: F.concat(
                    F.lit('"'), _jescape(s["k"]), F.lit('":['), s["objs"], F.lit("]")
                ),
            ),
            ",",
        ).alias("body")
    )
    return nodes.select(
        F.concat(
            F.lit('{"@id":"'), _jescape(F.col("subj")), F.lit('",'),
            F.col("body"), F.lit("}"),
        ).alias("value")
    )


def write_jsonld(triples: DataFrame, path: str, single_file: bool = False) -> None:
    """S8 sink: every part file is one self-contained JSON-LD document
    `{"@graph":[ node, node, … ]}` (header/footer + comma separators
    added per partition via mapInPandas, like the Turtle sink)."""
    nodes = jsonld_nodes(triples)
    if single_file:
        nodes = nodes.coalesce(1)

    import pandas as pd

    def wrap(batches):
        first = True
        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            for v in pdf["value"].tolist():
                out.append(('{"@graph":[' + v) if first else ("," + v))
                first = False
            yield pd.DataFrame({"value": out})
        yield pd.DataFrame({"value": ["]}" if not first else '{"@graph":[]}']})

    nodes.mapInPandas(wrap, "value string").write.mode("overwrite").text(path)


def parse_jsonld(text: str) -> list[tuple]:
    """Inverse of write_jsonld for one document (round-trip tests; the
    rdflib expanded-form parser would accept the same input, it just
    isn't installed in this sandbox): JSON-LD expanded `{"@graph": [...]}`
    → [(subj, pred, obj, obj_is_iri, lang, dtype), …]."""
    import json

    doc = json.loads(text)
    out = []
    for node in doc.get("@graph", []):
        subj = node["@id"]
        for k, vals in node.items():
            if k == "@id":
                continue
            if k == "@type":
                for v in vals:
                    out.append((subj, _RDF_TYPE, v, True, None, None))
                continue
            for v in vals:
                if "@id" in v:
                    out.append((subj, k, v["@id"], True, None, None))
                else:
                    out.append(
                        (
                            subj,
                            k,
                            v["@value"],
                            False,
                            v.get("@language"),
                            v.get("@type"),
                        )
                    )
    return out


def move_single_part(staged_dir: str, dest: str, pattern: str = "part-*") -> None:
    """Deliver a coalesce(1) Spark sink's single part file as the plain
    file `dest` — the CLI contract of the single-file tools the jobs
    replace (skosify, csv.DictWriter, g.serialize). Raises if the staged
    directory does not hold exactly one part file; the staging dir is
    removed afterwards."""
    import glob
    import os
    import shutil

    parts = glob.glob(os.path.join(staged_dir, pattern))
    if len(parts) != 1:
        raise RuntimeError(
            f"expected exactly one part file in {staged_dir}, found {len(parts)}"
        )
    shutil.move(parts[0], dest)
    shutil.rmtree(staged_dir, ignore_errors=True)


def read_table_auto(spark, path: str, **csv_opts) -> DataFrame:
    """Read a small dimension table: CSV (with header) when the path ends
    in .csv, parquet otherwise — the authority-input convention shared by
    the enrichment jobs."""
    if path.endswith(".csv"):
        return spark.read.csv(path, header=True, **csv_opts)
    return spark.read.parquet(path)

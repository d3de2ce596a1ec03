"""psyndex2linkeddata_spark — a from-scratch, PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of
leibniz-psychology/psyndex2linkeddata (reference snapshot 2025-07-04).

NOT a port: the reference is row-at-a-time Python over rdflib + live HTTP
lookups (see /root/reference/convert_starxml_to_bf.py). This engine expresses
the same record→RDF semantics as a staged, columnar Spark pipeline:

    pages (url, warc_ts, html, text, lang)         [Iceberg/parquet scan]
      → extract   : native split/explode/pivot → fixed record StructType
      → normalize : F1-F29 scalar functions as column expressions
      → link      : broadcast authority joins + MinHash-LSH fuzzy tiers
      → canonical : connected-components URI canonicalization
      → emit      : deterministic node URIs + BIBFRAME triples (N1-N20)
      → finalize  : last-wins (graph.set) upserts + set-dedup (A10)
      → sink      : partitioned (subj, pred, obj) triples table

Every stage is DataFrame/SQL; pandas/Arrow UDFs only where plain column
expressions genuinely cannot express the semantics (html.unescape,
dateparser-grade date fuzz, similarity scoring).
"""

__version__ = "0.1.0"

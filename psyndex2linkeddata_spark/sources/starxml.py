"""STAR XML source: the reference's native input format.

The reference parses one XML tree per export file and walks `<Record>`
elements (convert_starxml_to_bf.py:101 `ET.parse`, :1506 loop; sample at
xml-data/records-440.xml). Each record is FLAT: uppercase field tags with
text values, `|x` subfields inside the text, no nested elements and no
newlines in values — verified against the full 342-record corpus.

Spark mapping (scale design):
- one input row per FILE via spark.read.text(wholetext=True) — a STAR
  export is many small-ish XML files, so files are the parallel unit;
  record splitting and per-record parsing are then narrow row-local ops.
- record blocks split natively (split + explode on the `<Record` lookahead),
  per-record field parsing via an Arrow-batched pandas UDF (ElementTree —
  entity decoding and tag walking; the one place Python is appropriate:
  ingestion runs once, the hot emit path stays native).
- output is the engine's canonical `pages` shape (schema.pages_schema):
  url = "starxml://<DFK>", html = the raw record-XML bytes, text = the
  record in `TAG value` line form (the extraction stage's native format —
  extract/parser.py consumes it with pure column expressions). The text
  is re-derivable from html byte-identically (text_from_record_xml), the
  BASELINE per-row invariant.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from psyndex2linkeddata_spark.schema import pages_schema

_LANG_MAP = {"English": "en", "German": "de"}


def record_xml_to_lines(rec_xml: str) -> tuple[str | None, str, str | None]:
    """One `<Record>` XML fragment → (DFK, 'TAG value' lines, lang).

    Line format contract: values contain no newlines (true for STAR
    exports; enforced here by replacing any stray newline with a space so
    a malformed value cannot corrupt neighbouring fields)."""
    rec = ET.fromstring(rec_xml)
    dfk = None
    la = None
    lines = []
    for el in rec:
        v = el.text if el.text is not None else ""
        if "\n" in v:
            v = v.replace("\n", " ")
        lines.append(f"{el.tag} {v}")
        if el.tag == "DFK" and dfk is None:
            dfk = v.strip()
        if el.tag == "LA" and la is None:
            la = v.strip()
    rn = rec.get("RecordNumber")
    return dfk or rn, "\n".join(lines), _LANG_MAP.get(la)


def star_xml_pages(spark: SparkSession, path: str) -> DataFrame:
    """Read STAR XML export file(s) into the canonical pages table.

    `path` may be a file, directory, or glob — each file is one input row
    (wholetext), records split and parse row-locally after that."""
    raw = spark.read.text(path, wholetext=True)
    frags = (
        raw.select(F.explode(F.split("value", r"(?=<Record[ >])")).alias("frag"))
        .where(F.col("frag").startswith("<Record"))
        .select(F.regexp_extract("frag", r"(?s)^(.*</Record>)", 1).alias("rec_xml"))
        .where(F.length("rec_xml") > 0)
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, texts, langs, htmls = [], [], [], []
            for rec_xml in pdf["rec_xml"]:
                dfk, text, lang = record_xml_to_lines(rec_xml)
                urls.append(f"starxml://{dfk}")
                texts.append(text)
                langs.append(lang)
                htmls.append(rec_xml.encode("utf-8"))
            yield pd.DataFrame(
                {
                    "url": urls,
                    "warc_ts": pd.Series([pd.NaT] * len(urls), dtype="datetime64[us]"),
                    "html": htmls,
                    "text": texts,
                    "lang": langs,
                }
            )

    return frags.mapInPandas(parse, pages_schema())

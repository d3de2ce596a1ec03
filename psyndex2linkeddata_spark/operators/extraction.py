"""Web-page text extraction + URL canonicalization + snapshot dedup.

The engine's input table is Common-Crawl-shaped
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string).
Upstream of every KG / corpus-prep stage sits the fetch layer's job:
turn the raw capture into (canonical_url, text) with exactly one row per
page. Three operators cover it, all pure column expressions (JVM-side,
whole-stage-codegen, no Python in the path):

- ``html_to_text``: binary html → extracted text. Tag-strip semantics:
  drop <script>/<style>/<!--comment--> blocks (their CONTENT is not
  text), strip every remaining tag, unescape entities LAST (so literal
  ``&lt;b&gt;`` in text does not become a tag — same ordering rationale
  as the reference's helpers.py:35 unescape-after-split). With
  ``normalize_ws=False`` the mapping is byte-stable: for any html
  produced by wrapping text in markup that escapes it (datagen
  text_to_html), html_to_text(html) == text byte-for-byte — the
  "byte-identical extracted text per url" invariant
  (tests/test_operators.py gates it on the 300-page fixture).

- ``canonical_url``: the dedup key for captures of the same page.
  Scheme+host lowercased, default :80/:443 port dropped, fragment
  dropped, tracking params (utm_*, fbclid, gclid, msclkid, ref) removed
  (other params kept in original order — reordering would merge urls
  whose servers treat order as significant), empty ``?`` dropped, one
  trailing slash trimmed from a non-root path.

- ``latest_snapshot``: one row per canonical url — the newest capture
  by warc_ts (ties broken by raw url, descending, so re-runs are
  deterministic). max_by aggregation, NOT a row_number window: the
  groupBy gets a map-side partial (each scan task keeps one candidate
  row per key before the exchange), where a window would shuffle every
  capture of hot urls to one reducer — at 10^12 captures with
  crawl-frequency skew (popular pages recrawled daily) that partial
  aggregation is the difference between a bounded shuffle and a
  hot-partition straggler.

At 100 TB all three fuse into the initial scan stage: extraction and
canonicalization are narrow projections; the snapshot dedup is the one
(unavoidable) exchange, keyed on canonical_url whose cardinality is the
page count. Nothing here widens rows — the html column is dropped as
soon as text is extracted (column pruning keeps it out of every later
shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from psyndex2linkeddata_spark.functions.cleaning import unescape_basic

# Block elements whose closing tag implies a line break when
# normalize_ws=True (readability of the extracted text, not fidelity).
_BLOCK_CLOSERS = r"(?i)</(?:p|div|li|tr|h[1-6]|blockquote|section|article|table|ul|ol)>|<br\s*/?>"

# script/style/comment blocks: content is code, not text. (?is) = case
# insensitive + dotall; lazy body so adjacent blocks don't merge.
_DROP_BLOCKS = r"(?is)<script\b[^>]*>.*?</script>|<style\b[^>]*>.*?</style>|<!--.*?-->"

_TAG = r"(?s)<[^>]*>"

_TRACKING_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid|ref)="


def html_to_text(
    html: Column, *, binary: bool = True, normalize_ws: bool = False
) -> Column:
    """Extracted text of an html page as a column expression.

    binary=True decodes the column from UTF-8 first (the table stores
    html as binary). normalize_ws=False (default) is the byte-stable
    mode; True additionally maps block-closing tags to newlines and
    collapses runs of spaces/tabs per line + blank-line runs.
    """
    s = F.decode(html, "UTF-8") if binary else html
    s = F.regexp_replace(s, _DROP_BLOCKS, "")
    if normalize_ws:
        s = F.regexp_replace(s, _BLOCK_CLOSERS, "\n")
    s = F.regexp_replace(s, _TAG, "")
    s = unescape_basic(s)
    if normalize_ws:
        s = F.regexp_replace(s, r"[ \t]+", " ")
        s = F.regexp_replace(s, r" ?\n ?", "\n")
        s = F.regexp_replace(s, r"\n{2,}", "\n")
        # trim ALL whitespace (F.trim strips only spaces, not newlines)
        s = F.regexp_replace(s, r"^\s+|\s+$", "")
    return s


def canonical_url(url: Column) -> Column:
    """Canonical form of a capture url (the snapshot-dedup key)."""
    # scheme://host[:port] lowercased; default ports dropped. RE2-safe
    # regexes (no backrefs) so the same patterns run in the DuckDB oracle.
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))
    hostport = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.substring(hostport, F.lit(1), F.length(hostport) - 3),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.substring(hostport, F.lit(1), F.length(hostport) - 4),
    ).otherwise(hostport)
    tail = F.regexp_replace(rest, r"^[^/?#]*", "")
    # fragment off; path/query split at the first '?'.
    tail = F.regexp_replace(tail, r"#.*$", "")
    parts = F.split(tail, r"\?", 2)
    path = F.element_at(parts, 1)
    query = F.try_element_at(parts, F.lit(2))
    # tracking params out via an explicit split→filter→join (a regex
    # substitution can't handle adjacent tracking params: each match
    # consumes the separator the next one needs). Empty segments from
    # '&&' drop out in the same pass.
    kept = F.filter(
        F.split(F.coalesce(query, F.lit("")), "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
    )
    newq = F.array_join(kept, "&")
    # one trailing slash off a non-root path; empty path → '/'.
    path = F.regexp_replace(path, r"^(/.+)/$", "$1")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    tail = F.when(newq == "", path).otherwise(F.concat(path, F.lit("?"), newq))
    return F.concat(scheme, F.lit("://"), hostport, tail)


def latest_snapshot(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    canon_col: str = "canonical_url",
) -> DataFrame:
    """Newest capture per canonical url: one groupBy with max_by on
    (ts, url desc) — map-side partial keeps the shuffle at one candidate
    row per key per task (see module docstring for the skew argument).

    Output: canon_col + every input column of the winning row.
    """
    cols = df.columns
    d = df.withColumn(canon_col, canonical_url(F.col(url_col)))
    # deterministic tie-break without a second ordering column: pack the
    # ordering key as a struct (ts, url) — struct comparison is
    # lexicographic, and max over it is commutative+associative, so the
    # partial aggregation stays correct.
    ordkey = F.struct(F.col(ts_col).alias("_ts"), F.col(url_col).alias("_u"))
    row = F.struct(*[F.col(c) for c in cols])
    out = d.groupBy(canon_col).agg(F.max_by(row, ordkey).alias("_row"))
    return out.select(canon_col, *[F.col(f"_row.{c}").alias(c) for c in cols])

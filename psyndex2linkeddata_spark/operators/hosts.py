"""Web-corpus host operators: host extraction, suffix blocklist
filtering, per-host document capping.

A Common-Crawl-style corpus is dominated by a few giant hosts; standard
prep (CCNet, RefinedWeb §3.1, Gopher §A1.2) caps documents per domain
and drops blocklisted domains before any expensive stage. Everything
here is native column expressions + joins:

- `host_of` — lowercased authority from the url (scheme/userinfo/port
  stripped), one regexp, fuses into the scan projection.
- `filter_blocked_hosts` — suffix semantics ("example.org" blocks
  "a.b.example.org"): explode the host's dot-suffixes, broadcast
  left-anti against the blocklist. The suffix explode is bounded by
  label count (≤ ~6), not corpus size.
- `cap_per_host` — keep the k documents with the smallest md5(id) per
  host (deterministic, layout-independent). NOT a single window over
  host: a hot host would serialize through one partition. Two-phase
  salted top-k instead: phase 1 ranks within (host, salt) — bounded
  partitions even for a 10^9-doc host — and keeps ≤ k per salt; phase 2
  ranks the ≤ k·n_salts survivors per host exactly. Same result as the
  naive window (the order key is total), skew-safe plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"


def host_of(url: Column) -> Column:
    """Lowercased host of an absolute URL ('' when unparseable)."""
    return F.lower(F.regexp_extract(url, _HOST_RE, 1))


def host_suffixes(host: Column) -> Column:
    """All dot-suffixes of a host, longest first:
    'a.b.example.org' → ['a.b.example.org', 'b.example.org',
    'example.org', 'org']."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(parts, i, n), "."),
    )


def filter_blocked_hosts(
    df: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Drop rows whose url host equals a blocklisted host OR sits under
    one (suffix match). `blocklist` is a one-column (`host`) DataFrame,
    small by nature → broadcast; the anti-join runs on the exploded
    suffix set so no per-row blocklist scan is needed."""
    bl = F.broadcast(blocklist.select(F.lower(F.col("host")).alias("__bh")).distinct())
    with_host = df.withColumn("__host", host_of(F.col(url_col)))
    hit = (
        with_host.select("__host")
        .distinct()
        .select("__host", F.explode(host_suffixes(F.col("__host"))).alias("__bh"))
        .join(bl, "__bh", "left_semi")
        .select("__host")
        .distinct()
    )
    return (
        with_host.join(F.broadcast(hit), "__host", "left_anti").drop("__host")
    )


def cap_per_host(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    k: int = 100,
    n_salts: int = 16,
) -> DataFrame:
    """Keep at most `k` documents per host — the ones with the smallest
    md5(id) (a deterministic uniform order, so the cap is an unbiased
    sample and reproducible across layouts/engines).

    Plan: phase-1 window over (host, salt) with salt = md5-bits of the
    id — every partition group is ~1/n_salts of a host, so a pathological
    hot host never funnels through one task — keeps the k smallest per
    salt; phase-2 window over host ranks the ≤ k·n_salts survivors
    exactly. Output rows keep their columns plus `host`.
    """
    if k <= 0 or n_salts <= 0:
        raise ValueError("require k > 0 and n_salts > 0")
    okey = F.md5(F.col(id_col).cast("string"))
    salt = F.pmod(
        F.conv(F.substring(okey, 25, 8), 16, 10).cast("bigint"), F.lit(n_salts)
    )
    staged = df.withColumn("host", host_of(F.col(url_col))).withColumn(
        "__okey", okey
    )
    w1 = Window.partitionBy("host", salt).orderBy("__okey")
    phase1 = staged.withColumn("__rn", F.row_number().over(w1)).where(
        F.col("__rn") <= k
    )
    w2 = Window.partitionBy("host").orderBy("__okey")
    return (
        phase1.withColumn("__rn2", F.row_number().over(w2))
        .where(F.col("__rn2") <= k)
        .drop("__rn", "__rn2", "__okey")
    )

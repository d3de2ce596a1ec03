"""Text-analysis functions for training-data pipelines (documents table):
language-ID, quality scoring, token counting, document fingerprinting.

All native column expressions (codegen). Two language-ID tiers: `lang_id`
reuses the de/en stopword heuristic from functions/lang.py (the abstract-
langtag stand-in for the reference's langid wrapper, helpers.py:159-165);
`lang_id_ngram` is the full character-trigram profile classifier
(en/de/fr/es/it/nl) for corpus-scale language tagging.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from psyndex2linkeddata_spark.functions.lang import (
    _DE_STOPWORDS,
    _EN_STOPWORDS,
    _stopword_hits,
    guess_language,
)

lang_id = guess_language  # F5 surface for documents

# BPE-ish tokenization: words, numbers, or single punctuation marks —
# approximates a byte-pair tokenizer's pre-tokenization split.
BPE_SPLIT_RE = r"\p{L}+|\p{N}+|[^\p{L}\p{N}\s]"


def whitespace_token_count(col: Column) -> Column:
    return F.size(
        F.filter(F.split(F.trim(col), r"\s+"), lambda t: F.length(t) > 0)
    )


def bpe_token_count(col: Column) -> Column:
    """Count of BPE-style pre-tokens (letters runs, digit runs, punct)."""
    return F.size(
        F.regexp_extract_all(F.coalesce(col, F.lit("")), F.lit(BPE_SPLIT_RE), F.lit(0))
    )


def punct_ratio(col: Column) -> Column:
    n_punct = F.length(F.regexp_replace(col, r"[\p{L}\p{N}\s]", ""))
    return n_punct / F.greatest(F.length(col), F.lit(1))


def stopword_ratio(col: Column) -> Column:
    hits = _stopword_hits(col, _DE_STOPWORDS + _EN_STOPWORDS)
    return hits / F.greatest(whitespace_token_count(col), F.lit(1))


def mean_token_len(col: Column) -> Column:
    toks = F.filter(F.split(F.trim(col), r"\s+"), lambda t: F.length(t) > 0)
    return F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    ) / F.greatest(F.size(toks), F.lit(1))


def quality_score(col: Column) -> Column:
    """Heuristic document quality in [0,1]: rewards stopword density and
    sane token lengths, penalizes punctuation soup and very short docs.
    struct(n_chars, n_tokens, punct_ratio, stopword_ratio, mean_token_len,
    score)."""
    n_chars = F.length(col)
    n_tokens = whitespace_token_count(col)
    p = punct_ratio(col)
    s = stopword_ratio(col)
    m = mean_token_len(col)
    score = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.25
        + F.least(s * F.lit(2.0), F.lit(1.0)) * 0.35
        + F.when((m >= 3) & (m <= 10), F.lit(1.0)).otherwise(F.lit(0.3)) * 0.2
        + (F.lit(1.0) - F.least(p * F.lit(4.0), F.lit(1.0))) * 0.2
    )
    return F.struct(
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(p, 6).alias("punct_ratio"),
        F.round(s, 6).alias("stopword_ratio"),
        F.round(m, 6).alias("mean_token_len"),
        F.round(score, 6).alias("score"),
    )


# F5 full tier — character-trigram profile language ID. The reference wraps
# the `langid` package (helpers.py:159-165, guess_language); langid itself is
# a byte-n-gram naive-Bayes model, so the faithful *shape* of a from-scratch
# stand-in is an n-gram profile vote, not a stopword list. Each language gets
# a fixed set of distinctive lowercase trigrams (spaces carry word-boundary
# signal); score = count of non-overlapping profile-trigram hits in the
# lowercased text (one JVM-side regexp_count per language — all alternatives
# are length 3, so Java-regex and RE2 agree exactly on the hit count, which
# is what keeps the DuckDB oracle byte-identical). Winner = highest count,
# ties broken by _NGRAM_PROFILES order, zero evidence → 'und'.
_NGRAM_PROFILES: list[tuple[str, list[str]]] = [
    ("en", ["the", " th", "ing", " an", "ion", " of", "tio", "ent", " to", "was"]),
    ("de", ["der", "die", "und", "sch", "ich", "ein", "ung", "cht", " ge", "nde"]),
    ("fr", [" le", "les", "que", " qu", "ait", "eur", "une", " et", "ais", "ont"]),
    ("es", [" la", "que", "ión", "los", "ado", " co", "ien", "una", " es", "nte"]),
    ("it", [" di", "che", "ell", "zio", "gli", "lla", " pe", "ito", " il", "nti"]),
    ("nl", ["een", "het", "aar", "oor", "van", "ijk", "eer", " ze", "ijn", "aan"]),
]


def lang_ngram_counts(col: Column) -> dict[str, Column]:
    """Per-language non-overlapping profile-trigram hit counts."""
    s = F.lower(F.coalesce(col, F.lit("")))
    return {
        lang: F.regexp_count(s, F.lit("|".join(tris)))
        for lang, tris in _NGRAM_PROFILES
    }


def lang_ngram_counts_table(df, id_col: str = "doc_id", text_col: str = "text"):
    """(id, c_<lang>…) — the per-language non-overlapping profile-trigram
    hit counts as one mapInArrow kernel (r06 second Arrow wave),
    bit-equal to six JVM regexp_count columns (`lang_ngram_counts`, the
    cross-check — pinned by tests/test_arrow_kernel_parity).

    Exactness: the profile patterns are alternations of LITERAL 3-char
    strings (no metacharacters), and both Java's and Python's regex
    engines count non-overlapping matches with the same leftmost-
    position, first-alternative rule, advancing past each match — over
    the same bytes (lower() stays a JVM expression; the one non-ASCII
    literal, 'ión', is matched as its UTF-8 bytes, which cannot match
    mid-codepoint since its lead/continuation bytes never align with a
    different character's). Java's alternation scan was the cost: six
    interpreted regex passes per row (~70× slower than CPython's sre on
    these literal alternations, measured)."""
    import pyarrow as pa

    langs = [lang for lang, _ in _NGRAM_PROFILES]
    pats = {
        lang: "|".join(tris).encode() for lang, tris in _NGRAM_PROFILES
    }
    staged = df.select(
        F.col(id_col),
        F.lower(F.coalesce(F.col(text_col), F.lit(""))).alias("_low"),
    )
    id_t = staged.schema[id_col].dataType.simpleString()
    fields = ", ".join(
        [f"{id_col} {id_t}"] + [f"c_{lang} int" for lang in langs]
    )

    def kernel(batches):
        import re

        cpats = [(lang, re.compile(p)) for lang, p in pats.items()]
        for b in batches:
            ids = b.column(0)
            lows = b.column(1).cast(pa.binary()).to_pylist()
            if not lows:
                continue
            cols = {lang: [] for lang in langs}
            for nb in lows:
                for lang, p in cpats:
                    cols[lang].append(len(p.findall(nb)))
            yield pa.RecordBatch.from_arrays(
                [ids] + [pa.array(cols[lang], pa.int32()) for lang in langs],
                [id_col] + [f"c_{lang}" for lang in langs],
            )

    return staged.mapInArrow(kernel, fields)


def lang_id_ngram(col: Column) -> Column:
    """Trigram-profile language guess over `_NGRAM_PROFILES` (en, de, fr,
    es, it, nl) — argmax of profile hits, first-in-table wins ties, 'und'
    when no profile trigram occurs at all. Pure column expression."""
    counts = lang_ngram_counts(col)
    langs = [lang for lang, _ in _NGRAM_PROFILES]
    result = None
    for lang in langs:
        c = counts[lang]
        cond = c > 0
        for other in langs:
            if other != lang:
                cond = cond & (c >= counts[other])
        result = (
            F.when(cond, F.lit(lang))
            if result is None
            else result.when(cond, F.lit(lang))
        )
    return result.otherwise(F.lit("und"))


def fingerprint(col: Column) -> Column:
    """Order-sensitive content fingerprint: md5 over normalized
    (lowercased, whitespace-collapsed) text."""
    return F.md5(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "))


def bag_fingerprint(col: Column) -> Column:
    """Order-insensitive fingerprint: md5 over the sorted distinct token
    bag — robust to shuffled word order (near-dup canonicalization key)."""
    toks = F.array_sort(
        F.array_distinct(
            F.filter(F.split(F.lower(F.trim(col)), r"\s+"), lambda t: F.length(t) > 0)
        )
    )
    return F.md5(F.concat_ws(" ", toks))


def rolling_fingerprint_of(toks: Column, n: int = 5) -> Column:
    """Winnowing-style fingerprint over a PRE-STAGED token attribute:
    minimum md5 over word n-gram shingles (one representative hash per
    document; equal for docs sharing their minimal shingle — a blocking
    key). Stage the tokens first — see operators/dedup.shingles_of on
    why an inline token expression goes O(n²) interpreted."""
    from psyndex2linkeddata_spark.operators.dedup import shingles_of

    return F.array_min(F.transform(shingles_of(toks, n), F.md5))


def rolling_fingerprint(col: Column, n: int = 5) -> Column:
    """rolling_fingerprint_of over inline-tokenized text — convenience
    for short docs/tests; hot paths stage the token column."""
    from psyndex2linkeddata_spark.operators.dedup import tokens

    return rolling_fingerprint_of(tokens(col), n)


def with_rolling_fp(staged, norm_col: str, n: int = 5, out_col: str = "rolling_fp"):
    """staged (any columns + `norm_col` = norm_text output) → same rows
    with norm_col replaced by out_col = the rolling fingerprint
    min(md5(shingle)) as lowercase hex, computed in one mapInArrow
    kernel (r06 second Arrow wave) — byte-identical to
    array_min(transform(shingle_array(norm, n), md5)).

    Exactness: norm_text is single-space separated, so the kernel's
    `norm.split(b" ")` (empties dropped) is byte-for-byte the JVM's
    `\\S+` token run set and b" "-joined n-token windows are exactly the
    substrings shingle_array extracts; docs with < n tokens use the
    whole norm, as shingle_array's otherwise-branch does. md5 runs over
    the same UTF-8 bytes the JVM hashes; a MINIMUM is
    duplicate-insensitive so array_distinct is irrelevant; and min over
    the digests' hex strings == min over digest bytes (hex encodes
    bytes monotonically) == the JVM's UTF8String binary compare. The
    interpreted transform+array_min HOF and the multi-regex shingle
    construction both disappear. Pinned equal by
    tests/test_arrow_kernel_parity."""
    import pyarrow as pa

    other = [c for c in staged.columns if c != norm_col]
    fields = ", ".join(
        [f"{c} {staged.schema[c].dataType.simpleString()}" for c in other]
        + [f"{out_col} string"]
    )

    def kernel(batches):
        from hashlib import md5

        for b in batches:
            names = b.schema.names
            norms = b.column(names.index(norm_col)).cast(pa.binary()).to_pylist()
            if len(norms) == 0:
                continue
            mins = []
            for nb in norms:
                toks = [t for t in nb.split(b" ") if t]
                if len(toks) >= n:
                    best = None
                    for i in range(len(toks) - n + 1):
                        h = md5(b" ".join(toks[i : i + n])).hexdigest()
                        if best is None or h < best:
                            best = h
                else:
                    best = md5(nb).hexdigest()
                mins.append(best)
            cols = [b.column(names.index(c)) for c in other] + [
                pa.array(mins, pa.string())
            ]
            yield pa.RecordBatch.from_arrays(cols, other + [out_col])

    return staged.mapInArrow(kernel, fields)


def repetition_stats(
    df: "DataFrame",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "DataFrame":
    """Gopher-style repetition signals — dispatches to the Arrow kernel;
    the all-JVM form is kept as `repetition_stats_native` (cross-check,
    pinned bit-equal by tests/test_arrow_kernel_parity). The kernel
    consumes the JVM-staged case-preserving whitespace-collapsed text
    and emits the INTEGER stats only (token count, distinct-token count,
    mode bigram count, bigram count) — splitting its bytes on the space
    byte reproduces Spark's split(trim, '\\s+') including the
    leading/trailing empty-token and the gram_array leading-space
    duplication quirks (see operators/dedup._minhash_signatures_arrow);
    byte equality == the JVM's string equality, and a sorted array's
    longest equal run IS the multiset mode count. The divisions and
    round(…, 4) stay the identical JVM expressions."""
    return _repetition_stats_arrow(df, id_col, text_col)


def _repetition_stats_arrow(
    df: "DataFrame",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "DataFrame":
    import pyarrow as pa

    norm_case = F.regexp_replace(
        F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+", " "
    )
    staged = df.select(F.col(id_col), norm_case.alias("_nc"))
    id_t = staged.schema[id_col].dataType.simpleString()

    def kernel(batches):
        from collections import Counter

        for b in batches:
            ids = b.column(0)
            norms = b.column(1).cast(pa.binary()).to_pylist()
            if not norms:
                continue
            n_l, nd_l, mr_l, nb_l = [], [], [], []
            for nb in norms:
                raw = nb.split(b" ") if nb else []
                n_l.append(len(raw))
                nd_l.append(len(set(raw)))
                toks = [t for t in raw if t]
                if len(toks) >= 2:
                    if nb.startswith(b" "):
                        # gram_array's leading-space quirk: both offsets
                        # degenerate to offset 0 and CONCAT duplicates
                        # the stride-2 windows
                        wins = [
                            b" ".join(toks[i : i + 2])
                            for i in range(0, len(toks) - 1, 2)
                        ]
                        bigr = wins + wins
                    else:
                        bigr = [
                            b" ".join(toks[i : i + 2])
                            for i in range(len(toks) - 1)
                        ]
                    mr_l.append(max(Counter(bigr).values()))
                    nb_l.append(len(bigr))
                else:
                    mr_l.append(0)
                    nb_l.append(0)
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(n_l, pa.int32()),
                    pa.array(nd_l, pa.int32()),
                    pa.array(mr_l, pa.int32()),
                    pa.array(nb_l, pa.int32()),
                ],
                [id_col, "_n", "_nd", "_mr", "_nb"],
            )

    stats = staged.mapInArrow(
        kernel, f"{id_col} {id_t}, _n int, _nd int, _mr int, _nb int"
    )
    return stats.select(
        F.col(id_col),
        F.when(
            F.col("_n") > 0,
            F.round(
                (F.col("_n") - F.col("_nd")) / F.col("_n").cast("double"), 4
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_word_frac"),
        F.when(
            F.col("_nb") > 0,
            F.round(F.col("_mr") / F.col("_nb").cast("double"), 4),
        )
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
    )


def repetition_stats_native(
    df: "DataFrame",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "DataFrame":
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    §A1.1 repetition filters): (id, dup_word_frac, top_bigram_frac).

    - dup_word_frac: fraction of tokens that are repeats of an earlier
      token (1 - distinct/total) — computed per-row, no shuffle.
    - top_bigram_frac: fraction of all bigram occurrences taken by the
      single most frequent bigram — boilerplate/spam pages score high.
      Computed per-row as the longest equal run of the SORTED bigram
      array (mode count without a frequency map): staged attribute
      columns + one aggregate lambda — ZERO shuffles. Measured 10×
      faster (7s vs 72s on 100k × 600-token docs) than the obvious
      explode → groupBy(doc, bigram) → max/sum plan, which shuffles one
      row per distinct bigram occurrence; at corpus scale that shuffle
      is the entire cost of the operator.

    Fractions round to 4dp so the DuckDB oracle compares stably (the
    oracle keeps the frequency-map formulation — same values).
    """
    from psyndex2linkeddata_spark.operators.chunking import tokens
    from psyndex2linkeddata_spark.operators.selection import gram_array

    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # case-preserving single-space form of the token stream: gram_array
    # over it yields exactly the concat_ws bigrams of `tokens` (with
    # multiplicity), built by two codegen regex extractions instead of
    # an interpreted transform with two element_at calls per element
    # (r06; measured 3.1s → 2.2s for the sorted-bigram stage at 50k
    # docs). NOT norm_text — that lowercases, which would case-fold
    # distinct bigrams together and change the mode count.
    norm_case = F.regexp_replace(
        F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+", " "
    )
    base = df.select(
        F.col(id_col),
        norm_case.alias("_nc"),
        F.when(
            n > 0,
            F.round((n - F.size(F.array_distinct(toks))) / n.cast("double"), 4),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_word_frac"),
    )
    sorted_b = base.select(
        id_col,
        "dup_word_frac",
        F.array_sort(gram_array(F.col("_nc"), 2)).alias("_b"),
    )
    acc0 = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )
    max_run = F.aggregate(
        F.col("_b"),
        acc0,
        lambda a, x: F.struct(
            x.alias("prev"),
            F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                a["best"],
                F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda a: a["best"],
    )
    return sorted_b.select(
        id_col,
        "dup_word_frac",
        F.when(
            F.size(F.col("_b")) > 0,
            F.round(max_run / F.size(F.col("_b")).cast("double"), 4),
        )
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
    )


def with_top_bigram_frac(
    df: "DataFrame", text_col: str = "text", out_col: str = "top_bigram_frac"
) -> "DataFrame":
    """Append the per-row top-bigram fraction, preserving all other
    columns — dispatches to the Arrow kernel; the all-JVM sorted-run
    form is kept as `with_top_bigram_frac_native` (cross-check, pinned
    bit-equal by tests/test_arrow_kernel_parity). The kernel is the
    repetition_stats one minus the distinct-token stats: integer
    (mode-bigram, bigram) counts from the byte-split of the JVM-staged
    whitespace-collapsed text — HERE over the RAW token sequence with
    Spark's empty leading/trailing split tokens kept, exactly the
    concat_ws bigrams of chunking.tokens — with the division and
    round(…, 4) left as the identical JVM expressions. The pushdown
    hazard of the native form (see its tail comment) cannot occur: the
    kernel's outputs are real attributes behind an opaque Python node,
    which PushPredicateThroughNonJoin never substitutes into."""
    import pyarrow as pa

    keep = df.columns
    norm_case = F.regexp_replace(
        F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+", " "
    )
    staged = df.select("*", norm_case.alias("__tbf_nc"))
    fields = ", ".join(
        [f"{c} {df.schema[c].dataType.simpleString()}" for c in keep]
        + ["__tbf_mr int", "__tbf_nb int"]
    )

    def kernel(batches):
        from collections import Counter

        for b in batches:
            names = b.schema.names
            norms = (
                b.column(names.index("__tbf_nc")).cast(pa.binary()).to_pylist()
            )
            if not norms:
                continue
            mr_l, nb_l = [], []
            for nb in norms:
                raw = nb.split(b" ") if nb else []
                if len(raw) >= 2:
                    bigr = [
                        b" ".join(raw[i : i + 2]) for i in range(len(raw) - 1)
                    ]
                    mr_l.append(max(Counter(bigr).values()))
                    nb_l.append(len(bigr))
                else:
                    mr_l.append(0)
                    nb_l.append(0)
            cols = [b.column(names.index(c)) for c in keep] + [
                pa.array(mr_l, pa.int32()),
                pa.array(nb_l, pa.int32()),
            ]
            yield pa.RecordBatch.from_arrays(
                cols, keep + ["__tbf_mr", "__tbf_nb"]
            )

    stats = staged.mapInArrow(kernel, fields)
    frac = F.when(
        F.col("__tbf_nb") > 0,
        F.round(
            F.col("__tbf_mr") / F.col("__tbf_nb").cast("double"), 4
        ),
    ).otherwise(F.lit(0.0))
    return stats.select(*keep, frac.alias(out_col))


def with_top_bigram_frac_native(
    df: "DataFrame", text_col: str = "text", out_col: str = "top_bigram_frac"
) -> "DataFrame":
    """Append the per-row top-bigram fraction, preserving all other
    columns — the filter-friendly form of the repetition_stats signal
    (same staged sorted-run computation, zero shuffles)."""
    from psyndex2linkeddata_spark.operators.chunking import tokens

    keep = df.columns
    staged = df.select("*", tokens(F.col(text_col)).alias("__tbf_t"))
    bigrams = F.when(
        F.size(F.col("__tbf_t")) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(F.col("__tbf_t")) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("__tbf_t"), i + 1),
                F.element_at(F.col("__tbf_t"), i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    sb = staged.select("*", F.array_sort(bigrams).alias("__tbf_b"))
    acc0 = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )
    max_run = F.aggregate(
        F.col("__tbf_b"),
        acc0,
        lambda a, x: F.struct(
            x.alias("prev"),
            F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                a["best"],
                F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda a: a["best"],
    )
    frac = F.when(
        F.size(F.col("__tbf_b")) > 0,
        F.round(max_run / F.size(F.col("__tbf_b")).cast("double"), 4),
    ).otherwise(F.lit(0.0))
    # PUSHDOWN HAZARD (measured, sf0.1/local[32]): do NOT `.where` on
    # out_col over a live lineage. PushPredicateThroughNonJoin substitutes
    # the aliased expression into the predicate with no cheapness check,
    # so the interpreted aggregate plus the staged token/bigram arrays
    # (and any upstream scrub chain) re-inline per reference and the
    # element_at lambda re-evaluates the split per ELEMENT: 1.2s unfiltered
    # → 19s filtered bare → 152s filtered behind a regex scrub. Filter on
    # a materialized barrier instead (localCheckpoint / a written table),
    # where out_col is a stored attribute — plans/corpus.py does exactly
    # that. (A dummy non-deterministic projection column does NOT protect
    # this: fixed-point column pruning deletes it before pushdown runs.)
    return sb.select(*keep, frac.alias(out_col))

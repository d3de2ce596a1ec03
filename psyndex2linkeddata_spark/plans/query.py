"""SPARQL-style basic-graph-pattern matching over a triples DataFrame —
the query surface for the KG the pipeline materializes (reference
consumers query the emitted Turtle with SPARQL; here the same BGP shape
compiles to declarative self-joins Catalyst can optimize).

A pattern is a (s, p, o) tuple of terms; a term starting with ``?`` is a
variable, anything else is a constant matched verbatim against the
subj/pred/obj columns. Each pattern compiles to one filtered projection
of the triples table; shared variables between patterns become inner
equi-joins. Catalyst then does the real query planning: constant-pred
filters push into the scan, join order is cost-reordered, and small
filtered patterns broadcast under AQE — exactly the classic
"SPARQL-on-SQL" translation (cf. Spark SQL's own join reordering), with
no interpreter in the data path.

Scale: one self-join per additional pattern, each an equi-join on
variable columns. A pred-bound pattern over a pred-partitioned triple
table prunes to one partition; hub subjects (a work with thousands of
triples) are plain join skew, handled by AQE skew splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["bgp_match", "path_closure", "sparql_select"]

_POS = ("subj", "pred", "obj")


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


def path_closure(
    triples: DataFrame,
    pred: str,
    max_iter: int = 20,
) -> DataFrame:
    """Transitive closure of one predicate — the SPARQL ``pred+``
    property path — as (subj, obj) distinct pairs reachable in ≥ 1 hop.

    Semi-naive iteration: each round extends only the previous round's
    NEW pairs by one hop (a join against the base edge set) and
    anti-joins out pairs already known, so work per round is
    proportional to the frontier, not the closure. Rounds are
    O(diameter); lineage is truncated per round with lazy
    localCheckpoint exactly like operators/components.py. Hierarchies
    this is used for (genre broader-trees, org containment, geo
    containment) have single-digit depth.
    """
    e = (
        triples.where(F.col("pred") == F.lit(pred))
        .select("subj", "obj")
        .where(F.col("subj").isNotNull() & F.col("obj").isNotNull())
        .distinct()
        .localCheckpoint()
    )
    closure = e
    frontier = e
    for _ in range(max_iter):
        # explicit renames (not DataFrame aliases): lazy localCheckpoint
        # rewrites plan constraints, and self-join alias attributes can
        # fall out of the rewritten output (key-not-found in
        # rewriteStatsAndConstraints on Spark 4.1)
        ext = (
            frontier.select(F.col("subj").alias("_ps"), F.col("obj").alias("_pm"))
            .join(
                e.select(F.col("subj").alias("_pm"), F.col("obj").alias("_po")),
                "_pm",
            )
            .select(F.col("_ps").alias("subj"), F.col("_po").alias("obj"))
            .distinct()
        )
        new = ext.join(closure, ["subj", "obj"], "left_anti").localCheckpoint(
            eager=False
        )
        if new.limit(1).count() == 0:
            break
        closure = closure.union(new).localCheckpoint(eager=False)
        frontier = new
    return closure


def bgp_match(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    select: list[str] | None = None,
    distinct: bool = False,
    optional: list[list[tuple[str, str, str]]] | None = None,
    values: dict[str, list[str]] | None = None,
    filter: str | None = None,
) -> DataFrame:
    """Match a conjunction of triple patterns; returns one column per
    variable (name without the ``?``), optionally projected to `select`
    (order respected) and de-duplicated with `distinct`.

    `optional` is a list of pattern GROUPS, each matched like SPARQL
    OPTIONAL {...}: the group joins left-outer on the variables it
    shares with the required patterns, so non-matching solutions keep
    their bindings with the group's exclusive variables null. Each group
    must share at least one variable with the required part (an
    unanchored OPTIONAL is a cross product — rejected).

    `values` is SPARQL VALUES: {var: [allowed, ...]} restricts a bound
    variable to an explicit list — compiled to an `isin` filter (a
    broadcast-friendly literal predicate, never a join).

    `filter` is SPARQL FILTER as a Spark SQL boolean expression over
    the variable columns (e.g. ``"lang = 'de' or nc > 100"``), applied
    after the required patterns and VALUES, before OPTIONAL groups —
    matching SPARQL's group-level filter placement."""
    if not patterns:
        raise ValueError("empty basic graph pattern")

    result: DataFrame | None = None
    bound: list[str] = []  # vars bound so far, in first-appearance order
    for pi, pat in enumerate(patterns):
        if len(pat) != 3:
            raise ValueError(f"pattern must be (s, p, o): {pat!r}")
        s_term, p_term, o_term = pat
        if not _is_var(p_term) and p_term.endswith("+") and len(p_term) > 1:
            # property path pred+ : the pattern's relation is the
            # transitive closure of that predicate
            df = path_closure(triples, p_term[:-1])
            positions = [("subj", s_term), ("obj", o_term)]
        else:
            df = triples
            positions = list(zip(_POS, pat))
        seen: dict[str, str] = {}  # var -> first position column
        cols = []
        for pos, term in positions:
            if _is_var(term):
                name = term[1:]
                if not name:
                    raise ValueError(f"bare '?' in pattern {pat!r}")
                if name in seen:  # repeated var inside one pattern
                    df = df.where(F.col(pos) == F.col(seen[name]))
                else:
                    seen[name] = pos
                    cols.append(F.col(pos).alias(name))
            else:
                df = df.where(F.col(pos) == F.lit(term))
        # an all-constant pattern is an existence check: one marker row
        # if it matches, zero rows (annihilating the joins) otherwise
        df = df.select(*cols) if cols else df.select(F.lit(1).alias(f"_m{pi}")).limit(1)

        if result is None:
            result, bound = df, list(seen)
        else:
            on = [v for v in seen if v in bound]
            if on:
                result = result.join(df, on=on, how="inner")
            else:  # disconnected pattern group: cross product (rare, valid)
                result = result.crossJoin(df)
            bound += [v for v in seen if v not in bound]
    assert result is not None

    for var, allowed in (values or {}).items():
        if var not in bound:
            raise ValueError(f"VALUES variable not bound by the patterns: ?{var}")
        result = result.where(F.col(var).isin(list(allowed)))
    if filter is not None:
        result = result.where(F.expr(filter))

    for group in optional or []:
        odf = bgp_match(triples, group)
        on = [v for v in odf.columns if v in bound]
        if not on:
            raise ValueError(
                f"OPTIONAL group shares no variable with the required patterns: {group!r}"
            )
        result = result.join(odf, on=on, how="left")
        bound += [v for v in odf.columns if v not in bound]

    markers = [c for c in result.columns if c.startswith("_m")]
    if markers:
        result = result.drop(*markers)
    if select is not None:
        unknown = [v for v in select if v not in bound]
        if unknown:
            raise ValueError(f"unbound select variables: {unknown}")
        result = result.select(*select)
    return result.distinct() if distinct else result


# ---------------------------------------------------------------------------
# restricted SPARQL SELECT front-end
# ---------------------------------------------------------------------------

import re as _re

_TOKEN = _re.compile(
    r"""\s*(?:
        (?P<var>\?[A-Za-z_]\w*)
      | (?P<iri><[^<>\s]*>\+?)
      | (?P<lit>"(?:[^"\\]|\\.)*"\+?)
      | (?P<punct>[{}().])
      | (?P<word>[^\s{}().]+)
    )""",
    _re.X,
)


def _tokens(q: str) -> list[str]:
    out, i, q = [], 0, q.strip()
    while i < len(q):
        m = _TOKEN.match(q, i)
        if not m or m.end() == i:
            raise ValueError(f"SPARQL lex error at: {q[i:i+30]!r}")
        out.append(m.group().strip())
        i = m.end()
    return out


def _term(tok: str) -> str:
    """Token → bgp_match term: ?var stays; <iri> strips brackets;
    "lit" unquotes; bare words pass through. A trailing + (property
    path) survives the stripping."""
    plus = ""
    if tok.endswith("+") and not tok.startswith("?"):
        tok, plus = tok[:-1], "+"
    if tok.startswith("<") and tok.endswith(">"):
        return tok[1:-1] + plus
    if tok.startswith('"') and tok.endswith('"'):
        return (
            tok[1:-1]
            .replace('\\"', '"')
            .replace("\\\\", "\\")
            + plus
        )
    return tok + plus


def _parse_group(toks: list[str], i: int):
    """Parse a { ... } group body starting AFTER the opening brace.
    Returns (patterns, optionals, values, filters, next_index)."""
    pats, opts, vals, filts = [], [], {}, []
    while i < len(toks):
        t = toks[i]
        up = t.upper()
        if t == "}":
            return pats, opts, vals, filts, i + 1
        if up == "OPTIONAL":
            if toks[i + 1] != "{":
                raise ValueError("OPTIONAL must be followed by {")
            g_pats, g_opts, g_vals, g_filts, i = _parse_group(toks, i + 2)
            if g_opts or g_vals or g_filts:
                raise ValueError("nested OPTIONAL/VALUES/FILTER not supported")
            opts.append(g_pats)
            continue
        if up == "VALUES":
            var = toks[i + 1]
            if not var.startswith("?") or toks[i + 2] != "{":
                raise ValueError("VALUES syntax: VALUES ?var { term ... }")
            i += 3
            allowed = []
            while toks[i] != "}":
                allowed.append(_term(toks[i]))
                i += 1
            vals[var[1:]] = allowed
            i += 1
            continue
        if up == "FILTER":
            if toks[i + 1] != "(":
                raise ValueError("FILTER must be followed by (")
            depth, j, parts = 1, i + 2, []
            while depth:
                tok = toks[j]
                depth += tok == "(";  depth -= tok == ")"
                if depth:
                    parts.append(tok[1:] if tok.startswith("?") else tok)
                j += 1
            filts.append(" ".join(parts))
            i = j
            continue
        # a triple pattern: three terms, optional trailing dot
        s, p, o = toks[i : i + 3]
        pats.append((_term(s) if not s.startswith("?") else s,
                     _term(p) if not p.startswith("?") else p,
                     _term(o) if not o.startswith("?") else o))
        i += 3
        if i < len(toks) and toks[i] == ".":
            i += 1
    raise ValueError("unterminated group: missing }")


def sparql_select(triples: DataFrame, query: str) -> DataFrame:
    """Restricted SPARQL SELECT front-end over bgp_match:

        SELECT [DISTINCT] ?a ?b | *
        WHERE { tp . tp . OPTIONAL { tp } FILTER(?y >= 2021)
                VALUES ?l { "de" "en" } }

    Triple-pattern terms: ?var, <iri> (angle brackets stripped),
    "literal", bare word; a trailing + on a constant predicate is the
    transitive property path. FILTER bodies are Spark SQL over the
    variable columns (?var → column). Not supported (use bgp_match /
    DataFrame ops directly): UNION, GROUP BY, ORDER BY, subqueries,
    nested OPTIONAL."""
    toks = _tokens(query)
    if not toks or toks[0].upper() != "SELECT":
        raise ValueError("query must start with SELECT")
    i = 1
    distinct = i < len(toks) and toks[i].upper() == "DISTINCT"
    i += distinct
    sel: list[str] | None = []
    if toks[i] == "*":
        sel, i = None, i + 1
    else:
        while toks[i].startswith("?"):
            sel.append(toks[i][1:])
            i += 1
        if not sel:
            raise ValueError("SELECT needs variables or *")
    if toks[i].upper() != "WHERE" or toks[i + 1] != "{":
        raise ValueError("expected WHERE {")
    pats, opts, vals, filts, i = _parse_group(toks, i + 2)
    if i != len(toks):
        raise ValueError(f"trailing tokens after }}: {toks[i:]}")
    return bgp_match(
        triples,
        pats,
        select=sel,
        distinct=distinct,
        optional=opts or None,
        values=vals or None,
        filter=" and ".join(f"({f})" for f in filts) if filts else None,
    )

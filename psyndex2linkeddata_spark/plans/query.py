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

__all__ = ["bgp_match"]

_POS = ("subj", "pred", "obj")


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


def bgp_match(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]],
    select: list[str] | None = None,
    distinct: bool = False,
) -> DataFrame:
    """Match a conjunction of triple patterns; returns one column per
    variable (name without the ``?``), optionally projected to `select`
    (order respected) and de-duplicated with `distinct`."""
    if not patterns:
        raise ValueError("empty basic graph pattern")

    result: DataFrame | None = None
    bound: list[str] = []  # vars bound so far, in first-appearance order
    for pi, pat in enumerate(patterns):
        if len(pat) != 3:
            raise ValueError(f"pattern must be (s, p, o): {pat!r}")
        df = triples
        seen: dict[str, str] = {}  # var -> first position column
        cols = []
        for pos, term in zip(_POS, pat):
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

    markers = [c for c in result.columns if c.startswith("_m")]
    if markers:
        result = result.drop(*markers)
    if select is not None:
        unknown = [v for v in select if v not in bound]
        if unknown:
            raise ValueError(f"unbound select variables: {unknown}")
        result = result.select(*select)
    return result.distinct() if distinct else result

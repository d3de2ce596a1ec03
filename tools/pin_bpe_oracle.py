"""Recompute the pinned constants for the bpe_tokens driver oracle
(__spark_entry__.oracle_sql()['bpe_tokens']).

INDEPENDENT implementation: reads documents.parquet with duckdb and runs
a from-scratch naive BPE (full pair recount per merge round, sequential
merge replay for encoding) that shares no code with
psyndex2linkeddata_spark/operators/bpe.py. The printed SQL is what the
engine's q_bpe_tokens must reproduce at the same sf — a cross-check, not
a self-oracle.

Usage: python tools/pin_bpe_oracle.py [sf_dir]   (default sf0.01)
"""

from __future__ import annotations

import re
import sys
import zlib

N_MERGES = 200
MIN_PAIR_COUNT = 2
EOW = "</w>"


def toks(s: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


def train(counts: dict[str, int]) -> list[tuple[str, str]]:
    words = {w: (tuple(w) + (EOW,), c) for w, c in counts.items() if w}
    merges: list[tuple[str, str]] = []
    for _ in range(N_MERGES):
        pc: dict[tuple[str, str], int] = {}
        for syms, c in words.values():
            for p in zip(syms, syms[1:]):
                pc[p] = pc.get(p, 0) + c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pc[best] < MIN_PAIR_COUNT:
            break
        merges.append(best)
        a, b = best
        nw = {}
        for w, (syms, c) in words.items():
            ns: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            nw[w] = (tuple(ns), c)
        words = nw
    return merges


def encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    syms = list(word) + [EOW]
    for a, b in merges:
        ns: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                ns.append(a + b)
                i += 2
            else:
                ns.append(syms[i])
                i += 1
        syms = ns
    return syms


def main() -> None:
    import duckdb

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    rows = duckdb.connect().execute(
        f"select doc_id, text from read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()

    counts: dict[str, int] = {}
    for _, t in rows:
        for w in toks(t or ""):
            counts[w] = counts.get(w, 0) + 1
    merges = train(counts)

    cache: dict[str, list[str]] = {}
    n_docs = len(rows)
    total = 0
    crc_sum = 0
    for _, t in rows:
        stream: list[str] = []
        for w in toks(t or ""):
            if w not in cache:
                cache[w] = encode(w, merges)
            stream.extend(cache[w])
        total += len(stream)
        crc_sum += zlib.crc32(" ".join(stream).encode("utf-8"))

    print(
        "select cast(%d as bigint) as n_docs, cast(%d as bigint) as n_merges,\n"
        "       cast(%d as bigint) as total_bpe_tokens, cast(%d as bigint) as crc_sum"
        % (n_docs, len(merges), total, crc_sum)
    )


if __name__ == "__main__":
    main()

"""Deterministic LARGE measurement corpus for the optimization rounds.

The driver's escalated bench ran at sf=1.0 (50k documents, 20k
embeddings); its generated copy is not kept between rounds. This tool
recreates a corpus of the same SHAPE (matched against sf0.1: 30-word
uniform vocabulary + the rare 'dup' marker, 10-100 uniform tokens/doc,
~5% near-duplicate copies, en/zh/es/fr/de language mix, 20 sources,
64-dim embeddings in 10 gaussian label clusters) so per-query
optimizations can be measured at the scale where they matter.

MEASUREMENT INPUT ONLY: bench.py / the oracle never read this; nothing
derived from it is persisted into any query path. Deterministic
(numpy PCG64 seed 20260822) so before/after runs see identical bytes.

Usage: python tools/gen_bigdocs.py [outdir] [n_docs] [n_vecs]
Default outdir /root/bigdata/sf1.0; other bench tables are symlinked
from /root/testdata/sf0.1 so every declared query still constructs.
"""

from __future__ import annotations

import os
import sys

import numpy as np

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/root/bigdata/sf1.0"
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    n_vecs = int(sys.argv[3]) if len(sys.argv) > 3 else 20_000
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(20260822)

    texts: list[str] = []
    for i in range(n_docs):
        if i >= 20 and rng.random() < 0.05:
            # near-duplicate of an earlier doc: ~3 positions -> 'dup'
            base = texts[int(rng.integers(0, i))].split(" ")
            for _ in range(3):
                base[int(rng.integers(0, len(base)))] = "dup"
            texts.append(" ".join(base))
        else:
            n_tok = int(rng.integers(10, 101))
            idx = rng.integers(0, len(VOCAB), size=n_tok)
            texts.append(" ".join(VOCAB[j] for j in idx))

    import pyarrow as pa
    import pyarrow.parquet as pq

    lang = rng.choice(LANGS, size=n_docs, p=LANG_P)
    docs = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(lang.tolist(), pa.string()),
            "source": pa.array([f"src{i % 20}" for i in range(n_docs)], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(docs, os.path.join(outdir, "documents.parquet"))

    centers = rng.normal(0, 0.25, size=(10, 64)).astype(np.float32)
    labels = rng.integers(0, 10, size=n_vecs)
    vecs = centers[labels] + rng.normal(0, 0.08, size=(n_vecs, 64)).astype(np.float32)
    emb = pa.table(
        {
            "vec_id": pa.array(range(n_vecs), pa.int64()),
            "embedding": pa.array(
                [row.tolist() for row in vecs.astype(np.float32)],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(labels.tolist(), pa.int32()),
        }
    )
    pq.write_table(emb, os.path.join(outdir, "embeddings.parquet"))

    for t in (
        "customer", "events", "lineitem", "nation", "orders", "part",
        "region", "supplier",
    ):
        dst = os.path.join(outdir, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(f"/root/testdata/sf0.1/{t}.parquet", dst)
    print(f"wrote {n_docs} docs + {n_vecs} vecs to {outdir}")


if __name__ == "__main__":
    main()

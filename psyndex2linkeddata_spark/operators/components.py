"""Connected-components URI canonicalization (SURVEY §4 custom job #1).

The reference sidesteps cross-document entity identity with record-local
URIs; the north_star requires canonicalizing mention URIs that refer to
the same entity (e.g. one author across thousands of pages). Entity-link
candidate pairs (operators/linking.py) form an edge list; each connected
component collapses to one canonical id (its minimum member).

Algorithm: hash-to-min label propagation (GraphFrames-style driver loop):
    label(v) ← min(label(v), min over neighbors label(u))
repeated until fixpoint. Each round is one shuffle (groupBy vertex).
`localCheckpoint` every `checkpoint_every` rounds truncates the lineage so
plans don't grow with iterations (Catalyst cannot express iteration —
this is deliberately a driver-side loop). Convergence in O(diameter)
rounds; for the hub-and-spoke components entity resolution produces,
diameter is small (≤ ~6). Skewed hub vertices are fine: the min-agg is
a partial (map-side) aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """edge list → (node, component) with component = min node id of the
    component (ids compared as their natural type).

    r06 second wave: one partition-local contraction kernel runs BEFORE
    the distributed loop. Per input partition (no shuffle — the edges
    arrive however the producer left them) a mapInArrow kernel closes
    the partition's edges with numpy hash-to-min + pointer jumping over
    value-ranked local codes and emits one STAR edge (node → local
    component min) per distinct node in the partition. The union of the
    stars has exactly the original components (every original edge
    (u, v) lies in some partition whose local closure connects u and v
    through their shared local root, and every star edge is within one
    original component), and the loop then runs on |distinct nodes per
    partition| ≤ partitions × |V| rows instead of 2|E| — for the dense
    near-dup pair graphs this engine closes (cliques from LSH buckets /
    IVF cells), |E| is quadratic in cluster size and the contraction
    removes ~all of it (semantic_dedup's 7.9M-pair closure: 7.2s → the
    loop sees ~40k star rows). Output is EXACTLY the same (node,
    min-id) labeling: connected components are algorithm-independent,
    and the value ranking inside the kernel uses Arrow's unsigned-byte
    string order == the JVM's UTF8String compare. Pinned equal to the
    pure-loop form (`_connected_components_loop`) by
    tests/test_arrow_kernel_parity."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).where(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    )
    node_t = e.schema["src"].dataType.simpleString()

    def contract(batches):
        import numpy as np
        import pyarrow as pa

        chunks = [pa.Table.from_batches([b]) for b in batches]
        if not chunks:
            return
        t = pa.concat_tables(chunks).combine_chunks()
        if t.num_rows == 0:
            return
        both = pa.concat_arrays(
            [t.column("src").chunk(0), t.column("dst").chunk(0)]
        )
        de = both.dictionary_encode()
        n = len(de.dictionary)
        codes = de.indices.to_numpy().astype(np.int64)
        # rank nodes by VALUE so the local root is the local min id
        sort_idx = pa.compute.sort_indices(de.dictionary)
        sorted_dict = de.dictionary.take(sort_idx)
        rank = np.empty(n, dtype=np.int64)
        rank[sort_idx.to_numpy()] = np.arange(n)
        ru = rank[codes[: t.num_rows]]
        rv = rank[codes[t.num_rows :]]
        lab = np.arange(n, dtype=np.int64)
        for _ in range(64):
            m = np.minimum(lab[ru], lab[rv])
            before = lab.copy()
            np.minimum.at(lab, ru, m)
            np.minimum.at(lab, rv, m)
            lab = lab[lab]  # pointer jumping
            if np.array_equal(lab, before):
                break
        nodes = sorted_dict
        roots = sorted_dict.take(pa.array(lab))
        yield pa.RecordBatch.from_arrays([nodes, roots], ["src", "dst"])

    star = e.mapInArrow(contract, f"src {node_t}, dst {node_t}")
    return _connected_components_loop(star, "src", "dst", max_iter)


def _connected_components_loop(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """The distributed hash-to-min loop (the full algorithm on its own —
    kept as connected_components' cross-check and as its second phase
    over the contracted star graph)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).where(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    )
    # undirected: both directions once
    und = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    und = und.localCheckpoint()
    labels = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    for i in range(max_iter):
        neighbor_min = (
            und.join(labels, und["dst"] == labels["node"])
            .groupBy(und["src"].alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
                (
                    F.col("nbr_min").isNotNull()
                    & (F.col("nbr_min") < F.col("component"))
                ).alias("_changed"),
            )
        )
        # LAZY checkpoint + convergence count = ONE execution per round:
        # the count materializes the checkpoint, the next round's join
        # reads the materialized RDD instead of re-running every prior
        # round's join through the un-persisted lineage (the old
        # checkpoint-every-3 cadence re-executed up to 1+2 earlier rounds
        # between truncations — measured 1.7× slower on a 60k-doc near-dup
        # graph). Lineage stays truncated, plans stay O(1) per round.
        new_labels = new_labels.localCheckpoint(eager=False)
        changed = new_labels.where(F.col("_changed")).limit(1).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    return labels


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Alternating large-star/small-star contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) — the
    O(log n)-round alternative to hash-to-min for chain-heavy graphs
    (hash-to-min is O(diameter): fine for the hub-and-spoke components
    entity resolution yields, pathological on long chains).

    large-star: per node u, attach every LARGER neighbor to
    m = min(Γ(u) ∪ {u}); small-star: per node u, attach its smaller
    neighbors (and u) to m. Each phase is one groupBy shuffle + one
    join; at fixpoint the edge set is a star forest (node → component
    min). Same output contract as connected_components.
    """
    e0 = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).where(
        F.col("u").isNotNull() & F.col("v").isNotNull() & (F.col("u") != F.col("v"))
    )
    nodes = (
        e0.select(F.col("u").alias("node"))
        .union(e0.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    a = e0.distinct().localCheckpoint()

    def _sym(e: DataFrame) -> DataFrame:
        return e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))

    def large_star(e: DataFrame) -> DataFrame:
        s = _sym(e)
        mn = s.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("mn"))
        return (
            s.join(mn, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("mn").alias("v"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        # orient u ≥ v so every node groups with its smaller neighbors
        s = (
            e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        mn = s.groupBy("u").agg(F.min("v").alias("mn"))
        return (
            s.join(mn, "u")
            .select(F.col("v").alias("u"), F.col("mn").alias("v"))
            .union(mn.select("u", F.col("mn").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    prev_sig = None
    for _ in range(max_iter):
        a = small_star(large_star(a)).localCheckpoint()
        sig = a.select(
            F.count(F.lit(1)).alias("n"),
            # bit_xor: order-independent and cannot overflow (ANSI mode)
            F.bit_xor(F.xxhash64("u", "v")).alias("h"),
        ).collect()[0]
        sig = (sig.n, sig.h)
        if sig == prev_sig:
            break
        prev_sig = sig
    # at fixpoint `a` is (node → root); roots map to themselves
    return (
        nodes.join(a, nodes["node"] == a["u"], "left")
        .select("node", F.coalesce(F.col("v"), F.col("node")).alias("component"))
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )


def canonicalize_uris(
    triples: DataFrame, components: DataFrame
) -> DataFrame:
    """Rewrite subj/obj through the (node → component) mapping: every URI
    in a component is replaced by the component's canonical member.

    Two left joins (subj, then obj-where-iri). The mapping is usually a
    small fraction of all URIs → broadcast when it fits, else sort-merge
    on the uri key."""
    m = components.select(
        F.col("node").alias("_uri"), F.col("component").alias("_canon")
    )
    out = (
        triples.join(m, triples["subj"] == m["_uri"], "left")
        .withColumn("subj", F.coalesce(F.col("_canon"), F.col("subj")))
        .drop("_uri", "_canon")
    )
    out = (
        out.join(m, (out["obj"] == m["_uri"]) & out["obj_is_iri"], "left")
        .withColumn("obj", F.coalesce(F.col("_canon"), F.col("obj")))
        .drop("_uri", "_canon")
    )
    return out

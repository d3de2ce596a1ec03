"""Set-semantics operators over the triples table.

- last_wins: the reference's `graph.set` (remove (s,p,*) then add —
  /root/reference/modules/contributions.py:392, identifiers.py:89, …)
  re-expressed as a window: keep the highest emit_order per (subj,pred).
- clean_genres: A2 genre-hierarchy dedup (publication_types.py:481-631)
  as anti-joins over the emitted genreForm edges — needs the per-work
  genre SET, so it runs post-emit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from psyndex2linkeddata_spark import namespaces as NS

GENRE_PRED = NS.BF + "genreForm"
_THESIS_GENRES = [
    NS.GENRES + g
    for g in (
        "ThesisDoctoral",
        "CompilationThesisDoctoral",
        "ThesisHabilitation",
        "CompilationThesisHabilitation",
    )
]
_SCHOLARLY = [NS.GENRES + "ScholarlyPaper", NS.GENRES + "ScholarlyWork"]


def last_wins(triples: DataFrame, order_col: str = "emit_order") -> DataFrame:
    """(subj, pred) upsert: latest emit wins (graph.set semantics)."""
    w = Window.partitionBy("subj", "pred").orderBy(F.col(order_col).desc())
    return (
        triples.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def clean_genres(triples: DataFrame, genre_ancestors: DataFrame | None = None) -> DataFrame:
    """A2: (1) a work with a thesis genre loses ScholarlyPaper/
    ScholarlyWork; (2) a work never keeps both a genre and its ancestor
    (broadcast closure table genre_ancestors(genre_uri, ancestor_uri))."""
    genres = triples.where(F.col("pred") == GENRE_PRED)
    thesis_works = genres.where(F.col("obj").isin(_THESIS_GENRES)).select("subj").distinct()
    drop1 = (
        genres.where(F.col("obj").isin(_SCHOLARLY))
        .join(F.broadcast(thesis_works), "subj")
        .select("subj", "pred", "obj")
    )
    drops = drop1
    if genre_ancestors is not None:
        anc = F.broadcast(
            genre_ancestors.select(
                F.col("genre_uri").alias("_g"), F.col("ancestor_uri").alias("_a")
            )
        )
        g2 = genres.select(F.col("subj").alias("_s2"), F.col("obj").alias("_o2"))
        drop2 = (
            genres.join(anc, genres["obj"] == F.col("_a"))
            .join(
                g2,
                (F.col("subj") == F.col("_s2"))
                & (F.col("_g") == F.col("_o2"))
                & (F.col("obj") != F.col("_o2")),
            )
            .select("subj", "pred", "obj")
        )
        drops = drops.unionByName(drop2)
    return triples.join(drops.distinct(), ["subj", "pred", "obj"], "left_anti")

"""Embedding similarity search over ``array<float>`` columns.

Two strategies:

- :func:`brute_force_topk` — exact cosine top-k: broadcast the (small)
  query set against the candidate corpus; one pass, no shuffle of the
  corpus, per-partition partial top-k via the row_number window on the
  query partition. The baseline and the correctness oracle.
- :func:`ivf_topk` — IVF-style approximate top-k: partition the corpus
  into Voronoi cells around centroid vectors, search only the query's
  cell. At 100 TB this turns a full scan per query into a 1/K-of-corpus
  scan; cells are co-partitioned by centroid id so the probe is a
  hash-join, not a cross-join.

All vector math is built-in higher-order functions in DOUBLE
(functions.vectors) — JVM-side, no Python serialization per row.

Reference analogue: the dormant pgvector ``VECTOR(768)`` column
(reference: sql/01_schema.sql:95) — declared for exactly this kind of
report-embedding similarity, never implemented there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.vectors import cosine


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k neighbors for every query vector.

    Returns (query_id, neighbor_id, sim, rank); sim rounded to 4
    decimals, ties broken by neighbor id (deterministic cutoff).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    sims = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine("q_vec", "c_vec"), 4).alias("sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def assign_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (max cosine).
    Centroids are broadcast; argmax via one window over the small
    per-vector × per-centroid frame."""
    cent = centroids.select(
        F.col(id_col).alias("cell_id"), F.col(vec_col).alias("cent_vec")
    )
    scored = corpus.crossJoin(F.broadcast(cent)).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("cell_id"),
        cosine(vec_col, "cent_vec").alias("cell_sim"),
    )
    w = W.partitionBy(id_col).orderBy(F.desc("cell_sim"), F.asc("cell_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "cell_sim")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Approximate cosine top-k: probe only the query's Voronoi cell.

    Returns (query_id, neighbor_id, sim, rank). Recall < 1.0 by design;
    tested against :func:`brute_force_topk` in the unit suite.
    """
    cells = assign_cells(corpus, centroids, id_col, vec_col)
    q_cells = assign_cells(queries, centroids, id_col, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        "cell_id",
    )
    c_cells = cells.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        "cell_id",
    )
    sims = (
        c_cells.join(F.broadcast(q_cells), "cell_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine("q_vec", "c_vec"), 4).alias("sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )

"""Approximate-nearest-neighbor search over an embedding column.

- ``cosine_topk``: exact brute-force baseline — broadcast the (small) query
  set against the corpus, dot products via ``zip_with``/``aggregate``
  (JVM-side), top-k per query with a window.  At 100 TB the corpus side
  never shuffles: the broadcast join + per-partition partial top-k (AQE)
  keeps it scan-bound.
- ``ivf_topk``: IVF-style scale path — k-means-ish centroid assignment
  (deterministic seeded centroids sampled by hash), probe only ``n_probe``
  nearest cells.  Centroid assignment is a vectorized pandas UDF (numpy
  matmul over Arrow batches) because a D×C matmul per row is exactly what
  BLAS is for; everything around it is DataFrame ops.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType

from .dedup import cosine_sim


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id",
                query_id_col: str = "query_id") -> DataFrame:
    """Exact top-k by cosine: (query_id, vec_id, cosine, rank)."""
    q = queries.select(
        F.col(query_id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_qv"),
    )
    c = corpus.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_cv"),
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        query_id_col, id_col,
        F.round(cosine_sim(F.col("_qv"), F.col("_cv")), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _seeded_centroids(corpus: DataFrame, vec_col: str, id_col: str,
                      n_cells: int) -> np.ndarray:
    """Deterministic centroid pick: the n_cells corpus vectors with the
    lexicographically smallest sha256(id-as-string) — a seeded sample,
    stable across runs AND re-derivable by the DuckDB oracle (sha256 is
    the shared Spark/DuckDB hash primitive; id breaks hex-collision ties,
    which cannot occur for distinct ids anyway)."""
    rows = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .withColumn("_h", F.sha2(F.col(id_col).cast("string"), 256))
        .orderBy("_h", id_col)
        .limit(n_cells)
        .collect()
    )
    return np.array([list(r[vec_col]) for r in rows], dtype=np.float64)


def _assign_cells(vec_col: str, centroids: np.ndarray, n_probe: int):
    """Vectorized (Arrow-batched) nearest-centroid assignment: one numpy
    matmul per batch — the only Python in the ANN path.

    Similarities are rounded to 9 dp before ranking and ties broken by
    cell index (stable argsort) so the assignment is bit-for-bit
    reproducible by a sequential-summation SQL oracle despite BLAS's
    blocked summation order."""
    cnorm = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            sims = np.round(mat @ cnorm.T, 9)  # (batch, cells)
            order = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
            out = pdf.copy()
            out["_cells"] = [row.tolist() for row in order]
            yield out

    return assign


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             n_cells: int = 16, n_probe: int = 4,
             vec_col: str = "embedding", id_col: str = "vec_id",
             query_id_col: str = "query_id") -> DataFrame:
    """IVF-bucketed ANN: corpus rows live in their nearest cell; a query
    scans only its n_probe nearest cells.  Approximate — recall grows with
    n_probe (n_probe == n_cells degrades to exact)."""
    spark = corpus.sparkSession
    centroids = _seeded_centroids(corpus, vec_col, id_col, n_cells)

    corpus_schema = corpus.select(id_col, vec_col).schema.add("_cells", ArrayType(IntegerType()))
    c_assigned = (
        corpus.select(id_col, vec_col)
        .mapInPandas(_assign_cells(vec_col, centroids, 1), schema=corpus_schema)
        .select(id_col, vec_col, F.element_at("_cells", 1).alias("_cell"))
    )
    q_schema = queries.select(query_id_col, vec_col).schema.add("_cells", ArrayType(IntegerType()))
    q_assigned = (
        queries.select(query_id_col, vec_col)
        .mapInPandas(_assign_cells(vec_col, centroids, n_probe), schema=q_schema)
        .select(query_id_col, F.col(vec_col).alias("_qv"),
                F.explode("_cells").alias("_cell"))
    )
    joined = c_assigned.join(F.broadcast(q_assigned), "_cell").select(
        query_id_col, id_col,
        F.round(
            cosine_sim(
                F.transform("_qv", lambda x: x.cast("double")),
                F.transform(vec_col, lambda x: x.cast("double")),
            ), 6,
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.col(id_col))
    return joined.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)

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


def train_ivf_centroids(corpus: DataFrame, vec_col: str = "embedding",
                        id_col: str = "vec_id", n_cells: int = 16,
                        n_iters: int = 5) -> tuple[np.ndarray, list[float]]:
    """Lloyd k-means over the corpus for IVF cells: seeded init (the same
    deterministic sha256 pick ``ivf_topk`` defaults to), then per
    iteration one distributed assignment pass (Arrow-batched numpy) + a
    per-cell elementwise mean.  Only the (n_cells × dim) centroid matrix
    and per-iteration inertia ever reach the driver — the corpus never
    does, so the loop is 100 TB-shaped: each iteration is one scan + one
    n_cells-key aggregation.

    Returns (centroids, inertia_per_iteration) — inertia = mean(1 -
    cosine to the assigned centroid), monotone non-increasing on a fixed
    corpus (standard Lloyd convergence)."""
    cents = _seeded_centroids(corpus, vec_col, id_col, n_cells)
    dim = cents.shape[1]
    inertias: list[float] = []
    for _ in range(n_iters):
        schema = corpus.select(id_col, vec_col).schema.add(
            "_cells", ArrayType(IntegerType()))
        assigned = (
            corpus.select(id_col, vec_col)
            .mapInPandas(_assign_cells(vec_col, cents, 1), schema=schema)
            .select(vec_col, F.element_at("_cells", 1).alias("_cell"))
        )
        vecd = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        norm = F.sqrt(F.aggregate(vecd, F.lit(0.0), lambda a, v: a + v * v))
        unit = F.transform(vecd, lambda x: x / F.greatest(norm, F.lit(1e-12)))
        stats = (
            assigned.withColumn("_u", unit)
            .groupBy("_cell")
            .agg(F.count(F.lit(1)).alias("_n"),
                 *[F.sum(F.element_at("_u", i + 1)).alias(f"_s{i}")
                   for i in range(dim)])
            .collect()
        )
        new = cents.copy()
        for r in stats:
            c = int(r["_cell"])
            new[c] = np.array([r[f"_s{i}"] for i in range(dim)]) / max(r["_n"], 1)
        cents = new
        # inertia on the UPDATED centroids' assignment distance
        cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
        sims = (
            assigned.withColumn("_u", unit)
            .select(F.col("_cell"), F.col("_u"))
        )
        # driver-free inertia: mean over rows of (1 - cos to assigned cell)
        # computed with the PREVIOUS assignment and NEW centroid — a
        # standard upper bound that still decreases monotonically
        cent_arr = F.array(*[
            F.array(*[F.lit(float(x)) for x in cn[c]]) for c in range(n_cells)
        ])
        cos = F.aggregate(
            F.zip_with(F.col("_u"), F.element_at(cent_arr, F.col("_cell") + 1),
                       lambda a, b: a * b),
            F.lit(0.0), lambda a, v: a + v)
        inertias.append(
            sims.agg(F.avg(F.lit(1.0) - cos).alias("i")).collect()[0]["i"])
    return cents, inertias


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             n_cells: int = 16, n_probe: int = 4,
             vec_col: str = "embedding", id_col: str = "vec_id",
             query_id_col: str = "query_id",
             centroids: np.ndarray | None = None) -> DataFrame:
    """IVF-bucketed ANN: corpus rows live in their nearest cell; a query
    scans only its n_probe nearest cells.  Approximate — recall grows with
    n_probe (n_probe == n_cells degrades to exact).  ``centroids``
    overrides the deterministic seeded pick (e.g. a trained matrix from
    ``train_ivf_centroids``)."""
    if centroids is None:
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

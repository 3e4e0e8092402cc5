"""Semantic deduplication: cluster-bounded embedding near-dup removal.

The SemDeDup recipe (Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", arXiv:2303.09540): k-means the
embedding space, then WITHIN each cluster drop every item whose cosine
similarity to an already-kept item exceeds a threshold. Semantic
duplicates (same content, different wording — which MinHash/SimHash miss
by design) land in the same cluster, so the quadratic comparison is
bounded by the cluster size, never the corpus: total work is
O(N·(N/k)·d) instead of the all-pairs O(N²·d).

Spark shape, reusing the IVF machinery (`similarity.py`):

- centroids: deterministic sample fit (`ivf_fit_centroids` — a bounded
  TakeOrdered + driver-side Lloyd's, no pyspark.ml job);
- assignment: one Arrow-batched matmul per batch (`ivf_assign`);
- dedup: `applyInPandas` per cluster — ONE shuffle, keyed by cluster id.
  Each group greedily scans its rows in ascending-id order and keeps a
  row iff its max cosine against the rows already kept stays below the
  threshold; the winner of every duplicate neighborhood is therefore the
  MINIMUM id, a pure function of the data (deterministic under any
  partitioning, stable across runs).

100 TB notes: grow ``n_clusters`` ∝ N to hold E[cluster] constant — the
shuffle moves each row once and per-task memory is O(cluster·d). A
cluster overflowing ``max_cluster`` (skewed embedding space) is
salt-split into ``ceil(size/max_cluster)`` shards by id hash, bounding
task memory at the cost of missing cross-shard duplicates inside that one
cluster — the same bounded-recall trade the LSH ``max_bucket`` cap makes;
raise ``n_clusters`` to shrink hot clusters instead of leaning on the
cap. Zero vectors have no cosine direction and are always kept.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from presencia_etl_spark.operators.similarity import ivf_assign, ivf_fit_centroids

CLUSTER_COL = "sd_cluster"
KEEP_COL = "sd_keep"
_SHARD_COL = "_sd_shard"


def semantic_dedup_flags(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_clusters: int = 16,
    seed: int = 42,
    max_cluster: int = 2048,
    centroids: "list[list[float]] | None" = None,
) -> DataFrame:
    """Flag every row: ``sd_cluster`` (int) + ``sd_keep`` (boolean —
    False means a kept row in the same cluster is within ``threshold``
    cosine). Pass precomputed ``centroids`` to share a fit across calls
    (e.g. with a persisted IVF index over the same corpus)."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if centroids is None:
        centroids = ivf_fit_centroids(
            df, id_col=id_col, vec_col=vec_col, n_clusters=n_clusters, seed=seed
        )
    assigned = ivf_assign(df, centroids, vec_col, out=CLUSTER_COL)

    # Salt-split oversized clusters so one hot cluster can't blow task
    # memory: counts is ≤ n_clusters rows (driver-safe), broadcast back.
    counts = assigned.groupBy(CLUSTER_COL).agg(
        F.count(F.lit(1)).alias("_sd_n")
    )
    shards = F.greatest(
        F.lit(1), F.ceil(F.col("_sd_n") / F.lit(max_cluster))
    ).cast("int")
    sized = assigned.join(
        F.broadcast(counts.withColumn("_sd_shards", shards).drop("_sd_n")),
        CLUSTER_COL,
    )
    sharded = sized.withColumn(
        _SHARD_COL,
        F.pmod(F.xxhash64(F.col(id_col)), F.col("_sd_shards")).cast("int"),
    ).drop("_sd_shards")

    out_schema = T.StructType(
        [f for f in sharded.schema.fields if f.name != _SHARD_COL]
        + [T.StructField(KEEP_COL, T.BooleanType())]
    )
    thr = float(threshold)

    def dedup_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        M = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(M, axis=1)
        nz = norms > 0
        M[nz] /= norms[nz, None]
        m = len(M)
        kept = np.empty_like(M)
        n_kept = 0
        keep = np.zeros(m, dtype=bool)
        for i in range(m):
            if (
                not nz[i]
                or n_kept == 0
                or float((kept[:n_kept] @ M[i]).max()) < thr
            ):
                kept[n_kept] = M[i]
                n_kept += 1
                keep[i] = True
        pdf = pdf.drop(columns=[_SHARD_COL])
        pdf[KEEP_COL] = keep
        return pdf

    return sharded.groupBy(CLUSTER_COL, _SHARD_COL).applyInPandas(
        dedup_group, out_schema
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_clusters: int = 16,
    seed: int = 42,
    max_cluster: int = 2048,
    centroids: "list[list[float]] | None" = None,
) -> DataFrame:
    """The deduplicated corpus: original columns only, semantic near-dups
    removed (each duplicate neighborhood keeps its minimum id)."""
    flagged = semantic_dedup_flags(
        df,
        id_col=id_col,
        vec_col=vec_col,
        threshold=threshold,
        n_clusters=n_clusters,
        seed=seed,
        max_cluster=max_cluster,
        centroids=centroids,
    )
    return flagged.filter(F.col(KEEP_COL)).drop(KEEP_COL, CLUSTER_COL)

"""Similarity search over embedding columns (array<float>).

100 TB extension (SURVEY §7.2 M6). Two tiers:

- **Brute-force cosine top-k** — the exactness baseline. Dot product and
  norms are JVM-side higher-order functions (zip_with + aggregate), the
  query side is broadcast, and ranking is a per-query window. Cost is
  O(N·Q·d) flops with zero Python; at 100 TB you bound Q (batch your
  queries), not N.
- **LSH-bucketed ANN** — random-hyperplane signatures (sign bits of dot
  with fixed seeded planes) bucket the corpus; candidates come from the
  query's bucket plus multiprobe neighbors (1-bit flips), then exact
  re-rank. The bucket join shuffles only (bucket, id) pairs. This is the
  scale path: recall tunable via n_planes/multiprobe; an IVF variant would
  swap the hash for k-means centroids (pyspark.ml KMeans) with the same
  probe/re-rank shape.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: str, b: str) -> F.Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
        f" cast(0.0 as double), (acc, v) -> acc + v)"
    )


def _norm(col: str) -> F.Column:
    return F.sqrt(
        F.expr(
            f"aggregate({col}, cast(0.0 as double),"
            f" (acc, v) -> acc + cast(v as double) * cast(v as double))"
        )
    )


def with_norm(df: DataFrame, vec_col: str = "embedding", out: str = "norm") -> DataFrame:
    return df.withColumn(out, _norm(vec_col))


def cosine_pairs(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding", min_cosine: float = 0.9
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine ≥ threshold — embedding near-dup
    detection. Exact (full self-join); use lsh buckets first at scale."""
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    base = base.withColumn("nrm", _norm("v"))
    a = base.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = base.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    cos = _dot("va", "vb") / (F.col("na") * F.col("nb"))
    return (
        pairs.withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= F.lit(min_cosine))
        .select("id_a", "id_b", "cosine")
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector (self-matches excluded).

    queries is expected to be small → broadcast, so the corpus never
    shuffles; ranking is a window partitioned by query id (deterministic
    tiebreak on neighbor id).
    """
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    c = c.withColumn("cn", _norm("cv"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    q = q.withColumn("qn", _norm("qv"))
    joined = c.crossJoin(F.broadcast(q)).filter(F.col("neighbor_id") != F.col("query_id"))
    cos = _dot("cv", "qv") / (F.col("cn") * F.col("qn"))
    ranked = joined.withColumn("cosine", F.round(cos, 6)).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
        ),
    )
    return ranked.filter(F.col("rk") <= k).select("query_id", "neighbor_id", "cosine", "rk")


def cosine_pairs_blocked(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cosine: float = 0.9,
    round_to: int = 6,
    n_blocks: int = 8,
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine ≥ threshold via distributed
    tiled GEMM — nothing touches the driver.

    Each vector is assigned a block ``b = xxhash64(id) mod n_blocks``; the
    upper-triangle of block pairs (bi ≤ bj) is covered by replicating every
    row to the block pairs it participates in (as the left member of
    (b, j≥b) and the right member of (i≤b, b)). One shuffle groups each
    block pair on one executor, where a single float64 matmul scores the
    tile (~50× faster than per-pair higher-order dot products). Results are
    rounded before thresholding so fold order can't move the cut.

    Scale math: shuffle volume is (n_blocks+1)·N vectors — the classic
    O(N·√P) triangle-join cost — and peak executor memory is two blocks
    (~2N/n_blocks rows). Grow ``n_blocks`` ∝ √N to hold tile size constant;
    at extreme N, LSH-prefilter candidates and verify with exact cosine
    instead of scoring all tiles.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int").alias("blk"),
    )
    lefts = base.select(
        F.col("blk").alias("bi"),
        F.explode(F.expr(f"sequence(blk, {n_blocks - 1})")).alias("bj"),
        F.lit("L").alias("side"),
        "id",
        "v",
    ).select("bi", "bj", "side", "id", "v")
    rights = base.select(
        F.explode(F.expr("sequence(0, blk)")).alias("bi"),
        F.col("blk").alias("bj"),
        F.lit("R").alias("side"),
        "id",
        "v",
    ).select("bi", "bj", "side", "id", "v")
    tiles = lefts.unionByName(rights)

    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )
    empty = pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})

    def _normed(pdf: "pd.DataFrame"):
        ids = pdf["id"].to_numpy()
        mat = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        return ids, mat / norms[:, None]

    def gemm(key, pdf):
        bi, bj = int(key[0]), int(key[1])
        left = pdf[pdf["side"] == "L"]
        right = pdf[pdf["side"] == "R"]
        if len(left) == 0 or len(right) == 0:
            return empty
        l_ids, l_mat = _normed(left)
        r_ids, r_mat = _normed(right)
        sims = np.round(l_mat @ r_mat.T, round_to)
        hit_r, hit_c = np.nonzero(sims >= min_cosine)
        ia, ib = l_ids[hit_r], r_ids[hit_c]
        cos = sims[hit_r, hit_c]
        if bi == bj:
            # Diagonal tile: left set == right set, every unordered pair
            # appears twice — keep the (a < b) orientation once.
            keep = ia < ib
            ia, ib, cos = ia[keep], ib[keep], cos[keep]
        else:
            # Off-diagonal: blocks are disjoint, each pair appears once;
            # orient ids.
            lo = np.minimum(ia, ib)
            hi = np.maximum(ia, ib)
            ia, ib = lo, hi
        return pd.DataFrame({"id_a": ia, "id_b": ib, "cosine": cos})

    return tiles.groupBy("bi", "bj").applyInPandas(gemm, out_schema)


def hyperplanes(dim: int, n_planes: int = 16, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (driver-side constants, broadcast as
    literals into the plan)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def with_lsh_bucket(
    df: DataFrame,
    planes: list[list[float]],
    vec_col: str = "embedding",
    out: str = "bucket",
) -> DataFrame:
    """Sign-bit bucket id from the fixed hyperplanes."""
    bits = []
    for i, plane in enumerate(planes):
        arr = "array(" + ",".join(f"cast({x!r} as double)" for x in plane) + ")"
        dot = (
            f"aggregate(zip_with({vec_col}, {arr}, (x, y) -> cast(x as double) * y),"
            f" cast(0.0 as double), (acc, v) -> acc + v)"
        )
        bits.append(f"if({dot} >= 0, shiftleft(1L, {i}), 0L)")
    return df.withColumn(out, F.expr(" | ".join(bits)))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) partitioning.

    KMeans (pyspark.ml) clusters the corpus once; each vector lives in its
    centroid's posting list. A query probes its ``n_probe`` nearest
    centroids (centroid table is tiny → computed driver-side) and re-ranks
    exactly within those lists. Unlike hyperplane LSH, IVF adapts to the
    data's actual density; recall/cost is n_probe/n_clusters. At 100 TB the
    posting lists are the partition layout (repartition by cluster id), so
    a probe touches only its clusters' files.
    """
    import numpy as np

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    c_base = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    model = KMeans(k=n_clusters, seed=seed, maxIter=10).fit(c_base.select("features"))
    assigned = model.transform(c_base).select(
        "neighbor_id", "cv", F.col("prediction").alias("cluster")
    )
    assigned = assigned.withColumn("cn", _norm("cv"))

    centroids = np.array([np.asarray(c) for c in model.clusterCenters()])

    q_pdf = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")).toPandas()
    probe_rows = []
    for _, row in q_pdf.iterrows():
        qv = np.asarray(row["qv"], dtype=np.float64)
        d = ((centroids - qv) ** 2).sum(axis=1)
        for cl in np.argsort(d)[:n_probe]:
            probe_rows.append((int(row["query_id"]), list(map(float, row["qv"])), int(cl)))
    spark = corpus.sparkSession
    q = spark.createDataFrame(probe_rows, ["query_id", "qv", "cluster"]).withColumn(
        "qv", F.col("qv").cast("array<float>")
    )
    q = q.withColumn("qn", _norm("qv"))

    joined = assigned.join(F.broadcast(q), "cluster").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    cos = _dot("cv", "qv") / (F.col("cn") * F.col("qn"))
    ranked = (
        joined.dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cosine", F.round(cos, 6))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
            ),
        )
    )
    return ranked.filter(F.col("rk") <= k).select("query_id", "neighbor_id", "cosine", "rk")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 8,
    dim: int = 64,
    multiprobe: bool = True,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via MULTI-TABLE hyperplane LSH + exact re-rank.

    One b-bit table has collision probability (1-θ/π)^b — hopeless for
    neighbors at wide angles (structureless embeddings: top-1 sits near
    60°, p≈0.04 at b=10). The standard fix is L independent tables
    (recall 1-(1-p_t)^L) plus 1-bit multiprobe within each table; the
    defaults (8×8, multiprobe) give ~0.8 recall even on isotropic random
    vectors while touching ~25% of the corpus — on real clustered
    embeddings the same knobs are far more selective. Tune b up/L down as
    the corpus grows denser.

    The corpus is bucketed once per table ((table, bucket) exploded pairs
    — narrow), queries are broadcast; the exact cosine re-rank runs only
    inside candidate buckets.
    """
    c_base = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    q_base = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))

    def bucketed(df: DataFrame, vec: str, probe: bool) -> DataFrame:
        # All L table buckets in ONE projection over ONE scan (a union of
        # per-table frames would rescan the corpus L times), then
        # posexplode to (tbl, bucket) rows.
        exprs = []
        for t in range(n_tables):
            planes = hyperplanes(dim, n_planes, seed + 1000 * t)
            bits = []
            for i, plane in enumerate(planes):
                arr = "array(" + ",".join(f"cast({x!r} as double)" for x in plane) + ")"
                dot = (
                    f"aggregate(zip_with({vec}, {arr}, (x, y) -> cast(x as double) * y),"
                    f" cast(0.0 as double), (acc, v) -> acc + v)"
                )
                bits.append(f"if({dot} >= 0, shiftleft(1L, {i}), 0L)")
            exprs.append(" | ".join(bits))
        all_buckets = F.array(*[F.expr(e) for e in exprs])
        out = df.withColumn("_bkts", all_buckets).select(
            "*", F.posexplode("_bkts").alias("tbl", "bucket")
        ).drop("_bkts")
        if probe and multiprobe:
            probes = F.array(
                F.col("bucket"),
                *[F.expr(f"bucket ^ shiftleft(1L, {i})") for i in range(n_planes)],
            )
            out = out.withColumn("bucket", F.explode(probes))
        return out

    c = bucketed(c_base, "cv", probe=False).withColumn("cn", _norm("cv"))
    q = bucketed(q_base, "qv", probe=True).withColumn("qn", _norm("qv"))
    joined = c.join(F.broadcast(q), ["tbl", "bucket"]).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    cos = _dot("cv", "qv") / (F.col("cn") * F.col("qn"))
    ranked = (
        joined.select("query_id", "neighbor_id", "cv", "qv", "cn", "qn")
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cosine", F.round(cos, 6))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
            ),
        )
    )
    return ranked.filter(F.col("rk") <= k).select("query_id", "neighbor_id", "cosine", "rk")

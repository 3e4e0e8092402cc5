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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from presencia_etl_spark.functions.partitioning import parallelize_scan


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
    use_arrow: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector (self-matches excluded).

    queries is expected to be small and is collected driver-side (the
    batched-query contract); ranking is a window partitioned by query id
    (deterministic tiebreak on neighbor id).

    Default path (r13): one numpy matmul per Arrow batch with a PER-BATCH
    partial top-k per query — the ``pq_topk`` scan discipline. The
    interpreted ``aggregate(zip_with(...))`` fold costs ~25 µs per
    (query, neighbor) pair (measured: 1.12 s vs 0.58 s for 2000×20 at
    sf0.1), and the crossJoin+window shape shipped N·Q rows into the
    window sort where this ships batches·Q·(k+4). Raw cosines cross the
    boundary unrounded and the SAME ``F.round(..., 6)`` is applied
    JVM-side, so rounding semantics are byte-identical to the fold path;
    the partial cut keeps k+4 per batch so round-level ties at the k
    boundary still reach the final window (verified row-identical vs the
    fold path at sf0.001/0.01/0.1). ``use_arrow=False`` keeps the pure
    higher-order-function plan (no Python workers, e.g. for clusters
    without them). Zero-norm vectors (cosine NULL in the fold path,
    ranked last) are excluded from candidates by the Arrow path; no
    testdata corpus contains one.
    """
    if not use_arrow:
        c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
        c = c.withColumn("cn", _norm("cv"))
        q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
        q = q.withColumn("qn", _norm("qv"))
        joined = c.crossJoin(F.broadcast(q)).filter(
            F.col("neighbor_id") != F.col("query_id")
        )
        cos = _dot("cv", "qv") / (F.col("cn") * F.col("qn"))
        ranked = joined.withColumn("cosine", F.round(cos, 6)).withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("cosine"), F.asc("neighbor_id")
                )
            ),
        )
        return ranked.filter(F.col("rk") <= k).select(
            "query_id", "neighbor_id", "cosine", "rk"
        )

    qrows = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).collect()
    id_type = dict(corpus.dtypes)[id_col]
    out_schema = f"query_id {id_type}, neighbor_id {id_type}, _rawcos double"
    if not qrows:
        empty = corpus.sparkSession.createDataFrame([], out_schema)
        return empty.select(
            "query_id",
            "neighbor_id",
            F.col("_rawcos").alias("cosine"),
            F.lit(1).alias("rk"),
        ).limit(0)
    qids = np.asarray([r["query_id"] for r in qrows])
    Q = np.asarray([r["qv"] for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(Q, axis=1)
    q_zero = qn == 0
    qn[q_zero] = 1.0
    Qn = Q / qn[:, None]
    # +1 spare for the self-match a query that is itself a corpus row
    # produces; +3 margin so raw-distinct/round-tied candidates at the
    # k boundary survive the per-batch cut into the final window.
    take = k + 4

    def scan(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["neighbor_id"].to_numpy()
            M = np.vstack(pdf["cv"].to_numpy()).astype(np.float64)
            cn = np.linalg.norm(M, axis=1)
            c_zero = cn == 0
            cn[c_zero] = 1.0
            sims = Qn @ (M / cn[:, None]).T
            # zero-norm rows/queries have no defined cosine — mark them
            # -inf so the partial cut never selects them, and drop any
            # that slip through a batch narrower than the cut.
            sims[:, c_zero] = -np.inf
            sims[q_zero, :] = -np.inf
            top = min(take, sims.shape[1])
            part = np.argpartition(-sims, top - 1, axis=1)[:, :top]
            res = {"query_id": [], "neighbor_id": [], "_rawcos": []}
            for qi in range(len(qids)):
                sel = part[qi]
                sel = sel[np.isfinite(sims[qi, sel])]
                res["query_id"].extend([qids[qi]] * len(sel))
                res["neighbor_id"].extend(ids[sel])
                res["_rawcos"].extend(sims[qi, sel])
            yield pd.DataFrame(res)

    cands = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
        )
        .mapInPandas(scan, schema=out_schema)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.round(F.col("_rawcos"), 6))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("cosine"), F.asc("neighbor_id")
                )
            ),
        )
    )
    return cands.filter(F.col("rk") <= k).select(
        "query_id", "neighbor_id", "cosine", "rk"
    )


def _pair_cosine_udf():
    """Vectorized (row-wise) cosine over two array columns — the exact
    re-rank kernel for candidate pairs. One einsum per Arrow batch
    replaces the interpreted ``aggregate(zip_with(...))`` fold (~25 µs
    per pair measured at sf0.1 — the fold was the re-rank cost, not the
    bucketing). Returns the RAW cosine; call sites apply the same
    ``F.round(..., 6)`` the fold path used, so rounding semantics are
    unchanged. Zero-norm vectors yield NaN (the fold path yields NULL) —
    both are "no defined cosine"; no testdata corpus contains one.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        A = np.vstack(a.to_numpy()).astype(np.float64)
        B = np.vstack(b.to_numpy()).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.einsum("ij,ij->i", A, B) / (
                np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
            )
        return pd.Series(out)

    return cos


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


def l2_normalize(df: DataFrame, vec_col: str = "embedding", out: str | None = None) -> DataFrame:
    """L2-normalize an embedding column (zero vectors pass through) — one
    JVM higher-order expression, no UDF. Normalized corpora turn cosine
    into a plain dot product, halving re-rank flops downstream."""
    out = out or vec_col
    nrm = _norm(vec_col)
    # Norm bound ONCE via a single-element outer transform — inlining the
    # aggregate into the inner lambda would re-sum the vector per element
    # (the quadratic HOF trap; see winnowed_fingerprints).
    normalized = F.expr(
        f"transform(array(sqrt(aggregate({vec_col}, cast(0.0 as double),"
        f" (a, v) -> a + cast(v as double) * cast(v as double)))),"
        f" n -> transform({vec_col}, x -> cast(cast(x as double) / n as float)))[0]"
    )
    return df.withColumn(
        out, F.when(nrm == 0, F.col(vec_col)).otherwise(normalized)
    )


def quantize_embeddings_int8(
    df: DataFrame, vec_col: str = "embedding", out: str = "embedding_q", scale_col: str = "q_scale"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: q = round(x · 127 / max|x|),
    scale stored alongside for dequantization. 4× storage reduction for a
    100 TB embedding store (float32 → int8 + one float per vector); cosine
    on dequantized vectors is within ~1% of exact for typical embeddings.
    All JVM-side (two higher-order passes: absmax, then scale+round)."""
    absmax = F.expr(
        f"aggregate({vec_col}, cast(0.0 as double),"
        f" (a, v) -> greatest(a, abs(cast(v as double))))"
    )
    df = df.withColumn(scale_col, (F.when(absmax == 0, 1.0).otherwise(absmax) / 127.0))
    return df.withColumn(
        out,
        F.expr(
            f"transform({vec_col}, x -> cast(round(cast(x as double) / {scale_col}) as tinyint))"
        ),
    )


def dequantize_embeddings_int8(
    df: DataFrame, q_col: str = "embedding_q", scale_col: str = "q_scale", out: str = "embedding"
) -> DataFrame:
    return df.withColumn(
        out,
        F.expr(f"transform({q_col}, q -> cast(cast(q as double) * {scale_col} as float))"),
    )


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


def ivf_fit_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    seed: int = 42,
    sample_rows: int = 4096,
    max_iter: int = 20,
) -> "list[list[float]]":
    """Fit IVF centroids on a deterministic SAMPLE, driver-side with numpy.

    K-means quality needs only a representative sample, not the corpus:
    taking the ``sample_rows`` lowest ``xxhash64(id)`` rows is a cheap
    TakeOrdered (no full shuffle, deterministic under any partitioning) and
    Lloyd's iterations on ≤4k×d doubles are sub-millisecond. This replaces
    a full-corpus ``pyspark.ml`` KMeans fit whose JVM class-loading +
    iterative jobs dominated q43's bench time (11.7 s cold → the fit was
    the regression).
    """
    import numpy as np

    rows = (
        corpus.select(F.col(vec_col).alias("v"), F.xxhash64(F.col(id_col)).alias("h"))
        .orderBy("h")
        .limit(sample_rows)
        .collect()
    )
    X = np.asarray([r["v"] for r in rows], dtype=np.float64)
    C = _lloyd(X, n_clusters, seed, max_iter)
    return [[float(x) for x in row] for row in C]


def ivf_assign(
    df: DataFrame,
    centroids: "list[list[float]]",
    vec_col: str,
    out: str = "cluster",
    n_probe: int = 1,
) -> DataFrame:
    """Nearest-centroid assignment as ONE Arrow-batched matmul per batch
    (vectorized pandas UDF — no driver iteration, no pyspark.ml).

    ``n_probe`` = 1 labels each row with its cluster (int); > 1 returns the
    ``n_probe`` nearest clusters as an array (the query-side probe list).
    """
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)
    c_sq = (C * C).sum(1)[None, :]

    if n_probe <= 1:

        @pandas_udf("int")
        def nearest(v: pd.Series) -> pd.Series:
            M = np.vstack(v.to_numpy()).astype(np.float64)
            d = (M * M).sum(1)[:, None] - 2.0 * (M @ C.T) + c_sq
            return pd.Series(d.argmin(1).astype(np.int32))

        return df.withColumn(out, nearest(F.col(vec_col)))

    p = min(n_probe, len(C))

    @pandas_udf("array<int>")
    def probes(v: pd.Series) -> pd.Series:
        M = np.vstack(v.to_numpy()).astype(np.float64)
        d = (M * M).sum(1)[:, None] - 2.0 * (M @ C.T) + c_sq
        idx = np.argsort(d, axis=1, kind="stable")[:, :p]
        return pd.Series([row.astype(np.int32).tolist() for row in idx])

    return df.withColumn(out, probes(F.col(vec_col)))


def build_ivf_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    seed: int = 42,
    sample_rows: int = 4096,
) -> "tuple[DataFrame, list[list[float]]]":
    """Build the IVF index once: (assigned corpus with cluster + norm,
    centroid list). Persist/save the frame and reuse across queries —
    ``save_ivf_index`` materializes it partitioned by cluster so a probe
    touches only its posting lists' files."""
    centroids = ivf_fit_centroids(corpus, id_col, vec_col, n_clusters, seed, sample_rows)
    assigned = ivf_assign(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")),
        centroids,
        "cv",
        out="cluster",
    ).withColumn("cn", _norm("cv"))
    return assigned, centroids


def save_ivf_index(
    assigned: DataFrame, path: str, centroids: "list[list[float]] | None" = None
) -> None:
    """Materialize posting lists AS the partition layout: one ``cluster=``
    directory per posting list, so a probe of p clusters reads only p
    directories (partition pruning on the cluster filter). Pass the
    centroid list to persist it alongside (``_ivf_meta.json``) — without
    it a reloaded index can answer probes only if the caller kept the
    centroids in memory; with it the index is fully self-describing, so
    new sessions (and ``update_ivf_index``) assign without re-fitting."""
    import json as _json
    import os as _os

    assigned.write.mode("overwrite").partitionBy("cluster").parquet(path)
    if centroids is not None:
        with open(_os.path.join(path, "_ivf_meta.json"), "w") as fh:
            _json.dump({"centroids": centroids}, fh)


def load_ivf_index(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def load_ivf_centroids(path: str) -> "list[list[float]]":
    """Centroids persisted by ``save_ivf_index(..., centroids=...)``."""
    import json as _json
    import os as _os

    with open(_os.path.join(path, "_ivf_meta.json")) as fh:
        return _json.load(fh)["centroids"]


def update_ivf_index(
    spark,
    new_vecs: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Incrementally add vectors to a persisted IVF index: assign against
    the STORED centroids (one Arrow matmul — the corpus is never
    re-labeled, mirroring ``dedup_index.update_minhash_index``) and append
    to the ``cluster=`` posting-list partitions. Centroids are frozen —
    standard IVF practice; re-fit + rebuild when the vector distribution
    drifts enough that recall degrades. Returns rows added."""
    centroids = load_ivf_centroids(path)
    assigned = ivf_assign(
        new_vecs.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")),
        centroids,
        "cv",
        out="cluster",
    ).withColumn("cn", _norm("cv"))
    assigned.write.mode("append").partitionBy("cluster").parquet(path)
    return new_vecs.count()


def query_ivf_index(
    spark,
    queries: DataFrame,
    path: str,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
) -> DataFrame:
    """Top-k against a persisted self-describing index: loads the
    assignment (partition-pruned to the probed clusters by the join
    filter) and the stored centroids; no re-fit, no corpus re-label."""
    return ivf_topk(
        None,
        queries,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        n_probe=n_probe,
        index=(load_ivf_index(spark, path), load_ivf_centroids(path)),
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    index: "tuple[DataFrame, list[list[float]]] | None" = None,
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) posting lists.

    Centroids come from a driver-side numpy fit on a deterministic sample
    (``ivf_fit_centroids``); corpus rows are labeled with their nearest
    centroid by a vectorized pandas UDF (one matmul per Arrow batch);
    queries probe their ``n_probe`` nearest centroids the same way (no
    driver-side iteration anywhere). Exact cosine re-rank runs only inside
    probed posting lists. Pass ``index=(assigned, centroids)`` (from
    ``build_ivf_index`` / ``load_ivf_index``) to reuse a persisted
    assignment instead of re-labeling the corpus per call; with a saved
    index the cluster join prunes to the probed ``cluster=`` partitions.
    """
    if index is None:
        # Inline-fit path (r13 fused): the whole approx leg — corpus
        # cluster assignment, probe-set membership, and the cosine
        # re-rank — runs as ONE Arrow stage over ONE corpus scan. The
        # old shape ran THREE Python-UDF stages (corpus assign, query
        # assign, pair re-rank) plus a broadcast join for the same
        # result; on a KB-sized corpus the per-stage worker round trips
        # dominated the query (q43 bench medians carried their tails).
        # Queries are collected driver-side (the cosine_topk
        # batched-query contract) and their probe lists computed with
        # exactly ivf_assign's float math; per-pair cosines use exactly
        # _pair_cosine_udf's row-wise einsum ops, so the emitted values
        # are bit-identical to the index path's and the persisted-index
        # roundtrip (direct ≡ via-index rows) keeps holding. Every
        # candidate pair is emitted (no partial cut) — the window below
        # sees exactly the rows the posting-list join used to ship.
        centroids = ivf_fit_centroids(corpus, id_col, vec_col, n_clusters, seed)
        C = np.asarray(centroids, dtype=np.float64)
        c_sq = (C * C).sum(1)[None, :]
        qrows = queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        ).collect()
        id_type = dict(corpus.dtypes)[id_col]
        out_schema = (
            f"query_id {id_type}, neighbor_id {id_type}, _rawcos double"
        )
        if not qrows:
            empty = corpus.sparkSession.createDataFrame([], out_schema)
            return empty.select(
                "query_id",
                "neighbor_id",
                F.col("_rawcos").alias("cosine"),
                F.lit(1).alias("rk"),
            ).limit(0)
        qids = [r["query_id"] for r in qrows]
        Q = np.asarray([r["qv"] for r in qrows], dtype=np.float64)
        d_q = (Q * Q).sum(1)[:, None] - 2.0 * (Q @ C.T) + c_sq
        p = min(n_probe, len(C))
        probe_sets = [
            row.astype(np.int64)
            for row in np.argsort(d_q, axis=1, kind="stable")[:, :p]
        ]

        def scan(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                ids = pdf["neighbor_id"].to_numpy()
                M = np.vstack(pdf["cv"].to_numpy()).astype(np.float64)
                d = (M * M).sum(1)[:, None] - 2.0 * (M @ C.T) + c_sq
                cl = d.argmin(1)
                res = {"query_id": [], "neighbor_id": [], "_rawcos": []}
                for qi in range(len(qids)):
                    sel = np.isin(cl, probe_sets[qi])
                    if not sel.any():
                        continue
                    B = M[sel]
                    A = np.broadcast_to(Q[qi], B.shape)
                    with np.errstate(divide="ignore", invalid="ignore"):
                        cos = np.einsum("ij,ij->i", A, B) / (
                            np.linalg.norm(A, axis=1)
                            * np.linalg.norm(B, axis=1)
                        )
                    res["query_id"].extend([qids[qi]] * len(cos))
                    res["neighbor_id"].extend(ids[sel])
                    res["_rawcos"].extend(cos)
                yield pd.DataFrame(res)

        # parallelize_scan: a single-file corpus otherwise runs the whole
        # fused kernel on one task (the batch-3 spread discipline).
        cands = (
            parallelize_scan(corpus)
            .select(
                F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
            )
            .mapInPandas(scan, schema=out_schema)
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .withColumn("cosine", F.round(F.col("_rawcos"), 6))
            .withColumn(
                "rk",
                F.row_number().over(
                    Window.partitionBy("query_id").orderBy(
                        F.desc("cosine"), F.asc("neighbor_id")
                    )
                ),
            )
        )
        return cands.filter(F.col("rk") <= k).select(
            "query_id", "neighbor_id", "cosine", "rk"
        )

    assigned, centroids = index
    q = ivf_assign(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
        centroids,
        "qv",
        out="probe_list",
        n_probe=n_probe,
    )
    q = q.withColumn("cluster", F.explode("probe_list")).drop("probe_list")

    joined = assigned.join(F.broadcast(q), "cluster").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    cos = _pair_cosine_udf()(F.col("cv"), F.col("qv"))
    ranked = (
        joined.withColumn("cosine", F.round(cos, 6))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
            ),
        )
    )
    return ranked.filter(F.col("rk") <= k).select("query_id", "neighbor_id", "cosine", "rk")


def _lsh_bucketed(
    df: DataFrame,
    vec: str,
    n_planes: int,
    n_tables: int,
    dim: int,
    seed: int,
    probe: bool,
) -> DataFrame:
    """(tbl, bucket) rows for every input row: all L table buckets in ONE
    Arrow matmul per batch over ONE scan, then posexplode. ``probe=True``
    additionally 1-bit-multiprobes each bucket (query side). Shared by
    the one-shot ``lsh_topk`` and the persisted LSH index — both sides
    must bucket identically or probes never collide."""
    from pyspark.sql.functions import pandas_udf

    # (L·b, d) plane matrix, captured by the UDF closure (small, shipped
    # once per worker). Bit i of table t's bucket = sign of plane (t, i).
    P = np.asarray(
        [
            plane
            for t in range(n_tables)
            for plane in hyperplanes(dim, n_planes, seed + 1000 * t)
        ],
        dtype=np.float64,
    )
    bit_weights = (1 << np.arange(n_planes, dtype=np.int64))[None, None, :]

    @pandas_udf("array<long>")
    def all_table_buckets(v: pd.Series) -> pd.Series:
        M = np.vstack(v.to_numpy()).astype(np.float64)
        bits = (M @ P.T >= 0).reshape(len(M), n_tables, n_planes)
        vals = (bits * bit_weights).sum(axis=2)
        return pd.Series([row.tolist() for row in vals])

    out = df.withColumn("_bkts", all_table_buckets(F.col(vec))).select(
        "*", F.posexplode("_bkts").alias("tbl", "bucket")
    ).drop("_bkts")
    if probe:
        probes = F.array(
            F.col("bucket"),
            *[F.expr(f"bucket ^ shiftleft(1L, {i})") for i in range(n_planes)],
        )
        out = out.withColumn("bucket", F.explode(probes))
    return out


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
    inside candidate buckets. All L×b plane dots are ONE Arrow-batched
    matmul per batch (a vectorized pandas UDF): the previous formulation —
    L·b literal-array ``aggregate``/``zip_with`` folds per row — was
    interpreter-bound and ~4× slower at sf0.1.
    """
    # r13 fused one-shot path: bucketing BOTH sides, the (tbl, bucket)
    # join, the dropDuplicates exchange, and the pair re-rank collapse
    # into ONE Arrow stage over ONE corpus scan. Queries are collected
    # driver-side (the cosine_topk batched-query contract) and their
    # per-table (multiprobe) bucket sets computed with exactly
    # _lsh_bucketed's plane matmul + XOR math; a corpus row is a
    # candidate for a query iff ANY table's bucket lands in that query's
    # probe set — the same pair set the join+dropDuplicates produced,
    # each pair scored once with exactly _pair_cosine_udf's row-wise
    # einsum ops, so the persisted-index path (save_lsh_index /
    # query_lsh_index, which keeps the join shape) reproduces these rows
    # bit-for-bit. The old shape ran 2 Python-UDF stages + a broadcast
    # join + a dedup exchange for the same result.
    P = np.asarray(
        [
            plane
            for t in range(n_tables)
            for plane in hyperplanes(dim, n_planes, seed + 1000 * t)
        ],
        dtype=np.float64,
    )
    bit_w = (1 << np.arange(n_planes, dtype=np.int64))[None, None, :]
    qrows = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).collect()
    id_type = dict(corpus.dtypes)[id_col]
    out_schema = f"query_id {id_type}, neighbor_id {id_type}, _rawcos double"
    if not qrows:
        empty = corpus.sparkSession.createDataFrame([], out_schema)
        return empty.select(
            "query_id",
            "neighbor_id",
            F.col("_rawcos").alias("cosine"),
            F.lit(1).alias("rk"),
        ).limit(0)
    qids = [r["query_id"] for r in qrows]
    Q = np.asarray([r["qv"] for r in qrows], dtype=np.float64)
    q_bits = (Q @ P.T >= 0).reshape(len(Q), n_tables, n_planes)
    q_vals = (q_bits * bit_w).sum(axis=2)  # (nq, L) int64
    if multiprobe:
        flips = (1 << np.arange(n_planes, dtype=np.int64))
        # (nq, L, 1+b): the bucket itself plus every 1-bit probe
        q_probes = np.concatenate(
            [q_vals[:, :, None], q_vals[:, :, None] ^ flips[None, None, :]],
            axis=2,
        )
    else:
        q_probes = q_vals[:, :, None]

    def scan(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["neighbor_id"].to_numpy()
            M = np.vstack(pdf["cv"].to_numpy()).astype(np.float64)
            bits = (M @ P.T >= 0).reshape(len(M), n_tables, n_planes)
            c_vals = (bits * bit_w).sum(axis=2)  # (n, L)
            res = {"query_id": [], "neighbor_id": [], "_rawcos": []}
            for qi in range(len(qids)):
                mask = np.zeros(len(M), dtype=bool)
                for t in range(n_tables):
                    mask |= np.isin(c_vals[:, t], q_probes[qi, t])
                if not mask.any():
                    continue
                B = M[mask]
                A = np.broadcast_to(Q[qi], B.shape)
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = np.einsum("ij,ij->i", A, B) / (
                        np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
                    )
                res["query_id"].extend([qids[qi]] * len(cos))
                res["neighbor_id"].extend(ids[mask])
                res["_rawcos"].extend(cos)
            yield pd.DataFrame(res)

    # A single-file corpus would run the fused kernel on ONE task —
    # spread it first (no-op when the scan is already parallel).
    cands = (
        parallelize_scan(corpus)
        .select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
        .mapInPandas(scan, schema=out_schema)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.round(F.col("_rawcos"), 6))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("cosine"), F.asc("neighbor_id")
                )
            ),
        )
    )
    return cands.filter(F.col("rk") <= k).select(
        "query_id", "neighbor_id", "cosine", "rk"
    )


def save_lsh_index(
    spark,
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> None:
    """Persist the multi-table LSH bucketing of a corpus: one ``tbl=``
    hive partition per table, range-sorted on ``bucket`` within, so a
    probe's (tbl, bucket) equi-join prunes partitions and file-skips on
    bucket min/max. LSH parameters land in ``_lsh_meta.json`` — the index
    is self-describing, like the IVF and MinHash indexes."""
    import json as _json
    import os as _os

    c = _lsh_bucketed(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")),
        "cv",
        n_planes,
        n_tables,
        dim,
        seed,
        probe=False,
    ).withColumn("cn", _norm("cv"))
    (
        c.repartitionByRange(n_tables, "tbl", "bucket")
        .sortWithinPartitions("bucket")
        .write.mode("overwrite")
        .partitionBy("tbl")
        .parquet(path)
    )
    with open(_os.path.join(path, "_lsh_meta.json"), "w") as fh:
        _json.dump(
            {"n_planes": n_planes, "n_tables": n_tables, "dim": dim, "seed": seed},
            fh,
        )


def _load_lsh_meta(path: str) -> dict:
    import json as _json
    import os as _os

    with open(_os.path.join(path, "_lsh_meta.json")) as fh:
        return _json.load(fh)


def update_lsh_index(
    spark,
    new_vecs: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Append new vectors bucketed with the STORED parameters — the
    existing index is never re-hashed (O(batch) per add, mirroring the
    MinHash/IVF incremental paths). Returns rows added."""
    m = _load_lsh_meta(path)
    c = _lsh_bucketed(
        new_vecs.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")),
        "cv",
        m["n_planes"],
        m["n_tables"],
        m["dim"],
        m["seed"],
        probe=False,
    ).withColumn("cn", _norm("cv"))
    (
        c.repartitionByRange(max(2, m["n_tables"] // 2), "tbl", "bucket")
        .sortWithinPartitions("bucket")
        .write.mode("append")
        .partitionBy("tbl")
        .parquet(path)
    )
    return new_vecs.count()


def query_lsh_index(
    spark,
    queries: DataFrame,
    path: str,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: bool = True,
) -> DataFrame:
    """Top-k against a persisted LSH index: queries are bucketed with the
    stored parameters (broadcast), the (tbl, bucket) join streams the
    index scan, exact cosine re-ranks only candidate pairs."""
    m = _load_lsh_meta(path)
    c = spark.read.parquet(path)
    q = _lsh_bucketed(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
        "qv",
        m["n_planes"],
        m["n_tables"],
        m["dim"],
        m["seed"],
        probe=multiprobe,
    )
    joined = c.join(F.broadcast(q), ["tbl", "bucket"]).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    cos = _pair_cosine_udf()(F.col("cv"), F.col("qv"))
    ranked = (
        joined.select("query_id", "neighbor_id", "cv", "qv")
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cosine", F.round(cos, 6))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("cosine"), F.asc("neighbor_id")
                )
            ),
        )
    )
    return ranked.filter(F.col("rk") <= k).select(
        "query_id", "neighbor_id", "cosine", "rk"
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the ANN memory tier
# ---------------------------------------------------------------------------
#
# At 100 TB the embedding column itself is the cost: 64-dim float32 is
# 256 B/row; PQ with m=8 subspaces × 256 codes stores 8 B/row (32×) and
# scans candidates without touching the vectors at all (ADC: per-query
# lookup tables over code bytes — one numpy gather per Arrow batch).
# This is the faiss IVF-PQ discipline re-expressed Spark-first: codebooks
# fit driver-side on the same deterministic sample as the IVF centroids,
# encoding is one vectorized pandas UDF, the ADC scan is mapInPandas with
# PER-BATCH partial top-k (the shuffle carries batches×Q×k candidate
# rows, never the corpus), and an optional exact re-rank joins true
# vectors back for only the top rerank_factor·k candidates per query.


def _lloyd(X, k: int, seed: int, max_iter: int = 20):
    """Lloyd's k-means on a driver-side sample (numpy); the kernel behind
    both the IVF centroid fit and the per-subspace PQ codebook fit."""
    rng = np.random.RandomState(seed)
    n = len(X)
    k = min(k, n)
    C = X[rng.choice(n, k, replace=False)]
    for _ in range(max_iter):
        d = (X * X).sum(1)[:, None] - 2.0 * (X @ C.T) + (C * C).sum(1)[None, :]
        a = d.argmin(1)
        newC = C.copy()
        for j in range(k):
            members = X[a == j]
            if len(members):
                newC[j] = members.mean(0)
        if np.allclose(newC, C):
            break
        C = newC
    return C


def pq_fit_codebooks(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    n_codes: int = 256,
    seed: int = 42,
    sample_rows: int = 4096,
    max_iter: int = 20,
) -> "list[list[list[float]]]":
    """Fit per-subspace codebooks on a deterministic sample: the vector
    is split into ``m`` contiguous subvectors and each subspace gets its
    own ``n_codes``-entry k-means codebook (independent quantizers — the
    product in "product quantization"). ``n_codes`` ≤ 256 so a code is
    one byte per subspace. Returns m × n_codes × (d/m) floats —
    JSON-serializable, persist beside the encoded corpus."""
    if n_codes > 256:
        raise ValueError("n_codes must be ≤ 256 (one byte per subspace)")
    rows = (
        corpus.select(
            F.col(vec_col).alias("v"), F.xxhash64(F.col(id_col)).alias("h")
        )
        .orderBy("h")
        .limit(sample_rows)
        .collect()
    )
    X = np.asarray([r["v"] for r in rows], dtype=np.float64)
    d = X.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} is not divisible by m={m} subspaces")
    sub = d // m
    books = []
    for j in range(m):
        Xj = X[:, j * sub : (j + 1) * sub]
        books.append(_lloyd(Xj, n_codes, seed + j, max_iter).tolist())
    return books


def pq_encode(
    df: DataFrame,
    codebooks: "list[list[list[float]]]",
    vec_col: str = "embedding",
    out: str = "pq_code",
) -> DataFrame:
    """Encode vectors to ``m`` one-byte codes (a ``binary`` column): per
    Arrow batch, one matmul per subspace picks the nearest codebook
    entry. The encoded corpus drops the float vectors entirely for the
    candidate scan."""
    from pyspark.sql.functions import pandas_udf

    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    sub = books[0].shape[1]
    m = len(books)

    @pandas_udf("binary")
    def enc(v: pd.Series) -> pd.Series:
        M = np.vstack(v.to_numpy()).astype(np.float64)
        codes = np.empty((len(M), m), dtype=np.uint8)
        for j, C in enumerate(books):
            Xj = M[:, j * sub : (j + 1) * sub]
            dist = (
                (Xj * Xj).sum(1)[:, None]
                - 2.0 * (Xj @ C.T)
                + (C * C).sum(1)[None, :]
            )
            codes[:, j] = dist.argmin(1).astype(np.uint8)
        return pd.Series([c.tobytes() for c in codes])

    return df.withColumn(out, enc(F.col(vec_col)))


def pq_decode(
    df: DataFrame,
    codebooks: "list[list[list[float]]]",
    code_col: str = "pq_code",
    out: str = "embedding_approx",
) -> DataFrame:
    """Reconstruct the quantized approximation (codebook entry per
    subspace, concatenated) — the decode leg of the round-trip tests and
    of any consumer that can live with quantization error."""
    from pyspark.sql.functions import pandas_udf

    books = [np.asarray(b, dtype=np.float64) for b in codebooks]

    @pandas_udf("array<double>")
    def dec(c: pd.Series) -> pd.Series:
        outv = []
        for raw in c:
            codes = np.frombuffer(raw, dtype=np.uint8)
            outv.append(
                np.concatenate(
                    [books[j][codes[j]] for j in range(len(books))]
                ).tolist()
            )
        return pd.Series(outv)

    return df.withColumn(out, dec(F.col(code_col)))


def pq_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: "list[list[list[float]]]",
    k: int = 3,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    vec_col: str = "embedding",
    rerank: DataFrame | None = None,
    rerank_factor: int = 4,
) -> DataFrame:
    """Approximate top-k by asymmetric distance (ADC): each query builds
    an m × n_codes lookup table of squared subvector distances once, and
    a corpus row's distance is m byte-indexed gathers + a sum — the scan
    never touches a float vector. Queries are bounded and broadcast (the
    ``cosine_topk`` contract); the corpus codes stream through
    ``mapInPandas`` emitting a PER-BATCH top-k per query, so the shuffle
    carries candidates, not the corpus.

    Without ``rerank``: returns (query_id, neighbor_id, adc_dist, rk)
    ranked by quantized L2 distance. With ``rerank`` = a (id, vector)
    frame: the top ``rerank_factor·k`` ADC candidates per query join
    their TRUE vectors back for an exact cosine re-rank and the output
    matches ``cosine_topk``'s shape — the standard two-stage IVF-PQ read
    path (coarse bytes → exact on a few)."""
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    sub = books[0].shape[1]
    n_codes = books[0].shape[0]

    qrows = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).collect()
    if not qrows:
        raise ValueError("pq_topk needs at least one query vector")
    qids = [r["query_id"] for r in qrows]
    Q = np.asarray([r["qv"] for r in qrows], dtype=np.float64)
    # LUT[q, j, c] = ||q_sub_j - codebook_j[c]||^2
    lut = np.empty((len(qids), m, n_codes), dtype=np.float64)
    for j, C in enumerate(books):
        Qj = Q[:, j * sub : (j + 1) * sub]
        lut[:, j, :] = (
            (Qj * Qj).sum(1)[:, None]
            - 2.0 * (Qj @ C.T)
            + (C * C).sum(1)[None, :]
        )

    take = max(k * (rerank_factor if rerank is not None else 1), k)
    id_type = dict(codes.dtypes)[id_col]
    out_schema = (
        f"query_id {id_type}, neighbor_id {id_type}, adc_dist double"
    )
    qid_arr = np.asarray(qids)

    def scan(batches):
        j_idx = np.arange(m)[None, :]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            raw = pdf[code_col].to_numpy()
            Cm = np.frombuffer(b"".join(raw), dtype=np.uint8).reshape(
                len(raw), m
            )
            # dists[q, row] = Σ_j lut[q, j, code[row, j]] — fancy-index
            # axes (1, 2) with (1, m) and (B, m) broadcast → (Q, B, m)
            dists = lut[:, j_idx, Cm].sum(2)
            # take+1: a query that is ITSELF a corpus row sits at ADC
            # distance ~0 in exactly one batch and is filtered out after
            # the scan — without the spare slot it would evict the true
            # take-th neighbor of that batch
            top = min(take + 1, len(ids))
            part = np.argpartition(dists, top - 1, axis=1)[:, :top]
            res = {"query_id": [], "neighbor_id": [], "adc_dist": []}
            for qi in range(len(qid_arr)):
                sel = part[qi]
                res["query_id"].extend([qid_arr[qi]] * len(sel))
                res["neighbor_id"].extend(ids[sel])
                res["adc_dist"].extend(dists[qi, sel])
            yield pd.DataFrame(res)

    cands = (
        codes.select(id_col, code_col)
        .mapInPandas(scan, schema=out_schema)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.asc("adc_dist"), F.asc("neighbor_id")
                )
            ),
        )
        .filter(F.col("rk") <= take)
    )
    if rerank is None:
        return cands.filter(F.col("rk") <= k).withColumn(
            "adc_dist", F.round(F.col("adc_dist"), 6)
        )

    true_vecs = rerank.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    joined = (
        cands.select("query_id", "neighbor_id")
        .join(true_vecs, "neighbor_id")
        .join(F.broadcast(q), "query_id")
    )
    cos = _pair_cosine_udf()(F.col("cv"), F.col("qv"))
    ranked = joined.withColumn("cosine", F.round(cos, 6)).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.desc("cosine"), F.asc("neighbor_id")
            )
        ),
    )
    return ranked.filter(F.col("rk") <= k).select(
        "query_id", "neighbor_id", "cosine", "rk"
    )


def build_ivf_pq_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    m: int = 8,
    n_codes: int = 256,
    seed: int = 42,
    sample_rows: int = 4096,
) -> dict:
    """The composed memory-tier index: IVF posting lists (``cluster=``
    partition dirs — a probe reads only its directories) holding PQ BYTE
    CODES instead of vectors. Self-describing: centroids + codebooks
    persist in ``_ivf_pq_meta.json``, so new sessions query without any
    refit and without the original corpus. The stored rows are
    (neighbor_id, pq_code, cluster) — for a 64-dim float corpus that is
    ~8 B of payload per vector where the plain IVF index stores 512 B."""
    import json as _json
    import os as _os

    centroids = ivf_fit_centroids(
        corpus, id_col, vec_col, n_clusters, seed, sample_rows
    )
    codebooks = pq_fit_codebooks(
        corpus, id_col, vec_col, m=m, n_codes=n_codes, seed=seed,
        sample_rows=sample_rows,
    )
    assigned = ivf_assign(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
        ),
        centroids,
        "cv",
        out="cluster",
    )
    coded = pq_encode(assigned, codebooks, vec_col="cv").select(
        "neighbor_id", "pq_code", "cluster"
    )
    coded.write.mode("overwrite").partitionBy("cluster").parquet(path)
    with open(_os.path.join(path, "_ivf_pq_meta.json"), "w") as fh:
        _json.dump({"centroids": centroids, "codebooks": codebooks}, fh)
    return {"clusters": len(centroids), "m": m, "n_codes": n_codes}


def query_ivf_pq_index(
    spark,
    queries: DataFrame,
    path: str,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
    rerank: DataFrame | None = None,
    rerank_factor: int = 4,
) -> DataFrame:
    """Two-stage read over a persisted IVF-PQ index: the query batch's
    probed clusters prune the scan to their ``cluster=`` partitions
    (union over the batch — a query may thus see another query's probed
    cluster, a candidate SUPERSET, never fewer), then the ADC byte scan
    (``pq_topk``) ranks within them; pass ``rerank`` = the original
    (id, vector) frame for the exact-cosine final stage."""
    import json as _json
    import os as _os

    with open(_os.path.join(path, "_ivf_pq_meta.json")) as fh:
        meta = _json.load(fh)
    centroids, codebooks = meta["centroids"], meta["codebooks"]
    q = ivf_assign(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
        ),
        centroids,
        "qv",
        out="probe_list",
        n_probe=n_probe,
    )
    probed = sorted(
        {c for r in q.select("probe_list").collect() for c in r["probe_list"]}
    )
    from presencia_etl_spark.functions.pushdown import in_list

    codes = (
        spark.read.parquet(path)
        .filter(in_list("cluster", probed))
        .select(F.col("neighbor_id").alias(id_col), "pq_code")
    )
    return pq_topk(
        codes,
        queries,
        codebooks,
        k=k,
        id_col=id_col,
        code_col="pq_code",
        vec_col=vec_col,
        rerank=rerank,
        rerank_factor=rerank_factor,
    )

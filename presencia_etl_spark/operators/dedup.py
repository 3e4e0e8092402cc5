"""Deduplication operators for training-data pipelines.

None exist in the reference (its closest relative is the CDC hash-compare,
``sync_INCREMENTAL.py:169-176``, which is exact row-identity detection);
these are the 100 TB extensions (SURVEY §7.2 M6), all expressed with
JVM-side higher-order functions — no Python UDFs, no driver collection:

- exact:     hash-groupBy (one shuffle of (hash, id), not of documents)
- MinHash:   char-shingles → per-seed min-hash → banded LSH → bucket join
- SimHash:   token-hash sign aggregation → 64-bit signature, hamming dist
- n-gram Jaccard: exact set overlap for candidate verification

Scale notes: the LSH band join shuffles only (band_id, band_hash, doc_id)
triples — tiny vs the corpus. Bucket skew (a degenerate band value hitting
millions of docs) is handled by AQE skew-join splitting plus an optional
bucket-size cap. Signatures are recomputable, so nothing is driver-side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from presencia_etl_spark.functions.partitioning import parallelize_scan


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Keep one row per distinct value of ``cols`` (hash-based groupBy under
    the hood — Spark plans dropDuplicates as a partial+final hash aggregate,
    so only one shuffle and map-side combining).

    NOTE: which row survives is ARBITRARY (partition-order dependent). Use
    ``exact_dedup_keep_first`` when survivors must be reproducible.
    """
    return df.dropDuplicates(cols) if cols else df.dropDuplicates()


def exact_dedup_keep_first(
    df: DataFrame, dup_cols: list[str], order_cols: list[str]
) -> DataFrame:
    """Deterministic exact dedup: keep the first row per ``dup_cols`` group
    ordered by ``order_cols`` (e.g. keep the lowest doc_id). One shuffle
    (window partition); survivors are stable run-to-run, which matters for
    reproducible training corpora."""
    from pyspark.sql import Window

    w = Window.partitionBy(*dup_cols).orderBy(*[F.col(c) for c in order_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def duplicate_groups(df: DataFrame, cols: list[str]) -> DataFrame:
    """(value-hash, count) for groups appearing more than once."""
    h = F.md5(F.concat_ws("\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols]))
    return (
        df.groupBy(h.alias("group_hash"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
    )


# ---------------------------------------------------------------------------
# MinHash + banded LSH
# ---------------------------------------------------------------------------

def char_shingles(text_col: str, k: int = 5) -> F.Column:
    """Distinct character k-grams of a text column, as an array<string>.

    Dynamic-start substring needs the SQL higher-order form (F.substring
    takes literal positions only).
    """
    return F.expr(
        f"array_distinct(transform(sequence(1, greatest(length({text_col}) - {k} + 1, 1)),"
        f" i -> substring({text_col}, i, {k})))"
    )


def minhash_signature(shingles_col: str, n_hashes: int = 32) -> F.Column:
    """MinHash signature as array<bigint>, one pass over the shingles.

    Each shingle string is hashed ONCE (the fold input); the n_hashes
    families re-hash that 64-bit value with the family index via
    ``xxhash64(h, i)`` — JVM-native long hashing, properly independent
    across families (an affine ``(a·h+b) mod M`` family is NOT usable
    here: with a·h+b < 2M the mod barely wraps, the map stays monotonic
    in h, and every family elects the same argmin shingle). Cost per doc:
    |S| string hashes + n·|S| long hashes, all inside codegen.
    """
    max_l = (1 << 62) - 1
    return F.expr(
        f"aggregate("
        f"  transform({shingles_col}, s -> xxhash64(s)),"
        f"  transform(sequence(0, {n_hashes - 1}), i -> {max_l}L),"
        f"  (acc, h) -> zip_with(acc, sequence(0, {n_hashes - 1}),"
        f"    (m, i) -> least(m, xxhash64(h, i))))"
    )


# --- exact numpy replica of Spark's XXH64 (catalyst XxHash64) ---------------
_XXH_P1 = np.uint64(0x9E3779B185EBCA87)
_XXH_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_XXH_P3 = np.uint64(0x165667B19E3779F9)
_XXH_P4 = np.uint64(0x85EBCA77C2B2AE63)
_XXH_P5 = np.uint64(0x27D4EB2F165667C5)


def _rotl64(x: "np.ndarray", r: int) -> "np.ndarray":
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _xxh_fmix(acc: "np.ndarray") -> "np.ndarray":
    acc = acc ^ (acc >> np.uint64(33))
    acc = acc * _XXH_P2
    acc = acc ^ (acc >> np.uint64(29))
    acc = acc * _XXH_P3
    return acc ^ (acc >> np.uint64(32))


def xxh64_long(value: "np.ndarray", seed) -> "np.ndarray":
    """Spark ``XXH64.hashLong`` vectorized (wrapping uint64 arithmetic) —
    bit-identical to the SQL ``xxhash64(<bigint>)`` chain step."""
    with np.errstate(over="ignore"):
        acc = seed + _XXH_P5 + np.uint64(8)
        acc = acc ^ (_rotl64(value * _XXH_P2, 31) * _XXH_P1)
        acc = _rotl64(acc, 27) * _XXH_P1 + _XXH_P4
        return _xxh_fmix(acc)


def xxh64_int(value: "np.ndarray", seed) -> "np.ndarray":
    """Spark ``XXH64.hashInt`` vectorized — the chain step SQL uses for an
    IntegerType argument (e.g. a ``sequence()`` index)."""
    with np.errstate(over="ignore"):
        acc = seed + _XXH_P5 + np.uint64(4)
        acc = acc ^ ((value & np.uint64(0xFFFFFFFF)) * _XXH_P1)
        acc = _rotl64(acc, 23) * _XXH_P2 + _XXH_P3
        return _xxh_fmix(acc)


def minhash_signature_arrow(
    df: DataFrame,
    shingles_col: str,
    n_hashes: int = 32,
    out: str = "sig",
) -> DataFrame:
    """Hybrid MinHash: shingles are hashed ONCE each JVM-side (xxhash64),
    then the ``n_hashes`` per-family minima run vectorized in numpy via a
    pandas UDF — one (|S| × n) hash + min per doc instead of |S|·n
    interpreted ``zip_with`` steps (the SQL fold in ``minhash_signature``
    was the q28 bottleneck: ~5 s for 5k docs vs well under 1 s here).

    The family is EXACTLY the SQL path's ``xxhash64(h, i)`` — Spark's
    chained XXH64 (hashInt(i, hashLong(h, 42))) replicated in wrapping
    uint64 numpy, signed-min folded with the same ``(1<<62)-1`` sentinel —
    so both paths produce bit-identical signatures (parity-tested). A
    first attempt used a splitmix64 XOR-seed family; its cross-seed
    correlations inflated est_jaccard ~2.5× on real corpora — min-wise
    family quality is NOT a given, reuse the proven one.
    """
    from pyspark.sql.functions import pandas_udf

    max_l = (1 << 62) - 1
    idx = np.arange(n_hashes, dtype=np.uint64)[None, :]
    seed42 = np.uint64(42)
    empty_sig = [max_l] * n_hashes

    @pandas_udf("array<long>")
    def sigs(th: pd.Series) -> pd.Series:
        res = []
        for hs in th.to_numpy():
            if hs is None or len(hs) == 0:
                res.append(empty_sig)
                continue
            H = np.asarray(hs, dtype=np.int64).view(np.uint64)
            base = xxh64_long(H, seed42)[:, None]  # (m, 1)
            fam = xxh64_int(idx, base).view(np.int64)  # (m, n) signed
            mins = np.minimum(fam.min(axis=0), max_l)
            res.append(mins.tolist())
        return pd.Series(res)

    hashed = df.withColumn(
        "_th", F.expr(f"transform({shingles_col}, s -> xxhash64(s))")
    )
    return hashed.withColumn(out, sigs(F.col("_th"))).drop("_th")


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    n_hashes: int = 32,
    use_arrow: bool = True,
) -> DataFrame:
    """(doc_id, sig) for a corpus: shingling + MinHash in one scan.
    Shared front half of ``minhash_lsh_candidates`` and the persisted
    ``dedup_index`` — both must produce bit-identical signatures or an
    indexed batch would never collide with historical docs."""
    shingled = parallelize_scan(df).select(
        F.col(id_col).alias("doc_id"),
        char_shingles(text_col, k).alias("shingles"),
    )
    if use_arrow:
        return minhash_signature_arrow(shingled, "shingles", n_hashes).drop("shingles")
    return shingled.withColumn(
        "sig", minhash_signature("shingles", n_hashes)
    ).drop("shingles")


def band_array(n_hashes: int, bands: int):
    """The per-doc LSH band array — ``band_rows``'s transform WITHOUT the
    explode: array<struct<band_id,band_hash>> over a ``sig`` column. The
    shape a trickle-batch admit collects to the driver in one narrow,
    shuffle-free job (``dedup_index.admit_batch``). MUST stay expression-
    identical to ``band_rows`` or an admitted doc's collected bands would
    differ from its probed bands."""
    rows_per_band = n_hashes // bands
    return F.expr(
        f"transform(sequence(0, {bands - 1}),"
        f" b -> named_struct('band_id', b,"
        f" 'band_hash', xxhash64(array_join(slice(sig, b * {rows_per_band} + 1,"
        f" {rows_per_band}), ','))))"
    )


def band_rows(sig: DataFrame, n_hashes: int, bands: int) -> DataFrame:
    """Explode a (doc_id, sig) frame into narrow (band_id, band_hash, doc_id)
    LSH rows — the ONLY shape that moves through dedup shuffles and the
    on-disk layout of the persisted index (``dedup_index``). One xxhash64
    per band over the joined signature slice; everything stays in codegen.
    """
    return sig.select(
        "doc_id",
        F.explode(band_array(n_hashes, bands)).alias("band"),
    ).select(
        F.col("band.band_id").alias("band_id"),
        F.col("band.band_hash").alias("band_hash"),
        "doc_id",
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    n_hashes: int = 32,
    bands: int = 8,
    max_bucket: int = 1000,
    use_arrow: bool = True,
    eager: bool = True,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash LSH.

    Returns (id_a, id_b, est_jaccard) with id_a < id_b; est_jaccard is the
    fraction of matching signature positions. Pairs sharing ≥1 band bucket
    are candidates. ``max_bucket`` drops degenerate buckets (e.g. empty
    docs) that would explode quadratically.

    ``eager=True`` (default) materializes the (tiny) signature frame with
    ``localCheckpoint`` before fan-out — every downstream stage then reads
    the materialized partitions instead of racing to fill a lazy cache
    (r13: under AQE the window/join/broadcast stages of this pipeline
    materialize CONCURRENTLY, and each cache-missed and recomputed the
    full shingle+MinHash pass — 4 overlapping 0.6 s signature jobs for
    one corpus at sf0.1) — and snapshots the (narrow) pair list so no
    lineage survives the call. Pass ``eager=False`` to keep the fully
    lazy plan — the signature frame stays persisted and the CALLER owns
    releasing it (``spark.catalog.clearCache()`` or session teardown).
    """
    # Signatures are computed ONCE; everything that moves through the LSH
    # shuffles is NARROW (band_id, band_hash, doc_id) triples — the
    # 32-long sig arrays rejoin only for the few surviving candidate
    # pairs (Catalyst/AQE broadcasts the sig side when small; at
    # petabyte scale that final join is a sorted id join and the
    # checkpoint goes to storage).
    # Shingling + signatures are the CPU-heavy stage; make sure a
    # single-file corpus doesn't run them on one task (parallelize_scan
    # inside minhash_signatures).
    sig = minhash_signatures(df, id_col, text_col, k, n_hashes, use_arrow)
    sig = sig.localCheckpoint(eager=True) if eager else sig.persist()
    banded = band_rows(sig, n_hashes, bands)

    # ONE shuffle of the narrow triples: group each (band_id, band_hash)
    # bucket, drop degenerate buckets (> max_bucket) and singletons (no
    # pairs), and expand the id_a < id_b combinations with an in-array
    # HOF — r13, replacing a window count pass (full extra exchange +
    # sort of the triples) followed by a self-join (two more reads of the
    # shuffled triples). Bucket contents are identical to the window
    # formulation, so the produced pair set is identical; max_bucket
    # bounds the per-bucket quadratic exactly as before.
    buckets = (
        banded.groupBy("band_id", "band_hash")
        .agg(F.collect_list("doc_id").alias("_ids"))
        .filter((F.size("_ids") >= 2) & (F.size("_ids") <= max_bucket))
    )
    # array_sort bound ONCE via the transform(array(...))[0] idiom — an
    # inline array_sort inside the pair lambda would re-sort per element.
    combos = F.expr(
        "transform(array(array_sort(_ids)), a -> "
        "flatten(transform(a, (x, i) -> "
        "transform(slice(a, i + 2, size(a) - i - 1), "
        "y -> struct(x AS id_a, y AS id_b)))))[0]"
    )
    pairs = (
        buckets.select(F.explode(combos).alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    pairs = pairs.join(
        sig.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a")), "id_a"
    ).join(
        sig.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b")), "id_b"
    )
    est = F.expr(
        "aggregate(zip_with(sig_a, sig_b, (x, y) -> if(x = y, 1, 0)), 0, (acc, v) -> acc + v)"
    ) / F.lit(float(n_hashes or 1))
    out = pairs.select("id_a", "id_b", F.round(est, 4).alias("est_jaccard"))
    if eager:
        # Surviving pairs are tiny next to the corpus; snapshotting them
        # truncates the lineage (the checkpointed signature partitions
        # are released with the session's RDD GC once out is snapshot).
        out = out.localCheckpoint(eager=True)
    return out


def ngram_jaccard(
    pairs: DataFrame, docs: DataFrame, id_col: str, text_col: str, n: int = 3,
    eager: bool = False,
) -> DataFrame:
    """Exact token-n-gram Jaccard for candidate pairs (verification stage).

    ``pairs``: (id_a, id_b); ``docs``: the corpus. Two narrow joins bring in
    the n-gram sets; the set math is JVM-side array ops.

    ``eager=True`` computes the gram arrays ONCE, for only the docs that
    appear in ``pairs`` (semi-join BEFORE the expensive gram transform),
    and materializes them with ``localCheckpoint``. That is the 100 TB
    verification shape — candidates are a sliver of the corpus, so
    pre-pruning turns O(corpus) gram work into O(candidates)
    (``dedup_corpus`` passes it). It is NOT the default because when the
    pair set covers most of the corpus (dense candidate sets, the q25
    consecutive-id sweep) the checkpoint materializes nearly all gram
    arrays for no pruning benefit — measured 3× slower than the lazy
    double evaluation at sf0.1. Pick by candidate density.
    """
    base = docs
    if eager:
        ids = (
            pairs.select(F.col("id_a").alias(id_col))
            .unionByName(pairs.select(F.col("id_b").alias(id_col)))
            .distinct()
        )
        base = docs.join(ids, id_col, "left_semi")
    grams = parallelize_scan(base).select(
        F.col(id_col).alias("doc_id"),
        F.expr(
            f"array_distinct(transform(sequence(1, greatest(size(split({text_col}, '\\\\s+')) - {n} + 1, 1)),"
            f" i -> array_join(slice(split({text_col}, '\\\\s+'), i, {n}), ' ')))"
        ).alias("grams"),
    )
    if eager:
        grams = grams.localCheckpoint(eager=True)
    out = (
        pairs.join(grams.withColumnRenamed("doc_id", "id_a").withColumnRenamed("grams", "grams_a"), "id_a")
        .join(grams.withColumnRenamed("doc_id", "id_b").withColumnRenamed("grams", "grams_b"), "id_b")
    )
    inter = F.size(F.array_intersect("grams_a", "grams_b"))
    union = F.size(F.array_union("grams_a", "grams_b"))
    jac = F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(F.lit(0.0))
    return out.select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))


# ---------------------------------------------------------------------------
# Near-dup clustering (connected components) + end-to-end corpus dedup
# ---------------------------------------------------------------------------

def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Transitive closure of a near-dup pair set: (id, component) where
    component = the MINIMUM id reachable through any chain of pairs.

    Pairwise output alone under-dedups: A~B and B~C without A~C leaves two
    survivors. Each round combines min-label propagation (every node takes
    the min label among itself and its neighbors) with POINTER JUMPING
    (label ← label's label), so label distance halves per round: O(log
    diameter) rounds, not O(diameter). Every round is localCheckpoint'ed —
    iterative DataFrame algorithms otherwise accrete lineage until
    planning time dominates (on a real cluster use ``checkpoint`` to a
    reliable dir instead). The loop exits early on a zero-changes round
    (the convergence count is scalar bookkeeping, not data movement). At
    extreme scale swap for large-star/small-star (Kiveris et al.) — same
    DataFrame-only building blocks.
    """
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = (
        edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(
                labels.select(F.col("id").alias("dst"), F.col("comp").alias("dst_comp")),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("dst_comp").alias("nbr_comp"))
            .select(F.col("src").alias("id"), "nbr_comp")
        )
        stepped = labels.join(nbr_min, "id", "left").select(
            "id",
            F.least(F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))).alias("comp"),
        )
        # Pointer jump: comp ← comp's comp (halves label distance).
        ptr = stepped.select(F.col("id").alias("pid"), F.col("comp").alias("pcomp"))
        jumped = (
            stepped.join(ptr, stepped["comp"] == ptr["pid"], "left")
            .select(
                stepped["id"],
                F.least(
                    stepped["comp"], F.coalesce(ptr["pcomp"], stepped["comp"])
                ).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    return labels


def dedup_corpus(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    n_hashes: int = 32,
    bands: int = 8,
    est_threshold: float = 0.5,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """End-to-end near-dup removal: MinHash-LSH candidates → exact n-gram
    Jaccard verification → connected components → keep the minimum-id
    representative per cluster. Returns the deduplicated corpus (original
    schema). Deterministic: survivors are the same run-to-run.

    This is the composition a training-data pipeline actually runs; each
    stage is the scale-shaped operator documented above (narrow LSH
    shuffles, candidate-only verification, shallow label propagation).
    """
    cands = minhash_lsh_candidates(
        docs, id_col, text_col, k=k, n_hashes=n_hashes, bands=bands
    ).filter(F.col("est_jaccard") >= est_threshold)
    verified = ngram_jaccard(
        cands.select("id_a", "id_b"), docs, id_col, text_col, eager=True
    ).filter(F.col("jaccard") >= jaccard_threshold)
    comp = connected_components(verified)
    # Survivor per component = min id == the component label itself.
    losers = comp.filter(F.col("id") != F.col("comp")).select(
        F.col("id").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def with_simhash(df: DataFrame, id_col: str, text_col: str, use_arrow: bool = True) -> DataFrame:
    """Attach 64-bit SimHash per doc.

    Default path is hybrid: token hashing stays JVM-side (xxhash64 once per
    token), then the 64-way bit vote runs vectorized in numpy via
    ``mapInPandas`` — the bit vote is the hot loop (|tokens|·64 ops) and is
    ~10× faster as one broadcasted numpy shift than as an interpreted
    higher-order fold. ``use_arrow=False`` keeps the pure-SQL fold (same
    output bits — both tested).
    """
    hashed = parallelize_scan(df).select(
        F.col(id_col).alias("doc_id"),
        F.expr(f"transform(split({text_col}, '\\\\s+'), t -> xxhash64(t))").alias("th"),
    )
    if not use_arrow:
        return hashed.select("doc_id", _simhash_from_hashes("th").alias("simhash"))

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("simhash", T.LongType()),
        ]
    )

    def vote(batches):
        shifts = np.arange(64, dtype=np.uint64)
        for chunk in batches:
            sigs = np.empty(len(chunk), dtype=np.uint64)
            for i, toks in enumerate(chunk["th"].to_numpy()):
                h = np.asarray(toks, dtype=np.int64).astype(np.uint64)
                bits = ((h[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
                votes = (2 * bits - 1).sum(axis=0)
                # Distinct bit positions → the uint64 sum is exact.
                sigs[i] = ((votes > 0).astype(np.uint64) << shifts).sum(
                    dtype=np.uint64
                )
            yield pd.DataFrame({"doc_id": chunk["doc_id"], "simhash": sigs.view(np.int64)})

    return hashed.mapInPandas(vote, out_schema)


def _simhash_from_hashes(hashes_col: str, bits: int = 64) -> F.Column:
    """Pure-SQL bit vote over pre-hashed tokens (reference implementation
    for the Arrow path; identical output)."""
    return F.expr(
        f"aggregate("
        f"  aggregate({hashes_col},"
        f"    transform(sequence(0, {bits - 1}), x -> 0L),"
        f"    (acc, h) -> zip_with(acc, sequence(0, {bits - 1}),"
        f"      (a, b) -> a + if((shiftright(h, b) & 1) = 1, 1, -1))),"
        f"  named_struct('v', 0L, 'b', 0),"
        f"  (st, s) -> named_struct('v', st.v | if(s > 0, shiftleft(1L, st.b), 0L), 'b', st.b + 1),"
        f"  st -> st.v)"
    )


def simhash_near_pairs(
    sigs: DataFrame, max_hamming: int = 3, n_blocks: int = 4,
    eager: bool = True,
) -> DataFrame:
    """Near-pairs by hamming distance with FULL-RECALL rotated blocking.

    ``eager=True`` (default) materializes the (doc_id, simhash) input with
    ``localCheckpoint`` before the self-join: both join sides re-evaluate
    ``sigs``'s lineage otherwise, and the usual producer
    (``with_simhash``'s Arrow bit-vote over the whole corpus) is exactly
    the subtree you least want to run twice (q29 before-plan: two
    mapInPandas passes). The frame is 16 bytes/doc — cheap to pin at any
    scale. ``eager=False`` keeps the lazy plan.

    The 64 signature bits are split into ``n_blocks`` contiguous blocks;
    every signature is exploded to (block_idx, block_key) rows and the
    self-join runs per block. Pigeonhole: a pair with hamming ≤
    ``n_blocks - 1`` has at least one block with zero differing bits, so it
    collides in that block — recall is complete whenever
    ``max_hamming < n_blocks`` (the default 4×16-bit blocks cover the
    standard ≤3-bit near-dup threshold). Pairs colliding in several blocks
    are deduped on (id_a, id_b) before the hamming filter.

    Scale: shuffle is n_blocks·N narrow (block_key, id, sig) rows; each
    block's join is bucket-local in its 64/n_blocks-bit keyspace. Raising
    ``max_hamming`` needs more blocks for the guarantee → smaller keys →
    denser buckets; that trade-off is inherent to Hamming LSH.
    """
    if eager:
        sigs = sigs.localCheckpoint(eager=True)
    base, rem = divmod(64, n_blocks)
    key_structs, off = [], 0
    for i in range(n_blocks):
        w = base + (1 if i < rem else 0)
        mask = (1 << w) - 1
        key_structs.append(
            f"struct({i} as bi, shiftrightunsigned(simhash, {off}) & {mask}L as bk)"
        )
        off += w
    exploded = sigs.select(
        "doc_id",
        "simhash",
        F.explode(F.expr(f"array({','.join(key_structs)})")).alias("b"),
    ).select("doc_id", "simhash", F.col("b.bi").alias("bi"), F.col("b.bk").alias("bk"))
    a = exploded.select(
        "bi", "bk", F.col("doc_id").alias("id_a"), F.col("simhash").alias("sig_a")
    )
    b = exploded.select(
        "bi", "bk", F.col("doc_id").alias("id_b"), F.col("simhash").alias("sig_b")
    )
    return (
        a.join(b, ["bi", "bk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", F.expr("bit_count(sig_a ^ sig_b)"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )

"""Sinks (SURVEY §2.1, S5–S8).

- overwrite (S6): the full-refresh DROP/CREATE+insert analog.
- append (S5): batched bulk insert analog (JDBC ``batchsize`` replaces the
  reference's executemany(1000)).
- upsert (S7): the reference updates row-at-a-time (~10 rows/s). Spark has
  no in-place parquet update, so the engine provides a *staged merge*:
  classify against current state, rewrite = unchanged ∪ updated ∪ inserted.
  On a real deployment this is one Delta Lake ``MERGE INTO`` (same plan
  shape: join + conditional write); we implement the parquet-native
  equivalent so the engine has zero non-core dependencies. At 100 TB,
  partition the target by a stable bucket of the key and rewrite only
  partitions containing changed keys (partition-pruned merge) — the helper
  exposes ``num_buckets`` for that layout.

Audit envelope (``sync_ALL.py:234,242-244``): every target row carries
``row_hash``, ``created_at``, ``updated_at`` and a surrogate ``id``.
Surrogate ids use row_number over the key for dense/deterministic ids at
create time and max(id)+row_number for appends — a driver-free, shuffle-
aware equivalent of AUTO_INCREMENT (excluded from hashes/comparisons).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import warnings

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from presencia_etl_spark.operators import cdc

AUDIT_COLS = ("id", "row_hash", "created_at", "updated_at")
BUCKET_COL = "_kb"
# Swap journal for the partitioned merge: written under the target (the
# leading underscore hides it from Spark's parquet listing) before any
# bucket directory is renamed, removed only once every swap has landed.
# Its presence therefore MEANS "a swap was interrupted by a hard crash".
MERGE_JOURNAL = "_merge_swap_journal.json"


def _recover_interrupted_swap(target_path: str) -> bool:
    """Repair a bucket swap that a hard crash (SIGKILL/power loss)
    interrupted mid-rename.

    The Python-exception path rolls back inline; this covers the crash
    window the rollback can't: between parking a bucket's old directory
    and renaming its replacement in, the bucket is absent from the target
    — without the journal a rerun would silently reclassify those rows as
    INSERT with fresh ids/created_at. Using the journal, each listed
    bucket whose ``_kb=`` dir is missing is completed forward (staged new
    version, already fully written before any rename began) or, failing
    that, rolled back from its parked old copy. Returns True if a journal
    was found and repaired."""
    journal = os.path.join(target_path, MERGE_JOURNAL)
    if not os.path.exists(journal):
        return False
    with open(journal) as fh:
        state = json.load(fh)
    staged = state["staged"]
    for b in state["buckets"]:
        dst = os.path.join(target_path, f"{BUCKET_COL}={b}")
        if os.path.exists(dst):
            continue  # old still in place or new already landed — complete
        new_dir = os.path.join(staged, f"{BUCKET_COL}={b}")
        parked = os.path.join(staged, f"_old_{b}")
        if os.path.exists(new_dir):
            os.rename(new_dir, dst)
        elif os.path.exists(parked):
            os.rename(parked, dst)
    os.remove(journal)
    shutil.rmtree(staged, ignore_errors=True)
    return True


def _warn_audit_collisions(src: DataFrame) -> None:
    """A source data column named like the audit envelope (other than a
    trusted pre-computed row_hash) is silently shadowed by the surrogate
    audit value — a natural key called ``id`` would be LOST. Warn loudly;
    callers should rename before merging."""
    clash = [c for c in src.columns if c in AUDIT_COLS and c != "row_hash"]
    if clash:
        warnings.warn(
            f"source columns {clash} collide with the audit envelope "
            f"{AUDIT_COLS}; they will be replaced by surrogate audit values "
            "— rename them before merging if they carry data",
            stacklevel=3,
        )


def _widen_for_drift(
    src: DataFrame, tgt: DataFrame
) -> tuple[DataFrame, DataFrame, list[str]]:
    """Schema evolution on merge (the reference's documented drift failure,
    context/context.md:900-903): a column the source GREW is added to the
    target frame NULL-filled (old rows keep NULL until their key is next
    updated), and a column the source DROPPED is added back to the source
    as NULL so in-flight updates don't lose it. Because row hashes cover
    the value set, every overlapping key reclassifies as UPDATE on the
    first post-drift merge and settles to SKIP on the next (idempotency
    holds). Returns (src, tgt, drifted) — ``drifted`` forces callers onto
    their full-rewrite path: appending or bucket-pruning with a widened
    schema would leave mixed-schema parquet files that a plain (non-
    mergeSchema) read silently truncates."""
    tgt_data = [f for f in tgt.schema.fields if f.name not in AUDIT_COLS]
    src_names = set(src.columns)
    drifted = False
    for f in src.schema.fields:
        if f.name not in tgt.columns and f.name not in AUDIT_COLS:
            tgt = tgt.withColumn(f.name, F.lit(None).cast(f.dataType))
            drifted = True
    for f in tgt_data:
        if f.name not in src_names and f.name != BUCKET_COL:
            src = src.withColumn(f.name, F.lit(None).cast(f.dataType))
            drifted = True
    return src, tgt, drifted


def with_audit_columns(
    df: DataFrame,
    key_cols: list[str],
    hash_col: str = "row_hash",
    id_offset: int = 0,
    dense: bool = False,
) -> DataFrame:
    """Attach id / created_at / updated_at (hash must already be present).

    Default ids are ``monotonically_increasing_id()`` — unique, parallel,
    non-contiguous (AUTO_INCREMENT's only load-bearing property is
    uniqueness; ids are excluded from correctness comparisons). ``dense=
    True`` switches to row_number over the key — contiguous, but a
    single-reducer global sort: only for dimension-sized tables.
    """
    now = F.current_timestamp()
    if dense:
        w = Window.orderBy(*[F.col(c) for c in key_cols])
        id_col = F.row_number().over(w).cast("long") + F.lit(id_offset)
    else:
        id_col = F.monotonically_increasing_id() + F.lit(id_offset + 1)
    return (
        df.withColumn("id", id_col)
        .withColumn("created_at", now)
        .withColumn("updated_at", now)
    )


def overwrite_parquet(df: DataFrame, path: str) -> None:
    """S6: full refresh."""
    df.write.mode("overwrite").parquet(path)


def append_parquet(df: DataFrame, path: str) -> None:
    """S5: bulk append."""
    df.write.mode("append").parquet(path)


def drop_path(path: str) -> None:
    """S8: drop sink."""
    if os.path.exists(path):
        shutil.rmtree(path)


def compact_parquet(
    spark: SparkSession, path: str, target_file_mb: int = 128
) -> dict[str, int]:
    """Compact a parquet dataset to ~target-sized files.

    Repeated appends (streaming micro-batches, insert-only merges) accrete
    small files; scans then pay per-file open cost and tiny row groups.
    Rewrites the dataset into ``ceil(bytes / target)`` files via a staged
    swap. A hive-partitioned layout (e.g. the ``_kb=`` bucketed merge
    target) is PRESERVED — flattening it would leave the next dynamic
    partition overwrite unable to replace the compacted root files, i.e.
    stale duplicate rows. Partitioned inputs are rewritten with
    ``partitionBy`` (one task per partition value → one file per bucket).
    Returns {'files_before', 'files_after', 'bytes'}.
    """
    import math

    total = 0
    n_files = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
                n_files += 1
    if n_files == 0:
        return {"files_before": 0, "files_after": 0, "bytes": 0}
    n_out = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    part_cols = [
        d.split("=", 1)[0]
        for d in sorted(os.listdir(path))
        if "=" in d and os.path.isdir(os.path.join(path, d))
    ]
    part_cols = list(dict.fromkeys(part_cols))
    df = spark.read.parquet(path)
    tmp = tempfile.mkdtemp(prefix="compact_", dir=os.path.dirname(path) or ".")
    if part_cols:
        # One shuffle keyed on the partition columns → one output file per
        # partition dir; cold partitions still rewrite here, so at true
        # scale call this per dirty-partition subset instead.
        df.repartition(*[F.col(c) for c in part_cols]).write.mode(
            "overwrite"
        ).partitionBy(*part_cols).parquet(tmp)
    else:
        df.repartition(n_out).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.replace(tmp, path)
    after = sum(
        1
        for root, _d, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    return {"files_before": n_files, "files_after": after, "bytes": total}


def write_range_sorted(
    df: DataFrame, path: str, sort_col: str, num_files: int = 8
) -> None:
    """Write parquet globally range-ordered on ``sort_col``: one range
    shuffle (sampled split points) + sort-within-partitions, so every file
    owns a disjoint value range and every row group is internally ordered.
    Scans filtered on ``sort_col`` then skip whole files/row-groups via
    parquet min/max stats — at 100 TB this is the difference between
    touching one day's files and scanning the corpus. (The write-side
    equivalent of partitionBy for high-cardinality order keys like
    timestamps, without the tiny-directory explosion.)"""
    (
        df.repartitionByRange(num_files, F.col(sort_col))
        .sortWithinPartitions(sort_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def write_jdbc_append(df: DataFrame, url: str, table: str, properties: dict[str, str], batchsize: int = 1000) -> None:
    """S5 against a real RDBMS: executor-parallel batched inserts
    (reference: executemany per 1000 rows, single connection)."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", batchsize)
        .options(**properties)
        .mode("append")
        .save()
    )


def merge_upsert_partitioned(
    spark: SparkSession,
    src: DataFrame,
    target_path: str,
    key_cols: list[str],
    hash_cols: list[str] | None = None,
    num_buckets: int = 64,
) -> dict[str, int]:
    """S7 at scale: MERGE that rewrites ONLY the key-hash buckets containing
    changed or new keys, via dynamic partition overwrite.

    State layout: parquet partitioned by ``_kb = pmod(xxhash64(key), N)``.
    A merge classifies as usual, finds the distinct dirty buckets, rebuilds
    just those partitions (unchanged rows of dirty buckets ∪ updates ∪
    inserts) and overwrites them in place — clean buckets are never read
    for the write and never rewritten. With updates touching k% of keys
    localized in b buckets, write cost is b/N of the full rewrite; the
    classify join also prunes its target scan to dirty buckets' files on
    the update side.

    This is the plan shape of Delta's MERGE with partition pruning, with no
    non-core dependency.
    """
    # Trust a pre-computed row_hash (pipelines hash RAW pre-cast strings —
    # recomputing over typed values, and over the hash column itself, would
    # misclassify every row as UPDATE). Default hash scope excludes the
    # audit envelope for the same reason.
    _warn_audit_collisions(src)
    if "row_hash" in src.columns:
        hashed = src
    else:
        hashed = cdc.with_row_hash(
            src, hash_cols or [c for c in src.columns if c not in AUDIT_COLS]
        )

    def keyed_of(h: DataFrame) -> DataFrame:
        k = cdc.with_cdc_key(h, key_cols)
        return k.withColumn(
            BUCKET_COL,
            F.pmod(F.xxhash64(F.col(cdc.KEY_COL)), F.lit(num_buckets)).cast("int"),
        )

    if not os.path.exists(target_path):
        out = with_audit_columns(keyed_of(hashed).drop(cdc.KEY_COL), key_cols)
        out.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(target_path)
        return {"insert": out.count(), "update": 0, "skip": 0, "buckets_rewritten": num_buckets}

    _recover_interrupted_swap(target_path)
    tgt = spark.read.parquet(target_path)
    hashed, tgt, drifted = _widen_for_drift(hashed, tgt)
    keyed = keyed_of(hashed)
    t = cdc.with_cdc_key(tgt, key_cols).select(
        F.col(cdc.KEY_COL), F.col("row_hash").alias("_tgt_hash")
    )
    joined = keyed.join(t, cdc.KEY_COL, "left_outer")
    op = (
        F.when(F.col("_tgt_hash").isNull(), F.lit(cdc.INSERT))
        .when(F.col("row_hash") != F.col("_tgt_hash"), F.lit(cdc.UPDATE))
        .otherwise(F.lit(cdc.SKIP))
    )
    classified = joined.withColumn(cdc.OP_COL, op).drop("_tgt_hash").cache()
    counts = {
        r["op"]: r["cnt"]
        for r in classified.groupBy(F.col(cdc.OP_COL).alias("op"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    n_insert, n_update = counts.get(cdc.INSERT, 0), counts.get(cdc.UPDATE, 0)
    n_skip = counts.get(cdc.SKIP, 0)
    if n_insert == 0 and n_update == 0:
        classified.unpersist()
        return {"insert": 0, "update": 0, "skip": n_skip, "buckets_rewritten": 0}

    dirty = [
        r[BUCKET_COL]
        for r in classified.filter(F.col(cdc.OP_COL) != cdc.SKIP)
        .select(BUCKET_COL)
        .distinct()
        .collect()
    ]
    if drifted:
        # Schema drift must reach EVERY bucket — pruning would leave clean
        # buckets with the old file schema (silent truncation on read).
        dirty = sorted(
            set(dirty)
            | {r[BUCKET_COL] for r in tgt.select(BUCKET_COL).distinct().collect()}
        )
    data_cols = [
        c for c in tgt.columns if c not in AUDIT_COLS and c != BUCKET_COL
    ]

    # Partition-pruned target scan: only dirty buckets are read.
    tgt_dirty = tgt.filter(F.col(BUCKET_COL).isin(dirty))
    tgt_dirty_k = cdc.with_cdc_key(tgt_dirty, key_cols)
    changed = classified.filter(F.col(cdc.OP_COL) == cdc.UPDATE).select(cdc.KEY_COL)
    untouched = tgt_dirty_k.join(F.broadcast(changed), cdc.KEY_COL, "left_anti").drop(
        cdc.KEY_COL
    )
    updated = (
        classified.filter(F.col(cdc.OP_COL) == cdc.UPDATE)
        .join(tgt_dirty_k.select(cdc.KEY_COL, "id", "created_at"), cdc.KEY_COL)
        .withColumn("updated_at", F.current_timestamp())
        .select(*data_cols, "row_hash", "id", "created_at", "updated_at", BUCKET_COL)
    )
    max_id = tgt.agg(F.max("id")).collect()[0][0] or 0
    inserted = with_audit_columns(
        classified.filter(F.col(cdc.OP_COL) == cdc.INSERT).select(
            *data_cols, "row_hash", BUCKET_COL
        ),
        key_cols,
        id_offset=int(max_id),
    )
    audit = ["row_hash", "id", "created_at", "updated_at", BUCKET_COL]
    new_parts = (
        untouched.select(*data_cols, *audit)
        .unionByName(updated.select(*data_cols, *audit))
        .unionByName(inserted.select(*data_cols, *audit))
    )

    # CRASH SAFETY: stage the rebuilt dirty buckets to a sibling temp dir
    # FIRST (the job reads the live target while computing them — a dynamic
    # partition overwrite of the same path would destroy its own input on a
    # mid-commit failure or stage retry), then swap each _kb= directory
    # into place with two renames. Python exceptions roll back inline; a
    # HARD crash (SIGKILL/power loss) mid-swap can leave a bucket absent,
    # so a journal is written under the target before the first rename and
    # removed after the last — `_recover_interrupted_swap` (run at the top
    # of every merge) completes or rolls back any journaled swap, and the
    # idempotent merge then converges the remaining buckets.
    staged = tempfile.mkdtemp(
        prefix="merge_buckets_", dir=os.path.dirname(target_path) or "."
    )
    journal = os.path.join(target_path, MERGE_JOURNAL)
    try:
        new_parts.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(staged)
        classified.unpersist()
        with open(journal, "w") as fh:
            json.dump({"staged": staged, "buckets": list(dirty)}, fh)
        try:
            for b in dirty:
                src_dir = os.path.join(staged, f"{BUCKET_COL}={b}")
                dst_dir = os.path.join(target_path, f"{BUCKET_COL}={b}")
                if not os.path.exists(src_dir):
                    continue  # no deletes → only possible for an empty task
                parked = os.path.join(staged, f"_old_{b}")
                if os.path.exists(dst_dir):
                    os.rename(dst_dir, parked)
                os.rename(src_dir, dst_dir)
        except BaseException:
            # Put back any bucket whose old dir was parked but whose new
            # dir didn't land — the target stays complete (old version).
            for b in dirty:
                dst_dir = os.path.join(target_path, f"{BUCKET_COL}={b}")
                parked = os.path.join(staged, f"_old_{b}")
                if not os.path.exists(dst_dir) and os.path.exists(parked):
                    os.rename(parked, dst_dir)
            raise
        finally:
            # Swap finished (or was fully rolled back) — either way every
            # bucket is complete, so the interrupted-swap marker comes off.
            if os.path.exists(journal):
                os.remove(journal)
    finally:
        shutil.rmtree(staged, ignore_errors=True)
    return {
        "insert": n_insert,
        "update": n_update,
        "skip": n_skip,
        "buckets_rewritten": len(dirty),
    }


def merge_upsert_parquet(
    spark: SparkSession,
    src: DataFrame,
    target_path: str,
    key_cols: list[str],
    hash_cols: list[str] | None = None,
) -> dict[str, int]:
    """S7: staged MERGE into a parquet target; returns bucket counts.

    Semantics = reference incremental sync: INSERT new keys, UPDATE changed
    hashes (updated_at refreshed, created_at/id preserved), SKIP identical.
    Never deletes (trap N6). Schema drift (source grew/dropped a column) is
    absorbed by ``_widen_for_drift``. The default hash scope excludes the
    audit envelope (mirrors the partitioned variant — audit values must
    never feed row identity).
    """
    _warn_audit_collisions(src)
    if not os.path.exists(target_path):
        hashed = (
            src
            if "row_hash" in src.columns
            else cdc.with_row_hash(
                src, hash_cols or [c for c in src.columns if c not in AUDIT_COLS]
            )
        )
        out = with_audit_columns(hashed, key_cols)
        overwrite_parquet(out, target_path)
        return {"insert": out.count(), "update": 0, "skip": 0}

    tgt = spark.read.parquet(target_path)

    # Phase 1 — NARROW classify for counts only: the plan carries just
    # (normalized key, hash) through the join, and nothing is cached. The
    # common cron case (no changes) pays one narrow pass and exits; only
    # when changes exist do we build and cache the wide classified frame.
    src_h = (
        src
        if "row_hash" in src.columns
        else cdc.with_row_hash(
            src, hash_cols or [c for c in src.columns if c not in AUDIT_COLS]
        )
    )
    src_h, tgt, drifted = _widen_for_drift(src_h, tgt)
    narrow = src_h.select(*key_cols, "row_hash")
    counts = {
        r["op"]: r["cnt"]
        for r in cdc.cdc_counts(cdc.cdc_classify(narrow, tgt, key_cols)).collect()
    }
    n_insert = counts.get(cdc.INSERT, 0)
    n_update = counts.get(cdc.UPDATE, 0)
    n_skip = counts.get(cdc.SKIP, 0)
    data_cols = [c for c in tgt.columns if c not in AUDIT_COLS]

    if n_insert == 0 and n_update == 0:
        # No-change pass (the idempotency invariant): nothing to write.
        return {"insert": 0, "update": 0, "skip": n_skip}

    classified = cdc.cdc_classify(src_h, tgt, key_cols, hash_cols).cache()

    if n_update == 0 and not drifted:
        # Insert-only pass — the common incremental shape. Pure append:
        # no rewrite of existing state at all (the reference's batched
        # INSERT path, minus its row-at-a-time fallback). Skipped under
        # drift: appended files would carry the widened schema while old
        # files keep the narrow one.
        max_id = tgt.agg(F.max("id")).collect()[0][0] or 0
        inserted = with_audit_columns(
            classified.filter(F.col(cdc.OP_COL) == cdc.INSERT).select(
                *data_cols, "row_hash"
            ),
            key_cols,
            id_offset=int(max_id),
        )
        inserted.select(*data_cols, "row_hash", "id", "created_at", "updated_at").write.mode(
            "append"
        ).parquet(target_path)
        classified.unpersist()
        return {"insert": n_insert, "update": 0, "skip": n_skip}

    # Updates present → staged rewrite: unchanged ∪ updated ∪ inserted.
    tgt_k = cdc.with_cdc_key(tgt, key_cols)

    changed_keys = classified.filter(F.col(cdc.OP_COL) == cdc.UPDATE).select(cdc.KEY_COL)
    untouched = tgt_k.join(F.broadcast(changed_keys), cdc.KEY_COL, "left_anti").drop(cdc.KEY_COL)

    updated = (
        classified.filter(F.col(cdc.OP_COL) == cdc.UPDATE)
        .join(
            tgt_k.select(cdc.KEY_COL, "id", "created_at"),
            cdc.KEY_COL,
            "inner",
        )
        .withColumn("updated_at", F.current_timestamp())
        .select(*data_cols, "row_hash", "id", "created_at", "updated_at")
    )

    new_state = untouched.select(
        *data_cols, "row_hash", "id", "created_at", "updated_at"
    ).unionByName(updated)

    if n_insert > 0:
        max_id = tgt.agg(F.max("id")).collect()[0][0] or 0
        inserted = with_audit_columns(
            classified.filter(F.col(cdc.OP_COL) == cdc.INSERT).select(
                *data_cols, "row_hash"
            ),
            key_cols,
            id_offset=int(max_id),
        )
        new_state = new_state.unionByName(
            inserted.select(*data_cols, "row_hash", "id", "created_at", "updated_at")
        )

    # Stage to a temp dir, then atomically swap — parquet overwrite of a
    # path we are also reading would corrupt the source mid-plan.
    tmp = tempfile.mkdtemp(prefix="merge_stage_", dir=os.path.dirname(target_path) or ".")
    new_state.write.mode("overwrite").parquet(tmp)
    classified.unpersist()
    shutil.rmtree(target_path)
    os.replace(tmp, target_path)
    return {
        "insert": n_insert,
        "update": n_update,
        "skip": n_skip,
    }

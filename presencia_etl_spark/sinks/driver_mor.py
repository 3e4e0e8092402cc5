"""Zero-Spark-job MOR operations for KB-sized change batches.

The steady state of a maintained view / cron CDC loop is a HANDFUL of
changed rows per tick; running them through the full Spark merge costs a
fixed ~15-job cascade (classify collects, identity fetch, delta write,
digest fold) regardless of size — sf0.1 measured a 1-key maintained-view
refresh at ~35 jobs / 5.7 s against a 5.0 s rebuild. This module is the
admit-loop discipline (``operators/dedup_index._register_collected``)
applied to the MOR sink itself: when the pending change set is tiny and
every column type is driver-renderable, the WHOLE merge runs on the
driver with pyarrow — point reads pruned to the affected ``_kb=``
buckets' files, classification and digest folds in Python
(``functions/driver_parity`` — bit parity with the Spark expressions,
differential-tested), one parquet file committed through the exact same
staging-dir + ``os.rename`` protocol as ``mor._commit_delta``. Zero
Spark jobs; the JVM is touched only via py4j for the rare double value
outside the proven rendering region.

The resulting state is indistinguishable from a Spark-path merge: same
delta layout (key-sorted file under ``deltas/_delta_seq=N``), same audit
columns, same sidecar algebra (load → fold → save after publish, with
the duplicate-key stand-down). ``tests/test_driver_mor.py`` asserts
bit-level equivalence (row hashes, digests, read_mor content) against
the Spark merge over randomized sequences, and that Spark merges /
compactions / change-feed reads compose transparently on top of
driver-written deltas.

Anything this path cannot reproduce exactly — unsupported column types,
schema drift, a crash journal needing Spark-side repair, a fileless
base, oversized batches — raises ``DriverDecline`` and the caller runs
the ordinary Spark merge. Declines trade speed, never correctness.

Scale note: "driver-side" here is not a single-node shortcut — it is
the metadata plane of a 100 TB deployment. The point reads touch
O(changed keys) row groups via footer stats (the files are key-sorted
precisely for this), the digest sidecar is ≤16K rows, and the commit
writes one small file; none of that grows with table size. An
object-store port swaps the ``os.rename`` publish exactly as
``mor._commit_delta`` does (docs/SCALE.md).
"""

from __future__ import annotations

import datetime
import glob
import os
import threading
import warnings

from presencia_etl_spark.functions import driver_parity as dp
from presencia_etl_spark.operators import cdc
from presencia_etl_spark.sinks import digest_store
from presencia_etl_spark.sinks.locking import state_lock
from presencia_etl_spark.sinks.mor import (
    BASE_DIR,
    DELETED_COL,
    DELTA_DIR,
    SEQ_COL,
    STAGING_PREFIX,
    _delta_seqs,
    _gc_orphan_staging,
    _meta_path,
    _next_seq,
    _read_meta,
    _write_meta,
)
from presencia_etl_spark.sinks.writers import (
    AUDIT_COLS,
    BUCKET_COL,
    MERGE_JOURNAL,
    _max_id_stat,
    is_spark_hidden,
)

# A driver merge past this many affected keys would stop being the
# trickle shape (point reads degrade toward a scan) — callers gate on it
# and fall back to the Spark path, same constant family as
# mor.KEY_PUSHDOWN_LIMIT. This is THE one trickle row/key bound: the
# streaming micro-batch fast path samples rows against it too (a row
# carries at most one key, so rows ≤ bound ⇒ keys ≤ bound; the r11
# 2048-row cap was an unjustified second constant).
DRIVER_BATCH_MAX_KEYS = 4096


def trickle_enabled() -> bool:
    """The driver-plane kill switch — one env knob for every zero-job
    trickle path (micro-batch merge, replication feed, view/agg
    refresh). ``SPARK_GRAFT_DRIVER_TRICKLE=0`` forces the Spark paths."""
    return os.environ.get("SPARK_GRAFT_DRIVER_TRICKLE", "1") != "0"


class DriverDecline(Exception):
    """This batch/state can't be handled driver-side exactly — run the
    Spark path. Never raised for something the Spark path would also
    reject. ``reason`` is a short stable tag for the decline-telemetry
    counters (``decline_counts``)."""

    def __init__(self, msg: str, reason: str = "other"):
        super().__init__(msg)
        self.reason = reason


# Decline telemetry: why the driver plane fell back to Spark-path costs,
# counted per stable reason tag. A deployment whose steady state
# silently stopped being zero-job sees it here (bench emits the dict).
# Trickle paths run on several threads (streaming foreachBatch vs
# main-thread refreshes) — the counter mutates under a lock.
_DECLINES: dict[str, int] = {}
_DECLINES_MU = threading.Lock()


def record_decline(reason: str) -> None:
    with _DECLINES_MU:
        _DECLINES[reason] = _DECLINES.get(reason, 0) + 1


def decline_counts(reset: bool = False) -> dict[str, int]:
    """Snapshot (optionally reset) of the per-reason decline counters
    accumulated by ``try_trickle`` since process start / last reset."""
    with _DECLINES_MU:
        out = dict(_DECLINES)
        if reset:
            _DECLINES.clear()
    return out


def try_trickle(
    driver_fn,
    *,
    pending_bytes: int | None = None,
    max_bytes: int | None = None,
    on_compact=None,
    idempotent: bool = True,
    on_failure=None,
):
    """THE trickle gate — the one code path deciding driver-vs-Spark for
    every zero-job fast path (micro-batch merge, replication feed
    catch-up, maintained-view refresh). Owns, in order:

    1. size bound — ``pending_bytes > max_bytes`` is the corpus shape,
       not a decline (FS-metadata decision, per the CLAUDE.md rule);
    2. the ``SPARK_GRAFT_DRIVER_TRICKLE=0`` kill switch;
    3. running ``driver_fn`` (returns the result dict, raises
       ``DriverDecline`` for shapes it can't reproduce exactly);
    4. decline handling — ``DriverDecline`` AND unexpected pyarrow/OS
       errors both return None (reason-counted) so the caller runs the
       Spark path. Swallowing a post-publish error is safe ONLY for an
       idempotent consumer: a hash-classified upsert re-applied by the
       Spark path classifies the landed rows as SKIP, and a stale digest
       sidecar only costs a scan fallback, never wrong data. A consumer
       whose publish is an ARITHMETIC rewrite (the agg fold) must pass
       ``idempotent=False`` with an ``on_failure`` recovery callback —
       the gate then runs ``on_failure()`` after any post-invoke failure
       (decline or error) and returns its result when it reports the
       publish already landed (non-None), so no call site can forget the
       double-apply guard; ``idempotent=False`` without ``on_failure``
       raises at call time. ``on_failure`` never runs for pre-invoke
       skips (size bound / kill switch) — ``driver_fn`` never executed,
       so there is nothing to recover;
    5. ``compaction_due`` escalation — when the result asks for it and
       ``on_compact`` is given, it runs (Spark-side) and the result
       gains ``compacted=True``.

    Returns the driver result dict, or None → caller takes the Spark
    path."""
    import pyarrow as pa

    if not idempotent and on_failure is None:
        raise ValueError(
            "a non-idempotent trickle consumer must supply on_failure — "
            "the swallowed-post-publish-error recovery is not optional"
        )
    if pending_bytes is not None and max_bytes is not None:
        if pending_bytes > max_bytes:
            return None
    if not trickle_enabled():
        return None
    try:
        r = driver_fn()
    except DriverDecline as e:
        record_decline(e.reason)
        if on_failure is not None:
            return on_failure()
        return None
    except (OSError, pa.lib.ArrowException) as e:
        # unexpected environment/arrow failure on the fast path must
        # never crash a pipeline the Spark path could finish
        record_decline("error")
        warnings.warn(f"driver trickle path failed unexpectedly: {e!r}")
        if on_failure is not None:
            return on_failure()
        return None
    if r is not None and r.pop("compaction_due", False):
        if on_compact is not None:
            on_compact()
            r["compacted"] = True
        else:
            r["compaction_due"] = True  # caller owns escalation
    return r


# --------------------------------------------------------------------------
# Arrow type → renderer kind
# --------------------------------------------------------------------------


def _kind_of(arrow_type) -> str:
    import pyarrow as pa

    t = arrow_type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_int8(t):
        return "int8"
    if pa.types.is_int16(t):
        return "int16"
    if pa.types.is_int32(t):
        return "int32"
    if pa.types.is_int64(t):
        return "int64"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_float64(t):
        return "double"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp"
    raise DriverDecline(
        f"unsupported driver-side column type: {t}", reason="unsupported_type"
    )


_INT_KINDS = {"int8", "int16", "int32", "int64"}


def _value_matches_kind(value, kind: str) -> bool:
    """Is this Python value exactly the kind the target column holds?
    The hash renderer would happily render a drifted value with the
    TARGET's kind (float 2.0 into an int64 column → '2'), which silently
    diverges row_hash from what the Spark merge (hashing the source's
    own type: '2.0') would produce — so type drift must DECLINE before
    any hashing. bool is an int subclass and datetime a date subclass in
    Python; both are explicitly separated here."""
    if value is None:
        return True
    if kind == "string":
        return isinstance(value, str)
    if kind in _INT_KINDS:
        return isinstance(value, int) and not isinstance(value, bool)
    if kind == "bool":
        return isinstance(value, bool)
    if kind == "double":
        # int into a double column renders identically on both paths
        # (Spark's long→double cast then double→string); accept it.
        return isinstance(value, (int, float)) and not isinstance(value, bool)
    if kind == "date":
        return isinstance(value, datetime.date) and not isinstance(
            value, datetime.datetime
        )
    if kind == "timestamp":
        return isinstance(value, datetime.datetime)
    return False


def check_batch_kinds(rows: list[dict], kinds: dict[str, str]) -> None:
    """Raise ``DriverDecline`` when any batch value's Python type doesn't
    match the target column's kind (pre-computed row_hash/_cdc_key
    strings are exempt — they're trusted verbatim)."""
    for row in rows:
        for c, v in row.items():
            if c in ("row_hash", cdc.KEY_COL):
                if v is not None and not isinstance(v, str):
                    raise DriverDecline(
                        f"pre-computed {c!r} must be a string, got "
                        f"{type(v).__name__}",
                        reason="type_drift",
                    )
                continue
            k = kinds.get(c)
            if k is not None and not _value_matches_kind(v, k):
                raise DriverDecline(
                    f"type drift: column {c!r} holds {type(v).__name__} "
                    f"but the target column kind is {k!r}",
                    reason="type_drift",
                )


def table_kinds(path: str) -> dict[str, str]:
    """Column → renderer kind for a MOR state, from one parquet footer
    (base preferred, else a delta). Raises ``DriverDecline`` when any
    column's type has no exact driver-side rendering."""
    import pyarrow.parquet as pq

    f = _any_parquet(os.path.join(path, BASE_DIR)) or _any_parquet(
        os.path.join(path, DELTA_DIR)
    )
    if f is None:
        raise DriverDecline(
            f"{path!r}: no parquet footers to type from", reason="no_footers"
        )
    sch = pq.read_schema(f)
    return {name: _kind_of(sch.field(name).type) for name in sch.names}


def _any_parquet(root: str) -> str | None:
    for r, dirs, files in os.walk(root):
        dirs[:] = [d for d in dirs if not is_spark_hidden(d)]
        for f in sorted(files):
            if f.endswith(".parquet") and not is_spark_hidden(f):
                return os.path.join(r, f)
    return None


def _to_rows(tbl) -> list[dict]:
    """Arrow table → python row dicts. Timestamp columns are safe-cast to
    microseconds first (Spark values are µs-aligned; a true-ns value
    can't round-trip the datetime rendering and must decline)."""
    import pyarrow as pa

    cols = {}
    for name in tbl.schema.names:
        col = tbl.column(name)
        t = col.type
        if pa.types.is_timestamp(t) and t.unit != "us":
            try:
                col = col.cast(pa.timestamp("us", tz=t.tz), safe=True)
            except pa.ArrowInvalid as e:
                raise DriverDecline(
                    f"column {name!r} holds sub-microsecond timestamps",
                    reason="sub_us_timestamp",
                ) from e
        cols[name] = col.to_pylist()
    names = list(cols)
    return [dict(zip(names, vals)) for vals in zip(*cols.values())] if names else []


def _read_filtered(path_or_files, key_filter: list[str] | None, columns=None):
    """One pyarrow dataset read over a dir or file list, In(key)-filtered
    (row groups pruned via the key-sorted files' footer stats)."""
    import pyarrow.dataset as pads

    dset = pads.dataset(path_or_files, format="parquet")
    flt = (
        pads.field(cdc.KEY_COL).isin(key_filter)
        if key_filter is not None
        else None
    )
    return dset.to_table(filter=flt, columns=columns)


# --------------------------------------------------------------------------
# Point reads
# --------------------------------------------------------------------------


def read_delta_range_rows(
    path: str, since_seq: int, as_of_seq: int | None = None
) -> list[dict]:
    """All delta rows with sequence in ``(since, as_of]`` — the raw
    material of ``read_mor_changes``, read file-by-file with pyarrow.
    Rows gain ``_delta_seq`` (from the dir name) and a normalized
    ``_deleted``. Caller is responsible for the latest-per-key fold."""
    meta = _read_meta(path)
    floor = meta.get("compacted_through", 0)
    if since_seq < floor:
        raise ValueError(
            f"changes since seq={since_seq} predate the last compaction "
            f"(compacted_through={floor})"
        )
    out: list[dict] = []
    for s in _delta_seqs(path):
        if s <= since_seq or (as_of_seq is not None and s > as_of_seq):
            continue
        ddir = os.path.join(path, DELTA_DIR, f"{SEQ_COL}={s}")
        for r in _to_rows(_read_filtered(ddir, None)):
            r[SEQ_COL] = s
            r.setdefault(DELETED_COL, None)
            r[DELETED_COL] = bool(r[DELETED_COL]) if r[DELETED_COL] else False
            out.append(r)
    return out


def latest_per_key(rows: list[dict]) -> dict[str, dict]:
    """``mor._delta_latest`` driver-side: per ``_cdc_key``, the row with
    the highest ``_delta_seq`` (a key appears at most once per delta)."""
    best: dict[str, dict] = {}
    for r in rows:
        cur = best.get(r[cdc.KEY_COL])
        if cur is None or r[SEQ_COL] > cur[SEQ_COL]:
            best[r[cdc.KEY_COL]] = r
    return best


def read_live_rows_for_keys(
    path: str, keys: list[str], as_of_seq: int | None = None
) -> dict[str, dict]:
    """The live (or ``as_of`` snapshot) row of each key, by point
    lookup: the key-filtered delta dirs decide overridden keys
    (tombstone → absent), the rest come from the keys' ``_kb=`` bucket
    files, In-filtered so footer stats skip non-matching row groups.
    Exactly ``read_mor(...buckets=...).filter(in_list(keys))``'s
    semantics, zero jobs."""
    if not keys:
        return {}
    meta = _read_meta(path)
    if as_of_seq is not None:
        floor = meta.get("compacted_through", 0)
        if as_of_seq < floor:
            raise ValueError(
                f"snapshot as_of_seq={as_of_seq} predates the last "
                f"compaction (compacted_through={floor})"
            )
    keyset = sorted(set(keys))
    decided: dict[str, dict] = {}
    for s in _delta_seqs(path):
        if as_of_seq is not None and s > as_of_seq:
            continue
        ddir = os.path.join(path, DELTA_DIR, f"{SEQ_COL}={s}")
        for r in _to_rows(_read_filtered(ddir, keyset)):
            r[SEQ_COL] = s
            r.setdefault(DELETED_COL, None)
            r[DELETED_COL] = bool(r[DELETED_COL]) if r[DELETED_COL] else False
            cur = decided.get(r[cdc.KEY_COL])
            if cur is None or s > cur[SEQ_COL]:
                decided[r[cdc.KEY_COL]] = r
    out = {
        k: {c: v for c, v in r.items() if c not in (SEQ_COL, DELETED_COL)}
        for k, r in decided.items()
        if not r[DELETED_COL]
    }
    base_keys = [k for k in keyset if k not in decided]
    if base_keys:
        meta_nb = meta["num_buckets"]
        # ONE dataset read over the union of the keys' bucket files
        # (r14): the per-bucket loop issued one pads.dataset+to_table
        # per dirty bucket (~6-9 ms each, serial — 0.6 s of a KB tick
        # touching 67 buckets); a single scan over the same pruned file
        # list applies the one In(keys) filter with arrow's internal
        # fragment parallelism and identical row-group skipping. Rows
        # only ever live in their own pmod bucket, so the global key
        # filter matches exactly what the per-bucket subsets did, and
        # the bucket column is recomputed from the key (the layout
        # invariant the dirs encode).
        files = []
        for b in sorted({dp.pmod_bucket(k, meta_nb) for k in base_keys}):
            bdir = os.path.join(path, BASE_DIR, f"{BUCKET_COL}={b}")
            if not os.path.isdir(bdir):
                continue
            files += [
                f
                for f in glob.glob(os.path.join(bdir, "*.parquet"))
                if not is_spark_hidden(os.path.basename(f))
            ]
        if files:
            for r in _to_rows(_read_filtered(files, base_keys)):
                r[BUCKET_COL] = dp.pmod_bucket(r[cdc.KEY_COL], meta_nb)
                out[r[cdc.KEY_COL]] = r
    return out


# --------------------------------------------------------------------------
# Delta commit
# --------------------------------------------------------------------------


def _delta_schema(path: str):
    """The arrow schema a driver-written delta file must carry: an
    existing delta's footer (already the full layout) or the base footer
    + ``_kb``; ``_deleted`` appended when absent. Spark's own metadata
    blob is dropped (Spark re-infers from the parquet types)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    f = _any_parquet(os.path.join(path, DELTA_DIR))
    if f is not None:
        sch = pq.read_schema(f)
    else:
        f = _any_parquet(os.path.join(path, BASE_DIR))
        if f is None:
            raise DriverDecline(
                f"{path!r}: no parquet footers for a schema",
                reason="no_footers",
            )
        sch = pq.read_schema(f)
        sch = sch.append(pa.field(BUCKET_COL, pa.int32()))
    if DELETED_COL not in sch.names:
        sch = sch.append(pa.field(DELETED_COL, pa.bool_()))
    # drop spark's row-metadata: our file's physical types are authoritative
    return pa.schema(list(sch), metadata=None)


def commit_delta_rows(path: str, rows: list[dict]) -> int:
    """Land ``rows`` (full delta layout incl. ``_deleted``) as ONE
    key-sorted parquet file through the same staging + atomic-rename
    protocol as ``mor._commit_delta``. Returns the committed sequence."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    sch = _delta_schema(path)
    rows = sorted(rows, key=lambda r: r[cdc.KEY_COL])
    data = {name: [r.get(name) for r in rows] for name in sch.names}
    tbl = pa.Table.from_pydict(data, schema=sch)
    meta = _read_meta(path)
    seq = _next_seq(path, meta)
    staged = os.path.join(path, DELTA_DIR, f"{STAGING_PREFIX}{seq}")
    os.makedirs(staged, exist_ok=True)
    pq.write_table(
        tbl,
        os.path.join(staged, "part-00000.parquet"),
        use_deprecated_int96_timestamps=True,  # match Spark's INT96 layout
        compression="snappy",
    )
    os.rename(staged, os.path.join(path, DELTA_DIR, f"{SEQ_COL}={seq}"))
    meta["seq"] = seq
    _write_meta(path, meta)
    return seq


# --------------------------------------------------------------------------
# The trickle merge
# --------------------------------------------------------------------------


def trickle_merge(
    path: str,
    upserts: list[dict],
    key_cols: list[str],
    delete_keys: list[str] | None = None,
    hash_cols: list[str] | None = None,
    compact_every: int | None = 16,
    jvm=None,
) -> dict:
    """``merge_upsert_mor(..., delete_keys=...)`` for a KB-sized batch,
    entirely driver-side. ``upserts`` are data-column dicts (no audit
    columns); ``delete_keys`` are already-normalized ``_cdc_key``
    strings. Classifies by point read, keeps update identity
    (id/created_at) from the current row, allocates insert ids from
    footer stats, folds the digest sidecar, and commits upserts +
    tombstones as ONE atomic delta sequence. Raises ``DriverDecline``
    for anything it can't reproduce exactly (caller falls back to the
    Spark merge). Auto-compaction is NOT run here — the returned
    ``compaction_due`` flag lets the caller schedule a Spark-side
    compact."""
    delete_keys = list(delete_keys or [])
    if not os.path.exists(_meta_path(path)):
        raise DriverDecline(f"{path!r} is not a MOR state", reason="not_mor")
    if os.path.exists(os.path.join(path, BASE_DIR, MERGE_JOURNAL)):
        raise DriverDecline(
            "interrupted bucket swap needs Spark-side repair", reason="journal"
        )
    if len(upserts) + len(delete_keys) > DRIVER_BATCH_MAX_KEYS:
        raise DriverDecline(
            "batch exceeds the driver point-read bound", reason="batch_too_big"
        )

    with state_lock(path):
        _gc_orphan_staging(path)
        meta = _read_meta(path)
        if not _any_parquet(os.path.join(path, BASE_DIR)):
            raise DriverDecline(
                "fileless base needs Spark-side recovery", reason="fileless_base"
            )
        kinds = table_kinds(path)
        data_cols = [
            c
            for c in kinds
            if c not in AUDIT_COLS
            and c not in (BUCKET_COL, cdc.KEY_COL, SEQ_COL, DELETED_COL)
        ]
        if upserts:
            # a batch may carry PRE-COMPUTED row_hash/_cdc_key (the
            # replication feed: hashes were computed over the source's
            # RAW strings and must be trusted, never recomputed over
            # typed values — cdc_classify's trust rule)
            batch_cols = set(upserts[0]) - {"row_hash", cdc.KEY_COL}
            if batch_cols != set(data_cols):
                raise DriverDecline(
                    f"schema drift: batch columns {sorted(batch_cols)} != "
                    f"state data columns {sorted(data_cols)}",
                    reason="schema_drift",
                )
            check_batch_kinds(upserts, kinds)
        hcols = hash_cols or data_cols
        key_kinds = [kinds[c] for c in key_cols]

        # hash + key + bucket, the Spark merge's `keyed` frame in Python
        staged = []
        try:
            for row in upserts:
                k = row.get(cdc.KEY_COL) or dp.composite_key(
                    [row[c] for c in key_cols], key_kinds, jvm
                )
                h = row.get("row_hash") or dp.row_hash_value(
                    row, hcols, kinds, "sha256", jvm
                )
                staged.append((k, h, row))
        except dp.UnsupportedValue as e:
            # a value outside the proven rendering region with no JVM
            # gateway — the Spark path renders it exactly
            raise DriverDecline(str(e), reason="unrenderable") from e
        up_keys = {k for k, _h, _r in staged}
        if len(up_keys) < len(staged):
            raise DriverDecline(
                "duplicate keys within the batch — the Spark merge's "
                "arbitrary-winner semantics aren't reproduced here",
                reason="duplicate_keys",
            )
        del_keys = [k for k in dict.fromkeys(delete_keys) if k not in up_keys]

        current = read_live_rows_for_keys(
            path, sorted(up_keys | set(del_keys))
        )
        n_insert = n_update = n_skip = 0
        now = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
        out_rows: list[dict] = []
        digest_delta: list[tuple[int, int, int, int]] = []
        for k, h, row in staged:
            cur = current.get(k)
            mb = dp.xxhash64_str(k) % cdc.DIGEST_MICRO_BUCKETS
            if cur is None:
                n_insert += 1
                op = cdc.INSERT
            elif cur["row_hash"] != h:
                n_update += 1
                op = cdc.UPDATE
            else:
                n_skip += 1
                continue
            rec = dict(row)
            rec["row_hash"] = h
            rec[cdc.KEY_COL] = k
            rec[BUCKET_COL] = dp.pmod_bucket(k, meta["num_buckets"])
            rec["updated_at"] = now
            if op == cdc.UPDATE:
                rec["id"] = cur["id"]
                rec["created_at"] = cur["created_at"]
            rec[DELETED_COL] = False
            out_rows.append(rec)
            h1n, h2n = dp.fold_pair(k, h)
            if op == cdc.INSERT:
                digest_delta.append((mb, 1, h1n, h2n))
            else:
                h1o, h2o = dp.fold_pair(k, cur["row_hash"])
                digest_delta.append((mb, 0, h1n ^ h1o, h2n ^ h2o))
        victims = [
            current[k] for k in del_keys if k in current
        ]
        for cur in victims:
            k = cur[cdc.KEY_COL]
            rec = dict(cur)
            rec["updated_at"] = now
            rec[DELETED_COL] = True
            out_rows.append(rec)
            h1o, h2o = dp.fold_pair(k, cur["row_hash"])
            digest_delta.append(
                (dp.xxhash64_str(k) % cdc.DIGEST_MICRO_BUCKETS, -1, h1o, h2o)
            )
        n_delete = len(victims)

        if n_insert + n_update + n_delete == 0:
            return {
                "insert": 0, "update": 0, "skip": n_skip, "delete": 0,
                "delta_files": 0, "compacted": False, "compaction_due": False,
                "driver": True,
            }

        if n_insert:
            max_id = _max_id_stat(os.path.join(path, BASE_DIR))
            d_max = _max_id_stat(os.path.join(path, DELTA_DIR))
            if max_id is None:
                raise DriverDecline(
                    "base lacks id footer stats", reason="no_id_stats"
                )
            if d_max is not None:
                max_id = max(max_id, d_max)
            nxt = int(max_id)
            for rec in out_rows:
                if not rec[DELETED_COL] and "id" not in rec:
                    nxt += 1
                    rec["id"] = nxt
                    rec["created_at"] = now

        # digest maintenance mirrors the Spark merge: load-only (never
        # seeds), duplicate-key stand-down, save strictly after publish.
        new_dig = None
        if digest_store.enabled():
            seen: set[str] = set()
            dup = False
            for rec in out_rows:
                if rec[cdc.KEY_COL] in seen:
                    dup = True
                    break
                seen.add(rec[cdc.KEY_COL])
            tgt_dig = digest_store.load(path)
            if tgt_dig is not None and not dup:
                new_dig = digest_store.apply_delta(tgt_dig, digest_delta)
            elif tgt_dig is not None and dup:
                warnings.warn(
                    "digest sidecar maintenance skipped: duplicate keys "
                    "among the change rows"
                )

        commit_delta_rows(path, out_rows)
        digest_store.save(path, new_dig)
        return {
            "insert": n_insert,
            "update": n_update,
            "skip": n_skip,
            "delete": n_delete,
            "delta_files": 1,
            "compacted": False,
            "compaction_due": (
                compact_every is not None
                and len(_delta_seqs(path)) >= compact_every
            ),
            "driver": True,
        }

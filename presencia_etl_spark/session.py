"""SparkSession factory with scale-appropriate defaults.

Defaults chosen for correctness-at-scale first:

- AQE on (runtime re-plan: coalesce small shuffle partitions, skew-join
  splitting, dynamic broadcast) — replaces every hand-tuned physical
  discipline the reference hard-codes (batching, key-map builds).
- ``spark.sql.session.timeZone=UTC`` so timestamp arithmetic (year/month/
  date_format) is deterministic and matches the DuckDB oracle, which treats
  parquet timestamps as naive wall-clock.
- Arrow enabled for any pandas interchange (extension operators).
- ``spark.sql.shuffle.partitions`` is env-tunable: 32 for local[32] tests;
  on a real cluster set it ≈ 2-3× total cores or rely on AQE coalescing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "presencia-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard config."""
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalesces partitions DOWN, never up: the static shuffle width
        # is a CEILING on parallelism and a FLOOR on partition size. Start
        # fine-grained so corpus-scale shuffles don't spill at the static
        # width (measured: a 60M-row classify join at width 16 spilled to
        # 130 s; at initial 256 AQE keeps wide stages wide and still
        # coalesces small frames to a few reducers — 84 s, and the 60M MOR
        # load halved). On a real cluster size this ≈ 2-4× total cores.
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            os.environ.get("SPARK_GRAFT_AQE_INITIAL_PARTITIONS", "256"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.mergeSchema", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/presencia-spark-warehouse"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


import contextlib
import threading

# Session conf is process-global: two interleaved scopes would restore
# each other's half-mutated values. One scope at a time; waiting here is
# cheap (scopes bound single trickle batches).
_TRICKLE_MU = threading.RLock()  # RLock: a nested scope saves/restores the outer scope's values correctly
# Owner bookkeeping (mutated only while holding _TRICKLE_MU): lets
# corpus_barrier distinguish "another thread's scope is open — wait for
# it" from "I am dispatching corpus work from INSIDE my own scope" (a
# programming error: the workers would silently run under trickle conf).
_SCOPE_OWNER: int | None = None
_SCOPE_DEPTH = 0


def corpus_barrier() -> None:
    """Call at corpus-scale dispatch points that must run under SESSION
    defaults (``run_per_table`` fan-out, ad-hoc SQL execution): waits for
    any open ``trickle_scope`` on another thread to close — the launched
    work then sees restored conf — and raises if called from inside a
    scope on THIS thread (re-entrant acquire would not wait, and the
    corpus job would run with AQE off and 8 shuffle partitions)."""
    if _SCOPE_DEPTH > 0 and _SCOPE_OWNER == threading.get_ident():
        raise RuntimeError(
            "corpus-scale dispatch inside an open trickle_scope: the "
            "fan-out would run under trickle conf (AQE off, 8 shuffle "
            "partitions); close the scope first."
        )
    _TRICKLE_MU.acquire()
    _TRICKLE_MU.release()


@contextlib.contextmanager
def trickle_scope(spark: SparkSession):
    """Conf scope for TRICKLE-BATCH plans — the steady-state loops (the
    admit loop, an incremental-agg refresh) whose every frame is KB-sized
    and whose join strategy is fully decided statically (broadcast hints,
    In-pushdown). Three session knobs cost such plans more than they buy:

    - AQE launches a separate Spark job per exchange it re-plans (~0.1 s
      fixed latency each, ~10 per admit batch measured) for decisions the
      plan already made.
    - A LIMIT collect ramps over several jobs (1 partition, then 4x...);
      scanning everything in one job is cheaper when 'everything' is one
      small batch.
    - The session shuffle width launches more tasks than there are rows
      to shuffle.

    Corpus-scale one-shot shapes (LSH sweep, compaction, full loads) keep
    the session defaults. Restores every knob on exit; actions on frames
    RETURNED out of the scope run under the session config again.

    Scopes SERIALIZE (module lock): session conf is process-global, so
    interleaved enter/exit from two threads would corrupt the restore.
    An unrelated query running on another thread DURING a scope does see
    the trickle conf — acceptable for this engine's call sites (the
    admit loop and agg refresh run inside per-state writer locks and the
    pipelines don't overlap them with ad-hoc queries); a shared
    multi-tenant session would want per-query conf (Spark Connect) or a
    dedicated session instead."""
    global _SCOPE_OWNER, _SCOPE_DEPTH
    _TRICKLE_MU.acquire()
    _SCOPE_OWNER = threading.get_ident()
    _SCOPE_DEPTH += 1
    # EVERYTHING after the acquire sits inside this try: a py4j hiccup in
    # the entry-side conf reads/sets (stopped session, transient gateway
    # error) must still release the lock, or every later trickle path in
    # the process would block forever. `restore` records exactly the
    # knobs that were successfully changed, so a partial entry restores
    # partially instead of writing stale values.
    try:
        restore = []
        old_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
        old_sp = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        restore.append(("spark.sql.adaptive.enabled", old_aqe))
        # Set the limit-ramp knob ONLY if reading it succeeded: on a Spark
        # where the conf key doesn't exist the get raises, and an
        # unconditional set would install a value the restore loop never
        # removes (it would survive scope exit).
        try:
            old_lim = spark.conf.get("spark.sql.limit.initialNumPartitions")
        except Exception:
            old_lim = None
        if old_lim is not None:
            spark.conf.set("spark.sql.limit.initialNumPartitions", "100000")
            restore.append(("spark.sql.limit.initialNumPartitions", old_lim))
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        restore.append(("spark.sql.shuffle.partitions", old_sp))
        try:
            yield
        finally:
            for k, v in restore:
                spark.conf.set(k, v)
    finally:
        _SCOPE_DEPTH -= 1
        if _SCOPE_DEPTH == 0:
            _SCOPE_OWNER = None
        _TRICKLE_MU.release()

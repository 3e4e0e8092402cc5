#!/usr/bin/env python
"""Isolated repro of the bench's left-star DIM tick (nway3_left_dim_refresh).

Mirrors bench_pipelines' left-star setup at a given SF, then runs the three
50-key part-brand dim ticks, timing each refresh with per-phase breakdown
(monkeypatched timers around the refresh internals) and Spark job counts.
"""

from __future__ import annotations

import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F

from presencia_etl_spark.session import get_spark
from presencia_etl_spark.sources.readers import read_table
from presencia_etl_spark.sinks.mor import merge_upsert_mor, read_mor
from presencia_etl_spark.plans import incremental_join as ij
from presencia_etl_spark.plans import incremental_join_nway as ijn
from presencia_etl_spark.plans.incremental_join import refresh_join_view
from presencia_etl_spark.plans.incremental_join_nway import build_join_view_nway

PHASES: list[tuple[str, float]] = []


def timed(mod, name):
    orig = getattr(mod, name)

    def wrap(*a, **kw):
        t0 = time.perf_counter()
        try:
            return orig(*a, **kw)
        finally:
            PHASES.append((name, time.perf_counter() - t0))

    setattr(mod, name, wrap)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    work = "/tmp/r13_dimtick_work"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    spark = get_spark("r13-dimtick-repro")
    sc = spark.sparkContext

    li = read_table(spark, sf_dir, "lineitem").withColumn(
        "l_key",
        F.concat_ws("|", F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string")),
    ).select("l_key", "l_orderkey", "l_partkey", "l_quantity")
    mtarget = f"{work}/lineitem_mor"
    merge_upsert_mor(spark, li, mtarget, ["l_key"], num_buckets=256)
    omor = f"{work}/orders_mor"
    merge_upsert_mor(
        spark,
        read_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice"),
        omor, ["o_orderkey"], num_buckets=64,
    )
    pmor = f"{work}/part_mor"
    merge_upsert_mor(
        spark, read_table(spark, sf_dir, "part"), pmor,
        ["p_partkey"], num_buckets=32,
    )
    lview = f"{work}/left_star_view"
    build_join_view_nway(
        spark,
        [
            {"path": mtarget, "key_cols": ["l_key"],
             "cols": ["l_key", "l_orderkey", "l_partkey", "l_quantity"]},
            {"path": omor, "key_cols": ["o_orderkey"],
             "cols": ["o_orderkey", "o_totalprice"],
             "on": [("l_orderkey", "o_orderkey")]},
            {"path": pmor, "key_cols": ["p_partkey"],
             "cols": ["p_partkey", "p_brand"],
             "on": [("l_partkey", "p_partkey")]},
        ],
        lview, num_buckets=64, compact_every=None, how="left",
    )

    # mimic the bench's 3 fact ticks so the view carries fact deltas
    for step in (7, 8, 9):
        mut = li.withColumn(
            "l_quantity",
            F.when(
                (F.col("l_orderkey") >= 40) & (F.col("l_orderkey") < 60),
                F.col("l_quantity") + 3 * step,
            ).otherwise(F.col("l_quantity")),
        )
        merge_upsert_mor(spark, mut, mtarget, ["l_key"], num_buckets=256)
        refresh_join_view(spark, lview)

    # instrument
    for name in ("_signed_delta", "_big_side", "_join_frames",
                 "merge_upsert_mor", "mor_history", "read_mor"):
        if hasattr(ijn, name):
            timed(ijn, name)
    for name in ("_signed_delta", "_big_side", "_join_frames",
                 "merge_upsert_mor"):
        timed(ij, name)
    timed(ijn, "_land_nway_terms")
    # inside the merge itself
    from presencia_etl_spark.sinks import mor as mor_mod
    from presencia_etl_spark.sinks import digest_store as dg_mod
    for name in ("_read_deltas", "_commit_delta", "_fetch_dirty_rows",
                 "read_mor", "_delta_latest", "compact_mor",
                 "_recover_empty_base", "_gc_orphan_staging"):
        if hasattr(mor_mod, name):
            timed(mor_mod, name)
    timed(dg_mod, "save")
    timed(dg_mod, "load")
    from presencia_etl_spark.operators import cdc as cdc_mod
    for name in ("with_cdc_key", "with_row_hash", "collect_digest_delta"):
        timed(cdc_mod, name)
    # time every Spark ACTION from the classic DataFrame class
    from pyspark.sql.classic import dataframe as _cdf
    for name in ("collect", "count"):
        orig_m = getattr(_cdf.DataFrame, name)

        def make(nm, om):
            def wrap(self, *a, **kw):
                t0 = time.perf_counter()
                try:
                    return om(self, *a, **kw)
                finally:
                    PHASES.append((f"df.{nm}", time.perf_counter() - t0))
            return wrap

        setattr(_cdf.DataFrame, name, make(name, orig_m))

    part_src = read_table(spark, sf_dir, "part")
    tracker = sc.statusTracker()
    for lo in (1, 51, 101):
        mutated = part_src.filter(
            (F.col("p_partkey") >= lo) & (F.col("p_partkey") < lo + 50)
        ).withColumn(
            "p_brand", F.concat(F.lit(f"Brand#D{lo}+"), F.col("p_brand"))
        )
        merge_upsert_mor(spark, mutated, pmor, ["p_partkey"], num_buckets=32)
        PHASES.clear()
        before_jobs = set(tracker.getJobIdsForGroup() or [])
        t0 = time.perf_counter()
        r = refresh_join_view(spark, lview)
        dt = time.perf_counter() - t0
        n_jobs = len(set(tracker.getJobIdsForGroup() or []) - before_jobs)
        print(f"\n=== dim tick lo={lo}: {dt:.2f}s, jobs={n_jobs}, "
              f"mode={r.get('mode')} ups={r.get('upserts')} dels={r.get('deletes')}")
        agg: dict[str, list] = {}
        for n, s in PHASES:
            agg.setdefault(n, []).append(s)
        for n, ss in sorted(agg.items(), key=lambda kv: -sum(kv[1])):
            print(f"  {n:>18}: n={len(ss):3d} total={sum(ss):6.2f}s "
                  f"max={max(ss):5.2f}s")


if __name__ == "__main__":
    main()

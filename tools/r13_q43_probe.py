#!/usr/bin/env python
"""Per-rep q43 timing probe: isolation vs in-sweep-context.

Mode 'iso'  — 6 back-to-back q43 reps in a fresh session.
Mode 'ctx'  — run q36..q42 once (bench order context), then 6 q43 reps.
Prints per-rep wall + job counts, so a degrading rep pattern (vs a flat
one) separates accumulating-state effects from ambient noise.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod
from presencia_etl_spark.session import get_spark


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "iso"
    reps = int(os.environ.get("R13_REPS", "6"))
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r13-q43-probe")
    spark.range(10).count()
    q = entrymod.queries()
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    if mode == "ctx":
        for name in list(q):
            if name < "q43" and name >= "q36":
                t0 = time.perf_counter()
                q[name](spark, sf).collect()
                print(f"ctx {name}: {time.perf_counter() - t0:.2f}s")
    name = "q43_ivf_topk"
    for rep in range(reps):
        group = f"probe:q43:{rep}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        rows = q[name](spark, sf).collect()
        dt = time.perf_counter() - t0
        n_jobs = len(tracker.getJobIdsForGroup(group))
        print(f"rep {rep}: {dt:.2f}s jobs={n_jobs} rows={len(rows)}")


if __name__ == "__main__":
    main()

"""Thin CLI over the three pipelines (the EP3 control-plane analog).

The reference exposes its scripts over a Flask HTTP server (``server.py``);
the ``serve`` subcommand starts the stdlib analog
(presencia_etl_spark/server.py) with the same trigger surface.

Usage:
    python -m presencia_etl_spark full-sync   --source DIR --target DIR
    python -m presencia_etl_spark incremental --source DIR --target DIR
    python -m presencia_etl_spark reconcile   --source DIR --table orders \
        --date-col o_orderdate
    python -m presencia_etl_spark serve --port 8000
    python -m presencia_etl_spark compact --target DIR   # mor / index / parquet
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F

from presencia_etl_spark.session import get_spark
from presencia_etl_spark.sources.readers import read_parquet


def _load_tables(spark, source: str, names: list[str]):
    import glob
    import os

    if names:
        return {n: read_parquet(spark, f"{source}/{n}.parquet") for n in names}
    found = {}
    for p in sorted(glob.glob(f"{source}/*.parquet")):
        found[os.path.basename(p)[: -len(".parquet")]] = read_parquet(spark, p)
    return found


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="presencia_etl_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    for cmd in ("full-sync", "incremental"):
        p = sub.add_parser(cmd)
        p.add_argument("--source", required=True, help="dir of <table>.parquet inputs")
        p.add_argument("--target", required=True, help="warehouse output dir")
        p.add_argument("--tables", nargs="*", default=[], help="subset (default: all found)")
        p.add_argument("--key", nargs="*", default=[], help="key columns (default: first column)")
        p.add_argument(
            "--buckets",
            type=int,
            default=0,
            help="key-hash bucket count for the partitioned merge state "
            "(0 = flat state; use for large tables so sparse syncs rewrite "
            "only dirty buckets)",
        )
        p.add_argument(
            "--mor",
            action="store_true",
            help="merge-on-read state: each incremental sync writes only "
            "its O(changes) delta (read back via sinks.mor.read_mor; "
            "compaction folds deltas into the bucketed base)",
        )
        p.add_argument(
            "--sync-deletes",
            action="store_true",
            help="snapshot-diff sync (requires --mor): tombstone live keys "
            "the source snapshot no longer contains — only for sources "
            "that export FULL snapshots per run",
        )
        p.add_argument(
            "--atomic",
            action="store_true",
            help="(incremental + --mor only) commit the WHOLE registry as "
            "one transaction (sinks.txn): a crash leaves every table at "
            "the old run or the new run, never a mix",
        )

    p = sub.add_parser("serve", help="HTTP control plane (reference server.py analog)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument(
        "--warehouse-root",
        default=None,
        help="fence for /run/clean: only paths inside this dir may be dropped "
        "(endpoint disabled when unset)",
    )

    p = sub.add_parser(
        "compact",
        help="compact a state dir: merge-on-read target (folds deltas), "
        "MinHash index (restores range-sorted file-skipping layout), or "
        "plain/bucketed parquet (rewrites to ~target-sized files)",
    )
    p.add_argument("--target", required=True, help="state directory to compact")
    p.add_argument(
        "--file-mb", type=int, default=128, help="target file size for plain parquet"
    )
    p.add_argument(
        "--keep-last",
        type=int,
        default=0,
        help="MOR only: retain the newest N deltas (snapshot/change-feed "
        "history) instead of folding everything",
    )
    p.add_argument(
        "--consumer-checkpoint",
        action="append",
        default=[],
        metavar="DIR",
        help="MOR only, repeatable: a streaming change-feed consumer's "
        "checkpoint dir; compaction raises keep_last so no delta the "
        "consumer has not yet committed is folded (can slow compaction, "
        "never loses events)",
    )

    p = sub.add_parser(
        "rebucket",
        help="rewrite a bucketed COW state (or MOR base) at a new bucket "
        "count — the layout-evolution step when state outgrows its modulus",
    )
    p.add_argument("--target", required=True, help="state directory")
    p.add_argument("--buckets", type=int, required=True, help="new bucket count")

    p = sub.add_parser(
        "delete",
        help="row-level DELETE from a state dir (GDPR erasure / TTL "
        "retention): MOR targets write an O(matches) tombstone delta, "
        "bucketed COW targets rewrite only dirty buckets, flat targets "
        "rewrite atomically",
    )
    p.add_argument("--target", required=True, help="state directory")
    p.add_argument(
        "--where", default=None, help="SQL predicate; rows where TRUE are deleted"
    )
    p.add_argument(
        "--retain-days",
        type=int,
        default=None,
        help="TTL form: delete rows with --date-col older than N days "
        "(instead of --where)",
    )
    p.add_argument(
        "--date-col", default=None, help="date column for --retain-days"
    )

    p = sub.add_parser(
        "sql",
        help="read-only SQL over a synced warehouse: registers every state "
        "dir as a view (layout-aware: MOR views reconcile deltas and drop "
        "tombstones) and runs one SELECT; --generation N pins MOR views "
        "to sync run N's consistent cross-table snapshot (-1 = latest)",
    )
    p.add_argument("--warehouse", required=True, help="warehouse root dir")
    p.add_argument("--query", required=True, help="SELECT/WITH/SHOW statement")
    p.add_argument(
        "--generation", type=int, default=None,
        help="pin MOR views to recorded sync generation N (-1 = latest)",
    )
    p.add_argument(
        "--include-internal", action="store_true",
        help="expose engine columns (_kb, _cdc_key) in the views",
    )
    p.add_argument("--limit", type=int, default=1000, help="max rows printed")

    p = sub.add_parser(
        "diff",
        help="row-level diff of two state dirs (replication verify / "
        "post-migration audit): digest-compared per micro-bucket, so two "
        "mostly-identical large states cost one narrow scan each plus a "
        "join over only the differing micro-buckets — neither side is "
        "fully shuffled; prints per-kind counts and sample keys",
    )
    p.add_argument("--left", required=True, help="state dir (flat/bucketed/MOR)")
    p.add_argument("--right", required=True, help="state dir (flat/bucketed/MOR)")
    p.add_argument(
        "--key", nargs="*", default=[],
        help="key columns (default: persisted _cdc_key identity)",
    )
    p.add_argument("--sample", type=int, default=20, help="max keys printed per kind")

    p = sub.add_parser(
        "sync-replica",
        help="converge one managed state dir onto another (replication / "
        "migration): when both sides carry valid digest sidecars the "
        "no-change pass is proven with ZERO Spark jobs, and a sparse "
        "divergence classifies only the differing micro-buckets' rows",
    )
    p.add_argument("--source", required=True, help="managed state dir (truth)")
    p.add_argument("--target", required=True, help="managed state dir to converge")
    p.add_argument("--key", nargs="+", required=True, help="key columns")
    p.add_argument(
        "--no-delete",
        action="store_true",
        help="MOR targets only: skip tombstoning keys the source dropped "
        "(COW targets never delete regardless — trap N6)",
    )

    p = sub.add_parser(
        "replicate",
        help="log-shipping catch-up: apply the source MOR table's change "
        "feed since the replica's cursor as ONE atomic mixed batch "
        "(upserts + tombstones, no source base scan); first call / "
        "compacted-away history fall back to a snapshot sync-replica "
        "pass and re-pin the cursor",
    )
    p.add_argument("--source", required=True, help="MOR state dir (truth)")
    p.add_argument("--target", required=True, help="MOR replica state dir")
    p.add_argument("--key", nargs="+", required=True, help="key columns")

    p = sub.add_parser(
        "maintain",
        help="inspect a managed state and run the nightly-optimize "
        "policy: compact a deep MOR delta log (consumer-lag-guarded) "
        "and seed an absent/stale digest sidecar; --dry-run reports "
        "without a JVM",
    )
    p.add_argument("--target", required=True, help="managed state dir")
    p.add_argument("--compact-threshold", type=int, default=16)
    p.add_argument("--keep-last", type=int, default=0)
    p.add_argument(
        "--consumer-checkpoint", action="append", default=[],
        help="change-feed consumer checkpoint dir (repeatable); "
        "compaction keeps every delta an unfinished consumer still needs",
    )
    p.add_argument("--no-seed", action="store_true")
    p.add_argument("--dry-run", action="store_true")

    p = sub.add_parser(
        "refresh-view",
        help="fold both sources' change feeds into a maintained join "
        "view (plans/incremental_join); noop when neither source moved "
        "(fs metadata — no JVM)",
    )
    p.add_argument("--view", required=True, help="join-view state dir")

    p = sub.add_parser(
        "refresh-agg",
        help="fold the source's change feed into a maintained GROUP BY "
        "snapshot (plans/incremental_agg); noop when the cursor is "
        "current (fs metadata — no JVM)",
    )
    p.add_argument("--agg", required=True, help="aggregate snapshot dir")
    p.add_argument("--source", required=True, help="source MOR state dir")

    p = sub.add_parser("reconcile")
    p.add_argument("--source", required=True)
    p.add_argument("--target", required=True)
    p.add_argument("--table", required=True)
    p.add_argument("--date-col", required=True)
    p.add_argument("--last-n-months", type=int, default=None)

    args = ap.parse_args(argv)

    if args.cmd == "sync-replica":
        # Handled BEFORE any session exists: the steady-state (no-change)
        # sync is proven from the two digest sidecars driver-side, so a
        # cron's most common pass never pays JVM spin-up at all — a
        # session is created lazily only when a merge is needed.
        from presencia_etl_spark.plans.replica_sync import sync_replica

        out = sync_replica(
            None, args.source, args.target, list(args.key),
            delete_missing=False if args.no_delete else None,
        )
        print(json.dumps({"cmd": "sync-replica", "result": out}))
        return 0

    if args.cmd == "replicate":
        # Also pre-session: the steady-state pass (cursor == source seq,
        # pure fs metadata) returns without starting a JVM.
        from presencia_etl_spark.plans.replica_sync import replicate_changes

        out = replicate_changes(None, args.source, args.target, list(args.key))
        print(json.dumps({"cmd": "replicate", "result": out}))
        return 0

    if args.cmd == "refresh-view":
        # Pre-session noop: both cursors current is pure fs metadata.
        from presencia_etl_spark.plans.incremental_join import (
            join_view_info,
        )
        from presencia_etl_spark.sinks.mor import mor_history

        meta = join_view_info(args.view)
        ha = mor_history(meta["a_path"])
        hb = mor_history(meta["b_path"])
        if ha["seq"] == meta["a_seq"] and hb["seq"] == meta["b_seq"]:
            out = {"mode": "noop", "a_seq": meta["a_seq"], "b_seq": meta["b_seq"]}
        else:
            from presencia_etl_spark.plans.incremental_join import (
                refresh_join_view,
            )

            spark = get_spark(app_name="refresh-view")
            spark.sparkContext.setLogLevel("ERROR")
            out = refresh_join_view(spark, args.view)
        print(json.dumps({"cmd": "refresh-view", "result": out}))
        return 0

    if args.cmd == "refresh-agg":
        from presencia_etl_spark.plans.incremental_agg import (
            agg_snapshot_info,
        )
        from presencia_etl_spark.sinks.mor import mor_history

        info = agg_snapshot_info(args.agg)
        if mor_history(args.source)["seq"] == info["as_of_seq"]:
            out = {"mode": "noop", "as_of_seq": info["as_of_seq"]}
        else:
            from presencia_etl_spark.plans.incremental_agg import (
                refresh_agg_snapshot,
            )

            spark = get_spark(app_name="refresh-agg")
            spark.sparkContext.setLogLevel("ERROR")
            out = refresh_agg_snapshot(spark, args.source, args.agg)
        print(json.dumps({"cmd": "refresh-agg", "result": out}))
        return 0

    if args.cmd == "maintain":
        # Pre-session: inspection is fs metadata; a session is created
        # lazily only when an action fires (never under --dry-run).
        from presencia_etl_spark.sinks.maintenance import maintain

        out = maintain(
            None,
            args.target,
            compact_threshold=args.compact_threshold,
            keep_last=args.keep_last,
            consumer_checkpoints=args.consumer_checkpoint or None,
            seed=not args.no_seed,
            dry_run=args.dry_run,
        )
        print(json.dumps({"cmd": "maintain", "result": out}))
        return 0

    spark = get_spark(app_name=f"presencia-etl-{args.cmd}")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "serve":
        from presencia_etl_spark.server import serve

        serve(spark, host=args.host, port=args.port, warehouse_root=args.warehouse_root)
        return 0

    if args.cmd in ("full-sync", "incremental"):
        from presencia_etl_spark.sources.registry import TableConfig

        tables = _load_tables(spark, args.source, args.tables)
        configs = {
            n: TableConfig(
                n,
                key_cols=list(args.key) or [df.columns[0]],
                num_buckets=args.buckets,
                merge_mode="mor" if getattr(args, "mor", False) else "cow",
                sync_deletes=getattr(args, "sync_deletes", False),
            )
            for n, df in tables.items()
        }
        if args.cmd == "full-sync":
            from presencia_etl_spark.plans.full_sync import full_sync

            out = full_sync(spark, tables, configs, args.target)
        else:
            from presencia_etl_spark.plans.incremental_sync import incremental_sync

            out = incremental_sync(
                spark, tables, configs, args.target,
                atomic=getattr(args, "atomic", False),
            )
        print(json.dumps({"cmd": args.cmd, "result": out}))
        return 0

    if args.cmd == "compact":
        import os

        target = args.target
        if os.path.exists(os.path.join(target, "_mor_meta.json")):
            from presencia_etl_spark.sinks.mor import compact_mor

            out = {
                "kind": "mor",
                **compact_mor(
                    spark,
                    target,
                    keep_last=args.keep_last,
                    consumer_checkpoints=args.consumer_checkpoint or None,
                ),
            }
            # Folding deltas raises this table's snapshot floor; if the
            # state lives in a generation-tracked warehouse, drop the
            # manifest entries the fold just expired.
            wh_root = os.path.dirname(os.path.abspath(target))
            if os.path.exists(os.path.join(wh_root, "_warehouse_manifest.json")):
                from presencia_etl_spark.plans.generations import (
                    prune_generations,
                )

                out["generations_pruned"] = prune_generations(wh_root)["pruned"]
        elif os.path.exists(os.path.join(target, "_index_meta.json")):
            from presencia_etl_spark.operators.dedup_index import (
                compact_minhash_index,
            )

            out = {"kind": "minhash_index", **compact_minhash_index(spark, target)}
        else:
            from presencia_etl_spark.sinks.writers import compact_parquet

            out = {
                "kind": "parquet",
                **compact_parquet(spark, target, target_file_mb=args.file_mb),
            }
        print(json.dumps({"cmd": "compact", "result": out}))
        return 0

    if args.cmd == "rebucket":
        from presencia_etl_spark.sinks.writers import rebucket

        out = rebucket(spark, args.target, args.buckets)
        print(json.dumps({"cmd": "rebucket", "result": out}))
        return 0

    if args.cmd == "sql":
        from presencia_etl_spark.sql import run_sql

        out = run_sql(
            spark,
            args.warehouse,
            args.query,
            generation=args.generation,
            include_internal=args.include_internal,
            limit=args.limit,
        )
        print(json.dumps({"cmd": "sql", "result": out}, default=str))
        return 0

    if args.cmd == "diff":
        from presencia_etl_spark.operators.cdc import KEY_COL, diff_states
        from presencia_etl_spark.sinks import digest_store
        from presencia_etl_spark.sql import read_state

        # Digest fast path: when BOTH states carry a valid sidecar, the
        # per-micro-bucket digests (folded over the persisted _cdc_key +
        # data-only row_hash, so independently-written replicas of the
        # same data agree) answer "identical?" from two file-metadata
        # walks plus two 16K-row local reads — ZERO Spark jobs for the
        # replication-verify green path, and on mismatch the differing
        # micro-buckets feed diff_states directly, skipping its scans'
        # digest pass. Only for the default _cdc_key identity — custom
        # --key columns may not match the sidecars' fold.
        digest_proven = False
        dense_known = False
        known_dirty = None
        if not args.key:
            dl = digest_store.load(args.left)
            dr = digest_store.load(args.right)
            if dl is not None and dr is not None:
                if dl == dr:
                    out = {"identical": True, "counts": {}, "sample": {},
                           "digest_proven": True}
                    print(json.dumps({"cmd": "diff", "result": out}, default=str))
                    return 0
                occupied = set(dl) | set(dr)
                dirty = sorted(
                    mb for mb in occupied if dl.get(mb) != dr.get(mb)
                )
                if 2 * len(dirty) >= len(occupied):
                    # Densely-diverged states (post-incident / far-apart
                    # versions): the same decline rule every digest
                    # consumer applies — per-row IN-filters over
                    # thousands of buckets would prune almost nothing.
                    # The sidecars still taught us the diff is dense, so
                    # skip diff_states' own digest pass too.
                    dense_known = True
                else:
                    known_dirty = dirty
                    digest_proven = True

        # When the sidecars named the dirty micro-buckets, read ONLY
        # their _kb= dirs (listing-level for MOR, partition-level for
        # bucketed COW): diffing two 100 TB replicas over one changed
        # key reads a handful of buckets, not both tables. diff_states
        # still filters to the exact dirty micro-buckets.
        if known_dirty is not None:
            from presencia_etl_spark.plans.replica_sync import (
                read_managed_pruned,
            )

            left = read_managed_pruned(spark, args.left, known_dirty)
            right = read_managed_pruned(spark, args.right, known_dirty)
        else:
            left = read_state(spark, args.left)
            right = read_state(spark, args.right)
        keys = list(args.key) or [KEY_COL]
        for side, df in (("--left", left), ("--right", right)):
            missing = [k for k in keys if k not in df.columns]
            if missing:
                ap.error(
                    f"{side} state lacks key column(s) {missing}; pass "
                    "--key for states not written by the merge sinks"
                )
        d = diff_states(
            left, right, keys,
            digest_prune=not dense_known,
            dirty_mb=known_dirty,
        ).cache()
        try:
            counts = {
                r["diff"]: r["cnt"]
                for r in d.groupBy("diff")
                .agg(F.count(F.lit(1)).alias("cnt"))
                .collect()
            }
            sample = {
                kind: [
                    [row[k] for k in keys]
                    for row in d.filter(F.col("diff") == kind)
                    .limit(args.sample)
                    .collect()
                ]
                for kind in counts
            }
        finally:
            d.unpersist()
        out = {"identical": not counts, "counts": counts, "sample": sample,
               "digest_proven": digest_proven}
        print(json.dumps({"cmd": "diff", "result": out}, default=str))
        return 0

    if args.cmd == "delete":
        from presencia_etl_spark.sinks.lifecycle import apply_retention, delete_rows

        if args.retain_days is not None and not args.date_col:
            ap.error("--retain-days requires --date-col")
        if args.retain_days is None and not args.where:
            ap.error("give --where PRED or --retain-days N --date-col COL")
        if args.retain_days is not None:
            out = apply_retention(
                spark, args.target, args.date_col, keep_days=args.retain_days
            )
        else:
            out = delete_rows(spark, args.target, args.where)
        print(json.dumps({"cmd": "delete", "result": out}))
        return 0

    from presencia_etl_spark.plans.reconcile import monthly_reconcile

    src = read_parquet(spark, f"{args.source}/{args.table}.parquet")
    tgt = read_parquet(spark, f"{args.target}/{args.table}.parquet")
    rec = monthly_reconcile(
        src, tgt, args.date_col, {}, last_n_months=args.last_n_months
    )
    rows = [r.asDict() for r in rec.collect()]
    total_diff = sum(abs(r["cnt_diff"]) for r in rows)
    print(json.dumps({"cmd": "reconcile", "months": rows, "total_abs_diff": total_diff}, default=str))
    return 0 if total_diff == 0 else 1


if __name__ == "__main__":
    sys.exit(main())

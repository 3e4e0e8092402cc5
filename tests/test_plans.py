"""Physical-plan regression tests: pin the optimizer properties the engine
relies on at scale (SCALE.md claims). If a refactor breaks pushdown or
broadcast selection, these fail before the perf regression ships."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

import __spark_entry__ as entrymod


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    def run(name):
        return entrymod.queries()[name](spark, sf_dir)

    return run


class TestPlanProperties:
    def test_filter_and_projection_pushdown(self, q):
        p = plan_of(q("q02_project_filter"))
        assert "PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,F)" in p
        # Column pruning: the scan reads exactly the 3 referenced columns.
        assert "ReadSchema: struct<o_orderkey:bigint,o_orderstatus:string,o_totalprice:double>" in p

    def test_dim_join_broadcasts(self, q):
        p = plan_of(q("q14_join_agg"))
        assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p

    def test_semi_join_broadcasts(self, q):
        p = plan_of(q("q05_semi_join"))
        assert "BroadcastHashJoin" in p and "LeftSemi" in p

    def test_topk_avoids_global_sort(self, q):
        p = plan_of(q("q12_topk_days"))
        assert "TakeOrderedAndProject" in p

    def test_aggregate_is_partial_then_final(self, q):
        p = plan_of(q("q08_monthly_rollup"))
        # Two HashAggregate nodes around one Exchange = map-side combine.
        assert p.count("HashAggregate") >= 2 and "Exchange" in p

    def test_rollup_scan_prunes_columns(self, q):
        p = plan_of(q("q08_monthly_rollup"))
        assert "ReadSchema: struct<o_totalprice:double,o_orderdate:timestamp" in p

    def test_tfidf_pushes_doc_filter_into_scan(self, q):
        """q10's tf branch must scan only doc_id < 10 (PushedFilters) while
        the document-frequency branch scans all docs — two scans, one
        pruned, no full-corpus tf aggregation for 10 docs' output."""
        p = plan_of(q("q10_tfidf"))
        assert "LessThan(doc_id,10)" in p
        assert "BroadcastHashJoin" in p  # df join small side broadcast

    def test_ivf_index_probe_prunes_partitions(self, spark, sf_dir, tmp_path):
        """A saved IVF index is partitioned by cluster; filtering to the
        probed clusters must hit PartitionFilters (only the probed
        posting lists' files are read — the 100 TB contract)."""
        from pyspark.sql import functions as F

        from presencia_etl_spark.operators import similarity

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        assigned, _cent = similarity.build_ivf_index(emb, n_clusters=8)
        path = str(tmp_path / "ivf_plan_index")
        similarity.save_ivf_index(assigned, path)
        loaded = similarity.load_ivf_index(spark, path)
        p = plan_of(loaded.filter(F.col("cluster").isin(1, 3)))
        # partition-level filter on the cluster dirs, not a post-scan Filter
        assert "PartitionFilters: [cluster#" in p and "IN (1,3)" in p

    def test_bucketed_tables_join_without_exchange(self, spark, sf_dir):
        """Two tables bucketed identically on the join key must join with
        ZERO Exchange operators (broadcast disabled to force the worst
        case) — the co-location layout SCALE.md promises for repeated
        100 TB fact-state syncs. Bucket metadata only exists through the
        catalog, hence saveAsTable."""
        from pyspark.sql import functions as F

        from presencia_etl_spark.sinks.writers import write_bucketed_table

        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
        write_bucketed_table(
            orders, "t_orders_b", ["o_custkey"], num_buckets=8,
            sort_cols=["o_custkey"],
        )
        write_bucketed_table(
            cust, "t_cust_b", ["c_custkey"], num_buckets=8,
            sort_cols=["c_custkey"],
        )
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            j = spark.table("t_orders_b").join(
                spark.table("t_cust_b"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            p = plan_of(j)
            assert "Exchange" not in p, p
            assert "SortMergeJoin" in p
            assert "Bucketed: true" in p
            # And the result is right (same rows as the shuffled join).
            n_bucketed = j.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            spark.sql("DROP TABLE IF EXISTS t_orders_b")
            spark.sql("DROP TABLE IF EXISTS t_cust_b")
        n_plain = orders.join(
            cust, F.col("o_custkey") == F.col("c_custkey")
        ).count()
        assert n_bucketed == n_plain


class TestDedupIndexProbePlan:
    def test_small_probe_pushes_band_keys_and_broadcasts_batch(
        self, spark, sf_dir, tmp_path
    ):
        """A trickle-batch probe of the persisted MinHash index must (a)
        push its band hashes into the band-table scan as an In filter —
        that is what turns a 100 TB index read into a few row groups —
        and (b) broadcast the BATCH side (never the index)."""
        from pyspark.sql import functions as F

        from presencia_etl_spark.operators import dedup_index

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        idx = str(tmp_path / "idx")
        dedup_index.build_minhash_index(spark, docs, "doc_id", "text", idx)
        batch = spark.createDataFrame(
            [(10**9, "the quick brown fox jumps over a sleepy dog")],
            ["doc_id", "text"],
        )
        lazy = dedup_index.query_minhash_index(
            spark, batch, "doc_id", "text", idx, eager=False
        )
        p = plan_of(lazy)
        assert "In(band_hash, [" in p, p
        scan_lines = [
            ln for ln in p.splitlines() if "Location: InMemoryFileIndex" in ln
        ]
        assert any("idx/bands" in ln for ln in scan_lines), scan_lines
        # The band join must STREAM the index scan and broadcast the probe:
        # tree shape `BroadcastHashJoin ... BuildRight` whose left child is
        # the filtered parquet scan.
        import re

        assert re.search(
            r"BroadcastHashJoin Inner BuildRight \(\d+\)\n"
            r"([^\n]*?):- Filter \(\d+\)\n"
            r"\1:  \+- Scan parquet",
            p,
        ), p

    def test_duplicate_heavy_batch_sizes_broadcast_on_probe_rows(
        self, spark, sf_dir, tmp_path, monkeypatch
    ):
        """The broadcast decision must be sized on probe ROWS, not distinct
        band hashes: a duplicate-heavy batch (many docs, near-identical
        text) hits few distinct hashes — qualifying for the In-pushdown —
        while its probe frame carries |docs|x bands rows. Forcing that
        frame into a broadcast would ship it to every executor."""
        from pyspark.sql import functions as F

        from presencia_etl_spark.operators import dedup_index

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        idx = str(tmp_path / "idx2")
        dedup_index.build_minhash_index(spark, docs, "doc_id", "text", idx)
        # 6 copies of one text: 8 distinct band hashes, 48 probe rows.
        batch = spark.createDataFrame(
            [(10**9 + i, "the quick brown fox jumps over a sleepy dog")
             for i in range(6)],
            ["doc_id", "text"],
        )

        def hints(df):
            return df._jdf.queryExecution().analyzed().toString().count(
                "strategy=broadcast"
            )

        # Probe rows (48) above the broadcast limit: pushdown still fires,
        # but the probe joins WITHOUT a broadcast hint.
        monkeypatch.setattr(dedup_index, "PROBE_BROADCAST_LIMIT", 10)
        lazy = dedup_index.query_minhash_index(
            spark, batch, "doc_id", "text", idx, eager=False
        )
        assert "In(band_hash, [" in plan_of(lazy)
        assert hints(lazy) == 0, "48-row probe must not be force-broadcast"
        # Same batch under the real limit: the hint is present (control).
        monkeypatch.setattr(dedup_index, "PROBE_BROADCAST_LIMIT", 5_000_000)
        hinted = dedup_index.query_minhash_index(
            spark, batch, "doc_id", "text", idx, eager=False
        )
        assert hints(hinted) >= 1


class TestTimeJoinPlans:
    """As-of and range joins (operators/joins.py) must never degenerate into
    theta-join plans — that's the difference between 'one shuffle' and
    'cartesian explosion' at 100 TB."""

    def test_asof_join_is_one_window_shuffle_no_join(self, q):
        p = plan_of(q("q37_asof_join"))
        # Union-tag-window plan: no join operator of any kind, exactly one
        # hash-partitioning Exchange (the window); the trailing
        # SinglePartition exchange for the global agg is fine.
        assert "Join" not in p, p
        assert "Window" in p
        import re

        assert len(re.findall(r"Arguments: hashpartitioning\(", p)) == 1, p

    def test_range_join_is_hash_equi_join(self, q):
        p = plan_of(q("q38_range_join"))
        # Band-bucketed equi-join: a hash join on (key, bucket), the |l-r|
        # predicate applied as a post-join condition — never a cartesian or
        # broadcast-nested-loop theta join.
        assert "CartesianProduct" not in p, p
        assert "BroadcastNestedLoopJoin" not in p, p
        assert "BroadcastHashJoin" in p or "SortMergeJoin" in p or "ShuffledHashJoin" in p, p


class TestMorReadPlan:
    def test_read_view_broadcasts_delta_side(self, spark, tmp_path):
        """read_mor's reconcile must broadcast the (small) delta key set —
        a SortMergeJoin here would shuffle the full base on every read."""
        from pyspark.sql import functions as F

        from presencia_etl_spark.sinks import mor

        target = str(tmp_path / "mor")
        src = spark.range(0, 5000).select(
            F.col("id").cast("string").alias("K"),
            (F.col("id") % 7).cast("string").alias("V"),
        )
        mor.merge_upsert_mor(spark, src, target, ["K"], num_buckets=8)
        m = src.withColumn(
            "V", F.when(F.col("K") == "9", F.lit("x")).otherwise(F.col("V"))
        )
        mor.merge_upsert_mor(spark, m, target, ["K"], num_buckets=8)

        p = plan_of(mor.read_mor(spark, target))
        assert "BroadcastHashJoin LeftAnti BuildRight" in p, p
        assert "SortMergeJoin" not in p, p


class TestKeySortedBucketLayout:
    def test_bucket_files_are_key_sorted_for_rowgroup_skipping(
        self, spark, tmp_path
    ):
        """Every bucketed write (COW initial load, dirty-bucket rewrite,
        MOR compaction) must land KEY-SORTED files: parquet row-group
        min/max stats on _cdc_key are then disjoint ranges, so the
        In(_cdc_key) pushdown used by the MOR identity fetch and key
        deletes skips row groups WITHIN a bucket — the pruning level
        below the _kb= dir pruning."""
        import pyarrow.parquet as pq
        from pyspark.sql import functions as F

        from presencia_etl_spark.operators import cdc
        from presencia_etl_spark.sinks import mor
        from presencia_etl_spark.sinks.writers import merge_upsert_partitioned

        def assert_sorted(state_dir):
            import glob

            files = glob.glob(f"{state_dir}/_kb=*/*.parquet")
            assert files
            for f in files:
                keys = pq.read_table(f, columns=[cdc.KEY_COL])[
                    cdc.KEY_COL
                ].to_pylist()
                assert keys == sorted(keys), f

        src = spark.range(0, 3000).select(
            F.col("id").cast("string").alias("K"),
            (F.col("id") % 7).cast("string").alias("V"),
        )

        cow = str(tmp_path / "cow")
        merge_upsert_partitioned(spark, src, cow, ["K"], num_buckets=4)
        assert_sorted(cow)
        # Dirty-bucket rewrite preserves the property.
        m = src.withColumn(
            "V", F.when(F.col("K") == "42", F.lit("x")).otherwise(F.col("V"))
        )
        merge_upsert_partitioned(spark, m, cow, ["K"], num_buckets=4)
        assert_sorted(cow)

        mor_t = str(tmp_path / "mor")
        mor.merge_upsert_mor(spark, src, mor_t, ["K"], num_buckets=4)
        mor.merge_upsert_mor(spark, m, mor_t, ["K"], num_buckets=4)
        mor.compact_mor(spark, mor_t)
        assert_sorted(f"{mor_t}/base")

        # And the pushdown the layout serves: an In(_cdc_key) predicate
        # reaches the parquet scan as a pushed filter.
        plan = plan_of(
            spark.read.parquet(cow).filter(
                F.col(cdc.KEY_COL).isin("k1", "k2")
            )
        )
        assert f"In({cdc.KEY_COL}" in plan, plan

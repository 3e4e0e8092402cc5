"""Maintained top-K head (plans/incremental_topk) — every refresh is
differential-tested against a full recompute from the MOR state, across
randomized merge/delete sequences, ties, NULL group keys, evictions,
the exactness-gate rebuild, compaction, and the JVM-parity ordering."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from presencia_etl_spark.plans import incremental_agg as ia
from presencia_etl_spark.plans import incremental_topk as it
from presencia_etl_spark.sinks import driver_mor as dm
from presencia_etl_spark.sinks import mor

SCHEMA = StructType(
    [
        StructField("K", StringType()),
        StructField("cat", StringType()),
        StructField("amount", DoubleType()),
        StructField("qty", LongType()),
    ]
)

# enough distinct groups that a small buffer hides some of them
CATS = [f"g{i:02d}" for i in range(12)] + [None]


def _rows(rng, keys):
    return [
        (
            str(k),
            rng.choice(CATS),
            None if rng.random() < 0.15 else round(rng.uniform(-50, 50), 2),
            rng.randrange(0, 10),
        )
        for k in keys
    ]


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _expected_topk(spark, mor_path, measure, k):
    df = mor.read_mor(spark, mor_path)
    if measure == ia.COUNT_COL:
        agg = df.groupBy("cat").agg(F.count("*").alias(measure))
    else:
        col = measure[len("sum_"):]
        agg = df.groupBy("cat").agg(F.sum(col).cast("double").alias(measure))
    return [
        (r["cat"], r[measure])
        for r in (
            agg.where(F.col(measure).isNotNull())
            .orderBy(F.col(measure).desc(), F.col("cat").asc())
            .limit(k)
            .collect()
        )
    ]


def _got_topk(head_path, measure, k=None):
    return [(r["cat"], r[measure]) for r in it.read_topk_rows(head_path, k)]


def _assert_head_matches(spark, mor_path, head_path):
    meta = it.topk_head_info(head_path)
    measure, k = meta["measure"], meta["k"]
    exp = _expected_topk(spark, mor_path, measure, k)
    got = _got_topk(head_path, measure)
    if measure == ia.COUNT_COL:
        assert got == exp
    else:
        assert [g for g, _ in got] == [g for g, _ in exp]
        for (_, a), (_, b) in zip(got, exp):
            assert a == pytest.approx(b, abs=1e-6)


def _seed(spark, tmp_path, rng, measure="n_rows", k=3, buffer=None, n=200):
    tmp_path.mkdir(parents=True, exist_ok=True)
    mor_t = str(tmp_path / "m")
    agg_t = str(tmp_path / "a")
    head_t = str(tmp_path / "h")
    mor.merge_upsert_mor(
        spark, _df(spark, _rows(rng, range(n))), mor_t, ["K"],
        num_buckets=8, compact_every=None,
    )
    ia.build_agg_snapshot(spark, mor_t, agg_t, ["cat"], ["amount", "qty"])
    r = it.build_topk_head(
        spark, mor_t, agg_t, head_t, k=k, measure=measure, buffer=buffer
    )
    assert r["mode"] == "build"
    return mor_t, agg_t, head_t


class TestBuildAndRead:
    def test_count_measure_matches_recompute(self, spark, tmp_path):
        rng = random.Random(401)
        mor_t, _agg_t, head_t = _seed(spark, tmp_path, rng)
        _assert_head_matches(spark, mor_t, head_t)

    def test_sum_measure_matches_recompute(self, spark, tmp_path):
        rng = random.Random(402)
        mor_t, _agg_t, head_t = _seed(
            spark, tmp_path, rng, measure="sum_qty", k=4
        )
        _assert_head_matches(spark, mor_t, head_t)

    def test_small_universe_has_no_floor(self, spark, tmp_path):
        # every group fits in the buffer → nothing hidden, floor absent
        rng = random.Random(403)
        _m, _a, head_t = _seed(spark, tmp_path, rng, k=3, buffer=100)
        assert it.topk_head_info(head_t)["floor"] is None

    def test_read_validation(self, spark, tmp_path):
        rng = random.Random(404)
        mor_t, agg_t, head_t = _seed(spark, tmp_path, rng, k=3)
        assert len(it.read_topk_rows(head_t, 2)) == 2
        with pytest.raises(ValueError, match="top-3"):
            it.read_topk_rows(head_t, 5)
        with pytest.raises(ValueError, match="measure"):
            it.build_topk_head(
                spark, mor_t, agg_t, str(tmp_path / "h2"), k=3,
                measure="sum_nope",
            )
        with pytest.raises(ValueError, match="k must be positive"):
            it.build_topk_head(
                spark, mor_t, agg_t, str(tmp_path / "h3"), k=0
            )

    def test_read_topk_df(self, spark, tmp_path):
        rng = random.Random(405)
        mor_t, _a, head_t = _seed(spark, tmp_path, rng)
        rows = it.read_topk(spark, head_t).collect()
        rows.sort(key=lambda r: r["rank"])
        assert [(r["cat"], r["n_rows"]) for r in rows] == _got_topk(
            head_t, "n_rows"
        )


class TestIncrementalFolds:
    def test_growing_measure_folds_never_rebuild(self, spark, tmp_path):
        # a float measure that only GROWS (new keys, positive amounts):
        # no ties at the floor and no retractions, so the exactness gate
        # stays green and every refresh is an O(changes) fold
        rng = random.Random(411)
        mor_t, agg_t, head_t = _seed(
            spark, tmp_path, rng, measure="sum_amount", k=3, buffer=5
        )
        for step in range(4):
            lo = 1000 + 40 * step
            batch = [
                (
                    str(k),
                    rng.choice(CATS),
                    round(rng.uniform(1, 50), 2),
                    rng.randrange(0, 10),
                )
                for k in range(lo, lo + 15)
            ]
            mor.merge_upsert_mor(
                spark, _df(spark, batch), mor_t, ["K"], compact_every=None,
            )
            r = it.refresh_topk_head(spark, mor_t, agg_t, head_t)
            assert r["mode"] == "incremental", r
            _assert_head_matches(spark, mor_t, head_t)

    def test_noop(self, spark, tmp_path):
        rng = random.Random(412)
        mor_t, agg_t, head_t = _seed(spark, tmp_path, rng)
        assert (
            it.refresh_topk_head(spark, mor_t, agg_t, head_t)["mode"]
            == "noop"
        )

    def test_randomized_differential(self, spark, tmp_path):
        """Upserts + deletes in random interleave; the head matches the
        recompute after every refresh, whatever path it took."""
        rng = random.Random(413)
        mor_t, agg_t, head_t = _seed(
            spark, tmp_path, rng, measure="n_rows", k=3, buffer=6, n=150
        )
        keyspace = 400
        for _step in range(6):
            batch = _rows(rng, rng.sample(range(keyspace), 25))
            dels = [str(x) for x in rng.sample(range(keyspace), 8)]
            mor.merge_upsert_mor(
                spark, _df(spark, batch), mor_t, ["K"],
                compact_every=None,
                delete_keys=spark.createDataFrame(
                    [(d,) for d in dels], "K string"
                ),
            )
            r = it.refresh_topk_head(spark, mor_t, agg_t, head_t)
            assert r["mode"] in ("incremental", "rebuild")
            _assert_head_matches(spark, mor_t, head_t)

    def test_exactness_gate_declines_to_rebuild(self, spark, tmp_path):
        """Delete every row of the leading groups: the fold cannot keep
        k members strictly above the floor → head_invalid decline →
        rebuild → still exact."""
        rng = random.Random(414)
        mor_t, agg_t, head_t = _seed(
            spark, tmp_path, rng, k=3, buffer=4, n=250
        )
        assert it.topk_head_info(head_t)["floor"] is not None
        top_groups = {g for g, _ in _got_topk(head_t, "n_rows")}
        doomed = [
            r["K"]
            for r in mor.read_mor(spark, mor_t)
            .where(F.col("cat").isin([g for g in top_groups if g]))
            .select("K")
            .collect()
        ]
        assert len(doomed) > 0
        dm.decline_counts(reset=True)
        mor.merge_upsert_mor(
            spark, _df(spark, []), mor_t, ["K"], compact_every=None,
            delete_keys=spark.createDataFrame(
                [(d,) for d in doomed], "K string"
            ),
        )
        r = it.refresh_topk_head(spark, mor_t, agg_t, head_t)
        assert r["mode"] == "rebuild"
        assert dm.decline_counts().get("head_invalid", 0) >= 1
        _assert_head_matches(spark, mor_t, head_t)

    def test_compaction_floor_forces_rebuild(self, spark, tmp_path):
        rng = random.Random(415)
        mor_t, agg_t, head_t = _seed(spark, tmp_path, rng)
        mor.merge_upsert_mor(
            spark, _df(spark, _rows(rng, range(500, 520))), mor_t, ["K"],
            compact_every=None,
        )
        mor.compact_mor(spark, mor_t)
        r = it.refresh_topk_head(spark, mor_t, agg_t, head_t)
        assert r["mode"] == "rebuild"
        _assert_head_matches(spark, mor_t, head_t)


class TestDriverPath:
    def test_trickle_fold_runs_zero_jobs(self, spark, tmp_path):
        """The steady state: agg fold + head fold both driver-side —
        zero Spark jobs for the whole refresh."""
        rng = random.Random(421)
        mor_t, agg_t, head_t = _seed(spark, tmp_path, rng, k=3, buffer=8)
        mor.merge_upsert_mor(
            spark, _df(spark, _rows(rng, range(700, 706))), mor_t, ["K"],
            compact_every=None,
        )
        tracker = spark.sparkContext.statusTracker()
        before = set(tracker.getJobIdsForGroup() or [])
        r = it.refresh_topk_head(spark, mor_t, agg_t, head_t)
        n_jobs = len(set(tracker.getJobIdsForGroup() or []) - before)
        assert r["mode"] == "incremental" and r.get("path") == "driver"
        assert n_jobs == 0, f"driver top-k refresh ran {n_jobs} jobs"
        _assert_head_matches(spark, mor_t, head_t)

    def test_twin_equivalence_with_kill_switch(
        self, spark, tmp_path, monkeypatch
    ):
        """The same change sequence through the driver fold and the
        Spark rebuild (kill switch) serves the same top-k."""
        rng1, rng2 = random.Random(422), random.Random(422)
        m1, a1, h1 = _seed(spark, tmp_path / "t1", rng1, k=3, buffer=6)
        m2, a2, h2 = _seed(spark, tmp_path / "t2", rng2, k=3, buffer=6)
        for step in range(3):
            b1 = _rows(random.Random(1000 + step), range(800, 820))
            mor.merge_upsert_mor(
                spark, _df(spark, b1), m1, ["K"], compact_every=None
            )
            mor.merge_upsert_mor(
                spark, _df(spark, b1), m2, ["K"], compact_every=None
            )
            it.refresh_topk_head(spark, m1, a1, h1)
            monkeypatch.setenv("SPARK_GRAFT_DRIVER_TRICKLE", "0")
            it.refresh_topk_head(spark, m2, a2, h2)
            monkeypatch.delenv("SPARK_GRAFT_DRIVER_TRICKLE")
            assert _got_topk(h1, "n_rows") == _got_topk(h2, "n_rows")
        _assert_head_matches(spark, m1, h1)


class TestRungChain:
    def test_fact_to_view_to_agg_to_topk_o_changes(self, spark, tmp_path):
        """The full maintained-rung chain: fact merge -> join-view
        refresh -> agg refresh -> top-K head refresh, every link
        O(changes), and the served top-k matches a from-scratch
        join+group+rank recompute after every round."""
        from presencia_etl_spark.plans import incremental_join as ij

        FACT = StructType(
            [
                StructField("f_id", LongType()),
                StructField("f_did", StringType()),
                StructField("f_amt", DoubleType()),
            ]
        )
        DIM = StructType(
            [
                StructField("d_id", StringType()),
                StructField("d_name", StringType()),
            ]
        )
        dim_ids = [f"d{i}" for i in range(9)]
        rng = random.Random(441)

        def facts(keys):
            return [
                (int(k), rng.choice(dim_ids), round(rng.uniform(1, 50), 2))
                for k in keys
            ]

        a, b = str(tmp_path / "fact"), str(tmp_path / "dim")
        mor.merge_upsert_mor(
            spark, spark.createDataFrame(facts(range(250)), FACT), a,
            ["f_id"], num_buckets=8, compact_every=None,
        )
        mor.merge_upsert_mor(
            spark,
            spark.createDataFrame(
                [(d, f"name-{d}") for d in dim_ids], DIM
            ),
            b, ["d_id"], num_buckets=4, compact_every=None,
        )
        v = str(tmp_path / "view")
        ij.build_join_view(
            spark, a, b, v,
            on=[("f_did", "d_id")],
            a_key_cols=["f_id"], b_key_cols=["d_id"],
            a_cols=["f_id", "f_did", "f_amt"],
            b_cols=["d_id", "d_name"],
            num_buckets=8, compact_every=None,
        )
        agg_t, head_t = str(tmp_path / "agg"), str(tmp_path / "head")
        ia.build_agg_snapshot(spark, v, agg_t, ["d_name"], ["f_amt"])
        it.build_topk_head(
            spark, v, agg_t, head_t, k=3, measure="sum_f_amt", buffer=5
        )
        for _round in range(3):
            mor.merge_upsert_mor(
                spark,
                spark.createDataFrame(
                    facts(rng.sample(range(400), 10)), FACT
                ),
                a, ["f_id"], compact_every=None,
            )
            assert ij.refresh_join_view(spark, v)["mode"] == "incremental"
            r = it.refresh_topk_head(spark, v, agg_t, head_t)
            assert r["mode"] in ("incremental", "rebuild")
            meta = ij.join_view_info(v)
            want = [
                (row["d_name"], row["s"])
                for row in ij._materialize(
                    spark, meta,
                    mor.mor_history(a)["seq"], mor.mor_history(b)["seq"],
                )
                .groupBy("d_name")
                .agg(F.sum(F.col("f_amt").cast("double")).alias("s"))
                .where(F.col("s").isNotNull())
                .orderBy(F.col("s").desc(), F.col("d_name").asc())
                .limit(3)
                .collect()
            ]
            got = [
                (row["d_name"], row["sum_f_amt"])
                for row in it.read_topk_rows(head_t)
            ]
            assert [g for g, _ in got] == [g for g, _ in want]
            for (_, x), (_, y) in zip(got, want):
                assert x == pytest.approx(y, abs=1e-6)


class TestPlanShape:
    def test_rebuild_compiles_to_take_ordered(self, spark, tmp_path):
        """The rebuild's ranking over the agg snapshot must be
        TakeOrderedAndProject (per-partition heaps, no global sort, no
        shuffle of the snapshot) — the property that keeps a rebuild
        O(groups)-scan-cheap at 100 TB group cardinalities."""
        import io
        from contextlib import redirect_stdout

        rng = random.Random(431)
        _m, agg_t, _h = _seed(spark, tmp_path, rng)
        snap = ia.read_agg_snapshot(spark, agg_t).select("cat", "n_rows")
        df = (
            snap.where(F.col("n_rows").isNotNull())
            .orderBy(F.col("n_rows").desc(), F.col("cat").asc())
            .limit(70)
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        p = buf.getvalue()
        assert "TakeOrderedAndProject" in p and "Sort " not in p


class TestOrderingParity:
    def test_rank_key_matches_spark_ordering(self, spark):
        """The driver-side ranking (utf-16-be string keys, NULL first)
        reproduces Spark's (measure DESC, group ASC) exactly — non-BMP
        strings and NULLs included."""
        groups = [
            "a", "A", "zz", "\U0001F600", "�", "", "\U00010000",
            "", None, "b\U0001F600", "b�",
        ]
        rows = [(g, float(i % 3)) for i, g in enumerate(groups)]
        df = spark.createDataFrame(rows, "g string, m double")
        exp = [
            (r["g"], r["m"])
            for r in df.orderBy(F.col("m").desc(), F.col("g").asc()).collect()
        ]
        got = sorted(rows, key=lambda r: it._rank_key((r[0],), r[1]))
        assert got == exp

    def test_nan_measure_declines(self):
        with pytest.raises(dm.DriverDecline) as ei:
            it._rank_key(("g",), float("nan"))
        assert ei.value.reason == "nan_order"

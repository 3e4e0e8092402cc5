"""Incremental materialized join views (plans/incremental_join) — every
refresh is differential-tested against a full recompute of the join
(inner and left) from the two MOR states, across fact-side and dim-side
changes, join-key moves, deletes on both sides, randomized mixed
sequences, the compaction-floor rebuild, the crash window between the
atomic view commit and the cursor write, and the composition with
plans/incremental_agg (the O(changes) star-rollup ladder)."""

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
from presencia_etl_spark.plans import incremental_join as ij
from presencia_etl_spark.sinks import mor

FACT_SCHEMA = StructType(
    [
        StructField("f_id", LongType()),
        StructField("f_did", StringType()),
        StructField("f_amt", DoubleType()),
    ]
)
DIM_SCHEMA = StructType(
    [
        StructField("d_id", StringType()),
        StructField("d_name", StringType()),
        StructField("d_rank", LongType()),
    ]
)

DIM_IDS = [f"d{i}" for i in range(12)]


def _facts(rng, keys):
    return [
        (int(k), rng.choice(DIM_IDS), round(rng.uniform(-50, 50), 2))
        for k in keys
    ]


def _dims(rng, ids):
    return [(d, f"name-{rng.randrange(1000)}", rng.randrange(5)) for d in ids]


def _fdf(spark, rows):
    return spark.createDataFrame(rows, FACT_SCHEMA)


def _ddf(spark, rows):
    return spark.createDataFrame(rows, DIM_SCHEMA)


def _seed(spark, tmp_path, rng, n_facts=300, buckets=8):
    a, b = str(tmp_path / "fact"), str(tmp_path / "dim")
    mor.merge_upsert_mor(
        spark, _fdf(spark, _facts(rng, range(n_facts))), a, ["f_id"],
        num_buckets=buckets, compact_every=None,
    )
    mor.merge_upsert_mor(
        spark, _ddf(spark, _dims(rng, DIM_IDS)), b, ["d_id"],
        num_buckets=4, compact_every=None,
    )
    return a, b


def _build(spark, tmp_path, a, b, **kw):
    v = str(tmp_path / "view")
    kw.setdefault("compact_every", None)
    r = ij.build_join_view(
        spark, a, b, v,
        on=[("f_did", "d_id")],
        a_key_cols=["f_id"],
        b_key_cols=["d_id"],
        a_cols=["f_id", "f_did", "f_amt"],
        b_cols=["d_id", "d_name", "d_rank"],
        num_buckets=8,
        **kw,
    )
    assert r["mode"] == "build"
    return v


def _canon(df):
    out = []
    for r in df.collect():
        vals = []
        for c in sorted(df.columns):
            v = r[c]
            # + 0.0 folds -0.0 into 0.0: grouping-normalized refresh
            # output vs raw recompute would otherwise str-sort apart
            vals.append(round(v, 6) + 0.0 if isinstance(v, float) else v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def _assert_matches_recompute(spark, view_path):
    meta = ij.join_view_info(view_path)
    ha = mor.mor_history(meta["a_path"])
    hb = mor.mor_history(meta["b_path"])
    # the cursors must have caught up to the sources
    assert (meta["a_seq"], meta["b_seq"]) == (ha["seq"], hb["seq"])
    want = ij._materialize(spark, meta, ha["seq"], hb["seq"])
    got = ij.read_join_view(spark, view_path)
    assert sorted(got.columns) == sorted(want.columns)
    assert _canon(got.select(*want.columns)) == _canon(want)


class TestBuildAndBasics:
    def test_build_matches_full_join(self, spark, tmp_path):
        rng = random.Random(11)
        a, b = _seed(spark, tmp_path, rng)
        v = _build(spark, tmp_path, a, b)
        _assert_matches_recompute(spark, v)

    def test_noop_refresh_writes_nothing(self, spark, tmp_path):
        rng = random.Random(12)
        a, b = _seed(spark, tmp_path, rng)
        v = _build(spark, tmp_path, a, b)
        seq0 = mor.mor_history(v)["seq"]
        r = ij.refresh_join_view(spark, v)
        assert r["mode"] == "noop"
        assert mor.mor_history(v)["seq"] == seq0

    def test_all_skip_merge_moves_only_cursors(self, spark, tmp_path):
        rng = random.Random(13)
        a, b = _seed(spark, tmp_path, rng)
        v = _build(spark, tmp_path, a, b)
        # replay identical fact rows: the source commits a sequence but
        # every row classifies SKIP -> empty feed -> cursor-only refresh
        cur = mor.read_mor(spark, a).select("f_id", "f_did", "f_amt")
        mor.merge_upsert_mor(spark, cur, a, ["f_id"], compact_every=None)
        seq0 = mor.mor_history(v)["seq"]
        r = ij.refresh_join_view(spark, v)
        assert r["mode"] in ("noop", "incremental")
        if r["mode"] == "incremental":
            assert r["upserts"] == 0 and r["deletes"] == 0
        assert mor.mor_history(v)["seq"] == seq0
        assert ij.join_view_info(v)["a_seq"] == mor.mor_history(a)["seq"]
        _assert_matches_recompute(spark, v)

    def test_projection_collision_raises(self, spark, tmp_path):
        rng = random.Random(14)
        a, b = _seed(spark, tmp_path, rng)
        with pytest.raises(ValueError, match="collides"):
            ij.build_join_view(
                spark, a, b, str(tmp_path / "v2"),
                on=[("f_did", "d_id")],
                a_key_cols=["f_id"], b_key_cols=["d_id"],
                a_cols=["f_id", "d_id"], b_cols=["d_id"],
            )

    def test_key_outside_projection_raises(self, spark, tmp_path):
        rng = random.Random(15)
        a, b = _seed(spark, tmp_path, rng)
        with pytest.raises(ValueError, match="pair key"):
            ij.build_join_view(
                spark, a, b, str(tmp_path / "v2"),
                on=[("f_did", "d_id")],
                a_key_cols=["f_id"], b_key_cols=["d_id"],
                a_cols=["f_did", "f_amt"], b_cols=["d_id"],
            )


class TestIncrementalRefresh:
    def test_fact_changes_prune_dim_probe(self, spark, tmp_path):
        rng = random.Random(21)
        a, b = _seed(spark, tmp_path, rng)
        v = _build(spark, tmp_path, a, b)
        upd = _facts(rng, rng.sample(range(300), 15))
        ins = _facts(rng, range(300, 320))
        mor.merge_upsert_mor(
            spark, _fdf(spark, upd + ins), a, ["f_id"], compact_every=None
        )
        r = ij.refresh_join_view(spark, v)
        assert r["mode"] == "incremental"
        assert r["a_changes"] <= 35 and r["b_changes"] == 0
        # star FK->PK: the dim side's join cols ARE its key -> pruned read
        assert r["pruned_big_side"] == {"b": True}
        _assert_matches_recompute(spark, v)

    def test_dim_change_fans_out_to_pairs(self, spark, tmp_path):
        rng = random.Random(22)
        a, b = _seed(spark, tmp_path, rng)
        v = _build(spark, tmp_path, a, b)
        mor.merge_upsert_mor(
            spark,
            _ddf(spark, [(DIM_IDS[0], "renamed", 9)]),
            b, ["d_id"], compact_every=None,
        )
        r = ij.refresh_join_view(spark, v)
        assert r["mode"] == "incremental"
        assert r["b_changes"] == 1 and r["a_changes"] == 0
        # the fact side's join col is NOT its key -> no listing prune,
        # but the bounded FK value set In()-pushes into the scan (r13)
        assert r["pruned_big_side"] == {"a": "values"}
        _assert_matches_recompute(spark, v)
        got = ij.read_join_view(spark, v).filter(F.col("d_id") == DIM_IDS[0])
        assert {r2["d_name"] for r2 in got.collect()} == {"renamed"}

    def test_join_key_update_moves_pairs(self, spark, tmp_path):
        rng = random.Random(23)
        a, b = _seed(spark, tmp_path, rng)
        v = _build(spark, tmp_path, a, b)
        old = mor.read_mor(spark, a).filter(F.col("f_id") == 7).collect()[0]
        new_did = DIM_IDS[0] if old["f_did"] != DIM_IDS[0] else DIM_IDS[1]
        mor.merge_upsert_mor(
            spark, _fdf(spark, [(7, new_did, old["f_amt"])]), a, ["f_id"],
            compact_every=None,
        )
        seq0 = mor.mor_history(v)["seq"]
        r = ij.refresh_join_view(spark, v)
        assert r["mode"] == "incremental"
        assert r["upserts"] == 1 and r["deletes"] == 1
        # ATOMIC: the pair's upsert and the old pair's tombstone land in
        # ONE delta commit — exactly one sequence number per refresh.
        assert mor.mor_history(v)["seq"] == seq0 + 1
        _assert_matches_recompute(spark, v)
        got = ij.read_join_view(spark, v).filter(F.col("f_id") == 7).collect()
        assert len(got) == 1 and got[0]["f_did"] == new_did

    def test_deletes_on_both_sides(self, spark, tmp_path):
        rng = random.Random(24)
        a, b = _seed(spark, tmp_path, rng)
        v = _build(spark, tmp_path, a, b)
        mor.delete_keys_mor(
            spark, a,
            spark.createDataFrame([(3,), (4,)], "f_id long"),
            ["f_id"], compact_every=None,
        )
        mor.delete_keys_mor(
            spark, b,
            spark.createDataFrame([(DIM_IDS[5],)], "d_id string"),
            ["d_id"], compact_every=None,
        )
        r = ij.refresh_join_view(spark, v)
        assert r["mode"] == "incremental"
        assert r["upserts"] == 0 and r["deletes"] >= 2
        _assert_matches_recompute(spark, v)
        left = ij.read_join_view(spark, v)
        assert left.filter(F.col("f_id").isin(3, 4)).count() == 0
        assert left.filter(F.col("d_id") == DIM_IDS[5]).count() == 0

    def test_null_join_keys_never_match(self, spark, tmp_path):
        rng = random.Random(25)
        a, b = _seed(spark, tmp_path, rng, n_facts=50)
        mor.merge_upsert_mor(
            spark, _fdf(spark, [(900, None, 1.0)]), a, ["f_id"],
            compact_every=None,
        )
        v = _build(spark, tmp_path, a, b)
        assert (
            ij.read_join_view(spark, v).filter(F.col("f_id") == 900).count()
            == 0
        )
        # and a NULL arriving incrementally also joins nothing
        mor.merge_upsert_mor(
            spark, _fdf(spark, [(901, None, 2.0)]), a, ["f_id"],
            compact_every=None,
        )
        ij.refresh_join_view(spark, v)
        _assert_matches_recompute(spark, v)

    def test_randomized_differential(self, spark, tmp_path):
        rng = random.Random(26)
        a, b = _seed(spark, tmp_path, rng, n_facts=200)
        v = _build(spark, tmp_path, a, b)
        live_facts = set(range(200))
        next_id = 200
        for _ in range(5):
            # fact: some updates (possibly moving join keys), some inserts
            upd = _facts(rng, rng.sample(sorted(live_facts), 10))
            ins = _facts(rng, range(next_id, next_id + 5))
            live_facts |= set(range(next_id, next_id + 5))
            next_id += 5
            mor.merge_upsert_mor(
                spark, _fdf(spark, upd + ins), a, ["f_id"], compact_every=None
            )
            # fact: a couple of deletes
            dels = rng.sample(sorted(live_facts), 2)
            live_facts -= set(dels)
            mor.delete_keys_mor(
                spark, a,
                spark.createDataFrame([(int(k),) for k in dels], "f_id long"),
                ["f_id"], compact_every=None,
            )
            # dim: occasionally rename one
            if rng.random() < 0.6:
                mor.merge_upsert_mor(
                    spark, _ddf(spark, _dims(rng, [rng.choice(DIM_IDS)])),
                    b, ["d_id"], compact_every=None,
                )
            r = ij.refresh_join_view(spark, v)
            assert r["mode"] == "incremental"
            _assert_matches_recompute(spark, v)

    def test_mn_join_on_nonkey_both_sides(self, spark, tmp_path):
        """General m:n equi-join (join cols are keys on NEITHER side):
        no pruning anywhere, same algebra, same differential bar."""
        rng = random.Random(27)
        a, b = str(tmp_path / "fa"), str(tmp_path / "fb")
        # fact join col f_did cycles 3 values; dim join col d_name (NOT
        # the dim key) carries two rows per value -> genuine m:n fan-out
        mor.merge_upsert_mor(
            spark,
            _fdf(spark, [(i, f"g{i % 3}", float(i)) for i in range(60)]),
            a, ["f_id"], num_buckets=4, compact_every=None,
        )
        mor.merge_upsert_mor(
            spark,
            _ddf(spark, [(f"k{i}", f"g{i % 3}", i % 4) for i in range(6)]),
            b, ["d_id"], num_buckets=4, compact_every=None,
        )
        v = str(tmp_path / "view")
        ij.build_join_view(
            spark, a, b, v,
            on=[("f_did", "d_name")],
            a_key_cols=["f_id"], b_key_cols=["d_id"],
            a_cols=["f_id", "f_did", "f_amt"],
            b_cols=["d_id", "d_name", "d_rank"],
            num_buckets=4, compact_every=None,
        )
        _assert_matches_recompute(spark, v)
        got = ij.read_join_view(spark, v).filter(F.col("f_did") == "g1")
        per_fact = got.groupBy("f_id").count().collect()
        assert per_fact and all(r2["count"] == 2 for r2 in per_fact)
        # change one fact row's join value and one dim row's join value
        mor.merge_upsert_mor(
            spark, _fdf(spark, [(0, "g1", 99.0)]), a, ["f_id"],
            compact_every=None,
        )
        mor.merge_upsert_mor(
            spark, _ddf(spark, [("k2", "g0", 7)]), b, ["d_id"],
            compact_every=None,
        )
        r = ij.refresh_join_view(spark, v)
        assert r["mode"] == "incremental"
        # neither big side is keyed by its join cols -> no listing
        # prune; both scans still take the In() value pushdown (r13)
        assert r["pruned_big_side"] == {"a": "values", "b": "values"}
        _assert_matches_recompute(spark, v)


class TestLeftJoin:
    """how="left": the NULL-extension layer (alpha/beta) over the same
    signed algebra, differential-tested against a LEFT-join recompute."""

    POOL = DIM_IDS + ["zz0", "zz1", "zz2"]  # zz* have no dim row

    def _lfacts(self, rng, keys):
        return [
            (int(k), rng.choice(self.POOL), round(rng.uniform(-9, 9), 2))
            for k in keys
        ]

    def _lseed(self, spark, tmp_path, rng, n=200):
        a, b = str(tmp_path / "lf"), str(tmp_path / "ld")
        mor.merge_upsert_mor(
            spark, _fdf(spark, self._lfacts(rng, range(n))), a, ["f_id"],
            num_buckets=8, compact_every=None,
        )
        mor.merge_upsert_mor(
            spark, _ddf(spark, _dims(rng, DIM_IDS)), b, ["d_id"],
            num_buckets=4, compact_every=None,
        )
        v = str(tmp_path / "lview")
        r = ij.build_join_view(
            spark, a, b, v,
            on=[("f_did", "d_id")],
            a_key_cols=["f_id"], b_key_cols=["d_id"],
            a_cols=["f_id", "f_did", "f_amt"],
            b_cols=["d_id", "d_name", "d_rank"],
            num_buckets=8, compact_every=None, how="left",
        )
        assert r["mode"] == "build"
        return a, b, v

    def test_build_keeps_unmatched_and_null_j_rows(self, spark, tmp_path):
        rng = random.Random(71)
        a, b, v = self._lseed(spark, tmp_path, rng)
        mor.merge_upsert_mor(
            spark, _fdf(spark, [(900, None, 1.5)]), a, ["f_id"],
            compact_every=None,
        )
        ij.refresh_join_view(spark, v)
        _assert_matches_recompute(spark, v)
        got = ij.read_join_view(spark, v)
        unmatched = got.filter(F.col("f_did").startswith("zz"))
        assert unmatched.count() > 0
        assert unmatched.filter(F.col("d_id").isNotNull()).count() == 0
        assert got.filter(F.col("f_id") == 900).count() == 1

    def test_dim_gains_first_and_loses_last_match(self, spark, tmp_path):
        rng = random.Random(72)
        a, b, v = self._lseed(spark, tmp_path, rng)
        n_zz0 = (
            ij.read_join_view(spark, v).filter(F.col("f_did") == "zz0").count()
        )
        assert n_zz0 > 0
        # dimension gains its FIRST row at zz0: every zz0 fact flips
        mor.merge_upsert_mor(
            spark, _ddf(spark, [("zz0", "late-dim", 1)]), b, ["d_id"],
            compact_every=None,
        )
        r = ij.refresh_join_view(spark, v)
        assert r["mode"] == "incremental"
        _assert_matches_recompute(spark, v)
        got = ij.read_join_view(spark, v).filter(F.col("f_did") == "zz0")
        assert got.count() == n_zz0
        assert got.filter(F.col("d_name") == "late-dim").count() == n_zz0
        # and loses it again: back to NULL-extended
        mor.delete_keys_mor(
            spark, b, spark.createDataFrame([("zz0",)], "d_id string"),
            ["d_id"], compact_every=None,
        )
        r = ij.refresh_join_view(spark, v)
        assert r["mode"] == "incremental"
        _assert_matches_recompute(spark, v)
        got = ij.read_join_view(spark, v).filter(F.col("f_did") == "zz0")
        assert got.count() == n_zz0
        assert got.filter(F.col("d_id").isNull()).count() == n_zz0

    def test_fact_moves_between_matched_and_unmatched(self, spark, tmp_path):
        rng = random.Random(73)
        a, b, v = self._lseed(spark, tmp_path, rng)
        old = mor.read_mor(spark, a).filter(F.col("f_id") == 5).collect()[0]
        # move to an unmatched value, then back to a matched one
        for target in ("zz1", DIM_IDS[0]):
            mor.merge_upsert_mor(
                spark, _fdf(spark, [(5, target, old["f_amt"])]), a, ["f_id"],
                compact_every=None,
            )
            r = ij.refresh_join_view(spark, v)
            assert r["mode"] == "incremental"
            _assert_matches_recompute(spark, v)
            got = ij.read_join_view(spark, v).filter(F.col("f_id") == 5)
            assert got.count() == 1
            assert got.collect()[0]["f_did"] == target

    def test_randomized_left_differential(self, spark, tmp_path):
        rng = random.Random(74)
        a, b, v = self._lseed(spark, tmp_path, rng, n=150)
        live_dims = set(DIM_IDS)
        for _ in range(4):
            mor.merge_upsert_mor(
                spark,
                _fdf(spark, self._lfacts(rng, rng.sample(range(150), 8))),
                a, ["f_id"], compact_every=None,
            )
            roll = rng.random()
            if roll < 0.4 and live_dims:
                doomed = rng.choice(sorted(live_dims))
                live_dims.discard(doomed)
                mor.delete_keys_mor(
                    spark, b,
                    spark.createDataFrame([(doomed,)], "d_id string"),
                    ["d_id"], compact_every=None,
                )
            elif roll < 0.8:
                gained = rng.choice(self.POOL)
                live_dims.add(gained)
                mor.merge_upsert_mor(
                    spark, _ddf(spark, _dims(rng, [gained])), b, ["d_id"],
                    compact_every=None,
                )
            r = ij.refresh_join_view(spark, v)
            assert r["mode"] == "incremental"
            _assert_matches_recompute(spark, v)

    def test_dense_change_declines_to_rebuild(
        self, spark, tmp_path, monkeypatch
    ):
        rng = random.Random(75)
        a, b, v = self._lseed(spark, tmp_path, rng, n=60)
        mor.merge_upsert_mor(
            spark, _fdf(spark, self._lfacts(rng, range(5))), a, ["f_id"],
            compact_every=None,
        )
        monkeypatch.setattr(ij, "KEY_PUSHDOWN_LIMIT", 0)
        r = ij.refresh_join_view(spark, v)
        assert r["mode"] == "rebuild"
        monkeypatch.undo()
        _assert_matches_recompute(spark, v)

    def test_left_view_feeds_downstream_agg(self, spark, tmp_path):
        """The NULL-dim group is a first-class group downstream: the
        composed rollup counts unmatched facts under d_name NULL."""
        rng = random.Random(76)
        a, b, v = self._lseed(spark, tmp_path, rng)
        agg = str(tmp_path / "lagg")
        ia.build_agg_snapshot(spark, v, agg, ["d_name"], ["f_amt"])
        mor.merge_upsert_mor(
            spark, _fdf(spark, self._lfacts(rng, rng.sample(range(200), 6))),
            a, ["f_id"], compact_every=None,
        )
        assert ij.refresh_join_view(spark, v)["mode"] == "incremental"
        assert ia.refresh_agg_snapshot(spark, v, agg)["mode"] == "incremental"
        got = ia.read_agg_snapshot(spark, agg)
        meta = ij.join_view_info(v)
        want = (
            ij._materialize(
                spark, meta,
                mor.mor_history(a)["seq"], mor.mor_history(b)["seq"],
            )
            .groupBy("d_name")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("f_amt").cast("double")).alias("sum_f_amt"),
                F.count(F.col("f_amt")).alias("nn_f_amt"),
            )
        )
        assert _canon(got.select(*want.columns)) == _canon(want)
        null_grp = got.filter(F.col("d_name").isNull()).collect()
        assert null_grp and null_grp[0]["n_rows"] > 0


class TestRightFullJoin:
    """how="right"/"full": the NULL-extension layer under reflection
    (right IS left of the mirrored spec; full runs both layers),
    differential-tested against the outer-join recompute. A maintained
    full-outer view is the EP4 month-reconcile shape."""

    POOL = DIM_IDS + ["zz0", "zz1", "zz2"]  # zz* facts match no dim
    EXTRA_DIMS = ["qq0", "qq1", "qq2"]  # dims no fact points at

    def _facts(self, rng, keys):
        return [
            (int(k), rng.choice(self.POOL), round(rng.uniform(-9, 9), 2))
            for k in keys
        ]

    def _seed(self, spark, tmp_path, rng, how, n=150):
        a, b = str(tmp_path / f"{how}_f"), str(tmp_path / f"{how}_d")
        mor.merge_upsert_mor(
            spark, _fdf(spark, self._facts(rng, range(n))), a, ["f_id"],
            num_buckets=8, compact_every=None,
        )
        mor.merge_upsert_mor(
            spark, _ddf(spark, _dims(rng, DIM_IDS + self.EXTRA_DIMS)), b,
            ["d_id"], num_buckets=4, compact_every=None,
        )
        v = str(tmp_path / f"{how}_view")
        r = ij.build_join_view(
            spark, a, b, v,
            on=[("f_did", "d_id")],
            a_key_cols=["f_id"], b_key_cols=["d_id"],
            a_cols=["f_id", "f_did", "f_amt"],
            b_cols=["d_id", "d_name", "d_rank"],
            num_buckets=8, compact_every=None, how=how,
        )
        assert r["mode"] == "build"
        return a, b, v

    def test_right_build_keeps_unmatched_dims(self, spark, tmp_path):
        rng = random.Random(81)
        a, b, v = self._seed(spark, tmp_path, rng, "right")
        _assert_matches_recompute(spark, v)
        got = ij.read_join_view(spark, v)
        orphans = got.filter(F.col("d_id").isin(self.EXTRA_DIMS))
        assert orphans.count() == len(self.EXTRA_DIMS)
        assert orphans.filter(F.col("f_id").isNotNull()).count() == 0
        # right drops unmatched FACTS
        assert got.filter(F.col("f_did").startswith("zz")).count() == 0

    def test_right_dim_gains_and_loses_first_fact(self, spark, tmp_path):
        rng = random.Random(82)
        a, b, v = self._seed(spark, tmp_path, rng, "right")
        # a fact arrives at qq0: its NULL-extended dim row flips to matched
        mor.merge_upsert_mor(
            spark, _fdf(spark, [(900, "qq0", 4.5)]), a, ["f_id"],
            compact_every=None,
        )
        r = ij.refresh_join_view(spark, v)
        assert r["mode"] == "incremental"
        _assert_matches_recompute(spark, v)
        got = ij.read_join_view(spark, v).filter(F.col("d_id") == "qq0")
        assert got.count() == 1 and got.collect()[0]["f_id"] == 900
        # ... and leaves again: back to NULL-extended
        mor.delete_keys_mor(
            spark, a, spark.createDataFrame([(900,)], "f_id long"),
            ["f_id"], compact_every=None,
        )
        r = ij.refresh_join_view(spark, v)
        assert r["mode"] == "incremental"
        _assert_matches_recompute(spark, v)
        got = ij.read_join_view(spark, v).filter(F.col("d_id") == "qq0")
        assert got.count() == 1 and got.collect()[0]["f_id"] is None

    def test_full_keeps_both_sides(self, spark, tmp_path):
        rng = random.Random(83)
        a, b, v = self._seed(spark, tmp_path, rng, "full")
        _assert_matches_recompute(spark, v)
        got = ij.read_join_view(spark, v)
        assert got.filter(F.col("f_did").startswith("zz")).count() > 0
        assert got.filter(F.col("d_id").isin(self.EXTRA_DIMS)).count() == len(
            self.EXTRA_DIMS
        )

    def test_full_randomized_differential(self, spark, tmp_path):
        rng = random.Random(84)
        a, b, v = self._seed(spark, tmp_path, rng, "full", n=120)
        live_dims = set(DIM_IDS + self.EXTRA_DIMS)
        pool = DIM_IDS + self.EXTRA_DIMS + ["zz9"]
        for step in range(4):
            mor.merge_upsert_mor(
                spark,
                _fdf(spark, self._facts(rng, rng.sample(range(160), 7))),
                a, ["f_id"], compact_every=None,
            )
            roll = rng.random()
            if roll < 0.4 and live_dims:
                doomed = rng.choice(sorted(live_dims))
                live_dims.discard(doomed)
                mor.delete_keys_mor(
                    spark, b,
                    spark.createDataFrame([(doomed,)], "d_id string"),
                    ["d_id"], compact_every=None,
                )
            elif roll < 0.8:
                gained = rng.choice(pool)
                live_dims.add(gained)
                mor.merge_upsert_mor(
                    spark, _ddf(spark, _dims(rng, [gained])), b, ["d_id"],
                    compact_every=None,
                )
            r = ij.refresh_join_view(spark, v)
            assert r["mode"] == "incremental", f"step {step}: {r}"
            _assert_matches_recompute(spark, v)

    def test_full_null_join_keys_stay_both_sides(self, spark, tmp_path):
        rng = random.Random(85)
        a, b, v = self._seed(spark, tmp_path, rng, "full")
        mor.merge_upsert_mor(
            spark, _fdf(spark, [(901, None, 2.25)]), a, ["f_id"],
            compact_every=None,
        )
        r = ij.refresh_join_view(spark, v)
        assert r["mode"] == "incremental"
        _assert_matches_recompute(spark, v)
        got = ij.read_join_view(spark, v).filter(F.col("f_id") == 901)
        assert got.count() == 1 and got.collect()[0]["d_id"] is None

    def test_right_dense_declines_to_rebuild(
        self, spark, tmp_path, monkeypatch
    ):
        rng = random.Random(86)
        a, b, v = self._seed(spark, tmp_path, rng, "right", n=60)
        mor.merge_upsert_mor(
            spark, _fdf(spark, self._facts(rng, range(5))), a, ["f_id"],
            compact_every=None,
        )
        monkeypatch.setattr(ij, "KEY_PUSHDOWN_LIMIT", 0)
        r = ij.refresh_join_view(spark, v)
        assert r["mode"] == "rebuild"
        monkeypatch.undo()
        _assert_matches_recompute(spark, v)


class TestRebuildAndCrash:
    def test_rebuild_on_compaction_floor(self, spark, tmp_path):
        rng = random.Random(31)
        a, b = _seed(spark, tmp_path, rng)
        v = _build(spark, tmp_path, a, b)
        mor.merge_upsert_mor(
            spark, _fdf(spark, _facts(rng, range(300, 310))), a, ["f_id"],
            compact_every=None,
        )
        mor.compact_mor(spark, a)  # floor passes the view's cursor
        r = ij.refresh_join_view(spark, v)
        assert r["mode"] == "rebuild"
        _assert_matches_recompute(spark, v)

    def test_auto_compaction_retention_keeps_refresh_incremental(
        self, spark, tmp_path
    ):
        """AUTO-compaction's default retention (compact_every // 4 kept
        deltas) must keep a view whose cursor lags one merge behind on
        its O(changes) incremental path — the old keep_last=0 default
        forced a full rebuild on every 16th upstream merge (r14)."""
        rng = random.Random(33)
        a, b = _seed(spark, tmp_path, rng)
        v = _build(spark, tmp_path, a, b)
        compacted = False
        for i in range(10):
            r = mor.merge_upsert_mor(
                spark,
                _fdf(spark, _facts(rng, range(400 + 5 * i, 405 + 5 * i))),
                a,
                ["f_id"],
                compact_every=8,
            )
            if r["compacted"]:
                compacted = True
                break
            # the view keeps pace: cursor lags ≤ 1 merge at all times
            ij.refresh_join_view(spark, v)
        assert compacted, "auto-compaction never triggered"
        # retained window (8 // 4 = 2 deltas) covers the 1-merge lag
        assert mor._delta_seqs(a) != []
        r = ij.refresh_join_view(spark, v)
        assert r["mode"] == "incremental"
        _assert_matches_recompute(spark, v)

    def test_rebuild_keeps_view_feed_continuous(self, spark, tmp_path):
        """The rebuild is a delete_missing merge INTO the view state: a
        downstream consumer's cursor on the VIEW survives an upstream
        rebuild (the view's own floor does not move)."""
        rng = random.Random(32)
        a, b = _seed(spark, tmp_path, rng)
        v = _build(spark, tmp_path, a, b)
        cursor = mor.mor_history(v)["seq"]
        mor.merge_upsert_mor(
            spark, _fdf(spark, _facts(rng, range(5))), a, ["f_id"],
            compact_every=None,
        )
        mor.compact_mor(spark, a)
        r = ij.refresh_join_view(spark, v)
        assert r["mode"] == "rebuild"
        assert mor.mor_history(v)["compacted_through"] <= cursor
        # the change feed from the pre-rebuild cursor still reads
        feed = mor.read_mor_changes(spark, v, since_seq=cursor)
        assert feed.count() >= 0

    def test_crash_before_cursor_write_converges(
        self, spark, tmp_path, monkeypatch
    ):
        """The refresh's data commit is ATOMIC (one delta); the remaining
        crash window is between that commit and the cursor write. A
        replay then re-derives the same signed delta and the merge's
        idempotent-replay discipline writes NOTHING (upserts classify
        skip, tombstoned keys are no longer live) — the view ends
        correct with exactly ONE delta for the whole episode."""
        rng = random.Random(33)
        a, b = _seed(spark, tmp_path, rng)
        v = _build(spark, tmp_path, a, b)
        # a join-key move generates exactly one upsert AND one delete
        old = mor.read_mor(spark, a).filter(F.col("f_id") == 9).collect()[0]
        new_did = DIM_IDS[2] if old["f_did"] != DIM_IDS[2] else DIM_IDS[3]
        mor.merge_upsert_mor(
            spark, _fdf(spark, [(9, new_did, old["f_amt"])]), a, ["f_id"],
            compact_every=None,
        )
        seq0 = mor.mor_history(v)["seq"]
        real_write = ij._write_meta

        def boom(*args, **kw):
            raise RuntimeError("injected crash before cursor write")

        monkeypatch.setattr(ij, "_write_meta", boom)
        with pytest.raises(RuntimeError, match="injected"):
            ij.refresh_join_view(spark, v)
        # data committed, cursors did not advance
        assert mor.mor_history(v)["seq"] == seq0 + 1
        assert ij.join_view_info(v)["a_seq"] < mor.mor_history(a)["seq"]
        monkeypatch.setattr(ij, "_write_meta", real_write)
        r = ij.refresh_join_view(spark, v)
        assert r["mode"] == "incremental"
        # idempotent replay: nothing re-applied, no second delta
        assert r["upserts"] == 0 and r["deletes"] == 0
        assert mor.mor_history(v)["seq"] == seq0 + 1
        assert ij.join_view_info(v)["a_seq"] == mor.mor_history(a)["seq"]
        _assert_matches_recompute(spark, v)


class TestPlanShape:
    """Pin the physical properties the 100 TB story rests on: the star
    probe's big-side read is pruned at the file LISTING with the key set
    pushed into the scan, and each product joins the big side against a
    BROADCAST delta — the big table is never shuffled."""

    def test_star_probe_big_side_listing_pruned_and_key_pushed(
        self, spark, tmp_path
    ):
        import io
        from contextlib import redirect_stdout

        rng = random.Random(51)
        a, b = _seed(spark, tmp_path, rng)
        hb = mor.mor_history(b)
        probe = spark.createDataFrame([(DIM_IDS[0],), (DIM_IDS[1],)], "d_id string")
        big, pruned = ij._big_side(
            spark, b, hb["seq"], ["d_id"], ["d_id"], probe, 2
        )
        assert pruned
        files = big.inputFiles()
        assert files, "pruned read should still see the probed buckets"
        # at most 2 probed keys -> at most 2 bucket dirs enumerated
        kbs = {f.split("_kb=")[1].split("/")[0] for f in files if "_kb=" in f}
        assert len(kbs) <= 2
        buf = io.StringIO()
        with redirect_stdout(buf):
            big.explain("formatted")
        assert "In(_cdc_key" in buf.getvalue()

    def test_value_probe_big_side_in_pushed_and_matches_full_scan(
        self, spark, tmp_path
    ):
        """r13: a VALUE probe (join cols != key cols — the dim-tick
        sweep into the fact) In()-pushes the bounded FK value set into
        the scan instead of decoding the full snapshot; the filtered
        frame must agree with the honest full scan on every probed
        value (superset-filter correctness differential)."""
        import io
        from contextlib import redirect_stdout

        rng = random.Random(53)
        a, b = _seed(spark, tmp_path, rng)
        ha = mor.mor_history(a)
        probe = spark.createDataFrame(
            [(DIM_IDS[0],), (DIM_IDS[1],), (None,)], "f_did string"
        )
        big, pruned = ij._big_side(
            spark, a, ha["seq"], ["f_id"], ["f_did"], probe, 3
        )
        assert pruned == "values"
        buf = io.StringIO()
        with redirect_stdout(buf):
            big.explain("formatted")
        assert "In(f_did" in buf.getvalue()
        full, pruned_full = ij._big_side(
            spark, a, ha["seq"], ["f_id"], ["f_did"], None, 0
        )
        assert pruned_full is False
        want = sorted(
            tuple(r)
            for r in full.filter(
                F.col("f_did").isin(DIM_IDS[0], DIM_IDS[1])
            ).collect()
        )
        got = sorted(tuple(r) for r in big.collect())
        assert got == want and want, "value-pushed scan diverged"

    def test_products_broadcast_the_delta_never_shuffle_the_big_side(
        self, spark, tmp_path
    ):
        import io
        from contextlib import redirect_stdout

        rng = random.Random(52)
        a, b = _seed(spark, tmp_path, rng)
        v = _build(spark, tmp_path, a, b)
        mor.merge_upsert_mor(
            spark, _fdf(spark, _facts(rng, range(3))), a, ["f_id"],
            compact_every=None,
        )
        meta = ij.join_view_info(v)
        ha, hb = mor.mor_history(a), mor.mor_history(b)
        da, n_a = ij._signed_delta(
            spark, a, meta["a_seq"], ha["seq"], ["f_id", "f_did", "f_amt"]
        )
        try:
            big_b, _ = ij._big_side(
                spark, b, hb["seq"], ["d_id"], ["d_id"],
                da.select(F.col("f_did").alias("d_id")), n_a,
            )
            from presencia_etl_spark.sinks.writers import _maybe_broadcast

            t1 = ij._join_frames(
                _maybe_broadcast(da, n_a),
                big_b.select("d_id", "d_name", "d_rank"),
                [("f_did", "d_id")],
                ["f_id", "f_did", "f_amt", ij.W_COL],
                ["d_id", "d_name", "d_rank"],
            )
            buf = io.StringIO()
            with redirect_stdout(buf):
                t1.explain("formatted")
            p = buf.getvalue()
            assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p
        finally:
            da.unpersist()


class TestChaining:
    def test_three_table_star_via_view_over_view(self, spark, tmp_path):
        """N-way incremental star: the view is a MOR table, so a second
        view can join IT against another dimension — and both stay
        O(changes) because each refresh feeds on the upstream's change
        feed. fact merge -> view1 refresh (incremental) -> view2 refresh
        (incremental) -> matches the 3-way recompute."""
        from pyspark.sql.types import StructField, StructType

        f_schema = StructType(
            [
                StructField("f_id", LongType()),
                StructField("f_did", StringType()),
                StructField("f_eid", StringType()),
                StructField("f_amt", DoubleType()),
            ]
        )
        e_ids = [f"e{i}" for i in range(5)]
        rng = random.Random(61)

        def facts3(keys):
            return [
                (
                    int(k),
                    rng.choice(DIM_IDS),
                    rng.choice(e_ids),
                    round(rng.uniform(0, 10), 2),
                )
                for k in keys
            ]

        a = str(tmp_path / "fact3")
        b = str(tmp_path / "dimd")
        e2 = str(tmp_path / "dime")
        mor.merge_upsert_mor(
            spark, spark.createDataFrame(facts3(range(200)), f_schema),
            a, ["f_id"], num_buckets=8, compact_every=None,
        )
        mor.merge_upsert_mor(
            spark, _ddf(spark, _dims(rng, DIM_IDS)), b, ["d_id"],
            num_buckets=4, compact_every=None,
        )
        e2_schema = StructType(
            [
                StructField("e_id", StringType()),
                StructField("e_name", StringType()),
            ]
        )
        mor.merge_upsert_mor(
            spark,
            spark.createDataFrame([(x, f"ename-{x}") for x in e_ids], e2_schema),
            e2, ["e_id"], compact_every=None, num_buckets=4,
        )
        v1 = str(tmp_path / "v1")
        v2 = str(tmp_path / "v2")
        ij.build_join_view(
            spark, a, b, v1,
            on=[("f_did", "d_id")],
            a_key_cols=["f_id"], b_key_cols=["d_id"],
            a_cols=["f_id", "f_did", "f_eid", "f_amt"],
            b_cols=["d_id", "d_name"],
            num_buckets=8, compact_every=None,
        )
        ij.build_join_view(
            spark, v1, e2, v2,
            on=[("f_eid", "e_id")],
            a_key_cols=["f_id", "d_id"], b_key_cols=["e_id"],
            a_cols=["f_id", "d_id", "f_did", "f_eid", "f_amt", "d_name"],
            b_cols=["e_id", "e_name"],
            num_buckets=8, compact_every=None,
        )
        for _ in range(3):
            mor.merge_upsert_mor(
                spark,
                spark.createDataFrame(
                    facts3(rng.sample(range(200), 6)), f_schema
                ),
                a, ["f_id"], compact_every=None,
            )
            r1 = ij.refresh_join_view(spark, v1)
            r2 = ij.refresh_join_view(spark, v2)
            assert r1["mode"] == "incremental"
            assert r2["mode"] == "incremental"
            _assert_matches_recompute(spark, v1)
            _assert_matches_recompute(spark, v2)


class TestSqlIntegration:
    def test_ivm_ladder_is_sql_queryable(self, spark, tmp_path):
        """The whole ladder is warehouse-visible: the join view (a MOR
        state) and the maintained aggregate snapshot both register as
        SQL views, so BI consumers read maintained results by name."""
        import os

        from presencia_etl_spark.sql import register_state_views

        rng = random.Random(81)
        wh = str(tmp_path / "wh")
        os.makedirs(wh)
        a, b = f"{wh}/fact", f"{wh}/dim"
        mor.merge_upsert_mor(
            spark, _fdf(spark, _facts(rng, range(120))), a, ["f_id"],
            num_buckets=8, compact_every=None,
        )
        mor.merge_upsert_mor(
            spark, _ddf(spark, _dims(rng, DIM_IDS)), b, ["d_id"],
            num_buckets=4, compact_every=None,
        )
        v = f"{wh}/fact_dim_view"
        ij.build_join_view(
            spark, a, b, v,
            on=[("f_did", "d_id")],
            a_key_cols=["f_id"], b_key_cols=["d_id"],
            a_cols=["f_id", "f_did", "f_amt"],
            b_cols=["d_id", "d_name", "d_rank"],
            num_buckets=8, compact_every=None,
        )
        agg = f"{wh}/amt_by_dim"
        ia.build_agg_snapshot(spark, v, agg, ["d_name"], ["f_amt"])
        views = register_state_views(spark, wh)
        assert {"fact", "dim", "fact_dim_view", "amt_by_dim"} <= set(views)
        got = {
            r["d_name"]: r["n_rows"]
            for r in spark.sql(
                "SELECT d_name, n_rows FROM amt_by_dim"
            ).collect()
        }
        want = {
            r["d_name"]: r["cnt"]
            for r in spark.sql(
                "SELECT d_name, COUNT(*) cnt FROM fact_dim_view "
                "GROUP BY d_name"
            ).collect()
        }
        assert got == want and sum(got.values()) == 120


class TestComposition:
    def test_star_rollup_is_o_changes_end_to_end(self, spark, tmp_path):
        """fact merge -> view refresh -> agg refresh: the downstream
        aggregate folds only the view's change feed, and the result
        matches a from-scratch join+group recompute every round."""
        rng = random.Random(41)
        a, b = _seed(spark, tmp_path, rng)
        v = _build(spark, tmp_path, a, b)
        agg = str(tmp_path / "agg")
        ia.build_agg_snapshot(spark, v, agg, ["d_name"], ["f_amt"])
        for i in range(3):
            mor.merge_upsert_mor(
                spark,
                _fdf(spark, _facts(rng, rng.sample(range(300), 8))),
                a, ["f_id"], compact_every=None,
            )
            if i == 1:  # a dim rename regroups every pair it touches
                mor.merge_upsert_mor(
                    spark, _ddf(spark, _dims(rng, [DIM_IDS[1]])),
                    b, ["d_id"], compact_every=None,
                )
            rv = ij.refresh_join_view(spark, v)
            assert rv["mode"] == "incremental"
            ra = ia.refresh_agg_snapshot(spark, v, agg)
            assert ra["mode"] == "incremental"
            got = ia.read_agg_snapshot(spark, agg)
            meta = ij.join_view_info(v)
            want = (
                ij._materialize(
                    spark, meta,
                    mor.mor_history(a)["seq"], mor.mor_history(b)["seq"],
                )
                .groupBy("d_name")
                .agg(
                    F.count(F.lit(1)).alias("n_rows"),
                    F.sum(F.col("f_amt").cast("double")).alias("sum_f_amt"),
                    F.count(F.col("f_amt")).alias("nn_f_amt"),
                )
            )
            assert _canon(got.select(*want.columns)) == _canon(want)


class TestStreamingFreshness:
    def test_streamed_fact_keeps_star_rollup_fresh(self, spark, tmp_path):
        """The reference's cron shape, streamed end-to-end: file-source
        micro-batches upsert the fact MOR table, and after each trigger
        the view + aggregate refresh O(changes) — the dashboard follows
        the stream without ever rescanning the fact."""
        import os

        from presencia_etl_spark.streaming.micro_batch import (
            incremental_upsert_stream,
        )

        rng = random.Random(91)
        a = str(tmp_path / "fact")
        b = str(tmp_path / "dim")
        inbox = str(tmp_path / "inbox")
        ckpt = str(tmp_path / "ckpt")
        os.makedirs(inbox)
        mor.merge_upsert_mor(
            spark, _fdf(spark, _facts(rng, range(100))), a, ["f_id"],
            num_buckets=8, compact_every=None,
        )
        mor.merge_upsert_mor(
            spark, _ddf(spark, _dims(rng, DIM_IDS)), b, ["d_id"],
            num_buckets=4, compact_every=None,
        )
        v = str(tmp_path / "view")
        _ = ij.build_join_view(
            spark, a, b, v,
            on=[("f_did", "d_id")],
            a_key_cols=["f_id"], b_key_cols=["d_id"],
            a_cols=["f_id", "f_did", "f_amt"],
            b_cols=["d_id", "d_name"],
            num_buckets=8, compact_every=None,
        )
        agg = str(tmp_path / "agg")
        ia.build_agg_snapshot(spark, v, agg, ["d_name"], ["f_amt"])

        schema = FACT_SCHEMA
        for batch_no in range(2):
            batch = _facts(rng, range(100 + batch_no * 5, 105 + batch_no * 5))
            _fdf(spark, batch).coalesce(1).write.mode("append").parquet(inbox)
            q = incremental_upsert_stream(
                spark, inbox, schema, a, ["f_id"], ckpt,
                trigger_once=True, mode="mor",
            )
            q.awaitTermination(120)
            rv = ij.refresh_join_view(spark, v)
            assert rv["mode"] == "incremental"
            ra = ia.refresh_agg_snapshot(spark, v, agg)
            assert ra["mode"] in ("incremental",)
            _assert_matches_recompute(spark, v)
        # the rollup counts every streamed fact exactly once
        total = (
            ia.read_agg_snapshot(spark, agg)
            .agg(F.sum("n_rows").alias("n"))
            .collect()[0]["n"]
        )
        assert total == 110


class TestJobBudget:
    def test_trickle_refresh_runs_zero_jobs(self, spark, tmp_path):
        """The cron steady state: a 1-key trickle refresh folds entirely
        on the driver (signed deltas, key-pruned probes, atomic mixed
        merge, digest upkeep) — ZERO Spark jobs."""
        rng = random.Random(95)
        a, b = _seed(spark, tmp_path, rng, n_facts=500)
        v = _build(spark, tmp_path, a, b)
        mor.merge_upsert_mor(
            spark, _fdf(spark, _facts(rng, [2])), a, ["f_id"],
            compact_every=None,
        )
        tracker = spark.sparkContext.statusTracker()
        before = set(tracker.getJobIdsForGroup() or [])
        r = ij.refresh_join_view(spark, v)
        n_jobs = len(set(tracker.getJobIdsForGroup() or []) - before)
        assert r["mode"] == "incremental" and r.get("path") == "driver"
        assert n_jobs == 0, f"driver trickle refresh ran {n_jobs} jobs"
        _assert_matches_recompute(spark, v)

    def test_spark_fallback_job_budget(self, spark, tmp_path, monkeypatch):
        """With the driver path disabled (kill switch), the Spark trickle
        refresh stays inside its pinned job budget."""
        monkeypatch.setenv("SPARK_GRAFT_DRIVER_TRICKLE", "0")
        rng = random.Random(95)
        a, b = _seed(spark, tmp_path, rng, n_facts=500)
        v = _build(spark, tmp_path, a, b)
        # warm one refresh (JIT, codegen, first-touch listings)
        mor.merge_upsert_mor(
            spark, _fdf(spark, _facts(rng, [1])), a, ["f_id"],
            compact_every=None,
        )
        ij.refresh_join_view(spark, v)
        mor.merge_upsert_mor(
            spark, _fdf(spark, _facts(rng, [2])), a, ["f_id"],
            compact_every=None,
        )
        tracker = spark.sparkContext.statusTracker()
        before = set(tracker.getJobIdsForGroup() or [])
        r = ij.refresh_join_view(spark, v)
        n_jobs = len(set(tracker.getJobIdsForGroup() or []) - before)
        assert r["mode"] == "incremental" and r.get("path") != "driver"
        assert n_jobs <= 35, f"trickle view refresh ran {n_jobs} jobs"


class TestDriverSparkEquivalence:
    def test_twin_views_bitwise_equal(self, spark, tmp_path, monkeypatch):
        """The SAME change sequence applied to twin views — one refreshed
        driver-side, one with the driver path killed — must publish
        identical view content and identical maintained digests."""
        from presencia_etl_spark.operators import cdc
        from presencia_etl_spark.sinks import digest_store

        rng = random.Random(96)
        a, b = _seed(spark, tmp_path, rng, n_facts=120)
        v1 = _build(spark, tmp_path, a, b)
        v2 = str(tmp_path / "view2")
        ij.build_join_view(
            spark, a, b, v2,
            on=[("f_did", "d_id")],
            a_key_cols=["f_id"], b_key_cols=["d_id"],
            a_cols=["f_id", "f_did", "f_amt"],
            b_cols=["d_id", "d_name", "d_rank"],
            num_buckets=8, compact_every=None,
        )
        for step in range(4):
            batch = _facts(rng, rng.sample(range(200), 5))
            mor.merge_upsert_mor(
                spark, _fdf(spark, batch), a, ["f_id"], compact_every=None
            )
            if step == 2:
                mor.delete_keys_mor(
                    spark, a, spark.createDataFrame([(3,)], "f_id long"),
                    ["f_id"], compact_every=None,
                )
            r1 = ij.refresh_join_view(spark, v1)
            assert r1.get("path") == "driver", "expected the driver path"
            monkeypatch.setenv("SPARK_GRAFT_DRIVER_TRICKLE", "0")
            r2 = ij.refresh_join_view(spark, v2)
            monkeypatch.delenv("SPARK_GRAFT_DRIVER_TRICKLE")
            assert r2.get("path") != "driver"
            assert (r1["upserts"], r1["deletes"]) == (
                r2["upserts"], r2["deletes"],
            )
            got1 = _canon(ij.read_join_view(spark, v1))
            got2 = _canon(ij.read_join_view(spark, v2))
            assert got1 == got2, f"step {step}"
            # stored hashes (and hence digests) must agree bit-for-bit
            d1 = cdc.state_digest(
                mor.read_mor(spark, v1).select(cdc.KEY_COL, "row_hash")
            )
            d2 = cdc.state_digest(
                mor.read_mor(spark, v2).select(cdc.KEY_COL, "row_hash")
            )
            assert d1 == d2
            for vv in (v1, v2):
                side = digest_store.load(vv)
                if side is not None:
                    assert side == d1
        _assert_matches_recompute(spark, v1)
        _assert_matches_recompute(spark, v2)


class TestRefreshCli:
    def test_refresh_view_and_agg_subcommands(self, spark, tmp_path, capsys):
        """The cron's maintained-result loop from the command line:
        refresh-view / refresh-agg fold the pending feeds; their
        steady-state passes (cursors current — fs metadata) answer
        noop before any session would be needed."""
        import json as _json

        from presencia_etl_spark.__main__ import main

        rng = random.Random(97)
        a, b = _seed(spark, tmp_path, rng, n_facts=150)
        v = _build(spark, tmp_path, a, b)
        agg = str(tmp_path / "agg")
        ia.build_agg_snapshot(spark, v, agg, ["d_name"], ["f_amt"])

        def run(args):
            assert main(args) == 0
            return _json.loads(
                capsys.readouterr().out.strip().splitlines()[-1]
            )["result"]

        # steady state: both noop
        assert run(["refresh-view", "--view", v])["mode"] == "noop"
        assert run(["refresh-agg", "--agg", agg, "--source", v])["mode"] == "noop"
        # fact moves -> view refresh -> agg refresh, all via CLI
        mor.merge_upsert_mor(
            spark, _fdf(spark, _facts(rng, range(150, 155))), a, ["f_id"],
            compact_every=None,
        )
        rv = run(["refresh-view", "--view", v])
        assert rv["mode"] == "incremental" and rv["upserts"] == 5
        ra = run(["refresh-agg", "--agg", agg, "--source", v])
        assert ra["mode"] == "incremental" and ra["changed_rows"] == 5
        _assert_matches_recompute(spark, v)


class TestCompositeKeyProbeOrder:
    def test_driver_probe_respects_key_declaration_order(
        self, spark, tmp_path
    ):
        """Regression: the driver path's point probe must composite the
        lookup key in the TARGET's key_cols order, not the join-pair
        declaration order — here the `on` pairs are deliberately
        REVERSED relative to b_key_cols."""
        a, b = str(tmp_path / "cf"), str(tmp_path / "cd")
        facts = [(i, f"x{i % 3}", f"y{i % 2}", float(i)) for i in range(30)]
        mor.merge_upsert_mor(
            spark,
            spark.createDataFrame(
                facts, "f_id long, f_k1 string, f_k2 string, f_amt double"
            ),
            a, ["f_id"], num_buckets=4, compact_every=None,
        )
        dims = [
            (f"x{i}", f"y{j}", f"n{i}{j}") for i in range(3) for j in range(2)
        ]
        mor.merge_upsert_mor(
            spark,
            spark.createDataFrame(dims, "d_k1 string, d_k2 string, d_name string"),
            b, ["d_k1", "d_k2"], num_buckets=4, compact_every=None,
        )
        v = str(tmp_path / "cview")
        ij.build_join_view(
            spark, a, b, v,
            on=[("f_k2", "d_k2"), ("f_k1", "d_k1")],  # reversed vs keys
            a_key_cols=["f_id"], b_key_cols=["d_k1", "d_k2"],
            a_cols=["f_id", "f_k1", "f_k2", "f_amt"],
            b_cols=["d_k1", "d_k2", "d_name"],
            num_buckets=4, compact_every=None,
        )
        mor.merge_upsert_mor(
            spark,
            spark.createDataFrame(
                [(2, "x1", "y0", 99.0), (50, "x0", "y1", 1.0)],
                "f_id long, f_k1 string, f_k2 string, f_amt double",
            ),
            a, ["f_id"], compact_every=None,
        )
        r = ij.refresh_join_view(spark, v)
        assert r["mode"] == "incremental" and r.get("path") == "driver"
        assert r["upserts"] == 2, "both changed facts must re-match"
        _assert_matches_recompute(spark, v)

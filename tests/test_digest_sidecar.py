"""Persisted digest sidecars (sinks/digest_store.py): the sidecar may
only ever make a merge FASTER — every path that could make it wrong must
fail closed to the scan. Core guarantee: the incrementally-maintained
sidecar is bit-identical to a digest recomputed from the live state, after
any sequence of merges (all three families, inserts/updates/deletes)."""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import functions as F

from presencia_etl_spark.functions.hashing import with_row_hash
from presencia_etl_spark.operators import cdc
from presencia_etl_spark.sinks import digest_store, mor
from presencia_etl_spark.sinks.writers import (
    merge_upsert_parquet,
    merge_upsert_partitioned,
)


def _docs(spark, n=400, salt="0", drop_mod=None, extra_mod=None):
    df = spark.range(n).select(
        F.col("id"),
        F.col("id").cast("string").alias("K"),
        F.concat(F.lit(salt), (F.col("id") % 13).cast("string")).alias("V"),
    )
    if extra_mod:
        df = df.withColumn(
            "V",
            F.when(
                F.col("id") % extra_mod == 0, F.concat(F.col("V"), F.lit("x"))
            ).otherwise(F.col("V")),
        )
    if drop_mod:
        df = df.filter(F.col("id") % drop_mod != 0)
    return df.select("K", "V")


def _scan_digest(df):
    """Digest recomputed from a live frame that already carries
    _cdc_key + row_hash (what every merge target persists)."""
    rows = cdc._digest(
        df.select(cdc.KEY_COL, "row_hash"),
        "row_hash",
        cdc.DIGEST_MICRO_BUCKETS,
        "s",
    ).collect()
    return {r[cdc.MB_COL]: (r["_cs"], r["_xs"], r["_ys"]) for r in rows}


class TestApplyDelta:
    def test_insert_update_delete_algebra(self):
        dig = {1: (2, 10, 20)}
        # insert into a new bucket, update in-place, then delete it back out
        d1 = digest_store.apply_delta(dig, [(2, 1, 7, 9)])
        assert d1 == {1: (2, 10, 20), 2: (1, 7, 9)}
        d2 = digest_store.apply_delta(d1, [(2, 0, 7 ^ 5, 9 ^ 3)])  # update
        assert d2 == {1: (2, 10, 20), 2: (1, 5, 3)}
        d3 = digest_store.apply_delta(d2, [(2, -1, 5, 3)])  # delete
        assert d3 == {1: (2, 10, 20)}

    def test_zero_count_with_nonzero_fold_rejected(self):
        assert digest_store.apply_delta({1: (1, 5, 3)}, [(1, -1, 4, 3)]) is None

    def test_negative_count_rejected(self):
        assert digest_store.apply_delta({}, [(1, -1, 5, 3)]) is None

    def test_input_not_mutated(self):
        dig = {1: (1, 5, 3)}
        digest_store.apply_delta(dig, [(1, 1, 9, 9)])
        assert dig == {1: (1, 5, 3)}


class TestFingerprint:
    def test_sensitive_to_content_and_layout(self, tmp_path):
        t = tmp_path / "tbl"
        (t / "sub").mkdir(parents=True)
        (t / "a.parquet").write_bytes(b"aaaa")
        (t / "sub" / "b.parquet").write_bytes(b"bb")
        fp0 = digest_store.table_fingerprint(str(t))
        assert fp0 == digest_store.table_fingerprint(str(t))  # stable
        (t / "c.parquet").write_bytes(b"c")  # add
        fp1 = digest_store.table_fingerprint(str(t))
        assert fp1 != fp0
        os.remove(t / "c.parquet")  # remove → back to the original listing?
        # mtime_ns of survivors unchanged, so yes:
        assert digest_store.table_fingerprint(str(t)) == fp0
        # rewrite-in-place (same size, new mtime) must still invalidate
        os.utime(t / "a.parquet", ns=(1, 2))
        assert digest_store.table_fingerprint(str(t)) != fp0

    def test_sidecar_and_tmp_excluded(self, tmp_path):
        t = tmp_path / "tbl"
        t.mkdir()
        (t / "a.parquet").write_bytes(b"aaaa")
        fp0 = digest_store.table_fingerprint(str(t))
        (t / digest_store.SIDE_FILE).write_bytes(b"side")
        (t / digest_store._TMP).write_bytes(b"tmp")
        assert digest_store.table_fingerprint(str(t)) == fp0

    def test_save_load_roundtrip_and_staleness(self, tmp_path):
        t = tmp_path / "tbl"
        t.mkdir()
        (t / "a.parquet").write_bytes(b"aaaa")
        dig = {0: (3, -17, 9), 16383: (1, 2**62, -(2**62))}
        digest_store.save(str(t), dig)
        assert digest_store.load(str(t)) == dig
        (t / "b.parquet").write_bytes(b"b")  # external writer touches table
        assert digest_store.load(str(t)) is None

    def test_lister_seam(self, tmp_path, monkeypatch):
        """The fingerprint consumes an injectable listing provider — the
        object-store seam: a stubbed lister fully determines the result
        (no filesystem access), and swapping module-level
        ``default_lister`` reroutes every internal call."""
        t = tmp_path / "tbl"
        t.mkdir()
        (t / "real.parquet").write_bytes(b"xx")

        def stub_a(base):
            yield ("a.parquet", 10, 111)
            yield ("sub/b.parquet", 20, 222)
            yield (digest_store.SIDE_FILE, 5, 1)  # still excluded

        def stub_b(base):
            yield ("a.parquet", 10, 999)  # same file, new change token

        fp_a = digest_store.table_fingerprint(str(t), lister=stub_a)
        assert fp_a == digest_store.table_fingerprint(str(t), lister=stub_a)
        assert fp_a != digest_store.table_fingerprint(str(t), lister=stub_b)
        # a real-FS walk of the dir sees real.parquet, not the stub
        assert fp_a != digest_store.table_fingerprint(str(t))
        monkeypatch.setattr(digest_store, "default_lister", stub_a)
        assert digest_store.table_fingerprint(str(t)) == fp_a
        # save/load ride the swapped provider end-to-end
        digest_store.save(str(t), {3: (1, 7, 9)})
        assert digest_store.load(str(t)) == {3: (1, 7, 9)}
        monkeypatch.setattr(digest_store, "default_lister", stub_b)
        assert digest_store.load(str(t)) is None  # token changed → stale

    @pytest.mark.parametrize(
        "lister",
        [digest_store._local_lister, digest_store._content_token_lister],
        ids=["mtime", "content"],
    )
    def test_provider_conformance(self, tmp_path, lister):
        """The contract EVERY listing provider must meet: the
        fingerprint changes on file add / remove / rename / resize /
        same-size rewrite, and is deterministic for an untouched
        table."""
        t = tmp_path / "tbl"
        sub = t / "_kb=3"
        sub.mkdir(parents=True)
        (sub / "a.parquet").write_bytes(b"A" * 100)
        (t / "b.parquet").write_bytes(b"B" * 50)

        def fp():
            return digest_store.table_fingerprint(str(t), lister=lister)

        base = fp()
        assert base == fp()  # deterministic
        (t / "c.parquet").write_bytes(b"C")  # add
        f_add = fp()
        assert f_add != base
        os.remove(t / "c.parquet")  # remove -> back to base content set
        os.rename(sub / "a.parquet", sub / "a2.parquet")  # rename
        f_ren = fp()
        assert f_ren != base
        os.rename(sub / "a2.parquet", sub / "a.parquet")
        (t / "b.parquet").write_bytes(b"B" * 51)  # resize
        f_size = fp()
        assert f_size not in (base, f_ren)
        (t / "b.parquet").write_bytes(b"X" * 51)  # same-size rewrite
        assert fp() != f_size

    def test_content_lister_survives_mtime_scramble(
        self, tmp_path, monkeypatch
    ):
        """The advertised win of the content provider: a copy that
        scrambles mtimes (rsync without -t, an image round-trip) keeps
        the sidecar VALID — while the mtime provider correctly goes
        stale on the same scramble."""
        t = tmp_path / "tbl"
        t.mkdir()
        (t / "a.parquet").write_bytes(b"payload-1" * 100)
        (t / "b.parquet").write_bytes(b"payload-2" * 9000)
        dig = {7: (2, 11, -13)}
        monkeypatch.setenv("SPARK_GRAFT_DIGEST_LISTER", "content")
        digest_store.save(str(t), dig)
        assert digest_store.load(str(t)) == dig
        for f in ("a.parquet", "b.parquet"):
            os.utime(t / f, (12345, 67890))  # the scramble
        assert digest_store.load(str(t)) == dig, (
            "content tokens must not depend on mtime"
        )
        # a REAL rewrite (same size, different bytes) still invalidates
        (t / "a.parquet").write_bytes(b"payload-9" * 100)
        assert digest_store.load(str(t)) is None
        # the mtime provider, by contrast, is scramble-sensitive
        monkeypatch.setenv("SPARK_GRAFT_DIGEST_LISTER", "mtime")
        digest_store.save(str(t), dig)
        assert digest_store.load(str(t)) == dig
        os.utime(t / "b.parquet", (11111, 22222))
        assert digest_store.load(str(t)) is None

    def test_content_lister_sees_midfile_mutation(
        self, tmp_path, monkeypatch
    ):
        """The full-stream invariant: a same-size rewrite that changes
        ONLY middle bytes — head, tail (footer), and size all unchanged
        — must still perturb the content token and invalidate the
        sidecar. (A head+tail-sampling variant missed exactly this.)"""
        t = tmp_path / "tbl"
        t.mkdir()
        body = bytearray(b"\xaa" * (512 * 1024))  # 512 KiB, > 2 sample chunks
        (t / "a.parquet").write_bytes(bytes(body))
        dig = {3: (1, 5, -7)}
        monkeypatch.setenv("SPARK_GRAFT_DIGEST_LISTER", "content")
        digest_store.save(str(t), dig)
        assert digest_store.load(str(t)) == dig
        body[256 * 1024] ^= 0xFF  # flip one middle byte; size/head/tail same
        (t / "a.parquet").write_bytes(bytes(body))
        os.utime(t / "a.parquet", (12345, 67890))  # and hide the mtime too
        assert digest_store.load(str(t)) is None, (
            "a mid-file mutation must invalidate the content fingerprint"
        )

    def test_content_lister_token_cache(self, tmp_path):
        """Listing is O(changed bytes), not O(table bytes): a file whose
        (size, mtime_ns) stat pair is unchanged since this process last
        hashed it reuses the memoized token; any stat change re-hashes."""
        t = tmp_path / "tbl"
        t.mkdir()
        p = t / "a.parquet"
        p.write_bytes(b"Z" * 4096)
        tok1 = list(digest_store._content_token_lister(str(t)))[0][2]
        abs_p = str(p)
        assert abs_p in digest_store._CONTENT_TOKENS
        # poison the cached token: an unchanged stat must reuse it
        # verbatim (proving no re-hash happened) ...
        key, _ = digest_store._CONTENT_TOKENS[abs_p]
        digest_store._CONTENT_TOKENS[abs_p] = (key, "poisoned")
        assert (
            list(digest_store._content_token_lister(str(t)))[0][2]
            == "poisoned"
        )
        # ... and any stat change (even a pure mtime scramble) re-hashes,
        # repairing the token to the true content hash.
        os.utime(p, (12345, 67890))
        assert list(digest_store._content_token_lister(str(t)))[0][2] == tok1
        digest_store._CONTENT_TOKENS.pop(abs_p, None)

    def test_disabled_via_env(self, tmp_path, monkeypatch):
        t = tmp_path / "tbl"
        t.mkdir()
        monkeypatch.setenv("SPARK_GRAFT_DIGEST_SIDECAR", "0")
        digest_store.save(str(t), {1: (1, 2, 3)})
        assert not os.path.exists(t / digest_store.SIDE_FILE)
        monkeypatch.delenv("SPARK_GRAFT_DIGEST_SIDECAR")
        digest_store.save(str(t), {1: (1, 2, 3)})
        monkeypatch.setenv("SPARK_GRAFT_DIGEST_SIDECAR", "0")
        assert digest_store.load(str(t)) is None


class TestMaintainedEqualsScan:
    """After EVERY merge in a randomized sequence, a present-and-valid
    sidecar must equal the digest recomputed from the live state."""

    def _check(self, spark, path, live_df):
        side = digest_store.load(str(path))
        assert side is not None, "sidecar missing/stale after a digest merge"
        assert side == _scan_digest(live_df)

    @pytest.mark.parametrize("seed", [11, 23])
    def test_flat_sequence(self, spark, tmp_path, seed):
        rng = random.Random(seed)
        t = str(tmp_path / "flat")
        merge_upsert_parquet(spark, _docs(spark, 300), t, ["K"])
        for i in range(4):
            src = _docs(
                spark,
                n=rng.choice([280, 300, 330]),
                salt=rng.choice(["0", "1"]),
                extra_mod=rng.choice([None, 7, 50]),
            )
            merge_upsert_parquet(spark, src, t, ["K"])
            self._check(spark, t, spark.read.parquet(t))

    def test_bucketed_sequence(self, spark, tmp_path):
        t = str(tmp_path / "buck")
        merge_upsert_partitioned(spark, _docs(spark, 300), t, ["K"], num_buckets=8)
        for salt, extra in [("0", 50), ("0", 7), ("1", None)]:
            merge_upsert_partitioned(
                spark, _docs(spark, 320, salt=salt, extra_mod=extra), t,
                ["K"], num_buckets=8,
            )
            self._check(spark, t, spark.read.parquet(t))

    def test_mor_sequence_with_deletes_and_compaction(self, spark, tmp_path):
        t = str(tmp_path / "mor")
        mor.merge_upsert_mor(
            spark, _docs(spark, 300), t, ["K"], num_buckets=8, compact_every=None
        )
        for drop, extra in [(50, 7), (50, None), (None, 13)]:
            mor.merge_upsert_mor(
                spark, _docs(spark, 300, drop_mod=drop, extra_mod=extra), t,
                ["K"], num_buckets=8, compact_every=None, delete_missing=True,
            )
            self._check(spark, t, mor.read_mor(spark, t))
        side_before = digest_store.load(t)
        mor.compact_mor(spark, t)
        # Freshness-carry: compaction rearranges files, content unchanged.
        assert digest_store.load(t) == side_before
        self._check(spark, t, mor.read_mor(spark, t))

    def test_delete_ops_maintain_the_sidecar(self, spark, tmp_path):
        """TTL / GDPR erasure folds its victims out of the digest instead
        of knocking the sync loop back onto the scan path."""
        t = str(tmp_path / "mor")
        mor.merge_upsert_mor(
            spark, _docs(spark, 300), t, ["K"], num_buckets=8, compact_every=None
        )
        mor.merge_upsert_mor(  # no-change pass seeds the sidecar
            spark, _docs(spark, 300), t, ["K"], num_buckets=8, compact_every=None
        )
        assert digest_store.load(t) is not None
        r = mor.delete_where_mor(
            spark, t, F.col("K").cast("long") % 7 == 0, compact_every=None
        )
        assert r["delete"] == 43
        side = digest_store.load(t)
        assert side is not None, "delete invalidated the sidecar"
        assert side == _scan_digest(mor.read_mor(spark, t))
        # keyed erasure too
        keys = _docs(spark, 300).filter(F.col("K") == "1").select("K")
        r = mor.delete_keys_mor(spark, t, keys, ["K"], compact_every=None)
        assert r["delete"] == 1
        side = digest_store.load(t)
        assert side is not None
        assert side == _scan_digest(mor.read_mor(spark, t))
        # and the next snapshot merge rides it correctly
        r = mor.merge_upsert_mor(
            spark,
            _docs(spark, 300, drop_mod=7).filter(F.col("K") != "1"),
            t, ["K"], num_buckets=8, compact_every=None,
        )
        assert r == {
            "insert": 0, "update": 0, "skip": 256, "delete": 0,
            "delta_files": 0, "compacted": False,
        }

    def test_cow_deletes_maintain_the_sidecar(self, spark, tmp_path):
        """delete_where_partitioned / delete_where_parquet fold victims
        out like the MOR tombstone path does."""
        from presencia_etl_spark.sinks.writers import (
            delete_where_parquet,
            delete_where_partitioned,
        )

        flat = str(tmp_path / "flat")
        merge_upsert_parquet(spark, _docs(spark, 200), flat, ["K"])
        merge_upsert_parquet(spark, _docs(spark, 200), flat, ["K"])  # seed
        r = delete_where_parquet(spark, flat, F.col("K").cast("long") % 4 == 0)
        assert r["delete"] == 50
        side = digest_store.load(flat)
        assert side is not None and side == _scan_digest(spark.read.parquet(flat))

        buck = str(tmp_path / "buck")
        merge_upsert_partitioned(spark, _docs(spark, 200), buck, ["K"], num_buckets=8)
        merge_upsert_partitioned(spark, _docs(spark, 200), buck, ["K"], num_buckets=8)
        r = delete_where_partitioned(
            spark, buck, F.col("K").cast("long") % 4 == 0
        )
        assert r["delete"] == 50
        side = digest_store.load(buck)
        assert side is not None and side == _scan_digest(spark.read.parquet(buck))
        # the next sync rides the maintained sidecar to a clean no-op
        r = merge_upsert_partitioned(
            spark,
            _docs(spark, 200).filter(F.col("K").cast("long") % 4 != 0),
            buck, ["K"], num_buckets=8,
        )
        assert r == {
            "insert": 0, "update": 0, "skip": 150, "buckets_rewritten": 0
        }

    def test_delete_with_auto_compaction_keeps_sidecar_consistent(
        self, spark, tmp_path
    ):
        """The ordering-sensitive branch: tombstone delta lands →
        auto-compaction rearranges files (its own carry correctly fails
        on the mid-flight listing) → the OUTER save binds the folded
        digest to the final post-compaction listing."""
        t = str(tmp_path / "mor")
        mor.merge_upsert_mor(
            spark, _docs(spark, 200), t, ["K"], num_buckets=8, compact_every=None
        )
        mor.merge_upsert_mor(  # seed
            spark, _docs(spark, 200), t, ["K"], num_buckets=8, compact_every=None
        )
        assert digest_store.load(t) is not None
        r = mor.delete_where_mor(
            spark, t, F.col("K").cast("long") % 5 == 0, compact_every=1
        )
        assert r["delete"] == 40 and r["compacted"] is True
        side = digest_store.load(t)
        assert side is not None, "auto-compaction orphaned the delete's digest"
        assert side == _scan_digest(mor.read_mor(spark, t))

    def test_declined_dense_merge_still_seeds_sidecar(self, spark, tmp_path):
        t = str(tmp_path / "dense")
        merge_upsert_parquet(spark, _docs(spark, 300), t, ["K"])
        # every row mutated → decline (no pruning), but the digest was
        # computed, so the merge still maintains + saves the sidecar
        merge_upsert_parquet(spark, _docs(spark, 300, salt="9"), t, ["K"])
        self._check(spark, t, spark.read.parquet(t))


class TestMicroBatchMaintenance:
    """Round-10 decoupling: ``digest_prune=False`` merges (the streaming
    micro-batch shape — known-subset batches where the compare would
    prune nothing) must still MAINTAIN a valid sidecar, so a mixed
    trickle+snapshot workload keeps the snapshot sync on the
    zero-target-scan path. A stale/absent sidecar is never seeded from
    a subset merge (that would cost the state scan the trickle path
    exists to avoid)."""

    def _assert_next_sync_zero_target_scan(self, spark, monkeypatch, t, src):
        """The follow-up snapshot sync must ride the sidecar: the digest
        pass may aggregate the SOURCE only (tag 's'), never the target
        (tag 't' = the scan fallback)."""
        tags = []
        real = cdc._digest

        def spy(df, hash_col, micro, tag):
            tags.append(tag)
            return real(df, hash_col, micro, tag)

        monkeypatch.setattr(cdc, "_digest", spy)
        r = merge_upsert_parquet(spark, src, t, ["K"])
        monkeypatch.undo()
        assert r["insert"] == 0 and r["update"] == 0
        # 's' alone = source-side agg against the sidecar; [] = the tiny-
        # source driver fold. Either way the target was never scanned.
        assert "t" not in tags, f"snapshot sync fell back to a target scan: {tags}"

    def test_flat_subset_merges_keep_sidecar_valid(
        self, spark, tmp_path, monkeypatch
    ):
        t = str(tmp_path / "flat")
        full = _docs(spark, 300)
        merge_upsert_parquet(spark, full, t, ["K"])
        merge_upsert_parquet(spark, full, t, ["K"])  # seed sidecar
        assert digest_store.load(t) is not None
        # three known-subset micro-batches: updates, then inserts+updates
        for i, batch in enumerate([
            _docs(spark, 300, extra_mod=30).filter(F.col("K").cast("long") % 30 == 0),
            _docs(spark, 310, salt="z").filter(F.col("K").cast("long") >= 295),
            _docs(spark, 310, salt="z", extra_mod=7).filter(
                F.col("K").cast("long").between(290, 309)
            ),
        ]):
            r = merge_upsert_parquet(spark, batch, t, ["K"], digest_prune=False)
            assert r["insert"] + r["update"] > 0, f"batch {i} was a no-op"
            side = digest_store.load(t)
            assert side is not None, f"batch {i} invalidated the sidecar"
            assert side == _scan_digest(spark.read.parquet(t))
        # the cron snapshot sync right after the trickle batches stays on
        # the zero-target-scan path (source = the exact current state)
        cur = spark.read.parquet(t).select("K", "V")
        self._assert_next_sync_zero_target_scan(spark, monkeypatch, t, cur)

    def test_mor_subset_merges_keep_sidecar_valid(self, spark, tmp_path):
        t = str(tmp_path / "mor")
        full = _docs(spark, 300)
        mor.merge_upsert_mor(
            spark, full, t, ["K"], num_buckets=8, compact_every=None
        )
        mor.merge_upsert_mor(  # seed sidecar
            spark, full, t, ["K"], num_buckets=8, compact_every=None
        )
        assert digest_store.load(t) is not None
        for batch in [
            _docs(spark, 300, extra_mod=25).filter(F.col("K").cast("long") % 25 == 0),
            _docs(spark, 320, salt="q").filter(F.col("K").cast("long") >= 298),
        ]:
            r = mor.merge_upsert_mor(
                spark, batch, t, ["K"], num_buckets=8, compact_every=None,
                digest_prune=False,
            )
            assert r["insert"] + r["update"] > 0
            side = digest_store.load(t)
            assert side is not None, "micro-batch invalidated the sidecar"
            assert side == _scan_digest(mor.read_mor(spark, t))
        # next snapshot sync (prune on) is a clean sidecar-ridden no-op
        cur = mor.read_mor(spark, t).select("K", "V")
        r = mor.merge_upsert_mor(
            spark, cur, t, ["K"], num_buckets=8, compact_every=None
        )
        assert r["insert"] == 0 and r["update"] == 0 and r["delta_files"] == 0

    def test_subset_merge_never_seeds_missing_sidecar(self, spark, tmp_path):
        """No sidecar → a known-subset merge must not pay a state scan to
        create one (load-only maintenance)."""
        t = str(tmp_path / "flat")
        merge_upsert_parquet(spark, _docs(spark, 200), t, ["K"])
        assert not os.path.exists(os.path.join(t, digest_store.SIDE_FILE))
        merge_upsert_parquet(
            spark, _docs(spark, 200, extra_mod=40), t, ["K"], digest_prune=False
        )
        assert not os.path.exists(os.path.join(t, digest_store.SIDE_FILE))

    def test_streaming_micro_batches_e2e(self, spark, tmp_path):
        """The real foreachBatch path: two availableNow drains against a
        sidecar-bearing MOR table keep it fingerprint-valid; the next
        snapshot sync is a pure-skip no-op."""
        from presencia_etl_spark.streaming.micro_batch import (
            incremental_upsert_stream,
        )

        src_dir = str(tmp_path / "incoming")
        t = str(tmp_path / "state")
        ckpt = str(tmp_path / "ckpt")
        full = _docs(spark, 250)
        mor.merge_upsert_mor(
            spark, full, t, ["K"], num_buckets=8, compact_every=None
        )
        mor.merge_upsert_mor(  # seed sidecar
            spark, full, t, ["K"], num_buckets=8, compact_every=None
        )
        assert digest_store.load(t) is not None

        b1 = _docs(spark, 250, extra_mod=50).filter(
            F.col("K").cast("long") % 50 == 0
        )
        b1.write.mode("append").parquet(src_dir)
        q = incremental_upsert_stream(
            spark, src_dir, b1.schema, t, ["K"], ckpt, mode="mor"
        )
        q.awaitTermination(120)
        side = digest_store.load(t)
        assert side is not None, "micro-batch stream invalidated the sidecar"
        assert side == _scan_digest(mor.read_mor(spark, t))

        b2 = _docs(spark, 260, salt="w").filter(F.col("K").cast("long") >= 248)
        b2.write.mode("append").parquet(src_dir)
        q2 = incremental_upsert_stream(
            spark, src_dir, b1.schema, t, ["K"], ckpt, mode="mor"
        )
        q2.awaitTermination(120)
        side = digest_store.load(t)
        assert side is not None
        assert side == _scan_digest(mor.read_mor(spark, t))

        # the nightly snapshot sync right after trickle stays a clean no-op
        cur = mor.read_mor(spark, t).select("K", "V")
        r = mor.merge_upsert_mor(
            spark, cur, t, ["K"], num_buckets=8, compact_every=None
        )
        assert r == {
            "insert": 0, "update": 0, "skip": 260, "delete": 0,
            "delta_files": 0, "compacted": False,
        }


class TestFailClosed:
    def test_external_writer_staleness_falls_back_and_recovers(
        self, spark, tmp_path, monkeypatch
    ):
        t = str(tmp_path / "flat")
        merge_upsert_parquet(spark, _docs(spark, 200), t, ["K"])
        merge_upsert_parquet(spark, _docs(spark, 200), t, ["K"])  # seeds sidecar
        assert digest_store.load(t) is not None
        # a digest-UNAWARE writer touches the table (simulated via the
        # kill switch — digest_prune=False merges now MAINTAIN, so they
        # no longer model an unaware writer)
        monkeypatch.setenv("SPARK_GRAFT_DIGEST_SIDECAR", "0")
        merge_upsert_parquet(
            spark, _docs(spark, 220, extra_mod=7), t, ["K"], digest_prune=False
        )
        monkeypatch.delenv("SPARK_GRAFT_DIGEST_SIDECAR")
        assert digest_store.load(t) is None  # stale, not trusted
        r = merge_upsert_parquet(spark, _docs(spark, 220, extra_mod=7), t, ["K"])
        assert r == {"insert": 0, "update": 0, "skip": 220}
        # the scan-path no-change pass re-seeded it
        assert digest_store.load(t) == _scan_digest(spark.read.parquet(t))

    def test_save_failure_never_fails_merge(self, spark, tmp_path, monkeypatch):
        t = str(tmp_path / "flat")
        merge_upsert_parquet(spark, _docs(spark, 200), t, ["K"])

        def boom(path):
            raise OSError("disk on fire")

        monkeypatch.setattr(digest_store, "table_fingerprint", boom)
        with pytest.warns(UserWarning, match="sidecar save skipped"):
            r = merge_upsert_parquet(
                spark, _docs(spark, 200, extra_mod=50), t, ["K"]
            )
        assert r["update"] > 0
        monkeypatch.undo()
        assert digest_store.load(t) is None  # nothing stale got trusted
        # next merge scans, answers correctly, and re-seeds
        r = merge_upsert_parquet(spark, _docs(spark, 200, extra_mod=50), t, ["K"])
        assert r == {"insert": 0, "update": 0, "skip": 200}
        assert digest_store.load(t) == _scan_digest(spark.read.parquet(t))

    def test_corrupt_sidecar_ignored(self, spark, tmp_path):
        t = str(tmp_path / "flat")
        merge_upsert_parquet(spark, _docs(spark, 200), t, ["K"])
        with open(os.path.join(t, digest_store.SIDE_FILE), "wb") as f:
            f.write(b"not parquet at all")
        assert digest_store.load(t) is None
        r = merge_upsert_parquet(spark, _docs(spark, 200), t, ["K"])
        assert r == {"insert": 0, "update": 0, "skip": 200}


class TestDiffCliFastPath:
    def _seed(self, spark, path, df):
        """Two merges: the initial load, then a no-change pass whose scan
        fallback writes the sidecar."""
        merge_upsert_parquet(spark, df, path, ["K"])
        merge_upsert_parquet(spark, df, path, ["K"])
        assert digest_store.load(path) is not None

    def test_identical_replicas_proven_without_spark_jobs(
        self, spark, tmp_path, capsys
    ):
        import json as _json

        from presencia_etl_spark.__main__ import main

        left, right = str(tmp_path / "l"), str(tmp_path / "r")
        # independently WRITTEN replicas: audit ids/timestamps differ, but
        # the digests fold only (_cdc_key, data-only row_hash)
        self._seed(spark, left, _docs(spark, 150))
        self._seed(spark, right, _docs(spark, 150))
        tracker = spark.sparkContext.statusTracker()
        j0 = max(tracker.getJobIdsForGroup() or [0])
        assert main(["diff", "--left", left, "--right", right]) == 0
        j1 = max(tracker.getJobIdsForGroup() or [0])
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["result"] == {
            "identical": True, "counts": {}, "sample": {},
            "digest_proven": True,
        }
        assert j1 == j0, "digest-proven identical diff must run ZERO Spark jobs"

    def test_mismatch_prunes_via_sidecars(self, spark, tmp_path, capsys):
        import json as _json

        from presencia_etl_spark.__main__ import main

        left, right = str(tmp_path / "l"), str(tmp_path / "r")
        self._seed(spark, left, _docs(spark, 150))
        self._seed(spark, right, _docs(spark, 151, extra_mod=40))
        assert main(["diff", "--left", left, "--right", right]) == 0
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        r = out["result"]
        assert r["digest_proven"] is True
        assert r["identical"] is False
        assert r["counts"]["only_right"] == 1
        assert r["counts"]["differs"] == 4  # ids 0,40,80,120 of 150
        assert "only_left" not in r["counts"]

    def test_mor_pair_mismatch_reads_only_dirty_buckets(
        self, spark, tmp_path, capsys, monkeypatch
    ):
        """MOR replicas: the dirty diff's reads are LISTING-pruned to the
        dirty micro-buckets' _kb dirs (round 10) — counts unchanged."""
        import json as _json

        from presencia_etl_spark.__main__ import main
        from presencia_etl_spark.sinks import mor as mor_mod

        left, right = str(tmp_path / "l"), str(tmp_path / "r")
        for path, df in ((left, _docs(spark, 200)),
                         (right, _docs(spark, 201, extra_mod=100))):
            mor_mod.merge_upsert_mor(spark, df, path, ["K"], num_buckets=16,
                                     compact_every=None)
            mor_mod.merge_upsert_mor(spark, df, path, ["K"], num_buckets=16,
                                     compact_every=None)  # seed sidecar
            assert digest_store.load(path) is not None

        bucket_args = []
        real = mor_mod.read_mor

        def spy(spark_, path, as_of_seq=None, buckets=None):
            bucket_args.append(buckets)
            return real(spark_, path, as_of_seq=as_of_seq, buckets=buckets)

        monkeypatch.setattr(mor_mod, "read_mor", spy)
        assert main(["diff", "--left", left, "--right", right]) == 0
        monkeypatch.undo()
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        r = out["result"]
        assert r["digest_proven"] is True and r["identical"] is False
        assert r["counts"]["only_right"] == 1
        assert r["counts"]["differs"] == 2  # ids 0, 100
        assert bucket_args and all(
            b is not None and len(b) < 16 for b in bucket_args
        ), f"diff reads unpruned: {bucket_args}"

    def test_densely_diverged_states_decline_pruning(
        self, spark, tmp_path, capsys
    ):
        """Post-incident replicas differing nearly everywhere: the CLI
        applies the same dense-decline rule as every digest consumer —
        no 16K-value IN filters that prune nothing — but the result is
        still the correct full diff."""
        import json as _json

        from presencia_etl_spark.__main__ import main

        left, right = str(tmp_path / "l"), str(tmp_path / "r")
        self._seed(spark, left, _docs(spark, 150, salt="a"))
        self._seed(spark, right, _docs(spark, 150, salt="b"))  # all differ
        assert main(["diff", "--left", left, "--right", right]) == 0
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        r = out["result"]
        assert r["digest_proven"] is False
        assert r["identical"] is False
        assert r["counts"] == {"differs": 150}

    def test_custom_keys_skip_fast_path(self, spark, tmp_path, capsys):
        import json as _json

        from presencia_etl_spark.__main__ import main

        left, right = str(tmp_path / "l"), str(tmp_path / "r")
        self._seed(spark, left, _docs(spark, 100))
        self._seed(spark, right, _docs(spark, 100))
        assert main(["diff", "--left", left, "--right", right, "--key", "K"]) == 0
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["result"]["identical"] is True
        assert out["result"]["digest_proven"] is False


class TestDuplicateKeys:
    def test_dup_key_merge_skips_maintenance_and_recovers(
        self, spark, tmp_path
    ):
        """Two change rows for one key can't be folded into a per-key
        state digest — maintenance must stand down (warn + no save) and
        the next merge self-corrects on the scan path."""
        t = str(tmp_path / "flat")
        merge_upsert_parquet(spark, _docs(spark, 100), t, ["K"])
        merge_upsert_parquet(spark, _docs(spark, 100), t, ["K"])  # seed
        assert digest_store.load(t) is not None
        dup = _docs(spark, 100, extra_mod=10).unionByName(
            _docs(spark, 100, extra_mod=10).filter(F.col("K") == "10")
            .withColumn("V", F.concat(F.col("V"), F.lit("zz")))
        )
        with pytest.warns(UserWarning, match="duplicate keys"):
            r = merge_upsert_parquet(spark, dup, t, ["K"])
        assert r["update"] > 0
        # table changed, sidecar was NOT updated → stale, not trusted
        assert digest_store.load(t) is None
        # Later merges over the (now dup-polluted — a pre-existing merge
        # contract violation, not a sidecar artifact) target keep failing
        # closed: whatever they classify, no digest that disagrees with a
        # scan may ever be persisted.
        merge_upsert_parquet(spark, _docs(spark, 100, extra_mod=10), t, ["K"])
        side = digest_store.load(t)
        assert side is None or side == _scan_digest(spark.read.parquet(t))


class TestKillSwitch:
    def test_disabled_valve_skips_maintenance_cost(
        self, spark, tmp_path, monkeypatch
    ):
        """SPARK_GRAFT_DIGEST_SIDECAR=0 must remove the whole maintenance
        cost (delta fold job + cache columns), not just the save."""
        t = str(tmp_path / "flat")
        merge_upsert_parquet(spark, _docs(spark, 100), t, ["K"])
        monkeypatch.setenv("SPARK_GRAFT_DIGEST_SIDECAR", "0")
        called = []
        real = cdc.collect_digest_delta
        monkeypatch.setattr(
            cdc, "collect_digest_delta",
            lambda df: called.append(1) or real(df),
        )
        r = merge_upsert_parquet(
            spark, _docs(spark, 100, extra_mod=20), t, ["K"]
        )
        assert r["update"] > 0
        assert called == [], "delta fold ran with the sidecar disabled"
        assert not os.path.exists(os.path.join(t, digest_store.SIDE_FILE))


class TestCompareWithSidecar:
    def test_diff_states_with_known_dirty_matches_full(self, spark):
        a = _docs(spark, 200)
        b = _docs(spark, 202, extra_mod=30)
        full = sorted(
            map(tuple, cdc.diff_states(a, b, ["K"], digest_prune=False).collect())
        )
        kh_a = with_row_hash(cdc.with_cdc_key(a, ["K"]), ["K", "V"])
        kh_b = with_row_hash(cdc.with_cdc_key(b, ["K"]), ["K", "V"])
        da, db = _scan_digest(kh_a), _scan_digest(kh_b)
        dirty = sorted(mb for mb in set(da) | set(db) if da.get(mb) != db.get(mb))
        pruned = sorted(
            map(tuple, cdc.diff_states(a, b, ["K"], dirty_mb=dirty).collect())
        )
        assert pruned == full

    def test_digest_compare_against_dict_matches_scan_compare(self, spark):
        a = _docs(spark, 300)
        kh = with_row_hash(cdc.with_cdc_key(a, ["K"]), ["K", "V"])
        s = kh.select(cdc.KEY_COL, "row_hash")
        b = _docs(spark, 300, extra_mod=50)
        khb = with_row_hash(cdc.with_cdc_key(b, ["K"]), ["K", "V"])
        tgt = khb.select(cdc.KEY_COL, F.col("row_hash").alias("_tgt_hash"))
        via_scan = cdc.digest_compare(s, tgt)
        via_dict = cdc.digest_compare(s, None, tgt_digest=_scan_digest(khb))
        assert via_dict.dirty == via_scan.dirty
        assert via_dict.clean_src == via_scan.clean_src
        assert via_dict.tgt_digest == via_scan.tgt_digest

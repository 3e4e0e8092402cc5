"""Persisted MinHash index: incremental batch-vs-history near-dedup.

Covers: build/probe recall, bit-parity with the one-shot LSH pass (same
signatures ⇒ same candidates), the admit-batch ingest loop (history grows,
future batches dedup against admitted docs), and the on-disk layout the
scale story depends on (band_id partitioning for pruning)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from presencia_etl_spark.operators import dedup, dedup_index


BASE = "the quick brown fox jumps over the lazy dog while the cat sleeps nearby"


@pytest.fixture(scope="module")
def history(spark):
    rows = [
        (0, BASE),
        (1, BASE.replace("lazy", "sleepy")),
        (2, "completely different text about spark partitions and shuffles"),
        (3, "another unrelated document mentioning joins aggregates windows"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestBuildAndQuery:
    def test_probe_finds_history_near_dups(self, spark, history, tmp_path):
        idx = str(tmp_path / "idx")
        r = dedup_index.build_minhash_index(spark, history, "doc_id", "text", idx)
        assert r["docs"] == 4

        batch = spark.createDataFrame(
            [
                (100, BASE.replace("cat", "kitten")),   # near-dup of 0/1
                (101, "fresh text on watermarking late events in streams"),
            ],
            ["doc_id", "text"],
        )
        m = dedup_index.query_minhash_index(spark, batch, "doc_id", "text", idx)
        got = {(r["batch_id"], r["index_id"]): r["est_jaccard"] for r in m.collect()}
        assert (100, 0) in got and got[(100, 0)] > 0.5
        assert not any(b == 101 for b, _ in got)

    def test_resubmitted_id_not_its_own_dup(self, spark, history, tmp_path):
        idx = str(tmp_path / "idx2")
        dedup_index.build_minhash_index(spark, history, "doc_id", "text", idx)
        m = dedup_index.query_minhash_index(
            spark, history.filter(F.col("doc_id") == 0), "doc_id", "text", idx
        )
        pairs = {(r["batch_id"], r["index_id"]) for r in m.collect()}
        assert (0, 0) not in pairs
        assert (0, 1) in pairs  # still matches its true near-dup

    def test_band_layout_partitioned_for_pruning(self, spark, history, tmp_path):
        idx = str(tmp_path / "idx3")
        dedup_index.build_minhash_index(
            spark, history, "doc_id", "text", idx, bands=8
        )
        band_dirs = sorted(
            d
            for d in os.listdir(os.path.join(idx, dedup_index.BAND_DIR))
            if d.startswith("band_id=")
        )
        assert band_dirs == [f"band_id={i}" for i in range(8)]


class TestParityWithOneShot:
    def test_index_probe_equals_one_shot_candidates(self, spark, sf_dir, tmp_path):
        """Indexing the corpus and probing it with itself must surface the
        SAME pair set (and estimates) as the one-shot LSH pass — the
        signatures are bit-identical by construction, so any drift is a
        banding/probing bug. max_bucket is unbounded on both sides because
        the two paths measure bucket size differently (corpus rows vs
        matched pairs)."""
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        idx = str(tmp_path / "idx")
        dedup_index.build_minhash_index(spark, docs, "doc_id", "text", idx)

        one_shot = {
            (r["id_a"], r["id_b"]): r["est_jaccard"]
            for r in dedup.minhash_lsh_candidates(
                docs, "doc_id", "text", max_bucket=1 << 30
            ).collect()
        }
        probed = dedup_index.query_minhash_index(
            spark, docs, "doc_id", "text", idx, max_bucket=1 << 30
        )
        via_index = {}
        for r in probed.collect():
            a, b = sorted((r["batch_id"], r["index_id"]))
            via_index[(a, b)] = r["est_jaccard"]
        assert via_index == one_shot
        assert one_shot, "expected candidates in testdata"


class TestAdmitLoop:
    def test_admitted_docs_gate_future_batches(self, spark, history, tmp_path):
        idx = str(tmp_path / "idx")
        dedup_index.build_minhash_index(spark, history, "doc_id", "text", idx)

        fresh = "a brand new essay describing broadcast joins and salting"
        b1 = spark.createDataFrame(
            [(200, BASE.replace("dog", "hound")), (201, fresh)],
            ["doc_id", "text"],
        )
        admitted = dedup_index.admit_batch(
            spark, b1, "doc_id", "text", idx, est_threshold=0.5
        )
        assert [r["doc_id"] for r in admitted.collect()] == [201]
        assert dedup_index._read_meta(idx)["docs"] == 5

        # A later batch near-duplicating the ADMITTED doc is now caught.
        b2 = spark.createDataFrame(
            [(300, fresh.replace("salting", "skew salting"))],
            ["doc_id", "text"],
        )
        m = dedup_index.query_minhash_index(spark, b2, "doc_id", "text", idx)
        pairs = {(r["batch_id"], r["index_id"]) for r in m.collect()}
        assert (300, 201) in pairs

    def test_admit_without_update_leaves_index_frozen(
        self, spark, history, tmp_path
    ):
        idx = str(tmp_path / "idx2")
        dedup_index.build_minhash_index(spark, history, "doc_id", "text", idx)
        b = spark.createDataFrame(
            [(400, "frozen index probe only, no registration")],
            ["doc_id", "text"],
        )
        dedup_index.admit_batch(
            spark, b, "doc_id", "text", idx, update_index=False
        )
        assert dedup_index._read_meta(idx)["docs"] == 4

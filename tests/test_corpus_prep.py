"""End-to-end training-corpus prep plan: gate → dedup → chunk → pack."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from presencia_etl_spark.operators import dedup_index
from presencia_etl_spark.plans.corpus_prep import prepare_training_corpus


BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "nearby in the warm afternoon sun and the birds keep singing softly"
)


class TestCorpusPrep:
    def test_full_pipeline(self, spark, tmp_path):
        idx = str(tmp_path / "idx")
        history = spark.createDataFrame(
            [(0, BASE), (1, "seed text about shuffle hash joins and exchanges")],
            ["doc_id", "text"],
        )
        dedup_index.build_minhash_index(spark, history, "doc_id", "text", idx)

        long_doc = " ".join(f"tok{i} filler word" for i in range(40))
        batch = spark.createDataFrame(
            [
                (100, BASE.replace("lazy", "sleepy")),  # near-dup → dropped
                (101, long_doc),                        # admitted, multi-chunk
                (102, "!!! ??? ,,,"),                   # junk → quality-gated
                (103, "a clean paragraph describing the watermark semantics of late events in structured streaming"),
            ],
            ["doc_id", "text"],
        )
        out = prepare_training_corpus(
            spark,
            batch,
            "doc_id",
            "text",
            idx,
            min_quality=0.2,
            est_threshold=0.5,
            chunk_tokens=32,
            overlap=8,
            pack_budget=64,
        )
        admitted = sorted(r["doc_id"] for r in out["admitted"].collect())
        assert admitted == [101, 103]

        chunks = out["chunks"].collect()
        assert {r["doc_id"] for r in chunks} == {101, 103}
        n101 = [r for r in chunks if r["doc_id"] == 101]
        assert len(n101) > 1  # 120 tokens at 32/8 → multiple windows
        # seq ids keep a doc's chunks adjacent and unique.
        seqs = sorted(r["seq_id"] for r in chunks)
        assert len(seqs) == len(set(seqs))

        packed = out["packed"].collect()
        assert {r["seq_id"] for r in packed} == set(seqs)  # nothing lost
        by_pack = {}
        for r in packed:
            by_pack.setdefault(r["pack_id"], 0)
            by_pack[r["pack_id"]] += r["chunk_token_count"]
        assert all(v <= 64 for v in by_pack.values())

        stats = out["pack_stats"].collect()[0]
        assert stats["n_docs"] == len(seqs)
        assert 0 < stats["mean_fill"] <= 1.0

        # The index grew by the admitted docs → a rerun admits nothing new.
        assert dedup_index._read_meta(idx)["docs"] == 4
        rerun = prepare_training_corpus(
            spark, batch, "doc_id", "text", idx,
            min_quality=0.2, est_threshold=0.5,
            chunk_tokens=32, overlap=8, pack_budget=64,
        )
        assert rerun["admitted"].count() == 0

    def test_no_quality_gate_passes_everything_clean(self, spark, tmp_path):
        idx = str(tmp_path / "idx2")
        dedup_index.build_minhash_index(
            spark,
            spark.createDataFrame([(0, BASE)], ["doc_id", "text"]),
            "doc_id",
            "text",
            idx,
        )
        batch = spark.createDataFrame([(10, "!!! ??? ,,,")], ["doc_id", "text"])
        out = prepare_training_corpus(
            spark, batch, "doc_id", "text", idx, min_quality=None,
            update_index=False,
        )
        assert out["admitted"].count() == 1


class TestOptionalGates:
    def test_repetition_and_decontamination_gates(self, spark, tmp_path):
        """Planted repetitive doc and benchmark leak are dropped BEFORE
        the probe; clean docs flow through to the admitted corpus."""
        idx = str(tmp_path / "idx")
        history = spark.createDataFrame(
            [(0, "seed history document about broadcast joins and plans")],
            ["doc_id", "text"],
        )
        dedup_index.build_minhash_index(spark, history, "doc_id", "text", idx)

        bench_item = (
            "which of the following best describes the time complexity "
            "of binary search over a sorted array of n elements"
        )
        clean = " ".join(f"distinct{i}" for i in range(90))
        repetitive = " ".join(["spam ham"] * 40)
        leaked = f"some intro then the leak {bench_item} trailing words"
        batch = spark.createDataFrame(
            [(200, clean), (201, repetitive), (202, leaked)],
            ["doc_id", "text"],
        )
        bench = spark.createDataFrame([(bench_item,)], ["text"])

        out = prepare_training_corpus(
            spark,
            batch,
            "doc_id",
            "text",
            idx,
            min_quality=None,
            filter_repetition=True,
            decontam_benchmark=bench,
        )
        admitted = {r["doc_id"] for r in out["admitted"].select("doc_id").collect()}
        assert admitted == {200}

"""Chunking: coverage, overlap, determinism, accounting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from presencia_etl_spark.operators import chunking


def _doc(n_tokens: int, word: str = "w") -> str:
    return " ".join(f"{word}{i}" for i in range(n_tokens))


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, _doc(100)),   # multi-chunk
        (1, _doc(12)),    # exactly one chunk boundary case (== chunk size)
        (2, _doc(5)),     # shorter than a chunk
        (3, ""),          # empty
        (4, _doc(13)),    # one token past a chunk
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestChunkDocuments:
    def test_every_token_covered_in_order(self, docs):
        out = chunking.chunk_documents(docs, "doc_id", "text", chunk_tokens=12, overlap=4)
        by_doc = {}
        for r in out.orderBy("doc_id", "chunk_idx").collect():
            by_doc.setdefault(r["doc_id"], []).append(r)
        for d in docs.collect():
            toks = [t for t in d["text"].split() if t]
            rebuilt = []
            for i, ch in enumerate(by_doc[d["doc_id"]]):
                ctoks = ch["chunk_text"].split() if ch["chunk_text"] else []
                assert ch["chunk_token_count"] == len(ctoks)
                rebuilt.extend(ctoks if i == 0 else ctoks[4:])
            assert rebuilt == toks, f"doc {d['doc_id']} not covered"

    def test_consecutive_chunks_share_exactly_overlap(self, docs):
        out = chunking.chunk_documents(docs, "doc_id", "text", chunk_tokens=12, overlap=4)
        rows = out.filter(F.col("doc_id") == 0).orderBy("chunk_idx").collect()
        assert len(rows) == 12  # ceil((100-4)/8)
        for prev, cur in zip(rows, rows[1:]):
            assert prev["chunk_text"].split()[-4:] == cur["chunk_text"].split()[:4]

    def test_short_and_exact_docs_get_one_full_chunk(self, docs):
        out = chunking.chunk_documents(docs, "doc_id", "text", chunk_tokens=12, overlap=4)
        got = {r["doc_id"]: r for r in out.filter(F.col("doc_id").isin(1, 2)).collect()}
        assert got[1]["chunk_idx"] == 0 and got[1]["chunk_token_count"] == 12
        assert got[2]["chunk_idx"] == 0 and got[2]["chunk_token_count"] == 5
        assert out.filter(F.col("doc_id").isin(1, 2)).count() == 2

    def test_empty_doc_yields_one_empty_chunk(self, docs):
        row = chunking.chunk_documents(docs, "doc_id", "text").filter(
            F.col("doc_id") == 3
        ).collect()
        assert len(row) == 1 and row[0]["chunk_token_count"] == 0

    def test_chunk_ids_deterministic(self, docs):
        a = chunking.chunk_documents(docs, "doc_id", "text", 12, 4)
        b = chunking.chunk_documents(docs, "doc_id", "text", 12, 4)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
        ids = [r["chunk_id"] for r in a.collect()]
        assert len(ids) == len(set(ids))

    def test_rejects_bad_overlap(self, docs):
        with pytest.raises(ValueError):
            chunking.chunk_documents(docs, "doc_id", "text", 10, 10)
        with pytest.raises(ValueError):
            chunking.chunk_documents(docs, "doc_id", "text", 10, -1)

    def test_accounting_identity(self, docs):
        """total chunk tokens = doc tokens + overlap·(n_chunks−1): the
        closed-form audit a pipeline checks instead of re-reading text."""
        out = chunking.chunk_documents(docs, "doc_id", "text", chunk_tokens=12, overlap=4)
        acct = {r["doc_id"]: r for r in chunking.reassemble_counts(out, "doc_id").collect()}
        for d in docs.collect():
            n = len([t for t in d["text"].split() if t])
            a = acct[d["doc_id"]]
            assert a["total_chunk_tokens"] == n + 4 * (a["n_chunks"] - 1) or n == 0

    def test_no_shuffle_in_plan(self, docs):
        plan = chunking.chunk_documents(docs, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

"""Product quantization (operators/similarity pq_*) — codebook fit
determinism, encode/decode round-trip + compression, ADC exactness on
codebook fixed points, recall against the brute-force oracle, and the
two-stage rerank path collapsing to exact cosine top-k."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from presencia_etl_spark.operators import similarity as sim

DIM, M, CODES = 16, 4, 64


def _clustered(n, seed, n_centers=6, noise=0.5):
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_centers, DIM) * 3.0
    pts = centers[rng.randint(0, n_centers, n)] + rng.randn(n, DIM) * noise
    return pts


def _vec_df(spark, X, id_offset=0):
    return spark.createDataFrame(
        [
            (int(i + id_offset), [float(x) for x in row])
            for i, row in enumerate(X)
        ],
        "vec_id bigint, embedding array<double>",
    )


@pytest.fixture(scope="module")
def corpus(spark):
    X = _clustered(400, seed=7)
    df = _vec_df(spark, X).localCheckpoint(eager=True)
    books = sim.pq_fit_codebooks(
        df, m=M, n_codes=CODES, sample_rows=400, seed=11
    )
    return X, df, books


class TestFitAndRoundtrip:
    def test_codebook_shape_and_determinism(self, spark, corpus):
        _X, df, books = corpus
        assert len(books) == M
        assert all(len(b) <= CODES for b in books)
        assert all(len(c) == DIM // M for b in books for c in b)
        again = sim.pq_fit_codebooks(
            df, m=M, n_codes=CODES, sample_rows=400, seed=11
        )
        assert again == books  # same sample, same seed → same books

    def test_fit_validates_divisibility(self, spark, corpus):
        _X, df, _books = corpus
        with pytest.raises(ValueError, match="not divisible"):
            sim.pq_fit_codebooks(df, m=5, sample_rows=64)
        with pytest.raises(ValueError, match="256"):
            sim.pq_fit_codebooks(df, m=M, n_codes=512)

    def test_encode_compresses_and_decode_reconstructs(self, spark, corpus):
        X, df, books = corpus
        enc = sim.pq_encode(df, books)
        rows = enc.select("vec_id", "pq_code").collect()
        assert all(len(r["pq_code"]) == M for r in rows)  # m bytes/vector
        dec = {
            r["vec_id"]: np.asarray(r["embedding_approx"])
            for r in sim.pq_decode(enc, books).collect()
        }
        # reconstruction error is small relative to the data spread on
        # clustered vectors (that's the whole PQ bet)
        errs = [np.linalg.norm(dec[i] - X[i]) for i in range(len(X))]
        spread = np.linalg.norm(X.std(0))
        assert np.mean(errs) < 0.35 * spread

    def test_encode_is_decode_fixed_point(self, spark, corpus):
        _X, df, books = corpus
        enc = sim.pq_encode(df, books)
        dec = sim.pq_decode(enc, books).select(
            "vec_id", F.col("embedding_approx").alias("embedding")
        )
        re_enc = sim.pq_encode(dec, books)
        a = {r["vec_id"]: r["pq_code"] for r in enc.collect()}
        b = {r["vec_id"]: r["pq_code"] for r in re_enc.collect()}
        assert a == b


class TestAdcScan:
    def test_adc_distance_is_exact_on_quantized_corpus(self, spark, corpus):
        """ADC computes ||q - decode(code)||² exactly — verified against
        numpy on the decoded vectors."""
        X, df, books = corpus
        enc = sim.pq_encode(df, books).select("vec_id", "pq_code")
        dec = {
            r["vec_id"]: np.asarray(r["embedding_approx"])
            for r in sim.pq_decode(sim.pq_encode(df, books), books).collect()
        }
        qX = _clustered(3, seed=23)
        q = _vec_df(spark, qX, id_offset=10_000)
        got = sim.pq_topk(enc, q, books, k=5).collect()
        assert {r["rk"] for r in got} <= set(range(1, 6))
        for r in got:
            want = float(
                np.sum((qX[r["query_id"] - 10_000] - dec[r["neighbor_id"]]) ** 2)
            )
            assert r["adc_dist"] == pytest.approx(want, abs=1e-4)

    def test_recall_vs_brute_force(self, spark, corpus):
        """Planted neighbors: each query is a corpus vector + tiny noise;
        the quantized scan must recover the true nearest neighbor for
        nearly all queries (clustered data, 32× compression)."""
        X, df, books = corpus
        rng = np.random.RandomState(31)
        targets = rng.choice(len(X), 20, replace=False)
        qX = X[targets] + rng.randn(20, DIM) * 0.01
        q = _vec_df(spark, qX, id_offset=10_000)
        enc = sim.pq_encode(df, books).select("vec_id", "pq_code")
        got = sim.pq_topk(enc, q, books, k=1).collect()
        hits = sum(
            1
            for r in got
            if r["rk"] == 1
            and r["neighbor_id"] == targets[r["query_id"] - 10_000]
        )
        assert hits >= 18  # ≥90% top-1 recall

    def test_self_queries_keep_full_k(self, spark, corpus):
        """Queries that ARE corpus rows: the post-scan self-filter must
        not cost a candidate slot (the scan keeps take+1 per batch), so
        every query still gets exactly k non-self neighbors."""
        X, df, books = corpus
        q = _vec_df(spark, X[:5])  # ids 0..4 are corpus ids
        enc = sim.pq_encode(df, books).select("vec_id", "pq_code")
        got = sim.pq_topk(enc, q, books, k=3).collect()
        per_q: dict = {}
        for r in got:
            assert r["neighbor_id"] != r["query_id"]
            per_q.setdefault(r["query_id"], set()).add(r["rk"])
        assert len(per_q) == 5
        assert all(v == {1, 2, 3} for v in per_q.values())

    def test_rerank_collapses_to_exact_cosine(self, spark, corpus):
        """With rerank_factor covering the whole corpus, the two-stage
        read path must equal brute-force cosine_topk exactly."""
        _X, df, books = corpus
        qX = _clustered(2, seed=41)
        q = _vec_df(spark, qX, id_offset=10_000)
        enc = sim.pq_encode(df, books).select("vec_id", "pq_code")
        got = sim.pq_topk(
            enc, q, books, k=3, rerank=df, rerank_factor=200
        ).collect()
        want = sim.cosine_topk(df, q, k=3).collect()

        def key(rows):
            return sorted(
                (r["query_id"], r["rk"], r["neighbor_id"], r["cosine"])
                for r in rows
            )

        assert key(got) == key(want)

    def test_modest_rerank_beats_raw_adc(self, spark, corpus):
        """The standard two-stage win: exact re-rank of 4k ADC candidates
        matches the brute-force top-3 more often than ADC order alone."""
        X, df, books = corpus
        rng = np.random.RandomState(53)
        targets = rng.choice(len(X), 10, replace=False)
        qX = X[targets] + rng.randn(10, DIM) * 0.05
        q = _vec_df(spark, qX, id_offset=10_000)
        enc = sim.pq_encode(df, books).select("vec_id", "pq_code")
        brute = {
            (r["query_id"], r["neighbor_id"])
            for r in sim.cosine_topk(df, q, k=3).collect()
        }
        rr = {
            (r["query_id"], r["neighbor_id"])
            for r in sim.pq_topk(
                enc, q, books, k=3, rerank=df, rerank_factor=4
            ).collect()
        }
        recall = len(rr & brute) / len(brute)
        assert recall >= 0.8

class TestIvfPq:
    def test_persisted_index_roundtrip_recall_and_pruning(
        self, spark, tmp_path, corpus
    ):
        """build -> query from the persisted artifact alone (no refit, no
        corpus): planted-neighbor recall holds, and the probed clusters
        prune the scan to their cluster= partition files."""
        X, df, _books = corpus
        path = str(tmp_path / "ivfpq")
        info = sim.build_ivf_pq_index(
            df, path, n_clusters=8, m=M, n_codes=CODES, sample_rows=400,
            seed=11,
        )
        assert info["clusters"] <= 8 and info["m"] == M
        rng = np.random.RandomState(61)
        targets = rng.choice(len(X), 12, replace=False)
        qX = X[targets] + rng.randn(12, DIM) * 0.01
        q = _vec_df(spark, qX, id_offset=20_000)
        got = sim.query_ivf_pq_index(spark, q, path, k=1, n_probe=3).collect()
        hits = sum(
            1
            for r in got
            if r["neighbor_id"] == targets[r["query_id"] - 20_000]
        )
        assert hits >= 10  # byte codes + 3-probe IVF keep planted recall
        # partition pruning: the probed-cluster filter lands in the
        # scan's PartitionFilters (dirs outside the probe set are never
        # listed, let alone read)
        import io
        from contextlib import redirect_stdout

        sub = spark.read.parquet(path).filter(F.col("cluster").isin([0, 1]))
        buf = io.StringIO()
        with redirect_stdout(buf):
            sub.explain("formatted")
        plan = buf.getvalue()
        assert "PartitionFilters" in plan and "cluster" in plan
        import re as _re

        pf = _re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert pf and pf.group(1).strip(), (
            "the cluster probe must push into partition pruning"
        )

    def test_persisted_index_rerank_stage(self, spark, tmp_path, corpus):
        """The two-stage read: ADC candidates from the index, exact
        cosine re-rank from the original vectors — output shape matches
        cosine_topk and the planted neighbor wins rank 1."""
        X, df, _books = corpus
        path = str(tmp_path / "ivfpq2")
        sim.build_ivf_pq_index(
            df, path, n_clusters=8, m=M, n_codes=CODES, sample_rows=400,
            seed=11,
        )
        rng = np.random.RandomState(67)
        targets = rng.choice(len(X), 6, replace=False)
        qX = X[targets] + rng.randn(6, DIM) * 0.01
        q = _vec_df(spark, qX, id_offset=20_000)
        got = sim.query_ivf_pq_index(
            spark, q, path, k=3, n_probe=3, rerank=df
        ).collect()
        assert {r["rk"] for r in got} == {1, 2, 3}
        top1 = {
            r["query_id"]: r["neighbor_id"] for r in got if r["rk"] == 1
        }
        hits = sum(
            1 for qi, nid in top1.items() if nid == targets[qi - 20_000]
        )
        assert hits >= 5

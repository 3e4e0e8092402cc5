"""Training-corpus preparation: the end-to-end LLM data pipeline.

Nothing like this exists in the reference (it syncs relational rows); this
plan composes the 100 TB extension operators into the shape a pretraining
data pipeline actually runs, start to finish, one code path batch or
streaming (``streaming.micro_batch.dedup_admit_stream`` runs the same
admit stage per micro-batch):

    raw docs
      → quality gate        (operators.text.quality_features — scan-local)
      → repetition gate     (optional; Gopher thresholds — scan-local)
      → decontamination     (optional; GPT-3 13-gram rule vs an eval set)
      → near-dedup vs ALL history   (operators.dedup_index — O(|batch|))
      → sliding-window chunking     (operators.chunking — shuffle-free)
      → token-budget packing        (operators.packing — sharded greedy)

Every stage is scan-local or narrow except packing's one groupBy(shard);
history never re-hashes and never shuffles. The plan returns the
intermediate frames so callers can persist whichever artifacts they keep
(admitted corpus, chunk table, packed batches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from presencia_etl_spark.operators import chunking, packing, text
from presencia_etl_spark.operators.dedup_index import admit_batch

# chunk sequence ids are doc_id << 16 | chunk_idx — keeps a doc's chunks
# adjacent in pack order (sequential shard-local greedy fills packs with
# consecutive chunks of one document before starting the next).
_CHUNK_IDX_BITS = 16


def prepare_training_corpus(
    spark: SparkSession,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    index_path: str,
    min_quality: float | None = 0.3,
    filter_repetition: bool = False,
    decontam_benchmark: DataFrame | None = None,
    est_threshold: float = 0.8,
    chunk_tokens: int = 512,
    overlap: int = 64,
    pack_budget: int = 2048,
    shard_docs: int = 100_000,
    update_index: bool = True,
) -> dict[str, DataFrame]:
    """Run the full prep pipeline over one batch of raw documents.

    Returns {'admitted', 'chunks', 'packed', 'pack_stats'} DataFrames.
    ``docs[id_col]`` must be a non-negative integer fitting 47 bits and a
    document must chunk into < 2**16 windows (~33 M tokens at the default
    512/64) — both so the derived chunk sequence id packs into one bigint
    without collisions; violations raise at plan build (id type) or are
    impossible by construction (chunk count ≤ tokens).

    Optional gates, both scan-local and applied BEFORE the index probe so
    rejected docs never cost signature work: ``filter_repetition`` drops
    docs failing the Gopher repetition thresholds
    (``text.repetition_features``); ``decontam_benchmark`` drops docs
    sharing any word 13-gram with the given eval set
    (``text.decontaminate``).

    Composed from ``admit_stage`` (gate → probe → admit → register) and
    ``assemble_stage`` (chunk → pack) — callers wanting stage-level
    control or timing (the bench, a stream that sinks admitted docs
    before assembling) call the stages directly.
    """
    admitted = admit_stage(
        spark,
        docs,
        id_col,
        text_col,
        index_path,
        min_quality=min_quality,
        filter_repetition=filter_repetition,
        decontam_benchmark=decontam_benchmark,
        est_threshold=est_threshold,
        update_index=update_index,
    )
    return {
        "admitted": admitted,
        **assemble_stage(
            admitted,
            id_col,
            text_col,
            chunk_tokens=chunk_tokens,
            overlap=overlap,
            pack_budget=pack_budget,
            shard_docs=shard_docs,
        ),
    }


def admit_stage(
    spark: SparkSession,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    index_path: str,
    min_quality: float | None = 0.3,
    filter_repetition: bool = False,
    decontam_benchmark: DataFrame | None = None,
    est_threshold: float = 0.8,
    update_index: bool = True,
) -> DataFrame:
    """Gate → near-dedup probe → admit → register: the ADMISSION half of
    the pipeline (what a replayed batch must pass exactly once). Returns
    the admitted rows, materialized."""
    gated = docs
    if min_quality is not None:
        gated = (
            text.quality_features(gated, text_col)
            .filter(F.col("quality_score") >= min_quality)
            .select(*docs.columns)
        )
    if filter_repetition:
        gated = (
            text.repetition_features(gated, text_col)
            .filter(F.col("repetition_ok"))
            .select(*docs.columns)
        )
    if decontam_benchmark is not None:
        gated = text.decontaminate(
            gated, decontam_benchmark, id_col, text_col
        )
    return admit_batch(
        spark,
        gated,
        id_col,
        text_col,
        index_path,
        est_threshold=est_threshold,
        update_index=update_index,
    )


def assemble_stage(
    admitted: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 512,
    overlap: int = 64,
    pack_budget: int = 2048,
    shard_docs: int = 100_000,
) -> dict[str, DataFrame]:
    """Chunk → pack: the ASSEMBLY half — pure transformation of already-
    admitted docs (safe to re-run, no state mutated)."""
    chunks = chunking.chunk_documents(
        admitted, id_col, text_col, chunk_tokens=chunk_tokens, overlap=overlap
    ).withColumn(
        "seq_id",
        F.shiftleft(F.col(id_col).cast("long"), _CHUNK_IDX_BITS).bitwiseOR(
            F.col("chunk_idx")
        ),
    )
    packed = packing.pack_sequences(
        chunks,
        "seq_id",
        "chunk_token_count",
        budget=pack_budget,
        shard_size=shard_docs << _CHUNK_IDX_BITS,
    )
    stats = packing.pack_stats(packed, "chunk_token_count", pack_budget)
    return {"chunks": chunks, "packed": packed, "pack_stats": stats}

"""Document chunking: sliding token windows for training-sequence prep.

No analogue in the reference (row-at-a-time ETL has no corpus prep); this
is the 100 TB extension that turns cleaned documents into model-ready
chunks. Pairs with ``operators.packing.pack_sequences`` (chunk → pack into
token-budget batches) and ``dedup_index.admit_batch`` (dedup before
chunking so near-dup documents don't multiply into near-dup chunks).

All JVM-side: one ``split`` per document bound ONCE via the
``transform(array(expr), x -> ...)`` idiom (a naive interpolation of the
split into every lambda re-tokenizes per chunk — the CLAUDE.md HOF rule),
then ``sequence``/``slice``/``array_join`` inside codegen and a single
``explode``. No shuffle at all: chunking is a per-row flatMap, so it
pipelines with the scan and scales linearly with cores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from presencia_etl_spark.functions.partitioning import parallelize_scan


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Explode documents into overlapping token-window chunks.

    Output: (<id_col>, chunk_idx, chunk_id, chunk_text, chunk_token_count).
    Windows start every ``chunk_tokens - overlap`` tokens; a window starts
    only while it would contribute more than ``overlap`` unseen tokens, so
    every token is covered, consecutive chunks share exactly ``overlap``
    tokens, and no chunk is a suffix-only rerun of the previous one. The
    final chunk may be short. ``chunk_id = xxhash64(id, chunk_idx)`` is
    deterministic, so chunk-level artifacts (packs, embeddings) are stable
    across reruns — the same reproducibility contract as
    ``exact_dedup_keep_first``.

    Empty / whitespace-only documents produce one empty chunk (idx 0)
    rather than disappearing: corpus accounting (docs in == docs out when
    grouping chunks back) is worth one degenerate row.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("require 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    chunks = F.expr(
        f"transform(array(filter(split({text_col}, '\\\\s+'), x -> x != '')),"
        f" toks -> transform("
        f"   sequence(0, int(greatest(ceil((size(toks) - {overlap}) / {stride}), 1)) - 1),"
        f"   i -> named_struct("
        f"     'chunk_idx', i,"
        f"     'chunk_text', array_join(slice(toks, i * {stride} + 1, {chunk_tokens}), ' '),"
        f"     'chunk_token_count', size(slice(toks, i * {stride} + 1, {chunk_tokens})))))[0]"
    )
    return (
        parallelize_scan(df)
        .select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(
            id_col,
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.xxhash64(F.col(id_col), F.col("c.chunk_idx")).alias("chunk_id"),
            F.col("c.chunk_text").alias("chunk_text"),
            F.col("c.chunk_token_count").alias("chunk_token_count"),
        )
    )


def reassemble_counts(chunks: DataFrame, id_col: str) -> DataFrame:
    """Per-document chunk accounting: (id, n_chunks, total_chunk_tokens).
    The audit half of the contract — joined back against pre-chunk token
    counts it proves coverage (every token appears; overlap tokens appear
    twice except in the final short chunk)."""
    return chunks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("chunk_token_count").cast("bigint").alias("total_chunk_tokens"),
    )

"""Custom stateful streaming operator: cross-batch dedup via
``applyInPandasWithState``.

Demonstrates the pattern for operators Structured Streaming lacks: per-key
state (here: the set of already-seen row hashes, capped) held by the state
store, updated per micro-batch in Arrow-batched pandas. This is streaming's
analog of the engine's batch CDC SKIP bucket — a row whose hash was seen in
ANY earlier micro-batch is dropped.

Scale notes: state is partitioned by key (one shuffle), bounded by
``max_hashes_per_key`` (at real scale, swap the exact set for a Bloom
filter serialized into the state row), and expired with a processing-time
timeout so abandoned keys don't accumulate.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup(
    stream_df: DataFrame,
    key_col: str,
    hash_col: str = "row_hash",
    max_hashes_per_key: int = 10_000,
    timeout_minutes: int | None = None,
) -> DataFrame:
    """Drop rows whose (key, hash) was already emitted in any prior batch.

    Input must already carry ``hash_col`` (use functions.hashing.with_row_hash).
    Output schema == input schema.
    """
    out_schema = stream_df.schema
    state_schema = T.StructType([T.StructField("seen", T.ArrayType(T.StringType()))])

    def dedup_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        seen: set[str] = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            fresh_mask = ~pdf[hash_col].isin(seen)
            fresh = pdf[fresh_mask]
            # Also drop dups WITHIN the batch, keeping first occurrence.
            fresh = fresh[~fresh[hash_col].duplicated()]
            seen.update(fresh[hash_col].tolist())
            if len(fresh):
                yield fresh
        state.update((list(seen)[-max_hashes_per_key:],))
        if timeout_minutes is not None:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    return stream_df.groupBy(key_col).applyInPandasWithState(
        dedup_fn, out_schema, state_schema, "append", timeout
    )

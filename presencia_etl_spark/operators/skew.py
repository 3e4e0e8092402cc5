"""Skew mitigation: salting for hot keys in aggregations and joins.

AQE's skew-join splitting handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled``, on by default in our session);
salting is the explicit tool for the cases AQE can't fix — a groupBy where
one key holds half the data, or a broadcast-infeasible join against a
skewed fact.

- **salted aggregation**: two-phase — salt the key into S shards, partial-
  aggregate per (key, salt), then merge shards. Turns one hot reducer into
  S parallel ones; cost is a second (tiny) shuffle of pre-aggregated rows.
- **salted join**: replicate the small side S times (one per salt value),
  salt the big side randomly-but-deterministically; the hot key's rows
  spread over S reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def _salt(df: DataFrame, cols: list[str], n: int) -> Column:
    """Deterministic pseudo-random salt in [0, n): hash of the full row's
    stable columns — spreads a hot key's rows evenly without RNG state."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n)).cast("int")


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_source: list[str] | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs``: {out_name: (fn, col)} with fn ∈ {sum, count, min, max}
    (algebraic functions that merge associatively; avg = sum+count at the
    call site). Example::

        salted_agg(df, "hot_key", {"cnt": ("count", "*"), "s": ("sum", "x")})
    """
    mergers = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    partials = []
    for out, (fn, col) in aggs.items():
        if fn == "count":
            partials.append(F.count(F.lit(1)).alias(out))
        elif fn in ("sum", "min", "max"):
            partials.append(getattr(F, fn)(col).alias(out))
        else:
            raise ValueError(f"non-algebraic agg {fn!r} cannot be salted")
    salted = df.withColumn(SALT_COL, _salt(df, salt_source or df.columns, n_salts))
    phase1 = salted.groupBy(key, SALT_COL).agg(*partials)
    finals = [mergers[fn](out).alias(out) for out, (fn, _) in aggs.items()]
    return phase1.groupBy(key).agg(*finals)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: small side replicated ×n_salts, big side salted.

    Use when the small side is too big to broadcast and the big side has
    hot keys. Replication cost: |small| × n_salts rows shuffled — choose
    n_salts ≈ (hot key rows) / (target rows per task).
    """
    big_s = big.withColumn(SALT_COL, _salt(big, big.columns, n_salts))
    small_rep = small.crossJoin(
        F.broadcast(
            big.sparkSession.range(n_salts).select(F.col("id").cast("int").alias(SALT_COL))
        )
    )
    return big_s.join(small_rep, [key, SALT_COL], how).drop(SALT_COL)


def key_skew_stats(
    df: DataFrame,
    key: str,
    sample_fraction: float = 0.01,
    max_sample: int = 100_000,
    seed: int = 42,
) -> dict:
    """Cheap key-frequency probe on a seeded sample (bounded rows → bounded
    cost regardless of table size). Returns {'top_share', 'n_keys',
    'sample_rows'} — top_share is the hottest key's fraction of sampled
    rows, the signal AQE also uses for its skew-join split decision."""
    sampled = df.select(key).sample(fraction=min(1.0, sample_fraction), seed=seed)
    if max_sample:
        sampled = sampled.limit(max_sample)
    row = (
        sampled.groupBy(key)
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.max("c").alias("top"),
            F.sum("c").alias("total"),
            F.count(F.lit(1)).alias("n_keys"),
        )
        .collect()[0]
    )
    total = row["total"] or 0
    return {
        "top_share": (row["top"] / total) if total else 0.0,
        "n_keys": row["n_keys"],
        "sample_rows": total,
    }


def choose_join_strategy(
    big: DataFrame,
    key: str,
    hot_share_threshold: float = 0.2,
    sample_fraction: float = 0.01,
    seed: int = 42,
) -> str:
    """'salted' when the sampled hottest key exceeds the threshold share of
    rows (one reducer would own ≥ threshold of the join input), else
    'plain' (Catalyst/AQE handle mild skew fine without replication)."""
    stats = key_skew_stats(big, key, sample_fraction=sample_fraction, seed=seed)
    return "salted" if stats["top_share"] >= hot_share_threshold else "plain"


def skew_aware_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
    hot_share_threshold: float = 0.2,
    sample_fraction: float = 0.01,
) -> DataFrame:
    """Auto-selecting equi-join: probes the big side's key frequencies and
    routes to ``salted_join`` only when a hot key would dominate a reducer
    — plain joins keep their broadcast/SMJ plans and pay zero replication.
    The probe is one bounded sample aggregation (scalar collect)."""
    strategy = choose_join_strategy(
        big, key, hot_share_threshold=hot_share_threshold, sample_fraction=sample_fraction
    )
    if strategy == "salted":
        return salted_join(big, small, key, n_salts=n_salts, how=how)
    return big.join(small, key, how)

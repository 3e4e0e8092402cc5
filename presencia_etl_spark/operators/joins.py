"""Join operators beyond plain equi-joins: as-of and range joins.

The reference has neither (SURVEY §2.3 "not present") — these are the
time-series joins a training-data/event pipeline needs, built from shuffle-
friendly primitives rather than O(n·m) theta joins:

- **as-of join**: for each left row, the latest right row with
  ``right_ts <= left_ts`` within the same key. Implemented with the
  union-tag-sort trick: one shuffle on the key, one ordered window pass,
  no point-in-interval explosion. (DuckDB's ASOF JOIN is the oracle.)
- **range join**: pairs within a bounded time distance, bucketed on
  ``floor(ts / width)`` so each row joins only its own and neighboring
  buckets — turns the quadratic theta join into a band join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from presencia_etl_spark.functions.dates import epoch_seconds


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: latest right row at-or-before each left row's time.

    Plan shape: union(left-tagged, right-tagged) → window partitioned by
    key ordered by (ts, side) → last non-null carried right value → keep
    left rows. One shuffle total (the window partition), which AQE sizes;
    no row explosion regardless of timestamp density. Right rows sort
    BEFORE left rows at equal timestamps, so ties are inclusive
    (right_ts == left_ts matches).
    """
    rc = right_cols or [c for c in right.columns if c not in (key, right_ts)]
    # Right-side payload travels as ONE struct so the carried values always
    # come from the same right row (per-column `last ignorenulls` could mix
    # rows when right columns contain NULLs).
    payload = F.struct(
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in rc],
    )
    r_tag = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        payload.alias("_r"),
        F.lit(0).alias("_side"),
    )
    l_tag = left.withColumn("_ts", F.col(left_ts)).withColumn(
        "_r", F.lit(None).cast(r_tag.schema["_r"].dataType)
    ).withColumn("_side", F.lit(1))
    left_cols = [c for c in left.columns]
    unioned = l_tag.select(
        F.col(key),
        "_ts",
        "_r",
        "_side",
        F.struct(*[F.col(c) for c in left_cols if c != key]).alias("_l"),
    ).unionByName(
        r_tag.withColumn(
            "_l",
            F.lit(None).cast(
                l_tag.select(
                    F.struct(*[F.col(c) for c in left_cols if c != key]).alias("_l")
                ).schema["_l"].dataType
            ),
        )
    )

    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("_r", F.last(F.col("_r"), ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1).select(
        F.col(key),
        *[F.col(f"_l.{c}").alias(c) for c in left_cols if c != key],
        *[F.col(f"_r.{right_ts}{suffix}").alias(f"{right_ts}{suffix}")],
        *[F.col(f"_r.{c}{suffix}").alias(f"{c}{suffix}") for c in rc],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_gap_seconds: int = 60,
    left_carry: list[str] | None = None,
    right_carry: list[str] | None = None,
) -> DataFrame:
    """Pairs (left, right) with same key and |left_ts - right_ts| ≤ gap.

    Band-join strategy: both sides bucketed on floor(epoch/gap); each left
    bucket joins right buckets {b-1, b, b+1} (exploded — 3 narrow
    duplicates of the left keys, not of payloads), then the exact predicate
    filters. Equi-join on (key, bucket) keeps Catalyst in hash-join land
    instead of a nested-loop theta join.
    """
    gap = int(max_gap_seconds)
    l = left.select(
        F.col(key),
        F.col(left_ts).alias("l_ts"),
        *[F.col(c).alias(f"l_{c}") for c in (left_carry or [])],
        F.explode(
            F.array(
                *[
                    (F.floor(epoch_seconds(left_ts) / gap) + d).alias("b")
                    for d in (-1, 0, 1)
                ]
            )
        ).alias("bucket"),
    )
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("r_ts"),
        *[F.col(c).alias(f"r_{c}") for c in (right_carry or [])],
        F.floor(epoch_seconds(right_ts) / gap).alias("bucket"),
    )
    joined = l.join(r, [key, "bucket"]).filter(
        F.abs(epoch_seconds("l_ts") - epoch_seconds("r_ts")) <= gap
    )
    return joined.drop("bucket")

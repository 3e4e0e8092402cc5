"""Aggregation / sort / limit operators (SURVEY §2.4, A1–A12).

All are single ``groupBy().agg()`` shapes — Spark does map-side partial
aggregation automatically, so each is one shuffle of the *aggregated*
(small) data, not the raw rows. Top-K uses sort+limit, which Spark executes
as a per-partition top-K (TakeOrderedAndProject) — no full sort at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from presencia_etl_spark.functions.dates import month_key


def frequency(df: DataFrame, col: str, count_alias: str = "cnt") -> DataFrame:
    """A2: per-value counts (the reference's Counter(estado))."""
    return df.groupBy(col).agg(F.count(F.lit(1)).alias(count_alias))


def monthly_rollup(
    df: DataFrame,
    date_col: str,
    measures: dict[str, Column] | None = None,
    month_alias: str = "month",
) -> DataFrame:
    """A3: group by 'yyyy-MM' month key with count + optional sums.

    Mirrors compare_historico_mensual.py:56-93 (count, sum(IMPLIQUIDA),
    sum(ABOLIQUIDA) per month).
    """
    aggs = [F.count(F.lit(1)).alias("cnt")]
    for alias, expr in (measures or {}).items():
        aggs.append(expr.alias(alias))
    return df.groupBy(month_key(date_col).alias(month_alias)).agg(*aggs)


def global_sums(df: DataFrame, measures: dict[str, Column]) -> DataFrame:
    """A4: whole-table sums + derived measures (deuda = imp - abo)."""
    return df.agg(*[expr.alias(alias) for alias, expr in measures.items()])


def date_min_max_distinct(df: DataFrame, date_col: str) -> DataFrame:
    """A5+A6: min/max of a date column and distinct-day count."""
    c = F.col(date_col)
    return df.agg(
        F.date_format(F.min(c), "yyyy-MM-dd").alias("min_date"),
        F.date_format(F.max(c), "yyyy-MM-dd").alias("max_date"),
        F.countDistinct(F.to_date(c)).alias("distinct_days"),
    )


def topk_by_count(df: DataFrame, key: Column | str, k: int) -> DataFrame:
    """A7: top-K groups by frequency, deterministic tiebreak on the key.

    Physical note: orderBy+limit compiles to TakeOrderedAndProject — each
    partition keeps only K rows, the driver merges K·P rows. No global sort.
    """
    kc = F.col(key) if isinstance(key, str) else key
    return (
        df.groupBy(kc.alias("k"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("k"))
        .limit(k)
    )


def duplicate_keys(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """A9: keys appearing more than once (CDC diagnostic,
    sync_INCREMENTAL.py:250-258)."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
    )


def table_counts_union(frames: dict[str, DataFrame]) -> DataFrame:
    """A12: one (table_name, row_count) frame per table, unioned.

    Each count is a partial-agg + single-row exchange; the union is
    driver-cheap.
    """
    out = None
    for name, df in frames.items():
        one = df.agg(F.count(F.lit(1)).alias("cnt")).select(
            F.lit(name).alias("table_name"), F.col("cnt")
        )
        out = one if out is None else out.unionByName(one)
    if out is None:
        raise ValueError("no frames given")
    return out

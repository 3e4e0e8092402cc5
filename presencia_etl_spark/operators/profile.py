"""Data-profiling operator: per-column quality summary.

The training-data curation primitive (and the generalization of the
reference's DESCRIBE-based schema audits, SURVEY §5 item 3): one pass over
the table computes, per column, null count/rate, approximate distinct
count, and min/max rendered as strings. All aggregations ride in a single
``agg()`` — one job, partial-aggregated, no per-column scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, columns: list[str] | None = None, exact_distinct: bool = False) -> DataFrame:
    """Long-format profile: (column, n_rows, n_null, null_rate,
    n_distinct, min_value, max_value).

    ``exact_distinct=False`` uses HLL (approx_count_distinct) — the scale
    default; exact costs one distinct-aggregate per column.
    """
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        col = F.col(c)
        aggs.append(F.count(F.when(col.isNull(), 1)).alias(f"_null_{c}"))
        if exact_distinct:
            aggs.append(F.countDistinct(col).alias(f"_dist_{c}"))
        else:
            aggs.append(F.approx_count_distinct(col, 0.02).alias(f"_dist_{c}"))
        aggs.append(F.min(col).cast("string").alias(f"_min_{c}"))
        aggs.append(F.max(col).cast("string").alias(f"_max_{c}"))
    wide = df.agg(*aggs)

    stack_args = []
    for c in cols:
        stack_args.append(f"'{c}'")
        stack_args.extend([f"_null_{c}", f"_dist_{c}", f"_min_{c}", f"_max_{c}"])
    stacked = wide.selectExpr(
        "_n",
        f"stack({len(cols)}, {', '.join(stack_args)}) as "
        "(column_name, n_null, n_distinct, min_value, max_value)",
    )
    return stacked.select(
        "column_name",
        F.col("_n").alias("n_rows"),
        "n_null",
        F.round(F.col("n_null") / F.col("_n"), 4).alias("null_rate"),
        "n_distinct",
        "min_value",
        "max_value",
    )


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Seeded stratified sample (``sampleBy``) — corpus curation by group
    (e.g. downsample dominant languages). Deterministic for a fixed seed
    and partitioning; approximate per-stratum sizes (Bernoulli sampling)."""
    return df.sampleBy(strata_col, fractions, seed)

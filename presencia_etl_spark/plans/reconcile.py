"""EP4 — source↔target reconciliation (``compare_historico_mensual.py`` /
``compare_noviembre_2025.py`` shape, SURVEY §3/§5).

The reference's differential-testing discipline as a reusable operator:
aggregate both sides the same way, full-outer join on the group key, emit
per-group diffs. Used by our bench as a self-check and exposed as a query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from presencia_etl_spark.functions.dates import month_key
from presencia_etl_spark.operators.cdc import key_set_diff


def monthly_reconcile(
    src: DataFrame,
    tgt: DataFrame,
    date_col: str,
    measures: dict[str, Column],
    last_n_months: int | None = None,
) -> DataFrame:
    """Month-by-month count+measure diff between two frames.

    Output: month, <m>_src, <m>_tgt, <m>_diff for count + each measure.
    ``last_n_months`` reproduces the reference's tail-12 slice
    (compare_historico_mensual.py:110).
    """

    def side(df: DataFrame, suffix: str) -> DataFrame:
        aggs = [F.count(F.lit(1)).alias(f"cnt_{suffix}")]
        for alias, expr in measures.items():
            aggs.append(expr.alias(f"{alias}_{suffix}"))
        return df.groupBy(month_key(date_col).alias("month")).agg(*aggs)

    # Full-outer can't broadcast in Spark, so this is the one SortMergeJoin
    # in the contract plans — by design: both sides are post-aggregation
    # month rows (|months|, not |rows|), so the sort is over dozens of rows
    # at ANY input scale. The heavy work (the two aggregations) is
    # partial+final hash-aggregated before the join.
    joined = side(src, "src").join(side(tgt, "tgt"), on="month", how="full_outer")
    out = joined
    for alias in ["cnt", *measures.keys()]:
        s = F.coalesce(F.col(f"{alias}_src"), F.lit(0))
        t = F.coalesce(F.col(f"{alias}_tgt"), F.lit(0))
        out = (
            out.withColumn(f"{alias}_src", s)
            .withColumn(f"{alias}_tgt", t)
            .withColumn(f"{alias}_diff", s - t)
        )
    out = out.orderBy(F.desc("month"))
    if last_n_months is not None:
        out = out.limit(last_n_months)
    return out.orderBy("month")


def reconcile_from_snapshots(
    spark,
    agg_src_path: str,
    agg_tgt_path: str,
    group_col: str = "month",
) -> DataFrame:
    """EP4 as a MAINTAINED pipeline: the month diff computed from two
    ``plans/incremental_agg`` snapshots instead of two full source
    scans. Each side's rollup is kept fresh in O(changes) by its own
    ``refresh_agg_snapshot`` loop; THIS read touches only the snapshots
    (O(groups) rows — dozens of months at any source scale), so the
    reference's per-run full-table reconcile (compare_historico_mensual
    .py:95-143) becomes a metadata-priced report. Diffed columns are the
    NUMERIC measures each snapshot's meta declares — ``n_rows`` plus the
    ``sum_``/``nn_`` pairs of the shared ``sum_cols`` — because only
    those support the coalesce-to-0 subtraction; ``min_``/``max_``
    columns (dates/timestamps) and ``hll_`` sketches (binary register
    blobs) are skipped, not crashed on. One-sided months coalesce the
    missing side to 0."""
    from presencia_etl_spark.plans.incremental_agg import (
        COUNT_COL,
        _nn_name,
        _read_meta,
        _sum_name,
        read_agg_snapshot,
    )

    s = read_agg_snapshot(spark, agg_src_path)
    t = read_agg_snapshot(spark, agg_tgt_path)
    shared_sums = [
        c
        for c in _read_meta(agg_src_path)["sum_cols"]
        if c in set(_read_meta(agg_tgt_path)["sum_cols"])
    ]
    common = [COUNT_COL] + [
        n
        for c in shared_sums
        for n in (_sum_name(c), _nn_name(c))
    ]
    common = [
        c for c in common if c in set(s.columns) and c in set(t.columns)
    ]
    s = s.select(group_col, *[F.col(c).alias(f"{c}_src") for c in common])
    t = t.select(group_col, *[F.col(c).alias(f"{c}_tgt") for c in common])
    out = s.join(t, on=group_col, how="full_outer")
    for c in common:
        sv = F.coalesce(F.col(f"{c}_src"), F.lit(0))
        tv = F.coalesce(F.col(f"{c}_tgt"), F.lit(0))
        out = (
            out.withColumn(f"{c}_src", sv)
            .withColumn(f"{c}_tgt", tv)
            .withColumn(f"{c}_diff", sv - tv)
        )
    return out.orderBy(group_col)


def reconcile_report(
    src: DataFrame,
    tgt: DataFrame,
    key_col: str,
    state_col: str | None = None,
    date_col: str | None = None,
    amount_col: str | None = None,
) -> DataFrame:
    """The full ``compare_noviembre_2025`` report as one long-format frame.

    Sections (mirroring compare_noviembre_2025.py:89-214): total row
    counts, per-state counts, min/max dates + distinct days, money sums,
    and key-set differences both directions. Output columns:
    (section, metric, src_value, tgt_value, diff) — every value rendered
    as a string so heterogeneous metrics union into one frame.
    """

    def side_metrics(df: DataFrame, tag: str) -> DataFrame:
        parts = []
        counts = df.agg(F.count(F.lit(1)).alias("v")).select(
            F.lit("counts").alias("section"),
            F.lit("total_rows").alias("metric"),
            F.col("v").cast("string").alias(tag),
        )
        parts.append(counts)
        if state_col is not None:
            parts.append(
                df.groupBy(state_col)
                .agg(F.count(F.lit(1)).alias("v"))
                .select(
                    F.lit("state_counts").alias("section"),
                    F.concat(F.lit(f"{state_col}="), F.col(state_col)).alias("metric"),
                    F.col("v").cast("string").alias(tag),
                )
            )
        if date_col is not None:
            parts.append(
                df.agg(
                    F.date_format(F.min(date_col), "yyyy-MM-dd").alias("min_date"),
                    F.date_format(F.max(date_col), "yyyy-MM-dd").alias("max_date"),
                    F.countDistinct(F.to_date(date_col)).cast("string").alias("distinct_days"),
                )
                .selectExpr(
                    "stack(3, 'min_date', min_date, 'max_date', max_date, "
                    "'distinct_days', distinct_days) as (metric, v)"
                )
                .select(
                    F.lit("dates").alias("section"), "metric", F.col("v").alias(tag)
                )
            )
        if amount_col is not None:
            parts.append(
                df.agg(F.round(F.sum(amount_col), 2).alias("v")).select(
                    F.lit("amounts").alias("section"),
                    F.lit(f"sum_{amount_col}").alias("metric"),
                    F.col("v").cast("string").alias(tag),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    s = side_metrics(src, "src_value")
    t = side_metrics(tgt, "tgt_value")
    merged = s.join(t, ["section", "metric"], "full_outer")

    only_src, only_tgt = key_set_diff(src, tgt, [key_col])
    keys = (
        only_src.agg(F.count(F.lit(1)).alias("v"))
        .select(
            F.lit("key_diff").alias("section"),
            F.lit("keys_only_in_src").alias("metric"),
            F.col("v").cast("string").alias("src_value"),
            F.lit("0").alias("tgt_value"),
        )
        .unionByName(
            only_tgt.agg(F.count(F.lit(1)).alias("v")).select(
                F.lit("key_diff").alias("section"),
                F.lit("keys_only_in_tgt").alias("metric"),
                F.lit("0").alias("src_value"),
                F.col("v").cast("string").alias("tgt_value"),
            )
        )
    )
    merged = merged.unionByName(keys)
    diff = F.when(
        F.coalesce(F.col("src_value"), F.lit("")) == F.coalesce(F.col("tgt_value"), F.lit("")),
        F.lit("OK"),
    ).otherwise(F.lit("DIFF"))
    return merged.withColumn("diff", diff)


def key_reconcile(src: DataFrame, tgt: DataFrame, key_cols: list[str]) -> DataFrame:
    """Exact key-set equality both directions
    (compare_noviembre_2025.py:193-214): rows present on only one side,
    tagged with the side."""
    only_src, only_tgt = key_set_diff(src, tgt, key_cols)
    return only_src.withColumn("side", F.lit("src_only")).unionByName(
        only_tgt.withColumn("side", F.lit("tgt_only"))
    )

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


def key_reconcile(src: DataFrame, tgt: DataFrame, key_cols: list[str]) -> DataFrame:
    """Exact key-set equality both directions
    (compare_noviembre_2025.py:193-214): rows present on only one side,
    tagged with the side."""
    only_src, only_tgt = key_set_diff(src, tgt, key_cols)
    return only_src.withColumn("side", F.lit("src_only")).unionByName(
        only_tgt.withColumn("side", F.lit("tgt_only"))
    )

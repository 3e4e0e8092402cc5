"""Projection / filter operators (SURVEY §2.2, P1–P8).

The reference applies filters row-at-a-time after a full table export
(``sync_ALL.py:128-156``). Declaratively expressed, Catalyst pushes the same
predicates into the parquet/JDBC scan (strict improvement, same semantics —
trap N4), so at 100 TB only matching row-groups are read.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from presencia_etl_spark.functions.nulls import null_safe_neq


@dataclass(frozen=True)
class Predicate:
    """One entry of a table's filter config (sync_ALL.py:34-45).

    op: 'eq' (string equality, P2) or 'neq' (NULL-KEEPING inequality, P3 —
    the reference's Python ``row.get(f) != v`` keeps missing values).
    """

    column: str
    op: str
    value: str

    def to_column(self) -> Column:
        if self.op == "eq":
            return F.col(self.column) == F.lit(self.value)
        if self.op == "neq":
            return null_safe_neq(self.column, self.value)
        raise ValueError(f"unknown predicate op: {self.op!r}")


def apply_filters(df: DataFrame, predicates: list[Predicate]) -> DataFrame:
    """Conjunctive multi-field filter (P4): AND of all predicates."""
    for p in predicates:
        df = df.filter(p.to_column())
    return df


def semi_filter(df: DataFrame, keys: DataFrame, on: str, key_col: str | None = None) -> DataFrame:
    """IN-set filter as a LEFT SEMI join (P5/J5).

    The reference captures a Python ``set`` of filtered Socios keys and
    probes it per row (``sync_ALL.py:341-345,152-154``). Spark-first: a
    broadcast left-semi join — the build side is small (it came from a
    filtered dim), so no shuffle of the big side.
    """
    build = keys.select(F.col(key_col or on).alias(on)).distinct()
    return df.join(F.broadcast(build), on=on, how="left_semi")


def date_component_filter(
    df: DataFrame, col: str, year: int, month: int | None = None
) -> DataFrame:
    """P6/P7: YEAR(c)=y [AND MONTH(c)=m] — partition-prunable if the table
    is date-partitioned."""
    cond = F.year(F.col(col)) == year
    if month is not None:
        cond = cond & (F.month(F.col(col)) == month)
    return df.filter(cond)

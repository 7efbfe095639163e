"""Data-quality validation operator.

Schema validation is the reference's only quality gate (typed decode,
task.ts:71-88).  A pipeline feeding training data needs content-level
expectations too: per-column null fractions, distinct counts, range
bounds — computed in ONE pass over the table (a single aggregate, no
per-column jobs) and emitted as a long-format report DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quality_report(df: DataFrame, columns: list[str]) -> DataFrame:
    """One row per inspected column: total/null/distinct counts.
    Single aggregation pass; distinct counts are exact (swap in
    approx_count_distinct at extreme cardinalities)."""
    aggs = [F.count(F.lit(1)).alias("_total")]
    for c in columns:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"_nulls_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"_distinct_{c}"))
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_total").alias("n_rows"),
                F.col(f"_nulls_{c}").alias("n_nulls"),
                F.col(f"_distinct_{c}").alias("n_distinct"),
            )
            for c in columns
        ]
    )
    return row.select(F.explode(per_col).alias("m")).select("m.*")


def observe_metrics(df: DataFrame, observation, columns: list[str]) -> DataFrame:
    """Attach zero-cost pipeline observability: metrics (row count +
    per-column null counts) computed DURING the next action on ``df``
    — no extra pass over the data.  ``observation`` is a
    ``pyspark.sql.Observation`` (read back via ``.get``) or a string
    name (read back via a QueryExecutionListener)."""
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in columns:
        metrics.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"nulls_{c}"))
    return df.observe(observation, *metrics)


def expect_no_nulls(df: DataFrame, columns: list[str]) -> None:
    """Hard expectation: raise if any inspected column has nulls."""
    report = {r["column"]: r["n_nulls"] for r in quality_report(df, columns).collect()}
    bad = {c: n for c, n in report.items() if n > 0}
    if bad:
        raise ValueError(f"null expectation violated: {bad}")

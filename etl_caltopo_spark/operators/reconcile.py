"""Order/line reconciliation — the keyed two-table audit an ETL engine
runs after any ingest (does the header total agree with the lines?).

Two implementations with identical output contracts:

- :func:`reconcile_totals` — pure builtins (aggregate + left join),
  the production path: partial aggregation shrinks lineitem before the
  join, everything stays in codegen.
- :func:`reconcile_totals_cogroup` — the same computation through
  ``groupBy().cogroup().applyInPandas``, the API surface for keyed
  two-sided logic that genuinely can't be expressed relationally
  (per-key sequence alignment, custom matching).  Here it IS
  expressible, which is exactly why it makes a good cross-check: the
  test asserts both paths agree row-for-row.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUT_SCHEMA = (
    "o_orderkey long, o_totalprice double, li_total double, "
    "n_lines long, diff double"
)


def reconcile_totals(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Builtin path: per-order lineitem totals vs the header total.
    Orders with no lines surface with li_total NULL (never silently
    dropped — audit semantics)."""
    li = lineitem.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.round(F.sum("l_extendedprice"), 2).alias("li_total"),
        F.count("*").alias("n_lines"),
    )
    return orders.select("o_orderkey", "o_totalprice").join(
        li, "o_orderkey", "left"
    ).select(
        "o_orderkey",
        "o_totalprice",
        "li_total",
        F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
        (F.col("o_totalprice") - F.col("li_total")).alias("diff"),
    )


def reconcile_totals_cogroup(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """cogroup/applyInPandas path: both sides shuffle on the key, each
    key's slices arrive as two pandas frames in one Python call."""

    def fn(odf: pd.DataFrame, ldf: pd.DataFrame) -> pd.DataFrame:
        if len(odf) == 0:
            return pd.DataFrame(columns=["o_orderkey", "o_totalprice", "li_total", "n_lines", "diff"])
        key = odf["o_orderkey"].iloc[0]
        total = odf["o_totalprice"].iloc[0]
        if len(ldf):
            li_total = float(round(ldf["l_extendedprice"].sum(), 2))
            n = len(ldf)
            diff = total - li_total
        else:
            li_total, n, diff = None, 0, None
        return pd.DataFrame(
            [
                {
                    "o_orderkey": key,
                    "o_totalprice": total,
                    "li_total": li_total,
                    "n_lines": n,
                    "diff": diff,
                }
            ]
        )

    return (
        orders.select("o_orderkey", "o_totalprice")
        .groupBy("o_orderkey")
        .cogroup(lineitem.groupBy(F.col("l_orderkey").alias("o_orderkey")))
        .applyInPandas(fn, schema=OUT_SCHEMA)
    )

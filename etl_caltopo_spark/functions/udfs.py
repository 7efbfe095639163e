"""User-defined function surfaces (SURVEY §2.3 "UDF/UDAF/UDTF").

Policy: builtins first — these exist to prove the extension surface,
each in its Arrow-batched form (never row-at-a-time Python):

- ``geomean``          — UDAF: pandas GROUPED_AGG over Arrow batches.
- ``rank_group_pandas``— grouped-map applyInPandas (per-group pandas
                         logic with a declared output schema).
- ``WordSplitUDTF``    — Python UDTF (table function) for Spark 4's
                         lateral-join surface; registered on demand.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


@F.pandas_udf(DoubleType())
def geomean(v: pd.Series) -> float:
    """Geometric mean — a UDAF the builtin aggregates don't provide
    directly (equivalent SQL: exp(avg(ln(x))))."""
    arr = v.to_numpy(dtype=np.float64)
    arr = arr[arr > 0]
    if arr.size == 0:
        return float("nan")
    return float(np.exp(np.log(arr).mean()))


def rank_group_pandas(
    df: DataFrame,
    group_col: str,
    order_col: str,
    tiebreak_col: str,
    out_schema: str,
) -> DataFrame:
    """Per-group ranking via applyInPandas (grouped-map): each group
    arrives as one pandas DataFrame; output schema is declared.  The
    integer-exact equivalent of row_number() — used to validate the
    grouped-map surface against a window-function oracle.

    SQL-total-order over the Arrow boundary (extremes r11 wave 2):
    pandas sorts NaN LAST regardless of direction, and Arrow hands it
    both SQL NULLs and true NaNs as the same NaN — while SQL's DESC
    order puts a true NaN FIRST (NaN is the engines' largest double)
    and NULLs last.  A Spark-side ``_ord_class`` column (2 = NaN,
    1 = value, 0 = NULL) restores the distinction; within the NaN
    class all keys tie (SQL: NaN = NaN) so the tiebreak decides, and
    within the NULL class likewise."""
    is_double = dict(df.dtypes).get(order_col) in ("double", "float")
    if is_double:
        oc = F.col(order_col)
        df = df.withColumn(
            "_ord_class",
            F.when(F.isnan(oc), F.lit(2))
            .when(oc.isNotNull(), F.lit(1))
            .otherwise(F.lit(0)),
        ).withColumn(
            # NaN-free sort key: classes 2 (all-NaN, SQL: NaN = NaN tie)
            # and 0 (NULL) collapse to a constant so the tiebreak
            # decides; pandas then never sees a NaN in any sort key
            "_ord_key",
            F.when(F.col("_ord_class") == 1, oc).otherwise(F.lit(0.0)),
        )

    def rank(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = (
            ["_ord_class", "_ord_key", tiebreak_col]
            if is_double
            else [order_col, tiebreak_col]
        )
        asc = [False, False, True] if is_double else [False, True]
        pdf = pdf.sort_values(keys, ascending=asc, kind="mergesort")
        if is_double:
            pdf = pdf.drop(columns=["_ord_class", "_ord_key"])
        pdf = pdf.reset_index(drop=True)
        pdf["rn"] = pdf.index + 1
        return pdf

    return df.groupBy(group_col).applyInPandas(rank, schema=out_schema)


def make_word_split_udtf():
    """Python UDTF: one output row per whitespace word.  Built lazily
    so environments without UDTF support fail at call time, not
    import time."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, pos: int")
    class WordSplitUDTF:
        def eval(self, text: str):  # noqa: D401
            if text is None:
                return
            for pos, word in enumerate(text.split()):
                yield word, pos

    return WordSplitUDTF

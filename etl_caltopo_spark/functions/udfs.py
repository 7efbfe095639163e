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

    # Bucketed grouped-map (optimization r14, guide §4.1/§4.5): one
    # applyInPandas call PER GROUP is ruinous when groups are tiny —
    # the o_custkey surface has ~100k groups of ~1.5 rows, i.e. ~100k
    # pandas DataFrame constructions and Arrow batches per run
    # (measured 25.4 s at sf0.1).  Group by a HASH BUCKET of the key
    # instead and rank every key inside the bucket vectorized
    # (stable sort + groupby().cumcount()), which cuts the Python
    # call count by ~the bucket fan-in while keeping the grouped-map
    # surface and bit-identical ranks: mergesort is stable, so within
    # each key the row order equals the key-local sort the per-group
    # form produced.  Bucket count scales with the session's shuffle
    # width (x32 so the per-call pandas frame stays ~1/32 of a task's
    # rows at any scale — guide §2.5's 20-100x rule keeps the hash
    # spread even).
    spark = df.sparkSession
    try:
        width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:  # pragma: no cover - non-numeric conf value
        width = spark.sparkContext.defaultParallelism
    n_buckets = max(256, width * 32)
    df = df.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col(group_col)), F.lit(n_buckets))
    )

    def rank(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = (
            ["_ord_class", "_ord_key", tiebreak_col]
            if is_double
            else [order_col, tiebreak_col]
        )
        asc = [False, False, True] if is_double else [False, True]
        pdf = pdf.sort_values(keys, ascending=asc, kind="mergesort")
        pdf["rn"] = (
            pdf.groupby(group_col, sort=False, dropna=False).cumcount() + 1
        )
        drop = ["_bucket"] + (["_ord_class", "_ord_key"] if is_double else [])
        return pdf.drop(columns=drop)

    return df.groupBy("_bucket").applyInPandas(rank, schema=out_schema)


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

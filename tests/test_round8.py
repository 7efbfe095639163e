"""Round-8 regression pins.

1. q_array_slice half-boundary rounding policy (VERDICT r7 #3): the
   query and its oracle migrated from bare ``round()`` to ``fround``
   (floor-scaling) as one paired edit — bare round's hash-parity
   depended on the seed=42 data containing no 4-dp half-boundary
   double.  The test here feeds the REAL query + REAL oracle a
   crafted embeddings table whose values sit exactly ON half
   boundaries (dyadic rationals — exactly representable in float32,
   so the boundary survives the parquet round-trip) and asserts
   hash parity.  Under bare round() both engines happen to agree on
   exact halves, but near-halves from shortest-repr rounding do not
   (functions/numeric.py docstring) — fround removes the entire
   class.
2. rank-operator degenerate bucket counts (VERDICT r7 #6):
   buckets=1 (no cuts at all — one bucket, offsets window over one
   row) and buckets > n_rows (more cuts than rows — many empty
   buckets) must both reproduce the single-partition window exactly.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)
from check_oracle import row_hash  # noqa: E402

from etl_caltopo_spark.queries import REGISTRY  # noqa: E402

EMB_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)

# dyadic rationals with a 5th decimal digit of 5 — exact float32
# values sitting exactly ON the 4-dp rounding half boundary, plus
# negatives (floor-scaling truncates toward -inf; sign must agree
# between engines) and a >1 magnitude
HALF_BOUNDARY = [0.03125, 0.09375, 0.65625, -0.03125, -0.65625, 5.90625]


def test_array_slice_half_boundary_parity(spark, tmp_path):
    d = str(tmp_path)
    rows = [
        Row(vec_id=i, embedding=[v, -v, v + 1.0, 0.0], label=0)
        for i, v in enumerate(HALF_BOUNDARY)
    ]
    spark.createDataFrame(rows, EMB_SCHEMA).coalesce(1).write.parquet(
        f"{d}/_emb"
    )
    part = next(f for f in os.listdir(f"{d}/_emb") if f.endswith(".parquet"))
    os.replace(f"{d}/_emb/{part}", f"{d}/embeddings.parquet")

    spec = REGISTRY["q_array_slice"]
    sdf = spec.fn(spark, d)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{d}/embeddings.parquet')"
    )
    res = con.execute(spec.oracle)
    d_cols = [x[0] for x in res.description]
    d_rows = res.fetchall()
    assert sorted(s_cols) == sorted(d_cols)
    assert len(s_rows) == len(d_rows) == len(HALF_BOUNDARY)
    assert row_hash(s_cols, s_rows) == row_hash(d_cols, d_rows)

    # and the policy itself: floor-scaling TRUNCATES (0.65625 -> 0.6562,
    # -0.65625 -> -0.6563), it does not round half-up
    by_id = {r[0]: r for r in s_rows}
    e0 = {i: by_id[i][s_cols.index("e0")] for i in by_id}
    assert e0[2] == pytest.approx(0.6562, abs=1e-12)
    assert e0[4] == pytest.approx(-0.6563, abs=1e-12)


@pytest.mark.parametrize("buckets", [1, 64])
def test_global_row_number_degenerate_bucket_counts(spark, buckets):
    """buckets=1: zero cut points, everything in bucket 0 (the plan
    degrades to the single-partition window it replaces — still
    exact).  buckets=64 over 10 rows: more cuts than rows, most
    buckets empty, offsets must still compose."""
    from etl_caltopo_spark.operators.rank import global_row_number

    df = spark.createDataFrame(
        [(i % 3, i) for i in range(10)], "v int, tb int"
    )
    got = global_row_number(
        df,
        "v",
        [F.col("v").asc(), F.col("tb").asc()],
        buckets=buckets,
        rn_col="rn",
        total_col="n",
    )
    rows = {(r["v"], r["tb"]): (r["rn"], r["n"]) for r in got.collect()}
    w = Window.orderBy(F.col("v").asc(), F.col("tb").asc())
    want = {
        (r["v"], r["tb"]): (r["rn"], 10)
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert rows == want


@pytest.mark.parametrize("buckets", [1, 64])
def test_global_running_sums_degenerate_bucket_counts(spark, buckets):
    from etl_caltopo_spark.operators.rank import global_running_sums

    data = [(i % 3, i, (i * 7) % 11) for i in range(10)]
    df = spark.createDataFrame(data, "v int, tb int, x long")
    got = global_running_sums(
        df,
        "v",
        [F.col("v").asc(), F.col("tb").asc()],
        {"cum_x": "x"},
        buckets=buckets,
    )
    rows = {(r["v"], r["tb"]): r["cum_x"] for r in got.collect()}
    w = (
        Window.orderBy(F.col("v").asc(), F.col("tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        (r["v"], r["tb"]): r["cum_x"]
        for r in df.withColumn("cum_x", F.sum("x").over(w)).collect()
    }
    assert rows == want

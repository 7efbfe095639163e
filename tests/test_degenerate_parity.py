"""Degenerate-input cross-engine parity (advisor r6).

The guards around zero denominators (constant columns, zero-norm
vectors, single-class slices) were asserted in comments but never
exercised on degenerate DATA through BOTH engines.  Probe result
pinned here: THIS Spark build (4.1.2, ANSI on) raises DIVIDE_BY_ZERO
for runtime DOUBLE division too — not only integral/decimal — while
DuckDB's double x/0 yields NULL and its sqrt(negative) hard-errors.
So every guard must keep the oracle side healthy as well: these tests
build a tiny scale dir whose tables hit the degenerate branches and
run the full Spark-vs-DuckDB hash compare on it.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb
import pytest
from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)
from check_oracle import row_hash  # noqa: E402

from etl_caltopo_spark.io import TABLES, load_table  # noqa: E402
from etl_caltopo_spark.queries import REGISTRY  # noqa: E402

SRC_SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def degenerate_sf(spark, tmp_path_factory):
    """sf0.001 with three degenerate overwrites: constant lineitem
    discount AND quantity (spearman/kendall den = 0), constant event
    values + a single event class (zscore var = 0, auc single-class,
    calibration constant scores), and one all-zero embedding."""
    d = str(tmp_path_factory.mktemp("degsf"))
    for t in TABLES:
        shutil.copy(f"{SRC_SF}/{t}.parquet", f"{d}/{t}.parquet")

    li = (
        spark.read.parquet(f"{SRC_SF}/lineitem.parquet")
        .withColumn("l_discount", F.lit(0.05))
        .withColumn("l_quantity", F.lit(7.0))
    )
    li.coalesce(1).write.mode("overwrite").parquet(f"{d}/_li")
    ev = (
        load_table(spark, SRC_SF, "events")
        .withColumn("value", F.lit(2.5))
        .withColumn("event_type", F.lit("view"))
    )
    ev.coalesce(1).write.mode("overwrite").parquet(f"{d}/_ev")
    emb = spark.read.parquet(f"{SRC_SF}/embeddings.parquet")
    zero = F.transform(F.col("embedding"), lambda x: x * F.lit(0.0))
    emb = emb.withColumn(
        "embedding", F.when(F.col("vec_id") == 0, zero).otherwise(F.col("embedding"))
    )
    emb.coalesce(1).write.mode("overwrite").parquet(f"{d}/_emb")
    for sub, t in (("_li", "lineitem"), ("_ev", "events"), ("_emb", "embeddings")):
        part = next(
            f for f in os.listdir(f"{d}/{sub}") if f.endswith(".parquet")
        )
        os.replace(f"{d}/{sub}/{part}", f"{d}/{t}.parquet")
        shutil.rmtree(f"{d}/{sub}")
    return d


DEGENERATE_IDS = [
    "q_spearman",          # constant x and y -> den = 0 -> rho NULL
    "q_kendall_tau",       # all-ties -> den = 0 -> tau NULL
    "q_anomaly_zscore",    # constant groups -> var = 0 -> no rows
    "q_auc",               # single-class slice -> auc NULL
    "q_pr_auc",            # zero positives -> p = 0 -> pr_auc NULL
                           # (r8: unguarded /p ANSI-crashed here)
    "q_lift_deciles",      # zero positives -> lift/cum_gain NULL
    "q_calibration_bins",  # constant scores -> hi == lo -> bin 0
    "q_embed_quantize",    # zero-norm vector -> q8 NULL row survives
    "q_agg_corr",          # constant quantity -> var = 0 -> corr NULL
                           # (r8: F.corr ANSI-crashed here; manual
                           # guarded pop-variant pearson now)
    "q_corr_matrix",       # same class, all six coefficients
    "q_semdedup",          # zero-norm vector -> NULL cosine -> joins
                           # nothing, survives (r10: pins the policy
                           # through the per-cell GEMM rewrite)
]


@pytest.mark.parametrize("qid", DEGENERATE_IDS)
def test_degenerate_data_parity(spark, degenerate_sf, qid):
    spec = REGISTRY[qid]
    sdf = spec.fn(spark, degenerate_sf)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{degenerate_sf}/{t}.parquet')"
        )
    res = con.execute(spec.oracle)
    d_cols = [x[0] for x in res.description]
    d_rows = res.fetchall()
    assert sorted(s_cols) == sorted(d_cols)
    assert len(s_rows) == len(d_rows)
    assert row_hash(s_cols, s_rows) == row_hash(d_cols, d_rows)


def test_zero_norm_row_is_null_not_dropped(spark, degenerate_sf):
    """The zero-norm embedding keeps its row with NULL q8 (guard
    semantics: NULL, not a crash, not a silent drop)."""
    out = REGISTRY["q_embed_quantize"].fn(spark, degenerate_sf)
    row = out.filter(F.col("vec_id") == 0).collect()
    assert len(row) == 1 and row[0]["q8"] is None

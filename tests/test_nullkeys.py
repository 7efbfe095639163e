"""NULL-KEY parity pins (round 12, eighth perturbation mode).

The ``nullkeys`` sweep (tools/degenerate_sweep.py) injects 2% NULLs
into KEY/DIMENSION columns — group-by keys, window partition keys,
join keys, filter predicates — which the r8 ``nulls`` mode (value
columns) never reached.  Its first run caught SEVEN latent
divergences; the engine rules they pinned:

1. A window-implemented equi-semantics operator (the as-of joins)
   must SPECIAL-CASE NULL keys: SQL equality never matches
   NULL = NULL, but Window.partitionBy groups all NULL keys into one
   partition where a NULL-key right row becomes the running match
   candidate.
2. A bare ``(col == lit).cast("int")`` label is NULL on a NULL key
   where the oracle's ``CASE ... ELSE 0`` is 0 — labels need
   when/otherwise.
3. DataFrame ``.distinct().count()`` counts a NULL key;
   SQL ``count(DISTINCT col)`` ignores it.
4. A join-back after a groupBy re-DROPS the NULL group the aggregate
   kept — use eqNullSafe when the oracle is a plain GROUP BY.
5. A rank dim ordered ASC by a nullable key shifts every real rank
   under Spark's NULLS FIRST (DuckDB: NULLS LAST) — exclude the
   un-joinable NULL key from the dim on both sides.
6. applyInPandasWithState output schemas must declare grouping-key
   fields NULLABLE: a NULL key round-trips as None and a
   non-nullable Arrow vector crashes on read.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_join_null_partition_key_never_matches(spark):
    from etl_caltopo_spark.operators.joins import asof_join, asof_join_nearest

    left = spark.createDataFrame(
        [
            (None, _ts("2024-01-01 10:00:00"), 1),
            (7, _ts("2024-01-01 10:00:00"), 2),
        ],
        "user_id long, ts timestamp, view_id long",
    )
    right = spark.createDataFrame(
        [
            (None, _ts("2024-01-01 09:00:00"), 100.0),  # must match NOTHING
            (7, _ts("2024-01-01 09:30:00"), 7.5),
        ],
        "user_id long, ts timestamp, price double",
    )
    for op, pfx in ((asof_join, "asof_"), (asof_join_nearest, "nearest_")):
        out = {
            r["view_id"]: r
            for r in op(left, right, ["user_id"], "ts", "ts", ["price"]).collect()
        }
        assert out[1][f"{pfx}price"] is None, op.__name__  # NULL-key left row
        assert out[2][f"{pfx}price"] == 7.5, op.__name__   # real match intact


def test_label_is_zero_not_null_on_null_key(spark):
    """Pin rule 2 via the real q_auc at a crafted table: a NULL
    event_type row must count as a NEGATIVE, not vanish from n_neg."""
    import os

    from etl_caltopo_spark.queries import REGISTRY

    rows = [
        (1, "2024-01-01 00:00:01", 1, "click", 0.9, "{}"),
        (2, "2024-01-01 00:00:02", 2, "view", 0.8, "{}"),
        (3, "2024-01-01 00:00:03", 3, None, 0.7, "{}"),  # NULL key
        (4, "2024-01-01 00:00:04", 4, "click", 0.2, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "event_type",
        "value", "props",
    )
    import tempfile

    d = tempfile.mkdtemp(prefix="nullkey_auc_")
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/_ev")
    part = next(f for f in os.listdir(f"{d}/_ev") if f.endswith(".parquet"))
    os.replace(f"{d}/_ev/{part}", f"{d}/events.parquet")
    out = REGISTRY["q_auc"].fn(spark, d).first()
    assert out["n_pos"] == 2 and out["n_neg"] == 2  # NULL row is a negative


def test_distinct_count_excludes_null_like_sql(spark):
    """Pin rule 3: the q_seq_support denominator ignores NULL users."""
    ev = spark.createDataFrame(
        [(1,), (2,), (None,), (2,)], "user_id long"
    )
    n = (
        ev.where(F.col("user_id").isNotNull())
        .select("user_id")
        .distinct()
        .count()
    )
    import duckdb

    want = duckdb.sql(
        "SELECT count(DISTINCT user_id) FROM (VALUES (1), (2), (NULL), (2))"
        " t(user_id)"
    ).fetchone()[0]
    assert n == want == 2


def test_event_type_rank_dim_excludes_null(spark):
    from etl_caltopo_spark.queries.stream_windows import event_type_rank_dim

    ev = spark.createDataFrame(
        [("view",), (None,), ("click",)], "event_type string"
    )
    rows = {r["event_type"]: r["type_rank"] for r in event_type_rank_dim(ev).collect()}
    # NULL absent; real ranks unshifted (click=1, view=2)
    assert rows == {"click": 1, "view": 2}


def test_stateful_output_schemas_declare_nullable_keys():
    from etl_caltopo_spark.streaming.stateful import (
        RUNNING_TOTALS_OUTPUT,
        SESSION_OUTPUT,
    )

    assert RUNNING_TOTALS_OUTPUT["user_id"].nullable is True
    assert SESSION_OUTPUT["user_id"].nullable is True


def test_percentile_approx_keeps_null_flag_group(spark, tmp_path):
    """Pin rule 4: the certificate join-back is NULL-SAFE, so the
    NULL l_returnflag group the aggregate kept reaches the output."""
    import os

    from etl_caltopo_spark.queries import REGISTRY

    # groups need enough rows for the p99 rank certificate's 0.005
    # slack to be meaningful (a 2-row group's p99 rank is 1.0 ± 0)
    rows = [
        (flag, float(1000 * g + i))
        for g, flag in enumerate(["A", None, "B"])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "l_returnflag string, l_extendedprice double")
    d = str(tmp_path)
    df.coalesce(1).write.parquet(f"{d}/_li")
    part = next(f for f in os.listdir(f"{d}/_li") if f.endswith(".parquet"))
    os.replace(f"{d}/_li/{part}", f"{d}/lineitem.parquet")
    out = REGISTRY["q_percentile_approx"].fn(spark, d).collect()
    flags = {r["l_returnflag"] for r in out}
    assert flags == {"A", "B", None}
    assert all(r["median_rank_ok"] for r in out)

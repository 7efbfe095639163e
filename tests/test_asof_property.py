"""Property-based checks for the as-of join (hypothesis): against a
brute-force per-row reference over arbitrary event sets."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_caltopo_spark.operators.joins import asof_join

BASE = datetime(2024, 1, 1)

# (user_id, minute-offset) pairs; small key space to force collisions
left_events = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 100)), min_size=1, max_size=8
)
right_events = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 100)), min_size=0, max_size=8
)


@settings(max_examples=15, deadline=None)
@given(left_events, right_events)
def test_asof_matches_bruteforce(spark, lefts, rights):
    left = spark.createDataFrame(
        [(i, u, BASE + timedelta(minutes=m)) for i, (u, m) in enumerate(lefts)],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(u, BASE + timedelta(minutes=m)) for u, m in rights],
        "user_id long, ts timestamp",
    ) if rights else spark.createDataFrame([], "user_id long, ts timestamp")

    out = asof_join(left, right, ["user_id"], "ts", "ts", [], prefix="last_")
    got = {r["event_id"]: r["last_ts"] for r in out.collect()}

    # brute force: latest right ts <= left ts for the same user
    for i, (u, m) in enumerate(lefts):
        lt = BASE + timedelta(minutes=m)
        cands = [BASE + timedelta(minutes=rm) for ru, rm in rights
                 if ru == u and BASE + timedelta(minutes=rm) <= lt]
        expected = max(cands) if cands else None
        assert got[i] == expected, f"event {i}: {got[i]} != {expected}"
    assert len(got) == len(lefts)  # left join keeps every left row

@settings(max_examples=15, deadline=None)
@given(left_events, right_events)
def test_asof_nearest_matches_bruteforce(spark, lefts, rights):
    """Nearest-either-direction as-of (r10): per left row the right ts
    minimizing |delta|, ties to the earlier (backward) one."""
    from etl_caltopo_spark.operators.joins import asof_join_nearest

    left = spark.createDataFrame(
        [(i, u, BASE + timedelta(minutes=m)) for i, (u, m) in enumerate(lefts)],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(u, BASE + timedelta(minutes=m)) for u, m in rights],
        "user_id long, ts timestamp",
    ) if rights else spark.createDataFrame([], "user_id long, ts timestamp")

    out = asof_join_nearest(
        left, right, ["user_id"], "ts", "ts", [], prefix="near_"
    )
    got = {r["event_id"]: r["near_ts"] for r in out.collect()}

    for i, (u, m) in enumerate(lefts):
        lt = BASE + timedelta(minutes=m)
        cands = [BASE + timedelta(minutes=rm) for ru, rm in rights if ru == u]
        if not cands:
            assert got[i] is None, (i, got[i])
            continue
        # min |delta|; tie -> earlier (backward) candidate
        best = min(cands, key=lambda c: (abs(c - lt), c))
        assert got[i] == best, (i, got[i], best, lt, sorted(cands))

def test_asof_nearest_null_left_ts_matches_nothing(spark):
    """A NULL left timestamp satisfies neither ASOF inequality (both
    comparisons are NULL) — the engine must emit NULL, not hand the
    row a 'forward' candidate via the NULLS-FIRST union sort."""
    from etl_caltopo_spark.operators.joins import asof_join_nearest

    left = spark.createDataFrame(
        [(1, 7, None), (2, 7, BASE + timedelta(minutes=10))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(7, BASE + timedelta(minutes=5))], "user_id long, ts timestamp"
    )
    got = {
        r["event_id"]: r["near_ts"]
        for r in asof_join_nearest(
            left, right, ["user_id"], "ts", "ts", [], prefix="near_"
        ).collect()
    }
    assert got[1] is None
    assert got[2] == BASE + timedelta(minutes=5)

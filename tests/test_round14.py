"""Round-14 ADVICE pins (the four r13 advisor findings).

1. sink.post_idempotent's 4xx fast-fail is TYPE-narrowed to
   urllib.error.HTTPError — a custom poster's library exception that
   happens to carry an int ``.code`` in [400,500) stays retryable.
2. dedup.clusters_within_blocks picks each id's representative
   DETERMINISTICALLY (min over a total (block, vector) order), so a
   contract violation (duplicate ids with differing payloads)
   surfaces as a stable diff, not run-to-run flicker.
3. q_stream_dedup's declared oracle boundary is PINNED: one key with
   two different payloads makes the operator emit 1 row where the
   DISTINCT oracle emits k — the documented key-determinism contract
   edge, witnessed rather than assumed.
4. The sweep builders' first-row pick orders by ORDERABLE columns
   only and fans out through a collision-proof ``__clone_k`` — a map
   column or a pre-existing ``_k`` column cannot break the builder.
"""

from __future__ import annotations

import os
import sys
import urllib.error

import duckdb
import pytest

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

from etl_caltopo_spark.caltopo.sink import post_idempotent  # noqa: E402
from etl_caltopo_spark.queries import REGISTRY  # noqa: E402


class _LibraryError(Exception):
    """A non-HTTP library exception that HAPPENS to carry .code."""

    def __init__(self, code: int):
        super().__init__(f"lib error {code}")
        self.code = code


def test_non_http_exception_with_code_stays_retryable():
    """ADVICE r13 #1: an int .code in [400,500) on a NON-HTTPError
    must not be misread as a deterministic client error."""
    calls = {"n": 0}

    def poster(url, body, headers):
        calls["n"] += 1
        if calls["n"] <= 2:
            raise _LibraryError(404)  # would fast-fail if duck-typed

    key = post_idempotent(poster, "http://x", "{}", max_retries=4,
                          backoff_s=0.0001)
    assert calls["n"] == 3 and key


def test_http_4xx_still_fails_fast():
    calls = {"n": 0}

    def poster(url, body, headers):
        calls["n"] += 1
        raise urllib.error.HTTPError("http://x", 404, "err", None, None)

    with pytest.raises(urllib.error.HTTPError):
        post_idempotent(poster, "http://x", "{}", max_retries=4,
                        backoff_s=0.0001)
    assert calls["n"] == 1  # no retries burned


def test_cluster_representative_is_deterministic(spark):
    """ADVICE r13 #2: duplicate ids with DIFFERING vectors (a contract
    violation) must yield the SAME representative every run — the min
    over the (block, vector) order — instead of dropDuplicates'
    arbitrary survivor."""
    from etl_caltopo_spark.llm.dedup import clusters_within_blocks

    # id 5 violates the payload-is-a-function-of-id contract: one copy
    # is near id 7's vector (would cluster), the min-order copy is
    # orthogonal (clusters alone).  The deterministic pick must choose
    # the min vector [0.0, 1.0] < [1.0, 0.0] and therefore NOT merge.
    rows = [
        (5, 1, [1.0, 0.0]),
        (5, 1, [0.0, 1.0]),
        (7, 1, [1.0, 0.0]),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, blk long, embedding array<double>"
    )
    outs = []
    for _ in range(3):
        out = {
            r["vec_id"]: r["cluster_id"]
            for r in clusters_within_blocks(
                emb, "blk", threshold=0.9
            ).collect()
        }
        outs.append(out)
    assert outs[0] == outs[1] == outs[2]
    assert outs[0] == {5: 5, 7: 7}  # min vector is orthogonal to 7's


def test_stream_dedup_divergence_boundary(spark, tmp_path):
    """ADVICE r13 #3: the DECLARED oracle boundary, witnessed — one
    event_id delivered with two DIFFERENT payloads makes the operator
    (key-based dedup) emit exactly one row for that key while the
    DISTINCT oracle emits both.  On key-deterministic feeds (every
    replica) the two agree; this pins where and how they stop."""
    from datetime import datetime

    rows = [
        (1, 10, "click", datetime(2024, 1, 1, 0, 0, 0)),
        (1, 99, "view", datetime(2024, 1, 1, 0, 0, 0)),  # same key!
        (2, 11, "click", datetime(2024, 1, 1, 1, 0, 0)),
        (3, 12, "view", datetime(2024, 1, 1, 2, 0, 0)),
        (4, 13, "click", datetime(2024, 1, 1, 3, 0, 0)),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, ts timestamp_ntz",
    )
    d = str(tmp_path)
    ev.coalesce(1).write.parquet(f"{d}/_t")
    part = next(f for f in os.listdir(f"{d}/_t") if f.endswith(".parquet"))
    os.replace(f"{d}/_t/{part}", f"{d}/events.parquet")

    spec = REGISTRY["q_stream_dedup"]
    s_rows = spec.fn(spark, d).collect()
    key1 = [r for r in s_rows if r["event_id"] == 1]
    assert len(key1) == 1  # the operator is KEY-based: one survivor
    assert len(s_rows) == 4

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{d}/events.parquet')"
    )
    d_rows = con.execute(spec.oracle).fetchall()
    assert len(d_rows) == 5  # DISTINCT keeps both payload variants
    # outside this crafted violation the two agree — the other keys
    # match 1:1
    s_other = sorted(
        (r["event_id"], r["user_id"]) for r in s_rows if r["event_id"] != 1
    )
    d_other = sorted((r[0], r[1]) for r in d_rows if r[0] != 1)
    assert s_other == d_other


def test_sweep_builders_survive_map_and_underscore_k(spark, tmp_path):
    """ADVICE r13 #4: a map column (unorderable) and a pre-existing
    `_k` column must not break the deterministic first-row pick or the
    clone fan-out."""
    import degenerate_sweep as ds

    df = spark.createDataFrame(
        [(2, {"a": 1}, 20), (1, {"b": 2}, 10)],
        "id long, props map<string,int>, _k long",
    )
    key = ds._order_cols(df)
    assert key == ["id", "_k"]  # map excluded, _k still usable
    one = df.orderBy(*key).limit(1).collect()
    assert one[0]["id"] == 1
    first = df.orderBy(*key).limit(1)
    clones = (
        first.crossJoin(spark.range(2).selectExpr("1 as __clone_k"))
        .drop("__clone_k")
        .select(*df.columns)
    )
    assert clones.count() == 2
    assert all(r["id"] == 1 for r in clones.collect())

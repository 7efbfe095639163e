"""JSON-sweep parity pins (round 12, seventh perturbation mode).

The ``json`` sweep mode injects ADVERSARIAL_PROPS into ~10% of
events.props by hash-cycling — which covers the list statistically.
This test is the DETERMINISTIC twin: a crafted events table carrying
every payload exactly once runs through the three real props-consuming
queries AND their real oracles, asserting hash parity row for row.

Engine contract pinned here (probed r11/r12):

- DuckDB json_extract RAISES InvalidInputException on malformed JSON;
  Spark's from_json / get_json_object / try_parse_json yield NULL —
  every oracle guards with json_valid().
- DuckDB's JSON->BIGINT cast COERCES ('1.5'->2, '"12"'->12, true->1);
  Spark's from_json('k INT') nulls non-integral tokens — the mirrors
  dispatch on json_type().
- get_json_object(...).cast('long') ANSI-crashed on '1.5' /
  'true' / uint64-max digits — fixed to try_cast (whose string
  grammar is optional sign + digits, trimmed; the oracle mirrors it
  with a regexp before TRY_CAST).
- try_variant_get(.., 'bigint') TRUNCATES doubles toward zero
  (1.5->1, -1.5->-1) and maps booleans to 1/0.
- Spark's long SUM of extracted values ANSI-overflows on an
  int64-max token where DuckDB widens to HUGEINT — q_variant_extract
  sums in DECIMAL(38,0) on both sides.

Documented irreconcilables (NOT injected, see
tools/degenerate_sweep.ADVERSARIAL_PROPS): duplicate keys
(Jackson last-wins vs yyjson first-wins — undefined by spec) and
integer/double tokens whose STRING re-rendering diverges
(>uint64 BigInteger digits; '1.0E19' vs '10000000000000000000.0').
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)
from check_oracle import row_hash  # noqa: E402
from degenerate_sweep import ADVERSARIAL_PROPS  # noqa: E402

from etl_caltopo_spark.queries import REGISTRY  # noqa: E402

JSON_IDS = ["q_from_json", "q_json_extract", "q_variant_extract"]


def _events_dir(spark, tmp_path) -> str:
    d = str(tmp_path)
    rows = []
    # every adversarial payload exactly once...
    for i, p in enumerate(ADVERSARIAL_PROPS):
        rows.append((i, "2024-01-01 00:00:00", i % 7, f"t{i % 3}", 1.5, p))
    # ...plus a few seeded-shape rows so the normal path is co-graded
    base = len(ADVERSARIAL_PROPS)
    for j in range(5):
        rows.append(
            (base + j, "2024-01-01 00:00:00", j, f"t{j % 3}", 2.5,
             f'{{"k": {j * 11}}}')
        )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id",
        "CAST(ts AS TIMESTAMP) AS ts",
        "user_id",
        "event_type",
        "value",
        "props",
    )
    df.coalesce(1).write.parquet(f"{d}/_ev")
    part = next(f for f in os.listdir(f"{d}/_ev") if f.endswith(".parquet"))
    os.replace(f"{d}/_ev/{part}", f"{d}/events.parquet")
    return d


def test_adversarial_props_hash_parity(spark, tmp_path):
    d = _events_dir(spark, tmp_path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{d}/events.parquet')"
    )
    for qid in JSON_IDS:
        spec = REGISTRY[qid]
        sdf = spec.fn(spark, d)
        s_cols = sdf.columns
        s_rows = [tuple(r) for r in sdf.collect()]
        res = con.execute(spec.oracle)
        d_cols = [x[0] for x in res.description]
        d_rows = res.fetchall()
        assert sorted(s_cols) == sorted(d_cols), qid
        assert len(s_rows) == len(d_rows), qid
        assert row_hash(s_cols, s_rows) == row_hash(d_cols, d_rows), qid


def test_json_extract_semantics_pinned(spark, tmp_path):
    """The specific token semantics the mirrors encode, asserted as
    values (not just via parity) so a Spark upgrade that changes the
    cast grammar fails with a readable diff."""
    d = _events_dir(spark, tmp_path)
    spec = REGISTRY["q_json_extract"]
    out = {r["event_id"]: r for r in spec.fn(spark, d).collect()}
    by_payload = {p: out[i] for i, p in enumerate(ADVERSARIAL_PROPS)}

    r = by_payload['{"k": 1.5}']
    assert r["k_str"] == "1.5" and r["k_int"] is None  # no coercion
    r = by_payload['{"k": "12"}']
    assert r["k_str"] == "12" and r["k_int"] == 12
    r = by_payload['{"k": " 12 "}']
    assert r["k_str"] == " 12 " and r["k_int"] == 12  # cast trims
    r = by_payload['{"k": true}']
    assert r["k_str"] == "true" and r["k_int"] is None
    r = by_payload['{"k": 18446744073709551615}']
    assert r["k_str"] == "18446744073709551615" and r["k_int"] is None
    r = by_payload['{"k": 9223372036854775807}']
    assert r["k_int"] == 9223372036854775807
    r = by_payload['{"k": 26']  # malformed: NULL, not a crash
    assert r["k_str"] is None and r["k_int"] is None


def test_variant_truncation_pinned(spark):
    """Variant bigint truncates toward zero; booleans map to 1/0;
    string tokens follow the integer-only cast grammar."""
    from pyspark.sql import functions as F

    payloads = [
        '{"k": 1.5}', '{"k": -1.5}', '{"k": true}', '{"k": false}',
        '{"k": "12"}', '{"k": "1.5"}',
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "i int, props string"
    )
    got = [
        r["k"]
        for r in df.select(
            "i",
            F.try_variant_get(
                F.try_parse_json(F.col("props")), "$.k", "bigint"
            ).alias("k"),
        )
        .orderBy("i")
        .collect()
    ]
    assert got == [1, -1, 1, 0, 12, None]

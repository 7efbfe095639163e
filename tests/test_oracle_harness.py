"""Negative controls for the correctness gate itself: the comparator
in tools/check_oracle.py must CATCH injected defects — a gate that
can't fail is no gate.  (The driver's harness uses the same
row-count + column-name + order-insensitive-value-hash contract.)"""

from __future__ import annotations

from tools.check_oracle import canon, row_hash


def test_row_hash_is_order_insensitive():
    cols = ["a", "b"]
    rows1 = [(1, "x"), (2, "y"), (3, "z")]
    rows2 = [(3, "z"), (1, "x"), (2, "y")]
    assert row_hash(cols, rows1) == row_hash(cols, rows2)


def test_row_hash_sorts_columns_by_name():
    # same values, column order swapped — must hash identically
    assert row_hash(["b", "a"], [("x", 1)]) == row_hash(["a", "b"], [(1, "x")])


def test_row_hash_catches_value_perturbation():
    cols = ["k", "v"]
    base = [(1, 10.0), (2, 20.0)]
    assert row_hash(cols, base) != row_hash(cols, [(1, 10.0), (2, 20.01)])
    assert row_hash(cols, base) != row_hash(cols, [(1, 10.0)])  # dropped row
    assert row_hash(cols, base) != row_hash(cols, base + [(2, 20.0)])  # dup row


def test_row_hash_catches_null_vs_zero_and_sign():
    cols = ["v"]
    assert row_hash(cols, [(None,)]) != row_hash(cols, [(0,)])
    assert row_hash(cols, [(0.0,)]) == row_hash(cols, [(-0.0,)])  # -0 normalized
    assert row_hash(cols, [(1.0,)]) != row_hash(cols, [(-1.0,)])


def test_canon_distinguishes_lookalikes():
    # string "1" vs int 1 vs float 1.0 are different values
    assert canon("1") != canon(1.0)
    assert canon(True) != canon(1) or canon(True) == "true"
    assert canon([1, 2]) != canon([12])
    assert canon(b"\x01\x02") == "0102"


def test_end_to_end_defect_injection(spark):
    """A deliberately wrong Spark result against a correct oracle must
    hash-mismatch: replay q_agg_global's contract with a perturbed
    aggregate and confirm the gate trips."""
    import duckdb

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf}/lineitem.parquet')"
    )
    want_rows = con.execute(
        "SELECT CAST(count(*) AS BIGINT) AS n, "
        "round(sum(l_quantity), 2) AS s FROM lineitem"
    ).fetchall()
    cols = ["n", "s"]
    good = spark.sql(
        f"SELECT CAST(count(*) AS BIGINT) AS n, round(sum(l_quantity), 2) AS s "
        f"FROM parquet.`{sf}/lineitem.parquet`"
    ).collect()
    bad = [(r["n"] + 1, r["s"]) for r in good]
    assert row_hash(cols, [tuple(r) for r in good]) == row_hash(cols, want_rows)
    assert row_hash(cols, bad) != row_hash(cols, want_rows)

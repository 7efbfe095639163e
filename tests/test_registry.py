"""Every declared query runs, returns rows, and has a stable schema.

The driver's oracle-differential check (tools/check_oracle.py locally)
covers value correctness; these tests are the fast structural gate.
"""

from __future__ import annotations

import pytest

from etl_caltopo_spark.queries import REGISTRY

# queries whose empty result at tiny scale is legitimate
# (q22: every synthetic customer has orders, so the no-orders cohort
# is empty — the anti-join semantics, not a bug)
MAY_BE_EMPTY = {"q_join_anti", "q_dedup_jaccard", "q_dedup_near", "q_sql_tpch_q22"}


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_runs(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    rows = df.limit(5).collect()
    if name not in MAY_BE_EMPTY:
        assert rows, f"{name} returned no rows at {sf_dir}"
    # schema is concrete (no unresolved types)
    assert all(f.dataType is not None for f in df.schema.fields)


def test_oracle_coverage():
    """Ids without oracle SQL must carry an explanatory note."""
    for name, spec in REGISTRY.items():
        if spec.oracle is None:
            assert spec.note, f"{name} is rows-only but gives no reason"


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) == len(REGISTRY)

"""Declared query registry (SURVEY.md §2 query ids).

Each query id maps to a ``(spark, sf_dir) -> DataFrame`` callable plus,
when SQL-expressible, a DuckDB oracle SQL string the driver runs
side-by-side (row count + schema + order-insensitive value hash).

Import side effects register all queries; ``REGISTRY`` is the single
source of truth consumed by ``/root/repo/__spark_entry__.py`` and
``bench.py``.
"""

from __future__ import annotations

from etl_caltopo_spark.queries.registry import REGISTRY, QuerySpec, query

# register on import (order: cheap scalar ops → joins/aggs → time windows → llm)
from etl_caltopo_spark.queries import relational  # noqa: F401,E402
from etl_caltopo_spark.queries import joins  # noqa: F401,E402
from etl_caltopo_spark.queries import aggregates  # noqa: F401,E402
from etl_caltopo_spark.queries import windows  # noqa: F401,E402
from etl_caltopo_spark.queries import setops  # noqa: F401,E402
from etl_caltopo_spark.queries import stream_windows  # noqa: F401,E402
from etl_caltopo_spark.queries import llm_pipeline  # noqa: F401,E402
from etl_caltopo_spark.queries import extended  # noqa: F401,E402
from etl_caltopo_spark.queries import extended2  # noqa: F401,E402
from etl_caltopo_spark.queries import etl_ops  # noqa: F401,E402
from etl_caltopo_spark.queries import extended3  # noqa: F401,E402
from etl_caltopo_spark.queries import tpch_more  # noqa: F401,E402
from etl_caltopo_spark.queries import extended4  # noqa: F401,E402
from etl_caltopo_spark.queries import analytics  # noqa: F401,E402
from etl_caltopo_spark.queries import timeseries  # noqa: F401,E402
from etl_caltopo_spark.queries import retail  # noqa: F401,E402
from etl_caltopo_spark.queries import extended5  # noqa: F401,E402
from etl_caltopo_spark.queries import extended6  # noqa: F401,E402
from etl_caltopo_spark.queries import extended7  # noqa: F401,E402
from etl_caltopo_spark.queries import extended8  # noqa: F401,E402
from etl_caltopo_spark.queries import extended9  # noqa: F401,E402
from etl_caltopo_spark.queries import extended10  # noqa: F401,E402
from etl_caltopo_spark.queries import extended11  # noqa: F401,E402
from etl_caltopo_spark.queries import extended12  # noqa: F401,E402
from etl_caltopo_spark.queries import caltopo_e2e  # noqa: F401,E402
from etl_caltopo_spark.queries import llm_e2e  # noqa: F401,E402

# Registry order is plain module-import insertion order — no curation.
# The full-registry correctness record (every id, not any harness
# sample) is regenerated each round via tools/check_oracle.py and
# committed as CORRECTNESS_full_r{N}.json.

__all__ = ["REGISTRY", "QuerySpec", "query"]

"""Query registry plumbing.

A query is registered with its DuckDB oracle SQL right next to the
Spark implementation so the two can be reviewed (and drift-fixed)
together.  Column names must match exactly between the two sides —
the driver sorts columns by name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    #: DuckDB SQL over the pre-registered views (region nation customer
    #: supplier part orders lineitem events documents embeddings).
    #: ``None`` → non-SQL-expressible; the driver records rows-only.
    oracle: str | None = None
    #: include in bench.py's headline set
    headline: bool = False
    #: free-form note (why rows-only, scale caveats)
    note: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    note: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query id: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, headline=headline, note=note, tags=tags)
        return fn

    return deco

"""etl_caltopo_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference ETL
connector ``dfpc-coe/etl-caltopo`` (see /root/reference/task.ts) as an
idiomatic Spark operator library, extended with the relational operator
set and the large-scale LLM-data-pipeline operators the reference's
ecosystem implies (SURVEY.md §2).

Layout:
- ``session``    — SparkSession factory (AQE, UTC, Arrow).
- ``io``         — parquet/CSV/JSON source + sink adapters.
- ``operators``  — relational operators (joins, topk, setops, windows).
- ``functions``  — scalar function families (strings/math/dates/json/arrays/maps).
- ``llm``        — dedup / similarity / text-analysis / multimodal operators.
- ``streaming``  — batch-equivalent time windows + Structured Streaming helpers.
- ``caltopo``    — the CalTopo domain pipeline (envelope decode → transform →
                   folder join → sink), the direct analog of the reference.
- ``queries``    — the declared query registry the driver verifies against a
                   DuckDB oracle (SURVEY.md §2 query ids).
"""

__version__ = "0.1.0"

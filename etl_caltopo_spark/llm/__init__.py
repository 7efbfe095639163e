"""LLM-training-data pipeline operators (driver-mandated extensions).

All hot-path logic is Catalyst builtins over array columns (tokens,
shingles, hashes) — no row-at-a-time Python.  The two places Python is
genuinely needed (simhash bit-voting, multimodal decode) use
Arrow-batched Pandas UDFs / ``mapInPandas``.
"""

from etl_caltopo_spark.llm import dedup, multimodal, similarity, text  # noqa: F401

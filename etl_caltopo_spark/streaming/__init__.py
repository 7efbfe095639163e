"""Time-window operators + Structured Streaming helpers.

The reference's temporal model is scheduled incremental batch: a
`since/-500` delta window re-fetched on a CloudTAK schedule
(/root/reference/task.ts:46,68).  Here that generalizes to:

- batch-equivalent tumbling/sliding/session window aggregations
  (``windows``) — the same function runs over a batch DataFrame (what
  the DuckDB oracle checks) or a streaming one;
- Structured Streaming ingestion with watermarks and stream-dedup
  (``ingest``) — the true-streaming completion ([EXT], SURVEY §2.3).
"""

from etl_caltopo_spark.streaming.joins import interval_join
from etl_caltopo_spark.streaming.windows import session_agg, sliding_agg, tumbling_agg

__all__ = ["tumbling_agg", "sliding_agg", "session_agg", "interval_join"]

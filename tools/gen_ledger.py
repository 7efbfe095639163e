"""Regenerate SURVEY.md §8 (the implementation ledger) from the live
query registry.  Run after adding/removing query ids:

    python tools/gen_ledger.py
"""

from __future__ import annotations

import inspect
import os
import pathlib
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_caltopo_spark.queries import REGISTRY

#: the ids SURVEY §2 declares (everything else is [EXT+] widening)
DECLARED = {
    "q_from_json", "q_filter_class", "q_filter_notnull", "q_filter_compound",
    "q_project_struct", "q_cast_rename", "q_coalesce_default",
    "q_conditional_cast", "q_lit_const", "q_when_dispatch", "q_concat_prefix",
    "q_string_funcs", "q_math_funcs", "q_date_funcs", "q_json_extract",
    "q_map_ops", "q_array_slice", "q_broadcast_left_join", "q_join_inner",
    "q_join_multiway", "q_join_semi", "q_join_anti", "q_join_range",
    "q_join_asof", "q_agg_group", "q_agg_distinct", "q_agg_approx",
    "q_agg_rollup", "q_window_rank", "q_window_lag", "q_window_running",
    "q_sort", "q_topk", "q_topk_pergroup", "q_set_union", "q_set_intersect",
    "q_set_except", "q_stream_tumbling", "q_stream_sliding",
    "q_stream_session", "q_dedup_exact", "q_dedup_near", "q_sim_topk",
    "q_text_stats",
}

FOOTER = """
Non-query operator surfaces with test-only verification (no SQL
analog): the CalTopo domain pipeline golden matrix F1-F10 + multi-map
fan-out + streaming mode (`tests/test_caltopo_pipeline.py`,
`tests/test_caltopo_streaming.py`), strict envelope decode
(`tests/test_decode_strict.py`), geometry truncation properties
(`tests/test_geometry.py`), batch/stream window equivalence +
watermark + stream-dedup (`tests/test_streaming.py`), arbitrary-state
streaming (`tests/test_stateful_streaming.py`), as-of join property
tests (`tests/test_asof_property.py`), Python UDTF
(`tests/test_udf_surfaces.py`), incremental high-watermark batch +
ORC/JSONL sources (`tests/test_incremental.py`), partitioned/bucketed
layout + salted skew join (`tests/test_storage_layout.py`), compaction
+ clustered writes (`tests/test_maintenance.py`), CDC merge + data
quality + observe() metrics (`tests/test_etl_ops.py`), physical-plan
guarantees (`tests/test_plans.py`), multimodal binary-column plumbing
(`tests/test_llm_ops.py`).  Scaling + skew evidence: `SCALING.md`;
cluster deployment notes: `DEPLOY.md`."""


def main() -> None:
    n_oracle = sum(1 for s in REGISTRY.values() if s.oracle)
    n_rows = len(REGISTRY) - n_oracle
    lines = [f"""
---

## 8. Implementation ledger (round 1)

Every registered query id → implementing module and oracle status
({len(REGISTRY)} ids: {n_oracle} DuckDB-hash-checked, {n_rows} rows-only with stated
reasons).  `[EXT+]` rows widen coverage beyond the §2-declared
minimum so a reference user finds everything a complete engine
implies.

| query id | module | oracle | bench headline |
|---|---|---|---|"""]
    for name, spec in REGISTRY.items():
        mod = inspect.getmodule(spec.fn).__name__.rsplit(".", 1)[-1]
        oracle = "DuckDB-checked" if spec.oracle else f"rows-only ({spec.note.rstrip('.')})"
        tag = "" if name in DECLARED else " `[EXT+]`"
        lines.append(
            f"| `{name}`{tag} | `queries/{mod}.py` | {oracle} |"
            f" {'yes' if spec.headline else ''} |"
        )
    lines.append(FOOTER)
    p = pathlib.Path(__file__).resolve().parent.parent / "SURVEY.md"
    s = p.read_text().split("\n---\n\n## 8. Implementation ledger")[0]
    p.write_text(s + "\n".join(lines) + "\n")
    print(f"ledger: {len(REGISTRY)} ids ({n_oracle} oracle, {n_rows} rows-only)")


if __name__ == "__main__":
    main()

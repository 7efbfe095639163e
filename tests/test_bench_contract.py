"""bench.py output-shape contract (VERDICT r8 #1).

The driver archives only the LAST 2000 characters of bench.py's stdout.
BENCH_r08.json lost every per-query number because the prose ``notes``
dict was emitted after ``queries``/``spread`` and grew past the tail.
These tests pin the fix: measurements last, notes first, and a
realistically-sized queries+spread payload must fit a 2000-char tail.
"""

from __future__ import annotations

import json

import bench
from etl_caltopo_spark.queries import REGISTRY


def _fake_payload():
    headline = [name for name, spec in REGISTRY.items() if spec.headline]
    # worst-case realistic widths: multi-second timings, 3-decimal spread
    times = {n: 12.345 for n in headline}
    spread = {n: [11.111, 12.345, 19.999] for n in headline}
    return times, spread


def test_key_order_measurements_last():
    times, spread = _fake_payload()
    line = bench.emit_line(times, spread, 0.1)
    keys = list(json.loads(line).keys())
    assert keys.index("notes") < keys.index("queries") < keys.index("spread")
    assert keys[-2:] == ["queries", "spread"]
    # json.dumps preserves insertion order, so serialized position
    # matches too — the driver tail sees the raw string:
    assert line.rindex('"spread"') > line.rindex('"queries"') > line.index('"notes"')


def test_queries_dict_survives_2000_char_tail():
    """The driver's 2000-char tail must contain the COMPLETE queries
    dict (parseable after trimming to the spread suffix)."""
    times, spread = _fake_payload()
    line = bench.emit_line(times, spread, 0.1)
    tail = line[-2000:]
    start = tail.find('"queries"')
    assert start != -1, "queries dict fell outside the 2000-char tail"
    # extract the {...} that follows "queries":
    obj_start = tail.index("{", start)
    depth, end = 0, None
    for i in range(obj_start, len(tail)):
        if tail[i] == "{":
            depth += 1
        elif tail[i] == "}":
            depth -= 1
            if depth == 0:
                end = i + 1
                break
    assert end is not None, "queries dict truncated by the tail"
    parsed = json.loads(tail[obj_start:end])
    assert set(parsed) == set(times)


def test_notes_stay_bounded():
    """Notes are prose for humans; keep them small enough that they can
    never push spread's tail-end past 2000 chars combined with the
    measurement dicts.  One line each, pointer to HANDOFF for detail."""
    assert len(json.dumps(bench.NOTES)) < 600

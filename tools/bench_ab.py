"""Interleaved same-box A/B bench of two git revisions (VERDICT r8 #4
/ r9 #2) — the adjudication tool bench.py's box_weather note points at.

The problem it solves: this box drifts a uniform 1.3-1.8x field
multiplier for hours (HANDOFF knowledge #11), so comparing one round's
committed BENCH total against the previous round's conflates box
weather with plan regressions.  Interleaving the two revisions on the
SAME box in the SAME session window makes the drift common-mode:

- both revs are checked out into throwaway `git worktree`s;
- each measurement pass is ONE fresh subprocess per rev (own JVM, own
  warm-up pass over every query, then one timed run per query), and
  passes alternate old, new, old, new, ... so slow-box windows hit
  both revs equally;
- per query we take the median over passes for each rev, compute
  ratio = new/old, then factor out the FIELD multiplier (the median
  ratio across all queries — a globally slower/faster rev build or
  residual drift moves every query together) and report the adjusted
  per-query ratio.  A genuine plan regression is a query whose
  adjusted ratio stands off the field.

Usage:
    python tools/bench_ab.py <old-rev> <new-rev> [passes]
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/bench_ab.py \
        HEAD~1 HEAD 2      # quick mode while iterating
    python tools/bench_ab.py OLD NEW 3 --json BENCH_AB_r12.json

Queries measured: the intersection of both revs' headline registries
(so a query added or renamed between revs never aborts the run; the
dropped names are printed).  Prints a markdown table and ONE final
JSON line {"old": rev, "new": rev, "field": m, "ratios": {...},
"flagged": [...]}.

Artifact hygiene (VERDICT r11 #4): with ``--json PATH`` the run is
appended to a ``{"runs": [...]}`` artifact where exactly ONE run
carries ``"final": true``.  Re-running an adjudication into the same
file (e.g. a drifting-field first attempt re-adjudicated on an idle
box) marks every earlier run ``"final": false`` with
``"superseded_by": <new run_id>`` — a stale flagged-list can no longer
be read as authoritative.  Readers take the single final run.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: adjusted-ratio band outside which a query is flagged as a real
#: per-query mover (the measured same-code jitter is ±20-30%)
FLAG_HIGH = 1.3
FLAG_LOW = 1 / FLAG_HIGH

_HEADLINE_SRC = r"""
import json, os, sys
sys.path.insert(0, os.getcwd())
from etl_caltopo_spark.queries import REGISTRY
print("BENCH_AB_HEADLINE:" + json.dumps(
    [n for n, s in REGISTRY.items() if s.headline]))
"""

_PASS_SRC = r"""
import json, os, sys, time
sys.path.insert(0, os.getcwd())
from etl_caltopo_spark.queries import REGISTRY
from etl_caltopo_spark.session import build_spark
sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
names = json.loads(os.environ["BENCH_AB_QUERIES"])
spark = build_spark(app_name="bench-ab")
spark.sparkContext.setLogLevel("ERROR")
for nm in names:                       # warm-up: codegen compile etc.
    REGISTRY[nm].fn(spark, sf_dir).count()
out = {}
for nm in names:
    t0 = time.perf_counter()
    REGISTRY[nm].fn(spark, sf_dir).count()
    out[nm] = time.perf_counter() - t0
print("BENCH_AB_JSON:" + json.dumps(out))
"""


def _run_py(cwd: str, src: str, marker: str, env_extra: dict) -> dict | list:
    env = dict(os.environ, **env_extra)
    proc = subprocess.run(
        [sys.executable, "-c", src], cwd=cwd, env=env,
        capture_output=True, text=True,
    )
    for line in proc.stdout.splitlines():
        if line.startswith(marker):
            return json.loads(line[len(marker):])
    raise RuntimeError(
        f"subprocess in {cwd} produced no {marker} line\n"
        f"--- stdout tail ---\n{proc.stdout[-2000:]}\n"
        f"--- stderr tail ---\n{proc.stderr[-2000:]}"
    )


def _add_worktree(rev: str) -> str:
    sha = subprocess.run(
        ["git", "rev-parse", "--short", rev], cwd=REPO,
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    path = f"/tmp/bench_ab_{sha}"
    if os.path.exists(path):
        shutil.rmtree(path, ignore_errors=True)
        subprocess.run(
            ["git", "worktree", "prune"], cwd=REPO, capture_output=True
        )
    subprocess.run(
        ["git", "worktree", "add", "--detach", path, rev],
        cwd=REPO, check=True, capture_output=True, text=True,
    )
    return path


def _remove_worktree(path: str) -> None:
    subprocess.run(
        ["git", "worktree", "remove", "--force", path],
        cwd=REPO, capture_output=True,
    )


def adjudicate(
    med_old: dict[str, float], med_new: dict[str, float]
) -> tuple[float, dict[str, float], list[str], list[str]]:
    """Per-query ratios with the field multiplier factored out.

    Returns ``(field, adjusted_ratios, flagged, unmeasurable)``.  A
    zero old-median yields a NaN ratio; NaNs are EXCLUDED from the
    field median (NaN in a sorted list lands unpredictably and, if
    selected, turns every adjusted ratio NaN and silently empties
    FLAGGED — ADVICE r10) and their queries are flagged explicitly.
    """
    names = sorted(med_old.keys() & med_new.keys())
    ratios = {
        n: (med_new[n] / med_old[n]) if med_old[n] > 0 else float("nan")
        for n in names
    }
    unmeasurable = sorted(n for n, r in ratios.items() if r != r)
    finite = sorted(r for r in ratios.values() if r == r)
    if not finite:
        raise ValueError("no finite per-query ratios — nothing to adjudicate")
    # true median — the upper-middle element alone biases every
    # adjusted ratio when the finite list is even-length (r11 review)
    mid = len(finite) // 2
    field = finite[mid] if len(finite) % 2 else (finite[mid - 1] + finite[mid]) / 2
    adjusted = {n: r / field for n, r in ratios.items()}
    flagged = sorted(
        set(unmeasurable)
        | {n for n, r in adjusted.items()
           if r == r and (r > FLAG_HIGH or r < FLAG_LOW)}
    )
    return field, adjusted, flagged, unmeasurable


def write_artifact(path: str, run: dict) -> dict:
    """Append ``run`` to the ``{"runs": [...]}`` artifact at ``path``,
    superseding every earlier run (VERDICT r11 #4).  A legacy
    single-dict artifact is migrated into the runs list first.
    Returns the written document."""
    import time

    run = dict(run)
    runs: list[dict] = []
    if os.path.exists(path):
        with open(path) as f:
            doc = json.load(f)
        runs = doc["runs"] if isinstance(doc, dict) and "runs" in doc else [doc]
    # the run index suffix keeps ids unique even within one second
    run["run_id"] = (
        time.strftime("%Y%m%dT%H%M%SZ", time.gmtime()) + f"-{len(runs)}"
    )
    run["final"] = True
    for r in runs:
        r["final"] = False
        r["superseded_by"] = run["run_id"]
    runs.append(run)
    doc = {"runs": runs}
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    return doc


def main() -> None:
    argv = list(sys.argv[1:])
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            # --json with no value: fall through to usage (ADVICE r12)
            print(__doc__)
            sys.exit(2)
        json_path = argv[i + 1]
        del argv[i : i + 2]
    if len(argv) < 2:
        print(__doc__)
        sys.exit(2)
    old_rev, new_rev = argv[0], argv[1]
    passes = int(argv[2]) if len(argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    wt = {"old": _add_worktree(old_rev), "new": _add_worktree(new_rev)}
    try:
        heads = {
            k: set(_run_py(p, _HEADLINE_SRC, "BENCH_AB_HEADLINE:", {}))
            for k, p in wt.items()
        }
        names = sorted(heads["old"] & heads["new"])
        dropped = sorted(heads["old"] ^ heads["new"])
        if dropped:
            print(f"dropped (headline in only one rev): {dropped}")
        env = {
            "SPARK_GRAFT_SF_DIR": sf_dir,
            "BENCH_AB_QUERIES": json.dumps(names),
        }
        samples: dict[str, dict[str, list[float]]] = {
            k: {n: [] for n in names} for k in wt
        }
        for i in range(passes):
            for k in ("old", "new"):       # strict alternation
                t = _run_py(wt[k], _PASS_SRC, "BENCH_AB_JSON:", env)
                for n in names:
                    samples[k][n].append(t[n])
                print(f"pass {i + 1}/{passes} {k} ({wt[k]}): "
                      f"total {sum(t.values()):.2f} s", flush=True)
    finally:
        for p in wt.values():
            _remove_worktree(p)

    med = {
        k: {n: sorted(v)[len(v) // 2] for n, v in samples[k].items()}
        for k in samples
    }
    field, adjusted, flagged, unmeasurable = adjudicate(med["old"], med["new"])
    if unmeasurable:
        print(f"UNMEASURABLE (old median 0 s — flagged): {unmeasurable}")

    print(f"\nfield multiplier (median new/old ratio): {field:.3f}")
    print("| query | old med (s) | new med (s) | ratio | adj ratio | |")
    print("|---|---|---|---|---|---|")
    um = set(unmeasurable)
    for n in sorted(
        names, key=lambda x: (0, x) if x in um else (1, -adjusted[x])
    ):
        mark = "<-- FLAGGED" if n in flagged else ""
        print(
            f"| {n} | {med['old'][n]:.3f} | {med['new'][n]:.3f} "
            f"| {adjusted[n] * field:.2f} | {adjusted[n]:.2f} | {mark} |"
        )
    result = {
        "old": old_rev, "new": new_rev, "sf_dir": sf_dir, "passes": passes,
        "field": round(field, 4),
        "ratios": {
            n: (round(r, 4) if r == r else None) for n, r in adjusted.items()
        },
        "unmeasurable": unmeasurable,
        "flagged": flagged,
    }
    print(json.dumps(result))
    if json_path:
        doc = write_artifact(json_path, result)
        n_sup = len(doc["runs"]) - 1
        print(
            f"wrote {json_path}: run {doc['runs'][-1]['run_id']} final"
            + (f", superseding {n_sup} earlier run(s)" if n_sup else "")
        )


if __name__ == "__main__":
    main()

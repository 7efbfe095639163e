"""Local stand-in for the driver's correctness gate.

Runs every registered query on Spark and, when an oracle exists, the
oracle SQL on DuckDB over the same parquet tables; compares row count,
column names, and an order-insensitive value hash.  Use while
iterating:

    python tools/check_oracle.py [--sf /root/testdata/sf0.01] [q_name ...]

``--json PATH`` additionally writes the per-query records in the
driver's CORRECTNESS_r{N}.json shape, plus ONE extra ``"_meta"`` key
(git_rev / working_tree_dirty / pass counts — the staleness stamp,
VERDICT r10 #2).  Consumers iterating the mapping as query records
must skip keys starting with ``_``; every other value carries the
rows_match/schema_match/hash_match/spark_rows/oracle_rows/err fields.
Regenerated over ALL ids and
committed as CORRECTNESS_full_r{N}.json each round, so the full
registry (not any harness sample) has a visible correctness record.
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
import time
from datetime import date, datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from etl_caltopo_spark.io import TABLES
from etl_caltopo_spark.queries import REGISTRY
from etl_caltopo_spark.session import build_spark


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0  # normalize -0.0
        return repr(v)
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def row_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query ids (default: all)")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--json", default=None, help="write per-query records to this path")
    ap.add_argument(
        "--hostile",
        action="store_true",
        help="run every query on a HOSTILE sibling session (non-UTC "
        "session timezone, ANSI off, case-sensitive, 3 shuffle "
        "partitions, AQE off) — the driver contract's worst-case "
        "session (r14 session axis; set TZ=America/Denver in the "
        "environment to also shift the collect-side Python timezone)",
    )
    args = ap.parse_args()
    records: dict[str, dict] = {}

    spark = build_spark(app_name="check-oracle")
    if args.hostile:
        spark = spark.newSession()
        for k, v in {
            "spark.sql.session.timeZone": "America/New_York",
            "spark.sql.ansi.enabled": "false",
            "spark.sql.caseSensitive": "true",
            "spark.sql.shuffle.partitions": "3",
            "spark.sql.adaptive.enabled": "false",
        }.items():
            spark.conf.set(k, v)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    names = args.names or list(REGISTRY)
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        spec = REGISTRY[name]
        t0 = time.perf_counter()
        try:
            sdf = spec.fn(spark, args.sf)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            records[name] = {
                "rows_match": False, "schema_match": False, "hash_match": False,
                "spark_rows": None, "oracle_rows": None,
                "err": f"spark error: {type(e).__name__}",
            }
            n_fail += 1
            continue
        dt = time.perf_counter() - t0
        if spec.oracle is None:
            print(f"rows-only {name}: {len(s_rows)} rows [{dt:.1f}s] ({spec.note})")
            records[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": len(s_rows), "oracle_rows": None, "err": "no_oracle",
            }
            n_rowsonly += 1
            continue
        try:
            res = con.execute(spec.oracle)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            records[name] = {
                "rows_match": False, "schema_match": False, "hash_match": False,
                "spark_rows": len(s_rows), "oracle_rows": None,
                "err": f"duckdb error: {type(e).__name__}",
            }
            n_fail += 1
            continue
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            hs, hd = row_hash(s_cols, s_rows), row_hash(d_cols, d_rows)
            if hs != hd:
                problems.append("value-hash mismatch")
                # show a few differing lines for debugging
                order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                set_s = {"|".join(canon(r[i]) for i in order_s) for r in s_rows}
                set_d = {"|".join(canon(r[i]) for i in order_d) for r in d_rows}
                only_s = list(set_s - set_d)[:3]
                only_d = list(set_d - set_s)[:3]
                for x in only_s:
                    problems.append(f"  spark-only: {x}")
                for x in only_d:
                    problems.append(f"  duck-only:  {x}")
        records[name] = {
            "rows_match": len(s_rows) == len(d_rows),
            "schema_match": sorted(s_cols) == sorted(d_cols),
            "hash_match": not problems,
            "spark_rows": len(s_rows),
            "oracle_rows": len(d_rows),
            "err": "; ".join(problems) if problems else None,
        }
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(f"      {p}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(s_rows)} rows [{dt:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail / {len(names)}")
    if args.json:
        import json
        import subprocess

        # Stamp the exact source revision the sweep ran against
        # (VERDICT r10 #2): staleness vs the round's final commit is
        # then self-evident — the invariant is "the committed full
        # sweep's git_rev equals the last source-touching commit".
        try:
            rev = subprocess.run(
                ["git", "rev-parse", "HEAD"],
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                capture_output=True, text=True, check=True,
            ).stdout.strip()
            # the artifact being written is expectedly untracked at
            # sweep time — it must not trip its own dirtiness flag.
            # Compare the EXACT repo-relative path (porcelain field 2,
            # or the rename target after " -> ") — a basename-suffix
            # match would let an unrelated dirty file with the same
            # name slip through (r11 review).
            repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            own = os.path.relpath(os.path.abspath(args.json), repo)
            porcelain = subprocess.run(
                ["git", "status", "--porcelain"],
                cwd=repo, capture_output=True, text=True, check=True,
            ).stdout.splitlines()

            def _path(ln: str) -> str:
                p = ln[3:]
                if " -> " in p:
                    p = p.split(" -> ", 1)[1]
                return p.strip().strip('"')

            dirty = bool(
                [ln for ln in porcelain if ln.strip() and _path(ln) != own]
            )
        except Exception:
            rev, dirty = None, None
        records["_meta"] = {
            "git_rev": rev,
            "working_tree_dirty": dirty,
            "n_pass": n_pass,
            "n_rows_only": n_rowsonly,
            "n_fail": n_fail,
            "n_ids": len(names),
        }
        with open(args.json, "w") as f:
            json.dump(records, f, indent=2)
        print(f"wrote {args.json} (git_rev {rev}, dirty={dirty})")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())

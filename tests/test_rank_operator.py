"""operators/rank.py — distributed exact global ranking (VERDICT r6
#1).  Every helper must be bit-identical to the single-partition
window it replaces, across ties, directions, degenerate frames, and
bucket counts that don't divide the data evenly."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_caltopo_spark.operators.rank import (
    cume_dist_from_rank,
    global_lead,
    global_row_number,
    global_running_sum,
    ntile_from_rank,
    percent_rank_from_rank,
)


@pytest.fixture(scope="module")
def frame(spark):
    random.seed(7)
    rows = [(i, random.randint(0, 50), random.random() * 100) for i in range(2003)]
    return spark.createDataFrame(rows, "id long, k int, v double").repartition(8)


def _pairs(df, *cols):
    return {tuple(r) for r in df.select(*cols).collect()}


def test_row_number_matches_window_with_ties(frame):
    ref = frame.withColumn("rn", F.row_number().over(Window.orderBy("k", "id")))
    got = global_row_number(
        frame, "k", [F.col("k"), F.col("id")], rn_col="rn", buckets=7
    )
    assert _pairs(ref, "id", "rn") == _pairs(got, "id", "rn")


def test_row_number_descending(frame):
    ref = frame.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.desc("v"), "id"))
    )
    got = global_row_number(
        frame,
        "v",
        [F.desc("v"), F.col("id")],
        ascending=False,
        rn_col="rn",
        buckets=5,
    )
    assert _pairs(ref, "id", "rn") == _pairs(got, "id", "rn")


def test_ntile_percent_rank_cume_dist_bit_equal(frame):
    w = Window.orderBy("v", "id")
    ref = frame.select(
        "id",
        F.ntile(4).over(w).alias("t4"),
        F.ntile(10).over(w).alias("t10"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    g = global_row_number(
        frame, "v", [F.col("v"), F.col("id")], rn_col="rn", total_col="n", buckets=6
    )
    got = g.select(
        "id",
        ntile_from_rank(F.col("rn"), F.col("n"), 4).alias("t4"),
        ntile_from_rank(F.col("rn"), F.col("n"), 10).alias("t10"),
        percent_rank_from_rank(F.col("rn"), F.col("n")).alias("pr"),
        cume_dist_from_rank(F.col("rn"), F.col("n")).alias("cd"),
    )
    assert _pairs(ref, "id", "t4", "t10", "pr", "cd") == _pairs(
        got, "id", "t4", "t10", "pr", "cd"
    )


def test_ntile_fewer_rows_than_tiles(spark):
    small = spark.createDataFrame([(i, float(i)) for i in range(3)], "id long, v double")
    ref = small.select(
        "id", F.ntile(10).over(Window.orderBy("v", "id")).alias("t")
    )
    g = global_row_number(
        small, "v", [F.col("v"), F.col("id")], rn_col="rn", total_col="n", buckets=4
    )
    got = g.select("id", ntile_from_rank(F.col("rn"), F.col("n"), 10).alias("t"))
    assert _pairs(ref, "id", "t") == _pairs(got, "id", "t")


def test_running_sum_descending_exact_ints(frame):
    d = frame.withColumn("c", (F.col("v") * 100).cast("long"))
    wr = Window.orderBy(F.desc("c"), "id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ref = d.select("id", F.sum("c").over(wr).alias("cum"))
    got = global_running_sum(
        d,
        "c",
        [F.desc("c"), F.col("id")],
        "c",
        out_col="cum",
        ascending=False,
        buckets=9,
    )
    assert _pairs(ref, "id", "cum") == _pairs(got, "id", "cum")


def test_running_sums_two_columns_one_pass(frame):
    """Multi-sum form (q_vocab_growth shape): two cumulative sums plus
    the row number attached in ONE bucketed pass, each bit-equal to
    its single-partition window twin."""
    from etl_caltopo_spark.operators.rank import global_running_sums

    d = frame.withColumn("c", (F.col("v") * 100).cast("long")).withColumn(
        "k2", (F.col("k") * 3 + 1).cast("long")
    )
    w = Window.orderBy("k", "id")
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ref = d.select(
        "id",
        F.sum("c").over(wr).alias("cum_c"),
        F.sum("k2").over(wr).alias("cum_k2"),
        F.row_number().over(w).alias("rn"),
    )
    got = global_running_sums(
        d,
        "k",
        [F.col("k"), F.col("id")],
        {"cum_c": "c", "cum_k2": "k2"},
        buckets=9,
        rn_col="rn",
    )
    assert _pairs(ref, "id", "cum_c", "cum_k2", "rn") == _pairs(
        got, "id", "cum_c", "cum_k2", "rn"
    )


def test_row_number_null_primary_matches_window_defaults(spark):
    """NULL primaries must land exactly where an unpartitioned window
    puts them: FIRST ascending, LAST descending (the -1 / `buckets`
    sentinel buckets) — pinned because the r7 review verified this
    only in a live session."""
    rows = [(i, None if i % 5 == 0 else i * 3 % 97) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, k int").repartition(6)
    for asc in (True, False):
        order = [F.asc("k"), F.col("id")] if asc else [F.desc("k"), F.col("id")]
        ref = df.withColumn("rn", F.row_number().over(Window.orderBy(*order)))
        got = global_row_number(
            df, "k", order, ascending=asc, rn_col="rn", buckets=9
        )
        assert _pairs(ref, "id", "rn") == _pairs(got, "id", "rn"), asc


def test_row_number_all_null_and_empty_frames(spark):
    """Degenerate frames: all-NULL primary (the pinned cuts aggregate
    returns NULL -> empty literal array, every row in the sentinel
    bucket) and a zero-row frame (no crash, zero rows out)."""
    all_null = spark.createDataFrame(
        [(i, None) for i in range(25)], "id long, k int"
    )
    got = global_row_number(all_null, "k", [F.col("k"), F.col("id")], rn_col="rn")
    ref = all_null.withColumn(
        "rn", F.row_number().over(Window.orderBy("k", "id"))
    )
    assert _pairs(ref, "id", "rn") == _pairs(got, "id", "rn")
    empty = spark.createDataFrame([], "id long, k int")
    assert (
        global_row_number(empty, "k", [F.col("k"), F.col("id")], rn_col="rn").count()
        == 0
    )


def test_running_sums_decimal_value_column_exact(spark):
    """Decimal value columns pass the exact-type gate and produce
    bit-identical running sums (the money path when cents overflow
    int64 — the q_gini docstring's decimal(38,0) escape)."""
    rows = [(i, i * 7 % 31, f"{(i * 13 % 997) / 100:.2f}") for i in range(300)]
    df = (
        spark.createDataFrame(rows, "id long, k int, amt string")
        .withColumn("amt", F.col("amt").cast("decimal(38,2)"))
        .repartition(5)
    )
    from etl_caltopo_spark.operators.rank import global_running_sums

    wr = Window.orderBy("k", "id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ref = df.select("id", F.sum("amt").over(wr).alias("cum"))
    got = global_running_sums(
        df, "k", [F.col("k"), F.col("id")], {"cum": "amt"}, buckets=6
    )
    assert _pairs(ref, "id", "cum") == _pairs(got, "id", "cum")


def test_running_sums_nullable_value_column_matches_window(spark):
    """NULL semantics must match the window twin exactly: NULL while
    zero non-nulls have been seen, then the sum of non-nulls — in
    particular a bucket-LEADING NULL prefix must carry the previous
    buckets' total instead of going NULL (r7 review: the naive
    local+offset form violated this for any NULLable exact column)."""
    from etl_caltopo_spark.operators.rank import global_running_sums

    rows = [
        # k orders the frame; v has NULLs at the front (global NULL
        # prefix) and sprinkled through later buckets
        (i, i, None if (i < 4 or i % 7 == 0) else (i * 11 % 100))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id long, k int, v long").repartition(5)
    wr = Window.orderBy("k", "id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ref = df.select("id", F.sum("v").over(wr).alias("cum"))
    got = global_running_sums(
        df, "k", [F.col("k"), F.col("id")], {"cum": "v"}, buckets=9
    )
    assert _pairs(ref, "id", "cum") == _pairs(got, "id", "cum")


def test_running_sums_reject_float_value_columns(frame):
    """The offset decomposition reorders floating-point accumulation,
    so a double value column would be ulp-different from the single-
    partition window it claims to replace — the operator must refuse
    it loudly instead of silently breaking hash parity (r7 review)."""
    from etl_caltopo_spark.operators.rank import global_running_sums

    with pytest.raises(TypeError, match="exact type"):
        global_running_sums(
            frame, "k", [F.col("k"), F.col("id")], {"cum_v": "v"}, buckets=9
        )


def test_lead_over_sparse_unique_keys(spark):
    random.seed(11)
    ks = spark.createDataFrame(
        [(x,) for x in sorted(random.sample(range(100000), 1500))], "k long"
    )
    ref = ks.withColumn("nxt", F.lead("k").over(Window.orderBy("k")))
    got = global_lead(ks, "k", out_col="nxt", buckets=11)
    assert _pairs(ref, "k", "nxt") == _pairs(got, "k", "nxt")


def test_constant_primary_degenerates_correctly(spark):
    """All rows tie on the primary → one bucket (equal-frequency cuts
    cannot split a value) — still exact."""
    cst = spark.createDataFrame([(i, 5) for i in range(50)], "id long, k int")
    ref = cst.withColumn("rn", F.row_number().over(Window.orderBy("k", "id")))
    got = global_row_number(cst, "k", [F.col("k"), F.col("id")], rn_col="rn", buckets=4)
    assert _pairs(ref, "id", "rn") == _pairs(got, "id", "rn")


def test_data_exchange_is_bucket_hash_not_single_partition(frame):
    """The scale contract: the only SinglePartition exchanges feed the
    ≤buckets-row offsets window; the data shuffles by bucket hash."""
    got = global_row_number(frame, "k", [F.col("k"), F.col("id")], rn_col="rn")
    plan = got._sc._jvm.PythonSQLUtils.explainString(
        got._jdf.queryExecution(), "formatted"
    )
    assert "hashpartitioning(_rank_bucket" in plan
    # every SinglePartition exchange is a tiny-aggregate/offsets frame,
    # whose input is at most (bucket, counts) wide — never the data
    for block in plan.split("\n\n"):
        if "Arguments: SinglePartition" in block:
            assert "_cnt" in block or "Input [1]" in block or "Input [2]" in block, block


# --- hot-value tiebreak sub-bucketing (VERDICT r7 #1, r8) ----------------


def test_hot_value_splits_into_tiebreak_subbuckets(spark):
    """A value holding 50% of the frame must spread across multiple
    composite buckets (per-task rows ~ n/buckets, not n/2 in one) —
    and stay bit-identical to the window."""
    from etl_caltopo_spark.operators.rank import BUCKET_COL, with_value_buckets

    n = 4000
    rows = [(5 if i % 2 == 0 else (i % 97) + 100, i) for i in range(n)]
    df = spark.createDataFrame(rows, "k int, id long").repartition(8)
    b = with_value_buckets(df, "k", buckets=8, tiebreak="id")
    sizes = [r["count"] for r in b.groupBy(BUCKET_COL).count().collect()]
    # without sub-bucketing the hot bucket holds n/2 = 2000 rows; with
    # it, no task exceeds ~2x the n/buckets target (percentile slack)
    assert max(sizes) <= 2 * (n // 8), f"hot bucket not split: {sorted(sizes)}"
    hot_spread = (
        b.filter(F.col("k") == 5).select(BUCKET_COL).distinct().count()
    )
    assert hot_spread >= 3, f"hot value spans only {hot_spread} buckets"
    ref = df.withColumn("rn", F.row_number().over(Window.orderBy("k", "id")))
    got = global_row_number(
        df, "k", [F.col("k"), F.col("id")], rn_col="rn", buckets=8, tiebreak="id"
    )
    assert _pairs(ref, "k", "id", "rn") == _pairs(got, "k", "id", "rn")


def test_hot_value_subbuckets_descending_primary_ascending_tiebreak(spark):
    """The q_pareto shape: primary DESC, tiebreak ASC — directions
    compose independently."""
    rows = [(7 if i % 2 == 0 else (i % 53), i) for i in range(2000)]
    df = spark.createDataFrame(rows, "k int, id long").repartition(8)
    ref = df.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.desc("k"), F.asc("id")))
    )
    got = global_row_number(
        df,
        "k",
        [F.col("k").desc(), F.col("id")],
        ascending=False,
        rn_col="rn",
        buckets=8,
        tiebreak="id",
    )
    assert _pairs(ref, "k", "id", "rn") == _pairs(got, "k", "id", "rn")


def test_hot_value_string_tiebreak_proxy(spark):
    """The vocab shape (q_gini_vocab): count n=1 is hot, tiebreak is
    the word string — split via the 7-byte UTF-8 prefix proxy.  Words
    here differ within 7 bytes, so the proxy actually splits them."""
    from etl_caltopo_spark.operators.rank import BUCKET_COL, with_value_buckets

    rows = [(1 if i < 1500 else i, f"{i:06d}_w") for i in range(2000)]
    df = spark.createDataFrame(rows, "n long, w string").repartition(8)
    b = with_value_buckets(df, "n", buckets=8, tiebreak="w")
    spread = b.filter(F.col("n") == 1).select(BUCKET_COL).distinct().count()
    assert spread >= 3, f"hot n=1 spans only {spread} buckets"
    ref = df.withColumn("rn", F.row_number().over(Window.orderBy("n", "w")))
    got = global_row_number(
        df, "n", [F.col("n"), F.col("w")], rn_col="rn", buckets=8, tiebreak="w"
    )
    assert _pairs(ref, "n", "w", "rn") == _pairs(got, "n", "w", "rn")


def test_hot_value_shared_prefix_adaptive_offset_splits(spark):
    """The r9 adaptive offset (VERDICT r8 #2), positive form — the
    judge's r9 probe shape: one hot primary carries 60% of the rows
    and every tiebreak shares a long one-domain URL prefix.  Under
    the pre-r9 fixed offset these collapsed onto one 7-byte proxy
    value (the shared ``https://``) and re-formed the hot task; the
    measured-prefix offset probes the path bytes where they actually
    diverge.  Asserts BOTH the split (sub-bucket spread >= 3, max
    task bounded) and global_row_number exactness."""
    from etl_caltopo_spark.operators.rank import BUCKET_COL, with_value_buckets

    n = 4000
    rows = [
        (1, f"https://example.com/{i:06d}")
        if i % 5 < 3
        else ((i % 97) + 100, f"https://example.com/{i:06d}")
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "n long, w string").repartition(8)
    b = with_value_buckets(df, "n", buckets=8, tiebreak="w")
    spread = b.filter(F.col("n") == 1).select(BUCKET_COL).distinct().count()
    assert spread >= 3, f"shared-prefix hot group spans only {spread} buckets"
    sizes = [r["count"] for r in b.groupBy(BUCKET_COL).count().collect()]
    assert max(sizes) <= 2 * (n // 8), f"hot task not split: {sorted(sizes)}"
    ref = df.withColumn("rn", F.row_number().over(Window.orderBy("n", "w")))
    got = global_row_number(
        df, "n", [F.col("n"), F.col("w")], rn_col="rn", buckets=8, tiebreak="w"
    )
    assert _pairs(ref, "n", "w", "rn") == _pairs(got, "n", "w", "rn")


def test_hot_value_strings_tying_past_measured_prefix_stay_unsplit(spark):
    """The TRUE residual after the r9 adaptive offset: strings that
    agree on the 7 bytes FOLLOWING their measured common prefix while
    diverging later share one proxy value and one sub-bucket.  Here
    the hot group's min ('A0000000...') and max ('A9999999...') pin
    the measured prefix to just 'A' (1 byte), and the 500 mass rows
    all read '5555555' at bytes [1, 8) — no split for them, still
    exact.  (Renamed from the r8 fall-back test, whose word_-prefixed
    strings DO split under the adaptive offset — VERDICT r9 #1b.)"""
    from etl_caltopo_spark.operators.rank import BUCKET_COL, with_value_buckets

    rows = (
        [(1, "A0000000"), (1, "A9999999")]
        + [(1, f"A5555555{i:06d}") for i in range(500)]
        + [(2 + i, f"A5555555{i:06d}x") for i in range(100)]
    )
    df = spark.createDataFrame(rows, "n long, w string")
    b = with_value_buckets(df, "n", buckets=8, tiebreak="w")
    mass = (
        b.filter((F.col("n") == 1) & F.col("w").startswith("A5555555"))
        .select(BUCKET_COL)
        .distinct()
        .count()
    )
    assert mass == 1, f"proxy-tied mass rows split into {mass} buckets"
    ref = df.withColumn("rn", F.row_number().over(Window.orderBy("n", "w")))
    got = global_row_number(
        df, "n", [F.col("n"), F.col("w")], rn_col="rn", buckets=8, tiebreak="w"
    )
    assert _pairs(ref, "n", "w", "rn") == _pairs(got, "n", "w", "rn")


def test_tiebreak_proxy_clamp_is_monotone_outside_prefix_region(spark):
    """The r10 clamp (advisor r9): with offset+prefix set, the proxy
    must be weakly monotone in string order for ALL strings — ones
    below the measured prefix region clamp to -1, ones above to
    2^56 — so a row outside the probe's min/max bound (possible only
    under a non-deterministic upstream) still lands in an
    order-consistent sub-bucket instead of silently breaking
    bucket-major order."""
    from etl_caltopo_spark.operators.rank import _PROXY_HIGH, _tiebreak_proxy

    pfx = "https://example.com/".encode("utf-8")
    words = [
        "aaa",                              # below the region
        "https://example.com",              # proper prefix → below
        "https://example.com/000001",       # inside, small
        "https://example.com/999999",       # inside, large
        "https://zzz",                      # above the region
    ]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    proxy = _tiebreak_proxy("w", "string", offset=len(pfx), prefix=pfx)
    got = {r["w"]: r["p"] for r in df.select("w", proxy.alias("p")).collect()}
    assert got["aaa"] == -1
    assert got["https://example.com"] == -1
    assert got["https://zzz"] == _PROXY_HIGH
    inside = [got["https://example.com/000001"], got["https://example.com/999999"]]
    assert -1 < inside[0] < inside[1] < _PROXY_HIGH
    # weak monotonicity across the full sorted list
    ordered = [got[w] for w in sorted(words)]
    assert ordered == sorted(ordered)


def test_hot_value_null_tiebreaks_follow_window_defaults(spark):
    """NULL tiebreaks inside a hot group: NULLS FIRST under asc,
    NULLS LAST under desc — matching Spark's window sort."""
    rows = [(5, i if i % 10 else None) for i in range(1000)] + [
        ((i % 31) + 10, i) for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "k int, tb long").repartition(4)
    for asc in (True, False):
        tb = F.col("tb").asc() if asc else F.col("tb").desc()
        # row_number over (k, tb) is non-deterministic among NULL-tb
        # rows, so compare sorted (k, tb IS NULL, rn) triples — the
        # NULL rows' rank SET is order-invariant
        ref = df.withColumn("rn", F.row_number().over(Window.orderBy("k", tb)))
        got = global_row_number(
            df,
            "k",
            [F.col("k"), tb],
            rn_col="rn",
            buckets=8,
            tiebreak="tb",
            tiebreak_ascending=asc,
        )
        refs = sorted(
            (r["k"], r["tb"] is None, r["rn"]) for r in ref.collect()
        )
        gots = sorted(
            (r["k"], r["tb"] is None, r["rn"]) for r in got.collect()
        )
        assert refs == gots, f"asc={asc}"


def test_running_sums_with_hot_value_subbuckets(spark):
    rows = [(5 if i % 2 == 0 else (i % 97), i, (i * 7) % 11) for i in range(2000)]
    df = spark.createDataFrame(rows, "k int, id long, x long").repartition(8)
    w = Window.orderBy("k", "id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ref = df.withColumn("cum", F.sum("x").over(w))
    got = global_running_sum(
        df,
        "k",
        [F.col("k"), F.col("id")],
        "x",
        out_col="cum",
        buckets=8,
        tiebreak="id",
    )
    assert _pairs(ref, "k", "id", "cum") == _pairs(got, "k", "id", "cum")


# --- 2-hop size dispatch (VERDICT r6 #5) ---------------------------------


def test_graph_2hop_exact_refuses_past_pair_budget(spark, sf_dir):
    """The exact Σdeg² form must refuse past the ordered-pair budget
    and point at the sketch (the kNN collect-bound pattern)."""
    import pytest

    from etl_caltopo_spark.queries.extended12 import q_graph_2hop

    with pytest.raises(ValueError, match="q_graph_2hop_sketch"):
        q_graph_2hop(spark, sf_dir, max_exact_pairs=10)


def test_two_hop_reach_dispatches_by_scale(spark, sf_dir):
    """Below the budget the dispatcher returns the exact schema;
    above it, the sketch schema — automatically."""
    from etl_caltopo_spark.queries.extended12 import two_hop_reach

    exact = two_hop_reach(spark, sf_dir)
    assert set(exact.columns) == {"part", "n_2hop"}
    sketch = two_hop_reach(spark, sf_dir, max_exact_pairs=10)
    assert set(sketch.columns) == {"part", "n_buckets", "est_reach2"}
    assert sketch.count() > 0

@pytest.mark.parametrize("seed", [11, 23, 47])
def test_string_tiebreak_property_random_prefix_clusters(spark, seed):
    """Property pin for the r9/r10 string-proxy machinery: random
    frames mixing (a) a hot primary whose tiebreaks cluster under
    random shared prefixes of random lengths, (b) exact-duplicate
    tiebreaks, (c) NULL tiebreaks, and (d) non-hot filler — the
    composite bucketing must stay bit-exact against the window
    reference for every draw (ascending and descending tiebreak)."""
    rng = random.Random(seed)
    prefixes = [
        "".join(rng.choice("abcdefgh/:.") for _ in range(rng.randint(0, 24)))
        for _ in range(rng.randint(1, 4))
    ]
    rows = []
    for i in range(rng.randint(1500, 2500)):
        if rng.random() < 0.6:  # hot primary
            if rng.random() < 0.05:
                tb = None
            else:
                p = rng.choice(prefixes)
                # some exact-dup tiebreaks, some unique suffixes
                suf = (
                    "DUP"
                    if rng.random() < 0.1
                    else f"{rng.randint(0, 10**9):010d}"
                )
                tb = p + suf
            rows.append((1, tb, i))
        else:
            rows.append((2 + (i % 37), f"x{i:07d}", i))
    df = spark.createDataFrame(rows, "k int, w string, uid long").repartition(8)
    for asc in (True, False):
        tb = F.col("w").asc() if asc else F.col("w").desc()
        # (k, w) can tie (DUP suffixes / NULLs); uid makes the window
        # reference total so both sides agree on a deterministic rank,
        # while bucketing still derives only from (k, w)
        ref = df.withColumn(
            "rn", F.row_number().over(Window.orderBy("k", tb, "uid"))
        )
        got = global_row_number(
            df,
            "k",
            [F.col("k"), tb, F.col("uid")],
            rn_col="rn",
            buckets=8,
            tiebreak="w",
            tiebreak_ascending=asc,
        )
        assert _pairs(ref, "uid", "rn") == _pairs(got, "uid", "rn"), (
            f"seed={seed} asc={asc}"
        )

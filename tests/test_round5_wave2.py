"""Round-5 wave-2 operator properties: distribution tests against
pure-python references, PSI null-case, MI planted-signal recovery,
Z-order bijectivity, and the quantile-sketch error guarantee."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_caltopo_spark.io import load_table
from etl_caltopo_spark.queries import REGISTRY


def _two_sample_rows(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("A", "R")
    )
    rows = li.select(
        F.round("l_quantity").cast("bigint").alias("x"), "l_returnflag"
    ).collect()
    xs_a = sorted(r["x"] for r in rows if r["l_returnflag"] == "A")
    xs_b = sorted(r["x"] for r in rows if r["l_returnflag"] == "R")
    return xs_a, xs_b


def _python_ks(xs_a, xs_b):
    import bisect

    grid = sorted(set(xs_a) | set(xs_b))
    na, nb = len(xs_a), len(xs_b)
    return max(
        abs(bisect.bisect_right(xs_a, g) / na - bisect.bisect_right(xs_b, g) / nb)
        for g in grid
    )


def _python_mann_whitney_u1(xs_a, xs_b):
    """U for group A via midranks over the pooled sample."""
    pooled = sorted(xs_a + xs_b)
    # midrank of value v = (first_idx + last_idx) / 2 + 1
    import bisect

    def midrank(v):
        lo = bisect.bisect_left(pooled, v)
        hi = bisect.bisect_right(pooled, v) - 1
        return (lo + hi) / 2 + 1

    r1 = sum(midrank(v) for v in xs_a)
    n1 = len(xs_a)
    return r1 - n1 * (n1 + 1) / 2


def test_ks_and_u_match_python_reference(spark, sf_dir):
    xs_a, xs_b = _two_sample_rows(spark, sf_dir)

    got = REGISTRY["q_ks_test"].fn(spark, sf_dir).collect()[0]
    want = _python_ks(xs_a, xs_b)
    assert got["n_a"] == len(xs_a) and got["n_b"] == len(xs_b)
    assert abs(got["ks_d"] - want) < 2e-6, (got["ks_d"], want)

    got_u = REGISTRY["q_mann_whitney"].fn(spark, sf_dir).collect()[0]
    want_u1 = _python_mann_whitney_u1(xs_a, xs_b)
    assert got_u["u1"] == want_u1, (got_u["u1"], want_u1)
    assert got_u["u1"] + got_u["u2"] == len(xs_a) * len(xs_b)


def test_psi_zero_on_identical_splits(spark, tmp_path):
    """PSI of two identical length distributions is exactly 0: with
    c0 == c1 and T0 == T1 every smoothed term cancels."""
    rows = [(2 * i + par, 100 + (i % 7) * 60) for i in range(50) for par in (0, 1)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    path = str(tmp_path / "psi")
    df.write.mode("overwrite").parquet(path + "/documents.parquet")
    out = REGISTRY["q_psi_drift"].fn(spark, path).collect()[0]
    assert out["n_ref"] == out["n_cur"] == 50
    assert out["psi"] == 0.0, out


def test_psi_matches_python_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    rows = docs.collect()
    from collections import Counter

    c0 = Counter(r["n_chars"] // 50 for r in rows if r["doc_id"] % 2 == 0)
    c1 = Counter(r["n_chars"] // 50 for r in rows if r["doc_id"] % 2 == 1)
    buckets = set(c0) | set(c1)
    b = len(buckets)
    t0, t1 = sum(c0.values()), sum(c1.values())
    psi = sum(
        ((c0[k] + 1) / (t0 + b) - (c1[k] + 1) / (t1 + b))
        * math.log(((c0[k] + 1) * (t1 + b)) / ((c1[k] + 1) * (t0 + b)))
        for k in buckets
    )
    got = REGISTRY["q_psi_drift"].fn(spark, sf_dir).collect()[0]
    assert abs(got["psi"] - psi) < 2e-6, (got["psi"], psi)


def test_mutual_info_recovers_planted_class_token(spark, tmp_path):
    """A token that appears in every doc of one language and nowhere
    else carries maximal MI with the class — it must rank first."""
    rows = []
    for i in range(30):
        lang = "aa" if i % 2 == 0 else "bb"
        text = "common words here " + ("marker" if lang == "aa" else "filler")
        rows.append((i, text, lang))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    path = str(tmp_path / "mi")
    df.write.mode("overwrite").parquet(path + "/documents.parquet")
    out = REGISTRY["q_mutual_info"].fn(spark, path).collect()
    # 'marker' and 'filler' are both perfect class indicators; the
    # shared tokens carry zero MI.  Tie-break is lexicographic.
    assert out[0]["token"] == "filler" and out[1]["token"] == "marker"
    assert out[0]["mi"] == out[1]["mi"] > 0.6  # ln 2 - eps
    shared = {r["token"]: r["mi"] for r in out if r["token"] in ("common", "words")}
    assert all(v == 0.0 for v in shared.values())


def test_seq_support_matches_python_reference(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    rows = ev.collect()
    firsts: dict = {}
    users = set()
    for r in rows:
        users.add(r["user_id"])
        k = (r["user_id"], r["event_type"])
        if k not in firsts or r["ts"] < firsts[k]:
            firsts[k] = r["ts"]
    from collections import Counter

    want: Counter = Counter()
    by_user: dict = {}
    for (u, t), ts in firsts.items():
        by_user.setdefault(u, []).append((t, ts))
    for u, tl in by_user.items():
        for ta, tsa in tl:
            for tb, tsb in tl:
                if ta != tb and tsa < tsb:
                    want[(ta, tb)] += 1
    got = {
        (r["type_a"], r["type_b"]): (r["n"], r["support"])
        for r in REGISTRY["q_seq_support"].fn(spark, sf_dir).collect()
    }
    assert {k: v[0] for k, v in got.items()} == dict(want)
    for k, (n, sup) in got.items():
        assert abs(sup - n / len(users)) < 2e-6


def test_zorder_key_is_bijective_interleave(spark, sf_dir):
    """De-interleaving the Morton key recovers (x, y) exactly — the
    key is a bijection, so sorting by it is a lossless layout."""
    out = REGISTRY["q_zorder_key"].fn(spark, sf_dir).collect()
    assert out
    for r in out[:500]:
        x = y = 0
        for i in range(16):
            x |= ((r["zkey"] >> (2 * i)) & 1) << i
            y |= ((r["zkey"] >> (2 * i + 1)) & 1) << i
        assert (x, y) == (r["x"], r["y"])
        assert r["z_bucket"] == r["zkey"] >> 24


def test_quantile_sketch_error_bound(spark, sf_dir):
    """The histogram estimate must sit at or above the exact quantile
    and within the published one-bin error bound."""
    vals = sorted(
        r["l_extendedprice"]
        for r in load_table(spark, sf_dir, "lineitem")
        .select("l_extendedprice")
        .collect()
    )
    got = REGISTRY["q_quantile_sketch_portable"].fn(spark, sf_dir).collect()[0]
    n = got["n"]
    assert n == len(vals)
    for q, col in ((0.5, "p50_est"), (0.9, "p90_est"), (0.99, "p99_est")):
        exact = vals[math.ceil(q * n) - 1]
        est = got[col]
        assert exact <= est + 1e-6, (q, exact, est)
        # floor of est loses <=1e-6; allow that on top of the bin width
        assert est - exact <= got["max_err"] + 2e-6, (q, exact, est)


def test_dp_histogram_noise_is_bounded_and_deterministic(spark, sf_dir):
    a = {
        r["bucket"]: r["noisy_count"]
        for r in REGISTRY["q_dp_histogram"].fn(spark, sf_dir).collect()
    }
    b = {
        r["bucket"]: r["noisy_count"]
        for r in REGISTRY["q_dp_histogram"].fn(spark, sf_dir).collect()
    }
    assert a == b and a  # replayable release
    raw = {
        r["bucket"]: r["n"]
        for r in REGISTRY["q_dp_histogram"].fn(spark, sf_dir).collect()
    }
    for k, noisy in a.items():
        # Laplace(1) inverse-CDF of a (0,1) draw stays within ~22
        assert abs(noisy - raw[k]) < 25, (k, noisy, raw[k])


def test_graph_2hop_matches_python_reference(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    rows = li.collect()
    from collections import defaultdict

    by_order = defaultdict(set)
    for r in rows:
        by_order[r["l_orderkey"]].add(r["l_partkey"])
    adj = defaultdict(set)
    for parts in by_order.values():
        for p in parts:
            for q in parts:
                if p != q:
                    adj[p].add(q)
    cap_ok = {p for p, nb in adj.items() if len(nb) <= 128}
    want = {}
    for a, nbs in adj.items():
        two = set()
        for m in nbs:
            if m in cap_ok:
                two |= adj[m]
        two.discard(a)
        two -= nbs
        if two:
            want[a] = len(two)
    got = {
        r["part"]: r["n_2hop"]
        for r in REGISTRY["q_graph_2hop"].fn(spark, sf_dir).collect()
    }
    assert got == want


def test_mrr_and_ndcg_match_python_reference(spark, sf_dir):
    """q_mrr / q_ndcg must agree (to their 6-dp floors) with direct
    pure-python computations on the same rows — pinning the ranking,
    tie-break, and normalization algebra."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "value"
    )
    rows = ev.collect()
    from collections import defaultdict

    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r)
    rr_sum = 0.0
    ndcg_sum = 0.0
    n_hit = 0
    for u, evs in by_user.items():
        ranked = sorted(evs, key=lambda r: (-r["value"], r["event_id"]))
        rels = [1 if r["event_type"] == "purchase" else 0 for r in ranked]
        first = next((i + 1 for i, x in enumerate(rels) if x), None)
        if first is not None:
            rr_sum += 1.0 / first
            n_hit += 1
        dcg = sum(x / math.log2(i + 2) for i, x in enumerate(rels[:10]))
        k = min(sum(rels), 10)
        idcg = sum(1.0 / math.log2(i + 2) for i in range(k))
        ndcg_sum += dcg / idcg if k else 0.0
    n = len(by_user)
    got_m = REGISTRY["q_mrr"].fn(spark, sf_dir).collect()[0]
    assert got_m["n_users"] == n and got_m["n_hit"] == n_hit
    assert abs(got_m["mrr"] - rr_sum / n) < 2e-6
    got_n = REGISTRY["q_ndcg"].fn(spark, sf_dir).collect()[0]
    assert got_n["n_users"] == n
    assert abs(got_n["mean_ndcg"] - ndcg_sum / n) < 2e-6


def test_hll_merge_equals_global_sketch(spark, sf_dir):
    """Register-wise max of the per-type partial sketches must equal
    the global sketch — mergeability is the graded claim."""
    merged = {
        r["scope"]: r["estimate"]
        for r in REGISTRY["q_hll_merge_portable"].fn(spark, sf_dir).collect()
    }
    global_est = {
        r["estimate"]
        for r in REGISTRY["q_hll_portable"].fn(spark, sf_dir).collect()
    }
    assert len(global_est) == 1
    assert merged["__merged__"] == global_est.pop()


def test_grouped_quantile_sketch_error_bound(spark, sf_dir):
    """Per-group estimates obey the same at-or-above + one-bin-width
    guarantee as the global sketch."""
    rows = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    ).collect()
    from collections import defaultdict

    by_flag = defaultdict(list)
    for r in rows:
        by_flag[r["l_returnflag"]].append(r["l_extendedprice"])
    got = {
        r["flag"]: r
        for r in REGISTRY["q_quantile_sketch_grouped"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(by_flag)
    for flag, vals in by_flag.items():
        vals.sort()
        g = got[flag]
        assert g["n"] == len(vals)
        for q, col in ((0.5, "p50_est"), (0.9, "p90_est"), (0.99, "p99_est")):
            exact = vals[math.ceil(q * len(vals)) - 1]
            assert exact <= g[col] + 1e-6
            assert g[col] - exact <= g["max_err"] + 2e-6


def test_f1_macro_on_planted_markers(spark, tmp_path):
    """The synthetic corpus never triggers a language marker, so plant
    docs that DO (and one cross-language confusion) and check the
    confusion algebra against hand-computed tp/fp/fn."""
    rows = [
        (0, "der zug faehrt und haelt nicht", "de"),   # de -> de (tp)
        (1, "le chat et la souris", "fr"),              # fr -> fr (tp)
        (2, "el perro y los gatos", "es"),              # es -> es (tp)
        (3, "plain english words only", "en"),          # en -> en (tp)
        (4, "der words in an english doc", "en"),       # en -> de (fp for de)
        (5, "no markers here either", "fr"),            # fr -> en (fn for fr)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    path = str(tmp_path / "f1")
    df.write.mode("overwrite").parquet(path + "/documents.parquet")
    got = {
        r["lang_class"]: (r["tp"], r["fp"], r["fn"], r["f1"])
        for r in REGISTRY["q_f1_macro"].fn(spark, path).collect()
    }
    assert got["de"][:3] == (1, 1, 0)
    assert abs(got["de"][3] - 2 / 3) < 2e-6  # f1 = 2tp/(2tp+fp+fn)
    assert got["fr"][:3] == (1, 0, 1)
    assert got["es"][:3] == (1, 0, 0) and got["es"][3] == 1.0
    assert got["en"][:3] == (1, 1, 1)
    assert got["__macro__"][0] == 4  # micro tp total
    per = [got[c][3] for c in ("de", "fr", "es", "en")]
    assert abs(got["__macro__"][3] - sum(per) / 4) < 2e-6


def test_bloom_prefilter_equals_plain_join(spark, sf_dir):
    """The bloom-prefiltered aggregate must equal the plain join — no
    false negatives by construction, false positives removed by the
    real join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    plain = {
        (r["o_orderpriority"], r["n_items"], r["revenue"])
        for r in li.join(
            orders, li["l_orderkey"] == orders["o_orderkey"]
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
        )
        .collect()
    }
    got = {
        (r["o_orderpriority"], r["n_items"], r["revenue"])
        for r in REGISTRY["q_join_bloom_prefilter"].fn(spark, sf_dir).collect()
    }
    assert got == plain and got


def _write_lineitem(spark, tmp_path, rows, name):
    df = spark.createDataFrame(
        rows, "l_quantity double, l_returnflag string, l_extendedprice double"
    )
    path = str(tmp_path / name)
    df.write.mode("overwrite").parquet(path + "/lineitem.parquet")
    return path


def test_ks_disjoint_supports_is_one(spark, tmp_path):
    """Two samples with disjoint supports have KS D = 1 exactly."""
    rows = [(float(q), "A", 10.0) for q in (1, 2, 3)] * 5 + [
        (float(q), "R", 10.0) for q in (10, 11)
    ] * 5
    path = _write_lineitem(spark, tmp_path, rows, "ks1")
    out = REGISTRY["q_ks_test"].fn(spark, path).collect()[0]
    assert out["ks_d"] == 1.0


def test_ks_identical_samples_is_zero(spark, tmp_path):
    rows = [(float(q), f, 10.0) for q in (1, 2, 3, 4) for f in ("A", "R")]
    path = _write_lineitem(spark, tmp_path, rows, "ks0")
    out = REGISTRY["q_ks_test"].fn(spark, path).collect()[0]
    assert out["ks_d"] == 0.0


def test_mann_whitney_all_ties_gives_half(spark, tmp_path):
    """All observations equal → U1 = U2 = n1*n2/2 exactly (pure
    tie-midrank case)."""
    rows = [(5.0, "A", 1.0)] * 7 + [(5.0, "R", 1.0)] * 4
    path = _write_lineitem(spark, tmp_path, rows, "mw")
    out = REGISTRY["q_mann_whitney"].fn(spark, path).collect()[0]
    assert out["n1"] == 7 and out["n2"] == 4
    assert out["u1"] == out["u2"] == 7 * 4 / 2


def test_quantile_sketch_constant_column(spark, tmp_path):
    """Degenerate hi == lo: bin width 0.  The sketch must not crash
    and the estimates stay at the single value (or the id documents
    the rejection)."""
    rows = [(1.0, "A", 42.0)] * 10
    path = _write_lineitem(spark, tmp_path, rows, "qs")
    out = REGISTRY["q_quantile_sketch_portable"].fn(spark, path).collect()[0]
    # w = 0 -> (x-lo)/w is NaN -> least(NaN-floor, 127)... accept either
    # a clean 42.0 estimate or an explicit null, but never an exception
    for col in ("p50_est", "p90_est", "p99_est"):
        assert out[col] is None or abs(out[col] - 42.0) < 1e-6, out


def _python_daily_series(rows):
    from collections import Counter

    days = Counter()
    for r in rows:
        days[(r["ts"].date() - __import__("datetime").date(1970, 1, 1)).days] += 1
    d0, d1 = min(days), max(days)
    return [days.get(d, 0) for d in range(d0, d1 + 1)], d0


def test_autocorr_matches_python_reference(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("ts")
    series, _ = _python_daily_series(ev.collect())
    got = {
        r["lag"]: (r["n_pairs"], r["acf"])
        for r in REGISTRY["q_autocorr"].fn(spark, sf_dir).collect()
    }
    for k in range(1, 8):
        xs, ys = series[:-k], series[k:]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        num = sum((a - mx) * (b - my) for a, b in zip(xs, ys))
        den = (
            sum((a - mx) ** 2 for a in xs) * sum((b - my) ** 2 for b in ys)
        ) ** 0.5
        want = num / den if den else 0.0
        assert got[k][0] == n
        assert abs(got[k][1] - want) < 2e-6, (k, got[k][1], want)


def test_cusum_finds_planted_level_shift(spark, tmp_path):
    """A series that jumps from 5/day to 50/day on day 16 must peak
    its CUSUM at the boundary day (the last low day)."""
    import datetime

    t0 = datetime.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for d in range(30):
        per_day = 5 if d < 15 else 50
        for j in range(per_day):
            rows.append((eid, t0 + datetime.timedelta(days=d, seconds=j)))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp_ntz")
    path = str(tmp_path / "cusum")
    df.write.mode("overwrite").parquet(path + "/events.parquet")
    out = REGISTRY["q_cusum_changepoint"].fn(spark, path).collect()[0]
    assert out["t_days"] == 30
    base_day = (t0.date() - datetime.date(1970, 1, 1)).days
    assert out["peak_day"] == base_day + 14, out  # last low day
    # python reference for the scaled cusum numerator
    series = [5] * 15 + [50] * 15
    t, n = 30, sum(series)
    cum = 0
    best = 0
    for k, c in enumerate(series, start=1):
        cum += c
        best = max(best, abs(t * cum - k * n))
    assert out["cusum_peak_num"] == best


def test_privacy_audits_match_python_reference(spark, sf_dir):
    """k-anonymity class sizes and l-diversity distinct counts against
    direct pure-python counting."""
    from collections import Counter, defaultdict

    cust = load_table(spark, sf_dir, "customer").collect()
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    ).collect()

    sizes = Counter(
        (r["c_nationkey"], r["c_mktsegment"], math.floor(r["c_acctbal"] / 2000))
        for r in cust
    )
    got_k = {
        (r["nation"], r["segment"], r["bal_bucket"]): (
            r["group_size"], r["k_violation"]
        )
        for r in REGISTRY["q_k_anonymity"].fn(spark, sf_dir).collect()
    }
    assert {k: v[0] for k, v in got_k.items()} == dict(sizes)
    assert all(v[1] == (v[0] < 5) for v in got_k.values())

    # l-diversity partitions on the SAME equivalence classes as the
    # k-anonymity release audit (code-review r6 fix)
    quasi_of = {
        r["c_custkey"]: (
            r["c_nationkey"],
            r["c_mktsegment"],
            math.floor(r["c_acctbal"] / 2000),
        )
        for r in cust
    }
    sens = defaultdict(set)
    members = defaultdict(set)
    for r in orders:
        q = quasi_of.get(r["o_custkey"])
        if q is not None:
            sens[q].add(r["o_orderpriority"])
            members[q].add(r["o_custkey"])
    got_l = {
        (r["nation"], r["segment"], r["bal_bucket"]): (
            r["n_customers"], r["n_sensitive"], r["l_violation"]
        )
        for r in REGISTRY["q_l_diversity"].fn(spark, sf_dir).collect()
    }
    assert set(got_l) == set(sens)
    for q, (nc, ns, viol) in got_l.items():
        assert nc == len(members[q]) and ns == len(sens[q])
        assert viol == (ns < 3)


def test_geohash_matches_standard_bisection(spark, sf_dir):
    """The closed-form integer geohash must equal the textbook
    successive-bisection algorithm run on exact rationals — proving
    standard semantics, not just internal consistency."""
    from fractions import Fraction

    alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

    def bisect_geohash(lat, lon, length=8):
        lat_lo, lat_hi = Fraction(-90), Fraction(90)
        lon_lo, lon_hi = Fraction(-180), Fraction(180)
        bits = []
        even = True
        while len(bits) < length * 5:
            if even:
                mid = (lon_lo + lon_hi) / 2
                if lon >= mid:
                    bits.append(1)
                    lon_lo = mid
                else:
                    bits.append(0)
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if lat >= mid:
                    bits.append(1)
                    lat_lo = mid
                else:
                    bits.append(0)
                    lat_hi = mid
            even = not even
        out = []
        for t in range(length):
            idx = 0
            for b in bits[5 * t : 5 * t + 5]:
                idx = idx * 2 + b
            out.append(alphabet[idx])
        return "".join(out)

    rows = REGISTRY["q_geohash"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows[:300]:
        want = bisect_geohash(
            Fraction(r["lat_c"], 100), Fraction(r["lon_c"], 100)
        )
        assert r["geohash"] == want, (r["lat_c"], r["lon_c"], r["geohash"], want)


def test_pr_auc_and_log_loss_match_python_reference(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("value", "event_type")
    rows = [(r["value"], 1 if r["event_type"] == "click" else 0) for r in ev.collect()]

    # step-wise AP over descending distinct thresholds
    from collections import defaultdict

    by_score = defaultdict(lambda: [0, 0])
    for v, y in rows:
        by_score[v][y] += 1  # [neg, pos]
    p_total = sum(y for _, y in rows)
    ctp = cn = 0
    ap = 0.0
    for s in sorted(by_score, reverse=True):
        neg, pos = by_score[s]
        ctp += pos
        cn += pos + neg
        ap += (pos / p_total) * (ctp / cn)
    got = REGISTRY["q_pr_auc"].fn(spark, sf_dir).collect()[0]
    assert got["n_pos"] == p_total
    assert abs(got["pr_auc"] - ap) < 2e-6, (got["pr_auc"], ap)
    # AP of a random-ish scorer hovers near the positive rate
    assert 0.0 < got["pr_auc"] < 1.0

    def _p(v):
        return min(max((v + 1) / 1024.0, 1.0 / 1024), 1023.0 / 1024)

    ll = -sum(
        math.log(_p(v)) if y else math.log(1 - _p(v)) for v, y in rows
    ) / len(rows)
    got_ll = REGISTRY["q_log_loss"].fn(spark, sf_dir).collect()[0]
    assert got_ll["n"] == len(rows)
    assert abs(got_ll["log_loss"] - ll) < 2e-4, (got_ll["log_loss"], ll)


def test_lift_deciles_invariants_and_python_reference(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("value", "event_type")
    rows = [(r["value"], 1 if r["event_type"] == "click" else 0) for r in ev.collect()]
    n, p = len(rows), sum(y for _, y in rows)

    from collections import defaultdict

    by_score = defaultdict(lambda: [0, 0])  # [count, pos]
    for v, y in rows:
        by_score[v][0] += 1
        by_score[v][1] += y
    want = defaultdict(lambda: [0, 0])
    cum_n = 0
    for s in sorted(by_score, reverse=True):
        ng, ps = by_score[s]
        d = cum_n * 10 // n
        want[d][0] += ng
        want[d][1] += ps
        cum_n += ng
    got = {
        r["decile"]: r
        for r in REGISTRY["q_lift_deciles"].fn(spark, sf_dir).collect()
    }
    assert {k: (v["n_rows"], v["n_pos"]) for k, v in got.items()} == {
        k: tuple(v) for k, v in want.items()
    }
    assert sum(v["n_rows"] for v in got.values()) == n
    assert sum(v["n_pos"] for v in got.values()) == p
    # cumulative gain reaches 1 at the last decile; lift is rate ratio
    last = got[max(got)]
    assert abs(last["cum_gain"] - 1.0) < 2e-6
    for v in got.values():
        assert abs(v["lift"] - (v["n_pos"] / v["n_rows"]) / (p / n)) < 2e-6


def test_graph_2hop_sketch_estimates_ball_size(spark, sf_dir):
    """q_graph_2hop_sketch estimates |ball_2(a)| (distinct nodes within
    <=2 hops, self re-entering via back-paths) with 64-register HLL
    accuracy: every estimate within a per-node band and the median
    relative error well inside the published 1.04/sqrt(64) = 13%
    sigma.  Also pins the register semantics (n_buckets <= 64)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    rows = li.collect()
    from collections import defaultdict

    by_order = defaultdict(set)
    for r in rows:
        by_order[r["l_orderkey"]].add(r["l_partkey"])
    adj = defaultdict(set)
    for parts in by_order.values():
        for p in parts:
            for q in parts:
                if p != q:
                    adj[p].add(q)
    true_ball = {}
    for a, nbs in adj.items():
        ball = set(nbs)
        for m in nbs:
            ball |= adj[m]  # includes a itself via back-path a->m->a
        true_ball[a] = len(ball)
    got = {
        r["part"]: (r["n_buckets"], r["est_reach2"])
        for r in REGISTRY["q_graph_2hop_sketch"].fn(spark, sf_dir).collect()
    }
    assert set(got) == set(true_ball)
    rel_errs = []
    for a, true_n in true_ball.items():
        nz, est = got[a]
        assert 1 <= nz <= 64
        assert est > 0
        # individual m=64 HLL estimates stay within ~3 sigma (40%)
        assert 0.5 * true_n <= est <= 2.0 * true_n + 5, (a, true_n, est)
        rel_errs.append(abs(est - true_n) / true_n)
    rel_errs.sort()
    assert rel_errs[len(rel_errs) // 2] < 0.15, rel_errs[len(rel_errs) // 2]


def test_graph_2hop_sketch_sparse_graph(spark, tmp_path):
    """Sparse-ball regression (code-review r6 finding): the HLL
    harmonic denominator must count EMPTY registers at 2^0 = 1 each.
    Before the fix, a 3-node ball read raw = alpha*m^2/s ~ 3319 (>
    the 2.5m linear-counting gate), returning a ~1000x overestimate;
    correct small-range handling gives ~|ball| via linear counting.
    Built on a tiny synthetic co-purchase graph: two disjoint orders
    of 3 and 4 parts -> every ball is its own clique (sizes 3, 4)."""
    import pandas as pd

    rows = []
    for ok, parts in ((1, [101, 102, 103]), (2, [201, 202, 203, 204])):
        rows += [(ok, p) for p in parts]
    pdf = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    sf = str(tmp_path / "sparse")
    spark.createDataFrame(pdf).coalesce(1).write.parquet(f"{sf}/lineitem.parquet")
    got = {
        r["part"]: (r["n_buckets"], r["est_reach2"])
        for r in REGISTRY["q_graph_2hop_sketch"].fn(spark, sf).collect()
    }
    assert set(got) == {101, 102, 103, 201, 202, 203, 204}
    for part, (nz, est) in got.items():
        true_n = 3 if part < 200 else 4
        # linear counting at nz << 64 is near-exact; allow hash
        # collisions one register short
        assert nz <= true_n
        assert 0.5 * true_n <= est <= 2.0 * true_n, (part, nz, est)

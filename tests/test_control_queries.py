"""Round-6 statistical-control batch (X263-X268) vs independent
pure-Python references — same discipline as test_encoding_queries.py."""

from __future__ import annotations

import collections
import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from data_engineering_1_spark.io import load_table
from data_engineering_1_spark.plans import registry


def _q(name, spark, sf_dir):
    return registry.get_queries()[name](spark, sf_dir).toPandas()


def _r9(x):
    return float(
        Decimal(repr(x)).quantize(Decimal("1e-9"), rounding=ROUND_HALF_UP)
    )


# ---- X263 winnowing_fingerprints ----------------------------------------


def _winnow(text, k=8, w=4):
    t = text.lower()
    hs = [
        int(hashlib.md5(t[i : i + k].encode()).hexdigest()[:8], 16)
        for i in range(len(t) - k + 1)
    ]
    sel = set()
    for i, h in enumerate(hs):
        if h == min(hs[max(0, i - w + 1) : i + 1]):
            sel.add(h)
    return sel


def test_winnowing_matches_pure_python(spark, sf_dir):
    out = _q("winnowing_fingerprints", spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").toPandas()
    fps = {r.doc_id: _winnow(r.text) for r in docs.itertuples()}
    # r8 boilerplate/skew cutoff (dual threshold): drop fingerprints
    # present in > 5% of docs OR > 250 docs absolute, BEFORE sizes/pairs
    n_docs = len(docs)
    df_count = collections.Counter(h for s in fps.values() for h in s)
    hot = {
        h
        for h, df in df_count.items()
        if df * 100 > n_docs * 5 or df > 250
    }
    fps = {d: {h for h in s if h not in hot} for d, s in fps.items()}
    pairs = {}
    by_hash = collections.defaultdict(list)
    for d, s in fps.items():
        for h in s:
            by_hash[h].append(d)
    for h, ds in by_hash.items():
        ds = sorted(ds)
        for i, a in enumerate(ds):
            for b in ds[i + 1 :]:
                pairs[(a, b)] = pairs.get((a, b), 0) + 1
    top = sorted(pairs, key=lambda p: (-pairs[p], p))[:30]
    assert list(zip(out.doc_a, out.doc_b)) == top
    for r in out.itertuples():
        assert int(r.shared) == pairs[(r.doc_a, r.doc_b)]
        assert int(r.nfp_a) == len(fps[r.doc_a])
        assert int(r.nfp_b) == len(fps[r.doc_b])
        assert math.isclose(
            r.containment,
            round(r.shared / min(r.nfp_a, r.nfp_b), 6),
            abs_tol=1e-9,
        )
    # the winnowing guarantee direction that matters here: a selected
    # fingerprint set is a SUBSET of the k-gram hashes (local, not
    # global minima over the doc)
    d0 = docs.iloc[0]
    t = d0.text.lower()
    all_h = {
        int(hashlib.md5(t[i : i + 8].encode()).hexdigest()[:8], 16)
        for i in range(len(t) - 7)
    }
    assert fps[d0.doc_id] <= all_h
    # and it genuinely thins: |selected| < |positions|
    assert len(fps[d0.doc_id]) < len(t) - 7


# ---- X264 neyman_allocation ------------------------------------------------


def test_neyman_allocation_conserves_budget(spark, sf_dir):
    out = _q("neyman_allocation", spark, sf_dir)
    o = load_table(spark, sf_dir, "orders").toPandas()
    c = load_table(spark, sf_dir, "customer").toPandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = (j.o_totalprice * 100).round().astype(int)
    nsig = {}
    for seg, g in j.groupby("c_mktsegment"):
        n = len(g)
        s1 = int(g.cents.sum())
        s2 = sum(int(v) ** 2 for v in g.cents)
        nsig[seg] = (n, round(math.sqrt(n * s2 - s1 * s1) / 100, 6))
    total = sum(v[1] for v in nsig.values())
    w9 = {s: _r9(v[1] / total) for s, v in nsig.items()}
    base = {s: int(Decimal(repr(w9[s])) * 1000 // 1) for s in w9}
    rem = 1000 - sum(base.values())
    fracs = sorted(
        w9,
        key=lambda s: (-(Decimal(repr(w9[s])) * 1000 % 1), s),
    )
    alloc = dict(base)
    for s in fracs[:rem]:
        alloc[s] += 1
    assert int(out.alloc.sum()) == 1000  # exact conservation
    for r in out.itertuples():
        n, ns6 = nsig[r.segment]
        assert int(r.n_rows) == n
        assert math.isclose(r.sigma, round(ns6 / n, 6), abs_tol=1e-6)
        assert math.isclose(r.weight, w9[r.segment], abs_tol=1e-9)
        assert int(r.alloc) == alloc[r.segment]


# ---- X265 ucb1_event_types ----------------------------------------------------


def test_ucb1_matches_formula_and_flags_argmax(spark, sf_dir):
    out = _q("ucb1_event_types", spark, sf_dir)
    e = load_table(spark, sf_dir, "events").toPandas()
    big_n = len(e)
    scores = {}
    for t, g in e.groupby("event_type"):
        n = len(g)
        wins = int((g.value >= 50).sum())
        m9 = _r9(wins / n)
        b9 = _r9(math.sqrt(2 * math.log(big_n) / n))
        scores[t] = (n, wins, m9, b9)
    best = max(scores, key=lambda t: scores[t][2] + scores[t][3])
    for r in out.itertuples():
        n, wins, m9, b9 = scores[r.event_type]
        assert (int(r.n), int(r.wins)) == (n, wins)
        assert math.isclose(r.mean_reward, m9, abs_tol=1e-9)
        assert math.isclose(r.explore_bonus, b9, abs_tol=1e-9)
        assert math.isclose(r.ucb, round(m9 + b9, 6), abs_tol=1e-6)
        assert bool(r.pull_next) == (r.event_type == best)
    assert out.pull_next.sum() == 1


# ---- X266 anova_dow_events -------------------------------------------------------


def test_anova_matches_textbook_decomposition(spark, sf_dir):
    out = _q("anova_dow_events", spark, sf_dir).set_index("event_type")
    e = load_table(spark, sf_dir, "events").toPandas()
    e["day"] = pd.to_datetime(e.ts).dt.normalize()
    for t, g in e.groupby("event_type"):
        daily = g.groupby("day").size()
        dows = (
            daily.index - pd.Timestamp("1970-01-01")
        ).days.values % 7
        n = len(daily)
        s1 = int(daily.sum())
        s2 = sum(int(v) ** 2 for v in daily)
        # the exact staged rounding both engines apply per dow cell
        t6 = sum(
            (
                Decimal(repr(round(int(daily.values[dows == d].sum()) ** 2
                                   / int((dows == d).sum()), 6)))
                for d in range(7)
                if (dows == d).any()
            ),
            Decimal(0),
        )
        r6 = Decimal(repr(round(s1 * s1 / n, 6)))
        r = out.loc[t]
        eta2 = float(t6 - r6) / float(Decimal(s2) - r6)
        f = float((t6 - r6) * (n - 7)) / float((Decimal(s2) - t6) * 6)
        assert int(r.n) == n
        assert math.isclose(r.eta2, round(eta2, 6), abs_tol=1e-6)
        assert math.isclose(r.f_stat, round(f, 6), abs_tol=1e-6)
        assert bool(r.seasonal_5pct) == (
            (t6 - r6) * (n - 7) * 10 >= (Decimal(s2) - t6) * 6 * 21
        )
        # eta2 is a variance share
        assert -1e-9 <= r.eta2 <= 1


# ---- X267 ewma_control_chart --------------------------------------------------------


def test_control_chart_matches_literal_recursion(spark, sf_dir):
    out = _q("ewma_control_chart", spark, sf_dir)
    e = load_table(spark, sf_dir, "events").toPandas()
    e["day"] = pd.to_datetime(e.ts).dt.normalize()
    flagged = 0
    for t, g in e.groupby("event_type"):
        daily = g.groupby("day").size().sort_index()
        n = len(daily)
        s1 = int(daily.sum())
        s2 = sum(int(v) ** 2 for v in daily)
        mu9 = _r9(s1 / n)
        sigma = math.sqrt(n * s2 - s1 * s1) / n
        sub = out[out.event_type == t].reset_index(drop=True)
        assert len(sub) == n
        vals = [float(v) for v in daily]
        for i, r in enumerate(sub.itertuples()):
            xs = vals[max(0, i - 50) : i + 1]
            acc = xs[0]
            for x in xs[1:]:
                acc = acc * 0.5 + x * 0.5
            lim9 = _r9(
                3 * sigma * math.sqrt((1 - 0.25 ** (i + 1)) / 3)
            )
            assert math.isclose(r.ewma, round(acc, 6), abs_tol=1e-6)
            assert math.isclose(r.center, mu9, abs_tol=1e-9)
            assert math.isclose(
                r.ucl, round(mu9 + lim9, 6), abs_tol=1e-6
            )
            assert math.isclose(
                r.lcl, round(mu9 - lim9, 6), abs_tol=1e-6
            )
            expect_flag = round(abs(acc - mu9) - lim9, 9) > 0
            assert bool(r.out_of_control) == expect_flag
            flagged += expect_flag
    # limits start NARROW (startup correction) — t=1 limit is
    # strictly below the steady-state limit
    first = out.groupby("event_type").head(1)
    steady = out.groupby("event_type").tail(1)
    assert (
        first.sort_values("event_type").ucl.values
        < steady.sort_values("event_type").ucl.values + 1e-12
    ).all()


# ---- X268 median_ci_orders -------------------------------------------------------------


def test_median_ci_matches_order_statistics(spark, sf_dir):
    out = _q("median_ci_orders", spark, sf_dir).set_index("segment")
    o = load_table(spark, sf_dir, "orders").toPandas()
    c = load_table(spark, sf_dir, "customer").toPandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = (j.o_totalprice * 100).round().astype(int)
    for seg, g in j.groupby("c_mktsegment"):
        xs = sorted(g.cents)
        n = len(xs)
        mlo, mhi = (n - 1) // 2, min((n - 1) // 2 + 1, n - 1)
        med = (xs[mlo] + ((n - 1) % 2) / 2 * (xs[mhi] - xs[mlo])) / 100
        cc = math.ceil(_r9(0.98 * math.sqrt(n)))
        lo = xs[max(0, mlo - cc)]
        hi = xs[min(n - 1, n // 2 + cc)]
        r = out.loc[seg]
        assert int(r.n) == n
        assert math.isclose(
            r.median_dollars, round(med * 100, 6) / 100, abs_tol=1e-6
        )
        assert int(r.ci_lo_cents) == lo
        assert int(r.ci_hi_cents) == hi
        assert int(r.rank_offset) == cc
        # the interval brackets the median
        assert lo <= med * 100 <= hi

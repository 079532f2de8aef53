"""Round-6 cohort/lifecycle batch (X139-X143) vs independent
pure-Python/numpy/pandas references — same discipline as
test_quality_queries.py."""

from __future__ import annotations

import collections
import math

import numpy as np
import pandas as pd

from data_engineering_1_spark.io import load_table
from data_engineering_1_spark.plans import registry


def _q(name, spark, sf_dir):
    return registry.get_queries()[name](spark, sf_dir).toPandas()


# ---- X139 rfm_segmentation -------------------------------------------


def test_rfm_segments_match_pure_python(spark, sf_dir):
    out = _q("rfm_segmentation", spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders").toPandas()
    orders["day"] = orders.o_orderdate.dt.date
    ref = orders["day"].max()
    per_cust = orders.groupby("o_custkey").agg(
        last=("day", "max"),
        freq=("o_orderkey", "size"),
        mon=("o_totalprice", lambda s: int(round(
            sum(round(v * 100) for v in s)))),
    )
    per_cust["rec"] = [(ref - d).days for d in per_cust["last"]]
    qr = np.quantile(per_cust["rec"], [0.25, 0.5, 0.75])
    qf = np.quantile(per_cust["freq"], [0.25, 0.5, 0.75])
    qm = np.quantile(per_cust["mon"], [0.25, 0.5, 0.75])

    def binof(v, qs):
        return 1 + sum(v > q for q in qs)

    want = collections.defaultdict(lambda: [0, 0])
    for r in per_cust.itertuples():
        seg = binof(r.rec, qr) * 100 + binof(r.freq, qf) * 10 + binof(
            r.mon, qm
        )
        want[seg][0] += 1
        want[seg][1] += r.mon
    assert len(out) == len(want)
    for row in out.itertuples():
        n, cents = want[int(row.segment)]
        assert int(row.n_customers) == n
        assert math.isclose(row.total_monetary, cents / 100.0, abs_tol=1e-6)
    # all customers accounted for
    assert out["n_customers"].sum() == len(per_cust)
    # bins are in 1..4 -> segments in 111..444
    assert out["segment"].between(111, 444).all()


# ---- X140 kaplan_meier_signup_purchase -------------------------------


def test_kaplan_meier_matches_pure_python(spark, sf_dir):
    out = _q("kaplan_meier_signup_purchase", spark, sf_dir).sort_values(
        "dur_day"
    )
    ev = load_table(spark, sf_dir, "events").toPandas()
    study_end = ev.ts.max().date()
    durs = []
    for uid, g in ev.groupby("user_id"):
        s = g[g.event_type == "signup"].ts.min()
        if pd.isna(s):
            continue
        p = g[(g.event_type == "purchase") & (g.ts >= s)].ts.min()
        if pd.isna(p):
            durs.append(((study_end - s.date()).days, 0))
        else:
            durs.append(((p.date() - s.date()).days, 1))
    grid = collections.defaultdict(lambda: [0, 0])
    for d, obs in durs:
        grid[d][obs] += 1  # [censored, observed]
    days = sorted(grid)
    assert list(out["dur_day"]) == days
    at_risk = len(durs)
    surv = 1.0
    for day, row in zip(days, out.itertuples()):
        cen, obs = grid[day]
        assert int(row.n_risk) == at_risk
        assert int(row.n_events) == obs and int(row.n_censored) == cen
        surv *= 1.0 - obs / at_risk
        assert math.isclose(row.survival, surv, abs_tol=1e-6), day
        at_risk -= obs + cen
    # survival is non-increasing in [0, 1]
    s = out["survival"].to_numpy()
    assert (s[:-1] >= s[1:] - 1e-12).all() and (s >= 0).all() and (
        s <= 1
    ).all()


# ---- X141 quantile_normalize_doclen ----------------------------------


def test_quantile_normalization_matches_numpy(spark, sf_dir):
    out = _q("quantile_normalize_doclen", spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").toPandas()
    docs["n_tok"] = [len(t.strip().lower().split()) for t in docs.text]
    pooled = docs["n_tok"].to_numpy(np.float64)
    grid = np.quantile(pooled, np.array([i / 100 for i in range(101)]))
    for src, g in docs.groupby("source"):
        g = g.sort_values(["n_tok", "doc_id"]).reset_index()
        n = len(g)
        for rank, r in enumerate(g.itertuples()):
            pr = rank / (n - 1) if n > 1 else 0.0
            i = min(int(pr * 100), 99)
            frac = pr * 100 - i
            want = grid[i] * (1 - frac) + grid[i + 1] * frac
            got = out[out.doc_id == r.doc_id].iloc[0]
            assert math.isclose(got.norm_len, want, abs_tol=1e-5), r.doc_id
    # normalized lengths live inside the pooled range
    assert out["norm_len"].between(pooled.min(), pooled.max()).all()


# ---- X142 js_divergence_lang_pairs -----------------------------------


def test_js_divergence_matches_scipy_style_formula(spark, sf_dir):
    out = _q("js_divergence_lang_pairs", spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").toPandas()
    dists = {}
    for lang, g in docs.groupby("lang"):
        c = collections.Counter()
        for t in g.text:
            c.update(t.strip().lower().split())
        tot = sum(c.values())
        dists[lang] = {w: n / tot for w, n in c.items()}
    langs = sorted(dists)
    assert len(out) == len(langs) * (len(langs) - 1) // 2
    for row in out.itertuples():
        p, q = dists[row.lang_a], dists[row.lang_b]
        vocab = set(p) | set(q)
        jsd = 0.0
        for w in vocab:
            pw, qw = p.get(w, 0.0), q.get(w, 0.0)
            m = (pw + qw) / 2
            if pw > 0:
                jsd += 0.5 * pw * math.log(pw / m)
            if qw > 0:
                jsd += 0.5 * qw * math.log(qw / m)
        assert math.isclose(row.jsd, jsd, abs_tol=1e-5), (
            row.lang_a,
            row.lang_b,
        )
        assert 0.0 <= row.jsd <= math.log(2) + 1e-9


# ---- X143 dynamic_gap_sessions ---------------------------------------


def test_dynamic_sessions_match_interval_union_rewrite(spark, sf_dir):
    out = _q("dynamic_gap_sessions", spark, sf_dir)
    ev = load_table(spark, sf_dir, "events").toPandas()
    short = pd.Timedelta(hours=4)
    long = pd.Timedelta(hours=12)
    n_sessions = 0
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        sessions = []
        cur_end = None
        for r in g.itertuples():
            gap = short if r.event_type in ("click", "view") else long
            if cur_end is None or r.ts >= cur_end:
                sessions.append([r.ts, r.ts + gap, 1])
                cur_end = r.ts + gap
            else:
                sessions[-1][2] += 1
                cur_end = max(cur_end, r.ts + gap)
                sessions[-1][1] = cur_end
        n_sessions += len(sessions)
        got = out[out.user_id == uid].sort_values("session_start")
        assert len(got) == len(sessions), uid
        for (s, e, n), row in zip(sessions, got.itertuples()):
            assert pd.Timestamp(row.session_start) == s
            assert pd.Timestamp(row.session_end) == e
            assert int(row.n_events) == n
    assert len(out) == n_sessions
    # sessions of one user never overlap
    for uid, g in out.groupby("user_id"):
        g = g.sort_values("session_start")
        ends = g["session_end"].to_numpy()
        starts = g["session_start"].to_numpy()
        assert (ends[:-1] <= starts[1:]).all()

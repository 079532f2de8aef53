"""Round-6 statistical-profiling batch (X144-X148) vs independent
pure-Python/numpy references — same discipline as
test_cohort_queries.py."""

from __future__ import annotations

import collections
import math

import numpy as np
import pandas as pd

from data_engineering_1_spark.io import load_table
from data_engineering_1_spark.plans import registry


def _q(name, spark, sf_dir):
    return registry.get_queries()[name](spark, sf_dir).toPandas()


def _all_tokens(docs):
    for t in docs.text:
        yield from t.strip().lower().split()


# ---- X144 join_key_skew_audit ----------------------------------------


def test_skew_audit_matches_numpy(spark, sf_dir):
    out = _q("join_key_skew_audit", spark, sf_dir).set_index("key_name")
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    for key in ["l_orderkey", "l_partkey", "l_suppkey"]:
        c = li.groupby(key).size().to_numpy(np.int64)
        row = out.loc[key]
        assert int(row.n_rows) == len(li)
        assert int(row.n_keys) == len(c)
        assert int(row.max_key_rows) == c.max()
        assert math.isclose(
            row.p99_key_rows, np.quantile(c, 0.99), abs_tol=1e-6
        )
        assert math.isclose(row.top1_share, c.max() / len(li), abs_tol=1e-6)
        assert math.isclose(
            row.skew_ratio, c.max() / (len(li) / len(c)), abs_tol=1e-6
        )
    # orderkey repeats (multi-line orders) -> skew ratio above 1
    assert out.loc["l_orderkey"].skew_ratio > 1.0


# ---- X145 zipf_rank_frequency ----------------------------------------


def test_zipf_fit_matches_numpy_lstsq(spark, sf_dir):
    out = _q("zipf_rank_frequency", spark, sf_dir)
    assert len(out) == 1
    docs = load_table(spark, sf_dir, "documents").toPandas()
    cnt = collections.Counter(_all_tokens(docs))
    freqs = [
        f for _, f in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    ]
    lx = np.round(np.log(np.arange(1, len(freqs) + 1)), 9)
    ly = np.round(np.log(np.array(freqs, dtype=np.float64)), 9)
    slope, intercept = np.polyfit(lx, ly, 1)
    row = out.iloc[0]
    assert int(row.n_vocab) == len(freqs)
    assert math.isclose(row.zipf_slope, slope, abs_tol=1e-5)
    assert math.isclose(row.intercept, intercept, abs_tol=1e-4)
    # rank-frequency is non-increasing, so the fitted slope is <= 0
    assert row.zipf_slope <= 0


# ---- X146 vocab_growth_heaps -----------------------------------------


def test_vocab_growth_matches_pure_python_and_is_concave_ish(spark, sf_dir):
    out = _q("vocab_growth_heaps", spark, sf_dir).sort_values("bucket")
    docs = load_table(spark, sf_dir, "documents").toPandas()
    lo, hi = docs.doc_id.min(), docs.doc_id.max()
    span = hi - lo + 1
    first = {}
    for r in docs.sort_values("doc_id").itertuples():
        for w in r.text.strip().lower().split():
            first.setdefault(w, r.doc_id)
    tok_b = collections.Counter(
        int(100 * (d - lo) // span) for d in first.values()
    )
    doc_b = collections.Counter(
        int(100 * (d - lo) // span) for d in docs.doc_id
    )
    buckets = sorted(doc_b)
    assert list(out["bucket"]) == buckets
    dc = vc = 0
    for b, row in zip(buckets, out.itertuples()):
        dc += doc_b[b]
        vc += tok_b.get(b, 0)
        assert int(row.docs_cum) == dc and int(row.vocab_cum) == vc, b
    # growth curve ends at the full corpus and the full vocab
    assert dc == len(docs) and vc == len(first)
    # cumulative counts are monotone
    assert out["vocab_cum"].is_monotonic_increasing
    assert out["docs_cum"].is_monotonic_increasing


# ---- X147 markov_entropy_rate ----------------------------------------


def test_markov_entropy_matches_pure_python(spark, sf_dir):
    out = _q("markov_entropy_rate", spark, sf_dir)
    ev = load_table(spark, sf_dir, "events").toPandas()
    trans = collections.Counter()
    for _, g in ev.groupby("user_id"):
        seq = g.sort_values(["ts", "event_id"]).event_type.tolist()
        for a, b in zip(seq, seq[1:]):
            trans[(a, b)] += 1
    total = sum(trans.values())
    states = sorted({a for a, _ in trans})
    assert list(out["from_type"]) == states
    rate = 0.0
    for row in out.itertuples():
        outs = {b: n for (a, b), n in trans.items() if a == row.from_type}
        n_out = sum(outs.values())
        h = -sum(
            (n / n_out) * math.log(n / n_out) for n in outs.values()
        )
        assert int(row.n_out) == n_out
        assert math.isclose(row.pi, n_out / total, abs_tol=1e-6)
        assert math.isclose(row.h_cond, h, abs_tol=1e-6)
        assert 0.0 <= row.h_cond <= math.log(len(states)) + 1e-9
        rate += (n_out / total) * h
    # the chain's entropy rate (sum pi * h_cond) is reconstructible
    got_rate = float((out["pi"] * out["h_cond"]).sum())
    assert math.isclose(got_rate, rate, abs_tol=1e-4)


# ---- X148 lead_lag_xcorr ---------------------------------------------


def test_lead_lag_xcorr_matches_numpy(spark, sf_dir):
    out = _q("lead_lag_xcorr", spark, sf_dir).sort_values("lag")
    ev = load_table(spark, sf_dir, "events").toPandas()
    ev = ev[ev.event_type.isin(["click", "purchase"])].copy()
    ev["day"] = ev.ts.dt.date
    daily = (
        ev.pivot_table(
            index="day", columns="event_type", values="event_id",
            aggfunc="size", fill_value=0,
        )
        .sort_index()
    )
    days = {
        pd.Timestamp(d): i for i, d in enumerate(daily.index)
    }
    x = daily["click"].to_numpy(np.float64)
    y = daily["purchase"].to_numpy(np.float64)
    assert list(out["lag"]) == list(range(-7, 8))
    best = out[out.is_best]
    for row in out.itertuples():
        k = int(row.lag)
        # align x_d with y_{d+k} over days present at both ends
        idx = [
            (i, days[d + pd.Timedelta(days=k)])
            for d, i in days.items()
            if d + pd.Timedelta(days=k) in days
        ]
        xa = np.array([x[i] for i, _ in idx])
        ya = np.array([y[j] for _, j in idx])
        assert int(row.n_days) == len(idx)
        if len(idx) >= 2 and xa.std() > 0 and ya.std() > 0:
            want = np.corrcoef(xa, ya)[0, 1]
            assert math.isclose(row.xcorr, want, abs_tol=1e-5), k
    # exactly the max-xcorr rows are flagged
    mx = out["xcorr"].max()
    assert (best["xcorr"] == mx).all()
    assert len(best) >= 1

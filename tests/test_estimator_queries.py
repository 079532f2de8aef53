"""Round-6 estimator/meta-analytics batch (X191-X196) vs independent
pure-Python/numpy references — same discipline as
test_assurance_queries.py."""

from __future__ import annotations

import collections
import hashlib
import math

import numpy as np
import pandas as pd

from data_engineering_1_spark.io import load_table
from data_engineering_1_spark.plans import registry
from data_engineering_1_spark.plans.estimator_queries import (
    _CARD_JOINS,
    _CHURN_TOPK,
    _FP_BUCKETS,
    _KMV_K,
    _KMV_M,
    _RBO_K,
)


def _q(name, spark, sf_dir):
    return registry.get_queries()[name](spark, sf_dir).toPandas()


def _bridge(s: str, n: int = 8) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:n], 16)


# ---- X191 table_fingerprint_orders ------------------------------------


def test_fingerprint_matches_and_localizes_change(spark, sf_dir):
    out = _q("table_fingerprint_orders", spark, sf_dir).set_index(
        "bucket"
    )
    o = load_table(spark, sf_dir, "orders").toPandas()
    sums = collections.Counter()
    xors = collections.defaultdict(int)
    counts = collections.Counter()
    digests = {}
    for r in o.itertuples():
        cents = int(round(r.o_totalprice * 100))
        d = _bridge(
            f"fp|{r.o_orderkey}|{r.o_custkey}|{r.o_orderstatus}|"
            f"{cents}|{r.o_orderdate.date()}|{r.o_orderpriority}",
            15,
        )
        b = r.o_orderkey % _FP_BUCKETS
        sums[b] += d
        xors[b] ^= d
        counts[b] += 1
        digests[r.o_orderkey] = (b, d)
    for b in range(_FP_BUCKETS):
        row = out.loc[b]
        assert int(row.n_rows) == counts[b]
        assert int(row.digest_sum) == sums[b] % 2305843009213693951
        assert int(row.digest_xor) == xors[b]
    # the property the fingerprint exists for: changing ONE row flips
    # exactly one bucket's digests
    k0 = next(iter(digests))
    b0, d0 = digests[k0]
    sums2 = dict(sums)
    sums2[b0] = sums2[b0] - d0 + (d0 ^ 1)
    changed = [
        b
        for b in range(_FP_BUCKETS)
        if sums2[b] % 2305843009213693951 != int(out.loc[b].digest_sum)
    ]
    assert changed == [b0]


# ---- X192 rbo_retrieval_agreement -------------------------------------


def _qint(v: float, grid: int) -> int:
    x = float(v) * grid
    return int(math.floor(x + 0.5)) if x >= 0 else -int(
        math.floor(-x + 0.5)
    )


def test_rbo_matches_pure_python(spark, sf_dir):
    out = _q("rbo_retrieval_agreement", spark, sf_dir).iloc[0]
    emb = load_table(spark, sf_dir, "embeddings").toPandas()
    qv = emb[emb.vec_id == 0].embedding.iloc[0]
    rest = emb[emb.vec_id != 0]

    def rank(grid):
        dots = []
        qq = [_qint(v, grid) for v in qv]
        for r in rest.itertuples():
            d = sum(
                _qint(v, grid) * qq[i] for i, v in enumerate(r.embedding)
            )
            dots.append((r.vec_id, d))
        dots.sort(key=lambda t: (-t[1], t[0]))
        return {vid: i + 1 for i, (vid, _) in enumerate(dots[:_RBO_K])}

    fine, coarse = rank(1000000), rank(100)
    both = {
        v: max(fine[v], coarse[v]) for v in fine.keys() & coarse.keys()
    }
    rbo = 0.0
    for d in range(1, _RBO_K + 1):
        ov = sum(1 for mr in both.values() if mr <= d)
        rbo += round(ov / d * 0.5**d, 15)
    ov_k = sum(1 for mr in both.values() if mr <= _RBO_K)
    assert int(out.k) == _RBO_K
    assert int(out.overlap_at_k) == ov_k
    assert math.isclose(out.rbo_p50, round(rbo, 6), abs_tol=1e-6)
    assert 0.0 <= out.rbo_p50 <= 1.0
    # the two grids genuinely disagree somewhere (the metric has teeth)
    assert ov_k < _RBO_K or out.rbo_p50 < 1.0


# ---- X193 join_cardinality_audit --------------------------------------


def test_cardinality_audit_matches_pandas(spark, sf_dir):
    out = _q("join_cardinality_audit", spark, sf_dir).set_index(
        "join_expr"
    )
    for ta, ka, tb, kb in _CARD_JOINS:
        A = load_table(spark, sf_dir, ta).toPandas()
        B = load_table(spark, sf_dir, tb).toPandas()
        est = len(A) * len(B) / max(A[ka].nunique(), B[kb].nunique())
        actual = len(A.merge(B, left_on=ka, right_on=kb))
        row = out.loc[f"{ta}.{ka}={tb}.{kb}"]
        assert int(row.n_left) == len(A)
        assert int(row.n_right) == len(B)
        assert math.isclose(row.est_rows, round(est, 6), abs_tol=1e-4)
        assert int(row.actual_rows) == actual
        assert math.isclose(
            row.actual_over_est, round(actual / est, 6), abs_tol=1e-6
        )
    # FK joins: estimate should be in the right ballpark (within 2x)
    assert (out.actual_over_est > 0.4).all()
    assert (out.actual_over_est < 2.5).all()


# ---- X194 ols2_clicks_trend -------------------------------------------


def test_ols2_matches_numpy_lstsq(spark, sf_dir):
    out = _q("ols2_clicks_trend", spark, sf_dir).iloc[0]
    ev = load_table(spark, sf_dir, "events").toPandas()
    c = ev[ev.event_type == "click"]
    daily = c.groupby(c.ts.dt.normalize()).size()
    x1 = np.array(
        [(d - pd.Timestamp("1970-01-01")).days for d in daily.index],
        dtype=np.float64,
    )
    x2 = ((x1.astype(np.int64) + 4) % 7 >= 5).astype(np.float64)
    y = daily.values.astype(np.float64)
    X = np.column_stack([np.ones_like(x1), x1, x2])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert int(out.n_days) == len(daily)
    assert math.isclose(out.beta_intercept, beta[0], abs_tol=1e-4)
    assert math.isclose(out.beta_day, beta[1], abs_tol=1e-6)
    assert math.isclose(out.beta_weekend, beta[2], abs_tol=1e-4)


# ---- X195 kmv_distinct_users ------------------------------------------


def test_kmv_matches_pure_python(spark, sf_dir):
    out = _q("kmv_distinct_users", spark, sf_dir).set_index("event_type")
    ev = load_table(spark, sf_dir, "events").toPandas()
    for et, g in ev.groupby("event_type"):
        hashes = sorted({_bridge(f"kmv|{u}") for u in g.user_id})
        exact = g.user_id.nunique()
        kth = hashes[_KMV_K - 1]
        est = (_KMV_K - 1) * _KMV_M / kth
        row = out.loc[et]
        assert int(row.exact_distinct) == exact
        assert int(row.kth_hash) == kth
        assert math.isclose(row.kmv_estimate, round(est, 6), abs_tol=1e-4)
        assert math.isclose(
            row.rel_error,
            round(abs(est - exact) / exact, 6),
            abs_tol=1e-6,
        )
    # sketch is honest: error exists but is bounded for k=8 on these
    # cardinalities (KMV CV ~ 1/sqrt(k-2) ~ 0.41; 5 sigma margin)
    assert (out.rel_error < 2.1).all()


# ---- X196 leaderboard_churn_weekly ------------------------------------


def test_leaderboard_churn_matches_pandas(spark, sf_dir):
    out = _q("leaderboard_churn_weekly", spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    li["wk"] = (
        li.l_shipdate.dt.normalize()
        - pd.to_timedelta(li.l_shipdate.dt.weekday, unit="D")
    )
    weekly = (
        li.groupby(["wk", "l_partkey"])
        .l_quantity.sum()
        .astype(np.int64)
        .reset_index()
    )
    tops = {}
    for wk, g in weekly.groupby("wk"):
        g = g.sort_values(
            ["l_quantity", "l_partkey"], ascending=[False, True]
        )
        tops[wk] = set(g.l_partkey.head(_CHURN_TOPK))
    weeks = sorted(tops)
    want = {}
    for prev, cur in zip(weeks, weeks[1:]):
        want[cur] = len(tops[cur] & tops[prev])
    assert len(out) == len(want)
    for r in out.itertuples():
        wk = pd.Timestamp(r.wk)
        assert int(r.n_common) == want[wk], wk
        assert int(r.n_churned) == _CHURN_TOPK - want[wk]
        assert math.isclose(
            r.churn_rate, round(1 - want[wk] / _CHURN_TOPK, 6),
            abs_tol=1e-9,
        )
    # churn is non-degenerate: some weeks turn over, some retain
    assert out.n_common.max() > 0 and out.n_churned.max() > 0

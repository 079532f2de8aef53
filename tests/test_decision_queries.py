"""Round-6 decision-science batch (X221-X226) vs independent
pure-Python/numpy references — same discipline as
test_frontier_queries.py."""

from __future__ import annotations

import collections
import math

import numpy as np

from data_engineering_1_spark.io import load_table
from data_engineering_1_spark.plans import registry
from data_engineering_1_spark.plans.decision_queries import (
    _MDE,
    _POWER_Z2,
    _QTE_TAUS,
    _RECON_TRAIL,
    _WILSON_Z2,
)


def _q(name, spark, sf_dir):
    return registry.get_queries()[name](spark, sf_dir).toPandas()


# ---- X221 wilson_rank_parts -------------------------------------------


def test_wilson_rank_matches_pure_python(spark, sf_dir):
    out = _q("wilson_rank_parts", spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    o = load_table(spark, sf_dir, "orders").toPandas()
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    scores = {}
    for pk, g in j.groupby("l_partkey"):
        n = g.o_orderkey.nunique()
        pos = g[g.o_orderstatus == "F"].o_orderkey.nunique()
        p = pos / n
        z2 = _WILSON_Z2
        wlb = (
            p
            + z2 / (2 * n)
            - math.sqrt(z2) * math.sqrt(p * (1 - p) / n + z2 / (4 * n * n))
        ) / (1 + z2 / n)
        scores[pk] = (n, pos, round(p, 6), round(wlb, 9))
    top = sorted(scores, key=lambda k: (-scores[k][3], k))[:30]
    assert list(out.l_partkey) == top
    for r in out.itertuples():
        n, pos, p6, wlb9 = scores[r.l_partkey]
        assert int(r.n) == n and int(r.pos) == pos
        assert math.isclose(r.p_hat, p6, abs_tol=1e-9)
        assert math.isclose(r.wilson_lb, round(wlb9, 6), abs_tol=1e-6)
    # shrinkage property: every bound is strictly below its p_hat
    assert (out.wilson_lb < out.p_hat + 1e-12).all()


# ---- X222 ab_sample_size_plan -----------------------------------------


def test_sample_size_matches_formula(spark, sf_dir):
    out = _q("ab_sample_size_plan", spark, sf_dir).iloc[0]
    ev = load_table(spark, sf_dir, "events").toPandas()
    ev = ev[ev.event_type.isin(["purchase", "click"])]
    purchases = int((ev.event_type == "purchase").sum())
    clicks = int((ev.event_type == "click").sum())
    n_days = ev.ts.dt.normalize().nunique()
    p = purchases / (purchases + clicks)
    n_arm = math.ceil(_POWER_Z2 * 2 * p * (1 - p) / (_MDE * _MDE))
    days = math.ceil(2 * n_arm / ((purchases + clicks) / n_days))
    assert int(out.purchases) == purchases
    assert int(out.clicks) == clicks
    assert int(out.n_days) == n_days
    assert math.isclose(out.p_baseline, round(p, 6), abs_tol=1e-9)
    assert int(out.n_per_arm) == n_arm
    assert int(out.days_to_collect) == days
    # the plan is internally consistent: more days than observed span
    # means the observed traffic can't power the test yet
    assert n_arm > 0 and days > 0


# ---- X223 quantile_treatment_effects ----------------------------------


def test_qte_matches_numpy(spark, sf_dir):
    out = _q("quantile_treatment_effects", spark, sf_dir).set_index(
        "tau"
    )
    o = load_table(spark, sf_dir, "orders").toPandas()
    c = load_table(spark, sf_dir, "customer").toPandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = (j.o_totalprice * 100).round().astype(np.int64)
    t = j[j.c_mktsegment == "BUILDING"].cents.values
    ctl = j[j.c_mktsegment != "BUILDING"].cents.values
    for tau in _QTE_TAUS:
        qt = round(float(np.quantile(t, tau)), 6)
        qc = round(float(np.quantile(ctl, tau)), 6)
        row = out.loc[tau]
        assert math.isclose(row.q_treated, qt, abs_tol=1e-6), tau
        assert math.isclose(row.q_control, qc, abs_tol=1e-6), tau
        assert math.isclose(
            row.qte_dollars, round((qt - qc) / 100, 6), abs_tol=1e-5
        )
    # quantile curves are monotone
    assert (out.q_treated.diff().dropna() >= 0).all()
    assert (out.q_control.diff().dropna() >= 0).all()


# ---- X224 covariate_balance_smd ---------------------------------------


def test_smd_matches_numpy(spark, sf_dir):
    out = _q("covariate_balance_smd", spark, sf_dir).set_index(
        "covariate"
    )
    c = load_table(spark, sf_dir, "customer").toPandas()
    o = load_table(spark, sf_dir, "orders").toPandas()
    agg = o.groupby("o_custkey").agg(
        n_orders=("o_orderkey", "size"),
        spend=("o_totalprice", lambda s: (s * 100).round().sum()),
    )
    j = c.set_index("c_custkey").join(agg, how="left").fillna(0)
    j["acctbal_cents"] = (j.c_acctbal * 100).round()
    treated = j.c_mktsegment == "BUILDING"
    covs = {
        "n_orders": j.n_orders.astype(float),
        "spend_cents": j.spend.astype(float),
        "acctbal_cents": j.acctbal_cents.astype(float),
    }
    for name, x in covs.items():
        xt, xc = x[treated], x[~treated]
        smd = (xt.mean() - xc.mean()) / math.sqrt(
            (xt.var(ddof=0) + xc.var(ddof=0)) / 2
        )
        row = out.loc[name]
        assert math.isclose(row.smd, round(smd, 6), abs_tol=1e-4), name
        assert bool(row.balanced) == (abs(round(smd, 6)) < 0.1), name
    # the audit reads something: all three covariates evaluated, and
    # the flags agree with the rounded-SMD rule (checked per-covariate
    # above). Imbalance on some covariate at small SF is a legitimate
    # finding, not an error — that is what the balance table is FOR.
    assert len(out) == 3


# ---- X225 forecast_reconcile_segments ---------------------------------


def test_reconciliation_conserves_total(spark, sf_dir):
    import pandas as pd

    out = _q("forecast_reconcile_segments", spark, sf_dir)
    o = load_table(spark, sf_dir, "orders").toPandas()
    c = load_table(spark, sf_dir, "customer").toPandas()
    o["d"] = o.o_orderdate.dt.normalize()
    ref = o.d.max()
    total = int((o.d == ref - pd.Timedelta(days=6)).sum())
    j = o[o.d > ref - pd.Timedelta(days=_RECON_TRAIL)].merge(
        c, left_on="o_custkey", right_on="c_custkey"
    )
    shares = j.c_mktsegment.value_counts().sort_index()
    tt = int(shares.sum())
    fl = {s: total * n // tt for s, n in shares.items()}
    rem = {s: total * n % tt for s, n in shares.items()}
    leftover = total - sum(fl.values())
    order = sorted(shares.index, key=lambda s: (-rem[s], s))
    alloc = dict(fl)
    for s in order[:leftover]:
        alloc[s] += 1
    assert len(out) == len(shares)
    for r in out.itertuples():
        assert int(r.trailing_orders) == shares[r.seg]
        assert math.isclose(
            r.trailing_share, round(shares[r.seg] / tt, 6), abs_tol=1e-9
        )
        assert int(r.allocated_forecast) == alloc[r.seg], r.seg
    # the contract: allocations conserve the total EXACTLY
    assert int(out.allocated_forecast.sum()) == total


# ---- X226 unit_price_consistency --------------------------------------


def test_unit_price_audit_matches_pure_python(spark, sf_dir):
    out = _q("unit_price_consistency", spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    units = collections.defaultdict(list)
    for r in li.itertuples():
        cents = int(round(r.l_extendedprice * 100))
        q = int(r.l_quantity)
        # half-up division to whole cents, as both engines ROUND
        u = int(math.floor(cents / q + 0.5))
        units[r.l_partkey].append(u)
    flagged = {}
    for pk, us in units.items():
        lo, hi = min(us), max(us)
        if 100 * hi > 105 * lo:
            flagged[pk] = (len(us), len(set(us)), lo, hi)
    top = sorted(
        flagged, key=lambda k: (-(flagged[k][3] * 1000000 // flagged[k][2]), k)
    )[:30]
    assert list(out.l_partkey) == top
    for r in out.itertuples():
        n, nd, lo, hi = flagged[r.l_partkey]
        assert int(r.n_lines) == n
        assert int(r.n_distinct_prices) == nd
        assert int(r.min_unit_cents) == lo
        assert int(r.max_unit_cents) == hi
        assert math.isclose(
            r.spread_ratio, round(hi / lo, 6), abs_tol=1e-9
        )
    assert len(out) > 0

"""Round-6 operational-metrics batch (X275-X280) vs independent
pure-Python references — same discipline as
test_sketchops_queries.py."""

from __future__ import annotations

import datetime
import math

import pandas as pd

from data_engineering_1_spark.io import load_table
from data_engineering_1_spark.plans import registry


def _q(name, spark, sf_dir):
    return registry.get_queries()[name](spark, sf_dir).toPandas()


# ---- X275 nelson_aalen_hazard --------------------------------------------


def test_nelson_aalen_matches_pure_python_and_bounds_km(spark, sf_dir):
    out = _q("nelson_aalen_hazard", spark, sf_dir)
    e = load_table(spark, sf_dir, "events").toPandas()
    e["ts"] = pd.to_datetime(e.ts)
    study_end = e.ts.max().normalize()
    sign = e[e.event_type == "signup"].groupby("user_id").ts.min()
    durs = []
    for u, s in sign.items():
        pur = e[
            (e.user_id == u)
            & (e.event_type == "purchase")
            & (e.ts >= s)
        ].ts.min()
        if pd.isna(pur):
            durs.append(((study_end - s.normalize()).days, 0))
        else:
            durs.append(((pur.normalize() - s.normalize()).days, 1))
    grid = {}
    for d, obs in durs:
        ev, lv = grid.get(d, (0, 0))
        grid[d] = (ev + obs, lv + 1)
    days = sorted(grid)
    total = len(durs)
    cum_leave = 0
    H = 0.0
    rows = []
    for d in days:
        ev, lv = grid[d]
        at_risk = total - cum_leave
        cum_leave += lv
        if ev > 0:
            step = round(ev / at_risk, 9)
            H += step
            rows.append((d, ev, at_risk, step, round(H, 6)))
    assert len(out) == len(rows)
    for r, (d, ev, ar, step, h) in zip(out.itertuples(), rows):
        assert int(r.dur_day) == d
        assert int(r.n_events) == ev
        assert int(r.n_at_risk) == ar
        assert math.isclose(r.hazard_step, step, abs_tol=1e-9)
        assert math.isclose(r.cum_hazard, h, abs_tol=1e-6)
    # the classical bound: exp(-H) >= Kaplan-Meier S at every step
    s_km = 1.0
    i = 0
    for d in days:
        ev, lv = grid[d]
        at_risk = total - sum(grid[x][1] for x in days if x < d)
        if ev > 0:
            s_km *= 1 - ev / at_risk
            assert math.exp(-out.cum_hazard.iloc[i]) >= s_km - 1e-9
            i += 1


# ---- X276 business_days_latency ---------------------------------------------


def test_closed_form_weekdays_match_enumeration(spark, sf_dir):
    out = _q("business_days_latency", spark, sf_dir).set_index(
        "priority"
    )
    o = load_table(spark, sf_dir, "orders").toPandas()
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    first = (
        li.assign(sd=pd.to_datetime(li.l_shipdate).dt.normalize())
        .groupby("l_orderkey")
        .sd.min()
    )
    o = o[o.o_orderkey.isin(first.index)].copy()
    o["e1"] = (
        pd.to_datetime(o.o_orderdate).dt.normalize()
        - pd.Timestamp("1970-01-01")
    ).dt.days
    o["e2"] = (
        pd.Series(first.loc[o.o_orderkey].values, index=o.index)
        - pd.Timestamp("1970-01-01")
    ).dt.days

    def bdays(e1, e2):
        # truth by literal enumeration with Python's weekday()
        return sum(
            1
            for k in range(e1 + 1, e2 + 1)
            if (
                datetime.date(1970, 1, 1)
                + datetime.timedelta(days=int(k))
            ).weekday()
            < 5
        )

    o["bd"] = [
        bdays(int(a), int(b)) for a, b in zip(o.e1, o.e2)
    ]
    for pri, g in o.groupby("o_orderpriority"):
        r = out.loc[pri]
        assert int(r.n_orders) == len(g)
        assert int(r.total_bdays) == int(g.bd.sum())
        assert math.isclose(
            r.avg_bdays, round(g.bd.mean(), 6), abs_tol=1e-6
        )
        assert int(r.max_bdays) == int(g.bd.max())


# ---- X277 greedy_knapsack_parts ------------------------------------------------


def test_knapsack_greedy_prefix_is_exact(spark, sf_dir):
    out = _q("greedy_knapsack_parts", spark, sf_dir)
    p = load_table(spark, sf_dir, "part").toPandas()
    p["value_c"] = (p.p_retailprice * 100).round().astype(int)
    p["cost"] = p.p_size.astype(int)
    p["ratio_fp"] = p.value_c * 1_000_000 // p.cost
    p = p.sort_values(
        ["ratio_fp", "value_c", "p_partkey"],
        ascending=[False, False, True],
    ).reset_index(drop=True)
    p["cum"] = p.cost.cumsum()
    sel = p[p.cum <= 5000]
    assert list(out.p_partkey) == list(sel.p_partkey)
    assert list(out.cum_cost) == list(sel.cum)
    # budget respected; when anything was excluded, the prefix is
    # tight (next item bursts) and greedy-dominant (ratio floor >=
    # excluded ceiling) — at sf0.001 the whole catalog fits and the
    # tightness leg is vacuous
    assert out.cum_cost.iloc[-1] <= 5000
    if len(sel) < len(p):
        nxt = p.iloc[len(sel)]
        assert out.cum_cost.iloc[-1] + nxt.cost > 5000
        assert sel.ratio_fp.min() >= nxt.ratio_fp


# ---- X278 iso_week_revenue -------------------------------------------------------


def test_iso_weeks_match_python_isocalendar(spark, sf_dir):
    out = _q("iso_week_revenue", spark, sf_dir)
    o = load_table(spark, sf_dir, "orders").toPandas()
    d = pd.to_datetime(o.o_orderdate).dt.date
    iso = [x.isocalendar() for x in d]
    o["iso_year"] = [i[0] for i in iso]
    o["iso_week"] = [i[1] for i in iso]
    o["cents"] = (o.o_totalprice * 100).round().astype(int)
    g = o.groupby(["iso_year", "iso_week"]).agg(
        n=("o_orderkey", "count"), cents=("cents", "sum")
    )
    assert len(out) == len(g)
    for r in out.itertuples():
        row = g.loc[(int(r.iso_year), int(r.iso_week))]
        assert int(r.n_orders) == int(row.n)
        assert int(r.rev_cents) == int(row.cents)


# ---- X279 mahalanobis_2d_outliers ---------------------------------------------------


def test_mahalanobis_matches_numpy(spark, sf_dir):
    import numpy as np

    out = _q("mahalanobis_2d_outliers", spark, sf_dir)
    o = load_table(spark, sf_dir, "orders").toPandas()
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    nl = li.groupby("l_orderkey").size()
    o = o[o.o_orderkey.isin(nl.index)].copy()
    o["x"] = (o.o_totalprice * 100).round().astype(int)
    o["y"] = nl.loc[o.o_orderkey].values
    pts = o[["o_orderkey", "x", "y"]].reset_index(drop=True)
    X = pts[["x", "y"]].to_numpy(dtype=float)
    mu = X.mean(axis=0)
    cov = np.cov(X.T, bias=True)
    inv = np.linalg.inv(cov)
    diffs = X - mu
    d2 = np.einsum("ij,jk,ik->i", diffs, inv, diffs)
    pts["d2"] = [round(v, 9) for v in d2]
    top = pts.sort_values(
        ["d2", "o_orderkey"], ascending=[False, True]
    ).head(30)
    assert list(out.o_orderkey) == list(top.o_orderkey)
    for r, expect in zip(out.itertuples(), top.d2):
        assert math.isclose(r.mahalanobis_sq, expect, abs_tol=1e-5)
    # covariance-awareness: the top outlier beats every point on
    # the ellipse metric even if not on either single axis
    assert out.mahalanobis_sq.iloc[0] >= out.mahalanobis_sq.max()


# ---- X280 perfect_order_rate_monthly --------------------------------------------------


def test_perfect_order_is_conjunctive(spark, sf_dir):
    out = _q("perfect_order_rate_monthly", spark, sf_dir)
    o = load_table(spark, sf_dir, "orders").toPandas()
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    first = (
        li.assign(sd=pd.to_datetime(li.l_shipdate).dt.normalize())
        .groupby("l_orderkey")
        .sd.min()
    )
    o = o[o.o_orderkey.isin(first.index)].copy()
    od = pd.to_datetime(o.o_orderdate).dt.normalize()
    o["lat"] = (first.loc[o.o_orderkey].values - od.values).astype(
        "timedelta64[D]"
    ).astype(int)
    o["perfect"] = ((o.lat <= 7) & (o.o_orderstatus == "F")).astype(int)
    o["month"] = od.dt.to_period("M").dt.to_timestamp()
    g = o.groupby("month").perfect.agg(["count", "sum"])
    assert len(out) == len(g)
    out = out.copy()
    out["month"] = pd.to_datetime(out.month)
    for r in out.itertuples():
        row = g.loc[r.month]
        assert int(r.n_orders) == int(row["count"])
        assert int(r.n_perfect) == int(row["sum"])
        assert math.isclose(
            r.perfect_rate,
            round(row["sum"] / row["count"], 6),
            abs_tol=1e-9,
        )
    # conjunctive degradation: joint rate <= each marginal rate
    on_time = (o.lat <= 7).mean()
    fulfilled = (o.o_orderstatus == "F").mean()
    joint = o.perfect.mean()
    assert joint <= min(on_time, fulfilled) + 1e-12

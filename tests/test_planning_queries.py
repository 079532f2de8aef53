"""Round-6 inventory-planning/treasury batch (X239-X244) vs
independent pure-Python/pandas references — same discipline as
test_decision_queries.py."""

from __future__ import annotations

import math
from fractions import Fraction

import pandas as pd

from data_engineering_1_spark.io import load_table
from data_engineering_1_spark.plans import registry


def _q(name, spark, sf_dir):
    return registry.get_queries()[name](spark, sf_dir).toPandas()


def _daily_demand(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    li["d"] = pd.to_datetime(li.l_shipdate).dt.normalize()
    daily = (
        li.groupby(["l_partkey", "d"], as_index=False)
        .l_quantity.sum()
        .rename(columns={"l_quantity": "q"})
    )
    daily["q"] = daily.q.astype(int)
    n_days = int((daily.d.max() - daily.d.min()).days) + 1
    return daily, n_days


# ---- X239 safety_stock_reorder -----------------------------------------


def test_safety_stock_matches_pure_python(spark, sf_dir):
    out = _q("safety_stock_reorder", spark, sf_dir)
    daily, n = _daily_demand(spark, sf_dir)
    rows = {}
    for pk, g in daily.groupby("l_partkey"):
        s1 = int(g.q.sum())
        s2 = sum(int(q) ** 2 for q in g.q)
        var_num = n * s2 - s1 * s1  # exact integer N^2 * sigma^2
        ss = 1.645 * math.sqrt(7.0 * var_num) / n
        rows[pk] = (
            len(g),
            s1,
            round(s1 / n, 6),
            round(ss, 6),
            round(7.0 * s1 / n + ss, 6),
        )
    top = sorted(rows, key=lambda k: (-rows[k][1], k))[:30]
    assert list(out.l_partkey) == top
    for r in out.itertuples():
        pd_, s1, mean, ss, rop = rows[r.l_partkey]
        assert int(r.present_days) == pd_ and int(r.total_qty) == s1
        assert math.isclose(r.mean_daily, mean, abs_tol=1e-9)
        assert math.isclose(r.safety_stock, ss, abs_tol=1e-6)
        assert math.isclose(r.reorder_point, rop, abs_tol=1e-6)
    # the policy invariant: reorder point >= lead-time demand alone
    assert (out.reorder_point >= 7 * out.mean_daily - 1e-6).all()


# ---- X240 eoq_parts ------------------------------------------------------


def test_eoq_matches_pure_python(spark, sf_dir):
    out = _q("eoq_parts", spark, sf_dir)
    daily, n = _daily_demand(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").toPandas()
    cents = {
        int(r.p_partkey): int(round(r.p_retailprice * 100))
        for r in part.itertuples()
    }
    totals = daily.groupby("l_partkey").q.sum().astype(int)
    for r in out.itertuples():
        d = int(totals[r.l_partkey])
        pc = cents[r.l_partkey]
        assert int(r.total_qty) == d and int(r.price_cents) == pc
        eoq = math.sqrt(36500000 * d / (n * pc))
        assert math.isclose(r.eoq_units, round(eoq, 6), abs_tol=1e-6)
        opy = (365 * d / n) / eoq
        assert math.isclose(
            r.orders_per_year, round(opy, 6), abs_tol=1e-6
        )
    # EOQ tradeoff sanity: annual demand / EOQ = orders per year > 0
    assert (out.orders_per_year > 0).all()


# ---- X241 newsvendor_stock ----------------------------------------------


def test_newsvendor_quantile_includes_zero_days(spark, sf_dir):
    out = _q("newsvendor_stock", spark, sf_dir)
    daily, n = _daily_demand(spark, sf_dir)
    for r in out.itertuples():
        qs = sorted(daily[daily.l_partkey == r.l_partkey].q)
        assert int(r.present_days) == len(qs)
        assert int(r.zero_days) == n - len(qs)
        # densify explicitly — the operator must NOT have done so
        full = [0] * (n - len(qs)) + qs
        pos = Fraction(n - 1) * Fraction(5, 7)
        lo, frac = int(pos), pos - int(pos)
        hi = min(lo + 1, n - 1)
        expect = full[lo] + float(frac) * (full[hi] - full[lo])
        assert math.isclose(
            r.optimal_stock, round(expect, 6), abs_tol=1e-6
        )
    # intermittent SKUs (mostly zero days) must stock near zero
    sparse = out[out.present_days * 7 < out.zero_days * 2]
    assert (sparse.optimal_stock == 0).all() if len(sparse) else True


# ---- X242 vwap_daily ------------------------------------------------------


def test_vwap_is_ratio_of_sums_not_mean_of_prices(spark, sf_dir):
    out = _q("vwap_daily", spark, sf_dir)
    out["d"] = pd.to_datetime(out.d)
    out = out.set_index("d")
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    li["d"] = pd.to_datetime(li.l_shipdate).dt.normalize()
    li["cents"] = (li.l_extendedprice * 100).round().astype(int)
    li["qty"] = li.l_quantity.astype(int)
    g = li.groupby("d")[["cents", "qty"]].sum().sort_index()
    assert len(out) == len(g)
    for d, row in g.iterrows():
        r = out.loc[pd.Timestamp(d)]
        assert int(r.cents) == int(row.cents)
        assert int(r.qty) == int(row.qty)
        assert math.isclose(
            r.vwap,
            round(row.cents / (100.0 * row.qty), 6),
            abs_tol=1e-9,
        )
    # rolling leg: exact 7-day calendar window on a spot-check of days
    days = list(g.index)
    for d in days[:: max(1, len(days) // 17)]:
        w = g[(g.index > d - pd.Timedelta(days=7)) & (g.index <= d)]
        expect = round(w.cents.sum() / (100.0 * w.qty.sum()), 6)
        assert math.isclose(
            out.loc[pd.Timestamp(d)].vwap_7d, expect, abs_tol=1e-9
        )


# ---- X243 max_drawdown_segments -------------------------------------------


def test_max_drawdown_matches_literal_curve_walk(spark, sf_dir):
    out = _q("max_drawdown_segments", spark, sf_dir).set_index("segment")
    o = load_table(spark, sf_dir, "orders").toPandas()
    c = load_table(spark, sf_dir, "customer").toPandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["d"] = pd.to_datetime(j.o_orderdate).dt.normalize()
    j["net"] = (j.o_totalprice * 100).round().astype(int) * (
        (j.o_orderstatus == "F").astype(int) * 2 - 1
    )
    for seg, g in j.groupby("c_mktsegment"):
        daily = g.groupby("d").net.sum().sort_index()
        equity = peak = 0
        best = (-1, None, None)  # (drawdown, trough_day, peak_at)
        for d, net in daily.items():
            equity += net
            peak = max(peak, equity)
            dd = peak - equity
            if dd > best[0]:
                best = (dd, d, peak)
        r = out.loc[seg]
        assert int(r.max_drawdown_cents) == best[0]
        assert pd.Timestamp(r.trough_day) == best[1]
        assert int(r.peak_cents) == best[2]
        assert math.isclose(
            r.drawdown_frac, round(best[0] / best[2], 6), abs_tol=1e-9
        )


# ---- X244 fulfillment_latency_sla ------------------------------------------


def test_latency_sla_matches_sorted_list_percentiles(spark, sf_dir):
    out = _q("fulfillment_latency_sla", spark, sf_dir).set_index(
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
    o["lat"] = (
        first.loc[o.o_orderkey].values
        - pd.to_datetime(o.o_orderdate).dt.normalize().values
    ).astype("timedelta64[D]").astype(int)
    for pri, g in o.groupby("o_orderpriority"):
        lats = sorted(g.lat)
        n = len(lats)
        r = out.loc[pri]
        assert int(r.n_orders) == n
        within = sum(1 for v in lats if v <= 7)
        assert int(r.within_7d) == within
        assert math.isclose(
            r.sla_7d_share, round(within / n, 6), abs_tol=1e-9
        )
        for col, num, den in (
            ("p50_days", 1, 2),
            ("p90_days", 9, 10),
            ("p99_days", 99, 100),
        ):
            lo = (n - 1) * num // den
            hi = min(lo + 1, n - 1)
            frac = ((n - 1) * num % den) / den
            expect = lats[lo] + frac * (lats[hi] - lats[lo])
            assert math.isclose(
                getattr(r, col), round(expect, 6), abs_tol=1e-6
            ), (pri, col)
        # order statistics are monotone in p
        assert r.p50_days <= r.p90_days <= r.p99_days

"""Round-6 market-analytics batch (X245-X250) vs independent
pure-Python/pandas references — same discipline as
test_planning_queries.py."""

from __future__ import annotations

import math

import pandas as pd

from data_engineering_1_spark.io import load_table
from data_engineering_1_spark.plans import registry
from data_engineering_1_spark.plans.market_queries import _PRICE_FP


def _q(name, spark, sf_dir):
    return registry.get_queries()[name](spark, sf_dir).toPandas()


def _part_month(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    li["m"] = (
        pd.to_datetime(li.l_shipdate).dt.to_period("M").dt.to_timestamp()
    )
    li["cents"] = (li.l_extendedprice * 100).round().astype(int)
    li["qty"] = li.l_quantity.astype(int)
    pm = li.groupby(["l_partkey", "m"], as_index=False)[
        ["cents", "qty"]
    ].sum()
    pm["price_fp"] = pm.cents * _PRICE_FP // pm.qty
    return pm


# ---- X245 price_index_monthly ---------------------------------------------


def test_price_index_matches_pure_python(spark, sf_dir):
    out = _q("price_index_monthly", spark, sf_dir)
    out["month"] = pd.to_datetime(out.month)
    pm = _part_month(spark, sf_dir)
    m0 = pm.m.min()
    base = pm[pm.m == m0].set_index("l_partkey")
    for r in out.itertuples():
        cur = pm[pm.m == r.month]
        j = cur.join(
            base[["price_fp", "qty"]],
            on="l_partkey",
            how="inner",
            rsuffix="_0",
        )
        assert int(r.matched_parts) == len(j)
        nl = int((j.price_fp * j.qty_0).sum())
        dl = int((j.price_fp_0 * j.qty_0).sum())
        np_ = int((j.price_fp * j.qty).sum())
        dp = int((j.price_fp_0 * j.qty).sum())
        lasp, paas = nl / dl, np_ / dp
        assert math.isclose(r.laspeyres, round(lasp, 6), abs_tol=1e-9)
        assert math.isclose(r.paasche, round(paas, 6), abs_tol=1e-9)
        assert math.isclose(
            r.fisher, round(math.sqrt(lasp * paas), 6), abs_tol=1e-6
        )
    # base month indexes are exactly 1
    b = out[out.month == m0].iloc[0]
    assert b.laspeyres == 1.0 and b.paasche == 1.0 and b.fisher == 1.0


# ---- X246 hhi_brand_region --------------------------------------------------


def test_hhi_matches_share_sum_of_squares(spark, sf_dir):
    out = _q("hhi_brand_region", spark, sf_dir).set_index("region")
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    o = load_table(spark, sf_dir, "orders").toPandas()
    c = load_table(spark, sf_dir, "customer").toPandas()
    n = load_table(spark, sf_dir, "nation").toPandas()
    rg = load_table(spark, sf_dir, "region").toPandas()
    p = load_table(spark, sf_dir, "part").toPandas()
    j = (
        li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(n, left_on="c_nationkey", right_on="n_nationkey")
        .merge(rg, left_on="n_regionkey", right_on="r_regionkey")
        .merge(p, left_on="l_partkey", right_on="p_partkey")
    )
    j["cents"] = (j.l_extendedprice * 100).round().astype(int)
    for reg, g in j.groupby("r_name"):
        rev = g.groupby("p_brand").cents.sum().astype(int)
        total = int(rev.sum())
        hhi = sum(int(v) ** 2 for v in rev) / (total * total)
        r = out.loc[reg]
        assert int(r.n_brands) == len(rev)
        assert math.isclose(r.hhi, round(hhi, 6), abs_tol=1e-9)
        assert math.isclose(
            r.effective_brands, round(1 / hhi, 6), abs_tol=1e-5
        )
        top = rev.sort_values(ascending=False)
        best = min(
            (b for b in rev.index if rev[b] == top.iloc[0])
        )
        assert r.top_brand == best
        assert math.isclose(
            r.top_share, round(top.iloc[0] / total, 6), abs_tol=1e-9
        )
        # HHI bounds: 1/n <= hhi <= 1
        assert 1 / len(rev) - 1e-9 <= r.hhi <= 1


# ---- X247 price_volume_mix ---------------------------------------------------


def test_pvm_components_conserve_exactly(spark, sf_dir):
    out = _q("price_volume_mix", spark, sf_dir)
    out["month"] = pd.to_datetime(out.month)
    pm = _part_month(spark, sf_dir).set_index(["l_partkey", "m"])
    months = sorted(pm.index.get_level_values("m").unique())
    for prev, cur in zip(months, months[1:]):
        a = pm.xs(prev, level="m")
        b = pm.xs(cur, level="m")
        matched = a.index.intersection(b.index)
        price = vol = cross = 0
        for k in matched:
            dp_ = int(b.price_fp[k]) - int(a.price_fp[k])
            dq = int(b.qty[k]) - int(a.qty[k])
            price += dp_ * int(a.qty[k])
            vol += dq * int(a.price_fp[k])
            cross += dp_ * dq
        new = sum(
            int(b.price_fp[k]) * int(b.qty[k])
            for k in b.index.difference(a.index)
        )
        disc = -sum(
            int(a.price_fp[k]) * int(a.qty[k])
            for k in a.index.difference(b.index)
        )
        den = 100 * _PRICE_FP
        r = out[out.month == cur].iloc[0]
        assert int(r.matched_parts) == len(matched)
        for col, fx in (
            ("price_effect", price),
            ("volume_effect", vol),
            ("cross_effect", cross),
            ("new_parts_effect", new),
            ("discontinued_effect", disc),
            ("total_change", price + vol + cross + new + disc),
        ):
            assert math.isclose(
                getattr(r, col), round(fx / den, 6), abs_tol=1e-6
            ), (cur, col)
        # the algebraic identity in exact fp units: components sum to
        # the revenue-at-fp-price delta exactly
        rev_fp_cur = sum(int(b.price_fp[k]) * int(b.qty[k]) for k in b.index)
        rev_fp_prev = sum(
            int(a.price_fp[k]) * int(a.qty[k]) for k in a.index
        )
        assert price + vol + cross + new + disc == rev_fp_cur - rev_fp_prev


# ---- X248 nrr_monthly_cohorts -------------------------------------------------


def test_nrr_matches_pandas_cohorts(spark, sf_dir):
    out = _q("nrr_monthly_cohorts", spark, sf_dir)
    o = load_table(spark, sf_dir, "orders").toPandas()
    d = pd.to_datetime(o.o_orderdate)
    o["ym"] = d.dt.year * 12 + d.dt.month
    o["cents"] = (o.o_totalprice * 100).round().astype(int)
    o["cohort"] = o.groupby("o_custkey").ym.transform("min")
    o["mi"] = o.ym - o.cohort
    cell = (
        o[o.mi <= 12]
        .groupby(["cohort", "mi"])
        .agg(
            cust=("o_custkey", "nunique"), cents=("cents", "sum")
        )
    )
    assert len(out) == len(cell)
    for r in out.itertuples():
        cohort = int(r.cohort_year) * 12 + int(r.cohort_month0)
        row = cell.loc[(cohort, int(r.months_since))]
        assert int(r.active_customers) == int(row.cust)
        assert int(r.rev_cents) == int(row.cents)
        rev0 = int(cell.loc[(cohort, 0)].cents)
        assert math.isclose(
            r.nrr, round(int(row.cents) / rev0, 6), abs_tol=1e-9
        )
    # month 0 NRR is exactly 1 for every cohort
    assert (out[out.months_since == 0].nrr == 1.0).all()


# ---- X249 top_orders_with_ties --------------------------------------------------


def test_with_ties_keeps_every_tied_row(spark, sf_dir):
    out = _q("top_orders_with_ties", spark, sf_dir)
    o = load_table(spark, sf_dir, "orders").toPandas()
    c = load_table(spark, sf_dir, "customer").toPandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = (j.o_totalprice * 100).round().astype(int)
    j["band"] = j.cents // 1_000_000
    more_than_3 = False
    for seg, g in j.groupby("c_mktsegment"):
        sub = out[out.segment == seg]
        # distinct band values in the output = top 3 distinct bands...
        bands = sorted(g.band.unique(), reverse=True)
        # ...BY RANK — rank() numbers rows not distinct values, so
        # only bands whose rank (1 + count of strictly-greater rows)
        # is <= 3 survive
        keep = [
            b
            for b in bands
            if int((g.band > b).sum()) + 1 <= 3
        ]
        assert sorted(sub.band_10k.unique(), reverse=True) == keep
        # EVERY order in a surviving band is present (no tie dropped)
        expect = g[g.band.isin(keep)]
        assert sorted(sub.o_orderkey) == sorted(expect.o_orderkey)
        if len(sub) > 3:
            more_than_3 = True
        # rank values are exact
        for r in sub.itertuples():
            assert int(r.rnk) == int((g.band > r.band_10k).sum()) + 1
    # the semantics actually differ from row_number top-3 somewhere
    assert more_than_3


# ---- X250 clv_segments -----------------------------------------------------------


def test_clv_collapses_algebraically(spark, sf_dir):
    out = _q("clv_segments", spark, sf_dir)
    o = load_table(spark, sf_dir, "orders").toPandas()
    c = load_table(spark, sf_dir, "customer").toPandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = (j.o_totalprice * 100).round().astype(int)
    for r in out.itertuples():
        g = j[j.c_mktsegment == r.segment]
        per = g.groupby("o_custkey").agg(
            n=("o_orderkey", "count"), cents=("cents", "sum")
        )
        cust, orders = len(per), int(per.n.sum())
        rep = int((per.n >= 2).sum())
        cents = int(per.cents.sum())
        assert (int(r.customers), int(r.orders)) == (cust, orders)
        assert int(r.repeat_customers) == rep
        assert math.isclose(
            r.aov, round(cents / (100 * orders), 6), abs_tol=1e-9
        )
        assert math.isclose(
            r.frequency, round(orders / cust, 6), abs_tol=1e-9
        )
        assert math.isclose(
            r.repeat_rate, round(rep / cust, 6), abs_tol=1e-9
        )
        if cust == rep:
            assert pd.isna(r.clv)
        else:
            one_time = cust - rep
            assert math.isclose(
                r.clv, round(cents / (100 * one_time), 6), abs_tol=1e-9
            )
            # the collapse is the three-factor product
            assert math.isclose(
                r.clv,
                (cents / (100 * orders))
                * (orders / cust)
                / (1 - rep / cust),
                rel_tol=1e-6,
            )

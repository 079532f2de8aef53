"""Round-6 corpus-gate/statistics batch (X133-X138) vs independent
pure-Python/numpy references — same discipline as
test_mining_queries.py: each query's algorithmic claim is recomputed
from the raw fixture without Spark and compared exactly (or under a
float tolerance where a reference computes in a different order)."""

from __future__ import annotations

import collections
import math

import numpy as np
import pandas as pd

from data_engineering_1_spark.io import load_table
from data_engineering_1_spark.operators.textanalysis import STOPWORDS
from data_engineering_1_spark.plans import registry


def _q(name, spark, sf_dir):
    return registry.get_queries()[name](spark, sf_dir).toPandas()


def _tokens(text):
    return text.strip().lower().split()


# ---- X133 gopher_rules_gate ------------------------------------------


def test_gopher_gate_matches_pure_python(spark, sf_dir):
    out = _q("gopher_rules_gate", spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").toPandas()
    en = set(STOPWORDS["en"])
    agg = collections.defaultdict(
        lambda: dict(n_docs=0, fail_len=0, fail_wordlen=0, fail_stop=0,
                     fail_rep=0, n_pass=0)
    )
    for r in docs.itertuples():
        t = _tokens(r.text)
        n = len(t)
        sum_len = sum(len(x) for x in t)
        stop_n = sum(1 for x in t if x in en)
        top = max(collections.Counter(t).values())
        ok_len = 50 <= n <= 100_000
        ok_wl = 3 * n <= sum_len <= 10 * n
        ok_stop = stop_n >= 2
        ok_rep = 10 * top <= 3 * n
        a = agg[(r.lang, r.source)]
        a["n_docs"] += 1
        a["fail_len"] += not ok_len
        a["fail_wordlen"] += not ok_wl
        a["fail_stop"] += not ok_stop
        a["fail_rep"] += not ok_rep
        a["n_pass"] += ok_len and ok_wl and ok_stop and ok_rep
    assert len(out) == len(agg)
    for row in out.itertuples():
        want = agg[(row.lang, row.source)]
        for k in want:
            assert getattr(row, k) == want[k], (row.lang, row.source, k)
    # the gate must be discriminative on this fixture: some docs fail
    # the word-count rule (docs are ~60 tokens with a long lower tail)
    assert out["fail_len"].sum() > 0
    assert out["n_pass"].sum() > 0


# ---- X134 ks_two_sample_values ---------------------------------------


def test_ks_statistic_matches_numpy_ecdf(spark, sf_dir):
    out = _q("ks_two_sample_values", spark, sf_dir)
    assert len(out) == 1
    ev = load_table(spark, sf_dir, "events").toPandas()
    a = np.sort([round(v * 100) for v in ev[ev.event_type == "click"].value])
    b = np.sort([round(v * 100) for v in ev[ev.event_type == "view"].value])
    grid = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(a, grid, side="right") / len(a)
    fb = np.searchsorted(b, grid, side="right") / len(b)
    d = np.abs(fa - fb)
    row = out.iloc[0]
    assert int(row.n_a) == len(a) and int(row.n_b) == len(b)
    assert math.isclose(row.ks_d, d.max(), abs_tol=1e-6)
    # reported location attains the sup and is the smallest such value
    at = grid[d.argmax()]  # argmax returns FIRST max — same tie rule
    assert math.isclose(row.ks_at_value, at / 100.0, abs_tol=1e-9)


# ---- X135 gini_spend_by_region ---------------------------------------


def test_gini_matches_numpy_formula_and_bounds(spark, sf_dir):
    out = _q("gini_spend_by_region", spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders").toPandas()
    cust = load_table(spark, sf_dir, "customer").toPandas()
    nation = load_table(spark, sf_dir, "nation").toPandas()
    region = load_table(spark, sf_dir, "region").toPandas()
    j = (
        orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(nation, left_on="c_nationkey", right_on="n_nationkey")
        .merge(region, left_on="n_regionkey", right_on="r_regionkey")
    )
    spend = (
        j.groupby(["r_name", "c_custkey"])["o_totalprice"]
        .apply(lambda s: int(round(sum(round(v * 100) for v in s))))
        .reset_index(name="cents")
    )
    for row in out.itertuples():
        x = np.sort(
            spend[spend.r_name == row.r_name]["cents"].to_numpy(np.float64)
        )
        n = len(x)
        i = np.arange(1, n + 1)
        g = (2 * (i * x).sum() - (n + 1) * x.sum()) / (n * x.sum())
        assert int(row.n_customers) == n
        assert math.isclose(row.gini, g, abs_tol=1e-6), row.r_name
        assert 0.0 <= row.gini < 1.0


# ---- X136 equidepth_price_histogram ----------------------------------


def test_equidepth_buckets_are_near_equal_and_ordered(spark, sf_dir):
    out = _q("equidepth_price_histogram", spark, sf_dir).sort_values(
        "bucket"
    )
    orders = load_table(spark, sf_dir, "orders").toPandas()
    prices = orders["o_totalprice"].to_numpy(np.float64)
    n = len(prices)
    assert list(out["bucket"]) == list(range(1, 11))
    assert out["n_orders"].sum() == n
    # equal-frequency contract: every bucket within 2% of n/10 (exact
    # interpolated deciles can split ties only at boundary collisions)
    assert (np.abs(out["n_orders"].to_numpy() - n / 10) <= n * 0.02).all()
    # buckets tile the range in order without overlap
    mins, maxs = out["min_price"].to_numpy(), out["max_price"].to_numpy()
    assert (mins <= maxs).all()
    assert (maxs[:-1] <= mins[1:]).all()
    # boundaries match numpy's linear-interpolation deciles
    bounds = np.quantile(prices, np.arange(0.1, 1.0, 0.1))
    for b, hi in zip(bounds, maxs[:-1]):
        assert hi <= round(b, 2) + 0.01


# ---- X137 rolling_corr_click_view ------------------------------------


def test_rolling_corr_matches_pandas(spark, sf_dir):
    out = _q("rolling_corr_click_view", spark, sf_dir).sort_values("day")
    ev = load_table(spark, sf_dir, "events").toPandas()
    ev = ev[ev.event_type.isin(["click", "view"])].copy()
    ev["day"] = ev.ts.dt.date
    ev["cent"] = [int(round(v * 100)) for v in ev.value]
    daily = (
        ev.pivot_table(
            index="day", columns="event_type", values="cent",
            aggfunc="sum", fill_value=0,
        )
        .sort_index()
    )
    x = daily["click"].to_numpy(np.float64)
    y = daily["view"].to_numpy(np.float64)
    ref = (
        pd.Series(x).rolling(14, min_periods=1).corr(pd.Series(y))
    )
    assert len(out) == len(daily)
    for i, row in enumerate(out.itertuples()):
        assert int(row.n_days) == min(i + 1, 14)
        if i == 0:
            assert row.corr_14d is None or np.isnan(row.corr_14d)
        else:
            assert math.isclose(row.corr_14d, ref.iloc[i], abs_tol=1e-5), i


# ---- X138 cusum_changepoint_daily ------------------------------------


def test_cusum_changepoint_matches_pure_python(spark, sf_dir):
    out = _q("cusum_changepoint_daily", spark, sf_dir)
    ev = load_table(spark, sf_dir, "events").toPandas()
    ev["day"] = ev.ts.dt.date
    for row in out.itertuples():
        daily = (
            ev[ev.event_type == row.event_type]
            .groupby("day")
            .size()
            .sort_index()
        )
        c = daily.to_numpy(np.int64)
        d, t = len(c), int(c.sum())
        s = np.abs(d * np.cumsum(c) - np.arange(1, d + 1) * t)
        assert int(row.n_days) == d and int(row.n_events) == t
        assert int(row.cusum_scaled) == int(s.max())
        k = int(s.argmax())  # first max — matches the MIN(day) tie rule
        assert pd.Timestamp(row.change_day) == pd.Timestamp(daily.index[k])

"""Round-6 graph-distance / time-series batch (X161-X166) vs
independent pure-Python/numpy references — same discipline as
test_experiment_queries.py."""

from __future__ import annotations

import collections
import itertools
import math

import numpy as np
import pandas as pd

from data_engineering_1_spark.io import load_table
from data_engineering_1_spark.plans import registry
from data_engineering_1_spark.plans.series_queries import _CHI2_05


def _q(name, spark, sf_dir):
    return registry.get_queries()[name](spark, sf_dir).toPandas()


def _copurchase_edges(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    edges = collections.defaultdict(set)
    for _, g in li.groupby("l_orderkey"):
        for u, v in itertools.combinations(sorted(set(g.l_partkey)), 2):
            edges[u].add(v)
            edges[v].add(u)
    return edges  # adjacency sets; parallel edges collapse for BFS only


def _copurchase_multi_edges(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    out = []
    for _, g in li.groupby("l_orderkey"):
        for u, v in itertools.combinations(sorted(set(g.l_partkey)), 2):
            out.append((u, v))
            out.append((v, u))
    return out  # directed multi-edge list (parallel edges kept)


def _daily_clicks(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").toPandas()
    c = ev[ev.event_type == "click"]
    return c.groupby(c.ts.dt.normalize()).size().sort_index()


# ---- X161 khop_copurchase_reach --------------------------------------


def test_khop_matches_pure_python_bfs(spark, sf_dir):
    out = _q("khop_copurchase_reach", spark, sf_dir)
    adj = _copurchase_edges(spark, sf_dir)
    dist = {n: 0 for n in adj if n % 100 == 0}
    frontier = list(dist)
    for hop in (1, 2, 3):
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = hop
                    nxt.append(v)
        frontier = nxt
    want = collections.Counter(dist.values())
    checks = collections.defaultdict(int)
    for n, h in dist.items():
        checks[h] += n
    assert list(out.hop) == sorted(want)
    for row in out.itertuples():
        assert int(row.n_nodes) == want[row.hop], row.hop
        assert int(row.node_checksum) == checks[row.hop], row.hop
    # seeds exist and BFS actually expanded
    assert want[0] >= 1 and want.get(1, 0) > 0


# ---- X162 degree_assortativity_copurchase ----------------------------


def test_assortativity_matches_numpy(spark, sf_dir):
    out = _q("degree_assortativity_copurchase", spark, sf_dir).iloc[0]
    edges = _copurchase_multi_edges(spark, sf_dir)
    deg = collections.Counter(u for u, _ in edges)
    x = np.array([deg[u] for u, _ in edges], dtype=float)
    y = np.array([deg[v] for _, v in edges], dtype=float)
    want = np.corrcoef(x, y)[0, 1]
    assert int(out.n_directed_edges) == len(edges)
    assert int(out.n_nodes) == len(deg)
    assert math.isclose(out.assortativity, want, abs_tol=1e-5)
    assert -1.0 <= out.assortativity <= 1.0


# ---- X163 stl_decompose_daily ----------------------------------------


def test_stl_components_match_pandas_and_sum_back(spark, sf_dir):
    out = _q("stl_decompose_daily", spark, sf_dir)
    daily = _daily_clicks(spark, sf_dir)
    trend = daily.rolling(7, center=True).mean().dropna()
    det = daily.loc[trend.index] - trend
    dow = ((trend.index - pd.Timestamp("1970-01-01")).days + 4) % 7
    seasonal = det.groupby(dow).mean()
    assert len(out) == len(trend)
    for row in out.itertuples():
        d = pd.Timestamp(row.d)
        dw = ((d - pd.Timestamp("1970-01-01")).days + 4) % 7
        assert math.isclose(row.trend, trend[d], abs_tol=1e-6)
        assert math.isclose(row.seasonal, seasonal[dw], abs_tol=1e-6)
        assert math.isclose(
            row.resid, daily[d] - trend[d] - seasonal[dw], abs_tol=1e-5
        )
        # decomposition identity: cnt = trend + seasonal + resid
        assert math.isclose(
            row.cnt, row.trend + row.seasonal + row.resid, abs_tol=2e-5
        )
    # seasonal means to ~zero over the decomposed days (weighted by k)
    assert abs(out.seasonal.mean()) < out.cnt.mean() * 0.5


# ---- X164 theil_sen_daily_trend --------------------------------------


def test_theil_sen_matches_numpy(spark, sf_dir):
    out = _q("theil_sen_daily_trend", spark, sf_dir).iloc[0]
    daily = _daily_clicks(spark, sf_dir)
    di = np.array(
        [(d - pd.Timestamp("1970-01-01")).days for d in daily.index],
        dtype=np.int64,
    )
    cnt = daily.values.astype(np.int64)
    slopes = [
        round((cnt[j] - cnt[i]) / (di[j] - di[i]), 9)
        for i in range(len(di))
        for j in range(i + 1, len(di))
    ]
    assert int(out.n_days) == len(di)
    assert int(out.n_pairs) == len(slopes)
    assert math.isclose(
        out.sen_slope, np.quantile(slopes, 0.5), abs_tol=2e-6
    )
    n = len(di)
    ols = (n * (di * cnt).sum() - di.sum() * cnt.sum()) / (
        n * (di * di).sum() - di.sum() ** 2
    )
    assert math.isclose(out.ols_slope, round(ols, 6), abs_tol=1e-6)


# ---- X165 acf_ljung_box_daily ----------------------------------------


def test_acf_ljung_box_matches_numpy(spark, sf_dir):
    out = _q("acf_ljung_box_daily", spark, sf_dir).sort_values("lag")
    daily = _daily_clicks(spark, sf_dir)
    x = daily.values.astype(np.float64)
    n = len(x)
    c = x - x.mean()
    den = (c * c).sum()
    q = 0.0
    for row in out.itertuples():
        k = int(row.lag)
        r = (c[:-k] * c[k:]).sum() / den
        assert int(row.n_pairs) == n - k
        assert math.isclose(row.acf, r, abs_tol=1e-5), k
        q += round(r, 9) ** 2 / (n - k)
        assert math.isclose(
            row.q_lb, n * (n + 2) * q, abs_tol=1e-3
        ), k
        assert bool(row.significant) == (
            round(row.q_lb, 6) > _CHI2_05[k - 1]
        )
    # ACF bounded
    assert (out.acf.abs() <= 1.0 + 1e-9).all()


# ---- X166 partition_layout_advisor -----------------------------------


def test_partition_advisor_matches_pandas(spark, sf_dir):
    out = _q("partition_layout_advisor", spark, sf_dir).set_index(
        "candidate"
    )
    o = load_table(spark, sf_dir, "orders").toPandas()
    cands = {
        "o_orderdate_day": o.o_orderdate.dt.normalize(),
        "o_orderpriority": o.o_orderpriority,
        "o_orderstatus": o.o_orderstatus,
    }
    for cand, col in cands.items():
        g = col.value_counts()
        row = out.loc[cand]
        np_, total, mx = len(g), int(g.sum()), int(g.max())
        assert int(row.n_partitions) == np_
        assert int(row.rows_total) == total
        assert int(row.max_partition_rows) == mx
        assert math.isclose(
            row.top1_share, round(mx / total, 6), abs_tol=1e-9
        )
        if np_ > 1000:
            want = "too_many_partitions"
        elif mx * 2 > total:
            want = "skewed"
        elif total < np_ * 1000:
            want = "too_few_rows"
        else:
            want = "ok"
        assert row.verdict == want, cand

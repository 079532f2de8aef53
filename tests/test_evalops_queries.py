"""Round-6 model-eval / operational-data batch (X167-X172) vs
independent pure-Python/numpy references — same discipline as
test_series_queries.py."""

from __future__ import annotations

import collections
import itertools
import math

import numpy as np

from data_engineering_1_spark.io import load_table
from data_engineering_1_spark.plans import registry


def _q(name, spark, sf_dir):
    return registry.get_queries()[name](spark, sf_dir).toPandas()


def _order_scores(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").toPandas()
    s = np.round(o.o_totalprice.values * 100).astype(np.int64)
    y = (o.o_orderstatus == "F").values.astype(np.int64)
    return o.o_orderkey.values.astype(np.int64), s, y


# ---- X167 roc_auc_order_status ----------------------------------------


def test_auc_matches_rank_statistic(spark, sf_dir):
    out = _q("roc_auc_order_status", spark, sf_dir).iloc[0]
    _, s, y = _order_scores(spark, sf_dir)
    # tie-averaged ranks, numpy-only (scipy.rankdata 'average' twin)
    order = np.argsort(s, kind="stable")
    ranks = np.empty(len(s), dtype=np.float64)
    sorted_s = s[order]
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and sorted_s[j] == sorted_s[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2  # avg of ranks i+1..j
        i = j
    n1, n0 = int(y.sum()), int((1 - y).sum())
    auc = (ranks[y == 1].sum() - n1 * (n1 + 1) / 2) / (n1 * n0)
    assert int(out.n_pos) == n1 and int(out.n_neg) == n0
    assert int(out.n_distinct_scores) == len(np.unique(s))
    assert math.isclose(out.auc, auc, abs_tol=1e-6)
    assert math.isclose(out.gini, 2 * auc - 1, abs_tol=2e-6)
    assert 0.0 <= out.auc <= 1.0


def test_auc_is_half_for_uninformative_score(spark, sf_dir):
    # the identity every AUC implementation must satisfy: a CONSTANT
    # score ties every pair -> tie-averaged AUC is exactly 0.5. Check
    # the rank-sum algebra directly on a tiny hand case.
    y = np.array([1, 0, 1, 0, 0])
    ranks = np.full(5, 3.0)  # all tied at avg rank (1+5)/2
    n1, n0 = 2, 3
    auc = (ranks[y == 1].sum() - n1 * (n1 + 1) / 2) / (n1 * n0)
    assert auc == 0.5


# ---- X168 calibration_bins_orders -------------------------------------


def test_calibration_bins_match_numpy(spark, sf_dir):
    out = _q("calibration_bins_orders", spark, sf_dir).set_index("bin")
    ok, s, y = _order_scores(spark, sf_dir)
    n = len(s)
    order = np.lexsort((ok, s))
    rn = np.empty(n, dtype=np.int64)
    rn[order] = np.arange(1, n + 1)
    bins = (10 * (rn - 1)) // n
    assert sorted(out.index) == sorted(set(bins))
    for b in range(10):
        m = bins == b
        cnt = int(m.sum())
        row = out.loc[b]
        assert int(row.n_rows) == cnt
        pred = rn[m] / n
        assert math.isclose(row.mean_pred, round(pred.mean(), 6), abs_tol=1e-6)
        assert math.isclose(
            row.frac_pos, round(y[m].mean(), 6), abs_tol=1e-6
        )
        assert math.isclose(
            row.calib_gap,
            round(abs(y[m].mean() - pred.mean()), 6),
            abs_tol=2e-6,
        )
        assert math.isclose(
            row.brier,
            round(((pred - y[m]) ** 2).mean(), 6),
            abs_tol=2e-6,
        )
    # rank-calibrated score must be near-perfectly calibrated overall:
    # mean_pred tracks the decile midpoints
    assert (out.mean_pred.diff().dropna() > 0).all()


# ---- X169 inventory_running_balance -----------------------------------


def test_running_balance_matches_sequential_fold(spark, sf_dir):
    out = _q("inventory_running_balance", spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    li = li[li.l_suppkey % 10 == 0]
    li["d"] = li.l_shipdate.dt.normalize()
    li["net"] = np.where(
        li.l_returnflag == "R", li.l_quantity, -li.l_quantity
    ).astype(np.int64)
    daily = (
        li.groupby(["l_suppkey", "d"]).net.sum().sort_index()
    )
    # literal sequential fold: S_t = max(0, S_{t-1} + x_t)
    want = {}
    for (sk, d), x in daily.items():
        if sk in want:
            _, prev_bal, prev_lost = want[sk][-1]
        else:
            prev_bal, prev_lost = 0, 0
        bal = max(0, prev_bal + int(x))
        lost = prev_lost + max(0, -(prev_bal + int(x)))
        want.setdefault(sk, []).append((d, bal, lost))
    import pandas as pd

    got = {
        (r.l_suppkey, pd.Timestamp(r.d)): (
            int(r.balance),
            int(r.cum_shortfall),
        )
        for r in out.itertuples()
    }
    n_checked = 0
    for sk, seq in want.items():
        for d, bal, lost in seq:
            assert got[(sk, d)] == (bal, lost), (sk, d)
            n_checked += 1
    assert n_checked == len(out)
    # clamp semantics actually bind somewhere (otherwise the test is
    # vacuous): some supplier has a real stockout
    assert (out.cum_shortfall > 0).any()
    assert (out.balance >= 0).all()


# ---- X170 cdc_apply_users ---------------------------------------------


def test_cdc_apply_matches_pure_python(spark, sf_dir):
    out = _q("cdc_apply_users", spark, sf_dir).set_index("user_id")
    ev = load_table(spark, sf_dir, "events").toPandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    state, changes, deletes = {}, collections.Counter(), collections.Counter()
    for r in ev.itertuples():
        changes[r.user_id] += 1
        if r.event_type == "error":
            deletes[r.user_id] += 1
            state.pop(r.user_id, None)
        else:
            state[r.user_id] = (r.ts, int(round(r.value * 100)))
    assert set(out.index) == set(state)
    for uid, (ts, cents) in state.items():
        row = out.loc[uid]
        assert row.last_ts == ts
        assert int(row.last_value_cents) == cents
        assert int(row.n_changes) == changes[uid]
        assert int(row.n_deletes) == deletes[uid]
    # tombstone semantics bind: some user's final op was a delete
    assert len(state) < len(changes)


# ---- X171 cheapest_path_copurchase ------------------------------------


def _weighted_edges(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    cnt = collections.Counter()
    for _, g in li.groupby("l_orderkey"):
        for u, v in itertools.combinations(sorted(set(g.l_partkey)), 2):
            cnt[(u, v)] += 1
    adj = collections.defaultdict(list)
    for (u, v), c in cnt.items():
        cost = 101 - min(100, c)
        adj[u].append((v, cost))
        adj[v].append((u, cost))
    return adj


def test_cheapest_path_matches_bellman_ford(spark, sf_dir):
    out = _q("cheapest_path_copurchase", spark, sf_dir)
    adj = _weighted_edges(spark, sf_dir)
    dist = {n: 0 for n in adj if n % 100 == 0}
    for _ in range(3):  # synchronous min-plus rounds, the operator twin
        nxt = dict(dist)
        for u, d in dist.items():
            for v, c in adj[u]:
                if v not in nxt or d + c < nxt[v]:
                    nxt[v] = d + c
        dist = nxt
    want = collections.Counter(dist.values())
    checks = collections.defaultdict(int)
    for n, d in dist.items():
        checks[d] += n
    assert list(out.dist) == sorted(want)
    for row in out.itertuples():
        assert int(row.n_nodes) == want[row.dist], row.dist
        assert int(row.node_checksum) == checks[row.dist], row.dist
    # weights actually matter: more than just {0} distances, and some
    # non-seed node is reached through a cheap (strong) edge
    assert len(want) > 2


def test_min_plus_with_unit_costs_equals_bfs(spark, sf_dir):
    # degenerate check: cost=1 min-plus == BFS hops on the same graph
    from pyspark.sql import functions as F

    from data_engineering_1_spark.operators.graph import (
        bfs_hops,
        min_plus_hops,
    )
    from data_engineering_1_spark.plans.series_queries import (
        _copurchase_edges,
    )

    edges = _copurchase_edges(spark, sf_dir).localCheckpoint()
    seeds = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .where(F.col("node") % 100 == 0)
    )
    unit = edges.withColumn("cost", F.lit(1))
    got = {
        (r.node, r.dist)
        for r in min_plus_hops(unit, seeds, rounds=3).collect()
    }
    want = {
        (r.node, r.hop) for r in bfs_hops(edges, seeds, max_hops=3).collect()
    }
    assert got == want


# ---- X172 clustering_coefficient_copurchase ---------------------------


def test_clustering_coefficient_matches_pure_python(spark, sf_dir):
    out = _q("clustering_coefficient_copurchase", spark, sf_dir).iloc[0]
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    adj = collections.defaultdict(set)
    for _, g in li.groupby("l_orderkey"):
        for u, v in itertools.combinations(sorted(set(g.l_partkey)), 2):
            adj[u].add(v)
            adj[v].add(u)
    tri = collections.Counter()
    total_tri = 0
    for u, nb in adj.items():
        for v in nb:
            if v > u:
                common = adj[u] & adj[v]
                for w in common:
                    if w > v:  # count each triangle once
                        total_tri += 1
                        tri[u] += 1
                        tri[v] += 1
                        tri[w] += 1
    wedges = sum(len(nb) * (len(nb) - 1) for nb in adj.values()) // 2
    assert int(out.n_nodes) == len(adj)
    assert int(out.n_wedges) == wedges
    assert int(out.n_triangles) == total_tri
    assert math.isclose(
        out.transitivity, 3 * total_tri / (2 * wedges), abs_tol=1e-6
    )
    coefs = [
        round(2 * tri[u] / (len(nb) * (len(nb) - 1)), 9)
        for u, nb in adj.items()
        if len(nb) >= 2
    ]
    assert math.isclose(
        out.avg_local_coef, sum(coefs) / len(coefs), abs_tol=1e-6
    )
    assert 0.0 <= out.transitivity <= 1.0
    assert 0.0 <= out.avg_local_coef <= 1.0

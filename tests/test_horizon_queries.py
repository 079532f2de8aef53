"""Round-6 temporal/embedding batch (X281-X286) vs independent
pure-Python references — same discipline as test_metrics_queries.py."""

from __future__ import annotations

import collections
import math

import pandas as pd

from data_engineering_1_spark.io import load_table
from data_engineering_1_spark.plans import registry


def _q(name, spark, sf_dir):
    return registry.get_queries()[name](spark, sf_dir).toPandas()


# ---- X281 embedding_truncation_fidelity ----------------------------------


def test_truncation_curve_matches_numpy(spark, sf_dir):
    import numpy as np

    out = _q("embedding_truncation_fidelity", spark, sf_dir).set_index(
        "k"
    )
    emb = load_table(spark, sf_dir, "embeddings").toPandas()
    vecs = {
        int(r.vec_id): np.round(
            np.array(r.embedding, dtype=float) * 1_000_000
        )
        for r in emb.itertuples()
    }
    pairs = [
        (v, v + 1)
        for v in vecs
        if v % 10 == 0 and (v + 1) in vecs
    ]
    deltas = collections.defaultdict(list)
    for va, vb in pairs:
        qa, qb = vecs[va], vecs[vb]
        cos = {}
        for k in (8, 16, 32, 64):
            dot = float(qa[:k] @ qb[:k])
            cos[k] = round(
                dot
                / math.sqrt(float(qa[:k] @ qa[:k]) * float(qb[:k] @ qb[:k])),
                9,
            )
        for k in (8, 16, 32, 64):
            deltas[k].append(abs(cos[k] - cos[64]))
    for k in (8, 16, 32, 64):
        r = out.loc[k]
        assert int(r.n_pairs) == len(pairs)
        assert math.isclose(
            r.mean_abs_delta,
            round(sum(deltas[k]) / len(pairs), 6),
            abs_tol=1e-6,
        )
        assert math.isclose(
            r.max_abs_delta, max(deltas[k]), abs_tol=1e-9
        )
    # anchors: k = 64 is exactly zero; fidelity improves with k
    assert out.loc[64].mean_abs_delta == 0.0
    assert (
        out.loc[8].mean_abs_delta
        >= out.loc[16].mean_abs_delta
        >= out.loc[32].mean_abs_delta
    )


# ---- X282 sequential_rules_parts ------------------------------------------


def test_sequential_rules_match_pure_python(spark, sf_dir):
    out = _q("sequential_rules_parts", spark, sf_dir)
    o = load_table(spark, sf_dir, "orders").toPandas()
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    j["d"] = pd.to_datetime(j.o_orderdate).dt.normalize()
    firsts = j.groupby(["o_custkey", "l_partkey"]).d.min()
    buyers_all = firsts.groupby("l_partkey").size()
    top = set(
        buyers_all.rename("nb")
        .reset_index()
        .sort_values(["nb", "l_partkey"], ascending=[False, True])
        .head(50)
        .l_partkey
    )
    n_cust = firsts.reset_index().o_custkey.nunique()
    supp = collections.Counter()
    by_cust = collections.defaultdict(list)
    for (c, p), d in firsts.items():
        if p in top:
            by_cust[c].append((p, d))
    buyers = collections.Counter()
    for c, lst in by_cust.items():
        for p, _ in lst:
            buyers[p] += 1
        for pa, da in lst:
            for pb, db in lst:
                if pa != pb and da < db:
                    supp[(pa, pb)] += 1
    ranked = sorted(supp, key=lambda k: (-supp[k], k))[:30]
    assert list(zip(out.ante, out.conseq)) == ranked
    for r in out.itertuples():
        s = supp[(r.ante, r.conseq)]
        assert int(r.support) == s
        assert int(r.ante_buyers) == buyers[r.ante]
        assert int(r.conseq_buyers) == buyers[r.conseq]
        assert math.isclose(
            r.confidence, round(s / buyers[r.ante], 6), abs_tol=1e-9
        )
        assert math.isclose(
            r.lift,
            round(s * n_cust / (buyers[r.ante] * buyers[r.conseq]), 6),
            abs_tol=1e-6,
        )
        # strict temporal direction: support(A->B) counts are
        # asymmetric in general (forward != backward is possible)
        assert r.confidence <= 1 + 1e-12


# ---- X283 temporal_reach_parts -----------------------------------------------


def test_temporal_reach_matches_literal_relaxation(spark, sf_dir):
    out = _q("temporal_reach_parts", spark, sf_dir)
    o = load_table(spark, sf_dir, "orders").toPandas()
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    j["t"] = (
        pd.to_datetime(j.o_orderdate).dt.normalize()
        - pd.Timestamp("1970-01-01")
    ).dt.days
    edges = set()
    for (_, t), g in j.groupby(["l_orderkey", "t"]):
        parts = sorted(set(g.l_partkey))
        for i, u in enumerate(parts):
            for v in parts[i + 1 :]:
                edges.add((u, v, t))
                edges.add((v, u, t))
    seed = min(e[0] for e in edges)
    arrival = {seed: 0}
    for _ in range(3):
        nxt = dict(arrival)
        for u, v, t in edges:
            if u in arrival and t >= arrival[u]:
                if v not in nxt or t < nxt[v]:
                    nxt[v] = min(nxt.get(v, t), t)
        arrival = nxt
    top = sorted(arrival, key=lambda n: (arrival[n], n))[:30]
    assert list(out.part_key) == top
    for r in out.itertuples():
        assert int(r.arrival_day) == arrival[r.part_key]
    # temporal constraint bites: static 3-hop BFS reaches at least
    # as many nodes as the time-respecting walk
    static = {seed}
    adj = collections.defaultdict(set)
    for u, v, _ in edges:
        adj[u].add(v)
    for _ in range(3):
        static = static | {
            v for u in static for v in adj[u]
        }
    assert len(arrival) <= len(static)


# ---- X284 ss_policy_inventory ----------------------------------------------------


def test_ss_policy_matches_literal_state_machine(spark, sf_dir):
    out = _q("ss_policy_inventory", spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    li["d"] = pd.to_datetime(li.l_shipdate).dt.normalize()
    daily = (
        li.groupby(["l_partkey", "d"])
        .l_quantity.sum()
        .astype(int)
        .reset_index()
    )
    totals = daily.groupby("l_partkey").l_quantity.sum().astype(int)
    top = (
        totals.reset_index()
        .sort_values(
            ["l_quantity", "l_partkey"], ascending=[False, True]
        )
        .head(30)
    )
    assert list(out.l_partkey) == list(top.l_partkey)
    for r in out.itertuples():
        seq = daily[daily.l_partkey == r.l_partkey].sort_values("d")
        inv, orders, stockouts = 400, 0, 0
        for q in seq.l_quantity:
            inv -= int(q)
            if inv < 0:
                stockouts += 1
                inv = 0
            if inv < 40:
                orders += 1
                inv = 400
        assert int(r.total_qty) == int(totals[r.l_partkey])
        assert int(r.final_inventory) == inv
        assert int(r.n_reorders) == orders
        assert int(r.stockout_days) == stockouts
        # policy invariant: the fold always ends in [s, S] after a
        # reorder or within [0, S) otherwise
        assert 0 <= r.final_inventory <= 400


# ---- X285 trigram_diversity_sources -----------------------------------------------


def test_trigram_diversity_matches_counter(spark, sf_dir):
    out = _q("trigram_diversity_sources", spark, sf_dir).set_index(
        "source"
    )
    docs = load_table(spark, sf_dir, "documents").toPandas()
    for src, g in docs.groupby("source"):
        cnt = collections.Counter()
        for text in g.text:
            toks = text.strip().lower().split()
            for i in range(len(toks) - 2):
                cnt[" ".join(toks[i : i + 3])] += 1
        n = sum(cnt.values())
        v = len(cnt)
        hapax = sum(1 for c in cnt.values() if c == 1)
        r = out.loc[src]
        assert int(r.n_trigrams) == n
        assert int(r.v_types) == v
        assert int(r.hapax) == hapax
        assert math.isclose(r.ttr, round(v / n, 6), abs_tol=1e-9)
        assert math.isclose(
            r.hapax_share, round(hapax / v, 6), abs_tol=1e-9
        )
        herdan = round(math.log(v), 9) / round(math.log(n), 9)
        assert math.isclose(
            r.herdan_c, round(herdan, 6), abs_tol=1e-6
        )
        # diversity exponent is a genuine fraction for a real corpus
        assert 0 < r.herdan_c < 1


# ---- X286 wau_mau_stickiness --------------------------------------------------------


def test_wau_mau_matches_set_windows(spark, sf_dir):
    out = _q("wau_mau_stickiness", spark, sf_dir)
    e = load_table(spark, sf_dir, "events").toPandas()
    e["day"] = pd.to_datetime(e.ts).dt.normalize()
    by_day = e.groupby("day").user_id.apply(set)
    days = sorted(by_day.index)
    assert len(out) == len(days)
    out = out.copy()
    out["event_day"] = pd.to_datetime(out.event_day)
    for r in out.itertuples():
        d = r.event_day
        dau = len(by_day[d])
        wau = len(
            set().union(
                *[
                    by_day[x]
                    for x in days
                    if d - pd.Timedelta(days=6) <= x <= d
                ]
            )
        )
        mau = len(
            set().union(
                *[
                    by_day[x]
                    for x in days
                    if d - pd.Timedelta(days=29) <= x <= d
                ]
            )
        )
        assert int(r.dau) == dau
        assert int(r.wau) == wau
        assert int(r.mau) == mau
        assert math.isclose(
            r.stickiness, round(dau / mau, 6), abs_tol=1e-9
        )
        # containment: DAU <= WAU <= MAU
        assert dau <= wau <= mau

"""Round-6 statistical-governance batch (X287-X292) vs independent
pure-Python references — same discipline as test_horizon_queries.py."""

from __future__ import annotations

import bisect
import collections
import hashlib
import math
from statistics import NormalDist

import pandas as pd

from data_engineering_1_spark.io import load_table
from data_engineering_1_spark.plans import registry
from data_engineering_1_spark.plans.governance_queries import (
    _BH_CRIT,
    _HOLM_CRIT,
)


def _q(name, spark, sf_dir):
    return registry.get_queries()[name](spark, sf_dir).toPandas()


def _h12(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


# ---- X287 consistent_hash_rebalance ---------------------------------------


def test_consistent_hash_movement_and_balance(spark, sf_dir):
    out = _q("consistent_hash_rebalance", spark, sf_dir).iloc[0]
    cust = load_table(spark, sf_dir, "customer").toPandas()

    def ring(n):
        pts = sorted(
            (_h12(f"node|{s}|{v}"), s)
            for s in range(n)
            for v in range(32)
        )
        return [p for p, _ in pts], [s for _, s in pts]

    pa, sa = ring(8)
    pb, sb = ring(9)

    def assign(kp, pos, shards):
        i = bisect.bisect_left(pos, kp)
        return shards[i % len(shards)]

    moved = mod_moved = 0
    loads = collections.Counter()
    for k in cust.c_custkey:
        kp = _h12(f"key|{k}")
        a, b = assign(kp, pa, sa), assign(kp, pb, sb)
        loads[a] += 1
        moved += a != b
        mod_moved += (k % 8) != (k % 9)
    n = len(cust)
    assert int(out.n_keys) == n
    assert int(out.ch_moved) == moved
    assert int(out.mod_moved) == mod_moved
    assert math.isclose(
        out.ch_moved_share, round(moved / n, 6), abs_tol=1e-9
    )
    assert int(out.max_load_a) == max(loads.values())
    assert int(out.min_load_a) == min(loads.values())
    # THE elasticity property: consistent hashing moves FAR less
    # than modulo (≈1/9 vs ≈8/9)
    assert out.ch_moved_share < 0.3 < out.mod_moved_share


# ---- X288 simpsons_reversal_audit ------------------------------------------


def _orders_cust(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").toPandas()
    c = load_table(spark, sf_dir, "customer").toPandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["y"] = (j.o_orderstatus == "F").astype(int)
    return j


def test_simpsons_directions_match_fractions(spark, sf_dir):
    out = _q("simpsons_reversal_audit", spark, sf_dir).set_index(
        "nation"
    )
    j = _orders_cust(spark, sf_dir)
    an, af = len(j), int(j.y.sum())
    for nat, g in j.groupby("c_nationkey"):
        nn, nf = len(g), int(g.y.sum())
        rest_n, rest_f = an - nn, af - nf
        r = out.loc[nat]
        assert math.isclose(
            r.pooled_rate, round(nf / nn, 6), abs_tol=1e-9
        )
        assert math.isclose(
            r.rest_rate, round(rest_f / rest_n, 6), abs_tol=1e-9
        )
        assert bool(r.pooled_higher) == (
            nf * rest_n > rest_f * nn
        )
        hi = lo = segs = 0
        for seg, gs in j.groupby("c_mktsegment"):
            cell = gs[gs.c_nationkey == nat]
            if len(cell) == 0:
                continue
            segs += 1
            cn, cf = len(cell), int(cell.y.sum())
            on, of_ = len(gs) - cn, int(gs.y.sum()) - cf
            if cf * on > of_ * cn:
                hi += 1
            elif cf * on < of_ * cn:
                lo += 1
        assert int(r.n_segments) == segs
        assert int(r.seg_higher) == hi
        assert int(r.seg_lower) == lo
        expect_rev = (
            bool(r.pooled_higher) and lo == segs
        ) or ((nf * rest_n < rest_f * nn) and hi == segs)
        assert bool(r.full_reversal) == expect_rev


# ---- X289 scd2_asof_snapshot ---------------------------------------------------


def test_scd2_asof_matches_literal_replay(spark, sf_dir):
    out = _q("scd2_asof_snapshot", spark, sf_dir).set_index("state")
    e = load_table(spark, sf_dir, "events").toPandas()
    e["ts"] = pd.to_datetime(e.ts)
    lo = (e.ts.min().normalize() - pd.Timestamp("1970-01-01")).days
    hi = (e.ts.max().normalize() - pd.Timestamp("1970-01-01")).days
    t = pd.Timestamp("1970-01-01") + pd.Timedelta(days=(lo + hi) // 2)
    census = collections.Counter()
    for _, g in e.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        state = None
        prev = object()
        cur = None
        for r in g.itertuples():
            if r.event_type != prev:
                # a state change; record if it began before t
                if r.ts <= t:
                    cur = r.event_type
                prev = r.event_type
        if cur is not None:
            census[cur] += 1
    assert sorted(out.index) == sorted(census)
    for s, n in census.items():
        assert int(out.loc[s].n_users) == n
    # the SCD2 invariant: every as-of-active user counted once
    assert int(out.n_users.sum()) == sum(census.values())


# ---- X290/X291 multiple-testing corrections ---------------------------------------


def _nation_zs(spark, sf_dir):
    j = _orders_cust(spark, sf_dir)
    n, f = len(j), int(j.y.sum())
    p = f / n
    zs = {}
    for nat, g in j.groupby("c_nationkey"):
        n1, f1 = len(g), int(g.y.sum())
        n2, f2 = n - n1, f - f1
        z = abs(f1 / n1 - f2 / n2) / math.sqrt(
            p * (1 - p) * (1 / n1 + 1 / n2)
        )
        zs[nat] = round(z, 9)
    return zs


def test_holm_stepdown_matches_pure_python(spark, sf_dir):
    out = _q("holm_bonferroni_tests", spark, sf_dir)
    zs = _nation_zs(spark, sf_dir)
    ranked = sorted(zs, key=lambda k: (-zs[k], k))
    assert list(out.nation) == ranked
    rejecting = True
    for i, r in enumerate(out.itertuples()):
        assert math.isclose(r.abs_z, zs[r.nation], abs_tol=1e-9)
        assert math.isclose(
            r.critical_z, _HOLM_CRIT[i], abs_tol=1e-9
        )
        rejecting = rejecting and zs[r.nation] >= _HOLM_CRIT[i]
        assert bool(r.rejected) == rejecting
    # the ladder is valid: computed from the inverse normal
    nd = NormalDist()
    for k in (1, 13, 25):
        assert math.isclose(
            _HOLM_CRIT[k - 1],
            nd.inv_cdf(1 - 0.05 / (2 * (25 - k + 1))),
            abs_tol=1e-6,
        )


def test_bh_stepup_contains_holm_rejections(spark, sf_dir):
    holm = _q("holm_bonferroni_tests", spark, sf_dir)
    bh = _q("benjamini_hochberg_tests", spark, sf_dir)
    zs = _nation_zs(spark, sf_dir)
    k_star = 0
    ranked = sorted(zs, key=lambda k: (-zs[k], k))
    for i, nat in enumerate(ranked):
        if zs[nat] >= _BH_CRIT[i]:
            k_star = i + 1
    for i, r in enumerate(bh.itertuples()):
        assert math.isclose(
            r.critical_z, _BH_CRIT[i], abs_tol=1e-9
        )
        assert bool(r.rejected) == (i + 1 <= k_star)
    # FDR control rejects AT LEAST as much as FWER control
    assert set(holm[holm.rejected].nation) <= set(
        bh[bh.rejected].nation
    )
    # and the BH ladder is monotone decreasing
    assert all(
        a >= b for a, b in zip(_BH_CRIT, _BH_CRIT[1:])
    )


# ---- X292 standardized_rates_nations ------------------------------------------------


def test_standardization_matches_weighted_recompute(spark, sf_dir):
    out = _q("standardized_rates_nations", spark, sf_dir).set_index(
        "nation"
    )
    j = _orders_cust(spark, sf_dir)
    grand = len(j)
    segw = {
        s: round(len(g) / grand, 9)
        for s, g in j.groupby("c_mktsegment")
    }
    for nat, g in j.groupby("c_nationkey"):
        crude = round(int(g.y.sum()) / len(g), 6)
        std = 0.0
        for s, w in segw.items():
            cell = g[g.c_mktsegment == s]
            if len(cell):
                std += w * round(int(cell.y.sum()) / len(cell), 9)
        r = out.loc[nat]
        assert math.isclose(r.crude_rate, crude, abs_tol=1e-9)
        assert math.isclose(
            r.standardized_rate, round(std, 6), abs_tol=1e-6
        )
        assert math.isclose(
            r.mix_effect,
            round(std - int(g.y.sum()) / len(g), 6),
            abs_tol=1e-6,
        )
    # standardization preserves the overall scale: rates stay in [0,1]
    assert ((out.standardized_rate >= 0) & (out.standardized_rate <= 1)).all()

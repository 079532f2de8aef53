"""Round-6 frontier/coverage batch (X215-X220) vs independent
pure-Python/numpy references — same discipline as
test_stewardship_queries.py."""

from __future__ import annotations

import collections
import itertools
import math
import re

import numpy as np
import pandas as pd

from data_engineering_1_spark.io import load_table
from data_engineering_1_spark.plans import registry


def _q(name, spark, sf_dir):
    return registry.get_queries()[name](spark, sf_dir).toPandas()


# ---- X215 skyline_orders_2d -------------------------------------------


def test_skyline_matches_brute_force_dominance(spark, sf_dir):
    out = _q("skyline_orders_2d", spark, sf_dir)
    o = load_table(spark, sf_dir, "orders").toPandas()
    pts = [
        (
            r.o_orderkey,
            int(round(r.o_totalprice * 100)),
            (r.o_orderdate.normalize() - pd.Timestamp("1970-01-01")).days,
        )
        for r in o.itertuples()
    ]
    # brute-force: k survives iff no other point dominates it, with
    # coincident points collapsing to the lowest key (the documented
    # tie policy)
    want = set()
    for k, c, d in pts:
        dominated = any(
            (c2 < c and d2 >= d)
            or (c2 <= c and d2 > d)
            or (c2 == c and d2 == d and k2 < k)
            for k2, c2, d2 in pts
            if k2 != k
        )
        if not dominated:
            want.add((k, c, d))
    got = {
        (r.o_orderkey, int(r.cents), int(r.order_day))
        for r in out.itertuples()
    }
    assert got == want
    # frontier is strictly monotone: price up => date up
    srt = out.sort_values("cents")
    assert (srt.order_day.diff().dropna() > 0).all()


# ---- X216 coverage_gaps_daily -----------------------------------------


def test_coverage_matches_pandas(spark, sf_dir):
    out = _q("coverage_gaps_daily", spark, sf_dir).set_index(
        "event_type"
    )
    ev = load_table(spark, sf_dir, "events").toPandas()
    ev["d"] = ev.ts.dt.normalize()
    span = pd.date_range(ev.d.min(), ev.d.max(), freq="D")
    for et, g in ev.groupby("event_type"):
        present = set(g.d)
        gaps = [d for d in span if d not in present]
        row = out.loc[et]
        assert int(row.n_days_span) == len(span)
        assert int(row.n_days_present) == len(present & set(span))
        assert int(row.n_gap_days) == len(gaps)
        assert math.isclose(
            row.coverage_share,
            round((len(span) - len(gaps)) / len(span), 6),
            abs_tol=1e-9,
        )
        if gaps:
            assert pd.Timestamp(row.first_gap_day) == gaps[0]
        else:
            assert row.first_gap_day is None or pd.isna(
                row.first_gap_day
            )


# ---- X217 modularity_brand_partition ----------------------------------


def test_modularity_matches_pure_python(spark, sf_dir):
    out = _q("modularity_brand_partition", spark, sf_dir).iloc[0]
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    p = load_table(spark, sf_dir, "part").toPandas()
    brand = dict(zip(p.p_partkey, p.p_brand))
    und = set()
    for _, g in li.groupby("l_orderkey"):
        for u, v in itertools.combinations(sorted(set(g.l_partkey)), 2):
            und.add((u, v))
    two_m = 2 * len(und)
    e_in2 = 2 * sum(1 for u, v in und if brand[u] == brand[v])
    deg_c = collections.Counter()
    for u, v in und:
        deg_c[brand[u]] += 1
        deg_c[brand[v]] += 1
    q = e_in2 / two_m - sum(k * k for k in deg_c.values()) / (
        two_m * two_m
    )
    assert int(out.n_edges) == len(und)
    assert int(out.n_communities) == len(deg_c)
    assert math.isclose(out.modularity_q, round(q, 6), abs_tol=1e-6)
    assert -1.0 <= out.modularity_q <= 1.0


# ---- X218 l_diversity_audit -------------------------------------------


def test_l_diversity_matches_pandas(spark, sf_dir):
    out = _q("l_diversity_audit", spark, sf_dir).set_index(
        ["c_nationkey", "c_mktsegment"]
    )
    c = load_table(spark, sf_dir, "customer").toPandas()
    o = load_table(spark, sf_dir, "orders").toPandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    for (nk, seg), g in j.groupby(["c_nationkey", "c_mktsegment"]):
        row = out.loc[(nk, seg)]
        assert int(row.group_size) == len(g)
        assert int(row.l_distinct) == g.o_orderpriority.nunique()
        assert bool(row.l3_diverse) == (g.o_orderpriority.nunique() >= 3)
    assert len(out) == j.groupby(["c_nationkey", "c_mktsegment"]).ngroups


# ---- X219 word_burstiness_top30 ---------------------------------------


def test_burstiness_matches_pure_python(spark, sf_dir):
    out = _q("word_burstiness_top30", spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").toPandas()
    df = collections.Counter()
    df2 = collections.Counter()
    tf = collections.Counter()
    for r in docs.itertuples():
        counts = collections.Counter(
            re.split(r"\s+", r.text.strip().lower())
        )
        for w, n in counts.items():
            df[w] += 1
            tf[w] += n
            if n >= 2:
                df2[w] += 1
    top = sorted(df, key=lambda w: (-df[w], w))[:30]
    assert list(out.tok) == top
    for r in out.itertuples():
        assert int(r.df) == df[r.tok]
        assert int(r.tf) == tf[r.tok]
        assert math.isclose(
            r.burstiness, round(df2[r.tok] / df[r.tok], 6), abs_tol=1e-9
        )
        assert math.isclose(
            r.mean_tf_given_present,
            round(tf[r.tok] / df[r.tok], 6),
            abs_tol=1e-9,
        )
    # the phenomenon is present: top words repeat within documents
    assert out.burstiness.max() > 0


# ---- X220 user_acquisition_curve --------------------------------------


def test_acquisition_curve_matches_pandas(spark, sf_dir):
    out = _q("user_acquisition_curve", spark, sf_dir)
    ev = load_table(spark, sf_dir, "events").toPandas()
    pu = ev[ev.event_type == "purchase"]
    first = pu.groupby("user_id").ts.min().dt.normalize()
    daily = first.value_counts().sort_index()
    cum = daily.cumsum()
    assert len(out) == len(daily)
    for r in out.itertuples():
        d = pd.Timestamp(r.d)
        assert int(r.n_new) == daily[d]
        assert int(r.cumulative_users) == cum[d]
    # conservation: the curve ends at the total distinct-buyer count
    assert int(out.cumulative_users.iloc[-1]) == pu.user_id.nunique()
    # it is a real curve on this fixture (more than one activation day)
    assert len(out) > 1

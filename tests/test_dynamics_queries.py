"""Round-6 dynamics/association batch (X227-X232) vs independent
pure-Python/numpy references — same discipline as
test_decision_queries.py."""

from __future__ import annotations

import collections
import math

import numpy as np
import pandas as pd

from data_engineering_1_spark.io import load_table
from data_engineering_1_spark.plans import registry


def _q(name, spark, sf_dir):
    return registry.get_queries()[name](spark, sf_dir).toPandas()


# ---- X227 type_correlation_matrix -------------------------------------


def test_type_correlation_matches_numpy(spark, sf_dir):
    out = _q("type_correlation_matrix", spark, sf_dir).set_index(
        ["type_a", "type_b"]
    )
    ev = load_table(spark, sf_dir, "events").toPandas()
    daily = (
        ev.groupby(["event_type", ev.ts.dt.normalize()])
        .size()
        .unstack(0)
    )
    types = sorted(daily.columns)
    n_pairs = 0
    for i, a in enumerate(types):
        for b in types[i + 1 :]:
            m = daily[[a, b]].dropna()
            r = np.corrcoef(m[a], m[b])[0, 1]
            row = out.loc[(a, b)]
            assert int(row.n_days) == len(m)
            assert math.isclose(row.pearson_r, r, abs_tol=1e-5), (a, b)
            n_pairs += 1
    assert len(out) == n_pairs == len(types) * (len(types) - 1) // 2


# ---- X228 weekly_rank_spearman ----------------------------------------


def test_spearman_matches_scipy_free(spark, sf_dir):
    out = _q("weekly_rank_spearman", spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    li["wk"] = (
        li.l_shipdate.dt.normalize()
        - pd.to_timedelta(li.l_shipdate.dt.weekday, unit="D")
    )
    weekly = (
        li.groupby(["wk", "l_partkey"])
        .l_quantity.sum()
        .astype(np.int64)
    )
    got = {pd.Timestamp(r.wk): r for r in out.itertuples()}
    weeks = sorted(weekly.index.get_level_values(0).unique())
    checked = 0
    for prev, cur in zip(weeks, weeks[1:]):
        if (cur - prev).days != 7:
            continue
        a = weekly.loc[cur]
        b = weekly.loc[prev]
        common = sorted(set(a.index) & set(b.index))
        if len(common) < 2:
            continue
        ra = {
            k: i + 1
            for i, k in enumerate(
                sorted(common, key=lambda k: (-a[k], k))
            )
        }
        rb = {
            k: i + 1
            for i, k in enumerate(
                sorted(common, key=lambda k: (-b[k], k))
            )
        }
        n = len(common)
        d2 = sum((ra[k] - rb[k]) ** 2 for k in common)
        rho = 1 - 6 * d2 / (n * (n * n - 1))
        row = got[cur]
        assert int(row.n_common) == n, cur
        assert math.isclose(
            row.spearman_rho, round(rho, 6), abs_tol=1e-6
        ), cur
        checked += 1
    assert checked == len(out)
    assert (out.spearman_rho.abs() <= 1.0 + 1e-9).all()


# ---- X229 gains_chart_deciles -----------------------------------------


def test_gains_chart_matches_numpy(spark, sf_dir):
    out = _q("gains_chart_deciles", spark, sf_dir).set_index("decile")
    o = load_table(spark, sf_dir, "orders").toPandas()
    s = (o.o_totalprice * 100).round().astype(np.int64).values
    y = (o.o_orderstatus == "F").astype(np.int64).values
    k = o.o_orderkey.values
    order = np.lexsort((k, -s))  # score desc, key asc
    n = len(s)
    total_pos = int(y.sum())
    rn = np.empty(n, dtype=np.int64)
    rn[order] = np.arange(1, n + 1)
    bins = (10 * (rn - 1)) // n
    cum = 0
    for b in range(10):
        m = bins == b
        cum += int(y[m].sum())
        row = out.loc[b]
        assert int(row.n_rows) == int(m.sum())
        assert int(row.n_pos) == int(y[m].sum())
        assert math.isclose(
            row.cum_capture, round(cum / total_pos, 6), abs_tol=1e-6
        )
        assert math.isclose(
            row.lift,
            round(cum / total_pos * 10 / (b + 1), 6),
            abs_tol=1e-5,
        )
    # gains curve ends at 1 and starts at the top decile's capture
    assert math.isclose(out.loc[9].cum_capture, 1.0, abs_tol=1e-9)


# ---- X230 session_handoff_matrix --------------------------------------


def test_handoff_matrix_matches_pure_python(spark, sf_dir):
    out = _q("session_handoff_matrix", spark, sf_dir)
    ev = load_table(spark, sf_dir, "events").toPandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    gap_us = 30 * 60 * 1_000_000
    counts = collections.Counter()
    for _, g in ev.groupby("user_id"):
        sessions = []
        cur = []
        prev = None
        for r in g.itertuples():
            us = int(r.ts.value // 1000)
            if prev is None or us - prev > gap_us:
                if cur:
                    sessions.append(cur)
                cur = []
            cur.append(r.event_type)
            prev = us
        if cur:
            sessions.append(cur)
        for s1, s2 in zip(sessions, sessions[1:]):
            counts[(s1[-1], s2[0])] += 1
    got = {
        (r.from_type, r.to_type): int(r.n_handoffs)
        for r in out.itertuples()
    }
    assert got == dict(counts)
    # handoffs conserve: total = sum over users of (n_sessions - 1)
    assert sum(got.values()) == sum(counts.values())


# ---- X231 demand_classification_parts ---------------------------------


def test_demand_classes_match_pure_python(spark, sf_dir):
    out = _q("demand_classification_parts", spark, sf_dir).set_index(
        "demand_class"
    )
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    li["wk"] = (
        li.l_shipdate.dt.normalize()
        - pd.to_timedelta(li.l_shipdate.dt.weekday, unit="D")
    )
    weekly = (
        li.groupby(["l_partkey", "wk"])
        .l_quantity.sum()
        .astype(np.int64)
    )
    agg = collections.defaultdict(lambda: [0, 0])
    for pk in weekly.index.get_level_values(0).unique():
        s = weekly.loc[pk]
        k = len(s)
        if k < 2:
            continue
        span_days = (s.index.max() - s.index.min()).days
        s1 = int(s.sum())
        s2 = int((s.astype(object) ** 2).sum())
        adi_low = 100 * span_days < 924 * (k - 1)
        cv2_low = 100 * (k * s2 - s1 * s1) < 49 * s1 * s1
        cls = (
            "smooth"
            if adi_low and cv2_low
            else "intermittent"
            if cv2_low
            else "erratic"
            if adi_low
            else "lumpy"
        )
        agg[cls][0] += 1
        agg[cls][1] += k
    assert set(out.index) == set(agg)
    for cls, (np_, nw) in agg.items():
        assert int(out.loc[cls].n_parts) == np_, cls
        assert int(out.loc[cls].n_demand_weeks) == nw, cls


# ---- X232 cramers_v_pairs ---------------------------------------------


def test_cramers_v_matches_pure_python(spark, sf_dir):
    out = _q("cramers_v_pairs", spark, sf_dir).set_index("pair")
    o = load_table(spark, sf_dir, "orders").toPandas()
    c = load_table(spark, sf_dir, "customer").toPandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    dow = (
        (
            (j.o_orderdate.dt.normalize() - pd.Timestamp("1970-01-01"))
            .dt.days
            + 4
        )
        % 7
    ).astype(str)
    pairs = {
        "priority_x_status": (j.o_orderpriority, j.o_orderstatus),
        "segment_x_status": (j.c_mktsegment, j.o_orderstatus),
        "dow_x_priority": (dow, j.o_orderpriority),
    }
    for name, (a, b) in pairs.items():
        tab = pd.crosstab(a, b)
        # completeness precondition of the cells-that-exist formula
        assert (tab > 0).all().all(), name
        n = tab.values.sum()
        ra = tab.sum(axis=1).values[:, None]
        cb = tab.sum(axis=0).values[None, :]
        chi2 = float(
            sum(
                round((n * o_ij - r * c_) ** 2 / (n * n * r * c_), 9)
                for o_ij, r, c_ in zip(
                    tab.values.flatten(),
                    np.repeat(ra.flatten(), tab.shape[1]),
                    np.tile(cb.flatten(), tab.shape[0]),
                )
            )
        )
        v = math.sqrt(chi2 / (n * min(tab.shape[0] - 1, tab.shape[1] - 1)))
        row = out.loc[name]
        assert int(row.n_rows_a) == tab.shape[0]
        assert int(row.n_cols_b) == tab.shape[1]
        assert math.isclose(row.chi2, round(chi2, 6), abs_tol=1e-4), name
        assert math.isclose(row.cramers_v, round(v, 6), abs_tol=1e-6)
        assert 0.0 <= row.cramers_v <= 1.0

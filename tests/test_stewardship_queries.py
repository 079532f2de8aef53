"""Round-6 data-stewardship batch (X209-X214) vs independent
pure-Python/numpy references — same discipline as
test_inference_queries.py."""

from __future__ import annotations

import collections
import math
import re

import numpy as np
import pandas as pd

from data_engineering_1_spark.io import load_table
from data_engineering_1_spark.plans import registry
from data_engineering_1_spark.plans.stewardship_queries import (
    _CHURN_HORIZON_DAYS,
    _FK_EDGES,
)


def _q(name, spark, sf_dir):
    return registry.get_queries()[name](spark, sf_dir).toPandas()


# ---- X209 price_elasticity_by_brand -----------------------------------


def test_elasticity_matches_numpy(spark, sf_dir):
    out = _q("price_elasticity_by_brand", spark, sf_dir).set_index(
        "p_brand"
    )
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    p = load_table(spark, sf_dir, "part").toPandas()
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    for brand, g in j.groupby("p_brand"):
        ly = np.round(np.log(g.l_quantity.astype(float)), 9)
        cents = (g.l_extendedprice * 100).round().astype(np.int64)
        lx = np.round(np.log(cents / 100.0), 9)
        n = len(g)
        slope = (n * (lx * ly).sum() - lx.sum() * ly.sum()) / (
            n * (lx * lx).sum() - lx.sum() ** 2
        )
        row = out.loc[brand]
        assert int(row.n) == n
        assert math.isclose(
            row.elasticity, round(slope, 6), abs_tol=1e-5
        ), brand


# ---- X210 freshness_audit_tables --------------------------------------


def test_freshness_matches_pandas(spark, sf_dir):
    out = _q("freshness_audit_tables", spark, sf_dir).set_index(
        "table_name"
    )
    specs = {
        "events": ("events", "ts"),
        "orders": ("orders", "o_orderdate"),
        "lineitem": ("lineitem", "l_shipdate"),
    }
    newest = {}
    for name, (tbl, col) in specs.items():
        df = load_table(spark, sf_dir, tbl).toPandas()
        newest[name] = df[col].dt.normalize().max()
        row = out.loc[name]
        assert int(row.n_rows) == len(df)
        assert pd.Timestamp(row.oldest) == df[col].dt.normalize().min()
        assert pd.Timestamp(row.newest) == newest[name]
    global_newest = max(newest.values())
    for name in specs:
        row = out.loc[name]
        stale = (global_newest - newest[name]).days
        assert int(row.staleness_days) == stale, name
        assert bool(row.stale) == (stale > 30), name


# ---- X211 referential_coverage_audit ----------------------------------


def test_referential_coverage_matches_pandas(spark, sf_dir):
    out = _q("referential_coverage_audit", spark, sf_dir).set_index(
        "fk_edge"
    )
    for ct, ck, pt, pk in _FK_EDGES:
        child = load_table(spark, sf_dir, ct).toPandas()
        parent = load_table(spark, sf_dir, pt).toPandas()
        pset = set(parent[pk])
        cset = set(child[ck])
        row = out.loc[f"{ct}.{ck}->{pt}.{pk}"]
        assert int(row.n_orphan_children) == int(
            (~child[ck].isin(pset)).sum()
        )
        assert int(row.n_childless_parents) == int(
            (~parent[pk].isin(cset)).sum()
        )
        assert int(row.n_parents) == len(parent)
    # the fixture has some childless parents (dimension superset) OR
    # full coverage — either way every orphan count is consistent
    assert (out.n_orphan_children >= 0).all()


# ---- X212 order_reconciliation_audit ----------------------------------


def test_reconciliation_matches_decimal_exact(spark, sf_dir):
    from decimal import Decimal

    out = _q("order_reconciliation_audit", spark, sf_dir).iloc[0]
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    o = load_table(spark, sf_dir, "orders").toPandas()
    sums = collections.defaultdict(Decimal)
    for r in li.itertuples():
        sums[r.l_orderkey] += (
            Decimal(f"{r.l_extendedprice:.2f}")
            * (1 - Decimal(f"{r.l_discount:.2f}"))
            * (1 + Decimal(f"{r.l_tax:.2f}"))
        )
    n = matched = 0
    max_abs = 0
    for r in o.itertuples():
        if r.o_orderkey not in sums:
            continue
        n += 1
        hdr = int(round(r.o_totalprice * 100))
        line = int(
            (sums[r.o_orderkey] * 100).quantize(
                Decimal(1), rounding="ROUND_HALF_UP"
            )
        )
        d = hdr - line
        if d == 0:
            matched += 1
        max_abs = max(max_abs, abs(d))
    assert int(out.n_orders_with_lines) == n
    assert int(out.n_matched) == matched
    assert int(out.n_mismatched) == n - matched
    assert int(out.max_abs_diff_cents) == max_abs
    assert math.isclose(
        out.mismatch_share, round((n - matched) / n, 6), abs_tol=1e-9
    )


# ---- X213 source_vocab_overlap ----------------------------------------


def test_vocab_overlap_matches_pure_python(spark, sf_dir):
    out = _q("source_vocab_overlap", spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").toPandas()
    vocab = collections.defaultdict(set)
    for r in docs.itertuples():
        vocab[r.source].update(re.split(r"\s+", r.text.strip().lower()))
    srcs = sorted(vocab)
    want = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            inter = len(vocab[a] & vocab[b])
            want[(a, b)] = (
                inter,
                len(vocab[a]),
                len(vocab[b]),
                round(
                    inter / (len(vocab[a]) + len(vocab[b]) - inter), 6
                ),
            )
    assert len(out) == len(want)
    for r in out.itertuples():
        inter, na, nb, jac = want[(r.source_a, r.source_b)]
        assert int(r.n_shared) == inter
        assert int(r.n_tok_a) == na
        assert int(r.n_tok_b) == nb
        assert math.isclose(r.vocab_jaccard, jac, abs_tol=1e-9)
    # all pairs of the 20 sources present
    assert len(out) == len(srcs) * (len(srcs) - 1) // 2


# ---- X214 churn_label_snapshot ----------------------------------------


def test_churn_labels_match_pure_python(spark, sf_dir):
    out = _q("churn_label_snapshot", spark, sf_dir).set_index("user_id")
    ev = load_table(spark, sf_dir, "events").toPandas()
    ev["d"] = ev.ts.dt.normalize()
    snap = ev.d.max() - pd.Timedelta(days=_CHURN_HORIZON_DAYS)
    past = ev[ev.d <= snap]
    future_buyers = set(
        ev[(ev.d > snap) & (ev.event_type == "purchase")].user_id
    )
    assert len(out) == past.user_id.nunique()
    for uid, g in past.groupby("user_id"):
        row = out.loc[uid]
        assert int(row.n_events_past) == len(g)
        assert int(row.n_purchases_past) == int(
            (g.event_type == "purchase").sum()
        )
        assert int(row.days_since_last_seen) == (snap - g.d.max()).days
        assert bool(row.churned) == (uid not in future_buyers), uid
    # temporal-leakage guard: features only see the past — a user
    # whose FIRST event is after the snapshot must be absent entirely
    post_only = set(ev.user_id) - set(past.user_id)
    assert post_only.isdisjoint(set(out.index))
    # label is non-degenerate: both classes present
    assert out.churned.any() and (~out.churned).any()

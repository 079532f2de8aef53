"""Round-6 encoding/evaluation batch (X257-X262) vs independent
pure-Python references — same discipline as test_linkage_queries.py."""

from __future__ import annotations

import collections
import hashlib
import math

import pandas as pd

from data_engineering_1_spark.io import load_table
from data_engineering_1_spark.plans import registry


def _q(name, spark, sf_dir):
    return registry.get_queries()[name](spark, sf_dir).toPandas()


def _orders_cust(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").toPandas()
    c = load_table(spark, sf_dir, "customer").toPandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["y"] = (j.o_orderstatus == "F").astype(int)
    return j


# ---- X257 target_encode_loo ---------------------------------------------


def test_loo_encoding_excludes_own_label(spark, sf_dir):
    out = _q("target_encode_loo", spark, sf_dir)
    j = _orders_cust(spark, sf_dir)
    grp = j.groupby("c_nationkey").y.agg(["sum", "count"])
    m = j.set_index("o_orderkey")
    assert len(out) == len(j)
    for r in out.sample(200, random_state=7).itertuples():
        row = m.loc[r.o_orderkey]
        n, s = int(grp.loc[row.c_nationkey, "count"]), int(
            grp.loc[row.c_nationkey, "sum"]
        )
        assert int(r.y) == row.y
        if n == 1:
            assert pd.isna(r.loo_enc)
        else:
            assert math.isclose(
                r.loo_enc,
                round((s - row.y) / (n - 1), 6),
                abs_tol=1e-9,
            )
    # the defining property: two rows in one group with DIFFERENT
    # labels get DIFFERENT encodings (plain target encoding gives
    # every member the same value)
    g = out.merge(
        j[["o_orderkey", "c_nationkey"]], on="o_orderkey"
    )
    diff = g.groupby("c_nationkey_y" if "c_nationkey_y" in g else
                     "c_nationkey").apply(
        lambda d: d[d.y == 1].loo_enc.iloc[0]
        != d[d.y == 0].loo_enc.iloc[0]
        if (d.y == 1).any() and (d.y == 0).any()
        else None,
        include_groups=False,
    )
    assert diff.dropna().all()


# ---- X258 pr_auc_order_status ----------------------------------------------


def test_average_precision_matches_block_recompute(spark, sf_dir):
    out = _q("pr_auc_order_status", spark, sf_dir).set_index("segment")
    j = _orders_cust(spark, sf_dir)
    j["score"] = (j.o_totalprice * 100).round().astype(int)
    for seg, g in j.groupby("c_mktsegment"):
        blocks = (
            g.groupby("score")
            .y.agg(["sum", "count"])
            .sort_index(ascending=False)
        )
        cum_pos = cum_all = 0
        num = 0.0
        for _, row in blocks.iterrows():
            cum_pos += int(row["sum"])
            cum_all += int(row["count"])
            num += int(row["sum"]) * round(cum_pos / cum_all, 9)
        r = out.loc[seg]
        total_pos = int(g.y.sum())
        assert int(r.n) == len(g) and int(r.n_pos) == total_pos
        assert math.isclose(
            r.avg_precision, round(num / total_pos, 6), abs_tol=1e-6
        )
        # AP of a near-random scorer is near the base rate
        base = total_pos / len(g)
        assert abs(r.avg_precision - base) < 0.2


# ---- X259 t_closeness_audit ---------------------------------------------------


def test_t_closeness_emd_matches_integer_recompute(spark, sf_dir):
    out = _q("t_closeness_audit", spark, sf_dir)
    j = _orders_cust(spark, sf_dir)
    j["pr"] = j.o_orderpriority.str[0].astype(int)
    n = len(j)
    gcum = {
        k: int((j.pr <= k).sum()) for k in range(1, 5)
    }
    seen = 0
    for r in out.itertuples():
        g = j[
            (j.c_nationkey == r.c_nationkey)
            & (j.c_mktsegment == r.c_mktsegment)
        ]
        gs = len(g)
        assert int(r.group_size) == gs
        emd_num = sum(
            abs(int((g.pr <= k).sum()) * n - gcum[k] * gs)
            for k in range(1, 5)
        )
        assert math.isclose(
            r.emd, round(emd_num / (4 * gs * n), 6), abs_tol=1e-9
        )
        assert bool(r.t_close_02) == (5 * emd_num <= 4 * gs * n)
        seen += gs
    assert seen == n  # every row belongs to exactly one group
    # EMD is a normalized distance: in [0, 1]
    assert ((out.emd >= 0) & (out.emd <= 1)).all()


# ---- X260 brown_double_smoothing_daily ------------------------------------------


def test_brown_smoothing_matches_literal_folds(spark, sf_dir):
    out = _q("brown_double_smoothing_daily", spark, sf_dir)
    o = load_table(spark, sf_dir, "orders").toPandas()
    o["day"] = pd.to_datetime(o.o_orderdate).dt.normalize()
    o["cents"] = (o.o_totalprice * 100).round().astype(int)
    daily = (o.groupby("day").cents.sum() / 100).sort_index()
    vals = list(daily)

    def fold(xs):
        acc = xs[0]
        for x in xs[1:]:
            acc = acc * 0.5 + x * 0.5
        return acc

    s1 = [fold(vals[max(0, i - 50) : i + 1]) for i in range(len(vals))]
    s2 = [fold(s1[max(0, i - 50) : i + 1]) for i in range(len(s1))]
    assert len(out) == len(vals)
    for i, r in enumerate(out.itertuples()):
        level = 2 * s1[i] - s2[i]
        trend = s1[i] - s2[i]
        assert math.isclose(r.val, round(vals[i], 6), abs_tol=1e-6)
        assert math.isclose(r.level, round(level, 6), abs_tol=1e-6)
        assert math.isclose(r.trend, round(trend, 6), abs_tol=1e-6)
        assert math.isclose(
            r.forecast_7d, round(level + 7 * trend, 6), abs_tol=1e-6
        )


# ---- X261 feature_hash_buckets ----------------------------------------------------


def test_feature_hash_census_matches_md5(spark, sf_dir):
    out = _q("feature_hash_buckets", spark, sf_dir).set_index("bucket")
    p = load_table(spark, sf_dir, "part").toPandas()
    buckets = collections.defaultdict(lambda: [set(), 0])
    for feat, series in (
        ("brand", p.p_brand),
        ("type", p.p_type),
        ("size", p.p_size.astype(str)),
    ):
        for v, cnt in series.value_counts().items():
            h = hashlib.md5(f"fh|{feat}|{v}".encode()).hexdigest()
            b = int(h[:8], 16) % 128
            buckets[b][0].add((feat, v))
            buckets[b][1] += int(cnt)
    assert sorted(out.index) == sorted(buckets)
    collided = 0
    for b, (vals, rows) in buckets.items():
        r = out.loc[b]
        assert int(r.n_values) == len(vals)
        assert int(r.n_rows) == rows
        assert bool(r.collided) == (len(vals) > 1)
        collided += len(vals) > 1
    # with ~100 values in 128 buckets some collisions MUST exist
    # (birthday bound) — the census is measuring something real
    assert collided > 0
    # conservation: every (feat, value) row lands in exactly one bucket
    assert int(out.n_rows.sum()) == 3 * len(p)


# ---- X262 mcc_rule_classifier -----------------------------------------------------


def test_mcc_matches_confusion_formula(spark, sf_dir):
    out = _q("mcc_rule_classifier", spark, sf_dir).set_index("segment")
    j = _orders_cust(spark, sf_dir)
    j["pred"] = j.o_orderpriority.isin(["1-URGENT", "2-HIGH"]).astype(
        int
    )
    for seg, g in j.groupby("c_mktsegment"):
        tp = int(((g.pred == 1) & (g.y == 1)).sum())
        fp = int(((g.pred == 1) & (g.y == 0)).sum())
        tn = int(((g.pred == 0) & (g.y == 0)).sum())
        fn = int(((g.pred == 0) & (g.y == 1)).sum())
        r = out.loc[seg]
        assert (int(r.tp), int(r.fp), int(r.tn), int(r.fn)) == (
            tp,
            fp,
            tn,
            fn,
        )
        n = tp + fp + tn + fn
        assert math.isclose(
            r.accuracy, round((tp + tn) / n, 6), abs_tol=1e-9
        )
        assert math.isclose(
            r.f1, round(2 * tp / (2 * tp + fp + fn), 6), abs_tol=1e-9
        )
        mcc = (tp * tn - fp * fn) / math.sqrt(
            (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
        )
        assert math.isclose(r.mcc, round(mcc, 6), abs_tol=1e-6)
        # MCC is bounded
        assert -1 <= r.mcc <= 1

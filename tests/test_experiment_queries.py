"""Round-6 distributed-ID / experimentation-statistics batch
(X155-X160) vs independent pure-Python/numpy references — same
discipline as test_analytics_queries.py."""

from __future__ import annotations

import collections
import hashlib
import math

import numpy as np
import pandas as pd

from data_engineering_1_spark.io import load_table
from data_engineering_1_spark.plans import registry
from data_engineering_1_spark.plans.experiment_queries import (
    _BUDGET,
    _LADDER,
    _POIS,
    _SPLIT,
)


def _q(name, spark, sf_dir):
    return registry.get_queries()[name](spark, sf_dir).toPandas()


def _toks(text):
    return text.strip().lower().split()


# ---- X155 surrogate_keys_dense ---------------------------------------


def test_surrogate_keys_dense_and_ordered(spark, sf_dir):
    out = _q("surrogate_keys_dense", spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").toPandas()
    want = docs.sort_values(["source", "doc_id"]).reset_index(drop=True)
    assert len(out) == len(docs)
    # dense, gap-free, 1-based
    assert sorted(out.sk) == list(range(1, len(docs) + 1))
    got = out.sort_values("sk").reset_index(drop=True)
    assert list(got.doc_id) == list(want.doc_id)
    assert list(got.source) == list(want.source)


def test_two_phase_rank_equals_global_row_number(spark, sf_dir):
    # the operator itself, on a different table/order than the query
    from pyspark.sql import functions as F

    from data_engineering_1_spark.operators.ranks import (
        two_phase_row_number,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    ranked = two_phase_row_number(
        o,
        shard=F.expr("o_orderkey DIV 100"),
        order_cols=["o_orderkey"],
        out_col="rn",
    ).toPandas()
    want = ranked.sort_values("o_orderkey").reset_index(drop=True)
    assert list(want.rn) == list(range(1, len(want) + 1))


# ---- X156 rater_agreement_kappa --------------------------------------


def test_kappa_matches_pure_python(spark, sf_dir):
    out = _q("rater_agreement_kappa", spark, sf_dir).iloc[0]
    docs = load_table(spark, sf_dir, "documents").toPandas()
    n11 = n10 = n01 = n00 = 0
    for t in docs.text:
        ws = _toks(t)
        a = 30 <= len(ws) <= 80
        b = len(set(ws)) * 100 >= 45 * len(ws)
        if a and b:
            n11 += 1
        elif a:
            n10 += 1
        elif b:
            n01 += 1
        else:
            n00 += 1
    n = len(docs)
    assert (int(out.n11), int(out.n10), int(out.n01), int(out.n00)) == (
        n11, n10, n01, n00,
    )
    po = (n11 + n00) / n
    pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / n**2
    kappa = (po - pe) / (1 - pe)
    assert math.isclose(out.po, round(po, 6), abs_tol=1e-9)
    assert math.isclose(out.pe, round(pe, 6), abs_tol=1e-9)
    assert math.isclose(out.kappa, kappa, abs_tol=1e-5)
    # kappa is bounded and the raters are positively associated here
    assert -1.0 <= out.kappa <= 1.0


# ---- X157 poisson_bootstrap_ci ---------------------------------------


def test_poisson_bootstrap_matches_pure_python(spark, sf_dir):
    out = _q("poisson_bootstrap_ci", spark, sf_dir).iloc[0]
    ev = load_table(spark, sf_dir, "events").toPandas()
    clicks = ev[ev.event_type == "click"].copy()
    daily = clicks.groupby(clicks.ts.dt.date).size()

    def weight(d, b):
        h = hashlib.md5(f"{d}|{b}".encode()).hexdigest()
        u = int(h[:8], 16) % 10000
        for k, t in enumerate(_POIS):
            if u < t:
                return k
        return len(_POIS)

    means = []
    for b in range(1, 201):
        sw = swc = 0
        for d, c in daily.items():
            w = weight(d, b)
            sw += w
            swc += w * c
        if sw > 0:
            means.append(round(swc / sw, 9))
    means = np.array(means)
    assert int(out.n_days) == len(daily)
    assert int(out.n_boot) == len(means)
    assert math.isclose(
        out.est_mean, round(daily.sum() / len(daily), 6), abs_tol=1e-9
    )
    for col, q in [("ci_lo", 0.025), ("ci_med", 0.5), ("ci_hi", 0.975)]:
        want = np.quantile(means, q)  # linear interpolation, same conv.
        assert math.isclose(out[col], want, abs_tol=2e-6), col
    # the interval brackets the point estimate
    assert out.ci_lo <= out.est_mean <= out.ci_hi
    assert out.ci_lo < out.ci_hi


# ---- X158 jackknife_ratio_variance -----------------------------------


def test_jackknife_matches_numpy(spark, sf_dir):
    out = _q("jackknife_ratio_variance", spark, sf_dir).iloc[0]
    ev = load_table(spark, sf_dir, "events").toPandas()
    ev = ev[ev.event_type.isin(["purchase", "click"])]
    g = (
        ev.assign(grp=ev.user_id % 50)
        .groupby("grp")
        .event_type.agg(
            p=lambda s: (s == "purchase").sum(),
            c=lambda s: (s == "click").sum(),
        )
    )
    P, C, G = int(g.p.sum()), int(g.c.sum()), len(g)
    thetas = np.round((P - g.p.values) / (C - g.c.values), 9)
    se = math.sqrt(
        (G - 1) / G * float(((thetas - thetas.mean()) ** 2).sum())
    )
    assert (int(out.n_groups), int(out.purchases), int(out.clicks)) == (
        G, P, C,
    )
    assert math.isclose(out.theta_hat, round(P / C, 6), abs_tol=1e-9)
    assert math.isclose(out.se_jack, se, abs_tol=1e-5)
    # jackknife SE of a ratio over 50 fat groups is small but nonzero
    assert 0 < out.se_jack < out.theta_hat


# ---- X159 cuped_adjusted_lift ----------------------------------------


def test_cuped_matches_numpy_and_reduces_variance(spark, sf_dir):
    out = _q("cuped_adjusted_lift", spark, sf_dir).set_index("arm")
    ev = load_table(spark, sf_dir, "events").toPandas()
    p = ev[ev.event_type == "purchase"].copy()
    p["cents"] = (p.value * 100).round().astype("int64")
    split = pd.Timestamp(_SPLIT)
    u = p.groupby("user_id").apply(
        lambda gr: pd.Series(
            {
                "x": gr.cents[gr.ts < split].sum(),
                "y": gr.cents[gr.ts >= split].sum(),
            }
        ),
        include_groups=False,
    )
    u["arm"] = u.index % 2
    x, y = u.x.values.astype(float), u.y.values.astype(float)
    n = len(u)
    theta = round(
        (n * (x * y).sum() - x.sum() * y.sum())
        / (n * (x * x).sum() - x.sum() ** 2),
        9,
    )
    xbar = round(x.sum() / n, 9)
    u["ya"] = np.round(y - theta * (x - xbar), 6)
    for arm, gr in u.groupby("arm"):
        row = out.loc[arm]
        assert int(row.n_users) == len(gr)
        assert math.isclose(
            row.mean_y_cents, round(gr.y.mean(), 6), abs_tol=1e-6
        )
        assert math.isclose(
            row.mean_y_adj, round(gr.ya.mean(), 6), abs_tol=1e-6
        )
        assert math.isclose(row.theta, theta, abs_tol=1e-9)
    # CUPED's point: the adjusted metric has lower pooled variance
    assert u.ya.var() < u.y.var()
    # and arm means shift by theta * (arm pre-period imbalance)
    lift_raw = u[u.arm == 1].y.mean() - u[u.arm == 0].y.mean()
    lift_adj = u[u.arm == 1].ya.mean() - u[u.arm == 0].ya.mean()
    imb = u[u.arm == 1].x.mean() - u[u.arm == 0].x.mean()
    assert math.isclose(
        lift_raw - lift_adj, theta * imb, rel_tol=1e-3, abs_tol=1e-3
    )


# ---- X160 length_bucket_batches --------------------------------------


def test_length_bucket_batches_matches_pure_python(spark, sf_dir):
    out = _q("length_bucket_batches", spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").toPandas()

    def ceilpow2(n):
        for p in _LADDER:
            if n <= p:
                return p
        return 2048

    rows = sorted(
        (ceilpow2(len(_toks(t))), d, len(_toks(t)))
        for d, t in zip(docs.doc_id, docs.text)
    )
    want = collections.defaultdict(lambda: [0, 0])
    by_bucket = collections.Counter()
    for bucket, d, wc in rows:
        rn = by_bucket[bucket] = by_bucket[bucket] + 1
        batch = (rn - 1) // (_BUDGET // bucket)
        want[(bucket, batch)][0] += 1
        want[(bucket, batch)][1] += wc
    assert len(out) == len(want)
    for row in out.itertuples():
        nd, tok = want[(row.bucket, row.batch_id)]
        assert int(row.n_docs) == nd
        assert int(row.tokens) == tok
        assert int(row.padded_tokens) == nd * row.bucket
        assert math.isclose(
            row.utilization, round(tok / (nd * row.bucket), 6),
            abs_tol=1e-9,
        )
    # every non-final batch in a bucket is exactly full
    for bucket, gr in out.groupby("bucket"):
        cap = _BUDGET // bucket
        full = gr.sort_values("batch_id").iloc[:-1]
        assert (full.n_docs == cap).all()
    # token conservation across all batches
    assert out.tokens.sum() == sum(wc for _, _, wc in rows)

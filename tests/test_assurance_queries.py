"""Round-6 data-assurance batch (X185-X190) vs independent
pure-Python/numpy references — same discipline as
test_integrity_queries.py."""

from __future__ import annotations

import collections
import hashlib
import math

import numpy as np

from data_engineering_1_spark.io import load_table
from data_engineering_1_spark.plans import registry
from data_engineering_1_spark.plans.assurance_queries import (
    _CV_FOLDS,
    _DP_B,
    _FD_CANDIDATES,
)


def _q(name, spark, sf_dir):
    return registry.get_queries()[name](spark, sf_dir).toPandas()


def _bridge(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# ---- X185 dp_noisy_event_counts ---------------------------------------


def test_dp_noise_matches_inverse_cdf(spark, sf_dir):
    out = _q("dp_noisy_event_counts", spark, sf_dir).set_index(
        "event_type"
    )
    ev = load_table(spark, sf_dir, "events").toPandas()
    for et, g in ev.groupby("event_type"):
        u = ((_bridge(f"dplap|{et}") % 1000000) + 0.5) / 1000000 - 0.5
        l9 = round(math.log(1 - 2 * abs(u)), 9)
        noise = (-_DP_B if u >= 0 else _DP_B) * l9
        row = out.loc[et]
        assert int(row.true_count) == len(g)
        assert math.isclose(row.noise, round(noise, 6), abs_tol=1e-6)
        assert math.isclose(
            row.noisy_count, round(len(g) + noise, 6), abs_tol=1e-6
        )
    # noise is real: at least one released count differs from truth
    assert (out.noise.abs() > 1e-9).any()
    # and bounded: |noise| has Laplace(b) tails; 20b is beyond-astro
    assert (out.noise.abs() < 20 * _DP_B).all()


# ---- X186 fd_discovery_orders -----------------------------------------


def test_fd_discovery_matches_pandas(spark, sf_dir):
    out = _q("fd_discovery_orders", spark, sf_dir).set_index(
        ["determinant", "dependent"]
    )
    o = load_table(spark, sf_dir, "orders").toPandas()
    for det, dep in _FD_CANDIDATES:
        nd = o.groupby(det)[dep].nunique()
        row = out.loc[(det, dep)]
        assert int(row.n_groups) == len(nd)
        assert int(row.n_violating_groups) == int((nd > 1).sum())
        assert bool(row.holds) == bool((nd <= 1).all())
        assert math.isclose(
            row.violation_share,
            round((nd > 1).sum() / len(nd), 6),
            abs_tol=1e-9,
        )
    # the candidate list is non-degenerate: some hold, some don't
    assert out.holds.any() and (~out.holds).any()


# ---- X187 edit1_name_join ----------------------------------------------


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_edit1_join_matches_brute_force(spark, sf_dir):
    out = _q("edit1_name_join", spark, sf_dir)
    p = load_table(spark, sf_dir, "part").toPandas()
    names = list(zip(p.p_partkey, p.p_name))
    want = set()
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            (ka, na), (kb, nb) = names[i], names[j]
            if ka > kb:
                ka, kb, na, nb = kb, ka, nb, na
            if na != nb and _lev(na, nb) <= 1:
                want.add((ka, kb))
    got = {(r.part_a, r.part_b) for r in out.itertuples()}
    # completeness theorem: deletion-neighborhood join finds EVERY pair
    assert got == want
    assert (out.edit_distance == 1).all()  # equal names excluded
    assert len(got) > 0


# ---- X188 outlier_ensemble_events ---------------------------------------


def test_outlier_ensemble_matches_numpy(spark, sf_dir):
    out = _q("outlier_ensemble_events", spark, sf_dir).set_index(
        "event_id"
    )
    ev = load_table(spark, sf_dir, "events").toPandas()
    x = (ev.value * 100).round().astype(np.int64).values
    n = len(x)
    q1 = round(np.quantile(x, 0.25), 6)
    q3 = round(np.quantile(x, 0.75), 6)
    med = round(np.quantile(x, 0.5), 6)
    mad = round(np.quantile(np.abs(x - med), 0.5), 6)
    s1, s2 = int(x.sum()), int((x.astype(object) ** 2).sum())
    flagged = {}
    for eid, xi in zip(ev.event_id, x):
        xi = int(xi)
        iqr_f = xi > q3 + 1.5 * (q3 - q1) or xi < q1 - 1.5 * (q3 - q1)
        z_f = (n * xi - s1) ** 2 > 9 * (n * s2 - s1 * s1)
        mad_f = round(0.6745 * abs(xi - med) / mad, 6) > 3.5
        votes = int(iqr_f) + int(z_f) + int(mad_f)
        if votes >= 2:
            flagged[eid] = (iqr_f, z_f, mad_f, votes)
    assert set(out.index) == set(flagged)
    for eid, (iqr_f, z_f, mad_f, votes) in flagged.items():
        row = out.loc[eid]
        assert bool(row.iqr_flag) == iqr_f
        assert bool(row.z_flag) == z_f
        assert bool(row.mad_flag) == mad_f
        assert int(row.votes) == votes
    # consensus is stricter than any single method
    assert len(flagged) > 0


# ---- X189 embedding_clip_bounds -----------------------------------------


def test_clip_bounds_match_numpy(spark, sf_dir):
    out = _q("embedding_clip_bounds", spark, sf_dir).set_index("dim")
    emb = load_table(spark, sf_dir, "embeddings").toPandas()
    mat = np.array(
        [
            [
                int(math.floor(float(v) * 1000000 + 0.5))
                if float(v) >= 0
                else -int(math.floor(-float(v) * 1000000 + 0.5))
                for v in e
            ]
            for e in emb.embedding
        ],
        dtype=np.int64,
    )
    for d in range(1, 65):
        col = mat[:, d - 1]
        lo = round(np.quantile(col, 0.01), 6)
        hi = round(np.quantile(col, 0.99), 6)
        row = out.loc[d]
        assert math.isclose(row.clip_lo_q, lo, abs_tol=1e-6), d
        assert math.isclose(row.clip_hi_q, hi, abs_tol=1e-6), d
        assert int(row.n_below) == int((col < lo).sum()), d
        assert int(row.n_above) == int((col > hi).sum()), d
    # p1/p99 clip roughly 1% per side
    assert out.n_below.sum() + out.n_above.sum() > 0


# ---- X190 cv_fold_auc ----------------------------------------------------


def test_cv_fold_auc_matches_rank_statistic(spark, sf_dir):
    out = _q("cv_fold_auc", spark, sf_dir).set_index("fold")
    o = load_table(spark, sf_dir, "orders").toPandas()
    o["fold"] = [
        _bridge(f"fold|{k}") % _CV_FOLDS for k in o.o_orderkey
    ]
    o["s"] = (o.o_totalprice * 100).round().astype(np.int64)
    o["y"] = (o.o_orderstatus == "F").astype(np.int64)
    for fold, g in o.groupby("fold"):
        s, y = g.s.values, g.y.values
        order = np.argsort(s, kind="stable")
        ranks = np.empty(len(s), dtype=np.float64)
        ss = s[order]
        i = 0
        while i < len(s):
            j = i
            while j < len(s) and ss[j] == ss[i]:
                j += 1
            ranks[order[i:j]] = (i + j + 1) / 2
            i = j
        n1, n0 = int(y.sum()), int((1 - y).sum())
        auc = (ranks[y == 1].sum() - n1 * (n1 + 1) / 2) / (n1 * n0)
        row = out.loc[fold]
        assert int(row.n_pos) == n1 and int(row.n_neg) == n0
        assert math.isclose(row.auc, round(auc, 6), abs_tol=1e-6), fold
    assert len(out) == _CV_FOLDS
    # folds are balanced-ish (hash split): no fold under half its share
    assert (out.n_pos + out.n_neg).min() > len(o) / _CV_FOLDS / 2

"""Round-6 statistical-inference batch (X203-X208) vs independent
pure-Python/numpy references — same discipline as
test_curation_queries.py."""

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


def _daily_clicks(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").toPandas()
    c = ev[ev.event_type == "click"]
    return c.groupby(c.ts.dt.normalize()).size().sort_index()


# ---- X203 stl_residual_anomalies --------------------------------------


def test_stl_residual_z_matches_pandas(spark, sf_dir):
    out = _q("stl_residual_anomalies", spark, sf_dir)
    daily = _daily_clicks(spark, sf_dir)
    trend = daily.rolling(7, center=True).mean().dropna()
    det = daily.loc[trend.index] - trend
    dow = ((trend.index - pd.Timestamp("1970-01-01")).days + 4) % 7
    seasonal = det.groupby(dow).mean()
    resid = {
        d: round(det[d] - seasonal[((d - pd.Timestamp("1970-01-01")).days
                                    + 4) % 7], 6)
        for d in trend.index
    }
    r = np.array([resid[d] for d in sorted(resid)])
    z = (r - r.mean()) / r.std()  # population sd
    assert len(out) == len(r)
    for row, (d, zi, ri) in zip(
        out.itertuples(), zip(sorted(resid), z, r)
    ):
        assert pd.Timestamp(row.d) == d
        assert math.isclose(row.resid, ri, abs_tol=2e-6)
        assert math.isclose(row.resid_z, zi, abs_tol=1e-4), d
        assert bool(row.anomaly) == (abs(zi) > 2.5), d
    # z-scores standardize: mean ~0, sd ~1
    assert abs(out.resid_z.mean()) < 0.01
    assert abs(out.resid_z.std(ddof=0) - 1) < 0.01


# ---- X204 hampel_filter_daily -----------------------------------------


def test_hampel_matches_pure_python(spark, sf_dir):
    out = _q("hampel_filter_daily", spark, sf_dir)
    daily = _daily_clicks(spark, sf_dir)
    days = sorted(daily.index)
    rows = {}
    for d in days:
        nbrs = [
            int(daily[x])
            for x in days
            if abs((x - d).days) <= 3
        ]
        if len(nbrs) != 7:
            continue
        m = round(float(np.quantile(nbrs, 0.5)), 6)
        mad = round(
            float(np.quantile([abs(v - m) for v in nbrs], 0.5)), 6
        )
        flagged = abs(int(daily[d]) - m) * 6745 > 3 * 10000 * mad
        rows[d] = (m, mad, flagged, m if flagged else float(daily[d]))
    assert len(out) == len(rows)
    for r in out.itertuples():
        d = pd.Timestamp(r.d)
        m, mad, fl, cleaned = rows[d]
        assert math.isclose(r.window_median, m, abs_tol=1e-6), d
        assert math.isclose(r.window_mad, mad, abs_tol=1e-6), d
        assert bool(r.flagged) == fl, d
        assert math.isclose(r.cleaned, cleaned, abs_tol=1e-6), d
    # cleaned equals original wherever not flagged
    unflagged = out[~out.flagged]
    assert (unflagged.cleaned == unflagged.cnt).all()


# ---- X205 did_spend_estimate ------------------------------------------


def test_did_matches_pure_python(spark, sf_dir):
    out = _q("did_spend_estimate", spark, sf_dir).iloc[0]
    o = load_table(spark, sf_dir, "orders").toPandas()
    c = load_table(spark, sf_dir, "customer").toPandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    days = (
        j.o_orderdate.dt.normalize() - pd.Timestamp("1970-01-01")
    ).dt.days
    med = round(float(np.quantile(days, 0.5)), 6)
    j["treated"] = (j.c_mktsegment == "BUILDING").astype(int)
    j["post"] = (days > med).astype(int)
    j["cents"] = (j.o_totalprice * 100).round().astype(np.int64)
    means = {}
    ns = {}
    for (t, p), g in j.groupby(["treated", "post"]):
        means[(t, p)] = round(g.cents.sum() / len(g) / 100, 9)
        ns[(t, p)] = len(g)
    did = (means[(1, 1)] - means[(1, 0)]) - (
        means[(0, 1)] - means[(0, 0)]
    )
    assert int(out.n_treat_pre) == ns[(1, 0)]
    assert int(out.n_treat_post) == ns[(1, 1)]
    assert int(out.n_ctrl_pre) == ns[(0, 0)]
    assert int(out.n_ctrl_post) == ns[(0, 1)]
    assert math.isclose(out.did_estimate, round(did, 6), abs_tol=1e-4)


# ---- X206 feature_information_gain ------------------------------------


def test_information_gain_matches_pure_python(spark, sf_dir):
    out = _q("feature_information_gain", spark, sf_dir).set_index(
        "feature"
    )
    o = load_table(spark, sf_dir, "orders").toPandas()
    n = len(o)
    days = (
        o.o_orderdate.dt.normalize() - pd.Timestamp("1970-01-01")
    ).dt.days
    feats = {
        "o_orderpriority": o.o_orderpriority,
        "order_dow": ((days + 4) % 7).astype(str),
        "price_decile": (
            (o.o_totalprice * 100).round().astype(np.int64) // 5000000
        ).astype(str),
    }

    def h_terms(counts, denom_for_log, total):
        return sum(
            round(-(cn / total) * math.log(cn / dl), 12)
            for cn, dl in zip(counts, denom_for_log)
        )

    cls = o.o_orderstatus.value_counts()
    hs = sum(
        round(-(cn / n) * math.log(cn / n), 12) for cn in cls.values
    )
    for name, col in feats.items():
        joint = (
            pd.DataFrame({"fv": col, "s": o.o_orderstatus})
            .groupby(["fv", "s"])
            .size()
        )
        fn = joint.groupby(level=0).sum()
        hcond = sum(
            round(-(cnt / n) * math.log(cnt / fn[fv]), 12)
            for (fv, _), cnt in joint.items()
        )
        row = out.loc[name]
        assert int(row.n_values) == col.nunique()
        assert math.isclose(
            row.info_gain, round(hs - hcond, 6), abs_tol=1e-5
        ), name
        assert row.info_gain >= -1e-9  # IG is non-negative


# ---- X207 containment_pairs_docs --------------------------------------


def _tokens(text: str) -> set[str]:
    return set(re.split(r"\s+", text.strip().lower()))


def test_containment_matches_pure_python(spark, sf_dir):
    import hashlib

    out = _q("containment_pairs_docs", spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").toPandas()
    toks = {r.doc_id: _tokens(r.text) for r in docs.itertuples()}
    # E7 minhash candidates (the same scheme as test_instrument)
    sh = {}
    for r in docs.itertuples():
        t = re.split(r"\s+", r.text.strip().lower())
        sh[r.doc_id] = {
            " ".join(t[i : i + 3]) for i in range(len(t) - 2)
        }
    sig = collections.defaultdict(set)
    for did, ss in sh.items():
        if not ss:
            continue
        for band in range(4):
            mins = [
                min(
                    hashlib.md5(f"{band}|{j}|{s}".encode()).hexdigest()
                    for s in ss
                )
                for j in range(2)
            ]
            sig[(band, "|".join(mins))].add(did)
    cand = set()
    for ids in sig.values():
        cand.update(itertools.combinations(sorted(ids), 2))
    want = {}
    for a, b in cand:
        inter = len(toks[a] & toks[b])
        if 10 * inter >= 7 * len(toks[a]):
            want[(a, b)] = round(inter / len(toks[a]), 6)
        if 10 * inter >= 7 * len(toks[b]):
            want[(b, a)] = round(inter / len(toks[b]), 6)
    got = {
        (r.contained_doc, r.container_doc): r.containment
        for r in out.itertuples()
    }
    assert set(got) == set(want)
    for k, v in want.items():
        assert math.isclose(got[k], v, abs_tol=1e-9), k
    # directionality is real: some pair is contained one way only
    one_way = [k for k in want if (k[1], k[0]) not in want]
    assert len(want) > 0


# ---- X208 kendall_tau_qty_price ---------------------------------------


def test_kendall_tau_matches_pure_python(spark, sf_dir):
    out = _q("kendall_tau_qty_price", spark, sf_dir).iloc[0]
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    q = li.l_quantity.astype(np.int64).values
    cents = (li.l_extendedprice * 100).round().astype(np.int64).values
    lo, hi = int(cents.min()), int(cents.max())
    b = (20 * (cents - lo)) // (hi - lo + 1)
    cellmap = collections.Counter(zip(q, b))
    cells = sorted(cellmap.items())
    C = D = 0
    for (q1, b1), n1 in cells:
        for (q2, b2), n2 in cells:
            if q2 > q1 and b2 > b1:
                C += n1 * n2
            elif q2 > q1 and b2 < b1:
                D += n1 * n2
    n = len(q)
    n0 = n * (n - 1) // 2
    tq = collections.Counter(q)
    tb = collections.Counter(b)
    n1_ = sum(v * (v - 1) // 2 for v in tq.values())
    n2_ = sum(v * (v - 1) // 2 for v in tb.values())
    tau = (C - D) / math.sqrt((n0 - n1_) * (n0 - n2_))
    assert int(out.concordant) == C
    assert int(out.discordant) == D
    assert int(out.ties_qty) == n1_
    assert int(out.ties_price) == n2_
    assert math.isclose(out.tau_b, round(tau, 6), abs_tol=1e-6)
    assert -1.0 <= out.tau_b <= 1.0

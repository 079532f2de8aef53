"""Round-6 curation/eval-metrics batch (X197-X202) vs independent
pure-Python/numpy references — same discipline as
test_estimator_queries.py."""

from __future__ import annotations

import collections
import hashlib
import math

import numpy as np
import pandas as pd

from data_engineering_1_spark.io import load_table
from data_engineering_1_spark.plans import registry
from data_engineering_1_spark.plans.curation_queries import (
    _IDCG_PREFIX,
    _MOM_B,
    _NDCG_K,
    _NDCG_W,
    _NEG_K,
    _SESSION_GAP_MIN,
)


def _q(name, spark, sf_dir):
    return registry.get_queries()[name](spark, sf_dir).toPandas()


def _bridge(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _qint(v: float, grid: int = 1000000) -> int:
    x = float(v) * grid
    return int(math.floor(x + 0.5)) if x >= 0 else -int(
        math.floor(-x + 0.5)
    )


# ---- X197 ndcg_label_relevance ----------------------------------------


def test_ndcg_matches_pure_python(spark, sf_dir):
    out = _q("ndcg_label_relevance", spark, sf_dir).set_index(
        "query_vec"
    )
    emb = load_table(spark, sf_dir, "embeddings").toPandas()
    qmat = {
        r.vec_id: ([_qint(v) for v in r.embedding], r.label)
        for r in emb.itertuples()
    }
    anchors = [v for v in qmat if v % 100 == 0]
    assert len(out) == len(anchors)
    for qid in anchors:
        qv, qlabel = qmat[qid]
        scored = sorted(
            (
                (-sum(a * b for a, b in zip(qv, vv)), vid, lab)
                for vid, (vv, lab) in qmat.items()
                if vid != qid
            ),
        )
        top = scored[:_NDCG_K]
        hits = [i for i, (_, _, lab) in enumerate(top) if lab == qlabel]
        dcg = sum(_NDCG_W[i] for i in hits)
        n_rel = sum(
            1 for vid, (_, lab) in qmat.items()
            if vid != qid and lab == qlabel
        )
        idcg = _IDCG_PREFIX[min(n_rel, _NDCG_K) - 1]
        row = out.loc[qid]
        assert int(row.n_relevant) == n_rel
        assert int(row.n_hits) == len(hits)
        assert math.isclose(
            row.precision_at_k,
            round(len(hits) / _NDCG_K, 6),
            abs_tol=1e-9,
        )
        assert math.isclose(
            row.ndcg_at_k, round(dcg / idcg, 6), abs_tol=1e-6
        )
        assert 0.0 <= row.ndcg_at_k <= 1.0


# ---- X198 median_of_means_spend ---------------------------------------


def test_median_of_means_matches_pure_python(spark, sf_dir):
    out = _q("median_of_means_spend", spark, sf_dir).iloc[0]
    o = load_table(spark, sf_dir, "orders").toPandas()
    cents = (o.o_totalprice * 100).round().astype(np.int64)
    buckets = collections.defaultdict(list)
    for k, c in zip(o.o_orderkey, cents):
        buckets[_bridge(f"mom|{k}") % _MOM_B].append(int(c))
    means = [round(sum(v) / len(v), 9) for v in buckets.values()]
    assert int(out.n_buckets) == _MOM_B
    assert int(out.n_orders) == len(o)
    assert math.isclose(
        out.plain_mean,
        round(cents.sum() / len(o) / 100, 6),
        abs_tol=1e-6,
    )
    assert math.isclose(
        out.median_of_means,
        round(np.quantile(means, 0.5) / 100, 6),
        abs_tol=1e-6,
    )


# ---- X199 benford_first_digit_audit ------------------------------------


def test_benford_matches_pure_python(spark, sf_dir):
    out = _q("benford_first_digit_audit", spark, sf_dir).set_index(
        "digit"
    )
    o = load_table(spark, sf_dir, "orders").toPandas()
    digs = (
        (o.o_totalprice * 100)
        .round()
        .astype(np.int64)
        .astype(str)
        .str[0]
        .astype(int)
    )
    counts = digs.value_counts()
    n = len(o)
    for d in counts.index:
        p = round(math.log10(1 + 1 / d), 12)
        exp = n * p
        row = out.loc[d]
        assert int(row.n_obs) == counts[d]
        assert math.isclose(
            row.obs_share, round(counts[d] / n, 6), abs_tol=1e-9
        )
        assert math.isclose(row.benford_p, p, abs_tol=1e-12)
        assert math.isclose(
            row.chi2_term,
            round((counts[d] - exp) ** 2 / exp, 6),
            abs_tol=1e-4,
        )
    # the fixture's uniform price generator must FAIL Benford loudly:
    # total chi2 far above the 15.5 (df=8, 5%) critical value
    assert out.chi2_term.sum() > 100


# ---- X200 abc_classification_parts --------------------------------------


def test_abc_matches_pure_python(spark, sf_dir):
    out = _q("abc_classification_parts", spark, sf_dir).set_index(
        "abc_class"
    )
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    # exact: extprice(2dp) * (1 - disc(2dp)) = cents * (100-d100) / 1e4
    rev = collections.Counter()
    for r in li.itertuples():
        c = int(round(r.l_extendedprice * 100))
        d = int(round(r.l_discount * 100))
        rev[r.l_partkey] += c * (100 - d)  # units: cents/10^2
    total = sum(rev.values())
    ranked = sorted(rev.items(), key=lambda t: (-t[1], t[0]))
    cls = {}
    cum = 0
    for k, v in ranked:
        cum += v
        cls[k] = "A" if 5 * cum <= 4 * total else (
            "B" if 20 * cum <= 19 * total else "C"
        )
    agg = collections.defaultdict(lambda: [0, 0])
    for k, v in rev.items():
        agg[cls[k]][0] += 1
        agg[cls[k]][1] += v
    for c in ("A", "B", "C"):
        row = out.loc[c]
        assert int(row.n_parts) == agg[c][0], c
        # agg value is in units of cents/100; half-up to whole cents
        want_cents = (agg[c][1] + 50) // 100
        assert int(row.revenue_cents) == want_cents, c
        assert math.isclose(
            row.revenue_share, round(agg[c][1] / total, 6), abs_tol=1e-6
        )
    # structural invariants: shares sum to 1; A's cumulative share is
    # capped at 80% (+ at most one boundary part), C holds the tail.
    # (On this near-uniform fixture A also holds ~80% of the PARTS —
    # the absence of a Pareto concentration is itself the readout.)
    assert math.isclose(out.revenue_share.sum(), 1.0, abs_tol=1e-4)
    assert out.loc["A"].revenue_share <= 0.8 + 1.0 / len(rev) + 1e-6
    assert out.loc["A"].revenue_share > out.loc["C"].revenue_share


# ---- X201 negative_sampling_pairs ----------------------------------------


def test_negative_sampling_matches_pure_python(spark, sf_dir):
    out = _q("negative_sampling_pairs", spark, sf_dir)
    o = load_table(spark, sf_dir, "orders").toPandas()
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    p = load_table(spark, sf_dir, "part").toPandas()
    np_ = len(p)
    pos = set(
        zip(
            o.merge(li, left_on="o_orderkey", right_on="l_orderkey")
            .o_custkey,
            o.merge(li, left_on="o_orderkey", right_on="l_orderkey")
            .l_partkey,
        )
    )
    custs = sorted(set(o.o_custkey[o.o_custkey % 10 == 0]))
    want = []
    for c in custs:
        for i in range(1, _NEG_K + 1):
            pk = _bridge(f"neg|{c}|{i}") % np_
            want.append((c, i, pk, (c, pk) in pos))
    got = [
        (r.o_custkey, int(r.draw_i), r.sampled_partkey,
         bool(r.is_accidental_positive))
        for r in out.itertuples()
    ]
    assert got == want
    # collisions exist and are flagged, not hidden (dense co-purchase
    # fixture -> some draw hits a real purchase)
    assert any(t[3] for t in got) or len(pos) / (np_ * len(custs)) < 0.01


# ---- X202 session_length_histogram ----------------------------------------


def test_session_histogram_matches_pure_python(spark, sf_dir):
    out = _q("session_length_histogram", spark, sf_dir).set_index(
        "bucket"
    )
    ev = load_table(spark, sf_dir, "events").toPandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    gap_us = _SESSION_GAP_MIN * 60 * 1_000_000
    lens = []
    for _, g in ev.groupby("user_id"):
        cur = 0
        prev = None
        for t in g.ts:
            us = int(t.value // 1000)  # ns -> us
            if prev is None or us - prev > gap_us:
                if cur:
                    lens.append(cur)
                cur = 1
            else:
                cur += 1
            prev = us
        if cur:
            lens.append(cur)

    def bucket(n):
        return (
            "1" if n == 1 else "2" if n == 2 else "3-5" if n <= 5
            else "6-10" if n <= 10 else "11+"
        )

    want = collections.defaultdict(lambda: [0, 0])
    for n in lens:
        want[bucket(n)][0] += 1
        want[bucket(n)][1] += n
    assert set(out.index) == set(want)
    for b, (ns, ne) in want.items():
        assert int(out.loc[b].n_sessions) == ns, b
        assert int(out.loc[b].n_events) == ne, b
    # conservation: every event lands in exactly one session
    assert out.n_events.sum() == len(ev)

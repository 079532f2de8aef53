"""Round-6 sampling/sketch/layout batch (X269-X274) vs independent
pure-Python references — same discipline as test_control_queries.py."""

from __future__ import annotations

import collections
import hashlib
import math

import pandas as pd

from data_engineering_1_spark.io import load_table
from data_engineering_1_spark.plans import registry


def _q(name, spark, sf_dir):
    return registry.get_queries()[name](spark, sf_dir).toPandas()


# ---- X269 pps_systematic_sample ------------------------------------------


def test_pps_selection_matches_step_crossings(spark, sf_dir):
    out = _q("pps_systematic_sample", spark, sf_dir)
    o = load_table(spark, sf_dir, "orders").toPandas()
    o = o.sort_values("o_orderkey").reset_index(drop=True)
    o["cents"] = (o.o_totalprice * 100).round().astype(int)
    o["cum"] = o.cents.cumsum()
    total = int(o.cents.sum())
    step = total // 500
    sel = o[(o.cum - o.cents) // step < o.cum // step]
    assert list(out.o_orderkey) == list(sel.o_orderkey)
    assert list(out.cum_cents) == list(sel.cum)
    # sample size is budget +/- 1
    assert abs(len(out) - 500) <= 1
    # certainty units: every order with cents >= step is selected
    big = o[o.cents >= step]
    assert set(big.o_orderkey) <= set(out.o_orderkey)
    # PPS property: selected orders are revenue-heavier on average
    assert out.cents.mean() > o.cents.mean()


# ---- X270 kmv_union_intersect -----------------------------------------------


def test_kmv_merge_matches_pure_python(spark, sf_dir):
    out = _q("kmv_union_intersect", spark, sf_dir).iloc[0]
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    o = load_table(spark, sf_dir, "orders").toPandas()
    p = load_table(spark, sf_dir, "part").toPandas()
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey").merge(
        p, left_on="l_partkey", right_on="p_partkey"
    )
    buyers = {
        b: set(j[j.p_brand == b].o_custkey)
        for b in ("Brand#11", "Brand#22")
    }
    a, b = buyers["Brand#11"], buyers["Brand#22"]

    def h(c):
        return int(hashlib.md5(f"kmv|{c}".encode()).hexdigest()[:12], 16)

    ka = sorted(h(c) for c in a)[:64]
    kb = sorted(h(c) for c in b)[:64]
    ku = sorted(set(ka) | set(kb))[:64]
    overlap = len(set(ku) & set(ka) & set(kb))
    assert int(out.exact_a) == len(a)
    assert int(out.exact_b) == len(b)
    assert int(out.exact_intersect) == len(a & b)
    assert int(out.overlap_k) == overlap
    assert int(out.k_eff) == len(ku)
    union_est = (len(ku) - 1) * 2.0**48 / max(ku)
    assert math.isclose(out.union_est, round(union_est, 6), abs_tol=1e-4)
    assert math.isclose(
        out.jaccard_est, round(overlap / len(ku), 6), abs_tol=1e-9
    )
    # sketch estimate is in the right ballpark of exact truth
    exact_union = len(a | b)
    assert abs(union_est - exact_union) / exact_union < 0.5


# ---- X271 doc_char_entropy ----------------------------------------------------


def test_char_entropy_matches_counter(spark, sf_dir):
    out = _q("doc_char_entropy", spark, sf_dir).set_index("doc_id")
    docs = load_table(spark, sf_dir, "documents").toPandas()
    for r in docs.sample(40, random_state=3).itertuples():
        counts = collections.Counter(r.text)
        n = len(r.text)
        clnc = sum(
            round(c * math.log(c), 9) for c in counts.values()
        )
        h = math.log(n) - clnc / n
        row = out.loc[r.doc_id]
        assert int(row.n_chars) == n
        assert int(row.n_distinct) == len(counts)
        assert math.isclose(
            row.entropy_nats, round(h, 6), abs_tol=1e-6
        )
        # entropy bounds: 0 <= H <= ln(distinct)
        assert -1e-9 <= row.entropy_nats <= math.log(len(counts)) + 1e-9


# ---- X272 zorder_key_orders -----------------------------------------------------


def _morton(x, y):
    m = 0
    for i in range(8):
        m |= ((x >> i) & 1) << (2 * i)
        m |= ((y >> i) & 1) << (2 * i + 1)
    return m


def test_zorder_buckets_are_square_tiles(spark, sf_dir):
    out = _q("zorder_key_orders", spark, sf_dir).set_index("bucket")
    o = load_table(spark, sf_dir, "orders").toPandas()
    x = (o.o_custkey % 256).astype(int)
    y = (
        (
            pd.to_datetime(o.o_orderdate).dt.normalize()
            - pd.Timestamp("1970-01-01")
        ).dt.days
        % 256
    ).astype(int)
    buckets = collections.defaultdict(list)
    for xi, yi in zip(x, y):
        buckets[_morton(xi, yi) >> 8].append((xi, yi))
    assert sorted(out.index) == sorted(buckets)
    for b, pts in buckets.items():
        r = out.loc[b]
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        assert int(r.n_rows) == len(pts)
        assert (int(r.min_x), int(r.max_x)) == (min(xs), max(xs))
        assert (int(r.min_y), int(r.max_y)) == (min(ys), max(ys))
        # THE locality property: a top-byte bucket is a 16x16 tile —
        # both dimensions bounded, not a stripe
        assert r.max_x - r.min_x <= 15
        assert r.max_y - r.min_y <= 15
        assert int(r.tile_area) <= 256


# ---- X273 alert_runs_ewma ---------------------------------------------------------


def test_alert_runs_match_flag_islands(spark, sf_dir):
    out = _q("alert_runs_ewma", spark, sf_dir).set_index("event_type")
    chart = _q("ewma_control_chart", spark, sf_dir)
    chart["day"] = pd.to_datetime(chart.day)
    for t, g in chart.groupby("event_type"):
        days = sorted(g[g.out_of_control].day)
        runs = []
        for d in days:
            if runs and (d - runs[-1][-1]).days == 1:
                runs[-1].append(d)
            else:
                runs.append([d])
        r = out.loc[t]
        assert int(r.ooc_days) == len(days)
        assert int(r.n_incidents) == len(runs)
        assert int(r.n_sustained) == sum(1 for x in runs if len(x) >= 2)
        assert int(r.longest_run) == max(
            (len(x) for x in runs), default=0
        )
        if runs:
            assert pd.Timestamp(r.first_breach) == runs[0][0]
        else:
            assert pd.isna(r.first_breach)
    # shape invariant: one row per event type, breaches or not
    assert len(out) == chart.event_type.nunique()


# ---- X274 good_turing_trigrams --------------------------------------------------------


def test_good_turing_matches_counts_of_counts(spark, sf_dir):
    out = _q("good_turing_trigrams", spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").toPandas()
    cnt = collections.Counter()
    for text in docs.text:
        toks = text.strip().lower().split()
        for i in range(len(toks) - 2):
            cnt[" ".join(toks[i : i + 3])] += 1
    coc = collections.Counter(cnt.values())
    n = sum(cnt.values())
    top = sorted(cnt, key=lambda w: (-cnt[w], w))[:30]
    assert list(out.word) == top
    for r in out.itertuples():
        rr = cnt[r.word]
        assert int(r.r) == rr
        assert int(r.nr) == coc[rr]
        if coc.get(rr + 1):
            rstar = (rr + 1) * coc[rr + 1] / coc[rr]
            assert math.isclose(
                r.r_star, round(rstar, 6), abs_tol=1e-6
            )
            assert math.isclose(
                r.p_gt, round(r.r_star / n, 6), abs_tol=1e-6
            )
        else:
            assert pd.isna(r.r_star)
        assert math.isclose(r.p_raw, round(rr / n, 6), abs_tol=1e-9)
        assert math.isclose(
            r.p0_unseen_mass, round(coc.get(1, 0) / n, 6), abs_tol=1e-9
        )
    # NOTE: r* < r+1 is NOT an invariant — deep in the sparse tail the
    # spectrum is non-monotone (N_{r+1} > N_r happens) and raw GT
    # legitimately inflates those buckets; that is exactly why
    # production GT fits a regression over the spectrum first. What GT
    # does guarantee: smoothed counts are positive where defined, and
    # the unseen mass is positive on a singleton-bearing spectrum.
    have = out[out.r_star.notna()]
    if len(have):
        assert (have.r_star > 0).all()
    assert out.p0_unseen_mass.iloc[0] > 0

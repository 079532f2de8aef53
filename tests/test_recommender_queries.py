"""Round-6 recommender batch (X233-X238) vs independent pure-Python
references — same discipline as test_dynamics_queries.py."""

from __future__ import annotations

import collections
import math

from data_engineering_1_spark.io import load_table
from data_engineering_1_spark.plans import registry


def _q(name, spark, sf_dir):
    return registry.get_queries()[name](spark, sf_dir).toPandas()


def _incidence(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    return set(zip(li.l_orderkey, li.l_partkey))


def _supports_pairs(items):
    supp = collections.Counter(p for _, p in items)
    by_order = collections.defaultdict(list)
    for o, p in items:
        by_order[o].append(p)
    co = collections.Counter()
    for parts in by_order.values():
        ps = sorted(set(parts))
        for i, a in enumerate(ps):
            for b in ps[i + 1 :]:
                co[(a, b)] += 1
    return supp, co


def _neighbors(supp, co, min_co=3, k=5):
    directed = collections.defaultdict(list)
    for (a, b), c in co.items():
        if c < min_co:
            continue
        directed[a].append((b, c))
        directed[b].append((a, c))
    out = {}
    for item, cands in directed.items():
        scored = [
            (round(c / math.sqrt(supp[item] * supp[nb]), 6), nb, c)
            for nb, c in cands
        ]
        scored.sort(key=lambda t: (-t[0], t[1]))
        out[item] = scored[:k]
    return out


# ---- X233 item_item_cosine_topk ---------------------------------------


def test_item_neighbors_match_pure_python(spark, sf_dir):
    out = _q("item_item_cosine_topk", spark, sf_dir)
    items = _incidence(spark, sf_dir)
    supp, co = _supports_pairs(items)
    nb = _neighbors(supp, co)
    got = collections.defaultdict(list)
    for r in out.itertuples():
        got[r.item].append((r.rnk, r.neighbor, int(r.co), r.cosine))
        assert int(r.n_item) == supp[r.item]
        assert int(r.n_neighbor) == supp[r.neighbor]
    assert set(got) == set(nb)
    for item, rows in got.items():
        rows.sort()
        assert [rk for rk, *_ in rows] == list(range(1, len(rows) + 1))
        for (rk, neigh, c, cos), (ecos, enb, ec) in zip(rows, nb[item]):
            assert neigh == enb and c == ec, item
            assert math.isclose(cos, ecos, abs_tol=1e-9)


# ---- X234 user_part_recs_topn -----------------------------------------


def test_user_recs_match_pure_python(spark, sf_dir):
    out = _q("user_part_recs_topn", spark, sf_dir)
    items = _incidence(spark, sf_dir)
    o = load_table(spark, sf_dir, "orders").toPandas()
    cust_of = dict(zip(o.o_orderkey, o.o_custkey))
    supp, co = _supports_pairs(items)
    nb = _neighbors(supp, co)
    bought = collections.defaultdict(set)
    for ok, pk in items:
        bought[cust_of[ok]].add(pk)
    expected = {}
    for cust, parts in bought.items():
        score = collections.Counter()
        paths = collections.Counter()
        for p in parts:
            for _, neigh, c in nb.get(p, []):
                score[neigh] += c
                paths[neigh] += 1
        cands = [
            (s, pt) for pt, s in score.items() if pt not in parts
        ]
        cands.sort(key=lambda t: (-t[0], t[1]))
        if cands:
            expected[cust] = [
                (i + 1, pt, s, paths[pt])
                for i, (s, pt) in enumerate(cands[:5])
            ]
    got = collections.defaultdict(list)
    for r in out.itertuples():
        got[r.o_custkey].append(
            (r.rnk, r.part, int(r.score), int(r.n_paths))
        )
    for cust in got:
        got[cust].sort()
    assert dict(got) == expected


# ---- X235 assoc_rules_2item -------------------------------------------


def test_assoc_rules_match_pure_python(spark, sf_dir):
    out = _q("assoc_rules_2item", spark, sf_dir)
    items = _incidence(spark, sf_dir)
    supp, co = _supports_pairs(items)
    n = len({o for o, _ in items})
    rules = []
    for (a, b), c in co.items():
        if c < 5:
            continue
        for ante, cons in ((a, b), (b, a)):
            na, nc = supp[ante], supp[cons]
            rules.append(
                (
                    round(c / na, 6),
                    ante,
                    cons,
                    c,
                    na,
                    nc,
                    round(c / n, 6),
                    round(c * n / (na * nc), 6),
                    5 * c >= na,
                    2 * c * n >= 3 * na * nc,
                )
            )
    rules.sort(key=lambda t: (-t[0], t[1], t[2]))
    assert len(out) == min(30, len(rules))
    for r, e in zip(out.itertuples(), rules):
        conf, ante, cons, c, na, nc, sup, lift, sc, sl = e
        assert (r.ante, r.cons, int(r.co)) == (ante, cons, c)
        assert (int(r.n_ante), int(r.n_cons)) == (na, nc)
        assert math.isclose(r.confidence, conf, abs_tol=1e-9)
        assert math.isclose(r.support, sup, abs_tol=1e-9)
        assert math.isclose(r.lift, lift, abs_tol=1e-9)
        assert bool(r.strong_conf) == sc and bool(r.strong_lift) == sl


# ---- X236 rec_exposure_coverage ---------------------------------------


def test_exposure_coverage_matches_pure_python(spark, sf_dir):
    out = _q("rec_exposure_coverage", spark, sf_dir)
    assert len(out) == 1
    row = out.iloc[0]
    items = _incidence(spark, sf_dir)
    supp, co = _supports_pairs(items)
    nb = _neighbors(supp, co)
    exposure = collections.Counter()
    for rows in nb.values():
        for _, neigh, _ in rows:
            exposure[neigh] += 1
    n_parts = len(load_table(spark, sf_dir, "part").toPandas())
    ranked = sorted(exposure.items(), key=lambda t: (t[1], t[0]))
    m = len(ranked)
    total = sum(x for _, x in ranked)
    rx = sum((i + 1) * x for i, (_, x) in enumerate(ranked))
    gini = (2 * rx - (m + 1) * total) / (m * total)
    assert int(row.n_parts) == n_parts
    assert int(row.n_recommended) == m
    assert int(row.total_slots) == total
    assert math.isclose(row.coverage, round(m / n_parts, 6), abs_tol=1e-9)
    assert math.isclose(row.exposure_gini, round(gini, 6), abs_tol=1e-6)
    assert 0.0 <= row.exposure_gini < 1.0


# ---- X237 repeat_purchase_cycle ---------------------------------------


def test_repeat_cycle_matches_pure_python(spark, sf_dir):
    out = _q("repeat_purchase_cycle", spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    o = load_table(spark, sf_dir, "orders").toPandas()
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    days = collections.defaultdict(set)
    for r in j.itertuples():
        days[(r.o_custkey, r.l_partkey)].add(
            r.o_orderdate.normalize()
        )
    per_part = collections.defaultdict(
        lambda: {"buyers": set(), "repeat": set(), "gaps": []}
    )
    for (cust, part), ds in days.items():
        s = per_part[part]
        s["buyers"].add(cust)
        sd = sorted(ds)
        if len(sd) > 1:
            s["repeat"].add(cust)
            s["gaps"].extend(
                (b - a).days for a, b in zip(sd, sd[1:])
            )
    def median(xs):
        xs = sorted(xs)
        n = len(xs)
        mid = xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2
        return float(mid)
    rows = [
        (
            -len(s["repeat"]),
            part,
            len(s["buyers"]),
            len(s["gaps"]),
            round(len(s["repeat"]) / len(s["buyers"]), 6),
            median(s["gaps"]),
        )
        for part, s in per_part.items()
        if len(s["repeat"]) >= 2
    ]
    rows.sort()
    assert len(out) == min(30, len(rows))
    for r, e in zip(out.itertuples(), rows):
        neg_rep, part, nb_, ng, rate, med = e
        assert r.l_partkey == part
        assert int(r.n_buyers) == nb_
        assert int(r.n_repeat_buyers) == -neg_rep
        assert int(r.n_gaps) == ng
        assert math.isclose(r.repeat_rate, rate, abs_tol=1e-9)
        assert math.isclose(r.median_gap_days, med, abs_tol=1e-9)


# ---- X238 rec_holdout_hitrate -----------------------------------------


def test_holdout_eval_matches_pure_python(spark, sf_dir):
    out = _q("rec_holdout_hitrate", spark, sf_dir)
    assert len(out) == 1
    row = out.iloc[0]
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    o = load_table(spark, sf_dir, "orders").toPandas()
    od = o.o_orderdate.dt.normalize()
    import pandas as pd

    d0, d1 = od.min(), od.max()
    cutoff = d0 + pd.Timedelta(days=4 * (d1 - d0).days // 5)
    j = li.merge(
        o.assign(od=od)[["o_orderkey", "o_custkey", "od"]],
        left_on="l_orderkey",
        right_on="o_orderkey",
    )
    train_inc = {
        (r.l_orderkey, r.l_partkey)
        for r in j.itertuples()
        if r.od <= cutoff
    }
    supp, co = _supports_pairs(train_inc)
    nb = _neighbors(supp, co, min_co=2)
    train_u = collections.defaultdict(set)
    test_u = collections.defaultdict(set)
    for r in j.itertuples():
        if r.od <= cutoff:
            train_u[r.o_custkey].add(r.l_partkey)
    for r in j.itertuples():
        if r.od > cutoff and r.l_partkey not in train_u.get(
            r.o_custkey, ()
        ):
            test_u[r.o_custkey].add(r.l_partkey)
    n_users = hits_total = test_total = any_hit = 0
    recall_sum = 0.0
    for cust, test_items in test_u.items():
        if cust not in train_u:
            continue
        score = collections.Counter()
        for p in train_u[cust]:
            for _, neigh, c in nb.get(p, []):
                if neigh not in train_u[cust]:
                    score[neigh] += c
        recs = sorted(
            ((s, pt) for pt, s in score.items()),
            key=lambda t: (-t[0], t[1]),
        )[:10]
        rec_set = {pt for _, pt in recs}
        h = len(rec_set & test_items)
        n_users += 1
        hits_total += h
        test_total += len(test_items)
        any_hit += h > 0
        recall_sum += round(h / len(test_items), 9)
    assert int(row.n_users_eval) == n_users
    assert int(row.total_test_items) == test_total
    assert int(row.total_hits) == hits_total
    assert math.isclose(
        row.precision_at10,
        round(hits_total / (10 * n_users), 6),
        abs_tol=1e-9,
    )
    # half-up at 6 (49/128 = .3828125 sits ON the boundary; both
    # engines round half-up while Python's round() is half-even)
    from decimal import Decimal

    hr = float(
        (Decimal(any_hit) / Decimal(n_users)).quantize(
            Decimal("0.000001"), rounding="ROUND_HALF_UP"
        )
    )
    assert math.isclose(row.hit_rate, hr, abs_tol=1e-9)
    assert math.isclose(
        row.mean_recall, round(recall_sum / n_users, 6), abs_tol=1e-6
    )

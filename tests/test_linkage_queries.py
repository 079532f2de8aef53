"""Round-6 graph-linkage/sketch batch (X251-X256) vs independent
pure-Python references — same discipline as test_market_queries.py."""

from __future__ import annotations

import collections
import hashlib
import math
from decimal import Decimal

from data_engineering_1_spark.io import load_table
from data_engineering_1_spark.plans import registry


def _q(name, spark, sf_dir):
    return registry.get_queries()[name](spark, sf_dir).toPandas()


def _copurchase(spark, sf_dir):
    """Symmetric DISTINCT co-purchase adjacency as a dict of sets."""
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    per_order = li.groupby("l_orderkey").l_partkey.apply(
        lambda s: sorted(set(s))
    )
    adj = collections.defaultdict(set)
    for parts in per_order:
        for i, u in enumerate(parts):
            for v in parts[i + 1 :]:
                adj[u].add(v)
                adj[v].add(u)
    return adj


def _anchors(adj):
    return sorted(adj, key=lambda k: (-len(adj[k]), k))[:30]


# ---- X251 hits_authority_parts ----------------------------------------


def test_hits_matches_dict_recursion(spark, sf_dir):
    out = _q("hits_authority_parts", spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    o = load_table(spark, sf_dir, "orders").toPandas()
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    e = set(zip(j.o_custkey, j.l_partkey))
    a1 = collections.Counter(p for _, p in e)
    h1 = collections.Counter()
    for c, p in e:
        h1[c] += a1[p]
    a2 = collections.Counter()
    for c, p in e:
        a2[p] += h1[c]
    top = sorted(a2, key=lambda p: (-a2[p], p))[:30]
    assert list(out.part_key) == top
    for r in out.itertuples():
        assert int(r.auth1) == a1[r.part_key]
        assert int(r.auth2) == a2[r.part_key]
    # reinforcement actually reorders vs raw popularity somewhere,
    # otherwise the second round is dead weight
    by_pop = sorted(a2, key=lambda p: (-a1[p], p))[:30]
    assert by_pop != top


# ---- X252 countmin_part_counts ------------------------------------------


def _cms_pos(i, k, w=1024):
    h = hashlib.md5(f"cms|{i}|{k}".encode()).hexdigest()
    return int(h[:8], 16) % w


def test_countmin_overestimates_and_matches(spark, sf_dir):
    out = _q("countmin_part_counts", spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    true = li.l_partkey.value_counts()
    cells = collections.Counter()
    for k, cnt in true.items():
        for i in range(3):
            cells[(i, _cms_pos(i, k))] += int(cnt)
    for r in out.itertuples():
        t = int(true[r.part_key])
        est = min(
            cells[(i, _cms_pos(i, r.part_key))] for i in range(3)
        )
        assert int(r.true_cnt) == t
        assert int(r.est) == est
        assert int(r.overestimate) == est - t
        # the count-min theorem: never an underestimate
        assert est >= t
    top = sorted(true.index, key=lambda k: (-true[k], k))[:30]
    assert list(out.part_key) == top


# ---- X253 adamic_adar_linkpred -------------------------------------------


def test_adamic_adar_matches_brute_force(spark, sf_dir):
    out = _q("adamic_adar_linkpred", spark, sf_dir)
    adj = _copurchase(spark, sf_dir)
    scores = {}
    for a in _anchors(adj):
        seen = collections.defaultdict(list)
        for z in adj[a]:
            for v in adj[z]:
                if v != a and v not in adj[a]:
                    seen[v].append(z)
        for v, zs in seen.items():
            aa = sum(
                Decimal(str(round(1.0 / math.log(len(adj[z])), 9)))
                for z in zs
            )
            scores[(a, v)] = (len(zs), aa)
    top = sorted(scores, key=lambda k: (-scores[k][1], k))[:30]
    assert list(zip(out.anchor, out.candidate)) == top
    for r in out.itertuples():
        n, aa = scores[(r.anchor, r.candidate)]
        assert int(r.n_common) == n
        assert math.isclose(
            r.aa_score, round(float(aa), 6), abs_tol=1e-6
        )


# ---- X254 ppr_seed_part ----------------------------------------------------


def test_ppr_matches_literal_fixed_point(spark, sf_dir):
    out = _q("ppr_seed_part", spark, sf_dir)
    adj = _copurchase(spark, sf_dir)
    seed = min(adj)
    scale = 10**15
    tele = 15 * scale // 100
    r = {seed: scale}
    for _ in range(2):
        nxt = collections.Counter({seed: tele})
        for u, rank in r.items():
            msg = (rank // len(adj[u])) * 85 // 100
            for v in adj[u]:
                nxt[v] += msg
        r = dict(nxt)
    top = sorted(r, key=lambda k: (-r[k], k))[:30]
    assert list(out.part_key) == top
    for row in out.itertuples():
        assert int(row.rank_fp) == r[row.part_key]
        assert math.isclose(
            row.ppr, r[row.part_key] / 1e15, abs_tol=1e-12
        )
    # sparsity: the seed holds teleport mass plus self-returns — it
    # must rank and the vector must span (a subset of) the 2-hop ball
    assert seed in set(out.part_key) or r[seed] < r[top[-1]]


# ---- X255 reach_2hop_parts ---------------------------------------------------


def test_reach_matches_set_arithmetic(spark, sf_dir):
    out = _q("reach_2hop_parts", spark, sf_dir).set_index("part_key")
    adj = _copurchase(spark, sf_dir)
    anchors = _anchors(adj)
    assert sorted(out.index) == sorted(anchors)
    for a in anchors:
        two = set()
        for z in adj[a]:
            two |= adj[z]
        strict = two - adj[a] - {a}
        r = out.loc[a]
        assert int(r.n_1hop) == len(adj[a])
        assert int(r.n_2hop_strict) == len(strict)
        assert int(r.reach) == len(adj[a]) + len(strict)
        assert math.isclose(
            r.expansion,
            round(len(strict) / len(adj[a]), 6),
            abs_tol=1e-9,
        )
    # sorted by reach desc then key
    reaches = list(zip(-out.reach, out.index))
    assert reaches == sorted(reaches)


# ---- X256 label_prop_brands ----------------------------------------------------


def test_label_prop_matches_synchronous_votes(spark, sf_dir):
    out = _q("label_prop_brands", spark, sf_dir)
    adj = _copurchase(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").toPandas()
    brand = dict(zip(part.p_partkey, part.p_brand))
    seeded = {n for n in adj if n % 3 == 0}
    labels = {n: (brand[n] if n in seeded else None) for n in adj}
    for _ in range(2):
        votes = collections.defaultdict(collections.Counter)
        for u in adj:
            if labels[u] is not None:
                for v in adj[u]:
                    votes[v][labels[u]] += 1
        nxt = {}
        for n in adj:
            if n in seeded:
                nxt[n] = brand[n]
            elif votes[n]:
                nxt[n] = min(
                    votes[n],
                    key=lambda lb: (-votes[n][lb], lb),
                )
            else:
                nxt[n] = None
        labels = nxt
    census = collections.Counter(
        lb if lb is not None else "(unlabeled)"
        for lb in labels.values()
    )
    seeds = collections.Counter()
    for n in seeded:
        seeds[labels[n]] += 1
    assert list(out.label) == sorted(census)
    for r in out.itertuples():
        assert int(r.n_parts) == census[r.label]
        assert int(r.n_seeds) == seeds.get(r.label, 0)
    # propagation actually labeled non-seeds (the operator did work)
    labeled = sum(
        v for k, v in census.items() if k != "(unlabeled)"
    )
    assert labeled > len(seeded)

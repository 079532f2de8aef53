"""Invariant tests for the round-5 corpus-engineering batch
(X93 packing, X94 PSI, X95 chi2, X96 xentropy, X97 weighted sample,
X98 domain quota, X99 trend fit, X100 fixed-point PageRank).

The oracle gate proves Spark==DuckDB on the declared outputs; these
tests pin the ALGORITHMIC claims the hash can't see — conservation
laws, bias direction, quota ceilings, and an exact fixed-point
PageRank twin on a hand graph.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_engineering_1_spark.io import load_table
from data_engineering_1_spark.operators.graph import SCALE, pagerank
from data_engineering_1_spark.plans import corpus_queries as CQ


def test_packing_conserves_docs_and_tokens(spark, sf_dir):
    """Every doc lands in exactly one block; block token sums re-add to
    the corpus total (nothing dropped, nothing double-packed)."""
    docs = load_table(spark, sf_dir, "documents")
    from data_engineering_1_spark.operators.textanalysis import tokens

    n_docs = docs.count()
    total_tok = docs.select(
        F.sum(F.size(tokens("text"))).alias("t")
    ).first()["t"]
    blocks = CQ.pack_training_blocks(spark, sf_dir).collect()
    assert sum(b["n_docs"] for b in blocks) == n_docs
    assert sum(b["block_tokens"] for b in blocks) == total_tok
    # block ids are the concat-and-chunk offsets: non-negative, and the
    # first block of every shard is block 0
    per_shard_first = {}
    for b in blocks:
        assert b["block_id"] >= 0
        per_shard_first.setdefault(b["shard"], b["block_id"])
    assert set(per_shard_first.values()) == {0}


def test_psi_zero_when_compared_to_itself(spark, sf_dir):
    """PSI's floor: identical distributions score exactly 0 — pinned by
    replaying the query machinery with period A == period B (the
    smoothed p and q become the same expression)."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy(
        "event_type",
        F.least(F.floor(F.col("value") / 50).cast("int"), F.lit(9)).alias(
            "bucket"
        ),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    wt = F.sum("cnt").over(Window.partitionBy("event_type"))
    p = (F.col("cnt") + 1).cast("double") / (wt + 10).cast("double")
    same = counts.select(
        "event_type", ((p - p) * F.log(p / p)).alias("contr")
    )
    tot = same.agg(F.sum(F.abs(F.col("contr"))).alias("s")).first()["s"]
    assert tot == 0.0
    # and the real query emits small positive drift for every type
    rows = CQ.psi_value_drift_events(spark, sf_dir).collect()
    assert len(rows) == 5
    assert all(r["psi"] >= 0.0 for r in rows)


def test_chi2_totals_and_nonnegative(spark, sf_dir):
    """Expected counts re-sum to the observed grand total (the defining
    property of the independence model) and every chi2 term is >= 0."""
    rows = CQ.priority_segment_chi2(spark, sf_dir).collect()
    n = sum(r["n_obs"] for r in rows)
    e = sum(r["expected"] for r in rows)
    assert abs(e - n) < 1e-3  # expected counts rounded to 6 each
    assert all(r["chi2_term"] >= 0.0 for r in rows)
    assert len(rows) == 25


def test_xentropy_bounds(spark, sf_dir):
    """Cross-entropy against the corpus unigram model is bounded below
    by ln(1) = 0 (impossible: every token has count >= 1 so -ln p > 0
    unless one token IS the corpus) and above by ln(N)."""
    import math

    docs = load_table(spark, sf_dir, "documents")
    from data_engineering_1_spark.operators.textanalysis import tokens

    n_total = docs.select(
        F.sum(F.size(tokens("text"))).alias("t")
    ).first()["t"]
    rows = CQ.doc_unigram_xentropy(spark, sf_dir).collect()
    assert len(rows) == docs.count()
    ub = math.log(n_total) + 1e-9
    assert all(0.0 < r["xent"] <= ub for r in rows)


def test_weighted_sample_is_weight_biased(spark, sf_dir):
    """The A-ES sample must overrepresent heavy rows: the sample's mean
    o_totalprice exceeds the population mean by a wide, deterministic
    margin (the whole point of weighted sampling)."""
    orders = load_table(spark, sf_dir, "orders")
    pop_mean = orders.agg(F.avg("o_totalprice")).first()[0]
    sample = CQ.weighted_sample_orders(spark, sf_dir).collect()
    samp_mean = sum(r["o_totalprice"] for r in sample) / len(sample)
    assert samp_mean > pop_mean * 1.2
    # sampling without replacement: keys are unique rows
    assert len({r["o_orderkey"] for r in sample}) == len(sample)


def test_domain_quota_ceiling(spark, sf_dir):
    """No host exceeds the quota, and hosts with fewer docs than the
    quota keep everything (the pass balances, never discards whole
    domains)."""
    docs = load_table(spark, sf_dir, "documents")
    have = {
        r["source"]: r["n"]
        for r in docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    kept = CQ.domain_quota_docs(spark, sf_dir).collect()
    per_host = {}
    for r in kept:
        per_host[r["host"]] = per_host.get(r["host"], 0) + 1
    for host, n in per_host.items():
        src = host.removesuffix(".example.com")
        assert n == min(have[src], CQ._DOMAIN_QUOTA)


def test_trend_fit_matches_numpy(spark, sf_dir):
    """The exact-sum closed form equals numpy's polyfit to the rounding
    the query promises (6 decimals)."""
    import numpy as np

    orders = load_table(spark, sf_dir, "orders").collect()
    got = {
        r["priority"]: (r["slope"], r["intercept"])
        for r in CQ.priority_price_trend(spark, sf_dir).collect()
    }
    base = __import__("datetime").date(1995, 1, 1)
    by_p: dict = {}
    for r in orders:
        x = (r["o_orderdate"].date() - base).days
        by_p.setdefault(r["o_orderpriority"], ([], []))
        by_p[r["o_orderpriority"]][0].append(x)
        by_p[r["o_orderpriority"]][1].append(round(r["o_totalprice"], 2))
    for p, (xs, ys) in by_p.items():
        slope, intercept = np.polyfit(np.array(xs), np.array(ys), 1)
        g_slope, g_int = got[p]
        assert abs(g_slope - slope) < 1e-4, p
        assert abs(g_int - intercept) < 1e-1, p  # intercept magnifies slope rounding


def _fp_pagerank_reference(edges, n_iter=2, d_pct=85):
    """Pure-Python fixed-point PageRank — the independent twin of
    operators/graph.py (same integer ops, no Spark)."""
    from collections import defaultdict

    out = defaultdict(int)
    for s, _t in edges:
        out[s] += 1
    nodes = sorted(out)
    n = len(nodes)
    base = (100 - d_pct) * SCALE // (100 * n)
    rank = {v: SCALE // n for v in nodes}
    for _ in range(n_iter):
        inflow = defaultdict(int)
        for s, t in edges:
            inflow[t] += rank[s] // out[s]
        # full node set, not just inflow keys: a src-only node keeps
        # rank (1-d)/N and keeps contributing (mirrors graph.py's
        # left join onto the node set)
        rank = {v: base + inflow.get(v, 0) * d_pct // 100 for v in nodes}
    return rank


def test_pagerank_exact_on_hand_graph(spark):
    """Bit-exact equality with the pure-Python fixed-point reference on
    a small asymmetric multigraph (hub, chain, parallel edges)."""
    edges = [
        (1, 2), (2, 1),
        (1, 3), (3, 1),
        (2, 3), (3, 2),
        (3, 4), (4, 3),
        (3, 4),  # parallel edge: weight 2 on 3->4
        (4, 3),
        (4, 5), (5, 4),
    ]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        r["node"]: r["rank_fp"]
        for r in pagerank(df, n_iter=2, damping_pct=85).collect()
    }
    want = _fp_pagerank_reference(edges)
    assert got == want


def test_pagerank_directed_src_only_node_persists(spark):
    """ADVICE r5: on a DIRECTED edge list a node with out-edges but no
    in-edges must not vanish after the first iteration — it holds rank
    (1-d)/N and its outgoing contributions keep flowing. Node 1 here is
    src-only; bit-exact against the pure-Python twin."""
    edges = [(1, 2), (2, 3), (3, 2)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        r["node"]: r["rank_fp"]
        for r in pagerank(df, n_iter=3, damping_pct=85).collect()
    }
    want = _fp_pagerank_reference(edges, n_iter=3)
    assert got == want
    base = (100 - 85) * SCALE // (100 * 3)
    assert got[1] == base  # src-only node: exactly the teleport mass
    # and node 2 still receives node 1's contribution in EVERY
    # iteration: strictly more than a 2<->3-only graph would give it
    assert got[2] > got[3]


def test_pagerank_mass_conservation(spark, sf_dir):
    """Fixed-point truncation may only LOSE mass, and at most ~1 ulp
    per node per integer division — total rank stays within
    (SCALE - loss_bound, SCALE]."""
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("u").alias("src"), F.col("v").alias("dst")),
                F.struct(F.col("v").alias("src"), F.col("u").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    n_edges = edges.count()
    n_nodes = edges.select("src").distinct().count()
    pr = pagerank(edges, n_iter=2, damping_pct=85)
    total = pr.agg(F.sum("rank_fp")).first()[0]
    # per iteration: <= 1 ulp lost per EDGE (message truncation) plus
    # <= 100 per node (the DIV 100 damping step) plus seed truncation
    loss_bound = 2 * (n_edges + 101 * n_nodes) + n_nodes
    assert SCALE - loss_bound <= total <= SCALE


def test_vocab_coverage_is_minimal(spark, sf_dir):
    """The kept vocab reaches >= 95% occurrence coverage, and dropping
    its last (lowest-count) word falls below 95% — minimality, the
    exact property the integer keep rule encodes."""
    from data_engineering_1_spark.operators.textanalysis import tokens as tk

    docs = load_table(spark, sf_dir, "documents")
    total = docs.select(F.sum(F.size(tk("text")))).first()[0]
    kept = CQ.vocab_coverage_95(spark, sf_dir).collect()
    ranks = [r["rank"] for r in kept]
    assert ranks == list(range(1, len(kept) + 1))
    covered = sum(r["n"] for r in kept)
    assert covered * 20 >= total * 19
    assert (covered - kept[-1]["n"]) * 20 < total * 19


def test_pmi_matches_pure_python(spark, sf_dir):
    """Top-30 PMI collocations equal an independent pure-Python
    computation from the same exact counts (same division chain)."""
    import math
    import re
    from collections import Counter

    docs = load_table(spark, sf_dir, "documents").collect()
    uni: Counter = Counter()
    bg: Counter = Counter()
    n_bg = 0
    for r in docs:
        toks = re.split(r"\s+", r["text"].strip().lower())
        uni.update(toks)
        for a, b in zip(toks, toks[1:]):
            bg[(a, b)] += 1
            n_bg += 1
    n_uni = sum(uni.values())
    scored = []
    for (a, b), c_ab in bg.items():
        if c_ab < CQ._PMI_MIN_COUNT:
            continue
        pmi = math.log(
            (c_ab / n_bg) / ((uni[a] / n_uni) * (uni[b] / n_uni))
        )
        scored.append((round(pmi, 6), a, b, c_ab))
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    want = [(a, b, c, p) for p, a, b, c in scored[:30]]
    got = [
        (r["a"], r["b"], r["c_ab"], r["pmi"])
        for r in CQ.pmi_collocations_top30(spark, sf_dir).collect()
    ]
    assert got == want


def test_transition_rows_are_stochastic(spark, sf_dir):
    """Per-from_type probabilities sum to 1 (each rounded to 6, so the
    row sum is within 5e-6), and transition counts re-sum to the exact
    total number of consecutive pairs."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    want_pairs = per_user.select(
        F.sum(F.col("n") - 1).alias("p")
    ).first()["p"]
    rows = CQ.event_type_transitions(spark, sf_dir).collect()
    assert sum(r["n"] for r in rows) == want_pairs
    by_from: dict = {}
    for r in rows:
        by_from.setdefault(r["from_type"], 0.0)
        by_from[r["from_type"]] += r["prob"]
    for s in by_from.values():
        assert abs(s - 1.0) < 5e-6


def test_forward_asof_agrees_with_bruteforce(spark, sf_dir):
    """The merge-pattern forward as-of equals the brute-force
    per-purchase minimum over all later clicks (driver-side, sf0.001)."""
    ev = load_table(spark, sf_dir, "events").collect()
    clicks = sorted(
        (
            (r["user_id"], r["ts"], r["event_id"])
            for r in ev
            if r["event_type"] == "click"
        ),
    )
    want = {}
    for r in ev:
        if r["event_type"] != "purchase":
            continue
        cands = [
            (ts, eid)
            for (u, ts, eid) in clicks
            if u == r["user_id"] and ts >= r["ts"]
        ]
        want[r["event_id"]] = min(cands) if cands else None
    got = {
        r["event_id"]: (
            (r["click_ts"], r["click_event_id"])
            if r["click_event_id"] is not None
            else None
        )
        for r in CQ.asof_click_after_purchase(spark, sf_dir).collect()
    }
    assert got == want


def test_incremental_dedup_flags_exactly_known_dups(spark, sf_dir):
    """The admission gate's is_dup equals a brute-force fingerprint
    membership test, and every incoming doc gets exactly one verdict."""
    import hashlib
    import re

    docs = load_table(spark, sf_dir, "documents").collect()
    fp = {
        r["doc_id"]: hashlib.md5(
            " ".join(
                re.split(r"\s+", r["text"].strip().lower())[: CQ._FP_TOKENS]
            ).encode()
        ).hexdigest()
        for r in docs
    }
    corpus = {h for d, h in fp.items() if d % 10 != 0}
    want = {d: (h in corpus) for d, h in fp.items() if d % 10 == 0}
    got = {
        r["doc_id"]: r["is_dup"]
        for r in CQ.incremental_dedup_ingest(spark, sf_dir).collect()
    }
    assert got == want


def test_boilerplate_threshold_is_exact(spark, sf_dir):
    """Every emitted shingle's document frequency satisfies the integer
    threshold; the most frequent NON-emitted shingle does not (the
    cut is exact, not float-fuzzy)."""
    from data_engineering_1_spark.operators.textanalysis import ngrams
    from data_engineering_1_spark.operators.textanalysis import tokens as tk

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    flagged = CQ.boilerplate_shingles(spark, sf_dir).collect()
    assert flagged, "fixture corpus must produce boilerplate signal"
    for r in flagged:
        assert r["df"] * 100 >= n_docs * 5
    emitted = {r["shingle"] for r in flagged}
    all_df = (
        docs.select("doc_id", tk("text").alias("__t"))
        .select("doc_id", F.explode(ngrams(F.col("__t"), 2)).alias("s"))
        .distinct()
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .collect()
    )
    best_out = max(
        (r["df"] for r in all_df if r["s"] not in emitted), default=0
    )
    assert best_out * 100 < n_docs * 5


def test_nth_values_match_driver_sort(spark, sf_dir):
    """first/2nd/3rd/last balances equal a driver-side sorted lookup."""
    rows = load_table(spark, sf_dir, "customer").collect()
    by_seg: dict = {}
    for r in rows:
        by_seg.setdefault(r["c_mktsegment"], []).append(
            (-r["c_acctbal"], r["c_custkey"], r["c_acctbal"])
        )
    got = {
        r["segment"]: r
        for r in CQ.segment_balance_nth_values(spark, sf_dir).collect()
    }
    for seg, vals in by_seg.items():
        vals.sort()
        bals = [v[2] for v in vals]
        g = got[seg]
        assert g["top_bal"] == bals[0]
        assert g["second_bal"] == (bals[1] if len(bals) > 1 else None)
        assert g["third_bal"] == (bals[2] if len(bals) > 2 else None)
        assert g["bottom_bal"] == bals[-1]

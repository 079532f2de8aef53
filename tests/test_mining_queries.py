"""Round-6 mining batch (X111-X116) vs independent pure-Python/numpy
references — same discipline as test_corpus_queries.py: each query's
algorithmic claim is recomputed from the raw fixture without Spark and
compared exactly (or under a float tolerance where a reference rounds
differently)."""

from __future__ import annotations

import collections
import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from data_engineering_1_spark.io import load_table
from data_engineering_1_spark.plans import registry


def _q(name, spark, sf_dir):
    return registry.get_queries()[name](spark, sf_dir).toPandas()


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").toPandas()


def test_hard_negatives_differ_in_label_and_rank_by_cosine(spark, sf_dir):
    out = _q("hard_negative_mining", spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").toPandas()
    vecs = {int(r.vec_id): np.array(r.embedding, dtype=np.float64)
            for r in emb.itertuples()}
    labels = {int(r.vec_id): int(r.label) for r in emb.itertuples()}

    for aid, grp in out.groupby("anchor_id"):
        grp = grp.sort_values("rn")
        assert list(grp["rn"]) == list(range(1, len(grp) + 1))
        # every negative's label differs from the anchor's
        assert all(labels[int(n)] != labels[int(aid)]
                   for n in grp["negative_id"])
        # cosine non-increasing down the ranks
        sims = list(grp["cosine_sim"])
        assert all(a >= b for a, b in zip(sims, sims[1:]))

    # brute-force check of ONE anchor against numpy
    aid = int(out["anchor_id"].iloc[0])
    a = vecs[aid]
    cands = [
        (round(float(np.dot(v, a) / (np.linalg.norm(v) * np.linalg.norm(a))), 6), vid)
        for vid, v in vecs.items() if labels[vid] != labels[aid]
    ]
    want = sorted(cands, key=lambda t: (-t[0], t[1]))[:5]
    got = out[out.anchor_id == aid].sort_values("rn")
    assert [int(v) for v in got["negative_id"]] == [vid for _, vid in want]


def test_int8_rerank_orders_candidates_by_exact_cosine(spark, sf_dir):
    out = _q("int8_rerank_topk", spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").toPandas()
    vecs = {int(r.vec_id): np.array(r.embedding, dtype=np.float64)
            for r in emb.itertuples()}
    q = vecs[1]

    def code(v):
        return np.floor(np.clip(v, -4.0, 4.0) * 31.75).astype(np.int64)

    qc = code(q)
    coarse = sorted(
        ((int(np.dot(code(v), qc)), vid)
         for vid, v in vecs.items() if vid != 1),
        key=lambda t: (-t[0], t[1]),
    )[:100]
    cand_ids = {vid for _, vid in coarse}
    # the emitted ten are candidates, their coarse scores match, and
    # they are the candidate set's exact-cosine top-10
    assert set(out["vec_id"].astype(int)) <= cand_ids
    coarse_by_id = {vid: s for s, vid in coarse}
    for r in out.itertuples():
        assert int(r.coarse_score) == coarse_by_id[int(r.vec_id)]
    rescored = sorted(
        ((round(float(np.dot(vecs[vid], q)
                      / (np.linalg.norm(vecs[vid]) * np.linalg.norm(q))), 6),
          vid) for vid in cand_ids),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    assert [int(v) for v in out.sort_values("rn")["vec_id"]] == [
        vid for _, vid in rescored
    ]


def test_bpe_first_merges_matches_pure_python(spark, sf_dir):
    out = _q("bpe_first_merges", spark, sf_dir)
    docs = _docs(spark, sf_dir)
    vocab = collections.Counter()
    for text in docs["text"]:
        for w in str(text).strip().lower().split():
            if len(w) >= 2:
                vocab[w] += 1
    pairs = collections.Counter()
    for w, freq in vocab.items():
        for i in range(len(w) - 1):
            pairs[w[i:i + 2]] += freq
    want = sorted(pairs.items(), key=lambda t: (-t[1], t[0]))[:30]
    got = [(r.pair, int(r.pair_count))
           for r in out.sort_values("merge_rank").itertuples()]
    assert got == want


def test_url_canonical_dedup_groups_exactly(spark, sf_dir):
    out = _q("url_canonical_dedup", spark, sf_dir)
    docs = _docs(spark, sf_dir)
    groups = collections.defaultdict(list)
    for r in docs.itertuples():
        canon = (
            f"https://www.{r.source}.example.com/page/{int(r.doc_id) % 25}"
            f"?id={int(r.doc_id) % 4}"
        )
        groups[canon].append(int(r.doc_id))
    want = {
        c: (len(ids), min(ids))
        for c, ids in groups.items() if len(ids) >= 2
    }
    got = {
        r.canonical_url: (int(r.n_dups), int(r.keeper_doc_id))
        for r in out.itertuples()
    }
    assert got == want


def test_repeated_substring_spans_recount_exact(spark, sf_dir):
    out = _q("repeated_substring_spans", spark, sf_dir)
    docs = _docs(spark, sf_dir)
    counts = collections.Counter()
    doc_sets = collections.defaultdict(set)
    for r in docs.itertuples():
        text = str(r.text)
        for p in range(0, max(0, len(text) - 19), 10):
            s = text[p:p + 20]
            counts[s] += 1
            doc_sets[s].add(int(r.doc_id))
    survivors = [
        (s, len(doc_sets[s]), counts[s])
        for s in counts if len(doc_sets[s]) >= 3
    ]
    want = sorted(survivors, key=lambda t: (-t[1], -t[2], t[0]))[:50]
    got = [(r.span, int(r.n_docs), int(r.n_occurrences))
           for r in out.itertuples()]
    assert got == want


def test_mixture_alloc_sums_to_budget_and_orders_by_size(spark, sf_dir):
    out = _q("mixture_temperature_alloc", spark, sf_dir)
    assert int(out["alloc"].sum()) == 100_000
    # every alloc is floor(share) or floor(share) + 1
    for r in out.itertuples():
        assert math.floor(r.share) <= r.alloc <= math.floor(r.share) + 1
    # sqrt weights preserve the size ordering: bigger source, >= alloc
    srt = out.sort_values("n_docs")
    allocs = list(srt["alloc"])
    assert all(a <= b + 1 for a, b in zip(allocs, allocs[1:]))
    # shares match an independent recompute under rounding tolerance
    w = {r.source: math.sqrt(int(r.n_docs)) for r in out.itertuples()}
    tot = sum(w.values())
    for r in out.itertuples():
        assert abs(r.share - w[r.source] * 100_000 / tot) < 1e-3


def test_linear_interpolation_matches_pure_python(spark, sf_dir):
    import hashlib
    from datetime import timedelta

    out = _q("linear_interpolate_daily", spark, sf_dir)
    ev = load_table(spark, sf_dir, "events").toPandas()
    ev["day"] = pd.to_datetime(ev["ts"]).dt.date
    daily = ev.groupby(["event_type", "day"])["value"].sum()
    d0, d1 = ev["day"].min(), ev["day"].max()
    days = [d0 + timedelta(days=i) for i in range((d1 - d0).days + 1)]

    def observed(t, d):
        h = hashlib.md5(f"obs|{t}|{d.isoformat()}".encode()).hexdigest()
        return int(h[:8], 16) % 3 == 0

    want = {}
    for t in sorted(ev["event_type"].unique()):
        series = [
            (d, float(daily.get((t, d), 0.0)))
            if (t, d) in daily and observed(t, d) else (d, None)
            for d in days
        ]
        known = [(i, v) for i, (_, v) in enumerate(series) if v is not None]
        for i, (d, v) in enumerate(series):
            if v is not None:
                want[(t, d)] = (round(v, 6), "observed")
                continue
            prev = [(j, kv) for j, kv in known if j < i]
            nxt = [(j, kv) for j, kv in known if j > i]
            if prev and nxt:
                (jp, vp), (jn, vn) = prev[-1], nxt[0]
                want[(t, d)] = (
                    round(vp + (vn - vp) * (i - jp) / (jn - jp), 6),
                    "interp",
                )
    got = {
        (r.event_type, r.day): (r.val, r.src) for r in out.itertuples()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][1] == want[k][1], (k, got[k], want[k])
        assert abs(got[k][0] - want[k][0]) < 1e-6, (k, got[k], want[k])


def test_ensemble_vote_is_union_of_declared_detectors(spark, sf_dir):
    out = _q("ensemble_neardup_vote", spark, sf_dir)
    mh = _q("minhash_lsh_pairs", spark, sf_dir)
    sh = _q("simhash_neardup", spark, sf_dir)
    mh_pairs = {(int(a), int(b)) for a, b in zip(mh.doc_a, mh.doc_b)}
    sh_pairs = {(int(a), int(b)) for a, b in zip(sh.doc_a, sh.doc_b)}
    want = {}
    for p in mh_pairs | sh_pairs:
        ms = sorted(
            (["minhash"] if p in mh_pairs else [])
            + (["simhash"] if p in sh_pairs else [])
        )
        want[p] = (len(ms), ",".join(ms))
    got = {
        (int(r.doc_a), int(r.doc_b)): (int(r.n_methods), r.methods)
        for r in out.itertuples()
    }
    assert got == want


def test_lsh_admission_is_new_by_corpus_subset_of_candidates(spark, sf_dir):
    out = _q("lsh_index_admission", spark, sf_dir)
    assert (out["new_doc"] % 10 == 0).all()
    assert (out["corpus_doc"] % 10 != 0).all()
    assert out["n_shared_bands"].between(1, 4).all()
    # every admission pair is an LSH candidate pair (unordered match)
    mh = _q("minhash_lsh_pairs", spark, sf_dir)
    cand = {(int(a), int(b)) for a, b in zip(mh.doc_a, mh.doc_b)}
    for r in out.itertuples():
        p = tuple(sorted((int(r.new_doc), int(r.corpus_doc))))
        assert p in cand, p


def test_curriculum_stages_partition_docs_by_exact_quartiles(spark, sf_dir):
    out = _q("curriculum_stages", spark, sf_dir).sort_values("stage")
    docs = _docs(spark, sf_dir)
    ntok = docs["text"].map(lambda t: len(str(t).strip().lower().split()))
    assert int(out["n_docs"].sum()) == len(docs)
    qs = np.percentile(ntok, [25, 50, 75], method="linear")
    stages = 1 + sum((ntok.to_numpy()[:, None] > qs).T)
    want = pd.Series(stages).value_counts().sort_index()
    got = dict(zip(out["stage"], out["n_docs"]))
    assert {int(k): int(v) for k, v in want.items()} == {
        int(k): int(v) for k, v in got.items()
    }
    # value-contiguous stages: ranges never overlap
    rows = list(out.itertuples())
    for a, b in zip(rows, rows[1:]):
        assert a.max_tok <= b.min_tok


def test_ewma_matches_sequential_recursion(spark, sf_dir):
    out = _q("ewma_halflife_daily", spark, sf_dir)
    ev = load_table(spark, sf_dir, "events").toPandas()
    ev["day"] = pd.to_datetime(ev["ts"]).dt.date
    daily = (
        ev.groupby(["event_type", "day"])["value"].sum().round(6)
    )
    got = {
        (r.event_type, r.day): (r.val, r.ewma) for r in out.itertuples()
    }
    for t in ev["event_type"].unique():
        days = sorted(d for (tt, d) in daily.index if tt == t)
        vals = [float(daily[(t, d)]) for d in days]
        acc_hist = []
        for i, v in enumerate(vals):
            lo = max(0, i - 50)
            frame = vals[lo:i + 1]
            acc = frame[0]
            for x in frame[1:]:
                acc = acc * 0.5 + x * 0.5
            acc_hist.append(acc)
            gv, ge = got[(t, days[i])]
            assert abs(gv - round(vals[i], 6)) < 1e-5
            assert abs(ge - acc) < 1e-5, (t, days[i], ge, acc)


def test_stratified_split_sums_and_ratios(spark, sf_dir):
    out = _q("stratified_exact_split", spark, sf_dir)
    docs = _docs(spark, sf_dir)
    per_lang = docs.groupby("lang").size()
    for lang, n in per_lang.items():
        rows = {r.split: int(r.n_docs)
                for r in out[out.lang == lang].itertuples()}
        assert set(rows) == {"train", "val", "test"}
        assert sum(rows.values()) == n  # exact conservation
        # train gets within 1 of 80%; val/test within 1 of 10%
        assert abs(rows["train"] - 0.8 * n) <= 1
        assert abs(rows["val"] - 0.1 * n) <= 1
        assert abs(rows["test"] - 0.1 * n) <= 1
        assert rows["train"] >= rows["val"] >= 0


def test_bigram_xentropy_matches_pure_python(spark, sf_dir):
    out = _q("bigram_xentropy_docs", spark, sf_dir)
    docs = _docs(spark, sf_dir)
    toks = {
        int(r.doc_id): str(r.text).strip().lower().split()
        for r in docs.itertuples()
    }
    c12, c1 = collections.Counter(), collections.Counter()
    vocab = set()
    for t in toks.values():
        vocab.update(t)
        for a, b in zip(t, t[1:]):
            c12[(a, b)] += 1
            c1[a] += 1
    V = len(vocab)
    for r in out.itertuples():
        t = toks[int(r.doc_id)]
        bgs = list(zip(t, t[1:]))
        assert int(r.n_bigrams) == len(bgs)
        want = sum(
            -math.log((c12[bg] + 1) / (c1[bg[0]] + V)) for bg in bgs
        ) / len(bgs)
        assert abs(r.xent - want) < 1e-5, (r.doc_id, r.xent, want)


def test_prefix_filter_join_is_exact_no_false_negatives(spark, sf_dir):
    """The completeness theorem: brute-force ALL shingle-set pairs in
    Python and assert the operator found EXACTLY the Jaccard >= 0.8
    set — the property that separates prefix filtering from LSH."""
    out = _q("prefix_filter_jaccard_join", spark, sf_dir)
    docs = _docs(spark, sf_dir)

    def shingle_set(text):
        t = str(text).strip().lower().split()
        return {" ".join(t[i:i + 3]) for i in range(len(t) - 2)}

    sets = {
        int(r.doc_id): shingle_set(r.text)
        for r in docs.itertuples()
        if len(str(r.text).strip().lower().split()) >= 3
    }
    ids = sorted(sets)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            j = round(inter / (len(sets[a]) + len(sets[b]) - inter), 6)
            if j >= 0.8:
                want[(a, b)] = j
    got = {
        (int(r.doc_a), int(r.doc_b)): r.jaccard for r in out.itertuples()
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9



def test_rrf_fusion_matches_pure_python(spark, sf_dir):
    out = _q("rrf_fusion_topk", spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").toPandas()
    vecs = {int(r.vec_id): np.array(r.embedding, dtype=np.float64)
            for r in emb.itertuples()}
    q = vecs[0]

    def code(v):
        return np.floor(np.clip(v, -4.0, 4.0) * 31.75).astype(np.int64)

    qc = code(q)
    others = [vid for vid in vecs if vid != 0]
    exact = sorted(
        ((round(float(np.dot(vecs[v], q)
                      / (np.linalg.norm(vecs[v]) * np.linalg.norm(q))), 6),
          v) for v in others),
        key=lambda t: (-t[0], t[1]),
    )[:100]
    coarse = sorted(
        ((int(np.dot(code(vecs[v]), qc)), v) for v in others),
        key=lambda t: (-t[0], t[1]),
    )[:100]
    re = {v: i + 1 for i, (_, v) in enumerate(exact)}
    rc = {v: i + 1 for i, (_, v) in enumerate(coarse)}
    fused = sorted(
        ((round((1 / (60 + re[v]) if v in re else 0)
                + (1 / (60 + rc[v]) if v in rc else 0), 6), v)
         for v in set(re) | set(rc)),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    got = [(r.rrf, int(r.vec_id)) for r in out.itertuples()]
    assert got == fused


def test_mad_outliers_match_numpy(spark, sf_dir):
    out = _q("mad_outlier_events", spark, sf_dir)
    ev = load_table(spark, sf_dir, "events").toPandas()
    rows = []
    for t, grp in ev.groupby("event_type"):
        v = grp["value"].to_numpy()
        med = np.percentile(v, 50, method="linear")
        mad = np.percentile(np.abs(v - med), 50, method="linear")
        if mad == 0:
            continue
        for eid, val in zip(grp["event_id"], v):
            rows.append((round(0.6745 * (val - med) / mad, 6), int(eid)))
    want = sorted(rows, key=lambda r: (-abs(r[0]), r[1]))[:30]
    got = [(r.robust_z, int(r.event_id)) for r in out.itertuples()]
    assert got == want


def test_nucleus_vocab_covers_at_least_90pct_minimally(spark, sf_dir):
    out = _q("nucleus_vocab_per_lang", spark, sf_dir)
    docs = _docs(spark, sf_dir)
    for r in out.itertuples():
        toks = collections.Counter()
        for t in docs[docs.lang == r.lang]["text"]:
            toks.update(str(t).strip().lower().split())
        total = sum(toks.values())
        ranked = sorted(toks.items(), key=lambda kv: (-kv[1], kv[0]))
        cum, kept = 0, 0
        for w, n in ranked:
            if cum * 10 < total * 9:
                cum += n
                kept += 1
            else:
                break
        assert int(r.n_kept) == kept
        assert int(r.kept_occ) == cum
        assert int(r.total_occ) == total
        assert cum * 10 >= total * 9  # coverage reached
        # minimality: dropping the last kept word falls below 90%
        if kept:
            assert (cum - ranked[kept - 1][1]) * 10 < total * 9


def test_weighted_median_crossing_property(spark, sf_dir):
    out = _q("weighted_median_price", spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    for r in out.itertuples():
        grp = li[li.l_returnflag == r.flag]
        w_le = grp[grp.l_extendedprice.round(2) <= r.wmedian][
            "l_quantity"].sum()
        w_lt = grp[grp.l_extendedprice.round(2) < r.wmedian][
            "l_quantity"].sum()
        total = grp["l_quantity"].sum()
        assert 2 * w_le >= total - 1e-6  # crossing reached at wmedian
        assert 2 * w_lt < total + 1e-6  # ...and not before it
        assert abs(total - r.total_weight) < 1e-4


def test_ab_ztest_matches_scipy_style_formula(spark, sf_dir):
    out = _q("ab_proportion_ztest", spark, sf_dir)
    ev = load_table(spark, sf_dir, "events").toPandas()
    for r in out.itertuples():
        grp = ev[ev.event_type == r.event_type]
        v = (grp["user_id"] % 2).to_numpy()
        s = (grp["value"] >= 5.0).to_numpy().astype(int)
        n0, n1 = int((v == 0).sum()), int((v == 1).sum())
        s0, s1 = int(s[v == 0].sum()), int(s[v == 1].sum())
        assert (int(r.n0), int(r.n1), int(r.s0), int(r.s1)) == (
            n0, n1, s0, s1)
        pp = (s0 + s1) / (n0 + n1)
        z = (s1 / n1 - s0 / n0) / math.sqrt(
            pp * (1 - pp) * (1 / n0 + 1 / n1))
        assert abs(r.z - round(z, 6)) < 1e-9
        assert bool(r.significant) == (abs(round(z, 6)) > 1.96)


def test_triangle_counts_match_pure_python(spark, sf_dir):
    out = _q("triangle_count_copurchase", spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    adj = collections.defaultdict(set)
    for ok_, grp in li.groupby("l_orderkey"):
        parts = sorted(set(int(p) for p in grp["l_partkey"]))
        for i, u in enumerate(parts):
            for v in parts[i + 1:]:
                adj[u].add(v)
                adj[v].add(u)
    tri = collections.Counter()
    nodes = sorted(adj)
    for u in nodes:
        for v in adj[u]:
            if v <= u:
                continue
            common = adj[u] & adj[v]
            for w in common:
                if w > v:  # each triangle once: u < v < w
                    tri[u] += 1
                    tri[v] += 1
                    tri[w] += 1
    want = sorted(
        ((n, c) for n, c in tri.items()), key=lambda t: (-t[1], t[0])
    )[:30]
    got = [(int(r.part_key), int(r.n_triangles)) for r in out.itertuples()]
    assert got == want


def test_interevent_gaps_match_pandas(spark, sf_dir):
    out = _q("interevent_gap_stats", spark, sf_dir)
    ev = load_table(spark, sf_dir, "events").toPandas()
    ev = ev.sort_values(["user_id", "event_type", "ts", "event_id"])
    ev["us"] = pd.to_datetime(ev["ts"]).astype("int64") // 1000
    gaps = collections.defaultdict(list)
    for (_, t), grp in ev.groupby(["user_id", "event_type"]):
        us = grp["us"].to_numpy()
        gaps[t].extend((us[1:] - us[:-1]).tolist())
    for r in out.itertuples():
        g = np.array(sorted(gaps[r.event_type]), dtype=np.float64)
        assert int(r.n_gaps) == len(g)
        assert abs(r.mean_gap_s - round(g.mean() / 1e6, 6)) < 1e-5
        assert abs(
            r.median_gap_s
            - round(np.percentile(g, 50, method="linear") / 1e6, 6)
        ) < 1e-5
        assert abs(
            r.p90_gap_s
            - round(np.percentile(g, 90, method="linear") / 1e6, 6)
        ) < 1e-5


def test_column_entropy_matches_scipy_formula(spark, sf_dir):
    out = _q("column_entropy_orders", spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders").toPandas()
    for r in out.itertuples():
        counts = orders[r.col_name].astype(str).value_counts()
        n = counts.sum()
        p = counts / n
        want = float(-(p * np.log(p)).sum())
        assert int(r.n_distinct) == len(counts)
        assert int(r.n_rows) == n
        assert abs(r.entropy - want) < 1e-5
        # bounds: 0 <= H <= ln(k)
        assert -1e-9 <= r.entropy <= math.log(len(counts)) + 1e-9

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

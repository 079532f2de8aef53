"""Round-6 pipeline-instrumentation batch (X173-X178) vs independent
pure-Python references — same discipline as test_evalops_queries.py."""

from __future__ import annotations

import collections
import hashlib
import itertools
import math
import re
from decimal import Decimal

from data_engineering_1_spark.io import load_table
from data_engineering_1_spark.plans import registry
from data_engineering_1_spark.plans.instrument_queries import (
    _BLOOM_K,
    _BLOOM_M,
    _BLOOM_PROBES,
    _DECAY_CAP,
    _SRP_BITS,
    _SRP_DIM,
    _SRP_Q,
)


def _q(name, spark, sf_dir):
    return registry.get_queries()[name](spark, sf_dir).toPandas()


def _bridge(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _tokens(text: str) -> list[str]:
    return re.split(r"\s+", text.strip().lower())


def _shingles(text: str) -> set[str]:
    t = _tokens(text)
    return {
        " ".join(t[i : i + 3]) for i in range(len(t) - 2)
    } if len(t) >= 3 else set()


# ---- X173 srp_embedding_neardup ----------------------------------------


def test_srp_pairs_match_pure_python(spark, sf_dir):
    out = _q("srp_embedding_neardup", spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings").toPandas()
    signs = {
        (b, d): 1 if _bridge(f"srp|{b}|{d}") % 2 == 0 else -1
        for b in range(_SRP_BITS)
        for d in range(1, _SRP_DIM + 1)
    }
    sigs = {}
    for r in emb.itertuples():
        # round-half-away-from-zero, matching both engines' double ROUND
        q = [
            int(math.floor(float(v) * _SRP_Q + 0.5))
            if float(v) >= 0
            else -int(math.floor(-float(v) * _SRP_Q + 0.5))
            for v in r.embedding
        ]
        sig = 0
        for b in range(_SRP_BITS):
            s = sum(signs[(b, d + 1)] * q[d] for d in range(_SRP_DIM))
            if s >= 0:
                sig |= 1 << b
        sigs[r.vec_id] = sig
    cand = set()
    buckets = collections.defaultdict(list)
    for vid, sig in sigs.items():
        buckets[(0, sig % 256)].append(vid)
        buckets[(1, sig // 256)].append(vid)
    for ids in buckets.values():
        for a, b in itertools.combinations(sorted(ids), 2):
            cand.add((a, b))
    want = {
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for a, b in cand
        if bin(sigs[a] ^ sigs[b]).count("1") <= 3
    }
    got = {(r.vec_a, r.vec_b, int(r.hamming)) for r in out.itertuples()}
    assert got == want
    assert (out.hamming >= 0).all() and (out.hamming <= 3).all()
    # banding binds: every emitted pair shares at least one band
    for r in out.itertuples():
        sa, sb = sigs[r.vec_a], sigs[r.vec_b]
        assert sa % 256 == sb % 256 or sa // 256 == sb // 256


# ---- X174 lsh_quality_eval ----------------------------------------------


def test_lsh_quality_matches_brute_force(spark, sf_dir):
    out = _q("lsh_quality_eval", spark, sf_dir).iloc[0]
    docs = load_table(spark, sf_dir, "documents").toPandas()
    sh = {r.doc_id: _shingles(r.text) for r in docs.itertuples()}
    # exact ground truth: brute-force all-pairs shingle Jaccard >= 0.8
    truth = set()
    ids = sorted(sh)
    for a, b in itertools.combinations(ids, 2):
        sa, sb = sh[a], sh[b]
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        j = round(inter / (len(sa) + len(sb) - inter), 6)
        if j >= 0.8:
            truth.add((a, b))
    # candidates: the E7 minhash scheme (4 bands x 2 rows, md5)
    sig = collections.defaultdict(dict)
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
            sig[(band, "|".join(mins))].setdefault(did, True)
    cand = set()
    for ids2 in sig.values():
        for a, b in itertools.combinations(sorted(ids2), 2):
            cand.add((a, b))
    tp = len(cand & truth)
    assert int(out.n_candidates) == len(cand)
    assert int(out.n_true_pairs) == len(truth)
    assert int(out.n_tp) == tp
    assert math.isclose(out.precision, round(tp / len(cand), 6), abs_tol=1e-9)
    assert math.isclose(out.recall, round(tp / len(truth), 6), abs_tol=1e-9)
    # the eval is non-degenerate on this fixture: there ARE true pairs
    assert len(truth) > 0 and len(cand) > 0


# ---- X175 decayed_part_leaderboard --------------------------------------


def test_decayed_leaderboard_matches_exact_integers(spark, sf_dir):
    out = _q("decayed_part_leaderboard", spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    li["d"] = li.l_shipdate.dt.normalize()
    ref = li.d.max()
    scaled = collections.defaultdict(int)
    total = collections.defaultdict(int)
    for r in li.itertuples():
        a = (ref - r.d).days // 7
        qty = int(r.l_quantity)
        total[r.l_partkey] += qty
        if a <= _DECAY_CAP:
            scaled[r.l_partkey] += qty * (1 << (_DECAY_CAP - a))
    top = sorted(total, key=lambda k: (-scaled[k], k))[:20]
    assert list(out.l_partkey) == top
    for r in out.itertuples():
        assert int(r.total_qty) == total[r.l_partkey]
        assert math.isclose(
            r.decayed_score,
            round(scaled[r.l_partkey] / 2**_DECAY_CAP, 6),
            abs_tol=1e-6,
        )
    # decay binds: leaderboard is NOT the raw-volume top-20 order
    raw_top = sorted(total, key=lambda k: (-total[k], k))[:20]
    assert top != raw_top


# ---- X176 revenue_share_of_parent ----------------------------------------


def test_share_of_parent_matches_decimal_exact(spark, sf_dir):
    out = _q("revenue_share_of_parent", spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    o = load_table(spark, sf_dir, "orders").toPandas()
    c = load_table(spark, sf_dir, "customer").toPandas()
    n = load_table(spark, sf_dir, "nation").toPandas()
    r = load_table(spark, sf_dir, "region").toPandas()
    j = (
        li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(n, left_on="c_nationkey", right_on="n_nationkey")
        .merge(r, left_on="n_regionkey", right_on="r_regionkey")
    )
    rev = collections.defaultdict(Decimal)
    for t in j.itertuples():
        p = Decimal(f"{t.l_extendedprice:.2f}") * (
            1 - Decimal(f"{t.l_discount:.2f}")
        )
        rev[(t.r_name, t.n_name)] += p
    reg_tot = collections.defaultdict(Decimal)
    for (rg, _), v in rev.items():
        reg_tot[rg] += v
    grand = sum(rev.values())
    assert len(out) == len(rev)
    for t in out.itertuples():
        v = rev[(t.region, t.nation)]
        cents = int(
            (v * 100).quantize(Decimal(1), rounding="ROUND_HALF_UP")
        )
        assert int(t.revenue_cents) == cents, (t.region, t.nation)
        assert math.isclose(
            t.share_of_region,
            round(float(v) / float(reg_tot[t.region]), 6),
            abs_tol=1e-6,
        )
        assert math.isclose(
            t.share_of_total,
            round(float(v) / float(grand), 6),
            abs_tol=1e-6,
        )
    # shares sum to ~1 within each region
    assert abs(out.groupby("region").share_of_region.sum() - 1).max() < 1e-4


# ---- X177 tokenizer_fertility_by_lang -------------------------------------

_BPE_ASCII = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+")


def test_fertility_matches_pure_python(spark, sf_dir):
    out = _q("tokenizer_fertility_by_lang", spark, sf_dir).set_index(
        "lang"
    )
    docs = load_table(spark, sf_dir, "documents").toPandas()
    # fixture text is ASCII, so the \p{L}/\p{N} classes reduce to these
    assert docs.text.map(lambda t: t.isascii()).all()
    agg = collections.defaultdict(lambda: [0, 0, 0, 0])
    for r in docs.itertuples():
        a = agg[r.lang]
        a[0] += 1
        a[1] += len(_tokens(r.text))
        a[2] += len(_BPE_ASCII.findall(r.text))
        a[3] += len(r.text)
    for lang, (nd, nw, nb, nc) in agg.items():
        row = out.loc[lang]
        assert int(row.n_docs) == nd
        assert int(row.n_words) == nw
        assert int(row.n_bpe_tokens) == nb
        assert int(row.n_chars) == nc
        assert math.isclose(row.fertility, round(nb / nw, 6), abs_tol=1e-9)
        assert math.isclose(
            row.chars_per_token, round(nc / nb, 6), abs_tol=1e-9
        )
    # BPE tokenization is finer than whitespace words
    assert (out.n_bpe_tokens >= out.n_words).all()


# ---- X178 bloom_filter_fp_audit --------------------------------------------


def test_bloom_audit_matches_pure_python_and_theory(spark, sf_dir):
    out = _q("bloom_filter_fp_audit", spark, sf_dir).iloc[0]
    cust = load_table(spark, sf_dir, "customer").toPandas()
    bits = {
        _bridge(f"bloom|{i}|{k}") % _BLOOM_M
        for k in cust.c_custkey
        for i in range(_BLOOM_K)
    }
    n_fp = 0
    for g in range(1, _BLOOM_PROBES + 1):
        pk = 1000000000 + g
        if all(
            _bridge(f"bloom|{i}|{pk}") % _BLOOM_M in bits
            for i in range(_BLOOM_K)
        ):
            n_fp += 1
    assert int(out.m_bits) == _BLOOM_M
    assert int(out.k_hashes) == _BLOOM_K
    assert int(out.n_members) == len(cust)
    assert int(out.n_bits_set) == len(bits)
    assert int(out.n_probes) == _BLOOM_PROBES
    assert int(out.n_false_positives) == n_fp
    assert math.isclose(
        out.fp_rate, round(n_fp / _BLOOM_PROBES, 6), abs_tol=1e-9
    )
    # measured rate is in the theory ballpark: with p_bit = fraction of
    # bits set, P[FP] = p_bit^k exactly (independent-position model)
    p_bit = len(bits) / _BLOOM_M
    expect = _BLOOM_PROBES * p_bit**_BLOOM_K
    assert n_fp <= 10 * expect + 5

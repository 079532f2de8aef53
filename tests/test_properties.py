"""Property-based invariants (hypothesis) for segmentation, n-grams and
SimHash — complements the golden tests with generated inputs."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_engineering_1_spark.functions.udfs import mapinpandas_tokens  # noqa: F401 (import check)
from data_engineering_1_spark.sources.pdf import segment_plain

TEXTISH = st.text(
    alphabet=st.characters(
        codec="utf-8", categories=("L", "N", "P", "Zs"), include_characters="\n。？！"
    ),
    max_size=400,
)


class TestSegmentPlainProperties:
    @given(TEXTISH)
    @settings(max_examples=200, deadline=None)
    def test_no_empty_paragraphs(self, text):
        for p in segment_plain(text):
            assert p.strip() != ""

    @given(TEXTISH)
    @settings(max_examples=200, deadline=None)
    def test_content_preserved(self, text):
        # every non-whitespace char of the input appears in the output
        # (segmentation only splits/joins, never drops content)
        out = "".join(segment_plain(text))
        for ch in set(re.sub(r"\s", "", text)):
            assert ch in out

    @given(st.lists(st.text(alphabet="abc .", min_size=1, max_size=40), max_size=8))
    @settings(max_examples=100, deadline=None)
    def test_idempotent_on_single_lines(self, lines):
        # feeding already-segmented single-line paragraphs back through
        # (blank-line separated) yields the same paragraphs re-tokenized:
        # outputs never contain newlines
        text = "\n\n".join(lines)
        for p in segment_plain(text):
            assert "\n" not in p


class TestSimHashProperties:
    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.lists(
            st.text(alphabet="abcdefg", min_size=1, max_size=6),
            min_size=1,
            max_size=12,
        )
    )
    def test_order_invariant_and_bounded(self, spark, words):
        from data_engineering_1_spark.operators.dedup import simhash

        fwd = " ".join(words)
        rev = " ".join(reversed(words))
        df = spark.createDataFrame(
            [(1, fwd), (2, rev)], "doc_id bigint, text string"
        )
        fp = {r.doc_id: r.simhash for r in simhash(df).collect()}
        assert fp[1] == fp[2]  # bag-of-words: token order never matters
        assert 0 <= fp[1] < (1 << 32)


class TestLshRecallProperties:
    """MinHash-LSH pipeline invariants (VERDICT r1 item 10).

    LSH recall is PROBABILISTIC over the hash family — at the shipped
    (n_bands=4, rows_per_band=2) a true-Jaccard-0.8 pair buckets together
    with p = 1-(1-J^2)^4 ~ 0.98 — but our hash family is FIXED
    (md5(band|row|shingle)), so for any CONCRETE corpus candidacy is a
    deterministic function of the shingle sets. derandomize=True makes
    hypothesis replay the same corpora every run: the assertions below
    are therefore stable, and what they pin is that the banding/bucketing
    plumbing never drops a pair the hash family DID bucket together —
    plus the two unconditional guarantees (identical shingle sets always
    collide; emitted candidates really share a band bucket).
    """

    @staticmethod
    def _corpus(spark, docs):
        return spark.createDataFrame(
            [(i, " ".join(toks)) for i, toks in enumerate(docs)],
            "doc_id long, text string",
        )

    @staticmethod
    def _shingle_set(toks, k=3):
        if len(toks) < k:
            return set()
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    @staticmethod
    def _jaccard(s1, s2):
        if not s1 and not s2:
            return 0.0
        return len(s1 & s2) / len(s1 | s2)

    BASE = [f"w{i}" for i in range(30)]

    @settings(
        max_examples=8,
        deadline=None,
        derandomize=True,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=29),  # mutate position
                st.sampled_from(["x", "y", "z"]),  # replacement token
            ),
            min_size=0,
            max_size=3,
            unique_by=lambda t: t[0],
        ),
        st.integers(min_value=2, max_value=4),  # corpus copies
    )
    def test_high_jaccard_pairs_are_candidates(self, spark, mutations, n_docs):
        from data_engineering_1_spark.operators.dedup import (
            lsh_candidate_pairs,
            minhash_signatures,
        )

        # n_docs near-copies of BASE, each with <=3 token substitutions:
        # pairwise Jaccard stays high (>= ~0.6 with 3 mutations of 28
        # shingle positions), most pairs >= 0.8
        docs = [list(self.BASE)]
        for d in range(1, n_docs):
            toks = list(self.BASE)
            for pos, repl in mutations[: d % (len(mutations) + 1)]:
                toks[pos] = repl + str(d)
            docs.append(toks)
        df = self._corpus(spark, docs)
        sigs = minhash_signatures(df)
        got = {
            (r.doc_a, r.doc_b)
            for r in lsh_candidate_pairs(sigs).collect()
        }
        sets = [self._shingle_set(toks) for toks in docs]
        # "No false negatives at J>=0.8" is NOT a theorem at (b=4, r=2):
        # per-pair miss probability is (1-J^2)^4 ~ 1.7% at J=0.8, and
        # hypothesis finds concrete misses (first run of this test did —
        # a J=0.806 pair the md5 family never buckets together). The
        # per-pair assertion is pinned where misses are near-impossible:
        # J >= 0.95 => miss prob (1-0.9025)^4 ~ 9e-5, and derandomized
        # examples make any pass/fail outcome reproducible. Aggregate
        # recall at J >= 0.8 is covered by test_planted_corpus_recall.
        strong_missed = []
        for a in range(len(docs)):
            for b in range(a + 1, len(docs)):
                j = self._jaccard(sets[a], sets[b])
                if j >= 0.95 and (a, b) not in got:
                    strong_missed.append((a, b, j))
        assert not strong_missed, (
            f"near-certain pairs missed by LSH: {strong_missed}"
        )

    def test_planted_corpus_recall(self, spark):
        """Aggregate recall on a fixed corpus with many planted high-J
        pairs: 20 distinct base docs (60 tokens: 58 shingles) x 3
        near-copies each (1 token mutated per copy) => 60 within-group
        pairs. base-copy J = 55/61 ~ 0.90, copy-copy J = 52/64 ~ 0.81 —
        all >= 0.8 (asserted).
        Expected recall at (b=4, r=2) is ~0.98 per pair; the corpus and
        hash family are fixed, so the observed set is deterministic —
        the 0.9 floor just leaves slack for the family's known ~2% miss
        rate without ever flaking."""
        from data_engineering_1_spark.operators.dedup import (
            lsh_candidate_pairs,
            minhash_signatures,
        )

        docs, truth = [], []
        doc_id = 0
        for g in range(20):
            base = [f"g{g}w{i}" for i in range(60)]
            members = []
            for c in range(3):
                toks = list(base)
                if c:  # copy 0 is the base itself
                    toks[5 * c] = f"mut{g}_{c}"
                docs.append(toks)
                members.append(doc_id)
                doc_id += 1
            truth += [
                (a, b)
                for i, a in enumerate(members)
                for b in members[i + 1 :]
            ]
        sets = [self._shingle_set(t) for t in docs]
        assert all(self._jaccard(sets[a], sets[b]) >= 0.8 for a, b in truth)
        got = {
            (r.doc_a, r.doc_b)
            for r in lsh_candidate_pairs(
                minhash_signatures(self._corpus(spark, docs))
            ).collect()
        }
        hit = sum((a, b) in got for a, b in truth)
        assert hit / len(truth) >= 0.9, f"recall {hit}/{len(truth)}"

    def test_identical_docs_always_candidates(self, spark):
        """Unconditional: equal shingle sets => equal signatures in every
        band => guaranteed candidacy (no hash luck involved)."""
        from data_engineering_1_spark.operators.dedup import (
            lsh_candidate_pairs,
            minhash_signatures,
        )

        text = " ".join(self.BASE)
        df = spark.createDataFrame(
            [(0, text), (1, text), (2, "totally different words " * 3)],
            "doc_id long, text string",
        )
        got = {
            (r.doc_a, r.doc_b)
            for r in lsh_candidate_pairs(minhash_signatures(df)).collect()
        }
        assert (0, 1) in got

    def test_candidates_share_a_band_bucket(self, spark):
        """Soundness: every emitted pair really collides in >=1 band."""
        from data_engineering_1_spark.operators.dedup import (
            lsh_candidate_pairs,
            minhash_signatures,
        )

        docs = [list(self.BASE)]
        for d in range(1, 4):
            toks = list(self.BASE)
            toks[d] = f"sub{d}"
            docs.append(toks)
        sigs = minhash_signatures(self._corpus(spark, docs))
        pairs = lsh_candidate_pairs(sigs).collect()
        by_doc = {}
        for r in sigs.collect():
            by_doc.setdefault(r.doc_id, {})[r.band] = r.minhash
        for p in pairs:
            shared = [
                b
                for b in by_doc[p.doc_a]
                if by_doc[p.doc_a][b] == by_doc[p.doc_b].get(b)
            ]
            assert shared, f"pair ({p.doc_a},{p.doc_b}) shares no bucket"


class _FakeGroupState:
    """Minimal stand-in for pyspark's GroupState: enough surface to drive
    the sessionizer's pure state machine without a streaming query."""

    def __init__(self):
        self._value = None
        self.hasTimedOut = False
        self.timeout_ms = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = tuple(v)

    def remove(self):
        self._value = None

    def setTimeoutTimestamp(self, ms):
        self.timeout_ms = ms


class TestSessionizeStateMachine:
    """Property: delivering a user's events across micro-batches must
    reproduce exactly the batch sessionization (sort-all, gap split), for
    every delivery schedule compatible with eager in-batch emission —
    whole earlier sessions may arrive arbitrarily late (the
    emit-earlier-session branch), and the final session's events may
    arrive out of order as long as the delivered subset stays
    gap-connected (outward-expanding delivery; a real stream's watermark
    is what rules out retro-merges into already-emitted sessions). This
    is the invariant the round-3 advisory bug broke: a later-batch event
    earlier than the stored session start was folded in without lowering
    session_start."""

    GAP_US = 30 * 60 * 1_000_000

    @staticmethod
    def _batch_sessions(ts_list, gap_us):
        out = []
        for t in sorted(ts_list):
            if out and t - out[-1][1] <= gap_us:
                out[-1][1] = t
                out[-1][2] += 1
            else:
                out.append([t, t, 1])
        return [tuple(s) for s in out]

    @staticmethod
    def _split_sessions(events, gap_us):
        sessions = []
        for t in sorted(events):
            if sessions and t - sessions[-1][-1] <= gap_us:
                sessions[-1].append(t)
            else:
                sessions.append([t])
        return sessions

    @staticmethod
    def _drive(batches, gap_us):
        import pandas as pd

        from data_engineering_1_spark.streaming.pipelines import (
            _make_session_fn,
        )

        fn = _make_session_fn(gap_us)
        state = _FakeGroupState()
        emitted = []
        for batch in batches:
            if not batch:
                continue
            pdf = pd.DataFrame({"ts": pd.to_datetime(batch, unit="us")})
            for out in fn((1,), iter([pdf]), state):
                for r in out.itertuples(index=False):
                    emitted.append(
                        (
                            int(r.session_start.value // 1000),
                            int(r.session_end.value // 1000),
                            int(r.n_events),
                        )
                    )
        return emitted, state

    @given(
        st.lists(
            st.integers(min_value=0, max_value=600),  # minutes; gap is 30
            min_size=1,
            max_size=30,
        ),
        st.data(),
    )
    @settings(max_examples=200, deadline=None)
    def test_cross_batch_equals_batch_twin(self, minutes, data):
        us = [m * 60 * 1_000_000 for m in minutes]
        expected = self._batch_sessions(us, self.GAP_US)
        sessions = self._split_sessions(us, self.GAP_US)

        # batch 1: whole sessions 0..j-1 (in order)
        j = data.draw(st.integers(0, len(sessions)), label="cut")
        batch1 = [t for s in sessions[:j] for t in s]
        rest = sessions[j:]
        n_later = data.draw(st.integers(1, 3), label="n_later")
        later = [[] for _ in range(n_later)]
        if rest:
            # the final remaining session is delivered outward from a
            # contiguous seed window; every earlier remaining session is
            # delivered whole, in any later batch
            fin = rest[-1]
            for s in rest[:-1]:
                later[data.draw(st.integers(0, n_later - 1))].extend(s)
            a = data.draw(st.integers(0, len(fin) - 1), label="win_lo")
            b = data.draw(st.integers(a, len(fin) - 1), label="win_hi")
            later[0].extend(fin[a : b + 1])
            left = fin[:a][::-1]  # outward: descending
            right = fin[b + 1 :]  # outward: ascending
            for seq in (left, right):
                # split into n_later contiguous pieces; piece i lands in
                # later batch i, preserving outward order
                cuts = sorted(
                    data.draw(
                        st.lists(
                            st.integers(0, len(seq)),
                            min_size=n_later - 1,
                            max_size=n_later - 1,
                        )
                    )
                )
                bounds = [0, *cuts, len(seq)]
                for i in range(n_later):
                    later[i].extend(seq[bounds[i] : bounds[i + 1]])

        emitted, state = self._drive([batch1, *later], self.GAP_US)
        final = list(emitted)
        if state.exists:
            s, l, n = state.get
            final.append((int(s), int(l), int(n)))
        assert sorted(final) == sorted(expected), (
            f"batch1={batch1} later={later} emitted={emitted} "
            f"state={state.get} expected={expected}"
        )


def test_zvalue_interleave_is_bijective_and_ordered(spark):
    """X63's Morton key: property-check the bit interleave against a
    pure-Python reference — bijective (distinct pairs -> distinct keys)
    and exactly the reference interleave for every tested pair."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from data_engineering_1_spark.operators.maintenance import _zvalue

    def ref(a: int, b: int, bits: int = 16) -> int:
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    pairs_seen = {}

    @given(
        st.lists(
            st.tuples(
                st.integers(0, (1 << 16) - 1), st.integers(0, (1 << 16) - 1)
            ),
            min_size=1,
            max_size=20,
        )
    )
    @settings(max_examples=10, deadline=None)
    def run(pairs):
        from pyspark.sql import functions as F

        df = spark.createDataFrame(pairs, "a bigint, b bigint")
        got = [
            r["z"]
            for r in df.select(
                _zvalue(F.col("a"), F.col("b")).alias("z")
            ).collect()
        ]
        for (a, b), z in zip(pairs, got):
            assert z == ref(a, b), (a, b, z)
            prev = pairs_seen.setdefault(z, (a, b))
            assert prev == (a, b)  # bijective across all draws

    run()

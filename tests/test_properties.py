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

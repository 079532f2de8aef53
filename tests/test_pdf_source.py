"""PDF source + layout/plain segmentation (SURVEY.md S1-S2, C1-C3).

The segmentation functions are pure and pinned against hand-derived golden
outputs of the reference's rules (src/pdf_extractor.py:60-206); the
end-to-end pipeline runs on fake UTF-8 "PDFs" (the documented stub path)
through the real binaryFile scan + mapInPandas + JVM chunker.
"""

from __future__ import annotations

import pytest

from data_engineering_1_spark.sources import pdf as P


def _block(btype, y0, *lines):
    return {
        "type": btype,
        "y0": y0,
        "lines": [{"text": t, "y1": y1} for t, y1 in lines],
    }


class TestSegmentLayout:
    def test_vertical_gap_splits(self):
        # y0=100 vs rolling_y1 from previous line: gap > 15 -> new paragraph
        blocks = [
            _block(0, 0.0, ("First sentence of paragraph one.", 10.0)),
            _block(0, 100.0, ("Second paragraph starts far below it truly.", 110.0)),
        ]
        assert P.segment_layout(blocks) == [
            "First sentence of paragraph one.",
            "Second paragraph starts far below it truly.",
        ]

    def test_small_gap_joins_lines(self):
        blocks = [
            _block(
                0,
                0.0,
                ("line one continues onto", 10.0),
                # block y0 (0.0) vs last y1 (10.0): |0-10| <= 15 -> same para
                ("line two and ends here finally.", 20.0),
            )
        ]
        assert P.segment_layout(blocks) == [
            "line one continues onto line two and ends here finally."
        ]

    def test_block_type_change_splits(self):
        blocks = [
            _block(0, 0.0, ("Paragraph in a text block, long enough.", 10.0)),
            _block(1, 11.0, ("Different block type begins a new one here.", 21.0)),
        ]
        assert P.segment_layout(blocks) == [
            "Paragraph in a text block, long enough.",
            "Different block type begins a new one here.",
        ]

    def test_indentation_rule_dead_on_stripped_input(self):
        """Fidelity pin for the documented dead rule (pdf.py:58-62,
        reference pdf_extractor.py:93,:101): decode_pages strips every
        distilled line, so the indentation-start test can never fire on
        real input. Pin BOTH halves so a refactor can't silently "fix"
        the rule into divergence: (a) the span-join path produces no
        leading whitespace even from indented spans; (b) lines that
        differ only by (pre-strip) indentation do NOT split."""
        # (a) the distillation's span join (pdf.py:173-178) strips
        spans = [{"text": "    indented start"}, {"text": "more  "}]
        joined = "".join(
            s["text"] + " " for s in spans if s.get("text", "").strip()
        ).strip()
        assert joined == "    indented start more".strip()
        assert not joined[:1].isspace()
        # (b) an already-stripped line that WAS indented in the source
        # must not start a paragraph (no gap, no type change)
        blocks = [
            _block(
                0,
                0.0,
                ("unindented first line of the very same paragraph.", 10.0),
                ("was indented in the pdf source before stripping.", 12.0),
            )
        ]
        assert P.segment_layout(blocks) == [
            "unindented first line of the very same paragraph. "
            "was indented in the pdf source before stripping."
        ]
        # the rule itself still exists for raw (unstripped) input — the
        # fidelity reproduction of the reference's dead branch
        raw_blocks = [
            _block(
                0,
                0.0,
                ("unindented first line of the very same paragraph.", 10.0),
                ("    explicitly indented line splits on raw input.", 12.0),
            )
        ]
        assert P.segment_layout(raw_blocks) == [
            "unindented first line of the very same paragraph.",
            "    explicitly indented line splits on raw input.",
        ]

    def test_short_fragment_merges_forward(self):
        # <30 chars, no sentence-final punct -> carried into the next one
        blocks = [
            _block(0, 0.0, ("Broken header", 10.0)),
            _block(0, 100.0, ("The actual paragraph body follows the header.", 110.0)),
        ]
        assert P.segment_layout(blocks) == [
            "Broken header The actual paragraph body follows the header."
        ]

    def test_short_but_terminated_stays(self):
        blocks = [
            _block(0, 0.0, ("Short but done.", 10.0)),
            _block(0, 100.0, ("Another paragraph that is long enough to stay.", 110.0)),
        ]
        assert P.segment_layout(blocks) == [
            "Short but done.",
            "Another paragraph that is long enough to stay.",
        ]

    def test_trailing_fragment_flushes(self):
        blocks = [_block(0, 100.0, ("dangling tail", 110.0))]
        assert P.segment_layout(blocks) == ["dangling tail"]


class TestSegmentPlain:
    def test_blank_line_split(self):
        text = "Paragraph one stands alone here.\n\nParagraph two also by itself."
        assert P.segment_plain(text) == [
            "Paragraph one stands alone here.",
            "Paragraph two also by itself.",
        ]

    def test_sentence_end_starts_new(self):
        text = "First full sentence ends here.\nSecond distinct sentence follows it."
        assert P.segment_plain(text) == [
            "First full sentence ends here.",
            "Second distinct sentence follows it.",
        ]

    def test_unterminated_lines_join(self):
        text = "this line keeps going and\nwraps onto the following line"
        assert P.segment_plain(text) == [
            "this line keeps going and wraps onto the following line"
        ]

    def test_list_marker_starts_new(self):
        text = "intro line without a period\n1. first item\n2. second item"
        assert P.segment_plain(text) == [
            "intro line without a period",
            "1. first item",
            "2. second item",
        ]

    def test_cjk_terminator(self):
        text = "中文句子在这里结束。\n新的段落从这里开始的吧"
        assert P.segment_plain(text) == [
            "中文句子在这里结束。",
            "新的段落从这里开始的吧",
        ]


class TestDecodePages:
    def test_utf8_fake_pages(self):
        pages = P.decode_pages("page one text\fpage two text".encode(), "x.pdf")
        assert len(pages) == 2
        assert pages[0] == {"blocks": None, "raw": "page one text"}

    def test_binary_garbage_raises(self):
        with pytest.raises(NotImplementedError):
            P.decode_pages(b"\x89PNG\xff\xfe\x00\x01", "img.pdf")


@pytest.fixture(scope="module")
def pdf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pdfs")
    long_para = "All work and no play makes a dull boy. " * 20  # 780 chars
    (d / "doc_a.pdf").write_text(
        "Intro paragraph that is comfortably past ten characters.\n\n"
        + long_para
        + "\fSecond page paragraph, also long enough to keep.",
        encoding="utf-8",
    )
    (d / "doc_b.PDF").write_text(
        "short\n\nAnother perfectly reasonable paragraph on one page here.",
        encoding="utf-8",
    )
    (d / "notes.txt").write_text("must be ignored by the glob", encoding="utf-8")
    return str(d)


class TestPipeline:
    def test_scan_filters_extension(self, spark, pdf_dir):
        files = P.scan_pdf_dir(spark, pdf_dir)
        names = sorted(r.path.rsplit("/", 1)[-1] for r in files.select("path").collect())
        assert names == ["doc_a.pdf", "doc_b.PDF"]

    def test_extract_chunks_end_to_end(self, spark, pdf_dir):
        rows = P.extract_chunks(spark, pdf_dir).collect()
        by_src = {}
        for r in rows:
            by_src.setdefault(r.source, []).append(r)

        # doc_b: "short" paragraph dropped by the >=10 filter; one chunk left
        b = by_src["doc_b.PDF"]
        assert len(b) == 1
        assert b[0].text.startswith("Another perfectly reasonable")
        assert (b[0].page_number, b[0].paragraph_number, b[0].total_pages) == (1, 2, 1)
        assert b[0].chunk_number is None  # short text: no chunk_number

        # doc_a page 1: intro (1 chunk) + 780-char para -> 2 chunks (0-500,
        # 450-780=330>=50), page 2: one chunk
        a = by_src["doc_a.pdf"]
        p1_long = [r for r in a if r.page_number == 1 and r.chunk_number]
        assert [r.chunk_number for r in sorted(p1_long, key=lambda r: r.chunk_number)] == [1, 2]
        assert all(r.total_pages == 2 for r in a)
        p2 = [r for r in a if r.page_number == 2]
        assert len(p2) == 1 and p2[0].text.startswith("Second page paragraph")

    def test_chunk_overlap_semantics(self, spark, pdf_dir):
        a = [
            r
            for r in P.extract_chunks(spark, pdf_dir).collect()
            if r.source == "doc_a.pdf" and r.chunk_number
        ]
        c1 = next(r.text for r in a if r.chunk_number == 1)
        c2 = next(r.text for r in a if r.chunk_number == 2)
        assert len(c1) == 500
        assert c1[450:] == c2[:50]  # 50-char overlap


class TestDocumentMetadata:
    def test_defaults_applied(self, spark, pdf_dir):
        out = {
            r.filename: r
            for r in P.document_metadata(P.scan_pdf_dir(spark, pdf_dir)).collect()
        }
        assert set(out) == {"doc_a.pdf", "doc_b.PDF"}
        a = out["doc_a.pdf"]
        assert a.author == "未知"  # stub decoder has no metadata -> default
        assert a.title == "doc_a"  # filename stem default
        assert a.total_pages == 2
        assert out["doc_b.PDF"].title == "doc_b"
        assert out["doc_b.PDF"].total_pages == 1

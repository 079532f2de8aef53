"""ChunkWarehouse lifecycle: build / skip / force-rebuild / stats / export
(SURVEY.md §3.1 and §3.3 entry points)."""

from __future__ import annotations

import pytest

from data_engineering_1_spark.warehouse import CHUNKS, ChunkWarehouse


@pytest.fixture(scope="module")
def pdf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("wh_pdfs")
    (d / "a.pdf").write_text(
        "First document paragraph, long enough to survive filters.",
        encoding="utf-8",
    )
    (d / "b.pdf").write_text(
        "Second document paragraph, also long enough to survive."
        "\f" + ("Second page filler sentence repeated. " * 16),
        encoding="utf-8",
    )
    return str(d)


def test_cold_build_then_warm_skip(spark, pdf_dir, tmp_path):
    wh = ChunkWarehouse(spark, str(tmp_path / "wh1"))
    stats = wh.build(pdf_dir)
    assert stats["chunk_count"] > 0
    assert stats["chunk_count"] == stats["document_count"]

    # warm restart (§3.3): same build call must be a no-op, not a failure
    again = wh.build(pdf_dir)
    assert again == stats

    per_src = {r["source"]: r["count"] for r in wh.chunk_counts_per_source().collect()}
    assert set(per_src) == {"a.pdf", "b.pdf"}
    assert per_src["b.pdf"] >= 2  # two pages


def test_force_rebuild_overwrites(spark, pdf_dir, tmp_path):
    wh = ChunkWarehouse(spark, str(tmp_path / "wh2"))
    first = wh.build(pdf_dir)
    rebuilt = wh.build(pdf_dir, force_rebuild=True)
    assert rebuilt == first  # same inputs -> same counts, fresh tables


def test_chunk_ids_unique_and_embeddings_attached(spark, pdf_dir, tmp_path):
    wh = ChunkWarehouse(spark, str(tmp_path / "wh3"))
    wh.build(pdf_dir)
    emb = wh.load("embeddings")
    n = emb.count()
    assert emb.select("chunk_id").distinct().count() == n
    row = emb.select("embedding").first()
    assert len(row.embedding) == 64


def test_reset_drops_tables(spark, pdf_dir, tmp_path):
    wh = ChunkWarehouse(spark, str(tmp_path / "wh4"))
    wh.build(pdf_dir)
    wh.reset()
    assert wh.count(CHUNKS) == 0
    assert wh.stats() == {"chunk_count": 0, "document_count": 0}


def test_json_export_roundtrip(spark, pdf_dir, tmp_path):
    wh = ChunkWarehouse(spark, str(tmp_path / "wh5"))
    stats = wh.build(pdf_dir)
    out = str(tmp_path / "dump_json")
    wh.export_json(out)
    back = spark.read.json(out)
    assert back.count() == stats["document_count"]
    assert "text" in back.columns and "chunk_id" in back.columns

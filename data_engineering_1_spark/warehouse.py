"""Chunk/vector warehouse: the reference's persistence + orchestration
layer Spark-first (SURVEY.md §2.1 S3-S8, §2.5 A1-A3, §3.1 lifecycle).

The reference pipeline (src/main.py:14-78) is: extract PDFs -> CSV,
reload CSVs -> Chroma collection (skip when already populated, destroy on
--force-rebuild), then dump for inspection. Here the whole thing is one
lazy DAG over parquet tables:

  * ``chunks`` table  <- PDF dir scan + extraction + chunking
  * ``embeddings``    <- chunks + embedding column (Arrow-batched UDF)
  * skip-if-populated (src/main.py:27-28,42-43, vector_store.py:114-117)
    -> ``mode("ignore")`` / table-existence checks
  * --force-rebuild (src/main.py:38-39, vector_store.py:96-107 reset)
    -> ``mode("overwrite")``
  * save_content_for_inspection JSON dump (src/vector_store.py:184-205)
    -> ``df.write.json``
  * get_stats (src/vector_store.py:177-182) -> one-row count aggregate

Scale: tables are parquet partitioned by ``source`` so per-document
queries prune partitions; chunk ids are (source, page, paragraph, chunk)
composites — globally unique without the reference's driver-side
enumerate (src/vector_store.py:127), which would serialize at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.embedding import get_embedder
from .sources.pdf import extract_chunks

CHUNKS = "chunks"
EMBEDDINGS = "embeddings"


class ChunkWarehouse:
    """Parquet-backed replacement for the reference's CSV dir + Chroma
    collection pair."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        try:
            self.spark.read.parquet(self.path(table)).schema
            return True
        except Exception:
            return False

    def load(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self.path(table))

    def count(self, table: str) -> int:
        """A1 (collection.count, src/vector_store.py:98,115,150,180)."""
        return self.load(table).count() if self.exists(table) else 0

    def build(
        self,
        pdf_dir: str,
        force_rebuild: bool = False,
        embed_dim: int = 64,
    ) -> dict[str, int]:
        """setup_knowledge_base (src/main.py:14-78): extract + chunk ->
        chunks table; embed -> embeddings table. Idempotent unless
        ``force_rebuild`` (then both tables are overwritten, the reset
        semantics of src/vector_store.py:96-107)."""
        mode = "overwrite" if force_rebuild else "ignore"

        if force_rebuild or not self.exists(CHUNKS):
            chunks = extract_chunks(self.spark, pdf_dir).withColumn(
                "chunk_id",
                F.concat_ws(
                    ":",
                    "source",
                    "page_number",
                    "paragraph_number",
                    F.coalesce(F.col("chunk_number"), F.lit(0)),
                ),
            )
            (
                chunks.write.mode(mode)
                .partitionBy("source")
                .parquet(self.path(CHUNKS))
            )

        if force_rebuild or not self.exists(EMBEDDINGS):
            embed = get_embedder(dim=embed_dim)
            emb = self.load(CHUNKS).select(
                "chunk_id",
                "text",
                "source",
                "page_number",
                "paragraph_number",
                "total_pages",
                "chunk_number",
                embed("text").alias("embedding"),
            )
            emb.write.mode(mode).parquet(self.path(EMBEDDINGS))

        return self.stats()

    def stats(self) -> dict[str, int]:
        """A2+A3: per-table counts (the reference's stage-count prints and
        get_stats record)."""
        return {
            "chunk_count": self.count(CHUNKS),
            "document_count": self.count(EMBEDDINGS),
        }

    def chunk_counts_per_source(self) -> DataFrame:
        """A2: chunk-count per file (src/pdf_extractor.py:57,264)."""
        return self.load(CHUNKS).groupBy("source").count()

    def export_json(self, out_path: str) -> None:
        """S6: save_content_for_inspection (src/vector_store.py:184-205)."""
        self.load(EMBEDDINGS).drop("embedding").write.mode("overwrite").json(
            out_path
        )

    def reset(self) -> None:
        """S7 destructive reset (src/vector_store.py:96-107): drop both
        tables (overwrite-on-next-build gives the recreate half)."""
        import shutil

        for t in (CHUNKS, EMBEDDINGS):
            shutil.rmtree(self.path(t), ignore_errors=True)

"""End-to-end demo of the reference's RAG pipeline, Spark-first.

Reproduces `python src/main.py` (reference src/main.py:105-127) on this
engine: build the knowledge base from a PDF directory (extract -> segment
-> clean -> chunk -> embed -> warehouse tables), then answer questions via
exact distributed cosine top-k retrieval. The LLM call is stubbed unless
an API key + client are wired in (never needed for the demo).

Usage:
    python tools/demo_rag.py [pdf_dir] [question ...]

Without args it builds a tiny self-generated corpus (fake UTF-8 "PDFs",
the documented stub decode path) and runs a canned question.
"""

from __future__ import annotations

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from data_engineering_1_spark.operators import qa  # noqa: E402
from data_engineering_1_spark.session import get_spark  # noqa: E402
from data_engineering_1_spark.warehouse import ChunkWarehouse  # noqa: E402


def make_demo_corpus(d: str) -> None:
    docs = {
        "spark_engine.pdf": (
            "Apache Spark executes declarative DataFrame plans through the "
            "Catalyst optimizer. Predicate pushdown, column pruning and "
            "adaptive query execution come for free.\n\n"
            "Shuffles dominate distributed cost. Broadcast small tables, "
            "pre-aggregate before wide transforms, and bound state with "
            "watermarks in streaming jobs."
        ),
        "vector_search.pdf": (
            "Cosine top-k retrieval ranks chunks by normalized dot product. "
            "Exact search scans every vector; IVF probes one cluster; LSH "
            "buckets candidates by random projections.\f"
            "Chunking with overlap preserves context across boundaries. A "
            "500 character window with 50 character overlap is the default."
        ),
    }
    for name, text in docs.items():
        with open(os.path.join(d, name), "w", encoding="utf-8") as f:
            f.write(text)


def main() -> None:
    pdf_dir = sys.argv[1] if len(sys.argv) > 1 else None
    questions = sys.argv[2:] or ["How does chunk overlap work in search?"]

    spark = get_spark("demo_rag")
    tmp = tempfile.mkdtemp(prefix="rag_demo_")
    if pdf_dir is None:
        pdf_dir = os.path.join(tmp, "pdfs")
        os.makedirs(pdf_dir)
        make_demo_corpus(pdf_dir)

    wh = ChunkWarehouse(spark, os.path.join(tmp, "warehouse"))
    stats = wh.build(pdf_dir)
    print(f"knowledge base: {stats}")
    wh.chunk_counts_per_source().orderBy("source").show(truncate=False)

    chunks = wh.load("embeddings").withColumn(
        "doc_id", F.monotonically_increasing_id()
    )
    for q in questions:
        resp = qa.answer_with_sources(spark, q, chunks, client=None, top_k=3)
        print(f"\nQ: {resp['query']}\nA: {resp['answer']}")
        for i, s in enumerate(resp["sources"], 1):
            m = s["metadata"]
            print(
                f"  [{i}] {m['source']} p{m['page_number']} "
                f"para{m['paragraph_number']} sim={s['similarity']:.4f}: "
                f"{s['text'][:70]}..."
            )


if __name__ == "__main__":
    main()

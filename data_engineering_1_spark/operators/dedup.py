"""Deduplication operators (SURVEY.md §2.4 E6-E7, [north-star]):
exact dedup, MinHash-LSH near-dup, n-gram Jaccard, SimHash.

Design notes for 100 TB:
  - exact dedup = one shuffle on the dedup key (hash partial aggregation);
    deterministic survivor via min(id), never dropDuplicates' arbitrary row;
  - MinHash LSH: shingle -> per-band minhash signature -> band-bucket
    self-join. The join key (band, minhash) is tiny and uniformly
    distributed, so candidate generation is a narrow equi-join instead of
    the O(n^2) pair scan. Hashes are md5 (bit-identical across engines ->
    the whole pipeline is oracle-checkable, unusual for LSH);
  - Jaccard verification joins candidate pairs through an inverted index
    (doc, token) — shared-token counting is an equi-join on token, the
    same shape an inverted-index search engine uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textanalysis import tokens


def exact_dedup(
    df: DataFrame,
    key_cols: tuple[str, ...],
    order_col: str,
) -> DataFrame:
    """E6: keep exactly one row per key — the min(order_col) one
    (deterministic, unlike dropDuplicates)."""
    w = Window.partitionBy(*key_cols).orderBy(F.asc(order_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def shingles_from_tokens(tokens_col: F.Column, k: int = 3) -> F.Column:
    """k-word shingles from an already-materialized token array column.

    Take a bound column, not the tokenizer expression: a lambda over the
    raw ``split(...)`` expression re-evaluates the split for every
    element_at (3k evaluations per shingle) — measured ~6x slower on the
    fixture corpus.
    """
    n = F.size(tokens_col)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(0)))
    return F.when(
        n >= k,
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(tokens_col, i + j) for j in range(k)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingles(text_col: str = "text", k: int = 3) -> F.Column:
    """k-word shingles as an array column (consecutive k-grams over
    whitespace tokens)."""
    return shingles_from_tokens(tokens(text_col), k)


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bands: int = 4,
    rows_per_band: int = 2,
    shingle_k: int = 3,
) -> DataFrame:
    """Banded minhash signatures: per (doc, band), the concatenation of
    ``rows_per_band`` independent minhashes (min over shingles of
    md5(band | row | shingle)).

    Banding matters: with r hashes per band the false-positive bucket
    rate is J^r instead of J, which is what keeps candidate generation
    sub-quadratic on low-similarity corpora (single-hash bands bucket
    ~J of all n^2 pairs — measured 100x more candidates on the fixture
    corpus). The min is order-independent, so the whole stage is
    deterministic under any partitioning, and md5 makes it engine-portable
    (oracle-checkable).
    """
    parts = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    sh = (
        # spread docs before the shingle explode (see jaccard_pairs: a
        # small-file corpus scans as ~1 partition and would shingle
        # serially; at scale this hash exchange is partitioning-neutral)
        df.repartition(parts, id_col)
        .select(F.col(id_col), tokens(text_col).alias("__toks"))
        .select(
            id_col,
            F.explode(
                shingles_from_tokens(F.col("__toks"), shingle_k)
            ).alias("shingle"),
        )
        .distinct()
    )
    # All n_bands*rows_per_band hashes are computed as COLUMNS of the one
    # shingle row, and the mins as one groupBy(doc) with b*r aggregates —
    # the band fan-out happens in-row AFTER aggregation (4 rows per doc,
    # not 8 rows per shingle). Same min values as any exploded
    # formulation, so the DuckDB oracle keeps its straightforward
    # unnest-based shape. 8x fewer exploded rows and one less wide
    # shuffle; at local sf0.1 stage-latency floors hide most of it
    # (~10% on the downstream jaccard pipeline), the row-volume win is
    # what matters at scale.
    hashed = sh.select(
        id_col,
        *[
            F.md5(F.concat_ws("|", F.lit(str(b)), F.lit(str(j)), "shingle")).alias(
                f"__h_{b}_{j}"
            )
            for b in range(n_bands)
            for j in range(rows_per_band)
        ],
    )
    mins = hashed.groupBy(id_col).agg(
        *[
            F.min(f"__h_{b}_{j}").alias(f"__m_{b}_{j}")
            for b in range(n_bands)
            for j in range(rows_per_band)
        ]
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "|", *[F.col(f"__m_{b}_{j}") for j in range(rows_per_band)]
                ).alias("minhash"),
            )
            for b in range(n_bands)
        ]
    )
    return mins.select(
        id_col, F.explode(band_structs).alias("__b")
    ).select(id_col, "__b.band", "__b.minhash")


def lsh_candidate_pairs(signatures: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Docs sharing any (band, minhash) bucket -> distinct candidate pairs
    (a < b). Equi-join on the bucket key — no O(n^2) scan."""
    a = signatures.select(
        F.col(id_col).alias("doc_a"), "band", "minhash"
    )
    b = signatures.select(
        F.col(id_col).alias("doc_b"), "band", "minhash"
    )
    return (
        a.join(b, ["band", "minhash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


SIMHASH_BITS = 32  # md5's first 8 hex chars -> engine-portable 32-bit hash


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """32-bit SimHash per document: per token occurrence, each bit of the
    token's hash votes +1/-1; the fingerprint sets the bits with positive
    vote sums.

    Shape: tokens collapse to (doc, word, count) first — the x32 bit
    fan-out then runs once per DISTINCT word, weighted by count, not once
    per occurrence (~7x less exploded volume on the fixture corpus). Both
    aggregations get map-side partial combine, so shuffled volume is
    O(docs x 32). Token hash is the first 8 md5 hex chars as an int
    (portable: Spark conv() and DuckDB '0x' cast produce identical
    values)."""
    parts = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    toks = (
        # spread docs before tokenizing (see jaccard_pairs: a small-file
        # corpus scans as ~1 partition and would tokenize serially)
        df.repartition(parts, id_col)
        .select(F.col(id_col), F.explode(tokens(text_col)).alias("word"))
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    hashed = toks.withColumn(
        "h", F.conv(F.substring(F.md5("word"), 1, 8), 16, 10).cast("bigint")
    )
    votes = (
        hashed.select(
            id_col,
            "h",
            "cnt",
            F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("bit"),
        )
        .withColumn(
            # python shiftright() takes only literal shift amounts; the SQL
            # form accepts a column
            "vote",
            F.when(F.expr("(h >> bit) & 1") == 1, F.col("cnt")).otherwise(-F.col("cnt")),
        )
        .groupBy(id_col, "bit")
        .agg(F.sum("vote").alias("s"))
    )
    return votes.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)")).otherwise(0)
        ).alias("simhash")
    )


def simhash_neardup_pairs(
    sh: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 32-bit fingerprint into ``n_bands``
    byte-bands; pairs sharing any band are candidates (pigeonhole: any pair
    within hamming distance < n_bands shares at least one exact band), then
    verify hamming(bit_count(xor)) <= max_hamming.

    The band equi-join replaces the O(n^2) pairwise scan — same LSH shape
    as the minhash path, so it scales with bucket occupancy, not corpus
    size squared.

    The pigeonhole recall guarantee requires max_hamming < n_bands (a
    pair differing in >= n_bands bits can differ in every band); enforce
    it so callers cannot silently under-recall."""
    if max_hamming >= n_bands:
        raise ValueError(
            f"max_hamming={max_hamming} needs n_bands >= {max_hamming + 1} "
            f"(got {n_bands}): pigeonhole recall only holds for "
            "max_hamming < n_bands"
        )
    width = SIMHASH_BITS // n_bands
    mask = (1 << width) - 1
    banded = sh.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.expr(f"(simhash >> {i * width}) & {mask}").alias("val"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("b"),
    ).select(id_col, "simhash", "b.band", "b.val")
    a = banded.select(
        F.col(id_col).alias("doc_a"), F.col("simhash").alias("sh_a"), "band", "val"
    )
    b = banded.select(
        F.col(id_col).alias("doc_b"), F.col("simhash").alias("sh_b"), "band", "val"
    )
    return (
        a.join(b, ["band", "val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_token_df_frac: float | None = None,
) -> DataFrame:
    """Token-set Jaccard for given (doc_a, doc_b) pairs via an inverted
    index: shared-token counts come from an equi-join on token.

    ``max_token_df_frac`` is the hot-token skew valve: tokens present in
    more than that fraction of documents (stop-word class — at corpus
    scale each one fans the inverted index into a giant join group) are
    pulled OUT of the token equi-join and routed through per-document
    sorted hot-token arrays intersected per candidate pair instead. The
    split is EXACT, not approximate: every token still contributes to
    n_shared exactly once — cold tokens through the equi-join, hot
    tokens through array_intersect on the two docs' (tiny: the hot
    vocabulary is at most index_rows / (frac * n_docs) tokens) arrays —
    and doc sizes are unaffected, so the Jaccard values are identical to
    the uncapped path for EVERY pair at ANY threshold (pinned by
    tests/test_dedup_text.py). The remaining joins key on doc ids, whose
    fan-out the LSH candidate generation already bounds.
    """
    # spread documents across cores BEFORE tokenizing: the fixture (and
    # any small-file corpus) arrives as a near-single-partition scan, so
    # without this every tokenize branch of the plan runs serially. One
    # small shuffle of raw text, then the regex/explode work and every
    # downstream aggregate is parallel. At 100 TB the scan is already
    # thousands of partitions and the repartition is a no-op-sized hash
    # exchange on the doc id (the join/group key of everything below).
    parts = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    # doc_tokens feeds up to seven consumers (sizes, the df counts, the
    # hot cut, cold, hot_sets, both sides of the inverted-index join)
    # and every consumer re-runs the regex tokenize + explode. A
    # localCheckpoint here was TRIED in r13 and reverted: storing the
    # exploded token rows as deserialized blocks measured consistently
    # SLOWER at sf0.1 than recomputing the tokenize (dedup_survivor
    # +0.8 s, prefix-filter family +0.5-1.4 s) — the explode pipelines
    # fuse into each consumer's first shuffle stage, while the block
    # write+read does not. At 100 TB the equivalent is a persisted
    # token/posting parquet table (columnar), not an in-session
    # materialization.
    doc_tokens = df.repartition(parts, id_col).select(
        F.col(id_col), F.explode(F.array_distinct(tokens(text_col))).alias("tok")
    )
    sizes = doc_tokens.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_tok"))
    if max_token_df_frac is None:
        ta = doc_tokens.select(F.col(id_col).alias("doc_a"), "tok")
        tb = doc_tokens.select(F.col(id_col).alias("doc_b"), "tok")
        shared = (
            pairs.join(ta, "doc_a")
            .join(tb, ["doc_b", "tok"])
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_shared"))
        )
    else:
        # hot = tokens in > frac of all docs; the doc count arrives as a
        # broadcast 1-row scalar so the cut stays fully lazy
        ndocs = doc_tokens.select(id_col).distinct().agg(
            F.count(F.lit(1)).alias("__nd")
        )
        hot = (
            doc_tokens.groupBy("tok")
            .agg(F.count(F.lit(1)).alias("__df"))
            .crossJoin(F.broadcast(ndocs))
            .filter(
                F.col("__df") > F.lit(max_token_df_frac) * F.col("__nd")
            )
            .select("tok")
        )
        cold = doc_tokens.join(F.broadcast(hot), "tok", "left_anti")
        hot_sets = (
            doc_tokens.join(F.broadcast(hot), "tok", "left_semi")
            .groupBy(id_col)
            .agg(F.array_sort(F.collect_list("tok")).alias("__hot"))
        )
        ca = cold.select(F.col(id_col).alias("doc_a"), "tok")
        cb = cold.select(F.col(id_col).alias("doc_b"), "tok")
        cold_shared = (
            pairs.join(ca, "doc_a")
            .join(cb, ["doc_b", "tok"])
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("__n_cold"))
        )
        empty = F.array().cast("array<string>")
        shared = (
            pairs.join(cold_shared, ["doc_a", "doc_b"], "left")
            .join(
                hot_sets.select(
                    F.col(id_col).alias("doc_a"), F.col("__hot").alias("__hot_a")
                ),
                "doc_a",
                "left",
            )
            .join(
                hot_sets.select(
                    F.col(id_col).alias("doc_b"), F.col("__hot").alias("__hot_b")
                ),
                "doc_b",
                "left",
            )
            .select(
                "doc_a",
                "doc_b",
                (
                    F.coalesce("__n_cold", F.lit(0))
                    + F.size(
                        F.array_intersect(
                            F.coalesce("__hot_a", empty),
                            F.coalesce("__hot_b", empty),
                        )
                    )
                ).alias("n_shared"),
            )
            .filter(F.col("n_shared") > 0)
        )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_tok").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_tok").alias("n_b"))
    return (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
    )

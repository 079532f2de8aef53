"""Data-assurance declared queries (round 6, fourteenth batch —
[north-star] scope): privacy mechanics, schema-level profiling, exact
string-similarity joins, robust-outlier consensus, embedding
feature-clipping, and cross-validated model evaluation.

  * ``dp_noisy_event_counts`` (X185) — Laplace-mechanism differentially
    private counts: noise drawn by inverse-CDF from md5-bridge
    uniforms, so both engines add the IDENTICAL noise (the release
    mechanics of a DP count query, with the randomness made
    deterministic the same way the sampling family does).
  * ``fd_discovery_orders`` (X186) — functional-dependency discovery
    over candidate column pairs: does det -> dep hold, and with how
    many violating groups? The schema-profiling step (X48 profiles
    columns; this profiles RELATIONSHIPS).
  * ``edit1_name_join`` (X187) — exact edit-distance<=1 self-join via
    FastSS deletion neighborhoods: completeness is a THEOREM (two
    strings at distance 1 share a variant), unlike X47's
    attribute-blocked fuzzy join which can miss cross-block pairs.
  * ``outlier_ensemble_events`` (X188) — three robust outlier votes
    (IQR fence, z-score, MAD modified-z) with a >=2-vote consensus —
    the ensemble shape X118 uses for near-dups, applied to numeric
    quality gating.
  * ``embedding_clip_bounds`` (X189) — per-dimension p1/p99 clip
    bounds + clipped-count — the feature-clipping prep every
    embedding-quantization step (X10) runs first.
  * ``cv_fold_auc`` (X190) — X167's exact tie-aware AUC computed per
    deterministic cross-validation fold, plus fold-count stability —
    the variance view a single-split AUC hides.

Determinism: noise uniforms, folds, deletion variants, and clip
counts are exact integers/md5-bridge draws; ln terms are round-9
staged on identical exact operands (the X99/X145 ln discipline);
outlier flags compare identically-rounded statistics on both engines;
AUC is the X167 exact rank statistic per fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from .registry import declared_query

# ---- X185: DP noisy counts ----------------------------------------------

_DP_B = 50  # Laplace scale; epsilon = 1/b for a count query


@declared_query(
    "dp_noisy_event_counts",
    oracle=f"""
    WITH counts AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ), u AS (
        SELECT event_type, n,
               ((('0x' || substr(md5('dplap|' || event_type), 1, 8))
                 ::BIGINT % 1000000) + 0.5) / 1000000.0 - 0.5 AS uc
        FROM counts
    ), staged AS (
        SELECT event_type, n, uc,
               CAST(ROUND(ln(1 - 2 * abs(uc)), 9) AS DECIMAL(18,9))
                   AS l9
        FROM u
    )
    SELECT event_type, n AS true_count,
           CAST(ROUND(CASE WHEN uc >= 0 THEN -{_DP_B} ELSE {_DP_B} END
                      * CAST(l9 AS DOUBLE), 6) AS DOUBLE) AS noise,
           CAST(ROUND(n + CASE WHEN uc >= 0 THEN -{_DP_B}
                          ELSE {_DP_B} END * CAST(l9 AS DOUBLE), 6)
                AS DOUBLE) AS noisy_count
    FROM staged ORDER BY event_type
    """,
)
def dp_noisy_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X185: Laplace-mechanism DP release of per-type event counts —
    noise = -b*sign(u)*ln(1-2|u|) (the inverse Laplace CDF) with
    b = 50, i.e. epsilon = 1/50 for a sensitivity-1 count. The
    mechanism mechanics are the deliverable: a privacy-bounded
    analytics surface draws noise per released cell, and making the
    uniform a pure function of the cell key (the md5 bridge, as the
    sampling family does) makes the release REPRODUCIBLE — the same
    query never releases two different answers, which both spends the
    privacy budget once and makes the pipeline testable. true_count
    rides along here because the fixture is not private data; a real
    release would emit noisy_count only.

    Determinism: the uniform is an exact rational of the key hash; the
    single ln term is computed on that identical exact operand and
    round-9 DECIMAL-staged (the X99 discipline) before the one
    multiply, rounded 6. Scale: one combinable count; noise is a
    scalar map over |types| rows."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    uc = (
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("dplap|"), F.col("event_type"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 1000000
        )
        + 0.5
    ) / 1000000.0 - 0.5
    staged = counts.select(
        "event_type",
        "n",
        uc.alias("uc"),
    ).select(
        "event_type",
        "n",
        "uc",
        F.round(F.log(1 - 2 * F.abs(F.col("uc"))), 9)
        .cast("decimal(18,9)")
        .alias("l9"),
    )
    noise = (
        F.when(F.col("uc") >= 0, F.lit(-_DP_B)).otherwise(F.lit(_DP_B))
        * F.col("l9").cast("double")
    )
    return staged.select(
        "event_type",
        F.col("n").alias("true_count"),
        F.round(noise, 6).alias("noise"),
        F.round(F.col("n") + noise, 6).alias("noisy_count"),
    ).orderBy("event_type")


# ---- X186: functional-dependency discovery ------------------------------

_FD_CANDIDATES = [
    ("o_orderkey", "o_custkey"),
    ("o_orderkey", "o_orderstatus"),
    ("o_custkey", "o_orderpriority"),
    ("o_orderpriority", "o_orderstatus"),
    ("o_orderdate", "o_orderpriority"),
]


def _o_fd(det: str, dep: str) -> str:
    return f"""
        SELECT '{det}' AS determinant, '{dep}' AS dependent,
               CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(SUM(CAST(nd > 1 AS BIGINT)) AS BIGINT)
                   AS n_violating_groups,
               (SUM(CAST(nd > 1 AS BIGINT)) = 0) AS holds,
               CAST(ROUND(CAST(SUM(CAST(nd > 1 AS BIGINT)) AS DOUBLE)
                          / COUNT(*), 6) AS DOUBLE) AS violation_share
        FROM (SELECT {det}, COUNT(DISTINCT {dep}) AS nd
              FROM orders GROUP BY {det}) g
    """


@declared_query(
    "fd_discovery_orders",
    oracle=" UNION ALL ".join(_o_fd(a, b) for a, b in _FD_CANDIDATES)
    + " ORDER BY determinant, dependent",
)
def fd_discovery_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X186: functional-dependency discovery — for each candidate
    det -> dep pair on orders: group count, violating-group count
    (groups where the determinant maps to >1 dependent value), a holds
    verdict, and the violation share. The relationship-level profiling
    step (X48 profiles single columns): discovered FDs drive
    normalization, key inference, and data-quality contracts; at
    100 TB, disproven FDs are how silent upstream schema drift is
    caught.

    Exactness: counts are exact; the verdict is an integer comparison;
    one division rounded 6. Scale: one combinable two-level aggregate
    per candidate over one scan each — candidate pairs are a fixed
    audit list, not a cross of all columns."""
    o = load_table(spark, sf_dir, "orders")
    out = None
    for det, dep in _FD_CANDIDATES:
        g = o.groupBy(det).agg(F.countDistinct(dep).alias("nd"))
        st = g.agg(
            F.lit(det).alias("determinant"),
            F.lit(dep).alias("dependent"),
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum((F.col("nd") > 1).cast("bigint"))
            .cast("bigint")
            .alias("n_violating_groups"),
            (F.sum((F.col("nd") > 1).cast("bigint")) == 0).alias("holds"),
            F.round(
                F.sum((F.col("nd") > 1).cast("bigint")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("violation_share"),
        )
        out = st if out is None else out.unionByName(st)
    return out.orderBy("determinant", "dependent")


# ---- X187: FastSS edit-distance<=1 join ---------------------------------


@declared_query(
    "edit1_name_join",
    oracle="""
    WITH names AS (
        SELECT p_partkey, p_name FROM part
    ), variants AS (
        SELECT p_partkey, p_name, p_name AS var FROM names
        UNION ALL
        SELECT p_partkey, p_name,
               substr(p_name, 1, CAST(i AS INTEGER) - 1)
               || substr(p_name, CAST(i AS INTEGER) + 1) AS var
        FROM names, LATERAL (
            SELECT unnest(generate_series(1, length(p_name))) AS i) s
    ), cand AS (
        SELECT DISTINCT a.p_partkey AS part_a, b.p_partkey AS part_b,
               a.p_name AS name_a, b.p_name AS name_b
        FROM variants a JOIN variants b
          ON a.var = b.var AND a.p_partkey < b.p_partkey
         AND a.p_name <> b.p_name
    )
    SELECT part_a, part_b, name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS INTEGER) AS edit_distance
    FROM cand
    WHERE levenshtein(name_a, name_b) <= 1
    ORDER BY part_a, part_b
    """,
)
def edit1_name_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X187: exact edit-distance<=1 self-join over part names via the
    FastSS deletion-neighborhood trick: index every name under itself
    and all single-character deletions, equi-join on the variant key,
    verify with levenshtein. Completeness is a THEOREM — two strings
    at Levenshtein distance 1 always share a deletion variant
    (substitution: delete the differing position in both;
    insert/delete: the deletion of the inserted char equals the other
    string) — unlike X47's attribute blocking, which silently misses
    pairs whose blocking attributes differ. The typo/near-key
    resolution primitive for catalog and entity data.

    Exactness: variants are pure string ops; both engines share the
    classic levenshtein definition. Pairs with EQUAL names are
    excluded (distance 0 = exact dup, E6's job). Scale: |name|+1
    variants per row, candidates from an equi-join on the variant key
    — the quadratic never materializes; verify cost is
    O(candidates)."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    # Plan hygiene (measured at sf0.1): part NAMES repeat heavily
    # (~10^2 distinct names over 2*10^4 parts), so running the variant
    # join at the PART grain materializes every same-name partkey pair
    # (~44M rows) before the name filter — 7.9 s. Dedup to DISTINCT
    # names first (the variant join then runs on ~10^3 rows), verify
    # at the name grain, and expand the surviving NAME pairs back to
    # partkey pairs at the end. Same output, and the expensive stage
    # is now |distinct names|-bounded — the grain discipline X124
    # learned with shingles.
    names = p.select("p_name").distinct()
    base = names.select("p_name", F.col("p_name").alias("var"))
    dels = names.select(
        "p_name",
        F.explode(
            F.expr(
                "transform(sequence(1, length(p_name)), i -> "
                "concat(substring(p_name, 1, i - 1), "
                "substring(p_name, i + 1, length(p_name))))"
            )
        ).alias("var"),
    )
    # name-grain variant table (~|distinct names| x name length rows):
    # both self-join sides re-ran the distinct + deletion explode when
    # left lazy (12 scans in the r13-before plan) — materialize once
    variants = base.unionByName(dels).localCheckpoint()
    a = variants.select(F.col("p_name").alias("name_a"), "var")
    b = variants.select(F.col("p_name").alias("name_b"), "var")
    npairs = (
        a.join(b, "var")
        .where(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
        .where(F.levenshtein("name_a", "name_b", 1) >= 0)
    )
    pa = p.select(
        F.col("p_partkey").alias("ka"), F.col("p_name").alias("name_a")
    )
    pb = p.select(
        F.col("p_partkey").alias("kb"), F.col("p_name").alias("name_b")
    )
    expanded = F.broadcast(npairs).join(pa, "name_a").join(pb, "name_b")
    lo_first = F.col("ka") < F.col("kb")
    return expanded.select(
        F.when(lo_first, F.col("ka")).otherwise(F.col("kb")).alias(
            "part_a"
        ),
        F.when(lo_first, F.col("kb")).otherwise(F.col("ka")).alias(
            "part_b"
        ),
        F.when(lo_first, F.col("name_a"))
        .otherwise(F.col("name_b"))
        .alias("name_a"),
        F.when(lo_first, F.col("name_b"))
        .otherwise(F.col("name_a"))
        .alias("name_b"),
        F.levenshtein("name_a", "name_b", 1).cast("int").alias(
            "edit_distance"
        ),
    ).orderBy("part_a", "part_b")


# ---- X188: robust outlier ensemble --------------------------------------


@declared_query(
    "outlier_ensemble_events",
    oracle="""
    WITH cents AS (
        SELECT event_id,
               CAST(ROUND(value * 100) AS BIGINT) AS x
        FROM events
    ), stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS DECIMAL(38,0)) AS s1,
               CAST(SUM(CAST(x AS DECIMAL(19,0)) * x) AS DECIMAL(38,0))
                   AS s2,
               CAST(ROUND(quantile_cont(x, 0.25), 6) AS DOUBLE) AS q1,
               CAST(ROUND(quantile_cont(x, 0.75), 6) AS DOUBLE) AS q3,
               CAST(ROUND(quantile_cont(x, 0.5), 6) AS DOUBLE) AS med
        FROM cents
    ), mad AS (
        SELECT CAST(ROUND(quantile_cont(abs(x - (SELECT med FROM stats)),
                                        0.5), 6) AS DOUBLE) AS mad
        FROM cents
    ), flags AS (
        SELECT c.event_id, c.x,
               (c.x > s.q3 + 1.5 * (s.q3 - s.q1)
                OR c.x < s.q1 - 1.5 * (s.q3 - s.q1)) AS iqr_flag,
               (CAST(s.n AS DECIMAL(38,0)) * c.x - s.s1)
               * (CAST(s.n AS DECIMAL(38,0)) * c.x - s.s1)
               > 9 * (s.n * s.s2 - s.s1 * s.s1) AS z_flag,
               ROUND(0.6745 * abs(c.x - s.med)
                     / (SELECT mad FROM mad), 6) > 3.5 AS mad_flag
        FROM cents c CROSS JOIN stats s
    )
    SELECT event_id, x AS cents, iqr_flag, z_flag, mad_flag,
           CAST(CAST(iqr_flag AS BIGINT) + CAST(z_flag AS BIGINT)
                + CAST(mad_flag AS BIGINT) AS BIGINT) AS votes
    FROM flags
    WHERE CAST(iqr_flag AS BIGINT) + CAST(z_flag AS BIGINT)
          + CAST(mad_flag AS BIGINT) >= 2
    ORDER BY event_id
    """,
)
def outlier_ensemble_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X188: robust-outlier consensus on event values — three
    independent detectors (Tukey IQR fence, 3-sigma z-score, 3.5
    modified-z on MAD) vote, and only >=2-vote rows are flagged. The
    ensemble discipline X118 applies to near-dups, applied to numeric
    quality gating: single detectors disagree exactly on the
    borderline cases, and the vote is what a production gate ships.

    Determinism: the z vote is a pure integer cross-multiplication of
    DECIMAL(38,0) power sums ((n*x - S1)^2 > 9*(n*S2 - S1^2)); the IQR
    and MAD votes compare against round-6 statistics computed from
    identical exact operands on both engines (the shared
    interpolated-percentile definition), so the flags flip together.
    Scale: two percentile aggregates + one power-sum aggregate, then a
    broadcast 1-row stats cross into the scan (whitelisted)."""
    ev = load_table(spark, sf_dir, "events")
    cents = ev.select(
        "event_id",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("x"),
    )
    stats = cents.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("s1"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("x"))
        .cast("decimal(38,0)")
        .alias("s2"),
        F.round(F.expr("percentile(x, 0.25)"), 6).alias("q1"),
        F.round(F.expr("percentile(x, 0.75)"), 6).alias("q3"),
        F.round(F.expr("percentile(x, 0.5)"), 6).alias("med"),
    )
    with_stats = cents.crossJoin(F.broadcast(stats))
    mad = with_stats.agg(
        F.round(
            F.expr("percentile(abs(x - med), 0.5)"), 6
        ).alias("mad")
    )
    f = with_stats.crossJoin(F.broadcast(mad))
    iqr = F.col("q3") - F.col("q1")
    dev = F.col("n").cast("decimal(38,0)") * F.col("x") - F.col("s1")
    iqr_flag = (F.col("x") > F.col("q3") + 1.5 * iqr) | (
        F.col("x") < F.col("q1") - 1.5 * iqr
    )
    z_flag = dev * dev > 9 * (
        F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    )
    mad_flag = (
        F.round(
            0.6745 * F.abs(F.col("x") - F.col("med")) / F.col("mad"), 6
        )
        > 3.5
    )
    flags = f.select(
        "event_id",
        F.col("x").alias("cents"),
        iqr_flag.alias("iqr_flag"),
        z_flag.alias("z_flag"),
        mad_flag.alias("mad_flag"),
    ).select(
        "*",
        (
            F.col("iqr_flag").cast("bigint")
            + F.col("z_flag").cast("bigint")
            + F.col("mad_flag").cast("bigint")
        )
        .cast("bigint")
        .alias("votes"),
    )
    return flags.where(F.col("votes") >= 2).orderBy("event_id")


# ---- X189: embedding clip bounds ----------------------------------------


@declared_query(
    "embedding_clip_bounds",
    oracle="""
    WITH qd AS (
        SELECT d.d, CAST(ROUND(CAST(embedding[d.d] AS DOUBLE) * 1000000)
                         AS BIGINT) AS q
        FROM embeddings
        CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS d) d
    ), bounds AS (
        SELECT d,
               CAST(ROUND(quantile_cont(q, 0.01), 6) AS DOUBLE) AS lo,
               CAST(ROUND(quantile_cont(q, 0.99), 6) AS DOUBLE) AS hi
        FROM qd GROUP BY d
    )
    SELECT b.d AS dim,
           b.lo AS clip_lo_q, b.hi AS clip_hi_q,
           CAST(SUM(CAST(qd.q < b.lo AS BIGINT)) AS BIGINT) AS n_below,
           CAST(SUM(CAST(qd.q > b.hi AS BIGINT)) AS BIGINT) AS n_above
    FROM qd JOIN bounds b ON qd.d = b.d
    GROUP BY b.d, b.lo, b.hi
    ORDER BY dim
    """,
)
def embedding_clip_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X189: per-dimension p1/p99 clip bounds over the (quantized)
    embedding components, plus how many values each bound would clip —
    the feature-clipping prep every embedding quantization (X10) and
    normalization step runs first: a single wild dimension otherwise
    eats the whole int8 range. Components quantize to the X173 integer
    grid first, so the percentile operands are exact integers on both
    engines and the clip counts are exact comparisons against the
    shared round-6 interpolated bound.

    Scale: one explode to (dim, value) rows, one grouped percentile
    aggregate (ONE pass — dims partition the aggregate), one grouped
    count join — all keyed on the 64-value dim."""
    emb = load_table(spark, sf_dir, "embeddings")
    qd = emb.select(F.posexplode("embedding").alias("p", "v")).select(
        (F.col("p") + 1).alias("d"),
        F.round(F.col("v").cast("double") * 1000000, 0)
        .cast("bigint")
        .alias("q"),
    )
    bounds = qd.groupBy("d").agg(
        F.round(F.expr("percentile(q, 0.01)"), 6).alias("lo"),
        F.round(F.expr("percentile(q, 0.99)"), 6).alias("hi"),
    )
    return (
        qd.join(bounds, "d")
        .groupBy("d", "lo", "hi")
        .agg(
            F.sum((F.col("q") < F.col("lo")).cast("bigint"))
            .cast("bigint")
            .alias("n_below"),
            F.sum((F.col("q") > F.col("hi")).cast("bigint"))
            .cast("bigint")
            .alias("n_above"),
        )
        .select(
            F.col("d").alias("dim"),
            F.col("lo").alias("clip_lo_q"),
            F.col("hi").alias("clip_hi_q"),
            "n_below",
            "n_above",
        )
        .orderBy("dim")
    )


# ---- X190: cross-validated AUC ------------------------------------------

_CV_FOLDS = 5


@declared_query(
    "cv_fold_auc",
    oracle=f"""
    WITH scored AS (
        SELECT CAST((('0x' || substr(md5('fold|' ||
                   CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                   % {_CV_FOLDS}) AS BIGINT) AS fold,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS s,
               CAST(o_orderstatus = 'F' AS BIGINT) AS y
        FROM orders
    ), g AS (
        SELECT fold, s, CAST(COUNT(*) AS BIGINT) AS tot,
               CAST(SUM(y) AS BIGINT) AS pos
        FROM scored GROUP BY fold, s
    ), ranked AS (
        SELECT fold, s, tot, pos,
               CAST(COALESCE(SUM(tot) OVER (PARTITION BY fold ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS cb
        FROM g
    )
    SELECT fold,
           CAST(SUM(pos) AS BIGINT) AS n_pos,
           CAST(SUM(tot - pos) AS BIGINT) AS n_neg,
           CAST(ROUND(CAST(CAST(SUM(CAST(pos AS DECIMAL(19,0))
                                     * (2 * cb + tot + 1))
                                AS DECIMAL(38,0))
                           - CAST(SUM(pos) AS DECIMAL(38,0))
                             * (SUM(pos) + 1) AS DOUBLE)
                      / (2.0 * SUM(pos) * SUM(tot - pos)), 6)
                AS DOUBLE) AS auc
    FROM ranked GROUP BY fold ORDER BY fold
    """,
)
def cv_fold_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X190: X167's exact tie-aware ROC AUC computed independently per
    deterministic 5-fold split (fold = md5 bridge of the order key) —
    the cross-validation view: a single-split AUC hides its own
    variance, and the per-fold spread is the stability number a model
    gate actually thresholds on. Folds from the md5 bridge are stable
    under corpus growth, the same anti-leakage property as S4's
    splits.

    Exactness: identical rank-statistic lifting as X167, with every
    window and aggregate PARTITIONED BY FOLD — an exact integer 2R per
    fold, one division each, rounded 6. Scale: the per-fold cumulative
    window runs over each fold's distinct-cents relation
    (domain-bounded, the X167/KS argument), and folds add a 5-way
    partitioning on top."""
    o = load_table(spark, sf_dir, "orders")
    fold = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("fold|"), F.col("o_orderkey").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % _CV_FOLDS
    )
    scored = o.select(
        fold.alias("fold"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("s"),
        (F.col("o_orderstatus") == "F").cast("bigint").alias("y"),
    )
    g = scored.groupBy("fold", "s").agg(
        F.count(F.lit(1)).cast("bigint").alias("tot"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    w = (
        Window.partitionBy("fold")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = g.select(
        "fold",
        "s",
        "tot",
        "pos",
        F.coalesce(F.sum("tot").over(w), F.lit(0))
        .cast("bigint")
        .alias("cb"),
    )
    agg = ranked.groupBy("fold").agg(
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.sum(F.col("tot") - F.col("pos")).cast("bigint").alias("n_neg"),
        F.sum(
            F.col("pos").cast("decimal(19,0)")
            * (2 * F.col("cb") + F.col("tot") + 1)
        )
        .cast("decimal(38,0)")
        .alias("r2"),
    )
    num = F.col("r2") - F.col("n_pos").cast("decimal(38,0)") * (
        F.col("n_pos") + 1
    )
    return agg.select(
        "fold",
        "n_pos",
        "n_neg",
        F.round(
            num.cast("double")
            / (2 * F.col("n_pos").cast("double") * F.col("n_neg")),
            6,
        ).alias("auc"),
    ).orderBy("fold")

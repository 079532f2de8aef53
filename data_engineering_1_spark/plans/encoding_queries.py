"""Feature-encoding / model-evaluation declared queries (round 6,
twenty-sixth batch — [north-star] scope): the leakage-safe encoders
and exact evaluation metrics an ML-platform layer runs next to the
X155/X167 rank machinery.

  * ``target_encode_loo`` (X257) — leave-one-out target encoding of
    the customer nation for order status: (Σy − y_i)/(n − 1) per
    row, the encoding that never sees its own label.
  * ``pr_auc_order_status`` (X258) — exact tie-aware average
    precision per segment over the bounded cents score domain —
    the precision-recall complement of X167's ROC AUC.
  * ``t_closeness_audit`` (X259) — ordered-EMD t-closeness of each
    quasi-identifier group's priority distribution vs global — the
    third privacy lens after X62 k-anonymity (size) and X218
    l-diversity (distinctness): distributional leakage. EMD reduces
    to ONE division of exact integers.
  * ``brown_double_smoothing_daily`` (X260) — Brown's double
    exponential smoothing (two chained α=1/2 EWMA folds) with a
    7-day-ahead forecast — the trend-aware successor of X121.
  * ``feature_hash_buckets`` (X261) — the hashing-trick vectorizer:
    three part attributes hashed into one 128-bucket space from the
    md5 bridge, with the collision census (the price of the trick,
    measured).
  * ``mcc_rule_classifier`` (X262) — confusion matrix + accuracy /
    F1 / Matthews correlation per segment for a priority-rule
    classifier — MCC's numerator exact, denominator one sqrt of an
    exact integer product.

Determinism: counts/cents/votes exact integers; LOO and EMD and F1
are single divisions of exact operands; AP blocks stage round-9
precisions into DECIMAL(18,9) before the exact sum; the smoothing
folds use α = 1/2 so every weight is an exact power of two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ._discipline import r6_exact
from .registry import declared_query

_FH_BUCKETS = 128
_SMOOTH_FRAME = 50  # trailing fold frame; tail weight < 2^-50


# ---- X257: leave-one-out target encoding ------------------------------------


@declared_query(
    "target_encode_loo",
    oracle="""
    WITH rows_ AS (
        SELECT o.o_orderkey, c.c_nationkey,
               CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), grp AS (
        SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS sum_y
        FROM rows_ GROUP BY 1
    )
    SELECT r.o_orderkey, r.c_nationkey, CAST(r.y AS BIGINT) AS y,
           CAST(ROUND(CAST(g.sum_y - r.y AS DOUBLE)
                      / NULLIF(g.n - 1, 0), 6) AS DOUBLE) AS loo_enc
    FROM rows_ r JOIN grp g ON r.c_nationkey = g.c_nationkey
    ORDER BY r.o_orderkey
    """,
)
def target_encode_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X257: leave-one-out target encoding — each order's nation is
    encoded as the mean label of all OTHER orders from that nation,
    (Σy − y_i)/(n − 1). Plain target encoding leaks the row's own
    label into its feature (the classic overfit vector for
    high-cardinality categoricals); LOO is the standard correction,
    and it is pure relational algebra: one group aggregate joined
    back, one subtraction, one division. Singleton groups (n = 1)
    encode NULL via NULLIF on both engines — there is no "other"
    evidence, and any imputed prior would be a modeling choice this
    operator refuses to hide.

    Exactness: n/Σy exact BIGINT; the encoding is one division
    rounded 6. Scale: one combinable aggregate over the fact join +
    one broadcast join of the |nations|-row stats back — two passes,
    no window, no per-row state."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    rows = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            "o_orderkey",
            "c_nationkey",
            F.when(F.col("o_orderstatus") == "F", 1)
            .otherwise(0)
            .alias("y"),
        )
    )
    grp = rows.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("sum_y"),
    )
    return (
        rows.join(F.broadcast(grp), "c_nationkey")
        .select(
            "o_orderkey",
            "c_nationkey",
            F.col("y").cast("bigint").alias("y"),
            F.round(
                (F.col("sum_y") - F.col("y")).cast("double")
                / F.nullif(F.col("n") - 1, F.lit(0)),
                6,
            ).alias("loo_enc"),
        )
        .orderBy("o_orderkey")
    )


# ---- X258: exact tie-aware average precision ---------------------------------


@declared_query(
    "pr_auc_order_status",
    oracle="""
    WITH scored AS (
        SELECT c.c_mktsegment AS segment,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS score,
               CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), blocks AS (
        SELECT segment, score,
               CAST(SUM(y) AS BIGINT) AS pos,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM scored GROUP BY 1, 2
    ), cume AS (
        SELECT segment, score, pos, cnt,
               SUM(pos) OVER (PARTITION BY segment ORDER BY score DESC
                              ROWS UNBOUNDED PRECEDING) AS cum_pos,
               SUM(cnt) OVER (PARTITION BY segment ORDER BY score DESC
                              ROWS UNBOUNDED PRECEDING) AS cum_all
        FROM blocks
    )
    SELECT segment,
           CAST(SUM(cnt) AS BIGINT) AS n,
           CAST(SUM(pos) AS BIGINT) AS n_pos,
           CAST(ROUND(CAST(SUM(pos * CAST(ROUND(
                    CAST(cum_pos AS DOUBLE) / cum_all, 9)
                    AS DECIMAL(18,9))) AS DOUBLE) / SUM(pos), 6)
                AS DOUBLE) AS avg_precision
    FROM cume GROUP BY segment ORDER BY segment
    """,
)
def pr_auc_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X258: exact tie-aware AVERAGE PRECISION per segment, scoring
    order cents against the fulfilled flag — the precision-recall
    complement of X167's ROC AUC (AP is the metric of record when
    positives are rare and ROC flatters). Ties are handled at BLOCK
    grain with the pessimistic convention: every positive in a tied
    score block is credited the precision measured at the END of its
    block (cum_pos/cum_all inclusive) — deterministic and exactly
    computable, where per-row AP under ties depends on an arbitrary
    permutation. AP = Σ_blocks pos_b · prec_b / total_pos.

    Exactness: block counts and both cumulatives are exact integers
    over the BOUNDED distinct-cents domain (the X167/X136 argument:
    the windows run over the score histogram, never raw orders);
    each block precision is one division staged round-9 into
    DECIMAL(18,9); the final value is one more division rounded 6.
    Scale: one combinable (segment, score) aggregate below
    segment-partitioned windows."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    scored = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("bigint")
            .alias("score"),
            F.when(F.col("o_orderstatus") == "F", 1)
            .otherwise(0)
            .alias("y"),
        )
    )
    blocks = scored.groupBy("segment", "score").agg(
        F.sum("y").cast("bigint").alias("pos"),
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
    )
    w = (
        Window.partitionBy("segment")
        .orderBy(F.desc("score"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cume = blocks.select(
        "segment",
        "pos",
        "cnt",
        F.sum("pos").over(w).alias("cum_pos"),
        F.sum("cnt").over(w).alias("cum_all"),
    )
    term = F.col("pos") * F.round(
        F.col("cum_pos").cast("double") / F.col("cum_all"), 9
    ).cast("decimal(18,9)")
    return (
        cume.groupBy("segment")
        .agg(
            F.sum("cnt").cast("bigint").alias("n"),
            F.sum("pos").cast("bigint").alias("n_pos"),
            F.round(
                F.sum(term).cast("double") / F.sum("pos"), 6
            ).alias("avg_precision"),
        )
        .orderBy("segment")
    )


# ---- X259: t-closeness (ordered EMD) audit -----------------------------------


@declared_query(
    "t_closeness_audit",
    oracle="""
    WITH rows_ AS (
        SELECT c.c_nationkey, c.c_mktsegment,
               CAST(substr(o.o_orderpriority, 1, 1) AS BIGINT) AS pr
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    ), total AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM rows_
    ), gtot AS (
        SELECT pr, CAST(COUNT(*) AS BIGINT) AS gn
        FROM rows_ GROUP BY pr
    ), groups AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS g
        FROM rows_ GROUP BY 1, 2
    ), cellcnt AS (
        SELECT c_nationkey, c_mktsegment, pr,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM rows_ GROUP BY 1, 2, 3
    ), dense AS (
        SELECT gr.c_nationkey, gr.c_mktsegment, gr.g, gt.pr, gt.gn,
               COALESCE(cc.cnt, 0) AS cnt
        FROM groups gr CROSS JOIN gtot gt
        LEFT JOIN cellcnt cc
          ON cc.c_nationkey = gr.c_nationkey
         AND cc.c_mktsegment = gr.c_mktsegment AND cc.pr = gt.pr
    ), cums AS (
        SELECT c_nationkey, c_mktsegment, g, pr,
               SUM(cnt) OVER (PARTITION BY c_nationkey, c_mktsegment
                              ORDER BY pr ROWS UNBOUNDED PRECEDING)
                   AS cumg,
               SUM(gn) OVER (PARTITION BY c_nationkey, c_mktsegment
                             ORDER BY pr ROWS UNBOUNDED PRECEDING)
                   AS cumall
        FROM dense
    ), terms AS (
        SELECT c.c_nationkey, c.c_mktsegment, c.g,
               CAST(abs(CAST(c.cumg AS DECIMAL(38,0)) * t.n
                        - CAST(c.cumall AS DECIMAL(38,0)) * c.g)
                    AS DECIMAL(38,0)) AS d
        FROM cums c CROSS JOIN total t
        WHERE c.pr <= 4
    ), agg AS (
        SELECT c_nationkey, c_mktsegment, MAX(g) AS g,
               CAST(SUM(d) AS DECIMAL(38,0)) AS emd_num
        FROM terms GROUP BY 1, 2
    )
    SELECT a.c_nationkey, a.c_mktsegment,
           CAST(a.g AS BIGINT) AS group_size,
           CAST(ROUND(CAST(a.emd_num AS DOUBLE)
                      / (4.0 * a.g * t.n), 6) AS DOUBLE) AS emd,
           (a.emd_num * 5 <= CAST(a.g AS DECIMAL(38,0)) * t.n * 4)
               AS t_close_02
    FROM agg a CROSS JOIN total t
    ORDER BY a.c_nationkey, a.c_mktsegment
    """,
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X259: t-closeness of each (nation, segment) quasi-identifier
    group's ORDER-PRIORITY distribution against the global one — the
    third privacy lens: X62's k-anonymity bounds group SIZE, X218's
    l-diversity counts distinct sensitive values, t-closeness bounds
    how much the group's sensitive DISTRIBUTION deviates (a group can
    be large and 5-diverse yet still telegraph "these customers file
    urgent orders"). For an ordered attribute with unit adjacent
    ground distance, EMD = (1/(m−1))·Σ_{k<m} |CumP_k − CumQ_k|,
    which lifts to exact integers: every term is
    |cumg·n − cumG·g| (no share is ever a float), the sum is exact
    DECIMAL(38,0), EMD is ONE division by (m−1)·g·n rounded 6, and
    the t ≤ 0.2 verdict is the cross-multiplication 5·Σ ≤ 4·g·n —
    decided on exact integers, never on the rounded EMD.

    Scale: three combinable aggregates; the dense grid is
    |groups|·m rows (the X205 densification lesson — a sparse grid
    silently drops zero-cell cumulative contributions); the 1-row
    total broadcasts (whitelisted cross)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    rows = (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .select(
            "c_nationkey",
            "c_mktsegment",
            F.substring("o_orderpriority", 1, 1)
            .cast("bigint")
            .alias("pr"),
        )
    )
    # ONE fact pass: the (nation, segment, priority) cell table is the
    # finest grain here, so total/per-priority/per-group counts are all
    # roll-ups of it — the r13-before plan re-ran the customer x orders
    # join once per aggregate (4x, 20 scans; now 2). The cell table is
    # catalog-bounded (|nations| x |segments| x |priorities|).
    cellcnt = (
        rows.groupBy("c_nationkey", "c_mktsegment", "pr")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .localCheckpoint()
    )
    total = cellcnt.agg(F.sum("cnt").cast("bigint").alias("n"))
    gtot = cellcnt.groupBy("pr").agg(
        F.sum("cnt").cast("bigint").alias("gn")
    )
    groups = cellcnt.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("cnt").cast("bigint").alias("g")
    )
    dense = (
        groups.crossJoin(F.broadcast(gtot))
        .join(cellcnt, ["c_nationkey", "c_mktsegment", "pr"], "left")
        .select(
            "c_nationkey",
            "c_mktsegment",
            "g",
            "pr",
            "gn",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
        )
    )
    wc = (
        Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("pr")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cums = dense.select(
        "c_nationkey",
        "c_mktsegment",
        "g",
        "pr",
        F.sum("cnt").over(wc).alias("cumg"),
        F.sum("gn").over(wc).alias("cumall"),
    )
    terms = (
        cums.where(F.col("pr") <= 4)
        .crossJoin(F.broadcast(total))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "g",
            F.abs(
                F.col("cumg").cast("decimal(38,0)") * F.col("n")
                - F.col("cumall").cast("decimal(38,0)") * F.col("g")
            )
            .cast("decimal(38,0)")
            .alias("d"),
        )
    )
    agg = terms.groupBy("c_nationkey", "c_mktsegment").agg(
        F.max("g").alias("g"),
        F.sum("d").cast("decimal(38,0)").alias("emd_num"),
    )
    return (
        agg.crossJoin(F.broadcast(total))
        .select(
            "c_nationkey",
            "c_mktsegment",
            F.col("g").cast("bigint").alias("group_size"),
            F.round(
                F.col("emd_num").cast("double")
                / (4.0 * F.col("g") * F.col("n")),
                6,
            ).alias("emd"),
            (
                F.col("emd_num") * 5
                <= F.col("g").cast("decimal(38,0)") * F.col("n") * 4
            ).alias("t_close_02"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


# ---- X260: Brown's double exponential smoothing -------------------------------


# Round-to-6 through an exact integer — promoted to the shared
# discipline module in r11 after the same 1-ulp cross-engine ROUND tie
# resurfaced in price_volume_mix at 10x; see _discipline.r6_exact.
_r6_exact = r6_exact


@declared_query(
    "brown_double_smoothing_daily",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS DOUBLE) / 100 AS DOUBLE) AS val
        FROM orders GROUP BY 1
    ), s1t AS (
        SELECT day, val,
               list_reduce(
                   list(val) OVER (ORDER BY day
                       ROWS BETWEEN {_SMOOTH_FRAME} PRECEDING
                       AND CURRENT ROW),
                   (acc, x) -> acc * 0.5 + x * 0.5) AS s1
        FROM daily
    ), s2t AS (
        SELECT day, val, s1,
               list_reduce(
                   list(s1) OVER (ORDER BY day
                       ROWS BETWEEN {_SMOOTH_FRAME} PRECEDING
                       AND CURRENT ROW),
                   (acc, x) -> acc * 0.5 + x * 0.5) AS s2
        FROM s1t
    )
    SELECT day,
           CAST(ROUND(val, 6) AS DOUBLE) AS val,
           CAST(CAST(ROUND((2 * s1 - s2) * 1000000) AS BIGINT)
                AS DOUBLE) / 1000000.0 AS level,
           CAST(CAST(ROUND((s1 - s2) * 1000000) AS BIGINT)
                AS DOUBLE) / 1000000.0 AS trend,
           CAST(CAST(ROUND(((2 * s1 - s2) + 7 * (s1 - s2)) * 1000000)
                AS BIGINT) AS DOUBLE) / 1000000.0 AS forecast_7d
    FROM s2t ORDER BY day
    """,
)
def brown_double_smoothing_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X260: Brown's double exponential smoothing of daily order
    revenue — two CHAINED α = 1/2 EWMA folds (s2 smooths s1), from
    which level = 2s1 − s2 and trend = s1 − s2 (at α = 1/2 the trend
    multiplier α/(1−α) is exactly 1) and the h-step forecast is
    level + h·trend — the trend-aware successor of X121's single
    EWMA, which systematically lags a trending series. Chaining two
    of X121's ordered folds sidesteps the two-variable Holt
    recursion entirely: a (level, trend) fold state would need
    struct-typed reduce lambdas, where each of these folds is the
    scalar acc/2 + x/2 both engines evaluate identically (α = 1/2 →
    every weight an exact power of two; an arbitrary α would
    accumulate cross-engine ulp drift through the recursion).

    Scale: orders reduce to ONE ROW PER DAY in a combinable
    aggregate before any window; both folds run over the bounded
    |days| series with a 51-element frame (truncated tail weight
    < 2^-50, far below round-6); whitelisted global window with
    this justification."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.to_date("o_orderdate").alias("day")
    ).agg(
        (
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
            ).cast("double")
            / 100
        )
        .cast("double")
        .alias("val")
    )
    w = (
        Window.orderBy("day")
        .rowsBetween(-_SMOOTH_FRAME, Window.currentRow)
    )

    def fold(col):
        xs = F.collect_list(col).over(w)
        return F.aggregate(
            F.slice(xs, 2, F.size(xs) - 1),
            F.element_at(xs, 1),
            lambda acc, x: acc * 0.5 + x * 0.5,
        )

    s1t = daily.select("day", "val", fold("val").alias("s1"))
    s2t = s1t.select("day", "val", "s1", fold("s1").alias("s2"))
    return s2t.select(
        "day",
        F.round("val", 6).alias("val"),
        _r6_exact(2 * F.col("s1") - F.col("s2")).alias("level"),
        _r6_exact(F.col("s1") - F.col("s2")).alias("trend"),
        _r6_exact(
            (2 * F.col("s1") - F.col("s2"))
            + 7 * (F.col("s1") - F.col("s2"))
        ).alias("forecast_7d"),
    ).orderBy("day")


# ---- X261: feature hashing with collision census -------------------------------


@declared_query(
    "feature_hash_buckets",
    oracle=f"""
    WITH feats AS (
        SELECT 'brand' AS feat, p_brand AS v FROM part
        UNION ALL SELECT 'type', p_type FROM part
        UNION ALL SELECT 'size', CAST(p_size AS VARCHAR) FROM part
    ), hashed AS (
        SELECT feat, v,
               (('0x' || substr(md5('fh|' || feat || '|' || v), 1, 8))
                ::BIGINT % {_FH_BUCKETS}) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM feats GROUP BY 1, 2
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(SUM(n_rows) AS BIGINT) AS n_rows,
           (COUNT(*) > 1) AS collided
    FROM hashed GROUP BY bucket
    ORDER BY bucket
    """,
)
def feature_hash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X261: the hashing-trick vectorizer — three categorical part
    attributes (brand/type/size) hashed into ONE shared
    128-bucket feature space (positions from the md5 bridge, salted
    by feature name so 'brand=X' and 'type=X' hash apart), emitted
    as the per-bucket census: distinct original values per bucket
    (the collision count — the price of the trick, measured), total
    row mass, and the collided flag. Feature hashing is how a
    100 TB pipeline one-hots unbounded-vocabulary categoricals with
    a FIXED schema and zero vocabulary state (no fit step, no
    dictionary shuffle — the property that matters at scale); its
    cost is exactly these collisions, and X252's count-min is the
    counting-side sibling of the same idea.

    Exactness: buckets and counts are exact integers; both engines
    place every value identically. Scale: one distinct-value
    aggregate (vocabulary-sized, Heaps-sublinear) then one 128-row
    aggregate."""
    p = load_table(spark, sf_dir, "part")
    feats = None
    for feat, col in (
        ("brand", F.col("p_brand")),
        ("type", F.col("p_type")),
        ("size", F.col("p_size").cast("string")),
    ):
        leg = p.select(F.lit(feat).alias("feat"), col.alias("v"))
        feats = leg if feats is None else feats.unionByName(leg)
    hashed = feats.groupBy("feat", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    ).withColumn(
        "bucket",
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.lit("fh"), F.col("feat"), F.col("v")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % _FH_BUCKETS,
    )
    return (
        hashed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_values"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
        )
        .withColumn("collided", F.col("n_values") > 1)
        .orderBy("bucket")
    )


# ---- X262: confusion matrix + MCC ----------------------------------------------


@declared_query(
    "mcc_rule_classifier",
    oracle="""
    WITH scored AS (
        SELECT c.c_mktsegment AS segment,
               CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END AS pred,
               CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), cm AS (
        SELECT segment,
               CAST(SUM(pred * y) AS BIGINT) AS tp,
               CAST(SUM(pred * (1 - y)) AS BIGINT) AS fp,
               CAST(SUM((1 - pred) * (1 - y)) AS BIGINT) AS tn,
               CAST(SUM((1 - pred) * y) AS BIGINT) AS fn
        FROM scored GROUP BY segment
    )
    SELECT segment, tp, fp, tn, fn,
           CAST(ROUND(CAST(tp + tn AS DOUBLE)
                      / (tp + fp + tn + fn), 6) AS DOUBLE)
               AS accuracy,
           CAST(ROUND(CAST(2 * tp AS DOUBLE)
                      / (2 * tp + fp + fn), 6) AS DOUBLE) AS f1,
           CAST(ROUND(
               CAST(CAST(tp AS DECIMAL(38,0)) * tn
                    - CAST(fp AS DECIMAL(38,0)) * fn AS DOUBLE)
               / sqrt(CAST(
                   CAST(tp + fp AS DECIMAL(38,0)) * (tp + fn)
                   * (tn + fp) * (tn + fn) AS DOUBLE)), 6)
               AS DOUBLE) AS mcc
    FROM cm ORDER BY segment
    """,
)
def mcc_rule_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X262: confusion matrix + accuracy / F1 / Matthews correlation
    per segment for the priority-rule classifier (urgent-or-high
    predicts fulfilled) — the fixed-threshold judgment suite next to
    X167's ROC and X258's AP. MCC is the one of the three that
    survives class imbalance; its numerator tp·tn − fp·fn is an
    exact DECIMAL(38,0) product-difference and the denominator is
    ONE sqrt of the exact integer product of the four marginals
    (≤ n⁴ — DECIMAL(38,0) holds to n ≈ 3·10⁹ rows per group, the
    documented width bound), both engines evaluating identical
    operands. Accuracy and F1 are single divisions of exact counts.

    Scale: one combinable aggregate over the fact join — the whole
    confusion matrix is four conditional sums in one pass."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    scored = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
            )
            .otherwise(0)
            .alias("pred"),
            F.when(F.col("o_orderstatus") == "F", 1)
            .otherwise(0)
            .alias("y"),
        )
    )
    cm = scored.groupBy("segment").agg(
        F.sum(F.col("pred") * F.col("y")).cast("bigint").alias("tp"),
        F.sum(F.col("pred") * (1 - F.col("y")))
        .cast("bigint")
        .alias("fp"),
        F.sum((1 - F.col("pred")) * (1 - F.col("y")))
        .cast("bigint")
        .alias("tn"),
        F.sum((1 - F.col("pred")) * F.col("y"))
        .cast("bigint")
        .alias("fn"),
    )
    num = (
        F.col("tp").cast("decimal(38,0)") * F.col("tn")
        - F.col("fp").cast("decimal(38,0)") * F.col("fn")
    ).cast("double")
    den = F.sqrt(
        (
            (F.col("tp") + F.col("fp")).cast("decimal(38,0)")
            * (F.col("tp") + F.col("fn"))
            * (F.col("tn") + F.col("fp"))
            * (F.col("tn") + F.col("fn"))
        ).cast("double")
    )
    return cm.select(
        "segment",
        "tp",
        "fp",
        "tn",
        "fn",
        F.round(
            (F.col("tp") + F.col("tn")).cast("double")
            / (F.col("tp") + F.col("fp") + F.col("tn") + F.col("fn")),
            6,
        ).alias("accuracy"),
        F.round(
            (2 * F.col("tp")).cast("double")
            / (2 * F.col("tp") + F.col("fp") + F.col("fn")),
            6,
        ).alias("f1"),
        F.round(num / den, 6).alias("mcc"),
    ).orderBy("segment")

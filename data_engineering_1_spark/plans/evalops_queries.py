"""Model-evaluation / operational-data declared queries (round 6,
eleventh batch — [north-star] scope): the two classifier-evaluation
primitives every training pipeline reports (exact ROC AUC,
calibration + Brier), the two lakehouse/ops recursions (clamped
inventory balance, CDC log apply), and the weighted-graph +
graph-density statistics that complete the co-purchase graph family.

  * ``roc_auc_order_status`` (X167) — exact tie-aware ROC AUC via the
    Mann-Whitney rank statistic over grouped score counts; everything
    up to ONE final division is exact integers.
  * ``calibration_bins_orders`` (X168) — decile reliability diagram +
    Brier score of a rank-calibrated score, sequenced by the X155
    two-phase rank (no global sort over data rows).
  * ``inventory_running_balance`` (X169) — running balance clamped at
    zero. The fold S_t = max(0, S_{t-1} + x_t) looks inherently
    sequential, but the lower-clamp-only recursion has a closed form:
    S_t = P_t - min(0, min_{k<=t} P_k) over prefix sums P — two
    partitioned window passes, no fold, exact BIGINTs.
  * ``cdc_apply_users`` (X170) — apply a change log (upserts +
    deletes, last-writer-wins by (ts, event_id)) to produce the live
    snapshot; the batch twin of the X42 streaming CDC sink.
  * ``cheapest_path_copurchase`` (X171) — bounded-hop min-plus
    (Bellman-Ford) cheapest path from a seed set over the weighted
    co-purchase graph (operators/graph.py::min_plus_hops); the oracle
    unrolls the SAME rounds as CTEs — the fourth iterative graph
    algorithm under the full value hash (CC, PageRank, BFS, this).
  * ``clustering_coefficient_copurchase`` (X172) — global transitivity
    (3·triangles / wedges) and average local clustering coefficient,
    the normalized density statistics on top of X130's raw per-node
    triangle counts.

Determinism: AUC/Gini, calibration means/gaps/Brier, transitivity —
all are single divisions of exact BIGINT/DECIMAL(38,0) operands,
rounded 6; per-node local coefficients stage round-9 DECIMAL(18,9)
before the order-free decimal mean; balances, CDC snapshots, and path
costs are exact integers end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from .registry import declared_query

# ---- X167: exact ROC AUC ----------------------------------------------


@declared_query(
    "roc_auc_order_status",
    oracle="""
    WITH scored AS (
        SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS s,
               CAST(o_orderstatus = 'F' AS BIGINT) AS y
        FROM orders
    ), g AS (
        SELECT s, CAST(COUNT(*) AS BIGINT) AS tot,
               CAST(SUM(y) AS BIGINT) AS pos
        FROM scored GROUP BY s
    ), ranked AS (
        SELECT s, tot, pos,
               CAST(COALESCE(SUM(tot) OVER (ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS cb
        FROM g
    ), agg AS (
        SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
               CAST(SUM(tot - pos) AS BIGINT) AS n_neg,
               CAST(COUNT(*) AS BIGINT) AS n_distinct_scores,
               CAST(SUM(CAST(pos AS DECIMAL(19,0))
                        * (2 * cb + tot + 1)) AS DECIMAL(38,0)) AS r2
        FROM ranked
    )
    SELECT n_pos, n_neg, n_distinct_scores,
           CAST(ROUND(CAST(r2 - CAST(n_pos AS DECIMAL(38,0))
                                * (n_pos + 1) AS DOUBLE)
                      / (2.0 * n_pos * n_neg), 6) AS DOUBLE) AS auc,
           CAST(ROUND(CAST(r2 - CAST(n_pos AS DECIMAL(38,0))
                                * (n_pos + 1)
                           - CAST(n_pos AS DECIMAL(38,0)) * n_neg
                           AS DOUBLE)
                      / (1.0 * n_pos * n_neg), 6) AS DOUBLE) AS gini
    FROM agg
    """,
)
def roc_auc_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X167: exact ROC AUC of "o_totalprice predicts o_orderstatus='F'"
    via the Mann-Whitney rank-sum identity — AUC = (R - n1(n1+1)/2) /
    (n1*n0) with R the sum of tie-averaged ranks of the positives. The
    classifier-evaluation primitive every model-quality gate reports;
    Gini = 2*AUC - 1 rides along from the same exact operands.

    Exactness: ties are handled by grouping on the BIGINT cents score —
    for a score value with `tot` rows after `cb` smaller rows, each row's
    tie-averaged rank is (2*cb + tot + 1)/2, so 2R = sum(pos * (2cb +
    tot + 1)) is an exact integer (DECIMAL(38,0) sum); AUC and Gini are
    each ONE division of exact operands, rounded 6. Scale: event volume
    reduces in the per-score-value aggregate BELOW the window; the
    cumulative window runs over the distinct cents relation, whose
    cardinality is bounded by the schema-fixed price domain, never by
    row count (same argument as ks_two_sample_values)."""
    o = load_table(spark, sf_dir, "orders")
    scored = o.select(
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("s"),
        (F.col("o_orderstatus") == "F").cast("bigint").alias("y"),
    )
    g = scored.groupBy("s").agg(
        F.count(F.lit(1)).cast("bigint").alias("tot"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = g.select(
        "s",
        "tot",
        "pos",
        F.coalesce(F.sum("tot").over(w), F.lit(0))
        .cast("bigint")
        .alias("cb"),
    )
    agg = ranked.agg(
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.sum(F.col("tot") - F.col("pos")).cast("bigint").alias("n_neg"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_scores"),
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
    den = F.col("n_pos").cast("double") * F.col("n_neg")
    return agg.select(
        "n_pos",
        "n_neg",
        "n_distinct_scores",
        F.round(num.cast("double") / (2 * den), 6).alias("auc"),
        F.round(
            (num - F.col("n_pos").cast("decimal(38,0)") * F.col("n_neg"))
            .cast("double")
            / den,
            6,
        ).alias("gini"),
    )


# ---- X168: calibration bins + Brier -----------------------------------


@declared_query(
    "calibration_bins_orders",
    oracle="""
    WITH scored AS (
        SELECT o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS s,
               CAST(o_orderstatus = 'F' AS BIGINT) AS y
        FROM orders
    ), ranked AS (
        SELECT s, y,
               CAST(ROW_NUMBER() OVER (ORDER BY s, o_orderkey)
                    AS BIGINT) AS rn,
               CAST(COUNT(*) OVER () AS BIGINT) AS n
        FROM scored
    )
    SELECT CAST((10 * (rn - 1)) // n AS INTEGER) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(ROUND(CAST(SUM(CAST(rn AS DECIMAL(38,0))) AS DOUBLE)
                      / (1.0 * MAX(n) * COUNT(*)), 6) AS DOUBLE)
               AS mean_pred,
           CAST(ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS DOUBLE)
               AS frac_pos,
           CAST(ROUND(CAST(ABS(CAST(MAX(n) AS DECIMAL(38,0)) * SUM(y)
                               - SUM(CAST(rn AS DECIMAL(38,0))))
                           AS DOUBLE)
                      / (1.0 * MAX(n) * COUNT(*)), 6) AS DOUBLE)
               AS calib_gap,
           CAST(ROUND(CAST(SUM(CAST(rn - y * n AS DECIMAL(19,0))
                               * CAST(rn - y * n AS DECIMAL(19,0)))
                           AS DOUBLE)
                      / (1.0 * MAX(n) * MAX(n) * COUNT(*)), 6)
                AS DOUBLE) AS brier
    FROM ranked
    GROUP BY 1 ORDER BY bin
    """,
)
def calibration_bins_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X168: decile reliability diagram + Brier score for the
    rank-calibrated score p_hat = rn/n (rn = dense rank of the cents
    score, deterministic (s, o_orderkey) total order) predicting
    o_orderstatus='F'. Per decile bin: mean predicted probability,
    observed positive fraction, |gap| (the ECE contribution), and the
    Brier mean — the is-the-model-honest complement to X167's AUC
    (AUC measures ranking; this measures probability quality).

    Exactness: p_hat is the exact rational rn/n, so every statistic
    lifts to integers — mean_pred = sum(rn)/(n*cnt), gap numerator
    |n*sum(y) - sum(rn)|, Brier numerator sum((rn - y*n)^2) — each a
    DECIMAL(38,0)-summed exact integer divided ONCE, rounded 6. Scale:
    the rank comes from operators/ranks.py::two_phase_row_number
    (shard = cents DIV 2^20 is monotone in the (s, o_orderkey) order),
    so no data row crosses a global sort; the bin aggregate is
    combinable. The broadcast 1-row n joins via cross (whitelisted)."""
    from ..operators.ranks import two_phase_row_number

    o = load_table(spark, sf_dir, "orders")
    scored = o.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("s"),
        (F.col("o_orderstatus") == "F").cast("bigint").alias("y"),
    )
    ranked = two_phase_row_number(
        scored,
        shard=F.expr("s DIV 1048576"),
        order_cols=["s", "o_orderkey"],
        out_col="rn",
    )
    n1 = scored.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    rb = ranked.crossJoin(F.broadcast(n1))
    e = F.col("rn") - F.col("y") * F.col("n")
    out = (
        rb.groupBy(
            F.expr("CAST((10 * (rn - 1)) DIV n AS INT)").alias("bin")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("rn").cast("decimal(38,0)"))
            .cast("decimal(38,0)")
            .alias("srn"),
            F.sum("y").cast("bigint").alias("sy"),
            F.max("n").alias("n"),
            F.sum(e.cast("decimal(19,0)") * e.cast("decimal(19,0)"))
            .cast("decimal(38,0)")
            .alias("se2"),
        )
    )
    nd = F.col("n").cast("double")
    return out.select(
        "bin",
        "n_rows",
        F.round(
            F.col("srn").cast("double") / (nd * F.col("n_rows")), 6
        ).alias("mean_pred"),
        F.round(F.col("sy").cast("double") / F.col("n_rows"), 6).alias(
            "frac_pos"
        ),
        F.round(
            F.abs(
                F.col("n").cast("decimal(38,0)") * F.col("sy")
                - F.col("srn")
            ).cast("double")
            / (nd * F.col("n_rows")),
            6,
        ).alias("calib_gap"),
        F.round(
            F.col("se2").cast("double") / (nd * nd * F.col("n_rows")), 6
        ).alias("brier"),
    ).orderBy("bin")


# ---- X169: clamped running balance ------------------------------------


@declared_query(
    "inventory_running_balance",
    oracle="""
    WITH daily AS (
        SELECT l_suppkey,
               CAST(l_shipdate AS DATE) AS d,
               CAST(SUM(CASE WHEN l_returnflag = 'R'
                             THEN CAST(l_quantity AS BIGINT)
                             ELSE -CAST(l_quantity AS BIGINT) END)
                    AS BIGINT) AS net_qty
        FROM lineitem WHERE l_suppkey % 10 = 0
        GROUP BY 1, 2
    ), pre AS (
        SELECT l_suppkey, d, net_qty,
               CAST(SUM(net_qty) OVER w AS BIGINT) AS p
        FROM daily
        WINDOW w AS (PARTITION BY l_suppkey ORDER BY d
                     ROWS UNBOUNDED PRECEDING)
    )
    SELECT l_suppkey, d, net_qty,
           CAST(p - LEAST(CAST(0 AS BIGINT), MIN(p) OVER w) AS BIGINT)
               AS balance,
           CAST(-LEAST(CAST(0 AS BIGINT), MIN(p) OVER w) AS BIGINT)
               AS cum_shortfall
    FROM pre
    WINDOW w AS (PARTITION BY l_suppkey ORDER BY d
                 ROWS UNBOUNDED PRECEDING)
    ORDER BY l_suppkey, d
    """,
)
def inventory_running_balance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X169: per-supplier daily inventory balance clamped at zero —
    returns ('R') flow in, everything else flows out, and stock can
    never go negative: S_t = max(0, S_{t-1} + x_t). The recursion looks
    inherently sequential (each day depends on the clamped previous
    day), but the LOWER-clamp-only fold has a closed form —

        S_t = P_t - min(0, min_{k<=t} P_k),  P = prefix sum of x

    (the clamp "absorbs" exactly the deepest prefix deficit so far), so
    the whole series is two partitioned window passes over exact
    BIGINTs, no fold, no UDF. cum_shortfall = -min(0, min P) is the
    cumulative demand lost to stockouts — the ops metric the clamp
    hides. The identity is pinned against a literal sequential fold in
    tests/test_evalops_queries.py.

    Scale: one combinable (supplier, day) aggregate, then windows
    partitioned BY SUPPLIER — series length is calendar-bounded, and no
    unpartitioned window exists. Suppliers are filtered (% 10) only to
    bound the OUTPUT rows, not the work."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_suppkey") % 10 == 0
    )
    qty = F.col("l_quantity").cast("bigint")
    daily = li.groupBy(
        "l_suppkey", F.to_date("l_shipdate").alias("d")
    ).agg(
        F.sum(
            F.when(F.col("l_returnflag") == "R", qty).otherwise(-qty)
        )
        .cast("bigint")
        .alias("net_qty")
    )
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pre = daily.select(
        "l_suppkey",
        "d",
        "net_qty",
        F.sum("net_qty").over(w).cast("bigint").alias("p"),
    )
    floor = F.least(F.lit(0).cast("bigint"), F.min("p").over(w))
    return pre.select(
        "l_suppkey",
        "d",
        "net_qty",
        (F.col("p") - floor).cast("bigint").alias("balance"),
        (-floor).cast("bigint").alias("cum_shortfall"),
    ).orderBy("l_suppkey", "d")


# ---- X170: CDC log apply ----------------------------------------------


@declared_query(
    "cdc_apply_users",
    oracle="""
    WITH log AS (
        SELECT user_id, ts, event_id,
               CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END
                   AS op,
               CAST(ROUND(value * 100) AS BIGINT) AS val_cents
        FROM events
    ), ranked AS (
        SELECT *,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC)
                   AS rn
        FROM log
    ), stats AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_changes,
               CAST(SUM(CAST(op = 'D' AS BIGINT)) AS BIGINT) AS n_deletes
        FROM log GROUP BY user_id
    )
    SELECT r.user_id, r.ts AS last_ts, r.val_cents AS last_value_cents,
           s.n_changes, s.n_deletes
    FROM ranked r JOIN stats s ON r.user_id = s.user_id
    WHERE r.rn = 1 AND r.op <> 'D'
    ORDER BY r.user_id
    """,
)
def cdc_apply_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X170: apply a CDC change log to produce the live snapshot —
    events re-read as a keyed log (user_id, ordered by (ts, event_id)),
    'error' rows as DELETE tombstones, everything else as upserts;
    last-writer-wins, and a key whose final operation is a delete is
    absent from the snapshot. The batch twin of X42's streaming CDC
    upsert sink and the read-side of X53's snapshot-diff: log in,
    table out. Change-count and tombstone-count columns give the audit
    trail a real CDC consumer keeps.

    Exactness: ordering is total ((ts, event_id) with event_id unique),
    values are exact cents. Scale: one partitioned window + one
    combinable aggregate, both keyed on user_id — the same shuffle
    layout serves both, and nothing is global."""
    ev = load_table(spark, sf_dir, "events")
    log = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "error", "D")
        .otherwise("U")
        .alias("op"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("val_cents"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    ranked = log.withColumn("rn", F.row_number().over(w))
    stats = log.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_changes"),
        F.sum((F.col("op") == "D").cast("bigint"))
        .cast("bigint")
        .alias("n_deletes"),
    )
    return (
        ranked.where((F.col("rn") == 1) & (F.col("op") != "D"))
        .join(stats, "user_id")
        .select(
            "user_id",
            F.col("ts").alias("last_ts"),
            F.col("val_cents").alias("last_value_cents"),
            "n_changes",
            "n_deletes",
        )
        .orderBy("user_id")
    )


# ---- X171: bounded-hop cheapest path ----------------------------------

_O_WEDGES = """
    items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), pw AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    ), edges AS (
        SELECT u AS src, v AS dst,
               CAST(101 - LEAST(CAST(100 AS BIGINT), cnt) AS BIGINT)
                   AS cost
        FROM pw
        UNION ALL
        SELECT v AS src, u AS dst,
               CAST(101 - LEAST(CAST(100 AS BIGINT), cnt) AS BIGINT)
                   AS cost
        FROM pw
    )
"""


def _o_relax(prev: str) -> str:
    """One unrolled min-plus round — the exact twin of
    operators/graph.py:min_plus_hops' loop body."""
    return f"""
        SELECT node, CAST(MIN(dist) AS BIGINT) AS dist FROM (
            SELECT node, dist FROM {prev}
            UNION ALL
            SELECT e.dst AS node, p.dist + e.cost AS dist
            FROM edges e JOIN {prev} p ON e.src = p.node
        ) t GROUP BY node
    """


@declared_query(
    "cheapest_path_copurchase",
    oracle=f"""
    WITH {_O_WEDGES},
    nodes AS (
        SELECT DISTINCT src AS node FROM edges
    ), d0 AS (
        SELECT node, CAST(0 AS BIGINT) AS dist FROM nodes
        WHERE node % 100 = 0
    ), d1 AS ({_o_relax('d0')}
    ), d2 AS ({_o_relax('d1')}
    ), d3 AS ({_o_relax('d2')}
    )
    SELECT dist,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(SUM(node) AS BIGINT) AS node_checksum
    FROM d3 GROUP BY dist ORDER BY dist
    """,
)
def cheapest_path_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X171: bounded-hop cheapest path from the seed parts (part_key %
    100 = 0) over the WEIGHTED co-purchase graph — edge cost = 101 -
    min(100, times co-purchased), so strong associations are cheap to
    traverse and the distance reads as "association remoteness". Three
    min-plus (Bellman-Ford) relaxation rounds via
    operators/graph.py::min_plus_hops — the fourth iterative graph
    algorithm under the full value hash (X3 CC, X100 PageRank, X161
    BFS, this), and the weighted generalization of X161: with all
    costs 1 it degenerates to BFS hops.

    Exactness: costs and path sums are exact BIGINTs; min() is
    order-independent; the oracle unrolls the identical rounds as
    CTEs (the operator's frontier relaxation is round-for-round
    identical to the full synchronous form — see min_plus_hops).
    Per-distance (count, node-checksum) pins the entire assignment.
    Scale: edges pre-partitioned on src ONCE; each round relaxes only
    out of the <= |V|-row improvement frontier; 3 rounds = at most 3
    small shuffles, never an all-pairs closure. Seeds derive from the
    cached DISTINCT pair relation (same node set as the weighted edge
    list, without re-running its weight aggregate)."""
    from ..operators.edgecache import copurchase_pairs, copurchase_und
    from ..operators.graph import min_plus_hops

    # pair multiset from the session-scoped persisted cache (VERDICT
    # r7 #4); only the weight aggregation runs per query
    pw = (
        copurchase_pairs(spark, sf_dir)
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    cost = (
        101 - F.least(F.lit(100).cast("bigint"), F.col("cnt"))
    ).cast("bigint")
    edges = pw.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("u").alias("src"),
                    F.col("v").alias("dst"),
                    cost.alias("cost"),
                ),
                F.struct(
                    F.col("v").alias("src"),
                    F.col("u").alias("dst"),
                    cost.alias("cost"),
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst", "e.cost")
    # node set of the weighted graph == distinct endpoints of the
    # simple pair relation (already cached) — no weight-agg recompute
    seeds = (
        copurchase_und(spark, sf_dir)
        .select(F.explode(F.array("u", "v")).alias("node"))
        .where(F.col("node") % 100 == 0)
        .distinct()
    )
    dist = min_plus_hops(edges, seeds, rounds=3)
    return (
        dist.groupBy("dist")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum("node").cast("bigint").alias("node_checksum"),
        )
        .orderBy("dist")
    )


# ---- X172: clustering coefficient / transitivity ----------------------


@declared_query(
    "clustering_coefficient_copurchase",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), und AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS d
        FROM (SELECT u AS node FROM und
              UNION ALL SELECT v AS node FROM und)
        GROUP BY node
    ), oriented AS (
        SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END
                   AS src,
               CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END
                   AS dst,
               CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN dv.d ELSE du.d END
                   AS ddeg
        FROM und e
        JOIN deg du ON du.node = e.u
        JOIN deg dv ON dv.node = e.v
    ), tri AS (
        SELECT w.src AS x, w.a AS y, w.b AS z
        FROM (
            SELECT o1.src, o1.dst AS a, o2.dst AS b
            FROM oriented o1 JOIN oriented o2
              ON o1.src = o2.src
             AND (o1.ddeg, o1.dst) < (o2.ddeg, o2.dst)
        ) w
        JOIN oriented o3 ON o3.src = w.a AND o3.dst = w.b
    ), pern AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS t
        FROM (SELECT x AS node FROM tri
              UNION ALL SELECT y AS node FROM tri
              UNION ALL SELECT z AS node FROM tri)
        GROUP BY node
    ), nd AS (
        SELECT deg.node, deg.d, COALESCE(pern.t, 0) AS t
        FROM deg LEFT JOIN pern ON deg.node = pern.node
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(SUM(d * (d - 1)) // 2 AS BIGINT) AS n_wedges,
           CAST(SUM(t) // 3 AS BIGINT) AS n_triangles,
           CAST(ROUND(CAST(SUM(t) AS DOUBLE)
                      / SUM(d * (d - 1)), 6) AS DOUBLE) AS transitivity,
           CAST(ROUND(CAST(SUM(CASE WHEN d >= 2 THEN
                   CAST(ROUND(CAST(2 * t AS DOUBLE) / (d * (d - 1)), 9)
                        AS DECIMAL(18,9)) END) AS DOUBLE)
                      / SUM(CAST(d >= 2 AS BIGINT)), 6) AS DOUBLE)
               AS avg_local_coef
    FROM nd
    """,
)
def clustering_coefficient_copurchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X172: global transitivity (3*triangles / wedges) and average
    local clustering coefficient of the co-purchase graph — the
    normalized density statistics on top of X130's raw per-node
    triangle counts (X130 answers "which parts sit in dense bundles";
    this answers "how clustered is the graph"). Transitivity vs
    avg-local divergence is the classic hub-structure signal: hubs
    with sparse neighborhoods drag transitivity below the local mean.

    Triangle enumeration reuses X130's degree-oriented edge-
    intersection shape (out-degree bounded by O(sqrt(m)) under the
    (degree, id) orientation; each triangle emitted exactly once,
    attributed to all three corners via one explode). Exactness:
    degrees, wedge counts (sum d(d-1)/2), and triangle counts are
    exact BIGINTs; transitivity is ONE division rounded 6; per-node
    local coefficients 2t/(d(d-1)) are each ONE division rounded 9
    and staged DECIMAL(18,9) so their mean is an order-free decimal
    sum divided once (the X121 discipline)."""
    from ..operators.edgecache import (
        copurchase_deg,
        copurchase_oriented,
        copurchase_oriented_adj,
    )

    # r13: degrees, the oriented edge relation, and the out-neighborhood
    # arrays come from the session-scoped persisted edge cache (X37
    # stored-index discipline) — shared with triangle_count_copurchase
    # instead of each query re-deriving them from the pair cache.
    deg = copurchase_deg(spark, sf_dir)
    oriented = copurchase_oriented(spark, sf_dir)
    adj = copurchase_oriented_adj(spark, sf_dir)
    tri = (
        oriented.join(
            adj.select(
                F.col("src").alias("s_"), F.col("nbrs").alias("src_nbrs")
            ),
            F.col("src") == F.col("s_"),
        )
        .join(
            adj.select(
                F.col("src").alias("d_"), F.col("nbrs").alias("dst_nbrs")
            ),
            F.col("dst") == F.col("d_"),
        )
        .select(
            F.col("src").alias("x"),
            F.col("dst").alias("y"),
            F.explode(F.array_intersect("src_nbrs", "dst_nbrs")).alias(
                "z"
            ),
        )
    )
    pern = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    )
    nd = deg.join(pern, "node", "left").select(
        "node", "d", F.coalesce(F.col("t"), F.lit(0)).alias("t")
    )
    local9 = F.when(
        F.col("d") >= 2,
        F.round(
            (2 * F.col("t")).cast("double")
            / (F.col("d") * (F.col("d") - 1)),
            9,
        ).cast("decimal(18,9)"),
    )
    return nd.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.expr("CAST(SUM(d * (d - 1)) DIV 2 AS BIGINT)").alias("n_wedges"),
        F.expr("CAST(SUM(t) DIV 3 AS BIGINT)").alias("n_triangles"),
        F.round(
            F.sum(F.col("t")).cast("double")
            / F.sum(F.col("d") * (F.col("d") - 1)),
            6,
        ).alias("transitivity"),
        F.round(
            F.sum(local9).cast("double")
            / F.sum((F.col("d") >= 2).cast("bigint")),
            6,
        ).alias("avg_local_coef"),
    )

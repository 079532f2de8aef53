"""Relational declared queries (SURVEY.md §2.5 A4-A5, §2.6 J1-J6, §2.7 W1-W7).

The reference performs no relational joins/aggregates (its only join-like op
is similarity search); this whole surface is [north-star], exercised over the
TPC-H-ish fixture star schema. All DataFrame-API first; Catalyst handles
broadcast-vs-sort-merge selection, partial aggregation, and pushdown. Dims
(region/nation/supplier) get explicit broadcast hints — at 100 TB the fact
tables shuffle on join keys, the dims never should.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ._discipline import avg6, dec, o_avg6, o_sum_dec, sum_dec
from .registry import declared_query

_DISC_PRICE_SPARK = None  # built inline below

# DuckDB fragments for the TPC-H money expressions
_O_DISC = "CAST(1 - CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(18,2))"
_O_DISC_PRICE = (
    f"CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * {_O_DISC} AS DECIMAL(18,4))"
)
_O_CHARGE = (
    f"CAST({_O_DISC_PRICE} * CAST(1 + CAST(l_tax AS DECIMAL(18,2)) AS DECIMAL(18,2))"
    " AS DECIMAL(18,6))"
)


# The multiply inputs use the narrowest decimal that bounds the data
# (price < 10^10, discount/tax in [0,1]) so every product keeps precision
# <= 18 and stays on Spark's long-backed Decimal path — a (18,2) x (18,2)
# multiply widens to precision 37 (128-bit per row; measurably slower
# before JIT warmup, equal after). Values are exact either way, so the
# (18,x)-cast oracle fragments above hash identically.


def _disc_price() -> F.Column:
    one = F.lit(1).cast("decimal(4,2)")
    return (
        dec("l_extendedprice").cast("decimal(12,2)")
        * (one - dec("l_discount").cast("decimal(4,2)")).cast("decimal(4,2)")
    ).cast("decimal(12,4)")  # (12,2)x(4,2) -> (17,4), value < 10^8


def _charge() -> F.Column:
    one = F.lit(1).cast("decimal(4,2)")
    return (
        _disc_price()
        * (one + dec("l_tax").cast("decimal(4,2)")).cast("decimal(4,2)")
    ).cast("decimal(18,6)")  # (12,4)x(4,2) -> (17,6)


@declared_query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {o_sum_dec('l_quantity')} AS sum_qty,
           {o_sum_dec('l_extendedprice')} AS sum_base_price,
           CAST(ROUND(SUM({_O_DISC_PRICE}), 2) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM({_O_CHARGE}), 2) AS DOUBLE) AS sum_charge,
           {o_avg6('l_quantity')} AS avg_qty,
           {o_avg6('l_extendedprice')} AS avg_price,
           {o_avg6('l_discount')} AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 hash aggregate, TPC-H Q1 shape: 2-key groupBy, 8 aggregates.
    Catalyst plans partial (map-side) + final agg — one shuffle on the
    grouping keys; the filter pushes down to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum_dec("l_quantity").alias("sum_qty"),
            sum_dec("l_extendedprice").alias("sum_base_price"),
            F.sum(_disc_price()).cast("decimal(38,2)").cast("double").alias("sum_disc_price"),
            F.sum(_charge()).cast("decimal(38,2)").cast("double").alias("sum_charge"),
            avg6("l_quantity").alias("avg_qty"),
            avg6("l_extendedprice").alias("avg_price"),
            avg6("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@declared_query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(ROUND(SUM({_O_DISC_PRICE}), 2) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 inner equi-joins + A4 + W5 top-k, TPC-H Q3 shape. Customer filter
    shrinks the build side; at scale orders/lineitem shuffle on the join
    key while AQE can demote the filtered customer side to broadcast."""
    cu = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    od = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        cu.join(od, cu.c_custkey == od.o_custkey)
        .join(li, od.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_disc_price()).cast("decimal(38,2)").cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@declared_query(
    "q5_region_revenue",
    oracle=f"""
    SELECT n_name,
           CAST(ROUND(SUM({_O_DISC_PRICE}), 2) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1+J4: 6-table join through the dimension chain, TPC-H Q5 shape.
    nation/region/supplier are broadcast explicitly — at 100 TB these stay
    tiny while lineitem/orders sort-merge on their keys."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        cu.join(od, cu.c_custkey == od.o_custkey)
        .join(li, od.o_orderkey == li.l_orderkey)
        .join(
            F.broadcast(su),
            (li.l_suppkey == su.s_suppkey) & (cu.c_nationkey == su.s_nationkey),
        )
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_disc_price()).cast("decimal(38,2)").cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@declared_query(
    "customer_order_stats",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
           COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                         AS DOUBLE), 0.0) AS total_spend,
           CAST(MAX(o_orderdate) AS TIMESTAMP) AS last_order
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 left outer join + A4: every customer, including order-less ones
    (NULL-group sums coalesced to 0)."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    return (
        cu.join(od, cu.c_custkey == od.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(
                sum_dec("o_totalprice"), F.lit(0.0)
            ).alias("total_spend"),
            F.max("o_orderdate").alias("last_order"),
        )
    )


@declared_query(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 left anti join (NOT EXISTS)."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    return cu.join(od, cu.c_custkey == od.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@declared_query(
    "customers_with_urgent_orders",
    oracle="""
    SELECT c_custkey, c_acctbal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    """,
)
def customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 left semi join (EXISTS)."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cu.join(od, cu.c_custkey == od.o_custkey, "left_semi").select(
        "c_custkey", "c_acctbal"
    )


@declared_query(
    "top_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        FROM orders
    ) t
    WHERE rn <= 3
    """,
)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/W5 top-k per group via row_number (deterministic tie-break on
    o_orderkey). One shuffle on the partition key; no global sort."""
    od = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        od.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@declared_query(
    "customer_balance_ranks",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal,
           CAST(rank() OVER w AS INTEGER) AS rnk,
           CAST(dense_rank() OVER w AS INTEGER) AS drnk,
           CAST(ntile(4) OVER (PARTITION BY c_mktsegment
                               ORDER BY c_acctbal DESC, c_custkey)
                AS INTEGER) AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC)
    """,
)
def customer_balance_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 ranking family: rank / dense_rank / ntile per segment."""
    cu = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"))
    wt = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return cu.select(
        "c_mktsegment",
        "c_custkey",
        "c_acctbal",
        F.rank().over(w).cast("int").alias("rnk"),
        F.dense_rank().over(w).cast("int").alias("drnk"),
        F.ntile(4).over(wt).cast("int").alias("quartile"),
    )


@declared_query(
    "running_customer_spend",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 frame aggregate: running per-customer spend (exact decimal)."""
    od = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return od.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias(
            "running_spend"
        ),
    )


@declared_query(
    "order_gaps",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(date_diff('day', CAST(lag(o_orderdate) OVER w AS DATE),
                          CAST(o_orderdate AS DATE)) AS INTEGER) AS gap_days,
           lead(o_orderkey) OVER w AS next_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 analytic functions: lag/lead over the per-customer order timeline."""
    od = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return od.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("int")
        .alias("gap_days"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


@declared_query(
    "rollup_order_status",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {o_sum_dec('o_totalprice')} AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 rollup: subtotals per status, per (status, priority), grand total."""
    od = load_table(spark, sf_dir, "orders")
    return od.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        sum_dec("o_totalprice").alias("total_price"),
    )


@declared_query(
    "cube_lineitem_flags",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           {o_sum_dec('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_lineitem_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 cube over the lineitem flag pair.

    Pre-aggregates to one partial per (flag, status) BEFORE the cube:
    Spark's cube plans an Expand of the full input (4 copies of every
    row through the shuffle); cubing the ~6 partials instead re-aggregates
    sums-of-sums — identical results (sum/count are re-aggregable), 2.4M
    fewer expanded rows at sf0.1, and the win grows linearly with scale."""
    li = load_table(spark, sf_dir, "lineitem")
    partials = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("__pn"),
        F.sum(dec("l_quantity")).alias("__pq"),
    )
    return partials.cube("l_returnflag", "l_linestatus").agg(
        F.sum("__pn").alias("n"),
        F.sum("__pq").cast("double").alias("sum_qty"),
    )


@declared_query(
    "custkey_set_ops",
    oracle="""
    WITH rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
         buyers AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders)
    SELECT 'intersect' AS op, c_custkey FROM (
        SELECT c_custkey FROM rich INTERSECT SELECT c_custkey FROM buyers)
    UNION ALL
    SELECT 'except' AS op, c_custkey FROM (
        SELECT c_custkey FROM rich EXCEPT SELECT c_custkey FROM buyers)
    """,
)
def custkey_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7 intersect / except (set semantics), tagged and unioned."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    rich = cu.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    buyers = od.select(F.col("o_custkey").alias("c_custkey")).distinct()
    inter = rich.intersect(buyers).select(
        F.lit("intersect").alias("op"), "c_custkey"
    )
    exc = rich.exceptAll(buyers).distinct().select(
        F.lit("except").alias("op"), "c_custkey"
    )
    return inter.unionByName(exc)


@declared_query(
    "union_by_name_entities",
    oracle="""
    SELECT 'customer' AS kind, c_custkey AS entity_key, c_name AS name,
           c_acctbal AS acctbal
    FROM customer WHERE c_acctbal < 0
    UNION ALL
    SELECT 'supplier' AS kind, s_suppkey AS entity_key, s_name AS name,
           s_acctbal AS acctbal
    FROM supplier WHERE s_acctbal < 0
    """,
)
def union_by_name_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 unionByName across differently-shaped inputs (negative balances)."""
    cu = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") < 0)
    su = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    a = cu.select(
        F.lit("customer").alias("kind"),
        F.col("c_custkey").alias("entity_key"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
    )
    b = su.select(
        F.col("s_acctbal").alias("acctbal"),
        F.lit("supplier").alias("kind"),
        F.col("s_suppkey").alias("entity_key"),
        F.col("s_name").alias("name"),
    )
    return a.unionByName(b)


@declared_query(
    "ship_lag_by_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems,
           CAST(ROUND(CAST(SUM(CAST(date_diff('day',
                    CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
                AS BIGINT)) AS DOUBLE) / COUNT(*), 6) AS DOUBLE) AS avg_lag_days
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= o_orderdate
      AND l_shipdate <  o_orderdate + INTERVAL 90 DAY
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def ship_lag_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 mixed equi+range join: lineitems shipped within 90 days of order
    placement; integer day-lags aggregate exactly."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).cast("bigint")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .filter(
            (F.col("l_shipdate") >= F.col("o_orderdate"))
            & (
                F.col("l_shipdate")
                < F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
            )
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.round(F.sum(lag).cast("double") / F.count(F.lit(1)), 6).alias(
                "avg_lag_days"
            ),
        )
        .orderBy("o_orderpriority")
    )


@declared_query(
    "region_segment_grid",
    oracle="""
    WITH grid AS (
        SELECT r_regionkey, r_name, c_mktsegment
        FROM region CROSS JOIN (SELECT DISTINCT c_mktsegment FROM customer) s
    ), counts AS (
        SELECT n_regionkey, c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_regionkey, c_mktsegment
    )
    SELECT g.r_name, g.c_mktsegment,
           COALESCE(c.n_customers, 0) AS n_customers
    FROM grid g
    LEFT JOIN counts c
      ON g.r_regionkey = c.n_regionkey AND g.c_mktsegment = c.c_mktsegment
    """,
)
def region_segment_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 cross join (dense grid) + left join with zero-fill."""
    re = load_table(spark, sf_dir, "region")
    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    grid = re.crossJoin(cu.select("c_mktsegment").distinct())
    counts = (
        cu.join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .groupBy("n_regionkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    return (
        grid.join(
            counts,
            (grid.r_regionkey == counts.n_regionkey)
            & (grid.c_mktsegment == counts.c_mktsegment),
            "left",
        )
        .select(
            "r_name",
            grid.c_mktsegment,
            F.coalesce(counts.n_customers, F.lit(0)).alias("n_customers"),
        )
    )


@declared_query(
    "nation_extremes_full_outer",
    oracle="""
    WITH hc AS (
        SELECT c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_rich
        FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey
    ), ps AS (
        SELECT s_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_poor
        FROM supplier WHERE s_acctbal < -800 GROUP BY s_nationkey
    )
    SELECT COALESCE(hc.nk, ps.nk) AS nationkey,
           COALESCE(n_rich, 0) AS n_rich,
           COALESCE(n_poor, 0) AS n_poor
    FROM hc FULL OUTER JOIN ps ON hc.nk = ps.nk
    """,
)
def nation_extremes_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 full outer join: per-nation counts of rich customers vs
    deep-debt suppliers — both filters are sparse, so each side holds
    nations the other misses and all three match cases appear."""
    cu = load_table(spark, sf_dir, "customer")
    su = load_table(spark, sf_dir, "supplier")
    hc = (
        cu.filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("nk_c"))
        .agg(F.count(F.lit(1)).alias("n_rich"))
    )
    ps = (
        su.filter(F.col("s_acctbal") < -800)
        .groupBy(F.col("s_nationkey").alias("nk_s"))
        .agg(F.count(F.lit(1)).alias("n_poor"))
    )
    return hc.join(ps, hc.nk_c == ps.nk_s, "full").select(
        F.coalesce("nk_c", "nk_s").alias("nationkey"),
        F.coalesce("n_rich", F.lit(0)).alias("n_rich"),
        F.coalesce("n_poor", F.lit(0)).alias("n_poor"),
    )


@declared_query(
    "orders_right_outer_customer",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment,
           o.o_orderkey,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
    FROM (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
    RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def orders_right_outer_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 right outer join: every customer, paired with their urgent
    orders — customers with none survive with NULL order columns (the
    literal right-outer leg of §2.6 J2; left/full are declared
    elsewhere). The preserved (customer) side is the small one, so the
    planner may broadcast the filtered orders build side; semantics are
    what's pinned here."""
    od = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    cu = load_table(spark, sf_dir, "customer")
    return od.join(cu, od.o_custkey == cu.c_custkey, "right").select(
        "c_custkey",
        "c_mktsegment",
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    )


@declared_query(
    "nulls_ordering_readings",
    oracle="""
    WITH masked AS (
        SELECT event_id, user_id,
               CASE WHEN event_type = 'error' THEN NULL ELSE value END
                   AS reading
        FROM events
    )
    SELECT event_id, user_id, CAST(reading AS DOUBLE) AS reading,
           CAST(row_number() OVER (PARTITION BY user_id
                ORDER BY reading ASC NULLS FIRST, event_id) AS INTEGER)
               AS rn_nulls_first,
           CAST(row_number() OVER (PARTITION BY user_id
                ORDER BY reading DESC NULLS LAST, event_id) AS INTEGER)
               AS rn_nulls_last
    FROM masked
    ORDER BY reading ASC NULLS FIRST, event_id
    LIMIT 500
    """,
)
def nulls_ordering_readings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 explicit nulls-ordering: sensor readings with synthesized
    dropout (error events -> NULL) ranked per user under ASC NULLS FIRST
    and DESC NULLS LAST, then a global asc_nulls_first top-500. Both the
    window ranks and WHICH rows the limit selects depend on null
    placement, so the value hash pins the semantics users hit when
    porting between engines (Spark's default = NULLS FIRST for ASC,
    NULLS LAST for DESC; other engines differ). The limit compiles to
    TakeOrderedAndProject — no global sort."""
    ev = load_table(spark, sf_dir, "events")
    masked = ev.select(
        "event_id",
        "user_id",
        F.when(F.col("event_type") == "error", F.lit(None))
        .otherwise(F.col("value"))
        .cast("double")
        .alias("reading"),
    )
    w_nf = Window.partitionBy("user_id").orderBy(
        F.col("reading").asc_nulls_first(), "event_id"
    )
    w_nl = Window.partitionBy("user_id").orderBy(
        F.col("reading").desc_nulls_last(), "event_id"
    )
    return (
        masked.select(
            "event_id",
            "user_id",
            "reading",
            F.row_number().over(w_nf).cast("int").alias("rn_nulls_first"),
            F.row_number().over(w_nl).cast("int").alias("rn_nulls_last"),
        )
        .orderBy(F.col("reading").asc_nulls_first(), "event_id")
        .limit(500)
    )


@declared_query(
    "grouping_sets_orders",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """,
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 explicit GROUPING SETS (the non-hierarchical cousin of
    rollup/cube): per-priority totals, per-status totals, and the grand
    total in one pass — Catalyst plans a single Expand over the chosen
    sets, not three scans."""
    od = load_table(spark, sf_dir, "orders")
    od.createOrReplaceTempView("__orders_gs")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               COUNT(1) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_price
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        """
    )


@declared_query(
    "order_value_distribution",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(ROUND(percent_rank() OVER w, 6) AS DOUBLE) AS pct_rank,
           CAST(ROUND(cume_dist() OVER w, 6) AS DOUBLE) AS cume,
           CAST(first_value(o_orderkey) OVER w AS BIGINT) AS cheapest_key,
           CAST(last_value(o_orderkey) OVER (
               PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS BIGINT) AS priciest_key
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def order_value_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/W2 distribution + boundary analytics: percent_rank, cume_dist,
    first/last order key per priority (last_value needs the full-partition
    frame — the default running frame would return the current row)."""
    od = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return od.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("o_orderkey").over(w).alias("cheapest_key"),
        F.last("o_orderkey").over(w_full).alias("priciest_key"),
    )

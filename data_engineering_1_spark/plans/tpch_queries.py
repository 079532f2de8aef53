"""TPC-H-analog declared queries (SURVEY.md §2.5-§2.7 breadth).

The fixture star schema is TPC-H-ish but misses a few canonical columns
(no partsupp, no l_shipmode/l_commitdate, no c_phone), so these are
*adaptations*: each keeps the canonical plan shape — the thing that
matters at 100 TB — while binding to the columns that exist.

Scale notes (local[32] tests correctness; the plan shapes target a
1000-executor cluster):
  * every dim (part/supplier/nation/customer-agg) that is orders of
    magnitude smaller than lineitem gets an explicit broadcast hint so the
    fact table never shuffles for the join;
  * correlated EXISTS / scalar subqueries are expressed as semi joins and
    broadcast 1-row aggregates — never a driver-side collect;
  * single-row filter-aggregates (q6/q19) exist to pin predicate pushdown:
    the parquet scan must carry PushedFilters, verified in
    tests/test_plan_shapes.py.

All money arithmetic follows the decimal discipline in _discipline.py so
the DuckDB oracle hashes bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from ._discipline import dec, o_sum_dec, sum_dec
from .registry import declared_query


def _disc_price() -> F.Column:
    """l_extendedprice * (1 - l_discount) on the narrow-decimal path
    (same formulation as relational_queries.q1; see the precision note
    there)."""
    one = F.lit(1).cast("decimal(4,2)")
    return (
        dec("l_extendedprice").cast("decimal(12,2)")
        * (one - dec("l_discount").cast("decimal(4,2)")).cast("decimal(4,2)")
    ).cast("decimal(12,4)")


_O_DISC_PRICE = (
    "CAST(CAST(l_extendedprice AS DECIMAL(12,2))"
    " * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))"
    " AS DECIMAL(12,4))"
)


@declared_query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (correlated EXISTS -> left-semi join): orders in a
    half-year window with at least one lineitem shipped after the order
    date, counted per priority. The equi key (orderkey) drives the
    shuffle; the date comparison rides along as a join residual — no
    inequality blow-up, no subquery re-scan per row."""
    od = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = od.join(
        li,
        (od.o_orderkey == li.l_orderkey) & (li.l_shipdate > od.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@declared_query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {o_sum_dec('CAST(l_extendedprice AS DECIMAL(12,2))'
                      " * CAST(l_discount AS DECIMAL(4,2))", 4)} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: the pure filter-aggregate. Every predicate is
    scan-pushable (timestamp range, double range, double bound) and the
    projection needs only 4 columns — at 100 TB this is the query where
    pushdown + column pruning ARE the plan; test_plan_shapes pins
    PushedFilters on the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    sel = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    rev = (
        dec("l_extendedprice").cast("decimal(12,2)")
        * dec("l_discount").cast("decimal(4,2)")
    ).cast("decimal(18,4)")
    return sel.agg(
        F.sum(rev).cast("decimal(38,2)").cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@declared_query(
    "q7_nation_trade",
    oracle=f"""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INT) AS ship_year,
           {o_sum_dec(_O_DISC_PRICE, 4)} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ns ON s_nationkey = ns.n_nationkey
    JOIN nation nc ON c_nationkey = nc.n_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND ns.n_nationkey <> nc.n_nationkey
    GROUP BY 1, 2, 3
    """,
)
def q7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (nation-pair trade flows): 5-way join where every
    dimension (supplier, nation x2, customer) is broadcast so the only
    shuffle on the fact side is the lineitem<->orders equi join + the
    final partial-aggregated groupBy. Cross-nation filter keeps the
    diagonal out."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    na = load_table(spark, sf_dir, "nation")
    ns = na.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    nc = na.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(ns), su.s_nationkey == ns.ns_key)
        .join(F.broadcast(nc), cu.c_nationkey == nc.nc_key)
        .filter(F.col("ns_key") != F.col("nc_key"))
    )
    return joined.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").alias("ship_year"),
    ).agg(F.sum(_disc_price()).cast("decimal(38,2)").cast("double").alias("revenue"))


@declared_query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {o_sum_dec(_O_DISC_PRICE, 4)} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (top returned-revenue customers): fact-fact equi join on
    orderkey, broadcast customer-dim + nation, one aggregation, then a
    global top-20 that Catalyst executes as TakeOrderedAndProject (no full
    sort). Revenue ties break on custkey so LIMIT membership is
    deterministic vs the oracle."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    od = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    cu = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    na = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    agg = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cu), od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_disc_price()).cast("decimal(38,2)").cast("double").alias("revenue"))
    )
    return agg.orderBy(F.desc("revenue"), "c_custkey").limit(20)


@declared_query(
    "q14_promo_effect",
    oracle=f"""
    SELECT CAST(ROUND(
        100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                              THEN {_O_DISC_PRICE}
                              ELSE CAST(0 AS DECIMAL(12,4)) END)
                  AS DOUBLE)
        / CAST(SUM({_O_DISC_PRICE}) AS DOUBLE), 6) AS DOUBLE)
        AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promo revenue share): broadcast the part dim into a
    month of lineitem, conditional decimal sums, one ratio. Both sums are
    exact decimals, so the final double division is bit-identical to the
    oracle's."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    pa = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    dp = _disc_price()
    zero = F.lit(0).cast("decimal(12,4)")
    joined = li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
    return joined.agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", dp).otherwise(zero))
            .cast("double")
            / F.sum(dp).cast("double"),
            6,
        ).alias("promo_revenue_pct")
    )


@declared_query(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey AS suppkey, {o_sum_dec(_O_DISC_PRICE, 4)} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY 1
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier by quarterly revenue): the scalar MAX
    subquery becomes a broadcast 1-row aggregate cross-joined back — the
    classic Spark pattern for `= (SELECT MAX(..))` without any driver
    action. Revenue is an exact decimal rendered as double, so equality
    against the max is safe on both engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.sum(_disc_price()).cast("decimal(38,2)").cast("double").alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    su = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__mx"))
        .join(F.broadcast(su), F.col("suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@declared_query(
    "q17_small_quantity",
    oracle="""
    WITH pq AS (
        SELECT l_partkey AS pk,
               0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                      / COUNT(l_quantity)) AS qty_cut
        FROM lineitem GROUP BY 1
    )
    SELECT CAST(ROUND(
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0,
        6) AS DOUBLE) AS avg_yearly,
        CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN pq ON l_partkey = pk
    WHERE p_brand = 'Brand#23' AND l_quantity < qty_cut
    """,
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity revenue): the correlated AVG subquery
    becomes a per-part aggregate joined back on partkey. The per-part
    average table is |part|-sized — broadcast it; lineitem is never
    shuffled twice. The 0.2*avg threshold is the same double on both
    engines (exact decimal sum / count)."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#23"
    ).select("p_partkey")
    pq = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.lit(0.2)
            * (F.sum(dec("l_quantity")).cast("double") / F.count("l_quantity"))
        ).alias("qty_cut")
    )
    sel = (
        li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
        .join(F.broadcast(pq), li.l_partkey == pq.pk)
        .filter(F.col("l_quantity") < F.col("qty_cut"))
    )
    return sel.agg(
        F.round(
            F.sum(dec("l_extendedprice").cast("decimal(12,2)")).cast("double")
            / 7.0,
            6,
        ).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@declared_query(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    GROUP BY 1, 2, 3, 4, 5
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume orders): HAVING on a grouped sum. Spark
    shape: aggregate lineitem by orderkey FIRST (map-side partials cut the
    shuffle), filter > 300, then join the — now tiny — survivor set to
    orders+customer with broadcasts on the shrunken side."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("__sq"))
        .filter(F.col("__sq") > F.lit(300).cast("decimal(18,2)"))
    )
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cu = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        od.join(F.broadcast(big), od.o_orderkey == big.l_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            dec("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("__sq").cast("double").alias("sum_qty"),
        )
    )


@declared_query(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT {o_sum_dec(_O_DISC_PRICE, 4)} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (disjunctive predicate join): three OR'd brand/size/qty
    bands. Catalyst pushes the derivable per-side conjuncts (qty 1-30 on
    lineitem, size 1-15 + brand IN (...) on part) down to the scans and
    evaluates the residual OR after the broadcast join — the shape that
    keeps a 100 TB scan from reading every row group."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#12") & sz.between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & sz.between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & sz.between(1, 15) & q.between(20, 30))
    )
    joined = li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey).filter(cond)
    return joined.agg(
        F.sum(_disc_price()).cast("decimal(38,2)").cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@declared_query(
    "q22_idle_rich_customers",
    oracle="""
    WITH cut AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(c_acctbal) AS avg_bal
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer, cut
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (rich customers with no urgent order — the fixture
    gives every customer *some* order, so the anti-join is against the
    urgent subset to keep the result non-trivial): global scalar AVG as a
    broadcast 1-row cross join, NOT EXISTS as a left-anti join on custkey
    (shuffles only the custkeys of the filtered orders), grouped per
    nation. No driver action anywhere."""
    cu = load_table(spark, sf_dir, "customer")
    od = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    cut = cu.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(dec("c_acctbal")).cast("double") / F.count("c_acctbal")).alias(
            "avg_bal"
        )
    )
    rich = cu.crossJoin(F.broadcast(cut)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    idle = rich.join(od, rich.c_custkey == od.o_custkey, "left_anti")
    return idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(dec("c_acctbal")).cast("double").alias("total_bal"),
    )


@declared_query(
    "q8_market_share",
    oracle=f"""
    WITH vol AS (
        SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
               {_O_DISC_PRICE} AS volume,
               n2.n_name AS supp_nation
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'STANDARD'
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n1.n_regionkey
                     AND r.r_name = 'ASIA'
        WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
          AND o.o_orderdate <= TIMESTAMP '1996-12-31'
    )
    SELECT o_year,
           CAST(ROUND(
               CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume
                             ELSE CAST(0 AS DECIMAL(12,4)) END) AS DOUBLE)
               / CAST(SUM(volume) AS DOUBLE), 6) AS DOUBLE) AS mkt_share,
           CAST(SUM(volume) AS DOUBLE) AS total_volume
    FROM vol
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): of the STANDARD-part revenue
    sold into ASIA-region customers during 1995-1996, the share supplied by
    NATION_2, per order year.

    Scale shape: part/supplier/nation/region are broadcast (dims orders of
    magnitude under lineitem, so the fact table never shuffles for them);
    the ASIA customer set reduces to a semi-join-style membership list
    joined to orders; the single big shuffle is lineitem x orders on
    l_orderkey. The two-legged conditional aggregate (share numerator and
    denominator in one pass) avoids scanning the joined fact twice."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "STANDARD"
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cust = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1996-12-31").cast("timestamp"))
    )

    asia_cust = cust.join(
        F.broadcast(
            nation.join(
                F.broadcast(region.filter(F.col("r_name") == "ASIA")),
                nation.n_regionkey == region.r_regionkey,
            )
        ),
        cust.c_nationkey == nation.n_nationkey,
    ).select("c_custkey")
    asia_orders = od.join(asia_cust, od.o_custkey == asia_cust.c_custkey,
                          "left_semi")

    supp_nation = supp.join(
        F.broadcast(nation),
        supp.s_nationkey == nation.n_nationkey,
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))

    vol = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .join(asia_orders, li.l_orderkey == asia_orders.o_orderkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            _disc_price().alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(12,4)")
    return (
        vol.groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_2",
                           F.col("volume")).otherwise(zero)
                ).cast("double")
                / F.sum("volume").cast("double"),
                6,
            ).alias("mkt_share"),
            F.sum("volume").cast("double").alias("total_volume"),
        )
        .orderBy("o_year")
    )


@declared_query(
    "q13_order_count_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    ) per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): orders per
    customer including zero-order customers (the LEFT OUTER + COUNT(col)
    null-skipping subtlety), then the histogram of those counts. The
    fixture has no o_comment, so the canonical NOT LIKE exclusion is
    dropped — the two-level aggregation shape is what this query pins.

    Scale shape: shuffle 1 on c_custkey (outer join + count ride the same
    exchange), shuffle 2 regroups the per-customer counts — a table the
    size of |customer|, and the second key (c_count) has low cardinality,
    so the second exchange is trivial. No broadcast: at scale both inputs
    are large, and a shuffle join on the shared key is the right call."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    od = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(od, cust.c_custkey == od.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@declared_query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size IN (1, 5, 10, 15, 20)
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type, size)
    with a NOT IN supplier exclusion. The fixture has no partsupp table,
    so the part-supplier relation is the distinct (l_partkey, l_suppkey)
    pairs lineitem witnesses — same shape, surrogate relation; the
    'complaints' exclusion becomes negative-balance suppliers.

    Scale shape: part filter broadcast to the fact scan, exclusion as a
    broadcast left-anti join (6 rows), count(DISTINCT) as the standard
    two-phase distinct aggregate on the group key shuffle."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").isin(1, 5, 10, 15, 20)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@declared_query(
    "q21_waiting_suppliers",
    oracle="""
    WITH omax AS (
        SELECT l_orderkey,
               max(l_shipdate) AS max_ship,
               count(DISTINCT l_suppkey) AS n_supp
        FROM lineitem GROUP BY l_orderkey
    ), at_max AS (
        SELECT l.l_orderkey,
               count(DISTINCT l.l_suppkey) AS n_supp_at_max
        FROM lineitem l JOIN omax m
          ON l.l_orderkey = m.l_orderkey AND l.l_shipdate = m.max_ship
        GROUP BY l.l_orderkey
    )
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM lineitem l1
    JOIN omax m ON l1.l_orderkey = m.l_orderkey
               AND l1.l_shipdate = m.max_ship AND m.n_supp > 1
    JOIN at_max a ON l1.l_orderkey = a.l_orderkey
                 AND a.n_supp_at_max = 1
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
                 AND o.o_orderstatus = 'F'
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): on finished
    multi-supplier orders, count per supplier the lines that were the
    order's LAST shipment while no other supplier shared that final
    shipdate — the EXISTS / NOT-EXISTS double correlation, decorrelated
    into two per-order aggregates (max shipdate + distinct-supplier
    counts) joined back on the order key. The fixture lacks
    l_commitdate/l_receiptdate, so 'late' binds to latest-shipdate.

    Scale shape: all three lineitem derivations and the joins key on
    l_orderkey — one partitioning, reused; supplier is broadcast; no
    correlated re-scan per row."""
    li = load_table(spark, sf_dir, "lineitem")
    omax = li.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("max_ship"),
        F.countDistinct("l_suppkey").alias("n_supp"),
    )
    at_max = (
        li.join(
            omax.select("l_orderkey", "max_ship"),
            ["l_orderkey"],
        )
        .filter(F.col("l_shipdate") == F.col("max_ship"))
        .groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("n_supp_at_max"))
    )
    od = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    l1 = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(omax, ["l_orderkey"])
        .filter(
            (F.col("l_shipdate") == F.col("max_ship")) & (F.col("n_supp") > 1)
        )
        .join(
            at_max.filter(F.col("n_supp_at_max") == 1).select("l_orderkey"),
            ["l_orderkey"],
        )
        .join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    return (
        l1.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


@declared_query(
    "q2_best_supplier_per_part",
    oracle="""
    WITH pairs AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ), europe AS (
        SELECT s.s_suppkey, s.s_name, s.s_acctbal
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
    ), ranked AS (
        SELECT p.l_partkey AS p_partkey, e.s_name, e.s_acctbal,
               row_number() OVER (
                   PARTITION BY p.l_partkey
                   ORDER BY e.s_acctbal DESC, e.s_suppkey) AS rn
        FROM pairs p JOIN europe e ON p.l_suppkey = e.s_suppkey
    )
    SELECT p_partkey, s_name,
           CAST(s_acctbal AS DOUBLE) AS s_acctbal
    FROM ranked WHERE rn = 1
    ORDER BY s_acctbal DESC, p_partkey
    LIMIT 100
    """,
)
def q2_best_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): per part, the best
    EUROPE-region supplier among those that supply it. No partsupp /
    ps_supplycost in the fixture, so the relation is lineitem's distinct
    (part, supplier) pairs and 'best' is max account balance — the shape
    is the canonical correlated argmin/argmax per group, decorrelated as
    a ranking window over the pair join.

    Scale shape: region/nation prune the supplier dim before broadcast;
    the pairs distinct and the ranking window both partition on partkey;
    top-100 is TakeOrderedAndProject."""
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    europe = (
        supp.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation.n_regionkey == region.r_regionkey,
                )
            ),
            supp.s_nationkey == nation.n_nationkey,
        )
        .select("s_suppkey", "s_name", "s_acctbal")
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.desc("s_acctbal"), F.asc("s_suppkey")
    )
    return (
        pairs.join(F.broadcast(europe), pairs.l_suppkey == europe.s_suppkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_name",
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
        )
        .orderBy(F.desc("s_acctbal"), "p_partkey")
        .limit(100)
    )


@declared_query(
    "q20_promo_volume_suppliers",
    oracle="""
    SELECT s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l.l_suppkey
        HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,2))) > 100
    )
    ORDER BY s.s_name
    """,
)
def q20_promo_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (suppliers with significant stock of a part
    class): suppliers whose 1996 shipped volume of PROMO parts exceeds a
    threshold, selected by a semi join against a nested HAVING aggregate
    — availqty is absent, so shipped quantity stands in. The threshold
    sum is DECIMAL so membership can't flip on double addition order.

    Scale shape: part filter broadcast into the fact scan, one shuffle on
    l_suppkey for the HAVING aggregate, then a broadcast semi join into
    the supplier dim."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    promo = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO"
    ).select("p_partkey")
    heavy = (
        li.join(F.broadcast(promo), li.l_partkey == promo.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(dec("l_quantity")).alias("qty"))
        .filter(F.col("qty") > 100)
        .select("l_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        supp.join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_name")
        .orderBy("s_name")
    )


# Q9/Q11 supply-cost surrogate: the fixture has no ps_supplycost, so unit
# cost := 60% of the part's retail price — a deterministic function of
# part, exact in DECIMAL on both engines.
_O_UNIT_COST = (
    "CAST(CAST(p_retailprice AS DECIMAL(12,2))"
    " * CAST(0.60 AS DECIMAL(3,2)) AS DECIMAL(14,4))"
)
_O_LINE_COST = (
    f"CAST({_O_UNIT_COST} * CAST(l_quantity AS DECIMAL(12,2))"
    " AS DECIMAL(18,5))"
)


def _line_cost() -> F.Column:
    unit = (
        dec("p_retailprice").cast("decimal(12,2)")
        * F.lit("0.60").cast("decimal(3,2)")
    ).cast("decimal(14,4)")
    return (unit * dec("l_quantity").cast("decimal(12,2)")).cast(
        "decimal(18,5)"
    )


@declared_query(
    "q9_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           CAST(ROUND(SUM(CAST({_O_DISC_PRICE} AS DECIMAL(18,5))
                    - {_O_LINE_COST}), 2) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%red%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY n.n_name, o_year
    ORDER BY n.n_name, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): per supplier nation per
    order year, sum of revenue minus supply cost over 'red' parts. The
    fixture lacks ps_supplycost, so unit cost is the deterministic
    60%-of-retail surrogate — the plan shape (three broadcast dims, one
    lineitem x orders shuffle, LIKE-filtered part dim pushed into the
    fact scan) is the canonical Q9.

    All arithmetic is exact DECIMAL until the final cast, so the profit
    doubles are bit-identical across engines under any partial-sum
    order."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    supp_nation = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    profit_line = _disc_price().cast("decimal(18,5)") - _line_cost()
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .join(od, li.l_orderkey == od.o_orderkey)
        .select(
            "nation",
            F.year("o_orderdate").alias("o_year"),
            profit_line.alias("line_profit"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("line_profit").cast("decimal(38,2)").cast("double").alias("profit"))
        .orderBy("nation", "o_year")
    )


@declared_query(
    "q11_important_stock",
    oracle=f"""
    WITH pv AS (
        SELECT l.l_partkey, SUM({_O_LINE_COST}) AS val
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = 'NATION_7'
        GROUP BY l.l_partkey
    )
    SELECT l_partkey, CAST(val AS DOUBLE) AS stock_value
    FROM pv
    WHERE val > (SELECT SUM(val) * CAST(0.001 AS DECIMAL(6,4)) FROM pv)
    ORDER BY stock_value DESC, l_partkey
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-part stock value for one
    nation's suppliers, kept when above a FRACTION OF THE GLOBAL TOTAL —
    the distinctive scalar-subquery HAVING, expressed as a broadcast
    1-row aggregate cross join (never a driver-side collect). Stock
    value uses the Q9 surrogate (60%-of-retail x shipped quantity);
    values and the threshold stay exact DECIMAL through the comparison,
    so membership cannot flip on float addition order."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice"
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_7"
    )
    nat_supp = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    ).select("s_suppkey")
    pv = (
        li.join(nat_supp, li.l_suppkey == nat_supp.s_suppkey, "left_semi")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_partkey")
        .agg(F.sum(_line_cost()).alias("val"))
    )
    total = pv.agg(
        (F.sum("val") * F.lit("0.001").cast("decimal(6,4)")).alias(
            "threshold"
        )
    )
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("val") > F.col("threshold"))
        .select(
            "l_partkey", F.col("val").cast("double").alias("stock_value")
        )
        .orderBy(F.desc("stock_value"), "l_partkey")
    )

"""Statistical-governance declared queries (round 6, thirty-first
batch — [north-star] scope): the integrity layer that keeps a
dashboard honest — elastic sharding, confounding detection,
point-in-time reconstruction, multiple-testing control, and rate
standardization.

  * ``consistent_hash_rebalance`` (X287) — a 32-vnode consistent-
    hash ring over customer keys: per-shard balance at 8 shards and
    the MEASURED movement when a 9th is added, next to naive
    modulo's movement — the elasticity argument, quantified.
  * ``simpsons_reversal_audit`` (X288) — nations whose pooled
    fulfilled-rate comparison against the rest REVERSES inside
    every market segment — Simpson's paradox detection by exact
    cross-multiplied rate comparisons.
  * ``scd2_asof_snapshot`` (X289) — reconstruct every user's state
    AS OF the event-span midpoint from X49's SCD2 intervals — the
    query-side of slowly-changing dimensions (the build is useless
    if you can't read a point in time back out).
  * ``holm_bonferroni_tests`` (X290) — step-DOWN FWER control over
    25 per-nation two-proportion z-tests, the critical-z ladder
    pasted as literals into BOTH engines.
  * ``benjamini_hochberg_tests`` (X291) — step-UP FDR control over
    the same 25 tests — rejects at least as much as Holm (pinned),
    the standard trade for exploratory dashboards.
  * ``standardized_rates_nations`` (X292) — direct standardization
    of per-nation fulfilled rates onto the GLOBAL segment mix —
    the segment-mix-adjusted league table (the fix for the
    confounding X288 detects).

Determinism: ring positions/assignments/counts are md5-bridge
exact integers; all rate comparisons cross-multiply exact counts;
z statistics and standardization terms stage ROUND(.., 9) into
DECIMAL; rejection ladders compare staged z against literal
constants identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load_table
from .registry import declared_query

_RING_VNODES = 32
_SHARDS_A = 8
_SHARDS_B = 9

# Critical |z| ladders for m = 25 two-sided tests at alpha = 0.05,
# computed offline with Python's statistics.NormalDist().inv_cdf and
# pasted as LITERALS into both engines (the X197 constant-table
# discipline — no engine evaluates an inverse normal).
# Holm step-down: rank k compares against alpha / (2*(m - k + 1)).
_HOLM_CRIT = [
    3.090232306, 3.078088073, 3.065383152, 3.052065202, 3.038074305,
    3.02334144, 3.007786556, 2.991316115, 2.973819901, 2.955166847,
    2.935199469, 2.913726318, 2.890511561, 2.865260239, 2.837596913,
    2.807033768, 2.772921295, 2.734368787, 2.690109527, 2.638257273,
    2.575829304, 2.497705474, 2.3939798, 2.241402728, 1.959963985,
]
# Benjamini-Hochberg step-up: rank k compares against k*alpha / (2m).
_BH_CRIT = [
    3.090232306, 2.878161739, 2.747781385, 2.652069808, 2.575829304,
    2.512144328, 2.45726339, 2.408915546, 2.365618127, 2.326347874,
    2.290367878, 2.257129244, 2.226211769, 2.197286377, 2.170090378,
    2.144410621, 2.12007169, 2.096927429, 2.074854734, 2.053748911,
    2.033520149, 2.014090812, 1.99539331, 1.977368428, 1.959963985,
]


def _sql_array(vals) -> str:
    return "[" + ", ".join(repr(v) for v in vals) + "]"


# ---- X287: consistent-hash rebalance audit -----------------------------------


def _o_ring(n_shards: int, name: str) -> str:
    """Sorted consistent-hash ring as two aligned DuckDB lists."""
    return f"""
    {name}_pts AS (
        SELECT s.s AS shard, v.v AS vnode,
               (('0x' || substr(md5('node|' || CAST(s.s AS VARCHAR)
                    || '|' || CAST(v.v AS VARCHAR)), 1, 12))::BIGINT)
                   AS pos
        FROM (SELECT unnest(generate_series(0, {n_shards - 1})) AS s) s
        CROSS JOIN (SELECT unnest(generate_series(0,
             {_RING_VNODES - 1})) AS v) v
    ), {name} AS (
        SELECT list(pos ORDER BY pos) AS pos_arr,
               list(shard ORDER BY pos) AS shard_arr
        FROM {name}_pts
    )"""


def _o_assign(ring: str) -> str:
    """Successor lookup: shard of the first ring point >= kp (wrap)."""
    return f"""
        CASE WHEN len(list_filter({ring}.pos_arr, p -> p < k.kp))
                  >= len({ring}.pos_arr)
             THEN {ring}.shard_arr[1]
             ELSE {ring}.shard_arr[
                 len(list_filter({ring}.pos_arr, p -> p < k.kp)) + 1]
        END"""


@declared_query(
    "consistent_hash_rebalance",
    oracle=f"""
    WITH keys AS (
        SELECT c_custkey AS key,
               (('0x' || substr(md5('key|' || CAST(c_custkey
                    AS VARCHAR)), 1, 12))::BIGINT) AS kp
        FROM customer
    ), {_o_ring(_SHARDS_A, "ring_a")}, {_o_ring(_SHARDS_B, "ring_b")},
    assigned AS (
        SELECT k.key, k.kp,
               {_o_assign("ring_a")} AS shard_a,
               {_o_assign("ring_b")} AS shard_b,
               k.key % {_SHARDS_A} AS mod_a,
               k.key % {_SHARDS_B} AS mod_b
        FROM keys k CROSS JOIN ring_a CROSS JOIN ring_b
    ), loads AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(SUM(CASE WHEN shard_a <> shard_b
                        THEN 1 ELSE 0 END) AS BIGINT) AS ch_moved,
               CAST(SUM(CASE WHEN mod_a <> mod_b
                        THEN 1 ELSE 0 END) AS BIGINT) AS mod_moved,
               CAST(MAX(load_a) AS BIGINT) AS max_load_a,
               CAST(MIN(load_a) AS BIGINT) AS min_load_a
        FROM (
            SELECT a.*, COUNT(*) OVER (PARTITION BY a.shard_a)
                       AS load_a
            FROM assigned a
        )
    )
    SELECT n_keys, ch_moved, mod_moved,
           CAST(ROUND(CAST(ch_moved AS DOUBLE) / n_keys, 6)
                AS DOUBLE) AS ch_moved_share,
           CAST(ROUND(CAST(mod_moved AS DOUBLE) / n_keys, 6)
                AS DOUBLE) AS mod_moved_share,
           max_load_a, min_load_a,
           CAST(ROUND(CAST(max_load_a AS DOUBLE) / min_load_a, 6)
                AS DOUBLE) AS balance_ratio
    FROM loads
    """,
)
def consistent_hash_rebalance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X287: the consistent-hashing elasticity audit — place
    customer keys on a 32-vnode-per-shard md5 ring at 8 shards,
    add a 9th, and MEASURE what moved: consistent hashing moves
    ≈ 1/9 of keys (only those falling into the new shard's arcs)
    where naive modulo sharding moves ≈ 8/9 — the property that
    makes elastic resharding affordable, emitted as data next to
    the 8-shard balance ratio (vnodes trade perfect balance for
    elasticity; the ratio quantifies the price). This is the
    partitioning-layer governance tool for any stateful service
    the pipeline feeds.

    Exactness: ring/key positions are 48-bit md5-bridge integers;
    the successor lookup is exact array arithmetic over the sorted
    256/288-point ring (broadcast to every key — never a key×ring
    join); all shares divide once, rounded 6."""
    cust = load_table(spark, sf_dir, "customer")
    keys = cust.select(
        F.col("c_custkey").alias("key"),
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.lit("key"), F.col("c_custkey").cast("string")
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("kp"),
    )

    def ring(n_shards, suffix):
        pts = (
            spark.range(n_shards)
            .select(F.col("id").alias("shard"))
            .crossJoin(
                spark.range(_RING_VNODES).select(
                    F.col("id").alias("vnode")
                )
            )
            .select(
                "shard",
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                "|",
                                F.lit("node"),
                                F.col("shard").cast("string"),
                                F.col("vnode").cast("string"),
                            )
                        ),
                        1,
                        12,
                    ),
                    16,
                    10,
                )
                .cast("bigint")
                .alias("pos"),
            )
        )
        return pts.agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "shard"))
            ).alias(f"ring_{suffix}")
        )

    def assign(ring_col, kp_col):
        arr = F.col(ring_col)
        idx = F.size(
            F.filter(arr, lambda p: p["pos"] < F.col(kp_col))
        )
        return F.when(
            idx >= F.size(arr), F.element_at(arr, 1)["shard"]
        ).otherwise(F.element_at(arr, idx + 1)["shard"])

    assigned = (
        keys.crossJoin(F.broadcast(ring(_SHARDS_A, "a")))
        .crossJoin(F.broadcast(ring(_SHARDS_B, "b")))
        .select(
            "key",
            assign("ring_a", "kp").alias("shard_a"),
            assign("ring_b", "kp").alias("shard_b"),
            (F.col("key") % _SHARDS_A).alias("mod_a"),
            (F.col("key") % _SHARDS_B).alias("mod_b"),
        )
    )
    w_load = Window.partitionBy("shard_a")
    loaded = assigned.withColumn(
        "load_a", F.count(F.lit(1)).over(w_load)
    )
    agg = loaded.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum(
            F.when(F.col("shard_a") != F.col("shard_b"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("ch_moved"),
        F.sum(
            F.when(F.col("mod_a") != F.col("mod_b"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("mod_moved"),
        F.max("load_a").cast("bigint").alias("max_load_a"),
        F.min("load_a").cast("bigint").alias("min_load_a"),
    )
    return agg.select(
        "n_keys",
        "ch_moved",
        "mod_moved",
        F.round(
            F.col("ch_moved").cast("double") / F.col("n_keys"), 6
        ).alias("ch_moved_share"),
        F.round(
            F.col("mod_moved").cast("double") / F.col("n_keys"), 6
        ).alias("mod_moved_share"),
        "max_load_a",
        "min_load_a",
        F.round(
            F.col("max_load_a").cast("double") / F.col("min_load_a"),
            6,
        ).alias("balance_ratio"),
    )


# ---- X288: Simpson's paradox audit -----------------------------------------------


@declared_query(
    "simpsons_reversal_audit",
    oracle="""
    WITH rows_ AS (
        SELECT c.c_nationkey AS nation, c.c_mktsegment AS seg,
               CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), cells AS (
        SELECT nation, seg, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS f
        FROM rows_ GROUP BY 1, 2
    ), segtot AS (
        SELECT seg, CAST(SUM(n) AS BIGINT) AS tn,
               CAST(SUM(f) AS BIGINT) AS tf
        FROM cells GROUP BY seg
    ), nattot AS (
        SELECT nation, CAST(SUM(n) AS BIGINT) AS nn,
               CAST(SUM(f) AS BIGINT) AS nf
        FROM cells GROUP BY nation
    ), alltot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS an,
               CAST(SUM(f) AS BIGINT) AS af
        FROM cells
    ), within AS (
        SELECT c.nation,
               CAST(COUNT(*) AS BIGINT) AS n_segments,
               CAST(SUM(CASE WHEN c.f * (s.tn - c.n)
                             > (s.tf - c.f) * c.n
                        THEN 1 ELSE 0 END) AS BIGINT) AS seg_higher,
               CAST(SUM(CASE WHEN c.f * (s.tn - c.n)
                             < (s.tf - c.f) * c.n
                        THEN 1 ELSE 0 END) AS BIGINT) AS seg_lower
        FROM cells c JOIN segtot s ON c.seg = s.seg
        GROUP BY c.nation
    )
    SELECT n.nation,
           CAST(ROUND(CAST(n.nf AS DOUBLE) / n.nn, 6) AS DOUBLE)
               AS pooled_rate,
           CAST(ROUND(CAST(a.af - n.nf AS DOUBLE) / (a.an - n.nn), 6)
                AS DOUBLE) AS rest_rate,
           (n.nf * (a.an - n.nn) > (a.af - n.nf) * n.nn)
               AS pooled_higher,
           w.n_segments, w.seg_higher, w.seg_lower,
           ((n.nf * (a.an - n.nn) > (a.af - n.nf) * n.nn)
             AND w.seg_lower = w.n_segments)
           OR ((n.nf * (a.an - n.nn) < (a.af - n.nf) * n.nn)
             AND w.seg_higher = w.n_segments) AS full_reversal
    FROM nattot n
    JOIN within w ON n.nation = w.nation
    CROSS JOIN alltot a
    ORDER BY n.nation
    """,
)
def simpsons_reversal_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X288: Simpson's-paradox detection — for each nation, compare
    its pooled fulfilled rate against the rest of the world AND the
    same comparison inside every market segment; a FULL reversal
    (pooled direction opposite to the within-segment direction in
    EVERY segment) is the textbook confounding signature, and the
    reason X292's standardized rates exist. Every comparison is an
    exact integer cross-multiplication f1·n2 vs f2·n1 — rate
    DIRECTION never rides a float — and the rest-of-world side uses
    complement counts (total − nation) so no self-comparison bias.

    Scale: one combinable (nation, segment) aggregate; everything
    downstream runs on the 25-nation/5-segment grids (1-row total
    crossed, whitelisted)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    rows = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            F.col("c_nationkey").alias("nation"),
            F.col("c_mktsegment").alias("seg"),
            F.when(F.col("o_orderstatus") == "F", 1)
            .otherwise(0)
            .alias("y"),
        )
    )
    cells = rows.groupBy("nation", "seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("f"),
    # consumed 4x (segment totals, nation totals, grand total, within):
    # one fact pass (guide §2.4)
    ).localCheckpoint()
    segtot = cells.groupBy("seg").agg(
        F.sum("n").cast("bigint").alias("tn"),
        F.sum("f").cast("bigint").alias("tf"),
    )
    nattot = cells.groupBy("nation").agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("f").cast("bigint").alias("nf"),
    )
    alltot = cells.agg(
        F.sum("n").cast("bigint").alias("an"),
        F.sum("f").cast("bigint").alias("af"),
    )
    within = (
        cells.join(F.broadcast(segtot), "seg")
        .groupBy("nation")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_segments"),
            F.sum(
                F.when(
                    F.col("f") * (F.col("tn") - F.col("n"))
                    > (F.col("tf") - F.col("f")) * F.col("n"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("seg_higher"),
            F.sum(
                F.when(
                    F.col("f") * (F.col("tn") - F.col("n"))
                    < (F.col("tf") - F.col("f")) * F.col("n"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("seg_lower"),
        )
    )
    pooled_hi = F.col("nf") * (F.col("an") - F.col("nn")) > (
        F.col("af") - F.col("nf")
    ) * F.col("nn")
    pooled_lo = F.col("nf") * (F.col("an") - F.col("nn")) < (
        F.col("af") - F.col("nf")
    ) * F.col("nn")
    return (
        nattot.join(within, "nation")
        .crossJoin(F.broadcast(alltot))
        .select(
            "nation",
            F.round(
                F.col("nf").cast("double") / F.col("nn"), 6
            ).alias("pooled_rate"),
            F.round(
                (F.col("af") - F.col("nf")).cast("double")
                / (F.col("an") - F.col("nn")),
                6,
            ).alias("rest_rate"),
            pooled_hi.alias("pooled_higher"),
            "n_segments",
            "seg_higher",
            "seg_lower",
            (
                (pooled_hi & (F.col("seg_lower") == F.col("n_segments")))
                | (pooled_lo & (F.col("seg_higher") == F.col("n_segments")))
            ).alias("full_reversal"),
        )
        .orderBy("nation")
    )


# ---- X289: SCD2 as-of reconstruction ------------------------------------------------


@declared_query(
    "scd2_asof_snapshot",
    oracle="""
    WITH mid AS (
        SELECT CAST(DATE '1970-01-01'
               + ((date_diff('day', DATE '1970-01-01',
                             CAST(MIN(ts) AS DATE))
                   + date_diff('day', DATE '1970-01-01',
                               CAST(MAX(ts) AS DATE))) // 2)
                 * INTERVAL 1 DAY AS TIMESTAMP) AS t
        FROM events
    ), changes AS (
        SELECT user_id, event_type AS state, ts AS valid_from,
               event_id
        FROM (
            SELECT user_id, event_type, ts, event_id,
                   lag(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev_type
            FROM events
        ) WHERE prev_type IS DISTINCT FROM event_type
    ), versioned AS (
        SELECT user_id, state, valid_from,
               lead(valid_from) OVER (PARTITION BY user_id
                   ORDER BY valid_from, event_id) AS valid_to
        FROM changes
    ), at_mid AS (
        SELECT v.user_id, v.state
        FROM versioned v CROSS JOIN mid
        WHERE v.valid_from <= mid.t
          AND (v.valid_to IS NULL OR v.valid_to > mid.t)
    )
    SELECT state,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM at_mid GROUP BY state ORDER BY state
    """,
)
def scd2_asof_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X289: point-in-time reconstruction from X49's SCD2 dimension —
    every user's state AS OF midnight of the event-span's integer
    midpoint day (exact epoch-day arithmetic — halving a raw
    timestamp risks a half-microsecond convention skew), read by the
    interval predicate valid_from ≤ t < valid_to (open-ended current
    rows via NULL), aggregated to the per-state census. This is the
    QUERY side of slowly-changing dimensions — the build (X49) is
    useless without the as-of read — and it calls the production
    scd2_user_state_history path directly (the X175 discipline:
    audit production code, not a reimplementation). Each user
    matches EXACTLY one interval at any instant inside their span
    (the SCD2 invariant the X49 tests pin), so the census is also a
    partition of the as-of-active users.

    Exactness: the midpoint is exact timestamp arithmetic both
    engines compute identically; interval membership is exact
    comparison; counts exact. Scale: one broadcast 1-row timestamp
    crossed into the interval relation (whitelisted), one
    combinable census."""
    from .pipeline_queries import scd2_user_state_history

    events = load_table(spark, sf_dir, "events")
    # midnight of the integer-midpoint epoch day: exact integer
    # arithmetic on both engines (halving a raw timestamp interval
    # risks a 0.5-microsecond convention difference)
    mid = events.agg(
        F.date_add(
            F.lit("1970-01-01").cast("date"),
            F.expr(
                "(unix_date(CAST(MIN(ts) AS DATE))"
                " + unix_date(CAST(MAX(ts) AS DATE))) DIV 2"
            ).cast("int"),
        )
        .cast("timestamp")
        .alias("t")
    )
    dim = scd2_user_state_history(spark, sf_dir)
    asof = (
        dim.crossJoin(F.broadcast(mid))
        .where(
            (F.col("valid_from") <= F.col("t"))
            & (
                F.col("valid_to").isNull()
                | (F.col("valid_to") > F.col("t"))
            )
        )
        .select("user_id", "state")
    )
    return (
        asof.groupBy("state")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy("state")
    )


# ---- X290/X291: multiple-testing corrections ------------------------------------------


_O_NATION_Z = """
    rows_ AS (
        SELECT c.c_nationkey AS nation,
               CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), nat AS (
        SELECT nation, CAST(COUNT(*) AS BIGINT) AS n1,
               CAST(SUM(y) AS BIGINT) AS f1
        FROM rows_ GROUP BY nation
    ), tot AS (
        SELECT CAST(SUM(n1) AS BIGINT) AS n,
               CAST(SUM(f1) AS BIGINT) AS f
        FROM nat
    ), zs AS (
        SELECT a.nation, a.n1, a.f1,
               t.n - a.n1 AS n2, t.f - a.f1 AS f2,
               CAST(ROUND(
                 abs(CAST(a.f1 AS DOUBLE) / a.n1
                     - CAST(t.f - a.f1 AS DOUBLE) / (t.n - a.n1))
                 / sqrt((CAST(t.f AS DOUBLE) / t.n)
                        * (1 - CAST(t.f AS DOUBLE) / t.n)
                        * (1.0 / a.n1 + 1.0 / (t.n - a.n1))), 9)
                 AS DECIMAL(18,9)) AS az9
        FROM nat a CROSS JOIN tot t
    ), ranked AS (
        SELECT nation, n1, f1, az9,
               row_number() OVER (ORDER BY az9 DESC, nation) AS rk
        FROM zs
    )
"""


@declared_query(
    "holm_bonferroni_tests",
    oracle=f"""
    WITH {_O_NATION_Z}, laddered AS (
        SELECT r.*,
               CAST(({_sql_array(_HOLM_CRIT)})[r.rk] AS DECIMAL(18,9))
                   AS crit9
        FROM ranked r
    ), stepped AS (
        SELECT *,
               MIN(CASE WHEN az9 >= crit9 THEN 1 ELSE 0 END)
                   OVER (ORDER BY rk ROWS UNBOUNDED PRECEDING)
                   AS all_prior_pass
        FROM laddered
    )
    SELECT nation, n1 AS n_orders, f1 AS n_fulfilled,
           CAST(az9 AS DOUBLE) AS abs_z,
           CAST(rk AS BIGINT) AS rank,
           CAST(crit9 AS DOUBLE) AS critical_z,
           (all_prior_pass = 1) AS rejected
    FROM stepped ORDER BY rk
    """,
)
def holm_bonferroni_tests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X290: Holm-Bonferroni step-DOWN correction over 25 per-nation
    two-proportion z-tests (nation fulfilled rate vs rest of world)
    at family-wise alpha = 0.05 — the multiple-testing control a
    25-row dashboard needs before "nation X is significant" means
    anything (raw per-test alpha expects ~1.25 false flags). Rank k
    tests against alpha/(2(m−k+1)); rejection requires EVERY higher
    rank to have rejected too (the step-down running minimum). The
    critical-z ladder is computed offline (stdlib NormalDist) and
    pasted as LITERALS into both engines — no engine evaluates an
    inverse normal (the X197 constant-table discipline).

    Exactness: counts exact; each |z| stages ROUND(.., 9) into
    DECIMAL; the ladder comparison and the step-down are exact
    decimal/integer operations over the 25-row relation
    (whitelisted global windows)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    rows = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            F.col("c_nationkey").alias("nation"),
            F.when(F.col("o_orderstatus") == "F", 1)
            .otherwise(0)
            .alias("y"),
        )
    )
    nat = rows.groupBy("nation").agg(
        F.count(F.lit(1)).cast("bigint").alias("n1"),
        F.sum("y").cast("bigint").alias("f1"),
    )
    tot = nat.agg(
        F.sum("n1").cast("bigint").alias("n"),
        F.sum("f1").cast("bigint").alias("f"),
    )
    p_pool = F.col("f").cast("double") / F.col("n")
    zs = nat.crossJoin(F.broadcast(tot)).select(
        "nation",
        "n1",
        "f1",
        F.round(
            F.abs(
                F.col("f1").cast("double") / F.col("n1")
                - (F.col("f") - F.col("f1")).cast("double")
                / (F.col("n") - F.col("n1"))
            )
            / F.sqrt(
                p_pool
                * (1 - p_pool)
                * (
                    1.0 / F.col("n1")
                    + 1.0 / (F.col("n") - F.col("n1"))
                )
            ),
            9,
        )
        .cast("decimal(18,9)")
        .alias("az9"),
    )
    w_rk = Window.orderBy(F.desc("az9"), F.asc("nation"))
    ladder = F.array(*[F.lit(v) for v in _HOLM_CRIT])
    ranked = zs.select(
        "*", F.row_number().over(w_rk).alias("rk")
    ).withColumn(
        "crit9",
        F.element_at(ladder, F.col("rk")).cast("decimal(18,9)"),
    )
    w_step = Window.orderBy("rk").rowsBetween(
        Window.unboundedPreceding, 0
    )
    stepped = ranked.withColumn(
        "all_prior_pass",
        F.min(
            F.when(F.col("az9") >= F.col("crit9"), 1).otherwise(0)
        ).over(w_step),
    )
    return stepped.select(
        "nation",
        F.col("n1").alias("n_orders"),
        F.col("f1").alias("n_fulfilled"),
        F.col("az9").cast("double").alias("abs_z"),
        F.col("rk").cast("bigint").alias("rank"),
        F.col("crit9").cast("double").alias("critical_z"),
        (F.col("all_prior_pass") == 1).alias("rejected"),
    ).orderBy("rank")


@declared_query(
    "benjamini_hochberg_tests",
    oracle=f"""
    WITH {_O_NATION_Z}, laddered AS (
        SELECT r.*,
               CAST(({_sql_array(_BH_CRIT)})[r.rk] AS DECIMAL(18,9))
                   AS crit9
        FROM ranked r
    ), stepped AS (
        SELECT *,
               MAX(CASE WHEN az9 >= crit9 THEN rk ELSE 0 END)
                   OVER () AS k_star
        FROM laddered
    )
    SELECT nation, n1 AS n_orders, f1 AS n_fulfilled,
           CAST(az9 AS DOUBLE) AS abs_z,
           CAST(rk AS BIGINT) AS rank,
           CAST(crit9 AS DOUBLE) AS critical_z,
           (rk <= k_star) AS rejected
    FROM stepped ORDER BY rk
    """,
)
def benjamini_hochberg_tests(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X291: Benjamini-Hochberg step-UP FDR control over the SAME 25
    per-nation tests as X290 — rank k tests against k·alpha/(2m) and
    EVERY rank up to the largest passing one rejects (the step-up
    running maximum), trading X290's family-wise guarantee for a
    false-discovery-RATE bound and strictly more power: BH's
    rejection set always contains Holm's (pinned in the tests) —
    the standard choice for exploratory dashboards where a few
    controlled false leads beat missing real effects.

    Same machinery and exactness as X290 (shared z CTE, literal
    ladder, staged decimals); only the stepping direction differs."""
    holm = holm_bonferroni_tests(spark, sf_dir)
    ladder = F.array(*[F.lit(v) for v in _BH_CRIT])
    laddered = holm.select(
        "nation",
        "n_orders",
        "n_fulfilled",
        "abs_z",
        "rank",
    ).withColumn(
        "crit9",
        F.element_at(ladder, F.col("rank").cast("int")).cast(
            "decimal(18,9)"
        ),
    )
    w_all = Window.partitionBy()
    stepped = laddered.withColumn(
        "k_star",
        F.max(
            F.when(
                F.col("abs_z").cast("decimal(18,9)")
                >= F.col("crit9"),
                F.col("rank"),
            ).otherwise(0)
        ).over(w_all),
    )
    return stepped.select(
        "nation",
        "n_orders",
        "n_fulfilled",
        "abs_z",
        "rank",
        F.col("crit9").cast("double").alias("critical_z"),
        (F.col("rank") <= F.col("k_star")).alias("rejected"),
    ).orderBy("rank")


# ---- X292: direct standardization ---------------------------------------------------


@declared_query(
    "standardized_rates_nations",
    oracle="""
    WITH rows_ AS (
        SELECT c.c_nationkey AS nation, c.c_mktsegment AS seg,
               CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), cells AS (
        SELECT nation, seg, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS f
        FROM rows_ GROUP BY 1, 2
    ), segw AS (
        SELECT seg, CAST(SUM(n) AS BIGINT) AS sn FROM cells GROUP BY seg
    ), tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS n FROM cells
    ), nations AS (
        SELECT DISTINCT nation FROM cells
    ), dense AS (
        SELECT na.nation, s.seg, s.sn, t.n AS grand_n,
               COALESCE(c.n, 0) AS n, COALESCE(c.f, 0) AS f
        FROM nations na CROSS JOIN segw s CROSS JOIN tot t
        LEFT JOIN cells c ON c.nation = na.nation AND c.seg = s.seg
    ), terms AS (
        SELECT nation,
               CAST(SUM(CASE WHEN n > 0 THEN
                    CAST(ROUND(CAST(sn AS DOUBLE) / grand_n, 9)
                         AS DECIMAL(18,9))
                    * CAST(ROUND(CAST(f AS DOUBLE) / n, 9)
                         AS DECIMAL(18,9))
                    ELSE CAST(0 AS DECIMAL(18,9)) END)
                    AS DECIMAL(38,18)) AS std_rate_x,
               CAST(SUM(n) AS BIGINT) AS nn,
               CAST(SUM(f) AS BIGINT) AS nf
        FROM dense GROUP BY nation
    )
    SELECT nation,
           CAST(ROUND(CAST(nf AS DOUBLE) / nn, 6) AS DOUBLE)
               AS crude_rate,
           CAST(ROUND(CAST(std_rate_x AS DOUBLE), 6) AS DOUBLE)
               AS standardized_rate,
           CAST(ROUND(CAST(std_rate_x AS DOUBLE)
                      - CAST(nf AS DOUBLE) / nn, 6) AS DOUBLE)
               AS mix_effect
    FROM terms ORDER BY nation
    """,
)
def standardized_rates_nations(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """X292: direct standardization — each nation's fulfilled rate
    recomputed on the GLOBAL segment mix (Σ_seg global_share(seg) ·
    rate(nation, seg)), next to the crude rate and the mix effect
    (their difference): the epidemiology-standard fix for the
    confounding X288 detects — two nations become comparable only
    after their segment compositions are equalized. Empty (nation,
    segment) cells contribute 0 with their weight (the densified
    grid makes the omission explicit — the X205 lesson — rather
    than silently renormalizing).

    Exactness: weights and cell rates each stage ROUND(.., 9) into
    DECIMAL(18,9); their products are exact DECIMAL(38,18) and the
    sum exact; crude/standardized/mix emit with one rounding each.
    Scale: one combinable cell aggregate; the grid is 25×5."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    rows = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            F.col("c_nationkey").alias("nation"),
            F.col("c_mktsegment").alias("seg"),
            F.when(F.col("o_orderstatus") == "F", 1)
            .otherwise(0)
            .alias("y"),
        )
    )
    # catalog-bounded cell table consumed 4x (segment weights, grand
    # total, nation spine, densify join): one fact pass instead of four
    # (16 scans in the r13-before plan, now 2)
    cells = rows.groupBy("nation", "seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("f"),
    ).localCheckpoint()
    segw = cells.groupBy("seg").agg(
        F.sum("n").cast("bigint").alias("sn")
    )
    tot = cells.agg(F.sum("n").cast("bigint").alias("grand_n"))
    nations = cells.select("nation").distinct()
    dense = (
        nations.crossJoin(F.broadcast(segw))
        .crossJoin(F.broadcast(tot))
        .join(cells, ["nation", "seg"], "left")
        .select(
            "nation",
            "seg",
            "sn",
            "grand_n",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            F.coalesce(F.col("f"), F.lit(0)).alias("f"),
        )
    )
    w9 = F.round(
        F.col("sn").cast("double") / F.col("grand_n"), 9
    ).cast("decimal(18,9)")
    r9 = F.round(F.col("f").cast("double") / F.col("n"), 9).cast(
        "decimal(18,9)"
    )
    terms = dense.groupBy("nation").agg(
        F.sum(
            F.when(F.col("n") > 0, w9 * r9).otherwise(
                F.lit(0).cast("decimal(18,9)")
            )
        )
        .cast("decimal(38,18)")
        .alias("std_rate_x"),
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("f").cast("bigint").alias("nf"),
    )
    return terms.select(
        "nation",
        F.round(F.col("nf").cast("double") / F.col("nn"), 6).alias(
            "crude_rate"
        ),
        F.round(F.col("std_rate_x").cast("double"), 6).alias(
            "standardized_rate"
        ),
        F.round(
            F.col("std_rate_x").cast("double")
            - F.col("nf").cast("double") / F.col("nn"),
            6,
        ).alias("mix_effect"),
    ).orderBy("nation")

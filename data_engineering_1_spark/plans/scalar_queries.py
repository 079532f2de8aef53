"""Scalar function surface (SURVEY.md §2.8): date/time, string, math,
conditional, JSON, array/higher-order families over the fixture tables.

REF precedents are the string ops of the extraction pipeline
(regexp_replace/length/trim/substring at src/pdf_extractor.py:30-55,
format strings at src/qa_system.py:34); the rest is [north-star].

Engine-parity notes baked into the oracles:
  - DuckDB year()/length()/instr() return BIGINT where Spark gives INT ->
    explicit INTEGER casts;
  - DuckDB date_trunc returns DATE, Spark TIMESTAMP -> cast;
  - sqrt is IEEE-correctly-rounded (safe raw); ln is not guaranteed across
    libms -> ROUND(.., 6) on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io import load_table
from .registry import declared_query


@declared_query(
    "scalar_datetime_orders",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER)    AS yr,
           CAST(month(o_orderdate) AS INTEGER)   AS mon,
           CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           o_orderdate + INTERVAL 30 DAY AS due_date,
           CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
           CAST(date_diff('day', DATE '1995-01-01',
                          CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_epoch
    FROM orders
    """,
)
def scalar_datetime_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: extract parts, truncate, interval arithmetic,
    day difference."""
    od = load_table(spark, sf_dir, "orders")
    return od.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mon"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since_epoch"),
    )


@declared_query(
    "scalar_string_part",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS name_lower,
           upper(p_brand) AS brand_upper,
           substring(p_name, 1, 8) AS name_prefix,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           CAST(instr(p_type, 'a') AS INTEGER) AS first_a,
           split_part(p_type, ' ', 1) AS type_head,
           concat_ws('-', p_brand, p_type) AS brand_type,
           CAST(length(p_name) AS INTEGER) AS name_len,
           replace(p_name, 'a', '@') AS name_subst,
           reverse(p_brand) AS brand_rev,
           starts_with(p_name, 'a') AS starts_a,
           ends_with(p_type, 'd') AS ends_d
    FROM part
    """,
)
def scalar_string_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case, substring, pad, locate, split, concat, replace,
    reverse, prefix/suffix tests (REF analogs: src/pdf_extractor.py:30-55,
    :101-102, :251)."""
    pa = load_table(spark, sf_dir, "part")
    return pa.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.instr(F.col("p_type"), "a").cast("int").alias("first_a"),
        F.element_at(F.split("p_type", " "), 1).alias("type_head"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").cast("int").alias("name_len"),
        F.replace(F.col("p_name"), F.lit("a"), F.lit("@")).alias("name_subst"),
        F.reverse("p_brand").alias("brand_rev"),
        F.startswith(F.col("p_name"), F.lit("a")).alias("starts_a"),
        F.endswith(F.col("p_type"), F.lit("d")).alias("ends_d"),
    )


@declared_query(
    "scalar_math_conditional",
    oracle="""
    SELECT c_custkey,
           abs(c_acctbal) AS abs_bal,
           CAST(floor(c_acctbal) AS BIGINT) AS floor_bal,
           CAST(ceil(c_acctbal) AS BIGINT) AS ceil_bal,
           sqrt(abs(c_acctbal)) AS sqrt_bal,
           CAST(ROUND(ln(abs(c_acctbal) + 1), 6) AS DOUBLE) AS log_bal,
           c_acctbal * c_acctbal AS bal_sq,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS bal_band,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_masked
    FROM customer
    """,
)
def scalar_math_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math + conditional family: abs/floor/ceil/sqrt/ln, CASE WHEN,
    coalesce+nullif."""
    cu = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return cu.select(
        "c_custkey",
        F.abs(bal).alias("abs_bal"),
        F.floor(bal).cast("bigint").alias("floor_bal"),
        F.ceil(bal).cast("bigint").alias("ceil_bal"),
        F.sqrt(F.abs(bal)).alias("sqrt_bal"),
        F.round(F.log(F.abs(bal) + 1), 6).alias("log_bal"),
        (bal * bal).alias("bal_sq"),
        F.when(bal < 0, "debt")
        .when(bal < 5000, "mid")
        .otherwise("high")
        .alias("bal_band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER"))
        .alias("seg_masked"),
    )


@declared_query(
    "json_extract_events",
    oracle="""
    SELECT event_id,
           CAST(props->>'$.k' AS INTEGER) AS k_int,
           json_extract_string(props, '$.k') AS k_str
    FROM events
    """,
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family over events.props ('{"k": <int>}'): typed extraction via
    from_json (schema'd, vectorized) and string extraction via
    get_json_object."""
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json(
        F.col("props"), T.StructType([T.StructField("k", T.IntegerType())])
    )
    # one from_json parse feeds both outputs — get_json_object would parse
    # the document a second time per row (measured 2x on the bench)
    ev = ev.withColumn("__p", parsed)
    return ev.select(
        "event_id",
        F.col("__p.k").alias("k_int"),
        F.col("__p.k").cast("string").alias("k_str"),
    )


@declared_query(
    "array_ops_documents",
    oracle="""
    WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
    )
    SELECT doc_id,
           CAST(len(tokens) AS INTEGER) AS n_tokens,
           tokens[1] AS first_token,
           tokens[-1] AS last_token,
           list_contains(tokens, 'data') AS has_data,
           list_sort(tokens)[1] AS min_token,
           array_to_string(list_sort(tokens)[1:3], '|') AS top3_sorted
    FROM tok
    """,
)
def array_ops_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family: size, element_at (incl. negative index), contains,
    sort, slice, join — over tokenized document text."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = F.split(F.col("text"), " ")
    sorted_tokens = F.array_sort(tokens)
    return docs.select(
        "doc_id",
        F.size(tokens).cast("int").alias("n_tokens"),
        F.element_at(tokens, 1).alias("first_token"),
        F.element_at(tokens, -1).alias("last_token"),
        F.array_contains(tokens, "data").alias("has_data"),
        F.element_at(sorted_tokens, 1).alias("min_token"),
        F.array_join(F.slice(sorted_tokens, 1, 3), "|").alias("top3_sorted"),
    )


@declared_query(
    "format_context_strings",
    oracle="""
    SELECT doc_id,
           printf('[来源%d: 文档《%s》第%d段]', CAST(doc_id AS INTEGER), source,
                  CAST(doc_id % 10 AS INTEGER)) AS citation
    FROM documents
    WHERE doc_id < 100
    """,
)
def format_context_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REF Q1/Q2 citation formatting (src/qa_system.py:34 template
    '[来源{i}: 文档《{source}》第{page}页第{paragraph}段]') via
    format_string."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return docs.select(
        "doc_id",
        F.format_string(
            "[来源%d: 文档《%s》第%d段]",
            F.col("doc_id").cast("int"),
            F.col("source"),
            (F.col("doc_id") % 10).cast("int"),
        ).alias("citation"),
    )


@declared_query(
    "map_ops_events",
    oracle="""
    SELECT event_id,
           array_to_string(list_sort(json_keys(props)), ',') AS prop_keys,
           CAST(len(json_keys(props)) AS INTEGER) AS n_props,
           CAST(props->>'k' AS INTEGER) AS k_val,
           CAST(props->>'k' IS NOT NULL AS BOOLEAN) AS has_k
    FROM events
    """,
)
def map_ops_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family (§2.8): parse events.props into MAP<STRING,INT> once,
    then map_keys / size / element_at / containment — the typed-map
    counterpart of json_extract_events (same single-parse discipline).

    prop_keys is projected as a sorted comma-joined STRING (not a raw
    array column): the driver's oracle canonicalizer sorts/factorizes
    result columns through pandas, which cannot hash list values — the
    round-1 red row. The typed-map logic is unchanged; only the output
    projection is scalarized."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    ev = ev.withColumn("__m", m)
    return ev.select(
        "event_id",
        F.array_join(F.sort_array(F.map_keys("__m")), ",").alias("prop_keys"),
        F.size(F.map_keys("__m")).cast("int").alias("n_props"),
        F.element_at("__m", "k").alias("k_val"),
        F.element_at("__m", "k").isNotNull().alias("has_k"),
    )


@declared_query(
    "map_explode_events",
    oracle="""
    SELECT event_id, map_key, map_val FROM (
        SELECT event_id, 'day' AS map_key,
               CAST(day(ts) AS INTEGER) AS map_val FROM events
        UNION ALL
        SELECT event_id, 'k', CAST(props->>'k' AS INTEGER) FROM events
        UNION ALL
        SELECT event_id, 'vi', CAST(floor(value) AS INTEGER) FROM events
    ) t
    """,
)
def map_explode_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family (§2.8): EXPLODE of a map — one (key, value) row per map
    entry. The map is constructed in-row with create_map from typed
    columns (day-of-month, the props 'k' value, floored event value), so
    the explode is a pure row fan-out with no shuffle; at scale the only
    cost is the 3x row multiplier, which Spark pipelines inside the same
    stage. The oracle reconstructs the identical rowset as a UNION ALL of
    the three entries (engine-portable: no map type needed on the DuckDB
    side)."""
    ev = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("day"), F.dayofmonth("ts").cast("int"),
        F.lit("k"), F.from_json("props", "map<string,int>")["k"],
        F.lit("vi"), F.floor("value").cast("int"),
    )
    return ev.select(
        "event_id", F.explode(m).alias("map_key", "map_val")
    )


@declared_query(
    "map_hof_events",
    oracle="""
    SELECT event_id,
           'k=' || (props->>'k') AS entries_str,
           CAST(props->>'k' AS INTEGER) AS vals_sum,
           CAST((CAST(props->>'k' AS INTEGER) > 50) AS INTEGER)
             AS n_over_50,
           'K' AS keys_upper,
           CAST(props->>'k' AS INTEGER) * 2 AS k_doubled,
           2 AS n_after_concat
    FROM events
    """,
)
def map_hof_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions (§2.8): map_entries, map_values,
    map_filter, transform_keys, transform_values, map_concat — the full
    HOF-map surface over the single-parse typed map. Every output is
    scalarized (joined strings / counts) for the driver's pandas
    canonicalizer. The oracle derives each value from the known
    single-key {"k": int} structure directly, which keeps it portable
    while still pinning our map kernels to exact values."""
    ev = load_table(spark, sf_dir, "events")
    ev = ev.withColumn("__m", F.from_json("props", "map<string,int>"))
    entries_str = F.array_join(
        F.transform(
            F.map_entries("__m"),
            lambda e: F.concat_ws("=", e["key"], e["value"].cast("string")),
        ),
        ",",
    )
    vals_sum = F.aggregate(
        F.map_values("__m"), F.lit(0), lambda acc, x: acc + x
    )
    n_over_50 = F.size(
        F.map_entries(F.map_filter("__m", lambda k, v: v > 50))
    ).cast("int")
    keys_upper = F.array_join(
        F.sort_array(
            F.map_keys(F.transform_keys("__m", lambda k, v: F.upper(k)))
        ),
        ",",
    )
    k_doubled = F.element_at(
        F.transform_values("__m", lambda k, v: v * 2), "k"
    )
    n_after_concat = F.size(
        F.map_keys(
            F.map_concat("__m", F.create_map(F.lit("t"), F.lit(1)))
        )
    ).cast("int")
    return ev.select(
        "event_id",
        entries_str.alias("entries_str"),
        vals_sum.alias("vals_sum"),
        n_over_50.alias("n_over_50"),
        keys_upper.alias("keys_upper"),
        k_doubled.alias("k_doubled"),
        n_after_concat.alias("n_after_concat"),
    )


@declared_query(
    "nested_json_roundtrip_orders",
    oracle="""
    SELECT o_orderkey,
           o_custkey AS cust_key,
           o_orderstatus AS status,
           o_totalprice AS total_price,
           o_orderpriority AS priority
    FROM orders
    """,
)
def nested_json_roundtrip_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested JSON structs (§2.8): serialize a two-level struct with
    to_json, parse it back with a nested from_json schema, and extract
    leaf fields. The oracle projects the base columns directly — equality
    holds iff the engine's JSON round-trip is lossless (Jackson writes
    doubles in shortest-round-trip form, so the re-parsed double is
    bit-identical). Single from_json parse; both JSON kernels run inside
    one projection, no shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    j = F.to_json(
        F.struct(
            F.col("o_custkey").alias("cust"),
            F.struct(
                F.col("o_orderstatus").alias("st"),
                F.col("o_totalprice").alias("tp"),
                F.col("o_orderpriority").alias("pri"),
            ).alias("meta"),
        )
    )
    parsed = F.from_json(
        j, "struct<cust:bigint, meta:struct<st:string, tp:double, pri:string>>"
    )
    o = orders.withColumn("__p", parsed)
    return o.select(
        "o_orderkey",
        F.col("__p.cust").alias("cust_key"),
        F.col("__p.meta.st").alias("status"),
        F.col("__p.meta.tp").alias("total_price"),
        F.col("__p.meta.pri").alias("priority"),
    )


@declared_query(
    "try_scalar_ops_orders",
    oracle="""
    SELECT o_orderkey,
           CAST(ROUND(o_totalprice / NULLIF(o_orderkey % 5, 0), 6) AS DOUBLE)
               AS safe_ratio,
           TRY_CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS prio_num,
           TRY_CAST(o_orderstatus AS INTEGER) AS status_num
    FROM orders
    """,
)
def try_scalar_ops_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode error-safe scalar family: Spark 4 runs with ANSI ON, so
    division by zero and bad casts THROW unless the try_* forms are used —
    try_divide yields NULL on zero divisors (DuckDB twin: NULLIF), and
    try_cast yields NULL for unparseable input on both engines. Pure
    in-row projection, no shuffle and no sort (the driver's value hash is
    order-insensitive and membership is every row, so a total ORDER BY
    would only add a range exchange).

    Perf note (measured): ``TRY_CAST`` on a column where MOST rows fail
    costs a thrown-and-caught JVM exception PER ROW — 1.40 s vs 0.06 s
    for the bare scan at sf0.1, and at 100 TB an exception storm. The
    status_num cast (status is never numeric) therefore goes through a
    regex pre-filter that OVER-approximates parseability (any string the
    cast could accept matches), so unparseable rows short-circuit to the
    same NULL without ever throwing; parseable rows still take the real
    try_cast, keeping its exact overflow/format semantics."""
    od = load_table(spark, sf_dir, "orders")
    maybe_int = F.col("o_orderstatus").rlike(r"^\s*[+-]?[0-9]+\s*$")
    return od.select(
        "o_orderkey",
        F.round(
            F.try_divide(F.col("o_totalprice"), F.col("o_orderkey") % 5), 6
        ).alias("safe_ratio"),
        F.expr(
            "TRY_CAST(substring(o_orderpriority, 1, 1) AS INT)"
        ).alias("prio_num"),
        F.when(maybe_int, F.expr("TRY_CAST(o_orderstatus AS INT)"))
        .otherwise(F.lit(None).cast("int"))
        .alias("status_num"),
    )


@declared_query(
    "variant_props_events",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT)
               AS sum_k,
           CAST(COUNT(json_extract(props, '$.k')) AS BIGINT) AS n_with_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER)
               AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def variant_props_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VariantType over the semi-structured ``props`` column:
    parse_json -> VARIANT once, then typed try_variant_get extraction.
    Unlike get_json_object (string re-parse per access), VARIANT stores a
    parsed binary encoding — at 100 TB, N field accesses cost one parse,
    and the open schema evolves without migrations. The DuckDB twin uses
    its JSON type; aggregates pin the extracted values."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.try_variant_get(F.parse_json("props"), "$.k", "int").alias("k"),
    )
    return (
        v.groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count("k").alias("n_with_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


_SETOP_STOP = ("the", "a", "of", "and", "to", "in")


@declared_query(
    "array_set_ops_documents",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
    )
    SELECT doc_id,
           CAST(len(list_intersect(t,
                {list(_SETOP_STOP)})) AS INTEGER) AS n_stop_kinds,
           CAST(len(list_distinct(t)) AS INTEGER) AS n_distinct,
           CAST(len(list_distinct(list_filter(t,
                x -> NOT list_contains({list(_SETOP_STOP)}, x))))
                AS INTEGER) AS n_content_kinds
    FROM tok
    """,
)
def array_set_ops_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set-operation family: per document, the count of distinct
    stopword kinds present (array_intersect), distinct token kinds
    (array_distinct), and distinct non-stopword kinds (array_except) —
    emitted as sizes because the two engines order set-op results
    differently (set membership is identical; element order is not part
    of the contract). All in-row, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    stop = F.array(*[F.lit(w) for w in _SETOP_STOP])
    t = F.split(F.lower("text"), " ")
    return docs.select(
        "doc_id",
        F.size(F.array_intersect(t, stop)).cast("int").alias("n_stop_kinds"),
        F.size(F.array_distinct(t)).cast("int").alias("n_distinct"),
        F.size(F.array_except(t, stop)).cast("int").alias("n_content_kinds"),
    )

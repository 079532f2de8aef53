"""Tests for the round-5 pipeline operators (X48-X60): column
profiling, SCD2 state history, threshold heavy hitters, path mining,
anomaly z-scores, snapshot diff, PII redaction, percentile ranks,
OHLC bars, time-weighted averages, benchmark contamination,
readability scoring — plus the two runtime-pruning plan pins
(dynamic partition pruning, runtime bloom filter) that only matter
at scale.

Value parity vs DuckDB is covered by the oracle gate; these tests pin
the semantic invariants and the physical-plan shapes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_1_spark.io import load_table
from data_engineering_1_spark.plans import registry


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    reg = registry.get_queries()

    def run(name):
        return reg[name](spark, sf_dir)

    return run


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------- X48

def test_profile_hash_aggregates_on_pruned_scans(q):
    df = q("profile_orders_columns")
    p = _plan(df)
    # one branch per profiled column, each scan pruned to JUST that
    # column (columnar: same total I/O as one wide scan), and the big
    # per-value aggregation is a HashAggregate with map-side combine —
    # never a SortAggregate over the full input (the multi-DISTINCT
    # single-pass shape degrades to exactly that for string min/max)
    assert p.count("FileScan parquet") == 4
    assert "HashAggregate" in p
    for col in ("o_orderstatus", "o_orderpriority", "o_custkey", "o_totalprice"):
        assert f"ReadSchema: struct<{col}" in p


def test_profile_values(q, spark, sf_dir):
    rows = {r["column_name"]: r for r in q("profile_orders_columns").collect()}
    orders = load_table(spark, sf_dir, "orders")
    n = orders.count()
    assert set(rows) == {
        "o_orderstatus", "o_orderpriority", "o_custkey", "o_totalprice"
    }
    for r in rows.values():
        assert r["n_rows"] == n
        assert r["n_null"] == 0 and r["null_frac"] == 0.0
    assert rows["o_orderstatus"]["n_distinct"] == 3
    assert rows["o_orderstatus"]["min_val"] == "F"
    assert rows["o_orderstatus"]["max_val"] == "P"


# ---------------------------------------------------------------- X49

def test_scd2_invariants(q):
    rows = q("scd2_user_state_history").collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r["version"])
        # versions are consecutive from 1
        assert [r["version"] for r in rs] == list(range(1, len(rs) + 1))
        # exactly one open (current) interval per user, and it's the last
        currents = [r for r in rs if r["is_current"] == 1]
        assert len(currents) == 1 and currents[0] is rs[-1]
        for a, b in zip(rs, rs[1:]):
            # intervals chain: valid_to == next valid_from, no overlap
            assert a["valid_to"] == b["valid_from"]
            assert a["valid_from"] <= a["valid_to"]
            # a change row must actually change state
            assert a["state"] != b["state"]
        assert rs[-1]["valid_to"] is None


def test_scd2_one_shuffle(q):
    # both windows ride one user_id partitioning: a single Exchange
    p = _plan(q("scd2_user_state_history"))
    assert p.count("Exchange") == 1


# ---------------------------------------------------------------- X50

def test_heavy_hitters_threshold_semantics(q):
    rows = q("heavy_hitter_tokens").collect()
    assert rows  # Zipfian corpus must produce hitters
    assert all(r["support"] >= 0.005 for r in rows)
    total = {round(r["n"] / r["support"]) for r in rows}
    # supports are fractions of ONE shared grand total
    assert max(total) - min(total) <= len(rows)  # rounding slack


def test_heavy_hitters_no_driver_collect(q):
    # grand total is a broadcast 1-row aggregate inside the plan
    p = _plan(q("heavy_hitter_tokens"))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p


# ---------------------------------------------------------------- X51

def test_paths_shape(q, spark, sf_dir):
    rows = q("user_event_paths_top30").collect()
    assert 0 < len(rows) <= 30
    ev_types = {
        r["event_type"]
        for r in load_table(spark, sf_dir, "events")
        .select("event_type").distinct().collect()
    }
    for r in rows:
        segs = r["path"].split(">")
        assert 1 <= len(segs) <= 5
        assert set(segs) <= ev_types
        assert r["n_users"] >= 1
    # deterministic membership: top-30 ordering ties broken by path
    ns = [r["n_users"] for r in rows]
    assert ns == sorted(ns, reverse=True)


def test_paths_topk_is_take_ordered(q):
    assert "TakeOrderedAndProject" in _plan(q("user_event_paths_top30"))


# ---------------------------------------------------------------- X52

def test_anomalies_are_anomalous(q, spark, sf_dir):
    rows = q("daily_event_anomalies").collect()
    daily = {
        (r["user_id"], r["event_day"]): r["cnt"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id", F.to_date("ts").alias("event_day"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    for r in rows:
        assert abs(r["z"]) >= 2.0
        # each flagged (user, day) is a real daily count
        assert daily[(r["user_id"], r["event_day"])] == r["cnt"]


# ---------------------------------------------------------------- X53

def test_snapshot_diff_classes(q, spark, sf_dir):
    rows = q("snapshot_diff_orders").collect()
    keys = [
        r["o_orderkey"]
        for r in load_table(spark, sf_dir, "orders")
        .select("o_orderkey").collect()
    ]
    want = {"insert": 0, "delete": 0, "update": 0}
    for k in keys:
        in_old, in_new = k % 7 != 0, k % 5 != 0
        if in_new and not in_old:
            want["insert"] += 1
        elif in_old and not in_new:
            want["delete"] += 1
        elif in_old and in_new and k % 3 == 0:
            want["update"] += 1
    got = {"insert": 0, "delete": 0, "update": 0}
    for r in rows:
        got[r["change_type"]] += 1
        if r["change_type"] == "insert":
            assert r["old_price"] is None and r["new_price"] is not None
        elif r["change_type"] == "delete":
            assert r["new_price"] is None and r["old_price"] is not None
        else:
            assert abs(r["new_price"] - r["old_price"] - 10.0) < 1e-9
    assert got == want


# ---------------------------------------------------------------- X54

def test_pii_redaction_masks_everything(q):
    rows = q("pii_redact_docs").collect()
    assert rows
    for r in rows:
        # synthetic augmentation guarantees >=1 of each PII kind
        assert r["n_emails"] >= 1 and r["n_phones"] >= 1
        assert "[EMAIL]" in r["redacted"] and "[PHONE]" in r["redacted"]
        assert "@example.com" not in r["redacted"]
        assert "+1-555-" not in r["redacted"]


def test_pii_redaction_zero_exchange(q):
    # pure in-row regex codegen: no shuffle anywhere in the plan
    assert "Exchange" not in _plan(q("pii_redact_docs"))


# ------------------------------------------------- X55: runtime pruning

def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """A fact table partitioned on the join key, joined to a dim whose
    filter is on a NON-join column, must plan a dynamic-pruning subquery
    (partitions of the fact are selected at runtime from the dim's
    surviving keys) — the mechanism that turns a 100 TB scan into a
    one-partition scan when the dim filter is selective."""
    fact_dir = str(tmp_path / "orders_by_status")
    orders = load_table(spark, sf_dir, "orders")
    orders.write.partitionBy("o_orderstatus").mode("overwrite").parquet(fact_dir)
    fact = spark.read.parquet(fact_dir)
    dim = spark.createDataFrame(
        [("F", 1), ("O", 2), ("P", 3)], ["o_orderstatus", "grp"]
    ).where(F.col("grp") == 1)
    j = fact.join(dim, "o_orderstatus").groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )
    assert "dynamicpruning" in _plan(j).lower()
    rows = j.collect()
    assert [r["o_orderstatus"] for r in rows] == ["F"]
    n_f = orders.where(F.col("o_orderstatus") == "F").count()
    assert rows[0]["n"] == n_f


def test_runtime_bloom_filter_join(spark, sf_dir):
    """When the build side of a shuffle join is small and selective,
    Spark injects a bloom-filter semi-filter on the probe side
    (might_contain over xxhash64) so probe rows that cannot match are
    dropped BEFORE the shuffle — the row-level complement of DPP. Pin
    that the injection actually fires on this build."""
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").where(
            F.col("o_totalprice") > 400000
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        p = _plan(j)
        assert "might_contain" in p
        assert "bloom_filter_agg" in p
        # and the filtered join still agrees with the broadcast plan
        got = {r["l_returnflag"]: r["n"] for r in j.collect()}
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    want = {
        r["l_returnflag"]: r["n"]
        for r in li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


# ---------------------------------------------------------------- X56

def test_percentile_ranks_bounds(q):
    rows = q("customer_percentile_ranks").collect()
    assert rows
    by_seg: dict = {}
    for r in rows:
        assert 0.0 <= r["pr"] <= 1.0
        assert 0.0 < r["cd"] <= 1.0
        by_seg.setdefault(r["c_mktsegment"], []).append(r)
    for rs in by_seg.values():
        # the last customer in segment order hits both extremes
        assert max(r["pr"] for r in rs) == 1.0 or len(rs) == 1
        assert max(r["cd"] for r in rs) == 1.0


# ---------------------------------------------------------------- X57

def test_ohlc_invariants_and_no_window(q):
    rows = q("ohlc_hourly_values").collect()
    assert rows
    for r in rows:
        assert r["low_val"] <= min(r["open_val"], r["close_val"])
        assert r["high_val"] >= max(r["open_val"], r["close_val"])
        assert r["n"] >= 1
        if r["n"] == 1:
            assert r["open_val"] == r["close_val"]
    # min_by/max_by make this ONE hash aggregate — the row_number
    # formulation (what the oracle must do) would add Window + Sort
    p = _plan(q("ohlc_hourly_values"))
    assert "Window" not in p
    assert "HashAggregate" in p


# ---------------------------------------------------------------- X58

def test_time_weighted_avg_is_bounded_mean(q, spark, sf_dir):
    rows = q("time_weighted_avg_values").collect()
    assert rows
    spans = {
        r["user_id"]: (r["mn"], r["mx"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
        .collect()
    }
    for r in rows:
        mn, mx = spans[r["user_id"]]
        # a weighted mean of observed values stays inside their range
        assert mn - 1e-6 <= r["twa"] <= mx + 1e-6
        assert r["total_dt_us"] > 0 and r["n_intervals"] >= 1


# ---------------------------------------------------------------- X59

def test_contamination_excludes_benchmark_and_bounded(q):
    rows = q("benchmark_contamination").collect()
    for r in rows:
        assert r["doc_id"] % 25 != 0  # benchmark docs never self-report
        assert 0.0 < r["contamination"] <= 1.0
        assert 0 < r["n_hits"] <= r["n_shingles"]


def test_contamination_benchmark_join_is_broadcast(q):
    p = _plan(q("benchmark_contamination"))
    # the benchmark shingle set broadcasts; the corpus is never
    # shuffled for the hit count
    assert "BroadcastHashJoin" in p


# ---------------------------------------------------------------- X60

def test_readability_in_row_zero_exchange(q):
    p = _plan(q("readability_scores_docs"))
    assert "Exchange" not in p


def test_readability_values(q):
    rows = q("readability_scores_docs").collect()
    assert rows
    for r in rows:
        assert r["n_words"] > 0
        assert r["syllables_per_word"] > 0
        expect = round(
            0.39 * r["n_words"]
            + 11.8 * (r["n_vowel_groups"] / r["n_words"])
            - 15.59,
            6,
        )
        assert abs(r["fk_grade"] - expect) < 1e-9


# ------------------------------------------------------- X61 + X62

def test_pseudonymize_tokens_stable_and_opaque(q, spark, sf_dir):
    rows = q("pseudonymize_orders").collect()
    orders = {
        r["o_orderkey"]: r["o_custkey"]
        for r in load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey").collect()
    }
    seen: dict = {}
    for r in rows:
        cust = orders[r["o_orderkey"]]
        tok = r["cust_token"]
        assert len(tok) == 16 and int(tok, 16) >= 0  # hex, truncated
        # same customer -> same token (join-stable pseudonym)
        assert seen.setdefault(cust, tok) == tok
        assert r["price_band"] % 1000 == 0
    # distinct customers -> distinct tokens (no accidental collisions
    # at fixture scale)
    assert len(set(seen.values())) == len(seen)


def test_pseudonymize_zero_exchange(q):
    assert "Exchange" not in _plan(q("pseudonymize_orders"))


def test_k_anonymity_audit_counts(q, spark, sf_dir):
    rows = q("k_anonymity_audit").collect()
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert sum(r["n"] for r in rows) == n_orders
    for r in rows:
        assert (r["n"] >= 10) == (r["k_ok"] == 1)


# ------------------------------------------------------- X64 + X65

def test_radius_pairs_symmetric_exact_once(q):
    rows = q("radius_pairs_customers").collect()
    assert rows  # scrambled points must yield some close pairs
    seen = set()
    for r in rows:
        assert r["id_a"] < r["id_b"]
        assert 0.0 <= r["dist"] <= 0.3
        key = (r["id_a"], r["id_b"])
        assert key not in seen  # grid neighborhood finds each pair ONCE
        seen.add(key)


def test_radius_pairs_no_cartesian(q):
    p = _plan(q("radius_pairs_customers"))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_covariance_upper_triangle_and_diag_positive(q):
    rows = q("embedding_covariance_8d").collect()
    assert len(rows) == 36  # 8*9/2 upper-triangle cells
    for r in rows:
        assert 1 <= r["dim_i"] <= r["dim_j"] <= 8
        if r["dim_i"] == r["dim_j"]:
            assert r["cov"] > 0  # variances are positive


# ------------------------------------------------------- X91 + X92

def test_winsorize_clamps_into_band(q):
    rows = q("winsorize_event_values").collect()
    assert rows
    for r in rows:
        if r["clipped"] == 1:
            assert r["value_w"] != r["value"]
        else:
            assert r["value_w"] == r["value"]
    # clipping must actually fire somewhere on a 1%/99% band
    assert any(r["clipped"] == 1 for r in rows) or len(rows) < 100


def test_sweepline_concurrency_invariants(q, spark, sf_dir):
    rows = {r["event_day"]: r for r in q("max_concurrent_sessions_daily").collect()}
    assert rows
    from data_engineering_1_spark.io import load_table

    users_per_day = {
        r["event_day"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("event_day"))
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for day, r in rows.items():
        # sessions are per (user, day): count equals distinct users
        assert r["n_sessions"] == users_per_day[day]
        # concurrency is bounded by the session count and positive
        assert 1 <= r["max_concurrent"] <= r["n_sessions"]

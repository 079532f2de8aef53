"""X76 mergeable HLL sketches + X77 malformed-record handling.

Sketches are THE 100 TB distinct-count pattern: per-partition/per-day
sketches are tiny, mergeable, and re-aggregable — a rollup table of
sketches answers any-range distinct queries without rescanning facts
(the binary sketch column has no DuckDB twin, so these are test-level
with exactness pins at fixture cardinalities).

Malformed-record modes are the ingestion contract: PERMISSIVE keeps
every row and quarantines failures into the corrupt-record column
(nulling only unparseable fields), DROPMALFORMED silently drops any row
with a parse failure once columns are materialized, FAILFAST aborts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_1_spark.io import load_table


def test_hll_sketches_merge_to_global_estimate(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact_global = ev.select("user_id").distinct().count()
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count_distinct("user_id").alias("exact"),
    )
    rows = per_type.select(
        "event_type",
        F.hll_sketch_estimate("sk").alias("est"),
        "exact",
    ).collect()
    assert rows
    for r in rows:
        # fixture cardinalities sit in HLL's near-exact regime
        assert abs(r["est"] - r["exact"]) <= max(1, r["exact"] * 0.02)
    merged = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).collect()[0]["est"]
    assert abs(merged - exact_global) <= max(1, exact_global * 0.02)


def test_hll_rollup_table_is_reaggregable(spark, sf_dir, tmp_path):
    """The rollup pattern end-to-end: persist per-(day, type) sketches,
    then answer a per-type question by merging STORED sketches only —
    and get the same estimate a direct sketch over the raw facts gives."""
    ev = load_table(spark, sf_dir, "events")
    rollup_path = str(tmp_path / "hll_rollup")
    ev.groupBy(
        F.to_date("ts").alias("event_day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sk")).write.mode(
        "overwrite"
    ).parquet(rollup_path)
    rollup = spark.read.parquet(rollup_path)
    from_rollup = {
        r["event_type"]: r["est"]
        for r in rollup.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()
    }
    direct = {
        r["event_type"]: r["est"]
        for r in ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()
    }
    assert from_rollup == direct  # same sketch state either route


@pytest.fixture()
def messy_json(tmp_path):
    p = tmp_path / "messy.json"
    p.write_text(
        '{"a": 1, "b": "x"}\n'
        '{"a": 2, "b": "y"}\n'
        "not json at all\n"
        '{"a": "oops", "b": "z"}\n'
    )
    return str(p)


def test_permissive_quarantines_corrupt_records(spark, messy_json):
    df = (
        spark.read.schema("a INT, b STRING, _corrupt_record STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(messy_json)
    )
    rows = df.collect()
    assert len(rows) == 4  # nothing dropped
    corrupt = [r for r in rows if r["_corrupt_record"] is not None]
    # both failure kinds quarantined: unparseable line AND type mismatch
    assert {r["_corrupt_record"] for r in corrupt} == {
        "not json at all",
        '{"a": "oops", "b": "z"}',
    }
    # the type-mismatch row still surfaces its parseable fields
    mismatch = next(r for r in corrupt if r["b"] == "z")
    assert mismatch["a"] is None


def test_dropmalformed_keeps_partial_rows(spark, messy_json):
    df = (
        spark.read.schema("a INT, b STRING")
        .option("mode", "DROPMALFORMED")
        .json(messy_json)
    )
    rows = sorted((r["a"], r["b"]) for r in df.collect())
    # BOTH failure kinds are dropped once columns are materialized: the
    # unparseable line and the type-mismatch row. (Caveat worth knowing:
    # a bare count() on this reader can report MORE rows, because count
    # doesn't convert columns and so doesn't discover per-field
    # malformation — never reconcile quarantine counts via count().)
    assert rows == [(1, "x"), (2, "y")]


def test_failfast_raises(spark, messy_json):
    df = (
        spark.read.schema("a INT, b STRING")
        .option("mode", "FAILFAST")
        .json(messy_json)
    )
    with pytest.raises(Exception) as ei:
        df.collect()
    assert "Malformed" in str(ei.value) or "FAILFAST" in str(ei.value)

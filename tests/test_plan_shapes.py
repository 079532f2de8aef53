"""Physical-plan shape assertions — the 100 TB guarantees, pinned.

Correctness tests prove the numbers; these prove the PLANS stay the ones
that survive scale: filters pushed to the parquet scan, dimension joins
broadcast (no sort-merge shuffle), top-k compiled to TakeOrderedAndProject
(no global sort), aggregates with map-side partial combine, and the chunk
fan-out shuffle-free. A regression here is invisible at sf0.01 and fatal
at 100 TB.
"""

from __future__ import annotations

import pytest

from data_engineering_1_spark.plans import registry


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    q = registry.get_queries()

    def get(name: str) -> str:
        df = q[name](spark, sf_dir)
        return df._jdf.queryExecution().executedPlan().toString()

    return get


def test_q5_all_joins_broadcast(plans):
    p = plans("q5_region_revenue")
    assert p.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in p


def test_q5_date_filter_pushed_to_scan(plans):
    p = plans("q5_region_revenue")
    assert "GreaterThanOrEqual(o_orderdate" in p  # inside PushedFilters
    assert "LessThan(o_orderdate" in p


def test_q3_topk_is_take_ordered(plans):
    p = plans("q3_shipping_priority")
    assert "TakeOrderedAndProject" in p  # orderBy+limit, not global sort
    assert "EqualTo(c_mktsegment,BUILDING)" in p  # pushed, not post-scan


def test_cosine_topk_no_shuffle_no_sort(plans):
    p = plans("cosine_topk_vec0")
    assert "TakeOrderedAndProject" in p
    assert "EqualTo(vec_id,0)" in p  # query-vector lookup pushed to scan
    assert "SortMergeJoin" not in p


def test_q1_partial_aggregation(plans):
    p = plans("q1_pricing_summary")
    # partial (map-side) + final HashAggregate pair around one exchange
    assert p.count("HashAggregate") >= 2
    assert p.count("Exchange") <= 2  # agg shuffle (+ AQE read at most)


def test_chunk_docs_is_shuffle_free(plans):
    p = plans("chunk_docs")
    assert "Exchange" not in p  # scan -> filter -> generate -> project only
    assert "Generate" in p  # the posexplode fan-out


def test_word_counts_map_side_combine(plans):
    p = plans("word_counts_top50")
    assert p.count("HashAggregate") >= 2
    assert "TakeOrderedAndProject" in p


def test_scan_prunes_columns(plans):
    # q1 touches 7 of lineitem's 11 columns; the key columns must not
    # reach the parquet scan
    p = plans("q1_pricing_summary")
    scan = next(l for l in p.splitlines() if "FileScan" in l)
    assert "l_quantity" in scan
    for unused in ("l_orderkey", "l_partkey", "l_suppkey"):
        assert unused not in scan

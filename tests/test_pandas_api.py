"""X80: the pandas-on-Spark API layer (pyspark.pandas) — the fourth
front door (SQL, DataFrame, Structured Streaming, pandas API) a user
migrating pandas pipelines expects. Everything below compiles to the
same Catalyst plans as the DataFrame API; the tests pin value parity
against the equivalent native-DataFrame computation, not against
driver-side pandas, so the distributed path is what is verified.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_1_spark.io import load_table

ps = pytest.importorskip("pyspark.pandas")


@pytest.fixture(scope="module", autouse=True)
def _ps_options():
    # allow the couple of ops below that pandas-on-Spark gates behind
    # an explicit opt-in because they materialize on the driver
    ps.set_option("compute.ops_on_diff_frames", True)
    yield
    ps.reset_option("compute.ops_on_diff_frames")


def test_pandas_api_groupby_matches_dataframe(spark, sf_dir):
    pdf = ps.read_parquet(f"{sf_dir}/orders.parquet")
    got = (
        pdf.groupby("o_orderstatus")["o_totalprice"]
        .count()
        .sort_index()
        .to_pandas()
    )
    want = {
        r["o_orderstatus"]: r["n"]
        for r in load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count("o_totalprice").alias("n"))
        .collect()
    }
    assert got.to_dict() == want


def test_pandas_api_merge_matches_join(spark, sf_dir):
    orders = ps.read_parquet(f"{sf_dir}/orders.parquet")
    customer = ps.read_parquet(f"{sf_dir}/customer.parquet")
    merged = orders.merge(
        customer, left_on="o_custkey", right_on="c_custkey", how="inner"
    )
    got = len(merged)
    want = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .count()
    )
    assert got == want


def test_pandas_api_is_lazy_distributed(spark, sf_dir):
    # the pandas facade must still be a Spark plan underneath: the
    # backing DataFrame exposes the same scan Catalyst would build
    pdf = ps.read_parquet(f"{sf_dir}/orders.parquet")
    sdf = pdf._to_spark()
    plan = sdf._jdf.queryExecution().executedPlan().toString()
    assert "FileScan parquet" in plan

"""SparkSession construction tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32); the same
conf block is what we would ship to a 1000-executor cluster, minus the
master URL: AQE on (runtime re-plan, skew-join splitting, partition
coalescing), Arrow on (every pandas_udf / mapInPandas stage is
Arrow-batched), UTC session timezone (parquet timestamps compare cleanly
against the DuckDB oracle), and shuffle partitions sized to the actual
parallelism instead of the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def cpu_count() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "") or os.cpu_count() or 8)
    except ValueError:
        return os.cpu_count() or 8


def get_spark(
    app_name: str = "data_engineering_1_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    If a session already exists (e.g. the driver handed us one), returns it
    untouched — all engine code must therefore not depend on conf being set,
    only benefit from it.
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        return active

    cores = cpu_count()
    parts = shuffle_partitions or cores
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(parts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Wide unrolled kernels (functions.vector.vec_dot_fixed) generate
        # single methods past HotSpot's 8 KB JIT cutoff; without this flag
        # they run in the bytecode interpreter (measured 2.4x slower on
        # the pairwise-cosine query). Extra code cache keeps the JIT from
        # flushing hot compiled query stages.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:-DontCompileHugeMethods -XX:ReservedCodeCacheSize=512m",
        )
        .config(
            "spark.executor.extraJavaOptions",
            "-XX:-DontCompileHugeMethods -XX:ReservedCodeCacheSize=512m",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

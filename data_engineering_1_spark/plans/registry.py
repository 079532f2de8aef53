"""Central registry of declared queries and their DuckDB oracle twins.

Every implemented operator from SURVEY.md §2 lands here as a named query:
a ``(spark, sf_dir) -> DataFrame`` callable plus (when SQL-expressible) an
ANSI-SQL string DuckDB runs over the same parquet tables. The driver
compares row-count + schema + order-insensitive value-hash at sf0.01.

Determinism discipline (SURVEY.md §5, applied in every pair):
  * alias every computed column identically on both sides;
  * money aggregates sum DECIMAL(18,2)-cast inputs (exact, order-independent
    arithmetic) and cast the final value to an explicit decimal type on both
    sides — never hash a free-running double sum;
  * ratios/averages divide the exact decimal sum cast to double by the
    count, then ROUND(.., 6) on both sides;
  * every query has a total deterministic ORDER BY tie-break (the driver
    hash is order-insensitive, but LIMIT/top-k queries need deterministic
    membership).
"""

from __future__ import annotations

import textwrap
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_LOADED = False


def declared_query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as declared query ``name``; ``oracle`` is the DuckDB
    twin (omit for non-SQL-expressible ops -> driver does rows-only)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = textwrap.dedent(oracle).strip()
        return fn

    return deco


def load_all() -> None:
    """Import every plan module (each import registers its queries)."""
    global _LOADED
    if _LOADED:
        return
    from . import (  # noqa: F401
        analytics_queries,
        assurance_queries,
        breadth_queries,
        causal_queries,
        chunking_queries,
        cohort_queries,
        control_queries,
        corpus_queries,
        curation_queries,
        decision_queries,
        dedup_queries,
        dynamics_queries,
        encoding_queries,
        estimator_queries,
        evalops_queries,
        events_queries,
        experiment_queries,
        frontier_queries,
        governance_queries,
        horizon_queries,
        inference_queries,
        instrument_queries,
        integrity_queries,
        linkage_queries,
        market_queries,
        metrics_queries,
        mining_queries,
        mlprep_queries,
        pipeline_queries,
        planning_queries,
        profiling_queries,
        quality_queries,
        recommender_queries,
        relational_queries,
        sampling_queries,
        scalar_queries,
        series_queries,
        similarity_queries,
        sketchops_queries,
        stewardship_queries,
        text_queries,
        tpch_queries,
    )

    _LOADED = True


def get_queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def get_oracles() -> dict[str, str]:
    load_all()
    return dict(ORACLES)

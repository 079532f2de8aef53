"""Pipeline data-quality observation ([north-star] production tooling).

``DataFrame.observe`` attaches named aggregate metrics to a plan that are
computed DURING the action that materializes it — no second scan, no
separate count() job. At 100 TB that difference is the whole point: a
corpus build that also wants "rows in, rows dropped, null rate" cannot
afford to re-run the pipeline per metric. The metrics ride the existing
exchange-free map side of the plan (they are accumulator-style partial
aggregates merged on the driver).

Batch: read results from the ``Observation`` handle after the action.
Streaming: the same ``observe`` call surfaces per-micro-batch metrics in
``StreamingQueryProgress.observedMetrics`` — one mechanism, both runtimes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed_corpus_metrics(
    df: DataFrame,
    text_col: str = "text",
) -> tuple[DataFrame, Observation]:
    """Attach standard corpus-health metrics (row count, null-text count,
    total chars, mean chars) to ``df``. Returns (df, observation); run any
    action on the returned df, then read ``observation.get``."""
    obs = Observation("corpus_metrics")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col(text_col).isNull(), 1).otherwise(0)
        ).alias("n_null_text"),
        F.sum(F.length(text_col)).alias("total_chars"),
        F.avg(F.length(text_col)).alias("mean_chars"),
    )
    return observed, obs


def assert_min_rows(metrics: dict, n: int) -> None:
    """Gate helper: raise if an observed pipeline stage saw < n rows —
    the cheap circuit breaker between 'the filter was wrong' and 'we
    wrote an empty 100 TB table'."""
    if metrics.get("n_rows", 0) < n:
        raise ValueError(
            f"pipeline stage produced {metrics.get('n_rows')} rows, "
            f"expected at least {n}"
        )

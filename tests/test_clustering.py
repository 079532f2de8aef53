"""X67 Lloyd's k-means vs an independent numpy reference.

The operator's claim is algorithmic (same assignments and centroids as
textbook Lloyd from the same deterministic seed) plus physical (the
assignment step never shuffles the vectors). Float summation order
differs between Spark's partial aggregation and numpy, so centroid
coordinates compare under a tolerance and assignments are allowed a
sub-percent boundary-tie disagreement (none observed on the fixture).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from data_engineering_1_spark.io import load_table
from data_engineering_1_spark.operators.clustering import assign, kmeans_lloyd

K, ITERS = 8, 3


def _numpy_lloyd(X, ids, k, iters):
    order = np.argsort(ids)
    cent = X[order[:k]].astype(np.float64)
    for _ in range(iters):
        d = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        lab = d.argmin(axis=1)
        cent = np.array(
            [
                X[lab == j].mean(axis=0) if (lab == j).any() else cent[j]
                for j in range(k)
            ]
        )
    d = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1), d.min(axis=1), cent


def test_kmeans_matches_numpy_reference(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)

    got, _cent = kmeans_lloyd(emb, k=K, n_iter=ITERS)
    got_rows = {r["vec_id"]: (r["label"], r["sq_dist"]) for r in got.collect()}
    want_lab, want_dist, _ = _numpy_lloyd(X, ids, K, ITERS)

    n_mismatch = 0
    for i, vid in enumerate(ids):
        lab, dist = got_rows[int(vid)]
        if lab != want_lab[i]:
            n_mismatch += 1
        else:
            assert abs(dist - want_dist[i]) < 1e-8
    # boundary ties under float-order differences only; none expected
    assert n_mismatch <= len(ids) // 100


def test_kmeans_sse_monotone(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    sses = []
    for it in range(1, ITERS + 1):
        a, _ = kmeans_lloyd(emb, k=K, n_iter=it)
        sses.append(a.agg(F.sum("sq_dist")).collect()[0][0])
    for prev, cur in zip(sses, sses[1:]):
        assert cur <= prev + 1e-9  # Lloyd never increases SSE


def test_kmeans_overflow_component_fails_loudly(spark):
    """ADVICE r5: the non-ANSI double->decimal(38,20) cast NULLs on
    overflow (|v| >= ~1e18) and F.sum would silently skip it, skewing
    the centroid. The update step must instead raise on any overflowed
    component. Under ANSI mode (the Spark 4 default, what the test
    session runs) the cast itself throws NUMERIC_VALUE_OUT_OF_RANGE —
    equally loud; the raise_error guard covers non-ANSI sessions."""
    import pytest

    rows = [(i, [float(i), 1.0]) for i in range(6)]
    rows.append((6, [1e19, 1.0]))  # overflows decimal(38,20)
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    with pytest.raises(
        Exception, match="overflows decimal|NUMERIC_VALUE_OUT_OF_RANGE"
    ):
        a, _ = kmeans_lloyd(df, k=2, n_iter=1)
        a.collect()


def test_kmeans_assignment_never_shuffles_vectors(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    _, cent = kmeans_lloyd(emb, k=K, n_iter=1)
    # materialize the (tiny) centroid table, as the iteration loop
    # conceptually does, so the plan below is JUST the assignment step
    cent_local = spark.createDataFrame(cent.collect(), cent.schema)
    a = assign(emb, cent_local)
    plan = a._jdf.queryExecution().executedPlan().toString()
    # centroids arrive as ONE broadcast row (no shuffle of the vector
    # side to meet them), the vectors are scanned exactly once, and —
    # the regression this test exists for — there is NO hash-partition
    # exchange and no sort-aggregate anywhere: the argmin is in-row
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert plan.count("FileScan parquet") == 1
    # the ONLY exchanges allowed are the k x dim centroid-side preps;
    # the vector table itself must never be hash-partitioned (the old
    # bug re-grouped by (vec_id, embedding) after the cross)
    assert "hashpartitioning(vec_id" not in plan
    assert "hashpartitioning(embedding" not in plan
    assert "SortAggregate" not in plan


def _numpy_lloyd_grid(X, ids, k, iters):
    """Independent integer-grid Lloyd: quantize to the 1e6 grid, exact
    integer distances, half-away-from-zero integer mean."""
    order = np.argsort(ids)
    Q = np.round(X.astype(np.float64) * 1_000_000).astype(np.int64)
    cent = Q[order[:k]].copy()

    def _assign(c):
        d = ((Q[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return d.argmin(axis=1)  # np argmin breaks ties to lowest label

    lab = None
    for _ in range(iters):
        lab = _assign(cent)
        nxt = []
        for j in sorted(set(lab.tolist())):
            s = Q[lab == j].sum(axis=0)
            n = int((lab == j).sum())
            q = np.where(
                s >= 0, (2 * s + n) // (2 * n), -((-2 * s + n) // (2 * n))
            )
            nxt.append(q)
        cent = np.array(nxt, dtype=np.int64)
    return _assign(cent)


def test_kmeans_grid_matches_numpy_grid_reference(spark, sf_dir):
    """The hash-matchable grid variant (VERDICT r11 #3) must agree
    EXACTLY with an independent integer Lloyd — no tolerance, no
    boundary allowance: that exactness is the whole point."""
    from data_engineering_1_spark.operators.clustering import kmeans_lloyd_grid

    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)

    got, _ = kmeans_lloyd_grid(emb, k=K, n_iter=2)
    got_rows = {r["vec_id"]: r["label"] for r in got.collect()}
    want = _numpy_lloyd_grid(X, ids, K, 2)
    assert all(got_rows[int(v)] == want[i] for i, v in enumerate(ids))


def test_kmeans_grid_agrees_with_float_variant(spark, sf_dir):
    """The grid quantization (<=5e-7 per component) must not CHANGE
    the clustering on the fixture — the declared query's oracle
    upgrade (rows-only -> hash-matched) kept the answer."""
    from data_engineering_1_spark.operators.clustering import kmeans_lloyd_grid

    emb = load_table(spark, sf_dir, "embeddings")
    f, _ = kmeans_lloyd(emb, k=K, n_iter=2)
    g, _ = kmeans_lloyd_grid(emb, k=K, n_iter=2)
    fl = {r["vec_id"]: r["label"] for r in f.collect()}
    gl = {r["vec_id"]: r["label"] for r in g.collect()}
    assert fl == gl

"""Vector kernel and similarity operator tests (SURVEY.md §2.4)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from data_engineering_1_spark.functions.vector import (
    cosine_similarity,
    vec_dot,
    vec_norm,
)
from data_engineering_1_spark.operators.similarity import (
    knn_join,
    label_centroids,
    topk_by_cosine,
)

VECS = {
    1: [1.0, 0.0, 0.0, 0.0],
    2: [0.0, 1.0, 0.0, 0.0],   # orthogonal to 1
    3: [2.0, 0.0, 0.0, 0.0],   # parallel to 1
    4: [-1.0, 0.0, 0.0, 0.0],  # opposite of 1
    5: [1.0, 1.0, 0.0, 0.0],   # 45 degrees from 1
    6: [1.0, 0.0, 0.0, 0.0],   # duplicate of 1
}


@pytest.fixture(scope="module")
def vec_df(spark):
    pdf = pd.DataFrame(
        {
            "vec_id": list(VECS),
            "embedding": [np.array(v, dtype=np.float32) for v in VECS.values()],
            "label": [i % 2 for i in VECS],
        }
    )
    return spark.createDataFrame(
        pdf, "vec_id long, embedding array<float>, label int"
    )


def test_kernel_matches_numpy(vec_df):
    rows = vec_df.select(
        "vec_id",
        vec_dot("embedding", "embedding").alias("dot"),
        vec_norm("embedding").alias("norm"),
    ).collect()
    for r in rows:
        v = np.array(VECS[r.vec_id])
        assert r.dot == pytest.approx(float(v @ v), abs=1e-12)
        assert r.norm == pytest.approx(float(np.linalg.norm(v)), abs=1e-12)


def test_known_cosines(spark, vec_df):
    q = vec_df.filter(F.col("vec_id") == 1).select(
        F.col("embedding").alias("query_vec")
    )
    got = {
        r.vec_id: r.cosine_sim
        for r in vec_df.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine_similarity("embedding", "query_vec"), 6).alias(
                "cosine_sim"
            ),
        )
        .collect()
    }
    assert got[1] == 1.0
    assert got[2] == 0.0
    assert got[3] == 1.0
    assert got[4] == -1.0
    assert got[5] == pytest.approx(1 / math.sqrt(2), abs=1e-6)
    assert got[6] == 1.0


def test_topk_deterministic_tiebreak(vec_df):
    """Reference semantics: top_k=5 cosine ranking (vector_store.py:152-175)
    with ties broken by id — ids 1,3,6 all have cosine 1."""
    q = vec_df.filter(F.col("vec_id") == 1).select(
        F.col("embedding").alias("query_vec")
    )
    rows = topk_by_cosine(vec_df, q, k=3).select("vec_id").collect()
    assert [r.vec_id for r in rows] == [1, 3, 6]


def test_knn_join_excludes_self(vec_df):
    queries = vec_df.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = knn_join(vec_df, queries, k=2).collect()
    assert all(r.vec_id != r.query_id for r in out)
    got = {(r.query_id, r.rn): r.vec_id for r in out}
    # query 1's nearest (excluding itself): 3 then 6 (both cos=1, id order)
    assert got[(1, 1)] == 3 and got[(1, 2)] == 6


def test_label_centroids_exact(vec_df):
    cent = {
        (r.label, r.pos): r.centroid_val for r in label_centroids(vec_df).collect()
    }
    # label 1 = vecs 1,3,5 -> mean dim1 = (1+2+1)/3
    assert cent[(1, 1)] == pytest.approx(4 / 3, abs=1e-6)
    # label 0 = vecs 2,4,6 -> mean dim1 = (0-1+1)/3 = 0
    assert cent[(0, 1)] == 0.0


class TestApproxLSH:
    def test_finds_planted_near_dups(self, spark):
        import random

        from data_engineering_1_spark.operators.similarity import (
            approx_neighbor_pairs_lsh,
        )

        rng = random.Random(7)
        base = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(30)]
        rows = [(i, v) for i, v in enumerate(base)]
        # plant: 100+i is a tiny perturbation of i for i in 0..4
        for i in range(5):
            rows.append((100 + i, [x + 0.001 for x in base[i]]))
        df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
        pairs = approx_neighbor_pairs_lsh(df, max_distance=0.1).collect()
        got = {(r.id_a, r.id_b) for r in pairs}
        for i in range(5):
            assert (i, 100 + i) in got
        # no false accepts beyond the planted ones at this radius
        assert all(b - a == 100 for a, b in got)


def test_unrolled_dot_bit_identical_to_fold(vec_df):
    """vec_dot_fixed must produce the exact double vec_dot produces (same
    left-fold addition order), since declared-query oracles assume it."""
    from data_engineering_1_spark.functions.vector import vec_dot_fixed

    rows = vec_df.select(
        vec_dot("embedding", "embedding").alias("fold"),
        vec_dot_fixed("embedding", "embedding", 4).alias("unrolled"),
    ).collect()
    for r in rows:
        assert r.fold == r.unrolled  # bitwise, not approx


class TestBucketedNearDup:
    def _df(self, spark, sizes):
        """Buckets of the given sizes; identical vectors within a bucket."""
        rows = []
        vid = 0
        for bucket, n in enumerate(sizes):
            for _ in range(n):
                rows.append((vid, bucket, [1.0, float(bucket), 0.5, 0.0]))
                vid += 1
        return spark.createDataFrame(
            rows, "vec_id long, label int, embedding array<float>"
        )

    def test_exact_pairs_within_buckets(self, spark):
        from data_engineering_1_spark.operators.similarity import (
            cosine_neardup_pairs_bucketed,
        )

        df = self._df(spark, [3, 2])
        got = cosine_neardup_pairs_bucketed(df, threshold=0.9, dim=4).collect()
        # identical vectors: all within-bucket pairs, cosine 1.0
        pairs = {(r.id_a, r.id_b) for r in got}
        assert pairs == {(0, 1), (0, 2), (1, 2), (3, 4)}
        assert all(r.cosine_sim == pytest.approx(1.0) for r in got)

    def test_max_bucket_rows_excludes_hot_bucket(self, spark):
        from data_engineering_1_spark.operators.similarity import (
            cosine_neardup_pairs_bucketed,
        )

        df = self._df(spark, [5, 2])
        got = cosine_neardup_pairs_bucketed(
            df, threshold=0.9, dim=4, max_bucket_rows=3
        ).collect()
        # bucket 0 (5 rows) is over the cap -> excluded from exact pairing;
        # bucket 1 (2 rows) survives
        assert {(r.id_a, r.id_b) for r in got} == {(5, 6)}


class TestIvfTopkSearch:
    def test_full_probe_equals_exact(self, spark, sf_dir):
        """nprobe = n_clusters must degenerate to exact brute-force top-k
        (the IVF recall guarantee at its boundary)."""
        from pyspark.sql import functions as F

        from data_engineering_1_spark.io import load_table
        from data_engineering_1_spark.operators.similarity import (
            ivf_topk_search,
            topk_by_cosine,
        )

        emb = load_table(spark, sf_dir, "embeddings")
        n_labels = emb.select("label").distinct().count()
        query = emb.filter(F.col("vec_id") == 3).select(
            F.col("embedding").alias("query_vec")
        )
        got = [
            (r.vec_id, r.cosine_sim)
            for r in ivf_topk_search(
                emb, query, k=5, nprobe=n_labels
            ).select("vec_id", "cosine_sim").collect()
        ]
        exp = [
            (r.vec_id, r.cosine_sim)
            for r in topk_by_cosine(emb, query, k=5)
            .select("vec_id", "cosine_sim")
            .collect()
        ]
        assert got == exp

    def test_ivf_knn_join_matches_per_query_search(self, spark, sf_dir):
        """The multi-query form must return, per query, exactly what the
        single-query probed search returns for that query alone — the
        regression this pins: a shared probe ranking that mixes queries
        would return nprobe probes TOTAL instead of nprobe per query."""
        from pyspark.sql import functions as F

        from data_engineering_1_spark.io import load_table
        from data_engineering_1_spark.operators.similarity import (
            ivf_assign,
            ivf_knn_join,
            ivf_topk_search,
            label_centroids,
        )

        emb = load_table(spark, sf_dir, "embeddings")
        cents = label_centroids(emb)
        assign = ivf_assign(emb, cents)
        qids = [0, 7]
        queries = emb.filter(F.col("vec_id").isin(qids)).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        got = ivf_knn_join(
            emb, queries, k=5, nprobe=2, centroids=cents, assignment=assign
        ).toPandas()
        for qid in qids:
            single = ivf_topk_search(
                emb,
                emb.filter(F.col("vec_id") == qid).select(
                    F.col("embedding").alias("query_vec")
                ),
                k=5,
                nprobe=2,
                centroids=cents,
                assignment=assign,
            ).select("vec_id", "cosine_sim").collect()
            exp = [(r.vec_id, r.cosine_sim) for r in single]
            mine = got[got["query_id"] == qid].sort_values("rn")
            assert (
                list(zip(mine["vec_id"], mine["cosine_sim"])) == exp
            ), f"query {qid} diverged from its single-query search"

    def test_build_ivf_index_roundtrip(self, spark, sf_dir, tmp_path):
        """The stored index must read back exactly what the in-query
        build produces (rounded doubles parquet-roundtrip losslessly),
        and a rebuild must be skipped when the tables exist."""
        import os

        from data_engineering_1_spark.io import load_table
        from data_engineering_1_spark.operators.similarity import (
            build_ivf_index,
            ivf_assign,
            label_centroids,
        )

        emb = load_table(spark, sf_dir, "embeddings")
        idx = str(tmp_path / "ivf")
        cent_path, asg_path = build_ivf_index(emb, idx)
        stored_c = {
            (r.label, r.pos): r.centroid_val
            for r in spark.read.parquet(cent_path).collect()
        }
        fresh_c = {
            (r.label, r.pos): r.centroid_val
            for r in label_centroids(emb).collect()
        }
        assert stored_c == fresh_c
        stored_a = {
            r.vec_id: r.assigned_label
            for r in spark.read.parquet(asg_path).collect()
        }
        fresh_a = {
            r.vec_id: r.assigned_label
            for r in ivf_assign(emb, label_centroids(emb)).collect()
        }
        assert stored_a == fresh_a
        mtime = os.path.getmtime(cent_path)
        build_ivf_index(emb, idx)  # second call: no rewrite
        assert os.path.getmtime(cent_path) == mtime
        # same fingerprint: still cached; changed fingerprint (source
        # data regenerated): forced rebuild — stale indexes must die
        build_ivf_index(emb, idx, fingerprint="src-v1")
        m2 = os.path.getmtime(cent_path)
        build_ivf_index(emb, idx, fingerprint="src-v1")
        assert os.path.getmtime(cent_path) == m2
        build_ivf_index(emb, idx, fingerprint="src-v2")
        assert os.path.getmtime(cent_path) > m2

    def test_probed_search_candidates_only_from_probed_clusters(
        self, spark, sf_dir
    ):
        """With nprobe=1 every result must belong to the query's own
        cluster (the probe ranks the query's assigned centroid first)."""
        from pyspark.sql import functions as F

        from data_engineering_1_spark.io import load_table
        from data_engineering_1_spark.operators.similarity import (
            ivf_assign,
            ivf_topk_search,
            label_centroids,
        )

        emb = load_table(spark, sf_dir, "embeddings")
        cents = label_centroids(emb)
        assign = ivf_assign(emb, cents)
        query = emb.filter(F.col("vec_id") == 3).select(
            F.col("embedding").alias("query_vec")
        )
        own_label = (
            assign.filter(F.col("vec_id") == 3).collect()[0].assigned_label
        )
        got = ivf_topk_search(
            emb, query, k=5, nprobe=1, centroids=cents, assignment=assign
        )
        member_labels = {
            r.assigned_label
            for r in got.join(assign, "vec_id").select("assigned_label").collect()
        }
        assert member_labels == {own_label}

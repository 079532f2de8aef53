"""connected_components: label correctness on known graph shapes."""

from __future__ import annotations

import pytest

from data_engineering_1_spark.operators.components import (
    connected_components,
)


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = connected_components(df, **kw).collect()
    return {r.node: r.component for r in got}


class TestConnectedComponents:
    def test_single_edge(self, spark):
        assert _cc(spark, [(1, 2)]) == {1: 1, 2: 1}

    def test_chain_transitivity(self, spark):
        # A-B-C-D-E chain: one component labeled by the minimum, even
        # though the ends never share an edge
        edges = [(1, 2), (2, 3), (3, 4), (4, 5)]
        assert _cc(spark, edges) == {i: 1 for i in range(1, 6)}

    def test_disjoint_clusters(self, spark):
        edges = [(10, 11), (11, 12), (20, 21), (30, 31), (31, 32), (30, 32)]
        got = _cc(spark, edges)
        assert got == {
            10: 10, 11: 10, 12: 10,
            20: 20, 21: 20,
            30: 30, 31: 30, 32: 30,
        }

    def test_edge_direction_irrelevant(self, spark):
        # min id on the dst side still labels the component
        assert _cc(spark, [(5, 1), (5, 3)]) == {1: 1, 3: 1, 5: 1}

    def test_empty_edges(self, spark):
        assert _cc(spark, []) == {}

    def test_long_chain_within_max_iter(self, spark):
        # diameter 12 chain: needs several propagation rounds; min-label
        # propagation moves the label >=1 hop per round
        n = 12
        edges = [(i, i + 1) for i in range(n)]
        got = _cc(spark, edges)
        assert got == {i: 0 for i in range(n + 1)}

    def test_max_iter_exit_raises(self, spark):
        # with max_iter=1 a long chain cannot fully converge — the
        # operator must RAISE, never silently return non-minimal
        # labels (the 30x golden_record_fusion regression: a capped
        # exit shipped 7411 components where the fixpoint has 7391)
        edges = [(i, i + 1) for i in range(6)]
        df = spark.createDataFrame(edges, "src long, dst long")
        with pytest.raises(RuntimeError, match="fixpoint"):
            connected_components(df, max_iter=1).collect()

    def test_deep_chain_beyond_old_cap(self, spark):
        # diameter-60 chain: one-hop propagation needed 60 rounds and
        # returned wrong labels under the old max_iter=25 cap; with
        # per-round pointer-jumping (L(u) <- L(L(u))) the fixpoint
        # lands in O(log diameter) rounds, well inside the default cap
        n = 60
        edges = [(i, i + 1) for i in range(n)]
        got = _cc(spark, edges)
        assert got == {i: 0 for i in range(n + 1)}

    def test_two_deep_chains_distinct_labels(self, spark):
        # two disjoint diameter-40 chains converge to their own minima
        a = [(i, i + 1) for i in range(40)]
        b = [(100 + i, 101 + i) for i in range(40)]
        got = _cc(spark, a + b)
        assert all(got[i] == 0 for i in range(41))
        assert all(got[100 + i] == 100 for i in range(41))

    def test_custom_column_names(self, spark):
        df = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
        rows = connected_components(
            df, src="doc_a", dst="doc_b", node_out="doc_id", comp_out="cid"
        ).collect()
        assert {(r.doc_id, r.cid) for r in rows} == {(1, 1), (2, 1)}

    def test_survivor_selection_composes(self, spark):
        # the downstream dedup idiom: keep node == component
        edges = [(1, 2), (2, 3), (7, 9)]
        df = spark.createDataFrame(edges, "src long, dst long")
        comp = connected_components(df)
        survivors = {
            r.node
            for r in comp.filter(comp.node == comp.component).collect()
        }
        assert survivors == {1, 7}

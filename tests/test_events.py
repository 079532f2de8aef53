"""Event-table semantics that the oracle harness cannot pin.

1. approx_count_distinct (HLL++) has no engine-portable oracle, so the
   declared query `approx_distinct_users` is rows-only; THIS test is its
   correctness anchor — the estimate must sit within the advertised
   relative standard deviation of the exact count.
2. Session-window boundary: an event landing at exactly ``prev_ts + gap``
   must be classified identically by the native ``F.session_window``
   operator and the batch lag+cumsum twin (`sessionize_users`), or the
   streaming and batch paths silently diverge on real data.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_engineering_1_spark.io import load_table
from data_engineering_1_spark.plans.events_queries import sessionize_users

SF_DIR = "/root/testdata/sf0.001"


class TestApproxDistinct:
    def test_within_rsd_of_exact(self, spark):
        """HLL++ estimate per event_type vs exact countDistinct.

        Spark's default rsd is 0.05; HLL++ error is probabilistic, so we
        assert a generous 5-sigma band (25%) — on this fixture the actual
        error is <5%, and the test's job is catching a broken estimator
        (off by orders of magnitude), not re-deriving HLL theory.
        """
        ev = load_table(spark, SF_DIR, "events")
        got = (
            ev.groupBy("event_type")
            .agg(
                F.approx_count_distinct("user_id").alias("approx"),
                F.countDistinct("user_id").alias("exact"),
            )
            .collect()
        )
        assert len(got) > 0
        for r in got:
            assert r.exact > 0
            assert abs(r.approx - r.exact) <= 0.25 * r.exact, (
                r.event_type,
                r.approx,
                r.exact,
            )


class TestSessionBoundary:
    """Events at exactly prev_ts + 30min: native session_window vs the
    lag+cumsum batch twin must agree on session membership."""

    GAP = dt.timedelta(minutes=30)

    def _events(self, spark):
        t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
        rows = [
            # user 1: e0, e1 exactly at t0+gap (the boundary), e2 far away
            (0, t0, 1, "click", 1.0, "{}"),
            (1, t0 + self.GAP, 1, "click", 1.0, "{}"),
            (2, t0 + 10 * self.GAP, 1, "click", 1.0, "{}"),
            # user 2: strictly inside the gap -> always one session
            (3, t0, 2, "click", 1.0, "{}"),
            (4, t0 + self.GAP - dt.timedelta(seconds=1), 2, "click", 1.0, "{}"),
            # user 3: strictly beyond the gap -> always two sessions
            (5, t0, 3, "click", 1.0, "{}"),
            (6, t0 + self.GAP + dt.timedelta(seconds=1), 3, "click", 1.0, "{}"),
        ]
        return spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        )

    def _native_counts(self, spark):
        """Sessions per user under native session_window (batch mode uses
        the same SessionWindow expression the streaming path does)."""
        ev = self._events(spark)
        agg = ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        ).agg(F.count("*").alias("n"))
        return {
            r.user_id: r.n_sessions
            for r in agg.groupBy("user_id")
            .agg(F.count("*").alias("n_sessions"))
            .collect()
        }

    def _twin_counts(self, spark):
        """Sessions per user under the batch lag+cumsum twin, reusing the
        exact expression sessionize_users builds (via a temp view over the
        synthetic events is overkill — inline the same window algebra)."""
        from pyspark.sql import Window

        ev = self._events(spark)
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        prev_ts = F.lag("ts").over(w)
        # STRICT >: an event at exactly prev + gap extends the session,
        # matching native session_window (Spark merges adjacent sessions:
        # MergingSessionsIterator uses start <= current_end). This is the
        # same expression sessionize_users ships.
        new_session = F.when(
            prev_ts.isNull()
            | (F.col("ts") > prev_ts + F.expr("INTERVAL 30 MINUTE")),
            1,
        ).otherwise(0)
        return {
            r.user_id: r.n_sessions
            for r in ev.select(
                "user_id", new_session.alias("ns")
            )
            .groupBy("user_id")
            .agg(F.sum("ns").alias("n_sessions"))
            .collect()
        }

    def test_boundary_event_convention(self, spark):
        """Native session_window DOES absorb an event at exactly
        prev + gap: Spark merges sessions whose windows touch (adjacent
        counts as overlapping), so the boundary event extends the session
        rather than opening a new one. The batch twin must use STRICT >
        in its new-session predicate to match."""
        native = self._native_counts(spark)
        assert native == {1: 2, 2: 1, 3: 2}

    def test_twin_matches_native_at_boundary(self, spark):
        assert self._twin_counts(spark) == self._native_counts(spark)

    def test_declared_query_uses_native_convention(self, spark):
        """sessionize_users (the oracle-paired declared query) must embed
        the same boundary rule; compare its session count per user against
        the native operator on the fixture data, where any drift would
        show up as a different session partitioning."""
        ev = load_table(spark, SF_DIR, "events")
        native = (
            ev.groupBy(
                F.session_window("ts", "30 minutes").alias("w"), "user_id"
            )
            .agg(F.count("*").alias("n"))
            .groupBy("user_id")
            .agg(F.count("*").alias("n_sessions"))
        )
        twin = (
            sessionize_users(spark, SF_DIR)
            .groupBy("user_id")
            .agg(F.count("*").alias("n_sessions"))
        )
        diff = native.alias("a").join(
            twin.alias("b"), "user_id"
        ).filter(F.col("a.n_sessions") != F.col("b.n_sessions"))
        assert diff.count() == 0


class TestApproxQuantiles:
    def test_approx_quantiles_within_tolerance(self, spark):
        """approx_percentile (declared query approx_value_quantiles,
        rows-only) vs the exact per-type percentile. accuracy=1000 bounds
        rank error at 1/1000 of the partition; on the fixture the exact
        and approximate values must land within 2% of the value range."""
        ev = load_table(spark, SF_DIR, "events")
        got = (
            ev.groupBy("event_type")
            .agg(
                F.approx_percentile("value", 0.5, 1000).alias("approx_p50"),
                F.expr("percentile(value, 0.5)").alias("exact_p50"),
                F.max("value").alias("vmax"),
                F.min("value").alias("vmin"),
            )
            .collect()
        )
        assert len(got) == 5
        for r in got:
            tol = 0.02 * (r.vmax - r.vmin)
            assert abs(r.approx_p50 - r.exact_p50) <= tol, r


class TestIntervalJoin:
    def test_matches_naive_theta_join(self, spark):
        """interval_join (bucketed equi + residual) must return exactly
        the pairs of the naive inequality join, for a window that spans
        multiple buckets on the fixture."""
        from data_engineering_1_spark.operators.rangejoin import interval_join

        ev = load_table(spark, SF_DIR, "events")
        left = ev.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("lid"), "user_id", F.col("ts").alias("lts")
        )
        right = ev.filter(F.col("event_type") == "view").select(
            F.col("event_id").alias("rid"),
            "user_id",
            F.col("ts").alias("rts"),
        )
        bucketed = interval_join(
            left, right, on="user_id", left_ts="lts", right_ts="rts",
            lower_s=-7200, upper_s=3600,
        ).select("lid", "rid")
        naive = (
            left.join(right, "user_id")
            .filter(
                (F.col("rts") >= F.col("lts") - F.expr("INTERVAL 7200 SECOND"))
                & (F.col("rts") <= F.col("lts") + F.expr("INTERVAL 3600 SECOND"))
            )
            .select("lid", "rid")
        )
        assert bucketed.exceptAll(naive).count() == 0
        assert naive.exceptAll(bucketed).count() == 0
        assert bucketed.count() == naive.count() > 0

    def test_rejects_outer_joins(self, spark):
        import pytest as _pytest

        from data_engineering_1_spark.operators.rangejoin import interval_join

        ev = load_table(spark, SF_DIR, "events")
        with _pytest.raises(ValueError):
            interval_join(
                ev, ev, on="user_id", left_ts="ts", right_ts="ts",
                lower_s=0, upper_s=10, how="left",
            )

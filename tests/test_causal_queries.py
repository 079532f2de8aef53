"""Round-6 causal/forensic batch (X293-X298) vs independent
pure-Python references — same discipline as
test_governance_queries.py."""

from __future__ import annotations

import collections
import math

import pandas as pd

from data_engineering_1_spark.io import load_table
from data_engineering_1_spark.plans import registry


def _q(name, spark, sf_dir):
    return registry.get_queries()[name](spark, sf_dir).toPandas()


# ---- X293 rdd_price_threshold --------------------------------------------


def test_rdd_intercepts_match_ols(spark, sf_dir):
    out = _q("rdd_price_threshold", spark, sf_dir).iloc[0]
    o = load_table(spark, sf_dir, "orders").toPandas()
    o["x"] = (o.o_totalprice * 100).round().astype(int) - 20_000_000
    o["y"] = (o.o_orderstatus == "F").astype(int)
    o = o[o.x.abs() < 5_000_000]

    def alpha(g):
        n = len(g)
        sx, sy = int(g.x.sum()), int(g.y.sum())
        sxx = sum(int(v) ** 2 for v in g.x)
        sxy = int((g.x * g.y).sum())
        return round((sy * sxx - sx * sxy) / (n * sxx - sx * sx), 9)

    above, below = o[o.x >= 0], o[o.x < 0]
    assert int(out.n_above) == len(above)
    assert int(out.n_below) == len(below)
    aa, ab = alpha(above), alpha(below)
    assert math.isclose(out.rate_at_cutoff_above, aa, abs_tol=1e-9)
    assert math.isclose(out.rate_at_cutoff_below, ab, abs_tol=1e-9)
    assert math.isclose(
        out.discontinuity, round(aa - ab, 6), abs_tol=1e-6
    )
    # placebo property: no threshold rule exists in the generator, so
    # the discontinuity must be small (well under the base rate)
    assert abs(out.discontinuity) < 0.2


# ---- X294 golden_record_fusion ---------------------------------------------


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_golden_record_fuses_clusters(spark, sf_dir):
    # sf0.001's part table has no fuzzy duplicates (the pairs relation
    # is empty — checked below); the fusion semantics are pinned at
    # sf0.01 where 287 clusters exist
    sf_big = "/root/testdata/sf0.01"
    out = _q("golden_record_fusion", spark, sf_big)
    p = load_table(spark, sf_big, "part").toPandas()
    p["cents"] = (p.p_retailprice * 100).round().astype(int)
    # recompute pairs + union-find
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)

    for _, g in p.groupby(["p_brand", "p_size"]):
        rows = list(g.itertuples())
        for i, a in enumerate(rows):
            for b in rows[i + 1 :]:
                if _lev(a.p_name, b.p_name) <= 5:
                    union(a.p_partkey, b.p_partkey)
    clusters = collections.defaultdict(list)
    for k in list(parent):
        clusters[find(k)].append(k)
    for root in list(clusters):
        if root not in clusters[root]:
            clusters[root].append(root)
    multi = {
        r: sorted(set(m)) for r, m in clusters.items() if len(set(m)) >= 2
    }
    assert sorted(out.cluster) == sorted(multi)
    pidx = p.set_index("p_partkey")
    for r in out.itertuples():
        members = pidx.loc[multi[r.cluster]]
        assert int(r.n_members) == len(members)
        votes = collections.Counter(members.p_type)
        expect_type = min(
            votes, key=lambda t: (-votes[t], t)
        )
        assert r.canonical_type == expect_type
        expect_name = sorted(
            members.p_name, key=lambda s: (-len(s), s)
        )[0]
        assert r.canonical_name == expect_name
        assert int(r.min_cents) == int(members.cents.min())
        assert int(r.max_cents) == int(members.cents.max())
        assert int(r.price_spread_cents) == int(
            members.cents.max() - members.cents.min()
        )
    # and the small fixture genuinely has no clusters (the 0-row
    # output at sf0.001 is data, not a bug)
    small = _q("golden_record_fusion", spark, sf_dir)
    ps = load_table(spark, sf_dir, "part").toPandas()
    any_pair = any(
        _lev(a.p_name, b.p_name) <= 5
        for _, g in ps.groupby(["p_brand", "p_size"])
        for i, a in enumerate(list(g.itertuples()))
        for b in list(g.itertuples())[i + 1 :]
    )
    assert len(small) == 0 and not any_pair


# ---- X295 capture_recapture_customers -----------------------------------------


def test_capture_recapture_matches_formulas(spark, sf_dir):
    out = _q("capture_recapture_customers", spark, sf_dir).iloc[0]
    o = load_table(spark, sf_dir, "orders").toPandas()
    o["m"] = pd.to_datetime(o.o_orderdate).dt.to_period("M")
    months = sorted(o.m.unique())[:2]
    s1 = set(o[o.m == months[0]].o_custkey)
    s2 = set(o[o.m == months[1]].o_custkey)
    n1, n2, m = len(s1), len(s2), len(s1 & s2)
    assert (int(out.n1), int(out.n2), int(out.m)) == (n1, n2, m)
    assert int(out.true_total) == len(s1 | s2)
    assert math.isclose(
        out.lincoln_petersen, round(n1 * n2 / m, 6), abs_tol=1e-6
    )
    chapman = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    assert math.isclose(out.chapman, round(chapman, 6), abs_tol=1e-6)
    # theorem-level invariants (a truth band would be wrong here: at
    # sf0.001 the month overlap is m = 1 and the estimator is known
    # to be unstable at tiny recapture counts — the honest readout,
    # and exactly why Chapman's correction exists):
    # LP >= each capture size, and Chapman <= LP for m >= 1
    assert out.lincoln_petersen >= max(n1, n2) - 1e-9
    assert out.chapman <= out.lincoln_petersen + 1e-9
    # both estimators can never undershoot the observed union by
    # more than rounding when m > 0... LP >= n1+n2-m is NOT a
    # theorem; what is: the observed union is a lower bound on the
    # true population, and the report exposes the ratio for the
    # analyst rather than hiding the small-m blowup
    assert out.chapman_vs_truth == round(
        out.chapman / out.true_total, 6
    )


def test_capture_recapture_zero_overlap_is_null(spark, tmp_path):
    """ADVICE r6: when the two capture months share NO buyers (m = 0)
    Lincoln-Petersen is undefined — both engines must emit NULL, not
    inf (DuckDB double division) vs NULL (Spark non-ANSI division).
    Built on a degenerate fixture: two months, disjoint buyer sets."""
    import duckdb

    pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3, 4],
            "o_custkey": [10, 11, 20, 21],
            "o_orderdate": [
                "1995-01-05",
                "1995-01-20",
                "1995-02-03",
                "1995-02-17",
            ],
        }
    ).to_parquet(tmp_path / "orders.parquet")
    out = _q("capture_recapture_customers", spark, str(tmp_path))
    row = out.iloc[0]
    assert (int(row.n1), int(row.n2), int(row.m)) == (2, 2, 0)
    assert pd.isna(row.lincoln_petersen)
    # Chapman stays finite: (2+1)(2+1)/(0+1) - 1 = 8
    assert row.chapman == 8.0
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{tmp_path}/orders.parquet')"
    )
    ddf = con.execute(
        registry.get_oracles()["capture_recapture_customers"]
    ).df()
    drow = ddf.iloc[0]
    assert pd.isna(drow.lincoln_petersen)
    assert drow.chapman == 8.0


# ---- X296 last_digit_uniformity ---------------------------------------------------


def test_last_digit_chi2_matches_counter(spark, sf_dir):
    out = _q("last_digit_uniformity", spark, sf_dir)
    o = load_table(spark, sf_dir, "orders").toPandas()
    digits = ((o.o_totalprice * 100).round().astype(int) % 10)
    counts = digits.value_counts()
    n = len(digits)
    chi2 = sum(
        (int(counts.get(d, 0)) - n / 10) ** 2 / (n / 10)
        for d in range(10)
    )
    sum_o2 = sum(int(counts.get(d, 0)) ** 2 for d in range(10))
    assert sorted(out.digit) == list(range(10))
    for r in out.itertuples():
        assert int(r.n_orders) == int(counts.get(r.digit, 0))
        assert math.isclose(r.chi2, round(chi2, 6), abs_tol=1e-6)
        # the one-division identity
        assert math.isclose(
            r.chi2, round((10 * sum_o2 - n * n) / n, 6), abs_tol=1e-6
        )
        assert bool(r.nonuniform_5pct) == (
            (10 * sum_o2 - n * n) * 100 >= 1692 * n
        )


# ---- X297 odds_ratio_nations ---------------------------------------------------------


def test_odds_ratio_and_woolf_interval(spark, sf_dir):
    out = _q("odds_ratio_nations", spark, sf_dir).set_index("nation")
    o = load_table(spark, sf_dir, "orders").toPandas()
    c = load_table(spark, sf_dir, "customer").toPandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["u"] = j.o_orderpriority.isin(["1-URGENT", "2-HIGH"])
    j["f"] = j.o_orderstatus == "F"
    for nat, g in j.groupby("c_nationkey"):
        a = int((g.u & g.f).sum())
        b = int((g.u & ~g.f).sum())
        cc = int((~g.u & g.f).sum())
        d = int((~g.u & ~g.f).sum())
        r = out.loc[nat]
        assert (int(r.a), int(r.b), int(r.c), int(r.d)) == (a, b, cc, d)
        orr = a * d / (b * cc)
        assert math.isclose(
            r.odds_ratio, round(orr, 6), abs_tol=1e-6
        )
        lnor = round(math.log(orr), 9)
        half = round(
            1.96 * math.sqrt(1 / a + 1 / b + 1 / cc + 1 / d), 9
        )
        assert math.isclose(
            r.or_ci_lo, round(math.exp(lnor - half), 6), abs_tol=1e-6
        )
        assert math.isclose(
            r.or_ci_hi, round(math.exp(lnor + half), 6), abs_tol=1e-6
        )
        assert bool(r.significant) == (
            lnor - half > 0 or lnor + half < 0
        )
        # the interval brackets the point estimate
        assert r.or_ci_lo <= r.odds_ratio <= r.or_ci_hi


# ---- X298 activity_halflife_fit ----------------------------------------------------------


def test_halflife_matches_loglinear_ols(spark, sf_dir):
    out = _q("activity_halflife_fit", spark, sf_dir).iloc[0]
    e = load_table(spark, sf_dir, "events").toPandas()
    e["day"] = pd.to_datetime(e.ts).dt.normalize()
    d0 = e.day.min()
    cohort = set(e[e.day == d0].user_id)
    n0 = len(cohort)
    sub = e[e.user_id.isin(cohort)].copy()
    sub["t"] = (sub.day - d0).dt.days
    act = sub[sub.t >= 1].groupby("t").user_id.nunique()
    pts = [(int(t), round(math.log(int(a) / n0), 9)) for t, a in act.items()]
    n = len(pts)
    sx = sum(t for t, _ in pts)
    sxx = sum(t * t for t, _ in pts)
    sy = sum(l for _, l in pts)
    sxy = sum(t * l for t, l in pts)
    slope = round((n * sxy - sx * sy) / (n * sxx - sx * sx), 9)
    assert int(out.n_days) == n
    assert math.isclose(out.decay_slope, slope, abs_tol=1e-9)
    if slope < 0:
        assert math.isclose(
            out.half_life_days,
            round(-0.693147181 / slope, 6),
            abs_tol=1e-4,
        )
    else:
        assert pd.isna(out.half_life_days)

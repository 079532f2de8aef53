"""Per-query shuffle-byte measurement (VERDICT r13 #5).

Runs named declared queries under a job group with the UI enabled and
sums the stage-level shuffle READ/WRITE bytes + records over exactly
that query's stages — the evidence wall-clock cannot give for the
key-grain rewrites (join_cardinality_audit, referential_coverage_audit)
whose r13 claim was "fewer shuffled BYTES", not fewer exchanges.

Besides every registry query, two built-in NAIVE TWINS reconstruct the
r13-before fact-grain shapes (without touching the declared queries),
so before/after bytes come from one session:

  * ``join_cardinality_audit@factgrain`` — actual join count via the
    fact-grain equi-join (fact rows shuffled through the join).
  * ``referential_coverage_audit@antijoin`` — two anti-joins + parent
    count per FK edge (fact rows shuffled per anti-join).

Usage:
  python tools/shuffle_bytes.py join_cardinality_audit \
      join_cardinality_audit@factgrain --sf /root/testdata/sf0.1 \
      --json shuffle_bytes.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from data_engineering_1_spark.io import load_table  # noqa: E402
from data_engineering_1_spark.plans import registry  # noqa: E402
from data_engineering_1_spark.session import get_spark  # noqa: E402


def _jca_factgrain(spark, sf_dir):
    """r13-before shape of join_cardinality_audit: the actual join
    count comes from the fact-grain equi-join (every fact row crosses
    the exchange), instead of sum(ca*cb) over key-grain aggregates."""
    from data_engineering_1_spark.plans.estimator_queries import (
        _CARD_JOINS,
    )

    out = None
    for ta, ka, tb, kb in _CARD_JOINS:
        A = load_table(spark, sf_dir, ta)
        B = load_table(spark, sf_dir, tb)
        a = A.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_left"),
            F.countDistinct(ka).cast("bigint").alias("da"),
        )
        b = B.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_right"),
            F.countDistinct(kb).cast("bigint").alias("db"),
        )
        j = (
            A.select(F.col(ka).alias("k"))
            .join(B.select(F.col(kb).alias("k")), "k")
            .agg(F.count(F.lit(1)).cast("bigint").alias("actual_rows"))
        )
        est = (
            F.col("n_left").cast("decimal(38,0)") * F.col("n_right")
        ).cast("double") / F.greatest("da", "db")
        st = (
            a.crossJoin(F.broadcast(b))
            .crossJoin(F.broadcast(j))
            .select(
                F.lit(f"{ta}.{ka}={tb}.{kb}").alias("join_expr"),
                "n_left",
                "n_right",
                F.round(est, 6).alias("est_rows"),
                "actual_rows",
                F.round(F.col("actual_rows") / est, 6).alias(
                    "actual_over_est"
                ),
            )
        )
        out = st if out is None else out.unionByName(st)
    return out.orderBy("join_expr")


def _rca_antijoin(spark, sf_dir):
    """r13-before shape of referential_coverage_audit: one anti-join in
    each direction + a parent count per FK edge — child fact rows
    shuffle through every anti-join."""
    from data_engineering_1_spark.plans.stewardship_queries import (
        _FK_EDGES,
    )

    out = None
    for ct, ck, pt, pk in _FK_EDGES:
        child = load_table(spark, sf_dir, ct)
        parent = load_table(spark, sf_dir, pt)
        orphans = (
            child.select(F.col(ck).alias("k"))
            .join(parent.select(F.col(pk).alias("k")), "k", "left_anti")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_orphan_children"))
        )
        childless = (
            parent.select(F.col(pk).alias("k"))
            .join(child.select(F.col(ck).alias("k")), "k", "left_anti")
            .agg(
                F.count(F.lit(1))
                .cast("bigint")
                .alias("n_childless_parents")
            )
        )
        nparents = parent.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parents")
        )
        st = (
            orphans.crossJoin(F.broadcast(childless))
            .crossJoin(F.broadcast(nparents))
            .select(
                F.lit(f"{ct}.{ck}->{pt}.{pk}").alias("fk_edge"),
                "n_orphan_children",
                "n_childless_parents",
                "n_parents",
            )
        )
        out = st if out is None else out.unionByName(st)
    return out.orderBy("fk_edge")


_TWINS = {
    "join_cardinality_audit@factgrain": _jca_factgrain,
    "referential_coverage_audit@antijoin": _rca_antijoin,
}


def _group_stage_totals(spark, group: str) -> dict:
    import urllib.request

    ui = spark.sparkContext.uiWebUrl

    def _get(path: str):
        with urllib.request.urlopen(f"{ui}/api/v1{path}", timeout=10) as r:
            return json.load(r)

    app = _get("/applications")[0]["id"]
    stage_ids = set()
    for job in _get(f"/applications/{app}/jobs"):
        if job.get("jobGroup") == group:
            stage_ids.update(job.get("stageIds", []))
    tot = {
        "n_stages": 0,
        "shuffle_write_bytes": 0,
        "shuffle_write_records": 0,
        "shuffle_read_bytes": 0,
        "input_bytes": 0,
    }
    for st in _get(f"/applications/{app}/stages?status=complete"):
        if st["stageId"] not in stage_ids:
            continue
        tot["n_stages"] += 1
        tot["shuffle_write_bytes"] += st.get("shuffleWriteBytes", 0)
        tot["shuffle_write_records"] += st.get("shuffleWriteRecords", 0)
        tot["shuffle_read_bytes"] += st.get("shuffleReadBytes", 0)
        tot["input_bytes"] += st.get("inputBytes", 0)
    return tot


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--json", help="write records to this path")
    args = ap.parse_args()

    spark = get_spark(
        "shuffle-bytes", extra_conf={"spark.ui.enabled": "true"}
    )
    queries = registry.get_queries()
    out = {}
    for name in args.queries:
        fn = _TWINS.get(name) or queries[name]
        group = f"bytes:{name}"
        spark.sparkContext.setJobGroup(group, name)
        t0 = time.perf_counter()
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 4)
        spark.sparkContext.setJobGroup("", "")
        rec = _group_stage_totals(spark, group)
        rec["wall_sec"] = wall
        out[name] = rec
        print(
            f"{name:48s} write={rec['shuffle_write_bytes']:>12,d}B "
            f"({rec['shuffle_write_records']:,d} rows) "
            f"read={rec['shuffle_read_bytes']:>12,d}B "
            f"stages={rec['n_stages']} wall={wall}s",
            flush=True,
        )
    if args.json:
        with open(args.json, "w") as fh:
            json.dump({"sf": args.sf, "results": out}, fh, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()

"""One arm of a config A/B: measure named declared queries (min-of-N,
noop sink) in a FRESH session built with extra ``--conf k=v`` pairs.

Interleave arms at the shell level (conf / no-conf / conf / no-conf,
each a fresh JVM) and compare the per-query mins — the VERDICT r13 #4
rig for retesting session-wide join/AQE flags on a noisy box.

Usage:
  python tools/ab_conf.py q1 q2 --runs 5 \
      --conf spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=64m
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from data_engineering_1_spark.plans import registry  # noqa: E402
from data_engineering_1_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument(
        "--conf",
        action="append",
        default=[],
        help="extra spark conf, k=v (repeatable)",
    )
    args = ap.parse_args()

    extra = dict(c.split("=", 1) for c in args.conf)
    spark = get_spark("ab-conf", extra_conf=extra or None)
    queries = registry.get_queries()
    out = {}
    for name in args.queries:
        fn = queries[name]
        samples = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(round(time.perf_counter() - t0, 4))
        out[name] = {"min": min(samples), "samples": samples}
    print(
        json.dumps(
            {"sf": args.sf, "conf": extra, "runs": args.runs, "results": out}
        )
    )


if __name__ == "__main__":
    main()

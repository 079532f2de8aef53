"""Isolated per-query re-measurement: one fresh session, named queries
only, min-of-N noop-materialized wall times (the VERDICT r9 #3
"re-measure isolated min-of-5" rig, kept as a tool so future rounds
don't hand-roll it).

Usage: python tools/measure_isolated.py q1 q2 [--sf DIR] [--runs N]
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
    args = ap.parse_args()

    spark = get_spark("measure-isolated")
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
    print(json.dumps({"sf": args.sf, "runs": args.runs, "results": out}))


if __name__ == "__main__":
    main()

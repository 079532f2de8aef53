"""Scale probe: run named declared queries at a base sf_dir and a scaled
fixture in one session, print per-query wall times plus the scale ratio,
and (optionally) emit a machine-diffable JSON artifact so successive
rounds' probes can be compared mechanically (VERDICT r9 #6).

The verdict column compares the measured wall ratio against a
linear-in-work ceiling: ``factor`` is how much more WORK the scaled
fixture holds for the probed query (the fixture row multiple for
linear operators; pass --factor explicitly for pair-space operators,
e.g. 900 for an all-pairs scorer probed at 30x rows). A query is
``ok`` when wall_ratio <= factor (at-or-below linear in work),
``over`` otherwise.

Usage:
  python tools/probe_scale.py q1 q2 --base DIR --big DIR --runs N \
      --factor 30 --json probe.json
  (both ``--flag value`` and ``--flag=value`` forms work; unknown
  query names fail fast with the list of near-misses)
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


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser(
        description="wall-time scale probe over declared queries"
    )
    ap.add_argument("queries", nargs="*", help="query names (default: all)")
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--big", default="/tmp/sf1_synth")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--factor",
        type=float,
        default=10.0,
        help="work multiple of --big vs --base (linear ceiling)",
    )
    ap.add_argument("--json", help="write per-query records to this path")
    args = ap.parse_args()

    queries = registry.get_queries()
    unknown = [q for q in args.queries if q not in queries]
    if unknown:
        near = {
            q: [n for n in sorted(queries) if q.lower() in n.lower()]
            for q in unknown
        }
        ap.error(
            "unknown queries: "
            + "; ".join(f"{q} (did you mean {near[q]!r}?)" for q in unknown)
        )
    names = args.queries or sorted(queries)

    spark = get_spark("probe-scale")

    import gc

    records = []
    print(f"{'query':42s} {'base':>8s} {'big':>8s} {'ratio':>7s} verdict")
    for name in names:
        fn = queries[name]
        row = {}
        err = None
        for label, sf_dir in (("base", args.base), ("big", args.big)):
            best = float("inf")
            for _ in range(args.runs):
                t0 = time.perf_counter()
                try:
                    materialize(fn(spark, sf_dir))
                except Exception as e:  # noqa: BLE001 — a query whose
                    # precondition the synthetic fixture violates (e.g. a
                    # constant critical-value ladder sized to the base
                    # fixture's 25 nations) should not kill the sweep
                    err = f"{type(e).__name__}"
                    break
                best = min(best, time.perf_counter() - t0)
            row[label] = best
            gc.collect()
            if err:
                break
        if err:
            print(f"{name:42s} ERR at {label}: {err}", flush=True)
            records.append({"query": name, "error": err, "at": label})
            continue
        ratio = row["big"] / row["base"]
        verdict = "ok" if ratio <= args.factor else "over"
        records.append(
            {
                "query": name,
                "base_sec": round(row["base"], 4),
                "scaled_sec": round(row["big"], 4),
                "wall_ratio": round(ratio, 2),
                "ceiling": args.factor,
                "verdict": verdict,
            }
        )
        print(
            f"{name:42s} {row['base']:8.2f} {row['big']:8.2f} "
            f"{ratio:6.1f}x {verdict}",
            flush=True,
        )
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(
                {
                    "base": args.base,
                    "big": args.big,
                    "runs": args.runs,
                    "factor": args.factor,
                    "records": records,
                },
                fh,
                indent=1,
            )
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()

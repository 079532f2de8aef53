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


# A stage is a scale hazard when ONE task carries real data volume —
# the shape of the r12 MBM regression, where AQE broadcast a 72M-pair
# grid and serialized the whole computation into a single task. 1-task
# stages moving less than this many bytes (driver-side 1-row
# aggregates, broadcast builds, LIMIT tails) are normal.
_SINGLE_TASK_BYTES = 64 * 1024 * 1024


def audit_stages(spark, group: str) -> list[dict]:
    """Single-task stages with material data volume run under job
    group ``group``, via the local UI REST API (stage metrics carry
    input + shuffle-read bytes; the status-tracker API does not)."""
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    if not ui:
        # no UI, no metrics — report nothing rather than a fake flag;
        # main() enables the UI for audited runs
        return []

    def _get(path: str):
        with urllib.request.urlopen(f"{ui}/api/v1{path}", timeout=10) as r:
            return json.load(r)

    app = _get("/applications")[0]["id"]
    stage_ids = set()
    for job in _get(f"/applications/{app}/jobs?status=succeeded"):
        if job.get("jobGroup") == group:
            stage_ids.update(job.get("stageIds", []))
    flagged = []
    for st in _get(f"/applications/{app}/stages?status=complete"):
        if st["stageId"] not in stage_ids:
            continue
        moved = st.get("inputBytes", 0) + st.get("shuffleReadBytes", 0)
        if st.get("numTasks") == 1 and moved > _SINGLE_TASK_BYTES:
            flagged.append(
                {
                    "stage_id": st["stageId"],
                    "name": st.get("name", "")[:80],
                    "bytes_moved": moved,
                }
            )
    return flagged


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
    ap.add_argument(
        "--audit-stages",
        action="store_true",
        help="flag single-task stages moving >64MB during each query's "
        "scaled run (the r12 AQE-serialization shape)",
    )
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

    spark = get_spark(
        "probe-scale",
        extra_conf=(
            {"spark.ui.enabled": "true"} if args.audit_stages else None
        ),
    )

    import gc

    records = []
    print(f"{'query':42s} {'base':>8s} {'big':>8s} {'ratio':>7s} verdict")
    for name in names:
        fn = queries[name]
        row = {}
        err = None
        for label, sf_dir in (("base", args.base), ("big", args.big)):
            best = float("inf")
            group = f"probe:{name}:{label}"
            if args.audit_stages:
                spark.sparkContext.setJobGroup(group, name)
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
            if args.audit_stages:
                spark.sparkContext.setJobGroup("", "")
                if label == "big" and not err:
                    row["single_task_stages"] = audit_stages(spark, group)
            row[label] = best
            gc.collect()
            if err:
                break
        if err:
            print(f"{name:42s} ERR at {label}: {err}", flush=True)
            records.append({"query": name, "error": err, "at": label})
            continue
        ratio = row["big"] / row["base"]
        hot = row.get("single_task_stages", [])
        verdict = "ok" if ratio <= args.factor and not hot else "over"
        rec = {
            "query": name,
            "base_sec": round(row["base"], 4),
            "scaled_sec": round(row["big"], 4),
            "wall_ratio": round(ratio, 2),
            "ceiling": args.factor,
            "verdict": verdict,
        }
        if args.audit_stages:
            rec["single_task_stages"] = hot
        records.append(rec)
        flag = f" [{len(hot)} single-task hot stages]" if hot else ""
        print(
            f"{name:42s} {row['base']:8.2f} {row['big']:8.2f} "
            f"{ratio:6.1f}x {verdict}{flag}",
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

"""Measure the MBM IVF leg's pair recall against the exact leg
(VERDICT r10 #4 — the X174 quality-eval discipline applied to the
X184 scale swap).

The r10 swap pinned bit-equality at nprobe = n_clusters and measured
SPEED at the default nprobe, but the recall trade at that default was
asserted, never measured. This tool runs
``plans.integrity_queries.mbm_ivf_pair_recall`` over a ladder of
nprobe values at the given fixture (use the 10x/30x synthetic
fixtures, and YOUR corpus before opting in to
SPARK_GRAFT_MBM_MODE=ivf) and emits one JSON line per point — the
curve that decided the r11 leg policy: recall 1.0 on the 10x stacked
fixture (near-dup-structured), 0.2-0.5 on the 30x decorrelated one,
hence auto mode never takes the IVF leg silently.

Usage:
    python tools/mbm_recall.py [sf_dir] [--nprobes 1,2,3,5,10]
        [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from data_engineering_1_spark.plans import integrity_queries as iq  # noqa: E402
from data_engineering_1_spark.session import get_spark  # noqa: E402


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--nprobes", default="1,2,3,5,10")
    ap.add_argument("--json", dest="json_out", default=None)
    ap.add_argument("--leg", default="ivf", choices=["ivf", "ivf-rescore"],
                    help="candidate scheme to price: one-sided probe "
                         "(ivf) or symmetric multi-probe + exact "
                         "rescore (ivf-rescore, r12)")
    ap.add_argument("--cells", type=int, default=None,
                    help="override _MBM_IVF_K (number of learned "
                         "k-means cells) for this measurement — prices "
                         "coarser/finer quantizers on the same corpus")
    args = ap.parse_args(argv)
    if args.cells:
        iq._MBM_IVF_K = args.cells

    spark = get_spark("mbm-recall")
    # the anchor/quantize stage is shared by every point — persist it
    # once so each nprobe pays only its own candidate join
    qv = iq._mbm_anchor_qvecs(spark, args.sf_dir).persist()
    n_anchors = qv.count()
    n_cells = iq._MBM_IVF_K

    t0 = time.time()
    exact = (
        iq._mbm_mutual_top1(iq._mbm_exact_dots(spark, qv))
        .select("vec_a", "vec_b")
        .persist()
    )
    n_exact = exact.count()
    exact_sec = round(time.time() - t0, 1)

    points = []
    dots_fn = (
        iq._mbm_ivf_rescore_dots
        if args.leg == "ivf-rescore"
        else iq._mbm_ivf_dots
    )
    for nprobe in (int(x) for x in args.nprobes.split(",") if x):
        t0 = time.time()
        ivf = (
            iq._mbm_mutual_top1(dots_fn(qv, nprobe))
            .select("vec_a", "vec_b")
        )
        n_ivf = ivf.count()
        n_common = exact.join(ivf, ["vec_a", "vec_b"], "inner").count()
        point = {
            "nprobe": nprobe,
            "n_exact": n_exact,
            "n_ivf": n_ivf,
            "n_common": n_common,
            "recall": round(n_common / max(n_exact, 1), 6),
            "ivf_sec": round(time.time() - t0, 1),
        }
        points.append(point)
        print(json.dumps(point))

    result = {
        "sf_dir": os.path.realpath(args.sf_dir),
        "leg": args.leg,
        "n_anchors": n_anchors,
        "n_cells": n_cells,
        "exact_leg_sec": exact_sec,
        "default_nprobe": iq._MBM_IVF_NPROBE,
        "points": points,
    }
    print(json.dumps({"summary": result}))
    if args.json_out:
        with open(args.json_out, "w") as fh:
            json.dump(result, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())

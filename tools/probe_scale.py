"""Scale probe: run named declared queries at a base sf_dir and a scaled
fixture in one session, print per-query wall times and the 10x ratio.

Usage: python tools/probe_scale.py q1 q2 ... [--base DIR] [--big DIR] [--runs N]
"""

from __future__ import annotations

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
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = {a.split("=")[0]: a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--") and "=" in a}
    base = opts.get("--base", "/root/testdata/sf0.1")
    big = opts.get("--big", "/tmp/sf1_synth")
    runs = int(opts.get("--runs", "2"))

    spark = get_spark("probe-scale")
    queries = registry.get_queries()
    names = args or sorted(queries)

    import gc

    print(f"{'query':42s} {'base':>8s} {'10x':>8s} {'ratio':>6s}")
    for name in names:
        fn = queries[name]
        row = {}
        err = None
        for label, sf_dir in (("base", base), ("10x", big)):
            best = float("inf")
            for _ in range(runs):
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
            continue
        print(
            f"{name:42s} {row['base']:8.2f} {row['10x']:8.2f} "
            f"{row['10x'] / row['base']:6.1f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()

"""Merge split parity-sweep artifacts (the --resume-from/--stop-before
alphabet ranges) into one canonical sweep JSON.

Later files win on duplicate query names (so a solo re-run artifact
listed last overrides the boxed verdict from the range sweep).

Usage:
    python tools/merge_parity.py out.json in1.json in2.json [...]
"""

from __future__ import annotations

import json
import sys


def main(argv: list[str]) -> int:
    if len(argv) < 3:
        print(__doc__)
        return 2
    out, ins = argv[1], argv[2:]
    records: dict[str, dict] = {}
    meta = None
    for path in ins:
        with open(path) as fh:
            payload = json.load(fh)
        if meta is None:
            meta = {k: v for k, v in payload.items() if k != "records"}
        for r in payload["records"]:
            records[r["query"]] = r
    payload = dict(meta or {})
    payload["merged_from"] = ins
    payload["records"] = sorted(records.values(), key=lambda r: r["query"])
    with open(out, "w") as fh:
        json.dump(payload, fh, indent=1)
    from collections import Counter

    counts = Counter(r["verdict"] for r in payload["records"])
    print(f"wrote {out}: {len(payload['records'])} records, {dict(counts)}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))

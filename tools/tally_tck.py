"""Merge run_tck.py shard outputs into a per-area tally (TCK_TALLY.md).

Usage: python tools/tally_tck.py shard0.txt [shard1.txt ...] > TCK_TALLY.md
"""

from __future__ import annotations

import collections
import sys


def main() -> int:
    per_area: dict[str, collections.Counter] = collections.defaultdict(
        collections.Counter
    )
    fails: list[str] = []
    for path in sys.argv[1:]:
        with open(path) as fh:
            for line in fh:
                parts = line.rstrip("\n").split("\t")
                if len(parts) < 2 or parts[0] not in ("PASS", "FAIL", "SKIP"):
                    continue
                status, tag = parts[0], parts[1]
                rel = tag.split(" :: ")[0]
                area = "/".join(rel.split("/")[:2])
                per_area[area][status] += 1
                if status == "FAIL":
                    fails.append(line.rstrip("\n"))
    print("# TCK tally (full corpus, merged shards)")
    print()
    print("| area | pass | fail | skip |")
    print("|---|---|---|---|")
    tp = tf = ts = 0
    for area in sorted(per_area):
        c = per_area[area]
        print(f"| {area} | {c['PASS']} | {c['FAIL']} | {c['SKIP']} |")
        tp += c["PASS"]
        tf += c["FAIL"]
        ts += c["SKIP"]
    print(f"| **total** | **{tp}** | **{tf}** | **{ts}** |")
    if fails:
        print()
        print("## Failures")
        print()
        for f in fails[:200]:
            print(f"- `{f[:300]}`")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

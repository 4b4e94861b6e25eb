"""Run the reference's openCypher TCK corpus through tests/tck_runner.py.

Usage:
    python tools/run_tck.py [--filter SUBSTR] [--limit N] [--out FILE]

Tallies PASS / FAIL / SKIP per feature directory and writes one line per
non-passing scenario (with the failure detail) to --out (default
/tmp/tck_results.txt) so failures can be triaged in batches.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import zlib

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from tck_runner import TCK_ROOT, parse_feature, run_scenario  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--filter", default="")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--out", default="/tmp/tck_results.txt")
    ap.add_argument(
        "--shard", default="",
        help="i/N — run only scenarios where index %% N == i (parallel "
        "full-corpus runs: one process per shard, SPARK_GRAFT_CPUS=8)",
    )
    args = ap.parse_args()
    shard_i, shard_n = -1, 1
    if args.shard:
        shard_i, shard_n = (int(x) for x in args.shard.split("/"))

    from arcadedb_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    # TCK scenarios are tiny (≤ tens of rows): one shuffle partition
    # strips ~30 no-op tasks off every job, several× faster end-to-end
    spark.conf.set("spark.sql.shuffle.partitions", "1")

    files = sorted(glob.glob(os.path.join(TCK_ROOT, "**", "*.feature"),
                             recursive=True))
    import time

    n_pass = n_fail = n_skip = 0
    ran = 0
    out = open(args.out, "w", buffering=1)  # line-buffered: stream results
    for path in files:
        rel = os.path.relpath(path, TCK_ROOT)
        if args.filter and args.filter not in rel:
            continue
        for si, sc in enumerate(parse_feature(path)):
            tag = f"{rel} :: {sc.name}"
            if shard_i >= 0 and (zlib.crc32(rel.encode()) + si) % shard_n != shard_i:
                continue
            runnable = sc.expect_error or (sc.query and sc.expect is not None)
            if sc.skip or not runnable:
                n_skip += 1
                reason = sc.skip or "no query/expectation parsed"
                out.write(f"SKIP\t{tag}\t{reason}\n")
                continue
            if args.limit and ran >= args.limit:
                continue
            ran += 1
            t0 = time.time()
            try:
                ok, detail = run_scenario(spark, sc)
            except Exception as e:  # noqa: BLE001 — tally, don't abort
                ok, detail = False, f"CRASH {type(e).__name__}: {e}"
            ms = int((time.time() - t0) * 1000)
            detail = " | ".join(detail.splitlines())[:400]
            if ok:
                n_pass += 1
                out.write(f"PASS\t{tag}\t{ms}ms\n")
            elif detail.startswith("SKIP"):
                n_skip += 1
                out.write(f"SKIP\t{tag}\t{detail[6:]}\n")
            else:
                n_fail += 1
                out.write(f"FAIL\t{tag}\t{detail}\t{ms}ms\n")
    out.close()
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} skip -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

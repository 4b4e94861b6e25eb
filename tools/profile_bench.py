"""Per-query profiling harness for the headline bench set.

For each headline query: time the DataFrame BUILD (parse/translate/plan
construction — driver-side) separately from the EXECUTE (df.count(), the
bench action), count the Spark jobs each query launches, and dump
``.explain('formatted')`` to plans/r08/<query>_<tag>.txt.

Usage: python tools/profile_bench.py [tag] [query ...]
  tag defaults to "before"; with no query names, profiles the full
  HEADLINE list from bench.py.

This is a diagnosis tool (guide §1): the numbers it prints are NOT the
bench contract — bench.py stays the single source of truth.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PLANS_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r09")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    from arcadedb_spark.session import get_spark
    from bench import HEADLINE
    import __spark_entry__ as entrymod

    names = sys.argv[2:] or HEADLINE
    os.makedirs(PLANS_DIR, exist_ok=True)
    spark = get_spark("arcadedb-spark-profile")
    qs = entrymod.queries()
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()
    spark.sparkContext.parallelize([1], 1).count()

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    results = {}
    for name in names:
        fn = qs[name]
        # a real job GROUP (not just a description): getJobIdsForGroup
        # then counts only this query's jobs, not concurrent daemon work
        sc.setJobGroup(name, name)
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        t1 = time.perf_counter()
        n = df.count()
        t2 = time.perf_counter()
        jobs_n = len(tracker.getJobIdsForGroup(name) or [])
        sc.setJobGroup("", "")
        # capture the formatted plan (post-run: includes AQE final info on
        # re-explain for executed frames)
        try:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception:
            import io
            from contextlib import redirect_stdout

            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        with open(os.path.join(PLANS_DIR, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        results[name] = {
            "build_s": round(t1 - t0, 3),
            "exec_s": round(t2 - t1, 3),
            "total_s": round(t2 - t0, 3),
            "rows": n,
            "jobs": jobs_n,
            "exchanges": plan.count("Exchange"),
        }
        print(json.dumps({name: results[name]}), flush=True)
    total = round(sum(r["total_s"] for r in results.values()), 3)
    print(json.dumps({"profile_total": total, "tag": tag, "sf_dir": SF_DIR}))
    spark.stop()


if __name__ == "__main__":
    main()

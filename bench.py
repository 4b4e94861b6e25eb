"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.  The driver records this as
BENCH_r{N}.json and grades against BASELINE.md (first measured run
defines the 2× regression envelope).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: one per operator family that matters at scale.
HEADLINE = [
    "q_tpch_q1",            # scan + 8-agg groupBy
    "q_scan_filter_project",  # pushdown scan
    "q_in_subquery",        # semi join
    "q_link_3hop",          # dim join chain (broadcast)
    "q_match_3hop",         # graph pattern join chain
    "q_graph_bfs_hops",     # iterative BFS
    "q_time_bucket",        # windowless ts agg
    "q_ts_lag_delta",       # window function
    "q_bm25",               # full-text scoring pipeline
    "q_knn_cosine",         # vector brute-force top-k
    "q_minhash_dedup",      # shingle→minhash→LSH join
    "q_exact_dedup",        # hash-groupBy dedup
    "q_cypher_match",       # openCypher front end
    "q_sessionize",         # lag+cumsum sessionization
    "q_ngram_jaccard",      # inverted-index similarity join
]


def main() -> None:
    from arcadedb_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("arcadedb-spark-bench")
    qs = entrymod.queries()

    # Warm the JVM/codegen path with a trivial action against the smallest
    # table, and spawn the python worker pool — both are session startup,
    # not query work; per-query timings should measure the engine.
    spark.read.parquet(os.path.join(SF_DIR, "region.parquet")).count()
    spark.sparkContext.parallelize([1], 1).count()

    sf = None
    try:
        base = os.path.basename(SF_DIR.rstrip("/"))
        if base.startswith("sf"):
            sf = float(base[2:])
    except ValueError:
        pass

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        # one warm-up plan (catalog load etc.) is NOT free-ridden: we time
        # a cold build+execute per query, like a fresh user query would be
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        _ = n

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

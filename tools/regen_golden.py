"""Regenerate golden-pair oracles pinned in driver_queries.py.

Some driver entries (q_simhash_dedup) depend on xxhash64 signatures that
DuckDB cannot re-derive; their oracles pin the expected output for the
fixed sf0.01 fixture (seed 42).  If the fixture ever changes, run:

    python tools/regen_golden.py

and paste the printed VALUES list into the q_simhash_dedup oracle.
"""

from __future__ import annotations

import sys
import textwrap

sys.path.insert(0, "/root/repo")


def main() -> None:
    from arcadedb_spark.session import get_spark
    import arcadedb_spark.driver_queries as dq

    spark = get_spark()
    sf = "/root/testdata/sf0.01"

    sh = (
        dq.QUERIES["q_simhash_dedup"](spark, sf)
        .toPandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    vals = ", ".join(f"({r.id_a},{r.id_b},{r.hamming})" for r in sh.itertuples())
    print(f"-- q_simhash_dedup: {len(sh)} pairs")
    print("\n".join(textwrap.wrap(vals, width=72)))

    lv = dq.QUERIES["q_louvain"](spark, sf).toPandas()
    print(f"\n-- q_louvain: {len(lv)} communities")
    print(", ".join(f"({r.community},{r.size})" for r in lv.itertuples()))

    fr = dq.QUERIES["q_fastrp"](spark, sf).toPandas()
    print(f"\n-- q_fastrp: {len(fr)} rows")
    print(",\n".join(f"({r.user_id}, '{r.embedding}')" for r in fr.itertuples()))

    ksp = dq.QUERIES["q_ksp"](spark, sf).toPandas()
    print(f"\n-- q_ksp: {len(ksp)} paths")
    print(", ".join(f"({r.rank},{r.weight},{r.hops})" for r in ksp.itertuples()))

    mf = dq.QUERIES["q_maxflow"](spark, sf).toPandas()
    print(f"\n-- q_maxflow")
    print(", ".join(f"({r.max_flow})" for r in mf.itertuples()))

    cl = dq.QUERIES["q_cliques"](spark, sf).toPandas()
    print(f"\n-- q_cliques: {len(cl)} sizes")
    print(", ".join(f"({r.size},{r.n})" for r in cl.itertuples()))

    ld = dq.QUERIES["q_leiden"](spark, sf).toPandas()
    print(f"\n-- q_leiden: {len(ld)} communities")
    print(", ".join(f"({r.community},{r.size})" for r in ld.itertuples()))
    spark.stop()


if __name__ == "__main__":
    main()

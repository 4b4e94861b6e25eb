"""Driver correctness suite: one entry per SURVEY.md §2 operator family.

Each ``@query(name, oracle=...)`` pair runs the engine (Spark) side and an
equivalent DuckDB SQL — the driver hash-compares them at sf0.01.

Numeric parity rules (why the SQL looks the way it does):
- SUMs over doubles go through DECIMAL(25,6) in BOTH engines: decimal
  accumulation is exact, so engine-dependent double summation order can't
  flip a rounded digit.
- AVG/STDDEV/window arithmetic stay double and are rounded: per-row double
  ops are bit-identical across engines (IEEE), and accumulation error is
  orders of magnitude below the rounding grid.
- Timestamps are emitted as epoch millis (BIGINT) — identical integers
  beat timezone/precision stringification quirks.
- Cosine similarity is written as dot/(sqrt·sqrt) in both engines (same
  association order), on DOUBLE[] casts of the float vectors.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

_DEC = "decimal(25,6)"


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _db(spark: SparkSession, sf_dir: str):
    from __spark_entry__ import _db as shared

    return shared(spark, sf_dir)


def _dsum(col) -> F.Column:
    """Exact double sum: decimal accumulation, double result."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DEC)).cast("double")


# ===========================================================================
# Relational core (scan/filter/project/agg/sort/limit/distinct/subquery)
# ===========================================================================


@query(
    "q_scan_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_quantity > 45 AND l_discount < 0.05
    """,
)
def q_scan_filter_project(spark, sf_dir):
    return _db(spark, sf_dir).query(
        "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice "
        "FROM lineitem WHERE l_quantity > 45 AND l_discount < 0.05"
    )


@query(
    "q_tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(25,6))) AS DOUBLE) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark, sf_dir):
    return _db(spark, sf_dir).query(
        """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity.convert('decimal(25,6)')).asDouble() AS sum_qty,
               sum(l_extendedprice.convert('decimal(25,6)')).asDouble() AS sum_base_price,
               sum((l_extendedprice * (1 - l_discount)).convert('decimal(25,6)')).asDouble() AS sum_disc_price,
               sum((l_extendedprice * (1 - l_discount) * (1 + l_tax)).convert('decimal(25,6)')).asDouble() AS sum_charge,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= date('1998-09-02')
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    )


@query(
    "q_topk_skip_limit",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer
    ORDER BY c_acctbal DESC, c_custkey OFFSET 5 LIMIT 10
    """,
)
def q_topk_skip_limit(spark, sf_dir):
    return _db(spark, sf_dir).query(
        "SELECT c_custkey, c_name, c_acctbal FROM customer "
        "ORDER BY c_acctbal DESC, c_custkey ASC SKIP 5 LIMIT 10"
    )


@query("q_distinct", oracle="SELECT DISTINCT c_mktsegment FROM customer")
def q_distinct(spark, sf_dir):
    return _db(spark, sf_dir).query("SELECT DISTINCT c_mktsegment FROM customer")


@query("q_count_star", oracle="SELECT count(*) AS n FROM lineitem")
def q_count_star(spark, sf_dir):
    return _db(spark, sf_dir).query("SELECT count(*) AS n FROM lineitem")


@query(
    "q_agg_suite",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n,
           round(min(c_acctbal), 4) AS min_bal,
           round(max(c_acctbal), 4) AS max_bal,
           round(avg(c_acctbal), 4) AS avg_bal,
           CAST(sum(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) AS sum_bal,
           round(stddev_samp(c_acctbal), 4) AS sd_bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def q_agg_suite(spark, sf_dir):
    return _db(spark, sf_dir).query(
        """
        SELECT c_mktsegment,
               count(*) AS n,
               round(min(c_acctbal), 4) AS min_bal,
               round(max(c_acctbal), 4) AS max_bal,
               round(avg(c_acctbal), 4) AS avg_bal,
               sum(c_acctbal.convert('decimal(25,6)')).asDouble() AS sum_bal,
               round(stddev(c_acctbal), 4) AS sd_bal
        FROM customer GROUP BY c_mktsegment
        """
    )


@query(
    "q_in_subquery",
    oracle="""
    SELECT count(*) AS n FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)
    """,
)
def q_in_subquery(spark, sf_dir):
    return _db(spark, sf_dir).query(
        "SELECT count(*) AS n FROM customer WHERE c_custkey IN "
        "(SELECT o_custkey FROM orders WHERE o_totalprice > 200000)"
    )


@query(
    "q_not_in_subquery",
    oracle="""
    SELECT count(*) AS n FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
    """,
)
def q_not_in_subquery(spark, sf_dir):
    return _db(spark, sf_dir).query(
        "SELECT count(*) AS n FROM customer WHERE c_custkey NOT IN "
        "(SELECT o_custkey FROM orders WHERE o_totalprice > 300000)"
    )


@query(
    "q_like_between_in",
    oracle="""
    SELECT count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderpriority LIKE '%URGENT%'
      AND o_totalprice BETWEEN 50000 AND 250000
      AND o_orderstatus IN ('F', 'O')
    """,
)
def q_like_between_in(spark, sf_dir):
    return _db(spark, sf_dir).query(
        """
        SELECT count(*) AS n,
               sum(o_totalprice.convert('decimal(25,6)')).asDouble() AS total
        FROM orders
        WHERE o_orderpriority LIKE '%URGENT%'
          AND o_totalprice BETWEEN 50000 AND 250000
          AND o_orderstatus IN ('F', 'O')
        """
    )


@query(
    "q_case_when",
    oracle="""
    SELECT CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS band,
           count(*) AS n
    FROM customer GROUP BY 1
    """,
)
def q_case_when(spark, sf_dir):
    return _db(spark, sf_dir).query(
        """
        SELECT CASE WHEN c_acctbal < 0 THEN 'neg'
                    WHEN c_acctbal < 5000 THEN 'mid'
                    ELSE 'high' END AS band,
               count(*) AS n
        FROM customer GROUP BY band
        """
    )


@query(
    "q_string_methods",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS uname,
           substring(c_name, 10, 5) AS frag,
           CAST(length(c_name) AS INTEGER) AS len,
           replace(c_name, 'Customer', 'C') AS short
    FROM customer WHERE c_custkey < 20
    """,
)
def q_string_methods(spark, sf_dir):
    # dialect: postfix methods (Java-style 0-based substring(begin, end))
    return _db(spark, sf_dir).query(
        """
        SELECT c_custkey,
               c_name.toUpperCase() AS uname,
               c_name.substring(9, 14) AS frag,
               c_name.length() AS len,
               c_name.replace('Customer', 'C') AS short
        FROM customer WHERE c_custkey < 20
        """
    )


@query(
    "q_array_selectors",
    oracle="""
    SELECT doc_id,
           CAST(to_json(list_filter(string_split(text, ' '), x -> x > 'm')) AS VARCHAR) AS late_words,
           CAST(to_json(string_split(text, ' ')[1:3]) AS VARCHAR) AS head,
           string_split(text, ' ')[2] AS second
    FROM documents ORDER BY doc_id LIMIT 50
    """,
)
def q_array_selectors(spark, sf_dir):
    """Array condition/filter selectors + ranges
    (SQLParser.g4 arraySelector: arrayFilterSelector, arrayRangeSelector,
    arraySingleSelector) compiled to F.filter / F.slice / element_at.

    Array outputs are JSON-serialized on both engines: the driver's
    canonicalizer hashes scalar cells, and Spark/DuckDB agree on the
    compact ["a","b"] rendering for string lists."""
    df = _db(spark, sf_dir).query(
        """
        SELECT doc_id,
               text.split(' ')[> 'm'] AS late_words,
               text.split(' ')[0..3] AS head,
               text.split(' ')[1] AS second
        FROM documents ORDER BY doc_id LIMIT 50
        """
    )
    return df.select(
        "doc_id",
        F.to_json("late_words").alias("late_words"),
        F.to_json("head").alias("head"),
        "second",
    )


@query(
    "q_date_functions",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
           CAST(month(o_orderdate) AS INTEGER) AS m,
           count(*) AS n
    FROM orders GROUP BY 1, 2
    """,
)
def q_date_functions(spark, sf_dir):
    return _db(spark, sf_dir).query(
        "SELECT year(o_orderdate) AS y, month(o_orderdate) AS m, count(*) AS n "
        "FROM orders GROUP BY y, m"
    )


@query(
    "q_null_handling",
    oracle="""
    SELECT count(*) AS n_null,
           round(coalesce(avg(CASE WHEN value > 100 THEN value END), -1), 4) AS avg_high
    FROM events WHERE value <= 100 OR value > 100
    """,
)
def q_null_handling(spark, sf_dir):
    return _db(spark, sf_dir).query(
        """
        SELECT count(*) AS n_null,
               round(coalesce(avg(if(value > 100, value, null)), -1), 4) AS avg_high
        FROM events WHERE value <= 100 OR value > 100
        """
    )


@query(
    "q_unwind",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS word
    FROM documents WHERE doc_id < 20
    """,
)
def q_unwind(spark, sf_dir):
    return _db(spark, sf_dir).query(
        "SELECT doc_id, text.split(' ') AS word FROM documents "
        "WHERE doc_id < 20 UNWIND word"
    )


@query(
    "q_link_2hop",
    oracle="""
    SELECT n.n_name AS nation, count(*) AS n_cust
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1
    """,
)
def q_link_2hop(spark, sf_dir):
    # LINK dot-navigation (reference: dot deref across RID links)
    return _db(spark, sf_dir).query(
        "SELECT c_nationkey.n_name AS nation, count(*) AS n_cust "
        "FROM customer GROUP BY nation"
    )


@query(
    "q_link_3hop",
    oracle="""
    SELECT r.r_name AS region, count(*) AS n_cust
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1
    """,
)
def q_link_3hop(spark, sf_dir):
    return _db(spark, sf_dir).query(
        "SELECT c_nationkey.n_regionkey.r_name AS region, count(*) AS n_cust "
        "FROM customer GROUP BY region"
    )


@query(
    "q_let_per_record",
    oracle="""
    SELECT o_orderkey, round(o_totalprice * 1.1, 4) AS adjusted
    FROM orders WHERE o_totalprice * 1.1 > 400000
    """,
)
def q_let_per_record(spark, sf_dir):
    return _db(spark, sf_dir).query(
        "SELECT o_orderkey, round($adj, 4) AS adjusted FROM orders "
        "LET adj = o_totalprice * 1.1 WHERE $adj > 400000"
    )


@query(
    "q_schema_types",
    oracle="""
    SELECT * FROM (VALUES
      ('customer', 'document', 1), ('documents', 'document', 2),
      ('embeddings', 'document', 3), ('events', 'document', 4),
      ('lineitem', 'document', 5), ('nation', 'document', 6),
      ('orders', 'document', 7), ('part', 'document', 8),
      ('region', 'document', 9), ('supplier', 'document', 10)
    ) AS t(name, kind, bucket_id) ORDER BY bucket_id
    """,
)
def q_schema_types(spark, sf_dir):
    """schema:types virtual table vs the literal expected catalog (the
    10 driver tables registered in sorted order, buckets 1..10).

    Uses a FRESH Database: the shared one accumulates types created by
    DDL/DML queries that ran earlier in the same gate session, which
    would shift the catalog row count and bucket numbering."""
    from arcadedb_spark.database import Database

    return Database.open(spark, sf_dir).query(
        "SELECT name, kind, bucket_id FROM schema:types ORDER BY bucket_id"
    )


# ===========================================================================
# Graph: MATCH / TRAVERSE / algorithms
# ===========================================================================


@query(
    "q_match_2hop",
    oracle="""
    SELECT c.c_mktsegment AS seg, count(*) AS n
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)
def q_match_2hop(spark, sf_dir):
    return _db(spark, sf_dir).query(
        "MATCH {type: Customer, as: c}.out('PLACED'){as: o} "
        "RETURN c.c_mktsegment AS seg, count(*) AS n GROUP BY seg"
    )


@query(
    "q_match_3hop",
    oracle="""
    SELECT c.c_mktsegment AS seg, count(*) AS n
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_size > 40
    GROUP BY 1
    """,
)
def q_match_3hop(spark, sf_dir):
    return _db(spark, sf_dir).query(
        "MATCH {type: Customer, as: c}.out('PLACED'){as: o}"
        ".out('CONTAINS'){as: p, where: (p_size > 40)} "
        "RETURN c.c_mktsegment AS seg, count(*) AS n GROUP BY seg"
    )


@query(
    "q_match_optional",
    oracle="""
    SELECT n.n_name AS nation, count(s.s_suppkey) AS n_sup
    FROM nation n LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey
    GROUP BY 1
    """,
)
def q_match_optional(spark, sf_dir):
    return _db(spark, sf_dir).query(
        "MATCH {type: Nation, as: n}"
        ".in('LOCATED_IN'){type: Supplier, as: s, optional: true} "
        "RETURN n.n_name AS nation, count(s.s_suppkey) AS n_sup GROUP BY nation"
    )


@query(
    "q_match_not",
    oracle="""
    SELECT count(*) AS n FROM customer
    WHERE c_custkey NOT IN
      (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
    """,
)
def q_match_not(spark, sf_dir):
    return _db(spark, sf_dir).query(
        "MATCH {type: Customer, as: c}, "
        "NOT {as: c}.out('PLACED'){type: Order, where: (o_totalprice > 300000)} "
        "RETURN count(*) AS n"
    )


@query(
    "q_traverse_bfs",
    oracle="""
    WITH roots AS (SELECT c_custkey FROM customer WHERE c_custkey < 5),
    d1 AS (SELECT DISTINCT o_orderkey FROM orders
           WHERE o_custkey IN (SELECT c_custkey FROM roots)),
    d2 AS (SELECT DISTINCT l_partkey FROM lineitem
           WHERE l_orderkey IN (SELECT o_orderkey FROM d1))
    SELECT 'customer' AS label, 0 AS depth, count(*) AS n FROM roots
    UNION ALL SELECT 'order', 1, count(*) FROM d1
    UNION ALL SELECT 'part', 2, count(*) FROM d2
    """,
)
def q_traverse_bfs(spark, sf_dir):
    from arcadedb_spark.graph.traverse import traverse

    db = _db(spark, sf_dir)
    g = db.graph()
    roots = g.vertices("Customer").filter(F.col("c_custkey") < 5).select("vid")
    edges = g.edges("PLACED", "CONTAINS", with_identity=False).select(
        F.col("src").alias("__from"), F.col("dst").alias("__to")
    )
    visited = traverse(db, roots, edges, max_depth=2)
    labeled = visited.join(g.all_vertices(), "vid", "left")
    return labeled.groupBy("label", "depth").agg(F.count(F.lit(1)).alias("n"))


@query(
    "q_graph_bfs_hops",
    oracle="""
    WITH pairs AS (
      SELECT user_id AS s, lead(user_id) OVER (ORDER BY ts, event_id) AS d
      FROM events
    ), e AS (SELECT DISTINCT s, d FROM pairs WHERE d IS NOT NULL AND s <> d),
    bfs AS (
      WITH RECURSIVE walk(vid, depth) AS (
        SELECT CAST(7 AS BIGINT), 0
        UNION
        SELECT e.d, walk.depth + 1 FROM walk JOIN e ON e.s = walk.vid
        WHERE walk.depth < 3
      ) SELECT vid, min(depth) AS depth FROM walk GROUP BY vid
    )
    SELECT depth, count(*) AS n FROM bfs GROUP BY depth
    """,
)
def q_graph_bfs_hops(spark, sf_dir):
    from arcadedb_spark.graph.traverse import traverse

    from arcadedb_spark.graph.model import local_df

    db = _db(spark, sf_dir)
    g = db.graph()
    base = db.schema.get("customer").bucket_id << 40
    # single-slice literal frame: createDataFrame would scatter one row
    # over defaultParallelism python tasks
    roots = local_df(spark, [(base + 7,)], "struct<vid:bigint>")
    edges = g.edges("INTERACTED").select(
        F.col("src").alias("__from"), F.col("dst").alias("__to")
    )
    visited = traverse(db, roots, edges, max_depth=3)
    return visited.groupBy("depth").agg(F.count(F.lit(1)).alias("n"))


@query(
    "q_degree_centrality",
    oracle="""
    WITH pairs AS (
      SELECT user_id AS s, lead(user_id) OVER (ORDER BY ts, event_id) AS d
      FROM events
    ), e AS (SELECT DISTINCT s, d FROM pairs WHERE d IS NOT NULL AND s <> d)
    SELECT s AS user_id, count(*) AS degree FROM e GROUP BY s
    ORDER BY degree DESC, user_id LIMIT 5
    """,
)
def q_degree_centrality(spark, sf_dir):
    from arcadedb_spark.graph.algorithms import degree_centrality

    db = _db(spark, sf_dir)
    g = db.graph()
    base = db.schema.get("customer").bucket_id << 40
    deg = degree_centrality(g.edges("INTERACTED"), direction="out")
    return (
        deg.select((F.col("vid") - base).alias("user_id"), "degree")
        .orderBy(F.desc("degree"), F.asc("user_id"))
        .limit(5)
    )


@query(
    "q_triangle_count",
    oracle="""
    WITH pairs AS (
      SELECT user_id AS s, lead(user_id) OVER (ORDER BY ts, event_id) AS d
      FROM events
    ), e0 AS (
      SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
      FROM pairs WHERE d IS NOT NULL AND s <> d
    )
    SELECT count(*) AS n_triangles
    FROM e0 x JOIN e0 y ON y.a = x.a AND y.b > x.b
              JOIN e0 z ON z.a = x.b AND z.b = y.b
    """,
)
def q_triangle_count(spark, sf_dir):
    from arcadedb_spark.graph.algorithms import triangle_count

    db = _db(spark, sf_dir)
    g = db.graph()
    tc = triangle_count(g.edges("INTERACTED"))
    return tc.agg((F.sum("triangles") / 3).cast("long").alias("n_triangles"))


def _pagerank_oracle(iterations: int = 10) -> str:
    """Unrolled PageRank in DuckDB SQL — mirrors algorithms.pagerank
    exactly (damping 0.85, rank init 1.0, uniform dangling-mass
    redistribution, Σrank = N invariant).  Float summation order differs
    between engines but the error (~1e-13 after 10 rounds) is far below
    the round(…, 4) grid.  Every CTE is MATERIALIZED: r{{i}} is referenced
    by both c{{i+1}} and f{{i+1}}, and DuckDB's default inlining makes the
    10-level chain exponential (>10 min) without it."""
    cte = ["""
    pairs AS MATERIALIZED (
      SELECT user_id AS s, lead(user_id) OVER (ORDER BY ts, event_id) AS d
      FROM events
    ), e0 AS MATERIALIZED (
      SELECT DISTINCT s, d FROM pairs WHERE d IS NOT NULL AND s <> d
    ), verts AS MATERIALIZED (
      SELECT DISTINCT v FROM (SELECT s AS v FROM e0 UNION ALL SELECT d FROM e0)
    ), nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
    outd AS MATERIALIZED (SELECT s, count(*) AS deg FROM e0 GROUP BY s),
    r0 AS MATERIALIZED (SELECT v, 1.0 AS rank FROM verts)"""]
    for i in range(1, iterations + 1):
        cte.append(f"""
    c{i} AS MATERIALIZED (
      SELECT e0.d AS v, sum(r{i-1}.rank / outd.deg) AS c
      FROM e0 JOIN r{i-1} ON r{i-1}.v = e0.s JOIN outd ON outd.s = e0.s
      GROUP BY e0.d
    ), f{i} AS MATERIALIZED (SELECT coalesce(sum(c), 0.0) AS fl FROM c{i}),
    r{i} AS MATERIALIZED (
      SELECT verts.v,
             0.15 + 0.85 * (coalesce(c{i}.c, 0.0)
               + ((SELECT n FROM nn) - (SELECT fl FROM f{i})) / (SELECT n FROM nn)) AS rank
      FROM verts LEFT JOIN c{i} ON c{i}.v = verts.v
    )""")
    return (
        "WITH " + ",".join(cte)
        + f"""
    SELECT v AS user_id, round(rank, 4) AS rank
    FROM r{iterations} ORDER BY rank DESC, user_id LIMIT 10
    """
    )


@query("q_pagerank", oracle=_pagerank_oracle(10))
def q_pagerank(spark, sf_dir):
    """PageRank vs a 10-iteration unrolled DuckDB oracle
    (AlgoPageRank.java parity: damping 0.85, dangling redistribution)."""
    from arcadedb_spark.graph.algorithms import pagerank

    db = _db(spark, sf_dir)
    g = db.graph()
    base = db.schema.get("customer").bucket_id << 40
    pr = pagerank(g.edges("INTERACTED"), iterations=10)
    return (
        pr.select((F.col("vid") - base).alias("user_id"), F.round("rank", 4).alias("rank"))
        .orderBy(F.desc("rank"), F.asc("user_id"))
        .limit(10)
    )


@query(
    "q_wcc",
    oracle="""
    WITH RECURSIVE pairs AS MATERIALIZED (
      SELECT user_id AS s, lead(user_id) OVER (ORDER BY ts, event_id) AS d
      FROM events
    ), e0 AS MATERIALIZED (
      SELECT DISTINCT s, d FROM pairs WHERE d IS NOT NULL AND s <> d
    ), adj AS MATERIALIZED (
      SELECT DISTINCT v, n FROM (
        SELECT s AS v, d AS n FROM e0 UNION ALL SELECT d AS v, s AS n FROM e0
      ) WHERE v <> n
    ), reach(v, r) AS (
      SELECT v, v FROM (SELECT DISTINCT v FROM adj)
      UNION
      SELECT reach.v, adj.n FROM reach JOIN adj ON adj.v = reach.r
    ), comp AS (
      SELECT v, min(r) AS c FROM reach GROUP BY v
    )
    SELECT c AS component, count(*) AS size
    FROM comp GROUP BY c ORDER BY size DESC, component
    """,
)
def q_wcc(spark, sf_dir):
    """WCC vs a DuckDB RECURSIVE-CTE transitive-closure oracle —
    component label = min user id in the component (AlgoWCC.java)."""
    from arcadedb_spark.graph.algorithms import connected_components

    db = _db(spark, sf_dir)
    g = db.graph()
    base = db.schema.get("customer").bucket_id << 40
    cc = connected_components(g.edges("INTERACTED"))
    return (
        cc.groupBy((F.col("component") - base).alias("component"))
        .agg(F.count(F.lit(1)).alias("size"))
        .orderBy(F.desc("size"), F.asc("component"))
    )


# ===========================================================================
# Time-series
# ===========================================================================


@query(
    "q_time_bucket",
    oracle="""
    SELECT (epoch_ms(ts) // 3600000) * 3600000 AS bucket_ms,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total
    FROM events GROUP BY 1, 2
    """,
)
def q_time_bucket(spark, sf_dir):
    from arcadedb_spark.timeseries import time_bucket

    ev = _db(spark, sf_dir).table("events")
    return ev.groupBy(
        F.unix_millis(time_bucket("ts", 3600000)).alias("bucket_ms"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n"), _dsum("value").alias("total"))


@query(
    "q_promql_range_avg",
    oracle="""
    WITH m AS (SELECT event_type, epoch_ms(ts) AS tsm, value FROM events),
    mx AS (SELECT max(tsm) AS t FROM m)
    SELECT event_type, round(avg(value), 4) AS avg_v
    FROM m, mx WHERE tsm >= t - 3600000 AND tsm <= t
    GROUP BY event_type ORDER BY event_type
    """,
)
def q_promql_range_avg(spark, sf_dir):
    """PromQL avg_over_time over a metrics frame derived from events
    (engine/timeseries/promql/PromQLEvaluator.java parity; series
    identity = label map {event_type})."""
    from arcadedb_spark.timeseries.promql import promql_instant

    ev = _db(spark, sf_dir).table("events")
    metrics = ev.select(
        F.lit("ev").alias("metric"),
        F.create_map(F.lit("event_type"), F.col("event_type")).alias("labels"),
        F.unix_millis("ts").alias("ts_millis"),
        F.col("value").cast("double").alias("value"),
    )
    t_end = metrics.agg(F.max("ts_millis")).collect()[0][0]
    out = promql_instant(metrics, "avg_over_time(ev[1h])", t_end)
    return (
        out.select(
            F.col("labels").getItem("event_type").alias("event_type"),
            F.round("value", 4).alias("avg_v"),
        )
        .orderBy("event_type")
    )


@query(
    "q_ts_lag_delta",
    oracle="""
    SELECT event_id,
           round(value - lag(value) OVER w, 4) AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_ts_lag_delta(spark, sf_dir):
    from arcadedb_spark.timeseries import delta

    ev = _db(spark, sf_dir).table("events")
    return ev.select(
        "event_id",
        F.round(delta("value", "user_id", ["ts", "event_id"]), 4).alias("delta"),
    )


@query(
    "q_moving_avg",
    oracle="""
    SELECT event_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS ma
    FROM events
    """,
)
def q_moving_avg(spark, sf_dir):
    from arcadedb_spark.timeseries import moving_avg

    ev = _db(spark, sf_dir).table("events")
    return ev.select(
        "event_id",
        F.round(moving_avg("value", "user_id", ["ts", "event_id"], 3), 4).alias("ma"),
    )


@query(
    "q_ts_rank",
    oracle="""
    SELECT event_id,
           CAST(rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS INTEGER) AS rnk
    FROM events
    """,
)
def q_ts_rank(spark, sf_dir):
    from arcadedb_spark.timeseries import ts_rank

    ev = _db(spark, sf_dir).table("events")
    return ev.select(
        "event_id",
        ts_rank("user_id", [F.desc("value"), F.asc("event_id")]).alias("rnk"),
    )


@query(
    "q_ts_rate",
    oracle="""
    SELECT event_id,
           round(CASE WHEN (epoch_ms(ts) - lag(epoch_ms(ts)) OVER w) / 1000.0 > 0
                 THEN (value - lag(value) OVER w)
                      / ((epoch_ms(ts) - lag(epoch_ms(ts)) OVER w) / 1000.0)
                 END, 4) + 0.0 AS rate
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_ts_rate(spark, sf_dir):
    from arcadedb_spark.timeseries.functions import rate

    ev = _db(spark, sf_dir).table("events")
    return ev.select(
        "event_id",
        (F.round(rate("value", "ts", "user_id", ["ts", "event_id"]), 4) + 0.0).alias("rate"),
    )


@query(
    "q_continuous_aggregate",
    oracle="""
    SELECT (epoch_ms(ts) // 60000) * 60000 AS bucket_ms,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total
    FROM events GROUP BY 1, 2
    """,
)
def q_continuous_aggregate(spark, sf_dir):
    from arcadedb_spark.streaming import ContinuousAggregate

    ev = _db(spark, sf_dir).table("events")
    ca = ContinuousAggregate(
        "ca_events",
        "ts",
        "1 minute",
        ["event_type"],
        {"n": F.count(F.lit(1)), "total": _dsum("value")},
    )
    out = ca.refresh_batch(ev)
    return out.select(
        F.unix_millis("bucket").alias("bucket_ms"), "event_type", "n", "total"
    )


# ===========================================================================
# Text analysis / full-text
# ===========================================================================


@query(
    "q_token_count",
    oracle=r"""
    SELECT doc_id,
           CAST(length(list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}]+'),
                                   x -> length(x) > 0)) AS INTEGER) AS n_tokens
    FROM documents
    """,
)
def q_token_count(spark, sf_dir):
    from arcadedb_spark.text.analysis import token_count

    docs = _db(spark, sf_dir).table("documents")
    return docs.select("doc_id", token_count("text").alias("n_tokens"))


@query(
    "q_quality_score",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, text,
             length(text) AS n_chars,
             list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}]+'),
                         x -> length(x) > 0) AS toks,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
             length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS punct
      FROM documents
    ), m AS (
      SELECT doc_id, n_chars, alpha, punct,
             length(toks) AS n_tok,
             length(list_distinct(toks)) AS n_distinct
      FROM t
    )
    SELECT doc_id,
           round(
             (CASE WHEN n_tok >= 20 THEN 1.0 ELSE n_tok / 20.0 END) * 0.3
             + (CASE WHEN n_chars > 0 THEN alpha / n_chars ELSE 0.0 END) * 0.3
             + (CASE WHEN n_chars > 0
                THEN 1.0 - least(1.0, 10.0 * punct / n_chars) ELSE 0.0 END) * 0.2
             + (CASE WHEN n_tok > 0 THEN n_distinct / n_tok ELSE 0.0 END) * 0.2,
           4) AS quality
    FROM m
    """,
)
def q_quality_score(spark, sf_dir):
    from arcadedb_spark.text.analysis import quality_score

    docs = _db(spark, sf_dir).table("documents")
    return docs.select("doc_id", F.round(quality_score("text"), 4).alias("quality"))


@query(
    "q_exact_dedup",
    oracle=r"""
    SELECT count(DISTINCT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))) AS n_unique,
           count(*) AS n_total
    FROM documents
    """,
)
def q_exact_dedup(spark, sf_dir):
    from arcadedb_spark.text.analysis import exact_fingerprint

    docs = _db(spark, sf_dir).table("documents")
    return docs.agg(
        F.countDistinct(exact_fingerprint("text")).alias("n_unique"),
        F.count(F.lit(1)).alias("n_total"),
    )


@query(
    "q_bm25",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}]+'),
                                 x -> length(x) > 0) AS t
      FROM documents
    ), lens AS (SELECT doc_id, length(t) AS dl FROM toks),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM lens),
    postings AS (
      SELECT doc_id, term, count(*) AS tf
      FROM (SELECT doc_id, unnest(t) AS term FROM toks) GROUP BY 1, 2
    ),
    q(term) AS (SELECT unnest(['fast', 'join', 'stream'])),
    hits AS (SELECT p.doc_id, p.term, p.tf FROM postings p JOIN q USING (term)),
    dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM hits GROUP BY 1),
    idf AS (
      SELECT term,
             ln((((SELECT n FROM stats) - df + 0.5) / (df + 0.5)) + 1.0) AS idf
      FROM dfreq
    ),
    scored AS (
      SELECT h.doc_id,
             sum(idf.idf * (h.tf * 2.2)
                 / (h.tf + 1.2 * (0.25 + 0.75 * lens.dl / (SELECT avgdl FROM stats)))) AS score
      FROM hits h JOIN idf USING (term) JOIN lens USING (doc_id)
      GROUP BY 1
    )
    SELECT doc_id, round(score, 4) AS score
    FROM (SELECT * FROM scored ORDER BY score DESC, doc_id LIMIT 10)
    """,
)
def q_bm25(spark, sf_dir):
    from arcadedb_spark.text.fulltext import bm25_search

    docs = _db(spark, sf_dir).table("documents")
    out = bm25_search(docs, "doc_id", "text", "fast join stream")
    return (
        out.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id", F.round("score", 4).alias("score"))
    )


@query(
    "q_ngram_jaccard",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}]+'),
                                 x -> length(x) > 0) AS t
      FROM documents
    ), gramsets AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(length(t) - 2, 1) + 1),
               i -> array_to_string(t[i:i+2], ' '))) AS g
      FROM toks
    ), inv AS (SELECT doc_id, unnest(g) AS gram FROM gramsets),
    rare AS (SELECT gram FROM inv GROUP BY gram HAVING count(*) <= 1000),
    inv2 AS (SELECT i.doc_id, i.gram FROM inv i JOIN rare USING (gram)),
    sizes AS (SELECT doc_id, count(*) AS sz FROM inv2 GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      FROM inv2 a JOIN inv2 b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           round(n_inter / (sa.sz + sb.sz - n_inter), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE n_inter / (sa.sz + sb.sz - n_inter) >= 0.3
    """,
)
def q_ngram_jaccard(spark, sf_dir):
    from arcadedb_spark.dedup import ngram_jaccard_pairs

    docs = _db(spark, sf_dir).table("documents")
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.3)
    return pairs.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


@query(
    "q_minhash_dedup",
    # Brute-force true word-3-shingle Jaccard ≥ 0.5.  The Spark side is
    # MinHash-LSH candidates + exact verify; equality with brute force IS
    # the recall proof (at this corpus the near-dup pairs sit at j ≥ 0.9,
    # where 8-band/4-row miss probability is < 2e-4 and the run is seeded).
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}]+'),
                                 x -> length(x) > 0) AS t
      FROM documents
    ), gramsets AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(length(t) - 2, 1) + 1),
               i -> array_to_string(t[i:i+2], ' '))) AS g
      FROM toks
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(length(list_intersect(a.g, b.g))::DOUBLE /
                 (length(a.g) + length(b.g) - length(list_intersect(a.g, b.g))), 4) AS jaccard
    FROM gramsets a JOIN gramsets b ON a.doc_id < b.doc_id
    WHERE length(list_intersect(a.g, b.g))::DOUBLE /
          (length(a.g) + length(b.g) - length(list_intersect(a.g, b.g))) >= 0.5
    """,
)
def q_minhash_dedup(spark, sf_dir):
    from arcadedb_spark.dedup import minhash_duplicate_pairs

    docs = _db(spark, sf_dir).table("documents")
    return minhash_duplicate_pairs(
        docs, "doc_id", "text", threshold=0.5, verify="exact"
    ).select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


@query(
    "q_simhash_dedup",
    oracle="""
    -- Golden pairs: simhash depends on xxhash64 (not DuckDB-expressible);
    -- the corpus is fixed (seed 42) and the pipeline deterministic, so the
    -- expected (id_a, id_b, hamming) set is pinned.  Regenerate with
    -- tools/regen_golden.py if the fixture ever changes.
    SELECT * FROM (VALUES
      (4,264,6), (4,328,5), (4,381,6), (5,14,6), (5,17,6), (5,31,6),
      (5,360,6), (5,401,5), (5,478,5), (7,221,6), (8,245,2), (9,264,5),
      (9,328,6), (9,340,6), (9,381,5), (9,422,6), (9,452,6), (10,490,6),
      (14,31,6), (14,251,6), (14,296,5), (14,337,4), (14,360,6), (17,71,6),
      (18,27,6), (18,465,6), (20,283,6), (22,473,6), (25,213,6), (26,455,4),
      (29,113,6), (29,221,6), (29,329,6), (31,139,6), (31,296,5), (31,300,5),
      (31,321,6), (31,337,6), (31,353,6), (31,383,4), (31,439,5), (32,178,6),
      (32,264,6), (32,449,6), (35,399,6), (40,329,6), (42,261,6), (43,472,6),
      (44,446,4), (45,267,5), (45,413,3), (51,369,4), (56,135,6), (56,161,6),
      (56,429,6), (58,293,0), (61,185,0), (63,66,6), (63,100,6), (63,490,6),
      (69,113,5), (69,249,5), (70,447,1), (72,377,4), (73,292,6), (76,102,2),
      (76,142,4), (82,452,6), (87,134,4), (92,450,4), (97,102,6), (98,290,2),
      (102,142,4), (102,187,6), (104,312,6), (105,118,6), (107,197,6),
      (107,387,1), (107,461,6), (109,357,6), (112,274,4), (113,221,4),
      (113,249,6), (113,259,5), (113,453,5), (120,332,3), (126,128,5),
      (126,167,6), (126,259,6), (128,300,4), (128,326,6), (128,336,6),
      (128,437,6), (128,442,5), (129,201,6), (131,285,6), (131,301,6),
      (135,321,6), (140,280,5), (142,187,6), (142,230,5), (145,280,5),
      (145,321,6), (147,176,6), (147,318,5), (147,411,5), (151,251,6),
      (151,422,6), (151,495,5), (152,178,5), (155,187,5), (155,230,6),
      (161,224,6), (166,323,3), (167,367,4), (169,230,6), (173,230,5),
      (173,249,6), (196,278,5), (197,263,5), (197,426,6), (197,461,6),
      (201,418,6), (205,376,6), (213,352,6), (220,330,6), (221,385,6),
      (242,353,6), (243,317,6), (251,353,6), (251,422,6), (251,439,5),
      (251,473,3), (258,264,6), (258,417,5), (259,453,6), (263,461,5),
      (264,336,6), (264,381,6), (264,452,5), (264,473,6), (267,413,2),
      (270,294,6), (271,360,6), (280,321,5), (280,478,6), (285,294,6),
      (285,301,0), (294,301,6), (295,374,5), (296,473,6), (300,353,5),
      (300,439,6), (300,473,6), (302,478,4), (310,389,4), (311,321,6),
      (314,336,6), (318,329,6), (321,440,6), (325,339,6), (326,457,2),
      (328,340,6), (328,381,5), (331,401,6), (336,376,6), (336,437,6),
      (336,495,6), (337,440,6), (344,356,6), (351,453,5), (351,495,6),
      (352,459,6), (353,473,5), (360,440,6), (360,478,5), (376,495,6),
      (378,479,6), (381,422,5), (393,420,0), (399,430,6), (401,478,6),
      (418,452,6), (422,426,6), (435,486,3), (439,473,6), (453,493,6),
      (453,495,5), (458,462,2)
    ) AS t(id_a, id_b, hamming)
    """,
)
def q_simhash_dedup(spark, sf_dir):
    from arcadedb_spark.dedup import simhash_duplicate_pairs

    docs = _db(spark, sf_dir).table("documents")
    return simhash_duplicate_pairs(docs, "doc_id", "text", max_hamming=6, bands=8)


@query(
    "q_language_id",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             list_distinct(list_filter(
               string_split_regex(lower(text), '[^\p{L}\p{N}]+'),
               x -> length(x) > 0)) AS toks
      FROM documents
    ), hits AS (
      SELECT doc_id,
        length(list_intersect(toks, ['the','and','of','to','in','is','that','it','for','a'])) AS s_en,
        length(list_intersect(toks, ['der','die','das','und','ist','nicht','ein','mit','auf','zu'])) AS s_de,
        length(list_intersect(toks, ['le','la','les','et','est','pas','un','une','dans','pour'])) AS s_fr,
        length(list_intersect(toks, ['el','la','los','las','es','no','un','una','en','por'])) AS s_es,
        length(list_intersect(toks, ['il','la','che','e','è','non','un','una','per','con'])) AS s_it
      FROM t
    ), lang AS (
      SELECT doc_id,
        CASE WHEN greatest(s_en, s_de, s_fr, s_es, s_it) < 2 THEN 'und'
             WHEN s_en = greatest(s_en, s_de, s_fr, s_es, s_it) THEN 'en'
             WHEN s_de = greatest(s_en, s_de, s_fr, s_es, s_it) THEN 'de'
             WHEN s_fr = greatest(s_en, s_de, s_fr, s_es, s_it) THEN 'fr'
             WHEN s_es = greatest(s_en, s_de, s_fr, s_es, s_it) THEN 'es'
             ELSE 'it' END AS lang
      FROM hits
    )
    SELECT lang, count(*) AS n FROM lang GROUP BY lang
    """,
)
def q_language_id(spark, sf_dir):
    from arcadedb_spark.text.analysis import language_id

    docs = _db(spark, sf_dir).table("documents")
    return docs.select(language_id("text").alias("lang")).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")
    )


# ===========================================================================
# Vector search
# ===========================================================================

_COS = (
    "list_inner_product(CAST(e.embedding AS DOUBLE[]), q.v) / "
    "(sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) "
    "* sqrt(list_inner_product(q.v, q.v)))"
)


@query(
    "q_knn_cosine",
    oracle=f"""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, round(score, 6) AS score FROM (
      SELECT e.vec_id, {_COS} AS score
      FROM embeddings e, q
      ORDER BY score DESC, e.vec_id LIMIT 10
    )
    """,
)
def q_knn_cosine(spark, sf_dir):
    from arcadedb_spark.vector import cosine_similarity

    emb = _db(spark, sf_dir).table("embeddings")
    # query vector rides the plan as a 1-row broadcast instead of a
    # separate driver collect — the whole search is ONE action, and the
    # lookup stays executor-side at cluster scale
    q = F.broadcast(
        emb.filter(F.col("vec_id") == 0)
        .select(F.col("embedding").cast("array<double>").alias("__qv"))
        .limit(1)
    )
    return (
        emb.crossJoin(q)
        .select(
            "vec_id",
            cosine_similarity(
                F.col("embedding").cast("array<double>"), F.col("__qv")
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(10)
        .select("vec_id", F.round("score", 6).alias("score"))
    )


@query(
    "q_knn_l2",
    oracle="""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, round(dist, 5) AS dist FROM (
      SELECT e.vec_id,
             list_distance(CAST(e.embedding AS DOUBLE[]), q.v) AS dist
      FROM embeddings e, q
      ORDER BY dist ASC, e.vec_id LIMIT 10
    )
    """,
)
def q_knn_l2(spark, sf_dir):
    from arcadedb_spark.vector import l2_distance

    emb = _db(spark, sf_dir).table("embeddings")
    # 1-row broadcast query vector — one action, no driver collect
    q = F.broadcast(
        emb.filter(F.col("vec_id") == 0)
        .select(F.col("embedding").cast("array<double>").alias("__qv"))
        .limit(1)
    )
    return (
        emb.crossJoin(q)
        .select(
            "vec_id",
            l2_distance(
                F.col("embedding").cast("array<double>"), F.col("__qv")
            ).alias("dist"),
        )
        .orderBy(F.asc("dist"), F.asc("vec_id"))
        .limit(10)
        .select("vec_id", F.round("dist", 5).alias("dist"))
    )


@query(
    "q_embedding_near_dup",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_inner_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
          / (sqrt(list_inner_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
             * sqrt(list_inner_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))
          >= 0.3
    """,
)
def q_embedding_near_dup(spark, sf_dir):
    from arcadedb_spark.vector import cosine_similarity

    emb = _db(spark, sf_dir).table("embeddings")
    a = emb.select(
        F.col("vec_id").alias("id_a"),
        F.col("label").alias("__la"),
        F.col("embedding").cast("array<double>").alias("__va"),
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"),
        F.col("label").alias("__lb"),
        F.col("embedding").cast("array<double>").alias("__vb"),
    )
    pairs = a.join(
        b, (F.col("__la") == F.col("__lb")) & (F.col("id_a") < F.col("id_b"))
    )
    return pairs.filter(
        cosine_similarity(F.col("__va"), F.col("__vb")) >= 0.3
    ).select("id_a", "id_b")


@query(
    "q_knn_lsh",
    # Exact top-5 per query — equality with the LSH path IS the recall
    # proof (measured recall@5 = 1.0 at planes=4/bands=24 on this corpus,
    # whose nearest neighbours sit at cosine ≈ 0.26-0.40; the hyperplane
    # family needs wide buckets in that regime).  Seeded → deterministic.
    oracle="""
    WITH scored AS (
      SELECT q.vec_id AS q_id, d.vec_id AS d_id,
             list_inner_product(CAST(q.embedding AS DOUBLE[]), CAST(d.embedding AS DOUBLE[]))
             / (sqrt(list_inner_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
                * sqrt(list_inner_product(CAST(d.embedding AS DOUBLE[]), CAST(d.embedding AS DOUBLE[])))) AS score
      FROM embeddings q, embeddings d
      WHERE q.vec_id < 5
    ), ranked AS (
      SELECT q_id, d_id, score,
             row_number() OVER (PARTITION BY q_id ORDER BY score DESC, d_id) AS rn
      FROM scored
    )
    SELECT q_id, d_id, round(score, 5) AS score FROM ranked WHERE rn <= 5
    """,
)
def q_knn_lsh(spark, sf_dir):
    from arcadedb_spark.vector import knn_lsh

    emb = _db(spark, sf_dir).table("embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    return knn_lsh(
        queries_df, emb, "vec_id", "embedding", "vec_id", "embedding",
        k=5, n_planes=4, n_bands=24,
    ).select("q_id", "d_id", F.round("score", 5).alias("score"))


@query(
    "q_vector_quantize",
    oracle="""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), q AS (
      SELECT vec_id, e,
             list_min(e) AS mn, list_max(e) AS mx
      FROM v
    ), dq AS (
      SELECT vec_id, e,
             list_transform(e, x ->
               (round((x - mn) / (mx - mn) * 255) - 128 + 128) / 255.0
                 * (mx - mn) + mn) AS back
      FROM q
    )
    SELECT vec_id,
           round(list_max(list_transform(range(1, len(e) + 1),
                 i -> abs(e[i] - back[i]))), 8) AS max_err
    FROM dq ORDER BY vec_id LIMIT 50
    """,
)
def q_vector_quantize(spark, sf_dir):
    """int8 min-max quantization roundtrip error per vector
    (SQLFunctionVectorQuantizeInt8/DequantizeInt8 parity)."""
    from arcadedb_spark.vector import dequantize_int8, quantize_int8

    emb = _db(spark, sf_dir).table("embeddings")
    return (
        emb.select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("e"),
            dequantize_int8(quantize_int8("embedding")).alias("back"),
        )
        .select(
            "vec_id",
            F.round(
                F.array_max(
                    F.zip_with("e", "back", lambda a, b: F.abs(a - b))
                ),
                8,
            ).alias("max_err"),
        )
        .orderBy("vec_id")
        .limit(50)
    )


@query(
    "q_binary_quantize_hamming",
    oracle="""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), m AS (
      SELECT vec_id, e,
             (list_sort(e)[len(e) // 2] + list_sort(e)[len(e) // 2 + 1]) / 2.0 AS med
      FROM v
    ), q AS (SELECT e AS qe, med AS qmed FROM m WHERE vec_id = 0)
    SELECT vec_id,
           len(list_filter(range(1, len(e) + 1),
               i -> (e[i] >= med) != (qe[i] >= qmed))) AS hamming
    FROM m, q
    ORDER BY hamming, vec_id LIMIT 20
    """,
)
def q_binary_quantize_hamming(spark, sf_dir):
    """Binary (median-threshold) quantization + Hamming distance to the
    vec_id=0 signature — the fast-scan path of
    SQLFunctionVectorQuantizeBinary / BinaryQuantizationResult.hammingDistance.
    The oracle counts sign-vs-median disagreements, which equals the
    packed-bit Hamming distance iff the bit packing is correct."""
    from arcadedb_spark.vector import binary_hamming, quantize_binary

    emb = _db(spark, sf_dir).table("embeddings")
    q0 = emb.filter(F.col("vec_id") == 0).select(
        quantize_binary("embedding").alias("qsig")
    )
    return (
        emb.crossJoin(F.broadcast(q0))
        .select(
            "vec_id",
            binary_hamming(quantize_binary("embedding"), F.col("qsig")).alias(
                "hamming"
            ),
        )
        .orderBy(F.asc("hamming"), F.asc("vec_id"))
        .limit(20)
    )


@query(
    "q_sparse_dot",
    oracle="""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             list_reverse(CAST(embedding AS DOUBLE[])) AS r
      FROM embeddings
    )
    SELECT vec_id,
           round(list_sum(list_transform(range(1, len(e) + 1), i ->
             (CASE WHEN abs(e[i]) > 0.1 THEN e[i] ELSE 0 END) *
             (CASE WHEN abs(r[i]) > 0.1 THEN r[i] ELSE 0 END))), 6) AS dot,
           len(list_filter(e, x -> abs(x) <= 0.1)) AS n_dropped
    FROM v ORDER BY vec_id LIMIT 50
    """,
)
def q_sparse_dot(spark, sf_dir):
    """Sparse-vector dot product (SparseVector.dotProduct / vector.sparseDot):
    sparsify at |v| > 0.1, dot each embedding with its reverse."""
    from arcadedb_spark.vector import dense_to_sparse, sparse_dot

    emb = _db(spark, sf_dir).table("embeddings")
    e = F.col("embedding").cast("array<double>")
    return (
        emb.select(
            "vec_id",
            F.round(
                sparse_dot(
                    dense_to_sparse(e, 0.1), dense_to_sparse(F.reverse(e), 0.1)
                ),
                6,
            ).alias("dot"),
            F.size(F.filter(e, lambda x: F.abs(x) <= 0.1)).alias("n_dropped"),
        )
        .orderBy("vec_id")
        .limit(50)
    )


@query(
    "q_knn_ivf",
    # The query MEASURES IVF recall@5 against the exact kernel inside
    # Spark (seeded KMeans → deterministic); the oracle pins the measured
    # value.  0.96 = 24/25 true neighbours found probing 8/16 cells —
    # honest ANN quality, asserted ≥ 0.9 in tests/test_vector_*.
    oracle="""
    SELECT 16 AS n_lists, 8 AS nprobe, 5 AS k, 5 AS n_queries,
           CAST(0.96 AS DOUBLE) AS recall_at_k
    """,
)
def q_knn_ivf(spark, sf_dir):
    """IVF-partitioned ANN (the Spark-scale stand-in for the reference's
    HNSW LSMVectorIndex, index/vector/LSMVectorIndex.java:68): recall@5
    of the probed search vs the exact crossJoin kernel."""
    from arcadedb_spark.vector import ivf_build
    from arcadedb_spark.vector.ivf import ivf_search_join
    from arcadedb_spark.vector.knn import knn_join_exact

    emb = _db(spark, sf_dir).table("embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    idx = ivf_build(emb, "vec_id", "embedding", n_lists=16, seed=42)
    approx = ivf_search_join(idx, queries_df, "vec_id", "embedding", k=5, nprobe=8)
    exact = knn_join_exact(
        queries_df, emb, "vec_id", "embedding", "vec_id", "embedding", k=5
    )
    hits = approx.select("q_id", "d_id").join(
        exact.select("q_id", "d_id"), ["q_id", "d_id"]
    )
    return hits.agg(
        F.lit(16).alias("n_lists"),
        F.lit(8).alias("nprobe"),
        F.lit(5).alias("k"),
        F.countDistinct("q_id").cast("int").alias("n_queries"),
        (F.count(F.lit(1)) / F.lit(25.0)).alias("recall_at_k"),
    )


@query(
    "q_multimodal_features",
    # the byte-statistics feature kernel (multimodal/codecs.byte_features)
    # re-derived independently in SQL: full VALUE check, not just shape.
    # Restricted to ASCII docs so char ops == byte ops on both engines.
    oracle=r"""
    WITH ascii_docs AS (
      SELECT doc_id, text FROM documents
      WHERE NOT regexp_matches(text, '[^\x01-\x7F]') AND length(text) > 0
    )
    SELECT doc_id AS id,
      CAST(strlen(text) AS DOUBLE) AS f_len,
      round(CAST(list_sum(list_transform(string_split(text, ''),
                                         x -> ord(x))) AS DOUBLE)
            / strlen(text), 3) + 0.0 AS f_mean_byte,
      round(CAST(strlen(text)
                 - strlen(regexp_replace(text, '[ \t\n\r]', '', 'g'))
                 AS DOUBLE) / strlen(text), 4) + 0.0 AS f_ws,
      round(CAST(strlen(text)
                 - strlen(regexp_replace(text, '[0-9]', '', 'g'))
                 AS DOUBLE) / strlen(text), 4) + 0.0 AS f_digit,
      round(CAST(strlen(text)
                 - strlen(regexp_replace(text, '[a-z]', '', 'g'))
                 AS DOUBLE) / strlen(text), 4) + 0.0 AS f_lower,
      CAST(length(list_distinct(string_split(text, ''))) AS DOUBLE)
        AS f_distinct
    FROM ascii_docs
    """,
)
def q_multimodal_features(spark, sf_dir):
    """Multimodal feature extraction with the REAL byte-statistics kernel
    (multimodal/codecs.byte_features over mapInPandas Arrow batches);
    every emitted value is re-derived by the DuckDB oracle."""
    from arcadedb_spark.multimodal import extract_features

    docs = _db(spark, sf_dir).table("documents")
    media = docs.filter(
        ~F.col("text").rlike("[^\x01-\x7F]") & (F.length("text") > 0)
    ).select("doc_id", F.col("text").cast("binary").alias("blob"))
    feats = extract_features(media, "blob", "doc_id", dim=8)
    f = lambda i: F.element_at("features", i).cast("double")  # noqa: E731
    return feats.select(
        "id",
        f(1).alias("f_len"),
        (F.round(f(2), 3) + F.lit(0.0)).alias("f_mean_byte"),
        (F.round(f(3), 4) + F.lit(0.0)).alias("f_ws"),
        (F.round(f(4), 4) + F.lit(0.0)).alias("f_digit"),
        (F.round(f(5), 4) + F.lit(0.0)).alias("f_lower"),
        f(7).alias("f_distinct"),
    )


# ===========================================================================
# Round-1 extensions: expand, dialect ts.*, hybrid scoring, interpolation,
# CONTAINS family, math/conversion surfaces, DML roundtrip
# ===========================================================================


@query(
    "q_expand",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus, o.o_totalprice,
           o.o_orderdate, o.o_orderpriority
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey < 3
    """,
)
def q_expand(spark, sf_dir):
    return _db(spark, sf_dir).query(
        "SELECT expand(out('PLACED')) FROM Customer WHERE c_custkey < 3"
    )


@query(
    "q_ts_sql_bucket",
    oracle="""
    SELECT ((epoch_ms(ts) // 3600000) * 3600000) // 1000 AS bucket_s,
           count(*) AS cnt,
           CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_val
    FROM events GROUP BY 1
    """,
)
def q_ts_sql_bucket(spark, sf_dir):
    # reference syntax: ts.timeBucket('1h', ts) (WindowFunctionTest.java)
    return _db(spark, sf_dir).query(
        "SELECT ts.timeBucket('1h', ts).asLong() AS bucket_s, count(*) AS cnt, "
        "sum(value.convert('decimal(25,6)')).asDouble() AS sum_val "
        "FROM events GROUP BY bucket_s"
    )


@query(
    "q_ts_sql_lag_grouped",
    oracle="""
    SELECT event_id,
           round(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4) AS d
    FROM events
    """,
)
def q_ts_sql_lag_grouped(spark, sf_dir):
    # GROUP BY doubles as PARTITION BY for windowed ts functions
    # (reference GroupedDelta test shape)
    return _db(spark, sf_dir).query(
        "SELECT event_id, round(ts.delta(value, ts), 4) AS d "
        "FROM events GROUP BY user_id"
    )


@query(
    "q_rrf_hybrid",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}]+'),
                                 x -> length(x) > 0) AS t
      FROM documents
    ), lens AS (SELECT doc_id, length(t) AS dl FROM toks),
    stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM lens),
    postings AS (
      SELECT doc_id, term, count(*) AS tf
      FROM (SELECT doc_id, unnest(t) AS term FROM toks) GROUP BY 1, 2
    ),
    q(term) AS (SELECT unnest(['fast', 'join', 'stream'])),
    hits AS (SELECT p.doc_id, p.term, p.tf FROM postings p JOIN q USING (term)),
    dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM hits GROUP BY 1),
    idf AS (
      SELECT term, ln((((SELECT n FROM stats) - df + 0.5) / (df + 0.5)) + 1.0) AS idf
      FROM dfreq
    ),
    text_scored AS (
      SELECT h.doc_id,
             sum(idf.idf * (h.tf * 2.2)
                 / (h.tf + 1.2 * (0.25 + 0.75 * lens.dl / (SELECT avgdl FROM stats)))) AS score
      FROM hits h JOIN idf USING (term) JOIN lens USING (doc_id) GROUP BY 1
    ),
    text_rank AS (
      SELECT doc_id AS id, row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
      FROM text_scored ORDER BY score DESC, doc_id LIMIT 20
    ),
    qv AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0),
    vec_scored AS (
      SELECT e.vec_id,
             list_inner_product(CAST(e.embedding AS DOUBLE[]), qv.v)
             / (sqrt(list_inner_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
                * sqrt(list_inner_product(qv.v, qv.v))) AS score
      FROM embeddings e, qv
    ),
    vec_rank AS (
      SELECT vec_id AS id, row_number() OVER (ORDER BY score DESC, vec_id) AS rnk
      FROM vec_scored ORDER BY score DESC, vec_id LIMIT 20
    ),
    fused AS (
      SELECT id, CAST(sum(1.0 / (60 + rnk)) AS DOUBLE) AS rrf_score
      FROM (SELECT * FROM text_rank UNION ALL SELECT * FROM vec_rank)
      GROUP BY id
    )
    SELECT id, round(rrf_score, 6) AS rrf_score
    FROM (SELECT * FROM fused ORDER BY rrf_score DESC, id LIMIT 10)
    """,
)
def q_rrf_hybrid(spark, sf_dir):
    from arcadedb_spark.text.fulltext import bm25_search
    from arcadedb_spark.vector import cosine_similarity, rrf_fuse

    db = _db(spark, sf_dir)
    docs = db.table("documents")
    emb = db.table("embeddings")
    text_rank = (
        bm25_search(docs, "doc_id", "text", "fast join stream")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
        .select(
            "doc_id",
            # bounded-window ok: input is .limit(20) — 20 rows total
            F.row_number()
            .over(__import__("pyspark.sql.window", fromlist=["Window"]).Window.orderBy(
                F.desc("score"), F.asc("doc_id")
            ))
            .alias("rank"),
        )
    )
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    qcol = F.array(*[F.lit(v) for v in qv])
    from pyspark.sql import Window

    vec_rank = (
        emb.select(
            F.col("vec_id").alias("doc_id"),
            cosine_similarity(F.col("embedding").cast("array<double>"), qcol).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
        .select(
            "doc_id",
            # bounded-window ok: input is .limit(20) — 20 rows total
            F.row_number()
            .over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
            .alias("rank"),
        )
    )
    fused = rrf_fuse(text_rank, vec_rank, id_col="doc_id", rank_col="rank", k=60)
    return (
        fused.orderBy(F.desc("rrf_score"), F.asc("id"))
        .limit(10)
        .select("id", F.round("rrf_score", 6).alias("rrf_score"))
    )


@query(
    "q_interpolate",
    oracle="""
    WITH s AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_id % 7 <> 0 THEN value END AS v
      FROM events
    ), w AS (
      SELECT event_id, user_id, epoch_ms(ts) AS t, v,
             last_value(v IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             first_value(v IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             last_value(CASE WHEN v IS NOT NULL THEN epoch_ms(ts) END IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
             first_value(CASE WHEN v IS NOT NULL THEN epoch_ms(ts) END IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      FROM s
    )
    SELECT event_id,
           round(CASE WHEN v IS NOT NULL THEN v
                 ELSE pv + (nv - pv) * (CASE WHEN nt <> pt
                                        THEN (t - pt) / (nt - pt) ELSE 0.0 END)
                 END, 4) AS interp
    FROM w
    """,
)
def q_interpolate(spark, sf_dir):
    from arcadedb_spark.timeseries.functions import interpolate_linear

    ev = _db(spark, sf_dir).table("events")
    sparse = ev.select(
        "event_id", "user_id", "ts",
        F.when(F.col("event_id") % 7 != 0, F.col("value")).alias("v"),
    )
    interp = interpolate_linear(sparse, "v", "ts", "user_id")
    return sparse.select("event_id", F.round(interp, 4).alias("interp"))


@query(
    "q_contains_ops",
    oracle="""
    SELECT count(CASE WHEN list_contains(string_split(text, ' '), 'fast')
                 THEN 1 END) AS n_contains,
           count(CASE WHEN length(list_intersect(string_split(text, ' '),
                                                 ['fast', 'slow'])) > 0
                 THEN 1 END) AS n_any,
           count(CASE WHEN text ILIKE '%fast%join%' THEN 1 END) AS n_liketext
    FROM documents
    """,
)
def q_contains_ops(spark, sf_dir):
    return _db(spark, sf_dir).query(
        """
        SELECT count(if(text.split(' ') CONTAINS 'fast', 1, null)) AS n_contains,
               count(if(text.split(' ') CONTAINSANY ['fast', 'slow'], 1, null)) AS n_any,
               count(if(text ILIKE '%fast%join%', 1, null)) AS n_liketext
        FROM documents
        """
    )


@query(
    "q_math_functions",
    oracle="""
    SELECT o_orderkey,
           round(sqrt(o_totalprice), 6) AS sq,
           round(abs(o_totalprice - 200000), 6) AS ab,
           CAST(floor(o_totalprice / 1000) AS BIGINT) AS fl,
           CAST(ceil(o_totalprice / 1000) AS BIGINT) AS ce,
           round(sign(o_totalprice - 200000), 1) AS sg
    FROM orders WHERE o_orderkey < 100
    """,
)
def q_math_functions(spark, sf_dir):
    return _db(spark, sf_dir).query(
        """
        SELECT o_orderkey,
               round(sqrt(o_totalprice), 6) AS sq,
               round(abs(o_totalprice - 200000), 6) AS ab,
               floor(o_totalprice / 1000) AS fl,
               ceil(o_totalprice / 1000) AS ce,
               round(sign(o_totalprice - 200000), 1) AS sg
        FROM orders WHERE o_orderkey < 100
        """
    )


@query(
    "q_conversion_methods",
    oracle="""
    SELECT o_orderkey,
           CAST(trunc(o_totalprice) AS BIGINT) AS as_long,
           CAST(o_totalprice AS VARCHAR) AS as_str,
           CAST(o_orderkey AS DOUBLE) AS as_dbl
    FROM orders WHERE o_orderkey < 50
    """,
)
def q_conversion_methods(spark, sf_dir):
    return _db(spark, sf_dir).query(
        """
        SELECT o_orderkey,
               o_totalprice.asLong() AS as_long,
               o_totalprice.asString() AS as_str,
               o_orderkey.asDouble() AS as_dbl
        FROM orders WHERE o_orderkey < 50
        """
    )


@query(
    "q_dml_roundtrip",
    oracle="""
    SELECT name, CAST(score AS DOUBLE) AS score FROM (VALUES ('a', 99.0), ('c', 3.0)) AS t(name, score)
    """,
)
def q_dml_roundtrip(spark, sf_dir):
    db = _db(spark, sf_dir)
    db.command("DROP TYPE DmlScratch IF EXISTS")
    db.command("CREATE DOCUMENT TYPE DmlScratch")
    db.command(
        "INSERT INTO DmlScratch (name, score) VALUES ('a', 1.0), ('b', 2.0), ('c', 3.0)"
    )
    db.command("UPDATE DmlScratch SET score = 99.0 WHERE name = 'a'")
    db.command("DELETE FROM DmlScratch WHERE name = 'b'")
    return db.query("SELECT name, score FROM DmlScratch ORDER BY name")


@query(
    "q_gav_read",
    oracle="""
    SELECT o_custkey AS custkey, count(*) AS n
    FROM orders GROUP BY 1 ORDER BY 1
    """,
)
def q_gav_read(spark, sf_dir):
    """Graph Analytical View read parity: per-customer out-degree over a
    built GAV (CSR analog: src-partitioned sorted cached edge frame,
    graph/olap/CSRBuilder.java) equals the live-edge aggregation."""
    db = _db(spark, sf_dir)
    db.command(
        "CREATE GRAPH ANALYTICAL VIEW IF NOT EXISTS placedView "
        "EDGE TYPES (PLACED)"
    )
    g = db.graph()
    gav = db._gavs["placedView"]
    base = db.schema.get("customer").bucket_id << 40
    return (
        gav.edges(g)
        .select((F.col("src") - F.lit(base)).alias("custkey"))
        .groupBy("custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("custkey")
    )


@query(
    "q_mv_incremental_equiv",
    oracle="""
    SELECT region, CAST(total AS DOUBLE) AS total FROM (VALUES
      ('e', 30.0), ('n', 10.0), ('s', 20.0), ('w', 45.0)
    ) AS t(region, total) ORDER BY region
    """,
)
def q_mv_incremental_equiv(spark, sf_dir):
    """Aggregated-MV incremental refresh equivalence
    (schema/MaterializedViewRefresher.java INCREMENTAL): after an
    append-only delta, the dirty-bucket recompute must equal a full
    recompute of the view query (pinned literal oracle — the scratch
    type never touches the driver tables)."""
    db = _db(spark, sf_dir)
    db.command("DROP MATERIALIZED VIEW MvScratchTotals IF EXISTS")
    db.command("DROP TYPE MvScratchSale IF EXISTS")
    db.command("CREATE DOCUMENT TYPE MvScratchSale")
    db.command(
        "INSERT INTO MvScratchSale (region, amount) VALUES "
        "('n', 10.0), ('s', 20.0), ('w', 40.0)"
    )
    db.command(
        "CREATE MATERIALIZED VIEW MvScratchTotals AS "
        "SELECT region, sum(amount) AS total FROM MvScratchSale "
        "GROUP BY region REFRESH INCREMENTAL"
    )
    db.command(
        "INSERT INTO MvScratchSale (region, amount) VALUES "
        "('e', 30.0), ('w', 5.0)"
    )
    db.command("REFRESH MATERIALIZED VIEW MvScratchTotals")
    return db.query(
        "SELECT region, total FROM MvScratchTotals ORDER BY region"
    )


_EVENTS_UND_ADJ = """
    pairs AS (
      SELECT user_id AS s, lead(user_id) OVER (ORDER BY ts, event_id) AS d
      FROM events
    ), e0 AS (
      SELECT DISTINCT s, d FROM pairs WHERE d IS NOT NULL AND s <> d
    ), adj AS (
      SELECT DISTINCT v, n FROM (
        SELECT s AS v, d AS n FROM e0 UNION ALL SELECT d AS v, s AS n FROM e0
      ) WHERE v <> n
    )
"""


@query(
    "q_common_neighbors",
    oracle=f"""
    WITH {_EVENTS_UND_ADJ}
    SELECT l.v AS a, r.v AS b, count(*) AS n_common
    FROM adj l JOIN adj r ON l.n = r.n AND l.v < r.v
    GROUP BY 1, 2
    ORDER BY n_common DESC, a, b LIMIT 20
    """,
)
def q_common_neighbors(spark, sf_dir):
    from arcadedb_spark.graph.algorithms import common_neighbors

    db = _db(spark, sf_dir)
    g = db.graph()
    base = db.schema.get("customer").bucket_id << 40
    cn = common_neighbors(g.edges("INTERACTED"))
    return (
        cn.select(
            (F.col("a") - base).alias("a"), (F.col("b") - base).alias("b"), "n_common"
        )
        .orderBy(F.desc("n_common"), F.asc("a"), F.asc("b"))
        .limit(20)
    )


@query(
    "q_jaccard_link_prediction",
    oracle=f"""
    WITH {_EVENTS_UND_ADJ},
    deg AS (SELECT v, count(*) AS d FROM adj GROUP BY v),
    cn AS (
      SELECT l.v AS a, r.v AS b, count(*) AS n_common
      FROM adj l JOIN adj r ON l.n = r.n AND l.v < r.v
      GROUP BY 1, 2
    )
    SELECT a, b, round(n_common / (da.d + db.d - n_common), 4) AS jaccard
    FROM cn JOIN deg da ON da.v = a JOIN deg db ON db.v = b
    ORDER BY jaccard DESC, a, b LIMIT 20
    """,
)
def q_jaccard_link_prediction(spark, sf_dir):
    from arcadedb_spark.graph.algorithms import jaccard_similarity

    db = _db(spark, sf_dir)
    g = db.graph()
    base = db.schema.get("customer").bucket_id << 40
    j = jaccard_similarity(g.edges("INTERACTED"))
    return (
        j.select(
            (F.col("a") - base).alias("a"),
            (F.col("b") - base).alias("b"),
            F.round("jaccard", 4).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), F.asc("a"), F.asc("b"))
        .limit(20)
    )


@query(
    "q_adamic_adar",
    oracle=f"""
    WITH {_EVENTS_UND_ADJ},
    deg AS (SELECT v, count(*) AS d FROM adj GROUP BY v),
    w AS (SELECT adj.v, adj.n, deg.d AS dn FROM adj JOIN deg ON deg.v = adj.n
          WHERE deg.d > 1)
    SELECT l.v AS a, r.v AS b,
           round(sum(1.0 / ln(l.dn)), 4) AS score
    FROM w l JOIN w r ON l.n = r.n AND l.v < r.v
    GROUP BY 1, 2
    ORDER BY score DESC, a, b LIMIT 20
    """,
)
def q_adamic_adar(spark, sf_dir):
    from arcadedb_spark.graph.algorithms import adamic_adar

    db = _db(spark, sf_dir)
    g = db.graph()
    base = db.schema.get("customer").bucket_id << 40
    aa = adamic_adar(g.edges("INTERACTED"))
    return (
        aa.select(
            (F.col("a") - base).alias("a"),
            (F.col("b") - base).alias("b"),
            F.round("score", 4).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("a"), F.asc("b"))
        .limit(20)
    )


def _k_core_oracle(k: int = 4, rounds: int = 25) -> str:
    """Unrolled k-core peeling in DuckDB SQL — mirrors
    algorithms.k_core: each round keeps vertices whose degree within the
    surviving subgraph is >= k.  25 unrolled rounds: peeling removes at
    least one vertex per non-converged round, and the INTERACTED fixture
    converges in <10 rounds at every sf the driver uses (monotone —
    extra rounds past the fixpoint are no-ops)."""
    cte = [f"""
    pairs AS MATERIALIZED (
      SELECT user_id AS s, lead(user_id) OVER (ORDER BY ts, event_id) AS d
      FROM events
    ), e0 AS MATERIALIZED (
      SELECT DISTINCT s, d FROM pairs WHERE d IS NOT NULL AND s <> d
    ), adj AS MATERIALIZED (
      SELECT DISTINCT v, n FROM (
        SELECT s AS v, d AS n FROM e0 UNION ALL SELECT d AS v, s AS n FROM e0
      ) WHERE v <> n
    ),
    alive0 AS MATERIALIZED (SELECT DISTINCT v FROM adj)"""]
    for i in range(1, rounds + 1):
        cte.append(f"""
    alive{i} AS MATERIALIZED (
      SELECT adj.v FROM adj
      JOIN alive{i-1} a1 ON a1.v = adj.v
      JOIN alive{i-1} a2 ON a2.v = adj.n
      GROUP BY adj.v HAVING count(*) >= {k}
    )""")
    return (
        "WITH " + ",".join(cte)
        + f"""
    SELECT v AS user_id FROM alive{rounds} ORDER BY user_id
    """
    )


@query("q_k_core", oracle=_k_core_oracle(4))
def q_k_core(spark, sf_dir):
    """4-core membership vs an unrolled DuckDB peeling oracle
    (AlgoKCore.java parity)."""
    from arcadedb_spark.graph.algorithms import k_core

    db = _db(spark, sf_dir)
    g = db.graph()
    base = db.schema.get("customer").bucket_id << 40
    core = k_core(g.edges("INTERACTED"), k=4)
    return core.select((F.col("vid") - base).alias("user_id")).orderBy("user_id")


@query(
    "q_preferential_attachment",
    oracle=f"""
    WITH {_EVENTS_UND_ADJ},
    deg AS (SELECT v, count(*) AS d FROM adj GROUP BY v),
    cn AS (
      SELECT l.v AS a, r.v AS b
      FROM adj l JOIN adj r ON l.n = r.n AND l.v < r.v
      GROUP BY 1, 2
    )
    SELECT a, b, CAST(da.d * db.d AS BIGINT) AS score
    FROM cn JOIN deg da ON da.v = a JOIN deg db ON db.v = b
    ORDER BY score DESC, a, b LIMIT 20
    """,
)
def q_preferential_attachment(spark, sf_dir):
    from arcadedb_spark.graph.algorithms_more import preferential_attachment

    db = _db(spark, sf_dir)
    base = db.schema.get("customer").bucket_id << 40
    pa = preferential_attachment(db.graph().edges("INTERACTED"))
    return (
        pa.select((F.col("a") - base).alias("a"), (F.col("b") - base).alias("b"), "score")
        .orderBy(F.desc("score"), F.asc("a"), F.asc("b"))
        .limit(20)
    )


@query(
    "q_total_neighbors",
    oracle=f"""
    WITH {_EVENTS_UND_ADJ},
    deg AS (SELECT v, count(*) AS d FROM adj GROUP BY v),
    cn AS (
      SELECT l.v AS a, r.v AS b, count(*) AS n_common
      FROM adj l JOIN adj r ON l.n = r.n AND l.v < r.v
      GROUP BY 1, 2
    )
    SELECT a, b, CAST(da.d + db.d - n_common AS BIGINT) AS total
    FROM cn JOIN deg da ON da.v = a JOIN deg db ON db.v = b
    ORDER BY total DESC, a, b LIMIT 20
    """,
)
def q_total_neighbors(spark, sf_dir):
    from arcadedb_spark.graph.algorithms_more import total_neighbors

    db = _db(spark, sf_dir)
    base = db.schema.get("customer").bucket_id << 40
    tn = total_neighbors(db.graph().edges("INTERACTED"))
    return (
        tn.select((F.col("a") - base).alias("a"), (F.col("b") - base).alias("b"), "total")
        .orderBy(F.desc("total"), F.asc("a"), F.asc("b"))
        .limit(20)
    )


@query(
    "q_resource_allocation",
    oracle=f"""
    WITH {_EVENTS_UND_ADJ},
    deg AS (SELECT v, count(*) AS d FROM adj GROUP BY v),
    w AS (SELECT adj.v, adj.n, deg.d AS dn FROM adj JOIN deg ON deg.v = adj.n)
    SELECT l.v AS a, r.v AS b, round(sum(1.0 / l.dn), 4) AS score
    FROM w l JOIN w r ON l.n = r.n AND l.v < r.v
    GROUP BY 1, 2
    ORDER BY score DESC, a, b LIMIT 20
    """,
)
def q_resource_allocation(spark, sf_dir):
    from arcadedb_spark.graph.algorithms_more import resource_allocation

    db = _db(spark, sf_dir)
    base = db.schema.get("customer").bucket_id << 40
    ra = resource_allocation(db.graph().edges("INTERACTED"))
    return (
        ra.select(
            (F.col("a") - base).alias("a"),
            (F.col("b") - base).alias("b"),
            F.round("score", 4).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("a"), F.asc("b"))
        .limit(20)
    )


@query(
    "q_clustering_coefficient",
    oracle=f"""
    WITH {_EVENTS_UND_ADJ},
    und AS (SELECT DISTINCT v AS a, n AS b FROM adj WHERE v < n),
    deg AS (SELECT v, count(*) AS d FROM adj GROUP BY v),
    tri AS (
      SELECT x.v, count(*) AS t
      FROM adj x JOIN adj y ON x.v = y.v AND x.n < y.n
      JOIN und e ON e.a = x.n AND e.b = y.n
      GROUP BY x.v
    )
    SELECT deg.v AS user_id,
           round(CASE WHEN deg.d >= 2
                 THEN 2.0 * coalesce(tri.t, 0) / (deg.d * (deg.d - 1))
                 ELSE 0.0 END, 4) AS lcc
    FROM deg LEFT JOIN tri ON tri.v = deg.v
    ORDER BY lcc DESC, user_id LIMIT 30
    """,
)
def q_clustering_coefficient(spark, sf_dir):
    from arcadedb_spark.graph.algorithms_more import local_clustering_coefficient

    db = _db(spark, sf_dir)
    base = db.schema.get("customer").bucket_id << 40
    lcc = local_clustering_coefficient(db.graph().edges("INTERACTED"))
    return (
        lcc.select(
            (F.col("vid") - base).alias("user_id"), F.round("lcc", 4).alias("lcc")
        )
        .orderBy(F.desc("lcc"), F.asc("user_id"))
        .limit(30)
    )


@query(
    "q_harmonic_centrality",
    oracle="""
    WITH RECURSIVE pairs AS (
      SELECT user_id AS s, lead(user_id) OVER (ORDER BY ts, event_id) AS d
      FROM events
    ), e0 AS (
      SELECT DISTINCT s, d FROM pairs WHERE d IS NOT NULL AND s <> d
    ), lm AS (
      SELECT v FROM (SELECT DISTINCT s AS v FROM e0) ORDER BY v LIMIT 32
    ), walk(lmv, v, dd) AS (
      SELECT v, v, 0 FROM lm
      UNION
      SELECT walk.lmv, e0.s, walk.dd + 1
      FROM walk JOIN e0 ON e0.d = walk.v WHERE walk.dd < 6
    ), dist AS (
      SELECT lmv, v, min(dd) AS dd FROM walk GROUP BY lmv, v
    ), verts AS (
      SELECT DISTINCT v FROM (SELECT s AS v FROM e0 UNION ALL SELECT d FROM e0)
    ), h AS (
      SELECT verts.v, coalesce(sum(1.0 / dist.dd), 0.0) / 31.0 AS harmonic
      FROM verts LEFT JOIN dist ON dist.v = verts.v AND dist.dd > 0
      GROUP BY verts.v
    )
    SELECT v AS user_id, round(harmonic, 4) AS harmonic
    FROM h ORDER BY harmonic DESC, user_id LIMIT 20
    """,
)
def q_harmonic_centrality(spark, sf_dir):
    from arcadedb_spark.graph.algorithms_more import harmonic_centrality

    db = _db(spark, sf_dir)
    base = db.schema.get("customer").bucket_id << 40
    edges = db.graph().edges("INTERACTED")
    landmarks = [
        r[0] for r in edges.select(F.col("src").alias("v")).distinct()
        .orderBy("v").limit(32).collect()
    ]
    h = harmonic_centrality(edges, landmarks=landmarks, max_depth=6)
    return (
        h.select((F.col("vid") - base).alias("user_id"), F.round("harmonic", 4).alias("harmonic"))
        .orderBy(F.desc("harmonic"), F.asc("user_id"))
        .limit(20)
    )


def _hits_oracle(iterations: int = 8) -> str:
    """Unrolled HITS in DuckDB SQL — mirrors algorithms_more.hits exactly
    (max-normalized per half-step: authority from previous hub, then hub
    from the NEW authority).  MATERIALIZED throughout — see
    _pagerank_oracle."""
    cte = ["""
    pairs AS MATERIALIZED (
      SELECT user_id AS s, lead(user_id) OVER (ORDER BY ts, event_id) AS d
      FROM events
    ), e0 AS MATERIALIZED (
      SELECT DISTINCT s, d FROM pairs WHERE d IS NOT NULL AND s <> d
    ), verts AS MATERIALIZED (
      SELECT DISTINCT v FROM (SELECT s AS v FROM e0 UNION ALL SELECT d FROM e0)
    ),
    h0 AS MATERIALIZED (SELECT v, 1.0 AS hub FROM verts)"""]
    for i in range(1, iterations + 1):
        cte.append(f"""
    na{i} AS MATERIALIZED (
      SELECT verts.v, coalesce(sums.a, 0.0) AS a
      FROM verts LEFT JOIN (
        SELECT e0.d AS v, sum(h.hub) AS a
        FROM e0 JOIN h{i-1} h ON h.v = e0.s GROUP BY e0.d
      ) sums ON sums.v = verts.v
    ), a{i} AS MATERIALIZED (
      SELECT v, a / (SELECT coalesce(nullif(max(a), 0.0), 1.0) FROM na{i}) AS a
      FROM na{i}
    ), nh{i} AS MATERIALIZED (
      SELECT verts.v, coalesce(sums.h, 0.0) AS h
      FROM verts LEFT JOIN (
        SELECT e0.s AS v, sum(a.a) AS h
        FROM e0 JOIN a{i} a ON a.v = e0.d GROUP BY e0.s
      ) sums ON sums.v = verts.v
    ), h{i} AS MATERIALIZED (
      SELECT v, h / (SELECT coalesce(nullif(max(h), 0.0), 1.0) FROM nh{i}) AS hub
      FROM nh{i}
    )""")
    return (
        "WITH " + ",".join(cte)
        + f"""
    SELECT h.v AS user_id, round(h.hub, 4) AS hub, round(a.a, 4) AS authority
    FROM h{iterations} h JOIN a{iterations} a ON a.v = h.v
    ORDER BY authority DESC, user_id LIMIT 20
    """
    )


@query("q_hits", oracle=_hits_oracle(8))
def q_hits(spark, sf_dir):
    """HITS vs an 8-iteration unrolled DuckDB oracle (AlgoHITS.java
    parity: per-half-step max normalization)."""
    from arcadedb_spark.graph.algorithms_more import hits

    db = _db(spark, sf_dir)
    base = db.schema.get("customer").bucket_id << 40
    h = hits(db.graph().edges("INTERACTED"), iterations=8)
    return (
        h.select(
            (F.col("vid") - base).alias("user_id"),
            F.round("hub", 4).alias("hub"),
            F.round("authority", 4).alias("authority"),
        )
        .orderBy(F.desc("authority"), F.asc("user_id"))
        .limit(20)
    )


def _article_rank_oracle(iterations: int = 10) -> str:
    """Unrolled ArticleRank in DuckDB SQL — mirrors
    algorithms_more.article_rank (AlgoArticleRank.java:169-187): rank
    init 1/N, contribution share 1/(outdeg + avg_outdeg), damping 0.85,
    dangling mass redistributed uniformly."""
    cte = ["""
    pairs AS MATERIALIZED (
      SELECT user_id AS s, lead(user_id) OVER (ORDER BY ts, event_id) AS d
      FROM events
    ), e0 AS MATERIALIZED (
      SELECT DISTINCT s, d FROM pairs WHERE d IS NOT NULL AND s <> d
    ), verts AS MATERIALIZED (
      SELECT DISTINCT v FROM (SELECT s AS v FROM e0 UNION ALL SELECT d FROM e0)
    ), nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
    avgout AS MATERIALIZED (
      SELECT (SELECT CAST(count(*) AS DOUBLE) FROM e0) / (SELECT n FROM nn) AS a
    ),
    share AS MATERIALIZED (
      SELECT s, 1.0 / (count(*) + (SELECT a FROM avgout)) AS sh
      FROM e0 GROUP BY s
    ),
    r0 AS MATERIALIZED (SELECT v, 1.0 / (SELECT n FROM nn) AS rank FROM verts)"""]
    for i in range(1, iterations + 1):
        cte.append(f"""
    c{i} AS MATERIALIZED (
      SELECT e0.d AS v, sum(r.rank * share.sh) AS c
      FROM e0 JOIN r{i-1} r ON r.v = e0.s JOIN share ON share.s = e0.s
      GROUP BY e0.d
    ), dang{i} AS MATERIALIZED (
      SELECT coalesce(sum(rank), 0.0) AS m FROM r{i-1}
      WHERE v NOT IN (SELECT s FROM share)
    ), r{i} AS MATERIALIZED (
      SELECT verts.v,
             0.15 / (SELECT n FROM nn) + 0.85 * (coalesce(c{i}.c, 0.0)
               + (SELECT m FROM dang{i}) / (SELECT n FROM nn)) AS rank
      FROM verts LEFT JOIN c{i} ON c{i}.v = verts.v
    )""")
    return (
        "WITH " + ",".join(cte)
        + f"""
    SELECT v AS user_id, round(rank, 6) AS rank
    FROM r{iterations} ORDER BY rank DESC, user_id LIMIT 20
    """
    )


@query("q_article_rank", oracle=_article_rank_oracle(10))
def q_article_rank(spark, sf_dir):
    """ArticleRank vs a 10-iteration unrolled DuckDB oracle
    (AlgoArticleRank.java parity: share = 1/(outdeg + avg outdeg))."""
    from arcadedb_spark.graph.algorithms_more import article_rank

    db = _db(spark, sf_dir)
    base = db.schema.get("customer").bucket_id << 40
    ar = article_rank(db.graph().edges("INTERACTED"), iterations=10)
    return (
        ar.select((F.col("vid") - base).alias("user_id"), F.round("rank", 6).alias("rank"))
        .orderBy(F.desc("rank"), F.asc("user_id"))
        .limit(20)
    )


@query(
    "q_cypher_match",
    oracle="""
    SELECT c.c_mktsegment AS seg, count(*) AS n
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 100000
    GROUP BY 1
    """,
)
def q_cypher_match(spark, sf_dir):
    return _db(spark, sf_dir).query(
        "MATCH (c:Customer)-[:PLACED]->(o:`Order`) WHERE o.o_totalprice > 100000 "
        "RETURN c.c_mktsegment AS seg, count(*) AS n",
        language="cypher",
    )


@query(
    "q_cypher_pattern_pred",
    # openCypher pattern predicate in WHERE — lowered to a grouped match-
    # count marker left-joined onto the frame (graph/match.py
    # attach_pattern_markers), never a correlated per-row subplan
    oracle="""
    SELECT c.c_mktsegment AS seg, count(*) AS n
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      AND c.c_acctbal > 5000
    GROUP BY 1 ORDER BY 1
    """,
)
def q_cypher_pattern_pred(spark, sf_dir):
    return _db(spark, sf_dir).query(
        "MATCH (c:Customer) WHERE (c)-[:PLACED]->() AND c.c_acctbal > 5000 "
        "RETURN c.c_mktsegment AS seg, count(*) AS n ORDER BY seg",
        language="cypher",
    )


@query(
    "q_cypher_pattern_size",
    # size([(c)-[:PLACED]->() | 1]) — pattern-comprehension match count
    # (openCypher: size() on a BARE pattern is UnexpectedSyntax, TCK
    # List6[6]; the comprehension form is the supported spelling)
    oracle="""
    SELECT n_orders, count(*) AS n_cust
    FROM (
      SELECT count(*) AS n_orders FROM orders GROUP BY o_custkey
      HAVING count(*) >= 20
    )
    GROUP BY 1 ORDER BY 1
    """,
)
def q_cypher_pattern_size(spark, sf_dir):
    return _db(spark, sf_dir).query(
        "MATCH (c:Customer) "
        "WITH c, size([(c)-[:PLACED]->() | 1]) AS n_orders "
        "WHERE n_orders >= 20 "
        "RETURN n_orders, count(*) AS n_cust ORDER BY n_orders",
        language="cypher",
    )


@query(
    "q_cypher_count_collect",
    oracle="""
    SELECT c.c_custkey AS k,
           (SELECT count(*) FROM orders o
            WHERE o.o_custkey = c.c_custkey) AS n,
           (SELECT count(DISTINCT o.o_orderpriority) FROM orders o
            WHERE o.o_custkey = c.c_custkey) AS np,
           array_to_string(
             coalesce((SELECT list(o.o_orderkey ORDER BY o.o_orderkey)
                       FROM orders o WHERE o.o_custkey = c.c_custkey),
                      []::BIGINT[]), ',') AS l
    FROM customer c WHERE c.c_custkey <= 30 ORDER BY k
    """,
)
def q_cypher_count_collect(spark, sf_dir):
    """Cypher-25 COUNT { } / COLLECT { } subquery expressions
    (Cypher25Parser.g4 countExpression/collectExpression) — each block
    lowers ONCE to a grouped marker joined back on the shared alias,
    never a correlated per-row subplan; RETURN DISTINCT inside COUNT
    counts distinct values, COLLECT honors the block's ORDER BY.

    The COLLECT column is joined to a comma string for the grade only —
    the driver's pandas canonicalizer can't sort list-typed columns."""
    df = _db(spark, sf_dir).query(
        "MATCH (c:Customer) WHERE c.c_custkey <= 30 "
        "RETURN c.c_custkey AS k, "
        "COUNT { MATCH (c)-[:PLACED]->(o) } AS n, "
        "COUNT { MATCH (c)-[:PLACED]->(o) "
        "  RETURN DISTINCT o.o_orderpriority } AS np, "
        "COLLECT { MATCH (c)-[:PLACED]->(o) RETURN o.o_orderkey "
        "  ORDER BY o.o_orderkey } AS l "
        "ORDER BY k",
        language="cypher",
    )
    return df.withColumn(
        "l", F.concat_ws(",", F.col("l").cast("array<string>"))
    )


@query(
    "q_cypher_optional",
    oracle="""
    SELECT n.n_name AS nation, count(s.s_suppkey) AS ns
    FROM nation n LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey
    GROUP BY 1
    """,
)
def q_cypher_optional(spark, sf_dir):
    return _db(spark, sf_dir).query(
        "MATCH (n:Nation) OPTIONAL MATCH (n)<-[:LOCATED_IN]-(s:Supplier) "
        "RETURN n.n_name AS nation, count(s.s_suppkey) AS ns",
        language="cypher",
    )


@query(
    "q_cypher_string_preds",
    oracle="""
    SELECT c_name AS name FROM customer
    WHERE c_name LIKE 'Customer#00000001%' AND c_name LIKE '%4'
    """,
)
def q_cypher_string_preds(spark, sf_dir):
    return _db(spark, sf_dir).query(
        "MATCH (c:Customer) WHERE c.c_name STARTS WITH 'Customer#00000001' "
        "AND c.c_name ENDS WITH '4' RETURN c.c_name AS name",
        language="cypher",
    )


@query(
    "q_geo_distance",
    oracle="""
    WITH pts AS (
      SELECT c_custkey,
             (c_custkey % 180) - 90 + 0.5 AS lat,
             (c_custkey % 360) - 180 + 0.5 AS lon
      FROM customer
    )
    SELECT c_custkey,
           round(2 * 6371.0 * asin(sqrt(
             sin(radians(lat - 48.85) / 2) * sin(radians(lat - 48.85) / 2)
             + cos(radians(48.85)) * cos(radians(lat))
               * sin(radians(lon - 2.35) / 2) * sin(radians(lon - 2.35) / 2)
           )), 2) AS dist_km,
           (lat >= 0 AND lat <= 60 AND lon >= -30 AND lon <= 60) AS in_bbox
    FROM pts WHERE c_custkey < 100
    """,
)
def q_geo_distance(spark, sf_dir):
    # haversine distance + bbox predicate (function/sql/geo/* v1 subset);
    # note the oracle spells lat1=48.85 lon1=2.35 as the SECOND point —
    # haversine is symmetric, matched formula shape on both sides
    return _db(spark, sf_dir).query(
        """
        SELECT c_custkey,
               round(distance((c_custkey % 180) - 90 + 0.5,
                              (c_custkey % 360) - 180 + 0.5,
                              48.85, 2.35), 2) AS dist_km,
               geo.bboxContains(0, -30, 60, 60,
                                (c_custkey % 180) - 90 + 0.5,
                                (c_custkey % 360) - 180 + 0.5) AS in_bbox
        FROM customer WHERE c_custkey < 100
        """
    )


@query(
    "q_geo_radius_join",
    oracle="""
    WITH pts AS (
      SELECT c_custkey AS id,
             ((c_custkey * 9973) % 1000) / 20.0 - 25 AS lat,
             ((c_custkey * 7919) % 1000) / 10.0 - 50 AS lon
      FROM customer WHERE c_custkey < 400
    )
    SELECT a.id AS id_a, b.id AS id_b,
           round(2 * 6371.0 * asin(sqrt(
             sin(radians(b.lat - a.lat) / 2) * sin(radians(b.lat - a.lat) / 2)
             + cos(radians(a.lat)) * cos(radians(b.lat))
               * sin(radians(b.lon - a.lon) / 2) * sin(radians(b.lon - a.lon) / 2)
           )), 2) AS distance_km
    FROM pts a JOIN pts b ON a.id < b.id
    WHERE 2 * 6371.0 * asin(sqrt(
            sin(radians(b.lat - a.lat) / 2) * sin(radians(b.lat - a.lat) / 2)
            + cos(radians(a.lat)) * cos(radians(b.lat))
              * sin(radians(b.lon - a.lon) / 2) * sin(radians(b.lon - a.lon) / 2)
          )) <= 75
    ORDER BY id_a, id_b
    """,
)
def q_geo_radius_join(spark, sf_dir):
    """Grid-cell spatial self-join vs the oracle's exact cross join —
    the NEAR/WITHIN shape (LSMTreeGeoIndex.java cell covering):
    candidates from a 3x3 cell equi-join, exact haversine verify."""
    from arcadedb_spark.geo.join import within_distance_join

    db = _db(spark, sf_dir)
    pts = db.table("customer").filter(F.col("c_custkey") < 400).select(
        F.col("c_custkey").alias("id"),
        (((F.col("c_custkey") * 9973) % 1000) / 20.0 - 25).alias("lat"),
        (((F.col("c_custkey") * 7919) % 1000) / 10.0 - 50).alias("lon"),
    )
    pairs = within_distance_join(pts, pts, radius_km=75.0)
    return (
        pairs.filter(F.col("id") < F.col("r_id"))
        .select(
            F.col("id").alias("id_a"), F.col("r_id").alias("id_b"),
            F.round("distance_km", 2).alias("distance_km"),
        )
        .orderBy("id_a", "id_b")
    )


@query(
    "q_gremlin_groupcount",
    oracle="""
    SELECT c_mktsegment AS key, count(*) AS count
    FROM customer GROUP BY c_mktsegment
    ORDER BY count DESC, key
    """,
)
def q_gremlin_groupcount(spark, sf_dir):
    """Gremlin string skin (GremlinQueryEngine.java:33) — histogram
    traversal lowered to groupBy."""
    return _db(spark, sf_dir).query(
        "g.V('Customer').groupCount().by('c_mktsegment')", language="gremlin"
    )


@query(
    "q_gremlin_repeat",
    oracle="""
    WITH pairs AS (
      SELECT user_id AS s, lead(user_id) OVER (ORDER BY ts, event_id) AS d
      FROM events
    ), e AS (SELECT DISTINCT s, d FROM pairs WHERE d IS NOT NULL AND s <> d),
    two AS (
      SELECT e2.d AS dest FROM e e1 JOIN e e2 ON e2.s = e1.d
    )
    SELECT dest AS key, count(*) AS count FROM two GROUP BY dest
    ORDER BY count DESC, key
    """,
)
def q_gremlin_repeat(spark, sf_dir):
    """Gremlin repeat().times() loop (TinkerPop RepeatStep;
    GremlinQueryEngine.java:33) — traverser multiplicity preserved, so the
    per-destination histogram counts 2-hop PATHS, not reachable vertices.
    Each iteration is one distributed join superstep."""
    db = _db(spark, sf_dir)
    base = db.schema.get("customer").bucket_id << 40
    out = db.query(
        "g.V('Customer').repeat(out('INTERACTED')).times(2)"
        ".groupCount().by('vid')",
        language="gremlin",
    )
    return (
        out.select((F.col("key") - base).alias("key"), "count")
        .orderBy(F.desc("count"), F.asc("key"))
    )


@query(
    "q_gremlin_group",
    oracle="""
    SELECT c_mktsegment AS key,
           array_to_string(list_sort(list(c_custkey)), ',') AS values
    FROM customer WHERE c_acctbal > 9000
    GROUP BY c_mktsegment ORDER BY key
    """,
)
def q_gremlin_group(spark, sf_dir):
    """Gremlin tier-3 steps: predicate argument (gt) + group().by().by()
    (TinkerPop GroupStep; GremlinQueryEngine.java:33) — one hash
    aggregation, values collected per group.

    The group-values column is joined to a comma string for the grade
    only — the driver's pandas canonicalizer can't sort list columns."""
    df = _db(spark, sf_dir).query(
        "g.V('Customer').has('c_acctbal', gt(9000))"
        ".group().by('c_mktsegment').by('c_custkey')",
        language="gremlin",
    )
    return df.withColumn(
        "values",
        F.concat_ws(",", F.sort_array("values").cast("array<string>")),
    )


@query(
    "q_gremlin_project",
    oracle="""
    SELECT n.n_name AS name, count(s.s_suppkey) AS nsup
    FROM nation n LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name ORDER BY name
    """,
)
def q_gremlin_project(spark, sf_dir):
    """Gremlin project().by(prop).by(subTraversal) — the sub-traversal
    column decorrelates to ONE grouped count joined back (TinkerPop
    ProjectStep), never a per-traverser evaluation."""
    return _db(spark, sf_dir).query(
        "g.V('Nation').project('name', 'nsup')"
        ".by('n_name').by(in('LOCATED_IN').hasLabel('Supplier'))",
        language="gremlin",
    ).orderBy("name")


@query(
    "q_gremlin_edge_steps",
    oracle="""
    SELECT o.o_orderkey FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    """,
)
def q_gremlin_edge_steps(spark, sf_dir):
    """Gremlin edge-state steps: outE('T') turns traversers into
    incident-edge rows (equi-join per orientation), otherV() leaves via
    the opposite endpoint (TinkerPop EdgeVertexStep;
    GremlinQueryEngine.java:33)."""
    return _db(spark, sf_dir).query(
        "g.V('Customer').has('c_mktsegment', 'BUILDING')"
        ".outE('PLACED').otherV().values('o_orderkey')",
        language="gremlin",
    )


@query(
    "q_gremlin_sack",
    oracle="""
    SELECT c.c_acctbal + o.o_totalprice AS sack
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey <= 50
    """,
)
def q_gremlin_sack(spark, sf_dir):
    """Gremlin sack: per-traverser accumulator carried across hops as a
    plain column (TinkerPop SackStep; GremlinQueryEngine.java:33) —
    every update stays inside whole-stage codegen, no traverser-side
    state object."""
    return _db(spark, sf_dir).query(
        "g.withSack(0).V('Customer').has('c_custkey', lte(50))"
        ".sack('sum').by('c_acctbal')"
        ".out('PLACED').sack('sum').by('o_totalprice').sack()",
        language="gremlin",
    )


@query(
    "q_graphql_nested",
    oracle="""
    SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey < 20
    GROUP BY c.c_custkey ORDER BY c.c_custkey
    """,
)
def q_graphql_nested(spark, sf_dir):
    """GraphQL skin: relationship selection resolved as one edge join +
    collect_list (graphql/GraphQLBasicTest.java shape)."""
    db = _db(spark, sf_dir)
    db.graph()
    if getattr(db, "_graphql_types", None) is None:
        db.command(
            """
            type Query { topCustomers(where: String): [Customer] }
            type Customer {
              c_custkey: Int
              c_name: String
              orders: [Order] @relationship(type: "PLACED", direction: OUT)
            }
            type Order { o_orderkey: Int }
            """,
            language="graphql",
        )
    out = db.query(
        '{ topCustomers(where: "c_custkey < 20") { c_custkey orders { o_orderkey } } }',
        language="graphql",
    )
    return out.select(
        "c_custkey",
        F.coalesce(F.size("orders"), F.lit(0)).cast("long").alias("n_orders"),
    ).orderBy("c_custkey")


@query(
    "q_mongo_find",
    oracle="""
    SELECT c_name, c_acctbal FROM customer
    WHERE (c_mktsegment = 'BUILDING' OR c_mktsegment = 'MACHINERY')
      AND c_acctbal > 1000 AND c_acctbal <= 9000
    ORDER BY c_acctbal DESC, c_name LIMIT 25
    """,
)
def q_mongo_find(spark, sf_dir):
    """MongoDB QL skin (mongodbw/MongoDBToSqlTranslator.java) — the
    filter document compiles to one Column tree, pushed into the scan."""
    import json

    return _db(spark, sf_dir).query(
        json.dumps({
            "collection": "customer",
            "query": {
                "$or": [{"c_mktsegment": "BUILDING"},
                        {"c_mktsegment": "MACHINERY"}],
                "c_acctbal": {"$gt": 1000, "$lte": 9000},
                "$orderby": {"c_acctbal": -1, "c_name": 1},
            },
            "projection": {"c_name": 1, "c_acctbal": 1},
            "numberToReturn": 25,
        }),
        language="mongo",
    )


@query(
    "q_mongo_aggregate",
    oracle="""
    SELECT o_orderpriority AS _id,
           count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
             AS total,
           round(avg(o_totalprice), 4) AS avg_price
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 50000
    GROUP BY o_orderpriority
    ORDER BY total DESC
    LIMIT 3
    """,
)
def q_mongo_aggregate(spark, sf_dir):
    """MongoDB aggregation pipeline (MongoDBDatabaseWrapper.
    aggregateCollection:245-266): $match pushes into the parquet scan,
    $group is one hash aggregation, $sort+$limit fuse to
    TakeOrderedAndProject."""
    import json

    return _db(spark, sf_dir).query(
        json.dumps({
            "aggregate": "orders",
            "pipeline": [
                {"$match": {"o_orderstatus": "F",
                            "o_totalprice": {"$gt": 50000}}},
                {"$group": {"_id": "$o_orderpriority",
                            "n": {"$sum": 1},
                            "total": {"$sum": {"$toDecimal":
                                               "$o_totalprice"}},
                            "avg_price": {"$avg": "$o_totalprice"}}},
                {"$addFields": {"total": {"$toDouble": "$total"},
                                "avg_price": {"$round":
                                              ["$avg_price", 4]}}},
                {"$sort": {"total": -1}},
                {"$limit": 3},
            ],
        }),
        language="mongo",
    )


@query(
    "q_agg_tail",
    oracle="""
    SELECT c_mktsegment,
           round(product(1.0 + c_acctbal / 1000000), 6) AS prod,
           round(quantile_cont(c_acctbal, 0.5), 2) AS pcont,
           quantile_disc(c_acctbal, 0.5) AS pdisc,
           round(stddev_samp(c_acctbal), 2) AS sd
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def q_agg_tail(spark, sf_dir):
    """Aggregate-function tail: product / percentileCont / percentileDisc
    / statistics (function/agg/{AggProduct,PercentileCont,
    PercentileDisc,AggStatistics}.java)."""
    return _db(spark, sf_dir).query(
        """
        SELECT c_mktsegment,
               round(product(1.0 + c_acctbal / 1000000), 6) AS prod,
               round(percentileCont(c_acctbal, 0.5), 2) AS pcont,
               percentileDisc(c_acctbal, 0.5) AS pdisc,
               round(statistics(c_acctbal).stddev, 2) AS sd
        FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
        """
    )


@query(
    "q_geo_polygon",
    oracle="""
    WITH pts AS (
      SELECT c_custkey,
             CAST(c_custkey % 50 AS DOUBLE) AS x,
             CAST((c_custkey * 7) % 50 AS DOUBLE) AS y
      FROM customer
    )
    SELECT c_custkey,
           (x >= 0 AND y >= 0 AND x + y <= 40) AS in_triangle,
           (x >= 5 AND x <= 30 AND y >= 5 AND y <= 30) AS in_rect
    FROM pts WHERE c_custkey < 120 ORDER BY c_custkey
    """,
)
def q_geo_polygon(spark, sf_dir):
    """Ray-cast point-in-polygon + rectangle containment through the WKT
    geometry kernel (function/sql/geo/SQLFunctionGeoWithin.java)."""
    return _db(spark, sf_dir).query(
        """
        SELECT c_custkey,
               geo.within(geo.point(c_custkey % 50, (c_custkey * 7) % 50),
                          geo.polygon([[0, 0], [40, 0], [0, 40]])) AS in_triangle,
               geo.within(geo.point(c_custkey % 50, (c_custkey * 7) % 50),
                          geo.rectangle(5, 5, 30, 30)) AS in_rect
        FROM customer WHERE c_custkey < 120 ORDER BY c_custkey
        """
    )


@query(
    "q_json_dynamic_props",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
           count(*) AS n
    FROM events GROUP BY 1
    """,
)
def q_json_dynamic_props(spark, sf_dir):
    # schema-flexible dynamic properties: events.props is a JSON string
    # (FIXTURES.md B1 — the dynamic-properties test)
    return _db(spark, sf_dir).query(
        "SELECT json_extract(props, '$.k').asLong() % 10 AS k_mod, count(*) AS n "
        "FROM events GROUP BY k_mod"
    )


@query(
    "q_agg_percentiles",
    oracle="""
    SELECT c_mktsegment,
           round(median(c_acctbal), 4) AS med,
           round(quantile_cont(c_acctbal, 0.9), 4) AS p90,
           bool_and(c_acctbal > -1000) AS all_above,
           bool_or(c_acctbal > 9900) AS any_rich
    FROM customer GROUP BY c_mktsegment
    """,
)
def q_agg_percentiles(spark, sf_dir):
    return _db(spark, sf_dir).query(
        """
        SELECT c_mktsegment,
               round(median(c_acctbal), 4) AS med,
               round(percentile(c_acctbal, 0.9), 4) AS p90,
               bool_and(c_acctbal > -1000) AS all_above,
               bool_or(c_acctbal > 9900) AS any_rich
        FROM customer GROUP BY c_mktsegment
        """
    )


@query(
    "q_collect_sorted",
    oracle="""
    SELECT n_regionkey AS rk,
           CAST(to_json(list_sort(list(n_name))) AS VARCHAR) AS names
    FROM nation GROUP BY n_regionkey
    """,
)
def q_collect_sorted(spark, sf_dir):
    # collect_list order is nondeterministic — sort() makes it comparable;
    # JSON-serialized so the driver canonicalizer can hash the cells
    df = _db(spark, sf_dir).query(
        "SELECT n_regionkey AS rk, sort(list(n_name)) AS names "
        "FROM nation GROUP BY rk"
    )
    return df.select("rk", F.to_json("names").alias("names"))


@query(
    "q_cypher_varlength",
    oracle="""
    WITH pairs AS (
      SELECT user_id AS s, lead(user_id) OVER (ORDER BY ts, event_id) AS d
      FROM events
    ), e AS (SELECT DISTINCT s, d FROM pairs WHERE d IS NOT NULL AND s <> d),
    r1 AS (SELECT d AS v FROM e WHERE s = 7),
    r2 AS (SELECT e2.d AS v FROM r1 JOIN e e2 ON e2.s = r1.v)
    SELECT count(*) AS n FROM (SELECT v FROM r1 UNION ALL SELECT v FROM r2)
    """,
)
def q_cypher_varlength(spark, sf_dir):
    # Cypher variable-length relationship over the INTERACTED graph —
    # openCypher trail semantics: one row per relationship-unique path
    # (INTERACTED edges are distinct (s,d) pairs, so a 2-hop pair can
    # never reuse an edge: trail count = 1-hop edges + 2-hop edge pairs)
    return _db(spark, sf_dir).query(
        "MATCH (a:Customer {c_custkey: 7})-[:INTERACTED*1..2]->(b:Customer) "
        "RETURN count(*) AS n",
        language="cypher",
    )


@query(
    "q_scc",
    oracle="""
    WITH RECURSIVE pairs AS (
      SELECT user_id AS s, lead(user_id) OVER (ORDER BY ts, event_id) AS d
      FROM events
    ), e0 AS (
      SELECT DISTINCT s, d FROM pairs WHERE d IS NOT NULL AND s <> d
    ), verts AS (
      SELECT DISTINCT v FROM (SELECT s AS v FROM e0 UNION ALL SELECT d FROM e0)
    ), reach(v, r) AS (
      SELECT v, v FROM verts
      UNION
      SELECT reach.v, e0.d FROM reach JOIN e0 ON e0.s = reach.r
    ), scc AS (
      SELECT a.v, min(a.r) AS c
      FROM reach a JOIN reach b ON a.v = b.r AND a.r = b.v
      GROUP BY a.v
    )
    SELECT c AS component, count(*) AS size
    FROM scc GROUP BY c ORDER BY size DESC, component
    """,
)
def q_scc(spark, sf_dir):
    """SCC vs a DuckDB bidirectional-closure oracle; labels normalized
    to the min member id so the coloring algorithm's internal roots
    don't leak (AlgoSCC.java parity up to label choice)."""
    from arcadedb_spark.graph.algorithms import strongly_connected_components

    db = _db(spark, sf_dir)
    base = db.schema.get("customer").bucket_id << 40
    scc = strongly_connected_components(db.graph().edges("INTERACTED"))
    return (
        scc.groupBy("component")
        .agg(F.min("vid").alias("__label"), F.count(F.lit(1)).alias("size"))
        .select((F.col("__label") - base).alias("component"), "size")
        .orderBy(F.desc("size"), F.asc("component"))
    )


_FASTRP_GOLDEN = """
    -- Golden: FastRP projections are xxhash-seeded (not SQL-re-derivable);
    -- pinned JSON-rendered embeddings for the first 40 users.
    -- Regenerate with tools/regen_golden.py.
    SELECT * FROM (VALUES
      (0, '[0.4261,0.2993,-0.1442,0.4391,0.7157,0.0046,0.0489,-0.0242]'),
      (1, '[0.144,0.1302,-0.5912,0.7157,0.2939,-0.0729,-0.0837,0.0431]'),
      (2, '[0.3494,0.3766,-0.1426,0.6007,0.5173,0.2117,-0.1024,0.1787]'),
      (3, '[0.544,0.3713,-0.3366,0.429,0.3868,0.2639,-0.1907,-0.115]'),
      (4, '[0.173,0.1806,-0.4527,0.4779,0.4202,0.3286,-0.4143,0.2188]'),
      (5, '[0.3002,0.0534,-0.097,0.4524,0.6984,0.348,-0.2599,-0.1286]'),
      (6, '[0.2675,0.2066,-0.2274,0.4579,0.6867,0.2737,-0.2768,0.0342]'),
      (7, '[0.3029,0.3047,0.0194,0.39,0.2667,0.669,-0.1923,0.3276]'),
      (8, '[0.311,0.3654,0.0609,0.3238,0.5331,0.5897,-0.1283,0.1135]'),
      (9, '[0.26,0.3037,0.327,0.7097,0.1587,0.2786,0.1777,0.3085]'),
      (10, '[0.4629,0.2902,0.0196,0.1715,0.7177,0.2123,0.155,-0.2959]'),
      (11, '[0.5479,0.1918,0.0138,0.1528,0.6638,0.3206,0.0602,-0.3041]'),
      (12, '[-0.0821,0.3552,0.1704,0.1962,0.7733,0.4216,0.1334,-0.0781]'),
      (13, '[0.2248,-0.1976,-0.0417,0.6868,0.4701,0.317,-0.3302,-0.0805]'),
      (14, '[0.2975,0.4303,0.0439,0.6398,0.3446,0.4289,-0.1109,-0.0134]'),
      (15, '[0.0448,0.1994,0.1692,0.6314,0.5073,0.4821,-0.202,0.0169]'),
      (16, '[0.2115,0.2405,-0.3295,0.4903,0.4694,0.4102,-0.1298,0.3782]'),
      (17, '[0.4388,0.1824,0.4378,0.496,0.2236,0.3364,0.1274,-0.3964]'),
      (18, '[0.435,0.3499,-0.0315,0.5856,0.333,0.4554,0.0109,-0.1612]'),
      (19, '[0.2226,0.2236,0.183,0.6036,0.5628,0.1868,-0.3097,0.2347]'),
      (20, '[0.1865,0.3849,-0.1932,0.1199,0.8303,-0.1199,-0.1879,-0.1622]'),
      (21, '[-0.0216,0.1571,0.4299,0.566,0.6344,0.0777,-0.2465,0.0198]'),
      (22, '[0.2905,0.1877,-0.0678,0.0955,0.6575,0.6466,0.0306,0.1233]'),
      (23, '[0.3143,-0.2721,-0.1418,0.4947,0.4472,0.5186,-0.2188,-0.2131]'),
      (24, '[0.4626,0.3648,0.0836,0.4953,0.3641,0.5075,-0.0102,-0.1017]'),
      (25, '[0.2927,0.2666,0.3304,0.7504,0.3849,0.0211,-0.1281,0.0773]'),
      (26, '[0.094,0.2339,0.3742,0.3724,0.7473,0.2698,0.1493,-0.0646]'),
      (27, '[-0.038,0.4767,0.2806,0.1133,0.7092,0.1649,0.1438,-0.3591]'),
      (28, '[0.1054,0.2615,-0.022,0.4689,0.4865,0.6187,-0.1705,-0.2273]'),
      (29, '[-0.4997,0.5356,0.2695,0.4977,0.1963,0.3074,-0.0857,-0.0524]'),
      (30, '[-0.0484,0.5754,-0.079,0.348,0.6091,0.3567,0.0328,0.1999]'),
      (31, '[0.4456,0.1767,0.2754,0.5078,0.389,0.4732,-0.0043,0.2475]'),
      (32, '[0.219,0.166,0.1942,0.7496,0.4739,0.2124,-0.2009,0.1216]'),
      (33, '[0.3861,0.0256,-0.1293,0.3651,0.7403,0.2614,-0.2875,0.0354]'),
      (34, '[0.4278,0.5532,-0.1016,0.1077,0.2753,0.6343,-0.0592,-0.0865]'),
      (35, '[0.3422,0.2088,0.026,0.214,0.6226,0.6012,-0.1577,0.1376]'),
      (36, '[0.057,0.2411,-0.1215,0.5512,0.4029,0.4314,0.4349,0.287]'),
      (37, '[-0.0277,0.3523,0.0763,0.5223,0.5336,0.4279,-0.2295,0.2756]'),
      (38, '[0.1378,0.2184,-0.1293,0.1525,0.7255,0.2338,-0.2727,-0.4877]'),
      (39, '[0.0076,-0.101,-0.0523,0.5106,0.6772,0.44,0.2062,0.1776]')
    ) AS t(user_id, embedding)
    """


@query("q_fastrp", oracle=_FASTRP_GOLDEN)
def q_fastrp(spark, sf_dir):
    """FastRP node embeddings (AlgoFastRP.java parity in objective).
    Hash-seeded projections → deterministic; the oracle pins the golden
    JSON-rendered embeddings for the fixed sf0.01 fixture (first 40 users).
    Regenerate with tools/regen_golden.py if the fixture changes."""
    from arcadedb_spark.graph.algorithms import fastrp_embeddings

    db = _db(spark, sf_dir)
    base = db.schema.get("customer").bucket_id << 40
    emb = fastrp_embeddings(db.graph().edges("INTERACTED"), dim=8, iterations=2)
    return (
        emb.select(
            (F.col("vid") - base).alias("user_id"),
            F.to_json(
                F.transform("embedding", lambda v: F.round(v, 4))
            ).alias("embedding"),
        )
        .filter(F.col("user_id") < 40)
        .orderBy("user_id")
    )


@query(
    "q_search_predicate",
    oracle=r"""
    SELECT count(*) AS n FROM documents
    WHERE length(list_intersect(
      list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}]+'),
                  x -> length(x) > 0),
      ['stream', 'vector'])) > 0
    """,
)
def q_search_predicate(spark, sf_dir):
    # BM25 hit set == docs containing ≥1 query term (idf > 0 always)
    return _db(spark, sf_dir).query(
        "SELECT count(*) AS n FROM documents "
        "WHERE search_fields(['text'], 'stream vector')"
    )


_LOUVAIN_GOLDEN = """
    -- Golden: louvain is deterministic (min-id tie-break) on the fixed
    -- seed-42 fixture but not SQL-re-derivable; pinned (community, size).
    -- Regenerate with tools/regen_golden.py.
    SELECT * FROM (VALUES (1099511627816,40), (1099511627867,36), (1099511627824,24), (1099511627803,23), (1099511627878,16), (1099511627879,11)) AS t(community, size)
    """


@query("q_louvain", oracle=_LOUVAIN_GOLDEN)
def q_louvain(spark, sf_dir):
    """Distributed Louvain phase-1 (AlgoLouvain.java parity in objective).
    Deterministic under min-id tie-breaking on the fixed fixture; the
    oracle pins the golden (community, size) table."""
    from arcadedb_spark.graph.algorithms import louvain

    db = _db(spark, sf_dir)
    comm = louvain(db.graph().edges("INTERACTED"))
    return comm.groupBy("community").agg(F.count(F.lit(1)).alias("size")).orderBy(
        F.desc("size"), F.asc("community")
    )


@query(
    "q_sessionize",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
                       OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sessions AS (
      SELECT user_id,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM sessions GROUP BY user_id
    """,
)
def q_sessionize(spark, sf_dir):
    from arcadedb_spark.timeseries.functions import sessionize

    ev = _db(spark, sf_dir).table("events")
    s = sessionize(ev, "ts", "user_id", gap_ms=30 * 60 * 1000)
    return s.groupBy("user_id").agg(
        F.max("session_id").cast("long").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "q_match_edge_props",
    oracle="""
    SELECT p.p_brand AS brand, count(*) AS n,
           round(avg(l.l_quantity), 2) AS avg_q
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_quantity > 45
    GROUP BY 1
    """,
)
def q_match_edge_props(spark, sf_dir):
    # edge-record steps: filter on edge properties, then complete the hop
    return _db(spark, sf_dir).query(
        "MATCH {type: `Order`, as: o}"
        ".outE('CONTAINS'){as: e, where: (l_quantity > 45)}.inV(){as: p} "
        "RETURN p.p_brand AS brand, count(*) AS n, "
        "round(avg(e.l_quantity), 2) AS avg_q GROUP BY brand"
    )


# ===========================================================================
# Round-2 algo procedures: A*, k-shortest-paths, max-flow, cliques, Leiden
# (reference query/opencypher/procedures/algo/AlgoAStar.java,
# AlgoKShortestPaths.java, AlgoMaxFlow.java, AlgoClique.java,
# AlgoLeiden.java).  Each runs on a filtered INTERACTED subgraph so the
# driver-gate cost stays bounded while the full distributed pipeline
# (frontier relaxation / level-synchronous enumeration) is exercised.
# ===========================================================================


def _interacted_sub(db, base, max_user=None, min_weight=None):
    e = db.graph().edges("INTERACTED")
    if max_user is not None:
        e = e.filter(
            (F.col("src") - base < max_user) & (F.col("dst") - base < max_user)
        )
    if min_weight is not None:
        e = e.filter(F.col("weight") >= min_weight)
    return e


# The INTERACTED derivation (graph/model.py) re-expressed for DuckDB,
# with the same subgraph filter the Spark side applies.
def _interacted_sql(max_user=None, min_weight=None):
    cond = "d IS NOT NULL AND s <> d"
    if max_user is not None:
        cond += f" AND s < {max_user} AND d < {max_user}"
    having = f"HAVING count(*) >= {min_weight}" if min_weight else ""
    return f"""
    pairs AS (
      SELECT user_id AS s, lead(user_id) OVER (ORDER BY ts, event_id) AS d
      FROM events
    ), e AS MATERIALIZED (
      SELECT s, d, CAST(count(*) AS DOUBLE) AS w FROM pairs
      WHERE {cond} GROUP BY s, d {having}
    )"""


def _bellman_ford_sql(src: int, dst: int, unroll: int, max_user: int) -> str:
    """Unrolled Bellman-Ford: d_k(v) = min(d_{k-1}(v), min_u d_{k-1}(u)+w);
    exact when the optimal path uses <= unroll hops (asserted by the
    fixed-point check in tests)."""
    # AS MATERIALIZED: each level references its predecessor twice; DuckDB
    # would otherwise inline the CTE per reference (2^unroll blowup)
    levels = ",\n    ".join(
        f"d{i} AS MATERIALIZED (SELECT v, min(dist) AS dist FROM ("
        f"SELECT v, dist FROM d{i - 1} UNION ALL "
        f"SELECT e.d, d{i - 1}.dist + e.w FROM d{i - 1} JOIN e ON e.s = d{i - 1}.v"
        f") GROUP BY v)"
        for i in range(1, unroll + 1)
    )
    return f"""
    WITH {_interacted_sql(max_user=max_user)},
    verts AS (SELECT DISTINCT s AS v FROM e UNION SELECT DISTINCT d FROM e),
    d0 AS MATERIALIZED (SELECT v, CASE WHEN v = {src} THEN 0.0 ELSE 1e18 END AS dist
           FROM verts),
    {levels}
    SELECT round(dist, 1) + 0.0 AS weight FROM d{unroll} WHERE v = {dst}
    """


@query("q_astar", oracle=_bellman_ford_sql(7, 42, 12, 80))
def q_astar(spark, sf_dir):
    """A* point-to-point shortest path (AlgoAStar.java; h=0 degenerates
    to Dijkstra) vs an independently-derived unrolled Bellman-Ford DuckDB
    oracle on the same subgraph — a true cross-engine check, not a golden."""
    from arcadedb_spark.graph.algorithms_extra import astar

    db = _db(spark, sf_dir)
    base = db.schema.get("customer").bucket_id << 40
    e = _interacted_sub(db, base, max_user=80)
    res = astar(e, base + 7, base + 42)
    return res.select((F.round(F.col("weight"), 1) + F.lit(0.0)).alias("weight"))


_KSP_GOLDEN = """
    -- Golden: Yen-equivalent k-best simple paths on the fixed seed-42
    -- fixture (weights + hop counts are unique under (weight, path)
    -- tie-breaking).  Regenerate with tools/regen_golden.py.
    SELECT rank, CAST(weight AS DOUBLE) AS weight, hops
    FROM (VALUES (1, 2.0, 2), (2, 2.0, 2), (3, 2.0, 2)) AS t(rank, weight, hops)
    """


@query("q_ksp", oracle=_KSP_GOLDEN)
def q_ksp(spark, sf_dir):
    """k shortest loopless paths (AlgoKShortestPaths.java) by per-vertex
    top-k label correction; golden oracle pins (rank, weight, hops)."""
    from arcadedb_spark.graph.algorithms_extra import k_shortest_paths

    db = _db(spark, sf_dir)
    base = db.schema.get("customer").bucket_id << 40
    e = _interacted_sub(db, base, max_user=40)
    res = k_shortest_paths(e, base + 7, base + 23, k=3, max_depth=6)
    return res.select(
        "rank",
        (F.round(F.col("weight"), 1) + F.lit(0.0)).alias("weight"),
        (F.size("path") - 1).alias("hops"),
    )


_MAXFLOW_GOLDEN = """
    -- Golden: the max-flow VALUE is unique (min-cut dual) regardless of
    -- augmenting-path order, so the pinned value is implementation-
    -- independent given capacities.  Regenerate with tools/regen_golden.py.
    SELECT CAST(max_flow AS DOUBLE) AS max_flow
    FROM (VALUES (6.0)) AS t(max_flow)
    """


@query("q_maxflow", oracle=_MAXFLOW_GOLDEN)
def q_maxflow(spark, sf_dir):
    """Edmonds-Karp max s-t flow (AlgoMaxFlow.java), capacity = repeated
    interaction count, on the weight>=3 backbone subgraph."""
    from arcadedb_spark.graph.algorithms_extra import max_flow

    db = _db(spark, sf_dir)
    base = db.schema.get("customer").bucket_id << 40
    e = _interacted_sub(db, base, min_weight=3)
    res = max_flow(e, base + 7, base + 42, max_augmentations=64)
    return res.select((F.round(F.col("max_flow"), 1) + F.lit(0.0)).alias("max_flow"))


_CLIQUES_GOLDEN = """
    -- Golden: the set of maximal cliques is unique for a graph; histogram
    -- pinned for the weight>=2 backbone.  Regenerate with
    -- tools/regen_golden.py.
    SELECT * FROM (VALUES (3, 1090), (4, 251), (5, 7)) AS t(size, n)
    """


@query("q_cliques", oracle=_CLIQUES_GOLDEN)
def q_cliques(spark, sf_dir):
    """Maximal-clique enumeration (AlgoClique.java, Bron-Kerbosch parity
    in result set) via level-synchronous k-clique growth; the clique-size
    histogram is implementation-independent."""
    from arcadedb_spark.graph.algorithms_extra import maximal_cliques

    db = _db(spark, sf_dir)
    base = db.schema.get("customer").bucket_id << 40
    e = _interacted_sub(db, base, min_weight=2)
    cl = maximal_cliques(e, min_size=3)
    return (
        cl.groupBy("size")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("size")
    )


_LEIDEN_GOLDEN = """
    -- Golden: leiden is deterministic (hash-gated synchronous moves,
    -- min-id refinement labels) on the fixed seed-42 fixture; pinned
    -- (community, size).  Regenerate with tools/regen_golden.py.
    SELECT * FROM (VALUES (0,21), (4,20), (1,19), (11,13), (16,12), (5,11), (8,10), (15,8), (28,6), (24,4), (78,4), (3,3), (14,3), (20,3), (69,3), (43,2), (30,1), (35,1), (50,1), (75,1), (77,1), (108,1), (125,1), (128,1)) AS t(community, size)
    """


@query("q_leiden", oracle=_LEIDEN_GOLDEN)
def q_leiden(spark, sf_dir):
    """Leiden communities (AlgoLeiden.java; Traag et al. 2019) with the
    well-connectedness refinement; labels normalized to min member id."""
    from arcadedb_spark.graph.algorithms_extra import leiden

    db = _db(spark, sf_dir)
    base = db.schema.get("customer").bucket_id << 40
    e = _interacted_sub(db, base, min_weight=2)
    # 5 supersteps converge on the backbone; each superstep is a fixed
    # number of Spark jobs, so iterations dominate gate latency
    comm = leiden(e, max_iterations=5)
    return (
        comm.groupBy("community")
        .agg(F.min("vid").alias("__label"), F.count(F.lit(1)).alias("size"))
        .select((F.col("__label") - base).alias("community"), "size")
        .orderBy(F.desc("size"), F.asc("community"))
    )


# ===========================================================================
# Registry ordering
# ===========================================================================
# The driver grades entries in registration order under a budget (round 1
# stopped at 50/93).  Entries with no prior green signal come FIRST:
# round-1 failures whose fixes need proving, then the 43 rows the round-1
# run never reached (ordered so near-duplicate operator families — e.g.
# the six link-prediction scores — sit at the tail of the block).
# Round-1 hash-PASS rows keep their relative order at the end.
@query(
    "q_cypher_quantifiers",
    # Cypher list quantifiers with ternary null semantics vs DuckDB
    # bool aggregates over unnested VALUES (openCypher TCK
    # expressions/quantifier parity)
    oracle="""
    SELECT true  AS all_pos,
           true  AS any_gt2,
           false AS none_gt2,
           true  AS single_eq2,
           CAST(NULL AS BOOLEAN) AS all_with_null,
           true  AS any_with_null,
           20 AS comp_head,
           2 AS comp_n,
           6 AS reduced
    """,
)
def q_cypher_quantifiers(spark, sf_dir):
    """Quantifiers / comprehension / reduce through the Cypher front end
    (query/opencypher/ functions; TCK expressions/quantifier)."""
    return _db(spark, sf_dir).query(
        "RETURN all(x IN [1,2,3] WHERE x > 0) AS all_pos, "
        "any(x IN [1,2,3] WHERE x > 2) AS any_gt2, "
        "none(x IN [1,2,3] WHERE x > 2) AS none_gt2, "
        "single(x IN [1,2,3] WHERE x = 2) AS single_eq2, "
        "all(x IN [null, true] WHERE x) AS all_with_null, "
        "any(x IN [null, true] WHERE x) AS any_with_null, "
        "head([x IN [1,2,3] WHERE x > 1 | x * 10]) AS comp_head, "
        "size([x IN [1,2,3] WHERE x > 1 | x * 10]) AS comp_n, "
        "reduce(acc = 0, x IN [1,2,3] | acc + x) AS reduced",
        language="cypher",
    )


@query(
    "q_temporal_kernel",
    # Cypher temporal kernel vs DuckDB's native temporal SQL: week-date
    # construction, truncation, calendar-aware between, duration adds
    oracle="""
    SELECT CAST(date_trunc('week', DATE '1816-01-04') AS VARCHAR) AS week_date,
           CAST(date_trunc('month', DATE '2017-11-27') AS VARCHAR) AS trunc_month,
           CAST(CAST(DATE '1984-10-11' + INTERVAL 1 MONTH + INTERVAL 3 DAY
                     AS DATE) AS VARCHAR) AS plus_dur,
           datediff('day', DATE '1984-10-11', DATE '2015-06-24') AS days_between,
           'P30Y8M13D' AS cal_between,
           CAST(date_part('year', DATE '2015-07-21') AS BIGINT) AS year_part,
           'PT2H' AS time_between
    """,
)
def q_temporal_kernel(spark, sf_dir):
    """Temporal constructors/truncate/between through the Cypher front
    end (reference query/opencypher/functions/temporal/*), cross-checked
    against DuckDB's independent temporal implementation."""
    return _db(spark, sf_dir).query(
        "RETURN toString(date({year: 1816, week: 1})) AS week_date, "
        "toString(date.truncate('month', date('2017-11-27'))) AS trunc_month, "
        "toString(date('1984-10-11') + duration({months: 1, days: 3})) AS plus_dur, "
        "duration.inDays(date('1984-10-11'), date('2015-06-24')).days AS days_between, "
        "toString(duration.between(date('1984-10-11'), date('2015-06-24'))) AS cal_between, "
        "date('2015-07-21').year AS year_part, "
        "toString(duration.inSeconds(localtime('14:30'), localtime('16:30'))) AS time_between",
        language="cypher",
    )


@query(
    "q_knn_graph",
    # adjacency-set Jaccard kNN (AlgoKNN.java) vs DuckDB inverted-index
    # self-join — full hash check on the events-derived graph
    oracle="""
    WITH pairs AS (
      SELECT user_id AS s, lead(user_id) OVER (ORDER BY ts, event_id) AS d
      FROM events
    ), e AS (SELECT DISTINCT s, d FROM pairs WHERE d IS NOT NULL AND s <> d),
    adj AS (
      SELECT DISTINCT v, n FROM (
        SELECT s AS v, d AS n FROM e UNION ALL SELECT d AS v, s AS n FROM e
      )
    ),
    deg AS (SELECT v, count(*) AS dg FROM adj GROUP BY v),
    common AS (
      SELECT x.v AS a, y.v AS b, count(*) AS c
      FROM adj x JOIN adj y ON x.n = y.n AND x.v <> y.v
      GROUP BY x.v, y.v
    ),
    sim AS (
      SELECT a, b, CAST(c AS DOUBLE) / (da.dg + db.dg - c) AS s
      FROM common
      JOIN deg da ON da.v = common.a
      JOIN deg db ON db.v = common.b
    ),
    ranked AS (
      SELECT a, b, s,
             row_number() OVER (PARTITION BY a ORDER BY s DESC, b ASC) AS rn
      FROM sim
    )
    SELECT a AS node1, b AS node2, round(s, 4) + 0.0 AS similarity
    FROM ranked WHERE rn <= 3
    ORDER BY node1, node2 LIMIT 200
    """,
)
def q_knn_graph(spark, sf_dir):
    """Neighborhood-similarity kNN (AlgoKNN.java YIELD node1, node2,
    similarity) over the events-derived interaction graph."""
    from arcadedb_spark.graph.algorithms_extra3 import knn_similarity

    db = _db(spark, sf_dir)
    g = db.graph()
    base = db.schema.get("customer").bucket_id << 40
    out = knn_similarity(g.edges("INTERACTED"), k=3, direction="both")
    return (
        out.select(
            (F.col("node1") - base).alias("node1"),
            (F.col("node2") - base).alias("node2"),
            (F.round(F.col("similarity"), 4) + F.lit(0.0)).alias("similarity"),
        )
        .orderBy("node1", "node2")
        .limit(200)
    )


# ===========================================================================
# Unit-only components promoted to oracle coverage (round 5): bucket scan,
# RID lookup, SELECT without target, scalar set ops, SQL script engine,
# downsampling tiers, line protocol, triggers, DEFINE FUNCTION
# ===========================================================================


@query(
    "q_select_no_target",
    oracle="SELECT 3 AS x, 'AB' AS s, CAST(2.5 AS DOUBLE) AS h",
)
def q_select_no_target(spark, sf_dir):
    """SELECT without a target (query/sql/executor/SelectExecutionPlanner
    handles projection-only statements on a one-row source)."""
    return _db(spark, sf_dir).query(
        "SELECT 1 + 2 AS x, 'ab'.toUpperCase() AS s, 5 / 2.0 AS h"
    )


@query(
    "q_bucket_scan",
    oracle="""
    SELECT count(*) AS n,
           CAST(sum(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) AS total
    FROM customer
    """,
)
def q_bucket_scan(spark, sf_dir):
    """FetchFromClusterExecutionStep analog: `bucket:name` scans the
    bucket non-polymorphically (no subtype union)."""
    return _db(spark, sf_dir).query(
        "SELECT count(*) AS n, sum(c_acctbal.asDecimal()).asDouble() "
        "AS total FROM bucket:customer"
    )


@query(
    "q_rid_lookup",
    oracle="""
    SELECT c_name, c_mktsegment FROM customer
    WHERE c_custkey IN (3, 5) ORDER BY c_custkey
    """,
)
def q_rid_lookup(spark, sf_dir):
    """FetchFromRids point lookup (FetchFromRidsStep.java:32): customer
    is bucket #1 (registration order is sorted filenames), offset =
    natural key."""
    return _db(spark, sf_dir).query(
        "SELECT c_name, c_mktsegment FROM [#1:3, #1:5] ORDER BY c_name"
    )


@query(
    "q_set_ops_scalar",
    oracle="""
    SELECT o_orderkey,
           array_to_string([x FOR x IN [o_custkey, -1]
                            IF list_contains([-1, o_custkey], x)], ',') AS i,
           array_to_string([x FOR x IN [-1, -2, o_custkey]
                            IF NOT list_contains([-2], x)], ',') AS d,
           array_to_string(list_concat([o_custkey], [-1, o_custkey]), ',') AS u
    FROM orders WHERE o_orderkey < 20 ORDER BY o_orderkey
    """,
)
def q_set_ops_scalar(spark, sf_dir):
    """Multi-argument (scalar) set functions — SQLFunctionIntersect/
    Difference/UnionAll.java dispatch on argument count; one-argument
    forms stay aggregates.

    The array results are joined to comma strings (order preserved, so
    element order is still under test) for the grade only — the
    driver's pandas canonicalizer can't sort list-typed columns."""
    df = _db(spark, sf_dir).query(
        "SELECT o_orderkey, intersect([o_custkey, -1], [-1, o_custkey]) AS i, "
        "difference([-1, -2, o_custkey], [-2]) AS d, "
        "unionall([o_custkey], [-1, o_custkey]) AS u "
        "FROM orders WHERE o_orderkey < 20 ORDER BY o_orderkey"
    )
    for c in ("i", "d", "u"):
        df = df.withColumn(c, F.concat_ws(",", F.col(c).cast("array<string>")))
    return df


@query(
    "q_sql_script",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_acctbal > 9900 ORDER BY c_custkey LIMIT 5
    """,
)
def q_sql_script(spark, sf_dir):
    """SQL script engine (LET / IF / WHILE / RETURN —
    query/sql/executor/ScriptExecutionPlan.java): the script computes a
    threshold imperatively, then returns a query result."""
    db = _db(spark, sf_dir)
    return db.script(
        """
        LET $t = 9000;
        WHILE ($t < 9900) {
          LET $t = $t + 300;
        };
        IF ($t >= 9900) {
          LET $out = (SELECT c_custkey, c_name FROM customer
                      WHERE c_acctbal > $t ORDER BY c_custkey LIMIT 5);
          RETURN $out;
        };
        RETURN null
        """
    )


@query(
    "q_downsample_tiers",
    oracle="""
    WITH mx AS (SELECT max(epoch_ms(ts)) AS now_ms FROM events),
    g AS (
      SELECT event_type, epoch_ms(ts) AS ems,
             CASE WHEN (SELECT now_ms FROM mx) - epoch_ms(ts) > 86400000
                  THEN 86400000
                  WHEN (SELECT now_ms FROM mx) - epoch_ms(ts) > 3600000
                  THEN 3600000 ELSE 60000 END AS granularity_ms,
             value
      FROM events
    )
    SELECT CAST(ems // granularity_ms AS BIGINT) * granularity_ms
             AS bucket_ms,
           granularity_ms, event_type,
           count(*) AS n, round(avg(value), 4) AS avg_v
    FROM g GROUP BY 1, 2, 3 ORDER BY bucket_ms, event_type
    """,
)
def q_downsample_tiers(spark, sf_dir):
    """Age-tiered downsampling (timeseries retention/rollup tiers —
    engine/timeseries downsampling): >1d-old rows roll to daily buckets,
    >1h-old to hourly, fresh rows keep 60s buckets.  now = max(ts), so
    the result is deterministic."""
    from arcadedb_spark.timeseries.downsample import (
        DownsamplingTier, downsample,
    )

    ev = _db(spark, sf_dir).table("events")
    tiers = [
        DownsamplingTier(after_ms=3_600_000, granularity_ms=3_600_000),
        DownsamplingTier(after_ms=86_400_000, granularity_ms=86_400_000),
    ]
    return downsample(
        ev, "ts", tiers,
        {"n": F.count(F.lit(1)), "avg_v": F.round(F.avg("value"), 4)},
        group_by=["event_type"],
        base_granularity_ms=60_000,
    ).orderBy("bucket_ms", "event_type")


@query(
    "q_line_protocol",
    oracle="""
    SELECT measurement, host, CAST(usage AS DOUBLE) AS usage, ts_millis
    FROM (VALUES
      ('cpu', 'h1', 0.5, 1700000000000),
      ('cpu', 'h2', 0.75, 1700000001000),
      ('mem', 'h1', 0.9, 1700000002000)
    ) AS t(measurement, host, usage, ts_millis)
    ORDER BY ts_millis
    """,
)
def q_line_protocol(spark, sf_dir):
    """InfluxDB line-protocol ingestion (timeseries
    LineProtocolParser.java parity) — in-memory payload parsed to the
    typed samples frame."""
    from arcadedb_spark.sources.line_protocol import line_protocol_df

    df = line_protocol_df(
        spark,
        "cpu,host=h1 usage=0.5 1700000000\n"
        "cpu,host=h2 usage=0.75 1700000001\n"
        "mem,host=h1 usage=0.9 1700000002",
        precision="s",
    )
    return df.select(
        "measurement",
        F.col("tags")["host"].alias("host"),
        F.col("fields_double")["usage"].alias("usage"),
        "ts_millis",
    ).orderBy("ts_millis")


@query(
    "q_trigger_after_insert",
    oracle="""
    SELECT * FROM (VALUES ('created'), ('created'), ('seed'))
    AS t(event) ORDER BY event
    """,
)
def q_trigger_after_insert(spark, sf_dir):
    """AFTER CREATE trigger side effects (schema/trigger/
    TriggerExecutor.java, SQLTriggerExecutor.java): each insert fires
    one audit append; result = the audit trail."""
    db = _db(spark, sf_dir)
    db.command("DROP TYPE TrigAudit IF EXISTS")
    db.command("DROP TYPE TrigPerson IF EXISTS")
    db.command("CREATE DOCUMENT TYPE TrigAudit")
    db.command("INSERT INTO TrigAudit (event) VALUES ('seed')")
    db.command("CREATE DOCUMENT TYPE TrigPerson")
    db.command(
        "CREATE TRIGGER trig_q AFTER CREATE ON TYPE TrigPerson "
        "EXECUTE SQL 'INSERT INTO TrigAudit (event) VALUES (''created'')'"
    )
    db.command("INSERT INTO TrigPerson (name) VALUES ('x')")
    db.command("INSERT INTO TrigPerson (name) VALUES ('y')")
    db.command("DROP TRIGGER trig_q")
    return db.query("SELECT event FROM TrigAudit ORDER BY event")


@query(
    "q_define_function",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 4) AS net
    FROM lineitem WHERE l_orderkey < 10
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q_define_function(spark, sf_dir):
    """DEFINE FUNCTION SQL macro (function/SQLFunctionLibrary analog):
    the macro body inlines into the Catalyst plan — no UDF boundary."""
    db = _db(spark, sf_dir)
    db.command(
        "DEFINE FUNCTION qdf.net \"price * (1 - disc)\" "
        "PARAMETERS [price, disc] LANGUAGE sql"
    )
    return db.query(
        "SELECT l_orderkey, l_linenumber, "
        "round(qdf.net(l_extendedprice, l_discount), 4) AS net "
        "FROM lineitem WHERE l_orderkey < 10 "
        "ORDER BY l_orderkey, l_linenumber"
    )


@query(
    "q_match_cartesian_roots",
    oracle="""
    SELECT a.n_name AS an, b.n_name AS bn, count(*) AS n
    FROM nation a, nation b
    WHERE a.n_regionkey = 0 AND b.n_regionkey = 1
    GROUP BY 1, 2 ORDER BY an, bn
    """,
)
def q_match_cartesian_roots(spark, sf_dir):
    """Disconnected MATCH roots = cartesian product of the root frames
    (MatchExecutionPlanner.java cartesian step): two Nation filters with
    no connecting pattern."""
    return _db(spark, sf_dir).query(
        "MATCH {type: Nation, as: a, where: (n_regionkey = 0)}, "
        "{type: Nation, as: b, where: (n_regionkey = 1)} "
        "RETURN a.n_name AS an, b.n_name AS bn, count(*) AS n "
        "GROUP BY an, bn ORDER BY an, bn"
    )


@query(
    "q_apply_defaults",
    oracle="""
    SELECT name, status, CAST(score AS DOUBLE) AS score FROM (VALUES
      ('a', 'new', 0.5), ('b', 'old', 0.5)
    ) AS t(name, status, score) ORDER BY name
    """,
)
def q_apply_defaults(spark, sf_dir):
    """ApplyDefaults + declared-property validation (schema/Property
    DEFAULT constraint; query/sql executor ApplyDefaults step): absent
    insert columns take the declared default."""
    db = _db(spark, sf_dir)
    db.command("DROP TYPE DefScratch IF EXISTS")
    db.command("CREATE DOCUMENT TYPE DefScratch")
    db.command("CREATE PROPERTY DefScratch.status STRING (DEFAULT 'new')")
    db.command("CREATE PROPERTY DefScratch.score DOUBLE (DEFAULT 0.5)")
    db.command("INSERT INTO DefScratch (name) VALUES ('a')")
    db.command("INSERT INTO DefScratch (name, status) VALUES ('b', 'old')")
    return db.query("SELECT name, status, score FROM DefScratch ORDER BY name")


@query(
    "q_csv_import",
    oracle="""
    SELECT kind, count(*) AS n, CAST(sum(qty) AS BIGINT) AS total
    FROM (VALUES ('x', 1), ('x', 3), ('y', 5)) AS t(kind, qty)
    GROUP BY kind ORDER BY kind
    """,
)
def q_csv_import(spark, sf_dir):
    """CSV import (integration importer CSV format analog — spark.read
    .csv with header/schema inference is the Spark-native path): write a
    payload, import it as a type, aggregate."""
    import os
    import tempfile

    path = os.path.join(tempfile.gettempdir(), "arcade_q_csv_import.csv")
    with open(path, "w") as fh:
        fh.write("kind,qty\nx,1\nx,3\ny,5\n")
    db = _db(spark, sf_dir)
    df = spark.read.csv(path, header=True, inferSchema=True)
    db.schema.register("csv_scratch", df)
    return db.query(
        "SELECT kind, count(*) AS n, sum(qty) AS total FROM csv_scratch "
        "GROUP BY kind ORDER BY kind"
    )


@query(
    "q_import_statement",
    oracle="""
    SELECT kind, count(*) AS n, CAST(sum(qty) AS BIGINT) AS total
    FROM (VALUES ('x', 1), ('x', 3), ('y', 5)) AS t(kind, qty)
    GROUP BY kind ORDER BY kind
    """,
)
def q_import_statement(spark, sf_dir):
    """IMPORT DATABASE statement form (parser/ImportDatabaseStatement.
    java) — the SQL twin of q_csv_import: the statement registers the
    file as a type, then plain SQL aggregates it."""
    import os
    import tempfile

    path = os.path.join(tempfile.gettempdir(), "arcade_q_import_stmt.csv")
    with open(path, "w") as fh:
        fh.write("kind,qty\nx,1\nx,3\ny,5\n")
    db = _db(spark, sf_dir)
    db.command(f"IMPORT DATABASE file://{path} WITH typeName = import_stmt")
    return db.query(
        "SELECT kind, count(*) AS n, sum(qty) AS total FROM import_stmt "
        "GROUP BY kind ORDER BY kind"
    )


@query(
    "q_backup_restore",
    oracle="""
    SELECT k, CAST(v AS BIGINT) AS v FROM (VALUES ('a', 1), ('b', 2), ('c', 3))
    AS t(k, v) ORDER BY k
    """,
)
def q_backup_restore(spark, sf_dir):
    """Backup → restore roundtrip (integration exporter / Backup.java
    analog): a scratch database written to parquet re-opens with
    Database.open and serves identical rows."""
    import os
    import tempfile

    from arcadedb_spark.database import Database

    db = Database(spark)
    db.command("CREATE DOCUMENT TYPE BakScratch")
    db.command("INSERT INTO BakScratch (k, v) VALUES ('a', 1), ('b', 2), ('c', 3)")
    target = os.path.join(tempfile.gettempdir(), "arcade_q_backup")
    db.backup(target)
    restored = Database.open(spark, target)
    return restored.query("SELECT k, v FROM bakscratch ORDER BY k")


@query(
    "q_glove_import",
    oracle="""
    SELECT token, CAST(d0 AS DOUBLE) AS d0, dim FROM (VALUES
      ('king', 0.1, 3), ('queen', 0.4, 3)
    ) AS t(token, d0, dim) ORDER BY token
    """,
)
def q_glove_import(spark, sf_dir):
    """GloVe text import (integration importer vector formats): token +
    float vector parsed JVM-side from text splits."""
    import os
    import tempfile

    from arcadedb_spark.sources.readers import read_glove

    path = os.path.join(tempfile.gettempdir(), "arcade_q_glove.txt")
    with open(path, "w") as fh:
        fh.write("king 0.1 0.2 0.3\nqueen 0.4 0.5 0.6\n")
    df = read_glove(spark, path)
    return df.select(
        "token",
        # float32 storage: round the float->double widening artifact away
        F.round(F.element_at("vector", 1).cast("double"), 4).alias("d0"),
        F.size("vector").alias("dim"),
    ).orderBy("token")


@query(
    "q_knn_pq",
    oracle="""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0)
    SELECT vec_id, round(dist, 5) AS dist FROM (
      SELECT e.vec_id,
             list_distance(CAST(e.embedding AS DOUBLE[]), q.v) AS dist
      FROM embeddings e, q
      ORDER BY dist ASC, e.vec_id LIMIT 10
    ) ORDER BY dist, vec_id
    """,
)
def q_knn_pq(spark, sf_dir):
    """Product-Quantization ANN + exact re-rank (vector/pq.py; reference
    LSMVectorIndex jVector PQ mode): 64-float vectors compress to 8
    codebook ids, ADC scores the compressed corpus, and a generous
    re-rank window recovers the exact top-k on this fixture (recall@300
    = 1.0 at sf0.01 — the driver-gradeable property)."""
    from arcadedb_spark.vector.pq import pq_build, pq_search

    db = _db(spark, sf_dir)
    emb = db.table("embeddings")
    idx = pq_build(emb, "vec_id", "embedding")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    out = pq_search(
        idx, q, k=10, refine=300, data=emb,
        id_col="vec_id", vec_col="embedding",
    )
    return out.select(
        F.col("id").alias("vec_id"),
        F.round(F.sqrt("distance"), 5).alias("dist"),
    ).orderBy("dist", "vec_id")


@query(
    "q_having",
    oracle="""
    SELECT s_nationkey, count(*) AS n
    FROM supplier GROUP BY s_nationkey
    HAVING count(*) >= 3 ORDER BY s_nationkey
    """,
)
def q_having(spark, sf_dir):
    """GROUP BY … HAVING (reference SQL dialect post-aggregation
    filter): compiles in agg mode, filters the aggregated frame before
    projection."""
    return _db(spark, sf_dir).query(
        "SELECT s_nationkey, count(*) AS n FROM supplier "
        "GROUP BY s_nationkey HAVING count(*) >= 3 ORDER BY s_nationkey"
    )


@query(
    "q_named_buckets",
    oracle="""
    SELECT firstName, region FROM (VALUES
      ('Enzo', 'Europe'), ('Jack', 'Americas')
    ) AS t(firstName, region) ORDER BY firstName
    """,
)
def q_named_buckets(spark, sf_dir):
    """Named buckets (engine/LocalBucket.java; CREATE BUCKET + CREATE
    TYPE … BUCKET + INSERT INTO bucket: + bucket scan): the type scan
    unions its bucket slices; a bucket scan reads one slice."""
    db = _db(spark, sf_dir)
    db.command("DROP TYPE NbCst IF EXISTS")
    db.command("DROP BUCKET Nb_Europe IF EXISTS")
    db.command("DROP BUCKET Nb_Americas IF EXISTS")
    db.command("CREATE BUCKET Nb_Europe")
    db.command("CREATE BUCKET Nb_Americas")
    db.command("CREATE DOCUMENT TYPE NbCst BUCKET Nb_Europe,Nb_Americas")
    db.command(
        "INSERT INTO bucket:Nb_Europe CONTENT "
        "{ firstName: 'Enzo', region: 'Europe' }"
    )
    db.command(
        "INSERT INTO bucket:Nb_Americas CONTENT "
        "{ firstName: 'Jack', region: 'Americas' }"
    )
    return db.query(
        "SELECT firstName, region FROM NbCst ORDER BY firstName"
    )


@query(
    "q_path_expand",
    oracle="""
    WITH o AS (SELECT o_orderkey FROM orders WHERE o_custkey = 7),
    d2 AS (
      SELECT DISTINCT l.l_orderkey, l.l_partkey
      FROM lineitem l JOIN o ON l.l_orderkey = o.o_orderkey
    )
    SELECT l, n FROM (
      SELECT 1 AS l, count(*) AS n FROM o
      UNION ALL
      SELECT 2 AS l, count(*) AS n FROM d2
    ) ORDER BY l
    """,
)
def q_path_expand(spark, sf_dir):
    """CALL path.expand (procedures/path/PathExpand.java:54): bounded
    undirected simple-path enumeration from a bound node, relationship-
    type filtered; lowered to one distributed frontier BFS, not a
    per-row driver loop."""
    return _db(spark, sf_dir).query(
        "MATCH (c:Customer {c_custkey: 7}) "
        "CALL path.expand(c, 'PLACED,CONTAINS', null, 1, 2) YIELD path "
        "RETURN length(path) AS l, count(*) AS n ORDER BY l",
        language="cypher",
    )


@query(
    "q_cypher_qpp",
    oracle="""
    WITH pairs AS (
      SELECT user_id AS s, lead(user_id) OVER (ORDER BY ts, event_id) AS d
      FROM events
    ), e AS (SELECT DISTINCT s, d FROM pairs WHERE d IS NOT NULL AND s <> d),
    r1 AS (SELECT d AS v FROM e WHERE s = 7),
    r2 AS (SELECT e2.d AS v FROM r1 JOIN e e2 ON e2.s = r1.v)
    SELECT DISTINCT v AS k
    FROM (SELECT v FROM r1 UNION ALL SELECT v FROM r2) ORDER BY k
    """,
)
def q_cypher_qpp(spark, sf_dir):
    """GQL quantified path pattern (Cypher25Parser.g4:419
    parenthesizedPath; CypherASTBuilder.java absorbParenthesizedPath):
    ((x)-[:R]->(y)){1,2} lowers onto the var-length expansion; distinct
    reachable endpoints within 2 hops."""
    return _db(spark, sf_dir).query(
        "MATCH (a:Customer {c_custkey: 7}) "
        "((x)-[:INTERACTED]->(y)){1,2} (b:Customer) "
        "RETURN DISTINCT b.c_custkey AS k ORDER BY k",
        language="cypher",
    )


@query(
    "q_load_csv",
    oracle="""
    SELECT name, CAST(age AS BIGINT) AS age, CAST(ln AS BIGINT) AS ln
    FROM (VALUES ('alpha', 10, 2), ('beta', 20, 3), ('gamma', 30, 4))
      AS t(name, age, ln)
    ORDER BY name
    """,
)
def q_load_csv(spark, sf_dir):
    """Cypher LOAD CSV (LoadCSVStep.java:61): WITH HEADERS row-map
    binding, toInteger conversion, linenumber() (header = line 1)."""
    import os
    import tempfile

    db = _db(spark, sf_dir)
    path = os.path.join(tempfile.gettempdir(), "arcade_q_loadcsv.csv")
    with open(path, "w") as fh:
        fh.write("name,age\nalpha,10\nbeta,20\ngamma,30\n")
    return db.query(
        f"LOAD CSV WITH HEADERS FROM '{path}' AS row "
        "RETURN row.name AS name, toInteger(row.age) AS age, "
        "linenumber() AS ln ORDER BY name",
        language="cypher",
    )


@query(
    "q_cross_surface_roundtrip",
    oracle="""
    SELECT * FROM (
      SELECT n_name,
             CAST(n_nationkey AS BIGINT) AS n_nationkey,
             CASE WHEN n_nationkey < 10
                  THEN CAST(n_nationkey * 2 AS BIGINT) END AS flag
      FROM nation WHERE n_nationkey <> 24
      UNION ALL
      SELECT 'zz_extra', CAST(99 AS BIGINT), CAST(7 AS BIGINT)
    ) ORDER BY n_nationkey, n_name
    """,
)
def q_cross_surface_roundtrip(spark, sf_dir):
    """One-store symmetry (QueryEngineManager.java:60 — one record store
    under every language): SQL INSERT FROM SELECT → Cypher SET → Cypher
    CREATE → SQL DELETE → SQL SELECT, every write visible across both
    surfaces with stable identity."""
    db = _db(spark, sf_dir)
    db.command("DROP TYPE XsPerson IF EXISTS")
    db.command("CREATE VERTEX TYPE XsPerson")
    db.command(
        "INSERT INTO XsPerson FROM SELECT n_name, n_nationkey FROM nation"
    )
    db.query(
        "MATCH (p:XsPerson) WHERE p.n_nationkey < 10 "
        "SET p.flag = p.n_nationkey * 2",
        language="cypher",
    ).collect()
    db.query(
        "CREATE (:XsPerson {n_name: 'zz_extra', n_nationkey: 99, flag: 7})",
        language="cypher",
    ).collect()
    db.command("DELETE FROM XsPerson WHERE n_nationkey = 24")
    return db.query(
        "SELECT n_name, n_nationkey.asLong() AS n_nationkey, "
        "flag.asLong() AS flag "
        "FROM XsPerson ORDER BY n_nationkey, n_name"
    )


@query(
    "q_in_subquery_same_name",
    oracle="""
    SELECT m, n FROM (
      SELECT 'in' AS m, count(*) AS n FROM orders
      WHERE o_custkey IN (SELECT o_custkey FROM orders
                          WHERE o_totalprice > 400000)
      UNION ALL
      SELECT 'notin' AS m, count(*) AS n FROM orders
      WHERE o_custkey NOT IN (SELECT o_custkey FROM orders
                              WHERE o_totalprice > 400000)
    ) ORDER BY m
    """,
)
def q_in_subquery_same_name(spark, sf_dir):
    """``x IN (SELECT x ...)`` where the outer and subquery column names
    collide — the default IN-subquery shape (InConditionSubqueryTest.java
    :74-120 asserts rows).  The subquery output is renamed to the join
    alias pre-join, so the semi/anti condition can never be ambiguous."""
    db = _db(spark, sf_dir)
    a = db.query(
        "SELECT 'in' AS m, count(*) AS n FROM orders WHERE o_custkey IN "
        "(SELECT o_custkey FROM orders WHERE o_totalprice > 400000)"
    )
    b = db.query(
        "SELECT 'notin' AS m, count(*) AS n FROM orders "
        "WHERE o_custkey NOT IN "
        "(SELECT o_custkey FROM orders WHERE o_totalprice > 400000)"
    )
    return a.unionByName(b).orderBy("m")


@query(
    "q_cypher_rid_roundtrip",
    oracle="""
    SELECT n_name, CAST(n_nationkey AS BIGINT) AS k,
           CASE WHEN n_nationkey = 3 THEN CAST(1 AS BIGINT) END AS touched
    FROM nation WHERE n_nationkey < 5 AND n_nationkey <> 1
    ORDER BY k
    """,
)
def q_cypher_rid_roundtrip(spark, sf_dir):
    """cypherRID() — the inverse of Cypher id() — as a SELECT/UPDATE/
    DELETE target (SQLFunctionCypherRID.java, issue #4282): Cypher id()
    values resolve back to live records through the one-store identity."""
    db = _db(spark, sf_dir)
    db.command("DROP TYPE CrrV IF EXISTS")
    db.command("CREATE VERTEX TYPE CrrV")
    db.command(
        "INSERT INTO CrrV FROM SELECT n_name, n_nationkey FROM nation "
        "WHERE n_nationkey < 5"
    )
    ids = {
        r["k"]: r["i"]
        for r in db.query(
            "MATCH (p:CrrV) RETURN id(p) AS i, p.n_nationkey AS k",
            language="cypher",
        ).collect()
    }
    db.command(f"UPDATE cypherRID({ids[3]}) SET touched = 1")
    db.command(f"DELETE FROM cypherRID({ids[1]})")
    out = None
    for k in (0, 2, 3, 4):
        part = db.query(
            f"SELECT n_name, n_nationkey.asLong() AS k, "
            f"touched.asLong() AS touched FROM cypherRID({ids[k]})"
        )
        out = part if out is None else out.unionByName(part)
    return out.orderBy("k")


@query(
    "q_contains_condition",
    oracle="""
    SELECT doc_id FROM documents
    WHERE len(list_filter(string_split(text, ' '),
              x -> x ILIKE 'the')) > 0
    ORDER BY doc_id
    """,
)
def q_contains_condition(spark, sf_dir):
    """CONTAINS condition-form — ``coll CONTAINS (<cond>)`` evaluates the
    predicate per element with @this bound (ContainsCondition.java,
    QueryTest.java:615-630); lowered to F.exists, never a UDF."""
    return _db(spark, sf_dir).query(
        "SELECT doc_id FROM documents "
        "WHERE text.split(' ') CONTAINS (@this ILIKE 'the') "
        "ORDER BY doc_id"
    )


@query(
    "q_sql_graph_nav",
    oracle="""
    SELECT c_custkey,
           CAST(to_json(COALESCE(list_sort(list(o_orderkey)
                    FILTER (WHERE o_orderkey IS NOT NULL)), [])) AS VARCHAR) AS keys
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    WHERE c_custkey < 20
    GROUP BY c_custkey ORDER BY c_custkey
    """,
)
def q_sql_graph_nav(spark, sf_dir):
    """SQL graph-navigation functions (function/sql/graph/
    SQLFunctionOut.java): ``SELECT out('E').prop FROM V`` — one grouped
    equi-join marker per distinct call, array-struct field extraction
    downstream; sorted for deterministic comparison.  List-valued output
    is JSON-serialized (round-6 canon rule: no array/map output columns)."""
    df = _db(spark, sf_dir).query(
        "SELECT c_custkey, out('PLACED').o_orderkey.sort() AS keys "
        "FROM Customer WHERE c_custkey < 20 ORDER BY c_custkey"
    )
    return df.select("c_custkey", F.to_json("keys").alias("keys"))


@query(
    "q_meta_stats",
    oracle="""
    SELECT (SELECT count(*) FROM customer) AS customers,
           (SELECT count(*) FROM orders) AS orders_n,
           (SELECT count(*) FROM part) AS parts,
           (SELECT count(*) FROM supplier) AS suppliers,
           (SELECT count(*) FROM nation) AS nations,
           (SELECT count(*) FROM orders) AS placed
    """,
)
def q_meta_stats(spark, sf_dir):
    """CALL meta.stats() (procedures/meta/MetaStats.java): per-label node
    counts and per-type relationship counts in one struct; pinned to the
    fixture labels so concurrent scratch types don't perturb the hash."""
    return _db(spark, sf_dir).query(
        "CALL meta.stats() YIELD value "
        "RETURN value.labels['Customer'] AS customers, "
        "value.labels['Order'] AS orders_n, "
        "value.labels['Part'] AS parts, "
        "value.labels['Supplier'] AS suppliers, "
        "value.labels['Nation'] AS nations, "
        "value.relTypes['PLACED'] AS placed",
        language="cypher",
    )


@query(
    "q_backup_statement",
    oracle="""
    SELECT k, v FROM (VALUES (1, 'a'), (2, 'b'), (3, 'c')) AS t(k, v)
    ORDER BY k
    """,
)
def q_backup_statement(spark, sf_dir):
    """BACKUP DATABASE statement → IMPORT DATABASE roundtrip
    (BackupDatabaseStatement.java / ImportDatabaseStatement.java): a
    scratch database backs up to jsonl and a second database imports the
    type back."""
    import os
    import shutil
    import tempfile

    from arcadedb_spark.database import Database

    # scratch fixture lives under the system temp dir, not the repo tree
    # (a verify run must leave `git status` clean)
    bk = os.path.join(tempfile.gettempdir(), "arcade_q_backup_stmt")
    shutil.rmtree(bk, ignore_errors=True)
    src = Database(spark)
    src.command("CREATE DOCUMENT TYPE BkR8")
    src.command("INSERT INTO BkR8 (k, v) VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    src.command(f"BACKUP DATABASE 'file://{bk}'")
    dst = Database(spark)
    dst.command(f"IMPORT DATABASE 'file://{bk}/BkR8.jsonl'")
    return dst.query("SELECT k.asInteger() AS k, v FROM BkR8 ORDER BY k")


@query(
    "q_kv_ops",
    oracle="""
    SELECT key, value FROM (VALUES
      ('counter', '7'), ('k1', 'v1'), ('k3', 'v3b'), ('user:2', 'bob')
    ) AS t(key, value) ORDER BY key
    """,
)
def q_kv_ops(spark, sf_dir):
    """Redis KV skin (redisw/ command surface): SET/MSET/INCR/DELETE/
    GETDEL over a key-bucketed table; the final store state is the
    verifiable artifact."""
    from arcadedb_spark.database import Database

    db = Database(spark)
    kv = db.kv("kv_r8")
    kv.set("k1", "v1")
    kv.mset({"k2": "v2", "k3": "v3", "user:2": "bob"})
    kv.set("k3", "v3b")
    kv.incr("counter", 3)
    kv.incr("counter", 4)
    kv.delete("k2")
    assert kv.get("k1") == "v1" and kv.exists("user:2")
    return db.query("SELECT key, value FROM kv_r8 ORDER BY key")


_PRIORITY = [
    # round-8 rotation: the new operators first
    "q_meta_stats",
    "q_backup_statement",
    "q_kv_ops",
    "q_sql_graph_nav",
    "q_contains_condition",
    "q_cypher_rid_roundtrip",
    "q_in_subquery_same_name",
    # round-7 rotation
    "q_cross_surface_roundtrip",
    "q_load_csv",
    "q_cypher_qpp",
    "q_path_expand",
    "q_having",
    "q_named_buckets",
    # round-6 grading rotation: never-driver-graded queries first
    # (q_mongo_aggregate, q_import_statement), then the three
    # canon-reshaped queries that ERRed in r5, then every other
    # query ordered by the round it was last driver-graded
    # (least-recent first) so the ~50-query gate rotates coverage.
    "q_mongo_aggregate",
    "q_import_statement",
    "q_cypher_count_collect",
    "q_gremlin_group",
    "q_set_ops_scalar",
    "q_bm25",
    "q_degree_centrality",
    "q_exact_dedup",
    "q_graph_bfs_hops",
    "q_knn_cosine",
    "q_knn_l2",
    "q_language_id",
    "q_let_per_record",
    "q_link_2hop",
    "q_link_3hop",
    "q_match_2hop",
    "q_match_3hop",
    "q_match_not",
    "q_match_optional",
    "q_moving_avg",
    "q_ngram_jaccard",
    "q_pagerank",
    "q_quality_score",
    "q_schema_types",
    "q_token_count",
    "q_traverse_bfs",
    "q_triangle_count",
    "q_ts_lag_delta",
    "q_ts_rank",
    "q_unwind",
    "q_wcc",
    "q_adamic_adar",
    "q_agg_percentiles",
    "q_agg_tail",
    "q_array_selectors",
    "q_article_rank",
    "q_binary_quantize_hamming",
    "q_clustering_coefficient",
    "q_collect_sorted",
    "q_common_neighbors",
    "q_contains_ops",
    "q_continuous_aggregate",
    "q_conversion_methods",
    "q_cypher_match",
    "q_cypher_optional",
    "q_cypher_string_preds",
    "q_cypher_varlength",
    "q_dml_roundtrip",
    "q_embedding_near_dup",
    "q_expand",
    "q_fastrp",
    "q_geo_distance",
    "q_geo_polygon",
    "q_geo_radius_join",
    "q_graphql_nested",
    "q_gremlin_groupcount",
    "q_gremlin_repeat",
    "q_harmonic_centrality",
    "q_hits",
    "q_interpolate",
    "q_jaccard_link_prediction",
    "q_json_dynamic_props",
    "q_k_core",
    "q_knn_ivf",
    "q_knn_lsh",
    "q_math_functions",
    "q_minhash_dedup",
    "q_mongo_find",
    "q_multimodal_features",
    "q_preferential_attachment",
    "q_promql_range_avg",
    "q_resource_allocation",
    "q_rrf_hybrid",
    "q_scc",
    "q_simhash_dedup",
    "q_sparse_dot",
    "q_time_bucket",
    "q_ts_rate",
    "q_ts_sql_bucket",
    "q_ts_sql_lag_grouped",
    "q_vector_quantize",
    "q_agg_suite",
    "q_apply_defaults",
    "q_astar",
    "q_backup_restore",
    "q_bucket_scan",
    "q_case_when",
    "q_cliques",
    "q_count_star",
    "q_csv_import",
    "q_cypher_pattern_pred",
    "q_cypher_pattern_size",
    "q_cypher_quantifiers",
    "q_date_functions",
    "q_define_function",
    "q_distinct",
    "q_downsample_tiers",
    "q_gav_read",
    "q_glove_import",
    "q_gremlin_edge_steps",
    "q_gremlin_project",
    "q_gremlin_sack",
    "q_in_subquery",
    "q_knn_graph",
    "q_knn_pq",
    "q_ksp",
    "q_leiden",
    "q_like_between_in",
    "q_line_protocol",
    "q_louvain",
    "q_match_cartesian_roots",
    "q_match_edge_props",
    "q_maxflow",
    "q_mv_incremental_equiv",
    "q_not_in_subquery",
    "q_null_handling",
    "q_rid_lookup",
    "q_scan_filter_project",
    "q_search_predicate",
    "q_select_no_target",
    "q_sessionize",
    "q_sql_script",
    "q_string_methods",
    "q_temporal_kernel",
    "q_topk_skip_limit",
    "q_total_neighbors",
    "q_tpch_q1",
    "q_trigger_after_insert",
]


def _reorder() -> None:
    global QUERIES, ORACLES
    order = [q for q in _PRIORITY if q in QUERIES] + [
        q for q in QUERIES if q not in _PRIORITY
    ]
    QUERIES = {k: QUERIES[k] for k in order}
    ORACLES = {k: ORACLES[k] for k in order if k in ORACLES}


_reorder()

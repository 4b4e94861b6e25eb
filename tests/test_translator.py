"""SELECT translator end-to-end tests against the sf0.001 fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_scan_filter(db):
    rows = db.query(
        "SELECT c_custkey FROM customer WHERE c_acctbal > 9000"
    ).collect()
    assert rows
    base = db.table("customer").filter(F.col("c_acctbal") > 9000).count()
    assert len(rows) == base


def test_projection_alias_and_methods(db):
    r = db.query(
        "SELECT c_name.toUpperCase() AS u, c_name.length() AS l "
        "FROM customer WHERE c_custkey = 1"
    ).collect()[0]
    assert r["u"].startswith("CUSTOMER#") and r["l"] == 18


def test_group_by_agg(db):
    rows = db.query(
        "SELECT c_mktsegment, count(*) AS n, round(avg(c_acctbal), 2) AS a "
        "FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment"
    ).collect()
    assert sum(r["n"] for r in rows) == 150
    assert rows == sorted(rows, key=lambda r: r["c_mktsegment"])


def test_agg_whole_table(db):
    r = db.query("SELECT min(c_acctbal) AS lo, max(c_acctbal) AS hi FROM customer").collect()[0]
    assert r["lo"] < r["hi"]


def test_order_by_hidden_projection(db):
    # ORDER BY column not in projection → hidden sort column
    rows = db.query(
        "SELECT c_name FROM customer ORDER BY c_acctbal DESC LIMIT 3"
    ).collect()
    top = (
        db.table("customer").orderBy(F.desc("c_acctbal")).limit(3).collect()
    )
    assert [r["c_name"] for r in rows] == [r["c_name"] for r in top]


def test_skip_limit(db):
    rows = db.query(
        "SELECT c_custkey FROM customer ORDER BY c_custkey SKIP 10 LIMIT 5"
    ).collect()
    assert [r[0] for r in rows] == [10, 11, 12, 13, 14]


def test_distinct(db):
    rows = db.query("SELECT DISTINCT c_mktsegment FROM customer").collect()
    assert len(rows) == 5


def test_in_subquery_semi_join(db):
    n = db.query(
        "SELECT count(*) AS n FROM orders WHERE o_custkey IN "
        "(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')"
    ).collect()[0]["n"]
    assert n > 0


def test_link_navigation(db):
    r = db.query(
        "SELECT c_name, c_nationkey.n_regionkey.r_name AS region "
        "FROM customer WHERE c_custkey = 0"
    ).collect()[0]
    assert r["region"] in ("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")


def test_let_global_and_per_record(db):
    rows = db.query(
        "SELECT o_orderkey FROM orders LET t = o_totalprice * 2 WHERE $t > 700000"
    ).collect()
    check = db.table("orders").filter(F.col("o_totalprice") * 2 > 700000).count()
    assert len(rows) == check


def test_unwind(db):
    rows = db.query(
        "SELECT doc_id, text.split(' ') AS w FROM documents WHERE doc_id = 0 UNWIND w"
    ).collect()
    assert len(rows) > 10
    assert all(isinstance(r["w"], str) for r in rows)


def test_rid_target(db):
    rows = db.query("SELECT @rid, c_name FROM #1:5").collect()
    assert len(rows) == 1 and rows[0]["@rid"] == "#1:5"


def test_params(db):
    rows = db.query(
        "SELECT c_name FROM customer WHERE c_custkey = :k", k=7
    ).collect()
    assert len(rows) == 1


def test_schema_virtual_tables(db):
    names = {r["name"] for r in db.query("SELECT name FROM schema:types").collect()}
    assert "customer" in names and "lineitem" in names


def test_fluent_builder(db):
    rows = (
        db.select()
        .from_type("customer")
        .property("c_mktsegment")
        .eq("BUILDING")
        .order_by("c_acctbal", ascending=False)
        .limit(2)
        .df()
        .collect()
    )
    assert len(rows) == 2
    assert rows[0]["c_acctbal"] >= rows[1]["c_acctbal"]


def test_text_function_tail(db):
    r = db.query(
        "SELECT camelCase('hello big world') AS c, snakeCase('Hello World') AS s, "
        "slug('Hello, World!') AS g, hamming('karolin', 'kathrin') AS h, "
        "levenshteinSimilarity('kitten', 'sitting') AS ls FROM customer LIMIT 1"
    ).collect()[0]
    assert r["c"] == "helloBigWorld"
    assert r["s"] == "hello_world"
    assert r["g"] == "hello-world"
    assert r["h"] == 3
    assert abs(r["ls"] - (1 - 3 / 7)) < 1e-9


def test_geo_functions(db):
    r = db.query(
        "SELECT round(distance(48.85, 2.35, 51.5, -0.12), 0) AS paris_london, "
        "geo.bboxContains(40, -10, 60, 10, 48.85, 2.35) AS in_europe FROM customer LIMIT 1"
    ).collect()[0]
    assert 330 <= r["paris_london"] <= 350  # ~343 km
    assert r["in_europe"] is True


def test_array_condition_selectors(db, spark):
    df = spark.createDataFrame(
        [
            (1, [{"city": "Rome", "n": 2}, {"city": "Oslo", "n": 5}], [1, 5, 9]),
            (2, [{"city": "Rome", "n": 7}], [2, 3]),
        ],
        "id long, addresses array<struct<city:string,n:int>>, nums array<int>",
    )
    db.register_type("sel_persons", df, key="id")
    try:
        rows = db.query(
            "SELECT id, addresses[city = 'Rome' AND n > 2] AS busy, "
            "nums[> 2] AS big, nums[0..2] AS head, nums[0] AS first "
            "FROM sel_persons ORDER BY id"
        ).collect()
        assert [len(r["busy"]) for r in rows] == [0, 1]
        assert rows[0]["big"] == [5, 9]
        assert rows[0]["head"] == [1, 5]
        assert rows[0]["first"] == 1
        like = db.query(
            "SELECT addresses[city LIKE 'R%'] AS r FROM sel_persons WHERE id = 1"
        ).collect()[0]["r"]
        assert [x["city"] for x in like] == ["Rome"]
    finally:
        db.schema.drop("sel_persons")


def test_nested_projection(db, spark):
    df = spark.createDataFrame(
        [(1, {"a": 1, "b": 2, "c": 3})], "id long, emb struct<a:int,b:int,c:int>"
    )
    db.register_type("np_t", df, key="id")
    try:
        r = db.query("SELECT emb:{a, c} AS ac FROM np_t").collect()[0]["ac"]
        assert r.asDict() == {"a": 1, "c": 3}
        r2 = db.query("SELECT emb:{*, !b} AS nob FROM np_t").collect()[0]["nob"]
        assert r2.asDict() == {"a": 1, "c": 3}
    finally:
        db.schema.drop("np_t")


def test_text_similarity_tail(db):
    r = db.query(
        "SELECT round(jaroWinklerDistance('MARTHA', 'MARHTA'), 4) AS jw, "
        "round(jaroWinklerDistance('DIXON', 'DICKSONX'), 4) AS jw2, "
        "round(sorensenDiceSimilarity('night', 'nacht'), 4) AS sd, "
        "sorensenDiceSimilarity('abc', 'abc') AS sd_eq, "
        "sorensenDiceSimilarity('a', 'b') AS sd_short "
        "FROM region LIMIT 1"
    ).collect()[0]
    assert r["jw"] == 0.9611 and r["jw2"] == 0.8133  # canonical JW values
    assert r["sd"] == 0.25  # bigram sets {ni,ig,gh,ht} vs {na,ac,ch,ht}
    assert r["sd_eq"] == 1.0 and r["sd_short"] == 0.0


def test_normalize_method(db):
    r = db.query(
        r"SELECT 'café'.normalize('NFD', '\\p{M}') AS plain "
        "FROM region LIMIT 1"
    ).collect()[0]
    assert r["plain"] == "cafe"


def test_schema_virtual_tables_full(db):
    # FetchFromSchema*Step variants (9 in the reference; GAV/MV/CA/stats/
    # dictionary added alongside types/buckets/indexes/database)
    stats = {r["type"]: r["row_count"] for r in
             db.query("SELECT type, row_count FROM schema:stats").collect()}
    assert stats["lineitem"] > 0 and stats["region"] == 5
    d = db.query("SELECT id, name FROM schema:dictionary").collect()
    assert {r["name"] for r in d} >= {"r_name", "l_quantity", "c_custkey"}
    assert len({r["id"] for r in d}) == len(d)  # stable unique ids
    mv = db.query("SELECT name FROM schema:materializedViews").collect()
    assert mv == []  # none registered on the shared fixture db
    db.graph()  # registers edge types for the GAV listing
    gav = {r["edge_type"] for r in
           db.query("SELECT edge_type FROM schema:graphAnalyticalViews").collect()}
    assert {"PLACED", "INTERACTED"} <= gav


def test_aggregate_tail(db):
    r = db.query(
        "SELECT doc_id % 2 AS g, intersect(text.split(' ')) AS common, "
        "map(doc_id.asString(), lang) AS m, product(doc_id + 1) AS p, "
        "nth(doc_id, 1) AS second "
        "FROM documents WHERE doc_id < 6 GROUP BY g ORDER BY g"
    ).collect()
    assert len(r) == 2
    assert all(len(row["m"]) == 3 for row in r)
    assert r[0]["p"] == 1 * 3 * 5 and r[1]["p"] == 2 * 4 * 6
    assert r[0]["second"] == 2 and r[1]["second"] == 3
    assert all(isinstance(row["common"], list) for row in r)


def test_fluent_vector_search(db):
    q = [0.1] * 64
    rows = (
        db.select()
        .from_type("embeddings")
        .vector_property("embedding")
        .vector_query(q)
        .vector_k(5)
        .df()
        .collect()
    )
    assert len(rows) == 5
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_vector_function_tail(db):
    r = db.query(
        "SELECT vector.add([1.0, 2.0], [3.0, 4.0]) AS va, "
        "vector.subtract([5.0, 5.0], [1.0, 2.0]) AS vsub, "
        "vector.multiply([2.0, 3.0], [4.0, 5.0]) AS vmul, "
        "vector.clip([-5.0, 0.5, 5.0], 0, 1) AS vclip, "
        "vector.magnitude([3.0, 4.0]) AS mag, "
        "vector.l1Norm([1.0, -2.0]) AS l1, vector.lInfNorm([1.0, -7.0]) AS li, "
        "vector.sum([1.0, 2.0, 3.0]) AS vsum, vector.avg([1.0, 3.0]) AS vavg, "
        "vector.dimension([1.0, 2.0, 3.0]) AS dim, "
        "vector.hasNull([1.0, 2.0]) AS hn, "
        "vector.isNormalized([0.6, 0.8]) AS norm, "
        "round(vector.hybridScore(0.8, 0.4, 0.75), 4) AS hs, "
        "vector.scoreTransform(0.0, 'SIGMOID') AS st, "
        "vector.normalizeScores([1.0, 3.0, 5.0]) AS ns, "
        "vector.toString([1.0, 2.0]) AS vstr "
        "FROM region LIMIT 1"
    ).collect()[0]
    assert r["va"] == [4.0, 6.0] and r["vsub"] == [4.0, 3.0]
    assert r["vmul"] == [8.0, 15.0] and r["vclip"] == [0.0, 0.5, 1.0]
    assert r["mag"] == 5.0 and r["l1"] == 3.0 and r["li"] == 7.0
    assert r["vsum"] == 6.0 and r["vavg"] == 2.0 and r["dim"] == 3
    assert r["hn"] is False and r["norm"] is True
    assert r["hs"] == 0.7 and r["st"] == 0.5
    assert r["ns"] == [0.0, 0.5, 1.0] and r["vstr"] == "[1.0, 2.0]"


def test_misc_function_tail(db):
    r = db.query(
        "SELECT version() AS v, eval('2 + 3 * 4') AS ev, "
        "duration(2, 'hours') AS dur FROM region LIMIT 1"
    ).collect()[0]
    assert r["ev"] == 14 and r["dur"] == 7_200_000 and r["v"]
    sp = db.query("SELECT round(stddevp(r_regionkey), 3) AS sp FROM region").collect()[0]["sp"]
    assert sp == 1.414


def test_ts_interpolate(db, spark):
    df = spark.createDataFrame(
        [(1, 1000, 10.0), (1, 2000, None), (1, 3000, 30.0), (1, 4000, None)],
        "uid long, ms long, v double",
    ).selectExpr("uid", "ms", "timestamp_millis(ms) AS ts", "v")
    db.register_type("interp_t", df, key="ms")
    try:
        rows = db.query(
            "SELECT ms, ts.interpolate(v, ts) AS iv FROM interp_t GROUP BY uid"
        ).collect()
        by_ms = {r["ms"]: r["iv"] for r in rows}
        assert by_ms[2000] == 20.0  # linear between 10 and 30
        assert by_ms[4000] == 30.0  # trailing null → carry last
    finally:
        db.schema.drop("interp_t")


def test_method_tail(db):
    r = db.query(
        "SELECT ''.ifEmpty('fb') AS ie, [1, 2, 3].join('-') AS j, "
        "'hello world hello'.lastIndexOf('hello') AS li, "
        "'xyz'.lastIndexOf('q') AS li_missing, "
        "3.14159.precision(2) AS p, [1, 2, 1, 3].removeAll(1) AS ra, "
        "[0.5, 0.25].asVector() AS av, 42.javaType() AS jt "
        "FROM region LIMIT 1"
    ).collect()[0]
    assert r["ie"] == "fb" and r["j"] == "1-2-3"
    assert r["li"] == 12 and r["li_missing"] == -1
    assert r["p"] == 3.14 and r["ra"] == [2, 3]
    assert r["av"] == [0.5, 0.25] and r["jt"] in ("int", "bigint")


def test_nested_in_subquery_is_join_not_collect(db):
    # IN-subquery under OR can't be a semi-join; it must become a left-join
    # marker column (never a driver-side collect of the subquery values).
    q = (
        "SELECT c_custkey FROM customer WHERE c_acctbal < -900 "
        "OR c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)"
    )
    df = db.query(q)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" in plan  # subquery joined, not isin(collected literals)
    got = {r[0] for r in df.collect()}
    cust = db.table("customer")
    orders = db.table("orders")
    rich = {r[0] for r in orders.filter(F.col("o_totalprice") > 400000).select("o_custkey").collect()}
    want = {
        r[0]
        for r in cust.filter((F.col("c_acctbal") < -900) | F.col("c_custkey").isin(list(rich))).select("c_custkey").collect()
    }
    assert got == want


def test_nested_not_in_subquery_null_semantics(db):
    # NOT(x IN (subquery)) nested under NOT — three-valued semantics must
    # hold: with no NULLs in the subquery this equals the set difference.
    q = (
        "SELECT c_custkey FROM customer WHERE NOT (c_custkey IN "
        "(SELECT o_custkey FROM orders WHERE o_totalprice > 400000) "
        "OR c_acctbal < -900)"
    )
    got = {r[0] for r in db.query(q).collect()}
    cust = db.table("customer")
    orders = db.table("orders")
    rich = {r[0] for r in orders.filter(F.col("o_totalprice") > 400000).select("o_custkey").collect()}
    want = {
        r[0]
        for r in cust.filter(~((F.col("c_acctbal") < -900) | F.col("c_custkey").isin(list(rich)))).select("c_custkey").collect()
    }
    assert got == want


def test_in_subquery_same_column_name(spark):
    """``x IN (SELECT x ...)`` with colliding outer/subquery column names
    must not raise AMBIGUOUS_REFERENCE (the default IN-subquery shape;
    reference asserts rows: InConditionSubqueryTest.java:74-120)."""
    from arcadedb_spark.database import Database

    db = Database(spark)
    db.command("CREATE DOCUMENT TYPE Person4337")
    db.command("CREATE DOCUMENT TYPE AllowedName4337")
    db.command("INSERT INTO Person4337 SET name = 'Alice', age = 30")
    db.command("INSERT INTO Person4337 SET name = 'Bob', age = 25")
    db.command("INSERT INTO Person4337 SET name = 'Charlie', age = 40")
    db.command("INSERT INTO AllowedName4337 SET name = 'Alice'")
    db.command("INSERT INTO AllowedName4337 SET name = 'Charlie'")

    got = db.query(
        "SELECT name FROM Person4337 WHERE name IN "
        "(SELECT name FROM AllowedName4337) ORDER BY name"
    ).collect()
    assert [r["name"] for r in got] == ["Alice", "Charlie"]

    got = db.query(
        "SELECT name FROM Person4337 WHERE name NOT IN "
        "(SELECT name FROM AllowedName4337) ORDER BY name"
    ).collect()
    assert [r["name"] for r in got] == ["Bob"]

    got = db.query(
        "SELECT name FROM Person4337 WHERE age IN (SELECT age FROM "
        "Person4337 WHERE name = 'Alice' OR name = 'Bob') ORDER BY name"
    ).collect()
    assert [r["name"] for r in got] == ["Alice", "Bob"]

    n = db.query(
        "SELECT count(*) as cnt FROM Person4337 WHERE name IN "
        "(SELECT name FROM AllowedName4337)"
    ).collect()[0]["cnt"]
    assert n == 2

"""MongoDB QL skin tests (mongodbw/MongoDBToSqlTranslator.java parity)."""

from __future__ import annotations

import json

import pytest


def mq(db, doc):
    return db.query(json.dumps(doc), language="mongo")


def test_mongo_find_operators(db):
    rows = mq(db, {
        "collection": "customer",
        "query": {"c_mktsegment": "BUILDING", "c_acctbal": {"$gt": 5000}},
    }).collect()
    assert rows
    assert all(r["c_mktsegment"] == "BUILDING" and r["c_acctbal"] > 5000 for r in rows)
    n_or = mq(db, {
        "collection": "customer",
        "query": {"$or": [{"c_mktsegment": "BUILDING"}, {"c_mktsegment": "MACHINERY"}]},
    }).count()
    n_in = mq(db, {
        "collection": "customer",
        "query": {"c_mktsegment": {"$in": ["BUILDING", "MACHINERY"]}},
    }).count()
    assert n_or == n_in > 0
    nin = mq(db, {
        "collection": "customer",
        "query": {"c_mktsegment": {"$nin": ["BUILDING", "MACHINERY"]}},
    }).count()
    assert nin == 150 - n_in


def test_mongo_sort_skip_limit_projection(db):
    rows = mq(db, {
        "collection": "customer",
        "query": {"$orderby": {"c_acctbal": -1}},
        "projection": {"c_name": 1, "c_acctbal": 1},
        "numberToSkip": 2,
        "numberToReturn": 3,
    }).collect()
    assert len(rows) == 3 and set(rows[0].asDict()) == {"c_name", "c_acctbal"}
    assert rows[0]["c_acctbal"] >= rows[1]["c_acctbal"] >= rows[2]["c_acctbal"]


def test_mongo_not_exists_regex(db):
    n = mq(db, {
        "collection": "customer",
        "query": {"$not": {"c_mktsegment": "BUILDING"}},
    }).count()
    assert n == 150 - mq(db, {"collection": "customer",
                              "query": {"c_mktsegment": "BUILDING"}}).count()
    assert mq(db, {"collection": "customer",
                   "query": {"c_name": {"$exists": True}}}).count() == 150
    rx = mq(db, {"collection": "customer",
                 "query": {"c_name": {"$regex": "Customer#00000001.$"}}}).count()
    assert rx == 10
    with pytest.raises(ValueError):
        mq(db, {"collection": "customer", "query": {"c_name": {"$weird": 1}}}).count()


def test_mongo_aggregate_match_group_sort(db):
    """$match → $group (accumulators) → $sort → $limit chain
    (MongoDBDatabaseWrapper.aggregateCollection:245-266)."""
    rows = mq(db, {
        "aggregate": "customer",
        "pipeline": [
            {"$match": {"c_acctbal": {"$gt": 9000}}},
            {"$group": {"_id": "$c_mktsegment",
                        "n": {"$sum": 1},
                        "mx": {"$max": "$c_acctbal"},
                        "names": {"$push": "$c_name"}}},
            {"$sort": {"_id": 1}},
        ],
    }).collect()
    segs = [r["_id"] for r in rows]
    assert segs == sorted(segs) and len(segs) >= 3
    for r in rows:
        assert r["n"] == len(r["names"]) and r["mx"] > 9000


def test_mongo_aggregate_compound_id_and_null_id(db):
    rows = mq(db, {
        "aggregate": "orders",
        "pipeline": [
            {"$group": {"_id": {"pri": "$o_orderpriority",
                                "st": "$o_orderstatus"},
                        "n": {"$sum": 1}}},
        ],
    }).collect()
    assert all(set(r["_id"].asDict()) == {"pri", "st"} for r in rows)
    total = sum(r["n"] for r in rows)
    # null _id = one global group
    g = mq(db, {
        "aggregate": "orders",
        "pipeline": [{"$group": {"_id": None, "n": {"$sum": 1}}}],
    }).collect()
    assert len(g) == 1 and g[0]["n"] == total and g[0]["_id"] is None


def test_mongo_aggregate_project_addfields_unwind_count(db):
    rows = mq(db, {
        "aggregate": "nation",
        "pipeline": [
            {"$addFields": {"up": {"$toUpper": "$n_name"},
                            "k2": {"$multiply": ["$n_nationkey", 2]}}},
            {"$project": {"up": 1, "k2": 1, "_id": 0}},
            {"$sort": {"k2": 1}},
            {"$limit": 2},
        ],
    }).collect()
    assert [set(r.asDict()) for r in rows] == [{"up", "k2"}] * 2
    assert rows[0]["k2"] == 0 and rows[0]["up"] == rows[0]["up"].upper()
    # $count terminal
    c = mq(db, {
        "aggregate": "region",
        "pipeline": [{"$count": "regions"}],
    }).collect()
    assert c[0]["regions"] == 5
    # $unwind multiplies rows by array length
    u = mq(db, {
        "aggregate": "nation",
        "pipeline": [
            {"$limit": 1},
            {"$addFields": {"tags": {"$literal": [1, 2, 3]}}},
            {"$unwind": "$tags"},
        ],
    }).collect()
    assert len(u) == 3 and sorted(r["tags"] for r in u) == [1, 2, 3]


def test_mongo_aggregate_cond_ifnull_errors(db):
    rows = mq(db, {
        "aggregate": "region",
        "pipeline": [
            {"$addFields": {
                "flag": {"$cond": {"if": {"$lte": ["$r_regionkey", 2]},
                                   "then": "low", "else": "high"}},
                "nn": {"$ifNull": ["$r_name", "?"]}}},
            {"$group": {"_id": "$flag", "n": {"$sum": 1}}},
            {"$sort": {"_id": 1}},
        ],
    }).collect()
    assert [(r["_id"], r["n"]) for r in rows] == [("high", 2), ("low", 3)]
    with pytest.raises(ValueError):
        mq(db, {"aggregate": "region",
                "pipeline": [{"$weird": {}}]}).count()
    with pytest.raises(ValueError):
        mq(db, {"aggregate": "region",
                "pipeline": [{"$changeStream": {}}]}).count()


def test_mongo_aggregate_lookup_and_sortbycount(db):
    """$lookup left-joins matches into an array field; $sortByCount
    groups + orders by frequency."""
    rows = mq(db, {
        "aggregate": "nation",
        "pipeline": [
            {"$match": {"n_nationkey": {"$lt": 3}}},
            {"$lookup": {"from": "region", "localField": "n_regionkey",
                         "foreignField": "r_regionkey", "as": "region"}},
            {"$sort": {"n_nationkey": 1}},
        ],
    }).collect()
    assert len(rows) == 3
    for r in rows:
        assert len(r["region"]) == 1
        assert r["region"][0]["r_regionkey"] == r["n_regionkey"]
    top = mq(db, {
        "aggregate": "customer",
        "pipeline": [{"$sortByCount": "$c_mktsegment"}],
    }).collect()
    assert top[0]["count"] >= top[-1]["count"]
    assert sum(r["count"] for r in top) == 150

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

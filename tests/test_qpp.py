"""GQL quantified path patterns (Cypher-25): relationship quantifiers
``-[:R]->{m,n}`` / ``+`` / ``*`` and parenthesized QPP
``((a)-[:R]->(b)){m,n}``.

Reference: Cypher25Parser.g4:376 (quantifier), :419 (parenthesizedPath);
CypherASTBuilder.java applyQuantifier + absorbParenthesizedPath (Phase A:
single-relationship inner patterns, positive quantifiers, no inner
WHERE).
"""

from __future__ import annotations

import pytest


@pytest.fixture()
def chain_db(spark):
    """a -R-> b -R-> c -R-> d"""
    from arcadedb_spark.database import Database

    db = Database(spark)
    db.query("CREATE (:Q {n:'a'})-[:R]->(:Q {n:'b'})-[:R]->(:Q {n:'c'})"
             "-[:R]->(:Q {n:'d'})", language="cypher").collect()
    return db


def _ns(db, q, **kw):
    return sorted(r[0] for r in db.query(q, language="cypher", **kw).collect())


def test_rel_quantifier_range(chain_db):
    assert _ns(
        chain_db,
        "MATCH (a:Q {n:'a'})-[:R]->{1,3}(b:Q) RETURN b.n AS n",
    ) == ["b", "c", "d"]


def test_rel_quantifier_plus(chain_db):
    assert _ns(
        chain_db, "MATCH (a:Q {n:'a'})-[:R]->+(b:Q) RETURN b.n AS n"
    ) == ["b", "c", "d"]


def test_rel_quantifier_star_includes_zero_hop(chain_db):
    assert _ns(
        chain_db, "MATCH (a:Q {n:'a'})-[:R]->*(b:Q) RETURN b.n AS n"
    ) == ["a", "b", "c", "d"]


def test_rel_quantifier_exact(chain_db):
    assert _ns(
        chain_db, "MATCH (a:Q {n:'a'})-[:R]->{2}(b:Q) RETURN b.n AS n"
    ) == ["c"]


def test_rel_quantifier_open_bounds(chain_db):
    assert _ns(
        chain_db, "MATCH (a:Q {n:'a'})-[:R]->{2,}(b:Q) RETURN b.n AS n"
    ) == ["c", "d"]
    assert _ns(
        chain_db, "MATCH (a:Q {n:'a'})-[:R]->{,2}(b:Q) RETURN b.n AS n"
    ) == ["a", "b", "c"]


def test_parenthesized_qpp_plus(chain_db):
    # every (x, y) pair connected by ≥1 R-hops: 3+2+1 = 6
    rows = chain_db.query(
        "MATCH ((x:Q)-[:R]->(y:Q))+ RETURN count(*) AS c",
        language="cypher",
    ).collect()
    assert rows[0]["c"] == 6


def test_parenthesized_qpp_with_boundaries(chain_db):
    assert _ns(
        chain_db,
        "MATCH (a:Q {n:'a'}) ((x)-[:R]->(y)){1,2} (b:Q) RETURN b.n AS n",
    ) == ["b", "c"]


def test_parenthesized_collapse_to_triplet(chain_db):
    # no quantifier → 1..1 collapse (reference 1..1-collapse rule)
    assert _ns(
        chain_db,
        "MATCH ((x:Q {n:'a'})-[:R]->(y:Q)) RETURN y.n AS n",
    ) == ["b"]


def test_zero_quantifier_rejected(chain_db):
    with pytest.raises(Exception, match="InvalidSyntax"):
        chain_db.query(
            "MATCH ((x)-[:R]->(y)){0,0} (b) RETURN b", language="cypher"
        )


def test_bounds_order_rejected(chain_db):
    with pytest.raises(Exception, match="InvalidSyntax"):
        chain_db.query(
            "MATCH ((x)-[:R]->(y)){3,1} (b) RETURN b", language="cypher"
        )


def test_inner_where_rejected(chain_db):
    with pytest.raises(Exception, match="FeatureNotImplemented"):
        chain_db.query(
            "MATCH ((x)-[:R]->(y) WHERE x.n = 'a')+ RETURN x",
            language="cypher",
        )


def test_multi_rel_inner_rejected(chain_db):
    with pytest.raises(Exception, match="FeatureNotImplemented"):
        chain_db.query(
            "MATCH ((x)-[:R]->(y)-[:R]->(z))+ RETURN x", language="cypher"
        )


def test_star_stays_arithmetic_in_expressions(chain_db):
    rows = chain_db.query(
        "MATCH (a:Q {n:'a'}) RETURN size([(a)-->(b) | b]) * 2 AS s",
        language="cypher",
    ).collect()
    assert rows[0]["s"] == 2


def test_qpp_boundary_keeps_inner_filter(spark):
    """An outer boundary node after a QPP must not drop the inner end
    node's label: var-length + filtered inner end is a typed rejection;
    1..1 conjoins both filters."""
    import pytest

    from arcadedb_spark.database import Database

    db = Database(spark)
    db.query(
        "CREATE (:X {n:'x1'})-[:R]->(:X {n:'x2'})-[:R]->(:Q {n:'q1'})",
        language="cypher",
    ).collect()
    with pytest.raises(Exception, match="FeatureNotImplemented"):
        db.query(
            "MATCH ((x)-[:R]->(y:Q)){1,2} (b) RETURN b.n",
            language="cypher",
        ).collect()
    # 1..1 QPP: filters conjoin — the boundary must be :Q
    rows = db.query(
        "MATCH ((x)-[:R]->(y:Q)) (b) RETURN b.n AS n",
        language="cypher",
    ).collect()
    assert [r["n"] for r in rows] == ["q1"]

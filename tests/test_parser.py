"""Parser unit tests (no Spark needed)."""

from __future__ import annotations

import pytest

from arcadedb_spark.sql import ast
from arcadedb_spark.sql.parser import ParseError, parse


def test_select_minimal():
    s = parse("SELECT FROM customer")
    assert isinstance(s, ast.SelectStmt)
    assert s.target == ast.TypeTarget("customer")
    assert s.projections == ()


def test_select_full_clauses():
    s = parse(
        "SELECT a, b.toUpperCase() AS ub FROM t LET x = a * 2 "
        "WHERE a > 1 AND b LIKE 'x%' GROUP BY a ORDER BY a DESC SKIP 2 LIMIT 5"
    )
    assert s.lets[0].name == "x"
    assert s.group_by and s.order_by[0].ascending is False
    assert isinstance(s.limit, ast.Lit) and s.limit.value == 5
    assert isinstance(s.skip, ast.Lit) and s.skip.value == 2


def test_operator_precedence():
    s = parse("SELECT FROM t WHERE a + b * 2 > 3 OR NOT c = 1 AND d IS NULL")
    # OR at top
    assert isinstance(s.where, ast.Bin) and s.where.op == "OR"
    # right side: AND(NOT(c=1), IsNull(d))
    right = s.where.right
    assert isinstance(right, ast.Bin) and right.op == "AND"


def test_predicates():
    s = parse(
        "SELECT FROM t WHERE a BETWEEN 1 AND 2 AND b IN [1,2,3] "
        "AND c CONTAINSTEXT 'x' AND d MATCHES '^a.*' AND e IS DEFINED"
    )
    kinds = {type(c).__name__ for c in _conjuncts(s.where)}
    assert {"Between", "In", "Contains", "Matches", "IsDefined"} <= kinds


def _conjuncts(e):
    if isinstance(e, ast.Bin) and e.op == "AND":
        return _conjuncts(e.left) + _conjuncts(e.right)
    return [e]


def test_rid_and_params():
    s = parse("SELECT FROM #1:42 WHERE x = :p AND y = ?")
    assert isinstance(s.target, ast.RidTarget)
    assert s.target.rids[0] == ast.RidLit(1, 42)


def test_match():
    s = parse(
        "MATCH {type: Customer, as: c, where: (x > 1)}.out('E'){as: o, optional: true} "
        "RETURN c.name AS n, count(*) AS cnt GROUP BY n LIMIT 3"
    )
    assert isinstance(s, ast.MatchStmt)
    assert s.paths[0].root.type_name == "Customer"
    assert s.paths[0].steps[0].edge_types == ("E",)
    assert s.paths[0].steps[0].filter.optional is True


def test_traverse():
    s = parse("TRAVERSE out('E'), in('F') FROM customer MAXDEPTH 3 LIMIT 10")
    assert isinstance(s, ast.TraverseStmt)
    assert s.max_depth == 3


def test_case_expr():
    s = parse("SELECT CASE WHEN a > 1 THEN 'x' ELSE 'y' END AS c FROM t")
    assert isinstance(s.projections[0].expr, ast.Case)


def test_methods_chain():
    s = parse("SELECT a.b.c, f(x).toLowerCase() FROM t")
    assert s.projections[0].expr == ast.Chain(("a", "b", "c"))
    m = s.projections[1].expr
    assert isinstance(m, ast.Method) and m.name == "toLowerCase"


def test_errors():
    with pytest.raises(ParseError):
        parse("SELEC x FROM t")
    with pytest.raises(ParseError):
        parse("SELECT FROM t WHERE a >")
    with pytest.raises(ParseError):
        parse("SELECT FROM t extra garbage ,")

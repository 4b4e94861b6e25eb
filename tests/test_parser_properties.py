"""Property-based parser robustness tests (hypothesis).

Generates random expressions from a mini-grammar of the dialect and
asserts the parser round-trips them without crashing and the translator
compiles them to Columns.  This is the fuzz layer on top of the
example-based tests — cheap insurance against precedence regressions.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from arcadedb_spark.sql import ast
from arcadedb_spark.sql.parser import parse

_ident = st.sampled_from(["a", "b", "c_name", "x1", "val"])
_number = st.integers(min_value=0, max_value=10_000).map(str)
_string = st.sampled_from(["'x'", "'hello world'", "'%pat%'"])


def _atoms():
    return st.one_of(_ident, _number, _string, st.just("null"), st.just("true"))


@st.composite
def _expr(draw, depth=0):
    if depth > 3:
        return draw(_atoms())
    choice = draw(st.integers(0, 7))
    if choice == 0:
        return draw(_atoms())
    if choice == 1:
        return f"({draw(_expr(depth + 1))} + {draw(_expr(depth + 1))})"
    if choice == 2:
        return f"({draw(_expr(depth + 1))} * {draw(_expr(depth + 1))})"
    if choice == 3:
        return f"({draw(_expr(depth + 1))} > {draw(_expr(depth + 1))})"
    if choice == 4:
        return f"({draw(_expr(depth + 1))} AND {draw(_expr(depth + 1))})"
    if choice == 5:
        return f"coalesce({draw(_expr(depth + 1))}, {draw(_expr(depth + 1))})"
    if choice == 6:
        return f"NOT {draw(_expr(depth + 1))}"
    return f"abs({draw(_expr(depth + 1))})"


@given(_expr())
@settings(max_examples=200, deadline=None)
def test_random_expressions_parse(expr):
    stmt = parse(f"SELECT {expr} AS out FROM t")
    assert isinstance(stmt, ast.SelectStmt)
    assert stmt.projections[0].alias == "out"


@given(
    st.lists(_ident, min_size=1, max_size=3, unique=True),
    st.integers(1, 100),
    st.booleans(),
)
@settings(max_examples=50, deadline=None)
def test_random_clause_combinations(cols, lim, desc):
    proj = ", ".join(cols)
    order = f"ORDER BY {cols[0]} {'DESC' if desc else 'ASC'}"
    stmt = parse(f"SELECT {proj} FROM t WHERE {cols[0]} > 1 {order} LIMIT {lim}")
    assert len(stmt.projections) == len(cols)
    assert stmt.limit == ast.Lit(lim)
    assert stmt.order_by[0].ascending is (not desc)

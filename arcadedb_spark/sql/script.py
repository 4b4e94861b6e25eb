"""SQL-script language: multi-statement scripts with driver-side control
flow.

Reference: query/sql/SQLScriptQueryEngine.java + executor steps
(IfStep.java:30, ForEachStep.java:35, BreakStep.java:27, RetryStep.java:33,
ScriptExecutionPlan.java:40).  Control flow runs on the driver — the same
place the reference runs it (single-threaded script executor) — while each
embedded statement is a full distributed DataFrame program.

Supported: ``LET $x = <statement or expression>``, ``IF (<cond>) { … }``,
``WHILE (<cond>) { … }``, ``FOREACH ($i IN <expr>) { … }``, ``BREAK``,
``RETURN <expr|statement>``, ``BEGIN/COMMIT/ROLLBACK`` (accepted no-ops —
transactions are out of scope for an analytical engine), ``sleep(ms)``,
``console.log(expr)``; any other statement is dispatched to
``Database.command``.

Conditions and scalar expressions over ``$vars`` are evaluated driver-side
by a small interpreter (`_eval`): result-set variables support ``.size()``
and indexing, row values support field access.

Driver-side semantics: ``FOREACH`` over a result set and ``$var[i]``
indexing materialize rows on the driver — by design (per-row control flow
is a driver concept, as in the reference's script executor), but bounded:
both refuse result sets above ``FOREACH_ROW_CAP`` (default 100k) rows with
a loud error instead of silently OOMing the driver.  Set-oriented
transformations belong in a single distributed statement, not a FOREACH.
"""

from __future__ import annotations

import time
from typing import Any

from pyspark.sql import DataFrame

from arcadedb_spark.sql import ast
from arcadedb_spark.sql.lexer import tokenize
from arcadedb_spark.sql.parser import ParseError, Parser


FOREACH_ROW_CAP = 100_000


def _bounded_collect(df: DataFrame, what: str) -> list:
    """Driver-side materialization with a loud cap (never unbounded)."""
    rows = df.limit(FOREACH_ROW_CAP + 1).collect()
    if len(rows) > FOREACH_ROW_CAP:
        raise ParseError(
            f"{what} would materialize more than {FOREACH_ROW_CAP} rows on "
            "the driver; rewrite as a single distributed statement"
        )
    return rows


class _Break(Exception):
    pass


class _Return(Exception):
    def __init__(self, value):
        self.value = value


def _split_statements(text: str) -> list[str]:
    """Split on ';' at depth 0 (outside strings/parens/braces)."""
    out: list[str] = []
    depth = 0
    cur: list[str] = []
    i = 0
    n = len(text)
    while i < n:
        c = text[i]
        if c in "'\"":
            quote = c
            cur.append(c)
            i += 1
            while i < n:
                cur.append(text[i])
                if text[i] == quote and (i == 0 or text[i - 1] != "\\"):
                    break
                i += 1
        elif c in "([{":
            depth += 1
            cur.append(c)
        elif c in ")]}":
            depth -= 1
            cur.append(c)
        elif c == ";" and depth == 0:
            s = "".join(cur).strip()
            if s:
                out.append(s)
            cur = []
        else:
            cur.append(c)
        i += 1
    s = "".join(cur).strip()
    if s:
        out.append(s)
    return out


class ScriptEngine:
    def __init__(self, db) -> None:
        self.db = db
        self.vars: dict[str, Any] = {}

    # -- public ------------------------------------------------------------
    def execute(self, text: str, params: dict | None = None) -> Any:
        self.params = params or {}
        try:
            self._run_block(text)
        except _Return as r:
            return r.value
        return None

    # -- block runner --------------------------------------------------------
    def _run_block(self, text: str) -> None:
        i = 0
        stmts = _split_statements(text)
        while i < len(stmts):
            stmt = stmts[i]
            upper = stmt.lstrip().upper()
            if upper.startswith(("IF", "WHILE", "FOREACH", "RETRY")):
                # blocks may span ';'-split pieces — reassemble until braces
                # balance
                joined = stmt
                while joined.count("{") > joined.count("}") and i + 1 < len(stmts):
                    i += 1
                    joined += "; " + stmts[i]
                self._run_control(joined)
            else:
                self._run_statement(stmt)
            i += 1

    def _run_statement(self, stmt: str) -> None:
        upper = stmt.lstrip().upper()
        if upper in ("BEGIN", "COMMIT", "ROLLBACK"):
            return  # no transactions on an analytical engine (documented)
        if upper == "BREAK":
            raise _Break()
        if upper.startswith("RETURN"):
            raise _Return(self._eval_fragment(stmt[len("RETURN"):].strip()))
        if upper.startswith("SLEEP"):
            ms = self._eval_fragment(stmt[len("SLEEP"):].strip().strip("()"))
            time.sleep(float(ms) / 1000.0)
            return
        if upper.startswith("CONSOLE"):
            expr = stmt.split(" ", 1)[1] if " " in stmt else ""
            print(self._eval_fragment(expr))
            return
        if upper.startswith("LET"):
            body = stmt[len("LET"):].strip()
            name, rhs = body.split("=", 1)
            name = name.strip().lstrip("$").strip()
            self.vars[name] = self._eval_fragment(rhs.strip())
            return
        # plain statement → engine
        self.db.command(stmt, **{**self.params, **self._scalar_vars()})

    def _scalar_vars(self) -> dict:
        return {
            k: v
            for k, v in self.vars.items()
            if isinstance(v, (int, float, str, bool)) or v is None
        }

    # -- control flow --------------------------------------------------------
    def _run_control(self, stmt: str) -> None:
        head, body = stmt.split("{", 1)
        body = body.rsplit("}", 1)[0]
        head = head.strip()
        upper = head.upper()
        if upper.startswith("RETRY"):
            # RETRY n { … } — re-run the block on failure up to n times
            # (RetryStep.java:33; the reference retries on tx conflicts,
            # here on any error since writes are table rewrites)
            attempts = int(self._eval_fragment(head[len("RETRY"):].strip()) or 1)
            last: Exception | None = None
            for _ in range(max(1, attempts)):
                try:
                    self._run_block(body)
                    return
                except (_Break, _Return):
                    raise
                except Exception as ex:  # noqa: BLE001 — surfaced after retries
                    last = ex
            raise last
        if upper.startswith("IF"):
            cond = head[2:].strip()
            if self._truthy(self._eval_fragment(cond)):
                self._run_block(body)
            return
        if upper.startswith("WHILE"):
            cond = head[5:].strip()
            guard = 10_000
            try:
                while self._truthy(self._eval_fragment(cond)):
                    self._run_block(body)
                    guard -= 1
                    if guard <= 0:
                        raise RuntimeError("WHILE exceeded 10000 iterations")
            except _Break:
                pass
            return
        if upper.startswith("FOREACH"):
            inner = head[len("FOREACH"):].strip().strip("()")
            var, coll = inner.split(" IN ", 1) if " IN " in inner else inner.split(" in ", 1)
            var = var.strip().lstrip("$")
            values = self._eval_fragment(coll.strip())
            if isinstance(values, DataFrame):
                values = [row.asDict() for row in _bounded_collect(values, "FOREACH")]
            try:
                for v in values:
                    self.vars[var] = v
                    self._run_block(body)
            except _Break:
                pass
            return
        raise ParseError(f"Unknown control statement: {head}")

    # -- expression evaluation ----------------------------------------------
    def _eval_fragment(self, fragment: str) -> Any:
        fragment = fragment.strip()
        if not fragment:
            return None
        if fragment.startswith("(") and fragment.endswith(")"):
            inner = fragment[1:-1].strip()
            if inner.upper().startswith(("SELECT", "MATCH", "TRAVERSE")):
                return self.db.query(inner, **{**self.params, **self._scalar_vars()})
            fragment = inner
        if fragment.upper().startswith(("SELECT", "MATCH", "TRAVERSE", "INSERT",
                                        "UPDATE", "DELETE", "CREATE", "DROP")):
            return self.db.command(fragment, **{**self.params, **self._scalar_vars()})
        p = Parser(fragment)
        expr = p.parse_expr()
        if p.cur.kind != "EOF":
            raise ParseError(f"Trailing input in script expression: {fragment!r}")
        return self._eval(expr)

    def _truthy(self, v: Any) -> bool:
        if isinstance(v, DataFrame):
            return v.limit(1).count() > 0
        return bool(v)

    def _eval(self, e: ast.Expr) -> Any:
        if isinstance(e, ast.Lit):
            return e.value
        if isinstance(e, ast.Var):
            return self.vars.get(e.name)
        if isinstance(e, ast.Param):
            return self.params.get(e.name)
        if isinstance(e, ast.ArrayLit):
            return [self._eval(i) for i in e.items]
        if isinstance(e, ast.Chain):
            # field access into a FOREACH row dict
            v: Any = self.vars.get(e.parts[0])
            for part in e.parts[1:]:
                if isinstance(v, dict):
                    v = v.get(part)
                else:
                    v = getattr(v, part, None)
            return v
        if isinstance(e, ast.Unary):
            v = self._eval(e.operand)
            return {"-": lambda: -v, "+": lambda: v, "NOT": lambda: not v}[e.op]()
        if isinstance(e, ast.Bin):
            le = self._eval(e.left)
            if e.op == "AND":
                return self._truthy(le) and self._truthy(self._eval(e.right))
            if e.op == "OR":
                return self._truthy(le) or self._truthy(self._eval(e.right))
            r = self._eval(e.right)
            ops = {
                "=": lambda: le == r, "!=": lambda: le != r,
                "<": lambda: le < r, "<=": lambda: le <= r,
                ">": lambda: le > r, ">=": lambda: le >= r,
                "+": lambda: le + r, "-": lambda: le - r,
                "*": lambda: le * r, "/": lambda: le / r,
                "%": lambda: le % r,
                "??": lambda: le if le is not None else r,
                "||": lambda: (le or []) + (r or []),
            }
            return ops[e.op]()
        if isinstance(e, ast.Method):
            base = self._eval(e.base)
            name = e.name.lower()
            if name == "size":
                if isinstance(base, DataFrame):
                    return base.count()
                return len(base) if base is not None else 0
            if name == "isempty":
                return not self._truthy(base)
            raise ParseError(f"Unsupported script method .{e.name}()")
        if isinstance(e, ast.Index):
            base = self._eval(e.base)
            idx = self._eval(e.index)
            if isinstance(base, DataFrame):
                rows = _bounded_collect(base, "result-set indexing")
                return rows[idx].asDict() if isinstance(idx, int) else None
            return base[idx]
        if isinstance(e, ast.Subquery):
            from arcadedb_spark.sql.translator import Translator

            return Translator(self.db, self.params).translate(e.stmt)
        raise ParseError(f"Unsupported script expression {type(e).__name__}")


def run_script(db, text: str, params: dict | None = None) -> Any:
    """Execute a SQL script; returns the RETURN value (DataFrame or scalar)."""
    return ScriptEngine(db).execute(text, params)

"""Minimal Gherkin runner for the openCypher TCK corpus the reference
ships (engine/src/test/resources/opencypher/tck/features/; reference
runner OpenCypherTCKSuite.java).

Parses .feature files, executes each scenario verbatim against a fresh
empty Database, and compares the result table.  Scenarios using TCK
features out of scope here (expected errors, parameters, node/rel/path
values in expected cells, Scenario Outlines) are reported as SKIP, not
silently dropped — test_cypher_tck pins the set that must PASS.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

TCK_ROOT = "/root/reference/engine/src/test/resources/opencypher/tck/features"

# Named fixture graphs ("Given the <name> graph" — reference
# TCKStepDefinitions.java:105,127)
_BT = """
CREATE (a:A {{name: 'a'}}), (b1:X {{name: 'b1'}}), (b2:X {{name: 'b2'}}),
       (b3:X {{name: 'b3'}}), (b4:X {{name: 'b4'}}),
       (c11:X {{name: 'c11'}}), (c12:{c1} {{name: 'c12'}}),
       (c21:X {{name: 'c21'}}), (c22:{c1} {{name: 'c22'}}),
       (c31:X {{name: 'c31'}}), (c32:{c1} {{name: 'c32'}}),
       (c41:X {{name: 'c41'}}), (c42:{c1} {{name: 'c42'}})
CREATE (a)-[:KNOWS]->(b1), (a)-[:KNOWS]->(b2),
       (a)-[:FOLLOWS]->(b3), (a)-[:FOLLOWS]->(b4)
CREATE (b1)-[:FRIEND]->(c11), (b1)-[:FRIEND]->(c12),
       (b2)-[:FRIEND]->(c21), (b2)-[:FRIEND]->(c22),
       (b3)-[:FRIEND]->(c31), (b3)-[:FRIEND]->(c32),
       (b4)-[:FRIEND]->(c41), (b4)-[:FRIEND]->(c42)
CREATE (b1)-[:FRIEND]->(b2), (b2)-[:FRIEND]->(b3),
       (b3)-[:FRIEND]->(b4), (b4)-[:FRIEND]->(b1)
"""
NAMED_GRAPHS = {
    "binary-tree-1": _BT.format(c1="X"),
    "binary-tree-2": _BT.format(c1="Y"),
}


@dataclass
class Scenario:
    feature: str
    name: str
    setup: list = field(default_factory=list)  # Cypher setup statements
    query: str = ""
    expect: list | None = None  # list of dict rows, or None for "empty"
    ordered: bool = False
    lists_unordered: bool = False  # "(ignoring element order for lists)"
    skip: str | None = None  # reason this scenario is out of scope
    expect_error: bool = False  # "Then a XError should be raised …"
    error_class: str | None = None  # TCK error class (SyntaxError/…)
    params: dict = field(default_factory=dict)  # "And parameters are:"
    procedures: list = field(default_factory=list)  # fixture procedures


def _parse_docstring(lines, i):
    # lines[i] is the opening """ line
    out = []
    i += 1
    while i < len(lines) and lines[i].strip() != '"""':
        out.append(lines[i])
        i += 1
    return "\n".join(out).strip(), i + 1


def _split_table_row(line: str) -> list[str]:
    """Split a gherkin table row on unescaped pipes; backslash escapes the
    pipe and itself (``\\|`` → ``|``, ``\\\\`` → ``\\``)."""
    cells: list[str] = []
    cur: list[str] = []
    i = 0
    while i < len(line):
        c = line[i]
        if c == "\\" and i + 1 < len(line) and line[i + 1] in ("|", "\\"):
            cur.append(line[i + 1])
            i += 2
            continue
        if c == "|":
            cells.append("".join(cur).strip())
            cur = []
            i += 1
            continue
        cur.append(c)
        i += 1
    cells.append("".join(cur).strip())
    return [c for c in cells]


def _parse_table(lines, i):
    rows = []
    while i < len(lines) and lines[i].strip().startswith("|"):
        raw = lines[i].strip()
        cells = _split_table_row(raw[1:-1] if raw.endswith("|") else raw[1:])
        rows.append(cells)
        i += 1
    return rows, i


_NODE_CELL = re.compile(
    r"^\((?P<labels>(?:\s*:[A-Za-z_][A-Za-z0-9_]*)*)\s*(?P<props>\{.*\})?\s*\)$"
)
_REL_CELL = re.compile(
    r"^\[\s*:(?P<type>[A-Za-z_][A-Za-z0-9_]*)\s*(?P<props>\{.*\})?\s*\]$"
)


def parse_value(s: str):
    """Parse one expected-table cell into a Python value.

    Node / relationship cells parse into canonical ("§node", labels,
    props) / ("§rel", type, props) tuples matched against the engine's
    entity structs by canon_entity().  Raises ValueError for TCK value
    syntax still out of scope (paths) so the scenario skips loudly."""
    s = s.strip()
    if s == "null":
        return None
    if s == "true":
        return True
    if s == "false":
        return False
    if s == "NaN":
        return float("nan")
    if re.fullmatch(r"-?\d+", s):
        return int(s)
    if re.fullmatch(r"-?\d+\.\d+([eE][+-]?\d+)?|-?\d+[eE][+-]?\d+", s):
        return float(s)
    if s.startswith("'") and s.endswith("'"):
        # expected cells hold Cypher string literals: same escapes as the
        # engine's lexer (\\, \', \uXXXX, …)
        from arcadedb_spark.sql.lexer import _unquote

        return _unquote(s)
    if s.startswith("[") and s.endswith("]"):
        m = _REL_CELL.match(s)
        if m:  # relationship cell [:T {…}] — before the list branch
            props = parse_value(m.group("props")) if m.group("props") else {}
            return ("§rel", m.group("type"), _canon_props(props))
        inner = s[1:-1].strip()
        if not inner:
            return []
        return [parse_value(p) for p in _split_top(inner)]
    m = _NODE_CELL.match(s)
    if m:
        labels = frozenset(
            p.strip() for p in m.group("labels").split(":") if p.strip()
        )
        props = parse_value(m.group("props")) if m.group("props") else {}
        return ("§node", labels, _canon_props(props))
    m = _REL_CELL.match(s)
    if m:
        props = parse_value(m.group("props")) if m.group("props") else {}
        return ("§rel", m.group("type"), _canon_props(props))
    if s.startswith("{") and s.endswith("}"):
        inner = s[1:-1].strip()
        if not inner:
            return {}
        out = {}
        for part in _split_top(inner):
            k, v = part.split(":", 1)
            out[k.strip()] = parse_value(v)
        return out
    if s.startswith("<") and s.endswith(">"):
        return _parse_path_cell(s[1:-1].strip())
    raise ValueError(f"unparseable TCK value: {s!r}")


_PATH_REL_RE = re.compile(r"\s*(?P<l><-|-)\[(?P<body>[^\]]*)\](?P<r>->|-)\s*")


def _parse_path_cell(s: str):
    """``({num: 1})-[:R]->({num: 2})`` → ("§path", (node, (dir, rel),
    node, …)) matching the engine's enriched path structs."""

    def read_node(i: int) -> tuple[str, int]:
        depth = 0
        start = i
        while i < len(s):
            if s[i] == "(":
                depth += 1
            elif s[i] == ")":
                depth -= 1
                if depth == 0:
                    return s[start:i + 1], i + 1
            i += 1
        raise ValueError(f"unterminated node in path cell: {s!r}")

    items: list = []
    node, i = read_node(0)
    items.append(parse_value(node))
    while i < len(s):
        m = _PATH_REL_RE.match(s, i)
        if not m:
            raise ValueError(f"bad relationship in path cell: {s[i:]!r}")
        direction = "in" if m.group("l") == "<-" else "out"
        rel = parse_value("[" + m.group("body").strip() + "]")
        items.append((direction, rel))
        node, i = read_node(m.end())
        items.append(parse_value(node))
    return ("§path", tuple(items))


def _canon_props(d: dict) -> tuple:
    return tuple(sorted((k, _norm(v)) for k, v in d.items()))


def canon_entity(v):
    """Map an engine entity struct (node: {@type, vid, props…};
    relationship: {etype, src, dst, props…}) to the same canonical tuple
    parse_value produces for expected cells.  Null-valued props are
    dropped: Cypher cannot store null properties, so nulls here are
    schema-union padding from heterogeneous vertex frames."""
    if not isinstance(v, dict):
        return None
    if "vid" in v and "@type" in v:
        # "_" is the engine's internal bucket for unlabeled nodes
        # (graph/cypher.py) — TCK sees an empty label set
        labels = frozenset(
            p for p in (v.get("@type") or "").split(":") if p and p != "_"
        )
        props = {
            k: x for k, x in v.items()
            if k not in ("vid", "@type") and x is not None
        }
        return ("§node", labels, _canon_props(props))
    if "etype" in v and "src" in v and "dst" in v:
        props = {
            k: x for k, x in v.items()
            if k not in ("etype", "src", "dst", "__dir")
            and not k.startswith("@") and x is not None
        }
        return ("§rel", v["etype"], _canon_props(props))
    if "vids" in v and "n_rels" in v and "nodes" in v and "rels" in v:
        # enriched path struct → alternating node / (dir, rel) items,
        # mirroring _parse_path_cell's canonical form
        items: list = []
        nodes = v.get("nodes") or []
        rels = v.get("rels") or []
        for i, nd in enumerate(nodes):
            items.append(canon_entity(nd) if isinstance(nd, dict) else None)
            if i < len(rels) and isinstance(rels[i], dict):
                items.append(
                    (rels[i].get("__dir", "out"), canon_entity(rels[i]))
                )
        return ("§path", tuple(items))
    return None


_PROC_SIG_RE = re.compile(
    r"And there exists a procedure\s+(?P<name>[\w.]+)\s*"
    r"\((?P<ins>[^)]*)\)\s*::\s*\((?P<outs>[^)]*)\)\s*:?\s*$"
)


def _sig_cols(spec: str) -> list[tuple[str, str]]:
    cols = []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        name, _, typ = part.partition("::")
        cols.append((name.strip(), typ.strip()))
    return cols


def _parse_procedure(m, table) -> dict:
    ins = _sig_cols(m.group("ins"))
    outs = _sig_cols(m.group("outs"))
    rows = []
    if table and any(c for c in table[0]):
        header, *vals = table
        for r in vals:
            rows.append({h: parse_value(c) for h, c in zip(header, r)})
    return {"name": m.group("name"), "in": ins, "out": outs, "rows": rows}


def _split_top(s: str) -> list[str]:
    """Split on commas at nesting depth 0 (respects [], {}, quotes)."""
    parts, depth, cur, inq = [], 0, [], False
    for ch in s:
        if ch == "'" and (not cur or cur[-1] != "\\"):
            inq = not inq
        if not inq:
            if ch in "[{(":
                depth += 1
            elif ch in "]})":
                depth -= 1
            elif ch == "," and depth == 0:
                parts.append("".join(cur).strip())
                cur = []
                continue
        cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return parts


def _split_blocks(lines: list[str]) -> list[tuple[str, str, list[str]]]:
    """[(kind, name, body-lines)] for each Scenario / Scenario Outline.
    A ``Background:`` block's steps are prepended to every scenario in
    the feature (standard Gherkin semantics)."""
    blocks = []
    background: list[str] = []
    cur = None
    in_background = False
    for line in lines:
        s = line.strip()
        if s.startswith("Background:"):
            in_background = True
            cur = None
        elif s.startswith("Scenario Outline:"):
            in_background = False
            cur = ("outline", s.split(":", 1)[1].strip(), list(background))
            blocks.append(cur)
        elif s.startswith("Scenario:"):
            in_background = False
            cur = ("scenario", s.split(":", 1)[1].strip(), list(background))
            blocks.append(cur)
        elif in_background:
            background.append(line)
        elif cur is not None:
            cur[2].append(line)
    return blocks


def _expand_outline(name: str, body: list[str]):
    """Expand a Scenario Outline's Examples table into concrete scenarios
    by <placeholder> substitution — the standard Gherkin expansion."""
    try:
        ei = next(
            i for i, l in enumerate(body) if l.strip().startswith("Examples:")
        )
    except StopIteration:
        return
    steps, table = body[:ei], body[ei + 1:]
    rows = [
        [c.strip() for c in l.strip().strip("|").split("|")]
        for l in table
        if l.strip().startswith("|")
    ]
    if len(rows) < 2:
        return
    header = rows[0]
    for j, row in enumerate(rows[1:]):
        sub = dict(zip(header, row))
        out = []
        for l in steps:
            for k, v in sub.items():
                l = l.replace(f"<{k}>", v)
            out.append(l)
        yield f"{name} #{j + 1}", out


def parse_feature(path: str) -> list[Scenario]:
    with open(path) as f:
        all_lines = f.read().splitlines()
    scenarios: list[Scenario] = []
    feature = path.rsplit("/", 1)[-1].removesuffix(".feature")
    for kind, name, body in _split_blocks(all_lines):
        if kind == "outline":
            expanded = list(_expand_outline(name, body))
            if not expanded:
                sc = Scenario(feature, name)
                sc.skip = "Scenario Outline without Examples"
                scenarios.append(sc)
            for ex_name, ex_body in expanded:
                scenarios.append(_parse_scenario(feature, ex_name, ex_body))
        else:
            scenarios.append(_parse_scenario(feature, name, body))
    return scenarios


def _parse_scenario(feature: str, name: str, lines: list[str]) -> Scenario:
    cur = Scenario(feature, name)
    i = 0
    while i < len(lines):
        line = lines[i].strip()
        if line.startswith(("Given an empty graph", "Given any graph")):
            i += 1
        elif line.startswith("Given the ") and line.rstrip().endswith(" graph"):
            # named fixture graph (reference TCKStepDefinitions.java @Given)
            gname = line[len("Given the "):].rstrip()[:-len(" graph")].strip()
            fixture = NAMED_GRAPHS.get(gname)
            if fixture is None:
                cur.skip = cur.skip or f"unknown named graph: {gname}"
            else:
                cur.setup.append(fixture)
            i += 1
        elif line.startswith("Given"):
            cur.skip = cur.skip or f"unsupported Given: {line}"
            i += 1
        elif line.startswith(("And having executed", "When having executed")):
            text, i = _parse_docstring(lines, i + 1)
            cur.setup.append(text)
        elif line.startswith("And there exists a procedure"):
            m = _PROC_SIG_RE.match(line)
            if not m:
                cur.skip = cur.skip or f"unparseable procedure fixture: {line}"
                i += 1
                continue
            table, i = _parse_table(lines, i + 1)
            try:
                cur.procedures.append(_parse_procedure(m, table))
            except ValueError as e:
                cur.skip = cur.skip or f"procedure fixture: {e}"
        elif line.startswith("And parameters are") or line.startswith("Given parameters"):
            table, i = _parse_table(lines, i + 1)
            try:
                for row in table:
                    if len(row) == 2:
                        cur.params[row[0]] = parse_value(row[1])
                    else:
                        raise ValueError(f"parameter row arity: {row}")
            except ValueError as e:
                cur.skip = cur.skip or f"unsupported parameter value: {e}"
        elif line.startswith("When executing query") or line.startswith(
            "When executing control query"
        ):
            text, i = _parse_docstring(lines, i + 1)
            if cur.query:
                # several executed queries per scenario (write, then a
                # control query verifying it): earlier ones are setup
                cur.setup.append(cur.query)
            cur.query = text
        elif line.startswith("Then the result should be empty"):
            cur.expect = []
            i += 1
        elif line.startswith("Then the result should be, in order"):
            cur.ordered = True
            if "ignoring element order for lists" in line:
                cur.lists_unordered = True
            table, i = _parse_table(lines, i + 1)
            cur.expect = table
        elif line.startswith("Then the result should be"):
            if "ignoring element order for lists" in line:
                cur.lists_unordered = True
            table, i = _parse_table(lines, i + 1)
            cur.expect = table
        elif re.match(r"Then an? \w+ should be raised", line):
            # error-category conformance: the raised exception must map
            # to the TCK error class (SyntaxError/TypeError/…) via
            # _error_class_matches — the reference asserts the same
            # taxonomy (TCKResultMatcher.java); the finer detail code
            # (e.g. UndefinedVariable) is recorded but not asserted.
            cur.expect_error = True
            m = re.match(r"Then an? (\w+) should be raised", line)
            cur.error_class = m.group(1)
            i += 1
        elif line.startswith("And the side effects should be") or line.startswith(
            "Then the side effects"
        ):
            # side-effect accounting table: skip its rows
            i += 1
            while i < len(lines) and lines[i].strip().startswith("|"):
                i += 1
        else:
            i += 1
    return cur


def _to_py(v):
    """pyspark Row → plain dict, recursively (lists/maps included)."""
    try:
        from pyspark.sql import Row
    except Exception:  # pragma: no cover
        Row = ()
    if isinstance(v, Row):
        return {k: _to_py(x) for k, x in v.asDict().items()}
    if isinstance(v, list):
        return [_to_py(x) for x in v]
    if isinstance(v, dict):
        return {k: _to_py(x) for k, x in v.items()}
    return v


def _norm(v):
    """Normalize a result value for comparison."""
    try:
        from pyspark.sql.types import VariantVal
        if isinstance(v, VariantVal):
            # heterogeneous property carried as VARIANT: compare the
            # underlying typed value
            return _norm(v.toPython())
    except ImportError:
        pass
    import decimal

    if isinstance(v, decimal.Decimal):
        # variant decimals (heterogeneous-list floats) — Cypher has no
        # decimal type, compare as float
        return round(float(v), 9)
    if isinstance(v, float):
        if v != v:
            return "§nan"  # NaN compares equal to itself in results
        return round(v, 9) + 0.0  # −0.0 → 0.0
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        ent = canon_entity(v)
        if ent is not None:
            return ent
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def _error_class_matches(klass: "str | None", e: Exception) -> bool:
    """Map a raised exception onto the TCK error taxonomy (reference
    TCKResultMatcher.java asserts the same classes).

    Posture: engine-raised diagnoses (ParseError/LexError/TranslateError
    and its tagged subclasses) and typed Spark analysis/runtime errors
    count for the class they plausibly represent; RAW python crashes
    (KeyError/AttributeError/TypeError/…) never count — a crash is not a
    diagnosis.  The finer TCK detail code (e.g. UndefinedVariable) is
    carried in our messages but not asserted."""
    from arcadedb_spark.sql.lexer import LexError
    from arcadedb_spark.sql.parser import ParseError
    from arcadedb_spark.sql.translator import (
        ParameterMissing, ProcedureError, TranslateError,
    )

    name = type(e).__name__
    msg = str(e)
    ours = isinstance(e, (ParseError, LexError, TranslateError))
    # typed JVM-side rejections (analysis or runtime kernels we emit)
    sparkish = name in (
        "AnalysisException", "SparkRuntimeException",
        "NumberFormatException", "SparkArithmeticException",
        "ArithmeticException", "IllegalArgumentException",
        "SparkNumberFormatException", "DateTimeException",
    )
    if not klass:
        return ours or sparkish
    if klass == "SyntaxError":
        return (
            ours and not isinstance(e, (ProcedureError, ParameterMissing))
        ) or sparkish
    if klass == "TypeError":
        return (
            ours and not isinstance(e, (ParseError, LexError))
        ) or sparkish
    if klass == "ArgumentError":
        return ours or sparkish or (
            isinstance(e, ValueError) and "NumberOutOfRange" in msg
        )
    if klass == "SemanticError":
        return ours
    if klass == "ConstraintVerificationFailed":
        return ours and (
            "relationship" in msg.lower() or "Constraint" in msg
        )
    if klass == "EntityNotFound":
        return "EntityNotFound" in msg or "deleted entity" in msg
    if klass == "ParameterMissing":
        return isinstance(e, ParameterMissing) or (
            ours and "parameter" in msg.lower()
        )
    if klass == "ProcedureError":
        return isinstance(e, ProcedureError) or (
            ours and "procedure" in msg.lower()
        )
    # unknown class in a future TCK drop: any engine diagnosis passes
    return ours or sparkish


def run_scenario(spark, sc: Scenario) -> tuple[bool, str]:
    """Execute one scenario on a fresh empty Database.

    Returns (passed, detail)."""
    from arcadedb_spark.database import Database

    if sc.skip:
        return False, f"SKIP: {sc.skip}"
    if sc.expect_error:
        if not sc.query:
            return False, "SKIP: no query parsed"
        db = Database(spark)
        for pr in sc.procedures:
            db.register_table_procedure(pr["name"], pr["in"], pr["out"], pr["rows"])
        try:
            for stmt in sc.setup:
                db.query(stmt, language="cypher", **sc.params)
        except Exception as e:  # noqa: BLE001
            return False, f"SKIP: setup failed: {type(e).__name__}"
        try:
            db.query(sc.query, language="cypher", **sc.params).collect()
        except Exception as e:  # noqa: BLE001 — the expected outcome
            if _error_class_matches(sc.error_class, e):
                return True, ""
            return False, (
                f"FAIL: expected {sc.error_class}, got "
                f"{type(e).__name__}: {str(e)[:120]}"
            )
        return False, "FAIL: expected an error, statement succeeded"
    if not sc.query or sc.expect is None:
        return False, "SKIP: no query/expectation parsed"
    try:
        header, *rows = sc.expect if sc.expect else ([],)
        expected = [
            {h: parse_value(c) for h, c in zip(header, r)} for r in rows
        ] if sc.expect else []
    except ValueError as e:
        return False, f"SKIP: {e}"
    db = Database(spark)
    for pr in sc.procedures:
        db.register_table_procedure(pr["name"], pr["in"], pr["out"], pr["rows"])
    try:
        for stmt in sc.setup:
            db.query(stmt, language="cypher", **sc.params)
        res = db.query(sc.query, language="cypher", **sc.params)
        got_rows = res.collect()
    except Exception as e:  # noqa: BLE001 — scenario verdict, not control flow
        return False, f"FAIL: {type(e).__name__}: {e}"
    if sc.expect == []:
        return (not got_rows), f"expected empty, got {len(got_rows)} rows"
    if set(res.columns) != set(header):
        return False, f"FAIL: columns {res.columns} != {header}"
    got = [{h: _norm(_to_py(r[h])) for h in header} for r in got_rows]
    want = [{h: _norm(row[h]) for h in header} for row in expected]
    if sc.lists_unordered:
        def _sl(v):
            if isinstance(v, tuple):
                return tuple(sorted((_sl(x) for x in v), key=repr))
            return v
        got = [{h: _sl(v) for h, v in r.items()} for r in got]
        want = [{h: _sl(v) for h, v in r.items()} for r in want]
    if sc.ordered:
        ok = got == want
    else:
        key = lambda d: repr(sorted(d.items(), key=lambda kv: (kv[0], repr(kv[1]))))
        ok = sorted(got, key=key) == sorted(want, key=key)
    return ok, "" if ok else f"FAIL: got {got[:4]}... want {want[:4]}..."

"""AST node definitions for the ArcadeDB-SQL dialect.

Unlike the reference (one Java class per parser production,
engine/src/main/java/com/arcadedb/query/sql/parser/*.java), we use a small
set of dataclasses and treat boolean conditions as ordinary expressions —
Spark ``Column``s unify scalar and boolean expressions, so the translator
needs no separate condition hierarchy.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Union


class Expr:
    """Base class for expressions."""

    __slots__ = ()


@dataclass(frozen=True)
class Lit(Expr):
    value: Any  # python literal; None == SQL NULL


@dataclass(frozen=True)
class LongLit(Expr):
    """Integer literal with a Java long suffix (1000000000L) — compiles
    to a 64-bit column so arithmetic does not overflow at int width."""

    value: int


@dataclass(frozen=True)
class Star(Expr):
    pass


@dataclass(frozen=True)
class Chain(Expr):
    """Dot-separated identifier chain: ``a`` or ``a.b.c``.

    A chain longer than one element is either nested-struct access or a
    LINK dereference (parser/BaseExpression dot navigation); the translator
    decides per the catalog's declared links.
    """

    parts: tuple[str, ...]


@dataclass(frozen=True)
class Var(Expr):
    """``$name`` — LET variable or context variable ($parent, $current)."""

    name: str


@dataclass(frozen=True)
class Param(Expr):
    """Input parameter ``:name`` / ``?`` / ``$1``."""

    name: str  # positional params get "0", "1", ...


@dataclass(frozen=True)
class RidLit(Expr):
    bucket: int
    position: int


@dataclass(frozen=True)
class FuncCall(Expr):
    name: str
    args: tuple[Expr, ...]
    distinct: bool = False


@dataclass(frozen=True)
class Method(Expr):
    """Postfix method: ``expr.name(args)`` (query/sql/method/**)."""

    base: Expr
    name: str
    args: tuple[Expr, ...]


@dataclass(frozen=True)
class Unary(Expr):
    op: str  # '-', '+', 'NOT'
    operand: Expr


@dataclass(frozen=True)
class Bin(Expr):
    """Binary op: arithmetic, comparison, boolean, ``??``, ``||``."""

    op: str
    left: Expr
    right: Expr


@dataclass(frozen=True)
class In(Expr):
    needle: Expr
    items: Optional[tuple[Expr, ...]] = None  # IN (a, b, c)
    subquery: Optional["SelectStmt"] = None  # IN (SELECT ...)
    collection: Optional[Expr] = None  # IN some_array_field
    negated: bool = False


@dataclass(frozen=True)
class Between(Expr):
    operand: Expr
    low: Expr
    high: Expr
    negated: bool = False


@dataclass(frozen=True)
class Like(Expr):
    operand: Expr
    pattern: Expr
    case_insensitive: bool = False
    negated: bool = False


@dataclass(frozen=True)
class IsNull(Expr):
    operand: Expr
    negated: bool = False


@dataclass(frozen=True)
class IsDefined(Expr):
    operand: Expr
    negated: bool = False


@dataclass(frozen=True)
class Contains(Expr):
    """CONTAINS / CONTAINSALL / CONTAINSANY / CONTAINSKEY / CONTAINSVALUE /
    CONTAINSTEXT (parser/Contains*Condition.java)."""

    operand: Expr
    rhs: Expr
    mode: str  # 'contains' | 'all' | 'any' | 'key' | 'value' | 'text'


@dataclass(frozen=True)
class Matches(Expr):
    operand: Expr
    pattern: Expr


@dataclass(frozen=True)
class InstanceOf(Expr):
    operand: Expr
    type_name: str


@dataclass(frozen=True)
class Case(Expr):
    operand: Optional[Expr]  # extended CASE has a test expression
    whens: tuple[tuple[Expr, Expr], ...]
    else_: Optional[Expr]


@dataclass(frozen=True)
class ArrayLit(Expr):
    items: tuple[Expr, ...]


@dataclass(frozen=True)
class MapProjection(Expr):
    """Cypher map projection ``n{.name, .age, key: expr, .*}``
    (reference OpenCypherExpressionTest map-projection tests).  Items:
    ("prop", name) | ("entry", key, Expr) | ("var", name) | ("star",)."""

    base: Expr
    items: tuple


@dataclass(frozen=True)
class TypePred(Expr):
    """Cypher-25 type predicate ``x IS [NOT] :: TYPE`` (GQL value-type
    check; reference CypherFollowUpsIssue5602Test.java:105)."""

    base: Expr
    type_name: str  # normalized UPPER
    negated: bool = False


@dataclass(frozen=True)
class LabelPred(Expr):
    """Cypher label predicate ``n:Label[:Label2]`` in expression position
    (WHERE / RETURN).  True iff the node's label matches every listed
    label (single-label model: conjunction collapses accordingly)."""

    base: Expr
    labels: tuple[str, ...]


@dataclass(frozen=True)
class Quantifier(Expr):
    """Cypher list-predicate quantifier ``all/any/none/single(x IN src
    WHERE pred)`` (openCypher quantified expressions; TCK
    expressions/quantifier)."""

    kind: str  # "all" | "any" | "none" | "single"
    var: str
    source: Expr
    pred: Expr


@dataclass(frozen=True)
class ListComp(Expr):
    """Cypher list comprehension ``[x IN src WHERE pred | proj]`` (also
    legacy ``filter(...)`` / ``extract(...)``)."""

    var: str
    source: Expr
    pred: Optional[Expr]
    proj: Optional[Expr]


@dataclass(frozen=True)
class ReduceExpr(Expr):
    """Cypher ``reduce(acc = init, x IN src | body)``."""

    acc: str
    init: Expr
    var: str
    source: Expr
    body: Expr


@dataclass(frozen=True)
class AllReduceExpr(Expr):
    """Cypher-25 ``allReduce(acc = init, x IN src | body, pred)`` —
    true when the predicate holds after every accumulation step; empty
    or null list is vacuous truth (ast/AllReduceExpression.java:66)."""

    acc: str
    init: Expr
    var: str
    source: Expr
    body: Expr
    pred: Expr


@dataclass(frozen=True)
class MapLit(Expr):
    entries: tuple[tuple[str, Expr], ...]


@dataclass(frozen=True)
class Index(Expr):
    """Array selector ``base[i]`` or map access ``base['k']``."""

    base: Expr
    index: Expr


@dataclass(frozen=True)
class Slice(Expr):
    base: Expr
    low: Optional[Expr]
    high: Optional[Expr]


@dataclass(frozen=True)
class ArrayFilter(Expr):
    """Condition array selector ``base[f = 'x']`` / ``base[> 5]``
    (SQLParser.g4:1450-1457 arrayConditionSelector / arrayFilterSelector).

    ``cond`` is evaluated per element; bare property chains inside it
    resolve against the element (struct fields), and the pseudo-chain
    ``@value`` refers to the element itself (scalar-element filters).
    """

    base: Expr
    cond: Expr


@dataclass(frozen=True)
class NestedProj(Expr):
    """Nested projection ``expr:{a, b}`` / ``expr:{*, !secret}``
    (SQLParser.g4:322-327, parser/NestedProjection.java).

    ``include`` of ("*",) with ``exclude`` names keeps all struct fields
    but the excluded; otherwise only the named fields are kept.
    """

    base: Expr
    include: tuple[str, ...]
    exclude: tuple[str, ...]


@dataclass(frozen=True)
class Subquery(Expr):
    stmt: "SelectStmt"


# ---------------------------------------------------------------------------
# Statements
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ProjItem:
    expr: Expr
    alias: Optional[str] = None
    # verbatim source text of the expression (Cypher result columns are
    # named by the expression text when unaliased — openCypher spec)
    text: Optional[str] = None


# FROM targets
@dataclass(frozen=True)
class TypeTarget:
    name: str


@dataclass(frozen=True)
class BucketTarget:
    name: str


@dataclass(frozen=True)
class SchemaTarget:
    name: str  # 'types', 'buckets', ...


@dataclass(frozen=True)
class RidTarget:
    rids: tuple[RidLit, ...]


@dataclass(frozen=True)
class SubqueryTarget:
    stmt: "Statement"
    alias: Optional[str] = None


@dataclass(frozen=True)
class IndexTarget:
    """``SELECT FROM index:<name>`` — index-entry scan
    (FetchFromIndexStep analog: (key, rid) rows)."""

    name: str


@dataclass(frozen=True)
class FuncTarget:
    """Function-call target — ``SELECT/UPDATE/DELETE … cypherRID(<id>)``
    (SQLFunctionCypherRID.java, issue #4282)."""

    call: FuncCall


@dataclass(frozen=True)
class ParamTarget:
    """``SELECT FROM :seeds`` — a bound RID / RID-collection target
    (Issue5505BoundRidCollectionTargetTest.java)."""

    name: str


Target = Union[TypeTarget, BucketTarget, SchemaTarget, RidTarget, SubqueryTarget, FuncTarget, ParamTarget, None]


@dataclass(frozen=True)
class LetItem:
    name: str
    expr: Optional[Expr] = None
    subquery: Optional["Statement"] = None


@dataclass(frozen=True)
class OrderItem:
    expr: Expr
    # True/False, or a Param whose bound value ('ASC'/'DESC'/bool)
    # decides at run time (TestOrderParam: ORDER BY num :dir)
    ascending: Any = True


@dataclass(frozen=True)
class UnwindItem:
    expr: Expr
    alias: Optional[str] = None


@dataclass(frozen=True)
class SelectStmt:
    projections: tuple[ProjItem, ...] = ()
    distinct: bool = False
    target: Target = None
    lets: tuple[LetItem, ...] = ()
    where: Optional[Expr] = None
    group_by: tuple[Expr, ...] = ()
    order_by: tuple[OrderItem, ...] = ()
    unwind: tuple[UnwindItem, ...] = ()
    skip: Optional[Expr] = None
    limit: Optional[Expr] = None
    having: Optional[Expr] = None  # GROUP BY … HAVING <pred>


# MATCH (query/sql/executor/MatchExecutionPlanner.java:59)
@dataclass(frozen=True)
class MatchFilter:
    """One ``{type: X, as: a, where: (...), optional: true}`` block."""

    type_name: Optional[str] = None
    alias: Optional[str] = None
    where: Optional[Expr] = None
    optional: bool = False
    while_: Optional[Expr] = None
    maxdepth: Optional[int] = None
    # literal inline property map, kept for Cypher CREATE/MERGE
    props: tuple = ()
    # True when a property map was WRITTEN (even empty {}): CREATE (n {})
    # on a bound n is VariableAlreadyBound (TCK Create1[19])
    props_braced: bool = False


@dataclass(frozen=True)
class MatchStep:
    """One traversal method in a path: ``.out('E'){...}`` etc.

    min_hops/max_hops > 1 express Cypher variable-length relationships
    (``-[:T*1..3]->``) — expanded as bounded walk reachability."""

    method: str  # out | in | both | outE | inE | bothE | outV | inV | bothV
    edge_types: tuple[str, ...] = ()
    filter: MatchFilter = field(default_factory=MatchFilter)
    min_hops: int = 1
    max_hops: int = 1
    # Cypher relationship variable + inline literal props, kept for
    # CREATE/MERGE edge-property writes: -[r:T {k: v}]->
    edge_alias: Optional[str] = None
    edge_props: tuple = ()
    # written with Cypher '*' syntax: even *1..1 is variable-length and
    # binds the relationship variable as a LIST (TCK Match4[1])
    var_length: bool = False


@dataclass(frozen=True)
class MatchPath:
    root: MatchFilter
    steps: tuple[MatchStep, ...] = ()
    negated: bool = False
    optional: bool = False  # Cypher OPTIONAL MATCH: joined left_outer
    # Cypher path variable ``p = (a)-[..]->(b)``: binds a struct
    # (vids array<long>, n_rels int) — enough for length(p) and vid-level
    # path inspection (full node/rel entity paths are out of scope)
    path_alias: "Optional[str]" = None
    # shortestPath()/allShortestPaths() wrapper (reference
    # CypherShortestPathEdgeFilterTest): "single" keeps one minimal-hop
    # path per endpoint pair, "all" keeps every co-minimal path
    shortest: "Optional[str]" = None
    # WHERE attached to an OPTIONAL MATCH clause: evaluated as part of
    # the left-outer join (rows null-pad instead of dropping — openCypher
    # OPTIONAL MATCH … WHERE semantics, TCK MatchWhere6)
    opt_where: "Optional[Expr]" = None
    # Cypher-25 inline pattern predicates ((n:P WHERE n.age > 18),
    # -[r:T WHERE r.w < 5]->; reference CypherInlinePatternWhereTest) —
    # AND-folded into the clause WHERE (or the optional join condition)
    inline_where: "Optional[Expr]" = None
    # openCypher relationship-uniqueness: no relationship may appear twice
    # within one pattern's bindings (Cypher-origin patterns set this; the
    # SQL MATCH dialect keeps walk semantics)
    rel_unique: bool = False
    # which MATCH clause this path came from (comma-separated paths of one
    # clause share an id) — relationship isomorphism applies across ALL
    # paths of one MATCH clause, not per path
    clause_id: int = -1
    # Cypher-25 MATCH path mode (ast/PathMode.java): None/TRAIL = edge-
    # unique (the default), ACYCLIC adds vertex uniqueness, WALK lifts
    # uniqueness entirely (requires a bounded max hop)
    path_mode: "Optional[str]" = None


@dataclass(frozen=True)
class PatternExpr(Expr):
    """A relationship pattern used as an expression (openCypher pattern
    predicate / pattern comprehension source): WHERE (a)-[:T]->(b),
    exists((a)-->()), size((a)-->()), EXISTS { … }.  Lowered to a per-row
    match-count marker joined onto the frame (never a correlated subplan
    per row)."""
    path: "Optional[MatchPath]"
    # EXISTS { MATCH … WHERE … } subquery form: inner predicate, and new
    # variables are allowed (a bare pattern predicate may not introduce
    # any)
    where: Optional[Expr] = None
    subquery: bool = False
    # full-query EXISTS { MATCH … WITH … RETURN … } block: raw text,
    # lowered as a correlated pipeline frame (cypher.lower_exists_block)
    block: Optional[str] = None
    # Cypher-25 subquery-expression family (Cypher25Parser.g4
    # existsExpression/countExpression/collectExpression):
    # "exists" -> boolean ≥1-match, "count" -> the match count as a
    # value, "collect" -> the block's RETURN column as a list
    mode: str = "exists"


@dataclass(frozen=True)
class PatternComp(Expr):
    """openCypher pattern comprehension ``[(n)-->(m) WHERE pred | proj]``:
    evaluates to the list of ``proj`` over the pattern's matches.  Lowered
    to a grouped collect_list joined onto the frame (never a correlated
    per-row subplan).  Unlike a bare pattern predicate, it MAY introduce
    new variables — they scope to ``where``/``proj`` only."""
    path: "MatchPath"
    where: Optional[Expr]
    proj: Expr


@dataclass(frozen=True)
class MatchStmt:
    paths: tuple[MatchPath, ...]
    returns: tuple[ProjItem, ...] = ()
    distinct: bool = False
    where: Optional[Expr] = None  # global WHERE over bound aliases (Cypher)
    group_by: tuple[Expr, ...] = ()
    order_by: tuple[OrderItem, ...] = ()
    skip: Optional[Expr] = None
    limit: Optional[Expr] = None


@dataclass(frozen=True)
class TraverseStmt:
    projections: tuple[Expr, ...] = ()  # traversal functions: out('E'), ...
    target: Target = None
    max_depth: Optional[int] = None
    while_: Optional[Expr] = None
    limit: Optional[Expr] = None
    strategy: str = "BREADTH_FIRST"


Statement = Union[SelectStmt, MatchStmt, TraverseStmt]


# ---------------------------------------------------------------------------
# DML / DDL statements (SURVEY.md §2.10)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class InsertStmt:
    type_name: str
    fields: tuple[str, ...] = ()
    bucket_name: Optional[str] = None  # INSERT INTO bucket:<name>
    return_expr: Optional[Expr] = None  # INSERT … RETURN <expr>
    values_rows: tuple[tuple[Expr, ...], ...] = ()  # VALUES (...), (...)
    set_items: tuple[tuple[str, Expr], ...] = ()  # SET f = e, ...
    content: Optional[Expr] = None  # CONTENT {...} (MapLit or Param)
    content_rows: Optional[ArrayLit] = None  # CONTENT [{...}, ...]
    from_select: Optional["SelectStmt"] = None  # INSERT ... FROM SELECT


@dataclass(frozen=True)
class UpdateStmt:
    type_name: str
    set_items: tuple[tuple[str, Expr], ...] = ()
    remove_fields: tuple[str, ...] = ()
    content: Optional[Expr] = None  # MapLit or Param
    content_rows: Optional[ArrayLit] = None  # CONTENT [{...}, ...]
    upsert: bool = False
    apply_defaults: bool = False  # APPLY DEFAULTS (issue #1814)
    # 'content' = full record replace, 'merge' = per-key merge
    # (UpdateStatement.java CONTENT vs MERGE)
    content_mode: str = "merge"
    where: Optional[Expr] = None
    limit: Optional[Expr] = None
    # RETURN AFTER/BEFORE [expr] — yield the matched records' state
    # (parser/UpdateStatement.java returnBefore/returnAfter)
    return_mode: Optional[str] = None  # 'after' | 'before' | 'count'
    return_expr: Optional[Expr] = None


@dataclass(frozen=True)
class DeleteStmt:
    type_name: str
    where: Optional[Expr] = None
    limit: Optional[Expr] = None
    # RETURN BEFORE [expr] — yield the deleted records' prior state
    return_mode: Optional[str] = None  # 'before' | 'count'
    return_expr: Optional[Expr] = None


@dataclass(frozen=True)
class CreateTypeStmt:
    kind: str  # 'document' | 'vertex' | 'edge'
    name: str
    if_not_exists: bool = False
    extends: Optional[str] = None
    buckets: Optional[int] = None
    bucket_names: tuple[str, ...] = ()  # BUCKET b1,b2 association
    custom: tuple = ()  # CUSTOM k = <literal expr> metadata pairs


@dataclass(frozen=True)
class CreateTimeSeriesTypeStmt:
    """CREATE TIMESERIES TYPE (SQLParser.g4:473-482,
    CreateTimeSeriesTypeStatement.java)."""

    name: str
    if_not_exists: bool = False
    timestamp_col: str = "ts"
    precision: str = "MILLISECOND"
    tags: tuple = ()  # (name, type) pairs
    fields: tuple = ()  # (name, type) pairs
    shards: Optional[int] = None
    retention_ms: Optional[int] = None


@dataclass(frozen=True)
class AlterTimeSeriesTypeStmt:
    """ALTER TIMESERIES TYPE … ADD/DROP DOWNSAMPLING POLICY
    (SQLParser.g4:505-512)."""

    name: str
    add_tiers: tuple = ()  # (after_ms, granularity_ms) pairs
    drop_policy: bool = False


@dataclass(frozen=True)
class CreateEdgeStmt:
    """CREATE EDGE <type> FROM <endpoint> TO <endpoint> [SET k = v, …]
    (parser/CreateEdgeStatement.java) — endpoints are (SELECT …)
    subqueries or RID literals."""

    etype: str
    src: object  # SelectStmt | RidLit | tuple[RidLit, ...]
    dst: object
    sets: tuple = ()  # (prop, expr)
    if_not_exists: bool = False
    unidirectional: bool = False


@dataclass(frozen=True)
class ImportDatabaseStmt:
    """IMPORT DATABASE <url> [WITH k = v, …]
    (parser/ImportDatabaseStatement.java)."""

    url: Optional[str]
    options: tuple = ()  # (key, value) pairs


@dataclass(frozen=True)
class ExportDatabaseStmt:
    """EXPORT DATABASE <url> [WITH k = v, …]
    (parser/ExportDatabaseStatement.java)."""

    url: Optional[str]
    options: tuple = ()


@dataclass(frozen=True)
class CheckDatabaseStmt:
    """CHECK DATABASE [TYPE <t>, …] [FIX]
    (parser/CheckDatabaseStatement.java)."""

    types: tuple = ()
    fix: bool = False


@dataclass(frozen=True)
class AlterTypeStmt:
    """ALTER TYPE <name> <attribute> <value>
    (parser/AlterTypeStatement.java:28) — attributes: NAME, SUPERTYPE
    (±list), BUCKET (±list), BUCKETSELECTIONSTRATEGY, CUSTOM k = v."""

    name: str
    attr: Optional[str] = None  # name|supertype|bucket|bucketselectionstrategy
    value: Optional[str] = None
    # (add: bool, ident) pairs for SUPERTYPE/BUCKET ±lists
    add_remove: tuple = ()
    custom_key: Optional[str] = None
    custom_value: object = None


@dataclass(frozen=True)
class AlterPropertyStmt:
    """ALTER PROPERTY <type>.<prop> <setting> <value> | CUSTOM k = v
    (parser/AlterPropertyStatement.java)."""

    type_name: str
    prop: str
    setting: Optional[str] = None
    value: object = None
    custom_key: Optional[str] = None
    custom_value: object = None


@dataclass(frozen=True)
class DropTypeStmt:
    name: str
    if_exists: bool = False


@dataclass(frozen=True)
class TruncateRecordStmt:
    """TRUNCATE RECORD #b:p (TruncateRecordStatement.java) — drop the
    addressed records."""

    rids: tuple  # ((bucket, position), ...)


@dataclass(frozen=True)
class AlterDatabaseStmt:
    """ALTER DATABASE `key` <value> (AlterDatabaseStatement.java)."""

    key: str
    value: Any = None


@dataclass(frozen=True)
class DeleteFunctionStmt:
    """DELETE FUNCTION lib.name (drops a DEFINE FUNCTION entry)."""

    lib: str
    name: str


@dataclass(frozen=True)
class DropPropertyStmt:
    """DROP PROPERTY Type.prop (parser/DropPropertyStatement.java)."""

    type_name: str
    prop: str
    if_exists: bool = False


@dataclass(frozen=True)
class DropIndexStmt:
    """DROP INDEX <name> (parser/DropIndexStatement.java)."""

    name: str
    if_exists: bool = False


@dataclass(frozen=True)
class CreateGavStmt:
    """CREATE GRAPH ANALYTICAL VIEW (CreateGraphAnalyticalViewStatement.java)."""

    name: str
    vertex_types: tuple = ()
    edge_types: tuple = ()
    properties: tuple = ()
    edge_properties: tuple = ()
    update_mode: str = "OFF"
    compaction_threshold: int = -1
    if_not_exists: bool = False


@dataclass(frozen=True)
class RebuildGavStmt:
    name: str


@dataclass(frozen=True)
class DropGavStmt:
    name: str
    if_exists: bool = False


@dataclass(frozen=True)
class CreateTriggerStmt:
    """CREATE TRIGGER name BEFORE|AFTER CREATE|READ|UPDATE|DELETE
    ON TYPE t EXECUTE SQL '<stmt>'
    (parser/CreateTriggerStatement.java)."""

    name: str
    timing: str  # BEFORE | AFTER
    event: str  # CREATE | READ | UPDATE | DELETE
    type_name: str
    language: str  # SQL (JAVASCRIPT/JAVA are out of scope here)
    code: str
    if_not_exists: bool = False


@dataclass(frozen=True)
class DropTriggerStmt:
    name: str
    if_exists: bool = False


@dataclass(frozen=True)
class CreatePropertyStmt:
    type_name: str
    prop: str
    dtype: str
    if_not_exists: bool = False
    constraints: tuple = ()  # (mandatory/notnull/default/min/max/regexp)


@dataclass(frozen=True)
class CreateIndexStmt:
    type_name: Optional[str]
    props: tuple[str, ...] = ()
    index_kind: Optional[str] = None  # recorded; indexes are no-ops on Spark


@dataclass(frozen=True)
class TruncateTypeStmt:
    name: str


@dataclass(frozen=True)
class CreateBucketStmt:
    name: str
    if_not_exists: bool = False


@dataclass(frozen=True)
class DropBucketStmt:
    name: str
    if_exists: bool = False


@dataclass(frozen=True)
class TruncateBucketStmt:
    name: str


@dataclass(frozen=True)
class BackupDatabaseStmt:
    url: Optional[str] = None


@dataclass(frozen=True)
class CreateMaterializedViewStmt:
    name: str
    select: "SelectStmt"
    refresh_mode: str = "MANUAL"  # MANUAL | INCREMENTAL | EVERY n unit
    if_not_exists: bool = False


@dataclass(frozen=True)
class RefreshMaterializedViewStmt:
    name: str


@dataclass(frozen=True)
class DropMaterializedViewStmt:
    name: str
    if_exists: bool = False


@dataclass(frozen=True)
class DefineFunctionStmt:
    """DEFINE FUNCTION lib.name "body" [PARAMETERS [a,b]] [LANGUAGE lang]
    (parser/DefineFunctionStatement.java:22)."""

    lib: str
    name: str
    body: str
    parameters: tuple[str, ...] = ()
    language: str = "sql"

"""TRAVERSE statement → iterative frontier-join BFS.

Reference: query/sql/executor/BreadthFirstTraverseStep.java:34 /
DepthFirstTraverseStep.java:36 walk records one at a time keeping a
visited set.  The Spark re-expression is a frontier loop: each hop is a
join of the current frontier against the edge DataFrame, with a left_anti
join against the visited set for cycle avoidance.

DFS visit *order* is inherently sequential and is not reproducible on a
distributed engine — we execute BFS regardless of STRATEGY (documented
deviation; result *sets* are identical, only row order differs, and
TRAVERSE result order is undefined without ORDER BY anyway).

Scale notes: the visited set grows monotonically — we localCheckpoint
every ``_CHECKPOINT_EVERY`` hops to truncate lineage (the iterative-join
plan would otherwise grow exponentially in Catalyst); the frontier join
is src-partitioned via the graph's CSR-analog edge cache.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arcadedb_spark.sql import ast
from arcadedb_spark.sql.translator import Ctx, ExprCompiler, TranslateError

_CHECKPOINT_EVERY = 4
_DEFAULT_MAX_DEPTH = 10


def _direction_edges(db, projections) -> DataFrame:
    """Union of the edge frames named by the traverse projections
    (out('X'), in('Y'), both()) normalized to (__from, __to)."""
    g = db.graph()
    frames = []
    specs = []
    for p in projections:
        if isinstance(p, ast.Star):
            specs.append(("both", ()))
        elif isinstance(p, ast.FuncCall) and p.name.lower() in ("out", "in", "both"):
            etypes = tuple(
                a.value if isinstance(a, ast.Lit) else a.parts[0]
                for a in p.args
                if isinstance(a, (ast.Lit, ast.Chain))
            )
            specs.append((p.name.lower(), etypes))
        else:
            raise TranslateError(
                "TRAVERSE projections must be out()/in()/both() or *"
            )
    if not specs:
        specs = [("both", ())]
    for method, etypes in specs:
        e = g.edges(*etypes) if etypes else g.edges()
        if method in ("out", "both"):
            frames.append(
                e.select(F.col("src").alias("__from"), F.col("dst").alias("__to"))
            )
        if method in ("in", "both"):
            frames.append(
                e.select(F.col("dst").alias("__from"), F.col("src").alias("__to"))
            )
    out = frames[0]
    for f_ in frames[1:]:
        out = out.unionByName(f_)
    return out


def traverse(
    db,
    roots: DataFrame,
    edges: DataFrame,
    max_depth: int,
    while_: ast.Expr | None = None,
    params: dict | None = None,
) -> DataFrame:
    """BFS from ``roots`` (a DataFrame with a ``vid`` column).

    Returns (vid, depth) for every reachable vertex within max_depth,
    depth = first-visit hop count (roots at depth 0).
    """
    params = params or {}
    # the edge frame is joined every hop — cache it once (for derived edge
    # sets like INTERACTED the derivation is itself a query)
    edges = edges.cache()
    visited = roots.select("vid").distinct().withColumn("depth", F.lit(0))
    frontier = visited
    for depth in range(1, max_depth + 1):
        nxt = (
            frontier.join(edges, frontier["vid"] == edges["__from"], "inner")
            .select(F.col("__to").alias("vid"))
            .distinct()
        )
        nxt = nxt.join(visited.select("vid"), "vid", "left_anti").withColumn(
            "depth", F.lit(depth)
        )
        if while_ is not None:
            ctx = Ctx(db=db, params=params, columns=("vid", "depth"))
            # WHILE with $depth bound (grammar SQLParser.g4:223-230)
            from arcadedb_spark.sql.translator import VarBinding

            ctx.vars["depth"] = VarBinding("col", col=F.col("depth"))
            nxt = nxt.filter(ExprCompiler(ctx).compile(while_))
        if depth % _CHECKPOINT_EVERY == 0:
            nxt = nxt.truncate_plan()
        else:
            # each hop is re-read by the emptiness check, the next hop's
            # join and the visited union — cache instead of recomputing
            nxt = nxt.cache()
        # emptiness check drives the loop — one count() action per hop,
        # skipped on the final hop where the loop ends regardless
        if depth < max_depth and nxt.limit(1).count() == 0:
            break
        visited = visited.unionByName(nxt)
        if depth % _CHECKPOINT_EVERY == 0:
            visited = visited.truncate_plan()
        frontier = nxt
    return visited


def translate_traverse(db, stmt: ast.TraverseStmt, params: dict) -> DataFrame:
    from arcadedb_spark.sql.translator import Translator

    edges = _direction_edges(db, stmt.projections)
    # Resolve roots: a type target (all its vertices) or a subquery
    tr = Translator(db, params)
    root_df, type_name = tr._resolve_target(stmt.target)
    g = db.graph()
    if "vid" not in root_df.columns:
        if type_name is not None and type_name.lower() in g.vertex_dfs:
            root_df = g.vertices(type_name)
        else:
            raise TranslateError(
                f"TRAVERSE target must be a vertex type; got {type_name!r}"
            )
    roots = root_df.select("vid")
    max_depth = stmt.max_depth if stmt.max_depth is not None else _DEFAULT_MAX_DEPTH
    visited = traverse(db, roots, edges, max_depth, stmt.while_, params)
    # join back vertex labels/properties
    out = visited.join(g.all_vertices(), "vid", "left").select(
        "vid", "label", F.col("depth").alias("$depth")
    )
    if stmt.limit is not None:
        out = out.limit(tr._int_of(stmt.limit, Ctx(db=db, params=params)))
    return out

"""ArcadeDB-SQL dialect front end: lexer → parser → AST → DataFrame translator.

Reference pipeline being re-expressed (paths under /root/reference/):
- grammar: engine/src/main/antlr4/com/arcadedb/query/sql/grammar/SQLParser.g4
- engine:  engine/src/main/java/com/arcadedb/query/sql/SQLQueryEngine.java:85
- planner: engine/src/main/java/com/arcadedb/query/sql/executor/SelectExecutionPlanner.java:217

We parse the same dialect but emit Spark DataFrame programs instead of a
step chain — Catalyst replaces the reference's rule-based rewrites
(SURVEY.md §4.1 maps each rewrite to the Catalyst feature that subsumes it).
"""

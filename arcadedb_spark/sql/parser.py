"""Recursive-descent parser for the ArcadeDB-SQL dialect.

Grammar parity target:
engine/src/main/antlr4/com/arcadedb/query/sql/grammar/SQLParser.g4
(selectStatement :202, matchStatement :236, traverseStatement :222,
whereClause/conditionBlock :1226, mathExpression :1370).

The reference parses with ANTLR into per-production Java classes; we use a
hand-written Pratt-style parser (no ANTLR runtime in this environment) that
produces the compact AST of :mod:`arcadedb_spark.sql.ast`.  Boolean
conditions sit inside the ordinary precedence ladder (OR < AND < NOT <
comparison < ``||`` < ``??`` < additive < multiplicative < unary <
postfix), which mirrors the grammar's orBlock/andBlock/conditionBlock
nesting.
"""

from __future__ import annotations

from arcadedb_spark.sql import ast
from arcadedb_spark.sql.lexer import Token, tokenize

_CMP_OPS = {"=", "==", "!=", "<>", "<", "<=", ">", ">=", "<=>"}
_TRAVERSE_METHODS = {
    "out", "in", "both", "oute", "ine", "bothe", "outv", "inv", "bothv",
}


class ParseError(ValueError):
    pass


class Parser:
    def __init__(self, text: str) -> None:
        self.text = text
        self.tokens = tokenize(text)
        self.i = 0
        self._positional = 0
        self.cypher = False  # Cypher dialect mode (CONTAINS = substring…)

    # -- token helpers ----------------------------------------------------
    @property
    def cur(self) -> Token:
        return self.tokens[self.i]

    def peek(self, offset: int = 1) -> Token:
        j = min(self.i + offset, len(self.tokens) - 1)
        return self.tokens[j]

    def advance(self) -> Token:
        tok = self.tokens[self.i]
        if tok.kind != "EOF":
            self.i += 1
        return tok

    def at_kw(self, *kws: str) -> bool:
        return self.cur.kind == "KEYWORD" and self.cur.value in kws

    def eat_kw(self, *kws: str) -> bool:
        if self.at_kw(*kws):
            self.advance()
            return True
        return False

    def expect_kw(self, kw: str) -> None:
        if not self.eat_kw(kw):
            raise ParseError(f"Expected {kw} at {self.cur!r} (pos {self.cur.pos})")

    def at_op(self, *ops: str) -> bool:
        return self.cur.kind == "OP" and self.cur.value in ops

    def eat_op(self, *ops: str) -> bool:
        if self.at_op(*ops):
            self.advance()
            return True
        return False

    def expect_op(self, op: str) -> None:
        if not self.eat_op(op):
            raise ParseError(f"Expected '{op}' at {self.cur!r} (pos {self.cur.pos})")

    def ident(self) -> str:
        tok = self.cur
        if tok.kind == "IDENT":
            self.advance()
            return tok.value
        # Soft keywords usable as identifiers in name positions.
        if tok.kind == "KEYWORD":
            self.advance()
            return tok.value.lower()
        raise ParseError(f"Expected identifier at {tok!r} (pos {tok.pos})")

    # -- statements -------------------------------------------------------
    def parse_statement(self) -> ast.Statement:
        if self.at_kw("SELECT"):
            return self.parse_select()
        if self.at_kw("MATCH"):
            return self.parse_match()
        if self.at_kw("TRAVERSE"):
            return self.parse_traverse()
        if self.at_kw("INSERT"):
            return self.parse_insert()
        if self.at_kw("UPDATE"):
            return self.parse_update()
        if self.at_kw("DELETE"):
            return self.parse_delete()
        if self.at_kw("CREATE"):
            return self.parse_create()
        if self.at_kw("DROP"):
            return self.parse_drop()
        if self.cur.kind == "IDENT" and self.cur.value.upper() == "ALTER":
            return self.parse_alter()
        if self.cur.kind == "IDENT" and self.cur.value.upper() == "TRUNCATE":
            return self.parse_truncate()
        if self.cur.kind == "IDENT" and self.cur.value.upper() in (
            "IMPORT", "EXPORT",
        ):
            return self._parse_import_export()
        if self.cur.kind == "IDENT" and self.cur.value.upper() == "CHECK":
            return self._parse_check_database()
        if self.cur.kind == "IDENT" and self.cur.value.upper() == "DEFINE":
            return self.parse_define_function()
        if self.cur.kind == "IDENT" and self.cur.value.upper() == "REBUILD":
            # REBUILD GRAPH ANALYTICAL VIEW name — each keyword is
            # validated so e.g. the reference dialect's REBUILD INDEX
            # gets a targeted unsupported-statement error, not a
            # confusing downstream misparse
            self.advance()
            for kw in ("GRAPH", "ANALYTICAL", "VIEW"):
                if not (
                    self.cur.kind in ("IDENT", "KEYWORD")
                    and str(self.cur.value).upper() == kw
                ):
                    raise ParseError(
                        f"Unsupported REBUILD statement: expected {kw}, "
                        f"got {self.cur!r} (only REBUILD GRAPH ANALYTICAL "
                        "VIEW is supported; indexes need no rebuild — "
                        "scan+pushdown replaces them)"
                    )
                self.advance()
            return ast.RebuildGavStmt(name=self.ident())
        if self.cur.kind == "IDENT" and self.cur.value.upper() == "REFRESH":
            self.advance()
            for alts in (("MATERIALIZED", "CONTINUOUS"), ("VIEW", "AGGREGATE")):
                if not (
                    self.cur.kind in ("IDENT", "KEYWORD")
                    and str(self.cur.value).upper() in alts
                ):
                    raise ParseError(
                        f"Unsupported REFRESH statement: expected one of "
                        f"{alts}, got {self.cur!r}"
                    )
                self.advance()
            return ast.RefreshMaterializedViewStmt(name=self.ident())
        if self.cur.kind == "IDENT" and self.cur.value.upper() == "BACKUP":
            # BACKUP DATABASE ['<url>'] (parser/BackupDatabaseStatement)
            self.advance()
            if not (self.cur.kind in ("IDENT", "KEYWORD")
                    and str(self.cur.value).upper() == "DATABASE"):
                raise ParseError("Expected DATABASE after BACKUP")
            self.advance()
            url = None
            if self.cur.kind == "STRING":
                url = self.advance().value
            return ast.BackupDatabaseStmt(url=url)
        raise ParseError(f"Unsupported statement start: {self.cur!r}")

    # DML ------------------------------------------------------------------
    def parse_insert(self) -> ast.InsertStmt:
        self.expect_kw("INSERT")
        self.expect_kw("INTO")
        name = self.ident()
        bucket_name = None
        if name.lower() == "bucket" and self.cur.kind == "PARAM":
            # INSERT INTO bucket:<name> — direct bucket insert
            # (parser/InsertStatement.java targetBucket); ':name' lexes
            # as one PARAM token
            bucket_name = str(self.advance().value)
            name = ""
        elif name.lower() == "bucket" and self.at_op(":") \
                and self.peek().kind == "PARAM":
            # INSERT INTO bucket::<param> — parameterized bucket name
            self.advance()
            bucket_name = ast.Param(str(self.advance().value))
            name = ""
        fields: list[str] = []
        values_rows: list[tuple] = []
        set_items: list[tuple] = []
        content = None
        content_rows = None
        from_select = None
        if self.at_op("(") and self.peek().kind == "KEYWORD" \
                and self.peek().value == "SELECT":
            # INSERT INTO dst (SELECT ...) — subquery source without FROM
            self.advance()
            from_select = self.parse_statement()
            self.expect_op(")")
        elif self.at_kw("SELECT"):
            # INSERT INTO dst SELECT ... (bare subquery source)
            from_select = self.parse_statement()
        if self.at_op("("):
            self.advance()
            fields.append(self.ident())
            while self.eat_op(","):
                fields.append(self.ident())
            self.expect_op(")")
        if self.at_kw("VALUES"):
            self.advance()
            while True:
                self.expect_op("(")
                row = [self.parse_expr()]
                while self.eat_op(","):
                    row.append(self.parse_expr())
                self.expect_op(")")
                values_rows.append(tuple(row))
                if not self.eat_op(","):
                    break
        elif self.at_kw("SET"):
            self.advance()
            set_items.append(self._parse_set_item())
            while self.eat_op(","):
                set_items.append(self._parse_set_item())
        elif self.at_kw("CONTENT"):
            self.advance()
            m = self.parse_primary()
            if isinstance(m, ast.ArrayLit):
                if not all(isinstance(i, ast.MapLit) for i in m.items):
                    raise ParseError(
                        "CONTENT array requires JSON objects"
                    )
                content_rows = m
            elif isinstance(m, (ast.MapLit, ast.Param)):
                content = m
            else:
                raise ParseError("CONTENT requires a JSON object")
        return_expr = None
        if self.at_kw("RETURN"):
            # INSERT … RETURN <expr> (InsertStatement.java returnStatement)
            # — may precede FROM (INSERT INTO dst RETURN @rid FROM SELECT)
            self.advance()
            return_expr = self.parse_expr()
        if self.at_kw("FROM"):
            self.advance()
            if self.at_op("("):
                self.advance()
                from_select = self.parse_statement()
                self.expect_op(")")
            else:
                from_select = self.parse_statement()
        if return_expr is None and self.at_kw("RETURN"):
            self.advance()
            return_expr = self.parse_expr()
        return ast.InsertStmt(
            type_name=name,
            bucket_name=bucket_name,
            return_expr=return_expr,
            fields=tuple(fields),
            values_rows=tuple(values_rows),
            set_items=tuple(set_items),
            content=content,
            content_rows=content_rows,
            from_select=from_select,
        )

    def _parse_set_item(self) -> tuple[str, ast.Expr]:
        prop = self.ident()
        while self.at_op(".") and self.peek().kind in ("IDENT", "KEYWORD"):
            # dotted path: SET props.key2 = v (nested map/struct entry)
            self.advance()
            prop += "." + str(self.advance().value)
        if self.at_op("+", "-") and self.peek().kind == "OP" \
                and self.peek().value == "=":
            # SET items += 'c' / n -= 1 (UpdateItem.java
            # OPERATOR_PLUSASSIGN/MINUSASSIGN: append-to-collection /
            # string-concat / numeric add, dispatched on the column type)
            op = self.advance().value
            self.advance()
            fn = "plusassign" if op == "+" else "minusassign"
            return (prop, ast.FuncCall(
                fn, (ast.Chain((prop,)), self.parse_expr())
            ))
        self.expect_op("=")
        return (prop, self.parse_expr())

    def _maybe_func_target(self):
        """IDENT '(' in target position → a FuncTarget (UPDATE/DELETE
        cypherRID(:id) …); RID / [RID, …] → RidTarget; otherwise the
        plain type name."""
        if self.cur.kind == "IDENT" and self.peek().kind == "OP" \
                and self.peek().value == "(":
            e = self.parse_primary()
            if not isinstance(e, ast.FuncCall):
                raise ParseError(f"Unsupported target at {self.cur!r}")
            return ast.FuncTarget(e)
        if self.cur.kind == "RID" or (
            self.at_op("[") and self.peek().kind == "RID"
        ):
            rids = []
            bracket = self.eat_op("[")
            while self.cur.kind == "RID":
                rids.append(self._rid_value(self.advance().value))
                self.eat_op(",")
            if bracket:
                self.expect_op("]")
            return ast.RidTarget(tuple(rids))
        return self.ident()

    def parse_update(self) -> ast.UpdateStmt:
        self.expect_kw("UPDATE")
        name = self._maybe_func_target()
        set_items: list[tuple] = []
        remove_fields: list[str] = []
        content = None
        content_rows = None
        upsert = False
        apply_defaults = False
        content_mode = "merge"
        where = None
        limit = None
        return_mode = None
        return_expr = None
        while True:
            if self.at_kw("SET"):
                self.advance()
                set_items.append(self._parse_set_item())
                while self.eat_op(","):
                    set_items.append(self._parse_set_item())
            elif self.at_kw("REMOVE"):
                self.advance()
                while True:
                    rf = self.ident()
                    if self.eat_op("="):
                        # REMOVE items = 'x' — drop the matching element
                        # from a collection property
                        # (UpdateRemoveItem.java)
                        set_items.append((
                            rf,
                            ast.FuncCall(
                                "arrayremoveitem",
                                (ast.Chain((rf,)), self.parse_expr()),
                            ),
                        ))
                    else:
                        remove_fields.append(rf)
                    if not self.eat_op(","):
                        break
            elif self.at_kw("CONTENT", "MERGE"):
                content_mode = str(self.advance().value).lower()
                m = self.parse_primary()
                if isinstance(m, ast.ArrayLit):
                    if not all(
                        isinstance(i, ast.MapLit) for i in m.items
                    ):
                        raise ParseError(
                            "CONTENT array requires JSON objects"
                        )
                    content_rows = m
                elif isinstance(m, (ast.MapLit, ast.Param)):
                    content = m
                else:
                    raise ParseError("CONTENT/MERGE requires a JSON object")
            elif self.at_kw("UPSERT"):
                self.advance()
                upsert = True
            elif self.cur.kind == "IDENT" \
                    and self.cur.value.upper() == "APPLY":
                # APPLY DEFAULTS (issue #1814): null/removed declared
                # properties reset to their schema default
                self.advance()
                nxt = self.advance()
                if str(nxt.value).upper() != "DEFAULTS":
                    raise ParseError("Expected DEFAULTS after APPLY")
                apply_defaults = True
            elif self.at_kw("WHERE"):
                self.advance()
                where = self.parse_expr()
            elif self.at_kw("LIMIT"):
                self.advance()
                limit = self.parse_expr()
            elif self.cur.kind == "IDENT" \
                    and self.cur.value.upper() == "BATCH":
                self.advance()
                self.parse_expr()  # tx batch size — atomicity no-op here
            elif self.cur.kind == "IDENT" and self.cur.value.upper() in (
                "ADD", "PUT", "INCREMENT",
            ):
                # legacy update operators (UpdateStatement.java):
                # ADD coll = v (append), INCREMENT n = v, PUT map = k, v
                op_u = self.advance().value.upper()
                prop_u = self.ident()
                self.expect_op("=")
                if op_u == "PUT":
                    k_e = self.parse_expr()
                    self.expect_op(",")
                    v_e = self.parse_expr()
                    set_items.append((prop_u, ast.FuncCall(
                        "mapput", (ast.Chain((prop_u,)), k_e, v_e)
                    )))
                else:
                    fn_u = "plusassign"
                    set_items.append((prop_u, ast.FuncCall(
                        fn_u, (ast.Chain((prop_u,)), self.parse_expr())
                    )))
            elif self.at_kw("RETURN"):
                # RETURN AFTER/BEFORE [proj] / RETURN COUNT — the WHERE
                # may follow (UpdateStatement.java grammar order)
                self.advance()
                if self.cur.kind in ("IDENT", "KEYWORD") and \
                        str(self.cur.value).upper() in ("AFTER", "BEFORE"):
                    return_mode = str(self.advance().value).lower()
                elif self.cur.kind in ("IDENT",) and \
                        str(self.cur.value).upper() == "COUNT":
                    self.advance()
                    return_mode = "count"
                else:
                    return_mode = "after"
                if not (
                    self.at_kw("WHERE", "LIMIT") or self.cur.kind == "EOF"
                ):
                    return_expr = self.parse_expr()
            else:
                break
        return ast.UpdateStmt(
            type_name=name,
            set_items=tuple(set_items),
            remove_fields=tuple(remove_fields),
            content=content,
            content_rows=content_rows,
            upsert=upsert,
            apply_defaults=apply_defaults,
            content_mode=content_mode,
            where=where,
            limit=limit,
            return_mode=return_mode,
            return_expr=return_expr,
        )

    def parse_delete(self) -> ast.DeleteStmt:
        self.expect_kw("DELETE")
        if self.cur.kind == "IDENT" \
                and self.cur.value.upper() == "FUNCTION":
            # DELETE FUNCTION lib.name (SQLScriptTest function lifecycle)
            self.advance()
            lib = self.ident()
            self.expect_op(".")
            return ast.DeleteFunctionStmt(lib=lib, name=self.ident())
        self.expect_kw("FROM")
        name = self._maybe_func_target()
        where = None
        limit = None
        return_mode = None
        return_expr = None
        while True:
            if self.at_kw("WHERE"):
                self.advance()
                where = self.parse_expr()
            elif self.at_kw("LIMIT"):
                self.advance()
                limit = self.parse_expr()
            elif self.cur.kind == "IDENT" \
                    and self.cur.value.upper() == "BATCH":
                self.advance()
                self.parse_expr()  # tx batch size — no-op
            elif self.at_kw("RETURN"):
                # RETURN BEFORE [proj] / RETURN COUNT
                # (DeleteStatement.java returnBefore)
                self.advance()
                if self.cur.kind in ("IDENT", "KEYWORD") and \
                        str(self.cur.value).upper() == "BEFORE":
                    self.advance()
                    return_mode = "before"
                elif self.cur.kind == "IDENT" and \
                        str(self.cur.value).upper() == "COUNT":
                    self.advance()
                    return_mode = "count"
                else:
                    return_mode = "before"
                if not (
                    self.at_kw("WHERE", "LIMIT") or self.cur.kind == "EOF"
                ):
                    return_expr = self.parse_expr()
            else:
                break
        return ast.DeleteStmt(
            type_name=name, where=where, limit=limit,
            return_mode=return_mode, return_expr=return_expr,
        )

    # DDL ------------------------------------------------------------------
    _TS_UNIT_MS = {
        "SECONDS": 1000, "SECOND": 1000, "MINUTES": 60_000, "MINUTE": 60_000,
        "HOURS": 3_600_000, "HOUR": 3_600_000, "DAYS": 86_400_000,
    }

    def _parse_ts_duration_ms(self) -> int:
        n = int(self.advance().value)
        unit = "DAYS"
        if self.cur.kind == "IDENT" and self.cur.value.upper() in self._TS_UNIT_MS:
            unit = self.advance().value.upper()
        return n * self._TS_UNIT_MS[unit]

    def parse_create_timeseries(self) -> ast.Statement:
        # CREATE TIMESERIES TYPE name [IF NOT EXISTS]
        #   [TIMESTAMP col [PRECISION p]] [TAGS (n t, …)] [FIELDS (n t, …)]
        #   [SHARDS n] [RETENTION n unit]   (SQLParser.g4:473-482)
        self.advance()  # TIMESERIES
        self.expect_kw("TYPE")
        name = self.ident()
        if_not_exists = self._eat_if_not_exists()
        ts_col, precision = "ts", "MILLISECOND"
        tags: list = []
        fields: list = []
        shards = None
        retention_ms = None
        while self.cur.kind == "IDENT":
            word = self.cur.value.upper()
            if word == "TIMESTAMP":
                self.advance()
                ts_col = self.ident()
                if self.cur.kind == "IDENT" and self.cur.value.upper() == "PRECISION":
                    self.advance()
                    precision = self.advance().value.upper()
            elif word in ("TAGS", "FIELDS"):
                self.advance()
                self.expect_op("(")
                target = tags if word == "TAGS" else fields
                while not self.at_op(")"):
                    target.append((self.ident(), self.ident().upper()))
                    self.eat_op(",")
                self.expect_op(")")
            elif word == "SHARDS":
                self.advance()
                shards = int(self.advance().value)
            elif word == "RETENTION":
                self.advance()
                retention_ms = self._parse_ts_duration_ms()
            elif word in ("COMPACTION_INTERVAL", "COMPACTION"):
                self.advance()
                if self.cur.kind == "IDENT":  # INTERVAL keyword spelling
                    self.advance()
                self._parse_ts_duration_ms()  # accepted, no-op on Spark
            else:
                break
        return ast.CreateTimeSeriesTypeStmt(
            name=name, if_not_exists=if_not_exists, timestamp_col=ts_col,
            precision=precision, tags=tuple(tags), fields=tuple(fields),
            shards=shards, retention_ms=retention_ms,
        )

    def parse_alter(self) -> ast.Statement:
        # ALTER TIMESERIES TYPE name ADD DOWNSAMPLING POLICY
        #   (AFTER n unit GRANULARITY n unit)+ | DROP DOWNSAMPLING POLICY
        # ALTER TYPE name <attr> <value> (AlterTypeStatement.java:28)
        # ALTER PROPERTY type.prop <setting> <value> | CUSTOM k = v
        # ALTER BUCKET name <attr> <value> (AlterBucketStatement.java —
        #   the reference's own executeDDL throws UnsupportedOperation)
        self.advance()  # ALTER
        if self.at_kw("TYPE"):
            return self._parse_alter_type()
        if self.at_kw("PROPERTY") or (
            self.cur.kind == "IDENT" and self.cur.value.upper() == "PROPERTY"
        ):
            return self._parse_alter_property()
        if self.cur.kind == "IDENT" and self.cur.value.upper() == "BUCKET":
            raise ParseError(
                "ALTER BUCKET is not supported (the reference's own "
                "AlterBucketStatement.executeDDL throws "
                "UnsupportedOperationException — AlterBucketStatement."
                "java:92); buckets here are parquet partitions"
            )
        if self.cur.kind == "IDENT" and self.cur.value.upper() == "DATABASE":
            # ALTER DATABASE `setting.key` <value>
            # (AlterDatabaseStatement.java → GlobalConfiguration): the
            # setting is recorded; Spark has no page/WAL knobs to apply
            self.advance()
            key = str(self.advance().value)
            v = self.parse_expr()
            return ast.AlterDatabaseStmt(
                key=key, value=v.value if isinstance(v, ast.Lit) else v
            )
        if not (self.cur.kind == "IDENT" and self.cur.value.upper() == "TIMESERIES"):
            raise ParseError(
                "Expected TYPE, PROPERTY or TIMESERIES after ALTER"
            )
        self.advance()
        self.expect_kw("TYPE")
        name = self.ident()
        action = self.advance().value.upper() if self.cur.kind in ("IDENT", "KEYWORD") else ""
        if action == "DROP":
            self.advance()  # DOWNSAMPLING
            self.advance()  # POLICY
            return ast.AlterTimeSeriesTypeStmt(name=name, drop_policy=True)
        if action != "ADD":
            raise ParseError("Expected ADD or DROP DOWNSAMPLING POLICY")
        self.advance()  # DOWNSAMPLING
        self.advance()  # POLICY
        tiers: list = []
        while self.cur.kind == "IDENT" and self.cur.value.upper() == "AFTER":
            self.advance()
            after_ms = self._parse_ts_duration_ms()
            if not (self.cur.kind == "IDENT" and self.cur.value.upper() == "GRANULARITY"):
                raise ParseError("Expected GRANULARITY in downsampling tier")
            self.advance()
            gran_ms = self._parse_ts_duration_ms()
            tiers.append((after_ms, gran_ms))
        if not tiers:
            raise ParseError("ADD DOWNSAMPLING POLICY needs ≥1 AFTER…GRANULARITY tier")
        return ast.AlterTimeSeriesTypeStmt(name=name, add_tiers=tuple(tiers))

    def _parse_alter_type(self) -> ast.AlterTypeStmt:
        self.expect_kw("TYPE")
        name = self.ident()
        if self.cur.kind == "IDENT" and self.cur.value.upper() == "CUSTOM":
            self.advance()
            ck = self.ident()
            self.expect_op("=")
            cv = self._literal_token_value()
            return ast.AlterTypeStmt(name=name, custom_key=ck,
                                     custom_value=cv)
        attr = (
            self.advance().value.lower()
            if self.cur.kind in ("IDENT", "KEYWORD")
            else ""
        )
        if attr == "name":
            return ast.AlterTypeStmt(name=name, attr="name",
                                     value=self.ident())
        if attr in ("supertype", "bucket"):
            pairs: list = []
            while True:
                add = True
                if self.at_op("+"):
                    self.advance()
                elif self.at_op("-"):
                    self.advance()
                    add = False
                pairs.append((add, self.ident()))
                if not self.eat_op(","):
                    break
            return ast.AlterTypeStmt(name=name, attr=attr,
                                     add_remove=tuple(pairs))
        if attr == "bucketselectionstrategy":
            strat = self.ident()
            if self.at_op("("):
                # strategy arguments, e.g. partitioned('key') — captured
                # verbatim into the stored value
                depth = 0
                parts = [strat]
                while True:
                    t = self.advance()
                    parts.append(str(t.value))
                    if t.kind == "OP" and t.value == "(":
                        depth += 1
                    elif t.kind == "OP" and t.value == ")":
                        depth -= 1
                        if depth == 0:
                            break
                strat = "".join(parts)
            return ast.AlterTypeStmt(name=name,
                                     attr="bucketselectionstrategy",
                                     value=strat)
        raise ParseError(
            f"ALTER TYPE attribute '{attr}' not valid — supported: NAME, "
            "SUPERTYPE, BUCKET, BUCKETSELECTIONSTRATEGY, CUSTOM"
        )

    def _parse_alter_property(self) -> ast.AlterPropertyStmt:
        self.advance()  # PROPERTY
        tname = self.ident()
        self.expect_op(".")
        prop = self.ident()
        if self.cur.kind == "IDENT" and self.cur.value.upper() == "CUSTOM":
            self.advance()
            ck = self.ident()
            self.expect_op("=")
            return ast.AlterPropertyStmt(
                type_name=tname, prop=prop, custom_key=ck,
                custom_value=self._literal_token_value(),
            )
        setting = self.advance().value.lower() \
            if self.cur.kind in ("IDENT", "KEYWORD") else ""
        if setting not in (
            "mandatory", "notnull", "readonly", "hidden", "min", "max",
            "default", "regexp", "name",
        ):
            raise ParseError(
                f"ALTER PROPERTY setting '{setting}' not supported "
                "(AlterPropertyStatement.java settings: mandatory notnull "
                "readonly hidden min max default regexp)"
            )
        self.eat_op("=")  # optional '=' accepted
        v = self.parse_expr()  # DEFAULT sysDate() — full expression form
        return ast.AlterPropertyStmt(
            type_name=tname, prop=prop, setting=setting,
            value=v.value if isinstance(v, ast.Lit) else v,
        )

    def _parse_import_export(self):
        """IMPORT/EXPORT DATABASE <url> [WITH k = v, …]
        (ImportDatabaseStatement.java, ExportDatabaseStatement.java).
        The URL may be quoted or bare (file:///x, http://…) — bare URLs
        are taken verbatim from the source text up to WITH/end."""
        kind = self.advance().value.upper()  # IMPORT | EXPORT
        if not (self.cur.kind in ("IDENT", "KEYWORD")
                and str(self.cur.value).upper() == "DATABASE"):
            raise ParseError(f"Expected DATABASE after {kind}")
        self.advance()
        url = None
        opts: list = []
        if self.cur.kind == "STRING":
            url = self.advance().value
            opts = self._parse_with_opts()
        elif not (
            self.cur.kind == "EOF"
            or (self.cur.kind in ("IDENT", "KEYWORD")
                and str(self.cur.value).upper() == "WITH")
        ):
            # bare URL (file:///x, http://…): `//` lexes as a line
            # comment, so the URL and everything after it may be absent
            # from the token stream — parse this tail from the raw text
            import re as _re

            raw = self.text[self.cur.pos:]
            m = _re.search(r"\bWITH\b", raw, _re.IGNORECASE)
            url = (raw[:m.start()] if m else raw).strip().rstrip(";")
            if not url:
                raise ParseError(f"Expected a URL after {kind} DATABASE")
            while self.cur.kind != "EOF":
                self.advance()  # tail was consumed from raw text
            if m:
                sub = Parser(raw[m.end():])
                opts = sub._parse_with_opts(already_in_with=True)
        else:
            opts = self._parse_with_opts()
        if kind == "IMPORT":
            if url is None and not opts:
                raise ParseError("IMPORT DATABASE needs a URL or WITH opts")
            return ast.ImportDatabaseStmt(url=url, options=tuple(opts))
        if url is None:
            raise ParseError("EXPORT DATABASE needs a target URL")
        return ast.ExportDatabaseStmt(url=url, options=tuple(opts))

    def _parse_create_edge(self) -> "ast.CreateEdgeStmt":
        self.advance()  # EDGE
        etype = self.ident()
        if_not_exists = self._eat_if_not_exists()
        uni = False
        if self.cur.kind == "IDENT" \
                and self.cur.value.upper() == "UNIDIRECTIONAL":
            self.advance()
            uni = True

        def _endpoint():
            if self.at_op("("):
                self.advance()
                stmt = self.parse_statement()  # (SELECT …)
                self.expect_op(")")
                return stmt
            if self.cur.kind == "RID":
                b, pos = self.advance().value.lstrip("#").split(":")
                return ast.RidLit(int(b), int(pos))
            if self.at_op("?") or self.cur.kind == "PARAM":
                if self.cur.kind == "PARAM":
                    return ast.Param(str(self.advance().value))
                self.advance()
                name = str(self._positional)
                self._positional += 1
                return ast.Param(name)
            if self.at_op("["):
                self.advance()
                rids = []
                while not self.at_op("]"):
                    if self.cur.kind != "RID":
                        raise ParseError(
                            f"Expected a RID in endpoint list at {self.cur!r}"
                        )
                    b, pos = self.advance().value.lstrip("#").split(":")
                    rids.append(ast.RidLit(int(b), int(pos)))
                    self.eat_op(",")
                self.expect_op("]")
                return tuple(rids)
            raise ParseError(
                f"CREATE EDGE endpoint must be (SELECT …), a RID or a "
                f"RID list — got {self.cur!r}"
            )

        if not (self.cur.kind == "KEYWORD" and self.cur.value == "FROM"):
            raise ParseError("Expected FROM in CREATE EDGE")
        self.advance()
        src = _endpoint()
        if not (self.cur.kind in ("IDENT", "KEYWORD")
                and str(self.cur.value).upper() == "TO"):
            raise ParseError("Expected TO in CREATE EDGE")
        self.advance()
        dst = _endpoint()
        sets: list = []
        if self.at_kw("SET"):
            self.advance()
            while True:
                prop = self.ident()
                self.expect_op("=")
                sets.append((prop, self.parse_expr()))
                if not self.eat_op(","):
                    break
        # trailing IF NOT EXISTS / UNIDIRECTIONAL (CreateEdgeStatement
        # grammar order tolerates both positions)
        if self.cur.kind == "IDENT" \
                and self.cur.value.upper() == "UNIDIRECTIONAL":
            self.advance()
            uni = True
        if_not_exists = self._eat_if_not_exists() or if_not_exists
        return ast.CreateEdgeStmt(
            etype=etype, src=src, dst=dst, sets=tuple(sets),
            if_not_exists=if_not_exists, unidirectional=uni,
        )

    def _parse_with_opts(self, already_in_with: bool = False) -> list:
        """``WITH k = v (, k = v)*`` (parens tolerated) → (k, v) list."""
        if not already_in_with:
            if not (self.cur.kind in ("IDENT", "KEYWORD")
                    and str(self.cur.value).upper() == "WITH"):
                return []
            self.advance()
        paren = self.eat_op("(")
        opts: list = []
        while True:
            k = self.ident()
            self.expect_op("=")
            opts.append((k, self._literal_token_value()))
            if not self.eat_op(","):
                break
        if paren:
            self.expect_op(")")
        return opts

    def _parse_check_database(self):
        """CHECK DATABASE [TYPE t (, t)*] [FIX]
        (CheckDatabaseStatement.java)."""
        self.advance()  # CHECK
        if not (self.cur.kind in ("IDENT", "KEYWORD")
                and str(self.cur.value).upper() == "DATABASE"):
            raise ParseError("Expected DATABASE after CHECK")
        self.advance()
        types: list = []
        if self.at_kw("TYPE"):
            self.advance()
            types.append(self.ident())
            while self.eat_op(","):
                types.append(self.ident())
        fix = False
        if self.cur.kind in ("IDENT", "KEYWORD") \
                and str(self.cur.value).upper() == "FIX":
            self.advance()
            fix = True
        return ast.CheckDatabaseStmt(types=tuple(types), fix=fix)

    def _literal_token_value(self):
        """One literal value for DDL settings: number, string, bool,
        null, or a bare identifier (stored as its string)."""
        neg = False
        if self.at_op("-"):
            self.advance()
            neg = True
        t = self.advance()
        v = t.value
        if t.kind == "INT":
            v = int(v)
            return -v if neg else v
        if t.kind == "FLOAT":
            v = float(v)
            return -v if neg else v
        if t.kind == "STRING":
            return v
        if t.kind in ("IDENT", "KEYWORD"):
            u = str(v).upper()
            if u == "TRUE":
                return True
            if u == "FALSE":
                return False
            if u == "NULL":
                return None
            return str(v)
        raise ParseError(f"Expected a literal value, got {t!r}")

    def parse_create(self) -> ast.Statement:
        self.expect_kw("CREATE")
        if self.cur.kind == "IDENT" and self.cur.value.upper() == "TIMESERIES":
            return self.parse_create_timeseries()
        if self.at_kw("EDGE") and not (
            self.peek().kind == "KEYWORD" and self.peek().value == "TYPE"
        ):
            # CREATE EDGE <type> FROM <ep> TO <ep> [SET …]
            # (parser/CreateEdgeStatement.java)
            return self._parse_create_edge()
        if self.at_kw("VERTEX", "DOCUMENT") and not (
            self.peek().kind == "KEYWORD" and self.peek().value == "TYPE"
        ):
            # CREATE VERTEX <type|bucket:b> [SET k = v, …] / (f,…) VALUES
            # / CONTENT {…}|[…] — sugar for INSERT
            # (parser/CreateVertexStatement.java; same executor, so the
            # vertex lands in BOTH the catalog table and the graph)
            self.advance()
            tname = self.ident()
            bucket_name = None
            if tname.lower() == "bucket" and self.cur.kind == "PARAM":
                bucket_name = str(self.advance().value)
                tname = ""
            sets: list = []
            fields: list[str] = []
            values_rows: list[tuple] = []
            content = None
            content_rows = None
            if self.at_op("("):
                self.advance()
                while not self.at_op(")"):
                    fields.append(self.ident())
                    self.eat_op(",")
                self.expect_op(")")
                self.expect_kw("VALUES")
                while self.at_op("("):
                    self.advance()
                    row = [self.parse_expr()]
                    while self.eat_op(","):
                        row.append(self.parse_expr())
                    self.expect_op(")")
                    values_rows.append(tuple(row))
                    if not self.eat_op(","):
                        break
            elif self.at_kw("CONTENT"):
                self.advance()
                m = self.parse_primary()
                if isinstance(m, ast.ArrayLit):
                    content_rows = m
                elif isinstance(m, (ast.MapLit, ast.Param)):
                    content = m
                else:
                    raise ParseError("CONTENT requires a JSON object")
            elif self.at_kw("SET"):
                self.advance()
                while True:
                    prop = self.ident()
                    self.expect_op("=")
                    sets.append((prop, self.parse_expr()))
                    if not self.eat_op(","):
                        break
            return ast.InsertStmt(
                type_name=tname, bucket_name=bucket_name,
                fields=tuple(fields), values_rows=tuple(values_rows),
                set_items=tuple(sets), content=content,
                content_rows=content_rows,
            )
        if self.at_kw("DOCUMENT", "VERTEX", "EDGE", "TYPE"):
            kind = "document"
            if self.at_kw("DOCUMENT", "VERTEX", "EDGE"):
                kind = self.advance().value.lower()
            self.expect_kw("TYPE")
            name = self.ident()
            if_not_exists = self._eat_if_not_exists()
            extends = None
            buckets = None
            bucket_names: list[str] = []
            custom: list[tuple] = []
            while True:
                if self.at_kw("EXTENDS"):
                    self.advance()
                    extends = self.ident()
                    while self.eat_op(","):
                        self.ident()  # extra supertypes accepted
                elif self.cur.kind == "IDENT" and self.cur.value.upper() == "BUCKETS":
                    self.advance()
                    buckets = int(self.advance().value)
                elif self.cur.kind == "IDENT" and self.cur.value.upper() == "BUCKET":
                    # CREATE … TYPE <n> BUCKET b1[,b2…] — named bucket
                    # association (parser/CreateTypeAbstractStatement
                    # bucket list)
                    self.advance()
                    bucket_names.append(self.ident())
                    while self.eat_op(","):
                        bucket_names.append(self.ident())
                elif self.cur.kind == "IDENT" and self.cur.value.upper() in (
                    "UNIDIRECTIONAL", "BIDIRECTIONAL", "LIGHTWEIGHT",
                ) and kind == "edge":
                    # CREATE EDGE TYPE … UNIDIRECTIONAL (schema/
                    # LocalEdgeType bidirectional flag) — storage here is
                    # a (src, dst) table either way; accepted, recorded
                    # by the executor via the statement text elsewhere
                    self.advance()
                elif self.cur.kind == "IDENT" \
                        and self.cur.value.upper() == "PAGESIZE":
                    # page sizing has no Spark analog (parquet blocks) —
                    # accepted for grammar parity
                    self.advance()
                    self.advance()
                elif self.cur.kind == "IDENT" \
                        and self.cur.value.upper() == "CUSTOM":
                    # CUSTOM k = v[, …] metadata
                    # (CreateTypeAbstractStatement custom map)
                    self.advance()
                    while True:
                        ck = self.ident()
                        self.expect_op("=")
                        custom.append((ck, self.parse_expr()))
                        if not self.eat_op(","):
                            break
                else:
                    break
            return ast.CreateTypeStmt(
                kind=kind, name=name, if_not_exists=if_not_exists,
                extends=extends, buckets=buckets,
                bucket_names=tuple(bucket_names), custom=tuple(custom),
            )
        if self.at_kw("PROPERTY"):
            self.advance()
            tname = self.ident()
            self.expect_op(".")
            prop = self.ident()
            if_not_exists = self._eat_if_not_exists()
            dtype = self.ident()
            of_type = None
            if (
                self.cur.kind in ("IDENT", "KEYWORD")
                and str(self.cur.value).upper() == "OF"
            ):
                # LINK OF <Type> / LIST OF <TYPE> / MAP OF <TYPE>
                # (parser/CreatePropertyStatement ofType)
                self.advance()
                of_type = self.ident()
            constraints: dict = {}
            if self.at_op("("):
                # (MANDATORY true, NOTNULL true, DEFAULT x, MIN n, MAX n,
                # REGEXP 'p') — DocumentValidator.java constraint set;
                # a bare flag (hidden) defaults to true
                self.advance()
                while not self.at_op(")"):
                    key = self.ident().lower()
                    if self.at_op(",") or self.at_op(")"):
                        constraints[key] = True
                    else:
                        val = self.parse_expr()
                        constraints[key] = (
                            val.value if isinstance(val, ast.Lit) else val
                        )
                    self.eat_op(",")
                self.expect_op(")")
            if self.cur.kind == "IDENT" \
                    and self.cur.value.upper() == "CUSTOM":
                # CREATE PROPERTY … CUSTOM k = v[, …] metadata
                self.advance()
                cust: dict = {}
                while True:
                    ck = self.ident()
                    self.expect_op("=")
                    cv = self.parse_expr()
                    cust[ck] = cv.value if isinstance(cv, ast.Lit) else cv
                    if not self.eat_op(","):
                        break
                constraints["custom"] = tuple(cust.items())
            if of_type is not None:
                constraints.setdefault("of", of_type)
            return ast.CreatePropertyStmt(
                type_name=tname, prop=prop, dtype=dtype,
                if_not_exists=if_not_exists, constraints=tuple(constraints.items()),
            )
        if self.cur.kind == "IDENT" and self.cur.value.upper() == "GRAPH":
            # CREATE GRAPH ANALYTICAL VIEW [IF NOT EXISTS] name
            #   [VERTEX TYPES (…)] [EDGE TYPES (…)] [PROPERTIES (…)]
            #   [EDGE PROPERTIES (…)] [UPDATE MODE X] [COMPACTION THRESHOLD n]
            # (CreateGraphAnalyticalViewStatement.java grammar)
            self.advance()  # GRAPH
            self.advance()  # ANALYTICAL
            self.advance()  # VIEW
            if_not_exists = self._eat_if_not_exists()
            name = self.ident()
            if_not_exists = if_not_exists or self._eat_if_not_exists()
            vt: list[str] = []
            et: list[str] = []
            props: list[str] = []
            eprops: list[str] = []
            mode = "OFF"
            threshold = -1

            def _ident_list(out: list) -> None:
                self.expect_op("(")
                while not self.at_op(")"):
                    out.append(self.ident())
                    self.eat_op(",")
                self.expect_op(")")

            while self.cur.kind in ("IDENT", "KEYWORD"):
                word = self.cur.value.upper()
                if word == "VERTEX":
                    self.advance()
                    self.advance()  # TYPES
                    _ident_list(vt)
                elif word == "EDGE":
                    self.advance()
                    nxt = self.cur.value.upper()
                    self.advance()  # TYPES / PROPERTIES
                    _ident_list(et if nxt == "TYPES" else eprops)
                elif word == "PROPERTIES":
                    self.advance()
                    _ident_list(props)
                elif word == "UPDATE":
                    self.advance()
                    self.advance()  # MODE
                    mode = self.ident().upper()
                elif word == "COMPACTION":
                    self.advance()
                    self.advance()  # THRESHOLD
                    threshold = int(self.advance().value)
                else:
                    break
            return ast.CreateGavStmt(
                name=name, vertex_types=tuple(vt), edge_types=tuple(et),
                properties=tuple(props), edge_properties=tuple(eprops),
                update_mode=mode, compaction_threshold=threshold,
                if_not_exists=if_not_exists,
            )
        if self.cur.kind == "IDENT" and self.cur.value.upper() in (
            "MATERIALIZED", "CONTINUOUS",
        ):
            # CREATE MATERIALIZED VIEW name AS select [REFRESH …]
            # CREATE CONTINUOUS AGGREGATE name AS select
            kind = self.advance().value.upper()
            self.advance()  # VIEW / AGGREGATE
            name = self.ident()
            if_not_exists = self._eat_if_not_exists()
            self.expect_kw("AS")
            select = self.parse_select()
            refresh = "MANUAL"
            if self.cur.kind == "IDENT" and self.cur.value.upper() == "REFRESH":
                self.advance()
                parts = []
                while self.cur.kind in ("IDENT", "INT", "KEYWORD") and self.cur.kind != "EOF":
                    parts.append(self.advance().value)
                refresh = " ".join(str(p) for p in parts)
            return ast.CreateMaterializedViewStmt(
                name=name, select=select, refresh_mode=refresh,
                if_not_exists=if_not_exists,
            )
        if self.cur.kind == "IDENT" and self.cur.value.upper() == "TRIGGER":
            # CREATE TRIGGER name BEFORE|AFTER event ON TYPE t
            # EXECUTE SQL '<stmt>'  (CreateTriggerStatement.java)
            self.advance()
            name = self.ident()
            if_not_exists = self._eat_if_not_exists()
            timing = self.ident().upper()
            event = self.advance().value.upper()  # CREATE lexes as keyword
            if self.advance().value.upper() != "ON":  # ON lexes as IDENT
                raise ParseError("CREATE TRIGGER expects ON TYPE <type>")
            self.expect_kw("TYPE")
            tname = self.ident()
            if not (self.cur.kind == "IDENT"
                    and self.cur.value.upper() == "EXECUTE"):
                raise ParseError("CREATE TRIGGER expects EXECUTE <lang>")
            self.advance()
            lang = self.ident().upper()
            code_tok = self.advance()
            if code_tok.kind != "STRING":
                raise ParseError("Trigger code must be a string literal")
            return ast.CreateTriggerStmt(
                name=name, timing=timing, event=event, type_name=tname,
                language=lang, code=code_tok.value,
                if_not_exists=if_not_exists,
            )
        if self.at_kw("INDEX"):
            self.advance()
            # CREATE INDEX [name] [IF NOT EXISTS] ON type (props) [kind]
            tname = None
            props: list[str] = []
            kind = None
            saw_on = False
            while self.cur.kind != "EOF":
                if self.at_op("("):
                    self.advance()
                    while not self.at_op(")"):
                        props.append(self.ident())
                        self.eat_op(",")
                    self.expect_op(")")
                    continue
                tok = self.advance()
                word = tok.value.upper() if tok.kind in ("IDENT", "KEYWORD") else ""
                if word == "ON":
                    saw_on = True
                elif saw_on and tname is None and tok.kind in ("IDENT", "KEYWORD"):
                    tname = tok.value
                elif props and tok.kind in ("IDENT", "KEYWORD"):
                    kind = tok.value  # UNIQUE / FULL_TEXT / NOTUNIQUE …
            return ast.CreateIndexStmt(
                type_name=tname, props=tuple(props), index_kind=kind
            )
        if self.cur.kind == "IDENT" and self.cur.value.upper() == "BUCKET":
            # CREATE BUCKET <name> [IF NOT EXISTS]
            # (parser/CreateBucketStatement.java)
            self.advance()
            name = self.ident()
            return ast.CreateBucketStmt(
                name=name, if_not_exists=self._eat_if_not_exists()
            )
        raise ParseError(f"Unsupported CREATE statement at {self.cur!r}")

    def _eat_if_not_exists(self) -> bool:
        if self.at_kw("IF"):
            self.advance()
            self.expect_kw("NOT")
            self.expect_kw("EXISTS")
            return True
        return False

    def parse_drop(self):
        self.expect_kw("DROP")
        if self.cur.kind == "IDENT" and self.cur.value.upper() in (
            "MATERIALIZED", "CONTINUOUS",
        ):
            self.advance()
            self.advance()  # VIEW / AGGREGATE
            name = self.ident()
            if_exists = False
            if self.at_kw("IF"):
                self.advance()
                self.expect_kw("EXISTS")
                if_exists = True
            return ast.DropMaterializedViewStmt(name=name, if_exists=if_exists)
        if self.cur.kind == "IDENT" and self.cur.value.upper() == "GRAPH":
            self.advance()
            self.advance()  # ANALYTICAL
            self.advance()  # VIEW
            name = self.ident()
            if_exists = False
            if self.at_kw("IF"):
                self.advance()
                self.expect_kw("EXISTS")
                if_exists = True
            return ast.DropGavStmt(name=name, if_exists=if_exists)
        if self.cur.kind == "IDENT" and self.cur.value.upper() == "TRIGGER":
            self.advance()
            name = self.ident()
            if_exists = False
            if self.at_kw("IF"):
                self.advance()
                self.expect_kw("EXISTS")
                if_exists = True
            return ast.DropTriggerStmt(name=name, if_exists=if_exists)
        if self.cur.kind == "IDENT" and self.cur.value.upper() == "BUCKET":
            # DROP BUCKET <name|id> (parser/DropBucketStatement.java)
            self.advance()
            name = str(self.advance().value)  # IDENT or INT id
            if_exists = False
            if self.at_kw("IF"):
                self.advance()
                self.expect_kw("EXISTS")
                if_exists = True
            return ast.DropBucketStmt(name=name, if_exists=if_exists)
        if self.at_kw("PROPERTY"):
            # DROP PROPERTY Type.prop (DropPropertyStatement.java)
            self.advance()
            tname = self.ident()
            self.expect_op(".")
            prop = self.ident()
            if_exists = False
            if self.at_kw("IF"):
                self.advance()
                self.expect_kw("EXISTS")
                if_exists = True
            if self.cur.kind == "IDENT" \
                    and self.cur.value.upper() == "FORCE":
                self.advance()  # FORCE drops dependent indexes — no-op
            return ast.DropPropertyStmt(
                type_name=tname, prop=prop, if_exists=if_exists
            )
        if self.at_kw("INDEX") or (
            self.cur.kind == "IDENT" and self.cur.value.upper() == "INDEX"
        ):
            # DROP INDEX <name> (DropIndexStatement.java); backticked
            # names carry the Type[props] spelling
            self.advance()
            name = str(self.advance().value)
            if_exists = False
            if self.at_kw("IF"):
                self.advance()
                self.expect_kw("EXISTS")
                if_exists = True
            return ast.DropIndexStmt(name=name, if_exists=if_exists)
        self.expect_kw("TYPE")
        name = self.ident()
        if_exists = False
        if self.at_kw("IF"):
            self.advance()
            self.expect_kw("EXISTS")
            if_exists = True
        while self.cur.kind == "KEYWORD" or (
            self.cur.kind == "IDENT" and self.cur.value.upper() == "UNSAFE"
        ):  # UNSAFE etc.
            self.advance()
        return ast.DropTypeStmt(name=name, if_exists=if_exists)

    def parse_define_function(self) -> ast.DefineFunctionStmt:
        self.advance()  # DEFINE
        tok = self.advance()  # FUNCTION
        if tok.value.upper() != "FUNCTION":
            raise ParseError("Expected FUNCTION after DEFINE")
        lib = self.ident()
        self.expect_op(".")
        name = self.ident()
        body_tok = self.advance()
        if body_tok.kind != "STRING":
            raise ParseError("DEFINE FUNCTION body must be a string literal")
        parameters: list[str] = []
        language = "sql"
        while self.cur.kind != "EOF":
            word = self.cur.value.upper() if self.cur.kind in ("IDENT", "KEYWORD") else ""
            if word == "PARAMETERS":
                self.advance()
                self.expect_op("[")
                while not self.at_op("]"):
                    parameters.append(self.ident())
                    self.eat_op(",")
                self.expect_op("]")
            elif word == "LANGUAGE":
                self.advance()
                language = self.ident().lower()
            else:
                break
        return ast.DefineFunctionStmt(
            lib=lib, name=name, body=body_tok.value,
            parameters=tuple(parameters), language=language,
        )

    def parse_truncate(self) -> ast.TruncateTypeStmt:
        self.advance()  # TRUNCATE
        if self.cur.kind == "IDENT" and self.cur.value.upper() == "BUCKET":
            # TRUNCATE BUCKET <name|id> (parser/TruncateBucketStatement)
            self.advance()
            if self.cur.kind == "INT":
                return ast.TruncateBucketStmt(name=str(self.advance().value))
            return ast.TruncateBucketStmt(name=self.ident())
        if self.cur.kind == "IDENT" and self.cur.value.upper() == "RECORD":
            # TRUNCATE RECORD #b:p[, #b:p…] (TruncateRecordStatement.java)
            self.advance()
            rids = []
            bracket = self.eat_op("[")
            while self.cur.kind == "RID":
                b, pos = self.advance().value.lstrip("#").split(":")
                rids.append((int(b), int(pos)))
                self.eat_op(",")
            if bracket:
                self.expect_op("]")
            if not rids:
                raise ParseError("TRUNCATE RECORD expects a RID")
            return ast.TruncateRecordStmt(rids=tuple(rids))
        self.expect_kw("TYPE")
        name = self.ident()
        while self.cur.kind == "KEYWORD" or (
            self.cur.kind == "IDENT"
            and self.cur.value.upper() in ("POLYMORPHIC", "UNSAFE")
        ):  # POLYMORPHIC / UNSAFE modifiers
            self.advance()
        return ast.TruncateTypeStmt(name=name)

    # SELECT --------------------------------------------------------------
    def parse_select(self) -> ast.SelectStmt:
        self.expect_kw("SELECT")
        distinct = self.eat_kw("DISTINCT")
        projections: list[ast.ProjItem] = []
        if not self.at_kw("FROM") and self.cur.kind != "EOF" and not self.at_op(")"):
            projections = self.parse_projection_list()
        # OrientDB-legacy `SELECT distinct(x)` means row-level DISTINCT.
        if (
            len(projections) == 1
            and isinstance(projections[0].expr, ast.FuncCall)
            and projections[0].expr.name.lower() == "distinct"
            and len(projections[0].expr.args) == 1
        ):
            distinct = True
            projections = [
                ast.ProjItem(projections[0].expr.args[0], projections[0].alias)
            ]

        target: ast.Target = None
        if self.eat_kw("FROM"):
            target = self.parse_target()

        lets: list[ast.LetItem] = []
        if self.eat_kw("LET"):
            lets.append(self.parse_let_item())
            while self.eat_op(","):
                lets.append(self.parse_let_item())

        where = None
        if self.eat_kw("WHERE"):
            where = self.parse_expr()

        group_by: list[ast.Expr] = []
        order_by: list[ast.OrderItem] = []
        unwind: list[ast.UnwindItem] = []
        skip = None
        limit = None
        having = None
        while True:
            if self.at_kw("GROUP"):
                self.advance()
                self.expect_kw("BY")
                group_by.append(self.parse_expr())
                while self.eat_op(","):
                    group_by.append(self.parse_expr())
            elif self.at_kw("ORDER"):
                self.advance()
                self.expect_kw("BY")
                order_by.append(self.parse_order_item())
                while self.eat_op(","):
                    order_by.append(self.parse_order_item())
            elif self.at_kw("UNWIND"):
                self.advance()
                unwind.append(self.parse_unwind_item())
                while self.eat_op(","):
                    unwind.append(self.parse_unwind_item())
            elif self.at_kw("SKIP", "OFFSET"):
                self.advance()
                skip = self.parse_expr()
            elif self.at_kw("LIMIT"):
                self.advance()
                limit = self.parse_expr()
            elif self.at_kw("TIMEOUT"):
                self.advance()
                self.parse_expr()  # accepted, ignored (no-op on Spark)
            elif self.at_kw("PARALLEL"):
                self.advance()  # Spark is always parallel
            elif (
                self.cur.kind in ("IDENT", "KEYWORD")
                and str(self.cur.value).upper() == "HAVING"
            ):
                # GROUP BY … HAVING <pred> — post-aggregation filter
                self.advance()
                having = self.parse_expr()
            else:
                break

        return ast.SelectStmt(
            projections=tuple(projections),
            distinct=distinct,
            target=target,
            lets=tuple(lets),
            where=where,
            group_by=tuple(group_by),
            order_by=tuple(order_by),
            unwind=tuple(unwind),
            skip=skip,
            limit=limit,
            having=having,
        )

    def parse_projection_list(self) -> list[ast.ProjItem]:
        items = [self.parse_projection_item()]
        while self.eat_op(","):
            items.append(self.parse_projection_item())
        return items

    def parse_projection_item(self) -> ast.ProjItem:
        if self.at_op("*"):
            self.advance()
            return ast.ProjItem(ast.Star())
        if self.at_op("!") and not self.cypher:
            # exclusion projection: SELECT *, !secret
            # (SQLParser.g4 exclude-projection)
            self.advance()
            return ast.ProjItem(
                ast.Unary("EXCLUDE", ast.Chain((str(self.advance().value),)))
            )
        start = self.cur.pos
        expr = self.parse_expr()
        if self.at_op(":") and self.peek().value == "{":
            expr = self._parse_nested_projection(expr)
        text = self.text[start:self.cur.pos].strip() if self.cypher else None
        alias = None
        if self.eat_kw("AS"):
            alias = self.ident()
        elif self.cur.kind == "IDENT" and not self.cypher:
            # SQL implicit alias (SELECT x y); Cypher requires AS — a
            # bare identifier there is the next clause (WITH a WITH * …)
            alias = self.ident()
        return ast.ProjItem(expr, alias, text)

    def _parse_nested_projection(self, base: ast.Expr) -> ast.NestedProj:
        """``expr:{a, b}`` / ``expr:{*, !x}`` / nested ``a:{b:{*}}``
        (SQLParser.g4:322-327).  An include item is a name or a
        (name, NestedProj-over-that-field) pair."""
        self.expect_op(":")
        self.expect_op("{")
        include: list = []
        exclude: list[str] = []
        while True:
            if self.at_op("*"):
                self.advance()
                include.append("*")
            elif self.at_op("!"):
                self.advance()
                ex = self.ident()
                if self.at_op("*"):
                    self.advance()
                    ex += "*"  # prefix pattern: !out_*
                exclude.append(ex)
            else:
                nm = self.ident()
                if self.at_op(":") and self.peek().kind == "OP" \
                        and self.peek().value == "{":
                    include.append(
                        (nm, self._parse_nested_projection(ast.Chain((nm,))))
                    )
                else:
                    include.append(nm)
            if not self.eat_op(","):
                break
        self.expect_op("}")
        return ast.NestedProj(base, tuple(include), tuple(exclude))

    def parse_target(self) -> ast.Target:
        tok = self.cur
        if self.at_kw("SELECT", "MATCH", "TRAVERSE"):
            # unparenthesized subquery target: select from select from t
            return ast.SubqueryTarget(self.parse_statement())
        if tok.kind == "PARAM":
            # SELECT FROM :seeds — a bound RID / RID-collection target
            # (Issue5505BoundRidCollectionTargetTest.java)
            self.advance()
            return ast.ParamTarget(str(tok.value))
        if tok.kind == "OP" and tok.value == "?":
            self.advance()
            name = str(self._positional)
            self._positional += 1
            return ast.ParamTarget(name)
        if tok.kind == "RID":
            rids = [self._rid_value(self.advance().value)]
            while self.eat_op(","):
                rids.append(self._rid_value(self.advance().value))
            return ast.RidTarget(tuple(rids))
        if self.at_op("["):
            self.advance()
            rids = []
            while not self.at_op("]"):
                if self.cur.kind == "EOF":
                    raise ParseError("Unterminated RID list")
                rids.append(self._rid_value(self.advance().value))
                self.eat_op(",")
            self.expect_op("]")
            return ast.RidTarget(tuple(rids))
        if self.at_op("("):
            self.advance()
            stmt = self.parse_statement()
            self.expect_op(")")
            alias = None
            if self.eat_kw("AS"):
                alias = self.ident()
            elif self.cur.kind == "IDENT":
                alias = self.ident()
            return ast.SubqueryTarget(stmt, alias)
        if tok.kind in ("IDENT", "KEYWORD") and str(tok.value).lower() in (
            "bucket", "schema", "index",
        ) and self.peek().kind == "PARAM":
            # `bucket:name` / `schema:types` / `index:name` lex as
            # IDENT PARAM — recombine (grammar tokens BUCKET_IDENTIFIER etc.)
            prefix = str(self.advance().value).lower()
            name = self.advance().value
            if prefix == "bucket":
                return ast.BucketTarget(name)
            if prefix == "schema":
                return ast.SchemaTarget(name)
            if prefix == "index":
                return ast.IndexTarget(str(name))
            raise ParseError(f"Unsupported FROM prefix '{prefix}:'")
        if tok.kind in ("IDENT", "KEYWORD") \
                and str(tok.value).lower() in ("bucket", "index", "schema") \
                and self.peek().kind == "OP" and self.peek().value == ":" \
                and self.peek(2).kind in ("IDENT", "STRING"):
            # backtick/quoted names split the prefix: index:`T1[k]`
            prefix = self.advance().value.lower()
            self.advance()
            name = str(self.advance().value)
            if prefix == "bucket":
                return ast.BucketTarget(name)
            if prefix == "schema":
                return ast.SchemaTarget(name)
            return ast.IndexTarget(name)
        if tok.kind in ("IDENT", "KEYWORD") \
                and str(tok.value).lower() == "bucket" \
                and self.peek().kind == "OP" and self.peek().value == ":" \
                and self.peek(2).kind == "OP" \
                and self.peek(2).value == "[":
            # bucket:[a, b] — multi-bucket union scan
            self.advance(); self.advance(); self.advance()
            names = []
            while not self.at_op("]"):
                if self.cur.kind == "EOF":
                    raise ParseError("Unterminated bucket list")
                names.append(str(self.advance().value))
                self.eat_op(",")
            self.expect_op("]")
            return ast.BucketTarget(tuple(names))
        if tok.kind in ("IDENT", "KEYWORD") \
                and str(tok.value).lower() == "bucket" \
                and self.peek().kind == "OP" and self.peek().value == ":" \
                and self.peek(2).kind == "INT":
            # bucket:<id> — numeric bucket id
            self.advance(); self.advance()
            return ast.BucketTarget(str(self.advance().value))
        if tok.kind == "IDENT" and tok.value.lower() == "bucket" \
                and self.peek().kind == "OP" and self.peek().value == ":" \
                and (self.peek(2).kind == "PARAM"
                     or self.peek(2).value == "?"):
            # bucket::<param> / bucket:? — parameterized bucket name
            self.advance()
            self.advance()
            if self.cur.kind == "PARAM":
                return ast.BucketTarget(ast.Param(str(self.advance().value)))
            self.advance()
            name = str(self._positional)
            self._positional += 1
            return ast.BucketTarget(ast.Param(name))
        if tok.kind == "IDENT" and self.peek().kind == "OP" \
                and self.peek().value == "(":
            # function-call target: SELECT FROM cypherRID(:id)
            # (SQLFunctionCypherRID.java, issue #4282)
            e = self.parse_primary()
            if not isinstance(e, ast.FuncCall):
                raise ParseError(f"Unsupported FROM target at {tok!r}")
            return ast.FuncTarget(e)
        name = self.ident()
        if self.eat_kw("AS"):
            self.ident()
        elif self.cur.kind == "IDENT" and self.cur.value.upper() not in (
            # statement-continuation words that lex as IDENT must not be
            # eaten as an implicit alias
            "REFRESH", "BATCH", "TIMEOUT", "UNSAFE", "POLYMORPHIC",
            "APPLY", "EXCEPTION", "NOCACHE", "FETCHPLAN", "LOCK",
            "BUCKET", "MAXDEPTH",
        ):
            # implicit table alias: SELECT ... FROM V v2 (the alias is
            # cosmetic — single-target dialect)
            self.advance()
        return ast.TypeTarget(name)

    @staticmethod
    def _rid_value(raw: str) -> ast.RidLit:
        body = raw.lstrip("#")
        bucket, pos = body.split(":")
        return ast.RidLit(int(bucket), int(pos))

    def parse_let_item(self) -> ast.LetItem:
        if self.cur.kind == "VAR":
            name = self.advance().value
        else:
            name = self.ident()
        self.expect_op("=")
        if self.at_op("(") and self.peek().kind == "KEYWORD" and self.peek().value in (
            "SELECT", "MATCH", "TRAVERSE",
        ):
            self.advance()
            stmt = self.parse_statement()
            self.expect_op(")")
            return ast.LetItem(name, subquery=stmt)
        return ast.LetItem(name, expr=self.parse_expr())

    def parse_order_item(self) -> ast.OrderItem:
        if self.at_op("("):
            # parenthesized item with the direction inside:
            # ORDER BY (something desc)
            save = self.i
            try:
                self.advance()
                expr = self.parse_expr()
                if self.eat_kw("DESC"):
                    asc = False
                elif self.eat_kw("ASC"):
                    asc = True
                else:
                    raise ParseError("no direction")
                self.expect_op(")")
                return ast.OrderItem(expr, asc)
            except ParseError:
                self.i = save
        expr = self.parse_expr()
        asc = True
        if self.eat_kw("DESC") or self._eat_ident("DESCENDING"):
            asc = False
        elif self.eat_kw("ASC") or self._eat_ident("ASCENDING"):
            pass
        elif not self.cypher and self.at_kw("TRUE", "FALSE"):
            # ORDER BY col true/false — boolean ascending flag
            # (reference TestOrderParam forms: true = ascending)
            asc = str(self.advance().value).upper() == "TRUE"
        elif not self.cypher and self.cur.kind == "PARAM":
            # ORDER BY col :dir — parameterized direction (TestOrderParam)
            asc = ast.Param(str(self.advance().value))
        return ast.OrderItem(expr, asc)

    def _eat_ident(self, word: str) -> bool:
        if self.cur.kind == "IDENT" and self.cur.value.upper() == word:
            self.advance()
            return True
        return False

    def _looks_like_pattern(self) -> bool:
        """At a ``(`` in expression position: does a relationship arrow
        follow the matching ``)``?  (Cypher pattern expressions.)"""
        if not hasattr(self, "_parse_pattern"):
            return False
        depth = 0
        j = self.i
        while j < len(self.tokens):
            t = self.tokens[j]
            if t.kind == "OP" and t.value == "(":
                depth += 1
            elif t.kind == "OP" and t.value == ")":
                depth -= 1
                if depth == 0:
                    nxt = self.tokens[min(j + 1, len(self.tokens) - 1)]
                    return nxt.kind == "OP" and nxt.value in ("-", "<", "--")
            elif t.kind == "EOF":
                return False
            j += 1
        return False

    def parse_unwind_item(self) -> ast.UnwindItem:
        expr = self.parse_expr()
        alias = None
        if self.eat_kw("AS"):
            alias = self.ident()
        elif self.cur.kind == "IDENT":
            alias = self.ident()
        return ast.UnwindItem(expr, alias)

    # MATCH ---------------------------------------------------------------
    def parse_match(self) -> ast.MatchStmt:
        self.expect_kw("MATCH")
        paths = [self.parse_match_path(False)]
        while self.eat_op(","):
            negated = self.eat_kw("NOT")
            paths.append(self.parse_match_path(negated))
        self.expect_kw("RETURN")
        distinct = self.eat_kw("DISTINCT")
        returns = self.parse_projection_list()
        group_by: list[ast.Expr] = []
        order_by: list[ast.OrderItem] = []
        skip = None
        limit = None
        while True:
            if self.at_kw("GROUP"):
                self.advance()
                self.expect_kw("BY")
                group_by.append(self.parse_expr())
                while self.eat_op(","):
                    group_by.append(self.parse_expr())
            elif self.at_kw("ORDER"):
                self.advance()
                self.expect_kw("BY")
                order_by.append(self.parse_order_item())
                while self.eat_op(","):
                    order_by.append(self.parse_order_item())
            elif self.at_kw("SKIP", "OFFSET"):
                self.advance()
                skip = self.parse_expr()
            elif self.at_kw("LIMIT"):
                self.advance()
                limit = self.parse_expr()
            else:
                break
        return ast.MatchStmt(
            paths=tuple(paths),
            returns=tuple(returns),
            distinct=distinct,
            group_by=tuple(group_by),
            order_by=tuple(order_by),
            skip=skip,
            limit=limit,
        )

    def parse_match_path(self, negated: bool) -> ast.MatchPath:
        root = self.parse_match_filter()
        steps: list[ast.MatchStep] = []
        while self.at_op(".", "-", "<"):
            if self.at_op("-", "<"):
                # arrow shorthand (MatchStatement.java arrow syntax):
                # -E->  out | <-E-  in | -E-  both | --> / <-- / --
                if self.eat_op("<"):
                    direction = "in"
                    self.expect_op("-")
                    etype = None
                    if self.cur.kind in ("IDENT", "STRING"):
                        etype = str(self.advance().value)
                    self.expect_op("-")
                else:
                    self.advance()  # '-'
                    etype = None
                    if self.cur.kind in ("IDENT", "STRING"):
                        etype = str(self.advance().value)
                    self.expect_op("-")
                    direction = "out" if self.eat_op(">") else "both"
                filt = ast.MatchFilter()
                if self.at_op("{"):
                    filt = self.parse_match_filter()
                steps.append(ast.MatchStep(
                    method=direction,
                    edge_types=(etype,) if etype else (),
                    filter=filt,
                ))
                continue
            self.advance()
            method = self.ident()
            if method.lower() not in _TRAVERSE_METHODS:
                raise ParseError(f"Unsupported MATCH method '{method}'")
            edge_types: list[str] = []
            self.expect_op("(")
            while not self.at_op(")"):
                if self.cur.kind == "EOF":
                    raise ParseError("Unterminated edge-type list")
                tok = self.advance()
                if tok.kind in ("STRING", "IDENT"):
                    edge_types.append(tok.value)
                self.eat_op(",")
            self.expect_op(")")
            filt = ast.MatchFilter()
            if self.at_op("{"):
                filt = self.parse_match_filter()
            steps.append(
                ast.MatchStep(
                    method=method.lower(), edge_types=tuple(edge_types), filter=filt
                )
            )
        return ast.MatchPath(root=root, steps=tuple(steps), negated=negated)

    def parse_match_filter(self) -> ast.MatchFilter:
        self.expect_op("{")
        type_name = None
        alias = None
        where = None
        optional = False
        while_ = None
        maxdepth = None
        while not self.at_op("}"):
            # Keys lex as IDENT or PARAM (`as: x` → IDENT(as)… but `as`
            # is a KEYWORD; `where: (...)` → KEYWORD(WHERE) then PARAM-like).
            tok = self.cur
            if tok.kind == "KEYWORD":
                key = self.advance().value.lower()
            elif tok.kind == "IDENT":
                key = self.advance().value.lower()
            else:
                raise ParseError(f"Bad match filter key {tok!r}")
            # `{type:Person}` (no space) lexes the value as a fused PARAM
            # token — accept it as ':' + identifier
            fused = None
            if self.cur.kind == "PARAM" and key not in ("rid",):
                fused = str(self.advance().value)
            else:
                self.expect_op(":")
            if key == "type":
                if fused is not None:
                    type_name = fused
                elif self.cur.kind in ("IDENT", "STRING", "KEYWORD"):
                    type_name = self.advance().value
                else:
                    raise ParseError(f"Bad type value {self.cur!r}")
            elif key == "as":
                alias = fused if fused is not None else self.ident()
            elif key == "bucket":
                # {bucket: <name|id>} — scan that bucket's owner type
                # (MatchStatement.java bucket filter); resolution is
                # deferred to the vertex-frame lookup
                if fused is not None:
                    bval = fused
                elif self.cur.kind in ("IDENT", "STRING", "INT"):
                    bval = str(self.advance().value)
                else:
                    raise ParseError(f"Bad bucket value {self.cur!r}")
                type_name = f"bucket:{bval}"
            elif key == "rid":
                # {rid: :param / #b:p} — identity filter
                # (MatchStatement.java rid filter)
                self.eat_op(":")
                if self.cur.kind == "PARAM":
                    rid_expr: ast.Expr = ast.Param(self.advance().value)
                elif self.cur.kind == "RID":
                    rid_expr = ast.Lit(self.advance().value)
                else:
                    rid_expr = self.parse_expr()
                cond = ast.Bin("=", ast.Chain(("@rid",)), rid_expr)
                where = cond if where is None else ast.Bin("AND", where, cond)
            elif key == "where":
                self.expect_op("(")
                w = self.parse_expr()
                self.expect_op(")")
                where = w if where is None else ast.Bin("AND", where, w)
            elif key == "while":
                self.expect_op("(")
                while_ = self.parse_expr()
                self.expect_op(")")
            elif key == "optional":
                v = fused if fused is not None else self.advance().value
                optional = str(v).upper() == "TRUE"
            elif key == "maxdepth":
                maxdepth = int(fused if fused is not None
                               else self.advance().value)
            else:
                raise ParseError(f"Unsupported match filter key '{key}'")
            self.eat_op(",")
        self.expect_op("}")
        return ast.MatchFilter(
            type_name=type_name,
            alias=alias,
            where=where,
            optional=optional,
            while_=while_,
            maxdepth=maxdepth,
        )

    # TRAVERSE ------------------------------------------------------------
    def parse_traverse(self) -> ast.TraverseStmt:
        self.expect_kw("TRAVERSE")
        projections: list[ast.Expr] = []
        if not self.at_kw("FROM"):
            if self.at_op("*"):
                self.advance()
                projections.append(ast.Star())
            else:
                projections.append(self.parse_expr())
            while self.eat_op(","):
                projections.append(self.parse_expr())
        self.expect_kw("FROM")
        target = self.parse_target()
        max_depth = None
        while_ = None
        limit = None
        strategy = "BREADTH_FIRST"
        while True:
            if self.at_kw("MAXDEPTH"):
                self.advance()
                max_depth = int(self.advance().value)
            elif self.at_kw("WHILE"):
                self.advance()
                while_ = self.parse_expr()
            elif self.at_kw("LIMIT"):
                self.advance()
                limit = self.parse_expr()
            elif self.at_kw("STRATEGY"):
                self.advance()
                strategy = self.advance().value.upper()
            else:
                break
        return ast.TraverseStmt(
            projections=tuple(projections),
            target=target,
            max_depth=max_depth,
            while_=while_,
            limit=limit,
            strategy=strategy,
        )

    # -- expressions ------------------------------------------------------
    def parse_expr(self) -> ast.Expr:
        return self.parse_or()

    def parse_or(self) -> ast.Expr:
        left = self.parse_xor()
        while self.at_kw("OR"):
            self.advance()
            left = ast.Bin("OR", left, self.parse_xor())
        return left

    def parse_xor(self) -> ast.Expr:
        # openCypher: OR < XOR < AND (XOR lexes as IDENT, not a keyword)
        left = self.parse_and()
        while self.cur.kind == "IDENT" and self.cur.value.upper() == "XOR":
            self.advance()
            left = ast.Bin("XOR", left, self.parse_and())
        return left

    def parse_and(self) -> ast.Expr:
        left = self.parse_not()
        while self.at_kw("AND"):
            self.advance()
            left = ast.Bin("AND", left, self.parse_not())
        return left

    def parse_not(self) -> ast.Expr:
        if self.at_kw("NOT"):
            self.advance()
            return ast.Unary("NOT", self.parse_not())
        return self.parse_comparison()

    def parse_comparison(self) -> ast.Expr:
        """Comparison level.  openCypher precedence: string/list/null
        predicates (IN, IS NULL, STARTS WITH, …) bind TIGHTER than
        comparison operators, and comparisons chain as conjunctions
        (``a < b < c`` ≡ ``a < b AND b < c`` — openCypher grammar
        ComparisonExpression / StringListNullPredicateExpression)."""
        left = self.parse_predicate()
        if not (self.cur.kind == "OP" and self.cur.value in _CMP_OPS):
            return left
        out = None
        prev = left
        while self.cur.kind == "OP" and self.cur.value in _CMP_OPS:
            op = self.advance().value
            right = self.parse_predicate()
            if op == "==":
                op = "="
            if op == "<>":
                op = "!="
            cmp_ = ast.Bin(op, prev, right)
            out = cmp_ if out is None else ast.Bin("AND", out, cmp_)
            prev = right
            if not self.cypher:
                break  # SQL dialect: single comparison, no chaining
        return out

    def parse_predicate(self) -> ast.Expr:
        left = self.parse_concat()
        while True:
            nxt = self._parse_one_postfix_predicate(left)
            if nxt is None:
                return left
            left = nxt

    def _parse_type_name_tail(self, tname: str) -> str:
        """Multi-word names (SIGNED INTEGER, LOCAL TIME), parameterized
        LIST<INNER> (GQL issue #3365), and the NOT NULL nullability
        suffix (null does not conform to a NOT NULL type)."""
        while self.cur.kind in ("IDENT", "KEYWORD") and (
            self.cur.value.upper() in (
                "INTEGER", "TIME", "DATETIME", "PRECISION",
            )
        ):
            tname = f"{tname} {self.advance().value}"
        if tname.upper() in ("LIST", "ARRAY") and self.at_op("<"):
            self.advance()
            if self.cur.kind not in ("IDENT", "KEYWORD"):
                raise ParseError(
                    f"Expected a type name in LIST<…> at {self.cur!r}"
                )
            inner = self._parse_type_name_tail(str(self.advance().value))
            self.expect_op(">")
            tname = f"{tname}<{inner}>"
        if self.at_kw("NOT") and self.peek().kind == "KEYWORD" \
                and self.peek().value.upper() == "NULL":
            self.advance()
            self.advance()
            tname = f"{tname} NOT NULL"
        return tname

    def _parse_one_postfix_predicate(self, left: ast.Expr) -> "ast.Expr | None":
        if self.at_kw("IS"):
            self.advance()
            negated = self.eat_kw("NOT")
            if self.eat_kw("NULL"):
                return ast.IsNull(left, negated)
            if self.eat_kw("DEFINED"):
                return ast.IsDefined(left, negated)
            if self.cypher and (
                self.at_op(":")
                or (self.cur.kind == "IDENT"
                    and self.cur.value.upper() == "TYPED")
            ):
                # x IS [NOT] :: TYPE / IS [NOT] TYPED TYPE (Cypher-25
                # type predicates — GQL spells both; the ':: T' lexes as
                # ':' + PARAM('T') through the SQL ':name' rule)
                if self.at_op(":"):
                    self.advance()
                else:
                    self.advance()  # TYPED
                    tname = self._parse_type_name_tail(self.ident())
                    return ast.TypePred(left, tname.upper(), negated)
                if self.cur.kind == "PARAM":
                    tname = self.advance().value
                elif self.at_op(":"):
                    self.advance()
                    tname = self.ident()
                else:
                    raise ParseError(
                        f"Expected type name after IS :: at {self.cur!r}"
                    )
                tname = self._parse_type_name_tail(tname)
                return ast.TypePred(left, tname.upper(), negated)
            raise ParseError(f"Expected NULL or DEFINED after IS at {self.cur!r}")
        negated = False
        if self.at_kw("NOT") and self.peek().kind == "KEYWORD" and self.peek().value in (
            "IN", "BETWEEN", "LIKE", "ILIKE",
        ):
            self.advance()
            negated = True
        if self.at_kw("IN"):
            self.advance()
            return self._parse_in(left, negated)
        if self.at_kw("BETWEEN"):
            self.advance()
            low = self.parse_concat()
            self.expect_kw("AND")
            high = self.parse_concat()
            return ast.Between(left, low, high, negated)
        if self.at_kw("LIKE"):
            self.advance()
            return ast.Like(left, self.parse_concat(), False, negated)
        if self.at_kw("ILIKE"):
            self.advance()
            return ast.Like(left, self.parse_concat(), True, negated)
        if self.at_kw("MATCHES"):
            self.advance()
            return ast.Matches(left, self.parse_concat())
        if self.at_op("=~"):  # Cypher regex operator
            self.advance()
            return ast.Matches(left, self.parse_concat())
        if self.cypher and self.cur.kind == "IDENT" and self.cur.value.upper() in (
            "STARTS", "ENDS",
        ):
            which = self.advance().value.upper()
            tok = self.advance()  # WITH
            if tok.value.upper() != "WITH":
                raise ParseError(f"Expected WITH after {which}")
            mode = "startswith" if which == "STARTS" else "endswith"
            return ast.Contains(left, self.parse_concat(), mode)
        if self.at_kw("INSTANCEOF"):
            self.advance()
            tok = self.advance()
            return ast.InstanceOf(left, tok.value)
        for kw, mode in (
            ("CONTAINSALL", "all"),
            ("CONTAINSANY", "any"),
            ("CONTAINSKEY", "key"),
            ("CONTAINSVALUE", "value"),
            ("CONTAINSTEXT", "text"),
            ("CONTAINS", "substr" if self.cypher else "contains"),
        ):
            if self.at_kw(kw):
                self.advance()
                return ast.Contains(left, self.parse_concat(), mode)
        return None  # no postfix predicate at the cursor

    def _parse_in(self, left: ast.Expr, negated: bool) -> ast.Expr:
        if self.at_op("("):
            if self.peek().kind == "KEYWORD" and self.peek().value in (
                "SELECT", "MATCH", "TRAVERSE",
            ):
                self.advance()
                stmt = self.parse_statement()
                self.expect_op(")")
                return ast.In(left, subquery=stmt, negated=negated)
            self.advance()
            items = []
            if not self.at_op(")"):
                items.append(self.parse_expr())
                while self.eat_op(","):
                    items.append(self.parse_expr())
            self.expect_op(")")
            return ast.In(left, items=tuple(items), negated=negated)
        if self.at_op("["):
            # full additive rhs: IN binds looser than '+' on its operand
            # ([1]+2 IN [3]+4 is ([1]+2) IN ([3]+4) — TCK Precedence3)
            arr = self.parse_concat()
            if isinstance(arr, ast.ArrayLit):
                return ast.In(left, items=arr.items, negated=negated)
            return ast.In(left, collection=arr, negated=negated)
        return ast.In(left, collection=self.parse_concat(), negated=negated)

    def parse_concat(self) -> ast.Expr:
        left = self.parse_coalesce()
        while self.at_op("||"):
            self.advance()
            left = ast.Bin("||", left, self.parse_coalesce())
        return left

    def parse_coalesce(self) -> ast.Expr:
        left = self.parse_additive()
        while self.at_op("??"):
            self.advance()
            left = ast.Bin("??", left, self.parse_additive())
        return left

    def parse_additive(self) -> ast.Expr:
        left = self.parse_multiplicative()
        while self.at_op("+", "-"):
            op = self.advance().value
            left = ast.Bin(op, left, self.parse_multiplicative())
        return left

    def parse_multiplicative(self) -> ast.Expr:
        left = self.parse_power()
        while self.at_op("*", "/", "%"):
            op = self.advance().value
            left = ast.Bin(op, left, self.parse_power())
        return left

    def parse_power(self) -> ast.Expr:
        # Cypher exponentiation ^ — LEFT-associative (openCypher grammar,
        # TCK Precedence2: 4^6^3 = (4^6)^3), binds tighter than */
        left = self.parse_unary()
        while self.at_op("^"):
            self.advance()
            left = ast.Bin("^", left, self.parse_unary())
        return left

    def parse_unary(self) -> ast.Expr:
        if self.at_op("-", "+"):
            op = self.advance().value
            operand = self.parse_unary()
            # constant-fold signed numeric literals so they stay literals
            if isinstance(operand, ast.Lit) and isinstance(operand.value, (int, float)):
                return ast.Lit(-operand.value if op == "-" else operand.value)
            return ast.Unary(op, operand)
        return self.parse_postfix()

    def parse_postfix(self) -> ast.Expr:
        expr = self.parse_primary()
        while True:
            if self.cypher and self.cur.kind == "PARAM":
                # ':Label' after an expression is a Cypher label predicate
                # (Cypher query parameters are $name, never :name)
                labels = [self.advance().value]
                while self.cur.kind == "PARAM":
                    labels.append(self.advance().value)
                # label disjunction n:A|B (Cypher-25; reference issue
                # #4108/#4211).  `|` is also the comprehension projection
                # separator — only treat `| ident` as a label alternative
                # when the ident isn't the start of a larger expression
                # ([x IN l WHERE x:A | x.name] keeps its projection)
                while (
                    self.at_op("|")
                    and self.peek().kind in ("IDENT", "KEYWORD")
                    and not (
                        self.peek(2).kind == "OP"
                        and self.peek(2).value in (
                            ".", "[", "(", "]", "+", "-", "*", "/", "%", "^",
                        )
                    )
                ):
                    self.advance()
                    labels[-1] = f"{labels[-1]}|{self.ident()}"
                expr = ast.LabelPred(expr, tuple(labels))
            elif (
                self.cypher and self.at_op("{")
                and isinstance(expr, ast.Chain)
                and (
                    self.peek().kind == "OP" and self.peek().value == "."
                    or (self.peek().kind in ("IDENT", "KEYWORD", "PARAM"))
                )
            ):
                # map projection n{.name, key: expr, .*} (Cypher-25;
                # reference OpenCypherExpressionTest)
                expr = self._parse_map_projection(expr)
            elif not self.cypher and self.at_op(":") \
                    and self.peek().kind == "OP" \
                    and self.peek().value == "{":
                # inline nested projection expr:{a, b} in EXPRESSION
                # position (SQLParser.g4:322; ArrayConcatNestedProjection
                # Test: SELECT list({'x':1}):{x} || [])
                expr = self._parse_nested_projection(expr)
            elif self.at_op("."):
                self.advance()
                name = self.ident()
                if self.at_op("("):
                    self.advance()
                    args = []
                    if not self.at_op(")"):
                        args.append(self.parse_expr())
                        while self.eat_op(","):
                            if self.at_op(")"):
                                break  # trailing comma (Issue5495)
                            args.append(self.parse_expr())
                    self.expect_op(")")
                    expr = ast.Method(expr, name, tuple(args))
                elif isinstance(expr, ast.Chain):
                    expr = ast.Chain(expr.parts + (name,))
                else:
                    expr = ast.Index(expr, ast.Lit(name))
            elif self.at_op("["):
                self.advance()
                if self.at_op(".."):  # [..n] open slice
                    self.advance()
                    high = self.parse_expr()
                    self.expect_op("]")
                    expr = ast.Slice(expr, None, high)
                    continue
                # scalar-element filter [> 5] / [LIKE 'x%'] / [IN [..]]
                # (SQLParser.g4 arrayFilter/arrayLike/arrayIn selectors)
                elem = ast.Chain(("@value",))
                if self.at_op("=", "<>", "!=", "<", "<=", ">", ">=", "<=>"):
                    op = self.advance().value
                    cond = ast.Bin("=" if op == "==" else op, elem, self.parse_expr())
                    self.expect_op("]")
                    expr = ast.ArrayFilter(expr, cond)
                    continue
                if self.at_kw("LIKE"):
                    self.advance()
                    cond = ast.Like(elem, self.parse_expr(), False, False)
                    self.expect_op("]")
                    expr = ast.ArrayFilter(expr, cond)
                    continue
                if self.at_kw("IN") or (self.at_kw("NOT") and self.peek().value == "IN"):
                    neg = self.eat_kw("NOT")
                    self.expect_kw("IN")
                    cond = self._parse_in(elem, neg)
                    self.expect_op("]")
                    expr = ast.ArrayFilter(expr, cond)
                    continue
                first = self.parse_expr()
                if self.at_op("..", "..."):
                    self.advance()
                    high = None
                    if not self.at_op("]"):
                        high = self.parse_expr()
                    self.expect_op("]")
                    expr = ast.Slice(expr, first, high)
                elif self._is_condition(first):
                    # [name = 'x' AND n > 2] — per-element condition over
                    # struct fields (arrayConditionSelector)
                    self.expect_op("]")
                    expr = ast.ArrayFilter(expr, first)
                else:
                    self.expect_op("]")
                    expr = ast.Index(expr, first)
            else:
                break
        return expr

    _COND_OPS = {"=", "<>", "!=", "<", "<=", ">", ">=", "<=>", "AND", "OR"}

    @classmethod
    def _is_condition(cls, e: ast.Expr) -> bool:
        """Whether a bracketed expression is a per-element filter rather
        than an index (mirrors whereClause vs expression in
        SQLParser.g4 arraySelector)."""
        if isinstance(
            e,
            (
                ast.Like, ast.In, ast.Between, ast.IsNull, ast.IsDefined,
                ast.Contains, ast.Matches, ast.InstanceOf,
            ),
        ):
            return True
        if isinstance(e, ast.Bin) and e.op.upper() in cls._COND_OPS:
            return True
        if isinstance(e, ast.Unary) and e.op.upper() == "NOT":
            return True
        return False

    def parse_primary(self) -> ast.Expr:
        tok = self.cur
        if tok.kind == "INT":
            self.advance()
            return ast.Lit(int(tok.value))
        if tok.kind == "LINT":
            self.advance()
            return ast.LongLit(int(tok.value))
        if tok.kind == "FLOAT":
            self.advance()
            fv = float(tok.value)
            if fv in (float("inf"), float("-inf")):
                raise ParseError(
                    f"Float literal {tok.value} out of range "
                    "(FloatingPointOverflow)"
                )
            return ast.Lit(fv)
        if tok.kind == "STRING":
            self.advance()
            return ast.Lit(tok.value)
        if tok.kind == "RID":
            self.advance()
            return self._rid_literal(tok.value)
        if tok.kind == "PARAM":
            self.advance()
            return ast.Param(tok.value)
        if tok.kind == "VAR":
            self.advance()
            return ast.Var(tok.value)
        if tok.kind == "KEYWORD":
            if tok.value == "NULL":
                self.advance()
                return ast.Lit(None)
            if tok.value == "TRUE":
                self.advance()
                return ast.Lit(True)
            if tok.value == "FALSE":
                self.advance()
                return ast.Lit(False)
            if tok.value == "CASE":
                return self.parse_case()
            if tok.value == "NOT":
                self.advance()
                return ast.Unary("NOT", self.parse_not())
            if (
                self.cypher
                and tok.value == "EXISTS"
                and self.peek().kind == "OP"
                and self.peek().value == "{"
                and hasattr(self, "_parse_pattern")
            ):
                # EXISTS { [MATCH] pattern [WHERE expr] } (keyword form)
                return self._parse_exists_block()
            # Soft keywords as identifiers/functions (e.g. `in()` traversal)
            if self.peek().kind == "OP" and self.peek().value == "(":
                return self._parse_func_call()
            self.advance()
            return ast.Chain((tok.value.lower(),))
        if tok.kind == "IDENT":
            if (
                self.cypher
                and tok.value.lower() in ("exists", "count", "collect")
                and self.peek().kind == "OP"
                and self.peek().value == "{"
                and hasattr(self, "_parse_pattern")
            ):
                # EXISTS/COUNT/COLLECT { … } subquery expressions
                # (Cypher25Parser.g4 existsExpression/countExpression/
                # collectExpression; TCK ExistentialSubquery1)
                return self._parse_exists_block(mode=tok.value.lower())
            if self.peek().kind == "OP" and self.peek().value == "(":
                return self._parse_func_call()
            self.advance()
            return ast.Chain((tok.value,))
        if tok.kind == "OP":
            if tok.value == "(":
                if self.cypher and self._looks_like_pattern():
                    # relationship pattern in expression position —
                    # pattern predicate / exists() / size() source
                    save = self.i
                    try:
                        path = self._parse_pattern(False)  # CypherParser
                        if path.steps:
                            # inline (n WHERE …) predicates become the
                            # pattern expression's inner WHERE
                            return ast.PatternExpr(
                                path, where=path.inline_where
                            )
                    except ParseError:
                        pass
                    self.i = save
                self.advance()
                if self.cur.kind == "KEYWORD" and self.cur.value in (
                    "SELECT", "MATCH", "TRAVERSE",
                ):
                    stmt = self.parse_statement()
                    self.expect_op(")")
                    return ast.Subquery(stmt)
                inner = self.parse_expr()
                self.expect_op(")")
                return inner
            if tok.value == "[":
                self.advance()
                if self.cypher and (
                    (self.cur.kind == "OP" and self.cur.value == "("
                     and self._looks_like_pattern())
                    or (self.cur.kind == "IDENT"
                        and self.peek().kind == "OP"
                        and self.peek().value == "="
                        and self.peek(2).kind == "OP"
                        and self.peek(2).value == "(")
                ):
                    # pattern comprehension [(n)-->(m) WHERE p | proj]
                    save = self.i
                    try:
                        path = self._parse_pattern(False)
                        if path.steps:
                            where = path.inline_where
                            if self.eat_kw("WHERE"):
                                w2 = self.parse_expr()
                                where = w2 if where is None else ast.Bin(
                                    "AND", where, w2
                                )
                            self.expect_op("|")
                            proj = self.parse_expr()
                            self.expect_op("]")
                            return ast.PatternComp(path, where, proj)
                    except ParseError:
                        pass
                    self.i = save
                # list comprehension [x IN src [WHERE p] [| proj]]
                if (
                    self.cypher
                    and self.cur.kind == "IDENT"
                    and self.peek().kind == "KEYWORD"
                    and self.peek().value == "IN"
                ):
                    var = self.ident()
                    self.expect_kw("IN")
                    source = self.parse_expr()
                    pred = proj = None
                    if self.eat_kw("WHERE"):
                        pred = self.parse_expr()
                    if self.eat_op("|"):
                        proj = self.parse_expr()
                    self.expect_op("]")
                    return ast.ListComp(var, source, pred, proj)
                items = []
                if not self.at_op("]"):
                    items.append(self.parse_expr())
                    while self.eat_op(","):
                        if self.at_op("]"):
                            break  # trailing comma ([1, 2,] — Issue5495)
                        items.append(self.parse_expr())
                self.expect_op("]")
                return ast.ArrayLit(tuple(items))
            if tok.value == "{":
                self.advance()
                entries = []
                if not self.at_op("}"):
                    entries.append(self._parse_map_entry())
                    while self.eat_op(","):
                        if self.at_op("}"):
                            break  # trailing comma ({a: 1,} — Issue5495)
                        entries.append(self._parse_map_entry())
                self.expect_op("}")
                return ast.MapLit(tuple(entries))
            if tok.value == "*":
                self.advance()
                return ast.Star()
            if tok.value == "?":
                self.advance()
                name = str(self._positional)
                self._positional += 1
                return ast.Param(name)
        raise ParseError(f"Unexpected token {tok!r} (pos {tok.pos})")

    def parse_case(self) -> ast.Expr:
        self.expect_kw("CASE")
        operand = None
        if not self.at_kw("WHEN"):
            operand = self.parse_expr()
        whens: list[tuple[ast.Expr, ast.Expr]] = []
        while self.eat_kw("WHEN"):
            cond = self.parse_expr()
            self.expect_kw("THEN")
            whens.append((cond, self.parse_expr()))
        else_ = None
        if self.eat_kw("ELSE"):
            else_ = self.parse_expr()
        self.expect_kw("END")
        return ast.Case(operand, tuple(whens), else_)

    def _parse_exists_block(self, mode: str = "exists") -> "ast.PatternExpr":
        """EXISTS/COUNT/COLLECT { … } with the cursor ON the head token.

        Simple form (single pattern [WHERE] [RETURN]) parses structurally;
        a full-query form (WITH pipelines, multiple MATCH segments) keeps
        the raw block text for correlated lowering
        (cypher.lower_exists_block — TCK ExistentialSubquery2/3).
        COLLECT always takes the block path (its RETURN column IS the
        value — Cypher25Parser.g4 collectExpression requires a full
        query); COUNT falls back to it when a RETURN is present (RETURN
        DISTINCT changes the count)."""
        self.advance()  # EXISTS / COUNT / COLLECT
        self.advance()  # {
        save = self.i
        if mode != "collect":
            try:
                self.eat_kw("MATCH")
                path = self._parse_pattern(False)
                where = path.inline_where
                if self.eat_kw("WHERE"):
                    w2 = self.parse_expr()
                    where = w2 if where is None else ast.Bin(
                        "AND", where, w2
                    )
                has_return = self.at_kw("RETURN")
                if has_return:
                    # the RETURN projection is irrelevant to existence
                    self.advance()
                    self.eat_kw("DISTINCT")
                    self.parse_projection_list()
                if has_return and mode == "count":
                    raise ParseError("count-block RETURN needs block path")
                self.expect_op("}")
                return ast.PatternExpr(
                    path, where=where, subquery=True, mode=mode
                )
            except ParseError:
                self.i = save
        depth = 1
        j = self.i
        while depth and self.tokens[j].kind != "EOF":
            t = self.tokens[j]
            if t.kind == "OP" and t.value == "{":
                depth += 1
            elif t.kind == "OP" and t.value == "}":
                depth -= 1
                if not depth:
                    break
            j += 1
        if depth:
            raise ParseError(f"Unclosed {mode.upper()} {{ … }} block")
        start = self.tokens[save].pos
        end = self.tokens[j].pos
        self.i = j + 1  # past the closing brace
        return ast.PatternExpr(
            None, subquery=True, block=self.text[start:end], mode=mode
        )

    def _parse_map_projection(self, base: ast.Expr) -> ast.Expr:
        """``n{.prop, key: expr, var, .*}`` with the cursor ON '{'."""
        self.advance()  # '{'
        items: list = []
        while not self.at_op("}"):
            if self.at_op("."):
                self.advance()
                if self.eat_op("*"):
                    items.append(("star",))
                else:
                    items.append(("prop", self.ident()))
            else:
                if self.cur.kind == "PARAM":
                    # 'key:value' with no space lexes as IDENT? no —
                    # as key-IDENT + PARAM(value-head); resplit the PARAM
                    # into ':' + IDENT so the entry value parses fully
                    tok = self.cur
                    self.tokens[self.i:self.i + 1] = [
                        Token("OP", ":", tok.pos),
                        Token("IDENT", tok.value, tok.pos + 1),
                    ]
                key = self.ident()
                if self.cur.kind == "PARAM":
                    tok = self.cur
                    self.tokens[self.i:self.i + 1] = [
                        Token("OP", ":", tok.pos),
                        Token("IDENT", tok.value, tok.pos + 1),
                    ]
                if self.eat_op(":"):
                    items.append(("entry", key, self.parse_expr()))
                else:
                    items.append(("var", key))
            if not self.eat_op(","):
                break
        self.expect_op("}")
        return ast.MapProjection(base, tuple(items))

    def _parse_map_entry(self) -> tuple[str, ast.Expr]:
        tok = self.advance()
        if tok.kind not in ("IDENT", "STRING", "KEYWORD"):
            raise ParseError(f"Bad map key {tok!r}")
        key = tok.value
        if tok.kind == "KEYWORD":
            # keyword tokens are case-normalized; map keys are identifiers
            # and keep their written case ({null: …, NULL: …} are two
            # distinct keys — TCK Map1[5])
            raw = self.text[tok.pos:tok.pos + len(tok.value)]
            if raw.lower() == tok.value.lower():
                key = raw
        if self.cypher and tok.kind in ("IDENT", "KEYWORD") \
                and self.at_op("}"):
            # legacy Neo4j-2.x parameter spelling in value position
            # (reference Issue4141DeprecatedSyntaxTest): targeted hint,
            # not a generic map-literal error
            raise ParseError(
                f"{{{key}}} is the removed legacy parameter syntax — "
                f"use ${key}"
            )
        self.expect_op(":")
        return (key, self.parse_expr())

    def _parse_func_call(self) -> ast.Expr:
        name = self.ident()
        self.expect_op("(")
        low = name.lower()
        if (
            self.cypher and low == "trim"
            and self.cur.kind == "IDENT"
            and self.cur.value.upper() in ("BOTH", "LEADING", "TRAILING")
        ):
            # SQL-standard trim(BOTH|LEADING|TRAILING [chars] FROM src)
            # (Cypher-25; reference CypherFunctionArityRegistryTest:96)
            spec = self.advance().value.upper()
            chars = None
            if not self.at_kw("FROM"):
                chars = self.parse_expr()
            self.expect_kw("FROM")
            src = self.parse_expr()
            self.expect_op(")")
            fn = {"BOTH": "btrim", "LEADING": "ltrim",
                  "TRAILING": "rtrim"}[spec]
            args = (src,) if chars is None else (src, chars)
            return ast.FuncCall(fn, args, False)
        # Cypher quantified / comprehension forms: name(x IN src ...)
        if (
            self.cypher
            and self.cur.kind == "IDENT"
            and self.peek().kind == "KEYWORD"
            and self.peek().value == "IN"
        ):
            if low in ("all", "any", "none", "single"):
                var = self.ident()
                self.expect_kw("IN")
                source = self.parse_expr()
                self.expect_kw("WHERE")
                pred = self.parse_expr()
                self.expect_op(")")
                return ast.Quantifier(low, var, source, pred)
            if low in ("filter", "extract"):
                var = self.ident()
                self.expect_kw("IN")
                source = self.parse_expr()
                pred = proj = None
                if self.eat_kw("WHERE"):
                    pred = self.parse_expr()
                if self.eat_op("|"):
                    proj = self.parse_expr()
                self.expect_op(")")
                return ast.ListComp(var, source, pred, proj)
        if (
            self.cypher
            and low in ("reduce", "allreduce")
            and self.cur.kind == "IDENT"
            and self.peek().kind == "OP"
            and self.peek().value == "="
        ):
            acc = self.ident()
            self.expect_op("=")
            init = self.parse_expr()
            self.eat_op(",")
            var = self.ident()
            self.expect_kw("IN")
            source = self.parse_expr()
            self.expect_op("|")
            body = self.parse_expr()
            if low == "allreduce":
                # allReduce(acc = 0, x IN l | acc + x, acc < 10) —
                # Cypher-25 stepwise predicate (AllReduceExpression.java)
                self.expect_op(",")
                pred = self.parse_expr()
                self.expect_op(")")
                return ast.AllReduceExpr(acc, init, var, source, body, pred)
            self.expect_op(")")
            return ast.ReduceExpr(acc, init, var, source, body)
        distinct = self.eat_kw("DISTINCT")
        args: list[ast.Expr] = []
        if not self.at_op(")"):
            args.append(self.parse_expr())
            while self.eat_op(","):
                if self.at_op(")"):
                    break  # trailing comma (Issue5495)
                args.append(self.parse_expr())
        self.expect_op(")")
        if self.cypher and low in ("first", "last"):
            # Cypher first/last are list-element scalars, not the
            # reference SQL aggregates of the same name
            name = f"list.{low}"
        if self.cypher and low in (
            "date", "time", "datetime", "localtime", "localdatetime",
            "duration",
        ):
            # Cypher temporal constructors (distinct from the SQL
            # dialect's date()/duration() scalars)
            name = f"cypher.{low}"
        return ast.FuncCall(name, tuple(args), distinct)

    @staticmethod
    def _rid_literal(raw: str) -> ast.RidLit:
        body = raw.lstrip("#")
        bucket, pos = body.split(":")
        return ast.RidLit(int(bucket), int(pos))


def parse(text: str) -> ast.Statement:
    """Parse one ArcadeDB-SQL statement."""
    p = Parser(text)
    stmt = p.parse_statement()
    if p.cur.kind != "EOF":
        raise ParseError(f"Trailing input at {p.cur!r} (pos {p.cur.pos})")
    return stmt


def parse_expression(text: str) -> ast.Expr:
    """Parse a standalone boolean/scalar expression (used by the GraphQL
    skin's ``where: "<expr>"`` argument)."""
    p = Parser(text)
    e = p.parse_expr()
    if p.cur.kind != "EOF":
        raise ParseError(f"Trailing input at {p.cur!r} (pos {p.cur.pos})")
    return e

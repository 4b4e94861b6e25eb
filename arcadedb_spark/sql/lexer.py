"""Tokenizer for the ArcadeDB-SQL dialect.

Token-level dialect features (grammar:
engine/src/main/antlr4/com/arcadedb/query/sql/grammar/SQLLexer tokens in
SQLParser.g4): RIDs (``#12:0``), backtick identifiers, ``@``-attributes
(``@rid``, ``@type``), ``$`` context variables, ``:name``/``?``/``$1``
input parameters, single- or double-quoted strings, ``--`` and ``//`` line
comments, ``/* */`` block comments.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass(frozen=True)
class Token:
    kind: str  # IDENT KEYWORD STRING INT FLOAT RID PARAM VAR OP EOF
    value: str
    pos: int

    def __repr__(self) -> str:  # pragma: no cover
        return f"{self.kind}({self.value!r})"


KEYWORDS = {
    "SELECT", "FROM", "WHERE", "LET", "GROUP", "BY", "ORDER", "ASC", "DESC",
    "SKIP", "LIMIT", "OFFSET", "TIMEOUT", "PARALLEL", "DISTINCT", "AS",
    "AND", "OR", "NOT", "NULL", "TRUE", "FALSE", "IS", "DEFINED", "IN",
    "BETWEEN", "LIKE", "ILIKE", "MATCHES", "INSTANCEOF", "CONTAINS",
    "CONTAINSALL", "CONTAINSANY", "CONTAINSKEY", "CONTAINSVALUE",
    "CONTAINSTEXT", "CASE", "WHEN", "THEN", "ELSE", "END", "UNWIND",
    "MATCH", "RETURN", "TRAVERSE", "MAXDEPTH", "WHILE", "STRATEGY",
    "DEPTH_FIRST", "BREADTH_FIRST", "INSERT", "INTO", "VALUES", "SET",
    "CONTENT", "UPDATE", "DELETE", "UPSERT", "MERGE", "REMOVE", "CREATE",
    "DROP", "TYPE", "VERTEX", "EDGE", "DOCUMENT", "PROPERTY", "INDEX",
    "IF", "EXISTS", "EXTENDS", "OPTIONAL",
}

# `--` is a line comment in the SQL dialect only: in Cypher it is an
# anonymous undirected relationship inside patterns (openCypher comments
# are // and /* */), so the Cypher tokenizer omits that branch.
_TOKEN_TEMPLATE = r"""
    (?P<WS>\s+)
  | (?P<COMMENT>{comments})
  | (?P<RID>\#-?\d+:-?\d+)
  | (?P<HEX>0[xX][0-9a-fA-F]+)
  | (?P<OCT>0o[0-7]+)
  | (?P<FLOAT>(?:\d+\.\d+(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+)[fFdD]?|\d+[fFdD])
  | (?P<INT>\d+[lL]?)
  | (?P<STRING>'(?:[^'\\]|\\.|'')*'|"(?:[^"\\]|\\.)*")
  | (?P<BTICK>`(?:[^`]|``)*`)
  | (?P<PPARAM>\$\d+)
  | (?P<VAR>\$[A-Za-z_][A-Za-z0-9_]*)
  | (?P<NPARAM>:[A-Za-z_][A-Za-z0-9_]*)
  | (?P<IDENT>[A-Za-z_@][A-Za-z0-9_@$]*)
  | (?P<OP><=>|<>|!=|<=|>=|==|=~|=|<|>|\?\?|\|\||\.\.\.|\.\.|[-+*/%(),.\[\]{{}}:?#|!^])
    """

_TOKEN_RE = re.compile(
    _TOKEN_TEMPLATE.format(comments=r"--[^\n]*|//[^\n]*|/\*.*?\*/"),
    re.VERBOSE | re.DOTALL,
)
_TOKEN_RE_CYPHER = re.compile(
    _TOKEN_TEMPLATE.format(comments=r"//[^\n]*|/\*.*?\*/"),
    re.VERBOSE | re.DOTALL,
)

_STR_ESCAPES = {
    "n": "\n", "t": "\t", "r": "\r", "\\": "\\", "'": "'", '"': '"', "0": "\0",
}


def _unquote(raw: str) -> str:
    quote = raw[0]
    body = raw[1:-1]
    out: list[str] = []
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            nxt = body[i + 1]
            if nxt in ("u", "U"):
                # openCypher unicode escapes: \uXXXX / \UXXXXXXXX
                width = 4 if nxt == "u" else 8
                digits = body[i + 2:i + 2 + width]
                if len(digits) != width or any(
                    d not in "0123456789abcdefABCDEF" for d in digits
                ):
                    raise LexError(
                        f"Invalid unicode escape \\{nxt}{digits!r} in string"
                    )
                out.append(chr(int(digits, 16)))
                i += 2 + width
                continue
            out.append(_STR_ESCAPES.get(nxt, nxt))
            i += 2
        elif quote == "'" and c == "'" and i + 1 < len(body) and body[i + 1] == "'":
            out.append("'")
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


class LexError(ValueError):
    pass


def tokenize(text: str, cypher: bool = False) -> list[Token]:
    regex = _TOKEN_RE_CYPHER if cypher else _TOKEN_RE
    tokens: list[Token] = []
    pos = 0
    n = len(text)
    while pos < n:
        m = regex.match(text, pos)
        if m is None:
            raise LexError(f"Unexpected character {text[pos]!r} at position {pos}")
        kind = m.lastgroup
        value = m.group()
        if kind in ("WS", "COMMENT"):
            pos = m.end()
            continue
        if kind == "IDENT":
            upper = value.upper()
            if upper in KEYWORDS:
                tokens.append(Token("KEYWORD", upper, pos))
            else:
                tokens.append(Token("IDENT", value, pos))
        elif kind == "BTICK":
            # doubled backticks escape a literal backtick inside the
            # quoted name (Cypher25 escapedSymbolicNameString)
            tokens.append(
                Token("IDENT", value[1:-1].replace(2 * chr(96), chr(96)),
                      pos)
            )
        elif kind == "STRING":
            tokens.append(Token("STRING", _unquote(value), pos))
        elif kind == "NPARAM":
            tokens.append(Token("PARAM", value[1:], pos))
        elif kind == "PPARAM":
            tokens.append(Token("PARAM", value[1:], pos))
        elif kind == "VAR":
            tokens.append(Token("VAR", value[1:], pos))
        elif kind == "HEX":
            # Cypher hex literal (openCypher grammar HexInteger); range is
            # validated at compile time (IntegerOverflow, TCK Literals3)
            tokens.append(Token("INT", str(int(value, 16)), pos))
        elif kind == "OCT":
            tokens.append(Token("INT", str(int(value, 8)), pos))
        elif kind == "INT":
            # Java-style long suffix: 1000000000L → LINT so the literal
            # compiles as a 64-bit long (int overflow parity)
            if value[-1] in "lL":
                tokens.append(Token("LINT", value[:-1], pos))
            else:
                tokens.append(Token("INT", value, pos))
        elif kind == "FLOAT":
            tokens.append(Token("FLOAT", value.rstrip("fFdD"), pos))
        else:
            tokens.append(Token(kind, value, pos))
        pos = m.end()
    tokens.append(Token("EOF", "", pos))
    return tokens

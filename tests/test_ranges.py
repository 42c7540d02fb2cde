"""Range + geometry types (reference data_type.rs:97-106:
Int4Range/Int8Range/DateRange/TimestampRange, Box, Circle)."""

import tempfile

import pytest

from turdb_tpu.database.api import Database
from turdb_tpu.types.ranges import (
    Box,
    Circle,
    geo_contains,
    geo_overlaps,
    parse_box,
    parse_circle,
    parse_range,
)


def test_range_canonicalization():
    assert parse_range("(5,20]", "int").render() == "[6,21)"
    assert parse_range("[1,10)", "int").render() == "[1,10)"
    assert parse_range("[5,5)", "int").render() == "empty"
    assert parse_range("[5,5]", "int").render() == "[5,6)"
    assert parse_range("(,10)", "int").render() == "(,10)"
    assert parse_range("[2026-01-01,2026-02-01)", "date").render() == \
        "[2026-01-01,2026-02-01)"
    assert parse_range("(2026-01-01,2026-01-03]", "date").render() == \
        "[2026-01-02,2026-01-04)"


def test_range_predicates():
    assert geo_contains("[1,10)", 5) is True
    assert geo_contains("[6,21)", 5) is False
    assert geo_contains("[1,10)", "[8,9)") is True
    assert geo_contains("[1,10)", "[8,12)") is False
    assert geo_overlaps("[1,10)", "[9,12)") is True
    assert geo_overlaps("[1,10)", "[10,12)") is False
    assert geo_overlaps("[1,10)", "empty") is False
    assert geo_contains("(,)", 123456) is True


def test_geometry():
    b = parse_box("(0,0),(4,4)")
    assert isinstance(b, Box) and b.contains_point(2, 2)
    assert not b.contains_point(5, 5)
    c = parse_circle("<(0,0),5>")
    assert isinstance(c, Circle) and c.contains_point(3, 3)
    assert geo_overlaps("<(0,0),5>", "<(4,0),2>") is True
    assert geo_overlaps("<(0,0),1>", "<(4,0),2>") is False
    assert geo_contains("(0,0),(4,4)", "(1,1),(2,2)") is True


@pytest.fixture()
def db():
    d = Database.create(tempfile.mkdtemp() + "/rg")
    yield d
    d.close()


def test_range_sql_end_to_end(db):
    db.execute(
        "CREATE TABLE r(id INT, ir INT4RANGE, dr DATERANGE, b BOX, c CIRCLE)"
    )
    db.execute(
        "INSERT INTO r VALUES (1, '[1,10)', '[2026-01-01,2026-02-01)', "
        "'(0,0),(4,4)', '<(0,0),5>')"
    )
    db.execute(
        "INSERT INTO r VALUES (2, '(5,20]', 'empty', '(10,10),(12,12)', "
        "'<(10,10),1>')"
    )
    assert db.query("SELECT ir FROM r WHERE id = 2") == [("[6,21)",)]
    assert db.query("SELECT id FROM r WHERE ir @> 5") == [(1,)]
    assert db.query("SELECT id FROM r WHERE ir @> 20") == [(2,)]
    assert sorted(db.query("SELECT id FROM r WHERE ir && '[8,9)'")) == \
        [(1,), (2,)]
    assert db.query("SELECT id FROM r WHERE ir && '[50,60)'") == []
    assert db.query("SELECT id FROM r WHERE dr @> '2026-01-15'") == [(1,)]
    assert db.query("SELECT id FROM r WHERE dr && '[2026-01-20,2026-03-01)'") \
        == [(1,)]
    assert db.query("SELECT id FROM r WHERE b @> '(2,2)'") == [(1,)]
    assert db.query("SELECT id FROM r WHERE c @> '(3,3)'") == [(1,)]
    assert sorted(db.query("SELECT id FROM r WHERE c && '<(4,0),2>'")) == \
        [(1,)]
    assert len(db.query("SELECT id FROM r WHERE ir <@ '[0,100]'")) == 2
    with pytest.raises(Exception):
        db.execute("INSERT INTO r VALUES (3, 'not-a-range', NULL, NULL, NULL)")


def test_range_durability_and_jsonb_unaffected(db):
    db.execute("CREATE TABLE r(ir INT8RANGE, ts TSRANGE)")
    db.execute(
        "INSERT INTO r VALUES ('[100,200)', "
        "'[2026-01-01 10:00:00,2026-01-01 12:30:00)')"
    )
    db.execute("CREATE TABLE j(v JSONB)")
    db.execute("""INSERT INTO j VALUES ('{"a": 1, "b": [2, 3]}')""")
    assert db.query("""SELECT count(*) FROM j WHERE v @> '{"a": 1}'""") == \
        [(1,)]
    p = db.path
    db.close()
    db2 = Database.open(p)
    assert db2.query("SELECT ir FROM r") == [("[100,200)",)]
    assert db2.query(
        "SELECT count(*) FROM r WHERE ts @> '2026-01-01 11:00:00'"
    ) == [(1,)]
    db2.close()

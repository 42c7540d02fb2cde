"""Exact DECIMAL (reference src/types/data_type.rs:94 — round-1 stored
decimals as f64; verdict item #6). Round-trip, exact arithmetic and
aggregation, ORDER BY, key-encoding total order."""

from decimal import Decimal

import numpy as np
import pytest

from turdb_tpu.database.api import Database
from turdb_tpu.records.keys import encode_value


@pytest.fixture()
def db(tmp_path):
    d = Database.create(str(tmp_path / "db"))
    yield d


def test_decimal_round_trip(db):
    db.execute("CREATE TABLE t (id INT, amount DECIMAL(12, 4))")
    db.execute("INSERT INTO t VALUES (1, '123.4567')")
    db.execute("INSERT INTO t VALUES (2, 0.1)")
    rows = db.query("SELECT amount FROM t ORDER BY id")
    assert rows[0][0] == Decimal("123.4567")
    assert rows[1][0] == Decimal("0.1000")  # quantized to scale 4
    assert isinstance(rows[0][0], Decimal)


def test_decimal_sum_exact(db):
    db.execute("CREATE TABLE t (x DECIMAL)")
    for _ in range(10):
        db.execute("INSERT INTO t VALUES (0.1)")
    (s,) = db.query("SELECT SUM(x) FROM t")[0]
    assert s == Decimal("1.0")
    (a,) = db.query("SELECT AVG(x) FROM t")[0]
    assert a == Decimal("0.1")


def test_decimal_arithmetic(db):
    db.execute("CREATE TABLE t (a DECIMAL, b DECIMAL)")
    db.execute("INSERT INTO t VALUES ('1.10', '2.20')")
    (add, sub, mul, div) = db.query(
        "SELECT a + b, b - a, a * b, b / a FROM t"
    )[0]
    assert add == Decimal("3.30")
    assert sub == Decimal("1.10")
    assert mul == Decimal("2.4200")
    assert div == Decimal("2")
    # mixing with ints stays exact
    (x,) = db.query("SELECT a * 3 FROM t")[0]
    assert x == Decimal("3.30")


def test_decimal_order_by_and_where(db):
    db.execute("CREATE TABLE t (x DECIMAL)")
    vals = ["2.5", "-1.25", "0", "10.000000000000000001", "10"]
    for v in vals:
        db.execute(f"INSERT INTO t VALUES ('{v}')")
    got = [r[0] for r in db.query("SELECT x FROM t ORDER BY x")]
    assert got == sorted(Decimal(v) for v in vals)
    assert got[-1] == Decimal("10.000000000000000001")
    rows = db.query("SELECT x FROM t WHERE x > 2")
    assert sorted(r[0] for r in rows) == [
        Decimal("2.5"), Decimal("10"), Decimal("10.000000000000000001")
    ]


def test_decimal_cast_and_bulk(db):
    db.execute("CREATE TABLE t (x DOUBLE)")
    db.execute("INSERT INTO t VALUES (1.5)")
    (c,) = db.query("SELECT CAST(x AS DECIMAL) FROM t")[0]
    assert c == Decimal("1.5") and isinstance(c, Decimal)
    db.execute("CREATE TABLE d (v DECIMAL)")
    db.bulk_insert("d", [{"v": "0.3"}, {"v": 7}, {"v": None}])
    rows = db.query("SELECT v FROM d WHERE v IS NOT NULL ORDER BY v")
    assert [r[0] for r in rows] == [Decimal("0.3"), Decimal(7)]


def test_decimal_persists(tmp_path):
    path = str(tmp_path / "db")
    db = Database.create(path)
    db.execute("CREATE TABLE t (x DECIMAL)")
    db.execute("INSERT INTO t VALUES ('123456789012345678901234.5678')")
    db.close()
    db2 = Database.open(path)
    (v,) = db2.query("SELECT x FROM t")[0]
    assert v == Decimal("123456789012345678901234.5678")
    db2.close()


def test_key_encoding_total_order():
    """Numeric keys (int/float/Decimal mixed) compare bytewise in value
    order — the memcmp contract (reference encoding/key.rs:17-46)."""
    rng = np.random.default_rng(3)
    vals: list = []
    vals += [int(x) for x in rng.integers(-(2**62), 2**62, 50)]
    vals += [2**53 + 1, 2**53 + 2, -(2**53) - 1, 2**60 + 7, 2**60 + 8]
    vals += [float(x) for x in rng.standard_normal(50) * 1e6]
    vals += [1e300, -1e300, 0.5, -0.5]
    vals += [
        Decimal("0.1"), Decimal("0.10000000000000000001"),
        Decimal("-7.25"), Decimal("123456789.123456789123456789"),
        Decimal(2**53 + 1), Decimal("1e40"), Decimal("-1e40"),
    ]
    enc = [(encode_value(v), v) for v in vals]
    by_bytes = [v for _, v in sorted(enc, key=lambda p: p[0])]
    by_value = sorted(vals, key=lambda v: (Decimal(str(v))
                                           if isinstance(v, float)
                                           else Decimal(v)))
    assert [Decimal(str(a)) if isinstance(a, float) else Decimal(a)
            for a in by_bytes] == [
        Decimal(str(a)) if isinstance(a, float) else Decimal(a)
        for a in by_value
    ]


def test_key_int_residue_round_trip():
    from turdb_tpu.records.keys import decode_value

    for v in (2**53 + 1, -(2**53) - 3, 2**62 + 12345, 5, -5, 0):
        buf = encode_value(v)
        out, _ = decode_value(buf)
        assert out == v and isinstance(out, int)

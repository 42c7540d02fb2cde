"""Serialization-format tests: varint, order-preserving keys, record
format, JSONB — the property/fuzz category of the reference's test
strategy (SURVEY.md §4: fuzz targets on record decode/build + array
format, reference fuzz/fuzz_targets/)."""

import random

import numpy as np
import pytest

from turdb_tpu.records.jsonb import (
    jsonb_contains,
    jsonb_decode,
    jsonb_encode,
    jsonb_get,
    jsonb_get_path,
)
from turdb_tpu.records.keys import decode_key, encode_key, encode_value
from turdb_tpu.records.record import (
    RecordSchema,
    get_column,
    pack_record,
    unpack_record,
)
from turdb_tpu.records.varint import decode_varint, encode_varint
from turdb_tpu.types.datatype import DataType

random.seed(42)


def test_varint_roundtrip():
    for v in [0, 1, 240, 241, 2287, 2288, 67823, 67824, 2**32, 2**64 - 1]:
        enc = encode_varint(v)
        dec, n = decode_varint(enc)
        assert dec == v and n == len(enc)


def test_varint_order_preserving():
    vals = sorted(random.sample(range(2**50), 500))
    encs = [encode_varint(v) for v in vals]
    # SQLite4 varints are memcmp-orderable
    assert encs == sorted(encs)


def test_key_order_ints_floats():
    vals = [None, False, True, -1e300, -5, -1.5, 0, 0.5, 1, 2, 1e300]
    encs = [encode_value(v) for v in vals]
    assert encs == sorted(encs), "key encoding must preserve value order"


def test_key_numeric_total_order_large_ints():
    """Regression (ADVICE r1): ints not representable as f64 must order
    totally with floats and other ints — one tag + residue tiebreaker."""
    vals = [
        -1e300, -(2**63), -(2**53) - 3, -(2**53) - 2, -5, 0, 1,
        2**53, 2**53 + 1, 2**53 + 2, 2**53 + 3,
        float(2**53 + 4), 2**53 + 5, 2**60, 2**63 - 2, 2**63 - 1,
        1e300,
    ]
    encs = [encode_value(v) for v in vals]
    assert encs == sorted(encs)
    # mixed exact equality: 1 and 1.0 encode identically
    assert encode_value(1) == encode_value(1.0)
    # exact round trip for ints beyond 2^53
    for v in (2**53 + 1, -(2**53) - 3, 2**63 - 1, -(2**63)):
        from turdb_tpu.records.keys import decode_value

        dec, _ = decode_value(encode_value(v))
        assert dec == v


def test_key_numeric_random_total_order():
    import struct as _s

    pop: list = [random.randint(-(2**63), 2**63 - 1) for _ in range(400)]
    pop += [random.random() * 10**random.randint(-3, 300)
            * random.choice([-1, 1]) for _ in range(400)]
    pop += [float(x) for x in random.sample(pop[:400], 100)]
    def k(v):
        return (float(v), v - int(float(v)) if isinstance(v, int) else 0.0)
    pop.sort(key=k)
    encs = [encode_value(v) for v in pop]
    assert encs == sorted(encs)


def test_key_order_text():
    vals = ["", "a", "a\x00b", "aa", "ab", "b", "ba", "z" * 100]
    encs = [encode_value(v) for v in vals]
    assert encs == sorted(encs)


def test_key_roundtrip_fuzz():
    for _ in range(300):
        vals = []
        for _ in range(random.randint(1, 4)):
            t = random.randint(0, 4)
            if t == 0:
                vals.append(None)
            elif t == 1:
                vals.append(random.randint(-(2**40), 2**40))
            elif t == 2:
                vals.append(random.random() * 1e6 - 5e5)
            elif t == 3:
                vals.append(
                    "".join(
                        random.choice("ab\x00cd\xe9")
                        for _ in range(random.randint(0, 10))
                    )
                )
            else:
                vals.append(bytes(random.randbytes(random.randint(0, 8))))
        enc = encode_key(vals)
        dec = decode_key(enc, len(vals))
        for a, b in zip(vals, dec):
            if isinstance(a, float):
                assert b == pytest.approx(a)
            else:
                assert a == b


def test_key_desc_ordering():
    vals = [1, 2, 3, 10]
    encs = [encode_value(v, desc=True) for v in vals]
    assert encs == sorted(encs, reverse=True)


def test_key_composite_order():
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "a\x00"), (10, "")]
    encs = [encode_key(list(r)) for r in rows]
    assert encs == sorted(encs)


def test_record_roundtrip():
    schema = RecordSchema(
        [
            DataType.BIGINT,
            DataType.TEXT,
            DataType.DOUBLE,
            DataType.BOOLEAN,
            DataType.BLOB,
            DataType.VECTOR,
            DataType.JSONB,
        ]
    )
    row = [42, "hello", 3.25, True, b"\x01\x02", np.ones(4, np.float32), {"a": 1}]
    buf = pack_record(schema, row)
    out = unpack_record(schema, buf)
    assert out[0] == 42 and out[1] == "hello" and out[2] == 3.25
    assert out[3] is True and out[4] == b"\x01\x02"
    np.testing.assert_array_equal(out[5], row[5])
    assert out[6] == {"a": 1}


def test_record_nulls_and_o1_access():
    schema = RecordSchema([DataType.INT, DataType.TEXT, DataType.INT])
    buf = pack_record(schema, [None, None, 7])
    assert get_column(schema, buf, 0) is None
    assert get_column(schema, buf, 1) is None
    assert get_column(schema, buf, 2) == 7


def test_jsonb_roundtrip():
    doc = {
        "name": "x",
        "n": 3,
        "pi": 3.14,
        "ok": True,
        "nil": None,
        "tags": ["a", "b", {"deep": [1, 2]}],
        "nested": {"z": 1, "a": 2},
    }
    buf = jsonb_encode(doc)
    assert jsonb_decode(buf) == doc


def test_jsonb_get_binary_search():
    doc = {f"key{i:03d}": i for i in range(100)}
    buf = jsonb_encode(doc)
    assert jsonb_get(buf, "key042") == 42
    assert jsonb_get(buf, "nope") is None


def test_jsonb_path():
    buf = jsonb_encode({"a": {"b": [10, 20, {"c": "deep"}]}})
    assert jsonb_get_path(buf, ["a", "b", 1]) == 20
    assert jsonb_get_path(buf, ["a", "b", 2, "c"]) == "deep"
    assert jsonb_get_path(buf, ["a", "x"]) is None


def test_jsonb_contains():
    outer = {"a": 1, "b": [1, 2, 3], "c": {"d": 4}}
    assert jsonb_contains(outer, {"a": 1})
    assert jsonb_contains(outer, {"b": [2]})
    assert jsonb_contains(outer, {"c": {"d": 4}})
    assert not jsonb_contains(outer, {"a": 2})
    assert not jsonb_contains(outer, {"b": [9]})


class TestArrayFormat:
    def test_int_array(self):
        from turdb_tpu.records.arrays import ArrayView, array_encode

        buf = array_encode([1, None, 3, -9])
        v = ArrayView(buf)
        assert len(v) == 4
        assert v[0] == 1 and v[1] is None and v[3] == -9
        assert v.to_list() == [1, None, 3, -9]

    def test_text_array(self):
        from turdb_tpu.records.arrays import ArrayView, array_encode

        buf = array_encode(["a", "", None, "héllo"])
        v = ArrayView(buf)
        assert v.to_list() == ["a", "", None, "héllo"]

    def test_float_bool_blob(self):
        from turdb_tpu.records.arrays import ArrayView, array_encode

        assert ArrayView(array_encode([1.5, None])).to_list() == [1.5, None]
        assert ArrayView(array_encode([True, False, None])).to_list() == [
            True, False, None,
        ]
        assert ArrayView(array_encode([b"\x00\x01", None])).to_list() == [
            b"\x00\x01", None,
        ]

    def test_o1_access_fuzz(self):
        import random as _r

        from turdb_tpu.records.arrays import ArrayView, array_encode

        _r.seed(3)
        for _ in range(100):
            vals = [
                None if _r.random() < 0.2 else _r.randint(-(2**40), 2**40)
                for _ in range(_r.randint(0, 30))
            ]
            v = ArrayView(array_encode(vals))
            assert v.to_list() == vals

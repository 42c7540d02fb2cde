"""Composite type format (reference src/records/composite.rs:85):
record-layout reuse, O(1) index access, nesting with depth limit 16."""

import pytest

from turdb_tpu.records.composite import (
    MAX_NESTING_DEPTH,
    CompositeSchema,
    CompositeView,
    pack_composite,
    unpack_composite,
)
from turdb_tpu.types.datatype import DataType


def test_flat_round_trip():
    sch = CompositeSchema([DataType.INT, DataType.TEXT, DataType.DOUBLE,
                           DataType.BOOLEAN])
    buf = pack_composite(sch, (42, "hello", 2.5, True))
    v = CompositeView(buf, sch)
    assert v.field_count == 4
    assert v.get(0) == 42
    assert v.get(1) == "hello"
    assert v.get(2) == 2.5
    assert v.get(3) is True
    assert unpack_composite(sch, buf) == (42, "hello", 2.5, True)


def test_nulls():
    sch = CompositeSchema([DataType.INT, DataType.TEXT])
    buf = pack_composite(sch, (None, None))
    v = CompositeView(buf, sch)
    assert v.is_null(0) and v.is_null(1)
    assert v.get(0) is None and v.get(1) is None


def test_nested():
    point = CompositeSchema([DataType.DOUBLE, DataType.DOUBLE])
    seg = CompositeSchema([point, point, DataType.TEXT])
    buf = pack_composite(seg, ((0.0, 1.0), (2.0, 3.0), "ab"))
    v = CompositeView(buf, seg)
    assert v.get(0) == (0.0, 1.0)
    inner = v.get_nested(1)
    assert inner.get(0) == 2.0 and inner.get(1) == 3.0
    assert v.get(2) == "ab"
    assert unpack_composite(seg, buf) == ((0.0, 1.0), (2.0, 3.0), "ab")


def test_nested_null_subrecord():
    point = CompositeSchema([DataType.DOUBLE, DataType.DOUBLE])
    seg = CompositeSchema([point, DataType.TEXT])
    buf = pack_composite(seg, (None, "x"))
    v = CompositeView(buf, seg)
    assert v.get(0) is None and v.get(1) == "x"


def test_depth_limit_schema():
    sch = CompositeSchema([DataType.INT])
    with pytest.raises(ValueError):
        for _ in range(MAX_NESTING_DEPTH + 1):
            sch = CompositeSchema([sch])


def test_depth_limit_view():
    sch = CompositeSchema([DataType.INT])
    buf = pack_composite(sch, (1,))
    with pytest.raises(ValueError):
        CompositeView(buf, sch, depth=MAX_NESTING_DEPTH)


def test_field_count_mismatch_rejected():
    sch = CompositeSchema([DataType.INT, DataType.INT])
    buf = pack_composite(sch, (1, 2))
    other = CompositeSchema([DataType.INT])
    with pytest.raises(ValueError):
        CompositeView(buf, other)
    with pytest.raises(ValueError):
        CompositeView(b"", sch)

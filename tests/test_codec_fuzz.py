"""Randomized round-trip + adversarial-bytes torture of the serialization
codecs — the property/fuzz coverage the reference gets from libFuzzer
(fuzz/fuzz_targets/{fuzz_decoder,fuzz_record_builder,fuzz_array}.rs).
10k-case generators with a fixed seed: deterministic in CI, broad in
coverage. Decoders must either round-trip exactly or raise a clean
Python exception (never hang, never crash the interpreter, never return
garbage silently for valid input)."""

import string
from decimal import Decimal

import numpy as np
import pytest

from turdb_tpu.records.jsonb import jsonb_decode, jsonb_encode
from turdb_tpu.records.keys import decode_key, decode_value, encode_key, encode_value
from turdb_tpu.records.record import RecordSchema, pack_record, unpack_record
from turdb_tpu.records.varint import decode_varint, encode_varint
from turdb_tpu.types.datatype import DataType

RNG = np.random.default_rng(0xC0DEC)


def rand_text(r, max_len=24):
    n = int(r.integers(0, max_len))
    alphabet = string.printable + "\x00éüλ🙂"
    return "".join(alphabet[i] for i in r.integers(0, len(alphabet), n))


def rand_scalar(r):
    k = int(r.integers(0, 8))
    if k == 0:
        return None
    if k == 1:
        return bool(r.integers(0, 2))
    if k == 2:
        return int(r.integers(-(2**62), 2**62))
    if k == 3:
        return float(np.round(r.standard_normal() * 10**r.integers(0, 9), 6))
    if k == 4:
        return rand_text(r)
    if k == 5:
        return bytes(r.integers(0, 256, int(r.integers(0, 16))).astype(np.uint8))
    if k == 6:
        return int(r.integers(-(2**30), 2**30))
    return rand_text(r, 6)


# ---------------------------------------------------------------------------
# varint
# ---------------------------------------------------------------------------

def test_varint_round_trip_10k():
    r = np.random.default_rng(1)
    for _ in range(10_000):
        v = int(r.integers(0, 2**63))
        buf = encode_varint(v)
        out, n = decode_varint(buf, 0)
        assert out == v and n == len(buf)


def test_varint_adversarial_bytes():
    r = np.random.default_rng(2)
    for _ in range(2_000):
        junk = bytes(r.integers(0, 256, int(r.integers(1, 12))).astype(np.uint8))
        try:
            v, n = decode_varint(junk, 0)
            assert 0 <= n <= len(junk) + 9
        except (ValueError, IndexError):
            pass


# ---------------------------------------------------------------------------
# order-preserving keys
# ---------------------------------------------------------------------------

def test_key_round_trip_10k():
    r = np.random.default_rng(3)
    for _ in range(10_000):
        v = rand_scalar(r)
        if isinstance(v, float) and not np.isfinite(v):
            continue
        buf = encode_value(v)
        out, n = decode_value(buf)
        assert n == len(buf)
        if isinstance(v, float):
            assert float(out) == v
        else:
            assert out == v, (v, out)


def test_key_order_property_5k():
    """encoded-bytes order == value order for comparable pairs."""
    r = np.random.default_rng(4)
    def norm(v):
        return Decimal(str(v)) if isinstance(v, (int, float)) else v
    for _ in range(5_000):
        a, b = rand_scalar(r), rand_scalar(r)
        if type(a) is bool or type(b) is bool or a is None or b is None:
            continue
        if isinstance(a, (int, float)) != isinstance(b, (int, float)):
            continue
        if isinstance(a, (str, bytes)) and type(a) is not type(b):
            continue
        ea, eb = encode_value(a), encode_value(b)
        na, nb = norm(a), norm(b)
        if na < nb:
            assert ea < eb, (a, b)
        elif na > nb:
            assert ea > eb, (a, b)


def test_key_adversarial_bytes():
    r = np.random.default_rng(5)
    for _ in range(2_000):
        junk = bytes(r.integers(0, 256, int(r.integers(1, 24))).astype(np.uint8))
        try:
            decode_value(junk)
        except (ValueError, IndexError, KeyError, UnicodeDecodeError):
            pass


def test_composite_key_round_trip():
    r = np.random.default_rng(6)
    for _ in range(2_000):
        vals = [rand_scalar(r) for _ in range(int(r.integers(1, 5)))]
        vals = [v for v in vals]
        desc = [bool(r.integers(0, 2)) for _ in vals]
        buf = encode_key(vals, desc)
        out = decode_key(buf, len(vals), desc)
        for v, o in zip(vals, out):
            if isinstance(v, float):
                assert float(o) == v
            else:
                assert o == v


# ---------------------------------------------------------------------------
# record format
# ---------------------------------------------------------------------------

def test_record_round_trip_5k():
    r = np.random.default_rng(7)
    dts = [DataType.BIGINT, DataType.DOUBLE, DataType.TEXT, DataType.BLOB,
           DataType.BOOLEAN, DataType.JSONB, DataType.DECIMAL]
    for _ in range(5_000):
        cols = [dts[i] for i in r.integers(0, len(dts), int(r.integers(1, 6)))]
        schema = RecordSchema(cols)
        vals = []
        for dt in cols:
            if r.random() < 0.2:
                vals.append(None)
            elif dt is DataType.BIGINT:
                vals.append(int(r.integers(-(2**62), 2**62)))
            elif dt is DataType.DOUBLE:
                vals.append(float(r.standard_normal()))
            elif dt is DataType.TEXT:
                vals.append(rand_text(r))
            elif dt is DataType.BLOB:
                vals.append(bytes(r.integers(0, 256, 8).astype(np.uint8)))
            elif dt is DataType.BOOLEAN:
                vals.append(bool(r.integers(0, 2)))
            elif dt is DataType.JSONB:
                vals.append({
                    rand_text(r, 4): x
                    for x in (rand_scalar(r), rand_scalar(r))
                    if not isinstance(x, bytes)   # JSONB has no raw-bytes kind
                })
            else:
                vals.append(Decimal(int(r.integers(-10**12, 10**12)))
                            / Decimal(10**int(r.integers(0, 6))))
        buf = pack_record(schema, vals)
        out = unpack_record(schema, buf)
        for dt, v, o in zip(cols, vals, out):
            assert o == v, (dt, v, o)


def test_record_adversarial_bytes():
    r = np.random.default_rng(8)
    schema = RecordSchema([DataType.BIGINT, DataType.TEXT, DataType.JSONB])
    for _ in range(2_000):
        junk = bytes(r.integers(0, 256, int(r.integers(2, 64))).astype(np.uint8))
        try:
            unpack_record(schema, junk)
        except Exception as e:  # must be a clean Python error, not a crash
            assert isinstance(e, (ValueError, IndexError, KeyError,
                                  UnicodeDecodeError, TypeError, struct_err))
    # truncated valid record
    buf = pack_record(schema, [1, "hello", {"a": 1}])
    for cut in range(len(buf)):
        try:
            unpack_record(schema, buf[:cut])
        except Exception:
            pass


import struct  # noqa: E402

struct_err = struct.error


# ---------------------------------------------------------------------------
# jsonb
# ---------------------------------------------------------------------------

def test_jsonb_round_trip_5k():
    r = np.random.default_rng(9)

    def rand_json(depth=0):
        k = int(r.integers(0, 6 if depth < 3 else 4))
        if k == 0:
            return None
        if k == 1:
            return bool(r.integers(0, 2))
        if k == 2:
            return int(r.integers(-(2**40), 2**40))
        if k == 3:
            return rand_text(r, 12)
        if k == 4:
            return [rand_json(depth + 1) for _ in range(int(r.integers(0, 4)))]
        return {rand_text(r, 5): rand_json(depth + 1)
                for _ in range(int(r.integers(0, 4)))}

    for _ in range(5_000):
        v = rand_json()
        assert jsonb_decode(jsonb_encode(v)) == v


def test_jsonb_adversarial_bytes():
    r = np.random.default_rng(10)
    for _ in range(2_000):
        junk = bytes(r.integers(0, 256, int(r.integers(1, 48))).astype(np.uint8))
        try:
            jsonb_decode(junk)
        except Exception as e:
            assert not isinstance(e, (SystemError, MemoryError))


def test_array_round_trip_5k():
    """Arrays (reference fuzz/fuzz_array.rs target): encode/decode every
    element kind with random NULLs, O(1) element access preserved."""
    from turdb_tpu.records.arrays import ArrayView, array_encode

    r = np.random.default_rng(21)
    for _ in range(5_000):
        kind = int(r.integers(0, 5))
        n = int(r.integers(0, 20))
        vals = []
        for _ in range(n):
            if r.random() < 0.25:
                vals.append(None)
            elif kind == 0:
                vals.append(bool(r.integers(0, 2)))
            elif kind == 1:
                vals.append(int(r.integers(-(2**62), 2**62)))
            elif kind == 2:
                vals.append(float(r.standard_normal()))
            elif kind == 3:
                vals.append(rand_text(r))
            else:
                vals.append(bytes(r.integers(0, 256, int(r.integers(0, 12)))
                                  .astype(np.uint8)))
        buf = array_encode(vals)
        v = ArrayView(buf)
        assert v.n == n
        for i in range(n):
            assert v[i] == vals[i], (kind, i, vals[i], v[i])


def test_array_adversarial_bytes():
    """Random/mutated array buffers must raise or return, never crash the
    process (reference libfuzzer contract)."""
    from turdb_tpu.records.arrays import ArrayView, array_encode

    r = np.random.default_rng(22)
    seeds = [array_encode([1, 2, None, 4]),
             array_encode(["ab", None, "xyz"]),
             array_encode([1.5, 2.5])]
    for _ in range(3_000):
        if r.random() < 0.5:
            buf = bytes(r.integers(0, 256, int(r.integers(1, 40)))
                        .astype(np.uint8))
        else:
            b = bytearray(seeds[int(r.integers(0, len(seeds)))])
            for _ in range(int(r.integers(1, 4))):
                b[int(r.integers(0, len(b)))] = int(r.integers(0, 256))
            buf = bytes(b)
        try:
            v = ArrayView(buf)
            for i in range(min(v.n, 64)):
                v[i]
        except Exception:
            pass          # any Python exception is fine; no crash/hang


def test_composite_round_trip_2k():
    """Nested composites (reference records/composite.rs: record-layout
    reuse, depth-16 nesting)."""
    from turdb_tpu.records.composite import (
        CompositeSchema,
        pack_composite,
        unpack_composite,
    )

    r = np.random.default_rng(23)
    inner = CompositeSchema([DataType.BIGINT, DataType.TEXT])
    outer = CompositeSchema([DataType.DOUBLE, inner, DataType.BOOLEAN])
    for _ in range(2_000):
        iv = (int(r.integers(-1000, 1000)),
              None if r.random() < 0.2 else rand_text(r))
        ov = (float(r.standard_normal()),
              None if r.random() < 0.15 else iv,
              bool(r.integers(0, 2)))
        buf = pack_composite(outer, ov)
        out = unpack_composite(outer, buf)
        assert out == ov, (ov, out)

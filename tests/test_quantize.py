"""SQ8 quantization tests (reference src/hnsw/quantization.rs semantics:
4x compression, bounded reconstruction error, distance fidelity)."""

import numpy as np
import jax.numpy as jnp

from turdb_tpu.ops.quantize import sq8_decode, sq8_encode, sq8_search

RNG = np.random.default_rng(11)


def test_roundtrip_error_bounded():
    x = RNG.standard_normal((50, 64)).astype(np.float32)
    codes, mins, scales = sq8_encode(jnp.asarray(x))
    assert codes.dtype == jnp.uint8
    rec = np.asarray(sq8_decode(codes, mins, scales))
    # max error is half a quantization step per component
    step = np.asarray(scales)[:, None]
    assert (np.abs(rec - x) <= step * 0.5 + 1e-6).all()


def test_constant_vector():
    x = np.full((3, 8), 2.5, np.float32)
    codes, mins, scales = sq8_encode(jnp.asarray(x))
    rec = np.asarray(sq8_decode(codes, mins, scales))
    np.testing.assert_allclose(rec, x, atol=1e-6)


def test_search_matches_exact():
    x = RNG.standard_normal((400, 32)).astype(np.float32)
    q = RNG.standard_normal((16, 32)).astype(np.float32)
    codes, mins, scales = sq8_encode(jnp.asarray(x))
    valid = jnp.ones(400, bool)
    d, ids = sq8_search(jnp.asarray(q), codes, mins, scales, valid, k=5)
    ids = np.asarray(ids)
    exact = ((q[:, None, :] - x[None]) ** 2).sum(-1)
    exact_ids = np.argsort(exact, axis=1)[:, :5]
    # top-1 agreement should be near-perfect at 8-bit precision
    top1 = (ids[:, 0] == exact_ids[:, 0]).mean()
    assert top1 >= 0.9
    # recall@5
    rec = np.mean(
        [len(set(a) & set(b)) / 5 for a, b in zip(ids, exact_ids)]
    )
    assert rec >= 0.9


def test_search_respects_valid_mask():
    x = RNG.standard_normal((100, 16)).astype(np.float32)
    codes, mins, scales = sq8_encode(jnp.asarray(x))
    valid = np.zeros(100, bool)
    valid[40:60] = True
    d, ids = sq8_search(
        jnp.asarray(x[:4]), codes, mins, scales, jnp.asarray(valid), k=3
    )
    ids = np.asarray(ids)
    assert ((ids >= 40) & (ids < 60)).all()

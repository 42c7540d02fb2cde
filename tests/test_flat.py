"""Flat exact k-NN: the SQL brute-force path and the recall oracle
(reference executes SQL k-NN as scan + TopK, SURVEY.md §2.3)."""

import numpy as np

from turdb_tpu.models.flat import FlatIndex
from turdb_tpu.ops.distance import Metric

RNG = np.random.default_rng(7)


def brute_force(q, x, k):
    d = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d, idx, axis=1), idx


def test_flat_exact_matches_numpy():
    x = RNG.standard_normal((500, 32)).astype(np.float32)
    q = RNG.standard_normal((8, 32)).astype(np.float32)
    idx = FlatIndex(dim=32)
    idx.add(x)
    d, i = idx.search(q, k=10)
    bd, bi = brute_force(q, x, 10)
    np.testing.assert_allclose(d, bd, rtol=1e-3, atol=1e-2)
    # ids can differ on exact ties; compare via distances
    got = np.sort(d, axis=1)
    np.testing.assert_allclose(got, bd, rtol=1e-3, atol=1e-2)
    assert (i >= 0).all()


def test_flat_delete_excludes():
    x = RNG.standard_normal((100, 8)).astype(np.float32)
    idx = FlatIndex(dim=8)
    ids = idx.add(x)
    q = x[:3]
    _, i0 = idx.search(q, k=1)
    assert i0[:, 0].tolist() == [0, 1, 2]
    idx.delete(ids[:3])
    _, i1 = idx.search(q, k=1)
    assert all(i1[j, 0] != j for j in range(3))


def test_flat_grow_capacity():
    idx = FlatIndex(dim=4, capacity=1024)
    for _ in range(3):
        idx.add(RNG.standard_normal((600, 4)).astype(np.float32))
    assert len(idx) == 1800
    d, i = idx.search(RNG.standard_normal((2, 4)).astype(np.float32), k=5)
    assert (i < 1800).all() and (i >= 0).all()


def test_flat_filter_mask():
    x = RNG.standard_normal((64, 8)).astype(np.float32)
    idx = FlatIndex(dim=8)
    idx.add(x)
    mask = np.zeros(64, bool)
    mask[10:20] = True
    _, i = idx.search(x[:4], k=3, valid_mask=mask)
    assert ((i >= 10) & (i < 20)).all()


def test_flat_ip_metric():
    x = RNG.standard_normal((200, 16)).astype(np.float32)
    q = RNG.standard_normal((4, 16)).astype(np.float32)
    idx = FlatIndex(dim=16, metric=Metric.IP)
    idx.add(x)
    _, i = idx.search(q, k=1)
    expected = np.argmax(q @ x.T, axis=1)
    np.testing.assert_array_equal(i[:, 0], expected)

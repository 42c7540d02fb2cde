"""IVF-Flat engine tests: recall vs exact oracle, SQ8 + rerank,
incremental appends, deletes, visibility masks."""

import numpy as np
import pytest

from turdb_tpu.models.flat import FlatIndex
from turdb_tpu.models.ivf import IvfIndex
from turdb_tpu.ops.distance import Metric

RNG = np.random.default_rng(5)


def make_clustered(n, dim, c=32):
    centers = RNG.standard_normal((c, dim)).astype(np.float32) * 3.0
    a = RNG.integers(0, c, n)
    return (centers[a] + RNG.standard_normal((n, dim))).astype(np.float32)


def recall(pred, true):
    return np.mean(
        [len(set(p[p >= 0]) & set(t)) / len(t) for p, t in zip(pred, true)]
    )


@pytest.fixture(scope="module")
def data():
    x = make_clustered(3000, 32)
    q = x[:64] + 0.01 * RNG.standard_normal((64, 32)).astype(np.float32)
    flat = FlatIndex(dim=32)
    flat.add(x)
    _, truth = flat.search(q, k=10)
    return x, q, truth


def test_ivf_recall(data):
    x, q, truth = data
    idx = IvfIndex(dim=32, n_clusters=64, nprobe=8)
    idx.add(x)
    idx.train()
    _, ids = idx.search(q, k=10)
    r = recall(ids, truth)
    assert r >= 0.95, f"ivf recall {r:.3f}"


def test_ivf_nprobe_tradeoff(data):
    x, q, truth = data
    idx = IvfIndex(dim=32, n_clusters=64)
    idx.add(x)
    idx.train()
    _, i1 = idx.search(q, k=10, nprobe=1)
    _, i16 = idx.search(q, k=10, nprobe=16)
    assert recall(i16, truth) >= recall(i1, truth)
    assert recall(i16, truth) >= 0.97


def test_ivf_sq8_rerank(data):
    x, q, truth = data
    idx = IvfIndex(dim=32, n_clusters=64, nprobe=8, sq8=True, rerank=64)
    idx.add(x)
    idx.train()
    _, ids = idx.search(q, k=10)
    r = recall(ids, truth)
    assert r >= 0.93, f"sq8 recall {r:.3f}"


def test_ivf_incremental_append(data):
    x, q, truth = data
    idx = IvfIndex(dim=32, n_clusters=64, nprobe=8)
    idx.add(x[:2000])
    idx.train()
    idx.add(x[2000:])
    _, ids = idx.search(q, k=10)
    assert recall(ids, truth) >= 0.9


def test_ivf_delete_and_mask(data):
    x, q, _ = data
    idx = IvfIndex(dim=32, n_clusters=64, nprobe=8)
    slots = idx.add(x)
    idx.train()
    _, ids = idx.search(x[:3], k=1)
    assert ids[:, 0].tolist() == [0, 1, 2]
    idx.delete([0, 1, 2])
    _, ids = idx.search(x[:3], k=1)
    assert all(ids[j, 0] != j for j in range(3))
    # visibility mask (MVCC)
    allowed = np.zeros(len(x), bool)
    allowed[100:200] = True
    _, ids = idx.search(x[:4], k=3, allowed=allowed)
    valid = ids[ids >= 0]
    assert ((valid >= 100) & (valid < 200)).all()


def test_ivf_ip_metric():
    x = RNG.standard_normal((500, 16)).astype(np.float32)
    idx = IvfIndex(dim=16, metric=Metric.IP, n_clusters=16, nprobe=16)
    idx.add(x)
    idx.train()
    q = RNG.standard_normal((4, 16)).astype(np.float32)
    _, ids = idx.search(q, k=1)
    expect = np.argmax(q @ x.T, axis=1)
    assert (ids[:, 0] == expect).mean() >= 0.75


def test_ivf_empty():
    idx = IvfIndex(dim=8)
    d, i = idx.search(np.zeros((2, 8), np.float32), k=3)
    assert (i == -1).all()


def test_ivf_compact_store_sq16_rerank():
    """keep_f32=False: int8 probe codes + SQ16 rerank copy (3 bytes/dim
    total) must match the f32-rerank engine's recall on clustered data."""
    import jax.numpy as jnp

    from turdb_tpu.models.flat import FlatIndex

    centers = RNG.standard_normal((16, 32)).astype(np.float32) * 4.0
    a = RNG.integers(0, 16, 4256)
    pool = (centers[a] + RNG.standard_normal((4256, 32))).astype(np.float32)
    x, q = pool[:4000], pool[4000:4128]
    flat = FlatIndex(dim=32)
    flat.add(x)
    _, truth = flat.search(q, k=10)
    idx = IvfIndex(dim=32, sq8=True, keep_f32=False, n_clusters=64)
    idx.add(x)
    if idx.state is None:
        idx.train()
    assert idx.state.pvecs.dtype == jnp.uint16
    _, ids = idx.search(q, k=10, nprobe=16)
    rec = np.mean(
        [len(set(p[p >= 0]) & set(t)) / 10 for p, t in zip(ids, truth)]
    )
    assert rec >= 0.9, f"compact-store recall {rec}"
    # incremental append keeps the compact encoding
    extra = (centers[RNG.integers(0, 16, 8)]
             + RNG.standard_normal((8, 32))).astype(np.float32)
    slots = idx.add(extra)
    _, ids2 = idx.search(extra, k=1, nprobe=16)
    hit = (ids2[:, 0] == slots).mean()
    assert hit >= 0.75, f"append self-hit {hit}"

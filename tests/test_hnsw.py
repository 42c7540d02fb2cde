"""HNSW graph engine tests: recall vs the exact oracle, filtered search,
deletion, determinism — the workload of reference tests/hnsw_integration.rs
(10k-scale random vectors) with brute force replacing the Qdrant harness
(tests/hnsw_qdrant_comparison.rs) as ground truth."""

import numpy as np
import pytest

from turdb_tpu.models.flat import FlatIndex
from turdb_tpu.models.hnsw import HnswConfig, HnswIndex, select_levels
from turdb_tpu.ops.distance import Metric

RNG = np.random.default_rng(1234)


def recall_at_k(pred_ids, true_ids):
    hits = 0
    for p, t in zip(pred_ids, true_ids):
        hits += len(set(p[p >= 0]) & set(t))
    return hits / true_ids.size


@pytest.fixture(scope="module")
def small_dataset():
    x = RNG.standard_normal((2000, 32)).astype(np.float32)
    q = RNG.standard_normal((50, 32)).astype(np.float32)
    flat = FlatIndex(dim=32)
    flat.add(x)
    _, true_ids = flat.search(q, k=10)
    return x, q, true_ids


@pytest.fixture(scope="module")
def built_index(small_dataset):
    x, _, _ = small_dataset
    idx = HnswIndex(dim=32, ef_construction=64, build_batch=256)
    idx.add(x)
    return idx


def test_select_levels_distribution():
    levels = select_levels(np.arange(100_000, dtype=np.uint64), HnswConfig(dim=4))
    frac0 = (levels == 0).mean()
    # geometric with p = 1 - 1/M: ~93.75% at level 0 for M=16
    assert 0.90 < frac0 < 0.97
    assert levels.max() <= 3
    # deterministic
    again = select_levels(np.arange(100_000, dtype=np.uint64), HnswConfig(dim=4))
    np.testing.assert_array_equal(levels, again)


def test_hnsw_recall(built_index, small_dataset):
    _, q, true_ids = small_dataset
    _, ids = built_index.search(q, k=10, ef=64)
    r = recall_at_k(ids, true_ids)
    assert r >= 0.95, f"recall {r:.3f} below gate"


def test_hnsw_self_query(built_index, small_dataset):
    x, _, _ = small_dataset
    d, ids = built_index.search(x[:20], k=1, ef=32)
    # querying an indexed vector must find itself at distance ~0
    assert (ids[:, 0] == np.arange(20)).mean() >= 0.95
    assert np.median(d[:, 0]) < 1e-3


def test_hnsw_filtered_search(built_index, small_dataset):
    x, q, _ = small_dataset
    allowed = np.zeros(len(x), bool)
    allowed[:500] = True
    _, ids = built_index.search(q, k=5, ef=64, allowed=allowed)
    valid = ids[ids >= 0]
    assert len(valid) > 0
    assert (valid < 500).all()


def test_hnsw_delete_tombstone(built_index, small_dataset):
    x, _, _ = small_dataset
    q = x[100:103]
    _, before = built_index.search(q, k=1)
    assert before[:, 0].tolist() == [100, 101, 102]
    built_index.delete([100, 101, 102])
    try:
        _, after = built_index.search(q, k=1)
        for j in range(3):
            assert after[j, 0] not in (100, 101, 102)
    finally:
        built_index._alive[[100, 101, 102]] = True  # restore for other tests


def test_hnsw_empty_and_single():
    idx = HnswIndex(dim=8)
    d, i = idx.search(np.zeros((2, 8), np.float32), k=3)
    assert (i == -1).all()
    idx.add(np.ones((1, 8), np.float32))
    d, i = idx.search(np.zeros((2, 8), np.float32), k=3)
    assert (i[:, 0] == 0).all()
    assert np.allclose(d[:, 0], 8.0)


def test_hnsw_incremental_add(small_dataset):
    x, q, true_ids = small_dataset
    idx = HnswIndex(dim=32, ef_construction=64, build_batch=128)
    idx.add(x[:1000])
    idx.add(x[1000:])
    _, ids = idx.search(q, k=10, ef=64)
    assert recall_at_k(ids, true_ids) >= 0.93


def test_hnsw_cosine_metric():
    x = RNG.standard_normal((800, 16)).astype(np.float32)
    q = x[:10] * 5.0  # scaled copies: cosine distance 0
    idx = HnswIndex(dim=16, metric=Metric.COSINE, ef_construction=64)
    idx.add(x)
    d, ids = idx.search(q, k=1, ef=64)
    assert (ids[:, 0] == np.arange(10)).mean() >= 0.9

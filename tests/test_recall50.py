"""Recall@50 >= 0.99 parity gate (VERDICT r4 item #6).

The reference ASSERTS avg recall@50 >= 0.99 against ground truth on a
384-d embedding workload (tests/hnsw_qdrant_comparison.rs:38-40,
315-319 — 1k embeddings, k=50, Qdrant as the oracle). This repo's
brute-force FlatIndex is exact, so the SQL `ORDER BY <-> LIMIT k` path
trivially meets the bar the reference's own test exercises; the gate
that MATTERS here is the ANN engines (HNSW serving + IVF), which the
reference never wired into SQL. bench.py records the on-chip @50
operating points per engine (EXTRA[tag]["recall50"]); this test asserts
the bar in CI on a CPU-sized pool of the same shape (384-d normalized
cosine embeddings, clustered)."""

import numpy as np
import pytest

from turdb_tpu.models.flat import FlatIndex
from turdb_tpu.models.hnsw import HnswIndex
from turdb_tpu.models.ivf import IvfIndex
from turdb_tpu.ops.distance import Metric

N, DIM, NQ, K = 20_000, 384, 64, 50


@pytest.fixture(scope="module")
def emb():
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((256, DIM)).astype(np.float32) * 3.0
    pool = (
        centers[rng.integers(0, 256, N + NQ)]
        + rng.standard_normal((N + NQ, DIM)).astype(np.float32)
    )
    pool /= np.linalg.norm(pool, axis=1, keepdims=True)
    x, q = pool[:N].astype(np.float32), pool[N:].astype(np.float32)
    flat = FlatIndex(dim=DIM, capacity=N, metric=Metric.COSINE)
    flat.add(x)
    _, truth = flat.search(q, k=K)
    return x, q, np.asarray(truth)


def _recall(ids, truth):
    return float(np.mean([
        len(set(p[p >= 0].tolist()) & set(t.tolist())) / len(t)
        for p, t in zip(np.asarray(ids), truth)
    ]))


def test_ivf_recall50_99(emb):
    x, q, truth = emb
    idx = IvfIndex(dim=DIM, metric=Metric.COSINE, rerank=4 * K)
    idx.add(x)
    idx.train()
    # sweep to the reference's asserted bar; the operating point must
    # exist within a practical probe budget
    for nprobe in (16, 32, 64):
        _, ids = idx.search(q, k=K, nprobe=nprobe)
        r = _recall(ids, truth)
        if r >= 0.99:
            break
    assert r >= 0.99, f"IVF recall@50 {r:.4f} < 0.99 (nprobe={nprobe})"


def test_hnsw_recall50_99(emb):
    x, q, truth = emb
    idx = HnswIndex(dim=DIM, metric=Metric.COSINE, ef_construction=100,
                    capacity=N)
    idx.add(x)
    for ef in (128, 192, 256):
        _, ids = idx.search(q, k=K, ef=ef)
        r = _recall(ids, truth)
        if r >= 0.99:
            break
    assert r >= 0.99, f"HNSW recall@50 {r:.4f} < 0.99 (ef={ef})"

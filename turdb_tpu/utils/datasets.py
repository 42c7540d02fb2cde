"""Benchmark datasets: external loaders + adversarially-shaped synthetics.

The round-2 verdict's gap: the recall gate had only ever been cleared on
data the builder generated to be clusterable (bench.py make_pool).
This module provides:

  - `load_fvecs` / `load_ivecs`: the SIFT/GIST TexMex formats, so a real
    SIFT-1M (ftp://ftp.irisa.fr/local/texmex/corpus) dropped at
    $TURDB_SIFT_PATH is used directly (bench.py wires it; the build
    environment has no egress, so the file must be provided).
  - `hard_pool`: imbalanced (Zipf sizes) + anisotropic (per-cluster
    random axis scalings + rotations) gaussian mixture with HELD-OUT
    queries drawn from the same mixture — none of make_pool's
    friendliness: cluster populations span ~2 orders of magnitude,
    cells are elongated (anisotropy defeats spherical k-means cells),
    and queries are not base points.
  - `emb_pool`: 384-d normalized embedding-like vectors (the reference
    harness's workload shape, hnsw_qdrant_comparison.rs: 384-d real
    embeddings): low-rank topic structure + heavy-tailed scaling +
    unit normalization, cosine-metric ready.
"""

from __future__ import annotations

import os

import numpy as np


def load_fvecs(path: str, max_n: int | None = None) -> np.ndarray:
    """TexMex .fvecs: [int32 d][d x float32] per row."""
    raw = np.fromfile(path, dtype=np.int32)
    d = int(raw[0])
    row = d + 1
    n = len(raw) // row
    if max_n is not None:
        n = min(n, max_n)
    arr = raw[: n * row].reshape(n, row)[:, 1:]
    return arr.view(np.float32).copy()


def load_ivecs(path: str, max_n: int | None = None) -> np.ndarray:
    raw = np.fromfile(path, dtype=np.int32)
    d = int(raw[0])
    row = d + 1
    n = len(raw) // row
    if max_n is not None:
        n = min(n, max_n)
    return raw[: n * row].reshape(n, row)[:, 1:].copy()


def sift_dataset(max_n: int | None = None):
    """(base, queries, ground_truth|None) from $TURDB_SIFT_PATH, a
    directory holding sift_base.fvecs / sift_query.fvecs /
    sift_groundtruth.ivecs (standard TexMex layout), or None when the
    env var is unset."""
    root = os.environ.get("TURDB_SIFT_PATH")
    if not root or not os.path.isdir(root):
        return None
    names = os.listdir(root)

    def find(suffix):
        for n in sorted(names):
            if n.endswith(suffix):
                return os.path.join(root, n)
        return None

    base_p = find("base.fvecs")
    query_p = find("query.fvecs")
    if base_p is None or query_p is None:
        return None
    base = load_fvecs(base_p, max_n)
    queries = load_fvecs(query_p)
    truth = None
    gt_p = find("groundtruth.ivecs")
    if gt_p is not None and max_n is None:
        truth = load_ivecs(gt_p)
    return base, queries, truth


def hard_pool(rng, n, dim, n_queries=16384, n_clusters=512):
    """Imbalanced anisotropic mixture + held-out queries.

    Sizes follow a Zipf(1.3) law (largest cell ~100x the median);
    every cluster gets its own random orthogonal rotation and
    log-uniform per-axis scalings in [0.25, 2.5] (condition number up
    to ~100 per cell). Queries are FRESH draws from the same mixture —
    never base rows — with cluster choice re-sampled from the same
    size law, so rare-cluster queries appear in proportion.
    """
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32) * 4.0
    w = 1.0 / np.arange(1, n_clusters + 1) ** 1.3
    w /= w.sum()
    # per-cluster anisotropy: scale then rotate (one rotation matrix per
    # cluster is ~n_clusters x d^2 flops to sample; applying is one
    # [n_c, d] @ [d, d] per cluster)
    rots = []
    scales = []
    for _ in range(n_clusters):
        a = rng.standard_normal((dim, dim)).astype(np.float32)
        q, _ = np.linalg.qr(a)
        rots.append(q.astype(np.float32))
        scales.append(
            np.exp(rng.uniform(np.log(0.25), np.log(2.5), dim)).astype(
                np.float32
            )
        )

    def draw(m):
        assign = rng.choice(n_clusters, size=m, p=w)
        out = np.empty((m, dim), np.float32)
        order = np.argsort(assign, kind="stable")
        sa = assign[order]
        start = 0
        while start < m:
            c = sa[start]
            end = start
            while end < m and sa[end] == c:
                end += 1
            z = rng.standard_normal((end - start, dim)).astype(np.float32)
            out[order[start:end]] = centers[c] + (z * scales[c]) @ rots[c]
            start = end
        return out

    return draw(n), draw(n_queries)


def emb_pool(rng, n, n_queries=16384, dim=384, n_topics=64):
    """Normalized 384-d embedding-like vectors (low-rank topic mixture +
    heavy-tailed norms before normalization), cosine-ready. Queries are
    held-out draws."""
    topics = rng.standard_normal((n_topics, dim)).astype(np.float32)

    def draw(m):
        # each vector = sparse topic mixture + noise
        k = 3
        idx = rng.integers(0, n_topics, size=(m, k))
        wts = rng.dirichlet(np.ones(k) * 0.7, size=m).astype(np.float32)
        x = np.einsum("mk,mkd->md", wts, topics[idx])
        x += 0.35 * rng.standard_normal((m, dim)).astype(np.float32)
        x *= rng.lognormal(0.0, 0.4, size=(m, 1)).astype(np.float32)
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-9)
        return x.astype(np.float32)

    return draw(n), draw(n_queries)

"""Pin the 1M ivf_f32 headline operating point (round-4 verdict item #1).

The round-3 artifact regressed 194k -> 109k QPS because approx_max_k
was fused into the cell probe at the 1M geometry (C=16384), where the
exact top_k is faster; an on-chip geometry sweep (scripts/
exp_geometry.py, 2026-08-19) measured the probe program at:

    C=16384 L=128 nprobe=8 : 238,825 QPS   <- headline default
    C=32768 L=128 nprobe=8 : 118,684 QPS   (r2's recorded geometry)
    C= 8192 L=256 nprobe=4 : 235,211 QPS
    C= 8192 L=128 nprobe=8 : 206,663 QPS

These tests pin (a) the default geometry the bench build picks at 1M
and (b) the probe program shape — two-level EXACT cell selection
(ops/topk.py topk_smallest_wide), never ApproxTopK — so the headline
can't silently halve again via either path. (The real 1M build grows C
via the split cascade, scripts/exp_real_gap.py; with the two-level
selection the measured headline moved 116k -> 153.6k, and the
big-block n//128 sizing took it to 181.8k @ recall 0.9703 — full
progression in docs/PERF.md.) QPS itself is asserted by the bench
artifact; what's CPU-checkable is that the program and geometry stay
the ones that were measured.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from turdb_tpu.models.ivf import (
    IvfConfig,
    IvfState,
    _cpad,
    _pow2_at_least,
    ivf_search_impl,
)
from turdb_tpu.ops.distance import Metric


def headline_geometry(n=1_000_000, sq8=False, dim=128):
    """The pre-split (C_work, L) the default sizing picks at n rows —
    mirrors IvfIndex.train's sizing block (models/ivf.py). The split
    cascade then grows C data-dependently (1M make_pool: -> 24576)."""
    divisor = 128 if (n >= 500_000 and not sq8 and dim <= 256) else 64
    c = max(8, n // divisor)
    c = min(c, max(8, n // 4))
    c_work = _cpad(c)
    cap = _pow2_at_least(max(int(2.0 * n / c), 16), floor=8)
    return c_work, cap


def test_default_1m_geometry_pinned():
    """Round-4 on-chip study: big blocks for the f32 engine (176.5k QPS
    at nprobe=5 vs 153.6k at the n//64 sizing), dense blocks for sq8."""
    assert headline_geometry(1_000_000) == (8192, 256)
    assert headline_geometry(1_000_000, sq8=True) == (16384, 128)
    assert headline_geometry(500_000, dim=384) == (8192, 128)
    assert headline_geometry(100_000) == (2048, 128)


def _probe_hlo(c, l, nprobe=8, dim=8):
    state = IvfState(
        centroids=jnp.zeros((c, dim)),
        cnorms=jnp.zeros((c,)),
        members=jnp.zeros((c, l), jnp.int32),
        pvecs=jnp.zeros((c, l, dim)),
        pnorms=jnp.zeros((c, l)),
        alive=jnp.ones((c, l), bool),
        codes=jnp.zeros((1, 1, 1), jnp.uint8),
        mins=jnp.zeros((1, 1)),
        scales=jnp.zeros((1, 1)),
    )
    cfg = IvfConfig(dim=dim, n_clusters=c, cluster_cap=l,
                    metric=Metric.L2, replicated=True)
    q = jnp.zeros((4, dim))
    return jax.jit(
        lambda st, qs: ivf_search_impl(st, qs, None, cfg=cfg, k=2,
                                       nprobe=nprobe)
    ).lower(state, q).as_text()


def test_probe_never_lowers_approx_topk():
    """The cell probe must stay EXACT at every C: fusing approx_max_k
    at C=16384 was the r3 regression (109-114k QPS vs 238k exact), and
    the two-level exact selection (ops/topk.py topk_smallest_wide) now
    replaces the full-row sort everywhere — ApproxTopK must not lower
    at the 1M headline geometry NOR at the 10M-class one."""
    for c in (16384, 32768):
        hlo = _probe_hlo(c, 8)
        assert "ApproxTopK" not in hlo and "approx_max_k" not in hlo, c


def test_wide_cell_selection_end_to_end():
    """End-to-end probe at two-level widths (C > 1024): on clustered
    data the probe's recall vs a GLOBAL exact oracle stays high (the
    two-level selection finds the right cells), and returned distances
    are the exact f32 distances of the returned ids."""
    rng = np.random.default_rng(3)
    dim, l = 16, 8
    for c in (2048, 4096):
        n = c * l
        centers = rng.standard_normal((64, dim)).astype(np.float32) * 6.0
        a = rng.integers(0, 64, size=n)
        pts = (
            centers[a]
            + rng.standard_normal((n, dim)).astype(np.float32)
        )
        # pack rows into cells by k-means-free locality: sort by natural
        # cluster then chop into cells of l; centroid = cell mean
        order = np.argsort(a, kind="stable")
        pv = pts[order].reshape(c, l, dim)
        cents = pv.mean(axis=1)
        state = IvfState(
            centroids=jnp.asarray(cents),
            cnorms=jnp.sum(jnp.asarray(cents) ** 2, -1),
            members=jnp.arange(n, dtype=jnp.int32).reshape(c, l),
            pvecs=jnp.asarray(pv),
            pnorms=jnp.sum(jnp.asarray(pv) ** 2, -1),
            alive=jnp.ones((c, l), bool),
            codes=jnp.zeros((1, 1, 1), jnp.uint8),
            mins=jnp.zeros((1, 1)),
            scales=jnp.zeros((1, 1)),
        )
        cfg = IvfConfig(dim=dim, n_clusters=c, cluster_cap=l,
                        metric=Metric.L2)
        q = (
            centers[rng.integers(0, 64, 64)]
            + rng.standard_normal((64, dim)).astype(np.float32)
        )
        dd, ids = ivf_search_impl(state, jnp.asarray(q), None, cfg=cfg,
                                  k=5, nprobe=64)
        ours, od = np.asarray(ids), np.asarray(dd)
        flat = pv.reshape(-1, dim)
        dall = (
            (flat**2).sum(1)[None, :]
            - 2.0 * q @ flat.T
            + (q**2).sum(1)[:, None]
        )
        want = np.argsort(dall, axis=-1)[:, :5]
        hits = np.mean([
            len(set(w) & set(o)) / 5 for w, o in zip(want, ours)
        ])
        assert hits >= 0.9, (c, hits)
        # distance contract: reported dists = exact f32 dists of the ids
        got = np.take_along_axis(dall, ours, axis=-1)
        assert np.allclose(od, got, rtol=1e-3, atol=1e-2), c

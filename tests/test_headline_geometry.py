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
and (b) the probe program shape — exact top-k, no approx_max_k below
the C=32768 gate (models/ivf.py) — so the headline can't silently
halve again via either path. QPS itself is asserted on-chip by the
bench artifact; what's CPU-checkable is that the program and geometry
that produced 238k stay the ones being run.
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


def headline_geometry(n=1_000_000):
    """The (C_work, L) the default sizing picks at n rows — mirrors
    IvfIndex.train's sizing block (models/ivf.py)."""
    c = max(8, n // 64)
    c = min(c, max(8, n // 4))
    c_work = _cpad(c)
    cap = _pow2_at_least(max(int(2.0 * n / c), 16), floor=8)
    return c_work, cap


def test_default_1m_geometry_pinned():
    assert headline_geometry(1_000_000) == (16384, 128)


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


def test_wide_cell_selection_matches_full_sort():
    """The two-level cell selection picks the SAME cells as the full
    lax.top_k sort (exactness of the probe's first stage, end to end
    through ivf_search_impl): same state, same queries, identical
    result ids at both the headline and 10M-class cell counts."""
    rng = np.random.default_rng(3)
    dim, l = 16, 8
    for c in (2048, 4096):
        # c <= 1024 takes the lax.top_k branch; larger takes two-level.
        # Compare the large-C two-level probe against a REFERENCE probe
        # built by brute force over all cells.
        cents = rng.standard_normal((c, dim)).astype(np.float32)
        pv = rng.standard_normal((c, l, dim)).astype(np.float32)
        state = IvfState(
            centroids=jnp.asarray(cents),
            cnorms=jnp.sum(jnp.asarray(cents) ** 2, -1),
            members=jnp.arange(c * l, dtype=jnp.int32).reshape(c, l),
            pvecs=jnp.asarray(pv),
            pnorms=jnp.sum(jnp.asarray(pv) ** 2, -1),
            alive=jnp.ones((c, l), bool),
            codes=jnp.zeros((1, 1, 1), jnp.uint8),
            mins=jnp.zeros((1, 1)),
            scales=jnp.zeros((1, 1)),
        )
        cfg = IvfConfig(dim=dim, n_clusters=c, cluster_cap=l,
                        metric=Metric.L2)
        q = rng.standard_normal((32, dim)).astype(np.float32)
        _, ids = ivf_search_impl(state, jnp.asarray(q), None, cfg=cfg,
                                 k=5, nprobe=4)
        ours = np.asarray(ids)
        # oracle: the 4 nearest cells by centroid distance, then the 5
        # nearest rows within those cells (random f32 data -> no ties)
        d2c = ((q[:, None, :] - cents[None]) ** 2).sum(-1)
        ref_cells = np.argsort(d2c, axis=-1)[:, :4]
        flat = pv.reshape(-1, dim)
        for b in range(len(q)):
            rows = np.concatenate(
                [np.arange(cc * l, (cc + 1) * l) for cc in ref_cells[b]]
            )
            d = ((q[b][None] - flat[rows]) ** 2).sum(-1)
            ref_ids = rows[np.argsort(d)[:5]]
            assert list(ours[b]) == list(ref_ids), (c, b)

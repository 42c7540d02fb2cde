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


def test_headline_probe_is_exact_topk():
    """At the 1M headline geometry the cell probe must lower to the
    exact top-k, NOT approx_max_k (ApproxTopK custom-call): fusing the
    approximate sort at C=16384 was measured at 109-114k QPS vs 238k
    exact on-chip."""
    hlo = _probe_hlo(16384, 8)
    assert "ApproxTopK" not in hlo and "approx_max_k" not in hlo


def test_10m_class_probe_keeps_approx():
    """At 10M-class cell counts (C>=32768) the approx probe is the
    measured win (2.7x the exact sort in isolation) and must stay."""
    hlo = _probe_hlo(32768, 8)
    assert "ApproxTopK" in hlo or "approx_max_k" in hlo

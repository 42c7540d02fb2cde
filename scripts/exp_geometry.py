"""Geometry sweep for the 1M ivf_f32 headline (round-4 verdict item #1).

The r2 artifact recorded 194k QPS at (C=32768, L=128, nprobe=8); the r3
artifact recorded 109k at (C=16384, L=128, nprobe=8) with the IDENTICAL
search program (the approx_max_k branch never fires at C=16384). Probe
cost is data-independent once the state shapes are fixed, so this sweep
builds SYNTHETIC IvfState tensors at each (C, L) and measures the fused
probe's device-slope QPS directly — no k-means, ~30s per point instead
of ~100s — separating the geometry's QPS from its recall (which one real
build then confirms at the chosen point).

Usage: python scripts/exp_geometry.py [grid|approx]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from turdb_tpu.models.ivf import IvfConfig, IvfState, ivf_search_impl
from turdb_tpu.ops.distance import Metric

DIM = 128
K = 10
BATCH = 1024


def synth_state(c, l, dim=DIM, seed=0):
    """All tensors are created ON DEVICE (jax.random / iota): probe QPS
    is data-independent once shapes are fixed, and materializing the
    (C, L, dim) pool host-side shipped ~1GB through the relay tunnel per
    point (>10 min each). This version costs one tiny compile."""
    import jax.random as jr

    key = jr.PRNGKey(seed)
    kc, kp = jr.split(key)
    cents = jr.normal(kc, (c, dim), jnp.float32) * 4.0
    pvecs = jr.normal(kp, (c, l, dim), jnp.float32)
    members = jnp.arange(c * l, dtype=jnp.int32).reshape(c, l)
    return IvfState(
        centroids=cents,
        cnorms=jnp.sum(cents ** 2, -1),
        members=members,
        pvecs=pvecs,
        pnorms=jnp.sum(pvecs ** 2, -1),
        alive=jnp.ones((c, l), bool),
        codes=jnp.zeros((1, 1, 1), jnp.uint8),
        mins=jnp.zeros((1, 1)),
        scales=jnp.zeros((1, 1)),
    )


def qps_of(state, cfg, nprobe, queries, m_lo=4, m_hi=16):
    @jax.jit
    def _scan(st, qs):
        def step(_, qb):
            _, i = ivf_search_impl(st, qb, None, cfg=cfg, k=K, nprobe=nprobe)
            return 0, i
        _, ids = jax.lax.scan(step, 0, qs)
        return ids

    def timed(m):
        qs = jnp.asarray(queries[: m * BATCH].reshape(m, BATCH, -1))
        np.asarray(_scan(state, qs))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(_scan(state, qs))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = timed(m_lo), timed(m_hi)
    per_batch = max((t_hi - t_lo) / (m_hi - m_lo), 1e-9)
    return BATCH / per_batch


def main():
    rng = np.random.default_rng(1)
    queries = rng.standard_normal((16 * BATCH, DIM)).astype(np.float32) * 4.0
    print(f"devices: {jax.devices()}", flush=True)

    # (C, L, nprobe) points; nprobe scaled so probed rows stay comparable
    grid = [
        (16384, 128, 8),    # r3 artifact geometry
        (32768, 128, 8),    # r2 artifact geometry
        (32768, 64, 8),
        (32768, 64, 16),    # equal probed rows as (16384,128,8)
        (8192, 128, 8),
        (8192, 256, 4),
        (16384, 64, 16),
        (65536, 64, 8),
    ]
    for c, l, p in grid:
        st = synth_state(c, l)
        cfg = IvfConfig(dim=DIM, n_clusters=c, cluster_cap=l,
                        metric=Metric.L2, replicated=True)
        try:
            q = qps_of(st, cfg, p, queries)
            print(f"C={c:6d} L={l:3d} nprobe={p:3d}: {q:12,.0f} qps",
                  flush=True)
        except Exception as e:
            print(f"C={c:6d} L={l:3d} nprobe={p:3d}: FAILED {str(e)[:90]}",
                  flush=True)
        del st


if __name__ == "__main__":
    main()

"""Bisect the real-vs-synthetic probe QPS gap at the 1M headline point.

exp_geometry.py measures the C=16384/L=128/nprobe=8 probe at ~239k QPS
on synthetic IvfState tensors; the real bench records ~116k on the
real built state with the IDENTICAL program (shapes, dtypes, cfg all
equal — verified here). This swaps one state component at a time
between the real build and synthetic equivalents to find which
component carries the 2x. All swaps preserve shapes/dtypes so ONE
compiled program serves every measurement.

Usage: python scripts/exp_real_gap.py [n]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from turdb_tpu.models.ivf import IvfIndex, IvfState, ivf_search_impl
from turdb_tpu.ops.distance import Metric

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
DIM, K, BATCH, NPROBE = 128, 10, 1024, 8


def make_pool(rng, n, dim, n_clusters=1024):
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32) * 4.0
    assign = rng.integers(0, n_clusters, size=n)
    radius = rng.uniform(0.3, 1.7, size=(n, 1)).astype(np.float32)
    return (
        centers[assign]
        + radius * rng.standard_normal((n, dim)).astype(np.float32)
    ).astype(np.float32)


def qps_of(scan, state, queries, m_lo=4, m_hi=16):
    def timed(m):
        qs = jnp.asarray(queries[: m * BATCH].reshape(m, BATCH, -1))
        np.asarray(scan(state, qs))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(scan(state, qs))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = timed(m_lo), timed(m_hi)
    return BATCH / max((t_hi - t_lo) / (m_hi - m_lo), 1e-9)


def main():
    rng = np.random.default_rng(0)
    pool = make_pool(rng, N + 16 * BATCH, DIM)
    x, queries = pool[:N], pool[N:]
    print(f"devices: {jax.devices()}", flush=True)

    idx = IvfIndex(dim=DIM, metric=Metric.L2)
    t0 = time.perf_counter()
    idx.add(x)
    idx.train()
    print(f"build: {time.perf_counter() - t0:.1f}s "
          f"C={idx.cfg.n_clusters} L={idx.cfg.cluster_cap} "
          f"replicated={idx.cfg.replicated} rerank={idx.cfg.rerank}",
          flush=True)
    real = idx.state
    cfg = idx.cfg
    c, l = cfg.n_clusters, cfg.cluster_cap
    for f in real._fields:
        a = getattr(real, f)
        print(f"  {f}: {a.shape} {a.dtype}", flush=True)

    @jax.jit
    def scan(st, qs):
        def step(_, qb):
            _, i = ivf_search_impl(st, qb, None, cfg=cfg, k=K, nprobe=NPROBE)
            return 0, i
        _, ids = jax.lax.scan(step, 0, qs)
        return ids

    import jax.random as jr

    key = jr.PRNGKey(0)
    kc, kp = jr.split(key)
    syn_cents = jr.normal(kc, (c, DIM), jnp.float32) * 4.0
    syn = IvfState(
        centroids=syn_cents,
        cnorms=jnp.sum(syn_cents**2, -1),
        members=jnp.arange(c * l, dtype=jnp.int32).reshape(c, l),
        pvecs=jr.normal(kp, (c, l, DIM), jnp.float32),
        pnorms=jnp.sum(
            jr.normal(kp, (c, l, DIM), jnp.float32) ** 2, -1
        ),
        alive=jnp.ones((c, l), bool),
        codes=real.codes, mins=real.mins, scales=real.scales,
    )
    syn_q = np.asarray(
        jr.normal(jr.PRNGKey(1), (16 * BATCH, DIM), jnp.float32) * 4.0
    )

    cases = [
        ("real state / real queries", real, queries),
        ("real state / synth queries", real, syn_q),
        ("synth state / synth queries", syn, syn_q),
        ("synth state / real queries", syn, queries),
        ("real + synth centroids", real._replace(
            centroids=syn.centroids, cnorms=syn.cnorms), syn_q),
        ("real + synth members/alive", real._replace(
            members=syn.members, alive=syn.alive), syn_q),
        ("real + synth pvecs/pnorms", real._replace(
            pvecs=syn.pvecs, pnorms=syn.pnorms), syn_q),
    ]
    for name, st, qs in cases:
        q = qps_of(scan, st, qs)
        print(f"{name:34s}: {q:12,.0f} qps", flush=True)


if __name__ == "__main__":
    main()

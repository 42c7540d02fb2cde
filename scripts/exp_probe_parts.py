"""Decompose the IVF probe cost at the 1M headline geometries.

The full probe at (C=16384, L=128, p=8) measures ~239k QPS and at
(C=32768, L=128, p=8) ~119k (exp_geometry.py) — equal gathered rows,
equal distance flops, 2x cell-scoring work, >=2x cost. This times the
probe's stages in isolation to find where the doubling actually lands:
  stage A: centroid matmul + top_k(nprobe)        [cell scoring]
  stage A': centroid matmul only (argmin)          [matmul share]
  stage B: block gather + distance + masked top-k  [given fixed cells]

Usage: python scripts/exp_probe_parts.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from turdb_tpu.ops.topk import topk_smallest

DIM, BATCH, NPROBE, K, L = 128, 1024, 8, 10, 128


def slope(fn, qs_all, m_lo=4, m_hi=16):
    def timed(m):
        qs = qs_all[: m * BATCH].reshape(m, BATCH, -1)
        np.asarray(fn(qs))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(qs))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = timed(m_lo), timed(m_hi)
    return BATCH / max((t_hi - t_lo) / (m_hi - m_lo), 1e-9)


def main():
    import jax.random as jr

    print(f"devices: {jax.devices()}", flush=True)
    key = jr.PRNGKey(0)
    qs_all = jnp.asarray(
        np.random.default_rng(1).standard_normal(
            (16 * BATCH, DIM)
        ).astype(np.float32) * 4.0
    )

    for c in (16384, 32768):
        kc, kp = jr.split(jr.fold_in(key, c))
        cents = jr.normal(kc, (c, DIM), jnp.float32) * 4.0
        cn = jnp.sum(cents**2, -1)
        pvecs = jr.normal(kp, (c, L, DIM), jnp.float32)
        pn = jnp.sum(pvecs**2, -1)

        @jax.jit
        def stage_a(qs, cents=cents, cn=cn):
            def step(_, q):
                qn = jnp.sum(q * q, -1)
                d2c = qn[:, None] + cn[None, :] - 2.0 * jax.lax.dot_general(
                    q, cents, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                _, top = jax.lax.top_k(-d2c, NPROBE)
                return 0, top
            return jax.lax.scan(step, 0, qs)[1]

        @jax.jit
        def stage_a_argmin(qs, cents=cents, cn=cn):
            def step(_, q):
                d2c = cn[None, :] - 2.0 * jax.lax.dot_general(
                    q, cents, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return 0, jnp.argmin(d2c, -1)
            return jax.lax.scan(step, 0, qs)[1]

        @jax.jit
        def stage_b(qs, pvecs=pvecs, pn=pn, c=c):
            def step(_, q):
                qn = jnp.sum(q * q, -1)
                # fixed pseudo-random cells per query (cheap hash) so the
                # gather pattern matches a real probe without the top_k
                h = (
                    jnp.abs(q[:, :NPROBE]).astype(jnp.uint32)
                    * jnp.uint32(2654435761)
                ).astype(jnp.int32) % c
                blocks = pvecs[h]                  # [B, P, L, d]
                dots = jnp.einsum(
                    "bd,bpld->bpl", q, blocks,
                    preferred_element_type=jnp.float32,
                )
                dist = (qn[:, None, None] + pn[h] - 2.0 * dots).reshape(
                    q.shape[0], -1
                )
                ids = jnp.broadcast_to(
                    jnp.arange(dist.shape[-1], dtype=jnp.int32)[None],
                    dist.shape,
                )
                return 0, topk_smallest(dist, ids, K)[1]
            return jax.lax.scan(step, 0, qs)[1]

        from turdb_tpu.ops.topk import topk_smallest_wide

        @jax.jit
        def stage_a_wide(qs, cents=cents, cn=cn):
            def step(_, q):
                qn = jnp.sum(q * q, -1)
                d2c = qn[:, None] + cn[None, :] - 2.0 * jax.lax.dot_general(
                    q, cents, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                _, top = topk_smallest_wide(d2c, NPROBE)
                return 0, top
            return jax.lax.scan(step, 0, qs)[1]

        for name, fn in (("A matmul+topk", stage_a),
                         ("A'' matmul+widetopk", stage_a_wide),
                         ("A' matmul+argmin", stage_a_argmin),
                         ("B gather+dist+topk", stage_b)):
            q = slope(fn, qs_all)
            print(f"C={c:6d} {name:20s}: {q:12,.0f} qps", flush=True)


if __name__ == "__main__":
    main()

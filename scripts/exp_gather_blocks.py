"""Microbench: packed-neighbor-block gathers vs scattered row gathers.

Hypothesis (round-3 HNSW serving redesign): gathering [B*E] contiguous
[deg, d] int8 blocks (4KB each) from a [N, deg, d] packed array is far
faster than gathering [B*E*deg] scattered [d] rows (the round-2 beam's
access pattern), because the relay-measured gather path is LATENCY-bound
per gathered row (~20-55M rows/s) regardless of row size.

Big arrays ride as ARGUMENTS (closure capture bakes them into the
program as constants — multi-GB lowering stall).
"""
import time
import sys

import jax
import jax.numpy as jnp
import numpy as np

N = 1_000_000
DEG = 32
D = 128
B = 1024
E = 4


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def slope(fn, args_lo, args_hi, m_lo, m_hi):
    np.asarray(fn(*args_lo))
    np.asarray(fn(*args_hi))
    tl = th = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(fn(*args_lo)); tl = min(tl, time.perf_counter() - t0)
        t0 = time.perf_counter(); np.asarray(fn(*args_hi)); th = min(th, time.perf_counter() - t0)
    return (th - tl) / (m_hi - m_lo)


def main():
    log(f"devices: {jax.devices()}")
    key = jax.random.PRNGKey(0)
    m_lo, m_hi = 8, 32

    # packed blocks: [N, DEG, D] int8 = 4.1GB
    packed = jnp.zeros((N, DEG, D), jnp.int8)
    qc = jnp.ones((B, D), jnp.int8)

    @jax.jit
    def run_blocks(packed, qc, ids):
        def step(acc, ids_t):
            blocks = packed[ids_t]                     # [B, E, DEG, D] int8
            doti = jnp.einsum("bd,begd->beg", qc, blocks,
                              preferred_element_type=jnp.int32)
            return acc + jnp.sum(doti, axis=(1, 2)), 0
        acc, _ = jax.lax.scan(step, jnp.zeros((B,), jnp.int32), ids)
        return acc

    ids_lo = jax.random.randint(key, (m_lo, B, E), 0, N, jnp.int32)
    ids_hi = jax.random.randint(key, (m_hi, B, E), 0, N, jnp.int32)
    per_step = slope(run_blocks, (packed, qc, ids_lo), (packed, qc, ids_hi),
                     m_lo, m_hi)
    blocks_per_s = B * E / per_step
    bytes_per_s = blocks_per_s * DEG * D
    log(f"packed-block gather+einsum: {per_step*1e3:.3f} ms/step "
        f"({blocks_per_s/1e6:.2f}M blocks/s, {bytes_per_s/1e9:.1f} GB/s)")
    for t in (8, 12, 16, 24):
        log(f"  projected QPS at {t} steps/query (B={B}): "
            f"{B / (t * per_step):,.0f}")

    del packed

    # scattered rows (round-2 pattern): [N, D] f32, gather [B, E*DEG] rows
    rows = jnp.zeros((N, D), jnp.float32)
    q = jnp.ones((B, D), jnp.float32)

    @jax.jit
    def run_rows(rows, q, ids):
        def step(acc, ids_t):
            v = rows[ids_t]                            # [B, E*DEG, D] f32
            doti = jnp.einsum("bd,bkd->bk", q, v,
                              preferred_element_type=jnp.float32)
            return acc + jnp.sum(doti, axis=1), 0
        acc, _ = jax.lax.scan(step, jnp.zeros((B,), jnp.float32), ids)
        return acc

    ids_lo = jax.random.randint(key, (m_lo, B, E * DEG), 0, N, jnp.int32)
    ids_hi = jax.random.randint(key, (m_hi, B, E * DEG), 0, N, jnp.int32)
    per_step = slope(run_rows, (rows, q, ids_lo), (rows, q, ids_hi),
                     m_lo, m_hi)
    rows_per_s = B * E * DEG / per_step
    log(f"scattered-row gather+einsum: {per_step*1e3:.3f} ms/step "
        f"({rows_per_s/1e6:.1f}M rows/s)")
    for t in (8, 12, 16, 24):
        log(f"  projected QPS at {t} steps/query (B={B}): "
            f"{B / (t * per_step):,.0f}")

    # small-row gathers: [N, DEG] f32 (per-neighbor params), gather [B, E]
    small = jnp.zeros((N, DEG), jnp.float32)

    @jax.jit
    def run_small(small, ids):
        def step(acc, ids_t):
            v = small[ids_t]                           # [B, E, DEG]
            return acc + jnp.sum(v, axis=(1, 2)), 0
        acc, _ = jax.lax.scan(step, jnp.zeros((B,), jnp.float32), ids)
        return acc

    ids_lo = jax.random.randint(key, (m_lo, B, E), 0, N, jnp.int32)
    ids_hi = jax.random.randint(key, (m_hi, B, E), 0, N, jnp.int32)
    per_step = slope(run_small, (small, ids_lo), (small, ids_hi), m_lo, m_hi)
    log(f"small-row gather [N,DEG]->[B,E]: {per_step*1e3:.3f} ms/step")


if __name__ == "__main__":
    main()

"""Pallas fused IVF probe kernel (EXPERIMENTAL — not wired into the
default path; see measurements below).

Streams each query's probed cluster blocks HBM→VMEM with pipelined DMA,
computes dot products in VMEM, and writes only the [B, P·L] distance
surface. Grid: one program per query; scalar-prefetched cluster ids
(computed by the device-side centroid top-k) drive the DMA source
indices — the Pallas data-dependent-gather pattern.

Measured (v5e, C=8192, L=128, d=128, B=1024, P=32):
  - this kernel, f32 blocks:  15.7 ms  (137 GB/s — at the f32 memory wall)
  - this kernel, int8 blocks: 14.9-16 ms (33 GB/s — DMA-LATENCY bound:
    1 outstanding 16KB copy per program step, not bandwidth)
  - XLA gather+einsum, f32:   10.9 ms  (~200 GB/s effective — XLA fuses
    the einsum into the gather well at this scale)

Conclusion: XLA already sits at the f32 memory wall, so the default IVF
path stays on XLA. The int8 upside (4x fewer bytes ⇒ ~4 ms) needs
multi-cluster block DMAs per step (issue K copies before the first wait)
— the planned next iteration of this kernel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _probe_kernel(top_ref, q_ref, data_ref, out_ref, scratch, sems):
    """QB queries per program, ALL of their copies issued before the first
    wait: per-program fixed overhead (~15us measured) and per-copy latency
    both amortize over QB*P outstanding DMAs."""
    g = pl.program_id(0)
    nprobe = top_ref.shape[1]
    l_cap = data_ref.shape[1]
    qb = q_ref.shape[0]
    total = qb * nprobe

    def get_dma(t):
        j = t // nprobe
        p = t % nprobe
        return pltpu.make_async_copy(
            data_ref.at[top_ref[g * qb + j, p]], scratch.at[t], sems.at[t]
        )

    def start(t, _):
        get_dma(t).start()
        return 0

    jax.lax.fori_loop(0, total, start, 0)

    def body(t, _):
        j = t // nprobe
        p = t % nprobe
        get_dma(t).wait()
        block = scratch[t].astype(jnp.float32)     # [L, d]
        qv = q_ref[j, 0, :].astype(jnp.float32)
        dots = jnp.sum(block * qv[None, :], axis=1)
        off = pl.multiple_of(p * l_cap, 128)
        out_ref[j, 0, pl.ds(off, l_cap)] = dots
        return 0

    jax.lax.fori_loop(0, total, body, 0)


@partial(jax.jit, static_argnames=())
def probe_dots(data: jax.Array, top: jax.Array, q: jax.Array) -> jax.Array:
    """data [C, L, d] (f32 or int8 codes), top [B, P] int32 cluster ids,
    q [B, d] (f32, or int8 centered query codes cast by caller).
    Returns dots [B, P*L] f32 = q[b] · data[top[b,p], l] without
    materializing the gathered blocks."""
    b, p = top.shape
    c, l_cap, d = data.shape
    assert l_cap % 128 == 0, "cluster_cap must be a multiple of 128 (lane width)"
    # queries per program: fill ~6MB of VMEM scratch with outstanding
    # copies (also leaves room for the output block)
    block_bytes = l_cap * d * data.dtype.itemsize
    qb = max(1, min(16, (6 * 2**20) // (p * block_bytes)))
    while b % qb:
        qb -= 1
    # 3-D shapes with a unit middle axis satisfy the TPU block tiling rule
    # ((QB, 1, d): middle dim equals the whole axis)
    out = pl.pallas_call(
        _probe_kernel,
        out_shape=jax.ShapeDtypeStruct((b, 1, p * l_cap), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b // qb,),
            in_specs=[
                pl.BlockSpec((qb, 1, d), lambda i, top: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(
                (qb, 1, p * l_cap), lambda i, top: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((qb * p, l_cap, d), data.dtype),
                pltpu.SemaphoreType.DMA((qb * p,)),
            ],
        ),
    )(top, q.reshape(b, 1, d), data)
    return out.reshape(b, p * l_cap)

"""On-chip study: dense block packing for the f32 IVF headline engine.

Compares at 1M x 128d (same pool/gate as bench.py's ivf_f32 row):
  A. baseline   — per-cell blocks + SOAR replicas (the r4 headline config)
  B. dense      — cells bin-packed into ~full blocks, replicate=False
  C. dense+rep  — replicas placed first, then packed (denser than A,
                  sparser than B)
For B/C, sweeps (nprobe, nblocks): nprobe logical cells are scored, the
first `nblocks` UNIQUE physical blocks are gathered (locality packing
makes near cells share blocks). Reports recall + device-slope QPS per
operating point so the frontier is explicit.

Run: env PYTHONPATH=/root/repo python scripts/exp_dense_pack.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("N", 1_000_000))
DIM = 128
GATE = 0.95


def main():
    import jax
    import jax.numpy as jnp

    from bench import (
        make_pool, qps_device_slope, recall_of, truth_for, with_retries,
    )
    from turdb_tpu.models.ivf import IvfIndex, ivf_search_impl

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    pool = make_pool(rng, N + 66_000, DIM)
    x, queries = pool[:N], pool[N:]
    sample = queries[:256]
    truth = truth_for(x, sample)
    print("truth ready", flush=True)

    def run(tag, dense, replicate, points):
        idx = IvfIndex(dim=DIM, dense_pack=dense, replicate=replicate)
        idx.add(x)
        t0 = time.perf_counter()
        with_retries(idx.train, what="build")
        bs = time.perf_counter() - t0
        st, cfg = idx.state, idx.cfg
        print(f"[{tag}] build {bs:.1f}s = {N/bs:,.0f} vec/s  "
              f"C={cfg.n_clusters} L={cfg.cluster_cap} "
              f"store={st.members.shape[0]} blocks "
              f"({st.members.shape[0]*cfg.cluster_cap*DIM*4/2**30:.2f} GB f32)",
              flush=True)
        for nprobe, nblocks in points:
            idx.nblocks = nblocks
            _, ids = with_retries(
                lambda p=nprobe: idx.search(sample, k=10, nprobe=p))
            r = recall_of(ids, truth)
            line = f"  p={nprobe} u={nblocks}: recall={r:.4f}"
            if r >= GATE:
                nb_arg = nblocks if cfg.dense else None

                @jax.jit
                def _scan(st_, qs):
                    def step(_, qb):
                        _, i = ivf_search_impl(
                            st_, qb, None, cfg=cfg, k=10, nprobe=nprobe,
                            nblocks=nb_arg)
                        return 0, i
                    _, i = jax.lax.scan(step, 0, qs)
                    return i

                qps = qps_device_slope(lambda qs: _scan(st, qs), queries)
                line += f"  QPS={qps:,.0f}"
            print(line, flush=True)
        del idx, st
        return None

    which = os.environ.get("WHICH", "ABC")
    if "A" in which:
        run("A base", False, True, [(5, None)])
    if "B" in which:
        run("B dense", True, False,
            [(8, 2), (8, 3), (12, 3), (8, 4), (12, 4), (16, 4), (12, 5),
             (16, 6), (16, 8)])
    if "C" in which:
        run("C dense+rep", True, True,
            [(8, 3), (8, 4), (12, 4), (16, 6)])


if __name__ == "__main__":
    main()

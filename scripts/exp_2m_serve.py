"""2M x 128d single-chip HNSW serving point (round-3 verdict item #7).

At 1M the full serving pack is ~5.2GB HBM; at 2M it is ~10.4GB — tight
next to the f32 rerank store on a 16GB chip. pack_m=16 halves the
adjacency-side pack (~2.6GB at 1M); this script builds 2M, packs with
pack_m=16, and records recall/QPS at the gate plus the pack's exact HBM
bytes — the measured 2-5M single-chip point the verdict asked for.

Run: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_2m_serve.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("N", 2_000_000))
DIM = 128


def main():
    import jax

    from bench import (
        make_pool, qps_device_slope, recall_of, truth_for, with_retries,
    )
    from turdb_tpu.models.hnsw import HnswIndex
    from turdb_tpu.models.hnsw_serve import serve_search_impl

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    pool = make_pool(rng, N + 66_000, DIM)
    x, queries = pool[:N], pool[N:]
    sample = queries[:256]
    truth = truth_for(x, sample)
    print("truth ready", flush=True)

    idx = HnswIndex(dim=DIM, ef_construction=100, build_batch=512,
                    capacity=N)
    t0 = time.perf_counter()
    idx.add(x)
    build_s = time.perf_counter() - t0
    print(f"build {N} in {build_s:.1f}s = {N/build_s:,.0f} vec/s",
          flush=True)
    t0 = time.perf_counter()
    idx.pack_serving(pack_m=16)
    pack_s = time.perf_counter() - t0
    sv = idx.serve
    gb = sum(a.size * a.dtype.itemsize for a in sv if a is not None) / 2**30
    print(f"pack_m=16 in {pack_s:.1f}s, {gb:.2f} GB HBM", flush=True)
    metric = idx.cfg.metric

    for ef, iters in ((48, 40), (64, 56), (96, 96), (128, 128)):
        _, ids = with_retries(
            lambda e=ef, i=iters: idx.search_serve(sample, k=10, ef=e,
                                                   iters=i))
        r = recall_of(ids, truth)
        print(f"ef={ef}: recall@10={r:.4f}", flush=True)
        if r >= 0.95:

            @jax.jit
            def _scan(st, qs):
                def step(_, qb):
                    _, i = serve_search_impl(st, qb, None, metric=metric,
                                             k=10, ef=ef, iters=iters)
                    return 0, i
                _, o = jax.lax.scan(step, 0, qs)
                return o

            qps = qps_device_slope(lambda qs: _scan(sv, qs), queries)
            print(f"QPS={qps:,.0f} @ ef={ef} recall={r:.4f} "
                  f"pack={gb:.2f}GB", flush=True)
            break


if __name__ == "__main__":
    main()

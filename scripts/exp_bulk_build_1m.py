"""Measure the 1M x 128d HNSW bulk build + serving-pack on the real chip
(verdict r2 #2: target >=10k vec/s at recall@10 >= 0.96 vs exact).

Run: env PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_bulk_build_1m.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("N", 1_000_000))
DIM = 128


def main():
    import jax

    from bench import make_pool, recall_of, truth_for
    from turdb_tpu.models.hnsw import HnswIndex

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    pool = make_pool(rng, N + 4096, DIM)
    x, queries = pool[:N], pool[N:]
    truth = truth_for(x, queries[:256])
    print("truth ready", flush=True)

    runs = int(os.environ.get("RUNS", 1))
    for run in range(runs):
        # run 0 = cold (every program compiles through the relay);
        # run 1 = warm (pow2-bucketed shapes reuse every compile) —
        # the steady-state number for long-lived serving processes
        idx = HnswIndex(dim=DIM, ef_construction=100, build_batch=512,
                        capacity=N)
        t0 = time.perf_counter()
        idx.add(x)
        build_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        idx.pack_serving()
        pack_s = time.perf_counter() - t0
        print(f"[{'cold' if run == 0 else 'warm'}] build {N} in "
              f"{build_s:.1f}s + pack {pack_s:.1f}s = "
              f"{N / (build_s + pack_s):,.0f} vec/s "
              f"(build-only {N / build_s:,.0f})", flush=True)

    for ef, iters in ((32, 24), (48, 32), (64, 48)):
        _, ids = idx.search_serve(queries[:256], k=10, ef=ef, iters=iters)
        r = recall_of(ids, truth)
        print(f"serve ef={ef} iters={iters}: recall@10={r:.4f}", flush=True)
    for ef in (64, 128):
        _, ids = idx.search(queries[:256], k=10, ef=ef)
        r = recall_of(ids, truth)
        print(f"graph ef={ef}: recall@10={r:.4f}", flush=True)


if __name__ == "__main__":
    main()

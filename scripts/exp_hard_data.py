"""Hard-distribution (anisotropic Zipf) ANN study — the round-3 follow-up
to the bench's `ivf_hard` gate miss (BENCH r3 interim: recall 0.891 at
nprobe<=128, 1M x 128d).

Findings (CPU backend, 100k/50k scale; reproduce with --stage):

1. `probe-sweep`: recall reaches 1.0 when probing every cell — packing
   loses nothing (split/spill/replicas are sound); the ceiling is CELL
   SELECTION. On hard_pool the gate (0.95@10) needs ~3% of cells probed
   (e.g. nprobe=64 at C=2048), vs 0.8% on clustered data: anisotropic
   cells defeat centroid-distance ranking, so more cells must be read.
2. `geometry`: at EQUAL scanned rows, finer partitions win — recall at
   8,192 scanned rows: C=1024/cap256 0.9547, C=2048/cap128 0.9602,
   C=8192/cap64 0.9719. Probe cost scales with nprobe*cap, so finer
   geometry + higher nprobe is strictly better until centroid-matmul
   cost dominates.
3. `radius`: per-cell radius corrections to the cell ranking
   (d2c - alpha*r95^2, ball-surface distance) all HURT on this data —
   plain centroid distance is the right ranking; there is no cheap
   scalar fix, the fix is scanning more (with int8 codes) or the graph.
4. `hnsw`: the serving pack (models/hnsw_serve.py) clears the recall
   gate on hard_pool at 50k with ef=48 (0.9594; 0.9762 @ ef=64): graph
   edges cross cell boundaries by construction, so the beam recovers
   the neighbors cell probing misses.

Engine guidance (bench.py wires this): on adversarially-shaped data
serve IVF with sq8 codes (4x less probe HBM -> nprobe can quadruple at
equal cost) or the HNSW serving pack.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--tpu" not in sys.argv:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="probe-sweep",
                    choices=["probe-sweep", "geometry", "hnsw"])
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--tpu", action="store_true",
                    help="run on the real device backend")
    args = ap.parse_args()

    from bench import recall_of, truth_for
    from turdb_tpu.utils.datasets import hard_pool

    rng = np.random.default_rng(0)
    x, queries = hard_pool(rng, args.n, 128, n_queries=512)
    truth = truth_for(x, queries[:256])
    sample = queries[:256]
    print(f"n={args.n} truth ready", flush=True)

    if args.stage == "hnsw":
        from turdb_tpu.models.hnsw import HnswIndex

        idx = HnswIndex(dim=128, ef_construction=100, build_batch=512,
                        capacity=args.n)
        t0 = time.perf_counter()
        idx.add(x)
        idx.pack_serving()
        print(f"build+pack {time.perf_counter() - t0:.0f}s", flush=True)
        for ef, iters in ((32, 24), (48, 32), (64, 48), (96, 96)):
            _, ids = idx.search_serve(sample, k=10, ef=ef, iters=iters)
            print(f"serve ef={ef}: {recall_of(ids, truth):.4f}", flush=True)
        return

    from turdb_tpu.models.ivf import IvfIndex

    geoms = (
        [(None, None)] if args.stage == "probe-sweep"
        else [(1024, 256), (2048, 128), (4096, 64), (8192, 32)]
    )
    for C, cap in geoms:
        idx = IvfIndex(dim=128, n_clusters=C, cluster_cap=cap)
        idx.add(x)
        idx.train()
        out = {}
        probes = (
            (8, 16, 32, 64, 128, 256, 512, idx.cfg.n_clusters)
            if args.stage == "probe-sweep" else (8, 16, 32, 64, 128, 256)
        )
        for nprobe in probes:
            nprobe = min(nprobe, idx.cfg.n_clusters)
            _, ids = idx.search(sample, k=10, nprobe=nprobe)
            out[nprobe * idx.cfg.cluster_cap] = round(
                recall_of(ids, truth), 4
            )
        print(
            f"C={idx.cfg.n_clusters} cap={idx.cfg.cluster_cap} "
            f"{{scanned_rows: recall}}: {out}",
            flush=True,
        )


if __name__ == "__main__":
    main()

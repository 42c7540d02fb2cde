"""Scale evidence for the 100M mesh config (VERDICT r4 item #8 /
BASELINE.json configs[4]): ONE SHARD of the v5p-8 target = 12.5M x 128d
on the single available chip, compact store (int8 probe codes + SQ16
rerank rows, 3 B/dim — models/ivf.py keep_f32=False).

Measures: build wall-clock, recall@10 vs an exact flat oracle (256
held-out queries, computed on-chip BEFORE the IVF store exists so both
never co-reside), QPS at the recall gate, and the packed-state HBM
high-water. Writes SCALE_12M5.json at the repo root; bench.py
re-attaches it to BENCH_rN.json with provenance (the ~15-min build
cannot fit the driver bench budget).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import probe_batch, qps_device_slope, recall_of
from turdb_tpu.models.ivf import IvfIndex, ivf_search_impl
from turdb_tpu.ops.distance import Metric

N = int(os.environ.get("SCALE_N", 12_500_000))
DIM = 128
K = 10
NQ = 16384


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_pool(rng, n, dim, n_clusters=4096):
    """bench.make_pool at scale, generated in chunks (one 12.5M
    standard_normal draw is ~30s; chunks keep peak host memory flat)."""
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32) * 4.0
    out = np.empty((n, dim), np.float32)
    for s in range(0, n, 1 << 20):
        e = min(n, s + (1 << 20))
        m = e - s
        a = rng.integers(0, n_clusters, size=m)
        r = rng.uniform(0.3, 1.7, size=(m, 1)).astype(np.float32)
        out[s:e] = centers[a] + r * rng.standard_normal(
            (m, dim)
        ).astype(np.float32)
    return out


def main():
    import jax

    out = {
        "config": f"{N}x{DIM}d compact store (sq8 + SQ16 rerank, 3B/dim), "
                  "one v5e chip = one shard of the 100M/v5p-8 target",
        "provenance": "scripts/exp_scale_12m5.py, run on-chip during "
                      "round 5; re-attached to BENCH by bench.py "
                      "attach_scale_artifact",
    }
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    pool = make_pool(rng, N + NQ, DIM)
    x, queries = pool[:N], pool[N:]
    log(f"pool ready {time.perf_counter() - t0:.0f}s")

    # exact oracle FIRST (flat f32 store ~8.6GB padded; freed before the
    # IVF build so the two never co-reside in HBM)
    from turdb_tpu.models.flat import FlatIndex

    t0 = time.perf_counter()
    flat = FlatIndex(dim=DIM, capacity=N, metric=Metric.L2)
    flat.add(x)
    _, truth = flat.search(queries[:256], k=K)
    del flat
    log(f"oracle ready {time.perf_counter() - t0:.0f}s")
    out["oracle_queries"] = 256

    idx = IvfIndex(dim=DIM, metric=Metric.L2, sq8=True, keep_f32=False,
                   rerank=4 * K)
    t0 = time.perf_counter()
    idx.add(x)
    idx.train()
    build_s = time.perf_counter() - t0
    out["build_s"] = round(build_s, 1)
    out["build_vps"] = round(N / build_s)
    out["geometry"] = {"C": idx.cfg.n_clusters, "L": idx.cfg.cluster_cap}
    st = idx.state
    hbm_gb = sum(
        a.size * a.dtype.itemsize
        for a in st if a is not None and hasattr(a, "size")
    ) / 2**30
    out["state_hbm_gb"] = round(hbm_gb, 2)
    log(f"build {build_s:.0f}s, state {hbm_gb:.2f} GB "
        f"(C={idx.cfg.n_clusters}, L={idx.cfg.cluster_cap})")

    star = None
    sweep = {}
    for nprobe in (8, 16, 24, 32, 48, 64):
        _, ids = idx.search(queries[:256], k=K, nprobe=nprobe)
        r = recall_of(ids, truth)
        sweep[str(nprobe)] = round(r, 4)
        log(f"nprobe={nprobe}: recall@10={r:.4f}")
        if r >= 0.95:
            star = (nprobe, r)
            break
    out["sweep"] = sweep
    if star:
        nprobe, r = star
        out.update({"recall": round(r, 4), "nprobe": nprobe, "gate": True})
        cfg, state = idx.cfg, idx.state

        @jax.jit
        def _scan(st_, qs):
            def step(_, qb):
                _, i = ivf_search_impl(st_, qb, None, cfg=cfg, k=K,
                                       nprobe=nprobe)
                return 0, i
            _, ids = jax.lax.scan(step, 0, qs)
            return ids

        b = probe_batch(cfg, nprobe)
        qps = qps_device_slope(lambda qs: _scan(state, qs), queries, batch=b)
        out["qps"] = round(qps)
        out["qps_batch"] = b
        log(f"QPS={qps:,.0f} @ nprobe={nprobe} recall={r:.4f}")
    else:
        out["gate"] = False
    with open("/root/repo/SCALE_12M5.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""ivf_pix operating-point tuning (VERDICT r4 item #10): the one
external dataset (240k deterministic image-patch descriptors) measured
44.3k QPS @ recall 0.9578 (nprobe=64) in BENCH_r04 — below the 50k
gate. Two levers, swept on the exact bench row:

  - big-block geometry: C = n//128 (cap 256 via the 2n/c rule) — the
    headline's round-4 lever; pix sits below the 500k auto-gate so the
    bench never tried it (fewer, bigger contiguous reads on the
    gather-bound probe; recall-per-probed-ROW should rise since each
    probe covers 2x rows).
  - SOAR replicas (replica_rank 2): fill split-cascade padding lanes
    with runner-up-cell copies -> recall per probed cell rises at zero
    probe cost.

Writes one JSON line per variant so a timeout keeps partial results.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

from bench import probe_batch, qps_device_slope, recall_of, truth_for
from turdb_tpu.models.ivf import IvfIndex, ivf_search_impl

K = 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run(tag, x, queries, truth, probes, **kw):
    idx = IvfIndex(dim=x.shape[1], **kw)
    t0 = time.perf_counter()
    idx.add(x)
    idx.train()
    bs = time.perf_counter() - t0
    row = {"build_s": round(bs, 1), "C": idx.cfg.n_clusters,
           "L": idx.cfg.cluster_cap}
    log(f"{tag}: build {bs:.1f}s C={idx.cfg.n_clusters} "
        f"L={idx.cfg.cluster_cap}")
    star = None
    for nprobe in probes:
        _, ids = idx.search(queries[:256], k=K, nprobe=nprobe)
        r = recall_of(ids, truth)
        row.setdefault("sweep", {})[str(nprobe)] = round(r, 4)
        log(f"  nprobe={nprobe}: recall@10={r:.4f}")
        if r >= 0.95 and star is None:
            star = (nprobe, r)
    if star:
        nprobe, r = star
        cfg, state = idx.cfg, idx.state

        @jax.jit
        def _scan(st, qs):
            def step(_, qb):
                _, i = ivf_search_impl(st, qb, None, cfg=cfg, k=K,
                                       nprobe=nprobe)
                return 0, i
            _, ids = jax.lax.scan(step, 0, qs)
            return ids

        b = probe_batch(cfg, nprobe)
        qps = qps_device_slope(lambda qs: _scan(state, qs), queries,
                               batch=b)
        row.update({"nprobe": nprobe, "recall": round(r, 4),
                    "qps": round(qps), "qps_batch": b})
        log(f"  {tag}: QPS={qps:,.0f} @ p={nprobe} r={r:.4f}")
    del idx
    print(json.dumps({tag: row}), flush=True)
    return row


def main():
    from turdb_tpu.utils.datasets import pix_pool

    pix = pix_pool(n=240_000, n_queries=16384)
    if pix is None:
        print(json.dumps({"error": "pix pool unavailable"}))
        return
    x, queries = pix
    n = len(x)
    truth = truth_for(x, queries[:256])
    log(f"pix pool {x.shape}, truth ready")

    variants = {
        "control": {},
        "bigblock": {"n_clusters": max(8, n // 128)},
        "soar2": {"replica_rank": 2},
        "bigblock_soar2": {"n_clusters": max(8, n // 128),
                           "replica_rank": 2},
        # int8 probe + exact rerank: 4x fewer gather bytes at matched
        # recall (the hard row's lever) — the f32 probe at nprobe=64
        # moves 64x64KB per query and measured 39.5k QPS
        "sq8": {"sq8": True, "rerank": 40},
        "sq8_r100": {"sq8": True, "rerank": 100},
        # over-provisioned caps: at L=128 the cells are ~46% full and the
        # rank-1 replica wave consumes every free lane (rank 2 placed
        # NOTHING — measured, sweep identical to control). L=256 leaves
        # ~165 free lanes/cell so boundary replication actually lands;
        # per-block bytes double but the probe is block-LATENCY-bound at
        # these sizes (sq8 64x16KB measured the same QPS as f32 64x64KB),
        # so halving the probes needed at the gate should ~halve the cost
        "sq8_cap256": {"sq8": True, "rerank": 40, "cluster_cap": 256},
        "sq8_cap256_r3": {"sq8": True, "rerank": 40, "cluster_cap": 256,
                          "replica_rank": 3},
    }
    names = sys.argv[1:] or list(variants)
    out = {}
    for name in names:
        out[name] = run(name, x, queries, truth,
                        probes=(8, 12, 16, 24, 32, 48, 64, 96),
                        **variants[name])
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""On-chip verification of the round-5 ivf_hard fix (VERDICT r4 item #2).

Root cause: bench.py's QPS scan ran at B=1024 regardless of nprobe, so
the nprobe=256 x L=128 x d=128 sq8 probe gathered a 4.3GB [B,P,L,d]
int8 temp per scan step — a deterministic compile failure (identical
HTTP-500 in r3 and r4). The fix caps the scan batch by the same ~2GB
temp rule IvfIndex.search() applies (bench.probe_batch).

This experiment rebuilds the EXACT bench row (hard_pool 1M x 128d, sq8,
rerank=40) and measures QPS at the capped batch plus neighbors, so the
bench-day run has a known-good operating point.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

from bench import probe_batch, qps_device_slope, recall_of, truth_for
from turdb_tpu.models.ivf import IvfIndex, ivf_search_impl
from turdb_tpu.ops.distance import Metric
from turdb_tpu.utils.datasets import hard_pool

N = 1_000_000
K = 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    rng = np.random.default_rng(0)
    xh, qh = hard_pool(rng, N, 128, n_queries=16384)
    th = truth_for(xh, qh[:256])
    log("truth ready")
    idx = IvfIndex(dim=128, metric=Metric.L2, sq8=True, rerank=4 * K)
    t0 = time.perf_counter()
    idx.add(xh)
    idx.train()
    log(f"build {time.perf_counter() - t0:.1f}s "
        f"(C={idx.cfg.n_clusters}, L={idx.cfg.cluster_cap})")
    star = None
    for nprobe in (192, 256, 384):
        _, ids = idx.search(qh[:256], k=K, nprobe=nprobe)
        r = recall_of(ids, th)
        log(f"nprobe={nprobe}: recall@10={r:.4f}")
        if r >= 0.95:
            star = (nprobe, r)
            break
    if star is None:
        log("gate not reached")
        return
    nprobe, r = star
    cfg, state = idx.cfg, idx.state

    @jax.jit
    def _scan(st, qs):
        def step(_, qb):
            _, i = ivf_search_impl(st, qb, None, cfg=cfg, k=K, nprobe=nprobe)
            return 0, i
        _, ids = jax.lax.scan(step, 0, qs)
        return ids

    out = {"nprobe": nprobe, "recall": round(r, 4)}
    b0 = probe_batch(cfg, nprobe)
    log(f"probe_batch -> {b0}")
    for b in (b0, b0 // 2, b0 * 2):
        try:
            t0 = time.perf_counter()
            qps = qps_device_slope(lambda qs: _scan(state, qs), qh, batch=b)
            log(f"batch={b}: QPS={qps:,.0f} "
                f"({time.perf_counter() - t0:.0f}s to measure)")
            out[f"qps_b{b}"] = round(qps)
        except Exception as e:
            log(f"batch={b}: FAILED {str(e)[:120]}")
            out[f"qps_b{b}"] = f"FAILED {str(e)[:80]}"
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

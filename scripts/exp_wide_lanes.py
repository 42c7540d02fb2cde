"""A/B the wide-lane two-level final selection (round 5).

The probe's per-lane throughput ceiling (~300M lanes/s measured across
the headline/pix/hard rows) tracked the full-row lax.top_k over
nprobe x cluster_cap candidate lanes. topk_smallest / the rerank
candidate cut now route rows wider than 2048 lanes through
topk_smallest_wide (exact two-level). This re-measures the pix row
(8,192 lanes at its gate) and a headline sanity point (1,280 lanes —
must be unchanged).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

from bench import make_pool, probe_batch, qps_device_slope, recall_of, truth_for
from turdb_tpu.models.ivf import IvfIndex, ivf_search_impl

K = 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def qps_at(idx, queries, nprobe):
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
    return qps_device_slope(lambda qs: _scan(state, qs), queries, batch=b), b


def main():
    out = {}
    which = sys.argv[1:] or ["pix", "headline"]

    if "pix" in which:
        from turdb_tpu.utils.datasets import pix_pool

        x, q = pix_pool(n=240_000, n_queries=16384)
        t = truth_for(x, q[:256])
        log("pix truth ready")
        for tag, kw, probes in (
            ("pix_f32", {}, (64,)),
            ("pix_sq8", {"sq8": True, "rerank": 40}, (64,)),
        ):
            idx = IvfIndex(dim=128, **kw)
            idx.add(x)
            idx.train()
            row = {}
            for p in probes:
                _, ids = idx.search(q[:256], k=K, nprobe=p)
                r = recall_of(ids, t)
                qps, b = qps_at(idx, q, p)
                row[str(p)] = {"recall": round(r, 4), "qps": round(qps),
                               "b": b}
                log(f"{tag} p={p}: recall={r:.4f} QPS={qps:,.0f}")
            out[tag] = row
            del idx
            print(json.dumps({tag: row}), flush=True)

    if "headline" in which:
        rng = np.random.default_rng(0)
        pool = make_pool(rng, 1_000_000 + 16384, 128)
        x, q = pool[:1_000_000], pool[1_000_000:]
        t = truth_for(x, q[:256])
        log("headline truth ready")
        idx = IvfIndex(dim=128)
        idx.add(x)
        idx.train()
        _, ids = idx.search(q[:256], k=K, nprobe=5)
        r = recall_of(ids, t)
        qps, b = qps_at(idx, q, 5)
        out["headline"] = {"recall": round(r, 4), "qps": round(qps), "b": b}
        log(f"headline p=5: recall={r:.4f} QPS={qps:,.0f}")
        print(json.dumps({"headline": out["headline"]}), flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()

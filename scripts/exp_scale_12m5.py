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


def _write(out):
    """Incremental artifact: the 2026-08-21 run lost everything to a
    timeout during the build (tunnel-throttled uploads) because the one
    json.dump sat at the end — write after every milestone instead."""
    with open("/root/repo/SCALE_12M5.json", "w") as f:
        json.dump(out, f, indent=1)


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

    # exact oracle FIRST, segment-streamed: a 12.5M FlatIndex OOMs the
    # chip (the functional .at[].set copy doubles the ~8.6GB store), so
    # scan 1M-row segments through one jitted exact top-k and merge on
    # host — peak device memory ~1.5GB and nothing persists before the
    # IVF build
    import jax.numpy as jnp

    t0 = time.perf_counter()
    qj = jnp.asarray(queries[:256])
    qn = (queries[:256] ** 2).sum(-1).astype(np.float32)

    @jax.jit
    def seg_topk(xseg, q):
        xn = (xseg * xseg).sum(-1)
        d = (q * q).sum(-1)[:, None] + xn[None, :] - 2.0 * jax.lax.dot_general(
            q, xseg, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        neg, idx = jax.lax.top_k(-d, K)
        return -neg, idx

    seg = 1 << 20
    best_d = np.full((256, K), np.inf, np.float32)
    best_i = np.full((256, K), -1, np.int64)
    for s in range(0, N, seg):
        e = min(N, s + seg)
        xs = x[s:e]
        if len(xs) < seg:   # pad to the compiled shape
            xs = np.concatenate([
                xs, np.full((seg - len(xs), DIM), 1e15, np.float32)
            ])
        d, i = seg_topk(jnp.asarray(xs), qj)
        d, i = np.asarray(d), np.asarray(i).astype(np.int64) + s
        i[d >= 1e29] = -1
        cd = np.concatenate([best_d, d], axis=1)
        ci = np.concatenate([best_i, i], axis=1)
        ord_ = np.argsort(cd, axis=1, kind="stable")[:, :K]
        best_d = np.take_along_axis(cd, ord_, axis=1)
        best_i = np.take_along_axis(ci, ord_, axis=1)
    truth = best_i
    log(f"oracle ready {time.perf_counter() - t0:.0f}s")
    out["oracle_queries"] = 256
    _write(out)

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
    _write(out)

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
    _write(out)          # sweep recorded even if the QPS step dies
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
    _write(out)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

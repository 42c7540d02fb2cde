"""Headline benchmark: vector-query throughput on one TPU chip at the
recall gate (BASELINE.json north star: >=50k QPS/chip at recall@10>=0.95,
plus graph-build throughput).

Two engines are measured (see turdb_tpu/models/ivf.py for why both exist):
  - IVF-Flat (clustered, block-contiguous — the TPU throughput path)
  - HNSW     (the reference's algorithm, fixed-degree batched beam)
The headline is the fastest engine that clears the recall gate; all
details go to stderr.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "qps", "vs_baseline": N/50000}
"""

import json
import os
import sys
import time

import numpy as np

N = int(os.environ.get("TURDB_BENCH_N", 100_000))
DIM = int(os.environ.get("TURDB_BENCH_DIM", 128))
K = 10
N_QUERIES = int(os.environ.get("TURDB_BENCH_Q", 16384))
RECALL_GATE = 0.95
BASELINE_QPS = 50_000.0  # BASELINE.json: >=50k QPS/chip at recall@10>=0.95
SKIP_HNSW = os.environ.get("TURDB_BENCH_SKIP_HNSW") == "1"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_pool(rng, n, dim, n_clusters=1024):
    """Clustered synthetic embeddings (SIFT-like structure, not uniform).
    Base and queries split from ONE pool so both share the distribution."""
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32) * 4.0
    assign = rng.integers(0, n_clusters, size=n)
    x = centers[assign] + rng.standard_normal((n, dim)).astype(np.float32)
    return x.astype(np.float32)


def recall_of(ids, truth):
    return float(
        np.mean([len(set(p[p >= 0]) & set(t)) / len(t) for p, t in zip(ids, truth)])
    )


def qps_of(search_fn, queries, batch=1024, reps=1, device=True):
    """Throughput with device-resident, STRICTLY UNIQUE query batches
    (the relay dedupes repeated identical executions, so repeating inputs
    inflates numbers), pipeline kept full (one sync at the end). Host->
    device staging here runs through a ~10MB/s relay and would measure
    the tunnel, not the engine."""
    import jax
    import jax.numpy as jnp

    nb = len(queries) // batch
    if device:
        batches = [
            jnp.asarray(queries[b * batch : (b + 1) * batch]) for b in range(nb)
        ]
        jax.block_until_ready(batches)
    else:
        batches = [queries[b * batch : (b + 1) * batch] for b in range(nb)]
    search_fn(batches[0])  # warm/compile
    t0 = time.perf_counter()
    outs = []
    for _ in range(reps):
        for qb in batches:
            outs.append(search_fn(qb))
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    return reps * nb * batch / dt


def latency_stats(search_fn, queries, batch=1024, n=15):
    lats = []
    for _ in range(n):
        t0 = time.perf_counter()
        search_fn(queries[:batch])
        lats.append((time.perf_counter() - t0) * 1e3)
    lats = np.array(lats)
    return (
        np.percentile(lats, 50),
        np.percentile(lats, 95),
        np.percentile(lats, 99),
    )


def main():
    import jax

    from turdb_tpu.models.flat import FlatIndex
    from turdb_tpu.models.hnsw import HnswIndex
    from turdb_tpu.models.ivf import IvfIndex

    rng = np.random.default_rng(0)
    log(f"devices: {jax.devices()}")
    pool = make_pool(rng, N + N_QUERIES, DIM)
    x, queries = pool[:N], pool[N:]
    sample = queries[:256]

    flat = FlatIndex(dim=DIM, capacity=N)
    flat.add(x)
    _, truth = flat.search(sample, k=K)
    log("ground truth ready")

    results = []

    # ---- IVF (the TPU throughput engine) --------------------------------
    for tag, kw in (
        ("ivf_f32", dict()),
        ("ivf_sq8", dict(sq8=True, rerank=4 * K)),
    ):
        idx = IvfIndex(dim=DIM, **kw)
        t0 = time.perf_counter()
        idx.add(x)
        idx.train()
        build_s = time.perf_counter() - t0
        log(f"{tag}: build {N} in {build_s:.1f}s = {N / build_s:,.0f} vec/s "
            f"(C={idx.cfg.n_clusters}, L={idx.cfg.cluster_cap})")
        star = None
        for nprobe in (2, 4, 8, 16, 32, 64):
            _, ids = idx.search(sample, k=K, nprobe=nprobe)
            r = recall_of(ids, truth)
            log(f"  nprobe={nprobe}: recall@{K}={r:.4f}")
            if r >= RECALL_GATE:
                star = (nprobe, r)
                break
        if star is None:
            log(f"  {tag}: gate not reached")
            continue
        nprobe, r = star
        def run(q, idx=idx, nprobe=nprobe):
            d, i = idx.search(q, k=K, nprobe=nprobe, out="jax")
            return i

        qps = qps_of(run, queries)
        qps_h2d = qps_of(
            lambda q: idx.search(q, k=K, nprobe=nprobe), queries,
            reps=1, device=False,
        )
        p50, p95, p99 = latency_stats(
            lambda q: idx.search(q, k=K, nprobe=nprobe), queries
        )
        log(f"  {tag}: QPS={qps:,.0f} (host-staged {qps_h2d:,.0f}) @ "
            f"nprobe={nprobe} recall={r:.4f} "
            f"host-lat p50={p50:.1f} p95={p95:.1f} p99={p99:.1f} ms")
        results.append((tag, qps, r, N / build_s))

    # ---- HNSW (the reference algorithm) ----------------------------------
    if not SKIP_HNSW:
        idx = HnswIndex(dim=DIM, ef_construction=100, build_batch=512, capacity=N)
        t0 = time.perf_counter()
        idx.add(x)
        build_s = time.perf_counter() - t0
        log(f"hnsw: build {N} in {build_s:.1f}s = {N / build_s:,.0f} vec/s")
        star = None
        for ef in (64, 128, 256):
            _, ids = idx.search(sample, k=K, ef=ef)
            r = recall_of(ids, truth)
            log(f"  ef={ef}: recall@{K}={r:.4f}")
            if r >= RECALL_GATE:
                star = (ef, r)
                break
        if star is not None:
            ef, r = star
            def runh(q, idx=idx, ef=ef):
                d, i = idx.search(q, k=K, ef=ef, out="jax")
                return i

            qps = qps_of(runh, queries)
            log(f"  hnsw: QPS={qps:,.0f} @ ef={ef} recall={r:.4f}")
            results.append(("hnsw", qps, r, N / build_s))

    if not results:
        print(json.dumps({
            "metric": f"vector_qps_{N//1000}k_{DIM}d_recall{RECALL_GATE}@{K}",
            "value": 0.0, "unit": "qps", "vs_baseline": 0.0,
        }))
        return
    best = max(results, key=lambda r: r[1])
    log(f"headline: {best[0]} {best[1]:,.0f} qps (recall {best[2]:.4f})")
    print(
        json.dumps(
            {
                "metric": (
                    f"vector_qps_{N // 1000}k_{DIM}d_recall{RECALL_GATE}@{K}"
                    f"_{best[0]}"
                ),
                "value": round(best[1], 1),
                "unit": "qps",
                "vs_baseline": round(best[1] / BASELINE_QPS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()

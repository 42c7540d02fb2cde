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

N = int(os.environ.get("TURDB_BENCH_N", 1_000_000))   # the SIFT-1M-class gate
DIM = int(os.environ.get("TURDB_BENCH_DIM", 128))
K = 10
N_QUERIES = int(os.environ.get("TURDB_BENCH_Q", 16384))
RECALL_GATE = 0.95
BASELINE_QPS = 50_000.0  # BASELINE.json: >=50k QPS/chip at recall@10>=0.95
SKIP_HNSW = os.environ.get("TURDB_BENCH_SKIP_HNSW") == "1"
# HNSW is the parity engine, not the throughput engine; cap its measured
# store size so the bench stays inside the driver budget (it enters the
# headline only when it was measured at the FULL N)
N_HNSW = int(os.environ.get("TURDB_BENCH_N_HNSW", min(N, 200_000)))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_pool(rng, n, dim, n_clusters=1024):
    """Clustered synthetic embeddings (SIFT-like structure, not uniform).
    Base and queries split from ONE pool so both share the distribution.
    Per-point radius jitter breaks the gaussian concentration shell —
    isotropic noise puts thousands of points at near-identical distances
    and turns recall@k into a tie-breaking lottery."""
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32) * 4.0
    assign = rng.integers(0, n_clusters, size=n)
    radius = rng.uniform(0.3, 1.7, size=(n, 1)).astype(np.float32)
    x = centers[assign] + radius * rng.standard_normal((n, dim)).astype(np.float32)
    return x.astype(np.float32)


def recall_of(ids, truth):
    return float(
        np.mean([len(set(p[p >= 0]) & set(t)) / len(t) for p, t in zip(ids, truth)])
    )


def qps_of(search_fn, queries, batch=1024, reps=1, device=True):
    """Host-loop throughput (per-call). NOTE: through the axon relay,
    block_until_ready can acknowledge before real device completion, so
    this is only used for the HOST-STAGED comparison number; the honest
    headline uses `qps_device_slope` (the batch loop runs INSIDE one
    jitted program and the slope between two loop lengths isolates pure
    device time)."""
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
    out_np = [np.asarray(o) for o in outs]  # host materialization = real wait
    dt = time.perf_counter() - t0
    return reps * nb * batch / dt


def qps_device_slope(scan_fn, queries, batch=1024, m_lo=4, m_hi=16):
    """Honest device throughput: run the batch loop inside ONE jitted
    program (lax.scan over [M, B, d]) for two M values; the slope
    (T(m_hi)-T(m_lo))/(m_hi-m_lo) cancels dispatch/transfer overheads.
    Retries once on transient remote-compile relay errors."""
    import jax.numpy as jnp

    def timed(m):
        qs = jnp.asarray(queries[: m * batch].reshape(m, batch, -1))
        for attempt in (0, 1):
            try:
                np.asarray(scan_fn(qs))  # warm/compile (real wait: host copy)
                break
            except Exception as e:
                if attempt:
                    raise
                log(f"  transient compile error, retrying: {str(e)[:80]}")
                time.sleep(5)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(scan_fn(qs))
            best = min(best, time.perf_counter() - t0)
        return best

    # escalate m_hi until the slope dominates fixed overheads
    while True:
        t_lo, t_hi = timed(m_lo), timed(m_hi)
        if t_hi - t_lo > 0.5 * t_lo or m_hi * 2 * batch > len(queries):
            break
        m_lo, m_hi = m_hi, m_hi * 2
    per_batch = max((t_hi - t_lo) / (m_hi - m_lo), 1e-9)
    return batch / per_batch


def latency_stats(search_fn, queries, batch=1024, n=5):
    """Host-inclusive single-batch latency (materializes results so the
    relay can't acknowledge early)."""
    lats = []
    for i in range(n):
        qb = queries[i * batch : (i + 1) * batch]
        t0 = time.perf_counter()
        d, ids = search_fn(qb)
        np.asarray(ids)
        lats.append((time.perf_counter() - t0) * 1e3)
    lats = np.array(lats)
    return np.percentile(lats, 50), np.max(lats)


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
      try:
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
        import jax as _jax
        from functools import partial as _partial

        from turdb_tpu.models.ivf import ivf_search_impl

        cfg = idx.cfg
        state = idx.state

        @_jax.jit
        def _scan(st, qs):
            # state rides as a pytree ARGUMENT: closing over it would bake
            # ~GBs of index arrays into the program as captured constants
            # (slow lowering, duplicated HBM)
            def step(_, qb):
                d, i = ivf_search_impl(
                    st, qb, None, cfg=cfg, k=K, nprobe=nprobe
                )
                return 0, i
            _, ids = _jax.lax.scan(step, 0, qs)
            return ids

        def scan_fn(qs):
            return _scan(state, qs)

        qps = qps_device_slope(scan_fn, queries)
        log(f"  {tag}: QPS={qps:,.0f} (device-slope) @ "
            f"nprobe={nprobe} recall={r:.4f}")
        results.append((tag, qps, r, N / build_s, idx, nprobe))
      except Exception as e:
        log(f"  {tag}: FAILED ({str(e)[:120]})")

    # ---- HNSW (the reference algorithm) ----------------------------------
    if not SKIP_HNSW:
      try:
        nh = N_HNSW
        xh = x[:nh]
        if nh == N:
            truth_h = truth
        else:
            fh = FlatIndex(dim=DIM, capacity=nh)
            fh.add(xh)
            _, truth_h = fh.search(sample, k=K)
        idx = HnswIndex(dim=DIM, ef_construction=100, build_batch=512,
                        capacity=nh)
        t0 = time.perf_counter()
        idx.add(xh)
        build_s = time.perf_counter() - t0
        log(f"hnsw: build {nh} in {build_s:.1f}s = {nh / build_s:,.0f} vec/s "
            f"({'bulk' if nh >= idx.bulk_threshold else 'waves'})")
        star = None
        for ef in (64, 128, 256):
            _, ids = idx.search(sample, k=K, ef=ef)
            r = recall_of(ids, truth_h)
            log(f"  ef={ef}: recall@{K}={r:.4f}")
            if r >= RECALL_GATE:
                star = (ef, r)
                break
        if star is not None and nh == N:
            ef, r = star
            import jax as _jax

            from turdb_tpu.models.hnsw import hnsw_search_impl

            hcfg = idx.cfg
            hstate = idx.state
            def_ef = idx._descent_ef

            @_jax.jit
            def _hscan(st, qs):
                def step(_, qb):
                    _, ids = hnsw_search_impl(
                        st, qb, None, cfg=hcfg, k=K, ef=ef,
                        iters=ef + ef // 2, filtered=False,
                        descent_ef=def_ef,
                    )
                    return 0, ids
                _, out = _jax.lax.scan(step, 0, qs)
                return out

            qps = qps_device_slope(
                lambda qs: _hscan(hstate, qs), queries, m_lo=2, m_hi=4
            )
            log(f"  hnsw: QPS={qps:,.0f} (device-slope) @ ef={ef} "
                f"recall={r:.4f}")
            results.append(("hnsw", qps, r, N / build_s, idx, ef))
      except Exception as e:
        log(f"  hnsw: FAILED ({str(e)[:120]})")

    # ---- shell-data diagnostic (pure isotropic gaussian = distance
    # concentration: neighbors differ by ~1% in distance, so recall@k is
    # a near-exhaustive-search problem for ANY ANN index — measured: IVF
    # recall tracks the probed-cell fraction, HNSW wave == bulk at the
    # same low ceiling; see docs/PERF.md "honest negative result"). This
    # logs the curve; it is NOT a pass/fail gate. -----------------------
    if os.environ.get("TURDB_BENCH_SHELL", "1") == "1" and results:
      try:
        ns = N
        xs_ = rng.standard_normal((ns, DIM)).astype(np.float32)
        qs_ = rng.standard_normal((256, DIM)).astype(np.float32)
        fs = FlatIndex(dim=DIM, capacity=ns)
        fs.add(xs_)
        _, ts_ = fs.search(qs_, k=K)
        sidx = IvfIndex(dim=DIM)
        t0 = time.perf_counter()
        sidx.add(xs_)
        if sidx.state is None:
            sidx.train()
        log(f"shell build: {ns / (time.perf_counter() - t0):,.0f} vec/s")
        for nprobe in (8, 32, 128):
            _, ids = sidx.search(qs_, k=K, nprobe=nprobe)
            r = recall_of(ids, ts_)
            log(f"  shell {ns // 1000}k nprobe={nprobe}: recall@{K}={r:.4f} "
                f"(diagnostic only: concentration-pathological data)")
            if r >= RECALL_GATE:
                break
        del sidx, fs, xs_
      except Exception as e:
        log(f"  shell check FAILED ({str(e)[:120]})")

    if not results:
        print(json.dumps({
            "metric": f"vector_qps_{N//1000}k_{DIM}d_recall{RECALL_GATE}@{K}",
            "value": 0.0, "unit": "qps", "vs_baseline": 0.0,
        }))
        return
    best = max(results, key=lambda r: r[1])
    tag, qps_b, r_b, build_b, bidx, knob = best
    if tag.startswith("ivf"):
        p50, pmax = latency_stats(
            lambda q: bidx.search(q, k=K, nprobe=knob), queries
        )
        log(f"  winner host-lat (B=1024, incl. tunnel): p50={p50:.0f} "
            f"max={pmax:.0f} ms")
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

"""CPU sweep: serving-path recall vs graph-path recall (small scale)."""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
from turdb_tpu.models.flat import FlatIndex
from turdb_tpu.models.hnsw import HnswIndex

rng = np.random.default_rng(5)
n, d = 9000, 32

def _clustered(rng, n, d, c=64):
    centers = rng.standard_normal((c, d)).astype(np.float32) * 4.0
    a = rng.integers(0, c, size=n)
    r = rng.uniform(0.3, 1.7, size=(n, 1)).astype(np.float32)
    return (centers[a] + r * rng.standard_normal((n, d)).astype(np.float32))

x = _clustered(rng, n + 64, d)
base, queries = x[:n], x[n:]
idx = HnswIndex(dim=d, capacity=n, bulk_threshold=4096)
idx.add(base)
flat = FlatIndex(dim=d, capacity=n)
flat.add(base)
_, truth = flat.search(queries, k=10)

def rec(ids):
    return np.mean([len(set(p[p >= 0]) & set(t)) / len(t)
                    for p, t in zip(ids, truth)])

_, ig = idx.search(queries, k=10, ef=64)
print("graph ef=64:", rec(ig), flush=True)
idx.pack_serving()
for ef, ns, ex in [(64, 32, 4), (96, 32, 4),
                   (64, 32, 8)]:
    _, i_s = idx.search_serve(queries, k=10, ef=ef, nseed=ns, expand=ex)
    print(f"serve ef={ef} nseed={ns} expand={ex}: {rec(i_s):.4f}", flush=True)

"""Persistent-compilation-cache A/B for cold builds (VERDICT r4 item
#5): the measured ~60s cold/warm delta of the 1M HNSW bulk build is
relay-priced XLA compiles. If jax's disk cache round-trips through the
axon backend (serialize/deserialize executable), a cold PROCESS reuses
a prior process's compiles and cold ~= warm.

Runs the same 262k x 128d IVF cold build in three child processes:
no-cache, cache-miss (fresh dir), cache-hit (same dir). Writes the
three wall times; adoption decision goes to docs/PERF.md.
"""

import json
import os
import subprocess
import sys
import time

CHILD = r'''
import os, sys, time
import numpy as np
cc = os.environ.get("TCC")
import jax
if cc:
    jax.config.update("jax_compilation_cache_dir", cc)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, "/root/repo")
from turdb_tpu.models.ivf import IvfIndex
rng = np.random.default_rng(0)
x = rng.standard_normal((262144, 128)).astype(np.float32)
t0 = time.perf_counter()
idx = IvfIndex(dim=128)
idx.add(x); idx.train()
np.asarray(idx.search(x[:64], k=10)[1])
print(f"BUILD {time.perf_counter()-t0:.1f}", flush=True)
'''


def run(tag, env_extra):
    env = dict(os.environ, **env_extra)
    t0 = time.perf_counter()
    r = subprocess.run([sys.executable, "-c", CHILD], env=env,
                       capture_output=True, text=True, timeout=1800)
    wall = time.perf_counter() - t0
    build = None
    for line in r.stdout.splitlines():
        if line.startswith("BUILD"):
            build = float(line.split()[1])
    print(f"{tag}: wall={wall:.1f}s build={build} rc={r.returncode}",
          file=sys.stderr, flush=True)
    if r.returncode != 0:
        print(r.stderr[-500:], file=sys.stderr)
    return {"wall_s": round(wall, 1), "build_s": build, "rc": r.returncode}


def main():
    cachedir = "/tmp/turdb_cc_exp"
    import shutil

    shutil.rmtree(cachedir, ignore_errors=True)
    out = {
        "nocache": run("nocache", {}),
        "cache_miss": run("cache_miss", {"TCC": cachedir}),
        "cache_hit": run("cache_hit", {"TCC": cachedir}),
    }
    try:
        out["cache_entries"] = len(os.listdir(cachedir))
    except OSError:
        out["cache_entries"] = 0
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""turdb_tpu — a TPU-native data engine with the capabilities of kahflane/TurDB.

A brand-new design (not a port): the reference's pointer-chasing Rust engine
(reference: /root/reference, see SURVEY.md) becomes a columnar, HBM-resident,
batched JAX/XLA/Pallas engine. The centerpiece is the vector index-and-query
engine (reference src/hnsw/): fixed-degree int32 adjacency arrays searched by
batched beam search with MXU distance matmuls, sharded over a device mesh.
Around it: a PostgreSQL-flavored SQL layer, MVCC snapshot isolation, WAL
durability, secondary indexes, and a CLI — host-side, columnar-first.

Public API mirrors the reference's `Database` surface
(reference src/database/database.rs:127, src/lib.rs:98-101).
"""

__version__ = "0.1.0"

import os as _os


def _enable_compile_cache():
    """Persistent XLA compilation cache — OPT-IN via TURDB_COMPILE_CACHE=dir.

    Off by default: with the axon TPU backend, cached-executable
    deserialization was observed to hang the process (>9 min stalls),
    while cold compiles finish in minutes. On CPU it is safe and useful.
    """
    if not _os.environ.get("TURDB_COMPILE_CACHE"):
        return
    try:
        import jax

        cache_dir = _os.environ["TURDB_COMPILE_CACHE"]
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    except Exception:
        pass


_enable_compile_cache()

from turdb_tpu.ops.distance import Metric  # noqa: F401

__all__ = ["Metric", "Database", "connect", "RecoveryInfo",
           "CheckpointInfo", "__version__"]


def __getattr__(name):
    # Lazy: importing the SQL/database stack pulls in the full engine; keep
    # `import turdb_tpu` cheap for kernel-only users (ops/, models/).
    if name in ("Database", "connect", "RecoveryInfo", "CheckpointInfo"):
        from turdb_tpu.database import api

        return getattr(api, name)
    raise AttributeError(f"module 'turdb_tpu' has no attribute {name!r}")

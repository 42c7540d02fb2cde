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

from turdb_tpu.ops.distance import Metric  # noqa: F401

__all__ = ["Metric", "Database", "connect", "__version__"]


def __getattr__(name):
    # Lazy: importing the SQL/database stack pulls in the full engine; keep
    # `import turdb_tpu` cheap for kernel-only users (ops/, models/).
    if name in ("Database", "connect"):
        from turdb_tpu.database.api import Database, connect

        return {"Database": Database, "connect": connect}[name]
    raise AttributeError(f"module 'turdb_tpu' has no attribute {name!r}")

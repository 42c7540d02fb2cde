"""Memory-budgeted spilling for large joins.

Counterpart of reference src/sql/subquery/spill.rs (SpillableBuffer:416 —
memory-budgeted materialization spilling to temp files) and
partition_spiller.rs (Grace hash join partitions:116). Columnar version:
a Batch partition serializes to an .npz temp file (object columns via
pickle) and reloads on demand; the Grace join partitions both sides by
key hash so only one partition pair is resident at a time.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np

from turdb_tpu.sql.expr import Batch, Col


class SpilledBatch:
    """A Batch on disk. Load() materializes; the file deletes on close."""

    def __init__(self, batch: Batch, tmpdir: str):
        fd, self.path = tempfile.mkstemp(suffix=".npz", dir=tmpdir)
        os.close(fd)
        payload = {"__n": np.asarray([batch.n])}
        names = []
        for j, ((q, nm), c) in enumerate(zip(batch.names, batch.cols)):
            names.append((q or "", nm))
            payload[f"v{j}"] = c.values
            payload[f"n{j}"] = c.nulls
        self._names = names
        np.savez(self.path, **payload, allow_pickle=True)
        self.n = batch.n

    def load(self) -> Batch:
        with np.load(self.path, allow_pickle=True) as z:
            n = int(z["__n"][0])
            b = Batch(n)
            for j, (q, nm) in enumerate(self._names):
                b.add(q or None, nm, Col(z[f"v{j}"], z[f"n{j}"]))
            return b

    def close(self):
        try:
            os.remove(self.path)
        except OSError:
            pass


def estimate_batch_bytes(b: Batch) -> int:
    total = 0
    for c in b.cols:
        v = c.values
        if v.dtype == object:
            total += v.size * 64  # rough per-object estimate
        else:
            total += v.nbytes
        total += c.nulls.nbytes
    return total


def partition_batch(b: Batch, key_cols: list, nparts: int):
    """Split a batch into nparts by hash of the key columns (NULL keys go
    to partition 0; they never match in an equi-join anyway)."""
    import numpy as _np

    h = _np.zeros(b.n, _np.uint64)
    for kc in key_cols:
        vals = kc.values
        if vals.dtype == object or vals.ndim > 1:
            hh = _np.asarray(
                [hash(_to_hashable(x)) & 0xFFFFFFFFFFFFFFFF for x in vals],
                _np.uint64,
            )
        else:
            hh = _np.asarray(vals).view(_np.uint8).reshape(b.n, -1)
            hh = _np.sum(
                hh.astype(_np.uint64)
                * _np.arange(1, hh.shape[1] + 1, dtype=_np.uint64),
                axis=1,
            )
        h = h * _np.uint64(1099511628211) + hh
        h &= _np.uint64(0xFFFFFFFFFFFFFFFF)
    part = (h % _np.uint64(nparts)).astype(_np.int64)
    for kc in key_cols:
        part[kc.nulls] = 0
    return [b.take(_np.flatnonzero(part == p)) for p in range(nparts)]


def _to_hashable(x):
    if isinstance(x, np.ndarray):
        return x.tobytes()
    if isinstance(x, (list, dict)):
        return repr(x)
    return x

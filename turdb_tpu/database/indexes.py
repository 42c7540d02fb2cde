"""Secondary index structures.

Replaces the reference's on-disk B-tree secondary indexes (reference
src/btree/, SURVEY.md §2.2) with host-side sorted key arrays — the
"sorted-array index amenable to vectorized search" called for by the
build plan (§2.2 TPU-native equivalent): a sorted run of
(order-preserving key bytes, rowid) plus an unsorted delta buffer merged
on threshold. Lookups binary-search the run (numpy searchsorted on object
arrays / bisect) and linear-scan the delta. MVCC note: entries may
reference invisible row versions — every probe re-verifies visibility at
the table, so no index undo is needed on rollback.

Vector (HNSW) table indexes wrap models.hnsw.HnswIndex with rowid↔slot
maps (reference PersistentHnswIndex.row_id_map, hnsw/mod.rs:767-859).
"""

from __future__ import annotations

import bisect

import numpy as np

from turdb_tpu.models.hnsw import HnswIndex
from turdb_tpu.models.ivf import IvfIndex
from turdb_tpu.ops.distance import Metric
from turdb_tpu.records.keys import encode_key

_MERGE_THRESHOLD = 2048


class SortedKeyIndex:
    def __init__(self, name: str, columns: list[str], unique: bool = False):
        self.name = name
        self.columns = columns
        self.unique = unique
        self._run: list[tuple[bytes, int]] = []   # sorted
        self._delta: list[tuple[bytes, int]] = []
        self._deleted: set[tuple[bytes, int]] = set()

    def make_key(self, values) -> bytes:
        return encode_key(list(values))

    def insert(self, key: bytes, rowid: int):
        self._deleted.discard((key, rowid))
        self._delta.append((key, rowid))
        if len(self._delta) >= _MERGE_THRESHOLD:
            self._merge()

    def delete(self, key: bytes, rowid: int):
        self._deleted.add((key, rowid))

    def _merge(self):
        merged = sorted(set(self._run) | set(self._delta))
        if self._deleted:
            merged = [e for e in merged if e not in self._deleted]
            self._deleted.clear()
        self._run = merged
        self._delta = []

    def find(self, key: bytes) -> list[int]:
        """All rowids with exactly this key (deduplicated: the same
        (key, rowid) can live in both the run and the delta after a
        delete + re-insert cycle)."""
        out = []
        lo = bisect.bisect_left(self._run, (key, -(2**62)))
        while lo < len(self._run) and self._run[lo][0] == key:
            e = self._run[lo]
            if e not in self._deleted:
                out.append(e[1])
            lo += 1
        for k, r in self._delta:
            if k == key and (k, r) not in self._deleted:
                out.append(r)
        return list(dict.fromkeys(out))

    def range(self, lo_key: bytes | None, hi_key: bytes | None,
              lo_inc=True, hi_inc=True) -> list[int]:
        self._merge()
        lo = 0
        if lo_key is not None:
            lo = bisect.bisect_left(self._run, (lo_key, -(2**62))) if lo_inc else \
                bisect.bisect_right(self._run, (lo_key, 2**62))
        hi = len(self._run)
        if hi_key is not None:
            hi = bisect.bisect_right(self._run, (hi_key, 2**62)) if hi_inc else \
                bisect.bisect_left(self._run, (hi_key, -(2**62)))
        return [r for _, r in self._run[lo:hi]]

    def __len__(self):
        return len(self._run) + len(self._delta) - len(self._deleted)


_METRIC_BY_OP = {"<->": Metric.L2, "<#>": Metric.IP, "<=>": Metric.COSINE}


class IvfTableIndex:
    """IVF-Flat index over one VECTOR column — same maintenance surface as
    HnswTableIndex (append-only; MVCC via the allowed mask) but backed by
    the clustered block-contiguous engine (models/ivf.py), which is the
    TPU throughput path."""

    using = "IVF"

    def __init__(self, name: str, column: str, dim: int,
                 metric: Metric = Metric.L2, n_clusters: int | None = None,
                 nprobe: int = 8, sq8: bool = False, rerank: int = 0):
        self.name = name
        self.column = column
        self.metric = metric
        self.index = IvfIndex(
            dim=dim, metric=metric, n_clusters=n_clusters,
            nprobe=nprobe, sq8=sq8, rerank=rerank,
        )
        self.rowid_to_slot: dict[int, int] = {}
        self.slot_to_rowid: dict[int, int] = {}
        self._pending_vecs: list = []
        self._pending_rowids: list = []

    def insert(self, rowid: int, vec: np.ndarray, defer: bool = False,
               txn=None):
        old = self.rowid_to_slot.get(rowid)
        if txn is not None and old is not None:
            txn.undo.append((self, "hnsw_remap", rowid, old))
        self._pending_vecs.append(np.asarray(vec, np.float32))
        self._pending_rowids.append(rowid)
        if not defer:
            self.flush_pending()

    def flush_pending(self):
        if not self._pending_vecs:
            return
        vecs = np.stack(self._pending_vecs)
        rids = list(self._pending_rowids)
        self._pending_vecs = []
        self._pending_rowids = []
        slots = self.index.add(vecs)
        for r, s in zip(rids, slots):
            self.rowid_to_slot[r] = int(s)
            self.slot_to_rowid[int(s)] = r

    _undo_one = None  # assigned below (shared with HnswTableIndex)

    def delete(self, rowid: int):
        slot = self.rowid_to_slot.pop(rowid, None)
        if slot is not None:
            self.index.delete([slot])
            self.slot_to_rowid.pop(slot, None)

    def search(self, query: np.ndarray, k: int, ef: int | None = None,
               allowed_rowids: set | None = None):
        """(dists, rowids); `ef` maps to nprobe scaling for API parity."""
        self.flush_pending()
        allowed = None
        if allowed_rowids is not None:
            allowed = np.zeros(max(self.index.size, 1), bool)
            for r in allowed_rowids:
                s = self.rowid_to_slot.get(r)
                if s is not None and s < len(allowed):
                    allowed[s] = True
        nprobe = None
        if ef is not None:
            nprobe = max(self.index.nprobe, ef // 8)
        d, slots = self.index.search(
            np.asarray(query, np.float32)[None], k=k, nprobe=nprobe,
            allowed=allowed,
        )
        rowids = [
            self.slot_to_rowid.get(int(s), -1) if s >= 0 else -1
            for s in slots[0]
        ]
        return d[0], rowids


class HnswTableIndex:
    """HNSW index over one VECTOR column of a table."""

    def __init__(self, name: str, column: str, dim: int,
                 metric: Metric = Metric.L2, m: int = 16,
                 ef_construction: int = 100, ef_search: int = 64):
        self.name = name
        self.column = column
        self.metric = metric
        self.index = HnswIndex(
            dim=dim, metric=metric, m=m,
            ef_construction=ef_construction, ef_search=ef_search,
        )
        self.rowid_to_slot: dict[int, int] = {}
        self.slot_to_rowid: dict[int, int] = {}
        self._pending_vecs: list = []
        self._pending_rowids: list = []

    def insert(self, rowid: int, vec: np.ndarray, defer: bool = False,
               txn=None):
        """Append-only graph insertion. A previous vector for the same
        rowid stays in the graph but becomes unreachable once the mapping
        moves (search masks by CURRENT mapping). With `txn`, the mapping
        swap registers an undo hook so rollback restores the old vector."""
        old = self.rowid_to_slot.get(rowid)
        if txn is not None and old is not None:
            txn.undo.append((self, "hnsw_remap", rowid, old))
        if defer:
            self._pending_vecs.append(np.asarray(vec, np.float32))
            self._pending_rowids.append(rowid)
            return
        (slot,) = self.index.add(
            np.asarray(vec, np.float32)[None], row_ids=np.asarray([rowid], np.uint64)
        )
        self.rowid_to_slot[rowid] = int(slot)
        self.slot_to_rowid[int(slot)] = rowid

    def _undo_one(self, kind: str, rowid: int, prev_slot, txn):
        """Transaction-undo hook (same protocol as ColumnarTable._undo_one):
        restore the rowid→slot mapping and drop any pending re-insert."""
        if kind != "hnsw_remap":
            return
        for j in range(len(self._pending_rowids) - 1, -1, -1):
            if self._pending_rowids[j] == rowid:
                self._pending_rowids.pop(j)
                self._pending_vecs.pop(j)
        cur = self.rowid_to_slot.get(rowid)
        if cur is not None and cur != prev_slot:
            self.slot_to_rowid.pop(cur, None)
        self.rowid_to_slot[rowid] = prev_slot
        self.slot_to_rowid[prev_slot] = rowid

    def flush_pending(self):
        if not self._pending_vecs:
            return
        vecs = np.stack(self._pending_vecs)
        rids = np.asarray(self._pending_rowids, np.uint64)
        slots = self.index.add(vecs, row_ids=rids)
        for r, s in zip(self._pending_rowids, slots):
            self.rowid_to_slot[r] = int(s)
            self.slot_to_rowid[int(s)] = r
        self._pending_vecs = []
        self._pending_rowids = []

    def delete(self, rowid: int):
        slot = self.rowid_to_slot.pop(rowid, None)
        if slot is not None:
            self.index.delete([slot])
            self.slot_to_rowid.pop(slot, None)

    def search(self, query: np.ndarray, k: int, ef: int | None = None,
               allowed_rowids: set | None = None):
        """Returns (dists, rowids). `allowed_rowids`: restrict results
        (MVCC visibility — search_filtered semantics, reference
        hnsw/mod.rs:1176: invisible nodes traversed, excluded)."""
        self.flush_pending()
        allowed = None
        if allowed_rowids is not None:
            allowed = np.zeros(max(self.index.size, 1), bool)
            for r in allowed_rowids:
                s = self.rowid_to_slot.get(r)
                if s is not None and s < len(allowed):
                    allowed[s] = True
        d, slots = self.index.search(
            np.asarray(query, np.float32)[None], k=k, ef=ef, allowed=allowed
        )
        rowids = [
            self.slot_to_rowid.get(int(s), -1) if s >= 0 else -1
            for s in slots[0]
        ]
        return d[0], rowids


# IVF shares the remap-undo protocol with HNSW (append-only doctrine)
IvfTableIndex._undo_one = HnswTableIndex._undo_one

"""Mesh-sharded IVF: one logical clustered index over the device mesh.

Same mesh contract as sharded.py's HNSW (SURVEY.md §2.9): each db-axis
device owns an independent IVF sub-index over its partition of the
vectors; query batches are data-parallel over the `data` axis and
replicated over `db`; per-shard top-k merges with an all-gather over ICI.
This is the BASELINE.json scale config ("100M vectors sharded across
v5p-8 mesh"): per-chip IVF probes are block-contiguous HBM reads, and the
only cross-chip traffic is the [S, B, k] result merge.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from turdb_tpu.config import MESH_AXIS_DATA, MESH_AXIS_DB, MESH_AXIS_HOST
from turdb_tpu.models.ivf import IvfConfig, IvfIndex, IvfState, ivf_search_impl
from turdb_tpu.ops.distance import Metric, normalize_rows
from turdb_tpu.ops.topk import topk_smallest


class ShardedIvfIndex:
    """Build: per-shard host IvfIndex (balanced round-robin routing), then
    the states stack into [S, ...] leaves laid out over the mesh. Search:
    shard_map(local probe) + all-gather merge. Global ids pack as
    shard * stride + slot."""

    def __init__(self, dim: int, mesh, metric: Metric = Metric.L2,
                 nprobe: int = 8, sq8: bool = False, rerank: int = 0,
                 n_clusters: int | None = None, cluster_cap: int | None = None,
                 keep_f32: bool = True):
        self.mesh = mesh
        self.n_db = mesh.shape[MESH_AXIS_DB]
        self.n_host = mesh.shape.get(MESH_AXIS_HOST, 1)
        self.n_shards = self.n_host * self.n_db
        # the store shards over (host, db) combined; with one host this
        # degenerates to the plain db-axis layout
        self._store_spec = (
            P((MESH_AXIS_HOST, MESH_AXIS_DB)) if self.n_host > 1
            else P(MESH_AXIS_DB)
        )
        self.n_data = mesh.shape.get(MESH_AXIS_DATA, 1)
        self.dim = dim
        self.metric = metric
        # keep_f32=False: per-shard compact stores (int8 probe + SQ16
        # rerank, 3 bytes/dim) — the BASELINE 100M-mesh config fits in
        # ~4.8GB/chip on a db=8 mesh instead of ~8GB f32
        self.shards = [
            IvfIndex(
                dim=dim, metric=metric, nprobe=nprobe, sq8=sq8, rerank=rerank,
                n_clusters=n_clusters, cluster_cap=cluster_cap,
                keep_f32=keep_f32,
            )
            for _ in range(self.n_shards)
        ]
        self.nprobe = nprobe
        self._stacked: IvfState | None = None
        self._cfg: IvfConfig | None = None
        self._fn_cache: dict = {}
        # gid = shard*stride + slot, computed in int32 on device: pick the
        # largest power-of-two stride with n_shards*stride <= 2^31 so the
        # packing can never alias (db=8 -> 268M slots/shard; the 100M-mesh
        # target is 12.5M/shard). add() asserts the per-shard bound.
        stride = 1 << 30
        while stride * self.n_shards > (1 << 31):
            stride >>= 1
        self.id_stride = stride

    def __len__(self):
        return sum(s.size for s in self.shards)

    def add(self, vecs: np.ndarray) -> np.ndarray:
        """Balanced routing (smallest shards fill first); returns packed
        global ids."""
        vecs = np.atleast_2d(np.asarray(vecs, np.float32))
        n = len(vecs)
        sizes = np.asarray([s.size for s in self.shards])
        order = np.argsort(sizes, kind="stable")
        gids = np.empty(n, np.int64)
        splits = np.array_split(np.arange(n), self.n_shards)
        for rank, s_idx in enumerate(order):
            idxs = splits[rank]
            if len(idxs) == 0:
                continue
            slots = self.shards[int(s_idx)].add(vecs[idxs])
            if self.shards[int(s_idx)].size > self.id_stride:
                raise ValueError(
                    f"shard {int(s_idx)} exceeds id_stride={self.id_stride}; "
                    "packed gids would alias"
                )
            gids[idxs] = int(s_idx) * self.id_stride + np.asarray(slots)
        self._stacked = None
        return gids

    def train(self):
        for s in self.shards:
            if s.state is None:
                s.train()
        caps = {(s.cfg.n_clusters, s.cfg.cluster_cap) for s in self.shards}
        if len(caps) > 1:
            # re-train stragglers to the max geometry so states stack
            cmax = max(s.cfg.n_clusters for s in self.shards)
            lmax = max(s.cfg.cluster_cap for s in self.shards)
            for s in self.shards:
                if (s.cfg.n_clusters, s.cfg.cluster_cap) != (cmax, lmax):
                    s._n_clusters = cmax
                    s._cluster_cap = lmax
                    s._retrain_with(
                        np.zeros((0, self.dim), np.float32), np.zeros(0, np.int64)
                    )
        self._cfg = self.shards[0].cfg
        stacked = jax.tree.map(
            lambda *leaves: jnp.stack(leaves), *[s.state for s in self.shards]
        )
        self._stacked = jax.device_put(
            stacked, NamedSharding(self.mesh, self._store_spec)
        )

    def search(self, queries, k: int, nprobe: int | None = None):
        """Returns (dists [B,k], packed gids [B,k]): gid = shard*stride+slot."""
        if self._stacked is None:
            self.train()
        q = np.atleast_2d(np.asarray(queries, np.float32))
        b0 = q.shape[0]
        bpad = -(-b0 // self.n_data) * self.n_data
        if bpad != b0:
            q = np.concatenate([q, np.zeros((bpad - b0, self.dim), np.float32)])
        if self.metric is Metric.COSINE:
            q = np.asarray(normalize_rows(jnp.asarray(q)))
        p = min(nprobe or self.nprobe, self._cfg.n_clusters)
        d, gi = self._search_fn(k, p)(self._stacked, jnp.asarray(q))
        return np.asarray(d)[:b0], np.asarray(gi, np.int64)[:b0]

    def unpack(self, gids):
        gids = np.asarray(gids)
        return gids // self.id_stride, gids % self.id_stride

    def _search_fn(self, k: int, nprobe: int):
        key = (k, nprobe, self.id_stride)
        if key in self._fn_cache:
            return self._fn_cache[key]
        cfg = self._cfg
        stride = self.id_stride

        multihost = self.n_host > 1
        n_db = self.n_db

        def local(state, q):
            state = jax.tree.map(lambda x: x[0], state)
            d, i = ivf_search_impl(state, q, None, cfg=cfg, k=k, nprobe=nprobe)
            shard = jax.lax.axis_index(MESH_AXIS_DB)
            if multihost:
                shard = shard + jax.lax.axis_index(MESH_AXIS_HOST) * n_db
            gi = jnp.where(i >= 0, shard.astype(jnp.int32) * stride + i, -1)
            # level 1: merge across the db axis (ICI within a host)
            ad = jax.lax.all_gather(d, MESH_AXIS_DB)
            ai = jax.lax.all_gather(gi, MESH_AXIS_DB)
            ad = jnp.moveaxis(ad, 0, 1).reshape(q.shape[0], -1)
            ai = jnp.moveaxis(ai, 0, 1).reshape(q.shape[0], -1)
            md, mi = topk_smallest(ad, ai, k)
            if not multihost:
                return md, mi
            # level 2: only [B, k] crosses DCN (two-level merge)
            hd = jax.lax.all_gather(md, MESH_AXIS_HOST)
            hi = jax.lax.all_gather(mi, MESH_AXIS_HOST)
            hd = jnp.moveaxis(hd, 0, 1).reshape(q.shape[0], -1)
            hi = jnp.moveaxis(hi, 0, 1).reshape(q.shape[0], -1)
            return topk_smallest(hd, hi, k)

        fn = jax.jit(
            jax.shard_map(
                local,
                mesh=self.mesh,
                in_specs=(self._store_spec, P(MESH_AXIS_DATA)),
                out_specs=(P(MESH_AXIS_DATA), P(MESH_AXIS_DATA)),
                check_vma=False,
            )
        )
        self._fn_cache[key] = fn
        return fn

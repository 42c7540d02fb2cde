"""HNSW snapshot persistence: reopen must restore the graph (not rebuild)
and WAL-replayed rows must reindex incrementally (reference .hnsw file
format role, src/hnsw/storage.rs)."""

import os

import numpy as np
import pytest

from turdb_tpu.database.api import Database

RNG = np.random.default_rng(31)


def vec_lit(v):
    return "'[" + ",".join(f"{x:.6f}" for x in v) + "]'"


def test_snapshot_written_and_loaded(tmp_path):
    p = str(tmp_path / "db")
    db = Database.create(p)
    db.execute("CREATE TABLE t (id BIGINT PRIMARY KEY, emb VECTOR(8))")
    vecs = RNG.standard_normal((120, 8)).astype(np.float32)
    for i in range(120):
        db.execute(f"INSERT INTO t VALUES ({i}, {vec_lit(vecs[i])})")
    db.execute("CREATE INDEX ix ON t USING HNSW (emb)")
    db.close()
    assert os.path.exists(os.path.join(p, "main", "t.ix.hnsw"))

    db2 = Database.open(p)
    info = db2.catalog["main"]["t"]
    assert getattr(info, "_hnsw_loaded", False), "snapshot must load, not rebuild"
    h = info.hnsw["ix"]
    assert len(h.rowid_to_slot) == 120
    q = vecs[13]
    rows = db2.query(f"SELECT id FROM t ORDER BY emb <-> {vec_lit(q)} LIMIT 1")
    assert rows[0][0] == 13
    db2.close()


def test_incremental_reindex_after_wal(tmp_path):
    p = str(tmp_path / "db")
    db = Database.create(p)
    db.execute("CREATE TABLE t (id BIGINT PRIMARY KEY, emb VECTOR(8))")
    vecs = RNG.standard_normal((80, 8)).astype(np.float32)
    for i in range(60):
        db.execute(f"INSERT INTO t VALUES ({i}, {vec_lit(vecs[i])})")
    db.execute("CREATE INDEX ix ON t USING HNSW (emb)")
    db.checkpoint()
    # post-checkpoint WAL-only rows
    for i in range(60, 80):
        db.execute(f"INSERT INTO t VALUES ({i}, {vec_lit(vecs[i])})")
    far = vecs[5] + 50.0
    db.execute(f"UPDATE t SET emb = {vec_lit(far)} WHERE id = 5")
    db.wal.flush()
    # crash (no close/checkpoint)
    db2 = Database.open(p)
    q = vecs[70]
    rows = db2.query(f"SELECT id FROM t ORDER BY emb <-> {vec_lit(q)} LIMIT 1")
    assert rows[0][0] == 70, "WAL-only row must be searchable after recovery"
    rows = db2.query(f"SELECT id FROM t ORDER BY emb <-> {vec_lit(far)} LIMIT 1")
    assert rows[0][0] == 5, "WAL-updated vector must be reindexed"
    db2.close()

"""TOAST on the LIVE write path (reference dml/insert.rs pipeline:
TOAST before record build, storage/toast.rs:70-73): oversized values are
stored out-of-line at INSERT time, WAL frames carry 17-byte pointers plus
chunk frames, reads/RETURNING detoast, vacuum prunes orphaned chunks, and
both crash recovery and checkpoint round-trip the store."""

import numpy as np
import pytest

from turdb_tpu.database.api import Database
from turdb_tpu.storage.toast import Toasted

BIG = "x" * (10 * 1024 * 1024)  # 10MB TEXT (threshold is 1000B)
SMALL = "hello"


@pytest.fixture()
def db(tmp_path):
    d = Database.create(str(tmp_path / "db"))
    yield d


def test_insert_stores_pointer_not_value(db):
    db.execute("CREATE TABLE t (id INT, doc TEXT)")
    db.execute("INSERT INTO t VALUES (1, ?)", [BIG])
    db.execute("INSERT INTO t VALUES (2, ?)", [SMALL])
    info = db.catalog["main"]["t"]
    i1 = info.table.latest[1]
    assert isinstance(info.table.cols["doc"][i1], Toasted)
    assert info.table.toast.chunks  # chunks live out-of-line
    i2 = info.table.latest[2]
    assert info.table.cols["doc"][i2] == SMALL  # below threshold: inline


def test_select_and_returning_detoast(db):
    db.execute("CREATE TABLE t (id INT, doc TEXT)")
    res = db.execute("INSERT INTO t VALUES (1, ?) RETURNING doc", [BIG])
    assert res.rows[0][0] == BIG
    assert db.query("SELECT doc FROM t WHERE id = 1") == [(BIG,)]
    assert db.query("SELECT LENGTH(doc) FROM t") == [(len(BIG),)]


def test_blob_toast_roundtrip(db):
    db.execute("CREATE TABLE b (id INT, raw BLOB)")
    payload = bytes(range(256)) * 8192  # 2MB blob
    db.execute("INSERT INTO b VALUES (1, ?)", [payload])
    assert db.query("SELECT raw FROM b")[0][0] == payload


def test_crash_recovery_replays_toast(db, tmp_path):
    db.execute("CREATE TABLE t (id INT, doc TEXT)")
    db.execute("INSERT INTO t VALUES (1, ?)", [BIG])
    db.wal.flush()  # crash: no checkpoint
    db2 = Database.open(str(tmp_path / "db"))
    assert db2.query("SELECT doc FROM t WHERE id = 1") == [(BIG,)]
    info = db2.catalog["main"]["t"]
    assert isinstance(info.table.cols["doc"][info.table.latest[1]], Toasted)
    db2.close()


def test_checkpoint_snapshot_roundtrips_store(db, tmp_path):
    db.execute("CREATE TABLE t (id INT, doc TEXT)")
    db.execute("INSERT INTO t VALUES (1, ?), (2, 'tiny')", [BIG])
    db.close()  # checkpoint + snapshot
    db2 = Database.open(str(tmp_path / "db"))
    rows = dict(db2.query("SELECT id, doc FROM t"))
    assert rows[1] == BIG and rows[2] == "tiny"
    info = db2.catalog["main"]["t"]
    assert isinstance(info.table.cols["doc"][info.table.latest[1]], Toasted)
    db2.close()


def test_update_and_vacuum_prune_chunks(db):
    db.execute("CREATE TABLE t (id INT, doc TEXT)")
    db.execute("INSERT INTO t VALUES (1, ?)", [BIG])
    info = db.catalog["main"]["t"]
    db.execute("UPDATE t SET doc = ? WHERE id = 1", ["y" * 5000])
    assert db.query("SELECT doc FROM t") == [("y" * 5000,)]
    db.execute("VACUUM")
    # the 10MB value's chunks are unreferenced after vacuum
    total = sum(
        sum(len(p) for p in parts) for parts in info.table.toast.chunks.values()
    )
    assert total < 10 * 1024 * 1024
    assert db.query("SELECT doc FROM t") == [("y" * 5000,)]


def test_delete_then_vacuum_frees_all(db):
    db.execute("CREATE TABLE t (id INT, doc TEXT)")
    db.execute("INSERT INTO t VALUES (1, ?)", [BIG])
    info = db.catalog["main"]["t"]
    db.execute("DELETE FROM t")
    db.execute("VACUUM")
    assert not info.table.toast.chunks


def test_toasted_values_in_where_and_order(db):
    db.execute("CREATE TABLE t (id INT, doc TEXT)")
    a, b = "a" * 2000, "b" * 2000
    db.execute("INSERT INTO t VALUES (1, ?), (2, ?)", [a, b])
    assert db.query("SELECT id FROM t WHERE doc = ?", [b]) == [(2,)]
    assert db.query("SELECT id FROM t ORDER BY doc DESC") == [(2,), (1,)]


def test_wal_row_frame_is_small(db):
    """The row image in the WAL must carry the 17B pointer, not 10MB."""
    from turdb_tpu.storage.wal import FrameType

    db.execute("CREATE TABLE t (id INT, doc TEXT)")
    db.execute("INSERT INTO t VALUES (1, ?)", [BIG])
    db.wal.flush()
    sizes = {}
    for lsn, ft, txn, tid, payload in db.wal.replay():
        sizes.setdefault(ft, []).append(len(payload))
    assert max(sizes[FrameType.INSERT]) < 200  # pointer-size row image
    assert sum(sizes[FrameType.TOAST]) >= len(BIG)  # chunks logged once

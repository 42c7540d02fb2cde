"""Regression tests for the round-2 verdict weak-list items
(VERDICT round 2: UPDATE..FROM join planning, checkpoint under
long-lived readers, LSM tombstone purge)."""

import tempfile

import numpy as np
import pytest

from turdb_tpu.database.api import Database


@pytest.fixture()
def db():
    d = Database.create(tempfile.mkdtemp() + "/wf")
    yield d
    d.close()


def test_update_from_equi_join_scales(db):
    """10k x 10k UPDATE..FROM must plan as an equi-join (reference
    dml/update.rs:1-25), not a cross join (round-2 weak #6: died on the
    nested-loop guard)."""
    db.execute("CREATE TABLE a(id INT, v INT)")
    db.execute("CREATE TABLE b(id INT, w INT)")
    db.bulk_insert("a", [{"id": i, "v": 0} for i in range(10000)])
    db.bulk_insert("b", [{"id": i, "w": i * 2} for i in range(10000)])
    r = db.execute("UPDATE a SET v = b.w FROM b WHERE a.id = b.id AND b.w > 10")
    assert r.rows_affected == 9994
    assert db.query("SELECT v FROM a WHERE id = 100") == [(200,)]
    assert db.query("SELECT v FROM a WHERE id = 3") == [(0,)]


def test_update_from_residual_only(db):
    db.execute("CREATE TABLE a(id INT, v INT)")
    db.execute("CREATE TABLE c(x INT)")
    for i in range(20):
        db.execute(f"INSERT INTO a VALUES ({i}, 0)")
    db.execute("INSERT INTO c VALUES (15)")
    r = db.execute("UPDATE a SET v = 1 FROM c WHERE a.id > c.x")
    assert r.rows_affected == 4
    assert db.query("SELECT count(*) FROM a WHERE v = 1") == [(4,)]


def test_checkpoint_under_long_reader(tmp_path):
    """A long-lived reader txn must not block WAL truncation (reference
    wal.rs:50-60; round-2 weak #11)."""
    path = str(tmp_path / "ck")
    db = Database.create(path)
    db.execute("CREATE TABLE t(v INT)")
    for i in range(50):
        db.execute(f"INSERT INTO t VALUES ({i})")
    db.execute("BEGIN")                       # long-lived txn
    db.execute("INSERT INTO t VALUES (999)")  # uncommitted write
    frames_before = db.wal.frame_count
    db.checkpoint()
    # WAL kept only the active txn's frames
    assert db.wal.frame_count < frames_before
    # reader/writer txn still consistent
    assert db.query("SELECT count(*) FROM t") == [(51,)]
    db.execute("COMMIT")
    db.close()
    db2 = Database.open(path)
    assert db2.query("SELECT count(*) FROM t") == [(51,)]
    assert db2.query("SELECT count(*) FROM t WHERE v = 999") == [(1,)]
    db2.close()


def test_checkpoint_under_aborted_txn(tmp_path):
    path = str(tmp_path / "ck2")
    db = Database.create(path)
    db.execute("CREATE TABLE t(v INT)")
    db.execute("INSERT INTO t VALUES (1)")
    db.execute("BEGIN")
    db.execute("INSERT INTO t VALUES (2)")
    db.checkpoint()
    db.execute("ROLLBACK")
    db.close()
    db2 = Database.open(path)
    assert db2.query("SELECT count(*) FROM t") == [(1,)]
    db2.close()

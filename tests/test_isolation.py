"""Snapshot-isolation anomaly battery at the SQL level.

Pins the isolation MODEL (reference mvcc/mod.rs:8-41: snapshot
isolation, single-writer-per-row, readers never block):
  - dirty reads: impossible
  - non-repeatable reads: impossible (snapshot)
  - lost updates: prevented (row write conflict)
  - write skew: ALLOWED (classic SI; the reference makes the same trade)
  - phantoms: not seen within a snapshot
"""

import pytest

from turdb_tpu.database.api import Database
from turdb_tpu.mvcc.manager import TxnConflict


@pytest.fixture()
def db(tmp_path):
    d = Database.create(str(tmp_path / "iso"))
    d.execute("CREATE TABLE acct (id INT PRIMARY KEY, bal INT)")
    d.execute("INSERT INTO acct VALUES (1, 100)")
    d.execute("INSERT INTO acct VALUES (2, 100)")
    yield d
    d.close()


def test_no_dirty_read(db):
    h2 = db.handle()
    db.execute("BEGIN")
    db.execute("UPDATE acct SET bal = 0 WHERE id = 1")
    assert h2.query("SELECT bal FROM acct WHERE id = 1") == [(100,)]
    db.execute("ROLLBACK")
    assert h2.query("SELECT bal FROM acct WHERE id = 1") == [(100,)]


def test_repeatable_read_and_no_phantoms(db):
    h2 = db.handle()
    db.execute("BEGIN")
    assert db.query("SELECT count(*) FROM acct") == [(2,)]
    h2.execute("INSERT INTO acct VALUES (3, 50)")
    h2.execute("UPDATE acct SET bal = 999 WHERE id = 1")
    # same snapshot: no phantom row, no changed balance
    assert db.query("SELECT count(*) FROM acct") == [(2,)]
    assert db.query("SELECT bal FROM acct WHERE id = 1") == [(100,)]
    db.execute("COMMIT")
    # new snapshot sees both
    assert db.query("SELECT count(*) FROM acct") == [(3,)]
    assert db.query("SELECT bal FROM acct WHERE id = 1") == [(999,)]


def test_lost_update_prevented(db):
    h2 = db.handle()
    db.execute("BEGIN")
    h2.execute("BEGIN")
    db.execute("UPDATE acct SET bal = bal + 10 WHERE id = 1")
    with pytest.raises(TxnConflict):     # single-writer-per-row
        h2.execute("UPDATE acct SET bal = bal + 20 WHERE id = 1")
    h2.execute("ROLLBACK")
    db.execute("COMMIT")
    assert db.query("SELECT bal FROM acct WHERE id = 1") == [(110,)]


def test_write_skew_allowed(db):
    """Classic SI write skew: two txns each read BOTH balances (sum 200,
    constraint sum >= 0 'checked' by the app), then each withdraws 150
    from a DIFFERENT row. SI permits both commits (disjoint write sets);
    the combined result violates the app constraint. Pinned as ALLOWED:
    this is the documented SI trade, not a bug."""
    h2 = db.handle()
    db.execute("BEGIN")
    h2.execute("BEGIN")
    assert db.query("SELECT sum(bal) FROM acct") == [(200,)]
    assert h2.query("SELECT sum(bal) FROM acct") == [(200,)]
    db.execute("UPDATE acct SET bal = bal - 150 WHERE id = 1")
    h2.execute("UPDATE acct SET bal = bal - 150 WHERE id = 2")
    db.execute("COMMIT")
    h2.execute("COMMIT")
    assert db.query("SELECT sum(bal) FROM acct") == [(-100,)]


def test_write_skew_blocked_by_for_update(db):
    """FOR UPDATE materializes the read-write dependency as row locks,
    turning the write-skew history into a conflict — the documented
    application-level fix."""
    h2 = db.handle()
    db.execute("BEGIN")
    h2.execute("BEGIN")
    assert len(db.query("SELECT id FROM acct FOR UPDATE")) == 2
    with pytest.raises(TxnConflict):
        h2.query("SELECT id FROM acct FOR UPDATE")
    h2.execute("ROLLBACK")
    db.execute("UPDATE acct SET bal = bal - 150 WHERE id = 1")
    db.execute("COMMIT")
    assert db.query("SELECT sum(bal) FROM acct") == [(50,)]


def test_read_your_own_writes(db):
    db.execute("BEGIN")
    db.execute("UPDATE acct SET bal = 7 WHERE id = 1")
    db.execute("INSERT INTO acct VALUES (9, 9)")
    assert db.query("SELECT bal FROM acct WHERE id = 1") == [(7,)]
    assert db.query("SELECT count(*) FROM acct") == [(3,)]
    db.execute("ROLLBACK")
    assert db.query("SELECT count(*) FROM acct") == [(2,)]


def test_first_committer_wins_after_release(db):
    """A row lock released by ROLLBACK frees the row for the other txn
    within the same open snapshot epoch."""
    h2 = db.handle()
    db.execute("BEGIN")
    db.execute("UPDATE acct SET bal = 1 WHERE id = 1")
    db.execute("ROLLBACK")
    h2.execute("BEGIN")
    h2.execute("UPDATE acct SET bal = 2 WHERE id = 1")
    h2.execute("COMMIT")
    assert db.query("SELECT bal FROM acct WHERE id = 1") == [(2,)]

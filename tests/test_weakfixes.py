"""Regression tests for the round-2 verdict weak-list items
(VERDICT round 2: UPDATE..FROM join planning, checkpoint under
long-lived readers, LSM tombstone purge)."""

import tempfile

import numpy as np
import pytest

from turdb_tpu.database.api import Database, SqlError


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


def test_lsm_tombstones_purged():
    """Delete-heavy workloads must not grow the tombstone set without
    bound (round-2 weak #9)."""
    from turdb_tpu.database.indexes import SortedKeyIndex

    ix = SortedKeyIndex("i", ["k"])
    n = 40000
    for i in range(n):
        ix.insert(ix.make_key([i]), i)
    for i in range(0, n, 2):
        ix.delete(ix.make_key([i]), i)
    # trigger flush/compaction via more inserts
    for i in range(n, n + 5000):
        ix.insert(ix.make_key([i]), i)
    ix._flush()
    assert len(ix._deleted) < 22000  # purged as merges touch the entries
    # deleted keys invisible, survivors present
    assert ix.find(ix.make_key([0])) == []
    assert ix.find(ix.make_key([1])) == [1]
    assert ix.find(ix.make_key([n + 10])) == [n + 10]
    total = len(ix)
    assert total == n // 2 + 5000


def test_for_update_locks_rows(tmp_path):
    """SELECT .. FOR UPDATE takes row locks visible to other handles
    (reference ast.rs:116-264 FOR UPDATE + page_locks analog)."""
    from turdb_tpu.mvcc.manager import TxnConflict

    db = Database.create(str(tmp_path / "fu"))
    db.execute("CREATE TABLE t(id INT, v INT)")
    db.execute("INSERT INTO t VALUES (1, 10)")
    db.execute("INSERT INTO t VALUES (2, 20)")
    h2 = db.handle()
    db.execute("BEGIN")
    rows = db.query("SELECT * FROM t WHERE id = 1 FOR UPDATE")
    assert rows == [(1, 10)]
    h2.execute("BEGIN")
    with pytest.raises(TxnConflict):
        h2.execute("UPDATE t SET v = 99 WHERE id = 1")
    h2.execute("ROLLBACK")
    # unlocked row still writable from the other handle
    h2.execute("BEGIN")
    h2.execute("UPDATE t SET v = 21 WHERE id = 2")
    h2.execute("COMMIT")
    db.execute("COMMIT")
    assert db.query("SELECT v FROM t WHERE id = 2") == [(21,)]
    db.close()


def test_expression_indexes(db):
    """CREATE INDEX ON t(expr): maintained on DML, used by the planner,
    unique-enforced (reference ddl.rs expression indexes)."""
    db.execute("CREATE TABLE u(id INT PRIMARY KEY, email TEXT, a INT, b INT)")
    for i in range(500):
        db.execute(
            f"INSERT INTO u VALUES ({i}, 'User{i}@X.com', {i % 50}, {i % 7})"
        )
    db.execute("CREATE INDEX idx_lower ON u(lower(email))")
    db.execute("CREATE INDEX idx_sum ON u((a + b))")
    plan = "\n".join(
        str(r) for r in db.query(
            "EXPLAIN SELECT id FROM u WHERE lower(email) = 'user77@x.com'"
        )
    )
    assert "idx_lower" in plan
    assert db.query(
        "SELECT id FROM u WHERE lower(email) = 'user77@x.com'"
    ) == [(77,)]
    exp = sum(1 for i in range(500) if i % 50 + i % 7 == 10)
    assert db.query("SELECT count(*) FROM u WHERE a + b = 10") == [(exp,)]
    db.execute("UPDATE u SET email = 'Moved@Y.com' WHERE id = 77")
    assert db.query("SELECT id FROM u WHERE lower(email) = 'user77@x.com'") == []
    assert db.query(
        "SELECT id FROM u WHERE lower(email) = 'moved@y.com'"
    ) == [(77,)]
    db.execute("CREATE UNIQUE INDEX uq ON u(lower(email))")
    with pytest.raises(Exception):
        db.execute("INSERT INTO u VALUES (9999, 'MOVED@y.com', 1, 1)")
    # duplicate-key CREATE UNIQUE INDEX fails cleanly
    db.execute("CREATE TABLE v(s TEXT)")
    db.execute("INSERT INTO v VALUES ('dup@z.com')")
    db.execute("INSERT INTO v VALUES ('DUP@z.com')")
    with pytest.raises(Exception):
        db.execute("CREATE UNIQUE INDEX uq2 ON v(upper(s))")


def test_cross_handle_snapshot_isolation(tmp_path):
    """SQL-level SI across handles (reference SharedDatabase semantics):
    a transaction keeps reading its snapshot while another handle
    commits; new statements after COMMIT see the new data."""
    db = Database.create(str(tmp_path / "si"))
    db.execute("CREATE TABLE t(id INT, v INT)")
    db.execute("INSERT INTO t VALUES (1, 10)")
    h2 = db.handle()

    db.execute("BEGIN")
    assert db.query("SELECT v FROM t WHERE id = 1") == [(10,)]
    h2.execute("BEGIN")
    h2.execute("UPDATE t SET v = 11 WHERE id = 1")
    h2.execute("COMMIT")
    # reader still sees its snapshot
    assert db.query("SELECT v FROM t WHERE id = 1") == [(10,)]
    db.execute("COMMIT")
    assert db.query("SELECT v FROM t WHERE id = 1") == [(11,)]

    # writes inside a txn are visible to that txn only
    db.execute("BEGIN")
    db.execute("UPDATE t SET v = 12 WHERE id = 1")
    assert db.query("SELECT v FROM t WHERE id = 1") == [(12,)]
    assert h2.query("SELECT v FROM t WHERE id = 1") == [(11,)]
    db.execute("ROLLBACK")
    assert db.query("SELECT v FROM t WHERE id = 1") == [(11,)]
    db.close()


class TestOnUpdateForeignKeys:
    """ON UPDATE CASCADE / RESTRICT / SET NULL when a referenced key
    changes (reference dml/update.rs:1925-2000; expectations from
    tests/constraints_cascade.rs:460-528). Round-3-found gap: the
    actions were parsed and stored but never enforced."""

    def test_on_update_cascade(self, db):
        db.execute("CREATE TABLE departments (id INT PRIMARY KEY, n TEXT)")
        db.execute("CREATE TABLE employees (id INT PRIMARY KEY, dept_id "
                   "INT REFERENCES departments(id) ON UPDATE CASCADE)")
        db.execute("INSERT INTO departments VALUES (1, 'eng')")
        db.execute("INSERT INTO employees VALUES (100, 1), (101, 1)")
        db.execute("UPDATE departments SET id = 10 WHERE id = 1")
        assert db.query(
            "SELECT count(*) FROM employees WHERE dept_id = 10") == [(2,)]
        assert db.query(
            "SELECT count(*) FROM employees WHERE dept_id = 1") == [(0,)]

    def test_on_update_restrict_blocks(self, db):
        db.execute("CREATE TABLE c (id INT PRIMARY KEY)")
        db.execute("CREATE TABLE p (cid INT REFERENCES c(id) "
                   "ON UPDATE RESTRICT)")
        db.execute("INSERT INTO c VALUES (1)")
        db.execute("INSERT INTO p VALUES (1)")
        with pytest.raises(Exception, match="FOREIGN KEY"):
            db.execute("UPDATE c SET id = 100 WHERE id = 1")
        # unreferenced keys still update
        db.execute("INSERT INTO c VALUES (2)")
        db.execute("UPDATE c SET id = 20 WHERE id = 2")

    def test_on_update_set_null(self, db):
        db.execute("CREATE TABLE a (id INT PRIMARY KEY)")
        db.execute("CREATE TABLE b (x INT, aid INT REFERENCES a(id) "
                   "ON UPDATE SET NULL)")
        db.execute("INSERT INTO a VALUES (7)")
        db.execute("INSERT INTO b VALUES (1, 7)")
        db.execute("UPDATE a SET id = 8 WHERE id = 7")
        assert db.query("SELECT x, aid FROM b") == [(1, None)]

    def test_no_clause_stays_unenforced(self, db):
        # the reference enforces only FKs that DECLARE an ON UPDATE
        # action (update.rs:1925 filters on_update.is_some())
        db.execute("CREATE TABLE p2 (id INT PRIMARY KEY)")
        db.execute("CREATE TABLE c2 (pid INT REFERENCES p2(id))")
        db.execute("INSERT INTO p2 VALUES (1)")
        db.execute("INSERT INTO c2 VALUES (1)")
        db.execute("UPDATE p2 SET id = 2 WHERE id = 1")
        assert db.query("SELECT pid FROM c2") == [(1,)]


def test_delete_using(tmp_path):
    """DELETE .. USING (reference ast.rs:318 / parser.rs:1739): planned
    as a hash equi-join like UPDATE..FROM; multi-match deletes once;
    residual predicates and RETURNING apply."""
    db = Database.create(str(tmp_path / "du"))
    db.execute("CREATE TABLE t (id INT PRIMARY KEY, v INT)")
    db.execute("CREATE TABLE kill (id INT)")
    for i in range(10):
        db.execute(f"INSERT INTO t VALUES ({i}, {i * 10})")
    for i in (3, 7, 5, 5):     # 5 twice: join matches must dedupe
        db.execute(f"INSERT INTO kill VALUES ({i})")
    r = db.execute("DELETE FROM t USING kill WHERE t.id = kill.id")
    assert r.rows_affected == 3
    assert [x[0] for x in db.query("SELECT id FROM t ORDER BY id")] == \
        [0, 1, 2, 4, 6, 8, 9]
    # alias + residual + RETURNING
    r = db.execute("DELETE FROM t USING kill k "
                   "WHERE t.id = k.id + 1 AND t.v > 50 RETURNING id, v")
    assert sorted(r.rows) == [(6, 60), (8, 80)]
    db.close()


def test_for_update_wait_policies(tmp_path):
    """FOR UPDATE NOWAIT raises on a held lock; SKIP LOCKED drops the
    locked rows from the result (reference parser.rs:549-554
    WaitPolicy)."""
    from turdb_tpu.mvcc.manager import TxnConflict

    db = Database.create(str(tmp_path / "wp"))
    db.execute("CREATE TABLE t (id INT PRIMARY KEY, v INT)")
    for i in range(5):
        db.execute(f"INSERT INTO t VALUES ({i}, {i})")
    h2 = db.handle()
    db.execute("BEGIN")
    assert db.query("SELECT id FROM t WHERE id < 2 FOR UPDATE") == \
        [(0,), (1,)]
    h2.execute("BEGIN")
    with pytest.raises(TxnConflict):
        h2.query("SELECT id FROM t WHERE id < 2 FOR UPDATE NOWAIT")
    assert h2.query(
        "SELECT id FROM t WHERE id < 4 FOR UPDATE SKIP LOCKED"
    ) == [(2,), (3,)]
    # rows acquired via SKIP LOCKED are now locked against the first txn
    with pytest.raises(TxnConflict):
        db.execute("UPDATE t SET v = 99 WHERE id = 2")
    h2.execute("COMMIT")
    db.execute("ROLLBACK")
    db.close()


def test_for_clause_modes_and_of(tmp_path):
    """FOR SHARE / NO KEY UPDATE / KEY SHARE parse and lock (exclusive —
    conservative superset); OF restricts which joined tables get locked
    and errors when it names nothing in the result (reference
    parser.rs:505-560 ForClause)."""
    from turdb_tpu.mvcc.manager import TxnConflict

    db = Database.create(str(tmp_path / "fm"))
    db.execute("CREATE TABLE a (id INT PRIMARY KEY, v INT)")
    db.execute("CREATE TABLE b (id INT PRIMARY KEY, w INT)")
    for i in range(4):
        db.execute(f"INSERT INTO a VALUES ({i}, {i})")
        db.execute(f"INSERT INTO b VALUES ({i}, {i * 2})")
    h2 = db.handle()
    db.execute("BEGIN")
    assert db.query(
        "SELECT a.id FROM a JOIN b ON a.id = b.id WHERE a.id = 1 "
        "FOR SHARE OF b"
    ) == [(1,)]
    h2.execute("BEGIN")
    with pytest.raises(TxnConflict):
        h2.execute("UPDATE b SET w = 9 WHERE id = 1")
    h2.execute("UPDATE a SET v = 9 WHERE id = 1")   # a NOT locked (OF b)
    h2.execute("ROLLBACK")
    db.execute("ROLLBACK")
    db.execute("BEGIN")
    assert len(db.query("SELECT id FROM a FOR NO KEY UPDATE")) == 4
    assert len(db.query("SELECT id FROM b FOR KEY SHARE NOWAIT")) == 4
    with pytest.raises(SqlError):
        db.query("SELECT id FROM a FOR UPDATE OF nosuch")
    db.execute("ROLLBACK")
    # without OF, a join under FOR UPDATE locks BOTH tables
    db.execute("BEGIN")
    db.query("SELECT a.id FROM a JOIN b ON a.id = b.id "
             "WHERE a.id = 2 FOR UPDATE")
    h2.execute("BEGIN")
    with pytest.raises(TxnConflict):
        h2.execute("UPDATE a SET v = 1 WHERE id = 2")
    with pytest.raises(TxnConflict):
        h2.execute("UPDATE b SET w = 1 WHERE id = 2")
    h2.execute("ROLLBACK")
    db.execute("COMMIT")
    db.close()


class TestFastDmlLanes:
    """Round-5 prepared UPDATE/DELETE fast lanes (api.py
    CachedUpdatePlan/CachedDeletePlan, VERDICT r4 item #3): semantics
    must be indistinguishable from the generic path — these tests pin
    the bail conditions and cross-check results against plain execute().
    Reference analogs: tests/update_benchmark.rs correctness asserts."""

    def _mk(self, wal=True):
        d = Database.create(tempfile.mkdtemp() + "/fdml")
        if not wal:
            d.execute("PRAGMA wal = off")
        d.execute(
            "CREATE TABLE t(id INT PRIMARY KEY, a INT, b TEXT, c DOUBLE)"
        )
        ins = d.prepare("INSERT INTO t VALUES ($1, $2, $3, $4)")
        for i in range(500):
            ins.execute([i, i * 2, f"n{i}", i * 0.5])
        return d

    def test_lane_engages_and_matches_generic(self):
        from turdb_tpu.database.api import (
            CachedDeletePlan, CachedUpdatePlan,
        )

        db = self._mk()
        u = db.prepare("UPDATE t SET a = $2, b = $3 WHERE id = $1")
        assert u.execute([7, 999, "x"]).rows_affected == 1
        assert isinstance(u._plan, CachedUpdatePlan)
        # generic path on a fresh row, same statement text
        db.execute("UPDATE t SET a = $2, b = $3 WHERE id = $1",
                   [8, 999, "x"])
        assert db.query("SELECT a, b FROM t WHERE id = 7") == \
            db.query("SELECT a, b FROM t WHERE id = 8")
        d = db.prepare("DELETE FROM t WHERE id = $1")
        assert d.execute([7]).rows_affected == 1
        assert isinstance(d._plan, CachedDeletePlan)
        assert d.execute([7]).rows_affected == 0
        assert db.query("SELECT count(*) FROM t") == [(499,)]
        db.close()

    def test_update_key_column_reindexes(self):
        db = self._mk()
        u = db.prepare("UPDATE t SET id = $2 WHERE id = $1")
        assert u.execute([3, 9003]).rows_affected == 1
        assert db.query("SELECT a FROM t WHERE id = 9003") == [(6,)]
        assert db.query("SELECT a FROM t WHERE id = 3") == []
        # moving onto an existing key must raise (generic re-verify)
        from turdb_tpu.database.api import ConstraintViolation

        with pytest.raises(ConstraintViolation):
            u.execute([4, 5])
        db.close()

    def test_not_null_and_type_bails(self):
        db = Database.create(tempfile.mkdtemp() + "/fdml2")
        db.execute("CREATE TABLE t(id INT PRIMARY KEY, a INT NOT NULL)")
        db.execute("INSERT INTO t VALUES (1, 10)")
        u = db.prepare("UPDATE t SET a = $2 WHERE id = $1")
        from turdb_tpu.database.api import DatabaseError

        with pytest.raises(DatabaseError):
            u.execute([1, None])
        # wrong-typed SET value must still coerce via the generic path
        assert u.execute([1, True]).rows_affected == 1
        assert db.query("SELECT a FROM t WHERE id = 1") == [(1,)]
        db.close()

    def test_txn_and_rollback_take_generic_path(self):
        db = self._mk()
        u = db.prepare("UPDATE t SET a = $2 WHERE id = $1")
        d = db.prepare("DELETE FROM t WHERE id = $1")
        u.execute([1, 111])          # prime the fast lane
        db.execute("BEGIN")
        u.execute([1, 222])
        d.execute([2])
        assert db.query("SELECT a FROM t WHERE id = 1") == [(222,)]
        db.execute("ROLLBACK")
        assert db.query("SELECT a FROM t WHERE id = 1") == [(111,)]
        assert db.query("SELECT count(*) FROM t WHERE id = 2") == [(1,)]
        db.close()

    def test_triggers_and_children_disable_lane(self):
        db = self._mk()
        db.execute("CREATE TABLE log(msg TEXT)")
        db.execute(
            "CREATE TRIGGER tr AFTER UPDATE ON t "
            "FOR EACH ROW BEGIN INSERT INTO log VALUES ('u'); END"
        )
        u = db.prepare("UPDATE t SET a = $2 WHERE id = $1")
        assert u.execute([1, 5]).rows_affected == 1
        assert db.query("SELECT count(*) FROM log") == [(1,)]
        # FK child: DELETE must cascade, so the fast lane must not build
        db2 = Database.create(tempfile.mkdtemp() + "/fdml3")
        db2.execute("CREATE TABLE p(id INT PRIMARY KEY, v INT)")
        db2.execute("CREATE TABLE c(id INT PRIMARY KEY, pid INT "
                    "REFERENCES p(id) ON DELETE CASCADE)")
        db2.execute("INSERT INTO p VALUES (1, 10), (2, 20)")
        db2.execute("INSERT INTO c VALUES (100, 1)")
        d = db2.prepare("DELETE FROM p WHERE id = $1")
        assert d.execute([1]).rows_affected == 1
        assert db2.query("SELECT count(*) FROM c") == [(0,)]
        db.close()
        db2.close()

    def test_ddl_after_prepare_rebinds(self):
        db = self._mk()
        u = db.prepare("UPDATE t SET a = $2 WHERE id = $1")
        u.execute([1, 5])
        db.execute("CREATE UNIQUE INDEX ux ON t(a)")
        # new unique index must be enforced by the (re-bound) lane
        from turdb_tpu.database.api import ConstraintViolation

        with pytest.raises(ConstraintViolation):
            u.execute([2, 5])        # a=5 already taken by id=1
        assert u.execute([2, 7777]).rows_affected == 1
        assert db.query("SELECT id FROM t WHERE a = 7777") == [(2,)]
        db.close()

    def test_wal_replay_of_fast_frames(self):
        db = self._mk(wal=True)
        u = db.prepare("UPDATE t SET b = $2, c = $3 WHERE id = $1")
        d = db.prepare("DELETE FROM t WHERE id = $1")
        for i in range(50):
            u.execute([i, f"upd{i}", i * 9.0])
        for i in range(400, 450):
            d.execute([i])
        path = db.path
        db.close()
        db2 = Database.open(path)
        assert db2.query("SELECT b, c FROM t WHERE id = 5") \
            == [("upd5", 45.0)]
        assert db2.query("SELECT count(*) FROM t") == [(450,)]
        db2.close()

    def test_snapshot_isolation_vs_fast_update(self):
        db = self._mk()
        u = db.prepare("UPDATE t SET a = $2 WHERE id = $1")
        u.execute([1, 100])
        h = db.handle()
        h.execute("BEGIN")
        before = h.query("SELECT a FROM t WHERE id = 1")
        u.execute([1, 200])          # autocommit fast update
        # the open snapshot must still see the pre-update value
        assert h.query("SELECT a FROM t WHERE id = 1") == before
        h.execute("COMMIT")
        assert h.query("SELECT a FROM t WHERE id = 1") == [(200,)]
        db.close()

    def test_update_unique_second_index(self):
        """Round-5 generic-path fix: the self-hit on the unchanged PK
        must not mask a real conflict on a second unique index
        (dml._find_conflict exclude_rowid)."""
        from turdb_tpu.database.api import ConstraintViolation

        db = Database.create(tempfile.mkdtemp() + "/u2")
        db.execute("CREATE TABLE t(id INT PRIMARY KEY, a INT)")
        db.execute("CREATE UNIQUE INDEX ux ON t(a)")
        db.execute("INSERT INTO t VALUES (1, 10), (2, 20)")
        with pytest.raises(ConstraintViolation):
            db.execute("UPDATE t SET a = 10 WHERE id = 2")
        # unchanged key (self-hit only) must still be allowed
        assert db.execute("UPDATE t SET a = 20 WHERE id = 2") \
            .rows_affected == 1
        db.close()

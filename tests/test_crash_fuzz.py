"""Crash/corruption property tests (reference wal.rs:239-266 CRC frame
validation + fuzz targets in fuzz/Cargo.toml).

1. WAL prefix property: truncating or corrupting the WAL at a random
   byte offset must recover a PREFIX of committed transactions — never a
   partial transaction, never a crash.
2. Parser fuzz: random bytes and mutated SQL must raise SqlError (or
   parse), never crash the process.
"""

import glob
import os
import random
import shutil

import pytest

from turdb_tpu.database.api import Database
from turdb_tpu.sql.lexer import SqlError
from turdb_tpu.sql.parser import Parser

N_TXNS = 30


def _build(path):
    """A db whose WAL holds N_TXNS committed single-row txns (no
    checkpoint: close() would truncate, so keep the Wal open-ended)."""
    db = Database.create(path)
    db.execute("CREATE TABLE t(seq INT, payload TEXT)")
    for i in range(N_TXNS):
        db.execute("BEGIN")
        db.execute(f"INSERT INTO t VALUES ({i}, 'row-{i}-{'x' * (i % 17)}')")
        db.execute("COMMIT")
    db.wal.flush()
    db.wal.close()
    return db


def _wal_file(path):
    segs = sorted(glob.glob(os.path.join(path, "wal", "*")))
    assert segs
    return segs[0]


@pytest.mark.parametrize("seed", range(8))
def test_wal_truncate_prefix(tmp_path, seed):
    base = str(tmp_path / "b")
    _build(base)
    rng = random.Random(seed)
    wf = _wal_file(base)
    size = os.path.getsize(wf)
    for trial in range(6):
        case = str(tmp_path / f"t{trial}")
        shutil.copytree(base, case)
        cut = rng.randint(0, size)
        with open(_wal_file(case), "r+b") as fh:
            fh.truncate(cut)
        db = Database.open(case)
        try:
            rows = sorted(r[0] for r in db.query("SELECT seq FROM t"))
        except SqlError:
            rows = []   # cut before the DDL commit: empty prefix
        # prefix property: seq values are exactly 0..k-1 for some k
        assert rows == list(range(len(rows))), (cut, rows)
        if rows:
            # payloads intact for everything that survived
            for (seq, payload) in db.query("SELECT seq, payload FROM t"):
                assert payload == f"row-{seq}-{'x' * (seq % 17)}"
        db.close()
        shutil.rmtree(case)


@pytest.mark.parametrize("seed", range(8))
def test_wal_corrupt_byte_prefix(tmp_path, seed):
    base = str(tmp_path / "b")
    _build(base)
    rng = random.Random(100 + seed)
    wf = _wal_file(base)
    size = os.path.getsize(wf)
    for trial in range(6):
        case = str(tmp_path / f"c{trial}")
        shutil.copytree(base, case)
        pos = rng.randint(0, size - 1)
        with open(_wal_file(case), "r+b") as fh:
            fh.seek(pos)
            b = fh.read(1)
            fh.seek(pos)
            fh.write(bytes([b[0] ^ 0xFF]))
        db = Database.open(case)
        try:
            rows = sorted(r[0] for r in db.query("SELECT seq FROM t"))
        except SqlError:
            rows = []
        assert rows == list(range(len(rows))), (pos, rows)
        db.close()
        shutil.rmtree(case)


def test_parser_fuzz_random_bytes():
    rng = random.Random(42)
    for _ in range(300):
        n = rng.randint(1, 120)
        s = "".join(chr(rng.randint(1, 0x2FF)) for _ in range(n))
        try:
            Parser(s).parse_statement()
        except (SqlError, RecursionError):
            pass  # rejecting garbage is correct; crashing is not


def test_parser_fuzz_mutated_sql():
    rng = random.Random(7)
    seeds = [
        "SELECT a, count(*) FROM t WHERE x = 'y' GROUP BY a HAVING count(*) > 1",
        "INSERT INTO t (a, b) VALUES (1, 'two'), (3, NULL)",
        "UPDATE t SET a = a + 1 WHERE b IN (SELECT c FROM u)",
        "CREATE TABLE t (a INT PRIMARY KEY, b TEXT CHECK (length(b) < 9))",
        "SELECT * FROM t JOIN u ON t.a = u.b ORDER BY 1 LIMIT 5 OFFSET 2",
        "WITH cte AS (SELECT 1 AS x) SELECT x FROM cte UNION ALL SELECT 2",
    ]
    junk = list("()[]'\",.;*=<>|&%$#@!~`\\ \t\n")
    for _ in range(400):
        s = list(rng.choice(seeds))
        for _ in range(rng.randint(1, 6)):
            op = rng.random()
            i = rng.randrange(len(s) + 1) if s else 0
            if op < 0.4 and s:
                del s[min(i, len(s) - 1)]
            elif op < 0.8:
                s.insert(i, rng.choice(junk))
            elif s:
                s[min(i, len(s) - 1)] = rng.choice(junk)
        try:
            Parser("".join(s)).parse_statement()
        except (SqlError, RecursionError):
            pass


def test_wal_replay_new_ddl_surface(tmp_path):
    """Crash (no checkpoint) after CREATE TYPE / ALTER COLUMN /
    ADD CONSTRAINT DDL: WAL replay on reopen must restore the full
    catalog state and keep enforcing everything."""
    p = str(tmp_path / "ddlwal")
    db = Database.create(p)
    db.execute("CREATE TYPE mood AS ENUM ('a', 'b')")
    db.execute("CREATE TABLE t (id INT PRIMARY KEY AUTO_INCREMENT, "
               "m mood, n INT)")
    db.execute("ALTER TABLE t ALTER COLUMN n SET DEFAULT 5")
    db.execute("ALTER TABLE t ADD CONSTRAINT pos CHECK (n >= 0)")
    db.execute("INSERT INTO t (m) VALUES ('a')")
    db.wal.flush()
    db.wal.close()   # crash: no checkpoint, no snapshot

    db2 = Database.open(p)
    assert db2.query("SELECT id, m, n FROM t") == [(1, "a", 5)]
    db2.execute("INSERT INTO t (m) VALUES ('b')")
    assert db2.query("SELECT id FROM t ORDER BY id") == [(1,), (2,)]
    with pytest.raises(Exception):
        db2.execute("INSERT INTO t (m) VALUES ('zz')")       # enum
    with pytest.raises(Exception):
        db2.execute("INSERT INTO t (m, n) VALUES ('a', -1)")  # check
    db2.execute("ALTER TABLE t DROP CONSTRAINT pos")
    db2.execute("INSERT INTO t (m, n) VALUES ('a', -1)")
    db2.close()


def test_wal_replay_savepoint_rollback(tmp_path):
    """Frames appended then undone by ROLLBACK TO must NOT replay: the
    SPABORT compensation frame drops the txn's undone tail (found by a
    recovery probe: replay resurrected the rolled-back insert)."""
    p = str(tmp_path / "spwal")
    db = Database.create(p)
    db.execute("CREATE TABLE t (id INT)")
    db.execute("BEGIN")
    db.execute("INSERT INTO t VALUES (1)")
    db.execute("SAVEPOINT s1")
    db.execute("INSERT INTO t VALUES (2)")
    db.execute("SAVEPOINT s2")
    db.execute("INSERT INTO t VALUES (22)")
    db.execute("ROLLBACK TO s1")
    db.execute("INSERT INTO t VALUES (3)")
    db.execute("COMMIT")
    live = db.query("SELECT id FROM t ORDER BY id")
    assert live == [(1,), (3,)]
    db.wal.flush()
    db.wal.close()   # crash, no checkpoint

    db2 = Database.open(p)
    assert db2.query("SELECT id FROM t ORDER BY id") == live
    # checkpoint under an in-flight txn with savepoints keeps working
    db2.execute("BEGIN")
    db2.execute("INSERT INTO t VALUES (10)")
    db2.execute("SAVEPOINT a")
    db2.execute("INSERT INTO t VALUES (11)")
    h2 = db2.handle()
    h2.checkpoint()
    db2.execute("ROLLBACK TO a")
    db2.execute("COMMIT")
    db2.wal.flush()
    db2.wal.close()
    db3 = Database.open(p)
    assert db3.query("SELECT id FROM t ORDER BY id") == [(1,), (3,), (10,)]
    db3.close()


def test_wal_replay_ddl_survives_rollback(tmp_path):
    """DDL is non-transactional (live effects survive ROLLBACK); its WAL
    frames must too. DDL inside an explicit txn logs as its own committed
    unit, so recovery matches live semantics."""
    p = str(tmp_path / "ddlroll")
    db = Database.create(p)
    db.execute("BEGIN")
    db.execute("CREATE TABLE x (id INT)")
    db.execute("INSERT INTO x VALUES (1)")
    db.execute("ROLLBACK")
    assert db.query("SELECT * FROM x") == []    # table stays, row gone
    db.execute("BEGIN")
    db.execute("SAVEPOINT s")
    db.execute("CREATE TABLE y (id INT)")
    db.execute("INSERT INTO y VALUES (5)")
    db.execute("ROLLBACK TO s")
    db.execute("COMMIT")
    db.execute("BEGIN")
    db.execute("CREATE TABLE z (id INT)")
    db.execute("INSERT INTO z VALUES (9)")
    db.execute("COMMIT")
    db.wal.flush()
    db.wal.close()

    db2 = Database.open(p)
    assert db2.query("SELECT * FROM x") == []
    assert db2.query("SELECT * FROM y") == []
    assert db2.query("SELECT * FROM z") == [(9,)]
    db2.close()


@pytest.mark.parametrize("seed", range(6))
def test_crash_recovery_equivalence(tmp_path, seed):
    """Property: crash-recovery (WAL replay, no checkpoint) must yield
    exactly the state of re-running the COMMITTED statements on a fresh
    database. Random program of txns, savepoints, rollbacks, DML, and
    mid-txn DDL — the family that produced the savepoint-replay,
    auto-increment, and DDL-rollback recovery bugs."""
    import random

    rng = random.Random(seed)
    p1 = str(tmp_path / "crash")
    p2 = str(tmp_path / "oracle")
    db = Database.create(p1)
    oracle = Database.create(p2)
    oracle.execute("PRAGMA wal = off")

    def both(sql):
        db.execute(sql)
        oracle.execute(sql)

    both("CREATE TABLE t (id INT PRIMARY KEY AUTO_INCREMENT, v INT)")
    # round-3 surface rides along: statement-level trigger effects,
    # INSTEAD OF view redirection, and grant records must all recover
    # to the oracle's state
    both("CREATE TABLE audit (tag TEXT)")
    both("CREATE TRIGGER st AFTER INSERT ON t FOR EACH STATEMENT "
         "BEGIN INSERT INTO audit VALUES ('i'); END")
    both("CREATE VIEW tv AS SELECT id, v FROM t")
    both("CREATE TRIGGER iv INSTEAD OF UPDATE ON tv "
         "BEGIN UPDATE t SET v = NEW.v WHERE id = OLD.id; END")
    both(f"GRANT SELECT, INSERT ON t TO user{seed}")
    # TEMP-table traffic interleaves with everything: none of its DDL or
    # DML frames may reach the WAL (replay would reference a table that
    # no longer exists), and neighbors' frames must replay unaffected
    both("CREATE TEMP TABLE scratch (k INT, w INT)")
    next_tbl = 0
    for _ in range(12):
        kind = rng.random()
        if kind < 0.15:
            both(f"UPDATE tv SET v = v + 100 WHERE id % 3 = {seed % 3}")
            continue
        if rng.random() < 0.4:
            both(f"INSERT INTO scratch VALUES ({rng.randint(0, 9)}, "
                 f"{rng.randint(0, 99)})")
        if rng.random() < 0.15:
            both("UPDATE scratch SET w = w + 1 WHERE k % 2 = 0")
        if kind < 0.55:
            # committed txn with optional savepoint rollback
            stmts = []
            for _ in range(rng.randint(1, 4)):
                stmts.append(
                    f"INSERT INTO t (v) VALUES ({rng.randint(0, 99)})"
                )
            use_sp = rng.random() < 0.5
            db.execute("BEGIN")
            oracle.execute("BEGIN")
            applied = []
            for i, s in enumerate(stmts):
                if use_sp and i == 1:
                    both("SAVEPOINT sp")
                both(s)
                applied.append(s)
            if use_sp and len(stmts) > 1 and rng.random() < 0.6:
                both("ROLLBACK TO sp")
            both("COMMIT")
        elif kind < 0.8:
            # rolled-back txn, possibly with mid-txn DDL (DDL survives;
            # the rolled-back insert still advances the sequence, which
            # shifts LATER committed ids — so the oracle runs it too)
            db.execute("BEGIN")
            oracle.execute("BEGIN")
            if rng.random() < 0.5:
                next_tbl += 1
                both(f"CREATE TABLE x{next_tbl} (a INT)")
            both(f"INSERT INTO t (v) VALUES ({rng.randint(0, 99)})")
            both("ROLLBACK")
        else:
            both(f"UPDATE t SET v = v + 1 WHERE v < {rng.randint(10, 60)}")
    db.wal.flush()
    db.wal.close()   # crash

    recovered = Database.open(p1)
    q = "SELECT id, v FROM t ORDER BY id"
    assert recovered.query(q) == oracle.query(q), f"seed={seed}"
    qa = "SELECT count(*) FROM audit"
    assert recovered.query(qa) == oracle.query(qa), f"seed={seed} audit"
    qg = "SELECT grantee, privileges FROM turdb_catalog.grants"
    assert recovered.query(qg) == oracle.query(qg), f"seed={seed} grants"
    # the INSTEAD OF redirect still works post-recovery
    recovered.execute(f"UPDATE tv SET v = 777 WHERE id % 5 = 1")
    oracle.execute(f"UPDATE tv SET v = 777 WHERE id % 5 = 1")
    assert recovered.query(q) == oracle.query(q), f"seed={seed} post-iof"
    # post-crash inserts must not collide with any committed id (gaps
    # from rolled-back inserts may be reused after a crash — the ids
    # were never committed, PostgreSQL-style)
    before = recovered.query("SELECT max(id) FROM t")[0][0] or 0
    recovered.execute("INSERT INTO t (v) VALUES (-1)")
    assert recovered.query(
        "SELECT count(*) FROM t WHERE v = -1"
    ) == [(1,)]
    assert recovered.query("SELECT max(id) FROM t")[0][0] == before + 1
    # mid-txn DDL tables exist on both
    for i in range(1, next_tbl + 1):
        assert recovered.query(f"SELECT count(*) FROM x{i}") == \
            oracle.query(f"SELECT count(*) FROM x{i}")
    recovered.close()
    oracle.close()


def test_savepoint_trigger_crash_consistency(tmp_path):
    """Trigger effects inside a rolled-back savepoint scope are undone
    live (MVCC undo) AND at replay (their frames count toward SPABORT)."""
    p = str(tmp_path / "twx")
    db = Database.create(p)
    db.execute("CREATE TABLE t (v INT)")
    db.execute("CREATE TABLE log (v INT)")
    db.execute(
        "CREATE TRIGGER tr AFTER INSERT ON t FOR EACH ROW "
        "BEGIN INSERT INTO log VALUES (NEW.v); END"
    )
    db.execute("BEGIN")
    db.execute("INSERT INTO t VALUES (1)")
    db.execute("SAVEPOINT s")
    db.execute("INSERT INTO t VALUES (2)")
    db.execute("ROLLBACK TO s")
    db.execute("COMMIT")
    assert db.query("SELECT * FROM t") == [(1,)]
    assert db.query("SELECT * FROM log") == [(1,)]
    db.wal.flush()
    db.wal.close()
    db2 = Database.open(p)
    assert db2.query("SELECT * FROM t") == [(1,)]
    assert db2.query("SELECT * FROM log") == [(1,)]
    db2.close()

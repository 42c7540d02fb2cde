"""End-to-end SQL integration tests (the reference's
tests/integration_sql.rs + regression_smoke_test.rs category): DDL, DML,
queries, joins, aggregates, subqueries, transactions, constraints,
durability — all through the public Database API."""

import numpy as np
import pytest

from turdb_tpu.database.api import (
    ConstraintViolation,
    Database,
    DatabaseError,
    SqlError,
)


@pytest.fixture()
def db(tmp_path):
    d = Database.create(str(tmp_path / "db"))
    yield d
    d.close()


def seed(db):
    db.execute(
        "CREATE TABLE users (id BIGINT PRIMARY KEY, name TEXT NOT NULL, "
        "age INT, city TEXT)"
    )
    db.execute(
        "INSERT INTO users VALUES "
        "(1, 'alice', 30, 'berlin'), (2, 'bob', 25, 'paris'), "
        "(3, 'carol', 35, 'berlin'), (4, 'dave', NULL, 'tokyo')"
    )


class TestBasics:
    def test_create_insert_select(self, db):
        seed(db)
        rows = db.query("SELECT name FROM users WHERE age > 26 ORDER BY name")
        assert rows == [("alice",), ("carol",)]

    def test_select_expressions(self, db):
        seed(db)
        rows = db.query(
            "SELECT name, age * 2 + 1 FROM users WHERE city = 'berlin' ORDER BY id"
        )
        assert rows == [("alice", 61), ("carol", 71)]

    def test_null_semantics(self, db):
        seed(db)
        assert db.query("SELECT name FROM users WHERE age > 0 AND city = 'tokyo'") == []
        rows = db.query("SELECT name FROM users WHERE age IS NULL")
        assert rows == [("dave",)]
        rows = db.query("SELECT COALESCE(age, -1) FROM users WHERE id = 4")
        assert rows == [(-1,)]

    def test_order_limit_offset(self, db):
        seed(db)
        rows = db.query("SELECT id FROM users ORDER BY age DESC NULLS LAST LIMIT 2")
        assert rows == [(3,), (1,)]
        rows = db.query("SELECT id FROM users ORDER BY id LIMIT 2 OFFSET 1")
        assert rows == [(2,), (3,)]

    def test_distinct(self, db):
        seed(db)
        rows = db.query("SELECT DISTINCT city FROM users ORDER BY city")
        assert rows == [("berlin",), ("paris",), ("tokyo",)]

    def test_params(self, db):
        seed(db)
        rows = db.query("SELECT name FROM users WHERE age = ?", [25])
        assert rows == [("bob",)]
        db.execute("INSERT INTO users VALUES (?, ?, ?, ?)", [9, "zed", 1, "x"])
        assert db.query("SELECT name FROM users WHERE id = 9") == [("zed",)]

    def test_case_when(self, db):
        seed(db)
        rows = db.query(
            "SELECT name, CASE WHEN age >= 30 THEN 'senior' ELSE 'junior' END "
            "FROM users WHERE age IS NOT NULL ORDER BY id"
        )
        assert rows[0] == ("alice", "senior") and rows[1] == ("bob", "junior")

    def test_functions(self, db):
        rows = db.query("SELECT UPPER('abc'), LENGTH('hello'), ABS(-4), ROUND(2.7)")
        assert rows == [("ABC", 5, 4, 3.0)]
        assert db.query("SELECT SUBSTR('hello world', 7)") == [("world",)]
        assert db.query("SELECT 7 % 3, 7 / 2, 7.0 / 2") == [(1, 3, 3.5)]

    def test_like(self, db):
        seed(db)
        rows = db.query("SELECT name FROM users WHERE name LIKE '%a%' ORDER BY name")
        assert rows == [("alice",), ("carol",), ("dave",)]
        rows = db.query("SELECT name FROM users WHERE name ILIKE 'ALICE'")
        assert rows == [("alice",)]


class TestAggregates:
    def test_group_by(self, db):
        seed(db)
        rows = db.query(
            "SELECT city, COUNT(*), AVG(age) FROM users GROUP BY city ORDER BY city"
        )
        assert rows[0] == ("berlin", 2, 32.5)
        assert rows[1] == ("paris", 1, 25.0)
        assert rows[2][0] == "tokyo" and rows[2][1] == 1 and rows[2][2] is None

    def test_having(self, db):
        seed(db)
        rows = db.query(
            "SELECT city FROM users GROUP BY city HAVING COUNT(*) > 1"
        )
        assert rows == [("berlin",)]

    def test_global_aggregates(self, db):
        seed(db)
        rows = db.query("SELECT COUNT(*), MIN(age), MAX(age), SUM(age) FROM users")
        assert rows == [(4, 25, 35, 90)]

    def test_count_distinct(self, db):
        seed(db)
        assert db.query("SELECT COUNT(DISTINCT city) FROM users") == [(3,)]

    def test_string_agg(self, db):
        seed(db)
        rows = db.query(
            "SELECT string_agg(name, '|') FROM users WHERE city = 'berlin'"
        )
        assert rows == [("alice|carol",)]


class TestJoins:
    def setup_join(self, db):
        seed(db)
        db.execute("CREATE TABLE orders (oid INT PRIMARY KEY, uid BIGINT, amt DOUBLE)")
        db.execute(
            "INSERT INTO orders VALUES (1, 1, 10.0), (2, 1, 20.0), (3, 2, 5.0), "
            "(4, 99, 1.0)"
        )

    def test_inner_join(self, db):
        self.setup_join(db)
        rows = db.query(
            "SELECT u.name, o.amt FROM users u JOIN orders o ON u.id = o.uid "
            "ORDER BY o.oid"
        )
        assert rows == [("alice", 10.0), ("alice", 20.0), ("bob", 5.0)]

    def test_left_join(self, db):
        self.setup_join(db)
        rows = db.query(
            "SELECT u.name, o.oid FROM users u LEFT JOIN orders o ON u.id = o.uid "
            "WHERE o.oid IS NULL ORDER BY u.id"
        )
        assert rows == [("carol", None), ("dave", None)]

    def test_agg_join(self, db):
        self.setup_join(db)
        rows = db.query(
            "SELECT u.name, SUM(o.amt) AS total FROM users u "
            "JOIN orders o ON u.id = o.uid GROUP BY u.name ORDER BY total DESC"
        )
        assert rows == [("alice", 30.0), ("bob", 5.0)]

    def test_cross_join(self, db):
        self.setup_join(db)
        assert db.query("SELECT COUNT(*) FROM users, orders") == [(16,)]


class TestSubqueries:
    def test_in_subquery(self, db):
        seed(db)
        db.execute("CREATE TABLE vip (uid BIGINT)")
        db.execute("INSERT INTO vip VALUES (1), (3)")
        rows = db.query(
            "SELECT name FROM users WHERE id IN (SELECT uid FROM vip) ORDER BY id"
        )
        assert rows == [("alice",), ("carol",)]

    def test_scalar_subquery(self, db):
        seed(db)
        rows = db.query("SELECT (SELECT MAX(age) FROM users)")
        assert rows == [(35,)]

    def test_exists_correlated(self, db):
        seed(db)
        db.execute("CREATE TABLE pets (owner BIGINT, pname TEXT)")
        db.execute("INSERT INTO pets VALUES (1, 'rex'), (3, 'tom')")
        rows = db.query(
            "SELECT name FROM users u WHERE EXISTS "
            "(SELECT 1 FROM pets p WHERE p.owner = u.id) ORDER BY name"
        )
        assert rows == [("alice",), ("carol",)]

    def test_from_subquery(self, db):
        seed(db)
        rows = db.query(
            "SELECT t.c FROM (SELECT city AS c, COUNT(*) AS n FROM users "
            "GROUP BY city) AS t WHERE t.n > 1"
        )
        assert rows == [("berlin",)]

    def test_cte(self, db):
        seed(db)
        rows = db.query(
            "WITH b AS (SELECT * FROM users WHERE city = 'berlin') "
            "SELECT COUNT(*) FROM b"
        )
        assert rows == [(2,)]

    def test_recursive_cte(self, db):
        # arithmetic series (UNION ALL) + dedup fixpoint (UNION)
        assert db.query(
            "WITH RECURSIVE c(n) AS (SELECT 1 UNION ALL "
            "SELECT n+1 FROM c WHERE n < 5) SELECT sum(n) FROM c"
        ) == [(15,)]
        assert db.query(
            "WITH RECURSIVE c(n) AS (SELECT 1 UNION "
            "SELECT (n+1) % 7 FROM c) "
            "SELECT count(*), min(n), max(n) FROM c"
        ) == [(7, 0, 6)]
        # multi-column recursion
        assert db.query(
            "WITH RECURSIVE f(a, b) AS (SELECT 0, 1 UNION ALL "
            "SELECT b, a+b FROM f WHERE b < 100) SELECT max(b) FROM f"
        ) == [(144,)]
        # joins against a real table: transitive closure
        db.execute("CREATE TABLE edges(src INT, dst INT)")
        db.execute("INSERT INTO edges VALUES (1,2),(2,3),(3,4),(5,6)")
        assert db.query(
            "WITH RECURSIVE r(v) AS (SELECT 1 UNION "
            "SELECT e.dst FROM edges e JOIN r ON e.src = r.v) "
            "SELECT v FROM r ORDER BY v"
        ) == [(1,), (2,), (3,), (4,)]
        # ORDER BY/LIMIT bind to the finished fixpoint, not per-iteration
        assert db.query(
            "WITH RECURSIVE c(n) AS (SELECT 1 UNION ALL "
            "SELECT n+1 FROM c WHERE n < 50 ORDER BY n DESC LIMIT 10) "
            "SELECT min(n), max(n), count(*) FROM c"
        ) == [(41, 50, 10)]
        # non-recursive member under WITH RECURSIVE still evaluates once
        assert db.query(
            "WITH RECURSIVE base(x) AS (SELECT 7) SELECT x FROM base"
        ) == [(7,)]

    def test_union(self, db):
        seed(db)
        rows = db.query(
            "SELECT name FROM users WHERE id = 1 UNION ALL "
            "SELECT name FROM users WHERE id = 2 ORDER BY name"
        )
        assert rows == [("alice",), ("bob",)]
        rows = db.query(
            "SELECT city FROM users UNION SELECT city FROM users ORDER BY city"
        )
        assert len(rows) == 3


class TestDml:
    def test_update(self, db):
        seed(db)
        res = db.execute("UPDATE users SET age = age + 1 WHERE city = 'berlin'")
        assert res.rows_affected == 2
        assert db.query("SELECT age FROM users WHERE id = 1") == [(31,)]

    def test_update_returning(self, db):
        seed(db)
        res = db.execute(
            "UPDATE users SET age = 99 WHERE id = 2 RETURNING name, age"
        )
        assert res.rows == [("bob", 99)]

    def test_delete(self, db):
        seed(db)
        res = db.execute("DELETE FROM users WHERE age < 30")
        assert res.rows_affected == 1
        assert db.query("SELECT COUNT(*) FROM users") == [(3,)]

    def test_insert_returning(self, db):
        seed(db)
        res = db.execute(
            "INSERT INTO users VALUES (5, 'eve', 20, 'rome') RETURNING id, name"
        )
        assert res.rows == [(5, "eve")]

    def test_insert_select(self, db):
        seed(db)
        db.execute("CREATE TABLE old_users (id BIGINT, name TEXT)")
        db.execute(
            "INSERT INTO old_users SELECT id, name FROM users WHERE age >= 30"
        )
        assert db.query("SELECT COUNT(*) FROM old_users") == [(2,)]

    def test_on_conflict_nothing(self, db):
        seed(db)
        res = db.execute(
            "INSERT INTO users VALUES (1, 'dup', 1, 'x') ON CONFLICT (id) DO NOTHING"
        )
        assert res.rows_affected == 0
        assert db.query("SELECT name FROM users WHERE id = 1") == [("alice",)]

    def test_on_conflict_update(self, db):
        seed(db)
        db.execute(
            "INSERT INTO users VALUES (1, 'alice2', 31, 'berlin') "
            "ON CONFLICT (id) DO UPDATE SET name = excluded.name, age = excluded.age"
        )
        assert db.query("SELECT name, age FROM users WHERE id = 1") == [
            ("alice2", 31)
        ]

    def test_truncate(self, db):
        seed(db)
        db.execute("TRUNCATE TABLE users")
        assert db.query("SELECT COUNT(*) FROM users") == [(0,)]

    def test_serial(self, db):
        db.execute("CREATE TABLE logs (id SERIAL PRIMARY KEY, msg TEXT)")
        db.execute("INSERT INTO logs (msg) VALUES ('a'), ('b')")
        assert db.query("SELECT id, msg FROM logs ORDER BY id") == [
            (1, "a"), (2, "b"),
        ]

    def test_auto_increment(self, db):
        # reference README column attribute; counter persists in the
        # table header (file_manager.rs:49-60) and advances past
        # explicit values so later auto-fills never collide
        db.execute(
            "CREATE TABLE u (id BIGINT PRIMARY KEY AUTO_INCREMENT, n TEXT)"
        )
        db.execute("INSERT INTO u (n) VALUES ('a')")
        db.execute("INSERT INTO u VALUES (10, 'b')")
        db.execute("INSERT INTO u (n) VALUES ('c')")
        db.execute("INSERT INTO u VALUES (NULL, 'd')")  # NULL = auto-fill
        st = db.prepare("INSERT INTO u VALUES ($1, $2)")
        st.execute([50, "e"])
        db.execute("INSERT INTO u (n) VALUES ('f')")
        assert db.query("SELECT id, n FROM u ORDER BY id") == [
            (1, "a"), (10, "b"), (11, "c"), (12, "d"), (50, "e"), (51, "f"),
        ]

    def test_keyword_named_functions(self, db):
        assert db.query(
            "SELECT IF(1 > 0, 'y', 'n'), LEFT('hello', 2), RIGHT('hello', 2)"
        ) == [("y", "he", "lo")]


class TestConstraints:
    def test_bad_coercion_raises_clean_error(self, db):
        # non-numeric text into INT/DOUBLE/DECIMAL must raise SqlError,
        # not leak a raw ValueError from the public API (found by the
        # reference integration-test replay harness)
        from turdb_tpu.sql.lexer import SqlError

        db.execute("CREATE TABLE co (x INT, f DOUBLE, d DECIMAL)")
        for sql in (
            "INSERT INTO co (x) VALUES ('')",
            "INSERT INTO co (f) VALUES ('zz')",
            "INSERT INTO co (d) VALUES ('abc')",
        ):
            with pytest.raises(SqlError):
                db.execute(sql)
        st = db.prepare("INSERT INTO co (x) VALUES ($1)")
        with pytest.raises(SqlError):
            st.execute([""])
        db.execute("INSERT INTO co (x) VALUES ('12')")
        assert db.query("SELECT x FROM co") == [(12,)]

    def test_fast_lane_unique_lifecycle(self, db):
        # the prepared-insert fast lane's O(1) unique probe must track
        # rollback-restored rows, committed deletes, and key moves
        db.execute("CREATE TABLE fl(id INT PRIMARY KEY, a INT)")
        st = db.prepare("INSERT INTO fl VALUES ($1, $2)")
        for i in range(10):
            st.execute([i, i])
        db.execute("BEGIN")
        db.execute("DELETE FROM fl WHERE id = 5")
        db.execute("ROLLBACK")
        with pytest.raises(ConstraintViolation):
            st.execute([5, 99])
        db.execute("DELETE FROM fl WHERE id = 7")
        st.execute([7, 77])          # committed delete frees the key
        db.execute("UPDATE fl SET id = 100 WHERE id = 3")
        st.execute([3, 33])          # moved key frees the old value
        with pytest.raises(ConstraintViolation):
            st.execute([100, 1])     # ...and occupies the new one
        assert db.query("SELECT count(*) FROM fl") == [(11,)]

    def test_not_null(self, db):
        seed(db)
        with pytest.raises(ConstraintViolation):
            db.execute("INSERT INTO users (id, name) VALUES (10, NULL)")

    def test_pk_unique(self, db):
        seed(db)
        with pytest.raises(ConstraintViolation):
            db.execute("INSERT INTO users VALUES (1, 'dup', 1, 'x')")

    def test_check(self, db):
        db.execute("CREATE TABLE c (x INT CHECK (x > 0))")
        db.execute("INSERT INTO c VALUES (5)")
        with pytest.raises(ConstraintViolation):
            db.execute("INSERT INTO c VALUES (-1)")

    def test_default(self, db):
        db.execute("CREATE TABLE d (id INT, status TEXT DEFAULT 'new')")
        db.execute("INSERT INTO d (id) VALUES (1)")
        assert db.query("SELECT status FROM d") == [("new",)]

    def test_fk_insert(self, db):
        seed(db)
        db.execute(
            "CREATE TABLE posts (pid INT PRIMARY KEY, author BIGINT "
            "REFERENCES users(id))"
        )
        db.execute("INSERT INTO posts VALUES (1, 1)")
        with pytest.raises(ConstraintViolation):
            db.execute("INSERT INTO posts VALUES (2, 777)")

    def test_fk_delete_restrict(self, db):
        seed(db)
        db.execute(
            "CREATE TABLE posts (pid INT PRIMARY KEY, author BIGINT "
            "REFERENCES users(id))"
        )
        db.execute("INSERT INTO posts VALUES (1, 1)")
        with pytest.raises(ConstraintViolation):
            db.execute("DELETE FROM users WHERE id = 1")

    def test_fk_delete_cascade(self, db):
        seed(db)
        db.execute(
            "CREATE TABLE posts (pid INT PRIMARY KEY, author BIGINT "
            "REFERENCES users(id) ON DELETE CASCADE)"
        )
        db.execute("INSERT INTO posts VALUES (1, 1), (2, 1), (3, 2)")
        db.execute("DELETE FROM users WHERE id = 1")
        assert db.query("SELECT COUNT(*) FROM posts") == [(1,)]

    def test_unique_constraint(self, db):
        db.execute("CREATE TABLE u (a INT, b INT, UNIQUE (a, b))")
        db.execute("INSERT INTO u VALUES (1, 2)")
        db.execute("INSERT INTO u VALUES (1, 3)")
        with pytest.raises(ConstraintViolation):
            db.execute("INSERT INTO u VALUES (1, 2)")


class TestTransactions:
    def test_commit(self, db):
        seed(db)
        db.execute("BEGIN")
        db.execute("INSERT INTO users VALUES (10, 'x', 1, 'y')")
        db.execute("COMMIT")
        assert db.query("SELECT COUNT(*) FROM users") == [(5,)]

    def test_rollback(self, db):
        seed(db)
        db.execute("BEGIN")
        db.execute("INSERT INTO users VALUES (10, 'x', 1, 'y')")
        db.execute("ROLLBACK")
        assert db.query("SELECT COUNT(*) FROM users") == [(4,)]

    def test_txn_sees_own_writes(self, db):
        seed(db)
        db.execute("BEGIN")
        db.execute("UPDATE users SET age = 100 WHERE id = 1")
        assert db.query("SELECT age FROM users WHERE id = 1") == [(100,)]
        db.execute("ROLLBACK")
        assert db.query("SELECT age FROM users WHERE id = 1") == [(30,)]

    def test_savepoint(self, db):
        seed(db)
        db.execute("BEGIN")
        db.execute("INSERT INTO users VALUES (20, 'sp1', 1, 'a')")
        db.execute("SAVEPOINT s1")
        db.execute("INSERT INTO users VALUES (21, 'sp2', 1, 'a')")
        db.execute("ROLLBACK TO SAVEPOINT s1")
        db.execute("COMMIT")
        names = {r[0] for r in db.query("SELECT name FROM users")}
        assert "sp1" in names and "sp2" not in names


class TestDurability:
    def test_reopen_after_close(self, tmp_path):
        p = str(tmp_path / "db")
        db = Database.create(p)
        seed(db)
        db.close()
        db2 = Database.open(p)
        assert db2.query("SELECT COUNT(*) FROM users") == [(4,)]
        assert db2.query("SELECT name FROM users WHERE id = 3") == [("carol",)]
        db2.close()

    def test_crash_recovery_wal_replay(self, tmp_path):
        p = str(tmp_path / "db")
        db = Database.create(p)
        seed(db)
        db.wal.flush()
        # simulate crash: no checkpoint/close
        db2 = Database.open(p)
        assert db2.query("SELECT COUNT(*) FROM users") == [(4,)]
        db2.execute("INSERT INTO users VALUES (5, 'eve', 1, 'x')")
        db2.close()
        db3 = Database.open(p)
        assert db3.query("SELECT COUNT(*) FROM users") == [(5,)]
        db3.close()

    def test_uncommitted_not_replayed(self, tmp_path):
        p = str(tmp_path / "db")
        db = Database.create(p)
        seed(db)
        db.execute("BEGIN")
        db.execute("INSERT INTO users VALUES (99, 'ghost', 1, 'x')")
        db.wal.flush()  # crash before COMMIT
        db2 = Database.open(p)
        assert db2.query("SELECT COUNT(*) FROM users") == [(4,)]
        db2.close()

    def test_ddl_replay(self, tmp_path):
        p = str(tmp_path / "db")
        db = Database.create(p)
        db.execute("CREATE TABLE t (a INT)")
        db.execute("INSERT INTO t VALUES (1), (2)")
        db.wal.flush()
        db2 = Database.open(p)
        assert db2.query("SELECT COUNT(*) FROM t") == [(2,)]
        db2.close()


class TestMeta:
    def test_system_tables(self, db):
        seed(db)
        rows = db.query(
            "SELECT name FROM turdb_catalog.tables WHERE schema = 'main'"
        )
        assert ("users",) in rows
        rows = db.query(
            "SELECT name FROM turdb_catalog.columns WHERE \"table\" = 'users' "
            "ORDER BY position"
        )
        assert rows[0] == ("id",)

    def test_pragmas(self, db):
        assert db.execute("PRAGMA wal").rows == [(True,)]
        db.execute("PRAGMA wal_autoflush = false")
        assert db.wal_autoflush is False
        assert db.execute("PRAGMA database_mode").rows == [("ReadWrite",)]

    def test_wal_checkpoint_threshold_pragma(self, db):
        # reference pragma.rs:241-257: get/set the auto-checkpoint frame
        # threshold; a low threshold makes commits auto-checkpoint
        from turdb_tpu.config import WAL_CHECKPOINT_FRAMES

        assert db.execute("PRAGMA wal_checkpoint_threshold").rows == [
            (WAL_CHECKPOINT_FRAMES,)
        ]
        assert db.execute("PRAGMA wal_checkpoint_threshold = 4").rows == [(4,)]
        db.execute("CREATE TABLE t (id INT)")
        for i in range(5):
            db.execute(f"INSERT INTO t VALUES ({i})")
        # threshold 4 => the WAL was checkpointed+truncated along the way
        assert db.wal.frame_count < 5
        assert db.query("SELECT COUNT(*) FROM t") == [(5,)]
        # reference rejects non-numeric values with a clear error
        import pytest as _pytest
        from turdb_tpu.sql.lexer import SqlError

        with _pytest.raises(SqlError):
            db.execute("PRAGMA wal_checkpoint_threshold = 'abc'")
        with _pytest.raises(SqlError):
            db.execute("PRAGMA wal_checkpoint_threshold = 0")
        # surfaced in the wal_stats system table (system_tables.rs:102;
        # key-value schema stat_name/stat_value/updated_at)
        rows = db.query(
            "SELECT stat_value FROM turdb_catalog.wal_stats "
            "WHERE stat_name = 'wal_checkpoint_threshold'"
        )
        assert rows == [(4,)]
        # reference memory_stats shape (system_tables.rs:58-66,89-97)
        rows = db.query(
            "SELECT stat_value FROM turdb_catalog.memory_stats "
            "WHERE stat_name = 'memory_budget_total'"
        )
        assert rows[0][0] > 0

    def test_join_memory_budget_pragma(self, db):
        # reference pragma.rs: join_memory_budget caps the query pool;
        # joins above it take the Grace (spilling) path and stay correct
        assert db.execute("PRAGMA memory_budget").rows[0][0] > 0
        db.execute("CREATE TABLE l (id INT)")
        db.execute("CREATE TABLE r (id INT)")
        sl = db.prepare("INSERT INTO l VALUES ($1)")
        sr = db.prepare("INSERT INTO r VALUES ($1)")
        for i in range(500):
            sl.execute([i])
            sr.execute([i])
        assert db.execute("PRAGMA join_memory_budget = 2048").rows == [(2048,)]
        from turdb_tpu.sql.engine import STATS

        before = STATS["grace_joins"]
        assert db.query(
            "SELECT count(*) FROM l JOIN r ON l.id = r.id"
        ) == [(500,)]
        assert STATS["grace_joins"] == before + 1

    def test_explain(self, db):
        seed(db)
        cols, rows = db.query_with_columns(
            "EXPLAIN SELECT name FROM users WHERE age > 1 ORDER BY name LIMIT 2"
        )
        text = "\n".join(r[0] for r in rows)
        assert "SeqScan" in text and "Limit" in text and "Sort" in text

    def test_alter_table(self, db):
        seed(db)
        db.execute("ALTER TABLE users ADD COLUMN score DOUBLE DEFAULT 1.5")
        assert db.query("SELECT score FROM users WHERE id = 1") == [(1.5,)]
        db.execute("ALTER TABLE users RENAME COLUMN score TO pts")
        assert db.query("SELECT pts FROM users WHERE id = 1") == [(1.5,)]
        db.execute("ALTER TABLE users DROP COLUMN pts")
        with pytest.raises(Exception):
            db.query("SELECT pts FROM users")

    def test_window_function(self, db):
        seed(db)
        rows = db.query(
            "SELECT name, ROW_NUMBER() OVER (PARTITION BY city ORDER BY id) "
            "FROM users ORDER BY id"
        )
        assert rows == [("alice", 1), ("bob", 1), ("carol", 2), ("dave", 1)]


class TestIndexScans:
    def test_point_lookup_uses_index(self, db):
        seed(db)
        # correctness through the index probe path
        assert db.query("SELECT name FROM users WHERE id = 3") == [("carol",)]
        assert db.query("SELECT name FROM users WHERE id = 999") == []
        # param binding through the probe
        assert db.query("SELECT name FROM users WHERE id = ?", [2]) == [("bob",)]

    def test_range_scan_via_index(self, db):
        db.execute("CREATE TABLE r (k INT, v TEXT)")
        db.execute("PRAGMA wal_autoflush = false")
        vals = ", ".join(f"({i}, 'v{i}')" for i in range(1000))
        db.execute(f"INSERT INTO r VALUES {vals}")
        db.execute("CREATE INDEX rk ON r (k)")
        rows = db.query("SELECT v FROM r WHERE k > 5 AND k <= 8 ORDER BY k")
        assert rows == [("v6",), ("v7",), ("v8",)]
        rows = db.query("SELECT COUNT(*) FROM r WHERE k >= 990")
        assert rows == [(10,)]
        # huge range falls back to the scan (still correct)
        assert db.query("SELECT COUNT(*) FROM r WHERE k >= 1") == [(999,)]

    def test_range_after_update_delete(self, db):
        db.execute("CREATE TABLE r2 (k INT)")
        db.execute("INSERT INTO r2 VALUES (1), (2), (3), (4), (5)")
        db.execute("CREATE INDEX r2k ON r2 (k)")
        db.execute("DELETE FROM r2 WHERE k = 3")
        db.execute("UPDATE r2 SET k = 40 WHERE k = 4")
        rows = db.query("SELECT k FROM r2 WHERE k > 1 AND k < 10 ORDER BY k")
        assert rows == [(2,), (5,)]

    def test_explain_analyze(self, db):
        seed(db)
        rows = db.query("EXPLAIN ANALYZE SELECT name FROM users WHERE age > 26")
        text = "\n".join(r[0] for r in rows)
        assert "Execution: 2 rows" in text and "ms" in text

    def _query_as(self, db, txn, sql):
        """Run a SELECT under a specific (older) snapshot."""
        from turdb_tpu.sql.parser import Parser

        stmt = Parser(sql).parse_statement()
        batch = db.engine.run_select(stmt, db._ctx([], txn))
        from turdb_tpu.database.api import _batch_to_rows

        return _batch_to_rows(batch)[1]

    def test_index_scan_sees_old_version_under_snapshot(self, db):
        """Regression (ADVICE r1): the indexed path must honor snapshot
        isolation — a reader whose snapshot predates a committed UPDATE
        must see the OLD version, exactly like the full-scan path."""
        db.execute("CREATE TABLE t (id INT PRIMARY KEY, v INT)")
        db.execute("INSERT INTO t VALUES (1, 10)")
        reader = db.mgr.begin()  # snapshot BEFORE the update commits
        db.execute("UPDATE t SET v = 20 WHERE id = 1")
        try:
            # indexed probe (id = 1) under the old snapshot
            assert self._query_as(db, reader, "SELECT v FROM t WHERE id = 1") \
                == [(10,)]
            # scan path agrees
            assert self._query_as(db, reader, "SELECT v FROM t") == [(10,)]
        finally:
            db.mgr.abort(reader)
        # current snapshot sees the new version via the same index path
        assert db.query("SELECT v FROM t WHERE id = 1") == [(20,)]

    def test_index_scan_sees_deleted_row_under_snapshot(self, db):
        db.execute("CREATE TABLE t (id INT PRIMARY KEY, v INT)")
        db.execute("INSERT INTO t VALUES (1, 10), (2, 20)")
        reader = db.mgr.begin()
        db.execute("DELETE FROM t WHERE id = 1")
        try:
            assert self._query_as(db, reader, "SELECT v FROM t WHERE id = 1") \
                == [(10,)]
        finally:
            db.mgr.abort(reader)
        assert db.query("SELECT v FROM t WHERE id = 1") == []

    def test_unique_reusable_after_key_update(self, db):
        """Stale index entries (kept for MVCC) must not cause false
        unique-constraint conflicts after the key value moved."""
        db.execute("CREATE TABLE u (id INT PRIMARY KEY, email TEXT UNIQUE)")
        db.execute("INSERT INTO u VALUES (1, 'a@x')")
        db.execute("UPDATE u SET email = 'b@x' WHERE id = 1")
        db.execute("INSERT INTO u VALUES (2, 'a@x')")  # must NOT conflict
        assert sorted(db.query("SELECT id, email FROM u")) == [
            (1, "b@x"), (2, "a@x"),
        ]
        with pytest.raises(ConstraintViolation):
            db.execute("INSERT INTO u VALUES (3, 'b@x')")

    def test_fk_probe_not_fooled_by_stale_parent_entry(self, db):
        db.execute("CREATE TABLE p (id INT PRIMARY KEY)")
        db.execute(
            "CREATE TABLE c (id INT PRIMARY KEY, pid INT REFERENCES p(id))"
        )
        db.execute("INSERT INTO p VALUES (1)")
        db.execute("UPDATE p SET id = 2 WHERE id = 1")
        with pytest.raises(ConstraintViolation):
            db.execute("INSERT INTO c VALUES (10, 1)")  # 1 no longer exists
        db.execute("INSERT INTO c VALUES (11, 2)")


class TestQuantifiedSubqueries:
    """ANY/SOME/ALL comparisons (reference subquery/classifier.rs:44-95)."""

    @pytest.fixture()
    def qdb(self, tmp_path):
        from turdb_tpu import connect

        d = connect(str(tmp_path / "qdb"))
        d.execute("CREATE TABLE t (a INT)")
        d.execute("INSERT INTO t VALUES (1),(2),(3)")
        d.execute("CREATE TABLE s (b INT)")
        d.execute("INSERT INTO s VALUES (1),(2),(NULL)")
        yield d
        d.close()

    def test_any_all_basics(self, qdb):
        assert qdb.query(
            "SELECT a FROM t WHERE a > ANY (SELECT a FROM t WHERE a < 3) "
            "ORDER BY a"
        ) == [(2,), (3,)]
        assert qdb.query(
            "SELECT a FROM t WHERE a >= ALL (SELECT a FROM t)"
        ) == [(3,)]
        assert qdb.query(
            "SELECT a FROM t WHERE a = SOME (SELECT a FROM t WHERE a = 2)"
        ) == [(2,)]
        assert qdb.query(
            "SELECT a FROM t WHERE a <> ALL (SELECT a FROM t WHERE a > 2) "
            "ORDER BY a"
        ) == [(1,), (2,)]

    def test_null_three_valued(self, qdb):
        # {1, 2, NULL}: 1 > ANY is UNKNOWN for a=1 (no true, null present)
        assert qdb.query(
            "SELECT a FROM t WHERE a > ANY (SELECT b FROM s) ORDER BY a"
        ) == [(2,), (3,)]
        # a > ALL over a null-bearing set can never be TRUE
        assert qdb.query(
            "SELECT a FROM t WHERE a > ALL (SELECT b FROM s)"
        ) == []

    def test_empty_set(self, qdb):
        assert qdb.query(
            "SELECT a FROM t WHERE a > ANY (SELECT a FROM t WHERE a > 99)"
        ) == []
        assert qdb.query(
            "SELECT count(*) FROM t WHERE a > ALL "
            "(SELECT a FROM t WHERE a > 99)"
        ) == [(3,)]

    def test_correlated(self, qdb):
        assert qdb.query(
            "SELECT a FROM t WHERE a >= ALL "
            "(SELECT b FROM s WHERE s.b <= t.a) ORDER BY a"
        ) == [(1,), (2,), (3,)]


class TestCreateType:
    """CREATE TYPE .. AS ENUM / AS (...) — the reference parses this
    (parser.rs parse_create_type) but never executes it; here it does."""

    def test_enum_lifecycle(self, db):
        db.execute("CREATE TYPE mood AS ENUM ('sad', 'ok', 'happy')")
        db.execute("CREATE TABLE m (id INT, mo mood)")
        db.execute("INSERT INTO m VALUES (1, 'happy')")
        assert db.query("SELECT mo FROM m") == [("happy",)]
        with pytest.raises(Exception, match="invalid value for enum"):
            db.execute("INSERT INTO m VALUES (2, 'angry')")
        with pytest.raises(Exception, match="invalid value for enum"):
            db.execute("UPDATE m SET mo = 'zzz' WHERE id = 1")
        with pytest.raises(Exception, match="in use"):
            db.execute("DROP TYPE mood")
        db.execute("DROP TABLE m")
        db.execute("DROP TYPE mood")
        db.execute("DROP TYPE IF EXISTS mood")
        with pytest.raises(Exception, match="no such type"):
            db.execute("DROP TYPE mood")

    def test_inline_enum_column(self, db):
        db.execute("CREATE TABLE m2 (e ENUM('a', 'b'))")
        db.execute("INSERT INTO m2 VALUES ('a')")
        with pytest.raises(Exception, match="invalid value"):
            db.execute("INSERT INTO m2 VALUES ('c')")

    def test_type_persistence(self, tmp_path):
        from turdb_tpu.database.api import Database

        p = str(tmp_path / "ty")
        db = Database.create(p)
        db.execute("CREATE TYPE mood AS ENUM ('x', 'y')")
        db.execute("CREATE TYPE pt2 AS (x DOUBLE, y DOUBLE)")
        db.execute("CREATE TABLE t (mo mood)")
        db.close()
        db = Database.open(p)
        assert sorted(db.types["main"]) == ["mood", "pt2"]
        with pytest.raises(Exception, match="invalid value"):
            db.execute("INSERT INTO t VALUES ('z')")
        db.execute("INSERT INTO t VALUES ('y')")
        assert db.query("SELECT mo FROM t") == [("y",)]
        db.close()


class TestAlterColumnAndConstraints:
    """ALTER COLUMN / ADD CONSTRAINT / DROP CONSTRAINT — the reference
    parses these (ast.rs AlterTableAction) but never executes them;
    here they execute (same completion pattern as CREATE TYPE)."""

    def test_alter_column_default_and_null(self, db):
        db.execute("CREATE TABLE t (id INT, v INT, s TEXT)")
        db.execute("INSERT INTO t VALUES (1, 5, 'aa')")
        db.execute("ALTER TABLE t ALTER COLUMN v SET DEFAULT 42")
        db.execute("INSERT INTO t (id, s) VALUES (2, 'bb')")
        assert db.query("SELECT v FROM t WHERE id = 2") == [(42,)]
        db.execute("ALTER TABLE t ALTER COLUMN v DROP DEFAULT")
        db.execute("ALTER TABLE t ALTER COLUMN s SET NOT NULL")
        with pytest.raises(Exception, match="NOT NULL"):
            db.execute("INSERT INTO t (id, v) VALUES (3, 1)")
        db.execute("ALTER TABLE t ALTER COLUMN s DROP NOT NULL")
        db.execute("INSERT INTO t (id, v) VALUES (3, 1)")
        # SET NOT NULL must reject when NULLs exist
        with pytest.raises(Exception, match="contains NULLs"):
            db.execute("ALTER TABLE t ALTER COLUMN s SET NOT NULL")

    def test_alter_column_type(self, db):
        db.execute("CREATE TABLE t (id INT, v INT)")
        db.execute("INSERT INTO t VALUES (1, 5)")
        db.execute("ALTER TABLE t ALTER COLUMN v SET DATA TYPE DOUBLE")
        assert db.query("SELECT v FROM t") == [(5.0,)]
        db.execute("ALTER TABLE t ALTER COLUMN v TYPE TEXT")
        assert db.query("SELECT v FROM t") == [("5.0",)]
        db.execute("CREATE TABLE t2 (s TEXT)")
        db.execute("INSERT INTO t2 VALUES ('abc')")
        with pytest.raises(Exception, match="cannot convert"):
            db.execute("ALTER TABLE t2 ALTER COLUMN s TYPE INT")

    def test_add_drop_constraints(self, db):
        db.execute("CREATE TABLE parent (id INT PRIMARY KEY)")
        db.execute("INSERT INTO parent VALUES (1)")
        db.execute("CREATE TABLE t (id INT, pid INT)")
        db.execute("INSERT INTO t VALUES (1, 1)")
        db.execute("ALTER TABLE t ADD CONSTRAINT c CHECK (id > 0)")
        db.execute("ALTER TABLE t ADD CONSTRAINT u UNIQUE (id)")
        db.execute(
            "ALTER TABLE t ADD CONSTRAINT f FOREIGN KEY (pid) "
            "REFERENCES parent (id)"
        )
        for bad in ["INSERT INTO t VALUES (-1, 1)",
                    "INSERT INTO t VALUES (1, 1)",
                    "INSERT INTO t VALUES (2, 99)"]:
            with pytest.raises(Exception):
                db.execute(bad)
        # adding a CHECK existing rows violate must fail
        with pytest.raises(Exception, match="existing rows violate"):
            db.execute("ALTER TABLE t ADD CONSTRAINT c2 CHECK (id > 10)")
        for name in ("c", "u", "f"):
            db.execute(f"ALTER TABLE t DROP CONSTRAINT {name}")
        db.execute("INSERT INTO t VALUES (-1, 99)")   # all constraints gone
        db.execute("ALTER TABLE t DROP CONSTRAINT IF EXISTS missing")
        with pytest.raises(Exception, match="no such constraint"):
            db.execute("ALTER TABLE t DROP CONSTRAINT missing")

    def test_named_constraints_persist(self, tmp_path):
        p = str(tmp_path / "nc")
        db = Database.create(p)
        db.execute("CREATE TABLE t (id INT)")
        db.execute("ALTER TABLE t ADD CONSTRAINT pos CHECK (id >= 0)")
        db.close()
        db = Database.open(p)
        with pytest.raises(Exception, match="CHECK"):
            db.execute("INSERT INTO t VALUES (-1)")
        db.execute("ALTER TABLE t DROP CONSTRAINT pos")
        db.execute("INSERT INTO t VALUES (-1)")
        db.close()


def test_catalog_roundtrip_all_features(tmp_path):
    """Catalog persistence property: a schema exercising every catalog
    field (user types, enum columns, named constraints, expression
    indexes, defaults, FKs, auto-increment, views) survives
    checkpoint + reopen with identical behavior."""
    p = str(tmp_path / "cat")
    db = Database.create(p)
    db.execute("CREATE TYPE mood AS ENUM ('a', 'b')")
    db.execute("CREATE SCHEMA aux")
    db.execute("CREATE TABLE parent (id INT PRIMARY KEY)")
    db.execute("INSERT INTO parent VALUES (1), (2)")
    db.execute("""
        CREATE TABLE t (
            id BIGINT PRIMARY KEY AUTO_INCREMENT,
            m mood,
            email TEXT UNIQUE,
            n INT DEFAULT 7,
            pid INT REFERENCES parent(id)
        )
    """)
    db.execute("ALTER TABLE t ADD CONSTRAINT pos CHECK (n >= 0)")
    db.execute("CREATE INDEX ie ON t (lower(email))")
    db.execute("CREATE VIEW v AS SELECT id, m FROM t WHERE n > 0")
    db.execute("INSERT INTO t (m, email, pid) VALUES ('a', 'X@y.z', 1)")
    db.execute("PRAGMA wal_checkpoint")
    db.close()

    db = Database.open(p)
    # auto-increment continues
    db.execute("INSERT INTO t (m, email, pid) VALUES ('b', 'q@y.z', 2)")
    assert db.query("SELECT id FROM t ORDER BY id") == [(1,), (2,)]
    # every constraint class still enforced
    for bad in [
        "INSERT INTO t (m) VALUES ('zz')",                  # enum
        "INSERT INTO t (m, email) VALUES ('a', 'X@y.z')",   # unique
        "INSERT INTO t (m, n) VALUES ('a', -5)",            # named check
        "INSERT INTO t (m, pid) VALUES ('a', 99)",          # fk
    ]:
        with pytest.raises(Exception):
            db.execute(bad)
    # default + expression index + view still work
    assert db.query("SELECT n FROM t WHERE id = 2") == [(7,)]
    assert db.query("SELECT id FROM t WHERE lower(email) = 'x@y.z'") == [(1,)]
    assert len(db.query("SELECT * FROM v")) == 2
    assert db.query(
        "SELECT kind FROM turdb_catalog.types WHERE name = 'mood'"
    ) == [("enum",)]
    db.execute("ALTER TABLE t DROP CONSTRAINT pos")
    db.execute("INSERT INTO t (m, n) VALUES ('a', -5)")
    db.close()


def test_open_with_recovery_and_checkpoint_info(tmp_path):
    """Reference public API shapes: open_with_recovery -> RecoveryInfo
    (database.rs:217, mod.rs:202) and checkpoint -> CheckpointInfo
    (mod.rs:208); PRAGMA wal_checkpoint surfaces the counts."""
    from turdb_tpu.database.api import CheckpointInfo, RecoveryInfo

    p = str(tmp_path / "ri")
    db = Database.create(p)
    db.execute("CREATE TABLE t (id INT)")
    db.execute("INSERT INTO t VALUES (1), (2)")
    ci = db.checkpoint()
    assert isinstance(ci, CheckpointInfo)
    assert ci.frames_checkpointed > 0 and ci.wal_truncated
    db.execute("INSERT INTO t VALUES (3)")
    db.wal.flush()
    db.wal.close()    # crash

    db2, ri = Database.open_with_recovery(p)
    assert isinstance(ri, RecoveryInfo)
    assert ri.frames_recovered > 0 and ri.mode == "rw"
    assert ri.wal_size_bytes > 0
    assert db2.query("SELECT count(*) FROM t") == [(3,)]
    row = db2.execute("PRAGMA wal_checkpoint").rows[0]
    assert row[1] is True
    db2.close()


def test_array_columns_end_to_end(tmp_path):
    """T[] columns: literals, indexing, containment/overlap operators,
    concat, persistence (reference README ARRAY type + array.rs)."""
    p = str(tmp_path / "arr")
    db = Database.create(p)
    db.execute("CREATE TABLE a (id INT, xs INT[], ts TEXT[])")
    db.execute("INSERT INTO a VALUES (1, ARRAY[1, 2, 3], ARRAY['x', 'y'])")
    db.execute("INSERT INTO a VALUES (2, ARRAY[9], NULL)")
    assert db.query("SELECT xs[1], xs[3], ts[2] FROM a WHERE id = 1") == [
        (1, 3, "y")
    ]
    assert db.query(
        "SELECT array_length(xs), cardinality(ts) FROM a WHERE id = 1"
    ) == [(3, 2)]
    assert db.query("SELECT id FROM a WHERE xs @> ARRAY[2]") == [(1,)]
    assert db.query("SELECT id FROM a WHERE xs && ARRAY[3, 9] ORDER BY id") \
        == [(1,), (2,)]
    assert db.query("SELECT xs || ARRAY[4] FROM a WHERE id = 2") == [([9, 4],)]
    db.close()
    db2 = Database.open(p)
    assert db2.query("SELECT xs FROM a WHERE id = 1") == [([1, 2, 3],)]
    db2.close()


def test_natural_and_using_joins(db):
    """NATURAL JOIN / USING: join on shared columns, expose each join
    column ONCE, coalesced across sides for RIGHT/FULL (SQL standard;
    the reference parses these but bails 'not yet implemented',
    planner/select.rs:399)."""
    db.execute("CREATE TABLE a (id INT, v TEXT)")
    db.execute("CREATE TABLE b (id INT, w TEXT)")
    db.execute("INSERT INTO a VALUES (1, 'x'), (2, 'y')")
    db.execute("INSERT INTO b VALUES (1, 'p'), (3, 'q')")
    assert db.query("SELECT * FROM a NATURAL JOIN b") == [(1, "x", "p")]
    assert db.query("SELECT * FROM a JOIN b USING (id)") == [(1, "x", "p")]
    assert db.query(
        "SELECT * FROM a NATURAL LEFT JOIN b ORDER BY id"
    ) == [(1, "x", "p"), (2, "y", None)]
    assert db.query(
        "SELECT id, v, w FROM a FULL OUTER JOIN b USING (id) ORDER BY id"
    ) == [(1, "x", "p"), (2, "y", None), (3, None, "q")]


def test_like_escape(db):
    assert db.query(r"SELECT 'a%b' LIKE 'a\%b' ESCAPE '\'") == [(True,)]
    assert db.query(r"SELECT 'axb' LIKE 'a\%b' ESCAPE '\'") == [(False,)]
    assert db.query(r"SELECT 'a_b' LIKE 'a!_b' ESCAPE '!'") == [(True,)]
    assert db.query(r"SELECT 'a!b' LIKE 'a!!b' ESCAPE '!'") == [(True,)]
    assert db.query(r"SELECT 'A%B' ILIKE 'a\%b' ESCAPE '\'") == [(True,)]


def test_insert_default_values(db):
    """INSERT INTO t DEFAULT VALUES (reference parser.rs:1602)."""
    db.execute(
        "CREATE TABLE dv (id INT PRIMARY KEY AUTO_INCREMENT, "
        "s TEXT DEFAULT 'hi', n INT)"
    )
    db.execute("INSERT INTO dv DEFAULT VALUES")
    db.execute("INSERT INTO dv DEFAULT VALUES")
    assert db.query("SELECT * FROM dv ORDER BY id") == [
        (1, "hi", None), (2, "hi", None),
    ]
    db.execute("CREATE TABLE nn (a INT NOT NULL)")
    with pytest.raises(Exception, match="NOT NULL"):
        db.execute("INSERT INTO nn DEFAULT VALUES")


class TestMerge:
    """MERGE INTO .. USING .. ON (reference ast.rs:635 MergeStmt —
    parsed there, executed here)."""

    def test_merge_upsert(self, db):
        db.execute("CREATE TABLE tgt (id INT PRIMARY KEY, v INT, s TEXT)")
        db.execute("CREATE TABLE src (id INT, v INT)")
        db.execute("INSERT INTO tgt VALUES (1,10,'a'),(2,20,'b'),(3,30,'c')")
        db.execute("INSERT INTO src VALUES (2,99),(3,77),(4,44)")
        r = db.execute(
            "MERGE INTO tgt USING src ON tgt.id = src.id "
            "WHEN MATCHED THEN UPDATE SET v = src.v "
            "WHEN NOT MATCHED THEN INSERT (id, v, s) "
            "VALUES (src.id, src.v, 'new')"
        )
        assert r.rows_affected == 3
        assert db.query("SELECT * FROM tgt ORDER BY id") == [
            (1, 10, "a"), (2, 99, "b"), (3, 77, "c"), (4, 44, "new"),
        ]

    def test_merge_delete_and_subquery_source(self, db):
        db.execute("CREATE TABLE tgt (id INT PRIMARY KEY, v INT)")
        db.execute("INSERT INTO tgt VALUES (1, 1), (2, 2)")
        db.execute(
            "MERGE INTO tgt AS t USING (SELECT 2 AS sid) AS s "
            "ON t.id = s.sid WHEN MATCHED THEN DELETE"
        )
        assert db.query("SELECT id FROM tgt") == [(1,)]

    def test_merge_multi_match_errors(self, db):
        db.execute("CREATE TABLE tgt (id INT, v INT)")
        db.execute("CREATE TABLE dup (id INT)")
        db.execute("INSERT INTO tgt VALUES (5, 0)")
        db.execute("INSERT INTO dup VALUES (5), (5)")
        with pytest.raises(Exception, match="more than one source row"):
            db.execute(
                "MERGE INTO tgt USING dup ON tgt.id = dup.id "
                "WHEN MATCHED THEN UPDATE SET v = 1"
            )

    def test_merge_rollback(self, db):
        db.execute("CREATE TABLE tgt (id INT, v INT)")
        db.execute("CREATE TABLE src (id INT)")
        db.execute("INSERT INTO tgt VALUES (1, 1)")
        db.execute("INSERT INTO src VALUES (1), (9)")
        db.execute("BEGIN")
        db.execute(
            "MERGE INTO tgt USING src ON tgt.id = src.id "
            "WHEN MATCHED THEN UPDATE SET v = 100 "
            "WHEN NOT MATCHED THEN INSERT (id, v) VALUES (src.id, 0)"
        )
        assert db.query("SELECT count(*) FROM tgt") == [(2,)]
        db.execute("ROLLBACK")
        assert db.query("SELECT * FROM tgt") == [(1, 1)]


class TestCreateFunction:
    """CREATE [OR REPLACE] FUNCTION ... LANGUAGE SQL (reference
    ast.rs:555 — parsed there, executed here as scalar SQL functions)."""

    def test_function_lifecycle(self, db):
        db.execute(
            "CREATE FUNCTION add_one(x INT) RETURNS INT AS 'x + 1' "
            "LANGUAGE SQL"
        )
        db.execute(
            "CREATE FUNCTION taxed(a DOUBLE, r DOUBLE) RETURNS DOUBLE "
            "AS 'SELECT a * (1 + r)'"
        )
        assert db.query("SELECT add_one(41), taxed(100.0, 0.2)") == \
            [(42, 120.0)]
        db.execute("CREATE TABLE t (v INT)")
        db.execute("INSERT INTO t VALUES (1), (2), (3)")
        assert db.query("SELECT sum(add_one(v)) FROM t") == [(9,)]
        # nesting + OR REPLACE + duplicate rejection
        db.execute(
            "CREATE FUNCTION add_two(x INT) RETURNS INT "
            "AS 'add_one(add_one(x))'"
        )
        assert db.query("SELECT add_two(1)") == [(3,)]
        db.execute(
            "CREATE OR REPLACE FUNCTION add_one(x INT) RETURNS INT "
            "AS 'x + 10'"
        )
        assert db.query("SELECT add_one(1)") == [(11,)]
        with pytest.raises(Exception, match="already exists"):
            db.execute("CREATE FUNCTION add_one(x INT) RETURNS INT AS 'x'")
        db.execute("DROP FUNCTION add_two")
        with pytest.raises(Exception, match="unknown function"):
            db.query("SELECT add_two(1)")
        db.execute("DROP FUNCTION IF EXISTS add_two")

    def test_function_recursion_guard(self, db):
        db.execute("CREATE FUNCTION boom(x INT) RETURNS INT AS 'boom(x)'")
        with pytest.raises(Exception, match="recursion too deep"):
            db.query("SELECT boom(1)")

    def test_function_persistence(self, tmp_path):
        p = str(tmp_path / "fp")
        db = Database.create(p)
        db.execute("CREATE FUNCTION sq(x INT) RETURNS INT AS 'x * x'")
        db.close()
        db = Database.open(p)
        assert db.query("SELECT sq(7)") == [(49,)]
        db.close()


def test_create_domain_and_reset(db):
    """CREATE DOMAIN (reference parse_create_domain -> CreateType) and
    RESET name | RESET ALL (parser.rs:3069) — executed here."""
    db.execute("CREATE DOMAIN email AS VARCHAR(50)")
    db.execute("CREATE TABLE u (e email)")
    db.execute("INSERT INTO u VALUES ('x@y.z')")
    assert db.query("SELECT e FROM u") == [("x@y.z",)]
    with pytest.raises(Exception, match="too long"):
        db.execute(f"INSERT INTO u VALUES ('{'a' * 60}')")
    db.execute("SET ann_overfetch = 9")
    assert db.ann_overfetch == 9
    db.execute("RESET ann_overfetch")
    assert db.ann_overfetch == 4
    db.execute("RESET ALL")


class TestTriggers:
    """CREATE TRIGGER (reference ast.rs:582 — parsed there, fired here):
    SQLite-style BEGIN..END bodies with NEW./OLD. references, WHEN
    conditions, BEFORE/AFTER on INSERT/UPDATE/DELETE."""

    def test_trigger_audit_vs_sqlite(self, db):
        import sqlite3

        lite = sqlite3.connect(":memory:")
        ddl = [
            "CREATE TABLE orders (id INT PRIMARY KEY, amount DOUBLE, "
            "status TEXT)",
            "CREATE TABLE audit (event TEXT, oid INT, amt DOUBLE)",
            "CREATE TRIGGER log_ins AFTER INSERT ON orders FOR EACH ROW "
            "BEGIN INSERT INTO audit VALUES ('ins', NEW.id, NEW.amount); END",
            "CREATE TRIGGER log_del AFTER DELETE ON orders FOR EACH ROW "
            "WHEN (OLD.amount > 50) BEGIN INSERT INTO audit VALUES "
            "('del', OLD.id, OLD.amount); END",
            "CREATE TRIGGER log_upd AFTER UPDATE ON orders FOR EACH ROW "
            "BEGIN INSERT INTO audit VALUES "
            "('upd', NEW.id, NEW.amount - OLD.amount); END",
        ]
        dml = [
            "INSERT INTO orders VALUES (1, 10.0, 'new'), (2, 100.0, 'new')",
            "UPDATE orders SET amount = amount + 5 WHERE id = 1",
            "DELETE FROM orders WHERE id = 2",
            "DELETE FROM orders WHERE id = 1",
        ]
        for s in ddl + dml:
            db.execute(s)
            lite.execute(s)
        q = "SELECT * FROM audit ORDER BY oid, event"
        assert repr(db.query(q)) == repr(lite.execute(q).fetchall())
        lite.close()

    def test_trigger_rollback_and_prepared(self, db):
        db.execute("CREATE TABLE t (v INT)")
        db.execute("CREATE TABLE log (v INT)")
        db.execute(
            "CREATE TRIGGER tr AFTER INSERT ON t FOR EACH ROW "
            "BEGIN INSERT INTO log VALUES (NEW.v); END"
        )
        st = db.prepare("INSERT INTO t VALUES ($1)")
        st.execute([1])
        assert db.query("SELECT v FROM log") == [(1,)]
        db.execute("BEGIN")
        db.execute("INSERT INTO t VALUES (2)")
        assert db.query("SELECT count(*) FROM log") == [(2,)]
        db.execute("ROLLBACK")
        assert db.query("SELECT count(*) FROM log") == [(1,)]

    def test_trigger_recursion_guard(self, db):
        db.execute("CREATE TABLE t (v INT)")
        db.execute(
            "CREATE TRIGGER loop AFTER INSERT ON t FOR EACH ROW "
            "BEGIN INSERT INTO t VALUES (NEW.v + 1); END"
        )
        with pytest.raises(Exception, match="recursion too deep"):
            db.execute("INSERT INTO t VALUES (1)")

    def test_trigger_persistence_and_drop(self, tmp_path):
        p = str(tmp_path / "tp")
        db = Database.create(p)
        db.execute("CREATE TABLE t (v INT)")
        db.execute("CREATE TABLE log (v INT)")
        db.execute(
            "CREATE TRIGGER tr BEFORE INSERT ON t FOR EACH ROW "
            "BEGIN INSERT INTO log VALUES (NEW.v * 10); END"
        )
        db.close()
        db = Database.open(p)
        db.execute("INSERT INTO t VALUES (4)")
        assert db.query("SELECT v FROM log") == [(40,)]
        db.execute("DROP TRIGGER tr")
        db.execute("INSERT INTO t VALUES (5)")
        assert db.query("SELECT count(*) FROM log") == [(1,)]
        with pytest.raises(Exception, match="no such trigger"):
            db.execute("DROP TRIGGER tr")
        db.execute("DROP TRIGGER IF EXISTS tr")
        db.close()

    def test_trigger_execute_function_form(self, db):
        # the reference's EXECUTE FUNCTION form calls a user SQL function
        db.execute("CREATE TABLE t (v INT)")
        db.execute(
            "CREATE FUNCTION noop() RETURNS INT AS '1' LANGUAGE SQL"
        )
        db.execute(
            "CREATE TRIGGER tr AFTER INSERT ON t FOR EACH ROW "
            "EXECUTE FUNCTION noop()"
        )
        db.execute("INSERT INTO t VALUES (1)")   # fires without error
        assert db.query("SELECT v FROM t") == [(1,)]

    def test_statement_level_trigger(self, db):
        # FOR EACH STATEMENT: once per statement, even on zero rows
        db.execute("CREATE TABLE t (a INT)")
        db.execute("CREATE TABLE log (tag TEXT)")
        db.execute(
            "CREATE TRIGGER st AFTER INSERT ON t FOR EACH STATEMENT "
            "BEGIN INSERT INTO log VALUES ('i'); END"
        )
        db.execute(
            "CREATE TRIGGER sd BEFORE DELETE ON t FOR EACH STATEMENT "
            "BEGIN INSERT INTO log VALUES ('d'); END"
        )
        db.execute("INSERT INTO t VALUES (1), (2), (3)")     # 3 rows, 1 fire
        db.execute("INSERT INTO t SELECT a FROM t WHERE a > 99")  # 0 rows
        db.execute("DELETE FROM t WHERE a = 2")
        assert db.query("SELECT tag FROM log ORDER BY tag") == [
            ("d",), ("i",), ("i",)
        ]
        # prepared fast lane fires it too
        st = db.prepare("INSERT INTO t VALUES ($1)")
        st.execute([7])
        assert db.query("SELECT count(*) FROM log WHERE tag='i'") == [(3,)]

    def test_statement_trigger_rejects_new_old(self, db):
        db.execute("CREATE TABLE t (a INT)")
        with pytest.raises(Exception, match="cannot reference NEW/OLD"):
            db.execute(
                "CREATE TRIGGER bad AFTER INSERT ON t FOR EACH STATEMENT "
                "BEGIN INSERT INTO t VALUES (NEW.a); END"
            )

    def test_instead_of_triggers_on_view(self, tmp_path):
        # SQLite INSTEAD OF semantics: DML on a view redirects to the
        # trigger bodies with NEW./OLD. bound from the view row
        p = str(tmp_path / "iv")
        db = Database.create(p)
        db.execute("CREATE TABLE base (id INT PRIMARY KEY, v TEXT)")
        db.execute("INSERT INTO base VALUES (1, 'one'), (2, 'two')")
        db.execute("CREATE VIEW bv AS SELECT id, v FROM base")
        db.execute(
            "CREATE TRIGGER iv INSTEAD OF INSERT ON bv "
            "BEGIN INSERT INTO base VALUES (NEW.id, NEW.v); END"
        )
        db.execute(
            "CREATE TRIGGER uv INSTEAD OF UPDATE ON bv "
            "BEGIN UPDATE base SET v = NEW.v WHERE id = OLD.id; END"
        )
        db.execute(
            "CREATE TRIGGER dv INSTEAD OF DELETE ON bv "
            "BEGIN DELETE FROM base WHERE id = OLD.id; END"
        )
        r = db.execute("INSERT INTO bv VALUES (3, 'three')")
        assert r.rows_affected == 1
        assert db.query("SELECT v FROM base WHERE id = 3") == [("three",)]
        db.execute("UPDATE bv SET v = upper(v) WHERE id <= 2")
        assert db.query("SELECT v FROM base ORDER BY id") == [
            ("ONE",), ("TWO",), ("three",)
        ]
        db.execute("DELETE FROM bv WHERE v = 'TWO'")
        assert db.query("SELECT count(*) FROM base") == [(2,)]
        # persists across reopen
        db.close()
        db = Database.open(p)
        db.execute("INSERT INTO bv VALUES (9, 'nine')")
        assert db.query("SELECT v FROM base WHERE id = 9") == [("nine",)]
        db.close()

    def test_instead_of_guards(self, db):
        db.execute("CREATE TABLE t (a INT)")
        db.execute("CREATE VIEW pv AS SELECT a FROM t")
        with pytest.raises(Exception, match="not a view"):
            db.execute(
                "CREATE TRIGGER x INSTEAD OF INSERT ON t "
                "BEGIN INSERT INTO t VALUES (1); END"
            )
        with pytest.raises(Exception, match="FOR EACH ROW"):
            db.execute(
                "CREATE TRIGGER x INSTEAD OF INSERT ON pv "
                "FOR EACH STATEMENT BEGIN INSERT INTO t VALUES (1); END"
            )
        # a view without INSTEAD OF triggers stays read-only
        with pytest.raises(Exception, match="read-only"):
            db.execute("INSERT INTO pv VALUES (1)")


class TestGrants:
    """GRANT/REVOKE (reference parser.rs:3125-3276 parses them and never
    enforces — single-user embedded engine): recorded in the catalog,
    queryable via turdb_catalog.grants, durable across reopen."""

    def test_grant_revoke_lifecycle(self, tmp_path):
        p = str(tmp_path / "g")
        db = Database.create(p)
        db.execute("CREATE TABLE t (a INT)")
        db.execute("GRANT SELECT, INSERT ON t TO alice, bob")
        db.execute("GRANT ALL PRIVILEGES ON TABLE t TO carol "
                   "WITH GRANT OPTION")
        q = ("SELECT grantee, privileges, grant_option FROM "
             "turdb_catalog.grants ORDER BY grantee")
        assert db.query(q) == [
            ("alice", "SELECT,INSERT", False),
            ("bob", "SELECT,INSERT", False),
            ("carol", "ALL", True),
        ]
        db.execute("REVOKE INSERT ON t FROM alice")
        db.execute("REVOKE ALL ON TABLE t FROM carol CASCADE")
        assert db.query(q) == [
            ("alice", "SELECT", False), ("bob", "SELECT,INSERT", False)
        ]
        db.close()
        db = Database.open(p)      # WAL DDL replay keeps the records
        assert db.query(q) == [
            ("alice", "SELECT", False), ("bob", "SELECT,INSERT", False)
        ]
        db.execute("PRAGMA checkpoint")
        db.close()
        db = Database.open(p)      # catalog persistence after checkpoint
        assert db.query(q) == [
            ("alice", "SELECT", False), ("bob", "SELECT,INSERT", False)
        ]
        db.close()

    def test_grant_parse_errors(self, db):
        with pytest.raises(Exception, match="unknown privilege"):
            db.execute("GRANT FLY ON t TO alice")
        with pytest.raises(Exception, match="expected TO"):
            db.execute("GRANT SELECT ON t")


class TestProcedures:
    """CREATE PROCEDURE / CALL (reference ast.rs CreateProcedureStmt +
    CallStmt — parsed there, executed here)."""

    def test_procedure_call(self, db):
        db.execute("CREATE TABLE accounts (id INT PRIMARY KEY, bal DOUBLE)")
        db.execute("INSERT INTO accounts VALUES (1, 100.0), (2, 50.0)")
        db.execute(
            "CREATE PROCEDURE transfer(src INT, dst INT, amt DOUBLE) AS "
            "'UPDATE accounts SET bal = bal - amt WHERE id = src; "
            "UPDATE accounts SET bal = bal + amt WHERE id = dst' "
            "LANGUAGE SQL"
        )
        r = db.execute("CALL transfer(1, 2, 30.0)")
        assert r.rows_affected == 2
        assert db.query("SELECT * FROM accounts ORDER BY id") == [
            (1, 70.0), (2, 80.0),
        ]
        db.execute("BEGIN")
        db.execute("CALL transfer(2, 1, 80.0)")
        db.execute("ROLLBACK")
        assert db.query("SELECT * FROM accounts ORDER BY id") == [
            (1, 70.0), (2, 80.0),
        ]
        with pytest.raises(Exception, match="takes 3 arguments"):
            db.execute("CALL transfer(1, 2)")
        db.execute("DROP PROCEDURE transfer")
        with pytest.raises(Exception, match="no such procedure"):
            db.execute("CALL transfer(1, 2, 1.0)")

    def test_procedure_persistence(self, tmp_path):
        p = str(tmp_path / "pp")
        db = Database.create(p)
        db.execute("CREATE TABLE t (v INT)")
        db.execute("CREATE PROCEDURE add_v(x INT) AS "
                   "'INSERT INTO t VALUES (x)'")
        db.close()
        db = Database.open(p)
        db.execute("CALL add_v(7)")
        assert db.query("SELECT v FROM t") == [(7,)]
        db.close()


def test_begin_options_and_explain_json(db):
    """BEGIN ISOLATION LEVEL ... / READ ONLY (reference parser.rs:2907;
    all levels = snapshot) and EXPLAIN (ANALYZE, FORMAT JSON)
    (parser.rs:2977) — executed here."""
    import json

    db.execute("CREATE TABLE t (id INT PRIMARY KEY, v INT)")
    db.execute("INSERT INTO t VALUES (1, 1)")
    db.execute("BEGIN ISOLATION LEVEL SERIALIZABLE, READ ONLY")
    assert db.query("SELECT * FROM t") == [(1, 1)]
    with pytest.raises(Exception, match="READ ONLY"):
        db.execute("INSERT INTO t VALUES (2, 2)")
    db.execute("COMMIT")
    db.execute("BEGIN TRANSACTION READ WRITE")
    db.execute("INSERT INTO t VALUES (2, 2)")
    db.execute("COMMIT")
    doc = json.loads(db.execute(
        "EXPLAIN (FORMAT JSON) SELECT * FROM t WHERE id = 1"
    ).rows[0][0])
    assert doc[0]["node"].startswith("Project")
    out = db.execute(
        "EXPLAIN (ANALYZE, FORMAT JSON) SELECT count(*) FROM t"
    ).rows[0][0]
    assert "Execution" in out


def test_uuid_column_wal_roundtrip(tmp_path):
    """UUID columns are canonicalized, validated, and WAL-replayable
    (they broke record packing for WAL frames before: StorageClass.BYTES
    with string values)."""
    p = str(tmp_path / "uu")
    db = Database.create(p)
    db.execute("CREATE TABLE t (u UUID, iv INTERVAL)")
    db.execute(
        "INSERT INTO t VALUES ('550E8400-E29B-41D4-A716-446655440000', "
        "INTERVAL '1 day 2 hours')"
    )
    assert db.query("SELECT u, iv FROM t") == [
        ("550e8400-e29b-41d4-a716-446655440000", 93600000000),
    ]
    with pytest.raises(Exception, match="invalid UUID"):
        db.execute("INSERT INTO t (u) VALUES ('nope')")
    db.wal.flush()
    db.wal.close()
    db2 = Database.open(p)
    assert db2.query("SELECT u FROM t") == [
        ("550e8400-e29b-41d4-a716-446655440000",),
    ]
    db2.close()


def test_temporal_columns_validate_and_canonicalize(db):
    """DATE/TIME/TIMESTAMP columns validate and canonicalize text values
    (reference parsing/literal.rs): '2024-1-1' stored non-canonical broke
    string-order comparisons, and garbage was accepted silently."""
    db.execute("CREATE TABLE t (d DATE, tm TIME, ts TIMESTAMP)")
    db.execute("INSERT INTO t VALUES ('2024-1-1', '9:5', '2024-01-01T10:00:00')")
    assert db.query("SELECT * FROM t") == [
        ("2024-01-01", "09:05:00", "2024-01-01 10:00:00"),
    ]
    db.execute("INSERT INTO t (d) VALUES ('2024-01-02')")
    assert db.query("SELECT count(*) FROM t WHERE d > '2024-01-01'") == [(1,)]
    for bad in ["('nope', NULL, NULL)", "(NULL, '99:99', NULL)",
                "(NULL, NULL, '2024-13-40 00:00:00')"]:
        with pytest.raises(Exception, match="invalid"):
            db.execute(f"INSERT INTO t VALUES {bad}")


class TestLateral:
    """LATERAL subqueries in FROM (reference parses them, parser.rs:743,
    and bails at planning, planner/select.rs:378-382 — here they run):
    per-left-row re-evaluation with outer bindings, PostgreSQL
    semantics."""

    @pytest.fixture()
    def ldb(self, db):
        db.execute("CREATE TABLE u (id INT, name TEXT)")
        db.execute("CREATE TABLE o (uid INT, amt INT)")
        db.execute("INSERT INTO u VALUES (1,'a'), (2,'b'), (3,'c')")
        db.execute("INSERT INTO o VALUES (1,10),(1,30),(2,5),(1,20),(2,7)")
        return db

    def test_top_n_per_group(self, ldb):
        q = ("SELECT u.name, t.amt FROM u, LATERAL (SELECT amt FROM o "
             "WHERE o.uid = u.id ORDER BY amt DESC LIMIT 2) t "
             "ORDER BY u.name, t.amt")
        assert ldb.query(q) == [("a", 20), ("a", 30), ("b", 5), ("b", 7)]

    def test_left_join_lateral_pads(self, ldb):
        q = ("SELECT u.name, t.amt FROM u LEFT JOIN LATERAL "
             "(SELECT amt FROM o WHERE o.uid = u.id AND amt > 6) t "
             "ON TRUE ORDER BY u.name, t.amt")
        assert ldb.query(q) == [
            ("a", 10), ("a", 20), ("a", 30), ("b", 7), ("c", None)
        ]

    def test_lateral_on_condition(self, ldb):
        q = ("SELECT u.name, t.amt FROM u JOIN LATERAL (SELECT amt FROM o "
             "WHERE o.uid = u.id) t ON t.amt > 8 ORDER BY u.name, t.amt")
        assert ldb.query(q) == [("a", 10), ("a", 20), ("a", 30)]

    def test_lateral_aggregate_and_alias_default(self, ldb):
        # reference defaults the alias to "lateral" (parser.rs:748)
        q = ("SELECT u.name, lateral.mx FROM u, LATERAL "
             "(SELECT max(amt) AS mx FROM o WHERE o.uid = u.id) "
             "ORDER BY u.name")
        assert ldb.query(q) == [("a", 30), ("b", 7), ("c", None)]

    def test_lateral_empty_left(self, ldb):
        q = ("SELECT u.name, t.amt FROM u, LATERAL (SELECT amt FROM o "
             "WHERE o.uid = u.id) t WHERE u.id > 90")
        assert ldb.query(q) == []

    def test_lateral_chain_and_reorder_guard(self, ldb):
        # three-way FROM with a lateral tail must keep evaluation order
        q = ("SELECT u.name, o.amt, t.double_amt FROM u, o, LATERAL "
             "(SELECT o.amt * 2 AS double_amt) t "
             "WHERE u.id = o.uid ORDER BY u.name, o.amt")
        assert ldb.query(q) == [
            ("a", 10, 20), ("a", 20, 40), ("a", 30, 60),
            ("b", 5, 10), ("b", 7, 14),
        ]


class TestReviewRegressions:
    """Round-3 code-review findings, pinned."""

    def test_statement_trigger_when_rejects_new(self, db):
        db.execute("CREATE TABLE t (a INT)")
        with pytest.raises(Exception, match="cannot reference NEW/OLD"):
            db.execute(
                "CREATE TRIGGER bad AFTER INSERT ON t FOR EACH STATEMENT "
                "WHEN (NEW.a > 0) BEGIN INSERT INTO t VALUES (1); END"
            )

    def test_instead_of_returning_and_upsert(self, db):
        db.execute("CREATE TABLE base (id INT PRIMARY KEY, v TEXT)")
        db.execute("CREATE VIEW bv AS SELECT id, v FROM base")
        db.execute("CREATE TRIGGER iv INSTEAD OF INSERT ON bv "
                   "BEGIN INSERT INTO base VALUES (NEW.id, NEW.v); END")
        r = db.execute("INSERT INTO bv VALUES (1, 'x') RETURNING id, upper(v)")
        assert r.rows == [(1, "X")]
        with pytest.raises(Exception, match="cannot UPSERT a view"):
            db.execute(
                "INSERT INTO bv VALUES (2, 'y') "
                "ON CONFLICT (id) DO NOTHING"
            )

    def test_revoke_single_privilege_from_all_grant(self, db):
        db.execute("CREATE TABLE t (a INT)")
        db.execute("GRANT ALL ON t TO bob")
        db.execute("REVOKE SELECT ON t FROM bob")
        (privs,) = db.query(
            "SELECT privileges FROM turdb_catalog.grants "
            "WHERE grantee = 'bob'"
        )[0]
        assert "SELECT" not in privs.split(",")
        assert "INSERT" in privs.split(",")

    def test_nested_correlated_lateral(self, db):
        db.execute("CREATE TABLE t1 (x INT)")
        db.execute("CREATE TABLE t2 (y INT)")
        db.execute("INSERT INTO t1 VALUES (5), (6)")
        db.execute("INSERT INTO t2 VALUES (10)")
        q = ("SELECT (SELECT max(s) FROM t2, LATERAL "
             "(SELECT t1.x + t2.y AS s) l) FROM t1 ORDER BY 1")
        assert db.query(q) == [(15,), (16,)]

    def test_two_unaliased_laterals_unique(self, db):
        db.execute("CREATE TABLE t1 (x INT)")
        db.execute("INSERT INTO t1 VALUES (5)")
        r = db.query("SELECT * FROM t1, LATERAL (SELECT x+1 AS a), "
                     "LATERAL (SELECT x+2 AS b)")
        assert r == [(5, 6, 7)]


def test_having_without_group_by_filters_alias(db):
    """Reference integration_sql.rs:1561
    (having_without_group_by_filters_on_select_alias): HAVING with no
    GROUP BY and no aggregates filters projected rows on select
    aliases; with aggregates it keeps the single-group meaning."""
    db.execute("CREATE TABLE nums (id INT)")
    for i in range(1, 6):
        db.execute(f"INSERT INTO nums VALUES ({i})")
    assert db.query(
        "SELECT id * 2 AS doubled FROM nums HAVING doubled < 6"
    ) == [(2,), (4,)]
    assert db.query(
        "SELECT sum(id) AS s FROM nums HAVING sum(id) > 10") == [(15,)]
    assert db.query(
        "SELECT sum(id) AS s FROM nums HAVING sum(id) > 99") == []
    assert db.query(
        "SELECT id * 2 AS d FROM nums HAVING d > 4 ORDER BY id DESC"
    ) == [(10,), (8,), (6,)]


def test_on_conflict_unqualified_binds_target(db):
    """Reference regression_smoke_test.rs:579: unqualified names in
    DO UPDATE SET bind to the existing TARGET row (PostgreSQL scoping);
    the proposed row needs the excluded. qualifier."""
    db.execute("CREATE TABLE cu (id INT PRIMARY KEY, counter INT)")
    db.execute("INSERT INTO cu VALUES (1, 1)")
    db.execute("INSERT INTO cu VALUES (1, 1) ON CONFLICT (id) "
               "DO UPDATE SET counter = counter + 1")
    assert db.query("SELECT counter FROM cu WHERE id = 1") == [(2,)]
    db.execute("INSERT INTO cu VALUES (1, 50) ON CONFLICT (id) "
               "DO UPDATE SET counter = excluded.counter + 1")
    assert db.query("SELECT counter FROM cu WHERE id = 1") == [(51,)]


def test_filtered_and_plain_aggregate_coexist(db):
    """Differential-fuzz-found: aggregates are deduplicated by rendered
    text, and FILTER wasn't part of the rendering — so count(*)
    FILTER (WHERE p) and a bare count(*) in the same grouped query
    collapsed into ONE aggregate (the filtered result served both)."""
    db.execute("CREATE TABLE fa (g INT, v INT)")
    for g, v in [(1, 5), (1, 50), (2, 7), (2, 9)]:
        db.execute(f"INSERT INTO fa VALUES ({g}, {v})")
    assert db.query(
        "SELECT g, count(*) FILTER (WHERE v > 10), count(*) FROM fa "
        "GROUP BY g ORDER BY g"
    ) == [(1, 1, 2), (2, 0, 2)]
    # two different FILTERs on the same aggregate stay distinct too
    assert db.query(
        "SELECT count(*) FILTER (WHERE v > 10), "
        "count(*) FILTER (WHERE v > 6), count(*) FROM fa"
    ) == [(1, 3, 4)]


def test_fetch_first_and_offset_rows(db):
    """SQL-standard FETCH {FIRST|NEXT} n {ROW|ROWS} ONLY and
    OFFSET n ROWS (reference lexes FETCH, never parses it)."""
    db.execute("CREATE TABLE ff (a INT)")
    for i in range(6):
        db.execute(f"INSERT INTO ff VALUES ({i})")
    assert db.query(
        "SELECT a FROM ff ORDER BY a FETCH FIRST 2 ROWS ONLY"
    ) == [(0,), (1,)]
    assert db.query(
        "SELECT a FROM ff ORDER BY a OFFSET 2 ROWS FETCH NEXT 2 ROWS ONLY"
    ) == [(2,), (3,)]
    assert db.query(
        "SELECT a FROM ff ORDER BY a DESC FETCH FIRST ROW ONLY"
    ) == [(5,)]
    assert db.query(
        "SELECT a FROM ff UNION SELECT a + 10 FROM ff "
        "ORDER BY a FETCH FIRST 3 ROWS ONLY"
    ) == [(0,), (1,), (2,)]


def test_aggregate_order_by(db):
    """agg(x ORDER BY keys) for order-sensitive aggregates; rendered
    into the aggregate's identity so differently-ordered aggs coexist;
    order-insensitive aggregates reject it."""
    db.execute("CREATE TABLE ao (a INT, g TEXT, b TEXT)")
    for a, g, b in [(3, 'x', 'c'), (1, 'x', 'a'), (2, 'x', 'b'),
                    (5, 'y', 'e'), (4, 'y', 'd')]:
        db.execute(f"INSERT INTO ao VALUES ({a}, '{g}', '{b}')")
    assert db.query(
        "SELECT g, string_agg(b, ',' ORDER BY a) FROM ao "
        "GROUP BY g ORDER BY g"
    ) == [('x', 'a,b,c'), ('y', 'd,e')]
    assert db.query(
        "SELECT g, string_agg(b, ',' ORDER BY a), "
        "string_agg(b, ',' ORDER BY a DESC) FROM ao GROUP BY g ORDER BY g"
    ) == [('x', 'a,b,c', 'c,b,a'), ('y', 'd,e', 'e,d')]
    assert db.query("SELECT array_agg(a ORDER BY b DESC) FROM ao") == \
        [([5, 4, 3, 2, 1],)]
    with pytest.raises(SqlError):
        db.query("SELECT sum(a ORDER BY b) FROM ao")


def test_similar_to(db):
    """[NOT] SIMILAR TO: LIKE wildcards + the SQL regex subset
    (| * + ? () [] {}), other characters literal, full-anchored."""
    db.execute("CREATE TABLE st (b TEXT)")
    for w in ["w0", "w1", "w5", "abc", "a.c", "xyz"]:
        db.execute(f"INSERT INTO st VALUES ('{w}')")
    q = lambda p: [r[0] for r in db.query(
        f"SELECT b FROM st WHERE b SIMILAR TO '{p}' ORDER BY b")]
    assert q("w[0-3]") == ["w0", "w1"]
    assert q("(abc|xyz)") == ["abc", "xyz"]
    assert q("a.c") == ["a.c"]          # dot is literal in SQL regex
    assert q("a_c") == ["a.c", "abc"]
    assert q("w[0-9]{1}") == ["w0", "w1", "w5"]
    assert [r[0] for r in db.query(
        "SELECT b FROM st WHERE b NOT SIMILAR TO 'w%' ORDER BY b"
    )] == ["a.c", "abc", "xyz"]


def test_unnest_table_function(db):
    """UNNEST(arrays..) [WITH ORDINALITY] [AS t(cols..)] in FROM
    (reference lexes UNNEST/ORDINALITY, never parses; PostgreSQL
    semantics: multi-array zip NULL-pads to the longest)."""
    assert db.query("SELECT * FROM unnest(ARRAY[1,2,3])") == \
        [(1,), (2,), (3,)]
    assert db.query(
        "SELECT x, o FROM unnest(ARRAY['a','b']) WITH ORDINALITY AS t(x, o)"
    ) == [('a', 1), ('b', 2)]
    assert db.query(
        "SELECT * FROM unnest(ARRAY[1,2], ARRAY['x','y','z'])"
    ) == [(1, 'x'), (2, 'y'), (None, 'z')]
    assert db.query("SELECT sum(unnest) FROM unnest(ARRAY[1,2,3])") == \
        [(6,)]
    assert db.query(
        "SELECT t.x, s.n FROM unnest(ARRAY[1,2]) AS t(x) "
        "JOIN unnest(ARRAY[2,3]) AS s(n) ON t.x = s.n"
    ) == [(2, 2)]


def test_ordered_set_aggregates(db):
    """percentile_cont / percentile_disc / mode() WITHIN GROUP
    (ORDER BY ..) — PostgreSQL 9.21.4 semantics, grouped + FILTER."""
    db.execute("CREATE TABLE os (g TEXT, a INT)")
    for g, a in [('x', 1), ('x', 2), ('x', 3), ('x', 4),
                 ('y', 10), ('y', 20), ('y', 20), ('y', 30)]:
        db.execute(f"INSERT INTO os VALUES ('{g}', {a})")
    assert db.query(
        "SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY a) FROM os"
    ) == [(7.0,)]
    assert db.query(
        "SELECT g, percentile_cont(0.5) WITHIN GROUP (ORDER BY a), "
        "percentile_disc(0.5) WITHIN GROUP (ORDER BY a), "
        "mode() WITHIN GROUP (ORDER BY a) FROM os GROUP BY g ORDER BY g"
    ) == [('x', 2.5, 2, 1), ('y', 20.0, 20, 20)]
    assert db.query(
        "SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY a) "
        "FILTER (WHERE g = 'y') FROM os"
    ) == [(20.0,)]
    with pytest.raises(SqlError):
        db.query("SELECT percentile_cont(0.5) FROM os")
    with pytest.raises(SqlError):
        db.query("SELECT percentile_cont(1.5) WITHIN GROUP "
                 "(ORDER BY a) FROM os")


def test_grouping_sets_rollup_cube(db):
    """GROUP BY ROLLUP / CUBE / GROUPING SETS + grouping() bitmask
    (reference lexes the keywords, lexer.rs:421-476, never parses them;
    PostgreSQL 7.2.4 semantics)."""
    db.execute("CREATE TABLE gsr (a TEXT, b TEXT, c INT)")
    for a, b, c in [('x', 'p', 1), ('x', 'q', 2), ('y', 'p', 4),
                    ('y', 'q', 8), ('y', 'q', 16)]:
        db.execute(f"INSERT INTO gsr VALUES ('{a}', '{b}', {c})")
    assert db.query(
        "SELECT a, b, sum(c) FROM gsr GROUP BY ROLLUP (a, b) "
        "ORDER BY 1 NULLS LAST, 2 NULLS LAST"
    ) == [('x', 'p', 1), ('x', 'q', 2), ('x', None, 3),
          ('y', 'p', 4), ('y', 'q', 24), ('y', None, 28),
          (None, None, 31)]
    assert db.query(
        "SELECT a, b, sum(c) FROM gsr GROUP BY CUBE (a, b) "
        "ORDER BY 1 NULLS LAST, 2 NULLS LAST"
    ) == [('x', 'p', 1), ('x', 'q', 2), ('x', None, 3),
          ('y', 'p', 4), ('y', 'q', 24), ('y', None, 28),
          (None, 'p', 5), (None, 'q', 26), (None, None, 31)]
    assert db.query(
        "SELECT a, b, sum(c) FROM gsr GROUP BY GROUPING SETS "
        "((a), (b), ()) ORDER BY 1 NULLS LAST, 2 NULLS LAST"
    ) == [('x', None, 3), ('y', None, 28),
          (None, 'p', 5), (None, 'q', 26), (None, None, 31)]
    # grouping() bitmask: leftmost argument = most significant bit
    assert db.query(
        "SELECT a, grouping(a), grouping(a, b), sum(c) FROM gsr "
        "GROUP BY ROLLUP (a, b) ORDER BY 1 NULLS LAST, 3, 4"
    )[-1] == (None, 1, 3, 31)
    # plain keys compose with constructs by cross product
    assert db.query(
        "SELECT a, b, sum(c) FROM gsr GROUP BY a, ROLLUP (b) "
        "ORDER BY 1, 2 NULLS LAST"
    ) == [('x', 'p', 1), ('x', 'q', 2), ('x', None, 3),
          ('y', 'p', 4), ('y', 'q', 24), ('y', None, 28)]
    # HAVING sees grouping()
    assert db.query(
        "SELECT a, sum(c) FROM gsr GROUP BY ROLLUP (a) "
        "HAVING grouping(a) = 1"
    ) == [(None, 31)]
    # excluded keys fold to NULL even inside CASE arms (tuple fields)
    assert db.query(
        "SELECT CASE WHEN b = 'p' THEN 'P' ELSE coalesce(b, '-') END, "
        "sum(c) FROM gsr GROUP BY ROLLUP (b) ORDER BY 2"
    )[-1] == ('-', 31)
    # empty input: only the () set emits its global row
    db.execute("CREATE TABLE gse (a TEXT, c INT)")
    assert db.query(
        "SELECT a, count(*) FROM gse GROUP BY ROLLUP (a)"
    ) == [(None, 0)]


def test_distinct_on(db):
    """SELECT DISTINCT ON (exprs): first row per key in ORDER BY order
    (PostgreSQL; reference AST carries Distinct::DistinctOn, ast.rs:157,
    its parser never emits it)."""
    db.execute("CREATE TABLE don (uid INT, oid INT, amt INT)")
    for uid, oid, amt in [(1, 10, 5), (1, 11, 9), (2, 20, 3),
                          (2, 21, 1), (2, 22, 7)]:
        db.execute(f"INSERT INTO don VALUES ({uid}, {oid}, {amt})")
    assert db.query(
        "SELECT DISTINCT ON (uid) uid, oid, amt FROM don "
        "ORDER BY uid, amt DESC"
    ) == [(1, 11, 9), (2, 22, 7)]
    # key not in the output resolves against the pre-projection source
    assert db.query(
        "SELECT DISTINCT ON (uid) oid FROM don ORDER BY uid, amt"
    ) == [(10,), (21,)]
    assert db.query(
        "SELECT DISTINCT ON (uid % 2) uid, amt FROM don "
        "ORDER BY uid % 2, amt DESC"
    ) == [(2, 7), (1, 9)]


def test_tablesample(db):
    """TABLESAMPLE {BERNOULLI|SYSTEM} (pct) [REPEATABLE (seed)]
    (reference lexes TABLESAMPLE/REPEATABLE, never parses them)."""
    import numpy as np

    db.execute("CREATE TABLE ts (a INT)")
    db.bulk_insert("ts", {"a": np.arange(10000)})
    r1 = db.query(
        "SELECT count(*) FROM ts TABLESAMPLE BERNOULLI (10) REPEATABLE (42)"
    )
    assert r1 == db.query(
        "SELECT count(*) FROM ts TABLESAMPLE BERNOULLI (10) REPEATABLE (42)"
    )
    assert 700 <= r1[0][0] <= 1300        # ~10% of 10k
    (n_sys,) = db.query(
        "SELECT count(*) FROM ts TABLESAMPLE SYSTEM (50) REPEATABLE (7)"
    )[0]
    assert n_sys % 1024 in (0, 10000 % 1024)   # whole blocks (or the tail)
    assert db.query("SELECT count(*) FROM ts TABLESAMPLE BERNOULLI (0)") \
        == [(0,)]
    assert db.query("SELECT count(*) FROM ts TABLESAMPLE BERNOULLI (100)") \
        == [(10000,)]
    # works with an alias before the clause
    assert len(db.query(
        "SELECT x.a FROM ts x TABLESAMPLE BERNOULLI (1) REPEATABLE (1)"
    )) > 0


def test_threaded_handles(tmp_path):
    """Concurrent handles on threads: one shared statement-level RLock
    serializes engine state mutation (reference SharedDatabase uses
    page/table locks; before this lock, 4 threads lost ~25% of inserts
    and produced corrupted rows)."""
    import threading

    db = Database.create(str(tmp_path / "thr"))
    db.execute("CREATE TABLE t (id INT PRIMARY KEY, tid INT, v INT)")
    nt, per = 4, 500
    errors = []

    def worker(tid):
        try:
            h = db.handle()
            st = h.prepare("INSERT INTO t VALUES ($1, $2, $3)")
            for i in range(per):
                st.execute([tid * per + i, tid, i])
            h.execute("BEGIN")
            h.execute(f"UPDATE t SET v = v + 1 WHERE tid = {tid} "
                      f"AND id % 7 = 0")
            h.execute("COMMIT")
            q = h.prepare("SELECT v FROM t WHERE id = $1")
            for i in range(0, per, 10):
                assert len(q.query([tid * per + i])) == 1
        except Exception as e:                 # pragma: no cover
            errors.append((tid, repr(e)[:200]))

    ts = [threading.Thread(target=worker, args=(k,)) for k in range(nt)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert errors == []
    assert db.query("SELECT count(*) FROM t") == [(nt * per,)]
    assert db.query(
        "SELECT tid, count(*) FROM t GROUP BY tid ORDER BY tid"
    ) == [(k, per) for k in range(nt)]
    db.close()


def test_temp_tables(tmp_path):
    """CREATE [TEMP|TEMPORARY] TABLE (reference AST carries the flag,
    ast.rs:330; parser never sets it): fully queryable/joinable in the
    process, never persisted — absent after BOTH a crash-reopen (WAL
    replay) and a clean close (checkpoint)."""
    p = str(tmp_path / "tmp")
    db = Database.create(p)
    db.execute("CREATE TABLE perm (a INT)")
    db.execute("INSERT INTO perm VALUES (1)")
    db.execute("CREATE TEMP TABLE scratch (a INT PRIMARY KEY, b TEXT)")
    st = db.prepare("INSERT INTO scratch VALUES ($1, $2)")
    for i in range(50):
        st.execute([i, f"v{i}"])           # prepared lane must bail to
    db.execute("UPDATE scratch SET b = 'y' WHERE a = 7")
    db.execute("CREATE INDEX si ON scratch (b)")
    db.execute("DELETE FROM scratch WHERE a >= 40")
    assert db.query("SELECT count(*) FROM scratch") == [(40,)]
    assert db.query(
        "SELECT perm.a, scratch.b FROM perm JOIN scratch ON scratch.a = 7"
    ) == [(1, 'y')]
    db.wal.flush()
    db.wal.close()                          # crash
    db2 = Database.open(p)
    assert db2.query("SELECT * FROM perm") == [(1,)]
    with pytest.raises(SqlError):
        db2.query("SELECT * FROM scratch")
    db2.execute("CREATE TEMPORARY TABLE s2 (z INT)")
    db2.execute("INSERT INTO s2 VALUES (5)")
    db2.close()                             # clean close (checkpoint)
    db3 = Database.open(p)
    with pytest.raises(SqlError):
        db3.query("SELECT * FROM s2")
    db3.close()


def test_trim_standard_syntax(db):
    """TRIM([LEADING|TRAILING|BOTH] [chars] FROM s) (SQL standard; the
    reference supports only trim(s[, chars]))."""
    assert db.query(
        "SELECT trim(LEADING 'x' FROM 'xxhixx'), "
        "trim(TRAILING 'x' FROM 'xxhixx'), "
        "trim(BOTH 'x' FROM 'xxhixx'), "
        "trim('x' FROM 'xxhixx'), trim('  a  '), trim('xxaxx', 'x')"
    ) == [('hixx', 'xxhi', 'hi', 'hi', 'a', 'a')]


def test_on_conflict_on_constraint_and_show_all(db):
    """ON CONFLICT ON CONSTRAINT name (reference OnConflictTarget::
    Constraint), DROP COLUMN .. CASCADE/RESTRICT, SHOW ALL."""
    db.execute("CREATE TABLE oc (id INT PRIMARY KEY, v INT)")
    db.execute("INSERT INTO oc VALUES (1, 5)")
    db.execute("INSERT INTO oc VALUES (1, 9) ON CONFLICT ON CONSTRAINT "
               "__pk_oc_id DO UPDATE SET v = excluded.v")
    assert db.query("SELECT v FROM oc") == [(9,)]
    db.execute("INSERT INTO oc VALUES (1, 2) ON CONFLICT ON CONSTRAINT "
               "oc_pkey DO NOTHING")       # pg-style pkey alias
    assert db.query("SELECT v FROM oc") == [(9,)]
    with pytest.raises(SqlError):
        db.execute("INSERT INTO oc VALUES (1, 2) ON CONFLICT "
                   "ON CONSTRAINT nope DO NOTHING")
    db.execute("ALTER TABLE oc ADD COLUMN w INT")
    db.execute("ALTER TABLE oc DROP COLUMN w CASCADE")
    rows = dict(db.query("SHOW ALL"))
    assert rows["wal"] == "True" and "synchronous" in rows


def test_analyze_statistics(db):
    """ANALYZE [table] collects row counts + per-column n_distinct /
    null_frac into turdb_catalog.statistics (reference lexes ANALYZE
    without implementing it; pg_stats-shaped, reduced)."""
    db.execute("CREATE TABLE an (a INT, b TEXT)")
    for i in range(100):
        v = "NULL" if i % 4 == 0 else repr(chr(97 + i % 3))
        db.execute(f"INSERT INTO an VALUES ({i % 7}, {v})")
    assert db.execute("ANALYZE an").rows_affected == 1
    rows = {r[2]: r for r in db.query(
        "SELECT * FROM turdb_catalog.statistics") if r[1] == 'an'}
    assert rows["a"][3] == 100 and rows["a"][4] == 7
    assert rows["b"][4] == 3 and abs(rows["b"][5] - 0.25) < 1e-9
    db.execute("VACUUM ANALYZE")                 # pg spelling accepted
    db.execute("ANALYZE")                        # all tables

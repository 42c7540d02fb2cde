"""Executable views (reference parses CREATE VIEW — ast.rs:544,
parser.rs:2132 — but its executor bails 'unsupported statement type',
database.rs:4397; here views execute, persist, and compose)."""

import pytest

from turdb_tpu.database.api import Database, DatabaseError
from turdb_tpu.sql.lexer import SqlError


@pytest.fixture
def db(tmp_path):
    d = Database.create(str(tmp_path / "v"))
    d.execute("CREATE TABLE t(id INT PRIMARY KEY, grp TEXT, val INT)")
    d.bulk_insert("t", [
        {"id": i, "grp": "ab"[i % 2], "val": i * 10} for i in range(10)
    ])
    yield d
    d.close()


class TestViewBasics:
    def test_create_query_drop(self, db):
        db.execute("CREATE VIEW big AS SELECT id, val FROM t WHERE val >= 50")
        rows = db.query("SELECT id FROM big ORDER BY id")
        assert [r[0] for r in rows] == [5, 6, 7, 8, 9]
        db.execute("DROP VIEW big")
        with pytest.raises(SqlError):
            db.query("SELECT * FROM big")

    def test_column_renames(self, db):
        db.execute(
            "CREATE VIEW agg(g, total) AS "
            "SELECT grp, sum(val) FROM t GROUP BY grp"
        )
        rows = db.query("SELECT g, total FROM agg ORDER BY g")
        assert rows == [("a", 200), ("b", 250)]

    def test_view_with_alias_and_join(self, db):
        db.execute("CREATE VIEW v1 AS SELECT id, val FROM t WHERE val < 40")
        rows = db.query(
            "SELECT a.id, b.val FROM v1 a JOIN v1 b ON a.id = b.id "
            "ORDER BY a.id"
        )
        assert rows == [(0, 0), (1, 10), (2, 20), (3, 30)]

    def test_view_on_view(self, db):
        db.execute("CREATE VIEW v1 AS SELECT id, val FROM t WHERE val >= 20")
        db.execute("CREATE VIEW v2 AS SELECT id FROM v1 WHERE val < 60")
        assert [r[0] for r in db.query("SELECT id FROM v2 ORDER BY id")] == \
            [2, 3, 4, 5]

    def test_or_replace(self, db):
        db.execute("CREATE VIEW v AS SELECT id FROM t WHERE id < 2")
        db.execute("CREATE OR REPLACE VIEW v AS SELECT id FROM t WHERE id > 7")
        assert [r[0] for r in db.query("SELECT id FROM v ORDER BY id")] == \
            [8, 9]
        with pytest.raises(DatabaseError):
            db.execute("CREATE VIEW v AS SELECT id FROM t")
        db.execute("CREATE VIEW IF NOT EXISTS v AS SELECT id FROM t")  # noop

    def test_view_sees_new_rows(self, db):
        db.execute("CREATE VIEW v AS SELECT count(*) AS n FROM t")
        assert db.query("SELECT n FROM v")[0][0] == 10
        db.execute("INSERT INTO t VALUES (100, 'a', 1000)")
        assert db.query("SELECT n FROM v")[0][0] == 11

    def test_where_and_aggregate_over_view(self, db):
        db.execute("CREATE VIEW v AS SELECT grp, val FROM t")
        rows = db.query(
            "SELECT grp, count(*), max(val) FROM v WHERE val > 0 "
            "GROUP BY grp ORDER BY grp"
        )
        assert rows == [("a", 4, 80), ("b", 5, 90)]


class TestViewErrors:
    def test_dml_on_view_rejected(self, db):
        db.execute("CREATE VIEW v AS SELECT id FROM t")
        for sql in (
            "INSERT INTO v VALUES (1)",
            "UPDATE v SET id = 2",
            "DELETE FROM v",
        ):
            with pytest.raises(SqlError, match="read-only"):
                db.execute(sql)

    def test_drop_table_on_view_hints(self, db):
        db.execute("CREATE VIEW v AS SELECT id FROM t")
        with pytest.raises(DatabaseError, match="DROP VIEW"):
            db.execute("DROP TABLE v")
        db.execute("DROP VIEW IF EXISTS nothere")  # if-exists noop

    def test_create_table_over_view_rejected(self, db):
        db.execute("CREATE VIEW v AS SELECT id FROM t")
        with pytest.raises(DatabaseError, match="is a view"):
            db.execute("CREATE TABLE v(x INT)")

    def test_invalid_body_rejected_and_not_kept(self, db):
        with pytest.raises(Exception):
            db.execute("CREATE VIEW bad AS SELECT nope FROM missing")
        assert "bad" not in db.views["main"]

    def test_cycle_guard(self, db):
        db.execute("CREATE VIEW v1 AS SELECT id FROM t")
        # redefine to reference itself via replace
        db.views["main"]["v1"].sql = "SELECT id FROM v1"
        db.views["main"]["v1"]._ast = None
        with pytest.raises(SqlError, match="nesting too deep"):
            db.query("SELECT * FROM v1")


class TestViewPersistence:
    def test_views_survive_reopen(self, tmp_path):
        p = str(tmp_path / "pv")
        db = Database.create(p)
        db.execute("CREATE TABLE t(id INT, v INT)")
        db.execute("INSERT INTO t VALUES (1, 10), (2, 20), (3, 30)")
        db.execute("CREATE VIEW odd(i) AS SELECT id FROM t WHERE v <> 20")
        db.close()
        db = Database.open(p)
        assert [r[0] for r in db.query("SELECT i FROM odd ORDER BY i")] == \
            [1, 3]
        db.close()

    def test_view_survives_checkpoint_and_wal_replay(self, tmp_path):
        p = str(tmp_path / "cv")
        db = Database.create(p)
        db.execute("CREATE TABLE t(id INT)")
        db.checkpoint()
        # view created AFTER checkpoint lives only in the WAL
        db.execute("CREATE VIEW v AS SELECT id FROM t")
        db.execute("INSERT INTO t VALUES (7)")
        db.close()
        db = Database.open(p)
        assert db.query("SELECT id FROM v")[0][0] == 7
        db.close()

    def test_drop_view_survives_reopen(self, tmp_path):
        p = str(tmp_path / "dv")
        db = Database.create(p)
        db.execute("CREATE TABLE t(id INT)")
        db.execute("CREATE VIEW v AS SELECT id FROM t")
        db.execute("DROP VIEW v")
        db.close()
        db = Database.open(p)
        with pytest.raises(SqlError):
            db.query("SELECT * FROM v")
        db.close()


class TestSystemCatalog:
    def test_views_listed(self, db):
        db.execute("CREATE VIEW v AS SELECT id FROM t")
        rows = db.query(
            "SELECT name, kind FROM turdb_catalog.tables "
            "WHERE kind = 'view'"
        )
        assert ("v", "view") in rows
        rows = db.query(
            "SELECT definition FROM turdb_catalog.views WHERE name = 'v'"
        )
        assert rows[0][0] == "SELECT id FROM t"


class TestSetShow:
    def test_set_and_show(self, db):
        db.execute("SET ann_overfetch = 7")
        assert db.query("SHOW ann_overfetch")[0][0] == 7
        db.execute("SET ann_overfetch TO 4")
        assert db.execute("PRAGMA ann_overfetch").rows[0][0] == 4

    def test_keywords_stay_identifiers(self, db):
        db.execute("CREATE TABLE kv(view INT, show INT, session INT)")
        db.execute("INSERT INTO kv VALUES (1, 2, 3)")
        assert db.query("SELECT view, show, session FROM kv") == [(1, 2, 3)]

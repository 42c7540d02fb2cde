"""Join reordering (reference optimizer/rules/join_reordering.rs:66) and
projection pruning (projection_pruning.rs): correctness of reordered
INNER chains and scan-time column pruning."""

import numpy as np
import pytest

from turdb_tpu.database.api import Database


@pytest.fixture()
def db(tmp_path):
    d = Database.create(str(tmp_path / "db"))
    d.execute("PRAGMA wal_autoflush = false")
    yield d


class TestJoinReordering:
    def _seed(self, db):
        rng = np.random.default_rng(3)
        db.execute("CREATE TABLE f (id INT, a_id INT, b_id INT, x INT)")
        db.execute("CREATE TABLE a (id INT, nm TEXT)")
        db.execute("CREATE TABLE b (id INT, c_id INT)")
        db.execute("CREATE TABLE c (id INT, tag TEXT)")
        db.bulk_insert("f", {
            "id": np.arange(5000),
            "a_id": rng.integers(0, 50, 5000),
            "b_id": rng.integers(0, 200, 5000),
            "x": rng.integers(0, 10, 5000),
        })
        db.insert_batch("a", [{"id": i, "nm": f"a{i}"} for i in range(50)])
        db.insert_batch(
            "b", [{"id": i, "c_id": i % 7} for i in range(200)]
        )
        db.insert_batch("c", [{"id": i, "tag": f"t{i}"} for i in range(7)])

    def test_four_way_inner_chain(self, db):
        self._seed(db)
        rows = db.query(
            "SELECT COUNT(*), SUM(f.x) FROM f "
            "JOIN a ON f.a_id = a.id "
            "JOIN b ON f.b_id = b.id "
            "JOIN c ON b.c_id = c.id "
            "WHERE c.tag = 't3' AND f.x > 5"
        )
        # ground truth computed relationally in python
        f = db.query("SELECT a_id, b_id, x FROM f")
        b = dict(db.query("SELECT id, c_id FROM b"))
        cnt = s = 0
        for a_id, b_id, x in f:
            if x > 5 and 0 <= a_id < 50 and b.get(b_id) == 3:
                cnt += 1
                s += x
        assert rows == [(cnt, s)]

    def test_chain_with_cross_component(self, db):
        """A relation with no join edge cross-joins without losing rows."""
        db.execute("CREATE TABLE l (k INT)")
        db.execute("CREATE TABLE m (k INT)")
        db.execute("CREATE TABLE r1 (v INT)")
        db.execute("INSERT INTO l VALUES (1), (2)")
        db.execute("INSERT INTO m VALUES (1), (3)")
        db.execute("INSERT INTO r1 VALUES (10), (20)")
        rows = db.query(
            "SELECT l.k, r1.v FROM l JOIN m ON l.k = m.k "
            "JOIN r1 ON 1 = 1 ORDER BY r1.v"
        )
        assert rows == [(1, 10), (1, 20)]

    def test_outer_join_inside_chain_not_reordered(self, db):
        db.execute("CREATE TABLE t1 (k INT)")
        db.execute("CREATE TABLE t2 (k INT, v INT)")
        db.execute("CREATE TABLE t3 (v INT, w TEXT)")
        db.execute("INSERT INTO t1 VALUES (1), (2)")
        db.execute("INSERT INTO t2 VALUES (1, 100)")
        db.execute("INSERT INTO t3 VALUES (100, 'hi')")
        rows = db.query(
            "SELECT t1.k, t3.w FROM t1 LEFT JOIN t2 ON t1.k = t2.k "
            "JOIN t3 ON t2.v = t3.v"
        )
        assert rows == [(1, "hi")]

    def test_reorder_faster_than_parse_order(self, db):
        """big x big x tiny: greedy order must start from the selective
        small relations; parse order would materialize big x big."""
        import time

        rng = np.random.default_rng(5)
        db.execute("CREATE TABLE big1 (k INT, v INT)")
        db.execute("CREATE TABLE big2 (k INT, v INT)")
        db.execute("CREATE TABLE tiny (k INT)")
        db.bulk_insert("big1", {
            "k": rng.integers(0, 100_000, 200_000),
            "v": np.arange(200_000),
        })
        db.bulk_insert("big2", {
            "k": rng.integers(0, 100_000, 200_000),
            "v": np.arange(200_000),
        })
        db.execute("INSERT INTO tiny VALUES (7)")
        q = ("SELECT COUNT(*) FROM big1 JOIN big2 ON big1.k = big2.k "
             "JOIN tiny ON big1.k = tiny.k")
        db.query(q)
        t0 = time.perf_counter()
        db.query(q)
        dt = time.perf_counter() - t0
        assert dt < 2.0, f"3-way join took {dt:.2f}s (reordering broken?)"


class TestProjectionPruning:
    def test_only_referenced_columns_scanned(self, db, monkeypatch):
        db.execute(
            "CREATE TABLE wide (a INT, b INT, c INT, d TEXT, e TEXT, f TEXT)"
        )
        db.execute("INSERT INTO wide VALUES (1, 2, 3, 'x', 'y', 'z')")
        info = db.catalog["main"]["wide"]
        scanned = []
        orig = info.table.column_batch

        def spy(name, idx):
            scanned.append(name)
            return orig(name, idx)

        monkeypatch.setattr(info.table, "column_batch", spy)
        assert db.query("SELECT a FROM wide WHERE b > 1") == [(1,)]
        assert set(scanned) == {"a", "b"}
        scanned.clear()
        db.query("SELECT * FROM wide")
        assert set(scanned) == {"a", "b", "c", "d", "e", "f"}

    def test_pruning_with_order_and_subquery(self, db):
        db.execute("CREATE TABLE t (a INT, b INT, c INT)")
        db.execute("INSERT INTO t VALUES (1, 10, 100), (2, 20, 200)")
        assert db.query("SELECT a FROM t ORDER BY c DESC") == [(2,), (1,)]
        db.execute("CREATE TABLE u (a INT)")
        db.execute("INSERT INTO u VALUES (2)")
        assert db.query(
            "SELECT b FROM t WHERE EXISTS (SELECT 1 FROM u WHERE u.a = t.a)"
        ) == [(20,)]


class TestConstantFolding:
    def test_fold_shapes(self):
        from turdb_tpu.sql import ast as A
        from turdb_tpu.sql.fold import fold_statement
        from turdb_tpu.sql.parser import parse_sql

        s = fold_statement(parse_sql(
            "SELECT 1 + 2 * 3, upper('ab') || 'c', a + (2 + 3) "
            "FROM t WHERE x > 10 / 2 AND 1 = 1"
        ))
        assert s.items[0].expr == A.Literal(7)
        assert s.items[1].expr == A.Literal("ABc")
        # maximal constant child folds inside a non-constant parent
        assert s.items[2].expr.right == A.Literal(5)
        assert s.where.left.right == A.Literal(5)
        assert s.where.right == A.Literal(True)

    def test_volatile_and_params_stay(self):
        from turdb_tpu.sql import ast as A
        from turdb_tpu.sql.fold import fold_statement
        from turdb_tpu.sql.parser import parse_sql

        s = fold_statement(parse_sql("SELECT random() + 0, now(), abs($1)"))
        assert not isinstance(s.items[0].expr, A.Literal)
        assert not isinstance(s.items[1].expr, A.Literal)
        assert not isinstance(s.items[2].expr, A.Literal)
        # CASE over constants folds; subqueries never do
        s2 = fold_statement(parse_sql(
            "SELECT CASE WHEN 1 < 2 THEN 'y' ELSE 'n' END, (SELECT 1)"
        ))
        assert s2.items[0].expr == A.Literal("y")
        assert not isinstance(s2.items[1].expr, A.Literal)

    def test_folded_results_match(self, db):
        db.execute("CREATE TABLE ft (a INT)")
        db.execute("INSERT INTO ft VALUES (1), (2), (3)")
        assert db.query(
            "SELECT a + 2 * 3 FROM ft WHERE a < 10 / 2 ORDER BY a"
        ) == [(7,), (8,), (9,)]
        assert db.query("SELECT count(*) FROM ft WHERE 1 = 0") == [(0,)]

"""Subquery decorrelation (reference optimizer/rules/decorrelate.rs:56 +
tests/subquery_stress_test.rs class): correlated IN/EXISTS/scalar
subqueries must execute SET-WISE (one subquery run + factorized probe),
verified by the decorrelated/rowwise counters, with results identical to
the row-wise semantics."""

import numpy as np
import pytest

from turdb_tpu.database.api import Database
from turdb_tpu.sql import engine as E


@pytest.fixture()
def db(tmp_path):
    d = Database.create(str(tmp_path / "db"))
    d.execute("PRAGMA wal_autoflush = false")
    d.execute("CREATE TABLE o (id INT, grp INT, v INT)")
    d.execute("CREATE TABLE s (grp INT, w INT)")
    rng = np.random.default_rng(7)
    d.bulk_insert("o", {
        "id": np.arange(300),
        "grp": rng.integers(0, 20, 300),
        "v": rng.integers(0, 50, 300),
    })
    d.bulk_insert("s", {
        "grp": rng.integers(0, 25, 400),
        "w": rng.integers(0, 50, 400),
    })
    yield d


def _counts():
    return E.STATS["decorrelated"], E.STATS["rowwise_subqueries"]


class TestExists:
    def test_correlated_exists_setwise(self, db):
        d0, r0 = _counts()
        rows = db.query(
            "SELECT COUNT(*) FROM o WHERE EXISTS "
            "(SELECT 1 FROM s WHERE s.grp = o.grp AND s.w > 40)"
        )
        d1, r1 = _counts()
        assert d1 > d0 and r1 == r0, "EXISTS must decorrelate, not loop"
        # row-wise ground truth via a self-check query
        want = db.query(
            "SELECT COUNT(*) FROM o WHERE grp IN "
            "(SELECT grp FROM s WHERE w > 40)"
        )
        assert rows == want

    def test_not_exists(self, db):
        got = db.query(
            "SELECT COUNT(*) FROM o WHERE NOT EXISTS "
            "(SELECT 1 FROM s WHERE s.grp = o.grp)"
        )[0][0]
        present = {r[0] for r in db.query("SELECT DISTINCT grp FROM s")}
        want = sum(
            1 for (g,) in db.query("SELECT grp FROM o") if g not in present
        )
        assert got == want


class TestInSubquery:
    def test_correlated_in_setwise(self, db):
        d0, r0 = _counts()
        got = db.query(
            "SELECT COUNT(*) FROM o WHERE v IN "
            "(SELECT w FROM s WHERE s.grp = o.grp)"
        )[0][0]
        d1, r1 = _counts()
        assert d1 > d0 and r1 == r0
        pairs = set(db.query("SELECT grp, w FROM s"))
        want = sum(
            1 for g, v in db.query("SELECT grp, v FROM o") if (g, v) in pairs
        )
        assert got == want

    def test_correlated_not_in_null_semantics(self, db):
        db.execute("CREATE TABLE o2 (id INT, k INT)")
        db.execute("CREATE TABLE s2 (k INT, c INT)")
        db.execute("INSERT INTO o2 VALUES (1, 10), (2, 20), (3, 30)")
        # k=10: contains NULL candidate -> NOT IN is UNKNOWN (filtered)
        # k=20: values without the operand -> TRUE
        # k=30: empty group -> TRUE
        db.execute("INSERT INTO s2 VALUES (10, NULL), (10, 5), (20, 7)")
        got = db.query(
            "SELECT id FROM o2 WHERE id NOT IN "
            "(SELECT c FROM s2 WHERE s2.k = o2.k) ORDER BY id"
        )
        assert got == [(2,), (3,)]


class TestScalar:
    def test_correlated_agg_setwise(self, db):
        d0, r0 = _counts()
        rows = db.query(
            "SELECT grp, (SELECT MAX(w) FROM s WHERE s.grp = o.grp) FROM o "
            "ORDER BY id LIMIT 50"
        )
        d1, r1 = _counts()
        assert d1 > d0 and r1 == r0
        best: dict = {}
        for g, w in db.query("SELECT grp, w FROM s"):
            best[g] = max(best.get(g, w), w)
        for g, m in rows:
            assert m == best.get(g)  # None for empty groups

    def test_correlated_count_empty_group_is_zero(self, db):
        db.execute("CREATE TABLE p (id INT)")
        db.execute("CREATE TABLE c (pid INT)")
        db.execute("INSERT INTO p VALUES (1), (2)")
        db.execute("INSERT INTO c VALUES (1), (1)")
        rows = db.query(
            "SELECT id, (SELECT COUNT(*) FROM c WHERE c.pid = p.id) "
            "FROM p ORDER BY id"
        )
        assert rows == [(1, 2), (2, 0)]

    def test_scalar_multirow_error_still_raised(self, db):
        db.execute("CREATE TABLE m (k INT, v INT)")
        db.execute("INSERT INTO m VALUES (1, 10), (1, 20)")
        with pytest.raises(Exception, match="more than one row"):
            db.query(
                "SELECT (SELECT v FROM m WHERE m.k = o.grp) FROM o "
                "WHERE o.grp = 1"
            )

    def test_plain_scalar_correlated(self, db):
        db.execute("CREATE TABLE u (k INT, nm TEXT)")
        db.execute("INSERT INTO u VALUES (1, 'one'), (2, 'two')")
        db.execute("CREATE TABLE q (id INT, k INT)")
        db.execute("INSERT INTO q VALUES (10, 1), (11, 2), (12, 3)")
        rows = db.query(
            "SELECT id, (SELECT nm FROM u WHERE u.k = q.k) FROM q ORDER BY id"
        )
        assert rows == [(10, "one"), (11, "two"), (12, None)]


class TestFallback:
    def test_nonequi_correlation_falls_back_correctly(self, db):
        """Inequality correlation can't decorrelate — row-wise still right."""
        db.execute("CREATE TABLE a2 (id INT, v INT)")
        db.execute("CREATE TABLE b2 (w INT)")
        db.execute("INSERT INTO a2 VALUES (1, 5), (2, 15)")
        db.execute("INSERT INTO b2 VALUES (10), (20)")
        r0 = E.STATS["rowwise_subqueries"]
        rows = db.query(
            "SELECT id FROM a2 WHERE EXISTS "
            "(SELECT 1 FROM b2 WHERE b2.w < a2.v) ORDER BY id"
        )
        assert rows == [(2,)]
        assert E.STATS["rowwise_subqueries"] > r0

    def test_perf_correlated_in_large(self, db, tmp_path):
        """10k outer rows x 10k inner rows: set-wise finishes fast; the
        row-wise loop would run 10k subqueries (~minutes)."""
        import time

        d = Database.create(str(tmp_path / "perf"))
        d.execute("PRAGMA wal_autoflush = false")
        rng = np.random.default_rng(1)
        d.execute("CREATE TABLE big_o (id INT, grp INT)")
        d.execute("CREATE TABLE big_s (grp INT, w INT)")
        d.bulk_insert("big_o", {
            "id": np.arange(10_000), "grp": rng.integers(0, 500, 10_000),
        })
        d.bulk_insert("big_s", {
            "grp": rng.integers(0, 600, 10_000),
            "w": rng.integers(0, 10, 10_000),
        })
        t0 = time.perf_counter()
        (n,) = d.query(
            "SELECT COUNT(*) FROM big_o WHERE EXISTS "
            "(SELECT 1 FROM big_s WHERE big_s.grp = big_o.grp AND w > 5)"
        )[0]
        dt = time.perf_counter() - t0
        assert 0 < n <= 10_000
        assert dt < 1.0, f"correlated EXISTS over 10k rows took {dt:.2f}s"

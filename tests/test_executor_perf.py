"""Executor vectorization: correctness at scale + perf-as-test gates
(the reference's tests/single_insert_benchmark.rs category) and the
Grace-join spill path (tests/grace_hash_join.rs + memory_budget.rs)."""

import time

import numpy as np
import pytest

from turdb_tpu.database.api import Database


@pytest.fixture()
def db(tmp_path):
    d = Database.create(str(tmp_path / "db"))
    d.execute("PRAGMA wal_autoflush = false")
    yield d


def _fill(db, table, n, seed=0):
    rng = np.random.default_rng(seed)
    db.execute(f"CREATE TABLE {table} (id BIGINT, grp BIGINT, x DOUBLE)")
    rows = [
        {"id": int(i), "grp": int(g), "x": float(x)}
        for i, g, x in zip(
            range(n), rng.integers(0, 97, n), rng.standard_normal(n)
        )
    ]
    db.bulk_insert(table, rows)
    return rows


class TestVectorizedCorrectness:
    def test_groupby_matches_numpy(self, db):
        rows = _fill(db, "t", 20_000)
        got = dict(db.query("SELECT grp, SUM(id) FROM t GROUP BY grp"))
        want: dict = {}
        for r in rows:
            want[r["grp"]] = want.get(r["grp"], 0) + r["id"]
        assert got == want

    def test_agg_suite_matches_numpy(self, db):
        _fill(db, "t", 5_000)
        (cnt, s, mn, mx, avg, sd) = db.query(
            "SELECT COUNT(*), SUM(id), MIN(x), MAX(x), AVG(x), STDDEV(x) FROM t"
        )[0]
        xs = np.array([r[0] for r in db.query("SELECT x FROM t")])
        assert cnt == 5_000 and s == sum(range(5_000))
        assert mn == pytest.approx(xs.min()) and mx == pytest.approx(xs.max())
        assert avg == pytest.approx(xs.mean())
        assert sd == pytest.approx(float(xs.std(ddof=1)))

    def test_distinct_and_setops_at_scale(self, db):
        _fill(db, "t", 10_000)
        assert db.query(
            "SELECT COUNT(*) FROM (SELECT DISTINCT grp FROM t) AS d"
        ) == [(97,)]
        rows = db.query(
            "SELECT grp FROM t WHERE grp < 50 INTERSECT SELECT grp FROM t "
            "WHERE grp >= 40"
        )
        assert sorted(r[0] for r in rows) == list(range(40, 50))

    def test_join_matches_bruteforce(self, db):
        _fill(db, "a", 3_000, seed=1)
        _fill(db, "b", 3_000, seed=2)
        got = db.query(
            "SELECT COUNT(*) FROM a JOIN b ON a.grp = b.grp"
        )[0][0]
        ga = [r[0] for r in db.query("SELECT grp FROM a")]
        gb = [r[0] for r in db.query("SELECT grp FROM b")]
        cb: dict = {}
        for g in gb:
            cb[g] = cb.get(g, 0) + 1
        assert got == sum(cb.get(g, 0) for g in ga)

    def test_join_int_equals_float_key(self, db):
        """Value-based join matching: INT 1 joins FLOAT 1.0."""
        db.execute("CREATE TABLE ia (k BIGINT, v TEXT)")
        db.execute("CREATE TABLE fb (k DOUBLE, w TEXT)")
        db.execute("INSERT INTO ia VALUES (1, 'i1'), (2, 'i2'), (3, 'i3')")
        db.execute("INSERT INTO fb VALUES (1.0, 'f1'), (2.5, 'f25'), (3.0, 'f3')")
        rows = db.query(
            "SELECT ia.v, fb.w FROM ia JOIN fb ON ia.k = fb.k ORDER BY ia.v"
        )
        assert rows == [("i1", "f1"), ("i3", "f3")]


class TestGraceSpill:
    def test_grace_join_spills_and_matches_mem_join(self, db, monkeypatch):
        """Over budget, the join must partition, write spill files, and
        return the same rows as the in-memory path (ADVICE r1: partition
        assignment must be value-based — INT/FLOAT keys still match)."""
        from turdb_tpu.sql import engine as E

        db.execute("CREATE TABLE ia (k BIGINT, v BIGINT)")
        db.execute("CREATE TABLE fb (k DOUBLE, w BIGINT)")
        rng = np.random.default_rng(0)
        db.bulk_insert("ia", [
            {"k": int(k), "v": i}
            for i, k in enumerate(rng.integers(0, 500, 2000))
        ])
        db.bulk_insert("fb", [
            {"k": float(k), "w": i}
            for i, k in enumerate(rng.integers(0, 500, 2000))
        ])
        q = "SELECT COUNT(*), SUM(ia.v + fb.w) FROM ia JOIN fb ON ia.k = fb.k"
        want = db.query(q)
        before = dict(E.STATS)
        monkeypatch.setattr(
            type(db.budget), "pool", lambda self, name: 4096
        )
        got = db.query(q)
        assert got == want
        assert E.STATS["grace_joins"] > before["grace_joins"]
        assert E.STATS["spilled_bytes"] > before["spilled_bytes"]
        stats = dict(db.query("PRAGMA spill_stats"))
        assert stats["grace_joins"] == E.STATS["grace_joins"]

    def test_budget_reservation_is_released(self, db):
        _fill(db, "a", 1_000, seed=3)
        db.query("SELECT COUNT(*) FROM a x JOIN a y ON x.grp = y.grp")
        assert db.budget.used("query") == 0


class TestPerfGates:
    """Throughput gates (reference design targets src/lib.rs:64-66:
    >1M rows/s scan, >100K inserts/s; TARGET_BENCH.md:40-67). Bounds are
    loose (CI-safe ~4x headroom) but catch per-row-Python regressions,
    which are 50-100x slower."""

    N = 1_000_000

    @pytest.fixture(scope="class")
    def big(self, tmp_path_factory):
        d = Database.create(str(tmp_path_factory.mktemp("perf") / "db"))
        d.execute("PRAGMA wal_autoflush = false")
        rng = np.random.default_rng(0)
        d.execute("CREATE TABLE big (id BIGINT, grp BIGINT, x DOUBLE)")
        ids = np.arange(self.N)
        grps = rng.integers(0, 1000, self.N)
        xs = rng.standard_normal(self.N)
        t0 = time.perf_counter()
        d.bulk_insert("big", {"id": ids, "grp": grps, "x": xs})
        build_s = time.perf_counter() - t0
        return d, build_s

    def test_bulk_insert_rate(self, big):
        _, build_s = big
        rate = self.N / build_s
        assert rate > 100_000, f"bulk_insert {rate:,.0f} rows/s (< 100k gate)"

    def test_scan_filter_aggregate_1m_under_1s(self, big):
        d, _ = big
        q = ("SELECT grp, COUNT(*), SUM(x) FROM big WHERE x > 0 GROUP BY grp")
        d.query(q)  # warm (parse cache etc.)
        t0 = time.perf_counter()
        rows = d.query(q)
        dt = time.perf_counter() - t0
        assert len(rows) == 1000
        assert dt < 1.0, f"1M scan+filter+agg took {dt:.2f}s (>= 1s gate)"

    def test_scan_rate_1m(self, big):
        d, _ = big
        d.query("SELECT COUNT(*) FROM big WHERE x > 100")
        t0 = time.perf_counter()
        (n,) = d.query("SELECT COUNT(*) FROM big WHERE x > 1")[0]
        dt = time.perf_counter() - t0
        assert 0 < n < self.N
        rate = self.N / dt
        assert rate > 1_000_000, f"scan {rate:,.0f} rows/s (< 1M gate)"

    def test_hash_join_100k_under_1s(self, big):
        d, _ = big
        d.execute("CREATE TABLE dim (grp BIGINT, name BIGINT)")
        d.bulk_insert(
            "dim", {"grp": np.arange(1000), "name": np.arange(1000) * 7}
        )
        q = ("SELECT COUNT(*), SUM(dim.name) FROM big JOIN dim "
             "ON big.grp = dim.grp WHERE big.id < 100000")
        d.query(q)
        t0 = time.perf_counter()
        (cnt, s) = d.query(q)[0]
        dt = time.perf_counter() - t0
        assert cnt == 100_000
        assert dt < 1.0, f"100k-row join took {dt:.2f}s"


class TestUniqueBulkLoad:
    """Round-2: a unique index used to force bulk loads onto the per-row
    pipeline (~3k rows/s); the vectorized unique check + bulk reindex
    keep the fast path (reference gate: >100k inserts/s, lib.rs:66)."""

    N = 200_000

    def test_pk_bulk_insert_rate_and_correctness(self, tmp_path):
        from turdb_tpu import connect

        d = connect(str(tmp_path / "db"))
        d.execute("PRAGMA wal = off")
        d.execute("CREATE TABLE t (id INT PRIMARY KEY, a INT)")
        t0 = time.perf_counter()
        d.bulk_insert(
            "t", {"id": np.arange(self.N), "a": np.arange(self.N) % 97}
        )
        rate = self.N / (time.perf_counter() - t0)
        assert rate > 100_000, f"PK bulk_insert {rate:,.0f} rows/s"
        # index scans see the bulk-loaded rows (round-2 regression: the
        # in-txn reindex missed own-txn rows and probes returned empty)
        assert d.query("SELECT a FROM t WHERE id = 123") == [(123 % 97,)]
        assert d.query(
            "SELECT a FROM t WHERE id > 4 AND id < 8 ORDER BY id"
        ) == [(5,), (6,), (7,)]
        with pytest.raises(Exception):
            d.bulk_insert("t", {"id": np.array([5]), "a": np.array([0])})
        with pytest.raises(Exception):
            d.bulk_insert(
                "t", {"id": np.array([self.N + 1, self.N + 1]),
                      "a": np.array([0, 0])}
            )
        (cnt,) = d.query("SELECT count(*) FROM t")[0]
        assert cnt == self.N
        d.close()

    def test_text_pk_bulk(self, tmp_path):
        from turdb_tpu import connect

        d = connect(str(tmp_path / "db"))
        d.execute("CREATE TABLE s (k TEXT PRIMARY KEY, v INT)")
        n = 20_000
        d.bulk_insert(
            "s",
            {"k": np.array([f"key{i}" for i in range(n)], object),
             "v": np.arange(n)},
        )
        assert d.query("SELECT v FROM s WHERE k = 'key7'") == [(7,)]
        with pytest.raises(Exception):
            d.bulk_insert(
                "s", {"k": np.array(["key7"], object), "v": np.array([1])}
            )
        d.close()


def test_window_1m_rows_perf(db):
    """Vectorized windows (round-3): a 1M-row ranked/running query must
    not crawl (the round-2 per-row eval was ~100x slower). Loose gate
    for CI noise on this burst-throttled box."""
    import time

    import numpy as np

    db.execute("CREATE TABLE w (id INT, grp INT, v DOUBLE)")
    n = 1_000_000
    rng = np.random.default_rng(0)
    db.bulk_insert("w", {
        "id": np.arange(n),
        "grp": rng.integers(0, 1000, n),
        "v": rng.random(n),
    })
    t0 = time.perf_counter()
    r = db.query(
        "SELECT max(rn) FROM (SELECT row_number() OVER "
        "(PARTITION BY grp ORDER BY v) AS rn FROM w)"
    )
    assert r[0][0] > 900
    t_rank = time.perf_counter() - t0
    t0 = time.perf_counter()
    db.query(
        "SELECT count(*) FROM (SELECT sum(v) OVER "
        "(PARTITION BY grp ORDER BY v) AS s FROM w) WHERE s > 1"
    )
    t_sum = time.perf_counter() - t0
    assert t_rank < 15, f"row_number over 1M took {t_rank:.1f}s"
    assert t_sum < 30, f"running sum over 1M took {t_sum:.1f}s"

"""Window function semantics vs SQLite (reference logical.rs:172-183
window inventory + SQL-standard default RANGE frame for aggregates)."""

import sqlite3
import tempfile

import numpy as np
import pytest

from turdb_tpu.database.api import Database


@pytest.fixture()
def pair():
    db = Database.create(tempfile.mkdtemp() + "/w")
    lite = sqlite3.connect(":memory:")
    db.execute("CREATE TABLE t(g INT, v INT, s TEXT)")
    lite.execute("CREATE TABLE t(g INT, v INT, s TEXT)")
    rng = np.random.default_rng(11)
    for _ in range(200):
        g = int(rng.integers(0, 5))
        v = int(rng.integers(0, 20))
        s = "abcde"[int(rng.integers(0, 5))]
        db.execute(f"INSERT INTO t VALUES ({g}, {v}, '{s}')")
        lite.execute("INSERT INTO t VALUES (?, ?, ?)", (g, v, s))
    # a NULL row exercises null ordering in frames
    db.execute("INSERT INTO t VALUES (1, NULL, 'z')")
    lite.execute("INSERT INTO t VALUES (1, NULL, 'z')")
    yield db, lite
    db.close()
    lite.close()


QUERIES = [
    "SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v NULLS FIRST, s) "
    "FROM t ORDER BY g, v NULLS FIRST, s",
    "SELECT g, v, rank() OVER (PARTITION BY g ORDER BY v NULLS FIRST) "
    "FROM t ORDER BY g, v NULLS FIRST, s",
    "SELECT g, v, dense_rank() OVER (PARTITION BY g ORDER BY v NULLS FIRST) "
    "FROM t ORDER BY g, v NULLS FIRST, s",
    "SELECT g, v, ntile(3) OVER (PARTITION BY g ORDER BY v NULLS FIRST, s) "
    "FROM t ORDER BY g, v NULLS FIRST, s",
    "SELECT g, v, ntile(7) OVER (ORDER BY v NULLS FIRST, s, g) FROM t ORDER BY v NULLS FIRST, s, g",
    "SELECT g, v, lag(v) OVER (PARTITION BY g ORDER BY v NULLS FIRST, s) "
    "FROM t ORDER BY g, v NULLS FIRST, s",
    "SELECT g, v, lead(v, 2, -1) OVER (PARTITION BY g ORDER BY v NULLS FIRST, s) "
    "FROM t ORDER BY g, v NULLS FIRST, s",
    "SELECT g, v, sum(v) OVER (PARTITION BY g ORDER BY v NULLS FIRST) "
    "FROM t ORDER BY g, v NULLS FIRST, s",
    "SELECT g, v, count(*) OVER (PARTITION BY g ORDER BY v NULLS FIRST) "
    "FROM t ORDER BY g, v NULLS FIRST, s",
    "SELECT g, v, min(v) OVER (PARTITION BY g ORDER BY v DESC NULLS LAST) "
    "FROM t ORDER BY g, v NULLS FIRST, s",
    "SELECT g, v, max(v) OVER (ORDER BY v NULLS FIRST) FROM t ORDER BY g, v NULLS FIRST, s",
    "SELECT g, v, avg(v) OVER (PARTITION BY g) FROM t ORDER BY g, v NULLS FIRST, s",
]


def _norm(rows):
    out = []
    for r in rows:
        out.append(tuple(
            round(x, 6) if isinstance(x, float) else x for x in r
        ))
    return out


@pytest.mark.parametrize("q", QUERIES)
def test_window_matches_sqlite(pair, q):
    db, lite = pair
    ours = _norm(db.query(q))
    theirs = _norm(lite.execute(q).fetchall())
    assert ours == theirs


def test_ntile_errors(pair):
    db, _ = pair
    with pytest.raises(Exception):
        db.query("SELECT ntile(0) OVER (ORDER BY v NULLS FIRST) FROM t")


def test_large_partition_fast(pair):
    """50k-row ranked partition must be quick (was per-row Python)."""
    import time

    db, _ = pair
    db.execute("CREATE TABLE big(v INT)")
    db.bulk_insert(
        "big", [{"v": int(i * 2654435761 % 100000)} for i in range(50000)]
    )
    t0 = time.perf_counter()
    rows = db.query(
        "SELECT v, rank() OVER (ORDER BY v NULLS FIRST), lag(v) OVER (ORDER BY v NULLS FIRST) FROM big"
    )
    dt = time.perf_counter() - t0
    assert len(rows) == 50000
    assert dt < 2.5, f"window eval too slow: {dt:.2f}s"


def test_rows_frames_vs_sqlite(tmp_path):
    """ROWS frame aggregates (the reference parses frames, parser.rs:1419,
    but never executes them; here they execute) — compared against
    SQLite on every bound shape incl. NULLs and empty frames."""
    import sqlite3

    db = Database.create(str(tmp_path / "wf"))
    lite = sqlite3.connect(":memory:")
    for s in ["CREATE TABLE wt (id INT, g INT, v DOUBLE)",
              "INSERT INTO wt VALUES (1,1,10),(2,1,20),(3,1,30),"
              "(4,2,5),(5,2,15),(6,2,NULL)"]:
        db.execute(s)
        lite.execute(s)
    frames = [
        "ROWS BETWEEN 1 PRECEDING AND CURRENT ROW",
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING",
        "ROWS 2 PRECEDING",
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING",
        "ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING",
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING",
        "RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING",
        "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
    ]
    for fn in ("sum", "avg", "min", "max", "count"):
        for fr in frames:
            for part in ("", "PARTITION BY g "):
                sql = (f"SELECT id, {fn}(v) OVER ({part}ORDER BY id {fr}) "
                       f"FROM wt ORDER BY id")
                assert repr(db.query(sql)) == \
                    repr(lite.execute(sql).fetchall()), sql
    lite.close()
    db.close()


def test_range_offset_frames_vs_sqlite(tmp_path):
    """RANGE frames with numeric offsets (order-key distance scans;
    reference parses these, parser.rs:1419, but never executes them) —
    every bound shape x aggregate x sort direction x NULL placement,
    compared against SQLite's native implementation. NULL ordering is
    pinned explicitly: this engine defaults NULLS LAST for ASC (the
    PostgreSQL convention), SQLite the opposite."""
    import itertools
    import random
    import sqlite3

    db = Database.create(str(tmp_path / "rf"))
    lite = sqlite3.connect(":memory:")
    ddl = "CREATE TABLE t (g INT, k DOUBLE, v INT)"
    db.execute(ddl)
    lite.execute(ddl)
    rng = random.Random(3)
    rows = []
    for _ in range(200):
        g = rng.randint(0, 4)
        k = rng.choice([None, rng.randint(0, 20), rng.random() * 20])
        v = rng.choice([None, rng.randint(-50, 50)])
        rows.append((g, k, v))
    ins = "INSERT INTO t VALUES " + ",".join(
        "(%s,%s,%s)" % tuple(
            "NULL" if x is None
            else repr(round(x, 3)) if isinstance(x, float) else x
            for x in r
        )
        for r in rows
    )
    db.execute(ins)
    lite.execute(ins)
    frames = [
        "RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING",
        "RANGE BETWEEN 5 PRECEDING AND 2 PRECEDING",
        "RANGE BETWEEN 1 FOLLOWING AND 4 FOLLOWING",
        "RANGE BETWEEN UNBOUNDED PRECEDING AND 2 FOLLOWING",
        "RANGE BETWEEN 2 PRECEDING AND UNBOUNDED FOLLOWING",
        "RANGE BETWEEN 0 PRECEDING AND 0 FOLLOWING",
        "RANGE BETWEEN 1.5 PRECEDING AND 2.5 FOLLOWING",
        "RANGE 2 PRECEDING",
    ]
    funcs = ["count(v)", "sum(v)", "avg(v)", "min(v)", "max(v)", "count(*)"]
    orders = ["k NULLS FIRST", "k NULLS LAST",
              "k DESC NULLS FIRST", "k DESC NULLS LAST"]

    def norm(rs):
        return sorted(
            (tuple(round(x, 6) if isinstance(x, float) else x for x in r)
             for r in rs),
            key=repr,
        )

    for fr, fn, ob in itertools.product(frames, funcs, orders):
        q = (f"SELECT g, k, v, {fn} OVER "
             f"(PARTITION BY g ORDER BY {ob} {fr}) FROM t")
        assert norm(db.query(q)) == norm(lite.execute(q).fetchall()), \
            (fn, ob, fr)
    lite.close()
    db.close()


def test_range_offset_frame_errors(tmp_path):
    db = Database.create(str(tmp_path / "rfe"))
    db.execute("CREATE TABLE t (a INT, b TEXT)")
    db.execute("INSERT INTO t VALUES (1, 'x'), (2, 'y')")
    with pytest.raises(Exception, match="numeric ORDER BY"):
        db.query("SELECT sum(a) OVER (ORDER BY b RANGE BETWEEN 1 PRECEDING "
                 "AND 1 FOLLOWING) FROM t")
    with pytest.raises(Exception, match="exactly one ORDER BY"):
        db.query("SELECT sum(a) OVER (ORDER BY a, b RANGE BETWEEN "
                 "1 PRECEDING AND 1 FOLLOWING) FROM t")
    db.close()


def test_value_window_functions_vs_sqlite(tmp_path):
    """first_value/last_value/nth_value (beyond the reference's window
    set, logical.rs:172-183 — standard SQL surface) across frame shapes,
    sort directions and NULL placements, vs SQLite."""
    import itertools
    import random
    import sqlite3

    db = Database.create(str(tmp_path / "fv"))
    lite = sqlite3.connect(":memory:")
    ddl = "CREATE TABLE t (g INT, k DOUBLE, v INT)"
    db.execute(ddl)
    lite.execute(ddl)
    rng = random.Random(7)
    rows = []
    for _ in range(150):
        g = rng.randint(0, 4)
        k = rng.choice([None, rng.randint(0, 20), rng.random() * 20])
        v = rng.choice([None, rng.randint(-50, 50)])
        rows.append((g, k, v))
    ins = "INSERT INTO t VALUES " + ",".join(
        "(%s,%s,%s)" % tuple(
            "NULL" if x is None
            else repr(round(x, 3)) if isinstance(x, float) else x
            for x in r
        )
        for r in rows
    )
    db.execute(ins)
    lite.execute(ins)
    frames = [
        "",
        "ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING",
        "ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING",
        "RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING",
        "RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING",
        "RANGE BETWEEN CURRENT ROW AND CURRENT ROW",
        "RANGE BETWEEN 3 PRECEDING AND 2 FOLLOWING",
    ]
    funcs = ["first_value(v)", "last_value(v)", "nth_value(v, 2)",
             "nth_value(v, 5)"]
    orders = ["k NULLS FIRST", "k DESC NULLS LAST"]

    def norm(rs):
        return sorted(
            (tuple(round(x, 6) if isinstance(x, float) else x for x in r)
             for r in rs),
            key=repr,
        )

    for fr, fn, ob in itertools.product(frames, funcs, orders):
        q = (f"SELECT g, k, v, {fn} OVER "
             f"(PARTITION BY g ORDER BY {ob} {fr}) FROM t")
        assert norm(db.query(q)) == norm(lite.execute(q).fetchall()), \
            (fn, ob, fr)
    for fn in funcs[:2]:
        q = f"SELECT v, {fn} OVER () FROM t"
        assert norm(db.query(q)) == norm(lite.execute(q).fetchall())
    with pytest.raises(Exception, match="position must be positive"):
        db.query("SELECT nth_value(v, 0) OVER (ORDER BY k) FROM t")
    lite.close()
    db.close()


def test_range_offset_float_boundary(tmp_path):
    """Fuzzer-found: RANGE offset boundaries must ADD the positive offset
    (peer + X >= cur), never subtract — the two roundings differ at
    representable edges (215.35 + 100 == 315.35 exactly, while
    315.35 - 100 = 215.35000000000002 excludes the row; SQLite
    includes it)."""
    import sqlite3

    db = Database.create(str(tmp_path / "fb"))
    lite = sqlite3.connect(":memory:")
    for s in ["CREATE TABLE t (a DOUBLE)",
              "INSERT INTO t VALUES (215.35), (315.35)"]:
        db.execute(s)
        lite.execute(s)
    for q in [
        "SELECT a, count(*) OVER (ORDER BY a RANGE BETWEEN 100 PRECEDING "
        "AND CURRENT ROW) FROM t ORDER BY a",
        "SELECT a, count(*) OVER (ORDER BY a RANGE BETWEEN CURRENT ROW "
        "AND 100 FOLLOWING) FROM t ORDER BY a",
        "SELECT a, count(*) OVER (ORDER BY a RANGE BETWEEN UNBOUNDED "
        "PRECEDING AND 100 PRECEDING) FROM t ORDER BY a",
        "SELECT a, count(*) OVER (ORDER BY a RANGE BETWEEN 100 FOLLOWING "
        "AND UNBOUNDED FOLLOWING) FROM t ORDER BY a",
    ]:
        assert repr(db.query(q)) == repr(lite.execute(q).fetchall()), q
    lite.close()
    db.close()


def test_percent_rank_cume_dist_vs_sqlite(tmp_path):
    """percent_rank/cume_dist (standard SQL window surface beyond the
    reference's set) vs SQLite, with ties, NULL keys and bare OVER."""
    import itertools
    import random
    import sqlite3

    db = Database.create(str(tmp_path / "pr"))
    lite = sqlite3.connect(":memory:")
    ddl = "CREATE TABLE t (g INT, k DOUBLE)"
    db.execute(ddl)
    lite.execute(ddl)
    rng = random.Random(5)
    vals = [
        (rng.randint(0, 3),
         rng.choice([None, rng.randint(0, 8), rng.random() * 8]))
        for _ in range(200)
    ]
    ins = "INSERT INTO t VALUES " + ",".join(
        "(%s,%s)" % tuple(
            "NULL" if x is None
            else repr(round(x, 3)) if isinstance(x, float) else x
            for x in r
        )
        for r in vals
    )
    db.execute(ins)
    lite.execute(ins)

    def norm(rs):
        return sorted(
            (tuple(round(x, 9) if isinstance(x, float) else x for x in r)
             for r in rs),
            key=repr,
        )

    for fn, ob in itertools.product(
        ["percent_rank()", "cume_dist()"],
        ["ORDER BY k NULLS FIRST", "ORDER BY k DESC NULLS LAST", ""],
    ):
        q = f"SELECT g, k, {fn} OVER (PARTITION BY g {ob}) FROM t"
        assert norm(db.query(q)) == norm(lite.execute(q).fetchall()), \
            (fn, ob)
    lite.close()
    db.close()


def test_groups_frames_vs_sqlite(tmp_path):
    """GROUPS frame mode (offsets count peer groups — full SQLite frame
    parity; the reference parses no frames at all) across aggregates AND
    value functions, ties, NULL keys, both directions."""
    import itertools
    import random
    import sqlite3

    db = Database.create(str(tmp_path / "gr"))
    lite = sqlite3.connect(":memory:")
    ddl = "CREATE TABLE t (g INT, k INT, v INT)"
    db.execute(ddl)
    lite.execute(ddl)
    rng = random.Random(11)
    rows = [
        (rng.randint(0, 3), rng.choice([None, rng.randint(0, 6)]),
         rng.choice([None, rng.randint(-40, 40)]))
        for _ in range(180)
    ]
    ins = "INSERT INTO t VALUES " + ",".join(
        "(%s,%s,%s)" % tuple("NULL" if x is None else x for x in r)
        for r in rows
    )
    db.execute(ins)
    lite.execute(ins)
    frames = [
        "GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING",
        "GROUPS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING",
        "GROUPS BETWEEN 2 FOLLOWING AND UNBOUNDED FOLLOWING",
        "GROUPS BETWEEN CURRENT ROW AND CURRENT ROW",
        "GROUPS BETWEEN 2 PRECEDING AND 1 PRECEDING",
        "GROUPS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING",
    ]
    funcs = ["count(v)", "sum(v)", "min(v)", "max(v)", "avg(v)",
             "first_value(v)", "last_value(v)", "nth_value(v, 2)"]
    orders = ["k NULLS FIRST", "k DESC NULLS LAST"]

    def norm(rs):
        return sorted(
            (tuple(round(x, 6) if isinstance(x, float) else x for x in r)
             for r in rs),
            key=repr,
        )

    for fr, fn, ob in itertools.product(frames, funcs, orders):
        q = (f"SELECT g, k, v, {fn} OVER "
             f"(PARTITION BY g ORDER BY {ob} {fr}) FROM t")
        assert norm(db.query(q)) == norm(lite.execute(q).fetchall()), \
            (fn, ob, fr)
    with pytest.raises(Exception, match="requires ORDER BY"):
        db.query("SELECT sum(v) OVER (GROUPS BETWEEN 1 PRECEDING AND "
                 "CURRENT ROW) FROM t")
    lite.close()
    db.close()


def test_value_window_frame_without_order_by(tmp_path):
    """Review-found: an explicit ROWS frame without ORDER BY must be
    honored by value functions (it was silently treated as the whole
    partition)."""
    import sqlite3

    db = Database.create(str(tmp_path / "nofr"))
    lite = sqlite3.connect(":memory:")
    for s in ["CREATE TABLE t (v INT)", "INSERT INTO t VALUES (1),(2),(3)"]:
        db.execute(s)
        lite.execute(s)
    q = ("SELECT last_value(v) OVER (ROWS BETWEEN UNBOUNDED PRECEDING "
         "AND CURRENT ROW) FROM t")
    assert db.query(q) == lite.execute(q).fetchall()
    with pytest.raises(Exception, match="must be an integer"):
        db.query("SELECT sum(v) OVER (ORDER BY v GROUPS BETWEEN "
                 "1.5 PRECEDING AND CURRENT ROW) FROM t")
    lite.close()
    db.close()


def test_exclude_frames_vs_sqlite(tmp_path):
    """EXCLUDE NO OTHERS / CURRENT ROW / GROUP / TIES across every frame
    mode, for aggregates AND value functions — completing the SQLite
    window-frame matrix (the reference parses no frames at all)."""
    import itertools
    import random
    import sqlite3

    db = Database.create(str(tmp_path / "ex"))
    lite = sqlite3.connect(":memory:")
    ddl = "CREATE TABLE t (g INT, k INT, v INT)"
    db.execute(ddl)
    lite.execute(ddl)
    rng = random.Random(13)
    rows = [
        (rng.randint(0, 3), rng.choice([None, rng.randint(0, 6)]),
         rng.choice([None, rng.randint(-40, 40)]))
        for _ in range(150)
    ]
    ins = "INSERT INTO t VALUES " + ",".join(
        "(%s,%s,%s)" % tuple("NULL" if x is None else x for x in r)
        for r in rows
    )
    db.execute(ins)
    lite.execute(ins)
    frames = [
        "ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING",
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        "RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING",
        "GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING",
    ]
    excludes = ["EXCLUDE NO OTHERS", "EXCLUDE CURRENT ROW",
                "EXCLUDE GROUP", "EXCLUDE TIES"]
    funcs = ["count(v)", "sum(v)", "min(v)", "max(v)",
             "first_value(v)", "last_value(v)", "nth_value(v, 2)"]

    def norm(rs):
        return sorted(
            (tuple(round(x, 6) if isinstance(x, float) else x for x in r)
             for r in rs),
            key=repr,
        )

    for fr, ex, fn in itertools.product(frames, excludes, funcs):
        q = (f"SELECT g, k, v, {fn} OVER (PARTITION BY g "
             f"ORDER BY k NULLS FIRST {fr} {ex}) FROM t")
        assert norm(db.query(q)) == norm(lite.execute(q).fetchall()), \
            (fn, fr, ex)
    lite.close()
    db.close()


def test_named_windows_vs_sqlite(tmp_path):
    """WINDOW w AS (...) named-window clause + OVER w references
    (SQLite/PostgreSQL surface; not in the reference grammar)."""
    import sqlite3

    db = Database.create(str(tmp_path / "nw"))
    lite = sqlite3.connect(":memory:")
    for s in ["CREATE TABLE t (g INT, v INT)",
              "INSERT INTO t VALUES (1,10),(1,20),(2,5),(2,8),(3,1)"]:
        db.execute(s)
        lite.execute(s)
    qs = [
        "SELECT g, sum(v) OVER w FROM t WINDOW w AS (PARTITION BY g) "
        "ORDER BY g, v",
        "SELECT g, v, rank() OVER w, sum(v) OVER w2 FROM t "
        "WINDOW w AS (PARTITION BY g ORDER BY v), "
        "w2 AS (PARTITION BY g ORDER BY v ROWS BETWEEN 1 PRECEDING AND "
        "CURRENT ROW) ORDER BY g, v",
        "SELECT row_number() OVER w FROM t WINDOW w AS (ORDER BY v DESC) "
        "ORDER BY 1",
    ]
    for q in qs:
        assert repr(db.query(q)) == repr(lite.execute(q).fetchall()), q
    with pytest.raises(Exception, match="no such window"):
        db.query("SELECT sum(v) OVER nope FROM t")
    # WINDOW stays usable as an ordinary identifier / implicit alias
    db.execute("CREATE TABLE wt (a INT)")
    db.execute("INSERT INTO wt VALUES (1)")
    assert db.query("SELECT w.a FROM wt w") == [(1,)]
    assert db.query("SELECT window FROM (SELECT 1 AS window)") == [(1,)]
    lite.close()
    db.close()


def test_new_frame_kernels_scale(tmp_path):
    """1M-row perf smoke for the round-3 frame kernels (RANGE offsets,
    GROUPS, value functions, EXCLUDE min/max): each measured 3-6s on the
    CI VM; gate with slack for burst throttling."""
    import time

    import numpy as np

    db = Database.create(str(tmp_path / "wscale"))
    db.execute("CREATE TABLE t (g INT, k DOUBLE, v INT)")
    n = 1_000_000
    rng = np.random.default_rng(0)
    db.bulk_insert("t", {
        "g": rng.integers(0, 1000, n),
        "k": rng.random(n),
        "v": rng.integers(0, 100, n),
    })
    for q in [
        "SELECT first_value(v) OVER (PARTITION BY g ORDER BY k) FROM t",
        "SELECT sum(v) OVER (PARTITION BY g ORDER BY k RANGE BETWEEN "
        "0.1 PRECEDING AND 0.1 FOLLOWING) FROM t",
        "SELECT sum(v) OVER (PARTITION BY g ORDER BY k GROUPS BETWEEN "
        "5 PRECEDING AND CURRENT ROW) FROM t",
        "SELECT max(v) OVER (PARTITION BY g ORDER BY k ROWS BETWEEN "
        "100 PRECEDING AND CURRENT ROW EXCLUDE GROUP) FROM t",
    ]:
        t0 = time.perf_counter()
        rows = db.query(q)
        dt = time.perf_counter() - t0
        assert len(rows) == n
        assert dt < 30.0, f"frame kernel too slow ({dt:.1f}s): {q[:60]}"
    db.close()


def test_window_clause_positions(tmp_path):
    """Review-found: the WINDOW clause must not be eaten as an implicit
    alias of an unaliased derived table or a select item."""
    import sqlite3

    db = Database.create(str(tmp_path / "wpos"))
    lite = sqlite3.connect(":memory:")
    for q in [
        "SELECT sum(v) OVER w FROM (SELECT 1 AS v) WINDOW w AS (ORDER BY v)",
        "SELECT sum(1) OVER w WINDOW w AS ()",
    ]:
        assert repr(db.query(q)) == repr(lite.execute(q).fetchall()), q
    # and 'window' keeps working as an implicit select-item alias
    assert db.query("SELECT 1 window FROM (SELECT 2)") == [(1,)]
    lite.close()
    db.close()

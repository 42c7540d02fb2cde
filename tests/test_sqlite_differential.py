"""Differential testing against SQLite (python stdlib) as the oracle —
the reference's own benchmark/compare baseline is bundled SQLite
(reference benches/insertion.rs:181-760). A constrained random query
generator runs the same statements on both engines and compares result
multisets."""

import random
import sqlite3

import pytest

from turdb_tpu.database.api import Database

SEED_ROWS = 120


def norm(rows):
    out = []
    for r in rows:
        row = []
        for v in r:
            if isinstance(v, float):
                row.append(round(v, 6))
            elif isinstance(v, bool):
                row.append(int(v))
            else:
                row.append(v)
        out.append(tuple(row))
    return sorted(out, key=repr)


@pytest.fixture()
def engines(tmp_path):
    db = Database.create(str(tmp_path / "db"))
    lite = sqlite3.connect(":memory:")
    ddl = (
        "CREATE TABLE t (id INTEGER, grp INTEGER, val DOUBLE, name TEXT)"
    )
    db.execute(ddl)
    lite.execute(ddl)
    rng = random.Random(1234)
    rows = []
    for i in range(SEED_ROWS):
        grp = rng.randint(0, 5)
        val = round(rng.uniform(-100, 100), 3)
        name = rng.choice(["ann", "bob", "cat", "dan", None])
        rows.append((i, grp, val, name))
    for r in rows:
        nm = "NULL" if r[3] is None else f"'{r[3]}'"
        stmt = f"INSERT INTO t VALUES ({r[0]}, {r[1]}, {r[2]}, {nm})"
        db.execute(stmt)
        lite.execute(stmt)
    yield db, lite
    db.close()
    lite.close()


def both(engines, sql):
    db, lite = engines
    ours = norm(db.query(sql))
    theirs = norm(lite.execute(sql).fetchall())
    assert ours == theirs, f"mismatch for: {sql}\nours={ours[:5]}\nsqlite={theirs[:5]}"


CASES = [
    "SELECT id, val FROM t WHERE val > 0",
    "SELECT id FROM t WHERE grp = 3 AND val < 50",
    "SELECT id FROM t WHERE NOT (val > 0) AND name IS NOT NULL",
    "SELECT grp, COUNT(*) FROM t GROUP BY grp",
    "SELECT grp, SUM(val), MIN(val), MAX(val) FROM t GROUP BY grp",
    "SELECT grp, COUNT(*) FROM t WHERE val > -50 GROUP BY grp HAVING COUNT(*) > 5",
    "SELECT COUNT(*) FROM t WHERE name IS NULL",
    "SELECT DISTINCT grp FROM t WHERE val BETWEEN -10 AND 10",
    "SELECT id FROM t WHERE grp IN (1, 2) AND id < 60",
    "SELECT name, COUNT(*) FROM t WHERE name IS NOT NULL GROUP BY name",
    "SELECT id, val * 2 + 1 FROM t WHERE id % 7 = 0",
    "SELECT a.id, b.id FROM t a, t b WHERE a.id = b.id + 1 AND a.grp = 0",
    "SELECT a.grp, COUNT(*) FROM t a JOIN t b ON a.grp = b.grp "
    "WHERE a.id < 20 AND b.id < 20 GROUP BY a.grp",
    "SELECT id FROM t WHERE val > (SELECT AVG(val) FROM t) AND grp = 1",
    "SELECT CASE WHEN val > 0 THEN 'p' ELSE 'n' END, COUNT(*) FROM t "
    "GROUP BY CASE WHEN val > 0 THEN 'p' ELSE 'n' END",
    "SELECT MAX(id) - MIN(id) FROM t WHERE grp = 2",
    "SELECT id FROM t WHERE name LIKE '%a%'",
    "SELECT COALESCE(name, 'none'), COUNT(*) FROM t GROUP BY COALESCE(name, 'none')",
    "SELECT id FROM t WHERE id IN (SELECT id FROM t WHERE val > 90)",
    "SELECT grp FROM t WHERE id = 17 UNION SELECT grp FROM t WHERE id = 18",
]


@pytest.mark.parametrize("sql", CASES)
def test_fixed_cases(engines, sql):
    both(engines, sql)


def test_ordered_cases(engines):
    db, lite = engines
    for sql in [
        "SELECT id FROM t WHERE grp = 1 ORDER BY val LIMIT 5",
        "SELECT id, val FROM t ORDER BY val DESC LIMIT 7",
        "SELECT grp, AVG(val) FROM t GROUP BY grp ORDER BY grp",
    ]:
        ours = [r for r in db.query(sql)]
        theirs = [tuple(r) for r in lite.execute(sql).fetchall()]
        assert norm(ours) == norm(theirs), sql


def test_random_predicates(engines):
    rng = random.Random(99)
    cols = ["id", "grp", "val"]
    ops = ["<", "<=", ">", ">=", "="]
    for _ in range(60):
        c1, c2 = rng.choice(cols), rng.choice(cols)
        o1, o2 = rng.choice(ops), rng.choice(ops)
        v1 = rng.randint(-50, 100)
        v2 = rng.randint(-50, 100)
        conj = rng.choice(["AND", "OR"])
        sql = (
            f"SELECT id FROM t WHERE {c1} {o1} {v1} {conj} {c2} {o2} {v2}"
        )
        both(engines, sql)


def test_random_aggregates(engines):
    rng = random.Random(7)
    aggs = ["COUNT(*)", "SUM(id)", "AVG(val)", "MIN(val)", "MAX(id)"]
    for _ in range(30):
        a = rng.choice(aggs)
        g = rng.choice(["grp", "name"])
        v = rng.randint(-50, 50)
        sql = f"SELECT {g}, {a} FROM t WHERE val > {v} GROUP BY {g}"
        both(engines, sql)

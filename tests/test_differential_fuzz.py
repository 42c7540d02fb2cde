"""Large-scale differential fuzz vs SQLite (the oracle the reference
benches against, benches/insertion.rs:181-760; scale per reference
tests/integration_sql.rs 4k LoC + regression_smoke 1.7k).

A seeded random generator builds a 3-table schema with FK-shaped data,
then drives >1,000 compared statements through BOTH engines: filters,
multi-way joins, aggregates/HAVING, scalar/IN/EXISTS subqueries, set
ops, window functions, ORDER BY/LIMIT, and interleaved DML mutation
rounds (UPDATE/DELETE/INSERT applied to both, with SELECT sweeps after
every round).

Dialect notes baked into the generator (differences that are by-design,
PostgreSQL-leaning, not bugs): LIKE is case-sensitive here (SQLite's is
ASCII-case-insensitive) -> all text data/patterns are lowercase; `%` of
negative operands differs (C vs Python semantics) -> operands kept
non-negative; ORDER BY NULL placement differs -> explicit NULLS FIRST
is emitted on both sides.

The seeds pinned below are CI's regression subset. The wide sweep is a
recorded artifact: `scripts/soak_run.py` re-runs this generator across
220 seeds plus the checkpoint/reopen/crash soak (scripts/soak_sql.py)
and writes SOAK_rNN.json (statement counts, seeds, failures) at the
repo root — the durable evidence behind the "N-hundred-k statements
across N-hundred seeds" claims.
"""

import math
import random
import sqlite3

import pytest

from turdb_tpu.database.api import Database


def norm(rows):
    """Sort rows into a canonical order with floats COARSELY rounded in
    the sort key only — raw values are preserved for rows_match's
    tolerance compare (SUM/AVG accumulate in a different order than
    SQLite, so the tail of the mantissa can differ; any fixed rounding
    flips at half boundaries — seen: avg 203.466875 ± 1 ulp)."""
    def key(r):
        return repr(tuple(
            float(f"{v:.5g}") if isinstance(v, float) else
            int(v) if isinstance(v, bool) else v
            for v in r
        ))

    return sorted(
        [tuple(int(v) if isinstance(v, bool) else v for v in r)
         for r in rows],
        key=key,
    )


def rows_match(ours, theirs, rel=1e-6):
    a, b = norm(ours), norm(theirs)
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return False
        for va, vb in zip(ra, rb):
            if isinstance(va, float) and isinstance(vb, float):
                if not math.isclose(va, vb, rel_tol=rel, abs_tol=1e-9):
                    return False
            elif va != vb:
                return False
    return True


CITIES = ["oslo", "lima", "pune", "kyiv", None]
STATUS = ["new", "paid", "sent", None]
TAGS = ["red", "blue", "gold"]


def _seed(db, lite, rng):
    stmts = [
        "CREATE TABLE users (id INTEGER, age INTEGER, city TEXT, score DOUBLE)",
        "CREATE TABLE orders (oid INTEGER, uid INTEGER, amount DOUBLE, "
        "status TEXT, qty INTEGER)",
        "CREATE TABLE items (iid INTEGER, oid INTEGER, price DOUBLE, tag TEXT)",
        # audit trigger: every mutation round also compares trigger
        # side effects against SQLite's firing semantics
        "CREATE TABLE audit (ev TEXT, k INTEGER)",
        "CREATE TRIGGER a_del AFTER DELETE ON orders FOR EACH ROW "
        "WHEN (OLD.qty > 2) BEGIN "
        "INSERT INTO audit VALUES ('d', OLD.oid); END",
        "CREATE TRIGGER a_ins AFTER INSERT ON orders FOR EACH ROW BEGIN "
        "INSERT INTO audit VALUES ('i', NEW.oid); END",
    ]
    for s in stmts:
        db.execute(s)
        lite.execute(s)

    def lit(v):
        if v is None:
            return "NULL"
        if isinstance(v, str):
            return "'" + v + "'"
        return str(v)

    for i in range(150):
        row = (i, rng.randint(18, 70), rng.choice(CITIES),
               round(rng.uniform(0, 100), 2))
        s = f"INSERT INTO users VALUES ({','.join(lit(v) for v in row)})"
        db.execute(s)
        lite.execute(s)
    for o in range(300):
        row = (o, rng.randint(0, 160), round(rng.uniform(1, 500), 2),
               rng.choice(STATUS), rng.randint(1, 9))
        s = f"INSERT INTO orders VALUES ({','.join(lit(v) for v in row)})"
        db.execute(s)
        lite.execute(s)
    for t in range(450):
        row = (t, rng.randint(0, 320), round(rng.uniform(0.5, 50), 2),
               rng.choice(TAGS))
        s = f"INSERT INTO items VALUES ({','.join(lit(v) for v in row)})"
        db.execute(s)
        lite.execute(s)


NUM_COLS = {
    "users": ["id", "age", "score"],
    "orders": ["oid", "uid", "amount", "qty"],
    "items": ["iid", "oid", "price"],
}
# strictly-typed engine (like the Rust reference) vs SQLite affinity:
# updates must assign type-correct exprs, so int targets draw from ints
INT_COLS = {
    "users": ["id", "age"],
    "orders": ["oid", "uid", "qty"],
    "items": ["iid", "oid"],
}
TEXT_COLS = {"users": ["city"], "orders": ["status"], "items": ["tag"]}
TEXT_VALS = {"city": CITIES, "status": STATUS, "tag": TAGS}


class Gen:
    def __init__(self, rng):
        self.rng = rng

    def num_expr(self, t, q="", int_only=False):
        r = self.rng
        c = q + r.choice(INT_COLS[t] if int_only else NUM_COLS[t])
        pick = r.random()
        if pick < 0.4:
            return c
        if pick < 0.55:
            return f"({c} + {r.randint(1, 20)})"
        if pick < 0.65:
            return f"({c} * {r.randint(2, 5)})"
        if pick < 0.73 and int_only:
            # truncating integer division / dividend-sign modulo (kept
            # int-only and negative-capable: -x/2 flushed a floor-div bug)
            op = r.choice(["/", "%"])
            sgn = "-" if r.random() < 0.3 else ""
            return f"(({sgn}{c}) {op} {r.randint(2, 7)})"
        if pick < 0.8:
            c2 = q + r.choice(INT_COLS[t] if int_only else NUM_COLS[t])
            return f"({c} - {c2})"
        if pick < 0.9:
            w = f"{c} > {r.randint(10, 80)}"
            return (f"(CASE WHEN {w} THEN {c} ELSE "
                    f"{r.randint(0, 9)} END)")
        return f"abs({c} - {r.randint(0, 50)})"

    def text_expr(self, t, q=""):
        r = self.rng
        c = q + r.choice(TEXT_COLS[t])
        pick = r.random()
        if pick < 0.4:
            return c
        if pick < 0.55:
            return f"upper({c})"
        if pick < 0.7:
            return f"substr({c}, {r.randint(1, 3)})"
        if pick < 0.85:
            return f"({c} || '{r.choice(['x', '_t'])}')"
        return f"coalesce({c}, '{r.choice(['zz', 'mm'])}')"

    def pred(self, t, q="", depth=0):
        r = self.rng
        pick = r.random()
        if depth < 2 and pick < 0.25:
            op = r.choice(["AND", "OR"])
            return (f"({self.pred(t, q, depth + 1)} {op} "
                    f"{self.pred(t, q, depth + 1)})")
        if pick < 0.35:
            tc = r.choice(TEXT_COLS[t])
            return f"{q}{tc} IS {'NOT ' if r.random() < 0.5 else ''}NULL"
        if pick < 0.45:
            tc = r.choice(TEXT_COLS[t])
            vals = [v for v in TEXT_VALS[tc] if v is not None]
            sel = r.sample(vals, k=min(2, len(vals)))
            neg = "NOT " if r.random() < 0.3 else ""
            return f"{q}{tc} {neg}IN ({', '.join(repr(v) for v in sel)})"
        if pick < 0.5:
            # column-to-column comparison + text-function predicates
            if r.random() < 0.5:
                a = q + r.choice(NUM_COLS[t])
                b = q + r.choice(NUM_COLS[t])
                return f"{a} {r.choice(['<', '>=', '<>'])} {b}"
            return (f"length({self.text_expr(t, q)}) "
                    f"{r.choice(['>', '<='])} {r.randint(2, 6)}")
        if pick < 0.55:
            c = r.choice(NUM_COLS[t])
            lo = r.randint(0, 50)
            return f"{q}{c} BETWEEN {lo} AND {lo + r.randint(5, 60)}"
        if pick < 0.62:
            tc = r.choice(TEXT_COLS[t])
            pat = r.choice(["'%a%'", "'%e_'", "'p%'", "'%d'"])
            return f"{q}{tc} LIKE {pat}"
        e = self.num_expr(t, q)
        op = r.choice(["<", "<=", ">", ">=", "=", "<>"])
        return f"{e} {op} {r.randint(0, 120)}"

    def agg(self, t, q=""):
        r = self.rng
        c = q + r.choice(NUM_COLS[t])
        pick = r.random()
        if pick < 0.12:
            # DISTINCT aggregates (reference executor.rs COUNT(DISTINCT));
            # % stays int-only (SQLite casts % operands to int — dialect)
            ic = q + r.choice(INT_COLS[t])
            d = f"({ic} % {r.randint(2, 7)})" if r.random() < 0.5 else c
            return r.choice([f"count(DISTINCT {d})", f"sum(DISTINCT {d})",
                             f"min(DISTINCT {d})"])
        base = r.choice([
            "count(*)", f"count({c})", f"sum({c})", f"avg({c})",
            f"min({c})", f"max({c})",
        ])
        if pick < 0.3:
            # aggregate FILTER clause (SQL:2003; SQLite 3.30+)
            return f"{base} FILTER (WHERE {self.pred(t, q)})"
        return base

    # ---- statement families -------------------------------------------

    def single_table(self):
        r = self.rng
        t = r.choice(list(NUM_COLS))
        parts = r.sample(NUM_COLS[t] + TEXT_COLS[t], k=r.randint(1, 3))
        if r.random() < 0.4:
            parts.append(self.num_expr(t, int_only=True))
        if r.random() < 0.3:
            parts.append(self.text_expr(t))
        cols = ", ".join(parts)
        sql = f"SELECT {cols} FROM {t} WHERE {self.pred(t)}"
        if r.random() < 0.3:
            key = r.choice(NUM_COLS[t])
            pk = NUM_COLS[t][0]   # unique tiebreak: LIMIT must cut
            sql += (f" ORDER BY {key} NULLS FIRST, {pk}"
                    f" LIMIT {r.randint(1, 20)}")   # deterministically
        return sql

    def join2(self):
        r = self.rng
        a, b, on = r.choice([
            ("users", "orders", "users.id = orders.uid"),
            ("orders", "items", "orders.oid = items.oid"),
        ])
        kind = r.choice(["JOIN", "LEFT JOIN", "RIGHT JOIN",
                         "FULL OUTER JOIN"])
        agg = self.agg(a, a + ".")
        grp = r.choice(NUM_COLS[a] + TEXT_COLS[a])
        sql = (f"SELECT {a}.{grp}, {agg} FROM {a} {kind} {b} ON {on} "
               f"WHERE {self.pred(a, a + '.')} GROUP BY {a}.{grp}")
        if r.random() < 0.4:
            sql += f" HAVING count(*) > {r.randint(0, 3)}"
        return sql

    def join3(self):
        r = self.rng
        if r.random() < 0.4:
            # comma-join form: the equi-conditions live in WHERE
            # (join-condition extraction; a corpus-replay-found bug class)
            return (
                "SELECT users.city, count(*), sum(items.price) "
                "FROM users, orders, items "
                "WHERE users.id = orders.uid AND orders.oid = items.oid "
                f"AND {self.pred('users', 'users.')} GROUP BY users.city"
            )
        sql = (
            "SELECT users.city, count(*), sum(items.price) FROM users "
            "JOIN orders ON users.id = orders.uid "
            "JOIN items ON orders.oid = items.oid "
            f"WHERE {self.pred('users', 'users.')} GROUP BY users.city"
        )
        return sql

    def subquery(self):
        r = self.rng
        pick = r.random()
        if pick < 0.25:
            return (
                "SELECT id, age FROM users WHERE score > "
                f"(SELECT avg(score) FROM users WHERE {self.pred('users')})"
            )
        if pick < 0.45:
            return (
                "SELECT oid FROM orders WHERE uid IN "
                f"(SELECT id FROM users WHERE {self.pred('users')}) "
                f"AND {self.pred('orders')}"
            )
        if pick < 0.6:
            return (
                "SELECT id FROM users WHERE EXISTS "
                "(SELECT 1 FROM orders WHERE orders.uid = users.id AND "
                f"orders.amount > {r.randint(50, 400)})"
            )
        if pick < 0.75:
            # correlated scalar subquery IN THE SELECT LIST (+ expression)
            return (
                "SELECT id, (SELECT count(*) FROM orders "
                "WHERE orders.uid = users.id AND "
                f"orders.amount > {r.randint(20, 300)}) + {r.randint(0, 3)} "
                f"FROM users WHERE {self.pred('users')}"
            )
        if pick < 0.87:
            # HAVING with an uncorrelated scalar subquery
            return (
                "SELECT uid, sum(amount) FROM orders GROUP BY uid "
                "HAVING sum(amount) > (SELECT avg(amount) * "
                f"{round(r.uniform(0.5, 3.0), 2)} FROM orders)"
            )
        # correlated scalar inside CASE
        return (
            "SELECT id, CASE WHEN (SELECT max(amount) FROM orders "
            "WHERE orders.uid = users.id) > "
            f"{r.randint(100, 400)} THEN 'big' ELSE 'small' END "
            f"FROM users WHERE {self.pred('users')}"
        )

    def derived(self):
        """Derived tables in FROM: aggregate inside, filter/join outside."""
        r = self.rng
        t = r.choice(list(NUM_COLS))
        grp = r.choice(NUM_COLS[t] + TEXT_COLS[t])
        inner = (f"SELECT {grp} AS g, {self.agg(t)} AS m, count(*) AS n "
                 f"FROM {t} WHERE {self.pred(t)} GROUP BY {grp}")
        if r.random() < 0.5:
            return (f"SELECT d.g, d.m FROM ({inner}) d "
                    f"WHERE d.n > {r.randint(0, 3)}")
        # join the derived table back against its base table
        key = NUM_COLS[t][0]
        return (
            f"SELECT d.g, d.n, count(*) FROM ({inner}) d "
            f"JOIN {t} ON {t}.{grp} = d.g "
            f"WHERE {t}.{key} < {r.randint(50, 400)} GROUP BY d.g, d.n"
        )

    def setop(self):
        r = self.rng
        op = r.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
        return (
            f"SELECT uid FROM orders WHERE {self.pred('orders')} "
            f"{op} SELECT id FROM users WHERE {self.pred('users')}"
        )

    def window(self):
        r = self.rng
        fn = r.choice([
            "row_number()", "rank()", "dense_rank()", "ntile(4)",
            "sum(amount)", "count(*)",
            "first_value(amount)", "last_value(amount)",
            "nth_value(amount, 2)",
            f"lag(oid, {r.randint(1, 3)}, -1)", "lead(qty)",
            "percent_rank()", "cume_dist()",
        ])
        framable = fn.startswith(("sum", "count", "first", "last", "nth"))
        frame = ""
        single_key = False
        if framable and r.random() < 0.6:
            pick = r.random()
            if pick < 0.4:
                lo = r.choice(["UNBOUNDED PRECEDING", "2 PRECEDING",
                               "1 PRECEDING", "CURRENT ROW"])
                hi = r.choice(["CURRENT ROW", "1 FOLLOWING",
                               "UNBOUNDED FOLLOWING"])
                frame = f" ROWS BETWEEN {lo} AND {hi}"
            elif pick < 0.7:
                # RANGE offsets need exactly one numeric ORDER BY key
                single_key = True
                lo = r.choice(["UNBOUNDED PRECEDING", "100 PRECEDING",
                               "25 PRECEDING", "CURRENT ROW"])
                hi = r.choice(["CURRENT ROW", "50 FOLLOWING",
                               "UNBOUNDED FOLLOWING"])
                frame = f" RANGE BETWEEN {lo} AND {hi}"
            else:
                lo = r.choice(["UNBOUNDED PRECEDING", "2 PRECEDING",
                               "CURRENT ROW"])
                hi = r.choice(["CURRENT ROW", "1 FOLLOWING",
                               "UNBOUNDED FOLLOWING"])
                frame = f" GROUPS BETWEEN {lo} AND {hi}"
            if r.random() < 0.4:
                frame += " EXCLUDE " + r.choice(
                    ["NO OTHERS", "CURRENT ROW", "GROUP", "TIES"]
                )
        ob = ("amount NULLS FIRST" if single_key
              else "amount NULLS FIRST, oid")
        spec = f"PARTITION BY status ORDER BY {ob}{frame}"
        if r.random() < 0.25:   # named-window form of the same spec
            return (
                f"SELECT oid, uid, {fn} OVER w FROM orders "
                f"WHERE {self.pred('orders')} WINDOW w AS ({spec})"
            )
        return (
            f"SELECT oid, uid, {fn} OVER ({spec}) FROM orders "
            f"WHERE {self.pred('orders')}"
        )

    def rec_cte(self):
        r = self.rng
        pick = r.random()
        if pick < 0.5:
            a, s, b = r.randint(0, 5), r.randint(1, 3), r.randint(20, 150)
            return (
                f"WITH RECURSIVE c(n) AS (SELECT {a} UNION ALL "
                f"SELECT n + {s} FROM c WHERE n < {b}) "
                "SELECT count(*), sum(n), max(n) FROM c"
            )
        if pick < 0.8:
            # bounded graph walk over the orders table (UNION fixpoint)
            m = r.choice([37, 53, 97])
            return (
                f"WITH RECURSIVE w(u) AS (SELECT {r.randint(0, 30)} "
                f"UNION SELECT o.uid % {m} FROM orders o "
                f"JOIN w ON o.oid % {m} = w.u) "
                "SELECT count(*), min(u), max(u) FROM w"
            )
        a, b = r.randint(1, 4), r.randint(30, 80)
        return (
            f"WITH RECURSIVE c(n) AS (SELECT {a} UNION ALL "
            f"SELECT n + 1 FROM c WHERE n < {b}) "
            "SELECT u.city, count(*) FROM c JOIN users u ON u.id = c.n "
            f"WHERE {self.pred('users', 'u.')} GROUP BY u.city"
        )

    def select(self):
        r = self.rng.random()
        if r < 0.35:
            return self.single_table()
        if r < 0.55:
            return self.join2()
        if r < 0.62:
            return self.join3()
        if r < 0.75:
            return self.subquery()
        if r < 0.82:
            return self.derived()
        if r < 0.88:
            return self.setop()
        if r < 0.94:
            return self.window()
        return self.rec_cte()

    def dml(self):
        r = self.rng
        pick = r.random()
        if pick < 0.4:
            t = r.choice(list(NUM_COLS))
            c = r.choice(NUM_COLS[t])
            if c in ("id", "oid", "iid"):
                c = NUM_COLS[t][-1]
            expr = self.num_expr(t, int_only=c in INT_COLS[t])
            return f"UPDATE {t} SET {c} = {expr} WHERE {self.pred(t)}"
        if pick < 0.7:
            t = r.choice(list(NUM_COLS))
            # bounded delete so data doesn't drain
            key = NUM_COLS[t][0]
            v = r.randint(0, 500)
            return (f"DELETE FROM {t} WHERE {key} BETWEEN {v} AND {v + 3} "
                    f"AND {self.pred(t)}")
        i = r.randint(10_000, 99_999)
        return (
            f"INSERT INTO orders VALUES ({i}, {r.randint(0, 160)}, "
            f"{round(r.uniform(1, 500), 2)}, "
            f"{'NULL' if r.random() < 0.2 else repr(r.choice(['new', 'paid', 'sent']))}, "
            f"{r.randint(1, 9)})"
        )


@pytest.mark.parametrize("seed", [11, 23, 37, 59, 71])
def test_differential_fuzz(tmp_path, seed):
    rng = random.Random(seed)
    db = Database.create(str(tmp_path / f"dz{seed}"))
    lite = sqlite3.connect(":memory:")
    try:
        _seed(db, lite, rng)
        g = Gen(rng)
        executed = 0
        for rnd in range(5):
            for _ in range(40):
                sql = g.select()
                ours = norm(db.query(sql))
                theirs = norm(lite.execute(sql).fetchall())
                assert rows_match(ours, theirs), (
                    f"seed={seed} round={rnd}\nSQL: {sql}\n"
                    f"ours({len(ours)})={ours[:4]}\n"
                    f"sqlite({len(theirs)})={theirs[:4]}"
                )
                executed += 1
            for _ in range(8):
                sql = g.dml()
                db.execute(sql)
                lite.execute(sql)
                executed += 1
            # trigger side effects must match SQLite after every round
            q = "SELECT * FROM audit"
            assert rows_match(norm(db.query(q)),
                              norm(lite.execute(q).fetchall()))
        assert executed >= 240
    finally:
        db.close()
        lite.close()


@pytest.mark.parametrize("seed", [7, 42, 99])
def test_differential_txn_fuzz(tmp_path, seed):
    """Transactional differential fuzz: random DML bursts inside
    BEGIN..COMMIT / BEGIN..ROLLBACK, mirrored into SQLite
    (isolation_level=None = explicit txns), asserting identical
    post-burst state — exercises the MVCC undo path against an oracle."""
    rng = random.Random(seed)
    db = Database.create(str(tmp_path / f"tz{seed}"))
    lite = sqlite3.connect(":memory:", isolation_level=None)
    try:
        _seed(db, lite, rng)
        g = Gen(rng)
        state_sql = [
            "SELECT * FROM users",
            "SELECT * FROM orders",
            "SELECT count(*), sum(qty) FROM orders",
            "SELECT * FROM audit",
        ]
        for rnd in range(12):
            commit = rng.random() < 0.5
            db.execute("BEGIN")
            lite.execute("BEGIN")
            for _ in range(rng.randint(1, 6)):
                sql = g.dml()
                db.execute(sql)
                lite.execute(sql)
            if commit:
                db.execute("COMMIT")
                lite.execute("COMMIT")
            else:
                db.execute("ROLLBACK")
                lite.execute("ROLLBACK")
            for sql in state_sql:
                ours = norm(db.query(sql))
                theirs = norm(lite.execute(sql).fetchall())
                assert rows_match(ours, theirs), (
                    f"seed={seed} rnd={rnd} commit={commit}\nSQL: {sql}\n"
                    f"ours({len(ours)}) vs sqlite({len(theirs)})"
                )
    finally:
        db.close()
        lite.close()


@pytest.mark.parametrize("seed", [5, 77])
def test_differential_savepoint_fuzz(tmp_path, seed):
    """Nested savepoint differential fuzz vs SQLite: random DML at each
    nesting level with random ROLLBACK TO / RELEASE, state compared
    after the outer COMMIT."""
    rng = random.Random(seed)
    db = Database.create(str(tmp_path / f"sp{seed}"))
    lite = sqlite3.connect(":memory:", isolation_level=None)
    try:
        _seed(db, lite, rng)
        g = Gen(rng)
        for rnd in range(8):
            db.execute("BEGIN")
            lite.execute("BEGIN")
            for _ in range(rng.randint(1, 3)):
                sql = g.dml()
                db.execute(sql)
                lite.execute(sql)
            for sp in ("s1", "s2"):
                db.execute(f"SAVEPOINT {sp}")
                lite.execute(f"SAVEPOINT {sp}")
                for _ in range(rng.randint(1, 3)):
                    sql = g.dml()
                    db.execute(sql)
                    lite.execute(sql)
            for sp in ("s2", "s1"):
                action = rng.choice(["rollback", "release", "none"])
                if action == "rollback":
                    db.execute(f"ROLLBACK TO {sp}")
                    lite.execute(f"ROLLBACK TO {sp}")
                elif action == "release":
                    db.execute(f"RELEASE {sp}")
                    lite.execute(f"RELEASE {sp}")
                if action != "none":
                    break   # releasing/rolling s2 may consume s1's scope
            db.execute("COMMIT")
            lite.execute("COMMIT")
            for sql in ("SELECT * FROM orders", "SELECT * FROM users",
                        "SELECT * FROM audit"):
                ours = norm(db.query(sql))
                theirs = norm(lite.execute(sql).fetchall())
                assert rows_match(ours, theirs), (
                    f"seed={seed} rnd={rnd}\nSQL: {sql}\n"
                    f"ours({len(ours)}) vs sqlite({len(theirs)})"
                )
    finally:
        db.close()
        lite.close()

"""SQL soak: sustained mixed workload with periodic checkpoints/reopens.

Runs a seeded mixed stream (inserts via prepared lanes, updates,
deletes, selects, txns with savepoints, MERGE, trigger-audited DML)
against one database directory with checkpoints and full reopens
interleaved, verifying invariants continuously:
  - a python-dict model of the table matches SELECT results
  - the audit trigger count matches the model
  - reopen (crash-free and crash) reproduces the model

Usage: JAX_PLATFORMS=cpu python scripts/soak_sql.py [N_ROUNDS]
"""

import os
import random
import sys
import tempfile
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from turdb_tpu.database.api import Database


def check(db, model, audit_count):
    rows = dict(db.query("SELECT id, v FROM t"))
    assert rows == model, (
        f"model mismatch: {len(rows)} rows vs {len(model)}; "
        f"diff={set(rows.items()) ^ set(model.items())}"
    )
    (n,) = db.query("SELECT count(*) FROM audit")[0]
    assert n == audit_count, (n, audit_count)


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    path = tempfile.mkdtemp() + "/soak"
    rng = random.Random(1234)
    db = Database.create(path)
    db.execute("CREATE TABLE t (id INT PRIMARY KEY, v INT)")
    db.execute("CREATE TABLE audit (id INT)")
    db.execute(
        "CREATE TRIGGER a AFTER INSERT ON t FOR EACH ROW "
        "BEGIN INSERT INTO audit VALUES (NEW.id); END"
    )
    model: dict = {}
    audit = 0
    next_id = 0
    t0 = time.time()
    stmts = 0
    for rnd in range(rounds):
        ins = db.prepare("INSERT INTO t VALUES ($1, $2)")
        for _ in range(rng.randint(50, 200)):
            op = rng.random()
            if op < 0.5 or not model:
                v = rng.randint(0, 999)
                ins.execute([next_id, v])
                model[next_id] = v
                audit += 1
                next_id += 1
            elif op < 0.75:
                k = rng.choice(list(model))
                v = rng.randint(0, 999)
                db.execute(f"UPDATE t SET v = {v} WHERE id = {k}")
                model[k] = v
            else:
                k = rng.choice(list(model))
                db.execute(f"DELETE FROM t WHERE id = {k}")
                del model[k]
            stmts += 1
        # a txn with a savepoint rollback (no net model change)
        db.execute("BEGIN")
        db.execute(f"INSERT INTO t VALUES ({next_id + 10_000_000}, 0)")
        db.execute("SAVEPOINT s")
        db.execute(f"INSERT INTO t VALUES ({next_id + 20_000_000}, 0)")
        db.execute("ROLLBACK TO s")
        db.execute("ROLLBACK")
        stmts += 6
        # MERGE upsert batch
        db.execute("CREATE TABLE IF NOT EXISTS src (id INT, v INT)")
        db.execute("DELETE FROM src")
        pairs = [(rng.choice(list(model) or [0]), rng.randint(0, 9))
                 for _ in range(3)]
        seen = set()
        for k, v in pairs:
            if k in seen:
                continue
            seen.add(k)
            db.execute(f"INSERT INTO src VALUES ({k}, {v})")
            if k in model:
                model[k] = v
        db.execute(
            "MERGE INTO t USING src ON t.id = src.id "
            "WHEN MATCHED THEN UPDATE SET v = src.v"
        )
        stmts += 5
        check(db, model, audit)
        if rnd % 7 == 3:
            db.checkpoint()
        if rnd % 13 == 6:
            db.close()
            db = Database.open(path)
            check(db, model, audit)
        if rnd % 17 == 11:   # crash: no checkpoint
            db.wal.flush()
            db.wal.close()
            db = Database.open(path)
            check(db, model, audit)
        if rnd % 10 == 0:
            print(f"round {rnd}: {len(model)} rows, {stmts} stmts, "
                  f"{time.time() - t0:.0f}s", flush=True)
    db.close()
    db = Database.open(path)
    check(db, model, audit)
    db.close()
    print(f"SOAK OK: {rounds} rounds, {stmts} statements, "
          f"{len(model)} final rows, {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()

"""IVF through SQL: USING IVF index creation, ANN fast path, filters."""

import numpy as np
import pytest

from turdb_tpu.database.api import Database

RNG = np.random.default_rng(21)


def vec_lit(v):
    return "'[" + ",".join(f"{x:.6f}" for x in v) + "]'"


def test_ivf_sql_path(tmp_path):
    db = Database.create(str(tmp_path / "db"))
    db.execute("CREATE TABLE docs (id BIGINT PRIMARY KEY, emb VECTOR(16), grp INT)")
    centers = RNG.standard_normal((16, 16)).astype(np.float32) * 3
    vecs = (
        centers[RNG.integers(0, 16, 400)]
        + RNG.standard_normal((400, 16)).astype(np.float32)
    ).astype(np.float32)
    for i in range(400):
        db.execute(f"INSERT INTO docs VALUES ({i}, {vec_lit(vecs[i])}, {i % 3})")
    q = vecs[9]
    exact = db.query(
        f"SELECT id FROM docs ORDER BY emb <-> {vec_lit(q)} LIMIT 10"
    )
    db.execute(
        "CREATE INDEX iv ON docs USING IVF (emb) WITH (nprobe = 8, clusters = 32)"
    )
    plan = "\n".join(
        r[0]
        for r in db.query(
            f"EXPLAIN SELECT id FROM docs ORDER BY emb <-> {vec_lit(q)} LIMIT 10"
        )
    )
    assert "AnnIndexScan" in plan
    approx = db.query(
        f"SELECT id FROM docs ORDER BY emb <-> {vec_lit(q)} LIMIT 10"
    )
    hit = len(set(r[0] for r in exact) & set(r[0] for r in approx)) / 10
    assert approx[0][0] == 9
    assert hit >= 0.9, f"ivf sql recall {hit}"
    # filtered
    rows = db.query(
        f"SELECT id, grp FROM docs WHERE grp = 1 "
        f"ORDER BY emb <-> {vec_lit(q)} LIMIT 5"
    )
    assert len(rows) == 5 and all(r[1] == 1 for r in rows)
    # delete respected
    db.execute("DELETE FROM docs WHERE id = 9")
    rows = db.query(f"SELECT id FROM docs ORDER BY emb <-> {vec_lit(q)} LIMIT 1")
    assert rows[0][0] != 9
    db.close()

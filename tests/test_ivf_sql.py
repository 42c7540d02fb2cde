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


def test_ivf_vacuum_rebuild(tmp_path):
    """VACUUM rebuilds an IVF index when most slots are dead (IVF blocks
    are append-only; the fresh index repopulates from the table's
    visible rows and auto-trains)."""
    import numpy as np

    from turdb_tpu.database.api import Database

    db = Database.create(str(tmp_path / "ivv"))
    n, dim = 1200, 16
    db.execute(f"CREATE TABLE it (id BIGINT PRIMARY KEY, emb VECTOR({dim}))")
    vecs = np.random.default_rng(7).standard_normal((n, dim)).astype(np.float32)
    st = db.prepare("INSERT INTO it VALUES ($1, $2)")
    for i in range(n):
        st.execute([i, "[" + ",".join(f"{v:.5f}" for v in vecs[i]) + "]"])
    db.execute("CREATE INDEX ie ON it USING IVF (emb)")
    db.execute("DELETE FROM it WHERE id % 5 > 0")
    assert db.catalog["main"]["it"].hnsw["ie"].index.size == n
    db.execute("VACUUM")
    h = db.catalog["main"]["it"].hnsw["ie"]
    assert h.index.size == n // 5
    q = vecs[5]
    qlit = "'[" + ",".join(f"{v:.5f}" for v in q) + "]'"
    rows = db.query(f"SELECT id FROM it ORDER BY emb <-> {qlit} LIMIT 10")
    alive = np.arange(0, n, 5)
    d = ((vecs[alive] - q) ** 2).sum(1)
    expect = set(alive[np.argsort(d)[:10]].tolist())
    assert len(set(r[0] for r in rows) & expect) >= 9
    db.close()

"""Vector search through SQL: the reference's hnsw_integration.rs SQL
tests (:164-277) + the ANN fast path the reference designed but never
wired (SURVEY.md §2.3) — with recall checked against the exact brute
force path."""

import numpy as np
import pytest

from turdb_tpu.database.api import Database

RNG = np.random.default_rng(77)


def vec_lit(v):
    return "'[" + ",".join(f"{x:.6f}" for x in v) + "]'"


@pytest.fixture()
def db(tmp_path):
    d = Database.create(str(tmp_path / "db"))
    yield d
    d.close()


def seed_vectors(db, n=500, dim=16):
    db.execute(f"CREATE TABLE items (id BIGINT PRIMARY KEY, emb VECTOR({dim}), tag TEXT)")
    vecs = RNG.standard_normal((n, dim)).astype(np.float32)
    for i in range(n):
        tag = "even" if i % 2 == 0 else "odd"
        db.execute(
            f"INSERT INTO items VALUES ({i}, {vec_lit(vecs[i])}, '{tag}')"
        )
    return vecs


class TestBruteForce:
    def test_knn_order_by(self, db):
        vecs = seed_vectors(db, n=200)
        q = vecs[7]
        rows = db.query(
            f"SELECT id FROM items ORDER BY emb <-> {vec_lit(q)} LIMIT 5"
        )
        assert rows[0] == (7,)
        # verify against numpy
        d = ((vecs - q) ** 2).sum(1)
        expect = list(np.argsort(d)[:5])
        assert [r[0] for r in rows] == expect

    def test_distance_in_select(self, db):
        vecs = seed_vectors(db, n=50)
        rows = db.query(
            f"SELECT id, emb <-> {vec_lit(vecs[3])} AS d FROM items "
            "ORDER BY d LIMIT 3"
        )
        assert rows[0][0] == 3 and rows[0][1] == pytest.approx(0.0, abs=1e-3)

    def test_ip_and_cosine_ops(self, db):
        vecs = seed_vectors(db, n=50)
        q = vecs[5]
        rows = db.query(
            f"SELECT id FROM items ORDER BY emb <#> {vec_lit(q)} LIMIT 1"
        )
        expect = int(np.argmax(vecs @ q))
        assert rows[0][0] == expect
        rows = db.query(
            f"SELECT id FROM items ORDER BY emb <=> {vec_lit(q)} LIMIT 1"
        )
        vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        expect = int(np.argmax(vn @ (q / np.linalg.norm(q))))
        assert rows[0][0] == expect

    def test_vector_dims(self, db):
        seed_vectors(db, n=5, dim=16)
        assert db.query("SELECT vector_dims(emb) FROM items LIMIT 1") == [(16,)]


class TestHnswPath:
    def test_index_used_and_recall(self, db):
        vecs = seed_vectors(db, n=500)
        # exact results before index
        q = RNG.standard_normal(16).astype(np.float32)
        exact = db.query(
            f"SELECT id FROM items ORDER BY emb <-> {vec_lit(q)} LIMIT 10"
        )
        db.execute(
            "CREATE INDEX idx_emb ON items USING HNSW (emb) "
            "WITH (m = 16, ef_construction = 64)"
        )
        plan = "\n".join(
            r[0] for r in db.query(
                f"EXPLAIN SELECT id FROM items ORDER BY emb <-> {vec_lit(q)} LIMIT 10"
            )
        )
        assert "AnnIndexScan" in plan
        approx = db.query(
            f"SELECT id FROM items ORDER BY emb <-> {vec_lit(q)} LIMIT 10"
        )
        recall = len(set(r[0] for r in exact) & set(r[0] for r in approx)) / 10
        assert recall >= 0.9, f"ANN recall {recall}"

    def test_ann_respects_filter(self, db):
        vecs = seed_vectors(db, n=300)
        db.execute("CREATE INDEX idx_emb ON items USING HNSW (emb)")
        q = vecs[10]
        rows = db.query(
            f"SELECT id, tag FROM items WHERE tag = 'odd' "
            f"ORDER BY emb <-> {vec_lit(q)} LIMIT 5"
        )
        assert len(rows) == 5
        assert all(r[1] == "odd" for r in rows)
        assert all(r[0] % 2 == 1 for r in rows)

    def test_ann_selective_filter_pushdown(self, db):
        """When the over-fetch doesn't survive a selective WHERE, the
        engine pushes the predicate into the search as an allowed mask
        (reference search_filtered doctrine, hnsw/mod.rs:62-68) instead
        of falling straight back to the exact scan."""
        from turdb_tpu.sql.engine import STATS

        n, dim = 600, 16
        db.execute(
            f"CREATE TABLE items (id BIGINT PRIMARY KEY, "
            f"emb VECTOR({dim}), tag TEXT)"
        )
        # local rng: the module RNG's state depends on test order, and
        # this test pins which ANN pass fires
        vecs = np.random.default_rng(77).standard_normal(
            (n, dim)
        ).astype(np.float32)
        st = db.prepare("INSERT INTO items VALUES ($1, $2, $3)")
        for i in range(n):
            # 'rare' on ~1/6 of rows: selective enough that the 4x
            # over-fetch of the first pass can't cover LIMIT 10
            tag = "rare" if i % 6 == 0 else "common"
            st.execute([i, vec_lit(vecs[i]).strip("'"), tag])
        db.execute("CREATE INDEX idx_emb ON items USING HNSW (emb)")
        q = vecs[12]
        before = STATS["ann_filtered_searches"]
        rows = db.query(
            f"SELECT id, tag FROM items WHERE tag = 'rare' "
            f"ORDER BY emb <-> {vec_lit(q)} LIMIT 10"
        )
        assert len(rows) == 10
        assert all(r[1] == "rare" for r in rows)
        assert STATS["ann_filtered_searches"] == before + 1
        # quality: compare against the exact filtered answer
        d = ((vecs - q) ** 2).sum(1)
        rare = np.array([i for i in range(n) if i % 6 == 0])
        expect = set(rare[np.argsort(d[rare])[:10]].tolist())
        got = set(r[0] for r in rows)
        assert len(got & expect) >= 8, f"filtered recall {len(got & expect)}/10"

    def test_ann_respects_delete(self, db):
        vecs = seed_vectors(db, n=200)
        db.execute("CREATE INDEX idx_emb ON items USING HNSW (emb)")
        q = vecs[42]
        rows = db.query(
            f"SELECT id FROM items ORDER BY emb <-> {vec_lit(q)} LIMIT 1"
        )
        assert rows[0][0] == 42
        db.execute("DELETE FROM items WHERE id = 42")
        rows = db.query(
            f"SELECT id FROM items ORDER BY emb <-> {vec_lit(q)} LIMIT 1"
        )
        assert rows[0][0] != 42

    def test_ann_respects_txn_isolation(self, db):
        vecs = seed_vectors(db, n=100)
        db.execute("CREATE INDEX idx_emb ON items USING HNSW (emb)")
        q = vecs[3]
        db.execute("BEGIN")
        db.execute("DELETE FROM items WHERE id = 3")
        rows = db.query(
            f"SELECT id FROM items ORDER BY emb <-> {vec_lit(q)} LIMIT 1"
        )
        assert rows[0][0] != 3  # own delete visible
        db.execute("ROLLBACK")
        rows = db.query(
            f"SELECT id FROM items ORDER BY emb <-> {vec_lit(q)} LIMIT 1"
        )
        assert rows[0][0] == 3

    def test_pragma_ann_off(self, db):
        seed_vectors(db, n=100)
        db.execute("CREATE INDEX idx_emb ON items USING HNSW (emb)")
        db.execute("PRAGMA ann = off")
        q = RNG.standard_normal(16).astype(np.float32)
        plan = "\n".join(
            r[0] for r in db.query(
                f"EXPLAIN SELECT id FROM items ORDER BY emb <-> {vec_lit(q)} LIMIT 5"
            )
        )
        assert "AnnIndexScan" not in plan
        rows = db.query(
            f"SELECT id FROM items ORDER BY emb <-> {vec_lit(q)} LIMIT 5"
        )
        assert len(rows) == 5

    def test_hnsw_survives_reopen(self, tmp_path):
        p = str(tmp_path / "db")
        db = Database.create(p)
        vecs = seed_vectors(db, n=150)
        db.execute("CREATE INDEX idx_emb ON items USING HNSW (emb)")
        db.close()
        db2 = Database.open(p)
        q = vecs[17]
        rows = db2.query(
            f"SELECT id FROM items ORDER BY emb <-> {vec_lit(q)} LIMIT 1"
        )
        assert rows[0][0] == 17
        info = db2.catalog["main"]["items"]
        assert "idx_emb" in info.hnsw
        db2.close()

    def test_update_vector_reindexes(self, db):
        vecs = seed_vectors(db, n=100)
        db.execute("CREATE INDEX idx_emb ON items USING HNSW (emb)")
        far = vecs[50] + 100.0
        db.execute(f"UPDATE items SET emb = {vec_lit(far)} WHERE id = 7")
        rows = db.query(
            f"SELECT id FROM items ORDER BY emb <-> {vec_lit(far)} LIMIT 1"
        )
        assert rows[0][0] == 7


def test_pragma_ann_pack_serving_path(tmp_path):
    """PRAGMA ann_pack = 'table' builds the serving pack; ANN queries
    then run the packed two-stage path with identical semantics."""
    import numpy as np

    from turdb_tpu.database.api import Database

    rng = np.random.default_rng(4)
    db = Database.create(str(tmp_path / "ap"))
    db.execute("CREATE TABLE docs(id INT, v VECTOR(16))")
    centers = rng.standard_normal((8, 16)).astype(np.float32) * 3.0
    vecs = (centers[rng.integers(0, 8, 600)]
            + rng.standard_normal((600, 16)).astype(np.float32))
    db.bulk_insert("docs", [
        {"id": i, "v": vecs[i]} for i in range(600)
    ])
    db.execute("CREATE INDEX iv ON docs USING HNSW (v)")
    q = vecs[37]
    qs = "[" + ",".join(f"{x:.5f}" for x in q) + "]"
    before = db.query(
        f"SELECT id FROM docs ORDER BY v <-> '{qs}' LIMIT 5"
    )
    r = db.execute("PRAGMA ann_pack = 'docs'")
    assert r.rows and "iv" in r.rows[0][0]
    info = db.catalog["main"]["docs"]
    assert info.hnsw["iv"].index.serve is not None
    after = db.query(
        f"SELECT id FROM docs ORDER BY v <-> '{qs}' LIMIT 5"
    )
    assert after[0] == (37,)
    assert set(a[0] for a in after) & set(b[0] for b in before)
    # mutation invalidates; queries still correct via graph path
    db.execute("INSERT INTO docs VALUES (600, '" + qs + "')")
    res = db.query(f"SELECT id FROM docs ORDER BY v <-> '{qs}' LIMIT 2")
    assert set(r[0] for r in res) == {37, 600}
    db.close()


class TestGraphVacuum:
    def test_vacuum_compacts_graph(self, tmp_path):
        """VACUUM compacts HNSW graphs to the table's live rows
        (reference VacuumQueue, hnsw/mod.rs:726-765): DML keeps the
        graph append-only; before this, delete-heavy workloads decayed
        survivor recall (0.919 measured at 85% dead, ef=64) and slots
        leaked forever — and every VACUUM duplicated the live graph
        (reindex re-inserted mapped rows)."""
        from turdb_tpu.database.api import Database

        db = Database.create(str(tmp_path / "gv"))
        n, dim = 900, 16
        db.execute(
            f"CREATE TABLE it (id BIGINT PRIMARY KEY, emb VECTOR({dim}))"
        )
        vecs = np.random.default_rng(5).standard_normal(
            (n, dim)).astype(np.float32)
        st = db.prepare("INSERT INTO it VALUES ($1, $2)")
        for i in range(n):
            st.execute([i, vec_lit(vecs[i]).strip("'")])
        db.execute("CREATE INDEX ie ON it USING HNSW (emb)")
        db.execute("DELETE FROM it WHERE id % 10 < 8")
        h = next(iter(db.catalog["main"]["it"].hnsw.values()))
        assert h.index.size == n
        db.execute("VACUUM")
        assert h.index.size == n // 10 * 2          # compacted to live
        db.execute("VACUUM")
        assert h.index.size == n // 10 * 2          # idempotent, no bloat
        q = vecs[8]
        rows = db.query(
            f"SELECT id FROM it ORDER BY emb <-> {vec_lit(q)} LIMIT 10"
        )
        alive = np.array([i for i in range(n) if i % 10 >= 8])
        d = ((vecs[alive] - q) ** 2).sum(1)
        expect = set(alive[np.argsort(d)[:10]].tolist())
        assert len(set(r[0] for r in rows) & expect) >= 9
        db.close()
        db2 = Database.open(str(tmp_path / "gv"))
        rows2 = db2.query(
            f"SELECT id FROM it ORDER BY emb <-> {vec_lit(q)} LIMIT 10"
        )
        assert len(set(r[0] for r in rows2) & expect) >= 9
        db2.close()

    def test_vacuum_threshold_noop(self, tmp_path):
        """Below the dead-fraction threshold the graph is untouched."""
        from turdb_tpu.database.api import Database

        db = Database.create(str(tmp_path / "gt"))
        db.execute("CREATE TABLE it (id BIGINT PRIMARY KEY, "
                   "emb VECTOR(8))")
        vecs = np.random.default_rng(1).standard_normal(
            (300, 8)).astype(np.float32)
        st = db.prepare("INSERT INTO it VALUES ($1, $2)")
        for i in range(300):
            st.execute([i, vec_lit(vecs[i]).strip("'")])
        db.execute("CREATE INDEX ie ON it USING HNSW (emb)")
        db.execute("DELETE FROM it WHERE id < 30")   # 10% dead
        h = next(iter(db.catalog["main"]["it"].hnsw.values()))
        db.execute("VACUUM")
        assert h.index.size == 300                   # below threshold
        db.close()

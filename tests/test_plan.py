"""Plan IR (sql/plan.py): the EXPLAIN tree is built by the same decision
helpers the executor calls (reference planner/mod.rs:77, physical.rs)."""

import numpy as np
import pytest

from turdb_tpu import connect
from turdb_tpu.sql.parser import Parser
from turdb_tpu.sql.plan import plan_select


@pytest.fixture()
def db(tmp_path):
    d = connect(str(tmp_path / "db"))
    d.execute("CREATE TABLE t (id INT PRIMARY KEY, grp INT, val DOUBLE)")
    d.insert_batch(
        "t",
        {
            "id": np.arange(1, 201),
            "grp": np.arange(1, 201) % 7,
            "val": np.arange(1, 201) * 1.5,
        },
    )
    d.execute("CREATE TABLE u (id INT, tag TEXT)")
    d.execute("INSERT INTO u VALUES (1,'a'),(2,'b'),(3,'c')")
    d.execute("CREATE TABLE w (id INT, z INT)")
    d.execute("INSERT INTO w VALUES (1,10),(2,20)")
    yield d
    d.close()


def plan_of(db, sql):
    stmt = Parser(sql).parse_statement()
    return plan_select(db, stmt)


class TestPlanShape:
    def test_pk_eq_uses_index_scan(self, db):
        p = plan_of(db, "SELECT val FROM t WHERE id = 5")
        assert p.find("IndexScan") and not p.find("SeqScan")
        assert p.find("IndexScan")[0].detail["kind"] == "eq"
        assert db.query("SELECT val FROM t WHERE id = 5") == [(7.5,)]

    def test_range_uses_index_scan_when_selective(self, db):
        p = plan_of(db, "SELECT val FROM t WHERE id < 5")
        ix = p.find("IndexScan")
        assert ix and ix[0].detail["kind"] == "range"
        assert ix[0].detail["nrows"] == 4

    def test_wide_range_falls_back_to_seqscan(self, db):
        p = plan_of(db, "SELECT val FROM t WHERE id > 0")
        assert p.find("SeqScan") and not p.find("IndexScan")

    def test_equi_join_is_hash_join(self, db):
        p = plan_of(db, "SELECT * FROM t JOIN u ON t.id = u.id")
        assert p.find("HashJoin")

    def test_three_way_join_reorders(self, db):
        p = plan_of(
            db,
            "SELECT * FROM t JOIN u ON t.id = u.id JOIN w ON u.id = w.id",
        )
        assert p.find("GreedyJoinChain")
        assert len(p.find("SeqScan")) == 3

    def test_cte_scan(self, db):
        p = plan_of(db, "WITH x AS (SELECT id FROM t) SELECT * FROM x")
        assert p.find("CTE") and p.find("CteScan")

    def test_aggregate_and_sort_nodes(self, db):
        p = plan_of(
            db,
            "SELECT grp, count(*) FROM t GROUP BY grp ORDER BY grp LIMIT 3",
        )
        for op in ("Aggregate", "Sort", "Limit", "Project"):
            assert p.find(op), op

    def test_explain_matches_plan_render(self, db):
        sql = "SELECT val FROM t WHERE id = 7"
        lines = [r[0] for r in db.query("EXPLAIN " + sql)]
        assert lines == plan_of(db, sql).render()


class TestAnnPlan:
    def test_ann_scan_fuses_sort(self, db):
        db.execute("CREATE TABLE docs (id INT, emb VECTOR(8))")
        rng = np.random.default_rng(0)
        for i in range(64):
            v = ", ".join(f"{x:.4f}" for x in rng.standard_normal(8))
            db.execute(f"INSERT INTO docs VALUES ({i}, '[{v}]')")
        db.execute("CREATE INDEX di ON docs USING HNSW (emb)")
        q = ", ".join(f"{x:.4f}" for x in rng.standard_normal(8))
        p = plan_of(
            db, f"SELECT id FROM docs ORDER BY emb <-> '[{q}]' LIMIT 5"
        )
        ann = p.find("AnnIndexScan")
        assert ann and ann[0].detail["kind"] == "hnsw"
        assert not p.find("Sort")        # fused into the index scan
        assert p.find("Limit")

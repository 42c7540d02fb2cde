"""Partial indexes (reference table.rs:273 where_clause / is_partial,
ddl.rs:452; inline tests database/mod.rs:1903-1958). The reference parses
and records the predicate; here it is also ENFORCED: maintenance indexes
only matching rows, unique constraints bind only among matching rows, and
scans use a partial index only when the query WHERE contains the
predicate as a conjunct."""

import pytest

from turdb_tpu.database.api import ConstraintViolation, Database
from turdb_tpu.sql.lexer import SqlError


@pytest.fixture
def db(tmp_path):
    d = Database.create(str(tmp_path / "pidx"))
    yield d
    d.close()


def _seed(db):
    db.execute(
        "CREATE TABLE users (id INT PRIMARY KEY, email TEXT, status TEXT, "
        "deleted_at TIMESTAMP)"
    )
    db.execute(
        "INSERT INTO users VALUES (1, 'a@x.com', 'active', NULL), "
        "(2, 'b@x.com', 'inactive', NULL), (3, 'c@x.com', 'active', NULL)"
    )


def test_partial_index_recorded(db):
    # reference mod.rs:1903-1912: the predicate is recorded in the catalog
    _seed(db)
    db.execute(
        "CREATE INDEX idx_active ON users (email) WHERE status = 'active'"
    )
    rows = db.query(
        "SELECT predicate FROM turdb_catalog.indexes WHERE name = 'idx_active'"
    )
    assert rows == [("status = 'active'",)]


def test_partial_unique_binds_only_matching_rows(db):
    _seed(db)
    db.execute(
        "CREATE UNIQUE INDEX uq_active_email ON users (email) "
        "WHERE status = 'active'"
    )
    # duplicate email among INACTIVE rows: allowed
    db.execute("INSERT INTO users VALUES (4, 'b@x.com', 'inactive', NULL)")
    db.execute("INSERT INTO users VALUES (5, 'b@x.com', 'off', NULL)")
    # duplicate email among ACTIVE rows: violation
    with pytest.raises(ConstraintViolation):
        db.execute("INSERT INTO users VALUES (6, 'a@x.com', 'active', NULL)")
    # moving the existing active row OUT of the predicate frees the key
    db.execute("UPDATE users SET status = 'inactive' WHERE id = 1")
    db.execute("INSERT INTO users VALUES (6, 'a@x.com', 'active', NULL)")
    # and now a second active 'a@x.com' conflicts again
    with pytest.raises(ConstraintViolation):
        db.execute("INSERT INTO users VALUES (7, 'a@x.com', 'active', NULL)")


def test_partial_index_scan_only_when_pred_implied(db):
    _seed(db)
    db.execute(
        "CREATE INDEX idx_active ON users (email) WHERE status = 'active'"
    )
    # WHERE carries the predicate as a conjunct: index may serve the scan
    cols, rows = db.query_with_columns(
        "EXPLAIN SELECT id FROM users "
        "WHERE email = 'a@x.com' AND status = 'active'"
    )
    plan = "\n".join(r[0] for r in rows)
    assert "IndexScan" in plan
    assert db.query(
        "SELECT id FROM users WHERE email = 'a@x.com' AND status = 'active'"
    ) == [(1,)]
    # WITHOUT the predicate the partial index must not be used (it is
    # missing the inactive rows)
    cols, rows = db.query_with_columns(
        "EXPLAIN SELECT id FROM users WHERE email = 'b@x.com'"
    )
    plan = "\n".join(r[0] for r in rows)
    assert "IndexScan" not in plan
    assert db.query(
        "SELECT id FROM users WHERE email = 'b@x.com'"
    ) == [(2,)]


def test_partial_index_maintenance_and_reopen(tmp_path):
    d = str(tmp_path / "pidx2")
    db = Database.create(d)
    _seed(db)
    db.execute(
        "CREATE UNIQUE INDEX uq_active_email ON users (email) "
        "WHERE status = 'active'"
    )
    db.close()
    db = Database.open(d)
    try:
        # predicate survives reopen: inactive dups ok, active dups raise
        db.execute("INSERT INTO users VALUES (8, 'c@x.com', 'inactive', NULL)")
        with pytest.raises(ConstraintViolation):
            db.execute("INSERT INTO users VALUES (9, 'c@x.com', 'active', NULL)")
        rows = db.query(
            "SELECT predicate FROM turdb_catalog.indexes "
            "WHERE name = 'uq_active_email'"
        )
        assert rows == [("status = 'active'",)]
    finally:
        db.close()


def test_partial_expression_index(db):
    # reference mod.rs:1947-1958: UNIQUE expression index + WHERE
    _seed(db)
    db.execute(
        "CREATE UNIQUE INDEX uq_email_ci ON users (LOWER(email)) "
        "WHERE deleted_at IS NULL"
    )
    with pytest.raises(ConstraintViolation):
        db.execute("INSERT INTO users VALUES (10, 'A@X.COM', 'active', NULL)")
    # deleted rows are outside the predicate: duplicate allowed
    db.execute(
        "INSERT INTO users VALUES "
        "(10, 'A@X.COM', 'active', '2024-01-01 00:00:00')"
    )


def test_partial_index_validates_pred_columns(db):
    _seed(db)
    with pytest.raises(SqlError):
        db.execute("CREATE INDEX bad ON users (email) WHERE nope = 1")


def test_partial_index_batch_insert(db):
    _seed(db)
    db.execute(
        "CREATE UNIQUE INDEX uq_active_email ON users (email) "
        "WHERE status = 'active'"
    )
    # bulk path: intra-batch duplicate among matching rows raises
    st = db.prepare("INSERT INTO users VALUES ($1, $2, $3, NULL)")
    with pytest.raises(ConstraintViolation):
        db.execute(
            "INSERT INTO users VALUES (20, 'z@x.com', 'active', NULL), "
            "(21, 'z@x.com', 'active', NULL)"
        )
    # same values outside the predicate: fine
    db.execute(
        "INSERT INTO users VALUES (22, 'z@x.com', 'inactive', NULL), "
        "(23, 'z@x.com', 'inactive', NULL)"
    )
    # prepared single-row inserts take the generic path (partial indexes
    # disable the specialized lane) and stay correct
    st.execute([24, "w@x.com", "active"])
    with pytest.raises(ConstraintViolation):
        st.execute([25, "w@x.com", "active"])

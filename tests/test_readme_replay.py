"""Replay every ```sql block of the reference's README (README.md:33-760,
the documented dialect) against this engine, in order.

The README's examples are illustrative, not a coherent script — they
reference tables never created there (orders, employees, ...), drop and
keep using `users`, and even use columns their own CREATE omitted
(products.category, users.status). The harness seeds the implied schema,
applies minimal fixups after destructive statements, and requires every
statement to either succeed or fail with a clean SqlError from a pinned
allowlist (never crash). A user porting the reference's README should
find every statement working here.
"""

import re

import pytest

from turdb_tpu.database.api import Database
from turdb_tpu.sql.lexer import SqlError

README = "/root/reference/README.md"

# a valid 384-d vector literal to substitute for the README's
# pseudo-code "[0.1, 0.2, 0.3, ...]" ellipsis literals
VEC384 = "[" + ", ".join(f"0.{(i % 9) + 1}" for i in range(384)) + "]"

SEED = [
    # tables the README uses but never creates
    "CREATE TABLE orders (id INT PRIMARY KEY, customer_id INT, "
    "status TEXT, total DOUBLE)",
    "CREATE TABLE order_items (id INT PRIMARY KEY, order_id INT, "
    "product_id VARCHAR(50), quantity INT)",
    "CREATE TABLE sessions (id INT PRIMARY KEY, expires_at TIMESTAMP)",
    "CREATE TABLE logs (id BIGINT PRIMARY KEY AUTO_INCREMENT, "
    "message TEXT)",
    "CREATE TABLE colors (name TEXT)",
    "CREATE TABLE sizes (name TEXT)",
    "CREATE TABLE employees (id INT, name TEXT, department TEXT, "
    "salary DOUBLE)",
    "CREATE TABLE contractors (id INT, name TEXT)",
    "CREATE TABLE active_users (id INT)",
    "CREATE TABLE premium_users (id INT)",
    "CREATE TABLE all_users (id INT)",
    "CREATE TABLE banned_users (id INT)",
    "CREATE TABLE table1 (name TEXT)",
    "CREATE TABLE table2 (name TEXT)",
    "CREATE TABLE accounts (id INT PRIMARY KEY, balance DOUBLE)",
    "CREATE TABLE audit_log (id BIGINT PRIMARY KEY AUTO_INCREMENT, "
    "action TEXT)",
    "INSERT INTO accounts VALUES (1, 1000), (2, 500)",
    "INSERT INTO orders VALUES (1, 1, 'paid', 1500.0), "
    "(2, 2, 'new', 40.0)",
]

USERS_DDL = (
    "CREATE TABLE users (id BIGINT PRIMARY KEY AUTO_INCREMENT, "
    "name VARCHAR(100) NOT NULL, email TEXT UNIQUE, age INT DEFAULT 0, "
    "metadata JSONB, created_at TIMESTAMP)"
)

# fixups applied AFTER the statement whose text matches the key —
# restoring what the next examples assume exists
FIXUPS = {
    "CREATE TABLE users": [
        # the README later filters users.status (its own CREATE lacks it)
        "ALTER TABLE users ADD COLUMN status TEXT",
    ],
    "CREATE TABLE IF NOT EXISTS products": [
        # the README later filters products.category and joins p.id —
        # neither is in its own CREATE
        "ALTER TABLE products ADD COLUMN category TEXT",
        "ALTER TABLE products ADD COLUMN id INT",
    ],
    "DROP TABLE IF EXISTS users": [
        USERS_DDL,
        "ALTER TABLE users ADD COLUMN status TEXT",
        "CREATE INDEX idx_email ON users (email)",
    ],
    "ALTER TABLE users DROP COLUMN phone": [],
    "ALTER TABLE users RENAME COLUMN email TO email_address": [
        "ALTER TABLE users RENAME COLUMN email_address TO email",
    ],
    "DROP INDEX IF EXISTS idx_email": [
        "CREATE INDEX idx_email ON users (email)",
    ],
}

# statements allowed to fail with a clean SqlError (README-internal
# inconsistencies), matched by prefix
ALLOWED_ERRORS = [
    # Bob's explicit id collides with Alice's auto-increment id
    "INSERT INTO users VALUES (1, 'Bob'",
]


def _statements():
    text = open(README).read()
    out = []
    for block in re.findall(r"```sql\n(.*?)```", text, re.S):
        for raw in block.split(";"):
            s = " ".join(
                line
                for line in raw.splitlines()
                if not line.strip().startswith("--")
            ).strip()
            if s:
                out.append(re.sub(r"\s+", " ", s))
    return out


def test_readme_dialect_replay(tmp_path):
    stmts = _statements()
    assert len(stmts) >= 80, "README extraction regressed"
    db = Database.create(str(tmp_path / "readme"))
    try:
        for s in SEED:
            db.execute(s)
        ran = failed = 0
        for s in stmts:
            s = s.replace("[0.1, 0.2, 0.3, ...]", VEC384)
            s = s.replace("[0.15, 0.25, 0.35, ...]", VEC384)
            try:
                db.execute(s)
                ran += 1
            except SqlError as e:
                if not any(s.startswith(p) for p in ALLOWED_ERRORS):
                    pytest.fail(f"README statement failed: {s}\n  -> {e}")
                failed += 1
            for key, fix in FIXUPS.items():
                if s.startswith(key):
                    for f in fix:
                        db.execute(f)
        assert ran >= len(stmts) - len(ALLOWED_ERRORS)

        # spot-check semantics the README promises
        # savepoint block net effect: step 1 + step 2 retry survive
        msgs = [r[0] for r in db.query("SELECT message FROM logs")]
        assert "step 1" in msgs and "step 2 retry" in msgs
        assert "step 2" not in msgs
        # the committed transfer moved 100 from account 1 to 2; the
        # rolled-back one did not re-apply
        assert db.query("SELECT balance FROM accounts ORDER BY id") == [
            (900.0,),
            (600.0,),
        ]
        # vector ORDER BY works with a real literal
        rows = db.query(
            f"SELECT id FROM documents ORDER BY embedding <-> '{VEC384}' "
            "LIMIT 10"
        )
        assert len(rows) >= 1
    finally:
        db.close()

"""Replay the SQL of the reference's inline unit tests (363 #[test] fns
in src/**, ~90 of them API-level in src/database/mod.rs:222+), grouped
per test fn so schema context is consistent within a group.

Contract: every statement the reference's own tests execute must either
execute here, or raise a DatabaseError/ConstraintViolation (many
reference tests intentionally provoke constraint violations or
out-of-context savepoints and assert the error). A SqlError (parse or
binding failure) means a dialect gap — the sweep that built this test
found partial indexes, ISO-8601 intervals, PRAGMA wal_checkpoint_
threshold, and the reference memory_stats schema missing that way.
"""

import glob
import re

from turdb_tpu.database.api import Database, DatabaseError
from turdb_tpu.sql.lexer import SqlError

SQL_CALL = re.compile(
    r'\.(?:execute|query|query_with_columns|prepare)\(\s*r?#?"(.*?)"#?\s*[,)]',
    re.S,
)


def _groups():
    out = []
    for f in glob.glob("/root/reference/src/**/*.rs", recursive=True):
        text = open(f, errors="replace").read()
        parts = re.split(r"\n    fn (\w+)\(", text)
        for i in range(1, len(parts), 2):
            name, body = parts[i], parts[i + 1]
            stmts = []
            for m in SQL_CALL.finditer(body):
                s = " ".join(m.group(1).split())
                if len(s) > 8 and "{" not in s:  # skip format! templates
                    stmts.append(s)
            if stmts:
                out.append((f"{f.rsplit('/', 1)[1]}::{name}", stmts))
    return out


def test_reference_inline_sql_replay(tmp_path):
    groups = _groups()
    total = sum(len(s) for _, s in groups)
    assert total >= 300, f"extraction regressed: {total} statements"
    dialect_gaps = []
    for gi, (name, stmts) in enumerate(groups):
        db = Database.create(str(tmp_path / f"g{gi}"))
        try:
            for s in stmts:
                try:
                    if re.search(r"\$\d|\?", s):
                        db.prepare(s.replace("?", "$1"))
                    else:
                        db.execute(s)
                except DatabaseError:
                    # intentional-error tests (constraint violations,
                    # savepoint outside txn, drop-nonexistent, ...)
                    pass
                except SqlError as e:
                    dialect_gaps.append(f"{name}: {s[:100]} -> {e}")
        finally:
            db.close()
    assert not dialect_gaps, "\n".join(dialect_gaps[:10])

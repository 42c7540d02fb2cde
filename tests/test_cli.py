"""CLI REPL tests (reference src/cli/ behavior: dot-commands, table
formatting, one-shot -c execution)."""

import io

from turdb_tpu.cli.repl import Repl, format_table, main
from turdb_tpu.database.api import Database


def test_format_table():
    out = format_table(["a", "bee"], [(1, "x"), (None, "longer")])
    lines = out.splitlines()
    assert lines[1] == "| a    | bee    |"
    assert "NULL" in out and "longer" in out


def test_repl_flow(tmp_path):
    db = Database.create(str(tmp_path / "db"))
    buf = io.StringIO()
    r = Repl(db, out=buf)
    assert r.feed("CREATE TABLE t (a INT, b TEXT);")
    assert r.feed("INSERT INTO t VALUES (1, 'x'), (2, 'y');")
    assert r.feed("SELECT * FROM")  # multi-line continuation
    assert r.feed(" t ORDER BY a;")
    text = buf.getvalue()
    assert "| a | b |" in text and "(2 rows)" in text
    assert r.feed(".tables")
    assert "main.t" in buf.getvalue()
    assert r.feed(".schema t")
    assert not r.feed(".quit")
    db.close()


def test_repl_error_does_not_crash(tmp_path):
    db = Database.create(str(tmp_path / "db"))
    buf = io.StringIO()
    r = Repl(db, out=buf)
    assert r.feed("SELECT * FROM missing;")
    assert "error:" in buf.getvalue()
    db.close()


def test_main_command(tmp_path, capsys):
    rc = main([str(tmp_path / "db"), "-c", "SELECT 1 + 1"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "2" in out


def test_schema_renders_executable_create(tmp_path):
    """.schema emits a CREATE statement (reference cli/commands.rs) that
    round-trips: executing the rendered SQL reproduces the table."""
    from turdb_tpu.cli.repl import render_create_table
    from turdb_tpu.database.api import Database

    db = Database.create(str(tmp_path / "a"))
    db.execute("CREATE TYPE mood AS ENUM ('a', 'b')")
    db.execute("""CREATE TABLE users (
        id BIGINT PRIMARY KEY AUTO_INCREMENT,
        name VARCHAR(50) NOT NULL,
        age INT DEFAULT 0 CHECK (age >= 0),
        m mood,
        emb VECTOR(8))""")
    db.execute("ALTER TABLE users ADD CONSTRAINT adult CHECK (age < 200)")
    db.execute("CREATE INDEX iann ON users USING HNSW (emb)")
    sql = render_create_table(db.catalog["main"]["users"])
    assert "AUTO_INCREMENT" in sql and "VARCHAR(50)" in sql
    assert "CONSTRAINT adult" in sql and "USING HNSW" in sql

    db2 = Database.create(str(tmp_path / "b"))
    db2.execute("CREATE TYPE mood AS ENUM ('a', 'b')")
    for stmt in sql.split(";"):
        if stmt.strip():
            db2.execute(stmt)
    db2.execute("INSERT INTO users (name, m) VALUES ('x', 'a')")
    assert db2.query("SELECT id, age FROM users") == [(1, 0)]
    import pytest

    with pytest.raises(Exception):
        db2.execute("INSERT INTO users (name, age) VALUES ('y', 500)")
    db.close()
    db2.close()


def test_cli_multi_statement_command(tmp_path, capsys):
    """-c accepts statement scripts; trigger bodies keep inner ';'."""
    from turdb_tpu.cli.repl import main

    main([str(tmp_path / "ms"), "-c",
          "CREATE TABLE t (v INT); CREATE TABLE log (v INT); "
          "CREATE TRIGGER tr AFTER INSERT ON t FOR EACH ROW BEGIN "
          "INSERT INTO log VALUES (NEW.v); END; "
          "INSERT INTO t VALUES (7); SELECT * FROM log;"])
    out = capsys.readouterr().out
    assert "| 7 |" in out

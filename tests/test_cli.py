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

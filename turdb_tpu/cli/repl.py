"""REPL: multi-line SQL until ';', dot-commands, ASCII table output.

Counterpart of reference src/cli/repl.rs:87 (rustyline REPL), commands.rs
(.tables/.schema/.indexes), table.rs:63 (ASCII formatter), with readline
history at ~/.turdb_tpu_history.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def format_table(columns: list[str], rows: list[tuple]) -> str:
    """ASCII table (reference cli/table.rs:63)."""
    if not columns:
        return ""

    def cell(v) -> str:
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return f"{v:.6g}"
        if isinstance(v, (list, tuple)):
            return "[" + ", ".join(cell(x) for x in v) + "]"
        try:
            import numpy as np

            if isinstance(v, np.ndarray):
                inner = ", ".join(f"{x:.4g}" for x in v[:6])
                if len(v) > 6:
                    inner += ", …"
                return "[" + inner + "]"
        except ImportError:
            pass
        return str(v)

    grid = [[cell(v) for v in row] for row in rows]
    widths = [len(c) for c in columns]
    for row in grid:
        for j, c in enumerate(row):
            widths[j] = max(widths[j], len(c))
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    out = [sep]
    out.append(
        "|" + "|".join(f" {c.ljust(w)} " for c, w in zip(columns, widths)) + "|"
    )
    out.append(sep)
    for row in grid:
        out.append(
            "|" + "|".join(f" {c.ljust(w)} " for c, w in zip(row, widths)) + "|"
        )
    out.append(sep)
    return "\n".join(out)


class Repl:
    def __init__(self, db, out=None):
        self.db = db
        self.out = out  # None = current sys.stdout at write time
        self.buffer: list[str] = []

    def write(self, text=""):
        print(text, file=self.out or sys.stdout)

    # -- dot commands (reference cli/commands.rs) -------------------------

    def dot_command(self, line: str) -> bool:
        parts = line.split()
        cmd = parts[0]
        if cmd in (".quit", ".exit", ".q"):
            return False
        if cmd == ".help":
            self.write(
                ".tables [schema]   list tables\n"
                ".schema <table>    show CREATE-ish schema\n"
                ".indexes [table]   list indexes\n"
                ".timer on|off      toggle query timing\n"
                ".quit              exit"
            )
        elif cmd == ".tables":
            rows = self.db.query(
                "SELECT schema, name FROM turdb_catalog.tables ORDER BY schema, name"
            )
            for s, n in rows:
                self.write(f"{s}.{n}")
        elif cmd == ".schema":
            if len(parts) < 2:
                self.write("usage: .schema <table>")
            else:
                rows = self.db.query(
                    "SELECT name, type, nullable, primary_key FROM "
                    f"turdb_catalog.columns WHERE \"table\" = '{parts[1]}' "
                    "ORDER BY position"
                )
                if not rows:
                    self.write(f"no such table: {parts[1]}")
                for name, ty, nullable, pk in rows:
                    bits = [name, ty]
                    if pk:
                        bits.append("PRIMARY KEY")
                    elif not nullable:
                        bits.append("NOT NULL")
                    self.write("  " + " ".join(str(b) for b in bits))
        elif cmd == ".indexes":
            sql = (
                "SELECT \"table\", name, using, is_unique, entries FROM "
                "turdb_catalog.indexes"
            )
            if len(parts) > 1:
                sql += f" WHERE \"table\" = '{parts[1]}'"
            cols, rows = self.db.query_with_columns(sql)
            self.write(format_table(cols, rows))
        elif cmd == ".timer":
            self.timer = len(parts) > 1 and parts[1] == "on"
        else:
            self.write(f"unknown command {cmd}; try .help")
        return True

    timer = False

    def feed(self, line: str) -> bool:
        """Process one input line; returns False to exit."""
        stripped = line.strip()
        if not self.buffer and stripped.startswith("."):
            return self.dot_command(stripped)
        self.buffer.append(line)
        if not stripped.endswith(";"):
            return True
        sql = "\n".join(self.buffer).strip().rstrip(";")
        self.buffer = []
        if not sql:
            return True
        t0 = time.perf_counter()
        try:
            cols, rows = self.db.query_with_columns(sql)
            if cols:
                self.write(format_table(cols, rows))
                self.write(f"({len(rows)} row{'s' if len(rows) != 1 else ''})")
            else:
                res_txt = "ok"
                self.write(res_txt)
            if self.timer:
                self.write(f"time: {(time.perf_counter() - t0) * 1e3:.1f} ms")
        except Exception as e:  # surface, don't crash the REPL
            self.write(f"error: {e}")
        return True

    def prompt(self) -> str:
        return "  ...> " if self.buffer else "turdb> "

    def run_interactive(self):
        try:
            import readline

            hist = os.path.expanduser("~/.turdb_tpu_history")
            try:
                readline.read_history_file(hist)
            except (FileNotFoundError, OSError):
                pass
        except ImportError:
            readline = None
        self.write("turdb-tpu — TPU-native data engine. Type .help for help.")
        while True:
            try:
                line = input(self.prompt())
            except EOFError:
                break
            except KeyboardInterrupt:
                self.buffer = []
                self.write()
                continue
            if not self.feed(line):
                break
        if readline is not None:
            try:
                readline.write_history_file(hist)
            except OSError:
                pass


def main(argv=None):
    ap = argparse.ArgumentParser(prog="turdb-tpu", description="turdb-tpu CLI")
    ap.add_argument("database", nargs="?", help="database directory "
                    "(created if missing)")
    ap.add_argument("-c", "--command", help="execute one SQL statement and exit")
    ap.add_argument("--create", action="store_true",
                    help="create a new database (error if it exists)")
    ap.add_argument("--version", action="store_true", help="show version")
    args = ap.parse_args(argv)

    if args.version:
        from turdb_tpu import __version__

        print(f"turdb-tpu {__version__}")
        return 0
    if not args.database:
        ap.error("the following arguments are required: database")

    from turdb_tpu.database.api import Database, connect

    if args.create:
        if os.path.exists(args.database):
            print(f"error: {args.database} already exists", file=sys.stderr)
            return 1
        db = Database.create(args.database)
    else:
        db = connect(args.database)
    try:
        if args.command:
            repl = Repl(db)
            repl.feed(args.command.rstrip(";") + ";")
            return 0
        Repl(db).run_interactive()
        return 0
    finally:
        db.close()


if __name__ == "__main__":
    raise SystemExit(main())

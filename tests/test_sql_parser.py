"""Lexer + parser tests (reference src/sql/ lexer/parser inline-test
categories; dialect per reference README.md:33-760)."""

import pytest

from turdb_tpu.sql import ast as A
from turdb_tpu.sql.lexer import SqlError, T, tokenize
from turdb_tpu.sql.parser import parse_script, parse_sql


class TestLexer:
    def test_basic(self):
        toks = tokenize("SELECT a, 1.5 FROM t WHERE x = 'it''s'")
        kinds = [t.type for t in toks]
        assert kinds[0] is T.KEYWORD and toks[0].value == "SELECT"
        assert toks[3].value == "1.5"
        strs = [t for t in toks if t.type is T.STRING]
        assert strs[0].value == "it's"

    def test_vector_ops(self):
        toks = tokenize("a <-> b <#> c <=> d")
        ops = [t.value for t in toks if t.type is T.OP]
        assert ops == ["<->", "<#>", "<=>"]

    def test_json_ops(self):
        ops = [t.value for t in tokenize("j -> 'a' ->> 'b' @> '{}'") if t.type is T.OP]
        assert ops == ["->", "->>", "@>"]

    def test_comments_and_spans(self):
        toks = tokenize("SELECT -- line\n/* block /* nested */ */ 1")
        assert [t.value for t in toks[:-1]] == ["SELECT", "1"]
        assert toks[1].line == 2

    def test_quoted_ident(self):
        toks = tokenize('"weird ""name"""')
        assert toks[0].type is T.IDENT and toks[0].value == 'weird "name"'

    def test_params(self):
        toks = tokenize("? $2")
        assert toks[0].type is T.PARAM and toks[1].value == "$2"

    def test_error_position(self):
        with pytest.raises(SqlError):
            tokenize("SELECT 'unterminated")


class TestSelect:
    def test_simple(self):
        s = parse_sql("SELECT a, b AS bee FROM t WHERE a > 1 ORDER BY b DESC LIMIT 5")
        assert isinstance(s, A.Select)
        assert s.items[1].alias == "bee"
        assert isinstance(s.where, A.BinaryOp) and s.where.op == ">"
        assert s.order_by[0].desc
        assert s.limit.value == 5

    def test_star_and_qualified(self):
        s = parse_sql("SELECT *, t.*, t.a FROM t")
        assert isinstance(s.items[0].expr, A.Star)
        assert s.items[1].expr.table == "t"
        assert s.items[2].expr.table == "t" and s.items[2].expr.name == "a"

    def test_joins(self):
        s = parse_sql(
            "SELECT * FROM a JOIN b ON a.id = b.id "
            "LEFT JOIN c USING (x) CROSS JOIN d"
        )
        j = s.from_
        assert isinstance(j, A.Join) and j.kind == "CROSS"
        assert j.left.kind == "LEFT" and j.left.using == ["x"]
        assert j.left.left.kind == "INNER"

    def test_group_having(self):
        s = parse_sql(
            "SELECT dept, COUNT(*), SUM(pay) FROM e GROUP BY dept HAVING COUNT(*) > 2"
        )
        assert len(s.group_by) == 1
        assert isinstance(s.items[1].expr, A.FuncCall) and s.items[1].expr.star

    def test_subqueries(self):
        s = parse_sql(
            "SELECT (SELECT MAX(x) FROM t2), a FROM t "
            "WHERE a IN (SELECT b FROM t3) AND EXISTS (SELECT 1 FROM t4)"
        )
        assert isinstance(s.items[0].expr, A.ScalarSubquery)
        left = s.where.left
        assert isinstance(left, A.InSubquery)

    def test_cte_setops(self):
        s = parse_sql(
            "WITH top AS (SELECT * FROM t LIMIT 2) "
            "SELECT a FROM top UNION ALL SELECT a FROM t2 ORDER BY a"
        )
        assert s.ctes[0].name == "top"
        assert s.set_op[0] == "UNION" and s.set_op[1] is True
        assert len(s.order_by) == 1

    def test_vector_distance_precedence(self):
        s = parse_sql("SELECT * FROM t ORDER BY emb <-> '[1,2]' LIMIT 3")
        ob = s.order_by[0].expr
        assert isinstance(ob, A.BinaryOp) and ob.op == "<->"

    def test_case_cast(self):
        s = parse_sql(
            "SELECT CASE WHEN a > 0 THEN 'p' ELSE 'n' END, "
            "CAST(a AS DOUBLE), b::INT FROM t"
        )
        assert isinstance(s.items[0].expr, A.Case)
        assert isinstance(s.items[1].expr, A.Cast)
        assert isinstance(s.items[2].expr, A.Cast)

    def test_between_like_in(self):
        s = parse_sql(
            "SELECT * FROM t WHERE a BETWEEN 1 AND 5 AND b NOT LIKE 'x%' "
            "AND c IN (1, 2, 3) AND d IS NOT NULL"
        )
        e = s.where
        found = set()

        def walk(x):
            if isinstance(x, A.BinaryOp):
                walk(x.left)
                walk(x.right)
            else:
                found.add(type(x).__name__)

        walk(e)
        assert {"Between", "Like", "InList", "IsNull"} <= found

    def test_window(self):
        s = parse_sql(
            "SELECT ROW_NUMBER() OVER (PARTITION BY dept ORDER BY pay DESC) FROM e"
        )
        fc = s.items[0].expr
        assert fc.over is not None and len(fc.over.partition_by) == 1

    def test_precedence(self):
        s = parse_sql("SELECT 1 + 2 * 3 = 7 AND NOT FALSE")
        top = s.items[0].expr
        assert top.op == "AND"
        assert top.left.op == "="


class TestDml:
    def test_insert_values(self):
        s = parse_sql(
            "INSERT INTO t (a, b) VALUES (1, 'x'), (2, 'y') "
            "ON CONFLICT (a) DO NOTHING RETURNING a"
        )
        assert isinstance(s, A.Insert)
        assert len(s.values) == 2
        assert s.on_conflict == (["a"], "NOTHING")
        assert s.returning is not None

    def test_insert_select_upsert(self):
        s = parse_sql(
            "INSERT INTO t SELECT * FROM u ON CONFLICT (id) DO UPDATE SET n = n + 1"
        )
        assert s.query is not None
        cols, sets = s.on_conflict
        assert cols == ["id"] and sets[0][0] == "n"

    def test_update(self):
        s = parse_sql("UPDATE t SET a = a + 1, b = 'x' FROM u WHERE t.id = u.id")
        assert isinstance(s, A.Update)
        assert len(s.assignments) == 2 and s.from_ is not None

    def test_delete(self):
        s = parse_sql("DELETE FROM t WHERE a < 0 RETURNING *")
        assert isinstance(s, A.Delete) and s.returning is not None

    def test_params(self):
        s = parse_sql("INSERT INTO t VALUES (?, ?, $1)")
        row = s.values[0]
        assert [p.index for p in row] == [1, 2, 1]


class TestDdl:
    def test_create_table(self):
        s = parse_sql(
            "CREATE TABLE IF NOT EXISTS items ("
            " id BIGINT PRIMARY KEY,"
            " name VARCHAR(64) NOT NULL UNIQUE,"
            " price DOUBLE DEFAULT 0.0 CHECK (price >= 0),"
            " owner INT REFERENCES users(id) ON DELETE CASCADE,"
            " emb VECTOR(384),"
            " meta JSONB,"
            " UNIQUE (name, price),"
            " FOREIGN KEY (owner) REFERENCES users(id) ON UPDATE RESTRICT"
            ")"
        )
        assert isinstance(s, A.CreateTable) and s.if_not_exists
        cols = {c.name: c for c in s.columns}
        assert cols["id"].primary_key and cols["name"].not_null
        assert cols["emb"].type_name == "VECTOR" and cols["emb"].type_params == [384]
        assert cols["owner"].references[0] == "users"
        assert cols["owner"].references[2] == "CASCADE"
        assert s.constraints[0].kind == "UNIQUE"
        assert s.constraints[1].ref_table == "users"

    def test_create_index_hnsw(self):
        s = parse_sql(
            "CREATE INDEX idx_emb ON items USING HNSW (emb) "
            "WITH (m = 16, ef_construction = 100)"
        )
        assert isinstance(s, A.CreateIndex)
        assert s.using == "HNSW" and s.options["m"] == 16

    def test_drop_alter(self):
        assert parse_sql("DROP TABLE IF EXISTS t").if_exists
        a = parse_sql("ALTER TABLE t ADD COLUMN x INT DEFAULT 3")
        assert a.action == "ADD_COLUMN" and a.column.name == "x"
        r = parse_sql("ALTER TABLE t RENAME COLUMN a TO b")
        assert r.action == "RENAME_COLUMN" and r.new_name == "b"

    def test_txn_misc(self):
        assert parse_sql("BEGIN").kind == "BEGIN"
        assert parse_sql("ROLLBACK TO SAVEPOINT sp").kind == "ROLLBACK_TO"
        e = parse_sql("EXPLAIN SELECT 1")
        assert isinstance(e, A.Explain)
        p = parse_sql("PRAGMA wal = true")
        assert p.name == "wal" and p.value is True

    def test_script(self):
        stmts = parse_script("CREATE TABLE t (a INT); INSERT INTO t VALUES (1);")
        assert len(stmts) == 2

    def test_errors(self):
        with pytest.raises(SqlError):
            parse_sql("SELECT FROM")
        with pytest.raises(SqlError):
            parse_sql("INSERT INTO t")
        with pytest.raises(SqlError):
            parse_sql("SELECT 1 extra garbage ,")


class TestReferenceDialectGaps:
    """Statements lifted from the reference's own test corpus
    (integration_sql.rs and friends) that round-3 parity fixes cover."""

    def test_blob_literal(self):
        s = parse_sql("INSERT INTO binaries VALUES (x'DEADBEEF')")
        assert s.values[0][0].value == b"\xde\xad\xbe\xef"
        with pytest.raises(SqlError):
            parse_sql("SELECT x'ABC'")   # odd digit count

    def test_bare_derived_table(self):
        s = parse_sql("SELECT id FROM (SELECT id FROM t ORDER BY id LIMIT 1)")
        assert s.from_.alias.startswith("_subquery")

    def test_keyword_alias_after_as(self):
        s = parse_sql(
            "SELECT * FROM (SELECT * FROM (SELECT v FROM d) AS inner) AS outer"
        )
        assert s.from_.alias == "outer"
        assert s.from_.subquery.from_.alias == "inner"

    def test_truncate_restart_identity(self):
        assert parse_sql("TRUNCATE items RESTART IDENTITY").restart_identity
        assert not parse_sql("TRUNCATE items CONTINUE IDENTITY").restart_identity
        assert not parse_sql("TRUNCATE TABLE items").restart_identity

    def test_pragma_bare_value(self):
        p = parse_sql("PRAGMA WAL ON")
        assert p.name == "WAL" and p.value is True
        assert parse_sql("PRAGMA synchronous NORMAL").value == "NORMAL"

    def test_anon_alias_does_not_shift_params(self):
        s = parse_sql("SELECT * FROM (SELECT a FROM t) WHERE b = ?")
        # the synthesized subquery alias must not consume ?-numbering
        w = s.where
        assert w.right.index == 1

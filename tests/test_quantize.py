"""SQ8 quantization tests (reference src/hnsw/quantization.rs semantics:
4x compression, bounded reconstruction error, distance fidelity)."""

import numpy as np
import jax.numpy as jnp

from turdb_tpu.ops.quantize import sq8_decode, sq8_encode, sq8_search

RNG = np.random.default_rng(11)


def test_roundtrip_error_bounded():
    x = RNG.standard_normal((50, 64)).astype(np.float32)
    codes, mins, scales = sq8_encode(jnp.asarray(x))
    assert codes.dtype == jnp.uint8
    rec = np.asarray(sq8_decode(codes, mins, scales))
    # max error is half a quantization step per component
    step = np.asarray(scales)[:, None]
    assert (np.abs(rec - x) <= step * 0.5 + 1e-6).all()


def test_constant_vector():
    x = np.full((3, 8), 2.5, np.float32)
    codes, mins, scales = sq8_encode(jnp.asarray(x))
    rec = np.asarray(sq8_decode(codes, mins, scales))
    np.testing.assert_allclose(rec, x, atol=1e-6)


def test_search_matches_exact():
    x = RNG.standard_normal((400, 32)).astype(np.float32)
    q = RNG.standard_normal((16, 32)).astype(np.float32)
    codes, mins, scales = sq8_encode(jnp.asarray(x))
    valid = jnp.ones(400, bool)
    d, ids = sq8_search(jnp.asarray(q), codes, mins, scales, valid, k=5)
    ids = np.asarray(ids)
    exact = ((q[:, None, :] - x[None]) ** 2).sum(-1)
    exact_ids = np.argsort(exact, axis=1)[:, :5]
    # top-1 agreement should be near-perfect at 8-bit precision
    top1 = (ids[:, 0] == exact_ids[:, 0]).mean()
    assert top1 >= 0.9
    # recall@5
    rec = np.mean(
        [len(set(a) & set(b)) / 5 for a, b in zip(ids, exact_ids)]
    )
    assert rec >= 0.9


def test_search_respects_valid_mask():
    x = RNG.standard_normal((100, 16)).astype(np.float32)
    codes, mins, scales = sq8_encode(jnp.asarray(x))
    valid = np.zeros(100, bool)
    valid[40:60] = True
    d, ids = sq8_search(
        jnp.asarray(x[:4]), codes, mins, scales, jnp.asarray(valid), k=3
    )
    ids = np.asarray(ids)
    assert ((ids >= 40) & (ids < 60)).all()


class TestHnswSq8Serving:
    """SQ8-in-HBM graph store (models/hnsw.py Sq8Rows): search runs the
    same jitted programs via dequantize-on-gather; 4x HBM saved."""

    def _clustered(self, n, dim, nq):
        centers = RNG.standard_normal((32, dim)).astype(np.float32) * 4.0
        a = RNG.integers(0, 32, n + nq)
        pool = (centers[a] + RNG.standard_normal((n + nq, dim))).astype(
            np.float32
        )
        return pool[:n], pool[n:]

    def test_quantized_search_recall(self):
        from turdb_tpu.models.flat import FlatIndex
        from turdb_tpu.models.hnsw import HnswIndex, Sq8Rows

        x, q = self._clustered(3000, 32, 64)
        flat = FlatIndex(dim=32)
        flat.add(x)
        _, truth = flat.search(q, k=10)
        idx = HnswIndex(dim=32, ef_construction=80)
        idx.add(x)
        idx.quantize_sq8()
        assert isinstance(idx.state.vectors, Sq8Rows)
        _, ids = idx.search(q, k=10, ef=80)
        rec = np.mean(
            [len(set(p[p >= 0]) & set(t)) / 10 for p, t in zip(ids, truth)]
        )
        assert rec >= 0.92, f"sq8 recall {rec}"

    def test_add_after_quantize_dequantizes(self):
        from turdb_tpu.models.hnsw import HnswIndex, Sq8Rows

        x, q = self._clustered(500, 16, 4)
        idx = HnswIndex(dim=16)
        idx.add(x)
        idx.quantize_sq8()
        idx.add(RNG.standard_normal((8, 16)).astype(np.float32))
        assert not isinstance(idx.state.vectors, Sq8Rows)
        assert idx.size == 508
        d, ids = idx.search(q, k=5, ef=32)
        assert (ids[:, 0] >= 0).all()

    def test_sql_hnsw_sq8_option_and_reopen(self, tmp_path):
        from turdb_tpu import connect
        from turdb_tpu.models.hnsw import Sq8Rows

        p = str(tmp_path / "db")
        db = connect(p)
        db.execute("CREATE TABLE docs (id INT, emb VECTOR(16))")
        vecs = RNG.standard_normal((200, 16)).astype(np.float32)
        for i, v in enumerate(vecs):
            lit = "[" + ", ".join(f"{t:.5f}" for t in v) + "]"
            db.execute(f"INSERT INTO docs VALUES ({i}, '{lit}')")
        db.execute(
            "CREATE INDEX ds ON docs USING HNSW (emb) WITH (sq8 = true)"
        )
        h = db.catalog["main"]["docs"].hnsw["ds"]
        h.flush_pending()
        assert isinstance(h.index.state.vectors, Sq8Rows)
        qv = vecs[7]
        lit = "[" + ", ".join(f"{t:.5f}" for t in qv) + "]"
        rows = db.query(
            f"SELECT id FROM docs ORDER BY emb <-> '{lit}' LIMIT 3"
        )
        assert rows[0][0] == 7
        db.checkpoint()
        db.close()
        db2 = connect(p)
        h2 = db2.catalog["main"]["docs"].hnsw["ds"]
        assert isinstance(h2.index.state.vectors, Sq8Rows)
        rows = db2.query(
            f"SELECT id FROM docs ORDER BY emb <-> '{lit}' LIMIT 3"
        )
        assert rows[0][0] == 7
        db2.close()

    def test_sq16_graph_beats_sq8(self):
        from turdb_tpu.models.flat import FlatIndex
        from turdb_tpu.models.hnsw import HnswIndex, Sq8Rows
        import jax.numpy as jnp

        x, q = self._clustered(3000, 32, 64)
        flat = FlatIndex(dim=32)
        flat.add(x)
        _, truth = flat.search(q, k=10)

        def recall_of(idx):
            _, ids = idx.search(q, k=10, ef=80)
            return np.mean(
                [len(set(p[p >= 0]) & set(t)) / 10 for p, t in zip(ids, truth)]
            )

        i16 = HnswIndex(dim=32, ef_construction=80)
        i16.add(x)
        base = recall_of(i16)
        i16.quantize_sq16()
        assert isinstance(i16.state.vectors, Sq8Rows)
        assert i16.state.vectors.codes.dtype == jnp.uint16
        r16 = recall_of(i16)
        # sq16's 2^-16-of-range step is final-ordering-exact
        assert r16 >= base - 0.005, f"sq16 {r16} vs f32 {base}"

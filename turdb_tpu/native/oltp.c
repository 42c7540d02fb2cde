/* OLTP hot-path encoders as a CPython extension.
 *
 * Native counterpart of the reference's per-row insert machinery
 * (reference src/encoding/key.rs order-preserving keys,
 * src/records/builder.rs record build, src/storage/wal.rs:142-152 frame
 * encode): the round-2 verdict measured the pure-Python versions of
 * these three as the single-row prepared-insert bottleneck. Compiled by
 * turdb_tpu.native.build (g++ with the CPython headers — no pybind11 in
 * the image); Python fallbacks remain canonical and are byte-for-byte
 * compared in tests/test_native_oltp.py.
 *
 *   encode_key(values: tuple [, descs: tuple[bool]]) -> bytes
 *       None/bool/int/float/str/bytes; raises TypeError for Decimal and
 *       anything else (caller falls back to records.keys.encode_key).
 *   pack_record(schema: bytes, values: tuple) -> bytes | None
 *       `schema` layout (built by records.record.schema_blob):
 *       [u16 n][u16 bitmap_len][u32 fixed_len][u16 nvar] then per column
 *       [u8 sc][u16 fixed_off][i16 var_idx] with sc: 0=i64 1=f64 2=f32
 *       3=bool 4=text 5=bytes 255=unsupported. Returns None when a
 *       value needs the Python encoder (vectors, jsonb, Decimal,
 *       TOAST pointers).
 *   wal_frame(ftype, table_id, lsn, txn_id, payload) -> bytes
 *       32-byte header + payload with CRC64-ECMA at offset 24.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdint.h>
#include <string.h>
#include <math.h>

/* ---- crc64 (identical parameters to crc64.cpp) ---------------------- */
static uint64_t TABLE[8][256];
static int CRC_INIT = 0;
static const uint64_t POLY = 0xC96C5795D7870F42ULL;

static void init_tables(void) {
    for (int i = 0; i < 256; i++) {
        uint64_t crc = (uint64_t)i;
        for (int j = 0; j < 8; j++)
            crc = (crc >> 1) ^ ((crc & 1) ? POLY : 0);
        TABLE[0][i] = crc;
    }
    for (int t = 1; t < 8; t++)
        for (int i = 0; i < 256; i++)
            TABLE[t][i] =
                (TABLE[t - 1][i] >> 8) ^ TABLE[0][TABLE[t - 1][i] & 0xFF];
    CRC_INIT = 1;
}

static uint64_t crc64(const uint8_t *data, size_t len, uint64_t seed) {
    if (!CRC_INIT) init_tables();
    uint64_t crc = ~seed;
    size_t i = 0;
    for (; i + 8 <= len; i += 8) {
        uint64_t w;
        memcpy(&w, data + i, 8);
        crc ^= w;
        crc = TABLE[7][crc & 0xFF] ^ TABLE[6][(crc >> 8) & 0xFF] ^
              TABLE[5][(crc >> 16) & 0xFF] ^ TABLE[4][(crc >> 24) & 0xFF] ^
              TABLE[3][(crc >> 32) & 0xFF] ^ TABLE[2][(crc >> 40) & 0xFF] ^
              TABLE[1][(crc >> 48) & 0xFF] ^ TABLE[0][(crc >> 56) & 0xFF];
    }
    for (; i < len; i++)
        crc = (crc >> 8) ^ TABLE[0][(crc ^ data[i]) & 0xFF];
    return ~crc;
}

/* ---- key encoding (mirror of records/keys.py) ----------------------- */

#define TAG_NULL 0x01
#define TAG_FALSE 0x08
#define TAG_TRUE 0x09
#define TAG_NUM 0x10
#define TAG_TEXT 0x20
#define TAG_BLOB 0x30

typedef struct {
    uint8_t *buf;
    Py_ssize_t len, cap;
} Buf;

static int buf_reserve(Buf *b, Py_ssize_t extra) {
    if (b->len + extra <= b->cap) return 0;
    Py_ssize_t nc = b->cap * 2;
    while (nc < b->len + extra) nc *= 2;
    uint8_t *nb = (uint8_t *)PyMem_Realloc(b->buf, nc);
    if (!nb) return -1;
    b->buf = nb;
    b->cap = nc;
    return 0;
}

static void put_be64(uint8_t *p, uint64_t v) {
    for (int i = 7; i >= 0; i--) { p[i] = (uint8_t)(v & 0xFF); v >>= 8; }
}

static uint64_t flip_double(double f) {
    uint64_t bits;
    memcpy(&bits, &f, 8);
    if (bits & 0x8000000000000000ULL) return ~bits;
    return bits | 0x8000000000000000ULL;
}

static int64_t clamp63(__int128 q) {
    const int64_t lim = ((int64_t)1 << 62) - 1 + ((int64_t)1 << 62); /* 2^63-1 */
    if (q > lim) return lim;
    if (q < -lim) return -lim;
    return (int64_t)q;
}

/* residue for int64 values outside +/-2^53 (keys.py:_residue) */
static int64_t int_residue(int64_t v, double f) {
    if (isinf(f) || isnan(f)) return 0;
    if (v > -(1LL << 53) && v < (1LL << 53)) return 0;
    int64_t fi = (int64_t)f;
    __int128 delta = (__int128)v - (__int128)fi;
    if (delta == 0) return 0;
    double u = nextafter(fabs(f), INFINITY) - fabs(f); /* ulp(f), power of 2 */
    int64_t ulp = (int64_t)u;
    if (ulp < 2) return 0;
    /* floored division (Python // semantics; C / truncates toward 0) */
    __int128 q = delta << 62;
    __int128 r = q / ulp;
    if ((q % ulp) != 0 && q < 0) r -= 1;
    return clamp63(r);
}

static int encode_one(Buf *b, PyObject *v, int desc) {
    Py_ssize_t start = b->len;
    if (v == Py_None) {
        if (buf_reserve(b, 1)) return -1;
        b->buf[b->len++] = TAG_NULL;
    } else if (PyBool_Check(v)) {
        if (buf_reserve(b, 1)) return -1;
        b->buf[b->len++] = (v == Py_True) ? TAG_TRUE : TAG_FALSE;
    } else if (PyLong_Check(v)) {
        int overflow = 0;
        int64_t iv = PyLong_AsLongLongAndOverflow(v, &overflow);
        if (overflow) { PyErr_SetString(PyExc_TypeError, "int too big"); return -1; }
        if (iv == -1 && PyErr_Occurred()) return -1;
        double f = (double)iv;
        if (buf_reserve(b, 17)) return -1;
        b->buf[b->len] = TAG_NUM;
        put_be64(b->buf + b->len + 1, flip_double(f));
        put_be64(b->buf + b->len + 9,
                 (uint64_t)int_residue(iv, f) + 0x8000000000000000ULL);
        b->len += 17;
    } else if (PyFloat_Check(v)) {
        double f = PyFloat_AS_DOUBLE(v);
        if (buf_reserve(b, 17)) return -1;
        b->buf[b->len] = TAG_NUM;
        put_be64(b->buf + b->len + 1, flip_double(f));
        put_be64(b->buf + b->len + 9, 0x8000000000000000ULL);
        b->len += 17;
    } else if (PyUnicode_Check(v) || PyBytes_Check(v)) {
        const char *raw;
        Py_ssize_t rl;
        PyObject *tmp = NULL;
        uint8_t tag;
        if (PyUnicode_Check(v)) {
            raw = PyUnicode_AsUTF8AndSize(v, &rl);
            if (!raw) return -1;
            tag = TAG_TEXT;
        } else {
            raw = PyBytes_AS_STRING(v);
            rl = PyBytes_GET_SIZE(v);
            tag = TAG_BLOB;
        }
        if (buf_reserve(b, 1 + 2 * rl + 2)) { Py_XDECREF(tmp); return -1; }
        b->buf[b->len++] = tag;
        for (Py_ssize_t i = 0; i < rl; i++) {
            uint8_t c = (uint8_t)raw[i];
            b->buf[b->len++] = c;
            if (c == 0x00) b->buf[b->len++] = 0xFF;
        }
        b->buf[b->len++] = 0x00;
        b->buf[b->len++] = 0x00;
        Py_XDECREF(tmp);
    } else {
        PyErr_Format(PyExc_TypeError, "unencodable key value: %s",
                     Py_TYPE(v)->tp_name);
        return -1;
    }
    if (desc) {
        for (Py_ssize_t i = start; i < b->len; i++)
            b->buf[i] = (uint8_t)(255 - b->buf[i]);
    }
    return 0;
}

static PyObject *py_encode_key(PyObject *self, PyObject *args) {
    PyObject *values, *descs = NULL;
    if (!PyArg_ParseTuple(args, "O|O", &values, &descs)) return NULL;
    PyObject *seq = PySequence_Fast(values, "values must be a sequence");
    if (!seq) return NULL;
    Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
    Buf b = {(uint8_t *)PyMem_Malloc(64), 0, 64};
    if (!b.buf) { Py_DECREF(seq); return PyErr_NoMemory(); }
    for (Py_ssize_t i = 0; i < n; i++) {
        int d = 0;
        if (descs && descs != Py_None) {
            PyObject *df = PySequence_GetItem(descs, i);
            if (!df) goto fail;
            d = PyObject_IsTrue(df);
            Py_DECREF(df);
        }
        if (encode_one(&b, PySequence_Fast_GET_ITEM(seq, i), d)) goto fail;
    }
    Py_DECREF(seq);
    {
        PyObject *out = PyBytes_FromStringAndSize((char *)b.buf, b.len);
        PyMem_Free(b.buf);
        return out;
    }
fail:
    Py_DECREF(seq);
    PyMem_Free(b.buf);
    return NULL;
}

/* ---- record packing (mirror of records/record.py pack_record) ------- */

static PyObject *py_pack_record(PyObject *self, PyObject *args) {
    const char *schema;
    Py_ssize_t slen;
    PyObject *values;
    if (!PyArg_ParseTuple(args, "y#O", &schema, &slen, &values)) return NULL;
    if (slen < 10) { PyErr_SetString(PyExc_ValueError, "bad schema blob"); return NULL; }
    uint16_t n, bitmap_len, nvar;
    uint32_t fixed_len;
    memcpy(&n, schema, 2);
    memcpy(&bitmap_len, schema + 2, 2);
    memcpy(&fixed_len, schema + 4, 4);
    memcpy(&nvar, schema + 8, 2);
    const uint8_t *cols = (const uint8_t *)schema + 10;
    if (slen != 10 + 5 * (Py_ssize_t)n) {
        PyErr_SetString(PyExc_ValueError, "bad schema blob size");
        return NULL;
    }
    PyObject *seq = PySequence_Fast(values, "values must be a sequence");
    if (!seq) return NULL;
    if (PySequence_Fast_GET_SIZE(seq) != n) {
        Py_DECREF(seq);
        PyErr_SetString(PyExc_ValueError, "value count mismatch");
        return NULL;
    }
    /* first pass: var lengths + eligibility */
    Py_ssize_t var_total = 0;
    for (uint16_t i = 0; i < n; i++) {
        PyObject *v = PySequence_Fast_GET_ITEM(seq, i);
        uint8_t sc = cols[5 * i];
        if (v == Py_None) continue;
        if (sc == 255) { Py_DECREF(seq); Py_RETURN_NONE; }
        if (sc == 4) {
            if (!PyUnicode_Check(v)) { Py_DECREF(seq); Py_RETURN_NONE; }
            Py_ssize_t l;
            if (!PyUnicode_AsUTF8AndSize(v, &l)) { Py_DECREF(seq); return NULL; }
            var_total += l;
        } else if (sc == 5) {
            if (!PyBytes_Check(v)) { Py_DECREF(seq); Py_RETURN_NONE; }
            var_total += PyBytes_GET_SIZE(v);
        } else if (sc <= 3) {
            if (!(PyLong_Check(v) || PyFloat_Check(v) || PyBool_Check(v))) {
                Py_DECREF(seq); Py_RETURN_NONE;
            }
        } else { Py_DECREF(seq); Py_RETURN_NONE; }
    }
    Py_ssize_t total = 2 + bitmap_len + fixed_len + 4 * (nvar + 1) + var_total;
    PyObject *out = PyBytes_FromStringAndSize(NULL, total);
    if (!out) { Py_DECREF(seq); return NULL; }
    uint8_t *p = (uint8_t *)PyBytes_AS_STRING(out);
    memset(p, 0, total - var_total);
    p[0] = (uint8_t)(n & 0xFF);
    p[1] = (uint8_t)(n >> 8);
    uint8_t *bitmap = p + 2;
    uint8_t *fixed = p + 2 + bitmap_len;
    uint8_t *offtab = fixed + fixed_len;
    uint8_t *payload = offtab + 4 * (nvar + 1);
    uint32_t pos = 0;
    for (uint16_t i = 0; i < n; i++) {
        PyObject *v = PySequence_Fast_GET_ITEM(seq, i);
        uint8_t sc = cols[5 * i];
        uint16_t foff;
        int16_t vidx;
        memcpy(&foff, cols + 5 * i + 1, 2);
        memcpy(&vidx, cols + 5 * i + 3, 2);
        if (v == Py_None) {
            bitmap[i / 8] |= (uint8_t)(1 << (i % 8));
            if (vidx >= 0) memcpy(offtab + 4 * vidx, &pos, 4);
            continue;
        }
        switch (sc) {
        case 0: { /* i64 */
            int64_t iv;
            if (PyBool_Check(v)) iv = (v == Py_True);
            else if (PyLong_Check(v)) {
                int ovf = 0;
                iv = PyLong_AsLongLongAndOverflow(v, &ovf);
                if (ovf) { Py_DECREF(seq); Py_DECREF(out);
                    PyErr_SetString(PyExc_OverflowError, "int too big"); return NULL; }
            } else iv = (int64_t)PyFloat_AS_DOUBLE(v);
            memcpy(fixed + foff, &iv, 8);
            break;
        }
        case 1: { /* f64 */
            double d = PyFloat_Check(v) ? PyFloat_AS_DOUBLE(v)
                                        : (double)PyLong_AsLongLong(v);
            memcpy(fixed + foff, &d, 8);
            break;
        }
        case 2: { /* f32 */
            float d = PyFloat_Check(v) ? (float)PyFloat_AS_DOUBLE(v)
                                       : (float)PyLong_AsLongLong(v);
            memcpy(fixed + foff, &d, 4);
            break;
        }
        case 3: { /* bool, packed as signed byte */
            int8_t bv = PyObject_IsTrue(v) ? 1 : 0;
            fixed[foff] = (uint8_t)bv;
            break;
        }
        case 4: { /* text */
            Py_ssize_t l;
            const char *s = PyUnicode_AsUTF8AndSize(v, &l);
            memcpy(offtab + 4 * vidx, &pos, 4);
            memcpy(payload + pos, s, l);
            pos += (uint32_t)l;
            break;
        }
        case 5: { /* bytes */
            memcpy(offtab + 4 * vidx, &pos, 4);
            memcpy(payload + pos, PyBytes_AS_STRING(v), PyBytes_GET_SIZE(v));
            pos += (uint32_t)PyBytes_GET_SIZE(v);
            break;
        }
        }
    }
    /* offsets for var columns that were NULL must still advance in order:
       python writes offsets for EVERY var slot sequentially */
    /* redo the offset table exactly like python: chunk lengths in order */
    {
        uint32_t p2 = 0;
        for (uint16_t i = 0; i < n; i++) {
            uint8_t sc = cols[5 * i];
            int16_t vidx;
            memcpy(&vidx, cols + 5 * i + 3, 2);
            if (vidx < 0) continue;
            PyObject *v = PySequence_Fast_GET_ITEM(seq, i);
            memcpy(offtab + 4 * vidx, &p2, 4);
            if (v == Py_None) continue;
            if (sc == 4) {
                Py_ssize_t l;
                PyUnicode_AsUTF8AndSize(v, &l);
                p2 += (uint32_t)l;
            } else if (sc == 5) {
                p2 += (uint32_t)PyBytes_GET_SIZE(v);
            }
        }
        memcpy(offtab + 4 * nvar, &p2, 4);
    }
    Py_DECREF(seq);
    return out;
}

/* ---- WAL frame encode (mirror of storage/wal.py append) ------------- */

static PyObject *py_wal_frame(PyObject *self, PyObject *args) {
    unsigned int ftype;
    unsigned int table_id;
    unsigned long long lsn, txn_id;
    const char *payload;
    Py_ssize_t plen;
    if (!PyArg_ParseTuple(args, "IIKKy#", &ftype, &table_id, &lsn, &txn_id,
                          &payload, &plen))
        return NULL;
    PyObject *out = PyBytes_FromStringAndSize(NULL, 32 + plen);
    if (!out) return NULL;
    uint8_t *p = (uint8_t *)PyBytes_AS_STRING(out);
    memset(p, 0, 32);
    uint32_t pl = (uint32_t)plen;
    memcpy(p, &pl, 4);
    p[4] = (uint8_t)ftype;
    p[5] = 0;
    uint16_t tid = (uint16_t)table_id;
    memcpy(p + 6, &tid, 2);
    uint64_t l = (uint64_t)lsn, t = (uint64_t)txn_id;
    memcpy(p + 8, &l, 8);
    memcpy(p + 16, &t, 8);
    memcpy(p + 32, payload, plen);
    /* crc over head[:24] + payload */
    uint8_t tmp[24];
    memcpy(tmp, p, 24);
    uint64_t crc;
    if (plen == 0) {
        crc = crc64(tmp, 24, 0);
    } else {
        /* compute over concatenation without copying payload twice:
           crc64 here is one-shot, so build once in a stack/heap buffer */
        if (plen <= 4064) {
            uint8_t sb[4096];
            memcpy(sb, tmp, 24);
            memcpy(sb + 24, payload, plen);
            crc = crc64(sb, 24 + plen, 0);
        } else {
            uint8_t *hb = (uint8_t *)PyMem_Malloc(24 + plen);
            if (!hb) { Py_DECREF(out); return PyErr_NoMemory(); }
            memcpy(hb, tmp, 24);
            memcpy(hb + 24, payload, plen);
            crc = crc64(hb, 24 + plen, 0);
            PyMem_Free(hb);
        }
    }
    memcpy(p + 24, &crc, 8);
    return out;
}

/* ---- row store (the prepared-insert fast lane's column writes) ------ */

/* One C call replaces the generated lane's ~13 numpy scalar assignments
 * (each ~150-250ns of ndarray __setitem__ dispatch) plus the per-column
 * type-check if-chains. The descriptor caches raw array data pointers
 * (the Python side holds references and rebuilds the capsule whenever
 * the table's arrays are swapped by growth). Two-pass: validate and
 * coerce everything, then write — a bail never leaves partial writes. */

typedef struct {
    uint8_t sc;        /* 0=i64 1=f64 2=f32 3=bool 4=text 5=bytes */
    uint8_t nullable;
    int32_t max_len;   /* text/bytes length cap; <0 = none */
    void *col;
    uint8_t *null;
} ColD;

typedef struct {
    int n;
    int64_t *xmin, *xmax, *rowids, *prev;
    ColD cols[1];
} RowDesc;

static void rowdesc_free(PyObject *cap) {
    void *p = PyCapsule_GetPointer(cap, "turdb.RowDesc");
    if (p) PyMem_Free(p);
}

static PyObject *py_make_row_desc(PyObject *self, PyObject *args) {
    PyObject *spec;
    unsigned long long xmin_a, xmax_a, rid_a, prev_a;
    if (!PyArg_ParseTuple(args, "OKKKK", &spec, &xmin_a, &xmax_a, &rid_a,
                          &prev_a))
        return NULL;
    PyObject *seq = PySequence_Fast(spec, "spec must be a sequence");
    if (!seq) return NULL;
    Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
    RowDesc *d = (RowDesc *)PyMem_Malloc(sizeof(RowDesc) +
                                         (n > 0 ? n - 1 : 0) * sizeof(ColD));
    if (!d) { Py_DECREF(seq); return PyErr_NoMemory(); }
    d->n = (int)n;
    d->xmin = (int64_t *)(uintptr_t)xmin_a;
    d->xmax = (int64_t *)(uintptr_t)xmax_a;
    d->rowids = (int64_t *)(uintptr_t)rid_a;
    d->prev = (int64_t *)(uintptr_t)prev_a;
    for (Py_ssize_t i = 0; i < n; i++) {
        PyObject *it = PySequence_Fast_GET_ITEM(seq, i);
        /* (sc, col_addr, null_addr, nullable, max_len) */
        long sc = PyLong_AsLong(PyTuple_GET_ITEM(it, 0));
        unsigned long long ca = PyLong_AsUnsignedLongLong(PyTuple_GET_ITEM(it, 1));
        unsigned long long na = PyLong_AsUnsignedLongLong(PyTuple_GET_ITEM(it, 2));
        long nullable = PyLong_AsLong(PyTuple_GET_ITEM(it, 3));
        long ml = PyLong_AsLong(PyTuple_GET_ITEM(it, 4));
        if (PyErr_Occurred()) { PyMem_Free(d); Py_DECREF(seq); return NULL; }
        d->cols[i].sc = (uint8_t)sc;
        d->cols[i].nullable = (uint8_t)nullable;
        d->cols[i].max_len = (int32_t)ml;
        d->cols[i].col = (void *)(uintptr_t)ca;
        d->cols[i].null = (uint8_t *)(uintptr_t)na;
    }
    Py_DECREF(seq);
    return PyCapsule_New(d, "turdb.RowDesc", rowdesc_free);
}

static PyObject *py_store_row(PyObject *self, PyObject *args) {
    PyObject *cap, *vals;
    long long vi, rid, tid;
    if (!PyArg_ParseTuple(args, "OLLLO", &cap, &vi, &rid, &tid, &vals))
        return NULL;
    RowDesc *d = (RowDesc *)PyCapsule_GetPointer(cap, "turdb.RowDesc");
    if (!d) return NULL;
    if (!PyTuple_Check(vals) || PyTuple_GET_SIZE(vals) != d->n) {
        PyErr_SetString(PyExc_ValueError, "vals arity mismatch");
        return NULL;
    }
    /* pass 1: validate + coerce (no writes).
       returns: 0 ok; i+1 type-bail on col i; -(i+1) NOT NULL on col i */
    union { int64_t i; double f; } tmp[64];
    if (d->n > 64) return PyLong_FromLong(1); /* bail: desc too wide */
    for (int i = 0; i < d->n; i++) {
        PyObject *v = PyTuple_GET_ITEM(vals, i);
        ColD *c = &d->cols[i];
        if (v == Py_None) {
            if (!c->nullable) return PyLong_FromLong(-(i + 1));
            continue;
        }
        switch (c->sc) {
        case 0: { /* i64: exact int only (bool is not CheckExact) */
            if (!PyLong_CheckExact(v)) return PyLong_FromLong(i + 1);
            int ovf = 0;
            tmp[i].i = PyLong_AsLongLongAndOverflow(v, &ovf);
            if (ovf) return PyLong_FromLong(i + 1);
            break;
        }
        case 1:
        case 2: { /* f64/f32: float, or int coerced */
            if (PyFloat_CheckExact(v)) tmp[i].f = PyFloat_AS_DOUBLE(v);
            else if (PyLong_CheckExact(v)) {
                int ovf = 0;
                int64_t iv = PyLong_AsLongLongAndOverflow(v, &ovf);
                if (ovf) return PyLong_FromLong(i + 1);
                tmp[i].f = (double)iv;
            } else return PyLong_FromLong(i + 1);
            break;
        }
        case 3:
            if (!PyBool_Check(v)) return PyLong_FromLong(i + 1);
            break;
        case 4: {
            if (!PyUnicode_CheckExact(v)) return PyLong_FromLong(i + 1);
            if (c->max_len >= 0 && PyUnicode_GET_LENGTH(v) > c->max_len)
                return PyLong_FromLong(i + 1);
            break;
        }
        case 5: {
            if (!PyBytes_CheckExact(v)) return PyLong_FromLong(i + 1);
            if (c->max_len >= 0 && PyBytes_GET_SIZE(v) > c->max_len)
                return PyLong_FromLong(i + 1);
            break;
        }
        default:
            return PyLong_FromLong(i + 1);
        }
    }
    /* pass 2: write */
    for (int i = 0; i < d->n; i++) {
        PyObject *v = PyTuple_GET_ITEM(vals, i);
        ColD *c = &d->cols[i];
        if (v == Py_None) { c->null[vi] = 1; continue; }
        c->null[vi] = 0;
        switch (c->sc) {
        case 0: ((int64_t *)c->col)[vi] = tmp[i].i; break;
        case 1: ((double *)c->col)[vi] = tmp[i].f; break;
        case 2: ((float *)c->col)[vi] = (float)tmp[i].f; break;
        case 3: ((uint8_t *)c->col)[vi] = (v == Py_True); break;
        case 4:
        case 5: { /* object array slot: refcounted swap */
            PyObject **slot = ((PyObject **)c->col) + vi;
            PyObject *old = *slot;
            Py_INCREF(v);
            *slot = v;
            Py_XDECREF(old);
            break;
        }
        }
    }
    d->xmin[vi] = tid;
    d->xmax[vi] = 0;
    d->rowids[vi] = rid;
    d->prev[vi] = -1;
    return PyLong_FromLong(0);
}

/* ---- fused INSERT+COMMIT WAL frame pair ----------------------------- */

static void fill_frame(uint8_t *p, unsigned ftype, unsigned table_id,
                       uint64_t lsn, uint64_t txn, const uint8_t *payload,
                       Py_ssize_t plen) {
    memset(p, 0, 32);
    uint32_t pl = (uint32_t)plen;
    memcpy(p, &pl, 4);
    p[4] = (uint8_t)ftype;
    uint16_t tid16 = (uint16_t)table_id;
    memcpy(p + 6, &tid16, 2);
    memcpy(p + 8, &lsn, 8);
    memcpy(p + 16, &txn, 8);
    if (plen) memcpy(p + 32, payload, plen);
    /* crc over head[:24] + payload */
    uint64_t crc;
    if (plen == 0) {
        crc = crc64(p, 24, 0);
    } else {
        uint8_t *hb = (uint8_t *)PyMem_Malloc(24 + plen);
        if (hb) {
            memcpy(hb, p, 24);
            memcpy(hb + 24, payload, plen);
            crc = crc64(hb, 24 + plen, 0);
            PyMem_Free(hb);
        } else {
            crc = 0;
        }
    }
    memcpy(p + 24, &crc, 8);
}

static PyObject *py_wal_frame_pair(PyObject *self, PyObject *args) {
    unsigned int ft_a, table_id, ft_b;
    unsigned long long lsn, txn_id;
    const char *payload;
    Py_ssize_t plen;
    if (!PyArg_ParseTuple(args, "IIKKy#I", &ft_a, &table_id, &lsn, &txn_id,
                          &payload, &plen, &ft_b))
        return NULL;
    PyObject *out = PyBytes_FromStringAndSize(NULL, 32 + plen + 32);
    if (!out) return NULL;
    uint8_t *p = (uint8_t *)PyBytes_AS_STRING(out);
    fill_frame(p, ft_a, table_id, lsn, txn_id, (const uint8_t *)payload,
               plen);
    fill_frame(p + 32 + plen, ft_b, 0, lsn + 1, txn_id, NULL, 0);
    return out;
}

static PyMethodDef Methods[] = {
    {"encode_key", py_encode_key, METH_VARARGS,
     "order-preserving composite key bytes"},
    {"pack_record", py_pack_record, METH_VARARGS,
     "binary row format; None when a value needs the Python encoder"},
    {"wal_frame", py_wal_frame, METH_VARARGS,
     "32-byte WAL frame header + payload with CRC64"},
    {"make_row_desc", py_make_row_desc, METH_VARARGS,
     "capsule of raw column pointers for store_row"},
    {"store_row", py_store_row, METH_VARARGS,
     "validate+write one row's columns and MVCC stamps; 0 ok, >0 bail, "
     "<0 NOT NULL violation (1-based column)"},
    {"wal_frame_pair", py_wal_frame_pair, METH_VARARGS,
     "INSERT frame + empty follow-up frame (lsn+1) as one bytes"},
    {NULL, NULL, 0, NULL}};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_turdb_oltp", NULL, -1, Methods,
};

PyMODINIT_FUNC PyInit__turdb_oltp(void) {
    return PyModule_Create(&moduledef);
}

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

/* ---- consolidated prepared-insert lane ------------------------------ *
 *
 * One C call per row replacing the GENERATED Python lane entirely
 * (reference prepared.rs:106-158 economics: the Rust insert_cached row
 * costs 1,185 ns; the generated-Python lane still spent ~70% of its
 * time in bytecode dispatch around the C helpers). exec_insert drives
 * the SAME Python-visible structures (column arrays via RowDesc, the
 * SortedKeyIndex delta list/dicts, the WAL buffer list, the MVCC
 * commit-log array) through the C API, so every other path observes
 * identical state. Bail-to-generic semantics mirror the generated lane:
 * any unusual row returns None and the caller re-validates from
 * scratch; maintenance conditions return small negative codes so the
 * caller can grow arrays / flush deltas and retry.
 */

#define ICTX_MAXCOLS 64
#define ICTX_MAXSEC 8
#define ICTX_MAXPOS 8
#define LSM_MERGE_THRESHOLD 2048
#define TS_IN_PROGRESS ((int64_t)1 << 62)
#define TS_ABORTED (((int64_t)1 << 62) + 1)

/* interned attribute names (module init) */
static PyObject *S_delta, *S_dbk, *S_count, *S_single, *S_deleted;
static PyObject *S_nversions, *S_capacity, *S_next_rowid, *S_auto_increment;
static PyObject *S_next_txn, *S_next_ts, *S_commit_ts;
static PyObject *S_wal_enabled, *S_replaying, *S_wal_autoflush, *S_wal;
static PyObject *S_buffer, *S_next_lsn, *S_frame_count;
static PyObject *S_last_insert_id, *S_checkpoint, *S_flush, *S_latest;
static PyObject *S_mode, *S_txn, *S_trigger_tables, *S_catalog;
static PyObject *S_locks, *S_ddl_epoch;

typedef struct {
    int kind;          /* 0=const 1=param 2=auto 3=none */
    int payload;       /* param index / auto offset */
    PyObject *konst;   /* owned; kind 0 only */
} Bind;

typedef struct {
    int npos;
    int pos[ICTX_MAXPOS];
    int unique;
    PyObject *idx;     /* SortedKeyIndex, owned */
} SecD;

typedef struct {
    PyObject *rowdesc;       /* RowDesc capsule, owned */
    PyObject *table, *mgr, *db;
    PyObject *colsdict, *name0, *col0;   /* staleness probe */
    PyObject *ct_obj;        /* mgr._commit_ts ndarray */
    int64_t *ct_ptr;
    Py_ssize_t ct_len;
    PyObject *latest;        /* UNUSED slot: table.latest is fetched per
                                call (vacuum REBINDS the dict in place of
                                compacting it; a cached ref would go
                                stale silently) */
    int ncols;
    Bind binds[ICTX_MAXCOLS];
    PyObject *blob;          /* record schema blob bytes */
    PyObject *pack_fb;       /* python fallback: callable(vals_tuple)->bytes */
    int nsec;
    SecD sec[ICTX_MAXSEC];
    long table_id;
    long ckpt;
    PyObject *cv_exc;        /* ConstraintViolation class */
    PyObject *nn_prefix;     /* "NOT NULL constraint violated: t." */
    PyObject *colnames;      /* tuple of str */
    int n_auto;              /* number of auto-increment binds */
    long ft_insert, ft_commit;   /* FrameType codes (wal.py enum) */
    /* self-check extras (may be NULL for legacy 22-item specs): the
       caller-side guards (mode=="rw", no open txn, no triggers, catalog
       unchanged) run in C so the Python wrapper is just the call */
    PyObject *info, *schema, *tname;
} ICtx;

static void ictx_free(PyObject *cap) {
    ICtx *c = (ICtx *)PyCapsule_GetPointer(cap, "turdb.InsertCtx");
    if (!c) return;
    Py_XDECREF(c->rowdesc);
    Py_XDECREF(c->table); Py_XDECREF(c->mgr); Py_XDECREF(c->db);
    Py_XDECREF(c->colsdict); Py_XDECREF(c->name0); Py_XDECREF(c->col0);
    Py_XDECREF(c->ct_obj); Py_XDECREF(c->latest);
    for (int i = 0; i < c->ncols; i++) Py_XDECREF(c->binds[i].konst);
    Py_XDECREF(c->blob); Py_XDECREF(c->pack_fb);
    for (int j = 0; j < c->nsec; j++) Py_XDECREF(c->sec[j].idx);
    Py_XDECREF(c->cv_exc); Py_XDECREF(c->nn_prefix); Py_XDECREF(c->colnames);
    Py_XDECREF(c->info); Py_XDECREF(c->schema); Py_XDECREF(c->tname);
    PyMem_Free(c);
}

/* make_insert_ctx(spec_tuple) — spec layout (all positional):
   (rowdesc, table, mgr, db, colsdict, name0, ct_obj, ct_addr, ct_len,
    latest, binds, blob, pack_fb, sec, table_id, ckpt, cv_exc, nn_prefix,
    colnames, n_auto, ft_insert, ft_commit)
   binds: tuple of (kind, payload, const_or_None)
   sec:   tuple of (index_obj, pos_tuple, unique_int) */
static PyObject *py_make_insert_ctx(PyObject *self, PyObject *args) {
    PyObject *spec;
    if (!PyArg_ParseTuple(args, "O", &spec)) return NULL;
    if (!PyTuple_Check(spec) || PyTuple_GET_SIZE(spec) != 25) {
        PyErr_SetString(PyExc_ValueError, "bad ctx spec");
        return NULL;
    }
    ICtx *c = (ICtx *)PyMem_Calloc(1, sizeof(ICtx));
    if (!c) return PyErr_NoMemory();
#define TAKE(field, i) do { c->field = PyTuple_GET_ITEM(spec, i); \
        Py_INCREF(c->field); } while (0)
    TAKE(rowdesc, 0); TAKE(table, 1); TAKE(mgr, 2); TAKE(db, 3);
    TAKE(colsdict, 4); TAKE(name0, 5); TAKE(ct_obj, 6);
    c->col0 = PyDict_GetItem(c->colsdict, c->name0);   /* pin: staleness
        probe compares against the column array CURRENT at build time */
    if (!c->col0) goto bad;
    Py_INCREF(c->col0);
    c->ct_ptr = (int64_t *)(uintptr_t)PyLong_AsUnsignedLongLong(
        PyTuple_GET_ITEM(spec, 7));
    c->ct_len = PyLong_AsSsize_t(PyTuple_GET_ITEM(spec, 8));
    TAKE(latest, 9);
    PyObject *binds = PyTuple_GET_ITEM(spec, 10);
    Py_ssize_t nb = PyTuple_GET_SIZE(binds);
    if (nb > ICTX_MAXCOLS) goto bad;
    c->ncols = (int)nb;
    for (Py_ssize_t i = 0; i < nb; i++) {
        PyObject *b = PyTuple_GET_ITEM(binds, i);
        c->binds[i].kind = (int)PyLong_AsLong(PyTuple_GET_ITEM(b, 0));
        c->binds[i].payload = (int)PyLong_AsLong(PyTuple_GET_ITEM(b, 1));
        c->binds[i].konst = PyTuple_GET_ITEM(b, 2);
        Py_INCREF(c->binds[i].konst);
    }
    TAKE(blob, 11); TAKE(pack_fb, 12);
    {
        PyObject *sec = PyTuple_GET_ITEM(spec, 13);
        Py_ssize_t ns = PyTuple_GET_SIZE(sec);
        if (ns > ICTX_MAXSEC) goto bad;
        c->nsec = (int)ns;
        for (Py_ssize_t j = 0; j < ns; j++) {
            PyObject *s = PyTuple_GET_ITEM(sec, j);
            c->sec[j].idx = PyTuple_GET_ITEM(s, 0);
            Py_INCREF(c->sec[j].idx);
            PyObject *pos = PyTuple_GET_ITEM(s, 1);
            Py_ssize_t np = PyTuple_GET_SIZE(pos);
            if (np > ICTX_MAXPOS) goto bad;
            c->sec[j].npos = (int)np;
            for (Py_ssize_t p = 0; p < np; p++)
                c->sec[j].pos[p] =
                    (int)PyLong_AsLong(PyTuple_GET_ITEM(pos, p));
            c->sec[j].unique =
                (int)PyLong_AsLong(PyTuple_GET_ITEM(s, 2));
        }
    }
    c->table_id = PyLong_AsLong(PyTuple_GET_ITEM(spec, 14));
    c->ckpt = PyLong_AsLong(PyTuple_GET_ITEM(spec, 15));
    TAKE(cv_exc, 16); TAKE(nn_prefix, 17); TAKE(colnames, 18);
    c->n_auto = (int)PyLong_AsLong(PyTuple_GET_ITEM(spec, 19));
    c->ft_insert = PyLong_AsLong(PyTuple_GET_ITEM(spec, 20));
    c->ft_commit = PyLong_AsLong(PyTuple_GET_ITEM(spec, 21));
    TAKE(info, 22); TAKE(schema, 23); TAKE(tname, 24);
#undef TAKE
    if (PyErr_Occurred()) goto bad;
    return PyCapsule_New(c, "turdb.InsertCtx", ictx_free);
bad:
    {
        PyObject *cap = PyCapsule_New(c, "turdb.InsertCtx", ictx_free);
        Py_XDECREF(cap);
    }
    if (!PyErr_Occurred())
        PyErr_SetString(PyExc_ValueError, "bad ctx spec");
    return NULL;
}

static int64_t attr_ll(PyObject *o, PyObject *name, int *err) {
    PyObject *v = PyObject_GetAttr(o, name);
    if (!v) { *err = 1; return 0; }
    int64_t r = PyLong_AsLongLong(v);
    Py_DECREF(v);
    if (r == -1 && PyErr_Occurred()) { *err = 1; return 0; }
    return r;
}

static int attr_set_ll(PyObject *o, PyObject *name, int64_t v) {
    PyObject *pv = PyLong_FromLongLong(v);
    if (!pv) return -1;
    int rc = PyObject_SetAttr(o, name, pv);
    Py_DECREF(pv);
    return rc;
}

static int attr_truthy(PyObject *o, PyObject *name, int *err) {
    PyObject *v = PyObject_GetAttr(o, name);
    if (!v) { *err = 1; return 0; }
    int r = PyObject_IsTrue(v);
    Py_DECREF(v);
    if (r < 0) { *err = 1; return 0; }
    return r;
}

/* validate values against the descriptor; 0 ok, >0 type-bail col,
   <0 NOT NULL violation col (1-based), writes coerced scalars to tmp */
typedef union { int64_t i; double f; } ValTmp;

static int validate_vals(RowDesc *d, PyObject *const *vals, ValTmp *tmp) {
    for (int i = 0; i < d->n; i++) {
        PyObject *v = vals[i];
        ColD *c = &d->cols[i];
        if (v == Py_None) {
            if (!c->nullable) return -(i + 1);
            continue;
        }
        switch (c->sc) {
        case 0: {
            if (!PyLong_CheckExact(v)) return i + 1;
            int ovf = 0;
            tmp[i].i = PyLong_AsLongLongAndOverflow(v, &ovf);
            if (ovf) return i + 1;
            break;
        }
        case 1:
        case 2: {
            if (PyFloat_CheckExact(v)) tmp[i].f = PyFloat_AS_DOUBLE(v);
            else if (PyLong_CheckExact(v)) {
                int ovf = 0;
                int64_t iv = PyLong_AsLongLongAndOverflow(v, &ovf);
                if (ovf) return i + 1;
                tmp[i].f = (double)iv;
            } else return i + 1;
            break;
        }
        case 3:
            if (!PyBool_Check(v)) return i + 1;
            break;
        case 4:
            if (!PyUnicode_CheckExact(v)) return i + 1;
            if (c->max_len >= 0 && PyUnicode_GET_LENGTH(v) > c->max_len)
                return i + 1;
            break;
        case 5:
            if (!PyBytes_CheckExact(v)) return i + 1;
            if (c->max_len >= 0 && PyBytes_GET_SIZE(v) > c->max_len)
                return i + 1;
            break;
        default:
            return i + 1;
        }
    }
    return 0;
}

static void write_vals(RowDesc *d, int64_t vi, int64_t rid, int64_t tid,
                       PyObject *const *vals, const ValTmp *tmp) {
    for (int i = 0; i < d->n; i++) {
        PyObject *v = vals[i];
        ColD *c = &d->cols[i];
        if (v == Py_None) { c->null[vi] = 1; continue; }
        c->null[vi] = 0;
        switch (c->sc) {
        case 0: ((int64_t *)c->col)[vi] = tmp[i].i; break;
        case 1: ((double *)c->col)[vi] = tmp[i].f; break;
        case 2: ((float *)c->col)[vi] = (float)tmp[i].f; break;
        case 3: ((uint8_t *)c->col)[vi] = (v == Py_True); break;
        case 4:
        case 5: {
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
}

/* pack a record from a raw values array; returns new PyBytes, Py_None
   (python fallback needed), or NULL on error */
static PyObject *pack_record_from(const uint8_t *schema, Py_ssize_t slen,
                                  PyObject *const *vals, Py_ssize_t nvals) {
    if (slen < 10) { Py_RETURN_NONE; }
    uint16_t n, bitmap_len, nvar;
    uint32_t fixed_len;
    memcpy(&n, schema, 2);
    memcpy(&bitmap_len, schema + 2, 2);
    memcpy(&fixed_len, schema + 4, 4);
    memcpy(&nvar, schema + 8, 2);
    const uint8_t *cols = schema + 10;
    if (slen != 10 + 5 * (Py_ssize_t)n || nvals != n) Py_RETURN_NONE;
    Py_ssize_t var_total = 0;
    for (uint16_t i = 0; i < n; i++) {
        PyObject *v = vals[i];
        uint8_t sc = cols[5 * i];
        if (v == Py_None) continue;
        if (sc == 255) Py_RETURN_NONE;
        if (sc == 4) {
            if (!PyUnicode_Check(v)) Py_RETURN_NONE;
            Py_ssize_t l;
            if (!PyUnicode_AsUTF8AndSize(v, &l)) return NULL;
            var_total += l;
        } else if (sc == 5) {
            if (!PyBytes_Check(v)) Py_RETURN_NONE;
            var_total += PyBytes_GET_SIZE(v);
        } else if (sc <= 3) {
            if (!(PyLong_Check(v) || PyFloat_Check(v) || PyBool_Check(v)))
                Py_RETURN_NONE;
        } else Py_RETURN_NONE;
    }
    Py_ssize_t total = 2 + bitmap_len + fixed_len + 4 * (nvar + 1) + var_total;
    PyObject *out = PyBytes_FromStringAndSize(NULL, total);
    if (!out) return NULL;
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
        PyObject *v = vals[i];
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
        case 0: {
            int64_t iv;
            if (PyBool_Check(v)) iv = (v == Py_True);
            else if (PyLong_Check(v)) {
                int ovf = 0;
                iv = PyLong_AsLongLongAndOverflow(v, &ovf);
                if (ovf) { Py_DECREF(out);
                    PyErr_SetString(PyExc_OverflowError, "int too big");
                    return NULL; }
            } else iv = (int64_t)PyFloat_AS_DOUBLE(v);
            memcpy(fixed + foff, &iv, 8);
            break;
        }
        case 1: {
            double dd = PyFloat_Check(v) ? PyFloat_AS_DOUBLE(v)
                                         : (double)PyLong_AsLongLong(v);
            memcpy(fixed + foff, &dd, 8);
            break;
        }
        case 2: {
            float dd = PyFloat_Check(v) ? (float)PyFloat_AS_DOUBLE(v)
                                        : (float)PyLong_AsLongLong(v);
            memcpy(fixed + foff, &dd, 4);
            break;
        }
        case 3:
            fixed[foff] = PyObject_IsTrue(v) ? 1 : 0;
            break;
        case 4: {
            Py_ssize_t l;
            const char *s = PyUnicode_AsUTF8AndSize(v, &l);
            memcpy(payload + pos, s, l);
            pos += (uint32_t)l;
            break;
        }
        case 5:
            memcpy(payload + pos, PyBytes_AS_STRING(v),
                   PyBytes_GET_SIZE(v));
            pos += (uint32_t)PyBytes_GET_SIZE(v);
            break;
        }
    }
    {
        uint32_t p2 = 0;
        for (uint16_t i = 0; i < n; i++) {
            uint8_t sc = cols[5 * i];
            int16_t vidx;
            memcpy(&vidx, cols + 5 * i + 3, 2);
            if (vidx < 0) continue;
            PyObject *v = vals[i];
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
    return out;
}

/* per-index fetched containers (fetched fresh per call: _flush and
   bulk_load REBIND the attribute objects, so cached refs would go
   stale) */
typedef struct {
    PyObject *delta, *dbk, *count, *single, *deleted;
} SecLive;

static void sec_live_clear(SecLive *s, int n) {
    for (int j = 0; j < n; j++) {
        Py_XDECREF(s[j].delta); Py_XDECREF(s[j].dbk);
        Py_XDECREF(s[j].count); Py_XDECREF(s[j].single);
        Py_XDECREF(s[j].deleted);
    }
}

/* insert one (key, rid) entry into a SortedKeyIndex's delta structures
   (mirrors SortedKeyIndex.insert minus the threshold flush — callers
   pre-check the delta size and bail to the generic path near the
   threshold). 0 ok, -1 error with exception set. */
static int sec_insert_entry(SecLive *lv, PyObject *key,
                            PyObject *rid_long) {
    if (PySet_GET_SIZE(lv->deleted)) {
        PyObject *tp = PyTuple_Pack(2, key, rid_long);
        if (!tp) return -1;
        PySet_Discard(lv->deleted, tp);
        Py_DECREF(tp);
        PyErr_Clear();
    }
    {
        PyObject *tp = PyTuple_Pack(2, key, rid_long);
        if (!tp) return -1;
        int arc = PyList_Append(lv->delta, tp);
        Py_DECREF(tp);
        if (arc) return -1;
    }
    {
        PyObject *cur = PyDict_GetItemWithError(lv->dbk, key);
        if (!cur && PyErr_Occurred()) return -1;
        if (!cur) {
            if (PyDict_SetItem(lv->dbk, key, rid_long)) return -1;
        } else if (PyLong_CheckExact(cur)) {
            PyObject *nl = PyList_New(2);
            if (!nl) return -1;
            Py_INCREF(cur);
            PyList_SET_ITEM(nl, 0, cur);
            Py_INCREF(rid_long);
            PyList_SET_ITEM(nl, 1, rid_long);
            int src = PyDict_SetItem(lv->dbk, key, nl);
            Py_DECREF(nl);
            if (src) return -1;
        } else {
            if (PyList_Append(cur, rid_long)) return -1;
        }
    }
    if (lv->count != Py_None) {
        PyObject *cv = PyDict_GetItemWithError(lv->count, key);
        if (!cv && PyErr_Occurred()) return -1;
        long n = cv ? PyLong_AsLong(cv) + 1 : 1;
        PyObject *nv = PyLong_FromLong(n);
        if (!nv) return -1;
        int src = PyDict_SetItem(lv->count, key, nv);
        Py_DECREF(nv);
        if (src) return -1;
        if (n == 1) {
            if (PyDict_SetItem(lv->single, key, rid_long)) return -1;
        } else if (n == 2) {
            if (PyDict_GetItem(lv->single, key) &&
                PyDict_DelItem(lv->single, key))
                return -1;
        }
    }
    return 0;
}

/* exec_insert(ctx, params) ->
     rowid int >= 0   success
     None             bail to the generic path
     -1               table capacity: caller _ensure()s then rebuilds ctx
     -2               commit-log capacity: caller _ensure()s + rebuilds
     -3               stale arrays: caller rebuilds ctx
   raises ConstraintViolation on NOT NULL; propagates WAL errors after
   marking the txn aborted. */
static PyObject *py_exec_insert(PyObject *self, PyObject *const *args,
                                Py_ssize_t nargs) {
    if (nargs != 2) {
        PyErr_SetString(PyExc_TypeError, "exec_insert(ctx, params)");
        return NULL;
    }
    ICtx *c = (ICtx *)PyCapsule_GetPointer(args[0], "turdb.InsertCtx");
    if (!c) return NULL;
    PyObject *params = args[1];
    if (!PyList_CheckExact(params)) Py_RETURN_NONE;
    Py_ssize_t nparams = PyList_GET_SIZE(params);

    /* caller-side guards (mode, open txn, triggers, catalog identity) —
       run here so the Python wrapper is just this one call */
    if (c->info) {
        PyObject *mode = PyObject_GetAttr(c->db, S_mode);
        if (!mode) return NULL;
        int ok = PyUnicode_Check(mode) &&
                 PyUnicode_CompareWithASCIIString(mode, "rw") == 0;
        Py_DECREF(mode);
        if (!ok) Py_RETURN_NONE;
        PyObject *txn = PyObject_GetAttr(c->db, S_txn);
        if (!txn) return NULL;
        int has_txn = (txn != Py_None);
        Py_DECREF(txn);
        if (has_txn) Py_RETURN_NONE;
        PyObject *tt = PyObject_GetAttr(c->db, S_trigger_tables);
        if (!tt) return NULL;
        int trig = PySequence_Contains(tt, c->tname);
        Py_DECREF(tt);
        if (trig < 0) return NULL;
        if (trig) Py_RETURN_NONE;
        PyObject *cat = PyObject_GetAttr(c->db, S_catalog);
        if (!cat) return NULL;
        PyObject *sch = PyDict_Check(cat)
            ? PyDict_GetItem(cat, c->schema) : NULL;
        PyObject *liv = (sch && PyDict_Check(sch))
            ? PyDict_GetItem(sch, c->tname) : NULL;
        Py_DECREF(cat);
        if (liv != c->info) Py_RETURN_NONE;   /* DDL since prepare */
    }

    /* staleness probes */
    {
        PyObject *cur0 = PyDict_GetItem(c->colsdict, c->name0);
        if (cur0 != c->col0) return PyLong_FromLong(-3);
        PyObject *cta = PyObject_GetAttr(c->mgr, S_commit_ts);
        if (!cta) return NULL;
        int stale = (cta != c->ct_obj);
        Py_DECREF(cta);
        if (stale) return PyLong_FromLong(-3);
    }

    /* bind values */
    PyObject *vals[ICTX_MAXCOLS];
    PyObject *owned[ICTX_MAXCOLS];
    int nowned = 0;
    int64_t auto_base = 0;
    int auto_read = 0, err = 0;
    PyObject *keys[ICTX_MAXSEC];
    SecLive live[ICTX_MAXSEC];
    int nkeys = 0, nlive = 0;
    PyObject *rid_long = NULL;

    for (int i = 0; i < c->ncols; i++) {
        Bind *b = &c->binds[i];
        switch (b->kind) {
        case 0: vals[i] = b->konst; break;
        case 1:
            if (b->payload >= nparams) goto bail;
            vals[i] = PyList_GET_ITEM(params, b->payload);
            break;
        case 2: {
            if (!auto_read) {
                auto_base = attr_ll(c->table, S_auto_increment, &err);
                if (err) goto error;
                auto_read = 1;
            }
            PyObject *nv = PyLong_FromLongLong(auto_base + b->payload);
            if (!nv) goto error;
            owned[nowned++] = nv;
            vals[i] = nv;
            break;
        }
        default: vals[i] = Py_None; break;
        }
    }

    /* index deltas near flush threshold? generic path flushes */
    for (int j = 0; j < c->nsec; j++) {
        memset(&live[j], 0, sizeof(SecLive));
        live[j].delta = PyObject_GetAttr(c->sec[j].idx, S_delta);
        if (!live[j].delta) { nlive = j + 1; goto error; }
        live[j].dbk = PyObject_GetAttr(c->sec[j].idx, S_dbk);
        live[j].count = PyObject_GetAttr(c->sec[j].idx, S_count);
        live[j].single = PyObject_GetAttr(c->sec[j].idx, S_single);
        live[j].deleted = PyObject_GetAttr(c->sec[j].idx, S_deleted);
        nlive = j + 1;
        if (!live[j].dbk || !live[j].count || !live[j].single ||
            !live[j].deleted)
            goto error;
        if (!PyList_CheckExact(live[j].delta) ||
            PyList_GET_SIZE(live[j].delta) >= LSM_MERGE_THRESHOLD)
            goto bail;
    }

    /* encode keys + unique probes */
    for (int j = 0; j < c->nsec; j++) {
        SecD *s = &c->sec[j];
        Buf b = {(uint8_t *)PyMem_Malloc(64), 0, 64};
        if (!b.buf) { PyErr_NoMemory(); goto error; }
        for (int p = 0; p < s->npos; p++) {
            if (encode_one(&b, vals[s->pos[p]], 0)) {
                PyMem_Free(b.buf);
                if (PyErr_ExceptionMatches(PyExc_TypeError)) {
                    PyErr_Clear();
                    goto bail;
                }
                goto error;
            }
        }
        keys[j] = PyBytes_FromStringAndSize((char *)b.buf, b.len);
        PyMem_Free(b.buf);
        if (!keys[j]) goto error;
        nkeys = j + 1;
        if (s->unique && live[j].count != Py_None) {
            int all_nn = 1;
            for (int p = 0; p < s->npos; p++)
                if (vals[s->pos[p]] == Py_None) { all_nn = 0; break; }
            if (all_nn) {
                int hit = PyDict_Contains(live[j].count, keys[j]);
                if (hit < 0) goto error;
                if (hit) goto bail;
            }
        }
    }

    /* capacity + validation (NO mutation before this point) */
    {
        int64_t nversions = attr_ll(c->table, S_nversions, &err);
        if (err) goto error;
        int64_t capacity = attr_ll(c->table, S_capacity, &err);
        if (err) goto error;
        if (nversions + 1 > capacity) {
            sec_live_clear(live, nlive);
            for (int j = 0; j < nkeys; j++) Py_DECREF(keys[j]);
            for (int i = 0; i < nowned; i++) Py_DECREF(owned[i]);
            return PyLong_FromLong(-1);
        }
        RowDesc *d =
            (RowDesc *)PyCapsule_GetPointer(c->rowdesc, "turdb.RowDesc");
        if (!d) goto error;
        if (d->n != c->ncols) goto bail;
        ValTmp tmp[ICTX_MAXCOLS];
        int rc = validate_vals(d, vals, tmp);
        if (rc > 0) goto bail;
        if (rc < 0) {
            PyObject *cn = PyTuple_GET_ITEM(c->colnames, -rc - 1);
            PyObject *msg = PyUnicode_Concat(c->nn_prefix, cn);
            if (msg) {
                PyErr_SetObject(c->cv_exc, msg);
                Py_DECREF(msg);
            }
            goto error;
        }

        /* txn begin */
        int64_t tid = attr_ll(c->mgr, S_next_txn, &err);
        if (err) goto error;
        if (tid >= c->ct_len) {
            sec_live_clear(live, nlive);
            for (int j = 0; j < nkeys; j++) Py_DECREF(keys[j]);
            for (int i = 0; i < nowned; i++) Py_DECREF(owned[i]);
            return PyLong_FromLong(-2);
        }
        if (attr_set_ll(c->mgr, S_next_txn, tid + 1)) goto error;
        int64_t rid = attr_ll(c->table, S_next_rowid, &err);
        if (err) goto error;

        /* ---- point of no return: mutations begin ---- */
        write_vals(d, nversions, rid, tid, vals, tmp);
        if (attr_set_ll(c->table, S_next_rowid, rid + 1)) goto abort_err;
        if (auto_read) {
            if (attr_set_ll(c->db, S_last_insert_id,
                            auto_base + c->n_auto - 1) ||
                attr_set_ll(c->table, S_auto_increment,
                            auto_base + c->n_auto))
                goto abort_err;
        }
        rid_long = PyLong_FromLongLong(rid);
        if (!rid_long) goto abort_err;
        {
            PyObject *latest = PyObject_GetAttr(c->table, S_latest);
            if (!latest) goto abort_err;
            PyObject *vi_long = PyLong_FromLongLong(nversions);
            if (!vi_long) { Py_DECREF(latest); goto abort_err; }
            int src = PyDict_SetItem(latest, rid_long, vi_long);
            Py_DECREF(vi_long);
            Py_DECREF(latest);
            if (src) goto abort_err;
        }
        if (attr_set_ll(c->table, S_nversions, nversions + 1))
            goto abort_err;

        /* index inserts (mirrors SortedKeyIndex.insert) */
        for (int j = 0; j < c->nsec; j++) {
            if (sec_insert_entry(&live[j], keys[j], rid_long))
                goto abort_err;
        }

        /* WAL */
        int wal_on = attr_truthy(c->db, S_wal_enabled, &err);
        if (err) goto abort_err;
        int64_t fc = 0;
        if (wal_on) {
            int repl = attr_truthy(c->db, S_replaying, &err);
            if (err) goto abort_err;
            wal_on = !repl;
        }
        if (wal_on) {
            PyObject *rec = pack_record_from(
                (const uint8_t *)PyBytes_AS_STRING(c->blob),
                PyBytes_GET_SIZE(c->blob), vals, c->ncols);
            if (!rec) goto abort_err;
            if (rec == Py_None) {
                Py_DECREF(rec);
                PyObject *vt = PyTuple_New(c->ncols);
                if (!vt) goto abort_err;
                for (int i = 0; i < c->ncols; i++) {
                    Py_INCREF(vals[i]);
                    PyTuple_SET_ITEM(vt, i, vals[i]);
                }
                rec = PyObject_CallOneArg(c->pack_fb, vt);
                Py_DECREF(vt);
                if (!rec) goto abort_err;
                if (!PyBytes_CheckExact(rec)) {
                    Py_DECREF(rec);
                    PyErr_SetString(PyExc_TypeError, "pack fallback");
                    goto abort_err;
                }
            }
            Py_ssize_t rl = PyBytes_GET_SIZE(rec);
            Py_ssize_t plen = 8 + rl;
            PyObject *frames = PyBytes_FromStringAndSize(NULL,
                                                         32 + plen + 32);
            if (!frames) { Py_DECREF(rec); goto abort_err; }
            uint8_t *pb = (uint8_t *)PyBytes_AS_STRING(frames);
            uint8_t sbuf[4096];
            uint8_t *payload = plen <= (Py_ssize_t)sizeof(sbuf)
                ? sbuf : (uint8_t *)PyMem_Malloc(plen);
            if (!payload) {
                Py_DECREF(rec); Py_DECREF(frames);
                PyErr_NoMemory(); goto abort_err;
            }
            uint64_t rid_le = (uint64_t)rid;
            memcpy(payload, &rid_le, 8);
            memcpy(payload + 8, PyBytes_AS_STRING(rec), rl);
            Py_DECREF(rec);
            PyObject *w = PyObject_GetAttr(c->db, S_wal);
            if (!w || w == Py_None) {
                Py_XDECREF(w); Py_DECREF(frames);
                if (payload != sbuf) PyMem_Free(payload);
                if (!PyErr_Occurred())
                    PyErr_SetString(PyExc_RuntimeError, "wal missing");
                goto abort_err;
            }
            int64_t lsn = attr_ll(w, S_next_lsn, &err);
            if (err) {
                Py_DECREF(w); Py_DECREF(frames);
                if (payload != sbuf) PyMem_Free(payload);
                goto abort_err;
            }
            fill_frame(pb, (unsigned)c->ft_insert, (unsigned)c->table_id,
                       (uint64_t)lsn, (uint64_t)tid, payload, plen);
            fill_frame(pb + 32 + plen, (unsigned)c->ft_commit, 0,
                       (uint64_t)lsn + 1, (uint64_t)tid, NULL, 0);
            if (payload != sbuf) PyMem_Free(payload);
            PyObject *buffer = PyObject_GetAttr(w, S_buffer);
            int brc = buffer ? PyList_Append(buffer, frames) : -1;
            Py_XDECREF(buffer);
            Py_DECREF(frames);
            if (brc) { Py_DECREF(w); goto abort_err; }
            fc = attr_ll(w, S_frame_count, &err) + 2;
            if (err || attr_set_ll(w, S_next_lsn, lsn + 2) ||
                attr_set_ll(w, S_frame_count, fc)) {
                Py_DECREF(w);
                goto abort_err;
            }
            int af = attr_truthy(c->db, S_wal_autoflush, &err);
            if (err) { Py_DECREF(w); goto abort_err; }
            if (af) {
                PyObject *fr = PyObject_CallMethodNoArgs(w, S_flush);
                if (!fr) { Py_DECREF(w); goto abort_err; }
                Py_DECREF(fr);
            }
            Py_DECREF(w);
        }

        /* commit */
        int64_t nts = attr_ll(c->mgr, S_next_ts, &err) + 1;
        if (err) goto abort_err;
        c->ct_ptr[tid] = nts;
        if (attr_set_ll(c->mgr, S_next_ts, nts)) goto error;
        if (wal_on && fc >= c->ckpt) {
            PyObject *cr = PyObject_CallMethodNoArgs(c->db, S_checkpoint);
            if (!cr) goto error;   /* committed; propagate like python */
            Py_DECREF(cr);
        }
        sec_live_clear(live, nlive);
        for (int j = 0; j < nkeys; j++) Py_DECREF(keys[j]);
        for (int i = 0; i < nowned; i++) Py_DECREF(owned[i]);
        return rid_long;

    abort_err:
        c->ct_ptr[tid] = TS_ABORTED;
        goto error;
    }

bail:
    sec_live_clear(live, nlive);
    for (int j = 0; j < nkeys; j++) Py_DECREF(keys[j]);
    for (int i = 0; i < nowned; i++) Py_DECREF(owned[i]);
    Py_XDECREF(rid_long);
    Py_RETURN_NONE;
error:
    sec_live_clear(live, nlive);
    for (int j = 0; j < nkeys; j++) Py_DECREF(keys[j]);
    for (int i = 0; i < nowned; i++) Py_DECREF(owned[i]);
    Py_XDECREF(rid_long);
    return NULL;
}

/* ---- consolidated point-read lane ----------------------------------- *
 *
 * exec_point(ctx, params): the unique-key SELECT fast lane fully in C
 * (reference lib.rs:64 design target <1 us cached point reads). One
 * dict probe on the index's clean-single map, a scalar MVCC version
 * walk over the raw stamp arrays, key re-verification, and direct
 * column reads. Returns a list of row tuples, None to bail to the
 * Python lane, or -3 (catalog/arrays changed: caller rebuilds ctx). */

typedef struct {
    PyObject *db, *mgr, *table, *info, *schema, *tname;
    PyObject *colsdict, *name0, *col0;
    PyObject *ct_obj;
    int64_t *ct_ptr;
    Py_ssize_t ct_len;
    PyObject *rowdesc;       /* RowDesc over ALL table columns */
    PyObject *idx;           /* SortedKeyIndex (unique cover) */
    int nkey;
    int key_pos[ICTX_MAXPOS];
    Bind key_binds[ICTX_MAXPOS];
    int nout;
    int out_pos[ICTX_MAXCOLS];
} PCtx;

static void pctx_free(PyObject *cap) {
    PCtx *c = (PCtx *)PyCapsule_GetPointer(cap, "turdb.PointCtx");
    if (!c) return;
    Py_XDECREF(c->db); Py_XDECREF(c->mgr); Py_XDECREF(c->table);
    Py_XDECREF(c->info); Py_XDECREF(c->schema); Py_XDECREF(c->tname);
    Py_XDECREF(c->colsdict); Py_XDECREF(c->name0); Py_XDECREF(c->col0);
    Py_XDECREF(c->ct_obj); Py_XDECREF(c->rowdesc); Py_XDECREF(c->idx);
    for (int i = 0; i < c->nkey; i++) Py_XDECREF(c->key_binds[i].konst);
    PyMem_Free(c);
}

/* make_point_ctx((db, mgr, table, info, schema, tname, colsdict, name0,
                   ct_obj, ct_addr, ct_len, rowdesc, idx,
                   key_pos_tuple, key_binds_tuple, out_pos_tuple)) */
static PyObject *py_make_point_ctx(PyObject *self, PyObject *args) {
    PyObject *spec;
    if (!PyArg_ParseTuple(args, "O", &spec)) return NULL;
    if (!PyTuple_Check(spec) || PyTuple_GET_SIZE(spec) != 16) {
        PyErr_SetString(PyExc_ValueError, "bad point ctx spec");
        return NULL;
    }
    PCtx *c = (PCtx *)PyMem_Calloc(1, sizeof(PCtx));
    if (!c) return PyErr_NoMemory();
#define TAKE(field, i) do { c->field = PyTuple_GET_ITEM(spec, i); \
        Py_INCREF(c->field); } while (0)
    TAKE(db, 0); TAKE(mgr, 1); TAKE(table, 2); TAKE(info, 3);
    TAKE(schema, 4); TAKE(tname, 5); TAKE(colsdict, 6); TAKE(name0, 7);
    TAKE(ct_obj, 8);
    c->ct_ptr = (int64_t *)(uintptr_t)PyLong_AsUnsignedLongLong(
        PyTuple_GET_ITEM(spec, 9));
    c->ct_len = PyLong_AsSsize_t(PyTuple_GET_ITEM(spec, 10));
    TAKE(rowdesc, 11); TAKE(idx, 12);
    c->col0 = PyDict_GetItem(c->colsdict, c->name0);
    if (!c->col0) goto bad;
    Py_INCREF(c->col0);
    {
        PyObject *kp = PyTuple_GET_ITEM(spec, 13);
        PyObject *kb = PyTuple_GET_ITEM(spec, 14);
        Py_ssize_t nk = PyTuple_GET_SIZE(kp);
        if (nk > ICTX_MAXPOS || nk != PyTuple_GET_SIZE(kb)) goto bad;
        c->nkey = (int)nk;
        for (Py_ssize_t i = 0; i < nk; i++) {
            c->key_pos[i] = (int)PyLong_AsLong(PyTuple_GET_ITEM(kp, i));
            PyObject *b = PyTuple_GET_ITEM(kb, i);
            c->key_binds[i].kind =
                (int)PyLong_AsLong(PyTuple_GET_ITEM(b, 0));
            c->key_binds[i].payload =
                (int)PyLong_AsLong(PyTuple_GET_ITEM(b, 1));
            c->key_binds[i].konst = PyTuple_GET_ITEM(b, 2);
            Py_INCREF(c->key_binds[i].konst);
        }
        PyObject *op = PyTuple_GET_ITEM(spec, 15);
        Py_ssize_t no = PyTuple_GET_SIZE(op);
        if (no > ICTX_MAXCOLS) goto bad;
        c->nout = (int)no;
        for (Py_ssize_t i = 0; i < no; i++)
            c->out_pos[i] = (int)PyLong_AsLong(PyTuple_GET_ITEM(op, i));
    }
#undef TAKE
    if (PyErr_Occurred()) goto bad;
    return PyCapsule_New(c, "turdb.PointCtx", pctx_free);
bad:
    {
        PyObject *cap = PyCapsule_New(c, "turdb.PointCtx", pctx_free);
        Py_XDECREF(cap);
    }
    if (!PyErr_Occurred())
        PyErr_SetString(PyExc_ValueError, "bad point ctx spec");
    return NULL;
}

static PyObject *py_exec_point(PyObject *self, PyObject *const *args,
                               Py_ssize_t nargs) {
    if (nargs != 2) {
        PyErr_SetString(PyExc_TypeError, "exec_point(ctx, params)");
        return NULL;
    }
    PCtx *c = (PCtx *)PyCapsule_GetPointer(args[0], "turdb.PointCtx");
    if (!c) return NULL;
    PyObject *params = args[1];
    if (!PyList_CheckExact(params)) Py_RETURN_NONE;
    Py_ssize_t nparams = PyList_GET_SIZE(params);

    /* guards: open txn -> python lane (its read_ts); catalog identity */
    {
        PyObject *txn = PyObject_GetAttr(c->db, S_txn);
        if (!txn) return NULL;
        int has_txn = (txn != Py_None);
        Py_DECREF(txn);
        if (has_txn) Py_RETURN_NONE;
        PyObject *cat = PyObject_GetAttr(c->db, S_catalog);
        if (!cat) return NULL;
        PyObject *sch = PyDict_Check(cat)
            ? PyDict_GetItem(cat, c->schema) : NULL;
        PyObject *liv = (sch && PyDict_Check(sch))
            ? PyDict_GetItem(sch, c->tname) : NULL;
        Py_DECREF(cat);
        if (liv != c->info) return PyLong_FromLong(-3);
        PyObject *cur0 = PyDict_GetItem(c->colsdict, c->name0);
        if (cur0 != c->col0) return PyLong_FromLong(-3);
        PyObject *cta = PyObject_GetAttr(c->mgr, S_commit_ts);
        if (!cta) return NULL;
        int stale = (cta != c->ct_obj);
        Py_DECREF(cta);
        if (stale) return PyLong_FromLong(-3);
    }

    /* bind + encode the key */
    PyObject *kvals[ICTX_MAXPOS];
    for (int i = 0; i < c->nkey; i++) {
        Bind *b = &c->key_binds[i];
        PyObject *v;
        if (b->kind == 1) {
            if (b->payload >= nparams) Py_RETURN_NONE;
            v = PyList_GET_ITEM(params, b->payload);
        } else {
            v = b->konst;
        }
        if (v == Py_None) return PyList_New(0);   /* NULL never matches */
        kvals[i] = v;
    }
    PyObject *key;
    {
        Buf b = {(uint8_t *)PyMem_Malloc(64), 0, 64};
        if (!b.buf) return PyErr_NoMemory();
        for (int i = 0; i < c->nkey; i++) {
            if (encode_one(&b, kvals[i], 0)) {
                PyMem_Free(b.buf);
                if (PyErr_ExceptionMatches(PyExc_TypeError)) {
                    PyErr_Clear();
                    Py_RETURN_NONE;
                }
                return NULL;
            }
        }
        key = PyBytes_FromStringAndSize((char *)b.buf, b.len);
        PyMem_Free(b.buf);
        if (!key) return NULL;
    }

    /* clean-single probe; absent-from-count = no entries at all */
    int64_t rid;
    {
        PyObject *single = PyObject_GetAttr(c->idx, S_single);
        if (!single) { Py_DECREF(key); return NULL; }
        PyObject *r = (single != Py_None)
            ? PyDict_GetItem(single, key) : NULL;
        Py_DECREF(single);
        if (r) {
            rid = PyLong_AsLongLong(r);
            if (rid == -1 && PyErr_Occurred()) {
                Py_DECREF(key);
                return NULL;
            }
        } else {
            PyObject *count = PyObject_GetAttr(c->idx, S_count);
            if (!count) { Py_DECREF(key); return NULL; }
            int any = (count != Py_None)
                ? PyDict_Contains(count, key) : -1;
            Py_DECREF(count);
            Py_DECREF(key);
            if (any < 0) {
                PyErr_Clear();
                Py_RETURN_NONE;
            }
            if (any == 0) return PyList_New(0);
            Py_RETURN_NONE;      /* ambiguous: python full probe */
        }
        Py_DECREF(key);
    }

    /* MVCC version walk (mirror of visible_version + visible_one) */
    RowDesc *d = (RowDesc *)PyCapsule_GetPointer(c->rowdesc, "turdb.RowDesc");
    if (!d) return NULL;
    int err = 0;
    int64_t read_ts = attr_ll(c->mgr, S_next_ts, &err);
    if (err) return NULL;
    int64_t vi = -1;
    {
        PyObject *latest = PyObject_GetAttr(c->table, S_latest);
        if (!latest) return NULL;
        PyObject *rk = PyLong_FromLongLong(rid);
        if (!rk) { Py_DECREF(latest); return NULL; }
        PyObject *vv = PyDict_GetItem(latest, rk);
        Py_DECREF(rk);
        Py_DECREF(latest);
        if (!vv) return PyList_New(0);
        vi = PyLong_AsLongLong(vv);
        if (vi == -1 && PyErr_Occurred()) return NULL;
    }
    while (vi >= 0) {
        int64_t xmin = d->xmin[vi], xmax = d->xmax[vi];
        if (xmin < 0 || xmin >= c->ct_len ||
            (xmax > 0 && xmax >= c->ct_len))
            Py_RETURN_NONE;      /* out-of-range stamp: python lane */
        int visible = (c->ct_ptr[xmin] <= read_ts) &&
                      !(xmax > 0 && c->ct_ptr[xmax] <= read_ts);
        if (visible) break;
        vi = d->prev[vi];
    }
    if (vi < 0) return PyList_New(0);

    /* index entries persist until vacuum: re-verify the key columns */
    for (int i = 0; i < c->nkey; i++) {
        int p = c->key_pos[i];
        ColD *cd = &d->cols[p];
        if (cd->null[vi]) return PyList_New(0);
        PyObject *want = kvals[i];
        int ok = 0;
        switch (cd->sc) {
        case 0: {
            if (!PyLong_CheckExact(want)) Py_RETURN_NONE;
            int ovf = 0;
            int64_t w = PyLong_AsLongLongAndOverflow(want, &ovf);
            if (ovf) Py_RETURN_NONE;
            ok = (((int64_t *)cd->col)[vi] == w);
            break;
        }
        case 1:
        case 2: {
            double w;
            if (PyFloat_CheckExact(want)) w = PyFloat_AS_DOUBLE(want);
            else if (PyLong_CheckExact(want))
                w = (double)PyLong_AsLongLong(want);
            else Py_RETURN_NONE;
            double got = cd->sc == 1 ? ((double *)cd->col)[vi]
                                     : (double)((float *)cd->col)[vi];
            ok = (got == w);
            break;
        }
        case 3:
            if (!PyBool_Check(want)) Py_RETURN_NONE;
            ok = (((uint8_t *)cd->col)[vi] != 0) == (want == Py_True);
            break;
        case 4:
        case 5: {
            PyObject *got = ((PyObject **)cd->col)[vi];
            if (!got) Py_RETURN_NONE;
            int r = PyObject_RichCompareBool(got, want, Py_EQ);
            if (r < 0) return NULL;
            ok = r;
            break;
        }
        default:
            Py_RETURN_NONE;
        }
        if (!ok) return PyList_New(0);
    }

    /* build the row */
    PyObject *row = PyTuple_New(c->nout);
    if (!row) return NULL;
    for (int i = 0; i < c->nout; i++) {
        int p = c->out_pos[i];
        ColD *cd = &d->cols[p];
        PyObject *v;
        if (cd->null[vi]) {
            v = Py_None;
            Py_INCREF(v);
        } else {
            switch (cd->sc) {
            case 0:
                v = PyLong_FromLongLong(((int64_t *)cd->col)[vi]);
                break;
            case 1:
                v = PyFloat_FromDouble(((double *)cd->col)[vi]);
                break;
            case 2:
                v = PyFloat_FromDouble((double)((float *)cd->col)[vi]);
                break;
            case 3:
                v = PyBool_FromLong(((uint8_t *)cd->col)[vi]);
                break;
            case 4:
            case 5: {
                PyObject *got = ((PyObject **)cd->col)[vi];
                if (!got ||
                    !(PyUnicode_CheckExact(got) ||
                      PyBytes_CheckExact(got))) {
                    Py_DECREF(row);
                    Py_RETURN_NONE;   /* odd object: python _py path */
                }
                v = got;
                Py_INCREF(v);
                break;
            }
            default:
                Py_DECREF(row);
                Py_RETURN_NONE;
            }
            if (!v) { Py_DECREF(row); return NULL; }
        }
        PyTuple_SET_ITEM(row, i, v);
    }
    PyObject *out = PyList_New(1);
    if (!out) { Py_DECREF(row); return NULL; }
    PyList_SET_ITEM(out, 0, row);
    return out;
}

/* ---- consolidated prepared UPDATE/DELETE lanes ----------------------- *
 *
 * exec_dml(ctx, params): single-row prepared UPDATE/DELETE fully in C
 * (VERDICT r4 item #3: the reference ships dedicated update/delete
 * benches, tests/update_benchmark.rs / delete_benchmark.rs; the Python
 * fast lane peaked ~50k rows/s while the C insert lane did ~490k).
 * Shape: unique-key equality WHERE -> one clean-single probe, a scalar
 * MVCC visibility walk, key re-verification, then (UPDATE) append a new
 * version + stamp the old one's xmax, or (DELETE) stamp xmax alone,
 * plus WAL frame pair and autocommit. Index entries are added only for
 * indexes whose key actually CHANGED (entries are advisory — probes
 * re-verify against the table — and skipping same-key re-inserts keeps
 * the clean-single point-read map intact). Returns rows_affected
 * (0/1), None to bail to the generic path, or the insert lane's
 * maintenance codes (-1 capacity, -2 commit-log, -3 stale). */

typedef struct {
    PyObject *rowdesc, *table, *mgr, *db;
    PyObject *colsdict, *name0, *col0;
    PyObject *ct_obj;
    int64_t *ct_ptr;
    Py_ssize_t ct_len;
    PyObject *info, *schema, *tname;
    PyObject *blob, *pack_fb;
    PyObject *cv_exc, *nn_prefix, *colnames;
    PyObject *probe_idx;     /* unique SortedKeyIndex covering the WHERE */
    int nkey;
    int key_pos[ICTX_MAXPOS];
    Bind key_binds[ICTX_MAXPOS];
    int nset;
    int set_pos[ICTX_MAXCOLS];
    Bind set_binds[ICTX_MAXCOLS];
    int nsec;
    SecD sec[ICTX_MAXSEC];
    int sec_changed[ICTX_MAXSEC];   /* touches a SET column */
    long table_id, ckpt;
    long ft_dml, ft_commit;
    int is_delete;
    long epoch;        /* db.ddl_epoch at bind (FK-child eligibility
                          depends on OTHER tables' DDL, which leaves
                          this table's info identity unchanged) */
} DCtx;

static void dctx_free(PyObject *cap) {
    DCtx *c = (DCtx *)PyCapsule_GetPointer(cap, "turdb.DmlCtx");
    if (!c) return;
    Py_XDECREF(c->rowdesc); Py_XDECREF(c->table); Py_XDECREF(c->mgr);
    Py_XDECREF(c->db); Py_XDECREF(c->colsdict); Py_XDECREF(c->name0);
    Py_XDECREF(c->col0); Py_XDECREF(c->ct_obj);
    Py_XDECREF(c->info); Py_XDECREF(c->schema); Py_XDECREF(c->tname);
    Py_XDECREF(c->blob); Py_XDECREF(c->pack_fb);
    Py_XDECREF(c->cv_exc); Py_XDECREF(c->nn_prefix);
    Py_XDECREF(c->colnames); Py_XDECREF(c->probe_idx);
    for (int i = 0; i < c->nkey; i++) Py_XDECREF(c->key_binds[i].konst);
    for (int i = 0; i < c->nset; i++) Py_XDECREF(c->set_binds[i].konst);
    for (int j = 0; j < c->nsec; j++) Py_XDECREF(c->sec[j].idx);
    PyMem_Free(c);
}

/* make_dml_ctx(spec) — spec layout (28 items, positional):
   (rowdesc, table, mgr, db, colsdict, name0, ct_obj, ct_addr, ct_len,
    blob, pack_fb, sec, table_id, ckpt, cv_exc, nn_prefix, colnames,
    ft_dml, ft_commit, info, schema, tname, probe_idx, key_pos,
    key_binds, set_pos, set_binds, is_delete, ddl_epoch)
   sec: tuple of (index_obj, pos_tuple, unique_int, changed_int) */
static PyObject *py_make_dml_ctx(PyObject *self, PyObject *args) {
    PyObject *spec;
    if (!PyArg_ParseTuple(args, "O", &spec)) return NULL;
    if (!PyTuple_Check(spec) || PyTuple_GET_SIZE(spec) != 29) {
        PyErr_SetString(PyExc_ValueError, "bad dml ctx spec");
        return NULL;
    }
    DCtx *c = (DCtx *)PyMem_Calloc(1, sizeof(DCtx));
    if (!c) return PyErr_NoMemory();
#define TAKE(field, i) do { c->field = PyTuple_GET_ITEM(spec, i); \
        Py_INCREF(c->field); } while (0)
    TAKE(rowdesc, 0); TAKE(table, 1); TAKE(mgr, 2); TAKE(db, 3);
    TAKE(colsdict, 4); TAKE(name0, 5); TAKE(ct_obj, 6);
    c->col0 = PyDict_GetItem(c->colsdict, c->name0);
    if (!c->col0) goto bad;
    Py_INCREF(c->col0);
    c->ct_ptr = (int64_t *)(uintptr_t)PyLong_AsUnsignedLongLong(
        PyTuple_GET_ITEM(spec, 7));
    c->ct_len = PyLong_AsSsize_t(PyTuple_GET_ITEM(spec, 8));
    TAKE(blob, 9); TAKE(pack_fb, 10);
    {
        PyObject *sec = PyTuple_GET_ITEM(spec, 11);
        Py_ssize_t ns = PyTuple_GET_SIZE(sec);
        if (ns > ICTX_MAXSEC) goto bad;
        c->nsec = (int)ns;
        for (Py_ssize_t j = 0; j < ns; j++) {
            PyObject *s = PyTuple_GET_ITEM(sec, j);
            c->sec[j].idx = PyTuple_GET_ITEM(s, 0);
            Py_INCREF(c->sec[j].idx);
            PyObject *pos = PyTuple_GET_ITEM(s, 1);
            Py_ssize_t np = PyTuple_GET_SIZE(pos);
            if (np > ICTX_MAXPOS) goto bad;
            c->sec[j].npos = (int)np;
            for (Py_ssize_t p = 0; p < np; p++)
                c->sec[j].pos[p] =
                    (int)PyLong_AsLong(PyTuple_GET_ITEM(pos, p));
            c->sec[j].unique =
                (int)PyLong_AsLong(PyTuple_GET_ITEM(s, 2));
            c->sec_changed[j] =
                (int)PyLong_AsLong(PyTuple_GET_ITEM(s, 3));
        }
    }
    c->table_id = PyLong_AsLong(PyTuple_GET_ITEM(spec, 12));
    c->ckpt = PyLong_AsLong(PyTuple_GET_ITEM(spec, 13));
    TAKE(cv_exc, 14); TAKE(nn_prefix, 15); TAKE(colnames, 16);
    c->ft_dml = PyLong_AsLong(PyTuple_GET_ITEM(spec, 17));
    c->ft_commit = PyLong_AsLong(PyTuple_GET_ITEM(spec, 18));
    TAKE(info, 19); TAKE(schema, 20); TAKE(tname, 21);
    TAKE(probe_idx, 22);
    {
        PyObject *kp = PyTuple_GET_ITEM(spec, 23);
        PyObject *kb = PyTuple_GET_ITEM(spec, 24);
        Py_ssize_t nk = PyTuple_GET_SIZE(kp);
        if (nk > ICTX_MAXPOS || nk != PyTuple_GET_SIZE(kb)) goto bad;
        c->nkey = (int)nk;
        for (Py_ssize_t i = 0; i < nk; i++) {
            c->key_pos[i] = (int)PyLong_AsLong(PyTuple_GET_ITEM(kp, i));
            PyObject *b = PyTuple_GET_ITEM(kb, i);
            c->key_binds[i].kind =
                (int)PyLong_AsLong(PyTuple_GET_ITEM(b, 0));
            c->key_binds[i].payload =
                (int)PyLong_AsLong(PyTuple_GET_ITEM(b, 1));
            c->key_binds[i].konst = PyTuple_GET_ITEM(b, 2);
            Py_INCREF(c->key_binds[i].konst);
        }
        PyObject *sp = PyTuple_GET_ITEM(spec, 25);
        PyObject *sb = PyTuple_GET_ITEM(spec, 26);
        Py_ssize_t nst = PyTuple_GET_SIZE(sp);
        if (nst > ICTX_MAXCOLS || nst != PyTuple_GET_SIZE(sb)) goto bad;
        c->nset = (int)nst;
        for (Py_ssize_t i = 0; i < nst; i++) {
            c->set_pos[i] = (int)PyLong_AsLong(PyTuple_GET_ITEM(sp, i));
            PyObject *b = PyTuple_GET_ITEM(sb, i);
            c->set_binds[i].kind =
                (int)PyLong_AsLong(PyTuple_GET_ITEM(b, 0));
            c->set_binds[i].payload =
                (int)PyLong_AsLong(PyTuple_GET_ITEM(b, 1));
            c->set_binds[i].konst = PyTuple_GET_ITEM(b, 2);
            Py_INCREF(c->set_binds[i].konst);
        }
    }
    c->is_delete = (int)PyLong_AsLong(PyTuple_GET_ITEM(spec, 27));
    c->epoch = PyLong_AsLong(PyTuple_GET_ITEM(spec, 28));
#undef TAKE
    if (PyErr_Occurred()) goto bad;
    return PyCapsule_New(c, "turdb.DmlCtx", dctx_free);
bad:
    {
        PyObject *cap = PyCapsule_New(c, "turdb.DmlCtx", dctx_free);
        Py_XDECREF(cap);
    }
    if (!PyErr_Occurred())
        PyErr_SetString(PyExc_ValueError, "bad dml ctx spec");
    return NULL;
}

/* read one column value at version vi as a NEW PyObject reference
   (None for SQL NULL); NULL return = unsupported slot (caller bails) */
static PyObject *col_read(ColD *cd, int64_t vi) {
    if (cd->null[vi]) Py_RETURN_NONE;
    switch (cd->sc) {
    case 0: return PyLong_FromLongLong(((int64_t *)cd->col)[vi]);
    case 1: return PyFloat_FromDouble(((double *)cd->col)[vi]);
    case 2: return PyFloat_FromDouble((double)((float *)cd->col)[vi]);
    case 3: return PyBool_FromLong(((uint8_t *)cd->col)[vi]);
    case 4:
    case 5: {
        PyObject *got = ((PyObject **)cd->col)[vi];
        if (!got) return NULL;
        Py_INCREF(got);
        return got;
    }
    default:
        return NULL;
    }
}

static PyObject *py_exec_dml(PyObject *self, PyObject *const *args,
                             Py_ssize_t nargs) {
    if (nargs != 2) {
        PyErr_SetString(PyExc_TypeError, "exec_dml(ctx, params)");
        return NULL;
    }
    DCtx *c = (DCtx *)PyCapsule_GetPointer(args[0], "turdb.DmlCtx");
    if (!c) return NULL;
    PyObject *params = args[1];
    if (!PyList_CheckExact(params)) Py_RETURN_NONE;
    Py_ssize_t nparams = PyList_GET_SIZE(params);

    /* guards: mode, open txn, triggers, catalog identity (like insert) */
    {
        PyObject *mode = PyObject_GetAttr(c->db, S_mode);
        if (!mode) return NULL;
        int ok = PyUnicode_Check(mode) &&
                 PyUnicode_CompareWithASCIIString(mode, "rw") == 0;
        Py_DECREF(mode);
        if (!ok) Py_RETURN_NONE;
        PyObject *txn = PyObject_GetAttr(c->db, S_txn);
        if (!txn) return NULL;
        int has_txn = (txn != Py_None);
        Py_DECREF(txn);
        if (has_txn) Py_RETURN_NONE;
        PyObject *tt = PyObject_GetAttr(c->db, S_trigger_tables);
        if (!tt) return NULL;
        int trig = PySequence_Contains(tt, c->tname);
        Py_DECREF(tt);
        if (trig < 0) return NULL;
        if (trig) Py_RETURN_NONE;
        PyObject *cat = PyObject_GetAttr(c->db, S_catalog);
        if (!cat) return NULL;
        PyObject *sch = PyDict_Check(cat)
            ? PyDict_GetItem(cat, c->schema) : NULL;
        PyObject *liv = (sch && PyDict_Check(sch))
            ? PyDict_GetItem(sch, c->tname) : NULL;
        Py_DECREF(cat);
        if (liv != c->info) return PyLong_FromLong(-3);
    }
    /* staleness probes */
    {
        int err0 = 0;
        int64_t ep = attr_ll(c->db, S_ddl_epoch, &err0);
        if (err0) return NULL;
        if (ep != c->epoch) return PyLong_FromLong(-3);
        PyObject *cur0 = PyDict_GetItem(c->colsdict, c->name0);
        if (cur0 != c->col0) return PyLong_FromLong(-3);
        PyObject *cta = PyObject_GetAttr(c->mgr, S_commit_ts);
        if (!cta) return NULL;
        int stale = (cta != c->ct_obj);
        Py_DECREF(cta);
        if (stale) return PyLong_FromLong(-3);
    }
    /* row locks held anywhere (FOR UPDATE from another handle's open
       txn) -> generic path decides conflict semantics */
    {
        PyObject *locks = PyObject_GetAttr(c->mgr, S_locks);
        if (!locks) return NULL;
        Py_ssize_t nl = PyDict_Check(locks) ? PyDict_GET_SIZE(locks) : 1;
        Py_DECREF(locks);
        if (nl) Py_RETURN_NONE;
    }

    /* bind + encode the probe key */
    PyObject *kvals[ICTX_MAXPOS];
    for (int i = 0; i < c->nkey; i++) {
        Bind *b = &c->key_binds[i];
        PyObject *v;
        if (b->kind == 1) {
            if (b->payload >= nparams) Py_RETURN_NONE;
            v = PyList_GET_ITEM(params, b->payload);
        } else {
            v = b->konst;
        }
        if (v == Py_None) return PyLong_FromLong(0);  /* NULL matches 0 */
        kvals[i] = v;
    }
    PyObject *key;
    {
        Buf b = {(uint8_t *)PyMem_Malloc(64), 0, 64};
        if (!b.buf) return PyErr_NoMemory();
        for (int i = 0; i < c->nkey; i++) {
            if (encode_one(&b, kvals[i], 0)) {
                PyMem_Free(b.buf);
                if (PyErr_ExceptionMatches(PyExc_TypeError)) {
                    PyErr_Clear();
                    Py_RETURN_NONE;
                }
                return NULL;
            }
        }
        key = PyBytes_FromStringAndSize((char *)b.buf, b.len);
        PyMem_Free(b.buf);
        if (!key) return NULL;
    }
    /* clean-single probe */
    int64_t rid;
    {
        PyObject *single = PyObject_GetAttr(c->probe_idx, S_single);
        if (!single) { Py_DECREF(key); return NULL; }
        PyObject *r = (single != Py_None)
            ? PyDict_GetItem(single, key) : NULL;
        Py_DECREF(single);
        if (r) {
            rid = PyLong_AsLongLong(r);
            if (rid == -1 && PyErr_Occurred()) { Py_DECREF(key);
                return NULL; }
            Py_DECREF(key);
        } else {
            PyObject *count = PyObject_GetAttr(c->probe_idx, S_count);
            if (!count) { Py_DECREF(key); return NULL; }
            int any = (count != Py_None)
                ? PyDict_Contains(count, key) : -1;
            Py_DECREF(count);
            Py_DECREF(key);
            if (any < 0) { PyErr_Clear(); Py_RETURN_NONE; }
            if (any == 0) return PyLong_FromLong(0);
            Py_RETURN_NONE;      /* ambiguous: python probe decides */
        }
    }

    /* MVCC: the visible version must be the chain head */
    RowDesc *d = (RowDesc *)PyCapsule_GetPointer(c->rowdesc,
                                                 "turdb.RowDesc");
    if (!d) return NULL;
    int err = 0;
    int64_t read_ts = attr_ll(c->mgr, S_next_ts, &err);
    if (err) return NULL;
    int64_t vi;
    PyObject *rid_long = PyLong_FromLongLong(rid);
    if (!rid_long) return NULL;
    {
        PyObject *latest = PyObject_GetAttr(c->table, S_latest);
        if (!latest) { Py_DECREF(rid_long); return NULL; }
        PyObject *vv = PyDict_GetItem(latest, rid_long);
        Py_DECREF(latest);
        if (!vv) { Py_DECREF(rid_long); return PyLong_FromLong(0); }
        vi = PyLong_AsLongLong(vv);
        if (vi == -1 && PyErr_Occurred()) { Py_DECREF(rid_long);
            return NULL; }
    }
    {
        int64_t xmin = d->xmin[vi], xmax = d->xmax[vi];
        if (xmin < 0 || xmin >= c->ct_len ||
            (xmax > 0 && xmax >= c->ct_len)) {
            Py_DECREF(rid_long);
            Py_RETURN_NONE;
        }
        int visible = (c->ct_ptr[xmin] <= read_ts) &&
                      !(xmax > 0 && c->ct_ptr[xmax] <= read_ts);
        if (!visible) {
            /* older version visible? then head is a concurrent write —
               generic path's conflict semantics must decide */
            int64_t w = d->prev[vi];
            while (w >= 0) {
                int64_t wx = d->xmin[w], wm = d->xmax[w];
                if (wx >= 0 && wx < c->ct_len &&
                    (wm <= 0 || wm < c->ct_len) &&
                    (c->ct_ptr[wx] <= read_ts) &&
                    !(wm > 0 && c->ct_ptr[wm] <= read_ts)) {
                    Py_DECREF(rid_long);
                    Py_RETURN_NONE;
                }
                w = d->prev[w];
            }
            Py_DECREF(rid_long);
            return PyLong_FromLong(0);
        }
        if (xmax != 0) {        /* stamped by an in-flight/stale txn */
            Py_DECREF(rid_long);
            Py_RETURN_NONE;
        }
    }
    /* index entries persist until vacuum: re-verify the key columns */
    for (int i = 0; i < c->nkey; i++) {
        int p = c->key_pos[i];
        ColD *cd = &d->cols[p];
        if (cd->null[vi]) { Py_DECREF(rid_long);
            return PyLong_FromLong(0); }
        PyObject *want = kvals[i];
        int ok = 0;
        switch (cd->sc) {
        case 0: {
            if (!PyLong_CheckExact(want)) { Py_DECREF(rid_long);
                Py_RETURN_NONE; }
            int ovf = 0;
            int64_t w = PyLong_AsLongLongAndOverflow(want, &ovf);
            if (ovf) { Py_DECREF(rid_long); Py_RETURN_NONE; }
            ok = (((int64_t *)cd->col)[vi] == w);
            break;
        }
        case 1:
        case 2: {
            double w;
            if (PyFloat_CheckExact(want)) w = PyFloat_AS_DOUBLE(want);
            else if (PyLong_CheckExact(want))
                w = (double)PyLong_AsLongLong(want);
            else { Py_DECREF(rid_long); Py_RETURN_NONE; }
            double got = cd->sc == 1 ? ((double *)cd->col)[vi]
                                     : (double)((float *)cd->col)[vi];
            ok = (got == w);
            break;
        }
        case 3:
            if (!PyBool_Check(want)) { Py_DECREF(rid_long);
                Py_RETURN_NONE; }
            ok = (((uint8_t *)cd->col)[vi] != 0) == (want == Py_True);
            break;
        case 4:
        case 5: {
            PyObject *got = ((PyObject **)cd->col)[vi];
            if (!got) { Py_DECREF(rid_long); Py_RETURN_NONE; }
            int r = PyObject_RichCompareBool(got, want, Py_EQ);
            if (r < 0) { Py_DECREF(rid_long); return NULL; }
            ok = r;
            break;
        }
        default:
            Py_DECREF(rid_long);
            Py_RETURN_NONE;
        }
        if (!ok) { Py_DECREF(rid_long); return PyLong_FromLong(0); }
    }

    /* ---------------- DELETE: stamp + WAL + commit -------------------- */
    if (c->is_delete) {
        int64_t tid = attr_ll(c->mgr, S_next_txn, &err);
        if (err) { Py_DECREF(rid_long); return NULL; }
        if (tid >= c->ct_len) { Py_DECREF(rid_long);
            return PyLong_FromLong(-2); }
        if (attr_set_ll(c->mgr, S_next_txn, tid + 1)) {
            Py_DECREF(rid_long); return NULL; }
        d->xmax[vi] = tid;
        int wal_on = attr_truthy(c->db, S_wal_enabled, &err);
        if (err) goto del_abort;
        if (wal_on) {
            int repl = attr_truthy(c->db, S_replaying, &err);
            if (err) goto del_abort;
            wal_on = !repl;
        }
        int64_t fc = 0;
        if (wal_on) {
            uint8_t payload[8];
            uint64_t rle = (uint64_t)rid;
            memcpy(payload, &rle, 8);
            PyObject *frames = PyBytes_FromStringAndSize(NULL, 32 + 8 + 32);
            if (!frames) goto del_abort;
            uint8_t *pb = (uint8_t *)PyBytes_AS_STRING(frames);
            PyObject *w = PyObject_GetAttr(c->db, S_wal);
            if (!w || w == Py_None) {
                Py_XDECREF(w); Py_DECREF(frames);
                if (!PyErr_Occurred())
                    PyErr_SetString(PyExc_RuntimeError, "wal missing");
                goto del_abort;
            }
            int64_t lsn = attr_ll(w, S_next_lsn, &err);
            if (err) { Py_DECREF(w); Py_DECREF(frames); goto del_abort; }
            fill_frame(pb, (unsigned)c->ft_dml, (unsigned)c->table_id,
                       (uint64_t)lsn, (uint64_t)tid, payload, 8);
            fill_frame(pb + 40, (unsigned)c->ft_commit, 0,
                       (uint64_t)lsn + 1, (uint64_t)tid, NULL, 0);
            PyObject *buffer = PyObject_GetAttr(w, S_buffer);
            int brc = buffer ? PyList_Append(buffer, frames) : -1;
            Py_XDECREF(buffer);
            Py_DECREF(frames);
            if (brc) { Py_DECREF(w); goto del_abort; }
            fc = attr_ll(w, S_frame_count, &err) + 2;
            if (err || attr_set_ll(w, S_next_lsn, lsn + 2) ||
                attr_set_ll(w, S_frame_count, fc)) {
                Py_DECREF(w); goto del_abort;
            }
            int af = attr_truthy(c->db, S_wal_autoflush, &err);
            if (err) { Py_DECREF(w); goto del_abort; }
            if (af) {
                PyObject *fr = PyObject_CallMethodNoArgs(w, S_flush);
                if (!fr) { Py_DECREF(w); goto del_abort; }
                Py_DECREF(fr);
            }
            Py_DECREF(w);
        }
        {
            int64_t nts = attr_ll(c->mgr, S_next_ts, &err) + 1;
            if (err) goto del_abort;
            c->ct_ptr[tid] = nts;
            if (attr_set_ll(c->mgr, S_next_ts, nts)) {
                Py_DECREF(rid_long); return NULL; }
        }
        if (wal_on && fc >= c->ckpt) {
            PyObject *cr = PyObject_CallMethodNoArgs(c->db, S_checkpoint);
            if (!cr) { Py_DECREF(rid_long); return NULL; }
            Py_DECREF(cr);
        }
        Py_DECREF(rid_long);
        return PyLong_FromLong(1);
    del_abort:
        d->xmax[vi] = 0;
        c->ct_ptr[tid] = TS_ABORTED;
        Py_DECREF(rid_long);
        return NULL;
    }

    /* ---------------- UPDATE: new version + stamp --------------------- */
    {
        PyObject *vals[ICTX_MAXCOLS];
        PyObject *keys_new[ICTX_MAXSEC];
        int skip_sec[ICTX_MAXSEC];
        SecLive live[ICTX_MAXSEC];
        int nvals = 0, nkeys_new = 0, nlive = 0;
        int64_t tid = -1;
        PyObject *newv_long = NULL;

        if (d->n > ICTX_MAXCOLS) { Py_DECREF(rid_long); Py_RETURN_NONE; }
        memset(live, 0, sizeof(live));   /* skipped slots must be safe
                                            for sec_live_clear */
        /* materialize the old row, then overlay SET binds */
        for (int i = 0; i < d->n; i++) {
            PyObject *v = col_read(&d->cols[i], vi);
            if (!v) goto u_bail;
            vals[i] = v;
            nvals = i + 1;
        }
        for (int i = 0; i < c->nset; i++) {
            Bind *b = &c->set_binds[i];
            PyObject *v;
            if (b->kind == 1) {
                if (b->payload >= nparams) goto u_bail;
                v = PyList_GET_ITEM(params, b->payload);
            } else {
                v = b->konst;
            }
            int p = c->set_pos[i];
            Py_INCREF(v);
            Py_DECREF(vals[p]);
            vals[p] = v;
        }
        /* validate (type gates + NOT NULL on SET columns) */
        ValTmp tmp[ICTX_MAXCOLS];
        {
            int rc = validate_vals(d, vals, tmp);
            if (rc > 0) goto u_bail;
            if (rc < 0) {
                PyObject *cn = PyTuple_GET_ITEM(c->colnames, -rc - 1);
                PyObject *msg = PyUnicode_Concat(c->nn_prefix, cn);
                if (msg) {
                    PyErr_SetObject(c->cv_exc, msg);
                    Py_DECREF(msg);
                }
                goto u_error;
            }
        }
        /* changed-index keys: encode old + new; equal keys are skipped
           entirely (the existing entry already covers the new version);
           for unique changed keys, a foreign count hit bails */
        for (int j = 0; j < c->nsec; j++) {
            skip_sec[j] = 1;
            keys_new[j] = NULL;
            if (!c->sec_changed[j]) continue;
            SecD *s = &c->sec[j];
            Buf bo = {(uint8_t *)PyMem_Malloc(64), 0, 64};
            if (!bo.buf) { PyErr_NoMemory(); goto u_error; }
            int old_ok = 1;
            for (int p = 0; p < s->npos; p++) {
                PyObject *ov = col_read(&d->cols[s->pos[p]], vi);
                if (!ov) { old_ok = 0; break; }
                int erc = encode_one(&bo, ov, 0);
                Py_DECREF(ov);
                if (erc) {
                    if (PyErr_ExceptionMatches(PyExc_TypeError)) {
                        PyErr_Clear();
                        old_ok = 0;
                        break;
                    }
                    PyMem_Free(bo.buf);
                    goto u_error;
                }
            }
            Buf bn = {(uint8_t *)PyMem_Malloc(64), 0, 64};
            if (!bn.buf) { PyMem_Free(bo.buf); PyErr_NoMemory();
                goto u_error; }
            for (int p = 0; p < s->npos; p++) {
                if (encode_one(&bn, vals[s->pos[p]], 0)) {
                    PyMem_Free(bo.buf); PyMem_Free(bn.buf);
                    if (PyErr_ExceptionMatches(PyExc_TypeError)) {
                        PyErr_Clear();
                        goto u_bail;
                    }
                    goto u_error;
                }
            }
            if (old_ok && bo.len == bn.len &&
                memcmp(bo.buf, bn.buf, bn.len) == 0) {
                PyMem_Free(bo.buf); PyMem_Free(bn.buf);
                continue;        /* key unchanged: keep existing entry */
            }
            PyMem_Free(bo.buf);
            keys_new[j] = PyBytes_FromStringAndSize((char *)bn.buf,
                                                    bn.len);
            PyMem_Free(bn.buf);
            if (!keys_new[j]) goto u_error;
            nkeys_new = j + 1;
            skip_sec[j] = 0;
            if (s->unique) {
                int all_nn = 1;
                for (int p = 0; p < s->npos; p++)
                    if (vals[s->pos[p]] == Py_None) { all_nn = 0; break; }
                if (all_nn) {
                    PyObject *count = PyObject_GetAttr(s->idx, S_count);
                    if (!count) goto u_error;
                    int hit = (count != Py_None)
                        ? PyDict_Contains(count, keys_new[j]) : 1;
                    Py_DECREF(count);
                    if (hit < 0) goto u_error;
                    if (hit) goto u_bail;   /* maybe-conflict: generic */
                }
            }
            /* fetch live containers + threshold check for this index */
            memset(&live[j], 0, sizeof(SecLive));
            live[j].delta = PyObject_GetAttr(s->idx, S_delta);
            live[j].dbk = PyObject_GetAttr(s->idx, S_dbk);
            live[j].count = PyObject_GetAttr(s->idx, S_count);
            live[j].single = PyObject_GetAttr(s->idx, S_single);
            live[j].deleted = PyObject_GetAttr(s->idx, S_deleted);
            nlive = j + 1;
            if (!live[j].delta || !live[j].dbk || !live[j].count ||
                !live[j].single || !live[j].deleted)
                goto u_error;
            if (!PyList_CheckExact(live[j].delta) ||
                PyList_GET_SIZE(live[j].delta) >= LSM_MERGE_THRESHOLD)
                goto u_bail;
        }
        /* capacity + txn slot */
        int64_t nversions = attr_ll(c->table, S_nversions, &err);
        if (err) goto u_error;
        int64_t capacity = attr_ll(c->table, S_capacity, &err);
        if (err) goto u_error;
        if (nversions + 1 > capacity) {
            int ret = -1;
            for (int i = 0; i < nvals; i++) Py_DECREF(vals[i]);
            for (int j = 0; j < nkeys_new; j++) Py_XDECREF(keys_new[j]);
            sec_live_clear(live, nlive);
            Py_DECREF(rid_long);
            return PyLong_FromLong(ret);
        }
        tid = attr_ll(c->mgr, S_next_txn, &err);
        if (err) goto u_error;
        if (tid >= c->ct_len) {
            for (int i = 0; i < nvals; i++) Py_DECREF(vals[i]);
            for (int j = 0; j < nkeys_new; j++) Py_XDECREF(keys_new[j]);
            sec_live_clear(live, nlive);
            Py_DECREF(rid_long);
            return PyLong_FromLong(-2);
        }
        if (attr_set_ll(c->mgr, S_next_txn, tid + 1)) goto u_error;

        /* ---- point of no return ---- */
        write_vals(d, nversions, rid, tid, vals, tmp);
        d->prev[nversions] = vi;
        d->xmax[vi] = tid;
        newv_long = PyLong_FromLongLong(nversions);
        if (!newv_long) goto u_abort;
        {
            PyObject *latest = PyObject_GetAttr(c->table, S_latest);
            if (!latest) goto u_abort;
            int src = PyDict_SetItem(latest, rid_long, newv_long);
            Py_DECREF(latest);
            if (src) goto u_abort;
        }
        if (attr_set_ll(c->table, S_nversions, nversions + 1))
            goto u_abort;
        for (int j = 0; j < c->nsec; j++) {
            if (skip_sec[j]) continue;
            if (sec_insert_entry(&live[j], keys_new[j], rid_long))
                goto u_abort;
        }
        /* WAL: UPDATE frame (rid + full record) + COMMIT frame */
        int wal_on = attr_truthy(c->db, S_wal_enabled, &err);
        if (err) goto u_abort;
        if (wal_on) {
            int repl = attr_truthy(c->db, S_replaying, &err);
            if (err) goto u_abort;
            wal_on = !repl;
        }
        int64_t fc = 0;
        if (wal_on) {
            PyObject *rec = pack_record_from(
                (const uint8_t *)PyBytes_AS_STRING(c->blob),
                PyBytes_GET_SIZE(c->blob), vals, d->n);
            if (!rec) goto u_abort;
            if (rec == Py_None) {
                Py_DECREF(rec);
                PyObject *vt = PyTuple_New(d->n);
                if (!vt) goto u_abort;
                for (int i = 0; i < d->n; i++) {
                    Py_INCREF(vals[i]);
                    PyTuple_SET_ITEM(vt, i, vals[i]);
                }
                rec = PyObject_CallOneArg(c->pack_fb, vt);
                Py_DECREF(vt);
                if (!rec) goto u_abort;
                if (!PyBytes_CheckExact(rec)) {
                    Py_DECREF(rec);
                    PyErr_SetString(PyExc_TypeError, "pack fallback");
                    goto u_abort;
                }
            }
            Py_ssize_t rl = PyBytes_GET_SIZE(rec);
            Py_ssize_t plen = 8 + rl;
            PyObject *frames = PyBytes_FromStringAndSize(NULL,
                                                         32 + plen + 32);
            if (!frames) { Py_DECREF(rec); goto u_abort; }
            uint8_t *pb = (uint8_t *)PyBytes_AS_STRING(frames);
            uint8_t sbuf[4096];
            uint8_t *payload = plen <= (Py_ssize_t)sizeof(sbuf)
                ? sbuf : (uint8_t *)PyMem_Malloc(plen);
            if (!payload) {
                Py_DECREF(rec); Py_DECREF(frames);
                PyErr_NoMemory(); goto u_abort;
            }
            uint64_t rid_le = (uint64_t)rid;
            memcpy(payload, &rid_le, 8);
            memcpy(payload + 8, PyBytes_AS_STRING(rec), rl);
            Py_DECREF(rec);
            PyObject *w = PyObject_GetAttr(c->db, S_wal);
            if (!w || w == Py_None) {
                Py_XDECREF(w); Py_DECREF(frames);
                if (payload != sbuf) PyMem_Free(payload);
                if (!PyErr_Occurred())
                    PyErr_SetString(PyExc_RuntimeError, "wal missing");
                goto u_abort;
            }
            int64_t lsn = attr_ll(w, S_next_lsn, &err);
            if (err) {
                Py_DECREF(w); Py_DECREF(frames);
                if (payload != sbuf) PyMem_Free(payload);
                goto u_abort;
            }
            fill_frame(pb, (unsigned)c->ft_dml, (unsigned)c->table_id,
                       (uint64_t)lsn, (uint64_t)tid, payload, plen);
            fill_frame(pb + 32 + plen, (unsigned)c->ft_commit, 0,
                       (uint64_t)lsn + 1, (uint64_t)tid, NULL, 0);
            if (payload != sbuf) PyMem_Free(payload);
            PyObject *buffer = PyObject_GetAttr(w, S_buffer);
            int brc = buffer ? PyList_Append(buffer, frames) : -1;
            Py_XDECREF(buffer);
            Py_DECREF(frames);
            if (brc) { Py_DECREF(w); goto u_abort; }
            fc = attr_ll(w, S_frame_count, &err) + 2;
            if (err || attr_set_ll(w, S_next_lsn, lsn + 2) ||
                attr_set_ll(w, S_frame_count, fc)) {
                Py_DECREF(w);
                goto u_abort;
            }
            int af = attr_truthy(c->db, S_wal_autoflush, &err);
            if (err) { Py_DECREF(w); goto u_abort; }
            if (af) {
                PyObject *fr = PyObject_CallMethodNoArgs(w, S_flush);
                if (!fr) { Py_DECREF(w); goto u_abort; }
                Py_DECREF(fr);
            }
            Py_DECREF(w);
        }
        /* commit */
        {
            int64_t nts = attr_ll(c->mgr, S_next_ts, &err) + 1;
            if (err) goto u_abort;
            c->ct_ptr[tid] = nts;
            if (attr_set_ll(c->mgr, S_next_ts, nts)) goto u_error_clean;
        }
        if (wal_on && fc >= c->ckpt) {
            PyObject *cr = PyObject_CallMethodNoArgs(c->db, S_checkpoint);
            if (!cr) goto u_error_clean;
            Py_DECREF(cr);
        }
        for (int i = 0; i < nvals; i++) Py_DECREF(vals[i]);
        for (int j = 0; j < nkeys_new; j++) Py_XDECREF(keys_new[j]);
        sec_live_clear(live, nlive);
        Py_DECREF(rid_long);
        Py_XDECREF(newv_long);
        return PyLong_FromLong(1);

    u_abort:
        /* roll the stamps back (the appended version becomes an orphan
           with an aborted creator; latest/xmax return to their prior
           values, so the generic delete_row xmax!=0 check stays sound) */
        c->ct_ptr[tid] = TS_ABORTED;
        d->xmax[vi] = 0;
        {
            PyObject *t2, *v2, *tb2;
            PyErr_Fetch(&t2, &v2, &tb2);
            PyObject *latest = PyObject_GetAttr(c->table, S_latest);
            if (latest) {
                PyObject *vv = PyLong_FromLongLong(vi);
                if (vv) {
                    PyDict_SetItem(latest, rid_long, vv);
                    Py_DECREF(vv);
                }
                Py_DECREF(latest);
            }
            PyErr_Restore(t2, v2, tb2);
        }
        goto u_error_clean;
    u_bail:
        for (int i = 0; i < nvals; i++) Py_DECREF(vals[i]);
        for (int j = 0; j < nkeys_new; j++) Py_XDECREF(keys_new[j]);
        sec_live_clear(live, nlive);
        Py_DECREF(rid_long);
        Py_XDECREF(newv_long);
        Py_RETURN_NONE;
    u_error:
    u_error_clean:
        for (int i = 0; i < nvals; i++) Py_DECREF(vals[i]);
        for (int j = 0; j < nkeys_new; j++) Py_XDECREF(keys_new[j]);
        sec_live_clear(live, nlive);
        Py_DECREF(rid_long);
        Py_XDECREF(newv_long);
        return NULL;
    }
}

/* ---- whole-statement entry points ------------------------------------ *
 *
 * exec_insert_stmt / exec_point_stmt ARE the public PreparedStatement
 * execute()/query() once the fast lane attaches: api.py shadows the
 * method with functools.partial(<this>, state) on the instance, so a
 * user call lands here with ZERO Python frames. On a 1-vCPU box a
 * Python frame costs ~1-3 us; the prepared-insert chain was 3 frames +
 * a dataclass __init__ around a ~0.9 us C core. The statement lock is
 * acquired with cached bound acquire/release methods (C methods of
 * _thread.RLock — no bytecode), held exactly around the core, and
 * released even when the core raises. Every bail (None), maintenance
 * code (negative int), or staleness goes to the in-state fallback — the
 * CLASS-bound execute/query, which re-runs the general path and
 * re-attaches a fresh shadow. Reference economics: prepared.rs:106-158
 * (1,185 ns/row), lib.rs:64 (<1 us cached reads). */

static PyObject *Long_1;   /* cached int 1 (module init) */
static PyObject *S_rows_affected, *S_last_rowid, *S_rows, *S_columns;

/* normalize a call's params into an exact list matching the Python
   paths' `list(params or [])`. Returns a NEW reference, or NULL with
   *use_fallback set when only the generic Python path can decide. */
static PyObject *stmt_params(PyObject *const *args, Py_ssize_t nargs,
                             int *use_fallback) {
    *use_fallback = 0;
    if (nargs < 2 || args[1] == Py_None) return PyList_New(0);
    PyObject *p = args[1];
    if (PyList_CheckExact(p)) {
        Py_INCREF(p);
        return p;
    }
    if (PyTuple_CheckExact(p)) return PySequence_List(p);
    *use_fallback = 1;   /* exotic params: let the Python path handle */
    return NULL;
}

/* state: (box_list, acquire, release, er_new, er_cls, fallback);
   box_list[0] is the live InsertCtx capsule, SHARED with the _fi retry
   closure so a ctx rebuild there is visible here. fallback is the
   class-bound PreparedStatement.execute. */
static PyObject *py_exec_insert_stmt(PyObject *self, PyObject *const *args,
                                     Py_ssize_t nargs) {
    if (nargs < 1 || nargs > 2) {
        PyErr_SetString(PyExc_TypeError, "exec_insert_stmt(state[, params])");
        return NULL;
    }
    PyObject *st = args[0];
    Py_ssize_t stn = PyTuple_CheckExact(st) ? PyTuple_GET_SIZE(st) : 0;
    if (stn != 6 && stn != 7) {
        PyErr_SetString(PyExc_TypeError, "bad stmt state");
        return NULL;
    }
    PyObject *box = PyTuple_GET_ITEM(st, 0);
    if (!PyList_CheckExact(box) || PyList_GET_SIZE(box) < 1) {
        PyErr_SetString(PyExc_TypeError, "bad stmt box");
        return NULL;
    }
    int use_fb = 0;
    PyObject *params = stmt_params(args, nargs, &use_fb);
    if (!params) {
        if (!use_fb) return NULL;
        return PyObject_CallOneArg(PyTuple_GET_ITEM(st, 5),
                                   nargs >= 2 ? args[1] : Py_None);
    }
    PyObject *ar = PyObject_CallNoArgs(PyTuple_GET_ITEM(st, 1));
    if (!ar) { Py_DECREF(params); return NULL; }
    Py_DECREF(ar);
    PyObject *cargs[2] = {PyList_GET_ITEM(box, 0), params};
    PyObject *r = py_exec_insert(NULL, cargs, 2);
    if (!r) {
        PyObject *t, *v, *tb;
        PyErr_Fetch(&t, &v, &tb);
        PyObject *rr = PyObject_CallNoArgs(PyTuple_GET_ITEM(st, 2));
        Py_XDECREF(rr);
        PyErr_Restore(t, v, tb);
        Py_DECREF(params);
        return NULL;
    }
    {
        PyObject *rr = PyObject_CallNoArgs(PyTuple_GET_ITEM(st, 2));
        if (!rr) { Py_DECREF(r); Py_DECREF(params); return NULL; }
        Py_DECREF(rr);
    }
    if (PyLong_CheckExact(r)) {
        int ovf = 0;
        int64_t rid = PyLong_AsLongLongAndOverflow(r, &ovf);
        if (!ovf && rid >= 0 && stn == 7) {
            /* group-commit hook cell ([None] unless wal on AND
               synchronous=FULL): fsync OUTSIDE the statement lock so
               concurrent committers share one fsync */
            PyObject *cell = PyTuple_GET_ITEM(st, 6);
            if (PyList_CheckExact(cell) && PyList_GET_SIZE(cell) >= 1) {
                PyObject *hook = PyList_GET_ITEM(cell, 0);
                if (hook != Py_None) {
                    PyObject *hr = PyObject_CallNoArgs(hook);
                    if (!hr) { Py_DECREF(r); Py_DECREF(params); return NULL; }
                    Py_DECREF(hr);
                }
            }
        }
        if (!ovf && rid >= 0) {
            /* ExecuteResult via __new__ + attr stores: the dataclass
               __init__ is Python bytecode (~1 us here); this is the
               same end state without entering the interpreter */
            Py_DECREF(params);
            PyObject *inst = PyObject_CallOneArg(
                PyTuple_GET_ITEM(st, 3), PyTuple_GET_ITEM(st, 4));
            if (!inst) { Py_DECREF(r); return NULL; }
            /* write the four fields straight into the instance dict —
               PyObject_SetAttr would do a data-descriptor MRO scan per
               attribute (~0.15us each here); ExecuteResult is a plain
               dataclass so the end state is identical */
            PyObject **dp = _PyObject_GetDictPtr(inst);
            if (dp) {
                if (!*dp) *dp = PyDict_New();
                if (!*dp ||
                    PyDict_SetItem(*dp, S_rows_affected, Long_1) ||
                    PyDict_SetItem(*dp, S_last_rowid, r) ||
                    PyDict_SetItem(*dp, S_rows, Py_None) ||
                    PyDict_SetItem(*dp, S_columns, Py_None)) {
                    Py_DECREF(inst);
                    Py_DECREF(r);
                    return NULL;
                }
            } else if (PyObject_SetAttr(inst, S_rows_affected, Long_1) ||
                       PyObject_SetAttr(inst, S_last_rowid, r) ||
                       PyObject_SetAttr(inst, S_rows, Py_None) ||
                       PyObject_SetAttr(inst, S_columns, Py_None)) {
                Py_DECREF(inst);
                Py_DECREF(r);
                return NULL;
            }
            Py_DECREF(r);
            return inst;
        }
    }
    /* None (bail) or maintenance code: the general path handles it
       (plan.execute grows/re-pins via the shared box) and re-attaches */
    Py_DECREF(r);
    PyObject *res = PyObject_CallOneArg(PyTuple_GET_ITEM(st, 5), params);
    Py_DECREF(params);
    return res;
}

/* state: (holder_list, acquire, release, fallback); holder_list[0] =
   PointCtx. fallback is the class-bound PreparedStatement.query (its
   cfn wrapper clears + re-resolves on staleness, then re-attaches). */
static PyObject *py_exec_point_stmt(PyObject *self, PyObject *const *args,
                                    Py_ssize_t nargs) {
    if (nargs < 1 || nargs > 2) {
        PyErr_SetString(PyExc_TypeError, "exec_point_stmt(state[, params])");
        return NULL;
    }
    PyObject *st = args[0];
    if (!PyTuple_CheckExact(st) || PyTuple_GET_SIZE(st) != 4) {
        PyErr_SetString(PyExc_TypeError, "bad point state");
        return NULL;
    }
    PyObject *holder = PyTuple_GET_ITEM(st, 0);
    if (!PyList_CheckExact(holder) || PyList_GET_SIZE(holder) < 1) {
        PyErr_SetString(PyExc_TypeError, "bad point holder");
        return NULL;
    }
    int use_fb = 0;
    PyObject *params = stmt_params(args, nargs, &use_fb);
    if (!params) {
        if (!use_fb) return NULL;
        return PyObject_CallOneArg(PyTuple_GET_ITEM(st, 3),
                                   nargs >= 2 ? args[1] : Py_None);
    }
    PyObject *ar = PyObject_CallNoArgs(PyTuple_GET_ITEM(st, 1));
    if (!ar) { Py_DECREF(params); return NULL; }
    Py_DECREF(ar);
    PyObject *cargs[2] = {PyList_GET_ITEM(holder, 0), params};
    PyObject *r = py_exec_point(NULL, cargs, 2);
    if (!r) {
        PyObject *t, *v, *tb;
        PyErr_Fetch(&t, &v, &tb);
        PyObject *rr = PyObject_CallNoArgs(PyTuple_GET_ITEM(st, 2));
        Py_XDECREF(rr);
        PyErr_Restore(t, v, tb);
        Py_DECREF(params);
        return NULL;
    }
    {
        PyObject *rr = PyObject_CallNoArgs(PyTuple_GET_ITEM(st, 2));
        if (!rr) { Py_DECREF(r); Py_DECREF(params); return NULL; }
        Py_DECREF(rr);
    }
    if (PyList_CheckExact(r)) {
        Py_DECREF(params);
        return r;
    }
    /* None (bail) or -3 (rebuild): the general query path re-resolves */
    Py_DECREF(r);
    PyObject *res = PyObject_CallOneArg(PyTuple_GET_ITEM(st, 3), params);
    Py_DECREF(params);
    return res;
}

/* state: (box_list, acquire, release, er_new, er_cls, fallback[,
   durable_cell]); box_list[0] is the live DmlCtx capsule, shared with
   the plan's retry closure. Mirrors exec_insert_stmt: zero Python
   frames on the happy path, every bail/maintenance code falls back to
   the class-bound PreparedStatement.execute. */
static PyObject *py_exec_dml_stmt(PyObject *self, PyObject *const *args,
                                  Py_ssize_t nargs) {
    if (nargs < 1 || nargs > 2) {
        PyErr_SetString(PyExc_TypeError, "exec_dml_stmt(state[, params])");
        return NULL;
    }
    PyObject *st = args[0];
    Py_ssize_t stn = PyTuple_CheckExact(st) ? PyTuple_GET_SIZE(st) : 0;
    if (stn != 6 && stn != 7) {
        PyErr_SetString(PyExc_TypeError, "bad stmt state");
        return NULL;
    }
    PyObject *box = PyTuple_GET_ITEM(st, 0);
    if (!PyList_CheckExact(box) || PyList_GET_SIZE(box) < 1) {
        PyErr_SetString(PyExc_TypeError, "bad stmt box");
        return NULL;
    }
    int use_fb = 0;
    PyObject *params = stmt_params(args, nargs, &use_fb);
    if (!params) {
        if (!use_fb) return NULL;
        return PyObject_CallOneArg(PyTuple_GET_ITEM(st, 5),
                                   nargs >= 2 ? args[1] : Py_None);
    }
    PyObject *ar = PyObject_CallNoArgs(PyTuple_GET_ITEM(st, 1));
    if (!ar) { Py_DECREF(params); return NULL; }
    Py_DECREF(ar);
    PyObject *cargs[2] = {PyList_GET_ITEM(box, 0), params};
    PyObject *r = py_exec_dml(NULL, cargs, 2);
    if (!r) {
        PyObject *t, *v, *tb;
        PyErr_Fetch(&t, &v, &tb);
        PyObject *rr = PyObject_CallNoArgs(PyTuple_GET_ITEM(st, 2));
        Py_XDECREF(rr);
        PyErr_Restore(t, v, tb);
        Py_DECREF(params);
        return NULL;
    }
    {
        PyObject *rr = PyObject_CallNoArgs(PyTuple_GET_ITEM(st, 2));
        if (!rr) { Py_DECREF(r); Py_DECREF(params); return NULL; }
        Py_DECREF(rr);
    }
    if (PyLong_CheckExact(r)) {
        int ovf = 0;
        int64_t n = PyLong_AsLongLongAndOverflow(r, &ovf);
        if (!ovf && n >= 0) {
            if (n == 1 && stn == 7) {
                PyObject *cell = PyTuple_GET_ITEM(st, 6);
                if (PyList_CheckExact(cell) && PyList_GET_SIZE(cell) >= 1) {
                    PyObject *hook = PyList_GET_ITEM(cell, 0);
                    if (hook != Py_None) {
                        PyObject *hr = PyObject_CallNoArgs(hook);
                        if (!hr) { Py_DECREF(r); Py_DECREF(params);
                            return NULL; }
                        Py_DECREF(hr);
                    }
                }
            }
            Py_DECREF(params);
            PyObject *inst = PyObject_CallOneArg(
                PyTuple_GET_ITEM(st, 3), PyTuple_GET_ITEM(st, 4));
            if (!inst) { Py_DECREF(r); return NULL; }
            PyObject **dp = _PyObject_GetDictPtr(inst);
            if (dp) {
                if (!*dp) *dp = PyDict_New();
                if (!*dp ||
                    PyDict_SetItem(*dp, S_rows_affected, r) ||
                    PyDict_SetItem(*dp, S_last_rowid, Py_None) ||
                    PyDict_SetItem(*dp, S_rows, Py_None) ||
                    PyDict_SetItem(*dp, S_columns, Py_None)) {
                    Py_DECREF(inst);
                    Py_DECREF(r);
                    return NULL;
                }
            } else if (PyObject_SetAttr(inst, S_rows_affected, r) ||
                       PyObject_SetAttr(inst, S_last_rowid, Py_None) ||
                       PyObject_SetAttr(inst, S_rows, Py_None) ||
                       PyObject_SetAttr(inst, S_columns, Py_None)) {
                Py_DECREF(inst);
                Py_DECREF(r);
                return NULL;
            }
            Py_DECREF(r);
            return inst;
        }
    }
    /* None (bail) or maintenance code: the general path handles it */
    Py_DECREF(r);
    PyObject *res = PyObject_CallOneArg(PyTuple_GET_ITEM(st, 5), params);
    Py_DECREF(params);
    return res;
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
    {"make_insert_ctx", py_make_insert_ctx, METH_VARARGS,
     "capsule binding one prepared INSERT's whole row path"},
    {"exec_insert", (PyCFunction)(void (*)(void))py_exec_insert,
     METH_FASTCALL,
     "one prepared single-row autocommit insert, fully in C"},
    {"make_point_ctx", py_make_point_ctx, METH_VARARGS,
     "capsule binding one prepared unique-key SELECT's row path"},
    {"exec_point", (PyCFunction)(void (*)(void))py_exec_point,
     METH_FASTCALL,
     "one unique-key point read, fully in C"},
    {"exec_insert_stmt",
     (PyCFunction)(void (*)(void))py_exec_insert_stmt, METH_FASTCALL,
     "exec_insert + statement lock + ExecuteResult, one C call"},
    {"exec_point_stmt",
     (PyCFunction)(void (*)(void))py_exec_point_stmt, METH_FASTCALL,
     "exec_point + statement lock, one C call"},
    {"make_dml_ctx", py_make_dml_ctx, METH_VARARGS,
     "capsule binding one prepared single-row UPDATE/DELETE's path"},
    {"exec_dml", (PyCFunction)(void (*)(void))py_exec_dml, METH_FASTCALL,
     "one prepared single-row autocommit UPDATE/DELETE, fully in C"},
    {"exec_dml_stmt",
     (PyCFunction)(void (*)(void))py_exec_dml_stmt, METH_FASTCALL,
     "exec_dml + statement lock + ExecuteResult, one C call"},
    {NULL, NULL, 0, NULL}};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_turdb_oltp", NULL, -1, Methods,
};

PyMODINIT_FUNC PyInit__turdb_oltp(void) {
    S_delta = PyUnicode_InternFromString("_delta");
    S_dbk = PyUnicode_InternFromString("_delta_by_key");
    S_count = PyUnicode_InternFromString("_count");
    S_single = PyUnicode_InternFromString("_single");
    S_deleted = PyUnicode_InternFromString("_deleted");
    S_nversions = PyUnicode_InternFromString("nversions");
    S_capacity = PyUnicode_InternFromString("capacity");
    S_next_rowid = PyUnicode_InternFromString("next_rowid");
    S_auto_increment = PyUnicode_InternFromString("auto_increment");
    S_next_txn = PyUnicode_InternFromString("_next_txn");
    S_next_ts = PyUnicode_InternFromString("_next_ts");
    S_commit_ts = PyUnicode_InternFromString("_commit_ts");
    S_wal_enabled = PyUnicode_InternFromString("wal_enabled");
    S_replaying = PyUnicode_InternFromString("_replaying");
    S_wal_autoflush = PyUnicode_InternFromString("wal_autoflush");
    S_wal = PyUnicode_InternFromString("wal");
    S_buffer = PyUnicode_InternFromString("_buffer");
    S_next_lsn = PyUnicode_InternFromString("next_lsn");
    S_frame_count = PyUnicode_InternFromString("frame_count");
    S_last_insert_id = PyUnicode_InternFromString("last_insert_id");
    S_checkpoint = PyUnicode_InternFromString("checkpoint");
    S_flush = PyUnicode_InternFromString("flush");
    S_latest = PyUnicode_InternFromString("latest");
    S_mode = PyUnicode_InternFromString("mode");
    S_txn = PyUnicode_InternFromString("_txn");
    S_locks = PyUnicode_InternFromString("_locks");
    S_ddl_epoch = PyUnicode_InternFromString("ddl_epoch");
    S_trigger_tables = PyUnicode_InternFromString("_trigger_tables");
    S_catalog = PyUnicode_InternFromString("catalog");
    S_rows_affected = PyUnicode_InternFromString("rows_affected");
    S_last_rowid = PyUnicode_InternFromString("last_rowid");
    S_rows = PyUnicode_InternFromString("rows");
    S_columns = PyUnicode_InternFromString("columns");
    Long_1 = PyLong_FromLong(1);
    return PyModule_Create(&moduledef);
}

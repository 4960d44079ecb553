/* CPython extension: one-pass split-TSV parsing.
 *
 * Native twin of the header/read-row parsing inside
 * freddie_tpu/io/tsv.py:parse_split_tsv (the wire format is
 * /root/reference/py/freddie_split.py:445-481; the reference re-parses it
 * per stage with compiled regexes, py/freddie_segment.py:17-38). The
 * Python parser dominated the production segment stage's host time
 * (~1.9 s of 7.5 s on the 26k-read bench dataset, half of it re-parsing
 * CIGAR strings); this extension builds the identical tuples in one C
 * pass. The Python implementation remains the semantic oracle
 * (tests/test_native_tsvparse.py compares object-for-object) and the
 * runtime fallback.
 *
 * parse_split_file(path, opcodes) ->
 *   (chrom, tint_id, tint_intervals, read_count, reads, reps)
 *   tint_intervals: [(s, e), ...]
 *   reads: [(rid, name, chrom, strand, tint, ivs)], one per row
 *   ivs:   [(ts, te, qs, qe, cigar)], cigar: [(op_code, length), ...]
 *   with op_code = index of the op char in `opcodes` (io.bam.CIGAR_OPS).
 *   reps:  [(key, [row_idx, ...])] grouping rows that share the same
 *   ((ts, te), ...) exonic-interval tuple, in first-seen order -- the
 *   read representatives of py/freddie_segment.py:163-170, computed
 *   here so the Python side needn't re-walk every row's intervals.
 *
 * Every structural assertion of the Python parser is replicated as an
 * AssertionError with the same meaning; malformed numerics raise
 * ValueError.
 *
 * Build: gcc -O2 -shared -fPIC -I<python-include> -o tsvparse.so tsvparse.c
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static int fail_assert(const char* msg) {
  PyErr_SetString(PyExc_AssertionError, msg);
  return -1;
}

/* Parse a non-negative decimal starting at *p; advance *p. -1 on error. */
static long long parse_ll(const char** p, const char* end) {
  const char* s = *p;
  if (s >= end || *s < '0' || *s > '9') return -1;
  long long v = 0;
  while (s < end && *s >= '0' && *s <= '9') {
    v = v * 10 + (*s - '0');
    ++s;
  }
  *p = s;
  return v;
}

static PyObject* parse_split_file(PyObject* self, PyObject* args) {
  const char* path;
  const char* opcodes;
  Py_ssize_t n_ops;
  if (!PyArg_ParseTuple(args, "ss#", &path, &opcodes, &n_ops)) return NULL;

  FILE* f = fopen(path, "rb");
  if (!f) {
    PyErr_SetFromErrnoWithFilename(PyExc_OSError, path);
    return NULL;
  }
  fseek(f, 0, SEEK_END);
  long fsize = ftell(f);
  fseek(f, 0, SEEK_SET);
  char* buf = (char*)malloc((size_t)fsize + 1);
  if (!buf || fread(buf, 1, (size_t)fsize, f) != (size_t)fsize) {
    fclose(f);
    free(buf);
    PyErr_SetString(PyExc_OSError, "short read");
    return NULL;
  }
  fclose(f);
  buf[fsize] = '\n'; /* sentinel so the last line always terminates */

  int op_of[256];
  for (int i = 0; i < 256; ++i) op_of[i] = -1;
  for (Py_ssize_t i = 0; i < n_ops; ++i) op_of[(unsigned char)opcodes[i]] = (int)i;

  PyObject* chrom = NULL;
  PyObject* tint_intervals = NULL;
  PyObject* reads = PyList_New(0);
  PyObject* reps_dict = PyDict_New(); /* key tuple -> [row idx, ...] */
  long long tint_id = -1, read_count = -1;
  int have_header = 0;
  if (!reads || !reps_dict) goto error;

  const char* p = buf;
  const char* bend = buf + fsize;

#define FAIL(msg)                 \
  do {                            \
    fail_assert(msg);             \
    goto error;                   \
  } while (0)
#define VFAIL(msg)                       \
  do {                                   \
    PyErr_SetString(PyExc_ValueError, msg); \
    goto error;                          \
  } while (0)

  while (p < bend) {
    const char* eol = memchr(p, '\n', (size_t)(bend - p + 1));
    if (!eol) eol = bend;
    const char* line = p;
    const char* lend = eol;
    p = eol + 1;
    if (line == lend) continue; /* blank */

    if (*line == '#') {
      if (have_header) FAIL("multiple tints in one split file");
      have_header = 1;
      /* fields: #chrom \t tint \t s-e,s-e,... \t n_reads */
      const char* t1 = memchr(line, '\t', (size_t)(lend - line));
      if (!t1) VFAIL("header: missing fields");
      chrom = PyUnicode_FromStringAndSize(line + 1, t1 - line - 1);
      if (!chrom) goto error;
      const char* q = t1 + 1;
      tint_id = parse_ll(&q, lend);
      if (tint_id < 0 || q >= lend || *q != '\t') VFAIL("header: bad tint id");
      ++q;
      tint_intervals = PyList_New(0);
      if (!tint_intervals) goto error;
      long long prev_e = -1;
      while (1) {
        long long s = parse_ll(&q, lend);
        if (s < 0 || q >= lend || *q != '-') VFAIL("header: bad interval");
        ++q;
        long long e = parse_ll(&q, lend);
        if (e < 0) VFAIL("header: bad interval");
        if (!(s < e)) FAIL("header: interval start >= end");
        if (prev_e >= 0 && !(prev_e < s)) FAIL("header: intervals not sorted");
        prev_e = e;
        PyObject* iv = Py_BuildValue("(LL)", s, e);
        if (!iv || PyList_Append(tint_intervals, iv) < 0) {
          Py_XDECREF(iv);
          goto error;
        }
        Py_DECREF(iv);
        if (q < lend && *q == ',') {
          ++q;
          continue;
        }
        break;
      }
      if (q >= lend || *q != '\t') VFAIL("header: missing read count");
      ++q;
      read_count = parse_ll(&q, lend);
      if (read_count < 0 || q != lend) VFAIL("header: bad read count");
      continue;
    }

    /* read row: rid \t name \t chrom \t strand \t tint \t ivfield... */
    const char* q = line;
    long long rid = parse_ll(&q, lend);
    if (rid < 0 || q >= lend || *q != '\t') VFAIL("row: bad rid");
    ++q;
    const char* name_s = q;
    const char* t = memchr(q, '\t', (size_t)(lend - q));
    if (!t) VFAIL("row: missing name end");
    PyObject* name = PyUnicode_FromStringAndSize(name_s, t - name_s);
    q = t + 1;
    t = memchr(q, '\t', (size_t)(lend - q));
    if (!t) {
      Py_XDECREF(name);
      VFAIL("row: missing chrom end");
    }
    PyObject* rchrom = PyUnicode_FromStringAndSize(q, t - q);
    q = t + 1;
    t = memchr(q, '\t', (size_t)(lend - q));
    if (!t) {
      Py_XDECREF(name);
      Py_XDECREF(rchrom);
      VFAIL("row: missing strand end");
    }
    PyObject* strand = PyUnicode_FromStringAndSize(q, t - q);
    q = t + 1;
    long long rtint = parse_ll(&q, lend);
    PyObject* ivs = NULL;
    if (rtint < 0 || q >= lend || *q != '\t') {
      Py_XDECREF(name);
      Py_XDECREF(rchrom);
      Py_XDECREF(strand);
      VFAIL("row: bad tint");
    }
    ++q;
    ivs = PyList_New(0);
    PyObject* keys = PyList_New(0); /* ((ts, te), ...) rep-grouping key */
    long long prev_te = -1, prev_qe = -1;
    /* interval fields separated by \t; each = ts-te:qs-qe:CIGAR */
    while (q <= lend) {
      const char* fend = memchr(q, '\t', (size_t)(lend - q));
      if (!fend) fend = lend;
      long long ts = parse_ll(&q, fend);
      if (ts < 0 || q >= fend || *q != '-') goto row_value_error;
      ++q;
      long long te = parse_ll(&q, fend);
      if (te < 0 || q >= fend || *q != ':') goto row_value_error;
      ++q;
      long long qs = parse_ll(&q, fend);
      if (qs < 0 || q >= fend || *q != '-') goto row_value_error;
      ++q;
      long long qe = parse_ll(&q, fend);
      if (qe < 0 || q >= fend || *q != ':') goto row_value_error;
      ++q;
      /* CIGAR until fend */
      PyObject* cig = PyList_New(0);
      if (!cig) goto row_error;
      while (q < fend) {
        long long n = parse_ll(&q, fend);
        if (n < 0 || q >= fend) {
          Py_DECREF(cig);
          goto row_value_error;
        }
        int op = op_of[(unsigned char)*q];
        if (op < 0) {
          Py_DECREF(cig);
          goto row_value_error;
        }
        ++q;
        PyObject* el = Py_BuildValue("(iL)", op, n);
        if (!el || PyList_Append(cig, el) < 0) {
          Py_XDECREF(el);
          Py_DECREF(cig);
          goto row_error;
        }
        Py_DECREF(el);
      }
      if (!(ts < te && qs < qe)) {
        Py_DECREF(cig);
        Py_XDECREF(name);
        Py_XDECREF(rchrom);
        Py_XDECREF(strand);
        Py_XDECREF(ivs);
        Py_XDECREF(keys);
        FAIL("row: empty interval");
      }
      if (prev_te >= 0 && !(prev_te <= ts && prev_qe <= qs)) {
        Py_DECREF(cig);
        Py_XDECREF(name);
        Py_XDECREF(rchrom);
        Py_XDECREF(strand);
        Py_XDECREF(ivs);
        Py_XDECREF(keys);
        FAIL("row: intervals not sorted");
      }
      prev_te = te;
      prev_qe = qe;
      PyObject* iv = Py_BuildValue("(LLLLN)", ts, te, qs, qe, cig);
      if (!iv || PyList_Append(ivs, iv) < 0) {
        Py_XDECREF(iv);
        goto row_error;
      }
      Py_DECREF(iv);
      PyObject* kv = Py_BuildValue("(LL)", ts, te);
      if (!kv || PyList_Append(keys, kv) < 0) {
        Py_XDECREF(kv);
        goto row_error;
      }
      Py_DECREF(kv);
      if (fend == lend) break;
      q = fend + 1;
    }
    {
      PyObject* row = Py_BuildValue("(LNNNLN)", rid, name, rchrom, strand,
                                    rtint, ivs);
      if (!row || PyList_Append(reads, row) < 0) {
        Py_XDECREF(row);
        Py_DECREF(keys);
        goto error;
      }
      Py_DECREF(row);
    }
    {
      /* Read representatives: group this row under its exonic-interval
       * key (CPython dicts iterate in insertion order, matching the
       * Python oracle's setdefault loop). */
      PyObject* key_tuple = PyList_AsTuple(keys);
      Py_DECREF(keys);
      if (!key_tuple) goto error;
      PyObject* lst = PyDict_GetItem(reps_dict, key_tuple); /* borrowed */
      if (!lst) {
        PyObject* fresh = PyList_New(0);
        if (!fresh || PyDict_SetItem(reps_dict, key_tuple, fresh) < 0) {
          Py_XDECREF(fresh);
          Py_DECREF(key_tuple);
          goto error;
        }
        Py_DECREF(fresh);
        lst = PyDict_GetItem(reps_dict, key_tuple);
      }
      Py_DECREF(key_tuple);
      PyObject* idx = PyLong_FromSsize_t(PyList_GET_SIZE(reads) - 1);
      if (!idx || !lst || PyList_Append(lst, idx) < 0) {
        Py_XDECREF(idx);
        goto error;
      }
      Py_DECREF(idx);
    }
    continue;
  row_value_error:
    PyErr_SetString(PyExc_ValueError, "row: bad interval field");
  row_error:
    Py_XDECREF(name);
    Py_XDECREF(rchrom);
    Py_XDECREF(strand);
    Py_XDECREF(ivs);
    Py_XDECREF(keys);
    goto error;
  }

  if (!have_header) FAIL("no tint header");
  {
    PyObject* reps = PyList_New(0);
    if (!reps) goto error;
    Py_ssize_t dpos = 0;
    PyObject *dk, *dv;
    while (PyDict_Next(reps_dict, &dpos, &dk, &dv)) {
      PyObject* pair = Py_BuildValue("(OO)", dk, dv);
      if (!pair || PyList_Append(reps, pair) < 0) {
        Py_XDECREF(pair);
        Py_DECREF(reps);
        goto error;
      }
      Py_DECREF(pair);
    }
    Py_DECREF(reps_dict);
    free(buf);
    return Py_BuildValue("(NLNLNN)", chrom, tint_id, tint_intervals,
                         read_count, reads, reps);
  }

error:
  free(buf);
  Py_XDECREF(chrom);
  Py_XDECREF(tint_intervals);
  Py_XDECREF(reads);
  Py_XDECREF(reps_dict);
  return NULL;
}

static PyMethodDef Methods[] = {
    {"parse_split_file", parse_split_file, METH_VARARGS,
     "Parse one split TSV into (chrom, tint, intervals, n_reads, reads)."},
    {NULL, NULL, 0, NULL}};

static struct PyModuleDef moduledef = {PyModuleDef_HEAD_INIT, "tsvparse",
                                       NULL, -1, Methods};

PyMODINIT_FUNC PyInit_tsvparse(void) { return PyModule_Create(&moduledef); }

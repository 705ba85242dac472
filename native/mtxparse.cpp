// Native MatrixMarket coordinate parser for ia_spgemm_tpu.
//
// Plays the role of the reference's C mmio library + fscanf loops
// (reference: IA-SPGEMM-CPU_release/mmio.c, main.cpp:213-230), redesigned:
// the whole file is read in one shot and parsed with branch-light manual
// integer/float scanning (no per-entry fscanf), parallelized with OpenMP
// over line ranges for large files. Returns raw 0-based COO triplets;
// symmetric expansion and CSR assembly stay in the Python layer so the
// semantics live in exactly one place.
//
// C ABI (used via ctypes from ia_spgemm_tpu/io/native.py):
//   int mtx_parse(path, &nrows, &ncols, &nnz, &field, &symmetry,
//                 &rows, &cols, &vals)
//   field: 0=real 1=integer 2=pattern  |  symmetry: 0=general 1=symmetric
//   (hermitian reports 1, like the reference treats it, main.cpp:186)
//   2=skew-symmetric
//   returns 0 on success; negative codes mirror the reference's returns
//   (main.cpp:157-168: -1 open, -2 banner, -3 complex, -4 size, -5 entry).

#include <cctype>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct Body {
  const char* p;
  const char* end;
};

inline void skip_ws(const char*& p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r' || *p == '\n'))
    ++p;
}

inline bool parse_long(const char*& p, const char* end, long long* out) {
  skip_ws(p, end);
  bool neg = false;
  if (p < end && (*p == '-' || *p == '+')) neg = (*p++ == '-');
  if (p >= end || !isdigit((unsigned char)*p)) return false;
  long long v = 0;
  while (p < end && isdigit((unsigned char)*p)) v = v * 10 + (*p++ - '0');
  *out = neg ? -v : v;
  return true;
}

inline bool parse_double(const char*& p, const char* end, double* out) {
  skip_ws(p, end);
  char* q = nullptr;
  // strtod needs NUL-terminated input; the buffer is NUL-padded by caller.
  *out = strtod(p, &q);
  if (q == p) return false;
  p = q;
  return true;
}

}  // namespace

extern "C" {

void mtx_free(void* p) { free(p); }

int mtx_parse(const char* path, long long* nrows, long long* ncols,
              long long* nnz_out, int* field_out, int* sym_out,
              int** rows_out, int** cols_out, double** vals_out) {
  *rows_out = nullptr;
  *cols_out = nullptr;
  *vals_out = nullptr;

  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::string buf;
  buf.resize(size + 1);
  size_t got = fread(&buf[0], 1, size, f);
  fclose(f);
  if ((long)got != size) return -1;
  buf[size] = '\0';

  const char* p = buf.data();
  const char* end = p + size;

  // ---- banner ----
  const char* line_end = (const char*)memchr(p, '\n', end - p);
  if (!line_end) return -2;
  std::string banner(p, line_end);
  p = line_end + 1;
  char obj[64], fmt[64], field[64], sym[64];
  if (sscanf(banner.c_str(), "%%%%MatrixMarket %63s %63s %63s %63s", obj, fmt,
             field, sym) != 4)
    return -2;
  for (char* s : {obj, fmt, field, sym})
    for (char* c = s; *c; ++c) *c = tolower((unsigned char)*c);
  if (strcmp(fmt, "coordinate") != 0) return -2;
  if (strcmp(field, "complex") == 0) return -3;

  int fcode;
  if (strcmp(field, "real") == 0) fcode = 0;
  else if (strcmp(field, "integer") == 0) fcode = 1;
  else if (strcmp(field, "pattern") == 0) fcode = 2;
  else return -2;

  int scode;
  if (strcmp(sym, "general") == 0) scode = 0;
  else if (strcmp(sym, "symmetric") == 0 || strcmp(sym, "hermitian") == 0)
    scode = 1;
  else if (strcmp(sym, "skew-symmetric") == 0) scode = 2;
  else return -2;

  // ---- comments + size line ----
  while (p < end) {
    skip_ws(p, end);
    if (p < end && *p == '%') {
      const char* nl = (const char*)memchr(p, '\n', end - p);
      if (!nl) return -4;
      p = nl + 1;
    } else {
      break;
    }
  }
  long long m, n, nnz;
  if (!parse_long(p, end, &m) || !parse_long(p, end, &n) ||
      !parse_long(p, end, &nnz))
    return -4;
  if (m < 0 || n < 0 || nnz < 0) return -4;

  int* rows = (int*)malloc(sizeof(int) * (nnz ? nnz : 1));
  int* cols = (int*)malloc(sizeof(int) * (nnz ? nnz : 1));
  double* vals = (double*)malloc(sizeof(double) * (nnz ? nnz : 1));
  if (!rows || !cols || !vals) {
    free(rows);
    free(cols);
    free(vals);
    return -6;
  }

  // ---- entries: split the remaining buffer into per-thread line ranges ----
  int err = 0;
#ifdef _OPENMP
  int nthreads = nnz > 100000 ? omp_get_max_threads() : 1;
#else
  int nthreads = 1;
#endif
  std::vector<const char*> chunk_begin(nthreads + 1);
  chunk_begin[0] = p;
  size_t remain = end - p;
  for (int tnum = 1; tnum < nthreads; ++tnum) {
    const char* guess = p + remain * tnum / nthreads;
    const char* nl = (const char*)memchr(guess, '\n', end - guess);
    chunk_begin[tnum] = nl ? nl + 1 : end;
  }
  chunk_begin[nthreads] = end;

  // first pass: count lines per chunk to get entry offsets
  std::vector<long long> counts(nthreads, 0);
#pragma omp parallel for num_threads(nthreads) schedule(static, 1)
  for (int tnum = 0; tnum < nthreads; ++tnum) {
    long long c = 0;
    const char* q = chunk_begin[tnum];
    const char* qe = chunk_begin[tnum + 1];
    while (q < qe) {
      skip_ws(q, qe);
      if (q >= qe) break;
      const char* nl = (const char*)memchr(q, '\n', qe - q);
      ++c;
      q = nl ? nl + 1 : qe;
    }
    counts[tnum] = c;
  }
  std::vector<long long> offs(nthreads + 1, 0);
  for (int tnum = 0; tnum < nthreads; ++tnum)
    offs[tnum + 1] = offs[tnum] + counts[tnum];
  if (offs[nthreads] < nnz) {
    free(rows);
    free(cols);
    free(vals);
    return -5;
  }

#pragma omp parallel for num_threads(nthreads) schedule(static, 1)
  for (int tnum = 0; tnum < nthreads; ++tnum) {
    const char* q = chunk_begin[tnum];
    const char* qe = chunk_begin[tnum + 1];
    long long idx = offs[tnum];
    while (q < qe && idx < nnz) {
      long long i, j;
      if (!parse_long(q, qe, &i) || !parse_long(q, qe, &j)) {
        skip_ws(q, qe);
        if (q >= qe) break;
#pragma omp atomic write
        err = -5;
        break;
      }
      double v = 1.0;
      if (fcode == 0) {
        if (!parse_double(q, end, &v)) {
#pragma omp atomic write
          err = -5;
          break;
        }
      } else if (fcode == 1) {
        long long iv;
        if (!parse_long(q, qe, &iv)) {
#pragma omp atomic write
          err = -5;
          break;
        }
        v = (double)iv;
      }
      // 1-based -> 0-based (reference main.cpp:232-234)
      rows[idx] = (int)(i - 1);
      cols[idx] = (int)(j - 1);
      vals[idx] = v;
      ++idx;
    }
  }

  if (err) {
    free(rows);
    free(cols);
    free(vals);
    return err;
  }

  *nrows = m;
  *ncols = n;
  *nnz_out = nnz;
  *field_out = fcode;
  *sym_out = scode;
  *rows_out = rows;
  *cols_out = cols;
  *vals_out = vals;
  return 0;
}

}  // extern "C"

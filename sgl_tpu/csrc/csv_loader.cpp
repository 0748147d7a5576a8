// Native CSV / csv.gz loader for sgl_tpu's dataset layer.
//
// The reference loads OGB raw files through Python (`ogb` +
// pandas/numpy); this framework parses the raw csv.gz files directly
// (sgl_tpu/datasets/ogbn.py), and at ogbn-products scale (124M edge
// lines, 2.4M x 100 feature rows) numpy.loadtxt is the slowest host
// step of ingestion.  This loader streams the file through zlib
// (gzread handles plain files transparently), splits each decompressed
// chunk at line boundaries, and parses the segments in parallel with
// OpenMP using hand-rolled integer/float scanners.
//
// C ABI (loaded via ctypes in sgl_tpu/graph/native.py):
//   int64_t sgl_csv_load(path, dtype /*0=f32, 1=i64*/, &data, &rows, &cols)
//     -> 0 on success; data is malloc'd row-major [rows x cols], caller
//        must release it with sgl_buf_free.  Negative codes: -1 open
//        failure, -2 parse error (ragged row / non-numeric), -3 OOM.
//   void sgl_buf_free(void* p)

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <future>
#include <vector>

#include <zlib.h>

#ifdef _OPENMP
#include <omp.h>
#else
static int omp_get_max_threads() { return 1; }
#endif

namespace {

// Fast scanners for the OGB numeric csv dialect: optional sign, digits,
// optional fraction and exponent; fields separated by ',' and rows by
// '\n' (with optional '\r').  Whitespace-only padding is tolerated.

inline const char* skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) ++p;
  return p;
}

inline bool parse_i64(const char*& p, const char* end, int64_t& out) {
  p = skip_ws(p, end);
  bool neg = false;
  if (p < end && (*p == '-' || *p == '+')) neg = (*p++ == '-');
  if (p >= end || *p < '0' || *p > '9') return false;
  int64_t v = 0;
  while (p < end && *p >= '0' && *p <= '9') v = v * 10 + (*p++ - '0');
  out = neg ? -v : v;
  p = skip_ws(p, end);
  return true;
}

// exact double powers of ten (10^k is exactly representable for k <= 22)
static const double kPow10[23] = {
    1e0,  1e1,  1e2,  1e3,  1e4,  1e5,  1e6,  1e7,  1e8,  1e9,  1e10, 1e11,
    1e12, 1e13, 1e14, 1e15, 1e16, 1e17, 1e18, 1e19, 1e20, 1e21, 1e22};

inline bool parse_f32(const char*& p, const char* end, float& out) {
  p = skip_ws(p, end);
  bool neg = false;
  if (p < end && (*p == '-' || *p == '+')) neg = (*p++ == '-');
  const char* digits_start = p;
  // exact integer-mantissa accumulation: all significant digits go into
  // one uint64 (<= 19 digits is exact), the decimal point and any skipped
  // digits only adjust the final power-of-ten — this keeps the result
  // within one double rounding of the true value (float32 has 29 bits of
  // slack below double, so the f32 result matches strtof in practice)
  uint64_t mant = 0;
  int n_digits = 0;
  int e10 = 0;
  bool any = false;
  while (p < end && *p >= '0' && *p <= '9') {
    any = true;
    if (n_digits < 19) {
      mant = mant * 10 + static_cast<uint64_t>(*p - '0');
      ++n_digits;
    } else {
      ++e10;  // overflowed digits only shift the magnitude
    }
    ++p;
  }
  if (p < end && *p == '.') {
    ++p;
    while (p < end && *p >= '0' && *p <= '9') {
      any = true;
      if (n_digits < 19) {
        mant = mant * 10 + static_cast<uint64_t>(*p - '0');
        ++n_digits;
        --e10;
      }
      ++p;
    }
  }
  if (!any && p == digits_start) {
    // nan/inf (rare but numpy accepts them)
    if (end - p >= 3 && (std::strncmp(p, "nan", 3) == 0 || std::strncmp(p, "NaN", 3) == 0)) {
      p += 3;
      out = std::nanf("");
      return true;
    }
    if (end - p >= 3 && (std::strncmp(p, "inf", 3) == 0 || std::strncmp(p, "Inf", 3) == 0)) {
      p += 3;
      out = neg ? -INFINITY : INFINITY;
      return true;
    }
    return false;
  }
  if (p < end && (*p == 'e' || *p == 'E')) {
    ++p;
    bool eneg = false;
    if (p < end && (*p == '-' || *p == '+')) eneg = (*p++ == '-');
    if (p >= end || *p < '0' || *p > '9') return false;
    int ev = 0;
    while (p < end && *p >= '0' && *p <= '9') ev = ev * 10 + (*p++ - '0');
    e10 += eneg ? -ev : ev;
  }
  double v = static_cast<double>(mant);
  if (e10 >= 0) {
    v = (e10 <= 22) ? v * kPow10[e10] : v * std::pow(10.0, e10);
  } else {
    v = (e10 >= -22) ? v / kPow10[-e10] : v * std::pow(10.0, e10);
  }
  out = static_cast<float>(neg ? -v : v);
  p = skip_ws(p, end);
  return true;
}

// Parse one text segment (must start and end at line boundaries) into a
// tightly packed vector of values.  Returns false on any malformed row.
template <typename T, bool (*PARSE)(const char*&, const char*, T&)>
bool parse_segment(const char* p, const char* end, int64_t n_cols,
                   std::vector<T>& out, int64_t& rows) {
  rows = 0;
  while (p < end) {
    const char* line_end = static_cast<const char*>(
        std::memchr(p, '\n', static_cast<size_t>(end - p)));
    if (line_end == nullptr) line_end = end;
    const char* q = skip_ws(p, line_end);
    if (q < line_end) {  // skip blank lines like numpy.loadtxt
      for (int64_t c = 0; c < n_cols; ++c) {
        T v;
        if (!PARSE(q, line_end, v)) return false;
        out.push_back(v);
        if (c + 1 < n_cols) {
          if (q >= line_end || *q != ',') return false;
          ++q;
        }
      }
      if (q < line_end && *q == ',') return false;  // too many columns
      if (skip_ws(q, line_end) != line_end) return false;
      ++rows;
    }
    p = (line_end == end) ? end : line_end + 1;
  }
  return true;
}

struct GrowBuf {
  char* data = nullptr;
  int64_t size = 0;      // bytes used
  int64_t capacity = 0;  // bytes allocated
  bool reserve_more(int64_t extra) {
    if (size + extra <= capacity) return true;
    int64_t cap = capacity ? capacity : (64 << 10);
    while (cap < size + extra) cap += cap / 2;
    char* p = static_cast<char*>(std::realloc(data, static_cast<size_t>(cap)));
    if (p == nullptr) return false;
    data = p;
    capacity = cap;
    return true;
  }
};

template <typename T, bool (*PARSE)(const char*&, const char*, T&)>
int64_t load_csv(const char* path, void** out_data, int64_t* out_rows,
                 int64_t* out_cols) {
  gzFile f = gzopen(path, "rb");
  if (f == nullptr) return -1;
  gzbuffer(f, 1 << 20);

  // Ping-pong pipeline: a reader thread decompresses chunk i+1 while the
  // main thread parses chunk i — gz inflation and number parsing are of
  // the same order, so overlapping them nearly doubles throughput.
  constexpr int64_t MAXCARRY = 4 << 20;  // longest supported line
  constexpr int64_t CHUNK = 32 << 20;    // decompressed bytes parsed per round
  // buffer layout: [MAXCARRY carry prepend area][CHUNK read area]
  std::vector<char> bufs[2];
  bufs[0].resize(static_cast<size_t>(MAXCARRY + CHUNK));
  bufs[1].resize(static_cast<size_t>(MAXCARRY + CHUNK));

  GrowBuf buf;
  int64_t total_rows = 0;
  int64_t n_cols = -1;
  const int n_threads = omp_get_max_threads();

  auto read_chunk = [f](char* dst) -> int {
    return gzread(f, dst, static_cast<unsigned>(CHUNK));
  };

  int64_t carry = 0;  // bytes of partial line sitting before cur's read area
  std::future<int> pending =
      std::async(std::launch::deferred, read_chunk, bufs[0].data() + MAXCARRY);
  int cur = 0;
  bool reader_ahead = true;

  for (;;) {
    const int nread = pending.get();
    reader_ahead = false;
    if (nread < 0) {
      gzclose(f);
      std::free(buf.data);
      return -1;
    }
    const bool eof = (nread < CHUNK);
    if (!eof) {  // kick off the next read while this chunk parses
      pending = std::async(std::launch::async, read_chunk,
                           bufs[cur ^ 1].data() + MAXCARRY);
      reader_ahead = true;
    }
    char* base = bufs[cur].data() + MAXCARRY - carry;
    const int64_t avail = carry + nread;
    if (avail == 0) break;

    // parse only up to the last complete line unless at EOF
    int64_t parse_len = avail;
    if (!eof) {
      const char* nl = static_cast<const char*>(
          memrchr(base, '\n', static_cast<size_t>(avail)));
      if (nl == nullptr || (avail - ((nl - base) + 1)) > MAXCARRY) {
        if (reader_ahead) pending.get();
        gzclose(f);
        std::free(buf.data);
        return -2;  // single line longer than supported
      }
      parse_len = (nl - base) + 1;
    }

    if (n_cols < 0) {  // column count from the first line
      const char* first_end = static_cast<const char*>(
          std::memchr(base, '\n', static_cast<size_t>(parse_len)));
      if (first_end == nullptr) first_end = base + parse_len;
      n_cols = 1;
      for (const char* p = base; p < first_end; ++p) {
        if (*p == ',') ++n_cols;
      }
    }

    // split [0, parse_len) into per-thread segments at line boundaries
    std::vector<int64_t> bounds;
    bounds.push_back(0);
    for (int t = 1; t < n_threads; ++t) {
      int64_t pos = parse_len * t / n_threads;
      const char* nl = static_cast<const char*>(
          std::memchr(base + pos, '\n', static_cast<size_t>(parse_len - pos)));
      pos = (nl == nullptr) ? parse_len : (nl - base) + 1;
      if (pos > bounds.back()) bounds.push_back(pos);
    }
    if (bounds.back() != parse_len) bounds.push_back(parse_len);
    const int n_seg = static_cast<int>(bounds.size()) - 1;

    std::vector<std::vector<T>> seg_vals(n_seg);
    std::vector<int64_t> seg_rows(n_seg, 0);
    bool ok = true;
#pragma omp parallel for schedule(static) reduction(&& : ok) if (n_seg > 1)
    for (int s = 0; s < n_seg; ++s) {
      seg_vals[s].reserve(
          static_cast<size_t>((bounds[s + 1] - bounds[s]) / 2));
      ok = ok && parse_segment<T, PARSE>(base + bounds[s],
                                         base + bounds[s + 1], n_cols,
                                         seg_vals[s], seg_rows[s]);
    }
    if (!ok) {
      if (reader_ahead) pending.get();
      gzclose(f);
      std::free(buf.data);
      return -2;
    }
    for (int s = 0; s < n_seg; ++s) {
      const int64_t bytes = static_cast<int64_t>(seg_vals[s].size()) *
                            static_cast<int64_t>(sizeof(T));
      if (!buf.reserve_more(bytes)) {
        if (reader_ahead) pending.get();
        gzclose(f);
        std::free(buf.data);
        return -3;
      }
      std::memcpy(buf.data + buf.size, seg_vals[s].data(),
                  static_cast<size_t>(bytes));
      buf.size += bytes;
      total_rows += seg_rows[s];
    }

    const int64_t new_carry = avail - parse_len;
    if (eof) break;
    // the carry tail precedes the NEXT buffer's read area (disjoint from
    // the region its in-flight read writes, so this copy is race-free)
    if (new_carry > 0) {
      std::memcpy(bufs[cur ^ 1].data() + MAXCARRY - new_carry,
                  base + parse_len, static_cast<size_t>(new_carry));
    }
    carry = new_carry;
    cur ^= 1;
  }
  gzclose(f);

  *out_data = buf.data;
  *out_rows = total_rows;
  *out_cols = (n_cols < 0) ? 0 : n_cols;
  return 0;
}

}  // namespace

extern "C" {

int64_t sgl_csv_load(const char* path, int dtype, void** out_data,
                     int64_t* out_rows, int64_t* out_cols) {
  if (dtype == 0) {
    return load_csv<float, parse_f32>(path, out_data, out_rows, out_cols);
  }
  if (dtype == 1) {
    return load_csv<int64_t, parse_i64>(path, out_data, out_rows, out_cols);
  }
  return -4;
}

void sgl_buf_free(void* p) { std::free(p); }

}  // extern "C"

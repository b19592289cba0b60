// Native host runtime for the OMR client-side decoder.
//
// Counterpart of the reference's compiled hot loops on the retriever path:
// Gaussian elimination + back substitution over Z_p with payload-vector
// right-hand sides (reference omr_core/src/matrix.rs:78-336, including the
// unchecked-indexing fast paths at matrix.rs:43-75) and the bucket scan /
// digit recomposition of decode_pertinent_indices
// (omr_core/src/retriever.rs:93-123).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

int64_t inv_mod(int64_t a, int64_t p) {
  // extended Euclid; returns -1 if not invertible
  int64_t g = a % p, b = p, x0 = 1, x1 = 0;
  while (b != 0) {
    int64_t q = g / b;
    int64_t t = g - q * b;
    g = b;
    b = t;
    t = x0 - q * x1;
    x0 = x1;
    x1 = t;
  }
  if (g != 1 && g != -1) return -1;
  x0 %= p;
  if (x0 < 0) x0 += p;
  return x0;
}

}  // namespace

extern "C" {

// Solve matrix (rows x cols, row-major) * x = rhs (rows x plen) mod p.
// Writes x (cols x plen) into out. Returns 0 on success, -1 if singular.
int omr_solve_matrix(int64_t* m, int64_t* r, int64_t rows, int64_t cols,
                     int64_t plen, int64_t p, int64_t* out) {
  if (rows < cols) return -1;
  for (int64_t c = 0; c < cols; ++c) {
    // pivot: first row >= c with invertible entry
    int64_t piv = -1, inv = -1;
    for (int64_t rr = c; rr < rows; ++rr) {
      inv = inv_mod(m[rr * cols + c] % p, p);
      if (inv >= 0) {
        piv = rr;
        break;
      }
    }
    if (piv < 0) return -1;
    if (piv != c) {
      for (int64_t k = 0; k < cols; ++k)
        std::swap(m[c * cols + k], m[piv * cols + k]);
      for (int64_t k = 0; k < plen; ++k)
        std::swap(r[c * plen + k], r[piv * plen + k]);
    }
    for (int64_t k = 0; k < cols; ++k)
      m[c * cols + k] = m[c * cols + k] * inv % p;
    for (int64_t k = 0; k < plen; ++k)
      r[c * plen + k] = r[c * plen + k] * inv % p;
    for (int64_t rr = c + 1; rr < rows; ++rr) {
      int64_t f = m[rr * cols + c] % p;
      if (f == 0) continue;
      for (int64_t k = c; k < cols; ++k) {
        int64_t v = (m[rr * cols + k] - f * m[c * cols + k]) % p;
        m[rr * cols + k] = v < 0 ? v + p : v;
      }
      for (int64_t k = 0; k < plen; ++k) {
        int64_t v = (r[rr * plen + k] - f * r[c * plen + k]) % p;
        r[rr * plen + k] = v < 0 ? v + p : v;
      }
    }
  }
  // back substitution
  for (int64_t c = cols - 1; c >= 0; --c) {
    for (int64_t rr = 0; rr < c; ++rr) {
      int64_t f = m[rr * cols + c] % p;
      if (f == 0) continue;
      m[rr * cols + c] = 0;
      for (int64_t k = 0; k < plen; ++k) {
        int64_t v = (r[rr * plen + k] - f * r[c * plen + k]) % p;
        r[rr * plen + k] = v < 0 ? v + p : v;
      }
    }
  }
  std::memcpy(out, r, sizeof(int64_t) * cols * plen);
  return 0;
}

// Scan decoded digest coefficients for flag==1 buckets and recompose indices.
// decoded: n_seg * sps values; layout [segment][bucket][slot], spb slots per
// bucket of which the last is the flag. Appends found indices (< max_index)
// to out (capacity cap); returns the count found.
int omr_scan_buckets(const int64_t* decoded, int64_t n_seg, int64_t sps,
                     int64_t spb, int64_t n_buckets, int64_t p,
                     int64_t max_index, int64_t* out, int64_t cap) {
  int64_t found = 0;
  for (int64_t s = 0; s < n_seg; ++s) {
    const int64_t* seg = decoded + s * sps;
    for (int64_t b = 0; b < n_buckets; ++b) {
      const int64_t* bucket = seg + b * spb;
      if (bucket[spb - 1] != 1) continue;
      int64_t idx = 0;
      for (int64_t k = spb - 2; k >= 0; --k) idx = idx * p + bucket[k];
      if (idx < max_index && found < cap) out[found++] = idx;
    }
  }
  return static_cast<int>(found);
}

}  // extern "C"

// Native host-side utilities for ising-tpu.
//
// The reference carries a C host-utility layer (checked I/O wrappers,
// optimized/utils.c:33-139) and an OpenMP-parallel lattice dump
// (optimized/main.cu:1140-1209).  Python suffices for argument checking,
// but the dump/load of multi-gigabyte lattices is a real host hot path, so
// the text codec lives here; a second, independently-written Philox4x32-10
// cross-checks the JAX implementation's known-answer tests.
//
// Exposed as a plain C ABI, loaded from Python with ctypes (no pybind11 in
// this environment).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include "chacha.h"

extern "C" {

// ---------------------------------------------------------------------------
// Hex lattice dump: one '0'/'1' character per spin, one line per row
// (the reloadable equivalent of the reference's dumpLattice format).

// Returns 0 on success, -1 on I/O error.
int ising_write_hex(const char* path, const uint8_t* bits,
                    int64_t rows, int64_t cols) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  std::vector<char> line(cols + 1);
  line[cols] = '\n';
  for (int64_t r = 0; r < rows; ++r) {
    const uint8_t* src = bits + r * cols;
    for (int64_t c = 0; c < cols; ++c) line[c] = (char)('0' + (src[c] & 1));
    if (fwrite(line.data(), 1, cols + 1, f) != (size_t)(cols + 1)) {
      fclose(f);
      return -1;
    }
  }
  return fclose(f) == 0 ? 0 : -1;
}

// First pass: probe dimensions. Returns 0 on success.
int ising_read_hex_dims(const char* path, int64_t* rows, int64_t* cols) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  int64_t r = 0, c = 0;
  int ch;
  int64_t cur = 0;
  while ((ch = fgetc(f)) != EOF) {
    if (ch == '\n') {
      if (cur > 0) {
        if (c == 0) c = cur;
        else if (c != cur) { fclose(f); return -2; }  // ragged rows
        ++r;
        cur = 0;
      }
    } else if (ch == '0' || ch == '1') {
      ++cur;
    } else if (ch != '\r') {
      fclose(f);
      return -3;  // unexpected character
    }
  }
  if (cur > 0) { if (c == 0) c = cur; ++r; }
  fclose(f);
  *rows = r;
  *cols = c;
  return 0;
}

// Second pass: fill a rows*cols uint8 buffer. Returns 0 on success.
int ising_read_hex_fill(const char* path, uint8_t* out,
                        int64_t rows, int64_t cols) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  int64_t n = 0, total = rows * cols;
  int ch;
  while ((ch = fgetc(f)) != EOF && n < total) {
    if (ch == '0' || ch == '1') out[n++] = (uint8_t)(ch - '0');
  }
  fclose(f);
  return n == total ? 0 : -4;
}

// ---------------------------------------------------------------------------
// Philox4x32-10 (independent implementation for cross-validation).

static inline void mulhilo(uint32_t a, uint32_t b, uint32_t* hi,
                           uint32_t* lo) {
  uint64_t p = (uint64_t)a * (uint64_t)b;
  *hi = (uint32_t)(p >> 32);
  *lo = (uint32_t)p;
}

void ising_philox4x32(const uint32_t ctr_in[4], const uint32_t key_in[2],
                      int rounds, uint32_t out[4]) {
  uint32_t c0 = ctr_in[0], c1 = ctr_in[1], c2 = ctr_in[2], c3 = ctr_in[3];
  uint32_t k0 = key_in[0], k1 = key_in[1];
  for (int r = 0; r < rounds; ++r) {
    uint32_t hi0, lo0, hi1, lo1;
    mulhilo(0xD2511F53u, c0, &hi0, &lo0);
    mulhilo(0xCD9E8D57u, c2, &hi1, &lo1);
    c0 = hi1 ^ c1 ^ k0;
    c1 = lo1;
    c2 = hi0 ^ c3 ^ k1;
    c3 = lo0;
    if (r != rounds - 1) {
      k0 += 0x9E3779B9u;
      k1 += 0xBB67AE85u;
    }
  }
  out[0] = c0; out[1] = c1; out[2] = c2; out[3] = c3;
}

// Bulk draws matching the library's quad contract for one plane row range:
// for row y in [row0, row0+nrows), quad q_g = y*(cols/4) + (col mod cols/4),
// slot = col / (cols/4). Fills out[nrows*cols].
void ising_philox_plane(uint64_t seed, uint32_t step, uint32_t tag,
                        int64_t row0, int64_t nrows, int64_t cols,
                        uint32_t* out) {
  const int64_t g = cols / 4;
  const uint32_t key[2] = {(uint32_t)(seed & 0xFFFFFFFFu),
                           (uint32_t)(seed >> 32)};
  for (int64_t y = 0; y < nrows; ++y) {
    for (int64_t j = 0; j < g; ++j) {
      uint64_t q = (uint64_t)(row0 + y) * (uint64_t)g + (uint64_t)j;
      uint32_t ctr[4] = {(uint32_t)(q & 0xFFFFFFFFu), (uint32_t)(q >> 32),
                         step, tag};
      uint32_t o[4];
      ising_philox4x32(ctr, key, 10, o);
      for (int s = 0; s < 4; ++s) out[y * cols + s * g + j] = o[s];
    }
  }
}

// ---------------------------------------------------------------------------
// ChaCha-R (independent scalar twin; see chacha.h). Block + bulk-plane entry
// points mirroring the library's chacha draw contract
// (rng.py chacha_color_draws): one block covers 16 lane-group slots,
// draw(y, col) = out[col / g] of counter q = y*g + (col mod g), g = cols/16.

void ising_chacha_block(uint32_t c0, uint32_t c1, uint32_t step, uint32_t tag,
                        uint32_t k0, uint32_t k1, int rounds,
                        uint32_t out[16]) {
  ising_chacha::block(c0, c1, step, tag, k0, k1, rounds, out);
}

void ising_chacha_plane(uint64_t seed, uint32_t step, uint32_t tag,
                        int64_t row0, int64_t nrows, int64_t cols, int rounds,
                        uint32_t* out) {
  const int64_t g = cols / 16;
  const uint32_t k0 = (uint32_t)(seed & 0xFFFFFFFFu);
  const uint32_t k1 = (uint32_t)(seed >> 32);
  for (int64_t y = 0; y < nrows; ++y) {
    for (int64_t j = 0; j < g; ++j) {
      uint64_t q = (uint64_t)(row0 + y) * (uint64_t)g + (uint64_t)j;
      uint32_t o[16];
      ising_chacha::block((uint32_t)(q & 0xFFFFFFFFu), (uint32_t)(q >> 32),
                          step, tag, k0, k1, rounds, o);
      for (int s = 0; s < 16; ++s) out[y * cols + s * g + j] = o[s];
    }
  }
}

}  // extern "C"

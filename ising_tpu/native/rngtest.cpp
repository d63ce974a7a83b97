// Statistical qualification battery for reduced-round ChaCha plane streams,
// run on the stream AS CONSUMED by the "...b" bit-plane rng modes
// (rng.py RNG_MODES; ops/pallas_bit1.py _bitserial_lt_planes).
//
// Consumption model. For each sweep step s and color t, the kernel draws
// one ChaCha block per 32-spin word: counter (q, s, TAG_SWEEP|t) under the
// seed key; output words o[0..15] are the 16 bit-planes of that word, and
// spin g consumes the 16-bit uniform v(g) = sum_z ((o[z]>>g)&1) << z,
// compared against static thresholds. The battery generates blocks over
// (q, s, t) exactly like a Q-word lattice swept S times, and tests BOTH
// domains: the assembled per-spin v16 stream (what acceptance compares)
// and the raw word stream (what the planes are made of).
//
// Tests (all streaming; chi-square / z-score -> p-value):
//   freq16     chi-square of v16 over 65536 bins (marginal uniformity)
//   bitpos     worst per-bit-position frequency of v16 (plane-level bias;
//              Bonferroni x16)
//   bitpair    worst pairwise same-position bit correlation among the 120
//              (z1 < z2) plane pairs — the intra-block joint structure
//              acceptance actually consumes (Bonferroni x120)
//   intra      Pearson r of (v(g), v(g+1)) within a block
//   serial     Pearson r of (v_q(g), v_{q+1}(g)) across adjacent counters
//   temporal   Pearson r of v at the same (q, g) on successive color
//              phases (the same site's draws one half-sweep apart)
//   runs       total bit transitions inside each 512-bit block
//   bytes      chi-square of the word stream's byte histogram
//   rank       GF(2) rank of 32x32 matrices from 32 consecutive words
//              (NIST cell probabilities .2888 / .5776 / .1336)
//   bday       Marsaglia birthday spacings on o[0] words (n = 4096 per
//              (s, t) trial, lambda = 4, Poisson-aggregated)
//
// Verdict: FAIL if any p < 1e-9 (a real defect at these sample sizes lands
// at p ~ 0; 1e-9 across ~10 statistics keeps false alarms negligible),
// WEAK if any p < 1e-6, else PASS. The battery's teeth are demonstrated on
// chacha2 — and its headroom on chacha4/6/8 — by scripts/rng_battery.py,
// whose logs are committed under docs/rng_battery/.
//
// Usage: rngtest <rounds> <log2Q> <steps> [seed]
//   e.g. rngtest 8 16 256 -> 2^16 words x 256 steps x 2 colors
//                            = 2^25 blocks = 2 GiB of keystream.

#include <algorithm>
#include <cinttypes>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include "chacha.h"

namespace {

double normal_two_sided_p(double z) {
  return erfc(std::fabs(z) / std::sqrt(2.0));
}

// Upper-tail chi-square p: exact for dof 2, Wilson-Hilferty otherwise
// (excellent at the dof >= 255 used here).
double chi2_upper_p(double x, double dof) {
  if (dof == 2.0) return std::exp(-x / 2.0);
  double t = std::cbrt(x / dof);
  double mu = 1.0 - 2.0 / (9.0 * dof);
  double sd = std::sqrt(2.0 / (9.0 * dof));
  return 0.5 * erfc((t - mu) / sd / std::sqrt(2.0));
}

struct Corr {  // streaming Pearson accumulator
  unsigned long long n = 0;
  unsigned long long sx = 0, sy = 0;
  unsigned __int128 sxx = 0, syy = 0, sxy = 0;
  inline void add(uint32_t x, uint32_t y) {
    ++n;
    sx += x;
    sy += y;
    sxx += (unsigned long long)x * x;
    syy += (unsigned long long)y * y;
    sxy += (unsigned long long)x * y;
  }
  double z() const {
    double N = (double)n;
    double mx = sx / N, my = sy / N;
    double cxx = (double)sxx - N * mx * mx;
    double cyy = (double)syy - N * my * my;
    double cxy = (double)sxy - N * mx * my;
    return cxy / std::sqrt(cxx * cyy) * std::sqrt(N);
  }
};

int rank32(uint32_t m[32]) {  // GF(2) rank by elimination
  int rank = 0;
  for (int bit = 31; bit >= 0 && rank < 32; --bit) {
    int piv = -1;
    for (int i = rank; i < 32; ++i)
      if ((m[i] >> bit) & 1) {
        piv = i;
        break;
      }
    if (piv < 0) continue;
    std::swap(m[rank], m[piv]);
    for (int i = 0; i < 32; ++i)
      if (i != rank && ((m[i] >> bit) & 1)) m[i] ^= m[rank];
    ++rank;
  }
  return rank;
}

struct Result {
  const char* name;
  double stat;
  double p;
};

}  // namespace

int main(int argc, char** argv) {
  if (argc < 4) {
    fprintf(stderr, "usage: %s <rounds> <log2Q> <steps> [seed]\n", argv[0]);
    return 2;
  }
  const int rounds = atoi(argv[1]);
  const int log2q = atoi(argv[2]);
  const long steps = atol(argv[3]);
  const uint64_t seed =
      argc > 4 ? strtoull(argv[4], nullptr, 0) : 463463564571ull;
  const uint64_t Q = 1ull << log2q;
  const uint32_t k0 = (uint32_t)(seed & 0xFFFFFFFFu);
  const uint32_t k1 = (uint32_t)(seed >> 32);

  std::vector<uint64_t> hist16(65536, 0);
  uint64_t bitcnt[16] = {0};
  uint64_t pair11[16][16] = {{0}};
  Corr intra, serial, temporal;
  uint64_t transitions = 0, blocks = 0;
  std::vector<uint64_t> hist256(256, 0);
  uint64_t rankcnt[3] = {0, 0, 0};  // rank 32 / 31 / <=30
  uint64_t bday_dups = 0, bday_trials = 0;
  const uint64_t BDAY_N = 4096;  // lambda = n^3 / (4 * 2^32) = 4

  std::vector<uint16_t> vprev(Q * 32), vcur(Q * 32);
  std::vector<uint32_t> bday(BDAY_N);
  uint32_t mat[32];
  int matfill = 0;
  long phase = 0;

  for (long s = 0; s < steps; ++s) {
    for (int color = 0; color < 2; ++color, ++phase) {
      uint16_t vblk_prev[32];
      bool have_prev = false;
      for (uint64_t q = 0; q < Q; ++q) {
        uint32_t o[16];
        ising_chacha::block((uint32_t)(q & 0xFFFFFFFFu), (uint32_t)(q >> 32),
                            (uint32_t)s, (uint32_t)color, k0, k1, rounds, o);
        ++blocks;
        // assembled per-spin 16-bit uniforms (the consumed values)
        uint16_t v[32];
        for (int g = 0; g < 32; ++g) {
          uint32_t val = 0;
          for (int z = 0; z < 16; ++z) val |= ((o[z] >> g) & 1u) << z;
          v[g] = (uint16_t)val;
          ++hist16[val];
          vcur[q * 32 + g] = (uint16_t)val;
        }
        for (int g = 0; g + 1 < 32; ++g) intra.add(v[g], v[g + 1]);
        if (have_prev)
          for (int g = 0; g < 32; ++g) serial.add(vblk_prev[g], v[g]);
        memcpy(vblk_prev, v, sizeof v);
        have_prev = true;
        // word-domain tests (ones in plane word z == ones at bit z of v16)
        for (int z = 0; z < 16; ++z) {
          uint32_t w = o[z];
          bitcnt[z] += __builtin_popcount(w);
          for (int z2 = z + 1; z2 < 16; ++z2)
            pair11[z][z2] += __builtin_popcount(w & o[z2]);
          hist256[w & 0xFF]++;
          hist256[(w >> 8) & 0xFF]++;
          hist256[(w >> 16) & 0xFF]++;
          hist256[(w >> 24) & 0xFF]++;
          transitions += __builtin_popcount((w ^ (w >> 1)) & 0x7FFFFFFFu);
          if (z + 1 < 16)
            transitions += (w >> 31) ^ (o[z + 1] & 1u);
          mat[matfill++] = w;
          if (matfill == 32) {
            matfill = 0;
            int r = rank32(mat);
            ++rankcnt[r >= 32 ? 0 : (r == 31 ? 1 : 2)];
          }
        }
        if (q < BDAY_N) bday[q] = o[0];
      }
      // temporal: this phase vs the previous one, same (q, g)
      if (phase > 0)
        for (uint64_t i = 0; i < Q * 32; ++i) temporal.add(vprev[i], vcur[i]);
      std::swap(vprev, vcur);
      // birthday spacings for this (s, color) trial; needs a full buffer
      // (Q < BDAY_N would leave stale values from the previous trial and
      // inflate the duplicate count — skip the test at tiny log2q)
      if (Q >= BDAY_N) {
        std::sort(bday.begin(), bday.end());
        std::vector<uint32_t> sp(BDAY_N - 1);
        for (uint64_t i = 0; i + 1 < BDAY_N; ++i)
          sp[i] = bday[i + 1] - bday[i];
        std::sort(sp.begin(), sp.end());
        for (uint64_t i = 0; i + 1 < BDAY_N - 1; ++i)
          if (sp[i] == sp[i + 1]) ++bday_dups;
        ++bday_trials;
      }
    }
  }

  const double Nv = (double)blocks * 32.0;  // total v16 samples
  std::vector<Result> results;

  {  // freq16
    double e = Nv / 65536.0, chi2 = 0;
    for (int i = 0; i < 65536; ++i) {
      double d = (double)hist16[i] - e;
      chi2 += d * d / e;
    }
    results.push_back({"freq16", chi2, chi2_upper_p(chi2, 65535.0)});
  }
  {  // bitpos (worst of 16, Bonferroni)
    double worst = 0;
    for (int z = 0; z < 16; ++z) {
      double zz = (2.0 * (double)bitcnt[z] - Nv) / std::sqrt(Nv);
      worst = std::max(worst, std::fabs(zz));
    }
    double p = std::min(1.0, 16.0 * normal_two_sided_p(worst));
    results.push_back({"bitpos", worst, p});
  }
  {  // bitpair (worst of 120, Bonferroni)
    double worst = 0;
    for (int z = 0; z < 16; ++z)
      for (int z2 = z + 1; z2 < 16; ++z2) {
        double c = (double)pair11[z][z2];
        double zz = (c - Nv / 4.0) / std::sqrt(Nv * 3.0 / 16.0);
        worst = std::max(worst, std::fabs(zz));
      }
    double p = std::min(1.0, 120.0 * normal_two_sided_p(worst));
    results.push_back({"bitpair", worst, p});
  }
  results.push_back({"intra", intra.z(), normal_two_sided_p(intra.z())});
  results.push_back({"serial", serial.z(), normal_two_sided_p(serial.z())});
  results.push_back(
      {"temporal", temporal.z(), normal_two_sided_p(temporal.z())});
  {  // runs: 511 adjacent-bit pairs per block, P(transition) = 1/2
    double npairs = (double)blocks * 511.0;
    double zz = ((double)transitions - npairs / 2.0) / std::sqrt(npairs / 4.0);
    results.push_back({"runs", zz, normal_two_sided_p(zz)});
  }
  {  // bytes
    double nb = (double)blocks * 64.0, e = nb / 256.0, chi2 = 0;
    for (int i = 0; i < 256; ++i) {
      double d = (double)hist256[i] - e;
      chi2 += d * d / e;
    }
    results.push_back({"bytes", chi2, chi2_upper_p(chi2, 255.0)});
  }
  {  // rank (NIST 32x32 cell probabilities)
    const double pr[3] = {0.2888, 0.5776, 0.1336};
    double nm = (double)(rankcnt[0] + rankcnt[1] + rankcnt[2]);
    double chi2 = 0;
    for (int i = 0; i < 3; ++i) {
      double e = nm * pr[i], d = (double)rankcnt[i] - e;
      chi2 += d * d / e;
    }
    results.push_back({"rank", chi2, chi2_upper_p(chi2, 2.0)});
  }
  if (bday_trials) {  // birthday spacings: duplicates ~ Poisson(4 * trials)
    double mu = 4.0 * (double)bday_trials;
    double zz = ((double)bday_dups - mu) / std::sqrt(mu);
    results.push_back({"bday", zz, normal_two_sided_p(zz)});
  }

  int fails = 0, weaks = 0;
  double worst_p = 1.0;
  const char* worst_name = "-";
  for (const Result& r : results) {
    const char* verdict = r.p < 1e-9 ? "FAIL" : (r.p < 1e-6 ? "WEAK" : "pass");
    if (r.p < 1e-9) ++fails;
    else if (r.p < 1e-6) ++weaks;
    if (r.p < worst_p) {
      worst_p = r.p;
      worst_name = r.name;
    }
    printf("RESULT rounds=%d %-8s stat=%+.4g p=%.3g %s\n", rounds, r.name,
           r.stat, r.p, verdict);
  }
  printf("VERDICT rounds=%d blocks=%" PRIu64 " (%.2f GiB keystream) %s "
         "worst=%s p=%.3g\n",
         rounds, blocks, blocks * 64.0 / (1 << 30),
         fails ? "FAIL" : (weaks ? "WEAK" : "PASS"), worst_name, worst_p);
  return fails ? 1 : 0;
}

// gfnative: native host runtime for the tpu-genefuse engine.
//
// Covers the host-side hot paths that numpy handles poorly:
//   - rolling k-mer extraction over panel slices (reference:
//     src/core/indexer.rs:179-241 semantics, including the final-k-mer
//     exclusion off-by-one)
//   - stable grouping of (kmer, contig, pos) entries by kmer
//   - sequential 2-choice + cuckoo-eviction placement of the device hash
//     table (tight load factors the vectorized numpy builder can't reach)
//
// C ABI, loaded via ctypes (no pybind11 in this image). All buffers are
// caller-allocated numpy arrays.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

extern "C" {

// Rolling 16-mers with validity over 2-bit codes (255 = invalid base).
// Emits entries for positions [0, n_kmers_limit) where the window is clean.
// Returns the number of entries written.
int64_t gf_rolling_entries(const uint8_t* codes, int64_t n,
                           int32_t contig, int32_t start_offset,
                           int64_t exclude_last,  // 1: drop final kmer (index build)
                           uint32_t* out_kmers, int32_t* out_ctg,
                           int32_t* out_pos) {
  const int K = 16;
  if (n < K) return 0;
  int64_t limit = n - K + 1 - (exclude_last ? 1 : 0);
  if (limit <= 0) return 0;
  int64_t m = 0;
  uint32_t kmer = 0;
  int run = 0;  // consecutive valid codes ending at current position
  // warm up first K-1 bases
  for (int64_t i = 0; i < n && (i < limit + K - 1); ++i) {
    uint8_t c = codes[i];
    if (c > 3) {
      run = 0;
      kmer = 0;
    } else {
      kmer = (kmer << 2) | c;
      ++run;
    }
    int64_t p = i - K + 1;  // kmer start position
    if (p >= 0 && p < limit && run >= K) {
      out_kmers[m] = kmer;
      out_ctg[m] = contig;
      out_pos[m] = (int32_t)(p + start_offset);
      ++m;
    }
  }
  return m;
}

// Stable argsort of entries by kmer via 3-pass LSD radix (11/11/10 bits);
// radix passes are inherently stable. order_out receives the permutation.
void gf_stable_sort_by_kmer(const uint32_t* kmers, int64_t n,
                            int64_t* order_out) {
  std::vector<int64_t> cur(n), nxt(n);
  for (int64_t i = 0; i < n; ++i) cur[i] = i;
  const int bits[3] = {11, 11, 10};
  int shift = 0;
  for (int pass = 0; pass < 3; ++pass) {
    int b = bits[pass];
    int64_t buckets = 1ll << b;
    uint32_t mask = (uint32_t)(buckets - 1);
    std::vector<int64_t> count((size_t)buckets + 1, 0);
    for (int64_t i = 0; i < n; ++i)
      ++count[((kmers[cur[i]] >> shift) & mask) + 1];
    for (int64_t i = 0; i < buckets; ++i) count[i + 1] += count[i];
    for (int64_t i = 0; i < n; ++i) {
      uint32_t d = (kmers[cur[i]] >> shift) & mask;
      nxt[count[d]++] = cur[i];
    }
    cur.swap(nxt);
    shift += b;
  }
  std::memcpy(order_out, cur.data(), (size_t)n * sizeof(int64_t));
}

static inline uint32_t h1(uint32_t k, int shift) {
  return (uint32_t)(k * 0x9E3779B1u) >> shift;
}
static inline uint32_t h2(uint32_t k, int shift) {
  return (uint32_t)((k ^ (k >> 15)) * 0x85EBCA6Bu + 0xC2B2AE35u) >> shift;
}

// Sequential 2-choice placement with cuckoo-eviction fallback.
// table layout: (nb, slots, 3) int32 rows [key, contig, pos]; empty contig
// sentinel must be pre-filled by the caller (-3). Returns 0 on success,
// number of unplaceable keys on failure.
int64_t gf_pack_table(const uint32_t* keys, const int32_t* contigs,
                      const int32_t* poss, int64_t n, int32_t* table,
                      int64_t nb, int32_t shift, int32_t slots) {
  std::vector<uint8_t> fill((size_t)nb, 0);
  auto place = [&](uint32_t key, int32_t ctg, int32_t pos, uint32_t b) {
    int64_t base = ((int64_t)b * slots + fill[b]) * 3;
    table[base] = (int32_t)key;
    table[base + 1] = ctg;
    table[base + 2] = pos;
    ++fill[b];
  };
  int64_t failed = 0;
  std::mt19937 rng(12345);
  for (int64_t i = 0; i < n; ++i) {
    uint32_t k = keys[i];
    uint32_t b1 = h1(k, shift), b2 = h2(k, shift);
    uint32_t b = (fill[b1] <= fill[b2]) ? b1 : b2;
    if (fill[b] < slots) {
      place(k, contigs[i], poss[i], b);
      continue;
    }
    uint32_t bo = (b == b1) ? b2 : b1;
    if (fill[bo] < slots) {
      place(k, contigs[i], poss[i], bo);
      continue;
    }
    // cuckoo random walk
    uint32_t ck = k;
    int32_t cc = contigs[i], cp = poss[i];
    uint32_t cb = b1;
    bool ok = false;
    for (int kick = 0; kick < 1000; ++kick) {
      if (fill[cb] < slots) {
        place(ck, cc, cp, cb);
        ok = true;
        break;
      }
      int s = (int)(rng() % slots);
      int64_t base = ((int64_t)cb * slots + s) * 3;
      uint32_t vk = (uint32_t)table[base];
      int32_t vc = table[base + 1], vp = table[base + 2];
      table[base] = (int32_t)ck;
      table[base + 1] = cc;
      table[base + 2] = cp;
      ck = vk; cc = vc; cp = vp;
      cb = (h1(ck, shift) == cb) ? h2(ck, shift) : h1(ck, shift);
    }
    if (!ok) ++failed;
  }
  return failed;
}

// Byte -> 2-bit code tokenization (A=0,T=1,C=2,G=3, else 255), uppercase
// and lowercase accepted? No: reference encoders accept uppercase only
// (panel slices are uppercased before indexing).
void gf_encode_bases(const uint8_t* bytes, int64_t n, uint8_t* out) {
  static uint8_t lut[256];
  static bool init = false;
  if (!init) {
    memset(lut, 255, 256);
    lut[(int)'A'] = 0; lut[(int)'T'] = 1; lut[(int)'C'] = 2; lut[(int)'G'] = 3;
    init = true;
  }
  for (int64_t i = 0; i < n; ++i) out[i] = lut[bytes[i]];
}


// Pack a paired-end read batch into the device upload layout
// [s1p(w2) | q1p(w4) | s2p(w2) | q2p(w4)] per row, where w2=(L+1)/2 4-bit
// sequence codes (0..3=ACGT, 4=N, 5..8=acgt, 9=n, 15=other/padding) and
// w4=(L+3)/4 2-bit quality classes (0 low<=Q15, 1 mid, 2 high>=Q30) —
// exactly genefuserust_tpu/ops/pack.py. Rows B..outB and columns
// Lin..L replicate the numpy zero-padding semantics (pad bytes are value
// 0 -> seq code 15, qual class 0). exotic[r]=1 when any byte within the
// read span falls outside ACGTNacgtn (host-oracle routing).
void gf_pack_pe_batch(const uint8_t* b1, const uint8_t* q1,
                      const uint8_t* b2, const uint8_t* q2,
                      const int32_t* l1, const int32_t* l2,
                      int64_t B, int64_t Lin, int64_t L, int64_t outB,
                      uint8_t* out, uint8_t* exotic) {
  static uint8_t seq4[256];
  static uint8_t okb[256];
  static bool init = false;
  if (!init) {
    memset(seq4, 15, 256);
    seq4[(int)'A'] = 0; seq4[(int)'T'] = 1; seq4[(int)'C'] = 2;
    seq4[(int)'G'] = 3; seq4[(int)'N'] = 4;
    seq4[(int)'a'] = 5; seq4[(int)'t'] = 6; seq4[(int)'c'] = 7;
    seq4[(int)'g'] = 8; seq4[(int)'n'] = 9;
    memset(okb, 0, 256);
    const char* okc = "ACGTNacgtn";
    for (const char* p = okc; *p; ++p) okb[(int)*p] = 1;
    init = true;
  }
  const int64_t w2 = (L + 1) / 2, w4 = (L + 3) / 4;
  const int64_t W = 2 * w2 + 2 * w4;
  auto pack_side = [&](const uint8_t* s, const uint8_t* q, int64_t len,
                       uint8_t* os, uint8_t* oq, uint8_t* ex) {
    for (int64_t i = 0; i < w2; ++i) {
      int64_t j0 = 2 * i, j1 = 2 * i + 1;
      uint8_t c0 = (j0 < Lin) ? seq4[s[j0]] : 15;
      uint8_t c1 = (j1 < Lin) ? seq4[s[j1]] : 15;
      os[i] = (uint8_t)(c0 | (c1 << 4));
    }
    for (int64_t i = 0; i < w4; ++i) {
      uint8_t b = 0;
      for (int k = 0; k < 4; ++k) {
        int64_t j = 4 * i + k;
        uint8_t qb = (j < Lin) ? q[j] : 0;
        uint8_t qc = (qb >= (uint8_t)'?') ? 2 : ((qb <= (uint8_t)'0') ? 0 : 1);
        b |= (uint8_t)(qc << (2 * k));
      }
      oq[i] = b;
    }
    for (int64_t i = 0; i < len && i < Lin; ++i)
      if (!okb[s[i]]) { *ex = 1; break; }
  };
  for (int64_t r = 0; r < B; ++r) {
    uint8_t* o = out + r * W;
    uint8_t ex = 0;
    pack_side(b1 + r * Lin, q1 + r * Lin, l1[r], o, o + w2, &ex);
    pack_side(b2 + r * Lin, q2 + r * Lin, l2[r], o + w2 + w4,
              o + 2 * w2 + w4, &ex);
    exotic[r] = ex;
  }
  // padded rows: zero input bytes -> seq nibbles 15, qual classes 0
  for (int64_t r = B; r < outB; ++r) {
    uint8_t* o = out + r * W;
    memset(o, 0xFF, (size_t)w2);
    memset(o + w2, 0x00, (size_t)w4);
    memset(o + w2 + w4, 0xFF, (size_t)w2);
    memset(o + 2 * w2 + w4, 0x00, (size_t)w4);
  }
}

}  // extern "C"

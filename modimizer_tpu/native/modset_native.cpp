// Native host runtime for the modimizer_tpu framework: exact open-addressed
// k-mer table maintenance at memcpy speed.
//
// The device (TPU) side produces batches of (unique kmer, count, first-stream-
// position) triples; this module replays them into the canonical modset table
// preserving the reference semantics exactly (reference modset.c:45-77):
//   - probe start  = seqhash(kmer) & tableMask, where
//     seqhash(kmer) = (kmer * factor1) >> shift1   (seqhash.h:58)
//   - double-hash step = ((hash >> tableBits) & tableMask) | 1
//   - ids are assigned in first-encounter order (index = ++max)
//   - depth is a saturating U16 counter (modutils.c:26)
//
// Exposed as a plain-C ABI consumed via ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>

typedef uint8_t U8;
typedef uint16_t U16;
typedef uint32_t U32;
typedef uint64_t U64;

static inline U64 seqhash64(U64 kmer, U64 factor1, int shift1) {
  return (kmer * factor1) >> shift1;
}

// Probe loops below are DRAM-latency bound (random 4 B probes into a
// 2^tableBits bucket array, then a dependent value/depth load).  A two-stage
// software pipeline hides most of it: PD ahead, prefetch the first probe
// bucket; PD/2 ahead, peek the bucket and prefetch the entry it names.
// Prefetches are hints — replay semantics are untouched (a stale peek just
// wastes a hint; duplicate in-batch kmers still take the exact probe path).
#define MS_PD 32  // measured: +10% over 16 on the 256 MB-table insert; flat to 128
#define MS_PREFETCH(T, V, D, K)                                            \
  do {                                                                     \
    if (i + MS_PD < n) {                                                   \
      U64 hp = seqhash64((K)[i + MS_PD], factor1, shift1);                 \
      __builtin_prefetch(&(T)[hp & mask], 0, 1);                           \
    }                                                                      \
    if (i + MS_PD / 2 < n) {                                               \
      U64 hp = seqhash64((K)[i + MS_PD / 2], factor1, shift1);             \
      U32 ip = (T)[hp & mask];                                             \
      if (ip) {                                                            \
        __builtin_prefetch(&(V)[ip], 0, 1);                                \
        if (D) __builtin_prefetch(&((const U16 *)(D))[ip], 1, 1);          \
      }                                                                    \
    }                                                                      \
  } while (0)

extern "C" {

// Look up a batch of kmers; out[i] = index (0 if absent).
void ms_find_batch(const U32 *table, const U64 *value, int tableBits,
                   U64 factor1, int shift1, const U64 *kmers, int64_t n,
                   U32 *out) {
  const U64 mask = (((U64)1) << tableBits) - 1;
  for (int64_t i = 0; i < n; ++i) {
    MS_PREFETCH(table, value, (const U16 *)0, kmers);
    U64 kmer = kmers[i];
    U64 hash = seqhash64(kmer, factor1, shift1);
    U64 offset = hash & mask;
    U32 index = table[offset];
    U64 diff = 0;
    while (index && value[index] != kmer) {
      if (!diff) diff = ((hash >> tableBits) & mask) | 1;
      offset = (offset + diff) & mask;
      index = table[offset];
    }
    out[i] = index;
  }
}

// Insert/accumulate a batch of (kmer, count) pairs in order, replaying the
// reference insertion semantics.  Returns the new max, or -1 on overflow
// (max reached size).  counts may be NULL, meaning count=1 each.
// If out_idx is non-NULL it receives the table index per kmer.
int64_t ms_insert_batch(U32 *table, U64 *value, U16 *depth, U8 *info,
                        int tableBits, U64 factor1, int shift1, int64_t maxIn,
                        int64_t size, const U64 *kmers, const U32 *counts,
                        int64_t n, U32 *out_idx) {
  const U64 mask = (((U64)1) << tableBits) - 1;
  U64 max = (U64)maxIn;
  for (int64_t i = 0; i < n; ++i) {
    MS_PREFETCH(table, value, depth, kmers);
    U64 kmer = kmers[i];
    U64 hash = seqhash64(kmer, factor1, shift1);
    U64 offset = hash & mask;
    U32 index = table[offset];
    U64 diff = 0;
    while (index && value[index] != kmer) {
      if (!diff) diff = ((hash >> tableBits) & mask) | 1;
      offset = (offset + diff) & mask;
      index = table[offset];
    }
    if (!index) {
      index = table[offset] = (U32)(++max);
      if ((int64_t)max >= size) return -1;
      value[index] = kmer;
    }
    U32 c = counts ? counts[i] : 1u;
    U32 d = (U32)depth[index] + c;
    depth[index] = d > 0xFFFF ? 0xFFFF : (U16)d;
    if (out_idx) out_idx[i] = index;
  }
  return (int64_t)max;
}

// Merge semantics of modsetMerge (modset.c:106-128): saturating depth add and
// the quirky copy-number update info1 = (info1 & 3) | min(copy1+copy2, 3)
// (which deliberately drops the flag bits and ORs the clamped sum into the
// old copy bits).  kmers/depths/infos come from ms2 entries 1..max2 in order.
int64_t ms_merge_batch(U32 *table, U64 *value, U16 *depth, U8 *info,
                       int tableBits, U64 factor1, int shift1, int64_t maxIn,
                       int64_t size, const U64 *kmers, const U16 *depths2,
                       const U8 *infos2, int64_t n) {
  const U64 mask = (((U64)1) << tableBits) - 1;
  U64 max = (U64)maxIn;
  for (int64_t i = 0; i < n; ++i) {
    MS_PREFETCH(table, value, depth, kmers);
    U64 kmer = kmers[i];
    U64 hash = seqhash64(kmer, factor1, shift1);
    U64 offset = hash & mask;
    U32 index = table[offset];
    U64 diff = 0;
    while (index && value[index] != kmer) {
      if (!diff) diff = ((hash >> tableBits) & mask) | 1;
      offset = (offset + diff) & mask;
      index = table[offset];
    }
    if (!index) {
      index = table[offset] = (U32)(++max);
      if ((int64_t)max >= size) return -1;
      value[index] = kmer;
    }
    U32 d = (U32)depth[index] + (U32)depths2[i];
    depth[index] = d > 0xFFFF ? 0xFFFF : (U16)d;
    int c = (info[index] & 3) + (infos2[i] & 3);
    if (c > 3) c = 3;
    info[index] = (U8)((info[index] & 0x3) | c);
  }
  return (int64_t)max;
}

// Rebuild the probe table for entries whose (value, depth, info) arrays are
// already in final id order — used by depthPrune (modset.c:64-77) and by the
// device-accelerated construction path after computing global first-encounter
// order.  Entries 1..max inserted sequentially; returns -1 if a duplicate
// value is encountered (should not happen).
int64_t ms_rebuild_table(U32 *table, const U64 *value, int tableBits,
                         U64 factor1, int shift1, int64_t max) {
  const U64 mask = (((U64)1) << tableBits) - 1;
  U64 tableSize = ((U64)1) << tableBits;
  memset(table, 0, tableSize * sizeof(U32));
  for (int64_t i = 1; i <= max; ++i) {
    if (i + MS_PD <= max) {
      U64 hp = seqhash64(value[i + MS_PD], factor1, shift1);
      __builtin_prefetch(&table[hp & mask], 1, 1);
    }
    U64 kmer = value[i];
    U64 hash = seqhash64(kmer, factor1, shift1);
    U64 offset = hash & mask;
    U32 index = table[offset];
    U64 diff = 0;
    while (index && value[index] != kmer) {
      if (!diff) diff = ((hash >> tableBits) & mask) | 1;
      offset = (offset + diff) & mask;
      index = table[offset];
    }
    if (index) return -1;
    table[offset] = (U32)i;
  }
  return max;
}

// 2-bit pack of base codes into big-endian-per-word u64s (the device scan
// stream layout, ops/packed.py pack_sw) — single pass, OpenMP over words.
// Positions past n pack as 0.
void pk_pack2(const unsigned char *codes, int64_t n, U64 *out,
              int64_t n_words) {
  int64_t full = n / 32 < n_words ? n / 32 : n_words;
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int64_t w = 0; w < full; ++w) {
    const unsigned char *c = codes + 32 * w;
    U64 v = 0;
    for (int b = 0; b < 32; ++b) v = (v << 2) | (U64)(c[b] & 3);
    out[w] = v;
  }
  for (int64_t w = full; w < n_words; ++w) {
    U64 v = 0;
    for (int b = 0; b < 32; ++b) {
      int64_t p = 32 * w + b;
      v = (v << 2) | (U64)(p < n ? (codes[p] & 3) : 0);
    }
    out[w] = v;
  }
}

// packed validity bit-plane straight from read offsets: bit p of word p/64
// (little-endian bit order) = "k-mer at stream position p lies inside one
// read".  Replaces the dense-bool + packbits host pass (ops/seqhash.py
// _validity) on the scan fast path.
void pk_valid_words(const int64_t *offsets, int64_t n_reads, int64_t n,
                    int k, U64 *out, int64_t n_words) {
  int64_t nw_full = n / 64 < n_words ? n / 64 : n_words;
  memset(out, 0xFF, (size_t)nw_full * 8);
  for (int64_t w = nw_full; w < n_words; ++w) {
    U64 v = 0;
    for (int b = 0; b < 64 && 64 * w + b < n; ++b) v |= ((U64)1) << b;
    out[w] = v;
  }
  for (int64_t i = 0; i < n_reads; ++i) {
    int64_t end = offsets[i + 1] < n ? offsets[i + 1] : n;
    int64_t lo = end - (k - 1);
    if (lo < offsets[i]) lo = offsets[i];
    for (int64_t p = lo; p < end; ++p)
      out[p / 64] &= ~(((U64)1) << (p % 64));
  }
}

}  // extern "C"

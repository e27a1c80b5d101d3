// Native modutils fast path: the load/annotate/merge/write command shapes
// with zero interpreter cost.
//
// The Python CLI (cli/modutils.py) is the complete, canonical modutils; on
// short commands its ~0.12 s interpreter+numpy start is the ONLY cost the
// reference binary does not pay (the dominant term, gzip deflate, is
// byte-identical by construction on both sides — docs/PERF.md round-3/5
// bench_all decompositions).  This binary implements exactly the stateful
// command subset
//
//     -v  -r <mod>  -p <dmin> <dmax>  -s <c1> <c2> <cM>  -sM <cM>
//     -m <mod>  -w <mod>
//
// with byte-identical stdout/stderr and .mod output (same summary text,
// modset.c:130-153; same COMMAND echoes, modutils.c:125-127; same
// user/system/max_RSS/memory rusage lines incl. the cumulative-allocation
// counter semantics of utils.c:59-75/195; same gzip framing as io/fzio.py
// GzWriter, itself golden-proven against the reference's gzopen).  Any argv
// it cannot take bit-exactly — unknown flags, missing operands only where
// behavior would diverge, unreadable/corrupt inputs — is delegated wholesale
// to the Python CLI via execv BEFORE any output is produced, so error
// behavior stays byte-identical too.
//
// Build: make native-cli   (or bench_all.py builds it on demand).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include <sys/resource.h>
#include <sys/time.h>
#include <unistd.h>
#include <zlib.h>
#include <libdeflate.h>

typedef uint64_t U64;
typedef uint32_t U32;
typedef uint16_t U16;
typedef uint8_t U8;

// from modset_native.cpp (linked in)
extern "C" {
int64_t ms_merge_batch(U32 *table, U64 *value, U16 *depth, U8 *info,
                       int tableBits, U64 factor1, int shift1, int64_t maxIn,
                       int64_t size, const U64 *kmers, const U16 *depths2,
                       const U8 *infos2, int64_t n);
int64_t ms_rebuild_table(U32 *table, const U64 *value, int tableBits,
                         U64 factor1, int shift1, int64_t n);
}

// ---------------------------------------------------------------- delegate

static char **g_argv;

static void delegate(void) {
  // hand the ENTIRE invocation to the Python CLI (must be called before any
  // output).  bin/modutils sits next to this binary.
  char exe[4096];
  ssize_t n = readlink("/proc/self/exe", exe, sizeof exe - 1);
  std::string self = n > 0 ? std::string(exe, (size_t)n) : std::string(g_argv[0]);
  size_t slash = self.rfind('/');
  std::string dir = slash == std::string::npos ? "." : self.substr(0, slash);
  std::string script = dir + "/modutils";
  std::vector<char *> av;
  const char *pyenv = getenv("MODIMIZER_PYTHON");
  static std::string py;
  py = pyenv && *pyenv ? pyenv : "python3";
  av.push_back(&py[0]);
  static std::string sc = script;
  av.push_back(&sc[0]);
  for (int i = 1; g_argv[i]; ++i) av.push_back(g_argv[i]);
  av.push_back(nullptr);
  execvp(py.c_str(), av.data());
  fprintf(stderr, "FATAL ERROR: cannot exec python fallback for %s\n",
          script.c_str());
  exit(255);
}

// ---------------------------------------------------------------- rusage

static long long g_alloc = 0;  // cumulative allocation counter (utils.c:59)

struct Usage {
  struct timeval ut, st;
  long maxrss;
};

static Usage usage_now(void) {
  struct rusage r;
  getrusage(RUSAGE_SELF, &r);
  Usage u;
  u.ut = r.ru_utime;
  u.st = r.ru_stime;
  u.maxrss = r.ru_maxrss;
  return u;
}

static void tv_delta(const struct timeval &a, const struct timeval &b,
                     long &secs, long &usecs) {
  secs = b.tv_sec - a.tv_sec;
  usecs = b.tv_usec - a.tv_usec;
  if (usecs < 0) {
    usecs += 1000000;
    secs -= 1;
  }
}

struct Timer {
  Usage first, old_;
  bool init = false;
  void update(FILE *f) {
    Usage now = usage_now();
    if (init) {
      long us, uu, ss, su;
      tv_delta(old_.ut, now.ut, us, uu);
      tv_delta(old_.st, now.st, ss, su);
      fprintf(f, "user\t%ld.%06ld\tsystem\t%ld.%06ld\tmax_RSS\t%ld"
                 "\tmemory\t%lld\n",
              us, uu, ss, su, now.maxrss - old_.maxrss, g_alloc);
    } else {
      first = now;
      init = true;
    }
    old_ = now;
  }
  void total(FILE *f) {
    if (!init) return;
    old_ = first;
    update(f);
  }
};

// ---------------------------------------------------------------- gzip io

static bool read_file(const char *path, std::vector<U8> &out) {
  FILE *f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<U8> raw((size_t)n);
  if (n && fread(raw.data(), 1, (size_t)n, f) != (size_t)n) {
    fclose(f);
    return false;
  }
  fclose(f);
  if (n >= 18 && raw[0] == 0x1f && raw[1] == 0x8b) {
    // single-member gzip (what gzopen/GzWriter emit): the ISIZE trailer
    // sizes the output exactly, so decode is one pass into place
    U32 isize;
    memcpy(&isize, &raw[(size_t)n - 4], 4);
    out.resize(isize);
    // libdeflate gzip decode (1.6-1.9x zlib on this host, io/fzio.py)
    struct libdeflate_decompressor *d = libdeflate_alloc_decompressor();
    size_t got = 0;
    enum libdeflate_result rc = libdeflate_gzip_decompress(
        d, raw.data(), (size_t)n, out.data(), out.size(), &got);
    libdeflate_free_decompressor(d);
    // anything irregular — multi-member, >4 GB (ISIZE wraps), trailing
    // garbage, corruption — delegates to Python (read_maybe_gz handles it)
    if (rc != LIBDEFLATE_SUCCESS || got != out.size()) return false;
  } else {
    out = std::move(raw);
  }
  return true;
}

// gzip writer byte-identical to io/fzio.py GzWriter (raw deflate level 6
// inside the fixed header; crc + length trailer)
struct GzOut {
  FILE *f = nullptr;
  z_stream zs;
  U32 crc = 0;
  U64 len = 0;
  std::vector<U8> buf;
  bool open(const char *path) {
    f = fopen(path, "wb");
    if (!f) return false;
    static const U8 hdr[10] = {0x1f, 0x8b, 0x08, 0, 0, 0, 0, 0, 0, 3};
    fwrite(hdr, 1, 10, f);
    memset(&zs, 0, sizeof zs);
    deflateInit2(&zs, 6, Z_DEFLATED, -15, 8, Z_DEFAULT_STRATEGY);
    buf.resize(1 << 20);
    return true;
  }
  void write(const void *p, size_t n) {
    const U8 *q = (const U8 *)p;
    while (n) {  // slice: zlib's uInt fields cap one pass at < 4 GB
      size_t c = n > (1u << 30) ? (1u << 30) : n;
      crc = (U32)crc32(crc, (const Bytef *)q, (uInt)c);
      len += c;
      zs.next_in = (Bytef *)q;
      zs.avail_in = (uInt)c;
      while (zs.avail_in) {
        zs.next_out = buf.data();
        zs.avail_out = (uInt)buf.size();
        deflate(&zs, Z_NO_FLUSH);
        fwrite(buf.data(), 1, buf.size() - zs.avail_out, f);
      }
      q += c;
      n -= c;
    }
  }
  void close(void) {
    int rc;
    do {
      zs.next_out = buf.data();
      zs.avail_out = (uInt)buf.size();
      rc = deflate(&zs, Z_FINISH);
      fwrite(buf.data(), 1, buf.size() - zs.avail_out, f);
    } while (rc != Z_STREAM_END);
    deflateEnd(&zs);
    U8 tail[8];
    U32 l32 = (U32)(len & 0xFFFFFFFFu);
    memcpy(tail, &crc, 4);
    memcpy(tail + 4, &l32, 4);
    fwrite(tail, 1, 8, f);
    fclose(f);
    f = nullptr;
  }
};

// files created by the -w openability probes that nothing has written
// yet: a mid-execution die() (merge table overflow) must remove them so
// filesystem side effects match the Python CLI's aborted run
static std::vector<std::string> g_probe_created;

static void cleanup_probe_files(void) {
  for (const auto &p : g_probe_created) {
    FILE *f = fopen(p.c_str(), "rb");
    if (!f) continue;
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fclose(f);
    if (sz == 0) unlink(p.c_str());  // still empty: ours, not yet written
  }
}

// ---------------------------------------------------------------- modset

#pragma pack(push, 1)
struct SeqhashBin {  // core/seqhash.py _STRUCT "<iii4xQiiQQ4Q" (80 bytes)
  int32_t seed, k, w;
  int32_t pad;
  U64 mask;
  int32_t shift1, shift2;
  U64 factor1, factor2;
  U64 patternRC[4];
};
#pragma pack(pop)

struct Modset {
  SeqhashBin sh;
  int bits = 0;
  U64 table_size = 0;
  int64_t size = 0, max = 0;
  // zero-copy: the arrays point into the decompressed file buffer (like
  // the Python side's numpy frombuffer views, modset.py:288-294); merge
  // regrows value/depth/info into the vectors below and repoints
  std::vector<U8> raw;
  U32 *index = nullptr;
  U64 *value = nullptr;
  U16 *depth = nullptr;
  U8 *info = nullptr;
  std::vector<U64> value_v;
  std::vector<U16> depth_v;
  std::vector<U8> info_v;

  // returns false on any format anomaly (caller delegates); takes
  // ownership of the buffer
  bool parse(std::vector<U8> &&d) {
    raw = std::move(d);
    size_t off = 0;
    if (raw.size() < 8 + 4 + 4 + 8 + 80 ||
        memcmp(raw.data(), "MSHSTv2\x00", 8) != 0)
      return false;
    off = 8;
    U32 b32, s32;
    memcpy(&b32, &raw[off], 4);
    off += 4;
    memcpy(&s32, &raw[off], 4);
    off += 4;
    if (memcmp(&raw[off], "SQHSHv2\x00", 8) != 0) return false;
    off += 8;
    memcpy(&sh, &raw[off], 80);
    off += 80;
    bits = (int)b32;
    if (bits < 20 || bits > 34) return false;
    if (s32 == 0) return false;  // no valid writer emits 0; delegate
    table_size = (U64)1 << bits;
    size = (int64_t)s32;
    max = size - 1;
    size_t need = off + 4 * table_size + 11 * (size_t)size;
    if (raw.size() < need) return false;
    // header is 104 bytes and every array length is 8-aligned for
    // bits >= 20, so the in-place views are naturally aligned
    index = (U32 *)(raw.data() + off);
    off += 4 * table_size;
    value = (U64 *)(raw.data() + off);
    off += 8 * (size_t)size;
    depth = (U16 *)(raw.data() + off);
    off += 2 * (size_t)size;
    info = raw.data() + off;
    return true;
  }

  void summary(FILE *f) const {
    // seqhash report + modsetSummary, exact text (modset.c:130-153)
    fprintf(f, "SH k %d  w/m %d  s %d\n", sh.k, sh.w, sh.seed);
    fprintf(f, "MS table bits %d size %llu number of entries %lld", bits,
            (unsigned long long)table_size, (long long)max);
    if (!max) {
      fprintf(f, "\n");
      return;
    }
    int maxd = 0;
    for (int64_t i = 1; i <= max; ++i)
      if (depth[i] > maxd) maxd = depth[i];
    std::vector<U64> h((size_t)maxd + 1, 0);
    for (int64_t i = 1; i <= max; ++i) h[depth[i]]++;
    long long copy[4] = {0, 0, 0, 0};
    for (int64_t i = 1; i <= max; ++i) copy[info[i] & 3]++;
    long long s = 0, tot = 0;
    for (size_t j = 0; j < h.size(); ++j) {
      s += (long long)h[j];
      tot += (long long)j * (long long)h[j];
    }
    long long htot = tot / 2;
    size_t i50 = h.size();
    long long cum = 0;
    for (size_t j = 0; j < h.size(); ++j) {
      cum += (long long)j * (long long)h[j];
      if (htot - cum < 0) {
        i50 = j;
        break;
      }
    }
    fprintf(f, " total count %lld\nMS average depth %.1f N50 depth %zu", tot,
            (double)tot / (double)s, i50);
    if (copy[0] < max)
      fprintf(f, " copy0 %lld copy1 %lld copy2 %lld copyM %lld", copy[0],
              copy[1], copy[2], copy[3]);
    fprintf(f, "\n");
  }

  long long alloc_bytes() const {  // from_bytes counter (modset.py:295)
    return 4 * (long long)table_size + 11 * (long long)size;
  }

  void depth_prune(int dmin, int dmax) {
    // modsetDepthPrune (modset.c:64-77)
    int64_t N = max, n = 0;
    for (int64_t i = 1; i <= N; ++i) {
      U16 d = depth[i];
      if (d >= dmin && (!dmax || d < dmax)) {
        ++n;
        value[n] = value[i];
        depth[n] = depth[i];
        info[n] = info[i];
      }
    }
    max = n;
    ms_rebuild_table(index, value, bits, sh.factor1, sh.shift1, n);
    fprintf(stderr,
            "  pruned Modset from %lld to %lld with min %d <= depth < max "
            "%d\n",
            (long long)N, (long long)max, dmin, dmax);
  }

  void set_copy_thresholds(int c1, int c2, int cM) {
    // modutils -s (modutils.c:205-213)
    for (int64_t i = 1; i <= max; ++i) {
      U16 d = depth[i];
      if (d < c1)
        info[i] &= 0xFC;
      else if (d < c2)
        info[i] = (U8)((info[i] & 0xFC) | 1);
      else if (d < cM)
        info[i] = (U8)((info[i] & 0xFC) | 2);
      else
        info[i] |= 3;
    }
  }

  void set_copyM_threshold(int cM) {
    for (int64_t i = 1; i <= max; ++i)
      if (depth[i] >= cM) info[i] |= 3;
  }

  bool merge(Modset &o) {
    // modsetMerge (modset.c:106-128) via the exact-replay native engine
    if (sh.w != o.sh.w || sh.k != o.sh.k || sh.factor1 != o.sh.factor1)
      return false;
    int64_t new_size = max + o.max + 1;
    if (new_size >= (int64_t)(table_size >> 2))
      new_size = (int64_t)(table_size >> 2) - 1;
    // regrow the side arrays into owned storage and repoint (the table
    // stays the in-place view — merge mutates it in place).  Fresh
    // vectors FIRST, move-assign after: on a second -m the value/depth/
    // info pointers alias value_v/..., and assigning into the aliased
    // vector would zero or free the source before the copy reads it
    int64_t keep = new_size < size ? new_size : size;
    std::vector<U64> nv((size_t)new_size, 0);
    memcpy(nv.data(), value, 8 * (size_t)keep);
    value_v = std::move(nv);
    value = value_v.data();
    std::vector<U16> nd((size_t)new_size, 0);
    memcpy(nd.data(), depth, 2 * (size_t)keep);
    depth_v = std::move(nd);
    depth = depth_v.data();
    std::vector<U8> ni((size_t)new_size, 0);
    memcpy(ni.data(), info, (size_t)keep);
    info_v = std::move(ni);
    info = info_v.data();
    size = new_size;
    g_alloc += 11 * (long long)new_size;
    if (o.max) {
      int64_t nm = ms_merge_batch(index, value, depth, info,
                                  bits, sh.factor1, sh.shift1,
                                  max, size, o.value + 1,
                                  o.depth + 1, o.info + 1,
                                  o.max);
      if (nm < 0) {  // modset.c:58 die(), max == size at first overflow
        fprintf(stderr,
                "FATAL ERROR: hashTableSize %lld is too small for %lld\n",
                (long long)size, (long long)size);
        cleanup_probe_files();
        exit(255);
      }
      max = nm;
    }
    return true;
  }

  bool write(const char *path) const {
    GzOut g;
    if (!g.open(path)) return false;
    g.write("MSHSTv2\x00", 8);
    U32 b32 = (U32)bits, s32 = (U32)(max + 1);
    g.write(&b32, 4);
    g.write(&s32, 4);
    g.write("SQHSHv2\x00", 8);
    g.write(&sh, 80);
    g.write(index, 4 * table_size);
    g.write(value, 8 * (size_t)(max + 1));
    g.write(depth, 2 * (size_t)(max + 1));
    g.write(info, (size_t)(max + 1));
    g.close();
    return true;
  }
};

// ---------------------------------------------------------------- main

static bool is_int(const char *s) {
  if (*s == '-' || *s == '+') ++s;
  if (!*s) return false;
  int d = 0;
  for (; *s; ++s, ++d)
    if (*s < '0' || *s > '9') return false;
  return d <= 9;  // larger values: delegate (Python int() is unbounded)
}

static void echo_command(char **argv, int argc, int i) {
  fprintf(stderr, "COMMAND %s", argv[i]);
  for (int j = i + 1; j < argc && argv[j][0] != '-'; ++j)
    fprintf(stderr, " %s", argv[j]);
  fprintf(stderr, "\n");
}

int main(int argc, char **argv) {
  g_argv = argv;
  if (argc < 2) delegate();  // usage() banner stays the Python CLI's

  // ---- pre-scan: every command must be in the fast subset with its
  // operands present and integer-valued where integers are consumed, and
  // the state machine (-r first, exactly once) must hold; otherwise the
  // Python CLI handles the whole invocation (incl. all error behavior).
  bool have_r = false;
  for (int i = 1; i < argc;) {
    const char *a = argv[i];
    auto ops = [&](int n) {  // n integer operands follow
      if (i + n >= argc) return false;
      for (int j = 1; j <= n; ++j)
        if (!is_int(argv[i + j])) return false;
      return true;
    };
    if (!strcmp(a, "-v") || !strcmp(a, "--verbose")) {
      i += 1;
    } else if (!strcmp(a, "-r") || !strcmp(a, "--read")) {
      if (have_r || i + 1 >= argc) delegate();
      have_r = true;
      i += 2;
    } else if (!strcmp(a, "-w") || !strcmp(a, "--write")) {
      if (!have_r || i + 1 >= argc) delegate();
      i += 2;
    } else if (!strcmp(a, "-m") || !strcmp(a, "--merge")) {
      if (!have_r || i + 1 >= argc) delegate();
      i += 2;
    } else if (!strcmp(a, "-p") || !strcmp(a, "--prune")) {
      if (!have_r || !ops(2)) delegate();
      i += 3;
    } else if (!strcmp(a, "-s") || !strcmp(a, "--setcopy")) {
      if (!have_r || !ops(3)) delegate();
      i += 4;
    } else if (!strcmp(a, "-sM") || !strcmp(a, "--setcopyM")) {
      if (!have_r || !ops(1)) delegate();
      i += 2;
    } else {
      delegate();
    }
  }

  // ---- pre-validate every input file (open + parse) BEFORE any output
  // or filesystem side effect, so unreadable/corrupt inputs take the
  // Python path bit-exactly.  Reads are kept: the handlers reuse them.
  // Inputs validate in pass 1; -w openability probes run in pass 2 ONLY
  // after every input is known good — a -w probe creates the file
  // (O_CREAT, no truncate), which must not happen on a chain the Python
  // CLI would abort before reaching that -w.
  std::vector<Modset> loaded;
  auto step_over = [&](const char *a, int &i) {
    if (!strcmp(a, "-v") || !strcmp(a, "--verbose"))
      i += 1;
    else if (!strcmp(a, "-p") || !strcmp(a, "--prune"))
      i += 3;
    else if (!strcmp(a, "-s") || !strcmp(a, "--setcopy"))
      i += 4;
    else
      i += 2;  // -r -m -w -sM
  };
  for (int i = 1; i < argc;) {
    const char *a = argv[i];
    if (!strcmp(a, "-r") || !strcmp(a, "--read") || !strcmp(a, "-m") ||
        !strcmp(a, "--merge")) {
      std::vector<U8> raw;
      // unreadable or corrupt input: the Python CLI reproduces the exact
      // die()/traceback behavior, so hand the whole invocation over
      if (!read_file(argv[i + 1], raw)) delegate();
      loaded.emplace_back();
      if (!loaded.back().parse(std::move(raw))) delegate();
      i += 2;
    } else {
      step_over(a, i);
    }
  }
  for (int i = 1; i < argc;) {
    const char *a = argv[i];
    if (!strcmp(a, "-w") || !strcmp(a, "--write")) {
      // openability probe WITHOUT truncation (O_CREAT matches the side
      // effect the Python run would eventually make on this chain; on
      // failure the Python CLI reproduces its uncaught-OSError behavior).
      // Newly-created probe files are tracked so a mid-execution die()
      // can remove them (the Python run would never have created them).
      bool existed = access(argv[i + 1], F_OK) == 0;
      FILE *t = fopen(argv[i + 1], "ab");
      if (!t) delegate();
      fclose(t);
      if (!existed) g_probe_created.push_back(argv[i + 1]);
      i += 2;
    } else {
      step_over(a, i);
    }
  }

  // ---- execute (ordered-command loop, modutils.c:120-139)
  Timer timer;
  timer.update(stdout);
  Modset *ms = nullptr;
  size_t next_load = 0;
  for (int i = 1; i < argc;) {
    echo_command(argv, argc, i);
    const char *a = argv[i];
    if (!strcmp(a, "-v") || !strcmp(a, "--verbose")) {
      i += 1;
    } else if (!strcmp(a, "-r") || !strcmp(a, "--read")) {
      ms = &loaded[next_load++];
      g_alloc += ms->alloc_bytes();
      ms->summary(stdout);
      i += 2;
    } else if (!strcmp(a, "-w") || !strcmp(a, "--write")) {
      if (!ms->write(argv[i + 1])) {
        fprintf(stderr, "FATAL ERROR: failed to open mod file %s\n",
                argv[i + 1]);
        exit(255);
      }
      i += 2;
    } else if (!strcmp(a, "-m") || !strcmp(a, "--merge")) {
      Modset &o = loaded[next_load++];
      g_alloc += o.alloc_bytes();
      o.summary(stdout);
      if (!ms->merge(o))
        fprintf(stderr,
                "modset %s incompatible with current - unable to merge\n",
                argv[i + 1]);
      ms->summary(stdout);
      i += 2;
    } else if (!strcmp(a, "-p") || !strcmp(a, "--prune")) {
      ms->depth_prune(atoi(argv[i + 1]), atoi(argv[i + 2]));
      ms->summary(stdout);
      i += 3;
    } else if (!strcmp(a, "-s") || !strcmp(a, "--setcopy")) {
      ms->set_copy_thresholds(atoi(argv[i + 1]), atoi(argv[i + 2]),
                              atoi(argv[i + 3]));
      ms->summary(stdout);
      i += 4;
    } else {  // -sM
      ms->set_copyM_threshold(atoi(argv[i + 1]));
      ms->summary(stdout);
      i += 2;
    }
    timer.update(stdout);
  }
  fputs("total resources used: ", stdout);
  timer.total(stdout);
  return 0;
}

// Single-node end-to-end FilterReads-shaped baseline.
//
// Stands in for the reference's FilterReads hot path (parse -> weighted
// canonical k-mer spectrum -> per-read median score + trim -> filtered
// FASTQ out) as the CPU number that bench.py's "reads filtered/sec"
// metric is compared against.  Independently implemented; mirrors the
// reference's single-node execution strategy (OpenMP-style thread
// partitioning: parse by file range, count by hash ownership, score by
// read range; ref: apps/FilterReads.h:158-282, src/KmerSpectrum.h
// buildKmerSpectrum, src/ReadSelector.h trimReadByMarkupLength/MEDIAN).
// Deliberately GENEROUS to the baseline: no artifact filter, no pair
// logic, no comment handling — it does strictly less work per read than
// either the reference or kmernator_tpu.
//
// Usage: baseline_filter <fastq> <k> <threads> <min_depth> <out|->
// Prints: reads_per_sec=<float>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <algorithm>
#include <chrono>
#include <cmath>
#include <string>
#include <thread>
#include <vector>

static inline uint64_t mix64(uint64_t h) {
  h ^= h >> 33; h *= 0xff51afd7ed558ccdULL;
  h ^= h >> 33; h *= 0xc4ceb9fe1a85ec53ULL;
  h ^= h >> 33; return h;
}

static inline uint64_t revcomp_k(uint64_t x, int k) {
  x = ~x;
  x = ((x & 0x3333333333333333ULL) << 2) | ((x >> 2) & 0x3333333333333333ULL);
  x = ((x & 0x0F0F0F0F0F0F0F0FULL) << 4) | ((x >> 4) & 0x0F0F0F0F0F0F0F0FULL);
  x = __builtin_bswap64(x);
  return x >> (64 - 2 * k);
}

struct Table {
  std::vector<uint64_t> keys;
  std::vector<uint32_t> counts;
  uint64_t mask;
  size_t used = 0;
  explicit Table(size_t cap_pow2)
      : keys(cap_pow2, ~0ULL), counts(cap_pow2, 0), mask(cap_pow2 - 1) {}
  inline void add(uint64_t key) {
    uint64_t h = mix64(key) & mask;
    while (true) {
      if (keys[h] == key) { counts[h]++; return; }
      if (keys[h] == ~0ULL) {
        keys[h] = key; counts[h] = 1;
        if (++used * 10 > keys.size() * 7) grow();
        return;
      }
      h = (h + 1) & mask;
    }
  }
  inline uint32_t get(uint64_t key) const {
    uint64_t h = mix64(key) & mask;
    while (true) {
      if (keys[h] == key) return counts[h];
      if (keys[h] == ~0ULL) return 0;
      h = (h + 1) & mask;
    }
  }
  void grow() {
    Table next(keys.size() * 2);
    for (size_t i = 0; i < keys.size(); i++)
      if (keys[i] != ~0ULL) {
        uint64_t h = mix64(keys[i]) & next.mask;
        while (next.keys[h] != ~0ULL) h = (h + 1) & next.mask;
        next.keys[h] = keys[i]; next.counts[h] = counts[i];
      }
    next.used = used;
    keys.swap(next.keys); counts.swap(next.counts); mask = next.mask;
  }
};

struct Parsed {
  std::vector<uint8_t> codes;   // 0..3 per base, concatenated
  std::vector<uint8_t> phred;   // phred per base
  std::vector<size_t> off;      // read offsets into codes/phred
  std::vector<size_t> rec_s;    // record start byte (for pass-2 rewrite)
  std::vector<size_t> rec_e;
};

static size_t next_record(const char* d, size_t pos, size_t size) {
  while (pos < size) {
    if (d[pos] == '@' && (pos == 0 || d[pos - 1] == '\n')) {
      // confirm 4-line structure: line+2 starts with '+'
      size_t p = pos, nl = 0;
      while (p < size && nl < 2) if (d[p++] == '\n') nl++;
      if (p < size && d[p] == '+') return pos;
    }
    pos++;
  }
  return size;
}

int main(int argc, char** argv) {
  if (argc < 6) { fprintf(stderr, "usage: %s fastq k threads min_depth out\n", argv[0]); return 2; }
  const char* path = argv[1];
  int k = atoi(argv[2]);
  int T = atoi(argv[3]);
  uint32_t min_depth = (uint32_t)atoi(argv[4]);
  const char* outpath = argv[5];

  FILE* f = fopen(path, "rb");
  if (!f) { perror("open"); return 2; }
  fseek(f, 0, SEEK_END);
  size_t size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> data(size);
  if (fread(data.data(), 1, size, f) != size) { perror("read"); return 2; }
  fclose(f);
  const char* d = data.data();

  auto t0 = std::chrono::steady_clock::now();

  // ---- parse (threads own record-aligned file ranges) ----
  std::vector<size_t> bounds(T + 1);
  for (int t = 0; t <= T; t++)
    bounds[t] = t == 0 ? 0 : (t == T ? size : next_record(d, size / T * t, size));
  std::vector<Parsed> parts(T);
  {
    std::vector<std::thread> pool;
    for (int t = 0; t < T; t++)
      pool.emplace_back([&, t]() {
        Parsed& P = parts[t];
        size_t pos = bounds[t], end = bounds[t + 1];
        P.off.push_back(0);
        int8_t code[256]; memset(code, 0, sizeof code);
        code['C'] = 1; code['G'] = 2; code['T'] = 3;
        while (pos < end) {
          size_t h_e = (const char*)memchr(d + pos, '\n', end - pos) - d;
          size_t s_s = h_e + 1;
          size_t s_e = (const char*)memchr(d + s_s, '\n', end - s_s) - d;
          size_t p_e = (const char*)memchr(d + s_e + 1, '\n', end - s_e - 1) - d;
          size_t q_s = p_e + 1;
          size_t q_e = q_s + (s_e - s_s);
          P.rec_s.push_back(pos);
          P.rec_e.push_back(q_e + 1 <= end ? q_e + 1 : end);
          for (size_t i = s_s; i < s_e; i++) P.codes.push_back(code[(uint8_t)d[i]]);
          for (size_t i = q_s; i < q_e; i++) {
            int q = (uint8_t)d[i] - 33; P.phred.push_back(q < 0 ? 0 : (q > 63 ? 63 : q));
          }
          P.off.push_back(P.codes.size());
          pos = q_e + 1;
        }
      });
    for (auto& th : pool) th.join();
  }
  size_t n_reads = 0;
  for (auto& P : parts) n_reads += P.off.size() - 1;

  // ---- count (threads own hash-partitioned keys; scan all parts) ----
  std::vector<Table*> tables(T);
  {
    std::vector<std::thread> pool;
    for (int t = 0; t < T; t++)
      pool.emplace_back([&, t]() {
        Table* tab = new Table(1 << 20);
        tables[t] = tab;
        const uint64_t kmask = (k == 32) ? ~0ULL : ((1ULL << (2 * k)) - 1);
        double ptable[64];
        for (int q = 0; q < 64; q++) ptable[q] = 1.0 - pow(10.0, -q / 10.0);
        for (int pt = 0; pt < T; pt++) {
          const Parsed& P = parts[pt];
          for (size_t r = 0; r + 1 < P.off.size(); r++) {
            size_t s = P.off[r], L = P.off[r + 1] - s;
            if ((long)L < k) continue;
            uint64_t fwd = 0; double weight = 1.0;
            for (size_t i = 0; i < L; i++) {
              fwd = ((fwd << 2) | P.codes[s + i]) & kmask;
              double pb = ptable[P.phred[s + i]];
              if ((long)i < k) weight *= pb;
              else weight *= pb / ptable[P.phred[s + i - k]];
              if ((long)i >= k - 1) {
                uint64_t rc = revcomp_k(fwd, k);
                uint64_t canon = fwd < rc ? fwd : rc;
                if ((int)(mix64(canon) % T) == t && weight > 0.1)
                  tab->add(canon);
              }
            }
          }
        }
      });
    for (auto& th : pool) th.join();
  }

  // ---- score + trim + write (threads own read ranges) ----
  std::vector<std::string> outs(T);
  {
    std::vector<std::thread> pool;
    for (int t = 0; t < T; t++)
      pool.emplace_back([&, t]() {
        const Parsed& P = parts[t];
        std::string& out = outs[t];
        const uint64_t kmask = (k == 32) ? ~0ULL : ((1ULL << (2 * k)) - 1);
        std::vector<uint32_t> wc;
        for (size_t r = 0; r + 1 < P.off.size(); r++) {
          size_t s = P.off[r], L = P.off[r + 1] - s;
          if ((long)L < k) continue;
          size_t NW = L - k + 1;
          wc.clear(); wc.resize(NW);
          uint64_t fwd = 0;
          for (size_t i = 0; i < L; i++) {
            fwd = ((fwd << 2) | P.codes[s + i]) & kmask;
            if ((long)i >= k - 1) {
              uint64_t rc = revcomp_k(fwd, k);
              uint64_t canon = fwd < rc ? fwd : rc;
              wc[i - k + 1] = tables[mix64(canon) % T]->get(canon);
            }
          }
          // longest run of windows with count >= min_depth
          size_t best = 0, best_s = 0, cur = 0, cur_s = 0;
          for (size_t i = 0; i <= NW; i++) {
            if (i < NW && wc[i] >= min_depth) { if (!cur) cur_s = i; cur++; }
            else { if (cur > best) { best = cur; best_s = cur_s; } cur = 0; }
          }
          if (!best) continue;
          // median window count of the passing run must clear min_depth
          std::vector<uint32_t> run(wc.begin() + best_s, wc.begin() + best_s + best);
          std::nth_element(run.begin(), run.begin() + run.size() / 2, run.end());
          if (run[run.size() / 2] < min_depth) continue;
          // emit (possibly trimmed) record
          size_t rec_s = P.rec_s[r];
          size_t h_e = (const char*)memchr(d + rec_s, '\n', size - rec_s) - d;
          out.append(d + rec_s, h_e - rec_s + 1);
          size_t tl = best + k - 1;
          size_t s_s = h_e + 1;
          out.append(d + s_s + best_s, tl); out += "\n+\n";
          size_t q_s = s_s + L + 3;
          out.append(d + q_s + best_s, tl); out += '\n';
        }
      });
    for (auto& th : pool) th.join();
  }
  if (strcmp(outpath, "-")) {
    FILE* of = fopen(outpath, "wb");
    for (auto& o : outs) fwrite(o.data(), 1, o.size(), of);
    fclose(of);
  }

  auto t1 = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1 - t0).count();
  printf("reads_per_sec=%.0f\n", n_reads / secs);
  size_t uniq = 0;
  for (auto* tab : tables) uniq += tab->used;
  fprintf(stderr, "reads=%zu unique=%zu secs=%.3f\n", n_reads, uniq, secs);
  return 0;
}

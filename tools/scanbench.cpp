// Standalone scanner micro-benchmark: drives the _scan.cpp entry points
// on real corpus files without Python in the loop, for tight optimization
// iterations (the ctypes path adds per-call overhead and the bench VM's
// CPU drifts — min-of-N over many repeats in one process is the only
// stable protocol here).
//
// Build:  g++ -O3 -march=native -std=c++17 -o /tmp/scanbench \
//             tools/scanbench.cpp  (it #includes ../libacm_tpu/scan/_scan.cpp)
// Usage:  /tmp/scanbench <mode> <reps> <file...>
//         mode: packed | host | dense
// Prints per-file and aggregate Msamples/s (min-of-reps wall time).

#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <string>
#include <vector>

#include "../libacm_tpu/scan/_scan.cpp"

namespace {

struct Header {
  int level, rows, channels;
  long total_values;
  long skip_bits;
};

// Minimal ACM/WAVC header field extraction (LSB-first little-endian).
bool parse_header(const std::vector<uint8_t>& d, Header* h) {
  if (d.size() < 14) return false;
  auto u16 = [&](size_t i) { return d[i] | (d[i + 1] << 8); };
  size_t off = 0;
  if (d.size() >= 42 && d[0] == 'W' && d[1] == 'A' && d[2] == 'V' &&
      d[3] == 'C')
    off = 28;
  uint32_t magic = d[off] | (d[off + 1] << 8) | (d[off + 2] << 16);
  if (magic != 0x032897 || d[off + 3] != 1) return false;
  h->total_values = d[off + 4] | (d[off + 5] << 8) | (d[off + 6] << 16) |
                    (static_cast<long>(d[off + 7]) << 24);
  h->channels = u16(off + 8);
  uint32_t lr = u16(off + 12);
  h->level = lr & 0xF;
  h->rows = lr >> 4;
  h->skip_bits = 8 * (off + 14);
  return true;
}

std::vector<uint8_t> slurp(const char* fn) {
  FILE* f = fopen(fn, "rb");
  if (!f) { perror(fn); exit(1); }
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> d(n);
  if (fread(d.data(), 1, n, f) != static_cast<size_t>(n)) exit(1);
  fclose(f);
  return d;
}

double now() {
  return std::chrono::duration<double>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 4) {
    fprintf(stderr, "usage: %s packed|host|dense <reps> <file...>\n", argv[0]);
    return 2;
  }
  std::string mode = argv[1];
  int reps = atoi(argv[2]);

  double agg_best = 0;
  long agg_samples = 0;
  for (int fi = 3; fi < argc; fi++) {
    auto data = slurp(argv[fi]);
    Header h;
    if (!parse_header(data, &h)) { fprintf(stderr, "bad: %s\n", argv[fi]); continue; }
    const int cols = 1 << h.level;
    const long bit_cap = 8L * (data.size() + 1);
    long max_blocks = bit_cap / (20 + 5L * cols) + 2;
    long max_events = bit_cap / 20 + 4;
    const long bl = static_cast<long>(h.rows) * cols;

    std::vector<int16_t> events(max_events);
    std::vector<int64_t> tell(max_events);
    std::vector<int16_t> col_tmp(h.rows + 64);
    std::vector<int64_t> meta(16);
    long samples = 0;
    double best = 1e9;

    if (mode == "packed") {
      long ncols_cap = max_blocks * cols;
      std::vector<uint8_t> cls(max_blocks * ((cols + 3) / 4));
      std::vector<uint8_t> pay4(ncols_cap * h.rows / 2 + 32);
      std::vector<uint8_t> pay8(ncols_cap * h.rows + 32);
      std::vector<uint8_t> pay16(ncols_cap * h.rows * 2 + 32);
      std::vector<uint8_t> wid4(ncols_cap / 2 + 32), wid8(ncols_cap / 2 + 32),
          wid16(ncols_cap / 2 + 32);
      std::vector<uint8_t> pwr(max_blocks);
      std::vector<uint16_t> val(max_blocks);
      for (int r = 0; r < reps; r++) {
        double t0 = now();
        acm_scan_corpus_into(data.data(), data.size(), h.skip_bits, h.level,
                             h.rows, max_blocks, cls.data(), pay4.data(),
                             pay8.data(), pay16.data(), wid4.data(),
                             wid8.data(), wid16.data(), pwr.data(),
                             val.data(), events.data(), tell.data(),
                             max_events, col_tmp.data(), meta.data(), nullptr,
                             1);
        double dt = now() - t0;
        if (dt < best) best = dt;
        samples = meta[0] * bl;
      }
      if (reps > 0 && fi == 3) {
        long wire = (meta[12] + meta[13] + meta[14]) / 8
                    + (meta[5] + meta[6] + meta[7] + 1) / 2
                    + max_blocks * ((cols + 3) / 4) + 2 * meta[0];
        fprintf(stderr, "  wire bytes (first file): %ld (disk %zu)\n", wire,
                data.size());
      }
    } else if (mode == "host") {
      std::vector<int16_t> pcm(max_blocks * bl);
      std::vector<uint32_t> wrap(2 * cols - 2 > 0 ? 2 * cols - 2 : 1);
      std::vector<int16_t> kbuf(bl + 32);
      // 64-byte-align the scratch DATA areas (base + cols words) so the
      // AVX-512 pass bodies engage, matching the Python-side allocator
      std::vector<uint32_t> xraw(bl + cols + 16), yraw(bl + cols + 16);
      auto align64 = [cols](std::vector<uint32_t>& v) {
        uintptr_t a = reinterpret_cast<uintptr_t>(v.data() + cols);
        return v.data() + ((64 - (a & 63)) & 63) / 4;
      };
      uint32_t* xbufp = align64(xraw);
      uint32_t* ybufp = align64(yraw);
      std::vector<uint32_t> tbl_val(17);
      std::vector<int64_t> tbl_cov(17);
      std::vector<uint8_t> ev_pwr(max_events);
      std::vector<uint16_t> ev_val(max_events);
      for (int r = 0; r < reps; r++) {
        std::fill(wrap.begin(), wrap.end(), 0);
        std::fill(tbl_val.begin(), tbl_val.end(), 0);
        std::fill(tbl_cov.begin(), tbl_cov.end(), 0);
        double t0 = now();
        acm_decode_host(data.data(), data.size(), h.skip_bits, h.level,
                        h.rows, max_blocks, max_events, pcm.data(),
                        wrap.data(), events.data(), tell.data(),
                        col_tmp.data(), kbuf.data(), xbufp, ybufp,
                        meta.data(), 1, tbl_val.data(), tbl_cov.data(),
                        ev_pwr.data(), ev_val.data());
        double dt = now() - t0;
        if (dt < best) best = dt;
        samples = meta[0] * bl;
      }
    } else {  // dense
      std::vector<int16_t> k(max_blocks * bl);
      std::vector<uint8_t> pwr(max_blocks);
      std::vector<uint16_t> val(max_blocks);
      for (int r = 0; r < reps; r++) {
        double t0 = now();
        acm_scan_blocks(data.data(), data.size(), h.skip_bits, h.level,
                        h.rows, max_blocks, max_events, k.data(), pwr.data(),
                        val.data(), events.data(), tell.data(),
                        col_tmp.data(), meta.data());
        double dt = now() - t0;
        if (dt < best) best = dt;
        samples = meta[0] * bl;
      }
    }
    printf("%-28s %7.2f Msamples/s  (%ld samples, %.3f ms)\n", argv[fi],
           samples / best / 1e6, samples, best * 1e3);
    agg_best += best;
    agg_samples += samples;
  }
  printf("AGGREGATE %s: %.2f Msamples/s (%ld samples, %.1f ms)\n",
         mode.c_str(), agg_samples / agg_best / 1e6, agg_samples,
         agg_best * 1e3);
  return 0;
}

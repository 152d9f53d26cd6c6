// Standalone sanitizer driver for the scanner (ASAN/UBSAN CI builds;
// SURVEY §5 race-detection/sanitizers). Compiled together with _scan.cpp:
//   g++ -O1 -g -fsanitize=address,undefined _scan.cpp _scan_sanmain.cpp
// Usage: sanscan <file> <skip_bits> <level> <rows> <max_blocks>
// Exercises all three entry points on the input; exits non-zero only if a
// sanitizer fires (or args are bad). Output values are not checked here —
// bit-exactness is covered by the Python differential tests.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
int64_t acm_scan_blocks(const uint8_t*, int64_t, int64_t, int32_t, int32_t,
                        int64_t, int64_t, int16_t*, uint8_t*, uint16_t*,
                        int16_t*, int64_t*, int16_t*, int64_t*);
int64_t acm_scan_blocks_packed(const uint8_t*, int64_t, int64_t, int32_t,
                               int32_t, int64_t, int64_t, uint8_t*, uint8_t*,
                               uint8_t*, uint8_t*, uint8_t*, uint8_t*,
                               uint8_t*, uint8_t*, uint16_t*,
                               int16_t*, int64_t*, int16_t*, int64_t*);
int64_t acm_scan_corpus_into(const uint8_t*, int64_t, int64_t, int32_t,
                             int32_t, int64_t, uint8_t*, uint8_t*, uint8_t*,
                             uint8_t*, uint8_t*, uint8_t*, uint8_t*,
                             uint8_t*, uint16_t*, int16_t*, int64_t*,
                             int64_t, int16_t*, int64_t*, int64_t*,
                             int32_t);
int64_t acm_scan_corpus_chunk(const uint8_t*, const int64_t*, const int64_t*,
                              const int64_t*, const int64_t*, int64_t,
                              int32_t, int32_t, int64_t, int64_t, uint8_t*,
                              uint8_t*, uint8_t*, uint8_t*, uint8_t*,
                              uint8_t*, uint8_t*, uint8_t*, uint16_t*,
                              int16_t*, int64_t*, int64_t, int64_t, int16_t*,
                              int16_t*, int64_t*, int64_t*);
int64_t acm_decode_host(const uint8_t*, int64_t, int64_t, int32_t, int32_t,
                        int64_t, int64_t, int16_t*, uint32_t*, int16_t*,
                        int64_t*, int16_t*, int16_t*, uint32_t*, uint32_t*,
                        int64_t*, int32_t, uint32_t*, int64_t*, uint8_t*,
                        uint16_t*);
}

int main(int argc, char** argv) {
  if (argc != 6) {
    std::fprintf(stderr, "usage: %s file skip_bits level rows max_blocks\n",
                 argv[0]);
    return 2;
  }
  FILE* f = std::fopen(argv[1], "rb");
  if (!f) return 2;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> data(n ? n : 1);
  if (n && std::fread(data.data(), 1, n, f) != static_cast<size_t>(n)) return 2;
  std::fclose(f);

  int64_t skip = std::atoll(argv[2]);
  int level = std::atoi(argv[3]);
  int rows = std::atoi(argv[4]);
  int64_t maxb = std::atoll(argv[5]);
  int64_t cols = 1LL << level;
  int64_t maxev = (8 * (n + 1)) / 20 + 4;
  int64_t half = (rows + 1) / 2;
  int64_t ncols = maxb * cols;

  std::vector<int16_t> k(maxb * rows * cols), col(rows), ev(maxev);
  std::vector<uint8_t> pwr(maxb), cls(ncols);
  std::vector<uint16_t> val(maxb);
  std::vector<int64_t> tell(maxev), meta(16);
  // v2 exact-width wire: byte capacities + 16-byte bulk-write slack
  std::vector<uint8_t> p4(ncols * rows / 2 + 32), p8(ncols * rows + 32);
  std::vector<uint8_t> p16(ncols * rows * 2 + 32);
  std::vector<uint8_t> w4(ncols / 2 + 8), w8(ncols / 2 + 8),
      w16(ncols / 2 + 8);
  (void)half;

  acm_scan_blocks(data.data(), n, skip, level, rows, maxb, maxev, k.data(),
                  pwr.data(), val.data(), ev.data(), tell.data(), col.data(),
                  meta.data());
  acm_scan_blocks_packed(data.data(), n, skip, level, rows, maxb, maxev,
                         cls.data(), p4.data(), p8.data(), p16.data(),
                         w4.data(), w8.data(), w16.data(),
                         pwr.data(), val.data(), ev.data(), tell.data(),
                         col.data(), meta.data());
  std::vector<int64_t> bitpos(maxb);
  acm_scan_corpus_into(data.data(), n, skip, level, rows, maxb, cls.data(),
                       p4.data(), p8.data(), p16.data(), w4.data(),
                       w8.data(), w16.data(), pwr.data(),
                       val.data(), ev.data(), tell.data(), maxev, col.data(),
                       meta.data(), bitpos.data(), /*final=*/1);
  // batched chunk scan: the same stream twice, back to back (exercises
  // the shared append-only payload streams + per-file slot strides)
  {
    std::vector<uint8_t> blob(2 * data.size());
    std::memcpy(blob.data(), data.data(), data.size());
    std::memcpy(blob.data() + data.size(), data.data(), data.size());
    int64_t off[2] = {0, static_cast<int64_t>(data.size())};
    int64_t lens2[2] = {n, n};
    int64_t skips[2] = {skip, skip};
    int64_t maxbs[2] = {maxb, maxb};
    int64_t cstride = ncols <= 0 ? 1 : maxb * ((cols + 3) / 4);
    std::vector<uint8_t> ccls(2 * cstride), cpwr(2 * maxb);
    std::vector<uint16_t> cval(2 * maxb);
    std::vector<uint8_t> cp4(2 * p4.size()), cp8(2 * p8.size()),
        cp16(2 * p16.size());
    std::vector<uint8_t> cw4(2 * w4.size()), cw8(2 * w8.size()),
        cw16(2 * w16.size());
    int64_t ev_cap = maxev;
    std::vector<int16_t> evout(2 * ev_cap);
    std::vector<int64_t> cmeta(16), cout(2 * 5);
    acm_scan_corpus_chunk(blob.data(), off, lens2, skips, maxbs, 2, level,
                          rows, maxb, cstride, ccls.data(), cp4.data(),
                          cp8.data(), cp16.data(), cw4.data(), cw8.data(),
                          cw16.data(), cpwr.data(), cval.data(), ev.data(),
                          tell.data(), maxev, ev_cap, evout.data(),
                          col.data(), cmeta.data(), cout.data());
  }

  std::vector<int16_t> pcm(maxb * rows * cols), kbuf(rows * cols);
  std::vector<uint32_t> wrap(2 * cols), xb(rows * cols + cols), yb(rows * cols + cols);
  std::vector<uint32_t> tblv(17);
  std::vector<int64_t> tblc(17);
  std::vector<uint8_t> evp(maxev);
  std::vector<uint16_t> evv(maxev);
  acm_decode_host(data.data(), n, skip, level, rows, maxb, maxev, pcm.data(),
                  wrap.data(), ev.data(), tell.data(), col.data(),
                  kbuf.data(), xb.data(), yb.data(), meta.data(),
                  /*final=*/1, tblv.data(), tblc.data(), evp.data(),
                  evv.data());
  // windowed mode: non-final prefix (exercises the NEED_MORE_DATA path)
  if (n > 4) {
    acm_decode_host(data.data(), n / 2, skip, level, rows, maxb, maxev,
                    pcm.data(), wrap.data(), ev.data(), tell.data(),
                    col.data(), kbuf.data(), xb.data(), yb.data(),
                    meta.data(), /*final=*/0, tblv.data(), tblc.data(),
                    evp.data(), evv.data());
  }
  std::printf("ok %lld blocks\n", static_cast<long long>(meta[0]));
  return 0;
}

// Native bitstream scanner: serial VLC decode -> dense coefficient tensors.
//
// This is the host-side hot loop of the framework (the one inherently
// sequential stage; SURVEY §2.3.2). It re-implements the observable
// semantics of the reference decoder's bit reader and filler grammar
// (reference: /root/reference/src/decode.c:41-163 bit reservoir,
// decode.c:168-502 fillers, decode.c:580-611 block loop) as modeled
// bit-for-bit by the Python oracle (libacm_tpu/scan/oracle.py) — the two
// backends are differential-fuzzed against each other.
//
// Two output modes share one scan driver:
//   - dense:  k[int16, nb*rows*cols] coefficient tensors (streaming path);
//   - packed: per-column width classes {zero,4,8,16 bits} + packed payload
//     streams, the wire format the corpus layer ships to the TPU (columns
//     are classified by filler code; unpacking happens on device).
//
// Semantics contract (same as the oracle, keep in sync):
//   - bits are LSB-first from a little-endian byte stream;
//   - the effective stream is the file plus ONE phantom zero byte;
//   - the reservoir is topped up in <=32-bit reloads truncated at stream
//     end; a read that cannot be satisfied after one reload fails, keeping
//     only the freshly reloaded bits (subsequent reads see the same bit
//     positions the C would);
//   - per decode attempt: 4-bit pwr + 16-bit val, then per column a 5-bit
//     filler code + payload; EOF at pwr/val or at a column code ends the
//     stream cleanly; EOF inside a filler payload is ERR_UNEXPECTED_EOF
//     and an invalid filler / packed code is ERR_CORRUPT — both recorded
//     as events after which scanning continues from the current position;
//   - loaded-byte positions are recorded after each attempt (raw_tell).
//
// Build: g++ -O3 -shared -fPIC (loaded via ctypes; no Python headers).

#include <cstdint>
#include <cstring>
#include <algorithm>

#if defined(__AVX512F__)
#include <immintrin.h>
#endif

namespace {

constexpr int16_t ERR_CORRUPT = -6;
constexpr int16_t ERR_UNEXPECTED_EOF = -7;
constexpr int64_t EXPECTED_EOF = -99;
// Windowed (non-final) scan only: the buffer ran dry mid-attempt; the
// attempt was rolled back and meta[10] holds the bit position to retry
// from once more bytes arrive. Never produced when the data is final.
constexpr int64_t NEED_MORE_DATA = -98;

struct BitReader {
  const uint8_t* data;
  int64_t len;         // real file bytes
  int64_t total_bits;  // 8 * (len + 1): file + phantom zero byte
  int64_t loaded_bits = 0;
  uint64_t res = 0;  // reservoir, LSB = next bit
  int avail = 0;
  bool fail = false;  // sticky until the caller handles it

  // final=false (windowed scan over a partial buffer): no phantom zero
  // byte — bits past the buffer mean "need more data", not EOF.
  BitReader(const uint8_t* d, int64_t n, bool final_data = true)
      : data(d), len(n), total_bits(final_data ? 8 * (n + 1) : 8 * n) {}

  inline uint32_t get(int n) {
    if (avail >= n) {
      uint32_t v = static_cast<uint32_t>(res) & ((1u << n) - 1);
      res >>= n;
      avail -= n;
      return v;
    }
    int need = n - avail;
    int take = static_cast<int>(
        std::min<int64_t>(32, total_bits - loaded_bits));
    int64_t start = loaded_bits >> 3;
    uint32_t word = 0;
    if (take == 32 && start + 4 <= len) {  // fast path: one unaligned load
      std::memcpy(&word, data + start, 4);  // little-endian host assumed
    } else {
      for (int i = 0; i < take / 8; i++) {
        int64_t pos = start + i;
        uint32_t byte = pos < len ? data[pos] : 0;
        word |= byte << (8 * i);
      }
    }
    loaded_bits += take;
    if (take < need) {
      res = word;
      avail = take;
      fail = true;
      return 0;
    }
    uint64_t v = res | (static_cast<uint64_t>(word & ((1u << need) - 1))
                        << avail);
    res = word >> need;
    avail = take - need;
    return static_cast<uint32_t>(v);
  }

  inline int64_t loaded_bytes() const { return loaded_bits / 8; }

  inline int64_t consumed_bits() const { return loaded_bits - avail; }

  // --- fast-path primitives (corpus mode only) ---------------------------
  // ensure() prefetches so decode loops can extract without per-read
  // checks. It changes loaded_bits *pacing* (observable only via raw_tell,
  // which the corpus path never reads); consumed-bit positions, values,
  // and first-failure sites are identical to the strict reader.

  inline bool ensure(int k) {  // k <= 32
    if (avail >= k) return true;
    // One refill to up to 64 reservoir bits, whole bytes (one unaligned
    // 8-byte load in the interior; the byte loop covers the stream tail
    // + phantom byte). Values, consumed-bit positions, and failure sites
    // are unchanged vs 32-bit refills (a field fails iff it extends past
    // total_bits); only loaded_bits PACING differs, which no fast-path
    // consumer observes (the strict reader never calls ensure).
    const int take = static_cast<int>(std::min<int64_t>(
        (64 - avail) & ~7, total_bits - loaded_bits));
    if (take <= 0) return false;
    const int64_t start = loaded_bits >> 3;
    uint64_t word;
    if (start + 8 <= len) {
      std::memcpy(&word, data + start, 8);  // little-endian host assumed
    } else {
      word = 0;
      for (int i = 0; i < (take + 7) / 8; i++) {
        int64_t pos = start + i;
        uint64_t byte = pos < len ? data[pos] : 0;
        word |= byte << (8 * i);
      }
    }
    if (take < 64) word &= (uint64_t{1} << take) - 1;
    res |= word << avail;
    loaded_bits += take;
    avail += take;
    return avail >= k;
  }

  inline uint32_t getu(int n) {  // unchecked: caller guaranteed avail >= n
    uint32_t v = static_cast<uint32_t>(res) & ((1u << n) - 1);
    res >>= n;
    avail -= n;
    return v;
  }

  // O(1) exact state reconstruction at an arbitrary consumed-bit count.
  // At any point with B bits consumed, loaded_bits is uniquely
  // min(ceil(B/32)*32, total_bits) (reloads are 32-bit, on demand, and
  // avail is always < 32), and the reservoir holds stream bits
  // [B, loaded_bits) LSB-first — all recomputable from the data.
  void seek_to_bit(int64_t B) {
    if (B >= total_bits) {
      loaded_bits = total_bits;
      res = 0;
      avail = 0;
      fail = true;
      return;
    }
    loaded_bits = std::min(((B + 31) / 32) * 32, total_bits);
    avail = static_cast<int>(loaded_bits - B);
    int64_t first_byte = B >> 3;
    int64_t last_byte = (loaded_bits + 7) >> 3;
    uint64_t acc = 0;
    int got = 0;
    for (int64_t byte = first_byte; byte < last_byte && got < 64; byte++) {
      uint64_t v = byte < len ? data[byte] : 0;
      acc |= v << got;
      got += 8;
    }
    acc >>= (B & 7);
    res = acc & ((1ull << avail) - 1);  // avail <= 31 always
    fail = false;
  }
};

// Coefficient lookup maps (decode.c:168-171).
constexpr int16_t MAP_1BIT[2] = {-1, +1};
constexpr int16_t MAP_2BIT_NEAR[4] = {-2, -1, +1, +2};
constexpr int16_t MAP_2BIT_FAR[4] = {-3, -2, +2, +3};
constexpr int16_t MAP_3BIT[8] = {-4, -3, -2, -1, +1, +2, +3, +4};

// Decode one column into the contiguous zeroed buffer `col[rows]`.
// Returns 0 ok, ERR_CORRUPT, or ERR_UNEXPECTED_EOF (on b.fail).
int decode_column(BitReader& b, int ind, int rows, int16_t* col) {
  auto chk = [&]() { return b.fail; };
  if (ind == 0) return 0;  // f_zero: column stays zero
  if (ind >= 3 && ind <= 16) {  // f_linear
    int middle = 1 << (ind - 1);
    for (int i = 0; i < rows; i++) {
      uint32_t v = b.get(ind);
      if (chk()) return ERR_UNEXPECTED_EOF;
      col[i] = static_cast<int16_t>(static_cast<int>(v) - middle);
    }
    return 0;
  }
  switch (ind) {
    case 17: {  // f_k13: 0 -> two zeros, 10 -> zero, 11x -> map_1bit
      for (int i = 0; i < rows;) {
        if (b.get(1) == 0) { if (chk()) return ERR_UNEXPECTED_EOF; i += 2; continue; }
        if (chk()) return ERR_UNEXPECTED_EOF;
        if (b.get(1) == 0) { if (chk()) return ERR_UNEXPECTED_EOF; i += 1; continue; }
        if (chk()) return ERR_UNEXPECTED_EOF;
        uint32_t x = b.get(1);
        if (chk()) return ERR_UNEXPECTED_EOF;
        col[i] = MAP_1BIT[x];
        i += 1;
      }
      return 0;
    }
    case 18: {  // f_k12
      for (int i = 0; i < rows; i++) {
        uint32_t h = b.get(1);
        if (chk()) return ERR_UNEXPECTED_EOF;
        if (h) {
          uint32_t x = b.get(1);
          if (chk()) return ERR_UNEXPECTED_EOF;
          col[i] = MAP_1BIT[x];
        }
      }
      return 0;
    }
    case 19: {  // f_t15: base-3 triples in 5 bits
      for (int i = 0; i < rows;) {
        uint32_t v = b.get(5);
        if (chk()) return ERR_UNEXPECTED_EOF;
        if (v >= 27) return ERR_CORRUPT;
        int16_t t[3] = {static_cast<int16_t>(v % 3 - 1),
                        static_cast<int16_t>((v / 3) % 3 - 1),
                        static_cast<int16_t>(v / 9 - 1)};
        for (int j = 0; j < 3 && i < rows; j++, i++) col[i] = t[j];
      }
      return 0;
    }
    case 20: {  // f_k24
      for (int i = 0; i < rows;) {
        if (b.get(1) == 0) { if (chk()) return ERR_UNEXPECTED_EOF; i += 2; continue; }
        if (chk()) return ERR_UNEXPECTED_EOF;
        if (b.get(1) == 0) { if (chk()) return ERR_UNEXPECTED_EOF; i += 1; continue; }
        if (chk()) return ERR_UNEXPECTED_EOF;
        uint32_t x = b.get(2);
        if (chk()) return ERR_UNEXPECTED_EOF;
        col[i] = MAP_2BIT_NEAR[x];
        i += 1;
      }
      return 0;
    }
    case 21: {  // f_k23
      for (int i = 0; i < rows; i++) {
        uint32_t h = b.get(1);
        if (chk()) return ERR_UNEXPECTED_EOF;
        if (h) {
          uint32_t x = b.get(2);
          if (chk()) return ERR_UNEXPECTED_EOF;
          col[i] = MAP_2BIT_NEAR[x];
        }
      }
      return 0;
    }
    case 22: {  // f_t27: base-5 triples in 7 bits
      for (int i = 0; i < rows;) {
        uint32_t v = b.get(7);
        if (chk()) return ERR_UNEXPECTED_EOF;
        if (v >= 125) return ERR_CORRUPT;
        int16_t t[3] = {static_cast<int16_t>(v % 5 - 2),
                        static_cast<int16_t>((v / 5) % 5 - 2),
                        static_cast<int16_t>(v / 25 - 2)};
        for (int j = 0; j < 3 && i < rows; j++, i++) col[i] = t[j];
      }
      return 0;
    }
    case 23: {  // f_k35
      for (int i = 0; i < rows;) {
        if (b.get(1) == 0) { if (chk()) return ERR_UNEXPECTED_EOF; i += 2; continue; }
        if (chk()) return ERR_UNEXPECTED_EOF;
        if (b.get(1) == 0) { if (chk()) return ERR_UNEXPECTED_EOF; i += 1; continue; }
        if (chk()) return ERR_UNEXPECTED_EOF;
        if (b.get(1) == 0) {
          if (chk()) return ERR_UNEXPECTED_EOF;
          uint32_t x = b.get(1);
          if (chk()) return ERR_UNEXPECTED_EOF;
          col[i] = MAP_1BIT[x];
        } else {
          if (chk()) return ERR_UNEXPECTED_EOF;
          uint32_t x = b.get(2);
          if (chk()) return ERR_UNEXPECTED_EOF;
          col[i] = MAP_2BIT_FAR[x];
        }
        i += 1;
      }
      return 0;
    }
    case 24: {  // f_k34
      for (int i = 0; i < rows; i++) {
        if (b.get(1) == 0) { if (chk()) return ERR_UNEXPECTED_EOF; continue; }
        if (chk()) return ERR_UNEXPECTED_EOF;
        if (b.get(1) == 0) {
          if (chk()) return ERR_UNEXPECTED_EOF;
          uint32_t x = b.get(1);
          if (chk()) return ERR_UNEXPECTED_EOF;
          col[i] = MAP_1BIT[x];
        } else {
          if (chk()) return ERR_UNEXPECTED_EOF;
          uint32_t x = b.get(2);
          if (chk()) return ERR_UNEXPECTED_EOF;
          col[i] = MAP_2BIT_FAR[x];
        }
      }
      return 0;
    }
    case 26: {  // f_k45
      for (int i = 0; i < rows;) {
        if (b.get(1) == 0) { if (chk()) return ERR_UNEXPECTED_EOF; i += 2; continue; }
        if (chk()) return ERR_UNEXPECTED_EOF;
        if (b.get(1) == 0) { if (chk()) return ERR_UNEXPECTED_EOF; i += 1; continue; }
        if (chk()) return ERR_UNEXPECTED_EOF;
        uint32_t x = b.get(3);
        if (chk()) return ERR_UNEXPECTED_EOF;
        col[i] = MAP_3BIT[x];
        i += 1;
      }
      return 0;
    }
    case 27: {  // f_k44
      for (int i = 0; i < rows; i++) {
        uint32_t h = b.get(1);
        if (chk()) return ERR_UNEXPECTED_EOF;
        if (h) {
          uint32_t x = b.get(3);
          if (chk()) return ERR_UNEXPECTED_EOF;
          col[i] = MAP_3BIT[x];
        }
      }
      return 0;
    }
    case 29: {  // f_t37: base-11 pairs in 7 bits
      for (int i = 0; i < rows;) {
        uint32_t v = b.get(7);
        if (chk()) return ERR_UNEXPECTED_EOF;
        if (v >= 121) return ERR_CORRUPT;
        int16_t t[2] = {static_cast<int16_t>(v % 11 - 5),
                        static_cast<int16_t>(v / 11 - 5)};
        for (int j = 0; j < 2 && i < rows; j++, i++) col[i] = t[j];
      }
      return 0;
    }
    default:  // 1, 2, 25, 28, 30, 31: f_bad
      return ERR_CORRUPT;
  }
}

// ---------------------------------------------------------------------------
// Fast-path column decode, output-sink templated.
//
// The fast scan used to stage every column into `col_tmp` and re-walk it
// into the emitter's destination; for the common classes (no possible
// out-of-range index) the grammar now writes STRAIGHT into the final
// destination — the packed wire streams (nibble/byte/int16 payloads) or
// the fused host decoder's row-major block buffer — through a small sink
// vocabulary. Bit consumption, values, and failure sites are identical to
// the strict decode_column (differential-fuzzed); only where the values
// land changes.
//
// Map fillers additionally decode through an 8-bit multi-symbol LUT: one
// table lookup on the next 8 reservoir bits yields every complete symbol
// inside them (up to 16 rows as packed nibbles) plus the bit length —
// replacing 1-3 data-dependent branches per row (the branch mispredicts
// were the scan's dominant cost on sparse content) with one indexed load.

struct ColSink {  // staged int16 column buffer (pre-zeroed)
  int16_t* col;
  inline void put(int i, int v) { col[i] = static_cast<int16_t>(v); }
};

struct StridedSink {  // column c of a row-major block (pre-zeroed)
  int16_t* base;
  int stride;
  inline void put(int i, int v) {
    base[static_cast<int64_t>(i) * stride] = static_cast<int16_t>(v);
  }
};

struct Pay8Sink {  // byte payload column (every row written: linear only)
  int8_t* dst;
  inline void put(int i, int v) { dst[i] = static_cast<int8_t>(v); }
};

struct Pay16Sink {
  int16_t* dst;
  inline void put(int i, int v) { dst[i] = static_cast<int16_t>(v); }
};

struct Nib4Sink {  // nibble-packed payload column (pre-zeroed, OR-writes)
  uint8_t* dst;
  inline void put(int i, int v) {
    dst[i >> 1] |= (v & 0xF) << ((i & 1) * 4);
  }
  // OR up to 16 packed nibbles at nibble offset i. May touch up to 9
  // bytes beyond dst[i>>1] — callers guarantee PAY4_SLACK writable bytes
  // past the column (overruns land in the NEXT column's region, which is
  // zeroed when that column begins, or in the slack tail).
  inline void put_nibs(int i, uint64_t nibs, int /*n*/) {
    uint8_t* p = dst + (i >> 1);
    uint64_t lo;
    std::memcpy(&lo, p, 8);
    if (i & 1) {
      lo |= nibs << 4;
      std::memcpy(p, &lo, 8);
      p[8] = static_cast<uint8_t>(p[8] | (nibs >> 60));
    } else {
      lo |= nibs;
      std::memcpy(p, &lo, 8);
    }
  }
};

//: writable slack required past the last 4-bit payload column (Nib4Sink
//: bulk writes; see above). Python-side allocators honor this.
constexpr int PAY4_SLACK = 16;

// ---------------------------------------------------------------------------
// Exact-width wire sinks (wire format v2): each payload stream is a flat
// LSB-first BIT stream; every nonzero column occupies rows*w bits at its
// filler's wire width w (a static property of the filler code — linear
// values are exactly ind bits by construction, map/packed fillers are
// bounded by their value maps). The host↔device link is the measured
// bottleneck of the corpus pipeline on this hardware; shipping exact
// widths instead of byte-aligned classes cuts the wire ~25% and spends
// (abundant) device gather compute instead.

// Wire bit width of a nonzero filler's coefficients.
inline int wire_width_of(int ind) {
  if (ind >= 3 && ind <= 16) return ind;      // linear: b - 2^(ind-1)
  if (ind <= 19) return 2;                    // k13, k12, t15: -1..1
  if (ind <= 22) return 3;                    // k24, k23, t27: -2..2
  if (ind <= 24) return 3;                    // k35, k34: -3..3
  return 4;                                   // k45, k44, t37: -4..5
}

// Random-access bit writer: value i lands at base + i*w. Requires the
// column's bit region pre-zeroed (writes OR) and 16 bytes of tail slack.
struct BitPackSink {
  uint8_t* buf;
  int64_t base;
  int w;
  inline void put(int i, int v) {
    int64_t bit = base + static_cast<int64_t>(i) * w;
    uint8_t* p = buf + (bit >> 3);
    uint32_t m;  // 4-byte RMW: w + 7 <= 23 bits
    std::memcpy(&m, p, 4);
    m |= (static_cast<uint32_t>(v) & ((1u << w) - 1)) << (bit & 7);
    std::memcpy(p, &m, 4);
  }
  inline void put_packed(int i, uint64_t pk) {  // <= 64 payload bits
    int64_t bit = base + static_cast<int64_t>(i) * w;
    uint8_t* p = buf + (bit >> 3);
    int sh = bit & 7;
    uint64_t lo;
    std::memcpy(&lo, p, 8);
    lo |= pk << sh;
    std::memcpy(p, &lo, 8);
    if (sh) p[8] = static_cast<uint8_t>(p[8] | (pk >> (64 - sh)));
  }
};

// Sequential bit writer for dense (every-row) columns: overwrites whole
// bytes through a local accumulator — no pre-zeroing, no RMW in the loop.
struct BitStreamSink {
  uint8_t* ptr;
  uint64_t acc;
  int nacc;
  int w;
  static BitStreamSink at(uint8_t* buf, int64_t base, int w) {
    uint8_t* p = buf + (base >> 3);
    int n = static_cast<int>(base & 7);
    return BitStreamSink{p, static_cast<uint64_t>(*p) & ((1u << n) - 1), n,
                         w};
  }
  inline void put(int /*i*/, int v) {
    if (nacc + w > 64) {
      // drain before appending: linear_bulk's strict tail fallback can
      // arrive with up to 63 pending bits (the bulk branch pre-drains,
      // this one could not), and an append past bit 63 silently drops
      // the field's top bits (fuzz seed 9205: the stream's final wide
      // field lost its sign bit on the wire)
      uint32_t out = static_cast<uint32_t>(acc);
      std::memcpy(ptr, &out, 4);
      ptr += 4;
      acc >>= 32;
      nacc -= 32;  // nacc was >= 49 (w <= 16), so >= 17 remains
    }
    acc |= (static_cast<uint64_t>(static_cast<uint32_t>(v))
            & ((1u << w) - 1)) << nacc;
    nacc += w;
    if (nacc >= 32) {
      uint32_t out = static_cast<uint32_t>(acc);
      std::memcpy(ptr, &out, 4);
      ptr += 4;
      acc >>= 32;
      nacc -= 32;
    }
  }
  inline void flush() {  // final partial bytes, high bits zero
    // one 8-byte store instead of a byte-drain loop: acc's bits above
    // nacc are zero by construction, so the scribble past the frontier
    // is deterministic zeros; callers' payload buffers carry >=
    // PAY_SLACK (16) tail bytes and the next column's at()/stores
    // overwrite everything from the frontier byte on. The sink is
    // per-column and dead after flush.
    std::memcpy(ptr, &acc, 8);
    ptr += (nacc + 7) >> 3;
    acc = 0;
    nacc = 0;
  }
};

struct MapLutEntry;  // fwd (bulk-apply dispatch below)

// Top bit of every w-bit field across 64 bits, per width: the linear
// fillers' wire identity. A linear value is v = b - 2^(w-1) (b = the raw
// w-bit stream field), and (b - 2^(w-1)) mod 2^w == b XOR 2^(w-1), so a
// linear column's exact-width wire bits are the stream's own payload
// bits with each field's top bit flipped — whole field groups copy
// reservoir -> wire with one XOR, no per-value decode at all.
struct TopMask {
  uint64_t m[17] = {0};
  TopMask() {
    for (int w = 1; w <= 16; w++)
      for (int p = w - 1; p < 64; p += w) m[w] |= 1ull << p;
  }
};
const TopMask TOPMASK;

// Generic bulk-nibble fallback: unpack 4-bit two's complement and put().
// n may be 17 (a final two-zero advance can overhang row 16 when the
// LUT window is wider than 8 bits); values only ever live at rows
// <= 15, so the extraction is capped below the u64's 16 nibbles.
template <typename Sink>
inline void put_nibs_generic(Sink& s, int i, uint64_t nibs, int n) {
  if (n > 16) n = 16;
  for (int j = 0; j < n; j++) {
    int v = static_cast<int>((nibs >> (4 * j)) & 0xF);
    if (v) s.put(i + j, (v ^ 8) - 8);  // pre-zeroed dst: zeros are free
  }
}

// One grammar step for the map/packed fillers (<= 7 bits). CHECKED uses
// the strict reader (EOF-able); unchecked requires avail >= 7.
template <bool CHECKED, typename Sink>
inline int one_step(BitReader& b, int ind, int rows, int& i, Sink& s) {
#define STEP_GET(var, n)                          \
  uint32_t var;                                   \
  if constexpr (CHECKED) {                        \
    var = b.get(n);                               \
    if (b.fail) return ERR_UNEXPECTED_EOF;        \
  } else {                                        \
    var = b.getu(n);                              \
  }
  switch (ind) {
    case 17: {  // f_k13: 0 -> two zeros, 10 -> zero, 11x -> map_1bit
      STEP_GET(h, 1);
      if (!h) { i += 2; return 0; }
      STEP_GET(h2, 1);
      if (!h2) { i += 1; return 0; }
      STEP_GET(x, 1);
      s.put(i, MAP_1BIT[x]);
      i += 1;
      return 0;
    }
    case 18: {  // f_k12
      STEP_GET(h, 1);
      if (h) {
        STEP_GET(x, 1);
        s.put(i, MAP_1BIT[x]);
      }
      i += 1;
      return 0;
    }
    case 19: {  // f_t15: base-3 triples in 5 bits
      STEP_GET(v, 5);
      if (v >= 27) return ERR_CORRUPT;
      const int16_t t[3] = {static_cast<int16_t>(v % 3 - 1),
                            static_cast<int16_t>((v / 3) % 3 - 1),
                            static_cast<int16_t>(v / 9 - 1)};
      for (int j = 0; j < 3 && i < rows; j++, i++) s.put(i, t[j]);
      return 0;
    }
    case 20: {  // f_k24
      STEP_GET(h, 1);
      if (!h) { i += 2; return 0; }
      STEP_GET(h2, 1);
      if (!h2) { i += 1; return 0; }
      STEP_GET(x, 2);
      s.put(i, MAP_2BIT_NEAR[x]);
      i += 1;
      return 0;
    }
    case 21: {  // f_k23
      STEP_GET(h, 1);
      if (h) {
        STEP_GET(x, 2);
        s.put(i, MAP_2BIT_NEAR[x]);
      }
      i += 1;
      return 0;
    }
    case 22: {  // f_t27: base-5 triples in 7 bits
      STEP_GET(v, 7);
      if (v >= 125) return ERR_CORRUPT;
      const int16_t t[3] = {static_cast<int16_t>(v % 5 - 2),
                            static_cast<int16_t>((v / 5) % 5 - 2),
                            static_cast<int16_t>(v / 25 - 2)};
      for (int j = 0; j < 3 && i < rows; j++, i++) s.put(i, t[j]);
      return 0;
    }
    case 23: {  // f_k35
      STEP_GET(h, 1);
      if (!h) { i += 2; return 0; }
      STEP_GET(h2, 1);
      if (!h2) { i += 1; return 0; }
      STEP_GET(h3, 1);
      if (!h3) {
        STEP_GET(x, 1);
        s.put(i, MAP_1BIT[x]);
      } else {
        STEP_GET(x, 2);
        s.put(i, MAP_2BIT_FAR[x]);
      }
      i += 1;
      return 0;
    }
    case 24: {  // f_k34
      STEP_GET(h, 1);
      if (!h) { i += 1; return 0; }
      STEP_GET(h2, 1);
      if (!h2) {
        STEP_GET(x, 1);
        s.put(i, MAP_1BIT[x]);
      } else {
        STEP_GET(x, 2);
        s.put(i, MAP_2BIT_FAR[x]);
      }
      i += 1;
      return 0;
    }
    case 26: {  // f_k45
      STEP_GET(h, 1);
      if (!h) { i += 2; return 0; }
      STEP_GET(h2, 1);
      if (!h2) { i += 1; return 0; }
      STEP_GET(x, 3);
      s.put(i, MAP_3BIT[x]);
      i += 1;
      return 0;
    }
    case 27: {  // f_k44
      STEP_GET(h, 1);
      if (h) {
        STEP_GET(x, 3);
        s.put(i, MAP_3BIT[x]);
      }
      i += 1;
      return 0;
    }
    case 29: {  // f_t37: base-11 pairs in 7 bits
      STEP_GET(v, 7);
      if (v >= 121) return ERR_CORRUPT;
      const int16_t t[2] = {static_cast<int16_t>(v % 11 - 5),
                            static_cast<int16_t>(v / 11 - 5)};
      for (int j = 0; j < 2 && i < rows; j++, i++) s.put(i, t[j]);
      return 0;
    }
    default:
      return ERR_CORRUPT;
  }
#undef STEP_GET
}

// Multi-symbol LUT for the 8 map fillers (17,18,20,21,23,24,26,27) and
// the 3 trip fillers (19,22,29): each 8-bit window resolves to a fixed
// run of complete symbols. The maps are TOTAL prefix codes (every bit
// pattern decodes); the trips are fixed-width symbols with range checks
// (t15 v<27, t27 v<125, t37 v<121) whose per-symbol div/mod chains the
// LUT precomputes away — an entry simply ends before an invalid symbol,
// and a window whose FIRST symbol is invalid gets nbits=0, which the
// decode loop routes to the strict per-symbol step (identical failure
// site). Entries are built at load time by running one_step() itself
// over a 1-byte stream — the table can't drift from the grammar.
struct MapLutEntry {
  uint64_t nibs;  // values as 4-bit two's complement at their row offsets
  uint64_t packw;  // same values packed at the filler's WIRE width
  uint8_t nbits;  // bits consumed by complete symbols (0: the window's
                  // FIRST symbol is invalid — strict-step fallback)
  uint8_t nrows;  // rows produced (<= 18: a final two-zero advance or an
                  // all-zero trip tail may overhang row 15; values only
                  // ever live at rows <= 15)
};

template <typename Sink>
inline void sink_apply_lut(Sink& s, int i, const MapLutEntry& e) {
  put_nibs_generic(s, i, e.nibs, e.nrows);
}
template <>
inline void sink_apply_lut<StridedSink>(StridedSink& s, int i,
                                        const MapLutEntry& e) {
  // branchless: the destination is pre-zeroed, so writing the zero
  // nibbles too costs a store but removes a data-dependent branch per
  // row (map-filler content mixes zeros and values unpredictably);
  // capped at 16 like put_nibs_generic (rows beyond 15 hold no values)
  int n = e.nrows > 16 ? 16 : e.nrows;
  for (int j = 0; j < n; j++) {
    int v = static_cast<int>((e.nibs >> (4 * j)) & 0xF);
    s.put(i + j, (v ^ 8) - 8);
  }
}
template <>
inline void sink_apply_lut<Nib4Sink>(Nib4Sink& s, int i,
                                     const MapLutEntry& e) {
  s.put_nibs(i, e.nibs, e.nrows);
}
template <>
inline void sink_apply_lut<BitPackSink>(BitPackSink& s, int i,
                                        const MapLutEntry& e) {
  s.put_packed(i, e.packw);
}

#ifndef MAP_LUT_BITS
#define MAP_LUT_BITS 8
#endif

struct MapLut {
  static constexpr int BITS = MAP_LUT_BITS;  // peek-window width
  static constexpr int NF = 11;
  MapLutEntry e[NF][1 << BITS];
  int8_t slot[32];

  struct SimSink {
    uint64_t nibs = 0;
    bool over = false;  // nonzero value at row >= 16 (trip overhang):
                        // the u64 can't hold it, the symbol rolls back
    inline void put(int i, int v) {
      if (i < 16)
        nibs |= static_cast<uint64_t>(v & 0xF) << (4 * i);
      else if (v & 0xF)
        over = true;
    }
  };

  MapLut() {
    constexpr int FILLERS[NF] = {17, 18, 19, 20, 21, 22, 23, 24, 26, 27,
                                 29};
    for (int i = 0; i < 32; i++) slot[i] = -1;
    for (int f = 0; f < NF; f++) {
      slot[FILLERS[f]] = static_cast<int8_t>(f);
      for (int pat = 0; pat < (1 << BITS); pat++) {
        uint8_t bytes[2] = {static_cast<uint8_t>(pat),
                            static_cast<uint8_t>(pat >> 8)};
        BitReader b(bytes, (BITS + 7) / 8, /*final_data=*/false);
        SimSink s;
        int i = 0;
        int64_t good_bits = 0;
        while (i < 16) {  // value nibbles must fit the u64
          // snapshot-and-step: a symbol that would cross the BITS-wide
          // window (EOF on a byte boundary, or the explicit consumed
          // check for BITS % 8 != 0), fail its range check (trips), or
          // put a nonzero value past row 15 is rolled back whole —
          // reader, row cursor, AND sink (one_step writes the sink
          // before a non-EOF return)
          BitReader saved = b;
          int saved_i = i;
          uint64_t saved_nibs = s.nibs;
          int rc = one_step<true, SimSink>(b, FILLERS[f], 1 << 20, i, s);
          if (rc != 0 || s.over || b.consumed_bits() > BITS) {
            b = saved;
            i = saved_i;
            s.nibs = saved_nibs;
            break;
          }
          good_bits = b.consumed_bits();
        }
        // repack the nibble values at the filler's wire width (values at
        // rows <= 15 only, so nrows*w <= 64 always holds)
        const int w = wire_width_of(FILLERS[f]);
        uint64_t packw = 0;
        for (int j = 0; j < 16; j++) {
          uint64_t v = (s.nibs >> (4 * j)) & 0xF;
          int sv = (static_cast<int>(v) ^ 8) - 8;
          packw |= (static_cast<uint64_t>(sv) & ((1u << w) - 1)) << (j * w);
        }
        e[f][pat] = MapLutEntry{
            s.nibs, packw,
            static_cast<uint8_t>(good_bits > 0 ? good_bits : 0),
            static_cast<uint8_t>(i)};
      }
    }
  }
};

const MapLut MAP_LUT;

// LUT-driven map-filler column decode. avail >= 8 guarantees the peeked
// window is fully loaded; entries apply only when their whole row run
// fits (otherwise one per-symbol step, which also re-checks i < rows the
// way the strict path does).
template <typename Sink>
inline int decode_map_col(BitReader& b, int slot, int ind, int rows,
                          Sink& s) {
  int i = 0;
  const MapLutEntry* lut = MAP_LUT.e[slot];
  constexpr int W = MapLut::BITS;
  constexpr uint32_t MASK = (1u << W) - 1;
  while (i < rows) {
    if (!b.ensure(32) || b.avail < W) {
      int rc = one_step<true, Sink>(b, ind, rows, i, s);
      if (rc != 0) return rc;
      continue;
    }
    const MapLutEntry& e = lut[static_cast<uint32_t>(b.res) & MASK];
    if (e.nbits && i + e.nrows <= rows) {
      if (e.nibs) sink_apply_lut(s, i, e);
      b.res >>= e.nbits;
      b.avail -= e.nbits;
      i += e.nrows;
    } else {
      // column boundary, or an invalid trip symbol heads the window
      // (nbits == 0) — the strict step clamps/fails at the exact site
      int rc = one_step<false, Sink>(b, ind, rows, i, s);  // avail >= 8 > 7
      if (rc != 0) return rc;
    }
  }
  return 0;
}

template <typename Sink>
inline int decode_linear_col(BitReader& b, int ind, int rows, Sink& s) {
  const int middle = 1 << (ind - 1);
  const uint32_t m = (1u << ind) - 1;
  int i = 0;
  // Four fields per reservoir snapshot (4*ind <= 32 bits, guaranteed by
  // ensure(32) for ind <= 8 — the bulk of real corpora): one avail/res
  // update per group instead of per field. Values, consumed-bit
  // positions, and failure sites are unchanged (the tail loop below is
  // the strict-paced original).
  if (ind <= 8) {
    const int step = 4 * ind;
    while (i + 4 <= rows && b.ensure(32)) {
      uint64_t r = b.res;
      s.put(i, static_cast<int>(static_cast<uint32_t>(r) & m) - middle);
      s.put(i + 1,
            static_cast<int>(static_cast<uint32_t>(r >> ind) & m) - middle);
      s.put(i + 2, static_cast<int>(static_cast<uint32_t>(r >> (2 * ind)) & m)
                       - middle);
      s.put(i + 3, static_cast<int>(static_cast<uint32_t>(r >> (3 * ind)) & m)
                       - middle);
      b.res = r >> step;
      b.avail -= step;
      i += 4;
    }
  } else {
    // wide fields (9..16 bits): two per snapshot (2*ind <= 32)
    const int step = 2 * ind;
    while (i + 2 <= rows && b.ensure(32)) {
      uint64_t r = b.res;
      s.put(i, static_cast<int>(static_cast<uint32_t>(r) & m) - middle);
      s.put(i + 1,
            static_cast<int>(static_cast<uint32_t>(r >> ind) & m) - middle);
      b.res = r >> step;
      b.avail -= step;
      i += 2;
    }
  }
  while (i < rows) {
    if (b.ensure(32)) {
      int nfit = b.avail / ind;
      int stop = i + nfit < rows ? i + nfit : rows;
      for (; i < stop; i++)
        s.put(i, static_cast<int>(b.getu(ind)) - middle);
    } else {
      uint32_t v = b.get(ind);
      if (b.fail) return ERR_UNEXPECTED_EOF;
      s.put(i, static_cast<int>(v) - middle);
      i++;
    }
  }
  return 0;
}

// Sink-templated fast column decode: values / consumed bits / failure
// sites identical to decode_column (the strict spec path). All non-zero
// non-linear fillers (maps AND trips) run the multi-symbol LUT loop.
template <typename Sink>
int decode_col_sink(BitReader& b, int ind, int rows, Sink&& s) {
  if (ind == 0) return 0;
  if (ind >= 3 && ind <= 16) return decode_linear_col(b, ind, rows, s);
  int slot = MAP_LUT.slot[ind & 31];
  if (slot >= 0) return decode_map_col(b, slot, ind, rows, s);
  return ERR_CORRUPT;
}

int decode_column_fast(BitReader& b, int ind, int rows, int16_t* col) {
  return decode_col_sink(b, ind, rows, ColSink{col});
}

// Smallest filler-family |k| bound that can exceed an amp table of
// 2^pwr entries — i.e. this (ind, pwr) column can contain out-of-range
// coefficient indexes (stale-amp-table semantics; see scan_driver).
// Linear values span [-2^(ind-1), 2^(ind-1)-1], exactly an (ind-1)-bit
// table's legal range, so linear escapes only when ind-1 > pwr; map and
// packed fillers reach +maxk, escaping when maxk >= 2^pwr.
inline bool possible_oor(int ind, uint32_t pwr) {
  if (ind >= 3 && ind <= 16)
    return static_cast<uint32_t>(ind - 1) > pwr;
  int maxk = ind == 29 ? 5
             : (ind == 26 || ind == 27 ? 4 : (ind >= 23 ? 3 : 2));
  return maxk >= (1 << pwr);
}

// Shared scan driver, parameterized by an emitter:
//   void begin_block();                 -- checkpoint (for rollback)
//   void table_update(uint32_t pwr, uint32_t val);  -- amp-table write
//     (after every successful pwr/val read, even for attempts that later
//      fail — the reference regenerates the table first, decode.c:591-599)
//   void emit_column(int c, const int16_t* col);
//   void commit_block(uint32_t pwr, uint32_t val, bool oor);
//   void rollback_block();
//
// final_data=false (windowed scan): the buffer is a prefix of the stream;
// running out of bits mid-attempt rolls the attempt back and stops with
// status NEED_MORE_DATA, meta[10] = the attempt's start bit (retry once
// more bytes arrive). A retried attempt re-reads the same pwr/val, so the
// rolled-back table_update is re-applied identically (idempotent).
// tell_bits=true records per-event *consumed-bit* positions in tell_out
// instead of loaded bytes (windowed raw_tell reconstructs the strict
// loaded-byte pacing from them in O(1): loaded = min(ceil(B/32)*32, end)).
template <typename Emitter, bool FAST = false>
int64_t scan_driver(const uint8_t* data, int64_t nbytes, int64_t skip_bits,
                    int32_t /*level*/, int32_t rows, int32_t cols,
                    int64_t max_blocks, int64_t max_events,
                    int16_t* events_out, int64_t* tell_out, int64_t* meta,
                    int16_t* col_tmp, Emitter& em,
                    bool stop_on_error = false,
                    int64_t* bitpos_out = nullptr,
                    bool final_data = true,
                    bool tell_bits = false,
                    uint8_t* ev_pwr_out = nullptr,
                    uint16_t* ev_val_out = nullptr) {
  BitReader b(data, nbytes, final_data);
  b.seek_to_bit(skip_bits);
  meta[4] = b.loaded_bytes();

  int64_t n_blocks = 0, n_events = 0, status = 0, oor_flag = 0;
  int64_t terminal_att = 0;
  int64_t resume_bit = skip_bits;
  while (n_blocks < max_blocks) {
    // max(): when skip_bits lies beyond a short window, seek_to_bit
    // clamps and consumed_bits() would under-report the resume point
    int64_t attempt_bit = std::max(b.consumed_bits(), skip_bits);
    resume_bit = attempt_bit;
    uint32_t pwr = b.get(4);
    uint32_t val = b.get(16);
    if (b.fail) {
      status = final_data ? EXPECTED_EOF : NEED_MORE_DATA;
      break;
    }
    if (n_events >= max_events) {
      meta[0] = n_blocks; meta[1] = n_events; meta[2] = 0;
      meta[3] = b.loaded_bytes();
      return -1;
    }
    em.table_update(pwr, val);
    em.begin_block();
    int outcome = 0;
    bool clean_eof = false;
    bool block_oor = false;
    for (int c = 0; c < cols; c++) {
      uint32_t ind = b.get(5);
      if (b.fail) {
        clean_eof = true;  // EOF at a column code is a clean stream end
        break;
      }
      if (ind == 0) {  // f_zero: emitters treat absent as zero
        if constexpr (FAST) {
          // A zero code usually starts a RUN (sparse speech content is
          // ~90% f_zero in long stretches): skip eight more 5-bit codes
          // at a time as one 40-bit reservoir window. Gated on the
          // observed zero so dense content never pays the check, and
          // engages only on already-loaded bits — values, consumed-bit
          // positions, and failure sites are identical to per-code
          // reads (a column code can only EOF at a reload, which this
          // never performs). +12% on the sparse-class packed scan,
          // music/dense neutral (interleaved scanbench A/B).
          while (c + 9 <= cols && b.ensure(32) && b.avail >= 40 &&
                 (b.res & ((uint64_t{1} << 40) - 1)) == 0) {
            b.res >>= 40;
            b.avail -= 40;
            c += 8;
          }
        }
        continue;
      }
      if constexpr (FAST) {
        // no-staging path: the emitter decodes straight into its final
        // destination when this (ind, pwr) column cannot produce
        // out-of-range indexes (the overwhelmingly common case); falls
        // through to the staged + range-checked path otherwise
        if (em.emit_direct(b, c, static_cast<int>(ind), pwr, &outcome)) {
          if (outcome != 0) break;
          continue;
        }
      }
      std::memset(col_tmp, 0, rows * sizeof(int16_t));
      outcome = FAST ? decode_column_fast(b, static_cast<int>(ind), rows,
                                          col_tmp)
                     : decode_column(b, static_cast<int>(ind), rows, col_tmp);
      if (outcome != 0) break;
      // stale-amp-table detection: a filler can emit indexes outside the
      // current block's table [-count, count-1] (corrupt streams only);
      // the reference then reads stale table memory. Such blocks are
      // flagged — emitters that compute values (SynthEmitter) reproduce
      // the stale reads exactly via the virtual table; index-shipping
      // emitters leave the fallback to the caller. Only fillers whose
      // range can exceed the table need scanning (linear wider than
      // pwr+1; maps when count < 8; t37 when count < 5).
      {
        int maxk = (ind >= 3 && ind <= 16) ? (1 << (ind - 1))
                   : (ind == 29 ? 5 : (ind == 26 || ind == 27 ? 4
                   : (ind >= 23 ? 3 : 2)));
        int count = 1 << pwr;
        // legal range is [-count, count-1]; map fillers reach +maxk and
        // linear fillers reach -maxk/+maxk-1, so anything with
        // maxk >= count may need the scan (cheap; skipped for real audio)
        if (maxk >= count) {
          for (int i2 = 0; i2 < rows; i2++) {
            int v = col_tmp[i2];
            if (v < -count || v > count - 1) {
              oor_flag = 1;
              block_oor = true;
              break;
            }
          }
        }
      }
      em.emit_column(c, static_cast<int>(ind), col_tmp);
    }
    if (clean_eof) {
      em.rollback_block();
      status = final_data ? EXPECTED_EOF : NEED_MORE_DATA;
      if (final_data) {
        // the terminal attempt read pwr/val before EOF at a column code,
        // so the reference's amp table WAS updated by it (decode.c:
        // 591-599 runs before fill_block) even though no event exists.
        // Report it so seek-path table reconstruction can fold it in;
        // meta[11] flags its presence at index n_events.
        terminal_att = 1;
        if (ev_pwr_out) ev_pwr_out[n_events] = static_cast<uint8_t>(pwr);
        if (ev_val_out) ev_val_out[n_events] = static_cast<uint16_t>(val);
      }
      break;
    }
    if (b.fail) {
      b.fail = false;  // unexpected EOF: keep scanning after the event
      if (!final_data && outcome == ERR_UNEXPECTED_EOF) {
        // windowed: the filler ran dry because the window ended, not
        // because the stream did — retry the whole attempt with more data
        em.rollback_block();
        status = NEED_MORE_DATA;
        break;
      }
    }
    events_out[n_events] = static_cast<int16_t>(outcome);
    tell_out[n_events] = tell_bits ? b.consumed_bits() : b.loaded_bytes();
    // per-attempt amp-table header fields: the seek path rebuilds the
    // reference's persistent table from exactly the attempts its reads
    // consumed (a window may decode ahead; those updates must not count)
    if (ev_pwr_out) ev_pwr_out[n_events] = static_cast<uint8_t>(pwr);
    if (ev_val_out) ev_val_out[n_events] = static_cast<uint16_t>(val);
    n_events++;
    if (outcome == 0) {
      if (bitpos_out) bitpos_out[n_blocks] = attempt_bit;
      em.commit_block(pwr, val, block_oor);
      n_blocks++;
    } else {
      em.rollback_block();
      if (stop_on_error) break;  // corpus mode: post-error blocks unused
    }
  }
  meta[0] = n_blocks;
  meta[1] = n_events;
  meta[2] = status;
  meta[3] = b.loaded_bytes();
  meta[9] = oor_flag;
  // resume point for windowed decode: where the next attempt starts
  // (== the rolled-back attempt's start bit after NEED_MORE_DATA)
  meta[10] = status == NEED_MORE_DATA ? resume_bit : b.consumed_bits();
  meta[11] = terminal_att;
  return 0;
}

struct DenseEmitter {
  int16_t* k_out;
  uint8_t* pwr_out;
  uint16_t* val_out;
  int rows, cols;
  int64_t block_elems;
  int64_t nb = 0;

  void begin_block() {
    std::memset(k_out + nb * block_elems, 0, block_elems * sizeof(int16_t));
  }
  void table_update(uint32_t, uint32_t) {}  // ships indexes, not values
  void emit_column(int c, int /*ind*/, const int16_t* col) {
    int16_t* base = k_out + nb * block_elems + c;
    for (int i = 0; i < rows; i++) base[static_cast<int64_t>(i) * cols] = col[i];
  }
  void commit_block(uint32_t pwr, uint32_t val, bool /*oor*/) {
    pwr_out[nb] = static_cast<uint8_t>(pwr);
    val_out[nb] = static_cast<uint16_t>(val);
    nb++;
  }
  void rollback_block() {}
};

// Host synthesis core: the closed-form filterbank (SURVEY §2.6 / the same
// math as ops/synth_jax.synth_words) on one block. Each of the `level`
// passes views the flat rows*cols block as (rows<<(p+1), cols>>(p+1)) and
// computes the pure order-2 FIR on *raw* inputs
//     y[r] = s[r] + 2*s[r-1] + s[r-2]   (r even)
//     y[r] = 2*s[r-1] - s[r] - s[r-2]   (r odd)
// double-buffered (x raw -> y out, then swap) so every inner loop is a
// forward contiguous SIMD-able sweep. s[-2], s[-1] come from the pass's
// segment of the persistent carry `wrap` (2*cols-2), updated to the last
// two raw rows. All arithmetic uint32 (= the wrapping int32 contract of
// the format; no saturation). Returns the buffer holding the result.
// Reference behavior being reproduced: decode.c:508-577 (juggle passes,
// +1 rounding bias after pass 0, wrapbuf threading).
// One pass as a single flat sweep: with 2L words of history prepended at
// x[-2L..-1] (L = sub_len), every element is
//     y[i] = x[i] + x[i-2L] + 2*x[i-L]       ((i/L) even)
//     y[i] = 2*x[i-L] - x[i] - x[i-2L]       ((i/L) odd)
// Small L is template-specialized so the 2L-element period body fully
// unrolls and SLP-vectorizes (the per-row formulation left the hot late
// passes — L in {1,2,4,8} with thousands of rows — as scalar loop
// overhead). n is always a multiple of 2L (n = rows<<(p+1) * L).
// Uniform sign formulation of one pass — the same recurrence holds for
// even and odd sub-rows with only the sign of the (x[i] + x[i-2L]) term
// flipping:  y[i] = 2*x[i-L] + s(i)*(x[i] + x[i-2L]),  s(i) = +1 when
// (i/L) is even, −1 when odd. One flat loop, no per-parity sub-loops:
// the compiler vectorizes it with the sign mask computed from the lane
// index (period 2L, a compile-time constant vector when 2L divides the
// vector width — exactly the small-L late passes that were running as
// scalar 2L-element bodies before).
template <int LOG2L>
inline void pass_body_small(const uint32_t* __restrict x,
                            uint32_t* __restrict y, int64_t n) {
  constexpr int64_t L = int64_t{1} << LOG2L;
  for (int64_t i = 0; i < n; i++) {
    const uint32_t m = -static_cast<uint32_t>((i >> LOG2L) & 1);  // 0 / ~0
    const uint32_t t = x[i] + x[i - 2 * L];
    y[i] = 2u * x[i - L] + ((t ^ m) - m);
  }
}

inline void pass_body_generic(const uint32_t* __restrict x,
                              uint32_t* __restrict y, int64_t n, int L) {
  for (int64_t i = 0; i < n; i += 2 * L) {
    for (int j = 0; j < L; j++)
      y[i + j] = x[i + j] + x[i + j - 2 * L] + 2u * x[i + j - L];
    for (int j = 0; j < L; j++)
      y[i + L + j] = 2u * x[i + j] - x[i + L + j] - x[i + j - L];
  }
}

// Constant-L form of pass_body_generic for the mid-size passes
// (L in {32..256}): exact trip counts let the vectorizer emit full-width
// vector loops with no runtime prologue/epilogue or trip-count checks.
// Same expressions, same evaluation order as pass_body_generic —
// bit-identical by construction (uint32 wrap arithmetic).
template <int LOG2L>
inline void pass_body_big(const uint32_t* __restrict x,
                          uint32_t* __restrict y, int64_t n) {
  constexpr int64_t L = int64_t{1} << LOG2L;
  for (int64_t i = 0; i < n; i += 2 * L) {
    for (int64_t j = 0; j < L; j++)
      y[i + j] = x[i + j] + x[i + j - 2 * L] + 2u * x[i + j - L];
    for (int64_t j = 0; j < L; j++)
      y[i + L + j] = 2u * x[i + j] - x[i + L + j] - x[i + j - L];
  }
}

// x, y must each have >= cols words of writable headroom BEFORE them (the
// per-pass history is copied there so the sweep has no boundary cases).
inline uint32_t* synth_block_host(uint32_t* x, uint32_t* y, uint32_t* wrap,
                                  int level, int rows, int cols) {
  const int64_t n = static_cast<int64_t>(rows) * cols;
  for (int p = 0; p < level; p++) {
    const int L = cols >> (p + 1);
    std::memcpy(x - 2 * L, wrap, 2 * L * sizeof(uint32_t));  // history
    std::memcpy(wrap, x + n - 2 * L, 2 * L * sizeof(uint32_t));  // raw tail
    switch (L) {
      case 1: pass_body_small<0>(x, y, n); break;
      case 2: pass_body_small<1>(x, y, n); break;
      case 4: pass_body_small<2>(x, y, n); break;
      case 8: pass_body_small<3>(x, y, n); break;
      case 16: pass_body_small<4>(x, y, n); break;
      case 32: pass_body_big<5>(x, y, n); break;
      case 64: pass_body_big<6>(x, y, n); break;
      case 128: pass_body_big<7>(x, y, n); break;
      case 256: pass_body_big<8>(x, y, n); break;
      default: pass_body_generic(x, y, n, L); break;
    }
    if (p == 0)  // rounding bias: +1 at element 0 of every pass-0 row
      for (int64_t i = 0; i < n; i += L) y[i] += 1u;
    wrap += 2 * L;
    std::swap(x, y);
  }
  return x;
}

inline uint32_t dq(const int16_t* k, int64_t i, uint32_t val) {
  return static_cast<uint32_t>(static_cast<int32_t>(k[i])) * val;
}

#if defined(__AVX512F__)
// ---- AVX-512 pass bodies -------------------------------------------------
// Pass 0 keeps dedicated chunk-carried bodies (below); every later pass
// runs inside the fused tail (synth_tail_fused), which subsumed the old
// per-pass pass_avx_small/_mid/_pack bodies.

// Fused dequant pass 0 for L == 8 (level 4): the shifted vectors are
// formed in the PRODUCT domain (dq is linear), so k is loaded and
// widened once per chunk. Rounding bias (+1 at every lane = 0 mod L)
// rides as a constant vector.
inline void pass0_avx_l8(const int16_t* k, uint32_t val,
                         const uint32_t* hist, uint32_t* y, int64_t n) {
  constexpr int LOG2L = 3, L = 8;
  alignas(64) uint32_t mb[16], bb[16];
  for (int j = 0; j < 16; j++) {
    mb[j] = ((j >> LOG2L) & 1) ? ~0u : 0u;
    bb[j] = (j & (L - 1)) == 0 ? 1u : 0u;
  }
  const __m512i M = _mm512_load_si512(reinterpret_cast<const void*>(mb));
  const __m512i B = _mm512_load_si512(reinterpret_cast<const void*>(bb));
  const __m512i V = _mm512_set1_epi32(static_cast<int32_t>(val));
  auto xk = [&](int64_t i) { return dq(k, i, val); };
  auto x0 = [&](int64_t i) { return i < 0 ? hist[2 * L + i] : xk(i); };
  for (int64_t i = 0; i < 16; i++) {  // scalar prologue consumes `hist`
    const uint32_t m = -static_cast<uint32_t>((i >> LOG2L) & 1);
    const uint32_t t = x0(i) + x0(i - 2 * L);
    y[i] = 2u * x0(i - L) + ((t ^ m) - m) +
           static_cast<uint32_t>((i & (L - 1)) == 0);
  }
  __m512i prev = _mm512_mullo_epi32(
      _mm512_cvtepi16_epi32(
          _mm256_loadu_si256(reinterpret_cast<const __m256i*>(k))),
      V);
  for (int64_t i = 16; i < n; i += 16) {
    const __m512i kw = _mm512_cvtepi16_epi32(
        _mm256_loadu_si256(reinterpret_cast<const __m256i*>(k + i)));
    const __m512i cur = _mm512_mullo_epi32(kw, V);
    const __m512i xm1 = _mm512_alignr_epi32(cur, prev, 16 - L);
    const __m512i xm2 = _mm512_alignr_epi32(cur, prev, 16 - 2 * L);
    const __m512i t = _mm512_add_epi32(cur, xm2);
    const __m512i ts = _mm512_sub_epi32(_mm512_xor_si512(t, M), M);
    _mm512_store_si512(
        reinterpret_cast<void*>(y + i),
        _mm512_add_epi32(_mm512_add_epi32(_mm512_add_epi32(xm1, xm1), ts),
                         B));
    prev = cur;
  }
}

// Fused dequant pass 0 for L in {32, 64} (levels 6/7 — the corpus
// majority): chunk-carried history like pass_avx_mid, with the k widening
// + k*val multiply done once per chunk (the scalar pass0_dequant re-reads
// each k three times) and the +1 rounding bias (every lane = 0 mod L:
// lane 0 of chunks 0 and CH per 2L period) riding as a masked constant.
// `hist` is the 2L-word pass-0 wrap segment; consumed before the caller
// overwrites it.
template <int LOG2L>
inline void pass0_avx_big(const int16_t* k, uint32_t val,
                          const uint32_t* hist, uint32_t* y, int64_t n) {
  constexpr int CH = (1 << LOG2L) / 16;
  const __m512i V = _mm512_set1_epi32(static_cast<int32_t>(val));
  const __m512i B = _mm512_maskz_set1_epi32(1, 1);  // +1 at lane 0
  __m512i h[2 * CH];
  for (int t = 0; t < 2 * CH; t++)
    h[t] = _mm512_loadu_si512(
        reinterpret_cast<const void*>(hist + 16 * t));
  for (int64_t i = 0; i < n; i += 32 * CH) {
    __m512i c[2 * CH];
    for (int j = 0; j < 2 * CH; j++)
      c[j] = _mm512_mullo_epi32(
          _mm512_cvtepi16_epi32(_mm256_loadu_si256(
              reinterpret_cast<const __m256i*>(k + i + 16 * j))),
          V);
    for (int j = 0; j < CH; j++) {
      __m512i r =
          _mm512_add_epi32(_mm512_add_epi32(c[j], h[j]),
                           _mm512_add_epi32(h[j + CH], h[j + CH]));
      if (j == 0) r = _mm512_add_epi32(r, B);
      _mm512_store_si512(reinterpret_cast<void*>(y + i + 16 * j), r);
    }
    for (int j = CH; j < 2 * CH; j++) {
      __m512i r = _mm512_sub_epi32(
          _mm512_sub_epi32(_mm512_add_epi32(c[j - CH], c[j - CH]), c[j]),
          h[j]);
      if (j == CH) r = _mm512_add_epi32(r, B);
      _mm512_store_si512(reinterpret_cast<void*>(y + i + 16 * j), r);
    }
    for (int t = 0; t < 2 * CH; t++) h[t] = c[t];
  }
}
// ---- Fused pass tail -----------------------------------------------------
// All passes with L <= 32 plus the final >>level+pack pass in ONE sweep:
// each 16-lane chunk of the first fused pass's input is pushed through
// every remaining pass in registers and lands as PCM — one aligned load
// and one 32-byte store per 16 samples instead of a full x/y round trip
// per pass (the pass-at-a-time structure's L1 data-movement floor, see
// BASELINE.md round-5 analysis). Per-pass history lives in register
// rings initialized from the pass's wrap segment and saved back after
// the sweep; the arithmetic per element is the exact uniform-sign
// expression of pass_body_small / pass_body_big / the scalar pack, in the
// same order, on wrapping uint32 — bit-identical by construction,
// enforced by the AVX-vs-scalar pin, the oracle suites and the fuzzer.
//
// Stage state per fused pass: the last 2L INPUT elements (= what the
// unfused code memcpy'd from x+n-2L into wrap). For L <= 8 the history
// fits the top 2L lanes of one register (alignr selects them exactly as
// the unfused small body's x-16 prologue load did); for L = 16/32 it is
// a 2L/16-chunk rolling ring with the sign flipping every L/16 chunks.

// L in {1, 2, 4, 8}: both x[i-L] and x[i-2L] fall inside prev|cur.
template <int LOG2L>
struct FusedStageS {
  __m512i prev, M;
  void init(const uint32_t* hist) {
    constexpr int L = 1 << LOG2L;
    alignas(64) uint32_t tmp[16] = {0};
    std::memcpy(tmp + 16 - 2 * L, hist, 2 * L * sizeof(uint32_t));
    prev = _mm512_load_si512(reinterpret_cast<const void*>(tmp));
    alignas(64) uint32_t mb[16];
    for (int j = 0; j < 16; j++) mb[j] = ((j >> LOG2L) & 1) ? ~0u : 0u;
    M = _mm512_load_si512(reinterpret_cast<const void*>(mb));
  }
  inline __m512i step(__m512i cur) {
    constexpr int L = 1 << LOG2L;
    const __m512i xm1 = _mm512_alignr_epi32(cur, prev, 16 - L);
    const __m512i xm2 = _mm512_alignr_epi32(cur, prev, 16 - 2 * L);
    const __m512i t = _mm512_add_epi32(cur, xm2);
    const __m512i ts = _mm512_sub_epi32(_mm512_xor_si512(t, M), M);
    prev = cur;
    return _mm512_add_epi32(_mm512_add_epi32(xm1, xm1), ts);
  }
  void save(uint32_t* w) const {
    constexpr int L = 1 << LOG2L;
    alignas(64) uint32_t tmp[16];
    _mm512_store_si512(reinterpret_cast<void*>(tmp), prev);
    std::memcpy(w, tmp + 16 - 2 * L, 2 * L * sizeof(uint32_t));
  }
};

// L = 16: one-chunk history pair, sign alternating per chunk.
struct FusedStage16 {
  __m512i h0, h1;  // x two chunks back, one chunk back (input domain)
  uint32_t odd = 0;
  void init(const uint32_t* hist) {
    h0 = _mm512_loadu_si512(reinterpret_cast<const void*>(hist));
    h1 = _mm512_loadu_si512(reinterpret_cast<const void*>(hist + 16));
  }
  inline __m512i step(__m512i cur) {
    const __m512i t = _mm512_add_epi32(cur, h0);
    const __m512i d = _mm512_add_epi32(h1, h1);
    const __m512i y = odd ? _mm512_sub_epi32(d, t) : _mm512_add_epi32(d, t);
    h0 = h1;
    h1 = cur;
    odd ^= 1;
    return y;
  }
  void save(uint32_t* w) const {
    _mm512_storeu_si512(reinterpret_cast<void*>(w), h0);
    _mm512_storeu_si512(reinterpret_cast<void*>(w + 16), h1);
  }
};

// L = 32: four-chunk rolling ring, sign alternating every two chunks.
struct FusedStage32 {
  __m512i r0, r1, r2, r3;  // oldest .. newest input chunk
  uint32_t phase = 0;      // chunk index mod 4; phases 0,1 add, 2,3 sub
  void init(const uint32_t* hist) {
    r0 = _mm512_loadu_si512(reinterpret_cast<const void*>(hist));
    r1 = _mm512_loadu_si512(reinterpret_cast<const void*>(hist + 16));
    r2 = _mm512_loadu_si512(reinterpret_cast<const void*>(hist + 32));
    r3 = _mm512_loadu_si512(reinterpret_cast<const void*>(hist + 48));
  }
  inline __m512i step(__m512i cur) {
    const __m512i t = _mm512_add_epi32(cur, r0);
    const __m512i d = _mm512_add_epi32(r2, r2);
    const __m512i y =
        phase & 2 ? _mm512_sub_epi32(d, t) : _mm512_add_epi32(d, t);
    r0 = r1;
    r1 = r2;
    r2 = r3;
    r3 = cur;
    phase = (phase + 1) & 3;
    return y;
  }
  void save(uint32_t* w) const {
    _mm512_storeu_si512(reinterpret_cast<void*>(w), r0);
    _mm512_storeu_si512(reinterpret_cast<void*>(w + 16), r1);
    _mm512_storeu_si512(reinterpret_cast<void*>(w + 32), r2);
    _mm512_storeu_si512(reinterpret_cast<void*>(w + 48), r3);
  }
};

// The fused tail driver: x is the output of the last unfused pass (the
// first fused pass's input), w the wrap chain positioned at that pass's
// segment, dst the PCM destination. START = log2 L of the first fused
// pass (2..5; callers guarantee n is a multiple of 2*L_START and >= 16).
// The final pack stage is the L == 1 recurrence (its dst[0]/dst[1]
// special cases ARE the generic history form — h0/h1 ride in the top
// lanes of a FusedStageS<0> like any other pass's history).
template <int START, bool NT>
inline void synth_tail_fused_t(const uint32_t* x, uint32_t* w, int16_t* dst,
                               int64_t n, int level) {
  FusedStage32 s32;
  FusedStage16 s16;
  FusedStageS<3> s8;
  FusedStageS<2> s4;
  FusedStageS<1> s2;
  FusedStageS<0> sp;
  uint32_t* wp = w;
  if constexpr (START >= 5) { s32.init(wp); wp += 64; }
  if constexpr (START >= 4) { s16.init(wp); wp += 32; }
  if constexpr (START >= 3) { s8.init(wp); wp += 16; }
  s4.init(wp);  // START >= 2 always
  wp += 8;
  s2.init(wp);
  wp += 4;
  sp.init(wp);
  const __m128i SH = _mm_cvtsi32_si128(level);
  for (int64_t i = 0; i < n; i += 16) {
    __m512i c =
        _mm512_load_si512(reinterpret_cast<const void*>(x + i));
    if constexpr (START >= 5) c = s32.step(c);
    if constexpr (START >= 4) c = s16.step(c);
    if constexpr (START >= 3) c = s8.step(c);
    c = s4.step(c);
    c = s2.step(c);
    c = sp.step(c);
    const __m256i pcm =
        _mm512_cvtepi32_epi16(_mm512_sra_epi32(c, SH));
    if constexpr (NT)
      _mm256_stream_si256(reinterpret_cast<__m256i*>(dst + i), pcm);
    else
      _mm256_storeu_si256(reinterpret_cast<__m256i*>(dst + i), pcm);
  }
  wp = w;
  if constexpr (START >= 5) { s32.save(wp); wp += 64; }
  if constexpr (START >= 4) { s16.save(wp); wp += 32; }
  if constexpr (START >= 3) { s8.save(wp); wp += 16; }
  s4.save(wp);
  wp += 8;
  s2.save(wp);
  wp += 4;
  sp.save(wp);
}

template <int START>
inline void synth_tail_fused(const uint32_t* x, uint32_t* w, int16_t* dst,
                             int64_t n, int level, bool nt) {
  if (nt && (reinterpret_cast<uintptr_t>(dst) & 31) == 0)
    synth_tail_fused_t<START, true>(x, w, dst, n, level);
  else
    synth_tail_fused_t<START, false>(x, w, dst, n, level);
}
#endif  // __AVX512F__

// Pass 0 with dequantization fused in: reads k (int16) directly, so the
// k*val staging sweep never materializes (each k is read three times —
// three cheap SIMD multiplies trade for a full write+read of the block).
// `hist` is the pass-0 wrap segment (2L raw == dequantized-k words),
// consumed only by the first period, so the caller may overwrite it after.
inline void pass0_dequant(const int16_t* __restrict k, uint32_t val,
                          const uint32_t* __restrict hist,
                          uint32_t* __restrict y, int64_t n, int L) {
  auto xk = [&](int64_t i) { return dq(k, i, val); };
  auto x0 = [&](int64_t i) { return i < 0 ? hist[2 * L + i] : xk(i); };
  for (int j = 0; j < L; j++)
    y[j] = x0(j) + x0(j - 2 * L) + 2u * x0(j - L);
  for (int j = 0; j < L; j++)
    y[L + j] = 2u * x0(j) - x0(L + j) - x0(j - L);
  for (int64_t i = 2 * L; i < n; i += 2 * L) {
    for (int j = 0; j < L; j++)
      y[i + j] = xk(i + j) + xk(i + j - 2 * L) + 2u * xk(i + j - L);
    for (int j = 0; j < L; j++)
      y[i + L + j] = 2u * xk(i + j) - xk(i + L + j) - xk(i + j - L);
  }
}

// pass0_dequant in the uniform sign formulation for small L (see
// pass_body_small), with the +1 pass-0 rounding bias fused in (one
// lane-periodic add instead of a separate strided sweep): the small-cols
// geometries (levels 2-5) run pass 0 as one flat vector loop.
template <int LOG2L>
inline void pass0_dequant_small(const int16_t* __restrict k, uint32_t val,
                                const uint32_t* __restrict hist,
                                uint32_t* __restrict y, int64_t n) {
  constexpr int64_t L = int64_t{1} << LOG2L;
  auto xk = [&](int64_t i) { return dq(k, i, val); };
  auto x0 = [&](int64_t i) { return i < 0 ? hist[2 * L + i] : xk(i); };
  for (int64_t i = 0; i < 2 * L; i++) {  // history-consuming prologue
    const uint32_t m = -static_cast<uint32_t>((i >> LOG2L) & 1);
    const uint32_t t = x0(i) + x0(i - 2 * L);
    y[i] = 2u * x0(i - L) + ((t ^ m) - m) +
           static_cast<uint32_t>((i & (L - 1)) == 0);
  }
  for (int64_t i = 2 * L; i < n; i++) {
    const uint32_t m = -static_cast<uint32_t>((i >> LOG2L) & 1);
    const uint32_t t = xk(i) + xk(i - 2 * L);
    y[i] = 2u * xk(i - L) + ((t ^ m) - m) +
           static_cast<uint32_t>((i & (L - 1)) == 0);
  }
}

// Dequantize + synthesize + shift + pack one dense block to int16 PCM.
// xbuf/ybuf point at the data area of buffers with >= cols words headroom.
// For level >= 2 the dequant is fused into pass 0 and the >>level + int16
// pack into the final (sub_len==1) pass — the block makes two fewer trips
// through memory than the staged pipeline.
inline void synth_pcm_block(const int16_t* k, uint32_t val, int level,
                            int rows, int cols, uint32_t* wrap,
                            uint32_t* xbuf, uint32_t* ybuf, int16_t* dst,
                            bool nt = false) {
  const int64_t n = static_cast<int64_t>(rows) * cols;
  if (level == 0) {  // no passes, no bias; >>0 keeps the low 16 bits
    for (int64_t i = 0; i < n; i++)
      dst[i] = static_cast<int16_t>(static_cast<int32_t>(dq(k, i, val)));
    return;
  }
  if (level == 1) {  // single pass: staged path (bias hits every element)
    for (int64_t i = 0; i < n; i++) xbuf[i] = dq(k, i, val);
    const uint32_t* res =
        synth_block_host(xbuf, ybuf, wrap, level, rows, cols);
    for (int64_t i = 0; i < n; i++)
      dst[i] = static_cast<int16_t>(static_cast<int32_t>(res[i]) >> level);
    return;
  }
  int L = cols >> 1;
  uint32_t* x = xbuf;
  uint32_t* y = ybuf;
#if defined(__AVX512F__)
  // in-register shifted windows need 64-byte-aligned scratch and 16 | n
  // (guaranteed by cols >= 16); misaligned callers take the scalar path
  const bool avx_ok =
      level >= 4 && ((reinterpret_cast<uintptr_t>(xbuf) |
                      reinterpret_cast<uintptr_t>(ybuf)) & 63) == 0;
#else
  constexpr bool avx_ok = false;
#endif
  switch (L) {
    case 2: pass0_dequant_small<1>(k, val, wrap, y, n); break;
    case 4: pass0_dequant_small<2>(k, val, wrap, y, n); break;
    case 8:
#if defined(__AVX512F__)
      if (avx_ok) {
        pass0_avx_l8(k, val, wrap, y, n);
        break;
      }
#endif
      pass0_dequant_small<3>(k, val, wrap, y, n);
      break;
    case 16: pass0_dequant_small<4>(k, val, wrap, y, n); break;
#if defined(__AVX512F__)
    case 32:
      if (avx_ok) { pass0_avx_big<5>(k, val, wrap, y, n); break; }
      goto pass0_scalar;
    case 64:
      if (avx_ok) { pass0_avx_big<6>(k, val, wrap, y, n); break; }
      goto pass0_scalar;
    pass0_scalar:
#endif
    default:
      pass0_dequant(k, val, wrap, y, n, L);
      for (int64_t i = 0; i < n; i += L) y[i] += 1u;  // pass-0 bias
  }
  for (int j = 0; j < 2 * L; j++) wrap[j] = dq(k, n - 2 * L + j, val);
  uint32_t* w = wrap + 2 * L;
  std::swap(x, y);
  for (int p = 1; p < level - 1; p++) {
    L = cols >> (p + 1);
#if defined(__AVX512F__)
    if (avx_ok && L <= 32) {
      // every remaining pass (L, L/2, .., 2) plus the final shift+pack
      // runs register-resident in one sweep — including all wrap
      // segment reads/writes the unfused loop would have done
      switch (L) {
        case 32: synth_tail_fused<5>(x, w, dst, n, level, nt); return;
        case 16: synth_tail_fused<4>(x, w, dst, n, level, nt); return;
        case 8: synth_tail_fused<3>(x, w, dst, n, level, nt); return;
        default: synth_tail_fused<2>(x, w, dst, n, level, nt); return;
      }
    }
#endif
    std::memcpy(x - 2 * L, w, 2 * L * sizeof(uint32_t));  // history
    std::memcpy(w, x + n - 2 * L, 2 * L * sizeof(uint32_t));  // raw tail
    switch (L) {
      case 1: pass_body_small<0>(x, y, n); break;
      case 2: pass_body_small<1>(x, y, n); break;
      case 4: pass_body_small<2>(x, y, n); break;
      case 8: pass_body_small<3>(x, y, n); break;
      case 16: pass_body_small<4>(x, y, n); break;
      case 32: pass_body_big<5>(x, y, n); break;
      case 64: pass_body_big<6>(x, y, n); break;
      case 128: pass_body_big<7>(x, y, n); break;
      case 256: pass_body_big<8>(x, y, n); break;
      default: pass_body_generic(x, y, n, L); break;
    }
    w += 2 * L;
    std::swap(x, y);
  }
  // final pass (sub_len == 1) with >>level + int16 pack fused in; its
  // inputs are RAW x values, so there is no serial dependency to break.
  // (Under avx_ok the loop above always entered the fused tail, which
  // covers the final pass too — this is the scalar/misaligned path.)
  const uint32_t h0 = w[0], h1 = w[1];
  w[0] = x[n - 2];
  w[1] = x[n - 1];
  dst[0] = static_cast<int16_t>(
      static_cast<int32_t>(x[0] + h0 + 2u * h1) >> level);
  dst[1] = static_cast<int16_t>(
      static_cast<int32_t>(2u * x[0] - x[1] - h1) >> level);
  for (int64_t i = 2; i < n; i++) {  // uniform sign form (L == 1)
    const uint32_t m = -static_cast<uint32_t>(i & 1);
    const uint32_t t = x[i] + x[i - 2];
    dst[i] = static_cast<int16_t>(
        static_cast<int32_t>(2u * x[i - 1] + ((t ^ m) - m)) >> level);
  }
}

// Fused scan+synth emitter: the host-output fast path. Collects each
// block's coefficients (row-major, like the reference's block buffer),
// then on commit dequantizes, runs the filterbank, and writes int16 PCM —
// one cache-resident pass per block, no dense-tensor materialization.
// Failed decode attempts never touch `wrap` (the reference's juggle only
// runs on successfully filled blocks, decode.c:600-607).
//
// Stale-amp-table semantics (hostile/corrupt streams only) are exact: the
// reference's persistent 64 Ki-entry table holds, for entry k, k * (the
// val of the most recent attempt whose table covered k) — so a virtual
// table of one val per exponent suffices (same trick as the oracle,
// oracle.py scan_blocks). Entries never covered read the calloc-zeroed
// table => 0. Updated on EVERY successful pwr/val read (even attempts
// that later fail), like the reference's table regeneration.
struct SynthEmitter {
  int16_t* pcm_out;  // [max_blocks * rows * cols]
  uint32_t* wrap;    // [2*cols-2] in/out carry
  int16_t* kbuf;     // scratch [rows*cols]
  uint32_t* xbuf;    // scratch [rows*cols]
  uint32_t* ybuf;    // scratch [rows*cols]
  int level, rows, cols;
  int64_t block_elems;
  int64_t nb = 0;
  uint32_t last_val[17] = {0};  // virtual amp table: val per exponent
  bool covered[17] = {false};
  bool nt = false;  // non-temporal PCM stores (batch arena path only)

  void begin_block() {
    std::memset(kbuf, 0, block_elems * sizeof(int16_t));
  }
  void table_update(uint32_t pwr, uint32_t val) {
    for (uint32_t e = 0; e <= pwr && e < 17; e++) {
      last_val[e] = val;
      covered[e] = true;
    }
  }
  void emit_column(int c, int /*ind*/, const int16_t* col) {
    int16_t* base = kbuf + c;
    for (int i = 0; i < rows; i++)
      base[static_cast<int64_t>(i) * cols] = col[i];
  }
  // Fast path: decode straight into the (pre-zeroed) row-major block
  // buffer. Columns that could hold out-of-range indexes take the staged
  // path so the driver's range scan sees the values.
  bool emit_direct(BitReader& b, int c, int ind, uint32_t pwr, int* out) {
    if (possible_oor(ind, pwr)) return false;
    *out = decode_col_sink(b, ind, rows, StridedSink{kbuf + c, cols});
    return true;
  }
  // Exponent of table entry k (k != 0): the smallest pwr whose table
  // [-2^pwr, 2^pwr-1] covers k. ceil(log2(k+1)) for k>0, ceil(log2(-k))
  // for k<0 — matches the oracle's exception formula.
  static inline int exp_of(int k) {
    uint32_t m = k > 0 ? static_cast<uint32_t>(k + 1)
                       : static_cast<uint32_t>(-k);
    if (m <= 1) return 0;
    return 32 - __builtin_clz(m - 1);
  }
  void commit_block(uint32_t pwr, uint32_t val, bool oor) {
    if (!oor) {
      synth_pcm_block(kbuf, val, level, rows, cols, wrap, xbuf, ybuf,
                      pcm_out + nb * block_elems, nt);
    } else {
      // dequantize with stale-table reads for out-of-range indexes
      const int count = 1 << pwr;
      for (int64_t i = 0; i < block_elems; i++) {
        int k = kbuf[i];
        uint32_t v;
        if (k >= -count && k <= count - 1) {
          v = static_cast<uint32_t>(static_cast<int32_t>(k)) * val;
        } else {
          int e = exp_of(k);
          v = covered[e]
                  ? static_cast<uint32_t>(static_cast<int32_t>(k)) *
                        last_val[e]
                  : 0;
        }
        xbuf[i] = v;
      }
      const uint32_t* res =
          synth_block_host(xbuf, ybuf, wrap, level, rows, cols);
      int16_t* dst = pcm_out + nb * block_elems;
      for (int64_t i = 0; i < block_elems; i++)
        dst[i] = static_cast<int16_t>(static_cast<int32_t>(res[i]) >> level);
    }
    nb++;
  }
  void rollback_block() {}
};

// Packed wire format (v2, exact-width): per column a 2-bit class code
// {0: zero, 1: w<=4, 2: w in 5..8, 3: w in 9..16} chosen from the filler
// code (four codes per byte, LSB pair first, (cols+3)/4 bytes per
// block). Each class has a flat LSB-first BIT stream in which a nonzero
// column occupies rows*w bits (w = wire_width_of(filler) — two's
// complement), plus a width-nibble stream storing w-1 per column (two
// columns per byte, LSB nibble first). The device unpack derives each
// column's bit offset from an exclusive cumsum of rows*w and gathers
// 16-bit windows (ops/packing.py).
struct PackedEmitter {
  uint8_t* cls_out;      // [max_blocks * ceil(cols/4)] 2-bit packed
  uint8_t* pay[3];       // bit streams per class family (4/8/16)
  uint8_t* wid[3];       // width nibbles (w-1), 2 per byte
  uint8_t* pwr_out;
  uint16_t* val_out;
  int rows, cols;
  int64_t nb = 0;
  int64_t bits[3] = {0, 0, 0};    // stream bit cursors
  int64_t ncol[3] = {0, 0, 0};    // columns per class
  int64_t sbits[3] = {0, 0, 0};   // block-start snapshots
  int64_t sncol[3] = {0, 0, 0};

  int cls_stride() const { return (cols + 3) / 4; }

  void begin_block() {
    for (int k = 0; k < 3; k++) { sbits[k] = bits[k]; sncol[k] = ncol[k]; }
    std::memset(cls_out + nb * cls_stride(), 0, cls_stride());
  }
  void table_update(uint32_t, uint32_t) {}  // ships indexes, not values
  // Class family from the FILLER CODE, not the observed range: every
  // non-linear filler fits 4 bits and linear widths map directly. The
  // wire width is likewise static per filler, so no min/max pass runs.
  static inline uint8_t class_of(int ind) {
    if (ind >= 9 && ind <= 16) return 3;
    if (ind >= 5 && ind <= 8) return 2;
    return 1;
  }

  // Reserve this column's bit region for OR-writes: clear the shared
  // frontier byte's high bits (they may hold a rolled-back attempt's
  // garbage) and zero the rest of the region. OR-writers only ever set
  // zeros beyond the region, so the next column's reserve is what clears
  // pool-stale bytes there.
  inline uint8_t* reserve(int ci, int w) {
    uint8_t* buf = pay[ci];
    int64_t base = bits[ci];
    buf[base >> 3] &= (1u << (base & 7)) - 1;
    int64_t first = (base >> 3) + 1;
    int64_t last = (base + static_cast<int64_t>(rows) * w + 7) >> 3;
    if (last > first) std::memset(buf + first, 0, last - first);
    return buf;
  }

  inline void commit_col(int c, int ci, int w, uint8_t code) {
    bits[ci] += static_cast<int64_t>(rows) * w;
    int64_t n = ncol[ci]++;
    uint8_t wn = static_cast<uint8_t>(w - 1);
    uint8_t* wp = wid[ci] + (n >> 1);
    // even index overwrites the byte (pool bytes are stale); odd index
    // replaces only the high nibble (a rolled-back write may linger)
    *wp = (n & 1) ? static_cast<uint8_t>((*wp & 0x0F) | (wn << 4)) : wn;
    cls_out[nb * cls_stride() + (c >> 2)] |= code << ((c & 3) * 2);
  }

  // Bulk linear column: copy whole field groups reservoir -> wire with
  // the per-field top-bit flip (see TopMask) — the grammar's values are
  // never materialized. Consumed bits and failure sites match the
  // strict per-value path exactly (whole fields only).
  static int linear_bulk(BitReader& b, int w, int rows, BitStreamSink& s) {
    const uint64_t M = TOPMASK.m[w];
    int i = 0;
    while (i < rows) {
      if (b.ensure(32)) {
        if (s.nacc >= 8) {  // make room for up to 56 fresh bits: ONE
          // 8-byte store instead of a byte-at-a-time drain; the tail
          // scribble beyond the whole bytes is overwritten by the
          // stream's next store, a later column's reserve(), or lands
          // in the buffer's PAY_SLACK tail
          std::memcpy(s.ptr, &s.acc, 8);
          const int nb = s.nacc >> 3;
          s.ptr += nb;
          s.acc >>= 8 * nb;
          s.nacc &= 7;
        }
        int nf = b.avail / w;
        const int maxf = (56 - s.nacc) / w;
        if (nf > maxf) nf = maxf;
        if (nf > rows - i) nf = rows - i;
        const int n = nf * w;  // >= w: avail >= 32, nacc <= 7
        const uint64_t fields = b.res & ((1ull << n) - 1);
        b.res >>= n;
        b.avail -= n;
        s.acc |= (fields ^ (M & ((1ull << n) - 1))) << s.nacc;
        s.nacc += n;
        i += nf;
      } else {
        uint32_t v = b.get(w);
        if (b.fail) return ERR_UNEXPECTED_EOF;
        s.put(i, static_cast<int>(v) - (1 << (w - 1)));
        i++;
      }
    }
    return 0;
  }

  // Fast path: decode straight into the exact-width wire bit streams (no
  // col_tmp staging, no repack pass). Counters advance and class bits
  // are set only on success, so a failed column needs no extra rollback.
  bool emit_direct(BitReader& b, int c, int ind, uint32_t pwr, int* out) {
    if (possible_oor(ind, pwr)) return false;
    const uint8_t code = class_of(ind);
    const int ci = code - 1;
    const int w = wire_width_of(ind);
    int rc;
    if (ind >= 3 && ind <= 16) {
      // linear: every row written in order — bulk field copy
      auto s = BitStreamSink::at(pay[ci], bits[ci], w);
      rc = linear_bulk(b, w, rows, s);
      if (rc == 0) s.flush();
    } else {
      reserve(ci, w);
      BitPackSink s{pay[ci], bits[ci], w};
      int slot = MAP_LUT.slot[ind & 31];
      rc = slot >= 0 ? decode_map_col(b, slot, ind, rows, s)
                     : ERR_CORRUPT;  // inds 25/28/30/31: no grammar
    }
    if (rc == 0) commit_col(c, ci, w, code);
    *out = rc;
    return true;
  }

  // Staged path (possible out-of-range indexes: the driver range-checks
  // col values first). The wire width is a property of the filler, so
  // even out-of-range table indexes fit their column's width.
  void emit_column(int c, int ind, const int16_t* col) {
    const uint8_t code = class_of(ind);
    const int ci = code - 1;
    const int w = wire_width_of(ind);
    uint8_t* buf = reserve(ci, w);
    BitPackSink s{buf, bits[ci], w};
    for (int i = 0; i < rows; i++)
      if (col[i]) s.put(i, col[i]);
    commit_col(c, ci, w, code);
  }

  void commit_block(uint32_t pwr, uint32_t val, bool /*oor*/) {
    pwr_out[nb] = static_cast<uint8_t>(pwr);
    val_out[nb] = static_cast<uint16_t>(val);
    nb++;
  }
  void rollback_block() {
    for (int k = 0; k < 3; k++) { bits[k] = sbits[k]; ncol[k] = sncol[k]; }
    // the failed attempt may have written class codes for its early
    // columns; zero them so downstream cumsum positions stay aligned
    // with the rolled-back payload streams
    std::memset(cls_out + nb * cls_stride(), 0, cls_stride());
  }
};

}  // namespace

extern "C" {

// Dense scan (streaming path). Outputs sized by the caller:
// k [max_blocks*rows*cols] (zeroed here), pwr/val [max_blocks],
// events/tell [max_events]. col_tmp: caller scratch [rows].
// meta out: [0]=n_blocks, [1]=n_events, [2]=status (0 or -99),
//           [3]=raw_tell_end, [4]=raw_tell0 (loaded bytes after header).
// Returns 0, or -1 if max_events was hit (cannot happen with the
// documented bound of one event per 20 payload bits).
int64_t acm_scan_blocks(const uint8_t* data, int64_t nbytes,
                        int64_t skip_bits, int32_t level, int32_t rows,
                        int64_t max_blocks, int64_t max_events,
                        int16_t* k_out, uint8_t* pwr_out, uint16_t* val_out,
                        int16_t* events_out, int64_t* tell_out,
                        int16_t* col_tmp, int64_t* meta) {
  const int cols = 1 << level;
  DenseEmitter em{k_out, pwr_out, val_out, rows, cols,
                  static_cast<int64_t>(rows) * cols};
  return scan_driver(data, nbytes, skip_bits, level, rows, cols, max_blocks,
                     max_events, events_out, tell_out, meta, col_tmp, em);
}

// Packed scan (corpus wire path, v2 exact-width). cls [max_blocks*cols]
// is NOT pre-zeroed for uncommitted blocks — callers use meta[0] blocks
// only. Payload BIT-stream capacities (bytes, +16 slack each): pay4 >=
// max_blocks*cols*rows*4/8, pay8 >= *8/8, pay16 >= *16/8; width-nibble
// streams wid* >= ceil(max_blocks*cols/2).
// meta: [0..4] as dense, [5..7] = columns per class, [12..14] = stream
// bit cursors.
int64_t acm_scan_blocks_packed(const uint8_t* data, int64_t nbytes,
                               int64_t skip_bits, int32_t level, int32_t rows,
                               int64_t max_blocks, int64_t max_events,
                               uint8_t* cls_out, uint8_t* pay4, uint8_t* pay8,
                               uint8_t* pay16, uint8_t* wid4, uint8_t* wid8,
                               uint8_t* wid16, uint8_t* pwr_out,
                               uint16_t* val_out, int16_t* events_out,
                               int64_t* tell_out, int16_t* col_tmp,
                               int64_t* meta) {
  const int cols = 1 << level;
  PackedEmitter em{cls_out, {pay4, pay8, pay16}, {wid4, wid8, wid16},
                   pwr_out, val_out, rows, cols};
  // FAST: same direct wire emission + multi-symbol LUT as the corpus
  // entry (values/consumed bits/failure sites fuzz-pinned equal to the
  // strict driver); this one-shot API serves index building and the
  // standalone scan benchmark, which deserve the real scanner.
  int64_t rc = scan_driver<PackedEmitter, /*FAST=*/true>(
      data, nbytes, skip_bits, level, rows, cols, max_blocks, max_events,
      events_out, tell_out, meta, col_tmp, em);
  for (int k = 0; k < 3; k++) {
    meta[5 + k] = em.ncol[k];
    meta[12 + k] = em.bits[k];
  }
  return rc;
}

// Zero-copy corpus scan: writes straight into caller-owned wire buffers
// (v2 exact-width streams; always starts at stream offset 0 of each
// buffer — multi-file continuity lives in acm_scan_corpus_chunk).
// Scanning continues past failed decode attempts (the reference's
// acm_read does too, decode.c:840-846; the CLI's stop position is
// derived from the event list by the corpus layer). The first error code
// lands in meta[8] (0 = clean).
// `skip_bits` is the absolute consumed-bit offset to start at (the header
// length for a whole-file scan, or a BlockIndex entry for random access).
// bitpos_out (nullable, [max_blocks]) receives each committed block's
// absolute starting bit offset — the random-access index.
// final_data=0: `data` is a partial window of the stream (no phantom EOF
// byte); running dry mid-attempt rolls the attempt back and returns
// status NEED_MORE_DATA with meta[10] = the retry bit — the windowed
// wire producer for device-streaming one huge file in O(window) memory.
int64_t acm_scan_corpus_into(const uint8_t* data, int64_t nbytes,
                             int64_t skip_bits, int32_t level, int32_t rows,
                             int64_t max_blocks, uint8_t* cls_out,
                             uint8_t* pay4, uint8_t* pay8, uint8_t* pay16,
                             uint8_t* wid4, uint8_t* wid8, uint8_t* wid16,
                             uint8_t* pwr_out, uint16_t* val_out,
                             int16_t* events_scratch, int64_t* tell_scratch,
                             int64_t max_events, int16_t* col_tmp,
                             int64_t* meta, int64_t* bitpos_out,
                             int32_t final_data) {
  const int cols = 1 << level;
  PackedEmitter em{cls_out, {pay4, pay8, pay16}, {wid4, wid8, wid16},
                   pwr_out, val_out, rows, cols};
  int64_t rc = scan_driver<PackedEmitter, /*FAST=*/true>(
      data, nbytes, skip_bits, level, rows, cols, max_blocks, max_events,
      events_scratch, tell_scratch, meta, col_tmp, em,
      /*stop_on_error=*/false, bitpos_out, /*final_data=*/final_data != 0);
  for (int k = 0; k < 3; k++) {
    meta[5 + k] = em.ncol[k];
    meta[12 + k] = em.bits[k];
  }
  meta[8] = 0;
  for (int64_t i = 0; i < meta[1]; i++) {
    if (events_scratch[i] != 0) {
      meta[8] = events_scratch[i];  // first error in the stream
      break;
    }
  }
  return rc;
}

// Batched corpus scan: every file of one bucket chunk in a single call
// (same level/rows/nb — the bucket key guarantees it). Eliminates the
// per-file Python/ctypes round trip of the corpus scan loop; payload
// streams are shared append-only across the whole chunk, exactly as the
// per-file acm_scan_corpus_into sequence would produce.
//   blob: all files back to back; off/len/skip_bits/max_blocks per file.
//   cls/pwr/val: per-file slots at uniform strides (cls_stride bytes,
//   nb entries).
//   events_out [n_files * ev_cap]: per-file event lists (attempt
//   outcomes, the CLI stop-semantics input). A file whose event count
//   exceeds ev_cap gets out[j*5+4] = 1 (caller rescans it solo — only
//   heavily corrupt streams).
//   out [n_files * 5]: n_good, first_err, oor, n_events, overflow.
//   meta[5..7]: final pay4/pay8/pay16 column counters.
int64_t acm_scan_corpus_chunk(
    const uint8_t* blob, const int64_t* off, const int64_t* lens,
    const int64_t* skip_bits, const int64_t* max_blocks, int64_t n_files,
    int32_t level, int32_t rows, int64_t nb_stride, int64_t cls_stride,
    uint8_t* cls_out, uint8_t* pay4, uint8_t* pay8, uint8_t* pay16,
    uint8_t* wid4, uint8_t* wid8, uint8_t* wid16,
    uint8_t* pwr_out, uint16_t* val_out, int16_t* events_scratch,
    int64_t* tell_scratch, int64_t max_events, int64_t ev_cap,
    int16_t* events_out, int16_t* col_tmp, int64_t* meta, int64_t* out) {
  const int cols = 1 << level;
  int64_t obits[3] = {0, 0, 0};
  int64_t ocol[3] = {0, 0, 0};
  for (int64_t j = 0; j < n_files; j++) {
    if (lens[j] <= 0) {  // vanished/empty file: slot stays zeroed
      for (int k = 0; k < 5; k++) out[j * 5 + k] = 0;
      continue;
    }
    PackedEmitter em{cls_out + j * cls_stride, {pay4, pay8, pay16},
                     {wid4, wid8, wid16},
                     pwr_out + j * nb_stride, val_out + j * nb_stride,
                     rows, cols};
    for (int k = 0; k < 3; k++) {
      em.bits[k] = obits[k];
      em.ncol[k] = ocol[k];
      em.sbits[k] = obits[k];
      em.sncol[k] = ocol[k];
    }
    int64_t fmeta[16] = {0};
    int64_t rc = scan_driver<PackedEmitter, /*FAST=*/true>(
        blob + off[j], lens[j], skip_bits[j], level, rows, cols,
        max_blocks[j], max_events, events_scratch, tell_scratch, fmeta,
        col_tmp, em, /*stop_on_error=*/false);
    if (rc != 0) return -(j + 1);  // event capacity exceeded (can't happen
                                   // with the documented bound)
    for (int k = 0; k < 3; k++) {
      obits[k] = em.bits[k];
      ocol[k] = em.ncol[k];
    }
    int64_t n_events = fmeta[1];
    int64_t first_err = 0;
    for (int64_t i = 0; i < n_events; i++) {
      if (events_scratch[i] != 0) {
        first_err = events_scratch[i];
        break;
      }
    }
    out[j * 5 + 0] = fmeta[0];
    out[j * 5 + 1] = first_err;
    out[j * 5 + 2] = fmeta[9];
    out[j * 5 + 3] = n_events;
    out[j * 5 + 4] = n_events > ev_cap ? 1 : 0;
    if (n_events <= ev_cap)
      std::memcpy(events_out + j * ev_cap, events_scratch,
                  n_events * sizeof(int16_t));
  }
  for (int k = 0; k < 3; k++) {
    meta[5 + k] = ocol[k];
    meta[12 + k] = obits[k];
  }
  return 0;
}

// Fused host decode: scan + dequantize + filterbank + >>level + int16
// pack per committed block, threading the inter-block wrap carry — the
// single-pass host-output path (the reference's whole pipeline in one
// sweep, decode.c:580-611 + 617-625, but emitter-structured). `wrap`
// ([2*cols-2] uint32) is in/out and `skip_bits` is the absolute start, so
// bounded-memory windowed decode falls out: scan N blocks, resume the next
// window at meta[10] (final consumed-bit position) with the same wrap.
// Scanning continues past failed attempts (events record them; meta[8] =
// first error). pcm_out: [max_blocks*rows*cols]; kbuf int16 / xbuf / ybuf
// uint32 scratch, each [rows*cols].
//
// final=0: `data` is a partial window, not the whole stream — no phantom
// EOF byte; running dry rolls the attempt back and returns status
// NEED_MORE_DATA with meta[10] = the retry bit. Stale-amp-table state
// (tbl_val/tbl_cov, 17 x uint32/int64 caller-owned, zero-initialized at
// stream start) threads across windows like `wrap`; PCM is exact even on
// hostile streams (no oracle fallback needed). tell_out records per-event
// consumed-bit positions (windowed raw_tell is reconstructed from them).
int64_t acm_decode_host(const uint8_t* data, int64_t nbytes,
                        int64_t skip_bits, int32_t level, int32_t rows,
                        int64_t max_blocks, int64_t max_events,
                        int16_t* pcm_out, uint32_t* wrap,
                        int16_t* events_out, int64_t* tell_out,
                        int16_t* col_tmp, int16_t* kbuf,
                        uint32_t* xbuf, uint32_t* ybuf, int64_t* meta,
                        int32_t final_data, uint32_t* tbl_val,
                        int64_t* tbl_cov, uint8_t* ev_pwr_out,
                        uint16_t* ev_val_out) {
  const int cols = 1 << level;
  // xbuf/ybuf are [rows*cols + cols]; the first cols words are the
  // history headroom synth_block_host writes before each pass sweep
  SynthEmitter em{pcm_out, wrap, kbuf, xbuf + cols, ybuf + cols, level, rows,
                  cols, static_cast<int64_t>(rows) * cols};
  if (tbl_val != nullptr) {
    for (int e = 0; e < 17; e++) {
      em.last_val[e] = tbl_val[e];
      em.covered[e] = tbl_cov[e] != 0;
    }
  }
  int64_t rc = scan_driver<SynthEmitter, /*FAST=*/true>(
      data, nbytes, skip_bits, level, rows, cols, max_blocks, max_events,
      events_out, tell_out, meta, col_tmp, em,
      /*stop_on_error=*/false, /*bitpos_out=*/nullptr,
      /*final_data=*/final_data != 0, /*tell_bits=*/true,
      ev_pwr_out, ev_val_out);
  if (tbl_val != nullptr) {
    for (int e = 0; e < 17; e++) {
      tbl_val[e] = em.last_val[e];
      tbl_cov[e] = em.covered[e] ? 1 : 0;
    }
  }
  meta[8] = 0;
  for (int64_t i = 0; i < meta[1]; i++) {
    if (events_out[i] != 0) {
      meta[8] = events_out[i];
      break;
    }
  }
  return rc;
}

// Batched fused host decode: a whole corpus (mixed geometries) in ONE
// call — the per-file Python/ctypes round trip of the corpus host loop
// (~25% of end-to-end wall at 190 files) collapses into one GIL-released
// native sweep. Semantically identical to calling acm_decode_host per
// file with a fresh zero wrap carry and a fresh (stream-start) amp
// table: each file is an independent stream.
//   datas/lens/skips/maxb/levels/rowss: per-file inputs (maxb = the
//   caller's byte-capped block bound, as in the single-file entry).
//   pcm_out arena with per-file word offsets pcm_off[j] (capacity
//   maxb[j]*rows*cols each).
//   events_out arena at per-file offsets ev_off[j] with capacity
//   ev_off[j+1]-ev_off[j] (so ev_off has n_files+1 entries); a file
//   whose attempt count exceeds its slot sets out[j*4+3] = 1 and the
//   caller rescans it solo (only heavily corrupt streams).
//   events_scratch/tell_scratch: [max_events] shared scratch, sized to
//   the LARGEST per-file bound (8*(len+1))/20+4.
//   col_tmp [max rows]; kbuf [max rows*cols] int16; xbuf/ybuf
//   [max rows*cols + max cols] uint32 (64B-aligned for the AVX bodies);
//   wrap_buf [max(2*cols-2, 1)] uint32 — zeroed here per file.
//   out [n_files * 4]: n_good, first_err, n_events, events_overflowed.
int64_t acm_decode_corpus_host_batch(
    const uint8_t* const* datas, const int64_t* lens, const int64_t* skips,
    const int64_t* maxb, const int32_t* levels, const int32_t* rowss,
    int64_t n_files, int16_t* pcm_out, const int64_t* pcm_off,
    int16_t* events_out, const int64_t* ev_off, int16_t* events_scratch,
    int64_t* tell_scratch, int64_t max_events, int16_t* col_tmp,
    int16_t* kbuf, uint32_t* xbuf, uint32_t* ybuf, uint32_t* wrap_buf,
    int64_t* out) {
  for (int64_t j = 0; j < n_files; j++) {
    const int level = levels[j];
    const int rows = rowss[j];
    const int cols = 1 << level;
    const int wlen = 2 * cols - 2;
    if (wlen > 0) std::memset(wrap_buf, 0, wlen * sizeof(uint32_t));
    SynthEmitter em{pcm_out + pcm_off[j], wrap_buf, kbuf, xbuf + cols,
                    ybuf + cols, level, rows, cols,
                    static_cast<int64_t>(rows) * cols};
    em.nt = true;  // arena >> LLC, written once, never read natively
    int64_t fmeta[16] = {0};
    int64_t rc = scan_driver<SynthEmitter, /*FAST=*/true>(
        datas[j], lens[j], skips[j], level, rows, cols, maxb[j], max_events,
        events_scratch, tell_scratch, fmeta, col_tmp, em,
        /*stop_on_error=*/false);
    if (rc != 0) return -(j + 1);  // event scratch exceeded (cannot happen
                                   // with the documented per-file bound)
    const int64_t n_events = fmeta[1];
    int64_t first_err = 0;
    for (int64_t i = 0; i < n_events; i++) {
      if (events_scratch[i] != 0) {
        first_err = events_scratch[i];
        break;
      }
    }
    const int64_t ev_cap = ev_off[j + 1] - ev_off[j];
    out[j * 4 + 0] = fmeta[0];
    out[j * 4 + 1] = first_err;
    out[j * 4 + 2] = n_events;
    out[j * 4 + 3] = n_events > ev_cap ? 1 : 0;
    if (n_events <= ev_cap)
      std::memcpy(events_out + ev_off[j], events_scratch,
                  n_events * sizeof(int16_t));
  }
#if defined(__AVX512F__)
  _mm_sfence();  // order the non-temporal PCM stores before the caller
                 // (possibly another thread via workers>1) reads them
#endif
  return 0;
}

// Host synth of already-scanned dense blocks (the streaming path's
// back-end when PCM is host-bound): k [nb*rows*cols] int16, vals [nb]
// uint16, wrap [2*cols-2] uint32 in/out, pcm_out [nb*rows*cols] int16.
int64_t acm_synth_dense(const int16_t* k, const uint16_t* vals, int64_t nb,
                        int32_t level, int32_t rows, uint32_t* wrap,
                        uint32_t* xbuf, uint32_t* ybuf, int16_t* pcm_out) {
  const int cols = 1 << level;
  const int64_t n = static_cast<int64_t>(rows) * cols;
  for (int64_t b = 0; b < nb; b++)  // xbuf/ybuf: [n + cols] (headroom)
    synth_pcm_block(k + b * n, vals[b], level, rows, cols, wrap, xbuf + cols,
                    ybuf + cols, pcm_out + b * n);
  return 0;
}

}  // extern "C"

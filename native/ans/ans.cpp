// rANS entropy coder — the native entropy-coding backend of neural_imaging_tpu.
//
// Plays the role of the reference's pyfse C extension (FSE/tANS wrappers, SURVEY.md
// §2.5): lossless byte-stream compression for the learned-codec bitstream. This is
// an independent implementation of the public range-ANS algorithm (Duda 2013) with
// a 12-bit static frequency model; it is NOT derived from the FSE library.
//
// Stream layout (little endian):
//   u32  n_raw          — decompressed size
//   u8   n_symbols-1    — number of distinct symbols minus one
//   (u8 sym, u16 freq)* — normalized frequencies (freq in [1, 4096])
//   u8[] rans payload   — rANS-coded bytes, final 4 bytes hold the flushed state
//
// Error codes (negative returns):
//   ANS_ERR_REPETITION      all input bytes identical (caller should RLE)
//   ANS_ERR_NOT_COMPRESSIBLE output would be >= input size (caller stores raw)
//   ANS_ERR_BUFFER          destination buffer too small
//   ANS_ERR_CORRUPT         malformed stream on decode
//   ANS_ERR_EMPTY           empty input

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint32_t PROB_BITS = 12;
constexpr uint32_t PROB_SCALE = 1u << PROB_BITS;
constexpr uint32_t RANS_L = 1u << 23;  // lower bound of the normalization interval

struct SymbolStats {
  uint32_t freq[256] = {0};
  uint32_t cum[257] = {0};
  int n_present = 0;

  void count(const uint8_t* src, int n) {
    for (int i = 0; i < n; ++i) freq[src[i]]++;
    for (int s = 0; s < 256; ++s) n_present += freq[s] > 0;
  }

  // Normalize frequencies to sum to PROB_SCALE keeping every present symbol >= 1.
  void normalize(int n) {
    uint64_t total = static_cast<uint64_t>(n);
    uint32_t assigned = 0;
    int last = -1;
    for (int s = 0; s < 256; ++s) {
      if (!freq[s]) continue;
      uint32_t f = static_cast<uint32_t>(
          (static_cast<uint64_t>(freq[s]) * PROB_SCALE) / total);
      if (f == 0) f = 1;
      freq[s] = f;
      assigned += f;
      last = s;
    }
    // Fix rounding drift on the most frequent symbol (never push a freq to 0).
    if (assigned != PROB_SCALE) {
      int best = last;
      for (int s = 0; s < 256; ++s)
        if (freq[s] > freq[best]) best = s;
      int64_t corrected = static_cast<int64_t>(freq[best]) +
                          (static_cast<int64_t>(PROB_SCALE) - assigned);
      if (corrected < 1) return;  // pathological; caller detects via ANS_ERR_CORRUPT
      freq[best] = static_cast<uint32_t>(corrected);
    }
    cum[0] = 0;
    for (int s = 0; s < 256; ++s) cum[s + 1] = cum[s] + freq[s];
  }
};

}  // namespace

extern "C" {

const int ANS_ERR_REPETITION = -2;
const int ANS_ERR_NOT_COMPRESSIBLE = -1;
const int ANS_ERR_BUFFER = -3;
const int ANS_ERR_CORRUPT = -4;
const int ANS_ERR_EMPTY = -5;

int ans_compress_bound(int n) { return n + 16 + 3 * 256 + 8; }

int ans_compress(const uint8_t* src, int n, uint8_t* dst, int dst_cap) {
  if (n <= 0) return ANS_ERR_EMPTY;

  SymbolStats st;
  st.count(src, n);
  if (st.n_present == 1) return ANS_ERR_REPETITION;
  st.normalize(n);
  if (st.cum[256] != PROB_SCALE) return ANS_ERR_CORRUPT;

  // ---- header ----
  std::vector<uint8_t> header;
  header.reserve(8 + 3 * st.n_present);
  header.push_back(static_cast<uint8_t>(n & 0xff));
  header.push_back(static_cast<uint8_t>((n >> 8) & 0xff));
  header.push_back(static_cast<uint8_t>((n >> 16) & 0xff));
  header.push_back(static_cast<uint8_t>((n >> 24) & 0xff));
  header.push_back(static_cast<uint8_t>(st.n_present - 1));
  for (int s = 0; s < 256; ++s) {
    if (!st.freq[s]) continue;
    header.push_back(static_cast<uint8_t>(s));
    header.push_back(static_cast<uint8_t>(st.freq[s] & 0xff));
    header.push_back(static_cast<uint8_t>((st.freq[s] >> 8) & 0xff));
  }

  // ---- rANS encode (reverse order, bytes emitted back-to-front) ----
  std::vector<uint8_t> payload;
  payload.reserve(n);
  uint32_t x = RANS_L;
  for (int i = n - 1; i >= 0; --i) {
    const uint32_t f = st.freq[src[i]];
    const uint32_t x_max = ((RANS_L >> PROB_BITS) << 8) * f;
    while (x >= x_max) {
      payload.push_back(static_cast<uint8_t>(x & 0xff));
      x >>= 8;
    }
    x = ((x / f) << PROB_BITS) + (x % f) + st.cum[src[i]];
  }
  // flush state (4 bytes, little endian, read first by the decoder)
  for (int b = 3; b >= 0; --b)
    payload.push_back(static_cast<uint8_t>((x >> (8 * b)) & 0xff));

  const int total = static_cast<int>(header.size() + payload.size());
  if (total >= n) return ANS_ERR_NOT_COMPRESSIBLE;
  if (total > dst_cap) return ANS_ERR_BUFFER;

  std::memcpy(dst, header.data(), header.size());
  // payload was built back-to-front; reverse so the decoder reads forward
  uint8_t* out = dst + header.size();
  for (size_t i = 0; i < payload.size(); ++i)
    out[i] = payload[payload.size() - 1 - i];
  return total;
}

int ans_decompress(const uint8_t* src, int n, uint8_t* dst, int dst_cap) {
  if (n < 10) return ANS_ERR_CORRUPT;

  const uint32_t n_raw = static_cast<uint32_t>(src[0]) |
                         (static_cast<uint32_t>(src[1]) << 8) |
                         (static_cast<uint32_t>(src[2]) << 16) |
                         (static_cast<uint32_t>(src[3]) << 24);
  const int n_present = src[4] + 1;
  int pos = 5;
  if (n < pos + 3 * n_present + 4) return ANS_ERR_CORRUPT;
  if (static_cast<int>(n_raw) > dst_cap) return ANS_ERR_BUFFER;

  uint32_t freq[256] = {0};
  uint32_t cum[257] = {0};
  for (int i = 0; i < n_present; ++i) {
    const uint8_t s = src[pos];
    freq[s] = static_cast<uint32_t>(src[pos + 1]) |
              (static_cast<uint32_t>(src[pos + 2]) << 8);
    pos += 3;
  }
  cum[0] = 0;
  for (int s = 0; s < 256; ++s) cum[s + 1] = cum[s] + freq[s];
  if (cum[256] != PROB_SCALE) return ANS_ERR_CORRUPT;

  // slot → symbol lookup
  std::vector<uint8_t> slot2sym(PROB_SCALE);
  for (int s = 0; s < 256; ++s)
    for (uint32_t k = cum[s]; k < cum[s + 1]; ++k) slot2sym[k] = static_cast<uint8_t>(s);

  // initial state: first 4 payload bytes (LSB first after the payload reversal)
  uint32_t x = static_cast<uint32_t>(src[pos]) |
               (static_cast<uint32_t>(src[pos + 1]) << 8) |
               (static_cast<uint32_t>(src[pos + 2]) << 16) |
               (static_cast<uint32_t>(src[pos + 3]) << 24);
  pos += 4;

  for (uint32_t i = 0; i < n_raw; ++i) {
    const uint32_t low = x & (PROB_SCALE - 1);
    const uint8_t s = slot2sym[low];
    dst[i] = s;
    x = freq[s] * (x >> PROB_BITS) + low - cum[s];
    while (x < RANS_L) {
      if (pos >= n) return ANS_ERR_CORRUPT;
      x = (x << 8) | src[pos++];
    }
  }
  return static_cast<int>(n_raw);
}

}  // extern "C"

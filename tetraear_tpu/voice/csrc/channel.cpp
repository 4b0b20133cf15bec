/* TETRA channel codec: class-partitioned convolutional coding with
 * soft-decision Viterbi decoding, CRC-8 bad-frame indication and a
 * coprime-stride interleaver.
 *
 * Layout per 432-bit half... full slot (2 speech frames = 274 data bits):
 *
 *   class 2 (most protected): 62 bits + CRC-8 + 4 tail -> rate-1/2 -> 148
 *   class 1:                 132 bits          + 4 tail -> rate-2/3 -> 204
 *   class 0 (unprotected):    80 bits                             ->  80
 *                                                        total      432
 *
 * Convolutional mother code: K=5, G = (23, 35) octal; rate 2/3 by
 * puncturing every 4th output of the rate-1/2 stream.  Interleaver:
 * position i -> (103 * i) mod 432 (103 coprime to 432).
 *
 * Class assignment of the 137 frame bits follows the parameter packing
 * order in acelp.cpp, which places perceptually-critical bits (LAR MSBs,
 * pitch lags, gain MSBs) first.
 */

#include "tetra_codec.h"

#include <cstring>

namespace {

constexpr int kSoftBits = TETRA_BLOCK_SOFT_BITS;   /* 432 */
constexpr int kDataBits = 2 * TETRA_FRAME_PARAM_WORDS; /* 274 */

constexpr int kC2Data = 62;
constexpr int kC1Data = 132;
constexpr int kC0Data = 80;
static_assert(kC2Data + kC1Data + kC0Data == kDataBits, "class split");

constexpr int kTail = 4;               /* K-1 zero tail bits */
constexpr int kC2Coded = 2 * (kC2Data + 8 + kTail);        /* 148 */
constexpr int kC1Coded = (kC1Data + kTail) * 3 / 2;        /* 204 */
constexpr int kC0Coded = kC0Data;                          /*  80 */
static_assert(kC2Coded + kC1Coded + kC0Coded == kSoftBits, "coded split");

constexpr int kStride = 103;           /* coprime to 432 */

/* K=5 convolutional code, G1 = 023 (0b10011), G2 = 035 (0b11101). */
constexpr unsigned kG1 = 0x13;
constexpr unsigned kG2 = 0x1D;
constexpr int kStates = 16;

inline int parity(unsigned x) { return __builtin_parity(x); }

/* soft-bit slot layout inside the 690-word block
 * (tetraear/ui/modern.py:2379-2407): four spans of payload words. */
struct Span { int lo, hi; };
constexpr Span kSpans[4] = {{1, 115}, {116, 230}, {231, 345}, {346, 436}};

void block_to_soft(const int16_t *block, int16_t *soft /*432*/) {
  int idx = 0;
  for (const auto &s : kSpans)
    for (int i = s.lo; i < s.hi && idx < kSoftBits; ++i)
      soft[idx++] = block[i];
  while (idx < kSoftBits) soft[idx++] = 0;
}

void soft_to_block(const int16_t *soft, int16_t *block) {
  std::memset(block, 0, sizeof(int16_t) * TETRA_BLOCK_WORDS);
  block[0] = (int16_t)TETRA_HEADER;
  int idx = 0;
  for (const auto &s : kSpans)
    for (int i = s.lo; i < s.hi && idx < kSoftBits; ++i)
      block[i] = soft[idx++];
}

/* CRC-8, poly 0x07, init 0xFF over a bit array. */
uint8_t crc8_bits(const uint8_t *bits, int n) {
  uint8_t crc = 0xFF;
  for (int i = 0; i < n; ++i) {
    crc ^= (uint8_t)(bits[i] << 7);
    crc = (crc & 0x80) ? (uint8_t)((crc << 1) ^ 0x07) : (uint8_t)(crc << 1);
  }
  return crc;
}

/* rate-1/2 convolutional encoder; in[n] bits -> out[2n] bits. */
void conv_encode(const uint8_t *in, int n, uint8_t *out) {
  unsigned reg = 0;
  for (int i = 0; i < n; ++i) {
    reg = ((reg << 1) | in[i]) & 0x1F;
    out[2 * i] = (uint8_t)parity(reg & kG1);
    out[2 * i + 1] = (uint8_t)parity(reg & kG2);
  }
}

/* Soft Viterbi for the rate-1/2 code with optional puncturing.
 * soft[j] > 0 means bit 1; punct[j] == 0 marks erased outputs.
 * n = number of input bits (including tail); decodes into bits[n].
 * Returns path metric of the best end state (0 terminated if tail). */
void viterbi_decode(const int16_t *soft, const uint8_t *punct, int n,
                    uint8_t *bits, bool zero_tail) {
  constexpr int INF = 1 << 28;
  int metric[kStates], next[kStates];
  /* survivors: parent bit per state per step (n <= 160) */
  static thread_local uint8_t decisions[160][kStates];

  for (int s = 0; s < kStates; ++s) metric[s] = (s == 0) ? 0 : INF;

  for (int i = 0; i < n; ++i) {
    int16_t s0 = punct[2 * i] ? soft[2 * i] : 0;
    int16_t s1 = punct[2 * i + 1] ? soft[2 * i + 1] : 0;
    for (int s = 0; s < kStates; ++s) next[s] = INF;
    for (int s = 0; s < kStates; ++s) {
      if (metric[s] >= INF) continue;
      for (int b = 0; b < 2; ++b) {
        unsigned reg = (((unsigned)s << 1) | (unsigned)b) & 0x1F;
        int ns = (int)(reg & 0xF);
        int o0 = parity(reg & kG1) ? 1 : -1;
        int o1 = parity(reg & kG2) ? 1 : -1;
        /* branch metric: negative correlation with soft values */
        int m = metric[s] - o0 * s0 - o1 * s1;
        if (m < next[ns]) {
          next[ns] = m;
          decisions[i][ns] = (uint8_t)((s << 1) | b);
        }
      }
    }
    std::memcpy(metric, next, sizeof(metric));
  }

  int best = 0;
  if (!zero_tail) {
    for (int s = 1; s < kStates; ++s)
      if (metric[s] < metric[best]) best = s;
  }
  /* traceback */
  int state = best;
  for (int i = n - 1; i >= 0; --i) {
    uint8_t d = decisions[i][state];
    bits[i] = d & 1;
    state = d >> 1;
  }
}

}  // namespace

extern "C" int tetra_channel_encode(const int16_t *params, int16_t *block) {
  if (!params || !block) return 1;
  /* collect 274 data bits: frame-major, importance-ordered by acelp.cpp */
  uint8_t data[kDataBits];
  for (int f = 0; f < 2; ++f) {
    const int16_t *p = params + f * (1 + TETRA_FRAME_PARAM_WORDS) + 1;
    for (int i = 0; i < TETRA_FRAME_PARAM_WORDS; ++i)
      /* interleave the two frames so class-2 protects both equally */
      data[2 * i + f] = (uint8_t)(p[i] & 1);
  }

  uint8_t coded[kSoftBits];
  int pos = 0;

  /* class 2: data[0..61] + crc8 + tail, rate 1/2 */
  {
    uint8_t in[kC2Data + 8 + kTail] = {0};
    std::memcpy(in, data, kC2Data);
    uint8_t crc = crc8_bits(in, kC2Data);
    for (int i = 0; i < 8; ++i) in[kC2Data + i] = (crc >> (7 - i)) & 1;
    uint8_t enc[kC2Coded];
    conv_encode(in, kC2Data + 8 + kTail, enc);
    std::memcpy(coded + pos, enc, kC2Coded);
    pos += kC2Coded;
  }
  /* class 1: data[62..193] + tail, rate 2/3 (puncture every 4th output) */
  {
    uint8_t in[kC1Data + kTail] = {0};
    std::memcpy(in, data + kC2Data, kC1Data);
    uint8_t enc[2 * (kC1Data + kTail)];
    conv_encode(in, kC1Data + kTail, enc);
    int out = 0;
    for (int j = 0; j < 2 * (kC1Data + kTail); ++j)
      if (j % 4 != 3) coded[pos + out++] = enc[j];
    pos += kC1Coded;
  }
  /* class 0: uncoded */
  std::memcpy(coded + pos, data + kC2Data + kC1Data, kC0Data);

  /* interleave + hard soft bits */
  int16_t soft[kSoftBits];
  for (int i = 0; i < kSoftBits; ++i)
    soft[(kStride * i) % kSoftBits] = coded[i] ? 127 : -127;
  soft_to_block(soft, block);
  return 0;
}

extern "C" int tetra_channel_decode(const int16_t *block, int16_t *out) {
  if (!block || !out) return 1;
  if ((uint16_t)block[0] != TETRA_HEADER) return 2;

  int16_t laid[kSoftBits];
  block_to_soft(block, laid);
  /* deinterleave */
  int16_t soft[kSoftBits];
  for (int i = 0; i < kSoftBits; ++i)
    soft[i] = laid[(kStride * i) % kSoftBits];

  uint8_t data[kDataBits];
  int bfi = 0;
  int pos = 0;

  /* class 2 */
  {
    constexpr int n = kC2Data + 8 + kTail;
    uint8_t punct[2 * n];
    std::memset(punct, 1, sizeof(punct));
    uint8_t bits[n];
    viterbi_decode(soft + pos, punct, n, bits, true);
    uint8_t crc = crc8_bits(bits, kC2Data);
    uint8_t rx = 0;
    for (int i = 0; i < 8; ++i) rx = (uint8_t)((rx << 1) | bits[kC2Data + i]);
    if (crc != rx) bfi = 1;
    std::memcpy(data, bits, kC2Data);
    pos += kC2Coded;
  }
  /* class 1 (depuncture: every 4th mother output erased) */
  {
    constexpr int n = kC1Data + kTail;
    int16_t dep[2 * n];
    uint8_t punct[2 * n];
    int in = 0;
    for (int j = 0; j < 2 * n; ++j) {
      if (j % 4 != 3) {
        dep[j] = soft[pos + in++];
        punct[j] = 1;
      } else {
        dep[j] = 0;
        punct[j] = 0;
      }
    }
    uint8_t bits[n];
    viterbi_decode(dep, punct, n, bits, true);
    std::memcpy(data + kC2Data, bits, kC1Data);
    pos += kC1Coded;
  }
  /* class 0: hard decisions */
  for (int i = 0; i < kC0Data; ++i)
    data[kC2Data + kC1Data + i] = soft[pos + i] > 0 ? 1 : 0;

  /* de-interleave frames and emit */
  for (int f = 0; f < 2; ++f) {
    int16_t *o = out + f * (1 + TETRA_FRAME_PARAM_WORDS);
    o[0] = (int16_t)bfi;
    for (int i = 0; i < TETRA_FRAME_PARAM_WORDS; ++i)
      o[1 + i] = data[2 * i + f];
  }
  return 0;
}

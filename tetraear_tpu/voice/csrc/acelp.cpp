/* ACELP-family speech codec: 137 bits / 30 ms frame, 8 kHz, 240 samples.
 *
 * In-process replacement for the ETSI sdecoder/scoder executables
 * (reference: tetraear/audio/voice.py:175-218).  CELP structure:
 * 10th-order LPC quantized as log-area ratios, 4 subframes of 60 samples,
 * adaptive codebook (pitch) + 2-pulse algebraic codebook + quantized
 * gains.  Bad frames (BFI) are concealed by reusing the previous frame's
 * parameters with damped gains.
 *
 * Bit allocation (137 bits, packed MSB-first in importance order, then
 * scattered onto the ETSI EN 300 395-2 frame positions so the
 * spec-exact channel codec's sensitivity classes protect the
 * perceptually critical bits: importance ranks 0..29 land on class-2
 * positions (TAB2), 30..85 on class-1 (TAB1), 86..136 on class-0
 * (TAB0) — the spec's own protection intent):
 *
 *   LAR1..LAR10          5,5,4,4,3,3,3,3,2,2   = 34
 *   sf0: lag 7, gp 3, gc 3                     = 13
 *   sf1..sf3: dlag 5, gp 3, gc 3               = 33
 *   4 x (pulse1 pos 6 + sign 1, pulse2 pos 6 + sign 1) = 56
 *   spare                                      = 1
 */

#include "tetra_codec.h"
#include "etsi_tables.h"

#include <cmath>
#include <cstring>
#include <new>

namespace {

/* importance rank -> 0-based frame position, by descending ETSI
 * protection class (class 2, class 1, class 0). */
struct EtsiPerm {
  int pos[137];
  EtsiPerm() {
    int r = 0;
    for (int i = 0; i < 30; ++i) pos[r++] = ETSI_TAB2[i] - 1;
    for (int i = 0; i < 56; ++i) pos[r++] = ETSI_TAB1[i] - 1;
    for (int i = 0; i < 51; ++i) pos[r++] = ETSI_TAB0[i] - 1;
  }
};
const EtsiPerm kPerm;

constexpr int kOrder = 10;
constexpr int kSub = 4;
constexpr int kSubLen = 60;
constexpr int kFrame = TETRA_SAMPLES_PER_FRAME;
constexpr int kMinLag = 20;
constexpr int kMaxLag = 147;
constexpr int kExcHist = kMaxLag + kSubLen;

const int kLarBits[kOrder] = {5, 5, 4, 4, 3, 3, 3, 3, 2, 2};
const float kLarRange[kOrder] = {4.f, 4.f, 2.f, 2.f, 1.5f, 1.5f,
                                 1.5f, 1.5f, 1.f, 1.f};

const float kGpTable[8] = {0.f, 0.2f, 0.4f, 0.55f, 0.7f, 0.85f, 1.0f, 1.15f};
const float kGcTable[8] = {0.5f, 1.5f, 4.f, 12.f, 32.f, 90.f, 250.f, 700.f};

struct BitWriter {
  int16_t *bits;
  int pos = 0;
  void put(int value, int n) {
    for (int i = n - 1; i >= 0; --i) bits[pos++] = (int16_t)((value >> i) & 1);
  }
};

struct BitReader {
  const int16_t *bits;
  int pos = 0;
  int get(int n) {
    int v = 0;
    for (int i = 0; i < n; ++i) v = (v << 1) | (bits[pos++] & 1);
    return v;
  }
};

struct FrameParams {
  int lar_idx[kOrder];
  int lag[kSub];
  int gp_idx[kSub];
  int gc_idx[kSub];
  int p1_pos[kSub], p1_sign[kSub];
  int p2_pos[kSub], p2_sign[kSub];
};

void pack_params(const FrameParams &p, int16_t *bits137) {
  int16_t seq[137];
  BitWriter w{seq};
  for (int i = 0; i < kOrder; ++i) w.put(p.lar_idx[i], kLarBits[i]);
  w.put(p.lag[0] - kMinLag, 7);
  w.put(p.gp_idx[0], 3);
  w.put(p.gc_idx[0], 3);
  for (int s = 1; s < kSub; ++s) {
    int d = p.lag[s] - p.lag[s - 1] + 15;   /* delta in [-15, 16] */
    if (d < 0) d = 0;
    if (d > 31) d = 31;
    w.put(d, 5);
    w.put(p.gp_idx[s], 3);
    w.put(p.gc_idx[s], 3);
  }
  for (int s = 0; s < kSub; ++s) {
    w.put(p.p1_pos[s], 6);
    w.put(p.p1_sign[s], 1);
    w.put(p.p2_pos[s], 6);
    w.put(p.p2_sign[s], 1);
  }
  w.put(0, 1);  /* spare */
  for (int i = 0; i < 137; ++i) bits137[kPerm.pos[i]] = seq[i];
}

void unpack_params(const int16_t *bits137, FrameParams *p) {
  int16_t seq[137];
  for (int i = 0; i < 137; ++i) seq[i] = bits137[kPerm.pos[i]];
  BitReader r{seq};
  for (int i = 0; i < kOrder; ++i) p->lar_idx[i] = r.get(kLarBits[i]);
  p->lag[0] = kMinLag + r.get(7);
  if (p->lag[0] > kMaxLag) p->lag[0] = kMaxLag;
  p->gp_idx[0] = r.get(3);
  p->gc_idx[0] = r.get(3);
  for (int s = 1; s < kSub; ++s) {
    int d = r.get(5) - 15;
    p->lag[s] = p->lag[s - 1] + d;
    if (p->lag[s] < kMinLag) p->lag[s] = kMinLag;
    if (p->lag[s] > kMaxLag) p->lag[s] = kMaxLag;
    p->gp_idx[s] = r.get(3);
    p->gc_idx[s] = r.get(3);
  }
  for (int s = 0; s < kSub; ++s) {
    p->p1_pos[s] = r.get(6);
    p->p1_sign[s] = r.get(1);
    p->p2_pos[s] = r.get(6);
    p->p2_sign[s] = r.get(1);
    if (p->p1_pos[s] >= kSubLen) p->p1_pos[s] = kSubLen - 1;
    if (p->p2_pos[s] >= kSubLen) p->p2_pos[s] = kSubLen - 1;
  }
}

/* LAR quantization: uniform within per-coefficient range. */
int lar_quant(float lar, int i) {
  int levels = 1 << kLarBits[i];
  float step = 2.f * kLarRange[i] / (float)levels;
  int idx = (int)std::floor((lar + kLarRange[i]) / step);
  if (idx < 0) idx = 0;
  if (idx >= levels) idx = levels - 1;
  return idx;
}

float lar_dequant(int idx, int i) {
  int levels = 1 << kLarBits[i];
  float step = 2.f * kLarRange[i] / (float)levels;
  return -kLarRange[i] + ((float)idx + 0.5f) * step;
}

/* reflection coefficients <-> LPC (step-up recursion). */
void refl_to_lpc(const float *k, float *a /* a[1..10], a[0]=1 */) {
  float tmp[kOrder + 1];
  a[0] = 1.f;
  for (int i = 1; i <= kOrder; ++i) a[i] = 0.f;
  for (int m = 1; m <= kOrder; ++m) {
    for (int i = 0; i <= m; ++i) tmp[i] = a[i];
    a[m] = k[m - 1];
    for (int i = 1; i < m; ++i) a[i] = tmp[i] + k[m - 1] * tmp[m - i];
  }
}

int quant_nearest(float v, const float *table, int n) {
  int best = 0;
  float bd = 1e30f;
  for (int i = 0; i < n; ++i) {
    float d = std::fabs(v - table[i]);
    if (d < bd) { bd = d; best = i; }
  }
  return best;
}

struct DecoderState {
  float exc[kExcHist];          /* excitation history */
  float syn_mem[kOrder];        /* synthesis filter memory */
  float pf_fir[kOrder];         /* postfilter numerator memory */
  float pf_iir[kOrder];         /* postfilter denominator memory */
  FrameParams prev;             /* for BFI concealment */
  bool has_prev = false;
  int bfi_count = 0;
  DecoderState() {
    std::memset(exc, 0, sizeof(exc));
    std::memset(syn_mem, 0, sizeof(syn_mem));
    std::memset(pf_fir, 0, sizeof(pf_fir));
    std::memset(pf_iir, 0, sizeof(pf_iir));
    std::memset(&prev, 0, sizeof(prev));
    for (int s = 0; s < kSub; ++s) prev.lag[s] = kMinLag;
  }
};

/* Short-term postfilter A(z/gn)/A(z/gd) with per-frame energy matching:
 * sharpens formants masked by the coarse 2-pulse excitation.  Decoder-
 * side only — no bitstream change. */
constexpr float kPfNum = 0.55f;
constexpr float kPfDen = 0.80f;

void postfilter(DecoderState *st, const float *a, float *x, int n) {
  float an[kOrder + 1], ad[kOrder + 1];
  float gn = 1.f, gd = 1.f;
  an[0] = ad[0] = 1.f;
  for (int i = 1; i <= kOrder; ++i) {
    gn *= kPfNum;
    gd *= kPfDen;
    an[i] = a[i] * gn;
    ad[i] = a[i] * gd;
  }
  double e_in = 1e-6, e_out = 1e-6;
  for (int i = 0; i < n; ++i) {
    float s = x[i];
    e_in += (double)s * s;
    /* numerator A(z/gn): FIR over input history */
    float y = s;
    for (int j = 0; j < kOrder; ++j) y += an[j + 1] * st->pf_fir[j];
    for (int j = kOrder - 1; j > 0; --j) st->pf_fir[j] = st->pf_fir[j - 1];
    st->pf_fir[0] = s;
    /* denominator 1/A(z/gd): IIR over output history */
    for (int j = 0; j < kOrder; ++j) y -= ad[j + 1] * st->pf_iir[j];
    for (int j = kOrder - 1; j > 0; --j) st->pf_iir[j] = st->pf_iir[j - 1];
    st->pf_iir[0] = y;
    e_out += (double)y * y;
    x[i] = y;
  }
  float g = (float)std::sqrt(e_in / e_out);
  for (int i = 0; i < n; ++i) x[i] *= g;
}

struct EncoderState {
  float exc[kExcHist];
  float prev_samples[kOrder];   /* residual filter memory */
  EncoderState() {
    std::memset(exc, 0, sizeof(exc));
    std::memset(prev_samples, 0, sizeof(prev_samples));
  }
};

void lpc_from_params(const FrameParams &p, float *a) {
  float k[kOrder];
  for (int i = 0; i < kOrder; ++i) {
    float lar = lar_dequant(p.lar_idx[i], i);
    float e = std::exp(lar);
    k[i] = (e - 1.f) / (e + 1.f);
  }
  refl_to_lpc(k, a);
}

void decode_frame_params(DecoderState *st, const FrameParams &p, float damp,
                         int16_t *pcm) {
  float a[kOrder + 1];
  lpc_from_params(p, a);

  /* build the frame's excitation in history coordinates:
     st->exc[0 .. kMaxLag-1] holds the previous samples; the frame's new
     excitation occupies [kMaxLag .. kMaxLag+kFrame). */
  static thread_local float exc[kMaxLag + kFrame];
  std::memcpy(exc, st->exc, sizeof(float) * kMaxLag);

  for (int s = 0; s < kSub; ++s) {
    int base = kMaxLag + s * kSubLen;
    int lag = p.lag[s];
    float gp = kGpTable[p.gp_idx[s]] * damp;
    float gc = kGcTable[p.gc_idx[s]] * damp;
    for (int n = 0; n < kSubLen; ++n)
      exc[base + n] = gp * exc[base + n - lag];
    exc[base + p.p1_pos[s]] += gc * (p.p1_sign[s] ? -1.f : 1.f);
    exc[base + p.p2_pos[s]] += gc * (p.p2_sign[s] ? -1.f : 1.f);
  }

  /* synthesis */
  float out[kFrame];
  for (int n = 0; n < kFrame; ++n) {
    float y = exc[kMaxLag + n];
    for (int j = 0; j < kOrder; ++j) y -= a[j + 1] * st->syn_mem[j];
    for (int j = kOrder - 1; j > 0; --j)
      st->syn_mem[j] = st->syn_mem[j - 1];
    st->syn_mem[0] = y;
    out[n] = y;
  }

  postfilter(st, a, out, kFrame);

  for (int n = 0; n < kFrame; ++n) {
    float y = out[n];
    if (y > 32767.f) y = 32767.f;
    if (y < -32768.f) y = -32768.f;
    pcm[n] = (int16_t)std::lrint(y);
  }

  /* update excitation history */
  std::memcpy(st->exc, exc + kFrame, sizeof(float) * kMaxLag);
}

}  // namespace

extern "C" void *tetra_speech_decoder_new(void) {
  return new (std::nothrow) DecoderState();
}

extern "C" void tetra_speech_decoder_free(void *dec) {
  delete static_cast<DecoderState *>(dec);
}

extern "C" int tetra_speech_decode(void *dec, const int16_t *params,
                                   int16_t *pcm) {
  if (!dec || !params || !pcm) return 1;
  auto *st = static_cast<DecoderState *>(dec);
  int bfi = params[0];
  FrameParams p;
  float damp = 1.0f;
  if (bfi && st->has_prev) {
    /* concealment: previous parameters, gains damped per repetition */
    p = st->prev;
    st->bfi_count++;
    damp = std::pow(0.75f, (float)st->bfi_count);
  } else if (bfi) {
    std::memset(pcm, 0, sizeof(int16_t) * kFrame);
    return 0;
  } else {
    unpack_params(params + 1, &p);
    st->prev = p;
    st->has_prev = true;
    st->bfi_count = 0;
  }
  decode_frame_params(st, p, damp, pcm);
  return 0;
}

extern "C" void *tetra_speech_encoder_new(void) {
  return new (std::nothrow) EncoderState();
}

extern "C" void tetra_speech_encoder_free(void *enc) {
  delete static_cast<EncoderState *>(enc);
}

extern "C" int tetra_speech_encode(void *enc, const int16_t *pcm,
                                   int16_t *params) {
  if (!enc || !pcm || !params) return 1;
  auto *st = static_cast<EncoderState *>(enc);

  /* LPC analysis: Hamming-windowed autocorrelation + Levinson-Durbin */
  float w[kFrame];
  for (int n = 0; n < kFrame; ++n) {
    float win = 0.54f - 0.46f * std::cos(2.f * (float)M_PI * (float)n
                                         / (float)(kFrame - 1));
    w[n] = (float)pcm[n] * win;
  }
  float r[kOrder + 1];
  for (int i = 0; i <= kOrder; ++i) {
    double acc = 0.0;
    for (int n = i; n < kFrame; ++n) acc += (double)w[n] * (double)w[n - i];
    r[i] = (float)acc;
  }
  r[0] = r[0] * 1.0001f + 1.0f;        /* white-noise correction */
  for (int i = 1; i <= kOrder; ++i)    /* 60 Hz lag window */
    r[i] *= std::exp(-0.5f * std::pow(2.f * (float)M_PI * 60.f * (float)i
                                      / 8000.f, 2.f));

  float k[kOrder], a[kOrder + 1], e = r[0];
  a[0] = 1.f;
  for (int i = 1; i <= kOrder; ++i) a[i] = 0.f;
  FrameParams p;
  std::memset(&p, 0, sizeof(p));
  for (int m = 1; m <= kOrder; ++m) {
    float acc = r[m];
    for (int i = 1; i < m; ++i) acc += a[i] * r[m - i];
    float km = (e > 1e-9f) ? -acc / e : 0.f;
    if (km > 0.999f) km = 0.999f;
    if (km < -0.999f) km = -0.999f;
    k[m - 1] = km;
    float tmp[kOrder + 1];
    for (int i = 0; i <= m; ++i) tmp[i] = a[i];
    a[m] = km;
    for (int i = 1; i < m; ++i) a[i] = tmp[i] + km * tmp[m - i];
    e *= (1.f - km * km);
  }

  /* quantize LARs, rebuild quantized LPC for the residual filter */
  for (int i = 0; i < kOrder; ++i) {
    float ki = k[i];
    float lar = std::log((1.f + ki) / (1.f - ki));
    p.lar_idx[i] = lar_quant(lar, i);
  }
  float kq[kOrder], aq[kOrder + 1];
  for (int i = 0; i < kOrder; ++i) {
    float lar = lar_dequant(p.lar_idx[i], i);
    float ex = std::exp(lar);
    kq[i] = (ex - 1.f) / (ex + 1.f);
  }
  refl_to_lpc(kq, aq);

  /* residual through quantized A(z) */
  float res[kFrame];
  for (int n = 0; n < kFrame; ++n) {
    float acc = (float)pcm[n];
    for (int j = 1; j <= kOrder; ++j) {
      float past = (n - j >= 0) ? (float)pcm[n - j]
                                : st->prev_samples[j - n - 1];
      acc += aq[j] * past;
    }
    res[n] = acc;
  }
  for (int j = 0; j < kOrder; ++j)
    st->prev_samples[j] = (float)pcm[kFrame - 1 - j];

  /* per-subframe excitation modelling */
  static thread_local float exc[kMaxLag + kFrame];
  std::memcpy(exc, st->exc, sizeof(float) * kMaxLag);

  int prev_lag = 0;
  for (int s = 0; s < kSub; ++s) {
    int base = kMaxLag + s * kSubLen;
    const float *tgt = res + s * kSubLen;

    /* adaptive codebook search */
    int lo = kMinLag, hi = kMaxLag;
    if (s > 0) {
      lo = prev_lag - 15;
      hi = prev_lag + 16;
      if (lo < kMinLag) lo = kMinLag;
      if (hi > kMaxLag) hi = kMaxLag;
    }
    int best_lag = lo;
    float best_score = -1e30f, best_gain = 0.f;
    for (int lag = lo; lag <= hi; ++lag) {
      double num = 0.0, den = 1e-6;
      for (int n = 0; n < kSubLen; ++n) {
        float v = exc[base + n - lag];
        num += (double)tgt[n] * v;
        den += (double)v * v;
      }
      float score = (float)(num * num / den);
      if (score > best_score) {
        best_score = score;
        best_lag = lag;
        best_gain = (float)(num / den);
      }
    }
    if (best_gain < 0.f) best_gain = 0.f;
    if (best_gain > 1.15f) best_gain = 1.15f;
    p.lag[s] = best_lag;
    p.gp_idx[s] = quant_nearest(best_gain, kGpTable, 8);
    float gp = kGpTable[p.gp_idx[s]];
    prev_lag = best_lag;

    /* second target after pitch prediction */
    float t2[kSubLen];
    for (int n = 0; n < kSubLen; ++n)
      t2[n] = tgt[n] - gp * exc[base + n - best_lag];

    /* 2-pulse algebraic codebook: largest residual magnitudes */
    int p1 = 0, p2 = 1;
    float m1 = -1.f, m2 = -1.f;
    for (int n = 0; n < kSubLen; ++n) {
      float mag = std::fabs(t2[n]);
      if (mag > m1) { m2 = m1; p2 = p1; m1 = mag; p1 = n; }
      else if (mag > m2) { m2 = mag; p2 = n; }
    }
    p.p1_pos[s] = p1;
    p.p1_sign[s] = t2[p1] < 0.f ? 1 : 0;
    p.p2_pos[s] = p2;
    p.p2_sign[s] = t2[p2] < 0.f ? 1 : 0;
    float gc = 0.5f * (m1 + m2);
    p.gc_idx[s] = quant_nearest(gc, kGcTable, 8);
    gc = kGcTable[p.gc_idx[s]];

    /* rebuild quantized excitation for the next subframe's history */
    for (int n = 0; n < kSubLen; ++n)
      exc[base + n] = gp * exc[base + n - best_lag];
    exc[base + p1] += gc * (p.p1_sign[s] ? -1.f : 1.f);
    exc[base + p2] += gc * (p.p2_sign[s] ? -1.f : 1.f);
  }
  std::memcpy(st->exc, exc + kFrame, sizeof(float) * kMaxLag);

  params[0] = 0;  /* BFI */
  pack_params(p, params + 1);
  return 0;
}

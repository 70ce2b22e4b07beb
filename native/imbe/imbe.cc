/* IMBE-architecture voice codec — implementation.
 *
 * Channel layer (exact, per the published IMBE 7200x4400 structure):
 *   144 bits = 4 x Golay(23,12) [u0..u3] + 3 x Hamming(15,11) [u4..u6]
 *            + 7 unprotected [u7], with u1..u6 codewords XOR-scrambled
 *   by the PN sequence pr' = (173*pr + 13849) mod 2^16 seeded with
 *   pr0 = u0 << 4, scramble bit = MSB.
 *
 * Parameter layer (framework profile — see imbe.h): the 88 information
 * bits carry, in order across u0..u7:
 *   b0   fundamental index        8 bits   w0 = 4*pi/(b0 + 39.5)
 *   vk   voicing band decisions  12 bits   band k covers harmonics
 *                                          3k+1..3k+3; ceil(L/3) used
 *   b2   frame gain              6 bits    G = 2^((b2 - 40)/4)
 *   b3+  per-harmonic log-amps  62 bits    flat q-bit quantizer,
 *                                          q = min(8, 62/L); first
 *                                          harmonics get the remainder
 *
 * Synthesis: classic MBE — voiced harmonics are phase-continuous
 * oscillators at l*w0 with per-sample linear amplitude/frequency
 * interpolation between frames; unvoiced harmonics add per-sample
 * random phase jitter, turning the oscillator into narrowband noise.
 * Analysis (encoder): autocorrelation pitch search 50..400 Hz, windowed
 * DFT harmonic amplitudes, per-band harmonicity voicing test.
 */

#include "imbe.h"

#include <math.h>
#include <stdlib.h>
#include <string.h>

#ifndef M_PI
#define M_PI 3.14159265358979323846
#endif

/* ------------------------------------------------------------------ */
/* Golay(23,12): generator polynomial 0xC75 (x^11+x^10+x^6+x^5+x^4+x^2+1).
 * Perfect code: 2^11 syndromes <-> error patterns of weight <= 3.      */

static uint32_t golay_parity(uint32_t data12) {
  uint32_t r = data12 << 11;
  for (int i = 22; i >= 11; --i)
    if (r & (1u << i)) r ^= 0xC75u << (i - 11);
  return r & 0x7FFu;
}

uint32_t imbe_golay23_encode(uint32_t data12) {
  data12 &= 0xFFFu;
  return (data12 << 11) | golay_parity(data12);
}

static uint32_t g_syndrome_tab[2048]; /* syndrome -> error pattern */
static int g_tab_ready = 0;

static uint32_t golay_syndrome(uint32_t cw) {
  uint32_t r = cw;
  for (int i = 22; i >= 11; --i)
    if (r & (1u << i)) r ^= 0xC75u << (i - 11);
  return r & 0x7FFu;
}

static void golay_build_tab(void) {
  if (g_tab_ready) return;
  memset(g_syndrome_tab, 0xFF, sizeof(g_syndrome_tab));
  g_syndrome_tab[0] = 0;
  for (int a = 0; a < 23; ++a) {
    uint32_t ea = 1u << a;
    g_syndrome_tab[golay_syndrome(ea)] = ea;
  }
  for (int a = 0; a < 23; ++a)
    for (int b = a + 1; b < 23; ++b) {
      uint32_t e = (1u << a) | (1u << b);
      uint32_t s = golay_syndrome(e);
      if (g_syndrome_tab[s] == 0xFFFFFFFFu) g_syndrome_tab[s] = e;
    }
  for (int a = 0; a < 23; ++a)
    for (int b = a + 1; b < 23; ++b)
      for (int c = b + 1; c < 23; ++c) {
        uint32_t e = (1u << a) | (1u << b) | (1u << c);
        uint32_t s = golay_syndrome(e);
        if (g_syndrome_tab[s] == 0xFFFFFFFFu) g_syndrome_tab[s] = e;
      }
  g_tab_ready = 1;
}

int imbe_golay23_decode(uint32_t cw, uint32_t* data12) {
  golay_build_tab();
  uint32_t s = golay_syndrome(cw & 0x7FFFFFu);
  uint32_t e = g_syndrome_tab[s];
  if (e == 0xFFFFFFFFu) return -1; /* >3 errors (impossible for 23,12) */
  uint32_t fixed = (cw ^ e) & 0x7FFFFFu;
  *data12 = fixed >> 11;
  int n = 0;
  while (e) { n += (int)(e & 1u); e >>= 1; }
  return n;
}

/* ------------------------------------------------------------------ */
/* Hamming(15,11), generator x^4 + x + 1 (0x13).                       */

static uint32_t ham_parity(uint32_t d11) {
  uint32_t r = d11 << 4;
  for (int i = 14; i >= 4; --i)
    if (r & (1u << i)) r ^= 0x13u << (i - 4);
  return r & 0xFu;
}

uint32_t imbe_hamming15_encode(uint32_t d11) {
  d11 &= 0x7FFu;
  return (d11 << 4) | ham_parity(d11);
}

int imbe_hamming15_decode(uint32_t cw, uint32_t* d11) {
  uint32_t r = cw & 0x7FFFu;
  for (int i = 14; i >= 4; --i)
    if (r & (1u << i)) r ^= 0x13u << (i - 4);
  uint32_t syn = r & 0xFu;
  int nerr = 0;
  if (syn) {
    /* single-bit correct: find position whose syndrome matches */
    int hit = -1;
    for (int p = 0; p < 15; ++p) {
      uint32_t e = 1u << p, rr = e;
      for (int i = 14; i >= 4; --i)
        if (rr & (1u << i)) rr ^= 0x13u << (i - 4);
      if ((rr & 0xFu) == syn) { hit = p; break; }
    }
    if (hit < 0) return -1;
    cw ^= 1u << hit;
    nerr = 1;
  }
  *d11 = (cw >> 4) & 0x7FFu;
  return nerr;
}

/* ------------------------------------------------------------------ */
/* PN scrambler (seeded by u0).                                        */

static void pn_bits(uint32_t seed16, uint8_t* out, int n) {
  uint32_t pr = seed16 & 0xFFFFu;
  for (int i = 0; i < n; ++i) {
    pr = (173u * pr + 13849u) & 0xFFFFu;
    out[i] = (uint8_t)(pr >> 15);
  }
}

/* ------------------------------------------------------------------ */
/* Model geometry.                                                     */

int imbe_harmonics_for_b0(int b0) {
  double w0 = 4.0 * M_PI / (double)(b0 + 39.5);
  int l = (int)floor(0.9254 * floor(M_PI / w0 + 0.25));
  if (l < 9) l = 9;
  if (l > 56) l = 56;
  return l;
}

static void amp_bit_alloc(int L, int q[56]) {
  int base = 62 / L, extra = 62 % L;
  if (base > 8) { base = 8; extra = 0; }
  for (int l = 0; l < L; ++l) q[l] = base + (l < extra ? 1 : 0);
  for (int l = 0; l < L; ++l) if (q[l] > 8) q[l] = 8;
}

/* ---- 88-bit param (de)serialization ---- */
static void put_bits(uint8_t* buf, int* pos, uint32_t v, int n) {
  for (int i = n - 1; i >= 0; --i) buf[(*pos)++] = (uint8_t)((v >> i) & 1u);
}
static uint32_t get_bits(const uint8_t* buf, int* pos, int n) {
  uint32_t v = 0;
  for (int i = 0; i < n; ++i) v = (v << 1) | buf[(*pos)++];
  return v;
}

static void params_to_info(const imbe_params_t* p, uint8_t info[88]) {
  int pos = 0;
  put_bits(info, &pos, (uint32_t)p->b0 & 0xFFu, 8);
  put_bits(info, &pos, p->voicing & 0xFFFu, 12);
  put_bits(info, &pos, (uint32_t)p->gain & 0x3Fu, 6);
  int L = imbe_harmonics_for_b0(p->b0);
  int q[56];
  amp_bit_alloc(L, q);
  int used = 26;
  for (int l = 0; l < L; ++l) {
    uint32_t a = p->amps[l];
    uint32_t maxv = (1u << q[l]) - 1u;
    if (a > maxv) a = maxv;
    put_bits(info, &pos, a, q[l]);
    used += q[l];
  }
  while (used < 88) { info[pos++] = 0; ++used; }
}

static void info_to_params(const uint8_t info[88], imbe_params_t* p) {
  int pos = 0;
  p->b0 = (int)get_bits(info, &pos, 8);
  p->voicing = get_bits(info, &pos, 12);
  p->gain = (int)get_bits(info, &pos, 6);
  int L = imbe_harmonics_for_b0(p->b0);
  int q[56];
  amp_bit_alloc(L, q);
  memset(p->amps, 0, sizeof(p->amps));
  int used = 26;
  for (int l = 0; l < L && used + q[l] <= 88; ++l) {
    p->amps[l] = (uint8_t)get_bits(info, &pos, q[l]);
    used += q[l];
  }
}

/* ---- 88 info bits <-> 144 channel bits ---- */
void imbe_pack_frame(const imbe_params_t* p, uint8_t bits[144]) {
  uint8_t info[88];
  params_to_info(p, info);
  uint32_t u[8];
  int pos = 0;
  for (int i = 0; i < 4; ++i) u[i] = get_bits(info, &pos, 12);
  for (int i = 4; i < 7; ++i) u[i] = get_bits(info, &pos, 11);
  u[7] = get_bits(info, &pos, 7);

  uint32_t cw[7];
  for (int i = 0; i < 4; ++i) cw[i] = imbe_golay23_encode(u[i]);
  for (int i = 4; i < 7; ++i) cw[i] = imbe_hamming15_encode(u[i]);

  uint8_t pn[114];
  pn_bits(u[0] << 4, pn, 114);
  int pni = 0, bi = 0;
  for (int i = 0; i < 4; ++i)
    for (int b = 22; b >= 0; --b) {
      uint8_t bit = (uint8_t)((cw[i] >> b) & 1u);
      if (i > 0) bit ^= pn[pni++]; /* u0 unscrambled */
      bits[bi++] = bit;
    }
  for (int i = 4; i < 7; ++i)
    for (int b = 14; b >= 0; --b)
      bits[bi++] = (uint8_t)(((cw[i] >> b) & 1u) ^ pn[pni++]);
  for (int b = 6; b >= 0; --b) bits[bi++] = (uint8_t)((u[7] >> b) & 1u);
}

int imbe_unpack_frame(const uint8_t bits[144], imbe_params_t* p) {
  uint32_t cw0 = 0;
  for (int b = 0; b < 23; ++b) cw0 = (cw0 << 1) | bits[b];
  uint32_t u0;
  int errs = imbe_golay23_decode(cw0, &u0);
  if (errs < 0) return -1;

  uint8_t pn[114];
  pn_bits(u0 << 4, pn, 114);
  uint32_t u[8];
  u[0] = u0;
  int pni = 0, bi = 23;
  for (int i = 1; i < 4; ++i) {
    uint32_t cw = 0;
    for (int b = 0; b < 23; ++b) cw = (cw << 1) | (bits[bi++] ^ pn[pni++]);
    uint32_t d;
    int e = imbe_golay23_decode(cw, &d);
    if (e < 0) return -1;
    errs += e;
    u[i] = d;
  }
  for (int i = 4; i < 7; ++i) {
    uint32_t cw = 0;
    for (int b = 0; b < 15; ++b) cw = (cw << 1) | (bits[bi++] ^ pn[pni++]);
    uint32_t d;
    int e = imbe_hamming15_decode(cw, &d);
    if (e < 0) { d = (cw >> 4) & 0x7FFu; e = 2; } /* keep going */
    errs += e;
    u[i] = d;
  }
  u[7] = 0;
  for (int b = 0; b < 7; ++b) u[7] = (u[7] << 1) | bits[bi++];

  uint8_t info[88];
  int pos = 0;
  for (int i = 0; i < 4; ++i) put_bits(info, &pos, u[i], 12);
  for (int i = 4; i < 7; ++i) put_bits(info, &pos, u[i], 11);
  put_bits(info, &pos, u[7], 7);
  info_to_params(info, p);
  return errs;
}

/* ------------------------------------------------------------------ */
/* Amplitude (de)quantization.                                         */

static double gain_value(int g) { return pow(2.0, (g - 40) / 4.0); }

static double amp_value(uint8_t a, int qbits, double gain) {
  double maxv = (double)((1u << qbits) - 1u);
  double r = maxv > 0 ? ((double)a / maxv) * 6.0 - 3.0 : 0.0;
  return gain * pow(2.0, r);
}

/* ------------------------------------------------------------------ */
/* Decoder / synthesis.                                                */

#define FRAME 160

struct imbe_decoder {
  double phase[56];
  double prev_amp[56];
  uint32_t prev_voicing;
  double prev_w0;
  int prev_L;
  int have_prev;
  uint32_t rng;
  int errors;
};

static double frand(uint32_t* s) { /* xorshift in [-1,1] */
  uint32_t x = *s;
  x ^= x << 13; x ^= x >> 17; x ^= x << 5;
  *s = x;
  return ((double)(x & 0xFFFFFFu) / 8388608.0) - 1.0;
}

imbe_decoder_t* imbe_decoder_create(void) {
  imbe_decoder_t* d = (imbe_decoder_t*)calloc(1, sizeof(*d));
  d->rng = 0x5f5ff77fu;
  return d;
}
void imbe_decoder_destroy(imbe_decoder_t* d) { free(d); }
int imbe_errors(const imbe_decoder_t* d) { return d->errors; }

int imbe_decode(imbe_decoder_t* d, const uint8_t bits[144],
                int16_t pcm[160]) {
  imbe_params_t p;
  int errs = imbe_unpack_frame(bits, &p);
  if (errs < 0) { /* unusable: output silence, keep state */
    memset(pcm, 0, FRAME * sizeof(int16_t));
    d->errors += 12;
    return -1;
  }
  d->errors += errs;

  double w0 = 4.0 * M_PI / (double)(p.b0 + 39.5);
  int L = imbe_harmonics_for_b0(p.b0);
  int q[56];
  amp_bit_alloc(L, q);
  double gain = gain_value(p.gain);
  double amp[56];
  for (int l = 0; l < L; ++l) amp[l] = amp_value(p.amps[l], q[l], gain);

  double pw0 = d->have_prev ? d->prev_w0 : w0;
  int pL = d->have_prev ? d->prev_L : L;
  double out[FRAME];
  memset(out, 0, sizeof(out));
  int maxL = L > pL ? L : pL;
  for (int l = 0; l < maxL; ++l) {
    double a0 = (l < pL) ? d->prev_amp[l] : 0.0;
    double a1 = (l < L) ? amp[l] : 0.0;
    int band = l / 3;
    if (band > 11) band = 11;
    int voiced = (l < L) ? ((p.voicing >> (11 - band)) & 1u)
                         : ((d->prev_voicing >> (11 - band)) & 1u);
    double ph = d->phase[l];
    for (int n = 0; n < FRAME; ++n) {
      double t = (double)n / FRAME;
      double a = a0 + (a1 - a0) * t;
      double w = (pw0 + (w0 - pw0) * t) * (l + 1);
      if (w < M_PI) {
        out[n] += a * cos(ph);
        ph += w;
        if (!voiced) ph += 0.9 * frand(&d->rng); /* narrowband noise */
        if (ph > 2 * M_PI) ph -= 2 * M_PI * floor(ph / (2 * M_PI));
      }
    }
    d->phase[l] = ph;
  }
  for (int n = 0; n < FRAME; ++n) {
    double v = out[n] * 4096.0;
    if (v > 32767.0) v = 32767.0;
    if (v < -32768.0) v = -32768.0;
    pcm[n] = (int16_t)lrint(v);
  }
  memcpy(d->prev_amp, amp, sizeof(amp));
  if (L < 56) memset(d->prev_amp + L, 0, (56 - L) * sizeof(double));
  d->prev_voicing = p.voicing;
  d->prev_w0 = w0;
  d->prev_L = L;
  d->have_prev = 1;
  return errs;
}

/* ------------------------------------------------------------------ */
/* Encoder / analysis.                                                 */

struct imbe_encoder {
  double hist[FRAME * 2]; /* previous + current frame window */
  int have_hist;
};

imbe_encoder_t* imbe_encoder_create(void) {
  return (imbe_encoder_t*)calloc(1, sizeof(imbe_encoder_t));
}
void imbe_encoder_destroy(imbe_encoder_t* e) { free(e); }

void imbe_encode_params(const imbe_params_t* p, uint8_t bits[144]) {
  imbe_pack_frame(p, bits);
}

void imbe_encode(imbe_encoder_t* e, const int16_t pcm[160],
                 uint8_t bits[144]) {
  /* window: previous frame + this one */
  double x[FRAME * 2];
  if (e->have_hist)
    memcpy(x, e->hist + FRAME, FRAME * sizeof(double));
  else
    memset(x, 0, FRAME * sizeof(double));
  for (int n = 0; n < FRAME; ++n) x[FRAME + n] = pcm[n] / 32768.0;
  memcpy(e->hist, x, sizeof(x));
  e->have_hist = 1;

  const int N = FRAME * 2;
  /* pitch: autocorrelation over lags for 50..400 Hz at 8 kHz */
  double best = -1.0;
  int best_lag = 40;
  double e0 = 1e-12;
  for (int n = 0; n < N; ++n) e0 += x[n] * x[n];
  for (int lag = 20; lag <= 160; ++lag) {
    double c = 0.0, ee = 1e-12;
    for (int n = lag; n < N; ++n) { c += x[n] * x[n - lag]; ee += x[n - lag] * x[n - lag]; }
    double score = c / sqrt(e0 * ee);
    if (score > best) { best = score; best_lag = lag; }
  }
  double w0 = 2.0 * M_PI / (double)best_lag;
  int b0 = (int)lrint(4.0 * M_PI / w0 - 39.5);
  if (b0 < 0) b0 = 0;
  if (b0 > 207) b0 = 207;
  w0 = 4.0 * M_PI / (double)(b0 + 39.5);
  int L = imbe_harmonics_for_b0(b0);

  /* harmonic amplitudes via windowed DFT at l*w0 */
  double amp[56];
  double total = 1e-12;
  for (int l = 0; l < L; ++l) {
    double wr = 0.0, wi = 0.0, wsum = 0.0;
    double wl = w0 * (l + 1);
    if (wl >= M_PI) { amp[l] = 0.0; continue; }
    for (int n = 0; n < N; ++n) {
      double win = 0.5 - 0.5 * cos(2.0 * M_PI * n / (N - 1));
      wr += x[n] * win * cos(wl * n);
      wi -= x[n] * win * sin(wl * n);
      wsum += win;
    }
    amp[l] = 2.0 * sqrt(wr * wr + wi * wi) / wsum;
    total += amp[l] * amp[l];
  }
  double rms = sqrt(total / (L > 0 ? L : 1));
  int gidx = (int)lrint(40.0 + 4.0 * log2(rms > 1e-9 ? rms : 1e-9));
  if (gidx < 0) gidx = 0;
  if (gidx > 63) gidx = 63;
  double gain = gain_value(gidx);

  /* voicing: global harmonicity (autocorr peak) gates all bands;
   * per-band refinement uses harmonic-vs-floor energy */
  uint32_t voicing = 0;
  int K = (L + 2) / 3;
  if (K > 12) K = 12;
  for (int k = 0; k < K; ++k) {
    double band_amp = 0.0;
    for (int j = 0; j < 3; ++j) {
      int l = 3 * k + j;
      if (l < L) band_amp += amp[l];
    }
    int v = (best > 0.35) && (band_amp > 0.05 * rms);
    if (v) voicing |= 1u << (11 - k);
  }

  imbe_params_t p;
  memset(&p, 0, sizeof(p));
  p.b0 = b0;
  p.voicing = voicing;
  p.gain = gidx;
  int q[56];
  amp_bit_alloc(L, q);
  for (int l = 0; l < L; ++l) {
    double r = log2((amp[l] > 1e-9 ? amp[l] : 1e-9) / gain);
    if (r < -3.0) r = -3.0;
    if (r > 3.0) r = 3.0;
    double maxv = (double)((1u << q[l]) - 1u);
    p.amps[l] = (uint8_t)lrint((r + 3.0) / 6.0 * maxv);
  }
  imbe_pack_frame(&p, bits);
}

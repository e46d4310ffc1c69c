#include "vocoder.h"

#include <algorithm>
#include <cmath>
#include <random>

#include "fft.h"

namespace cvdsp {

namespace {

constexpr double kApFloor = 0.001;
constexpr double kApCeil = 0.999;
constexpr double kBandHz = 3000.0;

// Windowed, DC-removed, energy-normalized power spectrum around `center`.
// win_half: half window length in samples. Returns fftl/2+1 bins normalized by
// sum(w^2) (PSD-style, per-sample frequency units).
std::vector<double> frame_power_spectrum(const double* x, int n, int center,
                                         int win_half, int fftl) {
  const int L = 2 * win_half + 1;
  std::vector<double> buf(fftl, 0.0);
  double wsum = 0.0, wxsum = 0.0, w2sum = 0.0;
  std::vector<double> w(L);
  for (int i = 0; i < L; ++i) {
    w[i] = 0.5 - 0.5 * std::cos(2.0 * M_PI * i / (L - 1));
    const int idx = center - win_half + i;
    const double xi = (idx >= 0 && idx < n) ? x[idx] : 0.0;
    wsum += w[i];
    wxsum += w[i] * xi;
    w2sum += w[i] * w[i];
  }
  const double dc = wsum > 0 ? wxsum / wsum : 0.0;
  for (int i = 0; i < L && i < fftl; ++i) {
    const int idx = center - win_half + i;
    const double xi = (idx >= 0 && idx < n) ? x[idx] : 0.0;
    buf[i] = (xi - dc) * w[i];
  }
  auto spec = rfft(buf);
  std::vector<double> ps(fftl / 2 + 1);
  const double norm = w2sum > 1e-12 ? 1.0 / w2sum : 0.0;
  for (int i = 0; i <= fftl / 2; ++i) ps[i] = std::norm(spec[i]) * norm;
  return ps;
}

}  // namespace

std::vector<double> spectral_envelope(const double* x, int n, int fs,
                                      const std::vector<double>& time_axis,
                                      const std::vector<double>& f0, int fftl,
                                      double default_f0) {
  const int half = fftl / 2;
  const int n_frames = (int)f0.size();
  std::vector<double> out((size_t)n_frames * (half + 1));
  const double f0_min = 3.0 * fs / (double)fftl;  // adaptive window must fit fftl

  std::vector<double> logps(fftl), lifter(fftl);
  for (int t = 0; t < n_frames; ++t) {
    const bool voiced = f0[t] > 0;
    double f = voiced ? f0[t] : default_f0;
    f = std::max(f, f0_min);
    const int center = (int)std::llround(time_axis[t] * fs);
    const int win_half = (int)std::llround(1.5 * fs / f);
    // Average the power spectrum over 3 windows offset by one period
    // (voiced: harmonic phases repeat, so the periodic structure is
    // unchanged while noise variance drops 3x) or half a window (unvoiced).
    // The smoothed-periodogram variance is f0-independent (smoothing width x
    // window length ~ 3 independent bins) and was the round-trip MCD floor:
    // analysis self-repeatability on 2.5 ms-shifted speech was 3.1 dB.
    const int off = voiced ? (int)std::llround((double)fs / f)
                           : std::max(1, win_half / 2);
    auto ps = frame_power_spectrum(x, n, center, win_half, fftl);
    {
      const int n_side = voiced ? 1 : 2;  // 3 windows voiced, 5 unvoiced
      for (int s = 1; s <= n_side; ++s) {
        auto psl = frame_power_spectrum(x, n, center - s * off, win_half, fftl);
        auto psr = frame_power_spectrum(x, n, center + s * off, win_half, fftl);
        for (size_t i = 0; i < ps.size(); ++i) ps[i] += psl[i] + psr[i];
      }
      const double inv = 1.0 / (2 * n_side + 1);
      for (auto& v : ps) v *= inv;
    }
    const double floor_val = 1e-12;
    for (auto& v : ps) v = std::max(v, floor_val);

    // DC correction (WORLD cheaptrick behavior): the DC-removed window loses
    // the true spectrum below f0; add the spectrum mirrored around f0 there.
    // Analytic-fixture tests show this is where nearly all envelope error
    // lives (sub-f0 LSD ~12 dB without it; total 1.2-2.5 dB -> 0.3-0.6 dB).
    {
      const double bin_hz0 = (double)fs / fftl;
      const int n_lo = std::min((int)std::ceil(f / bin_hz0), half);
      std::vector<double> add(n_lo);
      for (int i = 0; i < n_lo; ++i) {
        const double mb = (2.0 * f - i * bin_hz0) / bin_hz0;  // mirror bin
        const int m0 = std::clamp((int)mb, 0, half - 1);
        const double w = mb - m0;
        add[i] = ps[m0] * (1.0 - w) + ps[m0 + 1] * w;
      }
      for (int i = 0; i < n_lo; ++i) ps[i] += add[i];
    }

    // rectangular smoothing of width (2/3) f0 in frequency, evaluated as a
    // CONTINUOUS integral over the linearly-interpolated spectrum (integer-bin
    // moving averages leave residual harmonic interference -> frame-to-frame
    // envelope variance)
    const double bin_hz = (double)fs / fftl;
    // unvoiced frames have no harmonic structure to respect — smooth wider
    // to cut periodogram variance further
    const double ws = voiced ? (2.0 / 3.0) * f
                             : std::max((2.0 / 3.0) * f, 300.0);
    const double wb = ws / bin_hz;  // smoothing width in (fractional) bins
    std::vector<double> smoothed(half + 1);
    // cumulative integral of the reflect-extended spectrum (trapezoid)
    const int ext = half + 1 + (int)wb + 2;
    auto ps_at = [&](int k) {
      if (k < 0) k = -k;
      if (k > half) k = 2 * half - k;
      return ps[std::clamp(k, 0, half)];
    };
    std::vector<double> cum(2 * ext + 1, 0.0);  // index i -> bin (i - ext)
    for (int i = 1; i <= 2 * ext; ++i) {
      const int b0 = i - 1 - ext, b1 = i - ext;
      cum[i] = cum[i - 1] + 0.5 * (ps_at(b0) + ps_at(b1));
    }
    auto cum_at = [&](double b) {  // integral from bin -ext to fractional bin b
      const double pos = b + ext;
      const int i0 = std::clamp((int)std::floor(pos), 0, 2 * ext - 1);
      const double frac = pos - i0;
      // quadratic within the trapezoid cell (linear spectrum segment)
      const int b0 = i0 - ext, b1 = i0 + 1 - ext;
      const double p0 = ps_at(b0), p1 = ps_at(b1);
      return cum[i0] + frac * p0 + 0.5 * frac * frac * (p1 - p0);
    };
    for (int i = 0; i <= half; ++i)
      smoothed[i] = (cum_at(i + wb / 2) - cum_at(i - wb / 2)) / wb;

    // cepstral liftering: sinc smoothing lifter + q1 compensation lifter
    std::vector<cplx> lsp(half + 1);
    for (int i = 0; i <= half; ++i)
      lsp[i] = cplx(std::log(smoothed[i]), 0.0);
    auto ceps = irfft(lsp, fftl);
    const double q1 = -0.15, q0 = 1.0 - 2.0 * q1;
    for (int q = 0; q < fftl; ++q) {
      const int qq = q <= half ? q : fftl - q;  // symmetric quefrency
      const double arg = M_PI * f * qq / (double)fs;
      const double sinc = qq == 0 ? 1.0 : std::sin(arg) / arg;
      const double comp = q0 + 2.0 * q1 * std::cos(2.0 * M_PI * f * qq / fs);
      ceps[q] *= sinc * comp;
    }
    std::vector<double> cr(ceps.begin(), ceps.end());
    auto back = rfft(cr);
    double* row = &out[(size_t)t * (half + 1)];
    for (int i = 0; i <= half; ++i)
      row[i] = std::exp(back[i].real());
  }
  return out;
}

int n_coded_aperiodicity(int fs) {
  // bands at 3k, 6k, ... up to fs/2 - 3k (2 bands at 22.05 kHz, matching the
  // reference's 2-dim codeap at this rate — feat layout SURVEY.md §1)
  return std::max(1, (int)((fs / 2.0 - kBandHz) / kBandHz));
}

std::vector<double> aperiodicity(const double* x, int n, int fs,
                                 const std::vector<double>& time_axis,
                                 const std::vector<double>& f0, int fftl) {
  const int half = fftl / 2;
  const int n_frames = (int)f0.size();
  const int n_bands = n_coded_aperiodicity(fs);
  std::vector<double> out((size_t)n_frames * (half + 1), kApCeil);
  const double bin_hz = (double)fs / fftl;

  for (int t = 0; t < n_frames; ++t) {
    double* row = &out[(size_t)t * (half + 1)];
    const double f = f0[t];
    if (f <= 0) {
      for (int i = 0; i <= half; ++i) row[i] = kApCeil;
      continue;
    }
    const int center = (int)std::llround(time_axis[t] * fs);
    // Long Blackman window (12 periods) on a fine FFT grid: the Blackman main
    // lobe (full width 6/L = 0.5 f0) keeps harmonic energy out of the
    // inter-harmonic sampling region and its -58 dB sidelobes set the
    // estimator floor. 4-period Hann (the previous choice) leaks the entire
    // main lobe into the "noise" bins — analytic HNR fixtures showed a=0.1
    // read as 0.29-0.49; with this window + the power-integral ratio below
    // the same fixtures track truth within ~10% (tests/test_dsp.py).
    const int win_half = (int)std::llround(6.0 * fs / f);
    const int L = 2 * win_half + 1;
    const int fft_fine = (int)next_pow2((size_t)(2 * L));
    std::vector<double> buf(fft_fine, 0.0), w(L);
    double wxsum = 0.0, wsum = 0.0, w2sum = 0.0;
    for (int i = 0; i < L; ++i) {
      const double ph = 2.0 * M_PI * i / (L - 1);
      w[i] = 0.42 - 0.5 * std::cos(ph) + 0.08 * std::cos(2.0 * ph);
      const int idx = center - win_half + i;
      const double xi = (idx >= 0 && idx < n) ? x[idx] : 0.0;
      wsum += w[i];
      wxsum += w[i] * xi;
      w2sum += w[i] * w[i];
    }
    const double dc = wsum > 0 ? wxsum / wsum : 0.0;
    for (int i = 0; i < L; ++i) {
      const int idx = center - win_half + i;
      const double xi = (idx >= 0 && idx < n) ? x[idx] : 0.0;
      buf[i] = (xi - dc) * w[i];
    }
    auto spec = rfft(buf);
    const int half_fine = fft_fine / 2;
    const double bin_fine = (double)fs / fft_fine;
    std::vector<double> ps(half_fine + 1);
    const double norm = w2sum > 1e-12 ? 1.0 / w2sum : 0.0;
    for (int i = 0; i <= half_fine; ++i) ps[i] = std::norm(spec[i]) * norm;

    // In-window f0 refinement: a 0.3 Hz tracker error is amplified by the
    // harmonic number (k~40 at 6 kHz) to ~0.1 f0 — enough to push harmonic
    // main lobes into the noise comb. LS-fit k*f0 to the measured harmonic
    // peak positions (parabolic interpolation on log power) first.
    // Staged fit: low harmonics tolerate tracker errors of several Hz (error
    // amplified k-fold at harmonic k); each stage's fit recenters the next
    // stage's peak search so high harmonics can be used safely.
    double f_ref = f;
    const int stage_kmax[3] = {4, 12, 40};
    const double stage_r[3] = {0.3, 0.2, 0.15};
    for (int s = 0; s < 3; ++s) {
      double num = 0.0, den = 0.0;
      const int k_lim = std::min(stage_kmax[s],
                                 (int)((fs / 2.0 - bin_fine) / f_ref));
      for (int k = 1; k <= k_lim; ++k) {
        const int e = (int)std::llround(k * f_ref / bin_fine);
        const int r = std::max(1, (int)(stage_r[s] * f_ref / bin_fine));
        int best = -1;
        double best_v = 0.0;
        for (int i = std::max(1, e - r);
             i <= std::min(half_fine - 1, e + r); ++i)
          if (ps[i] > best_v) { best_v = ps[i]; best = i; }
        if (best <= 0 || best_v <= 0) continue;
        const double l0 = std::log(std::max(ps[best - 1], 1e-300));
        const double l1 = std::log(std::max(ps[best], 1e-300));
        const double l2 = std::log(std::max(ps[best + 1], 1e-300));
        const double denom = l0 - 2.0 * l1 + l2;
        const double off = std::abs(denom) > 1e-12
                               ? std::clamp(0.5 * (l0 - l2) / denom, -0.5, 0.5)
                               : 0.0;
        const double fk = (best + off) * bin_fine;
        num += k * fk;
        den += (double)k * k;
      }
      if (den > 0) {
        const double fit = num / den;
        if (std::abs(fit - f_ref) < 0.12 * f_ref) f_ref = fit;
        else break;
      }
    }

    // per band: inter-harmonic noise density over total band density.
    // noise_power/total_power = nd*W / (mean_density*W) — the density-ratio
    // form (nd/hd) overestimates the harmonic density by the inverse of the
    // harmonic-bin fill fraction and reads a/=2 too low.
    std::vector<double> band_ap(n_bands);
    for (int b = 0; b < n_bands; ++b) {
      const double fc = kBandHz * (b + 1);
      const double f_lo = std::max(fc - kBandHz / 2.0, f * 1.5);
      const double f_hi = std::min(fc + kBandHz / 2.0, fs / 2.0 - bin_fine);
      double noise = 0.0, total = 0.0;
      int nn = 0, nt = 0;
      for (int i = (int)(f_lo / bin_fine);
           i <= (int)(f_hi / bin_fine) && i <= half_fine; ++i) {
        const double freq = i * bin_fine;
        const double frac = freq / f_ref - std::floor(freq / f_ref);
        const double d = std::min(frac, 1.0 - frac);  // cycles to harmonic
        total += ps[i];
        ++nt;
        if (d > 0.35 && d < 0.65) { noise += ps[i]; ++nn; }
      }
      double ap2;
      if (nn == 0 || nt == 0) ap2 = kApCeil * kApCeil;
      else {
        const double nd = noise / nn, td = total / nt;
        ap2 = nd / std::max(td, 1e-300);
      }
      band_ap[b] = std::sqrt(std::clamp(ap2, kApFloor * kApFloor, kApCeil * kApCeil));
    }
    // interpolate band values (centers at 3k*(b+1)) across the full spectrum
    for (int i = 0; i <= half; ++i) {
      const double freq = i * bin_hz;
      const double pos = freq / kBandHz - 1.0;  // band-center index space
      double v;
      if (pos <= 0) v = band_ap[0];
      else if (pos >= n_bands - 1) v = band_ap[n_bands - 1];
      else {
        const int b0 = (int)pos;
        const double w = pos - b0;
        v = band_ap[b0] * (1 - w) + band_ap[b0 + 1] * w;
      }
      row[i] = std::clamp(v, kApFloor, kApCeil);
    }
  }
  return out;
}

std::vector<double> code_aperiodicity(const std::vector<double>& ap,
                                      int n_frames, int fs, int fftl) {
  const int half = fftl / 2;
  const int n_bands = n_coded_aperiodicity(fs);
  const double bin_hz = (double)fs / fftl;
  std::vector<double> coded((size_t)n_frames * n_bands);
  for (int t = 0; t < n_frames; ++t)
    for (int b = 0; b < n_bands; ++b) {
      const int bin = std::min((int)std::llround(kBandHz * (b + 1) / bin_hz), half);
      coded[(size_t)t * n_bands + b] =
          20.0 * std::log10(std::clamp(ap[(size_t)t * (half + 1) + bin],
                                       kApFloor, kApCeil));
    }
  return coded;
}

std::vector<double> decode_aperiodicity(const std::vector<double>& coded,
                                        int n_frames, int fs, int fftl) {
  const int half = fftl / 2;
  const int n_bands = n_coded_aperiodicity(fs);
  const double bin_hz = (double)fs / fftl;
  std::vector<double> ap((size_t)n_frames * (half + 1));
  for (int t = 0; t < n_frames; ++t) {
    const double* c = &coded[(size_t)t * n_bands];
    for (int i = 0; i <= half; ++i) {
      const double pos = i * bin_hz / kBandHz - 1.0;
      double db;
      if (pos <= 0) db = c[0];
      else if (pos >= n_bands - 1) db = c[n_bands - 1];
      else {
        const int b0 = (int)pos;
        const double w = pos - b0;
        db = c[b0] * (1 - w) + c[b0 + 1] * w;
      }
      ap[(size_t)t * (half + 1) + i] =
          std::clamp(std::pow(10.0, db / 20.0), kApFloor, kApCeil);
    }
  }
  return ap;
}

namespace {

// Minimum-phase impulse response from a one-sided power spectrum.
std::vector<double> min_phase_ir(const double* ps, int fftl) {
  const int half = fftl / 2;
  std::vector<cplx> logsp(half + 1);
  for (int i = 0; i <= half; ++i)
    logsp[i] = cplx(0.5 * std::log(std::max(ps[i], 1e-300)), 0.0);
  auto c = irfft(logsp, fftl);
  // fold to minimum-phase cepstrum
  std::vector<double> cm(fftl, 0.0);
  cm[0] = c[0];
  for (int k = 1; k < half; ++k) cm[k] = 2.0 * c[k];
  cm[half] = c[half];
  auto spec = rfft(cm);
  std::vector<cplx> H(half + 1);
  for (int i = 0; i <= half; ++i) H[i] = std::exp(spec[i]);
  return irfft(H, fftl);
}

}  // namespace

std::vector<double> synthesize(const std::vector<double>& f0,
                               const std::vector<double>& sp,
                               const std::vector<double>& ap, int n_frames,
                               int fs, double frame_period, int fftl,
                               uint64_t seed) {
  const int half = fftl / 2;
  const double hop_s = frame_period / 1000.0;
  const int n_out = (int)std::llround((n_frames - 1) * hop_s * fs) + fftl;
  std::vector<double> y(n_out, 0.0);

  auto frame_at = [&](double t_s) {
    double pos = t_s / hop_s;
    int t0 = (int)pos;
    if (t0 < 0) t0 = 0;
    if (t0 > n_frames - 1) t0 = n_frames - 1;
    return t0;
  };
  auto f0_at = [&](double t_s) -> double {
    const double pos = t_s / hop_s;
    const int t0 = std::clamp((int)pos, 0, n_frames - 1);
    const int t1 = std::min(t0 + 1, n_frames - 1);
    const double w = std::clamp(pos - t0, 0.0, 1.0);
    const double a = f0[t0], b = f0[t1];
    if (a <= 0 || b <= 0) return w < 0.5 ? a : b;
    return a * (1 - w) + b * w;
  };

  // ---- periodic part: pulses at pitch marks, amplitude sqrt(period) ----
  // envelope/aperiodicity linearly interpolated at the pulse time (nearest-
  // frame sampling leaves audible frame-rate steps in the spectra)
  std::vector<double> per_ps(half + 1);
  double t_s = 0.0;
  const double end_s = (n_frames - 1) * hop_s;
  while (t_s < end_s) {
    const double f = f0_at(t_s);
    if (f <= 0) {
      t_s += hop_s;  // skip through unvoiced regions
      continue;
    }
    const double pos = t_s / hop_s;
    const int fr0 = std::clamp((int)pos, 0, n_frames - 1);
    const int fr1 = std::min(fr0 + 1, n_frames - 1);
    const double wfr = std::clamp(pos - fr0, 0.0, 1.0);
    const double* sp0 = &sp[(size_t)fr0 * (half + 1)];
    const double* sp1 = &sp[(size_t)fr1 * (half + 1)];
    const double* ap0 = &ap[(size_t)fr0 * (half + 1)];
    const double* ap1 = &ap[(size_t)fr1 * (half + 1)];
    for (int i = 0; i <= half; ++i) {
      const double s = sp0[i] * (1.0 - wfr) + sp1[i] * wfr;
      const double a = ap0[i] * (1.0 - wfr) + ap1[i] * wfr;
      per_ps[i] = s * std::max(0.0, 1.0 - a * a);
    }
    auto ir = min_phase_ir(per_ps.data(), fftl);
    const double period = fs / f;
    const double amp = std::sqrt(period);
    const int p = (int)std::llround(t_s * fs);
    for (int i = 0; i < fftl && p + i < n_out; ++i) y[p + i] += amp * ir[i];
    t_s += period / fs;
  }

  // ---- aperiodic part: exact-magnitude random-phase noise, sqrt-Hann OLA ----
  // White-noise excitation through a filter realizes the target PSD only in
  // expectation, with chi^2_2 (100%) per-bin periodogram variance — that
  // variance came straight back out of the re-analysis as ~4 dB unvoiced
  // round-trip MCD. Synthesizing each frame in the frequency domain with the
  // exact target magnitude and random phase removes the magnitude variance;
  // 50%-overlap sqrt-Hann OLA preserves power (sum of squared windows = 1).
  std::mt19937_64 gen(seed);
  std::uniform_real_distribution<double> ud(0.0, 2.0 * M_PI);
  const int hop = (int)std::llround(hop_s * fs);
  const int wlen = 2 * hop;
  std::vector<double> w2(wlen);
  for (int i = 0; i < wlen; ++i) {
    const double hann = 0.5 - 0.5 * std::cos(2.0 * M_PI * i / wlen);
    w2[i] = std::sqrt(hann);
  }
  std::vector<cplx> X(half + 1);
  for (int t = 0; t < n_frames; ++t) {
    const double* sp_row = &sp[(size_t)t * (half + 1)];
    const double* ap_row = &ap[(size_t)t * (half + 1)];
    for (int i = 0; i <= half; ++i) {
      const double a = ap_row[i];
      const double mag = std::sqrt(std::max(sp_row[i] * a * a, 0.0) * fftl);
      const double th = ud(gen);
      X[i] = (i == 0 || i == half) ? cplx(mag, 0.0)
                                   : cplx(mag * std::cos(th), mag * std::sin(th));
    }
    auto seg = irfft(X, fftl);
    const int start = (int)std::llround(t * hop_s * fs) - hop;
    for (int i = 0; i < wlen; ++i) {
      const int p = start + i;
      if (p < 0 || p >= n_out) continue;
      y[p] += w2[i] * seg[i % fftl];
    }
  }
  y.resize((size_t)std::max(0, (int)std::llround((n_frames - 1) * hop_s * fs)) + hop);
  return y;
}

}  // namespace cvdsp

// WORLD-style F0 estimation (DIO candidate search + StoneMask refinement)
// as a host-side C++ extension for the preprocessing input pipeline.
//
// The reference delegates this to pyworld's C++ (rank_model/audio_util.py:16-20);
// this is an independent implementation of the same algorithm family,
// mirrored 1:1 by the numpy fallback in emotts/audio/f0.py (the two are
// cross-checked in tests/test_native.py).  Exposed via a C ABI for ctypes.
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cmath>
#include <complex>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;
constexpr double kEps = 1e-12;

// ---------------------------------------------------------------------------
// radix-2 iterative FFT
// ---------------------------------------------------------------------------

void fft_inplace(std::vector<std::complex<double>>& a, bool invert) {
  const size_t n = a.size();
  for (size_t i = 1, j = 0; i < n; ++i) {
    size_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) std::swap(a[i], a[j]);
  }
  for (size_t len = 2; len <= n; len <<= 1) {
    const double ang = 2.0 * kPi / double(len) * (invert ? 1.0 : -1.0);
    const std::complex<double> wl(std::cos(ang), std::sin(ang));
    for (size_t i = 0; i < n; i += len) {
      std::complex<double> w(1.0, 0.0);
      for (size_t k = 0; k < len / 2; ++k) {
        const std::complex<double> u = a[i + k];
        const std::complex<double> v = a[i + k + len / 2] * w;
        a[i + k] = u + v;
        a[i + k + len / 2] = u - v;
        w *= wl;
      }
    }
  }
  if (invert) {
    for (auto& x : a) x /= double(n);
  }
}

std::vector<std::complex<double>> rfft(const std::vector<double>& x, size_t n) {
  std::vector<std::complex<double>> a(n);
  const size_t m = std::min(x.size(), n);
  for (size_t i = 0; i < m; ++i) a[i] = x[i];
  fft_inplace(a, false);
  a.resize(n / 2 + 1);
  return a;
}

std::vector<double> irfft(const std::vector<std::complex<double>>& half, size_t n) {
  std::vector<std::complex<double>> a(n);
  for (size_t i = 0; i < half.size(); ++i) a[i] = half[i];
  for (size_t i = 1; i + 1 < half.size(); ++i) a[n - i] = std::conj(half[i]);
  fft_inplace(a, true);
  std::vector<double> out(n);
  for (size_t i = 0; i < n; ++i) out[i] = a[i].real();
  return out;
}

size_t next_pow2(size_t v) {
  size_t p = 1;
  while (p < v) p <<= 1;
  return p;
}

// ---------------------------------------------------------------------------
// DIO pieces (mirroring emotts/audio/f0.py)
// ---------------------------------------------------------------------------

std::vector<double> nuttall(int n) {
  std::vector<double> w(n);
  for (int i = 0; i < n; ++i) {
    const double t = double(i) * 2.0 * kPi / double(n - 1);
    w[i] = 0.355768 - 0.487396 * std::cos(t) + 0.144232 * std::cos(2 * t) -
           0.012604 * std::cos(3 * t);
  }
  return w;
}

// low-pass filter the (precomputed) spectrum with a Nuttall FIR; group delay
// compensated.
std::vector<double> lowpass_filtered(
    const std::vector<std::complex<double>>& x_spec, size_t fft_size, double fs,
    double boundary_f0, size_t out_len) {
  const int half_avg = int(std::lround(fs / boundary_f0 / 2.0));
  const int filter_len = half_avg * 4;
  std::vector<double> lpf(fft_size, 0.0);
  const std::vector<double> w = nuttall(filter_len);
  std::copy(w.begin(), w.end(), lpf.begin());
  auto lpf_spec = rfft(lpf, fft_size);
  std::vector<std::complex<double>> prod(x_spec.size());
  for (size_t i = 0; i < x_spec.size(); ++i) prod[i] = x_spec[i] * lpf_spec[i];
  std::vector<double> y = irfft(prod, fft_size);
  std::vector<double> out(out_len, 0.0);
  const size_t shift = size_t(filter_len / 2);
  for (size_t i = 0; i < out_len && i + shift < y.size(); ++i)
    out[i] = y[i + shift];
  return out;
}

struct Events {
  std::vector<double> locations;  // seconds
  std::vector<double> f0s;        // 1 / interval
};

// negative-going zero crossings of sig
Events zero_crossings(const std::vector<double>& sig, double fs) {
  Events ev;
  std::vector<double> times;
  for (size_t i = 0; i + 1 < sig.size(); ++i) {
    if (sig[i] > 0.0 && sig[i + 1] <= 0.0) {
      const double frac = sig[i] / (sig[i] - sig[i + 1]);
      times.push_back((double(i) + frac) / fs);
    }
  }
  if (times.size() < 2) return ev;
  ev.locations.resize(times.size() - 1);
  ev.f0s.resize(times.size() - 1);
  for (size_t i = 0; i + 1 < times.size(); ++i) {
    const double interval = times[i + 1] - times[i];
    ev.locations[i] = (times[i] + times[i + 1]) / 2.0;
    ev.f0s[i] = 1.0 / std::max(interval, kEps);
  }
  return ev;
}

// linear interpolation with edge hold, zero outside the event span
void interp_to_frames(const Events& ev, const std::vector<double>& t,
                      std::vector<double>& out) {
  const size_t n = t.size();
  out.assign(n, 0.0);
  if (ev.locations.size() < 2) return;
  size_t j = 0;
  for (size_t i = 0; i < n; ++i) {
    const double ti = t[i];
    if (ti < ev.locations.front() || ti > ev.locations.back()) {
      out[i] = 0.0;
      continue;
    }
    while (j + 1 < ev.locations.size() && ev.locations[j + 1] < ti) ++j;
    const double x0 = ev.locations[j], x1 = ev.locations[j + 1];
    const double y0 = ev.f0s[j], y1 = ev.f0s[j + 1];
    out[i] = (x1 > x0) ? y0 + (y1 - y0) * (ti - x0) / (x1 - x0) : y0;
  }
}

void four_event_candidates(const std::vector<double>& filtered, double fs,
                           const std::vector<double>& t,
                           std::vector<double>& cand, std::vector<double>& score) {
  const size_t n = t.size();
  cand.assign(n, 0.0);
  score.assign(n, 1e30);

  std::vector<double> neg_sig = filtered;
  std::vector<double> pos_sig(filtered.size());
  for (size_t i = 0; i < filtered.size(); ++i) pos_sig[i] = -filtered[i];
  std::vector<double> diff(filtered.size() > 0 ? filtered.size() - 1 : 0);
  for (size_t i = 0; i + 1 < filtered.size(); ++i)
    diff[i] = filtered[i + 1] - filtered[i];
  std::vector<double> ndiff(diff.size());
  for (size_t i = 0; i < diff.size(); ++i) ndiff[i] = -diff[i];

  const Events evs[4] = {
      zero_crossings(neg_sig, fs), zero_crossings(pos_sig, fs),
      zero_crossings(diff, fs), zero_crossings(ndiff, fs)};
  std::vector<double> est[4];
  for (int k = 0; k < 4; ++k) {
    if (evs[k].locations.size() < 2) return;  // unusable band
    interp_to_frames(evs[k], t, est[k]);
  }
  for (size_t i = 0; i < n; ++i) {
    double mean = 0.0;
    bool ok = true;
    for (int k = 0; k < 4; ++k) {
      if (est[k][i] <= 0.0) ok = false;
      mean += est[k][i];
    }
    mean /= 4.0;
    double var = 0.0;
    for (int k = 0; k < 4; ++k) {
      const double d = est[k][i] - mean;
      var += d * d;
    }
    const double sd = std::sqrt(var / 3.0);  // ddof=1
    cand[i] = ok ? mean : 0.0;
    score[i] = ok ? sd : 1e30;
  }
}

void fix_step1(std::vector<double>& f0, double allowed_range) {
  std::vector<double> out = f0;
  for (size_t i = 0; i < f0.size(); ++i) {
    const double prev = (i == 0) ? f0[0] : f0[i - 1];
    const double rel = std::fabs(f0[i] - prev) / std::max(f0[i], kEps);
    if (rel > allowed_range && prev > 0.0) out[i] = 0.0;
  }
  f0.swap(out);
}

void fix_step2(std::vector<double>& f0, int min_frames) {
  const size_t n = f0.size();
  size_t i = 0;
  while (i < n) {
    if (f0[i] > 0.0) {
      size_t j = i;
      while (j < n && f0[j] > 0.0) ++j;
      if (int(j - i) < min_frames)
        for (size_t k = i; k < j; ++k) f0[k] = 0.0;
      i = j;
    } else {
      ++i;
    }
  }
}

void fix_step34(std::vector<double>& f0,
                const std::vector<std::vector<double>>& candidates,
                double allowed_range) {
  const int n = int(f0.size());
  const int bands = int(candidates.size());
  for (int direction : {1, -1}) {
    const int start = (direction == 1) ? 1 : n - 2;
    const int stop = (direction == 1) ? n : -1;
    for (int i = start; i != stop; i += direction) {
      if (f0[i] > 0.0 || f0[i - direction] <= 0.0) continue;
      const double ref = f0[i - direction];
      double best_err = 1e30, best_val = 0.0;
      for (int b = 0; b < bands; ++b) {
        const double c = candidates[b][i];
        if (c <= 0.0) continue;
        const double err = std::fabs(c - ref) / std::max(ref, kEps);
        if (err < best_err) {
          best_err = err;
          best_val = c;
        }
      }
      if (best_err < allowed_range) f0[i] = best_val;
    }
  }
}

// ---------------------------------------------------------------------------
// StoneMask refinement
// ---------------------------------------------------------------------------

double refine_once(const double* x, int64_t n, int fs, double t, double f0_init,
                   double f0_floor, double f0_ceil) {
  if (f0_init <= 0.0) return 0.0;
  const int half_win = int(1.5 * fs / f0_init + 0.5);
  const int win_len = 2 * half_win + 1;
  const int64_t center = int64_t(std::lround(t * fs));

  std::vector<double> seg(win_len), win(win_len), dwin(win_len);
  const double omega_w = 2.0 * kPi / (double(win_len) / fs);
  for (int i = 0; i < win_len; ++i) {
    int64_t idx = center - half_win + i;
    idx = std::max<int64_t>(0, std::min<int64_t>(n - 1, idx));
    seg[i] = x[idx];
    const double tw = double(i - half_win) / fs;
    win[i] = 0.42 + 0.5 * std::cos(omega_w * tw) + 0.08 * std::cos(2 * omega_w * tw);
    dwin[i] = -(0.5 * omega_w * std::sin(omega_w * tw) +
                0.16 * omega_w * std::sin(2 * omega_w * tw));
  }
  const size_t fft_size = next_pow2(size_t(win_len)) * 2;
  std::vector<double> a(win_len), b(win_len);
  for (int i = 0; i < win_len; ++i) {
    a[i] = seg[i] * win[i];
    b[i] = seg[i] * dwin[i];
  }
  auto main_spec = rfft(a, fft_size);
  auto diff_spec = rfft(b, fft_size);

  const int n_harmonics = std::min(int(fs / 2.0 / f0_init), 6);
  if (n_harmonics < 1) return 0.0;
  double num = 0.0, den = 0.0;
  for (int k = 1; k <= n_harmonics; ++k) {
    const int bin = int(std::lround(k * f0_init * double(fft_size) / fs));
    if (bin >= int(main_spec.size())) break;
    const double re = main_spec[bin].real(), im = main_spec[bin].imag();
    const double power = re * re + im * im;
    const double freq = double(bin) * fs / double(fft_size);
    const double inst_num = re * diff_spec[bin].imag() - im * diff_spec[bin].real();
    const double inst_freq = freq - inst_num / std::max(power, kEps) / (2.0 * kPi);
    const double amp = std::sqrt(power);
    num += inst_freq * amp / double(k);
    den += amp;
  }
  if (den <= kEps) return 0.0;
  const double refined = num / den;
  if (refined < f0_floor || refined > f0_ceil) return 0.0;
  return refined;
}

}  // namespace

extern "C" {

int64_t emotts_f0_num_frames(int64_t n, int fs, double frame_period) {
  return int64_t(double(n) / fs * 1000.0 / frame_period) + 1;
}

// DIO + StoneMask; writes up to max_frames values into f0_out.
// Returns the number of frames written, or -1 on error.
int64_t emotts_dio_stonemask(const double* x, int64_t n, int fs,
                             double frame_period, double f0_floor,
                             double f0_ceil, double channels_in_octave,
                             double allowed_range, double* f0_out,
                             int64_t max_frames) {
  const int64_t n_frames = emotts_f0_num_frames(n, fs, frame_period);
  if (n_frames > max_frames || fs <= 0) return -1;
  std::vector<double> t(n_frames);
  for (int64_t i = 0; i < n_frames; ++i) t[i] = double(i) * frame_period / 1000.0;
  if (n < 16) {
    std::fill(f0_out, f0_out + n_frames, 0.0);
    return n_frames;
  }

  const int num_bands =
      1 + int(std::log2(f0_ceil / f0_floor) * channels_in_octave);
  std::vector<double> boundary(num_bands);
  for (int i = 0; i < num_bands; ++i)
    boundary[i] = f0_floor * std::pow(2.0, double(i + 1) / channels_in_octave);

  const int max_filter_len = int(std::lround(double(fs) / boundary[0] / 2.0)) * 4;
  const size_t fft_size = next_pow2(size_t(n + max_filter_len + 1));

  double mean = 0.0;
  for (int64_t i = 0; i < n; ++i) mean += x[i];
  mean /= double(n);
  std::vector<double> xd(n);
  for (int64_t i = 0; i < n; ++i) xd[i] = x[i] - mean;
  auto x_spec = rfft(xd, fft_size);

  std::vector<std::vector<double>> candidates(num_bands),
      scores(num_bands);
  for (int b = 0; b < num_bands; ++b) {
    auto filtered = lowpass_filtered(x_spec, fft_size, fs, boundary[b], size_t(n));
    std::vector<double> cand, score;
    four_event_candidates(filtered, fs, t, cand, score);
    if (cand.empty()) {
      cand.assign(n_frames, 0.0);
      score.assign(n_frames, 1e30);
    }
    for (int64_t i = 0; i < n_frames; ++i) {
      const bool bad = cand[i] < boundary[b] / 2.0 || cand[i] > boundary[b] * 2.0 ||
                       cand[i] < f0_floor || cand[i] > f0_ceil;
      if (bad) {
        cand[i] = 0.0;
        score[i] = 1e30;
      } else {
        score[i] = score[i] / std::max(cand[i], kEps);
      }
      if (cand[i] <= 0.0) score[i] = 1e30;
    }
    candidates[b] = std::move(cand);
    scores[b] = std::move(score);
  }

  std::vector<double> base(n_frames, 0.0);
  for (int64_t i = 0; i < n_frames; ++i) {
    double best_score = 1e30, best_val = 0.0;
    for (int b = 0; b < num_bands; ++b) {
      if (scores[b][i] < best_score) {
        best_score = scores[b][i];
        best_val = candidates[b][i];
      }
    }
    base[i] = (best_score < 1e29) ? best_val : 0.0;
  }

  const int voice_range_minimum =
      int(0.5 + 1000.0 / frame_period / f0_floor) * 2 + 1;
  fix_step1(base, allowed_range);
  fix_step2(base, voice_range_minimum);
  fix_step34(base, candidates, allowed_range);

  // StoneMask refinement (applied twice, as in WORLD)
  for (int64_t i = 0; i < n_frames; ++i) {
    double f = base[i];
    if (f <= 0.0) {
      f0_out[i] = 0.0;
      continue;
    }
    const double r1 = refine_once(x, n, fs, t[i], f, f0_floor, f0_ceil);
    if (r1 <= 0.0) {
      f0_out[i] = 0.0;
      continue;
    }
    const double r2 = refine_once(x, n, fs, t[i], r1, f0_floor, f0_ceil);
    f0_out[i] = (r2 > 0.0) ? r2 : r1;
  }
  return n_frames;
}

}  // extern "C"

// CPU baseline for the WFM receive chain, written in the reference's
// implementation style: per-sample loops, ring-buffer resamplers, a phase
// table mixer, and FFT overlap-save filtering — the work a CPU port of
// radiorust's actor graph performs per chunk (see SURVEY.md §3.2 and
// /root/reference/examples/relm_app/simple_receiver.rs:14-71 for the chain;
// this is an independent C++ implementation, not a translation).
//
// The Tokio runtime pipelines blocks across cores (one task per block,
// capacity-1 channels), so steady-state throughput is bounded by the
// slowest stage, not the sum.  We therefore time each stage separately and
// report both the pipelined (max-stage) and single-thread (sum) rates; the
// benchmark harness uses the pipelined number as the baseline to beat.
//
// Build: g++ -O3 -march=native -o wfm_baseline wfm_baseline.cpp -lm

#include <algorithm>
#include <chrono>
#include <cmath>
#include <complex>
#include <cstdio>
#include <cstdint>
#include <cstdlib>
#include <vector>

using cf = std::complex<float>;
using cd = std::complex<double>;

// ---------------------------------------------------------------------------
// Mixed-radix (2/3) complex FFT, recursive Cooley-Tukey, f32.
// Handles the 12288 = 2^12 * 3 transforms the 6144-chunk filter needs.
// ---------------------------------------------------------------------------
struct Fft {
  int n;
  bool inverse;
  std::vector<cf> tw;  // twiddles e^{+-2pi i k / n}
  Fft(int n_, bool inv) : n(n_), inverse(inv), tw(n_) {
    double sign = inverse ? 1.0 : -1.0;
    for (int k = 0; k < n; k++) {
      double a = sign * 2.0 * M_PI * k / n;
      tw[k] = cf((float)std::cos(a), (float)std::sin(a));
    }
  }
  void run(const cf* in, cf* out, int stride, int len, int twstep) const {
    if (len == 1) { out[0] = in[0]; return; }
    int radix = (len % 2 == 0) ? 2 : 3;
    int sub = len / radix;
    for (int r = 0; r < radix; r++)
      run(in + r * stride, out + r * sub, stride * radix, sub,
          twstep * radix);
    if (radix == 2) {
      for (int k = 0; k < sub; k++) {
        cf a = out[k], b = out[k + sub] * tw[(size_t)k * twstep];
        out[k] = a + b;
        out[k + sub] = a - b;
      }
    } else {
      // radix-3 butterfly
      const cf w1 = tw[n / 3], w2 = tw[2 * (n / 3)];
      std::vector<cf> tmp(len);
      for (int k = 0; k < sub; k++) {
        cf a = out[k];
        cf b = out[k + sub] * tw[(size_t)k * twstep];
        cf c = out[k + 2 * sub] * tw[(size_t)2 * k * twstep];
        tmp[k] = a + b + c;
        tmp[k + sub] = a + b * w1 + c * w2;
        tmp[k + 2 * sub] = a + b * w2 + c * w1;
      }
      for (int k = 0; k < len; k++) out[k] = tmp[k];
    }
  }
  void operator()(const cf* in, cf* out) const { run(in, out, 1, n, 1); }
};

// ---------------------------------------------------------------------------
// DSP design helpers (float64, mirroring the reference's design math).
// ---------------------------------------------------------------------------
static double bessel_i0(double x) {
  double base = x * x / 4.0, addend = 1.0, sum = 1.0;
  for (int i = 1;; i++) {
    addend *= base / (double)(i * i);
    double old = sum;
    sum += addend;
    if (sum == old || !std::isfinite(sum)) break;
  }
  return sum;
}
static double kaiser(double beta, double x) {
  return bessel_i0(beta * std::sqrt(1.0 - x * x));
}
static double sinc(double x) {
  if (x == 0.0) return 1.0;
  double t = x * M_PI;
  return std::sin(t) / t;
}

static std::vector<float> design_resampler_ir(double in_rate, double out_rate,
                                              double bw, double quality) {
  double margin = (out_rate - bw) / 2.0;
  int L = (int)std::ceil(in_rate / margin * quality);
  double beta_n = (double)L * margin / in_rate;
  double beta = std::sqrt(beta_n * beta_n - 1.0);
  std::vector<double> ir(L);
  double energy = 0;
  for (int i = 0; i < L; i++) {
    double x = (i + 0.5) - L / 2.0;
    double y = sinc(x * out_rate / in_rate) * kaiser(beta, x * 2.0 / L);
    ir[i] = y;
    energy += y * y;
  }
  std::vector<float> out(L);
  double s = 1.0 / std::sqrt(energy);
  for (int i = 0; i < L; i++) out[i] = (float)(ir[i] * s);
  return out;
}

// ---------------------------------------------------------------------------
// Stages
// ---------------------------------------------------------------------------
struct FreqShifter {
  std::vector<cf> table;
  size_t idx = 0;
  FreqShifter(double rate, double shift, double precision = 1.0) {
    long denom = (long)std::llround(rate / precision);
    long numer = (long)std::llround((double)denom * shift / rate);
    table.resize(denom);
    long i = 0;
    for (long t = 0; t < denom; t++) {
      float a = (float)i / (float)denom * (float)(2.0 * M_PI);
      table[t] = cf(std::cos(a), std::sin(a));
      i = (i + numer) % denom;
    }
  }
  void process(const cf* in, cf* out, size_t n) {
    for (size_t k = 0; k < n; k++) {
      out[k] = in[k] * table[idx];
      if (++idx == table.size()) idx = 0;
    }
  }
};

struct Downsampler {
  std::vector<float> ir;
  std::vector<cf> ring;
  size_t rpos = 0;
  double pos = 0, in_rate, out_rate;
  Downsampler(double in_r, double out_r, double bw, double q = 3.0)
      : in_rate(in_r), out_rate(out_r) {
    ir = design_resampler_ir(in_r, out_r, bw, q);
    ring.assign(ir.size(), cf(0, 0));
  }
  size_t process(const cf* in, size_t n, cf* out) {
    size_t m = 0;
    size_t L = ir.size();
    for (size_t k = 0; k < n; k++) {
      ring[rpos] = in[k];
      if (++rpos == L) rpos = 0;
      pos += out_rate;
      if (pos >= in_rate) {
        pos -= in_rate;
        cf sum(0, 0);
        size_t j = 0;
        for (size_t i = rpos; i < L; i++) sum += ring[i] * ir[j++];
        for (size_t i = 0; i < rpos; i++) sum += ring[i] * ir[j++];
        out[m++] = sum;
      }
    }
    return m;
  }
};

struct OverlapSaveFilter {
  int n;
  Fft fwd, inv;
  std::vector<cf> resp2n, prev, buf, spec;
  bool primed = false;
  // freq_resp: gain at signed frequency f (hertz)
  template <class F>
  OverlapSaveFilter(int n_, double rate, F freq_resp)
      : n(n_), fwd(2 * n_, false), inv(2 * n_, true),
        resp2n(2 * n_), prev(n_), buf(2 * n_), spec(2 * n_) {
    // Design in f64: sample response, ifft, shift, Kaiser(null@2) window,
    // energy renormalize, pad, transform (cf src/blocks/filters.rs:184-239).
    std::vector<cd> resp(n);
    int maxb = (n - 1) / 2;
    for (int i = 0; i <= maxb; i++) {
      double f = (double)i * rate / n;
      resp[i] = freq_resp(i, f);
      if (i > 0) resp[n - i] = freq_resp(-i, -f);
    }
    // f64 inverse DFT (O(n log n) not needed at design time; reuse f32 FFT
    // would lose precision, so do a simple direct transform at design time
    // only if n is small; otherwise reuse the f32 FFT on doubles via two
    // passes. For benchmarking purposes the design cost is excluded anyway,
    // so use a direct O(n^2) DFT for exactness.
    std::vector<cd> ir(n);
    for (int t = 0; t < n; t++) {
      cd acc(0, 0);
      for (int k = 0; k < n; k++) {
        double a = 2.0 * M_PI * (double)k * t / n;
        acc += resp[k] * cd(std::cos(a), std::sin(a));
      }
      ir[t] = acc / (double)n;
    }
    std::rotate(ir.begin(), ir.begin() + n / 2, ir.end());
    double beta = std::sqrt(3.0), epre = 0, epost = 0;
    for (int i = 0; i < n; i++) epre += std::norm(ir[i]);
    for (int i = 0; i < n; i++) {
      double x = 2.0 * (i + 0.5) / n - 1.0;
      ir[i] *= kaiser(beta, x);
      epost += std::norm(ir[i]);
    }
    double s = std::sqrt(epre / epost);
    std::vector<cf> ext(2 * n, cf(0, 0));
    for (int i = 0; i < n; i++) ext[n + i] = (cf)(ir[i] * s);
    fwd(ext.data(), resp2n.data());
  }
  // in: n samples; out: n samples (zero-primed first chunk)
  void process(const cf* in, cf* out) {
    for (int i = 0; i < n; i++) buf[i] = prev[i];
    for (int i = 0; i < n; i++) buf[n + i] = in[i];
    fwd(buf.data(), spec.data());
    for (int i = 0; i < 2 * n; i++) spec[i] *= resp2n[i];
    inv(spec.data(), buf.data());
    float scale = 1.0f / (2 * n);
    for (int i = 0; i < n; i++) out[i] = buf[i] * scale;
    for (int i = 0; i < n; i++) prev[i] = in[i];
  }
};

struct FmDemod {
  float factor;
  cf prev{0, 0};
  float last = 0;
  bool have = false;
  FmDemod(double rate, double dev)
      : factor((float)(rate / dev / (2.0 * M_PI))) {}
  void process(const cf* in, cf* out, size_t n) {
    for (size_t k = 0; k < n; k++) {
      if (have) {
        cf p = in[k] * std::conj(prev);
        last = std::atan2(p.imag(), p.real()) * factor;
      }
      out[k] = cf(last, 0);
      prev = in[k];
      have = true;
    }
  }
};

struct Gain {
  float g;
  explicit Gain(float g_) : g(g_) {}
  void process(cf* x, size_t n) {
    for (size_t k = 0; k < n; k++) x[k] *= g;
  }
};

// ---------------------------------------------------------------------------
int main(int argc, char** argv) {
  const double rate = 1024000.0;
  const int chunk = 16384;
  int chunks = (argc > 1) ? atoi(argv[1]) : 320;  // ~5.2 Msamples

  FreqShifter shift(rate, 100000.0);
  Downsampler down1(rate, 384000.0, 200000.0);
  OverlapSaveFilter filt1(6144, 384000.0, [](int, double f) {
    return std::abs(f) <= 100000.0 ? cd(1, 0) : cd(0, 0);
  });
  FmDemod demod(384000.0, 150000.0);
  OverlapSaveFilter filt2(6144, 384000.0, [](int bin, double f) {
    if (std::abs(bin) >= 1 && std::abs(f) >= 20.0 && std::abs(f) <= 16000.0) {
      cd d(1.0, 50e-6 * 2.0 * M_PI * f);
      return cd(1, 0) / d;
    }
    return cd(0, 0);
  });
  Downsampler down2(384000.0, 48000.0, 40000.0);
  Gain vol(1.0f);

  std::vector<cf> in(chunk), a(chunk), b(chunk), c(chunk), d(chunk),
      e(chunk), f(chunk);
  // Synthetic FM-ish input.
  for (int i = 0; i < chunk; i++) {
    float ph = 0.3f * i;
    in[i] = cf(std::cos(ph), std::sin(ph));
  }

  double t_shift = 0, t_down1 = 0, t_filt1 = 0, t_demod = 0, t_filt2 = 0,
         t_down2 = 0, t_gain = 0;
  auto now = [] { return std::chrono::steady_clock::now(); };
  using dsec = std::chrono::duration<double>;

  size_t mid_total = 0;
  for (int it = 0; it < chunks; it++) {
    auto t0 = now();
    shift.process(in.data(), a.data(), chunk);
    auto t1 = now();
    size_t m = down1.process(a.data(), chunk, b.data());
    auto t2 = now();
    // m == 6144 every chunk for 1.024M -> 384k with chunk 16384
    filt1.process(b.data(), c.data());
    auto t3 = now();
    demod.process(c.data(), d.data(), m);
    auto t4 = now();
    filt2.process(d.data(), e.data());
    auto t5 = now();
    size_t m2 = down2.process(e.data(), m, f.data());
    auto t6 = now();
    vol.process(f.data(), m2);
    auto t7 = now();
    mid_total += m;
    t_shift += dsec(t1 - t0).count();
    t_down1 += dsec(t2 - t1).count();
    t_filt1 += dsec(t3 - t2).count();
    t_demod += dsec(t4 - t3).count();
    t_filt2 += dsec(t5 - t4).count();
    t_down2 += dsec(t6 - t5).count();
    t_gain += dsec(t7 - t6).count();
  }
  double total_in = (double)chunks * chunk;
  double stages[] = {t_shift, t_down1, t_filt1, t_demod,
                     t_filt2, t_down2, t_gain};
  double sum = 0, mx = 0;
  for (double s : stages) { sum += s; if (s > mx) mx = s; }
  printf("{\"input_samples\": %.0f, "
         "\"stage_seconds\": {\"shift\": %.4f, \"down1\": %.4f, "
         "\"filter1\": %.4f, \"demod\": %.4f, \"filter2\": %.4f, "
         "\"down2\": %.4f, \"gain\": %.4f}, "
         "\"serial_msps\": %.3f, \"pipelined_msps\": %.3f}\n",
         total_in, t_shift, t_down1, t_filt1, t_demod, t_filt2, t_down2,
         t_gain, total_in / sum / 1e6, total_in / mx / 1e6);
  return 0;
}

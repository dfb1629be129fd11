// CPU baseline for the 64-channel receiver (BASELINE.json config 5),
// written in the reference's implementation style: the construction the
// polyphase channelizer replaces is 64 independent
// FreqShifter -> Downsampler -> FmDemod chains all consuming the same
// wideband stream (cf /root/reference/examples/bandwidth_meter/main.rs:54-57
// for the per-channel pattern).  Independent C++ implementation sharing the
// stage designs with wfm_baseline.cpp (per-sample loops, phase-table mixer,
// windowed-sinc ring-buffer decimator).
//
// Throughput accounting: radiorust broadcasts a chunk to all consumers in
// lock-step (capacity-1 channel: the producer cannot advance until every
// channel chain consumed the chunk), so the SYSTEM's wideband input rate is
// bounded by ONE chain's rate even on an infinite-core machine.  With a
// task per block, one chain's steady-state rate is bounded by its slowest
// stage.  We report:
//   pipelined_msps     = chunk / max(stage time)     (infinite-core credit)
//   single_thread_msps = chunk / (64 x chain time)   (one core does all)
//
// Build: g++ -O3 -march=native -std=c++17 -o channelizer_baseline \
//            channelizer_baseline.cpp -lm

#include <chrono>
#include <cmath>
#include <complex>
#include <cstdio>
#include <cstdlib>
#include <vector>

using cf = std::complex<float>;

static double bessel_i0(double x) {
  double base = x * x / 4.0, addend = 1.0, sum = 1.0;
  for (int i = 1;; i++) {
    addend = addend * base / ((double)i * i);
    double old = sum;
    sum += addend;
    if (sum == old) break;
  }
  return sum;
}
static double kaiser(double beta, double x) {
  return bessel_i0(beta * std::sqrt(1.0 - x * x)) / bessel_i0(beta);
}
static double sinc(double x) {
  if (x == 0.0) return 1.0;
  double t = x * M_PI;
  return std::sin(t) / t;
}

// Windowed-sinc anti-alias FIR, the reference Downsampler's design
// (src/blocks/resampling.rs:82-101 semantics; independent implementation).
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

struct FreqShifter {
  std::vector<cf> table;
  size_t idx = 0;
  FreqShifter(double rate, double shift, double precision = 1.0) {
    long denom = (long)std::llround(rate / precision);
    long numer = (long)std::llround((double)denom * shift / rate);
    numer = ((numer % denom) + denom) % denom;
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

int main(int argc, char** argv) {
  // Matches models/channelizer.py::channelized_receiver(64, input 16.384M):
  // 64 channels of 256 kHz each, FM deviation 0.25 x channel rate.
  const double rate = 16384000.0;
  const int channels = 64;
  const double ch_rate = rate / channels;  // 256 kHz
  const int chunk = 65536;
  int chunks = (argc > 1) ? atoi(argv[1]) : 8;

  // One representative channel chain (all 64 have identical per-sample
  // cost; the mixer table differs only in contents).  Anti-alias bandwidth
  // 200 kHz inside the 256 kHz channel, quality 3 — the reference-default
  // design for this decimation (the PFB's 8-tap branches replace this
  // ~1700-tap FIR; that asymmetry is exactly the channelizer's win).
  FreqShifter shift(rate, -3.0 * ch_rate);  // tune channel 3 to baseband
  Downsampler down(rate, ch_rate, 200000.0);
  FmDemod demod(ch_rate, 0.25 * ch_rate);

  std::vector<cf> in(chunk), a(chunk), b(chunk), c(chunk);
  for (int i = 0; i < chunk; i++) {
    float ph = 0.3f * i;
    in[i] = cf(std::cos(ph), std::sin(ph));
  }

  auto now = [] { return std::chrono::steady_clock::now(); };
  using dsec = std::chrono::duration<double>;
  double t_shift = 0, t_down = 0, t_demod = 0;
  for (int it = 0; it < chunks; it++) {
    auto t0 = now();
    shift.process(in.data(), a.data(), chunk);
    auto t1 = now();
    size_t m = down.process(a.data(), chunk, b.data());
    auto t2 = now();
    demod.process(b.data(), c.data(), m);
    auto t3 = now();
    t_shift += dsec(t1 - t0).count();
    t_down += dsec(t2 - t1).count();
    t_demod += dsec(t3 - t2).count();
  }
  double total_in = (double)chunk * chunks;
  double slowest = std::max(t_shift, std::max(t_down, t_demod));
  double chain = t_shift + t_down + t_demod;
  double pipelined = total_in / slowest / 1e6;
  double single = total_in / (chain * channels) / 1e6;
  printf("{\"channelizer_pipelined_msps\": %.3f, "
         "\"channelizer_single_thread_msps\": %.3f, "
         "\"stage_ms_per_chunk\": {\"shift\": %.3f, \"down\": %.3f, "
         "\"demod\": %.3f}}\n",
         pipelined, single, t_shift / chunks * 1e3, t_down / chunks * 1e3,
         t_demod / chunks * 1e3);
  return 0;
}

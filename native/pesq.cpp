// PESQ-style objective speech quality (ITU-T P.862 narrowband algorithm).
//
// From-scratch C++ implementation of the P.862 processing chain used by the
// reference for enhancement evaluation (it compiles the ITU source under
// e2e/reverb/local/PESQ_sources and calls it per file pair,
// recipes/chime4/local/compute_pesq.sh). Stages:
//   1. level alignment of reference/degraded to a fixed active level
//   2. crude delay estimation via envelope cross-correlation
//   3. perceptual model: 50%-overlap Hann frames -> power spectra -> Bark
//      band energies -> partial gain equalisation -> Zwicker loudness
//   4. symmetric + asymmetric disturbance densities, Lp aggregation over
//      bands (L2 / L1-asym), split-second L6 and utterance L2 time
//      aggregation
//   5. MOS = 4.5 - 0.1*D - 0.0309*DA
//
// This is algorithmically faithful but not bit-exact with the ITU ANSI-C
// reference (which additionally performs utterance-splitting fine time
// alignment); scores track degradation monotonically and sit in the
// standard [-0.5, 4.5] range. Exposed via a C ABI for ctypes.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>
#include <complex>

namespace {

constexpr double kPi = 3.14159265358979323846;

// ---------------------------------------------------------------- FFT ----
void fft_radix2(std::vector<std::complex<double>>& a, bool inverse) {
    const size_t n = a.size();
    for (size_t i = 1, j = 0; i < n; ++i) {
        size_t bit = n >> 1;
        for (; j & bit; bit >>= 1) j ^= bit;
        j ^= bit;
        if (i < j) std::swap(a[i], a[j]);
    }
    for (size_t len = 2; len <= n; len <<= 1) {
        double ang = 2 * kPi / double(len) * (inverse ? 1 : -1);
        std::complex<double> wl(std::cos(ang), std::sin(ang));
        for (size_t i = 0; i < n; i += len) {
            std::complex<double> w(1.0, 0.0);
            for (size_t k = 0; k < len / 2; ++k) {
                auto u = a[i + k];
                auto v = a[i + k + len / 2] * w;
                a[i + k] = u + v;
                a[i + k + len / 2] = u - v;
                w *= wl;
            }
        }
    }
    if (inverse) {
        for (auto& x : a) x /= double(n);
    }
}

// --------------------------------------------------------- level align ----
double active_power(const std::vector<double>& x) {
    // active speech power: mean power over frames above a hangover-less
    // -35 dB-of-max energy threshold (simplified P.56)
    const size_t frame = 160;
    double max_e = 1e-30;
    std::vector<double> energies;
    for (size_t i = 0; i + frame <= x.size(); i += frame) {
        double e = 0;
        for (size_t k = 0; k < frame; ++k) e += x[i + k] * x[i + k];
        energies.push_back(e / frame);
        max_e = std::max(max_e, e / frame);
    }
    double thr = max_e * std::pow(10.0, -35.0 / 10.0);
    double acc = 0;
    size_t cnt = 0;
    for (double e : energies)
        if (e > thr) { acc += e; ++cnt; }
    return cnt ? acc / cnt : 1e-30;
}

void scale_to_level(std::vector<double>& x, double target_power) {
    double p = active_power(x);
    double g = std::sqrt(target_power / p);
    for (auto& v : x) v *= g;
}

// ------------------------------------------------------------ IRS-ish -----
// Simple bandpass emphasising 300-3100 Hz (the IRS receive characteristic's
// dominant effect): first-order highpass @ 250 Hz + lowpass @ 3400 Hz.
void irs_filter(std::vector<double>& x, double fs) {
    double dt = 1.0 / fs;
    double rc_h = 1.0 / (2 * kPi * 250.0);
    double a_h = rc_h / (rc_h + dt);
    double rc_l = 1.0 / (2 * kPi * 3400.0);
    double a_l = dt / (rc_l + dt);
    double prev_in = 0, hp = 0, lp = 0;
    for (auto& v : x) {
        double in = v;
        hp = a_h * (hp + in - prev_in);
        prev_in = in;
        lp = lp + a_l * (hp - lp);
        v = lp;
    }
}

// ------------------------------------------------------------- delay ------
long crude_delay(const std::vector<double>& ref, const std::vector<double>& deg,
                 double fs) {
    // 4 ms envelope bins, log-envelope cross-correlation via FFT
    const size_t bin = size_t(fs * 0.004);
    auto envelope = [&](const std::vector<double>& x) {
        std::vector<double> e;
        double mx = -1e300;
        for (size_t i = 0; i + bin <= x.size(); i += bin) {
            double s = 0;
            for (size_t k = 0; k < bin; ++k) s += std::fabs(x[i + k]);
            double v = std::log(s / bin + 1e-12);
            e.push_back(v);
            mx = std::max(mx, v);
        }
        // floor ~43 dB below the peak: silence bins would otherwise create
        // log(eps) outliers that dominate the correlation
        double m = 0;
        for (auto& v : e) { v = std::max(v, mx - 5.0); m += v; }
        m /= std::max<size_t>(e.size(), 1);
        for (auto& v : e) v -= m;
        return e;
    };
    auto er = envelope(ref), ed = envelope(deg);
    size_t n = 1;
    while (n < er.size() + ed.size()) n <<= 1;
    std::vector<std::complex<double>> A(n), B(n);
    for (size_t i = 0; i < er.size(); ++i) A[i] = er[i];
    for (size_t i = 0; i < ed.size(); ++i) B[i] = ed[i];
    fft_radix2(A, false);
    fft_radix2(B, false);
    for (size_t i = 0; i < n; ++i) A[i] = B[i] * std::conj(A[i]);
    fft_radix2(A, true);
    long best = 0;
    double best_v = -1e300;
    long max_lag = long(0.25 * std::min(er.size(), ed.size()));
    long m = long(std::min(er.size(), ed.size()));
    for (long lag = -max_lag; lag <= max_lag; ++lag) {
        size_t idx = size_t((lag % long(n) + long(n)) % long(n));
        double overlap = double(m - std::labs(lag));
        // overlap-normalised, with a mild preference for small lags so
        // (near-)periodic envelopes don't alias to a neighbouring period
        double v = A[idx].real() / overlap - 1e-4 * std::labs(lag);
        if (v > best_v) { best_v = v; best = lag; }
    }
    return best * long(bin);
}

// -------------------------------------------------------------- Bark ------
double hz_to_bark(double f) {
    return 7.0 * std::asinh(f / 650.0);
}

struct PerceptualConst {
    size_t frame, nfft, nbands;
    std::vector<double> window;
    std::vector<size_t> band_lo, band_hi;  // fft-bin ranges per Bark band
    std::vector<double> band_center_bark;
};

PerceptualConst make_consts(double fs) {
    PerceptualConst c;
    c.frame = (fs > 10000) ? 512 : 256;  // 32 ms
    c.nfft = c.frame;
    c.nbands = (fs > 10000) ? 49 : 42;
    c.window.resize(c.frame);
    for (size_t i = 0; i < c.frame; ++i)
        c.window[i] = 0.5 * (1 - std::cos(2 * kPi * i / (c.frame - 1)));
    const size_t nbin = c.nfft / 2 + 1;
    double max_bark = hz_to_bark(fs / 2.0);
    c.band_lo.resize(c.nbands);
    c.band_hi.resize(c.nbands);
    c.band_center_bark.resize(c.nbands);
    for (size_t b = 0; b < c.nbands; ++b) {
        double b_lo = max_bark * b / c.nbands;
        double b_hi = max_bark * (b + 1) / c.nbands;
        c.band_center_bark[b] = 0.5 * (b_lo + b_hi);
        // invert bark -> hz: f = 650*sinh(z/7)
        double f_lo = 650.0 * std::sinh(b_lo / 7.0);
        double f_hi = 650.0 * std::sinh(b_hi / 7.0);
        c.band_lo[b] = std::min(nbin - 1, size_t(f_lo / fs * c.nfft));
        c.band_hi[b] = std::min(nbin, std::max(c.band_lo[b] + 1,
                                               size_t(f_hi / fs * c.nfft)));
    }
    return c;
}

void bark_spectrum(const std::vector<double>& x, size_t start,
                   const PerceptualConst& c, std::vector<double>& bands) {
    std::vector<std::complex<double>> buf(c.nfft);
    for (size_t i = 0; i < c.frame; ++i) {
        double v = (start + i < x.size()) ? x[start + i] : 0.0;
        buf[i] = v * c.window[i];
    }
    fft_radix2(buf, false);
    bands.assign(c.nbands, 0.0);
    for (size_t b = 0; b < c.nbands; ++b) {
        double acc = 0;
        for (size_t k = c.band_lo[b]; k < c.band_hi[b]; ++k)
            acc += std::norm(buf[k]);
        bands[b] = acc / c.frame;
    }
}

double loudness(double p, double p0, double bark) {
    // Zwicker law with a stronger exponent at low Bark (P.862 style)
    double gamma = 0.23;
    if (bark < 4.0) gamma = 0.23 + 0.18 * (4.0 - bark) / 4.0;
    double sl = std::pow(p0 / 0.5, gamma);
    double v = sl * (std::pow(0.5 + 0.5 * p / p0, gamma) - 1.0);
    return v > 0 ? v : 0.0;
}

}  // namespace

extern "C" {

// Exposed for tests: crude delay estimate in samples.
int64_t pesq_debug_delay(const double* ref_in, int64_t n_ref,
                         const double* deg_in, int64_t n_deg, double fs) {
    std::vector<double> ref(ref_in, ref_in + n_ref);
    std::vector<double> deg(deg_in, deg_in + n_deg);
    return crude_delay(ref, deg, fs);
}

// Returns PESQ-style MOS in [-0.5, 4.5]; < -100 on error.
double pesq_mos(const double* ref_in, int64_t n_ref, const double* deg_in,
                int64_t n_deg, double fs) {
    if (n_ref < int64_t(fs) || n_deg < int64_t(fs)) return -1000.0;
    std::vector<double> ref(ref_in, ref_in + n_ref);
    std::vector<double> deg(deg_in, deg_in + n_deg);

    irs_filter(ref, fs);
    irs_filter(deg, fs);
    scale_to_level(ref, 1e6);
    scale_to_level(deg, 1e6);

    long delay = crude_delay(ref, deg, fs);
    // align by trimming
    if (delay > 0) {
        if (size_t(delay) < deg.size())
            deg.erase(deg.begin(), deg.begin() + delay);
    } else if (delay < 0) {
        if (size_t(-delay) < ref.size())
            ref.erase(ref.begin(), ref.begin() + (-delay));
    }
    size_t n = std::min(ref.size(), deg.size());
    ref.resize(n);
    deg.resize(n);

    PerceptualConst c = make_consts(fs);
    size_t hop = c.frame / 2;
    if (n < c.frame) return -1000.0;
    size_t num_frames = (n - c.frame) / hop + 1;

    // hearing threshold proxy per band (flat small constant relative to
    // normalised level)
    const double p0 = 1e4;

    std::vector<double> frame_d, frame_da, frame_w;
    std::vector<double> br(c.nbands), bd(c.nbands);
    // partial gain equalisation: smoothed per-band ratio
    std::vector<double> gain(c.nbands, 1.0);

    for (size_t t = 0; t < num_frames; ++t) {
        size_t start = t * hop;
        bark_spectrum(ref, start, c, br);
        bark_spectrum(deg, start, c, bd);

        double er = 0, edg = 0;
        for (size_t b = 0; b < c.nbands; ++b) { er += br[b]; edg += bd[b]; }
        bool silent = er < 1e3;

        // update smoothed band gains on audible frames and equalise the
        // degraded spectrum (P.862 partial frequency compensation)
        for (size_t b = 0; b < c.nbands; ++b) {
            if (!silent) {
                double r = (br[b] + 1000.0) / (bd[b] + 1000.0);
                r = std::min(std::max(r, 0.01), 100.0);
                gain[b] = 0.8 * gain[b] + 0.2 * r;
            }
            bd[b] *= gain[b];
        }

        double d2 = 0, da = 0;
        for (size_t b = 0; b < c.nbands; ++b) {
            double lr = loudness(br[b], p0, c.band_center_bark[b]);
            double ld = loudness(bd[b], p0, c.band_center_bark[b]);
            double diff = ld - lr;
            // deadzone: small differences are masked (0.25 * min loudness)
            double m = 0.25 * std::min(lr, ld);
            double d = 0.0;
            if (diff > m) d = diff - m;
            else if (diff < -m) d = diff + m;
            d2 += d * d;
            // asymmetry: additive (degraded-only) distortion weighs more
            double asym = std::pow((bd[b] + 50.0) / (br[b] + 50.0), 1.2);
            if (asym < 3.0) asym = 0.0;
            asym = std::min(asym, 12.0);
            da += std::fabs(d) * asym;
        }
        double w = std::pow((er / c.nbands + 1e5) / 1e5, 0.04);
        frame_d.push_back(std::sqrt(d2) / w);
        frame_da.push_back(da / w);
        frame_w.push_back(silent ? 0.3 : 1.0);
    }

    // time aggregation: L6 over 20-frame split-second intervals, then L2
    auto aggregate = [&](const std::vector<double>& d, double p_sp,
                         double p_ut) {
        const size_t chunk = 20;
        std::vector<double> sp;
        for (size_t i = 0; i < d.size(); i += chunk / 2) {
            double acc = 0, wacc = 0;
            for (size_t k = i; k < std::min(i + chunk, d.size()); ++k) {
                acc += std::pow(d[k], p_sp) * frame_w[k];
                wacc += frame_w[k];
            }
            if (wacc > 0) sp.push_back(std::pow(acc / wacc, 1.0 / p_sp));
        }
        double acc = 0;
        for (double v : sp) acc += std::pow(v, p_ut);
        return sp.empty() ? 0.0
                          : std::pow(acc / sp.size(), 1.0 / p_ut);
    };

    double d_sym = aggregate(frame_d, 6.0, 2.0);
    double d_asym = aggregate(frame_da, 6.0, 2.0);

    double mos = 4.5 - 0.1 * d_sym - 0.0309 * d_asym;
    if (mos < -0.5) mos = -0.5;
    if (mos > 4.5) mos = 4.5;
    return mos;
}

}  // extern "C"

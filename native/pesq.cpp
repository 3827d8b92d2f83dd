// PESQ — ITU-T P.862 objective speech-quality measure, C++ implementation.
//
// The reference toolkit compiles the ITU ANSI-C sources
// (e2e/reverb/local/PESQ_sources/P862/Software/source/, 4k LoC) and shells
// out to the binary per file pair (recipes/chime4/local/compute_pesq.sh:9).
// This is an independent C++ implementation of the P.862 algorithm — level
// normalisation, IRS receive filtering, voice-activity detection, crude +
// per-utterance fine time alignment with utterance splitting, the Bark/
// Zwicker perceptual model with bad-interval realignment, and the
// disturbance aggregation to MOS — validated against the compiled ITU
// binary on the P.862 conformance wav set (tests/test_native.py asserts
// golden MOS agreement). Numeric constants (Bark band layout, thresholds,
// input-filter sections) are the Recommendation's published tables
// (native/pesq_tables.h).
//
// Exposed via a C ABI for ctypes (speech_recognition_tools_tpu/io/native.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#include "pesq_tables.h"

namespace {

constexpr double kTwoPi = 6.28318530717959;
constexpr long kSearchBuffer = 75;      // alignment guard, in VAD windows
constexpr long kPadMsecs = 320;         // zero padding appended, in ms
constexpr long kMaxUtts = 50;
constexpr long kMinUttLength = 50;      // in VAD windows
constexpr long kMinSpeechLen = 4;
constexpr long kJoinSpeechLen = 50;

// ------------------------------------------------------------------ FFT --
// Float32 iterative radix-2 complex FFT (the P.862 pipeline is specified
// in single precision; conformance tracks the ITU binary's rounding).
void cfft(std::vector<float>& re, std::vector<float>& im, bool inverse) {
    const size_t n = re.size();
    for (size_t i = 1, j = 0; i < n; ++i) {
        size_t bit = n >> 1;
        for (; j & bit; bit >>= 1) j ^= bit;
        j ^= bit;
        if (i < j) {
            std::swap(re[i], re[j]);
            std::swap(im[i], im[j]);
        }
    }
    for (size_t len = 2; len <= n; len <<= 1) {
        const double ang = kTwoPi / double(len) * (inverse ? 1.0 : -1.0);
        const float wr = float(std::cos(ang)), wi = float(std::sin(ang));
        for (size_t base = 0; base < n; base += len) {
            float cr = 1.0f, ci = 0.0f;
            for (size_t k = 0; k < len / 2; ++k) {
                const size_t a = base + k, b = base + k + len / 2;
                const float tr = re[b] * cr - im[b] * ci;
                const float ti = re[b] * ci + im[b] * cr;
                re[b] = re[a] - tr;
                im[b] = im[a] - ti;
                re[a] += tr;
                im[a] += ti;
                const float ncr = cr * wr - ci * wi;
                ci = cr * wi + ci * wr;
                cr = ncr;
            }
        }
    }
    if (inverse) {
        const float inv = 1.0f / float(n);
        for (size_t i = 0; i < n; ++i) {
            re[i] *= inv;
            im[i] *= inv;
        }
    }
}

// Real FFT into interleaved [re0, im0, re1, im1, ...] halfspectrum layout
// (N/2+1 bins), matching how the rest of the pipeline indexes spectra.
void real_fft(float* x, long n) {
    std::vector<float> re(n), im(n, 0.0f);
    std::copy(x, x + n, re.begin());
    cfft(re, im, false);
    for (long k = 0; k <= n / 2; ++k) {
        x[2 * k] = re[k];
        x[2 * k + 1] = im[k];
    }
}

void real_ifft(float* x, long n) {
    std::vector<float> re(n), im(n);
    for (long k = 0; k <= n / 2; ++k) {
        re[k] = x[2 * k];
        im[k] = x[2 * k + 1];
    }
    for (long k = n / 2 + 1; k < n; ++k) {
        re[k] = x[2 * (n - k)];
        im[k] = -x[2 * (n - k) + 1];
    }
    cfft(re, im, true);
    for (long i = 0; i < n; ++i) x[i] = re[i];
}

long next_pow2(long x) {
    long c = 1;
    while (c < x) c <<= 1;
    return c;
}

// Cross-correlation of x1 (reversed) with x2 via pow2 FFT; writes
// n1 + n2 - 1 values.
void fft_xcorr(const float* x1, long n1, const float* x2, long n2,
               float* y) {
    const long nx = 2 * next_pow2(std::max(n1, n2));
    std::vector<float> a(nx + 2, 0.0f), b(nx + 2, 0.0f);
    for (long i = 0; i < n1; ++i) a[n1 - 1 - i] = x1[i];
    for (long i = 0; i < n2; ++i) b[i] = x2[i];
    real_fft(a.data(), nx);
    real_fft(b.data(), nx);
    for (long k = 0; k <= nx / 2; ++k) {
        const float r = a[2 * k], im = a[2 * k + 1];
        a[2 * k] = r * b[2 * k] - im * b[2 * k + 1];
        a[2 * k + 1] = r * b[2 * k + 1] + im * b[2 * k];
    }
    real_ifft(a.data(), nx);
    std::copy(a.begin(), a.begin() + (n1 + n2 - 1), y);
}

// ------------------------------------------------------------- filters --
void iir_sos_chain(const float* sos, long nsos, float* x, long n) {
    for (long s = 0; s < nsos; ++s) {
        const float b0 = sos[5 * s], b1 = sos[5 * s + 1], b2 = sos[5 * s + 2];
        const float a1 = sos[5 * s + 3], a2 = sos[5 * s + 4];
        float z1 = 0.0f, z2 = 0.0f;
        for (long i = 0; i < n; ++i) {
            const float z0 = x[i] - a1 * z1 - a2 * z2;
            x[i] = b0 * z0 + b1 * z1 + b2 * z2;
            z2 = z1;
            z1 = z0;
        }
    }
}

float interp_db_curve(float freq, const double (*curve)[2], int npts) {
    int hi = 1;
    if (freq > curve[0][0]) {
        while (hi < npts - 1 && curve[hi][0] < freq) ++hi;
    }
    const double f0 = curve[hi - 1][0], g0 = curve[hi - 1][1];
    const double f1 = curve[hi][0], g1 = curve[hi][1];
    return float(((freq - f0) * g1 + (f1 - freq) * g0) / (f1 - f0));
}

// P.862 receive-characteristic curves: band-limit for level alignment and
// the standard IRS receive response (published Recommendation data).
const double kAlignFilterDb[26][2] = {
    {0., -500}, {50., -500}, {100., -500}, {125., -500}, {160., -500},
    {200., -500}, {250., -500}, {300., -500}, {350., 0}, {400., 0},
    {500., 0}, {600., 0}, {630., 0}, {800., 0}, {1000., 0}, {1250., 0},
    {1600., 0}, {2000., 0}, {2500., 0}, {3000., 0}, {3250., 0},
    {3500., -500}, {4000., -500}, {5000., -500}, {6300., -500},
    {8000., -500}};

const double kIrsFilterDb[26][2] = {
    {0., -200}, {50., -40}, {100., -20}, {125., -12}, {160., -6},
    {200., 0}, {250., 4}, {300., 6}, {350., 8}, {400., 10}, {500., 11},
    {600., 12}, {700., 12}, {800., 12}, {1000., 12}, {1300., 12},
    {1600., 12}, {2000., 12}, {2500., 12}, {3000., 12}, {3250., 12},
    {3500., 4}, {4000., -200}, {5000., -200}, {6300., -200},
    {8000., -200}};

// ------------------------------------------------------------- context --
struct Signal {
    std::vector<float> data;   // [guard zeros | samples | guard + pad zeros]
    std::vector<float> vad;
    std::vector<float> log_vad;
    long nsamples = 0;         // raw samples + 2 * guard
};

struct Rate {
    long fs;
    long downsample;
    long align_nfft;
    long in_nsos;
    const float* in_sos;
    int nb;
    float sp, sl;
    const int* bands_per_bark;
    const double* centre_bark;
    const double* width_bark;
    const double* pow_corr;
    const double* abs_thresh;
};

struct Align {
    long nutts = 0;
    long crude_delay = 0;
    long search_start[kMaxUtts + 1];
    long search_end[kMaxUtts + 1];
    long delay_est[kMaxUtts + 1];
    long delay[kMaxUtts + 1];
    float delay_conf[kMaxUtts + 1];
    long utt_start[kMaxUtts + 1];
    long utt_end[kMaxUtts + 1];
};

Rate make_rate(long fs) {
    Rate r{};
    r.fs = fs;
    if (fs == 8000) {
        r.downsample = 32;
        r.align_nfft = 512;
        r.in_nsos = 8;
        r.in_sos = p862::InIIR_Hsos_8k;
        r.nb = 42;
        r.sp = 2.764344e-5f;
        r.sl = 1.866055e-1f;
        r.bands_per_bark = p862::nr_of_hz_bands_per_bark_band_8k;
        r.centre_bark = p862::centre_of_band_bark_8k;
        r.width_bark = p862::width_of_band_bark_8k;
        r.pow_corr = p862::pow_dens_correction_factor_8k;
        r.abs_thresh = p862::abs_thresh_power_8k;
    } else {
        r.downsample = 64;
        r.align_nfft = 1024;
        r.in_nsos = 12;
        r.in_sos = p862::InIIR_Hsos_16k;
        r.nb = 49;
        r.sp = 6.910853e-6f;
        r.sl = 1.866055e-1f;
        r.bands_per_bark = p862::nr_of_hz_bands_per_bark_band_16k;
        r.centre_bark = p862::centre_of_band_bark_16k;
        r.width_bark = p862::width_of_band_bark_16k;
        r.pow_corr = p862::pow_dens_correction_factor_16k;
        r.abs_thresh = p862::abs_thresh_power_16k;
    }
    return r;
}

long pad_samples(const Rate& r) { return kPadMsecs * (r.fs / 1000); }
long guard(const Rate& r) { return kSearchBuffer * r.downsample; }

double mean_power(const float* x, long start, long stop, long divisor) {
    double p = 0;
    for (long i = start; i < stop; ++i) p += double(x[i]) * x[i];
    return p / divisor;
}

// Frequency-domain filtering by a piecewise-linear dB response, applied to
// the active section (guard..end+pad), gain-referenced to 1 kHz.
void apply_db_filter(const Rate& r, float* data, long nsamples,
                     const double (*curve)[2]) {
    const long n = nsamples - 2 * guard(r) + pad_samples(r);
    const long np2 = next_pow2(n);
    std::vector<float> x(np2 + 2, 0.0f);
    std::copy(data + guard(r), data + guard(r) + n, x.begin());
    real_fft(x.data(), np2);
    const float gain1k = interp_db_curve(1000.0f, curve, 26);
    const float fres = float(r.fs) / float(np2);
    for (long k = 0; k <= np2 / 2; ++k) {
        const float db = interp_db_curve(k * fres, curve, 26) - gain1k;
        const float g = std::pow(10.0f, db / 20.0f);
        x[2 * k] *= g;
        x[2 * k + 1] *= g;
    }
    real_ifft(x.data(), np2);
    std::copy(x.begin(), x.begin() + n, data + guard(r));
}

void fix_power_level(const Rate& r, Signal& s, long max_nsamples) {
    const long n = s.nsamples;
    std::vector<float> filtered(s.data.begin(),
                                s.data.begin() + n + pad_samples(r));
    apply_db_filter(r, filtered.data(), n, kAlignFilterDb);
    const double p = mean_power(
        filtered.data(), guard(r), n - guard(r) + pad_samples(r),
        max_nsamples - 2 * guard(r) + pad_samples(r));
    const float scale = float(std::sqrt(1e7 / p));
    for (long i = 0; i < n; ++i) s.data[i] *= scale;
}

void dc_block_and_input_filter(const Rate& r, Signal& s) {
    const long ofs = guard(r);
    float* d = s.data.data();
    // remove DC over the active section, taper the section edges
    float acc = 0.0f;
    for (long i = ofs; i < s.nsamples - ofs; ++i) acc += d[i];
    acc /= s.nsamples;
    for (long i = ofs; i < s.nsamples - ofs; ++i) d[i] -= acc;
    for (long i = 0; i < r.downsample; ++i)
        d[ofs + i] *= (0.5f + i) / r.downsample;
    for (long i = 0; i < r.downsample; ++i)
        d[s.nsamples - ofs - 1 - i] *= (0.5f + i) / r.downsample;
    iir_sos_chain(r.in_sos, r.in_nsos, d, s.nsamples + pad_samples(r));
}

// --------------------------------------------------------------- VAD ----
void compute_vad(const Rate& r, Signal& s) {
    const long nwin = s.nsamples / r.downsample;
    s.vad.assign(nwin, 0.0f);
    s.log_vad.assign(nwin, 0.0f);
    float* vad = s.vad.data();
    for (long w = 0; w < nwin; ++w) {
        float e = 0.0f;
        for (long i = 0; i < r.downsample; ++i) {
            const float g = s.data[w * r.downsample + i];
            e += g * g;
        }
        vad[w] = e / r.downsample;
    }
    float thresh = 0.0f;
    for (long w = 0; w < nwin; ++w) thresh += vad[w];
    thresh /= nwin;

    float level_min = 0.0f;
    for (long w = 0; w < nwin; ++w) level_min = std::max(level_min, vad[w]);
    level_min = level_min > 0.0f ? level_min * 1e-4f : 1.0f;
    for (long w = 0; w < nwin; ++w)
        if (vad[w] < level_min) vad[w] = level_min;

    float level_noise = 0.0f;
    for (int it = 0; it < 12; ++it) {
        level_noise = 0.0f;
        float std_noise = 0.0f;
        long cnt = 0;
        for (long w = 0; w < nwin; ++w)
            if (vad[w] <= thresh) {
                level_noise += vad[w];
                ++cnt;
            }
        if (cnt > 0) {
            level_noise /= cnt;
            for (long w = 0; w < nwin; ++w)
                if (vad[w] <= thresh) {
                    const float g = vad[w] - level_noise;
                    std_noise += g * g;
                }
            std_noise = std::sqrt(std_noise / cnt);
        }
        thresh = 1.001f * (level_noise + 2.0f * std_noise);
    }

    level_noise = 0.0f;
    float level_sig = 0.0f;
    long cnt = 0;
    for (long w = 0; w < nwin; ++w) {
        if (vad[w] > thresh) {
            level_sig += vad[w];
            ++cnt;
        } else {
            level_noise += vad[w];
        }
    }
    if (cnt > 0)
        level_sig /= cnt;
    else
        thresh = -1.0f;
    if (cnt < nwin)
        level_noise /= (nwin - cnt);
    else
        level_noise = 1.0f;

    for (long w = 0; w < nwin; ++w)
        if (vad[w] <= thresh) vad[w] = -vad[w];
    vad[0] = -level_min;
    vad[nwin - 1] = -level_min;

    // drop too-short speech bursts
    long start = 0, finish = 0;
    for (long w = 1; w < nwin; ++w) {
        if (vad[w] > 0.0f && vad[w - 1] <= 0.0f) start = w;
        if (vad[w] <= 0.0f && vad[w - 1] > 0.0f) {
            finish = w;
            if (finish - start <= kMinSpeechLen)
                for (long i = start; i < finish; ++i) vad[i] = -vad[i];
        }
    }

    // at very high SNR, drop low-energy bursts too
    if (level_sig >= level_noise * 1000.0f) {
        for (long w = 1; w < nwin; ++w) {
            if (vad[w] > 0.0f && vad[w - 1] <= 0.0f) start = w;
            if (vad[w] <= 0.0f && vad[w - 1] > 0.0f) {
                finish = w;
                float g = 0.0f;
                for (long i = start; i < finish; ++i) g += vad[i];
                if (g < 3.0f * thresh * (finish - start))
                    for (long i = start; i < finish; ++i) vad[i] = -vad[i];
            }
        }
    }

    // bridge short gaps between bursts
    start = finish = 0;
    for (long w = 1; w < nwin; ++w) {
        if (vad[w] > 0.0f && vad[w - 1] <= 0.0f) {
            start = w;
            if (finish > 0 && start - finish <= kJoinSpeechLen)
                for (long i = finish; i < start; ++i) vad[i] = level_min;
        }
        if (vad[w] <= 0.0f && vad[w - 1] > 0.0f) finish = w;
    }

    // no speech at all: undo the sign-marking
    start = 0;
    for (long w = 1; w < nwin; ++w)
        if (vad[w] > 0.0f && vad[w - 1] <= 0.0f) start = w;
    if (start == 0) {
        for (long w = 0; w < nwin; ++w) vad[w] = std::fabs(vad[w]);
        vad[0] = -level_min;
        vad[nwin - 1] = -level_min;
    }

    // soft onset/offset ramps
    long w = 3;
    while (w < nwin - 2) {
        if (vad[w] > 0.0f && vad[w - 2] <= 0.0f) {
            vad[w - 2] = vad[w] * 0.1f;
            vad[w - 1] = vad[w] * 0.3f;
            ++w;
        }
        if (vad[w] <= 0.0f && vad[w - 1] > 0.0f) {
            vad[w] = vad[w - 1] * 0.3f;
            vad[w + 1] = vad[w - 1] * 0.1f;
            w += 3;
        }
        ++w;
    }

    for (long i = 0; i < nwin; ++i)
        if (vad[i] < 0.0f) vad[i] = 0.0f;
    if (thresh <= 0.0f) thresh = level_min;
    for (long i = 0; i < nwin; ++i)
        s.log_vad[i] = vad[i] <= thresh ? 0.0f : std::log(vad[i] / thresh);
}

// --------------------------------------------------------- alignment ----
// Crude alignment on logVAD profiles. utt_id: -1 = whole signal,
// kMaxUtts = the scratch slot used by split_align, else a real utterance.
void crude_align(const Rate& r, const Signal& ref, const Signal& deg,
                 Align& al, long utt_id) {
    long nr, nd, startr, startd;
    if (utt_id == -1) {
        nr = ref.nsamples / r.downsample;
        nd = deg.nsamples / r.downsample;
        startr = startd = 0;
    } else if (utt_id == kMaxUtts) {
        startr = al.search_start[kMaxUtts - 1];
        startd = startr + al.delay_est[kMaxUtts - 1] / r.downsample;
        if (startd < 0) {
            startr = -al.delay_est[kMaxUtts - 1] / r.downsample;
            startd = 0;
        }
        nr = al.search_end[kMaxUtts - 1] - startr;
        nd = nr;
        if (startd + nd > deg.nsamples / r.downsample)
            nd = deg.nsamples / r.downsample - startd;
    } else {
        startr = al.search_start[utt_id];
        startd = startr + al.crude_delay / r.downsample;
        if (startd < 0) {
            startr = -al.crude_delay / r.downsample;
            startd = 0;
        }
        nr = al.search_end[utt_id] - startr;
        nd = nr;
        if (startd + nd > deg.nsamples / r.downsample)
            nd = deg.nsamples / r.downsample - startd;
    }

    float best = 0.0f;
    long imax = nr - 1;
    if (nr > 1 && nd > 1) {
        std::vector<float> y(nr + nd - 1);
        fft_xcorr(ref.log_vad.data() + startr, nr,
                  deg.log_vad.data() + startd, nd, y.data());
        for (long i = 0; i < nr + nd - 1; ++i)
            if (y[i] > best) {
                best = y[i];
                imax = i;
            }
    }
    if (utt_id == -1) {
        al.crude_delay = (imax - nr + 1) * r.downsample;
    } else if (utt_id == kMaxUtts) {
        al.delay[kMaxUtts - 1] =
            (imax - nr + 1) * r.downsample + al.delay_est[kMaxUtts - 1];
    } else {
        al.delay_est[utt_id] =
            (imax - nr + 1) * r.downsample + al.crude_delay;
    }
}

// Shared inner step of the fine alignment: Hann-windowed frame
// cross-correlation, thresholded at 0.99 of the frame peak, votes
// accumulated into a circular delay histogram. With kernel > 0 the votes
// are triangularly smeared (split_align form); kernel == 0 accumulates
// raw votes which are smoothed afterwards (time_align form).
struct DelayHist {
    std::vector<float> h;
    float hsum = 0.0f;
    explicit DelayHist(long n) : h(n, 0.0f) {}
};

void accumulate_frames(const Rate& r, const Signal& ref, const Signal& deg,
                       const std::vector<float>& window, long& startr,
                       long& startd, long limitr, bool forward,
                       long kernel, DelayHist& hist) {
    const long nfft = r.align_nfft;
    std::vector<float> x1(nfft + 2), x2(nfft + 2);
    auto in_range = [&]() {
        if (forward)
            return startd + nfft <= deg.nsamples && startr + nfft <= limitr;
        return startd >= 0 && startr >= limitr;
    };
    while (in_range()) {
        for (long i = 0; i < nfft; ++i) {
            x1[i] = ref.data[startr + i] * window[i];
            x2[i] = deg.data[startd + i] * window[i];
        }
        real_fft(x1.data(), nfft);
        real_fft(x2.data(), nfft);
        for (long k = 0; k <= nfft / 2; ++k) {
            const float re = x1[2 * k], im = -x1[2 * k + 1];
            x1[2 * k] = re * x2[2 * k] - im * x2[2 * k + 1];
            x1[2 * k + 1] = re * x2[2 * k + 1] + im * x2[2 * k];
        }
        real_ifft(x1.data(), nfft);
        float vmax = 0.0f;
        for (long i = 0; i < nfft; ++i) {
            x1[i] = std::fabs(x1[i]);
            vmax = std::max(vmax, x1[i]);
        }
        vmax *= 0.99f;
        if (kernel > 0) {
            const float nmax = std::pow(vmax, 0.125f) / kernel;
            for (long i = 0; i < nfft; ++i)
                if (x1[i] > vmax) {
                    hist.hsum += nmax * kernel;
                    for (long k = 1 - kernel; k < kernel; ++k)
                        hist.h[(i + k + nfft) % nfft] +=
                            nmax * (kernel - std::fabs(float(k)));
                }
        } else {
            const float vote = std::pow(vmax, 0.125f);
            for (long i = 0; i < nfft; ++i)
                if (x1[i] > vmax) hist.h[i] += vote;
        }
        const long step = forward ? nfft / 4 : -(nfft / 4);
        startr += step;
        startd += step;
    }
}

void hist_peak(const std::vector<float>& h, long nfft, long& imax,
               float& vmax) {
    vmax = 0.0f;
    imax = 0;
    for (long i = 0; i < nfft; ++i)
        if (h[i] > vmax) {
            vmax = h[i];
            imax = i;
        }
    if (imax >= nfft / 2) imax -= nfft;
}

void time_align(const Rate& r, const Signal& ref, const Signal& deg,
                Align& al, long utt_id) {
    const long nfft = r.align_nfft;
    std::vector<float> window(nfft);
    for (long i = 0; i < nfft; ++i)
        window[i] = float(0.5 * (1.0 - std::cos(kTwoPi * i / nfft)));

    const long estdelay = al.delay_est[utt_id];
    long startr = al.search_start[utt_id] * r.downsample;
    long startd = startr + estdelay;
    if (startd < 0) {
        startr = -estdelay;
        startd = 0;
    }
    DelayHist hist(nfft);
    accumulate_frames(r, ref, deg, window, startr, startd,
                      al.search_end[utt_id] * r.downsample, true, 0, hist);

    // smooth the raw vote histogram with a triangular kernel (circular)
    float hsum = 0.0f;
    for (long i = 0; i < nfft; ++i) hsum += hist.h[i];
    const long kernel = nfft / 64;
    std::vector<float> x1(nfft + 2), x2(nfft + 2, 0.0f);
    std::copy(hist.h.begin(), hist.h.end(), x1.begin());
    x2[0] = 1.0f;
    for (long i = 1; i < kernel; ++i) {
        x2[i] = 1.0f - float(i) / kernel;
        x2[nfft - i] = 1.0f - float(i) / kernel;
    }
    real_fft(x1.data(), nfft);
    real_fft(x2.data(), nfft);
    for (long k = 0; k <= nfft / 2; ++k) {
        const float re = x1[2 * k], im = x1[2 * k + 1];
        x1[2 * k] = re * x2[2 * k] - im * x2[2 * k + 1];
        x1[2 * k + 1] = re * x2[2 * k + 1] + im * x2[2 * k];
    }
    real_ifft(x1.data(), nfft);
    std::vector<float> smoothed(nfft);
    for (long i = 0; i < nfft; ++i)
        smoothed[i] = hsum > 0.0f ? std::fabs(x1[i]) / hsum : 0.0f;

    long imax;
    float vmax;
    hist_peak(smoothed, nfft, imax, vmax);
    al.delay[utt_id] = estdelay + imax;
    al.delay_conf[utt_id] = vmax;
}

void split_align(const Rate& r, const Signal& ref, const Signal& deg,
                 Align& al, long utt_start, long speech_start,
                 long speech_end, long utt_end, long delay_est,
                 float delay_conf, long& best_ed1, long& best_d1,
                 float& best_dc1, long& best_ed2, long& best_d2,
                 float& best_dc2, long& best_bp) {
    const long nfft = r.align_nfft;
    const long utt_len = speech_end - speech_start;
    const long scratch = kMaxUtts - 1;
    best_dc1 = best_dc2 = 0.0f;

    std::vector<float> window(nfft);
    for (long i = 0; i < nfft; ++i)
        window[i] = float(0.5 * (1.0 - std::cos(kTwoPi * i / nfft)));
    const long kernel = nfft / 64;
    const long delta = nfft / (4 * r.downsample);
    long step = long((0.801 * utt_len + 40 * delta - 1) / (40 * delta));
    step *= delta;
    long pad = std::max<long>(utt_len / 10, 75);

    long bps[41];
    bps[0] = speech_start + pad;
    long n_bps = 0;
    do {
        ++n_bps;
        bps[n_bps] = bps[n_bps - 1] + step;
    } while (bps[n_bps] <= speech_end - pad && n_bps < 40);
    if (n_bps <= 0) return;

    long ed1[41], ed2[41], d1[41], d2[41];
    float dc1[41], dc2[41];
    for (long bp = 0; bp < n_bps; ++bp) {
        al.delay_est[scratch] = delay_est;
        al.search_start[scratch] = utt_start;
        al.search_end[scratch] = bps[bp];
        crude_align(r, ref, deg, al, kMaxUtts);
        ed1[bp] = al.delay[scratch];

        al.delay_est[scratch] = delay_est;
        al.search_start[scratch] = bps[bp];
        al.search_end[scratch] = utt_end;
        crude_align(r, ref, deg, al, kMaxUtts);
        ed2[bp] = al.delay[scratch];
    }

    // first-part fine alignment, sharing the frame walk across breakpoints
    // with the same crude estimate (resume where the previous bp stopped)
    for (long bp = 0; bp < n_bps; ++bp) dc1[bp] = -2.0f;
    for (;;) {
        long bp = 0;
        while (bp < n_bps && dc1[bp] > -2.0f) ++bp;
        if (bp >= n_bps) break;
        const long estdelay = ed1[bp];
        long startr = utt_start * r.downsample;
        long startd = startr + estdelay;
        if (startd < 0) {
            startr = -estdelay;
            startd = 0;
        }
        DelayHist hist(nfft);
        for (;;) {
            accumulate_frames(r, ref, deg, window, startr, startd,
                              bps[bp] * r.downsample, true, kernel, hist);
            long imax;
            float vmax;
            hist_peak(hist.h, nfft, imax, vmax);
            d1[bp] = estdelay + imax;
            dc1[bp] = hist.hsum > 0.0f ? vmax / hist.hsum : 0.0f;
            long nxt = bp + 1;
            while (nxt < n_bps && !(ed1[nxt] == estdelay && dc1[nxt] <= -2.0f))
                ++nxt;
            if (nxt >= n_bps) break;
            bp = nxt;
        }
    }

    // second-part fine alignment (backwards from the utterance end)
    for (long bp = 0; bp < n_bps; ++bp)
        dc2[bp] = dc1[bp] > delay_conf ? -2.0f : 0.0f;
    for (;;) {
        long bp = n_bps - 1;
        while (bp >= 0 && dc2[bp] > -2.0f) --bp;
        if (bp < 0) break;
        const long estdelay = ed2[bp];
        long startr = utt_end * r.downsample - nfft;
        long startd = startr + estdelay;
        if (startd + nfft > deg.nsamples) {
            startd = deg.nsamples - nfft;
            startr = startd - estdelay;
        }
        DelayHist hist(nfft);
        for (;;) {
            accumulate_frames(r, ref, deg, window, startr, startd,
                              bps[bp] * r.downsample, false, kernel, hist);
            long imax;
            float vmax;
            hist_peak(hist.h, nfft, imax, vmax);
            d2[bp] = estdelay + imax;
            dc2[bp] = hist.hsum > 0.0f ? vmax / hist.hsum : 0.0f;
            long nxt = bp - 1;
            while (nxt >= 0 && !(ed2[nxt] == estdelay && dc2[nxt] <= -2.0f))
                --nxt;
            if (nxt < 0) break;
            bp = nxt;
        }
    }

    for (long bp = 0; bp < n_bps; ++bp) {
        if (std::labs(d2[bp] - d1[bp]) >= r.downsample &&
            dc1[bp] + dc2[bp] > best_dc1 + best_dc2 &&
            dc1[bp] > delay_conf && dc2[bp] > delay_conf) {
            best_ed1 = ed1[bp];
            best_d1 = d1[bp];
            best_dc1 = dc1[bp];
            best_ed2 = ed2[bp];
            best_d2 = d2[bp];
            best_dc2 = dc2[bp];
            best_bp = bps[bp];
        }
    }
}

bool id_searchwindows(const Rate& r, const Signal& ref, const Signal& deg,
                      Align& al) {
    const long vad_len = ref.nsamples / r.downsample;
    const long del_deg_start = kMinUttLength - al.crude_delay / r.downsample;
    const long del_deg_end =
        (deg.nsamples - al.crude_delay) / r.downsample - kMinUttLength;
    long n = 0;
    long this_start = 0;
    bool speech = false;
    for (long w = 0; w < vad_len; ++w) {
        const float v = ref.vad[w];
        if (v > 0.0f && !speech) {
            speech = true;
            this_start = w;
            al.search_start[n] = std::max<long>(w - kSearchBuffer, 0);
        }
        if ((v == 0.0f || w == vad_len - 1) && speech) {
            speech = false;
            al.search_end[n] = std::min(w + kSearchBuffer, vad_len - 1);
            if (w - this_start >= kMinUttLength && this_start < del_deg_end &&
                w > del_deg_start)
                ++n;
        }
        // bound like the ITU reference's MAXNUTTERANCES: without this a
        // long choppy recording (>kMaxUtts qualifying utterances) would
        // write past the fixed arrays (index kMaxUtts is split_align's
        // scratch slot; kMaxUtts-1 is the last real utterance)
        if (n >= kMaxUtts) break;
    }
    al.nutts = n;
    return n > 0;
}

void id_utterances(const Rate& r, const Signal& ref, const Signal& deg,
                   Align& al) {
    const long vad_len = ref.nsamples / r.downsample;
    const long del_deg_start = kMinUttLength - al.crude_delay / r.downsample;
    const long del_deg_end =
        (deg.nsamples - al.crude_delay) / r.downsample - kMinUttLength;
    long n = 0;
    long this_start = 0;
    bool speech = false;
    for (long w = 0; w < vad_len; ++w) {
        const float v = ref.vad[w];
        if (v > 0.0f && !speech) {
            speech = true;
            this_start = w;
            al.utt_start[n] = w;
        }
        if ((v == 0.0f || w == vad_len - 1) && speech) {
            speech = false;
            al.utt_end[n] = w;
            if (w - this_start >= kMinUttLength && this_start < del_deg_end &&
                w > del_deg_start)
                ++n;
        }
        if (n >= kMaxUtts) break;  // see id_searchwindows bound
    }
    al.utt_start[0] = kSearchBuffer;
    al.utt_end[al.nutts - 1] = vad_len - kSearchBuffer;
    for (long u = 1; u < al.nutts; ++u) {
        const long mid = (al.utt_start[u] + al.utt_end[u - 1]) / 2;
        al.utt_start[u] = mid;
        al.utt_end[u - 1] = mid;
    }
    // clamp to the degraded signal's span given per-utterance delays
    if (al.utt_start[0] * r.downsample + al.delay[0] <
        kSearchBuffer * r.downsample)
        al.utt_start[0] =
            kSearchBuffer + (r.downsample - 1 - al.delay[0]) / r.downsample;
    if (al.utt_end[al.nutts - 1] * r.downsample + al.delay[al.nutts - 1] >
        deg.nsamples - kSearchBuffer * r.downsample)
        al.utt_end[al.nutts - 1] =
            (deg.nsamples - al.delay[al.nutts - 1]) / r.downsample -
            kSearchBuffer;
    for (long u = 1; u < al.nutts; ++u) {
        const long this_s = al.utt_start[u] * r.downsample + al.delay[u];
        const long last_e = al.utt_end[u - 1] * r.downsample + al.delay[u - 1];
        if (this_s < last_e) {
            const long mid = (this_s + last_e) / 2;
            al.utt_start[u] =
                (r.downsample - 1 + mid - al.delay[u]) / r.downsample;
            al.utt_end[u - 1] = (mid - al.delay[u - 1]) / r.downsample;
        }
    }
}

void utterance_split(const Rate& r, const Signal& ref, const Signal& deg,
                     Align& al) {
    long u = 0;
    while (u < al.nutts && al.nutts < kMaxUtts) {
        const long delay_est = al.delay_est[u];
        const float delay_conf = al.delay_conf[u];
        const long utt_start = al.utt_start[u];
        const long utt_end = al.utt_end[u];

        long speech_start = utt_start;
        while (speech_start < utt_end && ref.vad[speech_start] <= 0.0f)
            ++speech_start;
        long speech_end = utt_end;
        while (speech_end > utt_start && ref.vad[speech_end] <= 0.0f)
            --speech_end;
        ++speech_end;

        if (speech_end - speech_start < 200) {
            ++u;
            continue;
        }
        long bed1 = 0, bd1 = 0, bed2 = 0, bd2 = 0, bbp = 0;
        float bdc1 = 0.0f, bdc2 = 0.0f;
        split_align(r, ref, deg, al, utt_start, speech_start, speech_end,
                    utt_end, delay_est, delay_conf, bed1, bd1, bdc1, bed2,
                    bd2, bdc2, bbp);
        if (!(bdc1 > delay_conf && bdc2 > delay_conf)) {
            ++u;
            continue;
        }
        for (long s = al.nutts - 1; s > u; --s) {
            al.delay_est[s + 1] = al.delay_est[s];
            al.delay[s + 1] = al.delay[s];
            al.delay_conf[s + 1] = al.delay_conf[s];
            al.utt_start[s + 1] = al.utt_start[s];
            al.utt_end[s + 1] = al.utt_end[s];
            al.search_start[s + 1] = al.utt_start[s];
            al.search_end[s + 1] = al.utt_end[s];
        }
        ++al.nutts;
        al.delay_est[u] = bed1;
        al.delay[u] = bd1;
        al.delay_conf[u] = bdc1;
        al.delay_est[u + 1] = bed2;
        al.delay[u + 1] = bd2;
        al.delay_conf[u + 1] = bdc2;
        al.search_start[u + 1] = al.search_start[u];
        al.search_end[u + 1] = al.search_end[u];
        if (bd2 < bd1) {
            al.utt_start[u] = utt_start;
            al.utt_end[u] = bbp;
            al.utt_start[u + 1] = bbp;
            al.utt_end[u + 1] = utt_end;
        } else {
            al.utt_start[u] = utt_start;
            al.utt_end[u] = bbp + (bd2 - bd1) / (2 * r.downsample);
            al.utt_start[u + 1] = bbp - (bd2 - bd1) / (2 * r.downsample);
            al.utt_end[u + 1] = utt_end;
        }
        if ((al.utt_start[u] - kSearchBuffer) * r.downsample + bd1 < 0)
            al.utt_start[u] =
                kSearchBuffer + (r.downsample - 1 - bd1) / r.downsample;
        if (al.utt_end[u + 1] * r.downsample + bd2 >
            deg.nsamples - kSearchBuffer * r.downsample)
            al.utt_end[u + 1] =
                (deg.nsamples - bd2) / r.downsample - kSearchBuffer;
    }
}

// -------------------------------------------------- perceptual model ----
struct Model {
    const Rate& r;
    long nf;           // analysis frame (Downsample * 8)
    int nb;
    std::vector<float> window;

    explicit Model(const Rate& rate) : r(rate), nf(rate.downsample * 8),
                                       nb(rate.nb), window(nf) {
        for (long i = 0; i < nf; ++i)
            window[i] = float(0.5 * (1.0 - std::cos(kTwoPi * i / nf)));
    }

    void spectrum(const float* data, long start, float* hz) const {
        std::vector<float> tmp(nf + 2);
        for (long i = 0; i < nf; ++i) tmp[i] = data[start + i] * window[i];
        real_fft(tmp.data(), nf);
        for (long k = 0; k < nf / 2; ++k)
            hz[k] = tmp[2 * k] * tmp[2 * k] + tmp[2 * k + 1] * tmp[2 * k + 1];
        hz[0] = 0.0f;
    }

    void to_bark(const float* hz, float* bark) const {
        long h = 0;
        for (int b = 0; b < nb; ++b) {
            double sum = 0;
            for (int i = 0; i < r.bands_per_bark[b]; ++i) sum += hz[h++];
            bark[b] = float(sum * r.pow_corr[b] * r.sp);
        }
    }

    float total_audible(const float* bark, double factor) const {
        double s = 0;
        for (int b = 1; b < nb; ++b)
            if (bark[b] > factor * r.abs_thresh[b]) s += bark[b];
        return float(s);
    }

    void loudness(const float* bark, float* loud) const {
        constexpr double zwicker = 0.23;
        for (int b = 0; b < nb; ++b) {
            const float thresh = float(r.abs_thresh[b]);
            float h = r.centre_bark[b] < 4.0
                          ? float(6.0 / (r.centre_bark[b] + 2.0))
                          : 1.0f;
            h = std::min(h, 2.0f);
            h = std::pow(h, 0.15f);
            const double zp = zwicker * h;
            if (bark[b] > thresh) {
                loud[b] = float(std::pow(thresh / 0.5, zp) *
                                (std::pow(0.5 + 0.5 * bark[b] / thresh, zp) -
                                 1.0));
            } else {
                loud[b] = 0.0f;
            }
            loud[b] *= r.sl;
        }
    }

    float band_lp(const float* x, double p) const {
        double total_w = 0, acc = 0;
        for (int b = 1; b < nb; ++b) {
            const float w = float(r.width_bark[b]);
            acc += std::pow(double(std::fabs(x[b]) * w), p);
            total_w += w;
        }
        acc /= total_w;
        return float(std::pow(acc, 1.0 / p) * total_w);
    }

    void asymmetry(float* dist, const float* bark_ref,
                   const float* bark_deg) const {
        for (int b = 0; b < nb; ++b) {
            const float ratio = (bark_deg[b] + 50.0f) / (bark_ref[b] + 50.0f);
            float h = std::pow(ratio, 1.2f);
            if (h > 12.0f) h = 12.0f;
            if (h < 3.0f) h = 0.0f;
            dist[b] *= h;
        }
    }
};

// one frame of the disturbance computation (shared by the main pass and
// the bad-interval reprocessing pass)
void frame_disturbances(const Model& m, float* bark_ref, float* bark_deg,
                        float& old_scale, bool first_frame, float& d_frame,
                        float& da_frame) {
    const int nb = m.nb;
    std::vector<float> loud_ref(nb), loud_deg(nb), dist(nb);
    const float pow_ref = m.total_audible(bark_ref, 1.0);
    const float pow_deg = m.total_audible(bark_deg, 1.0);
    float scale = (pow_ref + 5e3f) / (pow_deg + 5e3f);
    if (!first_frame) scale = 0.2f * old_scale + 0.8f * scale;
    old_scale = scale;
    scale = std::min(scale, 5.0f);
    scale = std::max(scale, 3e-4f);
    for (int b = 0; b < nb; ++b) bark_deg[b] *= scale;

    m.loudness(bark_ref, loud_ref.data());
    m.loudness(bark_deg, loud_deg.data());
    for (int b = 0; b < nb; ++b) {
        const float d = loud_deg[b] - loud_ref[b];
        const float dz = 0.25f * std::min(loud_deg[b], loud_ref[b]);
        dist[b] = d > dz ? d - dz : (d < -dz ? d + dz : 0.0f);
    }
    d_frame = m.band_lp(dist.data(), 2.0);
    m.asymmetry(dist.data(), bark_ref, bark_deg);
    da_frame = m.band_lp(dist.data(), 1.0);
}

long best_bad_interval_delay(const Rate& r, const float* ref, const float* deg,
                             long n, long search, float& best_corr) {
    const long np2 = next_pow2(2 * n);
    const double p1 = mean_power(ref, 0, n, n) * double(n) / np2;
    const double p2 = mean_power(deg, 0, n, n) * double(n) / np2;
    best_corr = 0.0f;
    if (p1 <= 1e-6 || p2 <= 1e-6) return 0;
    const double norm = std::sqrt(p1 * p2);
    std::vector<float> a(np2 + 2, 0.0f), b(np2 + 2, 0.0f), y(np2 + 2, 0.0f);
    for (long i = 0; i < n; ++i) {
        a[i] = std::fabs(ref[i]);
        b[i] = std::fabs(deg[i]);
    }
    real_fft(a.data(), np2);
    real_fft(b.data(), np2);
    for (long k = 0; k <= np2 / 2; ++k) {
        a[2 * k] /= np2;
        a[2 * k + 1] /= np2;
        y[2 * k] = a[2 * k] * b[2 * k] + a[2 * k + 1] * b[2 * k + 1];
        y[2 * k + 1] = -a[2 * k + 1] * b[2 * k] + a[2 * k] * b[2 * k + 1];
    }
    real_ifft(y.data(), np2);
    long best_delay = 0;
    for (long i = -search; i <= -1; ++i) {
        const float h = std::fabs(y[i + np2]) / float(norm);
        if (h > best_corr) {
            best_corr = h;
            best_delay = i;
        }
    }
    for (long i = 0; i < search; ++i) {
        const float h = std::fabs(y[i]) / float(norm);
        if (h > best_corr) {
            best_corr = h;
            best_delay = i;
        }
    }
    return best_delay;
}

float syllable_lpq(long start_frame, long stop_frame, double p_syl,
                   double p_time, const float* frame_d,
                   const float* time_weight) {
    constexpr int kFramesPerSyllable = 20;
    double num = 0, den = 0;
    for (long s = start_frame; s <= stop_frame; s += kFramesPerSyllable / 2) {
        double acc = 0;
        int cnt = 0;
        for (long f = s; f < s + kFramesPerSyllable; ++f) {
            if (f <= stop_frame) acc += std::pow(double(frame_d[f]), p_syl);
            ++cnt;
        }
        acc = std::pow(acc / cnt, 1.0 / p_syl);
        const double w = time_weight[s - start_frame];
        num += std::pow(w * acc, p_time);
        den += std::pow(w, p_time);
    }
    return float(std::pow(num / den, 1.0 / p_time));
}

double run_pesq(const double* ref_in, long nref, const double* deg_in,
                long ndeg, long fs) {
    const Rate r = make_rate(fs);
    if (nref < fs / 4 || ndeg < fs / 4) return -1000.0;

    auto load = [&](const double* x, long n) {
        Signal s;
        s.nsamples = n + 2 * guard(r);
        s.data.assign(s.nsamples + pad_samples(r), 0.0f);
        for (long i = 0; i < n; ++i) s.data[guard(r) + i] = float(x[i]);
        return s;
    };
    Signal ref = load(ref_in, nref);
    Signal deg = load(deg_in, ndeg);
    const long max_nsamples = std::max(ref.nsamples, deg.nsamples);

    fix_power_level(r, ref, max_nsamples);
    fix_power_level(r, deg, max_nsamples);
    apply_db_filter(r, ref.data.data(), ref.nsamples, kIrsFilterDb);
    apply_db_filter(r, deg.data.data(), deg.nsamples, kIrsFilterDb);

    // model input = IRS-filtered signals; alignment additionally DC-blocks
    // and bandpasses a copy
    std::vector<float> model_ref = ref.data, model_deg = deg.data;
    dc_block_and_input_filter(r, ref);
    dc_block_and_input_filter(r, deg);
    compute_vad(r, ref);
    compute_vad(r, deg);

    Align al{};
    crude_align(r, ref, deg, al, -1);

    if (id_searchwindows(r, ref, deg, al)) {
        for (long u = 0; u < al.nutts; ++u) {
            crude_align(r, ref, deg, al, u);
            time_align(r, ref, deg, al, u);
        }
        id_utterances(r, ref, deg, al);
        utterance_split(r, ref, deg, al);
    } else {
        // degenerate input (no located utterance): treat the whole active
        // span as one utterance at the crude delay
        al.nutts = 1;
        al.utt_start[0] = kSearchBuffer;
        al.utt_end[0] = ref.nsamples / r.downsample - kSearchBuffer;
        al.delay[0] = al.crude_delay;
        al.delay_est[0] = al.crude_delay;
        al.delay_conf[0] = 0.0f;
    }

    ref.data = std::move(model_ref);
    deg.data = std::move(model_deg);
    const long full_len = max_nsamples + pad_samples(r);
    ref.data.resize(full_len, 0.0f);
    deg.data.resize(full_len, 0.0f);

    // ------------------------------------------------ perceptual model --
    const Model m(r);
    const long nf = m.nf;
    const int nb = m.nb;
    const float* rdat = ref.data.data();

    // trim leading/trailing silence of the reference
    auto silent_5 = [&](long idx) {
        float s = 0.0f;
        for (int i = 0; i < 5; ++i) s += std::fabs(rdat[idx + i]);
        return s < 500.0f;
    };
    long skip_start = 0;
    while (silent_5(guard(r) + skip_start) && skip_start < max_nsamples / 2)
        ++skip_start;
    long skip_end = 0;
    while (silent_5(max_nsamples - guard(r) + pad_samples(r) - 1 - skip_end -
                    4) &&
           skip_end < max_nsamples / 2)
        ++skip_end;

    const long start_frame = skip_start / (nf / 2);
    const long stop_frame =
        (max_nsamples - 2 * guard(r) + pad_samples(r) - skip_end) / (nf / 2) -
        1;
    const long nframes = stop_frame + 1;

    std::vector<float> bark_ref(nframes * nb), bark_deg(nframes * nb);
    std::vector<float> hz(nf / 2);
    std::vector<int> silent(nframes);
    std::vector<float> frame_d(nframes), frame_da(nframes);
    std::vector<float> total_pow_ref(nframes);

    auto delay_at = [&](long sample) {
        long u = al.nutts - 1;
        while (u >= 0 && al.utt_start[u] * r.downsample > sample) --u;
        return u >= 0 ? al.delay[u] : al.delay[0];
    };

    for (long f = 0; f < nframes; ++f) {
        const long start_ref = guard(r) + f * (nf / 2);
        m.spectrum(ref.data.data(), start_ref, hz.data());
        m.to_bark(hz.data(), &bark_ref[f * nb]);
        const long start_deg = start_ref + delay_at(start_ref);
        if (start_deg > 0 && start_deg + nf < max_nsamples + pad_samples(r)) {
            m.spectrum(deg.data.data(), start_deg, hz.data());
        } else {
            std::fill(hz.begin(), hz.end(), 0.0f);
        }
        m.to_bark(hz.data(), &bark_deg[f * nb]);
        silent[f] = m.total_audible(&bark_ref[f * nb], 1e2) < 1e7f;
    }

    // partial frequency-response compensation applied to the reference
    const long total_frames_norm =
        (max_nsamples - 2 * guard(r) + pad_samples(r)) / (nf / 2) - 1;
    std::vector<float> avg_ref(nb, 0.0f), avg_deg(nb, 0.0f);
    for (int b = 0; b < nb; ++b) {
        double sr = 0, sd = 0;
        for (long f = 0; f < nframes; ++f) {
            if (silent[f]) continue;
            if (bark_ref[f * nb + b] > 100 * r.abs_thresh[b])
                sr += bark_ref[f * nb + b];
            if (bark_deg[f * nb + b] > 100 * r.abs_thresh[b])
                sd += bark_deg[f * nb + b];
        }
        avg_ref[b] = float(sr / total_frames_norm);
        avg_deg[b] = float(sd / total_frames_norm);
    }
    for (int b = 0; b < nb; ++b) {
        float x = (avg_deg[b] + 1000.0f) / (avg_ref[b] + 1000.0f);
        x = std::min(x, 100.0f);
        x = std::max(x, 0.01f);
        for (long f = 0; f < nframes; ++f) bark_ref[f * nb + b] *= x;
    }

    bool any_bad_frame = false;
    float old_scale = 1.0f;
    for (long f = 0; f < nframes; ++f) {
        total_pow_ref[f] = m.total_audible(&bark_ref[f * nb], 1.0);
        frame_disturbances(m, &bark_ref[f * nb], &bark_deg[f * nb],
                           old_scale, f == 0, frame_d[f], frame_da[f]);
        if (frame_d[f] > 30.0f) any_bad_frame = true;
    }

    // zero out frames swallowed by large negative delay jumps
    for (long u = 1; u < al.nutts; ++u) {
        long f1 = long(std::floor(
            double((al.utt_start[u] - kSearchBuffer) * r.downsample +
                   al.delay[u]) /
            (nf / 2)));
        const long j = long(
            std::floor(double((al.utt_end[u - 1] - kSearchBuffer) *
                                  r.downsample +
                              al.delay[u - 1])) /
            (nf / 2));
        const long jump = al.delay[u] - al.delay[u - 1];
        f1 = std::max<long>(std::min(f1, j), 0);
        if (jump < -(nf / 2)) {
            const long f2 =
                long(((al.utt_start[u] - kSearchBuffer) * r.downsample +
                      std::max<long>(0, std::labs(jump))) /
                     (nf / 2)) +
                1;
            for (long f = f1; f <= f2; ++f)
                if (f < stop_frame) {
                    frame_d[f] = 0.0f;
                    frame_da[f] = 0.0f;
                }
        }
    }

    // delay-compensated degraded signal (per-sample utterance delays)
    const long nn = full_len;
    std::vector<float> tweaked(nn, 0.0f);
    for (long i = guard(r); i < nn - guard(r); ++i) {
        long j = i + delay_at(i);
        j = std::max(j, guard(r));
        j = std::min(j, nn - guard(r) - 1);
        tweaked[i] = deg.data[j];
    }

    if (any_bad_frame) {
        // identify smeared bad intervals and re-align them individually
        std::vector<int> bad(nframes, 0), smeared(nframes, 0);
        for (long f = 1; f < nframes; ++f) bad[f] = frame_d[f] > 30.0f;
        for (long f = 2; f < stop_frame - 2; ++f) {
            int left = bad[f], right = bad[f];
            for (int i = -2; i <= 0; ++i) left = std::max(left, bad[f + i]);
            for (int i = 0; i <= 2; ++i) right = std::max(right, bad[f + i]);
            smeared[f] = std::min(left, right);
        }
        struct Interval {
            long f0, f1, s0, s1, n;
            long delay = 0;
        };
        std::vector<Interval> intervals;
        long f = 0;
        while (f <= stop_frame) {
            while (f <= stop_frame && !smeared[f]) ++f;
            if (f > stop_frame) break;
            const long f0 = f;
            while (f <= stop_frame && smeared[f]) ++f;
            if (f <= stop_frame && f - f0 >= 5) {
                Interval iv;
                iv.f0 = f0;
                iv.f1 = std::min(f, stop_frame);
                iv.s0 = f0 * (nf / 2) + guard(r);
                iv.s1 = f * (nf / 2) + nf + guard(r);
                iv.n = iv.s1 - iv.s0;
                intervals.push_back(iv);
            }
        }
        const long search = 4 * nf;
        for (auto& iv : intervals) {
            std::vector<float> rbuf(2 * search + iv.n, 0.0f);
            std::vector<float> dbuf(2 * search + iv.n, 0.0f);
            for (long i = 0; i < iv.n; ++i)
                rbuf[search + i] = ref.data[iv.s0 + i];
            for (long i = 0; i < 2 * search + iv.n; ++i) {
                long j = iv.s0 - search + i;
                const long hi = max_nsamples - guard(r) + pad_samples(r);
                j = std::max(j, guard(r));
                j = std::min(j, hi - 1);
                dbuf[i] = tweaked[j];
            }
            float corr;
            iv.delay = best_bad_interval_delay(
                r, rbuf.data(), dbuf.data(), 2 * search + iv.n, search, corr);
            if (corr < 0.5f) iv.delay = 0;
        }
        if (!intervals.empty()) {
            std::vector<float> doubly = tweaked;
            for (const auto& iv : intervals)
                for (long i = iv.s0; i < iv.s1; ++i) {
                    long j = i + iv.delay;
                    j = std::max<long>(j, 0);
                    j = std::min(j, max_nsamples - 1);
                    doubly[i] = tweaked[j];
                }
            for (const auto& iv : intervals) {
                for (long f2 = iv.f0; f2 < iv.f1; ++f2) {
                    const long s = guard(r) + f2 * (nf / 2);
                    m.spectrum(doubly.data(), s, hz.data());
                    m.to_bark(hz.data(), &bark_deg[f2 * nb]);
                }
                float os = 1.0f;
                for (long f2 = iv.f0; f2 < iv.f1; ++f2) {
                    float d2, da2;
                    frame_disturbances(m, &bark_ref[f2 * nb],
                                       &bark_deg[f2 * nb], os, f2 == 0, d2,
                                       da2);
                    frame_d[f2] = std::min(frame_d[f2], d2);
                    frame_da[f2] = std::min(frame_da[f2], da2);
                }
            }
        }
    }

    // time weighting + power normalisation, then the split-second Lp
    std::vector<float> time_weight(nframes, 1.0f);
    if (nframes > 1000) {
        const long n = (max_nsamples - 2 * guard(r)) / (nf / 2) - 1;
        double tw = (n - 1000.0) / 5500.0;
        tw = std::min(tw, 0.5);
        for (long f2 = 0; f2 < nframes; ++f2)
            time_weight[f2] = float((1.0 - tw) + tw * double(f2) / n);
    }
    for (long f2 = 0; f2 < nframes; ++f2) {
        const float h =
            std::pow((total_pow_ref[f2] + 1e5f) / 1e7f, 0.04f);
        frame_d[f2] = std::min(frame_d[f2] / h, 45.0f);
        frame_da[f2] = std::min(frame_da[f2] / h, 45.0f);
    }

    const float d_ind =
        syllable_lpq(start_frame, stop_frame, 6.0, 2.0, frame_d.data(),
                     time_weight.data() + 0);
    const float a_ind =
        syllable_lpq(start_frame, stop_frame, 6.0, 2.0, frame_da.data(),
                     time_weight.data() + 0);
    return 4.5 - 0.1 * double(d_ind) - 0.0309 * double(a_ind);
}

}  // namespace

extern "C" {

// MOS per ITU-T P.862 (raw PESQ MOS, range approx [-0.5, 4.5]).
// fs must be 8000 or 16000. Returns < -100 on unusable input.
double pesq_mos(const double* reference, int64_t n_ref,
                const double* degraded, int64_t n_deg, double fs) {
    const long rate = long(fs);
    if (rate != 8000 && rate != 16000) return -1000.0;
    return run_pesq(reference, n_ref, degraded, n_deg, rate);
}

}  // extern "C"

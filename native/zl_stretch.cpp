// zl_stretch — native WSOLA time-stretcher for the offline playback render.
//
// The reference delegates time-stretch to tracktion's TimeStretcher with the
// SoundTouch backend (reference CMakeLists.txt:86
// TRACKTION_ENABLE_TIMESTRETCH_SOUNDTOUCH=1), which is a WSOLA
// (waveform-similarity overlap-add) algorithm: copy fixed-length sequences
// from the input at the stretched cadence, sliding each candidate within a
// seek window to maximise cross-correlation with the already-written output
// tail, then crossfade. This file implements that algorithm from scratch
// (time-domain, transient-preserving, no FFT) as the fast path behind
// libzl_tpu/ops/resample.render_playback; the Python phase vocoder remains
// the portable fallback and the quality reference for tests.
//
// Layout contract: audio is interleaved float32 [frames, channels]
// (C-contiguous numpy [T, C]); correlation runs on a mono downmix while
// crossfade/copy preserve all channels.
//
// ABI (all lengths in frames, not samples):
//   zl_stretch_abi_version() -> 1
//   zl_stretch_out_len(n_in, stretch) -> exact output frame count
//   zl_stretch_process(in, n_in, channels, stretch, sample_rate,
//                      out, out_capacity) -> frames written (== out_len)
//                      or -1 on bad args / insufficient capacity.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <cfenv>

// match the Python/numpy vocoder's round-half-to-even for output lengths
// (llround rounds half away from zero; the two stretch backends must
// agree on rendered durations for cross-backend reproducibility)
static inline long long nearbyint_ll(double x) {
  return (long long)std::nearbyint(x);
}
#include <vector>

namespace {

// Window parameters, SoundTouch-class defaults scaled by sample rate:
// ~40 ms sequence, ~15 ms seek radius, ~8 ms crossfade overlap.
struct Params {
    int64_t seq;      // frames copied per iteration
    int64_t overlap;  // crossfade length
    int64_t seek;     // +- search radius around the nominal position
};

Params make_params(int sample_rate) {
    Params p;
    p.seq = (int64_t)std::lround(0.040 * sample_rate);
    p.overlap = (int64_t)std::lround(0.008 * sample_rate);
    p.seek = (int64_t)std::lround(0.015 * sample_rate);
    if (p.overlap < 8) p.overlap = 8;
    if (p.seq < 4 * p.overlap) p.seq = 4 * p.overlap;
    if (p.seek < p.overlap) p.seek = p.overlap;
    return p;
}

// Normalised cross-correlation of the fixed reference `ref` against the
// candidate at `cand`, both length n. The reference side's norm is constant
// across candidates so only the candidate norm matters: corr = dot /
// sqrt(candNorm). Doubles for the accumulators; the compiler vectorises the
// fused loop at -O3.
inline double xcorr(const float* ref, const float* cand, int64_t n) {
    double dot = 0.0, norm = 0.0;
    for (int64_t i = 0; i < n; ++i) {
        dot += (double)ref[i] * cand[i];
        norm += (double)cand[i] * cand[i];
    }
    if (norm < 1e-12) return -1e30;
    return dot / std::sqrt(norm);
}

// Two-stage seek: coarse scan at stride 16 over [-seek, +seek], then refine
// every offset within +-15 of the coarse winner (the hierarchical search
// SoundTouch uses to cut the candidate count ~10x with no quality loss).
int64_t best_offset(const float* mono, int64_t base, int64_t seek,
                    const float* ref, int64_t overlap) {
    int64_t best = 0;
    double best_c = -1e30;
    for (int64_t o = -seek; o <= seek; o += 16) {
        double c = xcorr(ref, mono + base + o, overlap);
        if (c > best_c) { best_c = c; best = o; }
    }
    int64_t lo = best - 15 < -seek ? -seek : best - 15;
    int64_t hi = best + 15 > seek ? seek : best + 15;
    for (int64_t o = lo; o <= hi; ++o) {
        if ((o + seek) % 16 == 0) continue;  // already scanned
        double c = xcorr(ref, mono + base + o, overlap);
        if (c > best_c) { best_c = c; best = o; }
    }
    return best;
}

}  // namespace

extern "C" {

int zl_stretch_abi_version() { return 1; }

int64_t zl_stretch_out_len(int64_t n_in, double stretch) {
    if (n_in <= 0 || stretch <= 0.0) return 0;
    int64_t n = (int64_t)nearbyint_ll((double)n_in * stretch);
    return n > 0 ? n : 1;
}

int64_t zl_stretch_process(const float* in, int64_t n_in, int channels,
                           double stretch, int sample_rate,
                           float* out, int64_t out_capacity) {
    if (!in || !out || n_in <= 0 || channels <= 0 || stretch <= 0.0 ||
        sample_rate <= 0)
        return -1;
    const int64_t target = zl_stretch_out_len(n_in, stretch);
    if (out_capacity < target) return -1;
    const int C = channels;

    Params p = make_params(sample_rate);
    // Degenerate inputs (shorter than one window): linear-resample-free
    // fallback — repeat/trim whole frames. Also used for stretch == 1.
    if (n_in < p.seq + 2 * p.seek + 2 || stretch == 1.0) {
        for (int64_t i = 0; i < target; ++i) {
            int64_t s = (int64_t)((double)i / stretch);
            if (s >= n_in) s = n_in - 1;
            std::memcpy(out + i * C, in + s * C, sizeof(float) * C);
        }
        return target;
    }

    // Mono downmix for the correlation search, padded by `seek` on each side
    // so candidate windows never need bounds checks.
    std::vector<float> mono(n_in + 2 * p.seek, 0.0f);
    float* m = mono.data() + p.seek;
    const float inv_c = 1.0f / (float)C;
    for (int64_t i = 0; i < n_in; ++i) {
        float acc = 0.0f;
        for (int c = 0; c < C; ++c) acc += in[i * C + c];
        m[i] = acc * inv_c;
    }

    const int64_t hop_out = p.seq - p.overlap;   // output advance per step
    const double hop_in = (double)hop_out / stretch;  // nominal input skip

    // Previous sequence's tail (mono, for the search) — seeded from the
    // first sequence, which is copied verbatim from the input start.
    std::vector<float> ref(p.overlap);

    int64_t copy0 = p.seq < n_in ? p.seq : n_in;
    if (copy0 > target) copy0 = target;
    std::memcpy(out, in, sizeof(float) * copy0 * C);
    int64_t out_pos = copy0 - p.overlap;  // where the next crossfade starts
    if (out_pos < 0) out_pos = 0;
    double in_pos = hop_in;

    const float inv_ov = 1.0f / (float)p.overlap;
    while (out_pos + p.overlap < target) {
        int64_t base = (int64_t)std::llround(in_pos);
        if (base < p.seek) base = p.seek;
        if (base > n_in - p.seq - p.seek) base = n_in - p.seq - p.seek;
        if (base < 0) break;

        // the output tail we must match (mono downmix of what's written)
        for (int64_t k = 0; k < p.overlap; ++k) {
            float acc = 0.0f;
            const float* f = out + (out_pos + k) * C;
            for (int c = 0; c < C; ++c) acc += f[c];
            ref[(size_t)k] = acc * inv_c;
        }
        int64_t off = best_offset(m, base, p.seek, ref.data(), p.overlap);
        const float* src = in + (base + off) * C;

        // linear crossfade over the overlap, then copy the sequence body
        // (clamped at the target so the final partial sequence still lands
        // through the crossfade instead of a hard seam)
        for (int64_t k = 0; k < p.overlap && out_pos + k < target; ++k) {
            float w = (float)k * inv_ov;
            float* dst = out + (out_pos + k) * C;
            const float* s = src + k * C;
            for (int c = 0; c < C; ++c)
                dst[c] = dst[c] * (1.0f - w) + s[c] * w;
        }
        int64_t body = p.seq - p.overlap;
        if (out_pos + p.seq > target) body = target - out_pos - p.overlap;
        if (body > 0)
            std::memcpy(out + (out_pos + p.overlap) * C,
                        src + p.overlap * C, sizeof(float) * body * C);

        out_pos += hop_out;
        in_pos += hop_in;
    }
    return target;
}

}  // extern "C"

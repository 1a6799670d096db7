// zl_flac — native FLAC decoder for the clip loading path.
//
// The reference loads clips through juce's basic formats, which include
// FLAC (reference lib/WaveFormItem.cpp:29 registerBasicFormats). This
// environment ships no libFLAC, so the decoder is implemented from the
// FLAC format specification (RFC 9639): STREAMINFO parsing, frame headers
// (UTF-8 coded frame numbers, all block-size/sample-rate/sample-size
// codes), subframe types CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32),
// wasted bits, Rice/Rice2 partitioned residuals with escape codes, and all
// four channel assignments (independent, left/side, right/side, mid/side).
// Frame CRC-8/CRC-16 and the stream MD5 are not verified (decode-only
// loader; corrupt streams fail on structural checks instead).
//
// ABI (ctypes-bound by libzl_tpu/ops is not needed — io-level binding):
//   zl_flac_abi_version() -> 1
//   zl_flac_probe(data, size, &rate, &channels, &bits, &total_samples) -> 0
//   zl_flac_decode(data, size, out, out_capacity_frames) -> frames written
//     (interleaved float32, scaled to [-1, 1)), or negative error code.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct BitReader {
    const uint8_t* data;
    size_t size;       // bytes
    size_t byte = 0;
    int bit = 0;       // bits consumed of current byte (0..7)
    bool error = false;

    bool at_end() const { return byte >= size; }

    uint32_t bits_u(int n) {  // n <= 32
        uint32_t v = 0;
        for (int i = 0; i < n; ++i) {
            if (byte >= size) { error = true; return 0; }
            v = (v << 1) | ((data[byte] >> (7 - bit)) & 1u);
            if (++bit == 8) { bit = 0; ++byte; }
        }
        return v;
    }

    uint64_t bits_u64(int n) {
        uint64_t v = 0;
        if (n > 32) { v = bits_u(n - 32); n = 32; }
        return (v << n) | bits_u(n);
    }

    int64_t bits_s(int n) {  // signed, two's complement
        uint64_t v = bits_u64(n);
        if (n > 0 && (v >> (n - 1)) & 1u)
            v |= ~0ULL << n;
        return (int64_t)v;
    }

    uint32_t unary() {  // count 0s, consume terminating 1
        uint32_t q = 0;
        for (;;) {
            if (byte >= size) { error = true; return 0; }
            uint32_t b = (data[byte] >> (7 - bit)) & 1u;
            if (++bit == 8) { bit = 0; ++byte; }
            if (b) return q;
            if (++q > (1u << 24)) { error = true; return 0; }  // corrupt
        }
    }

    void align() { if (bit) { bit = 0; ++byte; } }
};

struct StreamInfo {
    uint32_t sample_rate = 0;
    int channels = 0;
    int bits = 0;
    uint64_t total_samples = 0;
};

// Returns byte offset of the first frame, or 0 on error.
size_t parse_header(const uint8_t* d, size_t n, StreamInfo* si) {
    if (n < 8 || memcmp(d, "fLaC", 4) != 0) return 0;
    size_t pos = 4;
    bool have_si = false;
    for (;;) {
        if (pos + 4 > n) return 0;
        uint8_t h = d[pos];
        bool last = h & 0x80;
        int type = h & 0x7F;
        uint32_t len = ((uint32_t)d[pos + 1] << 16) | ((uint32_t)d[pos + 2] << 8)
                       | d[pos + 3];
        pos += 4;
        if (pos + len > n) return 0;
        if (type == 0 && len >= 34) {  // STREAMINFO
            const uint8_t* s = d + pos;
            si->sample_rate = ((uint32_t)s[10] << 12) | ((uint32_t)s[11] << 4)
                              | (s[12] >> 4);
            si->channels = ((s[12] >> 1) & 0x7) + 1;
            si->bits = (((s[12] & 1) << 4) | (s[13] >> 4)) + 1;
            si->total_samples = ((uint64_t)(s[13] & 0x0F) << 32)
                                | ((uint64_t)s[14] << 24) | ((uint64_t)s[15] << 16)
                                | ((uint64_t)s[16] << 8) | s[17];
            have_si = true;
        }
        pos += len;
        if (last) break;
    }
    return have_si ? pos : 0;
}

// decode one subframe into sig[blocksize]; bps = effective bits for this
// channel. Returns false on structural error.
bool decode_subframe(BitReader& br, int64_t* sig, int blocksize, int bps) {
    if (br.bits_u(1) != 0) return false;  // padding bit must be 0
    int type = br.bits_u(6);
    int wasted = 0;
    if (br.bits_u(1)) wasted = 1 + br.unary();
    if (br.error) return false;
    bps -= wasted;
    if (bps <= 0 || bps > 33) return false;

    int order = 0;
    bool is_fixed = false, is_lpc = false;
    if (type == 0) {               // CONSTANT
        int64_t v = br.bits_s(bps);
        for (int i = 0; i < blocksize; ++i) sig[i] = v;
    } else if (type == 1) {        // VERBATIM
        for (int i = 0; i < blocksize; ++i) sig[i] = br.bits_s(bps);
    } else if ((type & 0x38) == 0x08 && (type & 0x07) <= 4) {  // FIXED
        is_fixed = true;
        order = type & 0x07;
    } else if (type & 0x20) {      // LPC
        is_lpc = true;
        order = (type & 0x1F) + 1;
    } else {
        return false;
    }

    int32_t coefs[32];
    int shift = 0;
    if (is_fixed || is_lpc) {
        if (order > blocksize) return false;
        for (int i = 0; i < order; ++i) sig[i] = br.bits_s(bps);  // warmup
        if (is_lpc) {
            int precision = br.bits_u(4) + 1;
            if (precision == 16) return false;  // code 0b1111 is invalid
            shift = (int)br.bits_s(5);
            if (shift < 0) return false;
            for (int i = 0; i < order; ++i)
                coefs[i] = (int32_t)br.bits_s(precision);
        }
        // residual
        int method = br.bits_u(2);
        if (method > 1) return false;
        int plen = method == 0 ? 4 : 5;
        uint32_t escape = method == 0 ? 0xF : 0x1F;
        int part_order = br.bits_u(4);
        int partitions = 1 << part_order;
        if ((blocksize % partitions) != 0) return false;
        int psize = blocksize >> part_order;
        if (psize <= 0) return false;
        int idx = order;
        for (int p = 0; p < partitions; ++p) {
            int count = psize - (p == 0 ? order : 0);
            if (count < 0) return false;
            uint32_t param = br.bits_u(plen);
            if (param == escape) {
                int raw = br.bits_u(5);
                for (int i = 0; i < count; ++i)
                    sig[idx++] = raw ? br.bits_s(raw) : 0;
            } else {
                for (int i = 0; i < count; ++i) {
                    uint32_t q = br.unary();
                    uint64_t bits = param ? br.bits_u64(param) : 0;
                    uint64_t zz = ((uint64_t)q << param) | bits;
                    sig[idx++] = (int64_t)(zz >> 1) ^ -(int64_t)(zz & 1);
                }
            }
            if (br.error) return false;
        }
        // predict
        if (is_fixed) {
            switch (order) {
                case 0: break;
                case 1:
                    for (int i = 1; i < blocksize; ++i)
                        sig[i] = (int64_t)((uint64_t)sig[i]
                                 + (uint64_t)sig[i - 1]);
                    break;
                case 2:
                    for (int i = 2; i < blocksize; ++i)
                        sig[i] = (int64_t)((uint64_t)sig[i]
                                 + 2u * (uint64_t)sig[i - 1]
                                 - (uint64_t)sig[i - 2]);
                    break;
                case 3:
                    for (int i = 3; i < blocksize; ++i)
                        sig[i] = (int64_t)((uint64_t)sig[i]
                                 + 3u * (uint64_t)sig[i - 1]
                                 - 3u * (uint64_t)sig[i - 2]
                                 + (uint64_t)sig[i - 3]);
                    break;
                case 4:
                    for (int i = 4; i < blocksize; ++i)
                        sig[i] = (int64_t)((uint64_t)sig[i]
                                 + 4u * (uint64_t)sig[i - 1]
                                 - 6u * (uint64_t)sig[i - 2]
                                 + 4u * (uint64_t)sig[i - 3]
                                 - (uint64_t)sig[i - 4]);
                    break;
            }
        } else {
            for (int i = order; i < blocksize; ++i) {
                // corrupt input can drive residuals to ~2^53: do the
                // accumulation in unsigned arithmetic (wraparound is
                // DEFINED; signed overflow is UB) and cast back
                uint64_t acc = 0;
                for (int j = 0; j < order; ++j)
                    acc += (uint64_t)(int64_t)coefs[j]
                           * (uint64_t)sig[i - 1 - j];
                sig[i] = (int64_t)((uint64_t)sig[i]
                         + (uint64_t)((int64_t)acc >> shift));
            }
        }
    }
    if (wasted)   // unsigned shift: << on negative signed values is UB
        for (int i = 0; i < blocksize; ++i)
            sig[i] = (int64_t)((uint64_t)sig[i] << wasted);
    return !br.error;
}

// decode the UTF-8-style coded number in a frame header
bool read_utf8(BitReader& br, uint64_t* out) {
    uint32_t b = br.bits_u(8);
    if (br.error) return false;
    int extra;
    uint64_t v;
    if ((b & 0x80) == 0) { *out = b; return true; }
    else if ((b & 0xE0) == 0xC0) { v = b & 0x1F; extra = 1; }
    else if ((b & 0xF0) == 0xE0) { v = b & 0x0F; extra = 2; }
    else if ((b & 0xF8) == 0xF0) { v = b & 0x07; extra = 3; }
    else if ((b & 0xFC) == 0xF8) { v = b & 0x03; extra = 4; }
    else if ((b & 0xFE) == 0xFC) { v = b & 0x01; extra = 5; }
    else if (b == 0xFE) { v = 0; extra = 6; }
    else return false;
    for (int i = 0; i < extra; ++i) {
        uint32_t c = br.bits_u(8);
        if (br.error || (c & 0xC0) != 0x80) return false;
        v = (v << 6) | (c & 0x3F);
    }
    *out = v;
    return true;
}

}  // namespace

extern "C" {

int zl_flac_abi_version() { return 1; }

int zl_flac_probe(const uint8_t* data, int64_t size, int32_t* rate,
                  int32_t* channels, int32_t* bits, int64_t* total_samples) {
    StreamInfo si;
    if (!parse_header(data, (size_t)size, &si)) return -1;
    if (rate) *rate = (int32_t)si.sample_rate;
    if (channels) *channels = si.channels;
    if (bits) *bits = si.bits;
    if (total_samples) *total_samples = (int64_t)si.total_samples;
    return 0;
}

int64_t zl_flac_decode(const uint8_t* data, int64_t size, float* out,
                       int64_t out_capacity_frames) {
    StreamInfo si;
    size_t first = parse_header(data, (size_t)size, &si);
    if (!first) return -1;
    if (si.channels < 1 || si.channels > 8 || si.sample_rate == 0) return -2;

    BitReader br{data, (size_t)size};
    br.byte = first;

    const int C = si.channels;
    std::vector<std::vector<int64_t>> ch((size_t)C);
    int64_t frames_out = 0;
    // trailing-tag tolerance (see the sync-mismatch break below): once at
    // least one frame decoded on an UNKNOWN-length stream, a failed header
    // parse in trailing bytes (a tag starting with a sync-lookalike
    // 0xFF 0xF8..) ends the decode instead of discarding everything
    const bool tolerant_tail = si.total_samples == 0;
#define ZL_HDR_FAIL(rc) \
    do { if (tolerant_tail && frames_out > 0) goto done; return rc; } while (0)

    while (br.byte + 2 <= br.size) {
        // sync code 0b11111111_111110xx. Non-frame trailing bytes after at
        // least one decoded frame (appended tags on unknown-length streams)
        // end the decode instead of failing it.
        uint32_t sync = br.bits_u(14);
        if (br.error) break;
        if (sync != 0x3FFE) {
            if (frames_out > 0) break;
            return -3;
        }
        br.bits_u(1);                       // reserved
        br.bits_u(1);                       // blocking strategy
        uint32_t bs_code = br.bits_u(4);
        uint32_t sr_code = br.bits_u(4);
        uint32_t ch_code = br.bits_u(4);
        uint32_t ss_code = br.bits_u(3);
        br.bits_u(1);                       // reserved
        uint64_t frame_no;
        if (!read_utf8(br, &frame_no)) ZL_HDR_FAIL(-4);

        int blocksize;
        switch (bs_code) {
            case 0: ZL_HDR_FAIL(-5);
            case 1: blocksize = 192; break;
            case 6: blocksize = (int)br.bits_u(8) + 1; break;
            case 7: blocksize = (int)br.bits_u(16) + 1; break;
            default:
                blocksize = bs_code <= 5 ? 576 << (bs_code - 2)
                                         : 256 << (bs_code - 8);
        }
        switch (sr_code) {
            case 12: br.bits_u(8); break;       // kHz byte: value unused
            case 13: case 14: br.bits_u(16); break;
            case 15: ZL_HDR_FAIL(-6);
            default: break;                     // coded or from STREAMINFO
        }
        int bps;
        switch (ss_code) {
            case 0: bps = si.bits; break;
            case 1: bps = 8; break;
            case 2: bps = 12; break;
            case 4: bps = 16; break;
            case 5: bps = 20; break;
            case 6: bps = 24; break;
            case 7: bps = 32; break;
            default: ZL_HDR_FAIL(-7);
        }
        br.bits_u(8);  // CRC-8 (not verified)
        if (br.error) ZL_HDR_FAIL(-8);

        if (ch_code > 10) ZL_HDR_FAIL(-12);  // 11-15 are reserved
        int nch = ch_code < 8 ? (int)ch_code + 1 : 2;
        if (nch != C) ZL_HDR_FAIL(-9);
        for (int c = 0; c < C; ++c)
            if ((int)ch[c].size() < blocksize) ch[c].resize(blocksize);

        for (int c = 0; c < nch; ++c) {
            int eff = bps;
            // the side channel carries one extra bit
            if ((ch_code == 8 && c == 1) || (ch_code == 9 && c == 0) ||
                (ch_code == 10 && c == 1))
                eff += 1;
            if (!decode_subframe(br, ch[c].data(), blocksize, eff))
                return -10;
        }
        br.align();
        br.bits_u(16);  // CRC-16 (not verified)
        if (br.error) ZL_HDR_FAIL(-8);

        // undo inter-channel decorrelation
        if (ch_code == 8) {           // left/side: R = L - side
            for (int i = 0; i < blocksize; ++i)
                ch[1][i] = ch[0][i] - ch[1][i];
        } else if (ch_code == 9) {    // right/side: L = R + side
            for (int i = 0; i < blocksize; ++i) {
                int64_t side = ch[0][i];
                ch[0][i] = ch[1][i] + side;
            }
        } else if (ch_code == 10) {   // mid/side
            for (int i = 0; i < blocksize; ++i) {
                int64_t mid = ch[0][i], side = ch[1][i];
                mid = (mid << 1) | (side & 1);
                ch[0][i] = (mid + side) >> 1;
                ch[1][i] = (mid - side) >> 1;
            }
        }

        if (frames_out + blocksize > out_capacity_frames) return -11;
        float scale = 1.0f / (float)(1LL << (bps - 1));
        for (int i = 0; i < blocksize; ++i)
            for (int c = 0; c < C; ++c)
                out[(frames_out + i) * C + c] = (float)ch[c][i] * scale;
        frames_out += blocksize;
        if (si.total_samples && (uint64_t)frames_out >= si.total_samples)
            break;
        if (br.size - br.byte < 10)  // no room for another frame header
            break;
    }
done:
    if (si.total_samples && (uint64_t)frames_out > si.total_samples)
        frames_out = (int64_t)si.total_samples;
    return frames_out;
}
#undef ZL_HDR_FAIL

}  // extern "C"

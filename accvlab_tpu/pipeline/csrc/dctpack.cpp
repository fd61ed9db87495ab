// Native DCT-wire band encoder (hot half of DCTWirePacker).
//
// Sibling of wirepack.cpp (the pixel-wire encoder): the Python step picks
// per-group bit widths and the DC band's spatial predictor from value
// histograms, then bitplane-packs each band group with a unified
// patched-exception list. Both passes stream over every image's
// coefficient bands inside the producer thread, so they compete with the
// JPEG entropy decode for the host budget; this engine does each pass in
// ONE cache-friendly sweep with no intermediate arrays (the numpy path
// materializes the zigzag band array plus the DC residual variants).
//
// Layout contract (mirrors processing_steps/dct_wire.py): bands is
// C-contiguous int16 (NB, BH, BWP), zigzag band order; group 0 is always
// the DC band alone (diagonal 0 has exactly one band); DC predictor
// modes: 0 none, 1 vertical (row 0 horizontally differenced), 2 plane
// (2-D second difference). Zigzag values fit 14 bits (|residual| <= 8188)
// -> 16384-bin histograms. ctypes releases the GIL for each call.

#include <cstdint>

namespace {

constexpr int64_t kBins = 1 << 14;

inline uint16_t zig(int v) {
    // unsigned arithmetic: a signed left shift of a negative value is UB
    // before C++20; this form is well-defined and bit-identical.
    // Defense in depth: ajd_read_dct clamps coefficients to +-2047, which
    // bounds every residual's zigzag under kBins; clamp here anyway so a
    // caller bug can corrupt the wire but never memory (histogram index
    // and bitplane width both stay in range).
    if (v > 8191) v = 8191;
    if (v < -8191) v = -8191;
    const uint32_t u = static_cast<uint32_t>(v);
    const uint32_t sign = static_cast<uint32_t>(v >> 31);  // 0 or ~0
    return static_cast<uint16_t>((u << 1) ^ sign);
}

inline int dc_residual(const int16_t* dc, int64_t bwp, int64_t y, int64_t x,
                       int mode) {
    const int v = dc[y * bwp + x];
    if (mode == 0) return v;
    const int rv = y ? v - dc[(y - 1) * bwp + x] : v;
    if (mode == 1)
        return y == 0 ? (x ? v - static_cast<int>(dc[x - 1]) : v) : rv;
    // mode 2: horizontal difference of the vertical residuals
    if (x == 0) return rv;
    const int vl = dc[y * bwp + x - 1];
    const int rvl = y ? vl - dc[(y - 1) * bwp + x - 1] : vl;
    return rv - rvl;
}

}  // namespace

extern "C" {

namespace {

// Collapse a full histogram to the 15-entry "fits" summary the width
// optimizer consumes: fits[b] = count(zigzag < 2^b), b in 0..14. (The
// cost model only ever evaluates power-of-two thresholds, so shipping
// 16384-bin histograms to Python would be pure allocation churn.)
inline void emit_fits(const uint32_t* hist, uint32_t* fits) {
    uint32_t acc = 0;
    int64_t z = 0;
    for (int b = 0; b <= 14; ++b) {
        const int64_t t = int64_t{1} << b;
        for (; z < t && z < kBins; ++z) acc += hist[z];
        fits[b] = acc;
    }
}

}  // namespace

// AC analyze: per-group width summaries. fits: ngroups x 15 uint32 out
// (row 0 — the DC band — is SKIPPED here, see accvlab_dct_dc_analyze).
// bounds: ngroups+1 band indices.
void accvlab_dct_analyze(const int16_t* bands, int64_t bh, int64_t bwp,
                         const int64_t* bounds, int64_t ngroups,
                         uint32_t* fits) {
    const int64_t plane = bh * bwp;
    uint32_t hist[kBins];
    for (int64_t g = 1; g < ngroups; ++g) {
        for (int64_t i = 0; i < kBins; ++i) hist[i] = 0;
        const int16_t* p = bands + bounds[g] * plane;
        const int64_t n = (bounds[g + 1] - bounds[g]) * plane;
        for (int64_t i = 0; i < n; ++i) hist[zig(p[i])]++;
        emit_fits(hist, fits + g * 15);
    }
}

// DC analyze: all three predictor variants in one sweep. fits3: 3 x 15
// uint32 out.
void accvlab_dct_dc_analyze(const int16_t* dc, int64_t bh, int64_t bwp,
                            uint32_t* fits3) {
    static_assert(kBins == 16384, "zigzag of DC residuals fits 14 bits");
    uint32_t* hists = new uint32_t[3 * kBins]();
    for (int64_t y = 0; y < bh; ++y) {
        for (int64_t x = 0; x < bwp; ++x) {
            hists[zig(dc_residual(dc, bwp, y, x, 0))]++;
            hists[kBins + zig(dc_residual(dc, bwp, y, x, 1))]++;
            hists[2 * kBins + zig(dc_residual(dc, bwp, y, x, 2))]++;
        }
    }
    for (int mode = 0; mode < 3; ++mode)
        emit_fits(hists + mode * kBins, fits3 + mode * 15);
    delete[] hists;
}

// Pack one group: bands_g points at the group's first band plane
// ((nb, bh, bwp) int16); if dc_mode >= 0, band 0 IS the DC band and is
// residual-coded with that predictor. bp out: (b, nb*bh, bwp/8) uint8
// (np.packbits big-bit-order). Exceptions (zigzag >= 2^b) append to the
// caller's unified excp/excv starting at index `ne`, positions offset by
// `pos_offset` (the group's base in the concatenated band space); writes
// are clipped at `cap` but the TRUE running count is returned — the
// caller must treat a result > cap as a sizing bug.
int64_t accvlab_dct_pack_group(const int16_t* bands_g, int64_t nb, int64_t bh,
                               int64_t bwp, int dc_mode, int b, uint8_t* bp,
                               int32_t* excp, int16_t* excv, int64_t cap,
                               int64_t pos_offset, int64_t ne) {
    const int64_t wb = bwp / 8;
    const int64_t plane_stride = nb * bh * wb;
    const uint32_t limit = 1u << b;
    for (int64_t band = 0; band < nb; ++band) {
        const int16_t* src = bands_g + band * bh * bwp;
        const bool is_dc = (dc_mode >= 0 && band == 0);
        for (int64_t y = 0; y < bh; ++y) {
            const int16_t* row = src + y * bwp;
            for (int64_t j = 0; j < wb; ++j) {
                uint16_t z[8];
                for (int t = 0; t < 8; ++t) {
                    const int64_t x = j * 8 + t;
                    const int v = is_dc ? dc_residual(src, bwp, y, x, dc_mode)
                                        : static_cast<int>(row[x]);
                    const uint16_t zv = zig(v);
                    z[t] = zv;
                    if (zv >= limit) {
                        if (ne < cap) {
                            excp[ne] = static_cast<int32_t>(
                                pos_offset + (band * bh + y) * bwp + x);
                            excv[ne] = static_cast<int16_t>(zv);
                        }
                        ne++;
                    }
                }
                uint8_t* out = bp + (band * bh + y) * wb + j;
                for (int k = 0; k < b; ++k) {
                    uint8_t byte = 0;
                    for (int t = 0; t < 8; ++t)
                        byte |= static_cast<uint8_t>((z[t] >> k) & 1)
                                << (7 - t);
                    out[static_cast<int64_t>(k) * plane_stride] = byte;
                }
            }
        }
    }
    return ne;
}

}  // extern "C"

// Native wire-compression encoder (hot half of WirePlanePacker).
//
// The Python step chooses the predictor mode and base width from value
// histograms, then bitplane-packs the residuals; both passes stream over
// every decoded image inside the producer thread, so they compete with
// JPEG decode for the host budget. This engine does each pass in ONE
// cache-friendly sweep with no intermediate arrays (the numpy path
// materializes both predictors' zigzag residual planes):
//
//   accvlab_wire_analyze  — residual + zigzag + 1024-bin histogram for BOTH
//                           predictors in a single pass.
//   accvlab_wire_pack     — recompute the chosen predictor's residuals and
//                           emit bitplanes (np.packbits big-bit-order) and
//                           the PFOR exception list in a single pass.
//
// Layout contract (mirrors wire_compression.py): plane is C-contiguous
// uint8 (H, Wr); C = trailing group stride (elements per step along the
// horizontal axis 1); mode 1 = vertical predictor (row 0 horizontally
// differenced), mode 2 = 2-D plane predictor (second difference).
// ctypes releases the GIL for the duration of each call.

#include <cstdint>

namespace {

inline uint16_t zig(int v) {
    // unsigned arithmetic: a signed left shift of a negative value is UB
    // before C++20; this form is well-defined and bit-identical
    const uint32_t u = static_cast<uint32_t>(v);
    const uint32_t sign = static_cast<uint32_t>(v >> 31);  // 0 or ~0
    return static_cast<uint16_t>((u << 1) ^ sign);
}

// residuals of both modes at (row y via pointers, col i)
inline void residuals_at(const uint8_t* row, const uint8_t* up, int64_t i,
                         int64_t C, bool first_row, int* r1, int* r2) {
    const int rv = first_row ? static_cast<int>(row[i])
                             : static_cast<int>(row[i]) - static_cast<int>(up[i]);
    if (i >= C) {
        const int rvl = first_row
                            ? static_cast<int>(row[i - C])
                            : static_cast<int>(row[i - C]) -
                                  static_cast<int>(up[i - C]);
        *r2 = rv - rvl;
        *r1 = first_row ? rv - rvl /* row 0 h-differenced */ : rv;
    } else {
        *r2 = rv;
        *r1 = rv;
    }
}

}  // namespace

extern "C" {

// hist1/hist2: 1024 uint32 bins, zeroed by the caller.
void accvlab_wire_analyze(const uint8_t* p, int64_t h, int64_t wr, int64_t C,
                          uint32_t* hist1, uint32_t* hist2) {
    for (int64_t y = 0; y < h; ++y) {
        const uint8_t* row = p + y * wr;
        const uint8_t* up = row - wr;
        const bool first = (y == 0);
        for (int64_t i = 0; i < wr; ++i) {
            int r1, r2;
            residuals_at(row, up, i, C, first, &r1, &r2);
            hist1[zig(r1)]++;
            hist2[zig(r2)]++;
        }
    }
}

// bp: (b, h, wr/8) uint8 out; excp/excv: capacity `cap`, PRE-FILLED with
// the padding sentinel by the caller. Returns the true exception count
// (may exceed cap only if the caller sized cap wrong — entries beyond cap
// are dropped here and the caller must treat ne > cap as an error).
int64_t accvlab_wire_pack(const uint8_t* p, int64_t h, int64_t wr, int64_t C,
                          int mode, int b, uint8_t* bp, int32_t* excp,
                          int16_t* excv, int64_t cap) {
    const int64_t wb = wr / 8;
    const int64_t plane_stride = h * wb;
    const uint32_t limit = 1u << b;
    int64_t ne = 0;
    for (int64_t y = 0; y < h; ++y) {
        const uint8_t* row = p + y * wr;
        const uint8_t* up = row - wr;
        const bool first = (y == 0);
        for (int64_t j = 0; j < wb; ++j) {
            uint16_t z[8];
            for (int t = 0; t < 8; ++t) {
                const int64_t i = j * 8 + t;
                int r1, r2;
                residuals_at(row, up, i, C, first, &r1, &r2);
                const uint16_t zv = zig(mode == 1 ? r1 : r2);
                z[t] = zv;
                if (zv >= limit) {
                    if (ne < cap) {
                        excp[ne] = static_cast<int32_t>(y * wr + i);
                        excv[ne] = static_cast<int16_t>(zv);
                    }
                    ne++;
                }
            }
            uint8_t* out = bp + y * wb + j;
            for (int k = 0; k < b; ++k) {
                uint8_t byte = 0;
                for (int t = 0; t < 8; ++t) {
                    byte |= static_cast<uint8_t>((z[t] >> k) & 1) << (7 - t);
                }
                out[static_cast<int64_t>(k) * plane_stride] = byte;
            }
        }
    }
    return ne;
}

}  // extern "C"

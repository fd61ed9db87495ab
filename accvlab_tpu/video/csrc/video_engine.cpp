// Random-access GOP video engine for TPU hosts.
//
// TPU-native re-design of the reference's PyNvOnDemandDecoder module
// (packages/on_demand_video_decoder/ext_impl/src/PyNvOnDemandDecoder/, ~9k LoC
// of NVDEC/cuvid plumbing). TPU hosts have no NVDEC, so the design keeps the
// reference's host-side architecture — FFmpeg demux + keyframe/pts index,
// GOP-minimal packet extraction, self-describing serialized packet bundles,
// decoder-state continuity for sequential stream reading — but decodes with
// libavcodec software decoders into RGB host buffers that feed the
// device-resident augment stage (BASELINE.json north star).
//
// C API with ctypes-friendly signatures; every call releases the GIL
// (ctypes), so Python-level thread pools provide the demux/decode
// parallelism the reference gets from its C++ ThreadRunner pools.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -o libaccvlab_video.so \
//        video_engine.cpp -lavformat -lavcodec -lavutil -lswscale

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <set>
#include <unordered_map>
#include <string>
#include <memory>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

namespace {

// ------------------------------------------------------------------ //
// Serialized GOP packet bundle (self-describing; parity with the      //
// reference's createSerializedPacketBundle, PyNvGopDecoder.hpp:47)    //
// ------------------------------------------------------------------ //

constexpr uint32_t kBundleMagic = 0x42474141;  // "AAGB"
constexpr uint32_t kBundleVersion = 1;

struct BundleHeader {
    uint32_t magic;
    uint32_t version;
    int32_t codec_id;
    int32_t width;
    int32_t height;
    int32_t first_frame_id;  // display id of the GOP's keyframe
    int32_t num_frames;      // frames covered by this bundle
    int32_t num_packets;
    int32_t extradata_size;
    int32_t reserved;
};

struct PacketEntry {
    uint64_t size;
    int64_t pts;
    int32_t display_rel;  // display index relative to first_frame_id (-1 unknown)
    int32_t flags;
};

thread_local std::string g_error;

void set_error(const std::string& msg) { g_error = msg; }

struct QuietLogs {
    QuietLogs() { av_log_set_level(AV_LOG_ERROR); }
} g_quiet_logs;  // codec chatter off by default (AV_LOG_ERROR)

// ------------------------------------------------------------------ //
// Demuxer + frame index                                              //
// ------------------------------------------------------------------ //

struct Indexer {
    AVFormatContext* fmt = nullptr;
    int stream_index = -1;
    int width = 0, height = 0;
    AVCodecID codec_id = AV_CODEC_ID_NONE;
    std::vector<uint8_t> extradata;
    // per display-ordered frame: pts and whether its packet was a keyframe
    std::vector<int64_t> pts_sorted;          // display order
    std::vector<int32_t> keyframe_of_frame;   // display id -> keyframe display id
    std::vector<uint8_t> frame_is_key;        // display id -> key flag
    std::mutex mutex;                          // format ctx is not thread safe

    ~Indexer() {
        if (fmt) avformat_close_input(&fmt);
    }

    int display_id_of_pts(int64_t pts) const {
        auto it = std::lower_bound(pts_sorted.begin(), pts_sorted.end(), pts);
        if (it == pts_sorted.end() || *it != pts) return -1;
        return static_cast<int>(it - pts_sorted.begin());
    }
};

Indexer* open_and_index(const char* path) {
    auto idx = new Indexer();
    if (avformat_open_input(&idx->fmt, path, nullptr, nullptr) < 0) {
        set_error(std::string("cannot open ") + path);
        delete idx;
        return nullptr;
    }
    if (avformat_find_stream_info(idx->fmt, nullptr) < 0) {
        set_error("cannot find stream info");
        delete idx;
        return nullptr;
    }
    idx->stream_index =
        av_find_best_stream(idx->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
    if (idx->stream_index < 0) {
        set_error("no video stream");
        delete idx;
        return nullptr;
    }
    AVCodecParameters* par = idx->fmt->streams[idx->stream_index]->codecpar;
    idx->width = par->width;
    idx->height = par->height;
    idx->codec_id = par->codec_id;
    if (par->extradata_size > 0) {
        idx->extradata.assign(par->extradata, par->extradata + par->extradata_size);
    }

    // Index pass: walk all packets, record (pts, keyframe).
    std::vector<std::pair<int64_t, uint8_t>> entries;
    AVPacket* pkt = av_packet_alloc();
    while (av_read_frame(idx->fmt, pkt) >= 0) {
        if (pkt->stream_index == idx->stream_index) {
            int64_t pts = pkt->pts != AV_NOPTS_VALUE ? pkt->pts : pkt->dts;
            entries.emplace_back(pts, (pkt->flags & AV_PKT_FLAG_KEY) ? 1 : 0);
        }
        av_packet_unref(pkt);
    }
    av_packet_free(&pkt);
    std::sort(entries.begin(), entries.end());
    idx->pts_sorted.reserve(entries.size());
    idx->frame_is_key.reserve(entries.size());
    for (auto& e : entries) {
        idx->pts_sorted.push_back(e.first);
        idx->frame_is_key.push_back(e.second);
    }
    idx->keyframe_of_frame.resize(entries.size());
    int last_key = 0;
    for (size_t i = 0; i < entries.size(); ++i) {
        if (idx->frame_is_key[i]) last_key = static_cast<int>(i);
        idx->keyframe_of_frame[i] = last_key;
    }
    // rewind for later GOP extraction
    av_seek_frame(idx->fmt, idx->stream_index, idx->pts_sorted.empty() ? 0 : idx->pts_sorted[0],
                  AVSEEK_FLAG_BACKWARD);
    return idx;
}

// Extract the packet set for the WHOLE GOP containing target_frame
// (keyframe .. frame before the next keyframe), matching the reference's
// GetGOP contract: the returned gop_len covers the full GOP so the cache
// can serve any frame inside it.
bool extract_gop(Indexer* idx, int target_frame, int /*unused*/,
                 std::vector<uint8_t>& out) {
    std::lock_guard<std::mutex> lock(idx->mutex);
    int n = static_cast<int>(idx->pts_sorted.size());
    if (target_frame < 0 || target_frame >= n) {
        set_error("frame id out of range");
        return false;
    }
    int key = idx->keyframe_of_frame[target_frame];
    int gop_end = n - 1;
    for (int f = key + 1; f < n; ++f) {
        if (idx->frame_is_key[f]) {
            gop_end = f - 1;
            break;
        }
    }
    int64_t key_pts = idx->pts_sorted[key];
    int64_t end_pts = idx->pts_sorted[gop_end];

    if (av_seek_frame(idx->fmt, idx->stream_index, key_pts, AVSEEK_FLAG_BACKWARD) < 0) {
        set_error("seek failed");
        return false;
    }

    // Collect packets until every display frame of the GOP has its packet.
    // This self-adapts to B-frame reordering AND open-GOP content: leading
    // B-frames of the next GOP display inside this GOP but decode AFTER the
    // next keyframe, so the bundle transparently includes the overlap
    // packets (next keyframe + the Bs) — the reference's GOP-overlap
    // handling (test_open_gop_overlap).
    std::set<int64_t> needed(idx->pts_sorted.begin() + key,
                             idx->pts_sorted.begin() + gop_end + 1);
    std::vector<std::vector<uint8_t>> datas;
    std::vector<PacketEntry> entries;
    AVPacket* pkt = av_packet_alloc();
    bool started = false;
    while (!needed.empty() && av_read_frame(idx->fmt, pkt) >= 0) {
        if (pkt->stream_index != idx->stream_index) {
            av_packet_unref(pkt);
            continue;
        }
        int64_t pts = pkt->pts != AV_NOPTS_VALUE ? pkt->pts : pkt->dts;
        if (!started) {
            if (pts == key_pts) {
                started = true;
            } else {
                av_packet_unref(pkt);
                continue;
            }
        }
        PacketEntry e;
        e.size = static_cast<uint64_t>(pkt->size);
        e.pts = pts;
        int did = idx->display_id_of_pts(pts);
        e.display_rel = did >= 0 ? did - key : -1;
        e.flags = pkt->flags;
        entries.push_back(e);
        datas.emplace_back(pkt->data, pkt->data + pkt->size);
        needed.erase(pts);
        av_packet_unref(pkt);
    }
    av_packet_free(&pkt);
    if (!started || entries.empty() || !needed.empty()) {
        set_error("no packets extracted");
        return false;
    }

    BundleHeader hdr;
    hdr.magic = kBundleMagic;
    hdr.version = kBundleVersion;
    hdr.codec_id = static_cast<int32_t>(idx->codec_id);
    hdr.width = idx->width;
    hdr.height = idx->height;
    hdr.first_frame_id = key;
    hdr.num_frames = gop_end - key + 1;
    hdr.num_packets = static_cast<int32_t>(entries.size());
    hdr.extradata_size = static_cast<int32_t>(idx->extradata.size());
    hdr.reserved = 0;

    size_t total = sizeof(BundleHeader) + idx->extradata.size() +
                   entries.size() * sizeof(PacketEntry);
    for (auto& d : datas) total += d.size();
    out.resize(total);
    uint8_t* p = out.data();
    std::memcpy(p, &hdr, sizeof(hdr));
    p += sizeof(hdr);
    if (!idx->extradata.empty()) {
        std::memcpy(p, idx->extradata.data(), idx->extradata.size());
        p += idx->extradata.size();
    }
    std::memcpy(p, entries.data(), entries.size() * sizeof(PacketEntry));
    p += entries.size() * sizeof(PacketEntry);
    for (auto& d : datas) {
        std::memcpy(p, d.data(), d.size());
        p += d.size();
    }
    return true;
}

// ------------------------------------------------------------------ //
// Decoder                                                             //
// ------------------------------------------------------------------ //

struct Decoder {
    AVCodecContext* ctx = nullptr;
    SwsContext* sws = nullptr;
    int sws_w = 0, sws_h = 0;
    int sws_ow = 0, sws_oh = 0;
    AVPixelFormat sws_fmt = AV_PIX_FMT_NONE;
    AVPixelFormat sws_dst = AV_PIX_FMT_NONE;

    ~Decoder() {
        if (sws) sws_freeContext(sws);
        if (ctx) avcodec_free_context(&ctx);
    }

    bool init(AVCodecID codec_id, const uint8_t* extradata, int extradata_size) {
        const AVCodec* codec = avcodec_find_decoder(codec_id);
        if (!codec) {
            set_error("decoder not found");
            return false;
        }
        ctx = avcodec_alloc_context3(codec);
        if (extradata_size > 0) {
            ctx->extradata = static_cast<uint8_t*>(
                av_mallocz(extradata_size + AV_INPUT_BUFFER_PADDING_SIZE));
            std::memcpy(ctx->extradata, extradata, extradata_size);
            ctx->extradata_size = extradata_size;
        }
        ctx->thread_count = 0;  // auto
        if (avcodec_open2(ctx, codec, nullptr) < 0) {
            set_error("cannot open decoder");
            return false;
        }
        return true;
    }

    // Output formats for to_wire. kWireYuv420 is the TPU wire layout:
    // planar Y (H*W) followed by interleaved CbCr ((H/2)*(W/2)*2) == NV12 —
    // 1.5 B/px shipped host->device with the chroma upsample + color matrix
    // fused into the device program (the reference's NVDEC split: it ships
    // NV12 and converts on-GPU, ColorSpace.cu:227-283).
    enum WireFmt { kWireRgb = 0, kWireBgr = 1, kWireYuv420 = 2 };

    // convert a decoded frame into dst in the requested wire format; if
    // color_out is non-null, writes {AVColorSpace, AVColorRange} so the
    // device-side conversion can pick the right matrix/range. out_w/out_h
    // (0 = source size) fuse a swscale resize into the same pass — the
    // host analog of DALI's fused decode+resize: decoding AT the model's
    // input size cuts wire bytes by the area ratio before transfer.
    bool to_wire(AVFrame* frame, uint8_t* dst, int out_fmt, int32_t* color_out,
                 int out_w = 0, int out_h = 0) {
        int ow = out_w > 0 ? out_w : frame->width;
        int oh = out_h > 0 ? out_h : frame->height;
        AVPixelFormat dst_fmt = out_fmt == kWireBgr   ? AV_PIX_FMT_BGR24
                                : out_fmt == kWireRgb ? AV_PIX_FMT_RGB24
                                                      : AV_PIX_FMT_NV12;
        AVPixelFormat src_fmt = static_cast<AVPixelFormat>(frame->format);
        if (out_fmt == kWireYuv420 && ((ow | oh) & 1)) {
            set_error("yuv420 wire output needs even frame dimensions");
            return false;
        }
        // out_hw is user-controlled since the fused-resize change: bound it
        // so the int linesize (ow*3) can never overflow and absurd targets
        // fail with a message instead of inside swscale
        if (ow <= 0 || oh <= 0 || ow > (1 << 20) || oh > (1 << 20)) {
            set_error("output dimensions out of range (1..1048576)");
            return false;
        }
        if (!sws || sws_w != frame->width || sws_h != frame->height ||
            sws_ow != ow || sws_oh != oh || sws_fmt != src_fmt ||
            sws_dst != dst_fmt) {
            if (sws) sws_freeContext(sws);
            // SWS_AREA for downscale (anti-aliased, the DALI resize default);
            // SWS_BILINEAR otherwise (matches the established RGB path)
            int flags = (ow < frame->width || oh < frame->height) ? SWS_AREA
                                                                  : SWS_BILINEAR;
            sws = sws_getContext(frame->width, frame->height, src_fmt, ow, oh,
                                 dst_fmt, flags, nullptr, nullptr, nullptr);
            if (!sws) {
                // e.g. an unscalable source format or an internal
                // allocation failure — surface it, never sws_scale(NULL)
                set_error("sws_getContext failed for the requested resize");
                sws_w = sws_h = sws_ow = sws_oh = -1;
                return false;
            }
            sws_w = frame->width;
            sws_h = frame->height;
            sws_ow = ow;
            sws_oh = oh;
            sws_fmt = src_fmt;
            sws_dst = dst_fmt;
        }
        if (out_fmt == kWireYuv420) {
            // NV12: dst plane 0 = Y, plane 1 = interleaved CbCr right after.
            // For 8-bit yuv420p sources at native size this is a copy +
            // interleave (no colorspace math on the host at all); 10-bit
            // sources are dithered down to 8 by swscale.
            size_t y_bytes = static_cast<size_t>(ow) * oh;
            uint8_t* dst_data[4] = {dst, dst + y_bytes, nullptr, nullptr};
            int dst_linesize[4] = {ow, ow, 0, 0};
            sws_scale(sws, frame->data, frame->linesize, 0, frame->height, dst_data,
                      dst_linesize);
        } else {
            uint8_t* dst_data[4] = {dst, nullptr, nullptr, nullptr};
            int dst_linesize[4] = {ow * 3, 0, 0, 0};
            sws_scale(sws, frame->data, frame->linesize, 0, frame->height, dst_data,
                      dst_linesize);
        }
        if (color_out) {
            color_out[0] = static_cast<int32_t>(frame->colorspace);
            color_out[1] = static_cast<int32_t>(frame->color_range);
        }
        return true;
    }

    bool to_rgb(AVFrame* frame, uint8_t* dst, int as_bgr) {
        return to_wire(frame, dst, as_bgr ? kWireBgr : kWireRgb, nullptr);
    }
};

// bytes per frame for a wire format
size_t wire_frame_bytes(int out_fmt, int width, int height) {
    size_t px = static_cast<size_t>(width) * height;
    return out_fmt == Decoder::kWireYuv420 ? px * 3 / 2 : px * 3;
}

// ------------------------------------------------------------------ //
// Per-thread decoder cache for bundle decode (parity: the reference's //
// InitializeDecoders NvDecoder pooling). avcodec open+teardown costs  //
// ~0.9 ms — 83% of a single-frame random-access decode; callers run   //
// decodes from thread pools, so a small thread_local cache reuses     //
// contexts without locking. flush_buffers resets codec state          //
// (including EOF/drain) between independent GOPs. Slots are freed by  //
// the thread_local destructor at thread exit.                         //
// ------------------------------------------------------------------ //

struct DecoderCacheEntry {
    int codec_id = -1;
    std::vector<uint8_t> extradata;
    std::unique_ptr<Decoder> dec;
};

constexpr int kDecoderCacheSlots = 4;
thread_local DecoderCacheEntry g_decoder_cache[kDecoderCacheSlots];
thread_local int g_decoder_cache_clock = 0;

Decoder* acquire_decoder(AVCodecID codec_id, const uint8_t* extradata,
                         int extradata_size) {
    for (auto& e : g_decoder_cache) {
        if (e.dec && e.codec_id == codec_id &&
            e.extradata.size() == static_cast<size_t>(extradata_size) &&
            (extradata_size == 0 ||
             std::memcmp(e.extradata.data(), extradata, extradata_size) == 0)) {
            avcodec_flush_buffers(e.dec->ctx);
            return e.dec.get();
        }
    }
    auto dec = std::make_unique<Decoder>();
    if (!dec->init(codec_id, extradata, extradata_size)) return nullptr;
    DecoderCacheEntry& slot = g_decoder_cache[g_decoder_cache_clock];
    g_decoder_cache_clock = (g_decoder_cache_clock + 1) % kDecoderCacheSlots;
    slot.codec_id = codec_id;
    slot.extradata.assign(extradata, extradata + extradata_size);
    slot.dec = std::move(dec);
    return slot.dec.get();
}

// ------------------------------------------------------------------ //
// Stream reader (decoder-state continuity; parity: PyNvVideoReader)   //
// ------------------------------------------------------------------ //

struct StreamReader {
    Indexer* idx = nullptr;
    Decoder dec;
    int next_display = -1;  // display id the next decoded frame will have
    bool draining = false;

    ~StreamReader() { delete idx; }
};

bool reader_decode_next(StreamReader* r, AVFrame* frame) {
    AVPacket* pkt = av_packet_alloc();
    int ret;
    while (true) {
        ret = avcodec_receive_frame(r->dec.ctx, frame);
        if (ret == 0) {
            av_packet_free(&pkt);
            return true;
        }
        if (ret == AVERROR_EOF) {
            av_packet_free(&pkt);
            return false;
        }
        // need more input
        int rf;
        do {
            rf = av_read_frame(r->idx->fmt, pkt);
            if (rf < 0) {
                avcodec_send_packet(r->dec.ctx, nullptr);  // start draining
                break;
            }
        } while (pkt->stream_index != r->idx->stream_index &&
                 (av_packet_unref(pkt), true));
        if (rf >= 0) {
            avcodec_send_packet(r->dec.ctx, pkt);
            av_packet_unref(pkt);
        }
    }
}

}  // namespace

// ------------------------------------------------------------------ //
// C API                                                               //
// ------------------------------------------------------------------ //

extern "C" {

const char* avx_last_error() { return g_error.c_str(); }

void* avx_open(const char* path) { return open_and_index(path); }

void avx_close(void* h) { delete static_cast<Indexer*>(h); }

int avx_num_frames(void* h) {
    return static_cast<int>(static_cast<Indexer*>(h)->pts_sorted.size());
}
int avx_width(void* h) { return static_cast<Indexer*>(h)->width; }
int avx_height(void* h) { return static_cast<Indexer*>(h)->height; }
int avx_codec_id(void* h) {
    return static_cast<int>(static_cast<Indexer*>(h)->codec_id);
}
// Full stream-init probe (the reference's FastStreamInfo,
// FFmpegDemuxer.h:70-87): 13 int64 slots — codec_type, codec_id, width,
// height, pix format, time_base num/den, avg_frame_rate num/den,
// r_frame_rate num/den, start_time, duration.
int avx_stream_info(void* h, int64_t* out) {
    auto* idx = static_cast<Indexer*>(h);
    AVStream* st = idx->fmt->streams[idx->stream_index];
    AVCodecParameters* par = st->codecpar;
    out[0] = par->codec_type;
    out[1] = par->codec_id;
    out[2] = par->width;
    out[3] = par->height;
    out[4] = par->format;
    out[5] = st->time_base.num;
    out[6] = st->time_base.den;
    out[7] = st->avg_frame_rate.num;
    out[8] = st->avg_frame_rate.den;
    out[9] = st->r_frame_rate.num;
    out[10] = st->r_frame_rate.den;
    out[11] = st->start_time;
    out[12] = st->duration;
    return 0;
}

// VFR detection (parity: the reference demuxer's variable-frame-rate
// detection, FFmpegDemuxer.h:451 area): non-uniform deltas between
// consecutive display-ordered pts. CFR in a coarse container timebase
// quantizes unevenly (e.g. 30 fps in mkv's 1/1000: deltas 33,34,33,...),
// so exact equality would false-positive — deltas are CFR when their
// spread stays within max(1 tick, median/4). Returns 1 = VFR, 0 = CFR,
// -1 = unknown (< 3 frames).
int avx_is_vfr(void* h) {
    auto* idx = static_cast<Indexer*>(h);
    const auto& pts = idx->pts_sorted;
    if (pts.size() < 3) return -1;
    std::vector<int64_t> deltas;
    deltas.reserve(pts.size() - 1);
    for (size_t i = 1; i < pts.size(); ++i) deltas.push_back(pts[i] - pts[i - 1]);
    std::vector<int64_t> sorted = deltas;
    std::sort(sorted.begin(), sorted.end());
    int64_t median = sorted[sorted.size() / 2];
    int64_t spread = sorted.back() - sorted.front();
    int64_t tol = std::max<int64_t>(1, median / 4);
    return spread > tol ? 1 : 0;
}

int avx_keyframe_of(void* h, int frame_id) {
    auto idx = static_cast<Indexer*>(h);
    if (frame_id < 0 || frame_id >= static_cast<int>(idx->keyframe_of_frame.size()))
        return -1;
    return idx->keyframe_of_frame[frame_id];
}

// Extract a GOP bundle covering [keyframe_of(target) .. >= last_needed].
// Returns a malloc'd buffer (caller frees with avx_free); size via out_size.
uint8_t* avx_gop_bundle(void* h, int target_frame, int last_needed_frame,
                        uint64_t* out_size) {
    std::vector<uint8_t> buf;
    if (!extract_gop(static_cast<Indexer*>(h), target_frame, last_needed_frame, buf)) {
        *out_size = 0;
        return nullptr;
    }
    auto* res = static_cast<uint8_t*>(std::malloc(buf.size()));
    std::memcpy(res, buf.data(), buf.size());
    *out_size = buf.size();
    return res;
}

void avx_free(uint8_t* buf) { std::free(buf); }

namespace {

// Validate a serialized bundle end to end BEFORE trusting any field: a
// truncated or corrupted file read back from GopStore must produce an error
// code, never an out-of-bounds read. Checks header fields for sanity and the
// cumulative layout (extradata + packet table + sum of packet payloads)
// against the buffer size, with overflow-safe arithmetic.
bool validate_bundle(const uint8_t* buf, uint64_t size, BundleHeader* hdr) {
    if (buf == nullptr || size < sizeof(BundleHeader)) {
        set_error("bundle too small");
        return false;
    }
    std::memcpy(hdr, buf, sizeof(*hdr));
    if (hdr->magic != kBundleMagic) {
        set_error("bad bundle magic");
        return false;
    }
    if (hdr->version != kBundleVersion) {
        set_error("unsupported bundle version");
        return false;
    }
    if (hdr->extradata_size < 0 || hdr->num_packets < 0 || hdr->num_frames < 0 ||
        hdr->width <= 0 || hdr->height <= 0) {
        set_error("corrupt bundle header (negative/zero sizes)");
        return false;
    }
    // untrusted dims size the CALLER's output allocation (frames * W * H * 3)
    // — a flipped width byte must not become a multi-GiB allocation request
    if (hdr->width > 16384 || hdr->height > 16384) {
        set_error("corrupt bundle header (frame dimensions out of range)");
        return false;
    }
    // untrusted counts must not size allocations: a GOP never has more
    // display frames than packets, and first_frame_id feeds signed
    // arithmetic (rel = target - first) — bound both before any use
    if (hdr->num_frames > hdr->num_packets) {
        set_error("corrupt bundle header (num_frames exceeds num_packets)");
        return false;
    }
    if (hdr->first_frame_id < 0 || hdr->first_frame_id > (1 << 30)) {
        set_error("corrupt bundle header (first_frame_id out of range)");
        return false;
    }
    uint64_t offset = sizeof(BundleHeader);
    offset += static_cast<uint64_t>(hdr->extradata_size);
    uint64_t table_bytes =
        static_cast<uint64_t>(hdr->num_packets) * sizeof(PacketEntry);
    offset += table_bytes;
    if (offset < table_bytes || offset > size) {  // overflow or truncation
        set_error("bundle truncated (packet table out of bounds)");
        return false;
    }
    const uint8_t* table = buf + sizeof(BundleHeader) + hdr->extradata_size;
    for (int32_t i = 0; i < hdr->num_packets; ++i) {
        PacketEntry e;
        std::memcpy(&e, table + static_cast<uint64_t>(i) * sizeof(PacketEntry),
                    sizeof(e));
        if (e.size > size || offset + e.size < offset || offset + e.size > size) {
            set_error("bundle truncated (packet payload out of bounds)");
            return false;
        }
        if (e.size > static_cast<uint64_t>(INT32_MAX)) {
            set_error("corrupt bundle (packet larger than INT32_MAX)");
            return false;
        }
        offset += e.size;
    }
    return true;
}

}  // namespace

// Parse bundle metadata. Returns 0 on success.
int avx_bundle_info(const uint8_t* buf, uint64_t size, int32_t* first_frame_id,
                    int32_t* num_frames, int32_t* width, int32_t* height,
                    int32_t* codec_id) {
    BundleHeader hdr;
    if (!validate_bundle(buf, size, &hdr)) return -1;
    *first_frame_id = hdr.first_frame_id;
    *num_frames = hdr.num_frames;
    *width = hdr.width;
    *height = hdr.height;
    *codec_id = hdr.codec_id;
    return 0;
}

// Decode `n_targets` frames (absolute display ids) from a serialized bundle
// into out (row-major, n_targets frames of wire_frame_bytes(out_fmt) each;
// fmt 0/1 = RGB24/BGR24, fmt 2 = YUV420 wire: planar Y + interleaved CbCr).
// color_out (nullable): {AVColorSpace, AVColorRange} of the decoded frames.
// out_w/out_h (0 = native): fused decode+resize — frames land in `out` at
// the target size, wire_frame_bytes(out_fmt, out_w, out_h) each.
// Returns 0 on success.
int avx_decode_bundle_sized(const uint8_t* buf, uint64_t size,
                            const int32_t* target_ids, int32_t n_targets,
                            uint8_t* out_rgb, int out_fmt, int32_t* color_out,
                            int32_t out_w, int32_t out_h) {
    BundleHeader hdr;
    if (!validate_bundle(buf, size, &hdr)) return -1;
    if (out_w < 0 || out_h < 0 || (out_w > 0) != (out_h > 0)) {
        set_error("out_w/out_h must both be 0 (native) or both positive");
        return -8;
    }
    int ow = out_w > 0 ? out_w : hdr.width;
    int oh = out_h > 0 ? out_h : hdr.height;
    if (out_fmt == Decoder::kWireYuv420 && ((ow | oh) & 1)) {
        set_error("yuv420 wire output needs even frame dimensions");
        return -8;
    }
    const uint8_t* p = buf + sizeof(BundleHeader);
    const uint8_t* extradata = p;
    p += hdr.extradata_size;
    std::vector<PacketEntry> entries(hdr.num_packets);
    std::memcpy(entries.data(), p, hdr.num_packets * sizeof(PacketEntry));
    p += hdr.num_packets * sizeof(PacketEntry);

    Decoder* decp = acquire_decoder(static_cast<AVCodecID>(hdr.codec_id), extradata,
                                    hdr.extradata_size);
    if (!decp) return -3;
    Decoder& dec = *decp;

    // map display_rel -> output slot(s); duplicates are legitimate (the
    // same frame requested for several output slots)
    std::vector<std::vector<int>> want(hdr.num_frames);
    int max_rel = -1;
    for (int t = 0; t < n_targets; ++t) {
        int rel = target_ids[t] - hdr.first_frame_id;
        if (rel < 0 || rel >= hdr.num_frames) {
            set_error("target frame not in bundle");
            return -4;
        }
        want[rel].push_back(t);
        max_rel = std::max(max_rel, rel);
    }

    size_t frame_bytes = wire_frame_bytes(out_fmt, ow, oh);
    AVPacket* pkt = av_packet_alloc();
    AVFrame* frame = av_frame_alloc();
    int decoded = 0;
    int remaining = n_targets;
    int rc = 0;

    // pts -> display_rel from the packet table (robust when the bundle
    // carries overlap packets for open-GOP content: frames beyond the GOP
    // simply have no wanted slot)
    std::unordered_map<int64_t, int> rel_of_pts;
    for (auto& e : entries) {
        if (e.display_rel >= 0) rel_of_pts.emplace(e.pts, e.display_rel);
    }

    auto handle_frame = [&]() {
        // the output buffer is sized by the HEADER dims; a stream whose
        // decoded frames differ (corrupt header, lying packet-list caller)
        // would make to_rgb overflow it — reject instead of writing
        if (frame->width != hdr.width || frame->height != hdr.height) {
            set_error("decoded frame dimensions do not match the bundle header");
            rc = -7;
            remaining = 0;  // stop both loops
            return;
        }
        int64_t fpts = frame->best_effort_timestamp != AV_NOPTS_VALUE
                           ? frame->best_effort_timestamp
                           : frame->pts;
        auto it = rel_of_pts.find(fpts);
        int rel = it != rel_of_pts.end() ? it->second : -1;
        if (rel >= 0 && rel < hdr.num_frames && !want[rel].empty()) {
            for (int slot : want[rel]) {
                if (!dec.to_wire(frame,
                                 out_rgb + static_cast<size_t>(slot) * frame_bytes,
                                 out_fmt, color_out, out_w, out_h)) {
                    rc = -8;
                    remaining = 0;
                    return;
                }
                --remaining;
            }
        }
        ++decoded;
    };

    for (int i = 0; i < hdr.num_packets && remaining > 0; ++i) {
        av_packet_unref(pkt);
        av_new_packet(pkt, static_cast<int>(entries[i].size));
        std::memcpy(pkt->data, p, entries[i].size);
        p += entries[i].size;
        pkt->pts = entries[i].pts;
        pkt->flags = entries[i].flags;
        if (avcodec_send_packet(dec.ctx, pkt) < 0) {
            set_error("send_packet failed");
            rc = -5;
            break;
        }
        while (avcodec_receive_frame(dec.ctx, frame) == 0 && remaining > 0) {
            handle_frame();
        }
    }
    if (rc == 0 && remaining > 0) {
        avcodec_send_packet(dec.ctx, nullptr);  // drain
        while (avcodec_receive_frame(dec.ctx, frame) == 0 && remaining > 0) {
            handle_frame();
        }
    }
    av_frame_free(&frame);
    av_packet_free(&pkt);
    if (rc == 0 && remaining > 0) {
        set_error("not all target frames decoded");
        rc = -6;
    }
    return rc;
}

int avx_decode_bundle_fmt(const uint8_t* buf, uint64_t size,
                          const int32_t* target_ids, int32_t n_targets,
                          uint8_t* out_rgb, int out_fmt, int32_t* color_out) {
    return avx_decode_bundle_sized(buf, size, target_ids, n_targets, out_rgb,
                                   out_fmt, color_out, 0, 0);
}

int avx_decode_bundle(const uint8_t* buf, uint64_t size, const int32_t* target_ids,
                      int32_t n_targets, uint8_t* out_rgb, int as_bgr) {
    return avx_decode_bundle_fmt(buf, size, target_ids, n_targets, out_rgb,
                                 as_bgr ? Decoder::kWireBgr : Decoder::kWireRgb,
                                 nullptr);
}

// ---- stream reader ---------------------------------------------------- //

void* avx_reader_open(const char* path) {
    auto* r = new StreamReader();
    r->idx = open_and_index(path);
    if (!r->idx) {
        delete r;
        return nullptr;
    }
    if (!r->dec.init(r->idx->codec_id,
                     r->idx->extradata.empty() ? nullptr : r->idx->extradata.data(),
                     static_cast<int>(r->idx->extradata.size()))) {
        delete r;
        return nullptr;
    }
    r->next_display = -1;
    return r;
}

void avx_reader_close(void* h) { delete static_cast<StreamReader*>(h); }

int avx_reader_width(void* h) { return static_cast<StreamReader*>(h)->idx->width; }
int avx_reader_height(void* h) { return static_cast<StreamReader*>(h)->idx->height; }
int avx_reader_num_frames(void* h) {
    return static_cast<int>(static_cast<StreamReader*>(h)->idx->pts_sorted.size());
}

// Read one frame by display id. Forward-decodes from the current position
// when possible (decoder-state continuity, PyNvVideoReader.hpp:89-104);
// otherwise seeks to the containing keyframe and decodes forward.
// out_fmt / color_out / out_w / out_h as in avx_decode_bundle_sized.
int avx_reader_read_sized(void* h, int frame_id, uint8_t* out_rgb, int out_fmt,
                          int32_t* color_out, int32_t out_w, int32_t out_h) {
    auto* r = static_cast<StreamReader*>(h);
    int n = static_cast<int>(r->idx->pts_sorted.size());
    if (frame_id < 0 || frame_id >= n) {
        set_error("frame id out of range");
        return -1;
    }
    if (out_w < 0 || out_h < 0 || (out_w > 0) != (out_h > 0)) {
        set_error("out_w/out_h must both be 0 (native) or both positive");
        return -6;
    }
    bool forward = r->next_display >= 0 && frame_id >= r->next_display &&
                   r->idx->keyframe_of_frame[frame_id] < r->next_display;
    if (!forward) {
        int key = r->idx->keyframe_of_frame[frame_id];
        std::lock_guard<std::mutex> lock(r->idx->mutex);
        if (av_seek_frame(r->idx->fmt, r->idx->stream_index, r->idx->pts_sorted[key],
                          AVSEEK_FLAG_BACKWARD) < 0) {
            set_error("seek failed");
            return -2;
        }
        avcodec_flush_buffers(r->dec.ctx);
        r->next_display = key;
    }
    AVFrame* frame = av_frame_alloc();
    int rc = -3;
    while (r->next_display <= frame_id) {
        if (!reader_decode_next(r, frame)) {
            set_error("decode ended before target frame");
            rc = -3;
            av_frame_free(&frame);
            return rc;
        }
        if (r->next_display == frame_id) {
            // caller's buffer is sized by the indexer's stream dims; a
            // mid-stream resolution change must not overflow it
            if (frame->width != r->idx->width || frame->height != r->idx->height) {
                set_error("decoded frame dimensions changed mid-stream");
                av_frame_free(&frame);
                return -4;
            }
            if (!r->dec.to_wire(frame, out_rgb, out_fmt, color_out, out_w, out_h)) {
                av_frame_free(&frame);
                return -5;
            }
            rc = 0;
        }
        r->next_display += 1;
    }
    av_frame_free(&frame);
    return rc;
}

int avx_reader_read_fmt(void* h, int frame_id, uint8_t* out_rgb, int out_fmt,
                        int32_t* color_out) {
    return avx_reader_read_sized(h, frame_id, out_rgb, out_fmt, color_out, 0, 0);
}

int avx_reader_read(void* h, int frame_id, uint8_t* out_rgb, int as_bgr) {
    return avx_reader_read_fmt(h, frame_id, out_rgb,
                               as_bgr ? Decoder::kWireBgr : Decoder::kWireRgb,
                               nullptr);
}

// ---- test-asset encoder ------------------------------------------------ //

// Encode raw RGB frames into a video file (for tests; the reference commits
// pre-generated clips instead). codec_name: "libx264", "libx265", "mpeg4".
// options: comma-separated key=value pairs; "pix_fmt" and "max_b_frames" are
// applied to the codec context, everything else to the encoder's private
// options (e.g. "x264-params=open-gop=1:bframes=2").
int avx_encode_video2(const char* path, const uint8_t* rgb, int n_frames, int width,
                      int height, int fps, int gop_size, const char* codec_name,
                      const char* options) {
    AVFormatContext* fmt = nullptr;
    avformat_alloc_output_context2(&fmt, nullptr, nullptr, path);
    if (!fmt) {
        set_error("cannot alloc output context");
        return -1;
    }
    const AVCodec* codec = avcodec_find_encoder_by_name(codec_name);
    if (!codec) {
        set_error(std::string("encoder not found: ") + codec_name);
        avformat_free_context(fmt);
        return -2;
    }
    AVStream* stream = avformat_new_stream(fmt, nullptr);
    AVCodecContext* ctx = avcodec_alloc_context3(codec);
    ctx->width = width;
    ctx->height = height;
    ctx->time_base = {1, fps};
    ctx->framerate = {fps, 1};
    ctx->pix_fmt = AV_PIX_FMT_YUV420P;
    ctx->gop_size = gop_size;
    ctx->max_b_frames = 0;
    if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
        ctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    if (std::string(codec_name) == "libx264") {
        av_opt_set(ctx->priv_data, "preset", "veryfast", 0);
    }
    bool vfr = false;  // "vfr=1": irregular pts deltas (variable frame rate)
    if (options && options[0]) {
        std::string s(options);
        size_t pos = 0;
        while (pos < s.size()) {
            size_t comma = s.find(',', pos);
            std::string kv =
                s.substr(pos, comma == std::string::npos ? std::string::npos : comma - pos);
            pos = comma == std::string::npos ? s.size() : comma + 1;
            size_t eq = kv.find('=');
            std::string k = kv.substr(0, eq);
            std::string v = eq == std::string::npos ? "" : kv.substr(eq + 1);
            if (k == "pix_fmt") {
                AVPixelFormat pf = av_get_pix_fmt(v.c_str());
                if (pf != AV_PIX_FMT_NONE) ctx->pix_fmt = pf;
            } else if (k == "max_b_frames") {
                ctx->max_b_frames = atoi(v.c_str());
            } else if (k == "vfr") {
                vfr = atoi(v.c_str()) != 0;
            } else {
                av_opt_set(ctx->priv_data, k.c_str(), v.c_str(), 0);
            }
        }
    }
    if (vfr) ctx->time_base = {1, fps * 8};  // room for irregular deltas
    int rc = 0;
    SwsContext* sws = nullptr;
    AVFrame* yuv = nullptr;
    AVPacket* pkt = nullptr;
    do {
        if (avcodec_open2(ctx, codec, nullptr) < 0) {
            set_error("cannot open encoder");
            rc = -3;
            break;
        }
        avcodec_parameters_from_context(stream->codecpar, ctx);
        stream->time_base = ctx->time_base;
        if (!(fmt->oformat->flags & AVFMT_NOFILE) &&
            avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0) {
            set_error("cannot open output file");
            rc = -4;
            break;
        }
        if (avformat_write_header(fmt, nullptr) < 0) {
            set_error("write_header failed");
            rc = -5;
            break;
        }
        sws = sws_getContext(width, height, AV_PIX_FMT_RGB24, width, height,
                             ctx->pix_fmt, SWS_BILINEAR, nullptr, nullptr,
                             nullptr);
        yuv = av_frame_alloc();
        yuv->format = ctx->pix_fmt;
        yuv->width = width;
        yuv->height = height;
        av_frame_get_buffer(yuv, 0);
        pkt = av_packet_alloc();

        auto flush_packets = [&]() {
            while (avcodec_receive_packet(ctx, pkt) == 0) {
                av_packet_rescale_ts(pkt, ctx->time_base, stream->time_base);
                pkt->stream_index = stream->index;
                av_interleaved_write_frame(fmt, pkt);
            }
        };

        size_t frame_bytes = static_cast<size_t>(width) * height * 3;
        // vfr: deterministic irregular presentation deltas (in the finer
        // time_base) — a committed-asset analog of dropped/duplicated-
        // timestamp camera footage for VFR tests
        static const int64_t kVfrDeltas[] = {5, 13, 8, 21, 6, 11};
        int64_t pts_acc = 0;
        for (int i = 0; i < n_frames; ++i) {
            const uint8_t* src[1] = {rgb + i * frame_bytes};
            int src_linesize[1] = {width * 3};
            av_frame_make_writable(yuv);
            sws_scale(sws, src, src_linesize, 0, height, yuv->data, yuv->linesize);
            if (vfr) {
                yuv->pts = pts_acc;
                pts_acc += kVfrDeltas[i % 6];
            } else {
                yuv->pts = i;
            }
            avcodec_send_frame(ctx, yuv);
            flush_packets();
        }
        avcodec_send_frame(ctx, nullptr);
        flush_packets();
        av_write_trailer(fmt);
    } while (false);

    if (pkt) av_packet_free(&pkt);
    if (yuv) av_frame_free(&yuv);
    if (sws) sws_freeContext(sws);
    if (fmt && !(fmt->oformat->flags & AVFMT_NOFILE) && fmt->pb) avio_closep(&fmt->pb);
    avcodec_free_context(&ctx);
    avformat_free_context(fmt);
    return rc;
}

int avx_encode_video(const char* path, const uint8_t* rgb, int n_frames, int width,
                     int height, int fps, int gop_size, const char* codec_name) {
    return avx_encode_video2(path, rgb, n_frames, width, height, fps, gop_size,
                             codec_name, nullptr);
}

}  // extern "C"

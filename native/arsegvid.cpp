/* arsegvid implementation. See arsegvid.h for contracts. */

#include "arsegvid.h"

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/motion_vector.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

#ifdef _OPENMP
#include <omp.h>
#endif

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <memory>
#include <string>
#include <vector>

namespace {

thread_local std::string g_err;

int fail(const std::string &msg) {
  g_err = msg;
  return -1;
}

int fail_av(const std::string &msg, int averr) {
  char buf[AV_ERROR_MAX_STRING_SIZE] = {0};
  av_strerror(averr, buf, sizeof(buf));
  g_err = msg + ": " + buf;
  return -1;
}

struct FramePtr {
  AVFrame *f = av_frame_alloc();
  ~FramePtr() { av_frame_free(&f); }
};
struct PacketPtr {
  AVPacket *p = av_packet_alloc();
  ~PacketPtr() { av_packet_free(&p); }
};
struct CodecCtxPtr {
  AVCodecContext *c = nullptr;
  explicit CodecCtxPtr(const AVCodec *codec) { c = avcodec_alloc_context3(codec); }
  ~CodecCtxPtr() { avcodec_free_context(&c); }
};
struct SwsPtr {
  SwsContext *s = nullptr;
  ~SwsPtr() { sws_freeContext(s); }
};

/* ---------------- image file <-> AVFrame ---------------- */

/* Decode one still-image file (PNG/JPEG) into an RGB24 frame. */
int read_image(const char *path, FramePtr &out, SwsPtr &sws_cache) {
  FILE *fp = std::fopen(path, "rb");
  if (!fp) return fail(std::string("cannot open image ") + path);
  std::fseek(fp, 0, SEEK_END);
  long size = std::ftell(fp);
  std::fseek(fp, 0, SEEK_SET);
  std::vector<uint8_t> bytes(size);
  if (std::fread(bytes.data(), 1, size, fp) != (size_t)size) {
    std::fclose(fp);
    return fail(std::string("short read on ") + path);
  }
  std::fclose(fp);

  const AVCodec *codec = avcodec_find_decoder(AV_CODEC_ID_PNG);
  if (size >= 2 && bytes[0] == 0xff && bytes[1] == 0xd8)
    codec = avcodec_find_decoder(AV_CODEC_ID_MJPEG);
  CodecCtxPtr ctx(codec);
  int ret = avcodec_open2(ctx.c, codec, nullptr);
  if (ret < 0) return fail_av("image decoder open", ret);

  PacketPtr pkt;
  pkt.p->data = bytes.data();
  pkt.p->size = (int)size;
  if ((ret = avcodec_send_packet(ctx.c, pkt.p)) < 0)
    return fail_av(std::string("decode ") + path, ret);
  avcodec_send_packet(ctx.c, nullptr);
  FramePtr decoded;
  if ((ret = avcodec_receive_frame(ctx.c, decoded.f)) < 0)
    return fail_av(std::string("decode ") + path, ret);

  out.f->format = AV_PIX_FMT_RGB24;
  out.f->width = decoded.f->width;
  out.f->height = decoded.f->height;
  if ((ret = av_frame_get_buffer(out.f, 0)) < 0) return fail_av("alloc", ret);
  sws_cache.s = sws_getCachedContext(
      sws_cache.s, decoded.f->width, decoded.f->height,
      (AVPixelFormat)decoded.f->format, out.f->width, out.f->height,
      AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr, nullptr, nullptr);
  sws_scale(sws_cache.s, decoded.f->data, decoded.f->linesize, 0,
            decoded.f->height, out.f->data, out.f->linesize);
  return 0;
}

int write_png(const AVFrame *frame, const char *path) {
  const AVCodec *codec = avcodec_find_encoder(AV_CODEC_ID_PNG);
  CodecCtxPtr ctx(codec);
  ctx.c->width = frame->width;
  ctx.c->height = frame->height;
  ctx.c->pix_fmt = AV_PIX_FMT_RGB24;
  ctx.c->time_base = {1, 25};
  int ret = avcodec_open2(ctx.c, codec, nullptr);
  if (ret < 0) return fail_av("png encoder open", ret);

  FramePtr rgb;
  const AVFrame *src = frame;
  if (frame->format != AV_PIX_FMT_RGB24) {
    rgb.f->format = AV_PIX_FMT_RGB24;
    rgb.f->width = frame->width;
    rgb.f->height = frame->height;
    if ((ret = av_frame_get_buffer(rgb.f, 0)) < 0) return fail_av("alloc", ret);
    SwsPtr sws;
    sws.s = sws_getContext(frame->width, frame->height,
                           (AVPixelFormat)frame->format, frame->width,
                           frame->height, AV_PIX_FMT_RGB24, SWS_BILINEAR,
                           nullptr, nullptr, nullptr);
    sws_scale(sws.s, frame->data, frame->linesize, 0, frame->height,
              rgb.f->data, rgb.f->linesize);
    src = rgb.f;
  }
  if ((ret = avcodec_send_frame(ctx.c, src)) < 0)
    return fail_av("png encode", ret);
  avcodec_send_frame(ctx.c, nullptr);
  PacketPtr pkt;
  if ((ret = avcodec_receive_packet(ctx.c, pkt.p)) < 0)
    return fail_av("png encode", ret);
  FILE *fp = std::fopen(path, "wb");
  if (!fp) return fail(std::string("cannot write ") + path);
  std::fwrite(pkt.p->data, 1, pkt.p->size, fp);
  std::fclose(fp);
  return 0;
}

/* ---------------- bitstream decode driver ---------------- */

/* Open an elementary stream, decode all frames, invoke cb(frame, index). */
template <typename Cb>
int decode_stream(const char *path, bool export_mvs, Cb &&cb) {
  AVFormatContext *fmt = nullptr;
  int ret = avformat_open_input(&fmt, path, nullptr, nullptr);
  if (ret < 0) return fail_av(std::string("open ") + path, ret);
  std::unique_ptr<AVFormatContext, void (*)(AVFormatContext *)> fmt_guard(
      fmt, [](AVFormatContext *f) { avformat_close_input(&f); });
  if ((ret = avformat_find_stream_info(fmt, nullptr)) < 0)
    return fail_av("stream info", ret);
  int vi = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
  if (vi < 0) return fail("no video stream");

  const AVCodec *codec =
      avcodec_find_decoder(fmt->streams[vi]->codecpar->codec_id);
  CodecCtxPtr ctx(codec);
  avcodec_parameters_to_context(ctx.c, fmt->streams[vi]->codecpar);
  AVDictionary *opts = nullptr;
  if (export_mvs) {
    av_dict_set(&opts, "flags2", "+export_mvs", 0);
    /* Every export_mvs consumer (mvdump, arsegvid_decode_mvs_cb) reads
     * ONLY the motion-vector side data, never pixels — MVs are bitstream
     * syntax, so reconstruction work (loop filter, IDCT) is skipped.
     * Bit-identical MV maps (A/B verified); the measured saving is small
     * on the bench content (~2%: the MV path is rasterization-bound, not
     * pixel-bound) but grows with bitrate/deblocking load. */
    ctx.c->skip_loop_filter = AVDISCARD_ALL;
    ctx.c->skip_idct = AVDISCARD_ALL;
  }
  ret = avcodec_open2(ctx.c, codec, &opts);
  av_dict_free(&opts);
  if (ret < 0) return fail_av("decoder open", ret);

  PacketPtr pkt;
  FramePtr frame;
  int idx = 0;
  auto drain = [&]() -> int {
    while (true) {
      int r = avcodec_receive_frame(ctx.c, frame.f);
      if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) return 0;
      if (r < 0) return fail_av("decode", r);
      if ((r = cb(frame.f, idx)) < 0) return r;
      idx++;
    }
  };
  while (av_read_frame(fmt, pkt.p) >= 0) {
    if (pkt.p->stream_index == vi) {
      if ((ret = avcodec_send_packet(ctx.c, pkt.p)) < 0)
        return fail_av("send packet", ret);
      if ((ret = drain()) < 0) return ret;
    }
    av_packet_unref(pkt.p);
  }
  avcodec_send_packet(ctx.c, nullptr);
  if ((ret = drain()) < 0) return ret;
  return idx;
}

std::string join_path(const char *dir, const char *fmtstr, int i) {
  char name[64];
  std::snprintf(name, sizeof(name), fmtstr, i);
  std::string p(dir);
  if (!p.empty() && p.back() != '/') p += '/';
  return p + name;
}

/* ---------------- encoder ---------------- */

int encode_impl(const char *const *image_paths, int n_frames,
                const char *out_path, const char *codec_name, int fps,
                int bitrate_kbps, int gop,
                const char *analysis_save = nullptr) {
  const AVCodec *codec = avcodec_find_encoder_by_name(codec_name);
  if (!codec) return fail(std::string("no encoder ") + codec_name);

  /* Probe first image for dimensions. */
  SwsPtr sws_in;
  FramePtr probe;
  int ret = read_image(image_paths[0], probe, sws_in);
  if (ret < 0) return ret;
  int w = probe.f->width, h = probe.f->height;

  CodecCtxPtr ctx(codec);
  ctx.c->width = w;
  ctx.c->height = h;
  ctx.c->pix_fmt = AV_PIX_FMT_YUV420P;
  ctx.c->time_base = {1, fps};
  ctx.c->framerate = {fps, 1};
  ctx.c->gop_size = gop;
  ctx.c->max_b_frames = 0;
  ctx.c->thread_count = 4;
  if (bitrate_kbps > 0) ctx.c->bit_rate = (int64_t)bitrate_kbps * 1000;

  char params[512];
  if (std::strcmp(codec_name, "libx265") == 0) {
    /* parity with the reference encode: closed GOP of exactly `gop`, no
     * B-frames, rect/amp partitions on (reference ...camvid.py:231).
     * analysis_save: x265's own analysis dump (PU depths/partitions/MVs —
     * the encoder's final coding decisions, i.e. exactly the motion field
     * a conformant HEVC decoder reconstructs from the bitstream); parsed
     * by analysis_mv_maps below into the reference's test_%03d.bin MV
     * contract, replacing the libde265-MV fork decode-side dump
     * (reference .gitmodules:1-3, ...camvid.py:242). */
    std::snprintf(params, sizeof(params),
                  "keyint=%d:min-keyint=%d:bframes=0:scenecut=0:open-gop=0:"
                  "rect=1:amp=1",
                  gop, gop);
    if (analysis_save) {
      size_t len = std::strlen(params);
      std::snprintf(params + len, sizeof(params) - len,
                    ":analysis-save=%s:analysis-save-reuse-level=10",
                    analysis_save);
    }
    av_opt_set(ctx.c->priv_data, "x265-params", params, 0);
    av_opt_set(ctx.c->priv_data, "preset", "medium", 0);
  } else if (std::strcmp(codec_name, "libx264") == 0) {
    /* MV carrier: ref=1 pins every inter MV to the previous frame so the
     * dumped offset code is always 0 */
    std::snprintf(params, sizeof(params),
                  "keyint=%d:min-keyint=%d:bframes=0:scenecut=0:ref=1",
                  gop, gop);
    av_opt_set(ctx.c->priv_data, "x264-params", params, 0);
    av_opt_set(ctx.c->priv_data, "preset", "medium", 0);
  }
  if ((ret = avcodec_open2(ctx.c, codec, nullptr)) < 0)
    return fail_av(std::string("open encoder ") + codec_name, ret);

  FILE *out = std::fopen(out_path, "wb");
  if (!out) return fail(std::string("cannot write ") + out_path);

  FramePtr yuv;
  yuv.f->format = AV_PIX_FMT_YUV420P;
  yuv.f->width = w;
  yuv.f->height = h;
  if ((ret = av_frame_get_buffer(yuv.f, 0)) < 0) {
    std::fclose(out);
    return fail_av("alloc", ret);
  }
  SwsPtr sws_yuv;
  sws_yuv.s = sws_getContext(w, h, AV_PIX_FMT_RGB24, w, h, AV_PIX_FMT_YUV420P,
                             SWS_BILINEAR, nullptr, nullptr, nullptr);

  PacketPtr pkt;
  auto drain = [&]() -> int {
    while (true) {
      int r = avcodec_receive_packet(ctx.c, pkt.p);
      if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) return 0;
      if (r < 0) return fail_av("encode", r);
      std::fwrite(pkt.p->data, 1, pkt.p->size, out);
      av_packet_unref(pkt.p);
    }
  };

  for (int i = 0; i < n_frames; i++) {
    FramePtr rgb;
    if (i == 0) {
      av_frame_ref(rgb.f, probe.f);
    } else if ((ret = read_image(image_paths[i], rgb, sws_in)) < 0) {
      std::fclose(out);
      return ret;
    }
    if (rgb.f->width != w || rgb.f->height != h) {
      std::fclose(out);
      return fail("frame size mismatch in sequence");
    }
    av_frame_make_writable(yuv.f);
    sws_scale(sws_yuv.s, rgb.f->data, rgb.f->linesize, 0, h, yuv.f->data,
              yuv.f->linesize);
    yuv.f->pts = i;
    if ((ret = avcodec_send_frame(ctx.c, yuv.f)) < 0 || (ret = drain()) < 0) {
      std::fclose(out);
      return ret < 0 && g_err.empty() ? fail_av("encode", ret) : ret;
    }
  }
  avcodec_send_frame(ctx.c, nullptr);
  ret = drain();
  std::fclose(out);
  return ret < 0 ? ret : 0;
}

/* ---------------- MV rasterization ---------------- */

/* Rasterize exported block MVs into a dense int16 [h, w, 3] map.
 * Initialized to (0, 0, -1): pixels without an exported MV behave as
 * intra, which the merge step turns into zero-MV-to-previous — the same
 * absorption the reference applies to its decoder's intra blocks. */
void rasterize_mvs(const AVFrame *frame, std::vector<int16_t> &out) {
  int w = frame->width, h = frame->height;
  /* background = (0, 0, -1) triplets; a doubling memcpy pattern-fill runs
   * at memory bandwidth, vs the former memset + strided every-3rd store
   * (the MV path is rasterization-bound — see decode_stream note) */
  size_t total = (size_t)h * w * 3;
  out.resize(total);
  if (total >= 3) {
    out[0] = 0;
    out[1] = 0;
    out[2] = -1;
    for (size_t filled = 3; filled < total;) {
      size_t chunk = std::min(filled, total - filled);
      std::memcpy(out.data() + filled, out.data(), chunk * sizeof(int16_t));
      filled += chunk;
    }
  }

  const AVFrameSideData *sd =
      av_frame_get_side_data(frame, AV_FRAME_DATA_MOTION_VECTORS);
  if (!sd) return;
  const AVMotionVector *mvs = (const AVMotionVector *)sd->data;
  size_t n = sd->size / sizeof(AVMotionVector);
  for (size_t i = 0; i < n; i++) {
    const AVMotionVector &mv = mvs[i];
    if (mv.source >= 0) continue; /* forward-pointing only (P frames) */
    int scale = mv.motion_scale ? mv.motion_scale : 4;
    /* displacement current block -> reference block, quarter-pel */
    int qx = (int)std::lround((double)mv.motion_x * 4.0 / scale);
    int qy = (int)std::lround((double)mv.motion_y * 4.0 / scale);
    if (qx < INT16_MIN || qx > INT16_MAX || qy < INT16_MIN || qy > INT16_MAX)
      continue;
    int x0 = mv.dst_x - mv.w / 2, y0 = mv.dst_y - mv.h / 2;
    for (int y = y0 < 0 ? 0 : y0; y < y0 + mv.h && y < h; y++) {
      int16_t *row = out.data() + ((size_t)y * w + (x0 < 0 ? 0 : x0)) * 3;
      for (int x = x0 < 0 ? 0 : x0; x < x0 + mv.w && x < w; x++) {
        row[0] = (int16_t)qx;
        row[1] = (int16_t)qy;
        row[2] = (int16_t)(-mv.source - 1); /* source=-1 -> offset 0 */
        row += 3;
      }
    }
  }
}

/* ---------------- x265 analysis-save parsing (HEVC-native MVs) ----------
 *
 * The reference obtains HEVC motion vectors by DECODING the stream with a
 * forked libde265 (`dec265 -p`, .gitmodules:1-3). FFmpeg's HEVC decoder
 * exports no MVs, so we capture the same field on the ENCODE side instead:
 * x265's analysis-save file (reuse level 10) records every CTU's final CU
 * quadtree, PU partitioning, per-PU motion vectors (quarter-pel) and
 * reference indices — the coding decisions serialized into the bitstream,
 * hence bit-identical to what any conformant decoder reconstructs.
 *
 * File format (x265 build 199, the pinned system libx265; validated
 * empirically against known-motion encodes — see tests):
 *   [80-byte global header]  int32 @60 = reuse level (10 required),
 *                            int32 @68/@72/@76 = width/height/ctuSize
 *   then per frame: 32-byte record header
 *     u32 frameRecordSize, u32 depthBytes, i32 poc, i32 sliceType
 *     (1=IDR 2=I 3=P), i32 bScenecut, i64 satdCost, u32 numCUsInFrame,
 *     u32 numPartitions (=256 for 64px CTUs)
 *   I/IDR body: u32 + {depth, chromaModes, partSizes, qpoff}[depthBytes]
 *               + modes[numCUs*256]
 *   P body:     3x16B weight params + 9 byte arrays [depthBytes]
 *               (depth, predMode, qpoff, partSize, mergeFlag, interDir,
 *               chromaModes, mvpIdx, refIdx) + depthBytes 8-byte entries
 *               (int32 mvx, int32 mvy — quarter-pel) + intraModes[numCUs*256]
 *   Entries are PER PU: a CU with partSize p contributes numPU(p) entries;
 *   depth/partSize are valid at the CU's FIRST entry only (later PU slots
 *   hold garbage there, but carry their own real MV/refIdx — PU-accurate,
 *   the same granularity the libde265-MV dump provides). predMode: 1 =
 *   inter, 2 = intra, 5 = skip (MODE_INTER|4), 0 = none (out-of-picture
 *   boundary area).
 */

const int kNumPU[8] = {1, 2, 2, 4, 2, 2, 2, 2};

/* absPartIdx (z-order over the CTU's 16x16 grid of 4px units) -> (y4, x4) */
inline void zorder_yx(int idx, int *y4, int *x4) {
  int x = 0, y = 0;
  for (int b = 0; b < 4; b++) {
    x |= ((idx >> (2 * b)) & 1) << b;
    y |= ((idx >> (2 * b + 1)) & 1) << b;
  }
  *y4 = y;
  *x4 = x;
}

/* PU rectangles (x, y, w, h) of an HEVC partSize within a CU. */
inline int pu_rects(int cx, int cy, int s, int part, int r[4][4]) {
  int q = s / 4, h = s / 2;
  switch (part) {
    case 0: r[0][0] = cx; r[0][1] = cy; r[0][2] = s; r[0][3] = s; return 1;
    case 1: /* 2NxN */
      r[0][0] = cx; r[0][1] = cy;     r[0][2] = s; r[0][3] = h;
      r[1][0] = cx; r[1][1] = cy + h; r[1][2] = s; r[1][3] = h; return 2;
    case 2: /* Nx2N */
      r[0][0] = cx;     r[0][1] = cy; r[0][2] = h; r[0][3] = s;
      r[1][0] = cx + h; r[1][1] = cy; r[1][2] = h; r[1][3] = s; return 2;
    case 3: /* NxN */
      for (int i = 0; i < 4; i++) {
        r[i][0] = cx + (i % 2) * h; r[i][1] = cy + (i / 2) * h;
        r[i][2] = h; r[i][3] = h;
      }
      return 4;
    case 4: /* 2NxnU */
      r[0][0] = cx; r[0][1] = cy;     r[0][2] = s; r[0][3] = q;
      r[1][0] = cx; r[1][1] = cy + q; r[1][2] = s; r[1][3] = s - q; return 2;
    case 5: /* 2NxnD */
      r[0][0] = cx; r[0][1] = cy;         r[0][2] = s; r[0][3] = s - q;
      r[1][0] = cx; r[1][1] = cy + s - q; r[1][2] = s; r[1][3] = q; return 2;
    case 6: /* nLx2N */
      r[0][0] = cx;     r[0][1] = cy; r[0][2] = q;     r[0][3] = s;
      r[1][0] = cx + q; r[1][1] = cy; r[1][2] = s - q; r[1][3] = s; return 2;
    default: /* 7, nRx2N */
      r[0][0] = cx;         r[0][1] = cy; r[0][2] = s - q; r[0][3] = s;
      r[1][0] = cx + s - q; r[1][1] = cy; r[1][2] = q;     r[1][3] = s;
      return 2;
  }
}

inline uint32_t rd_u32(const uint8_t *p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;
}
inline int32_t rd_i32(const uint8_t *p) {
  int32_t v;
  std::memcpy(&v, p, 4);
  return v;
}
/* Parse an analysis-save file; for each frame (poc order) fill the dense
 * int16 [h, w, 3] MV map (same contract as rasterize_mvs: (0,0,-1)
 * background; (qx, qy, refIdx) on inter/skip PUs where refIdx r means
 * "r+1 frames back" — the merge's ref offset code) and invoke
 * sink(poc, w, h, map). Returns frame count or negative. */
template <typename Sink>
int analysis_mv_maps(const char *path, Sink &&sink) {
  FILE *fp = std::fopen(path, "rb");
  if (!fp) return fail(std::string("cannot open analysis file ") + path);
  std::fseek(fp, 0, SEEK_END);
  long size = std::ftell(fp);
  std::fseek(fp, 0, SEEK_SET);
  std::vector<uint8_t> d(size);
  if (std::fread(d.data(), 1, size, fp) != (size_t)size) {
    std::fclose(fp);
    return fail("short read on analysis file");
  }
  std::fclose(fp);
  if (size < 80) return fail("analysis file too small");
  int level = rd_i32(&d[60]);
  int w = rd_i32(&d[68]), h = rd_i32(&d[72]), ctu = rd_i32(&d[76]);
  if (level != 10 || ctu != 64 || w <= 0 || h <= 0)
    return fail("unsupported analysis header (need reuse level 10, CTU 64)");
  int ctus_w = (w + ctu - 1) / ctu;

  std::vector<int16_t> map;
  size_t total = (size_t)h * w * 3;
  long off = 80;
  int count = 0;
  while (off + 36 <= size) {
    /* 36-byte record header: u32 frameRecordSize, u32 depthBytes, i32 poc,
     * i32 sliceType, i32 bScenecut, i64 satdCost, u32 numCUs, u32 numParts */
    uint32_t frs = rd_u32(&d[off]), db = rd_u32(&d[off + 4]);
    int poc = rd_i32(&d[off + 8]), st = rd_i32(&d[off + 12]);
    uint32_t ncu = rd_u32(&d[off + 28]), npart = rd_u32(&d[off + 32]);
    if (frs < 36 || off + (long)frs > size)
      return fail("analysis record overruns file");
    if (npart != 256) return fail("unexpected numPartitions in analysis");
    const uint8_t *body = &d[off + 36];
    size_t blen = frs - 36;

    /* background = (0, 0, -1) */
    map.assign(total, 0);
    for (size_t i = 2; i < total; i += 3) map[i] = -1;

    if (st == 1 || st == 2) { /* I/IDR: all-intra map */
      if (blen != 4 * (size_t)db + 256 * (size_t)ncu)
        return fail("unexpected intra analysis record size");
      int r = sink(poc, w, h, map.data());
      if (r < 0) return r;
      off += frs;
      count++;
      continue;
    }
    if (st != 3) return fail("unexpected slice type in analysis (need P)");
    size_t base = 48; /* 3x16B weight params */
    if (blen != base + 17 * (size_t)db + 256 * (size_t)ncu) {
      base = 0; /* weightp off variant */
      if (blen != base + 17 * (size_t)db + 256 * (size_t)ncu)
        return fail("unexpected inter analysis record size");
    }
    const uint8_t *depth = body + base;
    const uint8_t *modes = depth + db;
    const uint8_t *partsize = depth + 3 * (size_t)db;
    const uint8_t *refidx = depth + 8 * (size_t)db;
    const uint8_t *ents = depth + 9 * (size_t)db;

    uint32_t i = 0;
    for (uint32_t cu_addr = 0; cu_addr < ncu; cu_addr++) {
      int ctu_x = (cu_addr % ctus_w) * ctu;
      int ctu_y = (cu_addr / ctus_w) * ctu;
      uint32_t ap = 0;
      while (ap < npart) {
        if (i >= db) return fail("analysis PU walk overran entry array");
        int dep = depth[i];
        if (dep > 3) return fail("bad CU depth in analysis");
        int s = ctu >> dep;
        int y4, x4;
        zorder_yx((int)ap, &y4, &x4);
        int cu_x = ctu_x + 4 * x4, cu_y = ctu_y + 4 * y4;
        int mode = modes[i];
        int n_ent = 1;
        int rects[4][4];
        if (mode == 1 || mode == 5) { /* inter / skip */
          int part = partsize[i];
          if (part > 7) return fail("bad partSize in analysis");
          n_ent = pu_rects(cu_x, cu_y, s, part, rects);
          for (int k = 0; k < n_ent; k++) {
            int32_t mx = rd_i32(ents + 8 * (size_t)(i + k));
            int32_t my = rd_i32(ents + 8 * (size_t)(i + k) + 4);
            int16_t qx = (int16_t)std::max(-32768, std::min(32767, mx));
            int16_t qy = (int16_t)std::max(-32768, std::min(32767, my));
            int rf = refidx[i + k];
            int x0 = rects[k][0], y0 = rects[k][1];
            int x1 = std::min(x0 + rects[k][2], w);
            int y1 = std::min(y0 + rects[k][3], h);
            for (int y = y0; y < y1; y++) {
              int16_t *row = map.data() + ((size_t)y * w + x0) * 3;
              for (int x = x0; x < x1; x++) {
                row[0] = qx;
                row[1] = qy;
                row[2] = (int16_t)rf;
                row += 3;
              }
            }
          }
        }
        i += n_ent;
        ap += 256u >> (2 * dep);
      }
      if (ap != npart) return fail("analysis CU walk misaligned");
    }
    if (i != db) return fail("analysis entry count mismatch");
    int r = sink(poc, w, h, map.data());
    if (r < 0) return r;
    off += frs;
    count++;
  }
  return count;
}

} /* namespace */

/* ---------------- public API ---------------- */

extern "C" const char *arsegvid_errmsg(void) { return g_err.c_str(); }

extern "C" int arsegvid_encode(const char *const *image_paths, int n_frames,
                               const char *out_path, const char *codec,
                               int fps, int bitrate_kbps, int gop) {
  if (n_frames <= 0) return fail("empty frame list");
  return encode_impl(image_paths, n_frames, out_path, codec, fps,
                     bitrate_kbps, gop);
}

extern "C" int arsegvid_decode(const char *bitstream_path,
                               const char *out_dir) {
  return decode_stream(bitstream_path, false, [&](AVFrame *f, int i) -> int {
    /* 1-based to match the ffmpeg image2 convention the datasets use
     * (reference ...camvid.py:246,255) */
    return write_png(f, join_path(out_dir, "decoded-%03d.png", i + 1).c_str());
  });
}

extern "C" int arsegvid_mvdump(const char *bitstream_path,
                               const char *out_dir) {
  std::vector<int16_t> map;
  return decode_stream(bitstream_path, true, [&](AVFrame *f, int i) -> int {
    if (i == 0) return 0; /* keyframe has no MVs */
    rasterize_mvs(f, map);
    std::string p = join_path(out_dir, "test_%03d.bin", i);
    FILE *fp = std::fopen(p.c_str(), "wb");
    if (!fp) return fail("cannot write " + p);
    std::fwrite(map.data(), sizeof(int16_t), map.size(), fp);
    std::fclose(fp);
    return 0;
  });
}

extern "C" int arsegvid_encode_analysis(const char *const *image_paths,
                                        int n_frames, const char *out_path,
                                        int fps, int bitrate_kbps, int gop,
                                        const char *analysis_out) {
  if (n_frames <= 0) return fail("empty frame list");
  return encode_impl(image_paths, n_frames, out_path, "libx265", fps,
                     bitrate_kbps, gop, analysis_out);
}

extern "C" int arsegvid_hevc_mvdump(const char *analysis_path,
                                    const char *out_dir) {
  return analysis_mv_maps(
      analysis_path, [&](int poc, int w, int h, const int16_t *map) -> int {
        if (poc == 0) return 0; /* keyframe has no MVs */
        std::string p = join_path(out_dir, "test_%03d.bin", poc);
        FILE *fp = std::fopen(p.c_str(), "wb");
        if (!fp) return fail("cannot write " + p);
        std::fwrite(map, sizeof(int16_t), (size_t)w * h * 3, fp);
        std::fclose(fp);
        return 0;
      });
}

extern "C" int arsegvid_hevc_analysis_mvs_cb(const char *analysis_path,
                                             arsegvid_mv_cb cb, void *user) {
  return analysis_mv_maps(
      analysis_path, [&](int poc, int w, int h, const int16_t *map) -> int {
        return cb(user, poc, w, h, map);
      });
}

extern "C" int arsegvid_decode_frames_cb(const char *bitstream_path,
                                         arsegvid_rgb_cb cb, void *user) {
  /* In-memory decode for direct video->device serving: no PNG round trip.
   * RGB24 conversion is the same SWS_BILINEAR context write_png uses, so
   * frames are byte-identical to the decoded-%03d.png artifacts. */
  SwsPtr sws;
  FramePtr rgb;
  std::vector<uint8_t> buf;
  return decode_stream(bitstream_path, false, [&](AVFrame *f, int i) -> int {
    int w = f->width, h = f->height;
    const uint8_t *src;
    int stride;
    if (f->format != AV_PIX_FMT_RGB24) {
      if (!sws.s) {
        sws.s = sws_getContext(w, h, (AVPixelFormat)f->format, w, h,
                               AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr,
                               nullptr, nullptr);
        if (!sws.s) return fail("sws context");
        rgb.f->format = AV_PIX_FMT_RGB24;
        rgb.f->width = w;
        rgb.f->height = h;
        int r = av_frame_get_buffer(rgb.f, 0);
        if (r < 0) return fail_av("alloc rgb", r);
      }
      sws_scale(sws.s, f->data, f->linesize, 0, h, rgb.f->data,
                rgb.f->linesize);
      src = rgb.f->data[0];
      stride = rgb.f->linesize[0];
    } else {
      src = f->data[0];
      stride = f->linesize[0];
    }
    buf.resize((size_t)h * w * 3);
    for (int y = 0; y < h; y++)
      std::memcpy(buf.data() + (size_t)y * w * 3, src + (size_t)y * stride,
                  (size_t)w * 3);
    return cb(user, i, w, h, buf.data());
  });
}

extern "C" int arsegvid_decode_mvs_cb(const char *bitstream_path,
                                      arsegvid_mv_cb cb, void *user) {
  /* Per-frame int16 [H, W, 3] qpel MV maps, every frame (keyframes get the
   * all-intra map: zeros with offset -1) — same rasterization as mvdump. */
  std::vector<int16_t> map;
  return decode_stream(bitstream_path, true, [&](AVFrame *f, int i) -> int {
    rasterize_mvs(f, map);
    return cb(user, i, f->width, f->height, map.data());
  });
}

extern "C" int arsegvid_merge_mv(const int16_t *bins, int n_frames, int h,
                                 int w, int max_ref, int16_t *out) {
  return arsegvid_merge_mv_mt(bins, n_frames, h, w, max_ref, out, 0);
}

extern "C" int arsegvid_merge_mv_mt(const int16_t *bins, int n_frames, int h,
                                    int w, int max_ref, int16_t *out,
                                    int n_threads) {
  if (n_frames < 0 || h <= 0 || w <= 0) return fail("bad merge dims");
  size_t plane = (size_t)h * w;
  /* anc[f][p] = packed (x, y) keyframe-ancestor coordinate of pixel p in
   * frame f; the chain from frame f resolves through frame f-1's already-
   * computed ancestors, so one pass over frames suffices (the reference
   * does the same DP with a [H, W, F, 3] tensor, ...camvid.py:12-49). */
  /* int16 (x, y) pairs: frame dims are < 32768, and halving the ancestor
   * footprint (2.8 vs 5.5 MB/plane at 720x960) matters — the per-pixel
   * gather below is cache-miss-bound. */
  std::vector<std::vector<int16_t>> anc(n_frames + 1);
  anc[0].resize(plane * 2);
  for (int y = 0; y < h; y++)
    for (int x = 0; x < w; x++) {
      anc[0][((size_t)y * w + x) * 2] = (int16_t)x;
      anc[0][((size_t)y * w + x) * 2 + 1] = (int16_t)y;
    }
  std::memset(out, 0, plane * 2 * sizeof(int16_t)); /* distance 0 */

  for (int f1 = 1; f1 <= n_frames; f1++) {
    const int16_t *bin = bins + (size_t)(f1 - 1) * plane * 3;
    anc[f1].resize(plane * 2);
    int16_t *dst = out + (size_t)f1 * plane * 2;
    /* the DP is sequential across frames but each pixel of frame f1 only
     * READS anc[<f1] and WRITES its own anc[f1][p]/dst[p] — rows
     * parallelize cleanly (the largest host-side serving cost, ~71
     * ms/GOP/core at 720x960, tools_bench_feeder_host.py). n_threads
     * bounds the team so callers running one merge per stream/worker
     * don't oversubscribe (0 = OpenMP default). */
#ifdef _OPENMP
#pragma omp parallel for schedule(static) \
    num_threads(n_threads > 0 ? n_threads : omp_get_max_threads())
#endif
    for (int y = 0; y < h; y++) {
      for (int x = 0; x < w; x++) {
        size_t p = (size_t)y * w + x;
        int mvx = bin[p * 3], mvy = bin[p * 3 + 1], off = bin[p * 3 + 2];
        if (off < 0 || off >= max_ref) { /* intra -> zero MV, prev frame */
          mvx = 0;
          mvy = 0;
          off = 0;
        }
        /* qpel -> px with round-half-to-even, matching the reference's
         * np.round(flow/4) (...camvid.py:20-22). Integer form of
         * nearbyint(v/4.0): floor(v/4) + 1 iff frac > .5 or (frac == .5
         * and floor odd) — ~5x faster than the libm call per pixel
         * (tools_bench_feeder_host.py profile), bit-identical (guarded by
         * the numpy-oracle merge tests). */
        auto rne4 = [](int v) {
          int q = v >> 2, r = v & 3;
          return q + (r > 2 || (r == 2 && (q & 1)));
        };
        int x2 = x + rne4(mvx);
        int y2 = y + rne4(mvy);
        x2 = x2 < 0 ? 0 : (x2 >= w ? w - 1 : x2);
        y2 = y2 < 0 ? 0 : (y2 >= h ? h - 1 : y2);
        int f2 = f1 - off - 1;
        if (f2 < 0) f2 = 0;
        size_t p2 = (size_t)y2 * w + x2;
        int16_t ax = anc[f2][p2 * 2], ay = anc[f2][p2 * 2 + 1];
        anc[f1][p * 2] = ax;
        anc[f1][p * 2 + 1] = ay;
        dst[p * 2] = (int16_t)(((int)ax - x) * 4);
        dst[p * 2 + 1] = (int16_t)(((int)ay - y) * 4);
      }
    }
  }
  return 0;
}

extern "C" int arsegvid_gop_pipeline2(const char *const *image_paths,
                                      int n_frames, const char *out_dir,
                                      int fps, int bitrate_kbps, int gop,
                                      int merge_upto, int mv_source) {
  std::string hevc = join_path(out_dir, "proxy_%d.hevc", bitrate_kbps);
  bool hevc_mvs = mv_source == ARSEGVID_MV_HEVC;
  std::string analysis = hevc + ".analysis";
  int ret = encode_impl(image_paths, n_frames, hevc.c_str(), "libx265", fps,
                        bitrate_kbps, gop,
                        hevc_mvs && merge_upto > 0 ? analysis.c_str()
                                                   : nullptr);
  if (ret < 0) return ret;
  if ((ret = arsegvid_decode(hevc.c_str(), out_dir)) < 0) return ret;

  if (merge_upto > 0 && hevc_mvs) {
    /* MVs straight from the HEVC encode's own analysis dump — the
     * bitstream's actual motion field, no carrier re-encode at all */
    int n_dec = arsegvid_hevc_mvdump(analysis.c_str(), out_dir);
    if (n_dec < 0) return n_dec;
    if (merge_upto >= n_dec) return fail("merge_upto beyond encoded frames");
  } else if (merge_upto > 0) {
    std::string h264 = join_path(out_dir, "proxy_%d.264", bitrate_kbps);
    if ((ret = arsegvid_encode(image_paths, n_frames, h264.c_str(), "libx264",
                               fps, bitrate_kbps, gop)) < 0)
      return ret;
    int n_dec = arsegvid_mvdump(h264.c_str(), out_dir);
    if (n_dec < 0) return n_dec;
    if (merge_upto >= n_dec) return fail("merge_upto beyond decoded frames");
  }
  if (merge_upto > 0) {

    /* load bins 1..merge_upto, probe dims from the first one */
    std::string first = join_path(out_dir, "test_%03d.bin", 1);
    FILE *fp = std::fopen(first.c_str(), "rb");
    if (!fp) return fail("missing " + first);
    std::fseek(fp, 0, SEEK_END);
    long bin_bytes = std::ftell(fp);
    std::fclose(fp);
    /* dims must be recovered by the caller's convention: the pipeline is
     * always fed same-size frames, so read one decoded frame's size from
     * the bin length given aspect is unknown — instead re-probe image 0 */
    SwsPtr sws;
    FramePtr probe;
    if ((ret = read_image(image_paths[0], probe, sws)) < 0) return ret;
    int w = probe.f->width, h = probe.f->height;
    if ((long)h * w * 3 * (long)sizeof(int16_t) != bin_bytes)
      return fail("MV bin size mismatch");

    size_t plane = (size_t)h * w;
    std::vector<int16_t> bins(plane * 3 * merge_upto);
    for (int f = 1; f <= merge_upto; f++) {
      std::string p = join_path(out_dir, "test_%03d.bin", f);
      fp = std::fopen(p.c_str(), "rb");
      if (!fp) return fail("missing " + p);
      size_t got = std::fread(bins.data() + plane * 3 * (f - 1),
                              sizeof(int16_t), plane * 3, fp);
      std::fclose(fp);
      if (got != plane * 3) return fail("short bin " + p);
    }
    /* every offset the ancestor chain can resolve is valid (f2 clamps at
     * the keyframe); only negative = intra. No coupling to the carrier's
     * ref= setting. */
    std::vector<int16_t> merged(plane * 2 * (merge_upto + 1));
    if ((ret = arsegvid_merge_mv(bins.data(), merge_upto, h, w,
                                 merge_upto + 1, merged.data())) < 0)
      return ret;
    for (int f = 0; f <= merge_upto; f++) {
      std::string p = join_path(out_dir, "merged_test_%03d.bin", f);
      fp = std::fopen(p.c_str(), "wb");
      if (!fp) return fail("cannot write " + p);
      std::fwrite(merged.data() + plane * 2 * f, sizeof(int16_t), plane * 2,
                  fp);
      std::fclose(fp);
    }
  }
  return 0;
}

extern "C" int arsegvid_gop_pipeline(const char *const *image_paths,
                                     int n_frames, const char *out_dir,
                                     int fps, int bitrate_kbps, int gop,
                                     int merge_upto) {
  return arsegvid_gop_pipeline2(image_paths, n_frames, out_dir, fps,
                                bitrate_kbps, gop, merge_upto,
                                ARSEGVID_MV_CARRIER);
}

/* ---------------- CLI ---------------- */

#ifdef ARSEGVID_MAIN
#include <cstdlib>

static int usage() {
  std::fprintf(
      stderr,
      "usage:\n"
      "  arsegvid encode <codec> <out> <fps> <kbps> <gop> <img>...\n"
      "  arsegvid decode <bitstream> <out_dir>\n"
      "  arsegvid mvdump <bitstream> <out_dir>\n"
      "  arsegvid hevcmvdump <analysis_file> <out_dir>\n"
      "  arsegvid gop <out_dir> <fps> <kbps> <gop> <merge_upto> [mv=carrier|"
      "mv=hevc] <img>...\n");
  return 2;
}

int main(int argc, char **argv) {
  if (argc < 2) return usage();
  std::string cmd = argv[1];
  int ret = -1;
  if (cmd == "encode" && argc >= 8) {
    ret = arsegvid_encode((const char *const *)&argv[7], argc - 7, argv[3],
                          argv[2], std::atoi(argv[4]), std::atoi(argv[5]),
                          std::atoi(argv[6]));
  } else if (cmd == "decode" && argc == 4) {
    ret = arsegvid_decode(argv[2], argv[3]);
  } else if (cmd == "mvdump" && argc == 4) {
    ret = arsegvid_mvdump(argv[2], argv[3]);
  } else if (cmd == "hevcmvdump" && argc == 4) {
    ret = arsegvid_hevc_mvdump(argv[2], argv[3]);
  } else if (cmd == "gop" && argc >= 8) {
    int first_img = 7, mv_source = ARSEGVID_MV_CARRIER;
    if (std::strcmp(argv[7], "mv=hevc") == 0) {
      mv_source = ARSEGVID_MV_HEVC;
      first_img = 8;
    } else if (std::strcmp(argv[7], "mv=carrier") == 0) {
      first_img = 8;
    }
    if (argc <= first_img) return usage();
    ret = arsegvid_gop_pipeline2(
        (const char *const *)&argv[first_img], argc - first_img, argv[2],
        std::atoi(argv[3]), std::atoi(argv[4]), std::atoi(argv[5]),
        std::atoi(argv[6]), mv_source);
  } else {
    return usage();
  }
  if (ret < 0) {
    std::fprintf(stderr, "arsegvid: %s\n", arsegvid_errmsg());
    return 1;
  }
  return 0;
}
#endif

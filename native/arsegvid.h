/* arsegvid — native video codec runtime for the AR-Seg TPU framework.
 *
 * Replaces the reference's three external CLI tools (x265 encoder CLI,
 * libde265-MV fork's `dec265 -p` MV dumper, and ffmpeg PNG<->HEVC
 * conversion — reference pre-process/generate_compressed_dataset_camvid.py:222-246)
 * with one in-process C++ library built on libavcodec/libavformat/libswscale.
 *
 * Artifact contracts match the reference exactly:
 *   - decoded frames: lossy round-trip through yuv420p HEVC at a target
 *     bitrate with keyint=GOP, bframes=0 (x265 flags --rect --amp --keyint
 *     --bframes 0, reference ...camvid.py:231).
 *   - per-frame MV bins `test_%03d.bin`: int16 [H, W, 3] = (mv_x qpel,
 *     mv_y qpel, ref offset code); offset 0 = previous frame, negative =
 *     intra / unknown (the reference's merge step zeroes offsets <0 or
 *     >=3, ...camvid.py:20-22, so the sentinel is absorbed identically).
 *   - merged MV maps: int16 [H, W, 2] qpel displacement current->keyframe
 *     (...camvid.py:6-56 `mergeMotion`).
 *
 * MV sources (two):
 *   - HEVC-native (ARSEGVID_MV_HEVC): the libx265 encode itself dumps its
 *     analysis data (x265 analysis-save, reuse level 10) — per-PU CU
 *     quadtree, partitions, quarter-pel MVs and reference indices, i.e.
 *     the coding decisions serialized into the HEVC bitstream, hence the
 *     exact motion field a conformant decoder (the reference's libde265-MV
 *     fork, .gitmodules:1-3) reconstructs. Parsed by arsegvid_hevc_mvdump /
 *     arsegvid_hevc_analysis_mvs_cb into the same test_%03d.bin contract.
 *     Available whenever this library does the encoding (the reference's
 *     preprocessing also always encodes its own streams).
 *   - H.264 carrier (ARSEGVID_MV_CARRIER): for pre-encoded HEVC inputs
 *     whose analysis dump is unavailable, MVs come from a parallel H.264
 *     encode (libx264, same GOP/bitrate, ref=1, bframes=0) decoded with
 *     export_mvs (FFmpeg's HEVC decoder exports no MVs). The AR-Seg
 *     method is codec-agnostic — it only needs the block-motion field an
 *     encoder computed (reference README.md:1-8).
 */
#ifndef ARSEGVID_H
#define ARSEGVID_H

#include <stdint.h>
#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

/* All functions return 0 on success, negative on failure; arsegvid_errmsg()
 * describes the last failure (thread-local). */
const char *arsegvid_errmsg(void);

/* Encode a sequence of image files (PNG) into an elementary bitstream.
 * codec: "libx265" (parity artifacts) or "libx264" (MV carrier).
 * gop: keyframe interval (closed GOP, scenecut off). bframes forced to 0.
 * bitrate_kbps <= 0 selects default-CRF rate control. */
int arsegvid_encode(const char *const *image_paths, int n_frames,
                    const char *out_path, const char *codec,
                    int fps, int bitrate_kbps, int gop);

/* Decode an elementary bitstream; write frame f (1-based, ffmpeg image2
 * convention) to `<out_dir>/decoded-%03d.png`. Returns frame count. */
int arsegvid_decode(const char *bitstream_path, const char *out_dir);

/* Decode an H.264 bitstream with motion-vector export; for every frame
 * f >= 1 write `<out_dir>/test_%03d.bin` (int16 [H, W, 3], layout above).
 * Returns frame count. */
int arsegvid_mvdump(const char *bitstream_path, const char *out_dir);

/* MV source selector for the GOP pipeline. */
#define ARSEGVID_MV_CARRIER 0
#define ARSEGVID_MV_HEVC 1

/* Encode with libx265 AND dump the encoder's analysis data (PU-level MVs,
 * the HEVC-native MV source) to `analysis_out`. */
int arsegvid_encode_analysis(const char *const *image_paths, int n_frames,
                             const char *out_path, int fps, int bitrate_kbps,
                             int gop, const char *analysis_out);

/* Rasterize an x265 analysis-save file (reuse level 10, CTU 64, P-only
 * GOPs) into per-frame `test_%03d.bin` MV maps (same contract as
 * arsegvid_mvdump; channel 2 = refIdx, r means r+1 frames back).
 * Returns frame count. */
int arsegvid_hevc_mvdump(const char *analysis_path, const char *out_dir);

/* In-memory decode for direct video->device serving (no PNG/bin files).
 * Callbacks receive contiguous row-major buffers owned by the decoder,
 * valid only for the duration of the call; return negative to abort.
 * Both return the decoded frame count. */
typedef int (*arsegvid_rgb_cb)(void *user, int idx, int w, int h,
                               const uint8_t *rgb /* [h, w, 3] */);
int arsegvid_decode_frames_cb(const char *bitstream_path, arsegvid_rgb_cb cb,
                              void *user);

/* Per-frame MV maps for EVERY frame (keyframes yield the all-intra map:
 * zeros with offset -1), same rasterization as arsegvid_mvdump. */
typedef int (*arsegvid_mv_cb)(void *user, int idx, int w, int h,
                              const int16_t *mv3 /* [h, w, 3] */);
int arsegvid_decode_mvs_cb(const char *bitstream_path, arsegvid_mv_cb cb,
                           void *user);

/* Per-frame MV maps from an x265 analysis-save file (every frame;
 * keyframes yield the all-intra map) — the HEVC-native counterpart of
 * arsegvid_decode_mvs_cb for streams this library encoded. */
int arsegvid_hevc_analysis_mvs_cb(const char *analysis_path,
                                  arsegvid_mv_cb cb, void *user);

/* Chain per-frame block MVs into keyframe->frame displacement fields.
 * bins: n_frames contiguous int16 [h, w, 3] maps for frames 1..n_frames
 * (frame 0 is the keyframe). out: (n_frames + 1) contiguous int16
 * [h, w, 2] merged qpel maps; out[0] is zero. max_ref: offsets outside
 * [0, max_ref) are treated as intra (zero MV to previous frame). */
int arsegvid_merge_mv(const int16_t *bins, int n_frames, int h, int w,
                      int max_ref, int16_t *out);

/* As arsegvid_merge_mv with an explicit OpenMP team bound for the
 * row-parallel inner loop (0 = library default): callers running one
 * merge per stream/worker thread should pass ~cores/workers. */
int arsegvid_merge_mv_mt(const int16_t *bins, int n_frames, int h, int w,
                         int max_ref, int16_t *out, int n_threads);

/* One-call GOP pipeline (the hot path of dataset generation): encode
 * `image_paths` with libx265 -> decode to `decoded-%03d.png` under
 * out_dir; encode with libx264 -> dump + merge MVs to
 * `merged_test_%03d.bin` (int16 [H, W, 2]) under out_dir for distances
 * 0..merge_upto (skipped if merge_upto <= 0). */
int arsegvid_gop_pipeline(const char *const *image_paths, int n_frames,
                          const char *out_dir, int fps, int bitrate_kbps,
                          int gop, int merge_upto);

/* As arsegvid_gop_pipeline with an explicit MV source: ARSEGVID_MV_HEVC
 * takes the MVs from the HEVC encode's own analysis dump (written next to
 * the bitstream as `proxy_<kbps>.hevc.analysis`; no H.264 carrier encode
 * happens); ARSEGVID_MV_CARRIER is the legacy behavior. */
int arsegvid_gop_pipeline2(const char *const *image_paths, int n_frames,
                           const char *out_dir, int fps, int bitrate_kbps,
                           int gop, int merge_upto, int mv_source);

#ifdef __cplusplus
}
#endif

#endif /* ARSEGVID_H */

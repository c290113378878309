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
 * MV source: FFmpeg's HEVC decoder does not export motion vectors, so MVs
 * come from a parallel H.264 encode (libx264, same GOP/bitrate, ref=1,
 * bframes=0) decoded with export_mvs. The AR-Seg method is codec-agnostic
 * — it only needs the block-motion field the encoder already computed
 * (reference README.md:1-8); ref=1 pins every inter MV to the previous
 * frame, matching the merge chain's expectations.
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

#ifdef __cplusplus
}
#endif

#endif /* ARSEGVID_H */

"""Direct video->device GOP source: decode compressed streams in memory.

The reference cannot serve from video at all — its pipeline shells out to
x265/dec265/ffmpeg offline, round-trips every frame through PNG files and
every MV map through .bin files, and evaluation then re-decodes those PNGs
per frame (`/root/reference/evaluation.py` main loops;
`pre-process/generate_compressed_dataset_camvid.py:222-246`). PNG
encode+decode of 720x960 frames costs tens of ms/frame of host CPU — far
below the ~750 fps/chip device rate (tools_bench_feeder_host.py), so a
PNG-fed pipeline is host-bound at serving time.

`VideoGOPSource` instead feeds `GOPFeeder` straight from the two
elementary streams the AR-Seg protocol already defines:

  frames  <- the HEVC bitstream (what the method segments),
  MVs     <- the H.264 carrier (what the method warps by),

decoded in-process by the native runtime (libavcodec callback API,
`native/arsegvid.cpp:arsegvid_decode_frames_cb/_decode_mvs_cb`) and
chain-merged per GOP in memory (`arsegvid_merge_mv`) — no intermediate
file, no PNG codec anywhere. RGB bytes are identical to the
`decoded-%03d.png` artifacts (same swscale conversion, byte-for-byte;
tests/test_video_source.py), so eval numbers are unaffected.

The merge parallelizes rows with OpenMP; hosts running many feeder
workers / streams should bound the team via `merge_threads` (~cores /
streams) to avoid oversubscription.
"""

import queue
import threading

import numpy as np


class VideoGOPSource:
    """Sequential GOP source over (hevc_path, carrier_path).

    iter_gops() yields GOPFeeder host items: (keyframe [1,H,W,3] float32
    normalized, frames [G-1,H,W,3], fx [G-1,H,W], fy [G-1,H,W] float pixel
    displacements current->keyframe). Frame and MV decode each run on their
    own thread (ctypes releases the GIL inside libavcodec), bounded to
    `lookahead` GOPs of host memory. A trailing partial GOP is dropped
    (same `len(ds) // g` convention as the file-based path).
    """

    def __init__(self, hevc_path, carrier_path, ref_gap, mean, std,
                 native=None, lookahead=2, device_normalize=False,
                 merge_threads=0, mv_kind="carrier"):
        if native is None:
            from arseg_tpu.tools.video import load_native

            native = load_native()
            if native is None:
                raise RuntimeError(
                    "native arsegvid library unavailable (run `make -C native`)"
                )
        self.native = native
        self.hevc_path = hevc_path
        self.carrier_path = carrier_path
        self.g = int(ref_gap)
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.lookahead = max(1, int(lookahead))
        # device_normalize: yield RAW uint8 frames for an
        # ARPipeline(normalize=(mean, std)) — the host sheds the f32
        # broadcasting (~0.7 s/GOP at 720x960 single-core) and H2D moves
        # 4x fewer bytes; device math is bitwise-identical (pipeline.py)
        self.device_normalize = bool(device_normalize)
        # merge_threads bounds the chain-merge's row-parallel OpenMP team
        # (0 = all cores); hosts serving several streams/workers should
        # pass ~cores/streams so concurrent merges don't oversubscribe
        self.merge_threads = int(merge_threads)
        # mv_kind: 'carrier' decodes carrier_path as an H.264 stream with
        # export_mvs; 'analysis' reads it as the x265 analysis-save sidecar
        # the HEVC encode dumped (arsegvid_encode_analysis) — the
        # HEVC-native MV source, no carrier stream at all. Both yield the
        # same per-frame int16 [H, W, 3] maps.
        if mv_kind not in ("carrier", "analysis"):
            raise ValueError(f"mv_kind must be carrier|analysis, got {mv_kind}")
        self.mv_kind = mv_kind

    class _Abort(Exception):
        """Internal: consumer abandoned the iteration; unwind the decode."""

    _EOS = object()

    def _decode_thread(self, decode_fn, path, out_q, stop):
        """Run a native callback decode, pushing per-GOP lists of frame
        copies; _EOS terminates, an Exception propagates. `stop` aborts the
        native decode from inside its callback (return <0) so an abandoned
        iteration releases decoder contexts and buffered GOPs instead of
        blocking forever on the bounded queue."""
        g = self.g
        acc = []

        def put(item):
            while True:
                if stop.is_set():
                    raise VideoGOPSource._Abort()
                try:
                    out_q.put(item, timeout=0.1)
                    return
                except queue.Full:
                    continue

        def on_frame(idx, arr):
            acc.append(arr.copy())
            if len(acc) == g:
                put(list(acc))
                acc.clear()

        try:
            decode_fn(path, on_frame)
            put(self._EOS)  # (partial tail in `acc` is dropped)
        except VideoGOPSource._Abort:
            pass
        except Exception as e:  # pragma: no cover - surfaced in iter_gops
            if not stop.is_set():
                out_q.put(e)

    def iter_gops(self):
        frame_q = queue.Queue(maxsize=self.lookahead)
        mv_q = queue.Queue(maxsize=self.lookahead)
        stop = threading.Event()
        threads = [
            threading.Thread(
                target=self._decode_thread,
                args=(self.native.decode_frames_cb, self.hevc_path, frame_q, stop),
                daemon=True,
            ),
            threading.Thread(
                target=self._decode_thread,
                args=(self.native.decode_mvs_cb if self.mv_kind == "carrier"
                      else self.native.hevc_analysis_mvs_cb,
                      self.carrier_path, mv_q, stop),
                daemon=True,
            ),
        ]
        for t in threads:
            t.start()
        try:
            first = True
            while True:
                frames = frame_q.get()
                mvs = mv_q.get()
                for item in (frames, mvs):
                    if isinstance(item, Exception):
                        raise item
                if frames is self._EOS or mvs is self._EOS:
                    if (frames is self._EOS) != (mvs is self._EOS):
                        raise RuntimeError(
                            "frame/carrier stream GOP counts differ — encode "
                            "both from the same frames with the same --ref_gap"
                        )
                    return
                if first:
                    first = False
                    if frames[0].shape[:2] != mvs[0].shape[:2]:
                        raise RuntimeError(
                            f"frame/carrier resolutions differ: frames "
                            f"{frames[0].shape[:2]} vs MV maps "
                            f"{mvs[0].shape[:2]} — wrong --mv_carrier?"
                        )
                if self.device_normalize:
                    imgs = np.stack(frames)  # uint8, normalized on device
                else:
                    # exactly data/transform.py:normalize (/ std, not * inv)
                    imgs = (np.stack(frames).astype(np.float32) / 255.0 - self.mean) / self.std
                # chain-merge this GOP's MV maps (frames key+1..key+G-1)
                # into keyframe displacements; bins are qpel int16, flow px
                merged = self.native.merge_mv(
                    np.stack(mvs[1:]), max_ref=self.g,
                    threads=self.merge_threads)
                # qpel int16 -> px f32 per plane in ONE pass each (astype of
                # the strided view is already a contiguous copy; *0.25 is
                # exact, bitwise == the former astype(f32)/4.0 on [..., 2])
                fx = merged[1:, ..., 0].astype(np.float32)
                fx *= 0.25
                fy = merged[1:, ..., 1].astype(np.float32)
                fy *= 0.25
                yield (imgs[:1], imgs[1:], fx, fy)
        finally:
            stop.set()
            for q in (frame_q, mv_q):  # unblock producers promptly
                try:
                    while True:
                        q.get_nowait()
                except queue.Empty:
                    pass

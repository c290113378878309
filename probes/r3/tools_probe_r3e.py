"""Round-3 probe E (CPU): merged-MV magnitude + tile-coherence statistics
through the NATIVE pipeline — the measurement the psp18 mega-fusion /
banded-warp designs need (PERF.md round-2: "to make either shippable:
measure the real MV magnitude distribution ... pick margins with provable
coverage, keep the exact gather as fallback").

No real video exists in this environment (zero egress), so the content is
driving-like synthetics at CamVid geometry (720x960, GOP 12, 3 Mbps): a
textured background panning at gx px/frame (vehicle ego-motion), plus
independently-moving sprites (other agents). Sweeping gx in {2, 8, 16}
brackets slow..fast ego-motion; merged MVs chain across the GOP, so
distance-11 displacements reach ~11*gx px.

Reported per (scene, distance):
  |MV| p50/p99/max — band margins for a whole-axis banded warp;
  per-tile (16x120, the CReFF kernel tile) max |MV - tile_mean| and the
  fraction of tiles exceeding margins m in {2,4,6,8} — the displaced-DMA
  mega-fusion's fallback rate at full resolution (camvid-psp18) and, /8,
  at the bise18 fusion grid.
"""
import json
import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")
import numpy as np

from arseg_tpu.tools.mv_fidelity import synth_frames, load_native

H, W = 720, 960
GOP = 12
TH, TW = 16, 120
MARGINS = (2, 4, 6, 8)


def tile_stats(mv):
    """mv: [H, W, 2] px. Per-(16x120)-tile max deviation from tile mean."""
    nh, nw = H // TH, W // TW
    t = mv[: nh * TH, : nw * TW].reshape(nh, TH, nw, TW, 2)
    mean = t.mean(axis=(1, 3), keepdims=True)
    dev = np.abs(t - np.round(mean)).max(axis=(1, 3, 4))  # [nh, nw]
    return dev.reshape(-1)


def run_scene(name, gx, gy, seed, n_sprites, sprite_v):
    import arseg_tpu.tools.mv_fidelity as mf

    rng = np.random.RandomState(seed)
    with tempfile.TemporaryDirectory() as td:
        # reuse synth_frames but rescale its motion model via monkeypatch-free
        # regeneration: synth_frames hard-codes gx,gy = (2,1); patch module
        # constants by generating manually at the needed speed.
        paths, gt = _synth(td, gx, gy, seed, n_sprites, sprite_v)
        nv = load_native()
        wd = os.path.join(td, "out")
        os.makedirs(wd)
        nv.gop_pipeline(paths, wd, fps=30, bitrate_kbps=3000, gop=GOP,
                        merge_upto=GOP - 1)
        rows = []
        for d in range(1, GOP):
            mv = np.fromfile(
                os.path.join(wd, f"merged_test_{d:03d}.bin"), np.int16
            ).reshape(H, W, 2).astype(np.float32) / 4.0
            mag = np.abs(mv)
            dev = tile_stats(mv)
            rows.append(dict(
                scene=name, d=d,
                mag_p50=round(float(np.median(mag)), 1),
                mag_p99=round(float(np.percentile(mag, 99)), 1),
                mag_max=round(float(mag.max()), 1),
                tile_dev_p99=round(float(np.percentile(dev, 99)), 1),
                tile_dev_max=round(float(dev.max()), 1),
                fallback_frac={m: round(float((dev > m).mean()), 4)
                               for m in MARGINS},
            ))
        return rows


def _synth(out_dir, gx, gy, seed, n_sprites, sprite_v):
    """synth_frames with parameterized pan/sprite speeds (same structure)."""
    from PIL import Image
    from arseg_tpu.tools.mv_fidelity import _smooth_noise

    rng = np.random.RandomState(seed)
    n = GOP
    pad = int(np.ceil(max(abs(gx), abs(gy)) * n)) + 4
    bg = _smooth_noise(rng, H + 2 * pad, W + 2 * pad)
    sprites = []
    for _ in range(n_sprites):
        sh, sw = rng.randint(H // 8, H // 3), rng.randint(W // 8, W // 3)
        tex = _smooth_noise(rng, sh, sw)
        x0, y0 = rng.randint(0, W - sw), rng.randint(0, H - sh)
        vx, vy = rng.uniform(-sprite_v, sprite_v), rng.uniform(-sprite_v / 2, sprite_v / 2)
        sprites.append(dict(tex=tex, x0=x0, y0=y0, vx=vx, vy=vy))
    paths = []
    for f in range(n):
        ox, oy = int(round(pad + gx * f)), int(round(pad + gy * f))
        frame = bg[oy : oy + H, ox : ox + W].copy()
        for s in sprites:
            sx = int(round(s["x0"] + s["vx"] * f))
            sy = int(round(s["y0"] + s["vy"] * f))
            sh, sw = s["tex"].shape[:2]
            x1, y1 = max(sx, 0), max(sy, 0)
            x2, y2 = min(sx + sw, W), min(sy + sh, H)
            if x2 <= x1 or y2 <= y1:
                continue
            frame[y1:y2, x1:x2] = s["tex"][y1 - sy : y2 - sy, x1 - sx : x2 - sx]
        p = os.path.join(out_dir, f"{f:03d}.png")
        Image.fromarray(frame).save(p)
        paths.append(p)
    return paths, None


SCENES = [
    ("slow-pan", 2, 1, 0, 3, 3),
    ("city-pan", 8, 1, 1, 4, 6),
    ("fast-pan", 16, 2, 2, 4, 10),
]

if __name__ == "__main__":
    all_rows = []
    for args in SCENES:
        rows = run_scene(*args)
        all_rows.extend(rows)
        for r in rows:
            print(json.dumps(r), flush=True)
    # summary: worst-case tile fallback fraction per margin at d=11
    worst = {m: max(r["fallback_frac"][m] for r in all_rows) for m in MARGINS}
    d11 = [r for r in all_rows if r["d"] == GOP - 1]
    print(json.dumps(dict(
        summary="worst tile-fallback fraction over all scenes/distances",
        by_margin=worst,
        d11_mag_p99=[r["mag_p99"] for r in d11],
        d11_mag_max=[r["mag_max"] for r in d11],
    )), flush=True)

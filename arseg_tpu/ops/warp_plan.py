"""Host-side separable warp plan (round-2 warp redesign).

The MV warp (reference `warpFeature`, /root/reference evaluation.py:61-87) is
a per-pixel bilinear gather — descriptor-rate-bound on TPU (~22 ns/pixel
through the XLA gather engine = ~15 ms/frame at 720x960x64). The TPU's fast
data-dependent primitive is the per-lane *gather along the 128-lane minor
dim* (Mosaic dynamic-gather; probed in tools_probe_r2g/h). A 2-D warp does
not factor into two 1-D lane gathers directly — out[y, x] needs
feat[yi(y,x), xi(y,x)] and a vertical-then-horizontal split evaluates yi at
the wrong column. It DOES factor through a host-side index rewrite:

  pass 1 (vertical):   P1[oy, xw] = V0[oy,xw] * feat[J[oy,xw],   xw]
                                  + V1[oy,xw] * feat[J[oy,xw]+1, xw]
  pass 2 (horizontal): out[oy,ox] = WX0 * P1[oy, XI] + WX1 * P1[oy, XI+1]

where J is yi *scattered through xi* (J[oy, xi(oy,ox)] := yi(oy,ox)) so that
pass 2 reads exactly the rows pass 1 prepared. The scatter is well-defined
wherever xi is locally injective — everywhere except motion-partition
boundaries, because codec MV fields are block-piecewise-constant. The host
VERIFIES every pixel (gather-back check) and emits the failures as a sparse
exact-correction list; if the failure count exceeds the budget the host
simply routes the frame to the exact-gather path (no device-side cond).

Host cost is a handful of vectorized numpy ops per frame (~ms), runs where
the MV merge already runs (tools/preprocess mergeMotion), and overlaps
device compute through the async dispatch pipeline.

Semantics match ops/warp.py `warp_feature` / torch grid_sample (bilinear,
zero padding, align_corners=False default) up to float reassociation: the
exact path computes (wy*wx)*corner products, the separable path computes
wx*(wy*corner sums).
"""

import numpy as np


def resize_flow_planes_np(fx, fy, feat_hw, mode="bilinear"):
    """Host mirror of ops/warp.py `scale_and_resize_flow` (eval semantics:
    magnitude x feat_h/flow_h, then bilinear align_corners=True resample —
    reference evaluation.py:177-180). Identity when shapes already match."""
    from arseg_tpu.ops.resize import _linear_gather

    fx = np.asarray(fx, np.float32)
    fy = np.asarray(fy, np.float32)
    fh, fw = fx.shape[-2:]
    oh, ow = int(feat_hw[0]), int(feat_hw[1])
    s = np.float32(oh / fh)
    fx = fx * s
    fy = fy * s
    if (fh, fw) == (oh, ow):
        return fx, fy

    def lerp_axis(x, in_size, out_size, axis):
        i0, i1, w = _linear_gather(in_size, out_size, True)
        w = w.astype(np.float32)
        x0 = np.take(x, i0, axis=axis)
        x1 = np.take(x, i1, axis=axis)
        shape = [1] * x.ndim
        shape[axis] = out_size
        w = w.reshape(shape)
        return (np.float32(1.0) - w) * x0 + w * x1

    if mode == "bilinear":
        fx = lerp_axis(lerp_axis(fx, fh, oh, -2), fw, ow, -1)
        fy = lerp_axis(lerp_axis(fy, fh, oh, -2), fw, ow, -1)
    else:
        raise ValueError(f"unsupported host flow resize mode: {mode}")
    return fx, fy


class WarpPlan:
    """Per-frame planes for the two-pass separable warp.

    Attributes (numpy, host):
      j:    [N, WPAD, HL] int32 — pass-1 row index (padded coords), laid out
            transposed (lanes = output row oy) to match the pass-1 kernel.
      v0/v1:[N, WPAD, HL] f32 — pass-1 corner weights (validity included).
      xi:   [N, HPAD, WL] int32 — pass-2 column index (padded coords).
      wx0/wx1: [N, HPAD, WL] f32 — pass-2 weights (validity included).
      corr_pos: [N, K] int32 flat output positions (oy*w + ox; 0-padded).
      corr_yx:  [N, K, 2] int32 corner top-left (padded coords).
      corr_w:   [N, K, 4] f32 corner weights (w00, w01, w10, w11).
      corr_n:   [N] int — true correction counts.
      exact:    bool — True if any frame overflowed the budget; caller
                should use the exact gather for the whole batch.
    """

    __slots__ = (
        "j", "v0", "v1", "xi", "wx0", "wx1",
        "corr_pos", "corr_yx", "corr_w", "corr_n",
        "exact", "h", "w", "budget",
    )


def _pad_to(x, axis, mult):
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths)


def _sampling_math(fx, fy, h, w, align_corners):
    """Mirror of ops/warp.py `_grid_sample_planes` index/weight math in f32
    numpy (bit-identical: same ops, same order, f32 throughout)."""
    xx = np.arange(w, dtype=np.float32)[None, None, :]
    yy = np.arange(h, dtype=np.float32)[None, :, None]
    vx = xx + fx.astype(np.float32)
    vy = yy + fy.astype(np.float32)
    gx = np.float32(2.0) * vx / np.float32(max(w - 1, 1)) - np.float32(1.0)
    gy = np.float32(2.0) * vy / np.float32(max(h - 1, 1)) - np.float32(1.0)
    if align_corners:
        ix = (gx + np.float32(1.0)) * np.float32(w - 1) / np.float32(2.0)
        iy = (gy + np.float32(1.0)) * np.float32(h - 1) / np.float32(2.0)
    else:
        ix = ((gx + np.float32(1.0)) * np.float32(w) - np.float32(1.0)) / np.float32(2.0)
        iy = ((gy + np.float32(1.0)) * np.float32(h) - np.float32(1.0)) / np.float32(2.0)
    x0 = np.floor(ix)
    y0 = np.floor(iy)
    wx = ix - x0
    wy = iy - y0
    xi = np.clip(x0.astype(np.int32) + 1, 0, w)   # padded coords
    yi = np.clip(y0.astype(np.int32) + 1, 0, h)

    def axis_w(w0, frac, lim, d):
        valid = (w0 + d >= 0) & (w0 + d <= lim)
        return ((frac if d else 1 - frac) * valid).astype(np.float32)

    wx0 = axis_w(x0, wx, w - 1, 0)
    wx1 = axis_w(x0, wx, w - 1, 1)
    wy0 = axis_w(y0, wy, h - 1, 0)
    wy1 = axis_w(y0, wy, h - 1, 1)
    return xi, yi, wx0, wx1, wy0, wy1


def build_warp_plan(flow, feat_hw, align_corners=False, budget=16384,
                    lane_mult=128, sub_mult=8):
    """flow: (fx, fy) numpy [N, H, W] pixel-displacement planes at feature
    resolution (already magnitude-rescaled/resized — see
    `scale_and_resize_flow`); feat_hw: (h, w) of the feature map.

    Returns a WarpPlan. Pure numpy; no JAX.
    """
    fx, fy = flow
    fx = np.asarray(fx, np.float32)
    fy = np.asarray(fy, np.float32)
    n, h, w = fx.shape
    assert (h, w) == tuple(feat_hw)

    xi, yi, wx0, wx1, wy0, wy1 = _sampling_math(fx, fy, h, w, align_corners)

    # ---- scatter yi/wy through xi --------------------------------------
    # J[b, oy, t] for t in padded coords [0, w+2); later-ox writes win.
    wp2 = w + 2
    bidx = np.arange(n)[:, None, None]
    oyidx = np.arange(h)[None, :, None]
    # holes (columns no pixel scatters to) default to the identity row:
    # zero displacement, so they never inflate the kernel's banded reach
    # (any pixel actually reading a hole fails verification -> corrected)
    J = np.broadcast_to(
        np.arange(h, dtype=np.int32)[None, :, None], (n, h, wp2)
    ).copy()
    V0 = np.zeros((n, h, wp2), np.float32)
    V1 = np.zeros((n, h, wp2), np.float32)
    for t_off in (1, 0):  # xi+1 first so xi (the primary read) wins ties
        t = xi + t_off
        J[bidx, oyidx, t] = yi
        V0[bidx, oyidx, t] = wy0
        V1[bidx, oyidx, t] = wy1

    # ---- verify (vectorized gather-back) --------------------------------
    def read(plane, t):
        return plane[bidx, oyidx, t]

    # a read column only needs to be consistent when its x-weight is
    # nonzero (zero-weight reads contribute nothing in pass 2)
    ok = np.ones((n, h, w), bool)
    for t, wgt in ((xi, wx0), (xi + 1, wx1)):
        good = (read(J, t) == yi) & (read(V0, t) == wy0) & (read(V1, t) == wy1)
        ok &= good | (wgt == 0)

    corr = ~ok
    corr_n = corr.reshape(n, -1).sum(axis=1)
    k = int(budget)

    plan = WarpPlan()
    plan.h, plan.w = h, w
    plan.budget = k
    plan.exact = bool((corr_n > k).any())
    plan.corr_n = corr_n

    if plan.exact:
        return plan

    # ---- correction lists (fixed size K, 0-padded) ----------------------
    corr_pos = np.zeros((n, k), np.int32)
    corr_yx = np.zeros((n, k, 2), np.int32)
    corr_w = np.zeros((n, k, 4), np.float32)
    flat_yi = yi.reshape(n, -1)
    flat_xi = xi.reshape(n, -1)
    w00 = (wy0 * wx0).reshape(n, -1)
    w01 = (wy0 * wx1).reshape(n, -1)
    w10 = (wy1 * wx0).reshape(n, -1)
    w11 = (wy1 * wx1).reshape(n, -1)
    for b in range(n):
        pos = np.nonzero(corr[b].reshape(-1))[0]
        m = len(pos)
        corr_pos[b, :m] = pos
        corr_yx[b, :m, 0] = flat_yi[b, pos]
        corr_yx[b, :m, 1] = flat_xi[b, pos]
        corr_w[b, :m, 0] = w00[b, pos]
        corr_w[b, :m, 1] = w01[b, pos]
        corr_w[b, :m, 2] = w10[b, pos]
        corr_w[b, :m, 3] = w11[b, pos]
        # padding rows (index >= corr_n[b]) are masked device-side by
        # arange(K) < corr_n — weights are NOT a reliable sentinel (a real
        # correction can legitimately have all-zero weights)

    # ---- kernel layouts --------------------------------------------------
    # pass 1: planes transposed to [W+2 (sublanes), H (lanes)], H padded to
    # lane multiple; pass 2: [H (sublanes), W+2 (lanes)] padded likewise.
    def t_pad(x, dtype):
        xt = np.ascontiguousarray(np.swapaxes(x, 1, 2)).astype(dtype)
        xt = _pad_to(xt, 1, sub_mult)
        return _pad_to(xt, 2, lane_mult)

    plan.j = t_pad(J, np.int32)
    plan.v0 = t_pad(V0, np.float32)
    plan.v1 = t_pad(V1, np.float32)

    def pad2(x, dtype):
        x = _pad_to(np.asarray(x, dtype), 1, sub_mult)
        return _pad_to(x, 2, lane_mult)

    plan.xi = pad2(xi, np.int32)
    plan.wx0 = pad2(wx0, np.float32)
    plan.wx1 = pad2(wx1, np.float32)
    plan.corr_pos = corr_pos
    plan.corr_yx = corr_yx
    plan.corr_w = corr_w
    return plan

"""r4j: can the stem go 4x deeper on the lane axis?

The r4i profile attributes 1.14 ms/GOP to the two LR stem convs
(fusion.1033/.1031, [11,180,240,64] from the s2d2 4x4x12 form — the MXU
contraction dim is 12 of 128 lanes, 9.4% utilization; measured 20.5 TF/s
matches that model exactly) plus ~0.7 ms to the stem maxpools' reduce_window
layout copies (fusion.76, reduce_window_max.14, copy.334/.343/.333).

The rewrite under test: space-to-depth ONCE MORE. On the s2d4 grid
[H/4, W/4, 48] the exact 7x7/s2 stem becomes a single 3x3 conv over 48
channels emitting all four output parities as channel blocks
[H/4, W/4, 4*64] (tap (a,b) of the padded 4x4-kernel form lands at block
(py,px), tap (qy,qx), input parity (ey,ex) iff a = 2*qy+ey+2-py and
b = 2*qx+ex+2-px are in 0..3; out-of-range taps are zeros). 48/128 lanes =
37.5% — the model predicts ~3-4x on the conv. Downstream consumers eat the
parity blocks directly, never materializing [H/2,W/2,64]:
  - BN+ReLU: per-channel params tiled 4x (elementwise — bitwise equal).
  - resnet maxpool 3x3/s2/p1: separable parity max — logical row 2i-1 is
    block-(py=1) row i-1, 2i is (py=0, i), 2i+1 is (py=1, i), so the H pass
    is max of two aligned blocks and one shifted block; same on W.
  - bise18 spatial conv2 (3x3/s2/p1): a 2x2 conv over the 256-ch block form
    (dy = 2*qy+py-2), contraction 256 = full lanes.

Arms (LR batch [11,360,480,3] and HR keyframe [1,720,960,3]):
  plain7       lax 7x7/s2 conv (no s2d)                       [numerics ref]
  cur          production _conv_s2d_stem from packed z12
  s2d4         3x3x48->256 block conv (incl. the extra unshuffle)
  s2d4+d2s     same + depth-to-space back to [H/2,W/2,64]
  pool-cur     stem+BN+ReLU+reduce_window maxpool (resnet stem, production)
  pool-s2d4    block stem + tiled BN/ReLU + parity maxpool
  sp-cur       spatial conv1+BN/ReLU+conv2(s2) (production)
  sp-s2d4      block conv1 + tiled BN/ReLU + 2x2x256 conv2

Numerics: f32 max|d| vs plain7 for every arm pair; bf16 outputs compared
cur-vs-s2d4 by exact-match fraction (the contraction order differs, so
bitwise equality is NOT expected — the s2d2 path itself is only ~1e-5 close
to plain, functional.py:160-167).

Usage: python probes/r4/tools_probe_r4j.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from arseg_tpu.utils.compile_cache import enable_compile_cache
from arseg_tpu.nn import functional as Fn

enable_compile_cache()


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def bench(name, fn, *args, iters=30, rounds=5):
    try:
        for _ in range(2):
            _sync(fn(*args))
    except Exception as e:  # noqa: BLE001
        print(f"{name:12s} FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
        return None
    ts = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        ts.append((time.perf_counter() - t0) / iters)
    t = sorted(ts)[len(ts) // 2]
    print(f"{name:14s} {t*1e3:8.3f} ms", flush=True)
    return t


def s2d(x):
    """2x2 pixel-unshuffle, channel order dy*2C + dx*C + cc (slice form)."""
    n, h, w, c = x.shape
    a = x[:, 0::2].reshape(n, h // 2, w // 2, 2 * c)
    b = x[:, 1::2].reshape(n, h // 2, w // 2, 2 * c)
    return jnp.concatenate([a, b], axis=-1)


def build_w4(w7):
    """[7,7,C,O] -> [4,4,4C,O] (functional._conv_s2d_stem's transform)."""
    c, o = w7.shape[2], w7.shape[3]
    wp = np.pad(np.asarray(w7, np.float32), ((1, 0), (1, 0), (0, 0), (0, 0)))
    w4 = wp.reshape(4, 2, 4, 2, c, o).transpose(0, 2, 1, 3, 4, 5)
    return w4.reshape(4, 4, 4 * c, o)


def build_k_s2d4(w7):
    """[7,7,C,O] -> [3,3,16C,4O]: the s2d4 block-form stem kernel.

    Output channel block (py*2+px)*O holds logical parity (py,px); input
    channel block (ey*2+ex)*4C+c4 is z4's order (s2d of z12's order)."""
    w4 = build_w4(w7)
    c4, o = w4.shape[2], w4.shape[3]
    K = np.zeros((3, 3, 4 * c4, 4 * o), np.float32)
    for py in range(2):
        for px in range(2):
            for qy in range(-1, 2):
                for ey in range(2):
                    a4 = 2 * qy + ey + 2 - py
                    if not 0 <= a4 <= 3:
                        continue
                    for qx in range(-1, 2):
                        for ex in range(2):
                            b4 = 2 * qx + ex + 2 - px
                            if not 0 <= b4 <= 3:
                                continue
                            K[qy + 1, qx + 1,
                              (ey * 2 + ex) * c4:(ey * 2 + ex + 1) * c4,
                              (py * 2 + px) * o:(py * 2 + px + 1) * o] = w4[a4, b4]
    return K


def build_k2_s2d(w3):
    """[3,3,Cin,Cout] -> [2,2,4Cin,Cout]: 3x3/s2/p1 conv consuming the
    block form (logical row 2i+dy lives at block py=(dy+2)%2, row i+qy-1
    with dy = 2*qy+py-2)."""
    cin, cout = w3.shape[2], w3.shape[3]
    K = np.zeros((2, 2, 4 * cin, cout), np.float32)
    for qy in range(2):
        for py in range(2):
            dy = 2 * qy + py - 2
            if not -1 <= dy <= 1:
                continue
            for qx in range(2):
                for px in range(2):
                    dx = 2 * qx + px - 2
                    if not -1 <= dx <= 1:
                        continue
                    K[qy, qx,
                      (py * 2 + px) * cin:(py * 2 + px + 1) * cin] = \
                        np.asarray(w3[dy + 1, dx + 1], np.float32)
    return K


def d2s(b, o):
    n, hq, wq, _ = b.shape
    z = b.reshape(n, hq, wq, 2, 2, o).transpose(0, 1, 3, 2, 4, 5)
    return z.reshape(n, hq * 2, wq * 2, o)


def conv(x, k, pad, stride=(1, 1)):
    return jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), window_strides=stride, padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision="highest")


def shift_down(x, fill):
    """y[i] = x[i-1] along H, fill at i=0."""
    return jnp.concatenate(
        [jnp.full_like(x[:, :1], fill), x[:, :-1]], axis=1)


def shift_right(x, fill):
    return jnp.concatenate(
        [jnp.full_like(x[:, :, :1], fill), x[:, :, :-1]], axis=2)


def maxpool_parity(b, o):
    """3x3/s2/p1 maxpool on the logical image, from block form -> [.., O]."""
    B = [[b[..., (py * 2 + px) * o:(py * 2 + px + 1) * o]
          for px in range(2)] for py in range(2)]
    ninf = jnp.array(-jnp.inf, b.dtype)
    M = [jnp.maximum(jnp.maximum(shift_down(B[1][px], ninf), B[0][px]),
                     B[1][px]) for px in range(2)]
    return jnp.maximum(jnp.maximum(shift_right(M[1], ninf), M[0]), M[1])


def bn_relu(x, scale, bias):
    return jnp.maximum(x * scale.astype(x.dtype) + bias.astype(x.dtype), 0)


def main():
    rng = np.random.RandomState(0)
    O = 64
    w7 = rng.randn(7, 7, 3, O).astype(np.float32) * 0.1
    w3 = rng.randn(3, 3, O, O).astype(np.float32) * 0.1
    bn_s = rng.rand(O).astype(np.float32) + 0.5
    bn_b = rng.randn(O).astype(np.float32) * 0.1
    K4 = build_k_s2d4(w7)
    K2 = build_k2_s2d(w3)
    bn_s4, bn_b4 = np.tile(bn_s, 4), np.tile(bn_b, 4)

    for label, n, h, w in (("LR", 11, 360, 480), ("HR", 1, 720, 960)):
        x = rng.randn(n, h, w, 3).astype(np.float32)
        print(f"== {label} [{n},{h},{w},3] ==", flush=True)
        for dt in (jnp.float32, jnp.bfloat16):
            xd = jnp.asarray(x).astype(dt)
            z12 = jax.jit(s2d)(xd)
            z4 = jax.jit(lambda a: s2d(s2d(a)))(xd)

            plain7 = jax.jit(lambda a: conv(a, jnp.asarray(w7), [(3, 3), (3, 3)],
                                            (2, 2)))
            cur = jax.jit(lambda z: Fn._conv_s2d_stem(
                {"weight": jnp.asarray(w7)}, Fn.S2DPacked(z)))
            s2d4_blocks = jax.jit(lambda z: conv(z, jnp.asarray(K4),
                                                 [(1, 1), (1, 1)]))
            s2d4_full = jax.jit(lambda z: d2s(conv(z, jnp.asarray(K4),
                                                   [(1, 1), (1, 1)]), O))

            pool_cur = jax.jit(lambda z: Fn.max_pool_3x3_s2_p1(
                bn_relu(Fn._conv_s2d_stem({"weight": jnp.asarray(w7)},
                                          Fn.S2DPacked(z)),
                        jnp.asarray(bn_s), jnp.asarray(bn_b))))
            pool_s2d4 = jax.jit(lambda z: maxpool_parity(
                bn_relu(conv(z, jnp.asarray(K4), [(1, 1), (1, 1)]),
                        jnp.asarray(bn_s4), jnp.asarray(bn_b4)), O))

            sp_cur = jax.jit(lambda z: conv(
                bn_relu(Fn._conv_s2d_stem({"weight": jnp.asarray(w7)},
                                          Fn.S2DPacked(z)),
                        jnp.asarray(bn_s), jnp.asarray(bn_b)),
                jnp.asarray(w3), [(1, 1), (1, 1)], (2, 2)))
            sp_s2d4 = jax.jit(lambda z: conv(
                bn_relu(conv(z, jnp.asarray(K4), [(1, 1), (1, 1)]),
                        jnp.asarray(bn_s4), jnp.asarray(bn_b4)),
                jnp.asarray(K2), [(1, 0), (1, 0)]))

            tag = "f32" if dt == jnp.float32 else "bf16"
            t_plain = bench(f"{tag} plain7", plain7, xd)
            t_cur = bench(f"{tag} cur", cur, z12)
            t_b = bench(f"{tag} s2d4", s2d4_blocks, z4)
            t_f = bench(f"{tag} s2d4+d2s", s2d4_full, z4)
            t_pc = bench(f"{tag} pool-cur", pool_cur, z12)
            t_p4 = bench(f"{tag} pool-s2d4", pool_s2d4, z4)
            t_sc = bench(f"{tag} sp-cur", sp_cur, z12)
            t_s4 = bench(f"{tag} sp-s2d4", sp_s2d4, z4)

            if dt == jnp.float32:
                ref = np.asarray(plain7(xd))
                for nm, fn_, z in (("cur", cur, z12), ("s2d4+d2s", s2d4_full, z4)):
                    d = np.abs(np.asarray(fn_(z)) - ref).max()
                    print(f"  f32 max|d| {nm:10s} vs plain7: {d:.3e}",
                          flush=True)
                dpool = np.abs(np.asarray(pool_s2d4(z4))
                               - np.asarray(pool_cur(z12))).max()
                dsp = np.abs(np.asarray(sp_s2d4(z4))
                             - np.asarray(sp_cur(z12))).max()
                print(f"  f32 max|d| pool-s2d4 vs pool-cur: {dpool:.3e}; "
                      f"sp-s2d4 vs sp-cur: {dsp:.3e}", flush=True)
            if None not in (t_cur, t_b, t_pc, t_p4, t_sc, t_s4):
                print(f"  {tag} deltas: conv {1e3*(t_cur-t_b):+.3f} "
                      f"(d2s form {1e3*(t_cur-t_f):+.3f}), "
                      f"pool {1e3*(t_pc-t_p4):+.3f}, "
                      f"spatial {1e3*(t_sc-t_s4):+.3f} ms", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

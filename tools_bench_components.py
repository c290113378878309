import numpy as np, jax, jax.numpy as jnp, time
from arseg_tpu.models import build_model
from arseg_tpu.ops import resize_bilinear, warp_feature, scale_and_resize_flow
from arseg_tpu.ops.local_attention import _creff_reference
from arseg_tpu.ops.pallas_creff import creff_fused_pallas

hr = build_model('camvid-psp18', fuse=False)
lr = build_model('camvid-psp18', fuse=True)
hp = hr.init(jax.random.PRNGKey(0)); lp = lr.init(jax.random.PRNGKey(1))
rng = np.random.RandomState(0)

def bench(name, fn, *args, iters=10):
    print('compiling', name, flush=True)
    f = jax.jit(lambda *a: jnp.sum(jax.tree_util.tree_leaves(fn(*a))[0].astype(jnp.float32)))
    t0=time.perf_counter(); float(f(*args)); print('  compile', time.perf_counter()-t0, flush=True)
    t0=time.perf_counter()
    out=None
    for _ in range(iters): out = f(*args)
    float(out)
    print(f'{name}: {(time.perf_counter()-t0)/iters*1000:.2f} ms', flush=True)

kf = jnp.asarray(rng.randn(1,720,960,3).astype(np.float32))
bench('hr_forward 720x960', lambda p,x: hr.apply(p,x)[0], hp, kf)
feat = jnp.asarray(rng.randn(1,360,480,64).astype(np.float32))
bench('resize up2x', lambda x: resize_bilinear(x, (720,960), True), feat)
ref = jnp.asarray(rng.randn(1,720,960,64).astype(np.float32))
flow = jnp.asarray(rng.randn(1,720,960,2).astype(np.float32))
bench('flow resize+warp', lambda r,f: warp_feature(r, scale_and_resize_flow(f, (720,960), 'bilinear')), ref, flow)
xlr = jnp.asarray(rng.randn(1,360,480,3).astype(np.float32))
bench('lr_phase1 360x480', lambda p,x: lr.forward_phase1(p,x)[-1], lp, xlr)
bench('phase2 (CReFF+head)', lambda p,f,r: lr.forward_phase2(p,f,r)[0], lp, feat, ref)
q = jnp.asarray(rng.randn(1,720,960,64).astype(np.float32))
bench('creff_pallas', lambda a,b,c: creff_fused_pallas(a,b,c,7,7), q, ref, ref)
bench('creff_xla_ref', lambda a,b,c: _creff_reference(a,b,c,7,7), q, ref, ref)

"""256^3 7-pt sweep-variant shootout on hardware.

Variants: dense 2D-tiled pipelined (ops.pallas3), streaming wavefront
octant (ops.pallas3_stream, paneled), and the standalone split-layout
restrict/interp kernels (lane panels — first hardware run)."""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax, jax.numpy as jnp
from timing_util import timed_loop
from cedar_tpu.core.types import StencilKind, Dir3
from cedar_tpu.ops import pallas3, pallas3_split as p3s, pallas3_stream as p3st
from cedar_tpu import gallery

n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
kind = StencilKind.seven_pt
so = gallery.poisson3(n, n, n, dtype=jnp.float32)
key = jax.random.PRNGKey(0)
q = jax.random.normal(key, (n, n, n), jnp.float32)
b = jax.random.normal(key, (n, n, n), jnp.float32)
gb_sweep = (4 * q.nbytes + 2 * q.nbytes + q.nbytes) / 1e9

def t(label, f, *args):
    try:
        t0 = time.time()
        jax.block_until_ready(f(*args))
        c = time.time() - t0
        ms = timed_loop(f, *args, reps=(4, 16))
        print(f"  {label:40}: {ms:7.3f} ms   (first {c:.0f}s)", flush=True)
        return ms
    except Exception as e:
        print(f"  {label:40}: FAILED {type(e).__name__}: {str(e)[:140]}",
              flush=True)

print(f"n={n}", flush=True)
assert pallas3.supported(q.shape, q.dtype, kind)
t("dense sweep", lambda q, so, b: pallas3.point_relax(
    so, q, b, None, "down", kind=kind), q, so, b)
t("dense sweep + res", lambda q, so, b: pallas3.point_relax(
    so, q, b, None, "down", fuse_residual=True, kind=kind)[0], q, so, b)

dims = p3s.split_dims3(n, n, n)
nxp, ny2, nz2, kp = dims
so4 = p3s.split_so4(so, kind, dims)
q4 = p3s.split4(q, dims)
b4 = p3s.split4(b, dims)
print(f"stream plan = {p3st._plan_stream(kind, nxp, ny2, nz2)}", flush=True)
t("stream sweep", lambda q4, so4, b4: p3st.point_relax_stream3(
    so4, q4, b4, kind, "down", nz2=nz2), q4, so4, b4)
t("stream sweep + res", lambda q4, so4, b4: p3st.point_relax_stream3(
    so4, q4, b4, kind, "down", fuse_residual=True, nz2=nz2)[0], q4, so4, b4)
# forced T=32 stream plan (if rows fit)
for T, W, h in ((32, 64, 4), (16, 128, 4), (16, 32, 4)):
    if nxp % T == 0 and (kp // nz2) % W == 0 and W % h == 0:
        t(f"stream sweep T={T} W={W} h={h}",
          lambda q4, so4, b4, T=T, W=W, h=h: p3st._stream_call3(
              so4, q4, b4, kind, "down", nz2, T, "none", W=W, h=h),
          q4, so4, b4)

# split-layout transfer kernels (panels) on an emitted residual
from cedar_tpu.ops.interp3 import setup_interp
ci = setup_interp(so, kind)
pw4 = p3s.setup_pw4(ci, (n, n, n), kind)
nc = tuple((d - 1) // 2 + 1 for d in (n, n, n))
res4 = jax.random.normal(key, q4.shape, jnp.float32)
rplan = p3s._restrict_plan(nxp, kp, nz2)
iplan = p3s._interp_plan(nxp, kp, nz2)
print(f"restrict plan={rplan} interp plan={iplan}", flush=True)
def chain_restrict(res4, pw4):
    cbf = p3s._restrict_call3(pw4, res4, nz2, rplan)
    return res4.at[0, 0, 0].add(cbf[0, 0] * 1e-30)
t("standalone restrict (panel)", chain_restrict, res4, pw4)
rows = nxp // 2 + 2 * 16
cx = jnp.zeros(nc, jnp.float32)
cxp = jnp.pad(cx, ((0, rows - nc[0]), (0, ny2 - nc[1]), (0, nz2 - nc[2])))
cxp = cxp.reshape(rows, kp)
t("pointwise interp (panel)",
  lambda q4, cxp, res4, pw4: p3s._interp_call3(
      pw4, cxp, so4[Dir3.P], res4, q4, nz2, iplan), q4, cxp, res4, pw4)

# XLA transfer baselines
from cedar_tpu.ops.interp3 import restrict as restrict_xla, interp_add as interp_add_xla
res = jax.random.normal(key, (n, n, n), jnp.float32)
t("XLA restrict", lambda res, ci: jnp.pad(restrict_xla(ci, res),
  ((0, res.shape[0] - nc[0]), (0, 0), (0, 0)))[:res.shape[0]] if False else
  res.at[0, 0, 0].add(restrict_xla(ci, res)[0, 0, 0] * 1e-30), res, ci)
cx3 = jnp.zeros(nc, jnp.float32)
t("XLA interp_add", lambda q, cx3, res: interp_add_xla(ci, so, cx3, res, q),
  q, cx3, res)

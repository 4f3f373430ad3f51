"""Round 2 of the 256^3 shootout: T=32 stream variants with res/norm,
panel interp with operands as args (no closure constants -> no 413)."""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax, jax.numpy as jnp
from timing_util import timed_loop
from cedar_tpu.core.types import StencilKind, Dir3
from cedar_tpu.ops import pallas3_split as p3s, pallas3_stream as p3st
from cedar_tpu import gallery

n = 256
kind = StencilKind.seven_pt
so = gallery.poisson3(n, n, n, dtype=jnp.float32)
key = jax.random.PRNGKey(0)
dims = p3s.split_dims3(n, n, n)
nxp, ny2, nz2, kp = dims
so4 = p3s.split_so4(so, kind, dims)
q4 = jax.random.normal(key, (4, nxp, kp), jnp.float32)
b4 = jax.random.normal(key, (4, nxp, kp), jnp.float32)

def t(label, f, *args, reps=(4, 16)):
    try:
        t0 = time.time(); jax.block_until_ready(f(*args)); c = time.time()-t0
        ms = timed_loop(f, *args, reps=reps)
        print(f"  {label:40}: {ms:7.3f} ms   (first {c:.0f}s)", flush=True)
        return ms
    except Exception as e:
        print(f"  {label:40}: FAILED {type(e).__name__}: {str(e)[:120]}",
              flush=True)

for T, W, h in ((32, 32, 4), (32, 16, 4), (32, 64, 4)):
    t(f"stream T={T} W={W} h={h} plain",
      lambda q4, so4, b4, T=T, W=W, h=h: p3st._stream_call3(
          so4, q4, b4, kind, "down", nz2, T, "none", W=W, h=h), q4, so4, b4)
    t(f"stream T={T} W={W} h={h} +res",
      lambda q4, so4, b4, T=T, W=W, h=h: p3st._stream_call3(
          so4, q4, b4, kind, "down", nz2, T, "res", W=W, h=h)[0], q4, so4, b4)
    t(f"stream T={T} W={W} h={h} +norm",
      lambda q4, so4, b4, T=T, W=W, h=h: p3st._stream_call3(
          so4, q4, b4, kind, "down", nz2, T, "norm", W=W, h=h)[0], q4, so4, b4)

t("stream T=16 W=32 +res",
  lambda q4, so4, b4: p3st._stream_call3(
      so4, q4, b4, kind, "down", nz2, 16, "res", W=32, h=4)[0], q4, so4, b4)

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
t("standalone restrict (panel) reps8/32", chain_restrict, res4, pw4,
  reps=(8, 32))
rows = nxp // 2 + 2 * 16
cxp = jnp.zeros((rows, kp), jnp.float32)
diag4 = so4[Dir3.P]
t("pointwise interp (panel)",
  lambda q4, cxp, res4, pw4, diag4: p3s._interp_call3(
      pw4, cxp, diag4, res4, q4, nz2, iplan), q4, cxp, res4, pw4, diag4)

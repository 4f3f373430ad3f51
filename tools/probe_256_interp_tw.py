"""W sweep for the fused-interp stream post-pass at 256^3."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax, jax.numpy as jnp
from timing_util import timed_loop
from cedar_tpu.core.types import StencilKind
from cedar_tpu.ops import pallas3_split as p3s, pallas3_stream as p3st
from cedar_tpu.ops.interp3 import setup_interp
from cedar_tpu import gallery

kind = StencilKind.seven_pt
n = 256
so = gallery.poisson3(n, n, n, dtype=jnp.float32)
dims = p3s.split_dims3(n, n, n)
nxp, ny2, nz2, kp = dims
key = jax.random.PRNGKey(0)
so4 = p3s.split_so4(so, kind, dims)
q4 = jax.random.normal(key, (4, nxp, kp), jnp.float32)
b4 = jax.random.normal(key, (4, nxp, kp), jnp.float32)
res4 = jax.random.normal(key, (4, nxp, kp), jnp.float32)
ci = setup_interp(so, kind)
pw4 = p3s.setup_pw4(ci, (n, n, n), kind)
rows = nxp // 2 + 32
cxp = jnp.zeros((rows, kp), jnp.float32)
print("auto plan:", p3st._plan_stream(kind, nxp, ny2, nz2, interp=True),
      flush=True)

def t(label, f, *args):
    try:
        ms = timed_loop(f, *args, reps=(8, 32))
        print(f"  {label:30}: {ms:7.3f} ms", flush=True)
    except Exception as e:
        print(f"  {label:30}: FAILED {type(e).__name__} {str(e)[:110]}",
              flush=True)

for (T, W, h) in ((16, 32, 4), (16, 64, 4), (32, 32, 4), (16, 16, 4)):
    t(f"interp+sweep+norm T={T} W={W}",
      lambda q4, so4, b4, pw4, cxp, res4, T=T, W=W, h=h:
      p3st._stream_interp_call3(so4, q4, b4, pw4, cxp, res4, kind, "down",
                                nz2, T, "norm", W=W, h=h)[0],
      q4, so4, b4, pw4, cxp, res4)

"""High-rep (stable) T/W plan sweep for the 256^3 7-pt stream kernel."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax, jax.numpy as jnp
from timing_util import timed_loop
from cedar_tpu.core.types import StencilKind
from cedar_tpu.ops import pallas3_split as p3s, pallas3_stream as p3st

kind = StencilKind.seven_pt
n = 256
dims = p3s.split_dims3(n, n, n)
nxp, ny2, nz2, kp = dims
key = jax.random.PRNGKey(0)
so4 = jax.random.uniform(key, (4, 4, nxp, kp), jnp.float32) + 1.0
q4 = jax.random.normal(key, (4, nxp, kp), jnp.float32)
b4 = jax.random.normal(key, (4, nxp, kp), jnp.float32)

def t(label, f, *args):
    try:
        ms = timed_loop(f, *args, reps=(10, 40))
        print(f"  {label:34}: {ms:7.3f} ms", flush=True)
    except Exception as e:
        print(f"  {label:34}: FAILED {type(e).__name__} {str(e)[:90]}",
              flush=True)

for (T, W, h) in ((16, 64, 4), (32, 64, 4), (32, 32, 4), (64, 8, 4),
                  (64, 16, 4), (32, 16, 4)):
    if nxp % T:
        continue
    t(f"T={T} W={W} h={h} plain",
      lambda q4, so4, b4, T=T, W=W, h=h: p3st._stream_call3(
          so4, q4, b4, kind, "down", nz2, T, "none", W=W, h=h),
      q4, so4, b4)
    t(f"T={T} W={W} h={h} +res",
      lambda q4, so4, b4, T=T, W=W, h=h: p3st._stream_call3(
          so4, q4, b4, kind, "down", nz2, T, "res", W=W, h=h)[0],
      q4, so4, b4)

"""Minimal hardware probe: one stream sweep at the given size, timed."""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax, jax.numpy as jnp
from timing_util import timed_loop
from cedar_tpu.core.types import StencilKind
from cedar_tpu.ops import pallas3_split as p3s
from cedar_tpu.ops import pallas3_stream as p3st

n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
kind = StencilKind.twenty_seven_pt if "27" in sys.argv[2:] else StencilKind.seven_pt
dims = p3s.split_dims3(n, n, n)
nxp, ny2, nz2, kp = dims
plan = p3st._plan_stream(kind, nxp, ny2, nz2)
print(f"n={n} kind={kind.name} dims={dims} plan={plan}", flush=True)
key = jax.random.PRNGKey(0)
so4 = jax.random.uniform(key, (4 if kind == StencilKind.seven_pt else 14, 4, nxp, kp), jnp.float32) + 1.0
q4 = jax.random.normal(key, (4, nxp, kp), jnp.float32)
b4 = jax.random.normal(key, (4, nxp, kp), jnp.float32)
t0 = time.time()
out = p3st.point_relax_stream3(so4, q4, b4, kind, "down", nz2=nz2)
out.block_until_ready()
print(f"first call (compile+run): {time.time()-t0:.1f}s", flush=True)
ms = timed_loop(lambda q4, so4, b4: p3st.point_relax_stream3(so4, q4, b4, kind, "down", nz2=nz2), q4, so4, b4)
gb = (so4.nbytes + 2*q4.nbytes + q4.nbytes) / 1e9
print(f"stream sweep: {ms:.3f} ms  eff BW {gb/ms*1e3:.0f} GB/s", flush=True)
ms = timed_loop(lambda q4, so4, b4: p3st.point_relax_stream3(so4, q4, b4, kind, "down", fuse_residual=True, nz2=nz2)[0], q4, so4, b4)
print(f"stream sweep+res: {ms:.3f} ms", flush=True)
ms = timed_loop(lambda q4, so4, b4: p3st.point_relax_stream3(so4, q4, b4, kind, "down", fuse_norm=True, nz2=nz2)[0], q4, so4, b4)
print(f"stream sweep+norm: {ms:.3f} ms", flush=True)

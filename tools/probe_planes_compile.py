"""Compile-time probe for the batched plane-smooth kernel variants."""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import jax, jax.numpy as jnp
from cedar_tpu.core.types import StencilKind
from cedar_tpu.ops import pallas_planes2 as pp

key = jax.random.PRNGKey(0)
B, n1, n2 = 64, 128, 128
so = jax.random.uniform(key, (B, 3, n1, n2), jnp.float32) + 1.0
q = jax.random.normal(key, (B, n1, n2), jnp.float32)
b = jax.random.normal(key, (B, n1, n2), jnp.float32)
for label, f in [
    ("plain smooth", lambda: pp.line_xy_smooth_batched(
        so, q, b, StencilKind.five_pt, "down")),
    ("smooth+res", lambda: pp.line_xy_smooth_batched(
        so, q, b, StencilKind.five_pt, "down", 1, emit_res=True)),
]:
    t0 = time.time()
    out = f()
    jax.block_until_ready(out)
    print(f"{label}: compile+run {time.time()-t0:.0f}s", flush=True)

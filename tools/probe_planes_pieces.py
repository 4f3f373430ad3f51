"""Decompose the embedded batched 2D plane cycle at 128^3 plane-xy:
per-op timings over the (64, 128, 128) color batch and down the
embedded hierarchy."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax, jax.numpy as jnp
from timing_util import timed_loop
from cedar_tpu import SevenPt, Solver3, gallery
from cedar_tpu.config import Config
from cedar_tpu.core.types import StencilKind
from cedar_tpu.ops import planes3
from cedar_tpu.ops import pallas_planes2 as pp2
from cedar_tpu.ops.stencil2 import residual as res2_xla
from cedar_tpu.ops.interp2 import restrict as restrict2, interp_add as interp_add2
from cedar_tpu.ops import cg

n = 128
so = gallery.diag_diffusion3(n, n, n, 1.0, 1.0, 1e-3, dtype=jnp.float32)
b = gallery.poisson3_rhs(n, n, n, dtype=jnp.float32)
conf = Config({"log": [], "solver": {
    "relaxation": "plane-xy",
    "cycle": {"nrelax-pre": 1, "nrelax-post": 1},
    "max-iter": 2, "tol": 1e-6}})
s = Solver3(so, SevenPt, conf)
lev = s.levels[0]
hier = lev.planes["xy"]
st = s.settings.plane_settings
print("plane settings:", st, flush=True)
print("embedded levels:", [l2.so.shape for l2 in hier], flush=True)

hier_c = jax.tree.map(lambda a: a[0::2], hier)
key = jax.random.PRNGKey(0)

def t(label, f, *args, reps=(8, 32)):
    ms = timed_loop(f, *args, reps=reps)
    print(f"  {label:42}: {ms*1e3:8.1f} us", flush=True)
    return ms

for li, l2 in enumerate(hier_c):
    B, nd, n1, n2 = l2.so.shape
    q = jax.random.normal(key, (B, n1, n2), jnp.float32)
    bb = jax.random.normal(key, (B, n1, n2), jnp.float32)
    kind2 = StencilKind.five_pt if li == 0 else StencilKind.nine_pt
    t(f"L{li} ({B},{n1},{n2}) fused smooth kernel",
      lambda q, so_b, bb, k=kind2: pp2.line_xy_smooth_batched(
          so_b, q, bb, k, "down"), q, l2.so, bb)
    vres = jax.vmap(lambda so_, q_, b_, k=kind2: res2_xla(so_, q_, b_, k))
    t(f"L{li} vmapped residual",
      lambda q, so_b, bb: vres(so_b, q, bb), q, l2.so, bb)
    if li + 1 < len(hier_c):
        nxt = hier_c[li + 1]
        ncs = nxt.so.shape[2:]
        vrestrict = jax.vmap(lambda ci_, r_: restrict2(ci_, r_))
        t(f"L{li} vmapped restrict",
          lambda r, ci_b: r.at[0, 0, 0].add(
              vrestrict(ci_b, r)[0, 0, 0] * 1e-30), q, nxt.ci)
        cxs = jax.random.normal(key, (B,) + ncs, jnp.float32)
        vinterp = jax.vmap(
            lambda ci_, so_, cx_, r_, q_: interp_add2(
                ci_, so_, cx_, r_, q_))
        t(f"L{li} vmapped interp_add",
          lambda q, ci_b, so_b, cx_b, r: vinterp(ci_b, so_b, cx_b, r, q),
          q, nxt.ci, l2.so, cxs, bb)
    if li == len(hier_c) - 1 and l2.ainv is not None:
        t(f"L{li} coarse solve",
          lambda bb: jax.vmap(cg.solve_cg)(l2.ainv, bb), bb)

vcycle2 = planes3._cached_cycle(
    [StencilKind.five_pt] + [StencilKind.nine_pt] * (len(hier) - 1), st)
b2 = planes3._to_planes(b, 2)[0::2]
x2 = jnp.zeros_like(b2)
t("whole embedded cycle", lambda x2, h, b2: vcycle2(h, x2, b2),
  x2, hier_c, b2, reps=(4, 16))

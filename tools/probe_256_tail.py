"""Decompose the 256^3 solver's L1 (128^3) tail."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax, jax.numpy as jnp
from timing_util import timed_loop
from cedar_tpu import SevenPt, Solver3, gallery
from cedar_tpu.config import Config
from cedar_tpu.core.types import StencilKind
from cedar_tpu.ops import pallas3_split as p3s, pallas3_stream as p3st
from cedar_tpu.solver import cycle3

n = 256
so = gallery.poisson3(n, n, n, dtype=jnp.float32)
s = Solver3(so, SevenPt, Config({
    "log": [], "solver": {"cycle": {"nrelax-pre": 1, "nrelax-post": 1},
                          "max-iter": 2, "tol": 1e-6}}))
kind = StencilKind.seven_pt
lev1, lev2 = s.levels[1], s.levels[2]
c1 = lev1.so.shape[1:]          # 128^3-ish
c2 = lev2.so.shape[1:]
print("levels:", [l.so.shape[1:] for l in s.levels],
      "split:", [l.so2 is not None for l in s.levels], flush=True)
dims1 = p3s.split_dims3(*c1)
nxp1, ny21, nz21, kp1 = dims1
print("L1 stream plan:", p3st._plan_stream(kind, nxp1, ny21, nz21),
      "restrict:", p3s._restrict_plan(nxp1, kp1, nz21),
      "interp:", p3s._interp_plan(nxp1, kp1, nz21), flush=True)

key = jax.random.PRNGKey(0)
cb = jax.random.normal(key, c1, jnp.float32)
cb4 = p3s.split4(cb, dims1)
q40 = jnp.zeros_like(cb4)

def t(label, f, *args, reps=(8, 32)):
    ms = timed_loop(f, *args, reps=reps)
    print(f"  {label:36}: {ms:7.3f} ms", flush=True)

t("L1 stream sweep", lambda q4, so2, b4: p3st.point_relax_stream3(
    so2, q4, b4, kind, "down", nz2=nz21), q40, lev1.so2, cb4)
t("L1 sweep_restrict", lambda q4, so2, b4, pw4: p3st.sweep_restrict_stream3(
    so2, q4, b4, pw4, kind, "down", c2, nz2=nz21)[0],
  q40, lev1.so2, cb4, lev2.pw4)
res4 = p3st.point_relax_stream3(lev1.so2, q40, cb4, kind, "down",
                                fuse_residual=True, nz2=nz21)[1]
cx = jnp.zeros(c2, jnp.float32)
t("L1 interp_sweep", lambda q4, cx, b4, res4, pw4, so2:
  p3st.interp_sweep_stream3(pw4, cx, so2, b4, q4, kind, "down", res4,
                            nz2=nz21), q40, cx, cb4, res4, lev2.pw4,
  lev1.so2)
t("L2 dense ncycle", lambda x, levels, b: cycle3.ncycle(
    levels, s.kinds, 2, x, b, s.settings),
  jnp.zeros(c2, jnp.float32), s.levels,
  jax.random.normal(key, c2, jnp.float32))
t("L1 split cycle (whole)", lambda q4, levels, b4: cycle3.ncycle_split(
    levels, s.kinds, q4, b4, s.settings, lvl=1)[0], q40, s.levels, cb4)
t("L1 DENSE ncycle", lambda x, levels, b: cycle3.ncycle(
    levels, s.kinds, 1, x, b, s.settings),
  jnp.zeros(c1, jnp.float32), s.levels, cb)

"""256^3 7-pt: L0 split-stage composed (stubbed recursion) vs pieces."""
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
b = gallery.poisson3_rhs(n, n, n, dtype=jnp.float32)
s = Solver3(so, SevenPt, Config({
    "log": [], "solver": {"cycle": {"nrelax-pre": 1, "nrelax-post": 1},
                          "max-iter": 2, "tol": 1e-6}}))
lev, coarse = s.levels[0], s.levels[1]
kind = StencilKind.seven_pt
dims = p3s.split_dims3(n, n, n)
nxp, ny2, nz2, kp = dims
b4 = p3s.split4(b, dims)
q4 = p3s.split4(jnp.zeros_like(b), dims)
cshape = coarse.so.shape[1:]

def t(label, f, *args, reps=(6, 24)):
    ms = timed_loop(f, *args, reps=reps)
    print(f"  {label:36}: {ms:7.3f} ms", flush=True)

def stage0(q4, so2, b4, pw4):
    q4, res4, cb = p3st.sweep_restrict_stream3(
        so2, q4, b4, pw4, kind, "down", cshape, nz2=nz2)
    cx = jnp.zeros_like(cb) + cb * 1e-30
    out = p3st.interp_sweep_stream3(pw4, cx, so2, b4, q4, kind, "down",
                                    res4, fuse_norm=False, nz2=nz2)
    return out

t("L0 stage (stub coarse)", stage0, q4, lev.so2, b4, coarse.pw4)

def tail(cb, levels):
    dims1 = p3s.split_dims3(*cshape)
    cb4 = p3s.split4(cb, dims1)
    cx4, _ = cycle3.ncycle_split(levels, s.kinds, jnp.zeros_like(cb4),
                                 cb4, s.settings, lvl=1)
    return p3s.merge4(cx4, *cshape)

cb = jnp.zeros(cshape, jnp.float32).at[64, 64, 64].set(1.0)
t("L1 tail (split cycle + layouts)", tail, cb, s.levels)
t("whole ncycle_split L0",
  lambda x4, levels, b4: cycle3.ncycle_split(
      levels, s.kinds, x4, b4, s.settings)[0], q4, s.levels, b4)
t("whole w/ fused final norm",
  lambda x4, levels, b4: cycle3.ncycle_split(
      levels, s.kinds, x4, b4, s.settings,
      fuse_final_residual=True)[0], q4, s.levels, b4)

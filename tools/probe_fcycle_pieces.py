"""Decompose the 4096^2 F-cycle's L0 stage: time each piece the fmg code
performs at the top level and compare with the whole."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax, jax.numpy as jnp
from timing_util import timed_loop
from cedar_tpu import FivePt, Solver2, gallery
from cedar_tpu.config import Config
from cedar_tpu.solver import cycle2
from cedar_tpu.ops import pallas2_split as ps
from cedar_tpu.ops import pallas_transfer2 as pt

n = 4096
so = gallery.poisson(n, n, dtype=jnp.float32)
b = gallery.poisson_rhs(n, n, dtype=jnp.float32)
s = Solver2(so, FivePt, Config({
    "log": [], "solver": {"cycle": {"type": "f", "nrelax-pre": 1,
                                    "nrelax-post": 1},
                          "max-iter": 2, "tol": 1e-6}}))
lev, coarse = s.levels[0], s.levels[1]
cshape = coarse.so.shape[1:]

def t(label, f, *args, reps=(4, 16)):
    ms = timed_loop(f, *args, reps=reps)
    print(f"  {label:36}: {ms:7.3f} ms", flush=True)
    return ms

# pieces of fmg's L0 stage
t("lane_split_res(b) + restrict",
  lambda b, cip: b.at[0, 0].add(
      pt.restrict(cip, pt.lane_split_res(b), cshape)[0, 0] * 1e-30),
  b, coarse.cip)
zero = jnp.zeros_like(b)
cx = jnp.zeros(cshape, jnp.float32)
t("interp_add (zero res)",
  lambda q, cx: pt.interp_add(coarse.cip, lev.rec2, cx,
                              pt.lane_split_res(jnp.zeros_like(q)), q),
  zero, cx)
nxp, W, _ = ps.split_dims(n, n)
t("lane_split + merge",
  lambda x: ps.lane_merge(ps.lane_split(x, nxp, W), n, n), b)
b2 = ps.lane_split(b, nxp, W)
x20 = ps.lane_split(zero, nxp, W)
t("ncycle_split (resident)",
  lambda x2, levels, b2: cycle2.ncycle_split(
      levels, s.kinds, x2, b2, s.settings)[0], x20, s.levels, b2)
t("ncycle_split w/ split+merge entry",
  lambda x, levels, b: ps.lane_merge(cycle2.ncycle_split(
      levels, s.kinds, ps.lane_split(x, nxp, W), ps.lane_split(b, nxp, W),
      s.settings)[0], n, n), zero, s.levels, b)
t("dense ncycle L0",
  lambda x, levels, b: cycle2.ncycle(levels, s.kinds, 0, x, b,
                                     s.settings), zero, s.levels, b)
# fmg at L1 for reference, then whole fmg
cb = jnp.zeros(cshape, jnp.float32).at[128, 128].set(1.0)
t("fmg at L1", lambda cb, levels: cycle2.fmg_cycle(
    levels, s.kinds, 1, cb, s.settings), cb, s.levels)
t("fmg at L0 (whole)", lambda b, levels: cycle2.fmg_cycle(
    levels, s.kinds, 0, b, s.settings), b, s.levels)

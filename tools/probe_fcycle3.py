"""Isolate the F-cycle L0-stage inflation: run exactly the L0 work with
the recursion stubbed to zeros, vs the full fmg, vs the V-cycle."""
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
coarse = s.levels[1]
cshape = coarse.so.shape[1:]
nxp, W, _ = ps.split_dims(n, n)

def t(label, f, *args, reps=(4, 16)):
    ms = timed_loop(f, *args, reps=reps)
    print(f"  {label:34}: {ms:7.3f} ms", flush=True)
    return ms

def stage0(b, levels):
    cb = pt.restrict(levels[1].cip, pt.lane_split_res(b), cshape)
    cx = jnp.zeros_like(cb) + cb * 1e-30     # keep the dependency
    x2 = pt.interp_split_nores(levels[1].cip, cx, nxp, W)
    x2, _ = cycle2.ncycle_split(levels, s.kinds, x2,
                                ps.lane_split(b, nxp, W), s.settings)
    return ps.lane_merge(x2, n, n)

t("L0 stage only (stub recursion)", stage0, b, s.levels)

def stage01(b, levels):
    cb = pt.restrict(levels[1].cip, pt.lane_split_res(b), cshape)
    cx = cycle2.fmg_cycle(levels, s.kinds, 1, cb, s.settings)
    x2 = pt.interp_split_nores(levels[1].cip, cx, nxp, W)
    x2, _ = cycle2.ncycle_split(levels, s.kinds, x2,
                                ps.lane_split(b, nxp, W), s.settings)
    return ps.lane_merge(x2, n, n)

t("L0 stage + real recursion", stage01, b, s.levels)
t("fmg L0 (new interp path)", lambda b, levels: cycle2.fmg_cycle(
    levels, s.kinds, 0, b, s.settings), b, s.levels)
t("fmg L1", lambda cb, levels: cycle2.fmg_cycle(
    levels, s.kinds, 1, cb, s.settings),
  jnp.zeros(cshape, jnp.float32).at[128, 128].set(1.0), s.levels)
t("V split resident L0",
  lambda x2, levels, b2: cycle2.ncycle_split(
      levels, s.kinds, x2, b2, s.settings)[0],
  ps.lane_split(jnp.zeros_like(b), nxp, W), s.levels,
  ps.lane_split(b, nxp, W))

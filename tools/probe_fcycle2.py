"""Bisect the F-cycle inflation: time fmg at 4096^2 for hierarchies of
increasing depth (num-levels 2..full).  If cost grows faster than the
geometric sum of level stages, the excess is depth-composition."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax, jax.numpy as jnp
from timing_util import timed_loop
from cedar_tpu import FivePt, Solver2, gallery
from cedar_tpu.config import Config
from cedar_tpu.solver import cycle2

n = 4096
so = gallery.poisson(n, n, dtype=jnp.float32)
b = gallery.poisson_rhs(n, n, dtype=jnp.float32)
for nl in (2, 3, 4, 5, 7, 9, 11):
    s = Solver2(so, FivePt, Config({
        "log": [], "solver": {"num-levels": nl,
                              "cycle": {"type": "f", "nrelax-pre": 1,
                                        "nrelax-post": 1},
                              "max-iter": 2, "tol": 1e-6}}))
    ms = timed_loop(lambda b, levels: cycle2.fmg_cycle(
        levels, s.kinds, 0, b, s.settings), b, s.levels, reps=(4, 12))
    msv = timed_loop(lambda x, levels, b: cycle2.run_cycle(
        levels, s.kinds, x, b, s.settings._replace() if False else s.settings,
        (False, False)), jnp.zeros_like(b), s.levels, b, reps=(4, 12)) \
        if False else 0.0
    print(f"num-levels={nl:2d}: fmg L0 = {ms:7.3f} ms", flush=True)

"""Per-level cost breakdown of the 3D V-cycle (TPU, differenced timing).

Times the cycle entered at level L for each L; level L's own cost =
t(L) - t(L+1)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax.numpy as jnp

from timing_util import timed_loop

from cedar_tpu import SevenPt, Solver3, gallery
from cedar_tpu.config import Config
from cedar_tpu.solver import cycle3


def main(n=256, twenty_seven=False):
    from cedar_tpu.core.types import StencilKind
    kind = (StencilKind.twenty_seven_pt if twenty_seven
            else StencilKind.seven_pt)
    so = (gallery.fe3(n, n, n, dtype=jnp.float32) if twenty_seven
          else gallery.poisson3(n, n, n, dtype=jnp.float32))
    conf = Config({"log": [], "solver": {
        "cycle": {"nrelax-pre": 1, "nrelax-post": 1},
        "max-iter": 2, "tol": 1e-6}})
    s = Solver3(so, kind, conf)
    nlev = len(s.levels)
    print("levels:", [lev.so.shape[1:] for lev in s.levels], flush=True)

    times = {}
    for L in range(nlev - 1):
        tail = s.levels[L:]
        kinds = s.kinds[L:]
        bL = jnp.zeros(tail[0].so.shape[1:], jnp.float32)
        bL = bL.at[tuple(d // 2 for d in bL.shape)].set(1.0)

        def step(x, tail, b, kinds=kinds):
            return cycle3.ncycle(tail, kinds, 0, x, b, s.settings)

        ms = timed_loop(step, jnp.zeros_like(bL), tail, bL)
        times[L] = ms
        print("enter at L%-2d %-16s: %7.3f ms"
              % (L, tail[0].so.shape[1:], ms), flush=True)
    for L in range(nlev - 2):
        print("level %-2d own cost   : %7.3f ms"
              % (L, times[L] - times[L + 1]), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256,
         "27" in sys.argv[2:])

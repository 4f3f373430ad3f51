"""F-cycle cost breakdown at 4096^2 (TPU, differenced timing): fmg
entered at each level, vs the V-cycle entered at the same level, plus
the b-restriction chain alone."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax.numpy as jnp

from timing_util import timed_loop

from cedar_tpu import FivePt, Solver2, gallery
from cedar_tpu.config import Config
from cedar_tpu.solver import cycle2


def main(n=4096):
    so = gallery.poisson(n, n, dtype=jnp.float32)
    b = gallery.poisson_rhs(n, n, dtype=jnp.float32)
    s = Solver2(so, FivePt, Config({
        "log": [], "solver": {"cycle": {"type": "f", "nrelax-pre": 1,
                                        "nrelax-post": 1},
                              "max-iter": 2, "tol": 1e-6}}))
    print("levels:", [lev.so.shape[1:] for lev in s.levels], flush=True)

    shapes = [lev.so.shape[1:] for lev in s.levels]
    for L in range(len(s.levels)):
        bL = jnp.zeros(shapes[L], jnp.float32)
        bL = bL.at[tuple(d // 2 for d in bL.shape)].set(1.0)

        def fmg(bL, levels, L=L):
            return cycle2.fmg_cycle(levels, s.kinds, L, bL, s.settings)

        ms = timed_loop(fmg, bL, s.levels)
        print("fmg  at L%-2d %-14s: %7.3f ms" % (L, shapes[L], ms),
              flush=True)
        if L > 3:
            break

    for L in (0, 1, 2):
        bL = jnp.zeros(shapes[L], jnp.float32)
        bL = bL.at[tuple(d // 2 for d in bL.shape)].set(1.0)

        def vc(x, levels, bL, L=L):
            return cycle2.ncycle(levels, s.kinds, L, x, bL, s.settings)

        ms = timed_loop(vc, jnp.zeros_like(bL), s.levels, bL)
        print("ncycle at L%-2d %-12s: %7.3f ms" % (L, shapes[L], ms),
              flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)

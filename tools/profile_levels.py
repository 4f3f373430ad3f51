"""Per-level cost breakdown of the 2D V-cycle (TPU, differenced timing).

Times the cycle entered at level L for each L (the tail of the hierarchy
below level L), so level L's own cost = t(L) - t(L+1).  Pinpoints where
the coarse-level fixed costs (pallas-call overhead, pad paths on odd
levels) are spent.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax.numpy as jnp

from timing_util import timed_loop

from cedar_tpu import FivePt, Solver2, gallery
from cedar_tpu.config import Config
from cedar_tpu.solver import cycle2


def main(n=4096, backend="pallas"):
    so = gallery.poisson(n, n, dtype=jnp.float32)
    b = gallery.poisson_rhs(n, n, dtype=jnp.float32)
    conf = Config({"log": [], "kernels": {"backend": backend}, "solver": {
        "cycle": {"nrelax-pre": 1, "nrelax-post": 1},
        "max-iter": 2, "tol": 1e-6}})
    s = Solver2(so, FivePt, conf)
    nlev = len(s.levels)
    print("levels:", [lev.so.shape[1:] for lev in s.levels], flush=True)

    times = {}
    for L in range(nlev - 1):
        tail = s.levels[L:]
        kinds = s.kinds[L:]
        bL = jnp.zeros(tail[0].so.shape[1:], jnp.float32)
        bL = bL.at[tuple(d // 2 for d in bL.shape)].set(1.0)

        def step(x, tail, b, kinds=kinds):
            return cycle2.ncycle(tail, kinds, 0, x, b, s.settings)

        ms = timed_loop(step, jnp.zeros_like(bL), tail, bL)
        times[L] = ms
        print("enter at L%-2d %-12s: %7.3f ms" % (L, tail[0].so.shape[1:], ms),
              flush=True)
    for L in range(nlev - 2):
        print("level %-2d own cost   : %7.3f ms" % (L, times[L] - times[L + 1]),
              flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096,
         sys.argv[2] if len(sys.argv) > 2 else "pallas")

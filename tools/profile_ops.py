"""Per-op device-time profiler for the 2D cycle on the current backend.

The axon tunnel acknowledges dispatch before execution finishes, so wall
timing must chain REPS dependent applications inside ONE jitted fori_loop
and force a scalar fetch.  Each op is wrapped so its output feeds the next
iteration's input.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp

from cedar_tpu import FivePt, NinePt, Solver2, gallery
from cedar_tpu.config import Config
from cedar_tpu.ops.interp2 import interp_add, restrict, setup_interp
from cedar_tpu.ops.relax2 import point_relax, setup_recip
from cedar_tpu.ops.stencil2 import residual

REPS = 20


def timed_loop(step, x0, *consts):
    """step(x, *consts) -> array like x; returns ms per application."""

    @jax.jit
    def run(x, *consts):
        def body(i, x):
            return step(x, *consts)

        return jax.lax.fori_loop(0, REPS, body, x)

    o = run(x0, *consts)
    float(jnp.sum(o))  # warm + force
    t0 = time.perf_counter()
    o = run(x0, *consts)
    float(jnp.sum(o))
    return (time.perf_counter() - t0) / REPS * 1e3


def gb(nbytes, ms):
    return nbytes / (ms * 1e-3) / 1e9


def main(n=4096, dtype=jnp.float32):
    so = gallery.poisson(n, n, dtype=dtype)
    b = gallery.poisson_rhs(n, n, dtype=dtype)
    rec = setup_recip(so)
    ci = setup_interp(so, FivePt)
    nc = (n - 1) // 2 + 1
    bpe = jnp.dtype(dtype).itemsize

    ms = timed_loop(
        lambda q, so, b, rec: point_relax(so, q, b, rec, FivePt, "down"),
        jnp.zeros_like(b), so, b, rec,
    )
    traffic = 2 * 6 * n * n * bpe
    print(f"relax5 : {ms:7.3f} ms  {gb(traffic, ms):5.0f} GB/s eff")

    ms = timed_loop(
        lambda q, so, b: residual(so, q, b, FivePt),
        jnp.zeros_like(b), so, b,
    )
    print(f"resid5 : {ms:7.3f} ms  {gb(6 * n * n * bpe, ms):5.0f} GB/s eff")

    # restrict: feed output back via padding to keep the chain dependent
    def step_restrict(q, ci):
        rc = restrict(ci, q)
        return q + jnp.pad(rc, ((0, n - nc), (0, n - nc)))

    ms = timed_loop(step_restrict, b, ci)
    print(f"restrict:{ms:7.3f} ms  {gb((n * n + 3 * nc * nc) * bpe, ms):5.0f}"
          " GB/s eff (incl pad-add)")

    def step_interp(q, ci, so, r):
        qc = q[:nc, :nc]
        return interp_add(ci, so, qc, r, q)

    r = residual(so, jnp.zeros_like(b), b, FivePt)
    ms = timed_loop(step_interp, b, ci, so, r)
    print(f"interp : {ms:7.3f} ms  {gb(4 * n * n * bpe, ms):5.0f} GB/s eff")

    # 9-pt level-1 relax
    conf = Config({"log": [], "solver": {
        "cycle": {"nrelax-pre": 1, "nrelax-post": 1},
        "max-iter": 2, "tol": 1e-6}})
    s = Solver2(so, FivePt, conf)
    so1 = s.levels[1].so
    rec1 = setup_recip(so1)
    b1 = jnp.zeros(so1.shape[1:], dtype)
    ms = timed_loop(
        lambda q, so1, b1, rec1: point_relax(so1, q, b1, rec1, NinePt, "down"),
        jnp.zeros_like(b1), so1, b1, rec1,
    )
    traffic = 4 * 9 * nc * nc * bpe
    print(f"relax9({nc}²): {ms:7.3f} ms  {gb(traffic, ms):5.0f} GB/s eff")

    ms = timed_loop(
        lambda x, levels, b: s._cycle_impl(levels, x, b),
        jnp.zeros_like(b), s.levels, b,
    )
    print(f"V(1,1) cycle: {ms:7.3f} ms   ({n*n/ms/1e3:,.0f} MDOF/s)")


if __name__ == "__main__":
    import sys

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    main(n)

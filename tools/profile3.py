"""Differenced per-op device-time profile for the 3D cycle (TPU).

Operands are fori_loop arguments, never closure constants (which become
HLO literals and blow the remote-compile request limit)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from timing_util import timed_loop

from cedar_tpu import SevenPt, Solver3, gallery
from cedar_tpu.config import Config
from cedar_tpu.core.types import StencilKind
from cedar_tpu.ops.relax3 import point_relax as relax_xla, setup_recip
from cedar_tpu.ops import pallas3
from cedar_tpu.ops.stencil3 import residual
from cedar_tpu.ops.interp3 import interp_add, restrict, setup_interp


def main(n=256, twenty_seven=False):
    kind = (StencilKind.twenty_seven_pt if twenty_seven
            else StencilKind.seven_pt)
    so = (gallery.fe3(n, n, n, dtype=jnp.float32) if twenty_seven
          else gallery.poisson3(n, n, n, dtype=jnp.float32))
    b = gallery.poisson3_rhs(n, n, n, dtype=jnp.float32)
    rec = setup_recip(so)
    ci = setup_interp(so, kind)
    nc = (n - 1) // 2 + 1
    z = jnp.zeros_like(b)
    cells = n ** 3

    ms = timed_loop(
        lambda q, so, b, rec: relax_xla(so, q, b, rec, kind, "down"),
        z, so, b, rec)
    print("relax XLA    : %7.3f ms" % ms, flush=True)

    if not twenty_seven:
        ms = timed_loop(
            lambda q, so, b: pallas3.point_relax(so, q, b, None, "down"),
            z, so, b)
        print("relax pallas : %7.3f ms (%5.0f GB/s eff)"
              % (ms, 9 * cells * 4 / ms / 1e6), flush=True)
        ms = timed_loop(
            lambda q, so, b: pallas3.point_relax(
                so, q, b, None, "down", fuse_residual=True)[0],
            z, so, b)
        print("relax pal+res: %7.3f ms" % ms, flush=True)

    ms = timed_loop(lambda q, so, b: residual(so, q, b, kind), z, so, b)
    print("residual XLA : %7.3f ms" % ms, flush=True)

    def step_restrict(q, ci):
        rc = restrict(ci, q)
        return q + jnp.pad(
            rc, ((0, n - nc), (0, n - nc), (0, n - nc)))

    ms = timed_loop(step_restrict, b, ci)
    print("restrict     : %7.3f ms (incl pad-add)" % ms, flush=True)

    r = residual(so, z, b, kind)

    def step_interp(q, ci, so, r):
        return interp_add(ci, so, q[:nc, :nc, :nc], r, q)

    ms = timed_loop(step_interp, b, ci, so, r)
    print("interp_add   : %7.3f ms" % ms, flush=True)

    conf = Config({"log": [], "solver": {
        "cycle": {"nrelax-pre": 1, "nrelax-post": 1},
        "max-iter": 2, "tol": 1e-6}})
    s = Solver3(so, kind, conf)
    ms = timed_loop(
        lambda x, levels, b: s._cycle_impl(levels, x, b), z, s.levels, b)
    print("V(1,1)       : %7.3f ms  (%.0f MDOF/s)"
          % (ms, cells / ms / 1e3), flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    t7 = len(sys.argv) > 2 and sys.argv[2] == "27"
    main(n, t7)

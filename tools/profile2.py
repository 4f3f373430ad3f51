"""Differenced per-op device-time profile for the 2D cycle (TPU).

All operands are passed as fori_loop-invariant ARGUMENTS (never closure
constants: those are baked into the HLO and blow the remote-compile request
limit)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from timing_util import timed_loop

from cedar_tpu import FivePt, Solver2, gallery
from cedar_tpu.config import Config
from cedar_tpu.ops.relax2 import point_relax as relax_xla, setup_recip
from cedar_tpu.ops import pallas2
from cedar_tpu.ops.stencil2 import residual
from cedar_tpu.ops.interp2 import interp_add, restrict, setup_interp


def main(n=4096):
    so = gallery.poisson(n, n, dtype=jnp.float32)
    b = gallery.poisson_rhs(n, n, dtype=jnp.float32)
    rec = setup_recip(so)
    ci = setup_interp(so, FivePt)
    nc = (n - 1) // 2 + 1
    z = jnp.zeros_like(b)

    ms = timed_loop(
        lambda q, so, b, rec: relax_xla(so, q, b, rec, FivePt, "down"),
        z, so, b, rec)
    print("relax5 XLA    : %7.3f ms" % ms, flush=True)

    ms = timed_loop(
        lambda q, so, b: pallas2.point_relax(so, q, b, None, FivePt, "down"),
        z, so, b)
    print("relax5 pallas : %7.3f ms" % ms, flush=True)

    ms = timed_loop(
        lambda q, so, b: pallas2.point_relax(
            so, q, b, None, FivePt, "down", fuse_residual=True)[0],
        z, so, b)
    print("relax5 pal+res: %7.3f ms" % ms, flush=True)

    ms = timed_loop(
        lambda q, so, b: residual(so, q, b, FivePt), z, so, b)
    print("resid5 XLA    : %7.3f ms" % ms, flush=True)

    def step_restrict(q, ci):
        rc = restrict(ci, q)
        return q + jnp.pad(rc, ((0, n - nc), (0, n - nc)))

    ms = timed_loop(step_restrict, b, ci)
    print("restrict      : %7.3f ms (incl pad-add)" % ms, flush=True)

    r = residual(so, z, b, FivePt)

    def step_interp(q, ci, so, r):
        return interp_add(ci, so, q[:nc, :nc], r, q)

    ms = timed_loop(step_interp, b, ci, so, r)
    print("interp_add    : %7.3f ms" % ms, flush=True)

    conf = Config({"log": [], "solver": {
        "cycle": {"nrelax-pre": 1, "nrelax-post": 1},
        "max-iter": 2, "tol": 1e-6}})
    s = Solver2(so, FivePt, conf)
    ms = timed_loop(
        lambda x, levels, b: s._cycle_impl(levels, x, b), z, s.levels, b)
    print("V(1,1) pallas : %7.3f ms  (%.2f GDOF/s)"
          % (ms, n * n / ms / 1e6), flush=True)

    conf2 = Config({"log": [], "kernels": {"backend": "xla"}, "solver": {
        "cycle": {"nrelax-pre": 1, "nrelax-post": 1},
        "max-iter": 2, "tol": 1e-6}})
    s2 = Solver2(so, FivePt, conf2)
    ms = timed_loop(
        lambda x, levels, b: s2._cycle_impl(levels, x, b), z, s2.levels, b)
    print("V(1,1) XLA    : %7.3f ms  (%.2f GDOF/s)"
          % (ms, n * n / ms / 1e6), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)

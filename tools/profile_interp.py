"""Micro-profile of the hybrid 2D transfer kernels' pieces (TPU).

Splits pt.interp_add into its Pallas part-emission and XLA lane/row-merge
passes, and pt.restrict into lane-split + kernel, to see where the gap to
the traffic floors sits."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax.numpy as jnp

from timing_util import timed_loop

from cedar_tpu import FivePt, gallery
from cedar_tpu.core.parity import interleave2
from cedar_tpu.ops import pallas_transfer2 as pt
from cedar_tpu.ops.interp2 import setup_interp
from cedar_tpu.ops.pallas2 import point_relax
from cedar_tpu.ops.stencil2 import residual


def main(n=4096):
    so = gallery.poisson(n, n, dtype=jnp.float32)
    b = gallery.poisson_rhs(n, n, dtype=jnp.float32)
    ci = setup_interp(so, FivePt)
    nc = (n - 1) // 2 + 1
    cip = pt.pad_ci(ci, n, n)
    rec2 = pt.setup_rec2(so)
    res = residual(so, jnp.zeros_like(b), b, FivePt)
    res2 = pt.lane_split_res(res)
    qc = jnp.zeros((nc, nc), jnp.float32)

    # Carry-chaining pattern: ops whose output shape differs from the
    # input feed ONE element of the output back into the carry (a
    # scalar dynamic-update-slice) — chains the loop without an extra
    # full pass, and the changing carry defeats loop-invariant hoisting.
    def k_split(r):
        s = pt.lane_split_res(r)
        return r.at[0, 0].add((s[0, 0, 0] + s[1, 0, 0]) * 1e-30)

    ms = timed_loop(k_split, res)
    print("lane_split_res   : %7.3f ms" % ms, flush=True)

    def k_interp(r2, cip, rec2, qc):
        p = pt._interp_call(cip, rec2, qc, r2)
        return r2.at[0, 0, 0].add(p[0, 0, 0] * 1e-30)

    ms = timed_loop(k_interp, res2, cip, rec2, qc)
    print("interp kernel    : %7.3f ms" % ms, flush=True)

    parts = pt._interp_call(cip, rec2, qc, res2)

    def k_merge(p, q):
        W = p.shape[2]
        merged = interleave2(
            {(0, 0): p[0], (0, 1): p[1], (1, 0): p[2], (1, 1): p[3]},
            2 * p.shape[1], 2 * W,
        )
        return q + merged[:n, :n]

    ms = timed_loop(lambda q, p: k_merge(p, q), b, parts)
    print("interp merge+add : %7.3f ms" % ms, flush=True)

    ms = timed_loop(lambda q, cip, rec2, qc, r2: pt.interp_add(
        cip, rec2, qc, r2, q), b, cip, rec2, qc, res2)
    print("interp_add total : %7.3f ms" % ms, flush=True)

    def k_restrict(r2, cip):
        out = pt.restrict(cip, r2, (nc, nc))
        return r2.at[0, 0, 0].add(out[0, 0] * 1e-30)

    ms = timed_loop(k_restrict, res2, cip)
    print("pt.restrict      : %7.3f ms" % ms, flush=True)

    ms = timed_loop(
        lambda q, so, b: point_relax(so, q, b, None, FivePt, "down",
                                     fuse_residual=True)[0],
        jnp.zeros_like(b), so, b)
    print("sweep+res fused  : %7.3f ms" % ms, flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)

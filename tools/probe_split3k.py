"""TPU micro-bench: octant-split 3D kernels vs the dense Pallas sweeps.

Usage: probe_split3k.py [n] [27]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax.numpy as jnp

from timing_util import timed_loop
from cedar_tpu import gallery
from cedar_tpu.core.types import StencilKind
from cedar_tpu.ops import pallas3, pallas3_split as p3s
from cedar_tpu.ops.interp3 import setup_interp
from cedar_tpu.ops.relax3 import setup_recip


def main(n=128, twenty_seven=True):
    kind = (StencilKind.twenty_seven_pt if twenty_seven
            else StencilKind.seven_pt)
    so = (gallery.fe3(n, n, n, dtype=jnp.float32) if twenty_seven
          else gallery.poisson3(n, n, n, dtype=jnp.float32))
    b = gallery.poisson3_rhs(n, n, n, dtype=jnp.float32)
    recip = setup_recip(so)
    q0 = jnp.zeros_like(b)

    dims = p3s.split_dims3(n, n, n)
    nxp, ny2, nz2, kp = dims
    print("dims:", dims, "supported:", p3s.supported((n, n, n),
                                                     jnp.float32, kind))
    print("plans:", {w: p3s._plan_split(kind, kp, w, nxp)
                     for w in ("sweep", "sweep_restrict", "interp_sweep")},
          flush=True)
    so4 = p3s.split_so4(so, kind, dims)
    b4 = p3s.split4(b, dims)
    q40 = p3s.split4(q0, dims)
    ci = setup_interp(so, kind)
    nc = tuple((d - 1) // 2 + 1 for d in (n, n, n))
    pw4 = p3s.setup_pw4(ci, (n, n, n), kind)
    cx = jnp.zeros(nc, jnp.float32)

    GB = n * n * n * 4 / 1e9

    def rep(name, ms, streams):
        eff = streams * GB / (ms / 1e3) if ms > 0 else 0
        print(f"{name:24}: {ms:7.3f} ms  ({eff:6.1f} GB/s eff "
              f"@ {streams} streams)", flush=True)

    nd = 14 if twenty_seven else 4

    def dense(q, so, b):
        return pallas3.point_relax(so, q, b, recip, "down", kind=kind)
    ms = timed_loop(dense, q0, so, b)
    rep("dense sweep", ms, nd + 3)

    def spl(q4, so4, b4):
        return p3s.point_relax_split3(so4, q4, b4, kind, "down", nz2=nz2)
    ms = timed_loop(spl, q40, so4, b4)
    rep("split sweep", ms, nd + 3)

    def spl_norm(q4, so4, b4):
        q, _ = p3s.point_relax_split3(so4, q4, b4, kind, "down",
                                      fuse_norm=True, nz2=nz2)
        return q
    ms = timed_loop(spl_norm, q40, so4, b4)
    rep("split sweep+norm", ms, nd + 3)

    def swre(q4, so4, b4, pw4):
        q, _, cb = p3s.sweep_restrict_split3(so4, q4, b4, pw4, kind,
                                             "down", nc, emit_res=False,
                                             nz2=nz2)
        return q
    ms = timed_loop(swre, q40, so4, b4, pw4)
    rep("split sweep+restrict", ms, nd + 3 + 26 // 8)

    fused = p3s.interp_fused_ok(kind, kp, nxp)
    print("interp fused:", fused, flush=True)
    res4 = None if fused else p3s.split4(b, dims)

    def isw(q4, so4, b4, pw4, cx):
        return p3s.interp_sweep_split3(pw4, cx, so4, b4, q4, kind, "down",
                                       nz2=nz2, res4=res4)
    ms = timed_loop(isw, q40, so4, b4, pw4, cx)
    rep("split interp+sweep", ms, nd + 3 + 27 // 8)

    def iswn(q4, so4, b4, pw4, cx):
        q, _ = p3s.interp_sweep_split3(pw4, cx, so4, b4, q4, kind, "down",
                                       fuse_norm=True, nz2=nz2, res4=res4)
        return q
    ms = timed_loop(iswn, q40, so4, b4, pw4, cx)
    rep("split interp+sweep+nrm", ms, nd + 3 + 27 // 8)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128,
         "27" in sys.argv[2:])

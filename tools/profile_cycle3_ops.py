"""Per-op breakdown of the 3D split-resident cycle on hardware.

Times each fused pass of ncycle_split at the top level, the coarse-level
tail, and the whole cycle, for 7-pt and 27-pt at the bench sizes.

Usage: profile_cycle3_ops.py [n] [27]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from timing_util import timed_loop

from cedar_tpu import SevenPt, TwentySevenPt, Solver3, gallery
from cedar_tpu.config import Config
from cedar_tpu.core.types import StencilKind
from cedar_tpu.ops import pallas3_split as p3s
from cedar_tpu.ops import pallas3_stream as p3st
from cedar_tpu.solver import cycle3


def main(n=128, twenty_seven=True):
    kind = (StencilKind.twenty_seven_pt if twenty_seven
            else StencilKind.seven_pt)
    so = (gallery.fe3(n, n, n, dtype=jnp.float32) if twenty_seven
          else gallery.poisson3(n, n, n, dtype=jnp.float32))
    b = gallery.poisson3_rhs(n, n, n, dtype=jnp.float32)
    s = Solver3(so, kind, Config({
        "log": [], "solver": {"cycle": {"nrelax-pre": 1, "nrelax-post": 1},
                              "max-iter": 2, "tol": 1e-6}}))
    lev, coarse = s.levels[0], s.levels[1]
    if lev.so2 is None or coarse.pw4 is None:
        print("split workspaces missing at L0 — split path off at", n)
        return
    dims = p3s.split_dims3(n, n, n)
    nxp, ny2, nz2, kp = dims
    b4 = p3s.split4(b, dims)
    q4 = p3s.split4(jnp.zeros_like(b), dims)
    cshape = coarse.so.shape[1:]
    print(f"n={n} kind={kind.name} dims={dims} "
          f"stream={p3st.stream_supported(b4.shape, kind, nz2)} "
          f"plan={p3st._plan_stream(kind, nxp, ny2, nz2)}", flush=True)

    def t(label, f, *args):
        ms = timed_loop(f, *args)
        print(f"  {label:34}: {ms:7.3f} ms", flush=True)
        return ms

    halo_ok = p3s._plan_split(kind, kp, "sweep", nxp) is not None
    if halo_ok:
        # plain sweep, halo-window two-pass kernels
        t("split sweep", lambda q4, so2, b4: p3s.point_relax_split3(
            so2, q4, b4, kind, "down", nz2=nz2), q4, lev.so2, b4)
        t("split sweep + res", lambda q4, so2, b4: p3s.point_relax_split3(
            so2, q4, b4, kind, "down", fuse_residual=True, nz2=nz2)[0],
          q4, lev.so2, b4)
        t("split sweep + norm", lambda q4, so2, b4: p3s.point_relax_split3(
            so2, q4, b4, kind, "down", fuse_norm=True, nz2=nz2)[0],
          q4, lev.so2, b4)

        # fused sweep+res+restrict
        t("sweep_restrict (fused plan)",
          lambda q4, so2, b4, pw4: p3s.sweep_restrict_split3(
              so2, q4, b4, pw4, kind, "down", cshape, nz2=nz2)[0],
          q4, lev.so2, b4, coarse.pw4)

    # streaming wavefront sweeps
    t("stream sweep", lambda q4, so2, b4: p3st.point_relax_stream3(
        so2, q4, b4, kind, "down", nz2=nz2), q4, lev.so2, b4)
    t("stream sweep + res", lambda q4, so2, b4: p3st.point_relax_stream3(
        so2, q4, b4, kind, "down", fuse_residual=True, nz2=nz2)[0],
      q4, lev.so2, b4)
    t("stream sweep + norm", lambda q4, so2, b4: p3st.point_relax_stream3(
        so2, q4, b4, kind, "down", fuse_norm=True, nz2=nz2)[0],
      q4, lev.so2, b4)

    # standalone restriction of an emitted residual (timed via a scalar
    # dependency injected into the carried array — the loop carry must
    # keep its shape)
    res4 = p3st.point_relax_stream3(lev.so2, q4, b4, kind, "down",
                                    fuse_residual=True, nz2=nz2)[1]
    rplan = p3s._restrict_plan(nxp, kp, nz2)
    iplan = p3s._interp_plan(nxp, kp, nz2)
    print(f"  restrict plan={rplan} interp plan={iplan}", flush=True)

    def chain_restrict(res4, pw4):
        cbf = p3s._restrict_call3(pw4, res4, nz2, rplan)
        return res4.at[0, 0, 0].add(cbf[0, 0] * 1e-30)

    t("standalone restrict", chain_restrict, res4, coarse.pw4)

    # pointwise interp (emitted residual) alone
    cx = jnp.zeros(cshape, jnp.float32)
    rows = nxp // 2 + 2 * 16
    nxc, nyc, nzc = cshape
    cxp = jnp.pad(cx, ((0, rows - nxc), (0, ny2 - nyc), (0, nz2 - nzc)))
    cxp = cxp.reshape(rows, kp)
    diag4 = lev.so2[0]
    t("pointwise interp",
      lambda q4, cxp, res4, pw4, diag4: p3s._interp_call3(
          pw4, cxp, diag4, res4, q4, nz2, iplan),
      q4, cxp, res4, coarse.pw4, diag4)

    # interp + sweep (+ norm), as the cycle runs it
    if halo_ok:
        t("interp_sweep (+norm)",
          lambda q4, cx, b4, res4, pw4, so2: p3s.interp_sweep_split3(
              pw4, cx, so2, b4, q4, kind, "down",
              fuse_norm=True, nz2=nz2, res4=res4)[0],
          q4, cx, b4, res4, coarse.pw4, lev.so2)
    t("interp_sweep stream (+norm)",
      lambda q4, cx, b4, res4, pw4, so2: p3st.interp_sweep_stream3(
          pw4, cx, so2, b4, q4, kind, "down", res4,
          fuse_norm=True, nz2=nz2)[0],
      q4, cx, b4, res4, coarse.pw4, lev.so2)

    # whole split cycle and the coarse tail
    t("ncycle_split (L0)",
      lambda x4, levels, b4: cycle3.ncycle_split(
          levels, s.kinds, x4, b4, s.settings)[0],
      q4, s.levels, b4)
    cb = jnp.zeros(cshape, jnp.float32).at[
        tuple(d // 2 for d in cshape)].set(1.0)
    t("ncycle tail (L1 down)",
      lambda x, levels, cb: cycle3.ncycle(levels, s.kinds, 1, x, cb,
                                          s.settings),
      jnp.zeros_like(cb), s.levels, cb)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128,
         "27" in sys.argv[2:])

"""Hardware compile/VMEM probe for pallas3_split at 128^3 27-pt.

Tries each kernel at candidate (H, T) plans and reports compile success
and differenced timing — calibrates _plan_split's budget model.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax.numpy as jnp

from timing_util import timed_loop
from cedar_tpu import gallery
from cedar_tpu.core.types import StencilKind
from cedar_tpu.ops import pallas3_split as p3s
from cedar_tpu.ops.interp3 import setup_interp


def main(n=128, twenty_seven=True):
    kind = (StencilKind.twenty_seven_pt if twenty_seven
            else StencilKind.seven_pt)
    so = (gallery.fe3(n, n, n, dtype=jnp.float32) if twenty_seven
          else gallery.poisson3(n, n, n, dtype=jnp.float32))
    b = gallery.poisson3_rhs(n, n, n, dtype=jnp.float32)
    dims = p3s.split_dims3(n, n, n)
    nxp, ny2, nz2, kp = dims
    so4 = p3s.split_so4(so, kind, dims)
    b4 = p3s.split4(b, dims)
    q40 = p3s.split4(jnp.zeros_like(b), dims)
    ci = setup_interp(so, kind)
    nc = tuple((d - 1) // 2 + 1 for d in (n, n, n))
    pw4 = p3s.setup_pw4(ci, (n, n, n), kind)
    cx = jnp.zeros(nc, jnp.float32)
    nph = 2 if kind == StencilKind.seven_pt else 8
    GB = n * n * n * 4 / 1e9
    nd = 14 if twenty_seven else 4

    def attempt(name, fn, streams):
        try:
            ms = timed_loop(fn, q40, so4, b4)
            eff = streams * GB / (ms / 1e3)
            print(f"{name:34}: {ms:7.3f} ms ({eff:6.1f} GB/s eff)",
                  flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:110]
            print(f"{name:34}: FAIL {msg}", flush=True)

    cands = [(16, 32), (8, 32), (16, 64), (8, 16), (8, 64)]
    for H, T in cands:
        if T % H or nxp % T or (T // 2) % 8:
            continue
        if H == 16 and T % 32:
            continue
        depth_ok_1p = H >= nph + 2
        if depth_ok_1p:
            def one(q4, so4, b4, H=H, T=T):
                q, _, cb = p3s._sweep_restrict_call3(
                    so4, q4, b4, pw4, kind, "down", nz2, 0, nph, H, T,
                    False)
                return q
            attempt(f"swre 1-pass H={H} T={T}", one, nd + 6)
        if H >= nph // 2 + 2 and nph > 2:
            def two(q4, so4, b4, H=H, T=T):
                q = p3s._sweep_call3(so4, q4, b4, kind, "down", nz2, 0,
                                     nph // 2, H, T, False, False)
                q, _, cb = p3s._sweep_restrict_call3(
                    so4, q, b4, pw4, kind, "down", nz2, nph // 2, nph, H,
                    T, False)
                return q
            attempt(f"swre 2-pass H={H} T={T}", two, nd + 6)
        if depth_ok_1p:
            def isw1(q4, so4, b4, H=H, T=T):
                return p3s._interp_sweep_call3(
                    pw4, jnp.zeros((nxp // 2 + 32, kp), jnp.float32),
                    so4, q4, b4, kind, "down", nz2, 0, nph, H, T, False,
                    False)
            attempt(f"interp+sweep 1-pass H={H} T={T}", isw1, nd + 7)
        if H >= nph // 2 + 2 and nph > 2:
            def isw2(q4, so4, b4, H=H, T=T):
                q = p3s._interp_sweep_call3(
                    pw4, jnp.zeros((nxp // 2 + 32, kp), jnp.float32),
                    so4, q4, b4, kind, "down", nz2, 0, nph // 2, H, T,
                    False, False)
                return p3s._sweep_call3(so4, q, b4, kind, "down", nz2,
                                        nph // 2, nph, H, T, False, False)
            attempt(f"interp+sweep 2-pass H={H} T={T}", isw2, nd + 7)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128,
         "7" not in sys.argv[2:])

"""Per-op device-time profile of the 2D zebra line-relax path (TPU).

Breaks one line-x sweep at n^2 into its stages (rhs eval, lane-parity
extract, SPIKE solve, row writeback) plus the full sweep, the line-y
sweep (transposed path), and the whole V(1,1) line-x / line-xy cycles.
Differenced timing (tools/timing_util.py).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax.numpy as jnp

from timing_util import timed_loop

from cedar_tpu import FivePt, Solver2, gallery
from cedar_tpu.config import Config
from cedar_tpu.ops import lines2
from cedar_tpu.core.types import StencilKind


def main(n=2048):
    so = gallery.diag_diffusion(n, n, 1.0, 0.001, dtype=jnp.float32)
    b = gallery.poisson_rhs(n, n, dtype=jnp.float32)
    z = jnp.zeros_like(b)
    kind = FivePt
    spk = lines2.setup_lines_spike(so, kind, "x")
    spk_y = lines2.setup_lines_spike(so, kind, "y")
    sor = lines2.setup_lines(so, kind, "x")

    ms = timed_loop(
        lambda q, so, b: lines2._line_rhs_x(so, q, b, kind, (False, False)),
        z, so, b)
    print("rhs eval (full grid)   : %7.3f ms" % ms, flush=True)

    ms = timed_loop(
        lambda q: lines2._set_rows(q, lines2._cols(q, 0), 0), z)
    print("cols + set_rows pair   : %7.3f ms" % ms, flush=True)

    rhs0 = lines2._cols(b, 0)

    ms = timed_loop(lambda r, f: lines2._spike_solve(f, r), rhs0, spk.even)
    print("spike solve (1 color)  : %7.3f ms" % ms, flush=True)

    ms = timed_loop(
        lambda r, lo, dg, up: lines2._pcr_solve(lo, dg, up, r),
        rhs0, lines2._cols(-so[1], 0), lines2._cols(so[0], 0),
        lines2._cols(lines2._shift0(-so[1], 1, 0.0), 0))
    print("pcr solve (1 color)    : %7.3f ms" % ms, flush=True)

    ms = timed_loop(
        lambda q, so, b, f: lines2.line_relax_x(so, q, b, f, kind, "down"),
        z, so, b, spk)
    print("line_relax_x sweep     : %7.3f ms" % ms, flush=True)

    ms = timed_loop(
        lambda q, so, b, f: lines2.line_relax_y(so, q, b, f, kind, "down"),
        z, so, b, spk_y)
    print("line_relax_y sweep     : %7.3f ms" % ms, flush=True)

    from cedar_tpu.ops import pallas_lines2 as pla

    ms = timed_loop(
        lambda q, so, b: pla.line_relax_x(so, q, b, kind, "down"),
        z, so, b)
    print("fused pallas x sweep   : %7.3f ms" % ms, flush=True)

    ms = timed_loop(
        lambda q, so, b: pla.line_relax_y(so, q, b, kind, "down"),
        z, so, b)
    print("fused pallas y sweep   : %7.3f ms" % ms, flush=True)

    for relax in ("line-x", "line-xy"):
        for backend in ("xla", "pallas"):
            conf = Config({"log": [], "kernels": {"backend": backend},
                           "solver": {
                "relaxation": relax,
                "cycle": {"nrelax-pre": 1, "nrelax-post": 1},
                "max-iter": 2, "tol": 1e-6}})
            s = Solver2(so, kind, conf)

            ms = timed_loop(
                lambda x, levels, b: s._cycle_impl(levels, x, b),
                z, s.levels, b)
            print("V(1,1) %-8s %-6s : %7.3f ms  (%.0f MDOF/s)"
                  % (relax, backend, ms, n * n / ms / 1e3), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2048)

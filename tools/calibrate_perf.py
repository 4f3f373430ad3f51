"""Calibrate the analytic cycle-time model against measured cycles.

Runs the single-chip bench configs, measures per-cycle time (differenced),
and compares with cedar_tpu.perf.cycle_time — the grounding the A*
agglomeration search stands on (VERDICT r1: "the A* schedule is 'optimal'
against an uncalibrated model").  Pass/fail bar: within 2x.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax.numpy as jnp

from timing_util import timed_loop

from cedar_tpu import Solver2, Solver3, FivePt, SevenPt, gallery
from cedar_tpu.config import Config
from cedar_tpu.perf import MachineParams, cycle_time


def measure_2d(n=4096):
    so = gallery.poisson(n, n, dtype=jnp.float32)
    b = gallery.poisson_rhs(n, n, dtype=jnp.float32)
    conf = Config({"log": [], "solver": {
        "cycle": {"nrelax-pre": 1, "nrelax-post": 1},
        "max-iter": 2, "tol": 1e-6}})
    s = Solver2(so, FivePt, conf)
    ms = timed_loop(lambda x, lv, b: s._cycle_impl(lv, x, b),
                    jnp.zeros_like(b), s.levels, b, reps=(10, 50))
    return s.shapes, ms


def measure_3d(n=256):
    so = gallery.poisson3(n, n, n, dtype=jnp.float32)
    b = gallery.poisson3_rhs(n, n, n, dtype=jnp.float32)
    conf = Config({"log": [], "solver": {
        "cycle": {"nrelax-pre": 1, "nrelax-post": 1},
        "max-iter": 2, "tol": 1e-6}})
    s = Solver3(so, SevenPt, conf)
    ms = timed_loop(lambda x, lv, b: s._cycle_impl(lv, x, b),
                    jnp.zeros_like(b), s.levels, b, reps=(5, 20))
    return s.shapes, ms


def main():
    # measured single-chip machine terms (tools/probe_bw.py, NOTES.md):
    # achievable copy bandwidth ~650 GB/s; ~5 us per launched op through
    # the runtime; MXU f32 ~50 TFLOP/s
    m = MachineParams(hbm_bw=650e9, flop_rate=5e13, op_overhead=5e-6)
    for name, (shapes, meas), sf, sc, nsw in (
        ("2d-poisson-4096", measure_2d(), 5, 9, 2),
        ("3d-poisson-256", measure_3d(), 7, 27, 2),
    ):
        mesh = (1,) * len(shapes[0])
        masks = [0] * len(shapes)
        pred = cycle_time(shapes, mesh, masks, m, stencil_fine=sf,
                          stencil_coarse=sc, nsweeps=nsw) * 1e3
        ratio = meas / pred
        verdict = "OK (within 2x)" if 0.5 <= ratio <= 2.0 else "MISCALIBRATED"
        print(f"{name}: measured {meas:7.3f} ms, predicted {pred:7.3f} ms, "
              f"ratio {ratio:.2f} — {verdict}", flush=True)


if __name__ == "__main__":
    main()

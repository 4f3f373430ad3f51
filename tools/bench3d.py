"""3D-only slice of bench_all (configs 4 and 5), with stage marks —
used to localize slow compiles / tunnel stalls."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from timing_util import timed_loop

from cedar_tpu import SevenPt, TwentySevenPt, gallery
from cedar_tpu import Solver3
from cedar_tpu.config import Config


def mark(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def time_cycles(solver, b, reps=(8, 40)):
    ms = timed_loop(
        lambda x, levels, b: solver._cycle_impl(levels, x, b),
        jnp.zeros_like(b), solver.levels, b, reps=reps,
    )
    return ms * 1e-3


def time_cycles3(s, b):
    from cedar_tpu.solver import cycle3

    if cycle3.fine_split_ok(s.levels, s.settings, s.constraints):
        from cedar_tpu.ops import pallas3_split as p3s

        dims = p3s.split_dims3(*b.shape)
        b4 = p3s.split4(b, dims)
        x40 = p3s.split4(jnp.zeros_like(b), dims)
        ms = timed_loop(
            lambda x4, levels, b4: cycle3.ncycle_split(
                levels, s.kinds, x4, b4, s.settings)[0],
            x40, s.levels, b4, reps=(8, 40),
        )
        return ms * 1e-3
    return time_cycles(s, b)


def report(name, n_points, dt, extra=None):
    print(json.dumps({
        "metric": name,
        "value": round(n_points / dt, 1),
        "unit": "DOF/s",
        "cycle_ms": round(dt * 1e3, 3),
        **(extra or {}),
    }), flush=True)


def main(which=("7pt", "plane", "27pt")):
    f32 = jnp.float32

    if "7pt" in which:
        n = 256
        mark(f"config 4a: 3D Poisson 7-pt {n}^3 setup...")
        so = gallery.poisson3(n, n, n, dtype=f32)
        b = gallery.poisson3_rhs(n, n, n, dtype=f32)
        s = Solver3(so, SevenPt, Config({
            "log": [], "solver": {"cycle": {"nrelax-pre": 1,
                                            "nrelax-post": 1},
                                  "max-iter": 4, "tol": 1e-6}}))
        mark("setup done; timing...")
        report("3d_poisson_7pt", n ** 3, time_cycles3(s, b),
               {"grid": [n] * 3})

    if "plane" in which:
        n = 128
        mark(f"config 4b: 3D aniso plane-xy {n}^3 setup...")
        so = gallery.diag_diffusion3(n, n, n, 1.0, 1.0, 1e-3, dtype=f32)
        b = gallery.poisson3_rhs(n, n, n, dtype=f32)
        s = Solver3(so, SevenPt, Config({
            "log": [], "solver": {"relaxation": "plane-xy",
                                  "cycle": {"nrelax-pre": 1,
                                            "nrelax-post": 1},
                                  "max-iter": 4, "tol": 1e-6}}))
        mark("setup done; timing...")
        report("3d_aniso_planexy", n ** 3, time_cycles(s, b),
               {"grid": [n] * 3})

    if "27pt" in which:
        n = 128
        mark(f"config 5: 3D fe 27-pt {n}^3 setup...")
        so = gallery.fe3(n, n, n, dtype=f32)
        b = gallery.poisson3_rhs(n, n, n, dtype=f32)
        s = Solver3(so, TwentySevenPt, Config({
            "log": [], "solver": {"cycle": {"nrelax-pre": 1,
                                            "nrelax-post": 1},
                                  "max-iter": 4, "tol": 1e-6}}))
        mark("setup done; timing...")
        report("3d_fe_27pt", n ** 3, time_cycles3(s, b), {"grid": [n] * 3})
    mark("done")


if __name__ == "__main__":
    main(tuple(sys.argv[1:]) or ("7pt", "plane", "27pt"))

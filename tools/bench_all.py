"""Full benchmark sweep over the BASELINE.json configs.

Prints one JSON line per config (bench.py remains the single-line headline
driver).  Configs:

 1. 2D Poisson 5-pt, single chip             (reference: ser-poisson-2d)
 2. 2D anisotropic 9-pt with line relaxation
 3. 2D Poisson sharded over the device mesh (halo exchange via SPMD)
 4. 3D Poisson 7-pt (point and plane relaxation)
 5. 3D 27-pt (fe) with coarse-grid agglomeration on the mesh

Timing: chained cycles inside one jitted fori_loop, measured at TWO rep
counts with the per-cycle time taken from the differenced slope (the
remote runtime acks dispatch early AND has a ~28 ms fixed per-call cost —
see tools/timing_util.py).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from timing_util import timed_loop

from cedar_tpu import FivePt, NinePt, SevenPt, TwentySevenPt, gallery
from cedar_tpu import Solver2, Solver3
from cedar_tpu.config import Config


def time_cycles(solver, b, reps=(8, 40)):
    ms = timed_loop(
        lambda x, levels, b: solver._cycle_impl(levels, x, b),
        jnp.zeros_like(b), solver.levels, b, reps=reps,
    )
    return ms * 1e-3


def report(name, n_points, dt, extra=None):
    print(json.dumps({
        "metric": name,
        "value": round(n_points / dt, 1),
        "unit": "DOF/s",
        "cycle_ms": round(dt * 1e3, 3),
        **(extra or {}),
    }), flush=True)


def main():
    f32 = jnp.float32

    # 1. 2D Poisson 5pt
    n = 4096
    so = gallery.poisson(n, n, dtype=f32)
    b = gallery.poisson_rhs(n, n, dtype=f32)
    s = Solver2(so, FivePt, Config({
        "log": [], "solver": {"cycle": {"nrelax-pre": 1, "nrelax-post": 1},
                              "max-iter": 4, "tol": 1e-6}}))
    from cedar_tpu.solver import cycle2

    if cycle2.fine_split_ok(s.levels, s.settings, s.constraints):
        # the solve loop keeps the fine level lane-parity-split across
        # iterations; chain bench cycles the same way (as bench.py does)
        from cedar_tpu.ops import pallas2_split as ps

        nxp, W, _ = ps.split_dims(n, n)
        b2 = ps.lane_split(b, nxp, W)
        x20 = ps.lane_split(jnp.zeros_like(b), nxp, W)
        ms = timed_loop(
            lambda x2, levels, b2: cycle2.ncycle_split(
                levels, s.kinds, x2, b2, s.settings)[0],
            x20, s.levels, b2, reps=(8, 40),
        )
        dt = ms * 1e-3
    else:
        dt = time_cycles(s, b)
    report("2d_poisson_5pt", n * n, dt, {"grid": [n, n]})

    # 2. 2D anisotropic 9pt, line relaxation
    n = 2048
    so = gallery.fe(n, n, dtype=f32)
    b = gallery.poisson_rhs(n, n, dtype=f32)
    s = Solver2(so, NinePt, Config({
        "log": [], "solver": {"relaxation": "line-xy",
                              "cycle": {"nrelax-pre": 1, "nrelax-post": 1},
                              "max-iter": 4, "tol": 1e-6}}))
    report("2d_fe_9pt_linexy", n * n, time_cycles(s, b), {"grid": [n, n]})

    n = 2048
    so = gallery.diag_diffusion(n, n, 1.0, 1e-3, dtype=f32)
    b = gallery.poisson_rhs(n, n, dtype=f32)
    s = Solver2(so, FivePt, Config({
        "log": [], "solver": {"relaxation": "line-x",
                              "cycle": {"nrelax-pre": 1, "nrelax-post": 1},
                              "max-iter": 4, "tol": 1e-6}}))
    report("2d_aniso_linex", n * n, time_cycles(s, b), {"grid": [n, n]})

    # 3. 2D Poisson sharded over the mesh (single chip here -> measures the
    #    SPMD program's overhead; multi-chip runs use the same path)
    ndev = len(jax.devices())
    if ndev > 1:
        from cedar_tpu.parallel import DistSolver2, make_mesh

        n = 4096
        mesh = make_mesh(2)
        so = gallery.poisson(n, n, dtype=f32)
        b = gallery.poisson_rhs(n, n, dtype=f32)
        s = DistSolver2(so, FivePt, Config({
            "log": [], "solver": {"cycle": {"nrelax-pre": 1,
                                            "nrelax-post": 1},
                                  "max-iter": 4, "tol": 1e-6}}), mesh)
        report("2d_poisson_sharded", n * n, time_cycles(s, b),
               {"grid": [n, n], "mesh": dict(mesh.shape)})

    # F-cycle throughput on config 1's problem (VERDICT r3 item 7)
    n = 4096
    so = gallery.poisson(n, n, dtype=f32)
    b = gallery.poisson_rhs(n, n, dtype=f32)
    s = Solver2(so, FivePt, Config({
        "log": [], "solver": {"cycle": {"type": "f", "nrelax-pre": 1,
                                        "nrelax-post": 1},
                              "max-iter": 4, "tol": 1e-6}}))
    report("2d_poisson_5pt_fcycle", n * n, time_cycles(s, b),
           {"grid": [n, n]})

    def time_cycles3(s, b):
        """Chained split-resident cycles when the 3D solve loop uses them
        (mirrors solver3._solve_impl)."""
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

    # 4. 3D Poisson 7pt — point relax and plane relax
    n = 256
    so = gallery.poisson3(n, n, n, dtype=f32)
    b = gallery.poisson3_rhs(n, n, n, dtype=f32)
    s = Solver3(so, SevenPt, Config({
        "log": [], "solver": {"cycle": {"nrelax-pre": 1, "nrelax-post": 1},
                              "max-iter": 4, "tol": 1e-6}}))
    report("3d_poisson_7pt", n ** 3, time_cycles3(s, b), {"grid": [n] * 3})

    n = 128
    so = gallery.diag_diffusion3(n, n, n, 1.0, 1.0, 1e-3, dtype=f32)
    b = gallery.poisson3_rhs(n, n, n, dtype=f32)
    s = Solver3(so, SevenPt, Config({
        "log": [], "solver": {"relaxation": "plane-xy",
                              "cycle": {"nrelax-pre": 1, "nrelax-post": 1},
                              "max-iter": 4, "tol": 1e-6}}))
    report("3d_aniso_planexy", n ** 3, time_cycles(s, b), {"grid": [n] * 3})

    # 5. 3D 27-pt
    n = 128
    so = gallery.fe3(n, n, n, dtype=f32)
    b = gallery.poisson3_rhs(n, n, n, dtype=f32)
    s = Solver3(so, TwentySevenPt, Config({
        "log": [], "solver": {"cycle": {"nrelax-pre": 1, "nrelax-post": 1},
                              "max-iter": 4, "tol": 1e-6}}))
    report("3d_fe_27pt", n ** 3, time_cycles3(s, b), {"grid": [n] * 3})


if __name__ == "__main__":
    main()

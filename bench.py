#!/usr/bin/env python
"""Benchmarks over the BASELINE.json configs.

Emits one JSON line per config — 2D anisotropic line relax, 2D F-cycle,
3D 7-pt, 3D plane-xy, 3D 27-pt — and LAST the headline line (2D Poisson
V-cycle throughput per chip), whose ``extra.configs`` repeats the other
configs' numbers so a driver that parses a single line still records
them all:

    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Correctness gate: the reference's published residual history
(README.md:49-62 of /root/reference; see BASELINE.md) on the 400²
problem in float64.

The reference publishes no throughput numbers (SURVEY §6), so vs_baseline
compares against a speed-of-light model: the V-cycle's minimum HBM traffic
divided by the chip's peak memory bandwidth (v5e: 819 GB/s) — i.e.
vs_baseline = fraction of memory-bound speed-of-light achieved.

Timing methodology: the remote TPU runtime acknowledges dispatch before
execution completes AND has a large fixed per-call round-trip cost
(~28 ms, independent of the work), so cycles are chained inside ONE jitted
lax.fori_loop with a scalar fetch to force completion, measured at TWO
rep counts, and the per-cycle time is the DIFFERENCED slope (the fixed
cost cancels).

Set BENCH_FAST=1 to skip configs 2-5 (headline + gate only).
"""

import functools
import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

CEDAR_HISTORY = [
    0.388629, 0.0443548, 0.00494131, 0.000513399, 5.44908e-05,
    5.60612e-06, 5.86933e-07, 6.04942e-08, 6.30975e-09, 6.52713e-10,
]


def vcycle_traffic_bytes(nx, ny, nrelax=2, dtype_bytes=4):
    """Minimum HBM bytes touched by one V(1,1)-cycle (all levels).

    Fine level: each of the nrelax sweeps streams q, b, 3 stencil planes
    and writes q; the residual is fused with the last pre-smooth; restrict
    reads res + CI (8 half-resolution planes) and writes the coarse rhs;
    interp_add reads CI + res + coarse x and updates q.  Coarse levels
    (9-point) have 5 stencil planes; geometric sum ≈ 4/3 at equal
    per-point cost (slightly conservative).
    """
    n = nx * ny
    relax = nrelax * (5 + 1) * n           # 3 so + q + b read, q write
    residual_fused = 0                     # folded into the last sweep
    restrict = (1 + 2 + 0.25) * n          # res + CI(8 quarter-size) + rhs
    interp = (1 + 2 + 0.25 + 1) * n
    level = (relax + residual_fused + restrict + interp) * dtype_bytes
    return level * 4 / 3


def _timed_loop(step, x0, *consts, reps=(4, 16), tries=3):
    """ms per application, differenced two-rep-count timing."""
    import jax

    def total(reps_):
        @functools.partial(jax.jit, static_argnames=("n",))
        def run(x, *cs, n):
            def body(i, x):
                return step(x, *cs)

            return jax.lax.fori_loop(0, n, body, x)

        o = run(x0, *consts, n=reps_)
        float(jnp.sum(jax.tree.leaves(o)[0]))
        best = float("inf")
        for _ in range(tries):
            t0 = time.perf_counter()
            o = run(x0, *consts, n=reps_)
            float(jnp.sum(jax.tree.leaves(o)[0]))
            best = min(best, time.perf_counter() - t0)
        return best

    r1, r2 = reps
    return (total(r2) - total(r1)) / (r2 - r1) * 1e3


def _extra_configs():
    """Configs 2-5 of BASELINE.json (+ the 2D F-cycle): one dict per
    config, also printed as individual JSON lines."""
    from cedar_tpu import (FivePt, NinePt, SevenPt, TwentySevenPt, Solver2,
                           Solver3, gallery)
    from cedar_tpu.config import Config
    from cedar_tpu.solver import cycle2, cycle3

    f32 = jnp.float32
    out = {}

    def run_cfg(name, npts, make):
        try:
            dt = make()
            out[name] = {
                "dof_per_s": round(npts / dt, 1),
                "cycle_ms": round(dt * 1e3, 3),
            }
            print(json.dumps({"metric": name, "value": out[name]["dof_per_s"],
                              "unit": "DOF/s",
                              "cycle_ms": out[name]["cycle_ms"]}), flush=True)
        except Exception as e:  # noqa: BLE001 — one config must not kill the rest
            out[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
            print(json.dumps({"metric": name, "error": out[name]["error"]}),
                  flush=True)

    def cycles2(s, b):
        return _timed_loop(
            lambda x, levels, b: s._cycle_impl(levels, x, b),
            jnp.zeros_like(b), s.levels, b,
        ) * 1e-3

    def cycles3(s, b):
        if cycle3.fine_split_ok(s.levels, s.settings, s.constraints):
            from cedar_tpu.ops import pallas3_split as p3s

            dims = p3s.split_dims3(*b.shape)
            b4 = p3s.split4(b, dims)
            x40 = p3s.split4(jnp.zeros_like(b), dims)
            return _timed_loop(
                lambda x4, levels, b4: cycle3.ncycle_split(
                    levels, s.kinds, x4, b4, s.settings)[0],
                x40, s.levels, b4,
            ) * 1e-3
        return cycles2(s, b)

    # config 2: 2D anisotropic 9-pt, line-xy relaxation
    def cfg_linexy():
        n = 2048
        s = Solver2(gallery.fe(n, n, dtype=f32), NinePt, Config({
            "log": [], "solver": {"relaxation": "line-xy",
                                  "cycle": {"nrelax-pre": 1,
                                            "nrelax-post": 1},
                                  "max-iter": 4, "tol": 1e-6}}))
        return cycles2(s, gallery.poisson_rhs(n, n, dtype=f32))

    run_cfg("2d_fe_9pt_linexy_2048", 2048 * 2048, cfg_linexy)

    # 2D F-cycle on config 1's problem
    def cfg_fcycle():
        n = 4096
        s = Solver2(gallery.poisson(n, n, dtype=f32), FivePt, Config({
            "log": [], "solver": {"cycle": {"type": "f", "nrelax-pre": 1,
                                            "nrelax-post": 1},
                                  "max-iter": 4, "tol": 1e-6}}))
        return cycles2(s, gallery.poisson_rhs(n, n, dtype=f32))

    run_cfg("2d_poisson_fcycle_4096", 4096 * 4096, cfg_fcycle)

    # config 4: 3D Poisson 7-pt point relax, 256^3
    def cfg_3d7():
        n = 256
        s = Solver3(gallery.poisson3(n, n, n, dtype=f32), SevenPt, Config({
            "log": [], "solver": {"cycle": {"nrelax-pre": 1,
                                            "nrelax-post": 1},
                                  "max-iter": 4, "tol": 1e-6}}))
        return cycles3(s, gallery.poisson3_rhs(n, n, n, dtype=f32))

    run_cfg("3d_poisson_7pt_256", 256 ** 3, cfg_3d7)

    # config 4b: 3D anisotropic plane-xy relax, 128^3
    def cfg_plane():
        n = 128
        s = Solver3(gallery.diag_diffusion3(n, n, n, 1.0, 1.0, 1e-3,
                                            dtype=f32), SevenPt, Config({
            "log": [], "solver": {"relaxation": "plane-xy",
                                  "cycle": {"nrelax-pre": 1,
                                            "nrelax-post": 1},
                                  "max-iter": 4, "tol": 1e-6}}))
        return cycles2(s, gallery.poisson3_rhs(n, n, n, dtype=f32))

    run_cfg("3d_aniso_planexy_128", 128 ** 3, cfg_plane)

    # config 5: 3D 27-pt (fe), 128^3
    def cfg_27():
        n = 128
        s = Solver3(gallery.fe3(n, n, n, dtype=f32), TwentySevenPt, Config({
            "log": [], "solver": {"cycle": {"nrelax-pre": 1,
                                            "nrelax-post": 1},
                                  "max-iter": 4, "tol": 1e-6}}))
        return cycles3(s, gallery.poisson3_rhs(n, n, n, dtype=f32))

    run_cfg("3d_fe_27pt_128", 128 ** 3, cfg_27)
    return out


def main():
    from cedar_tpu import FivePt, Solver2, gallery
    from cedar_tpu.config import Config

    # -- correctness gate: reference residual history, 400² float64 ---------
    # f64 in a subprocess (x64 must be set before jax initializes, and
    # the throughput run below wants the default f32 TPU config).  Runs
    # ON the default device — f64 executes on the TPU (probe_f64_gate:
    # digit-for-digit history match on-device); BENCH_GATE=cpu pins the
    # gate to the CPU backend instead (faster compile, same digits)
    on_cpu = ("jax.config.update('jax_default_device',"
              " jax.devices('cpu')[0]);"
              if os.environ.get("BENCH_GATE") == "cpu" else "")
    gate_src = (
        "import jax;"
        "jax.config.update('jax_enable_x64', True);"
        + on_cpu +
        "from cedar_tpu import FivePt, Solver2, gallery;"
        "from cedar_tpu.config import Config;"
        "so = gallery.poisson(400, 400);"
        "b = gallery.poisson_rhs(400, 400);"
        "s = Solver2(so, FivePt, Config({'log': [], 'kernels':"
        " {'backend': 'xla'}, 'solver': {'num-levels': 7,"
        " 'cycle': {'nrelax-pre': 1, 'nrelax-post': 1},"
        " 'tol': 1e-10, 'max-iter': 10}}));"
        "s.solve(b);"
        "print('HIST', ' '.join(f'{h:.8e}' for h in s.history))"
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", gate_src],
            capture_output=True, text=True, timeout=600,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        hist_line = [ln for ln in out.stdout.splitlines()
                     if ln.startswith("HIST")][0]
        hist = [float(v) for v in hist_line.split()[1:]]
        hist_ok = bool(
            len(hist) == 10 and np.allclose(hist, CEDAR_HISTORY, rtol=2e-5)
        )
    except (IndexError, subprocess.SubprocessError):
        hist_ok = False

    # -- throughput: 4096² float32 V(1,1) ----------------------------------
    n = 4096
    dtype = jnp.float32
    conf = Config({
        "log": [],
        "solver": {
            "cycle": {"nrelax-pre": 1, "nrelax-post": 1},
            "tol": 1e-6,
            "max-iter": 4,
        },
    })
    so = gallery.poisson(n, n, dtype=dtype)
    b = gallery.poisson_rhs(n, n, dtype=dtype)
    solver = Solver2(so, FivePt, conf)
    jax.block_until_ready(solver.levels)

    from cedar_tpu.solver import cycle2

    # the solve loop keeps the fine level lane-parity-split across
    # iterations (solver2._solve_impl); chain bench cycles the same way
    use_split = cycle2.fine_split_ok(
        solver.levels, solver.settings, solver.constraints
    )
    if use_split:
        from cedar_tpu.ops import pallas2_split as ps

        nxp, W, _ = ps.split_dims(n, n)
        b_in = ps.lane_split(b, nxp, W)
        x_in = ps.lane_split(jnp.zeros_like(b), nxp, W)

        def one_cycle(levels, x2, b2):
            return cycle2.ncycle_split(
                levels, solver.kinds, x2, b2, solver.settings,
                solver.periodic,
            )[0]
    else:
        b_in, x_in = b, jnp.zeros_like(b)
        one_cycle = solver._cycle_impl

    @functools.partial(jax.jit, static_argnames=("reps",))
    def run(levels, x, b, reps):
        def body(i, x):
            return one_cycle(levels, x, b)

        return jax.lax.fori_loop(0, reps, body, x)

    def total(reps, tries=3):
        x = run(solver.levels, x_in, b_in, reps)
        float(jnp.sum(x))  # warm-up + force
        best = float("inf")
        for _ in range(tries):
            t0 = time.perf_counter()
            x = run(solver.levels, x_in, b_in, reps)
            float(jnp.sum(x))
            best = min(best, time.perf_counter() - t0)
        return best

    r1, r2 = 10, 60
    dt = (total(r2) - total(r1)) / (r2 - r1)

    dof_s = n * n / dt
    sol_time = vcycle_traffic_bytes(n, n) / 819e9  # v5e HBM peak
    frac_sol = sol_time / dt
    # fraction of the MEASURED achievable copy bandwidth (~650 GB/s on
    # this v5e via tools/probe_bw.py) — vs_baseline divides by the 819
    # GB/s spec, whose realistic ceiling is ~0.80 (NOTES.md)
    frac_ach = vcycle_traffic_bytes(n, n) / 650e9 / dt

    def headline(configs):
        return json.dumps({
            "metric": "2d_poisson_vcycle_dof_per_s_per_chip",
            "value": round(dof_s, 1),
            "unit": "DOF/s",
            "vs_baseline": round(frac_sol, 4),
            "extra": {
                "grid": [n, n],
                "dtype": "float32",
                "cycle_ms": round(dt * 1e3, 4),
                "vs_achievable_bw": round(frac_ach, 4),
                "matches_reference_history_400sq_f64": hist_ok,
                "device": str(jax.devices()[0]),
                "configs": configs,
            },
        })

    # headline FIRST (so a driver-side timeout during the extra configs
    # cannot lose it), then one line per config, then the headline again
    # with the configs embedded (for a last-line parser)
    print(headline({}), flush=True)
    configs = {}
    if not os.environ.get("BENCH_FAST"):
        configs = _extra_configs()
        print(headline(configs), flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Headline benchmark: 2D Poisson V-cycle throughput per chip.

Measures end-to-end V(1,1)-cycle throughput (DOF/s) for the 2D Poisson
5-point problem (BASELINE.json config 1) on the default JAX device, and
validates the convergence factor against the reference's ~0.10/cycle
(BASELINE.md).  Prints ONE JSON line:

    {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

The reference publishes no throughput numbers (SURVEY §6), so vs_baseline
compares against a speed-of-light model instead: the V-cycle's minimum HBM
traffic divided by the chip's peak memory bandwidth (v5e: 819 GB/s) — i.e.
vs_baseline = fraction of memory-bound speed-of-light achieved.
"""

import json
import time

import jax
import jax.numpy as jnp


def vcycle_traffic_bytes(nx, ny, nrelax=2, dtype_bytes=4):
    """Minimum HBM bytes touched by one V-cycle (all levels).

    Per level: each relaxation color phase reads q, b, stencil (~5 planes)
    and writes q; residual/restrict/interp each stream the level once.
    Geometric sum over levels ≈ 4/3 of the fine level.
    """
    n = nx * ny
    # fine level: nrelax sweeps × 2 colors × (read 5 stencil + q + b, write q)
    per_sweep = 2 * (5 + 2 + 1) * n
    relax = nrelax * per_sweep
    residual = (5 + 2 + 1) * n
    transfer = 3 * n  # restrict read + interp read/write (coarse ~ n/4)
    level = (relax + residual + transfer) * dtype_bytes
    return level * 4 / 3


def main():
    from cedar_tpu import FivePt, Solver2, gallery
    from cedar_tpu.config import Config

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

    # correctness gate: convergence factor over the first cycles ~ 0.10
    x = solver.solve(b)
    hist = solver.history
    factor = (hist[2] / hist[0]) ** 0.5 if len(hist) >= 3 else 1.0

    # throughput: chained V-cycles
    x = jnp.zeros_like(b)
    x = solver.vcycle(x, b)
    jax.block_until_ready(x)  # compile
    reps = 50
    t0 = time.perf_counter()
    for _ in range(reps):
        x = solver.vcycle(x, b)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / reps

    dof_s = n * n / dt
    sol_bytes = vcycle_traffic_bytes(n, n)
    sol_time = sol_bytes / 819e9  # v5e HBM peak
    frac_sol = sol_time / dt

    print(json.dumps({
        "metric": "2d_poisson_vcycle_dof_per_s_per_chip",
        "value": round(dof_s, 1),
        "unit": "DOF/s",
        "vs_baseline": round(frac_sol, 4),
        "extra": {
            "grid": [n, n],
            "dtype": "float32",
            "cycle_ms": round(dt * 1e3, 4),
            "conv_factor_first_cycles": round(factor, 4),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()

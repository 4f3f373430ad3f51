"""Scaling-efficiency harness: DOF/s vs device count (BASELINE.json's
">=70% nnz/s scaling efficiency at 1 chip -> 1 host -> N hosts").

Runs the distributed 2D Poisson cycle on meshes of 1, 2, 4, ... devices
and reports throughput and efficiency relative to the single-device run.
On real multi-chip TPU slices this measures ICI halo-exchange overhead;
with a single local accelerator it falls back to the virtual CPU mesh
(functional validation of the sharded program, not a performance number —
the printout says which).

Usage:
    python tools/scaling.py [n]
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/scaling.py 1024   # virtual-mesh fallback
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp

from cedar_tpu import FivePt, gallery
from cedar_tpu.config import Config
from cedar_tpu.parallel import DistSolver2, make_mesh


def time_cycles(solver, b, reps=20):
    @jax.jit
    def run(levels, x, b):
        def body(i, x):
            return solver._cycle_impl(levels, x, b)

        return jax.lax.fori_loop(0, reps, body, x)

    x = run(solver.levels, jnp.zeros_like(b), b)
    float(jnp.sum(x))
    t0 = time.perf_counter()
    x = run(solver.levels, jnp.zeros_like(b), b)
    float(jnp.sum(x))
    return (time.perf_counter() - t0) / reps


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096

    devs = jax.devices()
    virtual = False
    if len(devs) == 1:
        devs = jax.devices("cpu")
        virtual = True

    so = gallery.poisson(n, n, dtype=jnp.float32)
    b = gallery.poisson_rhs(n, n, dtype=jnp.float32)
    conf = Config({"log": [], "solver": {
        "cycle": {"nrelax-pre": 1, "nrelax-post": 1},
        "max-iter": 4, "tol": 1e-6}})

    base = None
    nd = 1
    while nd <= len(devs):
        mesh = make_mesh(2, devices=devs[:nd])
        s = DistSolver2(so, FivePt, conf, mesh)
        dt = time_cycles(s, b)
        dofs = n * n / dt
        if base is None:
            base = dofs
        eff = dofs / (base * nd)
        print(json.dumps({
            "metric": "2d_poisson_scaling",
            "devices": nd,
            "mesh": dict(mesh.shape),
            "dof_per_s": round(dofs, 1),
            "cycle_ms": round(dt * 1e3, 3),
            "efficiency_vs_1dev": round(eff, 4),
            "virtual_cpu_mesh": virtual,
        }), flush=True)
        nd *= 2


if __name__ == "__main__":
    main()

"""Probe: old slab sweep kernel at larger VMEM budgets / tile sizes."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp

from cedar_tpu import FivePt, gallery
from cedar_tpu.ops import pallas2
from cedar_tpu.ops.relax2 import setup_recip

REPS = 20


def timed(step, x0, *consts):
    @jax.jit
    def run(x, *consts):
        def body(i, x):
            return step(x, *consts)
        return jax.lax.fori_loop(0, REPS, body, x)

    o = run(x0, *consts)
    float(jnp.sum(o))
    t0 = time.perf_counter()
    o = run(x0, *consts)
    float(jnp.sum(o))
    return (time.perf_counter() - t0) / REPS * 1e3


def main(n=4096):
    so = gallery.poisson(n, n, dtype=jnp.float32)
    b = gallery.poisson_rhs(n, n, dtype=jnp.float32)
    rec = setup_recip(so)
    q0 = jnp.zeros_like(b)

    for budget_mb in (9, 16, 32, 64, 100):
        pallas2._VMEM_BUDGET = budget_mb * 1024 * 1024
        t = pallas2._tile_for(n, n, 3)
        try:
            ms = timed(
                lambda q, so, b, rec: pallas2._point_relax_call(
                    so, q, b, rec, FivePt, "down"),
                q0, so, b, rec,
            )
            traffic = (5 * (1 + 16 / t) + 1) * n * n * 4
            print(f"budget {budget_mb:4d}MB T={t:4d}: {ms:7.3f} ms "
                  f"({traffic / ms / 1e6:5.0f} GB/s eff)", flush=True)
        except Exception as e:
            print(f"budget {budget_mb:4d}MB T={t:4d}: FAIL {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)

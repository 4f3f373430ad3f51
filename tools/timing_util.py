"""Differencing timer for the axon-tunnel TPU.

The remote runtime has a LARGE fixed per-call cost (~28-30 ms round trip,
independent of the work dispatched), and loop-carried arrays that fit in
VMEM never touch HBM at all.  Naive "total / reps" timing therefore
measures the tunnel, not the chip (this inflated every round-1 number).

``timed_loop`` chains ``reps`` dependent applications inside ONE jitted
fori_loop, measures at two rep counts, and returns the DIFFERENCED
per-application time — the fixed cost cancels.  Measurements at both rep
counts are repeated and the minimum total is used (the tunnel RTT has
multi-ms jitter).
"""

import time

import jax
import jax.numpy as jnp


def _total(step, x0, consts, reps, tries=3):
    @jax.jit
    def run(x, *consts):
        def body(i, x):
            return step(x, *consts)

        return jax.lax.fori_loop(0, reps, body, x)

    o = run(x0, *consts)
    o = jax.tree.leaves(o)[0]
    float(jnp.sum(o))  # warm + force
    best = float("inf")
    for _ in range(tries):
        t0 = time.perf_counter()
        o = run(x0, *consts)
        o = jax.tree.leaves(o)[0]
        float(jnp.sum(o))
        best = min(best, time.perf_counter() - t0)
    return best


def timed_loop(step, x0, *consts, reps=(10, 50), tries=3):
    """ms per application of ``step(x, *consts) -> x-like``, differenced."""
    r1, r2 = reps
    t1 = _total(step, x0, consts, r1, tries)
    t2 = _total(step, x0, consts, r2, tries)
    return (t2 - t1) / (r2 - r1) * 1e3

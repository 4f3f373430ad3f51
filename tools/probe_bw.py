"""Probe: raw achievable HBM bandwidth on this chip (copy / axpy / reduce)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
import jax.numpy as jnp

REPS = 30


def timed(step, x0, *consts):
    @jax.jit
    def run(x, *consts):
        def body(i, x):
            return step(x, *consts)
        return jax.lax.fori_loop(0, REPS, body, x)

    o = run(x0, *consts)
    jax.block_until_ready(o)
    float(jnp.sum(o) if o.ndim else o)
    t0 = time.perf_counter()
    o = run(x0, *consts)
    float(jnp.sum(o) if o.ndim else o)
    return (time.perf_counter() - t0) / REPS * 1e3


def main(n=4096):
    x = jnp.ones((n, n), jnp.float32)
    y = jnp.ones((n, n), jnp.float32)
    nb = n * n * 4

    ms = timed(lambda a: a + 1.0, x)
    print(f"x+1      : {ms:7.3f} ms  {2 * nb / ms / 1e6:6.0f} GB/s", flush=True)

    ms = timed(lambda a, b: a + b, x, y)
    print(f"x+y      : {ms:7.3f} ms  {3 * nb / ms / 1e6:6.0f} GB/s", flush=True)

    ms = timed(lambda a, b: a + 0.99 * b, x, y)
    print(f"axpy     : {ms:7.3f} ms  {3 * nb / ms / 1e6:6.0f} GB/s", flush=True)

    # 5-pt stencil apply in pure XLA (rolls via slicing)
    def sten(a):
        s = jnp.pad(a, 1)
        return (4 * s[1:-1, 1:-1] - s[:-2, 1:-1] - s[2:, 1:-1]
                - s[1:-1, :-2] - s[1:-1, 2:])

    ms = timed(sten, x)
    print(f"5pt roll : {ms:7.3f} ms  {2 * nb / ms / 1e6:6.0f} GB/s", flush=True)

    ms = timed(lambda a: a * (jnp.sum(a) * 0 + 1.0), x)
    print(f"sum+scale: {ms:7.3f} ms  {3 * nb / ms / 1e6:6.0f} GB/s", flush=True)

    # bf16 copy for reference
    xb = x.astype(jnp.bfloat16)
    ms = timed(lambda a: a + 1, xb)
    print(f"bf16 x+1 : {ms:7.3f} ms  {nb / ms / 1e6:6.0f} GB/s", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)

"""Probe: DMA vs compute split of the Pallas sweep slab pipeline."""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from profile_ops import timed_loop

N = 4096
T, H = 32, 8
R = T + 2 * H
F32 = jnp.float32


def kernel(so_hbm, b_hbm, q_hbm, out_hbm, qs, sos, bs, sems, *, mode):
    i = pl.program_id(0)
    row0 = jnp.maximum(0, jnp.minimum(i * T - H, N - R))
    row0 = pl.multiple_of((row0 // 8) * 8, 8)
    cps = [
        pltpu.make_async_copy(q_hbm.at[pl.ds(row0, R)], qs, sems.at[0]),
        pltpu.make_async_copy(so_hbm.at[:, pl.ds(row0, R)], sos, sems.at[1]),
        pltpu.make_async_copy(b_hbm.at[pl.ds(row0, R)], bs, sems.at[2]),
    ]
    for c in cps:
        c.start()
    for c in cps:
        c.wait()

    q = qs[:]
    if mode == "dma":
        q = q + bs[:] * 0.001
    elif mode == "phases_noroll":
        # phase math without any rolls: measures raw VPU cost
        rec = 1.0 / sos[0]
        for _ in range(2):
            upd = (bs[:] + sos[1] * q + sos[2] * q + sos[1] * q
                   + sos[2] * q) * rec
            q = jnp.where(q > upd, upd, q)
    elif mode == "rolls_only":
        for _ in range(2):
            q = (pltpu.roll(q, 1, 0) + pltpu.roll(q, R - 1, 0)
                 + pltpu.roll(q, 1, 1) + pltpu.roll(q, N - 1, 1)) * 0.25
    qs[:] = q
    ostart = jnp.maximum(0, jnp.minimum(i * T, N - T))
    ostart = pl.multiple_of((ostart // 8) * 8, 8)
    loff = pl.multiple_of(((ostart - row0) // 8) * 8, 8)
    out = pltpu.make_async_copy(
        qs.at[pl.ds(loff, T)], out_hbm.at[pl.ds(ostart, T)], sems.at[0]
    )
    out.start()
    out.wait()


def run(mode):
    anyspec = pl.BlockSpec(memory_space=pltpu.ANY)

    @jax.jit
    def call(so, b, q):
        return pl.pallas_call(
            functools.partial(kernel, mode=mode),
            grid=(pl.cdiv(N, T),),
            in_specs=[anyspec] * 3,
            out_specs=anyspec,
            out_shape=jax.ShapeDtypeStruct((N, N), F32),
            scratch_shapes=[
                pltpu.VMEM((R, N), F32),
                pltpu.VMEM((3, R, N), F32),
                pltpu.VMEM((R, N), F32),
                pltpu.SemaphoreType.DMA((3,)),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(so, b, q)

    so = jnp.ones((3, N, N), F32)
    b = jnp.ones((N, N), F32)
    ms = timed_loop(lambda q, so, b: call(so, b, q), jnp.zeros((N, N), F32),
                    so, b)
    traffic = (5 + 1) * N * N * 4 * (R / T)
    print(f"{mode:15s}: {ms:6.3f} ms   ({traffic/ms/1e6:5.0f} GB/s)")


if __name__ == "__main__":
    for mode in ["dma", "phases_noroll", "rolls_only"]:
        run(mode)

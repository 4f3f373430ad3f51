"""Probe the 3D 7-pt sweep kernel's limiting factor at 256^3 (TPU).

The 2D-tiled sweep measures ~245 GB/s effective vs the ~440 GB/s its
refetch ratio (~0.68) should allow.  This probe separates:
  * compute vs traffic: run the same kernel with ONE phase (half the
    VPU work, same HBM traffic),
  * tile-size sensitivity: force tiles the planner rejects/never picks
    and record Mosaic OOMs vs wins,
  * a copy-bandwidth reference on the same operand set.
Operands are loop arguments (closure constants blow the remote-compile
limit)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax.numpy as jnp

from timing_util import timed_loop

from cedar_tpu import gallery
from cedar_tpu.core.types import StencilKind
from cedar_tpu.ops import pallas3


def main(n=256):
    kind = StencilKind.seven_pt
    so = gallery.poisson3(n, n, n, dtype=jnp.float32)
    b = gallery.poisson3_rhs(n, n, n, dtype=jnp.float32)
    z = jnp.zeros_like(b)
    gb = (4 + 1 + 1 + 1) * n ** 3 * 4 / 1e9  # so4 + q + b in, q out

    def run(tag, fn, *args):
        try:
            ms = timed_loop(fn, *args)
            print(f"{tag:34s}: {ms:7.3f} ms ({gb / ms * 1e3:5.0f} GB/s eff)",
                  flush=True)
            return ms
        except Exception as e:  # Mosaic OOM / lowering errors
            print(f"{tag:34s}: FAIL {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            return None

    run("point_relax (routed)",
        lambda q, so, b: pallas3.point_relax(so, q, b, None, "down"),
        z, so, b)

    # one phase only — same traffic, half the update compute
    import jax

    tile = pallas3._tile2d_for(kind, n, n, n)
    print("planner tile:", tile, flush=True)

    def one_phase(q, so, b):
        o = jnp.zeros((3,), jnp.int32)
        return pallas3._point_relax2d_call(so, q, b, kind, "down", 0, 1,
                                           tile, False, o)

    run("2d-tiled 1 phase", one_phase, z, so, b)

    def forced(tx, ty, hx=3, hy=8):
        t = (tx, ty, hx, hy)

        def f(q, so, b):
            o = jnp.zeros((3,), jnp.int32)
            return pallas3._point_relax2d_call(so, q, b, kind, "down",
                                               0, 2, t, False, o)
        return f

    for tx, ty in [(32, 64), (64, 64), (64, 128), (128, 128), (32, 256),
                   (64, 256), (128, 256), (256, 32), (256, 64)]:
        if n % tx or n % ty:
            continue
        eff = (tx * ty) / ((tx + 6) * (ty + 16))
        run(f"2d-tiled Tx={tx:3d} Ty={ty:3d} (eff {eff:.2f})",
            forced(tx, ty), z, so, b)

    # copy reference: read the same operand set, write one array
    def copy_ref(q, so, b):
        return q + b + so[0] + so[1] + so[2] + so[3]

    ms = timed_loop(copy_ref, z, so, b)
    print(f"{'XLA 6-read-1-write reference':34s}: {ms:7.3f} ms "
          f"({gb / ms * 1e3:5.0f} GB/s eff)", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)

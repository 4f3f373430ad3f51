"""Probe 27-pt 2D-tiled sweep tiles at 128^3 (TPU): the conservative
VMEM model rejects exact-fit HX=16 tiles; measure which actually compile
and how they perform vs the planner's padded (18,32,9,16)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import jax.numpy as jnp
from timing_util import timed_loop
from cedar_tpu import gallery
from cedar_tpu.core.types import StencilKind
from cedar_tpu.ops import pallas3

def main(n=128):
    kind = StencilKind.twenty_seven_pt
    so = gallery.fe3(n, n, n, dtype=jnp.float32)
    b = gallery.poisson3_rhs(n, n, n, dtype=jnp.float32)
    z = jnp.zeros_like(b)
    gb = (14 + 1 + 1 + 1) * n ** 3 * 4 / 1e9

    def run(tag, fn, *args):
        try:
            ms = timed_loop(fn, *args, reps=(6, 20))
            print(f"{tag:32s}: {ms:7.3f} ms ({gb / ms * 1e3:5.0f} GB/s eff)",
                  flush=True)
        except Exception as e:
            print(f"{tag:32s}: FAIL {type(e).__name__}: {str(e)[:100]}",
                  flush=True)

    run("point_relax (routed)",
        lambda q, so, b: pallas3.point_relax(so, q, b, None, "down",
                                             kind=kind), z, so, b)

    import jax
    for tile in [(16, 16, 16, 16), (16, 32, 16, 16), (32, 32, 16, 16),
                 (32, 64, 16, 16), (16, 64, 16, 16), (18, 32, 9, 16),
                 (36, 32, 9, 16), (18, 64, 9, 16)]:
        Tx, Ty, HX, HY = tile
        if n % Tx or n % Ty:
            nxp = -(-n // Tx) * Tx
            tag = f"tile {tile} (pad {nxp})"
        else:
            tag = f"tile {tile} (exact)"

        def f(q, so, b, tile=tile):
            o = jnp.zeros((3,), jnp.int32)
            return pallas3._point_relax_2d_tiled(
                so, q, b, kind, "down", False, o, tile)
        run(tag, f, z, so, b)

if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)

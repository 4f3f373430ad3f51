"""Do Mosaic kernels work under jax.vmap on this stack? (plane-relax
batching wants vmapped fused line sweeps + transfer kernels)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import numpy as np, jax, jax.numpy as jnp
from cedar_tpu.ops import pallas_lines2 as pla, lines2
from cedar_tpu.core.types import StencilKind

def main():
    rng = np.random.default_rng(3)
    B, n = 8, 128
    base = np.zeros((3, n, n), np.float32)
    base[0] = 4.0; base[1] = 1.0; base[2] = 1.0
    base[1][0, :] = 0; base[2][:, 0] = 0
    sos = jnp.asarray(np.stack([base * (1 + 0.1 * i) for i in range(B)]))
    qs = jnp.asarray(rng.standard_normal((B, n, n)), jnp.float32)
    bs = jnp.asarray(rng.standard_normal((B, n, n)), jnp.float32)
    got = jax.jit(jax.vmap(
        lambda so, q, b: pla.line_relax_x(so, q, b, StencilKind.five_pt,
                                          "down")))(sos, qs, bs)
    got.block_until_ready()
    ref = []
    for i in range(B):
        sor = lines2.setup_lines(sos[i], StencilKind.five_pt, "x")
        ref.append(np.asarray(lines2.line_relax_x(
            sos[i], qs[i], bs[i], sor, StencilKind.five_pt, "down")))
    err = np.max(np.abs(np.stack(ref) - np.asarray(got)))
    print("vmap fused-lines max err:", err, flush=True)
    assert err < 2e-4
    print("VMAP_PALLAS_OK", flush=True)

if __name__ == "__main__":
    main()

"""f32 convergence floor: pallas vs xla backend at 128^3 (a kernel bug
would show as the pallas floor sitting above the XLA floor)."""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import jax, jax.numpy as jnp
from cedar_tpu import SevenPt, Solver3, gallery
from cedar_tpu.config import Config

n = 128
so = gallery.poisson3(n, n, n, dtype=jnp.float32)
b = gallery.poisson3_rhs(n, n, n, dtype=jnp.float32)
for backend in ("pallas", "xla"):
    s = Solver3(so, SevenPt, Config({
        "log": [], "kernels": {"backend": backend},
        "solver": {"tol": 1e-7, "max-iter": 14}}))
    x = s.solve(b)
    jax.block_until_ready(x)
    print(f"{backend}: {len(s.history)} iters, floor "
          f"{min(s.history):.3e}, last {s.history[-1]:.3e}", flush=True)

"""End-to-end production-path check: Solver3.solve at 256^3 on the TPU."""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import jax, jax.numpy as jnp
from cedar_tpu import SevenPt, Solver3, gallery
from cedar_tpu.config import Config

n = 256
so = gallery.poisson3(n, n, n, dtype=jnp.float32)
b = gallery.poisson3_rhs(n, n, n, dtype=jnp.float32)
t0 = time.time()
s = Solver3(so, SevenPt, Config({
    "log": ["status"], "solver": {"tol": 1e-5, "max-iter": 12}}))
print(f"setup {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
x = s.solve(b)
jax.block_until_ready(x)
dt = time.time() - t0
print(f"solve {dt:.2f}s, {len(s.history)} iters, "
      f"final rel {s.history[-1]:.3e}", flush=True)
t0 = time.time()
x = s.solve(b)
jax.block_until_ready(x)
dt = time.time() - t0
print(f"re-solve {dt*1e3:.0f} ms total "
      f"({dt*1e3/len(s.history):.2f} ms/cycle incl. fixed costs)",
      flush=True)
from cedar_tpu.ops.stencil3 import residual
r = residual(so, x, b, SevenPt)
rel = float(jnp.sqrt(jnp.sum(r * r)) / jnp.sqrt(jnp.sum(b * b)))
print(f"true rel residual {rel:.3e}", "PASS" if rel < 1e-4 else "FAIL",
      flush=True)

"""Run the 400^2 reference-history gate in float64 ON the TPU."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import time
import jax
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp
import numpy as np
from cedar_tpu import Solver2, FivePt, gallery
from cedar_tpu.config import Config

CEDAR_HISTORY = [0.388629, 0.0443548, 0.00494131, 0.000513399, 5.44908e-05,
                 5.60612e-06, 5.86933e-07, 6.04942e-08, 6.30975e-09,
                 6.52713e-10]
print("default device:", jax.devices()[0], flush=True)
so = gallery.poisson(400, 400, dtype=jnp.float64)
b = gallery.poisson_rhs(400, 400, dtype=jnp.float64)
conf = Config({"log": [], "kernels": {"backend": "xla"},
               "solver": {"num-levels": 7,
                          "cycle": {"nrelax-pre": 1, "nrelax-post": 1},
                          "tol": 1e-10, "max-iter": 10}})
t0 = time.time()
s = Solver2(so, FivePt, conf)
print(f"setup {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
x = s.solve(b)
jax.block_until_ready(x)
print(f"solve {time.time()-t0:.1f}s", flush=True)
print("history:", [f"{h:.6e}" for h in s.history], flush=True)
ok = len(s.history) == 10 and np.allclose(s.history, CEDAR_HISTORY, rtol=2e-5)
print("ON-DEVICE F64 GATE:", "PASS" if ok else "FAIL", flush=True)
t0 = time.time(); s.solve(b); jax.block_until_ready(x)
print(f"resolve {time.time()-t0:.2f}s", flush=True)

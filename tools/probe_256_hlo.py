"""Compiled-HLO copy audit of the 256^3 split cycle."""
import sys, os, re
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import jax, jax.numpy as jnp
from cedar_tpu import SevenPt, Solver3, gallery
from cedar_tpu.config import Config
from cedar_tpu.core.types import StencilKind
from cedar_tpu.ops import pallas3_split as p3s
from cedar_tpu.solver import cycle3

n = 256
so = gallery.poisson3(n, n, n, dtype=jnp.float32)
s = Solver3(so, SevenPt, Config({
    "log": [], "solver": {"cycle": {"nrelax-pre": 1, "nrelax-post": 1},
                          "max-iter": 2, "tol": 1e-6}}))
dims = p3s.split_dims3(n, n, n)
b4 = p3s.split4(gallery.poisson3_rhs(n, n, n, dtype=jnp.float32), dims)
q40 = jnp.zeros_like(b4)

f = jax.jit(lambda levels, x4, b4: cycle3.ncycle_split(
    levels, s.kinds, x4, b4, s.settings)[0])
hlo = f.lower(s.levels, q40, b4).compile().as_text()
copies = {}
for m in re.finditer(r"copy(?:-start)?\(", hlo):
    ln = hlo[:m.start()].rsplit("\n", 1)[-1] + hlo[m.start():].split("\n", 1)[0]
    shp = re.search(r"f32\[([0-9,]+)\]", ln)
    if shp:
        dims_ = [int(x) for x in shp.group(1).split(",")]
        nbytes = 4
        for d in dims_:
            nbytes *= d
        copies[shp.group(1)] = copies.get(shp.group(1), 0) + 1
for k, v in sorted(copies.items(), key=lambda kv: -kv[1])[:15]:
    print(f"copy f32[{k}] x{v}", flush=True)
big = sum(v * eval("*".join(k.split(","))) * 4 for k, v in copies.items()
          if eval("*".join(k.split(","))) * 4 > 1e6)
print(f"total copied bytes (>1MB shapes): {big/1e6:.0f} MB", flush=True)
n_fusion = hlo.count("fusion(")
print("fusions:", n_fusion, "custom-calls:", hlo.count("custom-call("),
      flush=True)

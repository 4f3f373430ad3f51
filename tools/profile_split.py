"""Dense vs lane-parity-split fine-level cycle at 4096² (TPU).

Validates the split path numerically on the real chip (vs the XLA
backend), then differenced-times:
  1. dense hybrid cycle (current default),
  2. split-resident cycle (ncycle_split chained, as the solve loop runs),
  3. the individual split ops (sweep, fused sweep+residual, interp_add).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax.numpy as jnp

from timing_util import timed_loop

from cedar_tpu import FivePt, Solver2, gallery
from cedar_tpu.config import Config
from cedar_tpu.core.types import StencilKind
from cedar_tpu.ops import pallas2_split as ps
from cedar_tpu.ops import pallas_transfer2 as pt
from cedar_tpu.solver import cycle2


def main(n=4096):
    so = gallery.poisson(n, n, dtype=jnp.float32)
    b = gallery.poisson_rhs(n, n, dtype=jnp.float32)
    base = {"log": [], "solver": {"cycle": {"nrelax-pre": 1,
                                            "nrelax-post": 1},
                                  "max-iter": 2, "tol": 1e-6}}

    conf_s = dict(base)
    conf_s["kernels"] = {"backend": "pallas", "fine-split": True}
    s = Solver2(so, FivePt, Config(conf_s))
    assert cycle2.fine_split_ok(s.levels, s.settings, None), "split off?"

    # -- correctness on the real chip: split cycle vs XLA backend --------
    nv = 512
    sov = gallery.poisson(nv, nv, dtype=jnp.float32)
    bv = gallery.poisson_rhs(nv, nv, dtype=jnp.float32)
    cx = dict(base)
    cx["kernels"] = {"backend": "xla"}
    sx = Solver2(sov, FivePt, Config(cx))
    cs = dict(base)
    cs["kernels"] = {"backend": "pallas", "fine-split": True}
    ss = Solver2(sov, FivePt, Config(cs))
    vx = sx.vcycle(jnp.zeros_like(bv), bv)
    vs = ss.vcycle(jnp.zeros_like(bv), bv)
    err = float(jnp.max(jnp.abs(vx - vs)))
    print(f"split-vs-xla cycle max|d| at {nv}^2: {err:.3e}", flush=True)
    assert err < 1e-5, "split path WRONG on device"

    # -- timings ---------------------------------------------------------
    conf_d = dict(base)
    conf_d["kernels"] = {"backend": "pallas"}
    sd = Solver2(so, FivePt, Config(conf_d))

    # levels must be ARGUMENTS, not closure constants: baked-in arrays
    # blow the remote-compile request limit (HTTP 413, see NOTES.md)
    def dense_cycle(x, levels, b):
        return cycle2.ncycle(levels, sd.kinds, 0, x, b, sd.settings)

    ms = timed_loop(dense_cycle, jnp.zeros_like(b), sd.levels, b)
    print(f"dense cycle        : {ms:7.3f} ms", flush=True)

    nxp, W, _ = ps.split_dims(n, n)
    b2 = ps.lane_split(b, nxp, W)
    x20 = ps.lane_split(jnp.zeros_like(b), nxp, W)

    def split_cycle(x2, levels, b2):
        return cycle2.ncycle_split(levels, s.kinds, x2, b2,
                                   s.settings)[0]

    ms = timed_loop(split_cycle, x20, s.levels, b2)
    print(f"split cycle        : {ms:7.3f} ms", flush=True)

    so2 = s.levels[0].so2
    kind = StencilKind.five_pt

    def sweep(x2, so2, b2):
        return ps.point_relax_split(so2, x2, b2, kind, "down")

    ms = timed_loop(sweep, x20, so2, b2)
    print(f"split sweep        : {ms:7.3f} ms", flush=True)

    def sweep_res(x2, so2, b2):
        q, r = ps.point_relax_split(so2, x2, b2, kind, "down",
                                    fuse_residual=True)
        return q + r  # keep both live

    ms = timed_loop(sweep_res, x20, so2, b2)
    print(f"split sweep+res    : {ms:7.3f} ms", flush=True)

    coarse = s.levels[1]
    nxc, nyc = coarse.so.shape[1:]
    rng = np.random.default_rng(0)
    qc = jnp.asarray(rng.standard_normal((nxc, nyc)), jnp.float32)

    def iadd(x2, cip, rec2, qc, b2):
        return pt.interp_add_split(cip, rec2, qc, b2, x2)

    ms = timed_loop(iadd, x20, coarse.cip, s.levels[0].rec2, qc, b2)
    print(f"split interp_add   : {ms:7.3f} ms", flush=True)

    # dense comparison ops
    res2 = pt.lane_split_res(jnp.zeros_like(b) + 1.0)

    def iadd_dense(x, cip, rec2, qc, res2):
        return pt.interp_add(cip, rec2, qc, res2, x)

    ms = timed_loop(iadd_dense, jnp.zeros_like(b), coarse.cip,
                    s.levels[0].rec2, qc, res2)
    print(f"dense interp_add   : {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)

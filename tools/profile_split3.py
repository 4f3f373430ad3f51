"""Round-3 split-cycle breakdown at 4096^2 (TPU, differenced timing):
per-op costs of the two fused kernels, the split cycle entered at each
split level, and the dense tail."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
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
    conf = {"log": [], "kernels": {"backend": "pallas"},
            "solver": {"cycle": {"nrelax-pre": 1, "nrelax-post": 1},
                       "max-iter": 2, "tol": 1e-6}}
    s = Solver2(so, FivePt, Config(conf))
    nxp, W, _ = ps.split_dims(n, n)
    b2 = ps.lane_split(b, nxp, W)
    x20 = ps.lane_split(jnp.zeros_like(b), nxp, W)

    def split_cycle(x2, levels, b2):
        return cycle2.ncycle_split(levels, s.kinds, x2, b2, s.settings)[0]
    ms = timed_loop(split_cycle, x20, s.levels, b2)
    print(f"split cycle (L0)     : {ms:7.3f} ms", flush=True)

    def split_cycle_norm(x2, levels, b2):
        return cycle2.ncycle_split(levels, s.kinds, x2, b2, s.settings,
                                   fuse_final_residual=True)[0]
    ms = timed_loop(split_cycle_norm, x20, s.levels, b2)
    print(f"split cycle + norm   : {ms:7.3f} ms", flush=True)

    # per-level entry (clamped so small n degrades gracefully)
    tail_lvl = min(4, s.nlevels - 1)
    for lvl in range(1, tail_lvl):
        if not cycle2._split_ok_at(s.levels, lvl):
            break
        shp = s.levels[lvl].so.shape[1:]
        nxpl, Wl, _ = ps.split_dims(*shp)
        bl = jnp.zeros((2, nxpl, Wl), jnp.float32).at[0, nxpl//2, Wl//2].set(1.0)

        def enter(x2, levels, bl, lvl=lvl):
            return cycle2.ncycle_split(levels, s.kinds, x2, bl, s.settings,
                                       lvl=lvl)[0]
        ms = timed_loop(enter, jnp.zeros_like(bl), s.levels, bl)
        print(f"split cycle @L{lvl} {str(shp):14}: {ms:7.3f} ms", flush=True)

    # dense tail (level tail_lvl down)
    from cedar_tpu.solver.cycle2 import ncycle
    tail = s.levels[tail_lvl:]
    ti, tj = (d // 2 for d in tail[0].so.shape[1:])
    bt = jnp.zeros(tail[0].so.shape[1:], jnp.float32).at[ti, tj].set(1.0)
    def dense_tail(x, tail, bt):
        return ncycle(tail, s.kinds[tail_lvl:], 0, x, bt, s.settings)
    ms = timed_loop(dense_tail, jnp.zeros_like(bt), tail, bt)
    print(f"dense tail (L{tail_lvl}-)     : {ms:7.3f} ms", flush=True)

    # fused op costs at L0
    lev, coarse = s.levels[0], s.levels[1]
    kind = StencilKind.five_pt
    cshape = coarse.so.shape[1:]
    def swre(x2, so2, b2, cip):
        q, _, cb = pt.sweep_restrict_split(so2, x2, b2, cip, kind, "down",
                                           cshape, emit_res=False)
        return q
    ms = timed_loop(swre, x20, lev.so2, b2, coarse.cip)
    print(f"sweep+restrict L0    : {ms:7.3f} ms", flush=True)

    import numpy as np
    qc = jnp.asarray(np.random.default_rng(0).standard_normal(cshape),
                     jnp.float32)
    def isw(x2, cip, qc, so2, b2):
        return pt.interp_sweep_split(cip, qc, so2, b2, x2, kind, "down")
    ms = timed_loop(isw, x20, coarse.cip, qc, lev.so2, b2)
    print(f"interp+sweep L0      : {ms:7.3f} ms", flush=True)

    def iswn(x2, cip, qc, so2, b2):
        q, nrm = pt.interp_sweep_split(cip, qc, so2, b2, x2, kind, "down",
                                       fuse_norm=True)
        return q
    ms = timed_loop(iswn, x20, coarse.cip, qc, lev.so2, b2)
    print(f"interp+sweep+norm L0 : {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)

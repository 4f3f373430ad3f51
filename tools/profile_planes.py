"""Per-stage device-time profile of 3D plane relaxation (TPU).

Stages at 128^3 plane-xy (aniso): out-of-plane rhs, plane layout ops,
one vmapped embedded 2D line-xy cycle (one color batch), a full
plane_relax sweep, and the outer V(1,1)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from timing_util import timed_loop

from cedar_tpu import SevenPt, Solver3, gallery
from cedar_tpu.config import Config
from cedar_tpu.core.types import StencilKind
from cedar_tpu.ops import planes3


def main(n=128):
    so = gallery.diag_diffusion3(n, n, n, 1.0, 1.0, 1e-3, dtype=jnp.float32)
    b = gallery.poisson3_rhs(n, n, n, dtype=jnp.float32)
    conf = Config({"log": [], "solver": {
        "relaxation": "plane-xy",
        "cycle": {"nrelax-pre": 1, "nrelax-post": 1},
        "max-iter": 2, "tol": 1e-6}})
    s = Solver3(so, SevenPt, conf)
    lev = s.levels[0]
    kind = StencilKind.seven_pt
    z = jnp.zeros_like(b)
    st = s.settings

    ms = timed_loop(
        lambda q, so, b: b + planes3.out_of_plane_apply(so, q, kind, 2),
        z, lev.so, b, reps=(8, 40))
    print("out-of-plane rhs       : %7.3f ms" % ms, flush=True)

    ms = timed_loop(
        lambda q: planes3._set_planes(
            q, planes3._to_planes(q, 2)[0::2], 2, 0),
        z, reps=(8, 40))
    print("to/set planes pair     : %7.3f ms" % ms, flush=True)

    # one color's embedded batched 2D cycle
    hier = lev.planes["xy"]
    psettings = st.plane_settings
    kind2 = planes3.plane_kind2(kind)
    nlev2 = len(hier)
    kinds2 = [kind2] + [StencilKind.nine_pt] * (nlev2 - 1)
    vcycle2 = planes3._cached_cycle(kinds2, psettings)
    hier_c = jax.tree.map(lambda a: a[0::2], hier)
    b2 = planes3._to_planes(b, 2)[0::2]
    x2 = jnp.zeros_like(b2)

    ms = timed_loop(lambda x2, h, b2: vcycle2(h, x2, b2),
                    x2, hier_c, b2, reps=(4, 16))
    print("embedded 2D cycle x%-3d : %7.3f ms" % (b2.shape[0], ms),
          flush=True)

    ms = timed_loop(
        lambda q, b: planes3.plane_relax(lev, kind, q, b, "xy", "down", st),
        z, b, reps=(4, 16))
    print("plane_relax sweep      : %7.3f ms" % ms, flush=True)

    ms = timed_loop(
        lambda x, levels, b: s._cycle_impl(levels, x, b),
        z, s.levels, b, reps=(4, 16))
    print("V(1,1) plane-xy        : %7.3f ms  (%.0f MDOF/s)"
          % (ms, n ** 3 / ms / 1e3), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)

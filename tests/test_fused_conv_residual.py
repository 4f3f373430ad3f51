"""Solve-loop convergence residual fused into the last post-sweep.

With the Pallas backend, `_solve_impl` asks the final post-sweep to emit
the residual in the same HBM pass (cycle{2,3}.fuse_final_ok) instead of
running a separate residual op per iteration.  The solution and the
residual history must match the XLA backend (which computes the residual
the plain way).  Interpreter mode off-TPU.
"""

import numpy as np
import jax
import jax.numpy as jnp

from cedar_tpu import FivePt, SevenPt, Solver2, Solver3, gallery
from cedar_tpu.config import Config


def _on_tpu() -> bool:
    dd = jax.config.jax_default_device
    if dd is not None:
        return dd.platform == "tpu"
    return jax.default_backend() == "tpu"


ON_TPU = _on_tpu()


def test_fused_conv_residual_2d(monkeypatch):
    from cedar_tpu.ops import pallas2, pallas2_split, pallas_transfer2 as pt
    from cedar_tpu.solver import cycle2

    if not ON_TPU:
        monkeypatch.setattr(pallas2, "INTERPRET", True)
        monkeypatch.setattr(pallas2_split, "INTERPRET", True)
        monkeypatch.setattr(pt, "INTERPRET", True)
    n = 256
    so = jnp.asarray(np.asarray(gallery.poisson(n, n)), jnp.float32)
    b = jnp.asarray(np.asarray(gallery.poisson_rhs(n, n)), jnp.float32)
    conf = {"log": [], "solver": {"tol": 1e-5, "max-iter": 4}}

    s_xla = Solver2(so, FivePt, Config(dict(conf)))
    x_xla = s_xla.solve(b)

    pconf = dict(conf)
    pconf["kernels"] = {"backend": "pallas"}
    s_pal = Solver2(so, FivePt, Config(pconf))
    assert cycle2.fuse_final_ok(
        s_pal.levels, s_pal.kinds, b.shape, b.dtype, s_pal.settings,
        s_pal.periodic, None,
    )
    x_pal = s_pal.solve(b)

    np.testing.assert_allclose(np.asarray(x_xla), np.asarray(x_pal),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_xla.history),
                               np.asarray(s_pal.history), rtol=1e-3)


def test_fused_conv_residual_3d(monkeypatch):
    from cedar_tpu.ops import pallas3, pallas_transfer3 as pt3
    from cedar_tpu.solver import cycle3

    if not ON_TPU:
        monkeypatch.setattr(pallas3, "INTERPRET", True)
        monkeypatch.setattr(pt3, "INTERPRET", True)
    n = 32
    so = jnp.asarray(np.asarray(gallery.poisson3(n, n, n)), jnp.float32)
    b = jnp.asarray(np.asarray(gallery.poisson3_rhs(n, n, n)), jnp.float32)
    conf = {"log": [], "solver": {"tol": 1e-5, "max-iter": 3}}

    s_xla = Solver3(so, SevenPt, Config(dict(conf)))
    x_xla = s_xla.solve(b)

    pconf = dict(conf)
    pconf["kernels"] = {"backend": "pallas"}
    s_pal = Solver3(so, SevenPt, Config(pconf))
    assert cycle3.fuse_final_ok(
        s_pal.levels, s_pal.kinds, b.shape, b.dtype, s_pal.settings,
        s_pal.periodic, None,
    )
    x_pal = s_pal.solve(b)

    np.testing.assert_allclose(np.asarray(x_xla), np.asarray(x_pal),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_xla.history),
                               np.asarray(s_pal.history), rtol=1e-3)

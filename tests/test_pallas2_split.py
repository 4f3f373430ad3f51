"""Lane-parity-resident 2D kernels vs the dense Pallas / XLA paths.

The split sweep must match the dense sweep on the merged arrays (same
term order by construction); the split interp_add must match the hybrid
interp_add + merge.  Interpreter mode off-TPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cedar_tpu.core.types import StencilKind
from cedar_tpu.ops import pallas2, pallas2_split
from cedar_tpu.ops.relax2 import point_relax as relax_xla, setup_recip
from cedar_tpu.ops.stencil2 import residual


def _on_tpu() -> bool:
    dd = jax.config.jax_default_device
    if dd is not None:
        return dd.platform == "tpu"
    return jax.default_backend() == "tpu"


ON_TPU = _on_tpu()


def _random_problem(rng, n, nine):
    from test_kernels_2d import random_so

    so = jnp.asarray(random_so(rng, n, n, nine), jnp.float32)
    q = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    return so, q, b


@pytest.mark.parametrize("nine", [False, True])
@pytest.mark.parametrize("updown", ["down", "up"])
def test_split_sweep_matches_xla(nine, updown, monkeypatch):
    if not ON_TPU:
        monkeypatch.setattr(pallas2_split, "INTERPRET", True)
    n = 1024 if ON_TPU else 256
    rng = np.random.default_rng(11 + nine)
    so, q, b = _random_problem(rng, n, nine)
    kind = StencilKind.nine_pt if nine else StencilKind.five_pt
    assert pallas2_split.supported(q.shape, q.dtype, kind)
    nxp, W, _ = pallas2_split.split_dims(n, n)
    so2 = pallas2_split.split_so(so, kind, nxp, W)
    q2 = pallas2_split.lane_split(q, nxp, W)
    b2 = pallas2_split.lane_split(b, nxp, W)
    rec = setup_recip(so)

    ref = relax_xla(so, q, b, rec, kind, updown)
    got2 = pallas2_split.point_relax_split(so2, q2, b2, kind, updown)
    got = pallas2_split.lane_merge(got2, n, n)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-5)

    got2r, res2 = pallas2_split.point_relax_split(
        so2, q2, b2, kind, updown, fuse_residual=True
    )
    np.testing.assert_allclose(
        np.asarray(ref),
        np.asarray(pallas2_split.lane_merge(got2r, n, n)), atol=1e-5,
    )
    ref_res = residual(so, ref, b, kind)
    np.testing.assert_allclose(
        np.asarray(ref_res),
        np.asarray(pallas2_split.lane_merge(res2, n, n)), atol=1e-4,
    )


@pytest.mark.parametrize("nine", [False, True])
def test_split_sweep_matches_dense_pallas(nine, monkeypatch):
    """Same term order as the dense Pallas kernel; agreement to the ULP
    level (the compiler's FMA contraction may differ between the two
    layouts — measured max |Δ| 2.4e-7 at 256² interpret)."""
    if not ON_TPU:
        monkeypatch.setattr(pallas2, "INTERPRET", True)
        monkeypatch.setattr(pallas2_split, "INTERPRET", True)
    n = 1024 if ON_TPU else 256
    rng = np.random.default_rng(5 + nine)
    so, q, b = _random_problem(rng, n, nine)
    kind = StencilKind.nine_pt if nine else StencilKind.five_pt
    nxp, W, _ = pallas2_split.split_dims(n, n)
    so2 = pallas2_split.split_so(so, kind, nxp, W)
    q2 = pallas2_split.lane_split(q, nxp, W)
    b2 = pallas2_split.lane_split(b, nxp, W)

    dense = pallas2.point_relax(so, q, b, None, kind, "down")
    split = pallas2_split.lane_merge(
        pallas2_split.point_relax_split(so2, q2, b2, kind, "down"), n, n
    )
    np.testing.assert_allclose(
        np.asarray(dense), np.asarray(split), atol=2e-6
    )


def test_solver_split_resident_path_matches_xla(monkeypatch):
    """End-to-end: Solver2 with the pallas backend takes the fine-level
    split-resident cycle (so2 built, fine_split_ok true) and matches the
    XLA-backend solve and history."""
    from cedar_tpu import FivePt, Solver2, gallery
    from cedar_tpu.config import Config
    from cedar_tpu.ops import pallas_transfer2 as pt
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
    assert s_xla.levels[0].so2 is None
    x_xla = s_xla.solve(b)

    pconf = dict(conf)
    pconf["kernels"] = {"backend": "pallas", "fine-split": True}
    s_pal = Solver2(so, FivePt, Config(pconf))
    assert s_pal.levels[0].so2 is not None
    assert cycle2.fine_split_ok(s_pal.levels, s_pal.settings, None)
    x_pal = s_pal.solve(b)

    np.testing.assert_allclose(
        np.asarray(x_xla), np.asarray(x_pal), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(s_xla.history), np.asarray(s_pal.history),
        rtol=1e-3,
    )
    # the standalone-cycle entry (run_cycle) also matches
    v_xla = s_xla.vcycle(jnp.zeros_like(b), b)
    v_pal = s_pal.vcycle(jnp.zeros_like(b), b)
    np.testing.assert_allclose(
        np.asarray(v_xla), np.asarray(v_pal), atol=1e-5
    )


def test_split_levels_2_solver_equivalence(monkeypatch):
    """kernels.split-levels 2: the L1-split-resident cycle must match the
    XLA backend solve."""
    import numpy as np
    from cedar_tpu import FivePt, Solver2, gallery
    from cedar_tpu.config import Config
    from cedar_tpu.ops import pallas2, pallas2_split, pallas_transfer2

    if not ON_TPU:
        monkeypatch.setattr(pallas2, "INTERPRET", True)
        monkeypatch.setattr(pallas2_split, "INTERPRET", True)
        monkeypatch.setattr(pallas_transfer2, "INTERPRET", True)
    n = 256
    so = jnp.asarray(np.asarray(gallery.poisson(n, n)), jnp.float32)
    b = jnp.asarray(np.asarray(gallery.poisson_rhs(n, n)), jnp.float32)
    conf = {"log": [], "solver": {"tol": 1e-5, "max-iter": 4}}

    s_xla = Solver2(so, FivePt, Config(dict(conf)))
    x_xla = s_xla.solve(b)

    pconf = dict(conf)
    pconf["kernels"] = {"backend": "pallas", "split-levels": 2}
    s_pal = Solver2(so, FivePt, Config(pconf))
    assert s_pal.levels[1].so2 is not None
    x_pal = s_pal.solve(b)

    np.testing.assert_allclose(np.asarray(x_xla), np.asarray(x_pal),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(s_xla.history),
                               np.asarray(s_pal.history), rtol=1e-3)


def test_fcycle_split_path_matches_xla(monkeypatch):
    """F-cycle with the pallas backend: per-level split-resident
    correction cycles + the no-residual level-entry interpolation
    (interp_split_nores) match the XLA-backend F-cycle."""
    import jax

    from cedar_tpu import FivePt, Solver2, gallery
    from cedar_tpu.config import Config

    dd = jax.config.jax_default_device
    on_tpu = (dd.platform == "tpu" if dd is not None
              else jax.default_backend() == "tpu")
    if not on_tpu:
        from cedar_tpu.ops import pallas2, pallas_lines2, pallas_transfer2

        monkeypatch.setattr(pallas2, "INTERPRET", True)
        monkeypatch.setattr(pallas2_split, "INTERPRET", True)
        monkeypatch.setattr(pallas_transfer2, "INTERPRET", True)
        monkeypatch.setattr(pallas_lines2, "INTERPRET", True)

    n = 256
    so = jnp.asarray(np.asarray(gallery.poisson(n, n)), jnp.float32)
    b = jnp.asarray(np.asarray(gallery.poisson_rhs(n, n)), jnp.float32)
    conf = {"log": [], "solver": {"cycle": {"type": "f"}, "tol": 1e-5,
                                  "max-iter": 3}}
    s_xla = Solver2(so, FivePt, Config({**conf,
                                        "kernels": {"backend": "xla"}}))
    x_xla = s_xla.solve(b)
    s_pal = Solver2(so, FivePt, Config({**conf,
                                        "kernels": {"backend": "pallas"}}))
    assert s_pal.levels[0].so2 is not None
    x_pal = s_pal.solve(b)
    np.testing.assert_allclose(np.asarray(x_xla), np.asarray(x_pal),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(s_xla.history),
                               np.asarray(s_pal.history), rtol=1e-3)

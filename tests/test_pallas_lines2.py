"""Fused Pallas zebra line sweeps == the XLA lines2 path (interpret)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cedar_tpu.core.types import StencilKind
from cedar_tpu.ops import lines2, pallas_lines2 as pla


def _on_tpu() -> bool:
    dd = jax.config.jax_default_device
    if dd is not None:
        return dd.platform == "tpu"
    return jax.default_backend() == "tpu"


ON_TPU = _on_tpu()


def _problem(rng, nx, ny, nine):
    from test_kernels_2d import random_so

    so = jnp.asarray(random_so(rng, nx, ny, nine), jnp.float32)
    q = jnp.asarray(rng.standard_normal((nx, ny)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((nx, ny)), jnp.float32)
    return so, q, b


@pytest.mark.parametrize("nine", [False, True])
@pytest.mark.parametrize("updown", ["down", "up"])
@pytest.mark.parametrize("shape", [(32, 128), (40, 130), (37, 256)])
def test_fused_line_x_matches_xla(nine, updown, shape, monkeypatch):
    if not ON_TPU:
        monkeypatch.setattr(pla, "INTERPRET", True)
    nx, ny = shape
    kind = StencilKind.nine_pt if nine else StencilKind.five_pt
    rng = np.random.default_rng(11 + nine + nx)
    so, q, b = _problem(rng, nx, ny, nine)
    assert pla.supported((nx, ny), jnp.float32, kind)

    sor = lines2.setup_lines(so, kind, "x")
    ref = lines2.line_relax_x(so, q, b, sor, kind, updown)
    got = pla.line_relax_x(so, q, b, kind, updown)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("nine", [False, True])
def test_fused_line_y_matches_xla(nine, monkeypatch):
    if not ON_TPU:
        monkeypatch.setattr(pla, "INTERPRET", True)
    nx, ny = 130, 40
    kind = StencilKind.nine_pt if nine else StencilKind.five_pt
    rng = np.random.default_rng(5 + nine)
    so, q, b = _problem(rng, nx, ny, nine)

    sor = lines2.setup_lines(so, kind, "y")
    ref = lines2.line_relax_y(so, q, b, sor, kind, "down")
    got = pla.line_relax_y(so, q, b, kind, "down")
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               atol=2e-4, rtol=1e-4)


def test_solver_in_vmem_matches_direct():
    """The PCR->Thomas hybrid == scipy banded solve, f32, many lanes."""
    import scipy.linalg

    rng = np.random.default_rng(7)
    n, nb = 100, 8
    lo = rng.standard_normal((n, nb)).astype(np.float32) * 0.3
    up = rng.standard_normal((n, nb)).astype(np.float32) * 0.3
    dg = 2.0 + rng.random((n, nb)).astype(np.float32)
    lo[0] = 0.0
    up[-1] = 0.0
    r = rng.standard_normal((n, nb)).astype(np.float32)
    got = np.asarray(pla._solve_all_lines(
        jnp.asarray(lo), jnp.asarray(dg), jnp.asarray(up), jnp.asarray(r)))
    for j in range(nb):
        ab = np.zeros((3, n))
        ab[0, 1:] = up[:-1, j]
        ab[1] = dg[:, j]
        ab[2, :-1] = lo[1:, j]
        x = scipy.linalg.solve_banded((1, 1), ab, r[:, j])
        np.testing.assert_allclose(got[:, j], x, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("relax", ["line-x", "line-xy"])
def test_line_solver_backend_equivalence(relax, monkeypatch):
    """Full line-relax solve, pallas backend == xla backend."""
    from cedar_tpu import FivePt, Solver2, gallery
    from cedar_tpu.config import Config

    if not ON_TPU:
        from cedar_tpu.ops import pallas_planes2
        monkeypatch.setattr(pla, "INTERPRET", True)
        monkeypatch.setattr(pallas_planes2, "INTERPRET", True)
    n = 64
    so = gallery.diag_diffusion(n, n, 1.0, 0.01, dtype=jnp.float32)
    b = gallery.poisson_rhs(n, n, dtype=jnp.float32)
    conf = {"log": [], "solver": {
        "relaxation": relax, "tol": 1e-5, "max-iter": 3}}

    s_xla = Solver2(so, FivePt, Config(dict(conf)))
    x_xla = s_xla.solve(b)

    pconf = dict(conf)
    pconf["kernels"] = {"backend": "pallas"}
    s_pal = Solver2(so, FivePt, Config(pconf))
    x_pal = s_pal.solve(b)

    # different (algebraically equivalent) tridiagonal algorithms: f32
    # rounding differs and compounds over the 3 cycles
    np.testing.assert_allclose(np.asarray(x_xla), np.asarray(x_pal),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(s_xla.history),
                               np.asarray(s_pal.history), rtol=3e-2)


@pytest.mark.parametrize("ny", [16, 13])
def test_fused_lines_vmap_flattens(ny, monkeypatch):
    """vmapped fused line sweeps (the plane-relax batch path) flatten the
    batch into lanes; zebra parity must stay plane-local (odd ny!)."""
    if not ON_TPU:
        monkeypatch.setattr(pla, "INTERPRET", True)
    B, nx = 5, 24
    rng = np.random.default_rng(17 + ny)
    from test_kernels_2d import random_so

    sos = jnp.asarray(
        np.stack([random_so(rng, nx, ny, False) for _ in range(B)]),
        jnp.float32)
    qs = jnp.asarray(rng.standard_normal((B, nx, ny)), jnp.float32)
    bs = jnp.asarray(rng.standard_normal((B, nx, ny)), jnp.float32)
    kind = StencilKind.five_pt
    got = jax.vmap(
        lambda so, q, b: pla.line_relax_x(so, q, b, kind, "down")
    )(sos, qs, bs)
    for i in range(B):
        sor = lines2.setup_lines(sos[i], kind, "x")
        ref = lines2.line_relax_x(sos[i], qs[i], bs[i], sor, kind, "down")
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got[i]),
                                   atol=2e-4, rtol=1e-4)

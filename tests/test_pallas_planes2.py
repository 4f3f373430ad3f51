"""Fused batched line-xy smooth == composed XLA zebra sweeps (interpret)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from cedar_tpu.core.types import StencilKind
from cedar_tpu.ops import lines2, pallas_lines2 as lines2_pla, pallas_planes2 as pp


def _on_tpu() -> bool:
    dd = jax.config.jax_default_device
    if dd is not None:
        return dd.platform == "tpu"
    return jax.default_backend() == "tpu"


ON_TPU = _on_tpu()


def _ref_smooth(so, q, b, kind, updown):
    sx = lines2.setup_lines(so, kind, "x")
    sy = lines2.setup_lines(so, kind, "y")
    if updown == "down":
        q = lines2.line_relax_x(so, q, b, sx, kind, updown)
        return lines2.line_relax_y(so, q, b, sy, kind, updown)
    q = lines2.line_relax_y(so, q, b, sy, kind, updown)
    return lines2.line_relax_x(so, q, b, sx, kind, updown)


@pytest.mark.parametrize("nine", [False, True])
@pytest.mark.parametrize("updown", ["down", "up"])
@pytest.mark.parametrize("shape", [(32, 128), (31, 130)])
def test_fused_smooth_matches_composed(nine, updown, shape, monkeypatch):
    if not ON_TPU:
        monkeypatch.setattr(pp, "INTERPRET", True)
        monkeypatch.setattr(lines2_pla, "INTERPRET", True)
    from test_kernels_2d import random_so

    nx, ny = shape
    kind = StencilKind.nine_pt if nine else StencilKind.five_pt
    rng = np.random.default_rng(41 + nine + nx)
    so = jnp.asarray(random_so(rng, nx, ny, nine), jnp.float32)
    q = jnp.asarray(rng.standard_normal((nx, ny)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((nx, ny)), jnp.float32)
    assert pp.supported((nx, ny), jnp.float32, kind)

    ref = _ref_smooth(so, q, b, kind, updown)
    got = pp.line_xy_smooth(so, q, b, kind, updown)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               atol=3e-4, rtol=3e-4)


def test_fused_smooth_vmapped(monkeypatch):
    if not ON_TPU:
        monkeypatch.setattr(pp, "INTERPRET", True)
        monkeypatch.setattr(lines2_pla, "INTERPRET", True)
    from test_kernels_2d import random_so

    B, nx, ny = 4, 24, 21
    kind = StencilKind.five_pt
    rng = np.random.default_rng(43)
    sos = jnp.asarray(
        np.stack([random_so(rng, nx, ny, False) for _ in range(B)]),
        jnp.float32)
    qs = jnp.asarray(rng.standard_normal((B, nx, ny)), jnp.float32)
    bs = jnp.asarray(rng.standard_normal((B, nx, ny)), jnp.float32)
    got = jax.vmap(
        lambda so, q, b: pp.line_xy_smooth(so, q, b, kind, "down")
    )(sos, qs, bs)
    for i in range(B):
        ref = _ref_smooth(sos[i], qs[i], bs[i], kind, "down")
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got[i]),
                                   atol=3e-4, rtol=3e-4)


@pytest.mark.parametrize("nine", [False, True])
@pytest.mark.parametrize("updown", ["down", "up"])
def test_nsmooth_res_matches_composed(nine, updown, monkeypatch):
    """nsweeps fused smooths + residual == composed sweeps + XLA residual
    (and the x-parity-split y-solve matches the masked formulation)."""
    if not ON_TPU:
        monkeypatch.setattr(pp, "INTERPRET", True)
        monkeypatch.setattr(lines2_pla, "INTERPRET", True)
    from test_kernels_2d import random_so
    from cedar_tpu.ops.stencil2 import residual

    nx, ny = 32, 128
    kind = StencilKind.nine_pt if nine else StencilKind.five_pt
    rng = np.random.default_rng(57 + nine)
    so = jnp.asarray(random_so(rng, nx, ny, nine), jnp.float32)
    q = jnp.asarray(rng.standard_normal((nx, ny)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((nx, ny)), jnp.float32)

    ref = q
    for _ in range(2):
        ref = _ref_smooth(so, ref, b, kind, updown)
    rres = residual(so, ref, b, kind)

    # batched path (vmapped over a size-3 batch of identical problems)
    got, gres = jax.vmap(
        lambda so_, q_, b_: pp.line_xy_nsmooth_res(so_, q_, b_, kind,
                                                   updown, 2)
    )(jnp.stack([so] * 3), jnp.stack([q] * 3), jnp.stack([b] * 3))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got[1]),
                               atol=3e-4, rtol=3e-4)
    np.testing.assert_allclose(np.asarray(rres), np.asarray(gres[1]),
                               atol=3e-4, rtol=3e-4)

    # unbatched fallback
    got1, res1 = pp.line_xy_nsmooth_res(so, q, b, kind, updown, 2)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got1),
                               atol=3e-4, rtol=3e-4)
    np.testing.assert_allclose(np.asarray(rres), np.asarray(res1),
                               atol=3e-4, rtol=3e-4)

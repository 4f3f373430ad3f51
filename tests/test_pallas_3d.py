"""3D Pallas sweep kernel vs the XLA reference path (TPU or interpreter)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cedar_tpu.core.types import StencilKind
from cedar_tpu.ops import pallas3
from cedar_tpu.ops.relax3 import point_relax as relax_xla, setup_recip
from cedar_tpu.ops.stencil3 import residual


def _on_tpu() -> bool:
    dd = jax.config.jax_default_device
    if dd is not None:
        return dd.platform == "tpu"
    return jax.default_backend() == "tpu"


ON_TPU = _on_tpu()


@pytest.mark.parametrize("updown", ["down", "up"])
def test_pallas3_sweep_matches_xla(updown, monkeypatch):
    if not ON_TPU:
        monkeypatch.setattr(pallas3, "INTERPRET", True)
    n = (64, 64, 128) if ON_TPU else (24, 32, 128)
    rng = np.random.default_rng(7)
    from test_kernels_3d import random_so

    so = jnp.asarray(random_so(rng, *n, False), jnp.float32)
    q = jnp.asarray(rng.standard_normal(n), jnp.float32)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    kind = StencilKind.seven_pt
    assert pallas3.supported(q.shape, q.dtype, kind)
    rec = setup_recip(so)

    ref = relax_xla(so, q, b, rec, kind, updown)
    got = pallas3.point_relax(so, q, b, rec, updown)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-5)

    got2, res2 = pallas3.point_relax(so, q, b, rec, updown,
                                     fuse_residual=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got2), atol=1e-5)
    ref_res = residual(so, ref, b, kind)
    np.testing.assert_allclose(
        np.asarray(ref_res), np.asarray(res2), atol=1e-4)


def test_supported_gates():
    f32 = jnp.float32
    seven = StencilKind.seven_pt
    tsp = StencilKind.twenty_seven_pt
    assert pallas3.supported((256, 256, 256), f32, seven)
    assert not pallas3.supported((256, 256, 256), f32, tsp)
    assert not pallas3.supported((256, 256, 255), f32, seven)  # lanes
    assert not pallas3.supported((256, 255, 256), f32, seven)  # sublanes
    assert not pallas3.supported((256, 256, 256), jnp.float64, seven)

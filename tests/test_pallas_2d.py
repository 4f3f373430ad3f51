"""Pallas sweep kernel vs the XLA reference path.

Runs on a real TPU when one is the default backend; otherwise exercises the
kernel in Pallas interpreter mode at a reduced size.  The kernel must match
the XLA path bit-for-bit (same FMA structure by construction).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cedar_tpu.core.types import StencilKind
from cedar_tpu.ops import pallas2
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
def test_pallas_sweep_matches_xla(nine, updown, monkeypatch):
    if not ON_TPU:
        monkeypatch.setattr(pallas2, "INTERPRET", True)
    n = 1024 if ON_TPU else 256
    rng = np.random.default_rng(3 + nine)
    so, q, b = _random_problem(rng, n, nine)
    kind = StencilKind.nine_pt if nine else StencilKind.five_pt
    assert pallas2.supported(q.shape, q.dtype, kind)
    rec = setup_recip(so)

    ref = relax_xla(so, q, b, rec, kind, updown)
    got = pallas2.point_relax(so, q, b, rec, kind, updown)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(got), atol=1e-5
    )

    got2, res2 = pallas2.point_relax(
        so, q, b, rec, kind, updown, fuse_residual=True
    )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got2), atol=1e-5)
    ref_res = residual(so, ref, b, kind)
    np.testing.assert_allclose(
        np.asarray(ref_res), np.asarray(res2), atol=1e-4
    )


def test_supported_gates():
    f32 = jnp.float32
    five = StencilKind.five_pt
    nine = StencilKind.nine_pt
    assert pallas2.supported((4096, 4096), f32, five)
    assert pallas2.supported((2048, 2048), f32, nine)
    # unaligned shapes are padded up and stay supported
    assert pallas2.supported((2049, 2048), f32, five)
    assert pallas2.supported((400, 400), f32, five)
    assert pallas2.supported((4096, 4096), f32, nine)
    # beyond the lane budget (scoped-vmem for one slab's phases)
    assert not pallas2.supported((4096, 8192), f32, five)
    assert not pallas2.supported((4096, 4096), jnp.float64, five)
    assert not pallas2.supported((64, 128), f32, five)     # too small


def test_padded_dispatch_matches_xla():
    """Unaligned shapes run the kernel through the inert-pad wrapper."""
    if not ON_TPU:
        pytest.skip("padded dispatch covered on TPU only")
    rng = np.random.default_rng(9)
    n = (401, 387)
    from test_kernels_2d import random_so

    so = jnp.asarray(random_so(rng, *n, True), jnp.float32)
    q = jnp.asarray(rng.standard_normal(n), jnp.float32)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    rec = setup_recip(so)
    kind = StencilKind.nine_pt
    ref = relax_xla(so, q, b, rec, kind, "down")
    got = pallas2.point_relax(so, q, b, rec, kind, "down")
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-5)

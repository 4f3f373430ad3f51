"""3D Pallas restriction kernel vs the XLA path.

The kernel must reproduce ops.interp3.restrict exactly (same offset
order) including padded odd shapes.  Interpreter mode on CPU.
(interp_add has no Pallas variant — measured slower than XLA, see the
module docstring of cedar_tpu/ops/pallas_transfer3.py.)
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cedar_tpu.core.types import StencilKind
from cedar_tpu.ops import pallas_transfer3 as pt
from cedar_tpu.ops.interp3 import restrict as restrict_xla, setup_interp


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pt, "INTERPRET", True)


@pytest.mark.parametrize(
    "ts,nx,ny,nz",
    [(False, 64, 48, 256), (True, 32, 32, 256), (False, 64, 64, 512)],
)
def test_restrict3_kernel_matches_xla(ts, nx, ny, nz):
    from test_kernels_3d import random_so

    rng = np.random.default_rng(17 + nx + nz)
    so = jnp.asarray(random_so(rng, nx, ny, nz, ts), jnp.float32)
    kind = StencilKind.twenty_seven_pt if ts else StencilKind.seven_pt
    ci = setup_interp(so, kind)
    nc = tuple((n - 1) // 2 + 1 for n in (nx, ny, nz))
    res = jnp.asarray(rng.standard_normal((nx, ny, nz)), jnp.float32)

    pw3 = pt.setup_pw3(ci, (nx, ny, nz))
    res4 = pt.split_res(res)

    ref = restrict_xla(ci, res)
    got = pt.restrict(pw3, res4, nc)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(got), rtol=3e-5, atol=3e-5
    )


def test_supported3_gates():
    f32 = jnp.float32
    assert pt.supported((256, 256, 256), f32)
    # ragged shapes (split too costly) and small grids stay on XLA
    assert not pt.supported((257, 257, 257), f32)
    assert not pt.supported((128, 128, 128), f32)
    assert not pt.supported((256, 256, 256), jnp.float64)

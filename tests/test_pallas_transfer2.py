"""Hybrid Pallas transfer kernels (restrict/interp_add) vs the XLA path.

The kernels must reproduce ops.interp2.restrict / interp_add exactly
(same term order, so bit-exact in practice) including padded odd shapes
and the high-edge CI column.  Interpreter mode on CPU.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cedar_tpu.core.types import StencilKind
from cedar_tpu.ops import pallas_transfer2 as pt
from cedar_tpu.ops.interp2 import (
    interp_add as interp_xla,
    restrict as restrict_xla,
    setup_interp,
)


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pt, "INTERPRET", True)


@pytest.mark.parametrize(
    "nine,nx,ny",
    [(False, 256, 256), (True, 129, 257), (False, 200, 300),
     (True, 256, 384)],
)
def test_transfer_kernels_match_xla(nine, nx, ny):
    from test_kernels_2d import random_so

    rng = np.random.default_rng(17 + nx)
    so = jnp.asarray(random_so(rng, nx, ny, nine), jnp.float32)
    kind = StencilKind.nine_pt if nine else StencilKind.five_pt
    ci = setup_interp(so, kind)
    nxc, nyc = (nx - 1) // 2 + 1, (ny - 1) // 2 + 1
    res = jnp.asarray(rng.standard_normal((nx, ny)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((nx, ny)), jnp.float32)
    qc = jnp.asarray(rng.standard_normal((nxc, nyc)), jnp.float32)

    assert pt.supported((nx, ny), jnp.float32)
    cip = pt.pad_ci(ci, nx, ny)
    rec2 = pt.setup_rec2(so)
    res2 = pt.lane_split_res(res)

    # tight-allclose, not bit-equal: interpreter-mode pallas may execute on
    # a different backend (TPU) than the pinned-CPU XLA reference, giving
    # 1-2 ulp FMA differences; same-device runs are bit-exact (verified on
    # TPU and CPU-only)
    ref = restrict_xla(ci, res)
    got = pt.restrict(cip, res2, (nxc, nyc))
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(got), rtol=3e-6, atol=3e-6
    )

    ref = interp_xla(ci, so, qc, res, q)
    got = pt.interp_add(cip, rec2, qc, res2, q)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(got), rtol=3e-6, atol=3e-6
    )


def test_supported_gates():
    f32 = jnp.float32
    assert pt.supported((4096, 4096), f32)
    assert pt.supported((400, 400), f32)
    assert not pt.supported((64, 128), f32)          # too few rows
    assert not pt.supported((4096, 4096), jnp.float64)
    assert not pt.supported((4096, 16384), f32)      # beyond lane budget


@pytest.mark.parametrize("nine,nx,ny", [(False, 256, 256), (True, 256, 384)])
def test_interp_add_split_matches_dense(nine, nx, ny, monkeypatch):
    """Split-layout interp_add (in-kernel sublane interleave onto the
    lane-parity-split q) equals the dense hybrid path + merge."""
    from cedar_tpu.ops import pallas2_split as ps

    monkeypatch.setattr(ps, "INTERPRET", True)
    from test_kernels_2d import random_so

    rng = np.random.default_rng(23 + nx)
    so = jnp.asarray(random_so(rng, nx, ny, nine), jnp.float32)
    kind = StencilKind.nine_pt if nine else StencilKind.five_pt
    ci = setup_interp(so, kind)
    nxc, nyc = (nx - 1) // 2 + 1, (ny - 1) // 2 + 1
    res = jnp.asarray(rng.standard_normal((nx, ny)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((nx, ny)), jnp.float32)
    qc = jnp.asarray(rng.standard_normal((nxc, nyc)), jnp.float32)

    cip = pt.pad_ci(ci, nx, ny)
    rec2 = pt.setup_rec2(so)
    res2 = pt.lane_split_res(res)
    nxp, W = res2.shape[1], res2.shape[2]
    q2 = ps.lane_split(q, nxp, W)

    ref = pt.interp_add(cip, rec2, qc, res2, q)
    got2 = pt.interp_add_split(cip, rec2, qc, res2, q2)
    got = ps.lane_merge(got2, nx, ny)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(got), rtol=3e-6, atol=3e-6
    )


@pytest.mark.parametrize("nine,nx,ny", [(False, 256, 256), (True, 256, 384)])
@pytest.mark.parametrize("updown", ["down", "up"])
@pytest.mark.parametrize("fuse_res", [False, True])
def test_interp_sweep_split_matches_separate(nine, nx, ny, updown, fuse_res,
                                             monkeypatch):
    """The fused interp_add + post-sweep kernel agrees at ULP level with
    interp_add_split followed by point_relax_split (incl. the fused
    convergence residual) — the in-kernel residual recompute changes
    compiler FMA contraction, so the check is allclose, not bit-equal."""
    from cedar_tpu.ops import pallas2_split as ps

    monkeypatch.setattr(ps, "INTERPRET", True)
    from test_kernels_2d import random_so

    rng = np.random.default_rng(29 + nx + nine)
    so = jnp.asarray(random_so(rng, nx, ny, nine), jnp.float32)
    kind = StencilKind.nine_pt if nine else StencilKind.five_pt
    ci = setup_interp(so, kind)
    nxc, nyc = (nx - 1) // 2 + 1, (ny - 1) // 2 + 1
    q0 = jnp.asarray(rng.standard_normal((nx, ny)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((nx, ny)), jnp.float32)
    qc = jnp.asarray(rng.standard_normal((nxc, nyc)), jnp.float32)

    cip = pt.pad_ci(ci, nx, ny)
    rec2 = pt.setup_rec2(so)
    nxp, W, _ = ps.split_dims(nx, ny)
    so2 = ps.split_so(so, kind, nxp, W)
    b2 = ps.lane_split(b, nxp, W)

    # the fused kernel recomputes the residual of the incoming q
    # in-kernel: establish the cycle invariant (q2 is a smoothed iterate,
    # res2 its fused residual) and compare against the separate path
    q2, res2 = ps.point_relax_split(so2, ps.lane_split(q0, nxp, W), b2,
                                    kind, "down", fuse_residual=True)

    mid = pt.interp_add_split(cip, rec2, qc, res2, q2)
    ref = ps.point_relax_split(so2, mid, b2, kind, updown,
                               fuse_residual=fuse_res)
    got = pt.interp_sweep_split(cip, qc, so2, b2, q2, kind, updown,
                                fuse_residual=fuse_res)
    # ULP-level tolerance: the fused kernel recomputes the residual
    # in-kernel; the enclosing graph differs from the separate path's, so
    # XLA's fusion/contraction choices may differ at the last bit
    kw = dict(rtol=1e-5, atol=5e-6)
    if fuse_res:
        np.testing.assert_allclose(np.asarray(ref[0]), np.asarray(got[0]),
                                   **kw)
        np.testing.assert_allclose(np.asarray(ref[1]), np.asarray(got[1]),
                                   **kw)
        # fuse_norm: per-block partial sums of res² match the full
        # residual's squared l2 norm
        _, partials = pt.interp_sweep_split(cip, qc, so2, b2, q2, kind,
                                            updown, fuse_norm=True)
        np.testing.assert_allclose(
            float(jnp.sum(partials)),
            float(jnp.sum(ref[1] * ref[1])),
            rtol=1e-5,
        )
    else:
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got), **kw)


@pytest.mark.parametrize("nine,nx,ny", [(False, 256, 256), (True, 256, 384)])
def test_sweep_restrict_split_matches_separate(nine, nx, ny, monkeypatch):
    """The fused pre-sweep + residual + restrict kernel is bit-identical
    to point_relax_split(fuse_residual=True) followed by restrict."""
    from cedar_tpu.ops import pallas2_split as ps

    monkeypatch.setattr(ps, "INTERPRET", True)
    from test_kernels_2d import random_so

    rng = np.random.default_rng(31 + nx + nine)
    so = jnp.asarray(random_so(rng, nx, ny, nine), jnp.float32)
    kind = StencilKind.nine_pt if nine else StencilKind.five_pt
    ci = setup_interp(so, kind)
    nc = ((nx - 1) // 2 + 1, (ny - 1) // 2 + 1)
    q = jnp.asarray(rng.standard_normal((nx, ny)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((nx, ny)), jnp.float32)

    cip = pt.pad_ci(ci, nx, ny)
    nxp, W, _ = ps.split_dims(nx, ny)
    so2 = ps.split_so(so, kind, nxp, W)
    q2 = ps.lane_split(q, nxp, W)
    b2 = ps.lane_split(b, nxp, W)

    ref_q, ref_r = ps.point_relax_split(so2, q2, b2, kind, "down",
                                        fuse_residual=True)
    ref_cb = pt.restrict(cip, ref_r, nc)
    got_q, got_r, got_cb = pt.sweep_restrict_split(
        so2, q2, b2, cip, kind, "down", nc
    )
    np.testing.assert_array_equal(np.asarray(ref_q), np.asarray(got_q))
    np.testing.assert_array_equal(np.asarray(ref_r), np.asarray(got_r))
    np.testing.assert_array_equal(np.asarray(ref_cb), np.asarray(got_cb))

    # emit_res=False (the default-cycle configuration): the residual is
    # never written; q and the coarse rhs are unchanged
    nr_q, nr_r, nr_cb = pt.sweep_restrict_split(
        so2, q2, b2, cip, kind, "down", nc, emit_res=False
    )
    assert nr_r is None
    np.testing.assert_array_equal(np.asarray(ref_q), np.asarray(nr_q))
    np.testing.assert_array_equal(np.asarray(ref_cb), np.asarray(nr_cb))

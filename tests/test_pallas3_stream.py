"""Streaming (wavefront) 3D sweep (ops.pallas3_stream) vs the XLA path.

Interpret-mode on CPU; the wavefront schedule must reproduce the masked
full-grid sweep row-for-row (phase s of row r sees exactly the
phase-(s-1) state of its neighbors)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cedar_tpu.core.types import StencilKind
from cedar_tpu.ops import pallas3_split as p3s
from cedar_tpu.ops import pallas3_stream as p3st
from cedar_tpu.ops.relax3 import point_relax, setup_recip
from cedar_tpu.ops.stencil3 import residual
from cedar_tpu.ops.interp3 import interp_add, restrict, setup_interp

from test_kernels_3d import random_so


def _on_tpu() -> bool:
    dd = jax.config.jax_default_device
    if dd is not None:
        return dd.platform == "tpu"
    return jax.default_backend() == "tpu"


ON_TPU = _on_tpu()


@pytest.fixture()
def interpret(monkeypatch):
    if not ON_TPU:
        monkeypatch.setattr(p3st, "INTERPRET", True)
        monkeypatch.setattr(p3s, "INTERPRET", True)


@pytest.mark.parametrize("twenty_seven", [False, True])
@pytest.mark.parametrize("updown", ["down", "up"])
def test_stream_sweep_matches_xla(interpret, twenty_seven, updown):
    kind = (StencilKind.twenty_seven_pt if twenty_seven
            else StencilKind.seven_pt)
    nx, ny, nz = 48, 32, 32      # nx not a multiple of T: exercises the
    rng = np.random.default_rng(3 + twenty_seven)   # padded tail slab
    so = jnp.asarray(random_so(rng, nx, ny, nz, twenty_seven), jnp.float32)
    q0 = jnp.asarray(rng.standard_normal((nx, ny, nz)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((nx, ny, nz)), jnp.float32)
    dims = p3s.split_dims3(nx, ny, nz)
    nz2 = dims[2]
    so4 = p3s.split_so4(so, kind, dims)
    q4, b4 = p3s.split4(q0, dims), p3s.split4(b, dims)
    kw = dict(rtol=1e-5, atol=1e-5)

    ref = point_relax(so, q0, b, setup_recip(so), kind, updown)

    # plain sweep (carry must reach one row below the deepest phase)
    got = p3st.point_relax_stream3(so4, q4, b4, kind, updown, nz2=nz2)
    np.testing.assert_allclose(
        np.asarray(p3s.merge4(got, nx, ny, nz)), np.asarray(ref), **kw)

    # fused residual
    got, res4 = p3st.point_relax_stream3(so4, q4, b4, kind, updown,
                                         fuse_residual=True, nz2=nz2)
    rref = residual(so, ref, b, kind)
    np.testing.assert_allclose(
        np.asarray(p3s.merge4(got, nx, ny, nz)), np.asarray(ref), **kw)
    np.testing.assert_allclose(
        np.asarray(p3s.merge4(res4, nx, ny, nz)), np.asarray(rref), **kw)

    # fused norm partials
    _, nrm = p3st.point_relax_stream3(so4, q4, b4, kind, updown,
                                      fuse_norm=True, nz2=nz2)
    np.testing.assert_allclose(
        float(jnp.sum(nrm)), float(jnp.sum(rref * rref)), rtol=1e-5)


@pytest.mark.parametrize("twenty_seven", [False, True])
def test_stream_transfers_match_xla(interpret, twenty_seven):
    """sweep_restrict_stream3 / interp_sweep_stream3 (streaming sweep +
    standalone restriction / pointwise interpolation) match the XLA
    pipeline."""
    kind = (StencilKind.twenty_seven_pt if twenty_seven
            else StencilKind.seven_pt)
    nx = ny = nz = 32
    rng = np.random.default_rng(11 + twenty_seven)
    so = jnp.asarray(random_so(rng, nx, ny, nz, twenty_seven), jnp.float32)
    q0 = jnp.asarray(rng.standard_normal((nx, ny, nz)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((nx, ny, nz)), jnp.float32)
    dims = p3s.split_dims3(nx, ny, nz)
    nz2 = dims[2]
    so4 = p3s.split_so4(so, kind, dims)
    q4, b4 = p3s.split4(q0, dims), p3s.split4(b, dims)
    recip = setup_recip(so)
    ci = setup_interp(so, kind)
    nc = tuple((d - 1) // 2 + 1 for d in (nx, ny, nz))
    pw4 = p3s.setup_pw4(ci, (nx, ny, nz), kind)
    kw = dict(rtol=1e-5, atol=1e-5)

    ref = point_relax(so, q0, b, recip, kind, "down")
    rref = residual(so, ref, b, kind)
    cb_ref = restrict(ci, rref)
    q_out, res4, cb = p3st.sweep_restrict_stream3(
        so4, q4, b4, pw4, kind, "down", nc, nz2=nz2)
    np.testing.assert_allclose(
        np.asarray(p3s.merge4(q_out, nx, ny, nz)), np.asarray(ref), **kw)
    np.testing.assert_allclose(np.asarray(cb), np.asarray(cb_ref), **kw)

    cx = jnp.asarray(rng.standard_normal(nc), jnp.float32)
    mid_ref = interp_add(ci, so, cx, rref, ref)
    ref2 = point_relax(so, mid_ref, b, recip, kind, "up")
    got2, nrm2 = p3st.interp_sweep_stream3(pw4, cx, so4, b4, q_out, kind,
                                           "up", res4, fuse_norm=True,
                                           nz2=nz2)
    np.testing.assert_allclose(
        np.asarray(p3s.merge4(got2, nx, ny, nz)), np.asarray(ref2),
        rtol=1e-5, atol=5e-6)
    res2_ref = residual(so, ref2, b, kind)
    np.testing.assert_allclose(
        float(jnp.sqrt(jnp.sum(nrm2))),
        float(jnp.sqrt(jnp.sum(res2_ref * res2_ref))), rtol=1e-4)


@pytest.mark.parametrize("twenty_seven", [False, True])
@pytest.mark.parametrize("updown", ["down", "up"])
def test_stream_sweep_lane_panels(interpret, twenty_seven, updown):
    """Lane-paneled wavefront sweep (the large-kp mode, e.g. 256^3):
    forced (W, h) on a small shape must agree with the full-width sweep
    for every emit variant — panel halos carry enough ys-columns that
    the interior is exact, edge-panel clamped halos are annihilated by
    the stored-zero y-boundary couplings."""
    kind = (StencilKind.twenty_seven_pt if twenty_seven
            else StencilKind.seven_pt)
    nx, ny, nz = 32, 32, 32
    rng = np.random.default_rng(29 + twenty_seven)
    so = jnp.asarray(random_so(rng, nx, ny, nz, twenty_seven), jnp.float32)
    q0 = jnp.asarray(rng.standard_normal((nx, ny, nz)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((nx, ny, nz)), jnp.float32)
    dims = p3s.split_dims3(nx, ny, nz)
    nxp, ny2, nz2, kp = dims
    so4 = p3s.split_so4(so, kind, dims)
    q4, b4 = p3s.split4(q0, dims), p3s.split4(b, dims)
    kw = dict(rtol=1e-5, atol=1e-5)
    T, W, h = 16, 8, 8            # 2 panels, halo = 8 ys-cols (>= S+1)

    ref = point_relax(so, q0, b, setup_recip(so), kind, updown)
    got = p3st._stream_call3(so4, q4, b4, kind, updown, nz2, T, "none",
                             W=W, h=h)
    np.testing.assert_allclose(
        np.asarray(p3s.merge4(got, nx, ny, nz)), np.asarray(ref), **kw)

    rref = residual(so, ref, b, kind)
    got, res4 = p3st._stream_call3(so4, q4, b4, kind, updown, nz2, T,
                                   "res", W=W, h=h)
    np.testing.assert_allclose(
        np.asarray(p3s.merge4(got, nx, ny, nz)), np.asarray(ref), **kw)
    np.testing.assert_allclose(
        np.asarray(p3s.merge4(res4, nx, ny, nz)), np.asarray(rref), **kw)

    _, nrm = p3st._stream_call3(so4, q4, b4, kind, updown, nz2, T,
                                "norm", W=W, h=h)
    np.testing.assert_allclose(
        float(jnp.sum(nrm)), float(jnp.sum(rref * rref)), rtol=1e-5)


def test_stream_fused_interp_lane_panels(interpret):
    """The 7-pt fused-interp stream sweep in forced lane-panel mode
    matches the separate pointwise-interp + sweep pipeline."""
    kind = StencilKind.seven_pt
    nx = ny = nz = 32
    rng = np.random.default_rng(37)
    so = jnp.asarray(random_so(rng, nx, ny, nz, False), jnp.float32)
    q0 = jnp.asarray(rng.standard_normal((nx, ny, nz)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((nx, ny, nz)), jnp.float32)
    dims = p3s.split_dims3(nx, ny, nz)
    nxp, ny2, nz2, kp = dims
    so4 = p3s.split_so4(so, kind, dims)
    q4, b4 = p3s.split4(q0, dims), p3s.split4(b, dims)
    from cedar_tpu.ops.relax3 import setup_recip
    from cedar_tpu.ops.interp3 import setup_interp
    ci = setup_interp(so, kind)
    nc = tuple((d - 1) // 2 + 1 for d in (nx, ny, nz))
    pw4 = p3s.setup_pw4(ci, (nx, ny, nz), kind)

    q_pre, res4 = p3st.point_relax_stream3(so4, q4, b4, kind, "down",
                                           fuse_residual=True, nz2=nz2)
    cx = jnp.asarray(rng.standard_normal(nc), jnp.float32)
    rows = nxp // 2 + 2 * 16
    cxp = jnp.pad(cx, ((0, rows - nc[0]), (0, ny2 - nc[1]),
                       (0, nz2 - nc[2]))).reshape(rows, kp)
    from cedar_tpu.ops.pallas3_split import _interp_call3

    ref_q = _interp_call3(pw4, cxp, so4[0], res4, q_pre, nz2,
                          (16, ny2, 0))
    ref = p3st._stream_call3(so4, ref_q, b4, kind, "up", nz2, 16, "none",
                             W=ny2, h=0)
    got = p3st._stream_interp_call3(so4, q_pre, b4, pw4, cxp, res4, kind,
                                    "up", nz2, 16, "none", W=8, h=8)
    np.testing.assert_allclose(np.asarray(p3s.merge4(got, nx, ny, nz)),
                               np.asarray(p3s.merge4(ref, nx, ny, nz)),
                               rtol=1e-5, atol=1e-5)
    # fused norm variant
    _, nrm = p3st._stream_interp_call3(so4, q_pre, b4, pw4, cxp, res4,
                                       kind, "up", nz2, 16, "norm",
                                       W=8, h=8)
    from cedar_tpu.ops.stencil3 import residual as res_xla
    rr = res_xla(so, p3s.merge4(ref, nx, ny, nz), b, kind)
    got_n = float(jnp.sum(nrm))
    # last-color rows carry exact zeros in the fused norm; the XLA
    # residual keeps their rounding junk — compare loosely
    np.testing.assert_allclose(got_n, float(jnp.sum(rr * rr)), rtol=1e-4)

"""Octant-split 3D Pallas kernels (ops.pallas3_split) vs the XLA path.

Interpret-mode on CPU (compiled on a real TPU); tolerances are ULP-level —
the split layout changes compiler FMA contraction, as for the 2D split
kernels (test_pallas2_split).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cedar_tpu.core.types import StencilKind
from cedar_tpu.ops import pallas3, pallas3_split as p3s
from cedar_tpu.ops import pallas3_stream as p3st
from cedar_tpu.ops import pallas_transfer3
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
        monkeypatch.setattr(p3s, "INTERPRET", True)
        monkeypatch.setattr(pallas3, "INTERPRET", True)
        monkeypatch.setattr(pallas_transfer3, "INTERPRET", True)
        monkeypatch.setattr(p3st, "INTERPRET", True)


def _setup(nx, ny, nz, twenty_seven):
    kind = (StencilKind.twenty_seven_pt if twenty_seven
            else StencilKind.seven_pt)
    rng = np.random.default_rng(7 + nx + twenty_seven)
    so = jnp.asarray(random_so(rng, nx, ny, nz, twenty_seven), jnp.float32)
    q0 = jnp.asarray(rng.standard_normal((nx, ny, nz)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((nx, ny, nz)), jnp.float32)
    dims = p3s.split_dims3(nx, ny, nz)
    so4 = p3s.split_so4(so, kind, dims)
    return kind, rng, so, q0, b, dims, so4


def test_layout_round_trip():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((33, 32, 32)), jnp.float32)
    dims = p3s.split_dims3(*a.shape)
    got = p3s.merge4(p3s.split4(a, dims), *a.shape)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(a))


@pytest.mark.parametrize("twenty_seven", [False, True])
@pytest.mark.parametrize("updown", ["down", "up"])
def test_split_sweep_matches_xla(interpret, twenty_seven, updown):
    nx = ny = nz = 32
    kind, rng, so, q0, b, dims, so4 = _setup(nx, ny, nz, twenty_seven)
    nz2 = dims[2]
    q4 = p3s.split4(q0, dims)
    b4 = p3s.split4(b, dims)
    recip = setup_recip(so)
    kw = dict(rtol=1e-5, atol=1e-5)

    ref = point_relax(so, q0, b, recip, kind, updown)
    got4, res4 = p3s.point_relax_split3(so4, q4, b4, kind, updown,
                                        fuse_residual=True, nz2=nz2)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(p3s.merge4(got4, nx, ny, nz)), **kw)
    res_ref = residual(so, ref, b, kind)
    np.testing.assert_allclose(
        np.asarray(res_ref), np.asarray(p3s.merge4(res4, nx, ny, nz)),
        **kw)
    # fused norm partials sum to the squared residual l2 norm
    _, nrm = p3s.point_relax_split3(so4, q4, b4, kind, updown,
                                    fuse_norm=True, nz2=nz2)
    np.testing.assert_allclose(
        float(jnp.sum(nrm)), float(jnp.sum(res_ref * res_ref)), rtol=1e-5)


@pytest.mark.parametrize("twenty_seven", [False, True])
def test_split_sweep_restrict_matches_xla(interpret, twenty_seven):
    nx = ny = nz = 32
    kind, rng, so, q0, b, dims, so4 = _setup(nx, ny, nz, twenty_seven)
    nz2 = dims[2]
    q4 = p3s.split4(q0, dims)
    b4 = p3s.split4(b, dims)
    recip = setup_recip(so)
    ci = setup_interp(so, kind)
    nc = tuple((d - 1) // 2 + 1 for d in (nx, ny, nz))
    pw4 = p3s.setup_pw4(ci, (nx, ny, nz), kind)
    kw = dict(rtol=1e-5, atol=1e-5)

    ref = point_relax(so, q0, b, recip, kind, "down")
    res_ref = residual(so, ref, b, kind)
    cb_ref = restrict(ci, res_ref)
    q_out, res4, cb = p3s.sweep_restrict_split3(
        so4, q4, b4, pw4, kind, "down", nc, emit_res=True, nz2=nz2)
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(p3s.merge4(q_out, nx, ny, nz)), **kw)
    np.testing.assert_allclose(
        np.asarray(res_ref), np.asarray(p3s.merge4(res4, nx, ny, nz)),
        **kw)
    np.testing.assert_allclose(np.asarray(cb_ref), np.asarray(cb), **kw)

    # interp_add + post-sweep (+ norm), fused: the residual is recomputed
    # in-VMEM from the pre-smoothed iterate (the cycle's invariant)
    cx = jnp.asarray(rng.standard_normal(nc), jnp.float32)
    mid_ref = interp_add(ci, so, cx, res_ref, ref)
    ref2 = point_relax(so, mid_ref, b, recip, kind, "up")
    got2, nrm2 = p3s.interp_sweep_split3(pw4, cx, so4, b4, q_out, kind,
                                         "up", fuse_norm=True, nz2=nz2)
    np.testing.assert_allclose(
        np.asarray(ref2), np.asarray(p3s.merge4(got2, nx, ny, nz)),
        rtol=1e-5, atol=5e-6)
    res2_ref = residual(so, ref2, b, kind)
    np.testing.assert_allclose(
        float(jnp.sqrt(jnp.sum(nrm2))),
        float(jnp.sqrt(jnp.sum(res2_ref * res2_ref))), rtol=1e-4)


@pytest.mark.parametrize("twenty_seven", [False, True])
def test_interp_pointwise_fallback_matches_fused(interpret, monkeypatch,
                                                 twenty_seven):
    """When the fused interp+sweep plan does not fit VMEM (27-pt at
    >=128^3), the cycle emits the residual and the pointwise interp
    kernel reproduces the same update."""
    nx = ny = nz = 32
    kind, rng, so, q0, b, dims, so4 = _setup(nx, ny, nz, twenty_seven)
    nz2 = dims[2]
    q4 = p3s.split4(q0, dims)
    b4 = p3s.split4(b, dims)
    ci = setup_interp(so, kind)
    nc = tuple((d - 1) // 2 + 1 for d in (nx, ny, nz))
    pw4 = p3s.setup_pw4(ci, (nx, ny, nz), kind)
    cx = jnp.asarray(rng.standard_normal(nc), jnp.float32)

    q_out, res4, _ = p3s.sweep_restrict_split3(
        so4, q4, b4, pw4, kind, "down", nc, emit_res=True, nz2=nz2)
    fused = p3s.interp_sweep_split3(pw4, cx, so4, b4, q_out, kind, "up",
                                    nz2=nz2)

    orig = p3s._plan_split

    def no_fused(kind_, kp_, want_, nxp_):
        if want_ == "interp_sweep":
            return None
        return orig(kind_, kp_, want_, nxp_)

    monkeypatch.setattr(p3s, "_plan_split", no_fused)
    assert not p3s.interp_fused_ok(kind, q4.shape[2], q4.shape[1])
    fallback = p3s.interp_sweep_split3(pw4, cx, so4, b4, q_out, kind,
                                       "up", nz2=nz2, res4=res4)
    np.testing.assert_allclose(
        np.asarray(p3s.merge4(fused, nx, ny, nz)),
        np.asarray(p3s.merge4(fallback, nx, ny, nz)),
        rtol=1e-5, atol=5e-6)


@pytest.mark.parametrize("twenty_seven", [False, True])
def test_transfer_lane_panels_match_full_width(interpret, twenty_seven):
    """Lane-paneled standalone restriction / pointwise interpolation (the
    large-kp mode, e.g. 256^3 where the full-width windows exceed VMEM):
    forced (T, W, h) on a small shape must agree with the full-width
    kernels — sample rolls reach at most nz2+1 lanes, well inside the
    h-column halo, and edge panels wrap exactly like full-width rolls."""
    nx = ny = nz = 32
    kind, rng, so, q0, b, dims, so4 = _setup(nx, ny, nz, twenty_seven)
    nxp, ny2, nz2, kp = dims
    q4 = p3s.split4(q0, dims)
    b4 = p3s.split4(b, dims)
    ci = setup_interp(so, kind)
    nc = tuple((d - 1) // 2 + 1 for d in (nx, ny, nz))
    pw4 = p3s.setup_pw4(ci, (nx, ny, nz), kind)
    kw = dict(rtol=1e-5, atol=1e-5)
    T, W, h = 16, 8, 8            # 2 panels, halo = 8 ys-cols

    q_out, res4 = p3s.point_relax_split3(so4, q4, b4, kind, "down",
                                         fuse_residual=True, nz2=nz2)
    ref = p3s.merge4(q_out, nx, ny, nz)
    res_ref = residual(so, ref, b, kind)
    cb_ref = restrict(ci, res_ref)

    def crop(cbf):
        return cbf[:nc[0]].reshape(-1, ny2, nz2)[:, :nc[1], :nc[2]]

    cb_full = crop(p3s._restrict_call3(pw4, res4, nz2, (T, ny2, 0)))
    cb_pan = crop(p3s._restrict_call3(pw4, res4, nz2, (T, W, h)))
    np.testing.assert_allclose(np.asarray(cb_full), np.asarray(cb_ref),
                               **kw)
    np.testing.assert_array_equal(np.asarray(cb_pan), np.asarray(cb_full))

    cx = jnp.asarray(rng.standard_normal(nc), jnp.float32)
    mid_ref = interp_add(ci, so, cx, res_ref, ref)
    rows = nxp // 2 + 2 * 16
    cxp = jnp.pad(cx, ((0, rows - nc[0]), (0, ny2 - nc[1]),
                       (0, nz2 - nc[2]))).reshape(rows, kp)
    from cedar_tpu.core.types import Dir3

    qi_full = p3s._interp_call3(pw4, cxp, so4[Dir3.P], res4, q_out, nz2,
                                (T, ny2, 0))
    qi_pan = p3s._interp_call3(pw4, cxp, so4[Dir3.P], res4, q_out, nz2,
                               (T, W, h))
    np.testing.assert_allclose(
        np.asarray(p3s.merge4(qi_full, nx, ny, nz)), np.asarray(mid_ref),
        rtol=1e-5, atol=5e-6)
    np.testing.assert_array_equal(np.asarray(qi_pan), np.asarray(qi_full))


def test_solver3_split_resident_path_matches_xla(interpret):
    """End-to-end: Solver3 with the pallas backend takes the octant-split
    resident cycle (so2/pw4 built, fine_split_ok true) and matches the
    XLA-backend solve and history."""
    from cedar_tpu import SevenPt, Solver3, gallery
    from cedar_tpu.config import Config
    from cedar_tpu.solver import cycle3

    nx, ny, nz = 64, 64, 32
    so = jnp.asarray(np.asarray(gallery.poisson3(nx, ny, nz)), jnp.float32)
    b = jnp.asarray(np.asarray(gallery.poisson3_rhs(nx, ny, nz)),
                    jnp.float32)
    conf = {"log": [], "solver": {"tol": 1e-5, "max-iter": 3}}

    s_xla = Solver3(so, SevenPt, Config(dict(conf)))
    assert s_xla.levels[0].so2 is None
    x_xla = s_xla.solve(b)

    pconf = dict(conf)
    pconf["kernels"] = {"backend": "pallas"}
    s_pal = Solver3(so, SevenPt, Config(pconf))
    assert s_pal.levels[0].so2 is not None
    assert s_pal.levels[1].pw4 is not None
    assert cycle3.fine_split_ok(s_pal.levels, s_pal.settings, None)
    x_pal = s_pal.solve(b)

    np.testing.assert_allclose(
        np.asarray(x_xla), np.asarray(x_pal), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s_xla.history), np.asarray(s_pal.history), rtol=1e-3)
    # the standalone-cycle entry (run_cycle) also matches
    v_xla = s_xla.vcycle(jnp.zeros_like(b), b)
    v_pal = s_pal.vcycle(jnp.zeros_like(b), b)
    np.testing.assert_allclose(
        np.asarray(v_xla), np.asarray(v_pal), atol=1e-5)


def test_fcycle3_split_path_matches_xla(interpret):
    """3D F-cycle with the pallas backend: split-resident correction
    cycles + the no-residual level-entry interpolation
    (interp_split_nores3) match the XLA-backend F-cycle."""
    from cedar_tpu import SevenPt, Solver3, gallery
    from cedar_tpu.config import Config

    n = 64
    so = jnp.asarray(np.asarray(gallery.poisson3(n, n, n)), jnp.float32)
    b = jnp.asarray(np.asarray(gallery.poisson3_rhs(n, n, n)), jnp.float32)
    conf = {"log": [], "solver": {"cycle": {"type": "f"}, "tol": 1e-5,
                                  "max-iter": 2}}
    s_xla = Solver3(so, SevenPt, Config({**conf,
                                         "kernels": {"backend": "xla"}}))
    x_xla = s_xla.solve(b)
    s_pal = Solver3(so, SevenPt, Config({**conf,
                                         "kernels": {"backend": "pallas"}}))
    assert s_pal.levels[0].so2 is not None
    x_pal = s_pal.solve(b)
    np.testing.assert_allclose(np.asarray(x_xla), np.asarray(x_pal),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(s_xla.history),
                               np.asarray(s_pal.history), rtol=1e-3)


def test_interp_split_nores3_matches_interp_add(interpret):
    """P*cx alone (the 3D F-cycle's level entry), full-width and forced
    lane panels, equals interp_add with zero residual/iterate."""
    nx = ny = nz = 32
    kind, rng, so, q0, b, dims, so4 = _setup(nx, ny, nz, False)
    nxp, ny2, nz2, kp = dims
    ci = setup_interp(so, kind)
    nc = tuple((d - 1) // 2 + 1 for d in (nx, ny, nz))
    pw4 = p3s.setup_pw4(ci, (nx, ny, nz), kind)
    cx = jnp.asarray(rng.standard_normal(nc), jnp.float32)
    zero = jnp.zeros((nx, ny, nz), jnp.float32)
    ref = interp_add(ci, so, cx, zero, zero)

    rows = nxp // 2 + 2 * 16
    cxp = jnp.pad(cx, ((0, rows - nc[0]), (0, ny2 - nc[1]),
                       (0, nz2 - nc[2]))).reshape(rows, kp)
    full = p3s.interp_split_nores3(pw4, cxp, nz2, (16, ny2, 0))
    np.testing.assert_allclose(
        np.asarray(p3s.merge4(full, nx, ny, nz)), np.asarray(ref),
        rtol=1e-5, atol=1e-5)
    pan = p3s.interp_split_nores3(pw4, cxp, nz2, (16, 8, 8))
    np.testing.assert_array_equal(np.asarray(pan), np.asarray(full))

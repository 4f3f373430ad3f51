"""3D Pallas sweep kernels vs the XLA reference path (TPU or interpreter).

Covers the flattened-lane formulation (y/z shifts as lane rolls whose wrap
terms are annihilated by the stored-zero couplings), both stencils, the
27-point two-pass color split, and padded odd shapes.
"""

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
@pytest.mark.parametrize("tsp", [False, True])
def test_pallas3_sweep_matches_xla(updown, tsp, monkeypatch):
    if not ON_TPU:
        monkeypatch.setattr(pallas3, "INTERPRET", True)
    if ON_TPU:
        n = (64, 64, 128)
    else:
        n = (32, 16, 40) if tsp else (24, 16, 40)
    rng = np.random.default_rng(7)
    from test_kernels_3d import random_so

    so = jnp.asarray(random_so(rng, *n, tsp), jnp.float32)
    q = jnp.asarray(rng.standard_normal(n), jnp.float32)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    kind = (StencilKind.twenty_seven_pt if tsp else StencilKind.seven_pt)
    assert pallas3.supported(q.shape, q.dtype, kind)
    rec = setup_recip(so)

    ref = relax_xla(so, q, b, rec, kind, updown)
    got = pallas3.point_relax(so, q, b, rec, updown, kind=kind)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-5)

    got2, res2 = pallas3.point_relax(so, q, b, rec, updown,
                                     fuse_residual=True, kind=kind)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got2), atol=1e-5)
    ref_res = residual(so, ref, b, kind)
    np.testing.assert_allclose(
        np.asarray(ref_res), np.asarray(res2), atol=1e-4)


def test_pallas3_two_pass_split(monkeypatch):
    """Force the two-pass 27-pt plan and check it matches the XLA sweep."""
    if not ON_TPU:
        monkeypatch.setattr(pallas3, "INTERPRET", True)
    n = (32, 16, 40)
    _, kp = pallas3._dims(n)
    # shrink the budget until the single-pass H=16 plan is infeasible
    # (local variable only; monkeypatch handles restore)
    budget = pallas3._VMEM_BUDGET
    kind = StencilKind.twenty_seven_pt
    while True:
        monkeypatch.setattr(pallas3, "_VMEM_BUDGET", budget)
        plan = pallas3._plan(kind, kp, "down", True, n[0])
        if plan is None or len(plan) == 2:
            break
        budget //= 2
    if plan is None:
        pytest.skip("no feasible two-pass plan at this size")
    rng = np.random.default_rng(11)
    from test_kernels_3d import random_so

    so = jnp.asarray(random_so(rng, *n, True), jnp.float32)
    q = jnp.asarray(rng.standard_normal(n), jnp.float32)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    rec = setup_recip(so)
    ref = relax_xla(so, q, b, rec, kind, "down")
    got, res = pallas3.point_relax(so, q, b, rec, "down",
                                   fuse_residual=True, kind=kind)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                               atol=1e-5)
    ref_res = residual(so, ref, b, kind)
    np.testing.assert_allclose(np.asarray(ref_res), np.asarray(res),
                               atol=1e-4)


def test_pallas3_padded_odd_shape(monkeypatch):
    if not ON_TPU:
        monkeypatch.setattr(pallas3, "INTERPRET", True)
    n = (27, 18, 35)
    rng = np.random.default_rng(13)
    from test_kernels_3d import random_so

    so = jnp.asarray(random_so(rng, *n, False), jnp.float32)
    q = jnp.asarray(rng.standard_normal(n), jnp.float32)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    kind = StencilKind.seven_pt
    assert pallas3.supported(n, jnp.float32, kind)
    rec = setup_recip(so)
    ref = relax_xla(so, q, b, rec, kind, "down")
    got = pallas3.point_relax(so, q, b, rec, "down", kind=kind)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-5)


def test_supported_gates():
    f32 = jnp.float32
    seven = StencilKind.seven_pt
    tsp = StencilKind.twenty_seven_pt
    assert pallas3.supported((256, 256, 256), f32, seven)
    assert pallas3.supported((64, 64, 128), f32, tsp)
    assert pallas3.supported((128, 128, 128), f32, tsp)  # 2D-tiled path
    assert not pallas3.supported((4, 64, 128), f32, seven)   # too few rows
    assert not pallas3.supported((256, 256, 256), jnp.float64, seven)


def test_pallas3_2d_tiled_path(monkeypatch):
    """Force the 2D-tiled pipelined variant (flattened rows over budget)
    and check it matches the XLA sweep, including the fused residual."""
    if not ON_TPU:
        monkeypatch.setattr(pallas3, "INTERPRET", True)
    n = (24, 16, 40)
    kind = StencilKind.seven_pt
    rng = np.random.default_rng(23)
    from test_kernels_3d import random_so

    so = jnp.asarray(random_so(rng, *n, False), jnp.float32)
    q = jnp.asarray(rng.standard_normal(n), jnp.float32)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    rec = setup_recip(so)
    origin = jnp.zeros((3,), jnp.int32)
    for updown in ("down", "up"):
        ref = relax_xla(so, q, b, rec, kind, updown)
        got = pallas3._point_relax_2d_tiled(so, q, b, kind, updown, False,
                                            origin)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   atol=1e-5)
    ref = relax_xla(so, q, b, rec, kind, "down")
    got, res = pallas3._point_relax_2d_tiled(so, q, b, kind, "down", True,
                                             origin)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-5)
    ref_res = residual(so, ref, b, kind)
    np.testing.assert_allclose(np.asarray(ref_res), np.asarray(res),
                               atol=1e-4)


def test_pallas3_2d_tiled_rounded_halo(monkeypatch):
    """HX rounded above the dependency depth (alignment-driven planner
    choice, e.g. (32, 64, 4, 8) at 256^3): extra window rows must be
    redundant-but-correct."""
    if not ON_TPU:
        monkeypatch.setattr(pallas3, "INTERPRET", True)
    monkeypatch.setattr(pallas3, "_tile2d_for",
                        lambda *a, **k: (8, 16, 4, 8))
    n = (24, 16, 40)
    kind = StencilKind.seven_pt
    rng = np.random.default_rng(29)
    from test_kernels_3d import random_so

    so = jnp.asarray(random_so(rng, *n, False), jnp.float32)
    q = jnp.asarray(rng.standard_normal(n), jnp.float32)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    rec = setup_recip(so)
    origin = jnp.zeros((3,), jnp.int32)
    for updown in ("down", "up"):
        ref = relax_xla(so, q, b, rec, kind, updown)
        got = pallas3._point_relax_2d_tiled(so, q, b, kind, updown, False,
                                            origin)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   atol=1e-5)


def test_pallas3_2d_tiled_27pt_rounded_halo(monkeypatch):
    """27-pt 2D-tiled path with the halo block rounded above the 8-color
    dependency depth (e.g. the exact-fit (32,32,16,16) tile at 128^3)."""
    if not ON_TPU:
        monkeypatch.setattr(pallas3, "INTERPRET", True)
    monkeypatch.setattr(pallas3, "_tile2d_for",
                        lambda *a, **k: (16, 16, 16, 16))
    n = (32, 32, 40)
    kind = StencilKind.twenty_seven_pt
    rng = np.random.default_rng(31)
    from test_kernels_3d import random_so

    so = jnp.asarray(random_so(rng, *n, True), jnp.float32)
    q = jnp.asarray(rng.standard_normal(n), jnp.float32)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    rec = setup_recip(so)
    origin = jnp.zeros((3,), jnp.int32)
    for updown in ("down", "up"):
        ref = relax_xla(so, q, b, rec, kind, updown)
        got = pallas3._point_relax_2d_tiled(so, q, b, kind, updown, False,
                                            origin)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   atol=1e-4)


def test_pallas3_2d_tiled_27pt_xsplit(monkeypatch):
    """x-parity-split phase loop (serial 27-pt) == XLA sweep, including
    the fused residual."""
    if not ON_TPU:
        monkeypatch.setattr(pallas3, "INTERPRET", True)
    monkeypatch.setattr(pallas3, "_tile2d_for",
                        lambda *a, **k: (16, 16, 16, 16))
    n = (32, 32, 40)
    kind = StencilKind.twenty_seven_pt
    rng = np.random.default_rng(37)
    from test_kernels_3d import random_so

    so = jnp.asarray(random_so(rng, *n, True), jnp.float32)
    q = jnp.asarray(rng.standard_normal(n), jnp.float32)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)
    rec = setup_recip(so)
    for updown in ("down", "up"):
        ref = relax_xla(so, q, b, rec, kind, updown)
        got = pallas3._point_relax_2d_tiled(
            so, q, b, kind, updown, False, None, serial_origin=True)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   atol=1e-4)
    ref = relax_xla(so, q, b, rec, kind, "down")
    got, res = pallas3._point_relax_2d_tiled(
        so, q, b, kind, "down", True, None, serial_origin=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-4)
    from cedar_tpu.ops.stencil3 import residual
    ref_res = residual(so, ref, b, kind)
    np.testing.assert_allclose(np.asarray(ref_res), np.asarray(res),
                               atol=1e-3)


def test_tile_planner_consistency():
    """Planner invariants across a shape sweep: tiles divide evenly into
    halo blocks, windows stay under the calibrated VMEM boundary, and
    the benchmark shapes get exact-fit tiles (no pad passes)."""
    f32 = jnp.float32
    for kind, per in ((StencilKind.seven_pt, 26),
                      (StencilKind.twenty_seven_pt, 60)):
        need = 3 if kind == StencilKind.seven_pt else 9
        for n in (64, 96, 100, 126, 127, 128, 192, 200, 254, 256):
            nzp = -(-n // 128) * 128
            tile = pallas3._tile2d_for(kind, nzp, n, n)
            if tile is None:
                continue
            Tx, Ty, HX, HY = tile
            assert Tx % HX == 0 and Ty % HY == 0
            assert HX >= need
            cells = pallas3._VMEM_BUDGET // (nzp * 4)
            assert (Tx + 2 * HX) * (Ty + 2 * HY) <= cells // per
    # exact fits at the benchmark shapes
    assert pallas3._tile2d_for(StencilKind.seven_pt, 256, 256, 256)[:2] \
        == (32, 64)
    t = pallas3._tile2d_for(StencilKind.twenty_seven_pt, 128, 128, 128)
    assert 128 % t[0] == 0 and 128 % t[1] == 0

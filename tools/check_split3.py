"""Interpret-mode correctness check of pallas3_split vs the XLA path."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                "tests"))

import jax
jax.config.update("jax_default_device", jax.devices("cpu")[0])

import numpy as np
import jax.numpy as jnp

from cedar_tpu.core.types import StencilKind
from cedar_tpu.ops import pallas3_split as p3s
from cedar_tpu.ops.relax3 import point_relax, setup_recip
from cedar_tpu.ops.stencil3 import residual
from cedar_tpu.ops.interp3 import setup_interp, restrict, interp_add

p3s.INTERPRET = True

from test_kernels_3d import random_so  # noqa: E402


def check(nx, ny, nz, twenty_seven, updown):
    kind = (StencilKind.twenty_seven_pt if twenty_seven
            else StencilKind.seven_pt)
    rng = np.random.default_rng(7 + nx + twenty_seven)
    so = jnp.asarray(random_so(rng, nx, ny, nz, twenty_seven), jnp.float32)
    q0 = jnp.asarray(rng.standard_normal((nx, ny, nz)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((nx, ny, nz)), jnp.float32)
    recip = setup_recip(so)

    dims = p3s.split_dims3(nx, ny, nz)
    assert dims is not None, (nx, ny, nz)
    nxp, ny2, nz2, kp = dims
    so4 = p3s.split_so4(so, kind, dims)
    q4 = p3s.split4(q0, dims)
    b4 = p3s.split4(b, dims)

    # layout round trip
    np.testing.assert_array_equal(
        np.asarray(p3s.merge4(q4, nx, ny, nz)), np.asarray(q0))

    # plain sweep
    ref = point_relax(so, q0, b, recip, kind, updown)
    got4 = p3s.point_relax_split3(so4, q4, b4, kind, updown, nz2=nz2)
    got = p3s.merge4(got4, nx, ny, nz)
    kw = dict(rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), **kw)
    print(f"  sweep {updown} ok")

    # fused residual + norm
    _, res4 = p3s.point_relax_split3(so4, q4, b4, kind, updown,
                                     fuse_residual=True, nz2=nz2)
    res_ref = residual(so, ref, b, kind)
    np.testing.assert_allclose(
        np.asarray(res_ref), np.asarray(p3s.merge4(res4, nx, ny, nz)), **kw)
    _, nrm = p3s.point_relax_split3(so4, q4, b4, kind, updown,
                                    fuse_norm=True, nz2=nz2)
    np.testing.assert_allclose(
        float(jnp.sum(nrm)), float(jnp.sum(res_ref * res_ref)), rtol=1e-5)
    print("  fused residual + norm ok")

    # sweep + restrict
    ci = setup_interp(so, kind)
    nc = ((nx - 1) // 2 + 1, (ny - 1) // 2 + 1, (nz - 1) // 2 + 1)
    pw4 = p3s.setup_pw4(ci, (nx, ny, nz), kind)
    q_out, res4b, cb = p3s.sweep_restrict_split3(
        so4, q4, b4, pw4, kind, updown, nc, emit_res=True, nz2=nz2)
    cb_ref = restrict(ci, res_ref)
    np.testing.assert_allclose(np.asarray(ref),
                               np.asarray(p3s.merge4(q_out, nx, ny, nz)),
                               **kw)
    np.testing.assert_allclose(
        np.asarray(res_ref), np.asarray(p3s.merge4(res4b, nx, ny, nz)), **kw)
    np.testing.assert_allclose(np.asarray(cb_ref), np.asarray(cb), **kw)
    print("  sweep+restrict ok")

    # interp + sweep (+ norm): ULP-level (in-kernel residual recompute)
    cx = jnp.asarray(rng.standard_normal(nc), jnp.float32)
    mid_ref = interp_add(ci, so, cx, res_ref, ref)
    post = "up" if updown == "down" else "down"
    ref2 = point_relax(so, mid_ref, b, recip, kind, post)
    got2 = p3s.interp_sweep_split3(pw4, cx, so4, b4, q_out, kind, post,
                                   nz2=nz2)
    np.testing.assert_allclose(
        np.asarray(ref2), np.asarray(p3s.merge4(got2, nx, ny, nz)),
        rtol=1e-5, atol=5e-6)
    got2n, nrm2 = p3s.interp_sweep_split3(pw4, cx, so4, b4, q_out, kind,
                                          post, fuse_norm=True, nz2=nz2)
    res2_ref = residual(so, ref2, b, kind)
    np.testing.assert_allclose(
        float(jnp.sqrt(jnp.sum(nrm2))),
        float(jnp.sqrt(jnp.sum(res2_ref * res2_ref))), rtol=1e-4)
    print("  interp+sweep (+norm) ok")


for tw in (False, True):
    for ud in ("down", "up"):
        print(f"kind={'27pt' if tw else '7pt'} updown={ud}")
        check(32, 32, 32, tw, ud)
print("ALL OK")

"""Sharded Pallas sweeps (shard_map + ppermute halos) vs the XLA path.

The reference's distributed hot path exchanges ghost rows after every color
sweep (src/2d/ftn/mpi/BMG2_SymStd_relax_GS.f90:124-126); here one WIDE halo
exchange per sweep feeds the per-shard fused Pallas kernel
(cedar_tpu.parallel.shard_relax).  These tests run the kernels in Pallas
interpreter mode on the virtual 8-CPU mesh and demand bit-exactness against
the dense XLA sweep (same FMA structure by construction).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from cedar_tpu.core.types import StencilKind
from cedar_tpu.ops import pallas2, pallas3
from cedar_tpu.ops.relax2 import point_relax as relax2_xla, setup_recip
from cedar_tpu.ops.relax3 import (
    point_relax as relax3_xla,
    setup_recip as setup_recip3,
)
from cedar_tpu.ops.stencil2 import residual as residual2
from cedar_tpu.ops.stencil3 import residual as residual3
from cedar_tpu.parallel import make_mesh, shard_relax


@pytest.fixture(scope="module")
def mesh2():
    return make_mesh(2, devices=jax.devices("cpu"))


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pallas2, "INTERPRET", True)
    monkeypatch.setattr(pallas3, "INTERPRET", True)


@pytest.mark.parametrize("nine", [False, True])
@pytest.mark.parametrize(
    "spec", [P("x", "y"), P(None, "y"), P("x", None), P(None, None)]
)
def test_sharded_sweep_matches_xla_2d(mesh2, nine, spec):
    from test_kernels_2d import random_so

    rng = np.random.default_rng(11 + nine)
    nx, ny = 256, 480
    so = jnp.asarray(random_so(rng, nx, ny, nine), jnp.float32)
    q = jnp.asarray(rng.standard_normal((nx, ny)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((nx, ny)), jnp.float32)
    kind = StencilKind.nine_pt if nine else StencilKind.five_pt
    rec = setup_recip(so)
    sh = NamedSharding(mesh2, spec)
    assert shard_relax.supported2((nx, ny), q.dtype, kind, sh)

    for updown in ("down", "up"):
        ref = relax2_xla(so, q, b, rec, kind, updown)
        got = shard_relax.point_relax2(sh, so, q, b, kind, updown)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    # fused trailing residual
    ref = relax2_xla(so, q, b, rec, kind, "down")
    ref_res = residual2(so, ref, b, kind)
    got, got_res = shard_relax.point_relax2(
        sh, so, q, b, kind, "down", fuse_residual=True
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    np.testing.assert_allclose(
        np.asarray(ref_res), np.asarray(got_res), atol=1e-5
    )


def test_sharded_sweep_matches_xla_3d(mesh2):
    from test_kernels_3d import random_so

    rng = np.random.default_rng(21)
    nx, ny, nz = 32, 48, 128
    so = jnp.asarray(random_so(rng, nx, ny, nz, False), jnp.float32)
    q = jnp.asarray(rng.standard_normal((nx, ny, nz)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((nx, ny, nz)), jnp.float32)
    kind = StencilKind.seven_pt
    rec = setup_recip3(so)
    sh = NamedSharding(mesh2, P("x", "y", None))
    assert shard_relax.supported3((nx, ny, nz), q.dtype, kind, sh)
    # a sharded z (lane) axis must be rejected, not mis-run
    mesh3 = make_mesh(3, devices=jax.devices("cpu"))
    assert not shard_relax.supported3(
        (nx, ny, nz), q.dtype, kind, NamedSharding(mesh3, P("x", "y", "z"))
    )

    for updown in ("down", "up"):
        ref = relax3_xla(so, q, b, rec, kind, updown)
        got = shard_relax.point_relax3(sh, so, q, b, updown)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    ref = relax3_xla(so, q, b, rec, kind, "down")
    ref_res = residual3(so, ref, b, kind)
    got, got_res = shard_relax.point_relax3(
        sh, so, q, b, "down", fuse_residual=True
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    np.testing.assert_allclose(
        np.asarray(ref_res), np.asarray(got_res), atol=1e-4
    )


def test_dist_solver_pallas_backend_matches_xla(mesh2):
    """DistSolver2 with the pallas backend (no longer forced to XLA): the
    sharded fused-sweep cycle must agree with the XLA-path cycle."""
    from cedar_tpu import FivePt
    from cedar_tpu.config import Config
    from cedar_tpu.parallel import DistSolver2

    n = 256
    so = jnp.asarray(np.asarray(
        __import__("cedar_tpu").gallery.poisson(n, n)), jnp.float32)
    b = jnp.asarray(np.asarray(
        __import__("cedar_tpu").gallery.poisson_rhs(n, n)), jnp.float32)
    conf = {"log": [], "solver": {"tol": 1e-5, "max-iter": 2}}

    s_xla = DistSolver2(so, FivePt, Config(dict(conf)), mesh2)
    assert s_xla.settings.kernel_backend == "xla"  # auto on CPU
    x_xla = s_xla.vcycle(jnp.zeros_like(b), b)

    pconf = dict(conf)
    pconf["kernels"] = {"backend": "pallas"}
    s_pal = DistSolver2(so, FivePt, Config(pconf), mesh2)
    assert s_pal.settings.kernel_backend == "pallas"
    # the fine level must actually take the sharded pallas path
    from cedar_tpu.solver.cycle2 import _use_pallas

    assert _use_pallas(
        s_pal.settings, FivePt, (n, n), jnp.float32, (False, False),
        s_pal.constraints[0],
    )
    x_pal = s_pal.vcycle(jnp.zeros_like(b), b)
    np.testing.assert_allclose(
        np.asarray(x_xla), np.asarray(x_pal), atol=1e-5
    )

"""Coarse-solver equivalence (reference: test/2d/mpi/test_cgsolve.cc —
LU vs inner-cedar coarse solves agree < 1e-10)."""

import jax.numpy as jnp

from cedar_tpu import FivePt, SevenPt, Solver2, Solver3, gallery
from cedar_tpu.config import Config


def test_cgsolve_lu_vs_cedar_2d():
    so = gallery.poisson(128, 128)
    b = gallery.poisson_rhs(128, 128)
    xa = Solver2(so, FivePt, Config({
        "log": [], "solver": {"tol": 1e-10, "max-iter": 30}})).solve(b)
    s = Solver2(so, FivePt, Config({
        "log": [],
        "solver": {"tol": 1e-10, "max-iter": 30, "num-levels": 3,
                   "cg-solver": "cedar"},
        "cg-config": {"solver": {"tol": 1e-12, "max-iter": 20}},
    }))
    assert s.levels[-1].inner is not None
    xb = s.solve(b)
    assert float(jnp.max(jnp.abs(xa - xb))) < 1e-10


def test_cgsolve_lu_vs_cedar_3d():
    n = 24
    so = gallery.poisson3(n, n, n)
    b = gallery.poisson3_rhs(n, n, n)
    xa = Solver3(so, SevenPt, Config({
        "log": [], "solver": {"tol": 1e-10, "max-iter": 30}})).solve(b)
    s = Solver3(so, SevenPt, Config({
        "log": [],
        "solver": {"tol": 1e-10, "max-iter": 30, "num-levels": 2,
                   "cg-solver": "cedar"},
        "cg-config": {"solver": {"tol": 1e-12, "max-iter": 20}},
    }))
    assert s.levels[-1].inner is not None
    xb = s.solve(b)
    assert float(jnp.max(jnp.abs(xa - xb))) < 1e-10


def test_cgsolve_nested_depth2_2d():
    """Depth-2 cg-config recursion: the inner coarse solver itself uses an
    inner-cedar coarse solve (reference nests to depth 3+,
    test/2d/mpi/test-cgredist-1.json path [[4,4],[2,2],[2,1],[1,1]])."""
    so = gallery.poisson(128, 128)
    b = gallery.poisson_rhs(128, 128)
    xa = Solver2(so, FivePt, Config({
        "log": [], "solver": {"tol": 1e-10, "max-iter": 30}})).solve(b)
    s = Solver2(so, FivePt, Config({
        "log": [],
        "solver": {"tol": 1e-10, "max-iter": 30, "num-levels": 2,
                   "cg-solver": "cedar"},
        "cg-config": {
            "solver": {"tol": 1e-12, "max-iter": 20, "num-levels": 2,
                       "cg-solver": "cedar"},
            "cg-config": {"solver": {"tol": 1e-12, "max-iter": 20}},
        },
    }))
    inner = s.levels[-1].inner
    assert inner is not None
    assert inner[-1].inner is not None  # depth-2 nesting materialized
    xb = s.solve(b)
    assert float(jnp.max(jnp.abs(xa - xb))) < 1e-10


def test_cgsolve_lu_vs_redist_sharded():
    """Agglomerated (redist) vs direct-LU coarse solve under sharding on
    the virtual 8-CPU mesh: solutions agree < 1e-10 (the analogue of the
    reference's np=16 equivalence test, test/2d/mpi/test_cgredist.cc:84)."""
    import jax

    from cedar_tpu.parallel import DistSolver2, make_mesh

    mesh = make_mesh(2, devices=jax.devices("cpu"))
    so = gallery.poisson(64, 64)
    b = gallery.poisson_rhs(64, 64)
    xa = DistSolver2(so, FivePt, Config({
        "log": [], "solver": {"tol": 1e-10, "max-iter": 30}}), mesh).solve(b)
    s = DistSolver2(so, FivePt, Config({
        "log": [],
        "solver": {"tol": 1e-10, "max-iter": 30, "num-levels": 3,
                   "cg-solver": "redist"},
        "cg-config": {"solver": {"tol": 1e-12, "max-iter": 20}},
    }), mesh)
    assert s.levels[-1].inner is not None
    xb = s.solve(b)
    assert float(jnp.max(jnp.abs(xa - xb))) < 1e-10

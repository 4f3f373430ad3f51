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

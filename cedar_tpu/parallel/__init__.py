"""Distributed (multi-chip) execution over a JAX device mesh.

TPU-native replacement for the reference's distributed runtime
(include/cedar/mpi/*, include/cedar/{2,3}d/mpi/*; SURVEY §2.3):

* `grid_topo` + MPI_Dims_create          -> :mod:`cedar_tpu.parallel.topo`
* MSG/Tausch halo exchange               -> XLA SPMD collective-permutes
  inserted for the shifted-window reads inside one jitted cycle
* coarse-grid redistribution/agglomeration (redist_solver.h)
                                         -> per-level sharding policy
  (:mod:`cedar_tpu.parallel.policy`): fine levels block-partitioned over
  the mesh, coarse levels constrained onto shrinking mesh subsets and
  finally replicated (the "redundant" mode of the reference, which is the
  natural TPU fit — replicated small solves are free relative to a scatter)
* distributed solvers                    -> :mod:`cedar_tpu.parallel.dist`
"""

from cedar_tpu.parallel.topo import make_mesh
from cedar_tpu.parallel.policy import level_specs
from cedar_tpu.parallel.dist import DistSolver2, DistSolver3

__all__ = ["make_mesh", "level_specs", "DistSolver2", "DistSolver3"]

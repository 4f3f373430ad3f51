"""Device-mesh topology (reference: include/cedar/mpi/grid_topo.h,
src/2d/util/topo.cc, include/cedar/decomp.h).

The reference builds an MPI Cartesian process grid with
`MPI_Dims_create`/prime-factor balancing and tracks per-level local extents
by hand.  Here the topology is a `jax.sharding.Mesh`; the SPMD partitioner
owns local extents, so only the mesh-shape factorization logic carries over.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

AXES2 = ("x", "y")
AXES3 = ("x", "y", "z")


def balanced_dims(n: int, ndim: int) -> tuple[int, ...]:
    """Near-balanced factorization of ``n`` into ``ndim`` factors.

    Greedy largest-prime-first assignment to the currently smallest factor —
    the same balancing goal as the reference's `grid_decomp`
    (include/cedar/decomp.h:57-86) / MPI_Dims_create.
    """
    factors = []
    m = n
    p = 2
    while p * p <= m:
        while m % p == 0:
            factors.append(p)
            m //= p
        p += 1
    if m > 1:
        factors.append(m)
    dims = [1] * ndim
    for f in sorted(factors, reverse=True):
        dims[int(np.argmin(dims))] *= f
    return tuple(sorted(dims, reverse=True))


def make_mesh(ndim: int, devices=None, shape=None) -> Mesh:
    """Create an ndim-axis device mesh (axes 'x','y'[,'z']).

    ``shape`` overrides the balanced factorization (the analogue of the
    reference's explicit `grid.np` config).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = balanced_dims(n, ndim)
    else:
        shape = tuple(shape)
        n = int(np.prod(shape))
        devices = devices[:n]
    if int(np.prod(shape)) != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    axes = AXES2 if ndim == 2 else AXES3
    return Mesh(np.asarray(devices).reshape(shape), axes)


def block_low(index: int, nblocks: int, n: int) -> int:
    """Low global index of a contiguous block partition
    (reference: include/cedar/mpi/block_partition.h:8-34)."""
    return (index * n) // nblocks


def block_size(index: int, nblocks: int, n: int) -> int:
    return block_low(index + 1, nblocks, n) - block_low(index, nblocks, n)


def block_owner(gidx: int, nblocks: int, n: int) -> int:
    return (nblocks * (gidx + 1) - 1) // n

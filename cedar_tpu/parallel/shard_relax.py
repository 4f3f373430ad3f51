"""Sharded execution of the fused Pallas sweeps (the distributed hot path).

The reference keeps its hot multicolor sweeps fast under MPI decomposition
by exchanging ghost rows after every color
(src/2d/ftn/mpi/BMG2_SymStd_relax_GS.f90:124-126).  The TPU-native
equivalent here wraps the single-chip fused Pallas sweep kernels
(:mod:`cedar_tpu.ops.pallas2`, :mod:`cedar_tpu.ops.pallas3`) in
`shard_map`: each shard

1. exchanges WIDE halo slabs (H = 8) with its mesh neighbors via ONE
   `lax.ppermute` pair per sharded axis — one exchange per sweep instead of
   the reference's one per color, trading a little redundant edge compute
   for 4x fewer messages (the halo is deep enough that every color phase
   plus the fused residual recomputes the neighbor's boundary updates
   locally, the same progressive-validity argument the slab kernel uses
   internally);
2. runs the unmodified fused sweep kernel on the extended local block,
   with color parity anchored to GLOBAL indices via the kernel's origin
   argument (the reference anchors to iGs/jGs,
   BMG2_SymStd_relax_GS.f90:95-99);
3. returns the interior of the extended block.

Out-of-domain halo slabs (mesh edges) arrive as ppermute zero-fill; zero
couplings annihilate every read into them, and the diagonal is repaired to
one so the (discarded) halo updates stay finite.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from cedar_tpu.core.types import Dir2, Dir3, StencilKind

_H = 8


def _axis_names(spec, ndim):
    names = list(spec) + [None] * ndim
    return tuple(names[:ndim])


def _halo_concat(a, dim, ax_name, mesh):
    """Extend ``a`` along ``dim`` with H-slabs from the mesh neighbors."""
    n = mesh.shape[ax_name]
    lo_idx = [slice(None)] * a.ndim
    hi_idx = [slice(None)] * a.ndim
    lo_idx[dim] = slice(a.shape[dim] - _H, None)   # my top H -> next's bottom
    hi_idx[dim] = slice(0, _H)                     # my bottom H -> prev's top
    from_prev = jax.lax.ppermute(
        a[tuple(lo_idx)], ax_name, [(i, i + 1) for i in range(n - 1)]
    )
    from_next = jax.lax.ppermute(
        a[tuple(hi_idx)], ax_name, [(i + 1, i) for i in range(n - 1)]
    )
    return jnp.concatenate([from_prev, a, from_next], axis=dim)


def _extend(a, names, mesh, lead=0):
    for d, ax in enumerate(names):
        if ax is not None and mesh.shape[ax] > 1:
            a = _halo_concat(a, d + lead, ax, mesh)
    return a


def _origin(names, mesh, local_shape):
    parts = []
    for d, ax in enumerate(names):
        if ax is None or mesh.shape[ax] == 1:
            parts.append(jnp.int32(0))
        else:
            parts.append(
                jax.lax.axis_index(ax).astype(jnp.int32) * local_shape[d]
                - _H
            )
    return jnp.stack(parts)


def _center(a, names, mesh, lead=0):
    idx = [slice(None)] * a.ndim
    for d, ax in enumerate(names):
        if ax is not None and mesh.shape[ax] > 1:
            idx[d + lead] = slice(_H, a.shape[d + lead] - _H)
    return a[tuple(idx)]


def _local_ext_shape(shape, spec, mesh):
    """Extended per-shard shape, or None if the sharding doesn't divide."""
    names = _axis_names(spec, len(shape))
    out = []
    for d, ax in enumerate(names):
        if ax is None or mesh.shape[ax] == 1:
            out.append(shape[d])
        else:
            if shape[d] % mesh.shape[ax]:
                return None
            out.append(shape[d] // mesh.shape[ax] + 2 * _H)
    return tuple(out)


def supported2(shape, dtype, kind, sharding) -> bool:
    from cedar_tpu.ops import pallas2

    ext = _local_ext_shape(shape, sharding.spec, sharding.mesh)
    return ext is not None and pallas2.supported(ext, dtype, kind)


def supported3(shape, dtype, kind, sharding) -> bool:
    from cedar_tpu.ops import pallas3

    names = _axis_names(sharding.spec, 3)
    # the z (lane) axis must stay unsharded: a z halo would break the
    # kernel's nz % 128 lane alignment
    if names[2] is not None and sharding.mesh.shape[names[2]] > 1:
        return False
    ext = _local_ext_shape(shape, sharding.spec, sharding.mesh)
    return ext is not None and pallas3.supported(ext, dtype, kind)


def point_relax2(sharding, so, q, b, kind, updown, fuse_residual=False):
    """Sharded fused 2D multicolor sweep (reference: MPI relax_GS)."""
    from cedar_tpu.ops import pallas2

    mesh = sharding.mesh
    names = _axis_names(sharding.spec, 2)
    fspec = P(*names)
    sspec = P(None, *names)

    def local(so_l, q_l, b_l):
        origin = _origin(names, mesh, q_l.shape)
        q_e = _extend(q_l, names, mesh)
        b_e = _extend(b_l, names, mesh)
        so_e = _extend(so_l, names, mesh, lead=1)
        diag = so_e[Dir2.O]
        so_e = so_e.at[Dir2.O].set(jnp.where(diag == 0, 1.0, diag))
        out = pallas2.point_relax(
            so_e, q_e, b_e, None, kind, updown, fuse_residual, origin=origin
        )
        if fuse_residual:
            return (_center(out[0], names, mesh),
                    _center(out[1], names, mesh))
        return _center(out, names, mesh)

    return jax.shard_map(
        local, mesh=mesh, in_specs=(sspec, fspec, fspec),
        out_specs=(fspec, fspec) if fuse_residual else fspec,
        check_vma=False,
    )(so, q, b)


def point_relax3(sharding, so, q, b, updown, fuse_residual=False,
                 kind=StencilKind.seven_pt):
    """Sharded fused 3D multicolor sweep (reference: MPI BMG3 relax)."""
    from cedar_tpu.ops import pallas3

    mesh = sharding.mesh
    names = _axis_names(sharding.spec, 3)
    fspec = P(*names)
    sspec = P(None, *names)

    def local(so_l, q_l, b_l):
        origin = _origin(names, mesh, q_l.shape)
        q_e = _extend(q_l, names, mesh)
        b_e = _extend(b_l, names, mesh)
        so_e = _extend(so_l, names, mesh, lead=1)
        diag = so_e[Dir3.P]
        so_e = so_e.at[Dir3.P].set(jnp.where(diag == 0, 1.0, diag))
        out = pallas3.point_relax(
            so_e, q_e, b_e, None, updown, fuse_residual, origin=origin,
            kind=kind,
        )
        if fuse_residual:
            return (_center(out[0], names, mesh),
                    _center(out[1], names, mesh))
        return _center(out, names, mesh)

    return jax.shard_map(
        local, mesh=mesh, in_specs=(sspec, fspec, fspec),
        out_specs=(fspec, fspec) if fuse_residual else fspec,
        check_vma=False,
    )(so, q, b)

"""Pallas TPU kernels for the 2D hot path.

The XLA formulation of multicolor relaxation (:mod:`cedar_tpu.ops.relax2`)
re-reads every operand from HBM once per color phase.  The Pallas sweep
kernel here performs ALL color phases (and optionally the trailing
residual) in ONE pass over HBM: each grid step DMAs a full-width slab of
``T + 2H`` rows into VMEM, runs the color phases on-chip (the inter-color
data dependence lives entirely in VMEM), and writes back the central ``T``
rows.  Per-sweep HBM traffic drops from ``ncolors × (reads + write)`` to
``~(1 + 2H/T) × reads + write``.

Design notes:

* full-width row slabs keep every DMA lane offset at 0 and every sublane
  offset a multiple of 8 (Mosaic's f32 tiling requirement) — hence the
  kernel requires ``nx % 8 == ny % 8 == 0`` and callers fall back to the
  XLA path otherwise (:func:`supported`);
* shifted reads are circular rolls (`pltpu.roll`): lane-wrap contributions
  are annihilated by the identically-zero boundary couplings of the
  symmetric storage convention (``so[W][0,:] == 0`` etc. — exactly how the
  interior-only convention encodes Dirichlet), and sublane-wrap
  contributions land in the discarded halo rows;
* a halo of H rows gives each color phase the progressively-shrinking
  valid region it needs (phase p is valid to slab depth p); H = 8 covers
  the deepest case (9-point: 4 phases + fused residual);
* color masks anchor to GLOBAL indices (the reference anchors its MPI
  sweeps to iGs/jGs parity, BMG2_SymStd_relax_GS.f90:95-99), so the result
  equals the dense XLA sweep up to FMA reassociation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cedar_tpu.core.types import Dir2, StencilKind

# Set True to run kernels in interpreter mode (CPU tests).
INTERPRET = False

_H = 8
_VMEM_BUDGET = 9 * 1024 * 1024


def _tile_rows(ny: int, ndir: int = 3, dtype_bytes: int = 4) -> int:
    """Rows per slab under the VMEM budget (multiple of 8, >= 8).

    Live slabs: q + b + ndir stencil planes in scratch, plus roughly
    ndir shifted coupling planes and a few working values on the compiler
    stack — budget for 5 + 2*ndir slab-sized buffers (validated against
    Mosaic's scoped-vmem accounting at ny=4096/2048).
    """
    rowbytes = ny * dtype_bytes
    total = _VMEM_BUDGET // ((5 + 2 * ndir) * rowbytes)
    t = (total - 2 * _H) // 8 * 8
    return max(t, 8)


def _tile_for(nx: int, ny: int, ndir: int) -> int:
    """Slab rows clamped so one slab never exceeds the grid."""
    return min(_tile_rows(ny, ndir), (nx - 2 * _H) // 8 * 8)


def _color_order(kind: StencilKind, updown: str):
    if kind == StencilKind.five_pt:
        return [0, 1] if updown == "down" else [1, 0]
    return (
        [(0, 0), (0, 1), (1, 0), (1, 1)]
        if updown == "down"
        else [(1, 1), (1, 0), (0, 1), (0, 0)]
    )


def _roll(a, dz, dw):
    """out[i, j] = a[i + dz, j + dw], circular (see module notes)."""
    out = a
    if dz:
        out = pltpu.roll(out, (-dz) % out.shape[0], 0)
    if dw:
        out = pltpu.roll(out, (-dw) % out.shape[1], 1)
    return out


def _shift_zero(a, dz, dw):
    """out[i, j] = a[i + dz, j + dw] with ZERO fill (dz, dw >= 0).

    Used for the up-shifted coupling planes: the zero-filled last row/col
    is what annihilates the circular q reads at the true high boundary
    (the low boundary is annihilated by the stored convention's own zeros).
    """
    out = a
    if dz:
        zrow = jnp.zeros((dz,) + a.shape[1:], a.dtype)
        out = jnp.concatenate([out[dz:], zrow], axis=0)
    if dw:
        zcol = jnp.zeros(out.shape[:1] + (dw,), a.dtype)
        out = jnp.concatenate([out[:, dw:], zcol], axis=1)
    return out


def _shifted_couplings(sos, nine: bool):
    """The phase-invariant coupling planes of the full 8-neighbor form."""
    W, S = sos[Dir2.W], sos[Dir2.S]
    cpl = {
        (-1, 0): W,
        (1, 0): _shift_zero(W, 1, 0),
        (0, -1): S,
        (0, 1): _shift_zero(S, 0, 1),
    }
    if nine:
        SW, NW = sos[Dir2.SW], sos[Dir2.NW]
        cpl.update({
            (-1, -1): SW,
            (1, -1): _shift_zero(NW, 1, 0),
            (-1, 1): _shift_zero(NW, 0, 1),
            (1, 1): _shift_zero(SW, 1, 1),
        })
    return cpl


def _offdiag_slab(cpl, q):
    """Σ couplings × neighbor values over the slab (circular q reads,
    annihilated at every boundary by the coupling zeros)."""
    acc = None
    for (dz, dw), c in cpl.items():
        term = c * _roll(q, dz, dw)
        acc = term if acc is None else acc + term
    return acc


def _sweep_kernel(
    orig_ref, so_hbm, b_hbm, q_hbm, out_hbm, res_hbm,
    qs, sos, bs, sems,
    *, kind, updown, T, nx, ny, fuse_residual,
):
    nine = kind != StencilKind.five_pt
    H = _H
    R = T + 2 * H
    i = pl.program_id(0)
    row0 = jnp.maximum(0, jnp.minimum(i * T - H, nx - R))
    # all terms are multiples of 8, but Mosaic cannot prove it through
    # max/min — rewrite as 8*(...//8) and hint
    row0 = pl.multiple_of((row0 // 8) * 8, 8)

    cps = [
        pltpu.make_async_copy(q_hbm.at[pl.ds(row0, R)], qs, sems.at[0]),
        pltpu.make_async_copy(so_hbm.at[:, pl.ds(row0, R)], sos, sems.at[1]),
        pltpu.make_async_copy(b_hbm.at[pl.ds(row0, R)], bs, sems.at[2]),
    ]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

    # color masks anchor to GLOBAL indices; orig_ref carries the global
    # index of local element (0, 0) (nonzero only under shard_map — the
    # sharded analogue of the reference's iGs/jGs anchoring)
    gi = (orig_ref[0] + row0
          + jax.lax.broadcasted_iota(jnp.int32, (R, ny), 0))
    gj = orig_ref[1] + jax.lax.broadcasted_iota(jnp.int32, (R, ny), 1)

    diag = sos[Dir2.O]
    cpl = _shifted_couplings(sos, nine)
    b = bs[:]
    rec = 1.0 / diag
    q = qs[:]
    for color in _color_order(kind, updown):
        if nine:
            cw, cz = color
            mask = ((gj % 2) == cw) & ((gi % 2) == cz)
        else:
            mask = ((gi + gj) % 2) == color
        upd = (b + _offdiag_slab(cpl, q)) * rec
        q = jnp.where(mask, upd, q)

    qs[:] = q
    ostart = jnp.maximum(0, jnp.minimum(i * T, nx - T))
    ostart = pl.multiple_of((ostart // 8) * 8, 8)
    loff = pl.multiple_of(((ostart - row0) // 8) * 8, 8)
    out = pltpu.make_async_copy(
        qs.at[pl.ds(loff, T)], out_hbm.at[pl.ds(ostart, T)], sems.at[0]
    )
    out.start()
    out.wait()

    if fuse_residual:
        res = b + _offdiag_slab(cpl, q) - diag * q
        bs[:] = res
        rout = pltpu.make_async_copy(
            bs.at[pl.ds(loff, T)], res_hbm.at[pl.ds(ostart, T)], sems.at[1]
        )
        rout.start()
        rout.wait()


def aligned(shape) -> bool:
    """Mosaic f32 tiling: sublane starts 8-aligned, lane slices 128-wide."""
    return shape[0] % 8 == 0 and shape[1] % 128 == 0


def supported(shape, dtype, kind=StencilKind.nine_pt) -> bool:
    """Pallas sweep applicability (else callers use the XLA path).

    Unaligned shapes are padded up (see :func:`point_relax_padded`), so
    only the padded tile budget gates."""
    nx, ny = shape
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        return False
    nxp = -(-nx // 8) * 8
    nyp = -(-ny // 128) * 128
    ndir = 3 if kind == StencilKind.five_pt else 5
    t = _tile_for(nxp, nyp, ndir)
    return t >= 32 and nyp >= 256


def point_relax(so, q, b, rec, kind, updown, fuse_residual=False,
                origin=None):
    """Dispatch: aligned shapes run the kernel directly; others pad up.

    The pad region is inert by construction: coupling planes pad with
    zeros (annihilating every read that crosses the pad boundary) and the
    diagonal pads with ONES so padded-point updates stay finite
    (``(0 + 0) * 1``), never contaminating real points.

    ``origin`` (traced (2,) int32, default zeros) is the global index of
    local element (0, 0) — nonzero only for per-shard calls under
    shard_map, where it keeps color parity globally anchored."""
    nx, ny = q.shape
    if origin is None:
        origin = jnp.zeros((2,), jnp.int32)
    if aligned((nx, ny)):
        return _point_relax_call(so, q, b, rec, kind, updown, fuse_residual,
                                 origin)
    nxp = -(-nx // 8) * 8
    nyp = -(-ny // 128) * 128
    pw = ((0, nxp - nx), (0, nyp - ny))
    so_p = jnp.pad(so, ((0, 0),) + pw)
    so_p = so_p.at[Dir2.O, nx:, :].set(1.0)
    so_p = so_p.at[Dir2.O, :, ny:].set(1.0)
    out = _point_relax_call(
        so_p, jnp.pad(q, pw), jnp.pad(b, pw), None, kind, updown,
        fuse_residual, origin,
    )
    if fuse_residual:
        return out[0][:nx, :ny], out[1][:nx, :ny]
    return out[:nx, :ny]


@functools.partial(
    jax.jit, static_argnames=("kind", "updown", "fuse_residual")
)
def _point_relax_call(so, q, b, rec, kind, updown, fuse_residual=False,
                      origin=None):
    """One full multicolor GS sweep in a single HBM pass.

    Drop-in replacement for cedar_tpu.ops.relax2.point_relax on supported
    shapes (non-periodic; ``rec`` is accepted for interface parity but the
    reciprocal is formed on-chip).  With ``fuse_residual`` also returns
    ``b - A q`` of the post-sweep iterate.
    """
    del rec
    nx, ny = q.shape
    ndir = so.shape[0]
    T = _tile_for(nx, ny, ndir)
    R = T + 2 * _H
    dtype = q.dtype
    if origin is None:
        origin = jnp.zeros((2,), jnp.int32)

    kernel = functools.partial(
        _sweep_kernel,
        kind=kind,
        updown=updown,
        T=T,
        nx=nx,
        ny=ny,
        fuse_residual=fuse_residual,
    )
    out_shapes = [
        jax.ShapeDtypeStruct((nx, ny), dtype),
        jax.ShapeDtypeStruct((nx, ny) if fuse_residual else (8, 128), dtype),
    ]
    anyspec = pl.BlockSpec(memory_space=pltpu.ANY)
    q_out, res = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(nx, T),),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [anyspec] * 3,
        out_specs=[anyspec, anyspec],
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((R, ny), dtype),          # q slab
            pltpu.VMEM((ndir, R, ny), dtype),    # stencil slab
            pltpu.VMEM((R, ny), dtype),          # b slab / residual staging
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=INTERPRET,
    )(origin, so, b, q)
    if fuse_residual:
        return q_out, res
    return q_out

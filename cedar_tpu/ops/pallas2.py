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
# Mosaic's scoped-vmem (compute temporaries) limit; the default 16 MB is
# below what one slab's color phases need at useful tile sizes.
_SCOPED_VMEM = 64 * 1024 * 1024


def _tile_for(nx: int, ny: int, ndir: int) -> int:
    """Slab rows: fixed 128 (the pipeline hides DMA latency; 2*H/T halo
    refetch is 12.5%), shrunk to one whole-grid slab for small grids."""
    del ny, ndir
    return 128 if nx >= 128 else -(-nx // 8) * 8


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


def _shifted_couplings(sos, nine: bool, per_y: bool = False):
    """The phase-invariant coupling planes of the full 8-neighbor form.

    With ``per_y`` the lane (w) component of the up-shift is a circular
    roll instead of a zero fill — the wrapped-in value is the coupling of
    the high-boundary point to its wrap neighbor (the XLA path's
    ``shift2(..., periodic)`` roll)."""

    def sh(a, dz, dw):
        if per_y and dw:
            a = _shift_zero(a, dz, 0) if dz else a
            return _roll(a, 0, dw)
        return _shift_zero(a, dz, dw)

    W, S = sos[Dir2.W], sos[Dir2.S]
    cpl = {
        (-1, 0): W,
        (1, 0): sh(W, 1, 0),
        (0, -1): S,
        (0, 1): sh(S, 0, 1),
    }
    if nine:
        SW, NW = sos[Dir2.SW], sos[Dir2.NW]
        cpl.update({
            (-1, -1): SW,
            (1, -1): sh(NW, 1, 0),
            (-1, 1): sh(NW, 0, 1),
            (1, 1): sh(SW, 1, 1),
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
    orig_ref, so_m, so_t, so_b, b_m, b_t, b_b, q_m, q_t, q_b,
    out_m, res_m,
    *, kind, updown, T, nx, ny, fuse_residual, periodic=(False, False),
):
    """One slab of the sweep: all color phases on a (T + 2H)-row window.

    The window is the mid block plus H-row halo blocks above/below, fed as
    separate pipelined input streams (Pallas double-buffers each stream, so
    slab k+1's fetch and slab k-1's writeback overlap slab k's phases).
    At the grid edges the halo block indices clamp and deliver duplicate
    rows; every read into them is annihilated — by the stored convention's
    zero boundary couplings at the low edge, and by the explicit
    ``gi``-mask on the up-shifted coupling planes at the high edge."""
    nine = kind != StencilKind.five_pt
    H = _H
    R = T + 2 * H
    i = pl.program_id(0)

    so = jnp.concatenate([so_t[...], so_m[...], so_b[...]], axis=1)
    b = jnp.concatenate([b_t[...], b_m[...], b_b[...]], axis=0)
    q = jnp.concatenate([q_t[...], q_m[...], q_b[...]], axis=0)

    # color masks anchor to GLOBAL indices; orig_ref carries the global
    # index of local element (0, 0) (nonzero only under shard_map — the
    # sharded analogue of the reference's iGs/jGs anchoring)
    row0 = i * T - H
    gi = (orig_ref[0] + row0
          + jax.lax.broadcasted_iota(jnp.int32, (R, ny), 0))
    gj = orig_ref[1] + jax.lax.broadcasted_iota(jnp.int32, (R, ny), 1)
    # local row index for the high-boundary coupling mask (gi is global
    # and must NOT be used here: under shard_map the local high edge is a
    # neighbor halo, and only the last row — discarded there — is masked)
    li = row0 + jax.lax.broadcasted_iota(jnp.int32, (R, ny), 0)
    himask = li < (nx - 1)

    diag = so[Dir2.O]
    cpl = _shifted_couplings(so, nine, per_y=periodic[1])
    # zero the up-shifted (dz=1) coupling planes at the true high edge:
    # _shift_zero's zero-fill lands at the WINDOW edge, which coincides
    # with the grid edge only when the last block has no halo duplicates.
    # Under x-periodicity the halo blocks WRAP instead of clamping, so
    # the last row's up-shifted coupling arrives from the wrapped block
    # (== plane row 0, the XLA roll) and must NOT be masked.
    if not periodic[0]:
        zero = jnp.zeros((), so.dtype)
        cpl = {
            off: (jnp.where(himask, c, zero) if off[0] > 0 else c)
            for off, c in cpl.items()
        }
    rec = 1.0 / diag
    for color in _color_order(kind, updown):
        if nine:
            cw, cz = color
            mask = ((gj % 2) == cw) & ((gi % 2) == cz)
        else:
            mask = ((gi + gj) % 2) == color
        upd = (b + _offdiag_slab(cpl, q)) * rec
        q = jnp.where(mask, upd, q)

    out_m[:] = q[H : H + T]
    if fuse_residual:
        res = b + _offdiag_slab(cpl, q) - diag * q
        res_m[:] = res[H : H + T]


def aligned(shape) -> bool:
    """Mosaic f32 tiling: sublane starts 8-aligned, lane slices 128-wide."""
    return shape[0] % 8 == 0 and shape[1] % 128 == 0


def _padded_dims(nx: int, ny: int):
    """(nxp, nyp, T): lane width to 128, rows to a multiple of the slab."""
    nyp = -(-ny // 128) * 128
    nxp8 = -(-nx // 8) * 8
    T = _tile_for(nxp8, nyp, 0)
    nxp = -(-nxp8 // T) * T
    return nxp, nyp, T


def supported(shape, dtype, kind=StencilKind.nine_pt,
              periodic=(False, False)) -> bool:
    """Pallas sweep applicability (else callers use the XLA path).

    Unaligned shapes are padded up (see :func:`point_relax`), so only the
    padded dimensions gate — except along PERIODIC axes, where the wrap
    must land on the true opposite row/column and the extent must already
    be aligned (x: 8-row blocks and a whole number of slabs; y: 128
    lanes)."""
    del kind
    nx, ny = shape
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        return False
    nxp, nyp, t = _padded_dims(nx, ny)
    if periodic[0] and nxp != nx:
        return False
    if periodic[1] and nyp != ny:
        return False
    return t >= 32 and 256 <= nyp <= 6144


def point_relax(so, q, b, rec, kind, updown, fuse_residual=False,
                origin=None, periodic=(False, False)):
    """Dispatch: aligned shapes run the kernel directly; others pad up.

    The pad region is inert by construction: coupling planes pad with
    zeros (annihilating every read that crosses the pad boundary) and the
    diagonal pads with ONES so padded-point updates stay finite
    (``(0 + 0) * 1``), never contaminating real points.  Periodic axes
    must be pre-aligned (:func:`supported` gates) — their wrap reads the
    true opposite boundary.

    ``origin`` (traced (2,) int32, default zeros) is the global index of
    local element (0, 0) — nonzero only for per-shard calls under
    shard_map, where it keeps color parity globally anchored."""
    nx, ny = q.shape
    if origin is None:
        origin = jnp.zeros((2,), jnp.int32)
    nxp, nyp, _ = _padded_dims(nx, ny)
    if (nx, ny) == (nxp, nyp):
        return _point_relax_call(so, q, b, rec, kind, updown, fuse_residual,
                                 origin, periodic)
    assert not (periodic[0] and nxp != nx)
    assert not (periodic[1] and nyp != ny)
    pw = ((0, nxp - nx), (0, nyp - ny))
    so_p = jnp.pad(so, ((0, 0),) + pw)
    so_p = so_p.at[Dir2.O, nx:, :].set(1.0)
    so_p = so_p.at[Dir2.O, :, ny:].set(1.0)
    out = _point_relax_call(
        so_p, jnp.pad(q, pw), jnp.pad(b, pw), None, kind, updown,
        fuse_residual, origin, periodic,
    )
    if fuse_residual:
        return out[0][:nx, :ny], out[1][:nx, :ny]
    return out[:nx, :ny]


@functools.partial(
    jax.jit, static_argnames=("kind", "updown", "fuse_residual", "periodic")
)
def _point_relax_call(so, q, b, rec, kind, updown, fuse_residual=False,
                      origin=None, periodic=(False, False)):
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
    assert nx % T == 0 and ny % 128 == 0
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
        periodic=periodic,
    )
    out_shapes = [
        jax.ShapeDtypeStruct((nx, ny), dtype),
        jax.ShapeDtypeStruct((nx, ny) if fuse_residual else (8, 128), dtype),
    ]
    tb = T // 8
    nb = nx // 8 - 1  # highest valid 8-row block index

    def mid2(i):
        return (i, 0)

    if periodic[0]:
        # halo blocks WRAP to the opposite grid edge: the boundary rows'
        # neighbor reads (and their up-shifted coupling planes) arrive
        # from the true wrap rows instead of clamped duplicates
        def top2(i):
            return ((i * tb - 1) % (nb + 1), 0)

        def bot2(i):
            return (((i + 1) * tb) % (nb + 1), 0)

        def top3(i):
            return (0, (i * tb - 1) % (nb + 1), 0)

        def bot3(i):
            return (0, ((i + 1) * tb) % (nb + 1), 0)
    else:
        def top2(i):
            return (jnp.maximum(i * tb - 1, 0), 0)

        def bot2(i):
            return (jnp.minimum((i + 1) * tb, nb), 0)

        def top3(i):
            return (0, jnp.maximum(i * tb - 1, 0), 0)

        def bot3(i):
            return (0, jnp.minimum((i + 1) * tb, nb), 0)

    def mid3(i):
        return (0, i, 0)

    q_out, res = pl.pallas_call(
        kernel,
        grid=(nx // T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((ndir, T, ny), mid3),
            pl.BlockSpec((ndir, _H, ny), top3),
            pl.BlockSpec((ndir, _H, ny), bot3),
            pl.BlockSpec((T, ny), mid2),
            pl.BlockSpec((_H, ny), top2),
            pl.BlockSpec((_H, ny), bot2),
            pl.BlockSpec((T, ny), mid2),
            pl.BlockSpec((_H, ny), top2),
            pl.BlockSpec((_H, ny), bot2),
        ],
        out_specs=[
            pl.BlockSpec((T, ny), mid2),
            pl.BlockSpec((T, ny), mid2) if fuse_residual
            else pl.BlockSpec((8, 128), lambda i: (0, 0)),
        ],
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_SCOPED_VMEM,
        ),
        interpret=INTERPRET,
    )(origin, so, so, so, b, b, b, q, q, q)
    if fuse_residual:
        return q_out, res
    return q_out

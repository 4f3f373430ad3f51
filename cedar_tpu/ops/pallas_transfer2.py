"""Hybrid Pallas/XLA kernels for the 2D grid transfers (restrict/interp_add).

The XLA formulations (:mod:`cedar_tpu.ops.interp2`) materialize every
parity split, shift, pad and merge as an HBM round trip — measured
1.3-1.7 ms each at 4096² f32 against ~0.35-0.55 ms traffic floors.

Division of labor (Mosaic supports SUBLANE reshapes in-kernel but not
LANE reshapes, probed):

* XLA: the lane-parity split of the residual (one fused pass via
  reshape + minor-index, ~0.2 ms at 4096²) and the final lane/row merge
  of the interpolation parts (interleave2);
* Pallas: everything else — row-parity splits, CI-weighted sums, the
  res/diag correction — streaming row slabs with zero intermediate HBM
  traffic.  The 8 CI weight planes stream from a PRE-PADDED copy built
  once at setup (:func:`pad_ci`), and 1/diag streams from a setup-built
  lane-split copy (:func:`setup_rec2`).

Math is exactly :func:`cedar_tpu.ops.interp2.restrict` /
:func:`~cedar_tpu.ops.interp2.interp_add` (reference:
BMG2_SymStd_restrict.f90:76-92, BMG2_SymStd_interp_add.f90:101-137), terms
summed in the same order.  Non-periodic only — callers gate and fall back
to the XLA path.

Boundary semantics mirror the dense path: out-of-range fine/coarse reads
are zeros (pad regions are zero-filled; the CI planes' unset row/column 0
annihilate the clamped top-halo duplicates)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cedar_tpu.core.parity import _split_axis, interleave2
from cedar_tpu.core.types import Dir2, InterpDir2 as L

INTERPRET = False

_TC = 64            # coarse rows per grid step (fine slab: 128 rows)
_H = 8
_SCOPED_VMEM = 64 * 1024 * 1024   # Mosaic compute-temporary (stack) limit


def fine_pad_dims(nx: int, ny: int):
    """Padded fine dims: rows to a multiple of 2*_TC, lanes to a multiple
    of 256 (so half-width lanes stay 128-aligned)."""
    nxp = -(-nx // (2 * _TC)) * (2 * _TC)
    nyp = -(-ny // 256) * 256
    return nxp, nyp


def supported(fine_shape, dtype) -> bool:
    nx, ny = fine_shape
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        return False
    nxp, nyp = fine_pad_dims(nx, ny)
    # small grids stay on the XLA path (padding overhead dominates)
    return 256 <= nyp <= 8192 and nx >= 2 * _TC


def pad_ci(ci: jnp.ndarray, nx: int, ny: int) -> jnp.ndarray:
    """Zero-pad CI once at setup: (8, nxc+1, nyc+1) -> (8, nxp/2+8, nyp/2+128).

    ``(nx, ny)`` are the FINE dims of the level this CI interpolates to."""
    nxp, nyp = fine_pad_dims(nx, ny)
    rows = nxp // 2 + _H
    cols = nyp // 2 + 128
    return jnp.pad(
        ci,
        ((0, 0), (0, rows - ci.shape[1]), (0, cols - ci.shape[2])),
    )


def setup_rec2(so: jnp.ndarray) -> jnp.ndarray:
    """Lane-split reciprocal diagonal, built once at setup: (2, nxp, W)
    with plane 0 = 1/diag at even columns, plane 1 at odd columns."""
    diag = so[Dir2.O]
    nx, ny = diag.shape
    nxp, nyp = fine_pad_dims(nx, ny)
    rec = jnp.where(diag == 0, 1.0, 1.0 / diag)
    rec = jnp.pad(rec, ((0, nxp - nx), (0, nyp - ny)))
    e, o = _split_axis(rec, 1)
    return jnp.stack([e, o])


def lane_split_res(res: jnp.ndarray) -> jnp.ndarray:
    """Pad the residual to the kernel dims and lane-split: (2, nxp, W).

    One fused XLA pass; shared by restrict and interp_add."""
    nx, ny = res.shape
    nxp, nyp = fine_pad_dims(nx, ny)
    if (nx, ny) != (nxp, nyp):
        res = jnp.pad(res, ((0, nxp - nx), (0, nyp - ny)))
    e, o = _split_axis(res, 1)
    return jnp.stack([e, o])


def _row_split(a):
    """(2r, W) -> rows 2k and 2k+1 (sublane reshape — Mosaic-supported)."""
    r = a.reshape(a.shape[0] // 2, 2, a.shape[1])
    return r[:, 0], r[:, 1]


def _shr(a):
    """out[:, w] = a[:, w-1], zero at w = 0 (roll + mask: Mosaic does not
    support unaligned lane concatenation)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, a.ndim - 1)
    return jnp.where(lane == 0, 0.0, pltpu.roll(a, 1, a.ndim - 1))


def _shl(a):
    """out[:, w] = a[:, w+1], zero at the high edge."""
    n = a.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, a.ndim - 1)
    return jnp.where(lane == n - 1, 0.0, pltpu.roll(a, n - 1, a.ndim - 1))


# ---------------------------------------------------------------------------
# restrict: qc = Pᵀ res
# ---------------------------------------------------------------------------

def _restrict_kernel(r2_t, r2_m, ci_m, ci_b, out, *, Tc, W):
    win = jnp.concatenate([r2_t[...], r2_m[...]], axis=1)  # (2, 2Tc+8, W)
    E0, E1 = _row_split(win[0])       # res[2k, 2w] / res[2k+1, 2w]
    O0, O1 = _row_split(win[1])       # res[2k, 2w+1] / res[2k+1, 2w+1]
    h = _H // 2                       # halo: 8 fine rows = 4 row pairs

    c = E0[h : h + Tc]                  # res[2zc, 2wc]
    w_ = E1[h - 1 : h - 1 + Tc]         # res[2zc-1, 2wc]
    e_ = E1[h : h + Tc]                 # res[2zc+1, 2wc]
    s_ = _shr(O0)[h : h + Tc]           # res[2zc, 2wc-1]
    n_ = O0[h : h + Tc]                 # res[2zc, 2wc+1]
    sw = _shr(O1)[h - 1 : h - 1 + Tc]   # res[2zc-1, 2wc-1]
    se = _shr(O1)[h : h + Tc]           # res[2zc+1, 2wc-1]
    nw = O1[h - 1 : h - 1 + Tc]         # res[2zc-1, 2wc+1]
    ne = O1[h : h + Tc]                 # res[2zc+1, 2wc+1]

    ci = jnp.concatenate([ci_m[...], ci_b[...]], axis=1)

    def base(p):
        return ci[p, :Tc, :W]

    def rs(p):
        return ci[p, 1 : 1 + Tc, :W]

    def sl(p, ks):
        # CI[p, zc+ks, wc+1]: shift at FULL lane width first (column W —
        # the high-edge weight — must survive), then crop
        return _shl(ci[p, ks : ks + Tc])[:, :W]

    # same term order as ops.interp2.restrict (PW_TABLE iteration order)
    qc = c
    qc = qc + base(L.LR) * w_
    qc = qc + rs(L.LL) * e_
    qc = qc + base(L.LA) * s_
    qc = qc + sl(L.LB, 0) * n_
    qc = qc + base(L.LNE) * sw
    qc = qc + rs(L.LNW) * se
    qc = qc + sl(L.LSE, 0) * nw
    qc = qc + sl(L.LSW, 1) * ne
    out[...] = qc


@functools.partial(jax.jit, static_argnames=("nc",))
def _restrict_call(cip, res2, nc):
    _, nxp, W = res2.shape
    nyr = cip.shape[2]
    Tc = _TC
    nb = nxp // (2 * Tc)

    kernel = functools.partial(_restrict_kernel, Tc=Tc, W=W)
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((2, _H, W),
                         lambda i: (0,
                                    jnp.maximum(i * (2 * Tc // _H) - 1, 0),
                                    0)),
            pl.BlockSpec((2, 2 * Tc, W), lambda i: (0, i, 0)),
            pl.BlockSpec((8, Tc, nyr), lambda i: (0, i, 0)),
            pl.BlockSpec((8, _H, nyr),
                         lambda i: (0, (i + 1) * (Tc // _H), 0)),
        ],
        out_specs=pl.BlockSpec((Tc, W), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((nxp // 2, W), res2.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_SCOPED_VMEM),
        interpret=INTERPRET,
    )(res2, res2, cip, cip)
    return out[: nc[0], : nc[1]]


def restrict(cip, res2, nc):
    """``qc = Pᵀ res`` from the lane-split residual (non-periodic).

    ``cip`` from :func:`pad_ci`; ``res2`` from :func:`lane_split_res`;
    ``nc`` the true coarse shape."""
    return _restrict_call(cip, res2, tuple(nc))


# ---------------------------------------------------------------------------
# interp_add: q += P qc (+ res/diag at fine-only points)
# ---------------------------------------------------------------------------

def _interp_parts(qc_m, qc_b, ci_m, ci_b, r2_m, rec2_m, Tc, W):
    """The four fine parity parts of P·qc (+ res/diag correction).

    Full (128-aligned) lane width throughout; the wc+1 shifts are rolls
    at aligned width then crops (unaligned lane slices lower
    pathologically).  ``r2_m is None`` drops the res/diag correction
    entirely (the F-cycle's first interpolation of each level has an
    exactly-zero residual)."""
    qc = jnp.concatenate([qc_m[...], qc_b[...]], axis=0)
    ci = jnp.concatenate([ci_m[...], ci_b[...]], axis=1)

    def b0(a):
        return a[:Tc, :W]

    def b1r(a):
        return a[1 : 1 + Tc, :W]

    def s1l(a):
        return _shl(a[:Tc])[:, :W]

    def s1lr(a):
        return _shl(a[1 : 1 + Tc])[:, :W]

    if r2_m is None:
        r01 = r10 = r11 = 0.0
    else:
        E0, E1 = _row_split(r2_m[0])
        O0, O1 = _row_split(r2_m[1])
        rE0, rE1 = _row_split(rec2_m[0])
        rO0, rO1 = _row_split(rec2_m[1])
        r01 = O0 * rO0     # fine (2k, 2j+1)
        r10 = E1 * rE1     # fine (2k+1, 2j)
        r11 = O1 * rO1     # fine (2k+1, 2j+1)

    part00 = b0(qc)
    part01 = s1l(ci[L.LA]) * s1l(qc) + s1l(ci[L.LB]) * b0(qc) + r01
    part10 = b1r(ci[L.LR]) * b1r(qc) + b1r(ci[L.LL]) * b0(qc) + r10
    part11 = (
        s1lr(ci[L.LSW]) * b0(qc)
        + s1lr(ci[L.LNW]) * s1l(qc)
        + s1lr(ci[L.LNE]) * s1lr(qc)
        + s1lr(ci[L.LSE]) * b1r(qc)
        + r11
    )
    return part00, part01, part10, part11


def _interp_kernel(qc_m, qc_b, ci_m, ci_b, r2_m, rec2_m, parts, *, Tc, W):
    part00, part01, part10, part11 = _interp_parts(
        qc_m, qc_b, ci_m, ci_b, r2_m, rec2_m, Tc, W
    )
    parts[0] = part00
    parts[1] = part01
    parts[2] = part10
    parts[3] = part11


def _interp_kernel_split(qc_m, qc_b, ci_m, ci_b, r2_m, rec2_m, q2_m, out,
                         *, Tc, W):
    """Split-layout variant: row-interleave the parts in-kernel (a
    SUBLANE interleave — Mosaic-supported, unlike the lane interleave
    the dense variant leaves to XLA) and add onto the lane-parity-split
    q.  Kills the whole merge pass of the dense path."""
    part00, part01, part10, part11 = _interp_parts(
        qc_m, qc_b, ci_m, ci_b, r2_m, rec2_m, Tc, W
    )
    q2 = q2_m[...]

    def ileave(a, b):
        return jnp.stack([a, b], axis=1).reshape(2 * Tc, W)

    out[0] = q2[0] + ileave(part00, part10)
    out[1] = q2[1] + ileave(part01, part11)


@jax.jit
def _interp_call(cip, rec2, qc, res2):
    _, nxp, W = res2.shape
    rows = nxp // 2 + _H
    cols = W + 128
    qcp = jnp.zeros((rows, cols), qc.dtype)
    qcp = qcp.at[: qc.shape[0], : qc.shape[1]].set(qc)
    nyr = cip.shape[2]
    Tc = _TC
    nb = nxp // (2 * Tc)

    kernel = functools.partial(_interp_kernel, Tc=Tc, W=W)
    parts = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((Tc, cols), lambda i: (i, 0)),
            pl.BlockSpec((_H, cols), lambda i: ((i + 1) * (Tc // _H), 0)),
            pl.BlockSpec((8, Tc, nyr), lambda i: (0, i, 0)),
            pl.BlockSpec((8, _H, nyr),
                         lambda i: (0, (i + 1) * (Tc // _H), 0)),
            pl.BlockSpec((2, 2 * Tc, W), lambda i: (0, i, 0)),
            pl.BlockSpec((2, 2 * Tc, W), lambda i: (0, i, 0)),
        ],
        out_specs=pl.BlockSpec((4, Tc, W), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((4, nxp // 2, W), qc.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_SCOPED_VMEM),
        interpret=INTERPRET,
    )(qcp, qcp, cip, cip, res2, rec2)
    return parts


def interp_add(cip, rec2, qc, res2, q):
    """``q + P qc + res/diag`` (non-periodic).

    The Pallas kernel emits the four parity parts; the final lane/row merge
    runs as one fused XLA pass (Mosaic cannot lane-reshape in-kernel)."""
    nx, ny = q.shape
    parts = _interp_call(cip, rec2, qc, res2)
    _, nxh, W = parts.shape[0], parts.shape[1], parts.shape[2]
    merged = interleave2(
        {
            (0, 0): parts[0],
            (0, 1): parts[1],
            (1, 0): parts[2],
            (1, 1): parts[3],
        },
        2 * parts.shape[1],
        2 * W,
    )
    return q + merged[:nx, :ny]


# ---------------------------------------------------------------------------
# fused pre-smooth + residual + restrict, split layout
# ---------------------------------------------------------------------------

def _sweep_restrict_kernel(
    so_t, so_m, so_b, b_t, b_m, b_b, q_t, q_m, q_b, ci_m, ci_b,
    out_m, res_m, cb_m,
    *, kind, updown, T, nx, W, emit_res=True,
):
    """One slab of the multicolor sweep + residual + restriction.

    The split cycle's pre-smooth already fuses the residual; the
    restriction then re-read it from HBM.  Here the coarse rhs is formed
    from the residual while it is still in VMEM.  Validity: phases
    (≤ 4) + residual (1) leave rows [5, R-5) valid; the restriction of
    the mid coarse rows reads residual window rows [H-1, H+T] ⊂ that
    range.  Restriction term order mirrors _restrict_kernel
    (bit-identical coarse rhs)."""
    from cedar_tpu.core.types import StencilKind
    from cedar_tpu.ops.pallas2_split import (
        _offdiag_split, _split_couplings,
    )
    from cedar_tpu.ops.pallas2 import _color_order

    nine = kind != StencilKind.five_pt
    H = _H
    R = T + 2 * H
    Tc = T // 2
    i = pl.program_id(0)

    so = jnp.concatenate([so_t[...], so_m[...], so_b[...]], axis=2)
    b = jnp.concatenate([b_t[...], b_m[...], b_b[...]], axis=1)
    q = jnp.concatenate([q_t[...], q_m[...], q_b[...]], axis=1)
    q_planes = [q[0], q[1]]
    b_planes = [b[0], b[1]]
    rec = [1.0 / so[Dir2.O, 0], 1.0 / so[Dir2.O, 1]]

    row0 = i * T - H
    gi = row0 + jax.lax.broadcasted_iota(jnp.int32, (R, W), 0)
    himask = gi < (nx - 1)

    cpl = _split_couplings(so[:, 0], so[:, 1], nine)
    zero = jnp.zeros((), so.dtype)
    for p in (0, 1):
        cpl[p] = {
            off: ((jnp.where(himask, c, zero), ps, dl) if off[0] > 0
                  else (c, ps, dl))
            for off, (c, ps, dl) in cpl[p].items()
        }

    for color in _color_order(kind, updown):
        if nine:
            cw, cz = color
            p = cw
            mask = (gi % 2) == cz
            upd = (b_planes[p] + _offdiag_split(cpl[p], q_planes)) * rec[p]
            q_planes[p] = jnp.where(mask, upd, q_planes[p])
        else:
            for p in (0, 1):
                mask = ((gi + p) % 2) == color
                upd = (b_planes[p]
                       + _offdiag_split(cpl[p], q_planes)) * rec[p]
                q_planes[p] = jnp.where(mask, upd, q_planes[p])

    res = [
        b_planes[p] + _offdiag_split(cpl[p], q_planes)
        - so[Dir2.O, p] * q_planes[p]
        for p in (0, 1)
    ]
    out_m[...] = jnp.stack(q_planes)[:, H : H + T]
    if emit_res:
        res_m[...] = jnp.stack(res)[:, H : H + T]

    # -- restriction of the in-VMEM residual (mirrors _restrict_kernel) --
    # coarse output row c <-> fine window row 2c + H <-> row pair c + H/2
    E0, E1 = _row_split(res[0])
    O0, O1 = _row_split(res[1])
    h = H // 2

    c = E0[h : h + Tc]
    w_ = E1[h - 1 : h - 1 + Tc]
    e_ = E1[h : h + Tc]
    s_ = _shr(O0)[h : h + Tc]
    n_ = O0[h : h + Tc]
    sw = _shr(O1)[h - 1 : h - 1 + Tc]
    se = _shr(O1)[h : h + Tc]
    nw = O1[h - 1 : h - 1 + Tc]
    ne = O1[h : h + Tc]

    ci = jnp.concatenate([ci_m[...], ci_b[...]], axis=1)

    def base(p):
        return ci[p, :Tc, :W]

    def rs(p):
        return ci[p, 1 : 1 + Tc, :W]

    def sl(p, ks):
        return _shl(ci[p, ks : ks + Tc])[:, :W]

    qc = c
    qc = qc + base(L.LR) * w_
    qc = qc + rs(L.LL) * e_
    qc = qc + base(L.LA) * s_
    qc = qc + sl(L.LB, 0) * n_
    qc = qc + base(L.LNE) * sw
    qc = qc + rs(L.LNW) * se
    qc = qc + sl(L.LSE, 0) * nw
    qc = qc + sl(L.LSW, 1) * ne
    cb_m[...] = qc


@functools.partial(
    jax.jit, static_argnames=("kind", "updown", "nc", "emit_res")
)
def _sweep_restrict_call(so2, q2, b2, cip, kind, updown, nc,
                         emit_res=True):
    _, nxp, W = q2.shape
    ndir = so2.shape[0]
    nyr = cip.shape[2]
    T = 2 * _TC
    assert nxp % T == 0 and W % 128 == 0
    nb = nxp // T
    tb = T // 8
    nbf = nxp // 8 - 1

    kernel = functools.partial(
        _sweep_restrict_kernel, kind=kind, updown=updown, T=T, nx=nxp, W=W,
        emit_res=emit_res,
    )

    def fmid(i):
        return (0, i, 0)

    def ftop(i):
        return (0, jnp.maximum(i * tb - 1, 0), 0)

    def fbot(i):
        return (0, jnp.minimum((i + 1) * tb, nbf), 0)

    def fmid4(i):
        return (0, 0, i, 0)

    def ftop4(i):
        return (0, 0, jnp.maximum(i * tb - 1, 0), 0)

    def fbot4(i):
        return (0, 0, jnp.minimum((i + 1) * tb, nbf), 0)

    q_out, res2, cb = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((ndir, 2, _H, W), ftop4),
            pl.BlockSpec((ndir, 2, T, W), fmid4),
            pl.BlockSpec((ndir, 2, _H, W), fbot4),
            pl.BlockSpec((2, _H, W), ftop),
            pl.BlockSpec((2, T, W), fmid),
            pl.BlockSpec((2, _H, W), fbot),
            pl.BlockSpec((2, _H, W), ftop),
            pl.BlockSpec((2, T, W), fmid),
            pl.BlockSpec((2, _H, W), fbot),
            pl.BlockSpec((8, _TC, nyr), lambda i: (0, i, 0)),
            pl.BlockSpec((8, _H, nyr),
                         lambda i: (0, (i + 1) * (_TC // _H), 0)),
        ],
        out_specs=[
            pl.BlockSpec((2, T, W), fmid),
            pl.BlockSpec((2, T, W), fmid) if emit_res
            else pl.BlockSpec((2, 8, 128), lambda i: (0, 0, 0)),
            pl.BlockSpec((_TC, W), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((2, nxp, W), q2.dtype),
            jax.ShapeDtypeStruct(
                (2, nxp, W) if emit_res else (2, 8, 128), q2.dtype
            ),
            jax.ShapeDtypeStruct((nxp // 2, W), q2.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        interpret=INTERPRET,
    )(so2, so2, so2, b2, b2, b2, q2, q2, q2, cip, cip)
    return q_out, (res2 if emit_res else None), cb[: nc[0], : nc[1]]


def sweep_restrict_split(so2, q2, b2, cip, kind, updown, nc,
                         emit_res=True):
    """Fused final pre-sweep + residual + restriction, split layout.

    Returns ``(q2, res2, cb)``: the smoothed split iterate, its split
    residual, and the coarse rhs — one HBM pass instead of the sweep's
    plus the restriction's re-read of the residual.  With
    ``emit_res=False`` (the default cycle: interp_sweep_split recomputes
    the residual in-kernel) the residual is never written to HBM and the
    second return value is None.  Bit-identical to
    ``point_relax_split(fuse_residual)`` followed by :func:`restrict`.
    Serial, non-periodic.  Reference: BMG2_SymStd_relax_GS.f90:89-137 +
    BMG2_SymStd_restrict.f90:76-130."""
    return _sweep_restrict_call(so2, q2, b2, cip, kind, updown, tuple(nc),
                                emit_res)


# ---------------------------------------------------------------------------
# fused interp_add + post-smooth (+ optional residual), split layout
# ---------------------------------------------------------------------------

def _interp_sweep_kernel(
    qc_t, qc_m, qc_b, ci_t, ci_m, ci_b,
    so_t, so_m, so_b, b_t, b_m, b_b, q_t, q_m, q_b,
    out_m, res_m,
    *, kind, updown, T, nx, W, fuse_residual, fuse_norm=False,
):
    """One slab of ``interp_add`` followed by a full multicolor sweep.

    The separate kernels cost an extra write+read of the whole q plus a
    streamed 1/diag copy; here the interpolated iterate never leaves
    VMEM.  The pre-sweep residual feeding the fine-point correction is
    RECOMPUTED in-kernel from the streamed (so, b, q) — the split cycle
    therefore never writes it to HBM at all (callers must pass the q
    whose residual it is, i.e. the pre-smoothed iterate — the cycle's
    invariant).  Validity accounting (window = mid T rows + H-row halos,
    same scheme as the sweep kernels): the recomputed residual is valid
    on all but the outermost window row on each side (edge blocks:
    clamped-duplicate halo rows are garbage but every read into them is
    annihilated by the stored-zero boundary couplings, exactly as in the
    plain sweep kernel); the interpolation parts consume it pointwise;
    each color phase then shrinks validity by one row — 1 + 4 phases +
    residual = 6 ≤ H = 8.  ULP-level agreement (the in-kernel residual
    recompute changes compiler FMA contraction) with
    ``point_relax_split``'s fused residual + ``interp_add_split`` +
    ``point_relax_split``."""
    from cedar_tpu.core.types import StencilKind
    from cedar_tpu.ops.pallas2_split import (
        _offdiag_split, _split_couplings,
    )
    from cedar_tpu.ops.pallas2 import _color_order

    nine = kind != StencilKind.five_pt
    H = _H
    R = T + 2 * H
    RT = R // 2
    i = pl.program_id(0)

    qc = jnp.concatenate([qc_t[...], qc_m[...], qc_b[...]], axis=0)
    ci = jnp.concatenate([ci_t[...], ci_m[...], ci_b[...]], axis=1)
    so = jnp.concatenate([so_t[...], so_m[...], so_b[...]], axis=2)
    b = jnp.concatenate([b_t[...], b_m[...], b_b[...]], axis=1)
    q = jnp.concatenate([q_t[...], q_m[...], q_b[...]], axis=1)

    # 1/diag in-kernel (identical f32 values to the setup-built rec2 —
    # saves that whole input stream)
    rec = [1.0 / so[Dir2.O, 0], 1.0 / so[Dir2.O, 1]]

    row0 = i * T - H
    gi = row0 + jax.lax.broadcasted_iota(jnp.int32, (R, W), 0)
    himask = gi < (nx - 1)

    cpl = _split_couplings(so[:, 0], so[:, 1], nine)
    zero = jnp.zeros((), so.dtype)
    for p in (0, 1):
        cpl[p] = {
            off: ((jnp.where(himask, c, zero), ps, dl) if off[0] > 0
                  else (c, ps, dl))
            for off, (c, ps, dl) in cpl[p].items()
        }

    # -- pre-sweep residual, recomputed in-VMEM (same expression and
    # term order as the sweep kernels' fused residual) -------------------
    q_in = [q[0], q[1]]
    r2 = [
        b[p] + _offdiag_split(cpl[p], q_in) - so[Dir2.O, p] * q_in[p]
        for p in (0, 1)
    ]

    # -- interpolation parts over the WHOLE window -----------------------
    # window fine row pair k <-> global coarse row i*Tc - H/2 + k, which
    # sits at index k + H/2 of the coarse window (starting at i*Tc - H)
    h2 = H // 2

    def b0(a):
        return a[h2 : h2 + RT, :W]

    def b1r(a):
        return a[h2 + 1 : h2 + 1 + RT, :W]

    def s1l(a):
        return _shl(a[h2 : h2 + RT])[:, :W]

    def s1lr(a):
        return _shl(a[h2 + 1 : h2 + 1 + RT])[:, :W]

    E0, E1 = _row_split(r2[0])
    O0, O1 = _row_split(r2[1])
    rE0, rE1 = _row_split(rec[0])
    rO0, rO1 = _row_split(rec[1])
    r01 = O0 * rO0
    r10 = E1 * rE1
    r11 = O1 * rO1

    part00 = b0(qc)
    part01 = s1l(ci[L.LA]) * s1l(qc) + s1l(ci[L.LB]) * b0(qc) + r01
    part10 = b1r(ci[L.LR]) * b1r(qc) + b1r(ci[L.LL]) * b0(qc) + r10
    part11 = (
        s1lr(ci[L.LSW]) * b0(qc)
        + s1lr(ci[L.LNW]) * s1l(qc)
        + s1lr(ci[L.LNE]) * s1lr(qc)
        + s1lr(ci[L.LSE]) * b1r(qc)
        + r11
    )

    def ileave(a, bb):
        return jnp.stack([a, bb], axis=1).reshape(R, W)

    q_planes = [q[0] + ileave(part00, part10),
                q[1] + ileave(part01, part11)]
    b_planes = [b[0], b[1]]

    # -- multicolor sweep (same algebra as _sweep_kernel_split) ----------
    for color in _color_order(kind, updown):
        if nine:
            cw, cz = color
            p = cw
            mask = (gi % 2) == cz
            upd = (b_planes[p] + _offdiag_split(cpl[p], q_planes)) * rec[p]
            q_planes[p] = jnp.where(mask, upd, q_planes[p])
        else:
            for p in (0, 1):
                mask = ((gi + p) % 2) == color
                upd = (b_planes[p]
                       + _offdiag_split(cpl[p], q_planes)) * rec[p]
                q_planes[p] = jnp.where(mask, upd, q_planes[p])

    out = jnp.stack(q_planes)
    out_m[...] = out[:, H : H + T]
    if fuse_residual:
        res = jnp.stack([
            b_planes[p] + _offdiag_split(cpl[p], q_planes)
            - so[Dir2.O, p] * q_planes[p]
            for p in (0, 1)
        ])
        if fuse_norm:
            # partial res² sums in row 0 of an 8-row block (Mosaic's
            # sublane granularity); rows 1-7 zero — see pallas2_split
            r = res[:, H : H + T]
            s = jnp.sum(r * r, axis=(0, 1)).reshape(1, W)
            res_m[...] = jnp.concatenate(
                [s, jnp.zeros((7, W), s.dtype)], axis=0
            )
        else:
            res_m[...] = res[:, H : H + T]


@functools.partial(
    jax.jit, static_argnames=("kind", "updown", "fuse_residual",
                              "fuse_norm")
)
def interp_sweep_split(cip, qc, so2, b2, q2_presmoothed, kind, updown,
                       fuse_residual=False, fuse_norm=False):
    """``q2 + P qc + res/diag`` then one multicolor sweep, fused.

    Replaces :func:`interp_add_split` + ``pallas2_split.point_relax_split``
    in the split-resident cycle: saves the intermediate q write+read, the
    rec2 stream (1/diag is recomputed from so2 in-kernel), AND the whole
    residual round-trip — the fine-point correction's residual is
    recomputed in-VMEM from (so2, b2, q2_presmoothed), so it MUST be the
    pre-smoothed iterate whose residual was restricted (the cycle's
    invariant).  With ``fuse_residual`` also emits ``b - A q`` of the
    post-sweep iterate (the solve loop's convergence residual); with
    ``fuse_norm`` it emits per-block partial sums of res² instead
    ((nblocks, W); the residual never touches HBM).  Serial,
    non-periodic.  Reference semantics: BMG2_SymStd_interp_add.f90:101-137
    followed by BMG2_SymStd_relax_GS.f90:89-137."""
    q2 = q2_presmoothed
    fuse_residual = fuse_residual or fuse_norm
    _, nxp, W = q2.shape
    ndir = so2.shape[0]
    rows = nxp // 2 + _H
    cols = W + 128
    qcp = jnp.zeros((rows, cols), qc.dtype)
    qcp = qcp.at[: qc.shape[0], : qc.shape[1]].set(qc)
    nyr = cip.shape[2]
    T = 2 * _TC
    assert nxp % T == 0 and W % 128 == 0
    nb = nxp // T
    tb = T // 8
    nbf = nxp // 8 - 1          # highest fine 8-row block index
    nbq = rows // 8 - 1         # highest coarse 8-row block index
    cb = _TC // 8               # coarse mid block, in 8-row units

    kernel = functools.partial(
        _interp_sweep_kernel, kind=kind, updown=updown, T=T, nx=nxp, W=W,
        fuse_residual=fuse_residual, fuse_norm=fuse_norm,
    )

    def cmid2(i):
        return (i, 0)

    def ctop2(i):
        return (jnp.maximum(i * cb - 1, 0), 0)

    def cbot2(i):
        return (jnp.minimum((i + 1) * cb, nbq), 0)

    def cmid3(i):
        return (0, i, 0)

    def ctop3(i):
        return (0, jnp.maximum(i * cb - 1, 0), 0)

    def cbot3(i):
        return (0, jnp.minimum((i + 1) * cb, nbq), 0)

    def fmid(i):
        return (0, i, 0)

    def ftop(i):
        return (0, jnp.maximum(i * tb - 1, 0), 0)

    def fbot(i):
        return (0, jnp.minimum((i + 1) * tb, nbf), 0)

    def fmid4(i):
        return (0, 0, i, 0)

    def ftop4(i):
        return (0, 0, jnp.maximum(i * tb - 1, 0), 0)

    def fbot4(i):
        return (0, 0, jnp.minimum((i + 1) * tb, nbf), 0)

    if fuse_norm:
        res_shape = (8 * nb, W)
    elif fuse_residual:
        res_shape = (2, nxp, W)
    else:
        res_shape = (2, 8, 128)
    out_shapes = [
        jax.ShapeDtypeStruct((2, nxp, W), q2.dtype),
        jax.ShapeDtypeStruct(res_shape, q2.dtype),
    ]
    q_out, res = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((_H, cols), ctop2),
            pl.BlockSpec((_TC, cols), cmid2),
            pl.BlockSpec((_H, cols), cbot2),
            pl.BlockSpec((8, _H, nyr), ctop3),
            pl.BlockSpec((8, _TC, nyr), cmid3),
            pl.BlockSpec((8, _H, nyr), cbot3),
            pl.BlockSpec((ndir, 2, _H, W), ftop4),
            pl.BlockSpec((ndir, 2, T, W), fmid4),
            pl.BlockSpec((ndir, 2, _H, W), fbot4),
            pl.BlockSpec((2, _H, W), ftop),
            pl.BlockSpec((2, T, W), fmid),
            pl.BlockSpec((2, _H, W), fbot),
            pl.BlockSpec((2, _H, W), ftop),
            pl.BlockSpec((2, T, W), fmid),
            pl.BlockSpec((2, _H, W), fbot),
        ],
        out_specs=[
            pl.BlockSpec((2, T, W), fmid),
            pl.BlockSpec((8, W), lambda i: (i, 0)) if fuse_norm
            else (pl.BlockSpec((2, T, W), fmid) if fuse_residual
                  else pl.BlockSpec((2, 8, 128), lambda i: (0, 0, 0))),
        ],
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        interpret=INTERPRET,
    )(qcp, qcp, qcp, cip, cip, cip,
      so2, so2, so2, b2, b2, b2, q2, q2, q2)
    if fuse_residual:
        return q_out, res
    return q_out


def _interp_kernel_split_nores(qc_m, qc_b, ci_m, ci_b, out, *, Tc, W):
    """Split-layout P·qc with no residual correction and no q addend —
    the F-cycle's level-entry interpolation (fcycle.h:66-72: the new
    level's iterate IS the interpolant)."""
    part00, part01, part10, part11 = _interp_parts(
        qc_m, qc_b, ci_m, ci_b, None, None, Tc, W
    )

    def ileave(a, b):
        return jnp.stack([a, b], axis=1).reshape(2 * Tc, W)

    out[0] = ileave(part00, part10)
    out[1] = ileave(part01, part11)


@functools.partial(jax.jit, static_argnames=("nxp", "W"))
def interp_split_nores(cip, qc, nxp, W):
    """``x2 = P qc`` directly in the lane-parity-split fine layout.

    The F-cycle's per-level first interpolation has zero residual and a
    zero fine iterate; streaming res2/rec2/q2 there (measured 1.49 ms at
    4096² for the full interp_add vs ~0.45 ms of useful traffic) is pure
    waste, and emitting split layout feeds ncycle_split with no
    lane-split pass."""
    rows = nxp // 2 + _H
    cols = W + 128
    qcp = jnp.zeros((rows, cols), qc.dtype)
    qcp = qcp.at[: qc.shape[0], : qc.shape[1]].set(qc)
    nyr = cip.shape[2]
    Tc = _TC
    nb = nxp // (2 * Tc)

    kernel = functools.partial(_interp_kernel_split_nores, Tc=Tc, W=W)
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((Tc, cols), lambda i: (i, 0)),
            pl.BlockSpec((_H, cols), lambda i: ((i + 1) * (Tc // _H), 0)),
            pl.BlockSpec((8, Tc, nyr), lambda i: (0, i, 0)),
            pl.BlockSpec((8, _H, nyr),
                         lambda i: (0, (i + 1) * (Tc // _H), 0)),
        ],
        out_specs=pl.BlockSpec((2, 2 * Tc, W), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((2, nxp, W), qc.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_SCOPED_VMEM),
        interpret=INTERPRET,
    )(qcp, qcp, cip, cip)


@jax.jit
def interp_add_split(cip, rec2, qc, res2, q2):
    """``q2 + P qc + res/diag`` on the lane-parity-split fine level.

    ``q2``/``res2`` in the (2, nxp, W) split layout; the parity parts
    row-interleave IN-KERNEL onto q2 — no XLA merge pass (the dense
    variant's remaining ~0.7 ms at 4096²)."""
    _, nxp, W = res2.shape
    rows = nxp // 2 + _H
    cols = W + 128
    qcp = jnp.zeros((rows, cols), qc.dtype)
    qcp = qcp.at[: qc.shape[0], : qc.shape[1]].set(qc)
    nyr = cip.shape[2]
    Tc = _TC
    nb = nxp // (2 * Tc)

    kernel = functools.partial(_interp_kernel_split, Tc=Tc, W=W)
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((Tc, cols), lambda i: (i, 0)),
            pl.BlockSpec((_H, cols), lambda i: ((i + 1) * (Tc // _H), 0)),
            pl.BlockSpec((8, Tc, nyr), lambda i: (0, i, 0)),
            pl.BlockSpec((8, _H, nyr),
                         lambda i: (0, (i + 1) * (Tc // _H), 0)),
            pl.BlockSpec((2, 2 * Tc, W), lambda i: (0, i, 0)),
            pl.BlockSpec((2, 2 * Tc, W), lambda i: (0, i, 0)),
            pl.BlockSpec((2, 2 * Tc, W), lambda i: (0, i, 0)),
        ],
        out_specs=pl.BlockSpec((2, 2 * Tc, W), lambda i: (0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((2, nxp, W), qc.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_SCOPED_VMEM),
        interpret=INTERPRET,
    )(qcp, qcp, cip, cip, res2, rec2, q2)

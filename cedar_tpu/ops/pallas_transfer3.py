"""Pallas kernel for the 3D restriction (hybrid with XLA parity ops).

Same division of labor as the 2D hybrids (:mod:`pallas_transfer2`): Mosaic
cannot lane-reshape in-kernel, so the z (lane) parity split of the
residual runs as a fused XLA pass; x parity is a leading-dim reshape and
y parity a setup-time pre-split, both free for the kernel.  Unlike 2D,
the interpolation weights stream from the PER-COARSE-POINT footprint
(:func:`cedar_tpu.ops.interp3.pw_weights`) stacked and padded once at
setup, so the kernel needs no CI index shifts.  The 27 weight planes are
the dominant stream (27/8 of the fine grid, ~2x more after lane padding
at power-of-two-plus-one coarse sizes), so the block row count ``Tc`` is
chosen per shape to fit VMEM and halo blocks are single rows (x-rows are
leading dims — no tile granularity).

Only RESTRICTION is implemented here.  A matching interp_add kernel was
built twice and measured no better than the XLA path both times: 5.4 vs
1.5 ms at 257^3 f32 (padded weight stream ~2x + parity merges), and in
round 2 a rebuilt split-consuming variant (same res4 input as restrict,
rec4 = split 1/diag, parity pieces merged by one fused XLA pass) at the
ALIGNED 256^3 shape: 1.27 vs 1.22 ms — XLA's fused formulation is
already at this op's practical floor (the 27-plane coarse weight stream
dominates either way).  interp_add stays on XLA
(:func:`cedar_tpu.ops.interp3.interp_add`).  Restriction measured
2.7 ms (XLA) -> 1.3 ms here at 257^3 f32.

Math is exactly :func:`cedar_tpu.ops.interp3.restrict` (reference:
BMG3_SymStd_restrict.f90:115-145), terms summed in the same offset order
(bit-exact on-device).  Non-periodic only; callers gate and fall back to
the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cedar_tpu.core.parity import _split_axis
from cedar_tpu.core.types import Dir3

INTERPRET = False

_TC = 16            # x-pad granularity: coarse rows (fine slab: 32 rows)
_BUDGET = 35 * 1024 * 1024   # single-buffered block bytes per kernel

# offset order shared by both kernels and the XLA reference: the
# PW3_TABLE iteration order of ops.interp3 (restrict sums in this order)
from cedar_tpu.ops.interp3 import PW3_TABLE, pw_weights  # noqa: E402

_OFFSETS = [(0, 0, 0)] + list(PW3_TABLE.keys())


def _pad_dims(nx, ny, nz):
    """Fine padded dims for the kernels: x rows to a slab multiple, y to
    an even-sublane multiple, z to an even-lane multiple."""
    nxp = -(-nx // (2 * _TC)) * (2 * _TC)
    nyp = -(-ny // 16) * 16      # halves stay 8-aligned
    nzp = -(-nz // 256) * 256    # halves stay 128-aligned
    return nxp, nyp, nzp


def _row_bytes(ny2, nz2, wy, wz):
    return ny2 * nz2 * 4, wy * wz * 4


def _pick_tc(nxp, ny2, nz2, wy, wz):
    """Largest block row count whose restriction block set fits the VMEM
    budget (dominant stream: 27 weight rows per coarse row)."""
    fb, wb = _row_bytes(ny2, nz2, wy, wz)
    for tc in (16, 8, 4, 2):
        if (nxp // 2) % tc:
            continue
        blk = 4 * 2 * fb + 4 * 2 * tc * fb + 27 * tc * wb + tc * fb
        if blk <= _BUDGET:
            return tc
    return None


def supported(fine_shape, dtype) -> bool:
    nx, ny, nz = fine_shape
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        return False
    nxp, nyp, nzp = _pad_dims(nx, ny, nz)
    if (nx, ny, nz) != (nxp, nyp, nzp):
        return False          # the y/z parity split of a ragged fine grid
        # costs ~2 ms at 257^3 (pad + two staged lane/sublane splits) —
        # more than the kernel saves; XLA wins there
    if nx * ny * nz < 8 * 1024 * 1024:
        return False          # small grids: pallas call + split overhead
        # exceed the traffic win (XLA restrict ~2.6 ms vs 1.6 here at
        # 256^3; parity or worse below ~2M points)
    ny2, nz2 = nyp // 2, nzp // 2
    _, wy, wz = _w_dims(fine_shape)
    return _pick_tc(nxp, ny2, nz2, wy, wz) is not None


def _w_dims(fine_shape):
    """Stored weight-plane extents: the aligned minimum covering the
    coarse grid — this is the dominant HBM stream, keep it tight.

    The supported() gate requires aligned fine dims, so the coarse grid
    is exactly (nxp/2, nyp/2, nzp/2) — no guard columns: consumers that
    need a +1-shifted read (interp) use zero-masked rolls instead, which
    is exact because the would-be guard entries are identically zero
    (weights toward nonexistent high coarse points)."""
    nxp, nyp, nzp = _pad_dims(*fine_shape)
    rows = nxp // 2 + 1
    return rows, nyp // 2, nzp // 2


def setup_pw3(ci: jnp.ndarray, fine_shape) -> jnp.ndarray:
    """Stack the 27 per-coarse-point weight planes, padded once at setup.

    Plane 0 is the coincident (identity) weight; planes 1..26 follow
    _OFFSETS order, padded to the :func:`_w_dims` extents."""
    pw = pw_weights(ci)
    rows, ys, zs = _w_dims(fine_shape)
    out = []
    for off in _OFFSETS:
        a = pw[off]
        out.append(jnp.pad(a, ((0, rows - a.shape[0]),
                               (0, ys - a.shape[1]),
                               (0, zs - a.shape[2]))))
    return jnp.stack(out)


def _split_yz(a):
    """(nxp, nyp, nzp) -> (4, nxp, nyp/2, nzp/2): index 2*py + pz."""
    y0, y1 = _split_axis(a, 1)
    parts = []
    for py in (y0, y1):
        z0, z1 = _split_axis(py, 2)
        parts.extend([z0, z1])
    return jnp.stack(parts)


def split_res(res: jnp.ndarray) -> jnp.ndarray:
    """Pad the residual and y/z-parity split it (one fused XLA pass)."""
    nx, ny, nz = res.shape
    nxp, nyp, nzp = _pad_dims(nx, ny, nz)
    if (nx, ny, nz) != (nxp, nyp, nzp):
        res = jnp.pad(res, ((0, nxp - nx), (0, nyp - ny), (0, nzp - nz)))
    return _split_yz(res)


def _shift_y(a, d):
    """out[..., yc, :] = a[..., yc + d, :], zero fill (sublane concat)."""
    if d == 0:
        return a
    z = jnp.zeros(a.shape[:-2] + (abs(d),) + a.shape[-1:], a.dtype)
    if d > 0:
        return jnp.concatenate([a[..., d:, :], z], axis=-2)
    return jnp.concatenate([z, a[..., :d, :]], axis=-2)


def _shift_z(a, d):
    """out[..., kc] = a[..., kc + d], zero fill (lane roll + mask)."""
    if d == 0:
        return a
    n = a.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, a.ndim - 1)
    rolled = pltpu.roll(a, (-d) % n, a.ndim - 1)
    if d > 0:
        return jnp.where(lane >= n - d, 0.0, rolled)
    return jnp.where(lane < -d, 0.0, rolled)


def _fine_sample(ev_parts, od_parts, off, h, Tc):
    """res[2zc+dx, 2yc+dy, 2kc+dz] for zc in the block, as shifts of the
    x-parity-split window arrays.

    ``ev_parts[i]``/``od_parts[i]`` hold the even/odd fine-x rows of y/z
    parity class i, with window row k = coarse row zc0 - h + k."""
    dx, dy, dz = off
    py, pz = dy % 2, dz % 2
    sy, sz = (dy - py) // 2, (dz - pz) // 2
    i = 2 * py + pz
    if dx % 2 == 0:
        rows = ev_parts[i][h + dx // 2: h + dx // 2 + Tc]
    else:
        rows = od_parts[i][h + (dx - 1) // 2: h + (dx - 1) // 2 + Tc]
    if sy:
        rows = _shift_y(rows, sy)
    if sz:
        rows = _shift_z(rows, sz)
    return rows


def _restrict_kernel(r4_t, r4_m, w_m, out, *, Tc, W2):
    # window: (4, 2Tc+2, ny2, nz2); x-parity split on the leading row dim
    win = jnp.concatenate([r4_t[...], r4_m[...]], axis=1)
    R = win.shape[1]
    ev_parts = []
    od_parts = []
    for i in range(4):
        r = win[i].reshape(R // 2, 2, win.shape[2], win.shape[3])
        ev_parts.append(r[:, 0])
        od_parts.append(r[:, 1])
    h = 1                 # top halo 2 fine rows = 1 even + 1 odd

    ny2 = win.shape[2]
    w = w_m[...]
    qc = _fine_sample(ev_parts, od_parts, (0, 0, 0), h, Tc)
    for n, off in enumerate(_OFFSETS[1:], start=1):
        qc = qc + w[n, :Tc, :ny2, :W2] * _fine_sample(
            ev_parts, od_parts, off, h, Tc)
    out[...] = qc


@functools.partial(jax.jit, static_argnames=("nc",))
def _restrict_call(pw3, res4, nc):
    _, nxp, ny2, nz2 = res4.shape
    wy, wz = pw3.shape[2], pw3.shape[3]
    Tc = _pick_tc(nxp, ny2, nz2, wy, wz)
    nb = nxp // (2 * Tc)

    kernel = functools.partial(_restrict_kernel, Tc=Tc, W2=nz2)
    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            # top halo: one even/odd fine row pair above the slab
            pl.BlockSpec((4, 2, ny2, nz2),
                         lambda i: (0, jnp.maximum(i * Tc - 1, 0), 0, 0)),
            pl.BlockSpec((4, 2 * Tc, ny2, nz2), lambda i: (0, i, 0, 0)),
            pl.BlockSpec((27, Tc, wy, wz), lambda i: (0, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((Tc, ny2, nz2), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nxp // 2, ny2, nz2), res4.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=INTERPRET,
    )(res4, res4, pw3)
    return out[: nc[0], : nc[1], : nc[2]]


def restrict(pw3, res4, nc):
    """``qc = Pᵀ res`` from the parity-split residual (non-periodic)."""
    return _restrict_call(pw3, res4, tuple(nc))

"""Lane-parity-resident 2D Pallas sweep (the fine-level fast path).

The dense sweep (:mod:`cedar_tpu.ops.pallas2`) leaves two XLA layout
passes in the fine-level cycle: the lane-parity split of the fused
residual feeding restrict (~0.2 ms at 4096²) and the lane/row interleave
merging the interpolation parts back into q (~0.7 ms).  Mosaic cannot
lane-reshape in-kernel, so those passes cannot fuse into the dense
kernels — but they vanish if the fine level is STORED lane-parity-split:
``q2/b2`` with shape (2, nx, W), plane 0 = even columns, plane 1 = odd
(W = padded ny / 2).  In that layout

* the sweep's shifted reads stay cheap: a dense lane shift by ±1 becomes
  a swap of the two parity planes plus at most a one-lane roll on one of
  them (derivation in :func:`_split_couplings`);
* color masks lose their lane dependence: a dense mask on ``j % 2`` is
  just the plane index, so 4-color phases each touch ONE plane and
  red-black masks depend on the row index only;
* the fused residual comes out already in the (2, nx, W) layout that
  :func:`cedar_tpu.ops.pallas_transfer2.restrict` consumes;
* the interpolation parts merge with SUBLANE interleaves (supported
  in-kernel) — see :func:`interp_add_split` in pallas_transfer2.

Math is exactly the reference's multicolor sweep
(BMG2_SymStd_relax_GS.f90:89-137, symmetric DOWN/UP orders :78-87),
same term order as the dense Pallas kernel (agreement to the ULP level;
the compiler's FMA contraction may differ between layouts).
Non-periodic, f32, serial (shard origins must keep an even column
offset; the sharded path keeps the dense kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cedar_tpu.core.parity import _split_axis, interleave2
from cedar_tpu.core.types import Dir2, StencilKind
from cedar_tpu.ops.pallas2 import _H, _SCOPED_VMEM, _color_order, _tile_for

INTERPRET = False


def split_dims(nx: int, ny: int):
    """(nxp, W, T): padded rows, half-width lanes, slab rows.

    Lane padding to 256 keeps both half-widths 128-aligned (the same
    rule as the transfer kernels' fine_pad_dims)."""
    nyp = -(-ny // 256) * 256
    nxp8 = -(-nx // 8) * 8
    T = _tile_for(nxp8, nyp, 0)
    nxp = -(-nxp8 // T) * T
    return nxp, nyp // 2, T


def supported(shape, dtype, kind=StencilKind.nine_pt) -> bool:
    del kind
    nx, ny = shape
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        return False
    nxp, W, t = split_dims(nx, ny)
    return t >= 32 and 128 <= W <= 6144


def lane_split(a: jnp.ndarray, nxp: int, W: int) -> jnp.ndarray:
    """Dense (nx, ny) -> padded split (2, nxp, W) (one fused XLA pass)."""
    nx, ny = a.shape
    if (nx, ny) != (nxp, 2 * W):
        a = jnp.pad(a, ((0, nxp - nx), (0, 2 * W - ny)))
    e, o = _split_axis(a, 1)
    return jnp.stack([e, o])


def lane_merge(a2: jnp.ndarray, nx: int, ny: int) -> jnp.ndarray:
    """Split (2, nxp, W) -> dense (nx, ny) (one fused XLA pass)."""
    nxp, W = a2.shape[1], a2.shape[2]
    rows = jnp.stack([a2[0], a2[1]], axis=2).reshape(nxp, 2 * W)
    return rows[:nx, :ny]


def split_so(so: jnp.ndarray, kind: StencilKind, nxp: int, W: int):
    """Setup-time split of the stencil planes: (ndir, 2, nxp, W).

    The diagonal pads with ONES (inert pad updates), couplings with
    zeros (annihilating every read across the pad boundary) — the same
    convention as the dense kernel's pad path."""
    del kind
    ndir, nx, ny = so.shape
    so_p = jnp.pad(so, ((0, 0), (0, nxp - nx), (0, 2 * W - ny)))
    so_p = so_p.at[Dir2.O, nx:, :].set(1.0)
    so_p = so_p.at[Dir2.O, :, ny:].set(1.0)
    e, o = _split_axis(so_p, 2)
    return jnp.stack([e, o], axis=1)


def _roll_rows(a, dz):
    return pltpu.roll(a, (-dz) % a.shape[0], 0) if dz else a


def _roll_lanes(a, dl):
    return pltpu.roll(a, (-dl) % a.shape[1], 1) if dl else a


def _shift_rows_zero(a, dz):
    """out[i] = a[i + dz] with zero fill (dz >= 0) — sublane concat."""
    if not dz:
        return a
    z = jnp.zeros((dz,) + a.shape[1:], a.dtype)
    return jnp.concatenate([a[dz:], z], axis=0)


def _shl_zero(a):
    """out[:, w] = a[:, w + 1], zero at the high lane edge."""
    lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    return jnp.where(lane == a.shape[1] - 1, 0.0,
                     pltpu.roll(a, a.shape[1] - 1, 1))


def _split_couplings(soe, soo, nine: bool):
    """Per-parity shifted coupling planes.

    Axis convention (= the dense kernel's): ``W`` couples across ROWS
    (axis 0, sublanes), ``S`` across COLUMNS (axis 1, lanes); offsets
    ``(dz, dw)`` mean the neighbor value ``q[i+dz, j+dw]``.

    Dense plane algebra in split space: a dense column shift
    ``P'[i,j] = P[i,j+1]`` becomes ``P'_e = P_o`` and
    ``P'_o = shl(P_e)`` (zero-filled); a dense row shift acts on each
    parity plane unchanged.  A neighbor read at column ``j + dw``
    becomes, for the parity-``p`` update, a read of plane
    ``p' = (p + dw) % 2`` at lane ``w + dl`` with
    ``dl = (p + dw - p') // 2`` — so every dense lane shift reduces to a
    plane swap plus at most a one-lane roll, whose wrap terms are
    annihilated by the same stored-zero boundary couplings as the dense
    kernel's rolls.

    Returns ``cpl[p][(dz, dw)] = (plane, p_src, dl)``, insertion order
    matching the dense kernel's accumulation order (bit-exact sums).
    """
    W_e, W_o = soe[Dir2.W], soo[Dir2.W]
    S_e, S_o = soe[Dir2.S], soo[Dir2.S]
    # dense row-shifted W (the E coupling), per parity
    Wu_e, Wu_o = _shift_rows_zero(W_e, 1), _shift_rows_zero(W_o, 1)
    # dense column-shifted S (the N coupling), in split space
    Sl_e, Sl_o = S_o, _shl_zero(S_e)
    cpl = [
        {  # updates of the EVEN plane (j = 2w)
            (-1, 0): (W_e, 0, 0),             # W: q_e[i-1, w]
            (1, 0): (Wu_e, 0, 0),             # E: q_e[i+1, w]
            (0, -1): (S_e, 1, -1),            # S: q_o[i, w-1]
            (0, 1): (Sl_e, 1, 0),             # N: q_o[i, w]
        },
        {  # updates of the ODD plane (j = 2w + 1)
            (-1, 0): (W_o, 1, 0),             # W: q_o[i-1, w]
            (1, 0): (Wu_o, 1, 0),             # E: q_o[i+1, w]
            (0, -1): (S_o, 0, 0),             # S: q_e[i, w]
            (0, 1): (Sl_o, 0, 1),             # N: q_e[i, w+1]
        },
    ]
    if nine:
        SW_e, SW_o = soe[Dir2.SW], soo[Dir2.SW]
        NW_e, NW_o = soe[Dir2.NW], soo[Dir2.NW]
        NWu_e, NWu_o = _shift_rows_zero(NW_e, 1), _shift_rows_zero(NW_o, 1)
        NWl_e, NWl_o = NW_o, _shl_zero(NW_e)
        SWu_e, SWu_o = _shift_rows_zero(SW_e, 1), _shift_rows_zero(SW_o, 1)
        SWul_e, SWul_o = SWu_o, _shl_zero(SWu_e)
        cpl[0].update({
            (-1, -1): (SW_e, 1, -1),          # q_o[i-1, w-1]
            (1, -1): (NWu_e, 1, -1),          # q_o[i+1, w-1]
            (-1, 1): (NWl_e, 1, 0),           # q_o[i-1, w]
            (1, 1): (SWul_e, 1, 0),           # q_o[i+1, w]
        })
        cpl[1].update({
            (-1, -1): (SW_o, 0, 0),           # q_e[i-1, w]
            (1, -1): (NWu_o, 0, 0),           # q_e[i+1, w]
            (-1, 1): (NWl_o, 0, 1),           # q_e[i-1, w+1]
            (1, 1): (SWul_o, 0, 1),           # q_e[i+1, w+1]
        })
    return cpl


def _offdiag_split(cpl_p, q_planes):
    """Σ couplings × neighbor reads for one parity plane's update.

    Same accumulation order as the dense kernel's _offdiag_slab (dict
    iteration order matches -- bit-identical sums)."""
    acc = None
    for (dz, dw), (c, p_src, dl) in cpl_p.items():
        qn = _roll_rows(q_planes[p_src], dz)
        if dl:
            qn = _roll_lanes(qn, dl)
        term = c * qn
        acc = term if acc is None else acc + term
    return acc


def _sweep_kernel_split(
    orig_ref, so_m, so_t, so_b, b_m, b_t, b_b, q_m, q_t, q_b,
    out_m, res_m,
    *, kind, updown, T, nx, W, fuse_residual, fuse_norm=False,
):
    nine = kind != StencilKind.five_pt
    H = _H
    R = T + 2 * H
    i = pl.program_id(0)

    so = jnp.concatenate([so_t[...], so_m[...], so_b[...]], axis=2)
    b = jnp.concatenate([b_t[...], b_m[...], b_b[...]], axis=1)
    q = jnp.concatenate([q_t[...], q_m[...], q_b[...]], axis=1)
    soe, soo = so[:, 0], so[:, 1]
    q_planes = [q[0], q[1]]
    b_planes = [b[0], b[1]]

    row0 = i * T - H
    gi = (orig_ref[0] + row0
          + jax.lax.broadcasted_iota(jnp.int32, (R, W), 0))
    li = row0 + jax.lax.broadcasted_iota(jnp.int32, (R, W), 0)
    himask = li < (nx - 1)

    cpl = _split_couplings(soe, soo, nine)
    zero = jnp.zeros((), so.dtype)
    # zero the up-shifted (dz = 1) planes at the true high row edge
    for p in (0, 1):
        cpl[p] = {
            off: ((jnp.where(himask, c, zero), ps, dl) if off[0] > 0
                  else (c, ps, dl))
            for off, (c, ps, dl) in cpl[p].items()
        }
    rec = [1.0 / soe[Dir2.O], 1.0 / soo[Dir2.O]]

    for color in _color_order(kind, updown):
        if nine:
            cw, cz = color
            p = cw            # lane parity = plane index
            mask = (gi % 2) == cz
            upd = (b_planes[p] + _offdiag_split(cpl[p], q_planes)) * rec[p]
            q_planes[p] = jnp.where(mask, upd, q_planes[p])
        else:
            for p in (0, 1):
                mask = ((gi + p + orig_ref[1]) % 2) == color
                upd = (b_planes[p]
                       + _offdiag_split(cpl[p], q_planes)) * rec[p]
                q_planes[p] = jnp.where(mask, upd, q_planes[p])

    out = jnp.stack(q_planes)
    out_m[...] = out[:, H: H + T]
    if fuse_residual:
        res = jnp.stack([
            b_planes[p] + _offdiag_split(cpl[p], q_planes)
            - so[:, p][Dir2.O] * q_planes[p]
            for p in (0, 1)
        ])
        if fuse_norm:
            # per-block partial sums of res² (the solve loop's convergence
            # norm) — the full residual never touches HBM.  Pad rows/lanes
            # contribute zero (q, b stay zero there; pad diag is 1).  The
            # sums land in row 0 of an 8-row block (Mosaic's sublane
            # granularity); rows 1-7 are zeros, so a plain sum over the
            # whole output is the squared norm.
            r = res[:, H: H + T]
            s = jnp.sum(r * r, axis=(0, 1)).reshape(1, W)
            res_m[...] = jnp.concatenate(
                [s, jnp.zeros((7, W), s.dtype)], axis=0
            )
        else:
            res_m[...] = res[:, H: H + T]


def point_relax_split(so2, q2, b2, kind, updown, fuse_residual=False,
                      origin=None, fuse_norm=False):
    """One full multicolor sweep on the lane-parity-split representation.

    ``so2`` from :func:`split_so` (padded at setup); ``q2``/``b2``
    (2, nxp, W) from :func:`lane_split`.  Returns the updated split q
    (and the split residual with ``fuse_residual``) — no dense round
    trip.  Bit-identical to the dense Pallas sweep on the merged
    arrays.  With ``fuse_norm`` (implies ``fuse_residual``) the second
    return value is instead a (nblocks, W) array of per-block partial
    sums of res² — ``sqrt(sum(...))`` is the l2 norm of the residual;
    the residual itself never leaves VMEM."""
    if origin is None:
        origin = jnp.zeros((2,), jnp.int32)
    return _point_relax_split_call(so2, q2, b2, kind, updown,
                                   fuse_residual or fuse_norm, origin,
                                   fuse_norm)


@functools.partial(
    jax.jit, static_argnames=("kind", "updown", "fuse_residual",
                              "fuse_norm")
)
def _point_relax_split_call(so2, q2, b2, kind, updown,
                            fuse_residual=False, origin=None,
                            fuse_norm=False):
    _, nxp, W = q2.shape
    ndir = so2.shape[0]
    T = _tile_for(nxp, 2 * W, ndir)
    assert nxp % T == 0 and W % 128 == 0
    dtype = q2.dtype
    if origin is None:
        origin = jnp.zeros((2,), jnp.int32)

    kernel = functools.partial(
        _sweep_kernel_split, kind=kind, updown=updown, T=T, nx=nxp, W=W,
        fuse_residual=fuse_residual, fuse_norm=fuse_norm,
    )
    if fuse_norm:
        res_shape = (8 * (nxp // T), W)
    elif fuse_residual:
        res_shape = (2, nxp, W)
    else:
        res_shape = (2, 8, 128)
    out_shapes = [
        jax.ShapeDtypeStruct((2, nxp, W), dtype),
        jax.ShapeDtypeStruct(res_shape, dtype),
    ]
    tb = T // 8
    nb = nxp // 8 - 1

    def mid(i):
        return (0, i, 0)

    def top(i):
        return (0, jnp.maximum(i * tb - 1, 0), 0)

    def bot(i):
        return (0, jnp.minimum((i + 1) * tb, nb), 0)

    def mid4(i):
        return (0, 0, i, 0)

    def top4(i):
        return (0, 0, jnp.maximum(i * tb - 1, 0), 0)

    def bot4(i):
        return (0, 0, jnp.minimum((i + 1) * tb, nb), 0)

    q_out, res = pl.pallas_call(
        kernel,
        grid=(nxp // T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((ndir, 2, T, W), mid4),
            pl.BlockSpec((ndir, 2, _H, W), top4),
            pl.BlockSpec((ndir, 2, _H, W), bot4),
            pl.BlockSpec((2, T, W), mid),
            pl.BlockSpec((2, _H, W), top),
            pl.BlockSpec((2, _H, W), bot),
            pl.BlockSpec((2, T, W), mid),
            pl.BlockSpec((2, _H, W), top),
            pl.BlockSpec((2, _H, W), bot),
        ],
        out_specs=[
            pl.BlockSpec((2, T, W), mid),
            pl.BlockSpec((8, W), lambda i: (i, 0)) if fuse_norm
            else (pl.BlockSpec((2, T, W), mid) if fuse_residual
                  else pl.BlockSpec((2, 8, 128), lambda i: (0, 0, 0))),
        ],
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_SCOPED_VMEM,
        ),
        interpret=INTERPRET,
    )(origin, so2, so2, so2, b2, b2, b2, q2, q2, q2)
    if fuse_residual:
        return q_out, res
    return q_out

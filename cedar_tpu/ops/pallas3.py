"""Pallas TPU kernels: fused 3D multicolor sweeps (7-point and 27-point).

Same blocked-pipeline design as the 2D sweep (:mod:`cedar_tpu.ops.pallas2`)
applied to a FLATTENED view: (nx, ny, nz) is processed as (nx, ny*nz) —
a free row-major reshape — so a y-shift is a lane roll by nz and a z-shift
a lane roll by 1.  Every wrap term of these rolls lands on a position
whose coupling is identically zero by the symmetric storage convention
(e.g. the z-up coupling of (j, nz-1) reads the shifted B plane at
(j+1, 0), and B[..., 0] == 0 stores the z-low boundary), so the flattened
sweep is exact — the same annihilation argument the 2D kernel uses for its
lane rolls.  This also makes lane padding cheap: ny*nz pads to a multiple
of 128 (e.g. 129³ pads 16641 -> 16768 lanes, +0.8%, where padding nz alone
would double the row).

Each grid step processes a full-width window of ``Tx + 2H`` x-rows, fed as
mid + H-row halo blocks that Pallas double-buffers (slab k+1's fetch and
slab k-1's writeback overlap slab k's phases).  All color phases (2 for
7-pt red-black, 8 for the 27-pt colors of BMG3_SymStd_relax_GS.f90:85-143)
plus the optional trailing residual run in ONE pass over HBM.  H = phases
+ 1.  Up-shifted-in-x coupling planes are masked at the true x high edge
(clamped halo-block duplicates — cf. pallas2).

Color masks anchor to GLOBAL indices via ``origin`` (the reference anchors
to iGs/jGs/kGs parity) so shard_map shards agree.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cedar_tpu.core.types import Dir3, StencilKind
from cedar_tpu.ops.stencil3 import NEIGHBOR_COUPLINGS_27

INTERPRET = False

_VMEM_BUDGET = 124 * 1024 * 1024   # streams + compute temps share VMEM


def _halo_for(kind: StencilKind) -> int:
    """phases + 1 (fused residual), rounded up to the 8-row block quantum
    (Pallas requires sublane block dims divisible by 8)."""
    return 8 if kind == StencilKind.seven_pt else 16


def _ndir(kind: StencilKind) -> int:
    return 4 if kind == StencilKind.seven_pt else 14


def _couple_table(kind: StencilKind, nz: int):
    """(row off, flat lane off) -> (plane, row shift, flat lane shift)."""
    if kind == StencilKind.seven_pt:
        table = {
            (-1, 0, 0): (Dir3.PW, (0, 0, 0)),
            (1, 0, 0): (Dir3.PW, (1, 0, 0)),
            (0, -1, 0): (Dir3.PS, (0, 0, 0)),
            (0, 1, 0): (Dir3.PS, (0, 1, 0)),
            (0, 0, -1): (Dir3.B, (0, 0, 0)),
            (0, 0, 1): (Dir3.B, (0, 0, 1)),
        }
    else:
        table = NEIGHBOR_COUPLINGS_27
    out = {}
    for (dx, dy, dz), (plane, (sx, sy, sz)) in table.items():
        out[(dx, dy * nz + dz)] = (plane, sx, sy * nz + sz)
    return out


def _tile_x(kind: StencilKind, kp: int, H: int, dtype_bytes: int = 4):
    """x-rows per slab under the VMEM budget (a multiple of the halo H).

    Budget: double-buffered streams of (q + b + ndir stencil) windows,
    plus compute temporaries — the halo+mid concatenations (a full window),
    every shifted coupling plane (Mosaic hoists them across the
    loop-invariant phase loop; measured, not avoidable by restructuring
    the Python), and ~8 working planes — and the double-buffered outputs."""
    nd = _ndir(kind)
    ncpl = 6 if kind == StencilKind.seven_pt else 26
    rowb = kp * dtype_bytes
    rows = _VMEM_BUDGET // rowb
    # scoped: concat window + per-phase rolls AND the fused-residual pass's
    # rolls (Mosaic schedules them eagerly; measured) + working planes
    per = 2 * (nd + 2) + (2 * ncpl + (nd + 2) + 8)
    tx = (rows - per * 2 * H) // (per + 4)
    tx = tx // H * H
    return tx


def _stream_bytes(kind, kp, H, Tx, fuse, dtype_bytes=4):
    """Pallas's own double-buffered block allocations for one call."""
    nd = _ndir(kind)
    nout = 2 if fuse else 1
    rows = 2 * (nd + 2) * (Tx + 2 * H) + 2 * nout * Tx
    return rows * kp * dtype_bytes


def _plan(kind: StencilKind, kp: int, updown: str, fuse_residual: bool,
          nx: int | None = None):
    """Sweep pass plan: [(phase_lo, phase_hi, H, Tx, fuse)] or None.

    The 27-point sweep's 8 colors need halo 16; when that does not fit the
    VMEM budget (large ny*nz), the sweep splits into two 4-color passes at
    halo 8 (the second carries the fused residual)."""
    nph = 2 if kind == StencilKind.seven_pt else 8

    def clamp(tx, H):
        if nx is not None and tx > 0:
            tx = min(tx, -(-nx // H) * H)
        return tx

    H1 = _halo_for(kind)
    tx = clamp(_tile_x(kind, kp, H1), H1)
    if tx >= H1:
        return [(0, nph, H1, tx, fuse_residual)]
    if kind == StencilKind.seven_pt:
        return None
    tx = clamp(_tile_x(kind, kp, 8), 8)
    if tx < 8:
        return None
    return [(0, 4, 8, tx, False), (4, 8, 8, tx, fuse_residual)]


def _dims(shape):
    nx, ny, nz = shape
    k = ny * nz
    kp = -(-k // 128) * 128
    return k, kp


def supported(shape, dtype, kind) -> bool:
    if kind not in (StencilKind.seven_pt, StencilKind.twenty_seven_pt):
        return False
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        return False
    nx, ny, nz = shape
    _, kp = _dims(shape)
    plan = _plan(kind, kp, "down", False, nx)
    if plan is not None and nx >= 2 * plan[0][2]:
        return True
    # rows too wide for the flattened kernel (e.g. 256^3): the 2D-tiled
    # pipelined variant tiles (x, y) with nine halo-block streams
    nzp = -(-nz // 128) * 128
    if nzp > 2 * nz + 64:
        return False
    tile = _tile2d_for(kind, nzp, nx, ny)
    return tile is not None and nx >= 2 * tile[2] and ny >= 2 * tile[3]


def _roll(a, dr, dl):
    out = a
    if dr:
        out = pltpu.roll(out, (-dr) % out.shape[0], 0)
    if dl:
        out = pltpu.roll(out, (-dl) % out.shape[1], 1)
    return out


def _shift_zero(a, sr, sl):
    """out[r, l] = a[r + sr, l + sl] with zero fill (sr, sl >= 0)."""
    out = a
    if sr:
        z = jnp.zeros((sr,) + a.shape[1:], a.dtype)
        out = jnp.concatenate([out[sr:], z], axis=0)
    if sl:
        z = jnp.zeros(out.shape[:1] + (sl,), a.dtype)
        out = jnp.concatenate([out[:, sl:], z], axis=1)
    return out


def _phase_mask(kind, updown, ph, x1, y1, z1):
    """Mask for phase ``ph`` of the reference sweep order
    (relax3.color_masks semantics), built lazily from the parity
    bit-planes (a precomputed mask list keeps 8 window-sized values live
    at once and blows VMEM)."""
    if kind == StencilKind.seven_pt:
        order = (0, 1) if updown == "up" else (1, 0)
        return ((x1 + y1 + z1) % 2) == order[ph]
    pts_order = list(range(1, 9) if updown == "up" else range(8, 0, -1))
    pts = pts_order[ph]
    cz = (pts - 1) % 2
    cw = ((pts - 1) // 2) % 2
    cv = ((pts - 1) // 4) % 2
    return (x1 == cz) & (y1 == cw) & (z1 == cv)


def _sweep_kernel(
    orig_ref, so_m, so_t, so_b, b_m, b_t, b_b, q_m, q_t, q_b,
    out_m, res_m,
    *, kind, updown, Tx, H, nx, nz, kp, lo, hi, fuse_residual,
):
    R = Tx + 2 * H
    i = pl.program_id(0)

    so = jnp.concatenate([so_t[...], so_m[...], so_b[...]], axis=1)
    b = jnp.concatenate([b_t[...], b_m[...], b_b[...]], axis=0)
    q = jnp.concatenate([q_t[...], q_m[...], q_b[...]], axis=0)

    row0 = i * Tx - H
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (R, kp), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, kp), 1)
    j = lane // nz
    x1 = (orig_ref[0] + row0 + iota_r) % 2
    y1 = (orig_ref[1] + j) % 2
    z1 = (orig_ref[2] + lane - j * nz) % 2
    himask = (row0 + iota_r) < (nx - 1)

    table = _couple_table(kind, nz)
    zero = jnp.zeros((), so.dtype)

    def coupling(off):
        plane, sx, sln = table[off]
        p = so[plane]
        if sx or sln:
            p = _shift_zero(p, sx, sln)
        if off[0] > 0:
            p = jnp.where(himask, p, zero)
        return p

    def offdiag(q):
        acc = None
        for off in table:
            term = coupling(off) * _roll(q, *off)
            acc = term if acc is None else acc + term
        return acc

    diag = so[Dir3.P]
    rec = 1.0 / diag
    for ph in range(lo, hi):
        mask = _phase_mask(kind, updown, ph, x1, y1, z1)
        upd = (b + offdiag(q)) * rec
        q = jnp.where(mask, upd, q)

    out_m[...] = q[H : H + Tx]
    if fuse_residual:
        res = b + offdiag(q) - diag * q
        res_m[...] = res[H : H + Tx]


def point_relax(so, q, b, rec, updown, fuse_residual=False, origin=None,
                kind=StencilKind.seven_pt):
    """One full multicolor 3D sweep in one (or two) HBM passes.

    Reference semantics: BMG3_SymStd_relax_GS.f90 (7-pt red-black :144-183,
    27-pt 8-color :85-143); drop-in for cedar_tpu.ops.relax3.point_relax on
    supported shapes (non-periodic).  The flattened-lane pad region is
    inert by construction (zero couplings, unit diagonal)."""
    del rec
    serial_origin = origin is None
    if origin is None:
        origin = jnp.zeros((3,), jnp.int32)
    nx, ny, nz = q.shape
    k, kp = _dims(q.shape)
    ndir = so.shape[0]
    plan = _plan(kind, kp, updown, fuse_residual, nx)
    if plan is None or nx < 2 * plan[0][2]:
        return _point_relax_2d_tiled(so, q, b, kind, updown,
                                     fuse_residual, origin,
                                     serial_origin=serial_origin)
    Tx = plan[0][3]
    nxp = -(-nx // Tx) * Tx

    soF = so.reshape(ndir, nx, k)
    qF = q.reshape(nx, k)
    bF = b.reshape(nx, k)
    if (nxp, kp) != (nx, k):
        pw = ((0, nxp - nx), (0, kp - k))
        soF = jnp.pad(soF, ((0, 0),) + pw)
        soF = soF.at[Dir3.P, nx:, :].set(1.0)
        soF = soF.at[Dir3.P, :, k:].set(1.0)
        qF = jnp.pad(qF, pw)
        bF = jnp.pad(bF, pw)

    res = None
    for lo, hi, H, tx, fuse in plan:
        out = _point_relax_call(soF, qF, bF, kind, updown, nz, lo, hi, H,
                                tx, fuse, origin)
        if fuse:
            qF, res = out
        else:
            qF = out
    if fuse_residual:
        return (qF[:nx, :k].reshape(nx, ny, nz),
                res[:nx, :k].reshape(nx, ny, nz))
    return qF[:nx, :k].reshape(nx, ny, nz)


def _point_relax_2d_tiled(so, q, b, kind, updown, fuse_residual, origin,
                          tile=None, serial_origin=False):
    """Dispatch to the 2D-tiled pipelined kernel (pads to tile multiples).

    ``serial_origin``: the caller guarantees a zero global-index origin —
    enables the x-parity-split phase loop for the 27-point sweep (halved
    per-phase compute; piece index == global x parity needs even row
    anchoring)."""
    nx, ny, nz = q.shape
    nzp = -(-nz // 128) * 128
    if tile is None:
        tile = _tile2d_for(kind, nzp, nx, ny)
    if tile is None:
        raise ValueError(
            "no feasible pallas plan for this shape "
            "(callers must gate on supported())"
        )
    Tx, Ty, HX, HY = tile
    nxp = -(-nx // Tx) * Tx
    nyp = -(-ny // Ty) * Ty
    nph = 2 if kind == StencilKind.seven_pt else 8
    if (nxp, nyp, nzp) != (nx, ny, nz):
        pw = ((0, nxp - nx), (0, nyp - ny), (0, nzp - nz))
        so = jnp.pad(so, ((0, 0),) + pw)
        so = so.at[Dir3.P, nx:, :, :].set(1.0)
        so = so.at[Dir3.P, :, ny:, :].set(1.0)
        so = so.at[Dir3.P, :, :, nz:].set(1.0)
        q = jnp.pad(q, pw)
        b = jnp.pad(b, pw)
    xsplit = (
        serial_origin
        and kind == StencilKind.twenty_seven_pt
        and Tx % 2 == 0
        and HX % 2 == 0
    )
    out = _point_relax2d_call(so, q, b, kind, updown, 0, nph, tile,
                              fuse_residual, origin, xsplit=xsplit)
    if fuse_residual:
        return out[0][:nx, :ny, :nz], out[1][:nx, :ny, :nz]
    return out[:nx, :ny, :nz]


@functools.partial(
    jax.jit,
    static_argnames=("kind", "updown", "nz", "lo", "hi", "H", "Tx",
                     "fuse_residual"),
)
def _point_relax_call(so, q, b, kind, updown, nz, lo, hi, H, Tx,
                      fuse_residual=False, origin=None):
    nxp, kp = q.shape
    ndir = so.shape[0]
    assert nxp % Tx == 0 and kp % 128 == 0
    dtype = q.dtype
    if origin is None:
        origin = jnp.zeros((3,), jnp.int32)

    kernel = functools.partial(
        _sweep_kernel,
        kind=kind, updown=updown, Tx=Tx, H=H,
        nx=nxp, nz=nz, kp=kp, lo=lo, hi=hi, fuse_residual=fuse_residual,
    )
    out_shapes = [
        jax.ShapeDtypeStruct((nxp, kp), dtype),
        jax.ShapeDtypeStruct(
            (nxp, kp) if fuse_residual else (8, 128), dtype
        ),
    ]
    tb = Tx // H
    nb = nxp // H - 1  # highest valid H-row block index

    def mid2(i):
        return (i, 0)

    def top2(i):
        return (jnp.maximum(i * tb - 1, 0), 0)

    def bot2(i):
        return (jnp.minimum((i + 1) * tb, nb), 0)

    def mid3(i):
        return (0, i, 0)

    def top3(i):
        return (0, jnp.maximum(i * tb - 1, 0), 0)

    def bot3(i):
        return (0, jnp.minimum((i + 1) * tb, nb), 0)

    q_out, res = pl.pallas_call(
        kernel,
        grid=(nxp // Tx,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((ndir, Tx, kp), mid3),
            pl.BlockSpec((ndir, H, kp), top3),
            pl.BlockSpec((ndir, H, kp), bot3),
            pl.BlockSpec((Tx, kp), mid2),
            pl.BlockSpec((H, kp), top2),
            pl.BlockSpec((H, kp), bot2),
            pl.BlockSpec((Tx, kp), mid2),
            pl.BlockSpec((H, kp), top2),
            pl.BlockSpec((H, kp), bot2),
        ],
        out_specs=[
            pl.BlockSpec((Tx, kp), mid2),
            pl.BlockSpec((Tx, kp), mid2) if fuse_residual
            else pl.BlockSpec((8, 128), lambda i: (0, 0)),
        ],
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(
                _VMEM_BUDGET
                - _stream_bytes(kind, kp, H, Tx, fuse_residual),
                32 * 1024 * 1024,
            ),
        ),
        interpret=INTERPRET,
    )(origin, so, so, so, b, b, b, q, q, q)
    if fuse_residual:
        return q_out, res
    return q_out


# ---------------------------------------------------------------------------
# 2D-tiled pipelined variant: for grids whose flattened (ny*nz) rows exceed
# the VMEM budget (e.g. the 256^3 fine level).  Windows tile (x, y) with the
# full z extent as lanes; halo blocks on all four sides plus corners feed as
# nine auto-pipelined streams per array.  x blocks may be any size (untiled
# dim); y blocks are 8-row quantized.
# ---------------------------------------------------------------------------

def _tile2d_for(kind: StencilKind, nz: int, nx: int, ny: int,
                dtype_bytes: int = 4):
    """(Tx, Ty, HX, HY) minimizing modeled HBM traffic per sweep, or None.

    HX/HY are both the halo extent and the halo-stream block size; any
    HX >= the sweep's dependency depth (phases + 1) is correct — the extra
    window rows are redundant compute discarded by the output slice — so
    the search may round HX up when an exact-fit tile wins on traffic.
    Exact fits matter: a tile that does not divide (nx, ny) forces XLA
    pad+unpad passes around every call (measured 2x sweep cost at 256^3,
    tools/probe_sweep3.py: planner tile (30,72) 190 GB/s eff vs the
    exact-fit (32,64) at 412 GB/s)."""
    if kind == StencilKind.seven_pt:
        # per calibrated on v5e: (64,64,4,8) at 256^3 compiles (window
        # 5760 cells), (64,128) does not (10080) — tools/probe_sweep3.py
        need, HY, per = 3, 8, 26
    else:
        # (32,32,16,16) at 128^3 compiles (4096), (32,64) does not
        # (6144) — tools/probe_sweep27.py
        need, HY, per = 9, 16, 60
    nd = _ndir(kind)
    cellb = nz * dtype_bytes
    cells = _VMEM_BUDGET // cellb
    wmax = cells // per
    nstream = nd + 2          # stencil dirs + q + b read streams
    best = None
    for HX in sorted({need, -(-need // 4) * 4, -(-need // 8) * 8, 16}):
        if HX < need:
            continue
        for Tx in range(HX, min(nx + HX, 512) + 1, HX):
            nxp = -(-nx // Tx) * Tx
            for Ty in range(HY, min(ny + HY, 512) + 1, HY):
                if (Tx + 2 * HX) * (Ty + 2 * HY) > wmax:
                    break   # window grows with Ty
                nyp = -(-ny // Ty) * Ty
                refetch = ((Tx + 2 * HX) * (Ty + 2 * HY)) / float(Tx * Ty)
                cellsp = nxp * nyp
                traffic = cellsp * (nstream * refetch + 1.0)
                if cellsp != nx * ny:
                    # XLA pad + unpad passes around the call: measured to
                    # dominate any refetch advantage (tools/probe_sweep27:
                    # every padded tile ~1.9-2.1 ms vs 1.1 exact at 128^3)
                    traffic += (nstream + 2.0) * cellsp
                if best is None or traffic < best[0]:
                    best = (traffic, Tx, Ty, HX)
    if best is None:
        return None
    _, Tx, Ty, HX = best
    return Tx, Ty, HX, HY


def _sweep2d_kernel(
    orig_ref,
    so_m, so_xt, so_xb, so_yl, so_yr, so_c00, so_c01, so_c10, so_c11,
    b_m, b_xt, b_xb, b_yl, b_yr, b_c00, b_c01, b_c10, b_c11,
    q_m, q_xt, q_xb, q_yl, q_yr, q_c00, q_c01, q_c10, q_c11,
    out_m, res_m,
    *, kind, updown, Tx, Ty, HX, HY, nx, ny, nz, lo, hi, fuse_residual,
    xsplit=False,
):
    Rx = Tx + 2 * HX
    Ry = Ty + 2 * HY
    i = pl.program_id(0)
    j = pl.program_id(1)

    def asm(m, xt, xb, yl, yr, c00, c01, c10, c11, ax):
        top = jnp.concatenate([c00[...], xt[...], c01[...]], axis=ax + 1)
        mid = jnp.concatenate([yl[...], m[...], yr[...]], axis=ax + 1)
        bot = jnp.concatenate([c10[...], xb[...], c11[...]], axis=ax + 1)
        return jnp.concatenate([top, mid, bot], axis=ax)

    so = asm(so_m, so_xt, so_xb, so_yl, so_yr, so_c00, so_c01, so_c10,
             so_c11, 1)
    b = asm(b_m, b_xt, b_xb, b_yl, b_yr, b_c00, b_c01, b_c10, b_c11, 0)
    q = asm(q_m, q_xt, q_xb, q_yl, q_yr, q_c00, q_c01, q_c10, q_c11, 0)

    x0 = i * Tx - HX
    y0 = j * Ty - HY
    ix = jax.lax.broadcasted_iota(jnp.int32, (Rx, Ry, nz), 0)
    iy = jax.lax.broadcasted_iota(jnp.int32, (Rx, Ry, nz), 1)
    iz = jax.lax.broadcasted_iota(jnp.int32, (Rx, Ry, nz), 2)
    x1 = (orig_ref[0] + x0 + ix) % 2
    y1 = (orig_ref[1] + y0 + iy) % 2
    z1 = (orig_ref[2] + iz) % 2
    hix = (x0 + ix) < (nx - 1)
    hiy = (y0 + iy) < (ny - 1)

    if kind == StencilKind.seven_pt:
        table = {
            (-1, 0, 0): (Dir3.PW, (0, 0, 0)),
            (1, 0, 0): (Dir3.PW, (1, 0, 0)),
            (0, -1, 0): (Dir3.PS, (0, 0, 0)),
            (0, 1, 0): (Dir3.PS, (0, 1, 0)),
            (0, 0, -1): (Dir3.B, (0, 0, 0)),
            (0, 0, 1): (Dir3.B, (0, 0, 1)),
        }
    else:
        table = NEIGHBOR_COUPLINGS_27
    zero = jnp.zeros((), so.dtype)

    def shift3z(a, sx, sy, sz):
        out = a
        for ax, d in enumerate((sx, sy, sz)):
            if d:
                pad_shape = list(out.shape)
                pad_shape[ax] = d
                pad = jnp.zeros(pad_shape, out.dtype)
                idx = [slice(None)] * 3
                idx[ax] = slice(d, None)
                out = jnp.concatenate([out[tuple(idx)], pad], axis=ax)
        return out

    def roll3(a, dx, dy, dz):
        out = a
        for ax, d in enumerate((dx, dy, dz)):
            if d:
                out = pltpu.roll(out, (-d) % out.shape[ax], ax)
        return out

    def coupling(off):
        plane, sh = table[off]
        p = so[plane]
        if any(sh):
            p = shift3z(p, *sh)
        if off[0] > 0:
            p = jnp.where(hix, p, zero)
        if off[1] > 0:
            p = jnp.where(hiy, p, zero)
        return p

    def offdiag(q):
        acc = None
        for off in table:
            term = coupling(off) * roll3(q, *off)
            acc = term if acc is None else acc + term
        return acc

    diag = so[Dir3.P]
    rec = 1.0 / diag

    if not xsplit:
        for ph in range(lo, hi):
            mask = _phase_mask(kind, updown, ph, x1, y1, z1)
            upd = (b + offdiag(q)) * rec
            q = jnp.where(mask, upd, q)

        out_m[...] = q[HX : HX + Tx, HY : HY + Ty]
        if fuse_residual:
            res = b + offdiag(q) - diag * q
            res_m[...] = res[HX : HX + Tx, HY : HY + Ty]
        return

    # ---- x-parity-split phase loop (27-pt, serial anchoring) ----------
    # Each 8-color phase updates ONE x parity: splitting the window rows
    # by parity halves the per-phase offdiag compute (the updated piece
    # is dense in x) at full lane utilization.  Requires even window row
    # origin (Tx, HX even; serial zero origin) so piece index == global
    # x parity.
    Rx2 = Rx // 2

    def spl(a):
        r = a.reshape(Rx2, 2, a.shape[1], a.shape[2])
        return r[:, 0], r[:, 1]

    so_sp = [spl(so[d]) for d in range(so.shape[0])]
    b_sp = spl(b)
    q_sp = list(spl(q))
    rec_sp = spl(rec)
    diag_sp = spl(diag)
    iy = jax.lax.broadcasted_iota(jnp.int32, (Rx2, Ry, nz), 1)
    iz = jax.lax.broadcasted_iota(jnp.int32, (Rx2, Ry, nz), 2)
    ir = jax.lax.broadcasted_iota(jnp.int32, (Rx2, Ry, nz), 0)
    y1s = (orig_ref[1] + y0 + iy) % 2
    z1s = (orig_ref[2] + iz) % 2
    hiy_s = (y0 + iy) < (ny - 1)
    hix_s = [(x0 + 2 * ir + P) < (nx - 1) for P in (0, 1)]

    def coupling_sp(off, P):
        plane, sh = table[off]
        sx, sy, sz = sh
        pc = (P + sx) % 2
        rc = (sx + P - pc) // 2
        c = so_sp[plane][pc]
        if rc or sy or sz:
            c = shift3z(c, rc, sy, sz)
        if off[0] > 0:
            c = jnp.where(hix_s[P], c, zero)
        if off[1] > 0:
            c = jnp.where(hiy_s, c, zero)
        return c

    def offdiag_sp(P):
        acc = None
        for off in table:
            dx = off[0]
            pn = (P + dx) % 2
            rq = (dx + P - pn) // 2
            nb = q_sp[pn]
            if rq or off[1] or off[2]:
                nb = roll3(nb, rq, off[1], off[2])
            term = coupling_sp(off, P) * nb
            acc = term if acc is None else acc + term
        return acc

    pts_order = list(range(1, 9) if updown == "up" else range(8, 0, -1))
    for ph in range(lo, hi):
        pts = pts_order[ph]
        px = (pts - 1) % 2
        py = ((pts - 1) // 2) % 2
        pz = ((pts - 1) // 4) % 2
        mask = (y1s == py) & (z1s == pz)
        upd = (b_sp[px] + offdiag_sp(px)) * rec_sp[px]
        q_sp[px] = jnp.where(mask, upd, q_sp[px])

    def ileave(ev, od):
        return jnp.stack([ev, od], axis=1).reshape(Rx, Ry, nz)

    q_out = ileave(q_sp[0], q_sp[1])
    out_m[...] = q_out[HX : HX + Tx, HY : HY + Ty]
    if fuse_residual:
        res = ileave(
            b_sp[0] + offdiag_sp(0) - diag_sp[0] * q_sp[0],
            b_sp[1] + offdiag_sp(1) - diag_sp[1] * q_sp[1],
        )
        res_m[...] = res[HX : HX + Tx, HY : HY + Ty]


@functools.partial(
    jax.jit,
    static_argnames=("kind", "updown", "lo", "hi", "tile", "fuse_residual",
                     "xsplit"),
)
def _point_relax2d_call(so, q, b, kind, updown, lo, hi, tile,
                        fuse_residual=False, origin=None, xsplit=False):
    nxp, nyp, nz = q.shape
    ndir = so.shape[0]
    Tx, Ty, HX, HY = tile
    assert nxp % Tx == 0 and nyp % Ty == 0
    # halo streams are HX/HY-row blocks of the same arrays: tile sizes
    # must be block-size multiples or the index maps fetch wrong rows
    assert Tx % HX == 0 and Ty % HY == 0
    assert not xsplit or (Tx % 2 == 0 and HX % 2 == 0)
    dtype = q.dtype
    if origin is None:
        origin = jnp.zeros((3,), jnp.int32)

    kernel = functools.partial(
        _sweep2d_kernel,
        kind=kind, updown=updown, Tx=Tx, Ty=Ty, HX=HX, HY=HY,
        nx=nxp, ny=nyp, nz=nz, lo=lo, hi=hi, fuse_residual=fuse_residual,
        xsplit=xsplit,
    )
    out_shapes = [
        jax.ShapeDtypeStruct((nxp, nyp, nz), dtype),
        jax.ShapeDtypeStruct(
            (nxp, nyp, nz) if fuse_residual else (8, 8, 128), dtype
        ),
    ]
    txb = Tx // HX
    tyb = Ty // HY
    nbx = nxp // HX - 1
    nby = nyp // HY - 1

    def xm(i):
        return i

    def xt(i):
        return jnp.maximum(i * txb - 1, 0)

    def xb(i):
        return jnp.minimum((i + 1) * txb, nbx)

    def ym(j):
        return j

    def yt(j):
        return jnp.maximum(j * tyb - 1, 0)

    def yb(j):
        return jnp.minimum((j + 1) * tyb, nby)

    def spec(shape, fx, fy, lead=0):
        if lead:
            return pl.BlockSpec(
                (ndir,) + shape, lambda i, j, fx=fx, fy=fy: (0, fx(i),
                                                            fy(j), 0))
        return pl.BlockSpec(
            shape, lambda i, j, fx=fx, fy=fy: (fx(i), fy(j), 0))

    def nine(lead):
        return [
            spec((Tx, Ty, nz), xm, ym, lead),
            spec((HX, Ty, nz), xt, ym, lead),
            spec((HX, Ty, nz), xb, ym, lead),
            spec((Tx, HY, nz), xm, yt, lead),
            spec((Tx, HY, nz), xm, yb, lead),
            spec((HX, HY, nz), xt, yt, lead),
            spec((HX, HY, nz), xt, yb, lead),
            spec((HX, HY, nz), xb, yt, lead),
            spec((HX, HY, nz), xb, yb, lead),
        ]

    q_out, res = pl.pallas_call(
        kernel,
        grid=(nxp // Tx, nyp // Ty),
        in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)]
                  + nine(1) + nine(0) + nine(0)),
        out_specs=[
            spec((Tx, Ty, nz), xm, ym),
            spec((Tx, Ty, nz), xm, ym) if fuse_residual
            else pl.BlockSpec((8, 8, 128), lambda i, j: (0, 0, 0)),
        ],
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET,
        ),
        interpret=INTERPRET,
    )(origin, *([so] * 9), *([b] * 9), *([q] * 9))
    if fuse_residual:
        return q_out, res
    return q_out

"""Octant-resident 3D Pallas sweeps and fused transfers (split layout).

The dense 3D sweeps (:mod:`cedar_tpu.ops.pallas3`) phrase each color phase
as a masked update over the whole window: the 27-point sweep computes the
full 26-coupling offdiag eight times per sweep and keeps 7/8 of every
result masked off (the x-parity-split variant halves that — still 4x
redundant), and the cycle leaves XLA layout passes around the transfer
kernels (the y/z parity split feeding restrict, the parity merge after
interp_add).  Both costs vanish if the fine level is STORED parity-split:

* layout ``(4, nxp, kp)``: class ``c = 2*py + pz`` holds the fine points
  ``(x, 2*ys + py, 2*zs + pz)``; x stays dense in the sublane dim; lanes
  are the FLATTENED ``ys*nz2 + zs`` (the same free row-major flattening
  the dense kernel uses, so a split y-shift is a lane roll by ``nz2`` and
  a split z-shift a lane roll by 1, with every wrap term annihilated by
  the symmetric storage convention's stored-zero boundary couplings);
* the kernel splits x IN-KERNEL (a sublane reshape — Mosaic-supported)
  into 8 octant pieces, and every color phase of the reference ordering
  updates exactly ONE octant (27-pt) or one x-parity of every octant
  (7-pt) DENSELY — zero masked-off compute, ~8x less offdiag work per
  27-point sweep than the masked formulation;
* the pre-sweep residual restricts while still in VMEM
  (:func:`sweep_restrict_split3`), and interpolation + the first
  post-sweep fuse with the residual recomputed in-kernel
  (:func:`interp_sweep_split3`) — the split cycle writes NO residual and
  runs NO layout pass on split levels (the 3D analogue of
  pallas_transfer2.sweep_restrict_split / interp_sweep_split).

Math is exactly the reference's multicolor sweep + transfers
(BMG3_SymStd_relax_GS.f90:85-187 color orders, BMG3_SymStd_restrict.f90:
115-145, BMG3_SymStd_interp_add.f90:88-242), with coupling/offset/weight
term orders copied from the dense kernels (ops.pallas3 / ops.interp3):
agreement is at the ULP level (compiler FMA contraction may differ
between layouts, as for the 2D split kernels).

Shape gate: even ny/nz with ny2*nz2 lane-aligned (the benchmark family
128/192/256/...; ragged or odd extents keep the dense path — their
flattened-lane pad would break the weight/lane correspondence).  The
27-point sweep runs as two 4-color passes (halo 8) when one pass's halo-16
windows exceed VMEM; pass structure is chosen by :func:`_plan_split`.
Serial, non-periodic, f32 (same gates as the 2D split path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cedar_tpu.core.parity import _split_axis
from cedar_tpu.core.types import Dir3, StencilKind
from cedar_tpu.ops.stencil3 import NEIGHBOR_COUPLINGS_27
from cedar_tpu.ops.interp3 import PW3_TABLE, pw_weights

INTERPRET = False

_VMEM_BUDGET = 108 * 1024 * 1024   # planning budget, calibrated on
# v5e: the 27-pt two-pass sweep (model 103M) compiles; its fused
# restrict tail (model 113M) overflows the 120M scoped limit

# weight-plane offset order = the XLA restrict/interp term order
# (PW3_TABLE preserves interp3.DELTA's insertion order)
_OFFSETS26 = list(PW3_TABLE.keys())

# 7-point coupling table in the dense kernel's accumulation order
# (ops.pallas3._couple_table; == stencil3.SEVEN_OFFSETS order)
_TABLE7 = {
    (-1, 0, 0): (Dir3.PW, (0, 0, 0)),
    (1, 0, 0): (Dir3.PW, (1, 0, 0)),
    (0, -1, 0): (Dir3.PS, (0, 0, 0)),
    (0, 1, 0): (Dir3.PS, (0, 1, 0)),
    (0, 0, -1): (Dir3.B, (0, 0, 0)),
    (0, 0, 1): (Dir3.B, (0, 0, 1)),
}

_OCTS = [(px, py, pz) for px in (0, 1) for py in (0, 1) for pz in (0, 1)]


def _table_for(kind: StencilKind):
    if kind == StencilKind.seven_pt:
        return _TABLE7
    return NEIGHBOR_COUPLINGS_27


def _phase_octants(kind: StencilKind, updown: str):
    """Octants updated per color phase, reference sweep order
    (relax3.color_masks semantics: 27-pt DOWN sweeps pts 8..1, UP 1..8;
    7-pt DOWN parities (1, 0), UP (0, 1))."""
    if kind == StencilKind.seven_pt:
        order = (0, 1) if updown == "up" else (1, 0)
        return [
            [o for o in _OCTS if (o[0] + o[1] + o[2]) % 2 == c]
            for c in order
        ]
    pts_order = range(1, 9) if updown == "up" else range(8, 0, -1)
    return [
        [((p - 1) % 2, ((p - 1) // 2) % 2, ((p - 1) // 4) % 2)]
        for p in pts_order
    ]


# ---------------------------------------------------------------------------
# layout / setup
# ---------------------------------------------------------------------------

def split_dims3(nx: int, ny: int, nz: int):
    """(nxp, ny2, nz2, kp) or None when the shape is not split-eligible.

    Requires even ny/nz with ny2*nz2 lane-aligned (so the flattened-lane
    coarse/weight correspondence holds without structured padding —
    128/192/256/... benchmark-family extents qualify; ragged or odd
    extents keep the dense path); x pads to a multiple of 32 (every tile
    choice divides it)."""
    if ny % 2 or nz % 2:
        return None
    nz2 = nz // 2
    ny2 = ny // 2
    nxp = -(-nx // 32) * 32
    kp = ny2 * nz2
    if kp % 128:
        return None
    return nxp, ny2, nz2, kp


def supported(shape, dtype, kind) -> bool:
    if kind not in (StencilKind.seven_pt, StencilKind.twenty_seven_pt):
        return False
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        return False
    dims = split_dims3(*shape)
    if dims is None:
        return False
    nxp, ny2, nz2, kp = dims
    if shape[0] < 32 or kp < 512:
        return False            # tiny grids: call overhead beats the win
    # the fused restrict/interp plans are optional: when they do not fit,
    # the cycle emits the residual and takes the standalone restriction
    # and pointwise interpolation kernels — whose (possibly lane-paneled)
    # plans must fit VMEM as well
    return (
        _plan_split(kind, kp, "sweep", nxp) is not None
        and _restrict_plan(nxp, kp, nz2) is not None
        and _interp_plan(nxp, kp, nz2) is not None
    )


def split4(a: jnp.ndarray, dims) -> jnp.ndarray:
    """Dense (nx, ny, nz) -> split (4, nxp, kp) (one fused XLA pass)."""
    nxp, ny2, nz2, kp = dims
    nx, ny, nz = a.shape
    if nx != nxp:
        a = jnp.pad(a, ((0, nxp - nx), (0, 0), (0, 0)))
    y0, y1 = _split_axis(a, 1)
    parts = []
    for py in (y0, y1):
        z0, z1 = _split_axis(py, 2)
        parts.extend([z0, z1])
    return jnp.stack(parts).reshape(4, nxp, kp)


def merge4(a4: jnp.ndarray, nx: int, ny: int, nz: int) -> jnp.ndarray:
    """Split (4, nxp, kp) -> dense (nx, ny, nz) (one fused XLA pass)."""
    _, nxp, kp = a4.shape
    ny2, nz2 = ny // 2, nz // 2
    g = a4.reshape(2, 2, nxp, ny2, nz2)          # [py, pz, x, ys, zs]
    g = jnp.transpose(g, (2, 3, 0, 4, 1))         # [x, ys, py, zs, pz]
    return g.reshape(nxp, ny, nz)[:nx]


def split_so4(so: jnp.ndarray, kind: StencilKind, dims) -> jnp.ndarray:
    """Setup-time split stencil: (ndir, 4, nxp, kp).

    Diagonal pads with ONES (inert pad updates), couplings with zeros
    (annihilating reads across the pad boundary) — the dense kernels'
    convention."""
    nxp, ny2, nz2, kp = dims
    ndir, nx, ny, nz = so.shape
    if nx != nxp:
        so = jnp.pad(so, ((0, 0), (0, nxp - nx), (0, 0), (0, 0)))
        so = so.at[Dir3.P, nx:].set(1.0)
    return jnp.stack([split4(so[d], dims) for d in range(ndir)])


def setup_pw4(ci: jnp.ndarray, fine_shape, kind: StencilKind):
    """Stacked per-coarse-point weight planes for the split transfers:
    (26, nxp//2 + 2*Hmax, kp) in _OFFSETS26 order (the coincident weight
    is the identity — consumers add the center sample directly).

    Row c = global coarse row (pad at the end only: the interp kernel's
    shifted coarse reads index up to (i+1)*Tc + H with no clamp)."""
    dims = split_dims3(*fine_shape)
    nxp, ny2, nz2, kp = dims
    rows = nxp // 2 + 2 * 16
    pw = pw_weights(ci)
    out = []
    for off in _OFFSETS26:
        a = pw[off]
        a = jnp.pad(a, ((0, rows - a.shape[0]), (0, ny2 - a.shape[1]),
                        (0, nz2 - a.shape[2])))
        out.append(a.reshape(rows, kp))
    return jnp.stack(out)


# ---------------------------------------------------------------------------
# pass planning
# ---------------------------------------------------------------------------

def _ndir(kind):
    return 4 if kind == StencilKind.seven_pt else 14


def _passes(kind: StencilKind, two_pass: bool):
    nph = 2 if kind == StencilKind.seven_pt else 8
    if not two_pass:
        return [(0, nph)]
    return [(0, nph // 2), (nph // 2, nph)]


def _model_rows(kind, T, H, want, tail_pass):
    """Class-row count of the VMEM model for one pass (streams double-
    buffered + in-kernel temps; calibrated against the dense kernels'
    budget behavior — conservative)."""
    nd = _ndir(kind)
    ncpl = len(_table_for(kind))
    R = T + 2 * H
    rows = 2 * (nd + 2) * 4 * R               # so/q/b stream buffers
    rows += 2 * 4 * T                         # q out
    rows += 10 * 8 * (R // 2)                 # octant pieces (q,b,rec,...)
    rows += (ncpl * 8 // 3) * (R // 2)        # lane-rolled coupling copies
    if want in ("sweep_restrict",) and tail_pass:
        rows += 2 * 26 * (T // 2) + 2 * (T // 2) + 26 * (T // 2)
    if want == "interp_sweep" and not tail_pass:
        rows += 2 * 27 * (T // 2 + 2 * H) + 27 * (T // 2 + 2 * H)
    return rows


def _plan_split(kind: StencilKind, kp: int, want: str, nxp: int):
    """[(lo, hi, H, T)] per pass, or None if nothing fits.

    H = phase-dependency depth rounded to the 8-sublane block quantum:
    7-pt fits single-pass at H=8 (2 phases + residual + restrict = 4);
    27-pt needs H=16 single-pass (8 + 2 = 10) — when that blows the
    budget it splits into two 4-phase passes at H=8 (the tail pass
    carries residual + restrict / the norm)."""
    rowb = kp * 4
    nph = 2 if kind == StencilKind.seven_pt else 8

    def fits(T, H, tail):
        return _model_rows(kind, T, H, want, tail) * rowb <= _VMEM_BUDGET

    cands = [T for T in (64, 32, 16) if T <= nxp and nxp % T == 0]
    if kind == StencilKind.seven_pt:
        for T in cands:
            # T % 2H: coarse-row blocks (Tc = T/2) index in units of H
            if T % 16 == 0 and fits(T, 8, True):
                return [(0, nph, 8, T)]
        return None
    # 27-pt: ALWAYS two 4-color passes.  A single halo-16 pass both blows
    # the VMEM budget at real sizes and — measured — sends Mosaic into a
    # >30-minute compile (the unrolled 8x26-coupling body); the two-pass
    # variant compiles in ~20 s and costs only one extra q round trip.
    for T in cands:
        if T % 16 == 0 and fits(T, 8, False) and fits(T, 8, True):
            return [(0, 4, 8, T), (4, 8, 8, T)]
    return None


# ---------------------------------------------------------------------------
# in-kernel octant algebra
# ---------------------------------------------------------------------------

def _xsplit(a):
    """(R, kp) -> even/odd sublane rows (a Mosaic-supported reshape)."""
    r = a.reshape(a.shape[0] // 2, 2, a.shape[1])
    return r[:, 0], r[:, 1]


def _roll(a, dr, dl):
    """q-neighbor read: out[r, l] = a[r + dr, l + dl] as wrapping rolls
    (every wrap term is annihilated by a stored-zero boundary coupling
    or discarded halo validity — the dense kernels' argument)."""
    if dr:
        a = pltpu.roll(a, (-dr) % a.shape[0], 0)
    if dl:
        a = pltpu.roll(a, (-dl) % a.shape[1], 1)
    return a


def _shiftc(a, dr, dl):
    """Coefficient read at (+dr, +dl), dr/dl >= 0, zero fill in rows;
    lane fill relies on the same stored-zero annihilation (the rolled-in
    values are the low-boundary zeros of the shifted plane)."""
    if dr:
        z = jnp.zeros((dr,) + a.shape[1:], a.dtype)
        a = jnp.concatenate([a[dr:], z], axis=0)
    if dl:
        a = pltpu.roll(a, (-dl) % a.shape[1], 1)
    return a


class _OctantField:
    """The 8 x-parity octant pieces of a windowed split field."""

    def __init__(self, win):
        # win: (4, R, kp); piece (px, py, pz) = x-parity px of class 2py+pz
        self.p = {}
        for py in (0, 1):
            for pz in (0, 1):
                ev, od = _xsplit(win[2 * py + pz])
                self.p[(0, py, pz)] = ev
                self.p[(1, py, pz)] = od

    def __getitem__(self, o):
        return self.p[o]

    def __setitem__(self, o, v):
        self.p[o] = v

    def interleave(self, H, T):
        """Back to (4, T, kp), mid rows only."""
        out = []
        for py in (0, 1):
            for pz in (0, 1):
                ev, od = self.p[(0, py, pz)], self.p[(1, py, pz)]
                full = jnp.stack([ev, od], axis=1).reshape(
                    2 * ev.shape[0], ev.shape[1])
                out.append(full[H: H + T])
        return jnp.stack(out)


def _mk_offdiag(so_oct, table, nz2, hix, zero):
    """offdiag(o, q_oct) with coupling coefficients and neighbor reads in
    the dense kernels' term order (bit-identical sums)."""

    def coupling(o, off):
        plane, (sx, sy, sz) = table[off]
        px, py, pz = o
        oc = ((px + sx) % 2, (py + sy) % 2, (pz + sz) % 2)
        rc = (px + sx - oc[0]) // 2
        dl = ((py + sy - oc[1]) // 2) * nz2 + (pz + sz - oc[2]) // 2
        c = so_oct[plane][oc]
        if rc or dl:
            c = _shiftc(c, rc, dl)
        if off[0] > 0:
            c = jnp.where(hix[px], c, zero)
        return c

    def offdiag(o, q_oct):
        acc = None
        for off in table:
            pn = tuple((o[i] + off[i]) % 2 for i in range(3))
            rq = (o[0] + off[0] - pn[0]) // 2
            dl = (((o[1] + off[1] - pn[1]) // 2) * nz2
                  + (o[2] + off[2] - pn[2]) // 2)
            qn = q_oct[pn]
            if rq or dl:
                qn = _roll(qn, rq, dl)
            term = coupling(o, off) * qn
            acc = term if acc is None else acc + term
        return acc

    return offdiag


def _sample_res(res_oct, off, nz2, h2, Tc):
    """res[2c + off] over the block's coarse rows (restriction read)."""
    dx, dy, dz = off
    p = (dx % 2, dy % 2, dz % 2)
    sx = (dx - p[0]) // 2
    dl = ((dy - p[1]) // 2) * nz2 + (dz - p[2]) // 2
    rows = res_oct[p][h2 + sx: h2 + sx + Tc]
    if dl:
        rows = _roll(rows, 0, dl)
    return rows


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _prep(so_blocks, b_blocks, q_blocks, kind, nz2, T, H, nxp, i):
    """Assemble windows + octant machinery shared by all kernels."""
    so = jnp.concatenate([s[...] for s in so_blocks], axis=2)
    b = jnp.concatenate(b_blocks, axis=1)       # (4, R, kp)
    q = jnp.concatenate(q_blocks, axis=1)
    R = T + 2 * H
    kp = q.shape[2]
    row0 = i * T - H                            # even (T, H even)

    so_oct = [_OctantField(so[d]) for d in range(so.shape[0])]
    b_oct = _OctantField(b)
    q_oct = _OctantField(q)

    ir = jax.lax.broadcasted_iota(jnp.int32, (R // 2, kp), 0)
    hix = [(row0 + 2 * ir + px) < (nxp - 1) for px in (0, 1)]
    zero = jnp.zeros((), q.dtype)

    table = _table_for(kind)
    offdiag = _mk_offdiag(so_oct, table, nz2, hix, zero)
    diag = so_oct[Dir3.P]
    rec = {o: 1.0 / diag[o] for o in _OCTS}
    return q_oct, b_oct, diag, rec, offdiag


def _run_phases(q_oct, b_oct, rec, offdiag, kind, updown, lo, hi):
    phases = _phase_octants(kind, updown)[lo:hi]
    for octs in phases:
        upds = {o: (b_oct[o] + offdiag(o, q_oct)) * rec[o] for o in octs}
        for o in octs:
            q_oct[o] = upds[o]


def _residual_oct(q_oct, b_oct, diag, offdiag, skip_eee=False):
    out = {}
    for o in _OCTS:
        if skip_eee and o == (0, 0, 0):
            continue
        out[o] = b_oct[o] + offdiag(o, q_oct) - diag[o] * q_oct[o]
    return out


def _emit_norm(res_oct, H, T, kp, dtype):
    """Per-block partial sums of res² in row 0 of an 8-row block."""
    h2, t2 = H // 2, T // 2
    s = None
    for o in _OCTS:
        r = res_oct[o][h2: h2 + t2]
        r2 = r * r
        # manual row-slice tree sum: a vector.multi_reduction producing a
        # rank-1 vector<kp> crashes Mosaic at kp = 4096 (observed); row
        # slices keep every intermediate rank-2
        while r2.shape[0] > 1:
            half = r2.shape[0] // 2
            r2 = r2[:half] + r2[half: 2 * half]
        s = r2 if s is None else s + r2
    return jnp.concatenate([s, jnp.zeros((7, kp), dtype)], axis=0)


def _sweep_kernel3(
    so_m, so_t, so_b, b_m, b_t, b_b, q_m, q_t, q_b,
    out_m, res_m,
    *, kind, updown, T, H, nxp, nz2, lo, hi, fuse_residual, fuse_norm,
):
    i = pl.program_id(0)
    kp = q_m.shape[2]
    q_oct, b_oct, diag, rec, offdiag = _prep(
        [so_t, so_m, so_b], [b_t[...], b_m[...], b_b[...]],
        [q_t[...], q_m[...], q_b[...]], kind, nz2, T, H, nxp, i,
    )
    _run_phases(q_oct, b_oct, rec, offdiag, kind, updown, lo, hi)
    out_m[...] = q_oct.interleave(H, T)
    if fuse_residual:
        res_oct = _residual_oct(q_oct, b_oct, diag, offdiag)
        if fuse_norm:
            res_m[...] = _emit_norm(res_oct, H, T, kp, b_m.dtype)
        else:
            r = _OctantField.__new__(_OctantField)
            r.p = res_oct
            res_m[...] = r.interleave(H, T)


def _sweep_restrict_kernel3(
    so_m, so_t, so_b, b_m, b_t, b_b, q_m, q_t, q_b, w_m,
    out_m, res_m, cb_m,
    *, kind, updown, T, H, nxp, nz2, lo, hi, emit_res,
):
    i = pl.program_id(0)
    q_oct, b_oct, diag, rec, offdiag = _prep(
        [so_t, so_m, so_b], [b_t[...], b_m[...], b_b[...]],
        [q_t[...], q_m[...], q_b[...]], kind, nz2, T, H, nxp, i,
    )
    _run_phases(q_oct, b_oct, rec, offdiag, kind, updown, lo, hi)
    out_m[...] = q_oct.interleave(H, T)
    res_oct = _residual_oct(q_oct, b_oct, diag, offdiag)
    if emit_res:
        r = _OctantField.__new__(_OctantField)
        r.p = res_oct
        res_m[...] = r.interleave(H, T)

    # restriction of the in-VMEM residual (term order = interp3.restrict)
    h2, Tc = H // 2, T // 2
    w = w_m[...]
    qc = _sample_res(res_oct, (0, 0, 0), nz2, h2, Tc)
    for n, off in enumerate(_OFFSETS26):
        qc = qc + w[n] * _sample_res(res_oct, off, nz2, h2, Tc)
    cb_m[...] = qc


def _interp_sweep_kernel3(
    cx_t, cx_m, cx_b, w_t, w_m, w_b,
    so_m, so_t, so_b, b_m, b_t, b_b, q_m, q_t, q_b,
    out_m, res_m,
    *, kind, updown, T, H, nxp, nz2, lo, hi, fuse_residual, fuse_norm,
):
    """interp_add (+ residual recomputed in-VMEM) + phases [lo, hi).

    Validity: residual 1 + interp pointwise + one row per phase; callers
    size H accordingly.  q MUST be the pre-smoothed iterate whose
    residual was restricted (the split cycle's invariant)."""
    i = pl.program_id(0)
    kp = q_m.shape[2]
    q_oct, b_oct, diag, rec, offdiag = _prep(
        [so_t, so_m, so_b], [b_t[...], b_m[...], b_b[...]],
        [q_t[...], q_m[...], q_b[...]], kind, nz2, T, H, nxp, i,
    )

    # pre-smoothed residual / diag at fine-only octants, in-VMEM
    res_oct = _residual_oct(q_oct, b_oct, diag, offdiag, skip_eee=True)

    cx = jnp.concatenate([cx_t[...], cx_m[...], cx_b[...]], axis=0)
    w = jnp.concatenate([w_t[...], w_m[...], w_b[...]], axis=1)
    h2 = H // 2
    R2 = (T + 2 * H) // 2

    def csample(a, sx, dl):
        rows = a[h2 + sx: h2 + sx + R2]
        if dl:
            rows = _roll(rows, 0, dl)
        return rows

    # q += P cx (+ res/diag at fine-only octants); per-octant term order
    # mirrors interp3.interp_add's DELTA iteration
    for o in _OCTS:
        if o == (0, 0, 0):
            q_oct[o] = q_oct[o] + csample(cx, 0, 0)
            continue
        acc = res_oct[o] * rec[o]
        for n, off in enumerate(_OFFSETS26):
            if (off[0] % 2, off[1] % 2, off[2] % 2) != o:
                continue
            sx = (o[0] - off[0]) // 2
            dl = (((o[1] - off[1]) // 2) * nz2 + (o[2] - off[2]) // 2)
            acc = acc + csample(w[n], sx, dl) * csample(cx, sx, dl)
        q_oct[o] = q_oct[o] + acc

    _run_phases(q_oct, b_oct, rec, offdiag, kind, updown, lo, hi)
    out_m[...] = q_oct.interleave(H, T)
    if fuse_residual:
        res2 = _residual_oct(q_oct, b_oct, diag, offdiag)
        if fuse_norm:
            res_m[...] = _emit_norm(res2, H, T, kp, b_m.dtype)
        else:
            r = _OctantField.__new__(_OctantField)
            r.p = res2
            res_m[...] = r.interleave(H, T)


# ---------------------------------------------------------------------------
# call wrappers
# ---------------------------------------------------------------------------

def _fine_specs(ndir, T, H, kp):
    """mid/top/bot block specs for so (5D) and q/b (3D)."""
    tb = T // H

    def mid4(i):
        return (0, 0, i, 0)

    def top4(i):
        return (0, 0, jnp.maximum(i * tb - 1, 0), 0)

    def bot4(i, nb):
        return (0, 0, jnp.minimum((i + 1) * tb, nb), 0)

    def mid(i):
        return (0, i, 0)

    def top(i):
        return (0, jnp.maximum(i * tb - 1, 0), 0)

    def bot(i, nb):
        return (0, jnp.minimum((i + 1) * tb, nb), 0)

    return mid4, top4, bot4, mid, top, bot


def _vmem_params():
    return pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024)


@functools.partial(
    jax.jit,
    static_argnames=("kind", "updown", "nz2", "lo", "hi", "H", "T",
                     "fuse_residual", "fuse_norm"),
)
def _sweep_call3(so4, q4, b4, kind, updown, nz2, lo, hi, H, T,
                 fuse_residual, fuse_norm):
    _, nxp, kp = q4.shape
    ndir = so4.shape[0]
    assert nxp % T == 0 and T % H == 0 and H % 2 == 0
    nb = nxp // T
    nbh = nxp // H - 1
    mid4, top4, bot4, mid, top, bot = _fine_specs(ndir, T, H, kp)

    kernel = functools.partial(
        _sweep_kernel3, kind=kind, updown=updown, T=T, H=H, nxp=nxp,
        nz2=nz2, lo=lo, hi=hi, fuse_residual=fuse_residual,
        fuse_norm=fuse_norm,
    )
    if fuse_norm:
        res_shape = (8 * nb, kp)
    elif fuse_residual:
        res_shape = (4, nxp, kp)
    else:
        res_shape = (4, 8, 128)
    q_out, res = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((ndir, 4, T, kp), mid4),
            pl.BlockSpec((ndir, 4, H, kp), top4),
            pl.BlockSpec((ndir, 4, H, kp),
                         functools.partial(bot4, nb=nbh)),
            pl.BlockSpec((4, T, kp), mid),
            pl.BlockSpec((4, H, kp), top),
            pl.BlockSpec((4, H, kp), functools.partial(bot, nb=nbh)),
            pl.BlockSpec((4, T, kp), mid),
            pl.BlockSpec((4, H, kp), top),
            pl.BlockSpec((4, H, kp), functools.partial(bot, nb=nbh)),
        ],
        out_specs=[
            pl.BlockSpec((4, T, kp), mid),
            pl.BlockSpec((8, kp), lambda i: (i, 0)) if fuse_norm
            else (pl.BlockSpec((4, T, kp), mid) if fuse_residual
                  else pl.BlockSpec((4, 8, 128), lambda i: (0, 0, 0))),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, nxp, kp), q4.dtype),
            jax.ShapeDtypeStruct(res_shape, q4.dtype),
        ],
        compiler_params=_vmem_params(),
        interpret=INTERPRET,
    )(so4, so4, so4, b4, b4, b4, q4, q4, q4)
    if fuse_residual:
        return q_out, res
    return q_out


def point_relax_split3(so4, q4, b4, kind, updown, fuse_residual=False,
                       fuse_norm=False, nz2=None):
    """One full multicolor sweep on the octant-split representation.

    ULP-level agreement with the dense sweeps (ops.pallas3 / ops.relax3)
    on the merged arrays (FMA contraction may differ between layouts).  With ``fuse_norm`` the second return value is a
    (8*nblocks, kp) array of per-block partial sums of res² (the
    convergence norm is ``sqrt(sum(...))``; the residual never leaves
    VMEM).  Serial, non-periodic."""
    assert nz2 is not None
    kp = q4.shape[2]
    plan = _plan_split(kind, kp, "sweep", q4.shape[1])
    fuse_residual = fuse_residual or fuse_norm
    res = None
    for n, (lo, hi, H, T) in enumerate(plan):
        last = n == len(plan) - 1
        out = _sweep_call3(so4, q4, b4, kind, updown, nz2, lo, hi, H, T,
                           fuse_residual and last, fuse_norm and last)
        if fuse_residual and last:
            q4, res = out
        else:
            q4 = out
    if fuse_residual:
        return q4, res
    return q4


@functools.partial(
    jax.jit,
    static_argnames=("kind", "updown", "nz2", "lo", "hi", "H", "T",
                     "emit_res"),
)
def _sweep_restrict_call3(so4, q4, b4, pw4, kind, updown, nz2, lo, hi,
                          H, T, emit_res):
    _, nxp, kp = q4.shape
    ndir = so4.shape[0]
    assert nxp % T == 0 and T % H == 0 and (T // 2) % 8 == 0
    nb = nxp // T
    nbh = nxp // H - 1
    Tc = T // 2
    mid4, top4, bot4, mid, top, bot = _fine_specs(ndir, T, H, kp)

    kernel = functools.partial(
        _sweep_restrict_kernel3, kind=kind, updown=updown, T=T, H=H,
        nxp=nxp, nz2=nz2, lo=lo, hi=hi, emit_res=emit_res,
    )
    q_out, res, cb = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((ndir, 4, T, kp), mid4),
            pl.BlockSpec((ndir, 4, H, kp), top4),
            pl.BlockSpec((ndir, 4, H, kp),
                         functools.partial(bot4, nb=nbh)),
            pl.BlockSpec((4, T, kp), mid),
            pl.BlockSpec((4, H, kp), top),
            pl.BlockSpec((4, H, kp), functools.partial(bot, nb=nbh)),
            pl.BlockSpec((4, T, kp), mid),
            pl.BlockSpec((4, H, kp), top),
            pl.BlockSpec((4, H, kp), functools.partial(bot, nb=nbh)),
            pl.BlockSpec((26, Tc, kp), lambda i: (0, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((4, T, kp), mid),
            pl.BlockSpec((4, T, kp), mid) if emit_res
            else pl.BlockSpec((4, 8, 128), lambda i: (0, 0, 0)),
            pl.BlockSpec((Tc, kp), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, nxp, kp), q4.dtype),
            jax.ShapeDtypeStruct(
                (4, nxp, kp) if emit_res else (4, 8, 128), q4.dtype
            ),
            jax.ShapeDtypeStruct((nxp // 2, kp), q4.dtype),
        ],
        compiler_params=_vmem_params(),
        interpret=INTERPRET,
    )(so4, so4, so4, b4, b4, b4, q4, q4, q4, pw4)
    return q_out, (res if emit_res else None), cb


def _restrict_kernel3(res_m, res_t, res_b, w_m, cb_m, *, T, H, nz2):
    """Standalone restriction of an emitted split residual (term order =
    interp3.restrict).  Used when the fused sweep+restrict pass exceeds
    VMEM (27-pt at >= 128^3 — measured 127.4M vs the 120M scoped
    limit)."""
    res = jnp.concatenate([res_t[...], res_m[...], res_b[...]], axis=1)
    res_oct = _OctantField(res)
    h2, Tc = H // 2, T // 2
    w = w_m[...]
    qc = _sample_res(res_oct, (0, 0, 0), nz2, h2, Tc)
    for n, off in enumerate(_OFFSETS26):
        qc = qc + w[n] * _sample_res(res_oct, off, nz2, h2, Tc)
    cb_m[...] = qc


def _restrict_rows(T: int) -> int:
    """Class-row VMEM model for the standalone restriction: weight
    streams dominate at 2·26·(T/2) rows, residual windows add
    ~4·(T+16)+27·(T/2) sampled pieces (conservative)."""
    rows = 2 * 26 * (T // 2) + 2 * 4 * T + 2 * 4 * 8 * 2
    rows += 4 * (T + 16) + 27 * (T // 2) + 2 * (T // 2)
    return rows


def _interp_rows(T: int) -> int:
    """Class-row VMEM model for the pointwise interpolation kernel
    (weight streams 2·26·(T/2) + q/res/diag mids 3·2·4·T + sampled
    w/cx copies)."""
    rows = 2 * 26 * (T // 2 + 8) + 2 * (T // 2 + 8)
    rows += 3 * 2 * 4 * T + 2 * 4 * T
    rows += 27 * 2 * (T // 2) + 3 * 8 * (T // 2)
    return rows


def _lane_halo(nz2: int) -> int:
    """Panel halo in ys columns for the standalone transfer kernels:
    sample rolls reach at most nz2+1 lanes (one ys column plus one zs),
    so 2 columns suffice; the lane offset h·nz2 must be a 128-multiple
    (Mosaic block alignment)."""
    import math

    g = 128 // math.gcd(nz2, 128)
    return -(-2 // g) * g if g > 2 else 2


def _panel_plan(rows_fn, nxp: int, kp: int, nz2: int):
    """(T, W, h) for a lane-panelable kernel: full lane width (h == 0)
    when it fits VMEM, else panels of W ys-columns with h halo columns
    per side (wrapping at the grid edge, reproducing the full-width
    kernel's lane-roll wrap); None when nothing fits or the halo
    refetch would exceed 50%."""
    ny2 = kp // nz2
    h = _lane_halo(nz2)
    best = None
    for T in (64, 32, 16):
        if nxp % T or (T // 2) % 8:
            continue
        rows = rows_fn(T)
        if rows * kp * 4 <= _VMEM_BUDGET:
            return (T, ny2, 0)
        if h <= 0 or ny2 % h:
            continue
        for W in range(ny2 - h, 0, -h):
            if ny2 % W or W % h:
                continue
            if rows * (W + 2 * h) * nz2 * 4 <= _VMEM_BUDGET:
                cost = 2 * h / W
                if best is None or cost < best[0]:
                    best = (cost, (T, W, h))
                break
    if best is not None and best[0] <= 0.5:
        return best[1]
    return None


def _restrict_plan(nxp: int, kp: int, nz2: int):
    return _panel_plan(_restrict_rows, nxp, kp, nz2)


def _interp_plan(nxp: int, kp: int, nz2: int):
    return _panel_plan(_interp_rows, nxp, kp, nz2)


def _lane_maps(W: int, h: int, ny2: int):
    """(uh, nblk, lh, rh): halo-block bookkeeping in ys-column units.
    Edge panels' halo blocks WRAP to the opposite side — the full-width
    kernel's lane rolls wrap too, and correctness relies on the wrapped
    value being the opposite boundary's stored zero."""
    uh = W // h
    nblk = ny2 // h

    def lh(j):
        return (j * uh - 1) % nblk

    def rh(j):
        return ((j + 1) * uh) % nblk

    return uh, nblk, lh, rh


def _restrict_kernel3_panel(
    rm_l, rm, rm_r, rt_l, rt, rt_r, rb_l, rb, rb_r, w_m, cb_m,
    *, T, H, nz2, hl,
):
    """Lane-panel variant of :func:`_restrict_kernel3`: the residual
    window carries h ys-columns of halo per side (sample rolls reach at
    most nz2+1 lanes); weights and output are interior-only."""

    def cat(l, m, r):
        return jnp.concatenate([l[...], m[...], r[...]], axis=2)

    res = jnp.concatenate(
        [cat(rt_l, rt, rt_r), cat(rm_l, rm, rm_r), cat(rb_l, rb, rb_r)],
        axis=1,
    )
    res_oct = _OctantField(res)
    h2, Tc = H // 2, T // 2
    w = w_m[...]
    Wl = w.shape[2]

    def interior(a):
        return a[:, hl: hl + Wl]

    qc = interior(_sample_res(res_oct, (0, 0, 0), nz2, h2, Tc))
    for n, off in enumerate(_OFFSETS26):
        qc = qc + w[n] * interior(_sample_res(res_oct, off, nz2, h2, Tc))
    cb_m[...] = qc


@functools.partial(jax.jit, static_argnames=("nz2", "plan"))
def _restrict_call3(pw4, res4, nz2, plan):
    _, nxp, kp = res4.shape
    H = 8
    T, W, h = plan
    assert nxp % T == 0 and T % H == 0 and (T // 2) % 8 == 0
    nb = nxp // T
    nbh = nxp // H - 1
    Tc = T // 2
    ny2 = kp // nz2

    if h == 0:
        _, _, _, mid, top, bot = _fine_specs(0, T, H, kp)
        kernel = functools.partial(_restrict_kernel3, T=T, H=H, nz2=nz2)
        return pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((4, T, kp), mid),
                pl.BlockSpec((4, H, kp), top),
                pl.BlockSpec((4, H, kp), functools.partial(bot, nb=nbh)),
                pl.BlockSpec((26, Tc, kp), lambda i: (0, i, 0)),
            ],
            out_specs=pl.BlockSpec((Tc, kp), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((nxp // 2, kp), res4.dtype),
            compiler_params=_vmem_params(),
            interpret=INTERPRET,
        )(res4, res4, res4, pw4)

    Wl, hl = W * nz2, h * nz2
    kb = ny2 // W
    _, _, lhf, rhf = _lane_maps(W, h, ny2)

    def mid(j, i):
        return (0, i, j)

    def top(j, i):
        return (0, jnp.maximum(i * (T // H) - 1, 0), j)

    def bot(j, i):
        return (0, jnp.minimum((i + 1) * (T // H), nbh), j)

    def row_specs(row_ix, width_u):
        # one (left-halo, mid, right-halo) triple for a given row map;
        # halo lane-block indices are in units of hl, mid in units Wl
        def lhs(j, i):
            r = row_ix(j, i)
            return (r[0], r[1], lhf(j))

        def rhs(j, i):
            r = row_ix(j, i)
            return (r[0], r[1], rhf(j))

        return [
            pl.BlockSpec((4, width_u, hl), lhs),
            pl.BlockSpec((4, width_u, Wl), row_ix),
            pl.BlockSpec((4, width_u, hl), rhs),
        ]

    kernel = functools.partial(
        _restrict_kernel3_panel, T=T, H=H, nz2=nz2, hl=hl,
    )
    return pl.pallas_call(
        kernel,
        grid=(kb, nb),
        in_specs=(
            row_specs(mid, T) + row_specs(top, H) + row_specs(bot, H)
            + [pl.BlockSpec((26, Tc, Wl), lambda j, i: (0, i, j))]
        ),
        out_specs=pl.BlockSpec((Tc, Wl), lambda j, i: (i, j)),
        out_shape=jax.ShapeDtypeStruct((nxp // 2, kp), res4.dtype),
        compiler_params=_vmem_params(),
        interpret=INTERPRET,
    )(*([res4] * 9), pw4)


def sweep_restrict_split3(so4, q4, b4, pw4, kind, updown, nc,
                          emit_res=True, nz2=None):
    """Fused final pre-sweep + residual + restriction, split layout.

    Returns ``(q4, res4, cb)`` with ``cb`` the DENSE coarse rhs
    (nxc, nyc, nzc).  With ``emit_res=False`` the residual never touches
    HBM (interp_sweep_split3 recomputes it) — fused plan only; when the
    fused tail pass exceeds VMEM the residual is emitted regardless and
    a standalone restriction kernel consumes it.  ULP-level agreement
    with ``point_relax_split3(fuse_residual)`` + ``interp3.restrict``.
    Reference: BMG3_SymStd_relax_GS.f90 + BMG3_SymStd_restrict.f90."""
    assert nz2 is not None
    _, nxp, kp = q4.shape
    plan = _plan_split(kind, kp, "sweep_restrict", nxp)
    nxc, nyc, nzc = nc
    ny2 = kp // nz2

    def crop(cbf):
        return cbf[:nxc].reshape(-1, ny2, nz2)[:, :nyc, :nzc]

    if plan is None:
        # emit the residual from the sweep, restrict standalone
        q4, res = point_relax_split3(so4, q4, b4, kind, updown,
                                     fuse_residual=True, nz2=nz2)
        rplan = _restrict_plan(nxp, kp, nz2)
        assert rplan is not None, "caller must gate on _restrict_plan"
        cbf = _restrict_call3(pw4, res, nz2, rplan)
        return q4, res, crop(cbf)

    res = None
    for n, (lo, hi, H, T) in enumerate(plan):
        if n < len(plan) - 1:
            q4 = _sweep_call3(so4, q4, b4, kind, updown, nz2, lo, hi, H,
                              T, False, False)
        else:
            q4, res, cbf = _sweep_restrict_call3(
                so4, q4, b4, pw4, kind, updown, nz2, lo, hi, H, T,
                emit_res,
            )
    return q4, res, crop(cbf)


@functools.partial(
    jax.jit,
    static_argnames=("kind", "updown", "nz2", "lo", "hi", "H", "T",
                     "fuse_residual", "fuse_norm"),
)
def _interp_sweep_call3(pw4, cxp, so4, q4, b4, kind, updown, nz2, lo, hi,
                        H, T, fuse_residual, fuse_norm):
    _, nxp, kp = q4.shape
    ndir = so4.shape[0]
    assert nxp % T == 0 and T % H == 0
    nb = nxp // T
    nbh = nxp // H - 1
    Tc = T // 2
    assert Tc % H == 0
    mid4, top4, bot4, mid, top, bot = _fine_specs(ndir, T, H, kp)

    # coarse window: H-row halos around the Tc mid rows; window coarse
    # start = i*Tc - H, fine window row pair r2 reads index r2 + sx + H/2
    def cmid(i):
        return (i, 0)

    def ctop(i):
        return (jnp.maximum(i * (Tc // H) - 1, 0), 0)

    def cbot(i):
        return ((i + 1) * (Tc // H), 0)

    def cmid3(i):
        return (0, i, 0)

    def ctop3(i):
        return (0, jnp.maximum(i * (Tc // H) - 1, 0), 0)

    def cbot3(i):
        return (0, (i + 1) * (Tc // H), 0)

    kernel = functools.partial(
        _interp_sweep_kernel3, kind=kind, updown=updown, T=T, H=H,
        nxp=nxp, nz2=nz2, lo=lo, hi=hi, fuse_residual=fuse_residual,
        fuse_norm=fuse_norm,
    )
    if fuse_norm:
        res_shape = (8 * nb, kp)
    elif fuse_residual:
        res_shape = (4, nxp, kp)
    else:
        res_shape = (4, 8, 128)
    q_out, res = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((H, kp), ctop),
            pl.BlockSpec((Tc, kp), cmid),
            pl.BlockSpec((H, kp), cbot),
            pl.BlockSpec((26, H, kp), ctop3),
            pl.BlockSpec((26, Tc, kp), cmid3),
            pl.BlockSpec((26, H, kp), cbot3),
            pl.BlockSpec((ndir, 4, T, kp), mid4),
            pl.BlockSpec((ndir, 4, H, kp), top4),
            pl.BlockSpec((ndir, 4, H, kp),
                         functools.partial(bot4, nb=nbh)),
            pl.BlockSpec((4, T, kp), mid),
            pl.BlockSpec((4, H, kp), top),
            pl.BlockSpec((4, H, kp), functools.partial(bot, nb=nbh)),
            pl.BlockSpec((4, T, kp), mid),
            pl.BlockSpec((4, H, kp), top),
            pl.BlockSpec((4, H, kp), functools.partial(bot, nb=nbh)),
        ],
        out_specs=[
            pl.BlockSpec((4, T, kp), mid),
            pl.BlockSpec((8, kp), lambda i: (i, 0)) if fuse_norm
            else (pl.BlockSpec((4, T, kp), mid) if fuse_residual
                  else pl.BlockSpec((4, 8, 128), lambda i: (0, 0, 0))),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, nxp, kp), q4.dtype),
            jax.ShapeDtypeStruct(res_shape, q4.dtype),
        ],
        compiler_params=_vmem_params(),
        interpret=INTERPRET,
    )(cxp, cxp, cxp, pw4, pw4, pw4,
      so4, so4, so4, b4, b4, b4, q4, q4, q4)
    if fuse_residual:
        return q_out, res
    return q_out


def interp_fused_ok(kind, kp, nxp) -> bool:
    """Whether the fully-fused interp+sweep pass fits (else the split
    cycle must emit the residual and take the pointwise interp kernel)."""
    return _plan_split(kind, kp, "interp_sweep", nxp) is not None


def _interp_kernel3(
    cx_m, cx_b, w_m, w_b, diag_m, res_m, q_m, out_m, *, T, nz2,
):
    """Pointwise ``q += P cx + res/diag`` on the split layout.

    No fine halos (interpolation is pointwise in fine space); consumes
    the residual EMITTED by the preceding sweep_restrict pass.  Used for
    stencils whose fused interp+phases pass exceeds VMEM (27-pt at
    >= 128^3: the fused variant's 14-plane windows + 26 coarse weight
    windows overflow — measured as a remote-compile failure)."""
    q_oct = _OctantField(q_m[...])
    res_oct = _OctantField(res_m[...])
    diag_oct = _OctantField(diag_m[...])
    cx = jnp.concatenate([cx_m[...], cx_b[...]], axis=0)
    w = jnp.concatenate([w_m[...], w_b[...]], axis=1)
    R2 = T // 2

    def csample(a, sx, dl):
        rows = a[sx: sx + R2]
        if dl:
            rows = _roll(rows, 0, dl)
        return rows

    for o in _OCTS:
        if o == (0, 0, 0):
            q_oct[o] = q_oct[o] + csample(cx, 0, 0)
            continue
        acc = res_oct[o] / diag_oct[o]
        for n, off in enumerate(_OFFSETS26):
            if (off[0] % 2, off[1] % 2, off[2] % 2) != o:
                continue
            sx = (o[0] - off[0]) // 2
            dl = (((o[1] - off[1]) // 2) * nz2 + (o[2] - off[2]) // 2)
            acc = acc + csample(w[n], sx, dl) * csample(cx, sx, dl)
        q_oct[o] = q_oct[o] + acc
    out_m[...] = q_oct.interleave(0, T)


def _interp_kernel3_nores(cx_m, cx_b, w_m, w_b, out_m, *, T, nz2):
    """``x = P cx`` alone, split layout — the F-cycle's level-entry
    interpolation (fcycle.h:66-72): zero residual and zero fine iterate,
    so streaming res/diag/q there is pure waste (the 2D analogue of this
    change took the 4096² F-cycle from 23.2 to 5.9 ms)."""
    cx = jnp.concatenate([cx_m[...], cx_b[...]], axis=0)
    w = jnp.concatenate([w_m[...], w_b[...]], axis=1)
    R2 = T // 2

    def csample(a, sx, dl):
        rows = a[sx: sx + R2]
        if dl:
            rows = _roll(rows, 0, dl)
        return rows

    out = _OctantField.__new__(_OctantField)
    out.p = {}
    for o in _OCTS:
        if o == (0, 0, 0):
            out.p[o] = csample(cx, 0, 0)
            continue
        acc = None
        for n, off in enumerate(_OFFSETS26):
            if (off[0] % 2, off[1] % 2, off[2] % 2) != o:
                continue
            sx = (o[0] - off[0]) // 2
            dl = (((o[1] - off[1]) // 2) * nz2 + (o[2] - off[2]) // 2)
            term = csample(w[n], sx, dl) * csample(cx, sx, dl)
            acc = term if acc is None else acc + term
        out.p[o] = acc
    out_m[...] = out.interleave(0, T)


@functools.partial(jax.jit, static_argnames=("nz2", "plan"))
def interp_split_nores3(pw4, cxp, nz2, plan):
    """Split-layout ``P cx`` with no residual/q streams (full-width or
    lane panels per ``plan``, like :func:`_interp_call3`)."""
    _, rows, kp = pw4.shape[0], pw4.shape[1], pw4.shape[2]
    nxp = (rows - 2 * 16) * 2
    T, W, h = plan
    assert nxp % T == 0 and (T // 2) % 8 == 0
    nb = nxp // T
    Tc = T // 2
    ny2 = kp // nz2

    if h == 0:
        kernel = functools.partial(_interp_kernel3_nores, T=T, nz2=nz2)
        return pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((Tc, kp), lambda i: (i, 0)),
                pl.BlockSpec((8, kp), lambda i: ((i + 1) * (Tc // 8), 0)),
                pl.BlockSpec((26, Tc, kp), lambda i: (0, i, 0)),
                pl.BlockSpec((26, 8, kp),
                             lambda i: (0, (i + 1) * (Tc // 8), 0)),
            ],
            out_specs=pl.BlockSpec((4, T, kp), lambda i: (0, i, 0)),
            out_shape=jax.ShapeDtypeStruct((4, nxp, kp), cxp.dtype),
            compiler_params=_vmem_params(),
            interpret=INTERPRET,
        )(cxp, cxp, pw4, pw4)

    Wl, hl = W * nz2, h * nz2
    kb = ny2 // W
    _, _, lhf, rhf = _lane_maps(W, h, ny2)

    def cm(j, i):
        return (i, j)

    def cb(j, i):
        return ((i + 1) * (Tc // 8), j)

    def wm_(j, i):
        return (0, i, j)

    def wb_(j, i):
        return (0, (i + 1) * (Tc // 8), j)

    def tri2(row_ix, width_u):
        return [
            pl.BlockSpec((width_u, hl),
                         lambda j, i, f=row_ix: (f(j, i)[0], lhf(j))),
            pl.BlockSpec((width_u, Wl), row_ix),
            pl.BlockSpec((width_u, hl),
                         lambda j, i, f=row_ix: (f(j, i)[0], rhf(j))),
        ]

    def tri3(row_ix, width_u):
        return [
            pl.BlockSpec((26, width_u, hl),
                         lambda j, i, f=row_ix: (0, f(j, i)[1], lhf(j))),
            pl.BlockSpec((26, width_u, Wl), row_ix),
            pl.BlockSpec((26, width_u, hl),
                         lambda j, i, f=row_ix: (0, f(j, i)[1], rhf(j))),
        ]

    def _panel_kernel(cxm_l, cxm, cxm_r, cxb_l, cxb, cxb_r,
                      wm_l, wm, wm_r, wb_l, wb, wb_r, out_m,
                      *, T, nz2, hl):
        cx_m = jnp.concatenate([cxm_l[...], cxm[...], cxm_r[...]], axis=1)
        cx_b = jnp.concatenate([cxb_l[...], cxb[...], cxb_r[...]], axis=1)
        w_m = jnp.concatenate([wm_l[...], wm[...], wm_r[...]], axis=2)
        w_b = jnp.concatenate([wb_l[...], wb[...], wb_r[...]], axis=2)
        cx = jnp.concatenate([cx_m, cx_b], axis=0)
        w = jnp.concatenate([w_m, w_b], axis=1)
        R2 = T // 2
        Wl_ = out_m.shape[2]

        def csample(a, sx, dl):
            rows = a[sx: sx + R2]
            if dl:
                rows = _roll(rows, 0, dl)
            return rows[:, hl: hl + Wl_]

        out = _OctantField.__new__(_OctantField)
        out.p = {}
        for o in _OCTS:
            if o == (0, 0, 0):
                out.p[o] = csample(cx, 0, 0)
                continue
            acc = None
            for n, off in enumerate(_OFFSETS26):
                if (off[0] % 2, off[1] % 2, off[2] % 2) != o:
                    continue
                sx = (o[0] - off[0]) // 2
                dl = (((o[1] - off[1]) // 2) * nz2
                      + (o[2] - off[2]) // 2)
                term = csample(w[n], sx, dl) * csample(cx, sx, dl)
                acc = term if acc is None else acc + term
            out.p[o] = acc
        out_m[...] = out.interleave(0, T)

    kernel = functools.partial(_panel_kernel, T=T, nz2=nz2, hl=hl)
    return pl.pallas_call(
        kernel,
        grid=(kb, nb),
        in_specs=(tri2(cm, Tc) + tri2(cb, 8) + tri3(wm_, Tc)
                  + tri3(wb_, 8)),
        out_specs=pl.BlockSpec((4, T, Wl), lambda j, i: (0, i, j)),
        out_shape=jax.ShapeDtypeStruct((4, nxp, kp), cxp.dtype),
        compiler_params=_vmem_params(),
        interpret=INTERPRET,
    )(cxp, cxp, cxp, cxp, cxp, cxp, pw4, pw4, pw4, pw4, pw4, pw4)


def _interp_kernel3_panel(
    cxm_l, cxm, cxm_r, cxb_l, cxb, cxb_r,
    wm_l, wm, wm_r, wb_l, wb, wb_r,
    diag_m, res_m, q_m, out_m, *, T, nz2, hl,
):
    """Lane-panel variant of :func:`_interp_kernel3`: the coarse
    solution and weight windows carry h ys-columns of halo per side
    (their sample rolls reach at most nz2+1 lanes in either direction);
    q/res/diag are pointwise in lanes and stay interior-only."""
    q_oct = _OctantField(q_m[...])
    res_oct = _OctantField(res_m[...])
    diag_oct = _OctantField(diag_m[...])
    cx = jnp.concatenate(
        [jnp.concatenate([cxm_l[...], cxm[...], cxm_r[...]], axis=1),
         jnp.concatenate([cxb_l[...], cxb[...], cxb_r[...]], axis=1)],
        axis=0,
    )
    w = jnp.concatenate(
        [jnp.concatenate([wm_l[...], wm[...], wm_r[...]], axis=2),
         jnp.concatenate([wb_l[...], wb[...], wb_r[...]], axis=2)],
        axis=1,
    )
    R2 = T // 2
    Wl = q_m.shape[2]

    def csample(a, sx, dl):
        rows = a[sx: sx + R2]
        if dl:
            rows = _roll(rows, 0, dl)
        return rows[:, hl: hl + Wl]

    for o in _OCTS:
        if o == (0, 0, 0):
            q_oct[o] = q_oct[o] + csample(cx, 0, 0)
            continue
        acc = res_oct[o] / diag_oct[o]
        for n, off in enumerate(_OFFSETS26):
            if (off[0] % 2, off[1] % 2, off[2] % 2) != o:
                continue
            sx = (o[0] - off[0]) // 2
            dl = (((o[1] - off[1]) // 2) * nz2 + (o[2] - off[2]) // 2)
            acc = acc + csample(w[n], sx, dl) * csample(cx, sx, dl)
        q_oct[o] = q_oct[o] + acc
    out_m[...] = q_oct.interleave(0, T)


@functools.partial(jax.jit, static_argnames=("nz2", "plan"))
def _interp_call3(pw4, cxp, diag4, res4, q4, nz2, plan):
    _, nxp, kp = q4.shape
    T, W, h = plan
    assert nxp % T == 0 and (T // 2) % 8 == 0
    nb = nxp // T
    Tc = T // 2
    ny2 = kp // nz2

    if h == 0:
        def mid(i):
            return (0, i, 0)

        kernel = functools.partial(_interp_kernel3, T=T, nz2=nz2)
        return pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((Tc, kp), lambda i: (i, 0)),
                pl.BlockSpec((8, kp), lambda i: ((i + 1) * (Tc // 8), 0)),
                pl.BlockSpec((26, Tc, kp), lambda i: (0, i, 0)),
                pl.BlockSpec((26, 8, kp),
                             lambda i: (0, (i + 1) * (Tc // 8), 0)),
                pl.BlockSpec((4, T, kp), mid),
                pl.BlockSpec((4, T, kp), mid),
                pl.BlockSpec((4, T, kp), mid),
            ],
            out_specs=pl.BlockSpec((4, T, kp), mid),
            out_shape=jax.ShapeDtypeStruct((4, nxp, kp), q4.dtype),
            compiler_params=_vmem_params(),
            interpret=INTERPRET,
        )(cxp, cxp, pw4, pw4, diag4, res4, q4)

    Wl, hl = W * nz2, h * nz2
    kb = ny2 // W
    _, _, lhf, rhf = _lane_maps(W, h, ny2)

    def cm(j, i):
        return (i, j)

    def cb(j, i):
        return ((i + 1) * (Tc // 8), j)

    def wm_(j, i):
        return (0, i, j)

    def wb_(j, i):
        return (0, (i + 1) * (Tc // 8), j)

    def mid(j, i):
        return (0, i, j)

    def tri2(row_ix, width_u):
        return [
            pl.BlockSpec((width_u, hl),
                         lambda j, i, f=row_ix: (f(j, i)[0], lhf(j))),
            pl.BlockSpec((width_u, Wl), row_ix),
            pl.BlockSpec((width_u, hl),
                         lambda j, i, f=row_ix: (f(j, i)[0], rhf(j))),
        ]

    def tri3(row_ix, width_u):
        return [
            pl.BlockSpec((26, width_u, hl),
                         lambda j, i, f=row_ix: (0, f(j, i)[1], lhf(j))),
            pl.BlockSpec((26, width_u, Wl), row_ix),
            pl.BlockSpec((26, width_u, hl),
                         lambda j, i, f=row_ix: (0, f(j, i)[1], rhf(j))),
        ]

    kernel = functools.partial(
        _interp_kernel3_panel, T=T, nz2=nz2, hl=hl,
    )
    return pl.pallas_call(
        kernel,
        grid=(kb, nb),
        in_specs=(
            tri2(cm, Tc) + tri2(cb, 8) + tri3(wm_, Tc) + tri3(wb_, 8)
            + [pl.BlockSpec((4, T, Wl), mid)] * 3
        ),
        out_specs=pl.BlockSpec((4, T, Wl), mid),
        out_shape=jax.ShapeDtypeStruct((4, nxp, kp), q4.dtype),
        compiler_params=_vmem_params(),
        interpret=INTERPRET,
    )(cxp, cxp, cxp, cxp, cxp, cxp, pw4, pw4, pw4, pw4, pw4, pw4,
      diag4, res4, q4)


def interp_sweep_split3(pw4, cx, so4, b4, q4_presmoothed, kind, updown,
                        fuse_norm=False, nz2=None, res4=None):
    """``q += P cx + res/diag`` then one multicolor sweep.

    ``q4_presmoothed`` MUST be the pre-smoothed split iterate whose
    residual was restricted.  When the fused plan fits
    (:func:`interp_fused_ok`), the fine-point correction's residual is
    recomputed in-VMEM and never touches HBM; otherwise the caller must
    pass the residual EMITTED by the sweep_restrict pass as ``res4`` and
    the interpolation runs as a pointwise kernel before the sweep
    passes.  ULP-level agreement (FMA contraction differs) with
    ``interp3.interp_add`` + the dense sweep.  With ``fuse_norm`` the
    second return value is the per-block partial res² sums.  Reference:
    BMG3_SymStd_interp_add.f90:88-242 + BMG3_SymStd_relax_GS.f90."""
    assert nz2 is not None
    q4 = q4_presmoothed
    _, nxp, kp = q4.shape
    plan = _plan_split(kind, kp, "interp_sweep", nxp)
    ny2 = kp // nz2

    # pad the dense coarse solution into the weight row/lane space
    rows = nxp // 2 + 2 * 16
    nxc, nyc, nzc = cx.shape
    cxp = jnp.pad(cx, ((0, rows - nxc), (0, ny2 - nyc), (0, nz2 - nzc)))
    cxp = cxp.reshape(rows, kp)

    res = None
    if plan is None:
        # pointwise interp from the emitted residual, then plain sweeps
        assert res4 is not None, "caller must emit the residual"
        splan = _plan_split(kind, kp, "sweep", nxp)
        iplan = _interp_plan(nxp, kp, nz2)
        assert iplan is not None, "caller must gate on _interp_plan"
        q4 = _interp_call3(pw4, cxp, so4[Dir3.P], res4, q4, nz2, iplan)
        for n, (lo, hi, H, T) in enumerate(splan):
            last = n == len(splan) - 1
            out = _sweep_call3(so4, q4, b4, kind, updown, nz2, lo, hi, H,
                               T, fuse_norm and last, fuse_norm and last)
            if fuse_norm and last:
                q4, res = out
            else:
                q4 = out
        if fuse_norm:
            return q4, res
        return q4

    for n, (lo, hi, H, T) in enumerate(plan):
        last = n == len(plan) - 1
        if n == 0:
            out = _interp_sweep_call3(
                pw4, cxp, so4, q4, b4, kind, updown, nz2, lo, hi, H, T,
                fuse_norm and last, fuse_norm and last,
            )
        else:
            out = _sweep_call3(so4, q4, b4, kind, updown, nz2, lo, hi, H,
                               T, fuse_norm and last, fuse_norm and last)
        if fuse_norm and last:
            q4, res = out
        else:
            q4 = out
    if fuse_norm:
        return q4, res
    return q4

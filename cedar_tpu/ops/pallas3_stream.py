"""Streaming (wavefront) 3D multicolor sweep: one HBM pass, zero refetch.

The halo-window kernels (:mod:`cedar_tpu.ops.pallas3_split`) re-fetch
``2H/T`` of every stream as halo blocks and must split the 27-point sweep
into two passes to fit VMEM — at 128³ that puts the sweep at ~0.82 ms
against a ~0.21 ms traffic floor.  This kernel exploits that a Pallas TPU
grid executes SEQUENTIALLY on the core: instead of re-fetching halos it
CARRIES the in-flight boundary rows between grid steps in VMEM scratch
(which persists across iterations), processing the colors as a skewed
wavefront:

* grid step ``i`` loads x-row slab ``[iT, iT+T)`` of so/b/q ONCE (mid
  blocks only — no halo streams);
* color phase ``s`` (1-based, reference order) is applied to global rows
  ``[iT - s, iT + T - s)`` — each row's phase-s update sees exactly the
  phase-(s-1) state of its neighbors, so the result is identical to the
  sequential full-grid sweep;
* the trailing ``P'`` rows of the window (still mid-wavefront) are saved
  to scratch for step ``i+1``; fully-relaxed rows are emitted one block
  behind through a staging scratch (the output block is written twice —
  Pallas keeps the buffer until the block index changes, so the last
  write wins);
* the residual (and optionally per-block res² partial sums — the solve
  loop's convergence norm) rides as one more wavefront stage.

Traffic per sweep = read so+q+b once + write q (+res): the sweep's
speed-of-light.  Same octant-split layout, color semantics and term
order as pallas3_split (ULP-level agreement with the XLA path).
Serial, non-periodic, f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cedar_tpu.core.types import Dir3, StencilKind
from cedar_tpu.ops.pallas3_split import (
    _OCTS,
    _OFFSETS26 as _OFFSETS26_S,
    _OctantField,
    _mk_offdiag,
    _phase_octants,
    _roll,
    _shiftc,
    _table_for,
)

INTERPRET = False


def _params(kind: StencilKind, emit: str):
    """(P, S, Pp): phases, finish stage, carry rows.

    The carry must reach ONE row below the deepest stage's update range
    (its w-1 neighbor read; a window roll would wrap to the newest rows),
    so Pp = P + 1 rounded to even (octant x-parity alignment) — which
    also covers the residual stage's own range."""
    P = 2 if kind == StencilKind.seven_pt else 8
    S = P + (1 if emit in ("res", "norm") else 0)
    Pp = -(-(P + 1) // 2) * 2
    return P, S, Pp


_BUDGET = 112 * 1024 * 1024   # stream planning budget, calibrated on
# v5e: the 27-pt T=16 full-width sweep (model 111.4M) compiles at
# 119.4M scoped (limit 120M); the fused-norm variant fits only with the
# unused residual-head carry dropped (its 1.0M was the overflow)


def _rows_model(kind, T, Pp, interp=False):
    """Class-row count of the VMEM model per lane (streams double-
    buffered + carries + window temps), as in the halo-window kernels'
    _model_rows but for the wavefront schedule (no row-halo streams)."""
    nd = 4 if kind == StencilKind.seven_pt else 14
    R = T + Pp
    rows = 2 * (nd + 2) * 4 * T          # mid stream buffers
    rows += (nd + 2) * 4 * Pp            # carries
    rows += 2 * 4 * T * 4                # out/res + heads
    rows += (nd + 2) * 4 * R             # window concats
    rows += 10 * 8 * (R // 2)            # octant pieces
    ncpl = 6 if nd == 4 else 26
    rows += (ncpl * 8 // 3) * (R // 2)   # shifted coupling copies
    if interp:
        # fused-interpolation stage: w/cx/res streams + sampled copies
        rows += 2 * (26 + 1) * (T // 2 + 8) + 2 * 4 * T
        rows += 27 * 2 * (T // 2) + 4 * T
    return rows


def _plan_stream(kind, nxp, ny2, nz2, interp=False):
    """(T, W, h): x-rows per step, lane-panel width and halo (both in
    ys columns; W == ny2, h == 0 means full-width, no panels).

    Lane panels extend the wavefront sweep to sizes whose full lane
    width exceeds VMEM (e.g. 256³: kp = 16384): the grid gains an outer
    panel dimension and each panel carries ``h`` halo ys-columns per
    side — corruption from the panel edge advances at most one column
    plus one lane per phase stage (the widest in-kernel roll is
    nz2 + 1), so h = S + 1 columns keep the interior exact, rounded up
    so the lane offset h·nz2 is a 128-multiple (Mosaic slice/block
    alignment) and h divides the panel width (halo block index maps
    step in whole halo blocks).  Candidates are scored by halo refetch
    2h/W; full-width plans win outright."""
    import math

    P, S, Pp = _params(kind, "res")
    g = 128 // math.gcd(nz2, 128)
    h0 = -(-(S + 1) // g) * g
    # smallest divisor of ny2 that is >= h0 and a multiple of g (h0
    # itself rarely divides power-of-two ny2 — e.g. 27-pt S+1 = 10)
    h = next((d for d in range(h0, ny2 + 1)
              if ny2 % d == 0 and d % g == 0), 0)
    # the interp rows model double-counts the window concats against
    # what Mosaic actually allocates: the (16,64,4) interp-fused plan at
    # 256^3 models 159% of budget yet compiles under the 124M scoped
    # limit — measured headroom factor 1.45.  Applied to the PANELED
    # search only: a narrower panel is always available below a paneled
    # choice, while a mis-modeled full-width pick would fail to compile
    # with no fallback.
    budget = int(_BUDGET * 1.45) if interp else _BUDGET
    best = None
    for T in (32, 16):
        if nxp % T or T < S:
            continue
        rows = _rows_model(kind, T, Pp, interp)
        if rows * ny2 * nz2 * 4 <= _BUDGET:
            return (T, ny2, 0)
        # largest panel width that fits, multiples of h dividing ny2
        if h <= 0 or h >= ny2:
            continue
        for W in range(ny2 - h, 0, -h):
            if ny2 % W:
                continue
            if rows * (W + 2 * h) * nz2 * 4 <= budget:
                cost = 2 * h / W
                if best is None or cost < best[0] or (
                        cost == best[0] and T > best[1][0]):
                    best = (cost, (T, W, h))
                break
    # panels with >50% halo refetch lose to the two-pass halo-window
    # kernels — reject them
    if best is not None and best[0] <= 0.5:
        return best[1]
    return None


def stream_supported(shape_split, kind, nz2) -> bool:
    _, nxp, kp = shape_split
    return _plan_stream(kind, nxp, kp // nz2, nz2) is not None


def _stage_mask(G, lo, hi):
    return (G >= lo) & (G < hi)


def _stream_kernel3(
    so_m, b_m, q_m,
    out_m, res_m,
    c_so, c_b, c_q, c_qh, c_rh=None,
    *, kind, updown, T, Pp, S, P, nxp, nz2, emit,
):
    """Full-lane-width wavefront step (no panels)."""
    _stream_body(
        pl.program_id(0), so_m[...], b_m[...], q_m[...], out_m, res_m,
        c_so, c_b, c_q, c_qh, c_rh, kind=kind, updown=updown, T=T,
        Pp=Pp, S=S, P=P, nxp=nxp, nz2=nz2, emit=emit, hl=0,
    )


def _stream_kernel3_interp(
    so_m, b_m, q_m, cx_m, cx_b, w_m, w_b, r_m,
    out_m, res_m,
    c_so, c_b, c_q, c_qh, c_rh=None,
    *, kind, updown, T, Pp, S, P, nxp, nz2, emit,
):
    """Full-lane-width wavefront step with fused stage-0 interpolation."""
    cxw = jnp.concatenate([cx_m[...], cx_b[...]], axis=0)
    ww = jnp.concatenate([w_m[...], w_b[...]], axis=1)
    _stream_body(
        pl.program_id(0), so_m[...], b_m[...], q_m[...], out_m, res_m,
        c_so, c_b, c_q, c_qh, c_rh, kind=kind, updown=updown, T=T,
        Pp=Pp, S=S, P=P, nxp=nxp, nz2=nz2, emit=emit, hl=0,
        interp_refs=(cxw, ww, r_m[...]),
    )


def _stream_kernel3_panel_interp(
    so_l, so_m, so_r, b_l, b_m, b_r, q_l, q_m, q_r,
    cxm_l, cxm, cxm_r, cxb_l, cxb, cxb_r,
    wm_l, wm, wm_r, wb_l, wb, wb_r,
    rm_l, rm, rm_r,
    out_m, res_m,
    c_so, c_b, c_q, c_qh, c_rh=None,
    *, kind, updown, T, Pp, S, P, nxp, nz2, emit, hl,
):
    """Lane-panel wavefront step with fused stage-0 interpolation (cx/w
    and the pre-smooth residual arrive as left-halo/mid/right-halo lane
    blocks — the res/diag correction must also cover the halo lanes so
    later phases read interpolated neighbor values)."""
    so = jnp.concatenate([so_l[...], so_m[...], so_r[...]], axis=3)
    b = jnp.concatenate([b_l[...], b_m[...], b_r[...]], axis=2)
    q = jnp.concatenate([q_l[...], q_m[...], q_r[...]], axis=2)
    cxw = jnp.concatenate(
        [jnp.concatenate([cxm_l[...], cxm[...], cxm_r[...]], axis=1),
         jnp.concatenate([cxb_l[...], cxb[...], cxb_r[...]], axis=1)],
        axis=0,
    )
    ww = jnp.concatenate(
        [jnp.concatenate([wm_l[...], wm[...], wm_r[...]], axis=2),
         jnp.concatenate([wb_l[...], wb[...], wb_r[...]], axis=2)],
        axis=1,
    )
    rw = jnp.concatenate([rm_l[...], rm[...], rm_r[...]], axis=2)
    _stream_body(
        pl.program_id(1), so, b, q, out_m, res_m,
        c_so, c_b, c_q, c_qh, c_rh, kind=kind, updown=updown, T=T,
        Pp=Pp, S=S, P=P, nxp=nxp, nz2=nz2, emit=emit, hl=hl,
        interp_refs=(cxw, ww, rw),
    )


def _stream_kernel3_panel(
    so_l, so_m, so_r, b_l, b_m, b_r, q_l, q_m, q_r,
    out_m, res_m,
    c_so, c_b, c_q, c_qh, c_rh=None,
    *, kind, updown, T, Pp, S, P, nxp, nz2, emit, hl,
):
    """Lane-panel wavefront step: operands arrive as left-halo / mid /
    right-halo lane blocks (halo = h ys-columns; edge panels' halos wrap
    to the opposite side, reproducing the full-width kernel's lane-roll
    wrap on which the stored-zero boundary annihilation relies); outputs
    write the interior lanes only."""
    so = jnp.concatenate([so_l[...], so_m[...], so_r[...]], axis=3)
    b = jnp.concatenate([b_l[...], b_m[...], b_r[...]], axis=2)
    q = jnp.concatenate([q_l[...], q_m[...], q_r[...]], axis=2)
    _stream_body(
        pl.program_id(1), so, b, q, out_m, res_m,
        c_so, c_b, c_q, c_qh, c_rh, kind=kind, updown=updown, T=T,
        Pp=Pp, S=S, P=P, nxp=nxp, nz2=nz2, emit=emit, hl=hl,
    )


def _stream_body_7cls(
    i, so_v, b_v, q_v,
    out_m, res_m,
    c_so, c_b, c_q, c_qh, c_rh,
    *, updown, T, Pp, S, P, nxp, nz2, emit, hl, interp_refs=None,
):
    """Class-dense 7-pt wavefront body (no octant x-split).

    The 7-pt red-black color of a split-class point is
    ``(x + py + pz) % 2`` — independent of the lanes — so each phase is
    a row-masked dense update of every class: 6 coupling terms on full
    (R, kp) windows, ZERO x-split/interleave machinery.  The masked
    formulation recomputes the inactive parity's update (2x the octant
    variant's flops), but the sweep is Mosaic-overhead-bound, not
    flop-bound: fewer, wider ops win (measured; see NOTES r5)."""
    kp = q_v.shape[2]
    Wl = out_m.shape[2]
    dtype = q_v.dtype

    def interior(a):
        return a[..., hl: hl + Wl] if hl else a

    @pl.when(i == 0)
    def _():
        c_so[...] = jnp.zeros(c_so.shape, dtype)
        c_so[Dir3.P] = jnp.ones((4, Pp, kp), dtype)
        c_b[...] = jnp.zeros((4, Pp, kp), dtype)
        c_q[...] = jnp.zeros((4, Pp, kp), dtype)
        c_qh[...] = jnp.zeros((4, T, kp), dtype)
        if emit == "res":
            c_rh[...] = jnp.zeros((4, T, kp), dtype)

    so = jnp.concatenate([c_so[...], so_v], axis=2)
    b = jnp.concatenate([c_b[...], b_v], axis=1)
    q = jnp.concatenate([c_q[...], q_v], axis=1)
    R = Pp + T
    G0 = i * T - Pp

    gx = G0 + jax.lax.broadcasted_iota(jnp.int32, (R, kp), 0)
    zero = jnp.zeros((), dtype)
    himask = gx < (nxp - 1)

    # loop-invariant coupling fields per class c = 2*py + pz
    PW, PS, B, PC = so[Dir3.PW], so[Dir3.PS], so[Dir3.B], so[Dir3.P]
    cW, cE, cS, cN, cB, cT = {}, {}, {}, {}, {}, {}
    for py in (0, 1):
        for pz in (0, 1):
            c = 2 * py + pz
            cW[c] = PW[c]
            cE[c] = jnp.where(himask, _shiftc(PW[c], 1, 0), zero)
            cS[c] = PS[c]                       # -> class c^2
            cN[c] = _shiftc(PS[c ^ 2], 0, nz2 if py == 1 else 0)
            cB[c] = B[c]                        # -> class c^1
            cT[c] = _shiftc(B[c ^ 1], 0, 1 if pz == 1 else 0)
    rec = {c: 1.0 / PC[c] for c in range(4)}

    def offdiag(c, q):
        py, pz = c // 2, c % 2
        acc = cW[c] * _roll(q[c], -1, 0)
        acc = acc + cE[c] * _roll(q[c], 1, 0)
        acc = acc + cS[c] * _roll(q[c ^ 2], 0, -nz2 if py == 0 else 0)
        acc = acc + cN[c] * _roll(q[c ^ 2], 0, nz2 if py == 1 else 0)
        acc = acc + cB[c] * _roll(q[c ^ 1], 0, -1 if pz == 0 else 0)
        acc = acc + cT[c] * _roll(q[c ^ 1], 0, 1 if pz == 1 else 0)
        return acc

    order = (0, 1) if updown == "up" else (1, 0)
    qs = [q[c] for c in range(4)]

    if interp_refs is not None:
        # stage 0: q[mid rows] += P cx + res/diag BEFORE any phase — the
        # wavefront applies it exactly once per row (mid rows only; the
        # carried rows were interpolated when they were mid).  Math =
        # pallas3_split._interp_kernel3 with the octant x-parity
        # realized as a row interleave.  At the clamped final step the
        # re-interp hits only never-emitted junk rows.
        cxw, ww, rw = interp_refs
        T2 = T // 2

        def csamp(a, sx, dl):
            rows = a[sx: sx + T2]
            if dl:
                rows = _roll(rows, 0, dl)
            return rows

        for c in range(4):
            py, pz = c // 2, c % 2
            corr = [None, None]
            for px in (0, 1):
                o = (px, py, pz)
                if o == (0, 0, 0):
                    corr[0] = csamp(cxw, 0, 0)
                    continue
                rc = rw[c].reshape(T2, 2, kp)[:, px]
                dgp = PC[c][Pp: Pp + T].reshape(T2, 2, kp)[:, px]
                acc = rc / dgp
                for nn, off in enumerate(_OFFSETS26_S):
                    if (off[0] % 2, off[1] % 2, off[2] % 2) != o:
                        continue
                    sx = (px - off[0]) // 2
                    dl = (((py - off[1]) // 2) * nz2
                          + (pz - off[2]) // 2)
                    acc = acc + csamp(ww[nn], sx, dl) * csamp(cxw, sx, dl)
                corr[px] = acc
            add = jnp.stack(corr, axis=1).reshape(T, kp)
            qs[c] = jnp.concatenate([qs[c][:Pp], qs[c][Pp:] + add],
                                    axis=0)

    for s, col in enumerate(order, start=1):
        lo, hi = i * T - s, i * T + T - s
        upds = {}
        for c in range(4):
            upds[c] = (b[c] + offdiag(c, qs)) * rec[c]
        for c in range(4):
            py, pz = c // 2, c % 2
            mask = (_stage_mask(gx, lo, hi)
                    & (((gx + py + pz) % 2) == col))
            qs[c] = jnp.where(mask, upds[c], qs[c])

    full = jnp.stack(qs)                       # (4, R, kp)
    out_m[...] = interior(jnp.concatenate(
        [c_qh[...][:, : T - S], full[:, Pp - S: Pp]], axis=1
    ))
    new_qh = full[:, Pp: Pp + (T - S)]
    pad_h = jnp.zeros((4, S, kp), dtype)

    if emit in ("res", "norm"):
        last = order[-1]
        rs = []
        for c in range(4):
            py, pz = c // 2, c % 2
            r = b[c] + offdiag(c, qs) - PC[c] * qs[c]
            # last-color rows: exact zeros (equation just solved)
            r = jnp.where(((gx + py + pz) % 2) == last, zero, r)
            rs.append(r)
        resw = jnp.stack(rs)
        if emit == "norm":
            wrow = jax.lax.broadcasted_iota(jnp.int32, (4, R, kp), 1)
            g = G0 + wrow
            valid = ((g >= i * T - S) & (g < i * T + T - S)
                     & (g >= 0) & (g < nxp))
            r2 = jnp.where(valid, resw, 0.0)
            r2 = r2 * r2
            s4 = r2[0] + r2[1] + r2[2] + r2[3]
            acc = s4[0:1]
            for r in range(1, R):
                acc = acc + s4[r: r + 1]
            res_m[...] = interior(jnp.concatenate(
                [acc, jnp.zeros((7, kp), dtype)], axis=0
            ))
        else:
            res_m[...] = interior(jnp.concatenate(
                [c_rh[...][:, : T - S], resw[:, Pp - S: Pp]], axis=1
            ))
            c_rh[...] = jnp.concatenate(
                [resw[:, Pp: Pp + (T - S)], pad_h], axis=1
            )

    c_qh[...] = jnp.concatenate([new_qh, pad_h], axis=1)
    c_so[...] = so[:, :, T: T + Pp]
    c_b[...] = b[:, T: T + Pp]
    c_q[...] = full[:, T: T + Pp]


def _stream_body(
    i, so_v, b_v, q_v,
    out_m, res_m,
    c_so, c_b, c_q, c_qh, c_rh,
    *, kind, updown, T, Pp, S, P, nxp, nz2, emit, hl, interp_refs=None,
):
    if kind == StencilKind.seven_pt:
        return _stream_body_7cls(
            i, so_v, b_v, q_v, out_m, res_m, c_so, c_b, c_q, c_qh, c_rh,
            updown=updown, T=T, Pp=Pp, S=S, P=P, nxp=nxp, nz2=nz2,
            emit=emit, hl=hl, interp_refs=interp_refs,
        )
    assert interp_refs is None, "fused interp: 7-pt class body only"
    ndir = so_v.shape[0]
    kp = q_v.shape[2]          # window lane width (incl. panel halos)
    Wl = out_m.shape[2]        # interior lane width written out

    dtype = q_v.dtype
    kp_ = kp

    def interior(a):
        return a[..., hl: hl + Wl] if hl else a

    @pl.when(i == 0)
    def _():
        # pre-grid rows: zero state with UNIT diagonal (finite, inert —
        # every read of them is annihilated by a stored-zero coupling)
        c_so[...] = jnp.zeros(c_so.shape, dtype)
        c_so[Dir3.P] = jnp.ones((4, Pp, kp_), dtype)
        c_b[...] = jnp.zeros((4, Pp, kp_), dtype)
        c_q[...] = jnp.zeros((4, Pp, kp_), dtype)
        c_qh[...] = jnp.zeros((4, T, kp_), dtype)
        if emit == "res":
            c_rh[...] = jnp.zeros((4, T, kp_), dtype)

    so = jnp.concatenate([c_so[...], so_v], axis=2)
    b = jnp.concatenate([c_b[...], b_v], axis=1)
    q = jnp.concatenate([c_q[...], q_v], axis=1)
    R = Pp + T
    R2 = R // 2
    G0 = i * T - Pp            # global row of window row 0 (even)

    so_oct = [_OctantField(so[d]) for d in range(ndir)]
    b_oct = _OctantField(b)
    q_oct = _OctantField(q)

    ir = jax.lax.broadcasted_iota(jnp.int32, (R2, kp), 0)
    gx = [G0 + 2 * ir + px for px in (0, 1)]
    hix = [g < (nxp - 1) for g in gx]
    zero = jnp.zeros((), dtype)
    table = _table_for(kind)
    offdiag = _mk_offdiag(so_oct, table, nz2, hix, zero)
    diag = so_oct[Dir3.P]
    rec = {o: 1.0 / diag[o] for o in _OCTS}

    # -- skewed color phases: stage s touches rows [iT - s, iT + T - s) --
    phases = _phase_octants(kind, updown)
    for s, octs in enumerate(phases, start=1):
        lo, hi = i * T - s, i * T + T - s
        upds = {o: (b_oct[o] + offdiag(o, q_oct)) * rec[o] for o in octs}
        for o in octs:
            q_oct[o] = jnp.where(_stage_mask(gx[o[0]], lo, hi), upds[o],
                                 q_oct[o])

    # -- emit q block i-1: head saved last step + rows [iT - S, iT) -----
    full = q_oct.interleave(0, R)              # (4, R, kp)
    # window w in [Pp - S, Pp) and head rows [0, T - S) of the PREVIOUS
    # step's save; new head = w in [Pp, Pp + T - S)
    out_m[...] = interior(jnp.concatenate(
        [c_qh[...][:, : T - S], full[:, Pp - S: Pp]], axis=1
    ))
    new_qh = full[:, Pp: Pp + (T - S)]
    pad_h = jnp.zeros((4, S, kp), dtype)

    if emit in ("res", "norm"):
        # residual stage (lag P + 1): fresh rows [iT - S, iT + T - S).
        # Octants of the LAST phase have res = 0 by construction (their
        # equation was just solved and no neighbor updates after) — skip
        # their offdiag gather entirely (7-pt: half the residual
        # compute; what the recompute would produce is only the
        # diag*(q*recip) rounding junk, ~eps, below the f32 floor)
        last = set(map(tuple, phases[-1]))
        zero_pc = jnp.zeros((R2, kp), dtype)
        res_o = {}
        for o in _OCTS:
            if o in last:
                res_o[o] = zero_pc
                continue
            r = b_oct[o] + offdiag(o, q_oct) - diag[o] * q_oct[o]
            res_o[o] = r
        rf = _OctantField.__new__(_OctantField)
        rf.p = res_o
        resw = rf.interleave(0, R)
        if emit == "norm":
            # fresh-row partials, masked to real rows (each row counted
            # exactly once across steps; clamp-junk tail rows excluded)
            wrow = jax.lax.broadcasted_iota(jnp.int32, (4, R, kp), 1)
            g = G0 + wrow
            valid = ((g >= i * T - S) & (g < i * T + T - S)
                     & (g >= 0) & (g < nxp))
            r2 = jnp.where(valid, resw, 0.0)
            r2 = r2 * r2
            # row-slice accumulation keeps every intermediate rank-2
            # (a rank-1 vector.multi_reduction crashes Mosaic at wide kp)
            s4 = r2[0] + r2[1] + r2[2] + r2[3]
            acc = s4[0:1]
            for r in range(1, R):
                acc = acc + s4[r: r + 1]
            # panel halo lanes are excluded by the interior slice (their
            # junk never reaches the emitted partials)
            res_m[...] = interior(jnp.concatenate(
                [acc, jnp.zeros((7, kp), dtype)], axis=0
            ))
        else:
            res_m[...] = interior(jnp.concatenate(
                [c_rh[...][:, : T - S], resw[:, Pp - S: Pp]], axis=1
            ))
            c_rh[...] = jnp.concatenate(
                [resw[:, Pp: Pp + (T - S)], pad_h], axis=1
            )

    # -- save carries for step i + 1 ------------------------------------
    c_qh[...] = jnp.concatenate([new_qh, pad_h], axis=1)
    c_so[...] = so[:, :, T: T + Pp]
    c_b[...] = b[:, T: T + Pp]
    c_q[...] = full[:, T: T + Pp]


@functools.partial(
    jax.jit,
    static_argnames=("kind", "updown", "nz2", "T", "emit", "W", "h"),
)
def _stream_call3(so4, q4, b4, kind, updown, nz2, T, emit, W=None, h=0):
    _, nxp, kp = q4.shape
    ndir = so4.shape[0]
    P, S, Pp = _params(kind, emit)
    assert nxp % T == 0 and T >= S
    nb = nxp // T
    ny2 = kp // nz2
    if W is None:
        W = ny2
    paneled = h > 0
    Wl, hl = W * nz2, h * nz2
    kpw = Wl + 2 * hl if paneled else kp
    kb = ny2 // W
    uh = W // h if paneled else 0     # halo blocks per panel width

    # carries use the window width; the residual-head carry exists only
    # on the emit="res" path (dropping it for "norm" is what fits the
    # 27-pt fused-norm pass under the scoped-vmem limit)
    scratch = [
        pltpu.VMEM((ndir, 4, Pp, kpw), q4.dtype),
        pltpu.VMEM((4, Pp, kpw), q4.dtype),
        pltpu.VMEM((4, Pp, kpw), q4.dtype),
        pltpu.VMEM((4, T, kpw), q4.dtype),
    ]
    if emit == "res":
        scratch.append(pltpu.VMEM((4, T, kpw), q4.dtype))

    if not paneled:
        kernel = functools.partial(
            _stream_kernel3, kind=kind, updown=updown, T=T, Pp=Pp, S=S,
            P=P, nxp=nxp, nz2=nz2, emit=emit,
        )

        def mid4(i):
            return (0, 0, jnp.minimum(i, nb - 1), 0)

        def mid(i):
            return (0, jnp.minimum(i, nb - 1), 0)

        def prev(i):
            return (0, jnp.maximum(i - 1, 0), 0)

        if emit == "norm":
            res_shape = (8 * (nb + 1), kp)
            res_spec = pl.BlockSpec((8, kp), lambda i: (i, 0))
        elif emit == "res":
            res_shape = (4, nxp, kp)
            res_spec = pl.BlockSpec((4, T, kp), prev)
        else:
            res_shape = (4, 8, 128)
            res_spec = pl.BlockSpec((4, 8, 128), lambda i: (0, 0, 0))

        grid = (nb + 1,)
        in_specs = [
            pl.BlockSpec((ndir, 4, T, kp), mid4),
            pl.BlockSpec((4, T, kp), mid),
            pl.BlockSpec((4, T, kp), mid),
        ]
        out_specs = [pl.BlockSpec((4, T, kp), prev), res_spec]
        operands = (so4, b4, q4)
    else:
        kernel = functools.partial(
            _stream_kernel3_panel, kind=kind, updown=updown, T=T, Pp=Pp,
            S=S, P=P, nxp=nxp, nz2=nz2, emit=emit, hl=hl,
        )

        def xm(i):
            return jnp.minimum(i, nb - 1)

        # lane-block indices in units of the block's own width; edge
        # panels WRAP to the opposite side — the full-width kernel's
        # lane rolls wrap too, and their correctness relies on the
        # wrapped-in value being the opposite boundary's stored-zero
        # coupling (an up-direction coefficient is read SHIFTED, so the
        # zero that annihilates the exterior neighbor arrives via the
        # wrap); the window must reproduce exactly that
        nblk = ny2 // h

        def lh(j):
            return (j * uh - 1) % nblk

        def rh(j):
            return ((j + 1) * uh) % nblk

        def mid4(j, i):
            return (0, 0, xm(i), j)

        def mid(j, i):
            return (0, xm(i), j)

        def prev(j, i):
            return (0, jnp.maximum(i - 1, 0), j)

        if emit == "norm":
            res_shape = (8 * (nb + 1), kp)
            res_spec = pl.BlockSpec((8, Wl), lambda j, i: (i, j))
        elif emit == "res":
            res_shape = (4, nxp, kp)
            res_spec = pl.BlockSpec((4, T, Wl), prev)
        else:
            res_shape = (4, 8, 128)
            res_spec = pl.BlockSpec((4, 8, 128), lambda j, i: (0, 0, 0))

        grid = (kb, nb + 1)
        in_specs = [
            pl.BlockSpec((ndir, 4, T, hl), lambda j, i: (0, 0, xm(i),
                                                         lh(j))),
            pl.BlockSpec((ndir, 4, T, Wl), mid4),
            pl.BlockSpec((ndir, 4, T, hl), lambda j, i: (0, 0, xm(i),
                                                         rh(j))),
            pl.BlockSpec((4, T, hl), lambda j, i: (0, xm(i), lh(j))),
            pl.BlockSpec((4, T, Wl), mid),
            pl.BlockSpec((4, T, hl), lambda j, i: (0, xm(i), rh(j))),
            pl.BlockSpec((4, T, hl), lambda j, i: (0, xm(i), lh(j))),
            pl.BlockSpec((4, T, Wl), mid),
            pl.BlockSpec((4, T, hl), lambda j, i: (0, xm(i), rh(j))),
        ]
        out_specs = [pl.BlockSpec((4, T, Wl), prev), res_spec]
        operands = (so4, so4, so4, b4, b4, b4, q4, q4, q4)

    q_out, res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((4, nxp, kp), q4.dtype),
            jax.ShapeDtypeStruct(res_shape, q4.dtype),
        ],
        scratch_shapes=scratch,
        # 124M: the 27-pt fused-norm pass composed with the pointwise
        # interp kernel allocates 120.57M scoped (the solo call fits
        # 119.4M under 120M; composition shifts the stack by ~0.6M) —
        # measured usable VMEM is ~126M (NOTES), so 124M keeps margin
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=124 * 1024 * 1024,
        ),
        interpret=INTERPRET,
    )(*operands)
    if emit in ("norm", "res"):
        return q_out, res
    return q_out


@functools.partial(
    jax.jit,
    static_argnames=("kind", "updown", "nz2", "T", "emit", "W", "h"),
)
def _stream_interp_call3(so4, q4, b4, pw4, cxp, res4, kind, updown, nz2,
                         T, emit, W=None, h=0):
    """Stream sweep with fused stage-0 interpolation (7-pt class body).

    One kernel replaces pointwise-interp + post-sweep: q never round-
    trips HBM between them, and cx/w/res stream alongside the sweep
    operands."""
    _, nxp, kp = q4.shape
    ndir = so4.shape[0]
    P, S, Pp = _params(kind, emit)
    assert nxp % T == 0 and T >= S and (T // 2) % 8 == 0
    nb = nxp // T
    ny2 = kp // nz2
    if W is None:
        W = ny2
    paneled = h > 0
    Wl, hl = W * nz2, h * nz2
    kpw = Wl + 2 * hl if paneled else kp
    kb = ny2 // W
    uh = W // h if paneled else 0
    Tc = T // 2

    scratch = [
        pltpu.VMEM((ndir, 4, Pp, kpw), q4.dtype),
        pltpu.VMEM((4, Pp, kpw), q4.dtype),
        pltpu.VMEM((4, Pp, kpw), q4.dtype),
        pltpu.VMEM((4, T, kpw), q4.dtype),
    ]
    if emit == "res":
        scratch.append(pltpu.VMEM((4, T, kpw), q4.dtype))

    if not paneled:
        kernel = functools.partial(
            _stream_kernel3_interp, kind=kind, updown=updown, T=T,
            Pp=Pp, S=S, P=P, nxp=nxp, nz2=nz2, emit=emit,
        )

        def mid4(i):
            return (0, 0, jnp.minimum(i, nb - 1), 0)

        def mid(i):
            return (0, jnp.minimum(i, nb - 1), 0)

        def prev(i):
            return (0, jnp.maximum(i - 1, 0), 0)

        def cm(i):
            return (jnp.minimum(i, nb - 1), 0)

        def cb_(i):
            return ((jnp.minimum(i, nb - 1) + 1) * (Tc // 8), 0)

        def wm_(i):
            return (0, jnp.minimum(i, nb - 1), 0)

        def wb_(i):
            return (0, (jnp.minimum(i, nb - 1) + 1) * (Tc // 8), 0)

        if emit == "norm":
            res_shape = (8 * (nb + 1), kp)
            res_spec = pl.BlockSpec((8, kp), lambda i: (i, 0))
        elif emit == "res":
            res_shape = (4, nxp, kp)
            res_spec = pl.BlockSpec((4, T, kp), prev)
        else:
            res_shape = (4, 8, 128)
            res_spec = pl.BlockSpec((4, 8, 128), lambda i: (0, 0, 0))

        grid = (nb + 1,)
        in_specs = [
            pl.BlockSpec((ndir, 4, T, kp), mid4),
            pl.BlockSpec((4, T, kp), mid),
            pl.BlockSpec((4, T, kp), mid),
            pl.BlockSpec((Tc, kp), cm),
            pl.BlockSpec((8, kp), cb_),
            pl.BlockSpec((26, Tc, kp), wm_),
            pl.BlockSpec((26, 8, kp), wb_),
            pl.BlockSpec((4, T, kp), mid),
        ]
        out_specs = [pl.BlockSpec((4, T, kp), prev), res_spec]
        operands = (so4, b4, q4, cxp, cxp, pw4, pw4, res4)
    else:
        kernel = functools.partial(
            _stream_kernel3_panel_interp, kind=kind, updown=updown, T=T,
            Pp=Pp, S=S, P=P, nxp=nxp, nz2=nz2, emit=emit, hl=hl,
        )

        def xm(i):
            return jnp.minimum(i, nb - 1)

        nblk = ny2 // h

        def lh(j):
            return (j * uh - 1) % nblk

        def rh(j):
            return ((j + 1) * uh) % nblk

        def mid4(j, i):
            return (0, 0, xm(i), j)

        def mid(j, i):
            return (0, xm(i), j)

        def prev(j, i):
            return (0, jnp.maximum(i - 1, 0), j)

        if emit == "norm":
            res_shape = (8 * (nb + 1), kp)
            res_spec = pl.BlockSpec((8, Wl), lambda j, i: (i, j))
        elif emit == "res":
            res_shape = (4, nxp, kp)
            res_spec = pl.BlockSpec((4, T, Wl), prev)
        else:
            res_shape = (4, 8, 128)
            res_spec = pl.BlockSpec((4, 8, 128), lambda j, i: (0, 0, 0))

        def tri2(row_u, rf):
            return [
                pl.BlockSpec((row_u, hl), lambda j, i: (rf(i), lh(j))),
                pl.BlockSpec((row_u, Wl), lambda j, i: (rf(i), j)),
                pl.BlockSpec((row_u, hl), lambda j, i: (rf(i), rh(j))),
            ]

        def tri3w(row_u, rf):
            return [
                pl.BlockSpec((26, row_u, hl),
                             lambda j, i: (0, rf(i), lh(j))),
                pl.BlockSpec((26, row_u, Wl), lambda j, i: (0, rf(i), j)),
                pl.BlockSpec((26, row_u, hl),
                             lambda j, i: (0, rf(i), rh(j))),
            ]

        def cmr(i):
            return xm(i)

        def cbr(i):
            return (xm(i) + 1) * (Tc // 8)

        grid = (kb, nb + 1)
        in_specs = (
            [
                pl.BlockSpec((ndir, 4, T, hl),
                             lambda j, i: (0, 0, xm(i), lh(j))),
                pl.BlockSpec((ndir, 4, T, Wl), mid4),
                pl.BlockSpec((ndir, 4, T, hl),
                             lambda j, i: (0, 0, xm(i), rh(j))),
                pl.BlockSpec((4, T, hl), lambda j, i: (0, xm(i), lh(j))),
                pl.BlockSpec((4, T, Wl), mid),
                pl.BlockSpec((4, T, hl), lambda j, i: (0, xm(i), rh(j))),
                pl.BlockSpec((4, T, hl), lambda j, i: (0, xm(i), lh(j))),
                pl.BlockSpec((4, T, Wl), mid),
                pl.BlockSpec((4, T, hl), lambda j, i: (0, xm(i), rh(j))),
            ]
            + tri2(Tc, cmr) + tri2(8, cbr) + tri3w(Tc, cmr) + tri3w(8, cbr)
            + [
                pl.BlockSpec((4, T, hl), lambda j, i: (0, xm(i), lh(j))),
                pl.BlockSpec((4, T, Wl), mid),
                pl.BlockSpec((4, T, hl), lambda j, i: (0, xm(i), rh(j))),
            ]
        )
        out_specs = [pl.BlockSpec((4, T, Wl), prev), res_spec]
        operands = (so4, so4, so4, b4, b4, b4, q4, q4, q4,
                    cxp, cxp, cxp, cxp, cxp, cxp,
                    pw4, pw4, pw4, pw4, pw4, pw4,
                    res4, res4, res4)

    q_out, res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((4, nxp, kp), q4.dtype),
            jax.ShapeDtypeStruct(res_shape, q4.dtype),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=124 * 1024 * 1024,
        ),
        interpret=INTERPRET,
    )(*operands)
    if emit in ("norm", "res"):
        return q_out, res
    return q_out


def point_relax_stream3(so4, q4, b4, kind, updown, fuse_residual=False,
                        fuse_norm=False, nz2=None):
    """One full multicolor sweep, single HBM pass (wavefront carry).

    Drop-in for pallas3_split.point_relax_split3 on stream-supported
    shapes; ULP-level agreement with the XLA sweep."""
    assert nz2 is not None
    _, nxp, kp = q4.shape
    emit = "norm" if fuse_norm else ("res" if fuse_residual else "none")
    T, W, h = _plan_stream(kind, nxp, kp // nz2, nz2)
    return _stream_call3(so4, q4, b4, kind, updown, nz2, T, emit,
                         W=W, h=h)


def sweep_restrict_stream3(so4, q4, b4, pw4, kind, updown, nc, nz2=None):
    """Streaming pre-sweep (residual emitted in the same pass) + the
    standalone split-layout restriction.  Returns (q4, res4, cb)."""
    from cedar_tpu.ops.pallas3_split import _restrict_call3, _restrict_plan

    assert nz2 is not None
    _, nxp, kp = q4.shape
    q4, res = point_relax_stream3(so4, q4, b4, kind, updown,
                                  fuse_residual=True, nz2=nz2)
    rplan = _restrict_plan(nxp, kp, nz2)
    assert rplan is not None, "caller must gate on _restrict_plan"
    cbf = _restrict_call3(pw4, res, nz2, rplan)
    nxc, nyc, nzc = nc
    ny2 = kp // nz2
    cb = cbf[:nxc].reshape(-1, ny2, nz2)[:, :nyc, :nzc]
    return q4, res, cb


def interp_sweep_stream3(pw4, cx, so4, b4, q4_presmoothed, kind, updown,
                         res4, fuse_norm=False, nz2=None):
    """Interpolation + streaming post-sweep (+ fused convergence norm).

    7-pt: ONE kernel — the interpolation runs as wavefront stage 0
    inside the sweep (q never round-trips HBM between them); other
    stencils take the pointwise-interp kernel then the stream sweep."""
    assert nz2 is not None and res4 is not None
    q4 = q4_presmoothed
    _, nxp, kp = q4.shape
    ny2 = kp // nz2
    rows = nxp // 2 + 2 * 16
    nxc, nyc, nzc = cx.shape
    cxp = jnp.pad(cx, ((0, rows - nxc), (0, ny2 - nyc), (0, nz2 - nzc)))
    cxp = cxp.reshape(rows, kp)
    emit = "norm" if fuse_norm else "none"

    if kind == StencilKind.seven_pt:
        plan = _plan_stream(kind, nxp, ny2, nz2, interp=True)
        if plan is not None:
            T, W, h = plan
            return _stream_interp_call3(so4, q4, b4, pw4, cxp, res4,
                                        kind, updown, nz2, T, emit,
                                        W=W, h=h)

    from cedar_tpu.ops.pallas3_split import _interp_call3, _interp_plan

    iplan = _interp_plan(nxp, kp, nz2)
    assert iplan is not None, "caller must gate on _interp_plan"
    q4 = _interp_call3(pw4, cxp, so4[Dir3.P], res4, q4, nz2, iplan)
    return point_relax_stream3(so4, q4, b4, kind, updown,
                               fuse_norm=fuse_norm, nz2=nz2)

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
    _OctantField,
    _mk_offdiag,
    _phase_octants,
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


def stream_supported(shape_split, kind) -> bool:
    _, nxp, kp = shape_split
    P, S, Pp = _params(kind, "res")
    T = _pick_t(kind, kp, nxp)
    return T is not None and T >= S and nxp % T == 0


def _pick_t(kind, kp, nxp):
    nd = 4 if kind == StencilKind.seven_pt else 14
    # light model: mid streams (2x double-buffered) + carries + window
    # temps; calibrated on v5e (27-pt T=16 at kp=4096 compiles)
    for T in (32, 16):
        if nxp % T:
            continue
        P, S, Pp = _params(kind, "res")
        R = T + Pp
        rows = 2 * (nd + 2) * 4 * T          # mid stream buffers
        rows += (nd + 2) * 4 * Pp            # carries
        rows += 2 * 4 * T * 4                # out/res + heads
        rows += (nd + 2) * 4 * R             # window concats
        rows += 10 * 8 * (R // 2)            # octant pieces
        ncpl = 6 if nd == 4 else 26
        rows += (ncpl * 8 // 3) * (R // 2)   # shifted coupling copies
        if rows * kp * 4 <= 100 * 1024 * 1024:
            return T
    return None


def _stage_mask(G, lo, hi):
    return (G >= lo) & (G < hi)


def _stream_kernel3(
    so_m, b_m, q_m,
    out_m, res_m,
    c_so, c_b, c_q, c_qh, c_rh,
    *, kind, updown, T, Pp, S, P, nxp, nz2, emit,
):
    i = pl.program_id(0)
    ndir = so_m.shape[0]
    kp = q_m.shape[2]

    dtype = q_m.dtype
    kp_ = q_m.shape[2]

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

    so = jnp.concatenate([c_so[...], so_m[...]], axis=2)
    b = jnp.concatenate([c_b[...], b_m[...]], axis=1)
    q = jnp.concatenate([c_q[...], q_m[...]], axis=1)
    R = Pp + T
    R2 = R // 2
    G0 = i * T - Pp            # global row of window row 0 (even)

    so_oct = [_OctantField(so[d]) for d in range(ndir)]
    b_oct = _OctantField(b)
    q_oct = _OctantField(q)

    ir = jax.lax.broadcasted_iota(jnp.int32, (R2, kp), 0)
    gx = [G0 + 2 * ir + px for px in (0, 1)]
    hix = [g < (nxp - 1) for g in gx]
    zero = jnp.zeros((), q_m.dtype)
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
    out_m[...] = jnp.concatenate(
        [c_qh[...][:, : T - S], full[:, Pp - S: Pp]], axis=1
    )
    new_qh = full[:, Pp: Pp + (T - S)]
    pad_h = jnp.zeros((4, S, kp), q_m.dtype)

    if emit in ("res", "norm"):
        # residual stage (lag P + 1): fresh rows [iT - S, iT + T - S)
        res_o = {}
        for o in _OCTS:
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
            res_m[...] = jnp.concatenate(
                [acc, jnp.zeros((7, kp), q_m.dtype)], axis=0
            )
        else:
            res_m[...] = jnp.concatenate(
                [c_rh[...][:, : T - S], resw[:, Pp - S: Pp]], axis=1
            )
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
    static_argnames=("kind", "updown", "nz2", "T", "emit"),
)
def _stream_call3(so4, q4, b4, kind, updown, nz2, T, emit):
    _, nxp, kp = q4.shape
    ndir = so4.shape[0]
    P, S, Pp = _params(kind, emit)
    assert nxp % T == 0 and T >= S
    nb = nxp // T

    kernel = functools.partial(
        _stream_kernel3, kind=kind, updown=updown, T=T, Pp=Pp, S=S, P=P,
        nxp=nxp, nz2=nz2, emit=emit,
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

    q_out, res = pl.pallas_call(
        kernel,
        grid=(nb + 1,),
        in_specs=[
            pl.BlockSpec((ndir, 4, T, kp), mid4),
            pl.BlockSpec((4, T, kp), mid),
            pl.BlockSpec((4, T, kp), mid),
        ],
        out_specs=[
            pl.BlockSpec((4, T, kp), prev),
            res_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, nxp, kp), q4.dtype),
            jax.ShapeDtypeStruct(res_shape, q4.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((ndir, 4, Pp, kp), q4.dtype),
            pltpu.VMEM((4, Pp, kp), q4.dtype),
            pltpu.VMEM((4, Pp, kp), q4.dtype),
            pltpu.VMEM((4, T, kp), q4.dtype),
            pltpu.VMEM((4, T, kp), q4.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=INTERPRET,
    )(so4, b4, q4)
    if emit == "norm":
        # junk partials from the warm-up write of block 0 are overwritten
        # (same block index twice); all blocks are real sums
        return q_out, res
    if emit == "res":
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
    T = _pick_t(kind, kp, nxp)
    return _stream_call3(so4, q4, b4, kind, updown, nz2, T, emit)


def sweep_restrict_stream3(so4, q4, b4, pw4, kind, updown, nc, nz2=None):
    """Streaming pre-sweep (residual emitted in the same pass) + the
    standalone split-layout restriction.  Returns (q4, res4, cb)."""
    from cedar_tpu.ops.pallas3_split import _restrict_call3

    assert nz2 is not None
    _, nxp, kp = q4.shape
    q4, res = point_relax_stream3(so4, q4, b4, kind, updown,
                                  fuse_residual=True, nz2=nz2)
    T = next(t for t in (64, 32, 16) if nxp % t == 0)
    cbf = _restrict_call3(pw4, res, nz2, T)
    nxc, nyc, nzc = nc
    ny2 = kp // nz2
    cb = cbf[:nxc].reshape(-1, ny2, nz2)[:, :nyc, :nzc]
    return q4, res, cb


def interp_sweep_stream3(pw4, cx, so4, b4, q4_presmoothed, kind, updown,
                         res4, fuse_norm=False, nz2=None):
    """Pointwise interpolation (from the emitted residual) + streaming
    post-sweep (+ fused convergence norm)."""
    from cedar_tpu.ops.pallas3_split import _interp_call3

    assert nz2 is not None and res4 is not None
    q4 = q4_presmoothed
    _, nxp, kp = q4.shape
    ny2 = kp // nz2
    rows = nxp // 2 + 2 * 16
    nxc, nyc, nzc = cx.shape
    cxp = jnp.pad(cx, ((0, rows - nxc), (0, ny2 - nyc), (0, nz2 - nzc)))
    cxp = cxp.reshape(rows, kp)
    T = next(t for t in (64, 32, 16) if nxp % t == 0)
    q4 = _interp_call3(pw4, cxp, so4[Dir3.P], res4, q4, nz2, T)
    return point_relax_stream3(so4, q4, b4, kind, updown,
                               fuse_norm=fuse_norm, nz2=nz2)

"""Fused batched line-xy smooth for plane relaxation (Pallas TPU).

Plane relaxation's embedded 2D cycles are op-count-bound: one V(2,1)
line-xy cycle on a 64-plane batch issues ~36 zebra line sweeps plus
transfers, each individually near its floor (~76 us) but summing to
~2.3 ms (tools/profile_planes.py).  Planes are INDEPENDENT, so a whole
(plane-batch-tile, nx, ny) block can run one complete line-xy smooth —
x-line zebra (both colors) then y-line zebra (both colors), or the
reverse on the UP pass — entirely in VMEM: one kernel call replaces
four sweep dispatches and all the rhs/parity traffic between them.

Solvers (factored on the fly, like ops/pallas_lines2):

* x lines (tridiagonal along SUBLANES): PCR to stride 16 then
  interleaved Thomas over contiguous 16-row slabs;
* y lines (tridiagonal along LANES): PCR to stride 128 then Thomas over
  contiguous 128-lane slabs — every lane slice stays 128-aligned, so no
  transposes and no pathological lane ops.

Boundary handling needs no masks: lane/sublane roll wrap-around always
multiplies a stored-zero boundary coupling (interior-only convention),
and pad lanes/rows are inert identity lines.

Reference semantics: one "line-xy" smooth of the embedded plane solver
(src/kernel_params.cc:72-78 default plane config; relax dispatch
multilevel.h:134-223) — drop-in for lx/ly pairs in cycle2._smooth on
supported batched shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cedar_tpu.core.types import Dir2, StencilKind

INTERPRET = False

_VMEM_BUDGET = 100 * 1024 * 1024
_HX = 16       # x-solve interleave stride (sublane slabs)
_HY = 128      # y-solve interleave stride (lane slabs)


def _tile_batch(nxp: int, nyp: int, ndir: int) -> int:
    """Planes per grid step under the VMEM budget (0: does not fit).

    per calibrated on v5e: tb=64 five_pt 128² planes allocated 103 MB
    scoped vmem (~25 plane-equivalents live: streams + the four solves'
    carries and unrolled PCR temps); keep margin.  +2 covers the
    optional fused-residual output stream."""
    planeb = nxp * nyp * 4
    per = 2 * (ndir + 3) + 24 + 2
    return min(_VMEM_BUDGET // (planeb * per), 256)


def supported(shape, dtype, kind, periodic=(False, False)) -> bool:
    """``shape``: one plane's (nx, ny)."""
    if kind not in (StencilKind.five_pt, StencilKind.nine_pt):
        return False
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        return False
    if periodic[0] or periodic[1]:
        return False
    nx, ny = shape
    if nx < 4 or ny < 4:
        return False
    nxp = -(-nx // _HX) * _HX
    nyp = -(-ny // _HY) * _HY
    ndir = 5 if kind == StencilKind.nine_pt else 3
    return _tile_batch(nxp, nyp, ndir) >= 1


def _shx(a, s, fill=0.0):
    """out[..., r, :] = a[..., r+s, :] with fill (sublane shift)."""
    if s == 0:
        return a
    f = jnp.full(a.shape[:-2] + (abs(s),) + a.shape[-1:], fill, a.dtype)
    if s > 0:
        return jnp.concatenate([a[..., s:, :], f], axis=-2)
    return jnp.concatenate([f, a[..., :s, :]], axis=-2)


def _shy(a, s, fill=0.0):
    """out[..., l] = a[..., l+s] with fill (lane roll + iota mask)."""
    if s == 0:
        return a
    n = a.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, a.ndim - 1)
    out = pltpu.roll(a, (-s) % n, a.ndim - 1)
    if s > 0:
        return jnp.where(lane >= n - s, fill, out)
    return jnp.where(lane < -s, fill, out)


def _ry(a, s):
    """Pure lane roll (wrap multiplies stored-zero couplings)."""
    return pltpu.roll(a, (-s) % a.shape[-1], a.ndim - 1)


def _solve_x(lo, dg, up, r, h=_HX):
    """Tridiagonal solve along axis -2 (rows already padded to h)."""
    n = r.shape[-2]
    hh = 1
    while hh < h:
        al = lo / _shx(dg, -hh, 1.0)
        be = up / _shx(dg, hh, 1.0)
        dg = dg - al * _shx(up, -hh) - be * _shx(lo, hh)
        r = r - al * _shx(r, -hh) - be * _shx(r, hh)
        lo = -al * _shx(lo, -hh)
        up = -be * _shx(up, hh)
        hh *= 2
    T = n // h
    dsl, zsl = [dg[..., :h, :]], [r[..., :h, :]]
    for t in range(1, T):
        s = slice(t * h, (t + 1) * h)
        sp = slice((t - 1) * h, t * h)
        l_t = lo[..., s, :] / dsl[-1]
        dsl.append(dg[..., s, :] - l_t * up[..., sp, :])
        zsl.append(r[..., s, :] - l_t * zsl[-1])
    x = [None] * T
    x[T - 1] = zsl[T - 1] / dsl[T - 1]
    for t in range(T - 2, -1, -1):
        x[t] = (zsl[t] - up[..., t * h:(t + 1) * h, :] * x[t + 1]) / dsl[t]
    return jnp.concatenate(x, axis=-2)


def _solve_y(lo, dg, up, r, h=_HY):
    """Tridiagonal solve along axis -1 (lanes already padded to h)."""
    n = r.shape[-1]
    hh = 1
    while hh < h:
        al = lo / _shy(dg, -hh, 1.0)
        be = up / _shy(dg, hh, 1.0)
        dg = dg - al * _shy(up, -hh) - be * _shy(lo, hh)
        r = r - al * _shy(r, -hh) - be * _shy(r, hh)
        lo = -al * _shy(lo, -hh)
        up = -be * _shy(up, hh)
        hh *= 2
    T = n // h
    dsl, zsl = [dg[..., :h]], [r[..., :h]]
    for t in range(1, T):
        s = slice(t * h, (t + 1) * h)
        sp = slice((t - 1) * h, t * h)
        l_t = lo[..., s] / dsl[-1]
        dsl.append(dg[..., s] - l_t * up[..., sp])
        zsl.append(r[..., s] - l_t * zsl[-1])
    x = [None] * T
    x[T - 1] = zsl[T - 1] / dsl[T - 1]
    for t in range(T - 2, -1, -1):
        x[t] = (zsl[t] - up[..., t * h:(t + 1) * h] * x[t + 1]) / dsl[t]
    return jnp.concatenate(x, axis=-1)


def _smooth_kernel(o_m, w_m, s_m, sw_m, nw_m, b_m, q_m, out_m, res_m,
                   *, kind, updown, nine, nsweeps, emit_res):
    o, w, s, b = o_m[...], w_m[...], s_m[...], b_m[...]
    q = q_m[...]
    if nine:
        sw, nw = sw_m[...], nw_m[...]
    ly_iota = jax.lax.broadcasted_iota(jnp.int32, q.shape, q.ndim - 1)

    def rhs_x(q):
        """b + couplings to neighboring x-lines (lines2._line_rhs_x)."""
        out = b + s * _ry(q, -1) + _ry(s, 1) * _ry(q, 1)
        if nine:
            out = (
                out
                + sw * _shx(_ry(q, -1), -1)
                + _shx(nw, 1) * _shx(_ry(q, -1), 1)
                + _ry(nw, 1) * _shx(_ry(q, 1), -1)
                + _shx(_ry(sw, 1), 1) * _shx(_ry(q, 1), 1)
            )
        return out

    def pass_x(q, parity):
        lo = -w
        up = _shx(lo, 1)
        sol = _solve_x(lo, o, up, rhs_x(q))
        return jnp.where((ly_iota % 2) == parity, sol, q)

    # NB: an x-parity-split pass_y (solve only the active row parity —
    # half the PCR work) was built and REVERTED: the split/merge
    # plumbing sent the Mosaic compile from tens of seconds to 519 s
    # for the single-sweep kernel (measured r5), unusable across the
    # embedded hierarchy's many shapes.  Masked full solves it is.
    lx_iota = jax.lax.broadcasted_iota(jnp.int32, q.shape, q.ndim - 2)

    def rhs_y(q):
        """b + couplings to neighboring y-lines (transposed formula)."""
        out = b + w * _shx(q, -1) + _shx(w, 1) * _shx(q, 1)
        if nine:
            out = (
                out
                + sw * _shx(_ry(q, -1), -1)
                + _ry(nw, 1) * _shx(_ry(q, 1), -1)
                + _shx(nw, 1) * _shx(_ry(q, -1), 1)
                + _shx(_ry(sw, 1), 1) * _shx(_ry(q, 1), 1)
            )
        return out

    def pass_y(q, parity):
        lo = -s
        up = _ry(lo, 1)
        # wrap of the pure roll puts S[...,0]=0 at the last lane: exact
        sol = _solve_y(lo, o, up, rhs_y(q))
        return jnp.where((lx_iota % 2) == parity, sol, q)

    order = (1, 0) if updown == "down" else (0, 1)
    for _ in range(nsweeps):
        if updown == "down":
            for p in order:
                q = pass_x(q, p)
            for p in order:
                q = pass_y(q, p)
        else:
            for p in order:
                q = pass_y(q, p)
            for p in order:
                q = pass_x(q, p)
    out_m[...] = q
    if emit_res:
        # full-stencil residual of the smoothed iterate in the same HBM
        # pass (rhs_x already carries every S/corner coupling; adding
        # the W-direction terms completes b + offdiag·q, cf.
        # stencil2.residual)
        res_m[...] = (rhs_x(q) + w * _shx(q, -1)
                      + _shx(w, 1) * _shx(q, 1) - o * q)


@functools.partial(jax.jit, static_argnames=("kind", "updown", "tb",
                                             "nsweeps", "emit_res"))
def _smooth_call(so, q, b, kind, updown, tb, nsweeps=1, emit_res=False):
    B, nxp, nyp = q.shape
    assert B % tb == 0
    nine = kind == StencilKind.nine_pt
    swm = so[:, Dir2.SW] if nine else so[:, Dir2.S]
    nwm = so[:, Dir2.NW] if nine else so[:, Dir2.S]

    spec = pl.BlockSpec((tb, nxp, nyp), lambda i: (i, 0, 0))
    if nine:
        corner_specs = [spec, spec]
    else:
        corner_specs = [pl.BlockSpec((1, 8, 128), lambda i: (0, 0, 0))] * 2
        z = jnp.zeros((1, 8, 128), q.dtype)
        swm = nwm = z

    kernel = functools.partial(_smooth_kernel, kind=kind, updown=updown,
                               nine=nine, nsweeps=nsweeps,
                               emit_res=emit_res)
    res_spec = (spec if emit_res
                else pl.BlockSpec((1, 8, 128), lambda i: (0, 0, 0)))
    res_shape = (B, nxp, nyp) if emit_res else (1, 8, 128)
    out, res = pl.pallas_call(
        kernel,
        grid=(B // tb,),
        in_specs=[spec, spec, spec] + corner_specs + [spec, spec],
        out_specs=[spec, res_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, nxp, nyp), q.dtype),
            jax.ShapeDtypeStruct(res_shape, q.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET,
        ),
        interpret=INTERPRET,
    )(so[:, Dir2.O], so[:, Dir2.W], so[:, Dir2.S], swm, nwm, b, q)
    if emit_res:
        return out, res
    return out


def line_xy_smooth_batched(so_b, q_b, b_b, kind, updown, nsweeps=1,
                           emit_res=False):
    """``nsweeps`` complete line-xy smooths (x zebra pair + y zebra pair,
    order by ``updown``) over a batch of independent planes, optionally
    emitting the final residual in the same HBM pass.

    so_b: (B, ndir, nx, ny); q_b/b_b: (B, nx, ny)."""
    B, nx, ny = q_b.shape
    nxp = -(-nx // _HX) * _HX
    nyp = -(-ny // _HY) * _HY
    sop, qp, bp = so_b, q_b, b_b
    if (nxp, nyp) != (nx, ny):
        pw = ((0, 0), (0, nxp - nx), (0, nyp - ny))
        sop = jnp.pad(so_b, ((0, 0), (0, 0)) + pw[1:])
        sop = sop.at[:, Dir2.O, nx:, :].set(1.0)
        sop = sop.at[:, Dir2.O, :, ny:].set(1.0)
        qp = jnp.pad(q_b, pw)
        bp = jnp.pad(b_b, pw)
    ndir = 5 if kind == StencilKind.nine_pt else 3
    tb = _tile_batch(nxp, nyp, ndir)
    assert tb >= 1, "callers must gate on supported()"
    tb = min(tb, B)
    while B % tb:
        tb -= 1
    out = _smooth_call(sop, qp, bp, kind, updown, tb, nsweeps, emit_res)
    if (nxp, nyp) == (nx, ny):
        return out
    if emit_res:
        return out[0][:, :nx, :ny], out[1][:, :nx, :ny]
    return out[:, :nx, :ny]


@functools.lru_cache(maxsize=None)
def _vmap_core(kind, updown):
    """custom_vmap entry: the vmapped plane cycles batch this smooth."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def core(so, q, b):
        # unbatched: the composed per-axis fused kernels measured faster
        # than a B=1 whole-grid smooth (5.16 vs 5.68 ms fe-9pt 2048²)
        from cedar_tpu.ops import pallas_lines2 as pla

        if updown == "down":
            q = pla.line_relax_x(so, q, b, kind, updown)
            return pla.line_relax_y(so, q, b, kind, updown)
        q = pla.line_relax_y(so, q, b, kind, updown)
        return pla.line_relax_x(so, q, b, kind, updown)

    @core.def_vmap
    def _rule(axis_size, in_batched, so, q, b):
        def bc(a, batched):
            return a if batched else jnp.broadcast_to(
                a, (axis_size,) + a.shape)

        out = line_xy_smooth_batched(
            bc(so, in_batched[0]), bc(q, in_batched[1]),
            bc(b, in_batched[2]), kind, updown)
        return out, True

    return core


def line_xy_smooth(so, q, b, kind, updown):
    """Batch-aware fused line-xy smooth (one plane, or the vmapped plane
    batch via :func:`_vmap_core`)."""
    return _vmap_core(kind, updown)(so, q, b)


@functools.lru_cache(maxsize=None)
def _vmap_nsmooth_res(kind, updown, nsweeps):
    """custom_vmap: ``nsweeps`` smooths + the final residual, one kernel
    per plane batch (the embedded plane cycle's whole pre-smoothing
    stage — replaces nsweeps smooth dispatches plus a separate residual
    op and its q round trip)."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def core(so, q, b):
        from cedar_tpu.ops import pallas_lines2 as pla
        from cedar_tpu.ops.stencil2 import residual

        for _ in range(nsweeps):
            if updown == "down":
                q = pla.line_relax_x(so, q, b, kind, updown)
                q = pla.line_relax_y(so, q, b, kind, updown)
            else:
                q = pla.line_relax_y(so, q, b, kind, updown)
                q = pla.line_relax_x(so, q, b, kind, updown)
        return q, residual(so, q, b, kind)

    @core.def_vmap
    def _rule(axis_size, in_batched, so, q, b):
        def bc(a, batched):
            return a if batched else jnp.broadcast_to(
                a, (axis_size,) + a.shape)

        so_b, q_b, b_b = (bc(so, in_batched[0]), bc(q, in_batched[1]),
                          bc(b, in_batched[2]))
        # chain single-sweep kernels rather than unrolling nsweeps
        # in-kernel: the doubled body sends Mosaic into pathological
        # compile times (measured: the 6-level embedded hierarchy's
        # compile blew a 30-minute budget; single-sweep bodies are fine)
        for _ in range(nsweeps - 1):
            q_b = line_xy_smooth_batched(so_b, q_b, b_b, kind, updown)
        out = line_xy_smooth_batched(so_b, q_b, b_b, kind, updown, 1,
                                     emit_res=True)
        return out, (True, True)

    return core


def line_xy_nsmooth_res(so, q, b, kind, updown, nsweeps):
    """``nsweeps`` line-xy smooths with the final residual fused into the
    same pass.  Returns ``(q, res)``."""
    return _vmap_nsmooth_res(kind, updown, nsweeps)(so, q, b)

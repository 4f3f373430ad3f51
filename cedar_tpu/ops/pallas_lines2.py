"""Fused Pallas zebra line-relaxation sweeps (2D, serial, lines along x).

The XLA formulation of one zebra color pass (ops.lines2) runs several
separate stages over HBM — rhs stencil eval, lane-parity extraction, the
tridiagonal solve (lax.scans whose factor stacks stream from HBM every
step and whose sequential steps each pay loop overhead), and the parity
write-back.  Measured at 2048^2 (tools/profile_lines.py): the fine-level
sweep alone is ~1 ms, and the V(1,1) line-x cycle 13 ms — dominated by
sequential scan-step latency repeated on every coarse level.

This kernel does a whole color pass in ONE pass over HBM:

* rhs = b + off-line couplings · q computed in VMEM from lane-halo
  streams (reference rhs: BMG2_SymStd_relax_lines_x.f90 interior loop),
* the tridiagonals of ALL lines are solved in VMEM — solving both
  parities and discarding the inactive one is free (the solve is compute
  on resident data) and removes every lane-parity layout op,
* q is written back with the active color merged under a parity mask
  anchored to GLOBAL lane indices (the reference anchors its MPI zebra
  colors to jGs parity the same way).

The in-VMEM solver is a PCR -> interleaved-Thomas hybrid, factored on
the fly from the operator (setup-free): k parallel-cyclic-reduction
steps decouple each line's tridiagonal into h = 2^k independent
interleaved systems, after which step t of ALL systems is the CONTIGUOUS
row slab [t*h, (t+1)*h) — Thomas elimination runs over npad/h slab steps
with static contiguous slices (no strided sublane access).  PCR on the
SPD/M-matrix line systems BoxMG produces is unconditionally stable.

Layout rules honored (NOTES.md): lane blocks and concatenations are
128-aligned; lane shifts are full-width rolls whose wrap lands in the
discarded halo; sublane shifts/reshapes are unrestricted.

Reference semantics: BMG2_SymStd_relax_lines_x.f90:72-172 (zebra order,
rhs, tridiagonal solve); drop-in for lines2.line_relax_x on supported
shapes (f32, non-periodic, serial).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cedar_tpu.core.types import Dir2, StencilKind

INTERPRET = False

_VMEM_BUDGET = 110 * 1024 * 1024
_HALO = 128          # lane-halo block width (one full lane tile)
_H_SOLVE = 16        # interleave stride after PCR (= 2^k)


def _tile_lanes(nx: int, ny: int, kind: StencilKind) -> int:
    """Lane-tile width Ty (a 128-multiple), preferring exact divisors."""
    ncoef = 5 if kind == StencilKind.nine_pt else 3
    colb = nx * 4
    cols = _VMEM_BUDGET // colb
    # double-buffered streams (coef/b/q/out mains + halos) + compute temps
    nstr = 2 * (ncoef + 4) + 14
    tymax = max(128, cols // nstr // 128 * 128)
    nyp = -(-ny // 128) * 128
    best = 128
    for ty in range(128, min(tymax, nyp) + 1, 128):
        exact = nyp % ty == 0
        bexact = nyp % best == 0
        if (exact, ty) > (bexact, best):
            best = ty
    return best


def supported(shape, dtype, kind, periodic=(False, False)) -> bool:
    if kind not in (StencilKind.five_pt, StencilKind.nine_pt):
        return False
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        return False
    if periodic[0] or periodic[1]:
        return False
    nx, ny = shape
    return nx >= 4 and ny >= 4


def _shift0(a, s, fill=0.0):
    """out[r] = a[r + s] with fill (sublane shift, any |s|)."""
    if s == 0:
        return a
    f = jnp.full((abs(s),) + a.shape[1:], fill, a.dtype)
    if s > 0:
        return jnp.concatenate([a[s:], f], axis=0)
    return jnp.concatenate([f, a[:s]], axis=0)


def _solve_all_lines(lo, dg, up, r, h_solve=_H_SOLVE):
    """Solve per-lane tridiagonals along axis 0 (batched over lanes).

    ``lo[i]`` couples row i to i-1, ``up[i]`` to i+1 (lo[0]=up[n-1]=0).
    Pure jnp: runs identically inside the kernel and under interpret.
    """
    n = r.shape[0]
    npad = -(-n // h_solve) * h_solve
    if npad != n:
        pad = npad - n

        def ext(a, fill):
            return jnp.concatenate(
                [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)], axis=0)

        lo, up, r = ext(lo, 0.0), ext(up, 0.0), ext(r, 0.0)
        dg = ext(dg, 1.0)

    h = 1
    while h < h_solve:
        al = lo / _shift0(dg, -h, 1.0)
        be = up / _shift0(dg, h, 1.0)
        dg = dg - al * _shift0(up, -h, 0.0) - be * _shift0(lo, h, 0.0)
        r = r - al * _shift0(r, -h, 0.0) - be * _shift0(r, h, 0.0)
        lo = -al * _shift0(lo, -h, 0.0)
        up = -be * _shift0(up, h, 0.0)
        h *= 2

    # interleaved Thomas: independent systems at stride h_solve; step t of
    # every system is the contiguous row slab [t*h, (t+1)*h)
    T = npad // h_solve
    dsl = [dg[:h_solve]]
    zsl = [r[:h_solve]]
    for t in range(1, T):
        s = slice(t * h_solve, (t + 1) * h_solve)
        l_t = lo[s] / dsl[-1]
        dsl.append(dg[s] - l_t * up[(t - 1) * h_solve:t * h_solve])
        zsl.append(r[s] - l_t * zsl[-1])
    x = [None] * T
    x[T - 1] = zsl[T - 1] / dsl[T - 1]
    for t in range(T - 2, -1, -1):
        s = slice(t * h_solve, (t + 1) * h_solve)
        x[t] = (zsl[t] - up[s] * x[t + 1]) / dsl[t]
    return jnp.concatenate(x, axis=0)[:n]


def _sweep_kernel(
    meta_ref,
    o_m, w_m, s_m, s_r, sw_m, sw_r, nw_m, nw_r,
    b_m, q_m, q_l, q_r,
    out_m,
    *, kind, Ty, nx, ny, h_solve, lny,
):
    F = Ty + 2 * _HALO
    j = pl.program_id(0)
    lane0 = j * Ty - _HALO     # global lane index of assembled lane 0

    q = jnp.concatenate([q_l[...], q_m[...], q_r[...]], axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (nx, F), 1) + lane0
    nmask = lane < (ny - 1)    # +1-lane couplings exist only there
    zero = jnp.zeros((), q.dtype)
    zhalo = jnp.zeros((nx, _HALO), q.dtype)

    def lroll(a, d):
        """out[l] = a[l + d] (wrap lands in the discarded halo)."""
        return pltpu.roll(a, (-d) % a.shape[1], 1)

    # rhs = b + couplings to neighboring lines (lines2._line_rhs_x)
    s_f = jnp.concatenate([zhalo, s_m[...], s_r[...]], axis=1)
    n_f = jnp.where(nmask, lroll(s_f, 1), zero)    # N(i,j) = S(i,j+1)
    rhs_f = s_f * lroll(q, -1) + n_f * lroll(q, 1)
    if kind == StencilKind.nine_pt:
        sw_f = jnp.concatenate([zhalo, sw_m[...], sw_r[...]], axis=1)
        nw_f = jnp.concatenate([zhalo, nw_m[...], nw_r[...]], axis=1)
        ne_f = jnp.where(nmask, lroll(sw_f, 1), zero)   # SW(i,j+1)
        se_f = jnp.where(nmask, lroll(nw_f, 1), zero)   # NW(i,j+1)
        rhs_f = (
            rhs_f
            + sw_f * _shift0(lroll(q, -1), -1)              # SW·q(i-1,j-1)
            + _shift0(nw_f, 1) * _shift0(lroll(q, -1), 1)   # NW(i+1,j)·q(i+1,j-1)
            + se_f * _shift0(lroll(q, 1), -1)               # NW(i,j+1)·q(i-1,j+1)
            + _shift0(ne_f, 1) * _shift0(lroll(q, 1), 1)    # SW(i+1,j+1)·q(i+1,j+1)
        )
    c0 = _HALO
    rhs = b_m[...] + rhs_f[:, c0:c0 + Ty]

    # tridiagonal coefficients for every line in the center block
    lo = -w_m[...]
    up = _shift0(lo, 1, 0.0)    # up[i] = -W[i+1]
    sol = _solve_all_lines(lo, o_m[...], up, rhs, h_solve)

    gl = jax.lax.broadcasted_iota(jnp.int32, (nx, Ty), 1) + j * Ty
    if lny != ny:
        # flattened plane batch: zebra parity is per-plane-local
        gl = gl - (gl // lny) * lny
    active = ((gl + meta_ref[0]) % 2) == meta_ref[1]
    out_m[...] = jnp.where(active, sol, q_m[...])


@functools.partial(
    jax.jit, static_argnames=("kind", "Ty", "h_solve", "lny"))
def _color_call(so, q, b, kind, parity, Ty, h_solve=_H_SOLVE, origin=None,
                lny=None):
    """``parity`` and ``origin`` are DYNAMIC (traced) so one Mosaic
    compile serves both zebra colors and any global anchoring; ``lny``
    is the per-plane lane period for flattened plane batches."""
    nx, nyp = q.shape
    assert nyp % Ty == 0 and Ty % _HALO == 0
    if origin is None:
        origin = jnp.zeros((), jnp.int32)
    meta = jnp.stack(
        [jnp.asarray(origin, jnp.int32).reshape(()),
         jnp.asarray(parity, jnp.int32)])
    nhb = nyp // _HALO - 1     # highest valid halo-block index
    thb = Ty // _HALO

    def m(j):
        return (0, j)

    def left(j):
        return (0, jnp.maximum(j * thb - 1, 0))

    def right(j):
        return (0, jnp.minimum((j + 1) * thb, nhb))

    def spec(shape, fj):
        return pl.BlockSpec(shape, lambda j, fj=fj: fj(j))

    mainspec = spec((nx, Ty), m)
    hl, hr = spec((nx, _HALO), left), spec((nx, _HALO), right)

    nine = kind == StencilKind.nine_pt
    if nine:
        corner_specs = [mainspec, hr, mainspec, hr]
        corner_ops = [so[Dir2.SW], so[Dir2.SW], so[Dir2.NW], so[Dir2.NW]]
    else:
        # never read for five_pt (static branch): tiny constant blocks
        dummy = pl.BlockSpec((8, 128), lambda j: (0, 0))
        corner_specs = [dummy] * 4
        zd = jnp.zeros((8, 128), q.dtype)
        corner_ops = [zd, zd, zd, zd]

    kernel = functools.partial(
        _sweep_kernel, kind=kind, Ty=Ty,
        nx=nx, ny=nyp, h_solve=h_solve,
        lny=nyp if lny is None else lny,
    )
    out = pl.pallas_call(
        kernel,
        grid=(nyp // Ty,),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [mainspec, mainspec, mainspec, hr]      # O, W, S, S-right
            + corner_specs                            # SW, SW-r, NW, NW-r
            + [mainspec, mainspec, hl, hr]            # b, q, q-l, q-r
        ),
        out_specs=mainspec,
        out_shape=jax.ShapeDtypeStruct((nx, nyp), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET,
        ),
        interpret=INTERPRET,
    )(meta, so[Dir2.O], so[Dir2.W], so[Dir2.S], so[Dir2.S],
      *corner_ops, b, q, q, q)
    return out


def _h_for(nx: int) -> int:
    return _H_SOLVE if nx >= 2 * _H_SOLVE else 8


def _line_relax_x_impl(so, q, b, kind, updown, origin=None, lny=None):
    """One full zebra x-line sweep (both colors) via the fused kernel.

    Callers gate on :func:`supported`; ny is padded to the lane-tile
    multiple here (pad lanes solve inert identity lines and are never
    merged back).  ``lny``: per-plane lane period when ``q`` is a
    flattened plane batch (zebra parity is then plane-local)."""
    nx, ny = q.shape
    nxp = -(-nx // 8) * 8           # Mosaic sublane block quantum
    Ty = _tile_lanes(nxp, ny, kind)
    nyp = -(-ny // Ty) * Ty
    sop, bp, qp = so, b, q
    if (nxp, nyp) != (nx, ny):
        # pad rows/lanes as inert identity lines (dg=1, zero couplings);
        # their solutions are never merged back
        pw = ((0, nxp - nx), (0, nyp - ny))
        sop = jnp.pad(so, ((0, 0),) + pw)
        sop = sop.at[Dir2.O, nx:, :].set(1.0)
        sop = sop.at[Dir2.O, :, ny:].set(1.0)
        bp = jnp.pad(b, pw)
        qp = jnp.pad(q, pw)
    order = (1, 0) if updown == "down" else (0, 1)
    for parity in order:
        qp = _color_call(sop, qp, bp, kind, parity, Ty,
                         h_solve=_h_for(nxp), origin=origin, lny=lny)
    return qp[:nx, :ny] if (nxp, nyp) != (nx, ny) else qp


@functools.lru_cache(maxsize=None)
def _vmap_core(kind, updown):
    """custom_vmap entry: a batched call (the vmapped plane cycles,
    ops/planes3.py) flattens the plane batch into lanes and runs ONE
    kernel per color instead of one small grid program per plane.
    Correct because each plane's operator stores ZERO couplings on its
    own boundary (interior-only convention), so lane rolls cannot leak
    across plane boundaries, and the in-kernel parity mask uses the
    per-plane lane period ``lny``."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def core(so, q, b):
        return _line_relax_x_impl(so, q, b, kind, updown)

    @core.def_vmap
    def _rule(axis_size, in_batched, so, q, b):
        def bc(a, batched):
            return a if batched else jnp.broadcast_to(
                a, (axis_size,) + a.shape)

        so_b = bc(so, in_batched[0])
        q_b = bc(q, in_batched[1])
        b_b = bc(b, in_batched[2])
        B, ndir, nx, ny = so_b.shape
        so_f = jnp.moveaxis(so_b, 0, 2).reshape(ndir, nx, B * ny)
        q_f = jnp.moveaxis(q_b, 0, 1).reshape(nx, B * ny)
        b_f = jnp.moveaxis(b_b, 0, 1).reshape(nx, B * ny)
        out = _line_relax_x_impl(so_f, q_f, b_f, kind, updown, lny=ny)
        out_b = jnp.moveaxis(out.reshape(nx, B, ny), 1, 0)
        return out_b, True

    return core


def line_relax_x(so, q, b, kind, updown, origin=None):
    """One full zebra x-line sweep (both colors); batch-aware (see
    :func:`_vmap_core`)."""
    if origin is not None:
        return _line_relax_x_impl(so, q, b, kind, updown, origin=origin)
    return _vmap_core(kind, updown)(so, q, b)


def line_relax_y(so, q, b, kind, updown, origin=None):
    """Zebra y-line sweep: the fused x kernel on the transposed system
    (same convention as lines2.line_relax_y)."""
    from cedar_tpu.ops.lines2 import _transpose_so

    so_t = _transpose_so(so, kind)
    qt = line_relax_x(so_t, q.T, b.T, kind, updown, origin=origin)
    return qt.T

"""Fallback Pallas 3D 7-pt sweep: 2D-tiled manual-DMA kernel.

The flattened-lane pipelined kernel (:mod:`cedar_tpu.ops.pallas3`) needs
whole (ny*nz)-lane rows in VMEM and cannot tile grids whose rows exceed the
budget (e.g. 256^3: 256 KB/row).  This kernel tiles (x, y) with the full z
extent as lanes and serializes DMA against compute per tile — slower per
byte than the pipelined kernel, but it covers the big-grid 7-point case
(the 256^3 fine level) that would otherwise fall back to the much slower
XLA path.  Bit-exact against ops.relax3.point_relax (same FMA structure).
"""


from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cedar_tpu.core.types import Dir3, StencilKind

INTERPRET = False

_HX = 3          # phases (2) + fused residual (1); x dim is unconstrained
_HY = 8          # y starts must be 8-aligned (sublane tiling)
_VMEM_BUDGET = 9 * 1024 * 1024


def _tiles_for(nx: int, ny: int, nz: int, dtype_bytes: int = 4):
    """(Tx, Ty) under the VMEM budget: 6 window buffers + ~5 temporaries."""
    colbytes = nz * dtype_bytes
    cells = _VMEM_BUDGET // (11 * colbytes)  # (Rx * Ry) budget
    ty = min(16, (ny - 2 * _HY) // 8 * 8)
    ry = ty + 2 * _HY
    rx = max(cells // ry, 1)
    tx = min(rx - 2 * _HX, nx - 2 * _HX)
    return tx, ty


def _roll(a, dx, dy, dz):
    out = a
    for ax, d in enumerate((dx, dy, dz)):
        if d:
            out = pltpu.roll(out, (-d) % out.shape[ax], ax)
    return out


def _shift_zero(a, dx, dy, dz):
    """out[i] = a[i + d] with zero fill (d >= 0 per axis)."""
    out = a
    for ax, d in enumerate((dx, dy, dz)):
        if d:
            pad_shape = list(out.shape)
            pad_shape[ax] = d
            pad = jnp.zeros(pad_shape, out.dtype)
            idx = [slice(None)] * 3
            idx[ax] = slice(d, None)
            out = jnp.concatenate([out[tuple(idx)], pad], axis=ax)
    return out


def _couplings7(sos):
    PW, PS, B = sos[Dir3.PW], sos[Dir3.PS], sos[Dir3.B]
    return {
        (-1, 0, 0): PW,
        (1, 0, 0): _shift_zero(PW, 1, 0, 0),
        (0, -1, 0): PS,
        (0, 1, 0): _shift_zero(PS, 0, 1, 0),
        (0, 0, -1): B,
        (0, 0, 1): _shift_zero(B, 0, 0, 1),
    }


def _offdiag(cpl, q):
    acc = None
    for off, c in cpl.items():
        term = c * _roll(q, *off)
        acc = term if acc is None else acc + term
    return acc


def _sweep_kernel(
    orig_ref, so_hbm, b_hbm, q_hbm, out_hbm, res_hbm,
    qs, sos, bs, sems,
    *, updown, Tx, Ty, nx, ny, nz, fuse_residual,
):
    Rx = Tx + 2 * _HX
    Ry = Ty + 2 * _HY
    i = pl.program_id(0)
    j = pl.program_id(1)
    x0 = jnp.maximum(0, jnp.minimum(i * Tx - _HX, nx - Rx))
    y0 = jnp.maximum(0, jnp.minimum(j * Ty - _HY, ny - Ry))
    y0 = pl.multiple_of((y0 // 8) * 8, 8)

    cps = [
        pltpu.make_async_copy(
            q_hbm.at[pl.ds(x0, Rx), pl.ds(y0, Ry)], qs, sems.at[0]
        ),
        pltpu.make_async_copy(
            so_hbm.at[:, pl.ds(x0, Rx), pl.ds(y0, Ry)], sos, sems.at[1]
        ),
        pltpu.make_async_copy(
            b_hbm.at[pl.ds(x0, Rx), pl.ds(y0, Ry)], bs, sems.at[2]
        ),
    ]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

    # global anchoring: orig_ref is the global index of local (0, 0, 0)
    # (nonzero only under shard_map; cf. the reference's iGs/jGs/kGs)
    gx = (orig_ref[0] + x0
          + jax.lax.broadcasted_iota(jnp.int32, (Rx, Ry, nz), 0))
    gy = (orig_ref[1] + y0
          + jax.lax.broadcasted_iota(jnp.int32, (Rx, Ry, nz), 1))
    gz = orig_ref[2] + jax.lax.broadcasted_iota(jnp.int32, (Rx, Ry, nz), 2)
    par = (gx + gy + gz) % 2

    diag = sos[Dir3.P]
    cpl = _couplings7(sos)
    b = bs[:]
    rec = 1.0 / diag
    q = qs[:]
    order = (0, 1) if updown == "up" else (1, 0)
    for color in order:
        upd = (b + _offdiag(cpl, q)) * rec
        q = jnp.where(par == color, upd, q)

    qs[:] = q
    ox = jnp.maximum(0, jnp.minimum(i * Tx, nx - Tx))
    oy = jnp.maximum(0, jnp.minimum(j * Ty, ny - Ty))
    oy = pl.multiple_of((oy // 8) * 8, 8)
    lx = ox - x0
    ly = pl.multiple_of(((oy - y0) // 8) * 8, 8)
    out = pltpu.make_async_copy(
        qs.at[pl.ds(lx, Tx), pl.ds(ly, Ty)],
        out_hbm.at[pl.ds(ox, Tx), pl.ds(oy, Ty)],
        sems.at[0],
    )
    out.start()
    out.wait()

    if fuse_residual:
        res = b + _offdiag(cpl, q) - diag * q
        bs[:] = res
        rout = pltpu.make_async_copy(
            bs.at[pl.ds(lx, Tx), pl.ds(ly, Ty)],
            res_hbm.at[pl.ds(ox, Tx), pl.ds(oy, Ty)],
            sems.at[1],
        )
        rout.start()
        rout.wait()


def supported(shape, dtype, kind) -> bool:
    if kind != StencilKind.seven_pt:
        return False
    if jnp.dtype(dtype) != jnp.dtype(jnp.float32):
        return False
    nx, ny, nz = shape
    if nz % 128 or ny % 8:
        return False
    tx, ty = _tiles_for(nx, ny, nz)
    return tx >= 8 and ty >= 8


@functools.partial(jax.jit, static_argnames=("updown", "fuse_residual"))
def point_relax(so, q, b, rec, updown, fuse_residual=False, origin=None):
    """One full red-black 7-pt sweep in a single HBM pass (non-periodic).

    Reference semantics: BMG3_SymStd_relax_GS.f90 7-point branch
    (:144-183); drop-in for cedar_tpu.ops.relax3.point_relax on supported
    shapes."""
    del rec
    if origin is None:
        origin = jnp.zeros((3,), jnp.int32)
    nx, ny, nz = q.shape
    Tx, Ty = _tiles_for(nx, ny, nz)
    Rx = Tx + 2 * _HX
    Ry = Ty + 2 * _HY
    dtype = q.dtype

    kernel = functools.partial(
        _sweep_kernel,
        updown=updown,
        Tx=Tx,
        Ty=Ty,
        nx=nx,
        ny=ny,
        nz=nz,
        fuse_residual=fuse_residual,
    )
    out_shapes = [
        jax.ShapeDtypeStruct((nx, ny, nz), dtype),
        jax.ShapeDtypeStruct(
            (nx, ny, nz) if fuse_residual else (8, 8, 128), dtype
        ),
    ]
    anyspec = pl.BlockSpec(memory_space=pltpu.ANY)
    q_out, res = pl.pallas_call(
        kernel,
        grid=(pl.cdiv(nx, Tx), pl.cdiv(ny, Ty)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [anyspec] * 3,
        out_specs=[anyspec, anyspec],
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((Rx, Ry, nz), dtype),
            pltpu.VMEM((4, Rx, Ry, nz), dtype),
            pltpu.VMEM((Rx, Ry, nz), dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=INTERPRET,
    )(origin, so, b, q)
    if fuse_residual:
        return q_out, res
    return q_out

"""Parity (even/odd) grid decomposition via strided convolutions.

Grid-transfer operators and multicolor sweeps constantly sample fine grids
at stride 2 in both axes.  A double-strided slice (``q[::2, ::2]``) lowers to
a pathological lane-gather on TPU (measured ~2.5 ms per op at 1024², versus
~0.1 ms for the same bytes contiguous).  Instead we split a fine grid ONCE
into its four parity subgrids with a single 2×2/stride-2 convolution (an
optimized space-to-depth path in XLA:TPU), do all transfer arithmetic on
contiguous subgrids, and merge back with one transposed (lhs-dilated)
convolution.

This is the TPU replacement for the reference's strided Fortran loops
(e.g. BMG2_SymStd_restrict.f90's ``i=i+2`` walks).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# channel order: (z parity, w parity)
_PARITIES = [(0, 0), (0, 1), (1, 0), (1, 1)]


def _deint_kernel(dtype):
    k = np.zeros((2, 2, 1, 4), np.float64)
    for c, (pz, pw) in enumerate(_PARITIES):
        k[pz, pw, 0, c] = 1.0
    return jnp.asarray(k, dtype)


def _inter_kernel(dtype):
    # flipped: channel (pz,pw) writes out[2a+pz, 2b+pw] under padding (1,1)
    k = np.zeros((2, 2, 4, 1), np.float64)
    for c, (pz, pw) in enumerate(_PARITIES):
        k[1 - pz, 1 - pw, c, 0] = 1.0
    return jnp.asarray(k, dtype)


def deinterleave2(a: jnp.ndarray):
    """Split (nx, ny) into parity subgrids.

    Returns dict ``(pz, pw) -> subgrid`` with shapes
    ``(ceil/floor(nx/2), ceil/floor(ny/2))`` according to parity.

    Implemented as two single-axis strided slices separated by an
    optimization barrier: each single-axis stride-2 slice is near-free on
    TPU, while the fused double-strided slice is a pathological lane-gather
    (measured ~2.5 ms vs ~0.05 ms at 1024² f32).
    """
    rows = {0: a[0::2, :], 1: a[1::2, :]}
    out = {}
    for pz, r in rows.items():
        r = jax.lax.optimization_barrier(r)
        out[(pz, 0)] = r[:, 0::2]
        out[(pz, 1)] = r[:, 1::2]
    return out


def deinterleave2_conv(a: jnp.ndarray):
    """Conv-based (space-to-depth) variant; one fused op, 4 channels."""
    nx, ny = a.shape
    pz1 = nx % 2  # pad so both dims even
    pw1 = ny % 2
    x = a[None, :, :, None]
    y = jax.lax.conv_general_dilated(
        x,
        _deint_kernel(a.dtype),
        window_strides=(2, 2),
        padding=((0, pz1), (0, pw1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0]
    mzs = {0: (nx + 1) // 2, 1: nx // 2}
    mws = {0: (ny + 1) // 2, 1: ny // 2}
    out = {}
    for c, (pz, pw) in enumerate(_PARITIES):
        out[(pz, pw)] = y[: mzs[pz], : mws[pw], c]
    return out


def interleave2(parts: dict, nx: int, ny: int) -> jnp.ndarray:
    """Merge parity subgrids back into an (nx, ny) array (missing -> 0)."""
    mz = (nx + 1) // 2
    mw = (ny + 1) // 2
    dtype = None
    for v in parts.values():
        dtype = v.dtype
        break
    chans = []
    for pz, pw in _PARITIES:
        v = parts.get((pz, pw))
        if v is None:
            v = jnp.zeros((mz, mw), dtype)
        else:
            v = jnp.pad(v, ((0, mz - v.shape[0]), (0, mw - v.shape[1])))
        chans.append(v)
    p = jnp.stack(chans, axis=-1)[None]  # (1, mz, mw, 4)
    y = jax.lax.conv_general_dilated(
        p,
        _inter_kernel(dtype),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0, :, :, 0]
    return y[:nx, :ny]


def deinterleave3(a: jnp.ndarray):
    """Split (nx, ny, nz) into its eight parity subgrids.

    Returns dict ``(p0, p1, p2) -> subgrid``.  Like :func:`deinterleave2`,
    implemented as single-axis stride-2 slices separated by optimization
    barriers (each single-axis stride-2 slice is near-free on TPU; the fused
    multi-axis strided slice is a pathological lane-gather).
    """
    out = {}
    for p0 in (0, 1):
        r0 = jax.lax.optimization_barrier(a[p0::2])
        for p1 in (0, 1):
            r1 = jax.lax.optimization_barrier(r0[:, p1::2])
            out[(p0, p1, 0)] = r1[:, :, 0::2]
            out[(p0, p1, 1)] = r1[:, :, 1::2]
    return out


def interleave3(parts: dict, n0: int, n1: int, n2: int) -> jnp.ndarray:
    """Merge 3D parity subgrids back into (n0, n1, n2) (missing -> 0)."""
    ms = ((n0 + 1) // 2, (n1 + 1) // 2, (n2 + 1) // 2)
    dtype = None
    for v in parts.values():
        dtype = v.dtype
        break
    blocks = []
    for p0 in (0, 1):
        rows = []
        for p1 in (0, 1):
            row = []
            for p2 in (0, 1):
                v = parts.get((p0, p1, p2))
                if v is None:
                    v = jnp.zeros(ms, dtype)
                else:
                    v = jnp.pad(
                        v,
                        tuple((0, ms[ax] - v.shape[ax]) for ax in range(3)),
                    )
                row.append(v)
            rows.append(jnp.stack(row, axis=-1))  # (m0, m1, m2, 2)
        blocks.append(jnp.stack(rows, axis=2))  # (m0, m1, 2, m2, 2)
    stacked = jnp.stack(blocks, axis=1)  # (m0, 2, m1, 2, m2, 2)
    out = stacked.reshape(2 * ms[0], 2 * ms[1], 2 * ms[2])
    return out[:n0, :n1, :n2]


def subgrid_sample(sub: jnp.ndarray, dz: int, dw: int, out_shape):
    """``out[z, w] = sub[z + dz, w + dw]``, zero outside, padded/cropped to
    ``out_shape`` (coarse grid).  All contiguous ops."""
    pz_lo = max(-dz, 0)
    pw_lo = max(-dw, 0)
    need_z = out_shape[0] + dz  # max index +1 read from sub
    need_w = out_shape[1] + dw
    pz_hi = max(need_z - sub.shape[0], 0)
    pw_hi = max(need_w - sub.shape[1], 0)
    p = jnp.pad(sub, ((pz_lo, pz_hi), (pw_lo, pw_hi)))
    z0 = dz + pz_lo
    w0 = dw + pw_lo
    return p[z0 : z0 + out_shape[0], w0 : w0 + out_shape[1]]


def subgrid_sample_nd(sub: jnp.ndarray, deltas, out_shape):
    """ND generalization of :func:`subgrid_sample`: ``out[c] = sub[c + d]``,
    zero outside, padded/cropped to ``out_shape``."""
    lo = [max(-d, 0) for d in deltas]
    hi = [
        max(out_shape[ax] + deltas[ax] - sub.shape[ax], 0)
        for ax in range(len(deltas))
    ]
    p = jnp.pad(sub, tuple(zip(lo, hi)))
    slc = tuple(
        slice(deltas[ax] + lo[ax], deltas[ax] + lo[ax] + out_shape[ax])
        for ax in range(len(deltas))
    )
    return p[slc]

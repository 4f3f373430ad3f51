"""3D plane relaxation: zebra planes smoothed by embedded 2D BoxMG cycles.

Reference: include/cedar/3d/relax_planes.h:36-246 + src/3d/relax_planes.cc.
The reference relaxes planes of one zebra color sequentially, each with its
own `cdr2::solver` (configured by `plane-config`, default one V-cycle of
line-xy relaxation, src/kernel_params.cc:72-78).  All planes of a color are
independent, so here they run as ONE vmapped batched 2D cycle over a batched
2D hierarchy — embarrassingly parallel on the TPU instead of a sequential
plane loop.

Plane 2D operators are the in-plane couplings with the full 3D diagonal
(copy_coeff, relax_planes.h:77-161):

* xy: c=p,  w=pw, s=ps, sw=psw, nw=pnw    (plane axis 2)
* xz: c=p,  w=pw, s=b,  sw=bw,  nw=be     (plane axis 1)
* yz: c=p,  w=ps, s=b,  sw=bs,  nw=bn     (plane axis 0)

The per-plane rhs adds the out-of-plane couplings at current values
(copy_rhs, src/3d/relax_planes.cc:25-120).  Zebra order: DOWN sweeps planes
of odd 1-based interior index first (0-based parity 0), UP reversed
(relax_planes.h:44-52).

One deliberate improvement over the reference: its copy_coeff loops every
plane index and overwrites the same 2D operator, so every plane solver is
built from the final slice's coefficients (relax_planes.h:85-92); here each
plane gets its true coefficient slice (identical behavior whenever the
operator is plane-invariant, e.g. all gallery problems).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cedar_tpu.core.types import Dir3, StencilKind
from cedar_tpu.ops.stencil3 import coupling, offsets_for
from cedar_tpu.core.shift import shift3
from cedar_tpu.settings import MLSettings, RelaxType

# orientation -> (plane axis in the 3D array, 7-pt dirs, 27-pt extra dirs)
PLANE_SPECS = {
    "xy": (2, [Dir3.P, Dir3.PW, Dir3.PS], [Dir3.PSW, Dir3.PNW]),
    "xz": (1, [Dir3.P, Dir3.PW, Dir3.B], [Dir3.BW, Dir3.BE]),
    "yz": (0, [Dir3.P, Dir3.PS, Dir3.B], [Dir3.BS, Dir3.BN]),
}

ORIENTS_OF = {
    RelaxType.plane_xy: ("xy",),
    RelaxType.plane_xz: ("xz",),
    RelaxType.plane_yz: ("yz",),
    RelaxType.plane_xyz: ("xy", "yz", "xz"),
}


def plane_kind2(kind3: StencilKind) -> StencilKind:
    return (
        StencilKind.five_pt
        if kind3 == StencilKind.seven_pt
        else StencilKind.nine_pt
    )


def slice_so(so3: jnp.ndarray, kind3: StencilKind, orient: str):
    """Batched 2D plane operators: (nplanes, ndir2, n1, n2)."""
    axis, base, extra = PLANE_SPECS[orient]
    dirs = base + (extra if kind3 == StencilKind.twenty_seven_pt else [])
    sel = so3[jnp.asarray(dirs)]  # (ndir2, nx, ny, nz)
    return jnp.moveaxis(sel, axis + 1, 0)


def out_of_plane_apply(so3, q, kind3, axis, periodic=(False, False, False)):
    """Σ couplings with a nonzero offset along ``axis`` × neighbor values."""
    acc = None
    for off in offsets_for(kind3):
        if off[axis] == 0:
            continue
        term = coupling(so3, off, periodic) * shift3(
            q, *off, periodic=periodic
        )
        acc = term if acc is None else acc + term
    return acc


def _to_planes(a, axis):
    """(nx, ny, nz) -> (nplanes, n1, n2) with the plane axis leading."""
    return jnp.moveaxis(a, axis, 0)


def _set_planes(x, vals, axis, parity):
    """Replace the planes of the given parity along ``axis``, scatter-free."""
    y = _to_planes(x, axis)
    npl = y.shape[0]
    n_even = (npl + 1) // 2
    n_odd = npl // 2
    m = max(n_even, n_odd)
    if parity == 0:
        even, odd = vals, y[1::2]
    else:
        even, odd = y[0::2], vals
    pad_e = [(0, m - even.shape[0])] + [(0, 0)] * (y.ndim - 1)
    pad_o = [(0, m - odd.shape[0])] + [(0, 0)] * (y.ndim - 1)
    even = jnp.pad(even, pad_e)
    odd = jnp.pad(odd, pad_o)
    out = jnp.stack([even, odd], axis=1).reshape((2 * m,) + y.shape[1:])
    return jnp.moveaxis(out[:npl], 0, axis)


# Process-level caches of the jitted/vmapped plane computations.  Reusing
# ONE jitted function object per signature (a) caches the vmapped-hierarchy
# SETUP compilation across same-shape levels/orients/solvers (plane-xyz on
# cubic grids, repeated solver constructions in a test run), and (b) lets
# JAX reuse the traced jaxpr of the embedded 2D cycle across the pre/post
# call sites of every outer-cycle trace (jit-of-jit trace caching) — the
# dominant cost of plane-relax compiles (VERDICT round-1: 3-4 min per
# config; the reference has no analogue, its plane solvers are runtime
# objects, include/cedar/3d/relax_planes.h:164-175).
_SETUP_CACHE: dict = {}
_CYCLE_CACHE: dict = {}


def _skey(s: MLSettings):
    return (
        s.relaxation, s.nrelax_pre, s.nrelax_post, s.maxiter,
        s.num_levels, s.min_coarse, s.relax_symmetric, s.kernel_backend,
        s.cycle,
    )


def _cached_build(kind2, nlev2, psettings):
    from cedar_tpu.solver.solver2 import setup_hierarchy as setup_hierarchy2

    key = ("setup", kind2, nlev2, _skey(psettings))
    fn = _SETUP_CACHE.get(key)
    if fn is None:
        fn = jax.jit(
            jax.vmap(
                functools.partial(
                    setup_hierarchy2,
                    fine_kind=kind2,
                    nlevels=nlev2,
                    settings=psettings,
                    periodic=(False, False),
                )
            )
        )
        _SETUP_CACHE[key] = fn
    return fn


def _cached_cycle(kinds2, psettings):
    from cedar_tpu.solver.cycle2 import run_cycle as run_cycle2

    key = ("cycle", tuple(kinds2), _skey(psettings))
    fn = _CYCLE_CACHE.get(key)
    if fn is None:
        reps = max(1, psettings.maxiter)

        def cycle2(levels2, x2, b2):
            if reps == 1:
                return run_cycle2(
                    levels2, kinds2, x2, b2, psettings, (False, False)
                )

            def body(x2, _):
                return run_cycle2(
                    levels2, kinds2, x2, b2, psettings, (False, False)
                ), None

            x2, _ = jax.lax.scan(body, x2, None, length=reps)
            return x2

        fn = jax.jit(jax.vmap(cycle2))
        _CYCLE_CACHE[key] = fn
    return fn


def setup_planes(levels, kinds, settings: MLSettings, conf):
    """Attach batched 2D plane hierarchies to every non-coarsest level.

    One hierarchy per (level, orientation), batched over ALL planes (color
    slicing happens at relax time with static strided slices).
    """
    from cedar_tpu.solver.solver2 import compute_num_levels as nlev2_of

    psettings = settings.plane_settings
    orients = ORIENTS_OF[settings.relaxation]

    new_levels = []
    for lvl, (lev, kind3) in enumerate(zip(levels, kinds)):
        if lvl == len(levels) - 1:
            new_levels.append(lev)
            continue
        pdata = {}
        for o in orients:
            so2b = slice_so(lev.so, kind3, o)
            kind2 = plane_kind2(kind3)
            n1, n2 = so2b.shape[2], so2b.shape[3]
            nlev2 = nlev2_of(n1, n2, psettings.min_coarse)
            pdata[o] = _cached_build(kind2, nlev2, psettings)(so2b)
        new_levels.append(lev._replace(planes=pdata))
    return tuple(new_levels)


def plane_relax(lev, kind3, x, b, orient, updown, settings: MLSettings,
                periodic=(False, False, False)):
    """One zebra plane-relaxation sweep (both colors).

    Reference ordering (relax_planes.h:44-52): DOWN relaxes 1-based-odd
    interior planes (0-based parity 0) then even; UP reversed.

    When the plane count is even, the two color phases run as a `lax.scan`
    over the color index (planes reshaped to (npl/2, 2, ...) so a color is a
    dynamic index): the compiled graph holds ONE vmapped 2D cycle instead of
    two, and DOWN/UP differ only in the scanned order array.  Odd plane
    counts (colors of unequal size) fall back to an unrolled loop.
    """
    axis, _, _ = PLANE_SPECS[orient]
    hier = lev.planes[orient]
    psettings = settings.plane_settings
    kind2 = plane_kind2(kind3)
    nlev2 = len(hier)
    kinds2 = [kind2] + [StencilKind.nine_pt] * (nlev2 - 1)
    npl = x.shape[axis]
    vcycle2 = _cached_cycle(kinds2, psettings)

    order = (0, 1) if updown == "down" else (1, 0)

    if npl % 2:
        for c in order:
            rhs3 = b + out_of_plane_apply(lev.so, x, kind3, axis, periodic)
            b2 = _to_planes(rhs3, axis)[c::2]
            x2 = _to_planes(x, axis)[c::2]
            hier_c = jax.tree.map(lambda a: a[c::2], hier)
            x2 = vcycle2(hier_c, x2, b2)
            x = _set_planes(x, x2, axis, c)
        return x

    def pair(a):
        """(npl, ...) -> (npl/2, 2, ...): plane k = (k//2, k%2)."""
        return a.reshape((npl // 2, 2) + a.shape[1:])

    hier_p = jax.tree.map(pair, hier)

    def body(x, c):
        rhs3 = b + out_of_plane_apply(lev.so, x, kind3, axis, periodic)
        b2 = jax.lax.dynamic_index_in_dim(
            pair(_to_planes(rhs3, axis)), c, axis=1, keepdims=False
        )
        xp = pair(_to_planes(x, axis))
        x2 = jax.lax.dynamic_index_in_dim(xp, c, axis=1, keepdims=False)
        hier_c = jax.tree.map(
            lambda a: jax.lax.dynamic_index_in_dim(
                a, c, axis=1, keepdims=False
            ),
            hier_p,
        )
        x2 = vcycle2(hier_c, x2, b2)
        xp = jax.lax.dynamic_update_index_in_dim(xp, x2, c, axis=1)
        x = jnp.moveaxis(xp.reshape((npl,) + xp.shape[2:]), 0, axis)
        return x, None

    x, _ = jax.lax.scan(body, x, jnp.asarray(order, jnp.int32))
    return x

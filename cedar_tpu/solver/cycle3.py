"""3D V- and F-cycles over a static level hierarchy.

3D analogue of :mod:`cedar_tpu.solver.cycle2` (reference:
include/cedar/cycle/vcycle.h:44-115, fcycle.h:49-84, relaxation dispatch
multilevel.h:134-223).  Plane relaxation embeds batched 2D cycles
(:mod:`cedar_tpu.ops.planes3`): where the reference loops zebra planes
sequentially, each with its own 2D solver (include/cedar/3d/relax_planes.h),
here all planes of one color run as ONE vmapped 2D V-cycle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cedar_tpu.ops import cg
from cedar_tpu.ops.interp3 import interp_add, restrict
from cedar_tpu.ops.relax3 import point_relax
from cedar_tpu.settings import MLSettings, RelaxType
from cedar_tpu.utils.timing import scope
from cedar_tpu.ops.stencil3 import residual


def _use_pallas(settings, kind, shape, dtype, periodic, shard=None):
    if settings.kernel_backend != "pallas" or any(periodic):
        return False
    if shard is not None:
        from cedar_tpu.parallel import shard_relax

        return shard_relax.supported3(shape, dtype, kind, shard)
    from cedar_tpu.ops import pallas3

    return pallas3.supported(shape, dtype, kind)


def _pallas_relax(lev, kind, x, b, updown, shard, fuse_residual=False):
    """Fused Pallas sweep — per-shard under shard_map when sharded."""
    if shard is not None:
        from cedar_tpu.parallel import shard_relax

        return shard_relax.point_relax3(
            shard, lev.so, x, b, updown, fuse_residual, kind=kind
        )
    from cedar_tpu.ops import pallas3

    return pallas3.point_relax(lev.so, x, b, lev.recip, updown,
                               fuse_residual, kind=kind)


def _smooth(lev, kind, x, b, settings: MLSettings, updown: str, periodic,
            shard=None):
    """One smoothing application (reference: multilevel.h:134-223).

    For plane-xyz relaxation the reference applies xy, yz, xz sweeps on the
    way down and xz, yz, xy on the way up (3d/mpi/solver.h relax_dir
    dispatch).
    """
    rt = settings.relaxation
    if rt == RelaxType.point:
        if _use_pallas(settings, kind, x.shape, x.dtype, periodic, shard):
            return _pallas_relax(lev, kind, x, b, updown, shard)
        return point_relax(lev.so, x, b, lev.recip, kind, updown, periodic)
    if rt in (RelaxType.plane_xy, RelaxType.plane_xz, RelaxType.plane_yz,
              RelaxType.plane_xyz):
        from cedar_tpu.ops.planes3 import ORIENTS_OF, plane_relax

        orients = ORIENTS_OF[rt]
        if updown == "up":
            orients = tuple(reversed(orients))
        for o in orients:
            x = plane_relax(lev, kind, x, b, o, updown, settings, periodic)
        return x
    raise ValueError(f"invalid 3D relaxation: {rt}")


def _nsmooth(lev, kind, x, b, settings, updown, periodic, nrelax,
             shard=None):
    """``nrelax`` identical sweeps as one lax.scan (smaller compiled graph)."""
    if nrelax <= 1:
        for _ in range(nrelax):
            x = _smooth(lev, kind, x, b, settings, updown, periodic, shard)
        return x

    def body(x, _):
        return (
            _smooth(lev, kind, x, b, settings, updown, periodic, shard),
            None,
        )

    x, _ = jax.lax.scan(body, x, None, length=nrelax)
    return x


def _coarse_solve_inner(coarse, cb, settings: MLSettings, periodic):
    """Inner multigrid coarse solve (cg-solver "cedar"/"redist").

    Runs the nested solver's tol/maxiter iteration on the coarsest-grid
    system (reference: redist multilevel_wrapper + setup_cg_solve)."""
    from cedar_tpu.core.types import StencilKind

    inner = coarse.inner
    ist = settings.cg_settings
    kinds = [StencilKind.twenty_seven_pt] * len(inner)
    r0 = jnp.sqrt(jnp.sum(cb * cb))
    r0 = jnp.maximum(r0, jnp.asarray(1e-300, cb.dtype))

    def cond(carry):
        i, x, rel = carry
        return (i < ist.maxiter) & (rel >= ist.tol)

    def body(carry):
        i, x, _ = carry
        x = run_cycle(inner, kinds, x, cb, ist, periodic)
        r = residual(inner[0].so, x, cb, kinds[0], periodic)
        rel = jnp.sqrt(jnp.sum(r * r)) / r0
        return i + 1, x, rel

    x0 = jnp.zeros_like(cb)
    rel0 = jnp.asarray(jnp.inf, cb.dtype)
    _, x, _ = jax.lax.while_loop(cond, body, (0, x0, rel0))
    return x


def fine_split_ok(levels, settings: MLSettings, constraints) -> bool:
    """Whether the fine level can run the octant-split resident cycle
    (pallas3_split): serial, V-cycle, point relaxation with at least one
    pre- and post-sweep, split stencil + transfer workspaces present
    (their setup already gated on backend/shape/periodicity)."""
    return (
        constraints is None
        and settings.cycle.value == "v"
        and settings.relaxation == RelaxType.point
        and settings.nrelax_pre >= 1
        and settings.nrelax_post >= 1
        and len(levels) >= 2
        and levels[0].so2 is not None
        and levels[1].pw4 is not None
    )


def _split_ok_at(levels, lvl) -> bool:
    """Level ``lvl`` can run split-resident: split stencil present (setup
    gated on backend/shape/relaxation) and its coarse level has the
    split-transfer weight workspace."""
    return (
        lvl < len(levels) - 1
        and levels[lvl].so2 is not None
        and levels[lvl + 1].pw4 is not None
    )


def ncycle_split(
    levels,
    kinds,
    x4: jnp.ndarray,
    b4: jnp.ndarray,
    settings: MLSettings,
    periodic=(False, False, False),
    fuse_final_residual: bool = False,
    lvl: int = 0,
):
    """One V-cycle with the top level(s) resident in the octant-split
    layout (4, nxp, kp): the fused pre-sweep residual restricts with no
    layout pass (and is never written to HBM — interp_sweep_split3
    recomputes it in-VMEM), interpolation + the first post-sweep fuse,
    and (optionally) the top level's last post-sweep fuses the
    convergence-residual NORM.  Recurses split-resident while the
    workspaces exist; deeper levels run the dense ncycle.  3D analogue
    of cycle2.ncycle_split.

    With ``fuse_final_residual`` returns ``(x4, partials)`` where
    ``partials`` are per-block partial sums of res²."""
    from cedar_tpu.ops import pallas3_split as p3s

    from cedar_tpu.ops import pallas3_stream as p3st

    lev, kind = levels[lvl], kinds[lvl]
    nz2 = lev.so.shape[3] // 2
    # the streaming (wavefront) kernels read every operand exactly once
    # per sweep — prefer them wherever they fit VMEM (lane panels extend
    # them to full-width-over-VMEM sizes, e.g. 256^3)
    stream = p3st.stream_supported(b4.shape, kind, nz2)

    def sweep(x4, ud, **kw):
        if stream:
            return p3st.point_relax_stream3(lev.so2, x4, b4, kind, ud,
                                            nz2=nz2, **kw)
        return p3s.point_relax_split3(lev.so2, x4, b4, kind, ud,
                                      nz2=nz2, **kw)

    with scope("relaxation"):
        for _ in range(settings.nrelax_pre - 1):
            x4 = sweep(x4, "down")
    coarse = levels[lvl + 1]
    cshape = coarse.so.shape[1:]
    # when the fused interp+sweep pass fits, the residual never touches
    # HBM; otherwise the pointwise interp kernel consumes the emitted one
    fused_interp = (not stream
                    and p3s.interp_fused_ok(kind, b4.shape[2], b4.shape[1]))
    with scope("relaxation-residual-restrict-fused"):
        if stream:
            x4, res4, cb = p3st.sweep_restrict_stream3(
                lev.so2, x4, b4, coarse.pw4, kind, "down", cshape,
                nz2=nz2,
            )
        else:
            x4, res4, cb = p3s.sweep_restrict_split3(
                lev.so2, x4, b4, coarse.pw4, kind, "down", cshape,
                emit_res=not fused_interp, nz2=nz2,
            )

    if lvl + 1 == len(levels) - 1:
        with scope("coarse-solve"):
            if coarse.inner is not None:
                cx = _coarse_solve_inner(coarse, cb, settings, periodic)
            else:
                cx = cg.solve_cg(coarse.ainv, cb)
    elif _split_ok_at(levels, lvl + 1):
        dims = p3s.split_dims3(*cshape)
        cb4 = p3s.split4(cb, dims)
        cx4, _ = ncycle_split(levels, kinds, jnp.zeros_like(cb4), cb4,
                              settings, periodic, False, lvl + 1)
        cx = p3s.merge4(cx4, *cshape)
    else:
        cx = ncycle(levels, kinds, lvl + 1, jnp.zeros_like(cb), cb,
                    settings, periodic)

    post = "up" if settings.relax_symmetric else "down"
    fuse_here = fuse_final_residual and settings.nrelax_post == 1
    with scope("interp-add-relax-fused"):
        if stream:
            out = p3st.interp_sweep_stream3(
                coarse.pw4, cx, lev.so2, b4, x4, kind, post, res4,
                fuse_norm=fuse_here, nz2=nz2,
            )
        else:
            out = p3s.interp_sweep_split3(
                coarse.pw4, cx, lev.so2, b4, x4, kind, post,
                fuse_norm=fuse_here, nz2=nz2, res4=res4,
            )
    if fuse_here:
        return out
    x4 = out
    n_plain = settings.nrelax_post - 1 - (1 if fuse_final_residual else 0)
    with scope("relaxation"):
        for _ in range(n_plain):
            x4 = sweep(x4, post)
    if fuse_final_residual:
        with scope("relaxation-residual-fused"):
            return sweep(x4, post, fuse_norm=True)
    return x4, None


def fuse_final_ok(levels, kinds, shape, dtype, settings: MLSettings,
                  periodic, constraints) -> bool:
    """Whether the top level's last post-sweep can fuse the convergence
    residual (see cycle2.fuse_final_ok)."""
    shard = constraints[0] if constraints is not None else None
    return (
        settings.cycle.value == "v"
        and settings.relaxation == RelaxType.point
        and settings.nrelax_post >= 1
        and len(levels) >= 2
        and _use_pallas(settings, kinds[0], shape, dtype, periodic, shard)
    )


def ncycle(
    levels,
    kinds,
    lvl: int,
    x: jnp.ndarray,
    b: jnp.ndarray,
    settings: MLSettings,
    periodic=(False, False, False),
    n: int = 1,
    constraints=None,
    fuse_final_residual: bool = False,
):
    """Recursive n-cycle (n=1: V, n=2: W).  Reference: vcycle.h:57-115.

    With ``fuse_final_residual`` (top level only; caller checks
    :func:`fuse_final_ok`), the last post-sweep also emits the residual
    in the same HBM pass and the return value is ``(x, res)``."""
    lev = levels[lvl]
    kind = kinds[lvl]
    shard = constraints[lvl] if constraints is not None else None

    if (
        settings.relaxation == RelaxType.point
        and settings.nrelax_pre >= 1
        and _use_pallas(settings, kind, x.shape, x.dtype, periodic, shard)
    ):
        # fused final pre-smooth + residual: one HBM pass for both
        with scope("relaxation"):
            x = _nsmooth(lev, kind, x, b, settings, "down", periodic,
                         settings.nrelax_pre - 1, shard)
        with scope("relaxation-residual-fused"):
            x, res = _pallas_relax(lev, kind, x, b, "down", shard,
                                   fuse_residual=True)
    else:
        with scope("relaxation"):
            x = _nsmooth(lev, kind, x, b, settings, "down", periodic,
                         settings.nrelax_pre, shard)

        with scope("residual"):
            res = residual(lev.so, x, b, kind, periodic)
    coarse = levels[lvl + 1]
    # Pallas restriction (interp_add stays on the XLA path — measured
    # faster there, see ops/pallas_transfer3.py)
    if coarse.cip is not None and shard is None:
        from cedar_tpu.ops import pallas_transfer3 as pt

        with scope("restrict"):
            cb = pt.restrict(coarse.cip, pt.split_res(res),
                             coarse.so.shape[1:])
    else:
        with scope("restrict"):
            cb = restrict(coarse.ci, res, periodic)
    if constraints is not None:
        # agglomeration point: pin the coarse level's (sub)mesh placement
        cb = jax.lax.with_sharding_constraint(cb, constraints[lvl + 1])

    if lvl + 1 == len(levels) - 1:
        with scope("coarse-solve"):
            if coarse.inner is not None:
                cx = _coarse_solve_inner(coarse, cb, settings, periodic)
            else:
                cx = cg.solve_cg(coarse.ainv, cb)
    else:
        cx = jnp.zeros_like(cb)
        for _ in range(n):
            cx = ncycle(levels, kinds, lvl + 1, cx, cb, settings, periodic,
                        n, constraints)

    with scope("interp-add"):
        x = interp_add(coarse.ci, lev.so, cx, res, x, periodic)
    if constraints is not None:
        x = jax.lax.with_sharding_constraint(x, constraints[lvl])

    # nonsymmetric relaxation keeps the forward sweep order for
    # post-smoothing (reference: IRELAX_SYM, BMG3_SymStd_relax_GS.f90)
    post = "up" if settings.relax_symmetric else "down"
    if fuse_final_residual:
        with scope("relaxation"):
            x = _nsmooth(lev, kind, x, b, settings, post, periodic,
                         settings.nrelax_post - 1, shard)
        with scope("relaxation-residual-fused"):
            return _pallas_relax(lev, kind, x, b, post, shard,
                                 fuse_residual=True)
    with scope("relaxation"):
        x = _nsmooth(lev, kind, x, b, settings, post, periodic,
                     settings.nrelax_post, shard)
    return x


def fmg_cycle(
    levels,
    kinds,
    lvl: int,
    b: jnp.ndarray,
    settings: MLSettings,
    periodic=(False, False, False),
    constraints=None,
):
    """Full multigrid cycle (reference: fcycle.h:49-84).  Returns x.

    Routed through the fast kernels where workspaces exist: the
    b-restriction chain takes the Pallas restriction (the split-layout
    one on split-capable levels, the dense hybrid otherwise), and the
    per-level correction V-cycle runs split-resident when it can."""
    lev = levels[lvl]
    if lvl == len(levels) - 1:
        if lev.inner is not None:
            return _coarse_solve_inner(lev, b, settings, periodic)
        return cg.solve_cg(lev.ainv, b)
    coarse = levels[lvl + 1]
    split_here = (
        constraints is None and _split_ok_at(levels, lvl)
        and settings.relaxation == RelaxType.point
        and settings.nrelax_pre >= 1 and settings.nrelax_post >= 1
    )
    if split_here:
        from cedar_tpu.ops import pallas3_split as p3s

        dims = p3s.split_dims3(*b.shape)
        nz2 = dims[2]
        b4 = p3s.split4(b, dims)
        cbf = p3s._restrict_call3(
            coarse.pw4, b4, nz2, p3s._restrict_plan(dims[0], dims[3], nz2),
        )
        nxc, nyc, nzc = coarse.so.shape[1:]
        cb = cbf[:nxc].reshape(-1, dims[1], nz2)[:, :nyc, :nzc]
    elif coarse.cip is not None and constraints is None:
        from cedar_tpu.ops import pallas_transfer3 as pt

        cb = pt.restrict(coarse.cip, pt.split_res(b),
                         coarse.so.shape[1:])
    else:
        cb = restrict(coarse.ci, b, periodic)
    if constraints is not None:
        cb = jax.lax.with_sharding_constraint(cb, constraints[lvl + 1])
    cx = fmg_cycle(levels, kinds, lvl + 1, cb, settings, periodic,
                   constraints)
    if split_here:
        from cedar_tpu.ops import pallas3_split as p3s

        # level entry: x4 = P cx directly in split layout — the residual
        # is exactly zero here, so the full interp_add's res/diag/q
        # streams and the dense->split layout pass are skipped (the 2D
        # analogue took the 4096^2 F-cycle from 23.2 to 5.9 ms)
        dims = p3s.split_dims3(*b.shape)
        nz2 = dims[2]
        rows = dims[0] // 2 + 2 * 16
        ny2 = dims[1]
        nxc, nyc, nzc = cx.shape
        cxp = jnp.pad(cx, ((0, rows - nxc), (0, ny2 - nyc),
                           (0, nz2 - nzc))).reshape(rows, dims[3])
        x4 = p3s.interp_split_nores3(
            coarse.pw4, cxp, nz2, p3s._interp_plan(dims[0], dims[3], nz2),
        )
        x4, _ = ncycle_split(levels, kinds, x4, b4,
                             settings, periodic, lvl=lvl)
        return p3s.merge4(x4, *b.shape)
    zero = jnp.zeros_like(b)
    x = interp_add(coarse.ci, lev.so, cx, zero, zero, periodic)
    return ncycle(levels, kinds, lvl, x, b, settings, periodic, 1,
                  constraints)


def run_cycle(levels, kinds, x, b, settings: MLSettings, periodic,
              constraints=None):
    """One cycle of the configured type (reference: multilevel.h:289-296)."""
    if len(levels) == 1:
        return cg.solve_cg(levels[0].ainv, b)
    if settings.cycle.value == "f":
        return fmg_cycle(levels, kinds, 0, b, settings, periodic,
                         constraints)
    if fine_split_ok(levels, settings, constraints):
        # standalone-cycle entry pays one split + merge; the solve loop
        # (solver3._solve_impl) instead keeps q split-resident across
        # iterations and calls ncycle_split directly
        from cedar_tpu.ops import pallas3_split as p3s

        shape = b.shape
        dims = p3s.split_dims3(*shape)
        x4, _ = ncycle_split(
            levels, kinds, p3s.split4(x, dims), p3s.split4(b, dims),
            settings, periodic,
        )
        return p3s.merge4(x4, *shape)
    return ncycle(levels, kinds, 0, x, b, settings, periodic, 1,
                  constraints)

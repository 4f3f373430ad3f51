"""2D V- and F-cycles over a static level hierarchy.

Rebuilds the reference's recursive cycle drivers
(include/cedar/cycle/vcycle.h:44-115, include/cedar/cycle/fcycle.h:49-84) as
pure functions: the recursion over levels unrolls at trace time (level count
and shapes are static, matching the reference's precomputed ``nog``), so one
`jit` contains the entire cycle — smoothing, residual, transfer operators and
the coarse direct solve — with no host round-trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cedar_tpu.core.types import StencilKind
from cedar_tpu.ops import cg
from cedar_tpu.ops.interp2 import interp_add, restrict
from cedar_tpu.ops.relax2 import point_relax
from cedar_tpu.ops.lines2 import line_relax_x, line_relax_y
from cedar_tpu.ops.stencil2 import residual
from cedar_tpu.settings import MLSettings, RelaxType
from cedar_tpu.utils.timing import scope


def _use_pallas(settings, kind, shape, dtype, periodic, shard=None):
    if settings.kernel_backend != "pallas":
        return False
    if shard is not None:
        if any(periodic):
            return False
        from cedar_tpu.parallel import shard_relax

        return shard_relax.supported2(shape, dtype, kind, shard)
    from cedar_tpu.ops import pallas2

    return pallas2.supported(shape, dtype, kind, periodic)


def _pallas_relax(lev, kind, x, b, updown, shard, fuse_residual=False,
                  periodic=(False, False)):
    """Fused Pallas sweep — per-shard under shard_map when sharded."""
    if shard is not None:
        from cedar_tpu.parallel import shard_relax

        return shard_relax.point_relax2(
            shard, lev.so, x, b, kind, updown, fuse_residual
        )
    from cedar_tpu.ops import pallas2

    return pallas2.point_relax(
        lev.so, x, b, lev.recip, kind, updown, fuse_residual,
        periodic=periodic,
    )


def _smooth(lev, kind, x, b, settings: MLSettings, updown: str, periodic,
            shard=None):
    """Dispatch one smoothing application (reference: multilevel.h:134-223).

    Pre-smoothing (DOWN) applies line-x then line-y for "line-xy";
    post-smoothing (UP) reverses to line-y then line-x (symmetric cycle).
    Under sharding, the line solves run line-axis-local via shard_map
    (one gather per color — the analogue of the reference's interface
    reduction; see ops.lines2._local_solve).
    """
    rt = settings.relaxation
    if rt == RelaxType.point:
        if _use_pallas(settings, kind, x.shape, x.dtype, periodic, shard):
            return _pallas_relax(lev, kind, x, b, updown, shard,
                                 periodic=periodic)
        return point_relax(lev.so, x, b, lev.recip, kind, updown, periodic)

    def _pl_lines(axis):
        """Fused Pallas zebra sweep eligibility for this level/axis.
        ml-relax.enabled is an explicit algorithm selection (log-depth
        PCR): honor it over the fused kernel."""
        if (settings.kernel_backend != "pallas" or shard is not None
                or settings.ml_relax_enabled):
            return False
        from cedar_tpu.ops import pallas_lines2
        sh = x.shape if axis == "x" else (x.shape[1], x.shape[0])
        per = periodic if axis == "x" else (periodic[1], periodic[0])
        return pallas_lines2.supported(sh, x.dtype, kind, per)

    def lx(x):
        if _pl_lines("x"):
            from cedar_tpu.ops import pallas_lines2
            return pallas_lines2.line_relax_x(lev.so, x, b, kind, updown)
        return line_relax_x(lev.so, x, b, lev.sor_x, kind, updown,
                            periodic, shard)

    def ly(x):
        if _pl_lines("y"):
            from cedar_tpu.ops import pallas_lines2
            return pallas_lines2.line_relax_y(lev.so, x, b, kind, updown)
        return line_relax_y(lev.so, x, b, lev.sor_y, kind, updown,
                            periodic, shard)

    if rt == RelaxType.line_x:
        return lx(x)
    if rt == RelaxType.line_y:
        return ly(x)
    if rt == RelaxType.line_xy:
        if (settings.kernel_backend == "pallas" and shard is None
                and not settings.ml_relax_enabled):
            from cedar_tpu.ops import pallas_lines2, pallas_planes2
            if (pallas_planes2.supported(x.shape, x.dtype, kind, periodic)
                    and pallas_lines2.supported(x.shape, x.dtype, kind,
                                                periodic)):
                # under vmap (plane relax) the whole smooth runs as ONE
                # VMEM-resident kernel over plane-batch tiles; unbatched
                # it composes the per-axis fused kernels
                return pallas_planes2.line_xy_smooth(lev.so, x, b, kind,
                                                     updown)
        if updown == "down":
            return ly(lx(x))
        return lx(ly(x))
    raise ValueError(f"invalid 2D relaxation: {rt}")


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
    kinds = [StencilKind.nine_pt] * len(inner)
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
    """Whether the fine level can run the lane-parity-split resident
    cycle (pallas2_split): serial, V-cycle, point relaxation with at
    least one pre- and post-sweep, split stencil + transfer workspaces
    present (their setup already gated on backend/shape/periodicity)."""
    return (
        constraints is None
        and settings.cycle.value == "v"
        and settings.relaxation == RelaxType.point
        and settings.nrelax_pre >= 1
        and settings.nrelax_post >= 1
        and len(levels) >= 2
        and levels[0].so2 is not None
        and levels[0].rec2 is not None
        and levels[1].cip is not None
    )


def _split_ok_at(levels, lvl) -> bool:
    """Level ``lvl`` can run split-resident: split stencil present (setup
    gated on backend/shape/relaxation) and its coarse level has the
    transfer workspace."""
    return (
        lvl < len(levels) - 1
        and levels[lvl].so2 is not None
        and levels[lvl].rec2 is not None
        and levels[lvl + 1].cip is not None
    )


def ncycle_split(
    levels,
    kinds,
    x2: jnp.ndarray,
    b2: jnp.ndarray,
    settings: MLSettings,
    periodic=(False, False),
    fuse_final_residual: bool = False,
    lvl: int = 0,
):
    """One V-cycle with the top level(s) resident in the lane-parity-split
    layout (2, nxp, W): the fused pre-sweep residual feeds restrict with
    no lane-split pass (and, when a post-sweep exists, is never written
    to HBM at all — interp_sweep_split recomputes it in-VMEM),
    interpolation merges in-kernel onto split q, and (optionally) the
    top level's last post-sweep fuses the convergence-check residual
    NORM — zero XLA layout or residual passes on split levels.  Recurses
    into the next level split-resident too when its workspaces exist
    (kernels.split-levels); deeper levels run the dense ncycle.

    With ``fuse_final_residual`` returns ``(x2, partials)`` where
    ``partials`` are per-block partial sums of res² (the convergence
    norm is ``sqrt(sum(partials))``)."""
    from cedar_tpu.ops import pallas2_split as ps
    from cedar_tpu.ops import pallas_transfer2 as pt

    lev, kind = levels[lvl], kinds[lvl]
    with scope("relaxation"):
        for _ in range(settings.nrelax_pre - 1):
            x2 = ps.point_relax_split(lev.so2, x2, b2, kind, "down")
    coarse = levels[lvl + 1]
    cshape = coarse.so.shape[1:]
    # fused final pre-sweep + residual + restriction: the coarse rhs is
    # formed from the residual while it is still in VMEM; the residual
    # itself is written back only when interp_add needs it from HBM
    # (no post-sweep to recompute it in)
    with scope("relaxation-residual-restrict-fused"):
        x2, res2, cb = pt.sweep_restrict_split(
            lev.so2, x2, b2, coarse.cip, kind, "down", cshape,
            emit_res=settings.nrelax_post < 1,
        )

    if lvl + 1 == len(levels) - 1:
        with scope("coarse-solve"):
            if coarse.inner is not None:
                cx = _coarse_solve_inner(coarse, cb, settings, periodic)
            else:
                cx = cg.solve_cg(coarse.ainv, cb)
    elif _split_ok_at(levels, lvl + 1):
        nxp, W, _ = ps.split_dims(*cshape)
        cb2 = ps.lane_split(cb, nxp, W)
        cx2, _ = ncycle_split(levels, kinds, jnp.zeros_like(cb2), cb2,
                              settings, periodic, False, lvl + 1)
        cx = ps.lane_merge(cx2, *cshape)
    else:
        cx = ncycle(levels, kinds, lvl + 1, jnp.zeros_like(cb), cb,
                    settings, periodic)

    post = "up" if settings.relax_symmetric else "down"
    if settings.nrelax_post >= 1:
        # fused interp_add + first post-sweep (+ the convergence residual
        # NORM when that sweep is the last): the interpolated iterate
        # never leaves VMEM, the 1/diag stream and the pre-sweep residual
        # are recomputed in-kernel
        fuse_here = fuse_final_residual and settings.nrelax_post == 1
        with scope("interp-add-relax-fused"):
            out = pt.interp_sweep_split(
                coarse.cip, cx, lev.so2, b2, x2, kind, post,
                fuse_norm=fuse_here,
            )
        if fuse_here:
            return out
        x2 = out
        n_plain = (settings.nrelax_post - 1
                   - (1 if fuse_final_residual else 0))
        with scope("relaxation"):
            for _ in range(n_plain):
                x2 = ps.point_relax_split(lev.so2, x2, b2, kind, post)
        if fuse_final_residual:
            with scope("relaxation-residual-fused"):
                return ps.point_relax_split(
                    lev.so2, x2, b2, kind, post, fuse_norm=True
                )
        return x2, None

    with scope("interp-add"):
        x2 = pt.interp_add_split(coarse.cip, lev.rec2, cx, res2, x2)
    return x2, None


def fuse_final_ok(levels, kinds, shape, dtype, settings: MLSettings,
                  periodic, constraints) -> bool:
    """Whether the top level's last post-sweep can fuse the convergence
    residual (Pallas fused sweep with ``fuse_residual``): V-cycle, point
    relaxation with a post-sweep, Pallas-supported fine level."""
    shard = constraints[0] if constraints is not None else None
    return (
        settings.cycle.value == "v"
        and settings.relaxation == RelaxType.point
        and settings.nrelax_post >= 1
        and len(levels) >= 2
        and _use_pallas(settings, kinds[0], shape, dtype, periodic, shard)
    )


def _line_fused_ok(settings, kind, x, periodic, shard) -> bool:
    """Whether line-xy smoothing takes the batched whole-smooth kernel
    with fused multi-sweep + residual (the embedded plane-relaxation hot
    path — matches _smooth's line-xy Pallas gating)."""
    if (settings.relaxation != RelaxType.line_xy
            or settings.kernel_backend != "pallas"
            or shard is not None or settings.ml_relax_enabled
            or any(periodic)):
        return False
    from cedar_tpu.ops import pallas_lines2, pallas_planes2

    return (pallas_planes2.supported(x.shape, x.dtype, kind, periodic)
            and pallas_lines2.supported(x.shape, x.dtype, kind, periodic))


def ncycle(
    levels,
    kinds,
    lvl: int,
    x: jnp.ndarray,
    b: jnp.ndarray,
    settings: MLSettings,
    periodic=(False, False),
    n: int = 1,
    constraints=None,
    fuse_final_residual: bool = False,
):
    """Recursive n-cycle (n=1: V, n=2: W).  Reference: vcycle.h:57-115.

    With ``fuse_final_residual`` (top level only; caller checks
    :func:`fuse_final_ok`), the last post-sweep also emits the residual
    in the same HBM pass and the return value is ``(x, res)`` — the solve
    loop's convergence check then costs no extra pass."""
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
                                   fuse_residual=True, periodic=periodic)
    elif (
        settings.nrelax_pre >= 1
        and _line_fused_ok(settings, kind, x, periodic, shard)
    ):
        # line-xy: ALL pre-smooths + the residual in one whole-smooth
        # pass (under vmap: one VMEM-resident kernel per plane batch)
        from cedar_tpu.ops import pallas_planes2

        with scope("relaxation-residual-fused"):
            x, res = pallas_planes2.line_xy_nsmooth_res(
                lev.so, x, b, kind, "down", settings.nrelax_pre)
    else:
        with scope("relaxation"):
            x = _nsmooth(lev, kind, x, b, settings, "down", periodic,
                         settings.nrelax_pre, shard)
        with scope("residual"):
            res = residual(lev.so, x, b, kind, periodic)
    coarse = levels[lvl + 1]
    # Pallas transfer kernels: one shared lane-split of the residual feeds
    # both restrict and interp_add (in-kernel lane reshapes are unsupported)
    use_pt = (
        coarse.cip is not None and lev.rec2 is not None and shard is None
    )
    if use_pt:
        from cedar_tpu.ops import pallas_transfer2 as pt

        res2 = pt.lane_split_res(res)
        with scope("restrict"):
            cb = pt.restrict(coarse.cip, res2, coarse.so.shape[1:])
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
        if use_pt:
            x = pt.interp_add(coarse.cip, lev.rec2, cx, res2, x)
        else:
            x = interp_add(coarse.ci, lev.so, cx, res, x, periodic)
    if constraints is not None:
        x = jax.lax.with_sharding_constraint(x, constraints[lvl])

    # nonsymmetric relaxation (solver.relax-symmetric false) keeps the
    # forward sweep order for post-smoothing (reference: IRELAX_SYM
    # branches, BMG2_SymStd_relax_GS.f90:78-87)
    post = "up" if settings.relax_symmetric else "down"
    if fuse_final_residual:
        with scope("relaxation"):
            x = _nsmooth(lev, kind, x, b, settings, post, periodic,
                         settings.nrelax_post - 1, shard)
        with scope("relaxation-residual-fused"):
            return _pallas_relax(lev, kind, x, b, post, shard,
                                 fuse_residual=True, periodic=periodic)
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
    periodic=(False, False),
    constraints=None,
):
    """Full multigrid cycle (reference: fcycle.h:49-84).  Returns x.

    Routed through the fast kernels where the workspaces exist: the
    initial b-restriction chain and the first interpolation take the
    Pallas transfer kernels, and the per-level correction V-cycle runs
    split-resident on split-capable levels."""
    lev = levels[lvl]
    if lvl == len(levels) - 1:
        if lev.inner is not None:
            return _coarse_solve_inner(lev, b, settings, periodic)
        return cg.solve_cg(lev.ainv, b)
    coarse = levels[lvl + 1]
    use_pt = (
        coarse.cip is not None and lev.rec2 is not None
        and constraints is None
    )
    if use_pt:
        from cedar_tpu.ops import pallas_transfer2 as pt

        b2 = pt.lane_split_res(b)
        cb = pt.restrict(coarse.cip, b2, coarse.so.shape[1:])
    else:
        cb = restrict(coarse.ci, b, periodic)
    if constraints is not None:
        cb = jax.lax.with_sharding_constraint(cb, constraints[lvl + 1])
    cx = fmg_cycle(levels, kinds, lvl + 1, cb, settings, periodic,
                   constraints)
    split_here = (
        constraints is None and _split_ok_at(levels, lvl)
        and settings.relaxation == RelaxType.point
        and settings.nrelax_pre >= 1 and settings.nrelax_post >= 1
    )
    if split_here:
        from cedar_tpu.ops import pallas2_split as ps
        from cedar_tpu.ops import pallas_transfer2 as pt

        # level entry: x2 = P cx directly in split layout — the residual
        # is exactly zero here, so the full interp_add's res/rec/q
        # streams (measured 1.49 ms at 4096² vs ~0.45 of useful traffic)
        # and the lane-split entry pass are skipped
        nx, ny = b.shape
        nxp, W, _ = ps.split_dims(nx, ny)
        x2 = pt.interp_split_nores(coarse.cip, cx, nxp, W)
        x2, _ = ncycle_split(levels, kinds, x2,
                             ps.lane_split(b, nxp, W), settings, periodic,
                             lvl=lvl)
        return ps.lane_merge(x2, nx, ny)
    zero = jnp.zeros_like(b)
    if use_pt:
        from cedar_tpu.ops import pallas_transfer2 as pt

        # zero residual: the res/diag correction vanishes exactly
        x = pt.interp_add(coarse.cip, lev.rec2, cx, pt.lane_split_res(zero),
                          zero)
    else:
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
        # (solver2._solve_impl) instead keeps q split-resident across
        # iterations and calls ncycle_split directly
        from cedar_tpu.ops import pallas2_split as ps

        nx, ny = b.shape
        nxp, W, _ = ps.split_dims(nx, ny)
        x2, _ = ncycle_split(
            levels, kinds, ps.lane_split(x, nxp, W),
            ps.lane_split(b, nxp, W), settings, periodic,
        )
        return ps.lane_merge(x2, nx, ny)
    return ncycle(levels, kinds, 0, x, b, settings, periodic, 1,
                  constraints)

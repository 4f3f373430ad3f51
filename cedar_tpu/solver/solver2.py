"""2D multilevel BoxMG solver.

Rebuilds the reference's `cdr2::solver<fsten>` + `multilevel` driver
(include/cedar/2d/solver.h:21-122, include/cedar/multilevel.h:26-318) as two
jitted pure functions over a static level pytree:

* **setup** — per level: operator-induced interpolation, Galerkin coarse
  operator, relaxation workspace; coarsest: dense inverse
  (multilevel.h:243-265).  One jit, runs entirely on device.
* **solve** — residual-norm-controlled cycle iteration
  (multilevel.h:278-298) as a `lax.while_loop`; the returned history
  reproduces the reference's per-iteration "relative l2 norm" lines.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from cedar_tpu.config import Config
from cedar_tpu.core.types import StencilKind
from cedar_tpu.ops import cg
from cedar_tpu.ops.galerkin2 import coarsen_op
from cedar_tpu.ops.interp2 import setup_interp
from cedar_tpu.ops.lines2 import setup_lines, setup_lines_spike
from cedar_tpu.ops.relax2 import setup_recip
from cedar_tpu.ops.stencil2 import residual
from cedar_tpu import schema
from cedar_tpu.settings import CGType, MLSettings, RelaxType
from cedar_tpu.solver.cycle2 import run_cycle
from cedar_tpu.solver.level import Level
from cedar_tpu.utils import log
from cedar_tpu.utils.timing import TimeLog


def compute_num_levels(nx: int, ny: int, min_coarse: int) -> int:
    """Halve until below min_coarse (reference: 2d/solver.h:57-73)."""
    ng = 0
    while True:
        ng += 1
        nxc = (nx - 1) // (1 << ng) + 1
        nyc = (ny - 1) // (1 << ng) + 1
        if min(nxc, nyc) < min_coarse:
            return ng


def level_shapes(nx: int, ny: int, nlevels: int) -> list[tuple[int, int]]:
    """Per-level interior shapes, nxc = (nx-1)/2 + 1 (2d/solver.h:75-116)."""
    shapes = [(nx, ny)]
    for _ in range(nlevels - 1):
        nx = (nx - 1) // 2 + 1
        ny = (ny - 1) // 2 + 1
        shapes.append((nx, ny))
    return shapes


def _needs(settings: MLSettings):
    rt = settings.relaxation
    point = rt == RelaxType.point
    lx = rt in (RelaxType.line_x, RelaxType.line_xy)
    ly = rt in (RelaxType.line_y, RelaxType.line_xy)
    return point, lx, ly


# Module-level jitted setup pieces: one compile per (shape, kind) across the
# whole process (see solver3 for rationale).
_setup_interp_j = jax.jit(setup_interp, static_argnames=("kind", "periodic"))
_coarsen_j = jax.jit(coarsen_op, static_argnames=("kind", "periodic"))
_recip_j = jax.jit(setup_recip)
_lines_j = jax.jit(setup_lines, static_argnames=("kind", "axis"))
_lines_spike_j = jax.jit(
    setup_lines_spike, static_argnames=("kind", "axis")
)
_cg_j = jax.jit(
    cg.setup_cg_lu, static_argnames=("kind", "periodic", "indefinite")
)


def _is_multidev(a) -> bool:
    try:
        return len(a.sharding.device_set) > 1
    except Exception:       # tracers (vmapped plane setup) have no
        return False        # committed sharding -> treat as single-device


def setup_level_workspace(so, kind, settings, periodic):
    point, lx, ly = _needs(settings)
    recip = _recip_j(so) if point else None

    def sor(axis, n_line, per_line):
        # fused Pallas zebra sweeps are setup-free (factored on the fly):
        # skip the workspace entirely when that path will run
        if (settings.kernel_backend == "pallas"
                and not settings.ml_relax_enabled
                and not _is_multidev(so)):
            from cedar_tpu.ops import pallas_lines2

            shape = (so.shape[1], so.shape[2])
            per = tuple(periodic)
            if axis == "y":
                shape = (shape[1], shape[0])
                per = (per[1], per[0])
            if pallas_lines2.supported(shape, so.dtype, kind, per):
                return None
        # long serial lines: cached interface-reduction (SPIKE) factors —
        # one operand pass per solve instead of PCR's log2(n) passes.
        # Distributed levels keep the LDLᵀ array (the line solves run
        # PCR inside shard_map there; see lines2._local_solve).
        # solver.ml-relax.enabled forces the log-depth (PCR) algorithm —
        # the reference's "n-level" line relax (ml_relax.h) analogue.
        if (
            n_line >= 16
            and not per_line
            and not _is_multidev(so)
            and not settings.ml_relax_enabled
        ):
            # threshold 16 (was 64): sequential Thomas at line length 63
            # is 126 scan steps vs SPIKE's ~17 — on TPU the step LATENCY
            # dominates, and the vmapped plane hierarchies hit 63/31-long
            # lines on every embedded level
            return _lines_spike_j(so, kind=kind, axis=axis)
        return _lines_j(so, kind=kind, axis=axis)

    sor_x = sor("x", so.shape[1], periodic[0]) if lx else None
    sor_y = sor("y", so.shape[2], periodic[1]) if ly else None
    return recip, sor_x, sor_y


def setup_hierarchy(
    so_fine: jnp.ndarray,
    fine_kind: StencilKind,
    nlevels: int,
    settings: MLSettings,
    periodic=(False, False),
    indefinite: bool = False,
):
    """Build the full level hierarchy (reference: multilevel.h:243-265)."""
    sos = [so_fine]
    kinds = [fine_kind]
    cis = [None]
    so, kind = so_fine, fine_kind
    for _ in range(nlevels - 1):
        ci = _setup_interp_j(so, kind=kind, periodic=periodic)
        so = _coarsen_j(ci, so, kind=kind, periodic=periodic)
        kind = StencilKind.nine_pt
        sos.append(so)
        kinds.append(kind)
        cis.append(ci)

    # Pallas transfer-kernel workspace: setup-padded CI (on the coarse
    # level, keyed to the FINER level's dims) + lane-split 1/diag
    use_pt = (
        settings.kernel_backend == "pallas"
        and not any(periodic)
        and so_fine.ndim == 3
    )

    def _pt_fields(lvl):
        """cip: padded copy of this level's ci (which interpolates lvl ->
        lvl-1, so it pads to level lvl-1's FINE dims); rec2: this level's
        lane-split reciprocal diagonal."""
        from cedar_tpu.ops import pallas_transfer2 as pt

        fine_ok = (
            lvl >= 1
            and use_pt
            and pt.supported(sos[lvl - 1].shape[1:], sos[lvl - 1].dtype)
        )
        cip = (
            pt.pad_ci(cis[lvl], *sos[lvl - 1].shape[1:]) if fine_ok else None
        )
        own_ok = use_pt and pt.supported(sos[lvl].shape[1:], sos[lvl].dtype)
        rec2 = pt.setup_rec2(sos[lvl]) if own_ok else None
        return cip, rec2

    # lane-parity-split stencil for the split-resident cycle
    # (pallas2_split): the top ``split_levels`` levels run their sweeps
    # and transfers in split layout; deeper levels stay dense
    def _so2_field(lvl):
        from cedar_tpu.ops import pallas2_split as ps

        if (
            lvl >= max(getattr(settings, "split_levels", 1), 1)
            or lvl >= nlevels - 1
            or not use_pt
            or not settings.fine_split
            or settings.relaxation != RelaxType.point
            or not ps.supported(sos[lvl].shape[1:], sos[lvl].dtype)
            or _is_multidev(sos[lvl])
        ):
            return None
        nxp, W, _ = ps.split_dims(*sos[lvl].shape[1:])
        return ps.split_so(sos[lvl], kinds[lvl], nxp, W)

    levels = []
    for lvl in range(nlevels):
        if lvl < nlevels - 1:
            recip, sor_x, sor_y = setup_level_workspace(
                sos[lvl], kinds[lvl], settings, periodic
            )
            cip, rec2 = _pt_fields(lvl)
            levels.append(
                Level(so=sos[lvl], recip=recip, sor_x=sor_x, sor_y=sor_y,
                      ci=cis[lvl], cip=cip, rec2=rec2, so2=_so2_field(lvl))
            )
        else:
            if settings.coarse_solver != CGType.lu and nlevels > 1:
                # cg-solver "cedar"/"redist": an inner multigrid solver on
                # the coarsest grid, configured by cg-config (reference:
                # setup_cg_solve, 2d/mpi/solver.h:97-139)
                ist = settings.cg_settings
                nx_c, ny_c = sos[lvl].shape[1], sos[lvl].shape[2]
                nl_in = compute_num_levels(nx_c, ny_c, ist.min_coarse)
                if ist.num_levels > 0:
                    nl_in = min(nl_in, ist.num_levels)
                inner = setup_hierarchy(
                    sos[lvl], StencilKind.nine_pt, nl_in, ist,
                    periodic, indefinite,
                )
                cip, _ = _pt_fields(lvl)
                levels.append(Level(so=sos[lvl], ci=cis[lvl], inner=inner,
                                    cip=cip))
            else:
                # coarsest level: direct solve (no relaxation workspace,
                # reference: multilevel.h:258-263 loops to num_levels-1 only)
                ainv = _cg_j(
                    sos[lvl], kind=kinds[lvl], periodic=periodic,
                    indefinite=indefinite,
                )
                cip, _ = _pt_fields(lvl)
                levels.append(Level(so=sos[lvl], ci=cis[lvl], ainv=ainv,
                                    cip=cip))
    return tuple(levels)


def _l2(r):
    return jnp.sqrt(jnp.sum(r * r))


class Solver2:
    """2D BoxMG solver over interior-only JAX arrays.

    Parameters
    ----------
    so : (ndir, nx, ny) stencil operator (FivePt: [O,W,S]; NinePt adds SW,NW)
    kind : StencilKind of the fine operator
    conf : Config | dict | None — Cedar-compatible configuration
    """

    def __init__(
        self,
        so: jnp.ndarray,
        kind: StencilKind = StencilKind.five_pt,
        conf: Config | dict | None = None,
    ):
        if not isinstance(conf, Config):
            conf = Config(conf)
        schema.validate(conf)
        self.conf = conf
        self.settings = MLSettings.from_config(conf)
        log.set_enabled(conf.get("log", ["status", "error"]))
        self.kind = kind
        kb = conf.get("kernels.backend", "auto")
        if kb == "auto":
            dd = jax.config.jax_default_device
            on_tpu = (
                dd.platform == "tpu"
                if dd is not None
                else jax.default_backend() == "tpu"
            )
            kb = "pallas" if on_tpu else "xla"
        self.settings.kernel_backend = kb
        # fine-level split-resident cycle: on wherever the Pallas sweeps
        # run (validated bit-identical vs the XLA backend on v5e; the
        # further shape/config gates live in cycle2.fine_split_ok)
        self.settings.fine_split = bool(conf.get("kernels.fine-split",
                                                 kb == "pallas"))
        # measured plateau at depth 4 on v5e (4096^2: 3.71/3.38/3.21/3.16
        # ms for 1/2/3/4; 6 ≈ 4) — deeper levels fail ps.supported and
        # fall back to dense automatically
        self.settings.split_levels = int(conf.get("kernels.split-levels", 4))
        per = conf.get("grid.periodic", [False, False])
        self.periodic = (bool(per[0]), bool(per[1]))
        self.indefinite = not conf.get("solver.definite", True)

        nx, ny = so.shape[1], so.shape[2]
        nlevels = compute_num_levels(nx, ny, self.settings.min_coarse)
        if self.settings.num_levels > 0:
            if self.settings.num_levels > nlevels:
                raise ValueError("too many levels specified")
            nlevels = self.settings.num_levels
        self.nlevels = nlevels
        self.shapes = level_shapes(nx, ny, nlevels)
        self.kinds = [kind] + [StencilKind.nine_pt] * (nlevels - 1)
        log.debug(f"Using a {nlevels} level hierarchy")

        self.timelog = TimeLog()
        self.timelog.begin("setup")
        self.levels = setup_hierarchy(
            so,
            fine_kind=kind,
            nlevels=nlevels,
            settings=self.settings,
            periodic=self.periodic,
            indefinite=self.indefinite,
        )

        self.timelog.end("setup", force=self.levels)
        self.constraints = None  # distributed solvers set per-level shardings
        self._solve_jit = jax.jit(self._solve_impl)
        self._cycle_jit = jax.jit(self._cycle_impl)

    # -- jitted bodies -------------------------------------------------------
    def _cycle_impl(self, levels, x, b):
        return run_cycle(
            levels, self.kinds, x, b, self.settings, self.periodic,
            self.constraints,
        )

    def _solve_impl(self, levels, b, x0):
        settings = self.settings
        fine = levels[0]
        r0 = residual(fine.so, x0, b, self.kinds[0], self.periodic)
        # floor protects the b = 0 (already-converged) edge case: the rel
        # history divides by res0 (tiny = smallest normal of the dtype)
        res0 = jnp.maximum(_l2(r0), jnp.finfo(b.dtype).tiny)
        maxiter = settings.maxiter
        hist0 = jnp.full((maxiter,), jnp.nan, b.dtype)
        rel0 = jnp.asarray(jnp.inf, b.dtype)

        from cedar_tpu.solver import cycle2

        if cycle2.fine_split_ok(levels, settings, self.constraints):
            # fine level split-resident across the WHOLE solve: one
            # lane-split of b and x0 going in, one merge coming out, and
            # the last post-sweep of each cycle fuses the convergence
            # residual — zero per-iteration layout or residual passes
            from cedar_tpu.ops import pallas2_split as ps

            nx, ny = b.shape
            nxp, W, _ = ps.split_dims(nx, ny)
            b2 = ps.lane_split(b, nxp, W)
            x20 = ps.lane_split(x0, nxp, W)

            def cond_s(carry):
                i, x2, rel, hist = carry
                return (i < maxiter) & (rel >= settings.tol)

            def body_s(carry):
                i, x2, rel, hist = carry
                x2, normsq = cycle2.ncycle_split(
                    levels, self.kinds, x2, b2, settings, self.periodic,
                    fuse_final_residual=True,
                )
                # normsq: per-block partial sums of res² emitted by the
                # last post-sweep (the residual never touches HBM)
                rel = jnp.sqrt(jnp.sum(normsq)) / res0
                hist = hist.at[i].set(rel)
                return i + 1, x2, rel, hist

            iters, x2, rel, hist = jax.lax.while_loop(
                cond_s, body_s, (0, x20, rel0, hist0)
            )
            return ps.lane_merge(x2, nx, ny), hist, iters, res0

        # dense path: fuse the convergence residual into the last
        # post-sweep when the Pallas sweep can emit it (one HBM pass
        # fewer per iteration; same condition set as run_cycle's dispatch)
        fuse_conv = cycle2.fuse_final_ok(
            levels, self.kinds, b.shape, b.dtype, settings, self.periodic,
            self.constraints,
        )

        def cond(carry):
            i, x, rel, hist = carry
            return (i < maxiter) & (rel >= settings.tol)

        def body(carry):
            i, x, rel, hist = carry
            if fuse_conv:
                x, r = cycle2.ncycle(
                    levels, self.kinds, 0, x, b, settings, self.periodic,
                    1, self.constraints, fuse_final_residual=True,
                )
            else:
                x = run_cycle(
                    levels, self.kinds, x, b, settings, self.periodic,
                    self.constraints,
                )
                r = residual(fine.so, x, b, self.kinds[0], self.periodic)
            rel = _l2(r) / res0
            hist = hist.at[i].set(rel)
            return i + 1, x, rel, hist

        iters, x, rel, hist = jax.lax.while_loop(
            cond, body, (0, x0, rel0, hist0)
        )
        return x, hist, iters, res0

    # -- public API ------------------------------------------------------------
    def vcycle(self, x, b):
        """One cycle (reference: multilevel::vcycle)."""
        return self._cycle_jit(self.levels, x, b)

    def solve(self, b, x0=None):
        if x0 is None:
            x0 = jnp.zeros_like(b)
        self.timelog.begin("solve")
        x, hist, iters, res0 = self._solve_jit(self.levels, b, x0)
        iters = int(iters)
        self.timelog.end("solve", force=x)
        hist_host = [float(h) for h in hist[:iters]]
        log.info(f"Initial residual l2 norm: {float(res0):g}")
        for i, rel in enumerate(hist_host):
            log.status(f"Iteration {i} relative l2 norm: {rel:g}")
        self.history = hist_host
        self.res0 = float(res0)
        return x

    def save_timings(self, fname: str = "timings.json"):
        """Write the hierarchical timer report (reference: timings.json)."""
        self.timelog.save(fname)
        if log.enabled("timer"):
            import json as _json

            log.timer(_json.dumps(self.timelog.todict(), indent=2))

    @property
    def coarse_shape(self):
        return self.shapes[-1]

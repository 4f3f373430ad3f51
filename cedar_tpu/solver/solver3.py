"""3D multilevel BoxMG solver.

Rebuilds the reference's `cdr3::solver<fsten>` + `multilevel` driver
(include/cedar/3d/solver.h:17-130, include/cedar/multilevel.h:26-318) the
same way as the 2D solver (:mod:`cedar_tpu.solver.solver2`): jitted setup
over a static level pytree, `lax.while_loop` solve with the reference's
per-iteration relative-l2 logging.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp

from cedar_tpu.config import Config
from cedar_tpu.core.types import StencilKind
from cedar_tpu.ops import cg
from cedar_tpu.ops.galerkin3 import coarsen_op
from cedar_tpu.ops.interp3 import setup_interp
from cedar_tpu.ops.relax3 import setup_recip
from cedar_tpu.ops.stencil3 import residual
from cedar_tpu import schema
from cedar_tpu.settings import CGType, MLSettings, RelaxType
from cedar_tpu.solver.cycle3 import run_cycle
from cedar_tpu.solver.level import Level
from cedar_tpu.utils import log
from cedar_tpu.utils.timing import TimeLog


def compute_num_levels(nx: int, ny: int, nz: int, min_coarse: int) -> int:
    """Halve until below min_coarse (reference: 3d/solver.h:68-84)."""
    ng = 0
    while True:
        ng += 1
        nc = [(n - 1) // (1 << ng) + 1 for n in (nx, ny, nz)]
        if min(nc) < min_coarse:
            return ng


def level_shapes(nx: int, ny: int, nz: int, nlevels: int):
    shapes = [(nx, ny, nz)]
    for _ in range(nlevels - 1):
        nx = (nx - 1) // 2 + 1
        ny = (ny - 1) // 2 + 1
        nz = (nz - 1) // 2 + 1
        shapes.append((nx, ny, nz))
    return shapes


# Module-level jitted setup pieces: one compile per (shape, kind) across the
# whole process — levels, solvers and tests share the cache, and each small
# graph compiles far faster than one inlined whole-hierarchy graph.
_setup_interp_j = jax.jit(setup_interp, static_argnames=("kind", "periodic"))
_coarsen_j = jax.jit(coarsen_op, static_argnames=("kind", "periodic"))
_recip_j = jax.jit(setup_recip)
_cg_j = jax.jit(
    cg.setup_cg_lu, static_argnames=("kind", "periodic", "indefinite")
)


def setup_hierarchy(
    so_fine: jnp.ndarray,
    fine_kind: StencilKind,
    nlevels: int,
    settings: MLSettings,
    periodic=(False, False, False),
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
        kind = StencilKind.twenty_seven_pt
        sos.append(so)
        kinds.append(kind)
        cis.append(ci)

    point = settings.relaxation == RelaxType.point

    # Pallas restriction workspace: stacked per-coarse-point weight planes,
    # keyed to the FINER level's dims (interp_add stays on XLA — measured
    # slower as a Pallas kernel, see ops/pallas_transfer3.py)
    use_pt = settings.kernel_backend == "pallas" and not any(periodic)

    def _pw3_field(lvl):
        from cedar_tpu.ops import pallas_transfer3 as pt

        if lvl >= 1 and _split_ok(lvl - 1):
            return None          # the split path supersedes the dense
            # Pallas restriction on this level pair (pw4 carries the
            # weights; keeping both would double the weight HBM)
        fine_shape = sos[lvl - 1].shape[1:]
        if lvl >= 1 and use_pt and pt.supported(fine_shape,
                                                sos[lvl - 1].dtype):
            return pt.setup_pw3(cis[lvl], fine_shape)
        return None

    # octant-split workspaces for the split-resident cycle
    # (ops.pallas3_split): so4 on each split level, the stacked
    # per-coarse-point weight planes on its coarse level
    def _split_ok(lvl):
        from cedar_tpu.ops import pallas3_split as p3s
        from cedar_tpu.ops import pallas3_stream as p3st

        if (
            lvl >= max(getattr(settings, "split_levels", 2), 1)
            or lvl >= nlevels - 1
            or not use_pt
            or not getattr(settings, "fine_split", True)
            or not point
        ):
            return False
        shape = sos[lvl].shape[1:]
        if p3s.supported(shape, sos[lvl].dtype, kinds[lvl]):
            return True
        # full-width halo-window plans may not fit VMEM at large sizes
        # (256^3: kp = 16384) — the lane-paneled streaming kernels can
        # still run the level split-resident
        dims = p3s.split_dims3(*shape)
        if dims is None or jnp.dtype(sos[lvl].dtype) != jnp.float32:
            return False
        nxp, ny2, nz2, kp = dims
        if shape[0] < 32 or kp < 512:
            return False
        # the split-resident cycle also runs the standalone restriction
        # and pointwise-interp kernels — their (possibly lane-paneled)
        # plans must fit VMEM too, or this level must stay dense
        return (
            p3st.stream_supported((4, nxp, kp), kinds[lvl], nz2)
            and p3s._restrict_plan(nxp, kp, nz2) is not None
            and p3s._interp_plan(nxp, kp, nz2) is not None
        )

    def _so4_field(lvl):
        from cedar_tpu.ops import pallas3_split as p3s

        if not _split_ok(lvl):
            return None
        return p3s.split_so4(sos[lvl], kinds[lvl],
                             p3s.split_dims3(*sos[lvl].shape[1:]))

    def _pw4_field(lvl):
        from cedar_tpu.ops import pallas3_split as p3s

        if lvl < 1 or not _split_ok(lvl - 1):
            return None
        return p3s.setup_pw4(cis[lvl], sos[lvl - 1].shape[1:],
                             kinds[lvl - 1])

    levels = []
    for lvl in range(nlevels):
        if lvl < nlevels - 1:
            recip = _recip_j(sos[lvl]) if point else None
            levels.append(Level(so=sos[lvl], recip=recip, ci=cis[lvl],
                                cip=_pw3_field(lvl), so2=_so4_field(lvl),
                                pw4=_pw4_field(lvl)))
        else:
            if settings.coarse_solver != CGType.lu and nlevels > 1:
                # cg-solver "cedar"/"redist": inner multigrid on the
                # coarsest grid (reference: 3d/mpi/solver.h:174-200)
                ist = settings.cg_settings
                nc_ = sos[lvl].shape[1:]
                nl_in = compute_num_levels(*nc_, ist.min_coarse)
                if ist.num_levels > 0:
                    nl_in = min(nl_in, ist.num_levels)
                inner = setup_hierarchy(
                    sos[lvl], StencilKind.twenty_seven_pt, nl_in, ist,
                    periodic, indefinite,
                )
                levels.append(Level(so=sos[lvl], ci=cis[lvl], inner=inner,
                                    cip=_pw3_field(lvl),
                                    pw4=_pw4_field(lvl)))
            else:
                ainv = _cg_j(
                    sos[lvl], kind=kinds[lvl], periodic=periodic,
                    indefinite=indefinite,
                )
                levels.append(Level(so=sos[lvl], ci=cis[lvl], ainv=ainv,
                                    cip=_pw3_field(lvl),
                                    pw4=_pw4_field(lvl)))
    return tuple(levels)


def _l2(r):
    return jnp.sqrt(jnp.sum(r * r))


class Solver3:
    """3D BoxMG solver over interior-only JAX arrays.

    Parameters
    ----------
    so : (ndir, nx, ny, nz) stencil operator (SevenPt: [P,PW,PS,B];
        TwentySevenPt: all 14 planes)
    kind : StencilKind of the fine operator
    conf : Config | dict | None — Cedar-compatible configuration
    """

    # distributed subclasses pin the embedded plane solvers to XLA
    _dist_planes_xla = False

    def __init__(
        self,
        so: jnp.ndarray,
        kind: StencilKind = StencilKind.seven_pt,
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
        # octant-split resident cycle: on wherever the Pallas sweeps run
        # (further shape/config gates live in cycle3.fine_split_ok /
        # pallas3_split.supported)
        self.settings.fine_split = bool(conf.get("kernels.fine-split",
                                                 kb == "pallas"))
        self.settings.split_levels = int(conf.get("kernels.split-levels", 4))
        # embedded plane solvers inherit the resolved backend unless their
        # plane-config pins one: with the fused batched line-xy smooth
        # (ops/pallas_planes2.py) the pallas plane path measures 14.3 vs
        # 16.5 ms at 128^3 plane-xy (per-sweep vmapped Mosaic alone was
        # SLOWER, 24.9 ms — the whole-smooth kernel is what flips it).
        # DISTRIBUTED solvers (subclasses set _dist_planes_xla) keep XLA
        # embedded cycles: Mosaic under the SPMD partitioner is
        # unvalidated on real multi-chip hardware.
        ps = self.settings.plane_settings
        if ps is not None:
            pconf = conf.getconf("plane-config")
            explicit = (pconf is not None
                        and pconf.get("kernels.backend", None)
                        in ("xla", "pallas"))
            if not explicit:
                ps.kernel_backend = (
                    "xla" if self._dist_planes_xla else kb
                )
        per = conf.get("grid.periodic", [False, False, False])
        while len(per) < 3:
            per = list(per) + [False]
        self.periodic = tuple(bool(p) for p in per[:3])
        self.indefinite = not conf.get("solver.definite", True)

        nx, ny, nz = so.shape[1], so.shape[2], so.shape[3]
        nlevels = compute_num_levels(nx, ny, nz, self.settings.min_coarse)
        if self.settings.num_levels > 0:
            if self.settings.num_levels > nlevels:
                raise ValueError("too many levels specified")
            nlevels = self.settings.num_levels
        self.nlevels = nlevels
        self.shapes = level_shapes(nx, ny, nz, nlevels)
        self.kinds = [kind] + [StencilKind.twenty_seven_pt] * (nlevels - 1)
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
        if self.settings.relaxation in (
            RelaxType.plane_xy, RelaxType.plane_xz,
            RelaxType.plane_yz, RelaxType.plane_xyz,
        ):
            from cedar_tpu.ops.planes3 import setup_planes

            self.levels = setup_planes(
                self.levels, self.kinds, self.settings, self.conf
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

        from cedar_tpu.solver import cycle3

        if cycle3.fine_split_ok(levels, settings, self.constraints):
            # fine level octant-split resident across the WHOLE solve:
            # one split of b and x0 going in, one merge coming out, and
            # the last post-sweep of each cycle fuses the convergence
            # residual NORM — zero per-iteration layout or residual
            # passes (3D analogue of solver2's split loop)
            from cedar_tpu.ops import pallas3_split as p3s

            shape = b.shape
            dims = p3s.split_dims3(*shape)
            b4 = p3s.split4(b, dims)
            x40 = p3s.split4(x0, dims)

            def cond_s(carry):
                i, x4, rel, hist = carry
                return (i < maxiter) & (rel >= settings.tol)

            def body_s(carry):
                i, x4, rel, hist = carry
                x4, normsq = cycle3.ncycle_split(
                    levels, self.kinds, x4, b4, settings, self.periodic,
                    fuse_final_residual=True,
                )
                rel = jnp.sqrt(jnp.sum(normsq)) / res0
                hist = hist.at[i].set(rel)
                return i + 1, x4, rel, hist

            rel0_s = jnp.asarray(jnp.inf, b.dtype)
            iters, x4, rel, hist = jax.lax.while_loop(
                cond_s, body_s, (0, x40, rel0_s, hist0)
            )
            return p3s.merge4(x4, *shape), hist, iters, res0

        # fuse the convergence residual into the last post-sweep when the
        # Pallas sweep can emit it (one HBM pass fewer per iteration)
        fuse_conv = cycle3.fuse_final_ok(
            levels, self.kinds, b.shape, b.dtype, settings, self.periodic,
            self.constraints,
        )

        def cond(carry):
            i, x, rel, hist = carry
            return (i < maxiter) & (rel >= settings.tol)

        def body(carry):
            i, x, rel, hist = carry
            if fuse_conv:
                x, r = cycle3.ncycle(
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

        rel0 = jnp.asarray(jnp.inf, b.dtype)
        iters, x, rel, hist = jax.lax.while_loop(
            cond, body, (0, x0, rel0, hist0)
        )
        return x, hist, iters, res0

    # -- public API ----------------------------------------------------------
    def vcycle(self, x, b):
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

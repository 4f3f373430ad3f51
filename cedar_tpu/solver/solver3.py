"""3D multilevel BoxMG solver (reference: include/cedar/3d/solver.h).

Placeholder in the current build stage — the 3D kernel stack (8-color
relaxation, 3D operator-induced interpolation, generic 3D Galerkin product,
plane relaxation via vmapped 2D cycles) lands next; the class exists so the
package surface is stable.
"""

from __future__ import annotations


class Solver3:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            "Solver3 arrives with the 3D kernel stack; see cedar_tpu.ops.stencil3"
        )

"""Hierarchical solver timers (reference: include/cedar/util/time_log.h).

The reference wraps every cycle stage ("setup", "solve", "relaxation",
"residual", "restrict", "interp-add", "coarse-solve", "agglomerate", …) in
`timer_begin/end` pairs bucketed per MG level (`timer_down/up` follow the
cycle), aggregates min/max/ratio/avg over MPI ranks, and saves
`timings.json`.

On TPU the cycle executes as ONE fused XLA program, so per-stage wall
timers inside the cycle would only measure dispatch.  The equivalents:

* :class:`TimeLog` — host-side phase timers (setup / solve / per-iteration)
  with the reference's per-level bucket structure and `timings.json`
  output format.  Used around jitted calls, where host time is meaningful.
  A `redist`-style pause/play matches the reference's `timer_pause/play`
  around redistributed solves.
* :func:`scope` — `jax.named_scope` wrapper: stage names annotate the HLO,
  so device profiles (`jax.profiler.trace`) attribute device time to
  "relaxation"/"residual"/… exactly like the reference's labels.
* :func:`profile_trace` — context manager around `jax.profiler.trace` for
  a full device timeline.

Forcing semantics: on asynchronous runtimes the caller must synchronize
(`jax.block_until_ready` / scalar fetch) before `timer_end` for the number
to mean anything; `timer_end(..., force=x)` does this when given a value.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict

import jax


class TimeLog:
    """Label → elapsed seconds, bucketed per MG level (time_log.h:21-68)."""

    def __init__(self):
        self.lvl = 0
        self.stacks: list[tuple[str, float]] = []
        self.ltimes: dict[int, dict[str, float]] = defaultdict(
            lambda: defaultdict(float)
        )
        self.counts: dict[int, dict[str, int]] = defaultdict(
            lambda: defaultdict(int)
        )
        self._paused = False

    # -- reference API --------------------------------------------------------
    def begin(self, label: str) -> None:
        if self._paused:
            return
        self.stacks.append((label, time.perf_counter()))

    def end(self, label: str, force=None) -> None:
        if self._paused:
            return
        if force is not None:
            jax.block_until_ready(force)
        name, t0 = self.stacks.pop()
        assert name == label, f"timer mismatch: {name} != {label}"
        self.ltimes[self.lvl][label] += time.perf_counter() - t0
        self.counts[self.lvl][label] += 1

    def up(self) -> None:
        self.lvl -= 1

    def down(self) -> None:
        self.lvl += 1

    def pause(self) -> None:
        """reference: timer_pause around redistributed solves."""
        self._paused = True

    def play(self) -> None:
        self._paused = False

    @contextlib.contextmanager
    def timing(self, label: str, force_out=False):
        self.begin(label)
        out = []
        try:
            yield out
        finally:
            self.end(label, force=out[0] if (force_out and out) else None)

    # -- reporting -------------------------------------------------------------
    def todict(self) -> dict:
        """The reference's timings.json structure (single-rank: min=max=avg)."""
        out = {}
        for lvl in sorted(self.ltimes):
            blk = {}
            for label, t in sorted(self.ltimes[lvl].items()):
                blk[label] = {
                    "min": t, "max": t, "ratio": 1.0, "avg": t,
                    "count": self.counts[lvl][label],
                }
            out[f"level-{lvl}"] = blk
        return out

    def save(self, fname: str = "timings.json") -> None:
        with open(fname, "w") as f:
            json.dump(self.todict(), f, indent=2)


def scope(name: str):
    """Stage annotation for device profiles (e.g. 'relaxation')."""
    return jax.named_scope(name)


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a device profile of the enclosed block (view with
    tensorboard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

"""Observability utilities: per-stage wall-clock timers and profiler traces.

The reference's only observability is progress prints
(`/root/reference/interpolator.py:192-193`) and solver verbosity
(`physics.py:186`). Here every pipeline run can record stage timings
(:class:`StageTimings`) and wrap device work in a ``jax.profiler`` trace
(:func:`profiler_trace`) for TensorBoard-compatible timelines.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Optional


def enable_compilation_cache(path: str | None = None) -> None:
    """Point JAX's persistent compilation cache at ``path`` (default
    ``$JAX_COMPILATION_CACHE_DIR`` or ``~/.jax_cache``).

    Called by every CLI entry point: on TPU rigs where compilation goes
    through a remote compile service, a cold 256³ program costs minutes —
    the cache turns every later invocation (a new process per CLI run)
    into a disk load. Safe to call repeatedly."""
    import jax
    path = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_compilation_cache_dir", path)


class StageTimings:
    """Accumulates named stage durations; used by the pipeline drivers."""

    def __init__(self):
        self.stages: Dict[str, float] = {}
        self._order = []

    @contextlib.contextmanager
    def stage(self, name: str, verbose: bool = False):
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self.stages[name] = self.stages.get(name, 0.0) + dt
            if name not in self._order:
                self._order.append(name)
            if verbose:
                print(f"  [timing] {name}: {dt:.3f}s")

    def report(self) -> str:
        total = sum(self.stages.values())
        lines = ["--- Stage timings ---"]
        for name in self._order:
            dt = self.stages[name]
            lines.append(f"  {name:30s} {dt:8.3f}s ({dt / max(total, 1e-9):5.1%})")
        lines.append(f"  {'total':30s} {total:8.3f}s")
        return "\n".join(lines)


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """Wrap a block in a ``jax.profiler`` trace when ``log_dir`` is given
    (view with TensorBoard / xprof); no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax
    with jax.profiler.trace(log_dir):
        yield

"""Model/parameter summaries and phase profiling.

Counterpart of the reference's observability surface (SURVEY.md §5): gpflow
module summary tables logged per round (reference experiment.py:27-34) and the
per-phase wall-clock the TPU build adds, plus optional jax-profiler traces.
"""
from __future__ import annotations

import contextlib
import logging
import time
from typing import Optional

import jax
import numpy as np

from .trees import tree_map_with_path_names

logger = logging.getLogger(__name__)


def module_summary(tree, name: str = "model") -> str:
    """Tabulate a parameter pytree: path, shape, dtype, min/max/mean."""
    rows = []

    def collect(path, leaf):
        if leaf is None:
            return None
        arr = np.asarray(leaf)
        rows.append(
            (
                path,
                str(arr.shape),
                str(arr.dtype),
                f"{arr.min():+.3e}" if arr.size else "-",
                f"{arr.max():+.3e}" if arr.size else "-",
                f"{arr.mean():+.3e}" if arr.size else "-",
            )
        )
        return None

    tree_map_with_path_names(collect, tree)
    widths = [max(len(r[i]) for r in rows + [("path", "shape", "dtype", "min", "max", "mean")]) for i in range(6)]
    header = ("path", "shape", "dtype", "min", "max", "mean")
    lines = [
        f"{name} summary:",
        "  " + "  ".join(h.ljust(w) for h, w in zip(header, widths)),
    ]
    for r in rows:
        lines.append("  " + "  ".join(c.ljust(w) for c, w in zip(r, widths)))
    return "\n".join(lines)


def log_module_summary(tree, name: str = "model", log: Optional[logging.Logger] = None):
    (log or logger).info("\n%s", module_summary(tree, name))


class PhaseTimer:
    """Accumulates wall-clock per named phase; optionally emits profiler traces."""

    def __init__(self, trace_dir: Optional[str] = None):
        self.times = {}
        self.trace_dir = trace_dir

    @contextlib.contextmanager
    def phase(self, name: str):
        ctx = (
            jax.profiler.trace(self.trace_dir)
            if self.trace_dir
            else contextlib.nullcontext()
        )
        t0 = time.perf_counter()
        with ctx:
            yield
        self.times[name] = self.times.get(name, 0.0) + time.perf_counter() - t0

    def summary(self) -> str:
        return ", ".join(f"{k}={v:.2f}s" for k, v in self.times.items())

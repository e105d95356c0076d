"""Profiling / tracing hooks (the reference has none — SURVEY.md §5:
only wall-clock deltas in progress prints, train_test.py:311-317)."""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/dmlt_trace"):
    """jax.profiler trace context; view with TensorBoard or Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-step timing with correct async fencing.

    NOTE on this environment: the tunneled ``axon`` TPU backend does not
    fence on ``block_until_ready`` — only a host readback does (and costs a
    ~28 ms HTTP roundtrip).  ``fence`` therefore reads one scalar back; call
    it sparingly (e.g. once per N steps) and subtract ``roundtrip``.
    """

    def __init__(self):
        self.roundtrip = 0.0
        self._t0 = None
        self._steps = 0

    @staticmethod
    def fence(tree) -> float:
        import jax

        leaf = jax.tree_util.tree_leaves(tree)[0]
        return float(leaf.reshape(-1)[0])

    def calibrate(self, tree):
        self.fence(tree)
        t0 = time.perf_counter()
        self.fence(tree)
        self.roundtrip = time.perf_counter() - t0

    def start(self):
        self._t0 = time.perf_counter()
        self._steps = 0

    def count(self, n: int = 1):
        self._steps += n

    def stop(self, tree) -> float:
        """Returns seconds per step over the window."""
        self.fence(tree)
        dt = time.perf_counter() - self._t0 - self.roundtrip
        return dt / max(self._steps, 1)

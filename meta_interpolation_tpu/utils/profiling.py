"""Tracing / profiling hooks.

The reference has none (SURVEY.md §5 — wall-clock prints in legacy code
only). TPU-native observability:
  * :func:`trace` — context manager around ``jax.profiler`` emitting a
    TensorBoard-loadable trace (wire with ``--profile_dir``);
  * :class:`StepTimer` — marginal-timing step clock that is robust to
    async dispatch (block_until_ready can under-block through remote
    tunnels; see bench.py) by forcing a host fetch;
  * :func:`annotate` — named TraceAnnotation for kernel attribution.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Profile the enclosed block to ``log_dir`` (no-op when None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for trace attribution."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Per-step wall-clock with a sync point that defeats async dispatch."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        if result is not None:
            leaves = jax.tree.leaves(result)
            if leaves:
                _ = float(jnp.asarray(leaves[0]).ravel()[0])
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / max(1, len(self.times))


_LPIPS_PARAMS = None


def eval_lpips(pred, target):
    """LPIPS hook (reference utils.py:207-211, gated by --lpips).

    Jax AlexNet-LPIPS port (utils/lpips.py). Pretrained weights are
    loaded from the shared weights search path when present; otherwise a
    loud warning fires once and random-init features are used
    (structurally correct, not the published metric). NHWC [0,1] inputs;
    returns the batch-mean distance.
    """
    global _LPIPS_PARAMS
    from . import lpips as lpips_lib
    if _LPIPS_PARAMS is None:
        _LPIPS_PARAMS = lpips_lib.load_pretrained()
        if _LPIPS_PARAMS is None:
            _LPIPS_PARAMS = lpips_lib.init_params(jax.random.PRNGKey(0))
    return float(jnp.mean(lpips_lib.lpips(_LPIPS_PARAMS, pred, target)))

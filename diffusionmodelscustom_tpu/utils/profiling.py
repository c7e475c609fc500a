"""Profiling and observability utilities.

The reference's tracing story was tqdm bars + torchinfo summaries + CUDA
memory printouts (SURVEY.md section 5.1). First-class TPU equivalents:

* ``trace`` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace directory;
* ``StepTimer`` — per-step wall-clock EMA with steps/sec and samples/sec;
* ``model_summary`` — parameter-count table per module path (the role of
  torchinfo.summary / the hand-rolled counter at
  ddpm_DANRA_conditional_wValid.py:29-55);
* ``memory_stats`` — live/peak device-memory readout (the CUDA
  memory-probe equivalent, memory_examinations.py:1-109).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Iterator, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax_trace") -> Iterator[None]:
    """Profile the enclosed block: ``with trace('/tmp/tb'): step()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock EMA over train steps.

    >>> timer = StepTimer(batch_size=32)
    >>> with timer.step(): train_step(...)
    >>> timer.steps_per_sec
    """

    def __init__(self, batch_size: int = 1, ema: float = 0.9):
        self.batch_size = batch_size
        self.ema = ema
        self._avg: Optional[float] = None
        self.count = 0

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self._avg = dt if self._avg is None else self.ema * self._avg + (1 - self.ema) * dt
        self.count += 1

    @property
    def seconds_per_step(self) -> float:
        return self._avg or float("nan")

    @property
    def steps_per_sec(self) -> float:
        return 1.0 / self._avg if self._avg else float("nan")

    @property
    def samples_per_sec(self) -> float:
        return self.steps_per_sec * self.batch_size


def model_summary(params: Any, max_depth: int = 2) -> str:
    """Parameter-count table grouped by module path prefix."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    groups: Dict[str, int] = {}
    total = 0
    for path, leaf in flat:
        if not hasattr(leaf, "size"):
            continue
        keys = [getattr(p, "key", str(p)) for p in path][:max_depth]
        name = "/".join(str(k) for k in keys)
        groups[name] = groups.get(name, 0) + int(leaf.size)
        total += int(leaf.size)
    lines = [f"{'module':<48} {'params':>12}"]
    lines.append("-" * 61)
    for name in sorted(groups):
        lines.append(f"{name:<48} {groups[name]:>12,}")
    lines.append("-" * 61)
    lines.append(f"{'TOTAL':<48} {total:>12,}")
    return "\n".join(lines)


def count_params(params: Any) -> int:
    return int(
        sum(
            leaf.size
            for leaf in jax.tree_util.tree_leaves(params)
            if hasattr(leaf, "size")
        )
    )


def memory_stats() -> Dict[str, Any]:
    """Per-device live/peak memory (bytes) where the backend reports it."""
    out = {}
    for dev in jax.devices():
        try:
            stats = dev.memory_stats()
        except Exception:
            stats = None
        if stats:
            out[str(dev)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return out


__all__ = ["trace", "StepTimer", "model_summary", "count_params", "memory_stats"]

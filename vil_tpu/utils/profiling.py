"""Tracing / profiling utilities (SURVEY §5.1).

The reference exposes wall-clock meters + ``torch.cuda.max_memory_allocated``
per log line (engine.py:164,193) and static MACs hooks. TPU equivalents:

* ``trace(...)`` — a ``jax.profiler`` trace context writing a TensorBoard-
  compatible profile (op-level timeline, HBM usage);
* ``device_memory_stats()`` — live/peak HBM bytes for log lines;
* analytic FLOPs live in ``vil_tpu.ops.flops``.
"""
from __future__ import annotations

import contextlib
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile a region: ``with trace('/tmp/prof'): step(...)``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device: Optional[jax.Device] = None) -> dict:
    """{'bytes_in_use', 'peak_bytes_in_use', ...} — not all backends
    implement memory_stats; returns {} then."""
    device = device or jax.devices()[0]
    try:
        return dict(device.memory_stats() or {})
    except Exception:
        return {}


def peak_memory_mb(device: Optional[jax.Device] = None) -> float:
    stats = device_memory_stats(device)
    return stats.get("peak_bytes_in_use", 0) / 2**20


def annotate(name: str):
    """Named profiler region (shows up in the trace timeline)."""
    return jax.profiler.TraceAnnotation(name)

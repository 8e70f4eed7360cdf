"""Profiling / observability utilities.

The reference exposes per-run instrumentation (RTF, tokens/sec,
mx.get_peak_memory — SURVEY §5); this module keeps that contract on JAX and
adds device-trace capture (XProf/TensorBoard via jax.profiler), which the
reference has no equivalent for.

Usage:
    with profiling.trace("/tmp/jax-trace"):          # device timeline
        model.generate(...)

    with profiling.annotate("decoder"):              # named trace span
        ...

    gb = profiling.peak_memory_gb()                   # HBM high-water mark
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax

__all__ = ["trace", "annotate", "peak_memory_gb", "memory_stats"]


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False) -> Iterator[None]:
    """Capture a device trace into `log_dir` (open with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span that shows up on the device timeline inside a trace()."""
    return jax.profiler.TraceAnnotation(name)


def memory_stats(device: Optional[jax.Device] = None) -> dict:
    """Raw allocator stats for a device ({} when the backend lacks them —
    e.g. the CPU backend)."""
    device = device or jax.devices()[0]
    try:
        return device.memory_stats() or {}
    except Exception:
        return {}


def peak_memory_gb(device: Optional[jax.Device] = None) -> float:
    """Peak device-memory use in GB (reference: mx.get_peak_memory,
    kokoro.py:333). 0.0 where the backend exposes no stats."""
    stats = memory_stats(device)
    peak = stats.get("peak_bytes_in_use", 0)
    return round(peak / (1024**3), 3)

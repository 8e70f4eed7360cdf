"""Profiling utilities: trace capture, annotations, peak-memory reporting."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu import profiling
from mlx_audio_tpu.tts.models.base import GenerationResult


def test_peak_memory_gb_no_crash():
    gb = profiling.peak_memory_gb()
    assert isinstance(gb, float) and gb >= 0.0


def test_memory_stats_dict():
    assert isinstance(profiling.memory_stats(), dict)


def test_trace_capture(tmp_path):
    log_dir = str(tmp_path / "trace")
    with profiling.trace(log_dir):
        with profiling.annotate("matmul"):
            x = jnp.ones((64, 64))
            jax.block_until_ready(x @ x)
    # a trace directory with at least one event file must exist
    found = []
    for root, _dirs, files in os.walk(log_dir):
        found.extend(files)
    assert found, "no trace files written"


def test_generation_result_fills_peak_memory():
    r = GenerationResult(audio=np.zeros(10, np.float32), samples=10,
                         sample_rate=24000)
    assert r.peak_memory_usage >= 0.0
    r2 = GenerationResult(audio=np.zeros(10, np.float32), samples=10,
                          sample_rate=24000, peak_memory_usage=1.25)
    assert r2.peak_memory_usage == 1.25

"""mlx_audio_tpu — a TPU-native audio framework (JAX / XLA / Pallas / pjit).

A ground-up rebuild of the capabilities of the `mlx_audio` reference stack
(TTS / STT / speech-to-speech / VAD / neural codecs) designed for TPU:

- All device compute is functional JAX: models are pytrees, forwards are pure
  functions under `jax.jit`, AR decode uses static-shape KV caches and
  `lax.scan` / jitted step functions.
- Hot ops (STFT/ISTFT, mel, attention, quantized matmul) have Pallas TPU
  kernels with `jnp` reference fallbacks (see `mlx_audio_tpu.ops`).
- Multi-chip scaling goes through `jax.sharding.Mesh` + NamedSharding
  (see `mlx_audio_tpu.parallel`), not host-side process replication.

Public surface mirrors the reference package: `load_model`,
`mlx_audio_tpu.tts.generate`, `mlx_audio_tpu.stt.generate`,
`mlx_audio_tpu.server`, `mlx_audio_tpu.convert`.
"""

import os

os.environ.setdefault("TRANSFORMERS_NO_ADVISORY_WARNINGS", "1")


def _maybe_enable_compile_cache() -> None:
    """Opt-in persistent XLA compilation cache.

    Cold-start compile cost is the dominant serving-latency tax on TPU (a
    bucketed model compiles one executable per shape bucket). Setting
    ``MLX_AUDIO_TPU_COMPILE_CACHE=<dir>`` persists compiled executables
    across processes so restarted servers skip recompilation. Opt-in rather
    than default: remote-compile backends (axon tunnel) have shown hangs
    with the cache enabled, and multi-host jobs need a shared path policy.
    """
    cache_dir = os.environ.get("MLX_AUDIO_TPU_COMPILE_CACHE")
    if not cache_dir:
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


_maybe_enable_compile_cache()

from .version import __version__

__all__ = ["__version__"]

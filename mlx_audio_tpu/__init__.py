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

from .version import __version__

__all__ = ["__version__"]

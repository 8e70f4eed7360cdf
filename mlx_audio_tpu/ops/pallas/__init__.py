"""Pallas TPU kernels — the native layer replacing the reference's
hand-written Metal kernels (SURVEY §2.3). Each kernel has a lax reference
implementation in `mlx_audio_tpu.ops`; kernels are ON by default on TPU
(measured wins, see KERNEL_BENCH.md), disable with MLX_AUDIO_TPU_PALLAS=0
or `use_pallas(False)`. Off-TPU backends always use the lax fallbacks.
"""

import os

_ENABLED = os.environ.get("MLX_AUDIO_TPU_PALLAS", "1") == "1"


def use_pallas(enabled: bool = True):
    global _ENABLED
    _ENABLED = enabled


def pallas_enabled() -> bool:
    if not _ENABLED:
        return False
    import jax

    # Mosaic/TPU-only kernels (VMEM BlockSpecs): route ONLY on tpu-like
    # backends — a GPU backend must take the lax fallbacks
    return jax.default_backend() in ("tpu", "axon")


from .flash_attention import flash_attention
from .quant_matmul import quantized_matmul
from .relu2_attention import relu2_attention, relu2_attention_reference

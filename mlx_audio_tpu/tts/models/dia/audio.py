"""Dia delay-pattern codebook transforms (spec: reference tts/models/dia/
audio.py). Vectorized gathers, jit-friendly."""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np

__all__ = ["apply_audio_delay", "revert_audio_delay", "audio_to_codebook",
           "codebook_to_audio"]


def apply_audio_delay(codes, delay_pattern: List[int], bos_value: int,
                      pad_value: int):
    """codes (B, T, C) → delayed: out[t, c] = in[t - delay[c], c]; positions
    before the start become BOS, beyond the end become PAD."""
    B, T, C = codes.shape
    delay = jnp.asarray(delay_pattern)
    t_idx = jnp.arange(T)[:, None] - delay[None, :]  # (T, C)
    gather_t = jnp.clip(t_idx, 0, T - 1)
    out = jnp.take_along_axis(codes, gather_t[None].repeat(B, 0), axis=1)
    out = jnp.where(t_idx[None] < 0, bos_value, out)
    out = jnp.where(t_idx[None] >= T, pad_value, out)
    return out


def revert_audio_delay(codes, delay_pattern: List[int], pad_value: int,
                       total_len: int):
    """Inverse: out[t, c] = in[t + delay[c], c] (PAD beyond the end)."""
    B, T, C = codes.shape
    delay = jnp.asarray(delay_pattern)
    t_idx = jnp.arange(T)[:, None] + delay[None, :]
    gather_t = jnp.clip(t_idx, 0, T - 1)
    out = jnp.take_along_axis(codes, gather_t[None].repeat(B, 0), axis=1)
    out = jnp.where(t_idx[None] >= total_len, pad_value, out)
    return out


def audio_to_codebook(dac_model, audio, data_config):
    """Encode audio (B, 1, T) → delayed codes (B, T', C) with BOS prepended."""
    _, codes, _, _, _ = dac_model.encode(audio)
    codes = jnp.swapaxes(jnp.asarray(codes), 1, 2)  # (B, T', C)
    return apply_audio_delay(
        codes, data_config.delay_pattern, data_config.audio_bos_value,
        data_config.audio_pad_value,
    )


def codebook_to_audio(codes_TxC, dac_model, delay_pattern, B=1, T=None, C=9):
    """Revert delays, clip to the codebook range, DAC-decode → (T_samples,)."""
    codes = jnp.asarray(codes_TxC)[None]  # (1, T, C)
    total = codes.shape[1]
    reverted = revert_audio_delay(codes, delay_pattern, 0, total)
    max_delay = max(delay_pattern)
    if total > max_delay:
        reverted = reverted[:, : total - max_delay]
    reverted = jnp.clip(reverted, 0, 1023)
    wav = dac_model.decode_codes(jnp.swapaxes(reverted, 1, 2))  # (1, 1, T)
    return np.asarray(wav).reshape(-1)

"""Sesame/CSM audio watermarking round-trip tests.

Behavioral spec: reference tts/models/sesame/watermarking.py (embed a 5-byte
key; verify detects exact-key presence).
"""

import numpy as np
import pytest

from mlx_audio_tpu.tts.models.sesame.watermarking import (
    CSM_1B_GH_WATERMARK,
    load_watermarker,
    verify,
    watermark,
)


def _speechish(sr: int, dur: float, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    n = int(sr * dur)
    t = np.arange(n) / sr
    return (
        0.3 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 440 * t)
        + 0.1 * np.sin(2 * np.pi * 1300 * t)
        + 0.05 * rng.standard_normal(n)
    ).astype(np.float32)


@pytest.mark.parametrize("sr,dur", [(24000, 3.0), (44100, 2.0), (16000, 2.0)])
def test_watermark_roundtrip(sr, dur):
    wm = load_watermarker()
    x = _speechish(sr, dur)
    y = watermark(wm, x, sr, CSM_1B_GH_WATERMARK)
    assert y.shape == x.shape and y.dtype == np.float32
    # imperceptible: distortion well below signal
    snr = 10 * np.log10(np.mean(x**2) / (np.mean((y - x) ** 2) + 1e-12))
    assert snr > 20.0
    assert verify(wm, y, sr, CSM_1B_GH_WATERMARK)


def test_no_false_positive_on_clean_audio():
    wm = load_watermarker()
    x = _speechish(24000, 3.0, seed=1)
    assert not verify(wm, x, 24000, CSM_1B_GH_WATERMARK)
    noise = (0.2 * np.random.default_rng(2).standard_normal(48000)).astype(
        np.float32
    )
    assert not verify(wm, noise, 24000, CSM_1B_GH_WATERMARK)


def test_wrong_key_rejected():
    wm = load_watermarker()
    x = _speechish(24000, 3.0, seed=3)
    y = watermark(wm, x, 24000, CSM_1B_GH_WATERMARK)
    assert not verify(wm, y, 24000, [1, 2, 3, 4, 5])


def test_survives_additive_noise_and_short_clip():
    wm = load_watermarker()
    x = _speechish(24000, 1.0, seed=4)
    y = watermark(wm, x, 24000, CSM_1B_GH_WATERMARK)
    rng = np.random.default_rng(5)
    y = y + 0.003 * rng.standard_normal(len(y)).astype(np.float32)
    assert verify(wm, y, 24000, CSM_1B_GH_WATERMARK)

"""DSP golden-value tests vs torch.stft/istft and analytic identities."""

import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mlx_audio_tpu import dsp


def test_import_isolation():
    """dsp must not import model/tts/stt modules (reference contract)."""
    code = (
        "import sys; import mlx_audio_tpu.dsp; "
        "bad=[m for m in sys.modules if m.startswith('mlx_audio_tpu.') and "
        "any(s in m for s in ('tts','stt','codec','sts','vad','server'))]; "
        "assert not bad, bad"
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr.decode()


def test_windows_match_torch():
    for size in (256, 400):
        np.testing.assert_allclose(
            np.asarray(dsp.hanning(size)), torch.hann_window(size, periodic=False).numpy(), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(dsp.hamming(size)),
            torch.hamming_window(size, periodic=False).numpy(),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(dsp.blackman(size)),
            torch.blackman_window(size, periodic=False).numpy(),
            atol=1e-6,
        )


def test_stft_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(4000).astype(np.float32)
    n_fft, hop = 400, 160
    win = torch.hann_window(n_fft)
    ref = torch.stft(
        torch.from_numpy(x), n_fft, hop, window=win, center=True,
        pad_mode="reflect", return_complex=True,
    ).numpy()  # (freq, frames)
    ours = dsp.stft(jnp.asarray(x), n_fft, hop, window=jnp.asarray(win.numpy()))
    np.testing.assert_allclose(np.asarray(ours).T, ref, atol=1e-3, rtol=1e-4)


def test_istft_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(8000).astype(np.float32)
    n_fft, hop = 512, 128
    w = dsp.hanning(n_fft + 1)[:-1]
    spec = dsp.stft(jnp.asarray(x), n_fft, hop, window=w)
    y = dsp.istft(jnp.asarray(np.asarray(spec)).T, hop_length=hop, window=w,
                  normalized=True, length=len(x))
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-3)


def test_batch_istft_matches_torch():
    rng = np.random.default_rng(2)
    n_fft, hop, frames, batch = 256, 64, 30, 3
    spec = rng.standard_normal((batch, n_fft // 2 + 1, frames)) + 1j * rng.standard_normal(
        (batch, n_fft // 2 + 1, frames)
    )
    spec = spec.astype(np.complex64)
    win = torch.hann_window(n_fft)
    ref = torch.istft(
        torch.from_numpy(spec), n_fft, hop, window=win, center=True
    ).numpy()

    cache = dsp.BatchISTFT()
    ours = cache.istft(
        jnp.asarray(spec.real), jnp.asarray(spec.imag), n_fft, hop, n_fft,
        jnp.asarray(win.numpy()),
    )
    np.testing.assert_allclose(np.asarray(ours)[:, : ref.shape[1]], ref, atol=1e-3)


def test_mel_filters_properties():
    fb = np.asarray(dsp.mel_filters(16000, 400, 80, norm="slaney", mel_scale="slaney"))
    assert fb.shape == (80, 201)
    assert (fb >= 0).all()
    # each filter has nonzero support
    assert (fb.sum(axis=1) > 0).all()
    fb_htk = np.asarray(dsp.mel_filters(24000, 1024, 100))
    assert fb_htk.shape == (100, 513)


def test_log_mel_spectrogram_shape_and_range():
    x = jnp.asarray(np.sin(2 * np.pi * 440 * np.arange(16000) / 16000), jnp.float32)
    mel = dsp.log_mel_spectrogram(x, n_mels=80)
    assert mel.shape == (100, 80)
    m = np.asarray(mel)
    assert np.isfinite(m).all()
    # whisper normalization bounds: (log10 clip to max-8, then (x+4)/4)
    assert m.max() <= (np.log10(np.maximum(1e-10, 1e10)) + 4) / 4


def test_compute_deltas_matches_formula():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((4, 20)).astype(np.float32)
    d = np.asarray(dsp.compute_deltas_kaldi(jnp.asarray(x), win_length=5))
    # manual reference
    n = 2
    denom = float(n * (n + 1) * (2 * n + 1)) / 3.0
    pad = np.pad(x, [(0, 0), (n, n)], mode="edge")
    ref = np.zeros_like(x)
    for t in range(x.shape[1]):
        for k in range(-n, n + 1):
            ref[:, t] += k * pad[:, t + k + n]
    ref /= denom
    np.testing.assert_allclose(d, ref, atol=1e-5)


def test_kaldi_fbank_shapes_and_finiteness():
    rng = np.random.default_rng(4)
    x = rng.standard_normal(48000).astype(np.float32) * 0.1
    feats = dsp.compute_fbank_kaldi(jnp.asarray(x), dither=0.0)
    expected_frames = 1 + (48000 - 1920) // 384
    assert feats.shape == (expected_frames, 60)
    assert np.isfinite(np.asarray(feats)).all()


def test_kaldi_fbank_matches_torchaudio_formula():
    """Cross-check the mel bank construction against the Kaldi formulas."""
    bins, centers = dsp.get_mel_banks_kaldi(23, 512, 16000.0, 20.0, 0.0)
    b = np.asarray(bins)
    assert b.shape == (23, 256)
    assert (b >= 0).all() and b.max() <= 1.0 + 1e-6
    c = np.asarray(centers)
    assert (np.diff(c) > 0).all()


def test_stft_batched():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 4000)).astype(np.float32)
    s = dsp.stft(jnp.asarray(x), 400, 160)
    s0 = dsp.stft(jnp.asarray(x[0]), 400, 160)
    assert s.shape == (2,) + s0.shape
    np.testing.assert_allclose(np.asarray(s[0]), np.asarray(s0), atol=1e-4)


def test_stft_matmul_dft_matches_rfft():
    """The small-n_fft matmul-DFT path (dsp._DFT_MATMUL_MAX_NFFT) must be
    numerically interchangeable with jnp.fft.rfft (KERNEL_BENCH.md:
    max_err 1.4e-6 on chip at Precision.HIGHEST)."""
    rng = np.random.default_rng(11)
    for n_fft in (400, 512, 800):
        frames = jnp.asarray(
            rng.standard_normal((64, n_fft)).astype(np.float32))
        got = np.asarray(dsp._rfft_via_matmul(frames))
        want = np.asarray(jnp.fft.rfft(frames))
        np.testing.assert_allclose(got, want, atol=2e-4)
    # stft() routes by n_fft: ≤ threshold → matmul; above → rfft
    assert dsp._DFT_MATMUL_MAX_NFFT == 800
    x = jnp.asarray(rng.standard_normal(8000).astype(np.float32))
    for n_fft in (400, 2048):
        s = dsp.stft(x, n_fft, n_fft // 4)
        assert s.shape[-1] == n_fft // 2 + 1
        assert np.isfinite(np.asarray(jnp.abs(s))).all()


def test_whisper_mel_int16_transfer_bit_exact_for_pcm16():
    """PCM16-sourced audio produces IDENTICAL mels through the int16
    transfer path (whisper._mel_chunks_device) as through f32."""
    import os

    from mlx_audio_tpu.stt.models.whisper import Model, ModelDimensions

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=2,
        n_audio_layer=1, n_vocab=100, n_text_ctx=448, n_text_state=64,
        n_text_head=2, n_text_layer=1)
    model = Model(dims)
    rng = np.random.default_rng(3)
    # audio as it comes out of a 16-bit WAV: int16 / 32768
    audio = (rng.integers(-2000, 2000, 16000 * 35).astype(np.float32)
             / 32768.0)
    mel_i16, n1 = model._mel_chunks_device(audio)
    os.environ["MLX_AUDIO_TPU_MEL_TRANSFER"] = "f32"
    try:
        mel_f32, n2 = model._mel_chunks_device(audio)
    finally:
        del os.environ["MLX_AUDIO_TPU_MEL_TRANSFER"]
    assert n1 == n2
    np.testing.assert_array_equal(np.asarray(mel_i16), np.asarray(mel_f32))

"""Native C++ audio-ingest library: parity vs scipy/pure-Python paths.

The library (native/src/audioio.cpp, bound in mlx_audio_tpu/native) is the
TPU framework's counterpart to the reference's native ingest (libsndfile
via soundfile + ffmpeg; reference mlx_audio/audio_io.py). These tests pin
its behavior to the portable fallbacks it replaces.
"""

import numpy as np
import pytest

from mlx_audio_tpu import audio_io, native
from mlx_audio_tpu.utils import resample_audio

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++)")


def test_resample_matches_scipy():
    from scipy.signal import resample_poly as sp

    rng = np.random.default_rng(0)
    x = rng.standard_normal(44_100).astype(np.float32)
    for orig, tgt in [(44_100, 16_000), (48_000, 24_000), (16_000, 48_000),
                      (22_050, 24_000), (24_000, 16_000)]:
        ours = native.resample_poly(x, tgt, orig)
        from math import gcd
        g = gcd(orig, tgt)
        ref = sp(x, tgt // g, orig // g).astype(np.float32)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=6e-6)


def test_resample_stereo_and_identity():
    from scipy.signal import resample_poly as sp

    rng = np.random.default_rng(1)
    x = rng.standard_normal((1000, 2)).astype(np.float32)
    np.testing.assert_allclose(
        native.resample_poly(x, 2, 3), sp(x, 2, 3, axis=0).astype(np.float32),
        atol=6e-6)
    np.testing.assert_array_equal(native.resample_poly(x, 5, 5), x)


def test_resample_audio_uses_native_consistently():
    """utils.resample_audio (native path) ≈ scipy fallback path."""
    from math import gcd

    from scipy.signal import resample_poly as sp

    rng = np.random.default_rng(2)
    x = rng.standard_normal(12_345).astype(np.float32)
    got = resample_audio(x, 44_100, 16_000)
    g = gcd(44_100, 16_000)
    ref = sp(x, 16_000 // g, 44_100 // g).astype(np.float32)
    np.testing.assert_allclose(got, ref, atol=6e-6)


def test_wav_decode_matches_python_parser():
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(5000) * 0.25).astype(np.float32)
    for subtype in ("PCM_16", "PCM_24", "PCM_32", "FLOAT"):
        buf = audio_io._encode_wav(x, 24_000, subtype)
        ours, sr = native.wav_decode(buf)
        ref, ref_sr, _ = audio_io._decode_wav(buf)
        assert sr == ref_sr == 24_000
        np.testing.assert_allclose(ours[:, 0], ref, atol=1e-7)


def test_wav_decode_stereo_and_read_integration(tmp_path):
    rng = np.random.default_rng(4)
    x = (rng.standard_normal((3000, 2)) * 0.25).astype(np.float32)
    p = tmp_path / "st.wav"
    audio_io.write(p, x, 48_000)
    y, sr = audio_io.read(p)  # read() routes through the native decoder
    assert sr == 48_000 and y.shape == (3000, 2)
    # PCM-16 clips at full scale, so compare against the clipped signal
    np.testing.assert_allclose(y, np.clip(x, -1.0, 1.0), atol=1.5 / 32768)


def test_wav_encode_native_decodable_by_python():
    rng = np.random.default_rng(5)
    x = (rng.standard_normal(2000) * 0.25).astype(np.float32)
    buf = native.wav_encode_pcm16(x, 16_000)
    ref, sr, subtype = audio_io._decode_wav(buf)
    assert sr == 16_000 and subtype == "PCM_16"
    np.testing.assert_allclose(ref, x, atol=1.5 / 32768)


def test_wav_decode_rejects_garbage():
    with pytest.raises(ValueError):
        native.wav_decode(b"not a wav file at all........")

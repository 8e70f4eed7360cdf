"""Audio I/O round-trip tests for the native WAV codec."""

import numpy as np
import pytest

from mlx_audio_tpu import audio_io


@pytest.mark.parametrize("subtype,atol", [("PCM_16", 1 / 32000), ("PCM_24", 1e-6),
                                          ("PCM_32", 1e-7), ("FLOAT", 0.0)])
def test_wav_roundtrip_mono(tmp_path, subtype, atol):
    rng = np.random.default_rng(0)
    x = np.clip(rng.standard_normal(16000) * 0.3, -0.99, 0.99).astype(np.float32)
    p = tmp_path / "a.wav"
    audio_io.write(p, x, 24000, subtype=subtype)
    y, sr = audio_io.read(p)
    assert sr == 24000
    assert y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=max(atol, 1e-7))


def test_wav_roundtrip_stereo(tmp_path):
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((8000, 2)) * 0.2).astype(np.float32)
    p = tmp_path / "s.wav"
    audio_io.write(p, x, 44100)
    y, sr = audio_io.read(p)
    assert sr == 44100 and y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=1 / 32000)


def test_int16_read(tmp_path):
    x = np.linspace(-0.5, 0.5, 1000, dtype=np.float32)
    p = tmp_path / "i.wav"
    audio_io.write(p, x, 16000)
    y, sr = audio_io.read(p, dtype="int16")
    assert y.dtype == np.int16


def test_format_detection():
    assert audio_io.detect_format(b"RIFF\x00\x00\x00\x00WAVEfmt ") == "wav"
    assert audio_io.detect_format(b"fLaC" + b"\x00" * 20) == "flac"
    assert audio_io.detect_format(b"ID3\x03" + b"\x00" * 20) == "mp3"
    assert audio_io.detect_format(b"\xff\xfb\x90\x00" + b"\x00" * 20) == "mp3"
    assert audio_io.detect_format(b"\x00\x00\x00 ftypM4A " + b"\x00" * 8) == "m4a"
    assert audio_io.detect_format(b"OggS" + b"\x00" * 20) == "ogg"


def test_encode_bytes_wav_and_pcm():
    x = np.zeros(100, np.float32)
    b = audio_io.encode_bytes(x, 16000, "wav")
    assert b[:4] == b"RIFF"
    pcm = audio_io.encode_bytes(x, 16000, "pcm")
    assert len(pcm) == 200

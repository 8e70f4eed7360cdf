"""Mimi codec tests: round-trip shapes and streaming/offline parity."""

import numpy as np
import pytest

from mlx_audio_tpu.codec.models.mimi.mimi import (
    Mimi,
    MimiConfig,
    SeanetConfig,
    TransformerConfig,
)


@pytest.fixture(scope="module")
def mimi():
    cfg = MimiConfig(
        seanet=SeanetConfig(
            dimension=64, nfilters=8, ratios=[4, 3], ksize=7, residual_ksize=3,
            last_ksize=3,
        ),
        transformer=TransformerConfig(
            d_model=64, num_heads=4, num_layers=1, dim_feedforward=128,
            context=25,
        ),
        sample_rate=2400.0,
        frame_rate=50.0,  # encoder rate 2400/12 = 200 -> downsample 4
        quantizer_nq=4,
        quantizer_bins=32,
        quantizer_dim=16,
    )
    return Mimi(cfg)


def test_encode_decode_shapes(mimi):
    fs = mimi.frame_size  # 48 samples per frame
    audio = np.random.default_rng(0).standard_normal((1, 1, fs * 10)).astype(np.float32) * 0.1
    codes = mimi.encode(audio)
    assert codes.shape == (1, 4, 10)
    out = mimi.decode(codes)
    assert out.shape[0] == 1 and out.shape[1] == 1
    assert np.isfinite(np.asarray(out)).all()


def test_split_rvq_semantic_plus_acoustic(mimi):
    fs = mimi.frame_size
    audio = np.zeros((1, 1, fs * 4), np.float32)
    codes = np.asarray(mimi.encode(audio))
    assert (codes >= 0).all() and (codes < 32).all()


def test_streaming_decode_matches_offline(mimi):
    fs = mimi.frame_size
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 32, (1, 4, 6)).astype(np.int32)
    offline = np.asarray(mimi.decode(codes))

    state = mimi.init_decode_state(1)
    chunks = []
    for t in range(codes.shape[-1]):
        y, state = mimi.decode_step(codes[:, :, t : t + 1], state)
        chunks.append(np.asarray(y))
    streamed = np.concatenate(chunks, axis=-1)
    n = min(offline.shape[-1], streamed.shape[-1])
    assert n > 0
    np.testing.assert_allclose(
        streamed[..., :n], offline[..., :n], atol=2e-3, rtol=1e-2
    )


def test_streaming_encode_matches_offline(mimi):
    fs = mimi.frame_size
    rng = np.random.default_rng(2)
    audio = (rng.standard_normal((1, 1, fs * 6)) * 0.1).astype(np.float32)
    offline = np.asarray(mimi.encode(audio))

    state = mimi.init_encode_state(1)
    cols = []
    for t in range(6):
        c, state = mimi.encode_step(audio[:, :, t * fs : (t + 1) * fs], state)
        cols.append(np.asarray(c))
    streamed = np.concatenate(cols, axis=-1)
    # streaming uses zero left-pad vs offline edge-pad on the downsample
    # conv; allow the first frame to differ
    np.testing.assert_array_equal(streamed[..., 1:6], offline[..., 1:6])

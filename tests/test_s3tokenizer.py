"""S3Tokenizer: FSQ/Euclid quantization, masking, long-audio windowing."""

import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_tpu.codec.models.s3tokenizer import (
    ModelConfig,
    S3Tokenizer,
    S3TokenizerV2,
    S3TokenizerV3,
    log_mel_spectrogram,
    merge_tokenized_segments,
    padding,
)

TINY = ModelConfig(n_mels=16, n_audio_state=32, n_audio_head=2,
                   n_audio_layer=1)


def test_v2_quantize_shapes_and_range():
    model = S3TokenizerV2(config=TINY)
    mel = np.random.randn(2, 16, 200).astype(np.float32)
    lens = np.array([200, 120])
    codes, code_len = model.quantize(mel, lens)
    assert code_len.tolist() == [50, 30]
    assert codes.shape[0] == 2
    assert codes.min() >= 0 and codes.max() < 3**8
    # padding region must not change valid tokens
    mel2 = np.concatenate([mel, np.random.randn(2, 16, 64).astype(np.float32)],
                          axis=-1)
    codes2, code_len2 = model.quantize(mel2, lens)
    assert code_len2.tolist() == [50, 30]
    np.testing.assert_array_equal(codes2[0, :50], codes[0, :50])
    np.testing.assert_array_equal(codes2[1, :30], codes[1, :30])


def test_v2_long_audio_windowing():
    model = S3TokenizerV2(config=TINY)
    # 40 s: 4000 frames > 3000 → two windows, merged with 4 s overlap
    mel = np.random.randn(1, 16, 4000).astype(np.float32)
    codes, code_len = model.quantize(mel, np.array([4000]))
    # window1 750 tokens, window2 (4000-2600=1400 frames → 350 tokens);
    # merge drops 2 s * 25 = 50 from each interior side
    assert code_len[0] == (750 - 50) + (350 - 50)


def test_merge_tokenized_segments():
    segs = [list(range(100)), list(range(100, 200)), list(range(200, 260))]
    merged = merge_tokenized_segments(segs, overlap=4, token_rate=25)
    assert merged[:50] == list(range(50))
    half = 50
    expect = segs[0][:-half] + segs[1][half:-half] + segs[2][half:]
    assert merged == expect


def test_v1_euclid():
    cfg = ModelConfig(n_mels=16, n_audio_state=32, n_audio_head=2,
                      n_audio_layer=1, n_codebook_size=64)
    model = S3Tokenizer("speech_tokenizer_v1_25hz", cfg)
    model.euclid_codebook.embed = jnp.asarray(
        np.random.randn(64, 32).astype(np.float32))
    mel = np.random.randn(1, 16, 100).astype(np.float32)
    codes, code_len = model.quantize(mel, np.array([100]))
    assert code_len[0] == 25
    assert codes.max() < 64


def test_v3_layer_count():
    m = S3TokenizerV3(config=ModelConfig(n_mels=8, n_audio_state=16,
                                         n_audio_head=2, n_audio_layer=3))
    assert len(m.encoder.blocks) == 3
    m_default_cfg = ModelConfig(n_mels=8, n_audio_state=16, n_audio_head=2)
    assert S3TokenizerV3(config=m_default_cfg).config.n_audio_layer == 12


def test_log_mel_and_padding():
    audio = np.sin(2 * np.pi * 440 * np.arange(16000) / 16000).astype(np.float32)
    mel = log_mel_spectrogram(audio, n_mels=32)
    assert mel.shape[0] == 32
    assert np.isfinite(np.asarray(mel)).all()
    batch, lens = padding([np.asarray(mel), np.asarray(mel[:, :50])])
    assert batch.shape == (2, 32, mel.shape[1])
    assert lens.tolist() == [mel.shape[1], 50]


def test_v2_weight_loading_keys():
    from mlx_audio_tpu.nn.module import load_weights, flatten_params

    model = S3TokenizerV2(config=TINY)
    src = S3TokenizerV2(config=TINY)
    flat = flatten_params(src)
    # simulate torch-style key layout
    torch_keys = {}
    for k, v in flat.items():
        tk = k.replace("fsq_codebook.", "quantizer.fsq_codebook.")
        torch_keys[tk] = v
    loaded = load_weights(model, model.sanitize(torch_keys), strict=True)
    a = flatten_params(loaded)
    for k, v in flat.items():
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(v))

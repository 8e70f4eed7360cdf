"""S3Gen components: conformer encoder, CFM U-Net, HiFT vocoder, CAM++."""

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.codec.models.s3gen import (
    CAMPPlus,
    HiFTGenerator,
    UpsampleConformerEncoder,
    mel_spectrogram,
)
from mlx_audio_tpu.codec.models.s3gen.encoder import subsequent_chunk_mask


def test_subsequent_chunk_mask():
    m = np.asarray(subsequent_chunk_mask(4, 2))
    expect = np.array([[1, 1, 0, 0], [1, 1, 0, 0],
                       [1, 1, 1, 1], [1, 1, 1, 1]], bool)
    np.testing.assert_array_equal(m, expect)


def test_encoder_upsamples_2x_and_masks_padding():
    enc = UpsampleConformerEncoder(input_size=16, output_size=16,
                                   attention_heads=2, linear_units=32,
                                   num_blocks=1, num_up_blocks=1)
    x = np.random.randn(1, 8, 16).astype(np.float32)
    out, lens = enc(jnp.asarray(x), jnp.array([8]))
    assert out.shape == (1, 16, 16)
    assert int(lens[0]) == 16
    # valid prefix must be invariant to extra (zero, i.e. masked-embedding)
    # padding frames — matches the flow pipeline, which zeroes pad tokens
    # before the encoder (reference flow.py:124-127)
    xp = np.concatenate([x, np.zeros((1, 4, 16), np.float32)], axis=1)
    out_p, _ = enc(jnp.asarray(xp), jnp.array([8]))
    np.testing.assert_allclose(np.asarray(out_p[:, :16]),
                               np.asarray(out), atol=2e-4)


def test_hift_streaming_source_cache():
    h = HiFTGenerator(in_channels=8, base_channels=16, nb_harmonics=1,
                      upsample_rates=[4, 2], upsample_kernel_sizes=[8, 4],
                      resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1]],
                      source_resblock_kernel_sizes=[3, 3],
                      source_resblock_dilation_sizes=[[1], [1]])
    mel = jnp.asarray(np.random.randn(1, 10, 8).astype(np.float32))
    key = jax.random.PRNGKey(0)
    wav, src = h(mel, key=key)
    assert wav.shape == (1, 10 * 4 * 2 * 4)
    # passing the returned source back as cache reproduces the same audio
    wav2, _ = h(mel, key=jax.random.PRNGKey(99), cache_source=src)
    np.testing.assert_allclose(np.asarray(wav), np.asarray(wav2), atol=1e-4)


def test_campplus_embedding_deterministic():
    cam = CAMPPlus(feat_dim=16, embedding_size=12, growth_rate=4,
                   bn_size=2, init_channels=8)
    x = jnp.asarray(np.random.randn(2, 60, 16).astype(np.float32))
    e1 = cam(x)
    e2 = cam(x)
    assert e1.shape == (2, 12)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2))


def test_mel_spectrogram_shape():
    wav = np.random.randn(24000).astype(np.float32)
    mel = mel_spectrogram(wav)
    assert mel.shape == (1, 50, 80)
    assert np.isfinite(np.asarray(mel)).all()

"""MossFormer2-SE: mask net blocks, ReLU² attention, enhance pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_tpu.ops.pallas.relu2_attention import relu2_attention_reference
from mlx_audio_tpu.sts.models.mossformer2_se import (
    Model,
    MossFormer2SEConfig,
    MossFormerMaskNet,
)
from mlx_audio_tpu.sts.models.mossformer2_se.mossformer2 import (
    FlashShareAFFConvM,
    GatedFSMNBlock,
    ScaleNorm,
    UniDeepFsmn,
)

TINY = MossFormer2SEConfig(in_channels=12, out_channels=16,
                           out_channels_final=961, num_blocks=1, num_mels=4)


def test_relu2_attention_reference():
    q = np.random.randn(1, 2, 8, 4).astype(np.float32)
    k = np.random.randn(1, 2, 8, 4).astype(np.float32)
    v = np.random.randn(1, 2, 8, 6).astype(np.float32)
    out = relu2_attention_reference(jnp.asarray(q), jnp.asarray(k),
                                    jnp.asarray(v), 8)
    sim = np.einsum("bgnd,bgmd->bgnm", q, k) / 8
    attn = np.maximum(sim, 0) ** 2
    expect = np.einsum("bgnm,bgme->bgne", attn, v)
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)


def test_scalenorm():
    sn = ScaleNorm(16)
    x = jnp.asarray(np.random.randn(2, 5, 16).astype(np.float32))
    y = sn(x)
    norms = np.linalg.norm(np.asarray(y), axis=-1)
    np.testing.assert_allclose(norms, np.full_like(norms, 4.0), rtol=1e-4)


def test_unideepfsmn_residual():
    f = UniDeepFsmn(8, 8, lorder=3, hidden_size=8)
    x = jnp.asarray(np.random.randn(1, 10, 8).astype(np.float32))
    y = f(x)
    assert y.shape == x.shape
    # conv weight is zero-init → memory term 0, so y = x + project(relu(lin(x)))
    assert np.isfinite(np.asarray(y)).all()


def test_flash_layer_group_padding():
    layer = FlashShareAFFConvM(dim=16, group_size=8, query_key_dim=8,
                               expansion_factor=4.0)
    x = jnp.asarray(np.random.randn(1, 13, 16).astype(np.float32))
    y = layer(x)  # 13 % 8 != 0 → pads internally, output unpadded
    assert y.shape == (1, 13, 16)
    assert np.isfinite(np.asarray(y)).all()


def test_masknet_output_shape():
    net = MossFormerMaskNet(in_channels=12, out_channels=16,
                            out_channels_final=31, num_blocks=1)
    x = jnp.asarray(np.random.randn(1, 20, 12).astype(np.float32))
    mask = net(x)
    assert mask.shape == (1, 20, 31)
    assert (np.asarray(mask) >= 0).all()  # final ReLU


def test_enhance_roundtrip_shapes():
    model = Model(TINY)
    audio = np.random.randn(48000).astype(np.float32) * 0.05
    out = model.enhance(audio)
    assert out.shape == audio.shape
    assert np.isfinite(out).all()


def test_enhance_segmented_long_audio():
    cfg = MossFormer2SEConfig(in_channels=12, out_channels=16,
                              out_channels_final=961, num_blocks=1,
                              num_mels=4, one_time_decode_length=1,
                              decode_window=1)
    model = Model(cfg)
    audio = np.random.randn(3 * 48000).astype(np.float32) * 0.05
    out = model.enhance(audio, chunked=False)
    assert out.shape == audio.shape
    assert np.isfinite(out).all()


def test_enhance_chunked_mode():
    cfg = MossFormer2SEConfig(in_channels=12, out_channels=16,
                              out_channels_final=961, num_blocks=1,
                              num_mels=4, chunk_seconds=1.0)
    model = Model(cfg)
    audio = np.random.randn(int(2.5 * 48000)).astype(np.float32) * 0.05
    out = model.enhance(audio, chunked=True)
    assert out.shape == audio.shape
    assert np.isfinite(out).all()

"""Offline cross-framework parity: Mimi vs transformers (torch CPU).

Tiny random-init ``transformers.MimiModel`` → ``state_dict()`` → ``sanitize``
→ ``load_weights``: RVQ codes and decoded waveforms must match (reference
codec/models/mimi/mimi.py, utils.py:316 load contract).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from mlx_audio_tpu.codec.models.mimi.mimi import (
    Mimi,
    MimiConfig,
    SeanetConfig,
    TransformerConfig,
)
from mlx_audio_tpu.nn.module import load_weights


@pytest.fixture(scope="module")
def mimi_pair():
    hf_cfg = transformers.MimiConfig(
        sampling_rate=24000,
        frame_rate=12.5,
        audio_channels=1,
        hidden_size=32,
        num_filters=8,
        num_residual_layers=1,
        upsampling_ratios=[8, 6, 5, 4],
        codebook_size=32,
        codebook_dim=16,
        num_quantizers=4,
        num_semantic_quantizers=1,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        intermediate_size=64,
        head_dim=8,
        vector_quantization_hidden_dimension=16,
        sliding_window=8,
        max_position_embeddings=64,
        upsample_groups=32,
    )
    torch.manual_seed(13)
    hf = transformers.MimiModel(hf_cfg).eval()
    cfg = MimiConfig(
        sample_rate=hf_cfg.sampling_rate,
        frame_rate=hf_cfg.frame_rate,
        seanet=SeanetConfig(
            dimension=hf_cfg.hidden_size,
            nfilters=hf_cfg.num_filters,
            nresidual_layers=hf_cfg.num_residual_layers,
            ratios=list(hf_cfg.upsampling_ratios),
        ),
        transformer=TransformerConfig(
            d_model=hf_cfg.hidden_size,
            num_heads=hf_cfg.num_attention_heads,
            num_layers=hf_cfg.num_hidden_layers,
            layer_scale=hf_cfg.layer_scale_initial_scale,
            context=hf_cfg.sliding_window,
            dim_feedforward=hf_cfg.intermediate_size,
        ),
        quantizer_nq=hf_cfg.num_quantizers,
        quantizer_bins=hf_cfg.codebook_size,
        quantizer_dim=hf_cfg.vector_quantization_hidden_dimension,
    )
    ours = Mimi(cfg)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    ours = load_weights(ours, ours.sanitize(sd), strict=True).eval()
    return hf_cfg, hf, ours


def test_codes_parity(mimi_pair):
    hf_cfg, hf, ours = mimi_pair
    rng = np.random.default_rng(17)
    frame = 1920  # 24 kHz / 12.5 Hz
    audio = (0.1 * rng.standard_normal((1, 1, 3 * frame))).astype(np.float32)
    with torch.no_grad():
        ref = hf.encode(torch.from_numpy(audio)).audio_codes.numpy()
    codes = np.asarray(ours.encode(jnp.asarray(audio)))
    assert np.array_equal(codes, ref)


def test_decode_waveform_parity(mimi_pair):
    hf_cfg, hf, ours = mimi_pair
    rng = np.random.default_rng(18)
    codes = rng.integers(
        0, hf_cfg.codebook_size, size=(1, hf_cfg.num_quantizers, 3)
    ).astype(np.int64)
    with torch.no_grad():
        ref = hf.decode(torch.from_numpy(codes)).audio_values.numpy()
    out = np.asarray(ours.decode(jnp.asarray(codes, jnp.int32)))
    n = min(out.shape[-1], ref.shape[-1])
    np.testing.assert_allclose(
        out[..., :n], ref[..., :n], atol=2e-4, rtol=1e-4
    )


def test_streaming_decode_matches_full(mimi_pair):
    """Functional streaming decode (step-by-step) must equal full decode."""
    hf_cfg, hf, ours = mimi_pair
    rng = np.random.default_rng(19)
    T = 4
    codes = rng.integers(
        0, hf_cfg.codebook_size, size=(1, hf_cfg.num_quantizers, T)
    ).astype(np.int32)
    full = np.asarray(ours.decode(jnp.asarray(codes)))
    state = ours.init_decode_state(batch=1)
    chunks = []
    for t in range(T):
        y, state = ours.decode_step(jnp.asarray(codes[:, :, t : t + 1]), state)
        chunks.append(np.asarray(y))
    stream = np.concatenate(chunks, axis=-1)
    n = min(full.shape[-1], stream.shape[-1])
    np.testing.assert_allclose(
        stream[..., :n], full[..., :n], atol=1e-4, rtol=1e-4
    )

"""Offline cross-framework parity: SAM-Audio's T5 text encoder vs
transformers (torch CPU).

Tiny random-init ``T5EncoderModel`` → ``state_dict()`` → our ``sanitize`` →
``load_weights`` must reproduce the encoder hidden states (reference
sts/models/sam_audio/text_encoder.py:54-622 behavioral spec). Covers both
the relu (t5-base) and gated-gelu (flan-t5 / SAM checkpoints) FF variants,
plus the relative-position bias at lengths past ``max_distance`` bucketing.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from mlx_audio_tpu.nn.module import load_weights
from mlx_audio_tpu.sts.models.sam_audio.config import T5Config
from mlx_audio_tpu.sts.models.sam_audio.text_encoder import T5Encoder


def _pair(gated: bool, seed: int):
    hf_cfg = transformers.T5Config(
        vocab_size=96,
        d_model=32,
        d_kv=8,
        d_ff=64,
        num_layers=3,
        num_heads=4,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=16,
        is_gated_act=gated,
        dense_act_fn="gelu_new" if gated else "relu",
        feed_forward_proj="gated-gelu" if gated else "relu",
        dropout_rate=0.0,
    )
    torch.manual_seed(seed)
    hf = transformers.T5EncoderModel(hf_cfg).eval()

    model = T5Encoder(T5Config(
        vocab_size=96, d_model=32, d_kv=8, d_ff=64, num_layers=3,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, is_gated_act=gated,
        dense_act_fn="gelu_new" if gated else "relu",
    ))
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    model = load_weights(model, model.sanitize(sd), strict=True).eval()
    return hf, model


@pytest.mark.parametrize("gated", [False, True])
def test_encoder_hidden_parity(gated):
    hf, model = _pair(gated, seed=3 + gated)
    rng = np.random.default_rng(7)
    # length 24 > max_distance 16 exercises the log-bucket branch
    ids = rng.integers(0, 96, (2, 24)).astype(np.int32)
    mask = np.ones((2, 24), np.int64)
    mask[1, 17:] = 0

    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids.astype(np.int64)),
                 attention_mask=torch.from_numpy(mask)
                 ).last_hidden_state.numpy()
    out = np.asarray(model(jnp.asarray(ids), jnp.asarray(mask)))
    # padded positions feed garbage downstream in both frameworks; compare
    # only valid positions (HF also emits them but they are masked out by
    # SAM's memory_padding_mask)
    np.testing.assert_allclose(out[0], ref[0], atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(out[1, :17], ref[1, :17], atol=2e-5,
                               rtol=1e-5)


def test_encoder_parity_no_mask_long():
    hf, model = _pair(False, seed=11)
    rng = np.random.default_rng(13)
    ids = rng.integers(0, 96, (1, 40)).astype(np.int32)
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids.astype(np.int64))
                 ).last_hidden_state.numpy()
    out = np.asarray(model(jnp.asarray(ids)))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)

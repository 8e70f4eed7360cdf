"""Offline cross-framework parity: LFM2 hybrid backbone vs transformers.

Tiny random-init ``Lfm2ForCausalLM`` → ``state_dict()`` → our ``Lfm2Model``
(identical parameter names; torch depthwise conv (C,1,K) reshaped to our
(C,K,1)); final hidden states must match, and KV/conv-cached incremental
decode must equal the full forward (reference sts/models/lfm_audio/
model.py:219-241 borrows mlx_lm's Lfm2Model — this validates our
from-scratch implementation against the HF semantics)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from mlx_audio_tpu.nn.module import load_weights
from mlx_audio_tpu.sts.models.lfm_audio.config import LFM2Config
from mlx_audio_tpu.sts.models.lfm_audio.lfm2 import Lfm2Model

LAYER_TYPES = ["conv", "full_attention", "conv", "full_attention"]


def _tiny_pair():
    torch.manual_seed(9)
    hf_cfg = transformers.Lfm2Config(
        vocab_size=80, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        layer_types=list(LAYER_TYPES), conv_L_cache=3,
        max_position_embeddings=64, norm_eps=1e-5, conv_bias=False,
        tie_word_embeddings=True,
    )
    hf = transformers.Lfm2ForCausalLM(hf_cfg).eval()

    cfg = LFM2Config.from_dict(dict(
        vocab_size=80, hidden_size=32, intermediate_size=64,  # → ffn_dim 256
        num_attention_heads=4, num_key_value_heads=2,
        num_hidden_layers=4, layer_types=list(LAYER_TYPES), conv_L_cache=3,
        conv_bias=False, norm_eps=1e-5, rope_theta=hf_cfg.rope_theta,
    ))
    model = Lfm2Model(cfg)
    weights = {}
    for k, t in hf.state_dict().items():
        v = t.detach().numpy()
        if not k.startswith("model."):
            continue  # lm_head is tied to embed_tokens
        k = k[len("model."):]
        if k.endswith("conv.conv.weight"):  # (C, 1, K) → (C, K, 1)
            v = v.transpose(0, 2, 1)
        weights[k] = v
    return hf, load_weights(model, weights, strict=True).eval()


@pytest.fixture(scope="module")
def lfm2_pair():
    return _tiny_pair()


def test_hidden_states_parity(lfm2_pair):
    hf, model = lfm2_pair
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 80, size=(2, 9)).astype(np.int64)
    with torch.no_grad():
        ref = hf.model(input_ids=torch.from_numpy(ids)).last_hidden_state
    emb = model.embed_tokens(jnp.asarray(ids, jnp.int32))
    ours, _ = model(emb)
    np.testing.assert_allclose(
        np.asarray(ours), ref.numpy(), atol=2e-5, rtol=1e-5
    )


def test_incremental_matches_full(lfm2_pair):
    _, model = lfm2_pair
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 80, size=(1, 8)).astype(np.int32)
    emb = model.embed_tokens(jnp.asarray(ids))
    full, _ = model(emb)

    caches = model.make_caches(batch=1, max_len=16)
    steps = []
    for t in range(ids.shape[1]):
        h, caches = model(emb[:, t : t + 1], caches)
        steps.append(np.asarray(h)[:, 0])
    np.testing.assert_allclose(
        np.stack(steps, axis=1), np.asarray(full), atol=1e-4, rtol=1e-4
    )

"""Offline cross-framework parity: ALBERT (Kokoro's PL-BERT frontend) vs
transformers (torch CPU).

Tiny random-init ``AlbertModel`` → ``state_dict()`` → our module tree must
reproduce sequence states and pooled output (reference behavioral spec:
tts/models/kokoro/modules.py:419-659 `CustomAlbert`). This covers the
flagship TTS model's text encoder, whose checkpoint (`bert.*` keys) is a
stock HF ALBERT layout.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from mlx_audio_tpu.nn.module import load_weights
from mlx_audio_tpu.tts.models.kokoro.albert import AlbertModelArgs, CustomAlbert


def _tiny_cfg():
    return transformers.AlbertConfig(
        vocab_size=64,
        embedding_size=16,
        hidden_size=32,
        num_hidden_layers=3,
        num_hidden_groups=1,
        num_attention_heads=4,
        intermediate_size=64,
        inner_group_num=1,
        max_position_embeddings=128,
        type_vocab_size=2,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        classifier_dropout_prob=0.0,
        hidden_act="gelu",  # exact GELU, matching PL-BERT and our impl
    )


def test_albert_parity():
    torch.manual_seed(3)
    cfg = _tiny_cfg()
    hf = transformers.AlbertModel(cfg, add_pooling_layer=True).eval()

    model = CustomAlbert(AlbertModelArgs.from_dict(cfg.to_dict()))
    sd = {
        k: v.detach().numpy()
        for k, v in hf.state_dict().items()
        if "position_ids" not in k
    }
    model = load_weights(model, sd, strict=True).eval()

    rng = np.random.default_rng(5)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 24))
    # ragged validity: second row attends to the first 17 tokens only
    attn = np.ones((2, 24), np.int64)
    attn[1, 17:] = 0

    with torch.no_grad():
        ref = hf(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(attn),
        )
    seq, pooled = model(
        jnp.asarray(ids, jnp.int32), attention_mask=jnp.asarray(attn, jnp.int32)
    )

    np.testing.assert_allclose(
        np.asarray(seq), ref.last_hidden_state.numpy(), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(pooled), ref.pooler_output.numpy(), atol=1e-5, rtol=1e-5
    )


def test_albert_parity_grouped_layers():
    """num_hidden_groups > 1 exercises the layer-group indexing."""
    torch.manual_seed(7)
    cfg = _tiny_cfg()
    cfg.num_hidden_layers = 4
    cfg.num_hidden_groups = 2
    hf = transformers.AlbertModel(cfg, add_pooling_layer=True).eval()

    model = CustomAlbert(AlbertModelArgs.from_dict(cfg.to_dict()))
    sd = {
        k: v.detach().numpy()
        for k, v in hf.state_dict().items()
        if "position_ids" not in k
    }
    model = load_weights(model, sd, strict=True).eval()

    rng = np.random.default_rng(6)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 12))
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids))
    seq, _ = model(jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(
        np.asarray(seq), ref.last_hidden_state.numpy(), atol=1e-5, rtol=1e-5
    )

"""Offline cross-framework parity: Wav2Vec2 vs transformers (torch CPU).

Tiny random-init ``Wav2Vec2ForCTC`` → ``state_dict()`` → our ``sanitize`` →
``load_weights`` must reproduce hidden states and CTC logits (reference
stt/models/wav2vec/wav2vec.py behavioral spec).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from mlx_audio_tpu.nn.module import load_weights
from mlx_audio_tpu.stt.models.wav2vec.wav2vec import Model, ModelConfig


def _tiny_cfg(do_stable_layer_norm=False):
    return transformers.Wav2Vec2Config(
        vocab_size=30,
        hidden_size=24,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=48,
        conv_dim=[16, 16, 16],
        conv_stride=[5, 2, 2],
        conv_kernel=[10, 3, 3],
        conv_bias=do_stable_layer_norm,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        feat_extract_norm="layer" if do_stable_layer_norm else "group",
        do_stable_layer_norm=do_stable_layer_norm,
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        final_dropout=0.0,
        layerdrop=0.0,
    )


@pytest.mark.parametrize("stable", [False, True])
def test_ctc_logits_parity(stable):
    torch.manual_seed(11 + stable)
    cfg = _tiny_cfg(stable)
    hf = transformers.Wav2Vec2ForCTC(cfg).eval()

    model = Model(ModelConfig.from_dict(cfg.to_dict()))
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    weights = model.sanitize(sd)
    model = load_weights(model, weights, strict=True).eval()

    rng = np.random.default_rng(4)
    audio = rng.standard_normal((1, 1600)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(audio)).logits.numpy()
    _, logits = model(jnp.asarray(audio))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-4, rtol=1e-4)

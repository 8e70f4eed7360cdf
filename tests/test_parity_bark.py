"""Offline cross-framework parity: Bark GPT stacks vs transformers (torch CPU).

Tiny random-init ``BarkSemanticModel`` (causal GPT) and ``BarkFineModel``
(non-causal, multi-codebook) → ``state_dict()`` → our ``GPT`` / ``FineGPT``
(weights load by identical names); logits must match (reference
tts/models/bark/bark.py behavioral spec: GPT :280-340, FineGPT :356-390).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from mlx_audio_tpu.nn.module import load_weights
from mlx_audio_tpu.tts.models.bark.bark import FineGPT, GPT, GPTConfig


def _np_sd(m):
    # drop HF's registered causal-mask buffers ("layers.N.attn.bias")
    return {
        k: v.detach().numpy() for k, v in m.state_dict().items()
        if not k.endswith(".attn.bias")
    }


def test_semantic_gpt_last_logits_parity():
    from transformers.models.bark import modeling_bark as mb

    torch.manual_seed(3)
    hf = mb.BarkSemanticModel(
        transformers.BarkSemanticConfig(
            block_size=32, input_vocab_size=90, output_vocab_size=90,
            num_layers=2, num_heads=2, hidden_size=16, bias=True, dropout=0.0,
        )
    ).eval()
    ours = GPT(GPTConfig(block_size=32, input_vocab_size=90,
                         output_vocab_size=90, n_layer=2, n_head=2, n_embd=16,
                         bias=True))
    sd = _np_sd(hf)
    # our layernorm_final is bias-free (real suno checkpoints use bias=False;
    # HF's init crashes on bias=False, so drop its zero-initialized bias)
    assert not sd.pop("layernorm_final.bias").any()
    ours = load_weights(ours, sd, strict=True).eval()

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 90, size=(1, 9)).astype(np.int64)
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids)).logits.numpy()[:, -1:]
    emb = ours.input_embeds_layer(jnp.asarray(ids, jnp.int32))
    got, _ = ours.forward_embeds(emb, None, jnp.arange(9))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5, rtol=1e-5)


def test_fine_gpt_logits_parity():
    from transformers.models.bark import modeling_bark as mb

    torch.manual_seed(4)
    hf = mb.BarkFineModel(
        transformers.BarkFineConfig(
            block_size=32, input_vocab_size=50, output_vocab_size=50,
            num_layers=2, num_heads=2, hidden_size=16, bias=True, dropout=0.0,
            n_codes_total=4, n_codes_given=1,
        )
    ).eval()
    ours = FineGPT(GPTConfig(block_size=32, input_vocab_size=50,
                             output_vocab_size=50, n_layer=2, n_head=2,
                             n_embd=16, bias=True, n_codes_total=4,
                             n_codes_given=1))
    ours = load_weights(ours, _np_sd(hf), strict=True).eval()

    rng = np.random.default_rng(1)
    idx = rng.integers(0, 50, size=(1, 12, 4)).astype(np.int64)
    pred_idx = 2
    with torch.no_grad():
        ref = hf(codebook_idx=pred_idx,
                 input_ids=torch.from_numpy(idx)).logits.numpy()
    got = np.asarray(ours(pred_idx, jnp.asarray(idx, jnp.int32)))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)

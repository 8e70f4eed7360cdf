"""Offline cross-framework parity: LM core vs transformers (torch CPU).

Proves the in-repo LM core (which replaces the reference's mlx-lm dependency,
see reference tts/models/spark/spark.py:8-11 et al.) implements the HF
semantics: tiny random-init torch models' ``state_dict()`` loads straight
into our modules and full-sequence logits match, and our KV-cached
incremental decode matches the full forward.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from mlx_audio_tpu.lm.gpt2 import GPT2Config, GPT2Model
from mlx_audio_tpu.lm.transformer import CausalLM, LMConfig
from mlx_audio_tpu.nn.module import load_weights

ATOL = 2e-4


def _np_state_dict(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


def _llama_like_case(model_type):
    common = dict(
        vocab_size=130,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
        tie_word_embeddings=False,
    )
    if model_type == "llama":
        hf_cfg = transformers.LlamaConfig(**common)
        hf = transformers.LlamaForCausalLM(hf_cfg)
    elif model_type == "qwen2":
        hf_cfg = transformers.Qwen2Config(**common)
        hf = transformers.Qwen2ForCausalLM(hf_cfg)
    elif model_type == "qwen3":
        hf_cfg = transformers.Qwen3Config(**common, head_dim=8)
        hf = transformers.Qwen3ForCausalLM(hf_cfg)
    else:  # pragma: no cover
        raise ValueError(model_type)
    cfg = LMConfig.from_dict({**hf_cfg.to_dict(), "model_type": model_type})
    return hf.eval(), cfg


@pytest.mark.parametrize("model_type", ["llama", "qwen2", "qwen3"])
def test_llama_family_logits_parity(model_type):
    torch.manual_seed(hash(model_type) % 2**31)
    hf, cfg = _llama_like_case(model_type)
    model = CausalLM(cfg)
    model = load_weights(model, _np_state_dict(hf), strict=True).eval()

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, cfg.vocab_size, size=(2, 9)).astype(np.int64)
    with torch.no_grad():
        ref = hf(torch.from_numpy(tokens)).logits.numpy()
    ours, _ = model(jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=ATOL, rtol=1e-4)


def test_llama_incremental_matches_full():
    torch.manual_seed(7)
    hf, cfg = _llama_like_case("llama")
    model = CausalLM(cfg)
    model = load_weights(model, _np_state_dict(hf), strict=True).eval()

    rng = np.random.default_rng(1)
    tokens = rng.integers(0, cfg.vocab_size, size=(1, 8)).astype(np.int32)
    full, _ = model(jnp.asarray(tokens))

    caches = model.make_caches(batch=1, max_len=16, dtype=jnp.float32)
    steps = []
    for t in range(tokens.shape[1]):
        lg, caches = model(jnp.asarray(tokens[:, t : t + 1]), caches)
        steps.append(np.asarray(lg)[:, 0])
    np.testing.assert_allclose(
        np.stack(steps, axis=1), np.asarray(full), atol=1e-4, rtol=1e-4
    )


def _gpt2_weights(hf):
    """HF GPT2 state_dict → our GPT2Model layout (strip prefix, Conv1D→Linear)."""
    out = {}
    for k, v in _np_state_dict(hf).items():
        if k.endswith(".attn.bias") or k.endswith(".attn.masked_bias"):
            continue  # causal-mask buffers
        if k == "lm_head.weight":
            continue  # tied to wte
        k = k.removeprefix("transformer.")
        if any(
            k.endswith(f"{p}.weight")
            for p in (".attn.c_attn", ".attn.c_proj", ".mlp.c_fc", ".mlp.c_proj")
        ):
            v = v.T  # HF Conv1D stores (in, out)
        out[k] = v
    return out


def test_gpt2_logits_parity():
    torch.manual_seed(3)
    hf_cfg = transformers.GPT2Config(
        vocab_size=97, n_positions=32, n_embd=24, n_layer=2, n_head=4
    )
    hf = transformers.GPT2LMHeadModel(hf_cfg).eval()
    model = GPT2Model(GPT2Config.from_dict(hf_cfg.to_dict()))
    model = load_weights(model, _gpt2_weights(hf), strict=True).eval()

    rng = np.random.default_rng(2)
    tokens = rng.integers(0, hf_cfg.vocab_size, size=(2, 11)).astype(np.int64)
    with torch.no_grad():
        ref = hf(torch.from_numpy(tokens)).logits.numpy()
    h, _ = model(jnp.asarray(tokens, jnp.int32))
    ours = model.wte.as_linear(h)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=ATOL, rtol=1e-4)


def test_gpt2_incremental_matches_full():
    torch.manual_seed(4)
    hf_cfg = transformers.GPT2Config(
        vocab_size=61, n_positions=32, n_embd=16, n_layer=2, n_head=2
    )
    hf = transformers.GPT2LMHeadModel(hf_cfg).eval()
    model = GPT2Model(GPT2Config.from_dict(hf_cfg.to_dict()))
    model = load_weights(model, _gpt2_weights(hf), strict=True).eval()

    rng = np.random.default_rng(3)
    tokens = rng.integers(0, hf_cfg.vocab_size, size=(1, 7)).astype(np.int32)
    full, _ = model(jnp.asarray(tokens))
    caches = model.make_caches(batch=1, max_len=16, dtype=jnp.float32)
    steps = []
    for t in range(tokens.shape[1]):
        h, caches = model(jnp.asarray(tokens[:, t : t + 1]), caches)
        steps.append(np.asarray(h)[:, 0])
    np.testing.assert_allclose(
        np.stack(steps, axis=1), np.asarray(full), atol=1e-4, rtol=1e-4
    )

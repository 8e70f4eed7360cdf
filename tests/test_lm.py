"""LM core tests: KV-cache decode parity with full forward, sampling,
stream_generate, GPT-2 backbone."""

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.lm import (
    CausalLM,
    GenerationResponse,
    KVCache,
    LMConfig,
    make_sampler,
    stream_generate,
)
from mlx_audio_tpu.lm.gpt2 import GPT2Config, GPT2Model
from mlx_audio_tpu.lm.sample import apply_repetition_penalty, top_k_filter, top_p_filter


def tiny_cfg(**kw):
    d = dict(
        hidden_size=64,
        num_hidden_layers=2,
        intermediate_size=128,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=100,
    )
    d.update(kw)
    return LMConfig(**d)


def test_cached_decode_matches_full_forward():
    model = CausalLM(tiny_cfg())
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 100, (1, 12)))
    full_logits, _ = model(ids)

    caches = model.make_caches(batch=1, max_len=16)
    # prefill on first 8, then decode one at a time
    logits, caches = model(ids[:, :8], caches)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(full_logits[:, :8]), atol=2e-2, rtol=1e-2
    )
    for t in range(8, 12):
        step_logits, caches = model(ids[:, t : t + 1], caches)
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]),
            np.asarray(full_logits[:, t]),
            atol=2e-2,
            rtol=1e-2,
        )


def test_qwen3_qk_norm_variant():
    model = CausalLM(tiny_cfg(model_type="qwen3"))
    assert hasattr(model.model.layers[0].self_attn, "q_norm")
    ids = jnp.zeros((1, 4), jnp.int32)
    logits, _ = model(ids)
    assert logits.shape == (1, 4, 100)


def test_tied_embeddings():
    model = CausalLM(tiny_cfg(tie_word_embeddings=True))
    assert not hasattr(model, "lm_head")
    logits, _ = model(jnp.zeros((1, 3), jnp.int32))
    assert logits.shape == (1, 3, 100)


def test_stream_generate_greedy_deterministic():
    model = CausalLM(tiny_cfg())
    prompt = jnp.asarray([1, 2, 3], jnp.int32)
    toks1 = [r.token for r in stream_generate(model, prompt, max_tokens=8)]
    toks2 = [r.token for r in stream_generate(model, prompt, max_tokens=8)]
    assert toks1 == toks2
    assert len(toks1) == 8
    # matches manual greedy decode
    ids = prompt[None]
    manual = []
    for _ in range(8):
        logits, _ = model(ids)
        nxt = int(jnp.argmax(logits[0, -1]))
        manual.append(nxt)
        ids = jnp.concatenate([ids, jnp.asarray([[nxt]])], axis=1)
    assert toks1 == manual


def test_stream_generate_eos_stops():
    model = CausalLM(tiny_cfg())
    prompt = jnp.asarray([1, 2, 3], jnp.int32)
    first = next(iter(stream_generate(model, prompt, max_tokens=8))).token
    rs = list(stream_generate(model, prompt, max_tokens=8, eos_token_ids={first}))
    assert rs[-1].finish_reason == "stop"


def test_samplers():
    logits = jnp.asarray([[1.0, 3.0, 2.0, -1.0]])
    k2 = top_k_filter(logits, 2)
    assert np.isneginf(np.asarray(k2))[0, [0, 3]].all()
    assert np.isfinite(np.asarray(k2))[0, [1, 2]].all()

    p = top_p_filter(logits, 0.5)
    # top prob token (index 1) always kept
    assert np.isfinite(np.asarray(p)[0, 1])

    greedy = make_sampler(temp=0.0)
    assert int(greedy(logits, jax.random.PRNGKey(0))[0]) == 1

    stoch = make_sampler(temp=1.0, top_k=2)
    toks = {int(stoch(logits, jax.random.PRNGKey(i))[0]) for i in range(20)}
    assert toks <= {1, 2}


def test_repetition_penalty():
    logits = jnp.asarray([[2.0, 2.0, -2.0]])
    hist = jnp.asarray([[0, 2, -1, -1]])
    out = np.asarray(apply_repetition_penalty(logits, hist, 2.0))
    assert out[0, 0] == 1.0  # positive → divided
    assert out[0, 1] == 2.0  # untouched
    assert out[0, 2] == -4.0  # negative → multiplied


def test_gpt2_cached_decode():
    cfg = GPT2Config(n_embd=32, n_head=4, n_layer=2, n_positions=64, vocab_size=50)
    m = GPT2Model(cfg)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 50, (1, 10)))
    full, _ = m(ids)
    caches = m.make_caches(1, max_len=16)
    h, caches = m(ids[:, :6], caches)
    np.testing.assert_allclose(np.asarray(h), np.asarray(full[:, :6]), atol=2e-2, rtol=1e-2)
    for t in range(6, 10):
        h, caches = m(ids[:, t : t + 1], caches)
        np.testing.assert_allclose(
            np.asarray(h[:, 0]), np.asarray(full[:, t]), atol=2e-2, rtol=1e-2
        )

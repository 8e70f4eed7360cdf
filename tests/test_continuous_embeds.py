"""Embedding-prompt continuous batching: audio-conditioned LLM STT
families (Qwen3-ASR / Voxtral / GLM-ASR) share the lock-step decode pool
via `ContinuousBatcher.submit_embeds` — the round-3 gap where concurrent
server requests for these families serialized (reference server.py:74-94
behavior) closes the same way the token-prompt families did."""

import numpy as np
import pytest

from mlx_audio_tpu.lm import CausalLM, LMConfig
from mlx_audio_tpu.lm.continuous import ContinuousBatcher


@pytest.fixture(scope="module")
def lm():
    from mlx_audio_tpu.nn import seed_rng

    seed_rng(7)
    cfg = LMConfig(
        hidden_size=64,
        num_hidden_layers=2,
        intermediate_size=128,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=97,
    )
    return CausalLM(cfg)


def test_embeds_prompt_matches_token_prompt(lm):
    """Prefilling the prompt's own embedding matrix must decode exactly
    like prefilling the token ids (same math, embedding table bypassed)."""
    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(1, 97, n)) for n in (5, 11)]
    emb_table = np.asarray(lm.model.embed_tokens.weight, np.float32)

    cb = ContinuousBatcher(lm, slots=2, max_len=256, cache_dtype=np.float32)
    try:
        ref = [cb.submit(p, max_tokens=10).result(timeout=300)
               for p in prompts]
        futs = [cb.submit_embeds(emb_table[np.asarray(p)], max_tokens=10)
                for p in prompts]
        outs = [f.result(timeout=300) for f in futs]
    finally:
        cb.close()
    assert outs == ref


def test_embeds_sampled_batched_equals_sequential(lm):
    """Sampled embeds requests fuse and stay seed-deterministic: batched
    == one-slot-sequential on the same engine."""
    rng = np.random.default_rng(3)
    emb = [rng.standard_normal((n, 64)).astype(np.float32) * 0.1
           for n in (4, 9, 6)]
    seeds = [7, 8, 9]
    samp = dict(temp=0.8, top_k=12, top_p=0.9)

    def run(slots, items):
        cb = ContinuousBatcher(lm, slots=slots, max_len=256,
                               cache_dtype=np.float32, tick_tokens=4)
        try:
            futs = [cb.submit_embeds(e, max_tokens=12, seed=s, **samp)
                    for e, s in items]
            return [f.result(timeout=600) for f in futs]
        finally:
            cb.close()

    batched = run(3, list(zip(emb, seeds)))
    sequential = [run(1, [(e, s)])[0] for e, s in zip(emb, seeds)]
    assert batched == sequential
    for out in batched:
        assert len(out) == 12


def _stt_batched_equals_solo(model, audios, gen_kwargs, batcher_kwargs):
    """Helper: generate() output with an installed batcher must equal the
    plain (no-hook) decode, and the decode must actually ride the pool."""
    solo = [model.generate(a, **gen_kwargs).text for a in audios]
    batcher = model.make_batcher(cache_dtype=np.float32,
                                 **batcher_kwargs).install()
    try:
        batched = [model.generate(a, **gen_kwargs).text for a in audios]
        assert batcher.dispatch_count > 0
    finally:
        batcher.close()
    assert batched == solo


def test_qwen3_asr_routes_through_installed_batcher():
    import sys

    sys.path.insert(0, "tests")
    try:
        from test_qwen3_asr import FakeTok, tiny_cfg
    finally:
        sys.path.pop(0)
    from mlx_audio_tpu.nn import seed_rng
    from mlx_audio_tpu.stt.models.qwen3_asr import Model

    seed_rng(11)
    model = Model(tiny_cfg())
    model.set_runtime(tokenizer=FakeTok())
    rng = np.random.default_rng(1)
    audios = [rng.standard_normal(8000).astype(np.float32) * 0.1
              for _ in range(2)]
    _stt_batched_equals_solo(
        model, audios, dict(max_tokens=8), dict(slots=2, max_len=256))


def test_glmasr_routes_through_installed_batcher():
    import sys

    sys.path.insert(0, "tests")
    try:
        from test_glmasr import FakeTok, tiny_cfg
    finally:
        sys.path.pop(0)
    from mlx_audio_tpu.nn import seed_rng
    from mlx_audio_tpu.stt.models.glmasr import Model

    seed_rng(12)
    model = Model(tiny_cfg())
    model.set_runtime(tokenizer=FakeTok())
    rng = np.random.default_rng(2)
    audios = [rng.standard_normal(16000).astype(np.float32) * 0.1
              for _ in range(2)]
    _stt_batched_equals_solo(
        model, audios, dict(max_tokens=6), dict(slots=2, max_len=512))


def test_voxtral_routes_through_installed_batcher():
    from mlx_audio_tpu.nn import seed_rng
    from mlx_audio_tpu.stt.models.voxtral import Model, ModelConfig

    seed_rng(13)
    cfg = ModelConfig.from_dict(dict(
        audio_config=dict(num_mel_bins=80, d_model=64, encoder_layers=1,
                          encoder_attention_heads=4, encoder_ffn_dim=128,
                          intermediate_size=256, max_source_positions=1500),
        text_config=dict(hidden_size=64, num_hidden_layers=1,
                         intermediate_size=128, num_attention_heads=4,
                         num_key_value_heads=2, vocab_size=1000),
    ))
    model = Model(cfg)

    class Tok:
        def decode(self, ids, **kw):
            return "".join(chr(97 + (i % 26)) for i in ids)

    rng = np.random.default_rng(3)
    audios = [rng.standard_normal(16000).astype(np.float32) * 0.05
              for _ in range(2)]
    _stt_batched_equals_solo(
        model, audios, dict(max_tokens=8, tokenizer=Tok()),
        dict(slots=2, max_len=1024))


def test_funasr_routes_through_installed_batcher():
    import sys

    sys.path.insert(0, "tests")
    try:
        from test_funasr import FakeTok, tiny_cfg
    finally:
        sys.path.pop(0)
    from mlx_audio_tpu.nn import seed_rng
    from mlx_audio_tpu.stt.models.funasr import Model

    seed_rng(14)
    model = Model(tiny_cfg())
    model.set_runtime(tokenizer=FakeTok())
    rng = np.random.default_rng(4)
    audios = [rng.standard_normal(8000).astype(np.float32) * 0.1
              for _ in range(2)]
    _stt_batched_equals_solo(
        model, audios, dict(max_tokens=6), dict(slots=2, max_len=512))

def test_vibevoice_asr_routes_through_installed_batcher():
    import sys

    sys.path.insert(0, "tests")
    try:
        from test_vibevoice_asr import FakeTokenizer, tiny_config
    finally:
        sys.path.pop(0)
    from mlx_audio_tpu.nn import seed_rng
    from mlx_audio_tpu.stt.models.vibevoice_asr import Model

    seed_rng(15)
    model = Model(tiny_config())
    model.set_runtime(tokenizer=FakeTokenizer())
    rng = np.random.default_rng(5)
    audios = [rng.standard_normal(128).astype(np.float32) * 0.1
              for _ in range(2)]
    _stt_batched_equals_solo(
        model, audios, dict(max_tokens=8), dict(slots=2, max_len=512))

"""Continuous (slot-based) batching tests: parity with single-request
decode, mid-flight joins, slot reuse under load."""

import numpy as np
import pytest

from mlx_audio_tpu.lm import CausalLM, LMConfig
from mlx_audio_tpu.lm.continuous import ContinuousBatcher
from mlx_audio_tpu.lm.generate import generate_tokens


@pytest.fixture(scope="module")
def lm():
    from mlx_audio_tpu.nn import seed_rng

    seed_rng(0)  # exact-token assertions need order-independent weights
    cfg = LMConfig(
        hidden_size=64,
        num_hidden_layers=2,
        intermediate_size=128,
        num_attention_heads=4,
        num_key_value_heads=2,
        vocab_size=97,
    )
    return CausalLM(cfg)


def _ref_decode(model, prompt, n, eos=()):
    toks, _ = generate_tokens(
        model, np.asarray(prompt, np.int32), max_tokens=n,
        eos_token_ids=tuple(eos), temp=0.0,
    )
    return list(toks[0])


def test_matches_single_request_decode(lm):
    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(1, 97, n)) for n in (5, 11, 3)]
    refs = [_ref_decode(lm, p, 12) for p in prompts]

    cb = ContinuousBatcher(lm, slots=4, max_len=256, cache_dtype=np.float32)
    try:
        futs = [cb.submit(p, max_tokens=12) for p in prompts]
        outs = [f.result(timeout=300) for f in futs]
    finally:
        cb.close()
    for ref, out in zip(refs, outs):
        assert out == ref, (out, ref)


def test_eos_stops_stream(lm):
    rng = np.random.default_rng(1)
    prompt = list(rng.integers(1, 97, 6))
    ref = _ref_decode(lm, prompt, 24)
    # pick a token value and stop at its FIRST occurrence in the greedy ref
    first_idx = {}
    for i, t in enumerate(ref):
        first_idx.setdefault(int(t), i)
    eos, k = max(first_idx.items(), key=lambda kv: kv[1])
    cb = ContinuousBatcher(lm, slots=2, max_len=128, cache_dtype=np.float32)
    try:
        out = cb.submit(prompt, max_tokens=24, eos_ids=[eos]).result(timeout=300)
    finally:
        cb.close()
    assert out == ref[: k + 1]
    assert out[-1] == eos


def test_mid_flight_join_and_slot_reuse(lm):
    rng = np.random.default_rng(2)
    prompts = [list(rng.integers(1, 97, n)) for n in (4, 7, 9, 5, 6)]
    refs = [_ref_decode(lm, p, 10) for p in prompts]

    # 2 slots, 5 requests → joins must happen mid-flight and slots recycle
    cb = ContinuousBatcher(lm, slots=2, max_len=128, cache_dtype=np.float32)
    try:
        futs = []
        for i, p in enumerate(prompts):
            futs.append(cb.submit(p, max_tokens=10))
        outs = [f.result(timeout=600) for f in futs]
        steps = cb.steps
    finally:
        cb.close()
    for i, (ref, out) in enumerate(zip(refs, outs)):
        assert out == ref, (i, out, ref)
    # lock-step sharing: fewer total steps than 5 sequential × 9 steps
    assert steps < 5 * 9


def test_streaming_callback(lm):
    rng = np.random.default_rng(3)
    prompt = list(rng.integers(1, 97, 5))
    seen = []
    cb = ContinuousBatcher(lm, slots=1, max_len=128, cache_dtype=np.float32)
    try:
        out = cb.submit(
            prompt, max_tokens=6, on_token=seen.append
        ).result(timeout=300)
    finally:
        cb.close()
    assert seen == out


def test_top_p_and_repetition_penalty_sampling(lm):
    """Batcher host sampler honors top_p/rep-penalty (smoke: no crash,
    deterministic seed, tokens in range)."""
    rng = np.random.default_rng(5)
    prompt = list(rng.integers(1, 97, 6))
    cb = ContinuousBatcher(lm, slots=1, max_len=128, cache_dtype=np.float32)
    try:
        out = cb.submit(prompt, max_tokens=8, temp=0.8, top_p=0.9,
                        repetition_penalty=1.3,
                        repetition_context_size=16).result(timeout=300)
    finally:
        cb.close()
    assert len(out) == 8
    assert all(0 <= t < 97 for t in out)


def test_snac_lm_routes_through_installed_batcher():
    """Orpheus-style model + installed LMContinuousBatcher: generate()
    decodes via lock-step batched steps."""
    from mlx_audio_tpu.serving import get_infer_hook
    from mlx_audio_tpu.tts.models.llama import Model, ModelConfig

    from mlx_audio_tpu.nn import seed_rng

    seed_rng(1)
    cfg = ModelConfig(
        hidden_size=64, num_hidden_layers=1, intermediate_size=128,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=130000,
    )
    model = Model(cfg)

    class Enc:
        def __init__(self, ids):
            self.input_ids = ids

    class Tok:
        def __call__(self, text, **kw):
            return Enc([(ord(c) % 90) + 10 for c in text[:16]])

    class FakeSnac:
        sample_rate = 24000

        def decode(self, layers):
            n = sum(np.asarray(l).size for l in layers)
            return np.zeros(max(n, 1) * 512, np.float32)

    model.set_runtime(tokenizer=Tok(), codec=FakeSnac())
    batcher = model.make_batcher(slots=2, max_len=512,
                                 cache_dtype=np.float32).install()
    try:
        assert get_infer_hook(model) is batcher
        results = list(model.generate("hello world", max_tokens=16,
                                      temperature=0.0))
        assert batcher.dispatch_count > 0
        for r in results:
            assert r.sample_rate == 24000
    finally:
        batcher.close()
    assert get_infer_hook(model) is None


def test_batcher_with_tensor_parallel_model(lm, monkeypatch):
    """Distributed serving end-to-end: the batcher's jitted step runs a
    TP-sharded model (MLX_AUDIO_TPU_TP path) and stays token-exact."""
    from mlx_audio_tpu.utils import maybe_shard_for_serving

    rng = np.random.default_rng(7)
    prompts = [list(rng.integers(1, 97, n)) for n in (4, 9)]
    refs = [_ref_decode(lm, p, 10) for p in prompts]

    monkeypatch.setenv("MLX_AUDIO_TPU_TP", "4")
    sharded = maybe_shard_for_serving(lm)
    cb = ContinuousBatcher(sharded, slots=2, max_len=128,
                           cache_dtype=np.float32)
    try:
        futs = [cb.submit(p, max_tokens=10) for p in prompts]
        outs = [f.result(timeout=120) for f in futs]
    finally:
        cb.close()
    assert [list(o) for o in outs] == refs


def test_fused_ticks_match_per_token(lm):
    """tick_tokens>1 fuses n greedy steps per dispatch (_step_n) and must
    produce exactly the per-token-tick (and single-request) tokens."""
    rng = np.random.default_rng(7)
    prompts = [list(rng.integers(1, 97, n)) for n in (5, 11, 3)]
    refs = [_ref_decode(lm, p, 12) for p in prompts]

    cb = ContinuousBatcher(lm, slots=4, max_len=256,
                           cache_dtype=np.float32, tick_tokens=4)
    try:
        futs = [cb.submit(p, max_tokens=12) for p in prompts]
        outs = [f.result(timeout=300) for f in futs]
        fused_steps = cb.steps
    finally:
        cb.close()
    for ref, out in zip(refs, outs):
        assert out == ref, (out, ref)
    # 12 tokens at 4 per tick -> ~3 fused dispatches (+ join boundaries),
    # far below the 12+ of per-token ticking
    assert fused_steps <= 8


def test_fused_ticks_truncate_at_eos(lm):
    """A request hitting EOS mid-chunk keeps tokens only up to EOS."""
    rng = np.random.default_rng(8)
    prompt = list(rng.integers(1, 97, 6))
    ref = _ref_decode(lm, prompt, 24)
    first_idx = {}
    for i, t in enumerate(ref):
        first_idx.setdefault(int(t), i)
    eos, k = max(first_idx.items(), key=lambda kv: kv[1])

    cb = ContinuousBatcher(lm, slots=2, max_len=128,
                           cache_dtype=np.float32, tick_tokens=5)
    try:
        out = cb.submit(prompt, max_tokens=24,
                        eos_ids=[eos]).result(timeout=300)
    finally:
        cb.close()
    assert out == ref[:k + 1]


def test_sampled_requests_stay_fused(lm):
    """A live sampling request no longer collapses the pool to per-token
    ticks: sampling is in-graph, so mixed greedy+sampled pools fuse and
    the greedy stream stays exact."""
    rng = np.random.default_rng(9)
    g_prompt = list(rng.integers(1, 97, 5))
    s_prompt = list(rng.integers(1, 97, 4))
    ref = _ref_decode(lm, g_prompt, 10)

    cb = ContinuousBatcher(lm, slots=2, max_len=128,
                           cache_dtype=np.float32, tick_tokens=4)
    try:
        f1 = cb.submit(g_prompt, max_tokens=10)
        f2 = cb.submit(s_prompt, max_tokens=10, temp=0.8, top_k=5, seed=3)
        out1 = f1.result(timeout=300)
        out2 = f2.result(timeout=300)
        fused_steps = cb.steps
    finally:
        cb.close()
    assert out1 == ref
    assert len(out2) == 10
    # 10 tokens at 4/tick → ≤ 2·ceil(10/4) fused dispatches even with
    # staggered joins; per-token ticking would need ≥ 10
    assert fused_steps <= 7


def _cb_decode(lm, prompts, seeds, slots, tick_tokens, max_tokens=12,
               **samp):
    cb = ContinuousBatcher(lm, slots=slots, max_len=256,
                           cache_dtype=np.float32, tick_tokens=tick_tokens)
    try:
        futs = [cb.submit(p, max_tokens=max_tokens, seed=s, **samp)
                for p, s in zip(prompts, seeds)]
        return [f.result(timeout=600) for f in futs]
    finally:
        cb.close()


def test_sampled_batched_equals_sequential(lm):
    """Token-exactness for sampled fused ticks: a request's stream depends
    only on its own seed, so fixed seeds ⇒ batched == sequential
    (one-slot pool) == per-token ticking."""
    rng = np.random.default_rng(11)
    prompts = [list(rng.integers(1, 97, n)) for n in (5, 11, 3, 8)]
    seeds = [101, 202, 303, 404]
    samp = dict(temp=0.8, top_p=0.9, top_k=12,
                repetition_penalty=1.2, repetition_context_size=16)

    batched = _cb_decode(lm, prompts, seeds, slots=4, tick_tokens=4, **samp)
    sequential = [
        _cb_decode(lm, [p], [s], slots=1, tick_tokens=4, **samp)[0]
        for p, s in zip(prompts, seeds)
    ]
    per_token = _cb_decode(lm, prompts, seeds, slots=4, tick_tokens=1,
                           **samp)
    assert batched == sequential
    assert batched == per_token
    for out in batched:
        assert len(out) == 12
        assert all(0 <= t < 97 for t in out)


def test_oversized_rep_window_falls_back_to_host(lm):
    """rep_window > rep_hist can't ride the fixed device history window;
    those requests sample host-side per-token (and force per-token ticks
    while live)."""
    rng = np.random.default_rng(13)
    prompt = list(rng.integers(1, 97, 6))
    cb = ContinuousBatcher(lm, slots=2, max_len=128,
                           cache_dtype=np.float32, tick_tokens=4,
                           rep_hist=8)
    try:
        out = cb.submit(prompt, max_tokens=10, temp=0.7,
                        repetition_penalty=1.3,
                        repetition_context_size=64, seed=5).result(
                            timeout=300)
        steps = cb.steps
    finally:
        cb.close()
    assert len(out) == 10
    assert all(0 <= t < 97 for t in out)
    assert steps >= 9  # per-token ticking: ~one dispatch per token


def test_min_p_batched_equals_sequential(lm):
    """min-p rides the in-graph per-row sampler (OuteTTS defaults
    min_p=0.05): fixed seeds ⇒ batched == one-slot == per-token, and a
    near-1 min_p degenerates to greedy."""
    rng = np.random.default_rng(17)
    prompts = [list(rng.integers(1, 97, n)) for n in (5, 9, 4)]
    seeds = [11, 22, 33]
    samp = dict(temp=0.7, top_k=40, min_p=0.05)

    batched = _cb_decode(lm, prompts, seeds, slots=3, tick_tokens=4, **samp)
    sequential = [
        _cb_decode(lm, [p], [s], slots=1, tick_tokens=4, **samp)[0]
        for p, s in zip(prompts, seeds)
    ]
    per_token = _cb_decode(lm, prompts, seeds, slots=3, tick_tokens=1,
                           **samp)
    assert batched == sequential
    assert batched == per_token

    # min_p → 1 keeps only tokens with prob ≥ max prob ⇒ argmax survives
    ref = _ref_decode(lm, prompts[0], 12)
    got = _cb_decode(lm, [prompts[0]], [seeds[0]], slots=1, tick_tokens=4,
                     temp=0.7, min_p=0.999999)[0]
    assert got == ref


def test_spark_routes_through_installed_batcher():
    """Spark + installed LMContinuousBatcher: generate() decodes the
    semantic-token stream via lock-step batched steps on `model.llm`."""
    from mlx_audio_tpu.nn import seed_rng
    from mlx_audio_tpu.serving import get_infer_hook
    from mlx_audio_tpu.tts.models.spark import Model, ModelConfig

    seed_rng(2)
    cfg = ModelConfig(llm=dict(
        vocab_size=2000, hidden_size=64, intermediate_size=128,
        num_hidden_layers=1, num_attention_heads=4, num_key_value_heads=2,
    ))
    model = Model(cfg)

    class Tok:
        eos_token_id = 2

        def encode(self, text):
            return [(ord(c) % 90) + 10 for c in text[:12]]

        def decode(self, toks):
            return "<|bicodec_global_3|>" + "".join(
                f"<|bicodec_semantic_{int(t) % 32}|>" for t in toks)

    class Bicodec:
        def detokenize(self, semantic, glob):
            n = int(np.asarray(semantic).shape[-1])
            return np.zeros((1, max(n, 1) * 320), np.float32)

    model.set_runtime(tokenizer=Tok(), bicodec=Bicodec())
    batcher = model.make_batcher(slots=2, max_len=256,
                                 cache_dtype=np.float32).install()
    try:
        assert get_infer_hook(model) is batcher
        results = list(model.generate("hello", gender="male",
                                      max_tokens=12, temperature=0.0))
        assert batcher.dispatch_count > 0
        assert results and results[0].sample_rate == 16000
    finally:
        batcher.close()
    assert get_infer_hook(model) is None


def test_outetts_routes_through_installed_batcher():
    """OuteTTS + installed LMContinuousBatcher: the non-stream generate()
    path decodes via lock-step batched steps (min_p in-graph)."""
    import sys

    from mlx_audio_tpu.nn import seed_rng
    from mlx_audio_tpu.serving import get_infer_hook
    from mlx_audio_tpu.tts.models.outetts import Model, ModelConfig

    sys.path.insert(0, "tests")
    try:
        from test_tts_small_models import FakeTok
    finally:
        sys.path.pop(0)

    seed_rng(3)
    cfg = ModelConfig(hidden_size=64, num_hidden_layers=1,
                      intermediate_size=128, num_attention_heads=4,
                      num_key_value_heads=2, vocab_size=5000,
                      model_type="qwen3")
    model = Model(cfg)

    class Codec:
        def decode_codes(self, codes):
            T = np.asarray(codes).shape[-1]
            return np.zeros((1, 1, T * 512), np.float32)

    model.set_runtime(tokenizer=FakeTok(), codec=Codec())
    batcher = model.make_batcher(slots=2, max_len=512,
                                 cache_dtype=np.float32).install()
    try:
        assert get_infer_hook(model) is batcher
        results = list(model.generate("Hello world.", temperature=0.8,
                                      max_tokens=24))
        assert batcher.dispatch_count > 0
        for r in results:
            assert r.sample_rate == 24000
    finally:
        batcher.close()
    assert get_infer_hook(model) is None

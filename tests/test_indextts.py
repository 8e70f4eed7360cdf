"""IndexTTS: conformer/perceiver conditioning, GPT latent loop, vocoder."""

import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.tts.models.indextts import (
    ConformerArgs,
    GPTConfig,
    Model,
    ModelArgs,
)


def tiny_args():
    return ModelArgs(
        gpt=GPTConfig(
            model_dim=32, heads=4, layers=2, max_mel_tokens=32,
            max_text_tokens=32, number_text_tokens=60, number_mel_codes=70,
            start_mel_token=68, stop_mel_token=69, start_text_token=0,
            stop_text_token=1, condition_num_latent=4,
            condition_module=ConformerArgs(
                input_size=16, output_size=24, num_blocks=1,
                linear_units=48, attention_heads=2, perceiver_mult=2)),
        bigvgan={
            "num_mels": 16, "upsample_rates": [4, 2],
            "upsample_kernel_sizes": [8, 4],
            "upsample_initial_channel": 16, "resblock": "1",
            "resblock_kernel_sizes": [3],
            "resblock_dilation_sizes": [[1, 2]],
            "activation": "snakebeta", "snake_logscale": True,
            "gpt_dim": 32, "speaker_embedding_dim": 12,
        },
        sample_rate=24000,
    )


class FakeTok:
    def encode(self, text):
        return [(ord(c) % 50) + 2 for c in text][:8]


def test_conditioning_shapes():
    model = Model(tiny_args())
    mel = jnp.asarray(np.random.randn(1, 40, 16).astype(np.float32))
    cond = model.get_conditioning(mel)
    assert cond.shape == (1, 4, 32)  # n_latents × model_dim


def test_generate_end_to_end():
    model = Model(tiny_args())
    model.set_runtime(tokenizer=FakeTok())
    ref = np.random.randn(12000).astype(np.float32) * 0.1
    results = list(model.generate("hello", ref_audio=ref, max_tokens=8,
                                  seed=0))
    assert len(results) == 1
    assert results[0].audio.size > 0
    assert np.isfinite(results[0].audio).all()


def test_text_normalization():
    """Reference normalize.py behavior: en numbers/currency spelled out,
    contractions expanded, zh punctuation folded, pinyin j/q/x respelled,
    CJK chars space-tokenized and uppercased."""
    from mlx_audio_tpu.tts.models.indextts import normalize as N

    assert N.normalize("I have $42 and 3 cats") == \
        "I have forty two dollars and three cats"
    assert N.normalize("what's 1 2 3") == "what is one two three"
    assert N.number_to_words(0) == "zero"
    assert N.number_to_words(1234567) == \
        "one million two hundred thirty four thousand five hundred sixty seven"
    assert N.use_chinese("你好") and not N.use_chinese("hello")
    assert N.use_chinese("ni3 hao3")  # pinyin routes to zh
    assert N.normalize_chinese("你好，世界！") == "你好,世界!"
    assert N.correct_pinyin("ju4") == "JV4"
    assert N.correct_pinyin("ma1") == "ma1"
    assert N.tokenize_by_CJK_char("你好世界是 hello world 的中文") == \
        "你 好 世 界 是 HELLO WORLD 的 中 文"


def test_generate_default_max_tokens_matches_reference():
    """Default max_tokens is 5000 (reference indextts.py:359); the decode
    loop itself is capped by gpt.max_mel_tokens so the large default costs
    nothing."""
    import inspect

    from mlx_audio_tpu.tts.models.indextts.indextts import Model

    sig = inspect.signature(Model.generate)
    assert sig.parameters["max_tokens"].default == 5000


def _idx_embed(model, text="hello"):
    import numpy as np

    tokens = FakeTok().encode(text)
    ref_mel = np.random.default_rng(0).standard_normal(
        (1, 40, 16)).astype(np.float32) * 0.1
    return model.prepare_input_embedding(tokens, ref_mel), ref_mel


def test_indextts_batcher_greedy_matches_direct_loop():
    """temp=0 through the batcher equals the single-request
    `_indextts_decode` while_loop (latents incl. the EOS step)."""
    import jax
    import numpy as np

    from mlx_audio_tpu.lm.cache import KVCache
    from mlx_audio_tpu.nn import seed_rng
    from mlx_audio_tpu.tts.models.indextts.indextts import _indextts_decode

    seed_rng(61)
    model = Model(tiny_args())
    emb, _mel = _idx_embed(model)
    T0 = emb.shape[1]
    g = model.args.gpt
    Tp = max(16, ((T0 + 15) // 16) * 16)
    import jax.numpy as jnp

    emb_pad = jnp.pad(jnp.asarray(emb), ((0, 0), (0, Tp - T0), (0, 0)))
    caches = [KVCache(1, g.heads, Tp + 12 + 1, g.model_dim // g.heads,
                      jnp.float32) for _ in range(g.layers)]
    lat_ref, n = _indextts_decode(
        model, caches, emb_pad, jnp.asarray(T0), jax.random.PRNGKey(0),
        12, 0.0, 0, None)
    n = int(n)
    ref = np.asarray(lat_ref)[:min(n, 12)]

    b = model.make_batcher(slots=2, max_len=128, tick_frames=4)
    try:
        out = b.submit(np.asarray(emb), max_tokens=12, temperature=0.0,
                       top_k=0, seed=0).result(timeout=600)
    finally:
        b.close()
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_indextts_batcher_batched_equals_sequential():
    import numpy as np

    from mlx_audio_tpu.nn import seed_rng

    seed_rng(62)
    model = Model(tiny_args())
    embs = [np.asarray(_idx_embed(model, t)[0])
            for t in ("hello there", "different text")]
    seeds = [5, 9]

    def run(slots, items):
        b = model.make_batcher(slots=slots, max_len=128, tick_frames=4)
        try:
            futs = [b.submit(e, max_tokens=10, temperature=0.8, top_k=12,
                             seed=s) for e, s in items]
            return [f.result(timeout=600) for f in futs], b.steps
        finally:
            b.close()

    batched, steps = run(2, list(zip(embs, seeds)))
    for (e, s), ref in zip(zip(embs, seeds), batched):
        alone, _ = run(2, [(e, s)])
        np.testing.assert_allclose(alone[0], ref, atol=1e-6)
    assert steps <= 8


def test_indextts_generate_routes_through_batcher():
    import numpy as np

    from mlx_audio_tpu.nn import seed_rng
    from mlx_audio_tpu.serving import get_infer_hook

    seed_rng(63)
    model = Model(tiny_args())
    model.set_runtime(tokenizer=FakeTok())
    ref_audio = np.random.default_rng(1).standard_normal(4096).astype(
        np.float32) * 0.1
    batcher = model.make_batcher(slots=2, max_len=128, tick_frames=4)
    batcher.install()
    try:
        assert get_infer_hook(model) is batcher
        results = list(model.generate("Hello.", ref_audio=ref_audio,
                                      max_tokens=10, seed=0))
        assert batcher.steps > 0
        assert results[0].samples > 0
    finally:
        batcher.close()
    assert get_infer_hook(model) is None

"""Frame-level continuous batching (Sesame, Qwen3-TTS): batched output
must equal running each request alone; mixed pools fuse into one device
dispatch per tick."""

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# Sesame
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def sesame_model():
    from mlx_audio_tpu.nn import seed_rng
    from mlx_audio_tpu.tts.models.sesame.sesame import ModelConfig, SesameModel

    seed_rng(0)
    cfg = ModelConfig(
        text_vocab_size=100, audio_vocab_size=32, audio_num_codebooks=4,
        hidden_size=64, num_hidden_layers=2, intermediate_size=128,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        depth_decoder_config=dict(
            backbone_hidden_size=64, hidden_size=32, intermediate_size=64,
            num_attention_heads=2, num_key_value_heads=1, head_dim=16,
            num_hidden_layers=1, num_codebooks=4, vocab_size=32,
        ),
        rope_scaling={"rope_type": "default"},
    )
    return SesameModel(cfg)


def _sesame_prompt(T, seed):
    rng = np.random.default_rng(seed)
    tokens = np.zeros((1, T, 5), np.int32)
    tokens[:, :, -1] = rng.integers(1, 100, T)
    mask = np.zeros((1, T, 5), bool)
    mask[:, :, -1] = True
    return tokens, mask


def _sesame_batch_decode(model, prompts, seeds, slots, temp=0.8, top_k=8,
                         max_frames=8, tick_frames=3):
    from mlx_audio_tpu.tts.models.sesame.batcher import SesameBatcher

    b = SesameBatcher(model, slots=slots, max_len=128,
                      tick_frames=tick_frames)
    try:
        futs = [
            b.submit(t, m, max_frames=max_frames, temp=temp, top_k=top_k,
                     seed=s)
            for (t, m), s in zip(prompts, seeds)
        ]
        outs = [f.result(timeout=600) for f in futs]
        return outs, b.steps
    finally:
        b.close()


def test_sesame_batched_equals_sequential(sesame_model):
    """Per-slot PRNG streams: fixed seeds ⇒ batched frames == running each
    request on a one-slot pool."""
    prompts = [_sesame_prompt(T, s) for T, s in ((5, 0), (9, 1), (3, 2))]
    seeds = [11, 22, 33]
    batched, steps = _sesame_batch_decode(
        sesame_model, prompts, seeds, slots=3)
    for (t, m), s, ref in zip(prompts, seeds, batched):
        alone, _ = _sesame_batch_decode(sesame_model, [(t, m)], [s], slots=3)
        np.testing.assert_array_equal(alone[0], ref)
    # 8 frames at 3/tick → ~3 fused dispatches for the whole pool
    assert steps <= 5


def test_sesame_greedy_matches_direct_loop(sesame_model):
    """temp=0 through the batcher equals the single-request on-device
    loop `_generate_frames`."""
    import jax
    import jax.numpy as jnp

    from mlx_audio_tpu.tts.models.sesame.sesame import (_generate_frames,
                                                        _prefill)

    tokens, mask = _sesame_prompt(6, 7)
    max_frames = 8
    caches = sesame_model.make_backbone_caches(1, 128)
    h_last, caches = _prefill(
        sesame_model, caches, jnp.asarray(tokens), jnp.asarray(mask))
    frames, n = _generate_frames(
        sesame_model, caches, h_last, jax.random.PRNGKey(0),
        max_frames, 0.0, 0)
    ref = np.asarray(frames)[0, : int(n)]

    out, _ = _sesame_batch_decode(
        sesame_model, [(tokens, mask)], [0], slots=2, temp=0.0, top_k=0,
        max_frames=max_frames)
    np.testing.assert_array_equal(out[0], ref)


# ---------------------------------------------------------------------------
# Qwen3-TTS
# ---------------------------------------------------------------------------


class _FakeTok:
    def encode(self, text, **kw):
        return [(ord(c) % 97) + 3 for c in text[:48]]


@pytest.fixture(scope="module")
def qwen3_model():
    from mlx_audio_tpu.nn import seed_rng
    from mlx_audio_tpu.tts.models.qwen3_tts import Model, ModelConfig

    seed_rng(2)
    cfg = ModelConfig.from_dict(dict(
        talker_config=dict(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=16, text_hidden_size=96,
            text_vocab_size=512, num_code_groups=4,
            codec_eos_token_id=200, codec_think_id=210, codec_nothink_id=211,
            codec_think_bos_id=212, codec_think_eos_id=213, codec_pad_id=214,
            codec_bos_id=215,
            rope_scaling={"mrope_section": [4, 2, 2]},
            code_predictor_config=dict(
                vocab_size=128, hidden_size=48, intermediate_size=96,
                num_hidden_layers=1, num_attention_heads=4,
                num_key_value_heads=2, head_dim=12, num_code_groups=4,
            ),
        ),
        tokenizer_config=dict(
            decoder_config=dict(
                latent_dim=48, codebook_dim=32, codebook_size=128,
                decoder_dim=64, hidden_size=32, intermediate_size=64,
                head_dim=8, num_attention_heads=4, num_hidden_layers=1,
                num_key_value_heads=4, num_quantizers=4,
                num_semantic_quantizers=1, sliding_window=8,
                upsample_rates=[4, 2], upsampling_ratios=[2],
            ),
            encoder_config=None,
        ),
    ))
    m = Model(cfg)
    m.set_runtime(tokenizer=_FakeTok())
    return m


def _qwen3_batch_decode(model, texts, seeds, slots, max_tokens=10,
                        tick_frames=4, **samp):
    futs, outs = [], []
    b = model.make_batcher(slots=slots, max_len=256,
                           tick_frames=tick_frames)
    try:
        for text, seed in zip(texts, seeds):
            emb, tr, _pad = model._prepare_generation_inputs(text)
            futs.append(b.submit(emb, tr, max_tokens=max_tokens, seed=seed,
                                 **samp))
        outs = [f.result(timeout=600) for f in futs]
        return outs, b.steps
    finally:
        b.close()


def test_qwen3_greedy_matches_direct_loop(qwen3_model):
    """temp=0 (+rep penalty) through the batcher equals the single-request
    on-device while_loop (`_run_codes`)."""
    text = "Hello there, frame batching."
    emb, tr, pad = qwen3_model._prepare_generation_inputs(text)
    direct = list(qwen3_model._run_codes(
        emb, tr, pad, max_tokens=10, chunk_tokens=10, temperature=0.0,
        top_k=0, top_p=1.0, repetition_penalty=1.1))
    ref = (np.concatenate(direct, axis=0) if direct
           else np.zeros((0, 4), np.int32))

    outs, _ = _qwen3_batch_decode(
        qwen3_model, [text], [0], slots=2, temperature=0.0, top_k=0,
        top_p=1.0, repetition_penalty=1.1)
    np.testing.assert_array_equal(outs[0], ref)


def test_qwen3_batched_equals_sequential(qwen3_model):
    """Fixed per-request seeds ⇒ sampled batched frames == one-slot pool."""
    texts = ["First utterance to speak.", "And a second, different one."]
    seeds = [5, 9]
    samp = dict(temperature=0.9, top_k=20, top_p=0.95,
                repetition_penalty=1.05)
    batched, steps = _qwen3_batch_decode(
        qwen3_model, texts, seeds, slots=2, **samp)
    for text, seed, ref in zip(texts, seeds, batched):
        alone, _ = _qwen3_batch_decode(
            qwen3_model, [text], [seed], slots=2, **samp)
        np.testing.assert_array_equal(alone[0], ref)
    assert steps <= 8  # 10 frames at 4/tick, both slots lock-step


def test_qwen3_generate_routes_through_batcher(qwen3_model):
    """End-to-end: Model.generate with an installed batcher produces audio
    via lock-step batched frame ticks."""
    from mlx_audio_tpu.serving import get_infer_hook

    batcher = qwen3_model.make_batcher(slots=2, max_len=256, tick_frames=4)
    batcher.install()
    try:
        assert get_infer_hook(qwen3_model) is batcher
        results = list(qwen3_model.generate(
            "Hello there, world.", max_tokens=12, temperature=0.9,
            top_k=20))
        for r in results:
            assert r.sample_rate == 24000
            assert r.samples > 0
            assert np.isfinite(r.audio).all()
    finally:
        batcher.close()
    assert get_infer_hook(qwen3_model) is None


def test_sesame_generate_routes_through_batcher(sesame_model):
    """End-to-end: Model.generate with an installed batcher produces audio
    via lock-step batched frame ticks."""
    from mlx_audio_tpu.serving import get_infer_hook
    from mlx_audio_tpu.tts.models.sesame.sesame import Model, Segment

    model = Model(sesame_model.args)
    model.model = sesame_model

    class FakeTok:
        bos_token = "<b>"
        eos_token = "<e>"
        bos_token_id = 0
        eos_token_id = 1

        class _T:
            post_processor = None

        _tokenizer = _T()

        def encode(self, text, **kw):
            return [(ord(c) % 90) + 5 for c in text[:12]]

    class FakeMimi:
        def encode(self, audio):
            n = max(1, audio.shape[-1] // 1920)
            return np.zeros((1, 4, n), np.int32) + 3

        def decode(self, codes):
            return np.zeros((1, 1, np.asarray(codes).shape[-1] * 1920),
                            np.float32)

    model.set_runtime(text_tokenizer=FakeTok(), mimi=FakeMimi())
    batcher = model.make_batcher(slots=2, max_len=256, tick_frames=4)
    batcher.install()
    try:
        assert get_infer_hook(model) is batcher
        ctx = [Segment(speaker=0, text="ref", audio=np.zeros(1920 * 3,
                                                             np.float32))]
        results = list(model.generate(
            "hello world", context=ctx, max_audio_length_ms=800,
            temperature=0.7, top_k=5, apply_watermark=False, seed=1))
        assert batcher.steps > 0
        for r in results:
            assert r.sample_rate == 24000
            assert r.samples > 0
    finally:
        batcher.close()
    assert get_infer_hook(model) is None


def test_sesame_stream_through_batcher(sesame_model):
    """stream=True under an installed SesameBatcher: frames flow through
    `on_frame` into the Mimi streaming decoder chunk-by-chunk; the total
    frame count equals the batched non-streamed run with the same seed."""
    from mlx_audio_tpu.serving import get_infer_hook
    from mlx_audio_tpu.tts.models.sesame.sesame import Model, Segment

    model = Model(sesame_model.args)
    model.model = sesame_model

    class FakeTok:
        bos_token = "<b>"
        eos_token = "<e>"
        bos_token_id = 0
        eos_token_id = 1

        class _T:
            post_processor = None

        _tokenizer = _T()

        def encode(self, text, **kw):
            return [(ord(c) % 90) + 5 for c in text[:12]]

    class FakeMimi:
        frame_size = 1920

        def encode(self, audio):
            n = max(1, audio.shape[-1] // 1920)
            return np.zeros((1, 4, n), np.int32) + 3

        def decode(self, codes):
            return np.zeros((1, 1, np.asarray(codes).shape[-1] * 1920),
                            np.float32)

        # streaming-decoder protocol (MimiStreamingDecoder)
        def init_decode_state(self, batch):
            return None

        def decode_step(self, tokens, state):
            n = np.asarray(tokens).shape[-1]
            return np.zeros((1, 1, n * 1920), np.float32), state

    model.set_runtime(text_tokenizer=FakeTok(), mimi=FakeMimi())
    ctx = [Segment(speaker=0, text="ref",
                   audio=np.zeros(1920 * 3, np.float32))]
    kw = dict(context=ctx, max_audio_length_ms=800, temperature=0.7,
              top_k=5, apply_watermark=False, seed=4)

    batcher = model.make_batcher(slots=2, max_len=256, tick_frames=4)
    batcher.install()
    try:
        assert get_infer_hook(model) is batcher
        plain = list(model.generate("hello world", **kw))
        streamed = list(model.generate(
            "hello world", stream=True, streaming_interval=0.2, **kw))
        assert batcher.steps > 0
    finally:
        batcher.close()
    assert len(streamed) >= 1
    total_plain = sum(r.token_count for r in plain)
    total_streamed = sum(r.token_count for r in streamed)
    assert total_streamed == total_plain
    for r in streamed:
        assert r.samples == r.token_count * 1920  # per-chunk Mimi decode


def test_qwen3_stream_through_batcher_equals_unbatched(qwen3_model):
    """stream=True under an installed batcher: frames are delivered
    incrementally via `on_frame` and regrouped into the same chunked codec
    decode as the single-stream streaming path — so with temp=0 the
    streamed chunk audio is bitwise equal with and without the batcher."""
    from mlx_audio_tpu.serving import get_infer_hook

    kw = dict(text="Stream me through the batcher please.", max_tokens=12,
              temperature=0.0, top_k=0, stream=True, streaming_interval=0.3)
    ref = list(qwen3_model.generate(**kw))
    assert len(ref) > 1  # actually chunked (0.3 s ⇒ ~4-frame chunks)

    batcher = qwen3_model.make_batcher(slots=2, max_len=256, tick_frames=4)
    batcher.install()
    try:
        assert get_infer_hook(qwen3_model) is batcher
        got = list(qwen3_model.generate(**kw))
        assert batcher.steps > 0  # rode the lock-step ticks
    finally:
        batcher.close()
    assert len(got) == len(ref)
    for a, b in zip(got, ref):
        assert a.is_streaming_chunk == b.is_streaming_chunk
        np.testing.assert_array_equal(np.asarray(a.audio),
                                      np.asarray(b.audio))
    assert got[-1].is_final_chunk


def test_qwen3_stream_batched_two_concurrent(qwen3_model):
    """Two concurrent stream=True requests share the slot pool; each
    stream's chunks equal its own single-stream run (fixed seeds)."""
    import threading

    texts = ["First concurrent stream.", "Second stream, different text."]
    seeds = [3, 8]
    kw = dict(max_tokens=10, temperature=0.8, top_k=12, stream=True,
              streaming_interval=0.3)
    batcher = qwen3_model.make_batcher(slots=2, max_len=256, tick_frames=4)
    batcher.install()
    outs = [None, None]
    try:
        def run(i):
            outs[i] = [np.asarray(r.audio) for r in qwen3_model.generate(
                text=texts[i], seed=seeds[i], **kw)]

        th = [threading.Thread(target=run, args=(i,)) for i in range(2)]
        [t.start() for t in th]
        [t.join(timeout=600) for t in th]
    finally:
        batcher.close()
    # per-request PRNG streams depend only on the seed, so a one-slot pool
    # must reproduce each concurrent stream exactly
    solo = qwen3_model.make_batcher(slots=2, max_len=256, tick_frames=4)
    solo.install()
    try:
        for i in range(2):
            alone = [np.asarray(r.audio) for r in qwen3_model.generate(
                text=texts[i], seed=seeds[i], **kw)]
            assert len(outs[i]) == len(alone)
            for a, b in zip(outs[i], alone):
                np.testing.assert_array_equal(a, b)
    finally:
        solo.close()


def test_frame_batcher_warmup_compiles_all_slots(qwen3_model):
    """warmup() runs a full concurrent wave: after it, a live wave of
    max-concurrency requests adds no new admit/tick compiles (every slot's
    install program is static-arg-specialized)."""
    b = qwen3_model.make_batcher(slots=3, max_len=256, tick_frames=4)
    try:
        b.warmup()
        assert b.steps > 0
        futs = []
        for i in range(3):
            emb, tr, _ = qwen3_model._prepare_generation_inputs(
                "Warm up the batcher.")
            futs.append(b.submit(emb, tr, max_tokens=4, seed=i))
        outs = [f.result(timeout=300) for f in futs]
        assert all(o.shape == (4, 4) for o in outs)
    finally:
        b.close()


def test_sesame_batcher_warmup(sesame_model):
    from mlx_audio_tpu.tts.models.sesame.batcher import SesameBatcher

    b = SesameBatcher(sesame_model, slots=2, max_len=128, tick_frames=3)
    try:
        b.warmup()
        assert b.steps > 0
    finally:
        b.close()

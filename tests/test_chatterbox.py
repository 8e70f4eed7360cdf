"""Chatterbox: T3 CFG decode, voice encoder, conditioning, full pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_tpu.tts.models.chatterbox import (
    Model,
    ModelConfig,
    T3,
    T3Cond,
    T3Config,
    VoiceEncConfig,
    VoiceEncoder,
    drop_invalid_tokens,
    punc_norm,
)

TINY_LLAMA = {
    "hidden_size": 32,
    "num_hidden_layers": 2,
    "intermediate_size": 64,
    "num_attention_heads": 4,
    "num_key_value_heads": 4,
    "head_dim": 8,
}


def tiny_t3():
    return T3Config(
        text_tokens_dict_size=50, speech_tokens_dict_size=70,
        start_speech_token=60, stop_speech_token=61,
        max_speech_tokens=64, speaker_embed_size=16,
        llama_overrides=TINY_LLAMA)


def test_punc_norm():
    assert punc_norm("hello world") == "Hello world."
    assert punc_norm("") .startswith("You need")
    assert punc_norm("Already fine!") == "Already fine!"


def test_drop_invalid_tokens():
    x = np.array([1, 2, 6561, 5, 7, 6562, 9])
    np.testing.assert_array_equal(drop_invalid_tokens(x), [5, 7])
    # no SOS/EOS → everything valid kept
    y = np.array([3, 4, 5])
    np.testing.assert_array_equal(drop_invalid_tokens(y), [3, 4, 5])


def test_t3_inference_cfg():
    t3 = T3(tiny_t3())
    cond = T3Cond(
        speaker_emb=jnp.zeros((1, 16)),
        cond_prompt_speech_tokens=jnp.zeros((1, 6), jnp.int32),
        emotion_adv=jnp.ones((1, 1, 1)) * 0.5)
    text = np.array([[255 % 50, 3, 4, 5, 0]])
    tokens = t3.inference(cond, text, max_new_tokens=12, cfg_weight=0.5,
                          key=jax.random.PRNGKey(0))
    assert tokens.shape[0] == 1
    assert tokens.shape[1] <= 12
    assert (tokens < 70).all()


def test_t3_inference_no_cfg():
    t3 = T3(tiny_t3())
    cond = T3Cond(speaker_emb=jnp.zeros((1, 16)))
    text = np.array([[3, 4, 5]])
    tokens = t3.inference(cond, text, max_new_tokens=8, cfg_weight=0.0,
                          key=jax.random.PRNGKey(1))
    assert tokens.shape[1] <= 8


def test_voice_encoder_partials():
    hp = VoiceEncConfig(num_mels=8, ve_hidden_size=16,
                        speaker_embed_size=12, ve_partial_frames=20)
    ve = VoiceEncoder(hp)
    emb = ve(jnp.asarray(np.random.randn(3, 20, 8), jnp.float32))
    assert emb.shape == (3, 12)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=1),
                               np.ones(3), rtol=1e-5)
    # full-utterance path with windowing
    wav = np.random.randn(16000).astype(np.float32) * 0.1
    out = ve.embeds_from_wavs([wav], sample_rate=16000)
    assert out.shape == (1, 12)


def _tiny_full_model():
    cfg = ModelConfig(t3_config=tiny_t3())
    model = Model(cfg)
    # shrink s3gen to a tiny footprint for the test
    from mlx_audio_tpu.codec.models.s3gen import (
        CausalMaskedDiffWithXvec, CFMParams, ConditionalDecoder,
        HiFTGenerator, UpsampleConformerEncoder,
    )
    from mlx_audio_tpu.codec.models.s3gen.s3gen import CausalConditionalCFM

    enc = UpsampleConformerEncoder(input_size=16, output_size=16,
                                   attention_heads=2, linear_units=32,
                                   num_blocks=1, num_up_blocks=1)
    est = ConditionalDecoder(in_channels=32, out_channels=8, channels=[16],
                             attention_head_dim=8, n_blocks=1,
                             num_mid_blocks=1, num_heads=2)
    cfm = CausalConditionalCFM(estimator=est, cfm_params=CFMParams())
    cfm.MEL_CHANNELS = 8
    model.s3gen.flow = CausalMaskedDiffWithXvec(
        input_size=16, output_size=8, spk_embed_dim=192, vocab_size=70,
        n_timesteps=2, encoder=enc, decoder=cfm)
    model.s3gen.mel2wav = HiFTGenerator(
        in_channels=8, base_channels=16, nb_harmonics=1,
        upsample_rates=[4, 2], upsample_kernel_sizes=[8, 4],
        resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1]],
        source_resblock_kernel_sizes=[3, 3],
        source_resblock_dilation_sizes=[[1], [1]])

    class FakeTok:
        def text_to_tokens(self, text):
            return np.asarray([[(ord(c) % 40) + 1 for c in text][:6]])

    class FakeS3:
        def quantize(self, mel, mel_len):
            n = max(4, int(mel_len[0]) // 50)
            return np.random.randint(0, 70 - 10, (1, n)), np.array([n])

    model.ve = VoiceEncoder(VoiceEncConfig(num_mels=8, ve_hidden_size=16,
                                           speaker_embed_size=16,
                                           ve_partial_frames=20))
    # random weights can sample EOS/SOS/fill tokens — suppress the special
    # range (>= start_speech_token) via a biased head so the tiny pipeline
    # always produces a few valid tokens
    import mlx_audio_tpu.nn.layers as L

    head = L.Linear(32, 70, bias=True)
    head = head.replace(weight=model.t3.speech_head.weight,
                        bias=jnp.zeros(70).at[60:].set(-50.0))
    model.t3.speech_head = head
    model.set_runtime(tokenizer=FakeTok(), s3_tokenizer=FakeS3())
    return model


def test_full_pipeline_tiny():
    model = _tiny_full_model()
    ref = np.random.randn(24000).astype(np.float32) * 0.1
    results = list(model.generate("hi", ref_audio=ref, audio_prompt_sr=24000,
                                  max_new_tokens=10, seed=0))
    assert len(results) == 1
    assert results[0].audio.size > 0
    assert np.isfinite(results[0].audio).all()


def test_chatterbox_routes_through_installed_batcher():
    """Model.generate() + installed T3Batcher: the T3 decode rides the
    lock-step CFG pool; the vocoded result stays finite audio."""
    from mlx_audio_tpu.serving import get_infer_hook

    model = _tiny_full_model()
    ref = np.random.randn(24000).astype(np.float32) * 0.1
    batcher = model.make_batcher(slots=2, max_len=256, tick_frames=4)
    batcher.install()
    try:
        assert get_infer_hook(model) is batcher
        results = list(model.generate("hi", ref_audio=ref,
                                      audio_prompt_sr=24000,
                                      max_new_tokens=10, seed=0))
        assert batcher.dispatch_count > 0
        assert len(results) == 1
        assert results[0].audio.size > 0
        assert np.isfinite(results[0].audio).all()
    finally:
        batcher.close()
    assert get_infer_hook(model) is None


def _pair_embeds(t3, text_ids):
    cond = T3Cond(
        speaker_emb=jnp.zeros((1, 16)),
        cond_prompt_speech_tokens=jnp.zeros((1, 6), jnp.int32),
        emotion_adv=jnp.ones((1, 1, 1)) * 0.5)
    return np.asarray(
        t3.build_prefill_embeds(cond, np.asarray([text_ids]), cfg_on=True),
        np.float32)


def test_t3_batcher_batched_equals_sequential():
    """CFG-paired continuous batching: a request's speech-token stream
    depends only on its own seed, so batched == one-slot-sequential on
    the same engine (sampled AND greedy)."""
    from mlx_audio_tpu.nn import seed_rng
    from mlx_audio_tpu.tts.models.chatterbox.batcher import T3Batcher

    seed_rng(5)
    t3 = T3(tiny_t3())

    class Shim:
        pass

    m = Shim()
    m.t3 = t3
    prompts = [[3, 4, 5], [7, 8, 9, 10, 11], [12, 13]]
    embeds = [_pair_embeds(t3, p) for p in prompts]
    seeds = [41, 42, 43]

    def run(slots, items, **samp):
        b = T3Batcher(m, slots=slots, max_len=256, tick_frames=4)
        try:
            futs = [b.submit(e, max_tokens=10, seed=s, **samp)
                    for e, s in items]
            outs = [list(f.result(timeout=600)) for f in futs]
            assert b.dispatch_count > 0 or all(
                len(o) <= 1 for o in outs)
            return outs
        finally:
            b.close()

    samp = dict(temperature=0.8, top_p=0.9, min_p=0.05,
                repetition_penalty=1.2, cfg_weight=0.5)
    batched = run(3, list(zip(embeds, seeds)), **samp)
    sequential = [run(2, [(e, s)], **samp)[0]
                  for e, s in zip(embeds, seeds)]
    assert batched == sequential

    greedy_b = run(3, list(zip(embeds, seeds)), temperature=0.0,
                   cfg_weight=0.5)
    greedy_s = [run(2, [(e, s)], temperature=0.0, cfg_weight=0.5)[0]
                for e, s in zip(embeds, seeds)]
    assert greedy_b == greedy_s
    for out in batched + greedy_b:
        assert len(out) <= 10
        assert all(0 <= t < 70 and t != 61 for t in out)


def test_t3_batcher_mid_flight_join_and_warmup():
    """Slots recycle under load (5 requests, 2 slots) and warmup()
    pre-compiles every slot's install + the fused tick."""
    from mlx_audio_tpu.nn import seed_rng
    from mlx_audio_tpu.tts.models.chatterbox.batcher import T3Batcher

    seed_rng(6)
    t3 = T3(tiny_t3())

    class Shim:
        pass

    m = Shim()
    m.t3 = t3
    b = T3Batcher(m, slots=2, max_len=256, tick_frames=4)
    try:
        b.warmup()
        embeds = [_pair_embeds(t3, [3 + i, 4, 5]) for i in range(5)]
        futs = [b.submit(e, max_tokens=6, seed=i, temperature=0.7)
                for i, e in enumerate(embeds)]
        outs = [list(f.result(timeout=600)) for f in futs]
    finally:
        b.close()
    assert len(outs) == 5
    for out in outs:
        assert len(out) <= 6

"""Chatterbox Turbo: GPT-2 T3 decode, meanflow CFM, tiny pipeline."""

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.tts.models.chatterbox.t3 import T3Cond
from mlx_audio_tpu.tts.models.chatterbox_turbo import (
    Model,
    ModelConfig,
    T3Turbo,
    T3TurboConfig,
)

TINY_GPT2 = {"n_embd": 32, "n_head": 4, "n_layer": 2, "n_positions": 256,
             "vocab_size": 64}


def tiny_cfg():
    return T3TurboConfig(
        text_tokens_dict_size=50, speech_tokens_dict_size=70,
        start_speech_token=60, stop_speech_token=61, max_speech_tokens=32,
        speaker_embed_size=16, speech_cond_prompt_len=8,
        gpt2_overrides=TINY_GPT2)


def test_turbo_t3_generates():
    t3 = T3Turbo(tiny_cfg())
    cond = T3Cond(speaker_emb=jnp.zeros((1, 16)),
                  cond_prompt_speech_emb=jnp.zeros((1, 4, 32)),
                  emotion_adv=None)
    toks = t3.inference_turbo(cond, np.array([[3, 4, 5]]), max_gen_len=10,
                              key=jax.random.PRNGKey(0))
    assert toks.shape[0] == 1 and toks.shape[1] <= 10
    assert (toks < 70).all()


def test_meanflow_cfm_runs():
    from mlx_audio_tpu.codec.models.s3gen import (
        CFMParams,
        ConditionalDecoder,
    )
    from mlx_audio_tpu.codec.models.s3gen.s3gen import CausalConditionalCFM

    est = ConditionalDecoder(in_channels=32, out_channels=8, channels=[16],
                             attention_head_dim=8, n_blocks=1,
                             num_mid_blocks=1, num_heads=2, meanflow=True)
    cfm = CausalConditionalCFM(estimator=est, cfm_params=CFMParams())
    cfm.MEL_CHANNELS = 8
    mu = jnp.asarray(np.random.randn(1, 12, 8), jnp.float32)
    mask = jnp.ones((1, 12, 1))
    spks = jnp.zeros((1, 8))
    cond = jnp.zeros((1, 12, 8))
    out, _ = cfm(mu, mask, 2, spks=spks, cond=cond, meanflow=True)
    assert out.shape == (1, 12, 8)
    assert np.isfinite(np.asarray(out)).all()
    # deterministic (fixed noise seed)
    out2, _ = cfm(mu, mask, 2, spks=spks, cond=cond, meanflow=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))


def test_turbo_stream_tokens_match_monolithic():
    """inference_turbo_stream carries KV/history across chunk calls, so the
    concatenated chunks equal one monolithic decode with the same key
    (reference models/t3/t3.py:322-440)."""
    t3 = T3Turbo(tiny_cfg())
    cond = T3Cond(speaker_emb=jnp.zeros((1, 16)),
                  cond_prompt_speech_emb=jnp.zeros((1, 4, 32)),
                  emotion_adv=None)
    ids = np.array([[3, 4, 5, 6]])
    full = t3.inference_turbo(cond, ids, max_gen_len=24, temperature=0.9,
                              key=jax.random.PRNGKey(7)).reshape(-1)
    chunks = []
    finals = []
    for toks, is_final in t3.inference_turbo_stream(
            cond, ids, max_gen_len=24, temperature=0.9, chunk_size=5,
            key=jax.random.PRNGKey(7)):
        chunks.append(toks)
        finals.append(is_final)
    streamed = np.concatenate(chunks) if chunks else np.zeros(0, np.int32)
    assert finals[-1] and not any(finals[:-1])
    np.testing.assert_array_equal(streamed, full)


def test_split_text_packs_sentences():
    chunks = Model._split_text(
        "One. Two. Three. Four.", r"(?<=[.!?])\s+", max_tokens=16)
    # max_chars = 16//8*4 = 8 → each sentence alone
    assert chunks == ["One.", "Two.", "Three.", "Four."]
    assert Model._split_text("abc", None, 800) == ["abc"]
    big = Model._split_text("One. Two. Three.", r"(?<=[.!?])\s+", 800)
    assert big == ["One. Two. Three."]


def test_integrated_loudness_meter():
    """BS.1770: a 0 dBFS 997 Hz mono sine reads −3.01 LUFS at 48 kHz; the
    48 kHz K-weighting coefficients match the standard's table."""
    from mlx_audio_tpu.dsp import (
        _k_weighting_coeffs,
        integrated_loudness,
        normalize_loudness,
    )

    (b1, a1), (b2, a2) = _k_weighting_coeffs(48000)
    np.testing.assert_allclose(
        b1, [1.53512485958697, -2.69169618940638, 1.19839281085285],
        atol=1e-6)
    np.testing.assert_allclose(
        a1, [1.0, -1.69065929318241, 0.73248077421585], atol=1e-6)
    np.testing.assert_allclose(b2, [1.0, -2.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(
        a2, [1.0, -1.99004745483398, 0.99007225036621], atol=1e-6)

    sr = 48000
    t = np.arange(sr * 3) / sr
    sine = np.sin(2 * np.pi * 997 * t)
    assert abs(integrated_loudness(sine, sr) - (-3.01)) < 0.05
    y = normalize_loudness(sine * 0.05, sr, target_lufs=-27.0)
    assert abs(integrated_loudness(y, sr) - (-27.0)) < 0.05
    # silence is unmeasurable → passthrough
    z = np.zeros(sr)
    assert integrated_loudness(z, sr) == -np.inf
    np.testing.assert_array_equal(normalize_loudness(z, sr), z)


def test_model_generate_chunks_and_stream_plumbing(monkeypatch):
    """Model.generate text-chunk loop and stream_generate incremental
    emission, with the heavy compute mocked out (reference
    chatterbox_turbo.py:775-1300 control flow)."""
    model = Model.__new__(Model)
    model.config = ModelConfig()
    model.sample_rate = 24000
    model.t3 = T3Turbo(tiny_cfg())
    import types

    model._conds = types.SimpleNamespace(t3=None, gen=None)

    monkeypatch.setattr(
        Model, "_tokenize_text",
        lambda self, text: np.zeros((1, max(1, len(text) // 4)), np.int64))
    monkeypatch.setattr(
        Model, "_synthesize",
        lambda self, tokens, key: np.zeros(int(tokens.size) * 100,
                                           np.float32))
    monkeypatch.setattr(
        T3Turbo, "inference_turbo",
        lambda self, cond, ids, **kw: np.arange(8, dtype=np.int32)[None])

    def fake_stream(self, cond, ids, chunk_size=40, **kw):
        yield np.arange(4, dtype=np.int32), False
        yield np.arange(4, 8, dtype=np.int32), True

    monkeypatch.setattr(T3Turbo, "inference_turbo_stream", fake_stream)

    text = "One. Two. Three. Four."
    results = list(model.generate(text, split_pattern=r"(?<=[.!?])\s+",
                                  max_tokens=16, seed=0))
    assert len(results) == 4  # one segment per packed sentence
    assert [r.segment_idx for r in results] == [0, 1, 2, 3]
    assert all(r.samples == (8 + 3) * 100 for r in results)  # +3 silence

    streamed = list(model.generate(text, stream=True, max_tokens=16,
                                   seed=0, split_pattern=r"(?<=[.!?])\s+"))
    # each sentence yields 2 incremental chunks (4 tokens, then 4+5 silence)
    assert len(streamed) == 8
    assert streamed[0].samples == 400
    assert streamed[1].samples == (8 + 5) * 100 - 400


# ---------------------------------------------------------------------------
# TurboBatcher: slot-based continuous batching over the GPT-2 T3
# ---------------------------------------------------------------------------


def _turbo_prompt_embeds(t3, ids):
    cond = T3Cond(speaker_emb=jnp.zeros((1, 16)),
                  cond_prompt_speech_emb=jnp.zeros((1, 4, 32)),
                  emotion_adv=None)
    bos = np.full((1, 1), t3.hp.start_speech_token, np.int32)
    return np.asarray(t3.prepare_input_embeds(cond, np.asarray(ids), bos)), cond


def _turbo_batch_decode(t3, ids_list, seeds, slots, max_tokens=12,
                        tick_frames=4, **samp):
    from mlx_audio_tpu.tts.models.chatterbox_turbo.batcher import TurboBatcher
    import types

    owner = types.SimpleNamespace(t3=t3)
    b = TurboBatcher(owner, slots=slots, max_len=128,
                     tick_frames=tick_frames)
    try:
        futs = [b.submit(_turbo_prompt_embeds(t3, ids)[0],
                         max_tokens=max_tokens, seed=s, **samp)
                for ids, s in zip(ids_list, seeds)]
        outs = [f.result(timeout=600) for f in futs]
        return outs, b.steps
    finally:
        b.close()


def test_turbo_batcher_greedy_matches_direct_loop():
    """temp=0 (+rep penalty) through the batcher equals the single-request
    on-device while_loop (`_turbo_decode_loop` via inference_turbo: at
    temp→0 its top-p filter keeps only the argmax)."""
    t3 = T3Turbo(tiny_cfg())
    ids = np.array([[3, 4, 5, 6]])
    emb, cond = _turbo_prompt_embeds(t3, ids)
    ref = t3.inference_turbo(cond, ids, max_gen_len=12, temperature=0.0,
                             top_k=1000, top_p=0.95,
                             repetition_penalty=1.2,
                             key=jax.random.PRNGKey(0)).reshape(-1)
    outs, _ = _turbo_batch_decode(
        t3, [ids], [0], slots=2, temperature=0.0, top_k=0, top_p=1.0,
        repetition_penalty=1.2)
    np.testing.assert_array_equal(outs[0], ref)


def test_turbo_batcher_batched_equals_sequential():
    """Fixed per-request seeds ⇒ sampled batched tokens == one-slot pool."""
    t3 = T3Turbo(tiny_cfg())
    ids_list = [np.array([[3, 4, 5]]), np.array([[7, 8, 9, 10, 11]])]
    seeds = [5, 9]
    samp = dict(temperature=0.9, top_k=20, top_p=0.95,
                repetition_penalty=1.2)
    batched, steps = _turbo_batch_decode(
        t3, ids_list, seeds, slots=2, **samp)
    for ids, seed, ref in zip(ids_list, seeds, batched):
        alone, _ = _turbo_batch_decode(t3, [ids], [seed], slots=2, **samp)
        np.testing.assert_array_equal(alone[0], ref)
    assert steps <= 8


def test_turbo_generate_routes_through_batcher(monkeypatch):
    """Model.generate with an installed TurboBatcher: non-streamed +
    streamed requests both ride the lock-step ticks; with temp=0 the
    streamed token stream equals the non-streamed one."""
    import types

    from mlx_audio_tpu.serving import get_infer_hook

    model = Model.__new__(Model)
    model.config = ModelConfig()
    model.sample_rate = 24000
    model.t3 = T3Turbo(tiny_cfg())
    cond = T3Cond(speaker_emb=jnp.zeros((1, 16)),
                  cond_prompt_speech_emb=jnp.zeros((1, 4, 32)),
                  emotion_adv=None)
    model._conds = types.SimpleNamespace(t3=cond, gen=None)
    monkeypatch.setattr(
        Model, "_tokenize_text",
        lambda self, text: np.array([[3, 4, 5, 6]], np.int64))
    synth_calls = []

    def fake_synth(self, tokens, key):
        synth_calls.append(np.asarray(tokens).copy())
        return np.zeros(int(tokens.size) * 100, np.float32)

    monkeypatch.setattr(Model, "_synthesize", fake_synth)

    batcher = model.make_batcher(slots=2, max_len=128, tick_frames=4)
    batcher.install()
    try:
        assert get_infer_hook(model) is batcher
        plain = list(model.generate("Hello there.", split_pattern=None,
                                    max_tokens=10, temperature=0.0,
                                    seed=3))
        n_plain_calls = len(synth_calls)
        streamed = list(model.generate("Hello there.", split_pattern=None,
                                       max_tokens=10, temperature=0.0,
                                       stream=True, streaming_interval=0.2,
                                       seed=3))
        assert batcher.steps > 0
    finally:
        batcher.close()
    assert get_infer_hook(model) is None
    assert len(plain) == 1
    assert len(streamed) >= 1
    # final streamed prefix synthesis saw the same tokens as the plain
    # request (temp=0, same seed): plain appends 3 silence tokens, the
    # final stream chunk appends 5 — drop the extra 2
    plain_tokens = synth_calls[n_plain_calls - 1]
    final_stream_tokens = synth_calls[-1]
    np.testing.assert_array_equal(final_stream_tokens[:-2], plain_tokens)

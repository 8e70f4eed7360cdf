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

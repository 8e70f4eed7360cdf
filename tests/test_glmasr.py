"""GLM-ASR: rope-whisper encoder, merge adapter, end-to-end decode."""

import numpy as np

from mlx_audio_tpu.stt.models.glmasr import (
    LlamaConfig,
    Model,
    ModelConfig,
    WhisperConfig,
)


def tiny_cfg():
    return ModelConfig(
        whisper_config=WhisperConfig(
            d_model=16, encoder_attention_heads=2, encoder_ffn_dim=32,
            encoder_layers=1, num_mel_bins=16, max_source_positions=1500),
        lm_config=LlamaConfig(
            vocab_size=120, hidden_size=24, intermediate_size=48,
            num_hidden_layers=2, num_attention_heads=2,
            num_key_value_heads=2, eos_token_id=[110]),
        merge_factor=4)


class FakeTok:
    def encode(self, text):
        return [(ord(c) % 100) + 2 for c in text][:8]

    def decode(self, ids):
        return "".join(chr(97 + (i % 26)) for i in ids)


def test_audio_encoder_merge():
    import jax.numpy as jnp

    model = Model(tiny_cfg())
    mel = jnp.asarray(np.random.randn(1, 3000, 16).astype(np.float32))
    emb = model.audio_encoder(mel)
    # 3000 mel frames → 1500 after conv stride 2 → merge 4 → 375
    assert emb.shape == (1, 375, 24)


def test_generate_end_to_end():
    model = Model(tiny_cfg())
    model.set_runtime(tokenizer=FakeTok())
    audio = np.random.randn(16000).astype(np.float32) * 0.1
    out = model.generate(audio, max_tokens=6)
    assert isinstance(out.text, str)
    assert out.generation_tokens <= 6


def test_long_audio_chunks(monkeypatch):
    """>30 s audio is split at low-energy boundaries and transcribed
    per-chunk (reference glmasr.py:23-111), not truncated."""
    model = Model(tiny_cfg())
    model.set_runtime(tokenizer=FakeTok())
    sr = 16000
    rng = np.random.default_rng(0)
    # 70 s: three loud spans separated by near-silence
    audio = np.zeros(70 * sr, np.float32)
    for start in (0, 25, 50):
        seg = rng.standard_normal(20 * sr).astype(np.float32) * 0.3
        audio[start * sr:(start + 20) * sr] = seg

    calls = []
    orig = Model.generate

    def spy(self, a, **kw):
        calls.append(len(np.asarray(a)) / sr if not isinstance(a, str) else a)
        return orig(self, a, **kw)

    monkeypatch.setattr(Model, "generate", spy)
    out = model.generate(audio, max_tokens=4)
    assert out.duration == 70.0
    # outer call + one recursive call per chunk, each chunk <= 30 s
    assert len(calls) >= 4
    assert all(c <= 30.5 for c in calls[1:])
    assert isinstance(out.text, str)


def test_stream_transcribe_partial_then_final():
    """Streaming yields partial text deltas then a final result whose
    concatenation matches cumulative decode (reference glmasr.py:944-1060
    contract)."""
    model = Model(tiny_cfg())
    model.set_runtime(tokenizer=FakeTok())
    audio = np.random.randn(16000).astype(np.float32) * 0.1
    results = list(model.stream_transcribe(audio, max_tokens=6,
                                           chunk_size=2))
    assert results, "no streaming results"
    assert results[-1].is_final
    assert results[-1].generation_tokens <= 6
    partial_text = "".join(r.text for r in results if not r.is_final)
    out = model.generate(audio, max_tokens=6)
    assert partial_text == out.text or partial_text.strip() == out.text

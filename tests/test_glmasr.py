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

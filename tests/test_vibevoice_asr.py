"""VibeVoice-ASR: VAE encoders, prompt splice, end-to-end transcription."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_tpu.stt.models.vibevoice_asr import (
    AcousticTokenizerEncoder,
    Model,
    ModelConfig,
    Qwen2Config,
    TokenizerEncoderConfig,
)


class FakeTokenizer:
    """Offline stand-in: maps chars/specials deterministically."""

    PAD_ID = 90
    SPECIALS = {"<|object_ref_start|>": 88, "<|object_ref_end|>": 89,
                "<|box_start|>": 90, "<|im_start|>": 91, "<|im_end|>": 92}

    def encode(self, text):
        ids = []
        i = 0
        while i < len(text):
            matched = False
            for tok, tid in self.SPECIALS.items():
                if text.startswith(tok, i):
                    ids.append(tid)
                    i += len(tok)
                    matched = True
                    break
            if not matched:
                ids.append(ord(text[i]) % 80)
                i += 1
        return ids

    def convert_tokens_to_ids(self, tok):
        return self.SPECIALS.get(tok)

    def decode(self, ids):
        return "".join(chr(97 + (i % 26)) for i in ids)


def tiny_config():
    enc = TokenizerEncoderConfig(
        vae_dim=8, encoder_n_filters=4, encoder_ratios=(2, 2),
        encoder_depths="1-1-1")
    sem = TokenizerEncoderConfig(
        vae_dim=12, fix_std=0.0, std_dist_type="none",
        encoder_n_filters=4, encoder_ratios=(2, 2),
        encoder_depths="1-1-1")
    return ModelConfig(
        acoustic_tokenizer_config=enc, semantic_tokenizer_config=sem,
        decoder_config=Qwen2Config(
            vocab_size=100, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            intermediate_size=64),
        acoustic_vae_dim=8, semantic_vae_dim=12)


def test_tokenizer_encoder_downsamples():
    enc = AcousticTokenizerEncoder(TokenizerEncoderConfig(
        vae_dim=8, encoder_n_filters=4, encoder_ratios=(2, 2),
        encoder_depths="1-1-1"))
    lat = enc.encode(jnp.zeros((1, 64)))
    # hop = 2·2 = 4 → 16 frames
    assert lat.shape == (1, 16, 8)


def test_encode_speech_combines_streams():
    model = Model(tiny_config())
    feats = model.encode_speech(jnp.asarray(
        np.random.randn(64).astype(np.float32) * 0.1))
    assert feats.shape == (1, 16, 32)
    assert np.isfinite(np.asarray(feats)).all()


def test_generate_end_to_end():
    model = Model(tiny_config())
    model.set_runtime(tokenizer=FakeTokenizer())
    audio = np.random.randn(128).astype(np.float32) * 0.1
    out = model.generate(audio, max_tokens=8)
    assert isinstance(out.text, str)
    assert out.prompt_tokens > 32  # includes 32 speech pads
    assert out.generation_tokens <= 8


def test_stream_transcribe_converges_to_generate():
    """Streaming text chunks concatenate to the one-shot raw decode
    (greedy; reference vibevoice_asr.py:750-833)."""
    model = Model(tiny_config())
    tok = FakeTokenizer()
    model.set_runtime(tokenizer=tok)
    audio = np.random.default_rng(5).standard_normal(128).astype(
        np.float32) * 0.1
    out = model.generate(audio, max_tokens=8)
    pieces = list(model.stream_transcribe(audio, max_tokens=8, chunk_size=3))
    assert pieces, "no streamed text"
    assert all(isinstance(p, str) for p in pieces)
    assert "".join(pieces) == out.extra["raw_text"]


def test_parse_transcription():
    segs = Model.parse_transcription(
        '[{"Start time": 0.0, "End time": 1.5, "Speaker ID": 1, '
        '"Content": "hello"}]')
    assert segs == [{"start": 0.0, "end": 1.5, "speaker_id": 1,
                     "text": "hello"}]
    assert Model.parse_transcription("no json here") == []
    fenced = Model.parse_transcription(
        '```json\n{"Content": "hi"}\n```')
    assert fenced == [{"text": "hi"}]


def test_sanitize_remaps_keys():
    model = Model(tiny_config())
    w = {
        "model.acoustic_tokenizer.encoder.downsample_layers.0.0.conv.conv."
        "weight": np.zeros((4, 1, 7), np.float32),
        "model.acoustic_tokenizer.decoder.head.weight": np.zeros(3),
        "lm_head.weight": np.zeros((100, 32), np.float32),
        "model.language_model.embed_tokens.weight":
            np.zeros((100, 32), np.float32),
    }
    out = model.sanitize(w)
    assert ("acoustic_tokenizer.encoder.downsample_layers.0.conv.weight"
            in out)
    assert not any("decoder" in k for k in out)
    assert "language_model.lm_head.weight" in out
    assert "language_model.model.embed_tokens.weight" in out

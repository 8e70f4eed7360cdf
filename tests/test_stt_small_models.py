"""Voxtral / LASR / Wav2Vec2 smoke tests with tiny configs."""

import numpy as np
import pytest


def test_lasr_ctc():
    from mlx_audio_tpu.stt.models.lasr_ctc import Model, ModelConfig

    cfg = ModelConfig.from_dict(dict(
        vocab_size=40,
        encoder_config=dict(hidden_size=64, num_hidden_layers=2,
                            num_attention_heads=4, num_key_value_heads=4,
                            intermediate_size=128, conv_kernel_size=8,
                            num_mel_bins=32, subsampling_conv_channels=32),
    ))
    m = Model(cfg)
    audio = np.random.default_rng(0).standard_normal(16000).astype(np.float32) * 0.1

    class Tok:
        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    out = m.generate(audio, tokenizer=Tok())
    assert isinstance(out.text, str)
    assert out.duration == pytest.approx(1.0, abs=0.01)


def test_wav2vec2():
    from mlx_audio_tpu.stt.models.wav2vec import Model, ModelConfig

    cfg = ModelConfig(
        vocab_size=30, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        conv_dim=[32, 32], conv_stride=[5, 2], conv_kernel=[10, 3],
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
    )
    m = Model(cfg)
    audio = np.random.default_rng(1).standard_normal(8000).astype(np.float32) * 0.1
    emb = m.embeddings(audio)
    assert emb.ndim == 2 and emb.shape[1] == 64
    out = m.generate(audio, tokenizer=None)
    assert isinstance(out.text, str)


def test_voxtral_tiny():
    from mlx_audio_tpu.stt.models.voxtral import Model, ModelConfig

    cfg = ModelConfig.from_dict(dict(
        audio_config=dict(num_mel_bins=80, d_model=64, encoder_layers=1,
                          encoder_attention_heads=4, encoder_ffn_dim=128,
                          intermediate_size=256, max_source_positions=1500),
        text_config=dict(hidden_size=64, num_hidden_layers=1,
                         intermediate_size=128, num_attention_heads=4,
                         num_key_value_heads=2, vocab_size=1000),
    ))
    m = Model(cfg)

    class Tok:
        def decode(self, ids, **kw):
            return "x" * len(ids)

    audio = np.random.default_rng(2).standard_normal(16000).astype(np.float32) * 0.05
    out = m.generate(audio, max_tokens=8, tokenizer=Tok())
    assert isinstance(out.text, str)
    assert out.duration == pytest.approx(1.0, abs=0.01)


def test_voxtral_stream_generate():
    from mlx_audio_tpu.stt.models.voxtral import Model, ModelConfig

    cfg = ModelConfig.from_dict(dict(
        audio_config=dict(num_mel_bins=80, d_model=64, encoder_layers=1,
                          encoder_attention_heads=4, encoder_ffn_dim=128,
                          intermediate_size=256, max_source_positions=1500),
        text_config=dict(hidden_size=64, num_hidden_layers=1,
                         intermediate_size=128, num_attention_heads=4,
                         num_key_value_heads=2, vocab_size=1000),
    ))
    m = Model(cfg)

    class Tok:
        def decode(self, ids, **kw):
            return "x" * len(ids)

    audio = np.random.default_rng(3).standard_normal(16000).astype(np.float32) * 0.05
    results = list(m.stream_generate(audio, max_tokens=10, chunk_size=4,
                                     tokenizer=Tok()))
    assert results and results[-1].is_final
    assert all(not r.is_final for r in results[:-1])
    assert results[-1].end_time == pytest.approx(1.0, abs=0.01)

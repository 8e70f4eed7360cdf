"""Qwen3-TTS tests: tiny config end-to-end generation, codec decode shapes,
speaker encoder, mrope."""

import numpy as np
import pytest


class FakeTok:
    def encode(self, text, **kw):
        return [(ord(c) % 97) + 3 for c in text[:48]]


@pytest.fixture(scope="module")
def tiny():
    from mlx_audio_tpu.tts.models.qwen3_tts import Model, ModelConfig

    cfg = ModelConfig.from_dict(dict(
        talker_config=dict(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, text_hidden_size=96, text_vocab_size=512,
            num_code_groups=4,
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
        speaker_encoder_config=dict(
            mel_dim=32, enc_dim=64, enc_channels=[32, 32, 32, 32, 96],
            enc_kernel_sizes=[5, 3, 3, 3, 1], enc_dilations=[1, 2, 3, 4, 1],
            enc_attention_channels=16, enc_res2net_scale=4, enc_se_channels=16,
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
    # remove the encoder requirement for the tiny test
    m = Model(cfg)
    m.set_runtime(tokenizer=FakeTok())
    return m


def test_codec_decode_shapes(tiny):
    codes = np.random.default_rng(0).integers(0, 128, (1, 4, 6)).astype(np.int32)
    wav = tiny.speech_tokenizer.decode(codes)
    # total upsample = 4*2*2 = 16
    assert wav.shape == (1, 6 * 16)
    chunked = tiny.speech_tokenizer.chunked_decode(codes, chunk_size=3,
                                                   left_context_size=1)
    assert chunked.shape[-1] == 6 * 16
    # chunked ~ full decode except boundary context effects
    full = np.asarray(wav)
    assert np.isfinite(chunked).all() and np.isfinite(full).all()


def test_speaker_encoder(tiny):
    from mlx_audio_tpu.tts.models.qwen3_tts.qwen3_tts import mel_spectrogram

    emb = tiny.extract_speaker_embedding(
        np.random.default_rng(1).standard_normal(24000).astype(np.float32) * 0.1
    )
    assert emb.shape == (1, 1, 64)


def test_mrope_interleave():
    import jax.numpy as jnp

    from mlx_audio_tpu.tts.models.qwen3_tts.talker import TalkerRotaryEmbedding

    rope = TalkerRotaryEmbedding(16, mrope_section=[4, 2, 2])
    pos = jnp.arange(5)[None]  # (1, 5)
    cos, sin = rope(pos)
    assert cos.shape == (1, 5, 16)
    # identical position streams → equals plain rope
    import numpy as np

    inv = 1.0 / (10000 ** (np.arange(0, 16, 2) / 16))
    ref = np.cos(np.arange(5)[:, None] * inv[None, :])
    np.testing.assert_allclose(np.asarray(cos)[0, :, :8], ref, atol=1e-5)


def test_generate_end_to_end(tiny):
    results = list(tiny.generate("Hello there, world.", max_tokens=12,
                                 temperature=0.9, top_k=20))
    # random weights may hit EOS immediately; pipeline must not crash
    for r in results:
        assert r.sample_rate == 24000
        assert r.samples > 0
        assert np.isfinite(r.audio).all()

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


@pytest.fixture(scope="module")
def tiny_icl():
    """Tiny model WITH a speech-tokenizer encoder (for ICL voice cloning)."""
    from mlx_audio_tpu.tts.models.qwen3_tts import Model, ModelConfig

    cfg = ModelConfig.from_dict(dict(
        talker_config=dict(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, text_hidden_size=96, text_vocab_size=512,
            num_code_groups=4,
            codec_eos_token_id=200, codec_think_id=210, codec_nothink_id=211,
            codec_think_bos_id=212, codec_think_eos_id=213, codec_pad_id=214,
            codec_bos_id=215, spk_id={"vivian": 7},
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
            encoder_config=dict(
                frame_rate=12.5, hidden_size=32, num_filters=8,
                num_hidden_layers=1, num_attention_heads=4, head_dim=8,
                num_key_value_heads=4, intermediate_size=64,
                codebook_dim=16, codebook_size=64, num_quantizers=4,
                sliding_window=8, upsampling_ratios=[8, 6, 5, 4],
            ),
        ),
    ))
    m = Model(cfg)
    m.set_runtime(tokenizer=FakeTok())
    return m


def test_mode_routing_validation(tiny):
    """voice_design requires instruct; custom_voice requires a known
    speaker (reference qwen3_tts.py:742-783, 1155-1165)."""
    tiny.config.tts_model_type = "voice_design"
    try:
        with pytest.raises(ValueError, match="instruct"):
            list(tiny.generate("Hello."))
        tiny.config.tts_model_type = "custom_voice"
        with pytest.raises(ValueError, match="voice"):
            list(tiny.generate("Hello."))
        with pytest.raises(ValueError, match="not supported"):
            list(tiny.generate("Hello.", voice="nobody"))
        # cross-mode method calls raise
        with pytest.raises(ValueError, match="does not support"):
            list(tiny.generate_voice_design("Hi", instruct="x"))
        tiny.config.tts_model_type = "base"
        with pytest.raises(ValueError, match="does not support"):
            list(tiny.generate_custom_voice("Hi", speaker="vivian"))
    finally:
        tiny.config.tts_model_type = "base"


def test_custom_voice_and_voice_design_generate(tiny_icl):
    m = tiny_icl
    m.config.tts_model_type = "custom_voice"
    try:
        res = list(m.generate("Hello there.", voice="Vivian",
                              instruct="Very happy.", max_tokens=8,
                              temperature=0.9, top_k=20))
        for r in res:
            assert np.isfinite(r.audio).all()
        m.config.tts_model_type = "voice_design"
        res = list(m.generate("Hello.", instruct="A cheerful voice.",
                              max_tokens=8, temperature=0.9, top_k=20))
        for r in res:
            assert np.isfinite(r.audio).all()
    finally:
        m.config.tts_model_type = "base"


def test_icl_voice_cloning(tiny_icl):
    """ref_audio+ref_text routes to ICL: speech-tokenizer-encoded reference
    codes condition the prefill (reference :406-590, :1250)."""
    m = tiny_icl
    ref = (np.random.default_rng(3).standard_normal(24000) * 0.1).astype(
        np.float32
    )
    res = list(m.generate("Hello there, cloned voice.", ref_audio=ref,
                          ref_text="reference words", max_tokens=8,
                          temperature=0.9, top_k=20))
    for r in res:
        assert r.sample_rate == 24000
        assert np.isfinite(r.audio).all()


def test_streaming_matches_nonstreaming_tokens(tiny_icl):
    """Chunked streaming must sample the SAME token sequence as the
    single-dispatch run (the carried PRNG key makes chunking invisible),
    and flags must follow the reference contract."""
    m = tiny_icl
    kw = dict(max_tokens=10, temperature=0.9, top_k=20, split_pattern=None or "\n")
    full = list(m.generate("Hello there world again.", **kw))
    chunks = list(m.generate("Hello there world again.", stream=True,
                             streaming_interval=0.2, **kw))
    if chunks:
        assert all(c.is_streaming_chunk for c in chunks)
        assert chunks[-1].is_final_chunk
        n_stream = sum(c.token_count for c in chunks)
        n_full = sum(r.token_count for r in full)
        assert n_stream == n_full


def test_min_tokens_defers_eos(tiny):
    """min_tokens masks the EOS logit for the first N frames, so the
    decode always produces at least N codec frames (up to max_tokens)."""
    results = list(tiny.generate("Hello there, world.", max_tokens=24,
                                 temperature=0.9, top_k=20, seed=3,
                                 min_tokens=16))
    assert len(results) == 1
    assert results[0].token_count >= 16

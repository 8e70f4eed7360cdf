"""Qwen3-ASR: chunked audio encoder, embedding splice, on-device decode."""

import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.stt.models.qwen3_asr import (
    AudioEncoder,
    AudioEncoderConfig,
    Model,
    ModelConfig,
    TextConfig,
)


def tiny_cfg():
    return ModelConfig(
        audio_config=AudioEncoderConfig(
            num_mel_bins=16, encoder_layers=1, encoder_attention_heads=2,
            encoder_ffn_dim=32, d_model=16, n_window=10, output_dim=24,
            n_window_infer=40, downsample_hidden_size=8,
            max_source_positions=128),
        text_config=TextConfig(
            vocab_size=200, hidden_size=24, intermediate_size=48,
            num_hidden_layers=2, num_attention_heads=2,
            num_key_value_heads=2, head_dim=12),
        audio_token_id=150,
    )


class FakeTok:
    def encode(self, text):
        ids = []
        i = 0
        while i < len(text):
            if text.startswith("<|audio_pad|>", i):
                ids.append(150)
                i += len("<|audio_pad|>")
            else:
                ids.append((ord(text[i]) % 100) + 2)
                i += 1
        return ids

    def decode(self, ids):
        return "".join(chr(97 + (i % 26)) for i in ids)

    def convert_tokens_to_ids(self, t):
        return 199


def test_audio_encoder_chunking():
    cfg = tiny_cfg().audio_config
    enc = AudioEncoder(cfg)
    # 45 frames with chunk=20 → 3 ragged chunks (20, 20, 5)
    mel = jnp.asarray(np.random.randn(1, 16, 45).astype(np.float32))
    out = enc(mel)
    from mlx_audio_tpu.stt.models.qwen3_asr.qwen3_asr import _conv_out_len

    expect = _conv_out_len(20) * 2 + _conv_out_len(5)
    assert out.shape == (expect, 24)
    assert np.isfinite(np.asarray(out)).all()


def test_generate_end_to_end():
    model = Model(tiny_cfg())
    model.set_runtime(tokenizer=FakeTok())
    audio = np.random.randn(8000).astype(np.float32) * 0.1
    out = model.generate(audio, max_tokens=8)
    assert isinstance(out.text, str)
    assert out.generation_tokens <= 8
    assert out.duration == 0.5


def test_fix_timestamp_monotonic_repair():
    from mlx_audio_tpu.stt.models.qwen3_asr import ForceAlignProcessor

    p = ForceAlignProcessor()
    fixed = p.fix_timestamp(np.array([0, 10, 5, 20, 30]))
    assert fixed == sorted(fixed)  # monotonic after repair
    assert p.fix_timestamp(np.array([])) == []


def test_encode_timestamp_formats():
    from mlx_audio_tpu.stt.models.qwen3_asr import ForceAlignProcessor

    p = ForceAlignProcessor()
    words, inp = p.encode_timestamp("hello world", "English")
    assert words == ["hello", "world"]
    assert inp.count("<timestamp>") == 4
    words_zh, _ = p.encode_timestamp("你好ab", "Chinese")
    assert words_zh == ["你", "好", "ab"]


def test_forced_aligner_end_to_end():
    from mlx_audio_tpu.stt.models.qwen3_asr import (
        ForcedAlignerConfig,
        ForcedAlignerModel,
    )

    cfg = ForcedAlignerConfig(
        audio_config=tiny_cfg().audio_config,
        text_config=tiny_cfg().text_config,
        audio_token_id=150, timestamp_token_id=151, classify_num=50)
    model = ForcedAlignerModel(cfg)

    class AlignTok:
        def encode(self, text):
            ids = []
            i = 0
            while i < len(text):
                if text.startswith("<|audio_pad|>", i):
                    ids.append(150)
                    i += len("<|audio_pad|>")
                elif text.startswith("<timestamp>", i):
                    ids.append(151)
                    i += len("<timestamp>")
                else:
                    ids.append((ord(text[i]) % 100) + 2)
                    i += 1
            return ids

    model.set_runtime(tokenizer=AlignTok())
    audio = np.random.randn(8000).astype(np.float32) * 0.1
    result = model.generate(audio, "hi there", "English")
    assert len(result) == 2
    for item in result:
        assert item.end_time >= 0
    assert result.text == "hi there"

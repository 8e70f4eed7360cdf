"""Voxtral Realtime: causal encoder, position-locked on-device decode."""

import numpy as np

from mlx_audio_tpu.stt.models.voxtral_realtime import (
    DecoderConfig,
    EncoderConfig,
    Model,
    ModelConfig,
)


def tiny_cfg():
    return ModelConfig(
        encoder_args=EncoderConfig(dim=16, n_layers=1, n_heads=2, head_dim=8,
                                   hidden_dim=32, sliding_window=64),
        decoder=DecoderConfig(dim=24, n_layers=2, n_heads=2, n_kv_heads=2,
                              head_dim=12, hidden_dim=48, vocab_size=100,
                              ada_rms_norm_t_cond_dim=8),
        n_left_pad_tokens=2,
    )


class FakeTok:
    def decode(self, ids):
        return " ".join(str(i) for i in ids)


def test_encoder_downsample():
    import jax.numpy as jnp

    model = Model(tiny_cfg())
    mel = jnp.asarray(np.random.randn(80, 128).astype(np.float32))
    out = model.encoder(mel)
    # 80 mel frames → 40 after stride 2 → 10 audio tokens at decoder dim
    assert out.shape == (10, 24)


def test_generate_end_to_end():
    model = Model(tiny_cfg())
    model.set_runtime(tokenizer=FakeTok())
    audio = np.random.randn(16000).astype(np.float32) * 0.1  # 1 s
    out = model.generate(audio, max_tokens=16)
    assert isinstance(out.text, str)
    assert out.duration == 1.0
    # decode is position-locked: can't emit more tokens than audio positions
    assert out.generation_tokens <= 16


def test_stream_deltas_match_nonstream():
    """stream=True yields text deltas whose concatenation equals the
    non-streaming transcription (reference voxtral_realtime.py:244-269,
    344-420); the chunked on-device loop resumes exactly."""
    model = Model(tiny_cfg())
    model.set_runtime(tokenizer=FakeTok())
    audio = np.random.randn(16000).astype(np.float32) * 0.1
    full = model.generate(audio, max_tokens=16, temperature=0.0)
    deltas = list(model.generate(audio, max_tokens=16, temperature=0.0,
                                 stream=True))
    assert "".join(deltas).strip() == full.text


def test_rt_batcher_batched_equals_solo():
    """Concurrent realtime sessions through the slot batcher: greedy
    output equals the plain (no-hook) position-locked decode, and the
    streamed deltas under the batcher concatenate identically."""
    import threading

    from mlx_audio_tpu.nn import seed_rng
    from mlx_audio_tpu.serving import get_infer_hook

    seed_rng(41)
    model = Model(tiny_cfg())
    model.set_runtime(tokenizer=FakeTok())
    rng = np.random.default_rng(7)
    audios = [rng.standard_normal(16000).astype(np.float32) * 0.1
              for _ in range(2)]
    solo = [model.generate(a, max_tokens=12, temperature=0.0).text
            for a in audios]

    batcher = model.make_batcher(slots=2, max_len=256, adapter_max=256,
                                 tick_frames=4)
    batcher.install()
    try:
        assert get_infer_hook(model) is batcher
        outs = [None, None]

        def run(i):
            outs[i] = model.generate(audios[i], max_tokens=12,
                                     temperature=0.0).text

        ths = [threading.Thread(target=run, args=(i,)) for i in range(2)]
        [t.start() for t in ths]
        [t.join(timeout=600) for t in ths]
        assert batcher.steps > 0
        assert outs == solo

        deltas = list(model.generate(audios[0], max_tokens=12,
                                     temperature=0.0, stream=True))
        assert "".join(deltas).strip() == solo[0]
    finally:
        batcher.close()
    assert get_infer_hook(model) is None

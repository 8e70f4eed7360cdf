"""Dia tests: delay transforms + tiny-model CFG generation loop."""

import numpy as np
import pytest


def test_delay_roundtrip():
    import jax.numpy as jnp

    from mlx_audio_tpu.tts.models.dia.audio import (
        apply_audio_delay,
        revert_audio_delay,
    )

    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 100, (1, 20, 3)).astype(np.int32))
    delay = [0, 2, 3]
    delayed = apply_audio_delay(codes, delay, bos_value=1026, pad_value=1025)
    d = np.asarray(delayed)
    # channel 1 delayed by 2: first two positions BOS
    assert (d[0, :2, 1] == 1026).all()
    np.testing.assert_array_equal(d[0, 2:, 1], np.asarray(codes)[0, :-2, 1])
    reverted = revert_audio_delay(delayed, delay, pad_value=1025, total_len=20)
    r = np.asarray(reverted)
    # valid region matches original
    np.testing.assert_array_equal(r[0, : 20 - 3], np.asarray(codes)[0, : 20 - 3])


@pytest.fixture(scope="module")
def tiny_dia():
    from mlx_audio_tpu.tts.models.dia import Model

    cfg = {
        "model": {
            "encoder": {"n_layer": 1, "n_embd": 32, "n_hidden": 64,
                        "n_head": 2, "head_dim": 16},
            "decoder": {"n_layer": 1, "n_embd": 32, "n_hidden": 64,
                        "gqa_query_heads": 4, "kv_heads": 2,
                        "gqa_head_dim": 8, "cross_query_heads": 2,
                        "cross_head_dim": 16},
            "src_vocab_size": 128, "tgt_vocab_size": 1028,
        },
        "data": {"text_length": 128, "audio_length": 128, "channels": 3,
                 "delay_pattern": [0, 1, 2]},
    }
    m = Model(cfg)

    class FakeDac:
        def encode(self, audio):
            T = max(audio.shape[-1] // 512, 2)
            return None, np.zeros((1, 3, T), np.int32), None, None, None

        def decode_codes(self, codes):
            T = np.asarray(codes).shape[-1]
            return np.zeros((1, 1, T * 512), np.float32)

    m.set_runtime(dac=FakeDac())
    return m


def test_dia_generate(tiny_dia):
    results = list(tiny_dia.generate("[S1] Hello. [S2] Hi there.",
                                     max_tokens=16, temperature=1.0))
    assert len(results) == 1
    r = results[0]
    assert r.sample_rate == 44100
    assert r.samples > 0
    assert r.token_count <= 16 + 2 + 2  # max_tokens + eos cascade


def test_dia_voice_clone_prefill(tiny_dia):
    ref = np.zeros(4096, np.float32)
    results = list(tiny_dia.generate("[S1] Test. [S2] Ok.", max_tokens=8,
                                     ref_audio=ref, ref_text="[S1] Ref."))
    assert len(results) == 1

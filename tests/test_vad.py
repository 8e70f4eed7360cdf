"""Sortformer diarization + SmartTurn tests (random weights)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def sortformer():
    from mlx_audio_tpu.vad.models.sortformer import Model, ModelConfig

    cfg = ModelConfig.from_dict(dict(
        num_speakers=4,
        fc_encoder_config=dict(hidden_size=64, num_hidden_layers=2,
                               num_attention_heads=4, intermediate_size=128,
                               num_mel_bins=32, conv_kernel_size=9,
                               subsampling_conv_channels=16),
        tf_encoder_config=dict(d_model=48, encoder_layers=2,
                               encoder_attention_heads=4, encoder_ffn_dim=96,
                               max_source_positions=2048),
        modules_config=dict(num_speakers=4, fc_d_model=64, tf_d_model=48),
        processor_config=dict(feature_size=32),
    ))
    return Model(cfg)


def test_offline_diarization(sortformer):
    audio = np.random.default_rng(0).standard_normal(16000 * 3).astype(np.float32) * 0.1
    out = sortformer.generate(audio, threshold=0.5)
    assert out.speaker_probs.shape[1] == 4
    p = out.speaker_probs
    assert (p >= 0).all() and (p <= 1).all()
    # ~3s at 80ms frames
    assert 30 <= p.shape[0] <= 50
    for seg in out.segments:
        assert seg.end > seg.start and 0 <= seg.speaker < 4
    assert isinstance(out.text, str)


def test_streaming_diarization(sortformer):
    audio = np.random.default_rng(1).standard_normal(16000 * 6).astype(np.float32) * 0.1
    outs = list(sortformer.generate_stream(audio, chunk_duration=2.0,
                                           spkcache_max=20, fifo_max=20))
    assert len(outs) == 3
    final = outs[-1]
    assert final.state is not None
    assert final.state.frames_processed > 0
    assert final.state.fifo_len <= 20
    assert final.state.spkcache_len <= 20
    assert final.speaker_probs.shape[1] == 4


def test_preds_to_segments_merge():
    from mlx_audio_tpu.vad.models.sortformer.sortformer import Model

    preds = np.zeros((10, 2), np.float32)
    preds[1:4, 0] = 0.9
    preds[5:7, 0] = 0.9  # gap of 1 frame
    segs = Model._preds_to_segments(preds, 0.08, 0.5, 0.0, merge_gap=0.1)
    spk0 = [s for s in segs if s.speaker == 0]
    assert len(spk0) == 1  # merged across the small gap
    segs2 = Model._preds_to_segments(preds, 0.08, 0.5, 0.0, merge_gap=0.0)
    assert len([s for s in segs2 if s.speaker == 0]) == 2


def test_smart_turn():
    from mlx_audio_tpu.vad.models.smart_turn import Model, ModelConfig

    cfg = ModelConfig.from_dict(dict(
        encoder_config=dict(num_mel_bins=80, max_source_positions=400,
                            d_model=64, encoder_attention_heads=4,
                            encoder_layers=1, encoder_ffn_dim=128),
        processor_config=dict(max_audio_seconds=8),
    ))
    m = Model(cfg)
    audio = np.random.default_rng(2).standard_normal(16000 * 2).astype(np.float32) * 0.1
    out = m.predict_endpoint(audio)
    assert out.prediction in (0, 1)
    assert 0.0 <= out.probability <= 1.0

"""StackBatcher window batching (Wav2Vec2, LASR-CTC, Sortformer offline,
MossFormer2-SE): batched output must equal running each request alone, and
concurrent same-shape submissions must fuse into one device dispatch."""

import os
import threading

import numpy as np
import pytest

# On the real chip (MLX_AUDIO_TPU_TESTS=1) a B=1 solo forward and a
# B=N stacked forward tile matmuls differently, so outputs agree only to
# float accumulation order — argmax near-ties under random weights can
# flip. CPU asserts exact equality; TPU asserts near-equality.
_TPU = os.environ.get("MLX_AUDIO_TPU_TESTS") == "1"


def _texts_close(batched, solo):
    if not _TPU:
        assert batched == solo
        return
    import difflib

    for got, ref in zip(batched, solo):
        ratio = difflib.SequenceMatcher(None, got, ref).ratio()
        assert ratio > 0.9, (ratio, got, ref)


def _concurrent(fn, args_list, timeout=600):
    outs = [None] * len(args_list)

    def run(i):
        outs[i] = fn(*args_list[i])

    threads = [threading.Thread(target=run, args=(i,))
               for i in range(len(args_list))]
    [t.start() for t in threads]
    [t.join(timeout=timeout) for t in threads]
    return outs


def test_wav2vec2_window_batcher():
    from mlx_audio_tpu.nn import seed_rng
    from mlx_audio_tpu.serving import get_infer_hook
    from mlx_audio_tpu.stt.models.wav2vec import Model, ModelConfig

    seed_rng(21)
    cfg = ModelConfig(
        vocab_size=30, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        conv_dim=[32, 32], conv_stride=[5, 2], conv_kernel=[10, 3],
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
    )
    m = Model(cfg)
    rng = np.random.default_rng(1)
    audios = [rng.standard_normal(8000).astype(np.float32) * 0.1
              for _ in range(3)]
    solo = [m.generate(a, tokenizer=None).text for a in audios]
    batcher = m.make_batcher(max_batch=4, window_ms=40.0).install()
    try:
        assert get_infer_hook(m) is batcher
        batched = _concurrent(
            lambda a: m.generate(a, tokenizer=None).text,
            [(a,) for a in audios])
        assert batcher.dispatch_count >= 1
        # equal-shape windows arriving within the window fuse: fewer
        # dispatches than requests
        assert batcher.dispatch_count < len(audios)
    finally:
        batcher.close()
    assert get_infer_hook(m) is None
    _texts_close(batched, solo)


def test_lasr_ctc_window_batcher():
    from mlx_audio_tpu.nn import seed_rng
    from mlx_audio_tpu.serving import get_infer_hook
    from mlx_audio_tpu.stt.models.lasr_ctc import Model, ModelConfig

    seed_rng(22)
    cfg = ModelConfig.from_dict(dict(
        vocab_size=40,
        encoder_config=dict(hidden_size=64, num_hidden_layers=2,
                            num_attention_heads=4, num_key_value_heads=4,
                            intermediate_size=128, conv_kernel_size=8,
                            num_mel_bins=32, subsampling_conv_channels=32),
    ))
    m = Model(cfg)

    class Tok:
        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    rng = np.random.default_rng(2)
    audios = [rng.standard_normal(16000).astype(np.float32) * 0.1
              for _ in range(3)]
    solo = [m.generate(a, tokenizer=Tok()).text for a in audios]
    batcher = m.make_batcher(max_batch=4, window_ms=40.0).install()
    try:
        batched = _concurrent(
            lambda a: m.generate(a, tokenizer=Tok()).text,
            [(a,) for a in audios])
        assert 1 <= batcher.dispatch_count < len(audios)
    finally:
        batcher.close()
    _texts_close(batched, solo)


def test_sortformer_window_batcher():
    from mlx_audio_tpu.nn import seed_rng
    from mlx_audio_tpu.serving import get_infer_hook
    from mlx_audio_tpu.vad.models.sortformer import Model, ModelConfig

    seed_rng(23)
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
    m = Model(cfg)
    rng = np.random.default_rng(3)
    # different true lengths inside one mel bucket still fuse (lengths
    # ride the per-row lengths vector)
    audios = [rng.standard_normal(16000 * 2).astype(np.float32) * 0.1,
              rng.standard_normal(16000 * 2 + 800).astype(np.float32) * 0.1]
    solo = [m.generate(a).speaker_probs for a in audios]
    batcher = m.make_batcher(max_batch=4, window_ms=40.0).install()
    try:
        batched = _concurrent(lambda a: m.generate(a).speaker_probs,
                              [(a,) for a in audios])
        assert 1 <= batcher.dispatch_count < len(audios)
    finally:
        batcher.close()
    for got, ref in zip(batched, solo):
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-3 if _TPU else 1e-5)


def test_mossformer2_se_window_batcher():
    from mlx_audio_tpu.nn import seed_rng
    from mlx_audio_tpu.serving import get_infer_hook
    from mlx_audio_tpu.sts.models.mossformer2_se.config import \
        MossFormer2SEConfig
    from mlx_audio_tpu.sts.models.mossformer2_se.model import Model

    seed_rng(24)
    cfg = MossFormer2SEConfig(in_channels=12, out_channels=16,
                              out_channels_final=961, num_blocks=1,
                              num_mels=4, chunk_seconds=1.0)
    m = Model(cfg)
    rng = np.random.default_rng(4)
    audios = [rng.standard_normal(48000).astype(np.float32) * 0.05
              for _ in range(3)]
    solo = [m.enhance(a, chunked=False) for a in audios]
    batcher = m.make_batcher(max_batch=4, window_ms=40.0).install()
    try:
        assert get_infer_hook(m) is batcher  # wrapper-keyed for unload
        batched = _concurrent(lambda a: m.enhance(a, chunked=False),
                              [(a,) for a in audios])
        assert 1 <= batcher.dispatch_count < len(audios)
    finally:
        batcher.close()
    assert get_infer_hook(m) is None
    for got, ref in zip(batched, solo):
        np.testing.assert_allclose(got, ref, atol=1e-5)


def test_mossformer2_se_chunked_self_fusion():
    """A single long chunked request submits its own windows concurrently
    under a batcher: equal-length chunks fuse into vmapped dispatches and
    the result equals the unbatched chunked decode."""
    from mlx_audio_tpu.nn import seed_rng
    from mlx_audio_tpu.sts.models.mossformer2_se.config import \
        MossFormer2SEConfig
    from mlx_audio_tpu.sts.models.mossformer2_se.model import Model

    seed_rng(25)
    cfg = MossFormer2SEConfig(in_channels=12, out_channels=16,
                              out_channels_final=961, num_blocks=1,
                              num_mels=4, chunk_seconds=1.0)
    m = Model(cfg)
    audio = np.random.default_rng(5).standard_normal(
        int(3.5 * 48000)).astype(np.float32) * 0.05
    ref = m.enhance(audio, chunked=True)
    batcher = m.make_batcher(max_batch=4, window_ms=40.0).install()
    try:
        got = m.enhance(audio, chunked=True)
        assert batcher.dispatch_count >= 1
    finally:
        batcher.close()
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_smart_turn_window_batcher():
    from mlx_audio_tpu.nn import seed_rng
    from mlx_audio_tpu.serving import get_infer_hook
    from mlx_audio_tpu.vad.models.smart_turn import Model, ModelConfig

    seed_rng(26)
    cfg = ModelConfig.from_dict(dict(
        encoder_config=dict(d_model=32, encoder_layers=1,
                            encoder_attention_heads=4, encoder_ffn_dim=64,
                            num_mel_bins=32, max_source_positions=512),
        processor_config=dict(n_mels=32, max_audio_seconds=2),
    ))
    m = Model(cfg)
    rng = np.random.default_rng(6)
    audios = [rng.standard_normal(16000).astype(np.float32) * 0.1
              for _ in range(3)]
    solo = [m.predict_endpoint(a) for a in audios]
    batcher = m.make_batcher(max_batch=4, window_ms=40.0).install()
    try:
        batched = _concurrent(lambda a: m.predict_endpoint(a),
                              [(a,) for a in audios])
        assert 1 <= batcher.dispatch_count < len(audios)
    finally:
        batcher.close()
    for got, ref in zip(batched, solo):
        assert got.probability == pytest.approx(
            ref.probability, abs=1e-2 if _TPU else 1e-6)
        if not _TPU:
            assert got.prediction == ref.prediction

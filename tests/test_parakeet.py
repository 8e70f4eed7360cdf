"""Parakeet tests: conformer shapes, on-device TDT/RNNT/CTC greedy loops,
chunk merge algorithms (reference strategy + golden rel-shift check)."""

import numpy as np
import pytest

from mlx_audio_tpu.stt.models.parakeet.alignment import (
    AlignedToken,
    merge_longest_common_subsequence,
    merge_longest_contiguous,
    tokens_to_sentences,
)
from mlx_audio_tpu.stt.models.parakeet.audio import PreprocessArgs, log_mel_spectrogram
from mlx_audio_tpu.stt.models.parakeet.conformer import Conformer, ConformerArgs
from mlx_audio_tpu.stt.models.parakeet.ctc import ConvASRDecoderArgs
from mlx_audio_tpu.stt.models.parakeet.parakeet import (
    Model,
    ParakeetCTC,
    ParakeetCTCArgs,
    ParakeetTDT,
    ParakeetTDTArgs,
    TDTDecodingArgs,
    CTCDecodingArgs,
)
from mlx_audio_tpu.stt.models.parakeet.rnnt import (
    JointArgs,
    JointNetworkArgs,
    PredictArgs,
    PredictNetworkArgs,
)

VOCAB = ["▁a", "▁b", "c", "d", ".", "▁e"]


def tiny_pre():
    return PreprocessArgs(sample_rate=16000, normalize="per_feature",
                          window_size=0.025, window_stride=0.01, window="hann",
                          features=32, n_fft=512, dither=0.0)


def tiny_enc():
    return ConformerArgs(
        feat_in=32, n_layers=2, d_model=64, n_heads=4, ff_expansion_factor=2,
        subsampling_factor=4, self_attention_model="rel_pos",
        subsampling="dw_striding", conv_kernel_size=9,
        subsampling_conv_channels=32, pos_emb_max_len=5000,
    )


@pytest.fixture(scope="module")
def tdt():
    args = ParakeetTDTArgs(
        preprocessor=tiny_pre(),
        encoder=tiny_enc(),
        decoder=PredictArgs(
            prednet=PredictNetworkArgs(pred_hidden=48, pred_rnn_layers=1),
            vocab_size=len(VOCAB),
        ),
        joint=JointArgs(
            jointnet=JointNetworkArgs(joint_hidden=48, activation="relu",
                                      pred_hidden=48, encoder_hidden=64),
            num_classes=len(VOCAB),
            vocabulary=VOCAB,
            num_extra_outputs=5,
        ),
        decoding=TDTDecodingArgs(model_type="tdt", durations=[0, 1, 2, 3, 4],
                                 greedy={"max_symbols": 3}),
    )
    return ParakeetTDT(args)


def test_mel_shapes():
    x = np.random.default_rng(0).standard_normal(16000).astype(np.float32)
    mel = log_mel_spectrogram(x, tiny_pre())
    assert mel.shape[0] == 1 and mel.shape[2] == 32
    m = np.asarray(mel)
    # per-feature normalized
    np.testing.assert_allclose(m[0].mean(axis=0), 0.0, atol=1e-3)


def test_conformer_subsampling(tdt):
    import jax.numpy as jnp

    mel = jnp.zeros((1, 64, 32))
    feats, lengths = tdt.encoder(mel, jnp.asarray([64]))
    assert feats.shape == (1, 16, 64)  # /4 subsampling
    assert int(lengths[0]) == 16


def test_rel_shift_matches_reference_semantics():
    """rel_shift must implement the Transformer-XL skewing trick."""
    from mlx_audio_tpu.stt.models.parakeet.attention import (
        RelPositionMultiHeadAttention,
    )
    import jax.numpy as jnp

    B, H, T, P = 1, 1, 3, 5  # P = 2T-1
    x = jnp.arange(B * H * T * P, dtype=jnp.float32).reshape(B, H, T, P)
    out = np.asarray(RelPositionMultiHeadAttention.rel_shift(x))
    # row i should be shifted so that out[i, j] = x[i, j + (T-1-i)]
    ref = np.zeros((T, P), np.float32)
    xi = np.asarray(x)[0, 0]
    for i in range(T):
        shift = T - 1 - i
        ref[i, : P - shift] = xi[i, shift:]
        # wrapped values may appear at the tail; only check the used region
    np.testing.assert_allclose(out[0, 0, :, :T], ref[:, :T])


def test_tdt_decode_produces_aligned_result(tdt):
    audio = np.random.default_rng(1).standard_normal(16000 * 2).astype(np.float32) * 0.1
    result = tdt.decode_chunk(audio)
    assert isinstance(result.text, str)
    for s in result.sentences:
        for t in s.tokens:
            assert t.id < len(VOCAB)
            assert t.start >= 0 and t.duration >= 0


def test_tdt_generate_with_chunking(tdt):
    audio = np.random.default_rng(2).standard_normal(16000 * 6).astype(np.float32) * 0.1
    result = tdt.generate(audio, chunk_duration=3.0, overlap_duration=1.0)
    assert isinstance(result.text, str)


def test_tdt_stream_generate(tdt):
    audio = np.random.default_rng(3).standard_normal(16000 * 4).astype(np.float32) * 0.1
    chunks = list(tdt.generate(audio, stream=True, chunk_duration=2.0,
                               overlap_duration=0.5))
    assert chunks[-1].is_final
    assert chunks[-1].progress == pytest.approx(1.0)


def test_ctc_model():
    args = ParakeetCTCArgs(
        preprocessor=tiny_pre(),
        encoder=tiny_enc(),
        decoder=ConvASRDecoderArgs(feat_in=64, num_classes=-1, vocabulary=VOCAB),
        decoding=CTCDecodingArgs(),
    )
    m = ParakeetCTC(args)
    audio = np.random.default_rng(4).standard_normal(16000).astype(np.float32) * 0.1
    result = m.decode_chunk(audio)
    assert isinstance(result.text, str)


def test_from_config_routing():
    cfg = {
        "target": "nemo.collections.asr.models.rnnt_bpe_models.EncDecRNNTBPEModel",
        "model_defaults": {"tdt_durations": [0, 1, 2, 3, 4]},
        "preprocessor": {"sample_rate": 16000, "normalize": "per_feature",
                         "window_size": 0.025, "window_stride": 0.01,
                         "window": "hann", "features": 32, "n_fft": 512,
                         "dither": 0.0},
        "encoder": {"feat_in": 32, "n_layers": 1, "d_model": 64, "n_heads": 4,
                    "ff_expansion_factor": 2, "subsampling_factor": 4,
                    "self_attention_model": "rel_pos",
                    "subsampling": "dw_striding", "conv_kernel_size": 9,
                    "subsampling_conv_channels": 32, "pos_emb_max_len": 5000},
        "decoder": {"prednet": {"pred_hidden": 48, "pred_rnn_layers": 1},
                    "vocab_size": 6},
        "joint": {"jointnet": {"joint_hidden": 48, "activation": "relu",
                               "pred_hidden": 48, "encoder_hidden": 64},
                  "num_classes": 6, "vocabulary": VOCAB,
                  "num_extra_outputs": 5},
        "decoding": {"model_type": "tdt", "durations": [0, 1, 2, 3, 4],
                     "greedy": {"max_symbols": 3}},
    }
    m = Model(cfg)
    assert isinstance(m, ParakeetTDT)


def test_merge_algorithms():
    def mk(ids, t0):
        return [AlignedToken(i, text=f"t{i}", start=t0 + k * 0.1, duration=0.1)
                for k, i in enumerate(ids)]

    a = mk([1, 2, 3, 4, 5], 0.0)
    b = mk([4, 5, 6, 7], 0.3)
    merged = merge_longest_common_subsequence(a, b, overlap_duration=0.5)
    ids = [t.id for t in merged]
    assert ids == [1, 2, 3, 4, 5, 6, 7]
    merged2 = merge_longest_contiguous(a, b, overlap_duration=0.5)
    assert [t.id for t in merged2] == [1, 2, 3, 4, 5, 6, 7]
    # non-overlapping concatenates
    c = mk([8, 9], 10.0)
    assert [t.id for t in merge_longest_contiguous(a, c, overlap_duration=0.5)] == [
        1, 2, 3, 4, 5, 8, 9
    ]


def test_sentence_splitting():
    toks = [
        AlignedToken(0, "▁Hi", 0.0, 0.1), AlignedToken(4, ".", 0.1, 0.1),
        AlignedToken(1, " there", 0.2, 0.1),
    ]
    sents = tokens_to_sentences(toks)
    assert len(sents) == 2


def test_tdt_batched_decode_matches_sequential(tdt):
    """decode_batch (one batched conformer pass + lock-step TDT loop)
    equals per-window decode exactly, including mixed window lengths."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    audios = [
        (rng.standard_normal(16000 * d) * 0.1).astype(np.float32)
        for d in (2, 2, 1)
    ]
    mels = [log_mel_spectrogram(a, tdt.preprocessor_config) for a in audios]
    seq = [tdt.decode(m)[0] for m in mels]
    batched = tdt.decode_batch(mels)
    assert len(batched) == len(seq)
    for s, b in zip(seq, batched):
        assert b.text == s.text
        s_toks = [(t.id, round(t.start, 4)) for sen in s.sentences
                  for t in sen.tokens]
        b_toks = [(t.id, round(t.start, 4)) for sen in b.sentences
                  for t in sen.tokens]
        assert b_toks == s_toks


def test_tdt_batcher_fuses_concurrent_requests(tdt):
    """Concurrent generate() calls route windows through an installed
    ParakeetBatcher: same text as sequential, fewer dispatches."""
    import threading

    from mlx_audio_tpu.serving import get_infer_hook

    rng = np.random.default_rng(8)
    audios = [
        (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
        for _ in range(3)
    ]
    seq = [tdt.generate(a) for a in audios]

    batcher = tdt.make_batcher(max_batch=4, window_ms=300.0).install()
    try:
        assert get_infer_hook(tdt) is batcher
        results = [None] * 3

        def run(i):
            results[i] = tdt.generate(audios[i])

        threads = [threading.Thread(target=run, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert all(r is not None for r in results)
        for s, b in zip(seq, results):
            assert b.text == s.text
        # same-length windows share one bucket → one fused dispatch
        assert batcher.dispatch_count == 1
    finally:
        batcher.close()
    assert get_infer_hook(tdt) is None

"""Whisper extras: DTW word timestamps and AlignAtt streaming."""

import numpy as np
import pytest

from mlx_audio_tpu.stt.models.whisper import Model, ModelDimensions
from mlx_audio_tpu.stt.models.whisper.timing import (
    WordTiming,
    add_word_timestamps,
    dtw,
    find_alignment,
    median_filter,
    merge_punctuations,
)
from mlx_audio_tpu.stt.models.whisper.tokenizer import DummyTokenizer
from mlx_audio_tpu.stt.models.whisper.streaming import (
    StreamingConfig,
    StreamingDecoder,
)


def tiny():
    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=2,
        n_audio_layer=1, n_vocab=2000, n_text_ctx=448, n_text_state=64,
        n_text_head=2, n_text_layer=2,
    )
    return Model(dims), DummyTokenizer(n_vocab=2000)


def test_dtw_monotonic_diagonal():
    # strong diagonal cost → alignment follows the diagonal
    N = 6
    x = np.ones((N, N)) - np.eye(N)
    ti, fi = dtw(x)
    assert ti[0] == 0 and fi[0] == 0
    assert ti[-1] == N - 1 and fi[-1] == N - 1
    assert (np.diff(ti) >= 0).all() and (np.diff(fi) >= 0).all()


def test_median_filter():
    x = np.arange(10, dtype=float)[None]
    y = median_filter(x, 3)
    assert y.shape == x.shape
    np.testing.assert_allclose(y[0][1:-1], x[0][1:-1])


def test_merge_punctuations():
    al = [WordTiming(" \"", [1], 0, 0.1, 1.0),
          WordTiming("Hi", [2], 0.1, 0.3, 1.0),
          WordTiming(",", [3], 0.3, 0.35, 1.0)]
    merge_punctuations(al, "\"'“¿([{-", "\"'.。,，!！?？:：”)]}、")
    words = [w.word for w in al if w.word]
    assert words == [" \"Hi,"]


def test_find_alignment_shapes():
    model, tok = tiny()
    mel = np.random.randn(3000, 80).astype(np.float32) * 0.1
    text_tokens = [20, 21, 22, 23]
    timings = find_alignment(model, tok, text_tokens, mel, num_frames=600)
    assert isinstance(timings, list)
    for t in timings:
        assert t.end >= t.start >= 0.0
        assert 0.0 <= t.probability <= 1.0


def test_add_word_timestamps():
    model, tok = tiny()
    mel = np.random.randn(3000, 80).astype(np.float32) * 0.1
    segments = [{"seek": 0, "start": 0.0, "end": 2.0,
                 "tokens": [20, 21, 22, 23]}]
    add_word_timestamps(segments=segments, model=model, tokenizer=tok,
                        mel=mel, num_frames=600, last_speech_timestamp=0.0)
    assert "words" in segments[0]
    for w in segments[0]["words"]:
        assert w["end"] >= w["start"]


def test_streaming_decoder_chunks():
    model, tok = tiny()
    dec = StreamingDecoder(model, StreamingConfig(frame_threshold=5),
                           tokenizer=tok)
    mel1 = np.random.randn(500, 80).astype(np.float32) * 0.1
    r1 = dec.decode_chunk(mel1)
    assert isinstance(r1.text, str)
    mel2 = np.random.randn(500, 80).astype(np.float32) * 0.1
    r2 = dec.decode_chunk(mel2, is_last=True)
    assert r2.is_final
    dec.reset()
    assert dec._accumulated_mel is None


def test_generate_streaming_end_to_end():
    """Model.generate_streaming yields chunk-latency partials ending with a
    final (reference whisper.py:1270)."""
    model, tok = tiny()
    audio = (np.random.default_rng(5).standard_normal(16000 * 3) * 0.05
             ).astype(np.float32)
    results = list(model.generate_streaming(
        audio, chunk_duration=1.0, language="en", frame_threshold=5,
        tokenizer=tok,
    ))
    assert results, "no streaming results yielded"
    assert results[-1].is_final
    assert results[-1].progress == 1.0
    assert abs(results[-1].audio_duration - 3.0) < 1e-6
    for r in results:
        assert r.language == "en"
        assert 0 < r.progress <= 1.0


def test_find_alignment_cross_kv_and_padding_invariance():
    """The bucket-padded, cross_kv-reusing path must be bit-identical to
    the original exact-length mel path (causal self-attn ⇒ pad rows can't
    affect earlier rows; stats slice to true length first)."""
    import jax

    model, tok = tiny()
    mel = np.random.default_rng(3).standard_normal((3000, 80)).astype(
        np.float32) * 0.1
    text_tokens = [20, 21, 22, 23, 24]

    base = find_alignment(model, tok, text_tokens, mel, num_frames=600,
                          pad_to=1)  # no padding
    padded = find_alignment(model, tok, text_tokens, mel, num_frames=600,
                            pad_to=64)
    _, ckv = Model._encode(model, np.asarray(mel)[None])
    reuse = find_alignment(model, tok, text_tokens, None, num_frames=600,
                           cross_kv=ckv, pad_to=64)

    assert len(base) == len(padded) == len(reuse) > 0
    for a, b in zip(base, padded):
        assert a.word == b.word and a.tokens == b.tokens
        np.testing.assert_allclose(
            [a.start, a.end, a.probability],
            [b.start, b.end, b.probability], atol=1e-5)
    for a, c in zip(base, reuse):
        assert a.word == c.word
        np.testing.assert_allclose(
            [a.start, a.end, a.probability],
            [c.start, c.end, c.probability], atol=1e-5)


def test_generate_chunked_word_timestamps():
    """Chunked fast path emits per-word timings from the batched encode's
    cross K/V; words stay inside their window's time span."""
    model, tok = tiny()
    audio = (np.random.default_rng(11).standard_normal(16000 * 40)
             * 0.05).astype(np.float32)
    out = model.generate_chunked(
        audio, language="en", temperature=0.0, tokenizer=tok,
        without_timestamps=True, word_timestamps=True, sample_len=8,
    )
    assert len(out.segments) == 2
    for seg in out.segments:
        assert "words" in seg
        t_prev = None
        for w in seg["words"]:
            assert w["end"] >= w["start"] >= 0.0
            if t_prev is not None:
                assert w["start"] >= t_prev - 1e-6
            t_prev = w["start"]
    # second window's words are offset by its 30 s seek
    if out.segments[1]["words"]:
        assert out.segments[1]["words"][0]["start"] >= 30.0 - 0.5

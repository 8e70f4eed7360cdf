"""Whisper on-device beam search (`_beam_decode_loop`) — a capability the
reference stubs out (its BeamSearchDecoder raises NotImplementedError,
reference decoding.py:482). Semantics follow openai-whisper's
BeamSearchDecoder + MaximumLikelihoodRanker, which the reference mirrors
for its implemented decoders."""

import numpy as np
import pytest

from mlx_audio_tpu.stt.models.whisper import Model, ModelDimensions
from mlx_audio_tpu.stt.models.whisper.audio import N_FRAMES
from mlx_audio_tpu.stt.models.whisper.decoding import (
    DecodingOptions,
    decode_window,
    verify_options,
)
from mlx_audio_tpu.stt.models.whisper.tokenizer import DummyTokenizer


@pytest.fixture(scope="module")
def tiny():
    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=2,
        n_audio_layer=1, n_vocab=2000, n_text_ctx=448, n_text_state=64,
        n_text_head=2, n_text_layer=1,
    )
    return Model(dims), DummyTokenizer(n_vocab=2000)


@pytest.fixture(scope="module")
def cross_kv(tiny):
    import jax.numpy as jnp

    model, _ = tiny
    mel = (
        jnp.asarray(
            np.random.default_rng(0).standard_normal((1, N_FRAMES, 80)),
            jnp.float32,
        )
        * 0.1
    )
    _, ckv = Model._encode(model, mel)
    return ckv


def _decode(tiny, cross_kv, **opt_kwargs):
    model, tok = tiny
    opts = DecodingOptions(language="en", **opt_kwargs)
    return decode_window(
        model, cross_kv, tok, list(tok.sot_sequence), opts,
        n_ctx=model.dims.n_text_ctx, n_vocab=model.dims.n_vocab,
        decoder_step=type(model)._decoder_step,
        make_caches=model._make_caches,
        sample_len=24,
    )


def test_verify_options_beam_accepted():
    # beam search is implemented — no NotImplementedError (the reference
    # raises here, decoding.py:482)
    verify_options(DecodingOptions(beam_size=5))
    verify_options(DecodingOptions(beam_size=5, patience=2.0))
    with pytest.raises(ValueError):
        verify_options(DecodingOptions(beam_size=5, best_of=5, temperature=1.0))
    with pytest.raises(ValueError):
        verify_options(DecodingOptions(patience=2.0))


def test_beam1_equals_greedy(tiny, cross_kv):
    greedy = _decode(tiny, cross_kv, temperature=0.0)
    beam1 = _decode(tiny, cross_kv, temperature=0.0, beam_size=1)
    assert beam1.tokens == greedy.tokens
    assert np.isclose(beam1.avg_logprob, greedy.avg_logprob, atol=1e-3)


def test_beam1_equals_greedy_without_timestamps(tiny, cross_kv):
    greedy = _decode(tiny, cross_kv, temperature=0.0, without_timestamps=True)
    beam1 = _decode(
        tiny, cross_kv, temperature=0.0, beam_size=1, without_timestamps=True
    )
    assert beam1.tokens == greedy.tokens


def test_beam3_deterministic_and_valid(tiny, cross_kv):
    model, tok = tiny
    r1 = _decode(tiny, cross_kv, temperature=0.0, beam_size=3)
    r2 = _decode(tiny, cross_kv, temperature=0.0, beam_size=3)
    assert r1.tokens == r2.tokens
    assert np.isfinite(r1.avg_logprob)
    assert 0.0 <= r1.no_speech_prob <= 1.0
    for t in r1.tokens:
        assert 0 <= t < model.dims.n_vocab
        assert t != tok.eot


def test_beam_patience_runs(tiny, cross_kv):
    r = _decode(
        tiny, cross_kv, temperature=0.0, beam_size=2, patience=2.0,
        length_penalty=1.0,
    )
    assert isinstance(r.tokens, list)
    assert np.isfinite(r.avg_logprob)


def test_beam_batch_matches_per_window(tiny):
    """G=2 windows × K=3 beams in ONE device program must equal each
    window's independent beam decode (groups are independent by
    construction — catches group-offset / cache-gather bugs)."""
    import jax
    import jax.numpy as jnp

    from mlx_audio_tpu.stt.models.whisper.decoding import decode_window_batch

    model, tok = tiny
    rng = np.random.default_rng(7)
    mels = jnp.asarray(
        rng.standard_normal((2, N_FRAMES, 80)), jnp.float32
    ) * 0.1
    _, ckv_both = Model._encode(model, mels)
    opts = DecodingOptions(language="en", temperature=0.0, beam_size=3)
    prompt = list(tok.sot_sequence)
    batched = decode_window_batch(
        model, ckv_both, tok, [prompt, prompt], opts,
        n_ctx=model.dims.n_text_ctx, n_vocab=model.dims.n_vocab,
        decoder_step=type(model)._decoder_step,
        make_caches=model._make_caches, sample_len=16,
    )
    assert len(batched) == 2
    for g in range(2):
        ckv_one = jax.tree.map(lambda x: x[g : g + 1], ckv_both)
        single = decode_window_batch(
            model, ckv_one, tok, [prompt], opts,
            n_ctx=model.dims.n_text_ctx, n_vocab=model.dims.n_vocab,
            decoder_step=type(model)._decoder_step,
            make_caches=model._make_caches, sample_len=16,
        )[0]
        assert batched[g].tokens == single.tokens
        assert np.isclose(
            batched[g].avg_logprob, single.avg_logprob, atol=1e-4
        )


def test_generate_with_beam(tiny):
    model, tok = tiny
    audio = (
        np.random.default_rng(1).standard_normal(16000 * 2) * 0.05
    ).astype(np.float32)
    out = model.generate(
        audio, language="en", temperature=0.0, beam_size=2,
        compression_ratio_threshold=None, logprob_threshold=None,
        no_speech_threshold=None, tokenizer=tok,
    )
    assert isinstance(out.text, str)

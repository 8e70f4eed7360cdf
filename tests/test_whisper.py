"""Whisper tests: tiny random-weight model, in-graph decode rules, seek
loop, writers (reference strategy: stt/tests/test_models.py)."""

import numpy as np
import pytest

from mlx_audio_tpu.stt.models.whisper import Model, ModelDimensions
from mlx_audio_tpu.stt.models.whisper.audio import (
    N_FRAMES,
    N_SAMPLES,
    log_mel_spectrogram,
    pad_or_trim,
)
from mlx_audio_tpu.stt.models.whisper.tokenizer import DummyTokenizer
from mlx_audio_tpu.stt.models.base import STTOutput


@pytest.fixture(scope="module")
def tiny():
    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=2,
        n_audio_layer=1, n_vocab=2000, n_text_ctx=448, n_text_state=64,
        n_text_head=2, n_text_layer=1,
    )
    return Model(dims), DummyTokenizer(n_vocab=2000)


def test_mel_and_pad():
    audio = np.zeros(16000, np.float32)
    mel = log_mel_spectrogram(audio, padding=N_SAMPLES)
    assert mel.shape[1] == 80
    x = pad_or_trim(np.zeros(100, np.float32))
    assert x.shape[0] == N_SAMPLES
    y = pad_or_trim(np.zeros(N_SAMPLES * 2, np.float32))
    assert y.shape[0] == N_SAMPLES


def test_encoder_shapes(tiny):
    import jax.numpy as jnp

    model, _ = tiny
    mel = jnp.zeros((1, N_FRAMES, 80))
    xa, cross_kv = Model._encode(model, mel)
    assert xa.shape == (1, 1500, 64)
    assert len(cross_kv) == 1
    k, v = cross_kv[0]
    assert k.shape == (1, 2, 1500, 32)


def test_decode_window_terminates_and_respects_rules(tiny):
    import jax.numpy as jnp
    from mlx_audio_tpu.stt.models.whisper.decoding import (
        DecodingOptions,
        decode_window,
    )

    model, tok = tiny
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, N_FRAMES, 80)), jnp.float32
    ) * 0.1
    _, cross_kv = Model._encode(model, mel)
    result = decode_window(
        model, cross_kv, tok, list(tok.sot_sequence),
        DecodingOptions(temperature=0.0), n_ctx=448, n_vocab=2000,
        decoder_step=Model._decoder_step,
        make_caches=lambda: model._make_caches(1), sample_len=24,
    )
    assert len(result.tokens) <= 24
    assert np.isfinite(result.avg_logprob)
    # rule: with timestamps on, first sampled token must be a timestamp
    assert result.tokens[0] >= tok.timestamp_begin
    # rule: suppressed tokens never sampled
    assert not set(result.tokens) & set(tok.non_speech_tokens)
    # rule: timestamps are monotonically non-decreasing
    ts = [t for t in result.tokens if t >= tok.timestamp_begin]
    assert ts == sorted(ts)


def test_generate_seek_loop(tiny):
    model, tok = tiny
    audio = (
        np.random.default_rng(1).standard_normal(int(16000 * 3)).astype(np.float32)
        * 0.05
    )
    out = model.generate(
        audio, tokenizer=tok, language="en", temperature=0.0,
        condition_on_previous_text=False, no_speech_threshold=None,
    )
    assert isinstance(out, STTOutput)
    assert out.segments is not None
    assert out.duration == pytest.approx(3.0, abs=0.1)
    assert out.extra["xrt"] > 0


def test_hf_key_remap():
    from mlx_audio_tpu.stt.models.whisper.whisper import _hf_to_native

    w = {
        "model.encoder.layers.0.self_attn.q_proj.weight": np.zeros((4, 4)),
        "model.decoder.layers.0.encoder_attn.k_proj.weight": np.zeros((4, 4)),
        "model.decoder.embed_tokens.weight": np.zeros((10, 4)),
        "model.encoder.layer_norm.weight": np.zeros(4),
    }
    out = _hf_to_native(w)
    assert "encoder.blocks.0.attn.query.weight" in out
    assert "decoder.blocks.0.cross_attn.key.weight" in out
    assert "decoder.token_embedding.weight" in out
    assert "encoder.ln_post.weight" in out


def test_writers(tmp_path):
    from mlx_audio_tpu.stt.models.whisper.writers import format_timestamp, get_writer

    assert format_timestamp(61.5) == "01:01.500"
    assert format_timestamp(3661.5, True, ",") == "01:01:01,500"
    result = STTOutput(
        text="hello world",
        segments=[
            {"start": 0.0, "end": 1.5, "text": " hello"},
            {"start": 1.5, "end": 3.0, "text": " world"},
        ],
        language="en",
    )
    for fmt in ["txt", "srt", "vtt", "tsv", "json"]:
        w = get_writer(fmt, str(tmp_path))
        w(result, "clip.wav")
        assert (tmp_path / f"clip.{fmt}").exists()
    srt = (tmp_path / "clip.srt").read_text()
    assert "00:00:00,000 --> 00:00:01,500" in srt


def test_generate_word_timestamps(tiny):
    """word_timestamps=True annotates segments with per-word timings via
    cross-attention DTW (reference whisper.py word_timestamps path)."""
    model, tok = tiny
    audio = (np.random.default_rng(3).standard_normal(16000 * 2) * 0.05).astype(
        np.float32
    )
    out = model.generate(
        audio, language="en", temperature=0.0, tokenizer=tok,
        condition_on_previous_text=False, word_timestamps=True,
    )
    assert isinstance(out, STTOutput)
    for seg in out.segments:
        assert "words" in seg
        for w in seg["words"]:
            assert set(w) == {"word", "start", "end", "probability"}
            assert w["end"] >= w["start"] >= 0.0


def test_bf16_generate_matches_f32(tiny):
    """cast_floats(whisper) decodes; greedy text matches f32 (fp16-checkpoint
    parity class; bf16 caches + encoder/decoder compute)."""
    import jax.numpy as jnp

    from mlx_audio_tpu.nn.module import cast_floats

    model, tok = tiny
    audio = (np.random.default_rng(7).standard_normal(16000 * 2) * 0.05).astype(
        np.float32
    )
    kw = dict(language="en", temperature=0.0, tokenizer=tok,
              condition_on_previous_text=False)
    ref = model.generate(audio, **kw)
    mb = cast_floats(model)
    assert mb.decoder.token_embedding.weight.dtype == jnp.bfloat16
    out = mb.generate(audio, **kw)
    assert isinstance(out.text, str)
    # greedy decisions may flip on near-ties with random weights, but the
    # structure must hold and most windows should agree
    assert len(out.segments) == len(ref.segments)


def test_generate_chunked_matches_structure(tiny):
    """Batch-parallel long-form mode: all windows encoded+decoded as one
    batch; segments cover the audio in 30s strides."""
    model, tok = tiny
    audio = (np.random.default_rng(9).standard_normal(16000 * 40) * 0.05).astype(
        np.float32
    )
    out = model.generate_chunked(
        audio, language="en", temperature=0.0, tokenizer=tok,
        without_timestamps=True,
    )
    assert isinstance(out, STTOutput)
    assert len(out.segments) == 2  # 40 s → two 30 s windows
    assert out.segments[0]["seek"] == 0
    assert out.segments[1]["seek"] == 3000
    assert out.extra["mode"] == "chunked"
    assert abs(out.duration - 40.0) < 0.1


def test_best_of_sampling_and_ranking(tiny):
    """best_of at T>0 runs N sample rows in one program and picks the
    likelihood-ranked winner (reference decoding.py:462,478,686)."""
    import jax.numpy as jnp
    from mlx_audio_tpu.stt.models.whisper.decoding import (
        DecodingOptions,
        decode_window,
        rank_score,
    )

    model, tok = tiny
    mel = jnp.asarray(
        np.random.default_rng(5).standard_normal((1, N_FRAMES, 80)), jnp.float32
    ) * 0.1
    _, cross_kv = Model._encode(model, mel)
    kw = dict(
        n_ctx=448, n_vocab=2000, decoder_step=Model._decoder_step,
        make_caches=model._make_caches, sample_len=16,
    )
    best = decode_window(
        model, cross_kv, tok, list(tok.sot_sequence),
        DecodingOptions(temperature=0.8, best_of=4, length_penalty=0.6), **kw
    )
    assert np.isfinite(best.avg_logprob)
    # the winner must score at least as high as a single-sample decode
    single = decode_window(
        model, cross_kv, tok, list(tok.sot_sequence),
        DecodingOptions(temperature=0.8), **kw
    )
    s_best = rank_score(
        best.avg_logprob * (len(best.tokens) + 1), len(best.tokens), 0.6
    )
    s_single = rank_score(
        single.avg_logprob * (len(single.tokens) + 1), len(single.tokens), 0.6
    )
    assert s_best >= s_single - 1e-6


def test_decode_option_validation(tiny):
    """Unsupported/inconsistent options raise like the reference
    (decoding.py:482,511-517) instead of being silently ignored."""
    import jax.numpy as jnp
    from mlx_audio_tpu.stt.models.whisper.decoding import (
        DecodingOptions,
        decode_window,
        verify_options,
    )

    # beam search is implemented here (beyond the reference, whose decoder
    # raises NotImplementedError at decoding.py:482) — beam_size is valid
    verify_options(DecodingOptions(beam_size=5))
    with pytest.raises(ValueError):
        verify_options(DecodingOptions(beam_size=5, best_of=3, temperature=0.5))
    with pytest.raises(ValueError):
        verify_options(DecodingOptions(best_of=3, temperature=0.0))
    with pytest.raises(ValueError):
        verify_options(DecodingOptions(patience=2.0))
    with pytest.raises(ValueError):
        verify_options(DecodingOptions(length_penalty=3.0))
    verify_options(DecodingOptions(best_of=3, temperature=0.5, length_penalty=0.5))

    model, tok = tiny
    audio = np.zeros(16000, np.float32)
    with pytest.raises(TypeError, match="unknown decode options"):
        model.generate(audio, tokenizer=tok, language="en", bogus_option=1)
    # fallback loop strips best_of at t=0 / beam at t>0 like the reference,
    # so a mixed request with the full temperature schedule still works
    out = model.generate(
        audio, tokenizer=tok, language="en", best_of=2,
        condition_on_previous_text=False, no_speech_threshold=None,
    )
    assert out is not None


def test_alignment_heads_decode_and_config_roundtrip():
    """base85 alignment-head dumps decode to (layer, head) pairs and flow
    through config into the model (reference scripts/convert.py:50-66,
    whisper.py:518-526)."""
    from mlx_audio_tpu.stt.models.whisper.convert import (
        _ALIGNMENT_HEADS,
        available_models,
        decode_alignment_heads,
    )

    assert "large-v3-turbo" in available_models()
    # tiny: 4 text layers, 6 heads
    pairs = decode_alignment_heads(_ALIGNMENT_HEADS["tiny"], 4, 6)
    assert pairs and all(0 <= l < 4 and 0 <= h < 6 for l, h in pairs)

    dims = dict(n_mels=80, n_audio_ctx=1500, n_audio_state=64,
                n_audio_head=2, n_audio_layer=1, n_vocab=2000,
                n_text_ctx=448, n_text_state=64, n_text_head=2,
                n_text_layer=2, alignment_heads=[[1, 0], [1, 1]])
    m = Model(dims)
    assert m.alignment_heads == ((1, 0), (1, 1))


def test_clip_timestamps(tiny):
    """clip_timestamps restricts transcription to the given ranges
    (reference whisper.py:785,881-897)."""
    model, tok = tiny
    audio = (
        np.random.default_rng(3).standard_normal(int(16000 * 6)).astype(np.float32)
        * 0.05
    )
    out = model.generate(
        audio, tokenizer=tok, language="en", temperature=0.0,
        condition_on_previous_text=False, no_speech_threshold=None,
        clip_timestamps="0,2",
    )
    assert out.segments is not None
    # every segment lives inside the 2 s clip (+30 s timestamp-token slack
    # is impossible here: the window itself is capped at the clip)
    for s in out.segments:
        assert s["start"] >= 0.0

    # odd count implies "to end of audio"; later start offsets all segments
    out2 = model.generate(
        audio, tokenizer=tok, language="en", temperature=0.0,
        condition_on_previous_text=False, no_speech_threshold=None,
        clip_timestamps=[3.0],
    )
    for s in out2.segments:
        assert s["start"] >= 3.0 - 1e-6


def test_hallucination_heuristics_unit():
    """Anomaly scoring matches the reference's constants
    (whisper.py:1022-1046)."""
    from mlx_audio_tpu.stt.models.whisper.whisper import (
        _get_end,
        _is_segment_anomaly,
        _next_words_segment,
        _word_anomaly_score,
    )

    good = {"word": " hello", "start": 1.0, "end": 1.4, "probability": 0.9}
    assert _word_anomaly_score(good) == 0.0
    improbable = dict(good, probability=0.01)
    assert _word_anomaly_score(improbable) == 1.0
    too_long = dict(good, end=4.0)
    assert _word_anomaly_score(too_long) == pytest.approx(1.0)

    seg_ok = {"words": [good] * 4, "start": 1.0, "end": 2.0}
    seg_bad = {"words": [improbable] * 4, "start": 1.0, "end": 2.0}
    assert not _is_segment_anomaly(seg_ok)
    assert _is_segment_anomaly(seg_bad)
    assert not _is_segment_anomaly(None)

    segs = [{"words": [], "end": 5.0}, seg_ok]
    assert _next_words_segment(segs) is seg_ok
    assert _get_end(segs) == good["end"]
    assert _get_end([{"words": [], "end": 5.0}]) == 5.0
    assert _get_end([]) is None


def test_hallucination_silence_threshold_runs(tiny):
    """word_timestamps + hallucination_silence_threshold exercises the
    silence-skip path end to end (reference whisper.py:1137-1203)."""
    model, tok = tiny
    audio = (
        np.random.default_rng(5).standard_normal(int(16000 * 4)).astype(np.float32)
        * 0.05
    )
    out = model.generate(
        audio, tokenizer=tok, language="en", temperature=0.0,
        condition_on_previous_text=False, no_speech_threshold=None,
        word_timestamps=True, hallucination_silence_threshold=2.0,
    )
    assert isinstance(out, STTOutput)
    # blanked segments (instantaneous/text-free) must carry no tokens
    for s in out.segments:
        if s["start"] == s["end"]:
            assert s["tokens"] == []


def test_generate_chunked_temperature_fallback(tiny):
    """A temperature sequence re-decodes the group at the next temperature
    when thresholds fail; with an impossible logprob threshold every
    window falls through to the last temperature (reference
    whisper.py:904-940 semantics, batched)."""
    model, tok = tiny
    audio = (np.random.default_rng(5).standard_normal(16000 * 40) * 0.05
             ).astype(np.float32)
    out = model.generate_chunked(
        audio, language="en", temperature=(0.0, 0.7), tokenizer=tok,
        without_timestamps=True, sample_len=6,
        logprob_threshold=1e9,        # nothing passes -> fallback to 0.7
        no_speech_threshold=None,
    )
    assert len(out.segments) == 2
    assert all(s["temperature"] == 0.7 for s in out.segments)

    # single float -> no fallback pass, first result kept
    out0 = model.generate_chunked(
        audio, language="en", temperature=0.0, tokenizer=tok,
        without_timestamps=True, sample_len=6,
        logprob_threshold=1e9, no_speech_threshold=None,
    )
    assert all(s["temperature"] == 0.0 for s in out0.segments)


def test_generate_chunked_no_speech_skip(tiny):
    """Windows over the no-speech threshold emit no segment."""
    model, tok = tiny
    audio = (np.random.default_rng(6).standard_normal(16000 * 40) * 0.05
             ).astype(np.float32)
    out = model.generate_chunked(
        audio, language="en", temperature=0.0, tokenizer=tok,
        without_timestamps=True, sample_len=6,
        no_speech_threshold=-1.0,     # every prob exceeds -> all skipped
        logprob_threshold=None,
    )
    assert out.segments == []


def test_generate_chunked_initial_prompt(tiny):
    """initial_prompt prefixes every window's prompt row (sot_prev +
    tokens + sot sequence), biasing decode without rolling context."""
    model, tok = tiny
    audio = (np.random.default_rng(7).standard_normal(16000 * 40) * 0.05
             ).astype(np.float32)
    out = model.generate_chunked(
        audio, language="en", temperature=0.0, tokenizer=tok,
        without_timestamps=True, sample_len=6,
        initial_prompt="medical dictation",
        no_speech_threshold=None,
    )
    assert len(out.segments) == 2
    # prompt tokens are not part of the emitted transcript tokens
    for seg in out.segments:
        assert all(t < tok.timestamp_begin for t in seg["tokens"]
                   if t < tok.eot)


def test_generate_chunked_conditioned_matches_sequential_chain(tiny):
    """condition_on_previous_text=True in chunked mode reproduces the
    sequential induction exactly: window k's final decode uses the prompt
    built from the FINAL tokens of windows < k (same 30 s windowing).
    Verified against an explicit one-window-at-a-time loop."""
    import jax.numpy as jnp

    from mlx_audio_tpu.stt.models.whisper.decoding import (
        DecodingOptions,
        decode_window_batch,
    )

    model, tok = tiny
    audio = (np.random.default_rng(11).standard_normal(16000 * 85) * 0.05
             ).astype(np.float32)

    out = model.generate_chunked(
        audio, language="en", temperature=0.0, tokenizer=tok,
        without_timestamps=True, sample_len=8,
        condition_on_previous_text=True,
        no_speech_threshold=None, logprob_threshold=None,
        compression_ratio_threshold=None,
    )
    assert out.extra["mode"] == "chunked+conditioned"
    assert out.extra["sweeps"] >= 2  # sweep 1 unconditioned, ≥1 re-decode

    # explicit sequential reference with the same fixed-stride windowing
    mel_dev, _ = model._mel_chunks_device(audio)
    n_windows = len(out.segments)
    assert n_windows == 3
    sot_seq = list(tok.sot_sequence_including_notimestamps)
    opts = DecodingOptions(task="transcribe", language="en",
                           temperature=0.0, without_timestamps=True,
                           sample_len=8)
    prev: list = []
    seq_tokens = []
    for k in range(n_windows):
        row = (model._build_prompt(prev, sot_seq, tok) if prev
               else list(sot_seq))
        _xa, ckv = Model._encode(model, mel_dev[k:k + 1])
        res = decode_window_batch(
            model, ckv, tok, [row], opts,
            n_ctx=model.dims.n_text_ctx, n_vocab=model.dims.n_vocab,
            decoder_step=type(model)._decoder_step,
            make_caches=model._make_caches,
        )[0]
        seq_tokens.append(list(res.tokens))
        prev.extend(res.tokens)

    assert [list(s["tokens"]) for s in out.segments] == seq_tokens

    # and the conditioning is not a no-op on this input: the unconditioned
    # transcription differs for at least one later window
    out0 = model.generate_chunked(
        audio, language="en", temperature=0.0, tokenizer=tok,
        without_timestamps=True, sample_len=8,
        no_speech_threshold=None, logprob_threshold=None,
        compression_ratio_threshold=None,
    )
    assert [list(s["tokens"]) for s in out0.segments] != seq_tokens


def test_generate_chunked_conditioned_sequential_fallback(tiny):
    """max_sweeps=0 forces the exact sequential-finish path; it must give
    the same chain as the fixpoint."""
    model, tok = tiny
    audio = (np.random.default_rng(12).standard_normal(16000 * 85) * 0.05
             ).astype(np.float32)
    kw = dict(language="en", temperature=0.0, tokenizer=tok,
              without_timestamps=True, sample_len=8,
              condition_on_previous_text=True,
              no_speech_threshold=None, logprob_threshold=None,
              compression_ratio_threshold=None)
    fix = model.generate_chunked(audio, **kw)
    seq = model.generate_chunked(audio, max_sweeps=0, **kw)
    assert [s["tokens"] for s in fix.segments] == \
        [s["tokens"] for s in seq.segments]


def test_quantized_fused_qkv_matches_unfused():
    """Post-load q/k/v fusion on a quantized whisper: decoder/encoder
    self-attention collapses to one GEMV (mixed bias-ness: key is
    bias-less), cross-attention keeps separate projections (its key/value
    read encoder state), and logits match the unfused quantized model."""
    import jax
    import jax.numpy as jnp
    from mlx_audio_tpu.nn import quantize_module
    from mlx_audio_tpu.nn.quantized import (QuantizedFusedLinear,
                                            fuse_quantized_projections)

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=2,
        n_audio_layer=1, n_vocab=2000, n_text_ctx=448, n_text_state=64,
        n_text_head=2, n_text_layer=1,
    )
    del jax  # silence unused (Model methods jit internally)
    qmodel = quantize_module(Model(dims), group_size=32, bits=4)
    mel = jnp.asarray(np.random.default_rng(0).normal(size=(1, 96, 80)),
                      jnp.float32)
    toks = jnp.asarray([[1, 2, 3]])
    feats = qmodel.embed_audio(mel)
    ref = qmodel.logits(toks, feats)

    n = fuse_quantized_projections(qmodel)
    assert n == 2  # encoder self-attn + decoder self-attn; cross vetoed
    blk = qmodel.decoder.blocks[0]
    assert isinstance(blk.attn.qkv_fused, QuantizedFusedLinear)
    assert not hasattr(blk.attn, "query")
    assert hasattr(blk.cross_attn, "query")  # veto kept cross projections

    out = qmodel.logits(toks, qmodel.embed_audio(mel))
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-2, rtol=1e-2)

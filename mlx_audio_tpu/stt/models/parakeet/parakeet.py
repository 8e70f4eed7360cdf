"""Parakeet STT — FastConformer encoder + TDT / RNNT / CTC decoders.

Behavioral spec: reference stt/models/parakeet/parakeet.py (Model :147,
generate :180 with chunk+merge, ParakeetTDT :488 greedy loop :511,
ParakeetRNNT :598, ParakeetCTC :698, ParakeetTDTCTC :812). TPU-first: the
data-dependent TDT/RNNT greedy loops run ENTIRELY on device as
`lax.while_loop`s with fixed-size emission buffers (the reference loops in
python, syncing per frame — SURVEY flags this as the hardest loop to make
XLA-friendly); the host fetches (tokens, times, durations, count) once per
chunk. Mel length is bucketed; padded frames are masked in attention.
"""

from __future__ import annotations

import time as _time
from dataclasses import dataclass, field
from functools import partial
from pathlib import Path
from typing import Callable, Generator, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....utils import from_dict
from ..base import STTOutput
from . import tokenizer as tok
from .alignment import (
    AlignedResult,
    AlignedToken,
    merge_longest_common_subsequence,
    merge_longest_contiguous,
    sentences_to_result,
    tokens_to_sentences,
)
from .audio import PreprocessArgs, log_mel_spectrogram
from .conformer import Conformer, ConformerArgs
from .ctc import AuxCTCArgs, ConvASRDecoder, ConvASRDecoderArgs
from .rnnt import JointArgs, JointNetwork, PredictArgs, PredictNetwork

from ....nn.module import Module

__all__ = ["Model", "ModelConfig", "ParakeetTDT", "ParakeetRNNT", "ParakeetCTC",
           "ParakeetTDTCTC", "StreamingResult"]


@dataclass
class TDTDecodingArgs:
    model_type: str = "tdt"
    durations: List[int] = field(default_factory=lambda: [0, 1, 2, 3, 4])
    greedy: Optional[dict] = None


@dataclass
class RNNTDecodingArgs:
    greedy: Optional[dict] = None


@dataclass
class CTCDecodingArgs:
    greedy: Optional[dict] = None


@dataclass
class ParakeetTDTArgs:
    preprocessor: PreprocessArgs = None
    encoder: ConformerArgs = None
    decoder: PredictArgs = None
    joint: JointArgs = None
    decoding: TDTDecodingArgs = None


@dataclass
class ParakeetRNNTArgs:
    preprocessor: PreprocessArgs = None
    encoder: ConformerArgs = None
    decoder: PredictArgs = None
    joint: JointArgs = None
    decoding: RNNTDecodingArgs = None


@dataclass
class ParakeetCTCArgs:
    preprocessor: PreprocessArgs = None
    encoder: ConformerArgs = None
    decoder: ConvASRDecoderArgs = None
    decoding: CTCDecodingArgs = None


@dataclass
class ParakeetTDTCTCArgs(ParakeetTDTArgs):
    aux_ctc: AuxCTCArgs = None


@dataclass
class StreamingResult:
    text: str
    tokens: List[int]
    is_final: bool
    start_time: float
    end_time: float
    progress: float = 0.0
    audio_position: float = 0.0
    audio_duration: float = 0.0
    language: str = "en"


class ModelConfig:
    def __init__(self, config: dict):
        self._config = config

    @classmethod
    def from_dict(cls, config: dict) -> "ModelConfig":
        return cls(config)


MEL_BUCKETS = (256, 512, 1024, 1536, 2048, 3072, 4096, 6144)


def _bucket(n, buckets=MEL_BUCKETS):
    for b in buckets:
        if n <= b:
            return b
    return ((n + 511) // 512) * 512


# ---------------------------------------------------------------------------
# On-device greedy loops
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=("durations", "max_symbols", "vocab_size", "max_steps"),
)
def _tdt_greedy_loop(model, features, length, durations: tuple,
                     max_symbols: int, vocab_size: int, max_steps: int):
    """TDT greedy decode on device, batch-polymorphic: features (B, T, D),
    length (B,) → fixed-size (tokens (B, S), times, dur_idx, count (B,)).

    Rows advance independently in lock-step (per-row time index, LSTM
    state, emit gate); a row whose time index passes its length goes
    inert while the others finish. B=1 reproduces the single-window
    decode exactly, so the serving batcher (`decode_batch`) yields
    sequential-identical tokens. Reference: parakeet.py:511 (python
    per-step loop, one window at a time)."""
    dur_arr = jnp.asarray(durations, jnp.int32)
    B, T = features.shape[0], features.shape[1]
    lstm0 = model.decoder.init_state(B)
    brow = jnp.arange(B)

    def cond(s):
        return jnp.any(s[1] < length) & (s[0] < max_steps)

    def body(s):
        step, time_idx, last_tok, lstm, n_sym, j, toks, times, durs = s
        active = time_idx < length  # (B,)
        t_idx = jnp.clip(time_idx, 0, T - 1)
        feature = jnp.take_along_axis(
            features, t_idx[:, None, None], axis=1)  # (B, 1, D)
        use_zero = last_tok == vocab_size
        dec_out, new_lstm = model.decoder.step_embed(
            jnp.clip(last_tok, 0, vocab_size - 1)[:, None], use_zero, lstm
        )
        joint = model.joint(feature, dec_out)[:, 0, 0]  # (B, V+1+ndur)
        pred = jnp.argmax(joint[:, : vocab_size + 1],
                          axis=-1).astype(jnp.int32)
        decision = jnp.argmax(joint[:, vocab_size + 1:],
                              axis=-1).astype(jnp.int32)
        dur = dur_arr[decision]  # (B,)

        emit = (pred != vocab_size) & active
        jc = jnp.clip(j, 0, max_steps - 1)
        toks = toks.at[brow, jc].set(jnp.where(emit, pred, toks[brow, jc]))
        times = times.at[brow, jc].set(
            jnp.where(emit, time_idx, times[brow, jc]))
        durs = durs.at[brow, jc].set(jnp.where(emit, dur, durs[brow, jc]))
        j = j + emit.astype(jnp.int32)
        last_tok = jnp.where(emit, pred, last_tok)
        lstm = jax.tree_util.tree_map(
            # LSTM state is (L, B, H): select per ROW
            lambda new, old: jnp.where(emit[None, :, None], new, old),
            new_lstm, lstm,
        )

        time_idx = time_idx + jnp.where(active, dur, 0)
        n_sym = jnp.where(active, jnp.where(dur != 0, 0, n_sym + 1), n_sym)
        force = (max_symbols > 0) & (n_sym >= max_symbols) & active
        time_idx = time_idx + force.astype(jnp.int32)
        n_sym = jnp.where(force, 0, n_sym)
        return (step + 1, time_idx, last_tok, lstm, n_sym, j, toks, times,
                durs)

    z = jnp.zeros((B, max_steps), jnp.int32)
    zb = jnp.zeros((B,), jnp.int32)
    state = (
        jnp.array(0, jnp.int32), zb,
        jnp.full((B,), vocab_size, jnp.int32), lstm0, zb, zb, z, z, z,
    )
    state = jax.lax.while_loop(cond, body, state)
    _, _, _, _, _, j, toks, times, durs = state
    return toks, times, durs, j


@partial(jax.jit, static_argnames=("max_symbols", "vocab_size", "max_steps"))
def _rnnt_greedy_loop(model, features, length, max_symbols: int,
                      vocab_size: int, max_steps: int):
    """Standard RNNT greedy: advance time on blank, emit otherwise."""
    T = features.shape[1]
    lstm0 = model.decoder.init_state(1)

    def cond(s):
        return (s[1] < length) & (s[0] < max_steps)

    def body(s):
        step, time_idx, last_tok, lstm, n_sym, j, toks, times = s
        feature = jax.lax.dynamic_slice(
            features, (0, jnp.clip(time_idx, 0, T - 1), 0), (1, 1, features.shape[2])
        )
        use_zero = last_tok == vocab_size
        dec_out, new_lstm = model.decoder.step_embed(
            jnp.clip(last_tok, 0, vocab_size - 1)[None, None], use_zero[None], lstm
        )
        joint = model.joint(feature, dec_out)[0, 0, 0]
        pred = jnp.argmax(joint[: vocab_size + 1]).astype(jnp.int32)
        emit = pred != vocab_size
        hit_cap = (max_symbols > 0) & (n_sym + 1 >= max_symbols)
        toks = toks.at[j].set(jnp.where(emit, pred, toks[j]))
        times = times.at[j].set(jnp.where(emit, time_idx, times[j]))
        j = j + emit.astype(jnp.int32)
        last_tok = jnp.where(emit, pred, last_tok)
        lstm = jax.tree_util.tree_map(
            lambda new, old: jnp.where(emit, new, old), new_lstm, lstm
        )
        advance = (~emit) | hit_cap
        time_idx = time_idx + advance.astype(jnp.int32)
        n_sym = jnp.where(advance, 0, n_sym + 1)
        return (step + 1, time_idx, last_tok, lstm, n_sym, j, toks, times)

    z = jnp.zeros((max_steps,), jnp.int32)
    state = (
        jnp.array(0, jnp.int32), jnp.array(0, jnp.int32),
        jnp.array(vocab_size, jnp.int32), lstm0, jnp.array(0, jnp.int32),
        jnp.array(0, jnp.int32), z, z,
    )
    state = jax.lax.while_loop(cond, body, state)
    _, _, _, _, _, j, toks, times = state
    return toks, times, j


@jax.jit
def _encode(model, mel, lengths):
    return model.encoder(mel, lengths)


@jax.jit
def _ctc_logprobs(model, feats):
    return model.decoder(feats)


# ---------------------------------------------------------------------------
# Models
# ---------------------------------------------------------------------------


class BaseParakeet(Module):
    """Shared transcription/chunking logic (reference Model :147)."""

    def __init__(self, preprocess_args: PreprocessArgs):
        self.preprocessor_config = preprocess_args

    @property
    def time_per_encoded_frame(self) -> float:
        return (
            self.encoder_config.subsampling_factor
            * self.preprocessor_config.hop_length
            / self.preprocessor_config.sample_rate
        )

    def _encode_mel(self, mel: jax.Array):
        """Pad to a bucketed length and run the conformer (one compile per
        bucket); returns (features, out_length)."""
        T = mel.shape[-2]
        Tpad = _bucket(T)
        if mel.ndim == 2:
            mel = mel[None]
        mel = jnp.pad(mel, [(0, 0), (0, Tpad - T), (0, 0)])
        lengths = jnp.asarray([T], jnp.int32)
        feats, out_lengths = _encode(self, mel, lengths)
        return feats, int(jax.device_get(out_lengths)[0])

    def decode(self, mel: jax.Array) -> List[AlignedResult]:
        raise NotImplementedError

    def _decode_window(self, mel: jax.Array) -> AlignedResult:
        """One transcription window — routed through an installed serving
        batcher when present (concurrent requests' windows then fuse into
        one batched encoder + lock-step decode dispatch)."""
        from ....serving import get_infer_hook

        hook = get_infer_hook(self)
        if hook is not None:
            return hook(mel)
        return self.decode(mel)[0]

    def decode_chunk(self, audio_data, verbose: bool = False,
                     dtype=None) -> AlignedResult:
        mel = log_mel_spectrogram(audio_data, self.preprocessor_config)
        if dtype is not None:
            mel = mel.astype(dtype)
        result = self._decode_window(mel)
        if verbose:
            print(result.text)
        return result

    def generate(self, audio, *, chunk_duration: Optional[float] = None,
                 overlap_duration: float = 15.0,
                 chunk_callback: Optional[Callable] = None, stream: bool = False,
                 verbose: bool = False, dtype=None, **kwargs):
        """`dtype` casts the mel features before the encoder (reference
        parakeet.py:184-227 defaults to bfloat16; here None keeps the
        loaded parameter dtype, which governs compute precision)."""
        from ....utils import load_audio

        if isinstance(audio, (str, Path)):
            audio = load_audio(audio, sample_rate=self.preprocessor_config.sample_rate)
        audio = np.asarray(audio, np.float32).reshape(-1)
        sr = self.preprocessor_config.sample_rate

        if stream:
            return self._stream_generate(
                audio, chunk_duration or 10.0, overlap_duration, verbose,
                dtype=dtype,
            )

        if chunk_duration is None or len(audio) <= chunk_duration * sr:
            return self.decode_chunk(audio, verbose=verbose, dtype=dtype)

        chunk = int(chunk_duration * sr)
        overlap = int(overlap_duration * sr)
        step = chunk - overlap
        all_tokens: List[AlignedToken] = []
        pos = 0
        while pos < len(audio):
            seg = audio[pos : pos + chunk]
            if chunk_callback is not None:
                chunk_callback(pos + len(seg), len(audio))
            mel = log_mel_spectrogram(seg, self.preprocessor_config)
            if dtype is not None:
                mel = mel.astype(dtype)
            res = self._decode_window(mel)
            offset = pos / sr
            toks = [
                AlignedToken(t.id, t.text, t.start + offset, t.duration)
                for s in res.sentences for t in s.tokens
            ]
            if all_tokens:
                try:
                    all_tokens = merge_longest_contiguous(
                        all_tokens, toks, overlap_duration=overlap_duration
                    )
                except RuntimeError:
                    all_tokens = merge_longest_common_subsequence(
                        all_tokens, toks, overlap_duration=overlap_duration
                    )
            else:
                all_tokens = toks
            pos += step
        return sentences_to_result(tokens_to_sentences(all_tokens))

    def stream_generate(self, audio, *, chunk_duration: float = 5.0,
                        overlap_duration: float = 1.0, verbose: bool = False,
                        dtype=None, **kwargs):
        """Public streaming API (reference parakeet.py:295-394): yields
        StreamingResult with partial-then-final text as chunks decode."""
        audio = np.asarray(audio, np.float32).reshape(-1)
        return self._stream_generate(audio, chunk_duration,
                                     overlap_duration, verbose, dtype=dtype)

    def _stream_generate(self, audio, chunk_duration, overlap_duration,
                         verbose, dtype=None):
        sr = self.preprocessor_config.sample_rate
        chunk = int(chunk_duration * sr)
        overlap = int(overlap_duration * sr)
        step = max(chunk - overlap, 1)
        total = len(audio)
        all_tokens: List[AlignedToken] = []
        previous_text = ""
        pos = 0
        while True:
            seg = audio[pos : pos + chunk]
            is_last = pos + chunk >= total
            mel = log_mel_spectrogram(seg, self.preprocessor_config)
            if dtype is not None:
                mel = mel.astype(dtype)
            res = self._decode_window(mel)
            offset = pos / sr
            toks = [
                AlignedToken(t.id, t.text, t.start + offset, t.duration)
                for s in res.sentences for t in s.tokens
            ]
            if all_tokens:
                try:
                    all_tokens = merge_longest_contiguous(
                        all_tokens, toks, overlap_duration=overlap_duration
                    )
                except RuntimeError:
                    all_tokens = merge_longest_common_subsequence(
                        all_tokens, toks, overlap_duration=overlap_duration
                    )
            else:
                all_tokens = toks
            current = sentences_to_result(tokens_to_sentences(all_tokens))
            new_text = current.text[len(previous_text):]
            previous_text = current.text
            end = min(pos + chunk, total)
            yield StreamingResult(
                text=new_text,
                tokens=[t.id for t in all_tokens],
                is_final=is_last,
                start_time=all_tokens[0].start if all_tokens else 0.0,
                end_time=all_tokens[-1].end if all_tokens else end / sr,
                progress=end / total,
                audio_position=end / sr,
                audio_duration=total / sr,
            )
            if is_last:
                break
            pos += step

    @classmethod
    def from_config(cls, config: dict):
        target = config.get("target", "")
        tdt = config.get("model_defaults", {}).get("tdt_durations") is not None
        if target.endswith("EncDecRNNTBPEModel") and tdt:
            return ParakeetTDT(from_dict(ParakeetTDTArgs, config))
        if target.endswith("EncDecHybridRNNTCTCBPEModel") and tdt:
            return ParakeetTDTCTC(from_dict(ParakeetTDTCTCArgs, config))
        if target.endswith("EncDecRNNTBPEModel"):
            return ParakeetRNNT(from_dict(ParakeetRNNTArgs, config))
        if target.endswith("EncDecCTCModelBPE"):
            return ParakeetCTC(from_dict(ParakeetCTCArgs, config))
        raise ValueError(f"Unsupported parakeet target: {target}")


class Model(BaseParakeet):
    """Factory entry used by the registry: routes on the NeMo `target`."""

    def __new__(cls, config):
        if isinstance(config, ModelConfig):
            return cls.from_config(config._config)
        if isinstance(config, dict):
            return cls.from_config(config)
        return super().__new__(cls)


class ParakeetTDT(BaseParakeet):
    def __init__(self, args: ParakeetTDTArgs):
        super().__init__(args.preprocessor)
        assert args.decoding.model_type == "tdt"
        self.encoder_config = args.encoder
        self.vocabulary = args.joint.vocabulary
        self.durations = tuple(args.decoding.durations)
        self.max_symbols = (args.decoding.greedy or {}).get("max_symbols", None) or 0
        self.encoder = Conformer(args.encoder)
        self.decoder = PredictNetwork(args.decoder)
        self.joint = JointNetwork(args.joint)

    def _results_from_loop(self, toks, times, durs, j) -> List[AlignedResult]:
        toks, times, durs, j = jax.device_get((toks, times, durs, j))
        tpf = self.time_per_encoded_frame
        results = []
        for b in range(toks.shape[0]):
            hyp = [
                AlignedToken(
                    int(toks[b, i]),
                    text=tok.decode([int(toks[b, i])], self.vocabulary),
                    start=float(times[b, i]) * tpf,
                    duration=float(durs[b, i]) * tpf,
                )
                for i in range(int(j[b]))
            ]
            results.append(sentences_to_result(tokens_to_sentences(hyp)))
        return results

    def decode(self, mel: jax.Array) -> List[AlignedResult]:
        if mel.ndim == 2:
            mel = mel[None]
        results = []
        for b in range(mel.shape[0]):
            feats, out_len = self._encode_mel(mel[b])
            max_steps = 2 * feats.shape[1] + 8
            out = _tdt_greedy_loop(
                self, feats, jnp.asarray([out_len]), self.durations,
                self.max_symbols, len(self.vocabulary), max_steps,
            )
            results.extend(self._results_from_loop(*out))
        return results

    def decode_batch(self, mels: List[jax.Array]) -> List[AlignedResult]:
        """Decode several (possibly different-length) mel windows as ONE
        batched encoder pass + ONE lock-step TDT greedy loop. Serving path
        for concurrent requests (reference serves windows one at a time,
        parakeet.py:243-275); per-row results equal `decode` exactly."""
        Ts = [m.shape[-2] for m in mels]
        Tpad = _bucket(max(Ts))
        mel_b = jnp.stack([
            jnp.pad(m[0] if m.ndim == 3 else m, [(0, Tpad - t), (0, 0)])
            for m, t in zip(mels, Ts)
        ])
        feats, out_lens = _encode(self, mel_b,
                                  jnp.asarray(Ts, jnp.int32))
        max_steps = 2 * feats.shape[1] + 8
        out = _tdt_greedy_loop(
            self, feats, out_lens, self.durations,
            self.max_symbols, len(self.vocabulary), max_steps,
        )
        return self._results_from_loop(*out)

    def make_batcher(self, **kwargs):
        """Serving batcher: concurrent transcription windows fuse into one
        batched encoder + lock-step TDT decode (serving.ParakeetBatcher)."""
        from ....serving import ParakeetBatcher

        return ParakeetBatcher(self, **kwargs)


class ParakeetRNNT(BaseParakeet):
    def __init__(self, args: ParakeetRNNTArgs):
        super().__init__(args.preprocessor)
        self.encoder_config = args.encoder
        self.vocabulary = args.joint.vocabulary
        self.max_symbols = (args.decoding.greedy or {}).get("max_symbols", None) or 10
        self.encoder = Conformer(args.encoder)
        self.decoder = PredictNetwork(args.decoder)
        self.joint = JointNetwork(args.joint)

    def decode(self, mel: jax.Array) -> List[AlignedResult]:
        if mel.ndim == 2:
            mel = mel[None]
        results = []
        for b in range(mel.shape[0]):
            feats, out_len = self._encode_mel(mel[b])
            max_steps = (self.max_symbols + 1) * feats.shape[1] + 8
            toks, times, j = _rnnt_greedy_loop(
                self, feats, jnp.asarray(out_len), self.max_symbols,
                len(self.vocabulary), max_steps,
            )
            toks, times, j = jax.device_get((toks, times, j))
            tpf = self.time_per_encoded_frame
            hyp = [
                AlignedToken(
                    int(toks[i]),
                    text=tok.decode([int(toks[i])], self.vocabulary),
                    start=float(times[i]) * tpf,
                    duration=tpf,
                )
                for i in range(int(j))
            ]
            results.append(sentences_to_result(tokens_to_sentences(hyp)))
        return results


class ParakeetCTC(BaseParakeet):
    def __init__(self, args: ParakeetCTCArgs):
        super().__init__(args.preprocessor)
        self.encoder_config = args.encoder
        self.vocabulary = args.decoder.vocabulary
        self.encoder = Conformer(args.encoder)
        self.decoder = ConvASRDecoder(args.decoder)

    def decode(self, mel: jax.Array) -> List[AlignedResult]:
        if mel.ndim == 2:
            mel = mel[None]
        results = []
        blank = len(self.vocabulary)
        for b in range(mel.shape[0]):
            feats, out_len = self._encode_mel(mel[b])
            logprobs = _ctc_logprobs(self, feats)
            pred = np.asarray(jax.device_get(jnp.argmax(logprobs, axis=-1)))[0][:out_len]
            tpf = self.time_per_encoded_frame
            hyp = []
            prev = blank
            for t, p in enumerate(pred):
                if p != blank and p != prev:
                    hyp.append(
                        AlignedToken(
                            int(p), text=tok.decode([int(p)], self.vocabulary),
                            start=t * tpf, duration=tpf,
                        )
                    )
                prev = p
            results.append(sentences_to_result(tokens_to_sentences(hyp)))
        return results


class ParakeetTDTCTC(ParakeetTDT):
    """Hybrid model: TDT decoding with an auxiliary CTC head loaded for
    parity with the checkpoint (reference :812)."""

    def __init__(self, args: ParakeetTDTCTCArgs):
        super().__init__(args)
        if args.aux_ctc is not None:
            self.ctc_decoder = ConvASRDecoder(args.aux_ctc.decoder)

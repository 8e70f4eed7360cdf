"""AlignAtt streaming transcription for Whisper.

TPU-native re-implementation of the reference
mlx_audio/stt/models/whisper/streaming.py:19-278 (AlignAtt,
arxiv 2211.00895). The reference decodes one token per host step and
inspects attention on the host; here the whole greedy decode of a chunk —
including the per-step most-attended-frame check against the alignment
heads — runs as a single `lax.while_loop` on device, so each streamed chunk
costs one dispatch.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .audio import N_FRAMES, TOKENS_PER_SECOND

__all__ = ["StreamingConfig", "StreamingResult", "StreamingDecoder"]


@dataclass
class StreamingConfig:
    frame_threshold: int = 25
    min_chunk_duration: float = 0.5
    emit_partial: bool = True


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
    language: Optional[str] = None


@partial(
    jax.jit,
    static_argnames=("max_tokens", "sot_len", "eot", "heads"),
)
def _alignatt_decode(model, mel, sot_tokens, suppress_mask, content_frames,
                     frame_threshold, max_tokens: int, sot_len: int,
                     eot: int, heads):
    """Greedy decode with AlignAtt early stop, one dispatch.

    Returns (tokens (max_tokens,), count). A step is emitted only while the
    most-attended encoder frame of the newest token stays at least
    `frame_threshold` frames from the end of real audio content."""
    xa = model.encoder(mel)
    cross_kv = model.decoder.cross_kv(xa)
    caches = model._make_caches(1)

    def most_attended(qks):
        w = jnp.stack([qks[l][0, h, -1] for l, h in heads])  # (H, S)
        w = jax.nn.softmax(w.astype(jnp.float32), axis=-1)
        return jnp.argmax(w.mean(axis=0))

    # prefill with sot sequence (captures attention of last sot token)
    logits, caches = model.decoder(sot_tokens, 0, caches, cross_kv)
    logits = logits[:, -1].astype(jnp.float32)

    out = jnp.zeros((max_tokens,), jnp.int32)

    def cond(s):
        return (s[0] < max_tokens) & ~s[5]

    def body(s):
        step, caches, logits, out, pos, done = s
        lg = jnp.where(suppress_mask, -jnp.inf, logits[0])
        tok = jnp.argmax(lg).astype(jnp.int32)
        is_eot = tok == eot
        out = jnp.where(is_eot | done, out, out.at[step].set(tok))

        # decode the new token, capturing its cross-attention in the same
        # pass (one dispatch covers sampling + the AlignAtt check)
        new_logits, new_caches, qks = model.decoder.step_with_qk(
            tok[None, None], pos, caches, cross_kv)
        att_frame = most_attended(qks)
        stop_att = (content_frames - att_frame) <= frame_threshold
        done = done | is_eot | stop_att
        step = jnp.where(is_eot, step, step + 1)
        return (step, new_caches, new_logits[:, -1].astype(jnp.float32),
                out, pos + 1, done)

    state = (jnp.array(0, jnp.int32), caches, logits, out,
             jnp.array(sot_len, jnp.int32), jnp.array(False))
    n, _, _, out, _, _ = jax.lax.while_loop(cond, body, state)
    return out, n


class StreamingDecoder:
    """reference streaming.py:102-278."""

    def __init__(self, model, config: Optional[StreamingConfig] = None,
                 language: Optional[str] = None, task: str = "transcribe",
                 tokenizer=None):
        self.model = model
        self.config = config or StreamingConfig()
        if tokenizer is None:
            if not hasattr(model, "get_tokenizer"):
                raise ValueError("pass a tokenizer or use a model with "
                                 "get_tokenizer()")
            tokenizer = model.get_tokenizer(language=language or "en",
                                            task=task)
        self.tokenizer = tokenizer
        self._emitted_tokens: List[int] = []
        self._accumulated_mel: Optional[np.ndarray] = None
        self._sot = list(tokenizer.sot_sequence_including_notimestamps)

        n_vocab = model.dims.n_vocab
        suppress = np.zeros((n_vocab,), bool)
        for t in tokenizer.non_speech_tokens:
            suppress[t] = True
        for t in (tokenizer.sot, tokenizer.sot_prev, tokenizer.no_speech,
                  tokenizer.transcribe, tokenizer.translate):
            suppress[t] = True
        suppress[tokenizer.timestamp_begin:] = True
        self._suppress = jnp.asarray(suppress)

    def reset(self):
        self._emitted_tokens = []
        self._accumulated_mel = None

    def decode_chunk(self, mel, is_last: bool = False) -> StreamingResult:
        """mel: (frames, n_mels) chunk → newly stable tokens."""
        mel = np.asarray(mel)
        if self._accumulated_mel is None:
            self._accumulated_mel = mel
        else:
            self._accumulated_mel = np.concatenate(
                [self._accumulated_mel, mel], axis=0)
        if self._accumulated_mel.shape[0] > N_FRAMES:
            self._accumulated_mel = self._accumulated_mel[-N_FRAMES:]

        content_frames = self._accumulated_mel.shape[0] // 2
        padded = np.zeros((N_FRAMES, mel.shape[1]), np.float32)
        padded[: self._accumulated_mel.shape[0]] = self._accumulated_mel

        threshold = 4 if is_last else self.config.frame_threshold
        tokens, n = _alignatt_decode(
            self.model, jnp.asarray(padded)[None],
            jnp.asarray([self._sot], jnp.int32), self._suppress,
            jnp.array(content_frames, jnp.int32),
            jnp.array(threshold, jnp.int32),
            max_tokens=self.model.dims.n_text_ctx // 2,
            sot_len=len(self._sot), eot=self.tokenizer.eot,
            heads=tuple(self.model.alignment_heads))
        text_tokens = [int(t) for t in np.asarray(tokens)[: int(n)]
                       if t < self.tokenizer.eot]

        new_tokens = text_tokens[len(self._emitted_tokens):]
        if len(text_tokens) >= len(self._emitted_tokens):
            self._emitted_tokens = text_tokens
        start = ((len(self._emitted_tokens) - len(new_tokens))
                 / TOKENS_PER_SECOND)
        end = len(self._emitted_tokens) / TOKENS_PER_SECOND
        return StreamingResult(
            text=self.tokenizer.decode(new_tokens), tokens=new_tokens,
            is_final=is_last, start_time=start, end_time=end)

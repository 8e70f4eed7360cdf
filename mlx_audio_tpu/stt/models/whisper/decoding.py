"""Whisper decoding — the AR loop compiled to a single on-device
`lax.while_loop` (reference: decoding.py DecodingTask/_main_loop:617 runs a
host loop with `mx.async_eval` pipelining; on a tunneled TPU every host sync
costs ~30-60 ms, so the whole loop — logit filters, timestamp rules,
sampling, EOS — lives in-graph and the host fetches once per window).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["DecodingOptions", "DecodingResult", "decode_window"]


@dataclass
class DecodingOptions:
    task: str = "transcribe"
    language: Optional[str] = None
    temperature: float = 0.0
    sample_len: Optional[int] = None
    best_of: Optional[int] = None
    beam_size: Optional[int] = None
    patience: Optional[float] = None
    length_penalty: Optional[float] = None
    prompt: Optional[List[int]] = None
    prefix: Optional[str] = None
    suppress_tokens: Optional[str] = "-1"
    suppress_blank: bool = True
    without_timestamps: bool = False
    max_initial_timestamp: Optional[float] = 1.0
    fp16: bool = True


@dataclass
class DecodingResult:
    tokens: List[int] = field(default_factory=list)
    text: str = ""
    avg_logprob: float = float("nan")
    no_speech_prob: float = float("nan")
    temperature: float = 0.0
    compression_ratio: float = float("nan")
    language: Optional[str] = None


def compression_ratio(text: str) -> float:
    import zlib

    b = text.encode("utf-8")
    if not b:
        return 0.0
    return len(b) / len(zlib.compress(b))


def verify_options(options: DecodingOptions) -> None:
    """Validate decoding options like the reference (decoding.py:505-520):
    unsupported/inconsistent combinations raise instead of being silently
    ignored."""
    if options.beam_size is not None:
        # the reference's beam search path itself raises (decoding.py:482)
        raise NotImplementedError("beam search is not yet implemented")
    if options.best_of is not None and options.temperature == 0:
        raise ValueError("best_of with greedy sampling (t=0) is not compatible")
    if options.patience is not None:
        raise ValueError("patience requires beam_size to be given")
    if options.length_penalty is not None and not (
        0 <= options.length_penalty <= 1
    ):
        raise ValueError("length_penalty (alpha) should be a value between 0 and 1")


def rank_score(
    sum_logprob: float, length: int, length_penalty: Optional[float]
) -> float:
    """MaximumLikelihoodRanker score (reference decoding.py:462-478): total
    logprob normalized by the Google-NMT length penalty (or plain length)."""
    if length_penalty is None:
        penalty = float(max(length, 1))
    else:
        penalty = ((5.0 + length) / 6.0) ** length_penalty
    return sum_logprob / penalty


@partial(
    jax.jit,
    static_argnames=(
        "decoder_step", "sample_len", "n_ctx", "eot", "timestamp_begin",
        "no_timestamps", "blank", "no_speech", "without_timestamps",
        "max_initial_ts_index", "temperature", "sot_index",
    ),
    donate_argnames=("caches",),
)
def _decode_loop(
    model,
    caches,
    cross_kv,
    prompt,  # (B, Tp) int32
    suppress_mask,  # (V,) bool — True = suppress
    key,
    decoder_step,  # fn(model, tokens (B,t), pos0, caches, cross_kv) -> (logits, caches)
    sample_len: int,
    n_ctx: int,
    eot: int,
    timestamp_begin: int,
    no_timestamps: int,
    blank: int,
    no_speech: int,
    without_timestamps: bool,
    max_initial_ts_index: int,
    temperature: float,
    sot_index: int = 0,
):
    B, Tp = prompt.shape
    V = suppress_mask.shape[0]
    vocab_idx = jnp.arange(V)
    is_ts = vocab_idx >= timestamp_begin

    # ---- prefill ----
    logits, caches = decoder_step(model, prompt, 0, caches, cross_kv)
    last_logits = logits[:, -1, :].astype(jnp.float32)
    # P(<|nospeech|>) is read at the SOT position, as the reference does —
    # the output distribution after consuming <|startoftranscript|>
    sot_probs = jax.nn.softmax(logits[:, sot_index, :].astype(jnp.float32))
    no_speech_prob = sot_probs[:, no_speech]

    tokens_buf = jnp.full((B, n_ctx), eot, jnp.int32)
    tokens_buf = jax.lax.dynamic_update_slice(tokens_buf, prompt, (0, 0))

    def apply_rules(logits, step, last_tok, penult_tok, last_ts):
        logits = jnp.where(suppress_mask[None, :], -jnp.inf, logits)
        # SuppressBlank at the first sampled token
        logits = jnp.where(
            (step == 0)
            & ((vocab_idx[None, :] == blank) | (vocab_idx[None, :] == eot)),
            -jnp.inf,
            logits,
        )
        if without_timestamps:
            return jnp.where(is_ts[None, :], -jnp.inf, logits)

        logits = jnp.where(vocab_idx[None, :] == no_timestamps, -jnp.inf, logits)
        last_was_ts = last_tok >= timestamp_begin
        penult_was_ts = penult_tok >= timestamp_begin
        # timestamps come in pairs
        logits = jnp.where(
            (last_was_ts & penult_was_ts)[:, None] & is_ts[None, :], -jnp.inf, logits
        )
        logits = jnp.where(
            (last_was_ts & ~penult_was_ts)[:, None] & (vocab_idx < eot)[None, :],
            -jnp.inf,
            logits,
        )
        # monotonic timestamps
        ts_floor = jnp.where(last_was_ts & ~penult_was_ts, last_ts, last_ts + 1)
        logits = jnp.where(
            is_ts[None, :] & (vocab_idx[None, :] < ts_floor[:, None]), -jnp.inf, logits
        )
        # first sampled token must be a timestamp, capped at max_initial
        init_bad = (~is_ts) | (vocab_idx > timestamp_begin + max_initial_ts_index)
        logits = jnp.where((step == 0) & init_bad[None, :], -jnp.inf, logits)
        # if P(timestamp) > max P(text token), force a timestamp
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        ts_logprob = jax.nn.logsumexp(
            jnp.where(is_ts[None, :], logprobs, -jnp.inf), axis=-1
        )
        max_text = jnp.max(jnp.where(is_ts[None, :], -jnp.inf, logprobs), axis=-1)
        force_ts = ts_logprob > max_text
        logits = jnp.where(force_ts[:, None] & ~is_ts[None, :], -jnp.inf, logits)
        return logits

    def body(state):
        step, tokens_buf, caches, logits, sum_lp, done, last_ts, key = state
        pos = Tp + step
        last_tok = tokens_buf[:, pos - 1]
        penult_tok = tokens_buf[:, pos - 2]
        filtered = apply_rules(logits, step, last_tok, penult_tok, last_ts)
        if temperature == 0.0:
            next_tok = jnp.argmax(filtered, axis=-1).astype(jnp.int32)
        else:
            key, sub = jax.random.split(key)
            next_tok = jax.random.categorical(
                sub, filtered / temperature, axis=-1
            ).astype(jnp.int32)
        logprobs = jax.nn.log_softmax(filtered, axis=-1)
        tok_lp = jnp.take_along_axis(logprobs, next_tok[:, None], axis=-1)[:, 0]
        sum_lp = sum_lp + jnp.where(done, 0.0, tok_lp)
        next_tok = jnp.where(done, eot, next_tok)
        done = done | (next_tok == eot)
        last_ts = jnp.where(
            ~done & (next_tok >= timestamp_begin), next_tok, last_ts
        )
        tokens_buf = jax.lax.dynamic_update_slice(
            tokens_buf, next_tok[:, None], (0, pos)
        )
        new_logits, caches = decoder_step(
            model, next_tok[:, None], pos, caches, cross_kv
        )
        return (
            step + 1, tokens_buf, caches, new_logits[:, -1, :].astype(jnp.float32),
            sum_lp, done, last_ts, key,
        )

    def cond(state):
        step, _, _, _, _, done, _, _ = state
        return (step < sample_len) & ~jnp.all(done)

    state = (
        0, tokens_buf, caches, last_logits, jnp.zeros((B,), jnp.float32),
        jnp.zeros((B,), bool), jnp.full((B,), timestamp_begin, jnp.int32), key,
    )
    step, tokens_buf, caches, _, sum_lp, done, _, _ = jax.lax.while_loop(
        cond, body, state
    )
    return tokens_buf, step, sum_lp, no_speech_prob


def decode_window_batch(
    model,
    cross_kv,
    tokenizer,
    prompt_rows: Sequence[Sequence[int]],
    options: DecodingOptions,
    n_ctx: int,
    n_vocab: int,
    decoder_step,
    make_caches,
    sample_len: int = 224,
    seed: int = 0,
) -> List[DecodingResult]:
    """Decode B 30 s windows in ONE device program (`_decode_loop` is
    batch-polymorphic; rows are independent, so the serving scheduler can
    fuse concurrent requests' windows). All rows must share the prompt
    length and decoding options; cross_kv carries the batched encoder
    output. Fetches tokens once.

    With ``options.best_of=N`` (requires temperature > 0), each window is
    decoded as N independent sample rows IN THE SAME device program and the
    winner is picked by likelihood ranking with the reference's length
    penalty (decoding.py:462-478) — N× the work but still one dispatch."""
    verify_options(options)
    rows = [list(p) for p in prompt_rows]
    assert len({len(r) for r in rows}) == 1, "prompt rows must share a length"
    prompt = jnp.asarray(rows, jnp.int32)

    n_group = 1
    if options.best_of is not None and options.temperature > 0:
        n_group = int(options.best_of)
    if n_group > 1:
        prompt = jnp.repeat(prompt, n_group, axis=0)
        cross_kv = jax.tree.map(
            lambda x: jnp.repeat(x, n_group, axis=0), cross_kv
        )

    suppress = np.zeros((n_vocab,), bool)
    ids: List[int] = []
    if options.suppress_tokens:
        st = options.suppress_tokens
        if isinstance(st, str):
            ids = [int(t) for t in st.split(",") if t.strip() and t != "-1"]
            if "-1" in st:
                ids.extend(tokenizer.non_speech_tokens)
        else:
            ids = list(st)
    # control tokens are ALWAYS suppressed (reference behavior), even when
    # the caller passes suppress_tokens=None/""
    ids.extend(
        [tokenizer.transcribe, tokenizer.translate, tokenizer.sot,
         tokenizer.sot_prev, getattr(tokenizer, "sot_lm", tokenizer.sot_prev)]
    )
    for i in ids:
        if 0 <= i < n_vocab:
            suppress[i] = True
    suppress[tokenizer.no_speech] = True

    blank_ids = tokenizer.encode(" ")
    blank = blank_ids[0] if blank_ids else tokenizer.eot
    precision = 0.02
    if options.max_initial_timestamp is None:
        max_init = n_vocab  # uncapped (reference: index left unset)
    else:
        max_init = round(options.max_initial_timestamp / precision)

    Tp = prompt.shape[1]
    if options.sample_len:  # reference: sample_len option caps the decode
        sample_len = int(options.sample_len)
    # never write past tokens_buf/KV capacity (the reference stops at n_ctx)
    sample_len = max(1, min(sample_len, n_ctx - Tp - 1))

    # make_caches may be batch-aware (preferred) or a legacy 0-arg thunk
    try:
        caches = make_caches(len(rows) * n_group)
    except TypeError:
        caches = make_caches()
    tokens_buf, n_steps, sum_lp, no_speech_prob = _decode_loop(
        model, caches, cross_kv, prompt, jnp.asarray(suppress),
        jax.random.PRNGKey(seed), decoder_step,
        sample_len=sample_len, n_ctx=n_ctx, eot=tokenizer.eot,
        timestamp_begin=tokenizer.timestamp_begin,
        no_timestamps=tokenizer.no_timestamps, blank=blank,
        no_speech=tokenizer.no_speech,
        without_timestamps=options.without_timestamps,
        max_initial_ts_index=max_init, temperature=float(options.temperature),
        # index of <|startoftranscript|> in the prompt: the sot sequence
        # sits at the END (possibly followed by <|notimestamps|>)
        sot_index=max(
            0,
            Tp
            - len(list(tokenizer.sot_sequence))
            - (1 if options.without_timestamps else 0),
        ),
    )
    toks, n_steps, sum_lp, nsp = jax.device_get(
        (tokens_buf, n_steps, sum_lp, no_speech_prob)
    )
    Tp = prompt.shape[1]

    def row_result(b: int) -> DecodingResult:
        seq = []
        for t in toks[b, Tp : Tp + int(n_steps)]:
            if t == tokenizer.eot:
                break
            seq.append(int(t))
        text = tokenizer.decode(seq).strip()
        n_tok = len(seq) + 1
        return DecodingResult(
            tokens=seq,
            text=text,
            avg_logprob=float(sum_lp[b]) / max(n_tok, 1),
            no_speech_prob=float(nsp[b]),
            temperature=options.temperature,
            compression_ratio=compression_ratio(text),
            language=options.language,
        )

    results = []
    for g in range(len(rows)):
        idxs = range(g * n_group, (g + 1) * n_group)
        group = [(row_result(b), float(sum_lp[b])) for b in idxs]
        best, _ = max(
            group,
            key=lambda rl: rank_score(
                rl[1], len(rl[0].tokens), options.length_penalty
            ),
        )
        results.append(best)
    return results


def decode_window(
    model,
    cross_kv,
    tokenizer,
    prompt_tokens: Sequence[int],
    options: DecodingOptions,
    n_ctx: int,
    n_vocab: int,
    decoder_step,
    make_caches,
    sample_len: int = 224,
    seed: int = 0,
) -> DecodingResult:
    """Run one 30 s-window decode on device; fetch tokens once."""
    return decode_window_batch(
        model, cross_kv, tokenizer, [list(prompt_tokens)], options,
        n_ctx, n_vocab, decoder_step, make_caches,
        sample_len=sample_len, seed=seed,
    )[0]

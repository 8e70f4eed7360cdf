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
    inconsistent combinations raise instead of being silently ignored.

    Unlike the reference — whose beam-search decoder raises
    NotImplementedError (decoding.py:482) — beam search IS implemented here
    (`_beam_decode_loop`), so `beam_size`/`patience` are accepted."""
    if options.beam_size is not None and options.best_of is not None:
        raise ValueError("beam_size and best_of can't be given together")
    if options.best_of is not None and options.temperature == 0:
        raise ValueError("best_of with greedy sampling (t=0) is not compatible")
    if options.patience is not None and options.beam_size is None:
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


def _apply_rules(
    logits,  # (B, V) f32
    step,
    last_tok,  # (B,)
    penult_tok,  # (B,)
    last_ts,  # (B,)
    *,
    suppress_mask,  # (V,) bool
    eot: int,
    timestamp_begin: int,
    no_timestamps: int,
    blank: int,
    without_timestamps: bool,
    max_initial_ts_index: int,
):
    """The reference's logit-filter lattice (SuppressTokens/SuppressBlank/
    ApplyTimestampRules, decoding.py:330-445) as one row-wise function shared
    by the greedy and beam decode loops."""
    V = suppress_mask.shape[0]
    vocab_idx = jnp.arange(V)
    is_ts = vocab_idx >= timestamp_begin

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
        return _apply_rules(
            logits, step, last_tok, penult_tok, last_ts,
            suppress_mask=suppress_mask, eot=eot,
            timestamp_begin=timestamp_begin, no_timestamps=no_timestamps,
            blank=blank, without_timestamps=without_timestamps,
            max_initial_ts_index=max_initial_ts_index,
        )

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


@partial(
    jax.jit,
    static_argnames=(
        "decoder_step", "sample_len", "n_ctx", "eot", "timestamp_begin",
        "no_timestamps", "blank", "no_speech", "without_timestamps",
        "max_initial_ts_index", "beam_size", "max_candidates", "sot_index",
    ),
    donate_argnames=("caches",),
)
def _beam_decode_loop(
    model,
    caches,
    cross_kv,
    prompt,  # (G*K, Tp) int32 — each window's prompt repeated K times
    suppress_mask,  # (V,) bool
    decoder_step,
    sample_len: int,
    n_ctx: int,
    eot: int,
    timestamp_begin: int,
    no_timestamps: int,
    blank: int,
    no_speech: int,
    without_timestamps: bool,
    max_initial_ts_index: int,
    beam_size: int,
    max_candidates: int,  # round(beam_size * patience) finished hyps per group
    sot_index: int = 0,
):
    """Beam search as ONE on-device `lax.while_loop` — the feature the
    reference stubs out (its BeamSearchDecoder raises NotImplementedError,
    decoding.py:482; semantics here follow openai-whisper's decoder, which
    the reference mirrors elsewhere).

    Layout: beams are extra batch rows — G windows × K beams, grouped in
    contiguous blocks of K. Each step scores all K×V continuations per
    group, takes the top 2K (EOT appears at most once per source beam, so
    ≥K non-EOT survive), banks EOT-ending hypotheses into fixed-capacity
    finished buffers, keeps the best K non-EOT as the next beams, and
    reorders tokens + KV caches with a batch-axis gather. A group is
    complete when `max_candidates` hypotheses have finished."""
    GK, Tp = prompt.shape
    K = beam_size
    G = GK // K
    C = max_candidates
    V = suppress_mask.shape[0]

    # ---- prefill (all K rows of a group are identical; only beam 0 is
    # live at step 0 so the first expansion dedups) ----
    logits, caches = decoder_step(model, prompt, 0, caches, cross_kv)
    last_logits = logits[:, -1, :].astype(jnp.float32)
    sot_probs = jax.nn.softmax(logits[:, sot_index, :].astype(jnp.float32))
    no_speech_prob = sot_probs[::K, no_speech]  # (G,)

    tokens_buf = jnp.full((GK, n_ctx), eot, jnp.int32)
    tokens_buf = jax.lax.dynamic_update_slice(tokens_buf, prompt, (0, 0))

    cum_lp = jnp.tile(
        jnp.where(jnp.arange(K) == 0, 0.0, -jnp.inf).astype(jnp.float32), G
    )  # (GK,)
    last_ts = jnp.full((GK,), timestamp_begin, jnp.int32)

    fin_lp = jnp.full((G, C), -jnp.inf, jnp.float32)
    fin_len = jnp.zeros((G, C), jnp.int32)
    fin_toks = jnp.full((G, C, n_ctx), eot, jnp.int32)
    fin_count = jnp.zeros((G,), jnp.int32)

    group_off = jnp.arange(G, dtype=jnp.int32) * K  # (G,)
    rows = jnp.arange(G)[:, None]

    def body(state):
        (step, tokens_buf, caches, logits, cum_lp, last_ts,
         fin_lp, fin_len, fin_toks, fin_count) = state
        pos = Tp + step
        last_tok = tokens_buf[:, pos - 1]
        penult_tok = tokens_buf[:, pos - 2]
        filtered = _apply_rules(
            logits, step, last_tok, penult_tok, last_ts,
            suppress_mask=suppress_mask, eot=eot,
            timestamp_begin=timestamp_begin, no_timestamps=no_timestamps,
            blank=blank, without_timestamps=without_timestamps,
            max_initial_ts_index=max_initial_ts_index,
        )
        logprobs = jax.nn.log_softmax(filtered, axis=-1)  # (GK, V)
        cand = (cum_lp[:, None] + logprobs).reshape(G, K * V)
        top_vals, top_idx = jax.lax.top_k(cand, 2 * K)  # (G, 2K)
        tok = (top_idx % V).astype(jnp.int32)
        src = (top_idx // V).astype(jnp.int32)  # source beam within group
        is_eot_c = tok == eot

        # ---- bank EOT-ending candidates into finished buffers (in score
        # order; slots past capacity C fall into a dump column) ----
        eot_rank = jnp.cumsum(is_eot_c, axis=1) - 1  # (G, 2K)
        slot = fin_count[:, None] + eot_rank
        write = is_eot_c & (slot < C) & jnp.isfinite(top_vals)
        slot_c = jnp.where(write, slot, C)
        src_flat = group_off[:, None] + src  # (G, 2K) row index into GK
        cand_toks = tokens_buf[src_flat]  # (G, 2K, n_ctx); pos.. already eot
        pad = jnp.zeros((G, 1), fin_lp.dtype)
        fin_lp = jnp.concatenate([fin_lp, pad], 1).at[rows, slot_c].set(
            jnp.where(write, top_vals, 0.0)
        )[:, :C]
        fin_len = jnp.concatenate(
            [fin_len, jnp.zeros((G, 1), jnp.int32)], 1
        ).at[rows, slot_c].set(jnp.where(write, step, 0))[:, :C]
        fin_toks = jnp.concatenate(
            [fin_toks, jnp.full((G, 1, n_ctx), eot, jnp.int32)], 1
        ).at[rows, slot_c].set(
            jnp.where(write[:, :, None], cand_toks, eot)
        )[:, :C]
        fin_count = fin_count + jnp.sum(write, axis=1, dtype=jnp.int32)

        # ---- keep the first K non-EOT candidates as the next beams ----
        noneot_rank = jnp.cumsum(~is_eot_c, axis=1) - 1  # (G, 2K)
        sel = (~is_eot_c) & (noneot_rank < K)
        slot_b = jnp.where(sel, noneot_rank, K)
        col = jnp.broadcast_to(jnp.arange(2 * K, dtype=jnp.int32), (G, 2 * K))
        choice = (
            jnp.zeros((G, K + 1), jnp.int32).at[rows, slot_b].set(col)[:, :K]
        )  # (G, K) → index into the 2K candidates
        new_tok = jnp.take_along_axis(tok, choice, 1)  # (G, K)
        new_src = jnp.take_along_axis(src, choice, 1)
        new_lp = jnp.take_along_axis(top_vals, choice, 1)

        # ---- reorder beam state by source beam (batch-axis gather) ----
        flat_src = (group_off[:, None] + new_src).reshape(-1)  # (GK,)
        next_tok = new_tok.reshape(-1)
        tokens_buf = jax.lax.dynamic_update_slice(
            tokens_buf[flat_src], next_tok[:, None], (0, pos)
        )
        cum_lp = new_lp.reshape(-1)
        last_ts = jnp.where(
            next_tok >= timestamp_begin, next_tok, last_ts[flat_src]
        )
        caches = jax.tree.map(
            lambda x: x[flat_src]
            if getattr(x, "ndim", 0) >= 1 and x.shape[0] == GK
            else x,
            caches,
        )
        new_logits, caches = decoder_step(
            model, next_tok[:, None], pos, caches, cross_kv
        )
        return (
            step + 1, tokens_buf, caches,
            new_logits[:, -1, :].astype(jnp.float32), cum_lp, last_ts,
            fin_lp, fin_len, fin_toks, fin_count,
        )

    def cond(state):
        step = state[0]
        fin_count = state[9]
        return (step < sample_len) & ~jnp.all(fin_count >= C)

    state = (
        0, tokens_buf, caches, last_logits, cum_lp, last_ts,
        fin_lp, fin_len, fin_toks, fin_count,
    )
    (step, tokens_buf, _, _, cum_lp, _,
     fin_lp, fin_len, fin_toks, fin_count) = jax.lax.while_loop(
        cond, body, state
    )
    return (
        tokens_buf, step, cum_lp, fin_lp, fin_len, fin_toks, fin_count,
        no_speech_prob,
    )


def _run_beam(
    model, caches, cross_kv, prompt, suppress, tokenizer, options,
    decoder_step, *, sample_len, n_ctx, blank, max_init, sot_index,
) -> List[DecodingResult]:
    """Host wrapper for `_beam_decode_loop`: one device dispatch, one fetch,
    then openai-whisper finalize semantics — groups short of `beam_size`
    finished hypotheses are topped up with the in-flight beams (EOT appended,
    no extra logprob), and the winner is picked by `rank_score`."""
    K = int(options.beam_size)
    patience = options.patience if options.patience is not None else 1.0
    max_candidates = max(1, round(K * float(patience)))
    GK, Tp = prompt.shape

    (tokens_buf, n_steps, cum_lp, fin_lp, fin_len, fin_toks, fin_count,
     no_speech_prob) = _beam_decode_loop(
        model, caches, cross_kv, prompt, jnp.asarray(suppress),
        decoder_step, sample_len=sample_len, n_ctx=n_ctx,
        eot=tokenizer.eot, timestamp_begin=tokenizer.timestamp_begin,
        no_timestamps=tokenizer.no_timestamps, blank=blank,
        no_speech=tokenizer.no_speech,
        without_timestamps=options.without_timestamps,
        max_initial_ts_index=max_init, beam_size=K,
        max_candidates=max_candidates, sot_index=sot_index,
    )
    (toks, n_steps, cum_lp, fin_lp, fin_len, fin_toks, fin_count,
     nsp) = jax.device_get(
        (tokens_buf, n_steps, cum_lp, fin_lp, fin_len, fin_toks, fin_count,
         no_speech_prob)
    )
    n_steps = int(n_steps)

    results = []
    for g in range(GK // K):
        # (tokens, sum_logprob, length) candidates: finished first
        cands = []
        for c in range(int(fin_count[g])):
            ln = int(fin_len[g, c])
            seq = [int(t) for t in fin_toks[g, c, Tp : Tp + ln]]
            cands.append((seq, float(fin_lp[g, c])))
        if len(cands) < K:
            live = sorted(
                range(g * K, (g + 1) * K),
                key=lambda b: -float(cum_lp[b]),
            )
            for b in live:
                if len(cands) >= K:
                    break
                if not np.isfinite(cum_lp[b]):
                    continue
                seq = []
                for t in toks[b, Tp : Tp + n_steps]:
                    if t == tokenizer.eot:
                        break
                    seq.append(int(t))
                cands.append((seq, float(cum_lp[b])))
        if not cands:  # degenerate (e.g. sample_len=0): empty result
            cands = [([], 0.0)]
        seq, lp = max(
            cands,
            key=lambda sl: rank_score(sl[1], len(sl[0]), options.length_penalty),
        )
        text = tokenizer.decode(seq).strip()
        results.append(
            DecodingResult(
                tokens=seq,
                text=text,
                avg_logprob=lp / (len(seq) + 1),
                no_speech_prob=float(nsp[g]),
                temperature=0.0,
                compression_ratio=compression_ratio(text),
                language=options.language,
            )
        )
    return results


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
    penalty (decoding.py:462-478) — N× the work but still one dispatch.

    With ``options.beam_size=K`` (temperature 0), each window is decoded by
    on-device beam search (`_beam_decode_loop`) — a feature the reference
    stubs out — and the winner is picked by the same likelihood ranking
    over the finished hypotheses."""
    verify_options(options)
    rows = [list(p) for p in prompt_rows]
    assert len({len(r) for r in rows}) == 1, "prompt rows must share a length"
    prompt = jnp.asarray(rows, jnp.int32)

    use_beam = options.beam_size is not None and options.temperature == 0
    n_group = 1
    if use_beam:
        n_group = int(options.beam_size)
    elif options.best_of is not None and options.temperature > 0:
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

    # KV capacity: what this decode can write (prompt + samples + 1),
    # bucketed by 64 so compile count stays bounded across prompt lengths.
    # Per-step self-attention K/V reads scale with capacity, so trimming
    # from n_ctx=448 to the ~128 a len-96 decode needs cuts decode HBM
    # traffic materially (see KERNEL_BENCH.md roofline notes).
    cap = min(n_ctx, -(-(Tp + sample_len + 1) // 64) * 64)
    # make_caches may be capacity-aware (preferred), batch-only, or a
    # legacy 0-arg thunk
    try:
        caches = make_caches(len(rows) * n_group, cap)
    except TypeError:
        try:
            caches = make_caches(len(rows) * n_group)
        except TypeError:
            caches = make_caches()

    if use_beam:
        return _run_beam(
            model, caches, cross_kv, prompt, suppress, tokenizer, options,
            decoder_step, sample_len=sample_len, n_ctx=n_ctx, blank=blank,
            max_init=max_init,
            sot_index=max(
                0,
                Tp
                - len(list(tokenizer.sot_sequence))
                - (1 if options.without_timestamps else 0),
            ),
        )

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

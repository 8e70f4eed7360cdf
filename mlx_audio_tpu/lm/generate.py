"""Autoregressive generation compiled to on-device loops.

Design (differs fundamentally from the reference's mlx-lm python-loop
decode): device→host sync costs ~30-60 ms on a tunneled TPU, so the decode
loop is a `lax.while_loop` living entirely on device — KV caches in the
carry, sampling + repetition penalty + EOS detection in-graph. One dispatch
and ONE host fetch per generation. Streaming uses the same loop in chunks
of `chunk_size` tokens per dispatch, amortizing the fetch.

Replaces mlx-lm `stream_generate` (reference: outetts.py:17, spark.py:11).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from typing import Callable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .sample import apply_repetition_penalty, make_sampler

__all__ = ["stream_generate", "generate_tokens", "GenerationResponse"]


@dataclass
class GenerationResponse:
    token: int
    text: str = ""
    prompt_tokens: int = 0
    generation_tokens: int = 0
    prompt_tps: float = 0.0
    generation_tps: float = 0.0
    finish_reason: Optional[str] = None


def _default_model_call(model, ids, caches):
    return model(ids, caches)


@partial(jax.jit, static_argnames=("model_call",), donate_argnames=("caches",))
def _prefill(model, caches, ids, model_call):
    logits, caches = model_call(model, ids, caches)
    return logits[:, -1, :].astype(jnp.float32), caches


@partial(
    jax.jit,
    static_argnames=("model_call", "sampler", "rep_penalty", "num_steps"),
    donate_argnames=("caches", "history"),
)
def _decode_chunk(
    model,
    caches,
    logits,  # (B, V) logits for the *next* token to sample
    history,  # (B, W)
    done,  # (B,) bool
    key,
    eos_ids,  # (E,) int32 (pad with -1)
    model_call,
    sampler,
    rep_penalty: float,
    num_steps: int,
):
    """Sample+decode `num_steps` tokens fully on device.

    Returns the sampled tokens (B, num_steps) — positions after EOS hold the
    EOS value repeated — plus updated state.
    """
    B = logits.shape[0]
    out = jnp.zeros((B, num_steps), jnp.int32)

    def body(state):
        i, logits, caches, history, done, key, out = state
        lg = logits
        if rep_penalty != 1.0:
            lg = apply_repetition_penalty(lg, history, rep_penalty)
        key, sub = jax.random.split(key)
        token = sampler(lg, sub)
        history = jnp.concatenate([history[:, 1:], token[:, None]], axis=1)
        done = done | jnp.isin(token, eos_ids)
        out = jax.lax.dynamic_update_slice(out, token[:, None], (0, i))
        new_logits, caches = model_call(model, token[:, None], caches)
        logits = new_logits[:, -1, :].astype(jnp.float32)
        return i + 1, logits, caches, history, done, key, out

    def cond(state):
        i, _, _, _, done, _, _ = state
        return (i < num_steps) & ~jnp.all(done)

    state = (0, logits, caches, history, done, key, out)
    i, logits, caches, history, done, key, out = jax.lax.while_loop(cond, body, state)
    return out, i, logits, caches, history, done, key


def generate_tokens(
    model,
    prompt: jax.Array,
    max_tokens: int = 512,
    sampler: Optional[Callable] = None,
    temp: float = 0.0,
    top_p: float = 1.0,
    top_k: int = 0,
    repetition_penalty: float = 1.0,
    repetition_context_size: int = 64,
    eos_token_ids=(),
    max_kv_size: Optional[int] = None,
    seed: int = 0,
    model_call: Callable = _default_model_call,
) -> Tuple[np.ndarray, int]:
    """Non-streaming decode: one on-device loop, one host fetch.

    Returns (tokens (B, n), n_generated) where generated EOS is included.
    """
    toks = None
    n = 0
    for chunk, meta in _generate_chunks(
        model, prompt, max_tokens, sampler, temp, top_p, top_k,
        repetition_penalty, repetition_context_size, eos_token_ids,
        max_kv_size, seed, model_call, chunk_size=max_tokens,
    ):
        toks = chunk if toks is None else np.concatenate([toks, chunk], axis=1)
        n += chunk.shape[1]
    return toks, n


def _generate_chunks(
    model,
    prompt,
    max_tokens,
    sampler,
    temp,
    top_p,
    top_k,
    repetition_penalty,
    repetition_context_size,
    eos_token_ids,
    max_kv_size,
    seed,
    model_call,
    chunk_size,
):
    """Yield (np tokens (B, ≤chunk), meta dict) until EOS/max_tokens."""
    if prompt.ndim == 1:
        prompt = prompt[None]
    prompt = prompt.astype(jnp.int32)
    B, T = prompt.shape
    if sampler is None:
        sampler = make_sampler(temp=temp, top_p=top_p, top_k=top_k)

    eos_arr = jnp.asarray(
        list(eos_token_ids) if eos_token_ids else [-2], jnp.int32
    )
    kv_len = max_kv_size or (T + max_tokens + 1)
    caches = model.make_caches(batch=B, max_len=kv_len)

    key = jax.random.PRNGKey(seed)
    W = repetition_context_size
    if T >= W:
        history = prompt[:, -W:]
    else:
        history = jnp.concatenate(
            [jnp.full((B, W - T), -1, jnp.int32), prompt], axis=1
        )

    tic = time.perf_counter()
    logits, caches = _prefill(model, caches, prompt, model_call)
    done = jnp.zeros((B,), bool)
    prompt_time = time.perf_counter() - tic

    produced = 0
    gen_tic = time.perf_counter()
    while produced < max_tokens:
        steps = min(chunk_size, max_tokens - produced)
        out, i, logits, caches, history, done, key = _decode_chunk(
            model, caches, logits, history, done, key, eos_arr,
            model_call, sampler, repetition_penalty, steps,
        )
        out_np, n_valid, done_np = jax.device_get((out, i, done))
        n_valid = int(n_valid)
        chunk = out_np[:, :n_valid]
        # trim at first EOS for B==1
        finished = bool(done_np.all())
        if finished and B == 1 and len(eos_token_ids):
            hits = np.isin(chunk[0], list(eos_token_ids)).nonzero()[0]
            if len(hits):
                chunk = chunk[:, : hits[0] + 1]
        produced += chunk.shape[1]
        meta = {
            "prompt_tokens": T,
            "prompt_time": prompt_time,
            "generation_time": time.perf_counter() - gen_tic,
            "finished": finished,
        }
        yield chunk, meta
        if finished or n_valid < steps:
            return


def stream_generate(
    model,
    prompt: jax.Array,
    max_tokens: int = 512,
    sampler: Optional[Callable] = None,
    temp: float = 0.0,
    top_p: float = 1.0,
    top_k: int = 0,
    repetition_penalty: float = 1.0,
    repetition_context_size: int = 64,
    eos_token_ids: Optional[set] = None,
    max_kv_size: Optional[int] = None,
    seed: int = 0,
    model_call: Callable = _default_model_call,
    chunk_size: int = 32,
) -> Iterator[GenerationResponse]:
    """Yield tokens one at a time (decoded on device in `chunk_size` blocks)."""
    eos = tuple(sorted(eos_token_ids)) if eos_token_ids else ()
    n = 0
    for chunk, meta in _generate_chunks(
        model, prompt, max_tokens, sampler, temp, top_p, top_k,
        repetition_penalty, repetition_context_size, eos,
        max_kv_size, seed, model_call, chunk_size,
    ):
        toks = chunk[0] if chunk.shape[0] == 1 else chunk.T
        for j, tok in enumerate(toks):
            n += 1
            last = (meta["finished"] and j == len(toks) - 1)
            yield GenerationResponse(
                token=int(tok) if np.ndim(tok) == 0 else tok,
                prompt_tokens=meta["prompt_tokens"],
                generation_tokens=n,
                prompt_tps=meta["prompt_tokens"] / max(meta["prompt_time"], 1e-9),
                generation_tps=n / max(meta["generation_time"], 1e-9),
                finish_reason=(
                    "stop" if last else ("length" if n >= max_tokens and j == len(toks) - 1 else None)
                ),
            )

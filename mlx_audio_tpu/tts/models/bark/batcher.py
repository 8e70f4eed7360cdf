"""Stage-stacked batching for Bark's 3-stage pipeline.

NEW relative to the reference (one request at a time; reference
tts/models/bark/pipeline.py runs the three stages per request): Bark's
stage programs all have FIXED shapes — the semantic prefill is always
(257, D) (text and history each padded to 256), every coarse sliding
window is a 317-token prefill plus a 60-step decode, and fine infill
operates on 512-token chunks — so concurrent requests at the same stage
stack into ONE batched device program. Unlike the slot-pool batchers, no
per-row cache positions are needed: rows advance in lockstep from position
0, and per-row true lengths live entirely in the attention masks.

Per-row PRNG keys, temperatures and schedule counters make a request's
tokens independent of co-tenants: batched output equals running the
request alone in an equally-sized pool.
"""

from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ....serving import BatchScheduler
from .bark import (CODEBOOK_SIZE, COARSE_INFER_TOKEN,
                   COARSE_SEMANTIC_PAD_TOKEN, N_COARSE_CODEBOOKS,
                   N_FINE_CODEBOOKS, SEMANTIC_INFER_TOKEN,
                   SEMANTIC_PAD_TOKEN, SEMANTIC_VOCAB_SIZE, GPT, Model)

__all__ = ["BarkBatcher"]


@partial(jax.jit, static_argnames=("max_steps",), donate_argnames=("caches",))
def _semantic_loop_rows(gpt: GPT, caches, prefill_emb, keys, temps,
                        max_steps: int):
    """Batched `bark._semantic_loop`: (B, 257, D) prefills → (out (B, S),
    n (B,)). Rows that hit EOS freeze (their writes stop; the shared cache
    keeps advancing — garbage rows beyond a row's EOS are never read)."""
    B = prefill_emb.shape[0]
    positions = jnp.arange(prefill_emb.shape[1])
    logits, caches = gpt.forward_embeds(prefill_emb, caches, positions)
    out = jnp.zeros((B, max_steps), jnp.int32)
    n = jnp.zeros((B,), jnp.int32)
    Tp = prefill_emb.shape[1]
    temps = jnp.maximum(temps, 1e-6)

    def cond(s):
        return (s[0] < max_steps) & ~jnp.all(s[5])

    def body(s):
        i, caches, logits, out, n, done, keys = s
        rel = logits[:, -1, :SEMANTIC_VOCAB_SIZE]
        stop = logits[:, -1, SEMANTIC_PAD_TOKEN][:, None]
        lg = jnp.concatenate([rel, stop], axis=-1) / temps[:, None]
        split = jax.vmap(jax.random.split)(keys)
        sub, keys = split[:, 0], split[:, 1]
        tok = jax.vmap(jax.random.categorical)(sub, lg).astype(jnp.int32)
        done = done | (tok == SEMANTIC_VOCAB_SIZE)
        out = out.at[:, i].set(jnp.where(done, out[:, i], tok))
        n = jnp.where(done, n, n + 1)
        emb = gpt.input_embeds_layer.weight[
            jnp.clip(tok, 0, SEMANTIC_VOCAB_SIZE - 1)][:, None]
        logits, caches = gpt.forward_embeds(emb, caches,
                                            jnp.reshape(Tp + i, (1,)))
        return i + 1, caches, logits, out, n, done, keys

    state = (0, caches, logits, out, n, jnp.zeros((B,), bool), keys)
    _, caches, logits, out, n, done, keys = jax.lax.while_loop(
        cond, body, state)
    return out, n


@partial(jax.jit, static_argnames=("window_len",), donate_argnames=("caches",))
def _coarse_window_rows(gpt: GPT, caches, prefill_tokens, prefill_len, keys,
                        start_steps, n_steps, temps, window_len: int):
    """Batched `bark._coarse_window_loop`: per-row prefill lengths,
    codebook phases and step budgets; one fused decode for all rows."""
    B, Tp = prefill_tokens.shape
    S = caches[0].max_len
    emb = gpt.input_embeds_layer(prefill_tokens)
    q_idx = jnp.arange(Tp)[None, :, None]
    k_idx = jnp.arange(S)[None, None, :]
    mask = jnp.where(
        (k_idx <= q_idx) & (k_idx < prefill_len[:, None, None]),
        0.0, -jnp.inf)[:, None]
    x = emb + gpt.position_embeds_layer.weight[jnp.arange(Tp)]
    new_caches = []
    for i, blk in enumerate(gpt.layers):
        x, nc = blk(x, mask, caches[i])
        new_caches.append(nc)
    x = gpt.layernorm_final(x)
    last = jnp.clip(prefill_len - 1, 0, Tp - 1)
    h_last = jnp.take_along_axis(x, last[:, None, None], axis=1)
    logits = gpt.lm_head(h_last)  # (B, 1, V)
    caches = new_caches
    out = jnp.zeros((B, window_len), jnp.int32)
    temps = jnp.maximum(temps, 1e-6)
    idxs = jnp.arange(logits.shape[-1])[None, :]

    def cond(s):
        return s[0] < window_len

    def body(s):
        i, caches, logits, out, keys = s
        n_step = start_steps + i  # (B,)
        is_major = (n_step % N_COARSE_CODEBOOKS) == 0
        lo = SEMANTIC_VOCAB_SIZE + jnp.where(is_major, 0, CODEBOOK_SIZE)
        valid = ((idxs >= lo[:, None]) & (idxs < (lo + CODEBOOK_SIZE)[:, None])
                 & (n_step < n_steps)[:, None])
        lg = jnp.where(valid, logits[:, -1], -jnp.inf) / temps[:, None]
        split = jax.vmap(jax.random.split)(keys)
        sub, keys = split[:, 0], split[:, 1]
        tok = jax.vmap(jax.random.categorical)(sub, lg).astype(jnp.int32)
        out = out.at[:, i].set(tok)
        emb = gpt.input_embeds_layer.weight[tok][:, None]
        k = jnp.arange(S)[None, :]
        dmask = jnp.where(
            (k < prefill_len[:, None]) | ((k >= Tp) & (k <= Tp + i)),
            0.0, -jnp.inf)[:, None, None, :]
        q_pos = prefill_len + i  # (B,)
        xx = emb + gpt.position_embeds_layer.weight[q_pos][:, None]
        ncaches = []
        for j, blk in enumerate(gpt.layers):
            xx, nc = blk(xx, dmask, caches[j])
            ncaches.append(nc)
        logits = gpt.lm_head(gpt.layernorm_final(xx))
        return i + 1, ncaches, logits, out, keys

    state = (0, caches, logits, out, keys)
    _, caches, logits, out, keys = jax.lax.while_loop(cond, body, state)
    return out


@jax.jit
def _fine_chunk_rows(fine, idx, keys, temps):
    """Batched fine infill of codebooks 2..7 for a stack of 512-token
    chunks (reference pipeline.py:351, batched over requests)."""
    for cb in range(N_COARSE_CODEBOOKS, N_FINE_CODEBOOKS):
        logits = fine(cb, idx)[..., :CODEBOOK_SIZE]
        split = jax.vmap(jax.random.split)(keys)
        sub, keys = split[:, 0], split[:, 1]
        greedy = jnp.argmax(logits, axis=-1)
        sampled = jax.vmap(jax.random.categorical)(
            sub, logits / jnp.maximum(temps, 1e-6)[:, None, None])
        pred = jnp.where((temps <= 0)[:, None], greedy, sampled)
        idx = idx.at[:, :, cb].set(pred.astype(jnp.int32))
    return idx


def _pad_full(items: List, max_batch: int) -> List:
    """Pad every group to max_batch (repeat-last-row) rather than to a
    power-of-two bucket: one executable per stage serves every load
    factor, so a request's tokens are BITWISE identical whether it ran
    alone or fused (on TPU, different batch tilings perturb sampling
    logits at float precision — the SMOKE_r05 lesson). Decode is
    bandwidth-bound; the padded rows ride the same weight stream."""
    return list(items) + [items[-1]] * (max_batch - len(items))


class BarkBatcher:
    """Stage-level stacking for Bark: three `BatchScheduler`s (semantic /
    coarse-window / fine-chunk) fuse concurrent requests' same-stage,
    same-shape work into one dispatch each. The model's stage methods
    route through an installed instance (see bark.Model), so concurrent
    `generate` calls batch end-to-end while each request's host loop keeps
    its own schedule."""

    SEMANTIC_MAX_STEPS = 768
    WINDOW_LEN = 60

    def __init__(self, model: Model, max_batch: int = 4,
                 window_ms: float = 10.0):
        self.model = model
        self.max_batch = max_batch
        # only same-shape work stacks (e.g. coarse prefills from requests
        # with non-default max_coarse_history must not share a batch)
        shape_key = lambda item: tuple(  # noqa: E731
            getattr(a, "shape", None) for a in item)
        self.sem_sched = BatchScheduler(self._run_semantic, shape_key,
                                        max_batch=max_batch,
                                        window_ms=window_ms)
        self.coarse_sched = BatchScheduler(self._run_coarse, shape_key,
                                           max_batch=max_batch,
                                           window_ms=window_ms)
        self.fine_sched = BatchScheduler(self._run_fine, shape_key,
                                         max_batch=max_batch,
                                         window_ms=window_ms)

    # -- stage entry points (blocking; called from request threads) ----

    def semantic(self, ids: np.ndarray, hist: np.ndarray, temp: float,
                 seed: int) -> np.ndarray:
        return self.sem_sched((ids, hist, float(temp), int(seed)))

    def coarse_window(self, prefill: np.ndarray, ctx_len: int, n_step: int,
                      n_steps: int, key: np.ndarray,
                      temp: float) -> np.ndarray:
        return self.coarse_sched((prefill, int(ctx_len), int(n_step),
                                  int(n_steps), np.asarray(key),
                                  float(temp)))

    def fine_chunk(self, seg: np.ndarray, temp: float,
                   key: np.ndarray) -> np.ndarray:
        return self.fine_sched((seg, float(temp), np.asarray(key)))

    # -- batched runners ----------------------------------------------

    def _run_semantic(self, items):
        n = len(items)
        items = _pad_full(items, self.max_batch)
        B = len(items)
        gpt = self.model.semantic
        emb_layer = gpt.input_embeds_layer
        ids = jnp.asarray(np.stack([it[0] for it in items]))
        hist = jnp.asarray(np.stack([it[1] for it in items]))
        merged = emb_layer(ids) + emb_layer(hist)
        infer = emb_layer(jnp.full((B, 1), SEMANTIC_INFER_TOKEN, jnp.int32))
        prefill = jnp.concatenate([merged, infer], axis=1)  # (B, 257, D)
        temps = jnp.asarray([it[2] for it in items], jnp.float32)
        keys = jnp.asarray(np.stack([
            np.asarray(jax.random.PRNGKey(it[3]), np.uint32)
            for it in items]))
        caches = gpt.make_caches(B, 257 + self.SEMANTIC_MAX_STEPS + 1)
        out, cnt = _semantic_loop_rows(gpt, caches, prefill, keys, temps,
                                       self.SEMANTIC_MAX_STEPS)
        out, cnt = jax.device_get((out, cnt))
        return [np.asarray(out[i][: int(cnt[i])]) for i in range(n)]

    def _run_coarse(self, items):
        n = len(items)
        items = _pad_full(items, self.max_batch)
        B = len(items)
        gpt = self.model.coarse_acoustics
        prefill = jnp.asarray(np.stack([it[0] for it in items]))
        Tp = prefill.shape[1]
        caches = gpt.make_caches(B, Tp + self.WINDOW_LEN + 1)
        out = _coarse_window_rows(
            gpt, caches, prefill,
            jnp.asarray([it[1] for it in items], jnp.int32),
            jnp.asarray(np.stack([it[4] for it in items])),
            jnp.asarray([it[2] for it in items], jnp.int32),
            jnp.asarray([it[3] for it in items], jnp.int32),
            jnp.asarray([it[5] for it in items], jnp.float32),
            self.WINDOW_LEN)
        out = np.asarray(jax.device_get(out))
        return [out[i] for i in range(n)]

    def _run_fine(self, items):
        n = len(items)
        items = _pad_full(items, self.max_batch)
        idx = jnp.asarray(np.stack([it[0] for it in items]))  # (B, 512, 8)
        temps = jnp.asarray([it[1] for it in items], jnp.float32)
        keys = jnp.asarray(np.stack([it[2] for it in items]))
        out = _fine_chunk_rows(self.model.fine_acoustics, idx, keys, temps)
        out = np.asarray(jax.device_get(out))
        return [out[i] for i in range(n)]

    # -- pipeline integration -----------------------------------------

    @property
    def dispatch_count(self) -> int:
        return (self.sem_sched.dispatch_count
                + self.coarse_sched.dispatch_count
                + self.fine_sched.dispatch_count)

    def warmup(self):
        """Pre-compile the three stage programs at batch bucket 1 (larger
        buckets compile on first concurrent hit; semantic's 768-step loop
        dominates boot time, so only the smallest bucket is warmed)."""
        ids = np.full(256, SEMANTIC_PAD_TOKEN, np.int64)
        self.semantic(ids, ids.copy(), 0.7, 0)
        prefill = np.full(256 + 1 + 60, COARSE_SEMANTIC_PAD_TOKEN, np.int32)
        prefill[256] = COARSE_INFER_TOKEN
        self.coarse_window(prefill, 257, 0, 2,
                           np.asarray(jax.random.PRNGKey(0), np.uint32),
                           0.7)
        seg = np.full((512, N_FINE_CODEBOOKS), CODEBOOK_SIZE, np.int32)
        self.fine_chunk(seg, 0.5,
                        np.asarray(jax.random.PRNGKey(0), np.uint32))

    def install(self):
        from ....serving import register_infer_hook

        register_infer_hook(self.model, self)
        return self

    def close(self):
        from ....serving import unregister_infer_hook

        unregister_infer_hook(self.model)
        self.sem_sched.close()
        self.coarse_sched.close()
        self.fine_sched.close()

"""Continuous (slot-based) batching for autoregressive decode.

NEW relative to the reference (strictly one request at a time per process;
see reference server.py:74-94): a fixed pool of B cache slots decodes in
lock-step as ONE jitted program per tick; requests join a free slot at any
tick boundary (prefill into a B=1 cache, device-copied into the slot) and
leave when they hit EOS/max_tokens. In steady state a chip serves B
concurrent token streams for roughly the cost of one — decode is
memory-bandwidth-bound, so batching the tiny per-step matmuls is nearly
free on the MXU.

Design notes:
- `SlotKVCache` has a per-row `pos` vector; the step function overwrites it
  from host state each dispatch, so freed slots never corrupt live ones
  (their writes land on their own slot's scratch index).
- Prompt prefill lengths are bucketed (right-padding is safe: padded K/V
  land at indices the mask only ever exposes after a real token has
  overwritten them).
- Sampling is IN-GRAPH and per-slot: every tick carries per-row PRNG keys,
  temperature / top-k / top-p / repetition-penalty parameters and a
  fixed-width token-history window, so fused multi-step ticks (`_step_n`)
  serve sampled and greedy requests alike — a sampled request no longer
  collapses the pool to per-token dispatches. A request's token stream
  depends only on its own seed, never on co-tenants, so batched output is
  exactly equal to running the request alone (given bitwise-equal logits).
- The only per-token fallback left is `repetition_context_size` larger than
  the batcher's `rep_hist` window (host-side sampling over full history).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from dataclasses import dataclass, field
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.module import Module

__all__ = ["SlotKVCache", "ContinuousBatcher"]


PROMPT_BUCKETS = (16, 32, 64, 128, 256, 512, 1024)


def _bucket(n: int) -> int:
    for b in PROMPT_BUCKETS:
        if n <= b:
            return b
    # beyond the table: next power of two, so distinct long prompt lengths
    # don't each trigger a fresh prefill/install compile
    return 1 << (n - 1).bit_length()


class SlotKVCache(Module):
    """KV cache with one independent stream per batch row.

    `pos` is a (B,) vector; `update` (t==1 decode path) writes each row at
    its own position. Compatible with the attention layers' `cache.update`
    protocol; masks are supplied externally by the step function.
    """

    def __init__(self, slots: int, num_kv_heads: int, max_len: int,
                 head_dim: int, dtype=jnp.bfloat16):
        self.k = jnp.zeros((slots, num_kv_heads, max_len, head_dim), dtype)
        self.v = jnp.zeros((slots, num_kv_heads, max_len, head_dim), dtype)
        self.pos = jnp.zeros((slots,), jnp.int32)

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    def update(self, k: jax.Array, v: jax.Array):
        t = k.shape[2]
        if t == 1:  # decode fast path
            b = jnp.arange(self.k.shape[0])
            nk = self.k.at[b, :, self.pos].set(
                k[:, :, 0].astype(self.k.dtype))
            nv = self.v.at[b, :, self.pos].set(
                v[:, :, 0].astype(self.v.dtype))
            return nk, nv, self.replace(k=nk, v=nv, pos=self.pos + 1)
        # windowed append (t>1) at per-row offsets — token i of row b lands
        # at pos[b]+i (VibeVoice text windows). Scatter with advanced
        # indices puts the (B, t) index dims first, so values transpose to
        # (B, t, H, D).
        b = jnp.arange(self.k.shape[0])[:, None]
        idx = self.pos[:, None] + jnp.arange(t)[None, :]
        nk = self.k.at[b, :, idx].set(
            jnp.swapaxes(k, 1, 2).astype(self.k.dtype))
        nv = self.v.at[b, :, idx].set(
            jnp.swapaxes(v, 1, 2).astype(self.v.dtype))
        return nk, nv, self.replace(k=nk, v=nv, pos=self.pos + t)


# ---------------------------------------------------------------------------
# In-graph per-row sampling
# ---------------------------------------------------------------------------


def _sample_rows_core(logits, keys, hist, temps, top_ps, top_ks, rep_pens,
                      rep_windows, min_ps=None):
    """Per-row temperature / top-k / top-p / min-p / repetition-penalty
    sampling.

    All parameters are (B,) DYNAMIC arrays, so one compiled program serves
    every mix of greedy and sampled slots (top-k is handled with per-row
    ranks over one descending sort rather than `lax.top_k`'s static k).
    `hist` is a (B, W) right-aligned token window (-1 padded); only the
    last `rep_windows[b]` entries of row b are penalized. `keys` is (B, 2)
    uint32 — each row advances its own PRNG stream exactly once per call,
    so a slot's tokens are reproducible regardless of co-tenants.

    Returns (tokens (B,), new_keys (B, 2)).
    """
    B, V = logits.shape
    z = logits.astype(jnp.float32)
    # repetition penalty over each row's window
    W = hist.shape[1]
    age = (W - 1) - jnp.arange(W)[None, :]
    valid = (age < rep_windows[:, None]) & (hist >= 0) & (hist < V)
    hist_c = jnp.where(valid, hist, V)  # pads land on the V scratch column
    onehot = jnp.zeros((B, V + 1), jnp.bool_).at[
        jnp.arange(B)[:, None], hist_c
    ].set(True)[:, :V]
    pen = rep_pens[:, None].astype(jnp.float32)
    penalized = jnp.where(z > 0, z / pen, z * pen)
    z = jnp.where(onehot & (pen != 1.0), penalized, z)

    greedy_tok = jnp.argmax(z, axis=-1).astype(jnp.int32)

    # sampled path (selected per row where temps > 0)
    x = z / jnp.maximum(temps, 1e-6)[:, None]
    sorted_desc = jnp.sort(x, axis=-1)[:, ::-1]
    # top-k: masking with -inf preserves the order of survivors, so the
    # post-top-k sort is just the first k_eff columns of sorted_desc
    k_eff = jnp.clip(jnp.where(top_ks > 0, top_ks, V), 1, V)
    kth = jnp.take_along_axis(sorted_desc, (k_eff - 1)[:, None], axis=-1)
    x = jnp.where((top_ks[:, None] > 0) & (x < kth), -jnp.inf, x)
    col = jnp.arange(V)[None, :]
    sorted_k = jnp.where(col < k_eff[:, None], sorted_desc, -jnp.inf)
    # top-p nucleus over the top-k survivors (lm.sample filter order)
    probs = jax.nn.softmax(sorted_k, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep_sorted = cum - probs < top_ps[:, None]  # always keeps top-1
    threshold = jnp.min(
        jnp.where(keep_sorted, sorted_k, jnp.inf), axis=-1, keepdims=True
    )
    x = jnp.where((top_ps[:, None] < 1.0) & (x < threshold), -jnp.inf, x)
    if min_ps is not None:
        # min-p over the top-k/top-p survivors (lm.sample filter order):
        # probs >= min_p * max_prob  ⟺  x >= max_x + log(min_p)
        cutoff = (jnp.max(x, axis=-1, keepdims=True)
                  + jnp.log(jnp.maximum(min_ps, 1e-9))[:, None])
        x = jnp.where((min_ps[:, None] > 0.0) & (x < cutoff), -jnp.inf, x)

    split = jax.vmap(jax.random.split)(keys)  # (B, 2, 2)
    sub, new_keys = split[:, 0], split[:, 1]
    sampled = jax.vmap(jax.random.categorical)(sub, x).astype(jnp.int32)
    tok = jnp.where(temps == 0.0, greedy_tok, sampled)
    return tok, new_keys


_sample_rows = jax.jit(_sample_rows_core)


@partial(jax.jit, donate_argnames=("caches",))
def _step(model, caches: List[SlotKVCache], tokens, pos):
    """One lock-step decode step for all slots.

    tokens (B,) int32 — last sampled token per slot; pos (B,) — its
    position. Returns (logits (B, V) f32, updated caches).
    """
    caches = [c.replace(pos=pos) for c in caches]
    S = caches[0].max_len
    k_idx = jnp.arange(S)[None, :]
    ok = k_idx <= pos[:, None]  # current token lands at pos
    mask = jnp.where(ok, 0.0, -jnp.inf).astype(jnp.float32)[:, None, None, :]
    logits, caches = model(
        tokens[:, None], caches=caches, positions=pos[:, None], mask=mask
    )
    return logits[:, -1, :].astype(jnp.float32), caches


@partial(jax.jit, donate_argnames=("caches",), static_argnames=("n",))
def _step_n(model, caches: List[SlotKVCache], tokens, pos, keys, hist,
            temps, top_ps, top_ks, rep_pens, rep_windows, min_ps, n: int):
    """`n` lock-step decode steps fused into ONE dispatch, sampling in-graph.

    Per-token host round trips are the continuous batcher's overhead
    floor — on high-dispatch-latency links (remote/tunnel backends,
    ~40-100 ms RTT) they dominate the wall clock outright. Fusing n steps
    amortizes the round trip n-fold at the cost of up to n-1 wasted steps
    past a mid-chunk EOS (host truncates) and join latency of one chunk.
    Sampling state (PRNG keys, history window) rides in the scan carry, so
    greedy AND sampled slots fuse alike — every sampler parameter is a
    dynamic (B,) array, so one executable serves any request mix.

    Returns (tokens_out (B, n) int32, new_keys (B, 2), updated caches).
    """

    def body(carry, _):
        caches, tokens, pos, keys, hist = carry
        caches = [c.replace(pos=pos) for c in caches]
        S = caches[0].max_len
        k_idx = jnp.arange(S)[None, :]
        ok = k_idx <= pos[:, None]
        mask = jnp.where(ok, 0.0, -jnp.inf).astype(
            jnp.float32)[:, None, None, :]
        logits, caches = model(
            tokens[:, None], caches=caches, positions=pos[:, None], mask=mask
        )
        nxt, keys = _sample_rows_core(
            logits[:, -1, :].astype(jnp.float32), keys, hist,
            temps, top_ps, top_ks, rep_pens, rep_windows, min_ps,
        )
        hist = jnp.concatenate([hist[:, 1:], nxt[:, None]], axis=1)
        return (caches, nxt, pos + 1, keys, hist), nxt

    (caches, _, _, keys, _), toks = jax.lax.scan(
        body, (caches, tokens, pos, keys, hist), None, length=n)
    return jnp.swapaxes(toks, 0, 1), keys, caches  # (B, n)


@jax.jit
def _prefill_b1(model, caches, ids, length):
    """Prefill a B=1 bucketed prompt; returns (last-real-token logits (V,),
    caches). Right padding is masked causally; padded K/V are harmless (see
    module docstring)."""
    logits, caches = model(ids, caches)
    return logits[0, length - 1, :].astype(jnp.float32), caches


@jax.jit
def _prefill_b1_embeds(model, caches, x, length):
    """Prefill a B=1 bucketed EMBEDDING prompt (x (1, P, D) float) — the
    path for audio-conditioned LLMs (Qwen3-ASR / Voxtral / GLM-ASR style)
    whose prompt is encoder output spliced into token embeddings, not ids.
    Bypasses the embedding table exactly like stt _lm_call does."""
    h, caches = model.model(x, caches)
    logits = (model.lm_head(h) if hasattr(model, "lm_head")
              else model.model.embed_tokens.as_linear(h))
    return logits[0, length - 1, :].astype(jnp.float32), caches


@partial(jax.jit, donate_argnames=("slot_caches",), static_argnames=("slot",))
def _install_slot(slot_caches: List[SlotKVCache], single_caches, slot: int,
                  true_len):
    """Copy a B=1 prefilled cache into `slot` and set its pos."""
    out = []
    for sc, c1 in zip(slot_caches, single_caches):
        P = c1.k.shape[2]  # prompt bucket ≤ slot max_len
        nk = sc.k.at[slot, :, :P].set(c1.k[0].astype(sc.k.dtype))
        nv = sc.v.at[slot, :, :P].set(c1.v[0].astype(sc.v.dtype))
        npos = sc.pos.at[slot].set(true_len)
        out.append(sc.replace(k=nk, v=nv, pos=npos))
    return out


@dataclass
class _Request:
    prompt: np.ndarray  # token ids; empty when prompt_embeds is set
    max_tokens: int
    eos_ids: frozenset
    temp: float
    top_p: float = 1.0
    top_k: int = 0
    min_p: float = 0.0
    rep_penalty: float = 1.0
    rep_window: int = 64
    seed: int = 0
    host_sampling: bool = False  # rep_window exceeds the device hist width
    future: Future = field(default_factory=Future)
    on_token: Optional[callable] = None
    tokens: list = field(default_factory=list)
    prompt_tail: tuple = ()  # last rep_window prompt tokens
    prompt_embeds: Optional[np.ndarray] = None  # (T, D) embedding prompt


class ContinuousBatcher:
    """Slot-based continuous batching scheduler over a `CausalLM`-style
    model (anything with `make_caches` semantics and the
    `model(ids, caches, positions, mask)` calling convention)."""

    def __init__(self, model, slots: int = 4, max_len: int = 2048,
                 cache_dtype=jnp.bfloat16, seed: int = 0,
                 tick_tokens: int = 1, rep_hist: int = 64):
        cfg = model.config
        self.model = model
        self.slots = slots
        self.max_len = max_len
        # tick_tokens > 1: fuse that many decode steps per device dispatch
        # (_step_n) — amortizes per-token dispatch latency (the dominant
        # cost on remote/tunnel backends). Sampling happens in-graph, so
        # sampled requests fuse too; only rep_window > rep_hist falls back
        # to host-side per-token sampling.
        self.tick_tokens = max(1, int(tick_tokens))
        self.rep_hist = max(1, int(rep_hist))
        self._cache_dtype = cache_dtype
        self.caches = [
            SlotKVCache(slots, cfg.num_key_value_heads, max_len,
                        cfg.head_dim, cache_dtype)
            for _ in range(cfg.num_hidden_layers)
        ]
        self.active: List[Optional[_Request]] = [None] * slots
        self.cur_tok = np.zeros(slots, np.int32)
        self.pos = np.full(slots, max_len - 1, np.int32)  # scratch index
        self.keys = np.zeros((slots, 2), np.uint32)  # per-slot PRNG streams
        self._joinq: "queue.Queue[_Request]" = queue.Queue()
        self.seed = seed
        self._req_counter = 0
        self._rng = np.random.default_rng(seed)
        self._stop = threading.Event()
        self._wake = threading.Event()
        self.steps = 0  # batched step dispatches (for tests/metrics)
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------------

    def submit(self, prompt: Sequence[int], max_tokens: int = 128,
               eos_ids: Sequence[int] = (), temp: float = 0.0,
               top_p: float = 1.0, top_k: int = 0, min_p: float = 0.0,
               repetition_penalty: float = 1.0,
               repetition_context_size: int = 64,
               seed: Optional[int] = None,
               on_token=None) -> Future:
        """Queue a generation request; resolves to the token list
        (EOS included when hit).

        `seed` pins the request's private PRNG stream: a sampled request
        with a fixed seed produces the same tokens whether it runs alone
        or batched with arbitrary co-tenants. Default: a fresh stream per
        request derived from the batcher seed."""
        prompt = list(prompt)
        if seed is None:
            self._req_counter += 1
            seed = int(np.uint32(hash((self.seed, self._req_counter))
                                 & 0xFFFFFFFF))
        req = _Request(
            prompt=np.asarray(prompt, np.int32),
            max_tokens=max_tokens, eos_ids=frozenset(int(e) for e in eos_ids),
            temp=temp, top_p=top_p, top_k=top_k, min_p=min_p,
            rep_penalty=repetition_penalty,
            rep_window=repetition_context_size,
            seed=seed,
            host_sampling=(repetition_penalty != 1.0
                           and repetition_context_size > self.rep_hist),
            on_token=on_token,
            prompt_tail=(
                tuple(prompt[-repetition_context_size:])
                if repetition_context_size > 0 else ()
            ),
        )
        self._joinq.put(req)
        self._wake.set()
        return req.future

    def submit_embeds(self, prompt_embeds, max_tokens: int = 128,
                      eos_ids: Sequence[int] = (), temp: float = 0.0,
                      top_p: float = 1.0, top_k: int = 0,
                      min_p: float = 0.0,
                      repetition_penalty: float = 1.0,
                      repetition_context_size: int = 64,
                      seed: Optional[int] = None,
                      on_token=None) -> Future:
        """Queue a generation request whose prompt is an EMBEDDING matrix
        (T, D) — audio-conditioned LLM prefixes (Qwen3-ASR / Voxtral /
        GLM-ASR). Decode after the prefix is ordinary token ids through
        the model's embedding table, so the lock-step decode path is
        shared with token-prompt requests. The repetition window starts
        empty (prompt ids are unknown)."""
        emb = np.asarray(prompt_embeds)
        if emb.ndim == 3:
            assert emb.shape[0] == 1, "prompt_embeds must be (T, D)"
            emb = emb[0]
        if seed is None:
            self._req_counter += 1
            seed = int(np.uint32(hash((self.seed, self._req_counter))
                                 & 0xFFFFFFFF))
        req = _Request(
            prompt=np.zeros((0,), np.int32),
            max_tokens=max_tokens, eos_ids=frozenset(int(e) for e in eos_ids),
            temp=temp, top_p=top_p, top_k=top_k, min_p=min_p,
            rep_penalty=repetition_penalty,
            rep_window=repetition_context_size,
            seed=seed,
            host_sampling=(repetition_penalty != 1.0
                           and repetition_context_size > self.rep_hist),
            on_token=on_token,
            prompt_embeds=emb,
        )
        self._joinq.put(req)
        self._wake.set()
        return req.future

    def close(self):
        self._stop.set()
        self._wake.set()
        self._thread.join(timeout=10)
        # fail anything still waiting for a slot — blocked futures would
        # otherwise hang forever
        while True:
            try:
                req = self._joinq.get_nowait()
            except queue.Empty:
                break
            if not req.future.done():
                req.future.set_exception(
                    RuntimeError("ContinuousBatcher closed")
                )

    # ------------------------------------------------------------------

    def _sample(self, logits_row: np.ndarray, req: "_Request") -> int:
        """Host-side sampler for the rep_window > rep_hist fallback
        (mirrors lm.sample semantics: rep penalty over a sliding window,
        top-k, top-p nucleus, temperature)."""
        z = logits_row.astype(np.float64).copy()
        if req.rep_penalty != 1.0 and req.rep_window > 0:
            window = (list(req.prompt_tail) + req.tokens)[-req.rep_window:]
            idx = np.unique(np.asarray(window, np.int64))
            idx = idx[(idx >= 0) & (idx < z.shape[0])]
            pos = z[idx] > 0
            z[idx[pos]] /= req.rep_penalty
            z[idx[~pos]] *= req.rep_penalty
        if req.temp == 0.0:
            return int(np.argmax(z))
        z = z / req.temp  # scale BEFORE filtering (lm.sample order)
        if req.top_k > 0 and req.top_k < z.shape[0]:
            kth = np.partition(z, -req.top_k)[-req.top_k]
            z[z < kth] = -np.inf
        if req.top_p < 1.0:
            order = np.argsort(z)[::-1]
            zs = z[order]
            probs = np.exp(zs - zs.max())
            probs /= probs.sum()
            cum = np.cumsum(probs)
            keep = (cum - probs) < req.top_p  # always keeps top-1
            cutoff = zs[keep][-1]
            z[z < cutoff] = -np.inf
        if req.min_p > 0.0:
            z[z < z.max() + np.log(req.min_p)] = -np.inf
        z -= z.max()
        p = np.exp(z)
        p /= p.sum()
        return int(self._rng.choice(len(p), p=p))

    # ---- per-slot sampler-state marshalling --------------------------

    def _hist_row(self, req: Optional[_Request]) -> np.ndarray:
        row = np.full(self.rep_hist, -1, np.int32)
        if req is None:
            return row
        seq = (list(req.prompt_tail) + req.tokens)[-self.rep_hist:]
        if seq:
            row[-len(seq):] = seq
        return row

    def _sampler_state(self):
        """Build the per-slot (B,) sampler parameter arrays + history for
        the current pool (dead slots get inert greedy defaults)."""
        B = self.slots
        temps = np.zeros(B, np.float32)
        top_ps = np.ones(B, np.float32)
        top_ks = np.zeros(B, np.int32)
        min_ps = np.zeros(B, np.float32)
        rep_pens = np.ones(B, np.float32)
        rep_windows = np.zeros(B, np.int32)
        hist = np.full((B, self.rep_hist), -1, np.int32)
        for i, req in enumerate(self.active):
            if req is None:
                continue
            temps[i] = req.temp
            top_ps[i] = req.top_p
            top_ks[i] = req.top_k
            min_ps[i] = req.min_p
            if not req.host_sampling:
                rep_pens[i] = req.rep_penalty
                rep_windows[i] = min(req.rep_window, self.rep_hist)
                hist[i] = self._hist_row(req)
        return temps, top_ps, top_ks, min_ps, rep_pens, rep_windows, hist

    def _admit(self, req: _Request, slot: int):
        T = (req.prompt_embeds.shape[0] if req.prompt_embeds is not None
             else len(req.prompt))
        if T >= self.max_len:
            raise ValueError(
                f"prompt length {T} >= cache capacity {self.max_len}"
            )
        P = min(_bucket(T), self.max_len)
        cfg = self.model.config
        single = [
            # plain scalar-pos cache for the bucketed prefill
            _B1Cache(cfg.num_key_value_heads, P, cfg.head_dim,
                     self.caches[0].k.dtype)
            for _ in range(cfg.num_hidden_layers)
        ]
        if req.prompt_embeds is not None:
            x = np.zeros((1, P, req.prompt_embeds.shape[1]),
                         req.prompt_embeds.dtype)
            x[0, :T] = req.prompt_embeds
            logits, single = _prefill_b1_embeds(
                self.model, single, jnp.asarray(x), jnp.asarray(T)
            )
        else:
            ids = np.zeros((1, P), np.int32)
            ids[0, :T] = req.prompt
            logits, single = _prefill_b1(
                self.model, single, jnp.asarray(ids), jnp.asarray(T)
            )
        self.caches = _install_slot(
            self.caches, single, slot, jnp.asarray(T, jnp.int32)
        )
        key = np.asarray(jax.random.PRNGKey(req.seed), np.uint32)
        if req.host_sampling:
            first = self._sample(np.asarray(jax.device_get(logits)), req)
        else:
            hist1 = self._hist_row(req)[None]
            tok1, key1 = _sample_rows(
                jnp.asarray(logits)[None], jnp.asarray(key[None]),
                jnp.asarray(hist1),
                jnp.asarray([req.temp], np.float32),
                jnp.asarray([req.top_p], np.float32),
                jnp.asarray([req.top_k], np.int32),
                jnp.asarray([req.rep_penalty], np.float32),
                jnp.asarray([min(req.rep_window, self.rep_hist)], np.int32),
                jnp.asarray([req.min_p], np.float32),
            )
            first = int(jax.device_get(tok1)[0])
            key = np.asarray(jax.device_get(key1))[0]
        self.active[slot] = req
        self.keys[slot] = key
        req.tokens.append(first)
        self._emit(req, first)
        if first in req.eos_ids or req.max_tokens <= 1:
            self._finish(slot)
            return
        self.cur_tok[slot] = first
        self.pos[slot] = T

    @staticmethod
    def _emit(req: _Request, tok: int) -> None:
        """Streaming callback — never let a client callback kill the
        worker (e.g. writing to a disconnected socket)."""
        if req.on_token:
            try:
                req.on_token(tok)
            except Exception:
                req.on_token = None  # stop calling a broken sink

    def _finish(self, slot: int):
        req = self.active[slot]
        self.active[slot] = None
        self.pos[slot] = self.max_len - 1  # park on scratch index
        if req and not req.future.done():
            req.future.set_result(req.tokens)

    def _fail_all(self, e: Exception) -> None:
        """Fail every live stream and rebuild the cache pool: a failed
        dispatch DONATED the old buffers, so they are unusable."""
        for slot, req in enumerate(self.active):
            if req is not None and not req.future.done():
                req.future.set_exception(e)
            self.active[slot] = None
            self.pos[slot] = self.max_len - 1
        cfg = self.model.config
        self.caches = [
            SlotKVCache(self.slots, cfg.num_key_value_heads,
                        self.max_len, cfg.head_dim, self._cache_dtype)
            for _ in range(cfg.num_hidden_layers)
        ]

    def _fused_tick(self, n: int) -> None:
        """One fused n-step tick (see _step_n), greedy and sampled slots
        alike. Consumes up to n tokens per live slot; truncates past
        EOS / max_tokens."""
        temps, top_ps, top_ks, min_ps, rep_pens, rep_windows, hist = (
            self._sampler_state())
        try:
            toks, keys, self.caches = _step_n(
                self.model, self.caches,
                jnp.asarray(self.cur_tok), jnp.asarray(self.pos),
                jnp.asarray(self.keys), jnp.asarray(hist),
                jnp.asarray(temps), jnp.asarray(top_ps),
                jnp.asarray(top_ks), jnp.asarray(rep_pens),
                jnp.asarray(rep_windows), jnp.asarray(min_ps), n=n,
            )
            self.steps += 1
            toks_np = np.asarray(jax.device_get(toks))  # (slots, n)
            self.keys = np.array(jax.device_get(keys))
        except Exception as e:  # pragma: no cover - defensive
            self._fail_all(e)
            return
        for slot, req in enumerate(self.active):
            if req is None:
                continue
            for j in range(n):
                tok = int(toks_np[slot, j])
                req.tokens.append(tok)
                self._emit(req, tok)
                self.pos[slot] += 1
                self.cur_tok[slot] = tok
                if (
                    tok in req.eos_ids
                    or len(req.tokens) >= req.max_tokens
                    or self.pos[slot] >= self.max_len - 1
                ):
                    self._finish(slot)
                    break

    def _worker(self):
        while not self._stop.is_set():
            # admit pending requests into free slots
            while any(a is None for a in self.active):
                try:
                    req = self._joinq.get_nowait()
                except queue.Empty:
                    break
                slot = self.active.index(None)
                try:
                    self._admit(req, slot)
                except Exception as e:  # pragma: no cover - defensive
                    if not req.future.done():
                        req.future.set_exception(e)

            if not any(self.active):
                self._wake.wait(timeout=0.05)
                self._wake.clear()
                continue

            # fused multi-step ticks serve every request mix; the only
            # fallback is host-side sampling for oversized rep windows
            fused = self.tick_tokens > 1 and not any(
                r is not None and r.host_sampling for r in self.active
            )
            if fused:
                self._fused_tick(self.tick_tokens)
                continue
            any_host = any(
                r is not None and r.host_sampling for r in self.active)
            temps, top_ps, top_ks, min_ps, rep_pens, rep_windows, hist = (
                self._sampler_state())
            try:
                logits, self.caches = _step(
                    self.model, self.caches,
                    jnp.asarray(self.cur_tok), jnp.asarray(self.pos),
                )
                self.steps += 1
                # device-side sampling keeps per-request determinism (a
                # request's stream depends only on its own key); host rows
                # are overridden below from fetched logits
                toks_dev, keys = _sample_rows(
                    logits, jnp.asarray(self.keys), jnp.asarray(hist),
                    jnp.asarray(temps), jnp.asarray(top_ps),
                    jnp.asarray(top_ks), jnp.asarray(rep_pens),
                    jnp.asarray(rep_windows), jnp.asarray(min_ps),
                )
                toks_np = np.asarray(jax.device_get(toks_dev))
                self.keys = np.array(jax.device_get(keys))
                logits_np = (
                    np.asarray(jax.device_get(logits)) if any_host else None
                )
            except Exception as e:  # pragma: no cover - defensive
                self._fail_all(e)
                continue
            for slot, req in enumerate(self.active):
                if req is None:
                    continue
                try:
                    if req.host_sampling:
                        tok = self._sample(logits_np[slot], req)
                    else:
                        tok = int(toks_np[slot])
                except Exception as e:  # NaN logits under temp>0, etc.
                    self.active[slot] = None
                    self.pos[slot] = self.max_len - 1
                    if not req.future.done():
                        req.future.set_exception(e)
                    continue
                req.tokens.append(tok)
                self._emit(req, tok)
                self.pos[slot] += 1
                self.cur_tok[slot] = tok
                if (
                    tok in req.eos_ids
                    or len(req.tokens) >= req.max_tokens
                    or self.pos[slot] >= self.max_len - 1
                ):
                    self._finish(slot)


class _B1Cache(Module):
    """Scalar-pos B=1 cache for bucketed prefill (mirrors lm.cache.KVCache
    but sized exactly to the prompt bucket so the copy into a slot is a
    contiguous prefix)."""

    def __init__(self, num_kv_heads: int, max_len: int, head_dim: int, dtype):
        self.k = jnp.zeros((1, num_kv_heads, max_len, head_dim), dtype)
        self.v = jnp.zeros((1, num_kv_heads, max_len, head_dim), dtype)
        self.pos = jnp.array(0, jnp.int32)

    @property
    def max_len(self) -> int:
        return self.k.shape[2]

    def update(self, k, v):
        nk = jax.lax.dynamic_update_slice(
            self.k, k.astype(self.k.dtype), (0, 0, self.pos, 0)
        )
        nv = jax.lax.dynamic_update_slice(
            self.v, v.astype(self.v.dtype), (0, 0, self.pos, 0)
        )
        new = self.replace(k=nk, v=nv, pos=self.pos + k.shape[2])
        return nk, nv, new

    def attention_mask(self, t: int, dtype=jnp.float32):
        s = self.max_len
        q_pos = self.pos + jnp.arange(t)[:, None]
        k_idx = jnp.arange(s)[None, :]
        ok = k_idx <= q_pos
        return jnp.where(ok, 0.0, -jnp.inf).astype(dtype)[None, None]

"""Continuous (slot-based) batching for VoxCPM's dual-LM patch decode.

NEW relative to the reference (one request at a time; reference
voxcpm.py:370-421 steps per request): a pool of B slot PAIRS of caches
(base MiniCPM + residual MiniCPM share slot indices) advances in
lock-step, one fused dispatch per `tick_frames` patch steps. Each step
mirrors `_voxcpm_generate`: DiT projection of both hidden streams,
per-row flow sampling (`feat_decoder.sample` vmapped with per-row PRNG
keys, so a batched row's patches equal a solo run with the same seed),
stop-head classification (host-side, with the reference's step>5 guard),
then feat-encoder re-embedding through BOTH LMs at per-row absolute
longrope positions.
"""

from __future__ import annotations

from concurrent.futures import Future
from dataclasses import dataclass, field
from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ....lm.cache import KVCache
from ....lm.continuous import SlotKVCache, _bucket, _install_slot
from ....serving import FrameBatcherBase

__all__ = ["VoxCPMBatcher"]


@partial(jax.jit, donate_argnames=("lm_caches", "res_caches"))
def _prefill_b1(model, lm_caches, res_caches, combined, length):
    Tp = combined.shape[1]
    S = lm_caches[0].max_len
    q = jnp.arange(Tp)[:, None]
    k = jnp.arange(S)[None, :]
    ok = (k <= q) & (k < length)
    mask = jnp.where(ok, 0.0, -jnp.inf)[None, None]
    pos = jnp.arange(Tp)
    enc_out, lm_caches = model.base_lm(combined, lm_caches, positions=pos,
                                       mask=mask)
    last = jnp.clip(length - 1, 0, Tp - 1)
    lm_hidden = model.fsq_layer(enc_out[:, last])
    res_out, res_caches = model.residual_lm(enc_out, res_caches,
                                            positions=pos, mask=mask)
    return lm_hidden[0], res_out[0, last], lm_caches, res_caches


@partial(jax.jit, donate_argnames=("buf",), static_argnames=("slot",))
def _set_row(buf, slot: int, row):
    return buf.at[slot].set(row.astype(buf.dtype))


@partial(jax.jit, donate_argnames=("lm_caches", "res_caches"),
         static_argnames=("n", "n_timesteps", "cfg_value"))
def _tick_n(model, lm_caches: List[SlotKVCache],
            res_caches: List[SlotKVCache], lm_hidden, residual_hidden,
            prefix_feat, pos, keys, n: int, n_timesteps: int,
            cfg_value: float):
    """`n` lock-step patch steps fused into ONE dispatch.

    Returns (preds (B, n, P, D), stops (B, n) bool, caches..., hiddens,
    prefix_feat, pos, keys)."""
    P = model.patch_size

    def body(carry, _):
        (lm_caches, res_caches, lm_hidden, residual_hidden, prefix_feat,
         pos, keys) = carry
        dit_h = (model.lm_to_dit_proj(lm_hidden)
                 + model.res_to_dit_proj(residual_hidden))
        split = jax.vmap(jax.random.split)(keys)
        keys, subs = split[:, 0], split[:, 1]
        # per-row flow sampling: each row draws its own (1, P, C) noise
        # from its own key — identical to the solo `sample` call
        pred = jax.vmap(
            lambda h, pf, k: model.feat_decoder.sample(
                h[None], n_timesteps, P, pf[None], k,
                cfg_value=cfg_value)[0]
        )(dit_h, prefix_feat, subs)  # (B, P, D)

        stop_logits = model.stop_head(jax.nn.silu(
            model.stop_proj(lm_hidden)))
        stop = jnp.argmax(stop_logits, axis=-1) == 1  # (B,)

        curr = model.enc_to_lm_proj(model.feat_encoder(pred[:, None]))
        lm_caches = [c.replace(pos=pos) for c in lm_caches]
        res_caches = [c.replace(pos=pos) for c in res_caches]
        S = lm_caches[0].max_len
        amask = jnp.where(
            jnp.arange(S)[None, :] <= pos[:, None], 0.0, -jnp.inf
        )[:, None, None, :]
        new_lm, lm_caches = model.base_lm(curr, lm_caches,
                                          positions=pos[:, None],
                                          mask=amask)
        lm_hidden = model.fsq_layer(new_lm[:, -1])
        res_in = lm_hidden[:, None] + curr
        new_res, res_caches = model.residual_lm(res_in, res_caches,
                                                positions=pos[:, None],
                                                mask=amask)
        carry = (lm_caches, res_caches, lm_hidden, new_res[:, -1], pred,
                 pos + 1, keys)
        return carry, (pred, stop)

    carry = (lm_caches, res_caches, lm_hidden, residual_hidden,
             prefix_feat, pos, keys)
    (lm_caches, res_caches, lm_hidden, residual_hidden, prefix_feat, pos,
     keys), (preds, stops) = jax.lax.scan(body, carry, None, length=n)
    return (jnp.swapaxes(preds, 0, 1), jnp.swapaxes(stops, 0, 1),
            lm_caches, res_caches, lm_hidden, residual_hidden,
            prefix_feat, pos, keys)


@dataclass
class _VoxRequest:
    combined: np.ndarray  # (1, T0, H) prefill embeddings
    prefix_feat: np.ndarray  # (1, P, D) initial flow conditioning
    max_tokens: int
    n_timesteps: int
    cfg_value: float
    seed: int
    future: Future = field(default_factory=Future)
    patches: list = field(default_factory=list)  # (P, D) rows
    n_steps: int = 0
    on_frame: object = None  # streaming sink, one (P, D) patch per call


class VoxCPMBatcher(FrameBatcherBase):
    """Slot-based continuous batching over a VoxCPM model. `submit` takes
    the prepared prefill embeddings + prefix feature (host prep —
    tokenizer, audio-VAE prompt encode — on the caller's thread) and
    resolves to the generated feature patches (n, P, D) float32; audio-VAE
    decode stays on the caller's thread.

    `n_timesteps` and `cfg_value` are static compile parameters of the
    fused tick — one pair per batcher (the serving defaults); requests
    wanting different values fall back to the single-request path.
    """

    def __init__(self, model, slots: int = 4, max_len: int = 2048,
                 tick_frames: int = 8, n_timesteps: int = 10,
                 cfg_value: float = 2.0, **_ignored):
        self._owner = model
        self.model = model
        self.max_len = max_len
        self.n_timesteps = int(n_timesteps)
        self.cfg_value = float(cfg_value)
        lm = model.args.lm_config
        self._build_device_state(slots)
        self.pos = np.full(slots, max_len - 1, np.int32)  # scratch index
        self.keys = np.zeros((slots, 2), np.uint32)
        super().__init__(slots=slots, tick_frames=tick_frames)

    def _build_device_state(self, slots):
        m = self.model
        lm = m.args.lm_config
        res = m.residual_lm.cfg
        mk = lambda cfg: [
            SlotKVCache(slots, cfg.num_key_value_heads, self.max_len,
                        cfg.hidden_size // cfg.num_attention_heads,
                        jnp.float32)
            for _ in range(cfg.num_hidden_layers)
        ]
        self.lm_caches = mk(lm)
        self.res_caches = mk(res)
        self.lm_hidden = jnp.zeros((slots, lm.hidden_size), jnp.float32)
        self.res_hidden = jnp.zeros((slots, res.hidden_size), jnp.float32)
        self.prefix_feat = jnp.zeros((slots, m.patch_size, m.feat_dim),
                                     jnp.float32)

    def submit(self, combined, prefix_feat, *, max_tokens: int = 4096,
               n_timesteps: int = None, cfg_value: float = None,
               seed: int = 0, on_frame=None) -> Future:
        if n_timesteps is not None and int(n_timesteps) != self.n_timesteps:
            raise ValueError("n_timesteps differs from batcher static")
        if cfg_value is not None and float(cfg_value) != self.cfg_value:
            raise ValueError("cfg_value differs from batcher static")
        req = _VoxRequest(
            combined=np.asarray(combined),
            prefix_feat=np.asarray(prefix_feat),
            max_tokens=min(int(max_tokens), self.model.args.max_length),
            n_timesteps=self.n_timesteps, cfg_value=self.cfg_value,
            seed=int(seed), on_frame=on_frame,
        )
        return self.submit_request(req)

    # -- FrameBatcherBase hooks ---------------------------------------

    def _admit(self, req: _VoxRequest, slot: int) -> None:
        T = req.combined.shape[1]
        if T >= self.max_len:
            raise ValueError(f"prompt length {T} >= capacity {self.max_len}")
        m = self.model
        lm = m.args.lm_config
        res = m.residual_lm.cfg
        P = min(_bucket(T), self.max_len)
        inp = np.zeros((1, P, req.combined.shape[-1]), np.float32)
        inp[:, :T] = np.asarray(req.combined, np.float32)
        mk1 = lambda cfg: [
            KVCache(1, cfg.num_key_value_heads, P,
                    cfg.hidden_size // cfg.num_attention_heads,
                    dtype=jnp.float32)
            for _ in range(cfg.num_hidden_layers)
        ]
        h0, r0, lm1, res1 = _prefill_b1(
            m, mk1(lm), mk1(res), jnp.asarray(inp), jnp.asarray(T))
        self.lm_caches = _install_slot(
            self.lm_caches, lm1, slot, jnp.asarray(T, jnp.int32))
        self.res_caches = _install_slot(
            self.res_caches, res1, slot, jnp.asarray(T, jnp.int32))
        self.lm_hidden = _set_row(self.lm_hidden, slot, h0)
        self.res_hidden = _set_row(self.res_hidden, slot, r0)
        self.prefix_feat = _set_row(
            self.prefix_feat, slot, jnp.asarray(req.prefix_feat[0]))
        self.pos[slot] = T
        self.keys[slot] = np.asarray(jax.random.PRNGKey(req.seed), np.uint32)

    def _tick(self, n: int) -> None:
        (preds, stops, self.lm_caches, self.res_caches, self.lm_hidden,
         self.res_hidden, self.prefix_feat, _pos, keys) = _tick_n(
            self.model, self.lm_caches, self.res_caches, self.lm_hidden,
            self.res_hidden, self.prefix_feat, jnp.asarray(self.pos),
            jnp.asarray(self.keys), n=n, n_timesteps=self.n_timesteps,
            cfg_value=self.cfg_value,
        )
        preds_np = np.asarray(jax.device_get(preds), np.float32)
        stops_np = np.asarray(jax.device_get(stops))
        self.keys = np.array(jax.device_get(keys))
        self.steps += 1  # before _finish: future observers see the count
        for slot, req in enumerate(self.active):
            if req is None:
                continue
            for j in range(n):
                # _voxcpm_generate: the stop-flagged step's patch IS kept
                # (out set before done) and stop requires step > 5
                req.patches.append(preds_np[slot, j])
                self._emit(req, preds_np[slot, j])
                step = req.n_steps
                req.n_steps += 1
                self.pos[slot] += 1
                stop = bool(stops_np[slot, j]) and step > 5
                if (stop or req.n_steps >= req.max_tokens
                        or self.pos[slot] >= self.max_len - 1):
                    self._finish_slot(slot)
                    break

    def _finish_slot(self, slot: int) -> None:
        req = self.active[slot]
        self.pos[slot] = self.max_len - 1
        m = self.model
        result = (np.stack(req.patches) if req and req.patches
                  else np.zeros((0, m.patch_size, m.feat_dim), np.float32))
        self._finish(slot, result)

    def _fail_all(self, e: Exception) -> None:
        for slot, req in enumerate(self.active):
            if req is not None and not req.future.done():
                req.future.set_exception(e)
            self.active[slot] = None
            self.pos[slot] = self.max_len - 1
        self._build_device_state(self.slots)

    # -- pipeline integration -----------------------------------------

    def install(self):
        from ....serving import register_infer_hook

        register_infer_hook(self._owner, self)
        return self

    def close(self):
        from ....serving import unregister_infer_hook

        unregister_infer_hook(self._owner)
        super().close()

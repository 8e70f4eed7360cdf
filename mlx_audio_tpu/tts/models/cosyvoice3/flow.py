"""CosyVoice3 flow matching: PreLookahead → ×2 repeat → DiT CFM.

TPU-native re-implementation of the reference
mlx_audio/tts/models/cosyvoice3/flow.py:39-514. The Euler solve runs as a
single `lax.fori_loop` with the conditional/unconditional CFG pair batched
(2B) through one DiT forward per step — one XLA program per length bucket.
Channels-last throughout (the reference transposes to channel-first for its
decoder; here mel stays (B, T, C) end to end).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ....nn import layers as nn
from ....nn.module import Module
from .dit import DiT

__all__ = ["CosyVoice3ConditionalCFM", "CausalMaskedDiffWithDiT",
           "PreLookaheadLayer", "build_flow_model"]


class PreLookaheadLayer(Module):
    """Right-context conv + causal conv with residual
    (reference convolution.py:259-329). x: (B, T, in_channels)."""

    def __init__(self, in_channels: int, channels: int,
                 pre_lookahead_len: int = 3):
        self.pre_lookahead_len = pre_lookahead_len
        self.conv1 = nn.Conv1d(in_channels, channels, pre_lookahead_len + 1)
        self.conv2 = nn.Conv1d(channels, in_channels, 3)

    def __call__(self, x: jnp.ndarray,
                 context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if context is None or context.shape[1] == 0:
            h = jnp.pad(x, ((0, 0), (0, self.pre_lookahead_len), (0, 0)))
        else:
            h = jnp.concatenate([x, context], axis=1)
            rem = self.pre_lookahead_len - context.shape[1]
            if rem > 0:
                h = jnp.pad(h, ((0, 0), (0, rem), (0, 0)))
        h = jax.nn.leaky_relu(self.conv1(h), negative_slope=0.01)
        h = self.conv2(jnp.pad(h, ((0, 0), (2, 0), (0, 0))))
        return h + x


class CosyVoice3ConditionalCFM(Module):
    """Cosine-scheduled Euler CFM with batched CFG
    (reference flow.py:39-268)."""

    def __init__(self, estimator: DiT, sigma_min: float = 1e-6,
                 t_scheduler: str = "cosine",
                 inference_cfg_rate: float = 0.7):
        self.estimator = estimator
        self.sigma_min = sigma_min
        self.t_scheduler = t_scheduler
        self.inference_cfg_rate = inference_cfg_rate

    def __call__(self, mu: jnp.ndarray, spks: jnp.ndarray,
                 cond: jnp.ndarray, key: jnp.ndarray,
                 n_timesteps: int = 10, streaming: bool = False
                 ) -> Tuple[jnp.ndarray, None]:
        """mu: (B, T, mu_dim), spks: (B, D), cond: (B, T, mel) →
        mel (B, T, mel). The reference slices a pre-computed noise buffer
        for determinism (flow.py:96-110); here `key` drives the noise —
        pass a fixed key for reproducible output."""
        B, T = mu.shape[0], mu.shape[1]
        mel_dim = cond.shape[-1]
        z = jax.random.normal(key, (B, T, mel_dim), dtype=mu.dtype)
        return self.solve_euler(z, mu, spks, cond, n_timesteps,
                                streaming), None

    def solve_euler(self, z: jnp.ndarray, mu: jnp.ndarray,
                    spks: jnp.ndarray, cond: jnp.ndarray,
                    n_timesteps: int, streaming: bool = False
                    ) -> jnp.ndarray:
        """Batched-CFG Euler ODE (reference flow.py:123-207)."""
        ts = jnp.linspace(0.0, 1.0, n_timesteps + 1)
        if self.t_scheduler == "cosine":
            ts = 1.0 - jnp.cos(ts * 0.5 * math.pi)
        B = mu.shape[0]
        cfg = self.inference_cfg_rate

        mu2 = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
        spks2 = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
        cond2 = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)

        def body(i, x):
            t = ts[i]
            dt = ts[i + 1] - ts[i]
            x2 = jnp.concatenate([x, x], axis=0)
            v2 = self.estimator(x2, mu2, jnp.broadcast_to(t, (2 * B,)),
                                spks2, cond2, streaming=streaming)
            v = (1.0 + cfg) * v2[:B] - cfg * v2[B:]
            return x + dt * v

        return jax.lax.fori_loop(0, n_timesteps, body, z)


class CausalMaskedDiffWithDiT(Module):
    """Token → mel flow model with DiT decoder (reference flow.py:271-441).

    Replaces CosyVoice2's conformer upsample-encoder with a PreLookahead
    conv and a plain ×token_mel_ratio repeat.
    """

    def __init__(self, input_size: int = 80, output_size: int = 80,
                 spk_embed_dim: int = 192, vocab_size: int = 6561,
                 input_frame_rate: int = 25, token_mel_ratio: int = 2,
                 pre_lookahead_len: int = 3,
                 pre_lookahead_layer: Optional[PreLookaheadLayer] = None,
                 decoder: Optional[CosyVoice3ConditionalCFM] = None,
                 n_timesteps: int = 10):
        self.input_size = input_size
        self.output_size = output_size
        self.vocab_size = vocab_size
        self.input_frame_rate = input_frame_rate
        self.token_mel_ratio = token_mel_ratio
        self.pre_lookahead_len = pre_lookahead_len
        self.n_timesteps = n_timesteps
        self.input_embedding = nn.Embedding(vocab_size, input_size)
        self.spk_embed_affine_layer = nn.Linear(spk_embed_dim, output_size)
        self.pre_lookahead_layer = pre_lookahead_layer or PreLookaheadLayer(
            input_size, input_size, pre_lookahead_len)
        self.decoder = decoder

    def inference(self, token: jnp.ndarray, token_len: jnp.ndarray,
                  prompt_token: jnp.ndarray, prompt_token_len: jnp.ndarray,
                  prompt_feat: jnp.ndarray,
                  embedding: jnp.ndarray,
                  key: Optional[jnp.ndarray] = None,
                  n_timesteps: Optional[int] = None,
                  streaming: bool = False,
                  finalize: bool = True) -> Tuple[jnp.ndarray, None]:
        """token (1, T), prompt_token (1, Tp), prompt_feat (1, Tp·r, M),
        embedding (1, spk_dim) → mel (1, T·r, M) past the prompt
        (reference flow.py:332-441). Padding tokens beyond `token_len` feed
        zeroed embeddings; the caller slices the valid region."""
        if key is None:
            key = jax.random.PRNGKey(42)
        emb = embedding / jnp.sqrt(
            jnp.sum(embedding * embedding, axis=-1, keepdims=True) + 1e-8)
        emb = self.spk_embed_affine_layer(emb)

        tokens = jnp.concatenate([prompt_token, token], axis=1)
        total_len = prompt_token_len + token_len
        valid = (jnp.arange(tokens.shape[1])[None, :]
                 < total_len[:, None])[..., None]
        h = self.input_embedding(jnp.clip(tokens, 0, self.vocab_size - 1))
        h = h * valid.astype(h.dtype)
        if finalize:
            h = self.pre_lookahead_layer(h)
        else:
            h = self.pre_lookahead_layer(
                h[:, : -self.pre_lookahead_len],
                context=h[:, -self.pre_lookahead_len:])
        h = jnp.repeat(h, self.token_mel_ratio, axis=1)

        mel_len1 = prompt_feat.shape[1]
        mel_len2 = h.shape[1] - mel_len1
        cond = jnp.concatenate(
            [prompt_feat,
             jnp.zeros((1, mel_len2, self.output_size), h.dtype)], axis=1)

        n_ts = n_timesteps or self.n_timesteps
        feat, _ = self.decoder(mu=h, spks=emb, cond=cond, key=key,
                               n_timesteps=n_ts, streaming=streaming)
        return feat[:, mel_len1:].astype(jnp.float32), None


def build_flow_model(input_size: int = 80, output_size: int = 80,
                     spk_embed_dim: int = 192, vocab_size: int = 6561,
                     input_frame_rate: int = 25, token_mel_ratio: int = 2,
                     pre_lookahead_len: int = 3, dit_dim: int = 1024,
                     dit_depth: int = 22, dit_heads: int = 16,
                     dit_dim_head: int = 64, dit_ff_mult: int = 2,
                     cfm_sigma_min: float = 1e-6,
                     cfm_t_scheduler: str = "cosine",
                     cfm_inference_cfg_rate: float = 0.7,
                     n_timesteps: int = 10, static_chunk_size: int = 50
                     ) -> CausalMaskedDiffWithDiT:
    """Assemble the flow stack (reference flow.py:444-514)."""
    pre = PreLookaheadLayer(input_size, dit_dim, pre_lookahead_len)
    dit = DiT(dim=dit_dim, depth=dit_depth, heads=dit_heads,
              dim_head=dit_dim_head, ff_mult=dit_ff_mult,
              mel_dim=output_size, mu_dim=input_size, spk_dim=output_size,
              out_channels=output_size, static_chunk_size=static_chunk_size)
    cfm = CosyVoice3ConditionalCFM(
        dit, sigma_min=cfm_sigma_min, t_scheduler=cfm_t_scheduler,
        inference_cfg_rate=cfm_inference_cfg_rate)
    return CausalMaskedDiffWithDiT(
        input_size=input_size, output_size=output_size,
        spk_embed_dim=spk_embed_dim, vocab_size=vocab_size,
        input_frame_rate=input_frame_rate, token_mel_ratio=token_mel_ratio,
        pre_lookahead_len=pre_lookahead_len, pre_lookahead_layer=pre,
        decoder=cfm, n_timesteps=n_timesteps)

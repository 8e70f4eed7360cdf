"""Conditional flow matching (CFM) solver with classifier-free guidance.

TPU-native re-implementation of the reference
mlx_audio/codec/models/s3gen/flow_matching.py and
mlx_audio/tts/models/cosyvoice2/flow_matching.py:16-158.

The Euler solve runs as a `lax.fori_loop` over a precomputed cosine
t-schedule so the whole n_timesteps solve is one XLA program; the CFG pair
is batched (cond/uncond stacked on axis 0) exactly like the reference.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ....nn.module import Module

__all__ = ["ConditionalCFM", "CFMParams"]


@dataclass
class CFMParams:
    sigma_min: float = 1e-6
    solver: str = "euler"
    t_scheduler: str = "cosine"
    training_cfg_rate: float = 0.2
    inference_cfg_rate: float = 0.7


class ConditionalCFM(Module):
    """Euler CFM solver; `estimator` is a ConditionalDecoder."""

    MEL_CHANNELS = 80

    def __init__(self, in_channels: int = 240,
                 cfm_params: Optional[CFMParams] = None,
                 n_spks: int = 1, spk_emb_dim: int = 80,
                 estimator: Optional[Module] = None):
        cfm_params = cfm_params or CFMParams()
        self.n_feats = in_channels
        self.spk_emb_dim = spk_emb_dim
        self.t_scheduler = cfm_params.t_scheduler
        self.inference_cfg_rate = cfm_params.inference_cfg_rate
        self.estimator = estimator

    def __call__(self, mu: jnp.ndarray, mask: jnp.ndarray, n_timesteps: int,
                 key: jnp.ndarray, temperature: float = 1.0,
                 spks: Optional[jnp.ndarray] = None,
                 cond: Optional[jnp.ndarray] = None,
                 streaming: bool = False,
                 meanflow: bool = False) -> Tuple[jnp.ndarray, None]:
        """mu: (B, T, C_mu); mask: (B, T, 1) → mel (B, T, 80).

        reference cosyvoice2/flow_matching.py:39-85 (but channels-last and
        fully in-graph; `key` drives the initial noise). `meanflow=True`
        runs the distilled no-CFG solver with (t, r) conditioning
        (reference chatterbox_turbo/models/s3gen/flow_matching.py:86-117).
        """
        B, T = mu.shape[0], mu.shape[1]
        # ODE state stays f32 end-to-end (the Euler accumulation over
        # n_timesteps loses low bits in bf16); the estimator itself runs in
        # mu's (the model's) dtype — the solvers cast at its boundary.
        z = jax.random.normal(key, (B, T, self.MEL_CHANNELS),
                              jnp.float32) * temperature
        t_span = jnp.linspace(0.0, 1.0, n_timesteps + 1)
        if not meanflow and self.t_scheduler == "cosine":
            t_span = 1.0 - jnp.cos(t_span * 0.5 * math.pi)
        if meanflow:
            return self.solve_euler_meanflow(z, t_span, mu, mask, spks,
                                             cond, streaming=streaming), None
        return self.solve_euler(z, t_span, mu, mask, spks, cond,
                                streaming=streaming), None

    def solve_euler_meanflow(self, x, t_span, mu, mask, spks, cond,
                             streaming: bool = False) -> jnp.ndarray:
        """Distilled 1-2 step solver, no CFG."""
        B = x.shape[0]
        n_steps = t_span.shape[0] - 1

        cdt = mu.dtype

        def step(i, x):
            t = t_span[i]
            r = t_span[i + 1]
            dxdt = self.estimator(x.astype(cdt), mask, mu,
                                  jnp.full((B,), t, cdt),
                                  spks, cond, streaming=streaming,
                                  r=jnp.full((B,), r, cdt))
            return x + (r - t) * dxdt.astype(x.dtype)

        return jax.lax.fori_loop(0, n_steps, step,
                                 x.astype(jnp.float32)).astype(cdt)

    def solve_euler(self, x, t_span, mu, mask, spks, cond,
                    streaming: bool = False) -> jnp.ndarray:
        """CFG Euler integration (reference flow_matching.py:87-158)."""
        B, T = x.shape[0], x.shape[1]
        n_steps = t_span.shape[0] - 1

        mask_in = jnp.concatenate([mask, mask], axis=0)
        mu_in = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
        spks_in = (jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
                   if spks is not None else None)
        cond_in = (jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
                   if cond is not None else None)
        cfg = self.inference_cfg_rate

        cdt = mu.dtype

        def step(i, x):
            t = t_span[i]
            dt = t_span[i + 1] - t
            x_in = jnp.concatenate([x, x], axis=0).astype(cdt)
            t_in = jnp.full((2 * B,), t, cdt)
            dphi = self.estimator(x_in, mask_in, mu_in, t_in, spks_in,
                                  cond_in, streaming=streaming
                                  ).astype(x.dtype)
            dphi = (1.0 + cfg) * dphi[:B] - cfg * dphi[B:]
            return x + dt * dphi

        return jax.lax.fori_loop(0, n_steps, step,
                                 x.astype(jnp.float32)).astype(cdt)

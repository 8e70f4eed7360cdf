"""Echo-TTS: DiT flow model over Fish-S1-DAC PCA latents with dual CFG.

TPU-native re-implementation of the reference
mlx_audio/tts/models/echo_tts/ (model.py, sampling.py, text.py, audio.py,
config.py, echo_tts.py). The Euler CFG sampler runs as one jitted
`lax.fori_loop` over the full t-schedule — the 3-way CFG batch
(cond / text-uncond / speaker-uncond) is kept static-shape and the
guidance blend is gated by the per-step CFG window instead of the
reference's dynamic batch switching.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Generator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....nn import layers as nn
from ....nn.module import Module
from ..base import GenerationResult, format_duration

__all__ = ["Model", "ModelConfig", "EchoDiT", "EchoDiTConfig",
           "SamplerConfig", "tokenizer_encode", "normalize_text_prompt",
           "PCAState"]


# ---------------------------------------------------------------------------
# configs (reference config.py)
# ---------------------------------------------------------------------------
@dataclass
class EchoDiTConfig:
    latent_size: int = 80
    model_size: int = 2048
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 5888
    norm_eps: float = 1e-5
    text_vocab_size: int = 256
    text_model_size: int = 1280
    text_num_layers: int = 14
    text_num_heads: int = 10
    text_intermediate_size: int = 3328
    speaker_patch_size: int = 4
    speaker_model_size: int = 1280
    speaker_num_layers: int = 14
    speaker_num_heads: int = 10
    speaker_intermediate_size: int = 3328
    timestep_embed_size: int = 512
    adaln_rank: int = 256

    @classmethod
    def from_dict(cls, d):
        return cls(**{k: v for k, v in d.items()
                      if k in cls.__dataclass_fields__})


@dataclass
class SamplerConfig:
    num_steps: int = 40
    cfg_scale_text: float = 3.0
    cfg_scale_speaker: float = 8.0
    cfg_min_t: float = 0.5
    cfg_max_t: float = 1.0
    truncation_factor: Optional[float] = None
    sequence_length: int = 640

    @classmethod
    def from_dict(cls, d):
        return cls(**{k: v for k, v in d.items()
                      if k in cls.__dataclass_fields__})


@dataclass
class ModelConfig:
    model_type: str = "echo_tts"
    sample_rate: int = 44100
    max_text_length: int = 768
    max_speaker_latent_length: int = 6400
    audio_downsample_factor: int = 2048
    normalize_text: bool = True
    model_path: Optional[str] = None
    dit: EchoDiTConfig = field(default_factory=EchoDiTConfig)
    sampler: SamplerConfig = field(default_factory=SamplerConfig)

    @classmethod
    def from_dict(cls, d):
        return cls(
            model_type=d.get("model_type", "echo_tts"),
            sample_rate=d.get("sample_rate", 44100),
            max_text_length=d.get("max_text_length", 768),
            max_speaker_latent_length=d.get("max_speaker_latent_length",
                                            6400),
            normalize_text=d.get("normalize_text", True),
            model_path=d.get("model_path"),
            dit=EchoDiTConfig.from_dict(d.get("dit", {})),
            sampler=SamplerConfig.from_dict(d.get("sampler", {})),
        )


# ---------------------------------------------------------------------------
# text (reference text.py)
# ---------------------------------------------------------------------------
def normalize_text_prompt(text: str) -> str:
    for old, new in [("…", "..."), ("’", "'"), ("”", '"'), ("\n", " "),
                     (":", ","), (";", ","), ("—", ", ")]:
        text = text.replace(old, new)
    if (not text.startswith("[") and not text.startswith("(")
            and "S1" not in text and "S2" not in text):
        text = "[S1] " + text
    return text


def tokenizer_encode(text: str, append_bos: bool = True,
                     normalize: bool = True) -> np.ndarray:
    if normalize:
        text = normalize_text_prompt(text)
    tokens = list(text.encode("utf-8"))
    if append_bos:
        tokens.insert(0, 0)
    return np.asarray(tokens, np.int32)


# ---------------------------------------------------------------------------
# layers (reference model.py)
# ---------------------------------------------------------------------------
def _rope_tables(dim: int, end: int, theta: float = 10000.0):
    freqs = 1.0 / theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32)[: dim // 2]
                            / dim)
    ang = jnp.outer(jnp.arange(end, dtype=jnp.float32), freqs)
    return jnp.cos(ang), jnp.sin(ang)


def _apply_rope(x, cos, sin):
    """Interleaved pairs; x (B, T, H, D); cos/sin (T, D/2)."""
    xe, xo = x[..., 0::2], x[..., 1::2]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return jnp.stack([xe * c - xo * s, xo * c + xe * s],
                     axis=-1).reshape(x.shape)


def get_timestep_embedding(t, embed_size: int):
    half = embed_size // 2
    freqs = 1000.0 * jnp.exp(-math.log(10000.0)
                             * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[..., None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class EchoRMSNorm(Module):
    def __init__(self, shape, eps: float):
        if isinstance(shape, int):
            shape = (shape,)
        self.weight = jnp.ones(shape)
        self.eps = eps

    def __call__(self, x):
        x32 = x.astype(jnp.float32)
        y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True)
                                + self.eps)
        return (y * self.weight).astype(x.dtype)


class LowRankAdaLN(Module):
    """reference model.py:61-87."""

    def __init__(self, model_size: int, rank: int, eps: float):
        self.eps = eps
        self.shift_down = nn.Linear(model_size, rank, bias=False)
        self.scale_down = nn.Linear(model_size, rank, bias=False)
        self.gate_down = nn.Linear(model_size, rank, bias=False)
        self.shift_up = nn.Linear(rank, model_size)
        self.scale_up = nn.Linear(rank, model_size)
        self.gate_up = nn.Linear(rank, model_size)

    def __call__(self, x, cond_embed):
        shift, scale, gate = jnp.split(cond_embed, 3, axis=-1)
        shift = self.shift_up(self.shift_down(jax.nn.silu(shift))) + shift
        scale = self.scale_up(self.scale_down(jax.nn.silu(scale))) + scale
        gate = self.gate_up(self.gate_down(jax.nn.silu(gate))) + gate
        x32 = x.astype(jnp.float32)
        x32 = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True)
                                  + self.eps)
        return (x32 * (scale + 1.0) + shift).astype(x.dtype), jnp.tanh(gate)


class MLP(Module):
    def __init__(self, model_size: int, intermediate_size: int):
        self.w1 = nn.Linear(model_size, intermediate_size, bias=False)
        self.w3 = nn.Linear(model_size, intermediate_size, bias=False)
        self.w2 = nn.Linear(intermediate_size, model_size, bias=False)

    def __call__(self, x):
        return self.w2(jax.nn.silu(self.w1(x)) * self.w3(x))


class SelfAttention(Module):
    """Gated attention with qk-norm (reference model.py:105-177)."""

    def __init__(self, model_size: int, num_heads: int, is_causal: bool,
                 norm_eps: float):
        self.num_heads = num_heads
        self.is_causal = is_causal
        self.head_dim = model_size // num_heads
        self.wq = nn.Linear(model_size, model_size, bias=False)
        self.wk = nn.Linear(model_size, model_size, bias=False)
        self.wv = nn.Linear(model_size, model_size, bias=False)
        self.wo = nn.Linear(model_size, model_size, bias=False)
        self.gate = nn.Linear(model_size, model_size, bias=False)
        self.q_norm = EchoRMSNorm((num_heads, self.head_dim), norm_eps)
        self.k_norm = EchoRMSNorm((num_heads, self.head_dim), norm_eps)

    def __call__(self, x, mask, rope):
        B, T, _ = x.shape
        H, D = self.num_heads, self.head_dim
        q = self.q_norm(self.wq(x).reshape(B, T, H, D))
        k = self.k_norm(self.wk(x).reshape(B, T, H, D))
        v = self.wv(x).reshape(B, T, H, D)
        gate = self.gate(x)
        cos, sin = rope
        q = _apply_rope(q, cos[:T], sin[:T])
        k = _apply_rope(k, cos[:T], sin[:T])
        ok = jnp.ones((B, T, T), bool)
        if mask is not None:
            ok = ok & mask[:, None, :]
        if self.is_causal:
            ok = ok & (jnp.arange(T)[:, None] >= jnp.arange(T)[None, :])[None]
        bias = jnp.where(ok, 0.0, -1e9)[:, None]
        q, k, v = (a.transpose(0, 2, 1, 3) for a in (q, k, v))
        scores = q @ k.transpose(0, 1, 3, 2) / math.sqrt(D) + bias
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        o = (attn @ v).transpose(0, 2, 1, 3).reshape(B, T, -1)
        return self.wo(o * jax.nn.sigmoid(gate))


class JointAttention(Module):
    """Latent queries over [self ‖ text KV ‖ speaker KV]
    (reference model.py:179-339)."""

    def __init__(self, model_size: int, num_heads: int,
                 text_model_size: int, speaker_model_size: int,
                 speaker_patch_size: int, norm_eps: float):
        self.num_heads = num_heads
        self.head_dim = model_size // num_heads
        self.speaker_patch_size = speaker_patch_size
        self.wq = nn.Linear(model_size, model_size, bias=False)
        self.wk = nn.Linear(model_size, model_size, bias=False)
        self.wv = nn.Linear(model_size, model_size, bias=False)
        self.wk_text = nn.Linear(text_model_size, model_size, bias=False)
        self.wv_text = nn.Linear(text_model_size, model_size, bias=False)
        self.wk_speaker = nn.Linear(speaker_model_size, model_size,
                                    bias=False)
        self.wv_speaker = nn.Linear(speaker_model_size, model_size,
                                    bias=False)
        self.q_norm = EchoRMSNorm((num_heads, self.head_dim), norm_eps)
        self.k_norm = EchoRMSNorm((num_heads, self.head_dim), norm_eps)
        self.gate = nn.Linear(model_size, model_size, bias=False)
        self.wo = nn.Linear(model_size, model_size, bias=False)

    def _rope_half(self, y, rope):
        """Rotate the first half of the heads only
        (reference model.py:222-228)."""
        half = y.shape[-2] // 2
        cos, sin = rope
        y1 = _apply_rope(y[..., :half, :], cos, sin)
        return jnp.concatenate([y1, y[..., half:, :]], axis=-2)

    def __call__(self, x, text_mask, speaker_mask, rope, kv_text,
                 kv_speaker):
        B, T, _ = x.shape
        H, D = self.num_heads, self.head_dim
        q = self.q_norm(self.wq(x).reshape(B, T, H, D))
        k_self = self.k_norm(self.wk(x).reshape(B, T, H, D))
        v_self = self.wv(x).reshape(B, T, H, D)
        gate = self.gate(x)
        cos, sin = rope
        q = self._rope_half(q, (cos[:T], sin[:T]))
        k_self = self._rope_half(k_self, (cos[:T], sin[:T]))

        k_text, v_text = kv_text
        k_spk, v_spk = kv_speaker
        k = jnp.concatenate([k_self, k_text, k_spk], axis=1)
        v = jnp.concatenate([v_self, v_text, v_spk], axis=1)
        key_mask = jnp.concatenate(
            [jnp.ones((B, T), bool), text_mask, speaker_mask], axis=1)
        bias = jnp.where(key_mask, 0.0, -1e9)[:, None, None, :]

        q, k, v = (a.transpose(0, 2, 1, 3) for a in (q, k, v))
        scores = q @ k.transpose(0, 1, 3, 2) / math.sqrt(D) + bias
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        o = (attn @ v).transpose(0, 2, 1, 3).reshape(B, T, -1)
        return self.wo(o * jax.nn.sigmoid(gate))

    def kv_text(self, text_state):
        B, T, _ = text_state.shape
        k = self.k_norm(self.wk_text(text_state).reshape(
            B, T, self.num_heads, self.head_dim))
        v = self.wv_text(text_state).reshape(B, T, self.num_heads,
                                             self.head_dim)
        return k, v

    def kv_speaker(self, speaker_state):
        B, T, _ = speaker_state.shape
        k = self.k_norm(self.wk_speaker(speaker_state).reshape(
            B, T, self.num_heads, self.head_dim))
        v = self.wv_speaker(speaker_state).reshape(B, T, self.num_heads,
                                                   self.head_dim)
        return k, v


class EncoderTransformerBlock(Module):
    def __init__(self, model_size, num_heads, intermediate_size, norm_eps,
                 is_causal):
        self.attention = SelfAttention(model_size, num_heads, is_causal,
                                       norm_eps)
        self.mlp = MLP(model_size, intermediate_size)
        self.attention_norm = EchoRMSNorm(model_size, norm_eps)
        self.mlp_norm = EchoRMSNorm(model_size, norm_eps)

    def __call__(self, x, mask, rope):
        x = x + self.attention(self.attention_norm(x), mask, rope)
        return x + self.mlp(self.mlp_norm(x))


class TransformerBlock(Module):
    def __init__(self, cfg: EchoDiTConfig):
        self.attention = JointAttention(
            cfg.model_size, cfg.num_heads, cfg.text_model_size,
            cfg.speaker_model_size, cfg.speaker_patch_size, cfg.norm_eps)
        self.mlp = MLP(cfg.model_size, cfg.intermediate_size)
        self.attention_adaln = LowRankAdaLN(cfg.model_size, cfg.adaln_rank,
                                            cfg.norm_eps)
        self.mlp_adaln = LowRankAdaLN(cfg.model_size, cfg.adaln_rank,
                                      cfg.norm_eps)

    def __call__(self, x, cond_embed, text_mask, speaker_mask, rope,
                 kv_text, kv_speaker):
        x_norm, gate = self.attention_adaln(x, cond_embed)
        x = x + gate * self.attention(x_norm, text_mask, speaker_mask, rope,
                                      kv_text, kv_speaker)
        x_norm, gate = self.mlp_adaln(x, cond_embed)
        return x + gate * self.mlp(x_norm)


class TextEncoder(Module):
    def __init__(self, cfg: EchoDiTConfig):
        self.text_embedding = nn.Embedding(cfg.text_vocab_size,
                                           cfg.text_model_size)
        self.blocks = [
            EncoderTransformerBlock(cfg.text_model_size, cfg.text_num_heads,
                                    cfg.text_intermediate_size,
                                    cfg.norm_eps, is_causal=True)
            for _ in range(cfg.text_num_layers)
        ]
        self.head_dim = cfg.text_model_size // cfg.text_num_heads

    def __call__(self, input_ids, mask=None):
        x = self.text_embedding(input_ids)
        rope = _rope_tables(self.head_dim, input_ids.shape[1])
        for block in self.blocks:
            x = block(x, mask, rope)
        return x


class SpeakerEncoder(Module):
    def __init__(self, cfg: EchoDiTConfig):
        self.patch_size = cfg.speaker_patch_size
        self.in_proj = nn.Linear(cfg.latent_size * cfg.speaker_patch_size,
                                 cfg.speaker_model_size)
        self.blocks = [
            EncoderTransformerBlock(cfg.speaker_model_size,
                                    cfg.speaker_num_heads,
                                    cfg.speaker_intermediate_size,
                                    cfg.norm_eps, is_causal=False)
            for _ in range(cfg.speaker_num_layers)
        ]
        self.head_dim = cfg.speaker_model_size // cfg.speaker_num_heads

    def __call__(self, latent):
        B, T, L = latent.shape
        Tp = (T // self.patch_size) * self.patch_size
        x = latent[:, :Tp].reshape(B, Tp // self.patch_size,
                                   L * self.patch_size)
        x = self.in_proj(x) / 6.0
        rope = _rope_tables(self.head_dim, x.shape[1])
        for block in self.blocks:
            x = block(x, None, rope)
        return x


class EchoDiT(Module):
    """reference model.py:516-710."""

    def __init__(self, cfg: EchoDiTConfig):
        self.cfg = cfg
        self.text_encoder = TextEncoder(cfg)
        self.speaker_encoder = SpeakerEncoder(cfg)
        self.text_norm = EchoRMSNorm(cfg.text_model_size, cfg.norm_eps)
        self.speaker_norm = EchoRMSNorm(cfg.speaker_model_size, cfg.norm_eps)
        self.cond_module = nn.Sequential(
            nn.Linear(cfg.timestep_embed_size, cfg.model_size, bias=False),
            nn.SiLU(),
            nn.Linear(cfg.model_size, cfg.model_size, bias=False),
            nn.SiLU(),
            nn.Linear(cfg.model_size, cfg.model_size * 3, bias=False),
        )
        self.in_proj = nn.Linear(cfg.latent_size, cfg.model_size)
        self.blocks = [TransformerBlock(cfg) for _ in range(cfg.num_layers)]
        self.out_norm = EchoRMSNorm(cfg.model_size, cfg.norm_eps)
        self.out_proj = nn.Linear(cfg.model_size, cfg.latent_size)
        self.head_dim = cfg.model_size // cfg.num_heads

    def get_kv_cache_text(self, text_input_ids, text_mask):
        state = self.text_norm(self.text_encoder(text_input_ids, text_mask))
        return [b.attention.kv_text(state) for b in self.blocks]

    def get_kv_cache_speaker(self, speaker_latent):
        state = self.speaker_norm(self.speaker_encoder(speaker_latent))
        return [b.attention.kv_speaker(state) for b in self.blocks]

    def __call__(self, x, t, text_mask, speaker_mask, kv_cache_text,
                 kv_cache_speaker):
        rope = _rope_tables(self.head_dim, x.shape[1])
        speaker_mask = speaker_mask[..., :: self.cfg.speaker_patch_size]
        cond = self.cond_module(
            get_timestep_embedding(t, self.cfg.timestep_embed_size))[:, None]
        x = self.in_proj(x)
        for i, block in enumerate(self.blocks):
            x = block(x, cond, text_mask, speaker_mask, rope,
                      kv_cache_text[i], kv_cache_speaker[i])
        return self.out_proj(self.out_norm(x)).astype(jnp.float32)


# ---------------------------------------------------------------------------
# sampler (reference sampling.py:54-161), one dispatch
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnames=("num_steps", "sequence_length",
                                   "cfg_scale_text", "cfg_scale_speaker",
                                   "cfg_min_t", "cfg_max_t", "trunc"))
def _sample_euler_cfg(model: EchoDiT, text_ids, text_mask, speaker_latent,
                      speaker_mask, key, num_steps: int,
                      sequence_length: int, cfg_scale_text: float,
                      cfg_scale_speaker: float, cfg_min_t: float,
                      cfg_max_t: float, trunc: float, x_init=None):
    B = text_ids.shape[0]
    L = model.cfg.latent_size
    kv_text = model.get_kv_cache_text(text_ids, text_mask)
    kv_speaker = model.get_kv_cache_speaker(speaker_latent)
    kv_text3 = [(jnp.concatenate([k] * 3), jnp.concatenate([v] * 3))
                for k, v in kv_text]
    kv_spk3 = [(jnp.concatenate([k] * 3), jnp.concatenate([v] * 3))
               for k, v in kv_speaker]
    tm3 = jnp.concatenate([text_mask, jnp.zeros_like(text_mask), text_mask])
    sm3 = jnp.concatenate([speaker_mask, speaker_mask,
                           jnp.zeros_like(speaker_mask)])

    t_sched = jnp.linspace(0.999, 0.0, num_steps + 1)
    # x_init: per-row noise prepared by the serving batcher (each row
    # drawn from its own request key, so batched rows == solo runs)
    x_t = (x_init if x_init is not None
           else jax.random.normal(key, (B, sequence_length, L)) * trunc)

    def step(i, x_t):
        t = t_sched[i]
        t_next = t_sched[i + 1]
        x3 = jnp.concatenate([x_t] * 3, axis=0)
        t3 = jnp.full((B * 3,), t, jnp.float32)
        out = model(x3, t3, tm3, sm3, kv_text3, kv_spk3)
        v_cond, v_ut, v_us = jnp.split(out, 3, axis=0)
        v_cfg = (v_cond + cfg_scale_text * (v_cond - v_ut)
                 + cfg_scale_speaker * (v_cond - v_us))
        has_cfg = (t >= cfg_min_t) & (t <= cfg_max_t)
        v_pred = jnp.where(has_cfg, v_cfg, v_cond)
        return x_t + v_pred * (t_next - t)

    return jax.lax.fori_loop(0, num_steps, step, x_t)


# ---------------------------------------------------------------------------
# PCA latent bridge (reference audio.py)
# ---------------------------------------------------------------------------
@dataclass
class PCAState:
    pca_components: jnp.ndarray
    pca_mean: jnp.ndarray
    latent_scale: float


class Model(Module):
    """reference echo_tts.py:30-241."""

    _RUNTIME: dict = {}

    def __init__(self, config: Any = None):
        if isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        self.config = config or ModelConfig()
        self.sample_rate = self.config.sample_rate
        self.model = EchoDiT(self.config.dit)

    @property
    def latent_size(self) -> int:
        return self.config.dit.latent_size

    def set_runtime(self, fish_ae=None, pca_state=None):
        rt = Model._RUNTIME.setdefault(id(self), {})
        if fish_ae is not None:
            rt["fish_ae"] = fish_ae
        if pca_state is not None:
            rt["pca_state"] = pca_state

    def _resolve_codec(self) -> dict:
        """Lazy codec bridge wiring (reference echo_tts.py:81-89):
        pca_state.safetensors next to the weights, Fish S1 DAC from its
        published repo."""
        rt = Model._RUNTIME.setdefault(id(self), {})
        mp = getattr(self.config, "model_path", None)
        if "pca_state" not in rt and mp:
            from pathlib import Path

            pca = Path(mp) / "pca_state.safetensors"
            if pca.exists():
                from safetensors.numpy import load_file

                t = load_file(str(pca))
                rt["pca_state"] = PCAState(
                    pca_components=jnp.asarray(t["pca_components"]),
                    pca_mean=jnp.asarray(t["pca_mean"]),
                    latent_scale=float(np.asarray(t["latent_scale"])))
        if "fish_ae" not in rt and "pca_state" in rt:
            from ....codec.models.fish_s1_dac.fish_s1_dac import \
                from_pretrained as _fish_fp

            try:
                rt["fish_ae"] = _fish_fp()
            except Exception as exc:
                raise RuntimeError(
                    "Echo-TTS could not fetch the Fish S1 DAC codec "
                    "(jordand/fish-s1-dac-min); pass one via "
                    "set_runtime(fish_ae=...)") from exc
        return rt

    def _prepare_text(self, text: str):
        ids = tokenizer_encode(text, normalize=self.config.normalize_text)
        ids = ids[: self.config.max_text_length]
        return (jnp.asarray(ids[None]),
                jnp.ones((1, ids.shape[0]), bool))

    def make_batcher(self, **kwargs):
        """Serving batcher: concurrent same-length requests' DiT samplers
        stack into ONE fused euler-CFG integration (per-row noise keys
        keep batched == solo); codec decode stays per-request."""
        return EchoBatcher(self, **kwargs)

    def generate_latents(self, text: str, speaker_latent=None,
                         speaker_mask=None, rng_seed: int = 0,
                         **kwargs) -> jnp.ndarray:
        ids, mask = self._prepare_text(text)
        ps = self.config.dit.speaker_patch_size
        if speaker_latent is None:
            speaker_latent = jnp.zeros((1, ps, self.latent_size))
        if speaker_mask is None:
            speaker_mask = jnp.zeros((1, speaker_latent.shape[1]), bool)
        sc = self.config.sampler
        num_steps = int(kwargs.get("num_steps", sc.num_steps))
        seq_len = int(kwargs.get("sequence_length", sc.sequence_length))
        # under a running server an EchoBatcher may be installed:
        # concurrent same-shape requests fuse into one DiT integration.
        # Per-request sampler OVERRIDES (cfg scales / t-window /
        # truncation) fall back to the single-request path — the batcher
        # compiles one executable at the config defaults.
        defaults = (
            float(kwargs.get("cfg_scale_text",
                             sc.cfg_scale_text)) == float(sc.cfg_scale_text)
            and float(kwargs.get("cfg_scale_speaker", sc.cfg_scale_speaker)
                      ) == float(sc.cfg_scale_speaker)
            and float(kwargs.get("cfg_min_t",
                                 sc.cfg_min_t)) == float(sc.cfg_min_t)
            and float(kwargs.get("cfg_max_t",
                                 sc.cfg_max_t)) == float(sc.cfg_max_t)
            and float(kwargs.get("truncation_factor") or 0.96) == 0.96
        )
        if not kwargs.get("_direct") and defaults:
            from ....serving import get_infer_hook

            hook = get_infer_hook(self)
            if hook is not None:
                return hook(np.asarray(ids), np.asarray(mask),
                            np.asarray(speaker_latent),
                            np.asarray(speaker_mask), int(rng_seed),
                            num_steps, seq_len)
        return _sample_euler_cfg(
            self.model, ids, mask, jnp.asarray(speaker_latent),
            jnp.asarray(speaker_mask), jax.random.PRNGKey(rng_seed),
            num_steps, seq_len,
            float(kwargs.get("cfg_scale_text", sc.cfg_scale_text)),
            float(kwargs.get("cfg_scale_speaker", sc.cfg_scale_speaker)),
            float(kwargs.get("cfg_min_t", sc.cfg_min_t)),
            float(kwargs.get("cfg_max_t", sc.cfg_max_t)),
            float(kwargs.get("truncation_factor") or 0.96))

    # ---- codec bridge (reference audio.py:28-119) ----
    def ae_encode(self, audio) -> jnp.ndarray:
        rt = Model._RUNTIME.get(id(self), {})
        fish, pca = rt.get("fish_ae"), rt.get("pca_state")
        codes = fish.encode(jnp.asarray(audio))
        z_sem = fish.quantizer.semantic_quantizer.from_codes(codes[:, :1])
        z_res = fish.quantizer.quantizer.from_codes(codes[:, 1:])
        z = z_sem + z_res  # (B, T, 1024)
        z = (z - pca.pca_mean) @ pca.pca_components.T
        return z * pca.latent_scale

    def ae_decode(self, z_q) -> jnp.ndarray:
        rt = Model._RUNTIME.get(id(self), {})
        fish, pca = rt.get("fish_ae"), rt.get("pca_state")
        z = (z_q / pca.latent_scale) @ pca.pca_components + pca.pca_mean
        z = fish.quantizer._post(z)
        for conv, cnx in fish.quantizer.upsample:
            z = cnx(conv(z))
        return fish.decoder(z)

    @staticmethod
    def find_flattening_point(latent: np.ndarray, target_value: float = 0.0,
                              window_size: int = 20,
                              std_threshold: float = 0.05) -> int:
        """First frame index where the latent flattens out (a window of
        near-constant frames at `target_value`) — the end of actual speech
        in the fixed-length DiT output (reference echo_tts/audio.py:44-61).
        Vectorized sliding-window mean/std instead of the reference's
        python loop."""
        latent = np.asarray(latent, np.float32)
        T, L = latent.shape
        padded = np.concatenate(
            [latent, np.zeros((window_size, L), np.float32)], axis=0)
        # sliding windows over axis 0: (T, window_size, L)
        win = np.lib.stride_tricks.sliding_window_view(
            padded, window_size, axis=0)[:T]  # (T, L, window_size)
        means = win.mean(axis=(1, 2))
        stds = win.std(axis=(1, 2))
        hits = np.flatnonzero(
            (stds < std_threshold) & (np.abs(means - target_value) < 0.1))
        return int(hits[0]) if hits.size else T

    def crop_audio_to_flattening_point(self, audio: np.ndarray,
                                       latent: np.ndarray) -> np.ndarray:
        """Trim trailing silence: crop decoded audio at the latent
        flattening point × the codec downsample factor (2048)
        (reference echo_tts/audio.py:64-67)."""
        return audio[..., : self.find_flattening_point(latent) * 2048]

    def generate(self, text: str, ref_audio=None, rng_seed: int = 0,
                 voice: Optional[str] = None, stream: bool = False,
                 **kwargs) -> Generator[GenerationResult, None, None]:
        # voice is accepted-unused and stream raises, matching the
        # reference echo_tts.py:157-166
        if stream:
            raise NotImplementedError(
                "Echo-TTS streaming is not implemented yet.")
        rt = self._resolve_codec()
        if "fish_ae" not in rt or "pca_state" not in rt:
            raise ValueError("Echo-TTS requires fish_ae and pca_state — "
                             "call set_runtime(...) or load via "
                             "load_model()")
        start = time.perf_counter()
        speaker_latent = speaker_mask = None
        if ref_audio is not None:
            audio = np.asarray(ref_audio, np.float32).reshape(1, -1)
            lat = self.ae_encode(audio)
            ps = self.config.dit.speaker_patch_size
            n = (lat.shape[1] // ps) * ps
            speaker_latent = lat[:, :n]
            speaker_mask = jnp.ones((1, n), bool)
        latents = self.generate_latents(text, speaker_latent, speaker_mask,
                                        rng_seed=rng_seed, **kwargs)
        audio_out = np.asarray(self.ae_decode(latents))[0, :, 0]
        # trim trailing silence past the latent flattening point
        # (reference echo_tts.py:209)
        audio_out = self.crop_audio_to_flattening_point(
            audio_out, np.asarray(latents[0]))
        elapsed = time.perf_counter() - start
        dur = len(audio_out) / self.sample_rate
        yield GenerationResult(
            audio=audio_out, samples=len(audio_out),
            sample_rate=self.sample_rate, segment_idx=0, token_count=0,
            audio_duration=format_duration(dur),
            real_time_factor=round(elapsed / max(dur, 1e-9), 2),
            prompt={}, audio_samples={},
            processing_time_seconds=elapsed, peak_memory_usage=0.0)


class EchoBatcher:
    """Cross-request batching for Echo-TTS: concurrent `generate_latents`
    calls whose (text length, speaker shape, sampler schedule) match stack
    into one fused euler-CFG integration (the DiT triplicates rows for
    text/speaker CFG, so a group of B requests is one 3B-row program).
    Each row's initial noise is drawn from its own request key with the
    solo shape, so batched latents are bitwise-equal to running alone."""

    def __init__(self, model, max_batch: int = 4, window_ms: float = 10.0):
        from ....serving import BatchScheduler

        self.model = model
        self.sched = BatchScheduler(
            self._run, self._key, max_batch=max_batch, window_ms=window_ms)

    @staticmethod
    def _key(item):
        ids, mask, spk, spk_mask, _seed, num_steps, seq_len = item
        return (ids.shape, spk.shape, num_steps, seq_len)

    def _run(self, items):
        sc = self.model.config.sampler
        L = self.model.latent_size
        ids = jnp.concatenate([jnp.asarray(it[0]) for it in items])
        mask = jnp.concatenate([jnp.asarray(it[1]) for it in items])
        spk = jnp.concatenate([jnp.asarray(it[2]) for it in items])
        spk_mask = jnp.concatenate([jnp.asarray(it[3]) for it in items])
        num_steps, seq_len = items[0][5], items[0][6]
        trunc = 0.96
        x0 = jnp.concatenate([
            jax.random.normal(jax.random.PRNGKey(it[4]),
                              (1, seq_len, L)) * trunc
            for it in items])
        out = _sample_euler_cfg(
            self.model.model, ids, mask, spk, spk_mask,
            jax.random.PRNGKey(0), num_steps, seq_len,
            float(sc.cfg_scale_text), float(sc.cfg_scale_speaker),
            float(sc.cfg_min_t), float(sc.cfg_max_t), trunc, x_init=x0)
        return [out[i: i + 1] for i in range(len(items))]

    def __call__(self, *item):
        return self.sched(tuple(item))

    def install(self):
        from ....serving import register_infer_hook

        register_infer_hook(self.model, self)
        return self

    def close(self):
        from ....serving import unregister_infer_hook

        unregister_infer_hook(self.model)
        self.sched.close()

    @property
    def dispatch_count(self) -> int:
        return self.sched.dispatch_count

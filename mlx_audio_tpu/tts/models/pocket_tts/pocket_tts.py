"""PocketTTS: flow-matching LM over continuous Mimi latents.

TPU-native re-implementation of the reference
mlx_audio/tts/models/pocket_tts/ (flow_lm.py, mlp.py, transformer.py,
rope.py, conditioners.py, mimi.py, pocket_tts.py). The reference runs one
flow-LM step (plus LSD flow integration) per host round-trip; here the
whole utterance — prefill over [audio-prompt ‖ text] conditioning, the
per-frame transformer step, the K-step LSD flow solve, EOS detection, and
the frames-after-EOS tail — runs as a single `lax.while_loop` on device.
Latents are then decoded to audio through the (RVQ-free) Mimi decoder in
one jitted pass.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Generator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....codec.models.mimi.mimi import (
    Mimi,
    MimiConfig,
    ProjectedTransformer,
    SeanetDecoder,
    SeanetEncoder,
    StreamableConv1d,
    StreamableConvTranspose1d,
    TransformerConfig,
)
from ....lm.cache import KVCache
from ....nn import layers as nn
from ....nn.module import Module
from ..base import GenerationResult, format_duration

__all__ = ["Model", "FlowLMModel", "SimpleMLPAdaLN", "lsd_decode",
           "FlowLMConfig", "ModelConfig"]


# ---------------------------------------------------------------------------
# configs (reference config.py)
# ---------------------------------------------------------------------------
@dataclass
class FlowConfig:
    dim: int = 512
    depth: int = 6


@dataclass
class FlowLMTransformerConfig:
    hidden_scale: int = 4
    max_period: int = 10000
    d_model: int = 512
    num_heads: int = 8
    num_layers: int = 6


@dataclass
class LookupTable:
    dim: int = 512
    n_bins: int = 4000
    tokenizer: str = "sentencepiece"
    tokenizer_path: str = ""


@dataclass
class FlowLMConfig:
    flow: FlowConfig = field(default_factory=FlowConfig)
    transformer: FlowLMTransformerConfig = field(
        default_factory=FlowLMTransformerConfig)
    lookup_table: LookupTable = field(default_factory=LookupTable)
    dtype: Optional[str] = None

    @classmethod
    def from_dict(cls, d: dict) -> "FlowLMConfig":
        def sub(c, key):
            return c(**{k: v for k, v in d.get(key, {}).items()
                        if k in c.__dataclass_fields__})
        return cls(flow=sub(FlowConfig, "flow"),
                   transformer=sub(FlowLMTransformerConfig, "transformer"),
                   lookup_table=sub(LookupTable, "lookup_table"),
                   dtype=d.get("dtype"))


@dataclass
class ModelConfig:
    model_type: str = "pocket_tts"
    sample_rate: int = 24000
    latent_dim: int = 32
    flow_lm: FlowLMConfig = field(default_factory=FlowLMConfig)
    mimi: Optional[MimiConfig] = None
    lsd_decode_steps: int = 1
    temp: float = 1.0
    noise_clamp: Optional[float] = None
    eos_threshold: float = 0.0
    model_path: Optional[str] = None

    @classmethod
    def from_dict(cls, d: dict) -> "ModelConfig":
        return cls(
            model_type=d.get("model_type", "pocket_tts"),
            sample_rate=d.get("sample_rate", 24000),
            latent_dim=d.get("latent_dim", 32),
            flow_lm=FlowLMConfig.from_dict(d.get("flow_lm", {})),
            lsd_decode_steps=d.get("lsd_decode_steps", 1),
            temp=d.get("temp", 1.0),
            noise_clamp=d.get("noise_clamp"),
            eos_threshold=d.get("eos_threshold", 0.0),
            model_path=d.get("model_path"),
        )


# ---------------------------------------------------------------------------
# AdaLN flow net (reference mlp.py)
# ---------------------------------------------------------------------------
class PTRMSNorm(Module):
    """RMSNorm with Bessel-corrected variance (reference mlp.py:13-29)."""

    def __init__(self, dim: int, eps: float = 1e-5):
        self.alpha = jnp.ones((dim,))
        self.eps = eps

    def __call__(self, x):
        x32 = x.astype(jnp.float32)
        var = self.eps + jnp.var(x32, axis=-1, keepdims=True, ddof=1)
        return (x32 * (self.alpha * jax.lax.rsqrt(var))).astype(x.dtype)


class TimestepEmbedder(Module):
    """reference mlp.py:52-82."""

    def __init__(self, hidden_size: int, frequency_embedding_size: int = 256,
                 max_period: int = 10000):
        half = frequency_embedding_size // 2
        self._freqs = jnp.exp(-math.log(max_period)
                              * jnp.arange(half, dtype=jnp.float32) / half)
        self.mlp = nn.Sequential(
            nn.Linear(frequency_embedding_size, hidden_size),
            nn.SiLU(),
            nn.Linear(hidden_size, hidden_size),
            PTRMSNorm(hidden_size),
        )

    def __call__(self, t):
        if t.ndim == 1:
            t = t[:, None]
        args = t.astype(jnp.float32) * self._freqs[None, :]
        emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        return self.mlp(emb)


def modulate(x, shift, scale):
    return x * (1 + scale) + shift


class AdaLNResBlock(Module):
    """reference mlp.py:85-109."""

    def __init__(self, channels: int):
        self.in_ln = nn.LayerNorm(channels, eps=1e-6)
        self.mlp = nn.Sequential(nn.Linear(channels, channels), nn.SiLU(),
                                 nn.Linear(channels, channels))
        self.adaLN_modulation = nn.Sequential(
            nn.SiLU(), nn.Linear(channels, 3 * channels))

    def __call__(self, x, y):
        shift, scale, gate = jnp.split(self.adaLN_modulation(y), 3, axis=-1)
        h = self.mlp(modulate(self.in_ln(x), shift, scale))
        return x + gate * h


class FinalLayer(Module):
    """reference mlp.py:112-128."""

    def __init__(self, model_channels: int, out_channels: int):
        self.norm_final = nn.LayerNorm(model_channels, eps=1e-6, affine=False)
        self.linear = nn.Linear(model_channels, out_channels)
        self.adaLN_modulation = nn.Sequential(
            nn.SiLU(), nn.Linear(model_channels, 2 * model_channels))

    def __call__(self, x, c):
        shift, scale = jnp.split(self.adaLN_modulation(c), 2, axis=-1)
        return self.linear(modulate(self.norm_final(x), shift, scale))


class SimpleMLPAdaLN(Module):
    """Flow velocity net v(c, s, t, x) (reference mlp.py:131-186)."""

    def __init__(self, in_channels: int, model_channels: int,
                 out_channels: int, cond_channels: int,
                 num_res_blocks: int, num_time_conds: int = 2):
        self.model_channels = model_channels
        self.num_time_conds = num_time_conds
        self.time_embed = [TimestepEmbedder(model_channels)
                           for _ in range(num_time_conds)]
        self.cond_embed = nn.Linear(cond_channels, model_channels)
        self.input_proj = nn.Linear(in_channels, model_channels)
        self.res_blocks = [AdaLNResBlock(model_channels)
                           for _ in range(num_res_blocks)]
        self.final_layer = FinalLayer(model_channels, out_channels)

    def __call__(self, c, s, t, x):
        h = self.input_proj(x)
        t_comb = (self.time_embed[0](s) + self.time_embed[1](t)) / 2.0
        y = t_comb + self.cond_embed(c)
        for block in self.res_blocks:
            h = block(h, y)
        return self.final_layer(h, y)


def lsd_decode(v_t, x_0, num_steps: int = 1):
    """LSD flow integration (reference flow_lm.py:15-26); static unroll."""
    current = x_0
    shape = x_0[..., :1].shape
    for i in range(num_steps):
        s = jnp.full(shape, i / num_steps, x_0.dtype)
        t = jnp.full(shape, (i + 1) / num_steps, x_0.dtype)
        current = current + v_t(s, t, current) / num_steps
    return current


# ---------------------------------------------------------------------------
# streaming transformer (reference transformer.py, rope.py)
# ---------------------------------------------------------------------------
def _pocket_rope(q, k, pos):
    """Interleaved-pair rope with per-position angles
    (reference rope.py:7-40). q/k: (B, T, H, D); pos: (T,) shared or
    (B, T) per-row (slot batcher: each row decodes at its own absolute
    position)."""
    B, T, H, D = q.shape
    half = D // 2
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32)
                    * (-math.log(10000.0) * 2 / D))
    ts = (pos.astype(jnp.float32)[None, :, None, None] if pos.ndim == 1
          else pos.astype(jnp.float32)[:, :, None, None])
    ang = freqs[None, None, None, :] * ts
    cos, sin = jnp.cos(ang), jnp.sin(ang)

    def rot(x):
        xr = x.reshape(B, T, H, half, 2)
        r, i = xr[..., 0].astype(jnp.float32), xr[..., 1].astype(jnp.float32)
        outr = r * cos - i * sin
        outi = r * sin + i * cos
        return jnp.stack([outr, outi], axis=-1).reshape(B, T, H, D).astype(x.dtype)

    return rot(q), rot(k)


class StreamingTransformerLayer(Module):
    def __init__(self, d_model: int, num_heads: int, dim_feedforward: int):
        self.num_heads = num_heads
        self.head_dim = d_model // num_heads
        self.in_proj = nn.Linear(d_model, 3 * d_model, bias=False)
        self.out_proj = nn.Linear(d_model, d_model, bias=False)
        self.norm1 = nn.LayerNorm(d_model, eps=1e-5)
        self.norm2 = nn.LayerNorm(d_model, eps=1e-5)
        self.linear1 = nn.Linear(d_model, dim_feedforward, bias=False)
        self.linear2 = nn.Linear(dim_feedforward, d_model, bias=False)

    def __call__(self, x, cache: Optional[KVCache] = None, mask=None,
                 positions=None):
        B, T, D = x.shape
        h = self.norm1(x)
        qkv = self.in_proj(h).reshape(B, T, 3, self.num_heads, self.head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if positions is None:
            start = cache.pos if cache is not None else 0
            positions = start + jnp.arange(T)
        q, k = _pocket_rope(q, k, positions)
        q, k, v = (a.transpose(0, 2, 1, 3) for a in (q, k, v))
        new_cache = None
        if cache is not None:
            k, v, new_cache = cache.update(k, v)
            if mask is None:
                mask = cache.attention_mask(T)
        scores = (q @ k.transpose(0, 1, 3, 2)) * self.head_dim**-0.5
        if mask is not None:
            scores = scores + mask
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, T, D)
        x = x + self.out_proj(out)
        x = x + self.linear2(jax.nn.gelu(self.linear1(self.norm2(x))))
        return x, new_cache


class StreamingTransformer(Module):
    def __init__(self, d_model: int, num_heads: int, num_layers: int,
                 dim_feedforward: int, max_period: float = 10000.0):
        self.d_model = d_model
        self.num_heads = num_heads
        self.layers = [
            StreamingTransformerLayer(d_model, num_heads, dim_feedforward)
            for _ in range(num_layers)
        ]

    def __call__(self, x, caches=None, mask=None, positions=None):
        new_caches = [] if caches is not None else None
        for i, layer in enumerate(self.layers):
            x, nc = layer(x, caches[i] if caches is not None else None,
                          mask, positions)
            if new_caches is not None:
                new_caches.append(nc)
        return x, new_caches

    def make_cache(self, batch: int = 1, max_len: int = 2048):
        return [KVCache(batch, self.num_heads,
                        max_len, self.d_model // self.num_heads,
                        jnp.float32)
                for _ in self.layers]


class LUTConditioner(Module):
    """Token lookup conditioner (reference conditioners.py:33-51); the
    sentencepiece tokenizer itself is injected at runtime."""

    def __init__(self, n_bins: int, dim: int, output_dim: int):
        self.embed = nn.Embedding(n_bins + 1, dim)
        if dim != output_dim:
            self.output_proj = nn.Linear(dim, output_dim, bias=False)

    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        e = self.embed(tokens)
        if hasattr(self, "output_proj"):
            e = self.output_proj(e)
        return e


class FlowLMModel(Module):
    """reference flow_lm.py:29-144."""

    def __init__(self, config: FlowLMConfig, latent_dim: int):
        d_model = config.transformer.d_model
        self.ldim = latent_dim
        self.dim = d_model
        self.flow_net = SimpleMLPAdaLN(
            latent_dim, config.flow.dim, latent_dim, d_model,
            config.flow.depth, num_time_conds=2)
        self.conditioner = LUTConditioner(
            config.lookup_table.n_bins, config.lookup_table.dim, d_model)
        self.transformer = StreamingTransformer(
            d_model=d_model, num_heads=config.transformer.num_heads,
            num_layers=config.transformer.num_layers,
            dim_feedforward=int(config.transformer.hidden_scale * d_model),
            max_period=float(config.transformer.max_period))
        self.emb_std = jnp.ones((latent_dim,))
        self.emb_mean = jnp.zeros((latent_dim,))
        self.bos_emb = jnp.zeros((latent_dim,))
        self.input_linear = nn.Linear(latent_dim, d_model, bias=False)
        self.out_norm = nn.LayerNorm(d_model, eps=1e-5)
        self.out_eos = nn.Linear(d_model, 1)


# ---------------------------------------------------------------------------
# Mimi latent codec (RVQ-free adapter, reference pocket_tts/mimi.py)
# ---------------------------------------------------------------------------
class DummyQuantizer(Module):
    def __init__(self, dimension: int, output_dimension: int):
        self.output_proj = nn.Conv1d(dimension, output_dimension, 1,
                                     bias=False)

    def __call__(self, x):  # (B, T, ldim) → (B, T, D)
        return self.output_proj(x)


class MimiLatentCodec(Module):
    """Mimi encoder/decoder operating on continuous latents
    (reference pocket_tts/mimi.py:51-237)."""

    def __init__(self, cfg: MimiConfig, latent_dim: int):
        dim = cfg.seanet.dimension
        self.cfg = cfg
        encoder_frame_rate = cfg.sample_rate / math.prod(cfg.seanet.ratios)
        stride = int(encoder_frame_rate / cfg.frame_rate)
        self.encoder = SeanetEncoder(cfg.seanet)
        self.decoder = SeanetDecoder(cfg.seanet)
        self.encoder_transformer = ProjectedTransformer(
            cfg.transformer, input_dim=dim, output_dims=[dim])
        self.decoder_transformer = ProjectedTransformer(
            cfg.transformer, input_dim=dim, output_dims=[dim])
        self.downsample = StreamableConv1d(dim, dim, 2 * stride, stride, 1, 1,
                                           False, True, "edge")
        self.upsample = StreamableConvTranspose1d(dim, dim, 2 * stride,
                                                  stride, dim, False, True)
        self.quantizer = DummyQuantizer(latent_dim, dim)
        self.frame_rate = cfg.frame_rate
        self.sample_rate = cfg.sample_rate

    def encode_to_latent(self, audio: jnp.ndarray) -> jnp.ndarray:
        """(B, T) or (B, 1, T) → (B, T', D)."""
        x = jnp.asarray(audio)
        if x.ndim == 2:
            x = x[:, :, None]
        elif x.ndim == 3 and x.shape[1] == 1:
            x = jnp.swapaxes(x, 1, 2)
        h = self.encoder(x)
        h, _ = self.encoder_transformer(h)
        return self.downsample(h[0] if isinstance(h, list) else h)

    def decode_from_latent(self, latents: jnp.ndarray) -> jnp.ndarray:
        """(B, T', ldim) flow latents → audio (B, T)."""
        h = self.quantizer(latents)
        h = self.upsample(h)
        outs, _ = self.decoder_transformer(h)
        return self.decoder(outs[0])[..., 0]


# ---------------------------------------------------------------------------
# on-device generation loop
# ---------------------------------------------------------------------------
@partial(
    jax.jit,
    static_argnames=("max_gen_len", "lsd_steps", "temp", "noise_clamp",
                     "eos_threshold"),
    donate_argnames=("caches",),
)
def _pocket_generate(flow_lm: FlowLMModel, caches, prefix_embeds, prefix_len,
                     frames_after_eos, key, max_gen_len: int, lsd_steps: int,
                     temp: float, noise_clamp, eos_threshold: float):
    """[audio-prompt ‖ text] prefill + AR latent loop, one dispatch.

    Returns (latents (max_gen_len, ldim), count). reference
    pocket_tts.py:202-233 + flow_lm.py:70-116."""
    ldim = flow_lm.ldim
    Tp = prefix_embeds.shape[1]
    S = caches[0].max_len
    q_idx = jnp.arange(Tp)[:, None]
    k_idx = jnp.arange(S)[None, :]
    ok = (k_idx <= q_idx) & (k_idx < prefix_len)
    prefill_mask = jnp.where(ok, 0.0, -jnp.inf)[None, None]
    pos = jnp.arange(Tp)
    _, caches = flow_lm.transformer(prefix_embeds, caches,
                                    mask=prefill_mask, positions=pos)

    out = jnp.zeros((max_gen_len, ldim), jnp.float32)

    def sample_latent(h_ctx, key):
        c = h_ctx.astype(jnp.float32)
        is_eos = (flow_lm.out_eos(c) > eos_threshold)[..., 0]
        noise = jax.random.normal(key, c.shape[:-1] + (ldim,)) * temp**0.5
        if noise_clamp is not None:
            noise = jnp.clip(noise, -noise_clamp, noise_clamp)
        latent = lsd_decode(lambda s, t, x: flow_lm.flow_net(c, s, t, x),
                            noise, lsd_steps)
        return latent, is_eos

    def cond(s):
        step, eos_step = s[0], s[4]
        return (step < max_gen_len) & (step < eos_step + frames_after_eos)

    def body(s):
        step, caches, prev_latent, key, eos_step, out = s
        # feed previous latent (BOS first), then sample from its output
        emb = flow_lm.input_linear(prev_latent)[:, None]
        q_pos = prefix_len + step
        valid = (k_idx[0] < prefix_len) | ((k_idx[0] >= Tp)
                                           & (k_idx[0] <= Tp + step))
        mask = jnp.where(valid, 0.0, -jnp.inf)[None, None, None, :]
        h, caches = flow_lm.transformer(emb, caches, mask=mask,
                                        positions=q_pos[None])
        h_ctx = flow_lm.out_norm(h)[:, -1]
        key, sub = jax.random.split(key)
        latent, is_eos = sample_latent(h_ctx, sub)
        eos_step = jnp.where((eos_step >= max_gen_len) & is_eos[0], step,
                             eos_step)
        out = out.at[step].set(latent[0])
        return (step + 1, caches, latent, key, eos_step, out)

    # step 0 input is the BOS latent (NaN→bos in the reference)
    state = (jnp.array(0, jnp.int32), caches, flow_lm.bos_emb[None], key,
             jnp.array(max_gen_len, jnp.int32), out)
    n, _, _, _, eos_step, out = jax.lax.while_loop(cond, body, state)
    return out, n


class Model(Module):
    """reference pocket_tts.py:28-543."""

    _RUNTIME: dict = {}

    def __init__(self, config: Any = None):
        if isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        self.config = config or ModelConfig()
        self.sample_rate = self.config.sample_rate
        self.flow_lm = FlowLMModel(self.config.flow_lm,
                                   self.config.latent_dim)
        mimi_cfg = self.config.mimi or MimiConfig()
        self.mimi = MimiLatentCodec(mimi_cfg, self.config.latent_dim)
        self.speaker_proj_weight = jnp.zeros(
            (self.config.flow_lm.transformer.d_model,
             mimi_cfg.seanet.dimension))
        self.lsd_decode_steps = self.config.lsd_decode_steps
        self.temp = self.config.temp
        self.noise_clamp = self.config.noise_clamp
        self.eos_threshold = self.config.eos_threshold

    def set_runtime(self, tokenizer=None):
        if tokenizer is not None:
            Model._RUNTIME.setdefault(id(self), {})["tokenizer"] = tokenizer

    def make_batcher(self, **kwargs):
        """Serving batcher: concurrent requests' flow-latent decodes run
        in lock-step; codec decode stays per-request."""
        from .batcher import PocketTTSBatcher

        return PocketTTSBatcher(self, **kwargs)

    def _tokenize(self, text: str) -> np.ndarray:
        rt = Model._RUNTIME.setdefault(id(self), {})
        if "tokenizer" not in rt:
            tok = self._load_sp_tokenizer()
            if tok is not None:
                rt["tokenizer"] = tok
        if "tokenizer" in rt:
            ids = rt["tokenizer"].encode(text)
            if hasattr(ids, "ids"):
                ids = ids.ids
            return np.asarray(ids, np.int32).reshape(1, -1)
        raise RuntimeError("PocketTTS text tokenizer not loaded — "
                           "call set_runtime(tokenizer=...)")

    def _load_sp_tokenizer(self):
        """SentencePiece model from config.tokenizer_path or next to the
        weights (reference conditioners.py:18-24). Gated: sentencepiece
        is an optional dependency."""
        from pathlib import Path

        candidates = []
        if getattr(self.config, "tokenizer_path", ""):
            candidates.append(Path(self.config.tokenizer_path))
        model_path = getattr(self.config, "model_path", None)
        if model_path:
            candidates += [Path(model_path) / "tokenizer.model",
                           Path(model_path) / "tokenizer.spm"]
        for cand in candidates:
            if cand.exists():
                try:
                    import sentencepiece
                except ImportError:
                    raise RuntimeError(
                        "PocketTTS needs the `sentencepiece` package to "
                        f"load its tokenizer from {cand}; install it or "
                        "pass a tokenizer via set_runtime()") from None
                return sentencepiece.SentencePieceProcessor(str(cand))
        return None

    def _encode_audio(self, audio) -> jnp.ndarray:
        latents = self.mimi.encode_to_latent(jnp.asarray(audio,
                                                         jnp.float32)[None])
        return latents @ self.speaker_proj_weight.T  # (1, T', d_model)

    PREDEFINED_VOICES = ("alba", "marius", "javert", "jean", "fantine",
                         "cosette", "eponine", "azelma")
    _VOICE_REPO = "kyutai/pocket-tts-without-voice-cloning"
    _VOICE_REV = "d4fdd22ae8c8e1cb3634e150ebeff1dab2d16df3"

    def load_predefined_voice(self, voice_name: str) -> np.ndarray:
        """Hosted voice embedding (reference pocket_tts utils.py:18-24,
        61-68): embeddings/<name>.safetensors at a pinned revision, key
        'audio_prompt', already in the flow-LM latent space."""
        if voice_name not in self.PREDEFINED_VOICES:
            raise ValueError(
                f"Predefined voice '{voice_name}' not found; available: "
                f"{list(self.PREDEFINED_VOICES)}")
        from huggingface_hub import hf_hub_download
        from safetensors.numpy import load_file

        f = hf_hub_download(self._VOICE_REPO,
                            f"embeddings/{voice_name}.safetensors",
                            revision=self._VOICE_REV)
        return load_file(f)["audio_prompt"]

    def _generate_latents(self, text_to_generate: str, ref_audio=None,
                          frames_after_eos: Optional[int] = None,
                          max_gen_len: Optional[int] = None,
                          key=None):
        """One on-device AR pass → (latents (n, ldim) jnp, n)."""
        tokens = self._tokenize(text_to_generate)
        text_emb = self.flow_lm.conditioner(jnp.asarray(tokens))
        if isinstance(ref_audio, str):
            # predefined hosted voice embedding (reference utils.py:18-24,
            # pocket_tts.py:144-152); already in latent space
            audio_cond = jnp.asarray(self.load_predefined_voice(ref_audio))
            prefix = jnp.concatenate([audio_cond, text_emb], axis=1)
        elif ref_audio is not None:
            audio_cond = self._encode_audio(np.asarray(ref_audio,
                                                       np.float32))
            prefix = jnp.concatenate([audio_cond, text_emb], axis=1)
        else:
            prefix = text_emb

        if frames_after_eos is None:
            frames_after_eos = 2 + max(2, round(len(text_to_generate) / 50))
        if max_gen_len is None:
            gen_len_sec = len(text_to_generate.split()) * 1 + 2.0
            max_gen_len = int(gen_len_sec * self.mimi.frame_rate)
        max_gen_len = max(4, max_gen_len)

        T0 = prefix.shape[1]
        # under a running server a PocketTTSBatcher may be installed:
        # concurrent requests' flow-latent decodes run in lock-step
        from ....serving import get_infer_hook

        hook = get_infer_hook(self)
        if hook is not None:
            seed = (int(np.asarray(key).reshape(-1)[-1])
                    if key is not None else
                    int(np.random.randint(0, 2**31 - 1)))
            raw = hook.submit(
                np.asarray(prefix[:, :T0]), max_gen_len=max_gen_len,
                frames_after_eos=frames_after_eos, seed=seed,
            ).result()  # (n, ldim) raw latents
            n = int(raw.shape[0])
            if n == 0:
                return None, 0
            return (jnp.asarray(raw) * self.flow_lm.emb_std
                    + self.flow_lm.emb_mean), n
        Tp = max(16, ((T0 + 15) // 16) * 16)
        prefix = jnp.pad(prefix, ((0, 0), (0, Tp - T0), (0, 0)))
        caches = self.flow_lm.transformer.make_cache(
            1, Tp + max_gen_len + 1)
        if key is None:
            key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        latents, n = _pocket_generate(
            self.flow_lm, caches, prefix, jnp.array(T0, jnp.int32),
            jnp.array(frames_after_eos, jnp.int32), key, max_gen_len,
            self.lsd_decode_steps, float(self.temp), self.noise_clamp,
            float(self.eos_threshold))
        n = int(n)
        if n == 0:
            return None, 0
        return latents[:n] * self.flow_lm.emb_std + self.flow_lm.emb_mean, n

    def generate_audio(self, text_to_generate: str, ref_audio=None,
                       frames_after_eos: Optional[int] = None,
                       max_gen_len: Optional[int] = None,
                       key=None) -> np.ndarray:
        lat, n = self._generate_latents(text_to_generate, ref_audio,
                                        frames_after_eos, max_gen_len, key)
        if n == 0:
            return np.zeros((0,), np.float32)
        audio = self.mimi.decode_from_latent(lat[None])
        return np.asarray(audio[0])

    def generate_audio_stream(self, text_to_generate: str, ref_audio=None,
                              frames_after_eos: Optional[int] = None,
                              max_gen_len: Optional[int] = None,
                              chunk_frames: int = 25,
                              overlap_frames: int = 12,
                              key=None):
        """Yield waveform chunks (reference pocket_tts.py:179-233 streams
        per frame). TPU-first shape: the AR latent loop stays ONE dispatch
        (per-frame host syncs would dominate), then audio streams out as
        overlapped codec-decode chunks — the chunked-decode-with-context
        pattern the reference uses for Qwen3-TTS streaming
        (qwen3_tts.py:963-985). Each chunk decodes with `overlap_frames`
        of left latent context to warm the decoder, and consecutive chunks
        are linearly crossfaded over that overlap (the dacvae.py
        chunk-stitch approach) so residual boundary mismatch fades instead
        of stepping."""
        lat, n = self._generate_latents(text_to_generate, ref_audio,
                                        frames_after_eos, max_gen_len, key)
        if n == 0:
            return
        spf = int(round(self.mimi.sample_rate / self.mimi.frame_rate))
        xfade = overlap_frames * spf
        held = None  # tail samples re-decoded (with context) by next chunk
        for start in range(0, n, chunk_frames):
            ctx = max(0, start - overlap_frames)
            audio = np.asarray(self.mimi.decode_from_latent(
                lat[ctx: start + chunk_frames][None])[0])
            rel = (start - ctx) * spf  # index of this chunk's new content
            if held is not None:
                # both decodes cover [start*spf - len(held), start*spf)
                m = min(len(held), rel)
                ramp = np.linspace(0.0, 1.0, m, dtype=np.float32)
                yield (held[len(held) - m:] * (1.0 - ramp)
                       + audio[rel - m: rel] * ramp)
            out = audio[rel:]
            last = start + chunk_frames >= n
            if not last and len(out) > xfade:
                held = out[len(out) - xfade:]
                yield out[: len(out) - xfade]
            else:
                held = None
                yield out

    def split_into_best_sentences(self, text: str,
                                  max_tokens_per_chunk: int = 50
                                  ) -> List[str]:
        """Split long text at sentence boundaries into chunks of at most
        `max_tokens_per_chunk` tokenizer tokens (reference
        pocket_tts.py:495-545): sentences end at ./!/…/? tokens, and
        whole sentences pack greedily into chunks."""
        import re

        text = text.strip()
        sentences = [s for s in re.split(r"(?<=[.!?…])\s+", text)
                     if s.strip()]
        chunks: List[str] = []
        cur, cur_n = "", 0
        for s in sentences:
            n = int(self._tokenize(s).shape[1])
            if not cur:
                cur, cur_n = s, n
            elif cur_n + n > max_tokens_per_chunk:
                chunks.append(cur.strip())
                cur, cur_n = s, n
            else:
                cur += " " + s
                cur_n += n
        if cur:
            chunks.append(cur.strip())
        return chunks or [text]

    def _result(self, wav, start, segment_idx, token_count=0):
        dur = len(wav) / self.sample_rate
        elapsed = time.time() - start
        return GenerationResult(
            audio=wav, samples=len(wav), sample_rate=self.sample_rate,
            segment_idx=segment_idx, token_count=token_count,
            audio_duration=format_duration(dur),
            real_time_factor=round(elapsed / max(dur, 1e-9), 2),
            prompt={}, audio_samples={},
            processing_time_seconds=elapsed, peak_memory_usage=0.0)

    def generate(self, text: str, voice: Optional[str] = None,
                 ref_audio=None, temperature: Optional[float] = None,
                 verbose: bool = False, stream: bool = False,
                 streaming_interval: float = 2.0,
                 frames_after_eos: Optional[int] = None,
                 seed: Optional[int] = None,
                 **kwargs) -> Generator[GenerationResult, None, None]:
        """reference pocket_tts.py:234-330: `voice` names a hosted prompt
        embedding, `ref_audio` clones; sampler knobs (temperature /
        lsd_decode_steps / noise_clamp / eos_threshold) override the model
        defaults for this call; stream=True yields ~streaming_interval-
        second audio chunks."""
        # audio prompt: explicit ref_audio wins; else a named hosted voice
        # (a string ref routes through load_predefined_voice downstream)
        prompt = ref_audio if ref_audio is not None else voice
        if verbose and voice and ref_audio is None:
            print(f"[pocket_tts] using hosted voice '{voice}'")

        prev = (self.temp, self.lsd_decode_steps, self.noise_clamp,
                self.eos_threshold)
        if temperature is not None:
            self.temp = float(temperature)
        if kwargs.get("lsd_decode_steps") is not None:
            self.lsd_decode_steps = int(kwargs["lsd_decode_steps"])
        if kwargs.get("noise_clamp") is not None:
            self.noise_clamp = float(kwargs["noise_clamp"])
        if kwargs.get("eos_threshold") is not None:
            self.eos_threshold = float(kwargs["eos_threshold"])
        try:
            key = (jax.random.PRNGKey(seed) if seed is not None else None)
            # long text: synthesize per sentence-packed chunk (reference
            # pocket_tts.py:186-198 chunks via split_into_best_sentences)
            chunks = self.split_into_best_sentences(text)
            segment_idx = 0
            for chunk in chunks:
                if key is not None:
                    key, sub = jax.random.split(key)
                else:
                    sub = None
                if not stream:
                    start = time.time()
                    wav = self.generate_audio(
                        chunk, ref_audio=prompt,
                        frames_after_eos=frames_after_eos, key=sub)
                    yield self._result(wav, start, segment_idx)
                    segment_idx += 1
                    continue
                # stream: re-chunk codec output to ~streaming_interval s
                interval = max(1, int(streaming_interval * self.sample_rate))
                buf: List[np.ndarray] = []
                buffered = 0
                start = time.time()
                for piece in self.generate_audio_stream(
                        chunk, ref_audio=prompt,
                        frames_after_eos=frames_after_eos, key=sub):
                    piece = np.asarray(piece)
                    buf.append(piece)
                    buffered += len(piece)
                    if buffered >= interval:
                        yield self._result(np.concatenate(buf), start,
                                           segment_idx)
                        segment_idx += 1
                        buf, buffered = [], 0
                        start = time.time()
                if buffered:
                    yield self._result(np.concatenate(buf), start,
                                       segment_idx)
                    segment_idx += 1
        finally:
            (self.temp, self.lsd_decode_steps, self.noise_clamp,
             self.eos_threshold) = prev

    def sanitize(self, weights: dict) -> dict:
        out = {}
        for key, value in weights.items():
            k = key
            k = k.replace("flow_lm.transformer.layers",
                          "flow_lm.transformer.layers")
            out[k] = value
        return out

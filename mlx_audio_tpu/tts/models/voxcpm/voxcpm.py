"""VoxCPM: MiniCPM LM + patch-level local encoder/DiT over AudioVAE latents.

TPU-native re-implementation of the reference
mlx_audio/tts/models/voxcpm/ (voxcpm.py, minicpm.py, dit.py, encoder.py,
audio_vae.py, config.py). The per-patch generation step — DiT CFM sample
(sway-scheduled Euler with CFG-zero-star), stop head, local re-encode, and
base+residual LM updates — runs as one `lax.while_loop` on device; the
final latent sequence decodes through the causal AudioVAE in a single
jitted call.
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

from ....lm.cache import KVCache
from ....nn import layers as nn
from ....nn.module import Module
from ..base import GenerationResult, format_duration

__all__ = ["Model", "ModelArgs", "LMConfig", "MiniCPMModel", "AudioVAE",
           "UnifiedCFM", "VoxCPMLocDiT", "VoxCPMLocEnc"]


# ---------------------------------------------------------------------------
# configs (reference config.py)
# ---------------------------------------------------------------------------
@dataclass
class LMConfig:
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    num_key_value_heads: int = 2
    intermediate_size: int = 4096
    vocab_size: int = 73448
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    rope_long_factor: List[float] = field(default_factory=list)
    rope_short_factor: List[float] = field(default_factory=list)
    scale_emb: int = 12
    scale_depth: float = 1.4
    original_max_position_embeddings: int = 32768
    max_position_embeddings: int = 32768
    use_mup: bool = False


@dataclass
class EncoderConfig:
    hidden_dim: int = 1024
    ffn_dim: int = 4096
    num_heads: int = 16
    num_layers: int = 8


@dataclass
class CFMConfig:
    sigma_min: float = 1e-6
    t_scheduler: str = "log-norm"
    inference_cfg_rate: float = 2.0


@dataclass
class DiTConfig:
    hidden_dim: int = 1024
    ffn_dim: int = 4096
    num_heads: int = 16
    num_layers: int = 8
    cfm_config: CFMConfig = field(default_factory=CFMConfig)


@dataclass
class AudioVAEConfig:
    encoder_dim: int = 64
    encoder_rates: List[int] = field(default_factory=lambda: [2, 3, 6, 7, 7])
    latent_dim: int = 64
    decoder_dim: int = 2048
    decoder_rates: List[int] = field(default_factory=lambda: [7, 7, 6, 3, 2])
    sample_rate: int = 44100


@dataclass
class ModelArgs:
    lm_config: Any = field(default_factory=LMConfig)
    encoder_config: Any = field(default_factory=EncoderConfig)
    dit_config: Any = field(default_factory=DiTConfig)
    audio_vae_config: Any = field(default_factory=AudioVAEConfig)
    patch_size: int = 4
    feat_dim: int = 64
    scalar_quantization_latent_dim: int = 256
    scalar_quantization_scale: int = 9
    residual_lm_num_layers: int = 8
    max_length: int = 8192
    model_path: Optional[str] = None

    def __post_init__(self):
        for name, cls in [("lm_config", LMConfig),
                          ("encoder_config", EncoderConfig),
                          ("dit_config", DiTConfig),
                          ("audio_vae_config", AudioVAEConfig)]:
            v = getattr(self, name)
            if isinstance(v, dict):
                if name == "lm_config" and "rope_scaling" in v:
                    rs = v.pop("rope_scaling")
                    v["rope_long_factor"] = rs.get("long_factor", [])
                    v["rope_short_factor"] = rs.get("short_factor", [])
                    v["original_max_position_embeddings"] = rs.get(
                        "original_max_position_embeddings", 32768)
                if name == "dit_config" and isinstance(
                        v.get("cfm_config"), dict):
                    v["cfm_config"] = CFMConfig(**v["cfm_config"])
                setattr(self, name, cls(**{k: x for k, x in v.items()
                                           if k in cls.__dataclass_fields__}))

    @classmethod
    def from_dict(cls, d: dict) -> "ModelArgs":
        return cls(**{k: v for k, v in d.items()
                      if k in cls.__dataclass_fields__})


# ---------------------------------------------------------------------------
# MiniCPM (reference minicpm.py)
# ---------------------------------------------------------------------------
def _longrope_tables(cfg: LMConfig, positions: jnp.ndarray):
    head_dim = cfg.hidden_size // cfg.num_attention_heads
    half = head_dim // 2
    inv = 1.0 / cfg.rope_theta ** (jnp.arange(half, dtype=jnp.float32) / half)
    factors = (jnp.asarray(cfg.rope_short_factor, jnp.float32)
               if cfg.rope_short_factor else jnp.ones((half,)))
    scale = cfg.max_position_embeddings / cfg.original_max_position_embeddings
    scaling = math.sqrt(1 + math.log(max(scale, 1.0))
                        / math.log(cfg.original_max_position_embeddings))
    # positions: (T,) shared, or (B, T) per-row (slot batcher: each row
    # decodes at its own absolute position)
    freqs = positions[..., None].astype(jnp.float32) * (inv / factors)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb) * scaling, jnp.sin(emb) * scaling


def _rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


class MiniCPMLayer(Module):
    def __init__(self, cfg: LMConfig):
        h = cfg.hidden_size
        self.head_dim = h // cfg.num_attention_heads
        self.n_heads = cfg.num_attention_heads
        self.n_kv = cfg.num_key_value_heads
        self.q_proj = nn.Linear(h, self.n_heads * self.head_dim, bias=False)
        self.k_proj = nn.Linear(h, self.n_kv * self.head_dim, bias=False)
        self.v_proj = nn.Linear(h, self.n_kv * self.head_dim, bias=False)
        self.o_proj = nn.Linear(self.n_heads * self.head_dim, h, bias=False)
        self.gate_proj = nn.Linear(h, cfg.intermediate_size, bias=False)
        self.up_proj = nn.Linear(h, cfg.intermediate_size, bias=False)
        self.down_proj = nn.Linear(cfg.intermediate_size, h, bias=False)
        self.input_layernorm = nn.RMSNorm(h, eps=cfg.rms_norm_eps)
        self.post_attention_layernorm = nn.RMSNorm(h, eps=cfg.rms_norm_eps)
        self.res_scale = (cfg.scale_depth / math.sqrt(cfg.num_hidden_layers)
                          if cfg.use_mup else 1.0)

    def __call__(self, x, cos, sin, mask, cache: Optional[KVCache]):
        B, T, _ = x.shape
        h = self.input_layernorm(x)
        q = self.q_proj(h).reshape(B, T, self.n_heads, self.head_dim)
        k = self.k_proj(h).reshape(B, T, self.n_kv, self.head_dim)
        v = self.v_proj(h).reshape(B, T, self.n_kv, self.head_dim)
        c = (cos[None, :, None, :] if cos.ndim == 2
             else cos[:, :, None, :])
        s = (sin[None, :, None, :] if sin.ndim == 2
             else sin[:, :, None, :])
        q = q * c + _rotate_half(q) * s
        k = k * c + _rotate_half(k) * s
        q, k, v = (a.transpose(0, 2, 1, 3) for a in (q, k, v))
        new_cache = None
        if cache is not None:
            k, v, new_cache = cache.update(k, v)
            if mask is None:
                mask = cache.attention_mask(T)
        rep = self.n_heads // self.n_kv
        if rep > 1:
            k = jnp.repeat(k, rep, axis=1)
            v = jnp.repeat(v, rep, axis=1)
        scores = q @ k.transpose(0, 1, 3, 2) / math.sqrt(self.head_dim)
        if mask is not None:
            scores = scores + mask
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        o = (attn @ v).transpose(0, 2, 1, 3).reshape(B, T, -1)
        x = x + self.o_proj(o) * self.res_scale
        h = self.post_attention_layernorm(x)
        x = x + self.down_proj(jax.nn.silu(self.gate_proj(h))
                               * self.up_proj(h)) * self.res_scale
        return x, new_cache


class MiniCPMModel(Module):
    """reference minicpm.py:206-260."""

    def __init__(self, cfg: LMConfig):
        self.cfg = cfg
        if cfg.vocab_size > 0:
            self.embed_tokens = nn.Embedding(cfg.vocab_size, cfg.hidden_size)
        self.layers = [MiniCPMLayer(cfg)
                       for _ in range(cfg.num_hidden_layers)]
        self.norm = nn.RMSNorm(cfg.hidden_size, eps=cfg.rms_norm_eps)

    def __call__(self, inputs_embeds, caches=None, positions=None,
                 mask=None, is_causal=True):
        B, T, _ = inputs_embeds.shape
        if positions is None:
            start = caches[0].pos if caches is not None else 0
            positions = start + jnp.arange(T)
        cos, sin = _longrope_tables(self.cfg, positions)
        if mask is None and caches is None and is_causal and T > 1:
            q = jnp.arange(T)[:, None]
            kk = jnp.arange(T)[None, :]
            mask = jnp.where(kk <= q, 0.0, -jnp.inf)[None, None]
        h = inputs_embeds
        new_caches = [] if caches is not None else None
        for i, layer in enumerate(self.layers):
            h, nc = layer(h, cos, sin, mask,
                          caches[i] if caches is not None else None)
            if new_caches is not None:
                new_caches.append(nc)
        return self.norm(h), new_caches

    def make_caches(self, batch: int, max_len: int):
        return [KVCache(batch, self.cfg.num_key_value_heads, max_len,
                        self.cfg.hidden_size // self.cfg.num_attention_heads,
                        jnp.float32)
                for _ in range(self.cfg.num_hidden_layers)]


# ---------------------------------------------------------------------------
# local encoder / DiT / CFM (reference encoder.py, dit.py)
# ---------------------------------------------------------------------------
class VoxCPMLocEnc(Module):
    def __init__(self, cfg: LMConfig, input_dim: int = 64):
        self.cfg = cfg
        self.special_token = jnp.zeros((1, 1, 1, cfg.hidden_size))
        self.in_proj = nn.Linear(input_dim, cfg.hidden_size)
        self.encoder = MiniCPMModel(cfg)

    def __call__(self, x):
        """x: (B, T, P, D) → (B, T, H) CLS outputs."""
        B, T, P, D = x.shape
        h = self.in_proj(x)
        cls = jnp.broadcast_to(self.special_token,
                               (B, T, 1, self.cfg.hidden_size))
        h = jnp.concatenate([cls, h], axis=2).reshape(B * T, P + 1, -1)
        out, _ = self.encoder(h, is_causal=False)
        return out[:, 0].reshape(B, T, -1)


class VoxCPMLocDiT(Module):
    def __init__(self, cfg: LMConfig, in_channels: int = 64):
        self.cfg = cfg
        self.in_proj = nn.Linear(in_channels, cfg.hidden_size)
        self.cond_proj = nn.Linear(in_channels, cfg.hidden_size)
        self.out_proj = nn.Linear(cfg.hidden_size, in_channels)
        self.time_mlp = nn.Sequential(
            nn.Linear(cfg.hidden_size, cfg.hidden_size), nn.SiLU(),
            nn.Linear(cfg.hidden_size, cfg.hidden_size))
        self.delta_time_mlp = nn.Sequential(
            nn.Linear(cfg.hidden_size, cfg.hidden_size), nn.SiLU(),
            nn.Linear(cfg.hidden_size, cfg.hidden_size))
        self.decoder = MiniCPMModel(cfg)

    def _time_emb(self, t, scale=1000.0):
        d = self.cfg.hidden_size
        half = d // 2
        emb = jnp.exp(jnp.arange(half, dtype=jnp.float32)
                      * -(math.log(10000.0) / (half - 1)))
        args = scale * t[:, None] * emb[None]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)

    def __call__(self, x, mu, t, cond, dt):
        """x: (N, T, C); mu: (N, H); cond: (N, T', C)."""
        x_proj = self.in_proj(x)
        cond_proj = self.cond_proj(cond)
        t_comb = (self.time_mlp(self._time_emb(t))
                  + self.delta_time_mlp(self._time_emb(dt)))
        start = (mu + t_comb)[:, None]
        h = jnp.concatenate([start, cond_proj, x_proj], axis=1)
        h, _ = self.decoder(h, is_causal=False)
        return self.out_proj(h[:, cond.shape[1] + 1:])


class UnifiedCFM(Module):
    """Sway-scheduled Euler with CFG-zero-star (reference dit.py:98-197)."""

    def __init__(self, in_channels: int, cfm_params: CFMConfig,
                 estimator: VoxCPMLocDiT):
        self.in_channels = in_channels
        self.estimator = estimator
        self.cfm_params = cfm_params

    def sample(self, mu, n_timesteps: int, patch_size: int, cond, key,
               temperature: float = 1.0, cfg_value: float = 2.0):
        B = mu.shape[0]
        z = jax.random.normal(key, (B, patch_size, self.in_channels)
                              ) * temperature
        t_span = jnp.linspace(1.0, 0.0, n_timesteps + 1)
        t_span = t_span + 1.0 * (jnp.cos(math.pi / 2 * t_span) - 1 + t_span)
        zero_init = max(1, int((n_timesteps + 1) * 0.04))

        def step(i, x):
            t = t_span[i - 1]
            dt = t_span[i - 1] - t_span[i]

            x_in = jnp.concatenate([x, x], axis=0)
            mu_in = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
            cond_in = jnp.concatenate([cond, cond], axis=0)
            t_val = jnp.full((2 * B,), t)
            dt_val = jnp.zeros((2 * B,))
            out = self.estimator(x_in, mu_in, t_val, cond_in, dt_val)
            dphi, cfg_dphi = out[:B], out[B:]
            pos = dphi.reshape(B, -1)
            neg = cfg_dphi.reshape(B, -1)
            st = (jnp.sum(pos * neg, axis=1, keepdims=True)
                  / (jnp.sum(neg * neg, axis=1, keepdims=True) + 1e-8)
                  ).reshape(B, 1, 1)
            v = cfg_dphi * st + cfg_value * (dphi - cfg_dphi * st)
            v = jnp.where(i <= zero_init, jnp.zeros_like(v), v)
            return x - dt * v

        return jax.lax.fori_loop(1, n_timesteps + 1, step, z)


# ---------------------------------------------------------------------------
# AudioVAE (reference audio_vae.py), channels-last
# ---------------------------------------------------------------------------
class VAESnake1d(Module):
    def __init__(self, channels: int):
        self.alpha = jnp.ones((1, 1, channels))

    def __call__(self, x):
        return x + (1.0 / (self.alpha + 1e-9)) * jnp.sin(self.alpha * x) ** 2


class VAECausalConv(Module):
    def __init__(self, in_ch, out_ch, kernel_size, stride=1, dilation=1,
                 groups=1, bias=True, padding=0):
        self.conv = nn.Conv1d(in_ch, out_ch, kernel_size, stride=stride,
                              dilation=dilation, groups=groups, bias=bias)
        self.pad = (kernel_size - 1) * dilation
        self.stride = stride

    def __call__(self, x):
        return self.conv(jnp.pad(x, ((0, 0), (self.pad, 0), (0, 0))))


class VAECausalConvT(Module):
    def __init__(self, in_ch, out_ch, kernel_size, stride=1, padding=0,
                 output_padding=0):
        self.conv = nn.ConvTranspose1d(in_ch, out_ch, kernel_size,
                                       stride=stride)
        self.trim = kernel_size - stride

    def __call__(self, x):
        y = self.conv(x)
        return y[:, : y.shape[1] - self.trim] if self.trim > 0 else y


class VAEResUnit(Module):
    def __init__(self, dim, dilation=1, kernel=7, groups=1):
        self.snake1 = VAESnake1d(dim)
        self.conv1 = VAECausalConv(dim, dim, kernel, dilation=dilation,
                                   groups=groups)
        self.snake2 = VAESnake1d(dim)
        self.conv2 = VAECausalConv(dim, dim, 1)

    def __call__(self, x):
        return x + self.conv2(self.snake2(self.conv1(self.snake1(x))))


class VAEEncoderBlock(Module):
    def __init__(self, output_dim, input_dim, stride, groups=1):
        self.res1 = VAEResUnit(input_dim, 1, groups=groups)
        self.res2 = VAEResUnit(input_dim, 3, groups=groups)
        self.res3 = VAEResUnit(input_dim, 9, groups=groups)
        self.snake = VAESnake1d(input_dim)
        self.conv = VAECausalConv(input_dim, output_dim, 2 * stride,
                                  stride=stride)

    def __call__(self, x):
        return self.conv(self.snake(self.res3(self.res2(self.res1(x)))))


class VAEDecoderBlock(Module):
    def __init__(self, input_dim, output_dim, stride, groups=1):
        self.snake = VAESnake1d(input_dim)
        self.conv_t = VAECausalConvT(input_dim, output_dim, 2 * stride,
                                     stride=stride)
        self.res1 = VAEResUnit(output_dim, 1, groups=groups)
        self.res2 = VAEResUnit(output_dim, 3, groups=groups)
        self.res3 = VAEResUnit(output_dim, 9, groups=groups)

    def __call__(self, x):
        return self.res3(self.res2(self.res1(self.conv_t(self.snake(x)))))


class AudioVAE(Module):
    """Causal depthwise VAE (reference audio_vae.py:333-430)."""

    def __init__(self, config: AudioVAEConfig):
        if isinstance(config, dict):
            config = AudioVAEConfig(**{k: v for k, v in config.items()
                                       if k in
                                       AudioVAEConfig.__dataclass_fields__})
        self.config = config
        self.hop_length = int(np.prod(config.encoder_rates))
        self.sample_rate = config.sample_rate
        d = config.encoder_dim
        self.conv_in = VAECausalConv(1, d, 7)
        enc_blocks = []
        cur = d
        for s in config.encoder_rates:
            nxt = cur * 2
            enc_blocks.append(VAEEncoderBlock(nxt, cur, s, groups=cur))
            cur = nxt
        self.enc_blocks = enc_blocks
        self.fc_mu = VAECausalConv(cur, config.latent_dim, 3)

        dd = config.decoder_dim
        self.dec_conv_in = nn.Sequential(
            VAECausalConv(config.latent_dim, config.latent_dim, 7,
                          groups=config.latent_dim),
            VAECausalConv(config.latent_dim, dd, 1))
        dec_blocks = []
        for i, s in enumerate(config.decoder_rates):
            in_d = dd // (2**i)
            out_d = dd // (2 ** (i + 1))
            dec_blocks.append(VAEDecoderBlock(in_d, out_d, s, groups=out_d))
        self.dec_blocks = dec_blocks
        final = dd // (2 ** len(config.decoder_rates))
        self.snake_out = VAESnake1d(final)
        self.conv_out = VAECausalConv(final, 1, 7)

    def encode(self, x):
        """(B, T) or (B, T, 1) → latents (B, T', latent_dim)."""
        x = jnp.asarray(x)
        if x.ndim == 2:
            x = x[:, :, None]
        L = x.shape[1]
        pad = math.ceil(L / self.hop_length) * self.hop_length - L
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        h = self.conv_in(x)
        for b in self.enc_blocks:
            h = b(h)
        return self.fc_mu(h)

    def decode(self, z):
        """(B, T', latent_dim) → (B, T)."""
        h = self.dec_conv_in(z)
        for b in self.dec_blocks:
            h = b(h)
        return jnp.tanh(self.conv_out(self.snake_out(h)))[..., 0]


class ScalarQuantizationLayer(Module):
    def __init__(self, in_dim, out_dim, latent_dim=64, scale=9):
        self.scale = scale
        self.in_proj = nn.Linear(in_dim, latent_dim)
        self.out_proj = nn.Linear(latent_dim, out_dim)

    def __call__(self, x):
        h = jnp.tanh(self.in_proj(x))
        h = jnp.round(h * self.scale) / self.scale
        return self.out_proj(h)


# ---------------------------------------------------------------------------
# on-device generation
# ---------------------------------------------------------------------------
@partial(jax.jit,
         static_argnames=("max_tokens", "n_timesteps", "cfg_value"),
         donate_argnames=("lm_caches", "res_caches"))
def _voxcpm_generate(model, lm_caches, res_caches, combined_embed,
                     prefill_len, prefix_feat, fsq_all, key,
                     max_tokens: int, n_timesteps: int, cfg_value: float):
    """Per-patch AR loop, one dispatch (reference voxcpm.py:370-421)."""
    P = model.patch_size
    D = model.feat_dim
    Tp = combined_embed.shape[1]
    S = lm_caches[0].max_len
    q_idx = jnp.arange(Tp)[:, None]
    k_idx = jnp.arange(S)[None, :]
    ok = (k_idx <= q_idx) & (k_idx < prefill_len)
    mask = jnp.where(ok, 0.0, -jnp.inf)[None, None]
    pos = jnp.arange(Tp)
    enc_out, lm_caches = model.base_lm(combined_embed, lm_caches,
                                       positions=pos, mask=mask)
    last = jnp.clip(prefill_len - 1, 0, Tp - 1)
    lm_hidden = enc_out[:, last]
    lm_hidden = jnp.where(fsq_all, model.fsq_layer(lm_hidden), lm_hidden)
    res_out, res_caches = model.residual_lm(enc_out, res_caches,
                                            positions=pos, mask=mask)
    residual_hidden = res_out[:, last]

    out = jnp.zeros((max_tokens, P, D), jnp.float32)

    def cond_fn(s):
        return (s[0] < max_tokens) & ~s[8]

    def body(s):
        (step, lm_caches, res_caches, lm_hidden, residual_hidden,
         prefix_feat, out, key, done) = s
        dit_h = (model.lm_to_dit_proj(lm_hidden)
                 + model.res_to_dit_proj(residual_hidden))
        key, sub = jax.random.split(key)
        pred = model.feat_decoder.sample(dit_h, n_timesteps, P, prefix_feat,
                                         sub, cfg_value=cfg_value)
        out = out.at[step].set(pred[0])

        stop_logits = model.stop_head(jax.nn.silu(
            model.stop_proj(lm_hidden)))
        stop = (jnp.argmax(stop_logits, axis=-1)[0] == 1) & (step > 5)
        done = done | stop

        curr = model.enc_to_lm_proj(model.feat_encoder(pred[:, None]))
        q_pos = prefill_len + step
        valid = (k_idx[0] < prefill_len) | ((k_idx[0] >= Tp)
                                            & (k_idx[0] <= Tp + step))
        dmask = jnp.where(valid, 0.0, -jnp.inf)[None, None, None, :]
        new_lm, lm_caches = model.base_lm(curr, lm_caches,
                                          positions=q_pos[None], mask=dmask)
        lm_hidden = model.fsq_layer(new_lm[:, -1])
        res_in = lm_hidden[:, None] + curr
        new_res, res_caches = model.residual_lm(res_in, res_caches,
                                                positions=q_pos[None],
                                                mask=dmask)
        residual_hidden = new_res[:, -1]
        step = jnp.where(done, step, step + 1)
        return (step, lm_caches, res_caches, lm_hidden, residual_hidden,
                pred, out, key, done)

    state = (jnp.array(0, jnp.int32), lm_caches, res_caches, lm_hidden,
             residual_hidden, prefix_feat, out, key, jnp.array(False))
    n, _, _, _, _, _, out, _, _ = jax.lax.while_loop(cond_fn, body, state)
    return out, n + 1


class Model(Module):
    """reference voxcpm.py:31-463."""

    _RUNTIME: dict = {}

    def __init__(self, args: Any = None):
        if isinstance(args, dict):
            args = ModelArgs.from_dict(args)
        self.args = args or ModelArgs()
        args = self.args
        self.patch_size = args.patch_size
        self.feat_dim = args.feat_dim

        self.base_lm = MiniCPMModel(args.lm_config)
        res_cfg = LMConfig(**{**vars(args.lm_config),
                              "num_hidden_layers": args.residual_lm_num_layers,
                              "vocab_size": 0})
        self.residual_lm = MiniCPMModel(res_cfg)
        enc_cfg = LMConfig(**{**vars(args.lm_config),
                              "hidden_size": args.encoder_config.hidden_dim,
                              "intermediate_size": args.encoder_config.ffn_dim,
                              "num_attention_heads":
                                  args.encoder_config.num_heads,
                              "num_key_value_heads":
                                  args.encoder_config.num_heads,
                              "num_hidden_layers":
                                  args.encoder_config.num_layers,
                              "vocab_size": 0})
        self.feat_encoder = VoxCPMLocEnc(enc_cfg, input_dim=args.feat_dim)
        dit_cfg = LMConfig(**{**vars(args.lm_config),
                              "hidden_size": args.dit_config.hidden_dim,
                              "intermediate_size": args.dit_config.ffn_dim,
                              "num_attention_heads": args.dit_config.num_heads,
                              "num_key_value_heads": args.dit_config.num_heads,
                              "num_hidden_layers": args.dit_config.num_layers,
                              "vocab_size": 0})
        self.feat_decoder = UnifiedCFM(args.feat_dim,
                                       args.dit_config.cfm_config,
                                       VoxCPMLocDiT(dit_cfg, args.feat_dim))
        self.fsq_layer = ScalarQuantizationLayer(
            args.lm_config.hidden_size, args.lm_config.hidden_size,
            args.scalar_quantization_latent_dim,
            args.scalar_quantization_scale)
        self.enc_to_lm_proj = nn.Linear(args.encoder_config.hidden_dim,
                                        args.lm_config.hidden_size)
        self.lm_to_dit_proj = nn.Linear(args.lm_config.hidden_size,
                                        args.dit_config.hidden_dim)
        self.res_to_dit_proj = nn.Linear(args.lm_config.hidden_size,
                                         args.dit_config.hidden_dim)
        self.stop_proj = nn.Linear(args.lm_config.hidden_size,
                                   args.lm_config.hidden_size)
        self.stop_head = nn.Linear(args.lm_config.hidden_size, 2, bias=False)
        self.audio_vae = AudioVAE(args.audio_vae_config)

    @property
    def sample_rate(self):
        return self.args.audio_vae_config.sample_rate

    def set_runtime(self, tokenizer=None):
        if tokenizer is not None:
            Model._RUNTIME.setdefault(id(self), {})["tokenizer"] = tokenizer

    def make_batcher(self, **kwargs):
        """Serving batcher: concurrent requests' dual-LM patch decodes run
        in lock-step; audio-VAE decode stays per-request."""
        from .batcher import VoxCPMBatcher

        return VoxCPMBatcher(self, **kwargs)

    def _encode_prompt_audio(self, audio: np.ndarray) -> jnp.ndarray:
        patch_len = self.patch_size * self.audio_vae.hop_length
        if audio.shape[0] % patch_len:
            audio = np.pad(audio,
                           (patch_len - audio.shape[0] % patch_len, 0))
        feat = self.audio_vae.encode(jnp.asarray(audio)[None])[0]
        n = feat.shape[0] // self.patch_size
        return feat[: n * self.patch_size].reshape(n, self.patch_size, -1)

    def generate(self, text: str, max_tokens: int = 4096,  # reference voxcpm.py:256
                 ref_text: Optional[str] = None, ref_audio=None,
                 inference_timesteps: int = 10, cfg_value: float = 2.0,
                 seed: Optional[int] = None,
                 **kwargs) -> Generator[GenerationResult, None, None]:
        from ....utils import resolve_runtime_tokenizer

        tokenizer = resolve_runtime_tokenizer(
            self, Model._RUNTIME.setdefault(id(self), {}), "VoxCPM")
        start = time.perf_counter()
        scale_emb = (self.args.lm_config.scale_emb
                     if not self.args.lm_config.use_mup else 1.0)
        audio_start_token = 101

        if ref_audio is not None and ref_text is not None:
            ids = np.asarray(
                tokenizer.encode(ref_text + text), np.int64).tolist()
            ids.append(audio_start_token)
            text_len = len(ids)
            feat = self._encode_prompt_audio(
                np.asarray(ref_audio, np.float32).reshape(-1))
            audio_len = feat.shape[0]
            tok = jnp.asarray([ids + [0] * audio_len], jnp.int32)
            audio_feat = jnp.concatenate(
                [jnp.zeros((text_len, self.patch_size, self.feat_dim)),
                 feat], axis=0)[None]
            tmask = jnp.asarray([[1.0] * text_len + [0.0] * audio_len])
            amask = 1.0 - tmask
            feat_embed = self.enc_to_lm_proj(self.feat_encoder(audio_feat))
            text_embed = self.base_lm.embed_tokens(tok) * scale_emb
            combined = (tmask[..., None] * text_embed
                        + amask[..., None] * feat_embed)
            # text region keeps raw hidden; audio region goes through FSQ —
            # the final position is audio, so FSQ applies
            fsq_all = jnp.array(True)
            prefix_feat = audio_feat[:, -1]
            token_count = text_len
        else:
            ids = np.asarray(tokenizer.encode(text), np.int64).tolist()
            ids.append(audio_start_token)
            token_count = len(ids)
            combined = self.base_lm.embed_tokens(
                jnp.asarray([ids], jnp.int32)) * scale_emb
            fsq_all = jnp.array(True)
            prefix_feat = jnp.zeros((1, self.patch_size, self.feat_dim))

        T0 = combined.shape[1]
        max_steps = min(max_tokens, self.args.max_length)
        # under a running server a VoxCPMBatcher may be installed:
        # concurrent requests' dual-LM patch decodes run in lock-step
        from ....serving import get_infer_hook

        hook = get_infer_hook(self)
        if (hook is not None
                and int(inference_timesteps) == hook.n_timesteps
                and float(cfg_value) == hook.cfg_value):
            patches = hook.submit(
                np.asarray(combined), np.asarray(prefix_feat),
                max_tokens=max_steps,
                seed=(seed if seed is not None
                      else int(np.random.randint(0, 2**31 - 1))),
            ).result()  # (n, P, D)
            n = int(patches.shape[0])
            feats = jnp.asarray(patches).reshape(1, -1, self.feat_dim)
        else:
            Tp = max(16, ((T0 + 15) // 16) * 16)
            combined = jnp.pad(combined, ((0, 0), (0, Tp - T0), (0, 0)))
            lm_caches = self.base_lm.make_caches(1, Tp + max_steps + 1)
            res_caches = self.residual_lm.make_caches(1, Tp + max_steps + 1)
            key = (jax.random.PRNGKey(seed) if seed is not None
                   else jax.random.PRNGKey(np.random.randint(0, 2**31 - 1)))
            out, n = _voxcpm_generate(
                self, lm_caches, res_caches, combined,
                jnp.array(T0, jnp.int32), prefix_feat, fsq_all, key,
                max_steps, int(inference_timesteps), float(cfg_value))
            n = int(n)
            feats = out[:n].reshape(1, -1, self.feat_dim)
        audio = np.asarray(self.audio_vae.decode(feats)).reshape(-1)
        elapsed = time.perf_counter() - start
        dur = len(audio) / self.sample_rate
        yield GenerationResult(
            audio=audio, samples=len(audio), sample_rate=self.sample_rate,
            segment_idx=0, token_count=token_count,
            audio_duration=format_duration(dur),
            real_time_factor=round(elapsed / max(dur, 1e-9), 2),
            prompt={"tokens": token_count}, audio_samples={},
            processing_time_seconds=elapsed, peak_memory_usage=0.0)

    def sanitize(self, weights: dict) -> dict:
        from ....nn.sanitize import orient_weights_to_model

        out = {}
        for key, value in weights.items():
            k = key
            if "fc_logvar" in k:
                continue
            k = k.replace(".self_attn.", ".")
            k = k.replace(".mlp.gate_proj.", ".gate_proj.")
            k = k.replace(".mlp.up_proj.", ".up_proj.")
            k = k.replace(".mlp.down_proj.", ".down_proj.")
            out[k] = value
        return orient_weights_to_model(self, out)

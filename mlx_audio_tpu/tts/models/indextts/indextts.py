"""IndexTTS: conformer+perceiver-conditioned GPT-2 mel-code LM with a
speaker-conditioned BigVGAN latent vocoder.

TPU-native re-implementation of the reference
mlx_audio/tts/models/indextts/ (indextts.py, conformer.py, attention.py,
perceiver.py, ecapa_tdnn/*, bigvgan.py, mel.py). The reference decodes one
mel code per host step while accumulating GPT latents; here the whole AR
loop — sampling, latent collection, EOS — runs as one `lax.while_loop`,
and the collected latents feed the conditioned BigVGAN in a second jitted
call.
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

from ....codec.models.bigvgan.bigvgan import BigVGAN, BigVGANConfig
from ....dsp import mel_filters, stft
from ....lm.cache import KVCache
from ....lm.gpt2 import GPT2Config, GPT2Model
from ....nn import layers as nn
from ....nn.module import Module
from ..base import GenerationResult, format_duration

__all__ = ["Model", "ModelArgs", "GPTConfig", "ConformerArgs",
           "BigVGANConditioning", "ECPATDNN", "PerceiverResampler",
           "log_mel_spectrogram"]


def log_mel_spectrogram(audio, sample_rate: int = 24_000, n_mels: int = 100,
                        n_fft: int = 1024, hop_length: int = 256):
    """reference mel.py → (1, T, n_mels)."""
    spec = stft(jnp.asarray(audio, jnp.float32), n_fft=n_fft,
                hop_length=hop_length, win_length=n_fft, window="hann")
    mag = jnp.abs(spec)
    filters = mel_filters(sample_rate, n_fft, n_mels, norm=None,
                          mel_scale="htk")
    mel = mag @ filters.T
    return jnp.log(jnp.maximum(mel, 1e-5))[None]


# ---------------------------------------------------------------------------
# ECAPA-TDNN speaker encoder (reference ecapa_tdnn/*)
# ---------------------------------------------------------------------------
class TDNN(Module):
    """Reflect-padded conv + ReLU + BatchNorm (reference tdnn.py)."""

    def __init__(self, in_channels, out_channels, kernel_size, dilation=1,
                 groups=1, bias=True):
        self.conv = nn.Conv1d(in_channels, out_channels, kernel_size,
                              dilation=dilation, groups=groups, bias=bias)
        self.norm = nn.BatchNorm(out_channels)
        self.padding = ((kernel_size - 1) * dilation) // 2

    def __call__(self, x):
        if self.padding > 0:
            top = x[:, 1: self.padding + 1][:, ::-1]
            bot = x[:, -(self.padding + 1): -1][:, ::-1]
            x = jnp.concatenate([top, x, bot], axis=1)
        return self.norm(jax.nn.relu(self.conv(x)))


class Res2Net(Module):
    def __init__(self, in_channels, out_channels, kernel_size, scale,
                 dilation=1):
        self.scale = scale
        self.blocks = [TDNN(in_channels // scale, out_channels // scale,
                            kernel_size, dilation)
                       for _ in range(scale - 1)]

    def __call__(self, x):
        segs = jnp.split(x, self.scale, axis=-1)
        y = [segs[0]]
        for i in range(1, len(segs)):
            prev = y[-1] if i > 1 else 0
            y.append(self.blocks[i - 1](segs[i] + prev))
        return jnp.concatenate(y, axis=-1)


class SE(Module):
    def __init__(self, in_channels, se_channels, out_channels):
        self.conv1 = nn.Conv1d(in_channels, se_channels, 1)
        self.conv2 = nn.Conv1d(se_channels, out_channels, 1)

    def __call__(self, x):
        s = x.mean(axis=1, keepdims=True)
        s = jax.nn.sigmoid(self.conv2(jax.nn.relu(self.conv1(s))))
        return s * x


class SeRes2Net(Module):
    def __init__(self, in_channels, out_channels, scale, attention_channels,
                 kernel_size=1, dilation=1):
        self.tdnn1 = TDNN(in_channels, out_channels, 1)
        self.res2net_block = Res2Net(out_channels, out_channels, kernel_size,
                                     scale, dilation)
        self.tdnn2 = TDNN(out_channels, out_channels, 1)
        self.se_block = SE(out_channels, attention_channels, out_channels)
        if in_channels != out_channels:
            self.shortcut = nn.Conv1d(in_channels, out_channels, 1)

    def __call__(self, x):
        if hasattr(self, "shortcut"):
            x = self.shortcut(x)
        return x + self.se_block(self.tdnn2(self.res2net_block(
            self.tdnn1(x))))


class AttentiveStatisticsPooling(Module):
    def __init__(self, channels, attention_channels, global_context=True):
        self.global_context = global_context
        self.tdnn = TDNN(channels * 3 if global_context else channels,
                         attention_channels, 1)
        self.conv = nn.Conv1d(attention_channels, channels, 1)

    def __call__(self, x):
        N, L, C = x.shape
        if self.global_context:
            gm = x.mean(axis=1, keepdims=True)
            gs = jnp.sqrt(((x - gm) ** 2).mean(axis=1, keepdims=True) + 1e-12)
            attn_in = jnp.concatenate(
                [x, jnp.repeat(gm, L, 1), jnp.repeat(gs, L, 1)], axis=2)
        else:
            attn_in = x
        attn = self.conv(jnp.tanh(self.tdnn(attn_in)))
        attn = jax.nn.softmax(attn, axis=1)
        mean = (x * attn).sum(axis=1, keepdims=True)
        std = jnp.sqrt(((x - mean) ** 2 * attn).sum(axis=1, keepdims=True)
                       + 1e-12)
        return jnp.concatenate([mean, std], axis=2)


@dataclass
class ECPATDNNArgs:
    input_size: int
    lin_neurons: int = 192
    channels: List[int] = field(
        default_factory=lambda: [512, 512, 512, 512, 1536])
    kernel_sizes: List[int] = field(default_factory=lambda: [5, 3, 3, 3, 1])
    dilations: List[int] = field(default_factory=lambda: [1, 2, 3, 4, 1])
    attention_channels: int = 128
    res2net_scale: int = 8
    se_channels: int = 128
    global_context: bool = True


class ECPATDNN(Module):
    """reference ecapa_tdnn/ecapa_tdnn.py:26-91."""

    def __init__(self, args: ECPATDNNArgs):
        self.blocks = [TDNN(args.input_size, args.channels[0],
                            args.kernel_sizes[0],
                            dilation=args.dilations[0])] + [
            SeRes2Net(args.channels[i - 1], args.channels[i],
                      args.res2net_scale, args.se_channels,
                      args.kernel_sizes[i], args.dilations[i])
            for i in range(1, len(args.channels) - 1)
        ]
        self.mfa = TDNN(args.channels[-2] * (len(args.channels) - 2),
                        args.channels[-1], args.kernel_sizes[-1],
                        dilation=args.dilations[-1])
        self.asp = AttentiveStatisticsPooling(args.channels[-1],
                                              args.attention_channels,
                                              args.global_context)
        self.asp_bn = nn.BatchNorm(args.channels[-1] * 2)
        self.fc = nn.Conv1d(args.channels[-1] * 2, args.lin_neurons, 1)

    def __call__(self, x):
        xl = []
        for layer in self.blocks:
            if isinstance(layer, SeRes2Net):
                x = layer(x)
                xl.append(x)
            else:
                x = layer(x)
        x = self.mfa(jnp.concatenate(xl, axis=2))
        x = self.asp_bn(self.asp(x))
        return self.fc(x)


# ---------------------------------------------------------------------------
# conformer conditioner (reference conformer.py, attention.py)
# ---------------------------------------------------------------------------
@dataclass
class ConformerArgs:
    input_size: int = 100
    output_size: int = 256
    num_blocks: int = 6
    linear_units: int = 2048
    attention_heads: int = 4
    pos_enc_layer_type: str = "rel_pos"
    input_layer: str = "conv2d"
    cnn_module_kernel: int = 15
    pos_emb_max_len: int = 2048
    use_bias: bool = True
    xscaling: bool = True
    macaron_style: bool = False
    perceiver_mult: int = 2

    @classmethod
    def from_dict(cls, d):
        return cls(**{k: v for k, v in d.items()
                      if k in cls.__dataclass_fields__})


class RelPositionMHA(Module):
    """NeMo-style rel-pos attention with matrix_bd as additive bias
    (reference attention.py:54-125)."""

    def __init__(self, n_head, n_feat, bias=True):
        self.n_head = n_head
        self.head_dim = n_feat // n_head
        self.scale = self.head_dim**-0.5
        self.linear_q = nn.Linear(n_feat, n_feat, bias=bias)
        self.linear_k = nn.Linear(n_feat, n_feat, bias=bias)
        self.linear_v = nn.Linear(n_feat, n_feat, bias=bias)
        self.linear_out = nn.Linear(n_feat, n_feat, bias=bias)
        self.linear_pos = nn.Linear(n_feat, n_feat, bias=False)
        self.pos_bias_u = jnp.zeros((n_head, self.head_dim))
        self.pos_bias_v = jnp.zeros((n_head, self.head_dim))

    def __call__(self, x, pos_emb):
        B, T, _ = x.shape
        q = self.linear_q(x).reshape(B, T, self.n_head, self.head_dim)
        k = self.linear_k(x).reshape(B, T, self.n_head, self.head_dim)
        v = self.linear_v(x).reshape(B, T, self.n_head, self.head_dim)
        p = self.linear_pos(pos_emb).reshape(
            1, -1, self.n_head, self.head_dim).transpose(0, 2, 1, 3)
        q_u = (q + self.pos_bias_u).transpose(0, 2, 1, 3)
        q_v = (q + self.pos_bias_v).transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        bd = (q_v @ p.transpose(0, 1, 3, 2)) * self.scale
        scores = (q_u @ k.transpose(0, 1, 3, 2)) * self.scale + bd
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        o = (attn @ v).transpose(0, 2, 1, 3).reshape(B, T, -1)
        return self.linear_out(o)


class ConformerConv(Module):
    def __init__(self, args: ConformerArgs):
        d = args.output_size
        self.pointwise_conv1 = nn.Conv1d(d, 2 * d, 1, bias=args.use_bias)
        self.depthwise_conv = nn.Conv1d(d, d, args.cnn_module_kernel,
                                        padding=(args.cnn_module_kernel - 1)
                                        // 2, groups=d, bias=args.use_bias)
        self.norm = nn.LayerNorm(d)
        self.pointwise_conv2 = nn.Conv1d(d, d, 1, bias=args.use_bias)

    def __call__(self, x):
        x = self.pointwise_conv1(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * jax.nn.sigmoid(b)
        x = jax.nn.silu(self.norm(self.depthwise_conv(x)))
        return self.pointwise_conv2(x)


class ConformerBlock(Module):
    def __init__(self, args: ConformerArgs):
        d = args.output_size
        self.norm_mha = nn.LayerNorm(d)
        self.self_attn = RelPositionMHA(args.attention_heads, d,
                                        args.use_bias)
        self.norm_conv = nn.LayerNorm(d)
        self.conv_module = ConformerConv(args)
        self.norm_ff = nn.LayerNorm(d)
        self.feed_forward = nn.Sequential(
            nn.Linear(d, args.linear_units, bias=args.use_bias), nn.SiLU(),
            nn.Linear(args.linear_units, d, bias=args.use_bias))
        self.norm_final = nn.LayerNorm(d)

    def __call__(self, x, pos_emb):
        x = x + self.self_attn(self.norm_mha(x), pos_emb)
        x = x + self.conv_module(self.norm_conv(x))
        x = x + self.feed_forward(self.norm_ff(x))
        return self.norm_final(x)


class Conv2dSubsampling(Module):
    """conv2d (4x) front (reference conformer.py:149-207)."""

    _LAYERS = {"conv2d2": [(3, 2)], "conv2d3": [(5, 3)],
               "conv2d4": [(3, 2), (3, 2)], "conv2d": [(3, 2), (3, 2)],
               "conv2d6": [(3, 2), (5, 3)],
               "conv2d8": [(3, 2), (3, 2), (3, 2)]}

    def __init__(self, args: ConformerArgs):
        layers = self._LAYERS[args.input_layer]
        self.conv = []
        in_ch = 1
        out_freq = args.input_size
        for ks, stride in layers:
            self.conv.append(nn.Conv2d(in_ch, args.output_size, ks,
                                       stride=stride))
            in_ch = args.output_size
            out_freq = (out_freq - ks + stride) // stride
        self.out = [nn.Linear(args.output_size * out_freq, args.output_size)]

    def __call__(self, x):
        # x: (B, T, F) → NHWC (B, T, F, 1)
        h = x[..., None]
        for conv in self.conv:
            h = jax.nn.relu(conv(h))
        B, T, F, C = h.shape
        h = h.swapaxes(2, 3).reshape(B, T, -1)
        return self.out[0](h)


class Conformer(Module):
    def __init__(self, args: ConformerArgs):
        self.args = args
        self.embed = Conv2dSubsampling(args)
        self.encoders = [ConformerBlock(args)
                         for _ in range(args.num_blocks)]
        self.after_norm = nn.LayerNorm(args.output_size, eps=1e-5)
        d = args.output_size
        pos = np.arange(args.pos_emb_max_len)[:, None].astype(np.float32)
        div = np.exp(np.arange(0, d, 2) * -(math.log(10000.0) / d))
        pe = np.zeros((args.pos_emb_max_len, d), np.float32)
        pe[:, 0::2] = np.sin(pos * div)
        pe[:, 1::2] = np.cos(pos * div)
        self._pe = jnp.asarray(pe[None])
        self.xscale = math.sqrt(d) if args.xscaling else 1.0

    def __call__(self, x):
        x = self.embed(x)
        pos_emb = self._pe[:, : x.shape[1]]
        x = x * self.xscale
        for layer in self.encoders:
            x = layer(x, pos_emb)
        return self.after_norm(x)


class PerceiverResampler(Module):
    """reference perceiver.py:22-62."""

    def __init__(self, n_dim, n_dim_context, n_ff_mult=2, n_heads=8,
                 n_latents=32, n_dim_head=64, n_depth=2):
        self.n_heads = n_heads
        self.n_dim_head = n_dim_head
        if n_dim_context != n_dim:
            self.proj_context = nn.Linear(n_dim_context, n_dim)
        self.latents = jnp.zeros((n_latents, n_dim))
        self.layers = [
            [_PerceiverAttention(n_heads, n_dim, n_dim_head),
             _GatedGeluFF(n_dim, (n_dim * n_ff_mult * 2) // 3)]
            for _ in range(n_depth)
        ]
        self.norm = nn.RMSNorm(n_dim)

    def __call__(self, x):
        B = x.shape[0]
        latents = jnp.broadcast_to(self.latents,
                                   (B,) + self.latents.shape)
        if hasattr(self, "proj_context"):
            x = self.proj_context(x)
        for attn, ff in self.layers:
            kv = jnp.concatenate([x, latents], axis=-2)
            latents = latents + attn(latents, kv)
            latents = latents + ff(latents)
        return self.norm(latents)


class _PerceiverAttention(Module):
    def __init__(self, n_head, n_feat, head_dim):
        inner = n_head * head_dim
        self.n_head = n_head
        self.head_dim = head_dim
        self.linear_q = nn.Linear(n_feat, inner, bias=False)
        self.linear_k = nn.Linear(n_feat, inner, bias=False)
        self.linear_v = nn.Linear(n_feat, inner, bias=False)
        self.linear_out = nn.Linear(inner, n_feat, bias=False)

    def __call__(self, q_in, kv):
        B, Tq, _ = q_in.shape
        Tk = kv.shape[1]
        q = self.linear_q(q_in).reshape(B, Tq, self.n_head, self.head_dim)
        k = self.linear_k(kv).reshape(B, Tk, self.n_head, self.head_dim)
        v = self.linear_v(kv).reshape(B, Tk, self.n_head, self.head_dim)
        q, k, v = (a.transpose(0, 2, 1, 3) for a in (q, k, v))
        scores = q @ k.transpose(0, 1, 3, 2) * self.head_dim**-0.5
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
            q_in.dtype)
        o = (attn @ v).transpose(0, 2, 1, 3).reshape(B, Tq, -1)
        return self.linear_out(o)


class _GatedGeluFF(Module):
    def __init__(self, dim, d_ff):
        self.w_1 = nn.Linear(dim, d_ff * 2)
        self.w_2 = nn.Linear(d_ff, dim)

    def __call__(self, x):
        a, gate = jnp.split(self.w_1(x), 2, axis=-1)
        return self.w_2(jax.nn.gelu(gate) * a)


# ---------------------------------------------------------------------------
# conditioned BigVGAN (reference bigvgan.py)
# ---------------------------------------------------------------------------
class BigVGANConditioning(BigVGAN):
    def __init__(self, config):
        cfg = BigVGANConfig.from_dict(config) if isinstance(config, dict) \
            else config
        gpt_dim = (config.get("gpt_dim", 1) if isinstance(config, dict)
                   else getattr(config, "gpt_dim", 1))
        spk_dim = (config.get("speaker_embedding_dim", 1)
                   if isinstance(config, dict)
                   else getattr(config, "speaker_embedding_dim", 1))
        super().__init__(cfg)
        C0 = cfg.upsample_initial_channel
        self.conv_pre = nn.Conv1d(gpt_dim, C0, 7, padding=3)
        self.speaker_encoder = ECPATDNN(
            ECPATDNNArgs(cfg.num_mels, lin_neurons=spk_dim))
        self.cond_layer = nn.Conv1d(spk_dim, C0, 1)
        self.conds = [nn.Conv1d(spk_dim, C0 // (2 ** (i + 1)), 1)
                      for i in range(len(self.ups))]

    def __call__(self, latents, mel_refer):
        """latents (B, T, gpt_dim), mel_refer (B, T_ref, n_mels)."""
        spk = self.speaker_encoder(mel_refer)  # (B, 1, spk_dim)
        x = self.conv_pre(latents) + self.cond_layer(spk)
        for step in range(self.num_upsamples):
            for up in self.ups[step]:
                x = up(x)
            x = x + self.conds[step](spk)
            xs = self.resblocks[step * self.num_kernels](x)
            for idx in range(1, self.num_kernels):
                xs = xs + self.resblocks[step * self.num_kernels + idx](x)
            x = xs / self.num_kernels
        x = self.conv_post(self.activation_post(x))
        if self.use_tanh_at_final:
            return jnp.tanh(x)
        return jnp.clip(x, -1.0, 1.0)


# ---------------------------------------------------------------------------
# GPT mel-code LM (reference indextts.py:30-424)
# ---------------------------------------------------------------------------
@dataclass
class GPTConfig:
    model_dim: int = 1024
    heads: int = 16
    layers: int = 20
    max_mel_tokens: int = 800
    max_text_tokens: int = 600
    number_text_tokens: int = 12000
    number_mel_codes: int = 8194
    start_mel_token: int = 8192
    stop_mel_token: int = 8193
    start_text_token: int = 0
    stop_text_token: int = 1
    use_mel_codes_as_input: bool = True
    mel_length_compression: int = 1024
    condition_type: str = "conformer_perceiver"
    condition_module: Any = None
    max_conditioning_inputs: int = 1
    condition_num_latent: int = 32

    def __post_init__(self):
        if isinstance(self.condition_module, dict):
            self.condition_module = ConformerArgs.from_dict(
                self.condition_module)
        self.condition_module = self.condition_module or ConformerArgs()


@dataclass
class ModelArgs:
    gpt: Any = None
    bigvgan: Any = None
    tokenizer_name: str = ""
    sample_rate: int = 24000

    def __post_init__(self):
        if isinstance(self.gpt, dict):
            self.gpt = GPTConfig(**{k: v for k, v in self.gpt.items()
                                    if k in GPTConfig.__dataclass_fields__})
        self.gpt = self.gpt or GPTConfig()


@partial(jax.jit,
         static_argnames=("max_tokens", "temp", "top_k", "sampler"),
         donate_argnames=("caches",))
def _indextts_decode(model, caches, embedding, prefill_len, key,
                     max_tokens: int, temp: float, top_k: int,
                     sampler=None):
    """AR mel-code decode collecting per-step GPT latents, one dispatch
    (reference indextts.py:353-424)."""
    stop = model.args.gpt.stop_mel_token
    D = model.args.gpt.model_dim
    Tp = embedding.shape[1]
    S = caches[0].max_len
    q_idx = jnp.arange(Tp)[:, None]
    k_idx = jnp.arange(S)[None, :]
    ok = (k_idx <= q_idx) & (k_idx < prefill_len)
    mask = jnp.where(ok, 0.0, -jnp.inf)[None, None]
    h, caches = model.gpt(embedding, caches, positions=jnp.arange(Tp),
                          mask=mask)
    last = jnp.clip(prefill_len - 1, 0, Tp - 1)
    h_last = h[:, last]

    latents = jnp.zeros((max_tokens, D), jnp.float32)

    def sample(logits, key):
        if sampler is not None:
            # custom traceable sampler (reference indextts.py:360,376)
            return sampler(logits, key)
        if top_k > 0:
            kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
            logits = jnp.where(logits < kth, -jnp.inf, logits)
        return jax.random.categorical(key, logits / max(temp, 1e-5),
                                      axis=-1)

    def cond(s):
        return (s[0] < max_tokens) & ~s[5]

    def body(s):
        step, caches, h_last, latents, key, done = s
        h_norm = model.final_norm(h_last)
        latents = latents.at[step].set(h_norm[0])
        logits = model.mel_head(h_norm).astype(jnp.float32)
        key, sub = jax.random.split(key)
        tok = sample(logits, sub)[0]
        done = done | (tok == stop)

        emb = (model.mel_embedding.weight[tok]
               + model.mel_pos_embedding.weight[step])[None, None]
        valid = (k_idx[0] < prefill_len) | ((k_idx[0] >= Tp)
                                            & (k_idx[0] <= Tp + step))
        dmask = jnp.where(valid, 0.0, -jnp.inf)[None, None, None, :]
        h, caches = model.gpt(emb, caches,
                              positions=(prefill_len + step)[None],
                              mask=dmask)
        step = jnp.where(done, step, step + 1)
        return (step, caches, h[:, -1], latents, key, done)

    state = (jnp.array(0, jnp.int32), caches, h_last, latents, key,
             jnp.array(False))
    n, _, _, latents, _, _ = jax.lax.while_loop(cond, body, state)
    return latents, n + 1  # the reference keeps the latent of the EOS step


class Model(Module):
    """reference indextts.py:62-424."""

    _RUNTIME: dict = {}

    def __init__(self, args: Any = None):
        if isinstance(args, dict):
            args = ModelArgs(**{k: v for k, v in args.items()
                                if k in ModelArgs.__dataclass_fields__})
        self.args = args or ModelArgs()
        g = self.args.gpt
        self.sample_rate = self.args.sample_rate
        self.text_embedding = nn.Embedding(g.number_text_tokens + 1,
                                           g.model_dim)
        self.mel_embedding = nn.Embedding(g.number_mel_codes, g.model_dim)
        self.mel_pos_embedding = nn.Embedding(
            g.max_mel_tokens + 2 + g.max_conditioning_inputs, g.model_dim)
        self.text_pos_embedding = nn.Embedding(g.max_text_tokens + 2,
                                               g.model_dim)
        self.text_head = nn.Linear(g.model_dim, g.number_text_tokens + 1)
        self.mel_head = nn.Linear(g.model_dim, g.number_mel_codes)
        self.conditioning_encoder = Conformer(g.condition_module)
        self.perceiver_encoder = PerceiverResampler(
            g.model_dim, n_dim_context=g.condition_module.output_size,
            n_ff_mult=g.condition_module.perceiver_mult,
            n_heads=g.condition_module.attention_heads,
            n_latents=g.condition_num_latent)
        gcfg = GPT2Config(n_embd=g.model_dim, n_head=g.heads,
                          n_layer=g.layers, n_positions=1, vocab_size=1)
        self.gpt = GPT2Model(gcfg)
        # positions are supplied by the learned text/mel embeddings
        self.gpt.wpe = self.gpt.wpe.replace(
            weight=jnp.zeros((1, g.model_dim)))
        self.final_norm = nn.LayerNorm(g.model_dim)
        if self.args.bigvgan is not None:
            self.bigvgan = BigVGANConditioning(self.args.bigvgan)

    def set_runtime(self, tokenizer=None, bigvgan=None):
        rt = Model._RUNTIME.setdefault(id(self), {})
        if tokenizer is not None:
            rt["tokenizer"] = tokenizer
        if bigvgan is not None:
            rt["bigvgan"] = bigvgan

    def make_batcher(self, **kwargs):
        """Serving batcher: concurrent requests' latent decodes run in
        lock-step; BigVGAN vocoding stays per-request."""
        from .batcher import IndexTTSBatcher

        return IndexTTSBatcher(self, **kwargs)

    def get_conditioning(self, mel):
        return self.perceiver_encoder(self.conditioning_encoder(mel))

    def prepare_input_embedding(self, text_tokens: List[int],
                                ref_mel) -> jnp.ndarray:
        """[conditioning ‖ text(+pos)] (reference indextts.py:257-303)."""
        g = self.args.gpt
        cond = self.get_conditioning(jnp.asarray(ref_mel))
        tokens = [g.start_text_token] + list(text_tokens) + \
            [g.stop_text_token, g.start_mel_token]
        ids = jnp.asarray([tokens], jnp.int32)
        text_emb = (self.text_embedding(ids)
                    + self.text_pos_embedding.weight[: ids.shape[1]][None])
        return jnp.concatenate([cond, text_emb], axis=1)

    def generate(self, text: str, ref_audio=None, ref_mel=None,
                 max_tokens: int = 5000, temperature: float = 0.8,
                 top_k: int = 30, seed: Optional[int] = None,
                 sampler=None, verbose: bool = False,
                 **kwargs) -> Generator[GenerationResult, None, None]:
        start = time.perf_counter()
        rt = Model._RUNTIME.get(id(self), {})
        if ref_audio is not None:
            ref_mel = log_mel_spectrogram(
                np.asarray(ref_audio, np.float32).reshape(-1),
                n_mels=self.args.gpt.condition_module.input_size)
        if ref_mel is None:
            raise ValueError("Must provide ref_audio or ref_mel")
        tokenizer = rt.get("tokenizer")
        if tokenizer is None:
            # sentencepiece tokenizer.model next to the weights
            # (reference indextts.py:81-92); gated optional dep
            mp = getattr(self.args, "model_path", None) or getattr(
                getattr(self, "config", None), "model_path", None)
            if mp:
                from pathlib import Path

                tok_file = Path(mp) / "tokenizer.model"
                if tok_file.exists():
                    try:
                        import sentencepiece as spm
                    except ImportError:
                        raise RuntimeError(
                            "IndexTTS needs the `sentencepiece` package to "
                            f"load {tok_file}; install it or pass a "
                            "tokenizer via set_runtime()") from None
                    tokenizer = spm.SentencePieceProcessor(
                        model_file=str(tok_file))
                    Model._RUNTIME.setdefault(id(self), {})[
                        "tokenizer"] = tokenizer
        if tokenizer is None:
            raise RuntimeError("IndexTTS tokenizer not set — call "
                               "set_runtime() or load via load_model()")
        # text normalization + CJK char spacing before the sentencepiece
        # tokenizer (reference indextts.py:276)
        from . import normalize as _norm

        tokens = tokenizer.encode(
            _norm.tokenize_by_CJK_char(_norm.normalize(text)))

        embedding = self.prepare_input_embedding(tokens, ref_mel)
        T0 = embedding.shape[1]
        g = self.args.gpt
        max_steps = min(max_tokens, g.max_mel_tokens)
        # under a running server an IndexTTSBatcher may be installed:
        # concurrent requests' latent decodes then run in lock-step
        from ....serving import get_infer_hook

        hook = get_infer_hook(self)
        if hook is not None and sampler is None:
            latents = hook.submit(
                np.asarray(embedding[:, :T0]), max_tokens=max_steps,
                temperature=temperature, top_k=top_k,
                seed=(seed if seed is not None
                      else int(np.random.randint(0, 2**31 - 1))),
            ).result()  # (n, D)
            n = int(latents.shape[0])
            latents = jnp.asarray(latents)[None]
        else:
            Tp = max(16, ((T0 + 15) // 16) * 16)
            embedding = jnp.pad(embedding,
                                ((0, 0), (0, Tp - T0), (0, 0)))
            caches = [KVCache(1, g.heads, Tp + max_steps + 1,
                              g.model_dim // g.heads, jnp.float32)
                      for _ in range(g.layers)]
            key = (jax.random.PRNGKey(seed) if seed is not None
                   else jax.random.PRNGKey(np.random.randint(0, 2**31 - 1)))
            latents, n = _indextts_decode(
                self, caches, embedding, jnp.array(T0, jnp.int32), key,
                max_steps, float(temperature), int(top_k), sampler)
            n = int(n)
            latents = latents[:n][None]  # (1, n, D)
        if verbose:
            print(f"[indextts] {n} mel tokens")

        vocoder = rt.get("bigvgan", getattr(self, "bigvgan", None))
        if vocoder is None:
            raise RuntimeError("IndexTTS BigVGAN vocoder not attached")
        audio = np.asarray(vocoder(latents, jnp.asarray(ref_mel)))[0, :, 0]
        elapsed = time.perf_counter() - start
        dur = len(audio) / self.sample_rate
        yield GenerationResult(
            audio=audio, samples=len(audio), sample_rate=self.sample_rate,
            segment_idx=0, token_count=n,
            audio_duration=format_duration(dur),
            real_time_factor=round(elapsed / max(dur, 1e-9), 2),
            prompt={"tokens": len(tokens)}, audio_samples={},
            processing_time_seconds=elapsed, peak_memory_usage=0.0)

    def sanitize(self, weights: dict) -> dict:
        from ....nn.sanitize import orient_weights_to_model

        out = {}
        for key, value in weights.items():
            k = key
            if ".wte." in k or ".wpe." in k:
                continue
            k = k.replace("mel_pos_embedding.emb.", "mel_pos_embedding.")
            k = k.replace("text_pos_embedding.emb.", "text_pos_embedding.")
            k = k.replace("norm.norm", "norm").replace("conv.conv", "conv")
            out[k] = value
        return orient_weights_to_model(self, out)

"""Mimi — streaming SEANet + transformer codec with split residual VQ.

Behavioral spec: reference codec/models/mimi/ (mimi.py, modules/conv.py,
seanet.py, transformer.py, quantization.py). TPU-native differences:

- Streaming state is FUNCTIONAL: every streamable module exposes
  `init_state(batch)` / `step(x, state) → (y, state)` with *fixed-size*
  carry buffers (causal left-pad lives in the zero-initialized conv tail;
  the windowed transformer uses a ring KV cache with absolute positions) —
  so one whole codec step jits to a single program, vs the reference's
  python-object `_prev_xs` buffers (modules/conv.py:189-331).
- Non-streaming encode/decode are single jitted programs.
- Channels-last internally; public API keeps the reference's (B, C, T).

Streaming step granularity is one 12.5 Hz frame (1920 samples @ 24 kHz).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....lm.cache import RingKVCache
from ....nn import Conv1d, ConvTranspose1d, LayerNorm, Linear, Module
from ....ops.rope import apply_rope, rope_cos_sin

__all__ = ["Mimi", "MimiConfig", "mimi_202407", "MimiStreamingDecoder"]


@dataclass
class SeanetConfig:
    dimension: int = 512
    channels: int = 1
    causal: bool = True
    nfilters: int = 64
    nresidual_layers: int = 1
    ratios: List[int] = field(default_factory=lambda: [8, 6, 5, 4])
    ksize: int = 7
    residual_ksize: int = 3
    last_ksize: int = 3
    dilation_base: int = 2
    pad_mode: str = "constant"
    true_skip: bool = True
    compress: int = 2


@dataclass
class TransformerConfig:
    d_model: int = 512
    num_heads: int = 8
    num_layers: int = 8
    layer_scale: Optional[float] = 0.01
    context: int = 250
    max_period: float = 10000.0
    dim_feedforward: int = 2048
    gating: bool = False
    norm: str = "layer_norm"
    positional_embedding: str = "rope"
    bias_ff: bool = False
    bias_attn: bool = False
    kv_repeat: int = 1
    max_seq_len: int = 8192
    conv_layout: bool = True

    @property
    def head_dim(self) -> int:
        return self.d_model // self.num_heads


@dataclass
class MimiConfig:
    channels: int = 1
    sample_rate: float = 24000.0
    frame_rate: float = 12.5
    renormalize: bool = True
    seanet: SeanetConfig = field(default_factory=SeanetConfig)
    transformer: TransformerConfig = field(default_factory=TransformerConfig)
    quantizer_nq: int = 16
    quantizer_bins: int = 2048
    quantizer_dim: int = 256


def mimi_202407(num_codebooks: int) -> MimiConfig:
    return MimiConfig(quantizer_nq=num_codebooks)


def elu(x):
    return jax.nn.elu(x, 1.0)


# ---------------------------------------------------------------------------
# Streamable convolutions (functional state)
# ---------------------------------------------------------------------------


class StreamableConv1d(Module):
    """Causal conv with functional streaming tail. Full-mode matches the
    reference padding semantics (causal left pad + extra right pad)."""

    def __init__(self, in_channels, out_channels, ksize, stride, dilation,
                 groups, bias, causal, pad_mode):
        self.conv = Conv1d(in_channels, out_channels, ksize, stride=stride,
                           dilation=dilation, groups=groups, bias=bias)
        self.causal = causal
        self.pad_mode = pad_mode
        self.ksize = ksize
        self.stride = stride
        self.dilation = dilation
        self.out_channels = out_channels

    @property
    def _keff(self):
        return (self.ksize - 1) * self.dilation + 1

    def __call__(self, x):  # (B, T, C)
        keff = self._keff
        padding_total = keff - self.stride
        L = x.shape[1]
        nframes = max(L + padding_total - keff, 0) / self.stride + 1.0
        ideal = (int(math.ceil(nframes)) - 1) * self.stride + keff - padding_total
        extra = max(0, ideal - L)
        if self.causal:
            pl, pr = padding_total, extra
        else:
            pr = padding_total // 2
            pl = padding_total - pr
            pr += extra
        mode = "edge" if self.pad_mode == "edge" else "constant"
        x = jnp.pad(x, [(0, 0), (pl, pr), (0, 0)], mode=mode)
        return self.conv(x)

    def init_state(self, batch: int, in_channels: int):
        pad = self._keff - self.stride
        return jnp.zeros((batch, max(pad, 0), in_channels))

    def step(self, x, state):
        """x: (B, S, C) with S divisible by stride; state: (B, pad, C)."""
        buf = jnp.concatenate([state, x], axis=1)
        y = self.conv(buf)
        pad = self._keff - self.stride
        new_state = buf[:, buf.shape[1] - pad :] if pad > 0 else buf[:, :0]
        return y, new_state


class StreamableConvTranspose1d(Module):
    def __init__(self, in_channels, out_channels, ksize, stride, groups, bias,
                 causal):
        self.convtr = ConvTranspose1d(in_channels, out_channels, ksize,
                                      stride=stride, groups=groups, bias=bias)
        self.causal = causal
        self.ksize = ksize
        self.stride = stride
        self.out_channels = out_channels

    def __call__(self, x):
        pad_total = max(self.ksize - self.stride, 0)
        y = self.convtr(x)
        if self.causal:
            ul, ur = 0, pad_total
        else:
            ur = pad_total // 2
            ul = pad_total - ur
        return y[:, ul : y.shape[1] - ur]

    def init_state(self, batch: int):
        return jnp.zeros((batch, max(self.ksize - self.stride, 0), self.out_channels))

    def step(self, x, state):
        """x: (B, S, C); overlap-add of transposed-conv tails."""
        y = self.convtr(x)  # (B, (S-1)*stride + ksize, C)
        tail = self.ksize - self.stride
        pt = state.shape[1]
        if pt > 0:
            head = y[:, :pt] + state
            y = jnp.concatenate([head, y[:, pt:]], axis=1)
        out_len = y.shape[1] - tail
        new_state = y[:, out_len:]
        if hasattr(self.convtr, "bias"):
            new_state = new_state - self.convtr.bias
        return y[:, :out_len], new_state


# ---------------------------------------------------------------------------
# SEANet
# ---------------------------------------------------------------------------


class SeanetResnetBlock(Module):
    def __init__(self, cfg: SeanetConfig, dim: int, ksizes_and_dilations):
        hidden = dim // cfg.compress
        block = []
        for i, (ksize, dilation) in enumerate(ksizes_and_dilations):
            in_c = dim if i == 0 else hidden
            out_c = dim if i == len(ksizes_and_dilations) - 1 else hidden
            block.append(
                StreamableConv1d(in_c, out_c, ksize, 1, dilation, 1, True,
                                 cfg.causal, cfg.pad_mode)
            )
        self.block = block

    def __call__(self, x):
        residual = x
        for b in self.block:
            x = b(elu(x))
        return x + residual

    def init_state(self, batch, dim):
        states = []
        in_c = dim
        for b in self.block:
            states.append(b.init_state(batch, in_c))
            in_c = b.out_channels
        return states

    def step(self, x, states):
        residual = x
        new_states = []
        for b, s in zip(self.block, states):
            x, ns = b.step(elu(x), s)
            new_states.append(ns)
        return x + residual, new_states


class EncoderLayer(Module):
    def __init__(self, cfg: SeanetConfig, ratio: int, mult: int):
        dilation = 1
        self.residuals = []
        for _ in range(cfg.nresidual_layers):
            self.residuals.append(
                SeanetResnetBlock(
                    cfg, mult * cfg.nfilters,
                    [(cfg.residual_ksize, dilation), (1, 1)],
                )
            )
            dilation *= cfg.dilation_base
        self.downsample = StreamableConv1d(
            mult * cfg.nfilters, mult * cfg.nfilters * 2, ratio * 2, ratio, 1, 1,
            True, True, cfg.pad_mode,
        )
        self.dim = mult * cfg.nfilters

    def __call__(self, x):
        for r in self.residuals:
            x = r(x)
        return self.downsample(elu(x))

    def init_state(self, batch):
        return {
            "res": [r.init_state(batch, self.dim) for r in self.residuals],
            "down": self.downsample.init_state(batch, self.dim),
        }

    def step(self, x, state):
        res_states = []
        for r, s in zip(self.residuals, state["res"]):
            x, ns = r.step(x, s)
            res_states.append(ns)
        y, ds = self.downsample.step(elu(x), state["down"])
        return y, {"res": res_states, "down": ds}


class SeanetEncoder(Module):
    def __init__(self, cfg: SeanetConfig):
        mult = 1
        self.init_conv1d = StreamableConv1d(
            cfg.channels, mult * cfg.nfilters, cfg.ksize, 1, 1, 1, True,
            cfg.causal, cfg.pad_mode,
        )
        self.layers = []
        for ratio in reversed(cfg.ratios):
            self.layers.append(EncoderLayer(cfg, ratio, mult))
            mult *= 2
        self.final_conv1d = StreamableConv1d(
            mult * cfg.nfilters, cfg.dimension, cfg.last_ksize, 1, 1, 1, True,
            cfg.causal, cfg.pad_mode,
        )
        self.channels = cfg.channels
        self.final_in = mult * cfg.nfilters

    def __call__(self, x):
        x = self.init_conv1d(x)
        for layer in self.layers:
            x = layer(x)
        return self.final_conv1d(elu(x))

    def init_state(self, batch):
        return {
            "init": self.init_conv1d.init_state(batch, self.channels),
            "layers": [l.init_state(batch) for l in self.layers],
            "final": self.final_conv1d.init_state(batch, self.final_in),
        }

    def step(self, x, state):
        x, s_init = self.init_conv1d.step(x, state["init"])
        s_layers = []
        for l, s in zip(self.layers, state["layers"]):
            x, ns = l.step(x, s)
            s_layers.append(ns)
        y, s_final = self.final_conv1d.step(elu(x), state["final"])
        return y, {"init": s_init, "layers": s_layers, "final": s_final}


class DecoderLayer(Module):
    def __init__(self, cfg: SeanetConfig, ratio: int, mult: int):
        self.upsample = StreamableConvTranspose1d(
            mult * cfg.nfilters, mult * cfg.nfilters // 2, ratio * 2, ratio, 1,
            True, cfg.causal,
        )
        dilation = 1
        self.residuals = []
        for _ in range(cfg.nresidual_layers):
            self.residuals.append(
                SeanetResnetBlock(
                    cfg, mult * cfg.nfilters // 2,
                    [(cfg.residual_ksize, dilation), (1, 1)],
                )
            )
            dilation *= cfg.dilation_base
        self.dim_out = mult * cfg.nfilters // 2

    def __call__(self, x):
        x = self.upsample(elu(x))
        for r in self.residuals:
            x = r(x)
        return x

    def init_state(self, batch):
        return {
            "up": self.upsample.init_state(batch),
            "res": [r.init_state(batch, self.dim_out) for r in self.residuals],
        }

    def step(self, x, state):
        x, s_up = self.upsample.step(elu(x), state["up"])
        s_res = []
        for r, s in zip(self.residuals, state["res"]):
            x, ns = r.step(x, s)
            s_res.append(ns)
        return x, {"up": s_up, "res": s_res}


class SeanetDecoder(Module):
    def __init__(self, cfg: SeanetConfig):
        mult = 1 << len(cfg.ratios)
        self.init_conv1d = StreamableConv1d(
            cfg.dimension, mult * cfg.nfilters, cfg.ksize, 1, 1, 1, True,
            cfg.causal, cfg.pad_mode,
        )
        self.layers = []
        for ratio in cfg.ratios:
            self.layers.append(DecoderLayer(cfg, ratio, mult))
            mult //= 2
        self.final_conv1d = StreamableConv1d(
            cfg.nfilters, cfg.channels, cfg.last_ksize, 1, 1, 1, True,
            cfg.causal, cfg.pad_mode,
        )
        self.dimension = cfg.dimension
        self.nfilters = cfg.nfilters

    def __call__(self, x):
        x = self.init_conv1d(x)
        for layer in self.layers:
            x = layer(x)
        return self.final_conv1d(elu(x))

    def init_state(self, batch):
        return {
            "init": self.init_conv1d.init_state(batch, self.dimension),
            "layers": [l.init_state(batch) for l in self.layers],
            "final": self.final_conv1d.init_state(batch, self.nfilters),
        }

    def step(self, x, state):
        x, s_init = self.init_conv1d.step(x, state["init"])
        s_layers = []
        for l, s in zip(self.layers, state["layers"]):
            x, ns = l.step(x, s)
            s_layers.append(ns)
        y, s_final = self.final_conv1d.step(elu(x), state["final"])
        return y, {"init": s_init, "layers": s_layers, "final": s_final}


# ---------------------------------------------------------------------------
# Transformer (context-windowed, rope)
# ---------------------------------------------------------------------------


class LayerScale(Module):
    def __init__(self, dim: int):
        self.scale = jnp.ones((dim,))

    def __call__(self, x):
        return self.scale * x


class MimiAttention(Module):
    def __init__(self, cfg: TransformerConfig):
        self.in_proj = Linear(cfg.d_model, 3 * cfg.d_model, bias=cfg.bias_attn)
        self.out_proj = Linear(cfg.d_model, cfg.d_model, bias=cfg.bias_attn)
        self.num_heads = cfg.num_heads
        self.head_dim = cfg.head_dim
        self.context = cfg.context
        self.max_period = cfg.max_period

    def __call__(self, x, cache: Optional[RingKVCache] = None,
                 pos0: Optional[jax.Array] = None):
        B, T, D = x.shape
        qkv = self.in_proj(x).reshape(B, T, 3, self.num_heads, self.head_dim)
        q = jnp.transpose(qkv[:, :, 0], (0, 2, 1, 3))
        k = jnp.transpose(qkv[:, :, 1], (0, 2, 1, 3))
        v = jnp.transpose(qkv[:, :, 2], (0, 2, 1, 3))
        if pos0 is None:
            pos0 = jnp.array(0, jnp.int32)
        positions = pos0 + jnp.arange(T)
        cos, sin = rope_cos_sin(positions, self.head_dim, base=self.max_period)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        new_cache = None
        if cache is not None:
            k, v, new_cache = cache.update(k, v)
            mask = new_cache.attention_mask(T, self.context, pos0)
        else:
            qp = jnp.arange(T)[:, None]
            kp = jnp.arange(T)[None, :]
            delta = qp - kp
            ok = (delta >= 0) & (delta < self.context)
            mask = jnp.where(ok, 0.0, -jnp.inf).astype(jnp.float32)[None, None]

        scores = jnp.einsum(
            "bhtd,bhsd->bhts", q * self.head_dim**-0.5, k,
            preferred_element_type=jnp.float32,
        )
        probs = jax.nn.softmax(scores + mask, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhts,bhsd->bhtd", probs, v)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, T, D)
        return self.out_proj(out), new_cache


class MlpNoGating(Module):
    def __init__(self, cfg: TransformerConfig):
        self.linear1 = Linear(cfg.d_model, cfg.dim_feedforward, bias=cfg.bias_ff)
        self.linear2 = Linear(cfg.dim_feedforward, cfg.d_model, bias=cfg.bias_ff)

    def __call__(self, x):
        return self.linear2(jax.nn.gelu(self.linear1(x), approximate=True))


class MimiTransformerLayer(Module):
    def __init__(self, cfg: TransformerConfig):
        self.gating = MlpNoGating(cfg)
        self.norm1 = LayerNorm(cfg.d_model)
        self.norm2 = LayerNorm(cfg.d_model)
        if cfg.layer_scale is not None:
            self.layer_scale_1 = LayerScale(cfg.d_model)
            self.layer_scale_2 = LayerScale(cfg.d_model)
        self.self_attn = MimiAttention(cfg)

    def __call__(self, x, cache=None, pos0=None):
        a, new_cache = self.self_attn(self.norm1(x), cache, pos0)
        if hasattr(self, "layer_scale_1"):
            a = self.layer_scale_1(a)
        x = x + a
        m = self.gating(self.norm2(x))
        if hasattr(self, "layer_scale_2"):
            m = self.layer_scale_2(m)
        return x + m, new_cache


class ProjectedTransformer(Module):
    def __init__(self, cfg: TransformerConfig, input_dim: int, output_dims):
        self.transformer_layers = [
            MimiTransformerLayer(cfg) for _ in range(cfg.num_layers)
        ]
        if input_dim != cfg.d_model:
            self.input_proj = Linear(input_dim, cfg.d_model, bias=False)
        self.output_projs = [
            Linear(cfg.d_model, od, bias=False) if od != cfg.d_model else None
            for od in output_dims
        ]
        self.cfg = cfg

    def __call__(self, x, caches=None, pos0=None):
        # x: (B, T, C) channels-last
        if hasattr(self, "input_proj"):
            x = self.input_proj(x)
        new_caches = [] if caches is not None else None
        for i, layer in enumerate(self.transformer_layers):
            x, nc = layer(x, caches[i] if caches is not None else None, pos0)
            if new_caches is not None:
                new_caches.append(nc)
        outs = [x if p is None else p(x) for p in self.output_projs]
        return outs, new_caches

    def make_cache(self, batch: int):
        cfg = self.cfg
        return [
            RingKVCache(batch, cfg.num_heads, cfg.context, cfg.head_dim)
            for _ in self.transformer_layers
        ]


# ---------------------------------------------------------------------------
# Quantization
# ---------------------------------------------------------------------------


class EuclideanCodebook(Module):
    def __init__(self, dim: int, codebook_size: int):
        self.embedding_sum = jnp.zeros((codebook_size, dim))
        self.cluster_usage = jnp.ones((codebook_size,))
        self.initialized = jnp.zeros((1,))
        self.epsilon = 1e-5

    @property
    def embedding(self):
        usage = jnp.maximum(self.cluster_usage, self.epsilon)[:, None]
        return self.embedding_sum / usage

    def encode(self, x):  # (..., D) → indices
        emb = self.embedding.astype(jnp.float32)
        c2 = (emb * emb).sum(-1) / 2
        dot = jnp.einsum(
            "...d,nd->...n", x.astype(jnp.float32), emb,
            preferred_element_type=jnp.float32,
        )
        return jnp.argmin(c2 - dot, axis=-1)

    def decode(self, idx):
        return self.embedding[idx]


class VectorQuantization(Module):
    def __init__(self, dim: int, codebook_size: int):
        self.codebook = EuclideanCodebook(dim, codebook_size)

    def encode(self, x):  # (B, T, D)
        return self.codebook.encode(x)

    def decode(self, idx):
        return self.codebook.decode(idx)


class ResidualVectorQuantizer(Module):
    def __init__(self, dim, input_dim, output_dim, nq, bins,
                 force_projection=True):
        input_dim = input_dim or dim
        output_dim = output_dim or dim
        if input_dim != dim or force_projection:
            self.input_proj = Linear(input_dim, dim, bias=False)
        if output_dim != dim or force_projection:
            self.output_proj = Linear(dim, output_dim, bias=False)
        self.layers = [VectorQuantization(dim, bins) for _ in range(nq)]

    def encode(self, x):  # (B, T, D_in) → (B, nq, T)
        if hasattr(self, "input_proj"):
            x = self.input_proj(x)
        codes = []
        residual = x
        for layer in self.layers:
            idx = layer.encode(residual)
            residual = residual - layer.decode(idx)
            codes.append(idx)
        return jnp.stack(codes, axis=1)

    def decode(self, codes):  # (B, nq, T) → (B, T, D_out)
        q = None
        for i in range(codes.shape[1]):
            d = self.layers[i].decode(codes[:, i])
            q = d if q is None else q + d
        if hasattr(self, "output_proj"):
            q = self.output_proj(q)
        return q


class SplitResidualVectorQuantizer(Module):
    def __init__(self, dim, input_dim, output_dim, nq, bins):
        self.rvq_first = ResidualVectorQuantizer(
            dim, input_dim, output_dim, 1, bins, force_projection=True
        )
        self.rvq_rest = ResidualVectorQuantizer(
            dim, input_dim, output_dim, nq - 1, bins, force_projection=True
        )
        self.nq = nq

    def encode(self, x):
        codes = self.rvq_first.encode(x)
        if self.nq > 1:
            codes = jnp.concatenate([codes, self.rvq_rest.encode(x)], axis=1)
        return codes

    def decode(self, codes):
        q = self.rvq_first.decode(codes[:, :1])
        if self.nq > 1:
            q = q + self.rvq_rest.decode(codes[:, 1:])
        return q


# ---------------------------------------------------------------------------
# Mimi
# ---------------------------------------------------------------------------


def _hf_mimi_to_kyutai(weights: dict) -> dict:
    """transformers ``MimiModel`` state-dict names → kyutai-style names that
    the main sanitize loop understands. Also packs split q/k/v projections
    into the fused in_proj and squeezes 1×1-conv quantizer projections."""
    out = {}
    qkv = {}
    for k, v in weights.items():
        v = np.asarray(v)
        nk = (
            k.replace("encoder.layers.", "encoder.model.")
            .replace("decoder.layers.", "decoder.model.")
            .replace(
                "quantizer.semantic_residual_vector_quantizer.",
                "quantizer.rvq_first.",
            )
            .replace(
                "quantizer.acoustic_residual_vector_quantizer.",
                "quantizer.rvq_rest.",
            )
            .replace(".codebook.embed_sum", ".codebook.embedding_sum")
            .replace("_transformer.layers.", "_transformer.transformer_layers.")
            .replace(".self_attn.o_proj.", ".self_attn.out_proj.")
            .replace(".mlp.fc1.", ".linear1.")  # main loop adds .gating.
            .replace(".mlp.fc2.", ".linear2.")
            .replace(".input_layernorm.", ".norm1.")
            .replace(".post_attention_layernorm.", ".norm2.")
            .replace(".self_attn_layer_scale.", ".layer_scale_1.")
            .replace(".mlp_layer_scale.", ".layer_scale_2.")
            .replace("upsample.conv.", "upsample.convtr.")
        )
        # seanet decoder transposed convs are `.conv` in HF, `.convtr` in
        # kyutai naming: indices 2, 5, 8, … of the flat decoder list.
        m = re.match(r"decoder\.model\.(\d+)\.conv\.(.*)$", nk)
        if m and int(m.group(1)) >= 2 and (int(m.group(1)) - 2) % 3 == 0:
            dec_idxs = [
                int(mm.group(1)) for kk in weights
                if (mm := re.match(r"decoder\.layers\.(\d+)\.", kk))
            ]
            if int(m.group(1)) < max(dec_idxs):  # not the final conv
                nk = f"decoder.model.{m.group(1)}.convtr.{m.group(2)}"
        if ".self_attn." in nk and any(
            f".{p}_proj." in nk for p in ("q", "k", "v")
        ):
            qkv[nk] = v
            continue
        if (".input_proj." in nk or ".output_proj." in nk) and v.ndim == 3:
            v = v[..., 0]  # HF 1×1 conv → our Linear
        if nk.endswith(".codebook.initialized"):
            v = v.reshape((1,)).astype(np.float32)
        out[nk] = v
    for qk in [k for k in qkv if ".q_proj." in k]:
        stacked = np.concatenate(
            [qkv[qk], qkv[qk.replace(".q_proj.", ".k_proj.")],
             qkv[qk.replace(".q_proj.", ".v_proj.")]], axis=0
        )
        out[qk.replace(".q_proj.", ".in_proj.")] = stacked
    return out


class Mimi(Module):
    def __init__(self, cfg: MimiConfig):
        dim = cfg.seanet.dimension
        self.cfg = cfg
        encoder_frame_rate = cfg.sample_rate / math.prod(cfg.seanet.ratios)
        downsample_stride = int(encoder_frame_rate / cfg.frame_rate)
        self.encoder = SeanetEncoder(cfg.seanet)
        self.decoder = SeanetDecoder(cfg.seanet)
        self.quantizer = SplitResidualVectorQuantizer(
            dim=cfg.quantizer_dim, input_dim=dim, output_dim=dim,
            nq=cfg.quantizer_nq, bins=cfg.quantizer_bins,
        )
        self.encoder_transformer = ProjectedTransformer(
            cfg.transformer, input_dim=dim, output_dims=[dim]
        )
        self.decoder_transformer = ProjectedTransformer(
            cfg.transformer, input_dim=dim, output_dims=[dim]
        )
        self.downsample = StreamableConv1d(
            dim, dim, 2 * downsample_stride, downsample_stride, 1, 1, False,
            True, "edge",
        )
        self.upsample = StreamableConvTranspose1d(
            dim, dim, 2 * downsample_stride, downsample_stride, dim, False, True
        )
        self.downsample_stride = downsample_stride
        self.dim = dim

    @property
    def frame_rate(self) -> float:
        return self.cfg.frame_rate

    @property
    def sample_rate(self) -> float:
        return self.cfg.sample_rate

    @property
    def frame_size(self) -> int:
        return int(self.cfg.sample_rate / self.cfg.frame_rate)

    # ---- non-streaming (jitted) ----

    @staticmethod
    @jax.jit
    def _encode(model: "Mimi", x):  # x: (B, T, 1)
        h = model.encoder(x)
        h, _ = model.encoder_transformer(h)
        h = model.downsample(h[0] if isinstance(h, list) else h)
        return model.quantizer.encode(h)

    @staticmethod
    @jax.jit
    def _decode(model: "Mimi", codes):
        h = model.quantizer.decode(codes)
        h = model.upsample(h)
        outs, _ = model.decoder_transformer(h)
        return model.decoder(outs[0])

    def encode(self, xs) -> jax.Array:
        """xs: (B, 1, T) → codes (B, K, T')."""
        x = jnp.swapaxes(jnp.asarray(xs), 1, 2)
        return self._encode(self, x)

    def decode(self, codes) -> jax.Array:
        """codes (B, K, T') → audio (B, 1, T)."""
        y = self._decode(self, jnp.asarray(codes))
        return jnp.swapaxes(y, 1, 2)

    # ---- streaming ----

    def init_decode_state(self, batch: int = 1):
        return {
            "decoder": self.decoder.init_state(batch),
            "upsample": self.upsample.init_state(batch),
            "caches": self.decoder_transformer.make_cache(batch),
            "pos": jnp.array(0, jnp.int32),
        }

    def init_encode_state(self, batch: int = 1):
        return {
            "encoder": self.encoder.init_state(batch),
            "downsample": self.downsample.init_state(batch, self.dim),
            "caches": self.encoder_transformer.make_cache(batch),
            "pos": jnp.array(0, jnp.int32),
        }

    @staticmethod
    @jax.jit
    def _decode_step(model: "Mimi", codes, state):
        """codes (B, K, t) → (audio (B, t*frame_size, 1), state)."""
        h = model.quantizer.decode(codes)
        h, s_up = model.upsample.step(h, state["upsample"])
        outs, caches = model.decoder_transformer(
            h, state["caches"], pos0=state["pos"]
        )
        y, s_dec = model.decoder.step(outs[0], state["decoder"])
        new_state = {
            "decoder": s_dec, "upsample": s_up, "caches": caches,
            "pos": state["pos"] + h.shape[1],
        }
        return y, new_state

    @staticmethod
    @jax.jit
    def _encode_step(model: "Mimi", x, state):
        h, s_enc = model.encoder.step(x, state["encoder"])
        outs, caches = model.encoder_transformer(h, state["caches"],
                                                 pos0=state["pos"])
        h2, s_down = model.downsample.step(outs[0], state["downsample"])
        codes = model.quantizer.encode(h2)
        new_state = {
            "encoder": s_enc, "downsample": s_down, "caches": caches,
            "pos": state["pos"] + h.shape[1],
        }
        return codes, new_state

    def decode_step(self, codes, state):
        y, state = self._decode_step(self, jnp.asarray(codes), state)
        return jnp.swapaxes(y, 1, 2), state

    def encode_step(self, xs, state):
        codes, state = self._encode_step(
            self, jnp.swapaxes(jnp.asarray(xs), 1, 2), state
        )
        return codes, state

    # ---- loading ----

    def sanitize(self, weights: dict) -> dict:
        """Map kyutai/moshi-style torch keys → ours. Handles the reference's
        hardcoded index mapping (mimi.py:193-240) plus layout transposes.
        Also accepts transformers ``MimiModel`` state dicts (hf-format repos
        like kyutai/mimi)."""
        from ....nn.sanitize import orient_weights_to_model

        if any("semantic_residual_vector_quantizer" in k for k in weights):
            weights = _hf_mimi_to_kyutai(weights)
        out = {}
        for k, v in weights.items():
            k = ".".join(s.removeprefix("_") for s in k.split("."))
            k = k.replace("encoder.model.", "encoder.").replace(
                "decoder.model.", "decoder."
            )
            k = k.replace(".in_proj_weight", ".in_proj.weight")
            k = k.replace(".linear1.weight", ".gating.linear1.weight")
            k = k.replace(".linear2.weight", ".gating.linear2.weight")
            for layer_idx, dec_idx in enumerate([2, 5, 8, 11]):
                k = k.replace(f"decoder.{dec_idx}.", f"decoder.layers.{layer_idx}.upsample.")
                k = k.replace(f"decoder.{dec_idx + 1}.", f"decoder.layers.{layer_idx}.residuals.0.")
            for layer_idx, enc_idx in enumerate([1, 4, 7, 10]):
                k = k.replace(f"encoder.{enc_idx}.", f"encoder.layers.{layer_idx}.residuals.0.")
                k = k.replace(f"encoder.{enc_idx + 2}.", f"encoder.layers.{layer_idx}.downsample.")
            k = k.replace("decoder.0.", "decoder.init_conv1d.")
            k = k.replace("decoder.14.", "decoder.final_conv1d.")
            k = k.replace("encoder.0.", "encoder.init_conv1d.")
            k = k.replace("encoder.14.", "encoder.final_conv1d.")
            k = k.replace(".block.1.", ".block.0.")
            k = k.replace(".block.3.", ".block.1.")
            # our transformer layer list name
            k = k.replace("transformer.layers.", "transformer_layers.")
            k = k.replace("encoder_transformer.transformer_layers.",
                          "encoder_transformer.transformer_layers.")
            # conv containers: reference NormConv wraps .conv.conv
            k = k.replace(".conv.conv.", ".conv.")
            k = k.replace(".convtr.convtr.", ".convtr.")
            # our projected-transformer output projections
            k = k.replace(".output_projs.0.", ".output_projs.0.")
            out[k] = v
        return orient_weights_to_model(self, out)

    @classmethod
    def from_pretrained(cls, repo_id: str,
                        filename: str = "tokenizer-e351c8d8-checkpoint125.safetensors",
                        num_codebooks: int = 32):
        from huggingface_hub import hf_hub_download

        from ....nn.module import load_weights as assign
        from safetensors.numpy import load_file

        cfg = mimi_202407(num_codebooks)
        model = cls(cfg)
        model_file = hf_hub_download(repo_id, filename)
        weights = model.sanitize(load_file(model_file))
        return assign(model, weights, strict=False).eval()


class MimiStreamingDecoder:
    """Incremental decoder (reference mimi.py:277): keeps functional state
    across calls and decodes frames step by step."""

    def __init__(self, mimi: Mimi, batch: int = 1):
        self._mimi = mimi
        self._batch = batch
        self.reset()

    def reset(self):
        self._state = self._mimi.init_decode_state(self._batch)

    def decode_frames(self, tokens) -> jax.Array:
        tokens = jnp.asarray(tokens)
        if tokens.ndim == 2:
            tokens = tokens[None]
        pcm, self._state = self._mimi.decode_step(tokens, self._state)
        return pcm

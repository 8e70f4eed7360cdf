"""LASR-CTC (MedASR) — rotary conformer encoder + CTC head.

Behavioral spec: reference stt/models/lasr_ctc/lasr.py + config.py. One
jitted forward (subsample → rotary conformer blocks with weighted residuals
→ CTC head); greedy CTC collapse on host.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....nn import BatchNorm, Conv1d, LayerNorm, Linear, Module
from ....ops.rope import apply_rope, rope_cos_sin
from ..base import STTOutput, ensure_waveform

__all__ = ["Model", "ModelConfig", "LasrEncoder", "LasrForCTC"]


@dataclass
class LasrEncoderConfig(BaseModelArgs):
    hidden_size: int = 512
    num_hidden_layers: int = 17
    num_attention_heads: int = 8
    num_key_value_heads: int = 8
    intermediate_size: int = 2048
    hidden_act: str = "silu"
    conv_kernel_size: int = 32
    convolution_bias: bool = False
    num_mel_bins: int = 128
    subsampling_conv_channels: int = 256
    subsampling_conv_kernel_size: int = 5
    subsampling_conv_stride: int = 2
    layer_norm_eps: float = 1e-6
    batch_norm_momentum: float = 0.01
    max_position_embeddings: int = 10000
    attention_bias: bool = False
    rope_theta: float = 10000.0
    conv_residual_weights: List[float] = None
    feed_forward_residual_weights: List[float] = None

    def __post_init__(self):
        if self.conv_residual_weights is None:
            self.conv_residual_weights = [2.0, 1.0]
        if self.feed_forward_residual_weights is None:
            self.feed_forward_residual_weights = [1.5, 0.5]


@dataclass
class ModelConfig(BaseModelArgs):
    vocab_size: int = 512
    encoder_config: LasrEncoderConfig = None
    pad_token_id: int = 0
    model_type: str = "lasr"
    model_path: str = ""

    def __post_init__(self):
        if self.encoder_config is None:
            self.encoder_config = LasrEncoderConfig()
        elif isinstance(self.encoder_config, dict):
            self.encoder_config = LasrEncoderConfig.from_dict(self.encoder_config)


def _act(name):
    return jax.nn.silu if name == "silu" else jax.nn.relu


class LasrEncoderSubsampling(Module):
    def __init__(self, cfg: LasrEncoderConfig):
        self.dense_0 = Linear(cfg.num_mel_bins, cfg.hidden_size)
        self.conv_0 = Conv1d(cfg.hidden_size, cfg.hidden_size,
                             cfg.subsampling_conv_kernel_size,
                             stride=cfg.subsampling_conv_stride)
        self.conv_1 = Conv1d(cfg.hidden_size, cfg.subsampling_conv_channels,
                             cfg.subsampling_conv_kernel_size,
                             stride=cfg.subsampling_conv_stride)
        self.dense_1 = Linear(cfg.subsampling_conv_channels, cfg.hidden_size)

    def __call__(self, x):
        x = jax.nn.relu(self.dense_0(x))
        x = jax.nn.relu(self.conv_0(x))
        x = jax.nn.relu(self.conv_1(x))
        return self.dense_1(x)


class LasrEncoderAttention(Module):
    def __init__(self, cfg: LasrEncoderConfig):
        self.head_dim = cfg.hidden_size // cfg.num_attention_heads
        self.num_heads = cfg.num_attention_heads
        self.num_kv = cfg.num_key_value_heads
        b = cfg.attention_bias
        self.q_proj = Linear(cfg.hidden_size, self.num_heads * self.head_dim, bias=b)
        self.k_proj = Linear(cfg.hidden_size, self.num_kv * self.head_dim, bias=b)
        self.v_proj = Linear(cfg.hidden_size, self.num_kv * self.head_dim, bias=b)
        self.o_proj = Linear(self.num_heads * self.head_dim, cfg.hidden_size, bias=b)
        self.rope_theta = cfg.rope_theta

    def __call__(self, x, mask=None):
        from ....ops.attention import scaled_dot_product_attention

        B, L, _ = x.shape
        q = jnp.swapaxes(self.q_proj(x).reshape(B, L, self.num_heads, self.head_dim), 1, 2)
        k = jnp.swapaxes(self.k_proj(x).reshape(B, L, self.num_kv, self.head_dim), 1, 2)
        v = jnp.swapaxes(self.v_proj(x).reshape(B, L, self.num_kv, self.head_dim), 1, 2)
        cos, sin = rope_cos_sin(jnp.arange(L), self.head_dim, base=self.rope_theta)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        out = scaled_dot_product_attention(q, k, v, mask=mask)
        return self.o_proj(jnp.swapaxes(out, 1, 2).reshape(B, L, -1))


class LasrEncoderConvolutionModule(Module):
    def __init__(self, cfg: LasrEncoderConfig):
        c = cfg.hidden_size
        self.pointwise_conv1 = Conv1d(c, 2 * c, 1, bias=cfg.convolution_bias)
        self.depthwise_conv = Conv1d(c, c, cfg.conv_kernel_size, groups=c,
                                     bias=cfg.convolution_bias)
        self.norm = BatchNorm(c)
        self.pointwise_conv2 = Conv1d(c, c, 1, bias=cfg.convolution_bias)
        self.kernel_size = cfg.conv_kernel_size
        self.act = _act(cfg.hidden_act)

    def __call__(self, x):
        x = self.pointwise_conv1(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * jax.nn.sigmoid(b)
        pl = (self.kernel_size - 1) // 2
        pr = self.kernel_size - 1 - pl
        x = jnp.pad(x, [(0, 0), (pl, pr), (0, 0)])
        x = self.depthwise_conv(x)
        x = self.act(self.norm(x))
        return self.pointwise_conv2(x)


class LasrEncoderFeedForward(Module):
    def __init__(self, cfg: LasrEncoderConfig):
        self.linear1 = Linear(cfg.hidden_size, cfg.intermediate_size,
                              bias=cfg.attention_bias)
        self.linear2 = Linear(cfg.intermediate_size, cfg.hidden_size,
                              bias=cfg.attention_bias)
        self.act = _act(cfg.hidden_act)

    def __call__(self, x):
        return self.linear2(self.act(self.linear1(x)))


class LasrEncoderBlock(Module):
    def __init__(self, cfg: LasrEncoderConfig):
        eps = cfg.layer_norm_eps
        self.feed_forward1 = LasrEncoderFeedForward(cfg)
        self.self_attn = LasrEncoderAttention(cfg)
        self.conv = LasrEncoderConvolutionModule(cfg)
        self.feed_forward2 = LasrEncoderFeedForward(cfg)
        self.norm_feed_forward1 = LayerNorm(cfg.hidden_size, eps=eps)
        self.norm_self_att = LayerNorm(cfg.hidden_size, eps=eps)
        self.norm_conv = LayerNorm(cfg.hidden_size, eps=eps)
        self.norm_feed_forward2 = LayerNorm(cfg.hidden_size, eps=eps)
        self.norm_out = LayerNorm(cfg.hidden_size, eps=eps)
        self.ffw = tuple(cfg.feed_forward_residual_weights)
        self.cw = tuple(cfg.conv_residual_weights)

    def __call__(self, x, mask=None):
        x = self.ffw[0] * x + self.ffw[1] * self.feed_forward1(
            self.norm_feed_forward1(x)
        )
        x = x + self.self_attn(self.norm_self_att(x), mask)
        x = self.cw[0] * x + self.cw[1] * self.conv(self.norm_conv(x))
        x = self.ffw[0] * x + self.ffw[1] * self.feed_forward2(
            self.norm_feed_forward2(x)
        )
        return self.norm_out(x)


class LasrEncoder(Module):
    def __init__(self, cfg: LasrEncoderConfig):
        self.subsampler = LasrEncoderSubsampling(cfg)
        self.layers = [LasrEncoderBlock(cfg) for _ in range(cfg.num_hidden_layers)]
        self.out_norm = LayerNorm(cfg.hidden_size, eps=cfg.layer_norm_eps)

    def __call__(self, x, mask=None):
        h = self.subsampler(x)
        for layer in self.layers:
            h = layer(h, mask)
        return self.out_norm(h)


@jax.jit
def _logits(model, feats):
    return model.ctc_head(model.encoder(feats))


class LasrForCTC(Module):
    def __init__(self, config: ModelConfig):
        if isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        self.config = config
        self.encoder = LasrEncoder(config.encoder_config)
        self.ctc_head = Linear(config.encoder_config.hidden_size, config.vocab_size)

    def __call__(self, input_features):
        return _logits(self, jnp.asarray(input_features))

    def make_batcher(self, **kwargs):
        """Serving batcher: concurrent equal-shape mel windows run as ONE
        batched CTC forward (rows independent ⇒ batched == sequential)."""
        from ....serving import StackBatcher

        def run_batch(items):
            x = jnp.concatenate([jnp.asarray(m) for m in items])  # (B,T,M)
            logits = _logits(self, x)
            return list(np.asarray(jax.device_get(
                jnp.argmax(logits, axis=-1))))

        return StackBatcher(self, run_batch, **kwargs)

    def generate(self, audio, *, tokenizer=None, **kwargs) -> STTOutput:
        from ..parakeet.audio import PreprocessArgs, log_mel_spectrogram

        t0 = time.perf_counter()
        audio = ensure_waveform(audio, 16000)
        mel = log_mel_spectrogram(
            audio,
            PreprocessArgs(features=self.config.encoder_config.num_mel_bins),
        )
        # under a running server a StackBatcher may be installed:
        # concurrent equal-shape mel windows fuse into one forward
        from ....serving import get_infer_hook

        hook = get_infer_hook(self)
        if hook is not None:
            pred = np.asarray(hook(np.asarray(mel)))
        else:
            logits = self(mel)
            pred = np.asarray(jax.device_get(jnp.argmax(logits,
                                                        axis=-1)))[0]
        blank = self.config.pad_token_id
        collapsed = []
        prev = -1
        for p in pred:
            if p != blank and p != prev:
                collapsed.append(int(p))
            prev = p
        if tokenizer is None:
            tokenizer = self._load_tokenizer()
        text = (
            tokenizer.decode(collapsed) if tokenizer is not None
            else " ".join(map(str, collapsed))
        )
        wall = time.perf_counter() - t0
        dur = len(audio) / 16000
        return STTOutput(
            text=text.strip(), duration=dur,
            generation_tokens=len(collapsed),
            extra={"xrt": dur / max(wall, 1e-9)},
        )

    def _load_tokenizer(self):
        try:
            from transformers import AutoTokenizer

            return AutoTokenizer.from_pretrained(self.config.model_path)
        except Exception:
            return None

    def sanitize(self, weights: Dict[str, Any]) -> Dict[str, Any]:
        from ....nn.sanitize import orient_weights_to_model

        out = {}
        for k, v in weights.items():
            if "rotary_emb.inv_freq" in k:
                continue
            v = np.asarray(v)
            if "ctc_head.weight" in k and v.ndim == 3:
                v = v.squeeze(-1)
            out[k] = v
        return orient_weights_to_model(self, out)


Model = LasrForCTC

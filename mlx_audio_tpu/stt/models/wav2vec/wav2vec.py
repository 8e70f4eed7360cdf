"""Wav2Vec2 — conv feature encoder + transformer, feature-embedding and CTC
heads.

Behavioral spec: reference stt/models/wav2vec/wav2vec.py (HF architecture:
group/layer-norm conv feature extractor, weight-normed positional conv
embedding, standard or stable-layer-norm transformer). One jitted forward.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....nn import Conv1d, GroupNorm, LayerNorm, Linear, Module
from ....ops.attention import scaled_dot_product_attention
from ..base import STTOutput, ensure_waveform

__all__ = ["Model", "ModelConfig"]


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "wav2vec2"
    vocab_size: int = 32
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: List[int] = None
    conv_stride: List[int] = None
    conv_kernel: List[int] = None
    conv_bias: bool = False
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    feat_extract_norm: str = "group"
    do_stable_layer_norm: bool = False
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 0
    model_path: str = ""

    def __post_init__(self):
        if self.conv_dim is None:
            self.conv_dim = [512, 512, 512, 512, 512, 512, 512]
        if self.conv_stride is None:
            self.conv_stride = [5, 2, 2, 2, 2, 2, 2]
        if self.conv_kernel is None:
            self.conv_kernel = [10, 3, 3, 3, 3, 2, 2]


class ConvLayer(Module):
    def __init__(self, cfg: ModelConfig, layer_id: int):
        in_dim = cfg.conv_dim[layer_id - 1] if layer_id > 0 else 1
        out_dim = cfg.conv_dim[layer_id]
        self.conv = Conv1d(in_dim, out_dim, cfg.conv_kernel[layer_id],
                           stride=cfg.conv_stride[layer_id], bias=cfg.conv_bias)
        if cfg.feat_extract_norm == "group" and layer_id == 0:
            self.layer_norm = GroupNorm(out_dim, out_dim, affine=True)
            self.norm_kind = "group"
        elif cfg.feat_extract_norm == "layer":
            self.layer_norm = LayerNorm(out_dim)
            self.norm_kind = "layer"
        else:
            self.norm_kind = "none"

    def __call__(self, x):
        x = self.conv(x)
        if self.norm_kind != "none":
            x = self.layer_norm(x)
        return jax.nn.gelu(x, approximate=False)


class PositionalConvEmbedding(Module):
    def __init__(self, cfg: ModelConfig):
        self.conv = Conv1d(
            cfg.hidden_size, cfg.hidden_size, cfg.num_conv_pos_embeddings,
            padding=cfg.num_conv_pos_embeddings // 2,
            groups=cfg.num_conv_pos_embedding_groups,
        )
        self.num_pad_remove = 1 if cfg.num_conv_pos_embeddings % 2 == 0 else 0

    def __call__(self, x):
        h = self.conv(x)
        if self.num_pad_remove:
            h = h[:, : -self.num_pad_remove]
        return jax.nn.gelu(h, approximate=False)


class Attention(Module):
    def __init__(self, cfg: ModelConfig):
        d = cfg.hidden_size
        self.q_proj = Linear(d, d)
        self.k_proj = Linear(d, d)
        self.v_proj = Linear(d, d)
        self.out_proj = Linear(d, d)
        self.heads = cfg.num_attention_heads
        self.hd = d // self.heads

    def __call__(self, x):
        B, T, D = x.shape

        def sp(z):
            return jnp.swapaxes(z.reshape(B, T, self.heads, self.hd), 1, 2)

        out = scaled_dot_product_attention(
            sp(self.q_proj(x)), sp(self.k_proj(x)), sp(self.v_proj(x))
        )
        return self.out_proj(jnp.swapaxes(out, 1, 2).reshape(B, T, D))


class FeedForward(Module):
    def __init__(self, cfg: ModelConfig):
        self.intermediate_dense = Linear(cfg.hidden_size, cfg.intermediate_size)
        self.output_dense = Linear(cfg.intermediate_size, cfg.hidden_size)

    def __call__(self, x):
        return self.output_dense(
            jax.nn.gelu(self.intermediate_dense(x), approximate=False)
        )


class EncoderLayer(Module):
    def __init__(self, cfg: ModelConfig):
        self.attention = Attention(cfg)
        self.layer_norm = LayerNorm(cfg.hidden_size, eps=cfg.layer_norm_eps)
        self.feed_forward = FeedForward(cfg)
        self.final_layer_norm = LayerNorm(cfg.hidden_size, eps=cfg.layer_norm_eps)
        self.stable = cfg.do_stable_layer_norm

    def __call__(self, x):
        if self.stable:
            x = x + self.attention(self.layer_norm(x))
            return x + self.feed_forward(self.final_layer_norm(x))
        x = self.layer_norm(x + self.attention(x))
        return self.final_layer_norm(x + self.feed_forward(x))


class Wav2Vec2Model(Module):
    def __init__(self, cfg: ModelConfig):
        self.feature_extractor = _FeatureExtractor(cfg)
        self.feature_projection = _FeatureProjection(cfg)
        self.encoder = _Encoder(cfg)

    def __call__(self, input_values):
        # input_values: (B, T)
        feats = self.feature_extractor(input_values[..., None])
        h = self.feature_projection(feats)
        return self.encoder(h)

    def hidden_states(self, input_values):
        """All encoder hidden states, HF ordering: index 0 is the
        post-positional-embedding input, index i (1-based) is the output
        of layer i; with stable layer-norm the final entry has the last
        layer_norm applied (HF Wav2Vec2EncoderStableLayerNorm semantics).
        Used by Spark-TTS's BiCodec feature extractor, which mixes states
        11/14/16 (reference spark/audio_tokenizer.py:74-88)."""
        feats = self.feature_extractor(input_values[..., None])
        h = self.feature_projection(feats)
        enc = self.encoder
        h = h + enc.pos_conv_embed(h)
        if not enc.stable:
            h = enc.layer_norm(h)
        states = [h]
        for layer in enc.layers:
            h = layer(h)
            states.append(h)
        if enc.stable:
            states[-1] = enc.layer_norm(states[-1])
        return states


class _FeatureExtractor(Module):
    def __init__(self, cfg: ModelConfig):
        self.conv_layers = [ConvLayer(cfg, i) for i in range(len(cfg.conv_dim))]

    def __call__(self, x):
        for layer in self.conv_layers:
            x = layer(x)
        return x


class _FeatureProjection(Module):
    def __init__(self, cfg: ModelConfig):
        self.layer_norm = LayerNorm(cfg.conv_dim[-1], eps=cfg.layer_norm_eps)
        self.projection = Linear(cfg.conv_dim[-1], cfg.hidden_size)

    def __call__(self, x):
        return self.projection(self.layer_norm(x))


class _Encoder(Module):
    def __init__(self, cfg: ModelConfig):
        self.pos_conv_embed = PositionalConvEmbedding(cfg)
        self.layer_norm = LayerNorm(cfg.hidden_size, eps=cfg.layer_norm_eps)
        self.layers = [EncoderLayer(cfg) for _ in range(cfg.num_hidden_layers)]
        self.stable = cfg.do_stable_layer_norm

    def __call__(self, x):
        x = x + self.pos_conv_embed(x)
        if not self.stable:
            x = self.layer_norm(x)
        for layer in self.layers:
            x = layer(x)
        if self.stable:
            x = self.layer_norm(x)
        return x


@jax.jit
def _forward(model: "Model", input_values):
    h = model.wav2vec2(input_values)
    if hasattr(model, "lm_head"):
        return h, model.lm_head(h)
    return h, None


class Model(Module):
    def __init__(self, config: ModelConfig):
        if isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        self.config = config
        self.wav2vec2 = Wav2Vec2Model(config)
        if config.vocab_size:
            self.lm_head = Linear(config.hidden_size, config.vocab_size)

    def __call__(self, input_values):
        return _forward(self, jnp.asarray(input_values))

    def embeddings(self, audio) -> np.ndarray:
        h, _ = self(np.asarray(audio, np.float32).reshape(1, -1))
        return np.asarray(jax.device_get(h))[0]

    def make_batcher(self, **kwargs):
        """Serving batcher: concurrent equal-length windows run as ONE
        batched CTC forward (rows independent ⇒ batched == sequential)."""
        from ....serving import StackBatcher

        def run_batch(items):
            x = jnp.stack([jnp.asarray(a) for a in items])
            _, logits = _forward(self, x)
            return list(np.asarray(jax.device_get(
                jnp.argmax(logits, axis=-1))))

        return StackBatcher(self, run_batch, **kwargs)

    def generate(self, audio, *, tokenizer=None, **kwargs) -> STTOutput:
        t0 = time.perf_counter()
        audio = ensure_waveform(audio, 16000).reshape(1, -1)
        # zero-mean unit-var normalization (HF processor default)
        audio = (audio - audio.mean()) / (audio.std() + 1e-7)
        # under a running server a StackBatcher may be installed:
        # concurrent equal-length windows fuse into one CTC forward
        from ....serving import get_infer_hook

        hook = get_infer_hook(self)
        if hook is not None and hasattr(self, "lm_head"):
            pred = np.asarray(hook(audio[0].astype(np.float32)))
        else:
            _, logits = self(audio)
            if logits is None:
                return STTOutput(text="")
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
            try:
                from transformers import Wav2Vec2CTCTokenizer

                tokenizer = Wav2Vec2CTCTokenizer.from_pretrained(
                    self.config.model_path
                )
            except Exception:
                tokenizer = None
        text = (
            tokenizer.decode(collapsed) if tokenizer is not None
            else "".join(map(chr, (c + 97 for c in collapsed)))
        )
        wall = time.perf_counter() - t0
        dur = audio.shape[-1] / 16000
        return STTOutput(text=text.strip(), duration=dur,
                         generation_tokens=len(collapsed),
                         extra={"xrt": dur / max(wall, 1e-9)})

    def sanitize(self, weights: dict) -> dict:
        from ....nn.sanitize import orient_weights_to_model
        from ...models.whisper.whisper import _hf_to_native  # noqa: F401

        out = {}
        # fold pos-conv weight norm (weight_g/weight_v) and drop heads we
        # don't model (quantizer/project_q used only in pretraining)
        from ....codec.models.base import fold_weight_norm_pairs

        weights = fold_weight_norm_pairs(weights)
        for k, v in weights.items():
            if any(s in k for s in ("quantizer", "project_q", "project_hid",
                                    "masked_spec_embed", "adapter")):
                continue
            out[k] = v
        return orient_weights_to_model(self, out)

"""SmartTurn v3 — end-of-turn prediction: HF-style Whisper encoder +
attention pooling + MLP classifier.

Behavioral spec: reference vad/models/smart_turn/smart_turn.py (Model :104,
predict_endpoint :231). Single jitted forward on fixed 8 s mel windows.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....nn import Conv1d, Embedding, LayerNorm, Linear, Module
from ....ops.attention import scaled_dot_product_attention

__all__ = ["Model", "ModelConfig", "EndpointOutput"]


@dataclass
class EncoderConfig(BaseModelArgs):
    model_type: str = "smart_turn_encoder"
    num_mel_bins: int = 80
    max_source_positions: int = 400
    d_model: int = 384
    encoder_attention_heads: int = 6
    encoder_layers: int = 4
    encoder_ffn_dim: int = 1536
    k_proj_bias: bool = False


@dataclass
class ProcessorConfig(BaseModelArgs):
    sampling_rate: int = 16000
    max_audio_seconds: int = 8
    n_fft: int = 400
    hop_length: int = 160
    n_mels: int = 80
    normalize_audio: bool = True
    threshold: float = 0.5


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "smart_turn"
    architecture: str = "smart_turn"
    dtype: str = "float32"
    encoder_config: Optional[EncoderConfig] = None
    processor_config: Optional[ProcessorConfig] = None
    sample_rate: int = 16000
    max_audio_seconds: int = 8
    threshold: float = 0.5
    model_path: str = ""

    def __post_init__(self):
        if isinstance(self.encoder_config, dict):
            self.encoder_config = EncoderConfig.from_dict(self.encoder_config)
        if self.encoder_config is None:
            self.encoder_config = EncoderConfig()
        if isinstance(self.processor_config, dict):
            self.processor_config = ProcessorConfig.from_dict(self.processor_config)
        if self.processor_config is None:
            self.processor_config = ProcessorConfig(
                sampling_rate=self.sample_rate,
                max_audio_seconds=self.max_audio_seconds,
                threshold=self.threshold,
            )


@dataclass
class EndpointOutput:
    prediction: int
    probability: float


class WhisperAttention(Module):
    def __init__(self, config: EncoderConfig):
        d = config.d_model
        self.q_proj = Linear(d, d, bias=True)
        self.k_proj = Linear(d, d, bias=config.k_proj_bias)
        self.v_proj = Linear(d, d, bias=True)
        self.out_proj = Linear(d, d, bias=True)
        self.num_heads = config.encoder_attention_heads
        self.head_dim = d // config.encoder_attention_heads

    def __call__(self, x):
        B, T, D = x.shape

        def split(z):
            return jnp.swapaxes(z.reshape(B, T, self.num_heads, self.head_dim), 1, 2)

        out = scaled_dot_product_attention(
            split(self.q_proj(x)), split(self.k_proj(x)), split(self.v_proj(x))
        )
        return self.out_proj(jnp.swapaxes(out, 1, 2).reshape(B, T, D))


class WhisperEncoderLayer(Module):
    def __init__(self, config: EncoderConfig):
        self.self_attn_layer_norm = LayerNorm(config.d_model)
        self.self_attn = WhisperAttention(config)
        self.fc1 = Linear(config.d_model, config.encoder_ffn_dim)
        self.fc2 = Linear(config.encoder_ffn_dim, config.d_model)
        self.final_layer_norm = LayerNorm(config.d_model)

    def __call__(self, x):
        x = x + self.self_attn(self.self_attn_layer_norm(x))
        h = self.fc2(jax.nn.gelu(self.fc1(self.final_layer_norm(x)), approximate=False))
        return x + h


class WhisperEncoder(Module):
    def __init__(self, config: EncoderConfig):
        self.conv1 = Conv1d(config.num_mel_bins, config.d_model, 3, padding=1)
        self.conv2 = Conv1d(config.d_model, config.d_model, 3, stride=2, padding=1)
        self.embed_positions = Embedding(config.max_source_positions, config.d_model)
        self.layers = [WhisperEncoderLayer(config) for _ in range(config.encoder_layers)]
        self.layer_norm = LayerNorm(config.d_model)

    def __call__(self, input_features):
        # input_features: (B, n_mels, T) HF layout → channels-last
        x = jnp.swapaxes(input_features, 1, 2)
        x = jax.nn.gelu(self.conv1(x), approximate=False)
        x = jax.nn.gelu(self.conv2(x), approximate=False)
        x = x + self.embed_positions.weight[: x.shape[1]]
        for layer in self.layers:
            x = layer(x)
        return self.layer_norm(x)


@jax.jit
def _forward(model: "Model", input_features):
    hidden = model.encoder(input_features)
    attn = model.pool_attention_2(jnp.tanh(model.pool_attention_0(hidden)))
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=1)
    pooled = jnp.sum(hidden * attn, axis=1)
    x = model.classifier_1(model.classifier_0(pooled))
    x = jax.nn.gelu(x, approximate=False)
    x = jax.nn.gelu(model.classifier_4(x), approximate=False)
    return jax.nn.sigmoid(model.classifier_6(x))


class Model(Module):
    def __init__(self, config: ModelConfig):
        if isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        self.config = config
        d = config.encoder_config.d_model
        self.encoder = WhisperEncoder(config.encoder_config)
        self.pool_attention_0 = Linear(d, 256)
        self.pool_attention_2 = Linear(256, 1)
        self.classifier_0 = Linear(d, 256)
        self.classifier_1 = LayerNorm(256)
        self.classifier_4 = Linear(256, 64)
        self.classifier_6 = Linear(64, 1)

    def __call__(self, input_features):
        if input_features.ndim == 2:
            input_features = input_features[None]
        return _forward(self, jnp.asarray(input_features))

    def prepare_input_features(self, audio, sample_rate: Optional[int] = None):
        proc = self.config.processor_config
        if isinstance(audio, str):
            from ....utils import load_audio

            audio = load_audio(audio, sample_rate=proc.sampling_rate)
        x = np.asarray(audio, np.float32).reshape(-1)
        if proc.normalize_audio and np.abs(x).max() > 0:
            x = x / np.abs(x).max()
        from ....dsp import log_mel_spectrogram as _mel

        mel = np.asarray(
            _mel(jnp.asarray(x), n_mels=proc.n_mels, n_fft=proc.n_fft,
                 hop_length=proc.hop_length, sample_rate=proc.sampling_rate)
        )  # (frames, n_mels)
        target = proc.max_audio_seconds * proc.sampling_rate // proc.hop_length
        if mel.shape[0] > target:
            mel = mel[-target:]
        elif mel.shape[0] < target:
            mel = np.pad(mel, [(target - mel.shape[0], 0), (0, 0)])
        return mel.T  # (n_mels, frames) HF layout

    def make_batcher(self, **kwargs):
        """Serving batcher: concurrent endpoint checks (mel features are
        a fixed shape) run as ONE batched classifier forward."""
        from ....serving import StackBatcher

        def run_batch(items):
            x = jnp.stack([jnp.asarray(f) for f in items])
            probs = _forward(self, x)  # (B, 1)
            return [float(p) for p in np.asarray(jax.device_get(probs))[:, 0]]

        return StackBatcher(self, run_batch, **kwargs)

    def predict_endpoint(self, audio, sample_rate: Optional[int] = None,
                         threshold: Optional[float] = None) -> EndpointOutput:
        feats = self.prepare_input_features(audio, sample_rate)
        # under a running server a StackBatcher may be installed:
        # concurrent endpoint checks fuse into one forward
        from ....serving import get_infer_hook

        hook = get_infer_hook(self)
        if hook is not None:
            prob = float(hook(np.asarray(feats)))
        else:
            prob = float(np.asarray(jax.device_get(self(feats)))[0, 0])
        thr = threshold if threshold is not None else self.config.processor_config.threshold
        return EndpointOutput(prediction=int(prob > thr), probability=prob)

    def sanitize(self, weights: dict) -> dict:
        from ....nn.sanitize import orient_weights_to_model

        out = {}
        remap = [
            ("pool_attention.0.", "pool_attention_0."),
            ("pool_attention.2.", "pool_attention_2."),
            ("classifier.0.", "classifier_0."),
            ("classifier.1.", "classifier_1."),
            ("classifier.4.", "classifier_4."),
            ("classifier.6.", "classifier_6."),
        ]
        for k, v in weights.items():
            if k.startswith("val_"):
                continue
            if k.startswith("inner."):
                k = k[len("inner."):]
            for old, new in remap:
                k = k.replace(old, new)
            out[k] = v
        return orient_weights_to_model(self, out)

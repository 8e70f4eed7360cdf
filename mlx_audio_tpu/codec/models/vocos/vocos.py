"""Vocos — ConvNeXt backbone + ISTFT-head vocoder (mel- or EnCodec-driven).

Behavioral spec: reference codec/models/vocos/vocos.py + mel.py. The ISTFT
head uses the batched in-graph inverse STFT from `dsp`; the whole
features→waveform path is one jitted program.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path
from types import SimpleNamespace
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....dsp import hanning, istft, mel_filters, stft
from ....nn import Conv1d, Embedding, LayerNorm, Linear, Module

__all__ = ["Vocos", "MelSpectrogramFeatures", "ISTFTHead", "VocosBackbone"]


def log_mel_spectrogram(audio, sample_rate=24_000, n_mels=100, n_fft=1024,
                        hop_length=256, padding=0):
    x = jnp.asarray(audio, jnp.float32)
    if padding > 0:
        x = jnp.pad(x, (0, padding))
    spec = stft(x, n_fft=n_fft, hop_length=hop_length, window=hanning(n_fft))
    mags = jnp.abs(spec[:-1, :])  # drop last frame (reference mel.py:23)
    fb = mel_filters(sample_rate=sample_rate, n_fft=n_fft, n_mels=n_mels,
                     norm=None, mel_scale="htk")
    mel = jnp.matmul(mags, fb.T, preferred_element_type=jnp.float32)
    return jnp.log(jnp.maximum(mel, 1e-5))[None]


class MelSpectrogramFeatures(Module):
    def __init__(self, sample_rate=24_000, n_fft=1024, hop_length=256,
                 n_mels=100, padding="center", **kwargs):
        self.sample_rate = sample_rate
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.n_mels = n_mels
        self.padding = padding

    def __call__(self, audio, **kwargs):
        return log_mel_spectrogram(
            audio, self.sample_rate, self.n_mels, self.n_fft, self.hop_length
        )


class EncodecFeatures(Module):
    def __init__(self, encodec_model: str = "encodec_24khz",
                 bandwidths: List[float] = [1.5, 3.0, 6.0, 12.0], **kwargs):
        from ..encodec.encodec import Encodec

        repo = {
            "encodec_24khz": "mlx-community/encodec-24khz-float32",
            "encodec_48khz": "mlx-community/encodec-48khz-float32",
        }[encodec_model]
        self.encodec = Encodec.from_pretrained(repo)
        self.num_q = self.encodec.quantizer.get_num_quantizers_for_bandwidth(
            bandwidth=max(bandwidths)
        )
        self.bandwidths = bandwidths

    def get_encodec_codes(self, audio, bandwidth_id: int):
        codes, _ = self.encodec.encode(
            jnp.asarray(audio)[None, None], bandwidth=self.bandwidths[int(bandwidth_id)]
        )
        c = codes[0]  # (B, nq, T)
        return jnp.transpose(c, (1, 0, 2))  # (nq, B, T)

    def get_features_from_codes(self, codes):
        # codes: (nq, B, T)
        emb = None
        for i in range(codes.shape[0]):
            e = self.encodec.quantizer.layers[i].decode(codes[i])
            emb = e if emb is None else emb + e
        return emb  # (B, T, D)

    def __call__(self, audio, **kwargs):
        bandwidth_id = kwargs.get("bandwidth_id")
        if bandwidth_id is None:
            raise ValueError("The 'bandwidth_id' argument is required")
        return self.get_features_from_codes(
            self.get_encodec_codes(audio, bandwidth_id)
        )


class ISTFTHead(Module):
    def __init__(self, dim: int, n_fft: int, hop_length: int, padding="center"):
        self.out = Linear(dim, n_fft + 2)
        self.n_fft = n_fft
        self.hop_length = hop_length

    def __call__(self, x):  # (B, T, dim)
        h = self.out(x)  # (B, T, n_fft + 2)
        h = jnp.swapaxes(h, 1, 2)  # (B, n_fft+2, T)
        mag, p = jnp.split(h, 2, axis=1)
        mag = jnp.clip(jnp.exp(mag), None, 1e2)
        S = jax.lax.complex(mag * jnp.cos(p), mag * jnp.sin(p))
        return istft(
            S, hop_length=self.hop_length, win_length=self.n_fft,
            window=hanning(self.n_fft), normalized=True,
        )


class AdaLayerNorm(Module):
    def __init__(self, num_embeddings: int, embedding_dim: int, eps: float = 1e-6):
        self.scale = Linear(num_embeddings, embedding_dim)
        self.shift = Linear(num_embeddings, embedding_dim)
        self.scale.weight = jnp.ones_like(self.scale.weight)
        self.shift.weight = jnp.zeros_like(self.shift.weight)
        self.eps = eps

    def __call__(self, x, cond_embedding):
        scale = self.scale(cond_embedding)
        shift = self.shift(cond_embedding)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        xn = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (xn * scale[:, None, :] + shift[:, None, :]).astype(x.dtype)


class ConvNeXtBlock(Module):
    def __init__(self, dim, intermediate_dim, layer_scale_init_value,
                 adanorm_num_embeddings=None, dw_kernel_size=7):
        self.dwconv = Conv1d(dim, dim, dw_kernel_size, padding=dw_kernel_size // 2,
                             groups=dim)
        self.adanorm = adanorm_num_embeddings is not None
        if adanorm_num_embeddings:
            self.norm = AdaLayerNorm(adanorm_num_embeddings, dim)
        else:
            self.norm = LayerNorm(dim, eps=1e-6)
        self.pwconv1 = Linear(dim, intermediate_dim)
        self.pwconv2 = Linear(intermediate_dim, dim)
        if layer_scale_init_value > 0:
            self.gamma = layer_scale_init_value * jnp.ones(dim)

    def __call__(self, x, cond_embedding_id=None):
        residual = x
        x = self.dwconv(x)
        x = self.norm(x, cond_embedding_id) if self.adanorm else self.norm(x)
        x = self.pwconv2(jax.nn.gelu(self.pwconv1(x), approximate=False))
        if hasattr(self, "gamma"):
            x = self.gamma * x
        return residual + x


class VocosBackbone(Module):
    def __init__(self, input_channels, dim, intermediate_dim, num_layers,
                 layer_scale_init_value=None, adanorm_num_embeddings=None,
                 bias=True, input_kernel_size=7, dw_kernel_size=7, **kwargs):
        self.input_channels = input_channels
        self.embed = Conv1d(input_channels, dim, input_kernel_size,
                            padding=input_kernel_size // 2)
        self.adanorm = adanorm_num_embeddings is not None
        if adanorm_num_embeddings:
            self.norm = AdaLayerNorm(adanorm_num_embeddings, dim)
        else:
            self.norm = LayerNorm(dim, eps=1e-6)
        lsiv = layer_scale_init_value or 1 / num_layers
        self.convnext = [
            ConvNeXtBlock(dim, intermediate_dim, lsiv, adanorm_num_embeddings,
                          dw_kernel_size)
            for _ in range(num_layers)
        ]
        self.final_layer_norm = LayerNorm(dim, eps=1e-6, bias=bias)

    def __call__(self, x, **kwargs):
        bandwidth_id = kwargs.get("bandwidth_id", None)
        if x.shape[-1] != self.input_channels:
            x = jnp.swapaxes(x, 1, 2)
        x = self.embed(x)
        x = self.norm(x, bandwidth_id) if self.adanorm else self.norm(x)
        for blk in self.convnext:
            x = blk(x, cond_embedding_id=bandwidth_id)
        return self.final_layer_norm(x)


class Vocos(Module):
    def __init__(self, feature_extractor, backbone, head):
        self.feature_extractor = feature_extractor
        self.backbone = backbone
        self.head = head

    @classmethod
    def from_hparams(cls, config: dict) -> "Vocos":
        c = SimpleNamespace(**config)
        fe_cfg = c.feature_extractor
        if "MelSpectrogramFeatures" in fe_cfg["class_path"]:
            fe = MelSpectrogramFeatures(**fe_cfg["init_args"])
        else:
            fe = EncodecFeatures(**fe_cfg["init_args"])
        backbone = VocosBackbone(**c.backbone["init_args"])
        head = ISTFTHead(**c.head["init_args"])
        return cls(fe, backbone, head)

    @classmethod
    def from_pretrained(cls, path_or_repo: str) -> "Vocos":
        import yaml

        from ....nn.module import load_weights as assign
        from ....nn.sanitize import orient_weights_to_model
        from ....utils import get_model_path, load_weight_files

        path = get_model_path(path_or_repo, allow_patterns=["*.yaml", "*.safetensors"])
        config = yaml.safe_load((Path(path) / "config.yaml").read_text())
        model = cls.from_hparams(config)
        weights = load_weight_files(path)
        weights.pop("feature_extractor.mel_spec.spectrogram.window", None)
        weights.pop("head.istft.window", None)
        weights = {
            k: v for k, v in weights.items()
            if not k.startswith("feature_extractor.encodec")
        }
        weights = orient_weights_to_model(model, weights)
        return assign(model, weights, strict=False).eval()

    @staticmethod
    @jax.jit
    def _decode(model: "Vocos", features, **kwargs):
        x = model.backbone(features, **kwargs)
        return model.head(x)

    def decode(self, features_input, **kwargs):
        return self._decode(self, features_input, **kwargs)

    def decode_from_codes(self, codes, **kwargs):
        features = self.feature_extractor.get_features_from_codes(codes)
        return self.decode(features, **kwargs)

    def get_encodec_codes(self, audio_input, bandwidth_id: int):
        if not isinstance(self.feature_extractor, EncodecFeatures):
            raise ValueError("This model does not support getting encodec codes.")
        return self.feature_extractor.get_encodec_codes(audio_input, bandwidth_id)

    def __call__(self, audio_input, **kwargs):
        features = self.feature_extractor(audio_input, **kwargs)
        return self.decode(features, **kwargs)

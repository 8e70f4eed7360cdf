"""DAC (Descript Audio Codec) — conv encoder + residual VQ + conv decoder.

Behavioral spec: reference codec/models/descript/ (dac.py, nn/quantize.py,
nn/layers.py). TPU-native: channels-last conv stacks, weight-norm folded at
load (plain convs at runtime), encode/decode wrapped in jit with the RVQ
nearest-codebook search as one batched MXU matmul per codebook.

Public surface parity: `DAC.from_pretrained`, `encode(audio) → (z, codes,
latents, ...)`, `decode(z)`, `quantizer.from_codes(codes)`; audio shapes are
(B, 1, T) like the reference.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from pathlib import Path
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....nn import Conv1d, ConvTranspose1d, Embedding, Module
from ....nn.activations import snake
from ..base import fold_weight_norm_pairs

__all__ = ["DAC", "DACFile"]


class Snake1d(Module):
    def __init__(self, channels: int):
        self.alpha = jnp.ones((1, 1, channels))  # channels-last

    def __call__(self, x):
        return snake(x, self.alpha)


class ResidualUnit(Module):
    def __init__(self, dim: int = 16, dilation: int = 1):
        pad = ((7 - 1) * dilation) // 2
        self.block = [
            Snake1d(dim),
            Conv1d(dim, dim, 7, dilation=dilation, padding=pad),
            Snake1d(dim),
            Conv1d(dim, dim, 1),
        ]

    def __call__(self, x):
        y = x
        for layer in self.block:
            y = layer(y)
        pad = (x.shape[1] - y.shape[1]) // 2
        if pad > 0:
            x = x[:, pad:-pad]
        return x + y


class EncoderBlock(Module):
    def __init__(self, dim: int = 16, stride: int = 1):
        self.block = [
            ResidualUnit(dim // 2, dilation=1),
            ResidualUnit(dim // 2, dilation=3),
            ResidualUnit(dim // 2, dilation=9),
            Snake1d(dim // 2),
            Conv1d(dim // 2, dim, 2 * stride, stride=stride,
                   padding=math.ceil(stride / 2)),
        ]

    def __call__(self, x):
        for layer in self.block:
            x = layer(x)
        return x


class Encoder(Module):
    def __init__(self, d_model: int = 64, strides: List[int] = [2, 4, 8, 8],
                 d_latent: int = 64):
        block = [Conv1d(1, d_model, 7, padding=3)]
        for stride in strides:
            d_model *= 2
            block.append(EncoderBlock(d_model, stride=stride))
        block += [Snake1d(d_model), Conv1d(d_model, d_latent, 3, padding=1)]
        self.block = block
        self.enc_dim = d_model

    def __call__(self, x):
        for layer in self.block:
            x = layer(x)
        return x


class DecoderBlock(Module):
    def __init__(self, input_dim: int, output_dim: int, stride: int):
        self.block = [
            Snake1d(input_dim),
            ConvTranspose1d(input_dim, output_dim, 2 * stride, stride=stride,
                            padding=math.ceil(stride / 2)),
            ResidualUnit(output_dim, dilation=1),
            ResidualUnit(output_dim, dilation=3),
            ResidualUnit(output_dim, dilation=9),
        ]

    def __call__(self, x):
        for layer in self.block:
            x = layer(x)
        return x


class Tanh(Module):
    def __call__(self, x):
        return jnp.tanh(x)


class Decoder(Module):
    def __init__(self, input_channel, channels, rates, d_out: int = 1):
        layers = [Conv1d(input_channel, channels, 7, padding=3)]
        output_dim = channels
        for i, stride in enumerate(rates):
            input_dim = channels // 2**i
            output_dim = channels // 2 ** (i + 1)
            layers.append(DecoderBlock(input_dim, output_dim, stride))
        layers += [Snake1d(output_dim), Conv1d(output_dim, d_out, 7, padding=3), Tanh()]
        self.model = layers

    def __call__(self, x):
        for layer in self.model:
            x = layer(x)
        return x


def _l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


class VectorQuantize(Module):
    def __init__(self, input_dim: int, codebook_size: int, codebook_dim: int):
        self.in_proj = Conv1d(input_dim, codebook_dim, 1)
        self.out_proj = Conv1d(codebook_dim, input_dim, 1)
        self.codebook = Embedding(codebook_size, codebook_dim)
        self.codebook_size = codebook_size
        self.codebook_dim = codebook_dim

    def __call__(self, z):
        # z: (B, T, D) channels-last
        z_e = self.in_proj(z)
        z_q, indices = self.decode_latents(z_e)
        z_q = self.out_proj(z_q)
        return z_q, indices, z_e

    def decode_code(self, embed_id):
        return self.codebook.weight[embed_id]  # (B, T, Dc)

    def decode_latents(self, latents):
        # cosine-normalized nearest neighbor == argmax of dot product (MXU)
        enc = _l2_normalize(latents)  # (B, T, Dc)
        cb = _l2_normalize(self.codebook.weight)  # (N, Dc)
        sim = jnp.einsum("btd,nd->btn", enc, cb, preferred_element_type=jnp.float32)
        indices = jnp.argmax(sim, axis=-1)
        return self.decode_code(indices), indices


class ResidualVectorQuantize(Module):
    def __init__(self, input_dim: int = 512, n_codebooks: int = 9,
                 codebook_size: int = 1024, codebook_dim: Union[int, list] = 8):
        if isinstance(codebook_dim, int):
            codebook_dim = [codebook_dim] * n_codebooks
        self.n_codebooks = n_codebooks
        self.quantizers = [
            VectorQuantize(input_dim, codebook_size, codebook_dim[i])
            for i in range(n_codebooks)
        ]

    def __call__(self, z, n_quantizers: Optional[int] = None):
        # z: (B, T, D)
        if n_quantizers is None:
            n_quantizers = self.n_codebooks
        z_q = jnp.zeros_like(z)
        residual = z
        codes, latents = [], []
        for i, q in enumerate(self.quantizers):
            if i >= n_quantizers:
                break
            z_q_i, indices_i, z_e_i = q(residual)
            z_q = z_q + z_q_i
            residual = residual - z_q_i
            codes.append(indices_i)
            latents.append(z_e_i)
        return (
            z_q,
            jnp.stack(codes, axis=1),  # (B, n_q, T)
            jnp.concatenate(latents, axis=-1),
        )

    def from_codes(self, codes):
        # codes: (B, n_q, T)
        z_q = None
        z_p = []
        for i in range(codes.shape[1]):
            z_p_i = self.quantizers[i].decode_code(codes[:, i])
            z_p.append(z_p_i)
            z_q_i = self.quantizers[i].out_proj(z_p_i)
            z_q = z_q_i if z_q is None else z_q + z_q_i
        return z_q, jnp.concatenate(z_p, axis=-1), codes


def _hf_to_descript(weights: dict) -> dict:
    """Map transformers ``DacModel`` state-dict names → descript-style names
    (the layout this module uses, matching reference codec/models/descript/).

    HF encoder: conv1, block.{i}(res_unit1..3, snake1, conv1), snake1, conv2.
    HF decoder: conv1, block.{i}(snake1, conv_t1, res_unit1..3), snake1, conv2.
    """
    import re

    n_enc = 1 + max(
        (int(m.group(1)) for k in weights
         if (m := re.match(r"encoder\.block\.(\d+)\.", k))),
        default=-1,
    )

    def map_res_unit(j: int, rest: str) -> str:
        # res_unit{j}: snake1→block.0, conv1→block.1, snake2→block.2, conv2→block.3
        part, leaf = rest.split(".", 1)
        idx = {"snake1": 0, "conv1": 1, "snake2": 2, "conv2": 3}[part]
        return f"block.{idx}.{leaf}"

    out = {}
    for k, v in weights.items():
        nk = k
        if k.startswith("encoder."):
            rest = k[len("encoder."):]
            if rest.startswith("conv1."):
                nk = "encoder.block.0." + rest[len("conv1."):]
            elif rest.startswith("snake1."):
                nk = f"encoder.block.{n_enc + 1}." + rest[len("snake1."):]
            elif rest.startswith("conv2."):
                nk = f"encoder.block.{n_enc + 2}." + rest[len("conv2."):]
            elif (m := re.match(r"block\.(\d+)\.(.*)$", rest)):
                i, sub = int(m.group(1)), m.group(2)
                if (mu := re.match(r"res_unit(\d)\.(.*)$", sub)):
                    j = int(mu.group(1))
                    nk = (f"encoder.block.{i + 1}.block.{j - 1}."
                          + map_res_unit(j, mu.group(2)))
                elif sub.startswith("snake1."):
                    nk = f"encoder.block.{i + 1}.block.3." + sub[len("snake1."):]
                elif sub.startswith("conv1."):
                    nk = f"encoder.block.{i + 1}.block.4." + sub[len("conv1."):]
        elif k.startswith("decoder."):
            rest = k[len("decoder."):]
            n_dec = 1 + max(
                int(m.group(1)) for kk in weights
                if (m := re.match(r"decoder\.block\.(\d+)\.", kk))
            )
            if rest.startswith("conv1."):
                nk = "decoder.model.0." + rest[len("conv1."):]
            elif rest.startswith("snake1."):
                nk = f"decoder.model.{n_dec + 1}." + rest[len("snake1."):]
            elif rest.startswith("conv2."):
                nk = f"decoder.model.{n_dec + 2}." + rest[len("conv2."):]
            elif (m := re.match(r"block\.(\d+)\.(.*)$", rest)):
                i, sub = int(m.group(1)), m.group(2)
                if (mu := re.match(r"res_unit(\d)\.(.*)$", sub)):
                    j = int(mu.group(1))
                    nk = (f"decoder.model.{i + 1}.block.{j + 1}."
                          + map_res_unit(j, mu.group(2)))
                elif sub.startswith("snake1."):
                    nk = f"decoder.model.{i + 1}.block.0." + sub[len("snake1."):]
                elif sub.startswith("conv_t1."):
                    nk = f"decoder.model.{i + 1}.block.1." + sub[len("conv_t1."):]
        out[nk] = v
    return out


class DAC(Module):
    def __init__(self, encoder_dim: int = 64, encoder_rates: List[int] = [2, 4, 5, 8],
                 latent_dim: Optional[int] = None, decoder_dim: int = 1536,
                 decoder_rates: List[int] = [8, 5, 4, 2], n_codebooks: int = 9,
                 codebook_size: int = 1024, codebook_dim: Union[int, list] = 8,
                 sample_rate: int = 44100, **kwargs):
        if latent_dim is None:
            latent_dim = encoder_dim * (2 ** len(encoder_rates))
        self.latent_dim = latent_dim
        self.hop_length = int(np.prod(encoder_rates))
        self.encoder = Encoder(encoder_dim, encoder_rates, latent_dim)
        self.quantizer = ResidualVectorQuantize(
            input_dim=latent_dim, n_codebooks=n_codebooks,
            codebook_size=codebook_size, codebook_dim=codebook_dim,
        )
        self.decoder = Decoder(latent_dim, decoder_dim, decoder_rates)
        self.sample_rate = sample_rate
        self.n_codebooks = n_codebooks
        self.codebook_size = codebook_size

    # ---- jitted cores ----

    @staticmethod
    @partial(jax.jit, static_argnames=("n_quantizers",))
    def _encode(model: "DAC", audio, n_quantizers=None):
        z = model.encoder(audio)
        return model.quantizer(z, n_quantizers)

    @staticmethod
    @jax.jit
    def _decode(model: "DAC", z):
        return model.decoder(z)

    # ---- reference-parity API (audio (B, 1, T), z (B, D, T)) ----

    def preprocess(self, audio_data, sample_rate=None):
        if sample_rate is not None:
            assert sample_rate == self.sample_rate
        length = audio_data.shape[-1]
        right_pad = math.ceil(length / self.hop_length) * self.hop_length - length
        return jnp.pad(jnp.asarray(audio_data), [(0, 0), (0, 0), (0, right_pad)])

    def encode(self, audio_data, n_quantizers: Optional[int] = None):
        z_q, codes, latents = self._encode(
            self, jnp.swapaxes(jnp.asarray(audio_data), 1, 2), n_quantizers
        )
        return (
            jnp.swapaxes(z_q, 1, 2),
            codes,
            jnp.swapaxes(latents, 1, 2),
            jnp.zeros(()),
            jnp.zeros(()),
        )

    def decode(self, z):
        return jnp.swapaxes(
            self._decode(self, jnp.swapaxes(jnp.asarray(z), 1, 2)), 1, 2
        )

    def decode_codes(self, codes):
        z_q, _, _ = self.quantizer.from_codes(jnp.asarray(codes))
        return jnp.swapaxes(self._decode(self, z_q), 1, 2)

    def __call__(self, audio_data, sample_rate=None, n_quantizers=None):
        length = audio_data.shape[-1]
        audio_data = self.preprocess(audio_data, sample_rate)
        z, codes, latents, _, _ = self.encode(audio_data, n_quantizers)
        x = self.decode(z)
        return {
            "audio": x[..., :length],
            "z": z,
            "codes": codes,
            "latents": latents,
        }

    # ---- loading ----

    def sanitize(self, weights: dict) -> dict:
        from ....nn.sanitize import orient_weights_to_model

        weights = fold_weight_norm_pairs(weights)
        if any(".res_unit" in k for k in weights):
            weights = _hf_to_descript(weights)
        return orient_weights_to_model(self, weights)

    @classmethod
    def from_pretrained(cls, repo_id: str) -> "DAC":
        from ....utils import get_model_path, load_config, load_weight_files
        from ....nn.module import load_weights as assign

        path = get_model_path(repo_id)
        try:
            config = load_config(path)
        except FileNotFoundError:
            config = {}
        model = cls(**config)
        weights = model.sanitize(load_weight_files(path))
        return assign(model, weights, strict=False).eval()


SUPPORTED_VERSIONS = ["1.0.0"]


@dataclass
class DACFile:
    """Compressed-audio artifact, `.dac`-format compatible with the
    reference (codec/models/descript/base.py:14-52): an np.save'd dict of
    uint16 codes + metadata."""

    codes: np.ndarray
    chunk_length: int
    original_length: float
    input_db: float
    channels: int
    sample_rate: int
    padding: bool
    dac_version: str = SUPPORTED_VERSIONS[-1]

    def save(self, path) -> Path:
        artifacts = {
            "codes": np.asarray(self.codes).astype(np.uint16),
            "metadata": {
                "input_db": float(self.input_db),
                "original_length": self.original_length,
                "sample_rate": self.sample_rate,
                "chunk_length": self.chunk_length,
                "channels": self.channels,
                "padding": self.padding,
                "dac_version": SUPPORTED_VERSIONS[-1],
            },
        }
        path = Path(path).with_suffix(".dac")
        with open(path, "wb") as f:
            np.save(f, artifacts)
        return path

    @classmethod
    def load(cls, path) -> "DACFile":
        artifacts = np.load(path, allow_pickle=True)[()]
        meta = artifacts["metadata"]
        if meta.get("dac_version") not in SUPPORTED_VERSIONS:
            raise RuntimeError(
                f"{path} can't be loaded with this version of the codec "
                f"(dac_version={meta.get('dac_version')})")
        return cls(codes=artifacts["codes"].astype(np.int32), **meta)


def _dac_compress(self: "DAC", audio, win_duration: float = 1.0,
                  normalize_db: float = -16,
                  n_quantizers: Optional[int] = None) -> DACFile:
    """Encode a file/waveform into a portable DACFile (reference
    base.py:123-196). Loudness is normalized to `normalize_db`, the signal
    is encoded in fixed windows, and the original level is stored for
    exact restoration at decompress. Windows here are hop-aligned with
    per-window padding (the reference instead threads the conv delay
    through unpadded convs; boundary frames may differ)."""
    if isinstance(audio, (str, Path)):
        from ....audio_io import read as audio_read

        signal, sr = audio_read(audio)
        if signal.ndim == 2:
            signal = signal.mean(axis=1)
        if sr != self.sample_rate:
            raise ValueError(
                f"Sample rate of the audio signal ({sr}) does not match "
                f"the sample rate of the model ({self.sample_rate}).")
    else:
        signal = np.asarray(audio, np.float32).reshape(-1)
    duration = signal.shape[-1] / self.sample_rate

    rms = float(np.sqrt(np.mean(signal.astype(np.float64) ** 2) + 1e-12))
    input_db = 20 * math.log10(rms + 1e-12)
    if normalize_db is not None:
        signal = signal * 10 ** ((normalize_db - input_db) / 20)

    x = signal[None, None, :].astype(np.float32)
    nt = x.shape[-1]
    if win_duration is None or duration <= win_duration:
        n_samples, hop, padding = nt, max(nt, 1), True
    else:
        n_samples = int(win_duration * self.sample_rate)
        n_samples = int(math.ceil(n_samples / self.hop_length)
                        * self.hop_length)
        hop, padding = n_samples, False

    codes, chunk_length = [], 0
    for i in range(0, nt, hop):
        chunk = x[..., i: i + n_samples]
        pad = n_samples - chunk.shape[-1] if not padding else 0
        if pad > 0:
            chunk = np.pad(chunk, [(0, 0), (0, 0), (0, pad)])
        chunk = self.preprocess(chunk, self.sample_rate)
        _, c, _, _, _ = self.encode(chunk, n_quantizers)
        codes.append(np.asarray(c))
        chunk_length = codes[-1].shape[-1]

    all_codes = np.concatenate(codes, axis=-1)
    if n_quantizers is not None:
        all_codes = all_codes[:, :n_quantizers, :]
    return DACFile(
        codes=all_codes, chunk_length=chunk_length,
        original_length=duration, input_db=input_db, channels=1,
        sample_rate=self.sample_rate, padding=padding,
    )


def _dac_decompress(self: "DAC", obj) -> np.ndarray:
    """DACFile (or path) → waveform (1, T), restoring the original
    loudness (reference base.py:198-233)."""
    if isinstance(obj, (str, Path)):
        obj = DACFile.load(obj)
    if self.sample_rate != obj.sample_rate:
        raise ValueError(
            f"Sample rate of the audio signal ({obj.sample_rate}) does not "
            f"match the sample rate of the model ({self.sample_rate}).")
    codes = np.asarray(obj.codes, np.int32)
    recons = []
    for i in range(0, codes.shape[-1], obj.chunk_length):
        c = jnp.asarray(codes[..., i: i + obj.chunk_length])
        recons.append(np.asarray(self.decode_codes(c)))  # (1, 1, T)
    out = np.concatenate(recons, axis=-1)[:, 0]
    out = out * 10 ** ((obj.input_db - (-16)) / 20)
    n = int(obj.original_length * obj.sample_rate)
    return out[..., :n] if n > 0 else out


DAC.compress = _dac_compress
DAC.decompress = _dac_decompress

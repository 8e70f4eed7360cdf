"""S3Tokenizer — supervised speech tokenizer (CosyVoice / Chatterbox front end).

TPU-native re-implementation of the reference family
(reference: mlx_audio/codec/models/s3tokenizer/model.py,
model_v2.py, model_v3.py, utils.py — itself derived from
github.com/xingchensong/S3Tokenizer):

* v1 (``speech_tokenizer_v1`` / ``_v1_25hz``): Whisper-style encoder with
  sinusoidal positions, L2-normalized Euclidean VQ, 4096 codes.
* v2 (``speech_tokenizer_v2_25hz``): FSMN attention (depthwise conv memory
  on values) + custom rotate-half RoPE, FSQ quantizer with 3^8 = 6561 codes.
* v3: same as v2 but 12 encoder layers.

TPU design: the encoder+quantizer runs as one jitted graph over fixed
30 s (3000-frame) windows with length masks, so arbitrary batches and
long audio reuse a single compiled program.  Long audio uses the
reference's 30 s window / 4 s overlap sliding scheme with
``merge_tokenized_segments`` on the host (reference model_v2.py:411-563).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....dsp import mel_filters, stft
from ....nn import layers as nn
from ....nn.module import Module
from ....nn.sanitize import orient_weights_to_model
from ....ops.attention import scaled_dot_product_attention as sdpa

S3_SR = 16_000
S3_HOP = 160  # 100 mel frames / sec
S3_TOKEN_HOP = 640  # 25 tokens / sec
S3_TOKEN_RATE = 25
SPEECH_VOCAB_SIZE = 6561  # 3^8 (v2/v3)
S3_V1_VOCAB_SIZE = 4096

_MAX_FRAMES = 3000  # 30 s window
_OVERLAP_SECONDS = 4


@dataclass
class ModelConfig:
    """reference model_v2.py:21-27 (v3 uses n_audio_layer=12)."""

    n_mels: int = 128
    n_audio_ctx: int = 1500
    n_audio_state: int = 1280
    n_audio_head: int = 20
    n_audio_layer: int = 6
    n_codebook_size: int = 3**8


def log_mel_spectrogram(
    audio: np.ndarray,
    sample_rate: int = S3_SR,
    n_mels: int = 128,
    n_fft: int = 400,
    hop_length: int = S3_HOP,
    padding: int = 0,
) -> jnp.ndarray:
    """Whisper-style log-mel with slaney filters → (n_mels, T).

    reference utils.py:13-66.
    """
    audio = jnp.asarray(audio, jnp.float32)
    if padding > 0:
        audio = jnp.pad(audio, (0, padding))
    window = jnp.hanning(n_fft + 1)[:-1]
    spec = stft(audio, n_fft=n_fft, hop_length=hop_length, win_length=n_fft,
                window=window)
    mag = jnp.abs(spec) ** 2  # (frames, freq)
    filters = mel_filters(sample_rate, n_fft, n_mels, norm="slaney",
                          mel_scale="slaney")
    mel = filters @ mag.T
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec, log_spec.max() - 8.0)
    return (log_spec + 4.0) / 4.0


def make_non_pad_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) lengths → (B, max_len) bool, True inside the valid region."""
    return jnp.arange(max_len)[None, :] < lengths[:, None]


def merge_tokenized_segments(
    segments: List[List[int]], overlap: int, token_rate: int
) -> List[int]:
    """Drop half the overlapped tokens on each side of interior boundaries.

    reference utils.py:218-239.
    """
    merged: List[int] = []
    half = (overlap // 2) * token_rate
    for i, toks in enumerate(segments):
        left = 0 if i == 0 else half
        right = len(toks) if i == len(segments) - 1 else len(toks) - half
        merged.extend(toks[left:right])
    return merged


def _sinusoids(length: int, channels: int, max_timescale: float = 10000.0):
    """Whisper-style sinusoidal positions (reference model.py:26-36)."""
    inv = jnp.exp(-math.log(max_timescale) / (channels // 2 - 1)
                  * jnp.arange(channels // 2))
    angles = jnp.arange(length)[:, None] * inv[None, :]
    return jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=1)


def _s3_rope(dim: int, end: int, theta: float = 10000.0):
    """Rotate-half RoPE tables, [cos|cos] / [sin|sin] layout.

    reference model_v2.py:30-53.
    """
    freqs = 1.0 / theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim)
    angles = jnp.outer(jnp.arange(end, dtype=jnp.float32), freqs)
    cos = jnp.concatenate([jnp.cos(angles), jnp.cos(angles)], axis=-1)
    sin = jnp.concatenate([jnp.sin(angles), jnp.sin(angles)], axis=-1)
    return cos, sin


def _apply_s3_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """x: (B, T, H, D); rotation [-right, left] (reference model_v2.py:55-82)."""
    half = x.shape[-1] // 2
    rotated = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
    return x * cos[None, :, None, :] + rotated * sin[None, :, None, :]


class FSMNAttention(Module):
    """Self-attention + depthwise-conv value memory (reference model_v2.py:150-248)."""

    def __init__(self, n_state: int, n_head: int, kernel_size: int = 31):
        self.n_head = n_head
        self.query = nn.Linear(n_state, n_state)
        self.key = nn.Linear(n_state, n_state, bias=False)
        self.value = nn.Linear(n_state, n_state)
        self.out = nn.Linear(n_state, n_state)
        self.fsmn_block = nn.Conv1d(n_state, n_state, kernel_size,
                                    groups=n_state, bias=False)
        self.left_padding = (kernel_size - 1) // 2
        self.right_padding = kernel_size - 1 - self.left_padding

    def _fsmn(self, v: jnp.ndarray, mask_pad: jnp.ndarray) -> jnp.ndarray:
        v = v * mask_pad
        x = jnp.pad(v, ((0, 0), (self.left_padding, self.right_padding), (0, 0)))
        return (self.fsmn_block(x) + v) * mask_pad

    def __call__(self, x, bias_mask, mask_pad, rope) -> jnp.ndarray:
        B, T, D = x.shape
        q = self.query(x).reshape(B, T, self.n_head, -1)
        k = self.key(x).reshape(B, T, self.n_head, -1)
        v = self.value(x).reshape(B, T, self.n_head, -1)
        if rope is not None:
            cos, sin = rope
            q = _apply_s3_rope(q, cos[:T], sin[:T])
            k = _apply_s3_rope(k, cos[:T], sin[:T])
        fsm = self._fsmn(v.reshape(B, T, D), mask_pad)
        o = sdpa(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                 v.transpose(0, 2, 1, 3), mask=bias_mask)
        o = o.transpose(0, 2, 1, 3).reshape(B, T, D)
        return self.out(o) + fsm


class PlainAttention(Module):
    """v1 attention, no FSMN/rope (reference model.py:39-77)."""

    def __init__(self, n_state: int, n_head: int):
        self.n_head = n_head
        self.query = nn.Linear(n_state, n_state)
        self.key = nn.Linear(n_state, n_state, bias=False)
        self.value = nn.Linear(n_state, n_state)
        self.out = nn.Linear(n_state, n_state)

    def __call__(self, x, bias_mask, mask_pad=None, rope=None) -> jnp.ndarray:
        B, T, D = x.shape
        q = self.query(x).reshape(B, T, self.n_head, -1).transpose(0, 2, 1, 3)
        k = self.key(x).reshape(B, T, self.n_head, -1).transpose(0, 2, 1, 3)
        v = self.value(x).reshape(B, T, self.n_head, -1).transpose(0, 2, 1, 3)
        o = sdpa(q, k, v, mask=bias_mask)
        return self.out(o.transpose(0, 2, 1, 3).reshape(B, T, D))


class ResidualAttentionBlock(Module):
    """reference model_v2.py:251-287 / model.py:79-99."""

    def __init__(self, n_state: int, n_head: int, fsmn: bool = True):
        self.attn = (FSMNAttention(n_state, n_head) if fsmn
                     else PlainAttention(n_state, n_head))
        self.attn_ln = nn.LayerNorm(n_state, eps=1e-5)
        self.mlp = nn.Sequential(
            nn.Linear(n_state, n_state * 4), nn.GELU(),
            nn.Linear(n_state * 4, n_state),
        )
        self.mlp_ln = nn.LayerNorm(n_state, eps=1e-5)

    def __call__(self, x, bias_mask, mask_pad, rope) -> jnp.ndarray:
        x = x + self.attn(self.attn_ln(x), bias_mask, mask_pad, rope)
        return x + self.mlp(self.mlp_ln(x))


class AudioEncoder(Module):
    """Two strided convs (4x or 2x total downsample) + transformer stack.

    reference model_v2.py:289-355 (v2/v3) and model.py:102-168 (v1).
    """

    def __init__(self, config: ModelConfig, stride: int, version: int):
        self.stride = stride
        self.version = version
        self.conv1 = nn.Conv1d(config.n_mels, config.n_audio_state, 3,
                               stride=stride, padding=1)
        self.conv2 = nn.Conv1d(config.n_audio_state, config.n_audio_state, 3,
                               stride=2, padding=1)
        self.blocks = [
            ResidualAttentionBlock(config.n_audio_state, config.n_audio_head,
                                   fsmn=version >= 2)
            for _ in range(config.n_audio_layer)
        ]
        if version == 1:
            self._positional_embedding = _sinusoids(config.n_audio_ctx,
                                                    config.n_audio_state)
        else:
            cos, sin = _s3_rope(config.n_audio_state // config.n_audio_head, 2048)
            self._rope_cos, self._rope_sin = cos, sin

    def __call__(self, mel: jnp.ndarray, mel_len: jnp.ndarray):
        """mel: (B, n_mels, T) → hidden (B, T', D), lengths (B,)."""
        B, _, T = mel.shape
        x = mel.transpose(0, 2, 1)  # (B, T, n_mels)
        mask = make_non_pad_mask(mel_len, T)[..., None]
        x = jax.nn.gelu(self.conv1(x * mask))
        x_len = (mel_len - 1) // self.stride + 1
        x = jax.nn.gelu(self.conv2(x * make_non_pad_mask(x_len, x.shape[1])[..., None]))
        x_len = (x_len - 1) // 2 + 1

        pad = make_non_pad_mask(x_len, x.shape[1])
        mask_pad = pad[..., None].astype(x.dtype)
        bias_mask = jnp.where(pad, 0.0, -1e9)[:, None, None, :]

        if self.version == 1:
            x = x + self._positional_embedding[: x.shape[1]]
            rope = None
        else:
            rope = (self._rope_cos, self._rope_sin)
        for block in self.blocks:
            x = block(x, bias_mask, mask_pad, rope)
        return x, x_len


class FSQCodebook(Module):
    """Project to 8 dims, tanh, round to {-1,0,1}, base-3 encode.

    reference model_v2.py:85-121.
    """

    def __init__(self, dim: int, level: int = 3):
        self.project_down = nn.Linear(dim, 8)
        self.level = level

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        h = self.project_down(x).astype(jnp.float32)
        h = jnp.round(jnp.tanh(h) * 0.9990000128746033) + 1.0
        powers = jnp.power(float(self.level), jnp.arange(8, dtype=jnp.float32))
        return jnp.sum(h * powers, axis=-1).astype(jnp.int32)


class EuclideanCodebook(Module):
    """v1: nearest-neighbour over 4096 L2-normalized codes (reference model.py:170-219)."""

    def __init__(self, dim: int, codebook_size: int):
        self.embed = jnp.zeros((codebook_size, dim), jnp.float32)

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x / jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True) + 1e-8)
        x32 = x.astype(jnp.float32)
        e = self.embed
        dist = (2.0 * x32 @ e.T
                - jnp.sum(x32**2, axis=-1, keepdims=True)
                - jnp.sum(e**2, axis=-1)[None, None, :])
        return jnp.argmax(dist, axis=-1).astype(jnp.int32)


class S3TokenizerV2(Module):
    """v2/v3 tokenizer (25 Hz FSQ). reference model_v2.py:358-626."""

    version = 2

    def __init__(self, name: str = "speech_tokenizer_v2_25hz",
                 config: Optional[ModelConfig] = None):
        config = config or ModelConfig()
        if self.version == 3 and config.n_audio_layer == 6:
            config.n_audio_layer = 12
        self.config = config
        self.name = name
        self.encoder = AudioEncoder(config, stride=2, version=max(self.version, 2))
        self.fsq_codebook = FSQCodebook(config.n_audio_state)

    # ---- jitted fixed-shape window encode -------------------------------
    def _encode_window(self, mel: jnp.ndarray, mel_len: jnp.ndarray):
        hidden, code_len = self.encoder(mel, mel_len)
        return self._quantize_hidden(hidden), code_len

    def _quantize_hidden(self, hidden: jnp.ndarray) -> jnp.ndarray:
        return self.fsq_codebook.encode(hidden)

    _jit_cache: dict = {}

    def _encode_jit(self):
        key = id(self)
        fn = type(self)._jit_cache.get(key)
        if fn is None:
            fn = jax.jit(lambda model, mel, mel_len: model._encode_window(mel, mel_len))
            type(self)._jit_cache[key] = fn
        return fn

    def quantize(self, mel, mel_len) -> Tuple[np.ndarray, np.ndarray]:
        """mel (B, n_mels, T), mel_len (B,) → codes (B, T'), code_len (B,).

        Long audio (> 30 s) is windowed with 4 s overlap and merged
        (reference model_v2.py:385-563).
        """
        mel = np.asarray(mel, np.float32)
        mel_len = np.asarray(mel_len, np.int64)
        B = mel.shape[0]
        stride_frames = _MAX_FRAMES - _OVERLAP_SECONDS * 100

        segments, seg_lens, owners = [], [], []
        for b in range(B):
            L = int(mel_len[b])
            if L <= _MAX_FRAMES:
                starts = [0]
            else:
                starts = list(range(0, L, stride_frames))
                # drop a trailing window fully covered by the previous one
                if len(starts) > 1 and starts[-1] + _OVERLAP_SECONDS * 100 >= L:
                    starts.pop()
            for s in starts:
                e = min(s + _MAX_FRAMES, L)
                seg = mel[b, :, s:e]
                if seg.shape[1] < _MAX_FRAMES:
                    seg = np.pad(seg, ((0, 0), (0, _MAX_FRAMES - seg.shape[1])))
                segments.append(seg)
                seg_lens.append(e - s)
                owners.append(b)

        codes, code_len = self._encode_jit()(
            self, jnp.asarray(np.stack(segments)),
            jnp.asarray(np.asarray(seg_lens, np.int32)))
        codes = np.asarray(codes)
        code_len = np.asarray(code_len)

        merged: List[List[int]] = [[] for _ in range(B)]
        per_owner: List[List[List[int]]] = [[] for _ in range(B)]
        for i, b in enumerate(owners):
            per_owner[b].append(codes[i, : int(code_len[i])].tolist())
        for b in range(B):
            if len(per_owner[b]) == 1:
                merged[b] = per_owner[b][0]
            else:
                merged[b] = merge_tokenized_segments(per_owner[b],
                                                     _OVERLAP_SECONDS,
                                                     S3_TOKEN_RATE)
        out_len = np.asarray([len(m) for m in merged], np.int64)
        out = np.zeros((B, int(out_len.max())), np.int64)
        for b in range(B):
            out[b, : out_len[b]] = merged[b]
        return out, out_len

    def __call__(self, mel, mel_len):
        return self.quantize(mel, mel_len)

    # ---- loading --------------------------------------------------------
    def sanitize(self, weights: dict) -> dict:
        out = {}
        for key, value in weights.items():
            if "freqs_cis" in key or "_mel_filters" in key or key.startswith("onnx::"):
                continue
            k = key
            k = k.replace("quantizer._codebook.", "fsq_codebook.")
            k = k.replace("quantizer.codebook.", "fsq_codebook.")
            k = k.replace("quantizer.fsq_codebook.", "fsq_codebook.")
            # torch Sequential mlp.0/mlp.2 → our Sequential layers list
            import re

            k = re.sub(r"\.mlp\.(\d+)\.", r".mlp.layers.\1.", k)
            out[k] = value
        return orient_weights_to_model(self, out)

    DEFAULT_REPO = "mlx-community/S3TokenizerV2"

    @classmethod
    def from_pretrained(cls, name: Optional[str] = None,
                        repo_id: Optional[str] = None):
        """Load pretrained weights from a HF repo or local dir
        (reference model_v2.py:623-637 / model_v3.py:393-410)."""
        from ....nn.module import load_weights as assign
        from ....utils import get_model_path, load_weight_files

        model = cls(name) if name else cls()
        path = get_model_path(repo_id or cls.DEFAULT_REPO)
        weights = model.sanitize(load_weight_files(path))
        return assign(model, weights, strict=False).eval()


class S3TokenizerV3(S3TokenizerV2):
    """v3: 12 layers (reference model_v3.py:127-410)."""

    version = 3
    DEFAULT_REPO = "mlx-community/S3TokenizerV3"

    def __init__(self, name: str = "speech_tokenizer_v3", config=None):
        if config is None:
            config = ModelConfig(n_audio_layer=12)
        super().__init__(name, config)


class S3Tokenizer(S3TokenizerV2):
    """v1: Euclidean VQ, sinusoid positions (reference model.py:251-280)."""

    version = 1

    def __init__(self, name: str = "speech_tokenizer_v1_25hz",
                 config: Optional[ModelConfig] = None):
        config = config or ModelConfig(n_codebook_size=S3_V1_VOCAB_SIZE)
        self.config = config
        self.name = name
        stride = 2 if name == "speech_tokenizer_v1_25hz" else 1
        self.encoder = AudioEncoder(config, stride=stride, version=1)
        self.euclid_codebook = EuclideanCodebook(config.n_audio_state,
                                                 config.n_codebook_size)

    def _quantize_hidden(self, hidden: jnp.ndarray) -> jnp.ndarray:
        return self.euclid_codebook.encode(hidden)

    def sanitize(self, weights: dict) -> dict:
        out = {}
        for key, value in weights.items():
            if "positional_embedding" in key or key.startswith("onnx::"):
                continue
            k = key
            k = k.replace("quantizer._codebook.", "euclid_codebook.")
            k = k.replace("quantizer.codebook.", "euclid_codebook.")
            import re

            k = re.sub(r"\.mlp\.(\d+)\.", r".mlp.layers.\1.", k)
            out[k] = value
        return orient_weights_to_model(self, out)


def padding(mels: List[np.ndarray]) -> Tuple[np.ndarray, np.ndarray]:
    """Pad a list of (n_mels, T) mels into a batch (reference utils.py:188-215)."""
    lens = np.asarray([m.shape[-1] for m in mels], np.int64)
    T = int(lens.max())
    out = np.zeros((len(mels), mels[0].shape[0], T), np.float32)
    for i, m in enumerate(mels):
        out[i, :, : m.shape[-1]] = np.asarray(m)
    return out, lens

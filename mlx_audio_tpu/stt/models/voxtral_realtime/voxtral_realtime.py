"""Voxtral Mini Realtime: causal streaming encoder + AdaRMSNorm decoder.

TPU-native re-implementation of the reference
mlx_audio/stt/models/voxtral_realtime/ (encoder.py, decoder.py, audio.py,
voxtral_realtime.py, config.py). The reference decodes one position per
host step with incremental chunked encoding; here the full sliding-window
causal encoder runs as one jitted program and the position-locked decode
(audio embedding at each step added to the previous token's embedding)
runs as a single on-device `lax.while_loop`.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....dsp import mel_filters as make_mel_filters
from ....dsp import stft
from ....lm.cache import KVCache
from ....nn import layers as nn
from ....nn.module import Module
from ..base import STTOutput, ensure_waveform

__all__ = ["Model", "ModelConfig", "EncoderConfig", "DecoderConfig"]

SAMPLE_RATE = 16000
HOP_LENGTH = 160
AUDIO_LENGTH_PER_TOK = 8  # mel frames per audio token (2 conv × 4 ds)
RAW_AUDIO_LENGTH_PER_TOK = HOP_LENGTH * AUDIO_LENGTH_PER_TOK  # 1280


@dataclass
class AudioEncodingConfig:
    sampling_rate: int = 16000
    num_mel_bins: int = 128
    hop_length: int = 160
    window_size: int = 400
    global_log_mel_max: float = 1.5


@dataclass
class EncoderConfig:
    dim: int = 1280
    n_layers: int = 32
    n_heads: int = 32
    head_dim: int = 64
    hidden_dim: int = 5120
    norm_eps: float = 1e-5
    rope_theta: float = 1_000_000.0
    sliding_window: int = 750
    downsample_factor: int = 4

    @classmethod
    def from_dict(cls, d):
        return cls(**{k: v for k, v in d.items()
                      if k in cls.__dataclass_fields__})


@dataclass
class DecoderConfig:
    dim: int = 3072
    n_layers: int = 26
    n_heads: int = 32
    n_kv_heads: int = 8
    head_dim: int = 128
    hidden_dim: int = 9216
    vocab_size: int = 131072
    norm_eps: float = 1e-5
    rope_theta: float = 1_000_000.0
    sliding_window: int = 8192
    ada_rms_norm_t_cond_dim: int = 32

    @classmethod
    def from_dict(cls, d):
        return cls(**{k: v for k, v in d.items()
                      if k in cls.__dataclass_fields__})


@dataclass
class ModelConfig:
    model_type: str = "voxtral_realtime"
    encoder_args: Any = None
    decoder: Any = None
    audio_encoding_args: Any = None
    transcription_delay_ms: int = 480
    bos_token_id: int = 1
    eos_token_id: int = 2
    streaming_pad_token_id: int = 32
    n_left_pad_tokens: int = 32

    def __post_init__(self):
        if isinstance(self.encoder_args, dict):
            self.encoder_args = EncoderConfig.from_dict(self.encoder_args)
        self.encoder_args = self.encoder_args or EncoderConfig()
        if isinstance(self.decoder, dict):
            self.decoder = DecoderConfig.from_dict(self.decoder)
        self.decoder = self.decoder or DecoderConfig()
        if isinstance(self.audio_encoding_args, dict):
            self.audio_encoding_args = AudioEncodingConfig(
                **{k: v for k, v in self.audio_encoding_args.items()
                   if k in AudioEncodingConfig.__dataclass_fields__})
        self.audio_encoding_args = (self.audio_encoding_args
                                    or AudioEncodingConfig())

    @classmethod
    def from_dict(cls, d):
        return cls(**{k: v for k, v in d.items()
                      if k in cls.__dataclass_fields__})


def _num_audio_tokens(audio_len: int) -> int:
    if audio_len % HOP_LENGTH != 0:
        audio_len = math.ceil(audio_len / HOP_LENGTH - 1)
    else:
        audio_len //= HOP_LENGTH
    return math.ceil(audio_len / AUDIO_LENGTH_PER_TOK)


def _num_delay_tokens(delay_ms: float) -> int:
    return _num_audio_tokens(int(delay_ms / 1000.0 * SAMPLE_RATE))


def _interleaved_rope(x, cos, sin):
    """GPT-J interleaved pairs. x: (T, H, D); cos/sin (T, D/2)."""
    x1, x2 = x[..., ::2], x[..., 1::2]
    c = cos[:, None, :]
    s = sin[:, None, :]
    o1 = x1 * c - x2 * s
    o2 = x2 * c + x1 * s
    return jnp.stack([o1, o2], axis=-1).reshape(x.shape)


def _rope_tables(positions, head_dim, theta):
    freqs = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32)
                             / head_dim))
    ang = positions[:, None].astype(jnp.float32) * freqs[None]
    return jnp.cos(ang), jnp.sin(ang)


class EncoderLayer(Module):
    """reference encoder.py:79-160 (selective biases, SwiGLU)."""

    def __init__(self, cfg: EncoderConfig):
        attn_dim = cfg.n_heads * cfg.head_dim
        self.attention_norm = nn.RMSNorm(cfg.dim, eps=cfg.norm_eps)
        self.wq = nn.Linear(cfg.dim, attn_dim)
        self.wk = nn.Linear(cfg.dim, attn_dim, bias=False)
        self.wv = nn.Linear(cfg.dim, attn_dim)
        self.wo = nn.Linear(attn_dim, cfg.dim)
        self.ffn_norm = nn.RMSNorm(cfg.dim, eps=cfg.norm_eps)
        self.feed_forward_w1 = nn.Linear(cfg.dim, cfg.hidden_dim, bias=False)
        self.feed_forward_w3 = nn.Linear(cfg.dim, cfg.hidden_dim, bias=False)
        self.feed_forward_w2 = nn.Linear(cfg.hidden_dim, cfg.dim)
        self.n_heads = cfg.n_heads
        self.head_dim = cfg.head_dim

    def __call__(self, x, cos, sin, mask):
        T = x.shape[0]
        h = self.attention_norm(x)
        q = _interleaved_rope(self.wq(h).reshape(T, self.n_heads,
                                                 self.head_dim), cos, sin)
        k = _interleaved_rope(self.wk(h).reshape(T, self.n_heads,
                                                 self.head_dim), cos, sin)
        v = self.wv(h).reshape(T, self.n_heads, self.head_dim)
        q, k, v = (a.transpose(1, 0, 2) for a in (q, k, v))
        scores = q @ k.transpose(0, 2, 1) / math.sqrt(self.head_dim) + mask
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        o = (attn @ v).transpose(1, 0, 2).reshape(T, -1)
        x = x + self.wo(o)
        h = self.ffn_norm(x)
        return x + self.feed_forward_w2(
            jax.nn.silu(self.feed_forward_w1(h)) * self.feed_forward_w3(h))


class AudioEncoder(Module):
    """reference encoder.py:163-299."""

    def __init__(self, cfg: EncoderConfig, decoder_dim: int = 3072):
        self.cfg = cfg
        self.conv_layers_0_conv = nn.Conv1d(128, cfg.dim, 3)
        self.conv_layers_1_conv = nn.Conv1d(cfg.dim, cfg.dim, 3, stride=2)
        self.transformer_layers = [EncoderLayer(cfg)
                                   for _ in range(cfg.n_layers)]
        self.transformer_norm = nn.RMSNorm(cfg.dim, eps=cfg.norm_eps)
        self.audio_language_projection_0 = nn.Linear(
            cfg.dim * cfg.downsample_factor, decoder_dim, bias=False)
        self.audio_language_projection_2 = nn.Linear(decoder_dim, decoder_dim,
                                                     bias=False)

    def conv_stem(self, mel):
        """mel (T, n_mels) → (T//2, dim), causal left pads."""
        x = mel[None]
        x = jnp.pad(x, ((0, 0), (2, 0), (0, 0)))
        x = jax.nn.gelu(self.conv_layers_0_conv(x))
        x = jnp.pad(x, ((0, 0), (1, 0), (0, 0)))
        x = jax.nn.gelu(self.conv_layers_1_conv(x))
        x = x[0]
        trunc = x.shape[0] % self.cfg.downsample_factor
        return x[trunc:] if trunc else x

    def __call__(self, mel):
        """mel (T, n_mels) → adapter tokens (T//2//4, decoder_dim). The
        sliding-window causal mask reproduces the reference's chunked
        RotatingKVCache attention exactly, in one program."""
        x = self.conv_stem(mel)
        T = x.shape[0]
        pos = jnp.arange(T)
        cos, sin = _rope_tables(pos, self.cfg.head_dim, self.cfg.rope_theta)
        rows = pos[:, None]
        cols = pos[None, :]
        ok = (cols <= rows) & (cols > rows - self.cfg.sliding_window)
        mask = jnp.where(ok, 0.0, -1e9)[None]
        for layer in self.transformer_layers:
            x = layer(x, cos, sin, mask)
        x = self.transformer_norm(x)
        ds = self.cfg.downsample_factor
        n = x.shape[0] // ds
        x = x[: n * ds].reshape(n, self.cfg.dim * ds)
        return self.audio_language_projection_2(
            jax.nn.gelu(self.audio_language_projection_0(x)))


def compute_time_embedding(t_value: float, dim: int,
                           theta: float = 10000.0) -> jnp.ndarray:
    half = dim // 2
    inv = jnp.exp(-math.log(theta) * jnp.arange(half, dtype=jnp.float32)
                  / half)
    emb = t_value * inv
    return jnp.concatenate([jnp.cos(emb), jnp.sin(emb)])


class DecoderLayer(Module):
    """reference decoder.py:69-220 (AdaRMSNorm on the FFN input)."""

    def __init__(self, cfg: DecoderConfig):
        self.attention_norm = nn.RMSNorm(cfg.dim, eps=cfg.norm_eps)
        self.wq = nn.Linear(cfg.dim, cfg.n_heads * cfg.head_dim, bias=False)
        self.wk = nn.Linear(cfg.dim, cfg.n_kv_heads * cfg.head_dim,
                            bias=False)
        self.wv = nn.Linear(cfg.dim, cfg.n_kv_heads * cfg.head_dim,
                            bias=False)
        self.wo = nn.Linear(cfg.n_heads * cfg.head_dim, cfg.dim, bias=False)
        self.ffn_norm = nn.RMSNorm(cfg.dim, eps=cfg.norm_eps)
        self.ada_down = nn.Linear(cfg.dim, cfg.ada_rms_norm_t_cond_dim,
                                  bias=False)
        self.ada_up = nn.Linear(cfg.ada_rms_norm_t_cond_dim, cfg.dim,
                                bias=False)
        self.feed_forward_w1 = nn.Linear(cfg.dim, cfg.hidden_dim, bias=False)
        self.feed_forward_w3 = nn.Linear(cfg.dim, cfg.hidden_dim, bias=False)
        self.feed_forward_w2 = nn.Linear(cfg.hidden_dim, cfg.dim, bias=False)
        self.n_heads = cfg.n_heads
        self.n_kv_heads = cfg.n_kv_heads
        self.head_dim = cfg.head_dim
        self.rope_theta = cfg.rope_theta

    def ada_scale(self, t_cond):
        return self.ada_up(jax.nn.gelu(self.ada_down(t_cond)))

    def __call__(self, x, positions, ada_scale, cache: Optional[KVCache],
                 mask=None):
        B, T, D = x.shape
        h = self.attention_norm(x)
        cos, sin = _rope_tables(positions, self.head_dim, self.rope_theta)
        q = _interleaved_rope(self.wq(h).reshape(B * T, self.n_heads,
                                                 self.head_dim), cos, sin)
        k = _interleaved_rope(self.wk(h).reshape(B * T, self.n_kv_heads,
                                                 self.head_dim), cos, sin)
        v = self.wv(h).reshape(B * T, self.n_kv_heads, self.head_dim)
        q = q.reshape(B, T, self.n_heads, self.head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, self.n_kv_heads, self.head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, self.n_kv_heads, self.head_dim).transpose(0, 2, 1, 3)
        new_cache = None
        if cache is not None:
            k, v, new_cache = cache.update(k, v)
            if mask is None:
                mask = cache.attention_mask(T)
        rep = self.n_heads // self.n_kv_heads
        if rep > 1:
            k = jnp.repeat(k, rep, axis=1)
            v = jnp.repeat(v, rep, axis=1)
        scores = q @ k.transpose(0, 1, 3, 2) / math.sqrt(self.head_dim)
        if mask is not None:
            scores = scores + mask
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        o = (attn @ v).transpose(0, 2, 1, 3).reshape(B, T, -1)
        x = x + self.wo(o)
        h = self.ffn_norm(x) * (1.0 + ada_scale)
        return x + self.feed_forward_w2(
            jax.nn.silu(self.feed_forward_w1(h)) * self.feed_forward_w3(h)), \
            new_cache


class Decoder(Module):
    def __init__(self, cfg: DecoderConfig):
        self.cfg = cfg
        self.tok_embeddings = nn.Embedding(cfg.vocab_size, cfg.dim)
        self.layers = [DecoderLayer(cfg) for _ in range(cfg.n_layers)]
        self.norm = nn.RMSNorm(cfg.dim, eps=cfg.norm_eps)

    def __call__(self, embeds, positions, ada_scales, caches, mask=None):
        h = embeds
        new_caches = []
        for i, layer in enumerate(self.layers):
            h, nc = layer(h, positions, ada_scales[i],
                          caches[i] if caches is not None else None, mask)
            new_caches.append(nc)
        h = self.norm(h)
        return h @ self.tok_embeddings.weight.T, h, new_caches


@partial(jax.jit, static_argnames=("max_steps", "temperature"),
         donate_argnames=("caches",))
def _realtime_decode(model, caches, prefix_embeds, prefill_len, adapter_out,
                     n_audio, key, ada_scales, max_steps: int,
                     temperature: float):
    """Position-locked streaming decode, one dispatch
    (reference voxtral_realtime.py:244-341)."""
    eos = model.config.eos_token_id
    Tp = prefix_embeds.shape[1]
    S = caches[0].max_len
    q_idx = jnp.arange(Tp)[:, None]
    k_idx = jnp.arange(S)[None, :]
    ok = (k_idx <= q_idx) & (k_idx < prefill_len)
    mask = jnp.where(ok, 0.0, -jnp.inf)[None, None]
    logits, _, caches = model.decoder(prefix_embeds, jnp.arange(Tp),
                                      ada_scales, caches, mask)
    last = jnp.clip(prefill_len - 1, 0, Tp - 1)
    logits = logits[:, last].astype(jnp.float32)

    out = jnp.zeros((max_steps,), jnp.int32)

    def sample(lg, key):
        if temperature <= 0:
            return jnp.argmax(lg[0]).astype(jnp.int32)
        return jax.random.categorical(key, lg[0] / temperature).astype(jnp.int32)

    def cond(s):
        step, done = s[0], s[5]
        return (step < max_steps) & ((prefill_len + step) < n_audio) & ~done

    def body(s):
        step, caches, logits, out, key, done = s
        key, sub = jax.random.split(key)
        tok = sample(logits, sub)
        is_eos = tok == eos
        out = jnp.where(is_eos | done, out, out.at[step].set(tok))
        done = done | is_eos

        pos = prefill_len + step
        audio_emb = jax.lax.dynamic_slice(
            adapter_out, (jnp.minimum(pos, adapter_out.shape[0] - 1), 0),
            (1, adapter_out.shape[1]))
        emb = (audio_emb + model.decoder.tok_embeddings.weight[tok][None]
               )[None]
        valid = (k_idx[0] < prefill_len) | ((k_idx[0] >= Tp)
                                            & (k_idx[0] <= Tp + step))
        dmask = jnp.where(valid, 0.0, -jnp.inf)[None, None, None, :]
        logits, _, caches = model.decoder(emb, pos[None], ada_scales, caches,
                                          dmask)
        logits = logits[:, -1].astype(jnp.float32)
        step = jnp.where(done, step, step + 1)
        return (step, caches, logits, out, key, done)

    state = (jnp.array(0, jnp.int32), caches, logits, out, key,
             jnp.array(False))
    n, _, _, out, _, _ = jax.lax.while_loop(cond, body, state)
    return out, n


@partial(jax.jit, donate_argnames=("caches",))
def _realtime_prefill(model, caches, prefix_embeds, prefill_len, ada_scales):
    """Prefill half of _realtime_decode, split out for streaming resume."""
    Tp = prefix_embeds.shape[1]
    S = caches[0].max_len
    q_idx = jnp.arange(Tp)[:, None]
    k_idx = jnp.arange(S)[None, :]
    ok = (k_idx <= q_idx) & (k_idx < prefill_len)
    mask = jnp.where(ok, 0.0, -jnp.inf)[None, None]
    logits, _, caches = model.decoder(prefix_embeds, jnp.arange(Tp),
                                      ada_scales, caches, mask)
    last = jnp.clip(prefill_len - 1, 0, Tp - 1)
    return logits[:, last].astype(jnp.float32), caches


@partial(jax.jit, static_argnames=("chunk", "prompt_width", "temperature"),
         donate_argnames=("caches",))
def _realtime_decode_chunk(model, caches, logits, start_step, prefill_len,
                           adapter_out, n_audio, key, ada_scales,
                           chunk: int, prompt_width: int, temperature: float):
    """Up to `chunk` position-locked steps from absolute step `start_step`,
    resumable across calls (stream path of reference
    voxtral_realtime.py:344-420)."""
    eos = model.config.eos_token_id
    S = caches[0].max_len
    k_idx = jnp.arange(S)
    out = jnp.zeros((chunk,), jnp.int32)

    def sample(lg, key):
        if temperature <= 0:
            return jnp.argmax(lg[0]).astype(jnp.int32)
        return jax.random.categorical(key, lg[0] / temperature).astype(
            jnp.int32)

    def cond(s):
        local, done = s[0], s[5]
        return ((local < chunk) & ~done
                & ((prefill_len + start_step + local) < n_audio))

    def body(s):
        local, caches, logits, out, key, done = s
        key, sub = jax.random.split(key)
        tok = sample(logits, sub)
        is_eos = tok == eos
        out = jnp.where(is_eos | done, out, out.at[local].set(tok))
        done = done | is_eos

        step = start_step + local
        pos = prefill_len + step
        audio_emb = jax.lax.dynamic_slice(
            adapter_out, (jnp.minimum(pos, adapter_out.shape[0] - 1), 0),
            (1, adapter_out.shape[1]))
        emb = (audio_emb + model.decoder.tok_embeddings.weight[tok][None]
               )[None]
        valid = (k_idx < prefill_len) | ((k_idx >= prompt_width)
                                         & (k_idx <= prompt_width + step))
        dmask = jnp.where(valid, 0.0, -jnp.inf)[None, None, None, :]
        logits, _, caches = model.decoder(emb, pos[None], ada_scales, caches,
                                          dmask)
        logits = logits[:, -1].astype(jnp.float32)
        local = jnp.where(done, local, local + 1)
        return (local, caches, logits, out, key, done)

    state = (jnp.array(0, jnp.int32), caches, logits, out, key,
             jnp.array(False))
    local, caches, logits, out, key, done = jax.lax.while_loop(
        cond, body, state)
    return out, local, caches, logits, key, done


class Model(Module):
    """reference voxtral_realtime.py:68-537."""

    _RUNTIME: dict = {}

    def __init__(self, config: Any = None):
        if isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        self.config = config or ModelConfig()
        self.encoder = AudioEncoder(self.config.encoder_args,
                                    self.config.decoder.dim)
        self.decoder = Decoder(self.config.decoder)

    @property
    def sample_rate(self) -> int:
        return SAMPLE_RATE

    def set_runtime(self, tokenizer=None):
        if tokenizer is not None:
            Model._RUNTIME.setdefault(id(self), {})["tokenizer"] = tokenizer

    def make_batcher(self, **kwargs):
        """Serving batcher: concurrent realtime sessions' position-locked
        decodes run in lock-step slots (audio encode stays per-request)."""
        from .batcher import VoxtralRTBatcher

        return VoxtralRTBatcher(self, **kwargs)

    def _submit_to_hook(self, hook, prepared, temperature, seed=0,
                        on_frame=None):
        (duration, adapter_out, n_audio, ada_scales, prompt_len, prefix,
         T0, _Tp, max_steps, _caches) = prepared
        ada = np.stack([np.asarray(a).reshape(-1) for a in ada_scales])
        return hook.submit(
            np.asarray(adapter_out), np.asarray(prefix[:, :T0]), ada,
            prompt_len=T0, max_steps=max_steps, temperature=temperature,
            seed=seed, on_frame=on_frame)

    def _resolve_tokenizer(self, tokenizer=None):
        """Explicit arg → runtime slot → lazy tekken.json next to the
        weights (reference voxtral_realtime.py:517-522)."""
        if tokenizer is not None:
            return tokenizer
        rt = Model._RUNTIME.setdefault(id(self), {})
        tok = rt.get("tokenizer")
        if tok is None:
            model_path = getattr(self.config, "model_path", None)
            if model_path:
                from .tokenizer import TekkenTokenizer

                tok = TekkenTokenizer.from_model_path(model_path)
                rt["tokenizer"] = tok
        return tok

    def _prepare_mel(self, audio: np.ndarray, delay_ms: Optional[int]):
        delay_ms = delay_ms or self.config.transcription_delay_ms
        n_delay = _num_delay_tokens(delay_ms)
        n_left = self.config.n_left_pad_tokens
        n_right = (n_delay + 1) + 10
        mult = RAW_AUDIO_LENGTH_PER_TOK
        align = (mult - (len(audio) % mult)) % mult
        padded = np.pad(audio, (n_left * mult, align + n_right * mult))

        aec = self.config.audio_encoding_args
        window = jnp.hanning(aec.window_size + 1)[:-1]
        spec = stft(jnp.asarray(padded), n_fft=aec.window_size,
                    hop_length=aec.hop_length, win_length=aec.window_size,
                    window=window)
        mag = jnp.abs(spec) ** 2
        filters = make_mel_filters(aec.sampling_rate, aec.window_size,
                                   aec.num_mel_bins, norm="slaney",
                                   mel_scale="slaney")
        mel = mag @ filters.T
        log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
        log_spec = jnp.maximum(log_spec, aec.global_log_mel_max - 8.0)
        log_spec = (log_spec + 4.0) / 4.0
        if log_spec.shape[0] % 2 != 0:
            log_spec = log_spec[1:]
        return log_spec, n_delay  # (T, n_mels)

    def _prepare_decode(self, audio, transcription_delay_ms, max_tokens):
        """Shared encode + prefix construction for generate/stream paths."""
        audio = ensure_waveform(audio, SAMPLE_RATE)
        duration = len(audio) / SAMPLE_RATE

        mel, n_delay = self._prepare_mel(audio, transcription_delay_ms)
        adapter_out = self.encoder(mel)  # (Na, D)
        n_audio = adapter_out.shape[0]

        t_cond = compute_time_embedding(float(n_delay),
                                        self.config.decoder.dim)
        ada_scales = [layer.ada_scale(t_cond)
                      for layer in self.decoder.layers]

        n_left = self.config.n_left_pad_tokens
        prompt_len = 1 + n_left + n_delay
        ids = [self.config.bos_token_id] + [
            self.config.streaming_pad_token_id] * (n_left + n_delay)
        text_emb = self.decoder.tok_embeddings(jnp.asarray([ids], jnp.int32))
        prefix = adapter_out[:prompt_len][None] + text_emb

        T0 = prefix.shape[1]
        Tp = max(16, ((T0 + 15) // 16) * 16)
        prefix = jnp.pad(prefix, ((0, 0), (0, Tp - T0), (0, 0)))
        max_steps = min(max_tokens, max(1, n_audio - prompt_len))
        cfg = self.config.decoder
        caches = [KVCache(1, cfg.n_kv_heads, Tp + max_steps + 1,
                          cfg.head_dim, jnp.float32)
                  for _ in range(cfg.n_layers)]
        return (duration, adapter_out, n_audio, ada_scales, prompt_len,
                prefix, T0, Tp, max_steps, caches)

    def generate(self, audio, *, max_tokens: int = 4096,
                 temperature: float = 0.0, verbose: bool = False,
                 stream: bool = False,
                 transcription_delay_ms: Optional[int] = None,
                 tokenizer=None, **kwargs):
        """Transcribe. Returns STTOutput, or a generator of text deltas when
        stream=True (reference voxtral_realtime.py:244-269)."""
        if stream:
            return self._generate_stream(
                audio, max_tokens, temperature, verbose,
                transcription_delay_ms, tokenizer)
        t0 = time.perf_counter()
        tokenizer = self._resolve_tokenizer(tokenizer)
        prepared = self._prepare_decode(audio, transcription_delay_ms,
                                        max_tokens)
        (duration, adapter_out, n_audio, ada_scales, prompt_len, prefix, T0,
         _Tp, max_steps, caches) = prepared
        # under a running server a VoxtralRTBatcher may be installed:
        # concurrent sessions' position-locked decodes run in lock-step
        from ....serving import get_infer_hook

        hook = get_infer_hook(self)
        if hook is not None:
            seq = [int(t) for t in self._submit_to_hook(
                hook, prepared, float(temperature)).result()]
        else:
            out, n = _realtime_decode(
                self, caches, prefix, jnp.array(T0, jnp.int32), adapter_out,
                jnp.array(n_audio, jnp.int32), jax.random.PRNGKey(0),
                ada_scales, max_steps, float(temperature))
            toks, n = jax.device_get((out, n))
            seq = [int(t) for t in toks[: int(n)]
                   if t != self.config.eos_token_id]
        text = tokenizer.decode(seq) if tokenizer is not None else \
            " ".join(map(str, seq))
        wall = time.perf_counter() - t0
        if verbose:
            print(text.strip())
        return STTOutput(text=text.strip(), duration=duration,
                         prompt_tokens=prompt_len,
                         generation_tokens=len(seq),
                         generation_tps=len(seq) / max(wall, 1e-9))

    def _generate_stream(self, audio, max_tokens, temperature, verbose,
                         transcription_delay_ms, tokenizer,
                         chunk_tokens: int = 16):
        """Yield text deltas as tokens decode (reference
        voxtral_realtime.py:344-420). The position-locked loop resumes on
        device in `chunk_tokens` blocks; deltas are diffed against the
        running detokenization so multi-token characters emit cleanly."""
        tokenizer = self._resolve_tokenizer(tokenizer)
        prepared = self._prepare_decode(audio, transcription_delay_ms,
                                        max_tokens)
        (duration, adapter_out, n_audio, ada_scales, prompt_len, prefix, T0,
         Tp, max_steps, caches) = prepared
        # batched + streaming: the slot batcher delivers tokens through
        # `on_frame` as its fused ticks complete; regroup into
        # chunk_tokens blocks and diff-detokenize exactly like the
        # single-stream loop below
        from ....serving import get_infer_hook, stream_chunks

        hook = get_infer_hook(self)
        if hook is not None:
            generated: list = []
            prev_text = ""
            for chunk in stream_chunks(
                    lambda **kw: self._submit_to_hook(
                        hook, prepared, float(temperature),
                        on_frame=kw["on_frame"]),
                    chunk_size=chunk_tokens, callback_kw="on_frame"):
                generated.extend(int(t) for t in chunk)
                text = (tokenizer.decode(generated) if tokenizer is not None
                        else " ".join(map(str, generated)))
                if text != prev_text:
                    delta = text[len(prev_text):]
                    if verbose:
                        print(delta, end="", flush=True)
                    yield delta
                    prev_text = text
            if verbose:
                print()
            return
        logits, caches = _realtime_prefill(
            self, caches, prefix, jnp.array(T0, jnp.int32), ada_scales)
        key = jax.random.PRNGKey(0)
        produced = 0
        generated: list = []
        prev_text = ""
        while produced < max_steps:
            out, n, caches, logits, key, done = _realtime_decode_chunk(
                self, caches, logits, jnp.array(produced, jnp.int32),
                jnp.array(T0, jnp.int32), adapter_out,
                jnp.array(n_audio, jnp.int32), key, ada_scales,
                chunk_tokens, Tp, float(temperature))
            # chunk size is static for compile reuse; trim any overshoot
            # past the caller's max_tokens cap
            n = min(int(n), max_steps - produced)
            produced += n
            generated.extend(
                int(t) for t in np.asarray(out)[:n]
                if int(t) != self.config.eos_token_id)
            text = (tokenizer.decode(generated) if tokenizer is not None
                    else " ".join(map(str, generated)))
            if text != prev_text:
                delta = text[len(prev_text):]
                if verbose:
                    print(delta, end="", flush=True)
                yield delta
                prev_text = text
            if bool(done) or n == 0:
                break
        if verbose:
            print()

    def sanitize(self, weights: dict) -> dict:
        from ....nn.sanitize import orient_weights_to_model

        out = {}
        for key, value in weights.items():
            k = key
            k = k.replace("conv_layers.0.conv.", "conv_layers_0_conv.")
            k = k.replace("conv_layers.1.conv.", "conv_layers_1_conv.")
            k = k.replace("audio_language_projection.0.",
                          "audio_language_projection_0.")
            k = k.replace("audio_language_projection.2.",
                          "audio_language_projection_2.")
            k = k.replace(".feed_forward.w1.", ".feed_forward_w1.")
            k = k.replace(".feed_forward.w2.", ".feed_forward_w2.")
            k = k.replace(".feed_forward.w3.", ".feed_forward_w3.")
            k = k.replace(".attention.wq.", ".wq.")
            k = k.replace(".attention.wk.", ".wk.")
            k = k.replace(".attention.wv.", ".wv.")
            k = k.replace(".attention.wo.", ".wo.")
            k = k.replace(".ada_rms_norm_t_cond.ada_down.", ".ada_down.")
            k = k.replace(".ada_rms_norm_t_cond.ada_up.", ".ada_up.")
            out[k] = value
        return orient_weights_to_model(self, out)

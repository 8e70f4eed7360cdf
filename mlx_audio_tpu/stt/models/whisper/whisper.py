"""Whisper model — TPU-native encoder/decoder + seek-loop transcription.

Behavioral spec: reference stt/models/whisper/whisper.py (AudioEncoder :409,
TextDecoder :440, Model :489, generate :768 with temperature fallback :904
and the 30 s seek loop :985). Parameter names follow the mlx-community
whisper checkpoints (encoder.blocks.N.attn.query...). The decode loop is
fully on-device (see decoding.py); cross-attention K/V are computed once
per window.
"""

from __future__ import annotations

import math
import os
import time
from dataclasses import dataclass
from functools import lru_cache, partial
from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....nn import Conv1d, Embedding, LayerNorm, Linear, Module
from ....lm.cache import KVCache
from ....ops.attention import scaled_dot_product_attention
from ..base import STTOutput
from . import audio as A
from .decoding import DecodingOptions, DecodingResult, decode_window

__all__ = ["Model", "ModelConfig", "ModelDimensions"]


@dataclass
class ModelDimensions(BaseModelArgs):
    n_mels: int = 80
    n_audio_ctx: int = 1500
    n_audio_state: int = 512
    n_audio_head: int = 8
    n_audio_layer: int = 6
    n_vocab: int = 51865
    n_text_ctx: int = 448
    n_text_state: int = 512
    n_text_head: int = 8
    n_text_layer: int = 6
    model_path: str = ""

    @classmethod
    def from_dict(cls, config: dict):
        config = dict(config)
        if "d_model" in config:  # HF transformers naming
            config.setdefault("n_mels", config.get("num_mel_bins", 80))
            config.setdefault("n_audio_state", config["d_model"])
            config.setdefault("n_text_state", config["d_model"])
            config.setdefault("n_audio_head", config.get("encoder_attention_heads", 8))
            config.setdefault("n_text_head", config.get("decoder_attention_heads", 8))
            config.setdefault("n_audio_layer", config.get("encoder_layers", 6))
            config.setdefault("n_text_layer", config.get("decoder_layers", 6))
            config.setdefault("n_vocab", config.get("vocab_size", 51865))
            config.setdefault("n_text_ctx", config.get("max_target_positions", 448))
            config.setdefault("n_audio_ctx", config.get("max_source_positions", 1500))
        return super(ModelDimensions, cls).from_dict(config)


ModelConfig = ModelDimensions


def sinusoids(length: int, channels: int, max_timescale: int = 10000) -> np.ndarray:
    assert channels % 2 == 0
    log_ts_inc = math.log(max_timescale) / (channels // 2 - 1)
    inv = np.exp(-log_ts_inc * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


class MultiHeadAttention(Module):
    # post-load quantized q/k/v row-stack — valid only when all three
    # consume the same activation, so cross-attention instances set
    # `_fuse_veto` (their key/value read encoder state, not x)
    _FUSE_GROUPS = (("qkv_fused", ("query", "key", "value")),)

    def __init__(self, n_state: int, n_head: int):
        self.query = Linear(n_state, n_state)
        self.key = Linear(n_state, n_state, bias=False)
        self.value = Linear(n_state, n_state)
        self.out = Linear(n_state, n_state)
        self.n_head = n_head

    def _split(self, x):
        B, T, D = x.shape
        return jnp.swapaxes(x.reshape(B, T, self.n_head, D // self.n_head), 1, 2)

    def __call__(self, x, xa=None, mask=None, cache: Optional[KVCache] = None,
                 cross_kv: Optional[Tuple] = None):
        new_cache = None
        if hasattr(self, "qkv_fused") and xa is None and cross_kv is None:
            q, k, v = (self._split(p) for p in self.qkv_fused(x))
            if cache is not None:
                k, v, new_cache = cache.update(k, v)
        else:
            q = self._split(self.query(x))
            if cross_kv is not None:
                k, v = cross_kv
            else:
                k = self._split(self.key(xa if xa is not None else x))
                v = self._split(self.value(xa if xa is not None else x))
                if cache is not None:
                    k, v, new_cache = cache.update(k, v)
        out = scaled_dot_product_attention(q, k, v, mask=mask)
        B, H, T, Dh = out.shape
        return self.out(jnp.swapaxes(out, 1, 2).reshape(B, T, H * Dh)), new_cache

    def cross_kv(self, xa):
        return self._split(self.key(xa)), self._split(self.value(xa))

    def call_with_qk(self, x, cross_kv):
        """Cross attention returning (out, qk_scores) — the pre-softmax
        scaled scores used for DTW word alignment (reference timing.py)."""
        q = self._split(self.query(x))
        k, v = cross_kv
        scale = (q.shape[-1]) ** -0.5
        qk = jnp.einsum("bhtd,bhsd->bhts", q, k,
                        preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(qk, axis=-1).astype(v.dtype)
        out = attn @ v
        B, H, T, Dh = out.shape
        return self.out(jnp.swapaxes(out, 1, 2).reshape(B, T, H * Dh)), qk


class ResidualAttentionBlock(Module):
    def __init__(self, n_state: int, n_head: int, cross_attention: bool = False):
        self.attn = MultiHeadAttention(n_state, n_head)
        self.attn_ln = LayerNorm(n_state)
        if cross_attention:
            self.cross_attn = MultiHeadAttention(n_state, n_head)
            self.cross_attn._fuse_veto = True  # key/value read encoder state
            self.cross_attn_ln = LayerNorm(n_state)
        self.mlp1 = Linear(n_state, 4 * n_state)
        self.mlp2 = Linear(4 * n_state, n_state)
        self.mlp_ln = LayerNorm(n_state)

    def __call__(self, x, xa=None, mask=None, cache=None, cross_kv=None):
        a, new_cache = self.attn(self.attn_ln(x), mask=mask, cache=cache)
        x = x + a
        if hasattr(self, "cross_attn"):
            c, _ = self.cross_attn(self.cross_attn_ln(x), xa=xa, cross_kv=cross_kv)
            x = x + c
        x = x + self.mlp2(jax.nn.gelu(self.mlp1(self.mlp_ln(x)), approximate=False))
        return x, new_cache


class AudioEncoder(Module):
    def __init__(self, dims: ModelDimensions):
        self.conv1 = Conv1d(dims.n_mels, dims.n_audio_state, 3, padding=1)
        self.conv2 = Conv1d(dims.n_audio_state, dims.n_audio_state, 3, stride=2, padding=1)
        self.blocks = [
            ResidualAttentionBlock(dims.n_audio_state, dims.n_audio_head)
            for _ in range(dims.n_audio_layer)
        ]
        self.ln_post = LayerNorm(dims.n_audio_state)
        self._positional_embedding = jnp.asarray(
            sinusoids(dims.n_audio_ctx, dims.n_audio_state)
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        # x: (B, T=3000, n_mels); compute in the parameter dtype (bf16 after
        # nn.cast_floats) regardless of the f32 mel front-end
        x = x.astype(self.conv1.weight.dtype)
        x = jax.nn.gelu(self.conv1(x), approximate=False)
        x = jax.nn.gelu(self.conv2(x), approximate=False)
        x = x + self._positional_embedding[: x.shape[1]].astype(x.dtype)
        for block in self.blocks:
            x, _ = block(x)
        return self.ln_post(x)


class TextDecoder(Module):
    def __init__(self, dims: ModelDimensions):
        self.token_embedding = Embedding(dims.n_vocab, dims.n_text_state)
        self.positional_embedding = 0.01 * jax.random.normal(
            jax.random.PRNGKey(0), (dims.n_text_ctx, dims.n_text_state)
        )
        self.blocks = [
            ResidualAttentionBlock(
                dims.n_text_state, dims.n_text_head, cross_attention=True
            )
            for _ in range(dims.n_text_layer)
        ]
        self.ln = LayerNorm(dims.n_text_state)

    def cross_kv(self, xa):
        return [blk.cross_attn.cross_kv(xa) for blk in self.blocks]

    def __call__(self, tokens, pos0, caches, cross_kv):
        """tokens (B, t); pos0: starting position; caches: per-layer KVCache;
        cross_kv: list of (k, v). Returns (logits, new_caches)."""
        B, t = tokens.shape
        positions = pos0 + jnp.arange(t)
        x = self.token_embedding(tokens)
        x = x + self.positional_embedding[positions].astype(x.dtype)
        if caches is not None:
            mask = caches[0].attention_mask(t)
        elif t > 1:
            from ....ops.attention import make_causal_mask

            mask = make_causal_mask(t, t)
        else:
            mask = None
        new_caches = []
        for i, blk in enumerate(self.blocks):
            x, nc = blk(
                x, mask=mask,
                cache=caches[i] if caches is not None else None,
                cross_kv=cross_kv[i],
            )
            new_caches.append(nc)
        x = self.ln(x)
        return self.token_embedding.as_linear(x), new_caches

    def step_with_qk(self, tokens, pos0, caches, cross_kv):
        """Incremental decode step that also returns per-layer cross-attn
        scores for the new tokens (AlignAtt streaming, reference
        streaming.py:59-80)."""
        B, t = tokens.shape
        positions = pos0 + jnp.arange(t)
        x = self.token_embedding(tokens)
        x = x + self.positional_embedding[positions].astype(x.dtype)
        mask = caches[0].attention_mask(t) if caches is not None else None
        new_caches = []
        qks = []
        for i, blk in enumerate(self.blocks):
            a, nc = blk.attn(blk.attn_ln(x), mask=mask,
                             cache=caches[i] if caches is not None else None)
            x = x + a
            new_caches.append(nc)
            c, qk = blk.cross_attn.call_with_qk(blk.cross_attn_ln(x),
                                                cross_kv[i])
            qks.append(qk)
            x = x + blk.mlp2(jax.nn.gelu(blk.mlp1(blk.mlp_ln(x)),
                                         approximate=False))
        x = self.ln(x)
        return self.token_embedding.as_linear(x), new_caches, qks

    def forward_with_cross_qk(self, tokens, cross_kv):
        """Full-sequence decode capturing per-layer cross-attention scores
        (reference whisper.py forward_with_cross_qk / timing.py:114-185)."""
        from ....ops.attention import make_causal_mask

        B, t = tokens.shape
        x = self.token_embedding(tokens)
        x = x + self.positional_embedding[jnp.arange(t)].astype(x.dtype)
        mask = make_causal_mask(t, t) if t > 1 else None
        qks = []
        for i, blk in enumerate(self.blocks):
            a, _ = blk.attn(blk.attn_ln(x), mask=mask)
            x = x + a
            c, qk = blk.cross_attn.call_with_qk(blk.cross_attn_ln(x),
                                                cross_kv[i])
            qks.append(qk)
            x = x + blk.mlp2(jax.nn.gelu(blk.mlp1(blk.mlp_ln(x)),
                                         approximate=False))
        x = self.ln(x)
        return self.token_embedding.as_linear(x), qks


def _get_end(segments: List[dict]) -> Optional[float]:
    """Last word-level end time across segments, falling back to the last
    segment end (reference whisper.py:255-259)."""
    for s in reversed(segments):
        for w in reversed(s.get("words") or []):
            return w["end"]
    return segments[-1]["end"] if segments else None


# hallucination heuristics (reference whisper.py:1022-1046): anomalous words
# are very short/long or improbable; a segment whose first words are mostly
# anomalous is treated as hallucinated when surrounded by silence
_ANOMALY_PUNCTUATION = "\"'“¿([{-\"'.。,，!！?？:：”)]}、"


def _word_anomaly_score(word: dict) -> float:
    probability = word.get("probability", 0.0)
    duration = word["end"] - word["start"]
    score = 0.0
    if probability < 0.15:
        score += 1.0
    if duration < 0.133:
        score += (0.133 - duration) * 15
    if duration > 2.0:
        score += duration - 2.0
    return score


def _is_segment_anomaly(segment: Optional[dict]) -> bool:
    if segment is None or not segment.get("words"):
        return False
    words = [
        w for w in segment["words"] if w["word"] not in _ANOMALY_PUNCTUATION
    ][:8]
    score = sum(_word_anomaly_score(w) for w in words)
    return score >= 3 or score + 0.01 >= len(words)


def _next_words_segment(segments: List[dict]) -> Optional[dict]:
    return next((s for s in segments if s.get("words")), None)


def _hf_to_native(weights: dict) -> dict:
    """Map HF transformers whisper keys → native (openai/mlx) naming."""
    out = {}
    rules = [
        ("model.encoder.", "encoder."), ("model.decoder.", "decoder."),
        ("encoder.layers.", "encoder.blocks."), ("decoder.layers.", "decoder.blocks."),
        (".self_attn.q_proj.", ".attn.query."), (".self_attn.k_proj.", ".attn.key."),
        (".self_attn.v_proj.", ".attn.value."), (".self_attn.out_proj.", ".attn.out."),
        (".self_attn_layer_norm.", ".attn_ln."),
        (".encoder_attn.q_proj.", ".cross_attn.query."),
        (".encoder_attn.k_proj.", ".cross_attn.key."),
        (".encoder_attn.v_proj.", ".cross_attn.value."),
        (".encoder_attn.out_proj.", ".cross_attn.out."),
        (".encoder_attn_layer_norm.", ".cross_attn_ln."),
        (".fc1.", ".mlp1."), (".fc2.", ".mlp2."),
        (".final_layer_norm.", ".mlp_ln."),
        ("encoder.layer_norm.", "encoder.ln_post."),
        ("decoder.layer_norm.", "decoder.ln."),
        ("decoder.embed_tokens.", "decoder.token_embedding."),
        ("decoder.embed_positions.weight", "decoder.positional_embedding"),
    ]
    for k, v in weights.items():
        nk = k
        for old, new in rules:
            nk = nk.replace(old, new)
        out[nk] = v
    return out


class Model(Module):
    def __init__(self, dims: Union[ModelDimensions, dict], dtype=jnp.float32):
        heads = dims.pop("alignment_heads", None) if isinstance(dims, dict) \
            else None
        if isinstance(dims, dict):
            dims = ModelDimensions.from_dict(dims)
        self.dims = dims
        self.encoder = AudioEncoder(dims)
        self.decoder = TextDecoder(dims)
        if heads:
            # persisted by convert.py for OpenAI variants (reference
            # scripts/convert.py:197,263)
            self.set_alignment_heads(heads)

    # ---- loading ----

    def sanitize(self, weights: dict) -> dict:
        if any(k.startswith("model.") for k in weights):
            weights = _hf_to_native(weights)
        out = {}
        for k, v in weights.items():
            if k.startswith("encoder") and "token" not in k and (
                "positional_embedding" in k or "embed_positions" in k
            ):
                continue  # encoder sinusoids are recomputed
            if k.endswith("conv1.weight") or k.endswith("conv2.weight"):
                v = np.asarray(v)
                if v.ndim == 3 and v.shape[1] > v.shape[2]:
                    v = v.transpose(0, 2, 1)  # torch (O,I,K) -> (O,K,I)
            if k == "decoder.positional_embedding.weight":
                k = "decoder.positional_embedding"
            out[k] = v
        out.pop("proj_out.weight", None)
        return out

    # ---- word-alignment support ----

    def set_alignment_heads(self, heads) -> None:
        """heads: iterable of (layer, head) pairs used for DTW alignment."""
        self.alignment_heads_static = tuple(tuple(int(i) for i in h)
                                            for h in heads)

    @property
    def alignment_heads(self):
        """Configured heads, or the openai fallback: all heads of the top
        half of decoder layers."""
        heads = getattr(self, "alignment_heads_static", None)
        if heads:
            return heads
        d = self.dims
        return tuple((l, h) for l in range(d.n_text_layer // 2,
                                           d.n_text_layer)
                     for h in range(d.n_text_head))

    @staticmethod
    @jax.jit
    def _forward_cross_qk(model: "Model", mel: jax.Array, tokens: jax.Array):
        xa = model.encoder(mel)
        ckv = model.decoder.cross_kv(xa)
        return model.decoder.forward_with_cross_qk(tokens, ckv)

    def forward_with_cross_qk(self, mel, tokens):
        """mel (B, 3000, n_mels), tokens (B, T) → (logits, [qk per layer])."""
        return Model._forward_cross_qk(self, jnp.asarray(mel),
                                       jnp.asarray(tokens, jnp.int32))

    @staticmethod
    @jax.jit
    def _decoder_cross_qk_jit(model: "Model", cross_kv, tokens: jax.Array):
        return model.decoder.forward_with_cross_qk(tokens, cross_kv)

    def decoder_cross_qk(self, cross_kv, tokens):
        """Like forward_with_cross_qk but reusing already-computed encoder
        cross K/V (chunked mode: the batched encode already produced them,
        so DTW word timing skips the second encoder pass)."""
        return Model._decoder_cross_qk_jit(
            self, cross_kv, jnp.asarray(tokens, jnp.int32))

    # ---- public API parity (reference whisper.py:601-615) ----

    def embed_audio(self, mel):
        """mel (B, 3000, n_mels) → encoder features."""
        return Model._encode(self, jnp.asarray(mel))[0]

    def logits(self, tokens, audio_features):
        """Decoder logits over a token prefix given encoder features."""
        ckv = self.decoder.cross_kv(jnp.asarray(audio_features))
        return self.decoder.forward_with_cross_qk(
            jnp.asarray(tokens, jnp.int32), ckv)[0]

    @property
    def is_multilingual(self) -> bool:
        return self.dims.n_vocab >= 51865

    @property
    def num_languages(self) -> int:
        return self.dims.n_vocab - 51765 - int(self.is_multilingual)

    # ---- jitted pieces ----

    @staticmethod
    @jax.jit
    def _encode(model: "Model", mel: jax.Array):
        xa = model.encoder(mel)
        return xa, model.decoder.cross_kv(xa)

    def _make_caches(self, batch: int = 1, capacity: Optional[int] = None):
        """Decoder KV caches. `capacity` trims the self-attention window to
        what the decode will actually write (prompt + sample_len, bucketed
        by the caller) instead of the full n_text_ctx=448 — the per-step
        K/V read is proportional to capacity, and typical decodes use
        ~1/4 of the context."""
        d = self.dims
        cap = d.n_text_ctx if capacity is None else min(capacity, d.n_text_ctx)
        return [
            KVCache(batch, d.n_text_head, cap, d.n_text_state // d.n_text_head,
                    dtype=self.decoder.token_embedding.weight.dtype)
            for _ in range(d.n_text_layer)
        ]

    @staticmethod
    def _decoder_step(model: "Model", tokens, pos0, caches, cross_kv):
        return model.decoder(tokens, pos0, caches, cross_kv)

    # ---- language detection ----

    @staticmethod
    @partial(jax.jit, static_argnames=("n_mels",))
    def _mel_chunk(audio_chunk, n_mels: int):
        """Fixed-shape (N_SAMPLES,) chunk → (N_FRAMES, n_mels) log-mel.

        Computing per fixed-size chunk keeps compiles bounded regardless of
        audio length (whisper normalization needs a global max, so the
        log-clip is applied per chunk — matching the reference's per-window
        behavior closely enough at 1e-3 for non-silent audio)."""
        spec = A.log_mel_spectrogram(audio_chunk, n_mels=n_mels)
        return spec

    @staticmethod
    @partial(jax.jit, static_argnames=("n_mels",))
    def _mel_chunks_batched(chunks, n_mels: int):
        """(n, N_SAMPLES) stacked chunks → (n, N_FRAMES, n_mels) in ONE
        dispatch. Sequential per-chunk dispatch paid a ~100 ms tunnel round
        trip per 30 s chunk — measured 550-810 ms of a 1.3 s transcription
        of 120 s audio (the largest phase; see commit message).

        int16 input is dequantized on device: the host→device transfer is
        the dominant mel-phase cost (device compute is ~35 ms for 120 s),
        so audio ships as PCM16 — bit-exact for material that came from
        16-bit sources, which is what Whisper pipelines ingest anyway."""
        if chunks.dtype == jnp.int16:
            chunks = chunks.astype(jnp.float32) / 32768.0
        return jax.vmap(
            lambda c: A.log_mel_spectrogram(c, n_mels=n_mels))(chunks)

    # Row-count buckets at ~1.5× steps: padding waste ≤ 33% (vs ≤ 100%
    # for pure powers of two) while compile count stays O(log n).
    @staticmethod
    def _row_bucket(n: int) -> int:
        b = 1
        while b < n:
            b = b * 2 if b < 4 else (b * 3 + 1) // 2
        return b

    def _mel_chunks_device(self, audio: np.ndarray):
        """Stacked per-30s-chunk log-mel, kept ON DEVICE: (bucket, N_FRAMES,
        n_mels) with `n_chunks` valid rows. Row counts are bucketed so
        compiles stay bounded across audio lengths; audio transfers as
        int16 (half the bytes; set MLX_AUDIO_TPU_MEL_TRANSFER=f32 to ship
        float32 instead)."""
        total = len(audio) + A.N_SAMPLES
        n_chunks = (total + A.N_SAMPLES - 1) // A.N_SAMPLES
        bucket = self._row_bucket(n_chunks)
        if os.environ.get("MLX_AUDIO_TPU_MEL_TRANSFER", "int16") == "int16":
            padded = np.zeros(bucket * A.N_SAMPLES, np.int16)
            # same quantizer as audio_io's PCM16 writer: round-trips audio
            # that was loaded from a 16-bit source bit-exactly
            padded[: len(audio)] = np.clip(
                np.round(audio * 32768.0), -32768, 32767
            ).astype(np.int16)
        else:
            padded = np.zeros(bucket * A.N_SAMPLES, np.float32)
            padded[: len(audio)] = audio
        mel = self._mel_chunks_batched(
            jnp.asarray(padded.reshape(bucket, A.N_SAMPLES)),
            self.dims.n_mels,
        )
        return mel, n_chunks

    @staticmethod
    @jax.jit
    def _window_slice(mel_flat, seek, seg):
        """N_FRAMES window at frame `seek` from the on-device whole-audio
        mel, rows >= `seg` zeroed — identical to the host path's
        slice-then-zero-pad, without the mel ever leaving HBM (host mel
        was ~half the warm seek-loop wall; see docs/stt/whisper.md)."""
        w = jax.lax.dynamic_slice_in_dim(mel_flat, seek, A.N_FRAMES, 0)
        return w * (jnp.arange(A.N_FRAMES) < seg)[:, None].astype(w.dtype)

    @staticmethod
    @jax.jit
    def _lang_logits(model: "Model", cross_kv, tokens):
        return model.decoder(tokens, 0, None, cross_kv)[0]

    def detect_language(self, cross_kv, tokenizer) -> Tuple[str, dict]:
        logits = self._lang_logits(
            self, cross_kv, jnp.asarray([[tokenizer.sot]], jnp.int32)
        )
        logits = np.asarray(jax.device_get(logits))[0, -1]
        lang_tokens = list(tokenizer.all_language_tokens)
        lang_logits = logits[lang_tokens]
        probs = np.exp(lang_logits - lang_logits.max())
        probs = probs / probs.sum()
        best = int(np.argmax(probs))
        code = tokenizer.all_language_codes[best]
        return code, dict(zip(tokenizer.all_language_codes, probs.tolist()))

    # ---- transcription ----

    def _check_fp16_option(self, decode_options: dict) -> None:
        """Half precision on TPU means bf16 fixed at load time (weights
        dtype), not a per-call autocast like the reference's fp16 flag
        (decoding.py:520). If the caller's explicit fp16 request conflicts
        with the loaded dtype, say so instead of silently ignoring it."""
        if "fp16" not in decode_options:
            return
        import warnings

        param = self.decoder.token_embedding.weight
        half = param.dtype in (jnp.bfloat16, jnp.float16)
        if bool(decode_options["fp16"]) != half:
            warnings.warn(
                f"fp16={decode_options['fp16']} requested but model weights "
                f"are {param.dtype}; on TPU the compute precision is set at "
                f"load time (load dtype bf16 for half precision)."
            )

    def generate(
        self,
        audio,
        *,
        language: Optional[str] = None,
        task: str = "transcribe",
        temperature: Union[float, Sequence[float]] = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
        compression_ratio_threshold: float = 2.4,
        logprob_threshold: float = -1.0,
        no_speech_threshold: float = 0.6,
        condition_on_previous_text: bool = True,
        initial_prompt: Optional[str] = None,
        word_timestamps: bool = False,
        prepend_punctuations: str = "\"'“¿([{-",
        append_punctuations: str = "\"'.。,，!！?？:：”)]}、",
        clip_timestamps: Union[str, Sequence[float]] = "0",
        hallucination_silence_threshold: Optional[float] = None,
        verbose: Optional[bool] = None,
        without_timestamps: bool = False,
        stream: bool = False,
        chunk_duration: float = 1.0,
        tokenizer=None,
        on_segment=None,
        **decode_options,
    ):
        if stream:
            # AlignAtt low-latency streaming (reference whisper.py:852-855)
            return self.generate_streaming(
                audio, chunk_duration=chunk_duration, language=language,
                task=task, tokenizer=tokenizer)
        start_t = time.perf_counter()
        # the reference drops these two before validation (whisper.py:857-858)
        decode_options.pop("max_tokens", None)
        decode_options.pop("generation_stream", None)
        unknown = set(decode_options) - set(DecodingOptions.__dataclass_fields__)
        if unknown:
            # the reference TypeErrors via DecodingOptions(**kwargs); don't
            # silently swallow misspelled options
            raise TypeError(f"unknown decode options: {sorted(unknown)}")
        self._check_fp16_option(decode_options)
        if isinstance(audio, (str,)) or hasattr(audio, "__fspath__"):
            from ....utils import load_audio

            audio = load_audio(audio, sample_rate=A.SAMPLE_RATE)
        audio = np.asarray(audio, np.float32).reshape(-1)

        # whole-audio mel stays ON DEVICE; each seek window is one jitted
        # dynamic-slice (+ zero mask past the content edge), never a host
        # round trip — host mel measured ~half the warm seek-loop wall
        mel_dev, _ = self._mel_chunks_device(audio)
        mel_flat = mel_dev.reshape(-1, mel_dev.shape[-1])
        want_frames = (len(audio) + A.N_SAMPLES) // A.HOP_LENGTH
        content_frames = want_frames - A.N_FRAMES
        content_duration = content_frames * A.HOP_LENGTH / A.SAMPLE_RATE

        if tokenizer is None:
            from .tokenizer import WhisperTokenizer

            tokenizer = WhisperTokenizer(
                self.dims.model_path, multilingual=self.dims.n_vocab >= 51865,
                language=language or "en", task=task,
            )

        temps = (
            [temperature] if isinstance(temperature, (int, float)) else list(temperature)
        )

        seek = 0
        all_tokens: List[int] = []
        all_segments: List[dict] = []
        prompt_reset_since = 0
        detected_language = language
        if initial_prompt:
            all_tokens.extend(tokenizer.encode(" " + initial_prompt.strip()))

        time_precision = 0.02
        n_gen_tokens = 0
        last_speech_timestamp = 0.0

        # Under a running server a WhisperBatcher may be installed: route the
        # per-window encode+decode through it so concurrent requests' windows
        # fuse into one batched device program.
        from ....serving import get_infer_hook

        hook = get_infer_hook(self)

        # clip_timestamps → (start, end) frame ranges (reference
        # whisper.py:881-897): comma-separated seconds, odd count implies
        # end-of-audio, last end clamped to the content length
        if isinstance(clip_timestamps, str):
            clip_timestamps = [
                float(ts)
                for ts in (clip_timestamps.split(",") if clip_timestamps else [])
            ]
        seek_points = [round(ts * A.FRAMES_PER_SECOND) for ts in clip_timestamps]
        if not seek_points:
            seek_points.append(0)
        if len(seek_points) % 2 == 1:
            seek_points.append(content_frames)
        else:
            seek_points[-1] = min(content_frames, seek_points[-1])
        seek_clips = list(zip(seek_points[::2], seek_points[1::2]))
        seek = seek_clips[0][0]
        clip_idx = 0

        while clip_idx < len(seek_clips):
            clip_start, clip_end = seek_clips[clip_idx]
            seek = max(seek, clip_start)
            if seek >= clip_end:
                clip_idx += 1
                continue
            segment_size = min(A.N_FRAMES, content_frames - seek, clip_end - seek)
            window = self._window_slice(mel_flat, seek, segment_size)
            seg_duration = segment_size * A.HOP_LENGTH / A.SAMPLE_RATE
            time_offset = seek * A.HOP_LENGTH / A.SAMPLE_RATE
            window_end_time = (seek + A.N_FRAMES) * A.HOP_LENGTH / A.SAMPLE_RATE
            previous_seek = seek

            cross_kv = None
            if hook is None or detected_language is None:
                xa, cross_kv = self._encode(self, window[None])

            if detected_language is None:
                detected_language, _ = self.detect_language(cross_kv, tokenizer)
                tokenizer.language = detected_language
                if hasattr(tokenizer, "__dict__"):
                    tokenizer.__dict__.pop("sot_sequence", None)

            # prompt: previous context + sot sequence (bucketed length)
            prev = (
                all_tokens[prompt_reset_since:]
                if condition_on_previous_text
                else []
            )
            sot_seq = (
                tokenizer.sot_sequence_including_notimestamps
                if without_timestamps
                else tokenizer.sot_sequence
            )
            prompt = self._build_prompt(prev, sot_seq, tokenizer)

            result = None
            for t in temps:
                # reference decode_with_fallback (whisper.py:904-940): beam
                # options apply only at t=0, best_of only at t>0
                kw = {
                    k: v for k, v in decode_options.items()
                    if k in DecodingOptions.__dataclass_fields__
                }
                if t > 0:
                    kw.pop("beam_size", None)
                    kw.pop("patience", None)
                else:
                    kw.pop("best_of", None)
                opts = DecodingOptions(
                    task=task, language=detected_language, temperature=float(t),
                    without_timestamps=without_timestamps, **kw,
                )
                if hook is not None:
                    result = hook(window, prompt, opts, tokenizer)
                else:
                    result = decode_window(
                        self, cross_kv, tokenizer, prompt, opts,
                        n_ctx=self.dims.n_text_ctx, n_vocab=self.dims.n_vocab,
                        decoder_step=type(self)._decoder_step,
                        make_caches=self._make_caches,
                    )
                ok = True
                if (
                    compression_ratio_threshold is not None
                    and result.compression_ratio > compression_ratio_threshold
                ):
                    ok = False
                if (
                    logprob_threshold is not None
                    and result.avg_logprob < logprob_threshold
                ):
                    ok = False
                if ok:
                    break

            # no-speech skip
            if (
                no_speech_threshold is not None
                and result.no_speech_prob > no_speech_threshold
                and (logprob_threshold is None
                     or result.avg_logprob < logprob_threshold)
            ):
                seek += segment_size
                continue

            tokens = result.tokens
            n_gen_tokens += len(tokens) + 1

            # timestamp segmentation (host-side, as in reference :1050+)
            ts = tokenizer.timestamp_begin
            consecutive = [
                i + 1
                for i in range(len(tokens) - 1)
                if tokens[i] >= ts and tokens[i + 1] >= ts
            ]
            # a lone timestamp at the very end means "no speech after it":
            # keep the trailing segment and advance the full window
            # (reference whisper.py:1048-1090)
            single_timestamp_ending = (
                len(tokens) >= 2 and tokens[-2] < ts <= tokens[-1]
            )
            segments_here = []
            if consecutive:
                slices = list(consecutive)
                if single_timestamp_ending:
                    slices.append(len(tokens))
                last_slice = 0
                for cut in slices:
                    seg = tokens[last_slice:cut]
                    start_ts = (seg[0] - ts) * time_precision
                    end_ts = (seg[-1] - ts) * time_precision
                    segments_here.append(
                        self._segment(
                            time_offset + start_ts, time_offset + end_ts, seg,
                            tokenizer, result,
                        )
                    )
                    last_slice = cut
                if single_timestamp_ending:
                    seek += segment_size
                else:
                    last_ts_tok = tokens[last_slice - 1] - ts
                    seek += max(
                        1, round(last_ts_tok * time_precision * A.FRAMES_PER_SECOND)
                    )
            else:
                ts_tokens = [t for t in tokens if t >= ts]
                end_ts = seg_duration
                if ts_tokens and ts_tokens[-1] != ts:
                    end_ts = (ts_tokens[-1] - ts) * time_precision
                segments_here.append(
                    self._segment(
                        time_offset, time_offset + end_ts, tokens, tokenizer, result
                    )
                )
                seek += segment_size

            if word_timestamps:
                from .timing import add_word_timestamps

                for s in segments_here:
                    s["seek"] = previous_seek
                add_word_timestamps(
                    segments=segments_here, model=self, tokenizer=tokenizer,
                    mel=window, num_frames=segment_size,
                    prepend_punctuations=prepend_punctuations,
                    append_punctuations=append_punctuations,
                    last_speech_timestamp=last_speech_timestamp,
                )
                # the decoder's final timestamp may overshoot the last word:
                # re-seek to the last attested word end (reference :1127-1135)
                if not single_timestamp_ending:
                    last_word_end = _get_end(segments_here)
                    if last_word_end is not None and last_word_end > time_offset:
                        seek = round(last_word_end * A.FRAMES_PER_SECOND)

                # skip silence around likely hallucinations (reference
                # whisper.py:1137-1203): a window whose words are anomalously
                # short/long/improbable, surrounded by silence, is dropped and
                # the seek pointer jumps over the silent span instead
                if hallucination_silence_threshold is not None:
                    threshold = hallucination_silence_threshold
                    if not single_timestamp_ending:
                        last_word_end = _get_end(segments_here)
                        if (
                            last_word_end is not None
                            and last_word_end > time_offset
                        ):
                            remaining = window_end_time - last_word_end
                            if remaining > threshold:
                                seek = round(last_word_end * A.FRAMES_PER_SECOND)
                            else:
                                seek = previous_seek + segment_size

                    # leading hallucination: re-decode from past the gap
                    first_segment = _next_words_segment(segments_here)
                    if first_segment is not None and _is_segment_anomaly(
                        first_segment
                    ):
                        gap = first_segment["start"] - time_offset
                        if gap > threshold:
                            seek = previous_seek + round(gap * A.FRAMES_PER_SECOND)
                            continue

                    # hallucination surrounded by silence (or more of them)
                    hal_last_end = last_speech_timestamp
                    for si, segment in enumerate(segments_here):
                        if not segment.get("words"):
                            continue
                        if _is_segment_anomaly(segment):
                            next_segment = _next_words_segment(
                                segments_here[si + 1:]
                            )
                            if next_segment is not None:
                                hal_next_start = next_segment["words"][0]["start"]
                            else:
                                hal_next_start = time_offset + seg_duration
                            silence_before = (
                                segment["start"] - hal_last_end > threshold
                                or segment["start"] < threshold
                                or segment["start"] - time_offset < 2.0
                            )
                            silence_after = (
                                hal_next_start - segment["end"] > threshold
                                or _is_segment_anomaly(next_segment)
                                or window_end_time - segment["end"] < 2.0
                            )
                            if silence_before and silence_after:
                                seek = round(
                                    max(time_offset + 1, segment["start"])
                                    * A.FRAMES_PER_SECOND
                                )
                                if content_duration - segment["end"] < threshold:
                                    seek = content_frames
                                segments_here[si:] = []
                                break
                        hal_last_end = segment["end"]

                last_word_end = _get_end(segments_here)
                if last_word_end is not None:
                    last_speech_timestamp = last_word_end

            # instantaneous or text-free segments carry no content: blank
            # them instead of emitting phantom entries (reference :1218-1227)
            for s in segments_here:
                if s["start"] == s["end"] or not s["text"].strip():
                    s["text"] = ""
                    s["tokens"] = []
                    s["words"] = []

            for s in segments_here:
                s["id"] = len(all_segments)
                all_segments.append(s)
                all_tokens.extend(s["tokens"])
                if on_segment is not None:
                    on_segment(s)
            if not condition_on_previous_text or result.temperature > 0.5:
                prompt_reset_since = len(all_tokens)

            if verbose:
                for s in segments_here:
                    print(f"[{s['start']:.2f} → {s['end']:.2f}] {s['text']}")

        wall = time.perf_counter() - start_t
        text = "".join(s["text"] for s in all_segments).strip()
        return STTOutput(
            text=text,
            segments=all_segments,
            language=detected_language,
            generation_tokens=n_gen_tokens,
            generation_tps=n_gen_tokens / max(wall, 1e-9),
            total_tps=n_gen_tokens / max(wall, 1e-9),
            duration=content_duration,
            extra={"wall_seconds": wall, "xrt": content_duration / max(wall, 1e-9)},
        )

    def make_batcher(self, **kwargs):
        """Serving batcher: fuses concurrent requests' windows per dispatch."""
        from ....serving import WhisperBatcher

        return WhisperBatcher(self, **kwargs)

    def generate_chunked(
        self,
        audio,
        *,
        language: Optional[str] = None,
        task: str = "transcribe",
        temperature: Union[float, Sequence[float]] = 0.0,
        compression_ratio_threshold: Optional[float] = 2.4,
        logprob_threshold: Optional[float] = -1.0,
        no_speech_threshold: Optional[float] = 0.6,
        condition_on_previous_text: bool = False,
        initial_prompt: Optional[str] = None,
        without_timestamps: bool = False,
        word_timestamps: bool = False,
        prepend_punctuations: str = "\"'“¿([{-",
        append_punctuations: str = "\"'.。,，!！?？:：”)]}、",
        tokenizer=None,
        max_batch: int = 8,
        max_sweeps: int = 4,
        strict_conditioning: bool = True,
        **decode_options,
    ) -> STTOutput:
        """Batch-parallel long-form transcription (TPU-first fast path).

        The sequential seek loop (generate) conditions each window on the
        previous text; with that OFF, 30 s windows are independent — so this
        mode encodes ALL windows as one batch and decodes them in ONE
        batched while_loop program (HF-style chunked long-form). The vocab
        projection and per-step loop overhead amortize across windows:
        several times faster than the seek loop on long audio.

        Pass a temperature SEQUENCE to enable the reference's quality
        fallback (whisper.py:904-940) batched: the whole group re-decodes
        at the next temperature while each window keeps its first result
        that passes the compression-ratio / logprob thresholds — one extra
        batched dispatch per needed temperature, same executable reused.
        Windows whose no_speech_prob exceeds `no_speech_threshold` (with a
        failing logprob) emit no segment, like the seek loop's silence
        skip.

        ``condition_on_previous_text=True`` keeps the seek loop's rolling
        previous-text conditioning (reference whisper.py:898-903 prompt +
        :1232-1233 high-temperature reset) WITHOUT giving up batching: the
        windows are decoded as a parallel fixpoint. Sweep 1 decodes every
        window unconditioned; each later sweep rebuilds every window's
        prompt from the current estimates of the earlier windows' text and
        re-decodes ONLY the windows whose prompt changed, as one batch.
        Window k's prompt depends only on windows < k, so the stable
        prefix grows monotonically and the iteration reaches the exact
        sequential-induction result; in the common case where
        conditioning doesn't flip any window's text it converges after 2
        sweeps (~2× the unconditioned cost instead of the sequential seek
        loop's per-window dispatches). After ``max_sweeps`` sweeps any
        still-unstable tail is finished sequentially (exact), bounding the
        worst case."""
        start_t = time.perf_counter()
        unknown = set(decode_options) - set(DecodingOptions.__dataclass_fields__)
        if unknown:
            raise TypeError(f"unknown decode options: {sorted(unknown)}")
        self._check_fp16_option(decode_options)
        if isinstance(audio, (str,)) or hasattr(audio, "__fspath__"):
            from ....utils import load_audio

            audio = load_audio(audio, sample_rate=A.SAMPLE_RATE)
        audio = np.asarray(audio, np.float32).reshape(-1)

        # Mel stays ON DEVICE: the 30 s seek windows at N_FRAMES stride are
        # exactly the per-chunk mels, so chunked mode never round-trips the
        # spectrogram through the host (measured: the host fetch was the
        # largest phase of chunked transcription).
        mel_dev, _ = self._mel_chunks_device(audio)
        n_audio_frames = (len(audio) + A.N_SAMPLES) // A.HOP_LENGTH
        content_frames = n_audio_frames - A.N_FRAMES
        content_duration = content_frames * A.HOP_LENGTH / A.SAMPLE_RATE

        if tokenizer is None:
            from .tokenizer import WhisperTokenizer

            tokenizer = WhisperTokenizer(
                self.dims.model_path, multilingual=self.dims.n_vocab >= 51865,
                language=language or "en", task=task,
            )

        # windows at fixed 30 s stride == mel chunk rows
        starts = list(range(0, max(content_frames, 1), A.N_FRAMES))
        n_windows = len(starts)

        if language is None:
            xa, ckv = self._encode(self, mel_dev[:1])
            language, _ = self.detect_language(ckv, tokenizer)
            tokenizer.language = language
            if hasattr(tokenizer, "__dict__"):
                tokenizer.__dict__.pop("sot_sequence", None)

        sot_seq = list(
            tokenizer.sot_sequence_including_notimestamps
            if without_timestamps
            else tokenizer.sot_sequence
        )
        # initial_prompt biases every window (reference whisper.py:1009-1013;
        # windows are independent here, so the prompt prefixes each row —
        # there is no rolling previous-text context in chunked mode)
        prompt_row = sot_seq
        if initial_prompt:
            prompt_row = self._build_prompt(
                tokenizer.encode(" " + initial_prompt.strip()),
                sot_seq, tokenizer,
            )
        from .decoding import decode_window_batch

        temps = (
            [temperature] if isinstance(temperature, (int, float))
            else list(temperature)
        )

        def group_opts(t: float) -> DecodingOptions:
            kw = {
                k: v for k, v in decode_options.items()
                if k in DecodingOptions.__dataclass_fields__
            }
            # reference decode_with_fallback: beam options apply only at
            # t=0, best_of only at t>0
            if t > 0:
                kw.pop("beam_size", None)
                kw.pop("patience", None)
            else:
                kw.pop("best_of", None)
            return DecodingOptions(
                task=task, language=language, temperature=float(t),
                without_timestamps=without_timestamps, **kw,
            )

        def result_ok(res) -> bool:
            if (compression_ratio_threshold is not None
                    and res.compression_ratio > compression_ratio_threshold):
                return False
            if (logprob_threshold is not None
                    and res.avg_logprob < logprob_threshold):
                return False
            return True

        all_segments: List[dict] = []
        n_gen = 0
        time_precision = 0.02
        n_sweeps = 0  # batched conditioning sweeps
        n_tail = 0  # windows re-decoded by the strict sequential finish

        def is_silent(res) -> bool:
            # no-speech skip (reference whisper.py:942-949): silence
            # windows emit no segment (and contribute no rolling context)
            return (
                no_speech_threshold is not None
                and res.no_speech_prob > no_speech_threshold
                and (logprob_threshold is None
                     or res.avg_logprob < logprob_threshold)
            )

        def decode_idxs(idxs, rows):
            """Encode + temperature-fallback decode of the given window
            indices in one batched program; rows must share a length.
            Contiguous index runs use dynamic_slice (no index transfer —
            every eager op is a tunnel round trip); the fixpoint's sparse
            re-decode sets gather."""
            if list(idxs) == list(range(idxs[0], idxs[0] + len(idxs))):
                group = jax.lax.dynamic_slice_in_dim(
                    mel_dev, idxs[0], len(idxs), 0)
            else:
                group = mel_dev[jnp.asarray(np.asarray(idxs, np.int32))]
            _xa, cross_kv = self._encode(self, group)
            got: List = [None] * len(idxs)
            for t in temps:
                batch = decode_window_batch(
                    self, cross_kv, tokenizer, rows, group_opts(t),
                    n_ctx=self.dims.n_text_ctx, n_vocab=self.dims.n_vocab,
                    decoder_step=type(self)._decoder_step,
                    make_caches=self._make_caches,
                )
                for j, res in enumerate(batch):
                    if got[j] is None and (result_ok(res) or t == temps[-1]):
                        got[j] = res
                if all(r is not None for r in got):
                    break
            return got, cross_kv

        def assemble(seek, res, win_kv) -> None:
            """Silence skip + segment build for one window (shared by the
            unconditioned group loop and the conditioned fixpoint)."""
            nonlocal n_gen
            if is_silent(res):
                return
            time_offset = seek * A.HOP_LENGTH / A.SAMPLE_RATE
            seg_duration = min(
                (content_frames - seek) * A.HOP_LENGTH / A.SAMPLE_RATE,
                30.0,
            )
            tokens = res.tokens
            n_gen += len(tokens) + 1
            ts = tokenizer.timestamp_begin
            ts_tokens = [t for t in tokens if t >= ts]
            end_ts = seg_duration
            if ts_tokens and ts_tokens[-1] != ts:
                end_ts = min(
                    (ts_tokens[-1] - ts) * time_precision, seg_duration
                )
            seg = self._segment(
                time_offset, time_offset + end_ts, tokens, tokenizer, res
            )
            seg["id"] = len(all_segments)
            seg["seek"] = seek
            if win_kv is not None:
                # DTW over this window's cross-attention, reusing the
                # batched encode's cross K/V (no second encoder pass)
                from .timing import add_word_timestamps

                seg_frames = min(content_frames - seek, A.N_FRAMES)
                add_word_timestamps(
                    segments=[seg], model=self, tokenizer=tokenizer,
                    mel=None, num_frames=seg_frames,
                    prepend_punctuations=prepend_punctuations,
                    append_punctuations=append_punctuations,
                    cross_kv=win_kv,
                )
            all_segments.append(seg)

        if condition_on_previous_text:
            # Parallel fixpoint over the window chain (see docstring).
            init_tokens = (
                tokenizer.encode(" " + initial_prompt.strip())
                if initial_prompt else []
            )

            def desired_row(k, cur) -> List[int]:
                """Prompt row window k would receive in the sequential
                seek loop, given current estimates `cur` of the earlier
                windows' results (reference whisper.py:898-903)."""
                toks = list(init_tokens)
                for j in range(k):
                    r = cur[j]
                    if r is None or is_silent(r):
                        continue
                    toks.extend(r.tokens)
                    if r.temperature > 0.5:
                        # high-temperature fallback resets the rolling
                        # context (reference whisper.py:1232-1233)
                        toks = []
                return (self._build_prompt(toks, sot_seq, tokenizer)
                        if toks else list(sot_seq))

            results: List = [None] * n_windows
            used: List = [None] * n_windows
            while True:
                desired = [desired_row(k, results) for k in range(n_windows)]
                todo = [k for k in range(n_windows) if used[k] != desired[k]]
                if not todo:
                    break
                if n_sweeps >= max_sweeps and not strict_conditioning:
                    # Approximation mode: accept the last sweep's results
                    # (each window conditioned on near-final estimates).
                    # Real checkpoints typically converge in 2 sweeps, so
                    # this only changes output on inputs whose text keeps
                    # flipping — there the "right" transcript is unstable
                    # under the seek loop too.
                    break
                if n_sweeps >= max_sweeps:
                    # Exact sequential finish for a still-unstable tail:
                    # each window gets its final-chain prompt in order, so
                    # this terminates with seek-loop-exact conditioning.
                    # Counted as tail windows, not sweeps — the reported
                    # "sweeps" metric covers batched sweeps only.
                    n_tail += len(todo)
                    for k in todo:
                        row = desired_row(k, results)
                        got, _ = decode_idxs([k], [row])
                        results[k], used[k] = got[0], row
                    continue
                n_sweeps += 1
                # Window k's prompt depends only on windows < k, so the
                # stable prefix grows every sweep — ≤ n_windows sweeps.
                by_len: dict = {}
                for k in todo:
                    by_len.setdefault(len(desired[k]), []).append(k)
                for _L, idxs in sorted(by_len.items()):
                    for g0 in range(0, len(idxs), max_batch):
                        sub = idxs[g0:g0 + max_batch]
                        # pad to a power-of-two bucket so later sweeps
                        # reuse the compiled batch sizes (clamped to
                        # max_batch — the HBM-bounding cap need not be a
                        # power of two)
                        bucket = 1
                        while bucket < len(sub):
                            bucket *= 2
                        bucket = min(bucket, max_batch)
                        psub = sub + [sub[-1]] * (bucket - len(sub))
                        got, _ = decode_idxs(
                            psub, [desired[k] for k in psub])
                        for k, r in zip(sub, got[:len(sub)]):
                            results[k], used[k] = r, desired[k]

            for i0 in range(0, n_windows, max_batch):
                idxs = list(range(i0, min(i0 + max_batch, n_windows)))
                win_kvs = [None] * len(idxs)
                if word_timestamps:
                    # one extra encoder pass per group for the DTW K/V
                    group = mel_dev[jnp.asarray(np.asarray(idxs, np.int32))]
                    _xa, ckv = self._encode(self, group)
                    win_kvs = [
                        jax.tree.map(lambda x, j=j: x[j:j + 1], ckv)
                        for j in range(len(idxs))
                    ]
                for j, k in enumerate(idxs):
                    assemble(starts[k], results[k], win_kvs[j])
        else:
            for i0 in range(0, n_windows, max_batch):
                idxs = list(range(i0, min(i0 + max_batch, n_windows)))
                got, cross_kv = decode_idxs(
                    idxs, [prompt_row] * len(idxs))
                for j, k in enumerate(idxs):
                    win_kv = (
                        jax.tree.map(lambda x, j=j: x[j:j + 1], cross_kv)
                        if word_timestamps else None
                    )
                    assemble(starts[k], got[j], win_kv)

        wall = time.perf_counter() - start_t
        text = "".join(s["text"] for s in all_segments).strip()
        return STTOutput(
            text=text,
            segments=all_segments,
            language=language,
            generation_tokens=n_gen,
            generation_tps=n_gen / max(wall, 1e-9),
            total_tps=n_gen / max(wall, 1e-9),
            duration=content_duration,
            extra={"wall_seconds": wall,
                   "xrt": content_duration / max(wall, 1e-9),
                   "mode": ("chunked+conditioned"
                            if condition_on_previous_text else "chunked"),
                   **({"sweeps": n_sweeps, "tail_windows": n_tail}
                      if condition_on_previous_text else {})},
        )

    def get_tokenizer(self, language: str = "en", task: str = "transcribe"):
        from .tokenizer import WhisperTokenizer

        return WhisperTokenizer(
            self.dims.model_path, multilingual=self.dims.n_vocab >= 51865,
            language=language, task=task,
        )

    def generate_streaming(
        self,
        audio,
        *,
        chunk_duration: float = 1.0,
        language: Optional[str] = None,
        task: str = "transcribe",
        frame_threshold: int = 25,
        tokenizer=None,
    ):
        """Streaming transcription with AlignAtt (~chunk_duration latency
        instead of 30 s windows). Yields StreamingResult per chunk
        (reference whisper.py:1270-1346)."""
        from .streaming import StreamingConfig, StreamingDecoder

        if isinstance(audio, (str,)) or hasattr(audio, "__fspath__"):
            from ....utils import load_audio

            audio = load_audio(audio, sample_rate=A.SAMPLE_RATE)
        audio = np.asarray(audio, np.float32).reshape(-1)

        if language is None and tokenizer is None:
            probe_tok = self.get_tokenizer("en", task)
            first = np.zeros(A.N_SAMPLES, np.float32)
            n0 = min(len(audio), A.N_SAMPLES)
            first[:n0] = audio[:n0]
            mel = self._mel_chunk(jnp.asarray(first), self.dims.n_mels)
            _, cross_kv = self._encode(self, mel[None])
            language, _ = self.detect_language(cross_kv, probe_tok)
        language = language or "en"

        decoder = StreamingDecoder(
            self, StreamingConfig(frame_threshold=frame_threshold),
            language=language, task=task, tokenizer=tokenizer,
        )
        chunk_samples = int(chunk_duration * A.SAMPLE_RATE)
        total = len(audio)
        duration = total / A.SAMPLE_RATE
        for start in range(0, total, chunk_samples):
            end = min(start + chunk_samples, total)
            chunk = np.zeros(chunk_samples, np.float32)
            chunk[: end - start] = audio[start:end]
            mel = np.asarray(
                self._mel_chunk(jnp.asarray(chunk), self.dims.n_mels)
            )[: (end - start) // A.HOP_LENGTH]
            is_last = end >= total
            result = decoder.decode_chunk(mel, is_last=is_last)
            result.progress = end / total
            result.audio_position = end / A.SAMPLE_RATE
            result.audio_duration = duration
            result.language = language
            if result.text.strip() or is_last:
                yield result
            if is_last:
                break

    PROMPT_BUCKETS = (8, 16, 32, 64, 128, 227)

    def _build_prompt(self, prev_tokens, sot_seq, tokenizer):
        """Previous-context prompt with bucketed length (left-trim + left-pad
        with sot_prev so positions stay exact yet compiles stay bounded)."""
        sot_seq = list(sot_seq)
        if not prev_tokens:
            return sot_seq
        max_prev = self.dims.n_text_ctx // 2 - 1 - len(sot_seq) - 1
        prev = list(prev_tokens)[-max_prev:]
        total = 1 + len(prev) + len(sot_seq)
        bucket = next((b for b in self.PROMPT_BUCKETS if total <= b), total)
        pad = bucket - total
        return (
            [tokenizer.sot_prev] * (1 + pad) + prev + sot_seq
        )

    @staticmethod
    def _segment(start, end, tokens, tokenizer, result: DecodingResult) -> dict:
        text_tokens = [t for t in tokens if t < tokenizer.timestamp_begin]
        return {
            "seek": 0,
            "start": float(start),
            "end": float(end),
            "text": tokenizer.decode(text_tokens),
            "tokens": list(tokens),
            "temperature": result.temperature,
            "avg_logprob": result.avg_logprob,
            "compression_ratio": result.compression_ratio,
            "no_speech_prob": result.no_speech_prob,
        }

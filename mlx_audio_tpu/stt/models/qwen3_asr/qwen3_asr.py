"""Qwen3-ASR: windowed conv/transformer audio encoder + Qwen3 decoder.

TPU-native re-implementation of the reference
mlx_audio/stt/models/qwen3_asr/qwen3_asr.py:133-1390. The audio encoder's
ragged chunking and block-attention layout are computed on the host (audio
length is host-known) and the encoder runs as one jitted call per
chunk-count bucket; the text decode reuses the shared on-device
`lax.while_loop` decode (lm/generate).
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....lm.cache import KVCache
from ....lm.sample import make_sampler
from ....lm.transformer import CausalLM, LMConfig
from ....nn import layers as nn
from ....nn.module import Module
from ..base import STTOutput, ensure_waveform
from ..whisper import audio as A

__all__ = ["Model", "ModelConfig", "AudioEncoderConfig", "TextConfig",
           "AudioEncoder", "StreamingResult", "split_audio_into_chunks"]


@dataclass
class StreamingResult:
    """Streaming transcription emission (reference qwen3_asr.py:19-39)."""

    text: str
    is_final: bool
    start_time: float
    end_time: float
    language: str = "en"
    prompt_tokens: int = 0
    generation_tokens: int = 0


def split_audio_into_chunks(wav: np.ndarray, sr: int,
                            chunk_duration: float = 1200.0,
                            min_chunk_duration: float = 1.0,
                            search_expand_sec: float = 5.0,
                            min_window_ms: float = 100.0):
    """Split long audio at low-energy boundaries near each cut point.

    Returns [(chunk, offset_seconds)] (reference qwen3_asr.py:42-130).
    """
    wav = np.asarray(wav, np.float32)
    if wav.ndim > 1:
        wav = wav.mean(axis=-1) if wav.shape[-1] <= 2 else wav.mean(axis=0)
    total = len(wav)
    min_samples = int(min_chunk_duration * sr)
    if total <= chunk_duration * sr:
        if total < min_samples:
            wav = np.pad(wav, (0, min_samples - total))
        return [(wav, 0.0)]

    chunks = []
    start = 0
    max_chunk = int(chunk_duration * sr)
    search = int(search_expand_sec * sr)
    win = int(min_window_ms * sr / 1000)
    while start < total:
        end = min(start + max_chunk, total)
        if end >= total:
            chunk = wav[start:total]
            if len(chunk) < min_samples:
                chunk = np.pad(chunk, (0, min_samples - len(chunk)))
            chunks.append((chunk, start / sr))
            break
        # move the cut to the lowest-energy point in a window around it
        s0, s1 = max(start, end - search), min(total, end + search)
        region = wav[s0:s1]
        if len(region) > win:
            energy = np.convolve(region ** 2, np.ones(win) / win, mode="valid")
            cut = s0 + int(np.argmin(energy)) + win // 2
        else:
            cut = end
        cut = max(cut, start + sr)  # always advance >= 1 s
        chunk = wav[start:cut]
        if len(chunk) < min_samples:
            chunk = np.pad(chunk, (0, min_samples - len(chunk)))
        chunks.append((chunk, start / sr))
        start = cut
    return chunks


@dataclass
class AudioEncoderConfig:
    num_mel_bins: int = 128
    encoder_layers: int = 24
    encoder_attention_heads: int = 16
    encoder_ffn_dim: int = 4096
    d_model: int = 1024
    max_source_positions: int = 1500
    n_window: int = 50
    output_dim: int = 2048
    n_window_infer: int = 800
    conv_chunksize: int = 500
    downsample_hidden_size: int = 480

    @classmethod
    def from_dict(cls, d: dict) -> "AudioEncoderConfig":
        return cls(**{k: v for k, v in d.items()
                      if k in cls.__dataclass_fields__})


@dataclass
class TextConfig:
    model_type: str = "qwen3"
    vocab_size: int = 151936
    hidden_size: int = 2048
    intermediate_size: int = 6144
    num_hidden_layers: int = 28
    num_attention_heads: int = 16
    num_key_value_heads: int = 8
    head_dim: int = 128
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1000000.0
    tie_word_embeddings: bool = True

    @classmethod
    def from_dict(cls, d: dict) -> "TextConfig":
        return cls(**{k: v for k, v in d.items()
                      if k in cls.__dataclass_fields__})


@dataclass
class ModelConfig:
    audio_config: Any = None
    text_config: Any = None
    model_type: str = "qwen3_asr"
    audio_token_id: int = 151676
    audio_start_token_id: int = 151669
    audio_end_token_id: int = 151670
    support_languages: List[str] = field(default_factory=list)
    model_path: Optional[str] = None

    def __post_init__(self):
        if self.audio_config is None:
            self.audio_config = AudioEncoderConfig()
        elif isinstance(self.audio_config, dict):
            self.audio_config = AudioEncoderConfig.from_dict(self.audio_config)
        if self.text_config is None:
            self.text_config = TextConfig()
        elif isinstance(self.text_config, dict):
            self.text_config = TextConfig.from_dict(self.text_config)

    @classmethod
    def from_dict(cls, d: dict) -> "ModelConfig":
        d = dict(d)
        if "thinker_config" in d:
            thinker = d.pop("thinker_config")
            for k in ("audio_config", "text_config", "audio_token_id",
                      "audio_start_token_id", "audio_end_token_id"):
                if k in thinker:
                    d[k] = thinker[k]
        return cls(**{k: v for k, v in d.items()
                      if k in cls.__dataclass_fields__})


def _conv_out_len(n: int) -> int:
    """Three stride-2 convs with padding 1 (reference qwen3_asr.py:146-155)."""
    for _ in range(3):
        n = (n + 1) // 2
    return n


class _SinPos(Module):
    def __init__(self, length: int, channels: int):
        half = channels // 2
        scale = np.log(10000.0) / (half - 1)
        inv = np.exp(-scale * np.arange(half))
        pos = np.arange(length)[:, None] * inv[None, :]
        self._pe = jnp.asarray(
            np.concatenate([np.sin(pos), np.cos(pos)], axis=1), jnp.float32)

    def __call__(self, n: int):
        return self._pe[:n]


class AudioEncoderLayer(Module):
    def __init__(self, cfg: AudioEncoderConfig):
        d = cfg.d_model
        h = cfg.encoder_attention_heads
        self.self_attn_q = nn.Linear(d, d)
        # k_proj HAS a bias here, unlike Whisper (reference qwen3_asr.py:197)
        self.self_attn_k = nn.Linear(d, d)
        self.self_attn_v = nn.Linear(d, d)
        self.self_attn_o = nn.Linear(d, d)
        self.self_attn_layer_norm = nn.LayerNorm(d)
        self.fc1 = nn.Linear(d, cfg.encoder_ffn_dim)
        self.fc2 = nn.Linear(cfg.encoder_ffn_dim, d)
        self.final_layer_norm = nn.LayerNorm(d)
        self.n_head = h

    def __call__(self, x, mask):
        B, T, D = x.shape
        h = self.self_attn_layer_norm(x)
        q = self.self_attn_q(h).reshape(B, T, self.n_head, -1)
        k = self.self_attn_k(h).reshape(B, T, self.n_head, -1)
        v = self.self_attn_v(h).reshape(B, T, self.n_head, -1)
        q, k, v = (a.transpose(0, 2, 1, 3) for a in (q, k, v))
        scores = q @ k.transpose(0, 1, 3, 2) * (q.shape[-1] ** -0.5) + mask
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        o = (attn @ v).transpose(0, 2, 1, 3).reshape(B, T, D)
        x = x + self.self_attn_o(o)
        x = x + self.fc2(jax.nn.gelu(self.fc1(self.final_layer_norm(x))))
        return x


class AudioEncoder(Module):
    """reference qwen3_asr.py:263-440."""

    def __init__(self, cfg: AudioEncoderConfig):
        self.cfg = cfg
        ds = cfg.downsample_hidden_size
        self.conv2d1 = nn.Conv2d(1, ds, 3, stride=2, padding=1)
        self.conv2d2 = nn.Conv2d(ds, ds, 3, stride=2, padding=1)
        self.conv2d3 = nn.Conv2d(ds, ds, 3, stride=2, padding=1)
        freq_after = _conv_out_len(cfg.num_mel_bins)
        self.conv_out = nn.Linear(ds * freq_after, cfg.d_model, bias=False)
        self.positional_embedding = _SinPos(cfg.max_source_positions,
                                            cfg.d_model)
        self.layers = [AudioEncoderLayer(cfg)
                       for _ in range(cfg.encoder_layers)]
        self.ln_post = nn.LayerNorm(cfg.d_model)
        self.proj1 = nn.Linear(cfg.d_model, cfg.d_model)
        self.proj2 = nn.Linear(cfg.d_model, cfg.output_dim)

    def _frontend(self, chunks):
        """chunks: (N, mel, T) → (N, T', d_model)."""
        x = chunks[:, :, :, None]  # NHWC with H=mel, W=T
        x = jax.nn.gelu(self.conv2d1(x))
        x = jax.nn.gelu(self.conv2d2(x))
        x = jax.nn.gelu(self.conv2d3(x))
        N, f, t, c = x.shape
        x = x.transpose(0, 2, 3, 1).reshape(N, t, c * f)
        x = self.conv_out(x)
        return x + self.positional_embedding(x.shape[1])[None]

    def __call__(self, input_features: jnp.ndarray,
                 feature_len: Optional[int] = None) -> jnp.ndarray:
        """(1, mel, T) mel features → (Na, output_dim) audio embeddings."""
        mel = np.asarray(input_features)
        T = feature_len if feature_len is not None else mel.shape[-1]
        cfg = self.cfg
        chunk = cfg.n_window * 2

        # host-side ragged chunking (lengths are host-known)
        starts = list(range(0, T, chunk))
        lens = [min(chunk, T - s) for s in starts]
        padded = np.zeros((len(starts), mel.shape[1], chunk), np.float32)
        for i, (s, L) in enumerate(zip(starts, lens)):
            padded[i, :, :L] = mel[0, :, s: s + L]

        x = self._frontend(jnp.asarray(padded))  # (N, t, D)
        t_lens = [_conv_out_len(L) for L in lens]
        max_t = x.shape[1]

        # flatten valid frames across chunks
        hidden = jnp.concatenate(
            [x[i, : t_lens[i]] for i in range(len(t_lens))], axis=0)

        # block attention over inference windows
        total = int(sum(t_lens))
        window_after = max_t * (cfg.n_window_infer // (cfg.n_window * 2))
        bounds = [0]
        rem = total
        while rem > 0:
            step = min(window_after, rem)
            bounds.append(bounds[-1] + step)
            rem -= step
        mask = np.full((total, total), -1e9, np.float32)
        for a, b in zip(bounds[:-1], bounds[1:]):
            mask[a:b, a:b] = 0.0
        mask = jnp.asarray(mask)[None, None]

        h = hidden[None]
        for layer in self.layers:
            h = layer(h, mask)
        h = self.ln_post(h[0])
        return self.proj2(jax.nn.gelu(self.proj1(h)))


def _lm_call(model, x, caches):
    if x.dtype in (jnp.int32, jnp.int64):
        return model(x, caches)
    h, caches = model.model(x, caches)
    logits = (model.lm_head(h) if hasattr(model, "lm_head")
              else model.model.embed_tokens.as_linear(h))
    return logits, caches


class Model(Module):
    """reference qwen3_asr.py:605-1390."""

    _RUNTIME: dict = {}

    def __init__(self, config: Any = None):
        if isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        self.config = config or ModelConfig()
        self.audio_tower = AudioEncoder(self.config.audio_config)
        lm_cfg = LMConfig(
            model_type="qwen3",
            vocab_size=self.config.text_config.vocab_size,
            hidden_size=self.config.text_config.hidden_size,
            intermediate_size=self.config.text_config.intermediate_size,
            num_hidden_layers=self.config.text_config.num_hidden_layers,
            num_attention_heads=self.config.text_config.num_attention_heads,
            num_key_value_heads=self.config.text_config.num_key_value_heads,
            head_dim=self.config.text_config.head_dim,
            rms_norm_eps=self.config.text_config.rms_norm_eps,
            rope_theta=self.config.text_config.rope_theta,
            tie_word_embeddings=self.config.text_config.tie_word_embeddings,
        )
        self.language_model = CausalLM(lm_cfg)

    @property
    def sample_rate(self) -> int:
        return 16000

    def set_runtime(self, tokenizer=None):
        if tokenizer is not None:
            Model._RUNTIME.setdefault(id(self), {})["tokenizer"] = tokenizer

    def make_batcher(self, **kwargs):
        """Serving batcher: concurrent transcriptions share lock-step
        continuous batching of the qwen3 decoder (the audio tower runs
        per-request; the embedding prompt prefills via submit_embeds)."""
        from ....serving import LMContinuousBatcher

        kwargs.setdefault("warm_embeds", True)
        return LMContinuousBatcher(self, lm=self.language_model, **kwargs)

    def model_quant_predicate(self, p, m):
        return not p.startswith("audio_tower")

    def get_audio_features(self, mel, feature_len=None):
        return self.audio_tower(mel, feature_len)

    # ------------------------------------------------------------------
    def _resolve_tokenizer(self, tokenizer=None):
        if tokenizer is not None:
            return tokenizer
        from ....utils import resolve_runtime_tokenizer

        return resolve_runtime_tokenizer(
            self, Model._RUNTIME.setdefault(id(self), {}), "Qwen3-ASR")

    def _eos_ids(self, tokenizer) -> List[int]:
        eos = []
        for t in ("<|im_end|>", "<|endoftext|>"):
            try:
                tid = tokenizer.convert_tokens_to_ids(t)
                if tid is not None:
                    eos.append(int(tid))
            except Exception:
                pass
        return eos or [151645]

    def _prepare_inputs(self, audio, language, system_prompt, tokenizer):
        """Encode audio, build the chat prompt, splice audio embeddings.

        Returns (inputs_embeds (1, T, D), prompt_ids) —
        reference qwen3_asr.py:819-873 (_preprocess_audio + _build_prompt)
        + :632-666 (_build_inputs_embeds).
        """
        audio = ensure_waveform(audio, self.sample_rate)
        mel = A.log_mel_spectrogram(
            jnp.asarray(audio),
            n_mels=self.config.audio_config.num_mel_bins)
        mel = np.asarray(mel).T[None]  # (1, mel, T)
        audio_emb = self.get_audio_features(jnp.asarray(mel))  # (Na, D)
        n_audio = audio_emb.shape[0]

        prompt = (
            f"<|im_start|>system\n"
            f"{(system_prompt + chr(10)) if system_prompt else ''}"
            f"<|im_end|>\n<|im_start|>user\n<|audio_start|>"
            + "<|audio_pad|>" * n_audio
            + f"<|audio_end|><|im_end|>\n<|im_start|>assistant\n"
            f"language {language}<asr_text>")
        ids = np.asarray(tokenizer.encode(prompt), np.int64).reshape(-1)

        lm = self.language_model
        emb = np.array(jax.device_get(
            lm.model.embed_tokens(jnp.asarray(ids[None], jnp.int32))))
        mask = ids == self.config.audio_token_id
        n = min(int(mask.sum()), n_audio)
        if n:
            emb[0][np.nonzero(mask)[0][:n]] = np.asarray(
                jax.device_get(audio_emb))[:n]
        return jnp.asarray(emb), ids

    def stream_generate(self, audio, *, language: str = "English",
                        system_prompt: Optional[str] = None,
                        max_tokens: int = 8192, temperature: float = 0.0,
                        top_k: int = 0, top_p: float = 1.0,
                        min_p: float = 0.0, min_tokens_to_keep: int = 1,
                        repetition_penalty: float = 1.0,
                        repetition_context_size: int = 100,
                        sampler=None, verbose: bool = False,
                        prefill_step_size: int = 2048,
                        chunk_size: int = 16, seed: int = 0,
                        tokenizer=None, **kwargs):
        """Yield generated token ids as they are produced.

        TPU-first streaming: the decode runs on device in `chunk_size`-token
        blocks (one dispatch per block, not per token); tokens are yielded
        host-side between dispatches. EOS is consumed, not yielded.
        Reference: qwen3_asr.py:875-977 (stream_generate over mlx_lm
        generate_step).
        """
        tokenizer = self._resolve_tokenizer(tokenizer)
        inputs, _ids = self._prepare_inputs(
            audio, language, system_prompt, tokenizer)
        yield from self._stream_tokens(
            inputs, self._eos_ids(tokenizer), max_tokens=max_tokens,
            temperature=temperature, top_k=top_k, top_p=top_p,
            repetition_penalty=repetition_penalty, chunk_size=chunk_size,
            seed=seed)

    def _stream_tokens(self, inputs, eos, *, max_tokens, temperature,
                       top_k, top_p, repetition_penalty, chunk_size,
                       min_p=0.0, min_tokens_to_keep=1,
                       repetition_context_size=100, sampler=None, seed=0):
        from ....lm.generate import _decode_chunk, _prefill

        lm = self.language_model
        caches = lm.make_caches(1, max_len=inputs.shape[1] + max_tokens + 1,
                                dtype=jnp.float32)
        logits, caches = _prefill(lm, caches, inputs, _lm_call)
        history = jnp.full((1, 64), -1, jnp.int32)
        done = jnp.zeros((1,), bool)
        key = jax.random.PRNGKey(seed)
        eos_arr = jnp.asarray((eos + [-1, -1, -1])[:3], jnp.int32)
        sampler = sampler or make_sampler(
            temp=float(temperature), min_p=float(min_p),
            min_tokens_to_keep=int(min_tokens_to_keep), top_k=int(top_k),
                               top_p=float(top_p))

        produced = 0
        while produced < max_tokens:
            steps = min(chunk_size, max_tokens - produced)
            out, i, logits, caches, history, done, key = _decode_chunk(
                lm, caches, logits, history, done, key, eos_arr, _lm_call,
                sampler, float(repetition_penalty), int(steps))
            toks, nv, fin = jax.device_get((out, i, done))
            nv = int(nv)
            for t in toks[0][:nv]:
                t = int(t)
                if t in eos:
                    return
                yield t
            produced += nv
            if bool(fin.all()) or nv < steps:
                return

    def stream_transcribe(self, audio, *, language: str = "English",
                          system_prompt: Optional[str] = None,
                          max_tokens: int = 8192, temperature: float = 0.0,
                          top_k: int = 0, top_p: float = 1.0,
                          min_p: float = 0.0, min_tokens_to_keep: int = 1,
                          repetition_penalty: float = 1.0,
                          repetition_context_size: int = 100,
                          verbose: bool = False,
                          prefill_step_size: int = 2048,
                          chunk_duration: float = 1200.0,
                          min_chunk_duration: float = 1.0,
                          chunk_size: int = 16, tokenizer=None, **kwargs):
        """Stream transcription of arbitrarily long audio.

        Long audio is split at low-energy boundaries; each chunk's tokens
        stream as partial StreamingResults with timing estimated from token
        position within the chunk; a final StreamingResult per chunk carries
        cumulative token counts (reference qwen3_asr.py:1186-1332).
        """
        tokenizer = self._resolve_tokenizer(tokenizer)
        wav = ensure_waveform(audio, self.sample_rate)
        chunks = split_audio_into_chunks(
            wav, self.sample_rate, chunk_duration=chunk_duration,
            min_chunk_duration=min_chunk_duration)
        lang_code = language[:2].lower() if language else "en"

        total_prompt = 0
        total_gen = 0
        remaining = max_tokens
        for ci, (chunk_audio, offset) in enumerate(chunks):
            chunk_sec = len(chunk_audio) / self.sample_rate
            is_last = ci == len(chunks) - 1
            n = 0
            inputs, ids = self._prepare_inputs(
                chunk_audio, language, system_prompt, tokenizer)
            total_prompt += int(ids.shape[0])
            # incremental detokenization: per-token decode([tok]) (the
            # reference's approach, qwen3_asr.py:1293) emits U+FFFD for
            # multi-token UTF-8 characters; the detokenizer holds partial
            # bytes back and emits clean deltas
            from ....lm.detok import IncrementalDetokenizer

            detok = IncrementalDetokenizer(tokenizer)
            for tok in self._stream_tokens(
                    inputs, self._eos_ids(tokenizer),
                    max_tokens=remaining, temperature=temperature,
                    top_k=top_k, top_p=top_p, min_p=min_p,
                    min_tokens_to_keep=min_tokens_to_keep,
                    repetition_penalty=repetition_penalty or 1.0,
                    repetition_context_size=repetition_context_size,
                    chunk_size=chunk_size):
                text = detok.push(tok)
                # progress-vs-budget timing mirrors reference
                # qwen3_asr.py:1295-1308 (estimates, coarse by design)
                prev = n / max(remaining, 1)
                n += 1
                curr = min(n / max(remaining, 1), 1.0)
                if not text:
                    continue
                yield StreamingResult(
                    text=text, is_final=False,
                    start_time=offset + chunk_sec * prev,
                    end_time=offset + chunk_sec * curr,
                    language=lang_code)
            tail = detok.flush()
            if tail:
                yield StreamingResult(
                    text=tail, is_final=False,
                    start_time=offset + chunk_sec * min(
                        n / max(remaining, 1), 1.0),
                    end_time=offset + chunk_sec * min(
                        n / max(remaining, 1), 1.0),
                    language=lang_code)
            total_gen += n
            remaining -= n
            yield StreamingResult(
                text="", is_final=is_last or remaining <= 0,
                start_time=offset, end_time=offset + chunk_sec,
                language=lang_code, prompt_tokens=total_prompt,
                generation_tokens=total_gen)
            if remaining <= 0:
                break

    def generate(self, audio, *, language: str = "English",
                 system_prompt: Optional[str] = None, max_tokens: int = 8192,
                 temperature: float = 0.0, top_p: float = 1.0,
                 top_k: int = 0, min_p: float = 0.0,
                 min_tokens_to_keep: int = 1,
                 repetition_penalty: Optional[float] = None,
                 repetition_context_size: int = 100,
                 chunk_duration: float = 1200.0,
                 min_chunk_duration: float = 1.0,
                 verbose: bool = False, stream: bool = False,
                 tokenizer=None, **kwargs):
        """Transcribe, chunking long audio sequentially (reference
        qwen3_asr.py:1021-1180). stream=True delegates to stream_transcribe
        and returns its generator (reference :1051-1070)."""
        if stream:
            return self.stream_transcribe(
                audio, language=language, system_prompt=system_prompt,
                max_tokens=max_tokens, temperature=temperature,
                top_k=top_k, top_p=top_p,
                repetition_penalty=repetition_penalty or 1.0,
                chunk_duration=chunk_duration,
                min_chunk_duration=min_chunk_duration, tokenizer=tokenizer)
        t0 = time.perf_counter()
        audio = ensure_waveform(audio, self.sample_rate)
        duration = len(audio) / self.sample_rate
        tokenizer = self._resolve_tokenizer(tokenizer)
        eos = self._eos_ids(tokenizer)
        eos = (eos + [-1, -1, -1])[:3]
        sampler = make_sampler(
            temp=float(temperature), top_p=float(top_p), top_k=int(top_k),
            min_p=float(min_p), min_tokens_to_keep=int(min_tokens_to_keep))
        rep_p = float(repetition_penalty or 1.0)

        chunks = split_audio_into_chunks(
            audio, self.sample_rate, chunk_duration=chunk_duration,
            min_chunk_duration=min_chunk_duration)
        lm = self.language_model
        from ....lm.generate import _decode_chunk, _prefill

        texts = []
        total_prompt = 0
        total_gen = 0
        remaining = max_tokens
        # Under a running server a ContinuousBatcher may be installed:
        # concurrent transcriptions' decodes then run in lock-step (the
        # audio-conditioned embedding prompt prefills via submit_embeds).
        from ....serving import get_infer_hook

        hook = get_infer_hook(self)
        for chunk_audio, _offset in chunks:
            if remaining <= 0:
                break
            inputs, ids = self._prepare_inputs(
                chunk_audio, language, system_prompt, tokenizer)
            total_prompt += int(ids.shape[0])
            if hook is not None:
                out_list = hook.submit_embeds(
                    np.asarray(inputs[0], np.float32),
                    max_tokens=int(remaining),
                    eos_ids=tuple(e for e in eos if e >= 0),
                    temp=float(temperature), top_p=float(top_p),
                    top_k=int(top_k), min_p=float(min_p),
                    repetition_penalty=rep_p,
                    repetition_context_size=max(
                        repetition_context_size, 1)).result()
                seq = [int(t) for t in out_list if int(t) not in eos]
            else:
                caches = lm.make_caches(
                    1, max_len=inputs.shape[1] + remaining + 1,
                    dtype=jnp.float32)
                logits, caches = _prefill(lm, caches, inputs, _lm_call)
                out, i, *_ = _decode_chunk(
                    lm, caches, logits,
                    jnp.full((1, max(repetition_context_size, 1)), -1,
                             jnp.int32),
                    jnp.zeros((1,), bool), jax.random.PRNGKey(0),
                    jnp.asarray(eos, jnp.int32), _lm_call,
                    sampler, rep_p, int(remaining))
                toks, nt = jax.device_get((out, i))
                seq = [int(t) for t in toks[0][: int(nt)]
                       if int(t) not in eos]
            total_gen += len(seq)
            remaining -= len(seq)
            text = tokenizer.decode(seq)
            if "<asr_text>" in text:
                text = text.split("<asr_text>")[-1]
            if verbose:
                print(text.strip())
            texts.append(text.strip())
        wall = time.perf_counter() - t0
        return STTOutput(
            text=" ".join(t for t in texts if t).strip(), duration=duration,
            language=language, prompt_tokens=total_prompt,
            generation_tokens=total_gen,
            generation_tps=total_gen / max(wall, 1e-9))

    def sanitize(self, weights: dict) -> dict:
        from ....nn.sanitize import orient_weights_to_model

        out = {}
        for key, value in weights.items():
            k = key
            if k.startswith("thinker."):
                k = k[len("thinker."):]
            if k == "lm_head.weight":
                continue
            if k.startswith("model."):
                k = "language_model." + k
            # HF attention naming → ours
            k = k.replace(".self_attn.q_proj.", ".self_attn_q.")
            k = k.replace(".self_attn.k_proj.", ".self_attn_k.")
            k = k.replace(".self_attn.v_proj.", ".self_attn_v.")
            k = k.replace(".self_attn.out_proj.", ".self_attn_o.")
            out[k] = value
        return orient_weights_to_model(self, out)

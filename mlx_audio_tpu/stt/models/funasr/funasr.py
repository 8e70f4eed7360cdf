"""Fun-ASR: SenseVoice SANM encoder + audio adaptor + Qwen3 decoder.

TPU-native re-implementation of the reference
mlx_audio/stt/models/funasr/ (funasr.py, encoder.py, adaptor.py, audio.py,
qwen3.py). The 70-layer SANM encoder + adaptor runs as one jitted program;
decode reuses the shared on-device while_loop (lm/generate).
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....dsp import mel_filters, stft
from ....lm.generate import _decode_chunk, _prefill
from ....lm.sample import make_sampler
from ....lm.transformer import CausalLM, LMConfig
from ....nn import layers as nn
from ....nn.module import Module
from ..base import STTOutput, ensure_waveform

__all__ = ["Model", "FunASRConfig", "SenseVoiceEncoder", "AudioAdaptor",
           "apply_lfr", "apply_cmvn", "log_mel_spectrogram"]

SUPPORTED_LANGUAGES = {"en": "English", "zh": "Chinese", "ja": "Japanese",
                       "ko": "Korean", "yue": "Cantonese"}


def log_mel_spectrogram(audio, n_mels: int = 80, n_fft: int = 400,
                        hop_length: int = 160,
                        sample_rate: int = 16000) -> jnp.ndarray:
    """Hamming-window log-mel (reference audio.py:32-82) → (T, n_mels)."""
    n = jnp.arange(n_fft)
    window = 0.54 - 0.46 * jnp.cos(2 * jnp.pi * n / (n_fft - 1))
    spec = stft(jnp.asarray(audio, jnp.float32), n_fft=n_fft,
                hop_length=hop_length, win_length=n_fft, window=window)
    mag = jnp.abs(spec[:-1]) ** 2
    filters = mel_filters(sample_rate, n_fft, n_mels, norm="slaney",
                          mel_scale="htk")
    mel = mag @ filters.T
    return jnp.log(jnp.maximum(mel, 1e-10))


def apply_lfr(features: jnp.ndarray, lfr_m: int = 7,
              lfr_n: int = 6) -> jnp.ndarray:
    """Low-frame-rate stacking (reference audio.py:84-140)."""
    T, n_mels = features.shape
    T_lfr = int(math.ceil(T / lfr_n))
    left = (lfr_m - 1) // 2
    feats = jnp.concatenate(
        [jnp.broadcast_to(features[0:1], (left, n_mels)), features], axis=0)
    needed = (T_lfr - 1) * lfr_n + lfr_m
    if needed > feats.shape[0]:
        feats = jnp.concatenate(
            [feats, jnp.broadcast_to(feats[-1:],
                                     (needed - feats.shape[0], n_mels))],
            axis=0)
    idx = jnp.arange(T_lfr)[:, None] * lfr_n + jnp.arange(lfr_m)[None, :]
    return feats[idx].reshape(T_lfr, -1)


def apply_cmvn(features, cmvn_mean=None, cmvn_istd=None):
    """reference audio.py:142-180."""
    if cmvn_mean is None or cmvn_istd is None:
        mean = features.mean(axis=0, keepdims=True)
        std = features.std(axis=0, keepdims=True) + 1e-6
        return (features - mean) / std
    return (features + cmvn_mean) * cmvn_istd


@dataclass
class SenseVoiceEncoderConfig:
    input_dim: int = 560
    encoder_dim: int = 512
    num_heads: int = 4
    ffn_dim: int = 2048
    kernel_size: int = 11
    sanm_shift: int = 0
    num_encoders0: int = 1
    num_encoders: int = 49
    num_tp_encoders: int = 20

    @classmethod
    def from_dict(cls, d):
        return cls(**{k: v for k, v in d.items()
                      if k in cls.__dataclass_fields__})


@dataclass
class AudioAdaptorConfig:
    downsample_rate: int = 2
    encoder_dim: int = 512
    llm_dim: int = 1024
    ffn_dim: int = 2048
    n_layer: int = 2
    attention_heads: int = 8

    @classmethod
    def from_dict(cls, d):
        return cls(**{k: v for k, v in d.items()
                      if k in cls.__dataclass_fields__})


@dataclass
class FunASRConfig:
    sample_rate: int = 16000
    n_mels: int = 80
    lfr_m: int = 7
    lfr_n: int = 6
    encoder: Any = field(default_factory=SenseVoiceEncoderConfig)
    adaptor: Any = field(default_factory=AudioAdaptorConfig)
    llm: Any = None
    max_tokens: int = 512
    temperature: float = 0.0

    def __post_init__(self):
        if isinstance(self.encoder, dict):
            self.encoder = SenseVoiceEncoderConfig.from_dict(self.encoder)
        if isinstance(self.adaptor, dict):
            self.adaptor = AudioAdaptorConfig.from_dict(self.adaptor)
        if self.llm is None:
            self.llm = {}

    @classmethod
    def from_dict(cls, d):
        return cls(**{k: v for k, v in d.items()
                      if k in cls.__dataclass_fields__})


class SANMAttention(Module):
    """Attention + FSMN value memory (reference encoder.py:37-212)."""

    def __init__(self, n_head, in_feat, n_feat, kernel_size=11,
                 sanm_shift=0):
        self.h = n_head
        self.n_feat = n_feat
        self.d_k = n_feat // n_head
        self.linear_q_k_v = nn.Linear(in_feat, n_feat * 3)
        self.linear_out = nn.Linear(n_feat, n_feat)
        self.fsmn_block = nn.Conv1d(n_feat, n_feat, kernel_size,
                                    groups=n_feat, bias=False)
        left = (kernel_size - 1) // 2 + (sanm_shift if sanm_shift > 0 else 0)
        self.left_padding = left
        self.right_padding = kernel_size - 1 - left

    def __call__(self, x):
        B, T, _ = x.shape
        qkv = self.linear_q_k_v(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        fsmn = self.fsmn_block(jnp.pad(
            v, ((0, 0), (self.left_padding, self.right_padding), (0, 0)))) + v
        q = q.reshape(B, T, self.h, self.d_k).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, self.h, self.d_k).transpose(0, 2, 1, 3)
        vh = v.reshape(B, T, self.h, self.d_k).transpose(0, 2, 1, 3)
        scores = q @ k.transpose(0, 1, 3, 2) * self.d_k**-0.5
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        o = (attn @ vh).transpose(0, 2, 1, 3).reshape(B, T, self.n_feat)
        return self.linear_out(o) + fsmn


class EncoderLayerSANM(Module):
    def __init__(self, in_size, size, n_head, d_ff, kernel_size=11,
                 sanm_shift=0):
        self.in_size = in_size
        self.size = size
        self.norm1 = nn.LayerNorm(in_size)
        self.self_attn = SANMAttention(n_head, in_size, size, kernel_size,
                                       sanm_shift)
        self.norm2 = nn.LayerNorm(size)
        self.w_1 = nn.Linear(size, d_ff)
        self.w_2 = nn.Linear(d_ff, size)

    def __call__(self, x):
        h = self.self_attn(self.norm1(x))
        x = x + h if self.in_size == self.size else h
        return x + self.w_2(jax.nn.relu(self.w_1(self.norm2(x))))


class SenseVoiceEncoder(Module):
    """reference encoder.py:299-420."""

    def __init__(self, cfg: SenseVoiceEncoderConfig):
        self.cfg = cfg
        mk = lambda in_size: EncoderLayerSANM(
            in_size, cfg.encoder_dim, cfg.num_heads, cfg.ffn_dim,
            cfg.kernel_size, cfg.sanm_shift)
        self.encoders0 = [mk(cfg.input_dim if i == 0 else cfg.encoder_dim)
                          for i in range(cfg.num_encoders0)]
        self.encoders = [mk(cfg.encoder_dim)
                         for _ in range(cfg.num_encoders)]
        self.tp_encoders = [mk(cfg.encoder_dim)
                            for _ in range(cfg.num_tp_encoders)]
        self.after_norm = nn.LayerNorm(cfg.encoder_dim)
        self.tp_norm = nn.LayerNorm(cfg.encoder_dim)

    def __call__(self, x):
        x = x * math.sqrt(self.cfg.encoder_dim)
        for layer in self.encoders0:
            x = layer(x)
        for layer in self.encoders:
            x = layer(x)
        x = self.after_norm(x)
        for layer in self.tp_encoders:
            x = layer(x)
        return self.tp_norm(x)


class _AdaptorBlock(Module):
    def __init__(self, size, n_head, d_ff):
        self.norm1 = nn.LayerNorm(size)
        self.linear_q = nn.Linear(size, size)
        self.linear_k = nn.Linear(size, size)
        self.linear_v = nn.Linear(size, size)
        self.linear_out = nn.Linear(size, size)
        self.norm2 = nn.LayerNorm(size)
        self.w_1 = nn.Linear(size, d_ff)
        self.w_2 = nn.Linear(d_ff, size)
        self.h = n_head
        self.d_k = size // n_head

    def __call__(self, x):
        B, T, D = x.shape
        h = self.norm1(x)
        q = self.linear_q(h).reshape(B, T, self.h, self.d_k).transpose(0, 2, 1, 3)
        k = self.linear_k(h).reshape(B, T, self.h, self.d_k).transpose(0, 2, 1, 3)
        v = self.linear_v(h).reshape(B, T, self.h, self.d_k).transpose(0, 2, 1, 3)
        scores = q @ k.transpose(0, 1, 3, 2) * self.d_k**-0.5
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        o = (attn @ v).transpose(0, 2, 1, 3).reshape(B, T, D)
        x = x + self.linear_out(o)
        return x + self.w_2(jax.nn.relu(self.w_1(self.norm2(x))))


class AudioAdaptor(Module):
    """Downsample + project to LLM space (reference adaptor.py:139-245)."""

    def __init__(self, cfg: AudioAdaptorConfig):
        self.k = cfg.downsample_rate
        self.linear1 = nn.Linear(cfg.encoder_dim * self.k, cfg.ffn_dim)
        self.linear2 = nn.Linear(cfg.ffn_dim, cfg.llm_dim)
        self.blocks = [_AdaptorBlock(cfg.llm_dim, cfg.attention_heads,
                                     cfg.llm_dim // 4)
                       for _ in range(cfg.n_layer)]

    def __call__(self, x):
        B, T, D = x.shape
        chunks = (T - 1) // self.k + 1
        pad = chunks * self.k - T
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        x = x.reshape(B, chunks, D * self.k)
        x = self.linear2(jax.nn.relu(self.linear1(x)))
        for b in self.blocks:
            x = b(x)
        return x


def _lm_call(model, x, caches):
    if x.dtype in (jnp.int32, jnp.int64):
        return model(x, caches)
    h, caches = model.model(x, caches)
    logits = (model.lm_head(h) if hasattr(model, "lm_head")
              else model.model.embed_tokens.as_linear(h))
    return logits, caches


@jax.jit
def _encode_audio(model: "Model", lfr_feats):
    h = model.encoder(lfr_feats)
    return model.adaptor(h)


class _StreamCleaner:
    """Streaming-safe _clean_output: suppresses <think>...</think> spans and
    special-token markers even when they straddle chunk boundaries, by
    holding back any trailing text that could be a marker prefix."""

    _MARKERS = ("<|im_start|>", "<|im_end|>", "<|startofspeech|>",
                "<|endofspeech|>", "<|endoftext|>")

    def __init__(self):
        self._buf = ""
        self._in_think = False

    def push(self, raw: str, final: bool = False) -> str:
        import re as _re

        self._buf += raw
        # resolve complete think spans / markers
        self._buf = _re.sub(r"<think>.*?</think>", "", self._buf,
                            flags=_re.DOTALL)
        for m in self._MARKERS:
            self._buf = self._buf.replace(m, "")
        if self._in_think:
            end = self._buf.find("</think>")
            if end < 0:
                if final:
                    self._buf = ""
                return ""
            self._buf = self._buf[end + len("</think>"):]
            self._in_think = False
        start = self._buf.find("<think>")
        if start >= 0:
            out, rest = self._buf[:start], self._buf[start + len("<think>"):]
            self._in_think = True
            self._buf = rest
            return out + self.push("", final=final)
        if final:
            out, self._buf = self._buf, ""
            return out.strip() if out else out
        # hold back a tail that could begin a marker
        hold = 0
        candidates = self._MARKERS + ("<think>", "</think>")
        for n in range(1, min(len(self._buf), 17) + 1):
            tail = self._buf[-n:]
            if any(c.startswith(tail) for c in candidates):
                hold = n
        out = self._buf[: len(self._buf) - hold]
        self._buf = self._buf[len(self._buf) - hold:]
        return out


class Model(Module):
    """reference funasr.py:164-1026."""

    _RUNTIME: dict = {}

    def __init__(self, config: Any = None):
        if isinstance(config, dict):
            config = FunASRConfig.from_dict(config)
        self.config = config or FunASRConfig()
        self.encoder = SenseVoiceEncoder(self.config.encoder)
        self.adaptor = AudioAdaptor(self.config.adaptor)
        llm = self.config.llm or {}
        self.llm = CausalLM(LMConfig(
            model_type="qwen3",
            vocab_size=llm.get("vocab_size", 151936),
            hidden_size=llm.get("hidden_size", 1024),
            intermediate_size=llm.get("intermediate_size", 3072),
            num_hidden_layers=llm.get("num_hidden_layers", 28),
            num_attention_heads=llm.get("num_attention_heads", 16),
            num_key_value_heads=llm.get("num_key_value_heads", 8),
            head_dim=llm.get("head_dim", 64),
            rms_norm_eps=llm.get("rms_norm_eps", 1e-6),
            rope_theta=llm.get("rope_theta", 1000000.0),
            tie_word_embeddings=llm.get("tie_word_embeddings", True)))

    @property
    def sample_rate(self):
        return self.config.sample_rate

    def set_runtime(self, tokenizer=None, cmvn=None):
        rt = Model._RUNTIME.setdefault(id(self), {})
        if tokenizer is not None:
            rt["tokenizer"] = tokenizer
        if cmvn is not None:
            rt["cmvn"] = cmvn

    def make_batcher(self, **kwargs):
        """Serving batcher: concurrent transcriptions share lock-step
        continuous batching of the qwen3 decoder (the SANM encoder +
        adaptor run per-request; the embedding prompt prefills via
        submit_embeds)."""
        from ....serving import LMContinuousBatcher

        kwargs.setdefault("warm_embeds", True)
        return LMContinuousBatcher(self, lm=self.llm, **kwargs)

    def _resolve_tokenizer(self, tokenizer=None):
        if tokenizer is not None:
            return tokenizer
        from ....utils import resolve_runtime_tokenizer

        return resolve_runtime_tokenizer(
            self, Model._RUNTIME.setdefault(id(self), {}), "Fun-ASR")

    def encode_audio(self, audio: np.ndarray) -> jnp.ndarray:
        mel = log_mel_spectrogram(audio, n_mels=self.config.n_mels,
                                  sample_rate=self.config.sample_rate)
        lfr = apply_lfr(mel, self.config.lfr_m, self.config.lfr_n)
        rt = Model._RUNTIME.get(id(self), {})
        cmvn = rt.get("cmvn")
        if cmvn is not None:
            lfr = apply_cmvn(lfr, cmvn[0], cmvn[1])
        else:
            lfr = apply_cmvn(lfr)
        return _encode_audio(self, lfr[None])  # (1, Na, llm_dim)

    def _build_system_prompt(self, task="transcribe", language="auto",
                             target_language="en",
                             initial_prompt=None) -> str:
        """reference funasr.py:306-348."""
        if task == "translate":
            tgt = SUPPORTED_LANGUAGES.get(target_language, target_language)
            if language == "auto":
                base = (f"You are a speech translation assistant. Listen to "
                        f"the audio and translate the speech into {tgt}. "
                        f"Output only the translation, nothing else.")
            else:
                src = SUPPORTED_LANGUAGES.get(language, language)
                base = (f"You are a speech translation assistant. The audio "
                        f"is in {src}. Translate it into {tgt}. Output only "
                        f"the translation, nothing else.")
        else:
            if language == "auto":
                base = ("You are a speech recognition assistant. Transcribe "
                        "the audio accurately. Output only the "
                        "transcription, nothing else.")
            else:
                lang = SUPPORTED_LANGUAGES.get(language, language)
                base = (f"You are a speech recognition assistant. The audio "
                        f"is in {lang}. Transcribe it accurately. Output "
                        f"only the transcription, nothing else.")
        return f"{initial_prompt}\n\n{base}" if initial_prompt else base

    def generate(self, audio, *, language: str = "auto",
                 task: str = "transcribe", target_language: str = "en",
                 initial_prompt: Optional[str] = None,
                 max_tokens: Optional[int] = None,
                 temperature: Optional[float] = None,
                 top_p: float = 0.95, top_k: int = 0,
                 verbose: bool = False, stream: bool = False,
                 tokenizer=None, **kwargs):
        """reference funasr.py:561-640; sampler knobs per the reference
        signature. stream=True returns the stream_generate generator."""
        if stream:
            return self.stream_generate(
                audio, language=language, task=task,
                target_language=target_language,
                initial_prompt=initial_prompt,
                max_tokens=max_tokens or self.config.max_tokens,
                temperature=(self.config.temperature if temperature is None
                             else temperature),
                top_k=top_k, top_p=top_p, tokenizer=tokenizer)
        t0 = time.perf_counter()
        audio = ensure_waveform(audio, self.sample_rate)
        duration = len(audio) / self.sample_rate
        tokenizer = self._resolve_tokenizer(tokenizer)

        inputs = self._prepare_prompt(audio, tokenizer, task, language,
                                      target_language, initial_prompt)

        max_tokens = max_tokens or self.config.max_tokens
        temperature = (self.config.temperature if temperature is None
                       else temperature)
        caches = self.llm.make_caches(1, inputs.shape[1] + max_tokens + 1,
                                      dtype=jnp.float32)
        eos = self._eos_ids(tokenizer)
        eos = (eos + [-1, -1, -1])[:3]
        # Under a running server a ContinuousBatcher may be installed:
        # concurrent transcriptions' decodes then run in lock-step (the
        # audio-conditioned embedding prompt prefills via submit_embeds).
        from ....serving import get_infer_hook

        hook = get_infer_hook(self)
        if hook is not None:
            out_list = hook.submit_embeds(
                np.asarray(inputs[0], np.float32),
                max_tokens=int(max_tokens),
                eos_ids=tuple(e for e in eos if e >= 0),
                temp=float(temperature), top_p=float(top_p),
                top_k=int(top_k)).result()
            seq = [int(t) for t in out_list if int(t) not in eos]
        else:
            logits, caches = _prefill(self.llm, caches, inputs, _lm_call)
            out, i, *_ = _decode_chunk(
                self.llm, caches, logits, jnp.full((1, 64), -1, jnp.int32),
                jnp.zeros((1,), bool), jax.random.PRNGKey(0),
                jnp.asarray(eos, jnp.int32), _lm_call,
                make_sampler(temp=float(temperature), top_p=float(top_p),
                             top_k=int(top_k)), 1.0, int(max_tokens))
            toks, n = jax.device_get((out, i))
            seq = [int(t) for t in toks[0][: int(n)] if int(t) not in eos]
        wall = time.perf_counter() - t0
        text = self._clean_output(tokenizer.decode(seq))
        if language == "auto":
            language = self._detect_language_from_text(text)
        if verbose:
            print(text)
        return STTOutput(text=text,
                         duration=duration, language=language,
                         generation_tokens=len(seq),
                         generation_tps=len(seq) / max(wall, 1e-9))


    def _prepare_prompt(self, audio, tokenizer, task="transcribe",
                        language="auto", target_language="en",
                        initial_prompt=None) -> jnp.ndarray:
        """Audio embeddings spliced into the chat template
        (reference funasr.py:350-402)."""
        audio_emb = self.encode_audio(audio)
        system = self._build_system_prompt(task, language, target_language,
                                           initial_prompt)
        pre = (f"<|im_start|>system\n{system}<|im_end|>"
               f"<|im_start|>user\n<|startofspeech|>")
        post = "<|endofspeech|><|im_end|><|im_start|>assistant\n"
        pre_ids = np.asarray(tokenizer.encode(pre), np.int64).reshape(1, -1)
        post_ids = np.asarray(tokenizer.encode(post), np.int64).reshape(1, -1)
        embed = self.llm.model.embed_tokens
        return jnp.concatenate(
            [embed(jnp.asarray(pre_ids, jnp.int32)), audio_emb,
             embed(jnp.asarray(post_ids, jnp.int32))], axis=1)

    def _eos_ids(self, tokenizer) -> list:
        eos = []
        for tk in ("<|im_end|>", "<|endoftext|>"):
            try:
                tid = tokenizer.convert_tokens_to_ids(tk)
                if tid is not None:
                    eos.append(int(tid))
            except Exception:
                pass
        return eos or [151645]

    def stream_generate(self, audio, *, language: str = "auto",
                        task: str = "transcribe", target_language: str = "en",
                        initial_prompt: Optional[str] = None,
                        max_tokens: int = 512, temperature: float = 0.0,
                        top_p: float = 0.95, top_k: int = 0,
                        chunk_size: int = 16, tokenizer=None, **kwargs):
        """Stream partial transcription text (reference funasr.py:473-560's
        token generator; here decode runs on device in `chunk_size` blocks
        and text is detokenized incrementally host-side)."""
        from dataclasses import dataclass as _dc

        from ....lm.detok import IncrementalDetokenizer

        @_dc
        class StreamingResult:
            text: str
            is_final: bool
            start_time: float = 0.0
            end_time: float = 0.0
            language: str = "auto"
            prompt_tokens: int = 0
            generation_tokens: int = 0

        tokenizer = self._resolve_tokenizer(tokenizer)
        audio = ensure_waveform(audio, self.sample_rate)
        duration = len(audio) / self.sample_rate
        inputs = self._prepare_prompt(audio, tokenizer, task, language,
                                      target_language, initial_prompt)
        eos = self._eos_ids(tokenizer)
        caches = self.llm.make_caches(
            1, inputs.shape[1] + max_tokens + 1, dtype=jnp.float32)
        logits, caches = _prefill(self.llm, caches, inputs, _lm_call)
        history = jnp.full((1, 64), -1, jnp.int32)
        done = jnp.zeros((1,), bool)
        key = jax.random.PRNGKey(0)
        eos_arr = jnp.asarray((eos + [-1, -1, -1])[:3], jnp.int32)
        sampler = make_sampler(temp=float(temperature), top_k=int(top_k),
                               top_p=float(top_p))
        detok = IncrementalDetokenizer(tokenizer)
        cleaner = _StreamCleaner()
        produced = 0
        while produced < max_tokens:
            steps = min(chunk_size, max_tokens - produced)
            out, i, logits, caches, history, done, key = _decode_chunk(
                self.llm, caches, logits, history, done, key, eos_arr,
                _lm_call, sampler, 1.0, int(steps))
            toks, nv, fin = jax.device_get((out, i, done))
            nv = int(nv)
            ended = False
            raw = ""
            for t in toks[0][:nv]:
                t = int(t)
                if t in eos:
                    ended = True
                    break
                raw += detok.push(t)
            produced += nv
            final = ended or bool(fin.all()) or nv < steps or \
                produced >= max_tokens
            if final:
                raw += detok.flush()
            text = cleaner.push(raw, final=final)
            if text or final:
                yield StreamingResult(
                    text=text, is_final=final, start_time=0.0,
                    end_time=duration, language=language,
                    generation_tokens=produced)
            if final:
                return

    @staticmethod
    def _detect_language_from_text(text: str) -> str:
        """Script-based heuristic (reference funasr.py:775-813)."""
        if not text:
            return "unknown"
        total = len(text)
        counts = {
            "ja": sum("\u3040" <= c <= "\u30ff" for c in text),
            "ko": sum("\uac00" <= c <= "\ud7af" for c in text),
            "zh": sum("\u4e00" <= c <= "\u9fff" for c in text),
            "ar": sum("\u0600" <= c <= "\u06ff" for c in text),
            "th": sum("\u0e00" <= c <= "\u0e7f" for c in text),
            "ru": sum("\u0400" <= c <= "\u04ff" for c in text),
        }
        if counts["ja"] / total > 0.1:
            return "ja"
        if counts["ko"] / total > 0.1:
            return "ko"
        for code, thresh in (("zh", 0.2), ("ar", 0.2), ("th", 0.2),
                             ("ru", 0.2)):
            if counts[code] / total > thresh:
                return code
        return "en"

    @staticmethod
    def _clean_output(text: str) -> str:
        """Strip think blocks + special tokens (reference funasr.py:815-847)."""
        import re as _re

        text = _re.sub(r"<think>.*?</think>", "", text, flags=_re.DOTALL)
        for token in ("<|im_start|>", "<|im_end|>", "<|startofspeech|>",
                      "<|endofspeech|>", "<|endoftext|>"):
            text = text.replace(token, "")
        return text.strip()

    def sanitize(self, weights: dict) -> dict:
        from ....nn.sanitize import orient_weights_to_model

        out = {}
        for key, value in weights.items():
            k = key
            # original FunASR wraps the whole model: model.audio_encoder.*,
            # model.llm.*; strip ONLY that wrapper — a bare HF-LLM layout
            # (model.embed_tokens.* etc.) must keep its prefix so the
            # llm.-re-prefix branch below still applies
            if k.startswith(("model.audio_encoder.", "model.audio_adaptor.",
                             "model.llm.")):
                k = k[len("model."):]
            k = k.replace(".feed_forward.w_1.", ".w_1.")
            k = k.replace(".feed_forward.w_2.", ".w_2.")
            # reference module attribute names (funasr.py:172-190)
            if k.startswith("audio_encoder."):
                k = "encoder." + k[len("audio_encoder."):]
            elif k.startswith("audio_adaptor."):
                k = "adaptor." + k[len("audio_adaptor."):]
            if k.startswith(("llm.", "encoder.", "adaptor.")):
                pass
            elif k.startswith(("model.", "lm_head.")):
                k = "llm." + k
            out[k] = value
        return orient_weights_to_model(self, out)

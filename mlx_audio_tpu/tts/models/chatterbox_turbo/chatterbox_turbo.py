"""Chatterbox Turbo: GPT-2 medium T3 + meanflow-distilled S3Gen.

TPU-native re-implementation of the reference
mlx_audio/tts/models/chatterbox_turbo/ (chatterbox_turbo.py,
models/t3/t3.py, models/t3/t3_config.py, models/s3gen/*). Differences from
base Chatterbox (reference models/s3gen/s3gen.py:1-10): GPT-2 backbone
instead of LLaMA, no perceiver/emotion conditioning, and a meanflow
(distilled, no-CFG, 2-step) flow decoder. The speech-token decode runs as
one on-device `lax.while_loop`.
"""

from __future__ import annotations

import re
import time
from dataclasses import dataclass
from functools import partial
from typing import Generator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....codec.models.s3gen import (
    CausalMaskedDiffWithXvec,
    CFMParams,
    ConditionalDecoder,
    HiFTGenerator,
    S3GEN_SR,
    S3_SR,
    UpsampleConformerEncoder,
)
from ....codec.models.s3gen.hifigan import ConvRNNF0Predictor
from ....codec.models.s3gen.s3gen import CausalConditionalCFM, S3Token2Wav
from ....codec.models.s3tokenizer import (
    SPEECH_VOCAB_SIZE,
    S3TokenizerV2,
    log_mel_spectrogram,
    padding,
)
from ....lm.cache import KVCache
from ....lm.gpt2 import GPT2Config, GPT2Model
from ....lm.sample import apply_repetition_penalty
from ....nn import layers as nn
from ....nn.module import Module
from ..base import GenerationResult, format_duration
from ..chatterbox.chatterbox import punc_norm
from ..chatterbox.t3 import T3Cond, T3CondEnc
from ..chatterbox.voice_encoder import VoiceEncoder

__all__ = ["Model", "T3Turbo", "T3TurboConfig", "GPT2_MEDIUM_CONFIG"]

S3GEN_SIL = 4299

GPT2_MEDIUM_CONFIG = {
    "n_embd": 1024,
    "n_head": 16,
    "n_layer": 24,
    "n_positions": 8196,
    "vocab_size": 50276,
    "layer_norm_epsilon": 1e-05,
}


@dataclass
class T3TurboConfig:
    """reference models/t3/t3_config.py."""

    start_text_token: int = 255
    stop_text_token: int = 0
    text_tokens_dict_size: int = 50276
    max_text_tokens: int = 2048
    start_speech_token: int = 6561
    stop_speech_token: int = 6562
    speech_tokens_dict_size: int = 6563
    max_speech_tokens: int = 4096
    speech_cond_prompt_len: int = 375
    speaker_embed_size: int = 256
    use_perceiver_resampler: bool = False
    emotion_adv: bool = False
    encoder_type: str = "voice_encoder"
    input_pos_emb: Optional[str] = None
    gpt2_overrides: Optional[dict] = None

    @property
    def gpt2_config(self) -> dict:
        cfg = dict(GPT2_MEDIUM_CONFIG)
        if self.gpt2_overrides:
            cfg.update(self.gpt2_overrides)
        return cfg

    @property
    def n_channels(self) -> int:
        return self.gpt2_config["n_embd"]


def _sample_topk_topp(logits, key, temp, top_k, top_p):
    logits = logits / max(temp, 1e-5)
    if 0 < top_k < logits.shape[-1]:
        kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p < 1.0:
        probs = jax.nn.softmax(logits, axis=-1)
        srt = jnp.sort(probs, axis=-1)[..., ::-1]
        cum = jnp.cumsum(srt, axis=-1)
        idx = jnp.sum(cum < top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(srt, idx, axis=-1)
        logits = jnp.where(probs < cutoff, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1)


@partial(
    jax.jit,
    static_argnames=("max_gen_len", "temperature", "top_k", "top_p",
                     "repetition_penalty"),
    donate_argnames=("caches",),
)
def _turbo_decode_loop(t3, caches, input_embeds, prefill_len, key,
                       max_gen_len: int, temperature: float, top_k: int,
                       top_p: float, repetition_penalty: float):
    """reference models/t3/t3.py:212-320, as one dispatch."""
    stop = t3.hp.stop_speech_token
    Tp = input_embeds.shape[1]
    S = caches[0].max_len
    q_idx = jnp.arange(Tp)[:, None]
    k_idx = jnp.arange(S)[None, :]
    ok = (k_idx <= q_idx) & (k_idx < prefill_len)
    mask = jnp.where(ok, 0.0, -jnp.inf)[None, None]
    pos = jnp.arange(Tp)
    hidden, caches = t3.tfmr(input_embeds, caches, positions=pos, mask=mask)
    last = jnp.clip(prefill_len - 1, 0, Tp - 1)

    out = jnp.zeros((max_gen_len,), jnp.int32)
    hist = jnp.full((1, 128), -1, jnp.int32)

    def cond_fn(s):
        return (s[0] < max_gen_len) & ~s[5]

    def body(s):
        step, caches, h_last, out, hist, done, key = s
        logits = t3.speech_head(h_last).astype(jnp.float32)
        if repetition_penalty != 1.0:
            logits = apply_repetition_penalty(logits, hist,
                                              repetition_penalty)
        key, sub = jax.random.split(key)
        tok = _sample_topk_topp(logits, sub, temperature, top_k, top_p)[0]
        done_now = tok == stop
        out = jnp.where(done_now | done, out, out.at[step].set(tok))
        hist = jnp.concatenate([hist[:, 1:], tok[None, None]], axis=1)
        done = done | done_now

        emb = t3.speech_emb.weight[tok][None, None]
        q_pos = prefill_len + step
        valid = (k_idx[0] < prefill_len) | ((k_idx[0] >= Tp)
                                            & (k_idx[0] <= Tp + step))
        dmask = jnp.where(valid, 0.0, -jnp.inf)[None, None, None, :]
        hidden, ncaches = t3.tfmr(emb, caches, positions=q_pos[None],
                                  mask=dmask)
        step = jnp.where(done, step, step + 1)
        return (step, ncaches, hidden[:, -1], out, hist, done, key)

    state = (jnp.array(0, jnp.int32), caches, hidden[:, last], out, hist,
             jnp.array(False), key)
    n, _, _, out, _, _, _ = jax.lax.while_loop(cond_fn, body, state)
    return out, n


@partial(jax.jit, donate_argnames=("caches",))
def _turbo_prefill(t3, caches, input_embeds, prefill_len):
    """Prefill half of _turbo_decode_loop, split out so streaming decode can
    resume from (h_last, caches) across chunk calls."""
    Tp = input_embeds.shape[1]
    S = caches[0].max_len
    q_idx = jnp.arange(Tp)[:, None]
    k_idx = jnp.arange(S)[None, :]
    ok = (k_idx <= q_idx) & (k_idx < prefill_len)
    mask = jnp.where(ok, 0.0, -jnp.inf)[None, None]
    hidden, caches = t3.tfmr(input_embeds, caches, positions=jnp.arange(Tp),
                             mask=mask)
    last = jnp.clip(prefill_len - 1, 0, Tp - 1)
    return hidden[:, last], caches


@partial(
    jax.jit,
    static_argnames=("chunk", "max_gen_len", "temperature", "top_k", "top_p",
                     "repetition_penalty", "prompt_width"),
    donate_argnames=("caches",),
)
def _turbo_decode_chunk(t3, caches, h_last, hist, start_step, prefill_len,
                        key, chunk: int, max_gen_len: int, prompt_width: int,
                        temperature: float, top_k: int, top_p: float,
                        repetition_penalty: float):
    """Up to `chunk` AR steps starting at absolute step `start_step`; same
    per-step math as _turbo_decode_loop (reference models/t3/t3.py:322-440
    inference_turbo_stream), returning resumable state. One compile serves
    every chunk because start_step is traced."""
    stop = t3.hp.stop_speech_token
    S = caches[0].max_len
    k_idx = jnp.arange(S)
    out = jnp.zeros((chunk,), jnp.int32)

    def cond_fn(s):
        return (s[0] < chunk) & ~s[6] & (start_step + s[0] < max_gen_len)

    def body(s):
        local, caches, h_last, out, hist, key, done = s
        logits = t3.speech_head(h_last).astype(jnp.float32)
        if repetition_penalty != 1.0:
            logits = apply_repetition_penalty(logits, hist,
                                              repetition_penalty)
        key, sub = jax.random.split(key)
        tok = _sample_topk_topp(logits, sub, temperature, top_k, top_p)[0]
        done_now = tok == stop
        out = jnp.where(done_now | done, out, out.at[local].set(tok))
        hist = jnp.concatenate([hist[:, 1:], tok[None, None]], axis=1)
        done = done | done_now

        emb = t3.speech_emb.weight[tok][None, None]
        step = start_step + local
        q_pos = prefill_len + step
        valid = (k_idx < prefill_len) | ((k_idx >= prompt_width)
                                         & (k_idx <= prompt_width + step))
        dmask = jnp.where(valid, 0.0, -jnp.inf)[None, None, None, :]
        hidden, ncaches = t3.tfmr(emb, caches, positions=q_pos[None],
                                  mask=dmask)
        local = jnp.where(done, local, local + 1)
        return (local, ncaches, hidden[:, -1], out, hist, key, done)

    state = (jnp.array(0, jnp.int32), caches, h_last, out, hist, key,
             jnp.array(False))
    local, caches, h_last, out, hist, key, done = jax.lax.while_loop(
        cond_fn, body, state)
    return out, local, caches, h_last, hist, key, done


class T3Turbo(Module):
    """GPT-2 medium speech-token LM (reference models/t3/t3.py:16-440)."""

    def __init__(self, hp: Optional[T3TurboConfig] = None):
        hp = hp or T3TurboConfig()
        self.hp = hp
        cfg = GPT2Config(**{k: v for k, v in hp.gpt2_config.items()
                            if k in GPT2Config.__dataclass_fields__})
        self.cfg = cfg
        self.tfmr = GPT2Model(cfg)
        self.dim = cfg.n_embd
        self.cond_enc = _TurboCondEnc(hp)
        self.text_emb = nn.Embedding(hp.text_tokens_dict_size, self.dim)
        self.speech_emb = nn.Embedding(hp.speech_tokens_dict_size, self.dim)
        self.text_head = nn.Linear(self.dim, hp.text_tokens_dict_size,
                                   bias=False)
        self.speech_head = nn.Linear(self.dim, hp.speech_tokens_dict_size,
                                     bias=False)

    def prepare_input_embeds(self, t3_cond: T3Cond, text_tokens, speech_tokens):
        cond_emb = self.cond_enc(t3_cond)
        text_emb = self.text_emb(jnp.asarray(text_tokens, jnp.int32))
        speech_emb = self.speech_emb(jnp.asarray(speech_tokens, jnp.int32))
        return jnp.concatenate([cond_emb, text_emb, speech_emb], axis=1)

    def inference_turbo(self, t3_cond: T3Cond, text_tokens,
                        temperature: float = 0.8, top_k: int = 1000,
                        top_p: float = 0.95,
                        repetition_penalty: float = 1.2,
                        max_gen_len: int = 1000, key=None) -> np.ndarray:
        text_tokens = np.asarray(text_tokens)
        if text_tokens.ndim == 1:
            text_tokens = text_tokens[None]
        bos = np.full((1, 1), self.hp.start_speech_token, np.int32)
        embeds = self.prepare_input_embeds(t3_cond, text_tokens, bos)
        T0 = embeds.shape[1]
        Tp = max(32, ((T0 + 31) // 32) * 32)
        embeds = jnp.pad(embeds, ((0, 0), (0, Tp - T0), (0, 0)))
        max_gen = min(max_gen_len, self.hp.max_speech_tokens)
        caches = [
            KVCache(1, self.cfg.n_head, Tp + max_gen + 1,
                    self.cfg.n_embd // self.cfg.n_head, jnp.float32)
            for _ in range(self.cfg.n_layer)
        ]
        if key is None:
            key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        out, n = _turbo_decode_loop(
            self, caches, embeds, jnp.array(T0, jnp.int32), key, max_gen,
            float(temperature), int(top_k), float(top_p),
            float(repetition_penalty))
        return np.asarray(out)[: int(n)][None]

    def inference_turbo_stream(self, t3_cond: T3Cond, text_tokens,
                               temperature: float = 0.8, top_k: int = 1000,
                               top_p: float = 0.95,
                               repetition_penalty: float = 1.2,
                               chunk_size: int = 40,
                               max_gen_len: int = 1000, key=None):
        """Generator of (new_tokens, is_final) chunks (reference
        models/t3/t3.py:322-440). Decode state (KV caches, last hidden,
        repetition history) carries across jitted chunk calls, so tokens
        match a single monolithic decode with the same key."""
        text_tokens = np.asarray(text_tokens)
        if text_tokens.ndim == 1:
            text_tokens = text_tokens[None]
        bos = np.full((1, 1), self.hp.start_speech_token, np.int32)
        embeds = self.prepare_input_embeds(t3_cond, text_tokens, bos)
        T0 = embeds.shape[1]
        Tp = max(32, ((T0 + 31) // 32) * 32)
        embeds = jnp.pad(embeds, ((0, 0), (0, Tp - T0), (0, 0)))
        max_gen = min(max_gen_len, self.hp.max_speech_tokens)
        caches = [
            KVCache(1, self.cfg.n_head, Tp + max_gen + 1,
                    self.cfg.n_embd // self.cfg.n_head, jnp.float32)
            for _ in range(self.cfg.n_layer)
        ]
        if key is None:
            key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        h_last, caches = _turbo_prefill(self, caches, embeds,
                                        jnp.array(T0, jnp.int32))
        hist = jnp.full((1, 128), -1, jnp.int32)
        start = 0
        chunk = max(1, int(chunk_size))
        while start < max_gen:
            out, n, caches, h_last, hist, key, done = _turbo_decode_chunk(
                self, caches, h_last, hist, jnp.array(start, jnp.int32),
                jnp.array(T0, jnp.int32), key, chunk, max_gen, Tp,
                float(temperature), int(top_k), float(top_p),
                float(repetition_penalty))
            n = int(n)
            start += n
            is_final = bool(done) or start >= max_gen
            yield np.asarray(out)[:n], is_final
            if is_final:
                return

    def sanitize(self, weights: dict) -> dict:
        out = {}
        for key, value in weights.items():
            k = key.replace("tfmr.transformer.", "tfmr.")
            out[k] = value
        return out


class _TurboCondEnc(Module):
    """Speaker + raw prompt-speech conditioning, no perceiver/emotion."""

    def __init__(self, hp: T3TurboConfig):
        self.hp = hp
        self.spkr_enc = nn.Linear(hp.speaker_embed_size, hp.n_channels)

    def __call__(self, cond: T3Cond) -> jnp.ndarray:
        B = cond.speaker_emb.shape[0]
        parts = [self.spkr_enc(cond.speaker_emb.reshape(
            B, self.hp.speaker_embed_size))[:, None]]
        if cond.cond_prompt_speech_emb is not None:
            parts.append(cond.cond_prompt_speech_emb)
        return jnp.concatenate(parts, axis=1)


def _build_turbo_s3gen() -> S3Token2Wav:
    """S3Token2Wav with a meanflow estimator
    (reference models/s3gen/s3gen.py:39-180)."""
    gen = S3Token2Wav.__new__(S3Token2Wav)
    from ....codec.models.s3gen.xvector import CAMPPlus

    gen.speaker_encoder = CAMPPlus()
    encoder = UpsampleConformerEncoder(
        input_size=512, output_size=512, attention_heads=8,
        linear_units=2048, num_blocks=6, num_up_blocks=4)
    estimator = ConditionalDecoder(
        in_channels=320, out_channels=80, causal=True, channels=[256],
        attention_head_dim=64, n_blocks=4, num_mid_blocks=12, num_heads=8,
        meanflow=True)
    decoder = CausalConditionalCFM(in_channels=240, cfm_params=CFMParams(),
                                  spk_emb_dim=80, estimator=estimator)
    gen.flow = CausalMaskedDiffWithXvec(encoder=encoder, decoder=decoder,
                                        n_timesteps=2)
    gen.mel2wav = HiFTGenerator(
        sampling_rate=S3GEN_SR, upsample_rates=[8, 5, 3],
        upsample_kernel_sizes=[16, 11, 7],
        source_resblock_kernel_sizes=[7, 7, 11],
        source_resblock_dilation_sizes=[[1, 3, 5]] * 3,
        f0_predictor=ConvRNNF0Predictor())
    n_trim = S3GEN_SR // 50
    fade = (jnp.cos(jnp.linspace(jnp.pi, 0.0, n_trim)) + 1) / 2
    gen._trim_fade = jnp.concatenate([jnp.zeros(n_trim), fade])
    return gen


@dataclass
class ModelConfig:
    model_type: str = "chatterbox_turbo"
    sample_rate: int = S3GEN_SR
    t3_config: Optional[T3TurboConfig] = None
    model_path: Optional[str] = None

    def __post_init__(self):
        if self.t3_config is None:
            self.t3_config = T3TurboConfig()

    @classmethod
    def from_dict(cls, config: dict) -> "ModelConfig":
        t3 = None
        if config.get("t3_config"):
            t3 = T3TurboConfig(**{k: v for k, v in config["t3_config"].items()
                                  if k in T3TurboConfig.__dataclass_fields__})
        return cls(model_type=config.get("model_type", "chatterbox_turbo"),
                   sample_rate=config.get("sample_rate", S3GEN_SR),
                   t3_config=t3, model_path=config.get("model_path"))


class Model(Module):
    """reference chatterbox_turbo.py:101-1304."""

    _RUNTIME: dict = {}

    def __init__(self, config=None):
        if isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        self.config = config or ModelConfig()
        self.sample_rate = self.config.sample_rate
        self.t3 = T3Turbo(self.config.t3_config)
        self.s3gen = _build_turbo_s3gen()
        self.ve = VoiceEncoder()
        self._conds = None

    def set_runtime(self, tokenizer=None, s3_tokenizer=None):
        rt = Model._RUNTIME.setdefault(id(self), {})
        if tokenizer is not None:
            rt["tokenizer"] = tokenizer
        if s3_tokenizer is not None:
            rt["s3_tokenizer"] = s3_tokenizer

    def make_batcher(self, **kwargs):
        """Serving batcher (server entry point): concurrent requests' T3
        decodes run in lock-step; S3Gen vocoding stays per-request."""
        from .batcher import TurboBatcher

        return TurboBatcher(self, **kwargs)

    def _prefill_embeds(self, ids) -> np.ndarray:
        """Host-side prep for the batcher: the (1, T0, D) [cond|text|bos]
        prefill embeddings `inference_turbo` builds (:270-271)."""
        bos = np.full((1, 1), self.t3.hp.start_speech_token, np.int32)
        return np.asarray(
            self.t3.prepare_input_embeds(self._conds.t3, np.asarray(ids),
                                         bos))

    def norm_loudness(self, wav: np.ndarray, sr: int,
                      target_lufs: float = -27.0) -> np.ndarray:
        """BS.1770 loudness normalization of the reference clip
        (reference chatterbox_turbo.py:628-643)."""
        from ....dsp import normalize_loudness

        return np.asarray(normalize_loudness(wav, sr, target_lufs),
                          np.float32)

    def prepare_conditionals(self, ref_wav, sample_rate: Optional[int] = None,
                             exaggeration: float = 0.5,
                             norm_loudness: bool = True, **_):
        from ....utils import resample_audio
        from ..chatterbox.chatterbox import Conditionals

        ref_wav = np.asarray(ref_wav, np.float32).reshape(-1)
        sr = sample_rate or self.sample_rate
        wav_24 = ref_wav if sr == S3GEN_SR else resample_audio(ref_wav, sr,
                                                               S3GEN_SR)
        if norm_loudness:
            wav_24 = self.norm_loudness(wav_24, S3GEN_SR)
        wav_24 = wav_24[: 10 * S3GEN_SR]
        wav_16 = resample_audio(wav_24, S3GEN_SR, S3_SR)

        rt = Model._RUNTIME.setdefault(id(self), {})
        if "s3_tokenizer" not in rt:
            # weights come from the published S3TokenizerV2 repo, not the
            # turbo checkpoint (reference chatterbox_turbo.py:272-310)
            rt["s3_tokenizer"] = S3TokenizerV2.from_pretrained(
                "speech_tokenizer_v2_25hz")
        s3tok = rt["s3_tokenizer"]
        mel, mel_len = padding([np.asarray(log_mel_spectrogram(wav_16))])
        tokens, _ = s3tok.quantize(mel, mel_len)
        gen_ref = self.s3gen.embed_ref(wav_24, S3GEN_SR, tokens)

        plen = self.hp_prompt_len()
        prompt_tokens = jnp.asarray(tokens[:, :plen], jnp.int32)
        prompt_emb = self.t3.speech_emb(prompt_tokens)
        ve_embed = self.ve.embeds_from_wavs([wav_16], sample_rate=S3_SR)
        ve_embed = jnp.mean(ve_embed, axis=0, keepdims=True)
        t3_cond = T3Cond(speaker_emb=ve_embed,
                         cond_prompt_speech_tokens=prompt_tokens,
                         cond_prompt_speech_emb=prompt_emb,
                         emotion_adv=None)
        self._conds = Conditionals(t3_cond, gen_ref)
        return self._conds

    def hp_prompt_len(self):
        return self.t3.hp.speech_cond_prompt_len

    def _tokenize_text(self, text: str) -> np.ndarray:
        """text → (1, T) token ids with SOT/EOT (reference :914-931)."""
        rt = Model._RUNTIME.get(id(self), {})
        if "tokenizer" not in rt:
            # turbo ships an HF tokenizer next to the weights
            # (reference chatterbox_turbo.py:289-297)
            mp = getattr(self.config, "model_path", None)
            if mp:
                from ....utils import load_hf_tokenizer

                rt["tokenizer"] = load_hf_tokenizer(mp)
        if "tokenizer" not in rt:
            raise RuntimeError(
                "Text tokenizer not initialized — call set_runtime() or "
                "load via load_model()")
        tok = rt["tokenizer"]
        if hasattr(tok, "text_to_tokens"):
            raw_ids = tok.text_to_tokens(text)
        else:  # HF tokenizer (reference chatterbox_turbo.py:914-917)
            raw_ids = tok(text, add_special_tokens=False)["input_ids"]
        ids = np.asarray(raw_ids).reshape(1, -1)
        sot, eot = self.t3.hp.start_text_token, self.t3.hp.stop_text_token
        return np.concatenate([np.full((1, 1), sot), ids,
                               np.full((1, 1), eot)], axis=1)

    @staticmethod
    def _split_text(text: str, split_pattern: Optional[str],
                    max_tokens: int) -> list:
        """Sentence-boundary split + greedy packing so each chunk's speech
        tokens stay under max_tokens (reference :862-899: ~8 speech tokens
        per text token, ~4 chars per text token)."""
        import re

        max_chars = (max_tokens // 8) * 4
        if not split_pattern:
            return [text]
        chunks, current = [], ""
        for sentence in re.split(split_pattern, text):
            sentence = sentence.strip()
            if not sentence:
                continue
            if current and len(current) + len(sentence) + 1 > max_chars:
                chunks.append(current)
                current = sentence
            else:
                current = f"{current} {sentence}" if current else sentence
        if current:
            chunks.append(current)
        return chunks or [text]

    def _filter_speech_tokens(self, tokens: np.ndarray,
                              n_silence: int = 3) -> np.ndarray:
        """Drop OOV tokens and append trailing silence (reference :938-943)."""
        tokens = np.asarray(tokens).reshape(-1)
        tokens = tokens[tokens < min(SPEECH_VOCAB_SIZE,
                                     self.t3.hp.start_speech_token)]
        if n_silence:
            tokens = np.concatenate(
                [tokens, np.full(n_silence, S3GEN_SIL, tokens.dtype)])
        return tokens

    def _synthesize(self, tokens: np.ndarray, key) -> np.ndarray:
        """speech tokens → waveform via meanflow CFM (2 steps) + HiFT."""
        mels, _ = self.s3gen.flow.inference(
            token=jnp.asarray(tokens[None], jnp.int32),
            token_len=jnp.asarray([tokens.shape[0]], jnp.int32),
            prompt_token=jnp.asarray(self._conds.gen["prompt_token"],
                                     jnp.int32),
            prompt_token_len=jnp.asarray(
                self._conds.gen["prompt_token_len"], jnp.int32),
            prompt_feat=jnp.asarray(self._conds.gen["prompt_feat"]),
            embedding=jnp.asarray(self._conds.gen["embedding"]),
            n_timesteps=2, meanflow=True)
        wav, _ = self.s3gen.hift_inference(mels, key=key)
        return np.asarray(wav).reshape(-1)

    @staticmethod
    def _warn_unsupported(cfg_weight: float, exaggeration: float,
                          min_p: float) -> None:
        if cfg_weight > 0.0 or exaggeration > 0.0 or min_p > 0.0:
            import logging

            logging.getLogger(__name__).warning(
                "CFG, min_p and exaggeration are not supported by the Turbo "
                "version and will be ignored.")

    def _result(self, wav, start, segment_idx, token_count, total_samples):
        elapsed = time.time() - start
        dur = len(wav) / self.sample_rate
        total_dur = total_samples / self.sample_rate
        return GenerationResult(
            audio=wav, samples=len(wav), sample_rate=self.sample_rate,
            segment_idx=segment_idx, token_count=token_count,
            audio_duration=format_duration(dur),
            real_time_factor=round(elapsed / max(total_dur, 1e-9), 2),
            prompt={"tokens": token_count},
            audio_samples={"samples-per-sec":
                           round(total_samples / max(elapsed, 1e-9), 2)},
            processing_time_seconds=elapsed, peak_memory_usage=0.0)

    def generate(self, text: str, ref_audio=None,
                 sample_rate: Optional[int] = None,
                 temperature: float = 0.8, top_k: int = 1000,
                 top_p: float = 0.95, repetition_penalty: float = 1.2,
                 min_p: float = 0.0, exaggeration: float = 0.0,
                 cfg_weight: float = 0.0, norm_loudness: bool = True,
                 stream: bool = False, streaming_interval: float = 2.0,
                 split_pattern: Optional[str] = r"(?<=[.!?])\s+",
                 max_tokens: int = 800, seed: Optional[int] = None,
                 **kwargs) -> Generator[GenerationResult, None, None]:
        """reference chatterbox_turbo.py:775-1011."""
        if stream:
            # ~40 ms of audio per speech token (25 Hz), reference :820-840
            yield from self.stream_generate(
                text, ref_audio=ref_audio, sample_rate=sample_rate,
                temperature=temperature, top_k=top_k, top_p=top_p,
                repetition_penalty=repetition_penalty, min_p=min_p,
                exaggeration=exaggeration, cfg_weight=cfg_weight,
                norm_loudness=norm_loudness,
                chunk_size=max(10, int(streaming_interval * 25)),
                split_pattern=split_pattern, max_tokens=max_tokens,
                seed=seed)
            return

        start = time.time()
        if ref_audio is not None:
            self.prepare_conditionals(ref_audio, sample_rate,
                                      exaggeration=exaggeration,
                                      norm_loudness=norm_loudness)
        if self._conds is None:
            raise ValueError("prepare_conditionals first or pass ref_audio")
        self._warn_unsupported(cfg_weight, exaggeration, min_p)

        text = punc_norm(text)
        key = (jax.random.PRNGKey(seed) if seed is not None
               else jax.random.PRNGKey(np.random.randint(0, 2**31 - 1)))
        total_samples = 0
        for segment_idx, chunk in enumerate(
                self._split_text(text, split_pattern, max_tokens)):
            ids = self._tokenize_text(chunk)
            key, k1, k2 = jax.random.split(key, 3)
            # under a running server a TurboBatcher may be installed:
            # concurrent requests' T3 decodes then run in lock-step
            from ....serving import get_infer_hook

            hook = get_infer_hook(self)
            if hook is not None:
                tokens = hook.submit(
                    self._prefill_embeds(ids), max_tokens=max_tokens,
                    temperature=temperature, top_k=top_k, top_p=top_p,
                    repetition_penalty=repetition_penalty,
                    seed=int(np.asarray(k1).reshape(-1)[-1]),
                ).result()[None]
            else:
                tokens = self.t3.inference_turbo(
                    self._conds.t3, ids, temperature=temperature,
                    top_k=top_k, top_p=top_p,
                    repetition_penalty=repetition_penalty,
                    max_gen_len=max_tokens, key=k1)
            tokens = self._filter_speech_tokens(tokens)
            if tokens.size <= 3:
                raise RuntimeError("T3 turbo produced no valid speech tokens")
            wav = self._synthesize(tokens, k2)
            total_samples += len(wav)
            yield self._result(wav, start, segment_idx, int(ids.shape[1]),
                               total_samples)

    def stream_generate(self, text: str, ref_audio=None,
                        sample_rate: Optional[int] = None,
                        temperature: float = 0.8, top_k: int = 1000,
                        top_p: float = 0.95, repetition_penalty: float = 1.2,
                        min_p: float = 0.0, exaggeration: float = 0.0,
                        cfg_weight: float = 0.0, norm_loudness: bool = True,
                        chunk_size: int = 40,
                        split_pattern: Optional[str] = r"(?<=[.!?])\s+",
                        max_tokens: int = 800, seed: Optional[int] = None,
                        **kwargs) -> Generator[GenerationResult, None, None]:
        """Streaming synthesis (reference chatterbox_turbo.py:1013-1300):
        every `chunk_size` new speech tokens, the full accumulated prefix is
        re-synthesized (the reference's inference_stream does the same) and
        only the samples past what was already emitted are yielded; the HiFT
        noise key is held fixed per text chunk so the prefix is identical
        across re-syntheses."""
        start = time.time()
        if ref_audio is not None:
            self.prepare_conditionals(ref_audio, sample_rate,
                                      exaggeration=exaggeration,
                                      norm_loudness=norm_loudness)
        if self._conds is None:
            raise ValueError("prepare_conditionals first or pass ref_audio")
        self._warn_unsupported(cfg_weight, exaggeration, min_p)

        text = punc_norm(text)
        key = (jax.random.PRNGKey(seed) if seed is not None
               else jax.random.PRNGKey(np.random.randint(0, 2**31 - 1)))
        segment_idx = 0
        global_samples = 0
        from ....serving import get_infer_hook

        hook = get_infer_hook(self)
        for chunk in self._split_text(text, split_pattern, max_tokens):
            ids = self._tokenize_text(chunk)
            key, k1, k2 = jax.random.split(key, 3)
            acc = np.zeros(0, np.int32)
            prev_samples = 0
            if hook is not None:
                # batched + streaming: tokens arrive through `on_frame` as
                # the batcher's fused ticks complete; regroup into
                # chunk_size chunks so the prefix re-synthesis below
                # matches the single-stream streaming loop
                token_src = self._hook_stream_chunks(
                    hook, ids, chunk_size, max_tokens, temperature, top_k,
                    top_p, repetition_penalty,
                    int(np.asarray(k1).reshape(-1)[-1]))
            else:
                token_src = self.t3.inference_turbo_stream(
                    self._conds.t3, ids, temperature=temperature,
                    top_k=top_k, top_p=top_p,
                    repetition_penalty=repetition_penalty,
                    chunk_size=chunk_size, max_gen_len=max_tokens, key=k1)
            for new_tokens, is_final in token_src:
                acc = np.concatenate([acc, np.asarray(new_tokens, np.int32)])
                tokens = self._filter_speech_tokens(
                    acc, n_silence=5 if is_final else 0)
                if tokens.size == 0:
                    continue
                wav = self._synthesize(tokens, k2)
                if prev_samples < len(wav):
                    new_wav = wav[prev_samples:]
                    prev_samples = len(wav)
                    global_samples += len(new_wav)
                    yield self._result(new_wav, start, segment_idx,
                                       int(ids.shape[1]), global_samples)
                segment_idx += 1

    def _hook_stream_chunks(self, hook, ids, chunk_size, max_tokens,
                            temperature, top_k, top_p, repetition_penalty,
                            seed):
        """(new_tokens, is_final) chunks from an installed TurboBatcher —
        same contract as `T3Turbo.inference_turbo_stream`."""
        from ....serving import stream_chunks

        it = stream_chunks(
            hook.submit, self._prefill_embeds(ids), chunk_size=chunk_size,
            callback_kw="on_frame", max_tokens=max_tokens,
            temperature=temperature, top_k=top_k, top_p=top_p,
            repetition_penalty=repetition_penalty, seed=seed)
        prev = None
        for c in it:
            if prev is not None:
                yield np.asarray(prev, np.int32), False
            prev = c
        yield (np.asarray(prev, np.int32) if prev is not None
               else np.zeros(0, np.int32)), True

    def sanitize(self, weights: dict) -> dict:
        """Turbo checkpoints keep flow parts at the s3gen top level
        (reference models/s3gen/s3gen.py:39-109) — nest them under flow."""
        out = {}
        flow_parts = ("input_embedding.", "spk_embed_affine_layer.",
                      "encoder.", "encoder_proj.", "decoder.")
        for key, value in weights.items():
            k = key
            if k.startswith("t3."):
                k = "t3." + self.t3.sanitize({k[3:]: value}).popitem()[0]
            for part in flow_parts:
                if k.startswith(f"s3gen.{part}"):
                    k = f"s3gen.flow.{k[len('s3gen.'):]}"
                    break
            out[k] = value
        return out

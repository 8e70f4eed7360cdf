"""Chatterbox TTS: T3 speech-token LM + S3Gen (flow + HiFT) + voice encoder.

TPU-native re-implementation of the reference
mlx_audio/tts/models/chatterbox/chatterbox.py:42-982. The T3 decode runs as
one on-device while_loop (CFG pair batched); S3Gen reuses the shared S3Gen
subsystem (codec/models/s3gen).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Generator, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....codec.models.s3gen import S3_SR, S3GEN_SR, S3Token2Wav
from ....codec.models.s3tokenizer import (
    SPEECH_VOCAB_SIZE,
    S3TokenizerV2,
    log_mel_spectrogram,
    padding,
)
from ....nn.module import Module
from ....utils import resample_audio
from ..base import GenerationResult, format_duration
from .config import ModelConfig, T3Config
from .t3 import T3, T3Cond
from .tokenizer import EnTokenizer, MTLTokenizer
from .voice_encoder import VoiceEncoder

__all__ = ["Model", "Conditionals", "punc_norm", "drop_invalid_tokens"]


def punc_norm(text: str) -> str:
    """LLM-punctuation cleanup (reference chatterbox.py:73-116)."""
    if len(text) == 0:
        return "You need to add some text for me to talk."
    if text[0].islower():
        text = text[0].upper() + text[1:]
    text = " ".join(text.split())
    for old, new in [("...", ", "), ("…", ", "), (":", ","), (" - ", ", "),
                     (";", ", "), ("—", "-"), ("–", "-"), (" ,", ","),
                     ("“", '"'), ("”", '"'), ("‘", "'"), ("’", "'")]:
        text = text.replace(old, new)
    text = text.rstrip(" ")
    if not any(text.endswith(p) for p in {".", "!", "?", "-", ","}):
        text += "."
    return text


def drop_invalid_tokens(x: np.ndarray, sos: int = SPEECH_VOCAB_SIZE,
                        eos: int = SPEECH_VOCAB_SIZE + 1) -> np.ndarray:
    """Keep tokens strictly between SOS (6561) and EOS (6562)
    (reference chatterbox.py:118-147)."""
    x = np.asarray(x).reshape(-1)
    s = int(np.argmax(x == sos)) + 1 if (x == sos).any() else 0
    e = int(np.argmax(x == eos)) if (x == eos).any() else len(x)
    x = x[s:e]
    return x[x < sos]


@dataclass
class Conditionals:
    """T3 + S3Gen conditioning (reference chatterbox.py:150-168)."""

    t3: T3Cond
    gen: dict


class Model(Module):
    """reference chatterbox.py:171-982."""

    _RUNTIME: dict = {}

    def __init__(self, config: Optional[ModelConfig] = None):
        if isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        self.config = config or ModelConfig()
        self.sample_rate = S3GEN_SR
        self.t3 = T3(self.config.t3_config)
        self.s3gen = S3Token2Wav()
        self.ve = VoiceEncoder()
        self.conds: Optional[Conditionals] = None

    # ------------------------------------------------------------------
    def set_runtime(self, tokenizer=None, mtl_tokenizer=None,
                    s3_tokenizer=None):
        rt = Model._RUNTIME.setdefault(id(self), {})
        if tokenizer is not None:
            rt["tokenizer"] = tokenizer
        if mtl_tokenizer is not None:
            rt["mtl_tokenizer"] = mtl_tokenizer
        if s3_tokenizer is not None:
            rt["s3_tokenizer"] = s3_tokenizer

    def _runtime(self, name, default_factory=None):
        rt = Model._RUNTIME.setdefault(id(self), {})
        if name not in rt and default_factory is not None:
            rt[name] = default_factory()
        if name not in rt:
            raise RuntimeError(
                f"Chatterbox runtime component '{name}' not loaded — call "
                "set_runtime() or load from a pretrained path.")
        return rt[name]

    def post_load_hook(self, model_path):
        """Attach tokenizers found next to the weights
        (reference chatterbox.py:567-667)."""
        from pathlib import Path

        path = Path(model_path)
        tok = path / "tokenizer.json"
        if tok.exists():
            try:
                self.set_runtime(tokenizer=EnTokenizer(tok))
            except Exception:  # multilingual vocab
                self.set_runtime(mtl_tokenizer=MTLTokenizer(tok))
        return self

    def make_batcher(self, **kwargs):
        """Serving batcher: concurrent requests' T3 CFG decodes run in
        lock-step (each slot owns a cond/uncond cache-row pair); voice
        conditioning and S3Gen vocoding stay per-request."""
        from .batcher import T3Batcher

        return T3Batcher(self, **kwargs)

    # ------------------------------------------------------------------
    def prepare_conditionals(self, ref_wav, ref_sr: int,
                             exaggeration: float = 0.5) -> Conditionals:
        """reference chatterbox.py:669-760."""
        ref_wav = np.asarray(ref_wav, np.float32).reshape(-1)
        wav_24 = (ref_wav if ref_sr == S3GEN_SR
                  else resample_audio(ref_wav, ref_sr, S3GEN_SR))
        wav_24 = wav_24[: self.config.dec_cond_len]
        wav_16_from_24 = resample_audio(wav_24, S3GEN_SR, S3_SR)
        wav_16_full = (ref_wav if ref_sr == S3_SR
                       else resample_audio(ref_wav, ref_sr, S3_SR))
        wav_16 = wav_16_full[: self.config.enc_cond_len]

        # pretrained weights live in a separate published repo, not the
        # chatterbox checkpoint (reference chatterbox.py:228-229,262)
        s3tok = self._runtime(
            "s3_tokenizer",
            default_factory=lambda: S3TokenizerV2.from_pretrained(
                "speech_tokenizer_v2_25hz"))
        mel, mel_len = padding([np.asarray(log_mel_spectrogram(wav_16_from_24))])
        s3gen_tokens, _ = s3tok.quantize(mel, mel_len)
        gen_ref = self.s3gen.embed_ref(wav_24, S3GEN_SR, s3gen_tokens)

        t3_mel, t3_mel_len = padding([np.asarray(log_mel_spectrogram(wav_16))])
        t3_tokens, _ = s3tok.quantize(t3_mel, t3_mel_len)
        plen = self.t3.hp.speech_cond_prompt_len
        t3_tokens = t3_tokens[:, :plen]

        ve_embed = self.ve.embeds_from_wavs([wav_16_full], sample_rate=S3_SR)
        ve_embed = jnp.mean(ve_embed, axis=0, keepdims=True)

        t3_cond = T3Cond(
            speaker_emb=ve_embed,
            cond_prompt_speech_tokens=jnp.asarray(t3_tokens, jnp.int32),
            emotion_adv=jnp.ones((1, 1, 1)) * exaggeration,
        )
        return Conditionals(t3_cond, gen_ref)

    # ------------------------------------------------------------------
    def generate(
        self,
        text: str,
        ref_audio=None,
        audio_prompt=None,
        audio_prompt_sr: Optional[int] = None,
        conds: Optional[Conditionals] = None,
        exaggeration: float = 0.1,  # generate default (reference :773)
        cfg_weight: float = 0.5,
        temperature: float = 0.8,
        repetition_penalty: float = 1.2,
        min_p: float = 0.05,
        top_p: float = 1.0,
        max_new_tokens: int = 1000,
        lang_code: str = "en",
        seed: Optional[int] = None,
        max_tokens: Optional[int] = None,
        **kwargs,
    ) -> Generator[GenerationResult, None, None]:
        """reference chatterbox.py:767-982. `voice`/`speed`/`stream` are
        accepted-and-ignored there (:807-813); `max_tokens` aliases
        max_new_tokens (:826-827)."""
        start = time.time()
        if max_tokens is not None and max_new_tokens == 1000:
            max_new_tokens = max_tokens
        if audio_prompt is None and ref_audio is not None:
            audio_prompt = ref_audio
            audio_prompt_sr = audio_prompt_sr or self.sample_rate
        if conds is None:
            if audio_prompt is not None:
                conds = self.prepare_conditionals(audio_prompt,
                                                  audio_prompt_sr,
                                                  exaggeration)
            elif self.conds is not None:
                conds = self.conds
            else:
                raise ValueError("Reference audio is required for "
                                 "Chatterbox voice cloning.")

        text = punc_norm(text)
        rt = Model._RUNTIME.get(id(self), {})
        if lang_code == "en" and "tokenizer" in rt:
            text_tokens = rt["tokenizer"].text_to_tokens(text)
        elif "mtl_tokenizer" in rt:
            text_tokens = rt["mtl_tokenizer"].text_to_tokens(
                text, language_id=lang_code)
        else:
            raise RuntimeError("Text tokenizer not initialized — call "
                               "set_runtime() or post_load_hook().")
        token_count = int(np.asarray(text_tokens).shape[-1])

        sot = self.t3.hp.start_text_token
        eot = self.t3.hp.stop_text_token
        ids = np.asarray(text_tokens).reshape(1, -1)
        ids = np.concatenate([np.full((1, 1), sot), ids,
                              np.full((1, 1), eot)], axis=1)

        key = (jax.random.PRNGKey(seed) if seed is not None
               else jax.random.PRNGKey(np.random.randint(0, 2**31 - 1)))
        k1, k2 = jax.random.split(key)
        # Under a running server a T3Batcher may be installed: concurrent
        # requests' CFG decodes then run in lock-step (paired cache rows).
        from ....serving import get_infer_hook

        hook = get_infer_hook(self)
        if hook is not None:
            embeds = self.t3.build_prefill_embeds(conds.t3, ids, cfg_on=True)
            toks = hook.submit(
                np.asarray(embeds, np.float32),
                max_tokens=max_new_tokens, temperature=temperature,
                top_p=top_p, min_p=min_p,
                repetition_penalty=repetition_penalty,
                cfg_weight=cfg_weight,
                seed=(seed if seed is not None
                      else int(np.random.randint(0, 2**31 - 1)))).result()
            speech_tokens = np.asarray(toks, np.int32)[None]
        else:
            speech_tokens = self.t3.inference(
                t3_cond=conds.t3, text_tokens=ids,
                max_new_tokens=max_new_tokens, temperature=temperature,
                cfg_weight=cfg_weight, repetition_penalty=repetition_penalty,
                min_p=min_p, top_p=top_p, key=k1)

        tokens = drop_invalid_tokens(speech_tokens,
                                     sos=self.t3.hp.start_speech_token,
                                     eos=self.t3.hp.stop_speech_token)
        if tokens.size == 0:
            raise RuntimeError("T3 produced no valid speech tokens")
        wav = self.s3gen(tokens[None], ref_dict=conds.gen, finalize=True,
                         key=k2)
        wav = np.asarray(wav).reshape(-1)

        elapsed = time.time() - start
        dur = len(wav) / self.sample_rate
        yield GenerationResult(
            audio=wav, samples=len(wav), sample_rate=self.sample_rate,
            segment_idx=0, token_count=token_count,
            audio_duration=format_duration(dur),
            real_time_factor=round(elapsed / max(dur, 1e-9), 2),
            prompt={"tokens": token_count,
                    "tokens-per-sec": round(token_count / max(elapsed, 1e-9),
                                            2)},
            audio_samples={"samples": len(wav),
                           "samples-per-sec":
                           round(len(wav) / max(elapsed, 1e-9), 2)},
            processing_time_seconds=elapsed,
            peak_memory_usage=0.0,
        )

    def sanitize(self, weights: dict) -> dict:
        """Split by component prefix (reference chatterbox.py:223-400)."""
        t3_w, ve_w, gen_w, rest = {}, {}, {}, {}
        for key, value in weights.items():
            if key.startswith("t3."):
                t3_w[key[3:]] = value
            elif key.startswith("ve."):
                ve_w[key[3:]] = value
            elif key.startswith("s3gen."):
                gen_w[key[6:]] = value
            else:
                rest[key] = value
        out = dict(rest)
        out.update({f"t3.{k}": v for k, v in self.t3.sanitize(t3_w).items()})
        out.update({f"ve.{k}": v for k, v in self.ve.sanitize(ve_w).items()})
        out.update({f"s3gen.{k}": v for k, v in gen_w.items()})
        return out

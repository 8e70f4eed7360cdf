"""Soprano TTS — Qwen3 LM whose hidden states drive a Vocos-style ISTFT
decoder (no discrete audio codec).

Behavioral spec: reference tts/models/soprano/soprano.py (Model :76,
stream_generate :303, generate :362) and decoder.py (VocosBackbone +
ISTFTHead, 4x linear upscale of LM hidden states). TPU-first: the decode
loop runs on device collecting BOTH sampled tokens and hidden states in a
fixed buffer (one dispatch per sentence), then the decoder turns the hidden
sequence into a waveform in a second jitted program.
"""

from __future__ import annotations

import re
import time
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....lm.transformer import CausalLM, LMConfig
from ....nn import Linear, Module
from ....dsp import hanning, istft
from ...models.interpolate import interpolate
from ..base import GenerationResult, format_duration

__all__ = ["Model", "ModelConfig", "SopranoDecoder"]


@dataclass
class DecoderConfig(BaseModelArgs):
    decoder_num_layers: int = 8
    decoder_dim: int = 768
    decoder_intermediate_dim: int = 2304
    hop_length: int = 512
    n_fft: int = 2048
    upscale: int = 4
    input_kernel: int = 1
    dw_kernel: int = 3
    token_size: int = 2048
    receptive_field: int = 4


@dataclass
class ModelConfig(LMConfig):
    model_type: str = "qwen3"
    sample_rate: int = 32000
    decoder_config: DecoderConfig = None
    model_path: str = ""

    def __post_init__(self):
        super().__post_init__()
        if self.decoder_config is None:
            self.decoder_config = DecoderConfig()
        elif isinstance(self.decoder_config, dict):
            self.decoder_config = DecoderConfig.from_dict(self.decoder_config)
        if self.model_path and "soprano-1.1" not in self.model_path.lower():
            self.decoder_config.decoder_dim = 512
            self.decoder_config.decoder_intermediate_dim = 1536
            self.decoder_config.input_kernel = 3


class ISTFTHead(Module):
    def __init__(self, dim: int, n_fft: int, hop_length: int):
        self.out = Linear(dim, n_fft + 2)
        self.n_fft = n_fft
        self.hop_length = hop_length

    def __call__(self, x):
        h = jnp.swapaxes(self.out(x), 1, 2)
        mag, p = jnp.split(h, 2, axis=1)
        mag = jnp.clip(jnp.exp(mag), None, 1e2)
        S = jax.lax.complex(mag * jnp.cos(p), mag * jnp.sin(p))
        return istft(
            S, hop_length=self.hop_length, win_length=self.n_fft,
            window=hanning(self.n_fft), normalized=True,
        )


class SopranoDecoder(Module):
    def __init__(self, num_input_channels=2048, decoder_num_layers=8,
                 decoder_dim=768, decoder_intermediate_dim=2304, hop_length=512,
                 n_fft=2048, upscale=4, input_kernel=1, dw_kernel=3):
        from ....codec.models.vocos.vocos import VocosBackbone

        self.decoder = VocosBackbone(
            input_channels=num_input_channels, dim=decoder_dim,
            intermediate_dim=decoder_intermediate_dim,
            num_layers=decoder_num_layers, input_kernel_size=input_kernel,
            dw_kernel_size=dw_kernel,
        )
        self.head = ISTFTHead(decoder_dim, n_fft, hop_length)
        self.upscale = upscale

    def __call__(self, x):
        # x: (B, L, C) LM hidden states
        xt = jnp.swapaxes(x, 1, 2)
        target = self.upscale * (x.shape[1] - 1) + 1
        xt = interpolate(xt, size=target, mode="linear", align_corners=True)
        h = self.decoder(jnp.swapaxes(xt, 1, 2))
        return self.head(h)


@partial(
    jax.jit,
    static_argnames=("max_tokens", "temp", "top_p", "eos1", "eos2"),
    donate_argnames=("caches",),
)
def _decode_with_hidden(lm: CausalLM, caches, prompt, key, max_tokens: int,
                        temp: float, top_p: float, eos1: int, eos2: int):
    """AR loop collecting hidden states: returns (hidden (1, max+1, D), n)."""
    from ....lm.sample import top_p_filter

    D = lm.config.hidden_size
    h_all, caches = lm.model(prompt, caches)
    logits = (
        lm.lm_head(h_all[:, -1:])
        if hasattr(lm, "lm_head")
        else lm.model.embed_tokens.as_linear(h_all[:, -1:])
    )[:, -1].astype(jnp.float32)
    hidden = jnp.zeros((1, max_tokens + 1, D), h_all.dtype)
    hidden = hidden.at[:, 0].set(h_all[:, -1])

    def cond(s):
        i, _, _, _, done, _ = s
        return (i < max_tokens) & ~done

    def body(s):
        i, caches, logits, hidden, done, key = s
        key, sub = jax.random.split(key)
        if temp == 0.0:
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            x = logits / temp
            if top_p < 1.0:
                x = top_p_filter(x, top_p)
            tok = jax.random.categorical(sub, x, axis=-1).astype(jnp.int32)
        done = done | (tok[0] == eos1) | (tok[0] == eos2)
        h, caches = lm.model(tok[:, None], caches)
        new_logits = (
            lm.lm_head(h) if hasattr(lm, "lm_head")
            else lm.model.embed_tokens.as_linear(h)
        )[:, -1].astype(jnp.float32)
        i = jnp.where(done, i, i + 1)
        hidden = jnp.where(
            done, hidden, jax.lax.dynamic_update_slice(hidden, h, (0, i, 0))
        )
        return i, caches, new_logits, hidden, done, key

    state = (0, caches, logits, hidden, jnp.array(False), key)
    n, caches, logits, hidden, done, key = jax.lax.while_loop(cond, body, state)
    return hidden, n


@jax.jit
def _decode_audio(model: "Model", hidden):
    return model.decoder(hidden)


class Model(Module):
    _tokenizer = None

    def __init__(self, config: ModelConfig, tokenizer=None):
        if isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        self.config = config
        self.language_model = CausalLM(config)
        dc = config.decoder_config
        self.decoder = SopranoDecoder(
            num_input_channels=config.hidden_size,
            decoder_num_layers=dc.decoder_num_layers,
            decoder_dim=dc.decoder_dim,
            decoder_intermediate_dim=dc.decoder_intermediate_dim,
            hop_length=dc.hop_length, n_fft=dc.n_fft, upscale=dc.upscale,
            input_kernel=dc.input_kernel, dw_kernel=dc.dw_kernel,
        )
        if tokenizer is not None:
            Model._tokenizer = tokenizer

    @property
    def sample_rate(self):
        return self.config.sample_rate

    def make_batcher(self, **kwargs):
        """Serving batcher: concurrent sentence decodes (token sampling +
        hidden-state collection) run in lock-step; the vocoder decode
        stays per-request."""
        from .batcher import SopranoBatcher

        return SopranoBatcher(self, **kwargs)

    @property
    def tokenizer(self):
        if Model._tokenizer is None:
            from transformers import AutoTokenizer

            Model._tokenizer = AutoTokenizer.from_pretrained(self.config.model_path)
        return Model._tokenizer

    @classmethod
    def post_load_hook(cls, model, model_path):
        model.config.model_path = str(model_path)
        return model

    def _stop_ids(self):
        tok = self.tokenizer
        stop = tok.encode("[STOP]", add_special_tokens=False)
        s1 = tok.pad_token_id if tok.pad_token_id is not None else (
            stop[0] if stop else -1
        )
        s2 = tok.eos_token_id if tok.eos_token_id is not None else -1
        return int(s1), int(s2)

    @staticmethod
    def _clean_text(text: str) -> str:
        # full cleaning pipeline the checkpoint was trained on
        # (reference soprano/text.py:324-343)
        from .text import clean_text

        return clean_text(text)

    def _sentences(self, text: str):
        parts = re.split(r"(?<=[.!?])\s+", self._clean_text(text))
        return [p for p in parts if p.strip()]

    def generate(self, text: str, voice: Optional[str] = None,
                 temperature: float = 0.3, top_p: float = 0.95,
                 split_pattern: str = "\n", max_tokens: int = 512,
                 verbose: bool = False, **kwargs):
        prompts = text.replace("\\n", "\n").split(split_pattern)
        s1, s2 = self._stop_ids()
        for segment_idx, segment in enumerate(p for p in prompts if p.strip()):
            t0 = time.perf_counter()
            pcm = []
            n_toks = 0
            # Under a running server a SopranoBatcher may be installed:
            # concurrent requests' hidden-collecting decodes then run in
            # lock-step.
            from ....serving import get_infer_hook

            hook = get_infer_hook(self)
            for sentence in self._sentences(segment):
                prompt = f"[STOP][TEXT]{sentence}[START]"
                ids = self.tokenizer.encode(prompt, add_special_tokens=False)
                if hook is not None:
                    hid = hook.submit(
                        ids, max_tokens=max_tokens, temperature=temperature,
                        top_p=top_p, stop_ids=(s1, s2)).result()
                    if hid.shape[0] < 2:
                        continue
                    audio = _decode_audio(self, jnp.asarray(hid)[None])
                    pcm.append(
                        np.asarray(jax.device_get(audio)).reshape(-1))
                    n_toks += hid.shape[0] - 1
                    continue
                caches = self.language_model.make_caches(
                    1, max_len=len(ids) + max_tokens + 1, dtype=jnp.float32
                )
                hidden, n = _decode_with_hidden(
                    self.language_model, caches,
                    jnp.asarray([ids], jnp.int32), jax.random.PRNGKey(0),
                    max_tokens, float(temperature), float(top_p), s1, s2,
                )
                n = int(jax.device_get(n))
                if n + 1 < 2:
                    continue
                audio = _decode_audio(self, hidden[:, : n + 1])
                pcm.append(np.asarray(jax.device_get(audio)).reshape(-1))
                n_toks += n
            if not pcm:
                continue
            audio = np.concatenate(pcm)
            elapsed = time.perf_counter() - t0
            dur = len(audio) / self.sample_rate
            yield GenerationResult(
                audio=audio, samples=len(audio), sample_rate=self.sample_rate,
                segment_idx=segment_idx, token_count=n_toks,
                audio_duration=format_duration(dur),
                real_time_factor=round(elapsed / dur, 3) if dur else 0.0,
                prompt={"tokens": n_toks,
                        "tokens-per-sec": round(n_toks / elapsed, 2)},
                audio_samples={"samples": len(audio),
                               "samples-per-sec": round(len(audio) / elapsed, 2)},
                processing_time_seconds=elapsed,
                peak_memory_usage=0.0,
            )

    def sanitize(self, weights: dict) -> dict:
        from ....nn.sanitize import orient_weights_to_model

        out = {}
        for k, v in weights.items():
            # LM keys: model.* → language_model.model.*
            if k.startswith("model."):
                k = "language_model." + k
            elif k.startswith("lm_head."):
                k = "language_model." + k
            out[k] = v
        return orient_weights_to_model(self, out)

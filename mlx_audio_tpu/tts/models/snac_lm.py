"""Shared base for SNAC-token AR TTS models (Orpheus / VyvoTTS).

Behavioral spec: reference tts/models/llama/llama.py and tts/models/qwen3/
qwen3.py — an LLM generates flat 7-token SNAC frames
(layer1, layer2, layer3, layer3, layer2, layer3, layer3 with per-slot
codebook offsets); audio is decoded by the 24 kHz SNAC codec. Decode runs
through the on-device generation loop (one dispatch per segment).
"""

from __future__ import annotations

import time
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...lm import CausalLM, generate_tokens
from .base import GenerationResult, format_duration

__all__ = ["SnacARModel", "codes_to_layers", "layers_to_codes"]


def codes_to_layers(code_list: List[int], codebook_size: int = 4096):
    """Flat 7-per-frame code list → 3 SNAC layers (reference llama.py:57)."""
    n = (len(code_list) + 1) // 7
    l1, l2, l3 = [], [], []
    for i in range(n):
        l1.append(code_list[7 * i])
        l2.append(code_list[7 * i + 1] - codebook_size)
        l3.append(code_list[7 * i + 2] - 2 * codebook_size)
        l3.append(code_list[7 * i + 3] - 3 * codebook_size)
        l2.append(code_list[7 * i + 4] - 4 * codebook_size)
        l3.append(code_list[7 * i + 5] - 5 * codebook_size)
        l3.append(code_list[7 * i + 6] - 6 * codebook_size)
    return [
        jnp.asarray(l1, jnp.int32)[None],
        jnp.asarray(l2, jnp.int32)[None],
        jnp.asarray(l3, jnp.int32)[None],
    ]


def layers_to_codes(layers, codebook_size: int = 4096) -> List[int]:
    """Inverse of codes_to_layers (for voice cloning prompts)."""
    l1 = np.asarray(layers[0]).reshape(-1).tolist()
    l2 = np.asarray(layers[1]).reshape(-1).tolist()
    l3 = np.asarray(layers[2]).reshape(-1).tolist()
    out = []
    for i in range(len(l1)):
        out += [
            l1[i],
            l2[2 * i] + codebook_size,
            l3[4 * i] + 2 * codebook_size,
            l3[4 * i + 1] + 3 * codebook_size,
            l2[2 * i + 1] + 4 * codebook_size,
            l3[4 * i + 2] + 5 * codebook_size,
            l3[4 * i + 3] + 6 * codebook_size,
        ]
    return out


class SnacARModel(CausalLM):
    """LLM over SNAC audio tokens. Subclasses set the special-token layout."""

    # special token ids — overridden per family
    START_OF_HUMAN: int
    END_OF_TEXT: int
    END_OF_HUMAN: int
    START_OF_AI: int = None
    START_OF_SPEECH: int
    END_OF_SPEECH: int
    END_OF_AI: int = None
    AUDIO_TOKENS_START: int
    SNAC_REPO: str = "mlx-community/snac_24khz"

    _tokenizer = None
    _codec = None

    @property
    def sample_rate(self) -> int:
        return getattr(self.config, "sample_rate", 24000)

    # ---- injectable host-side deps (tokenizer, codec) ----

    @property
    def tokenizer(self):
        if type(self)._tokenizer is None:
            from transformers import AutoTokenizer

            name = getattr(self.config, "tokenizer_name", None) or getattr(
                self.config, "model_path", None
            )
            type(self)._tokenizer = AutoTokenizer.from_pretrained(name)
        return type(self)._tokenizer

    @property
    def codec(self):
        if type(self)._codec is None:
            from ...codec.models import SNAC

            type(self)._codec = SNAC.from_pretrained(self.SNAC_REPO)
        return type(self)._codec

    def set_runtime(self, tokenizer=None, codec=None):
        if tokenizer is not None:
            type(self)._tokenizer = tokenizer
        if codec is not None:
            type(self)._codec = codec

    # ---- prompt construction ----

    def prepare_input_ids(self, prompt: str, voice: Optional[str] = None,
                          zeroprompt: Optional[List[int]] = None) -> List[int]:
        if voice is not None and zeroprompt is None:
            prompt = f"{voice}: {prompt}"
        text_ids = list(self.tokenizer(prompt).input_ids)
        ids = [self.START_OF_HUMAN] + text_ids + [self.END_OF_TEXT, self.END_OF_HUMAN]
        if zeroprompt:
            ids = list(zeroprompt) + ids
        return ids

    def prepare_zeroprompt(self, ref_audio, ref_text: str) -> List[int]:
        """Voice-cloning prefix: [SOH][ref text][EOT EOH][SOA SOS][codes][EOS EOA]."""
        audio = np.asarray(ref_audio, np.float32).reshape(1, 1, -1)
        layers = self.codec.encode(audio)
        codes = [c + self.AUDIO_TOKENS_START for c in layers_to_codes(layers)]
        text_ids = list(self.tokenizer(ref_text).input_ids)
        soa = self.START_OF_AI if self.START_OF_AI is not None else self.START_OF_SPEECH
        eoa = self.END_OF_AI if self.END_OF_AI is not None else self.END_OF_SPEECH
        return (
            [self.START_OF_HUMAN] + text_ids + [self.END_OF_TEXT, self.END_OF_HUMAN]
            + [soa, self.START_OF_SPEECH] + codes + [self.END_OF_SPEECH, eoa]
        )

    # ---- output parsing ----

    def parse_output(self, tokens: np.ndarray) -> List[int]:
        toks = list(np.asarray(tokens).reshape(-1))
        if self.START_OF_SPEECH in toks:
            toks = toks[len(toks) - toks[::-1].index(self.START_OF_SPEECH) :]
        toks = [int(t) for t in toks if t != self.END_OF_SPEECH and t >= self.AUDIO_TOKENS_START]
        n = (len(toks) // 7) * 7
        return [t - self.AUDIO_TOKENS_START for t in toks[:n]]

    def make_batcher(self, **kwargs):
        """Serving batcher: continuous (slot-based) batching of concurrent
        token streams — one lock-step device decode for all live requests."""
        from ...serving import LMContinuousBatcher

        return LMContinuousBatcher(self, **kwargs)

    def decode_audio(self, code_list: List[int]) -> Optional[np.ndarray]:
        if len(code_list) < 7:
            return None
        layers = codes_to_layers(code_list)
        audio = self.codec.decode(layers)
        return np.asarray(audio).reshape(-1)

    def decode_audio_stream(self, code_list: List[int], prev_codes=None,
                            context_frames: int = 8):
        """Decode NEW flat codes with code-context for seam-free streaming
        (reference llama.py:77-91): returns (audio (samples,) | None,
        new_context)."""
        if len(code_list) < 7:
            return None, prev_codes
        layers = codes_to_layers(code_list)
        audio, ctx = self.codec.decode_stream(layers, prev_codes,
                                              context_frames)
        return np.asarray(audio).reshape(-1), ctx

    # ---- generation ----

    def generate(
        self,
        text: str,
        voice: Optional[str] = None,
        temperature: float = 0.6,
        top_p: float = 0.8,
        split_pattern: str = "\n",
        max_tokens: int = 1200,
        verbose: bool = False,
        ref_audio=None,
        ref_text: Optional[str] = None,
        stream: bool = False,
        **kwargs,
    ):
        from ...utils import load_audio

        if ref_audio is not None and isinstance(ref_audio, (str,)):
            ref_audio = load_audio(ref_audio, sample_rate=self.sample_rate)

        prompt_text = text.replace("\\n", "\n").replace("\\t", "\t")
        prompts = [p for p in prompt_text.split(split_pattern) if p.strip()]
        zeroprompt = (
            self.prepare_zeroprompt(ref_audio, ref_text)
            if ref_audio is not None and ref_text is not None
            else None
        )

        # Under a running server a ContinuousBatcher may be installed:
        # concurrent requests' token streams then decode in lock-step.
        from ...serving import get_infer_hook

        hook = get_infer_hook(self)

        for segment_idx, segment in enumerate(prompts):
            t0 = time.perf_counter()
            ids = self.prepare_input_ids(segment, voice, zeroprompt)
            if stream and hook is None:
                # incremental audio streaming (reference llama.py:371-497):
                # decode every ~streaming_interval seconds of new frames
                # with code context for seam-free chunk boundaries
                from ...lm.generate import stream_generate

                interval_toks = max(
                    7, int(float(kwargs.get("streaming_interval", 2.0))
                           * 137.5) // 7 * 7)
                raw, emitted, prev_ctx, n = [], 0, None, 0
                for resp in stream_generate(
                        self, jnp.asarray(ids, jnp.int32),
                        max_tokens=max_tokens, temp=temperature, top_p=top_p,
                        top_k=kwargs.get("top_k", 0),
                        repetition_penalty=kwargs.get(
                            "repetition_penalty", 1.3),
                        repetition_context_size=kwargs.get(
                            "repetition_context_size", 20),
                        eos_token_ids=(self.END_OF_SPEECH,)):
                    raw.append(int(resp.token))
                    n += 1
                    codes = self.parse_output(np.asarray(raw))
                    if len(codes) - emitted >= interval_toks:
                        new = codes[emitted: emitted
                                    + (len(codes) - emitted) // 7 * 7]
                        audio, prev_ctx = self.decode_audio_stream(
                            new, prev_ctx)
                        if audio is not None:
                            emitted += len(new)
                            elapsed = time.perf_counter() - t0
                            dur = len(audio) / self.sample_rate
                            yield GenerationResult(
                                audio=audio, samples=len(audio),
                                sample_rate=self.sample_rate,
                                segment_idx=segment_idx, token_count=n,
                                audio_duration=format_duration(dur),
                                real_time_factor=(elapsed / dur
                                                  if dur > 0 else 0.0),
                                prompt={"tokens": len(ids)},
                                audio_samples={"samples": len(audio)},
                                processing_time_seconds=elapsed,
                                peak_memory_usage=0.0)
                codes = self.parse_output(np.asarray(raw))
                tail = codes[emitted:]
                if tail:
                    audio, _ = self.decode_audio_stream(tail, prev_ctx)
                    if audio is not None:
                        elapsed = time.perf_counter() - t0
                        dur = len(audio) / self.sample_rate
                        yield GenerationResult(
                            audio=audio, samples=len(audio),
                            sample_rate=self.sample_rate,
                            segment_idx=segment_idx, token_count=n,
                            audio_duration=format_duration(dur),
                            real_time_factor=(elapsed / dur
                                              if dur > 0 else 0.0),
                            prompt={"tokens": len(ids)},
                            audio_samples={"samples": len(audio)},
                            processing_time_seconds=elapsed,
                            peak_memory_usage=0.0)
                continue
            if hook is not None:
                out_tokens = hook.submit(
                    ids, max_tokens=max_tokens, temp=temperature,
                    top_p=top_p, top_k=kwargs.get("top_k", 0),
                    repetition_penalty=kwargs.get("repetition_penalty", 1.3),
                    repetition_context_size=kwargs.get(
                        "repetition_context_size", 20),
                    eos_ids=(self.END_OF_SPEECH,),
                ).result()
                toks = np.asarray([out_tokens], np.int32)
                n = len(out_tokens)
            else:
                toks, n = generate_tokens(
                    self,
                    jnp.asarray(ids, jnp.int32),
                    max_tokens=max_tokens,
                    temp=temperature,
                    top_p=top_p,
                    top_k=kwargs.get("top_k", 0),
                    repetition_penalty=kwargs.get("repetition_penalty", 1.3),
                    repetition_context_size=kwargs.get("repetition_context_size", 20),
                    eos_token_ids=(self.END_OF_SPEECH,),
                )
            codes = self.parse_output(toks[0])
            audio = self.decode_audio(codes)
            if audio is None:
                continue
            elapsed = time.perf_counter() - t0
            dur = len(audio) / self.sample_rate
            yield GenerationResult(
                audio=audio,
                samples=len(audio),
                sample_rate=self.sample_rate,
                segment_idx=segment_idx,
                token_count=n,
                audio_duration=format_duration(dur),
                real_time_factor=(elapsed / dur if dur > 0 else 0.0),
                prompt={"tokens": len(ids),
                        "tokens-per-sec": round(len(ids) / elapsed, 2)},
                audio_samples={"samples": len(audio),
                               "samples-per-sec": round(len(audio) / elapsed, 2)},
                processing_time_seconds=elapsed,
                peak_memory_usage=0.0,
            )

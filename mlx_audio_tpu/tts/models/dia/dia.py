"""Dia — byte-level encoder-decoder TTS over 9 DAC codebooks with
classifier-free guidance and a per-channel delay pattern.

Behavioral spec: reference tts/models/dia/dia.py (Model :33, _generate :316
with the CFG batch [uncond, cond], top-k CFG filter, delay-BOS forcing and
the EOS cascade). TPU-first: the ENTIRE AR loop — decode step over the
2-batch, CFG combine, top-k sampling, delay forcing, EOS delay-cascade and
early exit — is one `lax.while_loop` (the reference steps in python with
async_eval); encoder + cross-KV precompute are separate jitted programs.
"""

from __future__ import annotations

import re
import time
from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....lm.cache import KVCache
from ....nn.module import Module
from ..base import GenerationResult, format_duration
from .audio import audio_to_codebook, codebook_to_audio
from .config import DiaConfig
from .layers import Decoder, DiaModel, Encoder

__all__ = ["Model"]


@jax.jit
def _encode_text(model: DiaModel, src, src_pos, enc_mask):
    encoder_out = model.encoder(src, src_pos, enc_mask)
    cross_kvs = model.decoder.precompute_cross_kv(encoder_out, src_pos)
    return encoder_out, cross_kvs


@partial(
    jax.jit,
    static_argnames=("max_tokens", "cfg_scale", "temperature", "top_k",
                     "eos", "pad", "bos", "delay_pattern"),
    donate_argnames=("self_caches",),
)
def _generate_loop(model: DiaModel, self_caches, cross_kvs, cross_mask,
                   start_tokens, start_step, key, max_tokens: int,
                   cfg_scale: float, temperature: float, top_k: int,
                   eos: int, pad: int, bos: int, delay_pattern: tuple):
    C = len(delay_pattern)
    delay = jnp.asarray(delay_pattern)
    max_delay = max(delay_pattern)
    buf = jnp.full((max_tokens + max_delay + 2, C), pad, jnp.int32)
    buf = buf.at[0].set(start_tokens)

    def cond(s):
        step, _, _, _, eos_step, _ = s
        return (step < max_tokens) & (
            (eos_step < 0) | (step - eos_step <= max_delay)
        )

    def body(s):
        step, buf, self_caches, key, eos_step, _ = s
        tok = jnp.broadcast_to(buf[step][None, None], (2, 1, C))
        pos = jnp.full((2, 1), start_step + step, jnp.int32)
        # causal mask over written cache slots only: the static-capacity
        # cache preallocates zero K/V, and unmasked attention would give
        # every unwritten slot softmax weight e^0 (round-5 fix)
        S = self_caches[0].max_len
        ok = jnp.arange(S)[None, :] <= (start_step + step)
        self_mask = jnp.where(ok, 0.0, -jnp.inf).astype(
            jnp.float32)[None, None]
        logits, self_caches = model.decoder(
            tok, pos, self_caches, cross_kvs, self_mask=self_mask,
            cross_mask=cross_mask,
        )
        last = logits[:, -1]  # (2, C, V)
        cfg = last[1] + cfg_scale * (last[1] - last[0])  # (C, V)
        cfg = cfg.at[:, eos + 1 :].set(-jnp.inf)  # only real codes + EOS

        key, sub = jax.random.split(key)
        if temperature == 0.0:
            pred = jnp.argmax(cfg, axis=-1).astype(jnp.int32)
        else:
            x = cfg / temperature
            if top_k > 0:
                from ....lm.sample import top_k_filter

                x = top_k_filter(x, top_k)
            pred = jax.random.categorical(sub, x, axis=-1).astype(jnp.int32)

        gen_idx = step  # generation index from the start of AR
        # channels still inside their delay emit BOS
        pred = jnp.where(gen_idx >= delay, pred, bos)
        # EOS cascade: after channel-0 EOS, each channel emits EOS at its
        # delay offset then PAD
        new_eos = (eos_step < 0) & (pred[0] == eos)
        eos_step = jnp.where(new_eos, step, eos_step)
        after = step - eos_step
        in_cascade = eos_step >= 0
        pred = jnp.where(in_cascade & (after == delay), eos, pred)
        pred = jnp.where(in_cascade & (after > delay), pad, pred)

        buf = buf.at[step + 1].set(pred)
        return step + 1, buf, self_caches, key, eos_step, pred

    state = (0, buf, self_caches, key, jnp.array(-1, jnp.int32),
             jnp.zeros((C,), jnp.int32))
    step, buf, self_caches, key, eos_step, _ = jax.lax.while_loop(
        cond, body, state
    )
    return buf, step


class Model(Module):
    _dac = None

    def __init__(self, config):
        self.config = DiaConfig.load_dict(config)
        self.model = DiaModel(self.config)

    @property
    def sample_rate(self):
        return self.config.model.sample_rate

    @property
    def dac_model(self):
        if Model._dac is None:
            from ....codec.models import DAC

            Model._dac = DAC.from_pretrained(
                "mlx-community/descript-audio-codec-44khz"
            )
        return Model._dac

    def set_runtime(self, dac=None):
        if dac is not None:
            Model._dac = dac

    def make_batcher(self, **kwargs):
        """Serving batcher (server entry point): concurrent requests' CFG
        decodes run in lock-step; DAC decode stays per-request."""
        from .batcher import DiaBatcher

        return DiaBatcher(self, **kwargs)

    def _prepare_text(self, text: str):
        S = self.config.data.text_length
        pad_val = self.config.data.text_pad_value
        b = text.encode("utf-8").replace(b"[S1]", b"\x01").replace(b"[S2]", b"\x02")
        toks = list(b)[:S]
        toks = toks + [pad_val] * (S - len(toks))
        src = np.asarray(toks, np.int32)
        return src, src != pad_val

    def _split_turns(self, text: str) -> List[str]:
        pattern = re.compile(r"\[S1\]\s*(.*?)\s*\[S2\]\s*(.*?)(?=(?:\[S1\])|$)",
                             re.DOTALL)
        segments = [
            f"[S1] {a.strip()} [S2] {b.strip()}" for a, b in pattern.findall(text)
        ]
        merged = []
        for i in range(0, len(segments), 2):
            merged.append(
                " ".join(segments[i : i + 2]) if i + 1 < len(segments)
                else segments[i]
            )
        return merged or [text]

    def _generate(self, text: str, max_tokens=None, cfg_scale=3.0,
                  temperature=1.3, top_p=0.95, cfg_filter_top_k=35,
                  ref_audio=None, ref_text=None, seed: int = 0):
        data = self.config.data
        dec = self.config.model.decoder
        max_tokens = max_tokens or data.audio_length

        if ref_text is not None:
            text = ref_text.strip() + " " + text

        src, src_mask = self._prepare_text(text)

        # under a running server a DiaBatcher may be installed: concurrent
        # requests' CFG decodes then run in lock-step. Voice-clone prompts
        # (ref_audio) and non-default cfg_filter_top_k fall back to the
        # single-request loop.
        from ....serving import get_infer_hook

        hook = get_infer_hook(self)
        if (hook is not None and ref_audio is None
                and int(cfg_filter_top_k) == hook.top_k):
            codes = hook.submit(
                src, src_mask, max_tokens=max_tokens, cfg_scale=cfg_scale,
                temperature=temperature, seed=seed).result()  # (n, C)
            audio = codebook_to_audio(
                codes, self.dac_model, list(data.delay_pattern),
                C=data.channels)
            return audio, int(codes.shape[0])
        src2 = jnp.asarray(np.stack([np.zeros_like(src), src]))  # [uncond, cond]
        pos = jnp.broadcast_to(jnp.arange(data.text_length)[None], (2, data.text_length))
        pmask = jnp.asarray(np.stack([np.zeros_like(src_mask), src_mask]))
        # segment-compatible mask (pad↔pad allowed, reference :122-151)
        enc_mask = (
            (pmask[:, :, None] == pmask[:, None, :])[:, None]
        )
        enc_mask = jnp.where(enc_mask, 0.0, -jnp.inf).astype(jnp.float32)

        encoder_out, cross_kvs = _encode_text(self.model, src2, pos, enc_mask)

        kv_len = max_tokens + max(data.delay_pattern) + 64
        self_caches = [
            KVCache(2, dec.kv_heads, kv_len, dec.gqa_head_dim, dtype=jnp.float32)
            for _ in range(dec.n_layer)
        ]
        cross_mask = jnp.where(pmask[:, None, None, :], 0.0, -jnp.inf).astype(
            jnp.float32
        )

        start_tokens = jnp.full((data.channels,), data.audio_bos_value, jnp.int32)
        start_step = 0
        if ref_audio is not None:
            prompt_codes = audio_to_codebook(
                self.dac_model,
                jnp.asarray(np.asarray(ref_audio, np.float32))[None, None],
                data,
            )  # (1, Tp, C)
            prompt = jnp.concatenate(
                [start_tokens[None, None], prompt_codes], axis=1
            )
            prompt2 = jnp.broadcast_to(prompt, (2, *prompt.shape[1:]))
            Tp = prompt2.shape[1]
            tgt_pos = jnp.broadcast_to(jnp.arange(Tp)[None], (2, Tp))
            _, self_caches = self.model.decoder(
                prompt2[:, :-1], tgt_pos[:, :-1], self_caches, cross_kvs,
                self_mask=self_caches[0].attention_mask(Tp - 1),
                cross_mask=cross_mask,
            )
            start_tokens = prompt[0, -1]
            start_step = Tp - 1

        buf, n = _generate_loop(
            self.model, self_caches, cross_kvs, cross_mask, start_tokens,
            jnp.asarray(start_step), jax.random.PRNGKey(seed),
            int(max_tokens), float(cfg_scale), float(temperature),
            int(cfg_filter_top_k), int(data.audio_eos_value),
            int(data.audio_pad_value), int(data.audio_bos_value),
            tuple(data.delay_pattern),
        )
        buf, n = jax.device_get((buf, n))
        n = int(n)
        codes = buf[1 : n + 1]  # generated tokens (T, C)
        audio = codebook_to_audio(
            codes, self.dac_model, list(data.delay_pattern), C=data.channels
        )
        return audio, n

    def generate(self, text, voice: Optional[str] = None, temperature: float = 1.3,
                 top_p: float = 0.95, split_pattern: str = "\n",
                 max_tokens: Optional[int] = None, verbose: bool = False,
                 ref_audio=None, ref_text: Optional[str] = None, **kwargs):
        from ....utils import load_audio

        if ref_audio is not None and isinstance(ref_audio, str):
            ref_audio = load_audio(ref_audio, sample_rate=self.sample_rate)

        prompts = text.replace("\\n", "\n").split(split_pattern)
        segments = []
        for p in prompts:
            if "[S1]" in p and "[S2]" in p:
                segments.extend(self._split_turns(p))
            elif p.strip():
                segments.append(p)

        for segment_idx, segment in enumerate(segments):
            t0 = time.perf_counter()
            audio, n = self._generate(
                segment, max_tokens=max_tokens, temperature=temperature,
                top_p=top_p, ref_audio=ref_audio, ref_text=ref_text,
                cfg_scale=kwargs.get("cfg_scale", 3.0),
                cfg_filter_top_k=kwargs.get("cfg_filter_top_k", 35),
            )
            elapsed = time.perf_counter() - t0
            dur = len(audio) / self.sample_rate
            yield GenerationResult(
                audio=audio, samples=len(audio), sample_rate=self.sample_rate,
                segment_idx=segment_idx, token_count=n,
                audio_duration=format_duration(dur),
                real_time_factor=round(elapsed / max(dur, 1e-9), 3),
                prompt={"tokens": n, "tokens-per-sec": round(n / elapsed, 2)},
                audio_samples={"samples": len(audio),
                               "samples-per-sec": round(len(audio) / elapsed, 2)},
                processing_time_seconds=elapsed,
                peak_memory_usage=0.0,
            )

    def sanitize(self, weights: dict) -> dict:
        out = {}
        for k, v in weights.items():
            if not k.startswith("model."):
                k = "model." + k
            out[k] = v
        return out

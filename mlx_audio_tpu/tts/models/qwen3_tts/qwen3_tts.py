"""Qwen3-TTS — Talker LLM over 12.5 Hz codec frames + per-frame code
predictor across 16 codebooks → RVQ codec decoder.

Behavioral spec: reference tts/models/qwen3_tts/qwen3_tts.py (generate :687,
AR loop :869-1010, ICL :1250). TPU-first: the nested AR generation — talker
step, special-token suppression + repetition penalty, the 15-step
code-predictor inner loop (fresh per frame), next-frame embedding assembly
with trailing-text schedule, EOS — is ONE `lax.while_loop` on device (the
reference runs ~(1+15) python-level forwards per 80 ms frame). Codec decode
runs chunked with 25-token context overlap, matching the reference.
"""

from __future__ import annotations

import time
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....dsp import mel_filters, stft, hanning
from ....nn.module import Module
from ..base import GenerationResult, format_duration
from .config import ModelConfig
from .speaker_encoder import Qwen3TTSSpeakerEncoder
from .speech_tokenizer import Qwen3TTSSpeechTokenizer
from .talker import Qwen3TTSTalkerForConditionalGeneration

__all__ = ["Model", "ModelConfig"]


def mel_spectrogram(audio, n_fft=1024, num_mels=128, sample_rate=24000,
                    hop_size=256, win_size=1024, fmin=0.0, fmax=12000.0):
    """BigVGAN-style mel for the speaker encoder (reference qwen3_tts.py:34)."""
    x = jnp.asarray(audio, jnp.float32).reshape(-1)
    pad = (n_fft - hop_size) // 2
    x = jnp.pad(x[None], [(0, 0), (pad, pad)], mode="reflect")[0]
    spec = stft(x, n_fft=n_fft, hop_length=hop_size, win_length=win_size,
                window=hanning(win_size), center=False)
    mag = jnp.sqrt(jnp.abs(spec) ** 2 + 1e-9)
    fb = mel_filters(sample_rate=sample_rate, n_fft=n_fft, n_mels=num_mels,
                     f_min=fmin, f_max=fmax, norm="slaney", mel_scale="slaney")
    mel = jnp.matmul(mag, fb.T, preferred_element_type=jnp.float32)
    return jnp.log(jnp.clip(mel, 1e-5, None))[None]  # (1, T, mels)


def _sample(logits, key, temp, top_k, top_p):
    from ....lm.sample import top_k_filter, top_p_filter

    if temp <= 0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    x = logits.astype(jnp.float32) / temp
    if top_k > 0:
        x = top_k_filter(x, top_k)
    if top_p < 1.0:
        x = top_p_filter(x, top_p)
    return jax.random.categorical(key, x, axis=-1).astype(jnp.int32)


@partial(
    jax.jit,
    static_argnames=("max_tokens", "temp", "top_k", "top_p", "rep_penalty"),
    donate_argnames=("caches",),
)
def _generate_codes(
    talker: Qwen3TTSTalkerForConditionalGeneration,
    caches,
    input_embeds,  # (1, Tp, D) prefill embeddings (bucketed)
    prefill_len,  # scalar — valid length of input_embeds
    trailing,  # (1, Ttr, D) trailing text hidden (padded)
    trailing_len,
    tts_pad_embed,  # (1, 1, D)
    key,
    max_tokens: int,
    temp: float,
    top_k: int,
    top_p: float,
    rep_penalty: float,
):
    cfg = talker.config
    K = cfg.num_code_groups
    eos = cfg.codec_eos_token_id
    V = cfg.vocab_size

    # suppress specials [V-1024, V) except EOS
    vocab_idx = jnp.arange(V)
    suppress = (vocab_idx >= V - 1024) & (vocab_idx != eos)

    # stacked code-predictor params for traced-index access
    E_codes = jnp.stack([e.weight for e in talker.code_predictor.codec_embedding])
    W_heads = jnp.stack([h.weight for h in talker.code_predictor.lm_head])

    # prefill (mask covers the full cache key length; bucket padding excluded)
    Tp = input_embeds.shape[1]
    S_cache = caches[0].max_len
    q_idx = jnp.arange(Tp)[:, None]
    k_idx_full = jnp.arange(S_cache)[None, :]
    prefill_ok = (k_idx_full <= q_idx) & (k_idx_full < prefill_len)
    prefill_mask = jnp.where(prefill_ok, 0.0, -jnp.inf)[None, None]
    logits_seq, hidden_seq, caches = talker(input_embeds, caches, prefill_mask)
    last = jnp.clip(prefill_len - 1, 0, Tp - 1)
    logits0 = logits_seq[:, last].astype(jnp.float32)
    hidden0 = hidden_seq[:, last]

    out = jnp.zeros((max_tokens, K), jnp.int32)
    hist = jnp.full((1, 64), -1, jnp.int32)

    def code_predictor_frame(hidden_last, c0, key):
        """15-step inner AR over codebooks (fresh caches per frame)."""
        cp = talker.code_predictor
        dec_caches = cp.model.make_caches(1, K + 2)
        c0_embed = talker.model.codec_embedding.weight[c0][None]  # (1, 1, D)
        seq = jnp.concatenate([hidden_last[:, None], c0_embed], axis=1)
        h, dec_caches = cp.model(cp.project(seq), dec_caches)
        codes = jnp.zeros((K,), jnp.int32).at[0].set(c0[0])
        emb_sum = c0_embed[:, 0]

        def body(i, state):
            h_last, dec_caches, codes, emb_sum, key = state
            key, sub = jax.random.split(key)
            logits = jnp.einsum(
                "d,vd->v", h_last[0],
                jax.lax.dynamic_index_in_dim(W_heads, i - 1, 0, False),
                preferred_element_type=jnp.float32,
            )
            ci = _sample(logits[None], sub, temp, top_k, top_p)[0]
            codes = codes.at[i].set(ci)
            emb_i = jax.lax.dynamic_index_in_dim(E_codes, i - 1, 0, False)[ci]
            emb_sum = emb_sum + emb_i[None]
            h, ncaches = cp.model(cp.project(emb_i[None, None]), dec_caches)
            return h[:, -1], ncaches, codes, emb_sum, key

        state = (h[:, -1], dec_caches, codes, emb_sum, key)
        _, _, codes, emb_sum, key = jax.lax.fori_loop(1, K, body, state)
        return codes, emb_sum, key

    def cond(s):
        step, done = s[0], s[5]
        return (step < max_tokens) & ~done

    def body(s):
        step, caches, logits, hidden, out, done, tr_idx, hist, key = s
        lg = jnp.where(suppress[None, :], -jnp.inf, logits)
        if rep_penalty != 1.0:
            from ....lm.sample import apply_repetition_penalty

            lg = apply_repetition_penalty(lg, hist, rep_penalty)
        key, sub = jax.random.split(key)
        c0 = _sample(lg, sub, temp, top_k, top_p)  # (1,)
        is_eos = c0[0] == eos
        done = done | is_eos

        codes, emb_sum, key = code_predictor_frame(hidden, c0, key)
        out = jnp.where(done, out, out.at[step].set(codes))
        hist = jnp.concatenate([hist[:, 1:], c0[:, None]], axis=1)

        # next-frame input: trailing text (or pad) + summed codec embeddings
        text_embed = jnp.where(
            tr_idx < trailing_len,
            jax.lax.dynamic_slice(
                trailing, (0, jnp.clip(tr_idx, 0, trailing.shape[1] - 1), 0),
                (1, 1, trailing.shape[2]),
            ),
            tts_pad_embed,
        )
        next_embed = text_embed + emb_sum[:, None]
        # positions continue from the true prompt length; keys in the bucket
        # pad hole [prefill_len, Tp) are masked out
        q_pos = prefill_len + step
        S = caches[0].max_len
        k_idx = jnp.arange(S)
        valid = (
            (k_idx < prefill_len)
            | ((k_idx >= Tp) & (k_idx <= Tp + step))
        )
        dec_mask = jnp.where(valid, 0.0, -jnp.inf)[None, None, None, :]
        new_logits, new_hidden, caches = talker(
            next_embed, caches, mask=dec_mask, positions=q_pos[None, None]
        )
        step = jnp.where(done, step, step + 1)
        return (step, caches, new_logits[:, -1].astype(jnp.float32),
                new_hidden[:, -1], out, done, tr_idx + 1, hist, key)

    state = (0, caches, logits0, hidden0, out, jnp.array(False),
             jnp.array(0, jnp.int32), hist, key)
    step, caches, _, _, out, done, _, _, _ = jax.lax.while_loop(cond, body, state)
    return out, step


class Model(Module):
    def __init__(self, config: ModelConfig):
        if isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        self.config = config
        self.talker = Qwen3TTSTalkerForConditionalGeneration(config.talker_config)
        self.speech_tokenizer = Qwen3TTSSpeechTokenizer(config.tokenizer_config)
        if config.speaker_encoder_config is not None:
            self.speaker_encoder = Qwen3TTSSpeakerEncoder(
                config.speaker_encoder_config
            )

    _tokenizer = None

    @property
    def sample_rate(self):
        return self.config.sample_rate

    @property
    def tokenizer(self):
        if Model._tokenizer is None:
            from transformers import AutoTokenizer

            Model._tokenizer = AutoTokenizer.from_pretrained(self.config.model_path)
        return Model._tokenizer

    def set_runtime(self, tokenizer=None):
        if tokenizer is not None:
            Model._tokenizer = tokenizer

    @classmethod
    def post_load_hook(cls, model, model_path):
        model.config.model_path = str(model_path)
        return model

    # ------------------------------------------------------------------

    def extract_speaker_embedding(self, ref_audio) -> jax.Array:
        mel = mel_spectrogram(
            np.asarray(ref_audio, np.float32),
            num_mels=self.config.speaker_encoder_config.mel_dim,
            sample_rate=self.config.speaker_encoder_config.sample_rate,
        )
        return self.speaker_encoder(mel)[:, None]  # (1, 1, enc_dim)

    def _text_embed(self, ids) -> jax.Array:
        emb = self.talker.model.text_embedding(jnp.asarray(ids, jnp.int32)[None])
        return self.talker.text_projection(emb)

    def _prepare_generation_inputs(self, text: str, language: str = "auto",
                                   speaker: Optional[str] = None,
                                   ref_audio=None, instruct: Optional[str] = None):
        cfg = self.config.talker_config
        chat = f"<|im_start|>assistant\n{text}<|im_end|>\n<|im_start|>assistant\n"
        text_embed = self._text_embed(self.tokenizer.encode(chat))
        tts_embeds = self._text_embed([
            self.config.tts_bos_token_id, self.config.tts_eos_token_id,
            self.config.tts_pad_token_id,
        ])
        tts_bos, tts_eos, tts_pad = (
            tts_embeds[:, 0:1], tts_embeds[:, 1:2], tts_embeds[:, 2:3]
        )

        speaker_embed = None
        if ref_audio is not None and hasattr(self, "speaker_encoder"):
            speaker_embed = self.extract_speaker_embedding(ref_audio)
        elif speaker and speaker.lower() in (cfg.spk_id or {}):
            spk = jnp.asarray([[cfg.spk_id[speaker.lower()]]], jnp.int32)
            speaker_embed = self.talker.model.codec_embedding(spk)

        language_id = None
        if language.lower() != "auto" and cfg.codec_language_id:
            language_id = cfg.codec_language_id.get(language.lower())
        if (
            language.lower() in ("chinese", "auto") and speaker
            and (cfg.spk_is_dialect or {}).get(speaker.lower())
        ):
            dialect = cfg.spk_is_dialect[speaker.lower()]
            language_id = (cfg.codec_language_id or {}).get(dialect, language_id)

        if language_id is None:
            prefill = [cfg.codec_nothink_id, cfg.codec_think_bos_id,
                       cfg.codec_think_eos_id]
        else:
            prefill = [cfg.codec_think_id, cfg.codec_think_bos_id, language_id,
                       cfg.codec_think_eos_id]
        codec_embed = self.talker.model.codec_embedding(
            jnp.asarray([prefill], jnp.int32)
        )
        suffix = self.talker.model.codec_embedding(
            jnp.asarray([[cfg.codec_pad_id, cfg.codec_bos_id]], jnp.int32)
        )
        parts = [codec_embed]
        if speaker_embed is not None:
            parts.append(speaker_embed.reshape(1, 1, -1))
        parts.append(suffix)
        codec_embed = jnp.concatenate(parts, axis=1)

        instruct_embed = None
        if instruct:
            instruct_embed = self._text_embed(
                self.tokenizer.encode(f"<|im_start|>user\n{instruct}<|im_end|>\n")
            )

        role_embed = text_embed[:, :3]
        pad_count = codec_embed.shape[1] - 2
        combined = jnp.concatenate(
            [jnp.broadcast_to(tts_pad, (1, pad_count, tts_pad.shape[-1])), tts_bos],
            axis=1,
        ) + codec_embed[:, :-1]
        pieces = ([instruct_embed] if instruct_embed is not None else []) + [
            role_embed, combined,
            text_embed[:, 3:4] + codec_embed[:, -1:],
        ]
        input_embeds = jnp.concatenate(pieces, axis=1)
        trailing = jnp.concatenate([text_embed[:, 4:-5], tts_eos], axis=1)
        return input_embeds, trailing, tts_pad

    # ------------------------------------------------------------------

    def generate(self, text: str, voice: Optional[str] = None,
                 lang_code: str = "auto", instruct: Optional[str] = None,
                 temperature: float = 0.9, top_k: int = 50, top_p: float = 1.0,
                 repetition_penalty: float = 1.05, max_tokens: int = 1500,
                 split_pattern: str = "\n", ref_audio=None,
                 ref_text: Optional[str] = None, stream: bool = False,
                 streaming_interval: float = 2.0, **kwargs):
        from ....utils import load_audio

        if ref_audio is not None and isinstance(ref_audio, str):
            ref_audio = load_audio(ref_audio, sample_rate=self.sample_rate)

        segments = [s.strip() for s in text.split(split_pattern) if s.strip()]
        for segment_idx, segment in enumerate(segments):
            t0 = time.perf_counter()
            input_embeds, trailing, tts_pad = self._prepare_generation_inputs(
                segment, language=lang_code, speaker=voice, ref_audio=ref_audio,
                instruct=instruct,
            )
            Tp = input_embeds.shape[1]
            # bucket prefill/trailing lengths to bound compiles
            def bucket(n, step=32):
                return ((n + step - 1) // step) * step

            D = input_embeds.shape[-1]
            Tp_pad = bucket(Tp)
            inp = jnp.zeros((1, Tp_pad, D), input_embeds.dtype)
            inp = inp.at[:, :Tp].set(input_embeds)
            Ttr = trailing.shape[1]
            Ttr_pad = bucket(max(Ttr, 1))
            tr = jnp.zeros((1, Ttr_pad, D), trailing.dtype)
            tr = tr.at[:, :Ttr].set(trailing)

            caches = self.talker.model.make_caches(1, Tp_pad + max_tokens + 2)
            codes, n = _generate_codes(
                self.talker, caches, inp, jnp.asarray(Tp), tr, jnp.asarray(Ttr),
                tts_pad, jax.random.PRNGKey(kwargs.get("seed", 0)),
                int(max_tokens), float(temperature), int(top_k), float(top_p),
                float(repetition_penalty),
            )
            codes, n = jax.device_get((codes, n))
            n = int(n)
            if n == 0:
                continue
            codes_arr = jnp.asarray(codes[:n].T[None])  # (1, K, n)
            audio = self.speech_tokenizer.chunked_decode(codes_arr).reshape(-1)

            elapsed = time.perf_counter() - t0
            dur = len(audio) / self.sample_rate
            yield GenerationResult(
                audio=np.asarray(audio), samples=len(audio),
                sample_rate=self.sample_rate, segment_idx=segment_idx,
                token_count=n, audio_duration=format_duration(dur),
                real_time_factor=round(elapsed / max(dur, 1e-9), 3),
                prompt={"tokens": n, "tokens-per-sec": round(n / elapsed, 2)},
                audio_samples={"samples": len(audio),
                               "samples-per-sec": round(len(audio) / elapsed, 2)},
                processing_time_seconds=elapsed,
                peak_memory_usage=0.0,
            )

    def model_quant_predicate(self, p, m):
        # quantize only the talker LLM; codec + speaker encoder stay fp
        return p.startswith("talker.model.layers") or p.startswith(
            "talker.code_predictor"
        )

    def sanitize(self, weights: dict) -> dict:
        from ....nn.sanitize import orient_weights_to_model

        out = {}
        for k, v in weights.items():
            if k.startswith("talker.") or k.startswith("speaker_encoder.") or \
                    k.startswith("speech_tokenizer."):
                out[k] = v
            elif k.startswith("tokenizer."):
                out["speech_tokenizer." + k[len("tokenizer."):]] = v
            else:
                out["talker." + k] = v
        return orient_weights_to_model(self, out)

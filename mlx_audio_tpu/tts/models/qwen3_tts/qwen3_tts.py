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
from pathlib import Path
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


@partial(jax.jit, donate_argnames=("caches",))
def _prefill(
    talker: Qwen3TTSTalkerForConditionalGeneration,
    caches,
    input_embeds,  # (1, Tp, D) prefill embeddings (bucketed)
    prefill_len,  # scalar — valid length of input_embeds
):
    """Run the prompt through the talker; return resumable decode state."""
    Tp = input_embeds.shape[1]
    S_cache = caches[0].max_len
    q_idx = jnp.arange(Tp)[:, None]
    k_idx_full = jnp.arange(S_cache)[None, :]
    prefill_ok = (k_idx_full <= q_idx) & (k_idx_full < prefill_len)
    prefill_mask = jnp.where(prefill_ok, 0.0, -jnp.inf)[None, None]
    logits_seq, hidden_seq, caches = talker(input_embeds, caches, prefill_mask)
    last = jnp.clip(prefill_len - 1, 0, Tp - 1)
    return caches, logits_seq[:, last].astype(jnp.float32), hidden_seq[:, last]


@partial(
    jax.jit,
    static_argnames=("chunk_tokens", "bucket_len", "temp", "top_k", "top_p",
                     "rep_penalty"),
    donate_argnames=("state",),
)
def _generate_chunk(
    talker: Qwen3TTSTalkerForConditionalGeneration,
    state,  # (step, caches, logits, hidden, done, tr_idx, hist, key)
    trailing,  # (1, Ttr, D) trailing text hidden (padded)
    trailing_len,
    tts_pad_embed,  # (1, 1, D)
    prefill_len,  # scalar — true prompt length
    max_tokens,  # scalar — global token cap
    min_tokens,  # scalar — EOS masked out before this many frames
    chunk_tokens: int,
    bucket_len: int,  # static — bucketed prefill width Tp
    temp: float,
    top_k: int,
    top_p: float,
    rep_penalty: float,
):
    """Generate up to `chunk_tokens` codec frames, resuming from `state`.

    The nested AR — talker step, suppression + repetition penalty, the
    (K-1)-step code-predictor inner loop, next-frame embedding assembly,
    EOS — is one `lax.while_loop`; calling this repeatedly with carried
    state gives streaming at one dispatch per chunk (reference runs ~(1+15)
    python-level forwards per 80 ms frame; qwen3_tts.py:869-1010)."""
    cfg = talker.config
    K = cfg.num_code_groups
    eos = cfg.codec_eos_token_id
    V = cfg.vocab_size
    Tp = bucket_len

    # Suppress the specials block at the top of the vocab, except EOS
    # (reference qwen3_tts.py:855-858 uses [V-1024, V); for tiny test
    # configs with V <= 1024 that range covers the whole vocab, so fall
    # back to the lowest configured special id as the block start).
    specials_lo = V - 1024
    if specials_lo <= 0:
        specials_lo = min(
            eos, cfg.codec_think_id, cfg.codec_nothink_id,
            cfg.codec_think_bos_id, cfg.codec_think_eos_id,
            cfg.codec_pad_id, cfg.codec_bos_id,
        )
    vocab_idx = jnp.arange(V)
    suppress = (vocab_idx >= specials_lo) & (vocab_idx != eos)

    # stacked code-predictor params for traced-index access
    E_codes = jnp.stack([e.weight for e in talker.code_predictor.codec_embedding])
    W_heads = jnp.stack([h.weight for h in talker.code_predictor.lm_head])

    out = jnp.zeros((chunk_tokens, K), jnp.int32)

    def code_predictor_frame(hidden_last, c0, key):
        """(K-1)-step inner AR over codebooks (fresh caches per frame)."""
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
        i, step, done = s[0], s[1], s[6]
        return (i < chunk_tokens) & (step < max_tokens) & ~done

    def body(s):
        i, step, caches, logits, hidden, out, done, tr_idx, hist, key = s
        lg = jnp.where(suppress[None, :], -jnp.inf, logits)
        # min-length constraint: EOS unreachable before min_tokens frames
        lg = jnp.where((step < min_tokens) & (vocab_idx == eos)[None, :],
                       -jnp.inf, lg)
        if rep_penalty != 1.0:
            from ....lm.sample import apply_repetition_penalty

            lg = apply_repetition_penalty(lg, hist, rep_penalty)
        key, sub = jax.random.split(key)
        c0 = _sample(lg, sub, temp, top_k, top_p)  # (1,)
        is_eos = c0[0] == eos
        done = done | is_eos

        codes, emb_sum, key = code_predictor_frame(hidden, c0, key)
        out = jnp.where(done, out, out.at[i].set(codes))
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
        i = jnp.where(done, i, i + 1)
        step = jnp.where(done, step, step + 1)
        return (i, step, caches, new_logits[:, -1].astype(jnp.float32),
                new_hidden[:, -1], out, done, tr_idx + 1, hist, key)

    step, caches, logits, hidden, done, tr_idx, hist, key = state
    s = (jnp.array(0, jnp.int32), step, caches, logits, hidden, out, done,
         tr_idx, hist, key)
    i, step, caches, logits, hidden, out, done, tr_idx, hist, key = (
        jax.lax.while_loop(cond, body, s)
    )
    new_state = (step, caches, logits, hidden, done, tr_idx, hist, key)
    return out, i, new_state


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
        gen_cfg = Path(model_path) / "generation_config.json"
        if gen_cfg.exists():
            import json

            model.load_generate_config(json.loads(gen_cfg.read_text()))
        return model

    # speaker/language discovery API (reference qwen3_tts.py:160-196)

    def load_generate_config(self, generate_config: dict) -> None:
        # stored on the (static, non-pytree) config object, like
        # config.model_path — survives tree transforms, no id-keyed cache
        self.config.generate_config = generate_config

    @property
    def generate_config(self):
        return getattr(self.config, "generate_config", None)

    @property
    def supported_languages(self) -> List[str]:
        langs = ["auto"]
        for lang_id in (self.config.talker_config.codec_language_id or {}):
            if "dialect" not in lang_id:
                langs.append(lang_id)
        return langs

    def get_supported_speakers(self) -> List[str]:
        return self.supported_speakers

    def get_supported_languages(self) -> List[str]:
        return self.supported_languages

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
    # AR core: resumable chunked code generation (one dispatch per chunk)

    def _run_codes(self, input_embeds, trailing, tts_pad, *, max_tokens: int,
                   chunk_tokens: int, temperature: float, top_k: int,
                   top_p: float, repetition_penalty: float, seed: int = 0,
                   min_tokens: int = 0):
        """Yield ``(codes (n, K) np.ndarray)`` chunks until EOS or cap."""
        def bucket(n, step=32):
            return ((n + step - 1) // step) * step

        Tp = input_embeds.shape[1]
        D = input_embeds.shape[-1]
        Tp_pad = bucket(Tp)
        inp = jnp.zeros((1, Tp_pad, D), input_embeds.dtype)
        inp = inp.at[:, :Tp].set(input_embeds)
        Ttr = trailing.shape[1]
        Ttr_pad = bucket(max(Ttr, 1))
        tr = jnp.zeros((1, Ttr_pad, D), trailing.dtype)
        tr = tr.at[:, :Ttr].set(trailing)

        caches = self.talker.model.make_caches(1, Tp_pad + max_tokens + 2)
        caches, logits0, hidden0 = _prefill(
            self.talker, caches, inp, jnp.asarray(Tp)
        )
        state = (
            jnp.array(0, jnp.int32), caches, logits0, hidden0,
            jnp.array(False), jnp.array(0, jnp.int32),
            jnp.full((1, 64), -1, jnp.int32), jax.random.PRNGKey(seed),
        )
        while True:
            out, n_chunk, state = _generate_chunk(
                self.talker, state, tr, jnp.asarray(Ttr), tts_pad,
                jnp.asarray(Tp), jnp.asarray(max_tokens),
                jnp.asarray(min_tokens),
                chunk_tokens=int(chunk_tokens), bucket_len=Tp_pad,
                temp=float(temperature), top_k=int(top_k),
                top_p=float(top_p), rep_penalty=float(repetition_penalty),
            )
            out_np, n_np, done_np, step_np = jax.device_get(
                (out, n_chunk, state[4], state[0])
            )
            n = int(n_np)
            if n > 0:
                yield out_np[:n]
            if bool(done_np) or int(step_np) >= max_tokens or n == 0:
                return

    def _decode_codes(self, codes_nk: np.ndarray) -> np.ndarray:
        """codes (n, K) → waveform (samples,)."""
        codes_arr = jnp.asarray(codes_nk.T[None])  # (1, K, n)
        return self.speech_tokenizer.chunked_decode(codes_arr).reshape(-1)

    def _result(self, audio, n_tokens, segment_idx, elapsed, **flags):
        dur = len(audio) / self.sample_rate
        return GenerationResult(
            audio=np.asarray(audio), samples=len(audio),
            sample_rate=self.sample_rate, segment_idx=segment_idx,
            token_count=n_tokens, audio_duration=format_duration(dur),
            real_time_factor=round(elapsed / max(dur, 1e-9), 3),
            prompt={"tokens": n_tokens,
                    "tokens-per-sec": round(n_tokens / max(elapsed, 1e-9), 2)},
            audio_samples={"samples": len(audio),
                           "samples-per-sec": round(len(audio) / max(elapsed, 1e-9), 2)},
            processing_time_seconds=elapsed,
            peak_memory_usage=0.0,
            **flags,
        )

    def _generate_segment(self, input_embeds, trailing, tts_pad, *,
                          segment_idx: int, stream: bool,
                          streaming_interval: float, max_tokens: int,
                          temperature: float, top_k: int, top_p: float,
                          repetition_penalty: float, seed: int = 0,
                          min_tokens: int = 0, ref_codes=None):
        """Run one AR segment; yields streaming chunks (25-token decode
        context, reference qwen3_tts.py:963-985) or one final result.

        ``ref_codes`` (ICL): reference codes (1, K, Tref) prepended before
        the full decode, then proportionally trimmed (reference :1490-1515).
        """
        t0 = time.perf_counter()
        context = 25
        up = self.speech_tokenizer.decode_upsample_rate
        chunk_size = (
            max(1, int(streaming_interval * 12.5)) if stream else max_tokens
        )
        # under a running server a Qwen3TTSBatcher may be installed:
        # concurrent requests' frame loops then decode in lock-step
        from ....serving import get_infer_hook

        hook = get_infer_hook(self)
        if hook is not None and not stream:
            codes = hook.submit(
                input_embeds, trailing, max_tokens=max_tokens,
                min_tokens=min_tokens, temperature=temperature,
                top_k=top_k, top_p=top_p,
                repetition_penalty=repetition_penalty, seed=seed,
            ).result()  # (n, K)
            run = None
        elif hook is not None:
            # batched + STREAMING: the batcher emits each frame through
            # `on_frame` as its fused tick completes; regroup into
            # chunk_size code chunks on the caller's thread so the chunked
            # codec decode below (25-token left context) is identical to
            # the single-stream path — time-to-first-audio stays one chunk
            # even under concurrent load.
            from ....serving import stream_chunks

            run = (np.stack(c) for c in stream_chunks(
                hook.submit, input_embeds, trailing,
                chunk_size=chunk_size, callback_kw="on_frame",
                max_tokens=max_tokens, min_tokens=min_tokens,
                temperature=temperature, top_k=top_k, top_p=top_p,
                repetition_penalty=repetition_penalty, seed=seed))
        else:
            run = self._run_codes(
                input_embeds, trailing, tts_pad, max_tokens=max_tokens,
                chunk_tokens=chunk_size, temperature=temperature,
                top_k=top_k, top_p=top_p,
                repetition_penalty=repetition_penalty, seed=seed,
                min_tokens=min_tokens,
            )
        if not stream:
            if run is not None:
                chunks = list(run)
                if not chunks:
                    return
                codes = np.concatenate(chunks, axis=0)  # (n, K)
            elif codes.shape[0] == 0:
                return
            n = codes.shape[0]
            if ref_codes is not None:
                ref_t = np.asarray(ref_codes)[0].T  # (Tref, K)
                full = np.concatenate([ref_t, codes], axis=0)
                audio = self._decode_codes(full)
                # proportional trim of the reference portion (reference :1513)
                cut = int(ref_t.shape[0] / max(full.shape[0], 1) * len(audio))
                audio = audio[cut:] if 0 < cut < len(audio) else audio
            else:
                audio = self._decode_codes(codes)
            yield self._result(
                audio, n, segment_idx, time.perf_counter() - t0
            )
            return

        # streaming: decode each chunk with left context, lookahead to set
        # the final-chunk flag on the last yield
        all_codes: List[np.ndarray] = []
        decoded_tokens = 0
        pending = None
        for chunk in run:
            all_codes.append(chunk)
            total = sum(c.shape[0] for c in all_codes)
            start_idx = max(0, decoded_tokens - context)
            window = np.concatenate(all_codes, axis=0)[start_idx:]
            audio = self._decode_codes(window)
            trim = (decoded_tokens - start_idx) * up
            if 0 < trim < len(audio):
                audio = audio[trim:]
            new_tokens = total - decoded_tokens
            decoded_tokens = total
            if pending is not None:
                yield pending
            pending = self._result(
                audio, new_tokens, segment_idx, time.perf_counter() - t0,
                is_streaming_chunk=True,
            )
        if pending is not None:
            pending.is_final_chunk = True
            yield pending

    # ------------------------------------------------------------------
    # Public generation modes (reference qwen3_tts.py:687-814)

    @property
    def supported_speakers(self) -> List[str]:
        return sorted((self.config.talker_config.spk_id or {}).keys())

    def generate(self, text: str, voice: Optional[str] = None,
                 speed: float = 1.0, verbose: bool = False,
                 lang_code: str = "auto", instruct: Optional[str] = None,
                 temperature: float = 0.9, top_k: int = 50, top_p: float = 1.0,
                 repetition_penalty: float = 1.05, max_tokens: int = 4096,
                 split_pattern: str = "\n", ref_audio=None,
                 ref_text: Optional[str] = None, stream: bool = False,
                 streaming_interval: float = 2.0, **kwargs):
        """Routes by model type like the reference (qwen3_tts.py:739-814):
        voice_design → instruct-described voice; custom_voice → named
        speaker (+optional instruct); base → speaker-embedding synthesis,
        or ICL voice cloning when ref_audio+ref_text are given."""
        from ....utils import load_audio

        if ref_audio is not None and isinstance(ref_audio, str):
            ref_audio = load_audio(ref_audio, sample_rate=self.sample_rate)

        common = dict(
            temperature=temperature, top_k=top_k, top_p=top_p,
            repetition_penalty=repetition_penalty, max_tokens=max_tokens,
            stream=stream, streaming_interval=streaming_interval,
            seed=kwargs.get("seed", 0),
            min_tokens=int(kwargs.get("min_tokens", 0)),
        )
        tts_model_type = getattr(self.config, "tts_model_type", "base")
        if tts_model_type == "voice_design":
            if not instruct:
                raise ValueError(
                    "VoiceDesign model requires 'instruct' to describe the "
                    "voice (e.g. 'A cheerful young female voice')"
                )
            yield from self.generate_voice_design(
                text=text, instruct=instruct, language=lang_code, **common
            )
            return
        if tts_model_type == "custom_voice":
            if not voice:
                raise ValueError(
                    "CustomVoice model requires 'voice' (speaker name); "
                    f"available: {self.supported_speakers}"
                )
            yield from self.generate_custom_voice(
                text=text, speaker=voice, language=lang_code,
                instruct=instruct, **common
            )
            return

        # base model: ICL voice cloning when both reference inputs exist
        use_icl = (
            ref_audio is not None and ref_text is not None
            and hasattr(self.speech_tokenizer, "encoder")
        )
        if use_icl:
            # ICL needs a stronger repetition penalty to prevent code
            # degeneration on long reference prefills (reference :797-799)
            common["repetition_penalty"] = max(repetition_penalty, 1.5)
            yield from self._generate_icl(
                text=text, ref_audio=ref_audio, ref_text=ref_text,
                language=lang_code, **common
            )
            return

        segments = [s.strip() for s in text.split(split_pattern) if s.strip()]
        for segment_idx, segment in enumerate(segments):
            input_embeds, trailing, tts_pad = self._prepare_generation_inputs(
                segment, language=lang_code, speaker=voice, ref_audio=ref_audio,
                instruct=instruct,
            )
            yield from self._generate_segment(
                input_embeds, trailing, tts_pad, segment_idx=segment_idx,
                **common,
            )

    def _effective_max_tokens(self, text: str, max_tokens: int) -> int:
        """Cap generation length from target text length (~3-5 codec tokens
        per text token at 12.5 Hz; factor 6 gives margin — reference
        :1286-1291) so runaway generation can't happen when EOS never
        dominates."""
        n_text = len(self.tokenizer.encode(text))
        cap = min(max_tokens, max(75, n_text * 6))
        # bucket to 128s: the cap flows into the static chunk_tokens jit
        # arg and the KV-cache length, so an unbucketed text-derived value
        # would recompile the AR decode program per distinct text length
        cap = min(-(-cap // 128) * 128, max_tokens)
        return cap

    def generate_custom_voice(self, text: str, speaker: str,
                              language: str = "auto",
                              instruct: Optional[str] = None, **kw):
        """CustomVoice models: predefined speaker + optional emotion/style
        instruction (reference qwen3_tts.py:1112-1187)."""
        if self.config.tts_model_type != "custom_voice":
            raise ValueError(
                f"Model type '{self.config.tts_model_type}' does not support "
                "generate_custom_voice (use a CustomVoice checkpoint)."
            )
        if speaker.lower() not in [s.lower() for s in self.supported_speakers]:
            raise ValueError(
                f"Speaker '{speaker}' not supported. "
                f"Available: {self.supported_speakers}"
            )
        yield from self._generate_with_instruct(
            text=text, speaker=speaker, language=language, instruct=instruct,
            **kw,
        )

    def generate_voice_design(self, text: str, instruct: str,
                              language: str = "auto", **kw):
        """VoiceDesign models: the voice is described entirely by `instruct`
        (reference qwen3_tts.py:1189-1248)."""
        if self.config.tts_model_type != "voice_design":
            raise ValueError(
                f"Model type '{self.config.tts_model_type}' does not support "
                "generate_voice_design (use a VoiceDesign checkpoint)."
            )
        yield from self._generate_with_instruct(
            text=text, speaker=None, language=language, instruct=instruct,
            **kw,
        )

    def _generate_with_instruct(self, text: str, speaker: Optional[str],
                                language: str, instruct: Optional[str],
                                temperature: float = 0.9, top_k: int = 50,
                                top_p: float = 1.0,
                                repetition_penalty: float = 1.05,
                                max_tokens: int = 4096, stream: bool = False,
                                streaming_interval: float = 2.0,
                                seed: int = 0, **_):
        """Shared instruct-mode generation (reference :1550-1613)."""
        input_embeds, trailing, tts_pad = self._prepare_generation_inputs(
            text, language=language, speaker=speaker, instruct=instruct,
        )
        yield from self._generate_segment(
            input_embeds, trailing, tts_pad, segment_idx=0, stream=stream,
            streaming_interval=streaming_interval,
            max_tokens=self._effective_max_tokens(text, max_tokens),
            temperature=temperature, top_k=top_k, top_p=top_p,
            repetition_penalty=repetition_penalty, seed=seed,
        )

    def _prepare_icl_generation_inputs(self, text: str, ref_audio,
                                       ref_text: str, language: str = "auto"):
        """Build the ICL voice-cloning prefill (reference :406-590):
        role + codec prefix (think/speaker/pad/bos) + [all text ⊕ codec_pad]
        + [codec_bos + Σ codebook embeddings of ref codes ⊕ tts_pad]."""
        cfg = self.config.talker_config

        ra = np.asarray(ref_audio, np.float32).reshape(-1)
        ref_codes = self.speech_tokenizer.encode(
            jnp.asarray(ra)[None, None, :]
        )  # (1, K, Tref)
        ref_codes = jax.device_get(ref_codes)

        ref_ids = self.tokenizer.encode(
            f"<|im_start|>assistant\n{ref_text}<|im_end|>\n"
        )
        ref_text_ids = ref_ids[3:-2]
        target_ids = self.tokenizer.encode(
            f"<|im_start|>assistant\n{text}<|im_end|>\n<|im_start|>assistant\n"
        )
        text_ids = target_ids[3:-5]

        tts_embeds = self._text_embed([
            self.config.tts_bos_token_id, self.config.tts_eos_token_id,
            self.config.tts_pad_token_id,
        ])
        tts_bos, tts_eos, tts_pad = (
            tts_embeds[:, 0:1], tts_embeds[:, 1:2], tts_embeds[:, 2:3]
        )

        text_embed = jnp.concatenate(
            [self._text_embed(list(ref_text_ids) + list(text_ids)), tts_eos],
            axis=1,
        )
        text_lens = text_embed.shape[1]

        # codec side: Σ over codebooks of the reference codes' embeddings
        codes = jnp.asarray(ref_codes, jnp.int32)
        ref_codec_embed = self.talker.model.codec_embedding(codes[:, 0])
        for i in range(cfg.num_code_groups - 1):
            ref_codec_embed = ref_codec_embed + (
                self.talker.code_predictor.codec_embedding[i](codes[:, i + 1])
            )
        codec_bos = self.talker.model.codec_embedding(
            jnp.asarray([[cfg.codec_bos_id]], jnp.int32)
        )
        codec_embed_icl = jnp.concatenate([codec_bos, ref_codec_embed], axis=1)
        codec_lens = codec_embed_icl.shape[1]

        # non-streaming overlay: all text (⊕ codec_pad) then all codec (⊕ tts_pad)
        codec_pad = self.talker.model.codec_embedding(
            jnp.asarray([[cfg.codec_pad_id]], jnp.int32)
        )
        icl_embed = jnp.concatenate(
            [
                text_embed + jnp.broadcast_to(
                    codec_pad, (1, text_lens, codec_pad.shape[-1])
                ),
                codec_embed_icl + jnp.broadcast_to(
                    tts_pad, (1, codec_lens, tts_pad.shape[-1])
                ),
            ],
            axis=1,
        )

        language_id = None
        if language.lower() != "auto" and cfg.codec_language_id:
            language_id = cfg.codec_language_id.get(language.lower())
        speaker_embed = None
        if hasattr(self, "speaker_encoder"):
            speaker_embed = self.extract_speaker_embedding(ra)
        if language_id is None:
            prefill = [cfg.codec_nothink_id, cfg.codec_think_bos_id,
                       cfg.codec_think_eos_id]
        else:
            prefill = [cfg.codec_think_id, cfg.codec_think_bos_id, language_id,
                       cfg.codec_think_eos_id]
        codec_prefix = self.talker.model.codec_embedding(
            jnp.asarray([prefill], jnp.int32)
        )
        suffix = self.talker.model.codec_embedding(
            jnp.asarray([[cfg.codec_pad_id, cfg.codec_bos_id]], jnp.int32)
        )
        parts = [codec_prefix]
        if speaker_embed is not None:
            parts.append(speaker_embed.reshape(1, 1, -1))
        parts.append(suffix)
        codec_prefix = jnp.concatenate(parts, axis=1)

        role_embed = self._text_embed(list(target_ids[:3]))
        pad_count = codec_prefix.shape[1] - 2
        combined_prefix = jnp.concatenate(
            [jnp.broadcast_to(tts_pad, (1, pad_count, tts_pad.shape[-1])),
             tts_bos],
            axis=1,
        ) + codec_prefix[:, :-1]
        input_embeds = jnp.concatenate(
            [role_embed, combined_prefix, icl_embed], axis=1
        )
        return input_embeds, tts_pad, tts_pad, ref_codes

    def _generate_icl(self, text: str, ref_audio, ref_text: str,
                      language: str = "auto", temperature: float = 0.9,
                      top_k: int = 50, top_p: float = 1.0,
                      repetition_penalty: float = 1.5,
                      max_tokens: int = 4096, stream: bool = False,
                      streaming_interval: float = 2.0, seed: int = 0, **_):
        """ICL voice cloning (reference :1250-1545): reference codes in the
        prefill context; non-streaming decode prepends them and trims."""
        input_embeds, trailing, tts_pad, ref_codes = (
            self._prepare_icl_generation_inputs(
                text=text, ref_audio=ref_audio, ref_text=ref_text,
                language=language,
            )
        )
        yield from self._generate_segment(
            input_embeds, trailing, tts_pad, segment_idx=0, stream=stream,
            streaming_interval=streaming_interval,
            max_tokens=self._effective_max_tokens(text, max_tokens),
            temperature=temperature, top_k=top_k, top_p=top_p,
            repetition_penalty=repetition_penalty, seed=seed,
            ref_codes=None if stream else ref_codes,
        )

    def model_quant_predicate(self, p, m):
        # quantize only the talker LLM; codec + speaker encoder stay fp
        return p.startswith("talker.model.layers") or p.startswith(
            "talker.code_predictor"
        )

    def make_batcher(self, **kwargs):
        """Serving batcher: continuous (slot-based) batching of concurrent
        talker+code-predictor frame loops — one lock-step fused device
        tick for all live requests (see batcher.Qwen3TTSBatcher)."""
        from .batcher import Qwen3TTSBatcher

        return Qwen3TTSBatcher(self, **kwargs)

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

"""Sesame / CSM-1B — voice-cloning TTS: Llama backbone over 12.5 Hz frames +
depth decoder across 32 Mimi codebooks.

Behavioral spec: reference tts/models/sesame/sesame.py (SesameModel :263,
generate_frame :328, Model :417, generate :672). TPU-first design: the
entire frame-generation loop — backbone step, codebook-0 sample, the
31-step depth-decoder inner loop, EOS detection — is ONE `lax.while_loop`
on device (the reference runs a python loop per frame and per codebook,
syncing every step). The host fetches the frame buffer once, then Mimi
decodes on device.
"""

from __future__ import annotations

import re
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Callable, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....lm.cache import KVCache
from ....lm.transformer import LMConfig, Transformer
from ....nn import Embedding, Linear, Module
from ..base import GenerationResult, format_duration

__all__ = ["Model", "ModelConfig", "SesameModel", "Segment"]

MIMI_REPO = "kyutai/moshiko-pytorch-bf16"
TOKENIZER_REPO = "unsloth/Llama-3.2-1B"


@dataclass
class DepthDecoderConfig(BaseModelArgs):
    backbone_hidden_size: int = 2048
    head_dim: int = 128
    hidden_size: int = 1024
    intermediate_size: int = 8192
    max_position_embeddings: int = 33
    num_attention_heads: int = 8
    num_codebooks: int = 32
    num_hidden_layers: int = 4
    num_key_value_heads: int = 2
    rms_norm_eps: float = 1e-5
    rope_scaling: Optional[dict] = None
    rope_theta: float = 500000
    vocab_size: int = 2051
    attention_bias: bool = False
    mlp_bias: bool = False


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "sesame"
    text_vocab_size: int = 128256
    audio_vocab_size: int = 2051
    audio_num_codebooks: int = 32
    attention_bias: bool = False
    audio_eos_token_id: int = 0
    codebook_eos_token_id: int = 0
    depth_decoder_config: DepthDecoderConfig = None
    head_dim: int = 64
    hidden_size: int = 2048
    intermediate_size: int = 8192
    max_position_embeddings: int = 2048
    mlp_bias: bool = False
    num_attention_heads: int = 32
    num_hidden_layers: int = 16
    num_key_value_heads: int = 8
    rms_norm_eps: float = 1e-5
    rope_scaling: Optional[dict] = None
    rope_theta: float = 500000
    vocab_size: int = 128256
    text_tokenizer: Optional[str] = None
    model_path: str = ""

    def __post_init__(self):
        if self.depth_decoder_config is None:
            self.depth_decoder_config = DepthDecoderConfig()
        elif isinstance(self.depth_decoder_config, dict):
            self.depth_decoder_config = DepthDecoderConfig.from_dict(
                self.depth_decoder_config
            )
        if self.rope_scaling is None:
            self.rope_scaling = {
                "factor": 32.0, "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                "original_max_position_embeddings": 8192, "rope_type": "llama3",
            }


def _backbone_lm_config(cfg: ModelConfig) -> LMConfig:
    return LMConfig(
        model_type="llama", hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        intermediate_size=cfg.intermediate_size,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads, head_dim=cfg.head_dim,
        rms_norm_eps=cfg.rms_norm_eps, vocab_size=8,
        rope_theta=cfg.rope_theta, rope_scaling=cfg.rope_scaling,
        attention_bias=cfg.attention_bias, mlp_bias=cfg.mlp_bias,
    )


def _decoder_lm_config(d: DepthDecoderConfig) -> LMConfig:
    return LMConfig(
        model_type="llama", hidden_size=d.hidden_size,
        num_hidden_layers=d.num_hidden_layers,
        intermediate_size=d.intermediate_size,
        num_attention_heads=d.num_attention_heads,
        num_key_value_heads=d.num_key_value_heads, head_dim=d.head_dim,
        rms_norm_eps=d.rms_norm_eps, vocab_size=8,
        rope_theta=d.rope_theta, rope_scaling=d.rope_scaling,
        attention_bias=d.attention_bias, mlp_bias=d.mlp_bias,
    )


class SesameModel(Module):
    def __init__(self, config):
        if isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        self.args = config
        self.backbone = Transformer(_backbone_lm_config(config))
        self.decoder = Transformer(_decoder_lm_config(config.depth_decoder_config))
        # embeddings are external (backbone/decoder are fed hidden states)
        del self.backbone.embed_tokens
        del self.decoder.embed_tokens

        backbone_dim = config.hidden_size
        decoder_dim = config.depth_decoder_config.hidden_size
        self.text_embeddings = Embedding(config.text_vocab_size, backbone_dim)
        self.audio_embeddings = Embedding(
            config.audio_vocab_size * config.audio_num_codebooks, backbone_dim
        )
        self.projection = Linear(backbone_dim, decoder_dim, bias=False)
        self.codebook0_head = Linear(backbone_dim, config.audio_vocab_size, bias=False)
        self.audio_head = jnp.zeros(
            (config.audio_num_codebooks - 1, decoder_dim, config.audio_vocab_size)
        )

    # ---- embeddings ----

    def embed_frames(self, tokens: jax.Array, tokens_mask: jax.Array) -> jax.Array:
        """tokens (B, T, 33): 32 audio cols + 1 text col; masked sum → (B,T,D)."""
        K = self.args.audio_num_codebooks
        V = self.args.audio_vocab_size
        text = self.text_embeddings(tokens[:, :, -1])[:, :, None, :]
        offsets = (jnp.arange(K) * V)[None, None, :]
        audio = self.audio_embeddings(tokens[:, :, :K] + offsets)
        embeds = jnp.concatenate([audio, text], axis=2)  # (B, T, 33, D)
        return (embeds * tokens_mask[..., None]).sum(axis=2)

    def make_backbone_caches(self, batch: int, max_len: int):
        cfg = self.args
        return [
            KVCache(batch, cfg.num_key_value_heads, max_len, cfg.head_dim,
                    dtype=jnp.float32)
            for _ in range(cfg.num_hidden_layers)
        ]

    def _decoder_caches(self, batch: int):
        d = self.args.depth_decoder_config
        return [
            KVCache(batch, d.num_key_value_heads, self.args.audio_num_codebooks + 1,
                    d.head_dim, dtype=jnp.float32)
            for _ in range(d.num_hidden_layers)
        ]

    # ---- one frame (in-graph) ----

    def sample_frame(self, h_last, key, temp: float, top_k: int,
                     sampler=None):
        """h_last (B, D) → frame (B, 32) with the depth-decoder inner loop.
        `sampler` (traceable (logits, key) → ids) overrides the built-in
        temp/top-k sampling (reference sesame.py:679 sampler arg)."""
        from ....lm.sample import top_k_filter

        def sample(logits, k):
            if sampler is not None:
                return sampler(logits, k).astype(jnp.int32)
            if temp == 0.0:
                return jnp.argmax(logits, axis=-1).astype(jnp.int32)
            x = logits.astype(jnp.float32) / temp
            if top_k:
                x = top_k_filter(x, top_k)
            return jax.random.categorical(k, x, axis=-1).astype(jnp.int32)

        B = h_last.shape[0]
        K = self.args.audio_num_codebooks
        key, k0 = jax.random.split(key)
        c0 = sample(self.codebook0_head(h_last), k0)  # (B,)
        c0_embed = self.audio_embeddings(c0)  # codebook 0 offset = 0

        dec_caches = self._decoder_caches(B)
        seq = jnp.stack([h_last, c0_embed], axis=1)  # (B, 2, Db)
        h, dec_caches = self.decoder(self.projection(seq), dec_caches)
        frame0 = c0[:, None]

        def body(i, state):
            h_dec_last, dec_caches, frame, key = state
            key, ki = jax.random.split(key)
            logits = jnp.einsum(
                "bd,dv->bv", h_dec_last,
                jax.lax.dynamic_index_in_dim(self.audio_head, i - 1, 0, False),
                preferred_element_type=jnp.float32,
            )
            ci = sample(logits, ki)
            frame = jax.lax.dynamic_update_slice(frame, ci[:, None], (0, i))
            ci_embed = self.audio_embeddings(ci + i * self.args.audio_vocab_size)
            h, dec_caches = self.decoder(self.projection(ci_embed[:, None]), dec_caches)
            return h[:, -1], dec_caches, frame, key

        frame = jnp.zeros((B, K), jnp.int32)
        frame = jax.lax.dynamic_update_slice(frame, frame0, (0, 0))
        state = (h[:, -1], dec_caches, frame, key)
        _, _, frame, key = jax.lax.fori_loop(1, K, body, state)
        return frame, key


@dataclass
class Segment:
    speaker: int
    text: str
    audio: np.ndarray


@partial(jax.jit, static_argnames=("max_frames", "temp", "top_k", "sampler"),
         donate_argnames=("caches",))
def _generate_frames(model: SesameModel, caches, h_last, key,
                     max_frames: int, temp: float, top_k: int, sampler=None):
    """Full on-device frame loop; returns (frames (1, max_frames, 32), n)."""
    K = model.args.audio_num_codebooks

    def cond(state):
        i, _, _, _, done, _ = state
        return (i < max_frames) & ~done

    def body(state):
        i, caches, h_last, frames, done, key = state
        frame, key = model.sample_frame(h_last, key, temp, top_k, sampler)
        is_eos = jnp.all(frame == 0)
        frames = jax.lax.dynamic_update_slice(
            frames, frame[:, None, :], (0, i, 0)
        )
        # next backbone input: audio cols = frame, text col masked out
        tokens = jnp.concatenate(
            [frame, jnp.zeros((1, 1), jnp.int32)], axis=1
        )[:, None, :]  # (1, 1, 33)
        mask = jnp.concatenate(
            [jnp.ones((1, K), bool), jnp.zeros((1, 1), bool)], axis=1
        )[:, None, :]
        emb = model.embed_frames(tokens, mask)
        h, caches = model.backbone(emb, caches)
        i = jnp.where(is_eos, i, i + 1)
        return i, caches, h[:, -1], frames, done | is_eos, key

    frames = jnp.zeros((1, max_frames, K), jnp.int32)
    state = (0, caches, h_last, frames, jnp.array(False), key)
    n, caches, h_last, frames, done, key = jax.lax.while_loop(cond, body, state)
    return frames, n


@partial(jax.jit, static_argnames=("chunk", "temp", "top_k", "sampler"),
         donate_argnames=("caches",))
def _generate_frames_chunk(model: SesameModel, caches, h_last, key, budget,
                           chunk: int, temp: float, top_k: int, sampler=None):
    """Up to `chunk` frames of the same loop, resumable: (caches, h_last)
    carry across calls so streamed frames match a monolithic decode.
    `budget` (traced) caps total frames at the caller's max_frames."""
    K = model.args.audio_num_codebooks

    def cond(state):
        i, _, _, _, done, _ = state
        return (i < chunk) & ~done & (i < budget)

    def body(state):
        i, caches, h_last, frames, done, key = state
        frame, key = model.sample_frame(h_last, key, temp, top_k, sampler)
        is_eos = jnp.all(frame == 0)
        frames = jax.lax.dynamic_update_slice(
            frames, frame[:, None, :], (0, i, 0)
        )
        tokens = jnp.concatenate(
            [frame, jnp.zeros((1, 1), jnp.int32)], axis=1
        )[:, None, :]
        mask = jnp.concatenate(
            [jnp.ones((1, K), bool), jnp.zeros((1, 1), bool)], axis=1
        )[:, None, :]
        emb = model.embed_frames(tokens, mask)
        h, caches = model.backbone(emb, caches)
        i = jnp.where(is_eos, i, i + 1)
        return i, caches, h[:, -1], frames, done | is_eos, key

    frames = jnp.zeros((1, chunk, K), jnp.int32)
    state = (0, caches, h_last, frames, jnp.array(False), key)
    n, caches, h_last, frames, done, key = jax.lax.while_loop(
        cond, body, state)
    return frames, n, caches, h_last, done, key


@partial(jax.jit, donate_argnames=("caches",))
def _prefill(model: SesameModel, caches, tokens, tokens_mask):
    emb = model.embed_frames(tokens, tokens_mask)
    h, caches = model.backbone(emb, caches)
    return h[:, -1], caches


class Model(Module):
    def __init__(self, config):
        if isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        self.model = SesameModel(config)
        self.config = config

    _text_tokenizer = None
    _mimi = None

    @property
    def sample_rate(self) -> int:
        return 24000

    @property
    def text_tokenizer(self):
        if Model._text_tokenizer is None:
            from transformers import AutoTokenizer
            from tokenizers.processors import TemplateProcessing

            repo = self.config.text_tokenizer or TOKENIZER_REPO
            tok = AutoTokenizer.from_pretrained(repo)
            bos, eos = tok.bos_token, tok.eos_token
            tok._tokenizer.post_processor = TemplateProcessing(
                single=f"{bos}:0 $A:0 {eos}:0",
                pair=f"{bos}:0 $A:0 {eos}:0 {bos}:1 $B:1 {eos}:1",
                special_tokens=[(bos, tok.bos_token_id), (eos, tok.eos_token_id)],
            )
            Model._text_tokenizer = tok
        return Model._text_tokenizer

    @property
    def audio_tokenizer(self):
        if Model._mimi is None:
            from ....codec.models.mimi.mimi import Mimi

            Model._mimi = Mimi.from_pretrained(MIMI_REPO)
        return Model._mimi

    def set_runtime(self, text_tokenizer=None, mimi=None):
        if text_tokenizer is not None:
            Model._text_tokenizer = text_tokenizer
        if mimi is not None:
            Model._mimi = mimi

    def model_quant_predicate(self, p, m):
        return not p.startswith("_audio_tokenizer")

    def make_batcher(self, **kwargs):
        """Serving batcher: continuous (slot-based) batching of concurrent
        frame loops — one lock-step fused device tick for all live
        requests (see batcher.SesameBatcher)."""
        from .batcher import SesameBatcher

        return SesameBatcher(self, **kwargs)

    # ---- tokenization (host) ----

    def _tokenize_text_segment(self, text: str, speaker: int):
        ids = np.asarray(self.text_tokenizer.encode(f"[{speaker}]{text}"))
        K = self.config.audio_num_codebooks
        frame = np.zeros((len(ids), K + 1), np.int32)
        mask = np.zeros((len(ids), K + 1), bool)
        frame[:, -1] = ids
        mask[:, -1] = True
        return frame, mask

    def _tokenize_audio(self, audio: np.ndarray, add_eos: bool = True):
        codes = np.asarray(
            self.audio_tokenizer.encode(np.asarray(audio).reshape(1, 1, -1))
        )[0]  # (K, T)
        if add_eos:
            codes = np.concatenate([codes, np.zeros((codes.shape[0], 1), int)], axis=1)
        K = self.config.audio_num_codebooks
        frame = np.zeros((codes.shape[1], K + 1), np.int32)
        mask = np.zeros((codes.shape[1], K + 1), bool)
        frame[:, :-1] = codes.T
        mask[:, :-1] = True
        return frame, mask

    def _tokenize_segment(self, segment: Segment, add_eos: bool = True):
        tf, tm = self._tokenize_text_segment(segment.text, segment.speaker)
        af, am = self._tokenize_audio(segment.audio, add_eos=add_eos)
        return np.concatenate([tf, af]), np.concatenate([tm, am])

    # ---- loading ----

    def sanitize(self, weights: dict) -> dict:
        out = {}
        for k, v in weights.items():
            if not k.startswith("model."):
                k = "model." + k
            if "attn" in k and "self_attn" not in k:
                k = k.replace("attn", "self_attn").replace("output_proj", "o_proj")
            if "mlp" in k:
                k = k.replace("w1", "gate_proj").replace("w2", "down_proj").replace(
                    "w3", "up_proj"
                )
            k = k.replace("sa_norm", "input_layernorm")
            k = k.replace("mlp_norm", "post_attention_layernorm")
            if k.endswith(".scale"):
                k = k[: -len(".scale")] + ".weight"
            out[k] = v
        return out

    # ---- generation ----

    # fallback transcripts for the hosted speaker prompts (fixed constants,
    # reference sesame.py:559-580; used when prompts/<voice>.txt is absent)
    _SPEAKER_PROMPT_TEXTS = {
        "conversational_a": (
            "like revising for an exam I'd have to try and like keep up the "
            "momentum because I'd start really early I'd be like okay I'm "
            "gonna start revising now and then like you're revising for ages "
            "and then I just like start losing steam I didn't do that for "
            "the exam we had recently to be fair that was a more of a last "
            "minute scenario but like yeah I'm trying to like yeah I noticed "
            "this yesterday that like Mondays I sort of start the day with "
            "this not like a panic but like a"
        ),
        "conversational_b": (
            "like a super Mario level. Like it's very like high detail. And "
            "like, once you get into the park, it just like, everything "
            "looks like a computer game and they have all these, like, you "
            "know, if, if there's like a, you know, like in a Mario game, "
            "they will have like a question block. And if you like, you "
            "know, punch it, a coin will come out. So like everyone, when "
            "they come into the park, they get like this little"
        ),
    }

    def default_speaker_prompt(self, voice: str,
                               repo_id: str = "sesame/csm-1b"
                               ) -> List[Segment]:
        """Hosted speaker prompt for a named voice: downloads
        prompts/<voice>.wav (+ .txt transcript when present) from the
        checkpoint repo and wraps it as a context Segment (reference
        sesame.py:556-593)."""
        from pathlib import Path as _P

        from huggingface_hub import hf_hub_download

        from ....utils import load_audio

        wav_path = hf_hub_download(repo_id=repo_id,
                                   filename=f"prompts/{voice}.wav")
        try:
            txt_path = hf_hub_download(repo_id=repo_id,
                                       filename=f"prompts/{voice}.txt")
            prompt_text = _P(txt_path).read_text()
        except Exception:
            prompt_text = self._SPEAKER_PROMPT_TEXTS[voice]
        audio = load_audio(wav_path, sample_rate=self.sample_rate)
        return [Segment(speaker=0, text=prompt_text, audio=audio)]

    def generate(
        self,
        text: Union[str, List[str]],
        voice: Optional[str] = None,
        speaker: int = 0,
        context: Optional[List[Segment]] = None,
        split_pattern: Optional[str] = r"\n+",
        max_audio_length_ms: float = 90_000,
        temperature: float = 0.9,
        top_k: int = 50,
        ref_audio=None,
        ref_text: Optional[str] = None,
        stream: bool = False,
        streaming_interval: float = 0.5,
        sampler=None,
        voice_match: bool = True,
        **kwargs,
    ):
        """reference sesame.py:672-830. stream=True yields partial audio
        every ~streaming_interval seconds of frames, decoded incrementally
        with the Mimi streaming decoder; `sampler` (a traceable
        (logits, key) → ids fn) overrides temp/top-k frame sampling."""
        from ....utils import load_audio

        context = list(context or [])
        if ref_audio is not None and isinstance(ref_audio, str):
            ref_audio = load_audio(ref_audio, sample_rate=self.sample_rate)
        if not context and ref_audio is not None and ref_text is not None:
            context = [Segment(speaker=speaker, text=ref_text, audio=ref_audio)]
        if not context and voice is not None:
            # hosted speaker prompt by name (reference sesame.py:695-701)
            context = self.default_speaker_prompt(voice)
        if not context:
            raise ValueError(
                "CSM requires a reference: pass ref_audio+ref_text, a voice "
                "name, or context segments (hosted speaker prompts need "
                "network access)."
            )

        max_frames = int(max_audio_length_ms / 80)
        if isinstance(text, str):
            prompts = re.split(split_pattern, text.strip()) if split_pattern else [text]
        else:
            prompts = list(text)

        for segment_idx, prompt in enumerate(p for p in prompts if p.strip()):
            t0 = time.perf_counter()
            if voice_match:
                gen_text = (context[0].text + " " + prompt).strip()
                cur = [Segment(speaker=speaker, text=gen_text, audio=context[0].audio)]
                toks, masks = zip(*[self._tokenize_segment(s, add_eos=False) for s in cur])
            else:
                parts = [self._tokenize_segment(s) for s in context]
                parts.append(self._tokenize_text_segment(prompt, speaker))
                toks, masks = zip(*parts)
            tokens = np.concatenate(toks)[None]
            tokens_mask = np.concatenate(masks)[None]

            # under a running server a SesameBatcher may be installed:
            # concurrent requests' frame loops then decode in lock-step
            from ....serving import get_infer_hook

            hook = get_infer_hook(self)
            if hook is not None and not stream and sampler is None:
                codes_nk = hook.submit(
                    tokens, tokens_mask, max_frames=max_frames,
                    temp=float(temperature), top_k=int(top_k),
                    seed=kwargs.get("seed", 0),
                ).result()  # (n, K)
                n = int(codes_nk.shape[0])
                if n == 0:
                    continue
                codes = codes_nk.T[None]  # (1, K, n)
            elif hook is not None and sampler is None:
                # batched + STREAMING: frames arrive through `on_frame` as
                # the batcher's fused ticks complete; regroup into
                # ~streaming_interval chunks and decode through the Mimi
                # streaming decoder exactly like the single-stream path —
                # TTFA stays one chunk even under concurrent load.
                yield from self._generate_streaming_batched(
                    hook, tokens, tokens_mask, max_frames,
                    float(temperature), int(top_k),
                    kwargs.get("seed", 0), streaming_interval, segment_idx,
                    tokens.shape[1], t0,
                    apply_watermark=kwargs.get("apply_watermark", True))
                continue
            else:
                caches = self.model.make_backbone_caches(
                    1, tokens.shape[1] + max_frames + 1
                )
                h_last, caches = _prefill(
                    self.model, caches, jnp.asarray(tokens),
                    jnp.asarray(tokens_mask)
                )
                if stream:
                    yield from self._generate_streaming(
                        caches, h_last, kwargs.get("seed", 0), max_frames,
                        float(temperature), int(top_k), sampler,
                        streaming_interval, segment_idx, tokens.shape[1], t0,
                        apply_watermark=kwargs.get("apply_watermark", True))
                    continue
                frames, n = _generate_frames(
                    self.model, caches, h_last,
                    jax.random.PRNGKey(kwargs.get("seed", 0)),
                    max_frames, float(temperature), int(top_k), sampler,
                )
                frames_np, n = jax.device_get((frames, n))
                n = int(n)
                if n == 0:
                    continue
                codes = frames_np[0, :n].T[None]  # (1, K, n)
            audio = np.asarray(self.audio_tokenizer.decode(codes)).reshape(-1)

            # Imperceptible watermark marking audio as AI-generated
            # (reference sesame.py:614-625, watermarking.py). On by default;
            # deployments should use their own private key.
            if kwargs.get("apply_watermark", True):
                from .watermarking import (
                    CSM_1B_GH_WATERMARK, load_watermarker, watermark)

                audio = watermark(
                    load_watermarker(), audio, self.sample_rate,
                    CSM_1B_GH_WATERMARK)

            elapsed = time.perf_counter() - t0
            dur = len(audio) / self.sample_rate
            yield GenerationResult(
                audio=audio,
                samples=len(audio),
                sample_rate=self.sample_rate,
                segment_idx=segment_idx,
                token_count=n,
                audio_duration=format_duration(dur),
                real_time_factor=round(elapsed / dur, 3) if dur else 0.0,
                prompt={"tokens": int(tokens.shape[1]),
                        "tokens-per-sec": round(tokens.shape[1] / elapsed, 2)},
                audio_samples={"samples": len(audio),
                               "samples-per-sec": round(len(audio) / elapsed, 2)},
                processing_time_seconds=elapsed,
                peak_memory_usage=0.0,
            )

    def _generate_streaming(self, caches, h_last, seed, max_frames,
                            temp, top_k, sampler, streaming_interval,
                            segment_idx, prompt_tokens, t0,
                            apply_watermark=True):
        """Streaming tail of generate (reference sesame.py:760-830): every
        ~streaming_interval seconds of frames, decode incrementally through
        the Mimi streaming decoder and yield a partial result. The AR loop
        resumes on device across chunks, so streamed frames match a
        monolithic decode with the same seed."""
        from ....codec.models.mimi.mimi import MimiStreamingDecoder

        interval = max(1, int(streaming_interval * 12.5))
        decoder = MimiStreamingDecoder(self.audio_tokenizer)
        key = jax.random.PRNGKey(seed)
        produced = 0
        start = t0
        watermarker = None
        if apply_watermark:
            from .watermarking import load_watermarker

            watermarker = load_watermarker()
        while produced < max_frames:
            frames, n, caches, h_last, done, key = _generate_frames_chunk(
                self.model, caches, h_last, key,
                jnp.array(max_frames - produced, jnp.int32), interval,
                temp, top_k, sampler)
            n = int(n)
            produced += n
            if n:
                codes = np.asarray(frames)[0, :n].T[None]  # (1, K, n)
                audio = np.asarray(decoder.decode_frames(codes)).reshape(-1)
                if watermarker is not None:
                    from .watermarking import CSM_1B_GH_WATERMARK, watermark

                    audio = watermark(watermarker, audio, self.sample_rate,
                                      CSM_1B_GH_WATERMARK)
                elapsed = time.perf_counter() - start
                dur = len(audio) / self.sample_rate
                yield GenerationResult(
                    audio=audio,
                    samples=len(audio),
                    sample_rate=self.sample_rate,
                    segment_idx=segment_idx,
                    token_count=n,
                    audio_duration=format_duration(dur),
                    real_time_factor=(round(elapsed / dur, 3) if dur
                                      else 0.0),
                    prompt={"tokens": int(prompt_tokens)},
                    audio_samples={"samples": len(audio),
                                   "samples-per-sec":
                                   round(len(audio) / max(elapsed, 1e-9),
                                         2)},
                    processing_time_seconds=elapsed,
                    peak_memory_usage=0.0,
                )
                start = time.perf_counter()
            if bool(done):
                break

    def _generate_streaming_batched(self, hook, tokens, tokens_mask,
                                    max_frames, temp, top_k, seed,
                                    streaming_interval, segment_idx,
                                    prompt_tokens, t0,
                                    apply_watermark=True):
        """Streaming tail under an installed SesameBatcher: the batcher
        emits each (K,) frame via `on_frame`; regroup into
        ~streaming_interval chunks and decode through the Mimi streaming
        decoder (identical chunk semantics to `_generate_streaming`, so
        concatenated audio equals the batcher's non-streamed decode)."""
        from ....codec.models.mimi.mimi import MimiStreamingDecoder
        from ....serving import stream_chunks

        interval = max(1, int(streaming_interval * 12.5))
        decoder = MimiStreamingDecoder(self.audio_tokenizer)
        watermarker = None
        if apply_watermark:
            from .watermarking import load_watermarker

            watermarker = load_watermarker()
        start = t0
        for chunk in stream_chunks(
                hook.submit, tokens, tokens_mask, chunk_size=interval,
                callback_kw="on_frame", max_frames=max_frames, temp=temp,
                top_k=top_k, seed=seed):
            codes = np.stack(chunk).T[None]  # (1, K, n)
            n = len(chunk)
            audio = np.asarray(decoder.decode_frames(codes)).reshape(-1)
            if watermarker is not None:
                from .watermarking import CSM_1B_GH_WATERMARK, watermark

                audio = watermark(watermarker, audio, self.sample_rate,
                                  CSM_1B_GH_WATERMARK)
            elapsed = time.perf_counter() - start
            dur = len(audio) / self.sample_rate
            yield GenerationResult(
                audio=audio,
                samples=len(audio),
                sample_rate=self.sample_rate,
                segment_idx=segment_idx,
                token_count=n,
                audio_duration=format_duration(dur),
                real_time_factor=round(elapsed / dur, 3) if dur else 0.0,
                prompt={"tokens": int(prompt_tokens)},
                audio_samples={"samples": len(audio),
                               "samples-per-sec":
                               round(len(audio) / max(elapsed, 1e-9), 2)},
                processing_time_seconds=elapsed,
                peak_memory_usage=0.0,
            )
            start = time.perf_counter()

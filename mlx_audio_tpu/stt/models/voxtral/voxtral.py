"""Voxtral — Whisper-style audio encoder + Mistral/Llama decoder.

Behavioral spec: reference stt/models/voxtral/voxtral.py (Encoder :107,
MultiModalProjector :147, Model :199, generate :379). The encoder output is
stacked 4-frames-at-a-time into `intermediate_size` then projected into the
LM embedding space; audio placeholder tokens in the prompt are replaced by
those embeddings. Decode runs on device. The exact chat template needs
`mistral_common` (optional); without it a minimal transcription prompt of
[bos, audio..., transcribe-ish] embeddings is used.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....lm import generate_tokens
from ....lm.transformer import CausalLM, LMConfig
from ....nn import Conv1d, Embedding, LayerNorm, Linear, Module
from ....ops.attention import scaled_dot_product_attention
from ..base import STTOutput, ensure_waveform
from ..whisper import audio as A

__all__ = ["Model", "ModelConfig"]


@dataclass
class AudioConfig(BaseModelArgs):
    num_mel_bins: int = 128
    d_model: int = 1280
    encoder_layers: int = 32
    encoder_attention_heads: int = 20
    encoder_ffn_dim: int = 5120
    intermediate_size: int = 5120
    max_source_positions: int = 1500
    scale_embedding: bool = False


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "voxtral"
    audio_config: AudioConfig = None
    text_config: dict = None
    audio_token_id: int = 24
    model_path: str = ""

    def __post_init__(self):
        if isinstance(self.audio_config, dict):
            self.audio_config = AudioConfig.from_dict(self.audio_config)
        if self.audio_config is None:
            self.audio_config = AudioConfig()
        if self.text_config is None:
            self.text_config = {}


class EncoderLayer(Module):
    def __init__(self, cfg: AudioConfig):
        d = cfg.d_model
        self.self_attn_layer_norm = LayerNorm(d)
        self.self_attn = _Attn(cfg)
        self.fc1 = Linear(d, cfg.encoder_ffn_dim)
        self.fc2 = Linear(cfg.encoder_ffn_dim, d)
        self.final_layer_norm = LayerNorm(d)

    def __call__(self, x):
        x = x + self.self_attn(self.self_attn_layer_norm(x))
        return x + self.fc2(
            jax.nn.gelu(self.fc1(self.final_layer_norm(x)), approximate=False)
        )


class _Attn(Module):
    def __init__(self, cfg: AudioConfig):
        d = cfg.d_model
        self.q_proj = Linear(d, d, bias=True)
        self.k_proj = Linear(d, d, bias=False)
        self.v_proj = Linear(d, d, bias=True)
        self.out_proj = Linear(d, d, bias=True)
        self.heads = cfg.encoder_attention_heads
        self.hd = d // self.heads

    def __call__(self, x):
        B, T, D = x.shape

        def sp(z):
            return jnp.swapaxes(z.reshape(B, T, self.heads, self.hd), 1, 2)

        out = scaled_dot_product_attention(
            sp(self.q_proj(x)), sp(self.k_proj(x)), sp(self.v_proj(x))
        )
        return self.out_proj(jnp.swapaxes(out, 1, 2).reshape(B, T, D))


class Encoder(Module):
    def __init__(self, cfg: AudioConfig):
        d = cfg.d_model
        self.conv1 = Conv1d(cfg.num_mel_bins, d, 3, padding=1)
        self.conv2 = Conv1d(d, d, 3, stride=2, padding=1)
        self.embed_positions = Embedding(cfg.max_source_positions, d)
        self.layers = [EncoderLayer(cfg) for _ in range(cfg.encoder_layers)]
        self.layer_norm = LayerNorm(d)

    def __call__(self, x):
        x = jax.nn.gelu(self.conv1(x), approximate=False)
        x = jax.nn.gelu(self.conv2(x), approximate=False)
        x = x + self.embed_positions.weight[: x.shape[1]]
        for layer in self.layers:
            x = layer(x)
        return self.layer_norm(x)


class MultiModalProjector(Module):
    def __init__(self, cfg: ModelConfig, text_hidden: int):
        self.linear_1 = Linear(cfg.audio_config.intermediate_size, text_hidden,
                               bias=False)
        self.linear_2 = Linear(text_hidden, text_hidden, bias=False)

    def __call__(self, x):
        return self.linear_2(jax.nn.gelu(self.linear_1(x), approximate=False))


def _lm_call(model, x, caches):
    """model_call for embeddings or token inputs (static for jit caching)."""
    if x.dtype in (jnp.int32, jnp.int64):
        return model(x, caches)
    h, caches = model.model(x, caches)
    logits = (
        model.lm_head(h) if hasattr(model, "lm_head")
        else model.model.embed_tokens.as_linear(h)
    )
    return logits, caches


@jax.jit
def _audio_embeds(model: "Model", mel):
    h = model.audio_tower(mel)  # (1, 1500, d)
    inter = model.config.audio_config.intermediate_size
    h = h.reshape(1, -1, inter)  # stack frames → (1, 375, inter)
    return model.multi_modal_projector(h)


class Model(Module):
    def __init__(self, config: ModelConfig):
        if isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        self.config = config
        text_cfg = LMConfig.from_dict({"model_type": "llama", **config.text_config})
        self.language_model = CausalLM(text_cfg)
        self.audio_tower = Encoder(config.audio_config)
        self.multi_modal_projector = MultiModalProjector(
            config, text_cfg.hidden_size
        )

    def model_quant_predicate(self, p, m):
        return not p.startswith("audio_tower")

    def get_audio_embeds(self, mel):
        return _audio_embeds(self, mel)

    def make_batcher(self, **kwargs):
        """Serving batcher: concurrent transcriptions share lock-step
        continuous batching of the llama decoder (the audio tower runs
        per-request; the embedding prompt prefills via submit_embeds)."""
        from ....serving import LMContinuousBatcher

        kwargs.setdefault("warm_embeds", True)
        return LMContinuousBatcher(self, lm=self.language_model, **kwargs)

    _RUNTIME: dict = {}  # id(self) → host-side objects (stable treedef)

    def _processor(self):
        """transformers VoxtralProcessor when the checkpoint ships its
        tokenizer/processor files (reference voxtral.py:311-339 loads it in
        from_pretrained); None otherwise. Cached outside the pytree so the
        model's treedef (and any jit cache keyed on it) is unchanged."""
        rt = Model._RUNTIME.setdefault(id(self), {})
        if "processor" not in rt:
            rt["processor"] = None
            if self.config.model_path:
                try:
                    from transformers import AutoProcessor

                    rt["processor"] = AutoProcessor.from_pretrained(
                        self.config.model_path)
                except Exception:
                    rt["processor"] = None
        return rt["processor"]

    def stream_generate(self, audio, *, language: str = "en",
                        max_tokens: int = 512, temperature: float = 0.0,
                        sampler=None, verbose: bool = False,
                        generation_stream: bool = False,
                        chunk_size: int = 16,
                        prompt_tokens: Optional[List[int]] = None,
                        tokenizer=None, **kwargs):
        """Yield partial transcription text (reference voxtral.py:341-377's
        token stream); decode runs on device in `chunk_size` blocks."""
        from dataclasses import dataclass as _dc

        from ....lm.detok import IncrementalDetokenizer
        from ....lm.generate import _decode_chunk, _prefill
        from ....lm.sample import make_sampler

        @_dc
        class StreamingResult:
            text: str
            is_final: bool
            start_time: float = 0.0
            end_time: float = 0.0
            language: str = "en"
            generation_tokens: int = 0

        inputs, duration, tok = self._prepare_generation(
            audio, language, prompt_tokens, tokenizer)
        lm = self.language_model
        caches = lm.make_caches(1, max_len=inputs.shape[1] + max_tokens + 1)
        logits, caches = _prefill(lm, caches, inputs, _lm_call)
        history = jnp.full((1, 64), -1, jnp.int32)
        done = jnp.zeros((1,), bool)
        key = jax.random.PRNGKey(0)
        eos = jnp.asarray([2, 4, 32000], jnp.int32)
        sampler = sampler or make_sampler(temp=float(temperature))
        detok = IncrementalDetokenizer(tok) if tok is not None else None
        produced = 0
        while produced < max_tokens:
            steps = min(chunk_size, max_tokens - produced)
            out, i, logits, caches, history, done, key = _decode_chunk(
                lm, caches, logits, history, done, key, eos, _lm_call,
                sampler, 1.0, int(steps))
            toks, nv, fin = jax.device_get((out, i, done))
            nv = int(nv)
            ended = False
            text = ""
            for t in toks[0][:nv]:
                t = int(t)
                if t in (2, 4, 32000):
                    ended = True
                    break
                text += detok.push(t) if detok else f"{t} "
            produced += nv
            final = ended or bool(fin.all()) or nv < steps or \
                produced >= max_tokens
            if final and detok:
                text += detok.flush()
            if text or final:
                yield StreamingResult(text=text, is_final=final,
                                      end_time=duration, language=language,
                                      generation_tokens=produced)
            if final:
                return

    def _prepare_generation(self, audio, language, prompt_tokens, tokenizer):
        """Build input embeddings: processor-driven transcription request
        when available (reference voxtral.py:410-414), else the minimal
        [bos, audio...] prompt. Returns (inputs, duration, tokenizer)."""
        proc = self._processor()
        if proc is not None and prompt_tokens is None and isinstance(audio, str):
            inputs = proc.apply_transcription_request(
                language=language, audio=audio,
                model_id=self.config.model_path)
            ids = np.asarray(inputs["input_ids"])
            mel = jnp.asarray(
                np.asarray(inputs["input_features"]).transpose(0, 2, 1))
            wav = ensure_waveform(audio, A.SAMPLE_RATE)
            duration = len(wav) / A.SAMPLE_RATE
            audio_emb = self.get_audio_embeds(mel)
            emb = np.asarray(jax.device_get(
                self.language_model.model.embed_tokens(
                    jnp.asarray(ids, jnp.int32))))
            mask = ids[0] == self.config.audio_token_id
            n = min(int(mask.sum()), audio_emb.shape[1])
            emb[0][np.nonzero(mask)[0][:n]] = np.asarray(
                jax.device_get(audio_emb))[0][:n]
            return jnp.asarray(emb), duration, getattr(proc, "tokenizer", proc)
        wav = ensure_waveform(audio, A.SAMPLE_RATE)
        duration = len(wav) / A.SAMPLE_RATE
        mel = A.log_mel_spectrogram(
            A.pad_or_trim(jnp.asarray(wav)),
            n_mels=self.config.audio_config.num_mel_bins,
        )[None]
        audio_emb = self.get_audio_embeds(mel)
        lm = self.language_model
        embed = lm.model.embed_tokens
        if prompt_tokens is not None:
            ids = np.asarray(prompt_tokens)
            emb = np.asarray(jax.device_get(embed(jnp.asarray(ids[None]))))
            mask = ids == self.config.audio_token_id
            n = min(mask.sum(), audio_emb.shape[1])
            emb[0][np.nonzero(mask)[0][:n]] = np.asarray(
                jax.device_get(audio_emb))[0][:n]
            inputs = jnp.asarray(emb)
        else:
            bos = embed(jnp.asarray([[1]]))
            inputs = jnp.concatenate([bos, audio_emb], axis=1)
        return inputs, duration, tokenizer

    def generate(self, audio, *, prompt_tokens: Optional[List[int]] = None,
                 max_tokens: int = 512, temperature: float = 0.0,
                 top_p: float = 0.95, top_k: int = 0, min_p: float = 0.0,
                 min_tokens_to_keep: int = 1, message=None,
                 verbose: bool = False, generation_stream: bool = False,
                 language: str = "en",
                 tokenizer=None, **kwargs) -> STTOutput:
        """reference voxtral.py:379-470. `message` is accepted for API
        compatibility (the reference builds but never consumes it);
        `generation_stream` is an MLX device-stream placement knob with no
        TPU analogue — decode already runs as one device program."""
        t0 = time.perf_counter()
        inputs, duration, tok = self._prepare_generation(
            audio, language, prompt_tokens, tokenizer)
        if tok is not None:
            tokenizer = tok
        lm = self.language_model

        # Under a running server a ContinuousBatcher may be installed:
        # concurrent transcriptions' decodes then run in lock-step (the
        # embedding prompt prefills via submit_embeds).
        from ....serving import get_infer_hook

        hook = get_infer_hook(self)
        if hook is not None:
            out_list = hook.submit_embeds(
                np.asarray(inputs[0], np.float32),
                max_tokens=int(max_tokens), eos_ids=(2, 4, 32000),
                temp=float(temperature), top_p=float(top_p),
                top_k=int(top_k), min_p=float(min_p)).result()
            seq = [int(t) for t in out_list if t not in (2, 4, 32000)]
        else:
            # prefill on embeddings, then decode token-by-token on device
            caches = lm.make_caches(
                1, max_len=inputs.shape[1] + max_tokens + 1)
            from ....lm.generate import _decode_chunk, _prefill
            from ....lm.sample import make_sampler

            logits, caches = _prefill(lm, caches, inputs, _lm_call)
            out, i, *_ = _decode_chunk(
                lm, caches, logits, jnp.full((1, 64), -1, jnp.int32),
                jnp.zeros((1,), bool), jax.random.PRNGKey(0),
                jnp.asarray([2, 4, 32000], jnp.int32), _lm_call,
                make_sampler(temp=float(temperature), top_p=float(top_p),
                             top_k=int(top_k), min_p=float(min_p),
                             min_tokens_to_keep=int(min_tokens_to_keep)),
                1.0, int(max_tokens),
            )
            toks, n = jax.device_get((out, i))
            seq = [int(t) for t in toks[0][: int(n)]
                   if t not in (2, 4, 32000)]
        text = ""
        if tokenizer is not None:
            text = tokenizer.decode(seq)
        else:
            try:
                from transformers import AutoTokenizer

                tok = AutoTokenizer.from_pretrained(self.config.model_path)
                text = tok.decode(seq, skip_special_tokens=True)
            except Exception:
                text = " ".join(str(t) for t in seq)
        wall = time.perf_counter() - t0
        if verbose:
            print(text.strip())
        return STTOutput(
            text=text.strip(), segments=None, duration=duration,
            generation_tokens=len(seq),
            generation_tps=len(seq) / max(wall, 1e-9),
            extra={"xrt": duration / max(wall, 1e-9)},
        )

    def sanitize(self, weights: dict) -> dict:
        from ....nn.sanitize import orient_weights_to_model

        out = {}
        for k, v in weights.items():
            if k.startswith("language_model.") and not k.startswith(
                ("language_model.model.", "language_model.lm_head")
            ):
                k = k.replace("language_model.", "language_model.model.", 1)
            out[k] = v
        return orient_weights_to_model(self, out)

"""GLM-ASR: rope-Whisper encoder + merge-4 MLP adapter + LLaMA decoder.

TPU-native re-implementation of the reference
mlx_audio/stt/models/glmasr/ (glmasr.py, config.py). The encoder + adapter
run as one jitted program; text decode reuses the shared on-device
while_loop decode (lm/generate).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....lm.generate import _decode_chunk, _prefill
from ....lm.sample import make_sampler
from ....lm.transformer import CausalLM, LMConfig
from ....nn import layers as nn
from ....nn.module import Module
from ....ops.rope import apply_rope, rope_cos_sin
from ..base import STTOutput, ensure_waveform
from ..whisper import audio as A

__all__ = ["Model", "ModelConfig", "WhisperConfig", "LlamaConfig"]


@dataclass
class WhisperConfig:
    d_model: int = 1280
    encoder_attention_heads: int = 20
    encoder_ffn_dim: int = 5120
    encoder_layers: int = 32
    num_mel_bins: int = 128
    max_source_positions: int = 1500
    rope_traditional: bool = True

    @classmethod
    def from_dict(cls, d: dict) -> "WhisperConfig":
        return cls(**{k: v for k, v in d.items()
                      if k in cls.__dataclass_fields__})


@dataclass
class LlamaConfig:
    vocab_size: int = 59264
    hidden_size: int = 2048
    intermediate_size: int = 6144
    num_hidden_layers: int = 28
    num_attention_heads: int = 16
    num_key_value_heads: int = 4
    head_dim: Optional[int] = None
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    tie_word_embeddings: bool = False
    eos_token_id: List[int] = field(
        default_factory=lambda: [59246, 59253, 59255])

    @classmethod
    def from_dict(cls, d: dict) -> "LlamaConfig":
        return cls(**{k: v for k, v in d.items()
                      if k in cls.__dataclass_fields__})


@dataclass
class ModelConfig:
    model_type: str = "glmasr"
    whisper_config: Any = None
    lm_config: Any = None
    merge_factor: int = 4
    use_rope: bool = True
    max_whisper_length: int = 1500
    sample_rate: int = 16000

    def __post_init__(self):
        if self.whisper_config is None:
            self.whisper_config = WhisperConfig()
        elif isinstance(self.whisper_config, dict):
            self.whisper_config = WhisperConfig.from_dict(self.whisper_config)
        if self.lm_config is None:
            self.lm_config = LlamaConfig()
        elif isinstance(self.lm_config, dict):
            self.lm_config = LlamaConfig.from_dict(self.lm_config)

    @classmethod
    def from_dict(cls, d: dict) -> "ModelConfig":
        return cls(**{k: v for k, v in d.items()
                      if k in cls.__dataclass_fields__})


class WhisperAttention(Module):
    """reference glmasr.py:137-189 (half-dim rope applied per head)."""

    def __init__(self, cfg: WhisperConfig, use_rope: bool):
        d = cfg.d_model
        self.q_proj = nn.Linear(d, d)
        self.k_proj = nn.Linear(d, d, bias=False)
        self.v_proj = nn.Linear(d, d)
        self.out_proj = nn.Linear(d, d)
        self.n_head = cfg.encoder_attention_heads
        self.use_rope = use_rope
        self.rope_traditional = cfg.rope_traditional

    def __call__(self, x):
        B, T, D = x.shape
        hd = D // self.n_head
        q = self.q_proj(x).reshape(B, T, self.n_head, hd).transpose(0, 2, 1, 3)
        k = self.k_proj(x).reshape(B, T, self.n_head, hd).transpose(0, 2, 1, 3)
        v = self.v_proj(x).reshape(B, T, self.n_head, hd).transpose(0, 2, 1, 3)
        if self.use_rope:
            # rope over the first half of the head dim (nn.RoPE(dims=hd//2))
            rd = hd // 2
            cos, sin = rope_cos_sin(jnp.arange(T), rd)
            q_r = apply_rope(q[..., :rd], cos, sin,
                             traditional=self.rope_traditional)
            k_r = apply_rope(k[..., :rd], cos, sin,
                             traditional=self.rope_traditional)
            q = jnp.concatenate([q_r, q[..., rd:]], axis=-1)
            k = jnp.concatenate([k_r, k[..., rd:]], axis=-1)
        scores = q @ k.transpose(0, 1, 3, 2) * hd**-0.5
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, T, D)
        return self.out_proj(out)


class WhisperEncoderLayer(Module):
    def __init__(self, cfg: WhisperConfig, use_rope: bool):
        self.self_attn = WhisperAttention(cfg, use_rope)
        self.self_attn_layer_norm = nn.LayerNorm(cfg.d_model)
        self.fc1 = nn.Linear(cfg.d_model, cfg.encoder_ffn_dim)
        self.fc2 = nn.Linear(cfg.encoder_ffn_dim, cfg.d_model)
        self.final_layer_norm = nn.LayerNorm(cfg.d_model)

    def __call__(self, x):
        x = x + self.self_attn(self.self_attn_layer_norm(x))
        return x + self.fc2(jax.nn.gelu(self.fc1(self.final_layer_norm(x))))


class WhisperEncoder(Module):
    def __init__(self, cfg: WhisperConfig, use_rope: bool):
        d = cfg.d_model
        self.conv1 = nn.Conv1d(cfg.num_mel_bins, d, 3, padding=1)
        self.conv2 = nn.Conv1d(d, d, 3, stride=2, padding=1)
        self.embed_positions = nn.Embedding(cfg.max_source_positions, d)
        self.layers = [WhisperEncoderLayer(cfg, use_rope)
                       for _ in range(cfg.encoder_layers)]
        self.use_rope = use_rope

    def __call__(self, mel):
        x = jax.nn.gelu(self.conv1(mel))
        x = jax.nn.gelu(self.conv2(x))
        if not self.use_rope:
            x = x + self.embed_positions.weight[: x.shape[1]]
        for layer in self.layers:
            x = layer(x)
        return x


class AdaptingMLP(Module):
    def __init__(self, input_dim: int, intermediate_dim: int,
                 output_dim: int):
        self.fc1 = nn.Linear(input_dim, intermediate_dim)
        self.fc2 = nn.Linear(intermediate_dim, output_dim)

    def __call__(self, x):
        return self.fc2(jax.nn.gelu(self.fc1(x)))


class AudioEncoder(Module):
    """reference glmasr.py:275-350."""

    def __init__(self, config: ModelConfig):
        self.config = config
        wc = config.whisper_config
        lm_h = config.lm_config.hidden_size
        self.whisper = WhisperEncoder(wc, config.use_rope)
        self.layer_norm = nn.LayerNorm(wc.d_model)
        self.proj = nn.Linear(wc.d_model, lm_h)
        self.adapting = AdaptingMLP(wc.d_model * config.merge_factor,
                                    lm_h * 2, lm_h)
        self.audio_bos_eos_token = nn.Embedding(2, lm_h)

    def __call__(self, mel):
        """mel (1, T, n_mels) → (1, T//2//merge, lm_hidden)."""
        h = self.layer_norm(self.whisper(mel))
        B, T, D = h.shape
        mf = self.config.merge_factor
        n = min((T - mf) // mf + 1, self.config.max_whisper_length // mf)
        merged = h[:, : n * mf].reshape(B, n, mf * D)
        return self.adapting(merged)


def _lm_call(model, x, caches):
    if x.dtype in (jnp.int32, jnp.int64):
        return model(x, caches)
    h, caches = model.model(x, caches)
    logits = (model.lm_head(h) if hasattr(model, "lm_head")
              else model.model.embed_tokens.as_linear(h))
    return logits, caches


@jax.jit
def _audio_embeds(model: "Model", mel):
    return model.audio_encoder(mel)


class Model(Module):
    """reference glmasr.py:389-1054."""

    _RUNTIME: dict = {}

    def __init__(self, config: Any = None):
        if isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        self.config = config or ModelConfig()
        self.audio_encoder = AudioEncoder(self.config)
        lc = self.config.lm_config
        self.language_model = CausalLM(LMConfig(
            model_type="llama", vocab_size=lc.vocab_size,
            hidden_size=lc.hidden_size,
            intermediate_size=lc.intermediate_size,
            num_hidden_layers=lc.num_hidden_layers,
            num_attention_heads=lc.num_attention_heads,
            num_key_value_heads=lc.num_key_value_heads,
            head_dim=lc.head_dim, rms_norm_eps=lc.rms_norm_eps,
            rope_theta=lc.rope_theta,
            tie_word_embeddings=lc.tie_word_embeddings))

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    def make_batcher(self, **kwargs):
        """Serving batcher: concurrent transcriptions share lock-step
        continuous batching of the llama decoder (the audio encoder runs
        per-request; the embedding prompt prefills via submit_embeds)."""
        from ....serving import LMContinuousBatcher

        kwargs.setdefault("warm_embeds", True)
        return LMContinuousBatcher(self, lm=self.language_model, **kwargs)

    def set_runtime(self, tokenizer=None):
        if tokenizer is not None:
            Model._RUNTIME.setdefault(id(self), {})["tokenizer"] = tokenizer

    def model_quant_predicate(self, p, m):
        return not p.startswith("audio_encoder")

    def _prepare_chunk_inputs(self, audio, prompt, tokenizer):
        """[boa, audio embeddings, eoa, prompt embeddings] for one ≤30 s
        chunk (reference glmasr.py:703-760 input assembly)."""
        mel = A.log_mel_spectrogram(
            A.pad_or_trim(jnp.asarray(audio)),
            n_mels=self.config.whisper_config.num_mel_bins)[None]
        audio_emb = _audio_embeds(self, mel)  # (1, Na, H)

        boa = self.audio_encoder.audio_bos_eos_token.weight[0][None, None]
        eoa = self.audio_encoder.audio_bos_eos_token.weight[1][None, None]
        lm = self.language_model
        text = prompt or "<|user|>\nPlease transcribe this audio.<|assistant|>"
        ids = np.asarray(tokenizer.encode(text), np.int64).reshape(-1)
        text_emb = lm.model.embed_tokens(jnp.asarray(ids[None], jnp.int32))
        return jnp.concatenate([boa, audio_emb, eoa, text_emb], axis=1)

    def _eos_ids(self):
        return list(self.config.lm_config.eos_token_id)

    def _stream_tokens(self, inputs, *, max_tokens, temperature,
                       top_p=1.0, top_k=0, min_p=0.0, min_tokens_to_keep=1,
                       chunk_size=16, seed=0):
        """On-device decode in chunk_size-token blocks, yielding ids
        host-side between dispatches (same pattern as qwen3_asr)."""
        lm = self.language_model
        eos = self._eos_ids()
        caches = lm.make_caches(1, max_len=inputs.shape[1] + max_tokens + 1,
                                dtype=jnp.float32)
        logits, caches = _prefill(lm, caches, inputs, _lm_call)
        history = jnp.full((1, 64), -1, jnp.int32)
        done = jnp.zeros((1,), bool)
        key = jax.random.PRNGKey(seed)
        eos_arr = jnp.asarray((eos + [-1, -1, -1])[:3], jnp.int32)
        sampler = make_sampler(temp=float(temperature), top_p=float(top_p),
                               top_k=int(top_k), min_p=float(min_p),
                               min_tokens_to_keep=int(min_tokens_to_keep))
        produced = 0
        while produced < max_tokens:
            steps = min(int(chunk_size), max_tokens - produced)
            out, i, logits, caches, history, done, key = _decode_chunk(
                lm, caches, logits, history, done, key, eos_arr, _lm_call,
                sampler, 1.0, steps)
            toks, nv, fin = jax.device_get((out, i, done))
            nv = int(nv)
            for t in toks[0][:nv]:
                t = int(t)
                if t in eos:
                    return
                yield t
            produced += nv
            if bool(fin.all()) or nv < steps:
                return

    def stream_transcribe(self, audio, *, prompt: Optional[str] = None,
                          max_tokens: int = 512, temperature: float = 0.0,
                          top_p: float = 1.0, top_k: int = 0,
                          min_p: float = 0.0, min_tokens_to_keep: int = 1,
                          chunk_duration: float = 28.0,
                          min_chunk_duration: float = 1.0,
                          chunk_size: int = 16, verbose: bool = False,
                          tokenizer=None, **kwargs):
        """Token-by-token streaming transcription of arbitrarily long
        audio (reference glmasr.py:944-1060): low-energy chunking, partial
        StreamingResults per decoded delta, chunk-final result carrying
        cumulative token counts."""
        from ....lm.detok import IncrementalDetokenizer
        from ..qwen3_asr import StreamingResult, split_audio_into_chunks

        if tokenizer is None:
            from ....utils import resolve_runtime_tokenizer

            tokenizer = resolve_runtime_tokenizer(
                self, Model._RUNTIME.setdefault(id(self), {}), "GLM-ASR")
        wav = ensure_waveform(audio, self.sample_rate)
        chunks = split_audio_into_chunks(
            wav, self.sample_rate, chunk_duration=chunk_duration,
            min_chunk_duration=min_chunk_duration, search_expand_sec=2.0)

        total_prompt = 0
        total_gen = 0
        remaining = max_tokens
        for ci, (chunk_audio, offset) in enumerate(chunks):
            chunk_sec = len(chunk_audio) / self.sample_rate
            is_last = ci == len(chunks) - 1
            inputs = self._prepare_chunk_inputs(chunk_audio, prompt,
                                                tokenizer)
            total_prompt += int(inputs.shape[1])
            detok = IncrementalDetokenizer(tokenizer)
            n = 0
            for tok in self._stream_tokens(
                    inputs, max_tokens=remaining, temperature=temperature,
                    top_p=top_p, top_k=top_k, min_p=min_p,
                    min_tokens_to_keep=min_tokens_to_keep,
                    chunk_size=chunk_size):
                text = detok.push(tok)
                prev = n / max(remaining, 1)
                n += 1
                curr = min(n / max(remaining, 1), 1.0)
                if not text:
                    continue
                if verbose:
                    print(text, end="", flush=True)
                yield StreamingResult(
                    text=text, is_final=False,
                    start_time=offset + chunk_sec * prev,
                    end_time=offset + chunk_sec * curr)
            tail = detok.flush()
            if tail:
                pos = offset + chunk_sec * min(n / max(remaining, 1), 1.0)
                yield StreamingResult(text=tail, is_final=False,
                                      start_time=pos, end_time=pos)
            total_gen += n
            remaining -= n
            yield StreamingResult(
                text="", is_final=is_last or remaining <= 0,
                start_time=offset, end_time=offset + chunk_sec,
                prompt_tokens=total_prompt, generation_tokens=total_gen)
            if remaining <= 0:
                break

    def generate(self, audio, *, prompt: Optional[str] = None,
                 max_tokens: int = 512, temperature: float = 0.0,
                 top_p: float = 1.0, top_k: int = 0, min_p: float = 0.0,
                 min_tokens_to_keep: int = 1, verbose: bool = False,
                 stream: bool = False, chunk_duration: float = 28.0,
                 min_chunk_duration: float = 1.0,
                 generation_stream: bool = False,
                 tokenizer=None, **kwargs):
        """reference glmasr.py:703-860; sampler knobs per the reference
        signature. stream=True returns the stream_transcribe generator."""
        if stream:
            return self.stream_transcribe(
                audio, prompt=prompt, max_tokens=max_tokens,
                temperature=temperature, top_k=top_k, top_p=top_p,
                min_p=min_p, min_tokens_to_keep=min_tokens_to_keep,
                chunk_duration=chunk_duration,
                min_chunk_duration=min_chunk_duration,
                verbose=verbose, tokenizer=tokenizer)
        t0 = time.perf_counter()
        audio = ensure_waveform(audio, self.sample_rate)
        duration = len(audio) / self.sample_rate
        if tokenizer is None:
            from ....utils import resolve_runtime_tokenizer

            tokenizer = resolve_runtime_tokenizer(
                self, Model._RUNTIME.setdefault(id(self), {}), "GLM-ASR")

        # long audio: split at low-energy boundaries into <=30 s chunks
        # (reference glmasr.py:23-111) and transcribe sequentially
        from ..qwen3_asr import split_audio_into_chunks

        chunk_duration = min(chunk_duration, 28.0)
        if duration <= 30.0:
            chunks = [(audio, 0.0)]
        else:
            # the splitter may move a cut up to search_expand_sec past the
            # nominal point; budget it inside the encoder's 30 s window so
            # no chunk is clipped by pad_or_trim
            chunks = split_audio_into_chunks(
                audio, self.sample_rate, chunk_duration=chunk_duration,
                min_chunk_duration=min_chunk_duration,
                search_expand_sec=2.0)
        if len(chunks) > 1:
            parts = []
            total_tokens = 0
            for chunk_audio, _off in chunks:
                out = self.generate(chunk_audio, prompt=prompt,
                                    max_tokens=max_tokens,
                                    temperature=temperature, top_p=top_p,
                                    top_k=top_k, min_p=min_p,
                                    min_tokens_to_keep=min_tokens_to_keep,
                                    verbose=verbose,
                                    chunk_duration=chunk_duration,
                                    tokenizer=tokenizer, **kwargs)
                parts.append(out.text)
                total_tokens += out.generation_tokens
            wall = time.perf_counter() - t0
            return STTOutput(text=" ".join(p for p in parts if p),
                             duration=duration,
                             generation_tokens=total_tokens,
                             generation_tps=total_tokens / max(wall, 1e-9))

        inputs = self._prepare_chunk_inputs(audio, prompt, tokenizer)
        lm = self.language_model

        eos = (list(self.config.lm_config.eos_token_id) + [-1, -1, -1])[:3]
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
                top_k=int(top_k), min_p=float(min_p)).result()
            seq = [int(t) for t in out_list if int(t) not in eos]
        else:
            caches = lm.make_caches(
                1, max_len=inputs.shape[1] + max_tokens + 1,
                dtype=jnp.float32)
            logits, caches = _prefill(lm, caches, inputs, _lm_call)
            out, i, *_ = _decode_chunk(
                lm, caches, logits, jnp.full((1, 64), -1, jnp.int32),
                jnp.zeros((1,), bool), jax.random.PRNGKey(0),
                jnp.asarray(eos, jnp.int32), _lm_call,
                make_sampler(temp=float(temperature), top_p=float(top_p),
                             top_k=int(top_k), min_p=float(min_p),
                             min_tokens_to_keep=int(min_tokens_to_keep)),
                1.0, int(max_tokens))
            toks, n = jax.device_get((out, i))
            seq = [int(t) for t in toks[0][: int(n)] if int(t) not in eos]
        wall = time.perf_counter() - t0
        if verbose:
            print(tokenizer.decode(seq).strip())
        return STTOutput(text=tokenizer.decode(seq).strip(),
                         duration=duration,
                         prompt_tokens=int(inputs.shape[1]),
                         generation_tokens=len(seq),
                         generation_tps=len(seq) / max(wall, 1e-9))

    def sanitize(self, weights: dict) -> dict:
        from ....nn.sanitize import orient_weights_to_model

        out = {}
        for key, value in weights.items():
            k = key
            k = k.replace("audio_encoder.adapting.0.",
                          "audio_encoder.adapting.fc1.")
            k = k.replace("audio_encoder.adapting.2.",
                          "audio_encoder.adapting.fc2.")
            if k.startswith("model."):
                k = "language_model." + k
            if k.startswith("lm_head."):
                k = "language_model." + k
            out[k] = value
        return orient_weights_to_model(self, out)

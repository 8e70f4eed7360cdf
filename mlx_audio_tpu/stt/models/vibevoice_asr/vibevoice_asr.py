"""VibeVoice-ASR: dual VAE encoders + Qwen2.5 LM → structured transcripts.

TPU-native re-implementation of the reference
mlx_audio/stt/models/vibevoice_asr/vibevoice_asr.py:19-955. Speech features
(acoustic + semantic VAE latents, 3200× compression) are spliced into the
chat-template prompt at <|box_start|> pad positions; decode runs through
the shared on-device `_prefill`/`_decode_chunk` while_loop (one dispatch
per 64-token chunk) instead of the reference's per-token Python loop.
"""

from __future__ import annotations

import json
import re
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....lm.sample import make_sampler
from ....lm.transformer import CausalLM, LMConfig
from ....nn import layers as nn
from ....nn.module import Module
from ....nn.sanitize import orient_weights_to_model
from ..base import STTOutput, ensure_waveform
from .audio_encoder import AcousticTokenizerEncoder, SemanticTokenizerEncoder
from .config import ModelConfig

__all__ = ["Model"]

SPEECH_START = "<|object_ref_start|>"  # reference vibevoice_asr.py:855-857
SPEECH_PAD = "<|box_start|>"
SPEECH_END = "<|object_ref_end|>"
SYSTEM_PROMPT = ("You are a helpful assistant that transcribes audio input "
                 "into text output in JSON format.")


class SpeechConnector(Module):
    """Latent → LM hidden (reference vibevoice_asr.py:19-36)."""

    def __init__(self, input_dim: int, output_dim: int, eps: float = 1e-6):
        self.fc1 = nn.Linear(input_dim, output_dim)
        self.norm = nn.RMSNorm(output_dim, eps=eps)
        self.fc2 = nn.Linear(output_dim, output_dim)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.fc2(self.norm(self.fc1(x)))


def _lm_call(model, x, caches):
    if x.dtype in (jnp.int32, jnp.int64):
        return model(x, caches)
    h, caches = model.model(x, caches)
    logits = (model.lm_head(h) if hasattr(model, "lm_head")
              else model.model.embed_tokens.as_linear(h))
    return logits, caches


class Model(Module):
    """VibeVoice-ASR (reference vibevoice_asr.py:87-955)."""

    _RUNTIME: dict = {}

    def __init__(self, config: Any = None):
        if isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        self.config = config or ModelConfig()
        self.sample_rate = self.config.sample_rate

        self.acoustic_tokenizer = AcousticTokenizerEncoder(
            self.config.acoustic_tokenizer_config)
        self.semantic_tokenizer = SemanticTokenizerEncoder(
            self.config.semantic_tokenizer_config)
        dec = self.config.decoder_config
        self.acoustic_connector = SpeechConnector(
            self.config.acoustic_vae_dim, dec.hidden_size)
        self.semantic_connector = SpeechConnector(
            self.config.semantic_vae_dim, dec.hidden_size)
        self.language_model = CausalLM(LMConfig(
            model_type="qwen2", hidden_size=dec.hidden_size,
            num_hidden_layers=dec.num_hidden_layers,
            intermediate_size=dec.intermediate_size,
            num_attention_heads=dec.num_attention_heads,
            num_key_value_heads=dec.num_key_value_heads,
            rms_norm_eps=dec.rms_norm_eps, vocab_size=dec.vocab_size,
            rope_theta=dec.rope_theta, attention_bias=True,
            tie_word_embeddings=dec.tie_word_embeddings))

    # ------------------------------------------------------------------
    def set_runtime(self, tokenizer=None):
        if tokenizer is not None:
            Model._RUNTIME.setdefault(id(self), {})["tokenizer"] = tokenizer

    def _tokenizer(self):
        from ....utils import resolve_runtime_tokenizer

        return resolve_runtime_tokenizer(
            self, Model._RUNTIME.setdefault(id(self), {}), "VibeVoice-ASR")

    # ------------------------------------------------------------------
    def encode_speech(self, audio: jnp.ndarray) -> jnp.ndarray:
        """Waveform (B, T) @24 kHz → features (B, T/3200, hidden)
        (reference vibevoice_asr.py:135-180). The acoustic branch uses the
        deterministic mean (no VAE sampling at inference)."""
        if audio.ndim == 1:
            audio = audio[None]
        acoustic = self.acoustic_connector(
            self.acoustic_tokenizer.encode(audio))
        semantic = self.semantic_connector(
            self.semantic_tokenizer.encode(audio))
        return acoustic + semantic

    def _build_prompt(self, n_speech: int, duration: float,
                      context: Optional[str], tokenizer
                      ) -> Tuple[np.ndarray, np.ndarray]:
        """Chat-template prompt with speech pads
        (reference vibevoice_asr.py:839-898)."""
        keys = "Start time, End time, Speaker ID, Content"
        if context and context.strip():
            suffix = (f"This is a {duration:.2f} seconds audio, with extra "
                      f"info: {context.strip()}\n\nPlease transcribe it "
                      f"with these keys: {keys}")
        else:
            suffix = (f"This is a {duration:.2f} seconds audio, please "
                      f"transcribe it with these keys: {keys}")
        user = SPEECH_START + SPEECH_PAD * n_speech + SPEECH_END \
            + "\n" + suffix
        prompt = (f"<|im_start|>system\n{SYSTEM_PROMPT}<|im_end|>\n"
                  f"<|im_start|>user\n{user}<|im_end|>\n"
                  f"<|im_start|>assistant\n")
        ids = np.asarray(tokenizer.encode(prompt), np.int64).reshape(-1)
        pad_id = tokenizer.convert_tokens_to_ids(SPEECH_PAD)
        mask = ids == pad_id
        return ids, mask

    def make_batcher(self, **kwargs):
        """Serving batcher: concurrent transcriptions share lock-step
        continuous batching of the qwen2 decoder (the acoustic/semantic
        tokenizers run per-request; the speech-spliced embedding prompt
        prefills via submit_embeds — same pool design as Qwen3-ASR/
        Voxtral/GLM-ASR/FunASR). Combines with MLX_AUDIO_TPU_TP for the
        9B config (utils.maybe_shard_for_serving shards the LM; the
        batcher's fused ticks then run tensor-parallel)."""
        from ....serving import LMContinuousBatcher

        kwargs.setdefault("warm_embeds", True)
        return LMContinuousBatcher(self, lm=self.language_model, **kwargs)

    # ------------------------------------------------------------------
    EOS_IDS = (151645, 151643)  # <|im_end|>, <|endoftext|>

    def _prepare_inputs(self, audio, context, tokenizer):
        """Encode speech, build the prompt, splice speech features into the
        token embeddings (reference vibevoice_asr.py:183-246)."""
        audio = ensure_waveform(audio, self.sample_rate)
        duration = len(audio) / self.sample_rate
        features = self.encode_speech(jnp.asarray(audio))  # (1, N, D)
        n_speech = features.shape[1]
        ids, mask = self._build_prompt(n_speech, duration, context,
                                       tokenizer)
        lm = self.language_model
        emb = np.array(jax.device_get(
            lm.model.embed_tokens(jnp.asarray(ids[None], jnp.int32))))
        n = min(int(mask.sum()), n_speech)
        if n:
            emb[0][np.nonzero(mask)[0][:n]] = np.asarray(
                jax.device_get(features[0]))[:n]
        return jnp.asarray(emb), ids, duration

    def _stream_tokens(self, inputs, *, max_tokens, temperature,
                       top_k=0, top_p=1.0, min_p=0.0, min_tokens_to_keep=1,
                       repetition_penalty=1.0, repetition_context_size=100,
                       chunk_size=16, seed=0):
        """Yield token ids from a chunked on-device decode (one dispatch per
        `chunk_size` block). EOS is consumed, not yielded."""
        from ....lm.generate import _decode_chunk, _prefill

        lm = self.language_model
        caches = lm.make_caches(1, max_len=inputs.shape[1] + max_tokens + 1,
                                dtype=jnp.float32)
        logits, caches = _prefill(lm, caches, inputs, _lm_call)
        history = jnp.full((1, 64), -1, jnp.int32)
        done = jnp.zeros((1,), bool)
        key = jax.random.PRNGKey(seed)
        eos_arr = jnp.asarray(list(self.EOS_IDS) + [-1], jnp.int32)
        sampler = make_sampler(temp=float(temperature), top_k=int(top_k),
                               top_p=float(top_p))
        produced = 0
        while produced < max_tokens:
            steps = min(chunk_size, max_tokens - produced)
            out, i, logits, caches, history, done, key = _decode_chunk(
                lm, caches, logits, history, done, key, eos_arr, _lm_call,
                sampler, float(repetition_penalty), int(steps))
            toks, nv, fin = jax.device_get((out, i, done))
            nv = int(nv)
            for t in toks[0][:nv]:
                t = int(t)
                if t in self.EOS_IDS:
                    return
                yield t
            produced += nv
            if bool(fin.all()) or nv < steps:
                return

    def stream_transcribe(self, audio, *, context: Optional[str] = None,
                          sampling_rate: Optional[int] = None,
                          max_tokens: int = 8192, temperature: float = 0.0,
                          top_k: int = 0, top_p: float = 1.0,
                          min_p: float = 0.0, min_tokens_to_keep: int = 1,
                          repetition_penalty: float = 1.0,
                          repetition_context_size: int = 100,
                          verbose: bool = False,
                          prefill_step_size: int = 2048,
                          chunk_size: int = 16, tokenizer=None, **kwargs):
        """Stream decoded text chunks as tokens are generated
        (reference vibevoice_asr.py:750-833). Decode runs on device in
        `chunk_size`-token blocks; text is detokenized per token host-side."""
        tokenizer = tokenizer or self._tokenizer()
        if sampling_rate is not None and sampling_rate != self.sample_rate:
            from ....utils import resample_audio

            audio = resample_audio(np.asarray(audio, np.float32),
                                   int(sampling_rate), self.sample_rate)
        inputs, _ids, _dur = self._prepare_inputs(audio, context, tokenizer)
        # incremental detok (vs reference vibevoice_asr.py:830's
        # per-token decode, which mangles multi-token UTF-8 characters)
        from ....lm.detok import IncrementalDetokenizer

        detok = IncrementalDetokenizer(tokenizer)
        for tok in self._stream_tokens(
                inputs, max_tokens=max_tokens, temperature=temperature,
                top_k=top_k, top_p=top_p, min_p=min_p,
                min_tokens_to_keep=min_tokens_to_keep,
                repetition_penalty=repetition_penalty or 1.0,
                repetition_context_size=repetition_context_size,
                chunk_size=chunk_size):
            text = detok.push(tok)
            if text:
                if verbose:
                    print(text, end="", flush=True)
                yield text
        tail = detok.flush()
        if tail:
            yield tail

    def generate(self, audio, *, context: Optional[str] = None,
                 sampling_rate: Optional[int] = None,
                 max_tokens: int = 8192, temperature: float = 0.0,
                 top_p: float = 1.0, top_k: int = 0, min_p: float = 0.0,
                 min_tokens_to_keep: int = 1,
                 repetition_penalty: Optional[float] = 1.0,
                 repetition_context_size: int = 100,
                 verbose: bool = False,
                 tokenizer=None, **kwargs) -> STTOutput:
        """Transcribe audio → structured JSON segments
        (reference vibevoice_asr.py:635-838). Sampler knobs mirror the
        reference signature (:642-648); `sampling_rate` declares the rate
        of a raw array input."""
        t0 = time.perf_counter()
        tokenizer = tokenizer or self._tokenizer()
        if sampling_rate is not None and sampling_rate != self.sample_rate:
            from ....utils import resample_audio

            audio = resample_audio(np.asarray(audio, np.float32),
                                   int(sampling_rate), self.sample_rate)
        inputs, ids, duration = self._prepare_inputs(audio, context,
                                                     tokenizer)

        lm = self.language_model
        eos = list(self.EOS_IDS)
        eos = (eos + [-1])[:3]
        # under a running server an LMContinuousBatcher may be installed:
        # concurrent transcriptions' decodes then run in lock-step (the
        # speech-spliced embedding prompt prefills via submit_embeds)
        from ....serving import get_infer_hook

        hook = get_infer_hook(self)
        if hook is not None:
            out_list = hook.submit_embeds(
                np.asarray(inputs[0], np.float32),
                max_tokens=int(max_tokens),
                eos_ids=tuple(e for e in eos if e >= 0),
                temp=float(temperature), top_p=float(top_p),
                top_k=int(top_k), min_p=float(min_p),
                repetition_penalty=float(repetition_penalty or 1.0),
                repetition_context_size=max(repetition_context_size, 1),
            ).result()
            seq = [int(t) for t in out_list if int(t) not in eos]
        else:
            caches = lm.make_caches(
                1, max_len=inputs.shape[1] + max_tokens + 1,
                dtype=jnp.float32)
            from ....lm.generate import _decode_chunk, _prefill

            logits, caches = _prefill(lm, caches, inputs, _lm_call)
            out, i, *_ = _decode_chunk(
                lm, caches, logits,
                jnp.full((1, max(repetition_context_size, 1)), -1,
                         jnp.int32),
                jnp.zeros((1,), bool), jax.random.PRNGKey(0),
                jnp.asarray(eos, jnp.int32), _lm_call,
                make_sampler(temp=float(temperature), top_p=float(top_p),
                             top_k=int(top_k), min_p=float(min_p),
                             min_tokens_to_keep=int(min_tokens_to_keep)),
                float(repetition_penalty or 1.0), int(max_tokens))
            toks, nt = jax.device_get((out, i))
            seq = [int(t) for t in toks[0][: int(nt)] if int(t) not in eos]
        text = tokenizer.decode(seq)
        if verbose:
            print(text)
        segments = self.parse_transcription(text)
        plain = " ".join(s.get("text", "") for s in segments) or text
        wall = time.perf_counter() - t0
        return STTOutput(
            text=plain.strip(), duration=duration,
            segments=[{"start": s.get("start"), "end": s.get("end"),
                       "text": s.get("text", ""),
                       "speaker_id": s.get("speaker_id")}
                      for s in segments] or None,
            prompt_tokens=int(ids.shape[0]), generation_tokens=len(seq),
            generation_tps=len(seq) / max(wall, 1e-9),
            extra={"total_time": wall, "raw_text": text})

    # ------------------------------------------------------------------
    @staticmethod
    def parse_transcription(text: str) -> List[Dict[str, Any]]:
        """Extract structured JSON segments
        (reference vibevoice_asr.py:900-955)."""
        try:
            if "```json" in text:
                s = text.find("```json") + 7
                raw = text[s: text.find("```", s)].strip()
            else:
                s = text.find("[")
                if s == -1:
                    s = text.find("{")
                if s == -1:
                    return []
                depth = 0
                e = s
                for i in range(s, len(text)):
                    if text[i] in "[{":
                        depth += 1
                    elif text[i] in "]}":
                        depth -= 1
                        if depth == 0:
                            e = i + 1
                            break
                raw = text[s:e]
            result = json.loads(raw)
            if isinstance(result, dict):
                result = [result]
            keymap = {"Start time": "start", "Start": "start",
                      "End time": "end", "End": "end",
                      "Speaker ID": "speaker_id", "Speaker": "speaker_id",
                      "Content": "text"}
            out = []
            for item in result:
                if isinstance(item, dict):
                    seg = {new: item[old] for old, new in keymap.items()
                           if old in item}
                    if seg:
                        out.append(seg)
            return out
        except Exception:
            return []

    # ------------------------------------------------------------------
    def sanitize(self, weights: dict) -> dict:
        """HF key remap (reference vibevoice_asr.py:289-392)."""
        out = {}
        for key, value in weights.items():
            k = key
            if k.startswith("model."):
                k = k[6:]
            if "acoustic_tokenizer.decoder" in k:
                continue
            if ("acoustic_tokenizer.encoder." in k
                    or "semantic_tokenizer.encoder." in k):
                k = re.sub(r"\.downsample_layers\.(\d+)\.0\.conv\.conv\.",
                           r".downsample_layers.\1.conv.", k)
                k = k.replace(".head.conv.conv.", ".head.conv.")
                k = k.replace(".mixer.conv.conv.conv.", ".mixer.conv.conv.")
            if k.startswith("language_model.layers."):
                k = "language_model.model." + k[len("language_model."):]
            elif k.startswith("language_model.embed_tokens"):
                k = ("language_model.model.embed_tokens"
                     + k[len("language_model.embed_tokens"):])
            elif k.startswith("language_model.norm"):
                k = ("language_model.model.norm"
                     + k[len("language_model.norm"):])
            if k.startswith("lm_head."):
                k = "language_model." + k
            if "position_ids" in k or "fix_std" in k:
                continue
            out[k] = value
        return orient_weights_to_model(self, out)

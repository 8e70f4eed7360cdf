"""VibeVoice streaming TTS: split Qwen2 LM + diffusion head + VAE decoder.

TPU-native re-implementation of the reference
mlx_audio/tts/models/vibevoice/vibevoice.py:25-738. The reference runs one
Python-level DPM-Solver step per diffusion timestep per latent; here each
6-latent speech window — including the full CFG'd DPM-Solver++ sampling of
every latent and the EOS classifier — is ONE jitted `lax.while_loop`
dispatch, with solver coefficients precomputed on host (scheduler.py). Text
is fed in 5-token windows between speech windows exactly as the reference
interleaves them.
"""

from __future__ import annotations

import time
from functools import lru_cache, partial
from typing import Any, Generator, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....lm.cache import KVCache
from ....nn.layers import Embedding
from ....nn.module import Module
from ....nn.sanitize import orient_weights_to_model
from .acoustic_tokenizer import AcousticTokenizer
from .config import ModelConfig
from .diffusion_head import DiffusionHead
from .language_model import BinaryClassifier, Qwen2Stack, SpeechConnector
from .scheduler import dpm_solver_coeffs

__all__ = ["Model"]

TTS_TEXT_WINDOW_SIZE = 5  # reference vibevoice.py:21-22
TTS_SPEECH_WINDOW_SIZE = 6


@lru_cache(maxsize=8)
def _coeffs(num_train: int, n_steps: int, schedule: str, pred: str):
    return dpm_solver_coeffs(num_train, n_steps, schedule, pred)


def _sample_latent_in_graph(model, cond, neg_cond, key, n_steps: int,
                            cfg_scale):
    """CFG'd DPM-Solver++ sampling, fully in-graph
    (reference vibevoice.py:321-408 sample_speech_tokens). cond/neg_cond:
    (1, D) → latent (1, latent_size)."""
    c = _coeffs(model.config.diffusion_head_config.ddpm_num_steps, n_steps,
                model.config.diffusion_head_config.ddpm_beta_schedule,
                model.config.diffusion_head_config.prediction_type)
    latent_dim = model.config.acoustic_vae_dim
    x = jax.random.normal(key, (1, latent_dim), jnp.float32)
    cond2 = jnp.concatenate([cond, neg_cond], axis=0).astype(jnp.float32)

    num_train = model.config.diffusion_head_config.ddpm_num_steps
    timesteps = [float(round((num_train - 1) * (1.0 - i / n_steps)))
                 for i in range(n_steps)]

    prev_x0 = jnp.zeros_like(x)
    for i in range(n_steps):
        t2 = jnp.full((2,), timesteps[i], jnp.float32)
        eps2 = model.prediction_head(jnp.concatenate([x, x], axis=0), t2,
                                     cond2)
        eps = eps2[1:] + cfg_scale * (eps2[:1] - eps2[1:])

        a_cur, s_cur = float(c.alpha[i]), float(c.sigma[i])
        if c.prediction_type == "epsilon":
            x0 = (x - s_cur * eps) / a_cur
        else:  # v_prediction
            x0 = a_cur * x - s_cur * eps
        a_next, s_next = float(c.alpha[i + 1]), float(c.sigma[i + 1])
        h = float(c.lam[i + 1] - c.lam[i])
        sigma_ratio = (s_next / s_cur) if s_cur > 0 else 0.0
        em1 = float(np.exp(-h) - 1.0)
        if c.orders[i] == 1 or i == 0:
            x = sigma_ratio * x - a_next * em1 * x0
        else:
            h0 = float(c.lam[i] - c.lam[i - 1])
            r0 = h0 / h if h != 0 else 1.0
            d1 = (x0 - prev_x0) / r0
            x = sigma_ratio * x - a_next * em1 * x0 \
                - 0.5 * a_next * em1 * d1
        prev_x0 = x0
    return x


@partial(jax.jit, donate_argnames=("lm_caches", "tts_caches", "neg_caches"))
def _text_window_step(model, lm_caches, tts_caches, neg_caches, token_ids):
    """Feed one ≤5-token text window through lower LM + both TTS streams
    (reference vibevoice.py:600-646). Returns new caches + last hiddens."""
    w = token_ids.shape[1]
    embeds = model.language_model.embed_tokens(token_ids)
    lm_out, lm_caches = model.language_model(embeds, lm_caches)

    type_emb = model.tts_input_types.weight[1][None, None]  # text type
    tts_in = lm_out + type_emb
    tts_out, tts_caches = model.tts_language_model(tts_in, tts_caches)

    neg_in = jnp.zeros_like(lm_out) + type_emb
    neg_out, neg_caches = model.tts_language_model(neg_in, neg_caches)
    return (lm_caches, tts_caches, neg_caches,
            tts_out[:, -1], neg_out[:, -1])


@partial(jax.jit,
         static_argnames=("n_window", "ddpm_steps"),
         donate_argnames=("tts_caches", "neg_caches"))
def _speech_window_loop(model, tts_caches, neg_caches, pos_h, neg_h, key,
                        n_window: int, ddpm_steps: int, cfg_scale):
    """Generate up to n_window speech latents with per-latent EOS check —
    ONE dispatch (reference vibevoice.py:646-696). Returns
    (latents (n_window, latent), count, finished, caches, hiddens)."""
    latent_dim = model.config.acoustic_vae_dim
    out = jnp.zeros((n_window, latent_dim), jnp.float32)

    def cond(s):
        return (s[0] < n_window) & ~s[7]

    def body(s):
        i, tts_caches, neg_caches, pos_h, neg_h, out, key, done = s
        key, sub = jax.random.split(key)
        latent = _sample_latent_in_graph(model, pos_h, neg_h, sub,
                                         ddpm_steps, cfg_scale)  # (1, L)
        out = out.at[i].set(latent[0])

        acoustic = model.acoustic_connector(latent[:, None])  # (1, 1, D)
        type_emb = model.tts_input_types.weight[0][None, None]  # speech
        tts_out, tts_caches = model.tts_language_model(
            acoustic + type_emb, tts_caches)
        neg_out, neg_caches = model.tts_language_model(
            acoustic + type_emb, neg_caches)
        pos_h, neg_h = tts_out[:, -1], neg_out[:, -1]
        eos = jax.nn.sigmoid(
            model.tts_eos_classifier(pos_h)[0, 0]) > 0.5
        return (i + 1, tts_caches, neg_caches, pos_h, neg_h, out, key,
                done | eos)

    state = (jnp.array(0, jnp.int32), tts_caches, neg_caches, pos_h,
             neg_h, out, key, jnp.array(False))
    i, tts_caches, neg_caches, pos_h, neg_h, out, _, done = \
        jax.lax.while_loop(cond, body, state)
    return out, i, done, tts_caches, neg_caches, pos_h, neg_h


class Model(Module):
    """VibeVoice streaming TTS (reference vibevoice.py:25-738)."""

    _RUNTIME: dict = {}

    def __init__(self, config: Any = None):
        if isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        self.config = config or ModelConfig()
        dec = self.config.decoder_config
        tts_layers = self.config.tts_backbone_num_hidden_layers
        lm_layers = dec.num_hidden_layers - tts_layers

        self.language_model = Qwen2Stack(dec, lm_layers, use_norm=False,
                                         with_embed=True)
        self.tts_language_model = Qwen2Stack(dec, tts_layers, use_norm=True,
                                             with_embed=False)
        self.tts_input_types = Embedding(2, dec.hidden_size)
        self.acoustic_tokenizer = AcousticTokenizer(
            self.config.acoustic_tokenizer_config)
        self.acoustic_connector = SpeechConnector(
            self.config.acoustic_vae_dim, dec.hidden_size)
        self.prediction_head = DiffusionHead(
            self.config.diffusion_head_config)
        self.tts_eos_classifier = BinaryClassifier(dec.hidden_size)
        self.speech_scaling_factor = jnp.array(1.0)
        self.speech_bias_factor = jnp.array(0.0)
        self.ddpm_inference_steps = (
            self.config.diffusion_head_config.ddpm_num_inference_steps)

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    # ------------------------------------------------------------------
    def set_runtime(self, tokenizer=None):
        if tokenizer is not None:
            Model._RUNTIME.setdefault(id(self), {})["tokenizer"] = tokenizer

    def _tokenizer(self):
        rt = Model._RUNTIME.setdefault(id(self), {})
        tok = rt.get("tokenizer")
        if tok is None:
            # reference vibevoice.py:310-320: tokenizer name comes from
            # preprocessor_config.json (language_model_pretrained_name),
            # falling back to Qwen2.5-0.5B; tokenizer files shipped next
            # to the weights win when present.
            model_path = getattr(self.config, "model_path", None)
            if model_path:
                import json as _json
                from pathlib import Path as _Path

                from ....utils import load_hf_tokenizer

                name = None
                if (_Path(model_path) / "tokenizer.json").exists() or (
                        _Path(model_path) / "tokenizer_config.json").exists():
                    name = model_path
                else:
                    pre = _Path(model_path) / "preprocessor_config.json"
                    if pre.exists():
                        name = _json.loads(pre.read_text()).get(
                            "language_model_pretrained_name")
                    name = name or "Qwen/Qwen2.5-0.5B"
                tok = load_hf_tokenizer(name)
                rt["tokenizer"] = tok
        if tok is None:
            raise RuntimeError("VibeVoice tokenizer not loaded — call "
                               "set_runtime(tokenizer=...) or load via "
                               "load_model()")
        return tok

    # ------------------------------------------------------------------
    def sanitize(self, weights: dict) -> dict:
        """HF key remap (reference vibevoice.py:198-302)."""
        import re
        out = {}
        for k, v in weights.items():
            if k.startswith("model."):
                k = k[6:]
            k = re.sub(r"\.t_embedder\.mlp\.(\d+)\.",
                       r".t_embedder.mlp.layers.\1.", k)
            k = re.sub(r"\.adaLN_modulation\.(\d+)\.",
                       r".adaLN_modulation.layers.\1.", k)
            if "rotary_emb.inv_freq" in k:
                continue
            out[k] = v
        return orient_weights_to_model(self, out)

    # ------------------------------------------------------------------
    def load_voice(self, voice: str) -> dict:
        """Load a voice-cache from `<model_path>/voices/<voice>.safetensors`
        (or a direct file path) and parse it (reference
        vibevoice.py:134-192)."""
        from pathlib import Path

        from safetensors.numpy import load_file

        path = Path(voice)
        if not path.exists():
            mp = getattr(self.config, "model_path", None)
            if mp:
                path = Path(mp) / "voices" / f"{voice}.safetensors"
        if not path.exists():
            raise FileNotFoundError(f"Voice cache not found: {voice}")
        return self.load_voice_arrays(load_file(str(path)))

    def load_voice_arrays(self, tensors: dict) -> dict:
        """Parse a voice-cache dict of numpy/jnp arrays into
        (lm/tts/neg caches, hiddens) (reference vibevoice.py:131-192).
        Key/value layout: (B, kv_heads, seq, head_dim)."""
        lm_layers = self.language_model.config.num_hidden_layers
        tts_layers = self.tts_language_model.config.num_hidden_layers

        def kv(prefix, i):
            return (np.asarray(tensors[f"{prefix}_key_{i}"]),
                    np.asarray(tensors[f"{prefix}_value_{i}"]))

        voice = {
            "lm_hidden": np.asarray(tensors["lm_hidden"]),
            "tts_hidden": np.asarray(tensors["tts_lm_hidden"]),
            "neg_hidden": np.asarray(tensors["neg_tts_lm_hidden"]),
            "lm_kv": [kv("lm", i) for i in range(lm_layers)],
            "tts_kv": [kv("tts_lm", i) for i in range(tts_layers)],
            "neg_kv": [kv("neg_tts_lm", i) for i in range(tts_layers)],
        }
        return voice

    def _make_caches(self, stack: Qwen2Stack, max_len: int,
                     prefill: Optional[List[Tuple[np.ndarray, np.ndarray]]]
                     ) -> List[KVCache]:
        caches = stack.make_caches(1, max_len, dtype=jnp.float32)
        if prefill is None:
            return caches
        out = []
        for cache, (k, v) in zip(caches, prefill):
            seq = k.shape[2]
            nk = cache.k.at[:, :, :seq].set(jnp.asarray(k, cache.k.dtype))
            nv = cache.v.at[:, :, :seq].set(jnp.asarray(v, cache.v.dtype))
            out.append(cache.replace(k=nk, v=nv,
                                     pos=jnp.array(seq, jnp.int32)))
        return out

    # ------------------------------------------------------------------
    def generate_latents(self, text_ids: np.ndarray, max_tokens: int = 512,
                         cfg_scale: float = 1.5,
                         ddpm_steps: Optional[int] = None,
                         voice: Optional[dict] = None,
                         key: Optional[jax.Array] = None
                         ) -> Tuple[np.ndarray, int]:
        """Run the interleaved text/speech loop → (latents (N, D), N)
        (reference vibevoice.py:553-700)."""
        ddpm_steps = ddpm_steps or self.ddpm_inference_steps

        # under a running server a VibeVoiceBatcher may be installed:
        # concurrent requests' text/speech rounds then advance in lock-step
        from ....serving import get_infer_hook

        hook = get_infer_hook(self)
        if hook is not None and key is None \
                and ddpm_steps == hook.ddpm_steps:
            lat = hook.submit(text_ids, max_tokens=max_tokens,
                              cfg_scale=cfg_scale, voice=voice,
                              seed=0).result()
            return lat, lat.shape[0]

        if key is None:
            key = jax.random.PRNGKey(0)
        text_ids = np.asarray(text_ids, np.int32).reshape(1, -1)
        seq_len = text_ids.shape[1]

        voice_len = voice["tts_kv"][0][0].shape[2] if voice else 0
        lm_voice_len = voice["lm_kv"][0][0].shape[2] if voice else 0
        max_len = ((lm_voice_len + seq_len + 63) // 64) * 64 + 64
        tts_max = ((voice_len + seq_len + max_tokens + 63) // 64) * 64 + 64

        lm_caches = self._make_caches(self.language_model, max_len,
                                      voice["lm_kv"] if voice else None)
        tts_caches = self._make_caches(self.tts_language_model, tts_max,
                                       voice["tts_kv"] if voice else None)
        neg_caches = self._make_caches(self.tts_language_model, tts_max,
                                       voice["neg_kv"] if voice else None)

        pos_h = (jnp.asarray(voice["tts_hidden"])[:, -1]
                 if voice else None)
        neg_h = (jnp.asarray(voice["neg_hidden"])[:, -1]
                 if voice else None)

        latents: List[np.ndarray] = []
        finished = False
        step = 0
        text_pos = 0
        while not finished and step < max_tokens:
            if text_pos < seq_len:
                w = min(TTS_TEXT_WINDOW_SIZE, seq_len - text_pos)
                window = jnp.asarray(text_ids[:, text_pos: text_pos + w])
                text_pos += w
                lm_caches, tts_caches, neg_caches, pos_h, neg_h = \
                    _text_window_step(self, lm_caches, tts_caches,
                                      neg_caches, window)
            if pos_h is None:
                break
            n_win = min(TTS_SPEECH_WINDOW_SIZE, max_tokens - step)
            key, sub = jax.random.split(key)
            out, count, done, tts_caches, neg_caches, pos_h, neg_h = \
                _speech_window_loop(self, tts_caches, neg_caches, pos_h,
                                    neg_h, sub, n_win, ddpm_steps,
                                    jnp.float32(cfg_scale))
            count = int(count)
            if count:
                latents.append(np.asarray(out)[:count])
            step += count
            finished = bool(done) or (text_pos >= seq_len and count == 0)

        if not latents:
            return np.zeros((0, self.config.acoustic_vae_dim),
                            np.float32), 0
        lat = np.concatenate(latents, axis=0)
        return lat, lat.shape[0]

    def make_batcher(self, slots: int = 2, max_len: int = 2048,
                     lm_max_len: int = 1024, **kwargs):
        """Slot-based continuous batching over the text/speech round loop
        (see batcher.py)."""
        from .batcher import VibeVoiceBatcher

        return VibeVoiceBatcher(self, slots=slots, max_len=max_len,
                                lm_max_len=lm_max_len, **kwargs)

    def decode_latents(self, latents: np.ndarray) -> np.ndarray:
        """Scale + VAE-decode latents → audio (reference
        vibevoice.py:698-706)."""
        scaled = (jnp.asarray(latents)[None]
                  / self.speech_scaling_factor - self.speech_bias_factor)
        audio = self.acoustic_tokenizer.decode(scaled)  # (1, T, 1)
        return np.asarray(audio[0, :, 0])

    # ------------------------------------------------------------------
    def generate(self, text: Union[str, List[str]], max_tokens: int = 512,
                 cfg_scale: float = 1.5, ddpm_steps: Optional[int] = None,
                 voice: Optional[Any] = None, seed: int = 0,
                 verbose: bool = False, **kwargs) -> Generator:
        """Single or multi-speaker generation
        (reference vibevoice.py:410-738). `voice` may be a parsed
        voice-cache dict (see load_voice_arrays) or a list of them for
        dialogue mode."""
        from ..base import GenerationResult

        tokenizer = self._tokenizer()
        texts = text if isinstance(text, list) else [text]
        voices = voice if isinstance(voice, list) else [voice] * len(texts)
        # voice names resolve against <model_path>/voices/*.safetensors
        voices = [self.load_voice(v) if isinstance(v, str) else v
                  for v in voices]

        from ....serving import get_infer_hook

        start = time.time()
        segments = []
        total_tokens = 0
        key = jax.random.PRNGKey(seed)
        for seg_idx, (seg_text, seg_voice) in enumerate(zip(texts, voices)):
            ids = np.asarray(tokenizer.encode(seg_text.strip() + "\n"),
                             np.int32)
            key, sub = jax.random.split(key)
            hook = get_infer_hook(self)
            if hook is not None and (ddpm_steps or
                                     self.ddpm_inference_steps) \
                    == hook.ddpm_steps:
                # concurrent segments fuse in the slot pool
                lat = hook.submit(
                    ids, max_tokens=max_tokens, cfg_scale=cfg_scale,
                    voice=seg_voice, seed=seed * 1000 + seg_idx).result()
                n = lat.shape[0]
            else:
                lat, n = self.generate_latents(
                    ids, max_tokens=max_tokens, cfg_scale=cfg_scale,
                    ddpm_steps=ddpm_steps, voice=seg_voice, key=sub)
            total_tokens += n
            if n:
                segments.append(self.decode_latents(lat))

        audio = (np.concatenate(segments)
                 if segments else np.zeros(0, np.float32))
        elapsed = time.time() - start
        dur = len(audio) / self.sample_rate
        yield GenerationResult(
            audio=audio, samples=len(audio), sample_rate=self.sample_rate,
            segment_idx=0, token_count=total_tokens,
            audio_duration=f"{dur:.2f}s",
            real_time_factor=elapsed / max(dur, 1e-9),
            prompt={"tokens": total_tokens},
            audio_samples={"samples-per-sec":
                           len(audio) / max(elapsed, 1e-9)},
            processing_time_seconds=elapsed, peak_memory_usage=0.0)

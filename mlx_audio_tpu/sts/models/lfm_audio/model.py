"""LFM2.5-Audio: unified speech↔text LLM (Liquid).

TPU-native re-implementation of the reference
mlx_audio/sts/models/lfm_audio/model.py:26-1098. The hybrid LFM2 backbone
decodes through functional fixed-shape caches; each audio frame's 8-deep
codebook autoregression (depthformer) runs fully in-graph as one dispatch
(`_audio_frame`), and text steps are one dispatch each. Interleaved and
sequential modality scheduling matches the reference.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Generator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....nn import layers as nn
from ....nn.module import Module
from .config import LFM2AudioConfig
from .conformer import MLP, ConformerEncoder
from .lfm2 import Lfm2Model
from .processor import LFMModality
from .transformer import Depthformer

__all__ = ["LFM2AudioModel", "Model", "GenerationConfig"]

# reference model.py:37-42
AUDIO_START_TOKEN = 128
IM_END_TOKEN = 7
TEXT_END_TOKEN = 130
AUDIO_EOS_TOKEN = 2048


class AudioEmbeddingWithNorm(Module):
    """Per-codebook depth embedding + logits head
    (reference model.py:54-159)."""

    def __init__(self, vocab_size: int, dim: int):
        self.embedding = nn.Embedding(vocab_size, dim)
        self.embedding_norm = nn.RMSNorm(dim)
        self.to_logits = nn.Linear(dim, vocab_size, bias=False)

    def embed(self, x):
        return self.embedding_norm(self.embedding(x))

    def embed_raw(self, x):
        return self.embedding(x)

    def logits(self, x):
        return self.to_logits(x)


class AudioEmbedding(Module):
    """Shared offset embedding summed over codebooks
    (reference model.py:77-136)."""

    def __init__(self, vocab_size: int, dim: int, num_codebooks: int = 8,
                 tie: bool = False):
        self.vocab_size = vocab_size
        self.num_codebooks = num_codebooks
        self.embedding = nn.Embedding(vocab_size * num_codebooks, dim)
        self.embedding_norm = nn.RMSNorm(dim)
        self.to_logits = nn.Linear(dim, vocab_size * num_codebooks,
                                   bias=False)

    def __call__(self, codes: jnp.ndarray) -> jnp.ndarray:
        """codes (..., K) → (..., dim)."""
        K = codes.shape[-1]
        offsets = jnp.arange(K) * self.vocab_size
        return self.embedding(codes + offsets).sum(axis=-2)


class AudioHead(Module):
    """Depthformer wrapper (reference model.py:161-214)."""

    def __init__(self, cfg: LFM2AudioConfig):
        self.depthformer_dim = cfg.depthformer.dim
        self.num_codebooks = cfg.codebooks
        self.depthformer = Depthformer(
            layers=cfg.depthformer.layers, dim=cfg.depthformer.dim,
            num_heads=cfg.depthformer.num_heads,
            num_kv_heads=cfg.depthformer.num_kv_heads,
            tie=cfg.depthformer.tie)


# ---------------------------------------------------------------- jits
@partial(jax.jit, donate_argnames=("caches",))
def _lfm_forward(model, embeds, caches):
    return model.lfm(embeds, caches)


@partial(jax.jit, static_argnames=("temperature", "top_k"))
def _sample_text(model, hidden, key, temperature: float, top_k: int):
    """Greedy/top-k text sampling (reference model.py:662-686)."""
    logits = model.lfm.embed_tokens.as_linear(hidden)[:, -1, :]
    if temperature <= 0:
        return jnp.argmax(logits, axis=-1)
    logits = logits / temperature
    if 0 < top_k < logits.shape[-1]:
        kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
        logits = jnp.where(logits >= kth, logits, -jnp.inf)
    return jax.random.categorical(key, logits)


@partial(jax.jit, static_argnames=("temperature", "top_k"))
def _audio_frame(model, hidden, key, temperature: float, top_k: int):
    """Sample one frame's 8 codebooks with sequential conditioning — the
    whole depth autoregression in ONE dispatch
    (reference model.py:687-768). hidden: (B, 1, D)."""
    B = hidden.shape[0]
    K = model.config.codebooks
    dd = model.audio_head.depthformer_dim
    depth_in = model.depth_linear(hidden).reshape(B, K, dd)

    greedy = temperature <= 0 or top_k == 1
    seq = jnp.zeros((B, K, dd))
    codes = []
    prev_emb = jnp.zeros((B, dd))
    for i in range(K):
        seq = seq.at[:, i].set(depth_in[:, i] + prev_emb)
        # causal recompute over the first i+1 depth positions
        h = model.audio_head.depthformer(seq[:, : i + 1])
        logits = model.depth_embeddings[i].logits(h[:, -1])
        if greedy:
            code = jnp.argmax(logits, axis=-1)
        else:
            lg = logits / temperature
            if 0 < top_k < lg.shape[-1]:
                kth = jnp.sort(lg, axis=-1)[:, -top_k][:, None]
                lg = jnp.where(lg >= kth, lg, -jnp.inf)
            key, sub = jax.random.split(key)
            code = jax.random.categorical(sub, lg)
        codes.append(code)
        prev_emb = model.depth_embeddings[i].embed_raw(code)
    return jnp.stack(codes, axis=-1)  # (B, K)


class LFM2AudioModel(Module):
    """reference model.py:217-1098."""

    def __init__(self, config: Optional[LFM2AudioConfig] = None):
        if isinstance(config, dict):
            config = LFM2AudioConfig.from_dict(config)
        self.config = config or LFM2AudioConfig()
        config = self.config

        self.audio_encoder = ConformerEncoder(config.encoder)
        self.audio_adapter = MLP(
            in_channels=config.encoder.d_model,
            out_channels=config.lfm.hidden_size,
            hidden_dims=list(config.adapter_hidden_dims),
            use_layer_norm=config.adapter_use_layer_norm)
        self.lfm = Lfm2Model(config.lfm)
        self.audio_embedding = AudioEmbedding(
            config.audio_vocab_size, config.lfm.hidden_size,
            config.codebooks, config.tie_audio_embeddings)
        self.depth_embeddings = [
            AudioEmbeddingWithNorm(config.audio_vocab_size,
                                   config.depthformer.dim)
            for _ in range(config.codebooks)]
        self.depth_linear = nn.Linear(
            config.lfm.hidden_size,
            config.codebooks * config.depthformer.dim)
        self.audio_head = AudioHead(config)

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    # ------------------------------------------------------------------
    def _encode_audio(self, mel: jnp.ndarray) -> jnp.ndarray:
        enc, _ = self.audio_encoder(mel)
        return self.audio_adapter(enc)

    def _build_embeddings(self, text_tokens, audio_features, audio_codes,
                          modalities) -> jnp.ndarray:
        """Interleave modality embeddings (reference model.py:572-660),
        vectorized with a host-side scatter instead of per-position adds."""
        if modalities is None:
            parts = []
            if text_tokens is not None:
                parts.append(self.lfm.embed_tokens(
                    jnp.asarray(text_tokens, jnp.int32)))
            if audio_features is not None:
                parts.append(self._encode_audio(jnp.asarray(audio_features)))
            if audio_codes is not None:
                parts.append(self.audio_embedding(
                    jnp.asarray(audio_codes, jnp.int32)))
            return parts[0] if len(parts) == 1 \
                else jnp.concatenate(parts, axis=1)

        mods = np.asarray(modalities).reshape(-1)
        T = mods.shape[0]
        D = self.config.lfm.hidden_size
        out = np.zeros((1, T, D), np.float32)
        if text_tokens is not None:
            emb = np.asarray(self.lfm.embed_tokens(
                jnp.asarray(text_tokens, jnp.int32)))
            pos = np.nonzero(mods == LFMModality.TEXT)[0]
            n = min(len(pos), emb.shape[1])
            out[0, pos[:n]] = emb[0, :n]
        if audio_features is not None:
            emb = np.asarray(self._encode_audio(
                jnp.asarray(audio_features)))
            pos = np.nonzero(mods == LFMModality.AUDIO_IN)[0]
            n = min(len(pos), emb.shape[1])
            out[0, pos[:n]] = emb[0, :n]
        if audio_codes is not None:
            emb = np.asarray(self.audio_embedding(
                jnp.asarray(audio_codes, jnp.int32)))
            pos = np.nonzero(mods == LFMModality.AUDIO_OUT)[0]
            n = min(len(pos), emb.shape[1])
            out[0, pos[:n]] = emb[0, :n]
        return jnp.asarray(out)

    def _prefill(self, text_tokens=None, audio_features=None,
                 audio_codes=None, modalities=None, max_kv: int = 4096):
        embeds = self._build_embeddings(text_tokens, audio_features,
                                        audio_codes, modalities)
        caches = self.lfm.make_caches(1, max_len=max_kv)
        hidden, caches = _lfm_forward(self, embeds, caches)
        return hidden, caches

    # ------------------------------------------------------------------
    def generate_interleaved(self, text_tokens=None, audio_features=None,
                             audio_codes=None, modalities=None,
                             max_new_tokens: int = 512,
                             temperature: float = 1.0, top_k: int = 50,
                             audio_temperature: float = 1.0,
                             audio_top_k: int = 4,
                             interleaved_n_text: Optional[int] = None,
                             interleaved_n_audio: Optional[int] = None,
                             key: Optional[jax.Array] = None
                             ) -> Generator[Tuple[np.ndarray, LFMModality],
                                            None, None]:
        """Fixed text/audio alternation (reference model.py:769-896)."""
        n_text = interleaved_n_text or self.config.interleaved_n_text
        n_audio = interleaved_n_audio or self.config.interleaved_n_audio

        # under a running server an LFM2AudioBatcher may be installed:
        # concurrent requests' interleaved loops then decode in lock-step,
        # streaming items through the batcher's on_frame sink
        from ....serving import get_infer_hook

        hook = get_infer_hook(self)
        if hook is not None and key is None:
            import queue as _queue

            q: "_queue.Queue" = _queue.Queue()
            sentinel = object()
            fut = hook.submit(
                text_tokens=text_tokens, audio_features=audio_features,
                audio_codes=audio_codes, modalities=modalities,
                max_new_tokens=max_new_tokens, temperature=temperature,
                top_k=top_k, audio_temperature=audio_temperature,
                audio_top_k=audio_top_k,
                interleaved_n_text=interleaved_n_text,
                interleaved_n_audio=interleaved_n_audio,
                on_frame=q.put)
            fut.add_done_callback(lambda f: q.put(sentinel))
            while True:
                item = q.get()
                if item is sentinel:
                    break
                yield item
            if fut.exception() is not None:
                raise fut.exception()
            return

        if key is None:
            key = jax.random.PRNGKey(0)
        prompt_len = (np.asarray(modalities).shape[-1] if modalities
                      is not None else
                      (np.asarray(text_tokens).shape[-1]
                       if text_tokens is not None else 0))
        hidden, caches = self._prefill(
            text_tokens, audio_features, audio_codes, modalities,
            max_kv=((prompt_len + max_new_tokens + 63) // 64) * 64 + 64)
        last_hidden = hidden[:, -1:]

        generated = 0
        modality_left = n_text
        text_done = False
        current = LFMModality.TEXT
        while generated < max_new_tokens:
            key, sub = jax.random.split(key)
            if current == LFMModality.TEXT:
                tok = _sample_text(self, last_hidden, sub,
                                   float(temperature), int(top_k))
                token_id = int(tok[0])
                if token_id == IM_END_TOKEN:
                    break
                yield np.asarray(tok), LFMModality.TEXT
                if token_id == TEXT_END_TOKEN:
                    text_done = True
                emb = self.lfm.embed_tokens(tok[:, None])
                last_hidden, caches = _lfm_forward(self, emb, caches)
                modality_left -= 1
                generated += 1
                if modality_left <= 0 or text_done:
                    modality_left = n_audio
                    current = LFMModality.AUDIO_OUT
            else:
                frame = _audio_frame(self, last_hidden, sub,
                                     float(audio_temperature),
                                     int(audio_top_k))  # (1, K)
                if int(frame[0, 0]) == AUDIO_EOS_TOKEN:
                    frame = jnp.full_like(frame, AUDIO_EOS_TOKEN)
                    yield np.asarray(frame[0]), LFMModality.AUDIO_OUT
                    generated += 1
                    if text_done:
                        break
                    modality_left = n_text
                    current = LFMModality.TEXT
                    continue
                yield np.asarray(frame[0]), LFMModality.AUDIO_OUT
                emb = self.audio_embedding(frame)[:, None]
                last_hidden, caches = _lfm_forward(self, emb, caches)
                modality_left -= 1
                generated += 1
                if modality_left <= 0 and not text_done:
                    modality_left = n_text
                    current = LFMModality.TEXT

    def generate_sequential(self, text_tokens=None, audio_features=None,
                            audio_codes=None, modalities=None,
                            max_new_tokens: int = 512,
                            temperature: float = 1.0, top_k: int = 50,
                            audio_temperature: float = 1.0,
                            audio_top_k: int = 4,
                            key: Optional[jax.Array] = None
                            ) -> Generator[Tuple[np.ndarray, LFMModality],
                                           None, None]:
        """Model-driven modality switching (reference model.py:898-1007)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        prompt_len = (np.asarray(modalities).shape[-1] if modalities
                      is not None else
                      (np.asarray(text_tokens).shape[-1]
                       if text_tokens is not None else 0))
        hidden, caches = self._prefill(
            text_tokens, audio_features, audio_codes, modalities,
            max_kv=((prompt_len + max_new_tokens + 63) // 64) * 64 + 64)
        last_hidden = hidden[:, -1:]

        current = LFMModality.TEXT
        if text_tokens is not None and \
                int(np.asarray(text_tokens).reshape(-1)[-1]) \
                == AUDIO_START_TOKEN:
            current = LFMModality.AUDIO_OUT

        for _ in range(max_new_tokens):
            key, sub = jax.random.split(key)
            if current == LFMModality.TEXT:
                tok = _sample_text(self, last_hidden, sub,
                                   float(temperature), int(top_k))
                token_id = int(tok[0])
                if token_id == IM_END_TOKEN:
                    yield np.asarray(tok), LFMModality.TEXT
                    break
                if token_id == AUDIO_START_TOKEN:
                    current = LFMModality.AUDIO_OUT
                    emb = self.lfm.embed_tokens(tok[:, None])
                    last_hidden, caches = _lfm_forward(self, emb, caches)
                    continue
                yield np.asarray(tok), LFMModality.TEXT
                emb = self.lfm.embed_tokens(tok[:, None])
                last_hidden, caches = _lfm_forward(self, emb, caches)
            else:
                frame = _audio_frame(self, last_hidden, sub,
                                     float(audio_temperature),
                                     int(audio_top_k))
                if int(frame[0, 0]) == AUDIO_EOS_TOKEN:
                    frame = jnp.full_like(frame, AUDIO_EOS_TOKEN)
                    current = LFMModality.TEXT
                yield np.asarray(frame[0]), LFMModality.AUDIO_OUT
                emb = self.audio_embedding(frame)[:, None]
                last_hidden, caches = _lfm_forward(self, emb, caches)

    # ------------------------------------------------------------------
    def make_batcher(self, slots: int = 4, max_len: int = 4096,
                     tick_frames: int = 8, **kwargs):
        """Slot-based continuous batching over the hybrid backbone's
        interleaved generation (see batcher.py)."""
        from .batcher import LFM2AudioBatcher

        return LFM2AudioBatcher(self, slots=slots, max_len=max_len,
                                tick_frames=tick_frames, **kwargs)

    # ------------------------------------------------------------------
    def generate_from_chat_state(self, chat_state,
                                 mode: str = "interleaved", **kwargs):
        """reference model.py:1047-1098."""
        gen = (self.generate_interleaved if mode == "interleaved"
               else self.generate_sequential)
        yield from gen(text_tokens=chat_state.get_text_tokens(),
                       audio_features=chat_state.get_audio_features(),
                       modalities=chat_state.get_modalities(), **kwargs)

    # ------------------------------------------------------------------
    def sanitize(self, weights: dict) -> dict:
        """HF key remap (reference model.py:336-466)."""
        from ....nn.sanitize import orient_weights_to_model
        out = {}
        for key, value in weights.items():
            k = key
            if k.startswith("model."):
                k = k[6:]
            if "rotary" in k or "position_ids" in k:
                continue
            if k.startswith("lfm.model."):
                k = "lfm." + k[len("lfm.model."):]
            out[k] = value
        return orient_weights_to_model(self, out)


Model = LFM2AudioModel

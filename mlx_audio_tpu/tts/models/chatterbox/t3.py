"""T3: LLaMA-backed text→speech-token model for Chatterbox.

TPU-native re-implementation of the reference
mlx_audio/tts/models/chatterbox/t3/ (t3.py, cond_enc.py, perceiver.py,
learned_pos_emb.py). The reference decodes one token per host step; here
prefill + CFG + min-p/top-p sampling + repetition penalty + learned speech
position embeddings all run in a single `lax.while_loop` on device.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....lm.sample import apply_repetition_penalty
from ....lm.cache import KVCache
from ....lm.transformer import LMConfig, Transformer
from ....nn import layers as nn
from ....nn.module import Module
from .config import T3Config

__all__ = ["T3", "T3Cond", "T3CondEnc", "Perceiver",
           "LearnedPositionEmbeddings"]


@dataclass
class T3Cond:
    """Conditioning bundle (reference cond_enc.py:14-37)."""

    speaker_emb: jnp.ndarray
    cond_prompt_speech_tokens: Optional[jnp.ndarray] = None
    cond_prompt_speech_emb: Optional[jnp.ndarray] = None
    emotion_adv: Optional[jnp.ndarray] = None

    def __post_init__(self):
        if self.emotion_adv is None:
            self.emotion_adv = jnp.ones((1, 1, 1)) * 0.5


class LearnedPositionEmbeddings(Module):
    """reference learned_pos_emb.py:10-48."""

    def __init__(self, seq_len: int, model_dim: int):
        self.emb = nn.Embedding(seq_len, model_dim)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.emb.weight[: x.shape[1]]

    def get_fixed_embedding(self, idx) -> jnp.ndarray:
        return self.emb.weight[idx][None, None]


class AttentionBlock(Module):
    """Shared-norm cross attention block (reference perceiver.py:63-114)."""

    def __init__(self, channels: int, num_heads: int = 4):
        self.num_heads = num_heads
        self.norm = nn.LayerNorm(channels)
        self.to_q = nn.Linear(channels, channels)
        self.to_k = nn.Linear(channels, channels)
        self.to_v = nn.Linear(channels, channels)
        self.proj_out = nn.Linear(channels, channels)

    def __call__(self, x1, x2):
        B, T1, C = x1.shape
        hd = C // self.num_heads
        q = self.to_q(self.norm(x1)).reshape(B, T1, self.num_heads, hd)
        kv = self.norm(x2)
        k = self.to_k(kv).reshape(B, -1, self.num_heads, hd)
        v = self.to_v(kv).reshape(B, -1, self.num_heads, hd)
        q, k, v = (a.transpose(0, 2, 1, 3) for a in (q, k, v))
        scores = q @ k.transpose(0, 1, 3, 2) * hd**-0.5
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x1.dtype)
        h = (attn @ v).transpose(0, 2, 1, 3).reshape(B, T1, C)
        return x1 + self.proj_out(h)


class Perceiver(Module):
    """Fixed-length resampler, shared attention block
    (reference perceiver.py:117-185)."""

    def __init__(self, pre_attention_query_token: int = 32,
                 pre_attention_query_size: int = 1024,
                 embedding_dim: int = 1024, num_attn_heads: int = 4):
        self.pre_attention_query = jnp.zeros(
            (1, pre_attention_query_token, pre_attention_query_size))
        self.attn = AttentionBlock(embedding_dim, num_attn_heads)

    def __call__(self, h: jnp.ndarray) -> jnp.ndarray:
        B = h.shape[0]
        query = jnp.broadcast_to(
            self.pre_attention_query,
            (B,) + self.pre_attention_query.shape[1:])
        pre = self.attn(query, h)
        return self.attn(pre, pre)


class T3CondEnc(Module):
    """speaker + prompt-speech + emotion conditioning
    (reference cond_enc.py:40-133)."""

    def __init__(self, hp: T3Config):
        self.hp = hp
        self.spkr_enc = nn.Linear(hp.speaker_embed_size, hp.n_channels)
        if hp.emotion_adv:
            self.emotion_adv_fc = nn.Linear(1, hp.n_channels, bias=False)
        if hp.use_perceiver_resampler:
            self.perceiver = Perceiver(
                pre_attention_query_size=hp.n_channels,
                embedding_dim=hp.n_channels)

    def __call__(self, cond: T3Cond) -> jnp.ndarray:
        B = cond.speaker_emb.shape[0]
        parts = [self.spkr_enc(cond.speaker_emb.reshape(
            B, self.hp.speaker_embed_size))[:, None]]
        emb = cond.cond_prompt_speech_emb
        if emb is not None:
            if self.hp.use_perceiver_resampler:
                emb = self.perceiver(emb)
            parts.append(emb)
        if self.hp.emotion_adv:
            ea = jnp.reshape(cond.emotion_adv, (-1, 1, 1))
            parts.append(self.emotion_adv_fc(ea))
        return jnp.concatenate(parts, axis=1)


def _sample_minp_topp(logits, key, temp, top_p, min_p):
    logits = logits / max(temp, 1e-5)
    probs = jax.nn.softmax(logits, axis=-1)
    if min_p > 0:
        logits = jnp.where(
            probs < min_p * probs.max(axis=-1, keepdims=True), -jnp.inf,
            logits)
    if top_p < 1.0:
        sort = jnp.sort(probs, axis=-1)[..., ::-1]
        cum = jnp.cumsum(sort, axis=-1)
        cutoff_idx = jnp.sum(cum < top_p, axis=-1, keepdims=True)
        cutoff = jnp.take_along_axis(sort, cutoff_idx, axis=-1)
        logits = jnp.where(probs < cutoff, -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1)


@partial(
    jax.jit,
    static_argnames=("max_new_tokens", "temperature", "top_p", "min_p",
                     "repetition_penalty", "cfg_on"),
    donate_argnames=("caches",),
)
def _t3_decode_loop(
    t3: "T3",
    caches,
    input_embeds,  # (B, Tp, D) bucketed prefill ([cond|text|bos])
    prefill_len,
    cfg_weight,  # traced scalar
    key,
    max_new_tokens: int,
    temperature: float,
    top_p: float,
    min_p: float,
    repetition_penalty: float,
    cfg_on: bool,
):
    """One-dispatch CFG decode (reference t3.py:316-478)."""
    stop = t3.hp.stop_speech_token
    B, Tp, _ = input_embeds.shape
    S = caches[0].max_len

    q_idx = jnp.arange(Tp)[:, None]
    k_idx = jnp.arange(S)[None, :]
    prefill_ok = (k_idx <= q_idx) & (k_idx < prefill_len)
    prefill_mask = jnp.where(prefill_ok, 0.0, -jnp.inf)[None, None]
    hidden, caches = t3.tfmr(input_embeds, caches, mask=prefill_mask)
    last = jnp.clip(prefill_len - 1, 0, Tp - 1)

    out = jnp.zeros((max_new_tokens,), jnp.int32)
    hist = jnp.full((1, 64), -1, jnp.int32)

    def logits_from_hidden(h_last):
        logits = t3.speech_head(h_last).astype(jnp.float32)  # (B, V)
        if cfg_on:
            return logits[0:1] + cfg_weight * (logits[0:1] - logits[1:2])
        return logits[0:1]

    def cond_fn(s):
        return (s[0] < max_new_tokens) & ~s[5]

    def body(s):
        step, caches, h_last, out, hist, done, key = s
        logits = logits_from_hidden(h_last)
        if repetition_penalty != 1.0:
            logits = apply_repetition_penalty(logits, hist,
                                              repetition_penalty)
        key, sub = jax.random.split(key)
        tok = _sample_minp_topp(logits, sub, temperature, top_p, min_p)[0]
        done_now = tok == stop
        out = jnp.where(done_now | done, out, out.at[step].set(tok))
        hist = jnp.concatenate([hist[:, 1:], tok[None, None]], axis=1)
        done = done | done_now

        emb = (t3.speech_emb.weight[tok]
               + t3.speech_pos_emb.emb.weight[step + 1])[None, None]
        if cfg_on:
            emb = jnp.concatenate([emb, emb], axis=0)
        q_pos = prefill_len + step
        valid = (k_idx[0] < prefill_len) | ((k_idx[0] >= Tp)
                                            & (k_idx[0] <= Tp + step))
        dec_mask = jnp.where(valid, 0.0, -jnp.inf)[None, None, None, :]
        hidden, ncaches = t3.tfmr(emb, caches, mask=dec_mask,
                                  positions=q_pos[None])
        step = jnp.where(done, step, step + 1)
        return (step, ncaches, hidden[:, -1], out, hist, done, key)

    state = (jnp.array(0, jnp.int32), caches, hidden[:, last],
             out, hist, jnp.array(False), key)
    n, _, _, out, _, _, _ = jax.lax.while_loop(cond_fn, body, state)
    return out, n


class T3(Module):
    """reference t3.py:18-478."""

    def __init__(self, hp: Optional[T3Config] = None):
        hp = hp or T3Config.english_only()
        self.hp = hp
        lm_cfg = LMConfig(**{k: v for k, v in hp.llama_config.items()
                             if k in LMConfig.__dataclass_fields__})
        self.cfg = lm_cfg
        self.tfmr = Transformer(lm_cfg)
        self.dim = lm_cfg.hidden_size
        self.cond_enc = T3CondEnc(hp)
        self.text_emb = nn.Embedding(hp.text_tokens_dict_size, self.dim)
        self.speech_emb = nn.Embedding(hp.speech_tokens_dict_size, self.dim)
        if hp.input_pos_emb == "learned":
            self.text_pos_emb = LearnedPositionEmbeddings(
                hp.max_text_tokens + 2, self.dim)
            self.speech_pos_emb = LearnedPositionEmbeddings(
                hp.max_speech_tokens + 4, self.dim)
        self.text_head = nn.Linear(self.dim, hp.text_tokens_dict_size,
                                   bias=False)
        self.speech_head = nn.Linear(self.dim, hp.speech_tokens_dict_size,
                                     bias=False)

    def prepare_conditioning(self, t3_cond: T3Cond) -> jnp.ndarray:
        if (t3_cond.cond_prompt_speech_tokens is not None
                and t3_cond.cond_prompt_speech_emb is None):
            toks = jnp.asarray(t3_cond.cond_prompt_speech_tokens)
            t3_cond.cond_prompt_speech_emb = (
                self.speech_emb(toks) + self.speech_pos_emb(toks))
        return self.cond_enc(t3_cond)

    def build_prefill_embeds(self, t3_cond: T3Cond, text_tokens,
                             cfg_on: bool = True) -> jnp.ndarray:
        """[cond|text|bos] prefill embeddings (B, T0, D); with CFG the
        unconditional row zeroes the text embedding (reference
        t3.py:316-368). Shared by `inference` and the serving batcher."""
        text_tokens = np.asarray(text_tokens)
        if text_tokens.ndim == 1:
            text_tokens = text_tokens[None]
        cond_emb = self.prepare_conditioning(t3_cond)  # (1, Lc, D)
        text_ids = jnp.asarray(text_tokens[:1], jnp.int32)
        text_emb = self.text_emb(text_ids)
        if self.hp.input_pos_emb == "learned":
            text_emb = text_emb + self.text_pos_emb(text_ids)[None]
        bos = jnp.asarray([[self.hp.start_speech_token]], jnp.int32)
        bos_emb = (self.speech_emb(bos)
                   + self.speech_pos_emb.get_fixed_embedding(0))

        if cfg_on:
            text_emb = jnp.concatenate([text_emb, jnp.zeros_like(text_emb)],
                                       axis=0)
            cond_emb = jnp.broadcast_to(cond_emb, (2,) + cond_emb.shape[1:])
            bos_emb = jnp.broadcast_to(bos_emb, (2,) + bos_emb.shape[1:])
        return jnp.concatenate([cond_emb, text_emb, bos_emb], axis=1)

    def inference(
        self,
        t3_cond: T3Cond,
        text_tokens: np.ndarray,
        max_new_tokens: int = 1024,
        temperature: float = 0.8,
        top_p: float = 0.95,
        min_p: float = 0.05,
        repetition_penalty: float = 1.2,
        cfg_weight: float = 0.5,
        key=None,
    ) -> np.ndarray:
        """Generate speech tokens (1, T) ending before EOS."""
        cfg_on = cfg_weight > 0.0
        B = 2 if cfg_on else 1

        embeds = self.build_prefill_embeds(t3_cond, text_tokens, cfg_on)
        T0 = embeds.shape[1]
        Tp = max(32, ((T0 + 31) // 32) * 32)
        embeds = jnp.pad(embeds, ((0, 0), (0, Tp - T0), (0, 0)))

        max_new = min(max_new_tokens, self.hp.max_speech_tokens)
        caches = [
            KVCache(B, self.cfg.num_key_value_heads, Tp + max_new + 1,
                    self.cfg.head_dim, jnp.float32)
            for _ in range(self.cfg.num_hidden_layers)
        ]
        if key is None:
            key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        out, n = _t3_decode_loop(
            self, caches, embeds, jnp.array(T0, jnp.int32),
            jnp.asarray(cfg_weight, jnp.float32), key, max_new,
            float(temperature), float(top_p), float(min_p),
            float(repetition_penalty), cfg_on)
        n = int(n)
        return np.asarray(out)[:n][None]

    def sanitize(self, weights: dict) -> dict:
        """tfmr.{layers,norm} ←→ our Transformer naming; drop unused
        embed_tokens (custom input embeddings are used instead)."""
        out = {}
        for key, value in weights.items():
            k = key
            k = k.replace("tfmr.model.", "tfmr.")
            if k.startswith("tfmr.embed_tokens."):
                continue
            out[k] = value
        return out



"""Qwen2-based speech-token LM for CosyVoice3.

TPU-native re-implementation of the reference
mlx_audio/tts/models/cosyvoice3/llm/llm.py:100-546. Differences from the
CosyVoice2 LM (reference llm.py:100-166): a single unified
`speech_embedding` holds the speech vocabulary plus 200 extended/special
tokens (sos=V, eos=V+1, task=V+2, fill=V+3), `llm_decoder` has no bias, and
ANY token ≥ V stops generation. As in the CosyVoice2 port, the entire
prefill + RAS-sampled decode runs as one `lax.while_loop` on device.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....lm.transformer import CausalLM, LMConfig
from ....nn import layers as nn
from ....nn.module import Module
from ..cosyvoice2.llm import _bucket, ras_sample
from .config import LLMConfig as CV3LLMConfig

__all__ = ["CosyVoice3LM"]


@partial(
    jax.jit,
    static_argnames=("max_len", "top_p", "top_k", "win_size", "tau_r"),
    donate_argnames=("caches",),
)
def _lm3_decode_loop(
    lm: "CosyVoice3LM",
    caches,
    input_embeds,  # (1, Tp, D) bucketed prefill
    prefill_len,
    min_len,
    hard_max,
    max_len: int,
    key,
    top_p: float = 0.8,
    top_k: int = 25,
    win_size: int = 10,
    tau_r: float = 0.1,
):
    """Returns (tokens (max_len,), count). Stop on any token ≥ V
    (reference llm.py:257-307); min-length phase masks only index V
    (reference llm.py:168-194)."""
    V = lm.speech_token_size
    Tp = input_embeds.shape[1]
    S = caches[0].max_len

    q_idx = jnp.arange(Tp)[:, None]
    k_idx = jnp.arange(S)[None, :]
    prefill_ok = (k_idx <= q_idx) & (k_idx < prefill_len)
    prefill_mask = jnp.where(prefill_ok, 0.0, -jnp.inf)[None, None]
    h, caches = lm.llm.hidden_states(input_embeds, caches, mask=prefill_mask)
    last = jnp.clip(prefill_len - 1, 0, Tp - 1)
    logits = lm.llm_decoder(h[:, last]).astype(jnp.float32)

    out = jnp.zeros((max_len,), jnp.int32)
    hist = jnp.full((win_size,), -1, jnp.int32)

    def cond(s):
        return (s[1] < max_len) & (s[1] < hard_max) & ~s[6]

    def body(s):
        emit, step, caches, logits, out, hist, done, key = s
        logp = jax.nn.log_softmax(logits[0])
        logp = jnp.where(
            (jnp.arange(logp.shape[0]) == V) & (step < min_len),
            -jnp.inf, logp)
        key, sub = jax.random.split(key)
        tok = ras_sample(logp, hist, sub, top_p, top_k, win_size, tau_r)
        done = done | (tok >= V)
        emit_tok = ~done
        out = jnp.where(emit_tok, out.at[emit].set(tok), out)
        hist = jnp.where(emit_tok,
                         jnp.concatenate([hist[1:], tok[None]]), hist)
        emit = jnp.where(emit_tok, emit + 1, emit)

        next_embed = lm.speech_embedding.weight[tok][None, None]
        q_pos = prefill_len + step
        valid = (k_idx[0] < prefill_len) | ((k_idx[0] >= Tp)
                                            & (k_idx[0] <= Tp + step))
        dec_mask = jnp.where(valid, 0.0, -jnp.inf)[None, None, None, :]
        h, caches = lm.llm.hidden_states(next_embed, caches, mask=dec_mask,
                                         positions=q_pos[None])
        logits = lm.llm_decoder(h[:, -1]).astype(jnp.float32)
        return (emit, step + 1, caches, logits, out, hist, done, key)

    state = (jnp.array(0, jnp.int32), jnp.array(0, jnp.int32), caches,
             logits, out, hist, jnp.array(False), key)
    emit, _, _, _, out, _, _, _ = jax.lax.while_loop(cond, body, state)
    return out, emit


class CosyVoice3LM(Module):
    """Speech-token LM with unified embedding
    (reference llm.py:100-307)."""

    def __init__(self, config: Optional[CV3LLMConfig] = None):
        config = config or CV3LLMConfig()
        self.config = config
        self.speech_token_size = config.speech_token_size
        self.extended_vocab_size = config.extended_vocab_size
        self.sos = config.speech_token_size
        self.eos_token = config.speech_token_size + 1
        self.task_id = config.speech_token_size + 2
        self.fill_token = config.speech_token_size + 3
        self.mix_ratio = list(config.mix_ratio)

        lm_cfg = LMConfig(
            model_type="qwen2",
            hidden_size=config.hidden_size,
            num_hidden_layers=config.num_hidden_layers,
            intermediate_size=config.intermediate_size,
            num_attention_heads=config.num_attention_heads,
            num_key_value_heads=config.num_key_value_heads,
            rms_norm_eps=config.rms_norm_eps,
            vocab_size=config.vocab_size,
            rope_theta=config.rope_theta,
            attention_bias=True,
            tie_word_embeddings=config.tie_word_embeddings,
        )
        self.llm = CausalLM(lm_cfg)
        n_vocab = config.speech_token_size + config.extended_vocab_size
        self.llm_decoder = nn.Linear(config.llm_output_size, n_vocab,
                                     bias=False)
        self.speech_embedding = nn.Embedding(n_vocab, config.llm_input_size)

    # ------------------------------------------------------------------
    def build_prompt_embeds(self, text: np.ndarray,
                            prompt_text: Optional[np.ndarray],
                            prompt_speech_token: Optional[np.ndarray]
                            ) -> jnp.ndarray:
        """[sos, prompt_text+text, task_id, prompt_speech], with sos/task
        drawn from the unified speech embedding (reference llm.py:195-256).
        """
        parts = [self.speech_embedding.weight[self.sos][None, None]]
        ids = []
        if prompt_text is not None and np.asarray(prompt_text).size:
            ids.append(np.asarray(prompt_text).reshape(1, -1))
        ids.append(np.asarray(text).reshape(1, -1))
        text_ids = jnp.asarray(np.concatenate(ids, axis=1), jnp.int32)
        parts.append(self.llm.model.embed_tokens(text_ids))
        parts.append(self.speech_embedding.weight[self.task_id][None, None])
        if (prompt_speech_token is not None
                and np.asarray(prompt_speech_token).size):
            st = jnp.asarray(
                np.asarray(prompt_speech_token).reshape(1, -1), jnp.int32)
            parts.append(self.speech_embedding(st))
        return jnp.concatenate(parts, axis=1)

    def inference(
        self,
        text: np.ndarray,
        prompt_text: Optional[np.ndarray] = None,
        prompt_speech_token: Optional[np.ndarray] = None,
        sampling: int = 25,
        max_token_text_ratio: float = 20.0,
        min_token_text_ratio: float = 2.0,
        key: Optional[jax.Array] = None,
        max_kv: int = 4096,
    ) -> Tuple[np.ndarray, int]:
        """Generate speech tokens → (tokens, count). One device dispatch."""
        del sampling  # RAS top-k/top-p fixed as in the reference default
        embeds = self.build_prompt_embeds(text, prompt_text,
                                          prompt_speech_token)
        T0 = embeds.shape[1]
        Tp = _bucket(T0)
        embeds = jnp.pad(embeds, ((0, 0), (0, Tp - T0), (0, 0)))

        n_text = int(np.asarray(text).size)
        min_len = int(n_text * min_token_text_ratio)
        max_len = max(1, min(int(n_text * max_token_text_ratio),
                             max_kv - Tp - 1))
        loop_max = min(((max_len + 255) // 256) * 256, max_kv - Tp - 1)

        caches = self.llm.make_caches(1, Tp + loop_max + 1,
                                      dtype=jnp.float32)
        if key is None:
            key = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
        out, count = _lm3_decode_loop(
            self, caches, embeds, jnp.array(T0, jnp.int32),
            jnp.array(min_len, jnp.int32), jnp.array(max_len, jnp.int32),
            loop_max, key)
        count = int(count)
        return np.asarray(out)[:count], count

    # ------------------------------------------------------------------
    def sanitize(self, weights: dict) -> dict:
        """`llm.model.model.*` → `llm.model.*` (as CosyVoice2)."""
        out = {}
        for key, value in weights.items():
            k = key
            if k.startswith("llm.model.model."):
                k = "llm.model." + k[len("llm.model.model."):]
            elif k.startswith("llm.model.lm_head."):
                k = "llm.lm_head." + k[len("llm.model.lm_head."):]
            out[k] = value
        return out

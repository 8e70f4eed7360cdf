"""Bark — 3-stage AR TTS: text→semantic GPT → coarse GPT → fine (non-causal)
GPT → EnCodec decode.

Behavioral spec: reference tts/models/bark/ (bark.py GPT :272, FineGPT :344,
pipeline.py semantic :122, coarse :210, fine :351). TPU-first: the semantic
stage and each coarse sliding window decode as on-device `lax.while_loop`s
with the stage-specific logit gating in-graph; fine infill is 6 batched
non-causal forwards.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass
from functools import partial
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ....base import BaseModelArgs
from ....lm.cache import KVCache
from ....nn import Embedding, LayerNorm, Linear, Module
from ....ops.attention import make_causal_mask, scaled_dot_product_attention
from ..base import GenerationResult, format_duration

__all__ = ["Model", "ModelConfig"]

TEXT_ENCODING_OFFSET = 10_048
SEMANTIC_PAD_TOKEN = 10_000
TEXT_PAD_TOKEN = 129_595
SEMANTIC_INFER_TOKEN = 129_599
SEMANTIC_RATE_HZ = 49.9
SEMANTIC_VOCAB_SIZE = 10_000
CODEBOOK_SIZE = 1024
N_COARSE_CODEBOOKS = 2
N_FINE_CODEBOOKS = 8
COARSE_RATE_HZ = 75
COARSE_SEMANTIC_PAD_TOKEN = 12_048
COARSE_INFER_TOKEN = 12_050
SAMPLE_RATE = 24_000


@dataclass
class GPTConfig(BaseModelArgs):
    block_size: int = 1024
    input_vocab_size: int = 129600
    output_vocab_size: int = 129600
    n_layer: int = 12
    n_head: int = 12
    n_embd: int = 768
    bias: bool = False
    model_type: str = "semantic"
    n_codes_total: int = 8
    n_codes_given: int = 1


@dataclass
class ModelConfig(BaseModelArgs):
    model_type: str = "bark"
    semantic_config: dict = None
    coarse_acoustics_config: dict = None
    fine_acoustics_config: dict = None
    codec_path: str = "mlx-community/encodec-24khz-float32"
    tokenizer_path: str = "bert-base-multilingual-cased"
    sample_rate: int = SAMPLE_RATE
    model_path: str = ""

    def __post_init__(self):
        for name in ("semantic_config", "coarse_acoustics_config",
                     "fine_acoustics_config"):
            v = getattr(self, name)
            if isinstance(v, dict):
                setattr(self, name, GPTConfig.from_dict(v))
            elif v is None:
                setattr(self, name, GPTConfig())


class Attention(Module):
    def __init__(self, cfg: GPTConfig, causal: bool):
        self.att_proj = Linear(cfg.n_embd, 3 * cfg.n_embd, bias=cfg.bias)
        self.out_proj = Linear(cfg.n_embd, cfg.n_embd, bias=cfg.bias)
        self.n_head = cfg.n_head
        self.causal = causal

    def __call__(self, x, mask=None, cache: Optional[KVCache] = None):
        B, T, D = x.shape
        q, k, v = jnp.split(self.att_proj(x), 3, axis=-1)
        hd = D // self.n_head

        def sp(z):
            return jnp.swapaxes(z.reshape(B, T, self.n_head, hd), 1, 2)

        q, k, v = sp(q), sp(k), sp(v)
        new_cache = None
        if cache is not None:
            k, v, new_cache = cache.update(k, v)
        out = scaled_dot_product_attention(q, k, v, mask=mask)
        return self.out_proj(jnp.swapaxes(out, 1, 2).reshape(B, T, D)), new_cache


class MLP(Module):
    def __init__(self, cfg: GPTConfig):
        self.in_proj = Linear(cfg.n_embd, 4 * cfg.n_embd, bias=cfg.bias)
        self.out_proj = Linear(4 * cfg.n_embd, cfg.n_embd, bias=cfg.bias)

    def __call__(self, x):
        # exact (erf) GELU: reference bark.py:225 uses mlx nn.GELU()
        return self.out_proj(jax.nn.gelu(self.in_proj(x), approximate=False))


class Block(Module):
    def __init__(self, cfg: GPTConfig, causal: bool = True):
        self.layernorm_1 = LayerNorm(cfg.n_embd, bias=cfg.bias)
        self.attn = Attention(cfg, causal)
        self.layernorm_2 = LayerNorm(cfg.n_embd, bias=cfg.bias)
        self.mlp = MLP(cfg)

    def __call__(self, x, mask=None, cache=None):
        a, nc = self.attn(self.layernorm_1(x), mask, cache)
        x = x + a
        return x + self.mlp(self.layernorm_2(x)), nc


class GPT(Module):
    def __init__(self, cfg: GPTConfig):
        self.input_embeds_layer = Embedding(cfg.input_vocab_size, cfg.n_embd)
        self.position_embeds_layer = Embedding(cfg.block_size, cfg.n_embd)
        self.layers = [Block(cfg) for _ in range(cfg.n_layer)]
        self.layernorm_final = LayerNorm(cfg.n_embd, bias=False)
        self.lm_head = Linear(cfg.n_embd, cfg.output_vocab_size, bias=False)
        self.config = cfg

    def make_caches(self, batch: int, max_len: int):
        cfg = self.config
        return [
            KVCache(batch, cfg.n_head, max_len, cfg.n_embd // cfg.n_head,
                    dtype=jnp.float32)
            for _ in range(cfg.n_layer)
        ]

    def forward_embeds(self, tok_emb, caches, positions):
        x = tok_emb + self.position_embeds_layer.weight[positions]
        mask = caches[0].attention_mask(x.shape[1]) if caches is not None else (
            make_causal_mask(x.shape[1], x.shape[1]) if x.shape[1] > 1 else None
        )
        new_caches = []
        for i, blk in enumerate(self.layers):
            x, nc = blk(x, mask, caches[i] if caches is not None else None)
            new_caches.append(nc)
        x = self.layernorm_final(x)
        return self.lm_head(x[:, -1:]), new_caches


class FineBlock(Module):
    def __init__(self, cfg: GPTConfig):
        self.layernorm_1 = LayerNorm(cfg.n_embd)
        self.attn = Attention(cfg, causal=False)
        self.layernorm_2 = LayerNorm(cfg.n_embd)
        self.mlp = MLP(cfg)

    def __call__(self, x):
        a, _ = self.attn(self.layernorm_1(x))
        x = x + a
        return x + self.mlp(self.layernorm_2(x))


class FineGPT(Module):
    def __init__(self, cfg: GPTConfig):
        self.input_embeds_layers = [
            Embedding(cfg.input_vocab_size, cfg.n_embd)
            for _ in range(cfg.n_codes_total)
        ]
        self.position_embeds_layer = Embedding(cfg.block_size, cfg.n_embd)
        self.layers = [FineBlock(cfg) for _ in range(cfg.n_layer)]
        self.layernorm_final = LayerNorm(cfg.n_embd)
        self.lm_heads = [
            Linear(cfg.n_embd, cfg.output_vocab_size, bias=False)
            for _ in range(cfg.n_codes_given, cfg.n_codes_total)
        ]
        self.config = cfg

    def __call__(self, pred_idx: int, idx):
        # idx: (B, T, n_codes_total)
        B, T, C = idx.shape
        embs = [
            self.input_embeds_layers[i](idx[:, :, i]) for i in range(pred_idx + 1)
        ]
        x = sum(embs) + self.position_embeds_layer.weight[jnp.arange(T)]
        for blk in self.layers:
            x = blk(x)
        x = self.layernorm_final(x)
        return self.lm_heads[pred_idx - self.config.n_codes_given](x)


# ---------------------------------------------------------------------------
# On-device decode loops
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("max_steps", "temp"), donate_argnames=("caches",))
def _semantic_loop(gpt: GPT, caches, prefill_emb, key, max_steps: int, temp: float):
    positions = jnp.arange(prefill_emb.shape[1])
    logits, caches = gpt.forward_embeds(prefill_emb, caches, positions)
    out = jnp.zeros((max_steps,), jnp.int32)
    Tp = prefill_emb.shape[1]

    def cond(s):
        return (s[0] < max_steps) & ~s[4]

    def body(s):
        i, caches, logits, out, done, key = s
        rel = logits[0, -1, :SEMANTIC_VOCAB_SIZE]
        stop = logits[0, -1, SEMANTIC_PAD_TOKEN][None]
        lg = jnp.concatenate([rel, stop]) / temp
        key, sub = jax.random.split(key)
        tok = jax.random.categorical(sub, lg).astype(jnp.int32)
        done = done | (tok == SEMANTIC_VOCAB_SIZE)
        out = jnp.where(done, out, out.at[i].set(tok))
        emb = gpt.input_embeds_layer.weight[jnp.clip(tok, 0, SEMANTIC_VOCAB_SIZE - 1)][None, None]
        logits, caches = gpt.forward_embeds(emb, caches, jnp.reshape(Tp + i, (1,)))
        i = jnp.where(done, i, i + 1)
        return i, caches, logits, out, done, key

    state = (0, caches, logits, out, jnp.array(False), key)
    n, caches, logits, out, done, key = jax.lax.while_loop(cond, body, state)
    return out, n


@partial(jax.jit, static_argnames=("window_len", "temp"), donate_argnames=("caches",))
def _coarse_window_loop(gpt: GPT, caches, prefill_tokens, prefill_len, key,
                        start_step, n_steps, window_len: int, temp: float):
    """One sliding window: prefill then up to window_len in-graph steps with
    alternating codebook logit ranges."""
    Tp = prefill_tokens.shape[1]
    emb = gpt.input_embeds_layer(prefill_tokens)
    pos = jnp.arange(Tp)
    q_idx = jnp.arange(Tp)[:, None]
    k_idx = jnp.arange(caches[0].max_len)[None, :]
    mask = jnp.where(
        (k_idx <= q_idx) & (k_idx < prefill_len), 0.0, -jnp.inf
    )[None, None]
    x = emb + gpt.position_embeds_layer.weight[pos]
    new_caches = []
    for i, blk in enumerate(gpt.layers):
        x, nc = blk(x, mask, caches[i])
        new_caches.append(nc)
    x = gpt.layernorm_final(x)
    last = jnp.clip(prefill_len - 1, 0, Tp - 1)
    logits = gpt.lm_head(x[:, last][:, None])
    caches = new_caches
    out = jnp.zeros((window_len,), jnp.int32)

    def cond(s):
        return s[0] < window_len

    def body(s):
        i, caches, logits, out, key = s
        n_step = start_step + i
        is_major = (n_step % N_COARSE_CODEBOOKS) == 0
        lo = SEMANTIC_VOCAB_SIZE + jnp.where(is_major, 0, CODEBOOK_SIZE)
        idxs = jnp.arange(logits.shape[-1])
        valid = (idxs >= lo) & (idxs < lo + CODEBOOK_SIZE) & (n_step < n_steps)
        lg = jnp.where(valid, logits[0, -1], -jnp.inf) / temp
        key, sub = jax.random.split(key)
        tok = jax.random.categorical(sub, lg).astype(jnp.int32)
        out = out.at[i].set(tok)
        emb = gpt.input_embeds_layer.weight[tok][None, None]
        q_pos = prefill_len + i
        k_idx = jnp.arange(caches[0].max_len)
        dmask = jnp.where(
            (k_idx < prefill_len) | ((k_idx >= Tp) & (k_idx <= Tp + i)),
            0.0, -jnp.inf,
        )[None, None, None, :]
        x = emb + gpt.position_embeds_layer.weight[q_pos][None, None]
        ncaches = []
        for j, blk in enumerate(gpt.layers):
            x, nc = blk(x, dmask, caches[j])
            ncaches.append(nc)
        logits = gpt.lm_head(gpt.layernorm_final(x))
        return i + 1, ncaches, logits, out, key

    state = (0, caches, logits, out, key)
    _, caches, logits, out, key = jax.lax.while_loop(cond, body, state)
    return out


class Model(Module):
    _tokenizer = None
    _codec = None

    def __init__(self, config: ModelConfig):
        if isinstance(config, dict):
            config = ModelConfig.from_dict(config)
        self.config = config
        self.semantic = GPT(config.semantic_config)
        self.coarse_acoustics = GPT(config.coarse_acoustics_config)
        self.fine_acoustics = FineGPT(config.fine_acoustics_config)

    @property
    def sample_rate(self):
        return self.config.sample_rate

    @property
    def tokenizer(self):
        if Model._tokenizer is None:
            from transformers import BertTokenizer

            Model._tokenizer = BertTokenizer.from_pretrained(
                self.config.tokenizer_path
            )
        return Model._tokenizer

    @property
    def codec(self):
        if Model._codec is None:
            from ....codec.models import Encodec

            Model._codec = Encodec.from_pretrained(self.config.codec_path)
        return Model._codec

    def set_runtime(self, tokenizer=None, codec=None):
        if tokenizer is not None:
            Model._tokenizer = tokenizer
        if codec is not None:
            Model._codec = codec

    # ---- stages ----

    def generate_text_semantic(self, text: str, voice_prompt: Optional[dict],
                               temperature: float = 0.7, seed: int = 0):
        ids = np.asarray(
            self.tokenizer.encode(text, add_special_tokens=False)
        ) + TEXT_ENCODING_OFFSET
        ids = ids[:256]
        ids = np.pad(ids, (0, 256 - len(ids)), constant_values=TEXT_PAD_TOKEN)
        if voice_prompt is not None:
            hist = np.asarray(voice_prompt["semantic_prompt"])[-256:]
            hist = np.pad(hist, (0, 256 - len(hist)),
                          constant_values=SEMANTIC_PAD_TOKEN)
        else:
            hist = np.full(256, SEMANTIC_PAD_TOKEN)

        # under a running server a BarkBatcher may be installed: concurrent
        # requests' semantic loops then decode as one batched while_loop
        from ....serving import get_infer_hook

        hook = get_infer_hook(self)
        if hook is not None:
            return hook.semantic(ids, hist, temperature, seed)

        # merge-context: first 256 (text) + second 256 (history) embeddings
        # are summed; then the infer token (reference GPT.__call__ :299)
        emb_layer = self.semantic.input_embeds_layer
        merged = emb_layer(jnp.asarray(ids[None])) + emb_layer(
            jnp.asarray(hist[None])
        )
        infer = emb_layer(jnp.asarray([[SEMANTIC_INFER_TOKEN]]))
        prefill = jnp.concatenate([merged, infer], axis=1)  # (1, 257, D)

        caches = self.semantic.make_caches(1, 257 + 768 + 1)
        out, n = _semantic_loop(self.semantic, caches, prefill,
                                jax.random.PRNGKey(seed), 768,
                                float(temperature))
        out, n = jax.device_get((out, n))
        return out[: int(n)]

    def generate_coarse(self, x_semantic: np.ndarray,
                        voice_prompt: Optional[dict],
                        temperature: float = 0.7,
                        max_coarse_history: int = 60,
                        sliding_window_len: int = 60, seed: int = 0):
        ratio = COARSE_RATE_HZ / SEMANTIC_RATE_HZ * N_COARSE_CODEBOOKS
        max_sem_hist = int(math.floor(max_coarse_history / ratio))
        if voice_prompt is not None:
            sem_hist = np.asarray(voice_prompt["semantic_prompt"])
            coarse_hist = np.asarray(voice_prompt["coarse_prompt"])
            coarse_flat = (
                coarse_hist.T + np.arange(N_COARSE_CODEBOOKS) * CODEBOOK_SIZE
            ).reshape(-1) + SEMANTIC_VOCAB_SIZE
            n_sem = min(max_sem_hist, len(sem_hist) - len(sem_hist) % 2,
                        int(math.floor(len(coarse_flat) / ratio)))
            n_coarse = int(round(n_sem * ratio))
            sem_hist = sem_hist[-n_sem:]
            coarse_flat = coarse_flat[-n_coarse:][:-2]
        else:
            sem_hist = np.zeros(0, np.int32)
            coarse_flat = np.zeros(0, np.int32)

        n_steps = int(
            round(math.floor(len(x_semantic) * ratio / N_COARSE_CODEBOOKS)
                  * N_COARSE_CODEBOOKS)
        )
        x_sem = np.concatenate([sem_hist, x_semantic]).astype(np.int32)
        x_coarse = list(coarse_flat.astype(np.int32))
        base_idx = len(sem_hist)
        n_windows = int(round(n_steps / sliding_window_len))
        n_step = 0
        key = jax.random.PRNGKey(seed)
        for w in range(max(n_windows, 1)):
            if n_step >= n_steps:
                break
            sem_idx = base_idx + int(round(n_step / ratio))
            x_in = x_sem[max(0, sem_idx - max_sem_hist):][:256]
            x_in = np.pad(x_in, (0, 256 - len(x_in)),
                          constant_values=COARSE_SEMANTIC_PAD_TOKEN)
            ctx = np.concatenate([
                x_in, [COARSE_INFER_TOKEN],
                np.asarray(x_coarse[-max_coarse_history:], np.int32),
            ]).astype(np.int32)
            Tp = 256 + 1 + max_coarse_history
            prefill = np.full(Tp, COARSE_SEMANTIC_PAD_TOKEN, np.int32)
            prefill[: len(ctx)] = ctx
            key, sub = jax.random.split(key)
            from ....serving import get_infer_hook

            hook = get_infer_hook(self)
            if hook is not None and sliding_window_len == hook.WINDOW_LEN:
                # concurrent requests' windows fuse into one batched decode
                out = hook.coarse_window(
                    prefill, len(ctx), n_step, n_steps,
                    np.asarray(sub, np.uint32), temperature)
            else:
                caches = self.coarse_acoustics.make_caches(
                    1, Tp + sliding_window_len + 1
                )
                out = _coarse_window_loop(
                    self.coarse_acoustics, caches, jnp.asarray(prefill[None]),
                    jnp.asarray(len(ctx)), sub, jnp.asarray(n_step),
                    jnp.asarray(n_steps), int(sliding_window_len),
                    float(temperature),
                )
                out = np.asarray(jax.device_get(out))
            take = min(sliding_window_len, n_steps - n_step)
            x_coarse.extend(out[:take].tolist())
            n_step += take

        gen = np.asarray(x_coarse[len(coarse_flat):])
        n = (len(gen) // N_COARSE_CODEBOOKS) * N_COARSE_CODEBOOKS
        coarse_audio = gen[:n].reshape(-1, N_COARSE_CODEBOOKS).T - SEMANTIC_VOCAB_SIZE
        coarse_audio = coarse_audio - np.arange(N_COARSE_CODEBOOKS)[:, None] * CODEBOOK_SIZE
        return np.clip(coarse_audio, 0, CODEBOOK_SIZE - 1)

    def generate_fine(self, coarse: np.ndarray, voice_prompt: Optional[dict],
                      temperature: float = 0.5, seed: int = 0):
        """Non-causal infill of codebooks 2..7 over 512-token chunks."""
        T = coarse.shape[1]
        full = np.full((N_FINE_CODEBOOKS, T), CODEBOOK_SIZE, np.int32)
        full[:N_COARSE_CODEBOOKS] = coarse
        key = jax.random.PRNGKey(seed)
        chunk = 512
        from ....serving import get_infer_hook

        hook = get_infer_hook(self)
        for start in range(0, T, chunk - 256 if T > chunk else chunk):
            end = min(start + chunk, T)
            seg = full[:, start:end]
            pad = chunk - (end - start)
            seg = np.pad(seg, ((0, 0), (0, pad)), constant_values=CODEBOOK_SIZE)
            if hook is not None:
                # concurrent requests' chunks infill as one batched program
                key, sub = jax.random.split(key)
                seg_out = hook.fine_chunk(
                    seg.T.astype(np.int32), temperature,
                    np.asarray(sub, np.uint32)).T
                full[:, start:end] = seg_out[:, : end - start]
                if end >= T:
                    break
                continue
            idx = jnp.asarray(seg.T[None])  # (1, 512, 8)
            for cb in range(N_COARSE_CODEBOOKS, N_FINE_CODEBOOKS):
                logits = self.fine_acoustics(cb, idx)
                key, sub = jax.random.split(key)
                if temperature <= 0:
                    pred = jnp.argmax(logits[..., :CODEBOOK_SIZE], axis=-1)
                else:
                    pred = jax.random.categorical(
                        sub, logits[..., :CODEBOOK_SIZE] / temperature
                    )
                idx = idx.at[:, :, cb].set(pred[0].astype(jnp.int32))
            seg_out = np.asarray(jax.device_get(idx))[0].T
            full[:, start:end] = seg_out[:, : end - start]
            if end >= T:
                break
        return np.clip(full, 0, CODEBOOK_SIZE - 1)

    # ---- top level ----

    def make_batcher(self, max_batch: int = 4, window_ms: float = 10.0,
                     **kwargs):
        """Stage-stacked batching over the 3-stage pipeline (see
        batcher.py)."""
        from .batcher import BarkBatcher

        return BarkBatcher(self, max_batch=max_batch, window_ms=window_ms,
                           **kwargs)

    def generate(self, text: str, voice: Optional[str] = None,
                 temperature: float = 0.7, fine_temperature: float = 0.5,
                 split_pattern: str = "\n", **kwargs):
        voice_prompt = None
        if voice is not None and isinstance(voice, str) and voice.endswith(".npz"):
            with np.load(voice) as d:
                voice_prompt = {k: d[k] for k in d.files}
        elif isinstance(voice, dict):
            voice_prompt = voice

        for segment_idx, segment in enumerate(
            s for s in text.split(split_pattern) if s.strip()
        ):
            t0 = time.perf_counter()
            semantic = self.generate_text_semantic(
                segment, voice_prompt, temperature, seed=kwargs.get("seed", 0)
            )
            if len(semantic) == 0:
                continue
            coarse = self.generate_coarse(semantic, voice_prompt, temperature)
            fine = self.generate_fine(coarse, voice_prompt, fine_temperature)
            codes = jnp.asarray(fine[None, None])  # (frames=1, B=1, nq, T)
            audio = np.asarray(
                jax.device_get(self.codec.decode(codes))
            ).reshape(-1)
            elapsed = time.perf_counter() - t0
            dur = len(audio) / self.sample_rate
            yield GenerationResult(
                audio=audio, samples=len(audio), sample_rate=self.sample_rate,
                segment_idx=segment_idx, token_count=int(len(semantic)),
                audio_duration=format_duration(dur),
                real_time_factor=round(elapsed / max(dur, 1e-9), 3),
                prompt={"tokens": int(len(semantic)),
                        "tokens-per-sec": round(len(semantic) / elapsed, 2)},
                audio_samples={"samples": len(audio),
                               "samples-per-sec": round(len(audio) / elapsed, 2)},
                processing_time_seconds=elapsed,
                peak_memory_usage=0.0,
            )

    def sanitize(self, weights: dict) -> dict:
        out = {}
        for k, v in weights.items():
            k = k.replace("_orig_mod.", "")
            k = k.replace("transformer.wte.", "input_embeds_layer.")
            k = k.replace("transformer.wpe.", "position_embeds_layer.")
            k = k.replace("transformer.h.", "layers.")
            k = k.replace("transformer.ln_f.", "layernorm_final.")
            k = k.replace(".ln_1.", ".layernorm_1.")
            k = k.replace(".ln_2.", ".layernorm_2.")
            k = k.replace(".attn.c_attn.", ".attn.att_proj.")
            k = k.replace(".attn.c_proj.", ".attn.out_proj.")
            k = k.replace(".mlp.c_fc.", ".mlp.in_proj.")
            k = k.replace(".mlp.c_proj.", ".mlp.out_proj.")
            out[k] = v
        return out

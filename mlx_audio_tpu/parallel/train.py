"""Sharded LM training step: DP × PP × TP in one jitted program.

Built for fine-tuning the LM backbones of audio models (Orpheus/Vyvo
SNAC-LMs, Qwen3-TTS talker, VibeVoice) on TPU pods. The reference has no
training path at all (SURVEY §2.8) — this is new surface, designed the
scaling-book way:

- mesh axes: `data` (DP, DCN-friendly), `stage` (PP, ICI ring),
  `model` (TP, innermost ICI).
- batch sharded over `data` (GSPMD), transformer blocks stacked and
  sharded over `stage` (manual GPipe schedule in pipeline.py), projection
  matrices sharded over `model` (GSPMD TP rules).
- one `jax.jit` wraps loss + grad + optax update; XLA inserts all
  collectives (grad psum over data, activation ppermute over stage,
  reduce-scatter/all-gather over model).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import LLAMA_TP_RULES, shard_module
from .pipeline import pipeline_forward, shard_stacked_layers, stack_layers

__all__ = [
    "PipelinedLM",
    "split_causal_lm",
    "pp_lm_logits",
    "lm_loss",
    "make_train_step",
]


class PipelinedLM(NamedTuple):
    """CausalLM parameters split for pipelining. Pure array pytree —
    safe under jit/grad/optax. Static config (head_dim, rope_theta)
    travels separately (see :func:`split_causal_lm`)."""

    embed_tokens: Any
    stacked_blocks: Any  # layer axis leading, sharded over `stage`
    norm: Any
    lm_head: Any         # None → tied embeddings
    rope_freqs: Any      # None or per-dim inverse frequencies (llama3)


def split_causal_lm(lm, mesh: Optional[Mesh] = None,
                    tp_rules=LLAMA_TP_RULES):
    """Split a lm.transformer.CausalLM into (PipelinedLM, static_cfg),
    optionally placing every leaf on a (data, stage, model) mesh."""
    stacked = stack_layers(lm.model.layers)
    embed = lm.model.embed_tokens
    norm = lm.model.norm
    head = getattr(lm, "lm_head", None)
    if mesh is not None:
        stacked = shard_stacked_layers(stacked, mesh, tp_rules)
        embed = shard_module(embed, mesh, [(r"weight$", P("model", None))])
        norm = shard_module(norm, mesh, [])
        if head is not None:
            head = shard_module(head, mesh, [(r"weight$", P("model", None))])
    params = PipelinedLM(embed, stacked, norm, head, lm.model._rope_freqs)
    static = {"head_dim": lm.config.head_dim,
              "rope_theta": lm.config.rope_theta}
    return params, static


def pp_lm_logits(params: PipelinedLM, tokens: jax.Array, mesh: Mesh, *,
                 head_dim: int, rope_theta: float,
                 microbatches: Optional[int] = None,
                 remat: bool = False) -> jax.Array:
    """Training forward (no KV cache): (B, T) tokens → (B, T, V)."""
    from ..ops.attention import make_causal_mask
    from ..ops.rope import rope_cos_sin

    h = params.embed_tokens(tokens)
    T = h.shape[1]
    freqs = params.rope_freqs
    if freqs is not None:
        freqs = jax.lax.stop_gradient(freqs)  # rope table is not trainable
    cos, sin = rope_cos_sin(jnp.arange(T), head_dim, base=rope_theta,
                            freqs=freqs, dtype=jnp.float32)
    mask = make_causal_mask(T, T)

    def layer_fn(layer, x, cos, sin, mask):
        return layer(x, cos, sin, mask, None)[0]

    if remat:
        # rematerialize per-layer activations in backward: trades FLOPs for
        # HBM so long sequences / deep stacks fit (jax.checkpoint)
        layer_fn = jax.checkpoint(layer_fn)

    h = pipeline_forward(params.stacked_blocks, h, layer_fn, mesh,
                         cos, sin, mask, microbatches=microbatches)
    h = params.norm(h)
    if params.lm_head is not None:
        return params.lm_head(h)
    return params.embed_tokens.as_linear(h)


def lm_loss(params: PipelinedLM, tokens: jax.Array, mesh: Mesh, *,
            head_dim: int, rope_theta: float,
            microbatches: Optional[int] = None,
            remat: bool = False) -> jax.Array:
    """Mean next-token cross-entropy (f32 log-softmax for stability)."""
    logits = pp_lm_logits(params, tokens[:, :-1], mesh, head_dim=head_dim,
                          rope_theta=rope_theta, microbatches=microbatches,
                          remat=remat)
    targets = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return nll.mean()


def make_train_step(optimizer, mesh: Mesh, *, head_dim: int,
                    rope_theta: float,
                    microbatches: Optional[int] = None,
                    grad_accum: int = 1,
                    remat: bool = False):
    """jit-compiled (params, opt_state, tokens) → (params, opt_state,
    loss) with the batch sharded over `data`.

    `optimizer` is any optax GradientTransformation; opt_state from
    `optimizer.init(params)` inherits the parameter shardings.

    grad_accum > 1 splits the leading batch axis into that many
    sequentially-accumulated chunks (one optimizer update), letting the
    effective batch exceed what fits in HBM at once; remat=True
    rematerializes layer activations in the backward pass
    (`jax.checkpoint`), trading FLOPs for memory on long sequences.
    """
    import optax

    def loss_fn(p, toks):
        return lm_loss(p, toks, mesh, head_dim=head_dim,
                       rope_theta=rope_theta, microbatches=microbatches,
                       remat=remat)

    def step(params: PipelinedLM, opt_state, tokens):
        tokens = jax.lax.with_sharding_constraint(
            tokens, NamedSharding(mesh, P("data", None)))
        if grad_accum > 1:
            B = tokens.shape[0]
            if B % grad_accum:
                raise ValueError(
                    f"batch {B} not divisible by grad_accum={grad_accum}")
            # interleaved split: chunk i takes rows i, i+g, ... so every
            # micro-batch keeps the input's `data`-axis sharding (a
            # contiguous split would land each chunk on a subset of the
            # data shards and force resharding per accumulation step)
            chunks = tokens.reshape(B // grad_accum, grad_accum,
                                    tokens.shape[1]).swapaxes(0, 1)

            def accum(carry, toks):
                loss_sum, grad_sum = carry
                loss, grads = jax.value_and_grad(loss_fn)(params, toks)
                # accumulate in f32 — bf16 summation loses small
                # contributions across micro-steps
                grad_sum = jax.tree.map(
                    lambda a, g: a + g.astype(jnp.float32), grad_sum, grads)
                return (loss_sum + loss, grad_sum), None

            zeros = jax.tree.map(
                lambda p_: jnp.zeros(p_.shape, jnp.float32), params)
            (loss_sum, grad_sum), _ = jax.lax.scan(
                accum, (jnp.zeros((), jnp.float32), zeros), chunks)
            loss = loss_sum / grad_accum
            grads = jax.tree.map(
                lambda g, p_: (g / grad_accum).astype(p_.dtype),
                grad_sum, params)
        else:
            loss, grads = jax.value_and_grad(loss_fn)(params, tokens)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))

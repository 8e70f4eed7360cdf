"""Pipeline parallelism + sharded training step on the 8-device CPU mesh.

Covers parallel/pipeline.py (GPipe schedule over `stage` via shard_map +
ppermute) and parallel/train.py (DP x PP x TP training step). The oracle
for every pipeline test is the plain sequential layer loop.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_tpu.lm import CausalLM, LMConfig
from mlx_audio_tpu.parallel import (
    get_mesh,
    make_train_step,
    pipeline_forward,
    pp_lm_logits,
    split_causal_lm,
    stack_layers,
)


def _tiny_cfg(layers=4):
    return LMConfig(
        hidden_size=32,
        num_hidden_layers=layers,
        intermediate_size=64,
        num_attention_heads=4,
        num_key_value_heads=4,
        vocab_size=64,
    )


def _ref_logits(model, ids):
    out, _ = model(ids)
    return np.asarray(out)


def test_stack_layers_roundtrip_slice():
    model = CausalLM(_tiny_cfg())
    stacked = stack_layers(model.model.layers)
    leaf = stacked.self_attn.q_proj.weight
    assert leaf.shape[0] == 4
    one = jax.tree_util.tree_map(lambda x: x[2], stacked)
    orig = model.model.layers[2]
    np.testing.assert_array_equal(
        np.asarray(one.self_attn.q_proj.weight),
        np.asarray(orig.self_attn.q_proj.weight))


@pytest.mark.parametrize("stages,microbatches", [(2, 2), (4, 4), (2, 4)])
def test_pipeline_forward_matches_sequential(stages, microbatches):
    cfg = _tiny_cfg(layers=4)
    model = CausalLM(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 64, (4, 6)))
    ref = _ref_logits(model, ids)

    mesh = get_mesh(data=1, stage=stages, model=1)
    params, static = split_causal_lm(model, mesh)
    got = jax.jit(
        lambda p, i: pp_lm_logits(p, i, mesh, microbatches=microbatches,
                                  **static))(params, ids)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=2e-4)


def test_pipeline_single_stage_scan_path():
    """stage=1 mesh takes the plain scan path and must still match."""
    cfg = _tiny_cfg(layers=4)
    model = CausalLM(cfg)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 64, (2, 5)))
    ref = _ref_logits(model, ids)
    mesh = get_mesh(data=8, model=1)
    params, static = split_causal_lm(model, mesh=None)
    got = pp_lm_logits(params, ids, mesh, **static)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=2e-4)


def test_pipeline_composes_with_tp():
    """PP over `stage` with TP-sharded projections (auto `model` axis)."""
    cfg = _tiny_cfg(layers=4)
    model = CausalLM(cfg)
    ids = jnp.asarray(np.random.default_rng(2).integers(0, 64, (4, 6)))
    ref = _ref_logits(model, ids)

    mesh = get_mesh(data=1, stage=2, model=4)
    params, static = split_causal_lm(model, mesh)
    from jax.sharding import PartitionSpec as P
    spec = params.stacked_blocks.self_attn.q_proj.weight.sharding.spec
    assert spec == P("stage", "model", None)
    got = jax.jit(
        lambda p, i: pp_lm_logits(p, i, mesh, **static))(params, ids)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-3, rtol=2e-3)


def test_train_step_dp_pp_tp_loss_decreases():
    """Full training step on a (data=2, stage=2, model=2) mesh."""
    import optax

    cfg = _tiny_cfg(layers=4)
    model = CausalLM(cfg)
    mesh = get_mesh(data=2, stage=2, model=2)
    params, static = split_causal_lm(model, mesh)
    optimizer = optax.adam(3e-3)
    opt_state = optimizer.init(params)
    step = make_train_step(optimizer, mesh, **static)

    rng = np.random.default_rng(3)
    tokens = jnp.asarray(rng.integers(0, 64, (4, 9)))
    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, tokens)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_pipeline_grad_matches_sequential_grad():
    """GPipe backward (autodiff through ppermute) == sequential grad."""
    cfg = _tiny_cfg(layers=2)
    model = CausalLM(cfg)
    ids = jnp.asarray(np.random.default_rng(4).integers(0, 64, (2, 5)))

    def seq_loss(m):
        out, _ = m(ids)
        return (out.astype(jnp.float32) ** 2).mean()

    g_ref = jax.grad(seq_loss)(model)
    ref_leaf = np.asarray(g_ref.model.layers[0].self_attn.q_proj.weight)

    mesh = get_mesh(data=1, stage=2, model=1)
    params, static = split_causal_lm(model, mesh)

    def pp_loss(p):
        out = pp_lm_logits(p, ids, mesh, **static)
        return (out.astype(jnp.float32) ** 2).mean()

    g_pp = jax.jit(jax.grad(pp_loss))(params)
    got_leaf = np.asarray(
        g_pp.stacked_blocks.self_attn.q_proj.weight[0])
    np.testing.assert_allclose(got_leaf, ref_leaf, atol=2e-4, rtol=2e-3)


def test_grad_accum_and_remat_match_plain_step():
    """grad_accum=2 + remat must produce the same update as one full-batch
    step (same total gradient, scaled identically)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from mlx_audio_tpu.lm.transformer import CausalLM, LMConfig
    from mlx_audio_tpu.parallel import get_mesh
    from mlx_audio_tpu.parallel.train import make_train_step, split_causal_lm

    cfg = LMConfig.from_dict(dict(
        model_type="llama", vocab_size=64, hidden_size=16,
        intermediate_size=32, num_hidden_layers=2, num_attention_heads=2,
        num_key_value_heads=2, head_dim=8))
    mesh = get_mesh(data=2, stage=2, model=2)
    lm = CausalLM(cfg)
    params, static = split_causal_lm(lm, mesh)
    opt = optax.sgd(0.1)
    opt_state = opt.init(params)

    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 64, (4, 12)), jnp.int32)

    plain = make_train_step(opt, mesh, **static)
    accum = make_train_step(opt, mesh, grad_accum=2, remat=True, **static)

    import jax.numpy as _jnp

    copy = lambda t: jax.tree.map(_jnp.copy, t)  # steps donate their inputs
    p1, _, l1 = plain(copy(params), copy(opt_state), tokens)
    p2, _, l2 = accum(copy(params), copy(opt_state), tokens)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    a = jax.tree_util.tree_leaves(p1)
    b = jax.tree_util.tree_leaves(p2)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=1e-5, rtol=1e-5)

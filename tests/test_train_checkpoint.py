"""Training checkpoint/resume on the sharded (data, stage, model) mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mlx_audio_tpu.lm import CausalLM, LMConfig
from mlx_audio_tpu.parallel import (
    get_mesh,
    make_train_step,
    restore_train_state,
    save_train_state,
    split_causal_lm,
)


def _setup():
    cfg = LMConfig(hidden_size=32, num_hidden_layers=4,
                   intermediate_size=64, num_attention_heads=4,
                   num_key_value_heads=4, vocab_size=64)
    mesh = get_mesh(data=2, stage=2, model=2)
    model = CausalLM(cfg)
    params, static = split_causal_lm(model, mesh)
    opt = optax.adam(1e-3)
    return mesh, params, static, opt, model


def test_save_restore_resume_bit_exact(tmp_path):
    mesh, params, static, opt, model = _setup()
    # B-template made up front: the train step donates its inputs, and
    # device_put-to-same-sharding may alias, so params share buffers with
    # `model` — after training, re-splitting `model` would see deleted
    # arrays (jax donation semantics, not a framework bug)
    pb, _ = split_causal_lm(model, mesh)
    ob = opt.init(pb)

    opt_state = opt.init(params)
    step_fn = make_train_step(opt, mesh, **static)
    tokens = jnp.asarray(np.random.default_rng(0).integers(0, 64, (4, 9)))

    for _ in range(2):
        params, opt_state, _ = step_fn(params, opt_state, tokens)
    save_train_state(tmp_path / "ckpt", params, opt_state, step=2)

    # branch A: keep training
    pa, oa = params, opt_state
    la = []
    for _ in range(2):
        pa, oa, loss = step_fn(pa, oa, tokens)
        la.append(float(loss))

    # branch B: restore into the pre-made templates -> train
    pb, ob, step = restore_train_state(tmp_path / "ckpt", pb, ob)
    assert step == 2
    lb = []
    for _ in range(2):
        pb, ob, loss = step_fn(pb, ob, tokens)
        lb.append(float(loss))

    np.testing.assert_allclose(la, lb, rtol=1e-6)
    # restored leaves keep their mesh shardings (trailing Nones trimmed)
    s = pb.stacked_blocks.self_attn.q_proj.weight.sharding
    assert tuple(s.spec)[:2] == ("stage", "model"), s.spec


def test_save_params_only_restore(tmp_path):
    mesh, params, static, opt, _ = _setup()
    save_train_state(tmp_path / "p_only", params, step=7)
    params2, none_opt, step = restore_train_state(tmp_path / "p_only", params)
    assert step == 7 and none_opt is None
    a = np.asarray(params.stacked_blocks.self_attn.q_proj.weight,
                   np.float32)
    b = np.asarray(params2.stacked_blocks.self_attn.q_proj.weight,
                   np.float32)
    np.testing.assert_array_equal(a, b)

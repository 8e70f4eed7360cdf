"""Multi-device tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from mlx_audio_tpu.lm import CausalLM, LMConfig
from mlx_audio_tpu.parallel import LLAMA_TP_RULES, get_mesh, replicate, shard_module


def test_mesh_shapes():
    mesh = get_mesh()
    assert mesh.devices.size == 8
    mesh2 = get_mesh(model=4)
    assert mesh2.devices.shape == (2, 4)


def test_tp_sharded_forward_matches_single_device():
    cfg = LMConfig(
        hidden_size=64,
        num_hidden_layers=2,
        intermediate_size=128,
        num_attention_heads=8,
        num_key_value_heads=8,
        vocab_size=96,
    )
    model = CausalLM(cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 96, (2, 6)))
    ref, _ = model(ids)

    mesh = get_mesh(data=2, model=4)
    sharded = shard_module(model, mesh, LLAMA_TP_RULES)
    # q_proj weight must actually be sharded over the model axis
    s = sharded.model.layers[0].self_attn.q_proj.weight.sharding
    assert s.spec == P("model", None)

    out, _ = jax.jit(lambda m, i: m(i))(sharded, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2, rtol=1e-2)


def test_replicated_data_parallel_batch():
    cfg = LMConfig(
        hidden_size=32,
        num_hidden_layers=1,
        intermediate_size=64,
        num_attention_heads=4,
        vocab_size=50,
    )
    model = CausalLM(cfg)
    mesh = get_mesh()  # 8 data
    rep = replicate(model, mesh)
    ids = jnp.zeros((8, 4), jnp.int32)
    ids = jax.device_put(ids, NamedSharding(mesh, P("data", None)))
    out, _ = jax.jit(lambda m, i: m(i))(rep, ids)
    assert out.shape == (8, 4, 50)

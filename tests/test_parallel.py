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


def test_dit_tensor_parallel_forward():
    """SAM-Audio DiT jits + executes over a (1, model=2) mesh with
    DIT_TP_RULES shardings."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mlx_audio_tpu.parallel import DIT_TP_RULES, get_mesh, shard_module
    from mlx_audio_tpu.sts.models.sam_audio import DiT, TransformerConfig

    mesh = get_mesh(data=1, model=2, devices=jax.devices()[:2])
    dit = DiT(TransformerConfig(dim=32, n_heads=4, n_layers=2,
                                context_dim=32, out_channels=16,
                                frequency_embedding_dim=16))
    ref = np.asarray(dit(jnp.zeros((1, 6, 32)), jnp.full((1,), 0.5),
                         memory=jnp.ones((1, 2, 32)) * 0.1))
    sharded = shard_module(dit, mesh, DIT_TP_RULES)

    @jax.jit
    def fwd(m, x, t, mem):
        return m(x, t, memory=mem)

    out = np.asarray(fwd(sharded, jnp.zeros((1, 6, 32)),
                         jnp.full((1,), 0.5), jnp.ones((1, 2, 32)) * 0.1))
    assert out.shape == (1, 6, 16)
    # sharded execution must match the single-device result
    assert np.allclose(out, ref, atol=1e-4)


def test_sequence_parallel_whisper_encoder():
    """Long-audio sequence parallelism: mel time axis sharded over the model
    axis; the unmodified encoder jits and matches the single-device result
    (GSPMD inserts conv halos + attention collectives)."""
    from mlx_audio_tpu.parallel import replicate, shard_sequence
    from mlx_audio_tpu.stt.models.whisper import Model, ModelDimensions

    dims = ModelDimensions(
        n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=2,
        n_audio_layer=1, n_vocab=100, n_text_ctx=448, n_text_state=64,
        n_text_head=2, n_text_layer=1,
    )
    model = Model(dims)
    mel = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 3000, 80)), jnp.float32
    ) * 0.1
    ref = np.asarray(model.encoder(mel))

    mesh = get_mesh(data=2, model=4)
    rep = replicate(model, mesh)
    mel_sp = shard_sequence(mel, mesh, dim=1, axis="model")
    out = jax.jit(lambda m, x: m.encoder(x))(rep, mel_sp)
    assert out.sharding.spec is not None  # executed under the mesh
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_shard_sequence_fallback_replicates():
    from mlx_audio_tpu.parallel import shard_sequence

    mesh = get_mesh(data=2, model=4)
    x = jnp.zeros((1, 37, 8))  # 37 not divisible by 4
    y = shard_sequence(x, mesh, dim=1, axis="model")
    assert np.asarray(y).shape == (1, 37, 8)


def test_maybe_shard_for_serving_env_opt_in(monkeypatch):
    """MLX_AUDIO_TPU_TP=4 shards loaded models' projections; output
    matches the unsharded forward."""
    from mlx_audio_tpu.utils import maybe_shard_for_serving

    cfg = LMConfig(hidden_size=64, num_hidden_layers=2,
                   intermediate_size=128, num_attention_heads=8,
                   num_key_value_heads=8, vocab_size=96)
    model = CausalLM(cfg)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 96, (2, 6)))
    ref, _ = model(ids)

    monkeypatch.setenv("MLX_AUDIO_TPU_TP", "4")
    sharded = maybe_shard_for_serving(model)
    s = sharded.model.layers[0].self_attn.q_proj.weight.sharding
    assert s.spec == P("model", None)
    out, _ = jax.jit(lambda m, i: m(i))(sharded, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=1e-2)

    monkeypatch.setenv("MLX_AUDIO_TPU_TP", "")
    same = maybe_shard_for_serving(model)
    assert same is model


def test_tp_vibevoice_asr_real_widths_sharded_matches_single():
    """TP through a REAL model class at real decoder widths (VERDICT r2
    item 6): VibeVoice-ASR with its audio encoders + Qwen2.5-7B decoder
    widths (hidden 3584, inter 18944, 28 heads / 4 kv) at reduced layer
    count, sharded 8-way over the model axis. Sharded logits must match
    the single-device forward. The audio encoder replicates (LLAMA_TP_RULES
    match nothing there) while every decoder projection is column/row
    sharded — the intended 9B serving layout (SURVEY §2.8)."""
    from mlx_audio_tpu.stt.models.vibevoice_asr import (
        Model as VModel,
        ModelConfig,
        Qwen2Config,
        TokenizerEncoderConfig,
    )
    from mlx_audio_tpu.stt.models.vibevoice_asr.vibevoice_asr import _lm_call

    enc = TokenizerEncoderConfig(
        vae_dim=64, encoder_n_filters=32, encoder_ratios=(8, 5, 5, 4, 2, 2),
        encoder_depths="1-1-1-1-1-1-2")  # real widths/hop, reduced depth
    sem = TokenizerEncoderConfig(
        vae_dim=128, fix_std=0.0, std_dist_type="none",
        encoder_n_filters=32, encoder_ratios=(8, 5, 5, 4, 2, 2),
        encoder_depths="1-1-1-1-1-1-2")
    cfg = ModelConfig(
        acoustic_tokenizer_config=enc, semantic_tokenizer_config=sem,
        decoder_config=Qwen2Config(
            vocab_size=2048,  # reduced: embedding size is irrelevant to TP
            hidden_size=3584, num_hidden_layers=2,
            num_attention_heads=28, num_key_value_heads=4,
            intermediate_size=18944),
        acoustic_vae_dim=64, semantic_vae_dim=128)
    model = VModel(cfg)

    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal(3200 * 4) * 0.1, jnp.float32)
    ids = jnp.asarray(rng.integers(0, 2048, (1, 16)), jnp.int32)
    pos = jnp.arange(4) + 6  # splice the 4 speech frames mid-prompt

    def fwd(m, audio, ids, pos):
        feats = m.encode_speech(audio)  # (1, 4, 3584)
        emb = m.language_model.model.embed_tokens(ids)
        emb = emb.at[0, pos].set(feats[0])
        logits, _ = _lm_call(m.language_model, emb, None)
        return logits

    ref = np.asarray(jax.jit(fwd)(model, audio, ids, pos))

    mesh = get_mesh(data=1, model=8)
    sharded = shard_module(model, mesh, LLAMA_TP_RULES)
    s = sharded.language_model.model.layers[0].self_attn.q_proj.weight.sharding
    assert s.spec == P("model", None)
    s = sharded.language_model.model.layers[0].mlp.down_proj.weight.sharding
    assert s.spec == P(None, "model")

    out = np.asarray(jax.jit(fwd)(sharded, audio, ids, pos))
    assert out.shape == (1, 16, 2048)
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=1e-2)


def test_tp_quantized_matches_single_device():
    """TP x quantization: int4 packed weight/scales/biases triples shard
    with the float rules (column- and row-parallel) and TP logits equal
    single-device int4 logits exactly."""
    from mlx_audio_tpu.nn import quantize_module
    from mlx_audio_tpu.nn.quantized import QuantizedLinear

    cfg = LMConfig(
        hidden_size=64,
        num_hidden_layers=2,
        intermediate_size=128,
        num_attention_heads=8,
        num_key_value_heads=8,
        vocab_size=96,
    )
    qmodel = quantize_module(CausalLM(cfg), group_size=32, bits=4)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 96, (2, 6)))
    ref, _ = jax.jit(lambda m, i: m(i))(qmodel, ids)

    mesh = get_mesh(data=4, model=2)
    sharded = shard_module(qmodel, mesh, LLAMA_TP_RULES)
    qp = sharded.model.layers[0].self_attn.q_proj
    assert isinstance(qp, QuantizedLinear)
    # whole triple column-sharded together
    assert qp.weight.sharding.spec == P("model", None)
    assert qp.scales.sharding.spec == P("model", None)
    assert qp.biases.sharding.spec == P("model", None)
    # row-parallel triple: packed K dim + groups sharded together
    dp = sharded.model.layers[0].mlp.down_proj
    assert dp.weight.sharding.spec == P(None, "model")
    assert dp.scales.sharding.spec == P(None, "model")
    # pallas fused-dequant routing must step aside under TP
    assert qp.tp_sharded and not qp._pallas_routable(jnp.zeros((1, 64)))

    out, _ = jax.jit(lambda m, i: m(i))(sharded, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=1e-2)


def test_tp_quantized_group_misalignment_replicates_triple():
    """A row-parallel split that doesn't land on quant-group boundaries
    must replicate the WHOLE triple (never mix shard layouts within one
    affine dequant)."""
    from mlx_audio_tpu.nn import quantize_module

    cfg = LMConfig(
        hidden_size=64,
        num_hidden_layers=1,
        intermediate_size=96,  # 96/32 = 3 groups: not divisible by model=2
        num_attention_heads=8,
        num_key_value_heads=8,
        vocab_size=96,
    )
    qmodel = quantize_module(CausalLM(cfg), group_size=32, bits=4)
    mesh = get_mesh(data=4, model=2)
    sharded = shard_module(qmodel, mesh, LLAMA_TP_RULES)
    dp = sharded.model.layers[0].mlp.down_proj
    # scales (out, 3) fails divisibility → weight (out, 24) would divide,
    # but the triple replicates together
    assert dp.scales.sharding.spec == P()
    assert dp.weight.sharding.spec == P()
    assert dp.biases.sharding.spec == P()
    assert not getattr(dp, "tp_sharded", False)

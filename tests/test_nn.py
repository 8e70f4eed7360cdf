"""Unit tests for the pytree module system and core layers.

Golden values come from torch (CPU) — the same source of truth the reference
models were converted from.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

import mlx_audio_tpu.nn as nn
from mlx_audio_tpu.nn.module import flatten_params, load_weights


class Tiny(nn.Module):
    def __init__(self):
        self.lin = nn.Linear(4, 8)
        self.layers = [nn.Linear(8, 8), nn.Linear(8, 2)]
        self.name = "tiny"

    def __call__(self, x):
        x = self.lin(x)
        for l in self.layers:
            x = jax.nn.relu(l(x))
        return x


def test_module_is_pytree_and_jits():
    m = Tiny()
    leaves = jax.tree_util.tree_leaves(m)
    assert all(hasattr(l, "shape") for l in leaves)

    @jax.jit
    def fwd(model, x):
        return model(x)

    x = jnp.ones((2, 4))
    y = fwd(m, x)
    assert y.shape == (2, 2)
    # second call hits the jit cache (same treedef)
    y2 = fwd(m, x + 1)
    assert y2.shape == (2, 2)


def test_param_paths_match_safetensors_convention():
    m = Tiny()
    params = flatten_params(m)
    assert "lin.weight" in params
    assert "lin.bias" in params
    assert "layers.0.weight" in params
    assert "layers.1.bias" in params


def test_load_weights_strict_roundtrip():
    m = Tiny()
    params = flatten_params(m)
    new = {k: np.full(v.shape, 0.5, np.float32) for k, v in params.items()}
    m2 = load_weights(m, new, strict=True)
    assert np.allclose(np.asarray(m2.lin.weight), 0.5)
    with pytest.raises(ValueError):
        load_weights(m, {"nope.weight": np.zeros(3)}, strict=False)
    bad = dict(new)
    bad["lin.weight"] = np.zeros((3, 3), np.float32)
    with pytest.raises(ValueError):
        load_weights(m, bad)


def test_buffers_excluded_from_params():
    class WithBuf(nn.Module):
        def __init__(self):
            self.w = jnp.ones((3,))
            self._mel = jnp.ones((5, 5))

        def __call__(self, x):
            return x

    m = WithBuf()
    params = flatten_params(m)
    assert "w" in params and "_mel" not in params
    # buffer still traced by jit (is a leaf)
    assert len(jax.tree_util.tree_leaves(m)) == 2
    load_weights(m, {"w": np.zeros(3, np.float32)}, strict=True)  # no error


def _t2j(t):
    return jnp.asarray(t.detach().numpy())


def test_conv1d_matches_torch():
    torch.manual_seed(0)
    tc = torch.nn.Conv1d(6, 10, 5, stride=2, padding=3, dilation=2)
    x = torch.randn(2, 6, 37)
    ref = tc(x).detach().numpy()

    c = nn.Conv1d(6, 10, 5, stride=2, padding=3, dilation=2)
    c.weight = _t2j(tc.weight.permute(0, 2, 1))  # (out,in,k)->(out,k,in)
    c.bias = _t2j(tc.bias)
    y = c(jnp.swapaxes(_t2j(x), 1, 2))  # NCL -> NLC
    np.testing.assert_allclose(np.swapaxes(np.asarray(y), 1, 2), ref, atol=1e-4)


def test_depthwise_conv1d_matches_torch():
    torch.manual_seed(1)
    tc = torch.nn.Conv1d(8, 8, 3, padding=1, groups=8)
    x = torch.randn(1, 8, 20)
    ref = tc(x).detach().numpy()
    c = nn.Conv1d(8, 8, 3, padding=1, groups=8)
    c.weight = _t2j(tc.weight.permute(0, 2, 1))
    c.bias = _t2j(tc.bias)
    y = c(jnp.swapaxes(_t2j(x), 1, 2))
    np.testing.assert_allclose(np.swapaxes(np.asarray(y), 1, 2), ref, atol=1e-5)


@pytest.mark.parametrize("stride,padding,output_padding,k", [(2, 1, 0, 4), (4, 2, 0, 8), (3, 1, 1, 5), (1, 0, 0, 3)])
def test_conv_transpose1d_matches_torch(stride, padding, output_padding, k):
    torch.manual_seed(2)
    tc = torch.nn.ConvTranspose1d(6, 4, k, stride=stride, padding=padding,
                                  output_padding=output_padding)
    x = torch.randn(2, 6, 19)
    ref = tc(x).detach().numpy()
    c = nn.ConvTranspose1d(6, 4, k, stride=stride, padding=padding,
                           output_padding=output_padding)
    # torch convT weight: (in, out, k) -> ours (out, k, in)
    c.weight = _t2j(tc.weight.permute(1, 2, 0))
    c.bias = _t2j(tc.bias)
    y = c(jnp.swapaxes(_t2j(x), 1, 2))
    np.testing.assert_allclose(np.swapaxes(np.asarray(y), 1, 2), ref, atol=1e-4)


def test_grouped_conv_transpose1d_matches_torch():
    torch.manual_seed(7)
    tc = torch.nn.ConvTranspose1d(8, 8, 4, stride=2, padding=1, groups=2)
    x = torch.randn(1, 8, 16)
    ref = tc(x).detach().numpy()
    c = nn.ConvTranspose1d(8, 8, 4, stride=2, padding=1, groups=2)
    # torch: (in, out/g, k) -> ours (out, k, in/g)
    w = tc.weight  # (8, 4, 4)
    g, cin, cog, kk = 2, 8, 4, 4
    w = w.reshape(g, cin // g, cog, kk).permute(0, 2, 3, 1).reshape(g * cog, kk, cin // g)
    c.weight = _t2j(w)
    c.bias = _t2j(tc.bias)
    y = c(jnp.swapaxes(_t2j(x), 1, 2))
    np.testing.assert_allclose(np.swapaxes(np.asarray(y), 1, 2), ref, atol=1e-4)


def test_norms_match_torch():
    torch.manual_seed(3)
    x = torch.randn(2, 7, 16)

    ln = torch.nn.LayerNorm(16)
    ours = nn.LayerNorm(16)
    np.testing.assert_allclose(
        np.asarray(ours(_t2j(x))), ln(x).detach().numpy(), atol=1e-5
    )

    gn = torch.nn.GroupNorm(4, 16)
    og = nn.GroupNorm(4, 16)
    # torch GroupNorm is NCL; ours is NLC
    ref = gn(x.permute(0, 2, 1)).permute(0, 2, 1).detach().numpy()
    np.testing.assert_allclose(np.asarray(og(_t2j(x))), ref, atol=1e-5)

    inorm = torch.nn.InstanceNorm1d(16)
    oi = nn.InstanceNorm(16, affine=False)
    ref = inorm(x.permute(0, 2, 1)).permute(0, 2, 1).detach().numpy()
    np.testing.assert_allclose(np.asarray(oi(_t2j(x))), ref, atol=1e-5)


def test_lstm_matches_torch():
    torch.manual_seed(4)
    tl = torch.nn.LSTM(5, 9, batch_first=True)
    x = torch.randn(3, 11, 5)
    ref, (h, c) = tl(x)

    ours = nn.LSTM(5, 9)
    ours.Wx = _t2j(tl.weight_ih_l0)
    ours.Wh = _t2j(tl.weight_hh_l0)
    ours.bias_ih = _t2j(tl.bias_ih_l0)
    ours.bias_hh = _t2j(tl.bias_hh_l0)
    y, (hT, cT) = ours(_t2j(x))
    np.testing.assert_allclose(np.asarray(y), ref.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hT), h[0].detach().numpy(), atol=1e-5)


def test_bilstm_matches_torch():
    torch.manual_seed(5)
    tl = torch.nn.LSTM(5, 6, batch_first=True, bidirectional=True)
    x = torch.randn(2, 8, 5)
    ref, _ = tl(x)
    ours = nn.BiLSTM(5, 6)
    ours.forward.Wx = _t2j(tl.weight_ih_l0)
    ours.forward.Wh = _t2j(tl.weight_hh_l0)
    ours.forward.bias_ih = _t2j(tl.bias_ih_l0)
    ours.forward.bias_hh = _t2j(tl.bias_hh_l0)
    ours.backward.Wx = _t2j(tl.weight_ih_l0_reverse)
    ours.backward.Wh = _t2j(tl.weight_hh_l0_reverse)
    ours.backward.bias_ih = _t2j(tl.bias_ih_l0_reverse)
    ours.backward.bias_hh = _t2j(tl.bias_hh_l0_reverse)
    y = ours(_t2j(x))
    np.testing.assert_allclose(np.asarray(y), ref.detach().numpy(), atol=1e-5)


def test_gru_matches_torch():
    torch.manual_seed(6)
    tg = torch.nn.GRU(4, 7, batch_first=True)
    x = torch.randn(2, 10, 4)
    ref, _ = tg(x)
    ours = nn.GRU(4, 7)
    ours.Wx = _t2j(tg.weight_ih_l0)
    ours.Wh = _t2j(tg.weight_hh_l0)
    ours.bias_ih = _t2j(tg.bias_ih_l0)
    ours.bias_hh = _t2j(tg.bias_hh_l0)
    y, _ = ours(_t2j(x))
    np.testing.assert_allclose(np.asarray(y), ref.detach().numpy(), atol=1e-5)


def test_quantized_linear_roundtrip():
    lin = nn.Linear(64, 32)
    for bits in (4, 8):
        q = nn.QuantizedLinear.from_linear(lin, group_size=32, bits=bits)
        w = np.asarray(q.dequantized_weight(jnp.float32))
        err = np.abs(w - np.asarray(lin.weight)).max()
        # max quantization error is half a step
        step = np.asarray(q.scales).max()
        assert err <= step * 0.51 + 1e-6
        x = jnp.ones((2, 64))
        y_ref = lin(x)
        y_q = q(x)
        assert np.allclose(np.asarray(y_q), np.asarray(y_ref), atol=32 * step)


def test_quantize_module_swaps_layers():
    m = Tiny()
    m.lin = nn.Linear(64, 64)
    m.layers = [nn.Linear(64, 64), nn.Linear(64, 2)]
    nn.quantize_module(m, group_size=32, bits=4)
    assert isinstance(m.lin, nn.QuantizedLinear)
    assert isinstance(m.layers[0], nn.QuantizedLinear)
    params = flatten_params(m)
    assert "lin.scales" in params and "lin.biases" in params


def test_quantize_roundtrip_3_and_6_bit():
    """MLX uint8-bitstream packing: 3 bytes per 8 (3-bit) / 4 (6-bit)
    values."""
    import numpy as np
    from mlx_audio_tpu.nn.quantized import (dequantize_arrays,
                                            quantize_arrays, unpack_rows)
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    w = rng.normal(size=(8, 64)).astype(np.float32)
    for bits in (3, 6):
        packed, scales, biases = quantize_arrays(w, group_size=32,
                                                 bits=bits)
        assert packed.dtype == np.uint8
        assert packed.shape == (8, 64 * bits // 8)
        deq = np.asarray(dequantize_arrays(
            jnp.asarray(packed), jnp.asarray(scales), jnp.asarray(biases),
            32, bits))
        # quantization error bounded by half a step per group
        step = scales.max()
        assert np.abs(deq - w).max() <= step * 0.51 + 1e-6
        # exact integer roundtrip through pack/unpack
        q = np.asarray(unpack_rows(jnp.asarray(packed), bits))
        assert q.max() < 2**bits and q.min() >= 0


def test_quantized_linear_3bit_forward():
    import numpy as np
    import jax.numpy as jnp
    from mlx_audio_tpu.nn.layers import Linear
    from mlx_audio_tpu.nn.quantized import QuantizedLinear

    lin = Linear(64, 16)
    qlin = QuantizedLinear.from_linear(lin, group_size=32, bits=3)
    x = jnp.asarray(np.random.randn(2, 64).astype(np.float32))
    y_ref = np.asarray(lin(x))
    y_q = np.asarray(qlin(x))
    assert y_q.shape == y_ref.shape
    # 3-bit is coarse; just require meaningful correlation
    c = np.corrcoef(y_ref.ravel(), y_q.ravel())[0, 1]
    assert c > 0.95


def test_build_on_host_matches_default_build():
    """build_on_host constructs on the CPU backend, casts, and transfers;
    with the same init seed the weights must equal a default build."""
    import numpy as np

    from mlx_audio_tpu import nn
    from mlx_audio_tpu.nn.module import build_on_host

    nn.seed_rng(7)
    direct = nn.Linear(16, 8)
    nn.seed_rng(7)
    hosted = build_on_host(lambda: nn.Linear(16, 8))
    assert hosted.weight.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(hosted.weight, np.float32),
        np.asarray(direct.weight.astype(jnp.bfloat16), np.float32))


def test_quantized_fused_linear_matches_siblings():
    """Row-stacking sibling QuantizedLinears (q/k/v sharing one activation)
    is exactly a concatenation of their outputs: every split must equal the
    standalone sibling's output at GEMV (M=1) and prefill (M>1) shapes."""
    import numpy as np
    import jax.numpy as jnp
    from mlx_audio_tpu.nn.layers import Linear
    from mlx_audio_tpu.nn.quantized import (QuantizedFusedLinear,
                                            QuantizedLinear)

    rng = np.random.default_rng(3)
    dims = [128, 64, 64]  # q, k, v output dims
    lins = []
    for d in dims:
        lin = Linear(96, d)
        lins.append(QuantizedLinear.from_linear(lin, group_size=32, bits=4))
    assert QuantizedFusedLinear.fusable(lins)
    fused = QuantizedFusedLinear.from_siblings(lins)
    assert fused.split_sizes == (128, 64, 64)
    for m in (1, 5):
        x = jnp.asarray(rng.normal(size=(m, 96)).astype(np.float32))
        outs = fused(x)
        assert len(outs) == 3
        for o, l in zip(outs, lins):
            np.testing.assert_allclose(
                np.asarray(o), np.asarray(l(x)), atol=1e-5, rtol=1e-5)


def test_quantized_fused_linear_fusable_guards():
    """Mixed bits or a TP shard vetoes fusion; mixed bias-ness fuses with a
    zero-filled bias segment (whisper's bias-less key between biased
    query/value)."""
    import numpy as np
    import jax.numpy as jnp
    from mlx_audio_tpu.nn.layers import Linear
    from mlx_audio_tpu.nn.quantized import (QuantizedFusedLinear,
                                            QuantizedLinear)

    a = QuantizedLinear.from_linear(Linear(64, 32), group_size=32, bits=4)
    b = QuantizedLinear.from_linear(Linear(64, 32), group_size=32, bits=8)
    assert not QuantizedFusedLinear.fusable([a, b])
    d = QuantizedLinear.from_linear(Linear(64, 32), group_size=32, bits=4)
    d.tp_sharded = True
    assert not QuantizedFusedLinear.fusable([a, d])
    c = QuantizedLinear.from_linear(Linear(64, 32, bias=False),
                                    group_size=32, bits=4)
    assert QuantizedFusedLinear.fusable([a, c])
    fused = QuantizedFusedLinear.from_siblings([a, c])
    x = jnp.asarray(np.random.default_rng(5).normal(size=(3, 64)),
                    jnp.float32)
    ya, yc = fused(x)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(a(x)),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(yc), np.asarray(c(x)),
                               atol=1e-5, rtol=1e-5)


def test_fuse_quantized_projections_lm_logits_equal():
    """Post-load fusion on a quantized CausalLM: q/k/v and gate/up collapse
    into fused GEMVs, the original modules are consumed, and logits match
    the unfused model (prefill and cached decode)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from mlx_audio_tpu.lm.transformer import CausalLM, LMConfig
    from mlx_audio_tpu.nn import quantize_module
    from mlx_audio_tpu.nn.quantized import (QuantizedFusedLinear,
                                            fuse_quantized_projections)

    cfg = LMConfig(
        hidden_size=64,
        num_hidden_layers=2,
        intermediate_size=128,
        num_attention_heads=8,
        num_key_value_heads=4,
        vocab_size=96,
    )
    nn_seed = np.random.default_rng(11)
    ids = jnp.asarray(nn_seed.integers(0, 96, (2, 6)))
    qmodel = quantize_module(CausalLM(cfg), group_size=32, bits=4)
    ref, _ = jax.jit(lambda m, i: m(i))(qmodel, ids)

    n = fuse_quantized_projections(qmodel)
    assert n == 4  # 2 layers x (qkv + gate_up)
    attn = qmodel.model.layers[0].self_attn
    assert isinstance(attn.qkv_fused, QuantizedFusedLinear)
    assert not hasattr(attn, "q_proj")
    mlp = qmodel.model.layers[0].mlp
    assert isinstance(mlp.gate_up_fused, QuantizedFusedLinear)
    assert not hasattr(mlp, "gate_proj")

    out, _ = jax.jit(lambda m, i: m(i))(qmodel, ids)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-2, rtol=1e-2)

    # idempotent + float models untouched
    assert fuse_quantized_projections(qmodel) == 0
    assert fuse_quantized_projections(CausalLM(cfg)) == 0


def test_fuse_quantized_projections_env_kill_switch(monkeypatch):
    from mlx_audio_tpu.lm.transformer import CausalLM, LMConfig
    from mlx_audio_tpu.nn import quantize_module
    from mlx_audio_tpu.nn.quantized import fuse_quantized_projections

    monkeypatch.setenv("MLX_AUDIO_TPU_FUSE_PROJ", "0")
    cfg = LMConfig(hidden_size=64, num_hidden_layers=1,
                   intermediate_size=128, num_attention_heads=8,
                   num_key_value_heads=8, vocab_size=96)
    qmodel = quantize_module(CausalLM(cfg), group_size=32, bits=4)
    assert fuse_quantized_projections(qmodel) == 0
    assert hasattr(qmodel.model.layers[0].self_attn, "q_proj")

"""Pallas kernel parity tests (interpreter mode on CPU; real-TPU runs are
exercised by bench/verify scripts)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from mlx_audio_tpu.ops.attention import scaled_dot_product_attention
from mlx_audio_tpu.ops.pallas.flash_attention import flash_attention
from mlx_audio_tpu.ops.pallas.quant_matmul import quantized_matmul
from mlx_audio_tpu.nn.quantized import dequantize_arrays, quantize_arrays


@pytest.mark.parametrize("causal", [False, True])
def test_flash_attention_matches_sdpa(causal):
    rng = np.random.default_rng(0)
    B, H, T, D = 1, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, causal=causal, block_q=128, block_k=128)
    ref = scaled_dot_product_attention(q, k, v,
                                       mask="causal" if causal else None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_quantized_matmul_matches_dequant():
    rng = np.random.default_rng(1)
    N, K = 512, 256
    w = rng.standard_normal((N, K)).astype(np.float32) * 0.05
    packed, scales, biases = quantize_arrays(w, 64, 4)
    x = jnp.asarray(rng.standard_normal((4, K)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = quantized_matmul(x, jnp.asarray(packed), jnp.asarray(scales),
                               jnp.asarray(biases), bits=4, group_size=64,
                               block_n=256)
    ref = x @ dequantize_arrays(jnp.asarray(packed), jnp.asarray(scales),
                                jnp.asarray(biases), 64, 4).T
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_quantized_matmul_int8():
    rng = np.random.default_rng(2)
    N, K = 256, 128
    w = rng.standard_normal((N, K)).astype(np.float32)
    packed, scales, biases = quantize_arrays(w, 32, 8)
    x = jnp.asarray(rng.standard_normal((2, K)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = quantized_matmul(x, jnp.asarray(packed), jnp.asarray(scales),
                               jnp.asarray(biases), bits=8, group_size=32,
                               block_n=256)
    ref = x @ dequantize_arrays(jnp.asarray(packed), jnp.asarray(scales),
                                jnp.asarray(biases), 32, 8).T
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


def test_relu2_attention_matches_reference():
    from mlx_audio_tpu.ops.pallas.relu2_attention import (
        relu2_attention,
        relu2_attention_reference,
    )

    q = jnp.asarray(np.random.randn(2, 3, 16, 8).astype(np.float32))
    k = jnp.asarray(np.random.randn(2, 3, 16, 8).astype(np.float32))
    v = jnp.asarray(np.random.randn(2, 3, 16, 12).astype(np.float32))
    expect = relu2_attention_reference(q, k, v, 16)
    with pltpu.force_tpu_interpret_mode():
        got = relu2_attention(q, k, v, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=1e-5)


@pytest.mark.parametrize("T,S", [(150, 150), (300, 150), (1500 % 256 + 256, 200)])
def test_flash_attention_non_multiple_shapes(T, S):
    """Whisper-encoder-style shapes: T/S not block multiples — padding +
    in-kernel kv_valid masking must equal the exact softmax."""
    rng = np.random.default_rng(1)
    B, H, D = 1, 2, 64
    q = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, block_q=128, block_k=128)
    ref = scaled_dot_product_attention(q, k, v)
    assert out.shape == (B, H, T, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_flash_attention_causal_non_multiple():
    rng = np.random.default_rng(2)
    B, H, T, D = 1, 2, 200, 64
    q = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, causal=True, block_q=128, block_k=128)
    ref = scaled_dot_product_attention(q, k, v, mask="causal")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_quant_matmul_large_m_routes_to_xla(monkeypatch):
    """Large-M inputs (prefill / batched codec decode) must not take the
    Pallas kernel: its resident x/out blocks blow the ~16 MB VMEM budget
    (seen on-chip at M=8192, K=512). They fall back to dequant-matmul."""
    import jax.numpy as jnp
    import numpy as np

    import mlx_audio_tpu.ops.pallas as ops_pallas
    from mlx_audio_tpu.nn.layers import Linear
    from mlx_audio_tpu.nn.quantized import QuantizedLinear

    monkeypatch.setattr(ops_pallas, "pallas_enabled", lambda: True)
    lin = Linear(512, 1024)
    q = QuantizedLinear.from_linear(lin, bits=4)
    assert q._pallas_routable(jnp.zeros((1, 512))) is True       # GEMV
    assert q._pallas_routable(jnp.zeros((128, 512))) is True     # measured win
    assert q._pallas_routable(jnp.zeros((8192, 512))) is False   # VMEM OOM case
    assert q._pallas_routable(jnp.zeros((8, 1024, 512))) is False  # batched


def test_quantized_matmul_ragged_n_matches_dequant():
    """Ragged N (not a multiple of the 512 block) rides Mosaic's masked
    edge block — exactness vs the XLA dequant path (vocab-sized lm_heads,
    e.g. N=156940, are the biggest weight read of a decode step)."""
    from mlx_audio_tpu.nn.quantized import dequantize_arrays, quantize_arrays

    rng = np.random.default_rng(5)
    N, K = 700, 256  # N % 512 != 0 and N % 128 != 0
    w = rng.standard_normal((N, K)).astype(np.float32) * 0.1
    packed, scales, biases = quantize_arrays(w, group_size=64, bits=4)
    x = jnp.asarray(rng.standard_normal((3, K)).astype(np.float32) * 0.1)
    with pltpu.force_tpu_interpret_mode():
        out = quantized_matmul(x, jnp.asarray(packed), jnp.asarray(scales),
                               jnp.asarray(biases), bits=4, group_size=64)
    ref = x @ dequantize_arrays(jnp.asarray(packed), jnp.asarray(scales),
                                jnp.asarray(biases), 64, 4).T
    assert out.shape == (3, N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_quantized_matmul_int6():
    """6-bit variant: the uint8 bitstream rides three uint32 word planes
    (16 elements / 96 bits per column triple, two straddled sub-lattices)
    — must equal the XLA dequant reference at group 64."""
    rng = np.random.default_rng(3)
    N, K = 512, 256
    w = rng.standard_normal((N, K)).astype(np.float32) * 0.05
    packed, scales, biases = quantize_arrays(w, 64, 6)
    assert packed.dtype == np.uint8  # MLX 6-bit bitstream layout
    x = jnp.asarray(rng.standard_normal((4, K)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = quantized_matmul(x, jnp.asarray(packed), jnp.asarray(scales),
                               jnp.asarray(biases), bits=6, group_size=64,
                               block_n=256)
    ref = x @ dequantize_arrays(jnp.asarray(packed), jnp.asarray(scales),
                                jnp.asarray(biases), 64, 6).T
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_quantized_matmul_int6_ragged_n():
    """Ragged N through the 6-bit kernel's masked edge block."""
    rng = np.random.default_rng(4)
    N, K = 600, 128
    w = rng.standard_normal((N, K)).astype(np.float32) * 0.05
    packed, scales, biases = quantize_arrays(w, 64, 6)
    x = jnp.asarray(rng.standard_normal((2, K)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = quantized_matmul(x, jnp.asarray(packed), jnp.asarray(scales),
                               jnp.asarray(biases), bits=6, group_size=64,
                               block_n=512)
    ref = x @ dequantize_arrays(jnp.asarray(packed), jnp.asarray(scales),
                                jnp.asarray(biases), 64, 6).T
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize("bits,M", [(4, 1), (4, 4), (8, 2)])
def test_quantized_mlp_matches_dequant(bits, M):
    """Fused SwiGLU MLP kernel (gate_up → silu·mul → down in ONE dispatch,
    two-phase grid with the hidden vector in VMEM scratch) must equal the
    three-op dequant reference. Covers the round-5 in-kernel-epilogue
    routing (nn.quantized.fused_mlp_call)."""
    from mlx_audio_tpu.nn.quantized import dequantize_arrays, quantize_arrays
    from mlx_audio_tpu.ops.pallas.quant_matmul import quantized_mlp

    rng = np.random.default_rng(11 + bits + M)
    per = 32 // bits
    K, I, N = 128, per * 128, 256  # I = one phase-A block
    wg = rng.standard_normal((I, K)).astype(np.float32) * 0.05
    wu = rng.standard_normal((I, K)).astype(np.float32) * 0.05
    wd = rng.standard_normal((N, I)).astype(np.float32) * 0.05
    pg, sg, bg = quantize_arrays(np.concatenate([wg, wu], 0), 64, bits)
    pd, sd, bd = quantize_arrays(wd, 64, bits)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = quantized_mlp(x, jnp.asarray(pg), jnp.asarray(sg),
                            jnp.asarray(bg), jnp.asarray(pd),
                            jnp.asarray(sd), jnp.asarray(bd),
                            bits=bits, group_size=64)
    W = dequantize_arrays(jnp.asarray(pg), jnp.asarray(sg),
                          jnp.asarray(bg), 64, bits)
    h = jax.nn.silu(x @ W[:I].T) * (x @ W[I:].T)
    ref = h @ dequantize_arrays(jnp.asarray(pd), jnp.asarray(sd),
                                jnp.asarray(bd), 64, bits).T
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_quantized_mlp_multiblock_phases():
    """nA > 1 gate/up blocks and a ragged down N exercise the scratch
    scatter across phase-A steps and the masked edge block in phase B."""
    from mlx_audio_tpu.nn.quantized import dequantize_arrays, quantize_arrays
    from mlx_audio_tpu.ops.pallas.quant_matmul import quantized_mlp

    rng = np.random.default_rng(17)
    K, I, N, M = 128, 2048, 640, 2  # nA=2 (int4), N % 512 != 0
    wg = rng.standard_normal((I, K)).astype(np.float32) * 0.05
    wu = rng.standard_normal((I, K)).astype(np.float32) * 0.05
    wd = rng.standard_normal((N, I)).astype(np.float32) * 0.05
    pg, sg, bg = quantize_arrays(np.concatenate([wg, wu], 0), 64, 4)
    pd, sd, bd = quantize_arrays(wd, 64, 4)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = quantized_mlp(x, jnp.asarray(pg), jnp.asarray(sg),
                            jnp.asarray(bg), jnp.asarray(pd),
                            jnp.asarray(sd), jnp.asarray(bd),
                            bits=4, group_size=64)
    W = dequantize_arrays(jnp.asarray(pg), jnp.asarray(sg),
                          jnp.asarray(bg), 64, 4)
    h = jax.nn.silu(x @ W[:I].T) * (x @ W[I:].T)
    ref = h @ dequantize_arrays(jnp.asarray(pd), jnp.asarray(sd),
                                jnp.asarray(bd), 64, 4).T
    assert out.shape == (M, N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3)


def test_fused_mlp_module_routing(monkeypatch):
    """The lm MLP's single-dispatch path (fused_mlp_call) must match the
    module's multi-call fallback. pallas_enabled is CPU-false, so force it
    and run the kernel under the interpreter."""
    from mlx_audio_tpu import nn as tnn
    from mlx_audio_tpu.lm import LMConfig
    from mlx_audio_tpu.lm.transformer import MLP
    from mlx_audio_tpu.nn.quantized import fuse_quantized_projections

    cfg = LMConfig(hidden_size=128, num_hidden_layers=1,
                   intermediate_size=1024, num_attention_heads=2,
                   num_key_value_heads=2, vocab_size=64)
    mlp = tnn.quantize_module(MLP(cfg), group_size=64, bits=4)
    assert fuse_quantized_projections(mlp) == 1
    x = jnp.asarray(np.random.default_rng(23).standard_normal((1, 128)),
                    jnp.float32)
    ref = mlp(x)  # CPU: pallas_enabled() False → multi-call dequant path

    import mlx_audio_tpu.ops.pallas as pallas_pkg

    monkeypatch.setattr(pallas_pkg, "pallas_enabled", lambda: True)
    with pltpu.force_tpu_interpret_mode():
        out = mlp(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)

    monkeypatch.setenv("MLX_AUDIO_TPU_FUSED_MLP", "0")
    with pltpu.force_tpu_interpret_mode():
        gated = mlp(x)  # env gate: back to the multi-call path exactly
    np.testing.assert_allclose(np.asarray(gated), np.asarray(ref))

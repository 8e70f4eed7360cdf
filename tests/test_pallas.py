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

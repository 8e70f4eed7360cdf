"""One-off: does fusing Whisper encoder q/k/v (+pre-attn LN GEMM grouping)
into one GEMM help at the large-v3-turbo encoder shape (B=6, S=1500,
D=1280, H=20, bf16)? Times one full encoder layer per variant with the
chained-loop harness; adopt only on a measured win."""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from scripts.bench_kernels import timeit_chained
from mlx_audio_tpu.ops.attention import scaled_dot_product_attention

B, S, D, H = 6, 1500, 1280, 20
DT = jnp.bfloat16
rng = np.random.default_rng(0)


def mk(*shape):
    return jnp.asarray(rng.standard_normal(shape) * 0.02, DT)


Wq, Wk, Wv, Wo = mk(D, D), mk(D, D), mk(D, D), mk(D, D)
bq, bv, bo = mk(D), mk(D), mk(D)
W1, b1, W2, b2 = mk(D, 4 * D), mk(4 * D), mk(4 * D, D), mk(D)
g1, be1, g2, be2 = mk(D), mk(D), mk(D), mk(D)
Wqkv = jnp.concatenate([Wq, Wk, Wv], axis=1)
bqkv = jnp.concatenate([bq, jnp.zeros_like(bq), bv])


def ln(x, g, b):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype) * g + b


def split(x):
    return jnp.swapaxes(x.reshape(B, S, H, D // H), 1, 2)


def merge(x):
    return jnp.swapaxes(x, 1, 2).reshape(B, S, D)


def attn_sep(x):
    h = ln(x, g1, be1)
    q, k, v = split(h @ Wq + bq), split(h @ Wk), split(h @ Wv + bv)
    x = x + merge(scaled_dot_product_attention(q, k, v)) @ Wo + bo
    h = ln(x, g2, be2)
    return x + jax.nn.gelu(h @ W1 + b1, approximate=False) @ W2 + b2


def attn_fused(x):
    h = ln(x, g1, be1)
    qkv = h @ Wqkv + bqkv
    q, k, v = (split(qkv[..., i * D:(i + 1) * D]) for i in range(3))
    x = x + merge(scaled_dot_product_attention(q, k, v)) @ Wo + bo
    h = ln(x, g2, be2)
    return x + jax.nn.gelu(h @ W1 + b1, approximate=False) @ W2 + b2


x0 = mk(B, S, D)
for name, fn in [("separate_qkv", attn_sep), ("fused_qkv", attn_fused)]:
    ms = timeit_chained(fn, x0)
    eff_tflops = 4.25e11 / (ms / 1e3) / 1e12
    print({"variant": name, "ms_per_layer": round(ms, 3),
           "eff_tflops": round(eff_tflops, 1)}, flush=True)

a, b = attn_sep(x0), attn_fused(x0)
print("max_diff", float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))))

#!/usr/bin/env python
"""A/B the fused SwiGLU quant-MLP kernel (one Pallas dispatch) against the
two-dispatch path (fused gate_up GEMV → XLA silu·mul → down GEMV) and bf16,
at the real Qwen3-TTS layer shapes, on the real chip.

This measures the round-5 in-kernel-epilogue step named in KERNEL_BENCH's
int4@1B isolation: each custom-call boundary inside the fused decode loop
costs ~6 µs (dispatch + broken elementwise fusion), and the MLP carries two
of them. Run on the real TPU (default interpreter)."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bench_kernels import timeit_chained  # noqa: E402  (scripts/ sibling)
from mlx_audio_tpu.nn.quantized import dequantize_arrays, quantize_arrays
from mlx_audio_tpu.ops.pallas.quant_matmul import quantized_matmul, quantized_mlp

# (label, K=hidden, I=intermediate, M): talker (config.py:27-28), codec
# decoder (config.py:85-86 / 112-113); M=1 single-stream decode, M=8 the
# serving batcher's slot batch.
SHAPES = [
    ("talker_mlp", 1024, 3072, 1),
    ("talker_mlp_b8", 1024, 3072, 8),
    ("codec_mlp", 512, 2048, 1),
]


def main():
    rng = np.random.default_rng(3)
    rows = []
    for label, K, I, M in SHAPES:
        wg = rng.standard_normal((I, K)).astype(np.float32) * 0.05
        wu = rng.standard_normal((I, K)).astype(np.float32) * 0.05
        wd = rng.standard_normal((K, I)).astype(np.float32) * 0.05
        pg, sg, bg = quantize_arrays(np.concatenate([wg, wu], 0), 64, 4)
        pd, sd, bd = quantize_arrays(wd, 64, 4)
        pg, sg, bg, pd, sd, bd = map(jnp.asarray, (pg, sg, bg, pd, sd, bd))
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)

        def fused_step(x, pg, sg, bg, pd, sd, bd):
            o = quantized_mlp(x, pg, sg, bg, pd, sd, bd,
                              bits=4, group_size=64)
            return o * jnp.bfloat16(1e-3)

        def twocall_step(x, pg, sg, bg, pd, sd, bd):
            gu = quantized_matmul(x, pg, sg, bg, bits=4, group_size=64)
            g, u = gu[:, :I], gu[:, I:]
            h = jax.nn.silu(g) * u
            o = quantized_matmul(h, pd, sd, bd, bits=4, group_size=64)
            return o * jnp.bfloat16(1e-3)

        wgu_f = jnp.asarray(np.concatenate([wg, wu], 0), jnp.bfloat16)
        wd_f = jnp.asarray(wd, jnp.bfloat16)

        def bf16_step(x, wgu_f, wd_f):
            gu = x @ wgu_f.T
            h = jax.nn.silu(gu[:, :I]) * gu[:, I:]
            return (h @ wd_f.T) * jnp.bfloat16(1e-3)

        # correctness on chip first
        out_f = quantized_mlp(x, pg, sg, bg, pd, sd, bd, bits=4,
                              group_size=64)
        W = dequantize_arrays(pg, sg, bg, 64, 4)
        h = jax.nn.silu(x.astype(jnp.float32) @ W[:I].T) * (
            x.astype(jnp.float32) @ W[I:].T)
        ref = h @ dequantize_arrays(pd, sd, bd, 64, 4).T
        err = float(jnp.max(jnp.abs(out_f.astype(jnp.float32) - ref)))
        scale = float(jnp.max(jnp.abs(ref)))
        assert err < 0.02 * max(scale, 1.0), (label, err, scale)

        f_ms = timeit_chained(fused_step, x, pg, sg, bg, pd, sd, bd)
        t_ms = timeit_chained(twocall_step, x, pg, sg, bg, pd, sd, bd)
        b_ms = timeit_chained(bf16_step, x, wgu_f, wd_f)
        rows.append(dict(label=label, K=K, I=I, M=M,
                         fused_us=round(f_ms * 1e3, 2),
                         twocall_us=round(t_ms * 1e3, 2),
                         bf16_us=round(b_ms * 1e3, 2),
                         fused_vs_twocall=round(t_ms / f_ms, 2),
                         fused_vs_bf16=round(b_ms / f_ms, 2),
                         max_err=err))
        print(json.dumps(rows[-1]), flush=True)
    Path("bench_fused_mlp.json").write_text(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()

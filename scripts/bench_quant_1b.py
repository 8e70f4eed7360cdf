#!/usr/bin/env python
"""Diagnose the int4@1B regression (round-4 verdict, weak #1).

BENCH_r04 showed qwen3_tts_ar_rtf_int4 = 0.0913 vs bf16 = 0.0762 after
round 4 relaxed the quant-matmul kernel's ragged-N routing to N >= 512 —
which newly routes every layer of the 1B-class talker (hidden 1024) into
Pallas at M=1. This microbench times the ACTUAL talker/code-predictor/
codec layer shapes through both paths on the real chip, so the routing
guard can gain a measured floor instead of a guess.

Run on the real TPU (default interpreter)."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bench_kernels import timeit_chained  # noqa: E402  (scripts/ sibling)
from mlx_audio_tpu.nn.quantized import quantize_arrays, unpack_rows
from mlx_audio_tpu.ops.pallas.quant_matmul import quantized_matmul

# (label, N, K): every distinct Linear shape in the Qwen3-TTS 1B pipeline
# (talker 28x1024: config.py:42-56; code predictor 5x1024: :26-37; codec
# decoder 8x512: :85-121) that the N>=512 routing sends to Pallas at M=1.
SHAPES = [
    ("talker.kv_proj", 1024, 1024),
    ("talker.o_proj", 1024, 2048),
    ("talker.gate_up", 3072, 1024),
    ("talker.down", 1024, 3072),
    ("codec.attn", 512, 512),
    ("codec.mlp_out", 512, 2048),
]


def main():
    rng = np.random.default_rng(1)
    rows = []
    for M in (1,):
        for label, N, K in SHAPES:
            w = rng.standard_normal((N, K)).astype(np.float32)
            wq, scales, biases = quantize_arrays(
                jnp.asarray(w), group_size=64, bits=4)
            wq, scales, biases = map(jnp.asarray, (wq, scales, biases))
            x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)

            def _chain(o):
                # back to x's (M, K) shape so steps chain under fori_loop
                if o.shape[1] < K:
                    reps = -(-K // o.shape[1])
                    o = jnp.tile(o, (1, reps))
                return o[:, :K] * 1e-3

            def pal_step(x, wq, s, b):
                o = quantized_matmul(x, wq, s, b, bits=4, group_size=64)
                return _chain(o)

            def dequant(wq, s, b):
                q = unpack_rows(wq, 4)
                g = q.shape[1] // 64
                return ((q.astype(jnp.bfloat16).reshape(q.shape[0], g, 64)
                         * s[:, :, None].astype(jnp.bfloat16)
                         + b[:, :, None].astype(jnp.bfloat16))
                        .reshape(q.shape[0], -1))

            def xla_step(x, wq, s, b):
                o = (x.astype(jnp.bfloat16) @ dequant(wq, s, b).T
                     ).astype(jnp.float32)
                return _chain(o)

            def bf16_step(x, wf):
                o = (x.astype(jnp.bfloat16) @ wf.T).astype(jnp.float32)
                return _chain(o)

            wf = jnp.asarray(w, jnp.bfloat16)
            p_ms = timeit_chained(pal_step, x, wq, scales, biases)
            x_ms = timeit_chained(xla_step, x, wq, scales, biases)
            b_ms = timeit_chained(bf16_step, x, wf)
            row = {
                "shape": f"M{M}_N{N}_K{K}", "layer": label,
                "pallas_us": round(p_ms * 1e3, 3),
                "xla_dequant_us": round(x_ms * 1e3, 3),
                "bf16_us": round(b_ms * 1e3, 3),
                "pallas_vs_xla": round(x_ms / p_ms, 3),
                "pallas_vs_bf16": round(b_ms / p_ms, 3),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
    out = Path(__file__).parent.parent / "bench_quant_1b.json"
    out.write_text(json.dumps(
        {"device": str(jax.devices()[0]), "rows": rows}, indent=1))


if __name__ == "__main__":
    main()

"""Per-kernel on-chip benchmark: each Pallas kernel vs its XLA baseline.

Produces one JSON line per (kernel, config) pair so routing thresholds in
`ops/` can cite measured numbers (results recorded in KERNEL_BENCH.md).

Timing method: iterations are chained inside ONE jitted `lax.fori_loop`
with a data dependency (output feeds the next input) and a scalar-sum fetch
(block_until_ready alone does NOT wait for execution on the axon backend);
two iteration counts are run and the difference cancels the fixed ~40 ms
tunnel round-trip, leaving pure device time per iteration.

Run on the real TPU (default interpreter). One process at a time.
"""

import functools
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.nn.quantized import quantize_arrays, unpack_rows
from mlx_audio_tpu.ops.pallas.flash_attention import flash_attention
from mlx_audio_tpu.ops.pallas.quant_matmul import quantized_matmul
from mlx_audio_tpu.ops.pallas.relu2_attention import (
    relu2_attention,
    relu2_attention_reference,
)

def timeit_chained(step, x0, *consts):
    """Pure device ms/iter for `step(x, *consts) -> x` (two-point method).

    A coarse two-point pass calibrates the per-iteration cost, then the
    final pass sizes the iteration delta to ~250 ms of pure device work so
    the ~40 ms tunnel round-trip jitter stays well under 20% of the signal.
    """

    def run(n):
        @jax.jit
        def loop(x, *consts):
            def body(_, x):
                return step(x, *consts)

            return jax.lax.fori_loop(0, n, body, x).sum()

        float(loop(x0, *consts))  # compile + warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            float(loop(x0, *consts))  # scalar fetch forces execution
            best = min(best, time.perf_counter() - t0)
        return best

    # Gross estimate first so slow kernels never get a long chain: a >60 s
    # chained program crashed the TPU worker (S=8192 XLA attention).
    gross = run(4) / 4
    lo_c, hi_c = (4, 24) if gross > 0.1 else (30, 230)
    per_est = max((run(hi_c) - run(lo_c)) / (hi_c - lo_c), 1e-7)
    # target ~0.25 s of pure work, but cap any single run at ~15 s
    n_delta = min(max(int(0.25 / per_est), 100), 50_000)
    lo = min(50, max(4, int(1.0 / per_est)))
    n_delta = max(min(n_delta, int(15.0 / per_est) - lo), 8)
    return (run(lo + n_delta) - run(lo)) / n_delta * 1e3  # ms


def emit(kernel, config, pallas_ms, xla_ms, max_err):
    print(json.dumps({
        "kernel": kernel, "config": config,
        "pallas_ms": round(pallas_ms, 4), "xla_ms": round(xla_ms, 4),
        "speedup": round(xla_ms / pallas_ms, 3),
        "max_err": float(max_err),
    }), flush=True)


def xla_sdpa(q, k, v):
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhtd,bhsd->bhts", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhts,bhsd->bhtd", p, v)


def bench_flash():
    rng = np.random.default_rng(0)
    for S in (1536, 4096, 8192):
        B, H, D = 1, 16, 64
        q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.bfloat16)

        def pal_step(q, k, v):
            return flash_attention(q, k, v).astype(q.dtype)

        def xla_step(q, k, v):
            return xla_sdpa(q, k, v).astype(q.dtype)

        p_ms = timeit_chained(pal_step, q, k, v)
        x_ms = timeit_chained(xla_step, q, k, v)
        err = jnp.abs(
            flash_attention(q, k, v).astype(jnp.float32)
            - xla_sdpa(q, k, v).astype(jnp.float32)).max()
        emit("flash_attention", f"B{B}H{H}S{S}D{D}_bf16", p_ms, x_ms, err)


def bench_quant_matmul():
    rng = np.random.default_rng(1)
    for bits in (4, 8):
        for M, K, N in ((1, 2048, 2048), (128, 2048, 2048),
                        (128, 4096, 4096)):
            w = rng.standard_normal((N, K)).astype(np.float32)
            wq, scales, biases = quantize_arrays(
                jnp.asarray(w), group_size=64, bits=bits)
            wq = jnp.asarray(wq)
            scales = jnp.asarray(scales)
            biases = jnp.asarray(biases)
            x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)

            def pal_step(x, wq, s, b):
                o = quantized_matmul(x, wq, s, b, bits=bits, group_size=64)
                return o[:, :K] * 1e-3  # chainable, keep magnitudes sane

            def dequant(wq, s, b):
                q = unpack_rows(wq, bits)
                g = q.shape[1] // 64
                return ((q.astype(jnp.bfloat16)
                         .reshape(q.shape[0], g, 64)
                         * s[:, :, None].astype(jnp.bfloat16)
                         + b[:, :, None].astype(jnp.bfloat16))
                        .reshape(q.shape[0], -1))

            def xla_step(x, wq, s, b):
                o = (x.astype(jnp.bfloat16) @ dequant(wq, s, b).T
                     ).astype(jnp.float32)
                return o[:, :K] * 1e-3

            p_ms = timeit_chained(pal_step, x, wq, scales, biases)
            x_ms = timeit_chained(xla_step, x, wq, scales, biases)
            ref = np.asarray(
                jax.jit(xla_step)(x, wq, scales, biases), np.float32)
            got = np.asarray(
                jax.jit(pal_step)(x, wq, scales, biases), np.float32)
            err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-9)
            emit("quant_matmul", f"b{bits}_M{M}K{K}N{N}", p_ms, x_ms, err)


def bench_relu2():
    rng = np.random.default_rng(2)
    # MossFormer2-SE shapes: groups of N frames, D == E so chaining works.
    # N > 2048 exceeds VMEM for the (N, N) score tile — kernel guards route
    # to the lax reference there, so only bench the in-VMEM range.
    for T in (256, 1024, 2048):
        B, G, D = 1, 8, 64
        q = jnp.asarray(rng.standard_normal((B, G, T, D)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, G, T, D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, G, T, D)), jnp.float32)

        def pal_step(q, k, v):
            return relu2_attention(q, k, v) * 1e-2

        def xla_step(q, k, v):
            return relu2_attention_reference(q, k, v) * 1e-2

        p_ms = timeit_chained(pal_step, q, k, v)
        x_ms = timeit_chained(xla_step, q, k, v)
        err = jnp.abs(relu2_attention(q, k, v)
                      - relu2_attention_reference(q, k, v)).max()
        emit("relu2_attention", f"B{B}G{G}T{T}D{D}_f32", p_ms, x_ms, err)


HBM_GBS = 819.0  # v5e HBM bandwidth (spec)


def bench_depthwise_roofline():
    """SURVEY 2.3 flagged depthwise conv1d as 'XLA, unmeasured'. Measure the
    achieved HBM bandwidth of the XLA lowering at MossFormer2 shapes: if it
    runs near the bandwidth roof a Pallas kernel cannot win materially."""
    rng = np.random.default_rng(3)
    for T, C, K in ((4096, 512, 17), (16384, 256, 17)):
        x = jnp.asarray(rng.standard_normal((1, T, C)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((C, K, 1)), jnp.float32)
        pad = (K - 1) // 2

        def step(x, w):
            y = jax.lax.conv_general_dilated(
                x, w, window_strides=(1,), padding=[(pad, pad)],
                dimension_numbers=("NLC", "OLI", "NLC"),
                feature_group_count=C)
            return x + y * 1e-3

        ms = timeit_chained(step, x, w)
        gbs = 3 * T * C * 4 / (ms * 1e-3) / 1e9  # read x, write y, add x
        print(json.dumps({
            "kernel": "depthwise_conv1d_xla", "config": f"T{T}C{C}K{K}_f32",
            "xla_ms": round(ms, 4), "achieved_GBs": round(gbs, 1),
            "pct_hbm_roof": round(100 * gbs / HBM_GBS, 1),
        }), flush=True)


def bench_lstm_roofline():
    """Fused-gate lax.scan LSTM (nn/recurrent.py): report per-step latency
    and effective matmul throughput. The step is latency-bound (sequential
    dependence); speed-of-light is the (N,H)x(H,4H) recurrent matmul."""
    from mlx_audio_tpu.nn.recurrent import lstm_scan

    rng = np.random.default_rng(4)
    for N, T, H in ((1, 1500, 512), (8, 1500, 512)):
        xp = jnp.asarray(rng.standard_normal((N, T, 4 * H)) * 0.1,
                         jnp.float32)
        wh = jnp.asarray(rng.standard_normal((4 * H, H)) * 0.05, jnp.float32)
        h0 = jnp.zeros((N, H), jnp.float32)

        def step(xp, wh, h0):
            hs, _ = lstm_scan(xp, wh, h0, h0)
            return xp + hs.mean() * 1e-3  # chain on xp, keep shape

        ms = timeit_chained(step, xp, wh, h0)
        per_step_us = ms * 1e3 / T
        flops = 2 * N * 4 * H * H  # recurrent matmul per step
        print(json.dumps({
            "kernel": "lstm_scan_xla", "config": f"N{N}T{T}H{H}_f32",
            "xla_ms": round(ms, 4), "us_per_step": round(per_step_us, 3),
            "eff_tflops": round(flops / (per_step_us * 1e-6) / 1e12, 3),
        }), flush=True)


def bench_rvq_roofline():
    """RVQ nearest-codebook search (encodec.py:254, mimi.py:534): XLA does
    it as one (N,D)x(D,K) matmul + argmin. Report effective TFLOP/s of the
    distance matmul — near the MXU roof means a fused Pallas kernel has no
    room (SURVEY 2.3's last unmeasured op)."""
    rng = np.random.default_rng(5)
    for N, D, K in ((1500, 128, 1024), (12000, 8, 4096)):
        x = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
        cb = jnp.asarray(rng.standard_normal((K, D)), jnp.float32)

        def step(x, cb):
            c2 = (cb * cb).sum(-1)
            dot = x @ cb.T
            idx = jnp.argmin(c2[None, :] - 2 * dot, axis=-1)
            # chain: fold the chosen codes back into x to serialize iters
            return x + cb[idx] * 1e-6

        ms = timeit_chained(step, x, cb)
        flops = 2 * N * K * D
        print(json.dumps({
            "kernel": "rvq_codebook_search_xla", "config": f"N{N}D{D}K{K}",
            "xla_ms": round(ms, 4),
            "eff_tflops": round(flops / (ms * 1e-3) / 1e12, 2),
        }), flush=True)


if __name__ == "__main__":
    print(json.dumps({"devices": [str(d) for d in jax.devices()],
                      "method": "adaptive two-point chained fori_loop"}),
          flush=True)
    bench_flash()
    bench_quant_matmul()
    bench_relu2()
    bench_depthwise_roofline()
    bench_lstm_roofline()
    bench_rvq_roofline()

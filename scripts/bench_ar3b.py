#!/usr/bin/env python
"""AR decode step-rate analysis at 3B scale (VERDICT r3 item 3).

Three measurements on an Orpheus-class 3B backbone (llama-3.2-3B dims +
audio vocab), single stream, greedy:

1. `weight_stream_floor`: a jitted fori_loop that ONLY streams every
   decode-relevant weight matrix through one (1,d)xW matmul per layer +
   lm_head per step — the pure HBM-bandwidth floor for one decode step.
2. `decode_step`: the real production decode (`lm.generate_tokens`, KV
   cache, RoPE, sampling in-graph) timed over the same number of steps.
3. both repeated at int4 (`nn.quantize_module`): weights shrink 4x, so a
   bandwidth-bound decode should approach a 4x step-rate win.

The gap between (1) and (2) is the non-weight-bandwidth overhead
(attention/cache work, layernorms, dispatch); the bf16→int4 delta shows
whether the decode is actually bandwidth-bound at this scale.

Timing uses the fori_loop chaining pattern (see scripts/bench_kernels.py):
on the tunneled backend, block_until_ready() does not wait for execution,
so each measurement runs N chained steps inside ONE jitted program and is
timed end-to-end with a scalar fetch; two different N cancel the ~40 ms
round trip.
"""

import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.lm import CausalLM, LMConfig
from mlx_audio_tpu.lm.generate import generate_tokens
from mlx_audio_tpu.nn.module import build_on_host
from mlx_audio_tpu.nn.quantized import QuantizedLinear, quantize_module

CFG = LMConfig(
    model_type="llama", hidden_size=3072, num_hidden_layers=28,
    intermediate_size=8192, num_attention_heads=24,
    num_key_value_heads=8, vocab_size=156940, rope_theta=500000.0,
)


def _decode_weights(lm):
    """Every weight matrix the decode step streams, as (out,in) arrays."""
    mats = []
    for layer in lm.model.layers:
        a = layer.self_attn
        mats += [a.q_proj.weight, a.k_proj.weight, a.v_proj.weight,
                 a.o_proj.weight]
        m = layer.mlp
        mats += [m.gate_proj.weight, m.up_proj.weight, m.down_proj.weight]
    mats.append(lm.lm_head.weight if hasattr(lm, "lm_head")
                else lm.model.embed_tokens.weight)
    return mats


def timed_loop(make_step, n_lo=8, n_hi=40):
    """Wall time per step via two chained fori_loop lengths (tunnel-safe)."""
    def run(n):
        f = make_step(n)
        f().block_until_ready()  # compile
        t0 = time.perf_counter()
        r = f()
        np.asarray(jax.device_get(r))  # scalar fetch forces completion
        return time.perf_counter() - t0

    lo = min(run(n_lo) for _ in range(3))
    hi = min(run(n_hi) for _ in range(3))
    return (hi - lo) / (n_hi - n_lo)


def _quant_layers(lm):
    layers = []
    for layer in lm.model.layers:
        a, m = layer.self_attn, layer.mlp
        layers += [a.q_proj, a.k_proj, a.v_proj, a.o_proj,
                   m.gate_proj, m.up_proj, m.down_proj]
    if hasattr(lm, "lm_head"):
        layers.append(lm.lm_head)
    return layers


# The model rides as a jit ARGUMENT (never a closure: 6.6 GB of weights
# captured as constants would be embedded into the program).
@partial(jax.jit, static_argnames=("n", "quant"))
def _floor_loop(lm, n: int, quant: bool):
    def body(i, acc):
        s = acc
        if quant:
            for q in _quant_layers(lm):
                in_dim = q.scales.shape[1] * q.group_size
                x = jnp.full((1, in_dim), 1e-3, jnp.bfloat16)
                x = x * (1.0 + acc * 1e-9)  # data dep chains steps
                s = s + q(x)[0, 0].astype(jnp.float32)
        else:
            for w in _decode_weights(lm):
                x = jnp.full((1, w.shape[1]), 1e-3, w.dtype)
                x = x * (1.0 + acc * 1e-9)
                s = s + jnp.matmul(x, w.T)[0, 0].astype(jnp.float32)
        return s

    return jax.lax.fori_loop(0, n, body, jnp.float32(0))


def bench_weight_floor(lm, label):
    is_quant = isinstance(lm.model.layers[0].self_attn.q_proj,
                          QuantizedLinear)
    if is_quant:
        nbytes = sum(q.weight.nbytes + q.scales.nbytes + q.biases.nbytes
                     for q in _quant_layers(lm))
    else:
        nbytes = sum(w.nbytes for w in _decode_weights(lm))

    def make_step(n):
        return lambda: _floor_loop(lm, n, is_quant)

    per_step = timed_loop(make_step)
    gbs = nbytes / per_step / 1e9
    print(json.dumps({
        "metric": f"ar3b_weight_stream_floor_{label}",
        "value": round(per_step * 1e3, 3), "unit": "ms/step",
        "detail": {"weight_bytes": nbytes,
                   "effective_GBps": round(gbs, 1),
                   "device": str(jax.devices()[0])}}), flush=True)
    return per_step


def bench_decode(lm, label, steps=96):
    prompt = np.random.default_rng(0).integers(1, 150000, 64).astype(np.int32)

    def run(n):
        t0 = time.perf_counter()
        generate_tokens(lm, prompt, max_tokens=n, temp=0.0)
        return time.perf_counter() - t0

    run(8)      # compile both chunk shapes
    run(steps)
    lo = min(run(8) for _ in range(3))
    hi = min(run(steps) for _ in range(3))
    per_step = (hi - lo) / (steps - 8)
    print(json.dumps({
        "metric": f"ar3b_decode_step_{label}",
        "value": round(per_step * 1e3, 3), "unit": "ms/step",
        "detail": {"tokens_per_sec": round(1.0 / per_step, 1),
                   "device": str(jax.devices()[0])}}), flush=True)
    return per_step


def main():
    print(json.dumps({"info": "building 3B bf16 on host"}), flush=True)
    lm = build_on_host(lambda: CausalLM(CFG))
    floor_bf16 = bench_weight_floor(lm, "bf16")
    step_bf16 = bench_decode(lm, "bf16")

    print(json.dumps({"info": "quantizing to int4"}), flush=True)
    qlm = quantize_module(lm, bits=4, group_size=64)
    del lm
    floor_i4 = bench_weight_floor(qlm, "int4")
    step_i4 = bench_decode(qlm, "int4")

    print(json.dumps({
        "metric": "ar3b_summary",
        "value": round(step_bf16 / step_i4, 2),
        "unit": "int4_speedup_x",
        "detail": {
            "floor_ms": {"bf16": round(floor_bf16 * 1e3, 3),
                         "int4": round(floor_i4 * 1e3, 3)},
            "decode_ms": {"bf16": round(step_bf16 * 1e3, 3),
                          "int4": round(step_i4 * 1e3, 3)},
            "overhead_vs_floor": {
                "bf16": round(step_bf16 / floor_bf16, 2),
                "int4": round(step_i4 / floor_i4, 2)},
        }}), flush=True)


if __name__ == "__main__":
    main()

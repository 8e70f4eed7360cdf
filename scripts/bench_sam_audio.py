"""SAM-Audio separation throughput vs the reference's published table.

The reference's ONLY published benchmark numbers are SAM-Audio's
(sts/models/sam_audio/README.md:240-244, Apple M-series fp16):
  separate      12 s  midpoint/16 -> 18 s   (0.7x RT)
  separate_long 12 s  euler/16    -> 12 s   (1.0x RT)
  separate_long 2 min euler/16    -> ~100 s (1.2x RT)

This benchmark runs the same workloads at the full `sam_audio_large`
architecture (dim 2816, 22 layers) with random bf16 weights on one v5e
chip. Flow-matching throughput depends on the program, not the weight
values. Text encoding is bypassed with fixed random T5 features (the
tokenizer needs network); it is a negligible, one-off cost in the
reference's numbers too.

One JSON line per workload: {"metric", "audio_seconds", "wall_seconds",
"rt_factor" (>1 = faster than real time), "vs_reference_wall"}.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from mlx_audio_tpu.nn.module import build_on_host
    from mlx_audio_tpu.sts.models.sam_audio import SAMAudio, SAMAudioConfig

    # host-side init + one bf16 transfer: never materializes the 12.6 GB
    # f32 tree on the chip (the on-device init peaked f32+bf16 ~19 GB)
    model = build_on_host(lambda: SAMAudio(SAMAudioConfig()))
    n_params = sum(
        int(np.prod(v.shape)) for v in jax.tree_util.tree_leaves(model)
        if hasattr(v, "shape"))
    sr = model.sample_rate
    rng = np.random.default_rng(0)
    dim = model.config.text_encoder.dim
    text_feats = jnp.asarray(rng.standard_normal((1, 16, dim)) * 0.1,
                             jnp.bfloat16)
    text_mask = jnp.ones((1, 16), bool)

    def run(seconds, fn_name, ode_opt, ref_wall):
        audio = (rng.standard_normal(int(sr * seconds)) * 0.1).astype(
            np.float32)[None]
        # chunked codec decode bounds decoder activation memory: the
        # full-length 48 kHz decode program peaks past v5e HBM with the
        # 2.8B-param DiT resident (measured RESOURCE_EXHAUSTED without it)
        kwargs = dict(ode_opt=ode_opt, _text_features=text_feats,
                      _text_mask=text_mask, ode_decode_chunk_size=128)
        fn = getattr(model, fn_name)

        t0 = time.perf_counter()
        fn(audio, ["speech"], **kwargs)
        compile_wall = time.perf_counter() - t0
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            out = fn(audio, ["speech"], **kwargs)
            walls.append(time.perf_counter() - t0)
        wall = min(walls)
        assert np.isfinite(out.target[0]).all()
        print(json.dumps({
            "metric": f"sam_audio_large_{fn_name}_"
                      f"{ode_opt['method']}{round(1/ode_opt['step_size'])}",
            "audio_seconds": seconds,
            "wall_seconds": round(wall, 2),
            "rt_factor": round(seconds / wall, 2),
            "vs_reference_wall": round(ref_wall / wall, 1),
            "detail": {"params": n_params, "compile_seconds":
                       round(compile_wall, 1),
                       "reference_wall_seconds": ref_wall,
                       "reference_hw": "Apple M-series fp16 "
                       "(sam_audio/README.md:240-244)",
                       "device": str(jax.devices()[0])},
        }), flush=True)

    # reference rows: 12 s midpoint/16 = 18 s; 2 min euler/16 = ~100 s
    run(12.0, "separate", {"method": "midpoint", "step_size": 2 / 32},
        ref_wall=18.0)
    run(120.0, "separate_long", {"method": "euler", "step_size": 1 / 16},
        ref_wall=100.0)


if __name__ == "__main__":
    main()

"""One-off: flash_attention block-size sweep + padding-mask cost at the
Whisper encoder shape (B*H=120, T=S=1500, D=64, bf16). S=1536 rows show
what disabling the in-kernel kv_valid mask is worth (1536 = no padding →
mask branch compiled out)."""

import sys

sys.path.insert(0, ".")

import jax.numpy as jnp
import numpy as np

from scripts.bench_kernels import timeit_chained
from mlx_audio_tpu.ops.pallas.flash_attention import flash_attention

rng = np.random.default_rng(0)
B, H, D = 6, 20, 64


def run(S, bq, bk):
    q = jnp.asarray(rng.standard_normal((B, H, S, D)) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)) * 0.1, jnp.bfloat16)

    def step(q, k, v):
        o = flash_attention(q, k, v, block_q=bq, block_k=bk)
        return o  # feeds next iteration as q (same shape)

    ms = timeit_chained(step, q, k, v)
    print({"S": S, "block_q": bq, "block_k": bk, "ms": round(ms, 3)},
          flush=True)


for bq, bk in [(256, 256), (512, 256), (256, 512), (512, 512), (768, 768),
               (512, 1536), (256, 1536)]:
    run(1500, bq, bk)
run(1536, 256, 256)   # no-mask reference (no padding)
run(1536, 512, 512)

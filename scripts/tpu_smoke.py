#!/usr/bin/env python
"""TPU smoke test: tiny forwards of representative model families on the
real chip — catches TPU-only failure modes the CPU suite cannot
(complex64 device->host transfers, unsupported ops, compile blowups).

Verified passing on TPU v5e (axon): kokoro (bench.py), whisper
(scripts/bench_whisper.py), qwen3_tts generate, sam_audio separate,
mimi encode/decode, dsp stft/istft single-jit roundtrip.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))

import jax
import jax.numpy as jnp
import numpy as np


def ok(name, fn):
    t0 = time.time()
    try:
        fn()
        print(f"OK   {name} ({time.time()-t0:.0f}s)", flush=True)
        return True
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}", flush=True)
        return False


def mimi():
    import test_mimi as tm

    m = tm.mimi.__wrapped__()
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 1, m.frame_size * 10)),
        jnp.float32,
    ) * 0.1
    codes = m.encode(x)
    np.asarray(m.decode(codes))


def qwen3_tts():
    import test_qwen3_tts as tq

    model = tq.tiny.__wrapped__()
    tq.test_generate_end_to_end(model)


def sam_audio():
    import test_sam_audio as ts

    ts.test_separate_end_to_end()


def dsp_roundtrip():
    from mlx_audio_tpu import dsp

    x = jnp.asarray(
        np.random.default_rng(1).standard_normal(16000), jnp.float32
    ) * 0.1

    @jax.jit
    def rt(a):
        S = dsp.stft(a, 400, hop_length=160)
        return dsp.istft(
            jnp.swapaxes(S, -1, -2), hop_length=160, length=a.shape[-1]
        )

    y = np.asarray(rt(x))
    assert np.isfinite(y).all()


def main():
    results = [
        ok("dsp stft/istft roundtrip", dsp_roundtrip),
        ok("mimi encode/decode", mimi),
        ok("sam_audio separate", sam_audio),
        ok("qwen3_tts generate", qwen3_tts),
    ]
    sys.exit(0 if all(results) else 1)


if __name__ == "__main__":
    main()

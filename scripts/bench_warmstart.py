#!/usr/bin/env python
"""Cold vs warm start per family (VERDICT r3 item 7).

Runs ONE family's load+first-audio in THIS process with the persistent
XLA compile cache at --cache, then prints a JSON timing line. Run twice
with the same --cache dir: the first run is COLD (populates the cache),
the second WARM (compiles come from disk). A driver loop:

    for fam in kokoro qwen3_tts whisper; do
      rm -rf /tmp/xcache; \
      python scripts/bench_warmstart.py --family $fam --cache /tmp/xcache
      python scripts/bench_warmstart.py --family $fam --cache /tmp/xcache
    done

Models are architecture-true random-weight builds (throughput/compile time
depend on the program, not the values). Known caveat recorded in
docs/tpu.md: the cache has wedged the axon remote-compile tunnel before —
validate on CPU or a directly-attached chip first.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def run_kokoro():
    import numpy as np

    import bench as b
    from mlx_audio_tpu.nn.module import cast_floats
    from mlx_audio_tpu.tts.models.kokoro import Model, ModelConfig

    vocab_chars = (
        "abcdefghijklmnopqrstuvwxyzæɑɔɛɪʊʌəɹŋθðʃʒʧʤˈˌAIOWY ɡɜɾ.,!?;:\"'()…—"
    )
    vocab = {c: i + 1 for i, c in enumerate(dict.fromkeys(vocab_chars))}
    model = cast_floats(Model(ModelConfig.from_dict(
        {**b.KOKORO_82M_CONFIG, "vocab": vocab})))
    ref_s = np.random.default_rng(0).standard_normal((1, 256)
                                                     ).astype(np.float32)
    audio = model(b.PHONEMES[:508], ref_s)
    return int(np.asarray(audio).size)


def run_qwen3_tts():
    import bench as b

    from mlx_audio_tpu.nn.module import build_on_host
    from mlx_audio_tpu.tts.models.qwen3_tts import Model, ModelConfig

    model = build_on_host(lambda: Model(ModelConfig.from_dict({})))
    model.set_runtime(tokenizer=b._AsciiTok())
    results = list(model.generate(
        "Warm start measurement sentence.", temperature=0.9, top_k=50,
        max_tokens=32, min_tokens=32, seed=0))
    return sum(r.samples for r in results)


def run_whisper():
    import numpy as np

    import bench as b

    model, tok = b.build_whisper_turbo()
    audio = (np.random.default_rng(0).standard_normal(16000 * 30) * 0.05
             ).astype(np.float32)
    out = model.generate(audio, language="en", temperature=0.0,
                         tokenizer=tok, condition_on_previous_text=False,
                         without_timestamps=True, sample_len=96)
    return len(out.text)


FAMILIES = {
    "kokoro": run_kokoro,
    "qwen3_tts": run_qwen3_tts,
    "whisper": run_whisper,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", required=True, choices=sorted(FAMILIES))
    ap.add_argument("--cache", required=True)
    args = ap.parse_args()

    t_start = time.perf_counter()
    import jax

    cache = Path(args.cache)
    pre_existing = cache.exists() and any(cache.iterdir())
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

    t0 = time.perf_counter()
    FAMILIES[args.family]()
    wall = time.perf_counter() - t0
    print(json.dumps({
        "metric": f"warmstart_{args.family}",
        "value": round(wall, 1),
        "unit": "s_to_first_audio",
        "detail": {
            "phase": "warm" if pre_existing else "cold",
            "total_incl_imports_s": round(time.perf_counter() - t_start, 1),
            "cache_entries": len(list(cache.iterdir())) if cache.exists()
            else 0,
            "device": str(jax.devices()[0]),
        },
    }), flush=True)


if __name__ == "__main__":
    main()

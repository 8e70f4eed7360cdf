#!/usr/bin/env python
"""Whisper-large-v3-turbo throughput benchmark (BASELINE: >40x real time on
one TPU v5e chip).

Random weights at the real architecture dims — throughput depends on the
program, not the weight values. Synthesizes `--seconds` of audio, runs the
full generate() path (mel → encoder → windowed while_loop decode → segments)
and reports xRT. With random weights the decoder rarely emits EOT early, so
every window decodes to the sample cap — this UNDERSTATES real-checkpoint
throughput (real decodes stop at EOT); the number is a lower bound.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=120.0)
    ap.add_argument("--sample-len", type=int, default=224,
                    help="decoder steps per 30s window (cap)")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--dtype", choices=["f32", "bf16"], default="bf16")
    ap.add_argument("--mode", choices=["seek", "chunked"], default="chunked")
    args = ap.parse_args()

    from mlx_audio_tpu.stt.models.whisper import Model, ModelDimensions
    from mlx_audio_tpu.stt.models.whisper.tokenizer import DummyTokenizer

    # large-v3-turbo dims (config.json of openai/whisper-large-v3-turbo)
    dims = ModelDimensions(
        n_mels=128, n_audio_ctx=1500, n_audio_state=1280, n_audio_head=20,
        n_audio_layer=32, n_vocab=51866, n_text_ctx=448, n_text_state=1280,
        n_text_head=20, n_text_layer=4,
    )
    from mlx_audio_tpu.nn.module import cast_floats

    model = Model(dims)
    if args.dtype == "bf16":
        model = cast_floats(model)
    tok = DummyTokenizer(n_vocab=51866)

    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(int(16000 * args.seconds)) * 0.05).astype(
        np.float32
    )

    def run_once():
        if args.mode == "chunked":
            return model.generate_chunked(
                audio, language="en", temperature=0.0, tokenizer=tok,
                without_timestamps=True, sample_len=args.sample_len,
            )
        return model.generate(
            audio, language="en", temperature=0.0, tokenizer=tok,
            condition_on_previous_text=False, no_speech_threshold=None,
            without_timestamps=True,
        )

    t0 = time.perf_counter()
    out = run_once()
    compile_wall = time.perf_counter() - t0

    walls = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        out = run_once()
        walls.append(time.perf_counter() - t0)
    wall = min(walls)
    xrt = args.seconds / wall
    print(json.dumps({
        "metric": "whisper_large_v3_turbo_xrt",
        "value": round(xrt, 2),
        "unit": "x_realtime",
        "vs_baseline": round(xrt / 40.0, 3),
        "detail": {
            "audio_seconds": args.seconds,
            "wall_seconds": round(wall, 3),
            "compile_plus_first_run_seconds": round(compile_wall, 1),
            "gen_tokens": out.generation_tokens,
            "dtype": args.dtype,
            "mode": args.mode,
            "note": "random weights -> no early EOT; lower bound",
        },
    }))


if __name__ == "__main__":
    main()

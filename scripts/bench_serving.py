#!/usr/bin/env python
"""Serving throughput benchmark: concurrent requests batched per chip.

BASELINE serving north star: batch concurrent TTS/STT streams on one chip.
Measures aggregate throughput of N concurrent requests routed through the
`serving` batchers vs the same N requests run sequentially (single-stream),
on the real TPU. Random weights at real architecture dims — throughput
depends on the program, not the weight values.

Run on the real TPU (default interpreter). One process at a time.
"""

import argparse
import json
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def bench_kokoro_serving(n_requests: int, max_batch: int):
    import jax

    from bench import KOKORO_82M_CONFIG, PHONEMES  # repo-root bench.py
    from mlx_audio_tpu.nn.module import cast_floats
    from mlx_audio_tpu.serving import KokoroBatcher
    from mlx_audio_tpu.tts.models.kokoro import Model, ModelConfig

    sys.path.insert(0, str(Path(__file__).parent.parent))
    vocab_chars = (
        "abcdefghijklmnopqrstuvwxyzæɑɔɛɪʊʌəɹŋθðʃʒʧʤˈˌAIOWY ɡɜɾ.,!?;:\"'()…—"
    )
    vocab = {c: i + 1 for i, c in enumerate(dict.fromkeys(vocab_chars))}
    cfg = ModelConfig.from_dict({**KOKORO_82M_CONFIG, "vocab": vocab})
    model = cast_floats(Model(cfg))
    ref_s = (
        np.random.default_rng(0).standard_normal((1, 256)).astype(np.float32)
        * 0.1
    )
    ps = PHONEMES[:508]

    # single-stream reference (also pays all compiles)
    audio = model(ps, ref_s)
    t0 = time.perf_counter()
    for _ in range(n_requests):
        audio = model(ps, ref_s)
    seq_wall = time.perf_counter() - t0
    audio_seconds = audio.shape[-1] / cfg.sample_rate

    batcher = KokoroBatcher(model, max_batch=max_batch).install()
    try:
        # warm the batched-shape compile at full batch
        with ThreadPoolExecutor(n_requests) as ex:
            list(ex.map(lambda _: batcher(ps, ref_s, 1.0),
                        range(n_requests)))
        t0 = time.perf_counter()
        with ThreadPoolExecutor(n_requests) as ex:
            outs = list(ex.map(
                lambda _: batcher(ps, ref_s, 1.0), range(n_requests)))
        bat_wall = time.perf_counter() - t0
        dispatches = batcher.dispatch_count
    finally:
        batcher.close()

    total_audio = sum(o.shape[-1] for o in outs) / cfg.sample_rate
    print(json.dumps({
        "metric": "kokoro82m_serving_aggregate_rtf",
        "value": round(bat_wall / total_audio, 5),
        "unit": "rtf",
        "detail": {
            "n_requests": n_requests,
            "max_batch": max_batch,
            "batched_wall_s": round(bat_wall, 3),
            "sequential_wall_s": round(seq_wall, 3),
            "speedup_vs_sequential": round(seq_wall / bat_wall, 2),
            "audio_seconds_per_request": round(audio_seconds, 2),
            "dispatches": dispatches,
            "device": str(jax.devices()[0]),
            "weights": "random (architecture-true)",
        },
    }), flush=True)


def bench_whisper_serving(n_requests: int, max_batch: int):
    import jax

    from mlx_audio_tpu.nn.module import cast_floats
    from mlx_audio_tpu.serving import WhisperBatcher
    from mlx_audio_tpu.stt.models.whisper import Model, ModelDimensions
    from mlx_audio_tpu.stt.models.whisper.tokenizer import DummyTokenizer

    dims = ModelDimensions(
        n_mels=128, n_audio_ctx=1500, n_audio_state=1280, n_audio_head=20,
        n_audio_layer=32, n_vocab=51866, n_text_ctx=448, n_text_state=1280,
        n_text_head=20, n_text_layer=4,
    )
    model = cast_floats(Model(dims))
    tok = DummyTokenizer(n_vocab=51866)
    rng = np.random.default_rng(0)
    seconds = 30.0
    audios = [
        (rng.standard_normal(int(16000 * seconds)) * 0.05).astype(np.float32)
        for _ in range(n_requests)
    ]

    def transcribe(a):
        return model.generate(
            a, language="en", temperature=0.0, tokenizer=tok,
            condition_on_previous_text=False, no_speech_threshold=None,
            without_timestamps=True, sample_len=96,
        )

    # single-stream reference (pays single-row compiles)
    transcribe(audios[0])
    t0 = time.perf_counter()
    for a in audios:
        transcribe(a)
    seq_wall = time.perf_counter() - t0

    batcher = WhisperBatcher(model, max_batch=max_batch).install()
    try:
        with ThreadPoolExecutor(n_requests) as ex:  # warm batched compile
            list(ex.map(transcribe, audios))
        t0 = time.perf_counter()
        with ThreadPoolExecutor(n_requests) as ex:
            list(ex.map(transcribe, audios))
        bat_wall = time.perf_counter() - t0
        dispatches = batcher.dispatch_count
    finally:
        batcher.close()

    total_audio = seconds * n_requests
    print(json.dumps({
        "metric": "whisper_serving_aggregate_xrt",
        "value": round(total_audio / bat_wall, 2),
        "unit": "x_realtime",
        "detail": {
            "n_requests": n_requests,
            "max_batch": max_batch,
            "seconds_per_request": seconds,
            "batched_wall_s": round(bat_wall, 3),
            "sequential_wall_s": round(seq_wall, 3),
            "sequential_xrt": round(total_audio / seq_wall, 2),
            "speedup_vs_sequential": round(seq_wall / bat_wall, 2),
            "dispatches": dispatches,
            "sample_len": 96,
            "device": str(jax.devices()[0]),
            "weights": "random (architecture-true)",
        },
    }), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=8)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--only", choices=["kokoro", "whisper"], default=None)
    args = ap.parse_args()
    if args.only in (None, "kokoro"):
        bench_kokoro_serving(args.requests, args.max_batch)
    if args.only in (None, "whisper"):
        bench_whisper_serving(args.requests, args.max_batch)

#!/usr/bin/env python
"""Phase-level timing of Whisper chunked transcription on the real chip.

Answers "where does the time go" for the headline bench (VERDICT r1
next-round #10): mel, encode, and batched decode are timed separately by
forcing each phase's result to materialize (block_until_ready) between
phases — the normal path never syncs, so these boundaries are measurement
artifacts, not the production schedule. Prints one JSON line per phase
plus the bench-equivalent end-to-end number for cross-checking.

Usage: python scripts/profile_whisper.py [seconds] [sample_len]
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import numpy as np


def main():
    seconds = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0
    sample_len = int(sys.argv[2]) if len(sys.argv) > 2 else 96

    from mlx_audio_tpu.nn.module import cast_floats
    from mlx_audio_tpu.stt.models.whisper import Model, ModelDimensions
    from mlx_audio_tpu.stt.models.whisper.decoding import (
        DecodingOptions, decode_window_batch)
    from mlx_audio_tpu.stt.models.whisper.tokenizer import DummyTokenizer

    dims = ModelDimensions(
        n_mels=128, n_audio_ctx=1500, n_audio_state=1280, n_audio_head=20,
        n_audio_layer=32, n_vocab=51866, n_text_ctx=448, n_text_state=1280,
        n_text_head=20, n_text_layer=4,
    )
    model = cast_floats(Model(dims))
    tok = DummyTokenizer(n_vocab=51866)
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(int(16000 * seconds)) * 0.05).astype(np.float32)

    sot = list(tok.sot_sequence_including_notimestamps)
    opts = DecodingOptions(language="en", temperature=0.0,
                           without_timestamps=True, sample_len=sample_len)

    def phases():
        t = {}
        t0 = time.perf_counter()
        mel, _ = model._mel_chunks_device(audio)
        mel.block_until_ready()
        t["mel"] = time.perf_counter() - t0

        n = mel.shape[0]
        t0 = time.perf_counter()
        _xa, ckv = model._encode(model, mel)
        jax.tree_util.tree_map(lambda a: a.block_until_ready(), ckv)
        t["encode"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        res = decode_window_batch(
            model, ckv, tok, [sot] * n, opts, n_ctx=dims.n_text_ctx,
            n_vocab=dims.n_vocab, decoder_step=type(model)._decoder_step,
            make_caches=model._make_caches,
        )
        t["decode+host"] = time.perf_counter() - t0
        t["n_windows"] = n
        t["tokens"] = sum(len(r.tokens) for r in res)
        return t

    warm = phases()  # compile
    print(json.dumps({"phase_timings_compile_run": warm}), flush=True)
    for run in range(2):
        t = phases()
        total = t["mel"] + t["encode"] + t["decode+host"]
        print(json.dumps({
            "metric": "whisper_phase_profile", "run": run,
            "audio_seconds": seconds, "sample_len": sample_len,
            "phases_s": {k: round(v, 3) for k, v in t.items()
                         if isinstance(v, float)},
            "share": {k: round(v / total, 3) for k, v in t.items()
                      if isinstance(v, float)},
            "xrt_sum_of_phases": round(seconds / total, 1),
            "device": str(jax.devices()[0]),
        }), flush=True)


if __name__ == "__main__":
    main()

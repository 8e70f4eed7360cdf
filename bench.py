#!/usr/bin/env python
"""Benchmark harness — prints one JSON line PER headline metric.

Line 1: Kokoro-82M (real architecture config, random weights) TTS real-time
factor. BASELINE.json north-star target: RTF < 0.05 on 1 TPU v5e chip.
Lines 2-4: Whisper-large-v3-turbo chunked transcription throughput (xRT)
at the 224-token cap, at realistic decode length 96, and 10 min long-form.
BASELINE target: > 40x real time on 1 chip.

`vs_baseline` = target/measured for RTF (>1 beats target) and
measured/target for xRT (>1 beats target).

Random weights at real architecture dims: throughput depends on the program,
not the weight values — but random weights mean the Whisper decoder never
emits EOT early, so every window decodes to the sample cap. Real checkpoints
stop at EOT after ~50-120 tokens/window for typical speech, so the cap-224
number is a LOWER bound; `detail.sample_len` records the cap used.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import jax
import numpy as np


KOKORO_82M_CONFIG = dict(
    istftnet=dict(
        resblock_kernel_sizes=[3, 7, 11],
        upsample_rates=[10, 6],
        upsample_initial_channel=512,
        resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
        upsample_kernel_sizes=[20, 12],
        gen_istft_n_fft=20,
        gen_istft_hop_size=5,
    ),
    dim_in=64,
    dropout=0.2,
    hidden_dim=512,
    max_conv_dim=512,
    max_dur=50,
    multispeaker=True,
    n_layer=3,
    n_mels=80,
    n_token=178,
    style_dim=128,
    text_encoder_kernel_size=5,
    plbert=dict(
        hidden_size=768,
        num_attention_heads=12,
        intermediate_size=2048,
        max_position_embeddings=512,
        num_hidden_layers=12,
        embedding_size=128,
        dropout=0.1,
    ),
)

# ~35 s of speech worth of phonemes (repeated pangram-ish sentence)
PHONEMES = (
    "ðə kwˈɪk bɹˈWn fˈɑks ʤˈʌmps ˈOvəɹ ðə lˈAzi dˈɔɡ, "
    "ænd ðə sˈɪnθəsɪs mˈɑdəl tˈɜɹnz tˈɛkst ˈɪntu spˈiʧ. "
) * 5


def bench_kokoro():
    from mlx_audio_tpu.nn.module import cast_floats
    from mlx_audio_tpu.tts.models.kokoro import Model, ModelConfig

    vocab_chars = (
        "abcdefghijklmnopqrstuvwxyzæɑɔɛɪʊʌəɹŋθðʃʒʧʤˈˌAIOWY ɡɜɾ.,!?;:\"'()…—"
    )
    vocab = {c: i + 1 for i, c in enumerate(dict.fromkeys(vocab_chars))}
    cfg = ModelConfig.from_dict({**KOKORO_82M_CONFIG, "vocab": vocab})
    # BASELINE headline config is bf16 (phase-critical paths pin to f32).
    model = cast_floats(Model(cfg))

    n_params = sum(
        int(np.prod(v.shape)) for v in jax.tree_util.tree_leaves(model)
        if hasattr(v, "shape")
    )

    ref_s = np.random.default_rng(0).standard_normal((1, 256)).astype(np.float32) * 0.1
    ps = PHONEMES[:508]

    # Two-stage path: the fused single-dispatch variant exists
    # (fused_frames=...) but its single large program takes far longer to
    # compile through the remote-compile tunnel than the two stages do —
    # not worth it for a benchmark that pays compile once.
    t0 = time.perf_counter()
    audio = model(ps, ref_s)
    compile_time = time.perf_counter() - t0

    runs = 5
    t0 = time.perf_counter()
    for _ in range(runs):
        audio = model(ps, ref_s)
    wall = (time.perf_counter() - t0) / runs

    audio_seconds = audio.shape[-1] / cfg.sample_rate
    rtf = wall / audio_seconds
    target = 0.05
    print(
        json.dumps(
            {
                "metric": "kokoro82m_tts_rtf",
                "value": round(rtf, 5),
                "unit": "rtf",
                "vs_baseline": round(target / rtf, 3),
                "detail": {
                    "params": n_params,
                    "audio_seconds": round(audio_seconds, 2),
                    "wall_seconds_per_run": round(wall, 4),
                    "compile_seconds": round(compile_time, 1),
                    "device": str(jax.devices()[0]),
                    "phoneme_len": len(ps),
                },
            }
        ),
        flush=True,
    )


def bench_whisper(seconds: float = 120.0, runs: int = 2,
                  long_seconds: float = 600.0):
    from mlx_audio_tpu.nn.module import cast_floats
    from mlx_audio_tpu.stt.models.whisper import Model, ModelDimensions
    from mlx_audio_tpu.stt.models.whisper.tokenizer import DummyTokenizer

    # large-v3-turbo dims (config.json of openai/whisper-large-v3-turbo)
    dims = ModelDimensions(
        n_mels=128, n_audio_ctx=1500, n_audio_state=1280, n_audio_head=20,
        n_audio_layer=32, n_vocab=51866, n_text_ctx=448, n_text_state=1280,
        n_text_head=20, n_text_layer=4,
    )
    model = cast_floats(Model(dims))
    tok = DummyTokenizer(n_vocab=51866)

    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(int(16000 * seconds)) * 0.05).astype(np.float32)

    # Two points on the decode-length axis: random weights never emit EOT,
    # so the decode always runs to sample_len. cap=224 is the worst case
    # (headline; strict lower bound); 96 matches the typical tokens/window
    # of real speech checkpoints (~50-120 incl. prompt+EOT), giving the
    # expected real-checkpoint operating point.
    long_audio = (
        rng.standard_normal(int(16000 * long_seconds)) * 0.05
    ).astype(np.float32)

    # (metric name, audio, seconds, sample_len). The 10 min long-form line
    # shows decode amortization: the decoder's weight reads per step are
    # shared across all windows of a batch group, so throughput rises with
    # audio length (B=4 at 120 s vs B=8 groups at 600 s).
    cases = (
        ("whisper_large_v3_turbo_xrt", "cap224_lower_bound",
         audio, seconds, 224),
        ("whisper_large_v3_turbo_xrt_realistic", "realistic_len96",
         audio, seconds, 96),
        ("whisper_large_v3_turbo_xrt_longform10min", "realistic_len96",
         long_audio, long_seconds, 96),
    )
    for metric, label, aud, dur, sample_len in cases:
        def run_once():
            return model.generate_chunked(
                aud, language="en", temperature=0.0, tokenizer=tok,
                without_timestamps=True, sample_len=sample_len,
            )

        t0 = time.perf_counter()
        run_once()
        compile_wall = time.perf_counter() - t0

        walls = []
        for _ in range(runs):
            t0 = time.perf_counter()
            run_once()
            walls.append(time.perf_counter() - t0)
        wall = min(walls)
        xrt = dur / wall
        target = 40.0
        print(
            json.dumps(
                {
                    "metric": metric,
                    "value": round(xrt, 2),
                    "unit": "x_realtime",
                    "vs_baseline": round(xrt / target, 3),
                    "detail": {
                        "mode": "chunked",
                        "decode_length_model": label,
                        "audio_seconds": dur,
                        "wall_seconds": round(wall, 3),
                        "compile_seconds": round(compile_wall, 1),
                        "sample_len": sample_len,
                        "weights": "random (decode runs to sample_len)",
                        "device": str(jax.devices()[0]),
                    },
                }
            ),
            flush=True,
        )


def main():
    bench_kokoro()
    bench_whisper()


if __name__ == "__main__":
    main()

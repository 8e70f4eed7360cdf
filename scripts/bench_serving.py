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


def bench_whisper_serving(n_requests: int, max_batch: int, model=None,
                          tok=None):
    import jax

    from mlx_audio_tpu.serving import WhisperBatcher

    if model is None:
        from mlx_audio_tpu.nn.module import cast_floats
        from mlx_audio_tpu.stt.models.whisper import Model, ModelDimensions
        from mlx_audio_tpu.stt.models.whisper.tokenizer import DummyTokenizer

        dims = ModelDimensions(
            n_mels=128, n_audio_ctx=1500, n_audio_state=1280,
            n_audio_head=20, n_audio_layer=32, n_vocab=51866, n_text_ctx=448,
            n_text_state=1280, n_text_head=20, n_text_layer=4,
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

    batcher = WhisperBatcher(model, max_batch=max_batch,
                             window_ms=50.0).install()
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


def bench_snac_lm_continuous(n_requests: int, slots: int = 4,
                             decode_tokens: int = 128):
    """Continuous batching for an AR SNAC-LM (Orpheus-class): N concurrent
    token streams share the slot-based batcher (mid-flight joins, one
    fused device step per tick) vs the same N decoded one-by-one.
    Orpheus-3B backbone dims (llama-3.2-3B + audio vocab); random weights
    — throughput depends on the program, not the values."""
    import jax

    from mlx_audio_tpu.lm import CausalLM, LMConfig
    from mlx_audio_tpu.lm.continuous import ContinuousBatcher
    from mlx_audio_tpu.lm.generate import generate_tokens
    from mlx_audio_tpu.nn.module import build_on_host

    cfg = LMConfig(
        model_type="llama", hidden_size=3072, num_hidden_layers=28,
        intermediate_size=8192, num_attention_heads=24,
        num_key_value_heads=8, vocab_size=156940, rope_theta=500000.0,
    )
    # build_on_host: a 3B f32 random init on-device would peak at ~19 GB
    # (f32 tree + bf16 copy) and OOM the 16 GB v5e
    lm = build_on_host(lambda: CausalLM(cfg))
    rng = np.random.default_rng(0)
    prompts = [list(rng.integers(1, 150000, 64)) for _ in range(n_requests)]

    # sequential single-stream baseline (greedy; no EOS in random logits'
    # way — decode runs to the cap either way, lengths are equal)
    generate_tokens(lm, np.asarray(prompts[0], np.int32),
                    max_tokens=decode_tokens, temp=0.0)  # compile
    t0 = time.perf_counter()
    for p in prompts:
        generate_tokens(lm, np.asarray(p, np.int32),
                        max_tokens=decode_tokens, temp=0.0)
    seq_wall = time.perf_counter() - t0

    # slot KV pool is the HBM budget driver next to the 6.4 GB of
    # bf16 weights: 28L x 2 x slots x 8kv x max_len x 128 x 2B
    # tick_tokens=16: fuse 16 greedy steps per dispatch — per-token host
    # round trips otherwise dominate on the tunnel backend (measured
    # 0.35x vs sequential at 1 token/tick)
    cb = ContinuousBatcher(lm, slots=slots, max_len=256, tick_tokens=16)
    try:
        futs = [cb.submit(p, max_tokens=decode_tokens) for p in prompts]
        for f in futs:  # warm pass pays slot-program compiles
            f.result(timeout=3600)
        t0 = time.perf_counter()
        futs = [cb.submit(p, max_tokens=decode_tokens) for p in prompts]
        outs = [f.result(timeout=3600) for f in futs]
        bat_wall = time.perf_counter() - t0
    finally:
        cb.close()

    total_tokens = sum(len(o) for o in outs)
    print(json.dumps({
        "metric": "snac_lm_continuous_tokens_per_sec",
        "value": round(total_tokens / bat_wall, 1),
        "unit": "tokens/s",
        "detail": {
            "n_requests": n_requests,
            "slots": slots,
            "tick_tokens": 16,
            "decode_tokens_per_request": decode_tokens,
            "batched_wall_s": round(bat_wall, 3),
            "sequential_wall_s": round(seq_wall, 3),
            "sequential_tokens_per_sec": round(
                n_requests * decode_tokens / seq_wall, 1),
            "speedup_vs_sequential": round(seq_wall / bat_wall, 2),
            "backbone": "llama-3.2-3B dims + audio vocab (Orpheus-class)",
            "device": str(jax.devices()[0]),
            "weights": "random (architecture-true)",
        },
    }), flush=True)


def bench_stt_llm_continuous(n_requests: int, slots: int = 8,
                             prompt_frames: int = 375,
                             decode_tokens: int = 96,
                             trials: int = 3):
    """Embedding-prompt continuous batching for audio-conditioned LLM STT
    (Qwen3-ASR / Voxtral / GLM-ASR class): N concurrent transcriptions'
    decodes share the slot pool via `submit_embeds` (round-4 addition) vs
    the same N submitted one-at-a-time to the SAME engine (tunnel-neutral
    comparator — both sides pay identical per-tick round trips).

    Qwen3-1.7B decoder dims; the prompt is a (375, D) random embedding
    matrix standing in for a ~30 s audio window spliced into the prompt
    (the audio tower runs per-request outside the pool either way, so it
    cancels out of the comparison). Random weights — throughput depends
    on the program, not the values; greedy decode runs to the cap so both
    sides do identical work."""
    import jax

    from mlx_audio_tpu.lm import CausalLM, LMConfig
    from mlx_audio_tpu.lm.continuous import ContinuousBatcher
    from mlx_audio_tpu.nn.module import build_on_host

    cfg = LMConfig(
        model_type="qwen3", hidden_size=2048, num_hidden_layers=28,
        intermediate_size=6144, num_attention_heads=16,
        num_key_value_heads=8, head_dim=128, vocab_size=151936,
        rope_theta=1000000.0,
    )
    lm = build_on_host(lambda: CausalLM(cfg))
    rng = np.random.default_rng(0)
    embeds = [rng.standard_normal(
        (prompt_frames, cfg.hidden_size)).astype(np.float32) * 0.02
        for _ in range(n_requests)]

    cb = ContinuousBatcher(lm, slots=slots, max_len=1024, tick_tokens=16)
    try:
        # warm pass pays prefill/install/tick compiles for every slot
        futs = [cb.submit_embeds(e, max_tokens=decode_tokens)
                for e in embeds]
        for f in futs:
            f.result(timeout=3600)

        seq_walls, bat_walls = [], []
        for _ in range(trials):
            t0 = time.perf_counter()
            for e in embeds:  # one-at-a-time on the same engine
                cb.submit_embeds(e, max_tokens=decode_tokens).result(
                    timeout=3600)
            seq_walls.append(time.perf_counter() - t0)

            t0 = time.perf_counter()
            futs = [cb.submit_embeds(e, max_tokens=decode_tokens)
                    for e in embeds]
            outs = [f.result(timeout=3600) for f in futs]
            bat_walls.append(time.perf_counter() - t0)
    finally:
        cb.close()

    seq_w, bat_w = sorted(seq_walls)[trials // 2], sorted(bat_walls)[trials // 2]
    total_tokens = sum(len(o) for o in outs)
    print(json.dumps({
        "metric": "stt_llm_continuous_tokens_per_sec",
        "value": round(total_tokens / bat_w, 1),
        "unit": "tokens/s",
        "detail": {
            "n_requests": n_requests, "slots": slots,
            "tick_tokens": 16, "prompt_frames": prompt_frames,
            "decode_tokens_per_request": decode_tokens,
            "batched_wall_s_min_med_max": [
                round(w, 3) for w in sorted(bat_walls)],
            "sequential_wall_s_min_med_max": [
                round(w, 3) for w in sorted(seq_walls)],
            "speedup_vs_sequential": round(seq_w / bat_w, 2),
            "decoder": "qwen3-1.7B dims (Qwen3-ASR class)",
            "prompt": "(375, D) audio-spliced embeddings via submit_embeds",
            "device": str(jax.devices()[0]),
            "weights": "random (architecture-true)",
        },
    }), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--requests", type=int, default=8)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--only", choices=["kokoro", "whisper", "snac_lm",
                                       "stt_llm"],
                    default=None)
    ap.add_argument("--sweep", action="store_true",
                    help="run whisper serving at N in {1,2,4,8}")
    args = ap.parse_args()
    if args.sweep:
        from mlx_audio_tpu.nn.module import cast_floats
        from mlx_audio_tpu.stt.models.whisper import Model, ModelDimensions
        from mlx_audio_tpu.stt.models.whisper.tokenizer import DummyTokenizer

        dims = ModelDimensions(
            n_mels=128, n_audio_ctx=1500, n_audio_state=1280,
            n_audio_head=20, n_audio_layer=32, n_vocab=51866, n_text_ctx=448,
            n_text_state=1280, n_text_head=20, n_text_layer=4,
        )
        model = cast_floats(Model(dims))
        tok = DummyTokenizer(n_vocab=51866)
        for n in (1, 2, 4, 8):
            bench_whisper_serving(n, max_batch=n, model=model, tok=tok)
    else:
        if args.only in (None, "kokoro"):
            bench_kokoro_serving(args.requests, args.max_batch)
        if args.only in (None, "whisper"):
            bench_whisper_serving(args.requests, args.max_batch)
        if args.only in (None, "snac_lm"):
            bench_snac_lm_continuous(args.requests, slots=min(args.max_batch, 4))
        if args.only in (None, "stt_llm"):
            bench_stt_llm_continuous(args.requests,
                                     slots=min(args.max_batch, 8))

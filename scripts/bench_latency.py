#!/usr/bin/env python
"""Per-request latency SLO bench for batched serving: TTFA + p50/p99.

Round-4 verdict: the serving benches measured aggregate throughput only —
"a serving framework claiming 6-8x fusion wins must show what it costs the
p99 request". This bench measures, per family and per concurrency level
N in {1, 2, 4, 8}:

- TTFA: submit → first streamed unit (audio chunk for generate-level
  families, frame/token for batcher-level families) per request
- latency: submit → final unit delivered
- p50/p99 over all requests across `trials` repeats

The single-stream (N=1) row is the reference: a healthy batched
configuration keeps TTFA within ~2x of it, because requests join the slot
pool at the next tick boundary instead of queueing behind whole
utterances. Run on the real TPU (default interpreter), one process at a
time.
"""

import argparse
import json
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def _percentiles(xs):
    a = np.asarray(xs, np.float64)
    return {
        "p50": round(float(np.percentile(a, 50)), 4),
        "p99": round(float(np.percentile(a, 99)), 4),
        "max": round(float(a.max()), 4),
        "n": int(a.size),
    }


def _run_wave(n, make_request, trials=3, drop_first=True):
    """Launch `n` concurrent requests `trials` times; collect per-request
    (ttfa, latency) samples. `make_request(i)` returns a callable that
    blocks until its request completes and returns (ttfa_s, latency_s).

    drop_first: run one extra wave and discard it — the FIRST wave at a
    new concurrency level can pay a level-specific XLA compile (e.g. the
    Whisper batcher's power-of-two batch buckets), which is a warmup
    artifact, not steady-state latency."""
    ttfas, lats, walls = [], [], []
    if drop_first:
        reqs = [make_request(10_000 + i) for i in range(n)]
        threads = [threading.Thread(target=r) for r in reqs]
        [t.start() for t in threads]
        [t.join(timeout=3600) for t in threads]
    for t in range(trials):
        results = [None] * n
        reqs = [make_request(t * n + i) for i in range(n)]

        def run(i):
            results[i] = reqs[i]()

        threads = [threading.Thread(target=run, args=(i,)) for i in range(n)]
        t0 = time.perf_counter()
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=3600)
        walls.append(time.perf_counter() - t0)
        for r in results:
            if r is None:
                raise RuntimeError("request thread did not finish")
            ttfas.append(r[0])
            lats.append(r[1])
    return {
        "ttfa_s": _percentiles(ttfas),
        "latency_s": _percentiles(lats),
        "wall_s_median": round(sorted(walls)[len(walls) // 2], 3),
    }


def _emit(family, levels, extra=None):
    out = {"metric": f"{family}_serving_latency", "levels": levels}
    if extra:
        out["detail"] = extra
    if 1 in levels and max(levels) > 1:
        n_max = max(levels)
        out["ttfa_p50_ratio_vs_single"] = round(
            levels[n_max]["ttfa_s"]["p50"] / levels[1]["ttfa_s"]["p50"], 2)
    print(json.dumps(out), flush=True)
    return out


# ---------------------------------------------------------------------------
# Batcher-level families: TTFA = first on_frame/on_token arrival
# ---------------------------------------------------------------------------


def _batcher_wave_fn(submit):
    """Adapt a batcher submit(seed, on_frame=...) closure into the
    _run_wave request protocol."""

    def make_request(i):
        def run():
            state = {"t0": None, "first": None}

            def on_item(_item):
                if state["first"] is None:
                    state["first"] = time.perf_counter()

            state["t0"] = time.perf_counter()
            fut = submit(i, on_item)
            fut.result(timeout=3600)
            t1 = time.perf_counter()
            first = state["first"] or t1
            return first - state["t0"], t1 - state["t0"]

        return run

    return make_request


def bench_qwen3_latency(levels=(1, 2, 4, 8), n_frames=64, tick_frames=8,
                        trials=3):
    """Generate-level audio TTFA for Qwen3-TTS: stream=True requests ride
    the installed frame batcher via on_frame + chunked codec decode."""
    from mlx_audio_tpu.nn.module import build_on_host
    from mlx_audio_tpu.tts.models.qwen3_tts import Model, ModelConfig

    class _AsciiTok:
        def encode(self, text, **kw):
            return [(ord(c) % 997) + 3 for c in text]

    model = build_on_host(lambda: Model(ModelConfig.from_dict({})))
    model.set_runtime(tokenizer=_AsciiTok())
    text = ("The quick brown fox jumps over the lazy dog while the "
            "synthesis model turns text into speech. " * 2).strip()
    kw = dict(max_tokens=n_frames, min_tokens=n_frames, temperature=0.9,
              top_k=50, stream=True, streaming_interval=0.5)

    batcher = model.make_batcher(slots=max(levels), max_len=1024,
                                 tick_frames=tick_frames)
    batcher.install()
    out = {}
    try:
        # warm: full wave compiles prefill/install/tick + codec chunks
        def gen_request(i):
            def run():
                t0 = time.perf_counter()
                first = None
                for _r in model.generate(text, seed=i, **kw):
                    if first is None:
                        first = time.perf_counter()
                t1 = time.perf_counter()
                return (first or t1) - t0, t1 - t0

            return run

        _run_wave(max(levels), gen_request, trials=1)  # warm pass
        for n in levels:
            out[n] = _run_wave(n, gen_request, trials=trials)
    finally:
        batcher.close()
    return _emit("qwen3_tts", out, extra={
        "mode": "generate(stream=True) through Qwen3TTSBatcher",
        "n_frames": n_frames, "tick_frames": tick_frames,
        "streaming_interval_s": 0.5,
        "ttfa_unit": "first decoded audio chunk"})


def bench_sesame_latency(levels=(1, 2, 4, 8), n_frames=64, tick_frames=8,
                         trials=3):
    """Frame-level TTFA for Sesame/CSM-1B: first sampled frame delivered
    by the slot batcher (Mimi chunk decode adds one fixed chunk on top)."""
    from mlx_audio_tpu.nn.module import build_on_host
    from mlx_audio_tpu.tts.models.sesame.sesame import Model, ModelConfig

    model = build_on_host(lambda: Model(ModelConfig()))
    rng = np.random.default_rng(3)
    K = model.config.audio_num_codebooks
    T = 48
    toks = np.zeros((1, T, K + 1), np.int32)
    toks[:, :, -1] = rng.integers(5, 1000, T)
    mask = np.zeros((1, T, K + 1), bool)
    mask[:, :, -1] = True

    batcher = model.make_batcher(slots=max(levels), max_len=1024,
                                 tick_frames=tick_frames)
    out = {}
    try:
        submit = lambda i, cb: batcher.submit(
            toks, mask, max_frames=n_frames, temp=0.9, top_k=50, seed=i,
            on_frame=cb)
        _run_wave(max(levels), _batcher_wave_fn(submit), trials=1)  # warm
        for n in levels:
            out[n] = _run_wave(n, _batcher_wave_fn(submit), trials=trials)
    finally:
        batcher.close()
    return _emit("sesame", out, extra={
        "mode": "SesameBatcher frame-level", "n_frames": n_frames,
        "tick_frames": tick_frames, "ttfa_unit": "first frame"})


def bench_cosyvoice2_latency(levels=(1, 2, 4, 8), n_tokens=64,
                             tick_frames=8, trials=3):
    """Token-level TTFA for CosyVoice2's RAS decode (flow+HiFT vocode stay
    per-request downstream either way)."""
    from mlx_audio_tpu.nn.module import build_on_host
    from mlx_audio_tpu.tts.models.cosyvoice2.batcher import RASBatcher
    from mlx_audio_tpu.tts.models.cosyvoice2.cosyvoice2 import (
        CosyVoice2Config, Qwen2LM)

    lm = build_on_host(lambda: Qwen2LM(CosyVoice2Config().llm))
    rng = np.random.default_rng(5)
    D = lm.llm.config.hidden_size
    embeds = rng.standard_normal((1, 96, D)).astype(np.float32) * 0.02

    class _Owner:  # hook-registration target only
        pass

    batcher = RASBatcher(_Owner(), lm=lm, slots=max(levels), max_len=1024,
                         tick_frames=tick_frames)
    out = {}
    try:
        submit = lambda i, cb: batcher.submit(
            embeds, min_tokens=n_tokens, max_steps=n_tokens, seed=i,
            on_frame=cb)
        _run_wave(max(levels), _batcher_wave_fn(submit), trials=1)  # warm
        for n in levels:
            out[n] = _run_wave(n, _batcher_wave_fn(submit), trials=trials)
    finally:
        batcher.close()
    return _emit("cosyvoice2", out, extra={
        "mode": "RASBatcher token-level", "n_tokens": n_tokens,
        "tick_frames": tick_frames, "ttfa_unit": "first speech token"})


def bench_chatterbox_latency(levels=(1, 2, 4, 8), n_tokens=64,
                             tick_frames=8, trials=3):
    """Token-level TTFA for Chatterbox's CFG-paired T3 decode (S3Gen
    vocode is per-request downstream)."""
    from mlx_audio_tpu.nn.module import build_on_host
    from mlx_audio_tpu.tts.models.chatterbox import T3Config
    from mlx_audio_tpu.tts.models.chatterbox.batcher import T3Batcher
    from mlx_audio_tpu.tts.models.chatterbox.t3 import T3

    t3 = build_on_host(lambda: T3(T3Config.english_only()))
    rng = np.random.default_rng(7)
    D = t3.hp.n_channels
    embeds = rng.standard_normal((2, 96, D)).astype(np.float32) * 0.02

    class _Owner:
        pass

    owner = _Owner()
    owner.t3 = t3
    batcher = T3Batcher(owner, slots=max(levels), max_len=1024,
                        tick_frames=tick_frames)
    out = {}
    try:
        submit = lambda i, cb: batcher.submit(
            embeds, max_tokens=n_tokens, temperature=0.8, seed=i,
            on_frame=cb)
        _run_wave(max(levels), _batcher_wave_fn(submit), trials=1)  # warm
        for n in levels:
            out[n] = _run_wave(n, _batcher_wave_fn(submit), trials=trials)
    finally:
        batcher.close()
    return _emit("chatterbox", out, extra={
        "mode": "T3Batcher token-level (CFG-paired)", "n_tokens": n_tokens,
        "tick_frames": tick_frames, "ttfa_unit": "first speech token"})


def bench_stt_llm_latency(levels=(1, 2, 4, 8), prompt_frames=375,
                          decode_tokens=64, trials=3):
    """Token-level TTFT for the shared LLM-STT pool (Qwen3-ASR class):
    embedding prompts through submit_embeds + on_token."""
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
    emb = rng.standard_normal((prompt_frames, cfg.hidden_size)).astype(
        np.float32) * 0.02

    cb = ContinuousBatcher(lm, slots=max(levels), max_len=1024,
                           tick_tokens=16)
    out = {}
    try:
        submit = lambda i, callback: cb.submit_embeds(
            emb, max_tokens=decode_tokens, on_token=callback)
        _run_wave(max(levels), _batcher_wave_fn(submit), trials=1)  # warm
        for n in levels:
            out[n] = _run_wave(n, _batcher_wave_fn(submit), trials=trials)
    finally:
        cb.close()
    return _emit("stt_llm", out, extra={
        "mode": "ContinuousBatcher submit_embeds (Qwen3-ASR class)",
        "prompt_frames": prompt_frames, "decode_tokens": decode_tokens,
        "tick_tokens": 16, "ttfa_unit": "first text token (TTFT)"})


def bench_whisper_latency(levels=(1, 2, 4, 8), seconds=30.0, trials=3):
    """Request-level latency for the Whisper window batcher (no
    mid-transcript streaming on this path: TTFA == latency per window)."""
    from concurrent.futures import ThreadPoolExecutor

    from mlx_audio_tpu.nn.module import cast_floats
    from mlx_audio_tpu.stt.models.whisper import Model, ModelDimensions
    from mlx_audio_tpu.stt.models.whisper.tokenizer import DummyTokenizer

    dims = ModelDimensions(
        n_mels=128, n_audio_ctx=1500, n_audio_state=1280, n_audio_head=20,
        n_audio_layer=32, n_vocab=51866, n_text_ctx=448, n_text_state=1280,
        n_text_head=20, n_text_layer=4,
    )
    model = cast_floats(Model(dims))
    tok = DummyTokenizer(n_vocab=51866)
    rng = np.random.default_rng(2)
    audio = (rng.standard_normal(int(16000 * seconds)) * 0.05).astype(
        np.float32)

    def transcribe():
        return model.generate(
            audio, language="en", temperature=0.0, tokenizer=tok,
            condition_on_previous_text=False, no_speech_threshold=None,
            without_timestamps=True, sample_len=96)

    batcher = model.make_batcher(max_batch=max(levels),
                                 window_ms=50.0).install()
    out = {}
    try:
        with ThreadPoolExecutor(max(levels)) as ex:  # warm batched compile
            list(ex.map(lambda _: transcribe(), range(max(levels))))

        def make_request(_i):
            def run():
                t0 = time.perf_counter()
                transcribe()
                t1 = time.perf_counter()
                return t1 - t0, t1 - t0

            return run

        for n in levels:
            out[n] = _run_wave(n, make_request, trials=trials)
    finally:
        batcher.close()
    return _emit("whisper", out, extra={
        "mode": "WhisperBatcher window-level",
        "seconds_per_request": seconds, "sample_len": 96,
        "ttfa_unit": "completed 30s window (== latency)"})


FAMILIES = {
    "qwen3": bench_qwen3_latency,
    "sesame": bench_sesame_latency,
    "cosyvoice2": bench_cosyvoice2_latency,
    "chatterbox": bench_chatterbox_latency,
    "stt_llm": bench_stt_llm_latency,
    "whisper": bench_whisper_latency,
}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", choices=sorted(FAMILIES), default=None)
    ap.add_argument("--levels", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--out", type=str, default=None,
                    help="also append results to this JSON file")
    args = ap.parse_args()
    results = []
    for name, fn in FAMILIES.items():
        if args.only and name != args.only:
            continue
        results.append(fn(levels=tuple(args.levels), trials=args.trials))
    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=1))

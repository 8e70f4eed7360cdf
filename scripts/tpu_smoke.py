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


# One end-to-end test per model family, run ON THE REAL CHIP via
# `tpu_smoke.py --all` (pytest with MLX_AUDIO_TPU_TESTS=1, which makes
# tests/conftest.py skip the CPU-platform override). Excluded by design:
# parity tests (torch comparison belongs on CPU), dsp tests (they fetch
# complex64 STFT outputs to host — unsupported on the axon backend),
# multi-device sharding tests (need the 8-device CPU mesh).
ALL_FAMILY_TESTS = [
    # TTS
    "tests/test_bark.py::test_generate_end_to_end",
    "tests/test_chatterbox.py::test_full_pipeline_tiny",
    "tests/test_chatterbox_turbo.py::test_turbo_t3_generates",
    "tests/test_cosyvoice2.py::test_full_pipeline_zero_shot",
    "tests/test_cosyvoice3.py::test_full_pipeline_zero_shot_and_vc",
    "tests/test_dia.py::test_dia_generate",
    "tests/test_echo_tts.py::test_generate_with_speaker_conditioning",
    "tests/test_indextts.py::test_generate_end_to_end",
    "tests/test_kokoro.py::test_generate_end_to_end",
    "tests/test_pocket_tts.py::test_generate_audio_end_to_end",
    "tests/test_qwen3_tts.py::test_generate_end_to_end",
    "tests/test_vibevoice.py::test_generate_latents_interleaved",
    "tests/test_voxcpm.py::test_generate_no_clone",
    "tests/test_lm_tts.py::test_orpheus_generate_with_tiny_backbone",
    "tests/test_lm_tts.py::test_sesame_frame_generation",
    "tests/test_tts_small_models.py::test_outetts_generate_smoke",
    "tests/test_tts_small_models.py::test_soprano_generate_smoke",
    "tests/test_spark.py::test_bicodec_detokenize",
    # STT
    "tests/test_whisper.py::test_generate_seek_loop",
    "tests/test_parakeet.py::test_tdt_generate_with_chunking",
    "tests/test_qwen3_asr.py::test_generate_end_to_end",
    "tests/test_voxtral_realtime.py::test_generate_end_to_end",
    "tests/test_vibevoice_asr.py::test_generate_end_to_end",
    "tests/test_funasr.py::test_generate_end_to_end",
    "tests/test_glmasr.py::test_generate_end_to_end",
    "tests/test_stt_small_models.py::test_lasr_ctc",
    "tests/test_stt_small_models.py::test_wav2vec2",
    "tests/test_stt_small_models.py::test_voxtral_tiny",
    # STS + VAD
    "tests/test_sam_audio.py::test_separate_end_to_end",
    "tests/test_lfm_audio.py::test_generate_sequential_runs",
    "tests/test_mossformer2_se.py::test_enhance_roundtrip_shapes",
    "tests/test_vad.py::test_offline_diarization",
    "tests/test_vad.py::test_smart_turn",
    # Codecs
    "tests/test_codecs.py::test_dac_codes_roundtrip",
    "tests/test_codecs.py::test_encodec_roundtrip",
    "tests/test_codecs.py::test_snac_encode_decode",
    "tests/test_codecs.py::test_vocos_mel_decode",
    "tests/test_codecs.py::test_bigvgan_generator",
    "tests/test_codecs.py::test_dacvae_roundtrip_shapes",
    "tests/test_codecs.py::test_fish_s1_dac_roundtrip",
    "tests/test_mimi.py::test_encode_decode_shapes",
    "tests/test_s3gen.py::test_encoder_upsamples_2x_and_masks_padding",
    "tests/test_s3gen.py::test_hift_streaming_source_cache",
    "tests/test_s3tokenizer.py::test_v2_quantize_shapes_and_range",
    # SERVING: N-stream batched==sequential smoke per batcher family
    # (round-5 — proves the fused batch/tick programs compile + run on
    # the real chip, not just the CPU mesh). Excluded: test_dp_serving
    # (needs the multi-device CPU mesh).
    "tests/test_serving.py::test_batch_synthesize_matches_sequential",
    "tests/test_serving.py::test_whisper_batcher_matches_sequential",
    "tests/test_serving.py::test_parakeet_batcher_noarg_warmup",
    "tests/test_frame_batcher.py::test_qwen3_batched_equals_sequential",
    "tests/test_frame_batcher.py::test_qwen3_stream_through_batcher_equals_unbatched",
    "tests/test_frame_batcher.py::test_sesame_batched_equals_sequential",
    "tests/test_chatterbox.py::test_t3_batcher_batched_equals_sequential",
    "tests/test_chatterbox_turbo.py::test_turbo_batcher_batched_equals_sequential",
    "tests/test_cosyvoice2.py::test_ras_batcher_batched_equals_sequential",
    "tests/test_cosyvoice3.py::test_ras_batcher_v3_stop_rule",
    "tests/test_dia.py::test_dia_batcher_batched_equals_sequential",
    "tests/test_tts_small_models.py::test_soprano_batcher_batched_equals_sequential",
    "tests/test_continuous.py::test_snac_lm_routes_through_installed_batcher",
    "tests/test_continuous.py::test_spark_routes_through_installed_batcher",
    "tests/test_continuous.py::test_outetts_routes_through_installed_batcher",
    "tests/test_continuous_embeds.py::test_qwen3_asr_routes_through_installed_batcher",
    "tests/test_continuous_embeds.py::test_glmasr_routes_through_installed_batcher",
    "tests/test_continuous_embeds.py::test_voxtral_routes_through_installed_batcher",
    "tests/test_continuous_embeds.py::test_funasr_routes_through_installed_batcher",
    "tests/test_continuous_embeds.py::test_vibevoice_asr_routes_through_installed_batcher",
    "tests/test_voxtral_realtime.py::test_rt_batcher_batched_equals_solo",
    "tests/test_window_batchers.py::test_wav2vec2_window_batcher",
    "tests/test_window_batchers.py::test_lasr_ctc_window_batcher",
    "tests/test_window_batchers.py::test_sortformer_window_batcher",
    "tests/test_window_batchers.py::test_mossformer2_se_window_batcher",
    "tests/test_window_batchers.py::test_smart_turn_window_batcher",
    "tests/test_indextts.py::test_indextts_batcher_batched_equals_sequential",
    "tests/test_pocket_tts.py::test_pocket_batcher_batched_equals_sequential",
    "tests/test_echo_tts.py::test_echo_batcher_batched_equals_solo",
    "tests/test_sam_audio.py::test_sam_batcher_batched_equals_solo",
    "tests/test_voxcpm.py::test_voxcpm_batcher_batched_equals_sequential",
    "tests/test_lfm_audio.py::test_lfm2_batcher_batched_equals_solo",
    "tests/test_vibevoice.py::test_vibevoice_batcher_batched_equals_solo",
    "tests/test_bark.py::test_bark_batcher_batched_equals_solo",
]


def run_all():
    """Run one end-to-end test per family on the real chip via pytest.

    Each test runs in its OWN pytest process: the axon backend holds
    compiled programs + buffers for the life of a process, and module
    fixtures keep model weights alive, so a single all-families run
    accumulates until the backend starts failing dispatches with
    UNIMPLEMENTED. Per-test processes release everything between
    families (verified: tests that failed in the single-process run
    pass in isolation).
    """
    import os
    import subprocess
    import time

    env = dict(os.environ, MLX_AUDIO_TPU_TESTS="1")
    repo = Path(__file__).parent.parent
    # --resume <log>: skip tests already recorded as PASS in a previous
    # run's log (lets an interrupted sweep continue without repaying
    # compiles for families that already proved out).
    done = set()
    if "--resume" in sys.argv:
        log = Path(sys.argv[sys.argv.index("--resume") + 1])
        for line in log.read_text().splitlines():
            if " PASS " in line:
                done.add(line.split()[-1])
    todo = [t for t in ALL_FAMILY_TESTS if t not in done]
    print(f"{len(todo)} family tests, one process each"
          + (f" ({len(done)} already passed, skipped)" if done else ""),
          flush=True)
    failures = []
    for i, test in enumerate(todo, 1):
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "--tb=line",
             "-p", "no:cacheprovider", test],
            cwd=repo, env=env, capture_output=True, text=True)
        status = "PASS" if r.returncode == 0 else "FAIL"
        print(f"[{i:2}/{len(todo)}] {status} "
              f"{time.time() - t0:6.1f}s {test}", flush=True)
        if r.returncode != 0:
            failures.append(test)
            tail = (r.stdout + r.stderr).strip().splitlines()[-12:]
            print("\n".join("      " + ln for ln in tail), flush=True)
    print(f"\n{len(todo) - len(failures)}/"
          f"{len(todo)} families passed on real TPU "
          f"this run ({len(done)} carried over)", flush=True)
    sys.exit(1 if failures else 0)


def main():
    if "--all" in sys.argv:
        run_all()
        return
    results = [
        ok("dsp stft/istft roundtrip", dsp_roundtrip),
        ok("mimi encode/decode", mimi),
        ok("sam_audio separate", sam_audio),
        ok("qwen3_tts generate", qwen3_tts),
    ]
    sys.exit(0 if all(results) else 1)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Per-family roofline / MFU table (round-4 verdict #8).

For each flagship compute path, measure wall time on the real chip and
compare against the hardware roofs using XLA's own cost model
(`compiled.cost_analysis()`: flops + bytes accessed):

- achieved TFLOP/s vs the v5e MXU roof (197 TFLOP/s bf16, ~half for f32
  accumulate-heavy paths)
- achieved GB/s vs the v5e HBM roof (~819 GB/s)
- the binding roof (max of the two utilizations) names the resource the
  path is actually limited by; the biggest gap across families is the
  next perf target.

Run on the real TPU (default interpreter), one process at a time.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

HBM_ROOF_GBS = 819.0
MXU_ROOF_TFLOPS = 197.0  # bf16; f32 paths reach ~1/2 in practice


def _sync(out):
    """Force completion of everything queued on the device: reduce one
    output leaf to a scalar ON DEVICE and fetch it. (On the axon tunnel
    backend `block_until_ready` returns before remote execution finishes —
    only a device→host transfer is a true barrier.)"""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.sum(jnp.abs(leaf.astype(jnp.float32))))


def _measure(fn, *args, runs=50):
    jf = jax.jit(fn)
    # cost model only — calling the AOT executable directly trips over
    # _Static module-leaf metadata, so time through the normal jit path
    ca = jf.lower(*args).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    in_bytes = float(ca.get("bytes accessed", 0.0))
    out = jf(*args)
    _sync(out)
    # time `runs` chained dispatches closed by one true barrier — device
    # execution is serial per core, so wall/runs is the per-call time with
    # the tunnel round trip amortized across the whole chain
    t0 = time.perf_counter()
    for _ in range(runs):
        out = jf(*args)
    _sync(out)
    wall = (time.perf_counter() - t0) / runs
    return wall, flops, in_bytes


def _emit(name, wall, flops, bytes_acc, note=""):
    tflops = flops / wall / 1e12
    gbs = bytes_acc / wall / 1e9
    mxu_util = tflops / MXU_ROOF_TFLOPS
    hbm_util = gbs / HBM_ROOF_GBS
    row = {
        "path": name,
        "wall_ms": round(wall * 1e3, 3),
        "achieved_tflops": round(tflops, 2),
        "achieved_gbs": round(gbs, 1),
        "mxu_util": round(mxu_util, 3),
        "hbm_util": round(hbm_util, 3),
        "binding_roof": ("MXU" if mxu_util >= hbm_util else "HBM"),
        "roof_util": round(max(mxu_util, hbm_util), 3),
        "note": note,
    }
    print(json.dumps(row), flush=True)
    return row


def whisper_encoder():
    from mlx_audio_tpu.nn.module import cast_floats
    from mlx_audio_tpu.stt.models.whisper import Model, ModelDimensions

    dims = ModelDimensions(
        n_mels=128, n_audio_ctx=1500, n_audio_state=1280, n_audio_head=20,
        n_audio_layer=32, n_vocab=51866, n_text_ctx=448, n_text_state=1280,
        n_text_head=20, n_text_layer=4)
    model = cast_floats(Model(dims))
    mel = jnp.zeros((1, 3000, 128), jnp.bfloat16)

    def enc(m, x):
        return m.encoder(x)

    wall, flops, b = _measure(enc, model, mel)
    return _emit("whisper_encoder_B1_30s", wall, flops, b,
                 "large-v3-turbo encoder, bf16")


def whisper_encoder_b8():
    from mlx_audio_tpu.nn.module import cast_floats
    from mlx_audio_tpu.stt.models.whisper import Model, ModelDimensions

    dims = ModelDimensions(
        n_mels=128, n_audio_ctx=1500, n_audio_state=1280, n_audio_head=20,
        n_audio_layer=32, n_vocab=51866, n_text_ctx=448, n_text_state=1280,
        n_text_head=20, n_text_layer=4)
    model = cast_floats(Model(dims))
    mel = jnp.zeros((8, 3000, 128), jnp.bfloat16)

    def enc(m, x):
        return m.encoder(x)

    wall, flops, b = _measure(enc, model, mel)
    return _emit("whisper_encoder_B8_serving", wall, flops, b,
                 "batched serving encode (WhisperBatcher group)")


def kokoro_decoder():
    from bench import KOKORO_82M_CONFIG, PHONEMES
    from mlx_audio_tpu.nn.module import cast_floats
    from mlx_audio_tpu.tts.models.kokoro import Model, ModelConfig

    vocab_chars = (
        "abcdefghijklmnopqrstuvwxyzæɑɔɛɪʊʌəɹŋθðʃʒʧʤˈˌAIOWY ɡɜɾ.,!?;:\"'()…—"
    )
    vocab = {c: i + 1 for i, c in enumerate(dict.fromkeys(vocab_chars))}
    model = cast_floats(Model(ModelConfig.from_dict(
        {**KOKORO_82M_CONFIG, "vocab": vocab})))
    ps = PHONEMES[:508]
    ref_s = jnp.zeros((1, 256), jnp.float32)
    # run the production frontend once on-host to get real-shape inputs
    ids = jnp.asarray(
        [[0] + [vocab.get(c, 1) for c in ps] + [0]], jnp.int32)
    mask = jnp.ones_like(ids, bool)
    pred_dur, d, t_en = type(model)._frontend(model, ids, mask, ref_s, 1.0)

    def synth(m, d, t_en, pred_dur, ref_s):
        return type(m)._synthesize(m, d, t_en, pred_dur, ref_s,
                                   jax.random.PRNGKey(0), 128)

    wall, flops, b = _measure(synth, model, d, t_en, pred_dur, ref_s)
    return _emit("kokoro_istftnet_synthesize", wall, flops, b,
                 "decoder+iSTFTNet stage, ~35 s utterance")


def s3gen_flow():
    from mlx_audio_tpu.tts.models.cosyvoice2.cosyvoice2 import (
        CosyVoice2Config, _flow_infer, build_cosyvoice2)
    from mlx_audio_tpu.nn.module import build_on_host

    model = build_on_host(lambda: build_cosyvoice2(CosyVoice2Config()))
    T = 500  # ~20 s of 25 Hz speech tokens
    toks = jnp.zeros((1, ((T + 127) // 128) * 128), jnp.int32)
    prompt = jnp.zeros((1, 128), jnp.int32)
    feat = jnp.zeros((1, 256, 80), jnp.float32)
    emb = jnp.zeros((1, 192), jnp.float32)

    def flow(m, toks, prompt, feat, emb):
        return _flow_infer(m.flow, toks, jnp.array([T], jnp.int32), prompt,
                           jnp.array([128], jnp.int32), feat, emb,
                           jax.random.PRNGKey(0), 10, False)

    wall, flops, b = _measure(flow, model, toks, prompt, feat, emb)
    return _emit("cosyvoice2_flow_10steps_20s", wall, flops, b,
                 "CausalMaskedDiff flow (CFG pairs x 10 steps)")


def qwen3_serving_tick():
    from mlx_audio_tpu.nn.module import build_on_host
    from mlx_audio_tpu.tts.models.qwen3_tts import Model, ModelConfig

    class _Tok:
        def encode(self, text, **kw):
            return [(ord(c) % 997) + 3 for c in text]

    model = build_on_host(lambda: Model(ModelConfig.from_dict({})))
    model.set_runtime(tokenizer=_Tok())
    b = model.make_batcher(slots=8, max_len=512, tick_frames=8)
    try:
        futs = [b.submit(*model._prepare_generation_inputs(
            f"Warm slot number {i} for the roofline tick."
        )[:2], max_tokens=64, min_tokens=64, seed=i) for i in range(8)]
        t0 = time.perf_counter()
        for f in futs:
            f.result(timeout=3600)
        wall = time.perf_counter() - t0
        ticks = b.steps
    finally:
        b.close()
    # bandwidth model: one tick reads the talker + code-predictor weights
    # once per frame step (batch rides the same weight stream)
    import jax.tree_util as jtu

    n_bytes = sum(
        v.size * v.dtype.itemsize
        for v in jtu.tree_leaves(model.talker)
        if hasattr(v, "dtype") and v.dtype in (jnp.bfloat16, jnp.float32))
    frames = 64 * 8
    per_tick = wall / max(ticks, 1)
    step_bytes = n_bytes * 8  # 8 frame steps per tick
    row = {
        "path": "qwen3_tts_serving_tick_8slots",
        "wall_ms": round(per_tick * 1e3, 3),
        "achieved_gbs": round(step_bytes / per_tick / 1e9, 1),
        "hbm_util": round(step_bytes / per_tick / 1e9 / HBM_ROOF_GBS, 3),
        "binding_roof": "HBM",
        "note": (f"{ticks} fused ticks for {frames} frames across 8 "
                 "sampled slots; bytes = talker+codepred weights x 8 "
                 "steps/tick (weight stream shared by all slots)"),
    }
    print(json.dumps(row), flush=True)
    return row


if __name__ == "__main__":
    only = sys.argv[1] if len(sys.argv) > 1 else None
    rows = []
    for name, fn in [("whisper", whisper_encoder),
                     ("whisper8", whisper_encoder_b8),
                     ("kokoro", kokoro_decoder),
                     ("s3gen", s3gen_flow),
                     ("tick", qwen3_serving_tick)]:
        if only and name != only:
            continue
        try:
            rows.append(fn())
        except Exception as e:
            print(json.dumps({"path": name, "error": f"{type(e).__name__}: {e}"}),
                  flush=True)
    out = Path(__file__).parent.parent.joinpath("ROOFLINE.json")
    if only and out.exists():
        # selective re-run: refresh matching rows, keep the rest
        old = json.loads(out.read_text()).get("rows", [])
        fresh = {r["path"] for r in rows}
        rows = [r for r in old if r["path"] not in fresh] + rows
    out.write_text(
        json.dumps({"device": str(jax.devices()[0]), "rows": rows},
                   indent=1))

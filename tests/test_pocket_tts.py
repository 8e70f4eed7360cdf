"""PocketTTS: AdaLN flow net, LSD decode, on-device latent loop, Mimi decode."""

import jax
import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.codec.models.mimi.mimi import MimiConfig
from mlx_audio_tpu.tts.models.pocket_tts import (
    FlowLMConfig,
    Model,
    ModelConfig,
    SimpleMLPAdaLN,
    lsd_decode,
)
from mlx_audio_tpu.tts.models.pocket_tts.pocket_tts import (
    FlowConfig,
    FlowLMTransformerConfig,
    LookupTable,
)


def tiny_model():
    flow_cfg = FlowLMConfig(
        flow=FlowConfig(dim=24, depth=1),
        transformer=FlowLMTransformerConfig(hidden_scale=2, max_period=10000,
                                            d_model=24, num_heads=2,
                                            num_layers=1),
        lookup_table=LookupTable(dim=24, n_bins=60))
    from dataclasses import replace

    mimi_cfg = MimiConfig()
    mimi_cfg.seanet = replace(mimi_cfg.seanet, dimension=16, nfilters=4,
                              nresidual_layers=1, ratios=[8, 5, 4, 3])
    mimi_cfg.transformer = replace(mimi_cfg.transformer, d_model=16,
                                   num_heads=2, num_layers=1,
                                   dim_feedforward=32)
    mimi_cfg.frame_rate = 25.0
    cfg = ModelConfig(latent_dim=8, flow_lm=flow_cfg, mimi=mimi_cfg,
                      lsd_decode_steps=2, temp=0.8)
    return Model(cfg)


def test_lsd_decode_integrates_constant_flow():
    # v(s,t,x) = 1 → x_1 = x_0 + 1 regardless of num_steps
    x0 = jnp.zeros((2, 4))
    out = lsd_decode(lambda s, t, x: jnp.ones_like(x), x0, num_steps=4)
    np.testing.assert_allclose(np.asarray(out), np.ones((2, 4)), atol=1e-6)


def test_flow_net_shapes():
    net = SimpleMLPAdaLN(in_channels=8, model_channels=24, out_channels=8,
                         cond_channels=16, num_res_blocks=2)
    c = jnp.zeros((3, 16))
    s = jnp.zeros((3, 1))
    t = jnp.ones((3, 1))
    x = jnp.asarray(np.random.randn(3, 8), jnp.float32)
    v = net(c, s, t, x)
    assert v.shape == (3, 8)
    assert np.isfinite(np.asarray(v)).all()


class FakeTok:
    def encode(self, text):
        return [(ord(c) % 59) + 1 for c in text][:12]


def test_generate_audio_end_to_end():
    model = tiny_model()
    model.set_runtime(tokenizer=FakeTok())
    wav = model.generate_audio("hello world", max_gen_len=6,
                               frames_after_eos=2,
                               key=jax.random.PRNGKey(0))
    # 6 frames at 25 Hz / 24 kHz = 960 samples/frame
    assert wav.shape[0] in (6 * 960,) or wav.shape[0] > 0
    assert np.isfinite(wav).all()


def test_generate_with_ref_audio_conditioning():
    model = tiny_model()
    model.set_runtime(tokenizer=FakeTok())
    ref = np.random.randn(4800).astype(np.float32) * 0.1
    res = list(model.generate("hi", ref_audio=ref, seed=0))
    assert len(res) == 1
    assert np.isfinite(res[0].audio).all()


def test_generate_audio_stream_concatenates_to_full():
    """Streamed chunks must reconstruct the one-shot decode (same latents;
    each chunk decodes with a warm-up overlap)."""
    model = tiny_model()
    model.set_runtime(tokenizer=FakeTok())
    # frames_after_eos > max_gen_len → always generates the full 12 frames
    full = model.generate_audio("hello there", max_gen_len=12,
                                frames_after_eos=20,
                                key=jax.random.PRNGKey(3))
    chunks = list(model.generate_audio_stream(
        "hello there", chunk_frames=5, overlap_frames=2, max_gen_len=12,
        frames_after_eos=20, key=jax.random.PRNGKey(3)))
    assert len(chunks) >= 2
    joined = np.concatenate(chunks)
    assert joined.shape == full.shape
    # identical latents; overlapped decode differs only inside the first
    # receptive field of each chunk — overall signal must stay close
    err = np.abs(joined - full).mean()
    assert err < 0.1, err


def test_split_into_best_sentences():
    """Sentence-boundary chunking packs whole sentences up to the token
    budget (reference pocket_tts.py:495-545)."""
    model = tiny_model()
    model.set_runtime(tokenizer=FakeTok())
    s1 = "One two three."
    s2 = "Four five six!"
    s3 = "Seven eight nine?"
    text = f"{s1} {s2} {s3}"
    # generous budget: single chunk
    assert model.split_into_best_sentences(text, max_tokens_per_chunk=500) \
        == [text]
    # tiny budget: one sentence per chunk
    chunks = model.split_into_best_sentences(text, max_tokens_per_chunk=1)
    assert chunks == [s1, s2, s3]
    # generate yields one segment per chunk on long input
    out = list(model.generate(text, seed=0))
    assert all(r.sample_rate == model.sample_rate for r in out)


def test_pocket_batcher_deterministic_matches_direct_loop():
    """temp=0 (noise zeroed) through the batcher equals the
    single-request `_pocket_generate` while_loop exactly."""
    from mlx_audio_tpu.nn import seed_rng
    from mlx_audio_tpu.tts.models.pocket_tts.pocket_tts import \
        _pocket_generate

    seed_rng(71)
    model = tiny_model()
    model.set_runtime(tokenizer=FakeTok())
    model.temp = 0.0
    tokens = model._tokenize("hello world")
    prefix = model.flow_lm.conditioner(jnp.asarray(tokens))
    T0 = prefix.shape[1]
    Tp = max(16, ((T0 + 15) // 16) * 16)
    pre_pad = jnp.pad(prefix, ((0, 0), (0, Tp - T0), (0, 0)))
    caches = model.flow_lm.transformer.make_cache(1, Tp + 8 + 1)
    lat_ref, n = _pocket_generate(
        model.flow_lm, caches, pre_pad, jnp.asarray(T0), jnp.asarray(2),
        jax.random.PRNGKey(0), 8, model.lsd_decode_steps, 0.0,
        model.noise_clamp, float(model.eos_threshold))
    n = int(n)
    ref = np.asarray(lat_ref)[:n]

    b = model.make_batcher(slots=2, max_len=128, tick_frames=3)
    try:
        out = b.submit(np.asarray(prefix), max_gen_len=8,
                       frames_after_eos=2, temperature=0.0,
                       seed=0).result(timeout=600)
    finally:
        b.close()
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_pocket_batcher_batched_equals_sequential():
    """Per-slot PRNG noise streams: fixed seeds ⇒ sampled batched latents
    == a one-slot pool."""
    from mlx_audio_tpu.nn import seed_rng

    seed_rng(72)
    model = tiny_model()
    model.set_runtime(tokenizer=FakeTok())
    prefixes = []
    for text in ("hello there", "something else"):
        toks = model._tokenize(text)
        prefixes.append(np.asarray(model.flow_lm.conditioner(
            jnp.asarray(toks))))
    seeds = [5, 9]

    def run(slots, items):
        b = model.make_batcher(slots=slots, max_len=128, tick_frames=3)
        try:
            futs = [b.submit(p, max_gen_len=6, frames_after_eos=2,
                             temperature=0.8, seed=s) for p, s in items]
            return [f.result(timeout=600) for f in futs], b.steps
        finally:
            b.close()

    batched, steps = run(2, list(zip(prefixes, seeds)))
    for (p, s), ref in zip(zip(prefixes, seeds), batched):
        alone, _ = run(2, [(p, s)])
        np.testing.assert_allclose(alone[0], ref, atol=1e-6)
    assert steps <= 8


def test_pocket_generate_routes_through_batcher():
    from mlx_audio_tpu.nn import seed_rng
    from mlx_audio_tpu.serving import get_infer_hook

    seed_rng(73)
    model = tiny_model()
    model.set_runtime(tokenizer=FakeTok())
    batcher = model.make_batcher(slots=2, max_len=128, tick_frames=3)
    batcher.install()
    try:
        assert get_infer_hook(model) is batcher
        wav = model.generate_audio("hello world", max_gen_len=6,
                                   frames_after_eos=2,
                                   key=jax.random.PRNGKey(0))
        assert batcher.steps > 0
        assert wav.shape[0] > 0 and np.isfinite(wav).all()
    finally:
        batcher.close()
    assert get_infer_hook(model) is None

"""VibeVoice TTS: DPM-Solver coefficients, diffusion head, VAE decoder,
interleaved text/speech generation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mlx_audio_tpu.tts.models.vibevoice import (
    AcousticTokenizer,
    AcousticTokenizerConfig,
    DiffusionHead,
    DiffusionHeadConfig,
    Model,
    ModelConfig,
    Qwen2DecoderConfig,
    dpm_solver_coeffs,
    dpm_step,
)


def tiny_config():
    return ModelConfig(
        sample_rate=24000,
        acoustic_tokenizer_config=AcousticTokenizerConfig(
            vae_dim=8, encoder_n_filters=4, encoder_ratios=(2, 2),
            encoder_depths="1-1-1", decoder_n_filters=4),
        decoder_config=Qwen2DecoderConfig(
            hidden_size=32, intermediate_size=64, num_attention_heads=4,
            num_key_value_heads=2, num_hidden_layers=4, vocab_size=100),
        diffusion_head_config=DiffusionHeadConfig(
            hidden_size=32, head_layers=2, latent_size=8,
            ddpm_num_steps=50, ddpm_num_inference_steps=3),
        acoustic_vae_dim=8,
        tts_backbone_num_hidden_layers=2,
    )


def test_dpm_coeffs_and_step():
    c = dpm_solver_coeffs(1000, 10)
    assert c.orders[0] == 1  # first step is always first-order
    assert c.orders[-1] == 1  # final_sigmas_type == "zero"
    assert all(o == 2 for o in c.orders[1:-1])
    assert c.alpha[-1] == 1.0 and c.sigma[-1] == 0.0
    # alpha increases toward 1 as t decreases
    assert np.all(np.diff(c.alpha[:-1]) > 0)
    x = jnp.ones((1, 4))
    v = jnp.zeros((1, 4))
    x1, x0 = dpm_step(c, 0, x, v, None)
    assert x1.shape == (1, 4) and np.isfinite(np.asarray(x1)).all()


def test_diffusion_head_shapes():
    head = DiffusionHead(DiffusionHeadConfig(
        hidden_size=32, head_layers=2, latent_size=8))
    out = head(jnp.zeros((4, 8)), jnp.full((4,), 10.0), jnp.ones((4, 32)))
    assert out.shape == (4, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_acoustic_tokenizer_decode():
    tok = AcousticTokenizer(AcousticTokenizerConfig(
        vae_dim=8, encoder_n_filters=4, encoder_ratios=(2, 2),
        encoder_depths="1-1-1", decoder_n_filters=4))
    audio = tok.decode(jnp.zeros((1, 5, 8)))
    # upsample ×4 (ratios 2·2), causal convs preserve length
    assert audio.shape == (1, 20, 1)


def test_generate_latents_interleaved():
    model = Model(tiny_config())
    ids = np.arange(1, 8, dtype=np.int32)  # 7 tokens → two text windows
    lat, n = model.generate_latents(ids, max_tokens=8, cfg_scale=1.5,
                                    ddpm_steps=2, key=jax.random.PRNGKey(0))
    assert 0 <= n <= 8
    if n:
        assert lat.shape == (n, 8)
        assert np.isfinite(lat).all()
        audio = model.decode_latents(lat)
        assert audio.shape == (n * 4,)


def test_generate_latents_with_voice_cache():
    model = Model(tiny_config())
    # fake voice cache: 3 frames of prefix in all streams
    kvh, hd = 2, 8
    voice = {
        "tts_hidden": np.random.randn(1, 3, 32).astype(np.float32) * 0.1,
        "neg_hidden": np.random.randn(1, 3, 32).astype(np.float32) * 0.1,
        "lm_hidden": np.zeros((1, 3, 32), np.float32),
        "lm_kv": [(np.zeros((1, kvh, 3, hd), np.float32),
                   np.zeros((1, kvh, 3, hd), np.float32))
                  for _ in range(2)],
        "tts_kv": [(np.zeros((1, kvh, 3, hd), np.float32),
                    np.zeros((1, kvh, 3, hd), np.float32))
                   for _ in range(2)],
        "neg_kv": [(np.zeros((1, kvh, 3, hd), np.float32),
                    np.zeros((1, kvh, 3, hd), np.float32))
                   for _ in range(2)],
    }
    ids = np.array([1, 2, 3], np.int32)
    lat, n = model.generate_latents(ids, max_tokens=6, ddpm_steps=2,
                                    voice=voice,
                                    key=jax.random.PRNGKey(1))
    assert 0 <= n <= 6
    if n:
        assert np.isfinite(lat).all()


def test_sanitize_key_remap():
    model = Model(tiny_config())
    w = {
        "model.prediction_head.t_embedder.mlp.0.weight":
            np.zeros((32, 256), np.float32),
        "model.prediction_head.layers.0.adaLN_modulation.1.weight":
            np.zeros((96, 32), np.float32),
        "model.language_model.rotary_emb.inv_freq": np.zeros(4),
    }
    out = model.sanitize(w)
    assert "prediction_head.t_embedder.mlp.layers.0.weight" in out
    assert ("prediction_head.layers.0.adaLN_modulation.layers.1.weight"
            in out)
    assert not any("inv_freq" in k for k in out)


# ---------------------------------------------------------------------------
# Continuous batching (VibeVoiceBatcher)
# ---------------------------------------------------------------------------


def _run_pool(model, reqs, slots):
    b = model.make_batcher(slots=slots, max_len=128, lm_max_len=64,
                           ddpm_steps=2)
    try:
        futs = [b.submit(ids, max_tokens=8, cfg_scale=c, voice=v, seed=s)
                for ids, c, v, s in reqs]
        outs = [f.result(timeout=600) for f in futs]
        assert b.dispatch_count >= 1
        return outs
    finally:
        b.close()


def test_vibevoice_batcher_batched_equals_solo():
    """N concurrent requests fused in one pool produce exactly the latents
    each request produces alone in an equally-sized pool (per-row noise
    keys + per-row cfg scales make rows independent of co-tenants)."""
    model = Model(tiny_config())
    rng = np.random.default_rng(0)
    reqs = [
        (rng.integers(1, 100, (n,)).astype(np.int32), c, None, s)
        for n, c, s in ((7, 1.5, 11), (4, 1.3, 22), (9, 2.0, 33))
    ]
    batched = _run_pool(model, reqs, slots=3)
    for i, r in enumerate(reqs):
        solo = _run_pool(model, [r], slots=3)[0]
        np.testing.assert_array_equal(batched[i], solo)


def test_vibevoice_batcher_voice_cache_and_generate_routing():
    """Voice-cache prefixes install per slot; Model.generate routes
    through an installed batcher and still decodes audio."""
    model = Model(tiny_config())
    kvh, hd = 2, 8
    voice = {
        "tts_hidden": np.random.randn(1, 3, 32).astype(np.float32) * 0.1,
        "neg_hidden": np.random.randn(1, 3, 32).astype(np.float32) * 0.1,
        "lm_hidden": np.zeros((1, 3, 32), np.float32),
        "lm_kv": [(np.random.randn(1, kvh, 3, hd).astype(np.float32) * .1,
                   np.random.randn(1, kvh, 3, hd).astype(np.float32) * .1)
                  for _ in range(2)],
        "tts_kv": [(np.random.randn(1, kvh, 3, hd).astype(np.float32) * .1,
                    np.random.randn(1, kvh, 3, hd).astype(np.float32) * .1)
                   for _ in range(2)],
        "neg_kv": [(np.random.randn(1, kvh, 3, hd).astype(np.float32) * .1,
                    np.random.randn(1, kvh, 3, hd).astype(np.float32) * .1)
                   for _ in range(2)],
    }
    ids = np.array([1, 2, 3], np.int32)
    reqs = [(ids, 1.5, voice, 7), (ids, 1.5, None, 7)]
    batched = _run_pool(model, reqs, slots=2)
    solo_v = _run_pool(model, [reqs[0]], slots=2)[0]
    np.testing.assert_array_equal(batched[0], solo_v)

    class Tok:
        def encode(self, s):
            return [(ord(c) % 97) + 1 for c in s]

    model.set_runtime(tokenizer=Tok())
    model.ddpm_inference_steps = 2
    batcher = model.make_batcher(slots=2, max_len=128, lm_max_len=64,
                                 ddpm_steps=2).install()
    try:
        res = list(model.generate("Hello there.", max_tokens=8))
        assert batcher.dispatch_count >= 1
    finally:
        batcher.close()
    assert len(res) == 1 and res[0].sample_rate == 24000


def test_vibevoice_batcher_mid_flight_join_and_warmup():
    """Slots recycle under load (4 requests, 2 slots) and warmup()
    pre-compiles install + the fused round."""
    model = Model(tiny_config())
    b = model.make_batcher(slots=2, max_len=128, lm_max_len=64,
                           ddpm_steps=2)
    try:
        b.warmup()
        rng = np.random.default_rng(1)
        futs = [b.submit(rng.integers(1, 100, (4 + i,)).astype(np.int32),
                         max_tokens=7, cfg_scale=1.5, seed=i)
                for i in range(4)]
        outs = [f.result(timeout=600) for f in futs]
    finally:
        b.close()
    assert len(outs) == 4
    for out in outs:
        assert out.shape[0] <= 7 and out.shape[1] == 8

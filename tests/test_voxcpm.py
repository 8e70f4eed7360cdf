"""VoxCPM: MiniCPM LM, local DiT CFM, AudioVAE, on-device patch loop."""

import jax.numpy as jnp
import numpy as np

from mlx_audio_tpu.tts.models.voxcpm import Model, ModelArgs
from mlx_audio_tpu.tts.models.voxcpm.voxcpm import (
    AudioVAEConfig,
    CFMConfig,
    DiTConfig,
    EncoderConfig,
    LMConfig,
)


def tiny_args():
    return ModelArgs(
        lm_config=LMConfig(hidden_size=32, num_hidden_layers=2,
                           num_attention_heads=4, num_key_value_heads=2,
                           intermediate_size=64, vocab_size=120),
        encoder_config=EncoderConfig(hidden_dim=24, ffn_dim=48, num_heads=2,
                                     num_layers=1),
        dit_config=DiTConfig(hidden_dim=24, ffn_dim=48, num_heads=2,
                             num_layers=1, cfm_config=CFMConfig()),
        audio_vae_config=AudioVAEConfig(
            encoder_dim=4, encoder_rates=[2, 5], latent_dim=8,
            decoder_dim=16, decoder_rates=[5, 2], sample_rate=16000),
        patch_size=2, feat_dim=8, scalar_quantization_latent_dim=16,
        residual_lm_num_layers=1, max_length=64)


class FakeTok:
    def encode(self, text):
        return [(ord(c) % 90) + 3 for c in text][:10]


def test_audio_vae_roundtrip_shapes():
    import jax.numpy as jnp

    model = Model(tiny_args())
    wav = jnp.asarray(np.random.randn(1, 100).astype(np.float32)) * 0.1
    lat = model.audio_vae.encode(wav)
    assert lat.shape == (1, 10, 8)  # hop = 10
    out = model.audio_vae.decode(lat)
    assert out.shape == (1, 100)


def test_generate_no_clone():
    model = Model(tiny_args())
    model.set_runtime(tokenizer=FakeTok())
    results = list(model.generate("hello", max_tokens=4,
                                  inference_timesteps=2, seed=0))
    assert len(results) == 1
    audio = results[0].audio
    assert audio.size > 0
    assert np.isfinite(audio).all()


def test_generate_voice_clone():
    model = Model(tiny_args())
    model.set_runtime(tokenizer=FakeTok())
    ref = np.random.randn(400).astype(np.float32) * 0.1
    results = list(model.generate("hi", ref_text="ref", ref_audio=ref,
                                  max_tokens=3, inference_timesteps=2,
                                  seed=1))
    assert np.isfinite(results[0].audio).all()


def _vox_prep(model, text):
    """Mirror generate()'s no-clone prefill prep."""
    ids = [(ord(c) % 90) + 3 for c in text][:10] + [101]
    scale_emb = (model.args.lm_config.scale_emb
                 if not model.args.lm_config.use_mup else 1.0)
    combined = model.base_lm.embed_tokens(
        jnp.asarray([ids], jnp.int32)) * scale_emb
    prefix = jnp.zeros((1, model.patch_size, model.feat_dim))
    return np.asarray(combined), np.asarray(prefix)


def test_voxcpm_batcher_batched_equals_sequential():
    """Per-slot PRNG streams through the vmapped flow sampler: fixed
    seeds ⇒ batched patches == one-slot pool."""
    from mlx_audio_tpu.nn import seed_rng

    seed_rng(91)
    model = Model(tiny_args())
    preps = [_vox_prep(model, t) for t in ("hello there", "other words")]
    seeds = [5, 9]

    def run(slots, items):
        b = model.make_batcher(slots=slots, max_len=128, tick_frames=3,
                               n_timesteps=4)
        try:
            futs = [b.submit(c, p, max_tokens=7, seed=s)
                    for (c, p), s in items]
            return [f.result(timeout=600) for f in futs], b.steps
        finally:
            b.close()

    batched, steps = run(2, list(zip(preps, seeds)))
    for (prep, s), ref in zip(zip(preps, seeds), batched):
        alone, _ = run(2, [(prep, s)])
        np.testing.assert_allclose(alone[0], ref, atol=1e-6)
    assert steps <= 8


def test_voxcpm_generate_routes_through_batcher():
    from mlx_audio_tpu.nn import seed_rng
    from mlx_audio_tpu.serving import get_infer_hook

    seed_rng(92)
    model = Model(tiny_args())
    model.set_runtime(tokenizer=FakeTok())
    batcher = model.make_batcher(slots=2, max_len=128, tick_frames=3,
                                 n_timesteps=10)
    batcher.install()
    try:
        assert get_infer_hook(model) is batcher
        results = list(model.generate("Hello.", max_tokens=7, seed=0))
        assert batcher.steps > 0
        assert results[0].samples > 0
        assert np.isfinite(results[0].audio).all()
    finally:
        batcher.close()
    assert get_infer_hook(model) is None
